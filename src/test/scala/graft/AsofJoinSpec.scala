package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.AsofJoin

/** Edge semantics of the as-of join operator (the declared
  * `asof_attribution` query covers the bulk path against DuckDB's native
  * ASOF JOIN; these pin the corners the fixture can't hit). */
class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("asof-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(left: Seq[(String, Long)], right: Seq[(String, Long, String)]) = {
    import spark.implicits._
    AsofJoin.asofBackward(
      left.toDF("k", "lts"), right.toDF("k", "rts", "payload"),
      by = Seq("k"), leftTs = "lts", rightTs = "rts",
      rightPayload = Seq("rts", "payload"), rightTieBreak = Some("payload"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        Option(r.getString(3)).orNull))
      .toSet
  }

  test("backward semantics: latest at-or-before; unmatched stays null") {
    val out = run(
      left = Seq(("a", 10L), ("a", 25L), ("a", 5L), ("b", 10L)),
      right = Seq(("a", 7L, "r7"), ("a", 20L, "r20"), ("c", 1L, "rC")))
    assert(out == Set(
      ("a", 10L, 7L, "r7"),   // 7 <= 10 < 20
      ("a", 25L, 20L, "r20"), // latest at-or-before
      ("a", 5L, -1L, null),   // before any right row
      ("b", 10L, -1L, null))) // key with no right rows at all
  }

  test("equal timestamps match (<= semantics, right sorts before left)") {
    val out = run(left = Seq(("a", 10L)), right = Seq(("a", 10L, "same-ts")))
    assert(out == Set(("a", 10L, 10L, "same-ts")))
  }

  test("a matched right row with null payload FIELDS is not skipped over") {
    import spark.implicits._
    val left = Seq(("a", 10L)).toDF("k", "lts")
    val right = Seq(("a", 1L, Some("old")), ("a", 9L, Option.empty[String]))
      .toDF("k", "rts", "payload")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "lts", "rts",
      Seq("rts", "payload")).collect().head
    // the as-of row IS (rts=9, payload=null) — last+ignoreNulls must skip
    // absent ROWS, not look through a null field to the older "old"
    assert(out.getLong(2) == 9L && out.isNullAt(3))
  }

  test("right rows tied on (key, ts) resolve to the declared tie-break winner") {
    val out = run(
      left = Seq(("a", 10L)),
      right = Seq(("a", 10L, "aaa"), ("a", 10L, "zzz")))
    assert(out == Set(("a", 10L, 10L, "zzz")), "largest tie-break value wins")
  }

  test("null timestamps: right rows never match, left rows get null payload") {
    import spark.implicits._
    val left = Seq(("a", Some(10L)), ("a", Option.empty[Long])).toDF("k", "lts")
    val right = Seq(("a", Option.empty[Long], "null-ts"), ("a", Some(3L), "real"))
      .toDF("k", "rts", "payload")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "lts", "rts", Seq("payload"))
      .collect().map(r => (if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).orNull)).toSet
    // SQL semantics: NULL <= ts is never true — the null-ts right row is
    // not a universal fallback match, and the null-ts left row matches nothing
    assert(out == Set((10L, "real"), (-1L, null)))
  }

  test("payload name collision with a left column is rejected") {
    import spark.implicits._
    val err = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(
        Seq(("a", 1L)).toDF("k", "lts"), Seq(("a", 1L, "x")).toDF("k", "rts", "lts"),
        Seq("k"), "lts", "rts", Seq("lts"))
    }
    assert(err.getMessage.contains("collide"))
  }

  test("input columns colliding with bookkeeping names are rejected, not corrupted") {
    import spark.implicits._
    // a left `__ts` would be silently REPLACED by the internal ordering
    // column (wrong results, no error) without the guard
    val err = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(
        Seq(("a", 1L, 99L)).toDF("k", "lts", "__ts"),
        Seq(("a", 1L, "x")).toDF("k", "rts", "payload"),
        Seq("k"), "lts", "rts", Seq("payload"))
    }
    assert(err.getMessage.contains("__ts"))
    val err2 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(
        Seq(("a", 1L)).toDF("k", "lts"),
        Seq(("a", 1L, "x", 0)).toDF("k", "rts", "payload", "__side"),
        Seq("k"), "lts", "rts", Seq("payload"))
    }
    assert(err2.getMessage.contains("__side"))
  }
}
