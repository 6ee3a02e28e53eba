package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.RangeJoin

/** Banded range-join corners (the declared `range_join_events` query
  * covers the bulk path against DuckDB's inequality join). */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("range-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pairs(left: Seq[(String, Long)], right: Seq[(String, Long)],
                    tol: Long): Seq[(Long, Long)] = {
    import spark.implicits._
    RangeJoin.within(left.toDF("k", "lts"), right.toDF("k", "rts"),
        Seq("k"), "lts", "rts", tol)
      .select("lts", "rts").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
  }

  test("band-boundary pairs are found; each true pair exactly once") {
    // tol=10 → bands of 10; 9 and 11 straddle a band edge 1 apart
    val out = pairs(
      left = Seq(("a", 11L), ("a", 35L)),
      right = Seq(("a", 9L), ("a", 21L), ("a", 25L), ("a", 45L)), tol = 10L)
    assert(out == Seq((11L, 9L), (11L, 21L), (35L, 25L), (35L, 45L)).sorted,
      s"boundary and in-band pairs, no duplicates from the 3-band expansion: $out")
  }

  test("exactly-at-tolerance is included, one past it is not") {
    assert(pairs(Seq(("a", 20L)), Seq(("a", 10L), ("a", 9L)), 10L) == Seq((20L, 10L)))
    assert(pairs(Seq(("a", 20L)), Seq(("a", 30L), ("a", 31L)), 10L) == Seq((20L, 30L)))
  }

  test("keys never cross; negative values band correctly (floor, not truncate)") {
    val out = pairs(
      left = Seq(("a", 0L), ("b", 0L)),
      right = Seq(("a", -5L), ("b", 100L), ("a", -11L)), tol = 10L)
    // -5 is within 10 of 0 (bands -1 vs 0, adjacent); -11 is not;
    // b's only right row is 100 away
    assert(out == Seq((0L, -5L)))
  }

  test("brute-force equivalence on a random-ish grid") {
    val left = (0 until 60).map(i => ("k" + i % 3, (i * 37L) % 500))
    val right = (0 until 80).map(i => ("k" + i % 3, (i * 53L) % 500))
    val expect = (for {
      (lk, lt) <- left; (rk, rt) <- right
      if lk == rk && math.abs(lt - rt) <= 25
    } yield (lt, rt)).sorted
    assert(pairs(left, right, 25L).sorted == expect)
  }
}
