package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** Milvus consistency levels (`consistency_level` on create_collection +
  * the per-read override), mapped onto snapshot resolution: Strong
  * re-resolves CURRENT per read; Session asserts the store covers this
  * client's own acknowledged commits; Bounded serves the client's cached
  * resolution inside a staleness budget; Eventually serves it regardless
  * of age, upgrading to strong when the pinned snapshot was vacuumed.
  * Two clients over ONE shared root stand in for two processes — each
  * GraftClient holds its own resolution cache, which is what makes the
  * levels per-client semantics rather than store state. */
class ConsistencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("consistency-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-cons").toString

  private def row(key: String, x: Float): (String, Seq[Float], Map[String, String]) =
    (key, Seq(x, 0f), Map("k" -> key))

  test("create boundary: level validated and persisted; reads reject unknown overrides") {
    val c = new GraftClient(spark, newRoot())
    intercept[IllegalArgumentException](
      c.createCollection("bad", dim = 2, consistencyLevel = "Quite-Strong"))
    assert(c.createCollection("ev", dim = 2, consistencyLevel = "Eventually"))
    assert(c.describe("ev").consistency == "Eventually")
    assert(c.createCollection("st", dim = 2))
    assert(c.describe("st").consistency == "Strong")
    import spark.implicits._
    c.upsert("st", Seq(row("a", 1f)).toDF("key", "vec", "meta"))
    intercept[IllegalArgumentException](
      c.queryWhere("st", lit(true), consistencyLevel = "nope").collect())
  }

  test("Eventually serves the client's cached snapshot; Strong override syncs; own writes refresh") {
    import spark.implicits._
    val root = newRoot()
    val reader = new GraftClient(spark, root)
    val writer = new GraftClient(spark, root)
    reader.createCollection("c", dim = 2, consistencyLevel = "Eventually")
    writer.upsert("c", Seq(row("a", 1f)).toDF("key", "vec", "meta"))
    // first Eventually read: cache miss -> strong resolve, sees "a"
    assert(reader.queryWhere("c", lit(true)).collect().map(_.getString(0)).toSeq
      == Seq("a"))
    // a FOREIGN client commits; the reader's cached resolution predates it
    writer.upsert("c", Seq(row("b", 2f)).toDF("key", "vec", "meta"))
    assert(reader.queryWhere("c", lit(true)).collect().map(_.getString(0)).toSeq
      == Seq("a"), "Eventually must serve the cached (stale) snapshot")
    assert(reader.get("c", "b").isEmpty,
      "Eventually get rides the same cached resolution")
    // per-read override re-syncs without changing the collection default
    assert(reader.queryWhere("c", lit(true), consistencyLevel = "Strong")
      .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    // ...and that strong resolve REFRESHED the cache: Eventually now sees b
    assert(reader.fetch("c", Seq("b")).count() == 1)
    // the reader's OWN commit advances its cache — read-your-own-writes
    writer.upsert("c", Seq(row("w", 9f)).toDF("key", "vec", "meta")) // unseen foreign write
    reader.upsert("c", Seq(row("r", 3f)).toDF("key", "vec", "meta"))
    val after = reader.queryWhere("c", lit(true)).collect().map(_.getString(0)).toSeq
    assert(after.contains("r"), "a client must read its own writes at Eventually")
    assert(after.contains("w"),
      "the own-commit resolution covers every PRIOR acknowledged write too " +
        "(the store is linearizable; staleness only comes from the cache)")
  }

  test("Bounded: zero budget behaves Strong; a wide budget serves the cache") {
    import spark.implicits._
    val root = newRoot()
    val writer = new GraftClient(spark, root)
    val always = new GraftClient(spark, root, boundedStalenessMs = 0L)
    val lenient = new GraftClient(spark, root, boundedStalenessMs = Long.MaxValue)
    always.createCollection("c", dim = 2, consistencyLevel = "Bounded")
    writer.upsert("c", Seq(row("a", 1f)).toDF("key", "vec", "meta"))
    assert(always.queryWhere("c", lit(true)).count() == 1)
    assert(lenient.queryWhere("c", lit(true)).count() == 1) // primes lenient's cache
    writer.upsert("c", Seq(row("b", 2f)).toDF("key", "vec", "meta"))
    assert(always.queryWhere("c", lit(true)).count() == 2,
      "budget 0 ms: every cached resolution is already over budget -> re-resolve")
    assert(lenient.queryWhere("c", lit(true)).count() == 1,
      "unbounded budget: the cached resolution keeps serving")
  }

  test("Eventually upgrades to strong when the pinned snapshot is vacuumed") {
    import spark.implicits._
    val root = newRoot()
    val reader = new GraftClient(spark, root)
    val writer = new GraftClient(spark, root)
    // retain = 2 -> two commits after the cached resolution vacuum it
    reader.createCollection("c", dim = 2, consistencyLevel = "Eventually")
    writer.upsert("c", Seq(row("a", 1f)).toDF("key", "vec", "meta"))
    assert(reader.queryWhere("c", lit(true)).count() == 1) // cache at v1
    (2 to 4).foreach(i =>
      writer.upsert("c", Seq(row(s"k$i", i.toFloat)).toDF("key", "vec", "meta")))
    // v1 is outside the retain window now: the pinned read must UPGRADE
    // (serve current), not fail
    assert(reader.queryWhere("c", lit(true)).count() == 4,
      "a vacuumed pinned snapshot upgrades to a strong read")
  }

  test("Session: covered reads pass; a rolled-back store raises instead of serving pre-write state") {
    import spark.implicits._
    val root = newRoot()
    val c = new GraftClient(spark, root)
    c.createCollection("c", dim = 2, consistencyLevel = "Session")
    c.upsert("c", Seq(row("a", 1f)).toDF("key", "vec", "meta"))
    val dataPath = c.describe("c").dataPath
    val cur = java.nio.file.Paths.get(dataPath, "CURRENT")
    val v1 = new String(java.nio.file.Files.readAllBytes(cur))
    assert(c.queryWhere("c", lit(true)).count() == 1) // covers own write
    c.upsert("c", Seq(row("b", 2f)).toDF("key", "vec", "meta"))
    assert(c.queryWhere("c", lit(true)).count() == 2)
    // roll the pointer back to v1 — the shape of a restored/replaced
    // store dir. A Strong read would silently serve pre-write state;
    // Session must refuse because this client's commit is uncovered.
    java.nio.file.Files.write(cur, v1.getBytes)
    val e = intercept[IllegalArgumentException](
      c.queryWhere("c", lit(true)).collect())
    assert(e.getMessage.contains("Session consistency violated"), e.getMessage)
  }

  test("drop-and-recreate clears the Session floor — the client's own drop is not a rollback") {
    import spark.implicits._
    val c = new GraftClient(spark, newRoot())
    c.createCollection("c", dim = 2, consistencyLevel = "Session")
    c.upsert("c", Seq(row("a", 1f)).toDF("key", "vec", "meta"))
    c.upsert("c", Seq(row("b", 2f)).toDF("key", "vec", "meta")) // floor ≥ 1
    c.drop("c")
    c.createCollection("c", dim = 2, consistencyLevel = "Session")
    // the fresh store restarts its versions BELOW the old floor — without
    // the drop-time evict both reads here would raise the rollback error
    assert(c.queryWhere("c", lit(true)).count() == 0)
    c.upsert("c", Seq(row("x", 9f)).toDF("key", "vec", "meta"))
    assert(c.queryWhere("c", lit(true)).count() == 1)
  }

  test("search: Bounded/Eventually soundly resolve Strong; Session floor still raises") {
    import spark.implicits._
    val root = newRoot()
    val c = new GraftClient(spark, root)
    // an Eventually collection default must not break plain search —
    // fresher-than-requested is within every level's contract
    c.createCollection("c", dim = 2, consistencyLevel = "Eventually")
    c.upsert("c", Seq(row("a", 1f)).toDF("key", "vec", "meta"))
    assert(c.search("c", Array(0f, 0f), k = 1).count() == 1)
    assert(c.search("c", Array(0f, 0f), k = 1,
      consistencyLevel = "Bounded").count() == 1)
    // Session's floor assertion applies to search too
    val dataPath = c.describe("c").dataPath
    val cur = java.nio.file.Paths.get(dataPath, "CURRENT")
    val v1 = new String(java.nio.file.Files.readAllBytes(cur))
    c.upsert("c", Seq(row("b", 2f)).toDF("key", "vec", "meta"))
    java.nio.file.Files.write(cur, v1.getBytes)
    val e = intercept[IllegalArgumentException](
      c.search("c", Array(0f, 0f), k = 1, consistencyLevel = "Session").collect())
    assert(e.getMessage.contains("Session consistency violated"))
  }

  test("TEXT_MATCH-gated queries upgrade to Strong (stale frame + fresh postings never mix)") {
    import spark.implicits._
    val root = newRoot()
    val reader = new GraftClient(spark, root)
    val writer = new GraftClient(spark, root)
    reader.createCollection("c", dim = 2, consistencyLevel = "Eventually")
    writer.upsert("c", Seq(row("a", 1f)).toDF("key", "vec", "meta"))
    assert(reader.queryWhere("c", lit(true)).count() == 1) // cache at v1
    writer.upsert("c", Seq(row("b", 2f)).toDF("key", "vec", "meta"))
    writer.buildTextIndex("c",
      Seq(("a", "alpha doc"), ("b", "beta doc")).toDF("key", "text"))
    // the gated read syncs: both keys visible, gate resolved at CURRENT
    assert(reader.queryWhere("c", lit(true),
        matchTerms = Seq("doc")).count() == 2,
      "a gated query must upgrade to Strong")
  }
}
