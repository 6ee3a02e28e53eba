package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** Milvus `flush` / `compact` parity surfaces. flush is a shim by
  * design (every write here commits synchronously) and must return the
  * pinnable snapshot versions; compact must fold every at-rest index
  * artifact's segments WITHOUT changing any query result — the whole
  * point of segment folding is byte layout, never semantics. */
class CompactFlushSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("compact-flush-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newClient(): GraftClient = {
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    new GraftClient(spark, root)
  }

  test("flush returns each partition's current version and advances with commits") {
    import spark.implicits._
    val client = newClient()
    client.createCollection("fl", dim = 2, buckets = 4)
    client.createPartition("fl", "hot")
    client.upsert("fl", Seq(("a", Seq(1f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    val v1 = client.flush("fl")
    assert(v1.keySet == Set("_default", "hot"))
    assert(v1("_default") >= 0L && v1("hot") == -1L,
      s"only the written partition has commits (versions start at 0): $v1")
    client.upsert("fl", Seq(("b", Seq(2f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    val v2 = client.flush("fl")
    assert(v2("_default") > v1("_default"), "flush must reflect new commits")
    assert(v2("hot") == v1("hot"))
  }

  test("compact folds scalar + text + sparse segments; every read is unchanged") {
    import spark.implicits._
    val client = newClient()
    client.createCollection("cc", dim = 2, buckets = 4)
    def rows(lo: Int, hi: Int) = (lo until hi)
      .map(i => (f"k$i%03d", Seq(i.toFloat, 0f),
        Map("grp" -> (i % 3).toString, "text" -> s"alpha beta doc$i")))
      .toDF("key", "vec", "meta")
    client.upsert("cc", rows(0, 40))
    client.createScalarIndex("cc", "grp")
    // several maintained commits: each appends scalar posting/zone rows
    (0 until 3).foreach(b => client.upsert("cc", rows(40 + b * 10, 50 + b * 10)))
    val docs = (0 until 70).map(i => (f"k$i%03d",
      s"alpha beta doc$i ${if (i % 2 == 0) "even" else "odd"}"))
      .toDF("key", "text")
    client.buildTextIndex("cc", docs.filter(col("key") < "k050"))
    client.appendTextIndex("cc", docs.filter(col("key") >= "k050"))
    val postings = (0 until 70).flatMap(i =>
      Seq((f"k$i%03d", (i % 7).toLong, 1.0 + i % 5), (f"k$i%03d", 100L + i % 3, 2.0)))
      .toDF("key", "dim", "w")
    client.buildSparseIndex("cc", postings.filter(col("key") < "k050"))
    client.appendSparseIndex("cc", postings.filter(col("key") >= "k050"))

    val zonesBefore = client.scalarIndexZoneStats("cc", "grp")
      .agg(max(col("zone_rows"))).head().getLong(0)
    assert(zonesBefore > 1, "the appends must have accumulated zone segments")
    def reads() = (
      client.queryMilvus("cc", """grp == "1"""").collect().map(_.getString(0)).toSeq,
      client.textMatchKeys("cc", Seq("even")).collect().map(_.getString(0)).sorted.toSeq,
      client.searchSparse("cc", Seq((100L, 1.0)), k = 5).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq)
    val before = reads()

    val compacted = client.compact("cc")
    assert(compacted.toSet == Set(
      ("_default", "scalar", "grp"), ("_default", "text", "-"),
      ("_default", "sparse", "-")), s"unexpected compaction set: $compacted")
    assert(reads() == before, "compaction must never change results")
    val zonesAfter = client.scalarIndexZoneStats("cc", "grp")
      .agg(max(col("zone_rows"))).head().getLong(0)
    assert(zonesAfter == 1, s"compaction must fold zone segments (got $zonesAfter)")
    // compact is idempotent
    client.compact("cc")
    assert(reads() == before)
  }

  test("compact on a collection with no index artifacts is a no-op") {
    import spark.implicits._
    val client = newClient()
    client.createCollection("nn", dim = 2, buckets = 4)
    client.upsert("nn", Seq(("a", Seq(1f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    assert(client.compact("nn").isEmpty)
    assert(client.count("nn") == 1)
  }
}
