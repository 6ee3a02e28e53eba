package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient
import graft.ingest.Embedder

/** The switch-over surface: every call a reference user makes today,
  * through GraftClient — create, upsert (overwrite), search (with and
  * without filter), delete by key and predicate, describe/list/drop. */
class GraftClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-client-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("full reference lifecycle through the client") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-client").toString
    val client = new GraftClient(spark, root)

    // create (idempotent — has_collection gate)
    assert(client.createCollection("bkt_text_0001", dim = 384))
    assert(!client.createCollection("bkt_text_0001", dim = 999))
    assert(client.describe("bkt_text_0001").dim == 384)
    assert(client.list() == Seq("bkt_text_0001"))

    // upsert: embed three docs (the reference's ingest transform)
    def row(key: String, text: String, tag: String) =
      (key, Embedder.text.embedText(text).toSeq, Map("category" -> tag))
    val batch1 = Seq(
      row("doc1", "the quick brown fox jumps over the lazy dog", "animals"),
      row("doc2", "ceph object storage event notification pipeline", "infra"),
      row("doc3", "spark vector search engine", "infra")
    ).toDF("key", "vec", "meta")
    assert(client.upsert("bkt_text_0001", batch1) == 3)

    // same-key overwrite (put of a new object version)
    val batch2 = Seq(row("doc3", "spark vector search engine over parquet", "infra-v2"))
      .toDF("key", "vec", "meta")
    assert(client.upsert("bkt_text_0001", batch2) == 3)

    // search: top-2 by L2, reference result shape
    val q = Embedder.text.embedText("quick brown fox")
    val hits = client.search("bkt_text_0001", q, k = 2).collect()
    assert(hits.length == 2)
    assert(hits.head.getAs[String]("vector_key") == "doc1")
    assert(hits.head.getAs[Double]("distance") < hits(1).getAs[Double]("distance"))

    // overwrite visible: doc3's metadata is the v2 tag
    val d3 = client.search("bkt_text_0001",
      Embedder.text.embedText("spark vector search engine over parquet"), k = 1).head()
    assert(d3.getAs[String]("vector_key") == "doc3")
    assert(d3.getAs[Map[String, String]]("metadata")("category") == "infra-v2")

    // filtered search (B1/B2): restrict by metadata before top-k
    val filtered = client.search("bkt_text_0001", q, k = 2,
      filter = Some(element_at(col("meta"), "category") =!= "animals")).collect()
    assert(filtered.forall(_.getAs[String]("vector_key") != "doc1"))

    // delete by key (ObjectRemoved:Delete)
    assert(client.deleteByKeys("bkt_text_0001", Seq("doc1")) == 2)
    val afterDelete = client.search("bkt_text_0001", q, k = 3).collect()
    assert(!afterDelete.exists(_.getAs[String]("vector_key") == "doc1"))

    // delete by predicate (Milvus filter delete)
    assert(client.deleteWhere("bkt_text_0001",
      element_at(col("meta"), "category") === "infra-v2") == 1)

    // wrong dimension rejected at the boundary
    val err = intercept[Exception] {
      client.upsert("bkt_text_0001",
        Seq(("bad", Seq(1.0f, 2.0f), Map.empty[String, String])).toDF("key", "vec", "meta"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("dimension")))
    val errQ = intercept[IllegalArgumentException] {
      client.search("bkt_text_0001", Array(1.0f), k = 1)
    }
    assert(errQ.getMessage.contains("dimension"))

    // drop
    assert(client.drop("bkt_text_0001"))
    assert(client.list().isEmpty)
  }

  test("upsertTexts embeds server-side like the reference's ingest handler") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-client4").toString
    val client = new GraftClient(spark, root)
    client.createCollection("texts", dim = Embedder.TextDim)
    client.upsertTexts("texts", Seq(
      ("fox", "the quick brown fox jumps over the lazy dog", Map("k" -> "1")),
      ("ceph", "ceph object storage event notification", Map("k" -> "2"))
    ).toDF("key", "text", "meta"))
    val hit = client.search("texts", Embedder.text.embedText("quick brown fox"), 1).head()
    assert(hit.getAs[String]("vector_key") == "fox")
  }

  test("IVF index through the client: pruned search, staleness fallback") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-client3").toString
    val client = new GraftClient(spark, root)
    client.createCollection("ivf", dim = 8, metric = "l2", indexType = "IVF_FLAT", nlist = 4)
    def vec(seed: Int): Seq[Float] =
      (1 to 8).map(i => math.sin(seed * 0.7 + i * 1.31).toFloat)
    val rows = (0 until 200).map(i => (s"k$i", vec(i), Map("i" -> i.toString)))
    client.upsert("ivf", rows.toDF("key", "vec", "meta"))
    client.buildIndex("ivf", nlist = 4)

    val q = vec(17).toArray
    val viaIndex = client.search("ivf", q, k = 5).collect()
      .map(_.getAs[String]("vector_key")).toSeq
    assert(viaIndex.head == "k17")

    // exact (filter forces the exact path) must agree at these k
    val exact = client.search("ivf", q, k = 5, filter = Some(lit(true))).collect()
      .map(_.getAs[String]("vector_key")).toSeq
    assert(viaIndex == exact, "fresh IVF top-5 matches the exact scan")

    // upsert after the build → index is stale → exact fallback, and the
    // new key is findable immediately
    client.upsert("ivf", Seq(("fresh", vec(17), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    val after = client.search("ivf", q, k = 2).collect()
      .map(_.getAs[String]("vector_key")).toSeq
    assert(after.contains("fresh"), s"stale index must not hide new rows: $after")

    // rebuild → indexed path again, still sees the new key
    client.buildIndex("ivf", nlist = 4)
    val rebuilt = client.search("ivf", q, k = 2).collect()
      .map(_.getAs[String]("vector_key")).toSeq
    assert(rebuilt.contains("fresh"))
  }

  test("cosine and dot metrics order correctly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-client2").toString
    val client = new GraftClient(spark, root)
    client.createCollection("cos", dim = 2, metric = "cosine")
    client.upsert("cos", Seq(
      ("east", Seq(1.0f, 0.0f), Map.empty[String, String]),
      ("north", Seq(0.0f, 1.0f), Map.empty[String, String]),
      ("northeast", Seq(1.0f, 1.0f), Map.empty[String, String])
    ).toDF("key", "vec", "meta"))
    val top = client.search("cos", Array(1.0f, 0.1f), k = 3).collect()
      .map(_.getAs[String]("vector_key")).toSeq
    assert(top == Seq("east", "northeast", "north"))
  }
}
