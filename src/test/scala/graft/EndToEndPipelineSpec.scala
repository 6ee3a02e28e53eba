package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ingest.Embedder
import graft.sources.ObjectSources
import graft.streaming.StreamingIngest
import graft.functions.VectorFunctions

/** The reference's full lifecycle, end to end (SURVEY §3.1–§3.2): event log
  * → parse → branch delete/put → fetch object bytes → embed → upsert →
  * keyed parquet index → top-k search with metadata projection, matching
  * the result shape of `s3vectors-app/search.py:61-69`. */
class EndToEndPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("e2e-pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ingest log → embedded keyed index → search returns the right object") {
    import spark.implicits._

    // 1. Event log (FIXTURES.md §2.1 shape: put, put, same-key copy
    //    overwrite, put+delete of a ghost key).
    val raw = spark.read.text("src/test/resources/events/ingest_log.jsonl")
      .withColumn("seq", monotonically_increasing_id())
      .withColumn("event_ts",
        (unix_timestamp(lit("2024-01-01 10:00:00")) + col("seq")).cast("timestamp"))
    val parsed = StreamingIngest.parseEvents(raw, tsCol = Some("event_ts"))

    // 2. Merge into an empty index: upsert last-write-wins + delete branch.
    val emptyIndex = Seq.empty[(String, String, Map[String, String], Timestamp, Long)]
      .toDF("key", "bucket", "tags", "event_ts", "seq")
    val index = StreamingIngest.mergeBatch(emptyIndex, parsed)
    val keys = index.select("key").as[String].collect().sorted
    assert(keys.toSeq == Seq("doc1.txt", "doc2.txt"), "ghost deleted, dup collapsed")
    // the copy (rev 2) must have won for doc1
    val doc1tags = index.filter($"key" === "doc1.txt").select("tags")
      .as[Map[String, String]].head()
    assert(doc1tags == Map("category" -> "docs", "rev" -> "2"))

    // 3. Fetch object bytes for live keys (A3) + embed (A4) + float32 vec.
    val objects = ObjectSources.withObjectKey(
      ObjectSources.textObjects(spark, "src/test/resources/objects/text/doc*.txt"),
      "objects/text")
    val embedded = Embedder.embedDocuments(
      index.join(objects, Seq("key")), "text")
    assert(embedded.count() == 2)
    assert(embedded.select("vec").head().getSeq[Float](0).length == Embedder.TextDim)

    // 4. Write the keyed parquet collection; read back (A20 batch snapshot).
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    embedded.select("key", "bucket", "tags", "vec")
      .write.mode("overwrite").parquet(s"$dir/collection")
    val collection = spark.read.parquet(s"$dir/collection")

    // 5. Search: embed the query text, top-2 by L2 with metadata projection
    //    — the client result shape of search.py:61-69.
    val q = Embedder.text.embedText("the quick brown fox jumps")
    val hits = collection
      .select($"key".as("vector_key"),
        round(VectorFunctions.l2_distance($"vec", typedLit(q)), 6).as("distance"),
        to_json($"tags").as("metadata"))
      .orderBy($"distance", $"vector_key")
      .limit(2)
      .collect()
    assert(hits.length == 2)
    assert(hits.head.getAs[String]("vector_key") == "doc1.txt",
      s"nearest must be the fox doc, got ${hits.toSeq}")
    assert(hits.head.getAs[Double]("distance") < hits(1).getAs[Double]("distance"))
    assert(hits.head.getAs[String]("metadata").contains("\"rev\":\"2\""))
  }

  test("streaming events drive GraftClient upserts (the full production loop)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-stream").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("live", dim = Embedder.TextDim)

    // object payloads live in the object store; events land as JSON lines
    val objects = ObjectSources.withObjectKey(
      ObjectSources.textObjects(spark, "src/test/resources/objects/text/doc*.txt"),
      "objects/text").select(col("key"), col("text"))

    spark.read.text("src/test/resources/events/ingest_log.jsonl")
      .coalesce(1).write.mode("overwrite").text(s"$root/landing")
    // the whole reference service is one client call
    val q = client.startIngest("live", s"$root/landing", objects)
    q.awaitTermination(120000)

    val hit = client.search("live", Embedder.text.embedText("the quick brown fox jumps"), 1).head()
    assert(hit.getAs[String]("vector_key") == "doc1.txt")
    assert(hit.getAs[Map[String, String]]("metadata")("rev") == "2",
      "the Copy overwrite's tags must have won")
    // delete-then-re-put of doc2 within the drained batch: the re-put
    // (last event in arrival order) must win, with its tags
    val d2 = client.search("live",
      Embedder.text.embedText("ceph object storage event notification pipeline"), 1).head()
    assert(d2.getAs[String]("vector_key") == "doc2.txt",
      "re-put after delete must keep the key alive")
    assert(d2.getAs[Map[String, String]]("metadata")("rev") == "9")
  }
}
