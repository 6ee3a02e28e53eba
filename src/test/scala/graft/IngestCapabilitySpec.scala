package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ingest.{Embedder, HashingEmbedder, Multimodal}
import graft.sources.ObjectSources
import graft.index.{Catalog, CollectionMeta, IvfIndex}

/** Capability tests (SURVEY A3–A5, A16/A17, B5, C1 binary/text sources):
  * pieces verified by unit/e2e tests rather than the DuckDB oracle. */
class IngestCapabilitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-capability-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resources = "src/test/resources/objects"

  override def afterAll(): Unit = spark.stop()

  // ---- Embedder (A4/A5) ----

  test("HashingEmbedder: dims, unit norm, determinism, float32") {
    for ((e, dim) <- Seq((Embedder.text, 384), (Embedder.image, 512))) {
      val v = e.embedText("the quick brown fox")
      assert(v.length == dim)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
      assert(v.toSeq == e.embedText("the quick brown fox").toSeq, "deterministic")
    }
    val b = Embedder.image.embedBytes(Array.tabulate[Byte](64)(_.toByte))
    assert(b.length == 512)
    assert(Embedder.text.embedText("") forall (_ == 0.0f), "empty text → zero vector")
  }

  test("similar texts embed closer than dissimilar ones") {
    val e = HashingEmbedder(384)
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = e.embedText("spark vector search engine over parquet files")
    val near = e.embedText("spark vector search engine over parquet data")
    val far = e.embedText("completely unrelated words about gardening tools")
    assert(cos(base, near) > cos(base, far))
  }

  // ---- Object sources (A3, C1) ----

  test("text wholetext source: one row per object, UTF-8 decode") {
    val df = ObjectSources.textObjects(spark, s"$resources/text/*.txt")
    val rows = df.collect()
    // NB: Spark's file sources (text AND binaryFile) emit NO row for a
    // 0-byte file — empty objects vanish from a scan. The reference would
    // have embedded the empty string instead; an ingest pipeline that must
    // index empty objects has to handle them at the event layer (the
    // notification carries size=0), not via a storage scan.
    assert(rows.length == 3)
    val byPath = rows.map(r => (r.getAs[String]("path").split('/').last, r.getAs[String]("text"))).toMap
    assert(!byPath.contains("empty.txt"))
    assert(byPath("doc1.txt").contains("quick brown fox"))
    assert(byPath("doc1.txt").contains("\n"), "wholetext keeps newlines")
    assert(byPath("nonascii.txt").contains("café") && byPath("nonascii.txt").contains("日本語"))
    val bin = ObjectSources.binaryObjects(spark, s"$resources/text/empty.txt").collect()
    assert(bin.isEmpty, "binaryFile drops empty objects too")
  }

  test("binaryFile source: content + length metadata") {
    val df = ObjectSources.binaryObjects(spark, s"$resources/bin/*")
    val rows = df.collect()
    assert(rows.length == 3)
    val img = rows.find(_.getAs[String]("path").endsWith("img1.png")).get
    assert(img.getAs[Long]("length") == 2048L)
    assert(img.getAs[Array[Byte]]("content").length == 2048)
  }

  test("end-to-end: text objects → embed → search finds the right doc") {
    import org.apache.spark.sql.functions._
    val docs = ObjectSources.textObjects(spark, s"$resources/text/doc*.txt")
    val embedded = Embedder.embedDocuments(docs, "text")
    val q = Embedder.text.embedText("quick brown fox jumps")
    val top = embedded
      .select(col("path"), graft.functions.VectorFunctions
        .dot_product(col("vec"), typedLit(q)).as("sim"))
      .orderBy(desc("sim")).limit(1).collect()
    assert(top.head.getAs[String]("path").endsWith("doc1.txt"))
  }

  // ---- Multimodal (mandate) ----

  test("multimodal pipeline: binary scan → typed dataset → features") {
    import spark.implicits._
    val media = Multimodal.fromBinaryFiles(spark, s"$resources/bin/*")
    val types = media.collect().map(m => (m.key.split('/').last, m.mediaType)).toMap
    assert(types("img1.png") == "image" && types("clip1.wav") == "audio"
      && types("vid1.mp4") == "video")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(_.features.length == Embedder.ImageDim))
    assert(feats.forall(f => f.width >= 16 && f.height >= 16 && f.nFrames >= 1))
    val vid = feats.find(_.key.endsWith("vid1.mp4")).get
    assert(vid.nFrames == 1 + 3000 / 1024)
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media).collect()
      .find(_.key.endsWith("vid1.mp4")).get
    assert(vid.features.toSeq == again.features.toSeq)
    val sampled = Multimodal.sampleFrameIndexes(
      Multimodal.extractFeatures(media).toDF(), stride = 2)
      .where($"key".endsWith("vid1.mp4"))
      .select($"sampled_frames").head().getSeq[Int](0)
    assert(sampled == Seq(0, 2))
    // resize: aspect ratio preserved, never upscales, bounded by the box
    val resized = Multimodal.resize(Multimodal.extractFeatures(media), 8, 8).collect()
    assert(resized.forall(f => f.width <= 8 && f.height <= 8))
    val orig = feats.map(f => f.key -> (f.width, f.height)).toMap
    resized.foreach { f =>
      val (w0, h0) = orig(f.key)
      val ratio0 = w0.toDouble / h0
      val ratio1 = f.width.toDouble / f.height
      assert(math.abs(ratio0 - ratio1) / ratio0 < 0.35, s"aspect drift for ${f.key}")
    }
  }

  // ---- Catalog (A16/A17) ----

  test("catalog: idempotent create, describe, list, drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val cat = new Catalog(dir)
    val meta = CollectionMeta("bkt_text_0001", 384, "l2", "IVF_FLAT", 16384, "/data/bkt_text_0001")
    assert(cat.createCollection(meta), "first create wins")
    assert(!cat.createCollection(meta.copy(dim = 999)), "second create is a no-op")
    assert(cat.describeCollection("bkt_text_0001").get.dim == 384, "no-op kept original")
    assert(cat.hasCollection("bkt_text_0001"))
    cat.createCollection(CollectionMeta("bkt_img", 512, "l2", "FLAT", 1, "/data/bkt_img"))
    assert(cat.listCollections() == Seq("bkt_img", "bkt_text_0001"))
    assert(cat.dropCollection("bkt_img"))
    assert(cat.listCollections() == Seq("bkt_text_0001"))
    intercept[IllegalArgumentException] { cat.describeCollection("../evil") }
  }

  test("catalog: racing creates elect exactly one winner, metadata intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog3").toString
    val cat = new Catalog(dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val attempts = (0 until 16).map { i =>
      Future {
        gate.await()
        val won = cat.createCollection(
          CollectionMeta("raced", dim = i, "l2", "FLAT", 0, s"/data/raced-$i"))
        (i, won)
      }
    }
    gate.countDown()
    val outcomes = Await.result(Future.sequence(attempts), 60.seconds)
    val winners = outcomes.filter(_._2)
    assert(winners.size == 1, s"exactly one create must win, got $winners")
    val stored = cat.describeCollection("raced").get
    assert(stored.dim == winners.head._1,
      "the stored metadata must be the winner's, not a loser's overwrite")
  }

  test("catalog round-trips dataPaths containing JSON-hostile characters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog2").toString
    val cat = new Catalog(dir)
    val nasty = """/tmp/run,2026/{weird}/pa"th\seg"""
    cat.createCollection(CollectionMeta("nasty", 64, "l2", "FLAT", 1, nasty))
    assert(cat.describeCollection("nasty").get.dataPath == nasty)
  }

  // ---- IVF (B5) ----

  test("IVF: nprobe=nlist equals exact scan; partial probe keeps decent recall") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val (indexed, quantizer) = IvfIndex.build(emb, "embedding", nlist = 16)
    indexed.cache().count()
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray

    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getAs[Long]("vec_id")).toSeq

    val exact = ids(emb
      .select(col("vec_id"), graft.functions.VectorFunctions
        .l2_distance(col("embedding"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10))

    val full = ids(IvfIndex.searchL2(indexed, quantizer, "embedding", "vec_id", q, 10, nprobe = 16))
    assert(full == exact, "nprobe = nlist must reproduce the exact scan")

    val pruned = ids(IvfIndex.searchL2(indexed, quantizer, "embedding", "vec_id", q, 10, nprobe = 4))
    val recall = pruned.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 with nprobe=4/16 was $recall")
    assert(pruned.contains(7L), "the query's own row lives in the probed cell")
    indexed.unpersist()
  }

  test("IVF at rest: probe filter becomes a parquet partition prune") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val (indexed, quantizer) = IvfIndex.build(emb, "embedding", nlist = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.writeIndexed(indexed, path)
    val loaded = IvfIndex.loadIndexed(spark, path)
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray
    val res = IvfIndex.searchL2(loaded, quantizer, "embedding", "vec_id", q, 5, nprobe = 2)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroidId"),
      s"expected partition pruning on centroidId, got:\n$plan")
    assert(res.collect().map(_.getAs[Long]("vec_id")).contains(7L))
  }
}
