package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** recommendIndex (r16 — VERDICT r15's #5): BASELINE.md's measured
  * FLAT-vs-walk guidance as an API answer. Pins the regime classifier's
  * calibration on the two measured geometries (iid uniform =
  * concentrated distances, 64-blob clustered = high relative contrast),
  * the servable-index recall read, and that the surface never touches
  * the dispatch default (searches behave identically before and after). */
class RecommendIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("recommend-index-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dim = 64

  // deterministic splitmix64-ish pseudo-randoms (no Math.random in specs)
  private def rnd(seed: Long): Double = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble
  }

  /** iid uniform in [-0.5, 0.5)^dim — the distance-concentration regime. */
  private def iidVec(i: Int): Seq[Float] =
    Seq.tabulate(dim)(j => (rnd(i.toLong * 1009 + j) - 0.5).toFloat)

  /** 16 tight blobs: center per (i % 16), jitter 1% of the spread. */
  private def blobVec(i: Int): Seq[Float] = {
    val c = i % 16
    Seq.tabulate(dim)(j =>
      ((rnd(c.toLong * 7919 + j) - 0.5) * 10.0 +
        (rnd(i.toLong * 104729 + j) - 0.5) * 0.1).toFloat)
  }

  private def mk(name: String, vecs: Int => Seq[Float], n: Int,
                 indexType: String = "FLAT"): GraftClient = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("recidx").toString
    val c = new GraftClient(spark, root)
    c.createCollection(name, dim = dim, indexType = indexType, buckets = 4)
    c.upsert(name, (0 until n)
      .map(i => (f"k$i%05d", vecs(i), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    c
  }

  test("iid corpus classifies iid-like and recommends FLAT") {
    val c = mk("iid", iidVec, 600)
    val r = c.recommendIndex("iid")
    assert(r.regime == "iid-like",
      s"iid uniform must classify iid-like (RC = ${r.relativeContrast})")
    assert(r.relativeContrast < 2.0)
    assert(r.recommendation.startsWith("FLAT"))
    assert(r.currentIndexType == "FLAT" && !r.indexServable &&
      r.recallAtDefaults.isEmpty)
    assert(r.rows == 600 && r.sampledRows == 256)
  }

  test("clustered corpus classifies clustered; FLAT recommends building; " +
       "a servable index reports measured recall and keeps itself") {
    val c = mk("blobs", blobVec, 600)
    val r0 = c.recommendIndex("blobs")
    assert(r0.regime == "clustered",
      s"64-blob corpus must classify clustered (RC = ${r0.relativeContrast})")
    assert(r0.relativeContrast >= 2.0)
    assert(r0.recommendation.contains("HNSW"))

    // with a fresh servable index: recall measured at default knobs,
    // recommendation keeps the index
    val ci = mk("blobsivf", blobVec, 600, indexType = "IVF_FLAT")
    ci.buildIndex("blobsivf", nlist = 16)
    val r1 = ci.recommendIndex("blobsivf")
    assert(r1.regime == "clustered" && r1.indexServable)
    assert(r1.recallAtDefaults.nonEmpty)
    assert(r1.recallAtDefaults.get > 0.0 && r1.recallAtDefaults.get <= 1.0)
    assert(r1.recommendation.startsWith("keep IVF_FLAT"))

    // the surface changed NO dispatch: the same search, same plan class,
    // before and after the recommendation ran
    val q = blobVec(3).toArray
    val before = ci.search("blobsivf", q, k = 5, nprobe = 16)
      .collect().map(_.getString(0)).toSeq
    ci.recommendIndex("blobsivf")
    val after = ci.search("blobsivf", q, k = 5, nprobe = 16)
      .collect().map(_.getString(0)).toSeq
    assert(before == after)
  }

  test("boundary refusals: tiny corpus, non-float families") {
    import spark.implicits._
    val c = mk("tiny", iidVec, 4)
    intercept[IllegalArgumentException] { c.recommendIndex("tiny") }

    val root = java.nio.file.Files.createTempDirectory("recidx").toString
    val cb = new GraftClient(spark, root)
    cb.createCollection("bin", dim = 64, metric = "hamming",
      vectorType = "BINARY_VECTOR")
    intercept[IllegalArgumentException] { cb.recommendIndex("bin") }
  }
}
