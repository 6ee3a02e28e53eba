package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.{VectorAggregates, VectorCentroid}
import graft.ingest.IngestOps

/** Property tests (SURVEY §5.2.1): metric laws for the vector kernels,
  * aggregator laws for VectorCentroid, upsert/delete algebra. Kernels are
  * exercised through the Column API against Scala-side recomputation. */
class VectorPropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  // Deterministic sampled property checks (scalatestplus-scalacheck is not
  // in the offline cache; plain seeded sampling gives the same coverage).
  private val rnd = new scala.util.Random(42)
  private def randVec(d: Int): Seq[Float] =
    Seq.fill(d)(rnd.nextFloat() * 200f - 100f)
  private def sampled(n: Int)(body: => Unit): Unit = (1 to n).foreach(_ => body)

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("vector-properties-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def eval2(fn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                    a: Seq[Float], b: Seq[Float]): Double = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq((a, b)).toDF("a", "b").select(fn(col("a"), col("b"))).head().getDouble(0)
  }

  test("l2_distance: identity, symmetry, triangle inequality (sampled)") {
    import graft.functions.VectorFunctions.l2_distance
    sampled(25) {
      val d = 2 + rnd.nextInt(15)
      val (a, bb, c) = (randVec(d), randVec(d), randVec(d))
      val dAA = eval2(l2_distance, a, a)
      val dAB = eval2(l2_distance, a, bb)
      val dBA = eval2(l2_distance, bb, a)
      val dAC = eval2(l2_distance, a, c)
      val dCB = eval2(l2_distance, c, bb)
      assert(dAA == 0.0)
      assert(dAB == dBA)
      assert(dAB <= dAC + dCB + 1e-9)
    }
  }

  test("cosine_similarity bounded in [-1, 1]; dot is bilinear under negation") {
    import graft.functions.VectorFunctions.{cosine_similarity, dot_product}
    sampled(25) {
      val d = 2 + rnd.nextInt(15)
      val (a, b) = (randVec(d), randVec(d))
      val cos = eval2(cosine_similarity, a, b)
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
      val d1 = eval2(dot_product, a, b)
      val d2 = eval2(dot_product, a.map(-_), b)
      assert(math.abs(d1 + d2) < 1e-6 * math.max(1.0, math.abs(d1)))
    }
  }

  test("l2_normalize yields unit norm for nonzero vectors") {
    import graft.functions.VectorFunctions.{l2_normalize, vector_norm}
    import spark.implicits._
    import org.apache.spark.sql.functions._
    sampled(25) {
      val a = randVec(2 + rnd.nextInt(15))
      val n = Seq(a).toDF("v")
        .select(vector_norm(l2_normalize(col("v")))).head().getDouble(0)
      assert(math.abs(n - 1.0) < 1e-5)
    }
  }

  test("VectorCentroid: reduce/merge associativity and correct mean") {
    val agg = new VectorCentroid
    sampled(20) {
      val vs: List[Array[Float]] = List.fill(8)(Array.fill(4)(rnd.nextFloat() * 100f - 50f))
      val whole = vs.foldLeft(agg.zero)(agg.reduce)
      for (split <- Seq(1, vs.length / 2, vs.length - 1) if split > 0 && split < vs.length) {
        val (l, r) = vs.splitAt(split)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        assert(merged._2 == whole._2)
        merged._1.zip(whole._1).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
      }
      val mean = agg.finish(vs.foldLeft(agg.zero)(agg.reduce))
      val expect = (0 until 4).map(i => vs.map(_(i)).sum / vs.length)
      mean.toSeq.zip(expect).foreach { case (x, y) => assert(math.abs(x - y) < 1e-3) }
    }
    // "no rows" is count==0, not an empty sum array: a zero-LENGTH vector
    // is a real (degenerate) dimension, so a later 2-dim vector must trip
    // the mismatch require instead of slipping past an "empty" buffer and
    // diluting the mean with an inflated count
    val zeroLen = agg.reduce(agg.zero, Array.emptyFloatArray)
    assert(zeroLen._2 == 1L)
    intercept[IllegalArgumentException] { agg.reduce(zeroLen, Array(1f, 2f)) }
    intercept[IllegalArgumentException] {
      agg.merge(zeroLen, agg.reduce(agg.zero, Array(1f, 2f)))
    }
  }

  test("vector_centroid over a DataFrame groups (and SQL registration)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)),
      (1, Seq(10.0f, 0.0f))).toDF("cell", "vec")
    val rows = df.groupBy($"cell")
      .agg(VectorAggregates.vectorCentroid($"vec").as("c"))
      .orderBy("cell").collect()
    assert(rows(0).getSeq[Float](1) == Seq(2.0f, 4.0f))
    assert(rows(1).getSeq[Float](1) == Seq(10.0f, 0.0f))
    VectorAggregates.register(spark)
    df.createOrReplaceTempView("cells")
    val viaSql = spark.sql("SELECT cell, vector_centroid(vec) c FROM cells GROUP BY cell ORDER BY cell")
      .collect()(0).getSeq[Float](1)
    assert(viaSql == Seq(2.0f, 4.0f))
  }

  test("IVF centroid refresh follows the data") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (indexed, quant) = graft.index.IvfIndex.build(emb, "embedding", nlist = 4)
    val refreshed = graft.index.IvfIndex.refreshCentroids(indexed, "embedding", quant)
    assert(refreshed.nlist == 4)
    // KMeans centers are already the cell means, so refresh ~ no-op here
    quant.centers.zip(refreshed.centers).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-4) }
    }
  }

  test("upsert algebra: idempotent; delete∘upsert removes the key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(
      ("k1", 1L, "v1"), ("k1", 2L, "v2"), ("k2", 1L, "w1")
    ).toDF("key", "ts", "payload")
    val once = IngestOps.upsertLatest(events, col("key"), col("ts"), col("ts"))
    val twice = IngestOps.upsertLatest(once, col("key"), col("ts"), col("ts"))
    assert(once.orderBy("key").collect().toSeq == twice.orderBy("key").collect().toSeq)
    assert(once.count() == 2)
    val afterDelete = IngestOps.deleteByKey(once, Seq("k1").toDF("key"), "key")
    assert(afterDelete.select("key").as[String].collect().toSeq == Seq("k2"))
  }
}
