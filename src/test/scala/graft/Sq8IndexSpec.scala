package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.index.{IvfIndex, Sq8Index}
import graft.functions.VectorFunctions

/** IVF-SQ8 quantized cells: the kernel must equal a Scala recomputation of
  * the dequantized distance, the error must honor the qmax/254 per-component
  * bound, refined search must recover the exact top-k, and the at-rest
  * layout must be meaningfully smaller while keeping the partition prune. */
class Sq8IndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("sq8-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.01"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def deleteRec(p: Path): Unit = TestDirs.deleteRec(p)

  /** Scala-side quantize + dequantize, the oracle for the fused kernel. */
  private def dequant(v: Array[Float]): Array[Double] = {
    val mx = v.map(x => math.abs(x.toDouble)).max
    if (mx == 0) v.map(_ => 0.0)
    else v.map(x => math.floor(x.toDouble * 127.0 / mx + 0.5) * mx / 127.0)
  }

  test("fused sq8 kernel equals distance over the dequantized vector") {
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val rows = Sq8Index.quantize(emb.filter(col("vec_id") < 50), "embedding")
      .select(col("vec_id"),
        VectorFunctions.sq8_l2_distance(col("qvec"), col("qmax"), typedLit(q)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = emb.filter(col("vec_id") < 50)
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        val dq = dequant(v)
        val d = math.sqrt(dq.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
        r.getLong(0) -> d
      }.toMap
    rows.foreach { case (id, d) =>
      assert(math.abs(d - exact(id)) < 1e-12,
        s"vec $id: kernel $d != recomputed ${exact(id)}")
    }
  }

  test("sq8 kernel is SQL-registered and dimension-checked") {
    VectorFunctions.register(spark)
    Sq8Index.quantize(emb.filter(col("vec_id") < 5), "embedding")
      .createOrReplaceTempView("sq8_t")
    val viaSql = spark.sql(
      "SELECT vec_id, sq8_l2_distance(qvec, qmax, array(0.0D)) AS d FROM sq8_t")
    val e = intercept[Exception] { viaSql.collect() }
    assert(e.getMessage != null && e.getMessage.contains("dimension mismatch"))
  }

  test("per-component error honors the qmax/254 bound") {
    val rows = emb.filter(col("vec_id") < 100)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    rows.foreach { v =>
      val mx = v.map(x => math.abs(x.toDouble)).max
      val dq = dequant(v)
      v.zip(dq).foreach { case (x, d) =>
        assert(math.abs(x.toDouble - d) <= mx / 254.0 + 1e-12,
          s"component error ${math.abs(x - d)} exceeds ${mx / 254.0}")
      }
    }
  }

  test("refined search recovers the exact top-k; approx alone ranks close") {
    val q = emb.filter(col("vec_id") === 7)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val (indexed, quant) = IvfIndex.build(emb, "embedding", nlist = 8)
    val sq8 = Sq8Index.quantize(indexed, "embedding")

    val exactTop = IvfIndex.searchL2(indexed, quant, "embedding", "vec_id",
      q, k = 10, nprobe = 8).collect().map(_.getLong(0))
    val refined = Sq8Index.searchRefinedL2(sq8, quant, emb, "embedding", "vec_id",
      q, k = 10, nprobe = 8, refine = 10).collect().map(_.getLong(0))
    assert(refined.sameElements(exactTop),
      s"refined ${refined.mkString(",")} != exact ${exactTop.mkString(",")}")

    val approx = Sq8Index.searchApproxL2(sq8, quant, "vec_id", q, k = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    val recall = approx.intersect(exactTop.toSet).size / 10.0
    assert(recall >= 0.6, s"sq8-only recall@10 $recall too low for ~0.5% error")
  }

  test("at-rest quantized cells are much smaller and keep the partition prune") {
    val (indexed, quant) = IvfIndex.build(emb, "embedding", nlist = 8)
    val floatDir = Files.createTempDirectory("ivf-float").toString
    val sq8Dir = Files.createTempDirectory("ivf-sq8").toString
    try {
      IvfIndex.writeIndexed(indexed.select("vec_id", "embedding", "centroidId"), floatDir)
      Sq8Index.writeQuantized(
        Sq8Index.quantize(indexed.select("vec_id", "embedding", "centroidId"), "embedding"),
        sq8Dir)
      val (fb, qb) = (TestDirs.dirBytes(floatDir), TestDirs.dirBytes(sq8Dir))
      assert(qb < fb / 2,
        s"sq8 cells $qb bytes must be well under half the float cells $fb")

      val loaded = Sq8Index.loadQuantized(spark, sq8Dir)
      val q = emb.filter(col("vec_id") === 3)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val plan = Sq8Index.searchApproxL2(loaded, quant, "vec_id", q, 5, nprobe = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("centroidId"),
        s"probe filter must prune cell directories:\n${plan.take(1500)}")
    } finally {
      deleteRec(java.nio.file.Paths.get(floatDir))
      deleteRec(java.nio.file.Paths.get(sq8Dir))
    }
  }

  test("zero vectors encode as qmax=0 with zero distance to a zero query") {
    import spark.implicits._
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, 2f, 2f))).toDF("id", "v")
    val sq8 = Sq8Index.quantize(df, "v")
    val d = sq8.select(col("id"),
        VectorFunctions.sq8_l2_distance(col("qvec"), col("qmax"),
          typedLit(Array(0f, 0f, 0f))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(1L) == 0.0)
    assert(math.abs(d(2L) - 3.0) < 0.05, "dequantized norm of (1,2,2) is ~3")
  }
}
