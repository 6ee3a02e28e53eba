package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.index.SparseIndex
import graft.operators.SparseSearch

/** SparseIndex at-rest layout: lossless bucket prune, score parity with
  * the raw-postings operator, partition-prune plan shape. */
class SparseIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  private val vecs: Map[Long, Map[Long, Double]] = (0L until 80L).map { id =>
    id -> Seq.fill(7)((rnd.nextInt(50).toLong,
      math.rint((rnd.nextDouble() * 3 + 0.25) * 100) / 100)).toMap
  }.toMap
  private def postingsDf =
    vecs.toSeq.flatMap { case (id, m) => m.map { case (d, w) => (id, d, w) } }
      .toDF("id", "dim", "w")
  private val query: Seq[(Long, Double)] = Seq((2L, 1.0), (9L, 2.0), (31L, 0.5))

  private def freshIndex(buckets: Int = 16): String = {
    val dir = java.nio.file.Files.createTempDirectory("sparse-idx").toString
    SparseIndex.build(postingsDf, dir, buckets = buckets)
    dir
  }

  test("topK via index == topK via raw postings, both metrics") {
    val dir = freshIndex()
    for (metric <- Seq("dot", "cosine")) {
      val viaIndex = SparseIndex.topK(spark, dir, query, k = 12, metric)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val viaRaw = SparseSearch.topK(postingsDf, query, k = 12, metric)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(viaIndex.map(_._1).toSeq == viaRaw.map(_._1).toSeq, s"$metric ids diverged")
      viaIndex.zip(viaRaw).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-12, s"$metric scores diverged: $a vs $b")
      }
    }
  }

  test("topKBatch via index == via raw postings, both metrics") {
    val dir = freshIndex()
    val qp = Seq((1L, 2L, 1.0), (1L, 9L, 2.0), (2L, 31L, 0.5), (2L, 44L, 1.5))
      .toDF("qid", "dim", "w")
    for (metric <- Seq("dot", "cosine")) {
      val viaIndex = SparseIndex.topKBatch(spark, dir, qp, k = 6, metric)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val viaRaw = SparseSearch.topKBatch(postingsDf, qp, k = 6, metric)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      assert(viaIndex.map(t => (t._1, t._2, t._4)).toSeq ==
        viaRaw.map(t => (t._1, t._2, t._4)).toSeq, s"$metric rankings diverged")
      viaIndex.zip(viaRaw).foreach { case ((_, _, a, _), (_, _, b, _)) =>
        assert(math.abs(a - b) < 1e-12)
      }
    }
  }

  test("the scan is partition-pruned to the query dims' buckets") {
    val dir = freshIndex(buckets = 16)
    val plan = SparseIndex.topK(spark, dir, query, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket partition prune missing:\n${plan.take(2000)}")
    assert(plan.contains("PushedFilters") && plan.contains("In(dim"),
      s"dim IN pushdown missing:\n${plan.take(2000)}")
    // driver-side bucket fn matches the executor-side partition column:
    // every queried dim's posting must actually be found (lossless prune)
    val hitDims = query.map(_._1).toSet
    val expectIds = vecs.collect {
      case (id, m) if m.keySet.intersect(hitDims).nonEmpty => id
    }.toSet
    val gotIds = SparseIndex.topK(spark, dir, query, k = 80)
      .collect().map(_.getLong(0)).toSet
    assert(gotIds == expectIds, "prune lost (or invented) candidate docs")
  }

  test("cosine norms come from the side table, not the pruned scan") {
    // a doc with ONE queried dim and many un-queried ones: a norm derived
    // from the pruned frame would be too small, inflating its cosine
    val dir = java.nio.file.Files.createTempDirectory("sparse-idx").toString
    val p = Seq((1L, 5L, 1.0), (1L, 100L, 10.0), (1L, 101L, 10.0),
      (2L, 5L, 1.0)).toDF("id", "dim", "w")
    SparseIndex.build(p, dir, buckets = 8)
    val got = SparseIndex.topK(spark, dir, Seq((5L, 1.0)), k = 2, "cosine")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val n1 = math.sqrt(1.0 + 100.0 + 100.0)
    assert(math.abs(got(1L) - 1.0 / n1) < 1e-12,
      s"doc 1's cosine must use its FULL norm $n1, got ${got(1L)}")
    assert(math.abs(got(2L) - 1.0) < 1e-12)
  }

  test("querying an unbuilt path fails loudly") {
    val e = intercept[IllegalArgumentException](
      SparseIndex.topK(spark, "/tmp/definitely-not-an-index", query, 3))
    assert(e.getMessage.contains("build first"))
  }
}
