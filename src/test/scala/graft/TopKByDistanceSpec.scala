package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.{ScoredHit, TopKByDistance, VectorAggregates}

class TopKByDistanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("topk-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("reduce keeps a bounded, sorted buffer with vec_id tiebreak") {
    val agg = new TopKByDistance(3)
    val hits = Seq(
      ScoredHit(5.0, 1), ScoredHit(1.0, 2), ScoredHit(3.0, 3),
      ScoredHit(1.0, 1), ScoredHit(0.5, 9), ScoredHit(10.0, 4))
    val buf = hits.foldLeft(agg.zero)(agg.reduce)
    assert(buf == Vector(ScoredHit(0.5, 9), ScoredHit(1.0, 1), ScoredHit(1.0, 2)))
  }

  test("merge equals reduce over the concatenation, in any split") {
    val agg = new TopKByDistance(4)
    val all = (1 to 20).map(i => ScoredHit((i * 7 % 13).toDouble, i.toLong))
    val expected = all.foldLeft(agg.zero)(agg.reduce)
    for (split <- Seq(0, 5, 10, 20)) {
      val (l, r) = all.splitAt(split)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expected, s"split at $split")
    }
  }

  test("udaf matches a rank-window top-k on a real DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i % 7L, (i * 31 % 97).toDouble, i.toLong))
      .toDF("qid", "dist", "vec_id")
    val topk = VectorAggregates.topKByDist(5)
    val viaAgg = df.groupBy($"qid")
      .agg(topk($"dist", $"vec_id").as("tops"))
      .select($"qid", posexplode($"tops").as(Seq("pos", "hit")))
      .select($"qid", $"hit.dist".as("dist"), $"hit.vec_id".as("vec_id"))
      .orderBy($"qid", $"dist", $"vec_id")
      .collect().toSeq
    val w = Window.partitionBy($"qid").orderBy($"dist", $"vec_id")
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"qid", $"dist", $"vec_id")
      .orderBy($"qid", $"dist", $"vec_id")
      .collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("plan partial-aggregates before the exchange (scale posture)") {
    val df = graft.queries.VectorQueries.knnBatched(spark, "/root/testdata/sf0.001")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("partial_topkbydistance"),
      s"expected partial top-k aggregation before the shuffle, got:\n$physical")
    assert(!physical.contains("Window"), "rank-window plan must be gone")
  }

  test("SQL registration") {
    VectorAggregates.register(spark, k = 2)
    import spark.implicits._
    Seq((1L, 3.0, 10L), (1L, 1.0, 11L), (1L, 2.0, 12L)).toDF("qid", "dist", "id")
      .createOrReplaceTempView("hits")
    val rows = spark.sql(
      "SELECT qid, topk_by_dist(dist, id) AS tops FROM hits GROUP BY qid").collect()
    assert(rows.length == 1)
    val tops = rows.head.getSeq[org.apache.spark.sql.Row](1)
    assert(tops.map(r => (r.getDouble(0), r.getLong(1))) == Seq((1.0, 11L), (2.0, 12L)))
  }
}
