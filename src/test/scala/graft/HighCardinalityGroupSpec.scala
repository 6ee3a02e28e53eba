package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** Grouping search at HIGH group cardinality — the "one hit per source
  * document" pattern (Milvus `group_by_field` on a near-unique meta key).
  *
  * An earlier `searchGrouped` ranked groups with an unpartitioned
  * `dense_rank` window: value-correct, but every survivor row funneled
  * through ONE task — at |groups| ≈ corpus size that is the whole corpus
  * in a single sort. This spec pins the scale-safe two-pass shape at tens
  * of thousands of groups: exact results against a locally-computed
  * expectation AND a window-free physical plan, so a future refactor
  * cannot quietly reintroduce the funnel while staying value-correct on
  * the tiny label-cardinality test. */
class HighCardinalityGroupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("high-cardinality-group-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("grouped search by a unique-ish key: exact ranks at 10k groups, no window in the plan") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-hcgroup").toString
    val client = new GraftClient(spark, root)
    client.createCollection("hc", dim = 2)
    // 10k groups ("documents") of 2 members each; group g sits at distance
    // band g from the origin query, members at g.0 and g.3 — every group
    // best is distinct, so the expected top-k groups are exactly d0..d(k-1)
    val nGroups = 10000
    val rows = (0 until nGroups).flatMap { g =>
      Seq((s"k${g}a", Seq(g.toFloat, 0f), Map("doc" -> s"d$g")),
          (s"k${g}b", Seq(g.toFloat + 0.3f, 0f), Map("doc" -> s"d$g")))
    }
    client.upsert("hc", rows.toDF("key", "vec", "meta"))

    val out = client.searchGrouped("hc", Array(0f, 0f), k = 5,
      groupByKey = "doc", groupSize = 2)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "high-cardinality grouped plan must stay window-free — an " +
        "unpartitioned rank window serializes all groups through one task")
    val got = out.collect().map(r => (r.getAs[String]("group_value"),
      r.getAs[Long]("grp_rank"), r.getAs[Long]("rn"),
      r.getAs[String]("vector_key"))).toSeq
    val expected = (0 until 5).flatMap { g =>
      Seq((s"d$g", (g + 1).toLong, 1L, s"k${g}a"),
          (s"d$g", (g + 1).toLong, 2L, s"k${g}b"))
    }
    assert(got == expected,
      "top-5 groups must be the 5 nearest bands with both members, in rank order")

    // groupSize=1 at singleton granularity — "k hits from k distinct docs"
    val one = client.searchGrouped("hc", Array(0f, 0f), k = 7, groupByKey = "doc")
      .collect().map(_.getAs[String]("vector_key")).toSeq
    assert(one == (0 until 7).map(g => s"k${g}a"),
      "groupSize=1 returns the best member of each of the 7 nearest docs")
  }
}
