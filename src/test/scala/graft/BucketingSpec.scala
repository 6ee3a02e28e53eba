package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Co-located joins via bucketing (100 TB posture): two tables bucketed on
  * the join key join WITHOUT any Exchange — the shuffle happened once at
  * write time and every subsequent join reuses it. This is the layout a
  * repeatedly-joined 100 TB fact table wants. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("bucketing-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    // force a non-broadcast join so the bucketing (not a broadcast) is
    // what eliminates the exchanges
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("join of two tables bucketed on the key plans with zero shuffles") {
    val sf = "/root/testdata/sf0.01"
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    spark.read.parquet(s"$sf/customer.parquet")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")

    val joined = spark.table("orders_bucketed")
      .join(spark.table("customer_bucketed"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)").as("total"))

    joined.collect() // materialize so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    val joinExchanges = "Exchange hashpartitioning\\((o_custkey|c_custkey)".r
      .findAllIn(plan).size
    assert(joinExchanges == 0,
      s"bucketed join must not shuffle on the join key:\n$plan")

    // same join on the raw (unbucketed) parquet DOES shuffle both sides
    val unbucketed = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
    unbucketed.collect()
    val rawPlan = unbucketed.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(rawPlan).size >= 2,
      "control: the unbucketed join shuffles both sides")

    // and the results match the plain join
    val viaBuckets = joined.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val plain = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(viaBuckets == plain)
  }
}
