package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Uniform access to the driver-generated parquet tables (TESTDATA.md).
  * One directory per scale factor; one parquet file per table. At cluster
  * scale these would be partitioned directories — `spark.read.parquet` on a
  * directory is the same call, so nothing here changes at 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its TIMESTAMP(NANOS) column usable as a Spark timestamp.
    * Spark's TimestampType is µs; the fixture writes ns, which the vanilla
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). We read ns-as-long
    * (`spark.sql.legacy.parquet.nanosAsLong`, set session-wide in
    * Verify/Bench/tests) and truncate to µs — the same truncation DuckDB
    * applies casting TIMESTAMP_NS → TIMESTAMP, so oracles stay exact. */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      // Integer FLOOR division, NOT `/` and NOT bare `div`: ns-since-epoch
      // (~1.7e18) exceeds double's 2^53 exact range, so float division
      // would round the microseconds; and `div` truncates toward zero
      // while DuckDB's TIMESTAMP_NS→TIMESTAMP cast floors — they disagree
      // on pre-1970 (negative-ns) timestamps. pmod-based floor matches
      // DuckDB on both sides of the epoch.
      .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
}
