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

  /** `events` with its timestamp column normalized to Spark's TimestampType
    * (µs, session tz = UTC everywhere we run). The fixture's `ts` physical
    * type has varied across driver regenerations, so dispatch on what the
    * file actually holds instead of assuming one layout:
    *   - TIMESTAMP(µs) / TIMESTAMP_NTZ (current fixtures): a value-preserving
    *     cast under the UTC session tz — DuckDB reads the same file as its
    *     (tz-less) TIMESTAMP, so oracles agree byte-for-byte.
    *   - TIMESTAMP(NANOS) read as ns-since-epoch LONG (older fixtures, via
    *     `spark.sql.legacy.parquet.nanosAsLong`): floor-truncate ns → µs with
    *     integer pmod arithmetic — ns magnitudes (~1.7e18) exceed double's
    *     2^53 exact range so float division would round, and `div` truncates
    *     toward zero while DuckDB's TIMESTAMP_NS → TIMESTAMP cast floors;
    *     pmod-floor matches DuckDB on both sides of the epoch. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case _ =>
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
    }
  }
}
