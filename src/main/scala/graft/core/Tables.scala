package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
