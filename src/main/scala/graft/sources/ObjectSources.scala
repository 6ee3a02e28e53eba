package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store scan sources (SURVEY A3, C1) — the engine-side equivalent
  * of the reference's `s3.get_object` fetch
  * (`s3vectors-app/pythonvectordbceph.py:155,160`;
  * `milvus-app/pythonvectordbceph_milvus.py:114`).
  *
  * In production these paths are `s3a://bucket/prefix` against RGW (Hadoop
  * S3A, `fs.s3a.endpoint` pointed at the gateway); the DataFrame shape is
  * identical for local files, which is what tests use. Listing + reads
  * parallelize across executors — each file is one row, split across tasks
  * by Spark's file source, so a million-object bucket scans as a normal
  * distributed read rather than the reference's one-GET-per-event loop.
  */
object ObjectSources {

  /** Binary objects (images, audio, any opaque payload): one row per file —
    * (path, modificationTime, length, content). */
  def binaryObjects(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** Whole-text objects, UTF-8 decoded — the TEXT branch of the reference's
    * dispatch (`pythonvectordbceph.py:160`): one row per file. */
  def textObjects(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("wholetext", "true").text(pathGlob)
      .withColumn("path", input_file_name())
      .withColumnRenamed("value", "text")

  /** Object key relative to a bucket root — mirrors the reference's
    * `Records[0].s3.object.key` addressing. */
  def withObjectKey(df: DataFrame, root: String): DataFrame =
    df.withColumn("key", regexp_replace(col("path"), s".*${java.util.regex.Pattern.quote(root)}/?", ""))

  /** Shard-partitioned gzip JSONL sink — the other wire format training
    * loaders consume (one JSON object per line, one directory per shard).
    * Same layout contract as the parquet export: a loader reading one
    * shard partition-prunes to that directory, and the write
    * parallelizes per shard like any file sink. Gzip keeps the text
    * format's at-rest size honest; JSONL trades parquet's columnar
    * pruning for line-oriented streamability, which is why both sinks
    * exist. */
  def writeJsonlSharded(df: DataFrame, path: String, shardCol: String = "shard"): Unit =
    df.write.mode("overwrite").partitionBy(shardCol)
      .option("compression", "gzip").json(path)
}
