package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** A keyed parquet collection maintained by streaming upserts — the
  * at-rest form of the reference's vector store (one row per live key,
  * same-key overwrite, `s3vectors-app/pythonvectordbceph.py:194-206`).
  *
  * Writes are versioned directories under `root/` with an atomic pointer
  * swap (`CURRENT` file): a reader always sees a complete snapshot — the
  * batch-read strong consistency A20 leans on. On a real cluster this
  * would be a table format's (Delta/Iceberg) transaction log doing the
  * same thing; the merge PLAN feeding it is identical.
  *
  * Version directories are pruned to the latest `retain` (default 2).
  * CONSTRAINT this implies for readers: a lazy DataFrame returned by
  * `read` stays valid only until `retain - 1` further commits happen;
  * a caller holding results across more commits must materialize (or
  * raise `retain`). Single-writer is assumed (the streaming query);
  * concurrent committers would race the version counter — that's the
  * point where a real deployment swaps in a table format's log.
  */
class KeyedCollection(root: String, schema: StructType, retain: Int = 2) {
  require(retain >= 1)
  private val dir = Paths.get(root)
  Files.createDirectories(dir)
  private val pointer = dir.resolve("CURRENT")

  /** Latest committed version id, if any commit happened. */
  def currentVersion: Option[Long] =
    if (Files.exists(pointer)) Some(new String(Files.readAllBytes(pointer)).trim.toLong)
    else None

  private def versionPath(v: Long) = dir.resolve(f"v$v%08d")

  /** Latest committed snapshot (empty DataFrame with the declared schema
    * before the first commit). */
  def read(spark: SparkSession): DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(versionPath(v).toString)
    case None => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Commit a new snapshot: write v+1 fully, then atomically repoint. */
  def commit(df: DataFrame): Long = {
    val next = currentVersion.getOrElse(-1L) + 1
    df.write.mode("overwrite").parquet(versionPath(next).toString)
    val tmp = Files.createTempFile(dir, ".ptr-", "")
    Files.write(tmp, next.toString.getBytes)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // prune to the newest `retain` versions (see class doc for the
    // reader-validity constraint this implies)
    import scala.jdk.CollectionConverters._
    val listing = Files.list(dir)
    val stale =
      // only names THIS class wrote (vNNNNNNNN) are parsed or deleted — a
      // stray file like "v2-backup" must neither wedge every later commit
      // with NumberFormatException nor be swept (same hardening as
      // BucketedKeyedCollection.bucketDirVersion)
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d{8,}"))
        .filter(p => p.getFileName.toString.stripPrefix("v").toLong <= next - retain)
        .toSeq
      finally listing.close()
    stale.foreach { p =>
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    next
  }

  /** One micro-batch of the streaming upsert: merge parsed events into the
    * current snapshot and commit. Pass to `writeStream.foreachBatch`. */
  def upsertBatch(spark: SparkSession)(batch: DataFrame, batchId: Long): Unit = {
    val merged = StreamingIngest.mergeBatch(read(spark), batch)
    commit(merged.select(schema.fieldNames.toIndexedSeq.map(
      n => org.apache.spark.sql.functions.col(n)): _*))
  }
}
