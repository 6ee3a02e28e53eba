package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest scalar (metadata) index — the engine's analog of a Milvus
  * scalar index on a non-vector field (`create_index(field_name=<meta>,
  * index_type="INVERTED"/"BITMAP")`, the surface a migrating user of the
  * reference's `MilvusClient` reaches once filtered queries dominate:
  * the app's `filter=` argument at
  * `milvus-app/pythonvectordbceph_milvus.py:109-111` is exactly what
  * this accelerates).
  *
  * Layout, one directory per indexed field:
  * {{{
  *   <dir>/values/bucket=N/ (parquet)  — rows (value STRING); bucket is
  *                                       the KEYED STORE's hash bucket
  *   <dir>/VERSION                     — stamped by the client, LAST
  * }}}
  *
  * Each row records "store bucket N contains at least one live row whose
  * indexed field equals `value`" — a distinct (value, bucket) posting
  * list, value-complete per bucket. A filter implying `field ∈ values`
  * then scans ONLY the buckets listed for those values: the prune is
  * lossless by construction (a live row with a wanted value must have a
  * posting for its bucket), and a value absent from the index proves no
  * live row carries it.
  *
  * Partitioning by STORE bucket (not by value hash) is deliberate: it
  * aligns the index's partitions with the write path's unit of change,
  * so a commit touching buckets {3, 7} rewrites exactly the `bucket=3`
  * and `bucket=7` index partitions from its own post-image — maintenance
  * cost ∝ the commit's rows, never the corpus. A value-hashed layout
  * would make lookups O(1) directories instead of a pushed `value IN`
  * over all bucket dirs, but every commit would scatter-rewrite the
  * whole index; the index is distinct-values-sized, so the pushed
  * filter's footer reads are the far smaller price.
  *
  * Size bound: ≤ distinct(value, bucket) rows ≤ min(rows,
  * |values|·buckets). At 100 TB with thousands of buckets this is
  * gigabytes of parquet read with a pushed equality — index I/O is
  * proportional to the INDEX, never the corpus.
  */
object ScalarIndex {
  private val valuesSchema = "value STRING, bucket INT"

  private[graft] def valuesPath(dir: String) = s"$dir/values"

  /** Whether a scalar-index layout exists at `dir` (the client stamps
    * VERSION separately — existence is the layout, freshness the stamp). */
  def exists(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(valuesPath(dir)))

  /** Full build: write the complete distinct (value, bucket) posting set.
    * `entries` must have (value STRING, bucket INT); null values are the
    * caller's to exclude (a row without the field has no posting — a
    * filter on the field rejects it anyway, so its bucket need not be
    * listed on the field's account). */
  def write(entries: DataFrame, dir: String): Unit =
    entries.select(col("value").cast("string"), col("bucket").cast("int"))
      .distinct()
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(valuesPath(dir))

  /** Touched-bucket maintenance: replace the listed `touched` buckets'
    * partitions with `entries` (the post-image's distinct values of those
    * buckets), dropping partitions left empty. Mirrors the IVF cells'
    * dynamic-partition-overwrite maintenance: cost ∝ the touched buckets'
    * rows. Returns nothing; the caller stamps VERSION after. */
  def overwriteTouched(entries: DataFrame, touched: Seq[Int], dir: String): Unit = {
    val deduped = entries
      .select(col("value").cast("string"), col("bucket").cast("int"))
      .distinct()
      // the write below materializes `deduped` once; the written-bucket
      // collect is a ≤|touched|-int driver set over the SAME frame —
      // localCheckpoint keeps the second action from re-running the
      // upstream merge plan (and from racing the overwrite it follows)
      .localCheckpoint()
    val written = deduped.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    if (written.nonEmpty)
      deduped.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(valuesPath(dir))
    // dynamic overwrite replaces only partitions PRESENT in the write —
    // a touched bucket with no surviving values must have its directory
    // dropped explicitly, or deleted values would linger and un-prune
    // (sound but ever-growing) or resurrect (if the bucket refills)
    (touched.toSet -- written).foreach { b =>
      val p = java.nio.file.Paths.get(valuesPath(dir), s"bucket=$b")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
        finally s.close()
      }
    }
  }

  /** The store buckets that may contain a live row whose field value is
    * in `values` — the union of the values' posting lists (≤ buckets
    * ints, a driver-bounded collect). The read is a pushed `value IN`
    * over the index parquet: I/O ∝ index size, never corpus. */
  def bucketsFor(spark: SparkSession, dir: String,
                 values: Seq[String]): Set[Int] = {
    if (values.isEmpty) Set.empty
    else spark.read.schema(valuesSchema).parquet(valuesPath(dir))
      .filter(col("value").isin(values: _*))
      .select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
  }

  /** Observability: per-field index shape — distinct values, posting
    * rows, and the hottest values by bucket fan-out (a value present in
    * every bucket prunes nothing; the operator sees which predicates the
    * index can and cannot help). */
  def stats(spark: SparkSession, dir: String, topN: Int = 10): DataFrame =
    spark.read.schema(valuesSchema).parquet(valuesPath(dir))
      .groupBy(col("value")).agg(count(lit(1)).as("n_buckets"))
      .orderBy(desc("n_buckets"), col("value"))
      .limit(topN)
}
