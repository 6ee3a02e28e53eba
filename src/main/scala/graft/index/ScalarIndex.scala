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
  * Maintenance is APPEND-ONLY ([[appendPairs]] — batch-bounded, dead
  * pairs linger soundly) with threshold compaction ([[write]] — the
  * full rebuild). Partitioning by STORE bucket (not by value hash)
  * keeps each append's files bounded (clustered, ≤ one file per
  * touched bucket) and compaction's write aligned with the store's own
  * unit of change; lookups are a pushed `value IN` over the index
  * parquet either way — the index is distinct-values-sized, so those
  * footer reads are index-I/O, not corpus-I/O.
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

  /** Full build (and COMPACTION — the same operation): write the
    * complete distinct (value, bucket) posting set and reset the append
    * counter. `entries` must have (value STRING, bucket INT); null
    * values are the caller's to exclude (a row without the field has no
    * posting — a filter on the field rejects it anyway, so its bucket
    * need not be listed on the field's account). */
  def write(entries: DataFrame, dir: String): Unit = {
    entries.select(col("value").cast("string"), col("bucket").cast("int"))
      .distinct()
      // cluster by the partition column before the partitioned write:
      // without it every shuffle partition writes a sliver into every
      // bucket dir — buckets × shuffle-partitions tiny files whose
      // open/commit overhead dominates both this write and later reads.
      // Clustered, each bucket's rows land in one task → one file.
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(valuesPath(dir))
    resetAppends(dir)
  }

  /** Per-commit maintenance: APPEND the batch's (value, bucket) pairs —
    * cost ∝ the batch, never the touched buckets' rows (the earlier
    * rewrite-touched-partitions scheme re-derived every touched bucket's
    * full posting set per commit, which for a per-row-unique field made
    * an all-buckets commit rewrite the whole index; ScalarScaleBench
    * measured the tax). Append-only is MONOTONE, which is also what
    * keeps it sound with no coordination:
    *   - new rows' pairs are added before the stamp — the index stays
    *     value-complete for the new snapshot;
    *   - deleted/superseded rows' old pairs simply LINGER as dead
    *     postings: the prune scans their buckets and the filter finds
    *     nothing — extra I/O, never a wrong row. Dead weight and
    *     within-file duplicates fold away at the next [[write]]
    *     (compaction), which the client triggers automatically every
    *     `scalarCompactAt` appends (the counter below) and any
    *     createScalarIndex re-run performs explicitly.
    * Readers are append-tolerant by construction: a scan that misses
    * just-appended files sees the previous snapshot's complete posting
    * set, and the client's CURRENT-recheck falls back if the snapshot
    * moved. */
  def appendPairs(entries: DataFrame, dir: String): Unit =
    entries.select(col("value").cast("string"), col("bucket").cast("int"))
      .distinct()
      .repartition(col("bucket")) // ≤ one file per bucket per append —
                                  // see the write() comment
      .write.mode("append").partitionBy("bucket")
      .parquet(valuesPath(dir))

  // ---- append counter (drives auto-compaction) ----
  private def appendsPath(dir: String) = java.nio.file.Paths.get(dir, "APPENDS")

  def appendCount(dir: String): Int =
    if (!java.nio.file.Files.exists(appendsPath(dir))) 0
    else java.nio.file.Files.readString(appendsPath(dir)).trim.toInt

  /** Increment and return the post-append count. A torn counter only
    * skews WHEN compaction fires, never correctness. */
  def bumpAppends(dir: String): Int = {
    val n = appendCount(dir) + 1
    java.nio.file.Files.writeString(appendsPath(dir), n.toString)
    n
  }

  private def resetAppends(dir: String): Unit =
    java.nio.file.Files.deleteIfExists(appendsPath(dir))

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
      // count DISTINCT buckets: appended segments can repeat a (value,
      // bucket) pair (and dead pairs linger until compaction) — a plain
      // row count would overstate the fan-out
      .groupBy(col("value")).agg(count_distinct(col("bucket")).as("n_buckets"))
      .orderBy(desc("n_buckets"), col("value"))
      .limit(topN)
}
