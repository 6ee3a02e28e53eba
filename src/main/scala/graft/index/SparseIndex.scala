package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SparseSearch

/** At-rest layout for sparse-vector postings — the sparse twin of
  * [[TextIndex]]'s treatment of BM25 postings (same bucket idea, simpler
  * contract): `SparseSearch` over a raw postings frame scans the whole
  * frame per query; at 100 TB the postings must live partitioned by
  * dimension so a query's I/O is bounded by Σ df(query dim), not the
  * corpus.
  *
  * Layout under `path/`:
  *   - `postings/bucket=N/` — parquet (id, dim, w) partitioned by
  *     `bucket = pmod(xxhash64(dim), buckets)`. A query computes its
  *     dims' buckets driver-side ([[dimBucket]] reuses Catalyst's own
  *     XxHash64 so the two sides cannot drift), so the scan is a parquet
  *     PARTITION prune to ≤|query dims| buckets plus a pushed
  *     `dim IN (...)` filter within them.
  *   - `norms/` — (id, nrm): per-vector L2 norms, materialized at build
  *     because cosine needs ALL of a vector's dims — computing norms
  *     from a dim-pruned scan would silently under-count. Dot queries
  *     never read it.
  *   - `META` — bucket count + id column name, read driver-side.
  *
  * Score parity: the scoring path is [[SparseSearch]]'s own dot kernel
  * over the pruned frame — the prune is LOSSLESS for both metrics (a
  * posting outside the query's dims contributes zero to every dot), so
  * riding the index never changes a result, only the bytes read.
  *
  * This is a full-rebuild layout (build once, query many). Incremental
  * corpus changes would reuse [[TextIndex]]'s segment-manifest design
  * (delta segments + tombstones + atomic META swap) — the contract is
  * identical; it is not duplicated here until a caller needs it.
  */
object SparseIndex {

  /** `pmod(xxhash64(dim), buckets)` evaluated driver-side — MUST match
    * the executor-side partition expression in [[build]] bit-for-bit
    * (the shared [[graft.core.CatalystHash]] kernel guarantees it). */
  private[graft] def dimBucket(dim: Long, buckets: Int): Int =
    graft.core.CatalystHash.pmodXxhash64(dim,
      org.apache.spark.sql.types.LongType, buckets)

  private def metaPath(path: String) = java.nio.file.Paths.get(path, "META")

  /** Write the bucketed layout. `postings` needs (idCol, dim, w). */
  def build(postings: DataFrame, path: String, buckets: Int = 64,
            idCol: String = "id"): Unit = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    postings
      .select(col(idCol), col("dim").cast("long").as("dim"),
        col("w").cast("double").as("w"))
      .withColumn("bucket", pmod(xxhash64(col("dim")), lit(buckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    postings.groupBy(col(idCol))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      .write.mode("overwrite").parquet(s"$path/norms")
    // META last: a reader that sees META sees complete data
    java.nio.file.Files.writeString(metaPath(path), s"$buckets\n$idCol\n")
  }

  private def readMeta(path: String): (Int, String) = {
    require(java.nio.file.Files.exists(metaPath(path)),
      s"no sparse index at $path — build first")
    val lines = java.nio.file.Files.readString(metaPath(path)).split("\n")
    (lines(0).trim.toInt, lines(1).trim)
  }

  /** The dim-pruned postings scan shared by [[topK]] and [[topKBatch]]:
    * partition prune to the dims' buckets + pushed `dim IN` filter. */
  private def prunedPostings(spark: SparkSession, path: String,
      dims: Seq[Long], buckets: Int, idCol: String): DataFrame = {
    val qBuckets = dims.map(dimBucket(_, buckets)).distinct
    spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(qBuckets: _*) && col("dim").isin(dims: _*))
      .select(col(idCol), col("dim"), col("w"))
  }

  /** Top-k against one query through the pruned layout. Same results as
    * `SparseSearch.topK` over the full postings (prune is lossless);
    * I/O is the queried buckets only. */
  def topK(spark: SparkSession, path: String, query: Seq[(Long, Double)],
           k: Int, metric: String = "dot"): DataFrame = {
    val (buckets, idCol) = readMeta(path)
    require(query.nonEmpty, "query sparse vector has no nonzero dimensions")
    val live = query.filter(_._2 != 0.0)
    val pruned = prunedPostings(spark, path, live.map(_._1), buckets, idCol)
    metric match {
      case "dot" => SparseSearch.topK(pruned, live, k, "dot", idCol)
      case "cosine" =>
        // dots from the pruned scan; norms from the side table (NEVER
        // from the pruned frame — it lacks the un-queried dims)
        val qn = math.sqrt(live.map(t => t._2 * t._2).sum)
        require(qn > 0.0, "query vector has zero norm")
        val dots = SparseSearch.dotScores(pruned, live, idCol)
        val norms = spark.read.parquet(s"$path/norms")
        dots.join(norms, Seq(idCol))
          .select(col(idCol), (col("__dot") / (col("nrm") * lit(qn))).as("score"))
          .orderBy(desc("score"), col(idCol))
          .limit(k)
      case other =>
        throw new IllegalArgumentException(s"metric must be dot or cosine (got '$other')")
    }
  }

  /** Batched top-k through the pruned layout: the scan covers the UNION
    * of all queries' dims (collected driver-side — queries are sparse by
    * definition, so the union is query-batch-sized, not corpus-sized). */
  def topKBatch(spark: SparkSession, path: String, queryPostings: DataFrame,
                k: Int, metric: String = "dot"): DataFrame = {
    val (buckets, idCol) = readMeta(path)
    val dims = queryPostings.select(col("dim").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    require(dims.nonEmpty, "query batch has no nonzero dimensions")
    val pruned = prunedPostings(spark, path, dims, buckets, idCol)
    metric match {
      case "dot" => SparseSearch.topKBatch(pruned, queryPostings, k, "dot", idCol)
      case "cosine" =>
        // per-(qid, id) dots over the pruned scan, then the side-table
        // norms; the bounded heap still caps rows per (partition, qid).
        // Zero-weight query postings dropped like SparseSearch.topKBatch:
        // an all-zero qid must match nothing, not emit NaN scores.
        val norms = spark.read.parquet(s"$path/norms")
        val liveQ = queryPostings.filter(col("w") =!= 0.0)
        val q0 = liveQ.select(col("qid"), col("dim"), col("w").as("__qw"))
        val qnorms = liveQ.groupBy(col("qid"))
          .agg(sqrt(sum(col("w") * col("w"))).as("__qnrm"))
        val dots = pruned.join(broadcast(q0), Seq("dim"))
          .groupBy(col("qid"), col(idCol))
          .agg(sum(col("w") * col("__qw")).as("__dot"))
        val scored = dots.join(norms, Seq(idCol)).join(broadcast(qnorms), Seq("qid"))
          .select(col("qid"), col(idCol),
            (col("__dot") / (col("nrm") * col("__qnrm"))).as("score"))
        SparseSearch.rankPerQuery(scored, k, idCol)
      case other =>
        throw new IllegalArgumentException(s"metric must be dot or cosine (got '$other')")
    }
  }
}
