package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Sparse-vector similarity search (Milvus SPARSE_FLOAT_VECTOR semantics:
  * `milvus-app/` drives dense vectors; sparse is the sibling field type a
  * SPLADE/BM25-embedding user reaches for). A sparse vector is a set of
  * (dimension, weight) pairs; similarity is the dot product over shared
  * dimensions (cosine = dot normalized by the two L2 norms).
  *
  * Spark-first shape — the inverted index IS the DataFrame: vectors live
  * exploded as postings `(id, dim, w)`, queries join postings on `dim`,
  * and the per-id partial sums aggregate map-side before the one shuffle.
  * Work and shuffle are Σ df(query dim) — rows sharing no dimension with
  * the query are never touched, exactly why sparse engines store an
  * inverted index instead of scanning vectors. At 100 TB the postings
  * frame is a bucketed/partitioned table on `dim`; nothing here assumes it
  * fits anywhere.
  *
  * Batched top-k rides the same bounded-heap aggregators as dense
  * [[graft.queries.VectorQueries.knnBatched]]: ≤k rows per (partition,
  * qid) survive to the final shuffle, never the scored product.
  */
object SparseSearch {

  /** Explode a `map<bigint,float|double>` sparse-vector column into
    * postings `(idCol, dim, w)`. Zero weights are dropped (a stored zero
    * is the same vector as an absent dimension — keeping them would only
    * add join traffic). */
  def postings(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), explode(col(vecCol)).as(Seq("dim", "w")))
      .filter(col("w") =!= 0.0)

  /** Term-frequency postings from a text column: `(idCol, dim, w)` with
    * `dim = xxhash64(token)` (the full 64-bit space — collision odds at
    * even 10^9 distinct terms are ~1e-10 per pair) and `w = tf` or
    * `1 + ln(tf)` when `logTf`. This is the classic lexical sparse
    * embedding; a learned (SPLADE) weighting would replace `w`, not the
    * shape. */
  def termPostings(docs: DataFrame, idCol: String, textCol: String,
                   logTf: Boolean = false): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("__term"))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val w = if (logTf) lit(1.0) + log(col("__tf").cast("double"))
            else col("__tf").cast("double")
    tf.select(col(idCol), xxhash64(col("__term")).as("dim"), w.as("w"))
  }

  private def requireMetric(metric: String): Unit =
    require(metric == "dot" || metric == "cosine",
      s"metric must be dot or cosine (got '$metric')")

  /** Top-k ids by sparse similarity against ONE query (a local
    * (dim, weight) list — driver-sized by definition: a sparse QUERY has
    * few nonzeros). Returns (idCol, score) descending, ties on id.
    *
    * Plan: query → tiny broadcast frame, equi-join on dim (only matching
    * postings flow), map-side-combined per-id sum, TakeOrdered(k). For
    * cosine the per-id norms aggregate over the SAME postings frame and
    * join in (no hint — AQE broadcasts while small); the query norm is a
    * literal computed here. */
  /** Un-ranked per-id dot products against one query — the shared core
    * of [[topK]] and the index-backed cosine path ([[graft.index.SparseIndex]]),
    * which needs ALL dots (to renormalize) rather than a top-k. */
  private[graft] def dotScores(postings: DataFrame, query: Seq[(Long, Double)],
      idCol: String): DataFrame = {
    require(query.nonEmpty, "query sparse vector has no nonzero dimensions")
    val spark = postings.sparkSession
    import spark.implicits._
    val q = query.filter(_._2 != 0.0).toDF("dim", "__qw")
    postings.join(broadcast(q), Seq("dim"))
      .groupBy(col(idCol))
      .agg(sum(col("w") * col("__qw")).as("__dot"))
  }

  def topK(postings: DataFrame, query: Seq[(Long, Double)], k: Int,
           metric: String = "dot", idCol: String = "id"): DataFrame = {
    requireMetric(metric)
    require(k >= 1, s"k must be >= 1 (got $k)")
    val dots = dotScores(postings, query, idCol)
    val scored = metric match {
      case "dot" => dots.select(col(idCol), col("__dot").as("score"))
      case "cosine" =>
        val qn = math.sqrt(query.map(t => t._2 * t._2).sum)
        require(qn > 0.0, "query vector has zero norm")
        val norms = postings.groupBy(col(idCol))
          .agg(sqrt(sum(col("w") * col("w"))).as("__nrm"))
        dots.join(norms, Seq(idCol))
          .select(col(idCol), (col("__dot") / (col("__nrm") * lit(qn))).as("score"))
    }
    scored.orderBy(desc("score"), col(idCol)).limit(k)
  }

  /** Batched top-k: queries ALSO as postings `(qid, dim, w)`. Returns
    * (qid, idCol, score, rn) with rn = 1..k per qid, score descending,
    * ties on id. Per-(qid, id) dots aggregate on their natural shuffle;
    * the per-qid top-k then rides the bounded-heap aggregator (dispatched
    * on the id column's type — long or string), so only ≤k rows per
    * (partition, qid) reach the final shuffle. `broadcastQueries` hints
    * the query postings side of the dim join (right for query batches
    * that fit in memory — the common case); pass false to let AQE decide
    * for huge batches. */
  def topKBatch(postings: DataFrame, queryPostings: DataFrame, k: Int,
                metric: String = "dot", idCol: String = "id",
                broadcastQueries: Boolean = true): DataFrame = {
    requireMetric(metric)
    require(k >= 1, s"k must be >= 1 (got $k)")
    require(!Set("qid", "dim", "w").contains(idCol),
      s"idCol '$idCol' collides with the reserved postings/query column " +
        "names (qid, dim, w) — rename the id column first")
    // zero-weight query postings are dropped up front (the single-query
    // path filters them the same way): they add join traffic but no
    // score, and for cosine an ALL-zero qid would otherwise divide by a
    // zero norm — NaN scores that Spark's NaN-greatest ordering ranks on
    // TOP. After the filter an all-zero query simply matches nothing
    // (absent from the output), the zero-vector semantics the dot metric
    // already has.
    val liveQ = queryPostings.filter(col("w") =!= 0.0)
    val q0 = liveQ.select(col("qid"), col("dim"), col("w").as("__qw"))
    val q = if (broadcastQueries) broadcast(q0) else q0
    val dots = postings.join(q, Seq("dim"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("w") * col("__qw")).as("__dot"))
    val scored = metric match {
      case "dot" => dots.select(col("qid"), col(idCol), col("__dot").as("score"))
      case "cosine" =>
        val norms = postings.filter(col("w") =!= 0.0).groupBy(col(idCol))
          .agg(sqrt(sum(col("w") * col("w"))).as("__nrm"))
        val qnorms = liveQ.groupBy(col("qid"))
          .agg(sqrt(sum(col("w") * col("w"))).as("__qnrm"))
        val qn = if (broadcastQueries) broadcast(qnorms) else qnorms
        dots.join(norms, Seq(idCol)).join(qn, Seq("qid"))
          .select(col("qid"), col(idCol),
            (col("__dot") / (col("__nrm") * col("__qnrm"))).as("score"))
    }
    rankPerQuery(scored, k, idCol)
  }

  /** Per-qid bounded-heap top-k over a (qid, idCol, score) frame — ≤k
    * rows per (partition, qid) reach the final shuffle. Shared with the
    * index-backed batch path ([[graft.index.SparseIndex.topKBatch]]). */
  private[graft] def rankPerQuery(scored: DataFrame, k: Int,
      idCol: String): DataFrame = {
    // bounded heap keyed by qid: "smaller is better" dist = -score
    val idType = scored.schema(idCol).dataType
    val hits = idType match {
      case LongType =>
        val topk = graft.functions.VectorAggregates.topKByDist(k)
        scored.groupBy(col("qid"))
          .agg(topk(-col("score"), col(idCol)).as("__tops"))
          .select(col("qid"), posexplode(col("__tops")).as(Seq("__pos", "__hit")))
          .select(col("qid"), col("__hit.vec_id").as(idCol),
            (-col("__hit.dist")).as("score"),
            (col("__pos") + 1).cast("long").as("rn"))
      case StringType =>
        val topk = graft.functions.VectorAggregates.topKDocs(k)
        scored.groupBy(col("qid"))
          .agg(topk(-col("score"), col(idCol),
            typedLit(Map.empty[String, String])).as("__tops"))
          .select(col("qid"), posexplode(col("__tops")).as(Seq("__pos", "__hit")))
          .select(col("qid"), col("__hit.key").as(idCol),
            (-col("__hit.dist")).as("score"),
            (col("__pos") + 1).cast("long").as("rn"))
      case other => throw new IllegalArgumentException(
        s"id column '$idCol' must be bigint or string for the bounded-heap " +
          s"top-k (got ${other.catalogString})")
    }
    hits.orderBy(col("qid"), col("rn"))
  }
}
