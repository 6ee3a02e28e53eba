package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A scored candidate flowing into the top-k aggregate. */
case class ScoredHit(dist: Double, vec_id: Long)

/** Bounded top-k-by-distance typed Aggregator (SURVEY C16's UDAF surface).
  *
  * Replaces the rank-window plan for batched KNN (SURVEY B4): a window
  * `partitionBy(qid)` over the scored index×queries product shuffles N×Q
  * rows onto Q keys — every partition then holds a full index copy, which
  * dies at 100 TB. This aggregate keeps a k-row buffer per (partition, qid)
  * and partial-aggregates BEFORE the shuffle, so only k·partitions rows per
  * query ever move. Ordering ties break on vec_id so results are total and
  * oracle-stable.
  *
  * The buffer is a sorted Vector (ascending (dist, vec_id)); k is tiny
  * (top-2 in the reference's search, `s3vectors-app/search.py:55`), so
  * O(k) insertion beats heap constant factors and keeps merge trivial.
  */
class TopKByDistance(k: Int) extends Aggregator[ScoredHit, Vector[ScoredHit], Vector[ScoredHit]] {
  require(k > 0, s"k must be positive, got $k")

  private def lt(a: ScoredHit, b: ScoredHit): Boolean =
    a.dist < b.dist || (a.dist == b.dist && a.vec_id < b.vec_id)

  override def zero: Vector[ScoredHit] = Vector.empty

  override def reduce(buf: Vector[ScoredHit], hit: ScoredHit): Vector[ScoredHit] =
    if (buf.length >= k && !lt(hit, buf.last)) buf
    else {
      val i = buf.indexWhere(b => lt(hit, b)) match { case -1 => buf.length; case x => x }
      (buf.patch(i, Vector(hit), 0)).take(k)
    }

  override def merge(a: Vector[ScoredHit], b: Vector[ScoredHit]): Vector[ScoredHit] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Vector[ScoredHit]): Vector[ScoredHit] = buf

  override def bufferEncoder: Encoder[Vector[ScoredHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Vector[ScoredHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** A scored DOCUMENT flowing into the keyed top-k aggregate — the
  * GraftClient result payload (string key + metadata map) rather than the
  * embeddings table's numeric id. */
case class ScoredDoc(dist: Double, key: String, meta: Map[String, String])

/** Keyed sibling of [[TopKByDistance]] for the batched collection search
  * (`GraftClient.searchBatch`): identical bounded-buffer partial
  * aggregation (k·partitions rows per query reach the shuffle, never the
  * candidates×queries product), payload carries the result row itself.
  * Ties break on key, so batched output is total and equals the
  * single-query `search` ordering. */
class TopKDocs(k: Int) extends Aggregator[ScoredDoc, Vector[ScoredDoc], Vector[ScoredDoc]] {
  require(k > 0, s"k must be positive, got $k")

  private def lt(a: ScoredDoc, b: ScoredDoc): Boolean =
    a.dist < b.dist || (a.dist == b.dist && a.key < b.key)

  override def zero: Vector[ScoredDoc] = Vector.empty

  override def reduce(buf: Vector[ScoredDoc], hit: ScoredDoc): Vector[ScoredDoc] =
    if (buf.length >= k && !lt(hit, buf.last)) buf
    else {
      val i = buf.indexWhere(b => lt(hit, b)) match { case -1 => buf.length; case x => x }
      (buf.patch(i, Vector(hit), 0)).take(k)
    }

  override def merge(a: Vector[ScoredDoc], b: Vector[ScoredDoc]): Vector[ScoredDoc] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Vector[ScoredDoc]): Vector[ScoredDoc] = buf

  override def bufferEncoder: Encoder[Vector[ScoredDoc]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Vector[ScoredDoc]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Mean-of-vectors typed Aggregator (SURVEY §4.4 `VectorCentroidAgg`) —
  * the IVF centroid-refresh aggregate: recomputing a cell's centroid is
  * `groupBy(centroidId).agg(vector_centroid(vec))`, partial (sumVec, count)
  * buffers per partition then a single merge — a cell's members are never
  * materialized anywhere. */
class VectorCentroid extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  // "no rows yet" is count == 0, NOT an empty sum array — a zero-LENGTH
  // input vector is a legitimate (degenerate) dimension, and conflating
  // the two would let a later differently-sized vector slip past the
  // mismatch require and divide by an inflated count
  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) return b
    val acc = if (b._2 == 0L) new Array[Double](v.length) else b._1
    require(acc.length == v.length,
      s"vector_centroid: dimension mismatch (${acc.length} vs ${v.length})")
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) return b
    if (b._2 == 0L) return a
    require(a._1.length == b._1.length,
      s"vector_centroid: dimension mismatch (${a._1.length} vs ${b._1.length})")
    val acc = a._1
    var i = 0
    while (i < acc.length) { acc(i) += b._1(i); i += 1 }
    (acc, a._2 + b._2)
  }

  override def finish(b: (Array[Double], Long)): Array[Float] =
    if (b._2 == 0L) null
    else {
      val out = new Array[Float](b._1.length)
      var i = 0
      while (i < out.length) { out(i) = (b._1(i) / b._2).toFloat; i += 1 }
      out
    }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object VectorAggregates {
  /** Column-API handle: `topKByDist(k)(col("dist"), col("vec_id"))`. */
  def topKByDist(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKByDistance(k))

  /** Column-API handle: `topKDocs(k)(col("dist"), col("key"), col("meta"))`. */
  def topKDocs(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKDocs(k))

  /** Column-API handle: `vectorCentroid(col("vec"))`. */
  val vectorCentroid: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new VectorCentroid)

  /** SQL registration (idempotent). */
  def register(spark: SparkSession, k: Int = 10): Unit = {
    spark.udf.register("topk_by_dist", topKByDist(k))
    spark.udf.register("vector_centroid", vectorCentroid)
  }
}
