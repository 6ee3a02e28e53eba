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

object VectorAggregates {
  /** Column-API handle: `topKByDist(k)(col("dist"), col("vec_id"))`. */
  def topKByDist(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKByDistance(k))

  /** SQL registration: `SELECT topk_by_dist(dist, id) FROM ... GROUP BY qid`. */
  def register(spark: SparkSession, k: Int = 10): Unit =
    spark.udf.register("topk_by_dist", topKByDist(k))
}
