package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SparseSearch

/** SparseSearch operator vs a plain-Scala brute force. */
class SparseSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  // 60 sparse vectors over a 40-dim universe, ~6 nonzeros each
  private val vecs: Map[Long, Map[Long, Double]] = (0L until 60L).map { id =>
    id -> Seq.fill(6)((rnd.nextInt(40).toLong,
      math.rint((rnd.nextDouble() * 4 + 0.5) * 100) / 100)).toMap
  }.toMap
  private val query: Seq[(Long, Double)] =
    Seq((3L, 1.5), (7L, 2.0), (11L, 0.75), (20L, 1.0))

  private def postingsDf =
    SparseSearch.postings(
      vecs.toSeq.map { case (id, m) => (id, m.map { case (d, w) => d -> w }) }
        .toDF("id", "vec"), "id", "vec")

  private def bruteDot(q: Map[Long, Double]): Map[Long, Double] =
    vecs.map { case (id, m) =>
      id -> m.iterator.map { case (d, w) => w * q.getOrElse(d, 0.0) }.sum
    }.filter(_._2 != 0.0)

  test("topK dot matches brute force, ties on id, k bounds") {
    val got = SparseSearch.topK(postingsDf, query, k = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val want = bruteDot(query.toMap).toSeq.sortBy(t => (-t._2, t._1)).take(8)
    assert(got.toSeq == want)
  }

  test("topK cosine matches brute force") {
    val got = SparseSearch.topK(postingsDf, query, k = 8, metric = "cosine")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val qn = math.sqrt(query.map(t => t._2 * t._2).sum)
    val want = bruteDot(query.toMap).map { case (id, dot) =>
      val nrm = math.sqrt(vecs(id).values.map(w => w * w).sum)
      id -> dot / (nrm * qn)
    }.toSeq.sortBy(t => (-t._2, t._1)).take(8)
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gi, gs), (wi, ws)) =>
      assert(gi == wi && math.abs(gs - ws) < 1e-12)
    }
  }

  test("topKBatch (long ids) equals per-query topK") {
    val queries = Seq(
      1L -> Seq((3L, 1.5), (7L, 2.0)),
      2L -> Seq((11L, 1.0), (20L, 3.0), (39L, 0.5))
    )
    val qp = queries.flatMap { case (qid, q) => q.map(t => (qid, t._1, t._2)) }
      .toDF("qid", "dim", "w")
    val got = SparseSearch.topKBatch(postingsDf, qp, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    queries.foreach { case (qid, q) =>
      val single = SparseSearch.topK(postingsDf, q, k = 5).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val batch = got.filter(_._1 == qid).sortBy(_._4).map(t => (t._2, t._3))
      assert(batch.toSeq == single.toSeq, s"qid $qid diverged")
    }
  }

  test("topKBatch dispatches on string ids and cosine") {
    val sdf = postingsDf.selectExpr("concat('d', id) AS id", "dim", "w")
    val qp = Seq((9L, 3L, 1.5), (9L, 7L, 2.0)).toDF("qid", "dim", "w")
    val got = SparseSearch.topKBatch(sdf, qp, k = 4, metric = "cosine")
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    val want = SparseSearch.topK(postingsDf, Seq((3L, 1.5), (7L, 2.0)),
        k = 4, metric = "cosine").collect()
      .map(r => (s"d${r.getLong(0)}", r.getDouble(1)))
    // string tie-break can differ from numeric ("d10" < "d2") only WITHIN
    // equal scores; scores here are distinct with probability ~1
    assert(got.map(_._1).toSet == want.map(_._1).toSet)
    got.sortBy(_._1).zip(want.sortBy(_._1)).foreach { case ((gi, gs), (wi, ws)) =>
      assert(gi == wi && math.abs(gs - ws) < 1e-12)
    }
  }

  test("termPostings: tf and log-tf weights, hashed dims deterministic") {
    val docs = Seq((1L, "a b a c"), (2L, "b b b")).toDF("id", "text")
    val tf = SparseSearch.termPostings(docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(tf.length == 4) // (1,a),(1,b),(1,c),(2,b)
    assert(tf.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(1.0, 1.0, 2.0))
    // same term hashes to the same dim across docs
    val dimsOfB = tf.filter(t => t._3 == 3.0 || (t._1 == 1L && t._3 == 1.0))
    val log = SparseSearch.termPostings(docs, "id", "text", logTf = true)
      .collect().map(_.getDouble(2)).sorted
    assert(math.abs(log.last - (1 + math.log(3.0))) < 1e-12)
    val bDims = SparseSearch.termPostings(docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
    assert(bDims.values.exists(_.map(_._1).toSet == Set(1L, 2L)),
      "term 'b' must share one hashed dim across docs")
    assert(dimsOfB.nonEmpty)
  }

  test("topKBatch: an all-zero-weight qid matches nothing instead of emitting NaN ranks") {
    val qp = Seq(
      (1L, 3L, 0.0), (1L, 7L, 0.0), // degenerate query: every weight zero
      (2L, 3L, 1.5), (2L, 7L, 2.0)  // healthy sibling in the same batch
    ).toDF("qid", "dim", "w")
    for (metric <- Seq("dot", "cosine")) {
      val got = SparseSearch.topKBatch(postingsDf, qp, k = 5, metric).collect()
      assert(!got.exists(_.getLong(0) == 1L),
        s"$metric: the zero-vector query must be absent, not NaN-ranked")
      assert(got.count(_.getLong(0) == 2L) == 5, s"$metric: sibling qid starved")
      assert(got.forall(r => !r.getDouble(2).isNaN))
    }
  }

  test("zero-weight postings and empty/zero queries are rejected or dropped") {
    val df = Seq((1L, Map(3L -> 0.0, 7L -> 1.0))).toDF("id", "vec")
    assert(SparseSearch.postings(df, "id", "vec").count() == 1)
    intercept[IllegalArgumentException](
      SparseSearch.topK(postingsDf, Seq.empty, k = 3))
    intercept[IllegalArgumentException](
      SparseSearch.topK(postingsDf, query, k = 0))
    intercept[IllegalArgumentException](
      SparseSearch.topK(postingsDf, query, k = 3, metric = "l2"))
  }
}
