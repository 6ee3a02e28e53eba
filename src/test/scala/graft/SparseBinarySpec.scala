package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BinaryVectorFunctions._

/** Binary-vector kernels (pack/Hamming/Jaccard) + sparse search queries. */
class SparseBinarySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("pack_sign_bits: known patterns, word boundaries, trailing pad") {
    // 3 dims → 1 word; strictly-positive test (0.0 is bit 0).
    val r1 = Seq(Tuple1(Array(1.0f, 0.0f, -2.0f))).toDF("v")
      .select(pack_sign_bits($"v")).head().getSeq[Long](0)
    assert(r1 == Seq(1L)) // only bit 0

    // 65 dims with bits 0 and 64 set → two words, second word bit 0.
    val v65 = Array.tabulate(65)(i => if (i == 0 || i == 64) 1.0f else -1.0f)
    val r2 = Seq(Tuple1(v65)).toDF("v")
      .select(pack_sign_bits($"v")).head().getSeq[Long](0)
    assert(r2 == Seq(1L, 1L))

    // All-positive 64 dims → one word of all ones.
    val r3 = Seq(Tuple1(Array.fill(64)(0.5f))).toDF("v")
      .select(pack_sign_bits($"v")).head().getSeq[Long](0)
    assert(r3 == Seq(-1L))
  }

  test("hamming/jaccard: known values and conventions") {
    val df = Seq(
      (Array(1.0f, 1.0f, -1.0f, -1.0f), Array(1.0f, -1.0f, 1.0f, -1.0f)),
      (Array(-1.0f, -1.0f), Array(-1.0f, -1.0f)) // both-empty bit sets
    ).toDF("a", "b")
      .select(
        hamming_distance(pack_sign_bits($"a"), pack_sign_bits($"b")).as("h"),
        jaccard_distance(pack_sign_bits($"a"), pack_sign_bits($"b")).as("j"))
      .collect()
    assert(df(0).getLong(0) == 2L)
    assert(math.abs(df(0).getDouble(1) - (1.0 - 1.0 / 3.0)) < 1e-15) // |∩|=1, |∪|=3
    assert(df(1).getLong(0) == 0L)
    assert(df(1).getDouble(1) == 0.0) // both-empty → distance 0 by convention
  }

  test("hamming over packed words == per-position sign disagreement (random, >64 dims)") {
    val rnd = new scala.util.Random(7)
    val dim = 150 // spans 3 words with a padded tail
    val rows = Seq.fill(40)((Array.fill(dim)(rnd.nextFloat() - 0.5f),
      Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val got = rows.toDF("a", "b")
      .select(hamming_distance(pack_sign_bits($"a"), pack_sign_bits($"b")).as("h"))
      .collect().map(_.getLong(0))
    val want = rows.map { case (a, b) =>
      a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }.toLong
    }
    assert(got.toSeq == want)
  }

  test("dimension mismatch raises a readable error") {
    // 2 vs 3 dims pack into the SAME word count — the packed metrics are
    // word-granular by design (dims are a property of the unpacked column;
    // the store's AssertDim guards them before packing). No error here:
    val ok = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(hamming_distance(pack_sign_bits($"a"), pack_sign_bits($"b"))).head().getLong(0)
    assert(ok >= 0L)
    // Word-count mismatch is the hard boundary:
    val df2 = Seq((Array.fill(64)(1.0f), Array.fill(65)(1.0f))).toDF("a", "b")
    val e2 = intercept[Exception] {
      df2.select(hamming_distance(pack_sign_bits($"a"), pack_sign_bits($"b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e2).exists(_.contains("code length mismatch")))
  }

  test("SQL registration surface: kernels callable from spark.sql") {
    graft.functions.BinaryVectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT hamming_distance(pack_sign_bits(array(1.0F, -1.0F, 1.0F)),
        |                        pack_sign_bits(array(1.0F, 1.0F, -1.0F))) AS h,
        |       jaccard_distance(pack_sign_bits(array(1.0F, 1.0F)),
        |                        pack_sign_bits(array(1.0F, -1.0F))) AS j
        |""".stripMargin).head()
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 0.5) // |∩|=1, |∪|=2
    val e = intercept[Exception](spark.sql("SELECT pack_sign_bits()").collect())
    assert(e.getMessage.contains("expects 1 argument"))
    // nullable code elements are an ANALYSIS error, not a silent 0-read:
    // getLong on a null slot would fabricate a wrong distance
    val nul = intercept[Exception](spark.sql(
      "SELECT hamming_distance(array(CAST(NULL AS BIGINT), 5L), array(3L, 5L))").collect())
    assert(nul.getMessage.contains("NON-NULL"), nul.getMessage)
  }

  test("declared knn_hamming / binary_jaccard: deterministic, self at rank 1") {
    val h = graft.queries.SparseBinaryQueries.knnHamming(spark, SparkTestSession.sf).collect()
    assert(h.length == 10)
    assert(h.head.getLong(0) == 0L && h.head.getLong(1) == 0L) // query's own row
    assert(h.sliding(2).forall(p => p(0).getLong(1) <= p(1).getLong(1)))

    val j = graft.queries.SparseBinaryQueries.binaryJaccard(spark, SparkTestSession.sf).collect()
    assert(j.length == 10)
    assert(j.head.getLong(0) == 0L && j.head.getDouble(1) == 0.0)
  }

  test("declared sparse_dot_topk: scores match a driver-side brute force") {
    val dir = SparkTestSession.sf
    val got = graft.queries.SparseBinaryQueries.sparseDotTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 10)

    // Brute force in plain Scala over the same fixture.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)
        .groupBy(identity).map { case (w, a) => w -> a.length.toLong }).toMap
    val q = docs(0L)
    val qn = math.sqrt(q.values.map(v => (v * v).toDouble).sum)
    val want = docs.toSeq.map { case (id, tf) =>
      val dot = tf.iterator.map { case (w, c) => c * q.getOrElse(w, 0L) }.sum
      val nrm = math.sqrt(tf.values.map(v => (v * v).toDouble).sum)
      (id, dot, BigDecimal(dot.toDouble / (nrm * qn))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(_._2 > 0).sortBy(t => (-t._2, t._1)).take(10)
    assert(got.toSeq == want)
  }
}
