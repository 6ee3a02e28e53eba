package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.SimHash

/** Capability tests for approx sketches (C17), CSV/JSON sources (C1),
  * MLlib MinHashLSH and SimHash near-dup (C8 scale paths). */
class ApproxAndSourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("approx-sources-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sf = "/root/testdata/sf0.01"

  // ---- C17: approx sketches vs exact ----

  test("approx_count_distinct within 5% of exact (HLL)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("percentile_approx within 2% of exact percentile") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"exact=$exact approx=$approx")
  }

  // ---- C1: CSV + JSON-lines sources round-trip ----

  test("CSV source: write, read with schema, values survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    nation.write.mode("overwrite").option("header", "true").csv(s"$dir/nation")
    val back = spark.read.option("header", "true")
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .csv(s"$dir/nation")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON-lines source: write, read, schema inference + explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val region = spark.read.parquet(s"$sf/region.parquet")
    region.write.mode("overwrite").json(s"$dir/region")
    val inferred = spark.read.json(s"$dir/region")
    assert(inferred.count() == region.count())
    val explicit = spark.read.schema("r_regionkey INT, r_name STRING").json(s"$dir/region")
    assert(explicit.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("ORC source: write, read, values survive (incl. the vector column)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.write.mode("overwrite").orc(s"$dir/embeddings")
    val back = spark.read.orc(s"$dir/embeddings")
    assert(back.schema == emb.schema)
    assert(back.orderBy("vec_id").collect().toSeq ==
      emb.orderBy("vec_id").collect().toSeq)
  }

  // ---- C8 scale paths: MLlib MinHashLSH + SimHash ----

  test("MLlib MinHashLSH approxSimilarityJoin finds the high-jaccard pairs") {
    import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
    val cv = new CountVectorizer().setInputCol("ws").setOutputCol("features")
      .setBinary(true).fit(docs)
    val feat = cv.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(feat)
    // jaccard distance = 1 - jaccard; threshold 0.1 → jaccard >= 0.9
    val pairs = model.approxSimilarityJoin(feat, feat, 0.1, "jacDist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // ground truth from the declared exact-jaccard query shape
    val exact = graft.queries.DedupQueries.dedupJaccardPairs(spark, sf)
      .filter(col("doc_a") < 100 && col("doc_b") < 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(pairs.contains).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall vs exact jaccard>=0.9 pairs: $recall (${exact.size} truth)")
  }

  // ---- C14 capability: the MLlib text pipeline variant ----

  test("MLlib Tokenizer -> StopWordsRemover -> HashingTF -> IDF pipeline (C14)") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{HashingTF, IDF, StopWordsRemover, Tokenizer}
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 50)
    val pipeline = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("tokens"),
      new StopWordsRemover().setInputCol("tokens").setOutputCol("filtered"),
      new HashingTF().setInputCol("filtered").setOutputCol("tf").setNumFeatures(1 << 12),
      new IDF().setInputCol("tf").setOutputCol("tfidf")))
    val model = pipeline.fit(docs)
    val out = model.transform(docs)
    assert(out.count() == 50)
    val row = out.select("tokens", "filtered", "tfidf").head()
    assert(row.getSeq[String](0).nonEmpty)
    // stopwords ('the', 'a') removed by the default english list
    assert(!row.getSeq[String](1).contains("the"))
    val vec = row.getAs[org.apache.spark.ml.linalg.SparseVector]("tfidf")
    assert(vec.numNonzeros > 0 && vec.values.forall(_ >= 0.0))
  }

  // ---- A19 error arm + C12 zip_with ----

  test("type dispatch raise_error arm throws on unsupported object type (A19)") {
    import spark.implicits._
    val df = Seq("TEXT", "IMAGE", "AUDIO").toDF("object_type")
      .select(when(col("object_type") === "TEXT", lit(384))
        .when(col("object_type") === "IMAGE", lit(512))
        .otherwise(raise_error(concat(lit("unsupported object type: "), col("object_type"))))
        .as("dim"))
    val e = intercept[Exception] { df.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("unsupported object type: AUDIO")))
  }

  test("zip_with combines aligned arrays element-wise (C12)") {
    import spark.implicits._
    val row = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)").as("dot"))
      .head()
    assert(row.getDouble(0) == 32.0)
  }

  test("scalar udf() SQL registration (C16): simhash64 callable from SQL") {
    spark.udf.register("simhash64", (tokens: Seq[String]) => SimHash.simhash64(tokens))
    spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 5)
      .createOrReplaceTempView("docs_v")
    val rows = spark.sql(
      "SELECT doc_id, simhash64(split(text, ' ')) AS fp FROM docs_v ORDER BY doc_id")
      .collect()
    assert(rows.length == 5)
    val expected = SimHash.simhash64(
      spark.table("docs_v").orderBy("doc_id").head().getString(1).split(" ").toSeq)
    assert(rows.head.getLong(1) == expected)
  }

  test("SimHash: identical docs → hamming 0, near-dups close, unrelated far") {
    val a = "spark vector search engine over parquet files at scale".split(" ").toSeq
    val b = "spark vector search engine over parquet data at scale".split(" ").toSeq // 1 token changed
    val c = "completely different words about gardening tools and soil".split(" ").toSeq
    val (fa, fb, fc) = (SimHash.simhash64(a), SimHash.simhash64(b), SimHash.simhash64(c))
    assert(SimHash.hamming(fa, fa) == 0)
    assert(SimHash.hamming(fa, fb) < SimHash.hamming(fa, fc))
    assert(SimHash.simhash64(a) == SimHash.simhash64(a), "deterministic")
  }

  test("SimHash bucketing over documents: near-dup candidates via block keys") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("fp", SimHash.simhashCol(col("ws")))
    val fps = docs.select("doc_id", "fp").as[(Long, Long)].collect()
    // distributed candidate generation: explode block keys, groupBy block
    val buckets = docs.select(col("doc_id"), col("fp"))
      .as[(Long, Long)]
      .flatMap { case (id, fp) => SimHash.blockKeys(fp).map(k => (id, fp, k._1, k._2)) }
      .toDF("doc_id", "fp", "block_id", "block_val")
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.block_id") === col("b.block_id") &&
          col("a.block_val") === col("b.block_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"), col("a.fp"), col("b.fp"))
      .distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), SimHash.hamming(r.getLong(2), r.getLong(3))))
    // every hamming<=3 pair MUST appear among candidates (pigeonhole over 4 blocks)
    val all = for (i <- fps.indices; j <- i + 1 until fps.length) yield
      ((fps(i)._1, fps(j)._1), SimHash.hamming(fps(i)._2, fps(j)._2))
    val close = all.filter(_._2 <= 3).map(_._1).toSet
    val candSet = cand.map(_._1).toSet
    assert(close.forall(candSet.contains),
      s"missed ${close.count(!candSet.contains(_))} of ${close.size} hamming<=3 pairs")
  }
}
