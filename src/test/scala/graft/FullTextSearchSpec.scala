package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** Milvus 2.5 full-text search through the client: the raw query string
  * must pass through the index's OWN analyzer, scoring must ride the
  * fresh postings (stale raises — no silent fallback), the filter must
  * gate ranking with whole-corpus stats, and the envelope must match
  * search()'s with BM25-descending order. */
class FullTextSearchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("fulltext-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val docs = Seq(
    ("d1", "Hash JOIN beats nested loops on big tables", "infra"),
    ("d2", "the scan reads pages while the hash table builds", "infra"),
    ("d3", "sort merge JOIN shines when inputs arrive ordered", "algo"),
    ("d4", "a scan without an index touches every page", "algo"),
    ("d5", "hash hash hash collision storms hurt the join", "infra"))

  private def mkClient(): (GraftClient, String) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ft-spec").toString
    val client = new GraftClient(spark, root)
    client.createCollection("ft", dim = 4, buckets = 4)
    client.upsert("ft", docs.map { case (k, _, g) =>
      (k, Seq(1f, 0f, 0f, 0f), Map("grp" -> g))
    }.toDF("key", "vec", "meta"))
    client.buildTextIndex("ft",
      docs.map { case (k, t, _) => (k, t) }.toDF("key", "text"),
      analyzer = "standard", stopWords = Seq("the", "a", "an", "on", "when"))
    (client, "ft")
  }

  test("raw query analyzes through the index's analyzer and ranks by BM25 desc") {
    val (client, name) = mkClient()
    // "JOIN" must lowercase; "the" must drop as a stop word
    val hits = client.fullTextSearch(name, "JOIN the Hash", k = 5).collect()
    assert(hits.nonEmpty)
    // descending scores, key tie-break
    val scores = hits.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, s"not descending: $scores")
    // parity with searchLexical given the pre-analyzed terms — the ONE
    // scoring path, so the raw-string form adds only the analyzer hop
    import spark.implicits._
    val viaTerms = client.searchLexical(name,
        docs.map { case (k, t, _) => (k, t) }.toDF("key", "text"),
        Seq("join", "hash"), k = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    hits.foreach { h =>
      assert(viaTerms(h.getString(0)) == h.getDouble(1),
        s"${h.getString(0)}: fullText ${h.getDouble(1)} != lexical ${viaTerms(h.getString(0))}")
    }
    // d5 (3x hash + join) must outrank single-mention docs
    assert(hits.head.getString(0) == "d5")
  }

  test("all-stopword query returns empty with the search envelope") {
    val (client, name) = mkClient()
    val out = client.fullTextSearch(name, "the a an", k = 5)
    assert(out.columns.toSeq == Seq("vector_key", "distance", "metadata"))
    assert(out.count() == 0)
  }

  test("filter gates ranking with whole-corpus stats") {
    val (client, name) = mkClient()
    val unfiltered = client.fullTextSearch(name, "hash join", k = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val filtered = client.fullTextSearch(name, "hash join", k = 5,
        filter = Some(element_at(col("meta"), "grp") === "infra")).collect()
    assert(filtered.nonEmpty)
    assert(filtered.forall(
      _.getAs[Map[String, String]]("metadata")("grp") == "infra"))
    // Lucene filtered-query semantics: scores are UNCHANGED by the
    // filter (corpus stats stay whole) — only membership narrows
    filtered.foreach { h =>
      assert(unfiltered(h.getString(0)) == h.getDouble(1),
        "filter must not shift idf/scores")
    }
  }

  test("stale or absent text index raises loudly — no silent fallback") {
    import spark.implicits._
    val (client, name) = mkClient()
    // a write stales the index
    client.upsert(name, Seq(("d9", Seq(0f, 1f, 0f, 0f),
      Map.empty[String, String])).toDF("key", "vec", "meta"))
    val e = intercept[IllegalArgumentException] {
      client.fullTextSearch(name, "hash", k = 3)
    }
    assert(e.getMessage.contains("STALE"))
    // append re-freshens and the search works again
    client.appendTextIndex(name, Seq(("d9", "no relevant words here"))
      .toDF("key", "text"))
    assert(client.fullTextSearch(name, "hash", k = 3).count() > 0)
    // absent index on a fresh collection
    val root2 = java.nio.file.Files.createTempDirectory("graft-ft2").toString
    val c2 = new GraftClient(spark, root2)
    c2.createCollection("bare", dim = 4)
    c2.upsert("bare", Seq(("x", Seq(1f, 0f, 0f, 0f),
      Map.empty[String, String])).toDF("key", "vec", "meta"))
    assert(intercept[IllegalArgumentException] {
      c2.fullTextSearch("bare", "hash")
    }.getMessage.contains("no text index"))
  }

  test("hybridSearchText == hybridSearch given the analyzed terms (both fusions)") {
    import spark.implicits._
    val (client, name) = mkClient()
    val docsDf = docs.map { case (k, t, _) => (k, t) }.toDF("key", "text")
    val qvec = Array(0.9f, 0.1f, 0f, 0f)
    // "JOIN the Hash" analyzes to {join, hash} under the index's analyzer
    for (fusion <- Seq("rrf", "weighted")) {
      val viaText = client.hybridSearchText(name, "JOIN the Hash", qvec,
          k = 5, fusion = fusion)
        .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
      val viaTerms = client.hybridSearch(name, docsDf, Seq("join", "hash"),
          qvec, k = 5, fusion = fusion)
        .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
      assert(viaText == viaTerms, s"$fusion: $viaText != $viaTerms")
    }
    // the raw-text form needs NO docs frame but DOES need a fresh index
    client.upsert(name, Seq(("dx", Seq(0f, 0f, 1f, 0f),
      Map.empty[String, String])).toDF("key", "vec", "meta"))
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchText(name, "hash", qvec, k = 3)
    }.getMessage.contains("STALE"))
  }

  test("outputFields projects metadata fields; vec rejected toward fetch") {
    val (client, name) = mkClient()
    val out = client.fullTextSearch(name, "scan", k = 3,
      outputFields = Seq("grp")).collect()
    assert(out.nonEmpty)
    assert(out.head.schema.fieldNames.toSeq == Seq("vector_key", "distance", "grp"))
    assert(intercept[IllegalArgumentException] {
      client.fullTextSearch(name, "scan", k = 3, outputFields = Seq("vec"))
    }.getMessage.contains("vec"))
  }
}
