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

  // ---- multi-partition BM25 (r15 — VERDICT r14's #2) ----

  private val p1Docs = Seq(
    ("m1", "hash join beats nested loops on big tables"),
    ("m2", "the scan reads pages while the hash table builds"),
    ("m3", "hash hash hash collision storms hurt the join"))
  private val p2Docs = Seq(
    ("m4", "sort merge join shines when inputs arrive ordered"),
    ("m5", "a scan without an index touches every page"),
    ("m6", "broadcast join skips the shuffle for small tables"))
  private val defDocs = Seq( // in NO scope — must never leak into p1+p2
    ("m7", "hash join hash join hash join hash join"),
    ("m8", "scan scan scan scan scan scan"))

  private def upsertTextRows(client: GraftClient, name: String,
      docs: Seq[(String, String)], partition: String): Unit = {
    import spark.implicits._
    client.upsert(name, docs.map { case (k, _) =>
      (k, Seq(1f, 0f, 0f, 0f), Map("src" -> partition))
    }.toDF("key", "vec", "meta"), partition = partition)
  }

  test("2-partition scope == a single index over the union corpus") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ftmp").toString
    val client = new GraftClient(spark, root)

    // the SPLIT collection: p1 + p2 + default, one text index each
    client.createCollection("split", dim = 4, buckets = 4)
    client.createPartition("split", "p1")
    client.createPartition("split", "p2")
    upsertTextRows(client, "split", defDocs, graft.api.GraftClient.DefaultPartition)
    upsertTextRows(client, "split", p1Docs, "p1")
    upsertTextRows(client, "split", p2Docs, "p2")
    client.buildTextIndex("split", defDocs.toDF("key", "text"))
    client.buildTextIndex("split", p1Docs.toDF("key", "text"), partition = "p1")
    client.buildTextIndex("split", p2Docs.toDF("key", "text"), partition = "p2")

    // the REFERENCE collection: exactly p1 ∪ p2 as one corpus, one index
    client.createCollection("union", dim = 4, buckets = 4)
    upsertTextRows(client, "union", p1Docs ++ p2Docs,
      graft.api.GraftClient.DefaultPartition)
    client.buildTextIndex("union", (p1Docs ++ p2Docs).toDF("key", "text"))

    // the global-stats contract: same keys, same SCORES (df/avgdl/N all
    // from the merged base), same order
    val q = "hash join scan"
    val scoped = client.fullTextSearch("split", q, k = 10,
        partitions = Seq("p1", "p2")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val reference = client.fullTextSearch("union", q, k = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(scoped == reference)
    assert(scoped.nonEmpty)
    // the out-of-scope default docs (BM25-loaded with these exact terms)
    // must not appear
    assert(!scoped.exists(h => Set("m7", "m8").contains(h._1)))

    // a filter gates candidates across BOTH partitions while stats stay
    // merged-corpus (Lucene filtered-query semantics)
    val filtered = client.fullTextSearch("split", q, k = 10,
        partitions = Seq("p1", "p2"),
        filter = Some(org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.col("meta"),
          org.apache.spark.sql.functions.lit("src")) === "p2")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(filtered.nonEmpty && filtered.forall(h => Set("m4", "m5", "m6")(h._1)))
    val refFiltered = reference.filter(h => Set("m4", "m5", "m6")(h._1))
    assert(filtered == refFiltered)

    // the hybrid Bm25Text arm now accepts a multi-partition scope and
    // ranks from the SAME merged base
    val qv = Array(1f, 0f, 0f, 0f)
    val hy = client.hybridSearchRequests("split",
      Seq(graft.api.AnnRequest.Dense(qv), graft.api.AnnRequest.Bm25Text(q)),
      k = 6, armK = 10, partitions = Seq("p1", "p2")).collect()
    assert(hy.nonEmpty)
    assert(!hy.exists(r => Set("m7", "m8").contains(r.getString(0))))
    // the BM25 arm's rank order inside the fusion must match the scoped
    // fullTextSearch ranking
    val lexRanks = hy.map(r => r.getString(0) -> r.get(2)).filter(_._2 != null)
      .map { case (k2, v) => k2 -> v.asInstanceOf[Long] }.sortBy(_._2)
      .map(_._1).toSeq
    assert(lexRanks == scoped.take(lexRanks.size).map(_._1))

    // per-partition freshness still gates: staling ONE scoped partition
    // fails the whole scoped search loudly
    upsertTextRows(client, "split", Seq(("m9", "fresh writes stale indexes")), "p1")
    assert(intercept[IllegalArgumentException] {
      client.fullTextSearch("split", q, k = 5, partitions = Seq("p1", "p2"))
    }.getMessage.contains("STALE"))
    // ... while the untouched partition alone still serves
    assert(client.fullTextSearch("split", q, k = 5,
      partitions = Seq("p2")).collect().nonEmpty)
  }

  test("a doc id with matching postings in TWO scoped partitions is " +
       "refused loudly (r16 — duplicate ids merge as neither one doc " +
       "nor two)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ftdup").toString
    val client = new GraftClient(spark, root)
    client.createCollection("dup", dim = 4, buckets = 4)
    client.createPartition("dup", "p1")
    client.createPartition("dup", "p2")
    // the SAME key upserted into two independent partition stores —
    // nothing upstream prevents this (partitions are disjoint only by
    // caller discipline)
    upsertTextRows(client, "dup", Seq(("d1", "hash join scan")), "p1")
    upsertTextRows(client, "dup",
      Seq(("d1", "hash join again"), ("d2", "merge sort")), "p2")
    client.buildTextIndex("dup", Seq(("d1", "hash join scan"))
      .toDF("key", "text"), partition = "p1")
    client.buildTextIndex("dup",
      Seq(("d1", "hash join again"), ("d2", "merge sort"))
        .toDF("key", "text"), partition = "p2")
    val e = intercept[IllegalArgumentException] {
      client.fullTextSearch("dup", "hash join", k = 5,
        partitions = Seq("p1", "p2"))
    }
    assert(e.getMessage.contains("more than one scoped partition"))
    // a query whose terms the duplicated doc does NOT match merges
    // fine — the refusal scopes to rows that could skew this query
    assert(client.fullTextSearch("dup", "merge sort", k = 5,
        partitions = Seq("p1", "p2")).collect()
      .map(_.getString(0)).toSeq == Seq("d2"))
  }

  test("analyzer mismatch across scoped partitions is refused loudly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ftan").toString
    val client = new GraftClient(spark, root)
    client.createCollection("an", dim = 4, buckets = 4)
    client.createPartition("an", "p1")
    upsertTextRows(client, "an", p1Docs, graft.api.GraftClient.DefaultPartition)
    upsertTextRows(client, "an", p2Docs, "p1")
    client.buildTextIndex("an", p1Docs.toDF("key", "text"),
      analyzer = "whitespace")
    client.buildTextIndex("an", p2Docs.toDF("key", "text"), partition = "p1",
      analyzer = "standard")
    val e = intercept[IllegalArgumentException] {
      client.fullTextSearch("an", "hash join", k = 5,
        partitions = Seq(graft.api.GraftClient.DefaultPartition, "p1"))
    }
    assert(e.getMessage.contains("analyzer"))
    // the refusal must NOT depend on the query text: an all-stopword
    // query must refuse the mismatched scope too, not slip through the
    // empty-terms early return (r15 review finding)
    val e2 = intercept[IllegalArgumentException] {
      client.fullTextSearch("an", "the", k = 5,
        partitions = Seq(graft.api.GraftClient.DefaultPartition, "p1"))
    }
    assert(e2.getMessage.contains("analyzer"))
    intercept[IllegalArgumentException] { // partition XOR partitions
      client.fullTextSearch("an", "hash", k = 5, partition = "p1",
        partitions = Seq("p1"))
    }
  }
}
