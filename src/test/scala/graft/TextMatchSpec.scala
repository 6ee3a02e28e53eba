package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftClient
import graft.ingest.Embedder

/** Milvus TEXT_MATCH parity: term-match filters on search/query gated by
  * the at-rest postings index — `matchTerms`/`matchMode` on [[GraftClient
  * .search]] and [[GraftClient.queryWhere]], plus the standalone
  * [[GraftClient.textMatchKeys]]. Freshness is a hard precondition (the
  * store keeps no text — there is nothing to fall back to), mirroring
  * Milvus's requirement of a match index on the field. */
class TextMatchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def mk(): GraftClient = new GraftClient(spark,
    java.nio.file.Files.createTempDirectory("graft-tm").toString)

  private val corpus = Seq(
    ("d1", "hash join over parquet files"),
    ("d2", "sort merge join planner"),
    ("d3", "full table scan fallback"),
    ("d4", "hash scan join hybrid path"),
    ("d5", "nothing relevant in here"))

  private def docsDf = {
    import spark.implicits._
    corpus.map { case (k, t) => (k, t, Map("src" -> "s")) }
      .toDF("key", "text", "meta")
  }

  private def keysOf(df: org.apache.spark.sql.DataFrame, c: String = "key") =
    df.select(c).collect().map(_.getString(0)).toSet

  private def seeded(): GraftClient = {
    val c = mk()
    c.createCollection("col", dim = 384)
    c.upsertTexts("col", docsDf)
    c.buildTextIndex("col", docsDf)
    c
  }

  test("textMatchKeys: any = OR of terms, all = conjoined TEXT_MATCH") {
    val c = seeded()
    assert(keysOf(c.textMatchKeys("col", Seq("join"))) == Set("d1", "d2", "d4"))
    assert(keysOf(c.textMatchKeys("col", Seq("join", "scan"))) ==
      Set("d1", "d2", "d3", "d4"))
    assert(keysOf(c.textMatchKeys("col", Seq("join", "scan"), mode = "all")) ==
      Set("d4"))
    assert(c.textMatchKeys("col", Seq("absent-term")).count() == 0)
    assertThrows[IllegalArgumentException](
      c.textMatchKeys("col", Seq("join"), mode = "nope"))
    assertThrows[IllegalArgumentException](c.textMatchKeys("col", Nil))
  }

  test("search gates candidates through the match; ranking = filtered exact ranking") {
    val c = seeded()
    val q = Embedder.text.embedText("hash join")
    val gated = c.search("col", q, k = 10, matchTerms = Seq("join"))
    val gatedKeys = gated.select("vector_key").collect().map(_.getString(0))
    assert(gatedKeys.toSet == Set("d1", "d2", "d4"))
    // ranking parity: same order as the full search restricted post-hoc
    val full = c.search("col", q, k = 10)
      .select("vector_key").collect().map(_.getString(0))
    assert(gatedKeys.toSeq == full.filter(Set("d1", "d2", "d4")).toSeq)
    // match composes with a metadata filter conjunctively
    val both = c.search("col", q, k = 10,
      filter = Some(col("key") =!= "d2"), matchTerms = Seq("join"))
    assert(keysOf(both, "vector_key") == Set("d1", "d4"))
  }

  test("queryWhere with matchTerms: per-partition postings semi-join") {
    val c = seeded()
    assert(keysOf(c.queryWhere("col", lit(true), matchTerms = Seq("scan"))) ==
      Set("d3", "d4"))
    assert(keysOf(c.queryWhere("col", col("key") =!= "d3",
      matchTerms = Seq("scan"))) == Set("d4"))
  }

  test("staleness is a hard error; append is the recovery; maintained upserts stay fresh") {
    import spark.implicits._
    val c = seeded()
    // a commit the index never saw → stale → explicit error, not a miss
    c.upsertTexts("col", Seq(("d6", "another join workload", Map("src" -> "s")))
      .toDF("key", "text", "meta"))
    assertThrows[IllegalArgumentException](
      c.search("col", Embedder.text.embedText("join"), k = 5,
        matchTerms = Seq("join")))
    // append covers the delta and restamps → d6 now matches
    c.appendTextIndex("col", Seq(("d6", "another join workload"))
      .toDF("key", "text"))
    assert(keysOf(c.textMatchKeys("col", Seq("join"))) ==
      Set("d1", "d2", "d4", "d6"))
    // the auto-maintained write path keeps the match surface live
    c.upsertTexts("col", Seq(("d7", "join again", Map("src" -> "s")))
      .toDF("key", "text", "meta"), maintainTextIndex = true)
    assert(keysOf(c.queryWhere("col", lit(true), matchTerms = Seq("join"))) ==
      Set("d1", "d2", "d4", "d6", "d7"))
  }

  test("iterators carry the match gate across pages") {
    val c = seeded()
    val q = Embedder.text.embedText("hash join")
    val si = c.searchIterator("col", q, batchSize = 2, matchTerms = Seq("join"))
    val drained = si.flatten.map(_.getString(0)).toSeq
    assert(drained.toSet == Set("d1", "d2", "d4") && drained.size == 3)
    // distance order matches the one-shot gated search
    assert(drained == c.search("col", q, k = 10, matchTerms = Seq("join"))
      .select("vector_key").collect().map(_.getString(0)).toSeq)
    val qi = c.queryIterator("col", lit(true), batchSize = 1,
      matchTerms = Seq("scan"))
    assert(qi.flatten.map(_.getString(0)).toSeq == Seq("d3", "d4"))
  }

  test("PHRASE_MATCH: matchMode=phrase gates on in-order adjacency across surfaces") {
    val c = seeded()
    // d1 "hash join over parquet files" has the phrase; d4 "hash scan
    // join hybrid path" has both terms NOT adjacent — 'all' would match
    // it, phrase must not
    assert(keysOf(c.textMatchKeys("col", Seq("hash", "join"), mode = "all")) ==
      Set("d1", "d4"))
    assert(keysOf(c.textMatchKeys("col", Seq("hash", "join"), mode = "phrase")) ==
      Set("d1"))
    assert(keysOf(c.textMatchKeys("col", Seq("join", "hash"), mode = "phrase"))
      .isEmpty, "reversed phrase matches nothing")
    // search + queryWhere ride the same gate
    val q = Embedder.text.embedText("hash join")
    assert(c.search("col", q, k = 10, matchTerms = Seq("hash", "join"),
      matchMode = "phrase").collect().map(_.getString(0)).toSeq == Seq("d1"))
    assert(keysOf(c.queryWhere("col", lit(true), matchTerms = Seq("hash", "join"),
      matchMode = "phrase")) == Set("d1"))
    // the full Milvus filter string, split into predicate + gates
    val (pred, gates) = c.milvusFilterWithMatches(
      """PHRASE_MATCH(text, 'hash join') and src == "s"""")
    assert(gates == Seq((Seq("hash", "join"), "phrase")))
    assert(keysOf(c.queryWhere("col", pred.get, matchGates = gates)) == Set("d1"))
    // conjoined gates intersect: TEXT_MATCH any-of ∩ phrase
    val (pred2, gates2) = c.milvusFilterWithMatches(
      "TEXT_MATCH(text, 'parquet planner') and PHRASE_MATCH(text, 'hash join')")
    assert(pred2.isEmpty && gates2.size == 2)
    assert(keysOf(c.queryWhere("col", lit(true), matchGates = gates2)) == Set("d1"))
    // …and the one-call string surfaces carry the whole grammar
    assert(keysOf(c.queryMilvus("col",
      """PHRASE_MATCH(text, 'hash join') and src == "s"""")) == Set("d1"))
    // hybrid retrieval gates BOTH arms on the match conjuncts: only
    // phrase-matching docs may occupy fused slots
    val hyb = c.hybridSearch("col", docsDf, Seq("join"), q, k = 5,
      matchGates = Seq((Seq("hash", "join"), "phrase")))
      .collect().map(_.getString(0)).toSet
    assert(hyb == Set("d1"),
      s"hybrid arms must both honor the phrase gate, got $hyb")
    assert(c.searchMilvus("col", q, k = 10,
        filter = "PHRASE_MATCH(text, 'hash join')")
      .collect().map(_.getString(0)).toSeq == Seq("d1"))
    c.deleteMilvus("col", "PHRASE_MATCH(text, 'merge join')")
    assert(c.get("col", "d2").isEmpty, "deleteMilvus must honor the phrase gate")
    assert(c.get("col", "d1").isDefined)
  }

  test("matchTerms + allowDrift survives a mid-drain commit that stales the index") {
    import spark.implicits._
    val c = seeded()
    // both surfaces: the gate is pinned (and materialized) at drain
    // start, so a commit landing mid-drain — which stales the text index
    // (no maintenance here) — must neither throw nor change the match set
    val qi = c.queryIterator("col", lit(true), batchSize = 1,
      matchTerms = Seq("join"), allowDrift = true)
    assert(qi.next().map(_.getString(0)) == Seq("d1"))
    c.upsertTexts("col", Seq(("d9", "a new join doc", Map("src" -> "s")))
      .toDF("key", "text", "meta")) // stales the index; no appendTextIndex
    // a FRESH-index surface rejects the stale index (existing contract)…
    assertThrows[IllegalArgumentException](
      c.textMatchKeys("col", Seq("join")))
    // …but the in-flight drain, pinned at creation, keeps going
    val rest = qi.flatten.map(_.getString(0)).toSeq
    assert(rest == Seq("d2", "d4"),
      s"drain-start match set must keep serving after the commit, got $rest")
    // d9 is invisible to this drain: its match set predates the commit
    assert(!rest.contains("d9"))

    val q = Embedder.text.embedText("hash join")
    val si = c2Pinned(c, q)
    c.upsertTexts("col", Seq(("d10", "another join doc", Map("src" -> "s")))
      .toDF("key", "text", "meta"))
    val drained = si.flatten.map(_.getString(0)).toSeq
    assert(drained.toSet == Set("d1", "d2", "d4", "d9"),
      s"searchIterator must keep its drain-start match set, got $drained")
  }

  // a searchIterator created while the index is fresh (rebuilt to cover
  // d9), first page consumed — helper keeps the test above readable
  private def c2Pinned(c: GraftClient, q: Array[Float]) = {
    val docs = {
      import spark.implicits._
      (corpus :+ ("d9", "a new join doc"))
        .map { case (k, t) => (k, t, Map("src" -> "s")) }
        .toDF("key", "text", "meta")
    }
    c.buildTextIndex("col", docs)
    val it = c.searchIterator("col", q, batchSize = 2,
      matchTerms = Seq("join"), allowDrift = true)
    it
  }

  test("partitioned collections: per-partition text indexes, per-partition gates") {
    import spark.implicits._
    val c = mk()
    c.createCollection("colp", dim = 384)
    c.upsertTexts("colp", docsDf)
    c.buildTextIndex("colp", docsDf)
    c.createPartition("colp", "p2")
    val p2docs = Seq(("e1", "join inside p2", Map("src" -> "s")))
      .toDF("key", "text", "meta")
    c.upsert("colp", graft.ingest.Embedder.embedDocuments(
        p2docs, "text", graft.ingest.Embedder.text)
      .select(col("key"), col("vec"), col("meta")), partition = "p2")
    // before p2's index exists, an unscoped match fails loudly for p2 —
    // never a silent miss of p2's docs
    assertThrows[IllegalArgumentException](
      c.textMatchKeys("colp", Seq("join")))
    // scoped to the indexed partition it works; after building p2's
    // index the unscoped match covers both
    assert(keysOf(c.textMatchKeys("colp", Seq("join"),
      partitions = Seq(GraftClient.DefaultPartition))) == Set("d1", "d2", "d4"))
    c.buildTextIndex("colp", p2docs, partition = "p2")
    assert(keysOf(c.textMatchKeys("colp", Seq("join"))) ==
      Set("d1", "d2", "d4", "e1"))
    val hits = c.search("colp", Embedder.text.embedText("join p2"), k = 10,
      matchTerms = Seq("join"))
    assert(keysOf(hits, "vector_key") == Set("d1", "d2", "d4", "e1"))
    // per-partition append keeps p2's own staleness clock
    c.upsert("colp", graft.ingest.Embedder.embedDocuments(
        Seq(("e2", "another join doc", Map("src" -> "s")))
          .toDF("key", "text", "meta"), "text", graft.ingest.Embedder.text)
      .select(col("key"), col("vec"), col("meta")), partition = "p2")
    assertThrows[IllegalArgumentException](c.textMatchKeys("colp", Seq("join")))
    c.appendTextIndex("colp", Seq(("e2", "another join doc")).toDF("key", "text"),
      partition = "p2")
    assert(keysOf(c.textMatchKeys("colp", Seq("join"))) ==
      Set("d1", "d2", "d4", "e1", "e2"))
  }

  test("deleteWhere gates on matchTerms; upsertTexts routes + maintains a named partition") {
    import spark.implicits._
    val c = seeded()
    // Milvus delete(filter) with a TEXT_MATCH conjunct: docs containing
    // 'scan' go; the delete then stales the index (no text to re-derive)
    c.deleteWhere("col", lit(true), matchTerms = Seq("scan"))
    assert(keysOf(c.queryWhere("col", lit(true))) == Set("d1", "d2", "d5"))
    assertThrows[IllegalArgumentException](c.textMatchKeys("col", Seq("join")))

    // named-partition text corpus: routed upsertTexts + per-partition
    // auto-maintenance on that partition's own staleness clock
    val c2 = mk()
    c2.createCollection("colr", dim = 384)
    c2.createPartition("colr", "p2")
    c2.upsertTexts("colr", docsDf, partition = "p2")
    c2.buildTextIndex("colr", docsDf, partition = "p2")
    c2.upsertTexts("colr", Seq(("e1", "fresh join doc", Map("src" -> "s")))
      .toDF("key", "text", "meta"), maintainTextIndex = true, partition = "p2")
    assert(keysOf(c2.textMatchKeys("colr", Seq("join"),
      partitions = Seq("p2"))) == Set("d1", "d2", "d4", "e1"))
    // the (index-less) default partition still fails an unscoped match
    // loudly — never a silent miss
    assertThrows[IllegalArgumentException](c2.textMatchKeys("colr", Seq("join")))
  }

  test("SQ8 path: the gate applies before the stage-1 depth bound") {
    val c = mk()
    c.createCollection("colq", dim = 384, metric = "l2",
      indexType = "IVF_SQ8", nlist = 2)
    c.upsertTexts("colq", docsDf)
    c.buildTextIndex("colq", docsDf)
    c.buildIndex("colq", nlist = 2)
    val q = Embedder.text.embedText("hash join")
    // k=1 with a tight depth: an ungated stage 1 could fill its pool with
    // non-matching near neighbors; the gate must keep matches rankable
    val hit = c.search("colq", q, k = 1, nprobe = 2, refine = 1,
      matchTerms = Seq("scan", "join"), matchMode = "all")
    assert(keysOf(hit, "vector_key") == Set("d4"))
    val all = c.search("colq", q, k = 10, nprobe = 2,
      matchTerms = Seq("join"))
    assert(keysOf(all, "vector_key") == Set("d1", "d2", "d4"))
  }

  /** Independent sloppy-phrase oracle: enumerate EVERY selection of one
    * doc position per phrase occurrence (distinct positions) and accept
    * iff some selection's adjusted positions (q − i) span ≤ slop — the
    * Lucene matchLength definition, brute-forced with no greedy, no
    * window enumeration, so it shares nothing with the index's
    * algorithm. */
  private def bruteSloppy(text: String, phrase: Seq[String], slop: Int): Boolean = {
    val toks = text.split(" ").toIndexedSeq
    def rec(i: Int, chosen: List[Int]): Boolean =
      if (i == phrase.length) {
        val adj = chosen.reverse.zipWithIndex.map { case (q, idx) => q - idx }
        adj.max - adj.min <= slop
      } else toks.indices.exists(q =>
        toks(q) == phrase(i) && !chosen.contains(q) && rec(i + 1, q :: chosen))
    rec(0, Nil)
  }

  test("PHRASE_MATCH slop > 0: Lucene sloppy-phrase semantics vs a brute-force twin") {
    import spark.implicits._
    val c = mk()
    val slopCorpus = Seq(
      ("s1", "machine learning rocks"),      // exact phrase: slop 0
      ("s2", "learning machine rocks"),      // transposition: slop 2 (Milvus's doc example)
      ("s3", "machine deep learning"),       // one gap: slop 1
      ("s4", "machine very deep learning"),  // two gaps: slop 2
      ("s5", "a b a"),                       // repeated-term phrase, exact
      ("s6", "a a b c"),                     // repeated terms, displaced
      ("s7", "learning about the machine"),  // reversed with gaps
      ("s8", "machine machine learning"))    // duplicate first term
    c.createCollection("slopcol", dim = 384)
    c.upsertTexts("slopcol",
      slopCorpus.map { case (k, t) => (k, t, Map("src" -> "s")) }
        .toDF("key", "text", "meta"))
    c.buildTextIndex("slopcol",
      slopCorpus.map { case (k, t) => (k, t) }.toDF("key", "text"))
    // exhaustive cross-check: every (phrase, slop) pair against the twin
    val phrases = Seq(Seq("machine", "learning"), Seq("learning", "machine"),
      Seq("a", "b", "a"), Seq("a", "a"), Seq("machine", "rocks"))
    for (p <- phrases; s <- 0 to 4) {
      val mode = if (s == 0) "phrase" else s"phrase:$s"
      val idx = keysOf(c.textMatchKeys("slopcol", p, mode = mode))
      val twin = slopCorpus.filter { case (_, t) => bruteSloppy(t, p, s) }
        .map(_._1).toSet
      assert(idx == twin,
        s"phrase=${p.mkString(" ")} slop=$s: index=$idx twin=$twin")
    }
    // the canonical ladder, pinned explicitly for readability
    assert(keysOf(c.textMatchKeys("slopcol", Seq("machine", "learning"),
      mode = "phrase")) == Set("s1", "s8"))
    assert(keysOf(c.textMatchKeys("slopcol", Seq("machine", "learning"),
      mode = "phrase:1")) == Set("s1", "s3", "s8"))
    assert(keysOf(c.textMatchKeys("slopcol", Seq("machine", "learning"),
      mode = "phrase:2")) == Set("s1", "s2", "s3", "s4", "s8"),
      "slop 2 admits the transposition — Milvus's documented example")
    // the full Milvus filter string carries the slop argument through
    val (_, gates) = c.milvusFilterWithMatches(
      "PHRASE_MATCH(text, 'machine learning', 2)")
    assert(gates == Seq((Seq("machine", "learning"), "phrase:2")))
    assert(keysOf(c.queryWhere("slopcol", lit(true), matchGates = gates)) ==
      Set("s1", "s2", "s3", "s4", "s8"))
    assert(keysOf(c.queryMilvus("slopcol",
      "PHRASE_MATCH(text, 'machine learning', 1)")) == Set("s1", "s3", "s8"))
    // negative slop / non-literal slop are parse errors, like Milvus
    intercept[IllegalArgumentException](
      c.milvusFilterWithMatches("PHRASE_MATCH(text, 'machine learning', -1)"))
    intercept[IllegalArgumentException](
      c.milvusFilterWithMatches("PHRASE_MATCH(text, 'machine learning', 'two')"))
    // malformed slop-mode strings fail loudly at the index surface
    intercept[IllegalArgumentException](
      c.textMatchKeys("slopcol", Seq("machine"), mode = "phrase:x"))
  }

  test("standard analyzer: lowercase + split on non-alphanumerics; query analyzed identically") {
    import spark.implicits._
    val c = mk()
    val mixed = Seq(
      ("e1", "Hash-Join over Parquet FILES!"),
      ("e2", "the sort/merge JOIN planner"),
      ("e3", "full table scan fallback"),
      ("e4", "hash scan, join: hybrid path"))
    c.createCollection("std", dim = 384)
    c.upsertTexts("std",
      mixed.map { case (k, t) => (k, t, Map("src" -> "s")) }
        .toDF("key", "text", "meta"))
    c.buildTextIndex("std", mixed.map { case (k, t) => (k, t) }.toDF("key", "text"),
      analyzer = "standard", stopWords = Seq("the", "over"))
    // mixed-case query lowercases through the index's analyzer
    assert(keysOf(c.textMatchKeys("std", Seq("JOIN"))) == Set("e1", "e2", "e4"))
    // punctuation splits on BOTH sides: "Hash-Join" analyzes to two
    // tokens, expanding in place — all-mode needs both
    assert(keysOf(c.textMatchKeys("std", Seq("Hash-Join"), mode = "all")) ==
      Set("e1", "e4"))
    // stop terms drop from the query — "the scan" behaves as just "scan"
    assert(keysOf(c.textMatchKeys("std", Seq("the", "scan"))) == Set("e3", "e4"))
    // an all-stop query matches nothing (Lucene's empty query), loudly
    // not an error
    assert(c.textMatchKeys("std", Seq("the", "over")).count() == 0)
    // brute-force twin over the SAME analysis, every single-term query
    val stops = Set("the", "over")
    def analyze(t: String): Seq[String] =
      t.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}\\p{N}]+")
        .filter(_.nonEmpty).filterNot(stops).toSeq
    val vocab = mixed.flatMap { case (_, t) => analyze(t) }.distinct
    for (term <- vocab) {
      val idx = keysOf(c.textMatchKeys("std", Seq(term)))
      val twin = mixed.filter { case (_, t) => analyze(t).contains(term) }
        .map(_._1).toSet
      assert(idx == twin, s"term '$term': index=$idx twin=$twin")
    }
    // the whitespace index over the same corpus keeps the exact-token
    // contract: "JOIN" matches only e2's literal "JOIN" token (e1's
    // "Hash-Join" and e4's "join:" are single unsplit tokens there) —
    // proving the analyzer, not the corpus, changed the semantics
    val cw = mk()
    cw.createCollection("ws", dim = 384)
    cw.upsertTexts("ws",
      mixed.map { case (k, t) => (k, t, Map("src" -> "s")) }
        .toDF("key", "text", "meta"))
    cw.buildTextIndex("ws", mixed.map { case (k, t) => (k, t) }.toDF("key", "text"))
    assert(keysOf(cw.textMatchKeys("ws", Seq("JOIN"))) == Set("e2"))
    assert(cw.textMatchKeys("ws", Seq("join")).count() == 0,
      "lowercase 'join' appears nowhere as a whitespace token")
  }

  test("stop removal keeps position gaps: phrase slop survives (Lucene increments)") {
    import spark.implicits._
    val c = mk()
    val docs = Seq(
      ("g1", "machine the learning stack"), // machine@0 learning@2 — gapped
      ("g2", "machine learning stack"))     // machine@0 learning@1 — adjacent
    c.createCollection("gap", dim = 384)
    c.upsertTexts("gap",
      docs.map { case (k, t) => (k, t, Map("src" -> "s")) }
        .toDF("key", "text", "meta"))
    c.buildTextIndex("gap", docs.map { case (k, t) => (k, t) }.toDF("key", "text"),
      analyzer = "standard", stopWords = Seq("the"))
    // slop 0 requires adjacency — the gap where 'the' was keeps g1 out
    assert(keysOf(c.textMatchKeys("gap", Seq("machine", "learning"),
      mode = "phrase")) == Set("g2"))
    // slop 1 absorbs exactly that gap
    assert(keysOf(c.textMatchKeys("gap", Seq("machine", "learning"),
      mode = "phrase:1")) == Set("g1", "g2"))
    // a stop word INSIDE the phrase query drops (query compaction —
    // documented divergence from Lucene's gapped query): "machine the
    // learning" analyzes to the same two-term phrase
    assert(keysOf(c.textMatchKeys("gap", Seq("machine", "the", "learning"),
      mode = "phrase")) == Set("g2"))
  }

  test("Milvus analyzer_params JSON: verbatim dicts parse; unsupported forms refuse loudly") {
    import spark.implicits._
    import graft.index.Analyzer
    // the documented Milvus forms map exactly
    assert(Analyzer.fromMilvusParams(
      """{"tokenizer": "standard", "filter": ["lowercase",
         {"type": "stop", "stop_words": ["the", "a"]}]}""") ==
      Analyzer("standard", Seq("the", "a")))
    assert(Analyzer.fromMilvusParams("""{"tokenizer": "whitespace"}""") ==
      Analyzer("whitespace", Nil))
    // empty dict = Milvus's default analyzer (standard + lowercase)
    assert(Analyzer.fromMilvusParams("{}") == Analyzer("standard", Nil))
    // unsupported: silently-approximated analyzers would diverge from
    // the caller's Milvus collection — refuse instead
    intercept[IllegalArgumentException](
      Analyzer.fromMilvusParams("""{"tokenizer": "jieba"}"""))
    intercept[IllegalArgumentException](Analyzer.fromMilvusParams(
      """{"tokenizer": "standard", "filter": [{"type": "stemmer"}]}"""))
    intercept[IllegalArgumentException](Analyzer.fromMilvusParams(
      """{"tokenizer": "standard", "filter": [{"type": "stop", "stop_words": ["x"]}]}"""))
    intercept[IllegalArgumentException](Analyzer.fromMilvusParams("not json"))
    // e2e: the JSON surface builds the same index the direct form does
    val c = mk()
    val docs = Seq(("m1", "The Quick HASH join"), ("m2", "plain scan path"))
    c.createCollection("mvp", dim = 384)
    c.upsertTexts("mvp",
      docs.map { case (k, t) => (k, t, Map("src" -> "s")) }
        .toDF("key", "text", "meta"))
    c.buildTextIndexMilvus("mvp",
      docs.toDF("key", "text"),
      """{"tokenizer": "standard", "filter": ["lowercase",
         {"type": "stop", "stop_words": ["the"]}]}""")
    assert(keysOf(c.textMatchKeys("mvp", Seq("HASH"))) == Set("m1"))
    assert(c.textMatchKeys("mvp", Seq("the")).count() == 0)
  }

  test("custom analyzer chains (r13): _english_ stop expansion, length " +
       "filter, cjk bigram tokenizer — verbatim dicts, parity e2e") {
    import spark.implicits._
    import graft.index.Analyzer
    // _english_ expands to the built-in list, merged with user entries
    val a1 = Analyzer.fromMilvusParams(
      """{"tokenizer": "standard", "filter": ["lowercase",
         {"type": "stop", "stop_words": ["_english_", "scan"]}]}""")
    assert(a1.stopWords.contains("the") && a1.stopWords.contains("scan"))
    // length filter parses; max must be >= 1
    assert(Analyzer.fromMilvusParams(
      """{"tokenizer": "standard", "filter": ["lowercase",
         {"type": "length", "max": 6}]}""") ==
      Analyzer("standard", Nil, "none", 6))
    intercept[IllegalArgumentException](Analyzer.fromMilvusParams(
      """{"tokenizer": "standard", "filter": ["lowercase",
         {"type": "length", "max": 0}]}"""))
    // cjk tokenizer: jieba/chinese refuse loudly POINTING AT cjk
    val e1 = intercept[IllegalArgumentException](
      Analyzer.fromMilvusParams("""{"tokenizer": "jieba"}"""))
    assert(e1.getMessage.contains("cjk"))
    val e2 = intercept[IllegalArgumentException](
      Analyzer.fromMilvusParams("""{"type": "chinese"}"""))
    assert(e2.getMessage.contains("cjk"))
    assert(Analyzer.fromMilvusParams("""{"tokenizer": "cjk"}""") ==
      Analyzer("cjk", Nil))

    // cjkTokens: bigrams over CJK runs, lowercased tokens over non-CJK
    // runs, singletons for length-1 runs, separators dropped
    assert(Analyzer.cjkTokens("机器学习") == Seq("机器", "器学", "学习"))
    assert(Analyzer.cjkTokens("Deep 学习 models") ==
      Seq("deep", "学习", "models"))
    assert(Analyzer.cjkTokens("猫, and 犬!") == Seq("猫", "and", "犬"))
    assert(Analyzer.cjkTokens("ひらがなとカタカナ") ==
      Seq("ひら", "らが", "がな", "なと", "とカ", "カタ", "タカ", "カナ"))

    // serialization round-trips the new fields (build/append/query must
    // tokenize identically forever)
    val a2 = Analyzer("cjk", Seq("的"), "none", 5)
    assert(Analyzer.deserialize(a2.serialize) == a2)
    val a3 = Analyzer("standard", Nil, "none", 4)
    assert(Analyzer.deserialize(a3.serialize) == a3)

    // e2e CJK: index CJK docs, match via bigram expansion of the query
    val c = mk()
    c.createCollection("cjk1", dim = 384)
    val docs = Seq(
      ("d1", "机器学习 is great"), ("d2", "深度学习 models"), ("d3", "plain text"))
    c.upsertTexts("cjk1",
      docs.map { case (k, t) => (k, t, Map.empty[String, String]) }
        .toDF("key", "text", "meta"))
    c.buildTextIndexMilvus("cjk1", docs.toDF("key", "text"),
      """{"tokenizer": "cjk"}""")
    // query "学习" = one bigram; both CJK docs contain it
    assert(keysOf(c.textMatchKeys("cjk1", Seq("学习"))) == Set("d1", "d2"))
    // "机器学习" expands to 3 bigrams; mode all = only d1
    assert(keysOf(c.textMatchKeys("cjk1", Seq("机器学习"), mode = "all")) ==
      Set("d1"))
    // PHRASE over bigrams: consecutive positions hold within a run
    assert(keysOf(c.textMatchKeys("cjk1", Seq("机器学习"), mode = "phrase")) ==
      Set("d1"))
    // non-CJK tokens still match through the same chain
    assert(keysOf(c.textMatchKeys("cjk1", Seq("MODELS"))) == Set("d2"))

    // e2e length filter: over-length tokens drop from index AND query
    val c2 = mk()
    c2.createCollection("len1", dim = 384)
    val ldocs = Seq(("l1", "the predicate pushdown wins"), ("l2", "a scan loses"))
    c2.upsertTexts("len1",
      ldocs.map { case (k, t) => (k, t, Map.empty[String, String]) }
        .toDF("key", "text", "meta"))
    c2.buildTextIndexMilvus("len1", ldocs.toDF("key", "text"),
      """{"tokenizer": "standard", "filter": ["lowercase",
         {"type": "stop", "stop_words": ["_english_"]},
         {"type": "length", "max": 6}]}""")
    // "predicate" (9 chars) was never indexed; it also drops from the
    // query, so mode=all over ["predicate", "wins"] matches l1 (an
    // engine that kept it query-side would match NOTHING)
    assert(keysOf(c2.textMatchKeys("len1", Seq("predicate", "wins"),
      mode = "all")) == Set("l1"))
    // stop word "the" (_english_) drops the same way
    assert(keysOf(c2.textMatchKeys("len1", Seq("the", "wins"),
      mode = "all")) == Set("l1"))
    // a term that survives the chain still gates exactly
    assert(keysOf(c2.textMatchKeys("len1", Seq("scan"))) == Set("l2"))
  }

  test("Porter stemmer: the paper's own rule examples, verified stepwise") {
    import graft.index.PorterStemmer.stem
    // each expectation hand-derived through the 1980 paper's rule
    // tables (1a/1b/1c/2/3/4/5 in order) — not copied from a vector
    // file, so a rule-transcription bug fails loudly here
    val expected = Seq(
      "caresses" -> "caress", // 1a sses→ss
      "ponies" -> "poni",     // 1a ies→i
      "caress" -> "caress",   // 1a ss→ss
      "cats" -> "cat",        // 1a s→
      "agreed" -> "agre",     // 1b eed→ee (m>0), then 5a e-drop
                              // (m("agre")=1, not *o) — the canonical
                              // full-pipeline output, not 1b's "agree"
      "feed" -> "feed",       // 1b eed: m("f")=0 — unchanged
      "plastered" -> "plaster", // 1b ed→ (vowel in stem)
      "motoring" -> "motor",  // 1b ing→
      "hopping" -> "hop",     // 1b ing→ then double-c → single
      "falling" -> "fall",    // 1b double-l is NOT undoubled (l excluded)
      "filing" -> "file",     // 1b ing→ then m=1 ∧ *o → +e
      "happy" -> "happi",     // 1c y→i (vowel in stem)
      "sky" -> "sky",         // 1c: no vowel in "sk" — unchanged
      "relational" -> "relat",  // 2 ational→ate, 5a e-drop
      "conditional" -> "condit", // 2 tional→tion, 4 ion (*t)
      "rational" -> "ration")   // 2 longest-match 'ational' FAILS its
                                // m-condition (stem "r") and blocks the
                                // step — then 4 al→ (paper's own note)
    expected.foreach { case (in, want) =>
      assert(stem(in) == want, s"stem($in) = ${stem(in)}, want $want")
    }
    // co-stemming: the property retrieval actually uses
    val joinFamily = Seq("join", "joins", "joined", "joining").map(stem)
    assert(joinFamily.distinct.size == 1, s"join family diverged: $joinFamily")
    assert(Seq("run", "runs", "running").map(stem).distinct.size == 1)
    // short words pass through (the K≥2 cutoff, like Lucene)
    assert(stem("as") == "as" && stem("is") == "is")
  }

  test("english analyzer: inflected queries match inflected docs through the stem") {
    import spark.implicits._
    val c = mk()
    val docs = Seq(
      ("p1", "The planner joins two tables"),
      ("p2", "a joined result was cached"),
      ("p3", "JOINING large relations efficiently"),
      ("p4", "full scans of the heap"))
    c.createCollection("eng", dim = 384)
    c.upsertTexts("eng",
      docs.map { case (k, t) => (k, t, Map("src" -> "s")) }
        .toDF("key", "text", "meta"))
    c.buildTextIndex("eng", docs.map { case (k, t) => (k, t) }.toDF("key", "text"),
      analyzer = "english")
    // every inflection of the query matches every inflection in the
    // corpus — the point of stemming for retrieval
    for (q <- Seq("join", "joins", "JOINED", "joining"))
      assert(keysOf(c.textMatchKeys("eng", Seq(q))) == Set("p1", "p2", "p3"),
        s"query '$q'")
    assert(keysOf(c.textMatchKeys("eng", Seq("scanned"))) == Set("p4"),
      "scanned stems to scan like the corpus's 'scans'")
    // English preset stop words drop on both sides ('the', 'a', 'was')
    assert(c.textMatchKeys("eng", Seq("the", "was", "a")).count() == 0)
    // BM25 rides the same stemmed postings (fresh index path)
    val hits = c.searchLexical("eng",
      docs.map { case (k, t) => (k, t) }.toDF("key", "text"),
      Seq("joining"), k = 5).collect().map(_.getString(0)).toSet
    assert(hits == Set("p1", "p2", "p3"))
    // the Milvus built-in shorthand names the same preset
    assert(graft.index.Analyzer.fromMilvusParams("""{"type": "english"}""") ==
      graft.index.Analyzer.English)
    // and the explicit filter-chain spelling composes it piecewise
    assert(graft.index.Analyzer.fromMilvusParams(
      """{"tokenizer": "standard", "filter": ["lowercase",
         {"type": "stemmer", "language": "english"},
         {"type": "stop", "stop_words": ["the"]}]}""") ==
      graft.index.Analyzer("standard", Seq("the"), "porter"))
  }

  test("append inherits the META analyzer; BM25 after append == full rebuild, bit-identical") {
    import spark.implicits._
    import graft.index.{Analyzer, TextIndex}
    val an = Analyzer("standard", Seq("the", "a"))
    val all = Seq(
      (1L, "the Quick-Start GUIDE to hash joins"),
      (2L, "a hash JOIN beats the sort merge join"),
      (3L, "full scan fallback path"),
      (4L, "HASH tables and the scan plan"))
    val full = java.nio.file.Files.createTempDirectory("graft-an-full").toString
    TextIndex.build(all.toDF("doc_id", "text"), "doc_id", "text", full,
      analyzer = an)
    val inc = java.nio.file.Files.createTempDirectory("graft-an-inc").toString
    TextIndex.build(all.take(3).toDF("doc_id", "text"), "doc_id", "text", inc,
      analyzer = an)
    // the delta must tokenize through the INDEX's analyzer (from META),
    // not a caller default — otherwise df/dlen/positions diverge
    TextIndex.append(all.drop(3).toDF("doc_id", "text"), "doc_id", "text", inc)
    assert(TextIndex.analyzerOf(inc) == an, "append must preserve the analyzer")
    def scores(p: String): Seq[(Long, Double)] =
      TextIndex.bm25(spark, p, Seq("HASH", "Scan"), k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (f, i) = (scores(full), scores(inc))
    assert(f.nonEmpty, "analyzed query must score docs")
    assert(f == i, s"append-built scores $i != rebuild scores $f")
    // dlen counts INDEXED tokens (stop-removed): doc 2 has 8 raw tokens,
    // 2 stops — the doclen table must say 6 (Lucene field length)
    val dl = spark.read.parquet(
        java.nio.file.Files.list(java.nio.file.Paths.get(full)).toArray
          .map(_.toString).filter(_.contains("doclen")).head)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl(2L) == 6L, s"dlen must count stop-removed tokens, got ${dl(2L)}")
  }
}
