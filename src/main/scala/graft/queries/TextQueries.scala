package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.t

/** Text-analysis surface (C14 + the LLM-data-pipeline mandate): token
  * counting, TF-IDF, n-grams, quality scoring, language-ID heuristic,
  * document fingerprinting.
  *
  * Everything is Spark built-ins (split/explode/groupBy/lambda functions) —
  * the classic inverted-index shapes. At 100 TB the explode → groupBy(word)
  * shuffle is the canonical word-count pattern: map-side partial aggregation
  * collapses each partition to its vocabulary before the shuffle, so traffic
  * is O(distinct words), not O(tokens).
  */
object TextQueries {

  private def words(c: Column): Column = split(c, " ")

  /** C14: corpus token counts — top-50 words by frequency. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(words(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("word"))
      .limit(50)

  /** C14: TF-IDF over the corpus — tf from per-doc counts, df from the
    * whole corpus (N = 500 docs at sf0.01), idf = ln(N/df). */
  def tfIdf(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val tokens = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
    val tf = tokens.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tokens.select(col("doc_id"), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    // df is O(vocabulary) — huge at corpus scale, so NO broadcast hint:
    // AQE broadcasts it while it's small and shuffle-joins when it isn't.
    // The 1-row corpus count stays a broadcast.
    tf.join(df, Seq("word"))
      .crossJoin(broadcast(n))
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("word"))
  }

  /** C14: n-gram shingles — distinct 3-gram count + first shingle per doc.
    * Shingling is the native NGrams expression (see TextFunctions: the
    * transform/sequence lambda route is ~16× slower interpreted). */
  def ngramStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.ngrams(col("ws"), 3).as("shingles"))
      .select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_shingles"),
        size(array_distinct(col("shingles"))).cast("long").as("n_distinct_shingles"),
        element_at(col("shingles"), 1).as("first_shingle"))
      .orderBy(col("doc_id"))

  /** C14: per-language/source corpus stats. */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))

  /** LLM-pipeline: quality scoring — length, mean word length, stopword
    * ratio, unique-word ratio (the usual pre-training heuristics). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("n_chars"), words(col("text")).as("ws"))
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        round(col("n_chars").cast("double") / size(col("ws")), 6).as("mean_word_len"),
        round(size(expr("filter(ws, w -> w IN ('the','a','of','and','to','in'))"))
          .cast("double") / size(col("ws")), 6).as("stopword_ratio"),
        round(size(array_distinct(col("ws"))).cast("double") / size(col("ws")), 6)
          .as("unique_ratio"))
      .orderBy(col("doc_id"))
  }

  /** LLM-pipeline: language-ID heuristic — stopword-marker scoring (the
    * fixture text is synthetic so agreement with `lang` is incidental; the
    * machinery — marker ratio + argmax dispatch — is what's declared). */
  def languageId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang"), words(col("text")).as("ws"))
      .select(col("lang"),
        (size(expr("filter(ws, w -> w IN ('the','a'))")).cast("double") / size(col("ws")))
          .as("en_score"))
      .select(col("lang"),
        when(col("en_score") > 0.05, "en").otherwise("unknown").as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))

  /** LLM-pipeline: document fingerprinting — raw md5 + an order-invariant
    * canonical fingerprint (md5 of the sorted distinct vocabulary). */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        md5(col("text")).as("fp"),
        md5(concat_ws(" ", sort_array(array_distinct(words(col("text")))))).as("canon_fp"),
        substring(md5(col("text")), 1, 8).as("fp8"))
      .orderBy(col("doc_id"))

  /** LLM-pipeline: character-level Shannon entropy — the classic
    * gibberish/boilerplate detector (low entropy → repeated filler, high →
    * random noise; pre-training filters cut both tails). Two-level
    * aggregation: per-(doc, char) counts, then -Σ p·log2 p per doc — both
    * are map-side-combinable groupBys, so corpus scale-out is the same
    * word-count shape as everything else here. */
  def docEntropy(spark: SparkSession, dir: String): DataFrame = {
    val chars = t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
    val counts = chars.groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("doc_id")).agg(sum(col("cnt")).as("n"))
    counts.join(totals, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(
        round(-sum((col("cnt") / col("n")) * log(2.0, col("cnt") / col("n"))), 4)
          .as("entropy_bits"),
        count(lit(1)).as("n_distinct_chars"),
        max(col("n")).as("n_chars_actual"))
      .orderBy(col("doc_id"))
  }

  /** LLM-pipeline: corpus length histogram — width-50 buckets with share
    * and cumulative count (the "what do we truncate at" plot). */
  def docLengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = t(spark, dir, "documents")
      .groupBy((floor(col("n_chars") / 50) * 50).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("n_chars")), 4).as("avg_chars"))
    hist.select(col("bucket_lo"), col("n_docs"), col("avg_chars"),
        round(col("n_docs") * 100.0 / sum(col("n_docs")).over(Window.partitionBy()), 4)
          .as("pct"),
        sum(col("n_docs")).over(Window.orderBy(col("bucket_lo"))).as("cum_docs"))
      .orderBy(col("bucket_lo"))
  }

  /** LLM-pipeline: repetition ratio — the most-repeated 3-gram's share of
    * all 3-grams (the boilerplate/spam detector that catches what entropy
    * alone misses: long docs that loop one phrase). */
  def repetitionRatio(spark: SparkSession, dir: String): DataFrame = {
    val sh = t(spark, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.ngrams(words(col("text")), 3)).as("g"))
    sh.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_gram_n"),
        sum(col("cnt")).as("n_grams"),
        round(max(col("cnt")).cast("double") / sum(col("cnt")), 6).as("rep_ratio"))
      .orderBy(col("doc_id"))
  }

  /** LLM-pipeline: deterministic train/val split — assignment by
    * content-independent hash (md5 of the doc id, lexicographic threshold
    * over the uniform hex space: "e6" ≈ 90%). Hash-based splitting is the
    * production norm because it is stable under reshuffles, re-runs, and
    * corpus growth — a random() split is none of those. Output aggregates
    * per (split, lang) so the oracle checks the ASSIGNMENT (counts, id
    * extremes, length means all shift if any doc flips). */
  def trainValSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("split",
        when(md5(col("doc_id").cast("string")) < "e6", "train").otherwise("val"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("split"), col("lang"))

  /** Parameterized BM25 core over ANY (id, text) frame — the callable C14
    * retrieval surface (user terms, tunable k1/b/k), used by both the
    * declared `bm25_scores` query and `GraftClient.bm25`. Same
    * inverted-index shape as TF-IDF: tokens filtered to the query terms
    * BEFORE the tf groupBy, so the shuffle carries only matching postings
    * — at corpus scale that is Σ df(term), not the corpus. Per-doc sums
    * range over |terms| rows; round(6) absorbs engine summation-order
    * ulps. Emits (idCol, bm25), top `k` by score.
    *
    * `restrictTo` narrows CANDIDATES after stats bind (corpus idf — the
    * Lucene filtered-query semantic; see TextIndex.scoreTail), so this
    * path and the postings path stay hash-identical for filtered
    * queries too. */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k: Int = 15, k1: Double = 1.2, b: Double = 0.75,
           restrictTo: Option[DataFrame] = None): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // dlen is a PER-ROW expression (size of the split array), so the
    // document-length table needs no corpus-wide explode→groupBy shuffle:
    // avgdl is a partial-aggregated 1-row scan, and dlen rides the
    // matching postings. The only O(corpus) shuffle left is the tf
    // groupBy over ALREADY term-filtered tokens — Σ df(term) rows.
    val withLen = docs.select(col(idCol), words(col(textCol)).as("__ws"))
      .select(col(idCol), size(col("__ws")).cast("long").as("dlen"), col("__ws"))
    val avgdl = withLen.agg(avg(col("dlen")).as("avgdl"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val matching = withLen
      .select(col(idCol), col("dlen"), explode(col("__ws")).as("word"))
      .filter(col("word").isin(terms: _*))
    val tf = matching.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("tf"), first(col("dlen")).as("dlen"))
    // tf rows are distinct (doc, word) pairs already — df is a second
    // tiny aggregate over them, O(terms) output
    val dfT = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // the scoring expression and top-k tail are SHARED with the at-rest
    // postings path (TextIndex.bm25) — parity by construction, so riding
    // the index never changes a result hash
    graft.index.TextIndex.scoreTail(
      tf.join(dfT, Seq("word"))
        .crossJoin(broadcast(avgdl)).crossJoin(broadcast(nDocs)),
      idCol, k, k1, b, restrictTo)
  }

  /** Per-JVM cache of at-rest postings built for a fixture dir (the
    * declared queries' analogue of a collection's `buildTextIndex`): one
    * build per (dir, process), then every `bm25_scores`/`hybrid_rrf` run
    * rides the partition-pruned layout — the production shape, where
    * postings are built once and queried forever. */
  private val textIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def postingsFor(spark: SparkSession, dir: String): String =
    textIndexCache.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files.createTempDirectory("graft-textidx").toString
      graft.index.TextIndex.build(t(spark, d, "documents"), "doc_id", "text", p)
      p
    })

  /** Standard-analyzer postings twin of [[postingsFor]] (r12): the same
    * fixture corpus indexed through Milvus 2.5's `standard` tokenizer +
    * lowercase + stop filter — what `text_match_std_knn` rides. Cached
    * per (dir, process) like the whitespace one. */
  private val stdTextIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stdPostingsFor(spark: SparkSession, dir: String): String =
    stdTextIndexCache.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files.createTempDirectory("graft-textidx-std").toString
      graft.index.TextIndex.build(t(spark, d, "documents"), "doc_id", "text", p,
        analyzer = graft.index.Analyzer("standard", Seq("the", "a", "of")))
      p
    })

  /** B8/C14 — Milvus `TEXT_MATCH` under `analyzer_params` (r12): the
    * index is built with the `standard` analyzer (lowercase + split on
    * non-letter/digit runs) and a stop filter, and the QUERY terms pass
    * through the same analyzer — "JOIN" lowercases to join, the stop
    * word "the" drops from the query entirely — so a migrating caller's
    * mixed-case query matches exactly as Milvus's analyzer would. Match
    * set (all-mode over the analyzed terms) KNN-ranked like
    * [[textMatchKnn]]; the oracle recomputes the standard tokenization
    * with the identical regex in DuckDB. */
  def textMatchStdKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.l2_distance
    val matches = graft.index.TextIndex.matchingDocs(
      spark, stdPostingsFor(spark, dir), Seq("JOIN", "the", "Scan"), mode = "all")
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    emb.join(matches, emb("vec_id") === matches("doc_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(10)
  }

  /** Custom-chain postings (r13): the verbatim Milvus `analyzer_params`
    * dict with the `_english_` stop expansion AND the `length` filter —
    * standard tokenize + lowercase + (built-in English stops ∪ "scan")
    * + drop tokens longer than 6. Cached per (dir, process). */
  private val customTextIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def customPostingsFor(spark: SparkSession, dir: String): String =
    customTextIndexCache.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files.createTempDirectory("graft-textidx-cst").toString
      graft.index.TextIndex.build(t(spark, d, "documents"), "doc_id", "text", p,
        analyzer = graft.index.Analyzer.fromMilvusParams(
          """{"tokenizer": "standard", "filter": ["lowercase",
             {"type": "stop", "stop_words": ["_english_", "scan"]},
             {"type": "length", "max": 6}]}"""))
      p
    })

  /** B8/C14 (r13) — Milvus custom analyzer CHAIN on the ORACLE path:
    * `_english_` stop expansion + user stop word + `length` filter, the
    * query analyzed through the SAME chain. Every dropped query term is
    * LOAD-BEARING for the hash under mode "all": "Customer" (8 chars >
    * max 6) must drop through the length filter (join∧customer = 329
    * docs ≠ join = 394 — keeping it would shrink the match set), "the"
    * must drop through the expanded built-in stop list (join∧the =
    * 317), "scan" through the user entry — only an engine applying the
    * whole chain, index- AND query-side, reproduces docs-with-join. */
  def textMatchCustomKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.l2_distance
    val matches = graft.index.TextIndex.matchingDocs(
      spark, customPostingsFor(spark, dir),
      Seq("Customer", "the", "JOIN", "scan"), mode = "all")
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    emb.join(matches, emb("vec_id") === matches("doc_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(10)
  }

  // CJK-bigram postings (r13): the fixture corpus deterministically
  // TRANSLATED into CJK codepoints (char-wise bijection on a–z; digits
  // and punctuation become separators) so the cjk tokenizer's bigram
  // arm is exercised on real CJK runs — a transformation of the driver
  // table, not synthesized data. The bijection means bigram containment
  // in the translated space equals bigram containment in the original
  // lowercase-letter space, which is what the DuckDB oracle checks
  // without needing the mapping at all.
  private val CjkAbc = "一二三四五六七八九十百千万上下左右中大小天地人日月水"
  private val cjkTextIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cjkPostingsFor(spark: SparkSession, dir: String): String =
    cjkTextIndexCache.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files.createTempDirectory("graft-textidx-cjk").toString
      val corpus = t(spark, d, "documents").select(col("doc_id"),
        translate(regexp_replace(lower(col("text")), "[^a-z ]", " "),
          "abcdefghijklmnopqrstuvwxyz", CjkAbc).as("text"))
      graft.index.TextIndex.build(corpus, "doc_id", "text", p,
        analyzer = graft.index.Analyzer.fromMilvusParams(
          """{"tokenizer": "cjk"}"""))
      p
    })

  /** B8/C14 (r13) — the CJK BIGRAM tokenizer on the ORACLE path (the
    * engine's dictionary-free CJK arm behind `analyzer_params`; jieba
    * refuses loudly): the corpus translated into CJK runs, indexed
    * through `{"tokenizer": "cjk"}`, and the query — the translation of
    * "join" — expands driver-side into its three overlapping bigrams,
    * matched mode-"all" from the postings. The oracle replays bigram
    * semantics in the ORIGINAL letter space (the translation is a
    * bijection, so the match sets are equal by construction): a doc
    * matches iff its per-word bigram set covers {jo, oi, in}. Pins run
    * detection, bigram emission order-independence, query expansion,
    * and build/query analysis identity. */
  def textMatchCjkKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.l2_distance
    val mapping = "abcdefghijklmnopqrstuvwxyz".zip(CjkAbc).toMap
    val qTerm = "join".map(mapping).mkString
    val matches = graft.index.TextIndex.matchingDocs(
      spark, cjkPostingsFor(spark, dir), Seq(qTerm), mode = "all")
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    emb.join(matches, emb("vec_id") === matches("doc_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(10)
  }

  /** Per-JVM client collection for the Milvus FULL-TEXT-SEARCH surface
    * (r12): the docs-with-embeddings subset written through the client's
    * full upsert pipeline, text index attached with the `standard`
    * analyzer + a stop filter — the BM25 "function field". Root cached
    * per (dir, process) like the other client fixtures. */
  private val ftRootCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ftClientFor(spark: SparkSession, dir: String): graft.api.GraftClient = {
    val root = ftRootCache.computeIfAbsent(dir, { d =>
      val r = java.nio.file.Files.createTempDirectory("graft-ft").toString
      val c = new graft.api.GraftClient(spark, r)
      val emb = t(spark, d, "embeddings")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      c.createCollection("docsft", dim = dim, buckets = 8)
      c.upsert("docsft", emb.select(
        col("vec_id").cast("string").as("key"),
        col("embedding").as("vec"),
        typedLit(Map.empty[String, String]).as("meta")))
      val corpus = t(spark, d, "documents")
        .join(emb.select(col("vec_id")), col("doc_id") === col("vec_id"))
        .select(col("doc_id").cast("string").as("key"), col("text"))
      c.buildTextIndex("docsft", corpus, analyzer = "standard",
        stopWords = Seq("the"))
      r
    })
    new graft.api.GraftClient(spark, root)
  }

  /** B8/C14 (r12) — Milvus 2.5 FULL-TEXT SEARCH on the ORACLE path:
    * `fullTextSearch` takes the RAW query string "Hash JOIN the scan",
    * runs it through the index's persisted `standard` analyzer ("Hash"
    * lowercases, the stop word "the" drops), and ranks by BM25 from the
    * at-rest postings — the engine's analog of searching a Milvus BM25
    * function field with a text query. The oracle recomputes the
    * analyzer and the BM25 formula in DuckDB over the same corpus; the
    * inner top-k cut tie-breaks on the STRING key exactly as the
    * engine's envelope does. */
  def fulltextSearchStd(spark: SparkSession, dir: String): DataFrame = {
    val client = ftClientFor(spark, dir)
    client.fullTextSearch("docsft", "Hash JOIN the scan", k = 15)
      .select(col("vector_key").cast("long").as("doc_id"),
        col("distance").as("bm25"))
      .orderBy(desc("bm25"), col("doc_id"))
  }

  /** Per-JVM PARTITIONED client collection for the multi-partition
    * full-text surface (r15 — VERDICT r14's #2): the docsft corpus
    * split by doc_id parity into two NAMED partitions, each with its
    * own text index under the same `standard` analyzer. The odd
    * partition's index is deliberately built over a PARTIAL corpus and
    * completed by [[graft.api.GraftClient.appendTextIndex]] — so the
    * merged-stats query below is exact only if the append maintained
    * (n_docs, sum_dlen) and the tombstone-masked postings exactly
    * (maintenance load-bearing for the oracle hash, the house
    * pattern). */
  private val ftmpRootCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ftmpClientFor(spark: SparkSession, dir: String): graft.api.GraftClient = {
    val root = ftmpRootCache.computeIfAbsent(dir, { d =>
      val r = java.nio.file.Files.createTempDirectory("graft-ftmp").toString
      val c = new graft.api.GraftClient(spark, r)
      val emb = t(spark, d, "embeddings")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      c.createCollection("docsftmp", dim = dim, buckets = 8)
      c.createPartition("docsftmp", "even")
      c.createPartition("docsftmp", "odd")
      val corpus = t(spark, d, "documents")
        .join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("text"), col("embedding"))
      def rowsOf(pred: org.apache.spark.sql.Column) = corpus.filter(pred)
        .select(col("doc_id").cast("string").as("key"),
          col("embedding").as("vec"),
          typedLit(Map.empty[String, String]).as("meta"))
      def textsOf(pred: org.apache.spark.sql.Column) = corpus.filter(pred)
        .select(col("doc_id").cast("string").as("key"), col("text"))
      val even = col("doc_id") % 2 === 0
      val oddInit = col("doc_id") % 2 === 1 && col("doc_id") % 4 === 1
      val oddDelta = col("doc_id") % 2 === 1 && col("doc_id") % 4 === 3
      c.upsert("docsftmp", rowsOf(even), partition = "even")
      c.buildTextIndex("docsftmp", textsOf(even), partition = "even",
        analyzer = "standard", stopWords = Seq("the"))
      // odd: initial half → build, second half committed AFTER the
      // build (stales the index), completed by the append — the merged
      // query refuses unless the append re-freshened, and hash-matches
      // only if it maintained the stats/postings exactly
      c.upsert("docsftmp", rowsOf(oddInit), partition = "odd")
      c.buildTextIndex("docsftmp", textsOf(oddInit), partition = "odd",
        analyzer = "standard", stopWords = Seq("the"))
      c.upsert("docsftmp", rowsOf(oddDelta), partition = "odd")
      c.appendTextIndex("docsftmp", textsOf(oddDelta), partition = "odd")
      r
    })
    new graft.api.GraftClient(spark, root)
  }

  /** B6/C14 (r15 — VERDICT r14's #2) — multi-partition BM25 on the
    * ORACLE path: `fullTextSearch(partitions = ["even", "odd"])` scores
    * the two partitions' text indexes as ONE merged corpus
    * ([[graft.index.TextIndex.bm25Merged]] — df over the unioned live
    * postings, n_docs/avgdl from the exact integer Σ of the per-index
    * stats rows). Because even ∪ odd tiles the whole docsft corpus,
    * DuckDB replays the ranking as plain whole-corpus BM25 — a single
    * stats-base error (df counted per partition, avgdl from one side,
    * an append that drifted sum_dlen, a tombstone leak in the odd
    * index's two-segment layout) breaks the hash. */
  def fulltextMultiPartition(spark: SparkSession, dir: String): DataFrame = {
    val client = ftmpClientFor(spark, dir)
    client.fullTextSearch("docsftmp", "Hash JOIN the scan", k = 15,
        partitions = Seq("even", "odd"))
      .select(col("vector_key").cast("long").as("doc_id"),
        col("distance").as("bm25"))
      .orderBy(desc("bm25"), col("doc_id"))
  }

  /** C14 retrieval: BM25 scoring (k1=1.2, b=0.75) for a fixed 3-term query
    * — the lexical-search twin of the KNN surface (hybrid retrieval runs
    * both); the declared, oracle-pinned instantiation of the BM25 core,
    * riding the AT-REST postings index (built once per process, queried
    * via bucket partition prune + pushed term filter). */
  def bm25Scores(spark: SparkSession, dir: String): DataFrame =
    graft.index.TextIndex.bm25(spark, postingsFor(spark, dir),
      Seq("join", "hash", "scan"))

  /** B6/C14 — Milvus `TEXT_MATCH` as a KNN pre-filter: docs containing
    * ALL of {'join','scan'} (the conjoined-TEXT_MATCH form), KNN-ranked
    * by exact L2 against vec_id 0's embedding. The match set comes from
    * the AT-REST postings index ([[graft.index.TextIndex.matchingDocs]]
    * — bucket partition prune + pushed `term IN`, I/O ∝ Σ df(term)), so
    * the oracle pins the production gate the client's `matchTerms`
    * parameter applies inside search/queryWhere. */
  def textMatchKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.l2_distance
    val matches = graft.index.TextIndex.matchingDocs(
      spark, postingsFor(spark, dir), Seq("join", "scan"), mode = "all")
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    emb.join(matches, emb("vec_id") === matches("doc_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(10)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (RRF, the standard k=60
    * variant) of the BM25 lexical arm and the exact L2 KNN vector arm —
    * the two-sided surface the reference implies (lexical `search.py`
    * next to vector `search.py`). `doc_id` aligns with `vec_id` in the
    * fixture, standing in for "the same corpus embedded".
    *
    * Shape at scale: each arm is top-k-pushed (TakeOrderedAndProject)
    * BEFORE its rank window, so the windows rank ≤15 survivors — the
    * same limit-below-window contract as corpus_shuffle/vocab_coverage
    * (plan-guarded). The fuse is a 15×15 full-outer join on doc_id. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.l2_distance
    val lexTop = bm25Scores(spark, dir) // (doc_id, bm25) — top 15
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val vecTop = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(15)
    val lex = lexTop.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("bm25"), col("doc_id")))
        .cast("long").as("lex_rank"))
    val vec = vecTop.select(col("vec_id").as("doc_id"),
      row_number().over(Window.orderBy(col("dist"), col("vec_id")))
        .cast("long").as("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        round(coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)), 6).as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(10)
  }

  /** Hybrid retrieval, weighted-score fusion (the Milvus `WeightedRanker`
    * sibling of [[hybridRrf]]'s RRF): each arm's top-15 scores are min-max
    * normalized to [0,1] WITHIN the arm — BM25 ascending-good, L2 distance
    * descending-good — then fused as 0.7·vec + 0.3·lex. Rank fusion (RRF)
    * discards score magnitudes; weighted fusion keeps them, which is what
    * you want when one arm's confidence should dominate ties. A doc
    * missing from an arm contributes 0 from that arm (standard
    * WeightedRanker semantics for un-retrieved candidates); a DEGENERATE
    * arm (one hit, or all scores tied) normalizes to 1.0 — every
    * retrieved doc is jointly the arm's best, and 0 would collapse the
    * arm's only hit into the un-retrieved case. Same scale shape as
    * hybrid_rrf: both arms top-k-pushed before the (≤15-row)
    * normalization windows; the fuse is a 15×15 full-outer join. */
  def hybridWeighted(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.l2_distance
    val wAll = Window.partitionBy() // 15-row frames — global min/max per arm
    val lexTop = bm25Scores(spark, dir) // (doc_id, bm25) — top 15
    val lex = lexTop
      .withColumn("__mn", min(col("bm25")).over(wAll))
      .withColumn("__mx", max(col("bm25")).over(wAll))
      .select(col("doc_id"),
        when(col("__mx") > col("__mn"),
          (col("bm25") - col("__mn")) / (col("__mx") - col("__mn")))
          .otherwise(lit(1.0)).as("lex_norm"))
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val vecTop = emb.crossJoin(broadcast(q))
      .select(col("vec_id"), l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(15)
    val vec = vecTop
      .withColumn("__mn", min(col("dist")).over(wAll))
      .withColumn("__mx", max(col("dist")).over(wAll))
      .select(col("vec_id").as("doc_id"),
        when(col("__mx") > col("__mn"),
          (col("__mx") - col("dist")) / (col("__mx") - col("__mn")))
          .otherwise(lit(1.0)).as("vec_norm"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(col("lex_norm"), 6).as("lex_norm"),
        round(col("vec_norm"), 6).as("vec_norm"),
        round(lit(0.7) * coalesce(col("vec_norm"), lit(0.0))
          + lit(0.3) * coalesce(col("lex_norm"), lit(0.0)), 6).as("wscore"))
      .orderBy(desc("wscore"), col("doc_id"))
      .limit(10)
  }

  /** PII scrubbing — the redaction pass every training-data build runs
    * before export (emails, phone numbers, IPv4 addresses → typed
    * placeholder tokens). Pure per-row regex work: embarrassingly
    * parallel, no shuffle at any corpus size.
    *
    * The fixture corpus contains no natural PII, so the query INJECTS a
    * deterministic doc_id-derived email/phone/IP into each doc first —
    * the redaction kernel (patterns, replacement order, counts) is the
    * operator under test; the injection is the harness, and the oracle
    * recomputes both sides. Patterns are written in the common
    * Java-regex/RE2 subset so Spark and DuckDB agree byte-for-byte. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
    val ipRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    val d = col("doc_id").cast("string")
    val raw = concat(col("text"),
      lit(" contact user"), d, lit("@example.com phone 555-"),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
      lit("."), ((col("doc_id") * 7) % 256).cast("string"))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(raw, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")
    t(spark, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        size(regexp_extract_all(raw, lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(raw, lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        size(regexp_extract_all(raw, lit(ipRe), lit(0))).cast("long").as("n_ips"),
        md5(redacted).as("redacted_fp"),
        length(redacted).cast("long").as("n_chars_redacted"))
      .orderBy(col("doc_id"))
  }

  /** B8/C14 — Milvus `PHRASE_MATCH` as a KNN pre-filter: docs containing
    * the exact phrase "hash join" (terms ADJACENT and IN ORDER — slop 0,
    * Milvus's default), KNN-ranked by exact L2 against vec_id 0's
    * embedding. The match set rides the POSITIONAL postings index
    * ([[graft.index.TextIndex.matchingDocs]] mode = "phrase": bucket
    * partition prune + pushed `term IN`, then a per-doc position
    * intersection over only the docs containing every term — I/O ∝
    * Σ df(term), never corpus). The oracle expresses adjacency as the
    * whitespace-delimited substring ' hash join ' — exactly token
    * adjacency under the engine's single-space tokenizer. */
  def phraseMatchKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.l2_distance
    val matches = graft.index.TextIndex.matchingDocs(
      spark, postingsFor(spark, dir), Seq("hash", "join"), mode = "phrase")
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    emb.join(matches, emb("vec_id") === matches("doc_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(10)
  }

  /** B8/C14 — Milvus `PHRASE_MATCH` with slop: the verbatim filter
    * string `PHRASE_MATCH(text, 'hash join', 1)` a migrating caller
    * passes, parsed by [[graft.api.MilvusFilter.parseWithMatches]] into
    * the (terms, "phrase:1") gate and evaluated on the POSITIONAL
    * postings index (Lucene sloppy-phrase semantics: one doc position
    * per phrase occurrence with adjusted-position span ≤ slop — slop 1
    * admits exactly one displacement, so "hash X join" matches and the
    * reversed "join hash" does not). KNN-ranked like [[phraseMatchKnn]].
    * The oracle derives token positions and checks
    * |pos(join) − pos(hash) − 1| ≤ 1 — the 2-distinct-term closed form
    * of the adjusted-position window. */
  def phraseMatchSlopKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.l2_distance
    val (pred, gates) = graft.api.MilvusFilter.parseWithMatches(
      "PHRASE_MATCH(text, 'hash join', 1)")
    require(pred.isEmpty && gates.size == 1)
    val matches = graft.index.TextIndex.matchingDocs(
      spark, postingsFor(spark, dir), gates.head._1, gates.head._2)
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    emb.join(matches, emb("vec_id") === matches("doc_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(10)
  }

  /** LLM-pipeline: token counting, whitespace vs regex tokenizer. */
  def tokenizeCompare(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(
        col("doc_id"),
        size(words(col("text"))).cast("long").as("n_ws_tokens"),
        size(expr("filter(split(text, '[^a-z0-9]+'), x -> x != '')"))
          .cast("long").as("n_re_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"))
      .orderBy(col("doc_id"))

  /** LLM-pipeline: BPE-ish PRE-tokenization counts — the GPT-2-style
    * regex pre-tokenizer (contraction suffixes, space-prefixed letter and
    * digit runs, punctuation runs, whitespace runs), lookahead-free so
    * RE2 (the oracle engine) and java.util.regex agree on every match.
    * This is the spacing-aware sibling of `token_counts`: " the" and
    * "the" are distinct tokens, exactly as a real BPE vocabulary keys
    * them. Same O(distinct tokens) shuffle shape as `token_counts`
    * (partial aggregation collapses each partition's vocabulary first). */
  def tokenCountsBpe(spark: SparkSession, dir: String): DataFrame = {
    val pat = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
    t(spark, dir, "documents")
      .select(explode(regexp_extract_all(col("text"), lit(pat), lit(0))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("tok"))
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "token_counts" -> tokenCounts _,
    "token_counts_bpe" -> tokenCountsBpe _,
    "tf_idf" -> tfIdf _,
    "ngram_stats" -> ngramStats _,
    "lang_stats" -> langStats _,
    "quality_score" -> qualityScore _,
    "language_id" -> languageId _,
    "doc_fingerprint" -> docFingerprint _,
    "tokenize_compare" -> tokenizeCompare _,
    "doc_entropy" -> docEntropy _,
    "doc_length_histogram" -> docLengthHistogram _,
    "repetition_ratio" -> repetitionRatio _,
    "train_val_split" -> trainValSplit _,
    "bm25_scores" -> bm25Scores _,
    "text_match_knn" -> textMatchKnn _,
    "text_match_std_knn" -> textMatchStdKnn _,
    "text_match_custom_knn" -> textMatchCustomKnn _,
    "text_match_cjk_knn" -> textMatchCjkKnn _,
    "fulltext_search_std" -> fulltextSearchStd _,
    "fulltext_multi_partition" -> fulltextMultiPartition _,
    "phrase_match_knn" -> phraseMatchKnn _,
    "phrase_match_slop_knn" -> phraseMatchSlopKnn _,
    "hybrid_rrf" -> hybridRrf _,
    "hybrid_weighted" -> hybridWeighted _,
    "pii_redact" -> piiRedact _
  )

  val oracleSql: Map[String, String] = Map(
    "token_counts" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
         GROUP BY word ORDER BY n DESC, word LIMIT 50""",
    "token_counts_bpe" ->
      """SELECT tok, count(*) AS n
         FROM (SELECT unnest(regexp_extract_all(text,
                 '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS tok
               FROM documents)
         GROUP BY tok ORDER BY n DESC, tok LIMIT 50""",
    "tf_idf" ->
      """WITH tokens AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens GROUP BY 1, 2),
           df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
           n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
         SELECT doc_id, word, tf, df,
            round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
         FROM tf JOIN df USING (word), n
         WHERE doc_id < 20 ORDER BY doc_id, word""",
    "ngram_stats" ->
      """SELECT doc_id, len(shingles) AS n_shingles,
            len(list_distinct(shingles)) AS n_distinct_shingles,
            shingles[1] AS first_shingle
         FROM (SELECT doc_id, list_transform(generate_series(1, len(ws) - 2),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS shingles
               FROM (SELECT doc_id, str_split(text, ' ') AS ws FROM documents WHERE doc_id < 100))
         ORDER BY doc_id""",
    "lang_stats" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
            min(n_chars) AS min_chars, max(n_chars) AS max_chars,
            count(DISTINCT source) AS n_sources
         FROM documents GROUP BY lang ORDER BY lang""",
    "quality_score" ->
      """SELECT doc_id, len(ws) AS n_words,
            round(n_chars::DOUBLE / len(ws), 6) AS mean_word_len,
            round(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in')))::DOUBLE
              / len(ws), 6) AS stopword_ratio,
            round(len(list_distinct(ws))::DOUBLE / len(ws), 6) AS unique_ratio
         FROM (SELECT doc_id, n_chars, str_split(text, ' ') AS ws FROM documents WHERE doc_id < 100)
         ORDER BY doc_id""",
    "language_id" ->
      """SELECT lang,
            CASE WHEN len(list_filter(ws, w -> w IN ('the','a')))::DOUBLE / len(ws) > 0.05
                 THEN 'en' ELSE 'unknown' END AS predicted,
            count(*) AS n
         FROM (SELECT lang, str_split(text, ' ') AS ws FROM documents)
         GROUP BY 1, 2 ORDER BY lang, predicted""",
    "doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
            md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS canon_fp,
            substring(md5(text), 1, 8) AS fp8
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "tokenize_compare" ->
      """SELECT doc_id,
            len(str_split(text, ' ')) AS n_ws_tokens,
            len(list_filter(str_split_regex(text, '[^a-z0-9]+'), x -> x <> '')) AS n_re_tokens,
            length(text) AS n_chars_actual
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "doc_entropy" ->
      """WITH chars AS (SELECT doc_id, substring(text, i + 1, 1) AS ch
               FROM (SELECT doc_id, text, unnest(range(length(text))) AS i
                     FROM documents WHERE doc_id < 100)),
           counts AS (SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY 1, 2),
           totals AS (SELECT doc_id, sum(cnt) AS n FROM counts GROUP BY 1)
         SELECT doc_id,
            round(-sum((cnt::DOUBLE / n) * log2(cnt::DOUBLE / n)), 4) AS entropy_bits,
            count(*) AS n_distinct_chars,
            CAST(max(n) AS BIGINT) AS n_chars_actual
         FROM counts JOIN totals USING (doc_id)
         GROUP BY doc_id ORDER BY doc_id""",
    "doc_length_histogram" ->
      """WITH hist AS (SELECT (n_chars // 50) * 50 AS bucket_lo, count(*) AS n_docs,
                         round(avg(n_chars), 4) AS avg_chars
                       FROM documents GROUP BY 1)
         SELECT bucket_lo, n_docs, avg_chars,
            round(n_docs * 100.0 / sum(n_docs) OVER (), 4) AS pct,
            CAST(sum(n_docs) OVER (ORDER BY bucket_lo) AS BIGINT) AS cum_docs
         FROM hist ORDER BY bucket_lo""",
    "repetition_ratio" ->
      """WITH sh AS (SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 2),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
             FROM (SELECT doc_id, str_split(text, ' ') AS ws
                   FROM documents WHERE doc_id < 200)),
           counts AS (SELECT doc_id, g, count(*) AS cnt FROM sh GROUP BY 1, 2)
         SELECT doc_id, max(cnt) AS top_gram_n,
            CAST(sum(cnt) AS BIGINT) AS n_grams,
            round(max(cnt)::DOUBLE / sum(cnt), 6) AS rep_ratio
         FROM counts GROUP BY doc_id ORDER BY doc_id""",
    "train_val_split" ->
      """SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6'
                     THEN 'train' ELSE 'val' END AS split,
            lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
            min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM documents GROUP BY 1, 2 ORDER BY split, lang""",
    "bm25_scores" ->
      """WITH tokens AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
           dl AS (SELECT doc_id, count(*) AS dlen FROM tokens GROUP BY 1),
           avgdl AS (SELECT avg(dlen) AS avgdl FROM dl),
           n AS (SELECT count(*) AS n_docs FROM documents),
           tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens
                  WHERE word IN ('join','hash','scan') GROUP BY 1, 2),
           df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens
                  WHERE word IN ('join','hash','scan') GROUP BY 1)
         SELECT tf.doc_id,
            round(sum( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) ), 6) AS bm25
         FROM tf JOIN df USING (word) JOIN dl USING (doc_id), avgdl, n
         GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 15""",
    "text_match_knn" ->
      """WITH tokens AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
           m AS (SELECT doc_id FROM tokens WHERE word IN ('join', 'scan')
                 GROUP BY doc_id HAVING count(DISTINCT word) = 2),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id AS doc_id,
            list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
         FROM embeddings e JOIN m ON e.vec_id = m.doc_id, q
         ORDER BY dist, doc_id LIMIT 10""",
    "fulltext_multi_partition" ->
      """WITH corpus AS (SELECT d.doc_id, d.text FROM documents d
                 JOIN embeddings e ON d.doc_id = e.vec_id),
           tokens AS (SELECT doc_id,
                 unnest(list_filter(str_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                   x -> x <> '' AND x <> 'the')) AS word
               FROM corpus),
           dl AS (SELECT doc_id, count(*) AS dlen FROM tokens GROUP BY 1),
           avgdl AS (SELECT avg(dlen) AS avgdl FROM dl),
           n AS (SELECT count(*) AS n_docs FROM corpus),
           tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens
                  WHERE word IN ('hash','join','scan') GROUP BY 1, 2),
           df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens
                  WHERE word IN ('hash','join','scan') GROUP BY 1),
           scored AS (SELECT tf.doc_id,
                round(sum( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) ), 6) AS bm25
              FROM tf JOIN df USING (word) JOIN dl USING (doc_id), avgdl, n
              GROUP BY 1),
           cut AS (SELECT * FROM scored
              ORDER BY bm25 DESC, CAST(doc_id AS VARCHAR) LIMIT 15)
         SELECT doc_id, bm25 FROM cut ORDER BY bm25 DESC, doc_id""",
    "fulltext_search_std" ->
      """WITH corpus AS (SELECT d.doc_id, d.text FROM documents d
                 JOIN embeddings e ON d.doc_id = e.vec_id),
           tokens AS (SELECT doc_id,
                 unnest(list_filter(str_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                   x -> x <> '' AND x <> 'the')) AS word
               FROM corpus),
           dl AS (SELECT doc_id, count(*) AS dlen FROM tokens GROUP BY 1),
           avgdl AS (SELECT avg(dlen) AS avgdl FROM dl),
           n AS (SELECT count(*) AS n_docs FROM corpus),
           tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens
                  WHERE word IN ('hash','join','scan') GROUP BY 1, 2),
           df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens
                  WHERE word IN ('hash','join','scan') GROUP BY 1),
           scored AS (SELECT tf.doc_id,
                round(sum( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) ), 6) AS bm25
              FROM tf JOIN df USING (word) JOIN dl USING (doc_id), avgdl, n
              GROUP BY 1),
           cut AS (SELECT * FROM scored
              ORDER BY bm25 DESC, CAST(doc_id AS VARCHAR) LIMIT 15)
         SELECT doc_id, bm25 FROM cut ORDER BY bm25 DESC, doc_id""",
    "text_match_std_knn" ->
      """WITH tokens AS (SELECT doc_id,
                 unnest(list_filter(str_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                   x -> x <> '')) AS word
               FROM documents),
           m AS (SELECT doc_id FROM tokens WHERE word IN ('join', 'scan')
                 GROUP BY doc_id HAVING count(DISTINCT word) = 2),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id AS doc_id,
            list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
         FROM embeddings e JOIN m ON e.vec_id = m.doc_id, q
         ORDER BY dist, doc_id LIMIT 10""",
    "text_match_custom_knn" ->
      """WITH tokens AS (SELECT doc_id,
                 unnest(list_filter(str_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                   x -> x <> '')) AS word
               FROM documents),
           m AS (SELECT DISTINCT doc_id FROM tokens WHERE word = 'join'),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id AS doc_id,
            list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
         FROM embeddings e JOIN m ON e.vec_id = m.doc_id, q
         ORDER BY dist, doc_id LIMIT 10""",
    "text_match_cjk_knn" ->
      """WITH words AS (SELECT doc_id,
                 unnest(list_filter(str_split_regex(
                   regexp_replace(lower(text), '[^a-z]', ' ', 'g'), ' +'),
                   x -> x <> '')) AS w
               FROM documents),
           bigs AS (SELECT DISTINCT doc_id,
                 CASE WHEN len(w) = 1 THEN w ELSE substr(w, i, 2) END AS bg
               FROM words, LATERAL unnest(generate_series(1, greatest(len(w) - 1, 1))) AS t(i)),
           m AS (SELECT doc_id FROM bigs WHERE bg IN ('jo', 'oi', 'in')
                 GROUP BY doc_id HAVING count(DISTINCT bg) = 3),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id AS doc_id,
            list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
         FROM embeddings e JOIN m ON e.vec_id = m.doc_id, q
         ORDER BY dist, doc_id LIMIT 10""",
    "phrase_match_knn" ->
      """WITH m AS (SELECT doc_id FROM documents
                 WHERE ' ' || text || ' ' LIKE '% hash join %'),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id AS doc_id,
            list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
         FROM embeddings e JOIN m ON e.vec_id = m.doc_id, q
         ORDER BY dist, doc_id LIMIT 10""",
    "phrase_match_slop_knn" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w,
                   generate_subscripts(str_split(text, ' '), 1) AS pos
                 FROM documents),
           m AS (SELECT DISTINCT a.doc_id
                 FROM toks a JOIN toks b USING (doc_id)
                 WHERE a.w = 'hash' AND b.w = 'join'
                   AND abs(b.pos - a.pos - 1) <= 1),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id AS doc_id,
            list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
         FROM embeddings e JOIN m ON e.vec_id = m.doc_id, q
         ORDER BY dist, doc_id LIMIT 10""",
    "hybrid_rrf" ->
      """WITH tokens AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
           dl AS (SELECT doc_id, count(*) AS dlen FROM tokens GROUP BY 1),
           avgdl AS (SELECT avg(dlen) AS avgdl FROM dl),
           n AS (SELECT count(*) AS n_docs FROM documents),
           tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens
                  WHERE word IN ('join','hash','scan') GROUP BY 1, 2),
           df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens
                  WHERE word IN ('join','hash','scan') GROUP BY 1),
           bm25 AS (SELECT tf.doc_id,
               round(sum( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                          * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) ), 6) AS bm25
             FROM tf JOIN df USING (word) JOIN dl USING (doc_id), avgdl, n
             GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 15),
           lex AS (SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM bm25),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
           knn AS (SELECT e.vec_id AS doc_id,
               list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
             FROM embeddings e, q ORDER BY dist, vec_id LIMIT 15),
           vec AS (SELECT doc_id,
               row_number() OVER (ORDER BY dist, doc_id) AS vec_rank FROM knn)
         SELECT doc_id, lex_rank, vec_rank,
            round(coalesce(1.0 / (60 + lex_rank), 0)
              + coalesce(1.0 / (60 + vec_rank), 0), 6) AS rrf
         FROM lex FULL OUTER JOIN vec USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 10""",
    "hybrid_weighted" ->
      """WITH tokens AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
           dl AS (SELECT doc_id, count(*) AS dlen FROM tokens GROUP BY 1),
           avgdl AS (SELECT avg(dlen) AS avgdl FROM dl),
           n AS (SELECT count(*) AS n_docs FROM documents),
           tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens
                  WHERE word IN ('join','hash','scan') GROUP BY 1, 2),
           df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens
                  WHERE word IN ('join','hash','scan') GROUP BY 1),
           bm25 AS (SELECT tf.doc_id,
               round(sum( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                          * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) ), 6) AS bm25
             FROM tf JOIN df USING (word) JOIN dl USING (doc_id), avgdl, n
             GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 15),
           lex AS (SELECT doc_id,
               CASE WHEN MAX(bm25) OVER () > MIN(bm25) OVER ()
                    THEN (bm25 - MIN(bm25) OVER ())
                         / (MAX(bm25) OVER () - MIN(bm25) OVER ())
                    ELSE 1.0 END AS lex_norm FROM bm25),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
           knn AS (SELECT e.vec_id AS doc_id,
               list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
             FROM embeddings e, q ORDER BY dist, vec_id LIMIT 15),
           vec AS (SELECT doc_id,
               CASE WHEN MAX(dist) OVER () > MIN(dist) OVER ()
                    THEN (MAX(dist) OVER () - dist)
                         / (MAX(dist) OVER () - MIN(dist) OVER ())
                    ELSE 1.0 END AS vec_norm FROM knn)
         SELECT doc_id, round(lex_norm, 6) AS lex_norm, round(vec_norm, 6) AS vec_norm,
            round(0.7 * coalesce(vec_norm, 0) + 0.3 * coalesce(lex_norm, 0), 6) AS wscore
         FROM lex FULL OUTER JOIN vec USING (doc_id)
         ORDER BY wscore DESC, doc_id LIMIT 10""",
    "pii_redact" ->
      """WITH raw AS (SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR ||
               '@example.com phone 555-' ||
               lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' ||
               lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
               ' host 10.0.' || (doc_id % 256)::VARCHAR || '.' ||
               ((doc_id * 7) % 256)::VARCHAR AS raw
           FROM documents WHERE doc_id < 200),
           red AS (SELECT doc_id, raw,
             regexp_replace(
               regexp_replace(
                 regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
               '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS redacted
           FROM raw)
         SELECT doc_id,
            len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
            len(regexp_extract_all(raw, '\d{3}-\d{3}-\d{4}')) AS n_phones,
            len(regexp_extract_all(raw, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS n_ips,
            md5(redacted) AS redacted_fp,
            length(redacted) AS n_chars_redacted
         FROM red ORDER BY doc_id"""
  )
}
