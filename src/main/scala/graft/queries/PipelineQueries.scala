package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables.t

/** Training-data pipeline operators beyond per-doc scoring (SURVEY §2 C19):
  * the corpus-level steps a pre-training data build runs between "raw docs"
  * and "token shards" — contamination checks, deterministic shuffling and
  * stratified sampling, sequence packing, vocabulary coverage, length
  * windsorization, dedup-rate observability.
  *
  * Everything is hash-deterministic (md5 over the doc id, the same trick
  * train_val_split uses) so results are stable under reshuffles, re-runs
  * and corpus growth, and oracle-checkable in DuckDB.
  *
  * Scale notes inline per query; the common theme: the only global windows
  * here are over vocabulary-sized or shard-local data, never over the raw
  * corpus in one partition.
  */
object PipelineQueries {

  private def words(c: Column): Column = split(c, " ")

  /** Test-set contamination: which training docs share any 8-gram with a
    * held-out doc (the decontamination check every eval suite needs —
    * GPT-3-style n-gram overlap). Test split = doc_id % 10 == 0 stands in
    * for "the benchmark set".
    *
    * Shape at scale: distinct 8-grams per doc (array_distinct BEFORE the
    * explode caps the join input at one row per distinct gram), then an
    * inverted-index equi-join on the gram — Σ df² work like the Jaccard
    * path, never |train|×|test|. The test side is small in practice; AQE
    * broadcasts it while it is, no hint needed. */
  def contaminationNgrams(spark: SparkSession, dir: String): DataFrame = {
    val grams = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.TextFunctions.ngrams(words(col("text")), 8))).as("g"))
    val test = grams.filter(col("doc_id") % 10 === 0)
      .withColumnRenamed("doc_id", "test_doc")
    val train = grams.filter(col("doc_id") % 10 =!= 0)
      .withColumnRenamed("doc_id", "train_doc")
    train.join(test, Seq("g"))
      .groupBy(col("train_doc"), col("test_doc"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .orderBy(col("train_doc"), col("test_doc"))
  }

  /** The corpus-scale variant of `contaminationNgrams` — same defense as
    * `DedupQueries.dedupJaccardPairsCapped`: the gram equi-join does
    * Σ df_train·df_test work per gram, and boilerplate grams (license
    * headers, navigation chrome) have huge df on BOTH sides. Grams with
    * corpus-wide df above `dfCap` are excluded from the CANDIDATE join
    * only; the emitted `shared_ngrams` is then recounted exactly from the
    * full per-doc gram sets (array_intersect over the two arrays), so the
    * cap changes candidate-generation cost, not the overlap math. A pair
    * ALL of whose shared grams are hot is missed — for 8-grams that means
    * two docs sharing only boilerplate, which is precisely what
    * decontamination pipelines deliberately ignore (the standard df-drop
    * trade). `dfCap` is REQUIRED: the lossless floor is a property of the
    * corpus's gram-df distribution (asserted on the fixture in
    * TrainingExportSpec). */
  def contaminationNgramsCapped(spark: SparkSession, dir: String, dfCap: Int): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(
          graft.functions.TextFunctions.ngrams(words(col("text")), 8)).as("gs"))
    val grams = docs.select(col("doc_id"), explode(col("gs")).as("g"))
    val rare = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("g"))
    val rareGrams = grams.join(rare, "g")
    val test = rareGrams.filter(col("doc_id") % 10 === 0)
      .withColumnRenamed("doc_id", "test_doc")
    val train = rareGrams.filter(col("doc_id") % 10 =!= 0)
      .withColumnRenamed("doc_id", "train_doc")
    val cands = train.join(test, Seq("g"))
      .select(col("train_doc"), col("test_doc")).distinct()
    cands
      .join(docs.select(col("doc_id").as("train_doc"), col("gs").as("ga")), "train_doc")
      .join(docs.select(col("doc_id").as("test_doc"), col("gs").as("gb")), "test_doc")
      .select(col("train_doc"), col("test_doc"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("shared_ngrams"))
      .orderBy(col("train_doc"), col("test_doc"))
  }

  /** Sequence packing: assign docs to fixed token-budget packs (2048) the
    * way a training loader concatenates-and-chunks. Docs are hash-sharded
    * (first md5 hex char, 16 shards), hash-ordered within the shard, and a
    * running token count maps each doc to pack floor(offset / budget).
    * Output is per-pack stats, so the oracle checks the whole assignment.
    *
    * Shape at scale: the ONLY window is partitioned by shard — each shard
    * packs independently (this is how a 1000-executor export run stays
    * parallel; a single global cumsum would serialize the corpus through
    * one partition). Packs never split a doc, so a pack can overflow the
    * budget by at most one doc's tokens — documented loader semantics. */
  def sequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("shard", substring(col("h"), 1, 1))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .groupBy(col("shard"), expr("(cum - n_tokens) div 2048").as("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Deterministic global shuffle — the pre-export corpus shuffle, as a
    * rank over md5(doc_id). The LIMIT runs FIRST (TakeOrderedAndProject:
    * per-partition top-k + driver merge, parallel at any corpus size) and
    * the row_number window only ranks the 20 surviving rows — a global
    * window over the raw corpus would serialize it through one partition.
    * Production exports don't need the global rank at all — they
    * sort-within-shard (see sequencePacking / TrainingExport); the
    * declared query checks the ORDER ITSELF is the engine-independent
    * hash order. */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame = {
    val top = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(20)
    top.select(
        row_number().over(Window.orderBy(col("h"), col("doc_id")))
          .cast("long").as("rn"),
        col("doc_id"), substring(col("h"), 1, 8).as("h8"), col("lang"))
      .orderBy(col("rn"))
  }

  /** Stratified sampling with per-stratum rates — downsample the dominant
    * language (en ≈ 20%) while keeping the tail (others ≈ 80%), the usual
    * data-mix rebalancing step. Hash-threshold per stratum keeps it
    * deterministic; output aggregates per lang so the oracle checks every
    * membership decision. Pure filter + agg: no shuffle beyond the final
    * vocabulary-sized groupBy. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(md5(col("doc_id").cast("string")) <
        when(col("lang") === "en", "33").otherwise("cc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy(col("lang"))

  /** Vocabulary coverage: cumulative share of corpus tokens covered by the
    * top-k vocabulary (the "how big must the tokenizer vocab be" curve).
    * The explode→groupBy(word) is the map-side-combinable word-count shape.
    *
    * Shape at scale: the LIMIT runs FIRST — `orderBy.limit(40)` is
    * TakeOrderedAndProject (per-partition top-k + driver merge, parallel
    * at any vocabulary size), and the rank/running-sum window only sees
    * the 40 survivors plus the broadcast 1-row total. A web-scale corpus
    * has hundreds of millions of distinct words; ranking them all through
    * a single-partition global window (the naive spelling) is the same
    * hazard corpusShuffle engineered around. The cumulative sum at rank k
    * depends only on the rows ranked <= k, so the rewrite emits
    * byte-identical rows. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "documents")
      .select(explode(words(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val top = counts.orderBy(desc("n"), col("word")).limit(40)
    val ord = Window.orderBy(desc("n"), col("word"))
    top.crossJoin(broadcast(total))
      .select(row_number().over(ord).cast("long").as("rnk"), col("word"), col("n"),
        round(sum(col("n")).over(ord) / col("total"), 6).as("cum_share"))
      .orderBy(col("rnk"))
  }

  /** Length windsorization: keep docs between the exact p05/p95 n_chars
    * quantiles (the truncate-the-tails pre-filter). Two-pass: a 1-row exact
    * percentile aggregate (broadcast), then filter + per-lang agg — the
    * same shape at any corpus size. At 100 TB the exact percentile becomes
    * approx_percentile with a documented ε; the declared query stays exact
    * so the oracle can hash it. */
  def lengthQuantileFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bounds = docs.agg(
      expr("percentile(n_chars, 0.05)").as("lo"),
      expr("percentile(n_chars, 0.95)").as("hi"))
    docs.crossJoin(broadcast(bounds))
      .filter(col("n_chars").between(col("lo"), col("hi")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        round(first(col("lo")), 4).as("p05"),
        round(first(col("hi")), 4).as("p95"))
      .orderBy(col("lang"))
  }

  /** Dedup-rate observability: per-source duplicate share by content hash
    * (the "which crawl is feeding us copies" dashboard number). 32-byte
    * md5 as the distinct key — the shuffle carries hashes, not documents. */
  def dupRateBySource(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        round(lit(1.0) - countDistinct(md5(col("text"))).cast("double") / count(lit(1)), 6)
          .as("dup_rate"))
      .orderBy(col("source"))

  /** Parameterized unigram-LM perplexity core over ANY (id, text) frame —
    * the callable C19 surface (caller picks which docs to score; the
    * unigram model always fits on the FULL frame), used by both the
    * declared `perplexity_proxy` query and `GraftClient.perplexityProxy`.
    * Same inverted-index shape as TF-IDF: tokens join the O(vocabulary)
    * frequency table (AQE broadcasts it while small), the 1-row total is
    * an explicit broadcast; `scoreFilter` is pushed below the join so the
    * scan of the scored side prunes at the source. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 scoreFilter: Column): DataFrame = {
    def tokens(d: DataFrame) =
      d.select(col(idCol), explode(words(col(textCol))).as("word"))
    val freq = tokens(docs).groupBy(col("word")).agg(count(lit(1)).as("n"))
    val tot = freq.agg(sum(col("n")).as("total"))
    // scoreFilter selects DOCS (it runs against the caller's frame, so it
    // may reference any of its columns — lang, length, metadata), and the
    // predicate pushes to the scored side's scan
    tokens(docs.filter(scoreFilter))
      .join(freq, Seq("word"))
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(-avg(log(col("n") / col("total"))), 6).as("mean_neg_logp"))
      .orderBy(col(idCol))
  }

  /** Unigram-LM perplexity proxy: mean −log p(word) per doc under the
    * corpus unigram distribution — the cheap LM-quality filter (junk and
    * boilerplate score high/low long before a real LM is in the loop);
    * the declared, oracle-pinned instantiation of [[perplexity]]. */
  def perplexityProxy(spark: SparkSession, dir: String): DataFrame =
    perplexity(t(spark, dir, "documents"), "doc_id", "text", col("doc_id") < 100)

  /** Data-mix reweighting: per-source sampling weights that move the
    * corpus toward a UNIFORM token share across sources (the "don't let
    * one crawl dominate the mix" step before export — the target-share /
    * actual-share ratio, capped at 1.0 since a data build downsamples
    * rather than duplicating). Shape at scale: one map-side-combinable
    * groupBy(source) plus a broadcast 1-row total — the shuffle carries
    * O(sources) rows at any corpus size. */
  def dataMixWeights(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "documents")
      .select(col("source"), size(words(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("tokens"), count(lit(1)).as("n_docs"))
    val tot = per.agg(sum(col("tokens")).cast("double").as("total"),
      count(lit(1)).cast("double").as("n_sources"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("tokens") / col("total"), 6).as("actual_share"),
        round(least(lit(1.0),
          (col("total") / col("n_sources")) / col("tokens")), 6).as("weight"),
        round(least(col("tokens").cast("double"), col("total") / col("n_sources")), 4)
          .as("tokens_after"))
      .orderBy(col("source"))
  }

  /** Context windowing: how many seq-len-32/stride-16 windows each doc
    * yields (the chunking step before tokenized training examples).
    * Pure per-row integer math + one histogram groupBy — embarrassingly
    * parallel at any scale. */
  def contextWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("n_tok"))
      .withColumn("n_windows",
        when(col("n_tok") <= 32, lit(1L))
          .otherwise(ceil((col("n_tok") - 32) / lit(16.0)) + 1))
      .groupBy(col("n_windows"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"))
      .orderBy(col("n_windows"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "contamination_ngrams" -> contaminationNgrams _,
    "sequence_packing" -> sequencePacking _,
    "corpus_shuffle" -> corpusShuffle _,
    "sample_stratified" -> sampleStratified _,
    "vocab_coverage" -> vocabCoverage _,
    "length_quantile_filter" -> lengthQuantileFilter _,
    "dup_rate_by_source" -> dupRateBySource _,
    "perplexity_proxy" -> perplexityProxy _,
    "context_windows" -> contextWindows _,
    "data_mix_weights" -> dataMixWeights _
  )

  val oracleSql: Map[String, String] = Map(
    "contamination_ngrams" ->
      """WITH ws AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
           grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(w) - 7),
               i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]))) AS g
             FROM ws),
           test AS (SELECT doc_id AS test_doc, g FROM grams WHERE doc_id % 10 = 0),
           train AS (SELECT doc_id AS train_doc, g FROM grams WHERE doc_id % 10 <> 0)
         SELECT train_doc, test_doc, count(*) AS shared_ngrams
         FROM train JOIN test USING (g)
         GROUP BY 1, 2 ORDER BY train_doc, test_doc""",
    "sequence_packing" ->
      """WITH d AS (SELECT doc_id, len(str_split(text, ' ')) AS n_tokens,
                      md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
           s AS (SELECT doc_id, n_tokens, substring(h, 1, 1) AS shard,
                   sum(n_tokens) OVER (PARTITION BY substring(h, 1, 1)
                     ORDER BY h, doc_id) AS cum
                 FROM d)
         SELECT shard, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
            count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM s GROUP BY 1, 2 ORDER BY shard, pack_id""",
    "corpus_shuffle" ->
      """SELECT row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
            doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8, lang
         FROM documents ORDER BY rn LIMIT 20""",
    "sample_stratified" ->
      """SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_doc,
            max(doc_id) AS max_doc, round(avg(n_chars), 4) AS avg_chars
         FROM documents
         WHERE md5(CAST(doc_id AS VARCHAR)) < (CASE WHEN lang = 'en' THEN '33' ELSE 'cc' END)
         GROUP BY lang ORDER BY lang""",
    "vocab_coverage" ->
      """WITH tok AS (SELECT unnest(str_split(text, ' ')) AS word FROM documents),
           counts AS (SELECT word, count(*) AS n FROM tok GROUP BY 1),
           tot AS (SELECT sum(n) AS total FROM counts)
         SELECT row_number() OVER (ORDER BY n DESC, word) AS rnk, word, n,
            round(sum(n) OVER (ORDER BY n DESC, word) / total, 6) AS cum_share
         FROM counts, tot ORDER BY rnk LIMIT 40""",
    "length_quantile_filter" ->
      """WITH b AS (SELECT quantile_cont(n_chars, 0.05) AS lo,
                      quantile_cont(n_chars, 0.95) AS hi FROM documents)
         SELECT lang, count(*) AS n_kept, round(avg(n_chars), 4) AS avg_chars,
            round(any_value(lo), 4) AS p05, round(any_value(hi), 4) AS p95
         FROM documents, b WHERE n_chars BETWEEN lo AND hi
         GROUP BY lang ORDER BY lang""",
    "dup_rate_by_source" ->
      """SELECT source, count(*) AS n_docs,
            count(DISTINCT md5(text)) AS n_distinct,
            round(1.0 - count(DISTINCT md5(text))::DOUBLE / count(*), 6) AS dup_rate
         FROM documents GROUP BY source ORDER BY source""",
    "perplexity_proxy" ->
      """WITH tokens AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
           freq AS (SELECT word, count(*) AS n FROM tokens GROUP BY 1),
           tot AS (SELECT sum(n) AS total FROM freq),
           doc AS (SELECT doc_id, word FROM tokens WHERE doc_id < 100)
         SELECT doc_id, count(*) AS n_tokens,
            round(-avg(ln(n / total)), 6) AS mean_neg_logp
         FROM doc JOIN freq USING (word), tot
         GROUP BY doc_id ORDER BY doc_id""",
    "context_windows" ->
      """WITH d AS (SELECT doc_id, len(str_split(text, ' ')) AS n_tok FROM documents)
         SELECT CASE WHEN n_tok <= 32 THEN 1
                     ELSE CAST(ceil((n_tok - 32) / 16.0) AS BIGINT) + 1 END AS n_windows,
            count(*) AS n_docs, min(n_tok) AS min_tok, max(n_tok) AS max_tok
         FROM d GROUP BY 1 ORDER BY n_windows""",
    "data_mix_weights" ->
      """WITH per AS (SELECT source, sum(len(str_split(text, ' ')))::BIGINT AS tokens,
                        count(*) AS n_docs
                      FROM documents GROUP BY source),
           tot AS (SELECT sum(tokens)::DOUBLE AS total,
                     count(*)::DOUBLE AS n_sources FROM per)
         SELECT source, n_docs, tokens,
            round(tokens / total, 6) AS actual_share,
            round(least(1.0, (total / n_sources) / tokens), 6) AS weight,
            round(least(tokens::DOUBLE, total / n_sources), 4) AS tokens_after
         FROM per, tot ORDER BY source"""
  )
}
