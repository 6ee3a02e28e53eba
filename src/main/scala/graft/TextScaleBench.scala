package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical retrieval at volume — the measured counterpart of the
  * postings-index plan guards: BM25 over ≥1M synthetic documents, raw
  * tokenize-per-query vs the at-rest postings ride, each UNFILTERED and
  * FILTERED (restrictTo = a 50% key slice, the metadata-filter shape
  * hybridSearch feeds it). Reports wall time and shuffle bytes per
  * variant plus a cross-path parity check (identical rows — the
  * hash-stability contract), recorded in BASELINE.md.
  *
  * Query terms are planted at realistic document frequencies (df =
  * N/200, N/100, N/50), so the postings prune reads Σ df ≈ 3.5% of the
  * corpus rows instead of re-tokenizing all of it — the gap that should
  * widen with corpus size.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *     sbt -batch "runMain graft.TextScaleBench 1000000"
  */
object TextScaleBench {

  private class ShuffleMeter(spark: SparkSession)
      extends org.apache.spark.scheduler.SparkListener {
    private val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(this)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    def mark(): Long = {
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      bytes.getAndSet(0L)
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Deterministic corpus, generated distributed (the VectorScaleBench
    // pattern). Per doc: 3 corpus-wide stopwords (df = N), 8 tokens from
    // a 1000-term mid-frequency pool (df ≈ N/125 each), one unique token,
    // and the query terms planted at fixed rates — "scan" df = N/200,
    // "needle" df = N/100, "hash" df = N/50 — so Σ df(query) ≈ 0.035·N.
    def genDocs(rows: Long): DataFrame =
      spark.range(rows).mapPartitions { it =>
        it.map { id =>
          val sb = new StringBuilder(200)
          sb.append("the of and")
          var j = 0
          while (j < 8) { sb.append(" m").append((id * 7 + j * 131) % 1000); j += 1 }
          sb.append(" u").append(id)
          if (id % 200 == 0) sb.append(" scan")
          if (id % 100 == 0) sb.append(" needle")
          if (id % 50 == 0) sb.append(" hash")
          (s"k$id", sb.toString)
        }
      }.toDF("key", "text")

    val meter = new ShuffleMeter(spark)
    val docs = genDocs(n).persist()
    val nDocs = docs.count() // materialize outside the timings
    meter.mark()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val terms = Seq("needle", "hash", "scan")
    // the metadata-filter stand-in: half the keys pass (the shape
    // hybridSearch hands restrictTo — a key slice of the collection)
    def passing = spark.range(n).filter(col("id") % 2 === 0)
      .select(concat(lit("k"), col("id")).as("key"))

    val idxPath =
      java.nio.file.Files.createTempDirectory("graft-tsb").toString + "/ti"
    val (_, tBuild) = timed {
      graft.index.TextIndex.build(docs, "key", "text", idxPath)
    }
    val shBuild = meter.mark()

    def collectRows(df: DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

    val k = 100
    val (rawU, tRawU) = timed { collectRows(
      graft.queries.TextQueries.bm25(docs, "key", "text", terms, k)) }
    val shRawU = meter.mark()
    val (idxU, tIdxU) = timed { collectRows(
      graft.index.TextIndex.bm25(spark, idxPath, terms, k)) }
    val shIdxU = meter.mark()
    val (rawF, tRawF) = timed { collectRows(
      graft.queries.TextQueries.bm25(docs, "key", "text", terms, k,
        restrictTo = Some(passing))) }
    val shRawF = meter.mark()
    val (idxF, tIdxF) = timed { collectRows(
      graft.index.TextIndex.bm25(spark, idxPath, terms, k,
        restrictTo = Some(passing))) }
    val shIdxF = meter.mark()

    // hash-stability contract: riding the index never changes a result,
    // filtered or not (shared scoreExpr, corpus stats on both paths)
    val parity = rawU == idxU && rawF == idxF
    val filterHolds = idxF.forall { case (key, _) => key.drop(1).toLong % 2 == 0 }

    // TEXT_MATCH (r9): the matching-doc-id set for the same terms —
    // bm25's pruned read minus scoring — against a raw tokenize twin
    val (mAny, tMatchAny) = timed {
      graft.index.TextIndex.matchingDocs(spark, idxPath, terms, "any").count() }
    val shMatchAny = meter.mark()
    val (mAll, tMatchAll) = timed {
      graft.index.TextIndex.matchingDocs(spark, idxPath, terms, "all").count() }
    meter.mark()
    val (mAnyRaw, tMatchRaw) = timed {
      docs.select(col("key"), explode(split(col("text"), " ")).as("__w"))
        .filter(col("__w").isin(terms: _*)).select("key").distinct().count() }
    meter.mark()
    val matchParity = mAny == mAnyRaw && mAll <= mAny

    // PHRASE_MATCH (r10): the corpus plants the adjacency "needle hash"
    // on exactly the id % 100 docs (both suffixes append in that order),
    // so the phrase df is N/100 BY CONSTRUCTION — the parity check pins
    // the positional intersection against both the planted count and a
    // raw substring-adjacency twin (whitespace-delimited substring ≡
    // token adjacency under the single-space tokenizer)
    val (mPhrase, tPhrase) = timed {
      graft.index.TextIndex.matchingDocs(
        spark, idxPath, Seq("needle", "hash"), "phrase").count() }
    val shPhrase = meter.mark()
    val (mPhraseRaw, tPhraseRaw) = timed {
      docs.filter(concat(lit(" "), col("text"), lit(" "))
        .contains(" needle hash ")).count() }
    meter.mark()
    // and the reversed phrase must match NOTHING (order, not co-occurrence)
    val mPhraseRev = graft.index.TextIndex.matchingDocs(
      spark, idxPath, Seq("hash", "needle"), "phrase").count()
    meter.mark()
    val phraseParity = mPhrase == mPhraseRaw && mPhrase == nDocs / 100 &&
      mPhraseRev == 0L

    // PHRASE_MATCH slop (r11): "scan needle hash" is planted in that
    // order on exactly the id % 200 docs, so ("scan","hash") is one
    // position move away (matches at slop 1, not 0) and the REVERSED
    // ("hash","scan") is three (adjusted positions land 3 apart —
    // matches at slop 3, not 2): the whole slop ladder is exact by
    // construction, no raw twin needed
    val (mSlop1, tSlop1) = timed {
      graft.index.TextIndex.matchingDocs(
        spark, idxPath, Seq("scan", "hash"), "phrase:1").count() }
    meter.mark()
    val mSlop0 = graft.index.TextIndex.matchingDocs(
      spark, idxPath, Seq("scan", "hash"), "phrase").count()
    val mRev2 = graft.index.TextIndex.matchingDocs(
      spark, idxPath, Seq("hash", "scan"), "phrase:2").count()
    val mRev3 = graft.index.TextIndex.matchingDocs(
      spark, idxPath, Seq("hash", "scan"), "phrase:3").count()
    meter.mark()
    val slopParity = mSlop1 == nDocs / 200 && mSlop0 == 0L &&
      mRev2 == 0L && mRev3 == nDocs / 200

    // Incremental maintenance at 1% churn: 5k new docs + 3k rewrites +
    // 2k deletes appended as ONE delta segment — the per-commit cost a
    // streaming corpus pays, vs the full rebuild measured above. Then
    // the query tax of the extra segment, and compaction (index-sized
    // parquet merge, no re-tokenize) to fold it back.
    val delta = spark.range(n, n + 5000)
      .union(spark.range(0, 3000 * 333, 333)) // rewrites: spread over the corpus
      .selectExpr("concat('k', id) AS key",
        "concat('rewritten needle doc ', id) AS text")
    val dels = spark.range(1, 2000 * 499, 499)
      .filter(col("id") % 333 =!= 0) // disjoint from the rewrites
      .limit(2000).selectExpr("concat('k', id) AS key")
    val (_, tAppend) = timed {
      graft.index.TextIndex.append(delta, "key", "text", idxPath,
        Some(dels))
    }
    val shAppend = meter.mark()
    val (idxSeg, tIdxSeg) = timed { collectRows(
      graft.index.TextIndex.bm25(spark, idxPath, terms, k)) }
    meter.mark()
    val (_, tCompact) = timed { graft.index.TextIndex.compact(spark, idxPath) }
    val shCompact = meter.mark()
    val (idxC, tIdxC) = timed { collectRows(
      graft.index.TextIndex.bm25(spark, idxPath, terms, k)) }
    meter.mark()
    val compactStable = idxC == idxSeg

    // English analyzer at volume (r12): the SAME corpus through
    // standard tokenize + lowercase + English stops + Porter stemming —
    // measures the stemming UDF's build tax (the one non-codegen hop,
    // paid only at build/append) and proves inflected queries match the
    // planted terms through the stem. English stop words ("the of and"
    // lead every doc) are never indexed, so the postings also SHRINK.
    val engPath =
      java.nio.file.Files.createTempDirectory("graft-tsb-eng").toString + "/ti"
    val (_, tBuildEng) = timed {
      graft.index.TextIndex.build(docs, "key", "text", engPath,
        analyzer = graft.index.Analyzer.English)
    }
    val shBuildEng = meter.mark()
    val (mEngAny, tEngAny) = timed {
      graft.index.TextIndex.matchingDocs(spark, engPath,
        Seq("needles", "hashing", "scanning"), "any").count() }
    meter.mark()
    val mEngStop = graft.index.TextIndex.matchingDocs(
      spark, engPath, Seq("the", "of", "and"), "any").count()
    meter.mark()
    val engParity = mEngAny == mAnyRaw && mEngStop == 0L

    println(s"""{"bench":"text_scale","n_docs":$nDocs,"k":$k,""" +
      s""""build_sec":${f"$tBuild%.1f"},"build_shuffle_mb":${shBuild >> 20},""" +
      s""""raw_sec":${f"$tRawU%.2f"},"raw_shuffle_mb":${shRawU >> 20},""" +
      s""""postings_sec":${f"$tIdxU%.2f"},"postings_shuffle_mb":${shIdxU >> 20},""" +
      s""""raw_filtered_sec":${f"$tRawF%.2f"},"raw_filtered_shuffle_mb":${shRawF >> 20},""" +
      s""""postings_filtered_sec":${f"$tIdxF%.2f"},"postings_filtered_shuffle_mb":${shIdxF >> 20},""" +
      s""""append_1pct_sec":${f"$tAppend%.1f"},"append_shuffle_mb":${shAppend >> 20},""" +
      s""""postings_2seg_sec":${f"$tIdxSeg%.2f"},""" +
      s""""compact_sec":${f"$tCompact%.1f"},"compact_shuffle_mb":${shCompact >> 20},""" +
      s""""postings_compacted_sec":${f"$tIdxC%.2f"},"compact_stable":$compactStable,""" +
      s""""match_any_sec":${f"$tMatchAny%.2f"},"match_any_docs":$mAny,""" +
      s""""match_any_shuffle_mb":${shMatchAny >> 20},""" +
      s""""match_all_sec":${f"$tMatchAll%.2f"},"match_all_docs":$mAll,""" +
      s""""match_raw_sec":${f"$tMatchRaw%.2f"},""" +
      s""""phrase_sec":${f"$tPhrase%.2f"},"phrase_docs":$mPhrase,""" +
      s""""phrase_shuffle_mb":${shPhrase >> 20},""" +
      s""""phrase_raw_sec":${f"$tPhraseRaw%.2f"},""" +
      s""""phrase_slop1_sec":${f"$tSlop1%.2f"},"phrase_slop1_docs":$mSlop1,""" +
      s""""parity":$parity,"filter_holds":$filterHolds,""" +
      s""""match_parity":$matchParity,"phrase_parity":$phraseParity,""" +
      s""""slop_parity":$slopParity,""" +
      s""""build_english_sec":${f"$tBuildEng%.1f"},""" +
      s""""build_english_shuffle_mb":${shBuildEng >> 20},""" +
      s""""english_match_sec":${f"$tEngAny%.2f"},""" +
      s""""english_match_docs":$mEngAny,"english_parity":$engParity}""")
    require(parity, "raw and postings paths diverged — hash-stability contract broken")
    require(filterHolds, "restrictTo leaked a filtered-out doc")
    require(matchParity, "TEXT_MATCH set diverged from the raw tokenize twin")
    require(phraseParity, "PHRASE_MATCH diverged from the planted adjacency")
    require(slopParity, "PHRASE_MATCH slop ladder diverged from the planted geometry")
    require(compactStable, "compaction changed query results")
    require(engParity, "english-analyzer match diverged from the planted terms")
    docs.unpersist()
    graft.streaming.BucketedKeyedCollection.deleteTree(
      java.nio.file.Paths.get(idxPath).getParent)
    graft.streaming.BucketedKeyedCollection.deleteTree(
      java.nio.file.Paths.get(engPath).getParent)
    spark.stop()
  }
}
