package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-dedup ladder at volume — the measured counterpart of the declared
  * dedup queries' (bounded-window) correctness checks: runs the CLIENT
  * surface `dedupCandidates → dedupClusters → dedupKeepBest` plus the
  * df-capped Jaccard candidate join over ≥1M synthetic documents and
  * reports wall time, candidate volume, and shuffle bytes per phase
  * (recorded in BASELINE.md). The corpus plants duplicate clusters at a
  * realistic ~23% dup-row rate (groups of 2–4 near-identical docs with
  * disjoint per-group vocabularies) and gives EVERY doc three ultra-common
  * stopword tokens, so the Jaccard leg's df-cap is load-bearing: uncapped,
  * the stopwords alone would contribute 3·N² join pairs.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *     sbt -batch "runMain graft.DedupScaleBench 1000000"
  */
object DedupScaleBench {

  /** Stage-level shuffle accounting: bytes written by all stages between
    * `mark()` calls — the fabric cost a 1000-executor run would move over
    * the network, which wall-clock alone hides on local[n]. */
  private class ShuffleMeter(spark: SparkSession)
      extends org.apache.spark.scheduler.SparkListener {
    private val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(this)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    def mark(): Long = {
      // drain queued events so late stage-completions land in the right
      // phase (listener delivery is async)
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

    // Deterministic corpus, generated distributed with compiled
    // per-partition code (same pattern as VectorScaleBench.genVectors).
    // Layout per 13-doc block: one group of 3 near-dups, one pair, 8
    // uniques — dup rows ≈ 5/13 of which 3/13 are redundant. Group docs
    // share 8 group tokens (disjoint vocab per group → banding cannot
    // merge groups); each doc adds one unique token so "near-identical"
    // is near, not exact; every doc gets 3 corpus-wide stopwords.
    def genDocs(rows: Long): DataFrame =
      spark.range(rows).mapPartitions { it =>
        it.map { id =>
          val block = id / 13
          val off = (id % 13).toInt
          val sb = new StringBuilder(160)
          sb.append("the of and") // ultra-common: df = N, the df-cap's target
          val group =
            if (off < 3) s"g${block}a"       // 3-dup group
            else if (off < 5) s"g${block}b"  // 2-dup pair
            else s"u$id"                     // unique: its own vocabulary
          var j = 0
          while (j < 8) { sb.append(' ').append(group).append('w').append(j); j += 1 }
          // group docs are exact dups after the stopword cap (jac 1.0 —
          // the post-normalization duplicate production dedup mostly
          // sees; the r=4 banding scheme targets jac >= 0.9, so planting
          // jac-0.8 pairs would measure the scheme's designed miss rate,
          // not the engine); unique docs get a per-doc token on top of
          // their own vocabulary
          if (off >= 5) sb.append(" x").append(id)
          (s"k$id", sb.toString)
        }
      }.toDF("key", "text")

    val meter = new ShuffleMeter(spark)
    val clientRoot = java.nio.file.Files.createTempDirectory("graft-dsb").toString
    val client = new graft.api.GraftClient(spark, clientRoot)
    val docs = genDocs(n).persist()
    val nDocs = docs.count() // materialize generation outside the timings
    meter.mark()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // The whole MinHash ladder runs WITH the df-cap engaged (production
    // configuration): cap 64 drops only the df=N stopwords here (content
    // tokens have df ≤ 4). Uncapped, the stopword mega-buckets already
    // produced a 295-doc "cluster" at 50k docs — quadratic at corpus
    // scale, which is exactly what the knob exists to prevent.
    val cap = Some(64)

    // Phase 1: MinHash banding candidates (the O(N) scale path).
    val (nCand, tCand) = timed {
      client.dedupCandidates(docs, dfCap = cap).count()
    }
    val shCand = meter.mark()

    // Phase 2: connected components over the candidate graph (includes
    // regenerating candidates — the client call is self-contained).
    val (clusterStats, tClus) = timed {
      client.dedupClusters(docs, dfCap = cap)
        .agg(count(lit(1)), sum(col("n_docs")), max(col("n_docs")))
        .head()
    }
    val shClus = meter.mark()

    // Phase 3: keep-best representative per multi-doc cluster.
    val (nKept, tKeep) = timed {
      client.dedupKeepBest(docs,
          keepOrder = Seq(length(col("text")).desc, col("key")), dfCap = cap)
        .count()
    }
    val shKeep = meter.mark()

    // Phase 4: df-capped inverted-index Jaccard candidates. Cap 64 drops
    // the df=N stopwords (and nothing else: content tokens have df ≤ 4),
    // turning an N²-pair join into a Σ df(token)² ≤ 16·N one.
    val (nJac, tJac) = timed {
      val tokenized = docs.select(col("key"),
        array_distinct(split(col("text"), " ")).as("ws"))
      val inv = tokenized.select(col("key"), explode(col("ws")).as("w"))
      val keep = inv.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 64).select(col("w"))
      val capped = inv.join(keep, Seq("w"))
      capped.as("a").join(capped.as("b"),
          col("a.w") === col("b.w") && col("a.key") < col("b.key"))
        .select(col("a.key"), col("b.key")).distinct().count()
    }
    val shJac = meter.mark()

    val expectedClusters = (nDocs / 13) * 2 // one triple + one pair per block
    println(s"""{"bench":"dedup_scale","n_docs":$nDocs,""" +
      s""""candidates":$nCand,"candidates_sec":${f"$tCand%.1f"},"candidates_shuffle_mb":${shCand >> 20},""" +
      s""""clusters":${clusterStats.getLong(0)},"cluster_rows":${clusterStats.getLong(1)},""" +
      s""""max_cluster":${clusterStats.getLong(2)},"clusters_sec":${f"$tClus%.1f"},"clusters_shuffle_mb":${shClus >> 20},""" +
      s""""kept":$nKept,"keep_best_sec":${f"$tKeep%.1f"},"keep_best_shuffle_mb":${shKeep >> 20},""" +
      s""""jaccard_df_capped_pairs":$nJac,"jaccard_sec":${f"$tJac%.1f"},"jaccard_shuffle_mb":${shJac >> 20},""" +
      s""""expected_clusters":$expectedClusters}""")
    docs.unpersist()
    graft.streaming.BucketedKeyedCollection.deleteTree(
      java.nio.file.Paths.get(clientRoot))
    spark.stop()
  }
}
