package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SparseSearch

/** Sparse-vector search at volume — the measured counterpart of
  * SparseSearchSpec's brute-force correctness checks: 1M synthetic sparse
  * vectors (Zipf-skewed dimension popularity, the shape real lexical/SPLADE
  * embeddings have), one [[SparseSearch.topK]] and one 64-query
  * [[SparseSearch.topKBatch]], with shuffle-byte accounting per phase.
  *
  * What the numbers must show (recorded in BASELINE.md):
  *   - the single-query shuffle is ~matched-postings-sized, NOT
  *     corpus-sized: only rows sharing a dimension with the query survive
  *     the broadcast join into the per-id aggregation;
  *   - the batch's per-query marginal cost is far below 64× the single
  *     query (one postings pass serves all queries; the bounded heap
  *     keeps ≤k rows per (partition, qid) ahead of the final shuffle).
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.SparseScaleBench 1000000"
  */
object SparseScaleBench {

  private class ShuffleMeter(spark: SparkSession)
      extends org.apache.spark.scheduler.SparkListener {
    private val bytes = new java.util.concurrent.atomic.AtomicLong()
    private val readBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(this)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      readBytes.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
    }
    def mark(): Long = {
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      readBytes.set(0L)
      bytes.getAndSet(0L)
    }
    def markRead(): Long = {
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      bytes.set(0L)
      readBytes.getAndSet(0L)
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val vocab = 100000L // dimension universe
    val nnz = 30 // nonzeros per vector
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter(spark)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // Zipf-skewed dims, fully deterministic: u = hash(id, slot) mapped to
    // [0,1), dim = floor(V·u³) — cubing piles mass onto the low dims
    // (popular terms), the regime where an all-pairs or unguarded design
    // melts. Weights 1..5. ROUND-TRIPPED through parquet: synthesized
    // straight off spark.range, the lineage carries id-clustering and
    // Catalyst elides every exchange (measured: 0 shuffle bytes end to
    // end) — real at-rest postings carry no such gift, so the bench must
    // not either.
    val dir = java.nio.file.Files.createTempDirectory("sparse-bench").toString
    val (_, buildSec) = timed {
      spark.range(n).toDF("id")
        .select(col("id"), explode(sequence(lit(0), lit(nnz - 1))).as("slot"))
        .select(col("id"),
          (abs(xxhash64(col("id"), col("slot"))) % 1000000L).as("u"),
          (abs(xxhash64(col("slot"), col("id"))) % 5L + 1L).cast("double").as("w"))
        .select(col("id"),
          floor(lit(vocab) * pow(col("u").cast("double") / 1e6, 3.0))
            .cast("long").as("dim"), col("w"))
        // a vector can draw the same dim twice — collapse like a map would
        .groupBy(col("id"), col("dim")).agg(sum(col("w")).as("w"))
        .write.mode("overwrite").parquet(s"$dir/postings")
    }
    val postings = spark.read.parquet(s"$dir/postings")
    val nPost = postings.count()
    meter.mark()

    // query: 12 popular + 8 mid/rare dims, weights 1.0
    val qDims = (0L until 12L) ++ Seq(5000L, 12000L, 25000L, 40000L,
      60000L, 75000L, 90000L, 99990L)
    val query = qDims.map(d => d -> 1.0)

    // matched-postings volume (what the shuffle should be proportional to)
    val matched = postings.filter(col("dim").isin(qDims: _*)).count()
    meter.mark()

    // house protocol: one warm-up run (codegen/JIT/footers), then two
    // timed runs keeping the min; shuffle bytes from the last timed run
    def measure[T](f: => T): (T, Double, Long) = {
      f // warm-up
      val (_, t1) = timed(f)
      meter.mark()
      val (r, t2) = timed(f)
      (r, math.min(t1, t2), meter.mark())
    }

    val (top1, singleSec, singleShuffle) = measure(
      SparseSearch.topK(postings, query, k = 10).collect())

    // 64 queries: same popular/rare mix, rotated
    import spark.implicits._
    val qp = (0 until 64).flatMap { qi =>
      qDims.map(d => (qi.toLong, (d + qi * 7) % vocab, 1.0))
    }.toDF("qid", "dim", "w")
    val (batch, batchSec, batchShuffle) = measure(
      SparseSearch.topKBatch(postings, qp, k = 10).collect())

    val (topCos, cosSec, _) = measure(
      SparseSearch.topK(postings, query, k = 10, metric = "cosine").collect())

    // at-rest layout: same query through the bucket-partitioned index —
    // the win to show is BYTES READ (partition prune + dim pushdown), the
    // number that becomes the I/O bound at 100 TB. Full-scan bytes = the
    // postings directory size on disk (the unpruned scan reads all of
    // it); pruned bytes from the scan stage's inputMetrics.
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    val (_, idxBuildSec) = timed(
      graft.index.SparseIndex.build(postings, s"$dir/idx", buckets = 64))
    val corpusBytes = dirBytes(s"$dir/postings")
    val (topIdx, idxSec, _) = measure(
      graft.index.SparseIndex.topK(spark, s"$dir/idx", query, k = 10).collect())
    meter.markRead()
    graft.index.SparseIndex.topK(spark, s"$dir/idx", query, k = 10).collect()
    val idxReadBytes = meter.markRead()
    require(topIdx.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      top1.map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "index-backed topK must equal the raw-postings topK exactly")

    // the realistic sparse-query regime: FEW dims, none of them hot —
    // the prune keeps ≤5 of 64 buckets and the dim pushdown skips row
    // groups within them
    val narrow = Seq(25117L, 50234L, 75351L, 91468L, 99585L).map(_ -> 1.0)
    val (topNarrowRaw, narrowRawSec, _) = measure(
      SparseSearch.topK(postings, narrow, k = 10).collect())
    val (topNarrowIdx, narrowIdxSec, _) = measure(
      graft.index.SparseIndex.topK(spark, s"$dir/idx", narrow, k = 10).collect())
    meter.markRead()
    graft.index.SparseIndex.topK(spark, s"$dir/idx", narrow, k = 10).collect()
    val narrowIdxReadBytes = meter.markRead()
    require(topNarrowIdx.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      topNarrowRaw.map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "index-backed narrow topK must equal the raw-postings topK exactly")

    require(top1.length == 10 && topCos.length == 10 && batch.length == 64 * 10,
      s"unexpected result sizes: ${top1.length}/${topCos.length}/${batch.length}")

    // Incremental maintenance at ~1% churn (r11): 5k new docs + 3k
    // rewrites + 2k deletes appended as ONE delta segment — the
    // per-refresh cost a live hybrid dense+sparse collection pays, vs
    // the full rebuild (index_build_sec) it paid before segments. Then
    // the query tax of the extra segment, parity against a raw twin over
    // the merged corpus, and compaction to fold it back.
    val newIds = spark.range(n, n + 5000).toDF("id")
    val rewriteIds = spark.range(0, 3000L * 211, 211).toDF("id")
    val deleteIds = spark.range(1, 2000L * 499, 499)
      .filter(col("id") % 211 =!= 0).limit(2000).toDF("id")
    // rewritten/new docs: 2 dims each, deterministic
    val deltaDocs = newIds.union(rewriteIds)
      .select(col("id"), explode(array(
        (col("id") % vocab).as("a"),
        (col("id") * 31 % vocab).as("b"))).as("dim"),
        lit(2.0).as("w"))
      .groupBy(col("id"), col("dim")).agg(sum(col("w")).as("w"))
    val (_, appendSec) = timed {
      graft.index.SparseIndex.append(deltaDocs, s"$dir/idx",
        deletedIds = Some(deleteIds))
    }
    meter.mark()
    val touched = rewriteIds.union(deleteIds)
    val mergedRaw = postings.join(touched, Seq("id"), "left_anti")
      .unionByName(deltaDocs)
    val (topSeg, segSec, _) = measure(
      graft.index.SparseIndex.topK(spark, s"$dir/idx", query, k = 10).collect())
    val topSegRaw = SparseSearch.topK(mergedRaw, query, k = 10).collect()
    require(topSeg.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      topSegRaw.map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "2-segment index topK must equal the raw merged-corpus topK exactly")
    val (_, compactSec) = timed(
      graft.index.SparseIndex.compact(spark, s"$dir/idx"))
    meter.mark()
    val (topC, compactedSec, _) = measure(
      graft.index.SparseIndex.topK(spark, s"$dir/idx", query, k = 10).collect())
    require(topC.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      topSeg.map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "compaction changed query results")

    println(s"""{"bench":"sparse_scale","n":$n,"postings":$nPost,""" +
      s""""matched_postings":$matched,"build_sec":$buildSec,""" +
      s""""single_sec":$singleSec,"single_shuffle_bytes":$singleShuffle,""" +
      s""""batch64_sec":$batchSec,"batch_shuffle_bytes":$batchShuffle,""" +
      s""""cosine_sec":$cosSec,"index_build_sec":$idxBuildSec,""" +
      s""""index_single_sec":$idxSec,"corpus_parquet_bytes":$corpusBytes,""" +
      s""""index_read_bytes":$idxReadBytes,""" +
      s""""narrow_raw_sec":$narrowRawSec,"narrow_index_sec":$narrowIdxSec,""" +
      s""""narrow_index_read_bytes":$narrowIdxReadBytes,""" +
      s""""append_1pct_sec":$appendSec,"postings_2seg_sec":$segSec,""" +
      s""""compact_sec":$compactSec,"postings_compacted_sec":$compactedSec}""")
    spark.stop()
  }
}
