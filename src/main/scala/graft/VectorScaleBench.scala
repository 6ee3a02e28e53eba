package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Vector-path scale benchmark: the driver fixture's `embeddings` table is
  * 500 rows at every sf, so BENCH exercises per-query overhead, not data
  * volume. This main generates N deterministic float32 vectors (default
  * 1M × 64) and measures what actually matters at 100 TB: exact-KNN scan
  * throughput (rows/s through the codegen'd distance kernel + bounded
  * TakeOrderedAndProject), batched-KNN via the top-k UDAF, and the IVF
  * probe speedup vs its recall.
  *
  * Run: `sbt "runMain graft.VectorScaleBench [nRows] [dim]"`.
  * Emits one JSON line; numbers recorded in BASELINE.md. */
object VectorScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NB: driver memory cannot be set here — the JVM heap is fixed
      // before this line runs. Size it via SPARK_DRIVER_MEM (build.sbt
      // forwards it to the forked JVM's -Xmx).
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Deterministic pseudo-random vectors, generated distributed with
    // compiled per-partition code (an interpreted `transform(sequence)`
    // lambda takes ~113s for 64M elements; this takes ~2s).
    def genVectors(rows: Long): DataFrame =
      spark.range(rows).mapPartitions { it =>
        it.map { id =>
          val v = new Array[Float](dim)
          var i = 0
          while (i < dim) { v(i) = math.sin(id * 0.7 + (i + 1) * 1.31).toFloat; i += 1 }
          (id, v)
        }
      }.toDF("vec_id", "vec")

    // per-run scratch dirs, deleted before exit — multi-GB leftovers
    // would otherwise accumulate in /tmp across rounds on a shared box
    val scratch = scala.collection.mutable.ArrayBuffer.empty[String]
    def tmpDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      scratch += d
      d
    }

    // the probe vector's id — fixed at 12345 for the documented 1M runs,
    // clamped so small custom nRows don't crash an empty head()
    val probeId = math.min(12345L, n - 1)

    // Materialize at rest — every measurement below reads parquet, the
    // only layout that exists at 100 TB (no cache games on either side).
    val dataDir = tmpDir("graft-scale")
    val buildT0 = System.nanoTime()
    genVectors(n).write.mode("overwrite").parquet(s"$dataDir/vecs")
    val buildSec = (System.nanoTime() - buildT0) / 1e9
    val vecs = spark.read.parquet(s"$dataDir/vecs")

    val q = vecs.filter(col("vec_id") === probeId).select("vec")
      .head().getSeq[Float](0).toArray

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // exact top-10 scan (warm + timed); ids captured from the timed run
    // itself — a separate answer-only pass would be another full scan
    var exactIds: Seq[Long] = Nil
    def exactOnce(): Unit =
      exactIds = vecs
        .select(col("vec_id"), l2_distance(col("vec"), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSeq
    exactOnce()
    val exactSec = math.min(time(exactOnce()), time(exactOnce()))

    // batched: 16 queries × index through the bounded-heap UDAF; the
    // exact per-query answer sets are captured from the timed run
    val queries = vecs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    var batchedRows: Array[org.apache.spark.sql.Row] = Array.empty
    def batchedOnce(): Unit = {
      val topk = graft.functions.VectorAggregates.topKByDist(5)
      batchedRows = vecs.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"), l2_distance(col("vec"), col("qvec")).as("dist"))
        .groupBy(col("qid")).agg(topk(col("dist"), col("vec_id")).as("tops"))
        .collect()
    }
    batchedOnce()
    val batchedSec = math.min(time(batchedOnce()), time(batchedOnce()))
    val exactBatched = batchedRows.map(r => r.getLong(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toSet).toMap

    // IVF: build on a sample, persist partitioned-by-cell, probe 4/64
    // cells AT REST — an in-session cached probe would still scan every
    // row (caching defeats pruning); the win is the parquet partition
    // prune, which is also the only layout that exists at 100 TB.
    val ivfDir = tmpDir("graft-scale-ivf") + "/idx"
    val ivfBuildT0 = System.nanoTime()
    val (indexed, quant) = graft.index.IvfIndex.build(
      vecs, "vec", nlist = 64, sampleFraction = 0.02)
    graft.index.IvfIndex.writeIndexed(indexed, ivfDir)
    val ivfBuildSec = (System.nanoTime() - ivfBuildT0) / 1e9
    val atRest = graft.index.IvfIndex.loadIndexed(spark, ivfDir)

    def ivfOnce(): Seq[Long] =
      graft.index.IvfIndex.searchL2(atRest, quant, "vec", "vec_id", q, 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSeq
    ivfOnce()
    var ivfIds: Seq[Long] = Nil
    val ivfSec = math.min(time { ivfIds = ivfOnce() }, time { ivfIds = ivfOnce() })
    val recall = ivfIds.count(exactIds.contains).toDouble / exactIds.size

    // batched 16 queries THROUGH the IVF prune (the searchBatch
    // composition, B4×B5): per-query probe cells from the broadcast
    // quantizer, an explicit static cell prune (16 queries × nprobe=4
    // touch ≤ 64-of-64... at nlist=64 — the point generalizes: the union
    // of probed cells bounds the scan), cell equi-join, bounded heap.
    val bcQ = spark.sparkContext.broadcast(quant)
    val probeCells = udf((v: Seq[Float]) => bcQ.value.probes(v.toArray, 4))
    def ivfBatchedOnce(): Array[org.apache.spark.sql.Row] = {
      val probed = queries.withColumn("centroidId", explode(probeCells(col("qvec"))))
      val cells = probed.select("centroidId").distinct().collect().map(_.getInt(0))
      val topk = graft.functions.VectorAggregates.topKByDist(5)
      atRest.filter(col("centroidId").isin(cells.map(Integer.valueOf).toSeq: _*))
        .join(broadcast(probed), Seq("centroidId"))
        .select(col("qid"), col("vec_id"), l2_distance(col("vec"), col("qvec")).as("dist"))
        .groupBy(col("qid")).agg(topk(col("dist"), col("vec_id")).as("tops"))
        .collect()
    }
    ivfBatchedOnce()
    var ivfBatchedRows: Array[org.apache.spark.sql.Row] = Array.empty
    val ivfBatchedSec = math.min(
      time { ivfBatchedRows = ivfBatchedOnce() }, time { ivfBatchedRows = ivfBatchedOnce() })
    // recall of the pruned batch vs the exact batched answer (captured
    // from the timed exact run above). Iterate the EXACT qids: a query
    // whose probed cells are all empty contributes no pruned row, and
    // skipping it would overstate recall (its true recall is 0) — and an
    // all-missing degenerate would print NaN into the JSON line.
    val batchRecall = {
      val pruned = ivfBatchedRows.map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toSet).toMap
      val per = exactBatched.toSeq.map { case (qid, want) =>
        pruned.getOrElse(qid, Set.empty[Long]).intersect(want).size.toDouble / want.size
      }
      per.sum / per.length
    }

    // SQ8 cells: same probe prune over int8 codes, then exact re-rank of
    // the broadcast candidate set against the primary parquet.
    //
    // Measured on an IID HASH-RANDOM dataset, not the sine lattice above:
    // any smooth 1-parameter generator puts n points on a curve, so NN
    // gaps shrink like 1/n and fall BELOW the int8 resolution (measured:
    // lattice gaps ~0.003-0.03 vs quantization error scale ~0.04) — int8
    // ranking legitimately cannot order sub-resolution structure. That is
    // a property of the synthetic, not the kernel (Sq8IndexSpec shows
    // refined == exact on real embeddings). IID uniform components are
    // the standard ANN-bench regime: NN spacing stays well above the
    // quantization error, like real embedding corpora.
    def mix(z0: Long): Long = { // splitmix64 finalizer
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def genRandom(rows: Long): DataFrame =
      spark.range(rows).mapPartitions { it =>
        it.map { id =>
          val v = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            v(i) = (mix(id * dim.toLong + i).toDouble / Long.MaxValue).toFloat
            i += 1
          }
          (id, v)
        }
      }.toDF("vec_id", "vec")
    genRandom(n).write.mode("overwrite").parquet(s"$dataDir/cvecs")
    val cvecs = spark.read.parquet(s"$dataDir/cvecs")
    val cq = cvecs.filter(col("vec_id") === probeId).select("vec")
      .head().getSeq[Float](0).toArray
    val (cIndexed, cQuant) = graft.index.IvfIndex.build(
      cvecs, "vec", nlist = 64, sampleFraction = 0.02)
    val cIvfDir = tmpDir("graft-scale-civf") + "/idx"
    graft.index.IvfIndex.writeIndexed(cIndexed, cIvfDir)

    val sq8Dir = tmpDir("graft-scale-sq8") + "/idx"
    val sq8BuildT0 = System.nanoTime()
    graft.index.Sq8Index.writeQuantized(
      graft.index.Sq8Index.quantize(cIndexed, "vec"), sq8Dir)
    val sq8BuildSec = (System.nanoTime() - sq8BuildT0) / 1e9
    val sq8AtRest = graft.index.Sq8Index.loadQuantized(spark, sq8Dir)
    def dirBytes(d: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
    val (floatBytes, sq8Bytes) = (dirBytes(cIvfDir), dirBytes(sq8Dir))

    val cExactIds = cvecs
      .select(col("vec_id"), l2_distance(col("vec"), typedLit(cq)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10).collect().map(_.getLong(0)).toSeq

    def sq8Once(): Seq[Long] =
      graft.index.Sq8Index.searchApproxL2(sq8AtRest, cQuant, "vec_id", cq, 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSeq
    sq8Once()
    var sq8Ids: Seq[Long] = Nil
    val sq8Sec = math.min(time { sq8Ids = sq8Once() }, time { sq8Ids = sq8Once() })
    val sq8Recall = sq8Ids.count(cExactIds.contains).toDouble / cExactIds.size

    def sq8RefinedOnce(): Seq[Long] =
      graft.index.Sq8Index.searchRefinedL2(sq8AtRest, cQuant, cvecs, "vec", "vec_id",
        cq, 10, nprobe = 4, refine = 4).collect().map(_.getLong(0)).toSeq
    sq8RefinedOnce()
    var sq8RefIds: Seq[Long] = Nil
    val sq8RefSec = math.min(
      time { sq8RefIds = sq8RefinedOnce() }, time { sq8RefIds = sq8RefinedOnce() })
    // vs the float-cell probe of the SAME cells — apples to apples
    val cIvfIds = graft.index.IvfIndex.searchL2(
      graft.index.IvfIndex.loadIndexed(spark, cIvfDir), cQuant, "vec", "vec_id",
      cq, 10, nprobe = 4).collect().map(_.getLong(0)).toSeq
    val sq8RefRecall = sq8RefIds.count(cIvfIds.contains).toDouble / cIvfIds.size
    // the FLOAT prune's own recall on iid data — the control that shows
    // partial-probe recall loss is the IVF prune (iid neighbors scatter
    // across cells), not the int8 quantization
    val ivfIidRecall = cIvfIds.count(cExactIds.contains).toDouble / cExactIds.size

    // IVF_SQ8 end-to-end THROUGH GraftClient (r6): the API-reachable path —
    // keyed store ingest, IVF_SQ8 build (float + quantized cells), refined
    // search (quantized stage-1 + broadcast re-rank against the store),
    // and one incremental maintenance commit (re-quantizes only touched
    // cells). Same iid dataset as the module-level SQ8 rows above.
    val clientRoot = tmpDir("graft-scale-cli")
    val client = new graft.api.GraftClient(spark, clientRoot)
    client.createCollection("bench", dim = dim, metric = "l2",
      indexType = "IVF_SQ8", nlist = 64, buckets = 16)
    val upsertT0 = System.nanoTime()
    client.upsert("bench", cvecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val clientUpsertSec = (System.nanoTime() - upsertT0) / 1e9
    val cliBuildT0 = System.nanoTime()
    client.buildIndex("bench", nlist = 64, sampleFraction = 0.02)
    val clientBuildSec = (System.nanoTime() - cliBuildT0) / 1e9
    def clientOnce(np: Int): Seq[String] =
      client.search("bench", cq, k = 10, nprobe = np)
        .collect().map(_.getString(0)).toSeq
    clientOnce(4)
    var cliIds: Seq[String] = Nil
    val clientSearchSec = math.min(
      time { cliIds = clientOnce(4) }, time { cliIds = clientOnce(4) })
    // two recalls, each against the right oracle: the full-probe refined
    // answer vs the exact brute-force scan isolates quantization+refine
    // (the client's own cells differ from the module-level index above —
    // comparing across the two k-means runs would measure cell-assignment
    // mismatch, not SQ8); nprobe=4 vs the full probe isolates the prune.
    val cliFull = clientOnce(64)
    val exactStr = cExactIds.map(_.toString)
    val cliFullRecall = cliFull.count(exactStr.contains).toDouble / exactStr.size
    val cliPruneRecall = cliIds.count(cliFull.contains).toDouble / cliFull.size
    // Range search on IID data (r8) — the honest high-dim regime: iid
    // points concentrate all pairwise distances around one value, so cell
    // radii rival the data spread and the triangle-inequality prune keeps
    // ~every cell. Measured, not assumed — the clustered block below is
    // the regime the prune is FOR (real corpora cluster). Runs BEFORE the
    // maintenance commit so the store content equals cvecs exactly and
    // the raw-parquet band is a fair oracle.
    val iidBandRadius = cvecs
      .select(l2_distance(col("vec"), typedLit(cq)).as("dist"))
      .orderBy(col("dist")).limit(100).collect().last.getDouble(0)
    val iidBandExact = cvecs
      .select(col("vec_id"), l2_distance(col("vec"), typedLit(cq)).as("dist"))
      .filter(col("dist") < iidBandRadius)
      .collect().map(_.getLong(0).toString).toSet
    def iidRangeOnce(): Set[String] =
      client.searchRange("bench", cq, iidBandRadius)
        .collect().map(_.getString(0)).toSet
    iidRangeOnce()
    var iidRangeIds: Set[String] = Set.empty
    val iidRangeSec = math.min(
      time { iidRangeIds = iidRangeOnce() }, time { iidRangeIds = iidRangeOnce() })
    // apples-to-apples with the searchRange timing above: the exact arm
    // pays the same nearest-first output sort AND the same measurement
    // protocol (one warm-up, then min-of-two) — a single cold run here
    // would flatter the measured path
    def iidRangeExactOnce(): Unit =
      cvecs.select(col("vec_id"), l2_distance(col("vec"), typedLit(cq)).as("dist"))
        .filter(col("dist") < iidBandRadius)
        .orderBy(col("dist"), col("vec_id")).collect()
    iidRangeExactOnce()
    val iidRangeExactSec = math.min(
      time(iidRangeExactOnce()), time(iidRangeExactOnce()))
    val iidRangeMatch = iidRangeIds == iidBandExact

    val maintT0 = System.nanoTime()
    client.upsert("bench", cvecs.limit(1000)
      .select(concat(lit("m"), col("vec_id").cast("string")).as("key"),
        col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val clientMaintSec = (System.nanoTime() - maintT0) / 1e9
    val stillSq8 = client.search("bench", cq, k = 10, nprobe = 4)
      .queryExecution.executedPlan.toString.contains("qvec")

    // cosine IVF_SQ8 through GraftClient (r7): codes are quantized in the
    // unit-normalized assign space, so the same fused int8 kernel ranks
    // stage 1 and the re-rank is exact cosine over the original vectors.
    // Same iid dataset; recall decomposed the same two ways as l2 —
    // full-probe-vs-exact isolates quantize+refine, nprobe-vs-full-probe
    // isolates the prune.
    val cosRoot = tmpDir("graft-scale-cos")
    val cosClient = new graft.api.GraftClient(spark, cosRoot)
    cosClient.createCollection("benchcos", dim = dim, metric = "cosine",
      indexType = "IVF_SQ8", nlist = 64, buckets = 16)
    cosClient.upsert("benchcos", cvecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val cosBuildT0 = System.nanoTime()
    cosClient.buildIndex("benchcos", nlist = 64, sampleFraction = 0.02)
    val cosBuildSec = (System.nanoTime() - cosBuildT0) / 1e9
    def cosOnce(np: Int): Seq[String] =
      cosClient.search("benchcos", cq, k = 10, nprobe = np)
        .collect().map(_.getString(0)).toSeq
    cosOnce(4)
    var cosIds: Seq[String] = Nil
    val cosSearchSec = math.min(
      time { cosIds = cosOnce(4) }, time { cosIds = cosOnce(4) })
    val cosExact = cvecs
      .select(col("vec_id"),
        cosine_similarity(col("vec"), typedLit(cq)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0).toString).toSeq
    val cosFull = cosOnce(64)
    val cosFullRecall = cosFull.count(cosExact.contains).toDouble / cosExact.size
    val cosPruneRecall = cosIds.count(cosFull.contains).toDouble / cosFull.size

    // IVF_PQ end-to-end THROUGH GraftClient (r11): m-bytes-per-vector
    // codes (dim 64 / m 16 = 16 B per vector at rest vs 256 B float32,
    // vs SQ8's 64 B+scale), ADC stage-1 over per-cell lookup tables,
    // exact re-rank against the keyed store. Same iid dataset and the
    // same two-way recall decomposition as the SQ8 arm: full-probe vs
    // exact isolates encode+ADC+refine, nprobe=4 vs full-probe isolates
    // the prune. PQ's approximation is coarser than SQ8's by
    // construction — these rows put a measured number on how much of
    // that coarseness refine=4 absorbs at 1M.
    val pqRoot = tmpDir("graft-scale-pq")
    val pqClient = new graft.api.GraftClient(spark, pqRoot)
    // pqM pinned at 16 (not the auto-pick, which moved to the FAISS
    // dsub band in r11): round-over-round rows must measure the same
    // operating point, and m 16 is the maximum-compression corner these
    // rows document (dim 64 / m 16 = 16 B/vector)
    pqClient.createCollection("benchpq", dim = dim, metric = "l2",
      indexType = "IVF_PQ", nlist = 64, buckets = 16, pqM = 16)
    pqClient.upsert("benchpq", cvecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val pqBuildT0 = System.nanoTime()
    pqClient.buildIndex("benchpq", nlist = 64, sampleFraction = 0.02)
    val pqBuildSec = (System.nanoTime() - pqBuildT0) / 1e9
    // at-rest footprint of the PQ codes vs the float cells the SAME
    // build wrote (both live under the collection's -ivf dir)
    val pqBytes = dirBytes(s"$pqRoot/data/benchpq-ivf/pqcells")
    val pqFloatBytes = dirBytes(s"$pqRoot/data/benchpq-ivf/cells")
    def pqOnce(np: Int): Seq[String] =
      pqClient.search("benchpq", cq, k = 10, nprobe = np)
        .collect().map(_.getString(0)).toSeq
    pqOnce(4)
    var pqIds: Seq[String] = Nil
    val pqSearchSec = math.min(
      time { pqIds = pqOnce(4) }, time { pqIds = pqOnce(4) })
    val pqFull = pqOnce(64)
    val pqFullRecall = pqFull.count(exactStr.contains).toDouble / exactStr.size
    val pqPruneRecall = pqIds.count(pqFull.contains).toDouble / pqFull.size
    // one maintenance commit: touched cells re-encode against the FROZEN
    // codebooks; the next search must still ride ADC (not fall back)
    val pqMaintT0 = System.nanoTime()
    pqClient.upsert("benchpq", cvecs.limit(1000)
      .select(concat(lit("m"), col("vec_id").cast("string")).as("key"),
        col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val pqMaintSec = (System.nanoTime() - pqMaintT0) / 1e9
    val stillPq = pqClient.search("benchpq", cq, k = 10, nprobe = 4)
      .queryExecution.executedPlan.toString.contains("pq_adc_distance")

    // batched 16-query sweep THROUGH the PQ codes (r12): stage 1 reads
    // m bytes/row and ranks with the asymmetric-ADC kernel executor-side
    // (PqAsymDistance — no per-query LUT build or shuffle), the bounded
    // heap keeps k·refine keys per query BEFORE the shuffle, and the
    // shared exact re-rank tail re-fetches from the keyed store. Parity
    // vs the single-query path is asserted, not assumed: asym ADC is
    // bit-identical to the LUT ADC, so batch hits == per-query hits.
    val pqQueries = cvecs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"))
    def pqBatchOnce(): Map[Long, Seq[String]] =
      pqClient.searchBatch("benchpq", pqQueries, k = 10, nprobe = 4)
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rs) => qid -> rs.map(_.getString(1)).toSeq }
    pqBatchOnce()
    var pqBatch: Map[Long, Seq[String]] = Map.empty
    val pqBatchSec = math.min(
      time { pqBatch = pqBatchOnce() }, time { pqBatch = pqBatchOnce() })
    val pqBatchAdcPlan = pqClient.searchBatch("benchpq", pqQueries, k = 10,
        nprobe = 4).queryExecution.executedPlan.toString
      .contains("pq_asym_distance")
    val q0 = cvecs.filter(col("vec_id") === 0L).select("vec")
      .head().getSeq[Float](0).toArray
    val pqBatchParity = pqBatch(0L) ==
      pqClient.search("benchpq", q0, k = 10, nprobe = 4)
        .collect().map(_.getString(0)).toSeq

    // HNSW end-to-end THROUGH GraftClient (r12): one navigable graph per
    // store bucket (16 shards of ~n/16 nodes), built executor-side and
    // persisted as blob rows; search is scatter-gather (each task walks
    // whole graphs with beam ef, one global merge) + exact re-rank. Same
    // iid dataset; recall at ef 64 and 256 puts measured numbers on the
    // beam/recall curve in the honest worst-case (iid) regime. The
    // maintenance row measures the DESIGNED worst case: a 1000-key batch
    // touches every shard, so the commit pays ~a full graph rebuild —
    // HNSW maintenance cost scales with TOUCHED SHARDS, not batch rows
    // (batch your commits; tiny-batch streaming into HNSW is the
    // anti-pattern, exactly why Milvus buffers growing segments).
    val hnswRoot = tmpDir("graft-scale-hnsw")
    val hnswClient = new graft.api.GraftClient(spark, hnswRoot)
    hnswClient.createCollection("benchhnsw", dim = dim, metric = "l2",
      indexType = "HNSW", buckets = 16, efConstruction = 100)
    // rows carry a 100-ary group tag so the r13 FILTERED arm below can
    // measure a 1%-selectivity masked walk on this same collection
    hnswClient.upsert("benchhnsw", cvecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), map(lit("g"), pmod(col("vec_id"), lit(100L)).cast("string")).as("meta")))
    val hnswBuildT0 = System.nanoTime()
    hnswClient.buildIndex("benchhnsw", nlist = 0)
    val hnswBuildSec = (System.nanoTime() - hnswBuildT0) / 1e9
    val hnswBytes = dirBytes(s"$hnswRoot/data/benchhnsw-ivf/hnsw_graphs")
    def hnswOnce(e: Int): Seq[String] =
      hnswClient.search("benchhnsw", cq, k = 10, ef = e)
        .collect().map(_.getString(0)).toSeq
    hnswOnce(64)
    var hnswIds: Seq[String] = Nil
    val hnswSearchSec = math.min(
      time { hnswIds = hnswOnce(64) }, time { hnswIds = hnswOnce(64) })
    val hnswRecall64 = hnswIds.count(exactStr.contains).toDouble / exactStr.size
    val hnswRecall256 = hnswOnce(256).count(exactStr.contains).toDouble / exactStr.size
    // loaded search: blobs pinned as in-memory frames (Milvus's mandatory
    // load) — the walk itself is milliseconds, so this row isolates the
    // per-query blob-read tax the unloaded row pays
    hnswClient.loadCollection("benchhnsw")
    hnswOnce(64)
    val hnswLoadedSec = math.min(time(hnswOnce(64)), time(hnswOnce(64)))
    hnswClient.releaseCollection("benchhnsw")
    // r12 growing tail: a 1000-key commit is O(1) on the index (tail
    // estimate bump — no graph I/O); the search stays graph-served with
    // the 1000 tail rows exact-scanned. The FOLD row prices the
    // amortized seal (compact rebuilds only the changed buckets'
    // graphs) — the cost that under the retired per-commit-rebuild
    // policy every small commit paid up front.
    val hnswMaintT0 = System.nanoTime()
    hnswClient.upsert("benchhnsw", cvecs.limit(1000)
      .select(concat(lit("m"), col("vec_id").cast("string")).as("key"),
        col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val hnswMaintSec = (System.nanoTime() - hnswMaintT0) / 1e9
    val stillHnsw = hnswClient.search("benchhnsw", cq, k = 10, ef = 64)
      .queryExecution.executedPlan.toString.contains("MapPartitions")
    val hnswTailIds = hnswClient.search("benchhnsw", cq, k = 10, ef = 64)
      .collect().map(_.getString(0)).toSeq
    val hnswFoldT0 = System.nanoTime()
    val hnswFolded = hnswClient.compact("benchhnsw")
      .exists(a => a._2 == "hnsw")
    val hnswFoldSec = (System.nanoTime() - hnswFoldT0) / 1e9
    // the fold must not change what the search returns (same live set)
    val hnswFoldParity = hnswClient.search("benchhnsw", cq, k = 10, ef = 64)
      .collect().map(_.getString(0)).toSeq == hnswTailIds

    // FILTERED HNSW (r13): a 1%-selectivity metadata filter rides the
    // MASKED walk (passing keys resolve off the metadata columns, the
    // beam traverses non-passing nodes but never returns them) instead
    // of the pre-r13 exact corpus scan. The exact twin row prices what
    // that fallback used to cost on the same collection; recall is
    // measured against it (ef scales by the measured inverse
    // selectivity, so the beam covers ~ef·100 nodes here).
    val hfFilter = element_at(col("meta"), "g") === "7"
    def hnswFilteredOnce(): Seq[String] =
      hnswClient.search("benchhnsw", cq, k = 10, ef = 64,
        filter = Some(hfFilter)).collect().map(_.getString(0)).toSeq
    hnswFilteredOnce()
    var hfIds: Seq[String] = Nil
    val hnswFilteredSec = math.min(
      time { hfIds = hnswFilteredOnce() }, time { hfIds = hnswFilteredOnce() })
    val hfGraphPlan = hnswClient.search("benchhnsw", cq, k = 10, ef = 64,
        filter = Some(hfFilter))
      .queryExecution.executedPlan.toString.contains("MapPartitions")
    val hfQueries = cvecs.filter(col("vec_id") === probeId)
      .select(lit(0L).as("qid"), col("vec").as("qvec"))
    def hnswFilteredExactOnce(): Seq[String] =
      hnswClient.searchBatch("benchhnsw", hfQueries, k = 10,
        filter = Some(hfFilter), forceExact = true)
        .collect().map(_.getString(1)).toSeq
    hnswFilteredExactOnce()
    var hfExactIds: Seq[String] = Nil
    val hnswFilteredExactSec = math.min(
      time { hfExactIds = hnswFilteredExactOnce() },
      time { hfExactIds = hnswFilteredExactOnce() })
    val hfRecall = hfIds.count(hfExactIds.contains).toDouble /
      math.max(hfExactIds.size, 1)
    // the LOADED filtered walk — Milvus's actual operating mode (its
    // load is mandatory): blobs pinned as in-memory frames, isolating
    // the walk + passing-resolve cost from the per-query blob-read tax
    // the unloaded row pays (the blobs are 1.4× the data — at dim 64,
    // reading them per query can exceed the exact scan's column reads)
    hnswClient.loadCollection("benchhnsw")
    hnswFilteredOnce()
    var hfLoadedIds: Seq[String] = Nil
    val hnswFilteredLoadedSec = math.min(
      time { hfLoadedIds = hnswFilteredOnce() },
      time { hfLoadedIds = hnswFilteredOnce() })
    val hfLoadedRecall = hfLoadedIds.count(hfExactIds.contains).toDouble /
      math.max(hfExactIds.size, 1)
    hnswClient.releaseCollection("benchhnsw")

    // GROUPED search on HNSW (r14): the graph walk with group-aware
    // over-fetch (walk depth k·groupSize) vs forceExact — the full
    // corpus distance scan this surface ran before the dispatch. Top-10
    // groups × 2 best each over the 100-value "g" key; recall counts
    // (group, key) pairs the walk agrees with the exact grouped
    // ranking on. Both arms pay the two-pass winners-broadcast tail,
    // so the delta prices candidate generation alone.
    def hnswGroupedRows(force: Boolean): Seq[(String, String)] =
      hnswClient.searchGrouped("benchhnsw", cq, k = 10, groupByKey = "g",
          groupSize = 2, ef = 64, forceExact = force)
        .collect().map(r => (r.getString(0), r.getString(3))).toSeq
    hnswGroupedRows(force = false)
    var hgIds: Seq[(String, String)] = Nil
    val hnswGroupedSec = math.min(
      time { hgIds = hnswGroupedRows(force = false) },
      time { hgIds = hnswGroupedRows(force = false) })
    val hgGraphPlan = hnswClient.searchGrouped("benchhnsw", cq, k = 10,
        groupByKey = "g", groupSize = 2, ef = 64)
      .queryExecution.executedPlan.toString.contains("MapPartitions")
    hnswGroupedRows(force = true)
    var hgExactIds: Seq[(String, String)] = Nil
    val hnswGroupedExactSec = math.min(
      time { hgExactIds = hnswGroupedRows(force = true) },
      time { hgExactIds = hnswGroupedRows(force = true) })
    val hgRecall = hgIds.count(hgExactIds.contains).toDouble /
      math.max(hgExactIds.size, 1)
    // the AUTO-ef adaptive walk (r14): when fewer than k groups fill,
    // the walk depth quadruples (≤2 expansions) — prices the default
    // path a knob-less caller gets, recall against the same exact twin
    def hnswGroupedAutoRows(): Seq[(String, String)] =
      hnswClient.searchGrouped("benchhnsw", cq, k = 10, groupByKey = "g",
          groupSize = 2)
        .collect().map(r => (r.getString(0), r.getString(3))).toSeq
    hnswGroupedAutoRows()
    var hgAutoIds: Seq[(String, String)] = Nil
    val hnswGroupedAutoSec = math.min(
      time { hgAutoIds = hnswGroupedAutoRows() },
      time { hgAutoIds = hnswGroupedAutoRows() })
    val hgAutoRecall = hgAutoIds.count(hgExactIds.contains).toDouble /
      math.max(hgExactIds.size, 1)

    // BIN_IVF_FLAT (r12): 1M sign-binarized codes (64 dims → ONE long,
    // 32× smaller than float32 at rest) in k-majority Hamming cells.
    // iid sign patterns are the adversarial regime for the prune (like
    // the float iid rows) — the numbers price the fused XOR+popcount
    // scan and the layout, with recall measured, not assumed.
    import graft.functions.BinaryVectorFunctions.{pack_sign_bits, hamming_distance}
    val binCodes = cvecs.select(col("vec_id"),
      pack_sign_bits(col("vec")).as("codes"))
    val binDir = tmpDir("graft-scale-bin") + "/idx"
    val binBuildT0 = System.nanoTime()
    val (binIndexed, binQuant) = graft.index.BinIvfIndex.build(
      binCodes, "codes", nlist = 64)
    graft.index.BinIvfIndex.writeIndexed(binIndexed, binDir)
    val binBuildSec = (System.nanoTime() - binBuildT0) / 1e9
    val binAtRest = graft.index.BinIvfIndex.loadIndexed(spark, binDir)
    val binBytes = dirBytes(binDir)
    val cqBits = binCodes.filter(col("vec_id") === probeId)
      .select("codes").head().getSeq[Long](0).toArray
    def binExactOnce(): Seq[Long] =
      graft.index.BinIvfIndex.searchHamming(binAtRest, binQuant, "codes",
        "vec_id", cqBits, k = 10, nprobe = binQuant.nlist)
        .collect().map(_.getLong(0)).toSeq
    binExactOnce()
    var binExactIds: Seq[Long] = Nil
    val binExactSec = math.min(
      time { binExactIds = binExactOnce() }, time { binExactIds = binExactOnce() })
    def binPrunedOnce(): Seq[Long] =
      graft.index.BinIvfIndex.searchHamming(binAtRest, binQuant, "codes",
        "vec_id", cqBits, k = 10, nprobe = 4)
        .collect().map(_.getLong(0)).toSeq
    binPrunedOnce()
    var binPrunedIds: Seq[Long] = Nil
    val binPrunedSec = math.min(
      time { binPrunedIds = binPrunedOnce() }, time { binPrunedIds = binPrunedOnce() })
    val binRecall = binPrunedIds.count(binExactIds.contains).toDouble /
      binExactIds.size

    // BINARY_VECTOR client e2e (r13): the same packed codes through the
    // FULL collection lifecycle — createCollection(vectorType =
    // BINARY_VECTOR), keyed-store upsert, buildIndex("BIN_IVF_FLAT"),
    // searchBinary — with the module-level rows above as the parity
    // reference (full probe must return the identical top-10) and a
    // 1000-key maintenance commit proving the touched-cell refresh keeps
    // the index fresh (the search after it must still read the cell
    // layout). Keys are zero-padded so string tie-breaks equal the
    // module arm's numeric ones.
    val binCliRoot = tmpDir("graft-scale-bincli")
    val binCli = new graft.api.GraftClient(spark, binCliRoot)
    binCli.createCollection("benchbin", dim = dim, metric = "hamming",
      indexType = "BIN_IVF_FLAT", nlist = 64, buckets = 16,
      vectorType = "BINARY_VECTOR")
    val binCliUpsertT0 = System.nanoTime()
    binCli.upsert("benchbin", binCodes.select(
      lpad(col("vec_id").cast("string"), 8, "0").as("key"),
      col("codes").as("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val binCliUpsertSec = (System.nanoTime() - binCliUpsertT0) / 1e9
    val binCliBuildT0 = System.nanoTime()
    binCli.buildIndex("benchbin", nlist = 64)
    val binCliBuildSec = (System.nanoTime() - binCliBuildT0) / 1e9
    def binCliOnce(np: Int): Seq[Long] =
      binCli.searchBinary("benchbin", cqBits, k = 10, nprobe = np)
        .collect().map(_.getString(0).toLong).toSeq
    binCliOnce(64)
    var binCliExactIds: Seq[Long] = Nil
    val binCliExactSec = math.min(
      time { binCliExactIds = binCliOnce(64) },
      time { binCliExactIds = binCliOnce(64) })
    val binCliParity = binCliExactIds == binExactIds
    binCliOnce(4)
    var binCliPrunedIds: Seq[Long] = Nil
    val binCliPrunedSec = math.min(
      time { binCliPrunedIds = binCliOnce(4) },
      time { binCliPrunedIds = binCliOnce(4) })
    val binCliMaintT0 = System.nanoTime()
    binCli.upsert("benchbin", binCodes.limit(1000).select(
      concat(lit("m"), col("vec_id").cast("string")).as("key"),
      col("codes").as("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val binCliMaintSec = (System.nanoTime() - binCliMaintT0) / 1e9
    val stillBin = binCli.searchBinary("benchbin", cqBits, k = 10, nprobe = 4)
      .queryExecution.executedPlan.toString.contains("centroidId")

    // SPARSE_FLOAT_VECTOR client e2e (r13): n docs × 32 nonzero dims
    // drawn from a 50k vocab with a squared-uniform skew (low dims hot —
    // the Zipf-ish df a lexical corpus has) through the FULL lifecycle:
    // createCollection(SPARSE_FLOAT_VECTOR), (dim → w) maps through the
    // keyed store, the exact map-probe scan BEFORE any index exists (the
    // family's staleness fallback, measured at volume), then
    // buildIndex("SPARSE_INVERTED_INDEX") and the dim-bucket-pruned
    // search — LOSSLESS, so parity with the exact arm is asserted, not a
    // recall column — and a 1000-doc maintenance commit whose auto-append
    // must leave the index FRESH.
    val sparseNnz = 32
    val sparseVocab = 50000L
    def genSparse(rows: Long, tag: String): DataFrame =
      spark.range(rows).mapPartitions { it =>
        it.map { id =>
          val m = scala.collection.mutable.Map.empty[Long, Double]
          var j = 0
          while (m.size < sparseNnz) {
            val h = mix(id * 131 + j * 7919 + 17)
            val u = (h & Long.MaxValue).toDouble / Long.MaxValue
            m.getOrElseUpdate((u * u * sparseVocab).toLong,
              1.0 + ((h >>> 17) % 5).toDouble)
            j += 1
          }
          (tag + f"$id%09d", m.toMap)
        }
      }.toDF("key", "vec")
    val spCliRoot = tmpDir("graft-scale-sparsecli")
    val spCli = new graft.api.GraftClient(spark, spCliRoot)
    spCli.createCollection("benchsparse", dim = 0, metric = "dot",
      indexType = "SPARSE_INVERTED_INDEX", buckets = 16,
      vectorType = "SPARSE_FLOAT_VECTOR")
    val spCliUpsertT0 = System.nanoTime()
    spCli.upsert("benchsparse", genSparse(n, "s").select(col("key"),
      col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val spCliUpsertSec = (System.nanoTime() - spCliUpsertT0) / 1e9
    val spq = spCli.getSparse("benchsparse", "s" + f"$probeId%09d").get._1
    def spCliOnce(): Seq[String] =
      spCli.searchSparse("benchsparse", spq, k = 10)
        .collect().map(_.getString(0)).toSeq
    spCliOnce()
    var spExactIds: Seq[String] = Nil
    val spCliExactSec = math.min(
      time { spExactIds = spCliOnce() }, time { spExactIds = spCliOnce() })
    val spCliBuildT0 = System.nanoTime()
    spCli.buildIndex("benchsparse", nlist = 64)
    val spCliBuildSec = (System.nanoTime() - spCliBuildT0) / 1e9
    spCliOnce()
    var spIdxIds: Seq[String] = Nil
    val spCliIdxSec = math.min(
      time { spIdxIds = spCliOnce() }, time { spIdxIds = spCliOnce() })
    val spCliParity = spIdxIds == spExactIds
    val spCliMaintT0 = System.nanoTime()
    spCli.upsert("benchsparse", genSparse(1000, "m").select(col("key"),
      col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val spCliMaintSec = (System.nanoTime() - spCliMaintT0) / 1e9
    val stillSparse = spCli.listIndexes("benchsparse")
      .filter(col("kind") === "SPARSE_INVERTED_INDEX").head().getBoolean(2)

    // Range search on CLUSTERED data (r8) — 64 well-separated blobs
    // (coordinate spread ±8, blob radius ~0.9, inter-center distance
    // ~50): the geometry real corpora have (topic clusters), and the one
    // the lossless triangle-inequality prune pays in — KMeans recovers
    // the blobs, so cell radii ≈ blob radii ≪ separation and a small
    // band keeps O(1) of the 64 cells. (Neither earlier synthetic works
    // here: the sine lattice is a chaotic space-filling curve and iid
    // points concentrate distances — both give cell radii that rival the
    // data spread, so the prune honestly keeps everything; see the
    // range_iid rows for that regime, measured.) The band radius
    // self-calibrates to the exact 100th-nearest distance; exact
    // (pre-index snapshot scan) and pruned (post-build) runs must return
    // the IDENTICAL band — the prune has no recall knob.
    def genBlobs(rows: Long): DataFrame =
      spark.range(rows).mapPartitions { it =>
        it.map { id =>
          val blob = (id % 64).toInt
          val v = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            val c = (mix(blob.toLong * dim + i).toDouble / Long.MaxValue) * 8.0
            val eps = (mix(id * dim + i + 7).toDouble / Long.MaxValue) * 0.2
            v(i) = (c + eps).toFloat
            i += 1
          }
          (id, v)
        }
      }.toDF("vec_id", "vec")
    genBlobs(n).write.mode("overwrite").parquet(s"$dataDir/bvecs")
    val bvecs = spark.read.parquet(s"$dataDir/bvecs")
    val bq = bvecs.filter(col("vec_id") === probeId).select("vec")
      .head().getSeq[Float](0).toArray
    val rngRoot = tmpDir("graft-scale-rng")
    val rngClient = new graft.api.GraftClient(spark, rngRoot)
    rngClient.createCollection("benchrng", dim = dim, metric = "l2",
      indexType = "IVF_FLAT", nlist = 64, buckets = 16)
    rngClient.upsert("benchrng", bvecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), typedLit(Map.empty[String, String]).as("meta")))
    val bandRadius = bvecs
      .select(l2_distance(col("vec"), typedLit(bq)).as("dist"))
      .orderBy(col("dist")).limit(100).collect().last.getDouble(0)
    def rngOnce(): Set[String] =
      rngClient.searchRange("benchrng", bq, bandRadius)
        .collect().map(_.getString(0)).toSet
    rngOnce()
    var rngExactIds: Set[String] = Set.empty
    val rngExactSec = math.min(
      time { rngExactIds = rngOnce() }, time { rngExactIds = rngOnce() })
    rngClient.buildIndex("benchrng", nlist = 64, sampleFraction = 0.02)
    rngOnce()
    var rngPrunedIds: Set[String] = Set.empty
    val rngPrunedSec = math.min(
      time { rngPrunedIds = rngOnce() }, time { rngPrunedIds = rngOnce() })
    val rngMatch = rngPrunedIds == rngExactIds

    // Grouped search at HIGH group cardinality (r9) — the "one hit per
    // source document" pattern: n/2 distinct groups over n rows, FLAT
    // (exact scan — worst case for the group-ranking stage, every row a
    // candidate). The two-pass shape (min-agg + TakeOrdered(k) collect,
    // then broadcast-join under the bounded heap) must stay flat in
    // |groups|; the retired rank-window shape serialized all n/2 groups'
    // survivors through ONE task here. Correctness: the emitted group
    // ranking must equal the exact per-group-best ranking computed
    // directly on the raw frame.
    val grpRoot = tmpDir("graft-scale-grp")
    val grpClient = new graft.api.GraftClient(spark, grpRoot)
    grpClient.createCollection("benchgrp", dim = dim, metric = "l2")
    grpClient.upsert("benchgrp", cvecs.select(
      col("vec_id").cast("string").as("key"), col("vec"),
      map(lit("g"), (col("vec_id") / 2).cast("long").cast("string")).as("meta")))
    def grpOnce(): Seq[String] =
      grpClient.searchGrouped("benchgrp", cq, k = 10, groupByKey = "g",
        groupSize = 2).collect().map(_.getString(0)).distinct.toSeq
    grpOnce()
    var grpTop: Seq[String] = Nil
    val groupedHcSec = math.min(
      time { grpTop = grpOnce() }, time { grpTop = grpOnce() })
    val grpExpected = cvecs
      .select((col("vec_id") / 2).cast("long").cast("string").as("g"),
        l2_distance(col("vec"), typedLit(cq)).as("dist"))
      .groupBy(col("g")).agg(min(col("dist")).as("best"))
      .orderBy(col("best"), col("g")).limit(10)
      .collect().map(_.getString(0)).toSeq
    val groupedHcMatch = grpTop == grpExpected

    val rowsPerSec = (n / exactSec).toLong
    println(
      s"""{"metric":"vector_scale","n":$n,"dim":$dim,"gen_sec":$buildSec,""" +
        s""""exact_knn_sec":$exactSec,"exact_rows_per_sec":$rowsPerSec,""" +
        s""""batched16_sec":$batchedSec,"ivf_build_sec":$ivfBuildSec,""" +
        s""""ivf_probe4of64_sec":$ivfSec,"ivf_speedup":${exactSec / ivfSec},""" +
        s""""ivf_recall_at10":$recall,""" +
        s""""ivf_batched16_sec":$ivfBatchedSec,""" +
        s""""ivf_batched_speedup":${batchedSec / ivfBatchedSec},""" +
        s""""ivf_batched_recall_at5":$batchRecall,""" +
        s""""sq8_data":"iid_random","sq8_build_sec":$sq8BuildSec,""" +
        s""""sq8_bytes":$sq8Bytes,"float_bytes":$floatBytes,""" +
        s""""sq8_bytes_ratio":${sq8Bytes.toDouble / floatBytes},""" +
        s""""sq8_probe_sec":$sq8Sec,"sq8_recall_at10":$sq8Recall,""" +
        s""""sq8_refined_sec":$sq8RefSec,"sq8_refined_recall_vs_ivf":$sq8RefRecall,""" +
        s""""ivf_iid_prune_recall_at10":$ivfIidRecall,""" +
        s""""client_sq8_upsert_sec":$clientUpsertSec,""" +
        s""""client_sq8_build_sec":$clientBuildSec,""" +
        s""""client_sq8_search_sec":$clientSearchSec,""" +
        s""""client_sq8_fullprobe_recall_vs_exact":$cliFullRecall,""" +
        s""""client_sq8_prune_recall_vs_fullprobe":$cliPruneRecall,""" +
        s""""client_sq8_maint_commit_sec":$clientMaintSec,""" +
        s""""client_sq8_fresh_after_maint":$stillSq8,""" +
        s""""client_cos_sq8_build_sec":$cosBuildSec,""" +
        s""""client_cos_sq8_search_sec":$cosSearchSec,""" +
        s""""client_cos_sq8_fullprobe_recall_vs_exact":$cosFullRecall,""" +
        s""""client_cos_sq8_prune_recall_vs_fullprobe":$cosPruneRecall,""" +
        s""""client_pq_build_sec":$pqBuildSec,""" +
        s""""pq_bytes":$pqBytes,"pq_float_bytes":$pqFloatBytes,""" +
        s""""pq_bytes_ratio":${pqBytes.toDouble / pqFloatBytes},""" +
        s""""client_pq_search_sec":$pqSearchSec,""" +
        s""""client_pq_fullprobe_recall_vs_exact":$pqFullRecall,""" +
        s""""client_pq_prune_recall_vs_fullprobe":$pqPruneRecall,""" +
        s""""client_pq_maint_commit_sec":$pqMaintSec,""" +
        s""""client_pq_fresh_after_maint":$stillPq,""" +
        s""""client_pq_batch16_sec":$pqBatchSec,""" +
        s""""client_pq_batch_adc_plan":$pqBatchAdcPlan,""" +
        s""""client_pq_batch_parity":$pqBatchParity,""" +
        s""""client_hnsw_build_sec":$hnswBuildSec,""" +
        s""""hnsw_bytes":$hnswBytes,""" +
        s""""client_hnsw_search_ef64_sec":$hnswSearchSec,""" +
        s""""client_hnsw_loaded_search_ef64_sec":$hnswLoadedSec,""" +
        s""""client_hnsw_recall_ef64":$hnswRecall64,""" +
        s""""client_hnsw_recall_ef256":$hnswRecall256,""" +
        s""""client_hnsw_maint_commit_sec":$hnswMaintSec,""" +
        s""""client_hnsw_fresh_after_maint":$stillHnsw,""" +
        s""""client_hnsw_fold_sec":$hnswFoldSec,""" +
        s""""client_hnsw_folded":$hnswFolded,""" +
        s""""client_hnsw_fold_parity":$hnswFoldParity,""" +
        s""""client_hnsw_filtered_sec":$hnswFilteredSec,""" +
        s""""client_hnsw_filtered_graph_plan":$hfGraphPlan,""" +
        s""""client_hnsw_filtered_exact_sec":$hnswFilteredExactSec,""" +
        s""""client_hnsw_filtered_recall_at10":$hfRecall,""" +
        s""""client_hnsw_filtered_loaded_sec":$hnswFilteredLoadedSec,""" +
        s""""client_hnsw_filtered_loaded_recall_at10":$hfLoadedRecall,""" +
        s""""client_hnsw_grouped_sec":$hnswGroupedSec,""" +
        s""""client_hnsw_grouped_graph_plan":$hgGraphPlan,""" +
        s""""client_hnsw_grouped_exact_sec":$hnswGroupedExactSec,""" +
        s""""client_hnsw_grouped_recall":$hgRecall,""" +
        s""""client_hnsw_grouped_auto_sec":$hnswGroupedAutoSec,""" +
        s""""client_hnsw_grouped_auto_recall":$hgAutoRecall,""" +
        s""""bin_ivf_build_sec":$binBuildSec,"bin_bytes":$binBytes,""" +
        s""""bin_bytes_vs_float":${binBytes.toDouble / floatBytes},""" +
        s""""bin_exact_scan_sec":$binExactSec,""" +
        s""""bin_probe4of64_sec":$binPrunedSec,""" +
        s""""bin_probe_recall_at10":$binRecall,""" +
        s""""client_bin_upsert_sec":$binCliUpsertSec,""" +
        s""""client_bin_build_sec":$binCliBuildSec,""" +
        s""""client_bin_fullprobe_sec":$binCliExactSec,""" +
        s""""client_bin_fullprobe_parity":$binCliParity,""" +
        s""""client_bin_probe4of64_sec":$binCliPrunedSec,""" +
        s""""client_bin_probe_recall_at10":${
          binCliPrunedIds.count(binCliExactIds.contains).toDouble /
            math.max(binCliExactIds.size, 1)},""" +
        s""""client_bin_maint_commit_sec":$binCliMaintSec,""" +
        s""""client_bin_fresh_after_maint":$stillBin,""" +
        s""""client_sparse_upsert_sec":$spCliUpsertSec,""" +
        s""""client_sparse_exactscan_sec":$spCliExactSec,""" +
        s""""client_sparse_build_sec":$spCliBuildSec,""" +
        s""""client_sparse_idx_sec":$spCliIdxSec,""" +
        s""""client_sparse_idx_parity":$spCliParity,""" +
        s""""client_sparse_maint_commit_sec":$spCliMaintSec,""" +
        s""""client_sparse_fresh_after_maint":$stillSparse,""" +
        s""""range_iid_radius":$iidBandRadius,"range_iid_hits":${iidRangeIds.size},""" +
        s""""range_iid_pruned_sec":$iidRangeSec,"range_iid_exact_sec":$iidRangeExactSec,""" +
        s""""range_iid_match":$iidRangeMatch,""" +
        s""""range_clustered_radius":$bandRadius,"range_clustered_hits":${rngPrunedIds.size},""" +
        s""""range_clustered_exact_sec":$rngExactSec,""" +
        s""""range_clustered_pruned_sec":$rngPrunedSec,""" +
        // guarded ratio: a denominator rounding to 0 would interpolate
        // Infinity/NaN — invalid JSON — into the line. Locale.ROOT, not
        // the f interpolator: String.format under a comma-decimal default
        // locale would emit "1,2345" and corrupt the JSON.
        s""""range_clustered_speedup":${
          if (rngPrunedSec > 0)
            String.format(java.util.Locale.ROOT, "%.4f",
              Double.box(rngExactSec / rngPrunedSec))
          else "null"},""" +
        s""""range_clustered_match":$rngMatch,""" +
        s""""grouped_hc_groups":${n / 2},"grouped_hc_sec":$groupedHcSec,""" +
        s""""grouped_hc_match":$groupedHcMatch}""")
    spark.stop()
    // multi-GB scratch (two datasets, three index copies, two client
    // stores) — clean it before exit so repeated runs don't fill /tmp
    scratch.foreach(d => graft.streaming.BucketedKeyedCollection.deleteTree(
      java.nio.file.Paths.get(d)))
  }
}
