package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Field-view overhead at volume (r16): a NAMED SPARSE_FLOAT_VECTOR
  * field of a multi-vector collection vs the standalone sparse
  * COLLECTION on the SAME 1M × 32-nnz corpus — the measurement behind
  * the claim that the field view (read-rename + column prune over the
  * shared store) adds no materially different plan. Both arms run the
  * full lifecycle (upsert → SPARSE_INVERTED_INDEX build → index-served
  * topK → 1000-doc maintenance commit), the searches must return
  * IDENTICAL keys (the layouts are lossless — parity is asserted, not a
  * recall column), and min-of-two warm timings land side by side.
  *
  * The multi-vector arm's store rows also carry a dim-8 dense primary,
  * so its scans prove the prune: a field search reads the map column,
  * never the primary floats.
  *
  * Run: `sbt "runMain graft.FieldViewBench [nRows]"` (default 1M).
  * Emits one JSON line; numbers recorded in BASELINE.md. */
object FieldViewBench {
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

    def tmpDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix)
      d.toString
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def mix(z0: Long): Long = { // splitmix64 finalizer
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    // VectorScaleBench's sparse corpus verbatim: 32 nonzero dims from a
    // 50k vocab with a squared-uniform skew (low dims hot — Zipf-ish df)
    val sparseNnz = 32
    val sparseVocab = 50000L
    val denseDim = 8
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
          val dv = Array.tabulate(denseDim)(i =>
            (mix(id * denseDim + i).toDouble / Long.MaxValue).toFloat)
          (tag + f"$id%09d", m.toMap, dv.toSeq)
        }
      }.toDF("key", "sp", "dvec")

    val probeId = 12345L

    // ---- arm A: the sparse COLLECTION (the r13 family, the control)
    val scRoot = tmpDir("graft-fv-sc")
    val sc = new graft.api.GraftClient(spark, scRoot)
    sc.createCollection("fvsc", dim = 0, metric = "dot",
      indexType = "SPARSE_INVERTED_INDEX", buckets = 16,
      vectorType = "SPARSE_FLOAT_VECTOR")
    val scUpsertSec = time {
      sc.upsert("fvsc", genSparse(n, "s").select(col("key"),
        col("sp").as("vec"), typedLit(Map.empty[String, String]).as("meta")))
    }
    val q = sc.getSparse("fvsc", "s" + f"$probeId%09d").get._1
    val scBuildSec = time { sc.buildIndex("fvsc", nlist = 64) }
    def scOnce(): Seq[String] =
      sc.searchSparse("fvsc", q, k = 10).collect().map(_.getString(0)).toSeq
    scOnce()
    var scIds: Seq[String] = Nil
    val scTopkSec = math.min(time { scIds = scOnce() }, time { scIds = scOnce() })

    // ---- arm B: the SAME corpus as a NAMED FIELD of a multi-vector
    // collection (dense dim-8 primary + sparse field "sp")
    val mvRoot = tmpDir("graft-fv-mv")
    val mv = new graft.api.GraftClient(spark, mvRoot)
    mv.createCollection("fvmv", dim = denseDim, buckets = 16,
      vectorFields = Seq(graft.index.VecField("sp", 0, "dot",
        "SPARSE_INVERTED_INDEX", family = "SPARSE_FLOAT_VECTOR")))
    val mvUpsertSec = time {
      mv.upsert("fvmv", genSparse(n, "s").select(col("key"),
        col("dvec").as("vec"), col("sp"),
        typedLit(Map.empty[String, String]).as("meta")))
    }
    val mvBuildSec = time { mv.buildIndex("fvmv", nlist = 64, field = "sp") }
    def mvOnce(): Seq[String] =
      mv.searchSparse("fvmv", q, k = 10, field = "sp")
        .collect().map(_.getString(0)).toSeq
    mvOnce()
    var mvIds: Seq[String] = Nil
    val mvTopkSec = math.min(time { mvIds = mvOnce() }, time { mvIds = mvOnce() })
    val parity = mvIds == scIds

    // the prune claim: the field search's STORE scans read the map
    // column and never the dense primary floats
    val storeScans = mv.searchSparse("fvmv", q, k = 10, field = "sp")
      .queryExecution.executedPlan.toString
      .split("\n").filter(l => l.contains("ReadSchema") &&
        !l.contains("-fields/")).toSeq
    val pruned = !storeScans.exists(l =>
      l.contains("<vec:") || l.contains(",vec:"))

    // maintenance: a 1000-doc commit must roll the FIELD's postings
    // forward and leave them fresh (the auto-append measured at volume)
    val mvMaintSec = time {
      mv.upsert("fvmv", genSparse(1000, "m").select(col("key"),
        col("dvec").as("vec"), col("sp"),
        typedLit(Map.empty[String, String]).as("meta")))
    }
    val mvFresh = mv.listIndexes("fvmv").collect().exists(r =>
      r.getString(0) == "SPARSE_INVERTED_INDEX" &&
        r.getString(1) == "sp" && r.getBoolean(2))

    println(
      s"""{"metric":"fieldview_sparse","n":$n,"nnz":$sparseNnz,""" +
      s""""coll_upsert_sec":$scUpsertSec,"mv_upsert_sec":$mvUpsertSec,""" +
      s""""coll_build_sec":$scBuildSec,"field_build_sec":$mvBuildSec,""" +
      s""""coll_topk_sec":$scTopkSec,"field_topk_sec":$mvTopkSec,""" +
      s""""parity":$parity,"store_scan_pruned":$pruned,""" +
      s""""field_maint_commit_sec":$mvMaintSec,""" +
      s""""field_fresh_after_maint":$mvFresh}""")
    spark.stop()
  }
}
