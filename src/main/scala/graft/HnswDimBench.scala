package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The HNSW walk family at a CHOSEN dimension — the measurement VERDICT
  * r14 ranked #3: the r13/r14 1M walk numbers are dim-64 only (where the
  * unloaded walk ties or loses to the exact scan on iid data) and the
  * "walk's regime is higher dims" claim was extrapolated from the IVF
  * family's dim-384 behavior, not measured. This main runs EXACTLY the
  * VectorScaleBench HNSW protocol (same mix-based iid generator, same
  * arms, same min-of-two timing, same recall oracles) but ONLY the HNSW
  * family, so the reference text dimension (1M × 384) fits one
  * background run instead of a full multi-family sweep.
  *
  * Arms: plain walk (ef 64/256, unloaded + loaded) vs the exact scan;
  * FILTERED 1%-selectivity masked walk (unloaded + loaded) vs its
  * forceExact twin; GROUPED walk (fixed ef 64 + AUTO adaptive) vs its
  * forceExact twin with (group, key) pair recall.
  *
  * Run: `sbt "runMain graft.HnswDimBench [nRows] [dim] [geometry]"`
  * (default 1M × 384 iid; geometry `clustered` plants VectorScaleBench's
  * 64 well-separated blobs — the topic-cluster shape real corpora have,
  * and the favorable graph regime the iid control deliberately isn't).
  * Emits one JSON line; numbers recorded in BASELINE.md. */
object HnswDimBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(384)
    val geometry = args.drop(2).headOption.getOrElse("iid")
    require(geometry == "iid" || geometry == "clustered",
      s"geometry must be iid or clustered (got '$geometry')")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the same splitmix-style iid generator as VectorScaleBench's cvecs —
    // the honest control (iid is the bounded beam's adversarial geometry)
    def mix(z0: Long): Long = {
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
    // VectorScaleBench's 64 well-separated blobs (spread ±8, blob radius
    // ~0.9·√(dim/64)… jitter ±0.2/coord, inter-center ~√dim·4) — the
    // topic-cluster geometry real embedding corpora have
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
    def gen(rows: Long): DataFrame =
      if (geometry == "clustered") genBlobs(rows) else genRandom(rows)

    val scratch = scala.collection.mutable.ArrayBuffer.empty[String]
    def tmpDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      scratch += d
      d
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def dirBytes(d: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }

    val probeId = math.min(12345L, n - 1)
    val dataDir = tmpDir("graft-hnswdim")
    gen(n).write.mode("overwrite").parquet(s"$dataDir/cvecs")
    val cvecs = spark.read.parquet(s"$dataDir/cvecs")
    val cq = cvecs.filter(col("vec_id") === probeId).select("vec")
      .head().getSeq[Float](0).toArray

    // exact top-10 twin of the plain walk (the scan a FLAT collection —
    // or a stale graph — serves), warm + min-of-two like every arm
    var cExactIds: Seq[Long] = Nil
    def exactOnce(): Unit =
      cExactIds = cvecs
        .select(col("vec_id"), l2_distance(col("vec"), typedLit(cq)).as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSeq
    exactOnce()
    val exactSec = math.min(time(exactOnce()), time(exactOnce()))
    val exactStr = cExactIds.map(_.toString)

    val hnswRoot = tmpDir("graft-hnswdim-cli")
    val hnswClient = new graft.api.GraftClient(spark, hnswRoot)
    hnswClient.createCollection("benchhnsw", dim = dim, metric = "l2",
      indexType = "HNSW", buckets = 16, efConstruction = 100)
    val upsertT0 = System.nanoTime()
    hnswClient.upsert("benchhnsw", cvecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), map(lit("g"), pmod(col("vec_id"), lit(100L)).cast("string")).as("meta")))
    val upsertSec = (System.nanoTime() - upsertT0) / 1e9
    val hnswBuildT0 = System.nanoTime()
    hnswClient.buildIndex("benchhnsw", nlist = 0)
    val hnswBuildSec = (System.nanoTime() - hnswBuildT0) / 1e9
    val hnswBytes = dirBytes(s"$hnswRoot/data/benchhnsw-ivf/hnsw_graphs")
    val floatBytes = dirBytes(s"$hnswRoot/data/benchhnsw")

    def hnswOnce(e: Int): Seq[String] =
      hnswClient.search("benchhnsw", cq, k = 10, ef = e)
        .collect().map(_.getString(0)).toSeq
    hnswOnce(64)
    var hnswIds: Seq[String] = Nil
    val hnswSearchSec = math.min(
      time { hnswIds = hnswOnce(64) }, time { hnswIds = hnswOnce(64) })
    val hnswRecall64 = hnswIds.count(exactStr.contains).toDouble / exactStr.size
    val hnswRecall256 = hnswOnce(256).count(exactStr.contains).toDouble / exactStr.size
    val plainGraphPlan = hnswClient.search("benchhnsw", cq, k = 10, ef = 64)
      .queryExecution.executedPlan.toString.contains("MapPartitions")
    hnswClient.loadCollection("benchhnsw")
    hnswOnce(64)
    val hnswLoadedSec = math.min(time(hnswOnce(64)), time(hnswOnce(64)))
    hnswClient.releaseCollection("benchhnsw")

    // FILTERED: 1%-selectivity masked walk vs its forceExact twin
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
    hnswClient.loadCollection("benchhnsw")
    hnswFilteredOnce()
    var hfLoadedIds: Seq[String] = Nil
    val hnswFilteredLoadedSec = math.min(
      time { hfLoadedIds = hnswFilteredOnce() },
      time { hfLoadedIds = hnswFilteredOnce() })
    val hfLoadedRecall = hfLoadedIds.count(hfExactIds.contains).toDouble /
      math.max(hfExactIds.size, 1)
    hnswClient.releaseCollection("benchhnsw")

    // GROUPED: walk (fixed ef + AUTO) vs forceExact, (group, key) pairs
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

    val loadavg =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim.split(" ").take(3)
        .mkString("[", ",", "]")
      catch { case _: Throwable => "[]" }

    println(
      s"""{"bench":"hnsw_dim","n":$n,"dim":$dim,"geometry":"$geometry",""" +
      s""""exact_scan_sec":$exactSec,""" +
      s""""upsert_sec":$upsertSec,"build_sec":$hnswBuildSec,""" +
      s""""graph_bytes":$hnswBytes,"float_bytes":$floatBytes,""" +
      s""""walk_ef64_sec":$hnswSearchSec,"walk_ef64_loaded_sec":$hnswLoadedSec,""" +
      s""""recall_ef64":$hnswRecall64,"recall_ef256":$hnswRecall256,""" +
      s""""plain_graph_plan":$plainGraphPlan,""" +
      s""""filtered_walk_sec":$hnswFilteredSec,""" +
      s""""filtered_walk_loaded_sec":$hnswFilteredLoadedSec,""" +
      s""""filtered_exact_sec":$hnswFilteredExactSec,""" +
      s""""filtered_recall":$hfRecall,"filtered_loaded_recall":$hfLoadedRecall,""" +
      s""""filtered_graph_plan":$hfGraphPlan,""" +
      s""""grouped_walk_sec":$hnswGroupedSec,"grouped_auto_sec":$hnswGroupedAutoSec,""" +
      s""""grouped_exact_sec":$hnswGroupedExactSec,""" +
      s""""grouped_pair_recall":$hgRecall,"grouped_auto_pair_recall":$hgAutoRecall,""" +
      s""""grouped_graph_plan":$hgGraphPlan,""" +
      s""""loadavg":$loadavg}""")

    scratch.foreach(d => graft.streaming.BucketedKeyedCollection.deleteTree(
      java.nio.file.Paths.get(d)))
    spark.stop()
  }
}
