package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** load_collection at volume — the measured counterpart of LoadSpec:
  * a FLAT collection searched repeatedly cold (every search re-reads
  * and re-decodes parquet) vs loaded (every search scans the persisted
  * columnar frames), plus the one-time load cost itself.
  *
  * FLAT deliberately: the exact-scan path reads the store through
  * `readPaths`, which is where the cache sits; an IVF-pruned search
  * reads the index's own cell layout and is already its own at-rest
  * accelerator — load is the hot-collection lever for the paths that
  * scan the STORE (exact KNN, filtered reads, fetch, exports). What the
  * numbers must show (recorded in BASELINE.md):
  *   - loaded steady-state search beats cold search (the win is the
  *     parquet re-read+decode each cold search pays);
  *   - results are IDENTICAL loaded vs cold (asserted key-for-key);
  *   - a post-load commit is visible immediately and re-warms lazily
  *     (the first post-commit search pays one scan, the next is
  *     memory-resident again).
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.LoadScaleBench 500000"
  */
object LoadScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val dim = 64
    val iters = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def s2(d: Double) = String.format(Locale.ROOT, "%.2f", Double.box(d))

    val root = java.nio.file.Files.createTempDirectory("graft-load-bench").toString
    val client = new GraftClient(spark, root)
    client.createCollection("hot", dim = dim, buckets = 64)
    // deterministic corpus: vec[j] = hash-ish of (i, j), no RNG needed
    val rows = spark.range(n).select(
      concat(lit("k"), col("id")).as("key"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(col("id"), j), lit(1000L)) / lit(1000.0)).cast("float"))
        .as("vec"),
      map(lit("grp"), pmod(col("id"), lit(100L)).cast("string")).as("meta"))
    client.upsert("hot", rows)
    val q = Array.fill(dim)(0.5f)

    def search(): Seq[String] =
      client.search("hot", q, k = 10).collect().map(_.getString(0)).toSeq

    search() // JIT + codegen warm for both arms
    val (cold0, coldTimes) = {
      val first = search()
      val ts = (1 to iters).map(_ => timed(search())._2)
      (first, ts)
    }
    val (loadedRows, loadSec) = timed(client.loadCollection("hot"))
    val warmTimes = {
      val first = search()
      assert(first == cold0, "loaded search must match cold search key-for-key")
      (1 to iters).map(_ => timed(search())._2)
    }
    // post-load commit: visible immediately, steady state re-warms
    client.upsert("hot", Seq(("fresh", Seq.fill(dim)(0.5f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    val (afterCommit, firstAfterSec) = timed(search())
    assert(afterCommit.head == "fresh",
      s"post-load commit must be visible (got ${afterCommit.head})")
    val (_, steadyAfterSec) = timed(search())
    client.releaseCollection("hot")

    // IVF arm: load pins the INDEX layout (the cells read is what an
    // indexed search pays per query — nprobe-pruned, so the win is the
    // listing+decode of the probed cells, smaller than the FLAT gap but
    // the common production shape)
    client.createCollection("hoti", dim = dim, buckets = 64,
      indexType = "IVF_FLAT", nlist = 64)
    client.upsert("hoti", rows)
    client.buildIndex("hoti", nlist = 64)
    def searchIvf(): Seq[String] =
      client.search("hoti", q, k = 10, nprobe = 8).collect()
        .map(_.getString(0)).toSeq
    searchIvf()
    val ivfCold = (1 to iters).map(_ => timed(searchIvf())._2)
    val (_, ivfLoadSec) = timed(client.loadCollection("hoti"))
    val ivf0 = searchIvf()
    val ivfWarm = (1 to iters).map(_ => timed(searchIvf())._2)
    assert(searchIvf() == ivf0, "loaded IVF search must be stable")
    client.releaseCollection("hoti")

    def med(ts: Seq[Double]) = ts.sorted.apply(ts.size / 2)
    println(s"""{"metric":"load_speedup","value":${s2(med(coldTimes) / med(warmTimes))},""" +
      s""""unit":"x","n":$n,"dim":$dim,"loaded_rows":$loadedRows,""" +
      s""""cold_search_sec":${s2(med(coldTimes))},"loaded_search_sec":${s2(med(warmTimes))},""" +
      s""""load_sec":${s2(loadSec)},"first_search_after_commit_sec":${s2(firstAfterSec)},""" +
      s""""steady_search_after_commit_sec":${s2(steadyAfterSec)},""" +
      s""""ivf_cold_search_sec":${s2(med(ivfCold))},"ivf_loaded_search_sec":${s2(med(ivfWarm))},""" +
      s""""ivf_load_sec":${s2(ivfLoadSec)}}""")
    graft.streaming.BucketedKeyedCollection.deleteTree(
      java.nio.file.Paths.get(root))
    spark.stop()
  }
}
