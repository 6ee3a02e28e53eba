package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** Scalar (metadata) index at volume — the measured counterpart of
  * ScalarIndexSpec's correctness checks: a 1M-row collection with three
  * selectivity tiers on `meta['source']` (200-row rare value, 20k-row mid
  * value, 50 common values covering the rest), comparing filtered reads
  * before and after `createScalarIndex`.
  *
  * What the numbers must show (recorded in BASELINE.md):
  *   - the index is a POINT-LOOKUP accelerator, and the bench measures
  *     both sides of that honestly. Keys hash uniformly across buckets,
  *     so a value with r rows fans out to ~min(r, buckets) buckets and
  *     the prune factor is ~min(r, buckets)/buckets: a unique value
  *     (the reference's own `delete(filter = url == ...)` shape —
  *     `milvus-app/pythonvectordbceph_milvus.py:108-111`) reads ONE
  *     bucket, an absent value reads ZERO (proof of absence from the
  *     index alone), while a 20k-row tier value fans out to every
  *     bucket and the prune buys nothing — the fan-out wall
  *     `scalarIndexStats` exists to surface. Bytes ground truth from
  *     the pruned plan's inputFiles vs the store's on-disk size;
  *   - per-commit maintenance cost is bounded by the commit's own rows;
  *   - results are IDENTICAL pruned vs full (asserted, not assumed).
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScalarScaleBench 1000000"
  */
object ScalarScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    // bucket count is THE prune-fraction knob (a value with r rows reads
    // ~min(r, buckets)/buckets of the store): 64 = the default-config
    // regime, 1024+ = cluster-scale configs where mid-selectivity values
    // prune too
    val buckets = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def fileBytes(df: org.apache.spark.sql.DataFrame): Long =
      df.inputFiles.map(f => java.nio.file.Files.size(
        java.nio.file.Paths.get(f.stripPrefix("file:")))).sum
    def dirBytes(dir: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }

    val root = java.nio.file.Files.createTempDirectory("scalar-bench").toString
    val client = new GraftClient(spark, root)
    client.createCollection("sb", dim = 8, buckets = buckets)

    val src = when(col("id") < 200, "rare")
      .when(col("id") < 20200, "mid")
      .otherwise(concat(lit("common-"), pmod(col("id"), lit(50)).cast("string")))
    def rows(ids: org.apache.spark.sql.DataFrame) = ids.select(
      concat(lit("k"), col("id")).as("key"),
      transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64(col("id"), i), lit(1000L)) / 500.0 - 1.0)
          .cast("float")).as("vec"),
      map(lit("source"), src,
          lit("url"), concat(lit("u"), col("id"))).as("meta"))

    val (_, loadSec) = timed(client.upsert("sb", rows(spark.range(n).toDF("id"))))
    val storeBytes = dirBytes(client.describe("sb").dataPath)

    def q(value: String) = client.queryWhere("sb",
      element_at(col("meta"), lit("source")) === value)
    def qUrl(value: String) = client.queryWhere("sb",
      element_at(col("meta"), lit("url")) === value)

    // ---- before the index: every filtered read scans the whole store ----
    val (rareFull, rareFullSec) = timed(q("rare").count())
    val (urlFullCnt, urlFullSec) = timed(qUrl("u777777").count())
    require(urlFullCnt == 1L, s"url point lookup found $urlFullCnt rows")
    // maintenance baseline: two small commits with NO scalar index (min
    // of two — the first pays cold-cache costs)
    val (_, smallCommitA) = timed(
      client.upsert("sb", rows(spark.range(n, n + 1000).toDF("id"))))
    val (_, smallCommitB) = timed(
      client.upsert("sb", rows(spark.range(n + 1000, n + 2000).toDF("id"))))
    val smallCommitSec = math.min(smallCommitA, smallCommitB)

    // ---- build (source: 52 values; url: 1M+ distinct — the point index) ----
    val (_, buildSec) = timed {
      client.createScalarIndex("sb", "source")
      client.createScalarIndex("sb", "url")
    }
    val indexBytes = dirBytes(s"${client.describe("sb").dataPath}-scalar")

    // ---- after: directory-level prune, identical answers ----
    def run(value: String, expect: Long): (Double, Long) = {
      val df = q(value)
      val (c, sec) = timed(df.count())
      require(c == expect, s"pruned count for '$value' = $c, expected $expect")
      (sec, fileBytes(df))
    }
    // ids ≡ 7 (mod 50) in [lo, hi) — the small maintenance commit above
    // added rows past n that also land in the common tiers
    def mod7(lo: Long, hi: Long): Long = {
      val first = lo + ((7 - lo % 50 + 50) % 50)
      if (first >= hi) 0L else (hi - 1 - first) / 50 + 1
    }
    val (rareSec, rareBytes) = run("rare", rareFull)
    val (_, midBytes) = run("mid", 20000L)
    val (_, commonBytes) = run("common-7", mod7(20200, n + 2000))

    // the reference's own predicate shape: unique-url point lookup → ONE
    // bucket; absent url → ZERO buckets (absence proven by the index)
    val urlPoint = qUrl("u777777")
    val (urlPointCnt, urlPointSec) = timed(urlPoint.count())
    require(urlPointCnt == 1L, s"pruned url point lookup found $urlPointCnt")
    val urlPointBytes = fileBytes(urlPoint)
    val absent = qUrl("u-never")
    val (absentCnt, absentSec) = timed(absent.count())
    require(absentCnt == 0L, s"absent url matched $absentCnt")
    val absentBytes = fileBytes(absent)

    // maintenance tax: two same-shaped small commits, BOTH field indexes
    // now auto-maintained per commit (min of two, like the baseline)
    val (_, idxA) = timed(
      client.upsert("sb", rows(spark.range(n + 2000, n + 3000).toDF("id"))))
    val (_, idxB) = timed(
      client.upsert("sb", rows(spark.range(n + 3000, n + 4000).toDF("id"))))
    val smallCommitIdxSec = math.min(idxA, idxB)
    // the indexes rolled forward through those commits: still pruning, fresh
    val (checkSec, _) = run("rare", rareFull)

    println(String.format(Locale.ROOT,
      """{"metric":"scalar_index_1m","n":%d,"buckets":""" + buckets +
        ""","load_sec":%.2f,"store_mb":%.1f,""" +
        """"index_mb":%.2f,"build_sec":%.2f,""" +
        """"url_point_full_sec":%.3f,"url_point_pruned_sec":%.3f,""" +
        """"url_point_bytes_frac":%.5f,""" +
        """"url_absent_sec":%.3f,"url_absent_bytes":%d,""" +
        """"rare_full_sec":%.3f,"rare_pruned_sec":%.3f,"rare_bytes_frac":%.5f,""" +
        """"mid_bytes_frac":%.5f,"common_bytes_frac":%.5f,""" +
        """"small_commit_sec":%.3f,"small_commit_indexed_sec":%.3f,""" +
        """"post_commit_pruned_sec":%.3f}""",
      Long.box(n), Double.box(loadSec), Double.box(storeBytes / 1e6),
      Double.box(indexBytes / 1e6), Double.box(buildSec),
      Double.box(urlFullSec), Double.box(urlPointSec),
      Double.box(urlPointBytes.toDouble / storeBytes),
      Double.box(absentSec), Long.box(absentBytes),
      Double.box(rareFullSec), Double.box(rareSec),
      Double.box(rareBytes.toDouble / storeBytes),
      Double.box(midBytes.toDouble / storeBytes),
      Double.box(commonBytes.toDouble / storeBytes),
      Double.box(smallCommitSec), Double.box(smallCommitIdxSec),
      Double.box(checkSec)))
    spark.stop()
  }
}
