package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.TrainingExport

/** The terminal LLM-pipeline step: filter → dedup → hash-shard → pack →
  * partitioned write. Tests pin the loader contract (no doc lost or
  * duplicated, pack start-offsets honor the budget, determinism across
  * runs) and the scale-relevant plan/layout properties (shard-partitioned
  * window, partition-pruned read-back). */
class TrainingExportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("training-export-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private val cfg = TrainingExport.Config(budgetTokens = 512, shards = 8)

  private def deleteRec(p: Path): Unit = TestDirs.deleteRec(p)

  test("every kept doc appears exactly once; dedup keeps the min doc_id") {
    val p = TrainingExport.packed(docs, cfg).cache()
    try {
      val ids = p.select("doc_id").collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length, "a doc was packed twice")
      // expected survivor set: windsorized by n_chars quantiles, then min
      // doc_id per content hash
      val bounds = docs.agg(
        expr("percentile(n_chars, 0.05)").as("lo"),
        expr("percentile(n_chars, 0.95)").as("hi")).collect()(0)
      val expected = docs
        .filter(col("n_chars").between(bounds.getDouble(0), bounds.getDouble(1)))
        .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.toSet == expected,
        "packed doc set must equal windsorized+deduped survivors")
    } finally p.unpersist()
  }

  test("pack assignment follows start offsets; packs overflow by at most one doc") {
    val rows = TrainingExport.packed(docs, cfg)
      .select("shard", "pack_id", "pos_in_pack", "doc_id", "n_tokens")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (shard, inShard) =>
      // reconstruct the shard's hash order exactly as packed() defines it
      val ordered = inShard.sortBy { case (_, pid, pos, _, _) => (pid, pos) }
      var cum = 0L
      ordered.foreach { case (_, packId, _, docId, nTok) =>
        val start = cum
        assert(start / cfg.budgetTokens == packId,
          s"shard $shard doc $docId: start $start maps to pack ${start / cfg.budgetTokens}, not $packId")
        cum += nTok
      }
      // within a pack, every doc's start is inside the budget window, so
      // total overflow is bounded by the LAST doc's tokens
      ordered.groupBy(_._2).foreach { case (packId, inPack) =>
        val total = inPack.map(_._5).sum
        val lastTokens = inPack.maxBy(_._3)._5
        assert(total - lastTokens < cfg.budgetTokens,
          s"shard $shard pack $packId: pre-last total ${total - lastTokens} exceeds budget")
      }
    }
  }

  test("packing is deterministic across independent runs") {
    val a = TrainingExport.packed(docs, cfg).collect().map(_.toString).sorted
    val b = TrainingExport.packed(docs, cfg).collect().map(_.toString).sorted
    assert(a.sameElements(b), "two runs over the same corpus must pack identically")
  }

  test("packing window is shard-partitioned, never a single global partition") {
    val plan = TrainingExport.packed(docs, cfg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"),
      s"pack window must shuffle by shard (parallel at scale), plan was:\n$plan")
  }

  test("run() writes shard-partitioned parquet; single-shard read prunes to one dir") {
    val out = Files.createTempDirectory("graft-export").toString
    try {
      val stats = TrainingExport.run(spark, docs, out, cfg)
      assert(stats.docsIn >= stats.docsAfterFilter)
      assert(stats.docsAfterFilter >= stats.docsKept)
      assert(stats.packs > 0 && stats.tokens > 0)
      val back = spark.read.parquet(out)
      assert(back.count() == stats.docsKept)
      // partition pruning: a shard=N filter must reach the scan as a
      // partition filter (inputFiles ignores filters, so inspect the plan)
      val pruned = back.filter(col("shard") === 3)
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("shard"),
        s"shard filter must prune at the partitioned scan:\n${scan.take(1500)}")
      assert(pruned.count() > 0, "shard 3 must be non-empty in this fixture")
      // and the packed content round-trips the in-memory assignment
      val mem = TrainingExport.packed(docs, cfg)
        .collect().map(_.toString).sorted
      val disk = back
        .select("shard", "pack_id", "pos_in_pack", "doc_id", "n_tokens", "text")
        .collect().map(_.toString).sorted
      assert(disk.sameElements(mem), "written packs must equal the computed assignment")
    } finally deleteRec(java.nio.file.Paths.get(out))
  }

  test("JSONL sharded sink round-trips the packed export; shard dirs prune") {
    val out = Files.createTempDirectory("graft-export-jsonl").toString
    try {
      val packed = TrainingExport.packed(docs, cfg)
      graft.sources.ObjectSources.writeJsonlSharded(packed, out)
      // gzip JSONL on disk, one dir per shard
      import scala.jdk.CollectionConverters._
      val shardDirs = java.nio.file.Files.list(java.nio.file.Paths.get(out))
        .iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("shard=")).toSeq
      assert(shardDirs.nonEmpty, "expected shard=N partition directories")
      val gz = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
        .iterator().asScala.count(_.getFileName.toString.endsWith(".json.gz"))
      assert(gz > 0, "expected gzip-compressed JSONL part files")
      // round-trip: same rows (shard comes back as the partition column)
      val back = spark.read.json(out)
      val mem = packed.select("shard", "pack_id", "doc_id", "n_tokens")
        .collect().map(_.toString).sorted
      val disk = back.select(col("shard").cast("string"), col("pack_id"),
          col("doc_id"), col("n_tokens"))
        .collect().map(_.toString).sorted
      assert(disk.sameElements(mem), "JSONL round-trip must preserve the assignment")
      // single-shard read prunes to that directory
      val pruned = back.filter(col("shard") === shardDirs.head.stripPrefix("shard="))
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("shard"),
        s"shard filter must prune at the partitioned JSON scan:\n${scan.take(1200)}")
    } finally deleteRec(java.nio.file.Paths.get(out))
  }

  test("approx-quantile windsorization (the 100 TB setting) matches exact on this corpus") {
    // default-accuracy approx_percentile is exact while the distinct
    // n_chars count is small, so the sketch path must reproduce the exact
    // path bit-for-bit here — the flip only trades memory/passes at scale
    val exact = TrainingExport.packed(docs, cfg)
      .select("shard", "pack_id", "pos_in_pack", "doc_id").collect().toSet
    val approx = TrainingExport.packed(docs, cfg.copy(approxQuantiles = true))
      .select("shard", "pack_id", "pos_in_pack", "doc_id").collect().toSet
    assert(approx == exact,
      "approx-quantile bounds must reproduce the exact windsorization on small distincts")
  }

  test("keep-list matching nothing exports zero packs, not a crash") {
    val out = Files.createTempDirectory("graft-export-empty").toString
    try {
      val stats = TrainingExport.run(spark, docs, out,
        cfg.copy(langs = Set("zz-no-such-lang")))
      assert(stats.docsIn > 0)
      assert(stats.docsAfterFilter == 0 && stats.docsKept == 0)
      assert(stats.packs == 0 && stats.tokens == 0)
    } finally deleteRec(java.nio.file.Paths.get(out))
  }

  test("blocklist stage excludes exactly the listed docs before packing") {
    import spark.implicits._
    val bl = spark.range(0, 500, 5).toDF("doc_id") // every 5th doc blocked
    val withBl = TrainingExport.packed(docs, cfg, Some(bl))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val manual = TrainingExport.packed(docs.filter(col("doc_id") % 5 =!= 0), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withBl == manual,
      "bloom-excluded export must equal packing the pre-filtered corpus")
    assert(withBl.forall(_ % 5 != 0))
    assert(withBl.nonEmpty)
  }

  test("lang keep-list restricts the corpus before packing") {
    val p = TrainingExport.packed(docs, cfg.copy(langs = Set("en", "de")))
    val langs = p.join(docs.select("doc_id", "lang"), "doc_id")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de")))
    assert(langs.nonEmpty)
  }

  test("df-capped contamination equals the exact query at a lossless cap") {
    val sf01 = "/root/testdata/sf0.01"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = rows(graft.queries.PipelineQueries.contaminationNgrams(spark, sf01))
    assert(exact.nonEmpty)
    val uncapped = rows(graft.queries.PipelineQueries
      .contaminationNgramsCapped(spark, sf01, dfCap = Int.MaxValue))
    assert(uncapped == exact, "uncapped candidate path must equal the declared query")
    // This fixture's gram-df distribution: 22.6k distinct 8-grams, df <= 3,
    // and every contaminated pair shares at least one df=2 gram — so the
    // lossless floor is 2, and cap 2 actually prunes (every df=3 gram, the
    // largest df_train*df_test terms of the join) while keeping all 6
    // pairs reachable. At a web corpus the capped grams are boilerplate
    // (license headers, chrome) — the standard decontamination drop.
    val capped = rows(graft.queries.PipelineQueries
      .contaminationNgramsCapped(spark, sf01, dfCap = 2))
    assert(capped == exact,
      "df-capped candidates must not lose any contaminated pair at a lossless cap")
  }
}
