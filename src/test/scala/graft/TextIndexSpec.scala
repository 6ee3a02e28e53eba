package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** At-rest postings index (TextIndex): score parity with the raw-text
  * BM25 plan, partition pruning to the query terms' buckets, and the
  * client's build/staleness contract (mirroring the IVF index's). */
class TextIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("text-index-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  private def docs = graft.core.Tables.t(spark, sf, "documents")

  test("postings bm25 equals the raw-text bm25 exactly") {
    val path = java.nio.file.Files.createTempDirectory("ti-parity").toString
    graft.index.TextIndex.build(docs, "doc_id", "text", path)
    for ((terms, k, k1, b) <- Seq(
        (Seq("join", "hash", "scan"), 15, 1.2, 0.75),
        (Seq("the", "query"), 40, 0.9, 0.4),
        (Seq("absent_term_zzz"), 10, 1.2, 0.75))) {
      val raw = graft.queries.TextQueries.bm25(docs, "doc_id", "text", terms, k, k1, b)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val idx = graft.index.TextIndex.bm25(spark, path, terms, k, k1, b)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(idx == raw, s"terms=$terms k=$k k1=$k1 b=$b")
    }
  }

  test("phrase mode: in-order adjacency on position lists, duplicate terms, append") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("ti-phrase").toString
    val corpus = Seq(
      (1L, "a b c"), (2L, "b a c"), (3L, "x a b"), (4L, "a b a"),
      (5L, "a a b a"), (6L, "b"), (7L, "a c b")).toDF("doc_id", "text")
    graft.index.TextIndex.build(corpus, "doc_id", "text", path)
    def ids(terms: Seq[String]): Set[Long] =
      graft.index.TextIndex.matchingDocs(spark, path, terms, "phrase")
        .collect().map(_.getLong(0)).toSet
    assert(ids(Seq("a", "b")) == Set(1L, 3L, 4L, 5L))
    assert(ids(Seq("b", "a")) == Set(2L, 4L, 5L), "order matters — not 'all'")
    assert(ids(Seq("a", "b", "a")) == Set(4L, 5L),
      "duplicate phrase terms need the SAME term at both offsets")
    assert(ids(Seq("a", "c")) == Set(2L, 7L))
    assert(ids(Seq("b")) == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      "a 1-term phrase is containment")
    assert(ids(Seq("zzz", "a")).isEmpty)
    // appended delta segments carry positions too
    graft.index.TextIndex.append(Seq((8L, "z a b")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    assert(ids(Seq("a", "b")) == Set(1L, 3L, 4L, 5L, 8L))
    // and a re-upsert retires the old version's positions
    graft.index.TextIndex.append(Seq((1L, "c b a")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    assert(ids(Seq("a", "b")) == Set(3L, 4L, 5L, 8L))
    assert(ids(Seq("b", "a")) == Set(1L, 2L, 4L, 5L))
  }

  test("phrase mode equals the raw whitespace-adjacency twin on the documents corpus") {
    val path = java.nio.file.Files.createTempDirectory("ti-phrase-par").toString
    graft.index.TextIndex.build(docs, "doc_id", "text", path)
    val idx = graft.index.TextIndex.matchingDocs(
        spark, path, Seq("hash", "join"), "phrase")
      .collect().map(_.getLong(0)).toSet
    val raw = docs.filter(concat(lit(" "), col("text"), lit(" "))
        .contains(" hash join "))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idx == raw && idx.nonEmpty,
      s"index phrase match must equal substring adjacency (idx=${idx.size}, raw=${raw.size})")
  }

  test("postings scan partition-prunes to the query terms' buckets") {
    val path = java.nio.file.Files.createTempDirectory("ti-prune").toString
    graft.index.TextIndex.build(docs, "doc_id", "text", path, buckets = 64)
    val q = graft.index.TextIndex.bm25(spark, path, Seq("join", "hash", "scan"))
    val plan = q.queryExecution.executedPlan.toString
    // the bucket filter must reach the scan as a PARTITION filter (dir
    // prune, not a post-read filter) and the term filter must be pushed
    // into parquet
    val scanLine = plan.linesIterator.find(l =>
      l.contains("FileScan") && l.contains("postings"))
    assert(scanLine.isDefined, s"no postings scan in plan:\n$plan")
    assert(scanLine.get.contains("PartitionFilters: [") &&
      scanLine.get.replaceAll(".*PartitionFilters", "").contains("bucket"),
      s"bucket prune missing from scan:\n${scanLine.get}")
    assert(scanLine.get.contains("In(term") || scanLine.get.contains("term#"),
      s"term filter not pushed:\n${scanLine.get}")
    // and the prune is real: the executed scan reads exactly the queried
    // terms' bucket dirs (the numPartitions metric), not all 64
    val wanted = Seq("join", "hash", "scan")
      .map(graft.index.TextIndex.termBucket(_, 64)).distinct.size
    q.collect()
    // AQE hides scans behind AdaptiveSparkPlanExec/QueryStageExec whose
    // inner plans are not `children` — walk them explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(q.queryExecution.executedPlan)
      .find(_.toString.contains("postings"))
      .getOrElse(fail(s"no postings FileSourceScanExec in:\n" +
        q.queryExecution.executedPlan))
    val nParts = scan.metrics("numPartitions").value
    assert(nParts == wanted,
      s"scan read $nParts bucket partitions, expected exactly $wanted of 64")
  }

  test("driver-side termBucket matches the executor-side partition expression") {
    import spark.implicits._
    val terms = Seq("join", "hash", "scan", "the", "zebra", "ünïcode", "", "a b")
    val fromSpark = terms.toDF("t")
      .select(col("t"), pmod(xxhash64(col("t")), lit(64L)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(graft.index.TextIndex.termBucket(t, 64) == fromSpark(t),
        s"bucket mismatch for term '$t'")
    }
  }

  test("rebuilds publish atomically: META names the generation, old ones are swept") {
    val path = java.nio.file.Files.createTempDirectory("ti-gen").toString
    val dir = java.nio.file.Paths.get(path)
    def gens(prefix: String): Set[String] = {
      val l = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith(prefix)).toSet
      } finally l.close()
    }
    val terms = Seq("join", "hash", "scan")
    graft.index.TextIndex.build(docs, "doc_id", "text", path)
    val expected = graft.index.TextIndex.bm25(spark, path, terms).collect().toSeq
    assert(gens("postings-").size == 1 && gens("stats-").size == 1)
    // a crash-stranded partial build: an unreferenced generation full of
    // garbage must neither be read (META doesn't name it) nor wedge
    java.nio.file.Files.createDirectories(dir.resolve("postings-deadbeef"))
    java.nio.file.Files.write(dir.resolve("postings-deadbeef/junk"),
      "not parquet".getBytes)
    assert(graft.index.TextIndex.bm25(spark, path, terms).collect().toSeq == expected,
      "an orphan generation must not affect reads of the live one")
    // rebuild: swaps META to a fresh generation, sweeps the superseded
    // one AND the stranded orphan
    val liveBefore = gens("postings-")
    graft.index.TextIndex.build(docs, "doc_id", "text", path)
    assert(graft.index.TextIndex.bm25(spark, path, terms).collect().toSeq == expected)
    val liveAfter = gens("postings-")
    assert(liveAfter.size == 1 && gens("stats-").size == 1,
      s"superseded generations must be swept, left: ${gens("postings-")} ${gens("stats-")}")
    assert((liveAfter & (liveBefore + "postings-deadbeef")).isEmpty,
      "the rebuild must publish a NEW generation and remove old + orphan dirs")
  }

  test("concurrent builds on one path serialize; the survivor generation is complete") {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val path = java.nio.file.Files.createTempDirectory("ti-conc").toString
    val terms = Seq("join", "hash", "scan")
    // unserialized, each build's sweep could delete the OTHER's in-flight
    // generation and then publish META pointing at a swept directory —
    // every later read would throw missing-path
    val builds = Seq(0, 1).map(_ => Future {
      graft.index.TextIndex.build(docs, "doc_id", "text", path)
    })
    builds.foreach(Await.result(_, 5.minutes))
    val expected = graft.queries.TextQueries.bm25(
      docs, "doc_id", "text", terms, 15, 1.2, 0.75).collect().toSeq
    assert(graft.index.TextIndex.bm25(spark, path, terms).collect().toSeq == expected,
      "after two concurrent builds the published generation must be complete")
  }

  test("client: searchLexical rides a fresh index, falls back when stale") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ti").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("tx", dim = 2)
    val keys = (0 until 50).map(i => s"k$i")
    client.upsert("tx", keys.map(k =>
        (k, Seq(1.0f, 0.0f), Map.empty[String, String])).toDF("key", "vec", "meta"))
    val corpus = keys.zipWithIndex.map { case (k, i) =>
      (k, if (i % 5 == 0) "special marker token plus filler" else s"plain filler text $i")
    }.toDF("key", "text")
    client.buildTextIndex("tx", corpus)
    // an EMPTY docs frame proves which path ran: the index path scores
    // from the at-rest postings (hits), the raw path from the frame (none)
    val empty = Seq.empty[(String, String)].toDF("key", "text")
    val viaIndex = client.searchLexical("tx", empty, Seq("marker"), k = 20)
    assert(viaIndex.count() == 10, "fresh index must serve from postings")
    // a write bumps the snapshot version → the index is stale → fallback
    client.upsert("tx", Seq(("k999", Seq(0.0f, 1.0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    assert(client.searchLexical("tx", empty, Seq("marker")).count() == 0,
      "stale index must NOT serve — the raw path scores the caller's frame")
    val viaRaw = client.searchLexical("tx", corpus, Seq("marker"), k = 20)
    assert(viaRaw.collect().map(_.getString(0)).toSet ==
      viaIndex.collect().map(_.getString(0)).toSet,
      "fallback scores must match the index's for the same corpus")
    // rebuilding restamps at the new version → fresh again
    client.buildTextIndex("tx", corpus)
    assert(client.searchLexical("tx", empty, Seq("marker")).count() == 10)
  }

  test("client: hybridSearch results are identical with and without the index") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ti-hy").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("hy", dim = 2)
    val rows = (0 until 40).map(i =>
      (s"k$i", Seq(i.toFloat / 40f, 1f - i.toFloat / 40f), Map.empty[String, String]))
    client.upsert("hy", rows.toDF("key", "vec", "meta"))
    val corpus = (0 until 40).map(i =>
      (s"k$i", s"document number $i ${if (i % 3 == 0) "needle" else "hay"}"))
      .toDF("key", "text")
    def run() = client.hybridSearch("hy", corpus, Seq("needle"), Array(0.1f, 0.9f))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    // filtered variant: candidates gated, corpus stats — must ALSO be
    // path-independent (the whole point of restrictTo over docs-slicing)
    val filt = col("key").isin((0 until 40 by 2).map(i => s"k$i"): _*)
    def runF() = client.hybridSearch("hy", corpus, Seq("needle"),
        Array(0.1f, 0.9f), filter = Some(filt))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    val before = run()
    val beforeF = runF()
    assert(before.nonEmpty && beforeF.nonEmpty)
    assert(beforeF.forall { case (key, _) => key.drop(1).toInt % 2 == 0 },
      s"filter must gate the fused results: $beforeF")
    client.buildTextIndex("hy", corpus)
    assert(run() == before,
      "riding the postings index must not change hybrid results")
    assert(runF() == beforeF,
      "riding the postings index must not change FILTERED hybrid results")
    // empty docs frame + fresh index: the filtered lexical arm must still
    // serve from postings — proof the filter no longer forces the raw path
    val empty = Seq.empty[(String, String)].toDF("key", "text")
    val lexF = client.searchLexical("hy", empty, Seq("needle"), k = 40,
      restrictTo = Some(corpus.filter(filt).select("key")))
    assert(lexF.count() > 0, "filtered lexical arm must ride the postings index")
    assert(lexF.collect().forall(_.getString(0).drop(1).toInt % 2 == 0))
  }

  test("client: drop removes the text index with the collection") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ti-drop").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("td", dim = 2)
    client.upsert("td", Seq(("a", Seq(1.0f, 0.0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    client.buildTextIndex("td", Seq(("a", "some text")).toDF("key", "text"))
    val tdir = client.describe("td").dataPath + "-text"
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(tdir)))
    client.drop("td")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tdir)),
      "drop must destroy the text index with the data")
  }

  // ---- incremental maintenance (segments + tombstones) ----

  private def corpusDoc(i: Int): String = {
    val sb = new StringBuilder
    sb.append("common filler words")
    if (i % 4 == 0) sb.append(" alpha")
    if (i % 7 == 0) sb.append(" beta beta")
    if (i == 13) sb.append(" unicorn") // df=1 term that edits will kill
    sb.append(s" unique$i")
    sb.toString
  }

  test("append equals a full rebuild over the merged corpus, exactly") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("ti-append").toString
    val base = (0 until 100).map(i => (i.toLong, corpusDoc(i))).toDF("doc_id", "text")
    graft.index.TextIndex.build(base, "doc_id", "text", path)
    // the delta: 10 NEW docs, 5 RE-UPSERTS with changed text (different
    // dlen; doc 13 loses its df=1 'unicorn' term entirely; doc 0 gains
    // 'gamma'), and 5 DELETES — every tombstone shape at once
    val delta = ((100 until 110).map(i => (i.toLong, corpusDoc(i))) ++ Seq(
      (0L, "common gamma gamma rewritten"),
      (4L, "alpha alpha alpha now dominant"),
      (13L, "no more rare term here"),
      (28L, "beta went away"),
      (96L, "short")
    )).toDF("doc_id", "text")
    val deleted = Seq(7L, 11L, 56L, 84L, 91L)
    graft.index.TextIndex.append(delta, "doc_id", "text", path,
      Some(deleted.toDF("doc_id")))
    assert(graft.index.TextIndex.segmentCount(path) == 2)
    // the merged corpus the index must now equal
    val deltaIds = Set(0L, 4L, 13L, 28L, 96L) ++ (100L until 110L)
    val merged = base.as[(Long, String)].collect()
      .filterNot(r => deltaIds(r._1) || deleted.contains(r._1))
      .toSeq ++ delta.as[(Long, String)].collect()
    val mergedDf = merged.toDF("doc_id", "text")
    // n_docs changed (105) and df of alpha/beta/unicorn/gamma all moved
    // — idf of EVERY term shifts, so parity here proves exact stats
    // maintenance, tombstone masking, and df-over-live-rows at once
    for (terms <- Seq(Seq("alpha"), Seq("beta", "gamma"), Seq("unicorn"),
        Seq("common", "unique5"), Seq("unique7"))) {
      val raw = graft.queries.TextQueries.bm25(mergedDf, "doc_id", "text",
          terms, 30).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val idx = graft.index.TextIndex.bm25(spark, path, terms, 30)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(idx == raw, s"terms=$terms: append diverged from rebuild\n" +
        s"idx=$idx\nraw=$raw")
    }
    // the deleted doc's unique term finds nothing
    assert(graft.index.TextIndex.bm25(spark, path, Seq("unique7")).count() == 0)
  }

  test("chained appends stay exact; compact folds them into one segment") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("ti-chain").toString
    var corpus = (0 until 60).map(i => (i.toLong, corpusDoc(i))).toMap
    graft.index.TextIndex.build(
      corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text", path)
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val newDocs = (0 until 5).map(j =>
        ((60 + round * 10 + j).toLong, s"round$round fresh doc$j common"))
      val rewrites = rnd.shuffle(corpus.keys.toSeq).take(4)
        .map(id => (id, s"rewritten in round $round common alpha"))
      val dels = rnd.shuffle((corpus.keys.toSet -- rewrites.map(_._1)).toSeq).take(3)
      corpus = corpus -- dels ++ newDocs ++ rewrites
      graft.index.TextIndex.append(
        (newDocs ++ rewrites).toDF("doc_id", "text"), "doc_id", "text", path,
        Some(dels.toDF("doc_id")))
      // a doc re-upserted in an EARLIER round and again later must keep
      // only the last version — chained-tombstone correctness
      val raw = graft.queries.TextQueries.bm25(corpus.toSeq.toDF("doc_id", "text"),
          "doc_id", "text", Seq("common", "alpha"), 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val idx = graft.index.TextIndex.bm25(spark, path,
          Seq("common", "alpha"), 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(idx == raw, s"round $round diverged")
    }
    assert(graft.index.TextIndex.segmentCount(path) == 4)
    val before = graft.index.TextIndex.bm25(spark, path, Seq("common"), 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    graft.index.TextIndex.compact(spark, path)
    assert(graft.index.TextIndex.segmentCount(path) == 1)
    val after = graft.index.TextIndex.bm25(spark, path, Seq("common"), 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "compaction changed results")
    // restrictTo still binds across the compacted layout
    val some = graft.index.TextIndex.bm25(spark, path, Seq("common"), 50,
      restrictTo = Some(corpus.keys.toSeq.filter(_ % 2 == 0).toDF("doc_id")))
    assert(some.collect().forall(_.getLong(0) % 2 == 0))
  }

  test("client: appendTextIndex keeps lexical search fresh; auto-compacts") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ti-app").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("ap", dim = 2)
    def vec = Seq(1.0f, 0.0f)
    client.upsert("ap", (0 until 20).map(i =>
      (s"k$i", vec, Map.empty[String, String])).toDF("key", "vec", "meta"))
    val corpus = (0 until 20).map(i => (s"k$i", s"doc $i payload"))
      .toDF("key", "text")
    client.buildTextIndex("ap", corpus)
    // a write makes the index stale...
    client.upsert("ap", Seq(("k20", vec, Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    val empty = Seq.empty[(String, String)].toDF("key", "text")
    assert(client.searchLexical("ap", empty, Seq("payload")).count() == 0,
      "stale after a write the index has not seen")
    // ...appendTextIndex covers it and re-stamps: fresh again, and the
    // new doc is searchable
    client.appendTextIndex("ap", Seq(("k20", "payload of the new doc"))
      .toDF("key", "text"))
    assert(client.searchLexical("ap", empty, Seq("payload"), k = 50).count() == 21,
      "append must re-stamp AND serve the delta")
    // deletes flow through too
    client.deleteByKeys("ap", Seq("k3"))
    client.appendTextIndex("ap", empty, deletedKeys = Seq("k3"))
    assert(client.searchLexical("ap", empty, Seq("payload"), k = 50).count() == 20)
    // compactAt bounds the segment list: the next append folds 3 -> 1
    val tdir = client.describe("ap").dataPath + "-text"
    assert(graft.index.TextIndex.segmentCount(tdir) == 3)
    client.upsert("ap", Seq(("k21", vec, Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    client.appendTextIndex("ap", Seq(("k21", "payload again"))
      .toDF("key", "text"), compactAt = 3)
    assert(graft.index.TextIndex.segmentCount(tdir) == 1,
      "crossing compactAt must fold the segment list")
    assert(client.searchLexical("ap", empty, Seq("payload"), k = 50).count() == 21)
  }

  test("client: tombstone-ratio trigger compacts a re-upsert-heavy index the count trigger misses") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ti-tomb").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("tb", dim = 2)
    def vec = Seq(1.0f, 0.0f)
    val n = 40
    client.upsert("tb", (0 until n).map(i =>
      (s"k$i", vec, Map.empty[String, String])).toDF("key", "vec", "meta"))
    client.buildTextIndex("tb", (0 until n).map(i =>
      (s"k$i", s"doc $i payload")).toDF("key", "text"))
    val tdir = client.describe("tb").dataPath + "-text"
    // a small re-upsert (25% dead) stays under the default ratio AND the
    // count trigger: 2 segments survive
    client.upsert("tb", (0 until 10).map(i =>
      (s"k$i", vec, Map.empty[String, String])).toDF("key", "vec", "meta"))
    client.appendTextIndex("tb", (0 until 10).map(i =>
      (s"k$i", s"doc $i payload revised")).toDF("key", "text"))
    assert(graft.index.TextIndex.segmentCount(tdir) == 2,
      "ratio 10/50 = 0.2 must not fire the default 0.5 trigger")
    // a mass re-upsert makes HALF the stored rows dead while the segment
    // count (3) stays far under compactAt=8 — only the ratio trigger can
    // see this; it must fold the index
    client.upsert("tb", (0 until n).map(i =>
      (s"k$i", vec, Map.empty[String, String])).toDF("key", "vec", "meta"))
    client.appendTextIndex("tb", (0 until n).map(i =>
      (s"k$i", s"doc $i payload final")).toDF("key", "text"),
      tombstoneRatioAt = 0.4)
    assert(graft.index.TextIndex.segmentCount(tdir) == 1,
      "50/90 dead rows must fire the 0.4 ratio trigger despite 3 < compactAt segments")
    // parity survives the fold: postings == raw-text scoring, exactly
    val corpus = (0 until n).map(i => (s"k$i", s"doc $i payload final"))
      .toDF("key", "text")
    val viaIdx = client.searchLexical("tb", corpus, Seq("payload", "final"), k = 50)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaRaw = client.searchLexical("tb", corpus, Seq("payload", "final"), k = 50,
      useIndex = false)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaIdx == viaRaw, "compacted postings must score bit-identically to raw")
  }

  test("client: segment count stays bounded under a sustained append churn loop") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ti-churn").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("ch", dim = 2)
    def vec = Seq(1.0f, 0.0f)
    val live = scala.collection.mutable.Map[String, String]()
    (0 until 5).foreach(i => live(s"k$i") = s"seed doc $i payload")
    client.upsert("ch", live.toSeq.map { case (k, _) =>
      (k, vec, Map.empty[String, String]) }.toDF("key", "vec", "meta"))
    client.buildTextIndex("ch", live.toSeq.toDF("key", "text"))
    val tdir = client.describe("ch").dataPath + "-text"
    // 12 rounds of mixed churn: one brand-new doc + one re-upsert per
    // round, maintenance with compactAt=3 — the segment list must stay
    // bounded (<= 4: it can reach compactAt+1 transiently inside the
    // round, the NEXT append folds it) for the whole run, never drift
    (0 until 12).foreach { i =>
      val delta = Seq(
        (s"n$i", s"new doc $i payload"),
        (s"k${i % 5}", s"seed doc ${i % 5} payload rev$i"))
      delta.foreach { case (k, t) => live(k) = t }
      client.upsert("ch", delta.map { case (k, _) =>
        (k, vec, Map.empty[String, String]) }.toDF("key", "vec", "meta"))
      client.appendTextIndex("ch", delta.toDF("key", "text"), compactAt = 3)
      val segs = graft.index.TextIndex.segmentCount(tdir)
      assert(segs <= 4, s"round $i: segment count $segs drifted past the bound")
    }
    // end state: fresh, and postings scoring == raw scoring bit-for-bit
    val corpus = live.toSeq.toDF("key", "text")
    val idxFrame = client.searchLexical("ch", corpus, Seq("payload", "doc"), k = 50)
    assert(idxFrame.queryExecution.executedPlan.toString.contains("postings-"),
      "the index path must actually be serving (fresh), or the parity check is vacuous")
    val viaIdx = idxFrame
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaRaw = client.searchLexical("ch", corpus, Seq("payload", "doc"), k = 50,
      useIndex = false)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaIdx == viaRaw,
      "after 12 churn rounds the postings path must score bit-identically to raw")
  }

  test("client: streaming ingest with maintainTextIndex keeps lexical search fresh") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ti-stream").toString
    val client = new graft.api.GraftClient(spark, root)
    val emb = graft.ingest.HashingEmbedder(16)
    client.createCollection("st", dim = 16)
    def landing(n: Int, events: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(root, s"landing$n", "events.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, events.mkString("\n").getBytes)
    }
    val empty = Seq.empty[(String, String)].toDF("key", "text")

    // batch 1 (no index yet — maintain is a no-op, nothing to append to)
    val objects1 = Seq(("a.txt", "alpha doc"), ("b.txt", "bravo doc"))
      .toDF("key", "text")
    landing(1, Seq(TestDirs.notif("ObjectCreated:Put", "a.txt"),
      TestDirs.notif("ObjectCreated:Put", "b.txt")))
    client.startIngest("st", s"$root/landing1", objects1, embedder = emb,
      maintainTextIndex = true).awaitTermination(120000)
    client.buildTextIndex("st", objects1)
    assert(client.searchLexical("st", empty, Seq("bravo")).count() == 1)

    // batch 2: new doc, delete, re-put with CHANGED text — the maintained
    // index must serve all three without a rebuild (empty docs frame
    // proves postings served, and the version stamp stayed fresh)
    val objects2 = Seq(("a.txt", "alpha rewritten now"), ("c.txt", "charlie doc"))
      .toDF("key", "text")
    landing(2, Seq(TestDirs.notif("ObjectCreated:Put", "c.txt"),
      TestDirs.notif("ObjectRemoved:Delete", "b.txt"),
      TestDirs.notif("ObjectCreated:Put", "a.txt")))
    client.startIngest("st", s"$root/landing2", objects2, embedder = emb,
      maintainTextIndex = true).awaitTermination(120000)
    assert(client.searchLexical("st", empty, Seq("charlie")).count() == 1,
      "new doc must be lexically searchable straight off the stream")
    assert(client.searchLexical("st", empty, Seq("bravo")).count() == 0,
      "deleted doc must leave the index")
    assert(client.searchLexical("st", empty, Seq("rewritten")).count() == 1 &&
      client.searchLexical("st", empty, Seq("doc")).count() == 1,
      "re-put doc must serve its NEW text only (old 'doc' token masked)")

    // a plain write the stream did not cover makes the index stale again
    // (the auto-maintain precondition refuses to paper over it)
    client.upsert("st", Seq(("d.txt", (1 to 16).map(_.toFloat), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    assert(client.searchLexical("st", empty, Seq("charlie")).count() == 0,
      "uncovered write must stale the index, not silently miss d.txt")

    // the batch path composes the same way: rebuild to fresh, then
    // upsertTexts(maintainTextIndex) both writes and appends
    val corpus3 = Seq(("a.txt", "alpha rewritten now"), ("c.txt", "charlie doc"),
      ("d.txt", "delta doc")).toDF("key", "text")
    client.buildTextIndex("st", corpus3)
    client.upsertTexts("st",
      Seq(("e.txt", "echo arrives", Map.empty[String, String]))
        .toDF("key", "text", "meta"),
      embedder = emb, maintainTextIndex = true)
    assert(client.searchLexical("st", empty, Seq("echo")).count() == 1,
      "upsertTexts(maintain) must leave the index fresh AND serving the delta")
  }
}
