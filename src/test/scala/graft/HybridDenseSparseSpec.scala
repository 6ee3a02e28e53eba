package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftClient
import graft.index.SparseIndex

/** Milvus multi-vector `hybrid_search` parity: the dense collection arm
  * fused with an at-rest sparse-index arm ([[GraftClient
  * .hybridDenseSparse]]). Fixtures are built so every rank — and every
  * fused score — is hand-computable: dense distances 1..6 rank k0 best,
  * sparse scores 1..6 rank k5 best (the arms exactly oppose). */
class HybridDenseSparseSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def fixture(): (GraftClient, String) = {
    import spark.implicits._
    val c = new GraftClient(spark,
      java.nio.file.Files.createTempDirectory("graft-hds").toString)
    c.createCollection("hc", dim = 2)
    c.upsert("hc", (0 until 6).map(i =>
        (s"k$i", Seq((i + 1).toFloat, 0f),
          Map("grp" -> (if (i == 5) "b" else "a"))))
      .toDF("key", "vec", "meta"))
    val sdir = java.nio.file.Files.createTempDirectory("graft-hds-sp").toString
    SparseIndex.build((0 until 6).map(i => (s"k$i", 1L, (i + 1).toDouble))
      .toDF("key", "dim", "w"), sdir, buckets = 4, idCol = "key")
    (c, sdir)
  }
  private val q = Array(0f, 0f)
  private val sq = Seq((1L, 1.0))

  test("rrf: opposing arms fuse to the hand-computed interleave") {
    val (c, sdir) = fixture()
    // sp_rank(ki) = 6-i, vec_rank(ki) = i+1 ⇒ rrf symmetric pairs:
    // {k0,k5} > {k1,k4} > {k2,k3}, ties break on key
    val out = c.hybridDenseSparse("hc", sdir, sq, q, k = 6)
    assert(out.select("key").collect().map(_.getString(0)).toSeq ==
      Seq("k0", "k5", "k1", "k4", "k2", "k3"))
  }

  test("filter binds both arms (and the sparse arm re-ranks without the gated doc)") {
    val (c, sdir) = fixture()
    val f = element_at(col("meta"), lit("grp")) === "a"
    val out = c.hybridDenseSparse("hc", sdir, sq, q, k = 6, filter = Some(f))
      .select("key").collect().map(_.getString(0)).toSeq
    // k5 gone from BOTH arms; remaining ranks: sp k4=1..k0=5, vec k0=1..k4=5
    assert(out == Seq("k0", "k4", "k1", "k3", "k2"))
  }

  test("weighted: opposing min-max arms cancel to exactly 0.5 each") {
    val (c, sdir) = fixture()
    // vec_norm(ki) = (5-i)/5, sp_norm(ki) = i/5 ⇒ 0.5·sum = 0.5 for all —
    // the normalization is pinned exactly, ties order by key
    val rows = c.hybridDenseSparse("hc", sdir, sq, q, k = 6,
      fusion = "weighted", wVec = 0.5, wSparse = 0.5).collect()
    assert(rows.map(_.getString(0)).toSeq == (0 until 6).map(i => s"k$i"))
    rows.foreach(r => assert(r.getDouble(3) == 0.5))
  }

  test("filter gate covers non-default partitions") {
    import spark.implicits._
    val (c, sdir) = fixture()
    // k9 lives in partition p2 (grp a) and is the best BOTH arms' hit —
    // a default-store-only gate would silently drop it from the sparse arm
    c.createPartition("hc", "p2")
    c.upsert("hc", Seq(("k9", Seq(0.5f, 0f), Map("grp" -> "a")))
      .toDF("key", "vec", "meta"), partition = "p2")
    SparseIndex.build((0 until 6).map(i => (s"k$i", 1L, (i + 1).toDouble))
      .toDF("key", "dim", "w")
      .union(Seq(("k9", 1L, 9.0)).toDF("key", "dim", "w")), sdir,
      buckets = 4, idCol = "key")
    val out = c.hybridDenseSparse("hc", sdir, sq, q, k = 7,
      filter = Some(element_at(col("meta"), lit("grp")) === "a"))
    val k9 = out.filter(col("key") === "k9").collect()
    assert(k9.length == 1, "k9 (partition p2) must survive the filter gate")
    assert(!k9.head.isNullAt(1), "k9 must appear in the SPARSE arm (sp_rank)")
    assert(k9.head.getLong(1) == 1L, "k9 has the top sparse score")
    assert(!out.select("key").collect().map(_.getString(0)).contains("k5"))
  }

  test("cosine sparse arm and boundary validation") {
    val (c, sdir) = fixture()
    // cosine: all docs have a single dim ⇒ all cosines 1.0 ⇒ sparse arm
    // ties everywhere (rank = key order); dense arm dominates the fuse
    val out = c.hybridDenseSparse("hc", sdir, sq, q, k = 3,
      sparseMetric = "cosine")
    assert(out.select("key").collect().map(_.getString(0)).head == "k0")
    assertThrows[IllegalArgumentException](
      c.hybridDenseSparse("hc", sdir, sq, q, fusion = "nope"))
    assertThrows[IllegalArgumentException](
      c.hybridDenseSparse("hc", sdir, sq, q, fusion = "weighted",
        wVec = 0.0, wSparse = 0.0))
  }

  test("attached sparse index: lifecycle, freshness gate, delete cannot resurrect") {
    import spark.implicits._
    val (c, _) = fixture()
    // no attached index yet → loud, names the build call
    val none = intercept[IllegalArgumentException](
      c.hybridDenseSparse("hc", sparseQuery = sq, qvec = q, k = 6))
    assert(none.getMessage.contains("buildSparseIndex"))
    c.buildSparseIndex("hc", (0 until 6).map(i =>
      (s"k$i", 1L, (i + 1).toDouble)).toDF("key", "dim", "w"), buckets = 4)
    assert(c.listIndexes("hc").collect().exists(r =>
      r.getString(0) == "SPARSE" && r.getBoolean(2)))
    // attached mode == the caller-managed mode on the same postings
    val out = c.hybridDenseSparse("hc", sparseQuery = sq, qvec = q, k = 6)
      .select("key").collect().map(_.getString(0)).toSeq
    assert(out == Seq("k0", "k5", "k1", "k4", "k2", "k3"))
    // a commit stales it: hard error (no sparse vectors to fall back to)
    c.upsert("hc", Seq(("k6", Seq(9f, 0f), Map("grp" -> "a")))
      .toDF("key", "vec", "meta"))
    val stale = intercept[IllegalArgumentException](
      c.hybridDenseSparse("hc", sparseQuery = sq, qvec = q, k = 6))
    assert(stale.getMessage.contains("STALE"))
    assert(c.listIndexes("hc").collect().exists(r =>
      r.getString(0) == "SPARSE" && !r.getBoolean(2)))
    // delta append covers the commit → fresh again, new key ranks
    c.appendSparseIndex("hc", Seq(("k6", 1L, 9.0)).toDF("key", "dim", "w"))
    val withNew = c.hybridDenseSparse("hc", sparseQuery = sq, qvec = q, k = 7)
      .select("key").collect().map(_.getString(0)).toSeq
    assert(withNew.contains("k6"))
    // delete + append(deletedKeys): the dead key must vanish from the
    // sparse arm too — a stale arm would resurrect it in the fusion
    c.deleteByKeys("hc", Seq("k5"))
    c.appendSparseIndex("hc", spark.emptyDataFrame
        .select(lit("").as("key"), lit(0L).as("dim"), lit(0.0).as("w"))
        .limit(0),
      deletedKeys = Some(Seq("k5").toDF("key")))
    val afterDel = c.hybridDenseSparse("hc", sparseQuery = sq, qvec = q, k = 7)
      .select("key").collect().map(_.getString(0)).toSeq
    assert(!afterDel.contains("k5"),
      s"deleted key resurrected through the sparse arm: $afterDel")
    // drop destroys the attached layout with the collection
    val dir = c.describe("hc").dataPath + "-sparse"
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
    c.drop("hc")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
  }

  test("searchSparse: single-field sparse search with filter gate and freshness") {
    import spark.implicits._
    val (c, _) = fixture()
    c.buildSparseIndex("hc", (0 until 6).map(i =>
      (s"k$i", 1L, (i + 1).toDouble)).toDF("key", "dim", "w"), buckets = 4)
    // scores 1..6 ⇒ k5 best; pure sparse ranking, no dense arm
    val top = c.searchSparse("hc", sq, k = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(top == Seq(("k5", 6.0), ("k4", 5.0), ("k3", 4.0)))
    // filter gates candidates: grp=b keeps only k5... so exclude it
    val gated = c.searchSparse("hc", sq, k = 3,
      filter = Some(element_at(col("meta"), lit("grp")) === "a"))
      .collect().map(_.getString(0)).toSeq
    assert(gated == Seq("k4", "k3", "k2"))
    // a SELECTIVE filter must deepen, not short-return: k0 is the
    // WORST sparse hit (rank 6), outside the first k*4 = 4 pool — the
    // fetch must widen until the survivor surfaces
    val deep = c.searchSparse("hc", sq, k = 1,
      filter = Some(col("key") === "k0"))
      .collect().map(_.getString(0)).toSeq
    assert(deep == Seq("k0"),
      s"selective filter must deepen past the first pool, got $deep")
    // staleness is a hard error, recovery re-opens the surface
    c.deleteByKeys("hc", Seq("k5"))
    intercept[IllegalArgumentException](c.searchSparse("hc", sq, k = 3))
    c.appendSparseIndex("hc",
      Seq.empty[(String, Long, Double)].toDF("key", "dim", "w"),
      deletedKeys = Some(Seq("k5").toDF("key")))
    assert(c.searchSparse("hc", sq, k = 3).collect().map(_.getString(0)).toSeq ==
      Seq("k4", "k3", "k2"))
  }

  test("attached sparse index refuses partitioned collections") {
    import spark.implicits._
    val c = new GraftClient(spark,
      java.nio.file.Files.createTempDirectory("graft-hds-pk").toString)
    c.createCollection("pkc", dim = 2, partitionKey = "t", numPartitions = 2)
    val e = intercept[IllegalArgumentException](
      c.buildSparseIndex("pkc", Seq(("k0", 1L, 1.0)).toDF("key", "dim", "w")))
    assert(e.getMessage.contains("sparseDir"))
  }

  test("a partition created AFTER buildSparseIndex closes the attached surface") {
    import spark.implicits._
    val c = new GraftClient(spark,
      java.nio.file.Files.createTempDirectory("graft-hds-late").toString)
    c.createCollection("lp", dim = 2)
    c.upsert("lp", Seq(("k0", Seq(1f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    c.buildSparseIndex("lp", Seq(("k0", 1L, 1.0)).toDF("key", "dim", "w"))
    assert(c.searchSparse("lp", Seq((1L, 1.0)), k = 1).count() == 1)
    // the new partition has its OWN snapshot clock — rows landing there
    // would pass a default-store-only freshness check the index never
    // covered, so the gate must close, naming the escape hatch
    c.createPartition("lp", "p2")
    c.upsert("lp", Seq(("z", Seq(2f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"), partition = "p2")
    val e = intercept[IllegalArgumentException](
      c.searchSparse("lp", Seq((1L, 1.0)), k = 1))
    assert(e.getMessage.contains("sparseDir"), s"got: ${e.getMessage}")
    intercept[IllegalArgumentException](
      c.hybridDenseSparse("lp", sparseQuery = Seq((1L, 1.0)),
        qvec = Array(0f, 0f), k = 1))
  }
}
