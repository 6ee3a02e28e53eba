package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** The HNSW growing tail: commits below the fold threshold must cost no
  * graph I/O yet keep searches index-served AND exact (graph arm over
  * seq <= S_b plus an exact tail arm partition the live set), the fold
  * must trigger at the ratio and on compact(), and stale graph copies of
  * moved keys must never rank. */
class HnswTailSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("hnsw-tail-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dim = 8

  private def vec(i: Int): Seq[Float] =
    Seq.tabulate(dim)(j => (((i * 37 + j * 11) % 97) / 97.0f) + (i % 4) * 3.0f)

  private def rows(is: Range) =
    is.map(i => (f"k$i%04d", vec(i), Map("i" -> i.toString)))

  private def mk(n: Int): (GraftClient, String) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("hnsw-tail").toString
    val c = new GraftClient(spark, root)
    c.createCollection("t", dim = dim, indexType = "HNSW", buckets = 4)
    c.upsert("t", rows(0 until n).toDF("key", "vec", "meta"))
    c.buildIndex("t", nlist = 0)
    (c, "t")
  }

  private def exactKeys(c: GraftClient, name: String, q: Array[Float],
                        k: Int): Seq[String] = {
    import spark.implicits._
    c.searchBatch(name, Seq((0L, q.toSeq)).toDF("qid", "qvec"), k,
        forceExact = true)
      .orderBy(col("distance"), col("vector_key"))
      .collect().map(_.getString(1)).toSeq
  }

  private def hnswRow(c: GraftClient, name: String): (Boolean, Long, Long) = {
    val r = c.listIndexes(name).filter(col("kind") === "HNSW").collect()(0)
    (r.getBoolean(2), r.getLong(3), r.getLong(4))
  }

  test("sub-threshold commits: O(1) maintenance, index-served, exact") {
    import spark.implicits._
    val (c, n) = mk(400)
    val q = vec(11).toArray
    // three small commits: new keys, an overwrite that MOVES a key far
    // away, and deletes — all below 20% of 400 graph rows in total
    c.upsert(n, rows(400 until 420).toDF("key", "vec", "meta"))
    c.upsert(n, Seq(("k0011", vec(11).map(_ + 500f), Map("i" -> "moved")))
      .toDF("key", "vec", "meta"))
    c.deleteByKeys(n, Seq("k0002", "k0404"))
    // servable across commits; the stamp stays at the BUILD version —
    // the growing tail, not a rebuild, carries the delta
    val (fresh, stamped, current) = hnswRow(c, n)
    assert(fresh, "tail-era HNSW must stay fresh across commits")
    assert(stamped < current,
      s"stamp $stamped must lag current $current — no per-commit rebuild")
    val df = c.search(n, q, k = 10, ef = 500, refine = 50)
    assert(df.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "search must still ride the graph scatter-gather")
    val got = df.collect().map(_.getString(0)).toSeq
    val want = exactKeys(c, n, q, 10)
    assert(got == want, s"tail search $got != exact $want")
    // the moved key's STALE graph copy sat right next to q — it must
    // not rank there anymore (its live row is 500 away, in the tail)
    assert(!got.contains("k0011"), "stale graph copy of a moved key ranked")
    assert(!got.contains("k0002"), "deleted key ranked")
    // and the moved key IS findable at its new location via the tail
    val nearNew = c.search(n, vec(11).map(_ + 500f).toArray, k = 1,
      ef = 500, refine = 50).collect()
    assert(nearNew.head.getString(0) == "k0011")

    // batch path takes the same partition: parity with single + exact
    val queries = Seq((7L, q.toSeq)).toDF("qid", "qvec")
    val batched = c.searchBatch(n, queries, k = 10, ef = 500, refine = 50)
      .collect().sortBy(r => (r.getDouble(2), r.getString(1)))
      .map(_.getString(1)).toSeq
    assert(batched == want, s"batched tail search $batched != exact $want")
  }

  test("the fold triggers at the tail ratio and advances the stamp") {
    import spark.implicits._
    val (c, n) = mk(300)
    // one batch over 20% of 300 graph rows — the commit itself folds
    c.upsert(n, rows(300 until 380).toDF("key", "vec", "meta"))
    val (fresh, stamped, current) = hnswRow(c, n)
    assert(fresh)
    assert(stamped == current,
      s"an over-threshold commit must fold: stamp $stamped vs current $current")
    val q = vec(333).toArray
    val got = c.search(n, q, k = 10, ef = 400, refine = 40)
      .collect().map(_.getString(0)).toSeq
    assert(got == exactKeys(c, n, q, 10))
  }

  test("compact() folds a pending tail on demand") {
    import spark.implicits._
    val (c, n) = mk(300)
    c.upsert(n, rows(300 until 310).toDF("key", "vec", "meta"))
    val (_, stamped0, current0) = hnswRow(c, n)
    assert(stamped0 < current0, "precondition: tail pending")
    val arts = c.compact(n)
    assert(arts.exists(a => a._2 == "hnsw" && a._3 == "tail folded"),
      s"compact must report the hnsw fold, got $arts")
    val (fresh, stamped, current) = hnswRow(c, n)
    assert(fresh && stamped == current, "compact must seal the tail")
    // idempotent: an empty tail folds nothing
    assert(!c.compact(n).exists(_._2 == "hnsw"))
    val q = vec(305).toArray
    assert(c.search(n, q, k = 10, ef = 400, refine = 40)
      .collect().map(_.getString(0)).toSeq == exactKeys(c, n, q, 10))
  }
}
