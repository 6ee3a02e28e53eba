package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.index.HnswIndex

/** HNSW graph index: the walk with ef >= n must equal brute force (the
  * exactness contract the connectivity repair underwrites), builds must be
  * deterministic (the maintenance contract — same rows, same graph), layer 0
  * must be connected even on adversarially clustered data, realistic-ef
  * recall must be high, and the sharded Spark layout must round-trip. */
class HnswIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("hnsw-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.01"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Deterministic synthetic corpus: k far-apart tight clusters — the
    * geometry most likely to disconnect a navigable-graph build. */
  private def clustered(n: Int, dim: Int, clusters: Int): Array[(String, Array[Float])] =
    (0 until n).map { i =>
      val c = i % clusters
      val v = Array.tabulate(dim) { j =>
        val center = if (j == c % dim) c * 1000.0f else 0.0f
        center + ((i * 31 + j * 7) % 13 - 6) * 0.01f
      }
      (f"k$i%05d", v)
    }.toArray

  private def bruteTopK(rows: Array[(String, Array[Float])], q: Array[Float],
                        k: Int): Seq[String] =
    rows.map { case (key, v) =>
      val d = v.zip(q).map { case (a, b) =>
        val x = a.toDouble - b.toDouble; x * x
      }.sum
      (d, key)
    }.sortBy(identity).take(k).map(_._2).toSeq

  private def buildFrom(rows: Array[(String, Array[Float])], m: Int = 8,
                        efC: Int = 64): HnswIndex.Graph = {
    val sorted = rows.sortBy(_._1)
    val dim = sorted(0)._2.length
    val vecs = new Array[Float](sorted.length * dim)
    sorted.zipWithIndex.foreach { case ((_, v), i) =>
      System.arraycopy(v, 0, vecs, i * dim, dim)
    }
    HnswIndex.build(sorted.map(_._1), vecs, dim, m, efC)
  }

  test("walk with ef >= n equals brute force exactly (the oracle contract)") {
    val rows = clustered(300, 8, 5)
    val g = buildFrom(rows)
    for (qi <- Seq(0, 17, 299)) {
      val q = rows(qi)._2
      val got = HnswIndex.search(g, q, ef = rows.length, k = 10).map(_._1).toSeq
      val want = bruteTopK(rows, q, 10)
      assert(got == want, s"query $qi: walk $got != brute $want")
    }
  }

  test("build is deterministic: same rows (any order) => identical blob") {
    val rows = clustered(200, 8, 3)
    val b1 = HnswIndex.serialize(buildFrom(rows))
    val b2 = HnswIndex.serialize(buildFrom(rows.reverse))
    assert(java.util.Arrays.equals(b1, b2),
      "shuffled input produced a different graph — maintenance rebuilds " +
        "would churn bytes")
  }

  test("layer 0 is connected even on far-apart tight clusters") {
    val rows = clustered(400, 8, 8) // 8 clusters 1000 apart, sigma ~0.01
    val g = buildFrom(rows, m = 4, efC = 16) // small m stresses connectivity
    val seen = new java.util.BitSet(g.n)
    var stack = List(g.entry)
    seen.set(g.entry)
    while (stack.nonEmpty) {
      val x = stack.head; stack = stack.tail
      g.links(x)(0).foreach { nb =>
        if (!seen.get(nb)) { seen.set(nb); stack = nb :: stack }
      }
    }
    assert(seen.cardinality() == g.n,
      s"layer 0 reaches ${seen.cardinality()} of ${g.n} nodes — repair failed")
  }

  test("serialize/deserialize round-trips the graph") {
    val rows = clustered(150, 6, 4)
    val g = buildFrom(rows)
    val h = HnswIndex.deserialize(HnswIndex.serialize(g))
    assert(h.n == g.n && h.dim == g.dim && h.entry == g.entry &&
      h.maxLevel == g.maxLevel)
    assert(h.keys.sameElements(g.keys))
    assert(h.vecs.sameElements(g.vecs))
    assert(h.levels.sameElements(g.levels))
    (0 until g.n).foreach { i =>
      (0 to g.levels(i)).foreach { l =>
        assert(h.links(i)(l).sameElements(g.links(i)(l)), s"links($i)($l) differ")
      }
    }
  }

  test("realistic-ef recall on the embeddings fixture") {
    val rows = emb.select(format_string("v%05d", col("vec_id")), col("embedding"))
      .collect().map(r => (r.getString(0), r.getSeq[Float](1).toArray))
    val g = buildFrom(rows, m = 16, efC = 100)
    val hits = (0 until 20).map { qi =>
      val q = rows(qi * 7 % rows.length)._2
      val got = HnswIndex.search(g, q, ef = 64, k = 10).map(_._1).toSet
      val want = bruteTopK(rows, q, 10).toSet
      got.intersect(want).size
    }.sum
    val recall = hits / 200.0
    assert(recall >= 0.95, s"recall@10 at ef=64 was $recall — graph quality off")
  }

  test("sharded Spark layout: build, persist, scatter-gather == brute force at full ef") {
    import spark.implicits._
    val rows = clustered(500, 8, 5)
    val df = rows.toSeq.toDF("key", "v")
    val buckets = 4
    val shards = HnswIndex.buildShards(df, "v", buckets, m = 8, efConstruction = 64)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-shards").toString
    try {
      HnswIndex.writeShards(shards, dir)
      val loaded = HnswIndex.loadShards(spark, dir)
      assert(loaded.count() == buckets, "one graph row per non-empty shard")
      // shard route must equal the keyed store's bucket route
      val viaSql = df.select(col("key"),
          pmod(xxhash64(col("key")), lit(buckets.toLong)).cast("int").as("s"))
        .groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val viaBlob = loaded.select("shard", "n").collect()
        .map(r => r.getInt(0) -> r.getInt(1).toLong).toMap
      assert(viaBlob == viaSql, s"shard populations $viaBlob != route $viaSql")

      val q = rows(123)._2
      val got = HnswIndex.searchShards(loaded, q, ef = 500, perShard = 20)
        .orderBy(col("adist"), col("key")).limit(10)
        .collect().map(_.getString(0)).toSeq
      assert(got == bruteTopK(rows, q, 10))

      // batched twin agrees with the single-query path per query
      val queries = Array((0L, rows(9)._2), (1L, rows(444)._2))
      val batched = HnswIndex.searchShardsBatch(loaded, queries, ef = 500, perShard = 20)
      queries.foreach { case (qid, qv) =>
        val b = batched.filter(col("qid") === qid)
          .orderBy(col("adist"), col("key")).limit(10)
          .collect().map(_.getString(1)).toSeq
        val s = HnswIndex.searchShards(loaded, qv, ef = 500, perShard = 20)
          .orderBy(col("adist"), col("key")).limit(10)
          .collect().map(_.getString(0)).toSeq
        assert(b == s, s"batched qid=$qid diverged from single-query path")
      }
    } finally TestDirs.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("masked walk (filtered search): exact over passing nodes at ef >= n, " +
       "traversal unbroken by non-passing waypoints") {
    val rows = clustered(400, 8, 5)
    val g = buildFrom(rows)
    val q = rows(3)._2.map(x => x + 0.005f)
    // pass only every 7th node BY KEY — scattered across clusters, so
    // passing nodes' graph paths run through masked-out neighbors
    val passKeys = rows.map(_._1).filter(_.stripPrefix("k").toInt % 7 == 0).toSet
    val keep = new java.util.BitSet(g.n)
    (0 until g.n).foreach(i => if (passKeys(g.keys(i))) keep.set(i))
    val got = HnswIndex.search(g, q, ef = g.n, k = 10, keep).map(_._1).toSeq
    val expect = bruteTopK(rows.filter(r => passKeys(r._1)), q, 10)
    assert(got == expect, s"masked walk $got != filtered brute force $expect")
    // no passing node: empty result, no crash
    assert(HnswIndex.search(g, q, ef = g.n, k = 10,
      new java.util.BitSet(g.n)).isEmpty)
  }

  test("graph cache is byte-bounded: over-budget graphs evict eldest") {
    import spark.implicits._
    val rows = clustered(240, 16, 4)
    val df = rows.toSeq.map { case (k, v) => (k, v.toSeq) }.toDF("key", "vec")
    val shards = HnswIndex.buildShards(df, "vec", buckets = 4, m = 8,
      efConstruction = 64).cache()
    val blobs = shards.select(col("shard"), col("blob")).collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(blobs.size == 4)
    val sizes = blobs.values.map(b =>
      HnswIndex.approxGraphBytes(HnswIndex.deserialize(b)))
    val per = sizes.max
    val prev = System.getProperty("graft.hnsw.cacheBytes")
    HnswIndex.clearGraphCache()
    try {
      // budget fits ~2 of the 4 graphs
      System.setProperty("graft.hnsw.cacheBytes", (per * 5 / 2).toString)
      val q = rows(0)._2
      HnswIndex.searchShards(shards, q, ef = 16, perShard = 8,
        cacheTag = "budget-test").collect()
      val n = HnswIndex.cachedGraphCount
      assert(n >= 1 && n <= 2, s"expected 1..2 cached graphs, got $n")
      assert(HnswIndex.cachedGraphBytes <= per * 5 / 2,
        s"cache estimate ${HnswIndex.cachedGraphBytes} over budget ${per * 5 / 2}")
      // roomy budget: all four stay resident
      System.setProperty("graft.hnsw.cacheBytes", (per * 100).toString)
      HnswIndex.clearGraphCache()
      HnswIndex.searchShards(shards, q, ef = 16, perShard = 8,
        cacheTag = "budget-test-2").collect()
      assert(HnswIndex.cachedGraphCount == 4)
    } finally {
      if (prev == null) System.clearProperty("graft.hnsw.cacheBytes")
      else System.setProperty("graft.hnsw.cacheBytes", prev)
      HnswIndex.clearGraphCache()
      shards.unpersist()
    }
  }

  test("single-node and tiny shards build and search") {
    val one = Array(("only", Array(1f, 2f)))
    val g = buildFrom(one, m = 4, efC = 8)
    assert(HnswIndex.search(g, Array(0f, 0f), ef = 4, k = 3).map(_._1).toSeq == Seq("only"))
    val two = Array(("a", Array(0f, 0f)), ("b", Array(3f, 4f)))
    val g2 = buildFrom(two, m = 4, efC = 8)
    val r = HnswIndex.search(g2, Array(0f, 0f), ef = 4, k = 2)
    assert(r.map(_._1).toSeq == Seq("a", "b"))
    assert(math.abs(r(1)._2 - 25.0) < 1e-6, "adist is squared assign-space L2")
  }
}
