package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** HNSW through the client envelope: create/build/search lifecycle, the
  * ef >= corpus exactness contract, incremental maintenance across
  * upserts/deletes, cosine parity, filtered-search fallback, batch ==
  * single-query, load pinning, and the create-boundary validation. */
class HnswClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("hnsw-client-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dim = 16

  private def vec(i: Int): Seq[Float] =
    Seq.tabulate(dim) { j =>
      (((i * 37 + j * 11) % 97) / 97.0f - 0.5f) + (i % 5) * 2.0f
    }

  private def rows(is: Range): Seq[(String, Seq[Float], Map[String, String])] =
    is.map(i => (f"k$i%04d", vec(i), Map("grp" -> s"g${i % 3}")))

  private def mkClient(): (GraftClient, String) = {
    val root = java.nio.file.Files.createTempDirectory("hnsw-client").toString
    (new GraftClient(spark, root), root)
  }

  private def exactKeys(client: GraftClient, name: String, q: Array[Float],
                        k: Int): Seq[String] = {
    import spark.implicits._
    client.searchBatch(name, Seq((0L, q.toSeq)).toDF("qid", "qvec"), k,
        forceExact = true)
      .orderBy(col("distance"), col("vector_key"))
      .collect().map(_.getString(1)).toSeq
  }

  test("HNSW lifecycle: build, exact-at-full-ef, maintenance, drop") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hn", dim = dim, indexType = "HNSW", buckets = 4)
    client.upsert("hn", rows(0 until 300).toDF("key", "vec", "meta"))
    val n = 300
    val q = vec(7).toArray

    // pre-build search is the exact scan — the ground truth
    val exactPre = client.search("hn", q, k = 10).collect().map(_.getString(0)).toSeq

    client.buildIndex("hn", nlist = 0) // nlist is an IVF knob — ignored
    val idx = client.listIndexes("hn").collect()
      .map(r => (r.getString(0), r.getBoolean(2)))
    assert(idx.contains(("HNSW", true)), s"expected fresh HNSW row, got ${idx.toSeq}")

    // ef >= corpus with a corpus-covering refine pool: the walk is
    // provably exhaustive and the final ranking is the exact ranking
    val viaGraphDf = client.search("hn", q, k = 10, ef = n, refine = n / 10)
    // dispatch honesty: the graph arm deserializes blobs through a typed
    // flatMap (MapPartitions in the plan); the exact fallback has none —
    // without this, a silent fall-through would pass every value check
    assert(viaGraphDf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "search must ride the graph scatter-gather, not the exact scan")
    val viaGraph = viaGraphDf.collect().map(_.getString(0)).toSeq
    assert(viaGraph == exactPre, s"graph $viaGraph != exact $exactPre")

    // realistic ef: strong recall on this geometry
    val viaBeam = client.search("hn", q, k = 10, ef = 64)
      .collect().map(_.getString(0)).toSet
    assert(viaBeam.intersect(exactPre.toSet).size >= 8,
      s"recall@10 at ef=64 below 0.8: ${viaBeam.intersect(exactPre.toSet).size}")

    // maintenance: an upsert (some keys moved to new vectors) + deletes
    // keep the index FRESH and the full-ef search exact
    val moved = Seq(("k0007", vec(9999).map(_ + 100f), Map("grp" -> "moved")))
    client.upsert("hn", (rows(300 until 340) ++ moved).toDF("key", "vec", "meta"))
    client.deleteByKeys("hn", Seq("k0001", "k0002", "k0303"))
    val idx2 = client.listIndexes("hn").collect()
      .map(r => (r.getString(0), r.getBoolean(2)))
    assert(idx2.contains(("HNSW", true)),
      s"index must stay fresh across commits, got ${idx2.toSeq}")
    val n2 = client.count("hn").toInt
    val exactPost = exactKeys(client, "hn", q, 10)
    val postGraph = client.search("hn", q, k = 10, ef = n2, refine = n2 / 10 + 1)
      .collect().map(_.getString(0)).toSeq
    assert(postGraph == exactPost, s"post-commit $postGraph != exact $exactPost")
    assert(!postGraph.contains("k0001") && !postGraph.contains("k0002"))
    // the moved key must not be findable at its OLD location
    assert(!postGraph.contains("k0007") ||
      exactPost.contains("k0007"), "k0007 must rank only by its new vector")

    // filtered search (r13): above the selectivity floor it rides the
    // MASKED walk — same filter semantics as a FLAT collection, now
    // graph-served (the dedicated filtered-walk test pins exactness)
    val filtered = client.search("hn", q, k = 5,
        filter = Some(element_at(col("meta"), "grp") === "g1"))
      .collect()
    assert(filtered.nonEmpty &&
      filtered.forall(_.getAs[Map[String, String]]("metadata")("grp") == "g1"))

    // drop_index: falls back to the exact scan, listIndexes empties
    client.dropIndex("hn")
    assert(!client.listIndexes("hn").collect().exists(_.getString(0) == "HNSW"))
    val afterDrop = client.search("hn", q, k = 10).collect().map(_.getString(0)).toSeq
    assert(afterDrop == exactPost, "post-drop search must be the exact scan")
  }

  test("searchBatch rides the graphs and equals per-query search") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hb", dim = dim, indexType = "HNSW", buckets = 4)
    client.upsert("hb", rows(0 until 250).toDF("key", "vec", "meta"))
    client.buildIndex("hb", nlist = 0)
    val qs = Seq(3, 77, 212).map(i => vec(i).toArray)
    val queries = qs.zipWithIndex.map { case (q, i) => (i.toLong, q.toSeq) }
      .toDF("qid", "qvec")
    val batchedDf = client.searchBatch("hb", queries, k = 8, ef = 250, refine = 32)
    // dispatch honesty: the HNSW batch arm walks graphs via a typed
    // flatMap; the exact fallback is a broadcast nested-loop product
    val bplan = batchedDf.queryExecution.executedPlan.toString
    assert(bplan.contains("MapPartitions") && !bplan.contains("NestedLoop"),
      s"searchBatch must ride the graph arm:\n${bplan.take(1200)}")
    val batched = batchedDf
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rs) =>
        qid -> rs.sortBy(r => (r.getDouble(2), r.getString(1))).map(_.getString(1)).toSeq
      }
    qs.zipWithIndex.foreach { case (q, i) =>
      val single = client.search("hb", q, k = 8, ef = 250, refine = 32)
        .collect().map(_.getString(0)).toSeq
      assert(batched(i.toLong) == single, s"qid $i batched != single")
      val exact = exactKeys(client, "hb", q, 8)
      assert(single == exact, s"qid $i full-ef != exact")
    }
    // estimateRecall composes the two searchBatch arms; the ef knob
    // reaches the walk — an exhaustive beam (ef >= the corpus) must
    // measure EXACTLY 1.0, the HNSW exactness contract through the
    // estimator itself
    assert(client.estimateRecall("hb", k = 10) >= 0.8)
    assert(client.estimateRecall("hb", k = 10, sampleQueries = 8,
      ef = 250) == 1.0)
  }

  test("cosine HNSW: normalized assign space, exact at full ef") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hc", dim = dim, metric = "cosine",
      indexType = "HNSW", buckets = 4)
    // wildly mixed magnitudes: cosine order ≠ l2 order, so this catches
    // an un-normalized graph space immediately
    val mixed = (0 until 200).map { i =>
      val scale = math.pow(10.0, i % 4).toFloat
      (f"c$i%04d", vec(i).map(_ * scale), Map.empty[String, String])
    }
    client.upsert("hc", mixed.toDF("key", "vec", "meta"))
    client.buildIndex("hc", nlist = 0)
    val q = vec(42).toArray
    val got = client.search("hc", q, k = 10, ef = 200, refine = 20)
      .collect().map(_.getString(0)).toSeq
    assert(got == exactKeys(client, "hc", q, 10))
  }

  test("loadCollection pins the graph blobs (InMemoryTableScan in the plan)") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hl", dim = dim, indexType = "HNSW", buckets = 2)
    client.upsert("hl", rows(0 until 100).toDF("key", "vec", "meta"))
    client.buildIndex("hl", nlist = 0)
    client.loadCollection("hl")
    try {
      val df = client.search("hl", vec(5).toArray, k = 5)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"loaded search must ride the cached frames:\n${plan.take(1200)}")
      assert(df.collect().length == 5)
      // Milvus refuses drop_index on a loaded collection
      val e = intercept[IllegalArgumentException] { client.dropIndex("hl") }
      assert(e.getMessage.contains("loaded"))
    } finally client.releaseCollection("hl")
  }

  test("per-partition HNSW: scoped build/search ride that partition's graphs") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hp", dim = dim, indexType = "HNSW", buckets = 2)
    client.createPartition("hp", "pa")
    client.upsert("hp", rows(0 until 80).toDF("key", "vec", "meta"))
    client.upsert("hp", rows(200 until 280).toDF("key", "vec", "meta"),
      partition = "pa")
    client.buildIndex("hp", nlist = 0, partitions = Seq("pa")) // only pa
    val q = vec(222).toArray
    val scoped = client.search("hp", q, k = 5, partitions = Seq("pa"),
      ef = 80, refine = 16)
    assert(scoped.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "the scoped search must ride pa's graphs")
    val got = scoped.collect().map(_.getString(0)).toSeq
    val exact = client.searchBatch("hp", Seq((0L, q.toSeq)).toDF("qid", "qvec"),
        k = 5, forceExact = true, partitions = Seq("pa"))
      .orderBy(col("distance"), col("vector_key"))
      .collect().map(_.getString(1)).toSeq
    assert(got == exact, s"scoped $got != exact $exact")
    // per-partition index state: pa has the HNSW row with Milvus params,
    // default has none (never built)
    val pa = client.listIndexes("hp", partition = "pa").collect()
    assert(pa.exists(r => r.getString(0) == "HNSW" &&
      r.getString(5).contains("\"efConstruction\"")))
    assert(!client.listIndexes("hp").collect().exists(_.getString(0) == "HNSW"))
  }

  test("TEXT_MATCH gate rides the masked walk on HNSW collections") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hg", dim = dim, indexType = "HNSW", buckets = 4)
    client.upsert("hg", rows(0 until 300).toDF("key", "vec", "meta"))
    // text per key: half the corpus carries the gated term
    val docs = (0 until 300)
      .map(i => (f"k$i%04d", s"alpha ${if (i % 2 == 0) "even" else "odd"} beta"))
      .toDF("key", "text")
    client.buildTextIndex("hg", docs)
    client.buildIndex("hg", nlist = 0)
    val q = vec(7).toArray
    val gdf = client.search("hg", q, k = 8, ef = 300, refine = 2,
      matchTerms = Seq("even"))
    assert(gdf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "a TEXT_MATCH-gated HNSW search must ride the masked walk")
    def l2(a: Seq[Float]): Double =
      math.sqrt(a.zip(q).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
    val expect = (0 until 300).filter(_ % 2 == 0)
      .map(i => (l2(vec(i)), f"k$i%04d")).sorted.take(8).map(_._2)
    assert(gdf.collect().map(_.getString(0)).toSeq == expect,
      "gated masked walk must equal the gated exact ranking")
  }

  test("filtered searchBatch rides the masked batch walk and equals " +
       "per-query filtered search on both sides of the floor") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hbf", dim = dim, indexType = "HNSW", buckets = 4)
    client.upsert("hbf", rows(0 until 300).toDF("key", "vec", "meta"))
    client.buildIndex("hbf", nlist = 0)
    val f = element_at(col("meta"), "grp") === "g1" // 100 passing > floor 64
    val qs = Seq(3, 77, 212)
    val queries = qs.zipWithIndex
      .map { case (i, j) => (j.toLong, vec(i)) }.toDF("qid", "qvec")
    def batchHits(flt: org.apache.spark.sql.Column) =
      client.searchBatch("hbf", queries, k = 8, ef = 300, refine = 2,
          filter = Some(flt))
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rs) => qid -> rs.map(_.getString(1)).toSeq }
    def singleHits(flt: org.apache.spark.sql.Column) =
      qs.zipWithIndex.map { case (i, j) =>
        j.toLong -> client.search("hbf", vec(i).toArray, k = 8, ef = 300,
          refine = 2, filter = Some(flt))
          .collect().map(_.getString(0)).toSeq
      }.toMap
    val bdf = client.searchBatch("hbf", queries, k = 8, ef = 300,
      refine = 2, filter = Some(f))
    assert(bdf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "filtered batch above the floor must ride the masked batch walk")
    assert(batchHits(f) == singleHits(f),
      "filtered batch must equal per-query filtered search")
    // below the floor: exact product over the passing rows, same parity
    val small = f && col("key") < "k0060"
    assert(batchHits(small) == singleHits(small))
  }

  test("filtered search rides the MASKED walk and equals filtered-exact " +
       "(incl. across the growing tail); below the floor it ranks exactly") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hf", dim = dim, indexType = "HNSW", buckets = 4)
    client.upsert("hf", rows(0 until 300).toDF("key", "vec", "meta"))
    client.buildIndex("hf", nlist = 0)
    val q = vec(7).toArray
    val grp1 = (0 until 300).filter(_ % 3 == 1).map(i => f"k$i%04d").toSet

    // ground truth: filtered exact ranking computed driver-side
    def l2(a: Seq[Float], b: Array[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
    def expectTop(live: Map[String, Seq[Float]], pass: Set[String], k: Int): Seq[String] =
      live.filter(kv => pass(kv._1)).toSeq
        .map { case (kk, v) => (l2(v, q), kk) }.sortBy(identity).take(k).map(_._2)
    var live = (0 until 300).map(i => (f"k$i%04d", vec(i))).toMap

    // 100 passing rows > floor (64): MASKED walk, exact at ef >= n
    val fdf = client.search("hf", q, k = 10, ef = 300, refine = 2,
      filter = Some(element_at(col("meta"), "grp") === "g1"))
    assert(fdf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "filtered search above the floor must ride the masked walk")
    assert(fdf.collect().map(_.getString(0)).toSeq == expectTop(live, grp1, 10))

    // default ef + inverse-selectivity scaling: strong recall
    val beam = client.search("hf", q, k = 10,
        filter = Some(element_at(col("meta"), "grp") === "g1"))
      .collect().map(_.getString(0)).toSet
    assert(beam.intersect(expectTop(live, grp1, 10).toSet).size >= 8,
      "scaled-ef filtered recall@10 below 0.8")

    // growing tail: a passing NEW key, an overwrite that moves a passing
    // key's vector, and a delete of a passing key — no fold; the
    // filtered two-arm search must track the live set exactly
    client.upsert("hf", Seq(
        ("k9001", vec(901), Map("grp" -> "g1")),
        ("k0001", vec(555), Map("grp" -> "g1"))).toDF("key", "vec", "meta"))
    client.deleteByKeys("hf", Seq("k0004"))
    live = live ++ Map("k9001" -> vec(901), "k0001" -> vec(555)) - "k0004"
    val pass2 = grp1 + "k9001" - "k0004"
    val idx = client.listIndexes("hf").filter(col("kind") === "HNSW").head()
    assert(idx.getBoolean(2) && idx.getLong(3) < idx.getLong(4),
      "tail must be pending (servable, stamp lagging) for this case")
    val tdf = client.search("hf", q, k = 10, ef = 300, refine = 2,
      filter = Some(element_at(col("meta"), "grp") === "g1"))
    assert(tdf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "filtered tail-era search must still ride the masked walk")
    assert(tdf.collect().map(_.getString(0)).toSeq == expectTop(live, pass2, 10),
      "filtered graph∪tail must equal the filtered live exact answer")

    // below the floor (20 passing < 64): exact rank of the passing rows,
    // no graph deserialization in the plan
    val small = client.search("hf", q, k = 5, ef = 300,
      filter = Some(element_at(col("meta"), "grp") === "g1" &&
        col("key") < "k0060"))
    assert(!small.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "below the floor the exact rank must serve")
    val pass3 = pass2.filter(k => k < "k0060")
    assert(small.collect().map(_.getString(0)).toSeq == expectTop(live, pass3, 5))
  }

  test("grouped search rides the graph walk (plain, filtered, and the " +
       "growing tail) and equals the exact grouped model at full ef") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hg", dim = dim, indexType = "HNSW", buckets = 4)
    client.upsert("hg", rows(0 until 240).toDF("key", "vec", "meta"))
    client.buildIndex("hg", nlist = 0)
    val q = vec(5).toArray

    def l2(a: Seq[Float], b: Array[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
    // the exact grouped model: top-k groups by best distance (ties on
    // the STRING group value, as the client ranks), groupSize best rows
    // each — (group, grp_rank, rn, key)
    def model(live: Seq[(String, Seq[Float], String)], k: Int, gs: Int)
        : Seq[(String, Long, Long, String)] = {
      val scored = live.map { case (kk, v, g) => (g, kk, l2(v, q)) }
      val byGrp = scored.groupBy(_._1)
      byGrp.map { case (g, rs) => (g, rs.map(_._3).min) }.toSeq
        .sortBy { case (g, b) => (b, g) }.take(k).zipWithIndex
        .flatMap { case ((g, _), i) =>
          byGrp(g).sortBy(r => (r._3, r._2)).take(gs).zipWithIndex
            .map { case ((_, kk, _), j) => (g, (i + 1).toLong, (j + 1).toLong, kk) }
        }
    }
    def got(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, String)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    var live = (0 until 240).map(i => (f"k$i%04d", vec(i), s"g${i % 3}"))

    // plain grouped: graph walk (plan-asserted), exact at ef >= n
    val n = live.size
    val gdf = client.searchGrouped("hg", q, k = 2, groupByKey = "grp",
      groupSize = 3, ef = n, refine = (n + 5) / 6)
    assert(gdf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "grouped search on a fresh HNSW collection must ride the graph walk")
    assert(got(gdf) == model(live, 2, 3))

    // filtered grouped: the masked walk (g0/g2 passing = 160 > floor)
    val fdf = client.searchGrouped("hg", q, k = 2, groupByKey = "grp",
      groupSize = 3, ef = n, refine = (n + 5) / 6,
      filter = Some(element_at(col("meta"), "grp").isin("g0", "g2")))
    assert(fdf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "filtered grouped search must ride the masked walk")
    assert(got(fdf) == model(live.filter(_._3 != "g1"), 2, 3))

    // growing tail: a new key, an overwrite, a delete — no fold; the
    // grouped graph∪tail answer must track the live set exactly
    client.upsert("hg", Seq(
        ("k9001", vec(901), Map("grp" -> "g1")),
        ("k0003", vec(777), Map("grp" -> "g0"))).toDF("key", "vec", "meta"))
    client.deleteByKeys("hg", Seq("k0005"))
    live = live.filterNot(r => r._1 == "k9001" || r._1 == "k0003" || r._1 == "k0005") ++
      Seq(("k9001", vec(901), "g1"), ("k0003", vec(777), "g0"))
    val idx = client.listIndexes("hg").filter(col("kind") === "HNSW").head()
    assert(idx.getBoolean(2) && idx.getLong(3) < idx.getLong(4),
      "tail must be pending (servable, stamp lagging) for this case")
    val n2 = live.size
    val tdf = client.searchGrouped("hg", q, k = 3, groupByKey = "grp",
      groupSize = 2, ef = n2, refine = (n2 + 5) / 6)
    assert(tdf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "tail-era grouped search must still ride the graph walk")
    assert(got(tdf) == model(live, 3, 2),
      "grouped graph∪tail must equal the exact grouped model")

    // forceExact (the ground-truth arm, searchBatch's knob): bypasses
    // the graph entirely and must equal both the model and the full-ef
    // walk
    val xdf = client.searchGrouped("hg", q, k = 3, groupByKey = "grp",
      groupSize = 2, forceExact = true)
    assert(!xdf.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "forceExact grouped search must not touch the graphs")
    assert(got(xdf) == model(live, 3, 2))

    // ef must cover k * groupSize
    assert(intercept[IllegalArgumentException] {
      client.searchGrouped("hg", q, k = 4, groupByKey = "grp",
        groupSize = 4, ef = 8)
    }.getMessage.contains("ef"))
  }

  test("auto-ef grouped walks expand until the requested groups fill " +
       "(one dense near group cannot crowd the pool below k groups)") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hx", dim = dim, indexType = "HNSW", buckets = 4)
    // adversarial geometry: 200 rows of group a hug the query; groups
    // b (20 rows) and c (17 rows) sit at ~10 and ~20 away — the initial
    // k·groupSize·refine pool is pure group a
    val q = Seq.tabulate(dim)(j => math.sin(j * 0.31).toFloat)
    def jitter(i: Int, j: Int): Float = (((i * 31 + j * 17) % 13) / 130.0f)
    val rows =
      (0 until 200).map(i => (f"a$i%04d",
        q.zipWithIndex.map { case (x, j) => x + 1f + jitter(i, j) }, Map("grp" -> "a"))) ++
      (0 until 20).map(i => (f"b$i%04d",
        q.zipWithIndex.map { case (x, j) => x + 10f + jitter(i, j) }, Map("grp" -> "b"))) ++
      (0 until 17).map(i => (f"c$i%04d",
        q.zipWithIndex.map { case (x, j) => x + 20f + jitter(i, j) }, Map("grp" -> "c")))
    client.upsert("hx", rows.toDF("key", "vec", "meta"))
    client.buildIndex("hx", nlist = 0)

    val df = client.searchGrouped("hx", q.toArray, k = 3, groupByKey = "grp",
      groupSize = 2) // ef auto — the expansion path
    assert(df.queryExecution.executedPlan.toString.contains("MapPartitions"),
      "the expanded grouped walk must still ride the graph")
    val groups = df.collect().map(r => (r.getString(0), r.getLong(1))).distinct
    assert(groups.toSeq.sorted == Seq(("a", 1L), ("b", 2L), ("c", 3L)),
      s"all three groups must surface in distance order, got ${groups.toSeq}")
  }

  test("group_strict_size fills pinned-beam groups; the grouped recall " +
       "estimator flags the crowding floor and full ef recovers it (r15)") {
    import spark.implicits._
    val (client, _) = mkClient()
    client.createCollection("hx2", dim = dim, indexType = "HNSW", buckets = 4)
    // the same crowding geometry as the expansion test — but now with
    // an EXPLICIT (pinned) beam, the knob-less-iid-floor shape VERDICT
    // r14 flagged: the fixed pool is pure group a, so the far groups'
    // PAIRS go missing even though their best rows would rank
    val q = Seq.tabulate(dim)(j => math.sin(j * 0.31).toFloat)
    def jitter(i: Int, j: Int): Float = (((i * 31 + j * 17) % 13) / 130.0f)
    val rows =
      (0 until 200).map(i => (f"a$i%04d",
        q.zipWithIndex.map { case (x, j) => x + 1f + jitter(i, j) }, Map("grp" -> "a"))) ++
      (0 until 20).map(i => (f"b$i%04d",
        q.zipWithIndex.map { case (x, j) => x + 10f + jitter(i, j) }, Map("grp" -> "b"))) ++
      (0 until 17).map(i => (f"c$i%04d",
        q.zipWithIndex.map { case (x, j) => x + 20f + jitter(i, j) }, Map("grp" -> "c")))
    client.upsert("hx2", rows.toDF("key", "vec", "meta"))
    client.buildIndex("hx2", nlist = 0)
    val n = rows.size

    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
      df.collect().map(r => (r.getString(0), r.getString(3))).toSet
    val exactPairs = pairsOf(client.searchGrouped("hx2", q.toArray, k = 3,
      groupByKey = "grp", groupSize = 2, forceExact = true))
    assert(exactPairs.size == 6)

    // pinned minimal beam (ef = k·groupSize): the walk honors it
    // verbatim and the crowded pool drops far groups' pairs
    val pinned = pairsOf(client.searchGrouped("hx2", q.toArray, k = 3,
      groupByKey = "grp", groupSize = 2, ef = 6))
    assert((pinned & exactPairs).size < exactPairs.size,
      s"the crowding geometry must under-fill a pinned 6-beam, got $pinned")

    // group_strict_size: same pinned ef, but the walk widens until the
    // winning groups fill — recovers the exact pair set
    val strict = pairsOf(client.searchGrouped("hx2", q.toArray, k = 3,
      groupByKey = "grp", groupSize = 2, ef = 6, groupStrictSize = true))
    assert(strict == exactPairs,
      s"group_strict_size must recover the exact pairs, got $strict")

    // the estimator places this corpus on the dial: well under 1.0 at
    // the pinned beam, exactly 1.0 at ef >= corpus (the provably
    // exhaustive walk), and recovered by the strict-size dial
    val low = client.estimateRecallGrouped("hx2", "grp", k = 3,
      groupSize = 2, ef = 6, sampleQueries = 4)
    val full = client.estimateRecallGrouped("hx2", "grp", k = 3,
      groupSize = 2, ef = n, refine = (n + 5) / 6, sampleQueries = 4)
    val strictRec = client.estimateRecallGrouped("hx2", "grp", k = 3,
      groupSize = 2, ef = 6, sampleQueries = 4, groupStrictSize = true)
    assert(full == 1.0, s"full-ef pair recall must be exactly 1.0, got $full")
    assert(low < full, s"the pinned beam must measure below 1.0, got $low")
    assert(strictRec > low,
      s"strict-size must lift the measured pair recall ($strictRec vs $low)")
  }

  test("create-boundary validation") {
    val (client, _) = mkClient()
    // HNSW params rejected on other index types
    assert(intercept[IllegalArgumentException] {
      client.createCollection("bad1", dim = 8, hnswM = 16)
    }.getMessage.contains("hnswM"))
    assert(intercept[IllegalArgumentException] {
      client.createCollection("bad2", dim = 8, efConstruction = 100)
    }.getMessage.contains("efConstruction"))
    // efConstruction must cover M
    assert(intercept[IllegalArgumentException] {
      client.createCollection("bad3", dim = 8, indexType = "HNSW",
        hnswM = 32, efConstruction = 8)
    }.getMessage.contains("efConstruction"))
    // M range
    assert(intercept[IllegalArgumentException] {
      client.createCollection("bad4", dim = 8, indexType = "HNSW", hnswM = 1)
    }.getMessage.contains("hnswM"))
    // defaults persist in the catalog
    client.createCollection("ok", dim = 8, indexType = "HNSW")
    val m = client.describe("ok")
    assert(m.hnswM == GraftClient.DefaultHnswM &&
      m.hnswEfC == GraftClient.DefaultHnswEfC)
    // ef < k rejected at search
    assert(intercept[IllegalArgumentException] {
      client.search("ok", Array.fill(8)(0f), k = 10, ef = 5)
    }.getMessage.contains("ef"))
    // dot metric rejects the graph build like every vector index
    client.createCollection("hd", dim = 8, metric = "dot", indexType = "HNSW")
    import spark.implicits._
    client.upsert("hd", Seq(("a", Seq.fill(8)(1f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    assert(intercept[IllegalArgumentException] {
      client.buildIndex("hd", nlist = 0)
    }.getMessage.contains("l2 and cosine"))
  }
}
