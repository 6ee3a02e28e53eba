package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.{AnnRequest, GraftClient}

/** Milvus's N-ary `hybrid_search` ([[GraftClient.hybridSearchRequests]]):
  * any number of AnnSearchRequests fused by one ranker. The two-arm
  * calls must be result-identical to the dedicated pairwise surfaces
  * (same rank/normalization algebra — a divergence would mean two
  * fusion tails drifted), three arms must match a driver-side model,
  * and the filter must bind every arm. */
class HybridRequestsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("hybrid-requests-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val docs = Seq(
    ("d1", "hash join beats nested loops on big tables", "infra"),
    ("d2", "the scan reads pages while the hash table builds", "infra"),
    ("d3", "sort merge join shines when inputs arrive ordered", "algo"),
    ("d4", "a scan without an index touches every page", "algo"),
    ("d5", "hash hash hash collision storms hurt the join", "infra"),
    ("d6", "columnar pages compress runs of sorted values", "algo"))

  private def vec(i: Int) = Seq.tabulate(4)(j => (math.sin(i * 0.9 + j) / 2).toFloat)

  private def mkClient(): GraftClient = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-hr-spec").toString
    val client = new GraftClient(spark, root)
    client.createCollection("hr", dim = 4, buckets = 4)
    client.upsert("hr", docs.zipWithIndex.map { case ((k, _, g), i) =>
      (k, vec(i), Map("grp" -> g))
    }.toDF("key", "vec", "meta"))
    val docsDf = docs.map { case (k, t, _) => (k, t) }.toDF("key", "text")
    client.buildTextIndex("hr", docsDf)
    client.buildSparseIndex("hr", docsDf
      .select(col("key"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("key"), col("w")).agg(count(lit(1)).as("tf"))
      .select(col("key"), xxhash64(col("w")).as("dim"),
        col("tf").cast("double").as("w")))
    client
  }

  private def sq(client: GraftClient, words: String*): Seq[(Long, Double)] = {
    import spark.implicits._
    words.toSeq.toDF("w").select(xxhash64(col("w"))).collect()
      .map(r => (r.getLong(0), 1.0)).toSeq
  }

  private val qvec = Array(0.2f, -0.1f, 0.3f, 0f)

  test("two-arm [Dense, Bm25Text] equals hybridSearchText, both rankers") {
    val client = mkClient()
    for ((ranker, fusion) <- Seq(("rrf", "rrf"), ("weighted", "weighted"))) {
      val viaN = client.hybridSearchRequests("hr",
          Seq(AnnRequest.Dense(qvec, weight = 0.7),
            AnnRequest.Bm25Text("hash join", weight = 0.3)),
          k = 6, ranker = ranker)
        .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
      val via2 = client.hybridSearchText("hr", "hash join", qvec,
          k = 6, fusion = fusion, wVec = 0.7, wLex = 0.3)
        .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
      assert(viaN == via2, s"$ranker: $viaN != $via2")
    }
  }

  test("two-arm [Dense, SparseField] equals hybridDenseSparse (rrf)") {
    val client = mkClient()
    val q = sq(client, "hash", "join", "pages")
    val viaN = client.hybridSearchRequests("hr",
        Seq(AnnRequest.Dense(qvec), AnnRequest.SparseField(q)), k = 6)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    val via2 = client.hybridDenseSparse("hr", sparseQuery = q, qvec = qvec,
        k = 6)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(viaN == via2)
  }

  test("three arms match the driver-side RRF model; filter binds all arms") {
    val client = mkClient()
    val q = sq(client, "scan", "pages")
    def rrfModel(filter: Option[org.apache.spark.sql.Column]): Seq[(String, Double)] = {
      def rank(rows: Seq[(String, Double)], asc: Boolean): Map[String, Int] =
        rows.sortBy { case (k, s) => (if (asc) s else -s, k) }
          .zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }.toMap
      val dense = rank(client.search("hr", qvec, 15, filter)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq, asc = true)
      val bm25 = rank(client.fullTextSearch("hr", "hash join", k = 15,
        filter = filter)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq, asc = false)
      val spHits = client.searchSparse("hr", q, k = 15)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val spGated = filter match {
        case None => spHits
        case Some(_) => // the spec's filter is grp == "algo"
          val pass = docs.filter(_._3 == "algo").map(_._1).toSet
          spHits.filter { case (k, _) => pass(k) }
      }
      val sparse = rank(spGated, asc = false)
      (dense.keySet ++ bm25.keySet ++ sparse.keySet).toSeq.map { k =>
        val s = Seq(dense.get(k), bm25.get(k), sparse.get(k))
          .flatten.map(r => 1.0 / (60 + r)).sum
        (k, math.rint(s * 1e6) / 1e6)
      }.sortBy { case (k, s) => (-s, k) }.take(6)
    }
    val reqs = Seq(AnnRequest.Dense(qvec),
      AnnRequest.Bm25Text("hash join"), AnnRequest.SparseField(q))
    def got(f: Option[org.apache.spark.sql.Column]) =
      client.hybridSearchRequests("hr", reqs, k = 6, filter = f)
        .collect().map(r => (r.getString(0), r.getDouble(4))).toSeq
    assert(got(None) == rrfModel(None))
    val f = Some(element_at(col("meta"), "grp") === "algo")
    assert(got(f) == rrfModel(f))
  }

  test("per-arm expr binds only its arm and intersects the shared filter") {
    val client = mkClient()
    val q = sq(client, "scan", "pages")
    def rank(rows: Seq[(String, Double)], asc: Boolean): Map[String, Int] =
      rows.sortBy { case (k, s) => (if (asc) s else -s, k) }
        .zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }.toMap
    // model: dense sees (shared AND grp=="infra"), bm25 sees
    // (shared AND grp=="algo"), sparse sees only the shared filter
    def model(shared: Option[org.apache.spark.sql.Column],
              sharedPass: String => Boolean): Seq[(String, Double)] = {
      val inf = element_at(col("meta"), "grp") === "infra"
      val alg = element_at(col("meta"), "grp") === "algo"
      def andS(c: org.apache.spark.sql.Column) =
        shared.map(s => s && c).getOrElse(c)
      val dense = rank(client.search("hr", qvec, 15, Some(andS(inf)))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq, asc = true)
      val bm25 = rank(client.fullTextSearch("hr", "hash join", k = 15,
          filter = Some(andS(alg)))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq, asc = false)
      val sparse = rank(client.searchSparse("hr", q, k = 15)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
        .filter { case (k, _) => sharedPass(k) }, asc = false)
      (dense.keySet ++ bm25.keySet ++ sparse.keySet).toSeq.map { k =>
        val s = Seq(dense.get(k), bm25.get(k), sparse.get(k))
          .flatten.map(r => 1.0 / (60 + r)).sum
        (k, math.rint(s * 1e6) / 1e6)
      }.sortBy { case (k, s) => (-s, k) }.take(6)
    }
    val reqs = Seq(
      AnnRequest.Dense(qvec, expr = """grp == "infra""""),
      AnnRequest.Bm25Text("hash join", expr = """grp == "algo""""),
      AnnRequest.SparseField(q))
    def got(f: Option[org.apache.spark.sql.Column]) =
      client.hybridSearchRequests("hr", reqs, k = 6, filter = f)
        .collect().map(r => (r.getString(0), r.getDouble(4))).toSeq
    // per-arm exprs alone: each arm constrained independently — the
    // pre-r14 shared-filter-only surface cannot express this
    assert(got(None) == model(None, _ => true))
    // shared AND per-arm: the intersection semantics Milvus applies
    val shared = Some(col("key") =!= "d4")
    assert(got(shared) == model(shared, _ != "d4"))
  }

  test("per-arm expr carries TEXT_MATCH gates (the full Milvus grammar " +
       "per arm); a Bm25Text arm refuses match conjuncts pointedly") {
    val client = mkClient()
    val q = sq(client, "scan", "pages")
    def rank(rows: Seq[(String, Double)], asc: Boolean): Map[String, Int] =
      rows.sortBy { case (k, s) => (if (asc) s else -s, k) }
        .zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }.toMap
    // dense arm gated to docs containing "hash", sparse (attached) arm
    // gated to docs containing "sorted" — each through its OWN expr
    val got = client.hybridSearchRequests("hr", Seq(
        AnnRequest.Dense(qvec, expr = """TEXT_MATCH(text, "hash")"""),
        AnnRequest.SparseField(q, expr = """TEXT_MATCH(text, "sorted")""")),
      k = 6)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    // models: the dedicated matchTerms surface for the dense arm; the
    // sparse hits driver-filtered to the docs that contain "sorted"
    val dense = rank(client.search("hr", qvec, 15, matchTerms = Seq("hash"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq, asc = true)
    val sortedDocs = docs.filter(_._2.split(" ").contains("sorted")).map(_._1).toSet
    val sparse = rank(client.searchSparse("hr", q, k = 15)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .filter { case (k, _) => sortedDocs(k) }, asc = false)
    val model = (dense.keySet ++ sparse.keySet).toSeq.map { k =>
      val s = Seq(dense.get(k), sparse.get(k)).flatten.map(r => 1.0 / (60 + r)).sum
      (k, math.rint(s * 1e6) / 1e6)
    }.sortBy { case (k, s) => (-s, k) }.take(6)
    assert(got == model,
      "per-arm TEXT_MATCH gates must bind each arm independently")
    // a Bm25Text arm IS a text query — match conjuncts in its expr refuse
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("hr", Seq(
        AnnRequest.Bm25Text("hash join", expr = """TEXT_MATCH(text, "x")""")))
    }.getMessage.contains("Bm25Text"))
  }

  test("offset pages the fused ranking; output_fields joins metadata") {
    val client = mkClient()
    val reqs = Seq(AnnRequest.Dense(qvec), AnnRequest.Bm25Text("hash join"))
    val all = client.hybridSearchRequests("hr", reqs, k = 6)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    val p2 = client.hybridSearchRequests("hr", reqs, k = 3, offset = 3)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(p2 == all.drop(3).take(3))
    val of = client.hybridSearchRequests("hr", reqs, k = 3,
      outputFields = Seq("grp"))
    assert(of.columns.toSeq == Seq("key", "rank_0", "rank_1", "rrf", "grp"))
    assert(of.collect().forall(r => Set("infra", "algo")(r.getString(4))))
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("hr", reqs, k = 10, offset = 25)
    }.getMessage.contains("fused pool"))
  }

  test("sparse-primary hybrid: [SparseField, Bm25Text] on a sparse " +
       "collection rides its own index — no Dense arm required") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-hr-sp").toString
    val client = new GraftClient(spark, root)
    client.createCollection("sp", dim = 0, metric = "dot",
      indexType = "SPARSE_INVERTED_INDEX", buckets = 2,
      vectorType = "SPARSE_FLOAT_VECTOR")
    val docsDf = docs.map { case (k, t, _) => (k, t) }.toDF("key", "text")
    client.upsert("sp", docsDf
      .select(col("key"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("key"), col("w")).agg(count(lit(1)).as("tf"))
      .groupBy(col("key"))
      .agg(map_from_entries(collect_list(
        struct(xxhash64(col("w")), col("tf").cast("double")))).as("vec"))
      .select(col("key"), col("vec"),
        map(lit("par"), when(expr("cast(substring(key, 2) as int) % 2 = 0"),
          lit("e")).otherwise(lit("o"))).as("meta")))
    client.buildTextIndex("sp", docsDf)
    client.buildIndex("sp", nlist = 4)
    val q = sq(client, "hash", "join", "pages")
    val viaN = client.hybridSearchRequests("sp",
        Seq(AnnRequest.SparseField(q), AnnRequest.Bm25Text("hash join")),
        k = 6)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    // driver model: rank each arm's own client output, fuse by RRF
    def rank(rows: Seq[(String, Double)]): Map[String, Int] =
      rows.sortBy { case (k, s) => (-s, k) }
        .zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }.toMap
    val sp = rank(client.searchSparse("sp", q, k = 15)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
    val bm = rank(client.fullTextSearch("sp", "hash join", k = 15)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
    val model = (sp.keySet ++ bm.keySet).toSeq.map { k =>
      val s = Seq(sp.get(k), bm.get(k)).flatten.map(r => 1.0 / (60 + r)).sum
      (k, math.rint(s * 1e6) / 1e6)
    }.sortBy { case (k, s) => (-s, k) }.take(6)
    assert(viaN == model)
    // per-arm expr on the sparse-primary arm routes through
    // searchSparse's OWN pre-filter (the collection owns its vectors —
    // a different path from the attached arm's post-topK gate): the
    // sparse arm sees only even-keyed docs, BM25 stays unfiltered
    val viaE = client.hybridSearchRequests("sp",
        Seq(AnnRequest.SparseField(q, expr = """par == "e""""),
          AnnRequest.Bm25Text("hash join")), k = 6)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    val spE = rank(client.searchSparse("sp", q, k = 15,
        filter = Some(element_at(col("meta"), "par") === "e"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
    val modelE = (spE.keySet ++ bm.keySet).toSeq.map { k =>
      val s = Seq(spE.get(k), bm.get(k)).flatten.map(r => 1.0 / (60 + r)).sum
      (k, math.rint(s * 1e6) / 1e6)
    }.sortBy { case (k, s) => (-s, k) }.take(6)
    assert(viaE == modelE,
      "the sparse-primary arm must honor its own expr through searchSparse")
    // and a Dense arm on the sparse collection still refuses
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("sp",
        Seq(AnnRequest.Dense(qvec), AnnRequest.SparseField(q)))
    }.getMessage.contains("searchSparse"))
  }

  test("partition_names scope every arm (Milvus hybrid_search parity); " +
       "Bm25Text merges multi-partition corpus stats (r15)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-hr-parts").toString
    val client = new GraftClient(spark, root)
    client.createCollection("hp", dim = 4, buckets = 2)
    client.createPartition("hp", "p1")
    def rowsOf(ks: Seq[String]) = docs.filter(d => ks.contains(d._1))
      .map { case (kk, _, g) =>
        (kk, vec(kk.drop(1).toInt), Map("grp" -> g)) }
      .toDF("key", "vec", "meta")
    client.upsert("hp", rowsOf(Seq("d1", "d2", "d3")))
    client.upsert("hp", rowsOf(Seq("d4", "d5", "d6")), partition = "p1")
    // per-partition text indexes (each carries its own corpus stats)
    def textsOf(ks: Seq[String]) = docs.filter(d => ks.contains(d._1))
      .map { case (kk, t, _) => (kk, t) }.toDF("key", "text")
    client.buildTextIndex("hp", textsOf(Seq("d1", "d2", "d3")))
    client.buildTextIndex("hp", textsOf(Seq("d4", "d5", "d6")), partition = "p1")
    // a partitioned collection refuses the ATTACHED sparse index (one
    // stamp cannot cover many partitions' snapshot clocks), so the
    // sparse arm rides a caller-managed sparseDir layout — and the
    // r14 scope gate must still restrict its hits to the partitions
    val spDir = s"$root/caller-sparse"
    graft.index.SparseIndex.build(docs.map { case (kk, t, _) => (kk, t) }
      .toDF("id", "text")
      .select(col("id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
      .select(col("id"), xxhash64(col("w")).as("dim"),
        col("tf").cast("double").as("w")), spDir)
    val q = sq(client, "hash", "join", "pages")
    def rank(rows: Seq[(String, Double)], asc: Boolean): Map[String, Int] =
      rows.sortBy { case (k, s) => (if (asc) s else -s, k) }
        .zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }.toMap
    def fuse(armRanks: Seq[Map[String, Int]], k: Int): Seq[(String, Double)] =
      armRanks.flatMap(_.keySet).distinct.map { kk =>
        val s = armRanks.flatMap(_.get(kk)).map(r => 1.0 / (60 + r)).sum
        (kk, math.rint(s * 1e6) / 1e6)
      }.sortBy { case (kk, s) => (-s, kk) }.take(k)

    // [Dense, SparseField] scoped to p1: both arms see only p1 rows
    val viaScoped = client.hybridSearchRequests("hp",
        Seq(AnnRequest.Dense(qvec), AnnRequest.SparseField(q, sparseDir = spDir)),
        k = 6, partitions = Seq("p1"))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    val p1Keys = Set("d4", "d5", "d6")
    assert(viaScoped.map(_._1).forall(p1Keys),
      s"scoped hybrid leaked non-p1 keys: $viaScoped")
    val denseP1 = rank(client.search("hp", qvec, 15, partitions = Seq("p1"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq, asc = true)
    // model the sparse arm directly: attached topK gated to p1 keys
    val spHits = graft.index.SparseIndex.topK(spark, spDir, q, 15, "dot")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .filter { case (kk, _) => p1Keys(kk) }
    val spRank = rank(spHits, asc = false)
    assert(viaScoped == fuse(Seq(denseP1, spRank), 6),
      "scoped [Dense, Sparse] must equal the per-arm scoped fusion")

    // [Dense, Bm25Text] scoped to p1: BM25 from p1's OWN text index
    val viaBm = client.hybridSearchRequests("hp",
        Seq(AnnRequest.Dense(qvec), AnnRequest.Bm25Text("hash join")),
        k = 6, partitions = Seq("p1"))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    val bmP1 = rank(client.fullTextSearch("hp", "hash join", k = 15,
        partition = "p1")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq, asc = false)
    assert(viaBm == fuse(Seq(denseP1, bmP1), 6),
      "scoped [Dense, Bm25Text] must ride p1's own text index")

    // Bm25Text with two named partitions (r15): the arm scores from the
    // MERGED corpus stats — equal to fullTextSearch's own multi-partition
    // scope (the global-stats contract is FullTextSearchSpec's pin)
    val viaBm2 = client.hybridSearchRequests("hp",
        Seq(AnnRequest.Bm25Text("hash join")),
        k = 6, partitions = Seq("_default", "p1"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    val bmBoth = rank(client.fullTextSearch("hp", "hash join", k = 15,
        partitions = Seq("_default", "p1"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq, asc = false)
    assert(viaBm2 == fuse(Seq(bmBoth), 6),
      "2-partition Bm25Text arm must rank from the merged stats base")
    // a typo'd partition refuses loudly
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("hp", Seq(AnnRequest.Dense(qvec)),
        partitions = Seq("nope"))
    }.getMessage.contains("no partition"))
  }

  test("validation: rankers, weights, arm preconditions") {
    val client = mkClient()
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("hr", Nil, k = 1)
    }.getMessage.contains("at least one"))
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("hr", Seq(AnnRequest.Dense(qvec)),
        ranker = "max")
    }.getMessage.contains("rrf"))
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("hr",
        Seq(AnnRequest.Dense(qvec, weight = 1.5)), ranker = "weighted")
    }.getMessage.contains("[0, 1]"))
    // consistency_level (pymilvus parity): validated up front regardless
    // of the arm mix; a valid level threads to the read-resolving arms
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("hr", Seq(AnnRequest.Dense(qvec)),
        consistencyLevel = "Sorta")
    }.getMessage.contains("consistency"))
    assert(client.hybridSearchRequests("hr",
        Seq(AnnRequest.Dense(qvec), AnnRequest.SparseField(sq(client, "hash"))),
        k = 3, consistencyLevel = "Session")
      .count() > 0, "a valid level must pass through both arms")
    // a Bm25Text arm on a stale text index raises loudly mid-plan
    import spark.implicits._
    client.upsert("hr", Seq(("dx", Seq(0f, 0f, 0f, 1f),
      Map.empty[String, String])).toDF("key", "vec", "meta"))
    assert(intercept[IllegalArgumentException] {
      client.hybridSearchRequests("hr",
        Seq(AnnRequest.Dense(qvec), AnnRequest.Bm25Text("hash")))
    }.getMessage.contains("STALE"))
  }
}
