package graft.index

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** HNSW graph index — the fourth member of the backend's `index_type`
  * family (the reference pins IVF_FLAT at
  * `milvus-app/pythonvectordbceph_milvus.py:101`; Milvus's AUTOINDEX
  * default resolves to HNSW, so a migrating user declaring no index type
  * lands here).
  *
  * Spark-native formulation of the public hierarchical-NSW algorithm
  * (Malkov & Yashunin 2016, the construction hnswlib/FAISS/Milvus all
  * ship): graph search is pointer-chasing — the one access pattern a
  * columnar scan cannot express — so the corpus is split into SHARDS
  * (one per store hash bucket, `pmod(xxhash64(key), buckets)` — the
  * keyed store's own route), each shard's graph is built executor-side
  * and persisted as ONE parquet row (a serialized blob), and a search is
  * scatter-gather: every task deserializes whole graphs (parquet rows
  * never split across tasks), walks each with beam width `ef`, and the
  * per-shard top candidates merge through one global TakeOrdered. This
  * is exactly Milvus's own per-SEGMENT HNSW architecture — sublinear
  * distance evaluations inside each shard, embarrassingly parallel
  * across shards, zero shuffle at query time. Sizing contract: one
  * shard's graph must fit a task (the same "one bucket fits an
  * executor" rule the keyed store's bucket count already carries).
  *
  * Determinism (the maintenance contract every index layout here
  * honors): a node's level is a pure hash of its key, insertion order is
  * key order, and every heap tie breaks on (distance, node id) — so
  * rebuilding a shard from the same rows reproduces the same graph
  * bit-for-bit.
  *
  * Exactness escape hatch: layer 0 is made CONNECTED at build (repair
  * pass below), so a walk with `ef >= n` provably visits every node —
  * the beam never discards a candidate before the result set holds the
  * whole shard. `ef >= max shard size` therefore degrades to an exact
  * (if graph-ordered) scan, the same correctness fallback role
  * `nprobe = nlist` plays for IVF — and it runs THROUGH the real walk,
  * which is what lets a DuckDB oracle pin the whole pipeline.
  */
object HnswIndex {

  /** In-memory graph of one shard. `vecs` is the flat n×dim float copy
    * the walk computes distances against (assign space: raw for l2,
    * unit-normalized for cosine — stage 2 re-ranks in the collection's
    * own metric against the store). `links(i)(l)` = neighbor node ids of
    * node `i` at layer `l` (l ≤ levels(i)). */
  final class Graph(val dim: Int,
                    val m: Int,
                    val keys: Array[String],
                    val vecs: Array[Float],
                    val levels: Array[Int],
                    val links: Array[Array[Array[Int]]],
                    val entry: Int,
                    val maxLevel: Int) {
    def n: Int = keys.length
  }

  /** hnswlib's level-generation constant: mL = 1/ln(M). */
  private def mL(m: Int): Double = 1.0 / math.log(m.toDouble)

  /** Deterministic node level — a pure function of the KEY (not of
    * insertion order or an RNG stream), so a shard rebuild after
    * upserts/deletes reassigns every surviving node its old level. */
  def levelFor(key: String, m: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(key, 0x9747b28c)
    // map the 31-bit hash into (0, 1) exclusive at both ends
    val u = ((h & 0x7fffffff).toDouble + 1.0) / (Int.MaxValue.toDouble + 2.0)
    math.floor(-math.log(u) * mL(m)).toInt
  }

  private def l2sq(vecs: Array[Float], node: Int, dim: Int, q: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val base = node * dim
    // double subtraction, double accumulate — the same decomposition the
    // engine's other driver-side kernels use (IvfIndex.l2sq)
    while (i < dim) { val d = vecs(base + i).toDouble - q(i); s += d * d; i += 1 }
    s
  }

  /** Primitive binary heap over (dist, id) pairs in parallel arrays —
    * the walk/build inner loops run millions of heap ops per shard, and
    * a boxed `PriorityQueue[(Double, Int)]` measurably dominated the 1M
    * build (every insert a Tuple2 + Double box). `maxHeap = false`
    * orders nearest-first, `true` farthest-first; ties break on the id
    * in the SAME direction as the distance (lexicographic (dist, id)),
    * the one tie rule the whole module shares (determinism). */
  private final class NodeHeap(initCap: Int, maxHeap: Boolean) {
    private var ds = new Array[Double](math.max(4, initCap))
    private var ids = new Array[Int](ds.length)
    private var n = 0
    def size: Int = n
    def isEmpty: Boolean = n == 0
    def peekDist: Double = ds(0)
    def peekId: Int = ids(0)
    /** (a) strictly precedes (b) in heap order. */
    private def prec(da: Double, ia: Int, db: Double, ib: Int): Boolean = {
      val c = java.lang.Double.compare(da, db)
      val asc = if (c != 0) c < 0 else ia < ib
      if (maxHeap) !asc && (c != 0 || ia != ib) else asc
    }
    def add(d: Double, id: Int): Unit = {
      if (n == ds.length) {
        ds = java.util.Arrays.copyOf(ds, n * 2)
        ids = java.util.Arrays.copyOf(ids, n * 2)
      }
      var i = n; n += 1
      while (i > 0 && prec(d, id, ds((i - 1) / 2), ids((i - 1) / 2))) {
        ds(i) = ds((i - 1) / 2); ids(i) = ids((i - 1) / 2)
        i = (i - 1) / 2
      }
      ds(i) = d; ids(i) = id
    }
    def poll(): Int = {
      val top = ids(0)
      n -= 1
      if (n > 0) {
        val d = ds(n); val id = ids(n)
        var i = 0
        var done = false
        while (!done) {
          var c = 2 * i + 1
          if (c >= n) done = true
          else {
            if (c + 1 < n && prec(ds(c + 1), ids(c + 1), ds(c), ids(c))) c += 1
            if (prec(ds(c), ids(c), d, id)) {
              ds(i) = ds(c); ids(i) = ids(c); i = c
            } else done = true
          }
        }
        ds(i) = d; ids(i) = id
      }
      top
    }
  }

  /** Beam search within one layer (Algorithm 2 of the paper): best-first
    * from `eps`, visited-set guarded, result bounded to `ef`. With
    * `ef >= n` the bound never evicts, the expansion never early-stops,
    * and every node reachable from `eps` at this layer is visited — the
    * exactness contract the connectivity repair makes total. Returns
    * the ≤ ef results sorted ASC by (dist, id).
    *
    * `keep` (null = unfiltered) is the FILTERED-walk mask — the
    * hnswlib/Milvus filtered-search approach: non-passing nodes are
    * still TRAVERSED (they stay valid beam waypoints — a passing node's
    * only graph path may run through filtered-out neighbors) but never
    * enter the RESULT heap, so `ef` bounds PASSING results. The
    * exactness contract survives filtering: with `ef >=` the number of
    * passing nodes, the result heap never fills, the early-stop never
    * fires, and the walk visits every node reachable from `eps` — so
    * every passing node is found. */
  private def searchLayer(g: Graph, q: Array[Float], eps: Seq[Int],
                          ef: Int, layer: Int,
                          keep: java.util.BitSet = null): (Array[Double], Array[Int]) = {
    val visited = new java.util.BitSet(g.n)
    val cand = new NodeHeap(64, maxHeap = false) // nearest first
    val res = new NodeHeap(math.min(ef + 1, 1 << 16), maxHeap = true) // farthest first
    eps.distinct.foreach { e =>
      if (!visited.get(e)) {
        visited.set(e)
        val d = l2sq(g.vecs, e, g.dim, q)
        cand.add(d, e)
        if (keep == null || keep.get(e)) res.add(d, e)
      }
    }
    while (res.size > ef) res.poll()
    var done = false
    while (!done && !cand.isEmpty) {
      val cd = cand.peekDist
      val ci = cand.poll()
      if (res.size >= ef && cd > res.peekDist) done = true
      else {
        val nbrs = g.links(ci)(layer)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (!visited.get(nb)) {
            visited.set(nb)
            val d = l2sq(g.vecs, nb, g.dim, q)
            if (res.size < ef || d < res.peekDist ||
                (d == res.peekDist && nb < res.peekId)) {
              cand.add(d, nb)
              if (keep == null || keep.get(nb)) {
                res.add(d, nb)
                if (res.size > ef) res.poll()
              }
            }
          }
          i += 1
        }
      }
    }
    drainAsc(res)
  }

  /** Drain a max-heap into (dists, ids) sorted ASC by (dist, id). */
  private def drainAsc(res: NodeHeap): (Array[Double], Array[Int]) = {
    val outD = new Array[Double](res.size)
    val outI = new Array[Int](res.size)
    var i = res.size - 1
    while (i >= 0) { outD(i) = res.peekDist; outI(i) = res.poll(); i -= 1 }
    (outD, outI)
  }

  /** hnswlib's neighbor-selection heuristic (Algorithm 4): scan
    * candidates nearest-first, keep one only if it is closer to the
    * query node than to every already-kept neighbor — the diversity rule
    * that keeps the graph navigable in clustered data. Deterministic:
    * input sorted by (dist, id). */
  private def selectNeighbors(g: Graph, cd: Array[Double], ci: Array[Int],
                              m: Int): Array[Int] = {
    val kept = new Array[Int](math.min(m, ci.length))
    var nk = 0
    var i = 0
    while (i < ci.length && nk < m) {
      val dq = cd(i); val c = ci(i)
      var ok = true
      var j = 0
      while (ok && j < nk) {
        if (nodeDistSq(g, c, kept(j)) < dq) ok = false
        j += 1
      }
      if (ok) { kept(nk) = c; nk += 1 }
      i += 1
    }
    if (nk == kept.length) kept else java.util.Arrays.copyOf(kept, nk)
  }

  private def nodeDistSq(g: Graph, a: Int, b: Int): Double = {
    var s = 0.0
    var i = 0
    val ba = a * g.dim; val bb = b * g.dim
    while (i < g.dim) { val d = g.vecs(ba + i).toDouble - g.vecs(bb + i); s += d * d; i += 1 }
    s
  }

  /** Re-run the selection heuristic on an overfull adjacency list —
    * the shrink step after a bidirectional link pushes a node past its
    * degree cap (M on upper layers, 2M on layer 0, hnswlib's split). */
  private def shrink(g: Graph, node: Int, layer: Int, cap: Int): Unit = {
    val cur = g.links(node)(layer)
    if (cur.length > cap) {
      val cd = new Array[Double](cur.length)
      val ci = new Array[Int](cur.length)
      var i = 0
      while (i < cur.length) { cd(i) = nodeDistSq(g, node, cur(i)); ci(i) = cur(i); i += 1 }
      sortPairsAsc(cd, ci)
      g.links(node)(layer) = selectNeighbors(g, cd, ci, cap)
    }
  }

  /** In-place insertion sort of parallel (dist, id) arrays by (dist, id)
    * ASC — inputs here are adjacency-list-sized (≤ 2M+1). */
  private def sortPairsAsc(cd: Array[Double], ci: Array[Int]): Unit = {
    var i = 1
    while (i < cd.length) {
      val d = cd(i); val id = ci(i)
      var j = i - 1
      while (j >= 0 && (cd(j) > d || (cd(j) == d && ci(j) > id))) {
        cd(j + 1) = cd(j); ci(j + 1) = ci(j); j -= 1
      }
      cd(j + 1) = d; ci(j + 1) = id
      i += 1
    }
  }

  /** Build one shard's graph. `keys`/`vecs` must be pre-sorted by key
    * (the caller's determinism half); levels, insertion order, and every
    * tie rule supply the rest — same rows in, same graph out. */
  def build(keys: Array[String], vecs: Array[Float], dim: Int,
            m: Int, efConstruction: Int): Graph = {
    val n = keys.length
    require(n > 0, "cannot build an HNSW graph over zero rows")
    require(vecs.length == n.toLong * dim, "vecs length != n*dim")
    val levels = keys.map(k => levelFor(k, m))
    val links = Array.tabulate(n)(i => Array.fill(levels(i) + 1)(Array.empty[Int]))
    val g = new Graph(dim, m, keys, vecs, levels, links, 0, levels(0))
    var entry = 0
    var maxLevel = levels(0)
    val maxM0 = 2 * m
    val q = new Array[Float](dim)
    var i = 1
    while (i < n) {
      System.arraycopy(vecs, i * dim, q, 0, dim)
      val l = levels(i)
      var ep = entry
      // greedy descent through layers above the node's top level
      var layer = maxLevel
      while (layer > l) {
        var improved = true
        var dEp = l2sq(vecs, ep, dim, q)
        while (improved) {
          improved = false
          val nbrs = g.links(ep)(layer)
          var j = 0
          while (j < nbrs.length) {
            val d = l2sq(vecs, nbrs(j), dim, q)
            if (d < dEp || (d == dEp && nbrs(j) < ep)) {
              dEp = d; ep = nbrs(j); improved = true
            }
            j += 1
          }
        }
        layer -= 1
      }
      // connect on layers min(l, maxLevel) .. 0
      layer = math.min(l, maxLevel)
      var eps = Seq(ep)
      while (layer >= 0) {
        val (cd, ci) = searchLayer(g, q, eps, efConstruction, layer)
        val cap = if (layer == 0) maxM0 else m
        val sel = selectNeighbors(g, cd, ci, m)
        g.links(i)(layer) = sel
        sel.foreach { nb =>
          g.links(nb)(layer) = g.links(nb)(layer) :+ i
          shrink(g, nb, layer, cap)
        }
        // next layer starts from this layer's nearest result
        if (ci.nonEmpty) eps = Seq(ci(0))
        layer -= 1
      }
      if (l > maxLevel) { maxLevel = l; entry = i }
      i += 1
    }
    val built = new Graph(dim, m, keys, vecs, levels, links, entry, maxLevel)
    repairConnectivity(built)
    built
  }

  /** Make every layer-0 node reachable FROM THE ENTRY along OUT-edges.
    * Adjacency here is DIRECTED (bidirectional insertion, but `shrink`
    * prunes back-edges independently — a node can end up with no
    * in-edges at all), and the walk follows out-edges, so undirected
    * connectivity is not the property that matters. One BFS from the
    * entry, then for each still-unreached node (id order): add
    * entry→node + node→entry repair edges — appended past the degree
    * cap, since repair runs after the last shrink — and BFS from it.
    * Each node/edge is expanded once across all the BFS passes, so the
    * repair is O(n + E). HNSW's construction leaves the graph navigable
    * in practice but not by proof; the walk-with-ef≥n exactness
    * fallback (and the oracle query riding it) needs the guarantee,
    * not the tendency. */
  private def repairConnectivity(g: Graph): Unit = {
    if (g.n <= 1) return
    val reached = new java.util.BitSet(g.n)
    def bfs(start: Int): Unit = {
      var stack = List(start)
      reached.set(start)
      while (stack.nonEmpty) {
        val x = stack.head; stack = stack.tail
        g.links(x)(0).foreach { nb =>
          if (!reached.get(nb)) { reached.set(nb); stack = nb :: stack }
        }
      }
    }
    bfs(g.entry)
    var u = 0
    while (u < g.n) {
      if (!reached.get(u)) {
        g.links(g.entry)(0) = g.links(g.entry)(0) :+ u
        g.links(u)(0) = g.links(u)(0) :+ g.entry
        bfs(u)
      }
      u += 1
    }
  }

  /** Walk one graph: greedy descent to layer 1, then a beam of width
    * `max(ef, k)` on layer 0; up to `k` nearest (dist ASC, then key —
    * the engine's global tie rule) returned as (key, distSq).
    * `keep` (null = all) masks the RESULT set per [[searchLayer]] — the
    * filtered walk; the greedy descent ignores it (upper layers only
    * navigate). */
  def search(g: Graph, q: Array[Float], ef: Int, k: Int,
             keep: java.util.BitSet = null): Array[(String, Double)] = {
    var ep = g.entry
    var dEp = l2sq(g.vecs, ep, g.dim, q)
    var layer = g.maxLevel
    while (layer > 0) {
      var improved = true
      while (improved) {
        improved = false
        val nbrs = g.links(ep)(layer)
        var j = 0
        while (j < nbrs.length) {
          val d = l2sq(g.vecs, nbrs(j), g.dim, q)
          if (d < dEp || (d == dEp && nbrs(j) < ep)) {
            dEp = d; ep = nbrs(j); improved = true
          }
          j += 1
        }
      }
      layer -= 1
    }
    // seed with the entry too: the repair guarantees every node is
    // reachable from the ENTRY, not from an arbitrary greedy landing
    // point — without this seed the ef≥n exactness contract would
    // depend on the walk happening to pass through the entry's basin
    val (cd, ci) = searchLayer(g, q, Seq(ep, g.entry), math.max(ef, k), 0, keep)
    val kk = math.min(k, ci.length)
    Array.tabulate(kk)(j => (g.keys(ci(j)), cd(j)))
  }

  // ---- serialization (one blob per shard; format v1) ----

  private val Magic = 0x484E5357 // "HNSW"

  def serialize(g: Graph): Array[Byte] = {
    val bos = new ByteArrayOutputStream(g.n * (g.dim * 4 + 64))
    val out = new DataOutputStream(bos)
    out.writeInt(Magic); out.writeByte(1)
    out.writeInt(g.dim); out.writeInt(g.n); out.writeInt(g.m)
    out.writeInt(g.entry); out.writeInt(g.maxLevel)
    g.keys.foreach(out.writeUTF)
    g.levels.foreach(out.writeInt)
    var i = 0
    while (i < g.vecs.length) { out.writeFloat(g.vecs(i)); i += 1 }
    i = 0
    while (i < g.n) {
      var l = 0
      while (l <= g.levels(i)) {
        val nb = g.links(i)(l)
        out.writeInt(nb.length)
        nb.foreach(out.writeInt)
        l += 1
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Graph = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not an HNSW graph blob")
    val ver = in.readByte()
    require(ver == 1, s"unknown HNSW blob version $ver")
    val dim = in.readInt(); val n = in.readInt(); val m = in.readInt()
    val entry = in.readInt(); val maxLevel = in.readInt()
    val keys = Array.fill(n)(in.readUTF())
    val levels = Array.fill(n)(in.readInt())
    val vecs = new Array[Float](n * dim)
    var i = 0
    while (i < vecs.length) { vecs(i) = in.readFloat(); i += 1 }
    val links = Array.tabulate(n) { node =>
      Array.fill(levels(node) + 1) {
        val c = in.readInt()
        Array.fill(c)(in.readInt())
      }
    }
    new Graph(dim, m, keys, vecs, levels, links, entry, maxLevel)
  }

  // ---- Spark-side build / search over the sharded blob layout ----

  /** Build every shard's graph from a (key, assign-space vec) frame and
    * return (shard, n, blob) — ONE row per shard. The groupByKey is the
    * build's one shuffle (same budget as the IVF build's clustering
    * repartition); each group materializes one shard in one task, which
    * is the store's own "one bucket fits an executor" sizing contract. */
  def buildShards(df: DataFrame, vecCol: String, buckets: Int,
                  m: Int, efConstruction: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("key").cast("string"),
        col(vecCol).cast("array<float>").as("__v"),
        pmod(xxhash64(col("key")), lit(buckets.toLong)).cast("int").as("shard"))
      .as[(String, Array[Float], Int)]
      .groupByKey(_._3)
      .mapGroups { (shard, it) =>
        val rows = it.toArray.sortBy(_._1) // key order = insertion order
        val dim = rows(0)._2.length
        val keys = rows.map(_._1)
        val vecs = new Array[Float](rows.length * dim)
        var i = 0
        while (i < rows.length) {
          System.arraycopy(rows(i)._2, 0, vecs, i * dim, dim)
          i += 1
        }
        val g = build(keys, vecs, dim, m, efConstruction)
        (shard, rows.length, serialize(g))
      }
      .toDF("shard", "n", "blob")
  }

  /** Persist shard graphs partitioned by shard — one directory per
    * shard so maintenance rewrites touched shards with the same dynamic
    * partition overwrite the cell layouts use. UNCOMPRESSED: the blobs
    * are float-dense (≈ incompressible), and every unloaded search
    * re-reads them — snappy here bought ~nothing at rest and taxed each
    * query with a full-layout decompress. */
  def writeShards(shards: DataFrame, path: String): Unit =
    shards.write.mode("overwrite").option("compression", "uncompressed")
      .partitionBy("shard").parquet(path)

  def shardsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL("n INT, blob BINARY, shard INT")

  def loadShards(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(shardsSchema).parquet(path)

  /** Approximate resident bytes of a deserialized graph: the flat float
    * copy dominates (n·dim·4); adjacency adds 4 bytes per edge plus an
    * object header per list; keys cost ~2 bytes/char plus per-node
    * String/array overhead (the 48 constant). An estimate is the right
    * tool — the budget guards against order-of-magnitude accretion, not
    * byte-exact accounting. */
  private[graft] def approxGraphBytes(g: Graph): Long = {
    var edges = 0L
    var arrays = 0L
    var keyChars = 0L
    var i = 0
    while (i < g.n) {
      val ls = g.links(i)
      arrays += ls.length
      var l = 0
      while (l < ls.length) { edges += ls(l).length; l += 1 }
      keyChars += g.keys(i).length
      i += 1
    }
    g.vecs.length.toLong * 4 + edges * 4 + arrays * 16 +
      keyChars * 2 + g.n.toLong * 48
  }

  /** Executor-side deserialized-graph cache: a walk is milliseconds but
    * deserializing a multi-MB blob is not, and interactive search hits
    * the same graphs every query. Keyed by (cacheTag, shard) where the
    * tag carries the index PATH + VERSION — a maintenance commit stamps
    * a new version, which misses here and lazily re-warms, exactly the
    * write-once invalidation story the loaded-frame cache uses.
    *
    * Bounded by APPROXIMATE BYTES, not entry count (r12's 64-graph LRU
    * could pin ~8 GB of dim-384 shards — an OOM hazard on an executor
    * serving many loaded HNSW collections): eldest-accessed entries are
    * evicted until the estimate fits the budget. The budget is a lazy
    * read of `-Dgraft.hnsw.cacheBytes` (default 2 GiB — a minority
    * share of a typical executor heap; ops size it with the executor). */
  private[graft] def cacheBudgetBytes: Long =
    java.lang.Long.getLong("graft.hnsw.cacheBytes", 2L << 30)

  private lazy val graphCache =
    new java.util.LinkedHashMap[(String, Int), Graph](16, 0.75f, true)
  private var cachedBytesTotal = 0L

  private def cachedGraph(tag: String, shard: Int, blob: Array[Byte]): Graph =
    if (tag.isEmpty) deserialize(blob)
    else graphCache.synchronized {
      val hit = graphCache.get((tag, shard))
      if (hit != null) hit
      else {
        val g = deserialize(blob)
        graphCache.put((tag, shard), g)
        cachedBytesTotal += approxGraphBytes(g)
        val budget = cacheBudgetBytes
        val it = graphCache.entrySet().iterator()
        // evict eldest-accessed first, down to budget — but never the
        // entry just inserted (it is in use by this task; a single
        // over-budget graph serves once and yields on the next insert)
        while (cachedBytesTotal > budget && graphCache.size() > 1 && it.hasNext) {
          val e = it.next()
          if (e.getKey != ((tag, shard))) {
            cachedBytesTotal -= approxGraphBytes(e.getValue)
            it.remove()
          }
        }
        g
      }
    }

  // test/ops observability for the byte budget
  private[graft] def cachedGraphCount: Int =
    graphCache.synchronized(graphCache.size())
  private[graft] def cachedGraphBytes: Long =
    graphCache.synchronized(cachedBytesTotal)
  private[graft] def clearGraphCache(): Unit = graphCache.synchronized {
    graphCache.clear(); cachedBytesTotal = 0L
  }

  /** Scatter-gather single-query search: each task walks whole graphs
    * (a parquet row never splits), emits its shards' top candidates;
    * the caller merges with one global TakeOrdered. `perShard` bounds
    * the per-shard emission (candidate-pool depth, not recall-critical
    * past ef). Returns (key, adist) with adist = SQUARED assign-space
    * L2 — rank-equivalent, and stage 2 re-ranks exactly anyway.
    * `cacheTag` ("" = uncached) keys the executor graph cache and MUST
    * change when the layout changes (pass path@version). */
  def searchShards(shards: DataFrame, q: Array[Float], ef: Int,
                   perShard: Int, cacheTag: String = ""): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select(col("shard"), col("blob")).as[(Int, Array[Byte])]
      .flatMap { case (shard, blob) =>
        val g = cachedGraph(cacheTag, shard, blob)
        search(g, q, ef, math.min(perShard, g.n)).iterator
      }
      .toDF("key", "adist")
  }

  /** FILTERED scatter-gather search (the hnswlib/Milvus filtered-HNSW
    * shape, r13): `passing` is a (shard INT, key STRING) frame naming
    * the rows the query's predicate admits; each task builds its shard's
    * node mask (one bitset over the graph's key array) and walks with
    * the RESULT set restricted to passing nodes while still traversing
    * through non-passing ones ([[searchLayer]]'s `keep` contract — a
    * passing node's only graph path may run through filtered-out
    * neighbors, so masking must never prune the traversal itself).
    *
    * The per-shard key lists ride a `collect_list` groupBy — bounded by
    * shard size, the store's own "one bucket fits an executor" sizing
    * contract, and the JOIN is inner: a shard with no passing key is
    * never deserialized at all (the selective-filter win: the walk
    * reads graph blobs and metadata keys, never the corpus's vectors).
    * Exactness: with `ef >=` a shard's passing count the masked walk is
    * provably exhaustive over passing nodes (connectivity repair +
    * never-filling result heap), so `ef >= n` keeps the same oracle
    * fallback the unfiltered walk has. */
  def searchShardsFiltered(shards: DataFrame, q: Array[Float], ef: Int,
                           perShard: Int, passing: DataFrame,
                           cacheTag: String = ""): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    val grouped = passing
      .select(col("shard").cast("int").as("shard"),
        col("key").cast("string").as("key"))
      .groupBy(col("shard")).agg(collect_list(col("key")).as("__keys"))
    shards.join(grouped, Seq("shard"))
      .select(col("shard"), col("blob"), col("__keys"))
      .as[(Int, Array[Byte], Seq[String])]
      .flatMap { case (shard, blob, keys) =>
        val g = cachedGraph(cacheTag, shard, blob)
        val keySet = keys.toSet
        val keep = new java.util.BitSet(g.n)
        var i = 0
        while (i < g.n) { if (keySet.contains(g.keys(i))) keep.set(i); i += 1 }
        search(g, q, ef, math.min(perShard, g.n), keep).iterator
      }
      .toDF("key", "adist")
  }

  /** Batched multi-query twin: every task walks each of its graphs once
    * PER QUERY — Q·shards walks total, still one pass over the blob
    * layout. Emits (qid, key, adist). */
  def searchShardsBatch(shards: DataFrame, queries: Array[(Long, Array[Float])],
                        ef: Int, perShard: Int, cacheTag: String = ""): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    val qBc = spark.sparkContext.broadcast(queries)
    shards.select(col("shard"), col("blob")).as[(Int, Array[Byte])]
      .flatMap { case (shard, blob) =>
        val g = cachedGraph(cacheTag, shard, blob)
        qBc.value.iterator.flatMap { case (qid, q) =>
          search(g, q, ef, math.min(perShard, g.n)).iterator
            .map { case (k, d) => (qid, k, d) }
        }
      }
      .toDF("qid", "key", "adist")
  }

  /** FILTERED batched walk — [[searchShardsFiltered]]'s mask contract
    * (one predicate's passing keys, shared by every query in the batch)
    * composed with [[searchShardsBatch]]'s one-pass shape: each task
    * builds its shard's node mask ONCE and walks it per query. Shards
    * with no passing key are never deserialized (inner join). Emits
    * (qid, key, adist). */
  def searchShardsBatchFiltered(shards: DataFrame,
                                queries: Array[(Long, Array[Float])],
                                ef: Int, perShard: Int, passing: DataFrame,
                                cacheTag: String = ""): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    val qBc = spark.sparkContext.broadcast(queries)
    val grouped = passing
      .select(col("shard").cast("int").as("shard"),
        col("key").cast("string").as("key"))
      .groupBy(col("shard")).agg(collect_list(col("key")).as("__keys"))
    shards.join(grouped, Seq("shard"))
      .select(col("shard"), col("blob"), col("__keys"))
      .as[(Int, Array[Byte], Seq[String])]
      .flatMap { case (shard, blob, keys) =>
        val g = cachedGraph(cacheTag, shard, blob)
        val keySet = keys.toSet
        val keep = new java.util.BitSet(g.n)
        var i = 0
        while (i < g.n) { if (keySet.contains(g.keys(i))) keep.set(i); i += 1 }
        qBc.value.iterator.flatMap { case (qid, q) =>
          search(g, q, ef, math.min(perShard, g.n), keep).iterator
            .map { case (k, d) => (qid, k, d) }
        }
      }
      .toDF("qid", "key", "adist")
  }
}
