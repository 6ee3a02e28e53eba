package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.t
import graft.functions.BinaryVectorFunctions._

/** Binary-vector metrics + sparse-vector search (Milvus BINARY_VECTOR /
  * SPARSE_FLOAT_VECTOR envelope — the two vector families the reference's
  * backend supports beyond dense float, `milvus-app/` drives the dense one).
  *
  * Scale posture:
  *   - The binary KNNs plan exactly like the dense family —
  *     `TakeOrderedAndProject(Project(dist, Scan))`, one fused codegen pass
  *     holding k rows per partition — but the per-row work is 6 XOR+popcounts
  *     over packed longs instead of 384 float ops, which is why sign-bit
  *     pre-ranking is the cheap first stage over a 100 TB embedding store.
  *   - The sparse dot-product is the inverted-posting join: explode to
  *     (doc, term, weight) postings, broadcast the query's nonzero terms,
  *     join and partial-sum per doc BEFORE the one shuffle. Work and shuffle
  *     are Σ df(query term) — the corpus rows that share no term with the
  *     query are never touched, the same reason Milvus stores sparse vectors
  *     as an inverted index (WAND-style) rather than scanning.
  */
object SparseBinaryQueries {

  /** Query codes = sign-binarized embedding of vec_id 0, as a 1-row broadcast. */
  private def withQueryCodes(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), pack_sign_bits(col("embedding")).as("codes"))
    val q = emb.filter(col("vec_id") === 0L).select(col("codes").as("qcodes"))
    emb.crossJoin(broadcast(q))
  }

  /** Milvus BINARY_VECTOR + HAMMING: top-10 by Hamming distance between
    * sign-binarized embeddings (the standard binarize-then-rerank recipe).
    * The kernel runs over packed 64-bit words; the oracle recomputes the
    * same count as per-position sign disagreement — identical by
    * construction (packing is a bijection on sign patterns). */
  def knnHamming(spark: SparkSession, dir: String): DataFrame =
    withQueryCodes(spark, dir)
      .select(col("vec_id"),
        hamming_distance(col("codes"), col("qcodes")).as("dist"), col("label"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)

  /** Milvus BINARY_VECTOR + JACCARD: top-10 by Jaccard distance
    * 1 − |A∩B|/|A∪B| over the sign-bit sets. Rounded to 6 places on both
    * sides (the ratio of exact small ints is the same double in both
    * engines; the round is belt-and-braces for the hash compare). */
  def binaryJaccard(spark: SparkSession, dir: String): DataFrame =
    withQueryCodes(spark, dir)
      .select(col("vec_id"),
        round(jaccard_distance(col("codes"), col("qcodes")), 6).as("dist"), col("label"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)

  /** Milvus SPARSE_FLOAT_VECTOR search: docs as sparse term-frequency
    * vectors (dims = vocabulary terms, weights = tf), query = doc 0's own
    * sparse vector, score = sparse dot product, plus the cosine the dot
    * normalizes into. Top-10 by dot.
    *
    * Plan shape (the part that survives 100 TB): tf postings are built once
    * per side from the same explode→groupBy (map-side combined); the query
    * side is filtered to ONE doc before its broadcast, so the join streams
    * each matching posting list exactly once; per-doc norms join on doc_id
    * without a hint (AQE broadcasts while small). No row without a shared
    * term ever reaches the aggregation. */
  def sparseDotTopK(spark: SparkSession, dir: String): DataFrame = {
    val tf = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val q = tf.filter(col("doc_id") === 0L).select(col("word"), col("tf").as("qtf"))
    val nrm = tf.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("tf") * col("tf")).cast("double")).as("nrm"))
    val qn = nrm.filter(col("doc_id") === 0L).select(col("nrm").as("qnrm"))
    tf.join(broadcast(q), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("qtf")).as("dot"))
      .join(nrm, Seq("doc_id"))
      .crossJoin(broadcast(qn))
      .select(col("doc_id"), col("dot"),
        round(col("dot").cast("double") / (col("nrm") * col("qnrm")), 6).as("cosine"))
      .orderBy(desc("dot"), col("doc_id"))
      .limit(10)
  }

  // Shared (doc_id, dim, w) sparse postings for the at-rest index query:
  // dims = xxhash64(word) — score-neutral as long as the hash is
  // injective on the corpus vocabulary (64-bit hash over ~10^4 words;
  // the fixed test corpus makes the check deterministic: a collision
  // would fail the oracle hash compare loudly, not silently).
  private def hashedPostings(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), xxhash64(col("word")).as("dim"),
        col("tf").cast("double").as("w"))

  // Build ONCE per (dir, process) — the postingsFor pattern. The layout
  // is deliberately built in two SEGMENTS with a correction: the base
  // build doubles doc 0's weights (a wrong first version), then a delta
  // append re-upserts the correct doc 0 — so the tombstone MASKING is
  // load-bearing for the oracle hash: if a superseded row leaked, doc
  // 0's dot would double-count and diverge.
  private val sparseIdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def sparseIdxFor(spark: SparkSession, dir: String): String =
    sparseIdxCache.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files.createTempDirectory("graft-sparseidx").toString
      val tf = hashedPostings(spark, d)
      graft.index.SparseIndex.build(
        tf.withColumn("w",
          when(col("doc_id") === 0L, col("w") * 2).otherwise(col("w"))),
        p, buckets = 32, idCol = "doc_id")
      graft.index.SparseIndex.append(tf.filter(col("doc_id") === 0L), p)
      p
    })

  /** B7 — the AT-REST segmented sparse index on the ORACLE path: the
    * same corpus/query as `sparse_dot_topk`, but scored through
    * [[graft.index.SparseIndex.topK]] over the two-segment layout built
    * above (bucket partition prune + pushed `dim IN`, later-segment
    * tombstones masked). Emits (doc_id, dot), top-10 — hash-equal to
    * the raw DuckDB brute force only if the prune is lossless AND the
    * re-upsert masking holds. */
  def sparseIndexTopK(spark: SparkSession, dir: String): DataFrame = {
    val idx = sparseIdxFor(spark, dir)
    val q = hashedPostings(spark, dir).filter(col("doc_id") === 0L)
      .select(col("dim"), col("w")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq // one doc's vocab
    graft.index.SparseIndex.topK(spark, idx, q, k = 10, "dot")
      .select(col("doc_id"), col("score").cast("long").as("dot"))
  }

  /** Milvus multi-vector `hybrid_search` (two AnnSearchRequests fused by
    * RRFRanker): a DENSE arm (exact L2 over the embedding field) and a
    * SPARSE arm (term-tf dot product over the lexical field — the
    * SPLADE/BM25-shaped second vector every 2024+ RAG stack carries),
    * each top-15-pushed before its ≤15-row rank window, fused by
    * reciprocal rank `Σ 1/(60 + rank)`, top-10. `doc_id` aligns with
    * `vec_id` in the fixture — the same corpus carrying both fields.
    *
    * Scale shape: the arms never materialize more than 15 rows past
    * their TakeOrdered; the sparse arm's work is Σ df(query term) (the
    * inverted-posting join above); the fuse is a 15×15 full-outer. */
  def hybridDenseSparse(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.l2_distance
    val tf = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val q = tf.filter(col("doc_id") === 0L).select(col("word"), col("tf").as("qtf"))
    val sparseTop = tf.join(broadcast(q), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("qtf")).as("dot"))
      .orderBy(desc("dot"), col("doc_id")).limit(15)
    val emb = t(spark, dir, "embeddings")
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qvec"))
    val denseTop = emb.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        l2_distance(col("embedding"), col("qvec")).as("dist"))
      .orderBy(col("dist"), col("doc_id")).limit(15)
    val sp = sparseTop.select(col("doc_id"),
      row_number().over(Window.orderBy(desc("dot"), col("doc_id")))
        .cast("long").as("sp_rank"))
    val dn = denseTop.select(col("doc_id"),
      row_number().over(Window.orderBy(col("dist"), col("doc_id")))
        .cast("long").as("vec_rank"))
    sp.join(dn, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("sp_rank"), col("vec_rank"),
        round(coalesce(lit(1.0) / (lit(60) + col("sp_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)), 6).as("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
      .limit(10)
  }

  /** Per-JVM SPARSE_FLOAT_VECTOR client collection over the documents'
    * hashed tf postings — the FULL lifecycle on the oracle path (r13):
    * `createCollection(vectorType = "SPARSE_FLOAT_VECTOR")` (Milvus's
    * sparse field type: (dim → weight) maps, no fixed dim), the maps
    * through the keyed store's write path,
    * `buildIndex("SPARSE_INVERTED_INDEX")` persisting the dim-bucketed
    * postings layout VERSION-stamped — deliberately over a WRONG base
    * (doc 0's weights doubled), corrected by a re-upsert and poisoned
    * by an upsert-then-delete decoy that would rank #1 if a tombstone
    * leaked: the AUTO-maintenance both merge commits run (the sparse
    * collection's store owns its vectors, so deltas are self-derived)
    * is load-bearing for the oracle hash, not just the freshness bit. */
  private val sparseClientRootCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def sparseClientFor(spark: SparkSession, dir: String): graft.api.GraftClient = {
    val root = sparseClientRootCache.computeIfAbsent(dir, { d =>
      val r = java.nio.file.Files.createTempDirectory("graft-sparsecli").toString
      val c = new graft.api.GraftClient(spark, r)
      c.createCollection("docsparse", dim = 0, metric = "dot",
        indexType = "SPARSE_INVERTED_INDEX", buckets = 4,
        vectorType = "SPARSE_FLOAT_VECTOR")
      val tf = hashedPostings(spark, d)
      def rows(p: DataFrame) = p.groupBy(col("doc_id"))
        .agg(map_from_entries(collect_list(struct(col("dim"), col("w"))))
          .as("vec"))
        .select(lpad(col("doc_id").cast("string"), 8, "0").as("key"),
          col("vec"),
          map(lit("band"), (col("doc_id") % 2).cast("string")).as("meta"))
      c.upsert("docsparse", rows(tf.withColumn("w",
        when(col("doc_id") === 0L, col("w") * 2).otherwise(col("w")))))
      c.buildIndex("docsparse", nlist = 8)
      // corrective re-upsert: tombstones doc 0's doubled base postings
      c.upsert("docsparse", rows(tf.filter(col("doc_id") === 0L)))
      // decoy sharing a query dim at weight 1000 — top hit if the
      // delete's tombstone failed to mask it
      val qd = tf.filter(col("doc_id") === 0L).select("dim").head().getLong(0)
      import spark.implicits._
      c.upsert("docsparse", Seq(
        ("99999999", Map(qd -> 1000.0), Map("band" -> "1")))
        .toDF("key", "vec", "meta"))
      c.deleteByKeys("docsparse", Seq("99999999"))
      // attach the text index LAST (fresh at the final snapshot) — the
      // TEXT_MATCH gates of sparse_client_milvus resolve through it
      c.buildTextIndex("docsparse", t(spark, d, "documents").select(
        lpad(col("doc_id").cast("string"), 8, "0").as("key"), col("text")))
      r
    })
    new graft.api.GraftClient(spark, root)
  }

  private def sparseClientQuery(spark: SparkSession, dir: String): Seq[(Long, Double)] =
    hashedPostings(spark, dir).filter(col("doc_id") === 0L)
      .select(col("dim"), col("w")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** B7 (r13) — Milvus SPARSE_FLOAT_VECTOR search THROUGH the client
    * collection on the ORACLE path: top-10 by sparse dot against doc
    * 0's own tf vector, served from the auto-maintained
    * SPARSE_INVERTED_INDEX (freshness asserted — a stale stamp would
    * silently exact-scan; the postings layout is plan-asserted — the
    * exact arm returns identical values here by design, so dispatch is
    * proven, not assumed). Hash-equal to DuckDB's brute force only if
    * the dim-bucket prune is lossless AND the wrong-base correction and
    * decoy delete were masked by the per-commit appends. */
  def sparseClientTopK(spark: SparkSession, dir: String): DataFrame = {
    val client = sparseClientFor(spark, dir)
    val idx = client.listIndexes("docsparse")
      .filter(col("kind") === "SPARSE_INVERTED_INDEX").head()
    require(idx.getBoolean(2),
      "sparse_client_topk: the SPARSE_INVERTED_INDEX must be FRESH — " +
        "per-commit auto-maintenance failed")
    val df = client.searchSparse("docsparse", sparseClientQuery(spark, dir), k = 10)
    require(df.queryExecution.executedPlan.toString.contains("In(dim"),
      "sparse_client_topk: search did not read the postings layout")
    df.select(col("vector_key").cast("long").as("doc_id"),
        col("score").cast("long").as("dot"))
      .orderBy(desc("dot"), col("doc_id"))
  }

  /** B2×B7 (r13) — the sparse family's FILTERED search on the oracle
    * path: the metadata gate (band = even doc_ids) rides the
    * index-arm's deepening fetch (per-doc-absolute scores make gating
    * after scoring order-preserving), so a selective filter cannot
    * short-return while matches remain — the oracle's WHERE replays
    * it. */
  def sparseClientFiltered(spark: SparkSession, dir: String): DataFrame = {
    val client = sparseClientFor(spark, dir)
    require(client.listIndexes("docsparse")
        .filter(col("kind") === "SPARSE_INVERTED_INDEX").head().getBoolean(2),
      "sparse_client_filtered: the index must be FRESH — a stale stamp " +
        "would route to the exact scan")
    val df = client.searchSparse("docsparse", sparseClientQuery(spark, dir),
      k = 10, filter = Some(element_at(col("meta"), "band") === "0"))
    // the filtered index arm's gated deepening ends in a localCheckpoint
    // (detaching from its persist), so the postings scan is no longer in
    // the final plan — the checkpointed candidate RDD is, and only the
    // index arm produces one (the exact arm is a single parquet plan)
    require(df.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "sparse_client_filtered: search did not take the gated index arm")
    df.select(col("vector_key").cast("long").as("doc_id"),
        col("score").cast("long").as("dot"))
      .orderBy(desc("dot"), col("doc_id"))
  }

  /** B4×B7 (r13) — BATCHED sparse search through the client collection
    * on the ORACLE path: docs 0–2's own tf vectors as one batch through
    * `searchSparseBatch` — ONE postings scan pruned to the union of the
    * queries' dims, per-(qid, doc) partial sums under the bounded
    * per-(partition, qid) heap. The postings dispatch is plan-asserted
    * (the store-join fallback returns identical values here, so it is
    * proven, not assumed); DuckDB replays each query's brute-force
    * ranking. */
  def sparseClientBatched(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val client = sparseClientFor(spark, dir)
    val qrows = hashedPostings(spark, dir).filter(col("doc_id") < 3)
      .collect()
    // loud fixture invariant (r17): the batch is "docs 0, 1, 2 as
    // queries" — a corpus missing any of them would silently shrink
    // the sweep to fewer queries than the oracle replays
    require(qrows.map(_.getLong(0)).distinct.length == 3,
      s"sparse_client_batched: expected query docs 0..2, got doc_ids " +
        qrows.map(_.getLong(0)).distinct.sorted.mkString(", "))
    val qdf = qrows.groupBy(_.getLong(0)).toSeq
      .map { case (qid, rows) =>
        val sorted = rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq
          .sortBy(_._1)
        (qid, sorted.map(_._1), sorted.map(_._2))
      }.toDF("qid", "dims", "ws")
    val df = client.searchSparseBatch("docsparse", qdf, k = 10)
    require(df.queryExecution.executedPlan.toString.contains("In(dim"),
      "sparse_client_batched: batch did not read the postings layout")
    df.select(col("qid"), col("vector_key").cast("long").as("doc_id"),
        col("score").cast("long").as("dot"))
      .orderBy(col("qid"), desc("dot"), col("doc_id"))
  }

  /** B6×B7 (r13) — Milvus range search on a SPARSE_FLOAT_VECTOR field,
    * on the ORACLE path: `searchSparseRange` with the similarity-band
    * convention (radius < score), band edge = the 10th-best dot —
    * data-derived and integer-exact on both engines. The index arm's
    * candidate set is the COMPLETE overlap set (Σ df postings, dim
    * directory prune) — lossless by construction, and the hash match
    * against DuckDB's brute-force band is what proves it (a dropped
    * in-band doc would shrink the result; dispatch plan-asserted). */
  def sparseClientRange(spark: SparkSession, dir: String): DataFrame = {
    val client = sparseClientFor(spark, dir)
    val q = sparseClientQuery(spark, dir)
    val top = client.searchSparse("docsparse", q, k = 10).collect()
    // fixture-shape invariants, LOUD (r17 — the knn_hnsw_grouped_strict
    // stance): the band edge is "the 10th-best dot", which only means
    // that if 10 overlapping docs exist, and the band radius < score is
    // only non-vacuous if somebody beats the edge — at a different
    // scale factor either could silently change the query's semantics
    // instead of failing
    require(top.length == 10,
      s"sparse_client_range: the 10th-best band edge needs >= 10 " +
        s"overlapping docs (got ${top.length}) — the corpus shape " +
        "changed under the fixture")
    require(top.head.getDouble(1) > top.last.getDouble(1),
      "sparse_client_range: all top-10 scores tie — the similarity " +
        "band (radius < score) would be empty and the query vacuous")
    val r10 = top.last.getDouble(1)
    val df = client.searchSparseRange("docsparse", q, radius = r10)
    require(df.queryExecution.executedPlan.toString.contains("In(dim"),
      "sparse_client_range: range search did not read the postings layout")
    df.select(col("vector_key").cast("long").as("doc_id"),
        col("score").cast("long").as("dot"))
      .orderBy(desc("dot"), col("doc_id"))
  }

  /** B6×B7 (r13) — Milvus `search_iterator` on a SPARSE_FLOAT_VECTOR
    * field, on the ORACLE path: the first 100 drained rows (two 50-row
    * pages — the second continues from the first's strict (score, key)
    * keyset cursor, so a boundary cannot duplicate or drop a row)
    * hash-compare against DuckDB's brute-force total ordering. The
    * sparse drain rides the exact map-probe arm whose per-row literal
    * fold makes float scores bit-stable across evaluations — the whole
    * correctness rests on that and the cursor algebra, both of which a
    * single shifted row would expose. */
  def sparseClientIter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val client = sparseClientFor(spark, dir)
    val rows = client.searchSparseIterator("docsparse",
      sparseClientQuery(spark, dir), batchSize = 50).take(2).flatten.toSeq
    rows.map(r => (r.getString(0).toLong, r.getDouble(1).toLong))
      .toDF("doc_id", "dot")
      .orderBy(desc("dot"), col("doc_id"))
  }

  /** B6×B7 (r13) — Milvus grouping search on a SPARSE_FLOAT_VECTOR
    * field, on the ORACLE path: top-2 bands (doc_id parity, from the
    * metadata map) ranked by their best dot, 3 best hits each, through
    * the client collection's two-pass grouped plan (k winners collected
    * driver-side, then broadcast UNDER the per-group bounded heap).
    * DuckDB replays it with two window ranks. */
  def sparseClientGrouped(spark: SparkSession, dir: String): DataFrame = {
    val client = sparseClientFor(spark, dir)
    client.searchSparseGrouped("docsparse", sparseClientQuery(spark, dir),
        k = 2, groupByKey = "band", groupSize = 3)
      .select(col("group_value"), col("grp_rank"), col("rn"),
        col("vector_key").cast("long").as("doc_id"),
        col("score").cast("long").as("dot"))
      .orderBy(col("grp_rank"), col("rn"))
  }

  /** B1/B8×B7 (r13) — the one-call Milvus filter-STRING search on a
    * SPARSE_FLOAT_VECTOR field, on the ORACLE path: `TEXT_MATCH(text,
    * term) && band == "0"` through `searchSparseMilvus` — the
    * TEXT_MATCH conjunct resolves as a gate against the collection's
    * attached postings index (Σ df(term) I/O), the band predicate
    * compiles to the scalar-prunable meta shape, and their
    * intersection drives the index arm's deepening fetch. The gate
    * term is data-derived (doc 0's alphabetically-first token) so both
    * engines pick it identically. */
  def sparseClientMilvus(spark: SparkSession, dir: String): DataFrame = {
    val client = sparseClientFor(spark, dir)
    val term = t(spark, dir, "documents").filter(col("doc_id") === 0L)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(min(col("w"))).head().getString(0)
    val df = client.searchSparseMilvus("docsparse",
      sparseClientQuery(spark, dir), k = 10,
      filter = s"""TEXT_MATCH(text, "$term") && band == "0"""")
    df.select(col("vector_key").cast("long").as("doc_id"),
        col("score").cast("long").as("dot"))
      .orderBy(desc("dot"), col("doc_id"))
  }

  /** Per-JVM float collection carrying all three "vector fields" the
    * N-ary hybrid fuses: the embeddings as the dense field, the
    * documents' tf postings as the attached sparse field, and the text
    * index as the BM25 function field. */
  private val hybridClientRootCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def hybridClientFor(spark: SparkSession, dir: String): graft.api.GraftClient = {
    val root = hybridClientRootCache.computeIfAbsent(dir, { d =>
      val r = java.nio.file.Files.createTempDirectory("graft-hybcli").toString
      val c = new graft.api.GraftClient(spark, r)
      val emb = t(spark, d, "embeddings")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      c.createCollection("dochyb", dim = dim, buckets = 4)
      c.upsert("dochyb", emb.select(
        lpad(col("vec_id").cast("string"), 8, "0").as("key"),
        col("embedding").as("vec"),
        map(lit("label"), col("label").cast("string")).as("meta")))
      val keyed = t(spark, d, "documents")
        .select(lpad(col("doc_id").cast("string"), 8, "0").as("key"),
          col("text"))
      c.buildTextIndex("dochyb", keyed)
      c.buildSparseIndex("dochyb", keyed
        .select(col("key"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("key"), col("word")).agg(count(lit(1)).as("tf"))
        .select(col("key"), xxhash64(col("word")).as("dim"),
          col("tf").cast("double").as("w")))
      r
    })
    new graft.api.GraftClient(spark, root)
  }

  /** B6 (r13) — Milvus's N-ARY `hybrid_search` on the ORACLE path:
    * THREE AnnSearchRequests (the dense embedding field, the BM25 text
    * function field, the attached sparse tf field) fused by RRF through
    * `hybridSearchRequests` — the generalization whose two-arm calls
    * the pairwise surfaces special-case (parity spec-pinned). DuckDB
    * replays all three rank windows and the coalesced reciprocal-rank
    * sum. */
  def hybridMultiRrf(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.AnnRequest
    val client = hybridClientFor(spark, dir)
    val qv = t(spark, dir, "embeddings").filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val df = client.hybridSearchRequests("dochyb",
      Seq(AnnRequest.Dense(qv), AnnRequest.Bm25Text("join hash scan"),
        AnnRequest.SparseField(sparseClientQuery(spark, dir))),
      k = 10)
    df.select(col("key").cast("long").as("doc_id"),
        col("rank_0").as("vec_rank"), col("rank_1").as("lex_rank"),
        col("rank_2").as("sp_rank"), col("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
  }

  /** B6 (r14 — VERDICT r13's #3) — per-request `expr` on the N-ary
    * `hybrid_search`, on the ORACLE path: the dense arm carries its own
    * Milvus filter string (odd labels), the BM25 arm a DIFFERENT one
    * (even labels), the sparse arm none — each binding that arm only,
    * the AnnSearchRequest.expr semantics a port needs (the pre-r14
    * shared filter could only over-constrain every arm to the
    * intersection). DuckDB replays each arm's gated rank window (the
    * dense/BM25 gates apply BEFORE the arm's top-armK; corpus idf
    * stays fixed — Lucene filtered-query semantics) and the coalesced
    * reciprocal-rank sum. */
  def hybridMultiExpr(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.AnnRequest
    val client = hybridClientFor(spark, dir)
    val qv = t(spark, dir, "embeddings").filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val df = client.hybridSearchRequests("dochyb",
      Seq(
        AnnRequest.Dense(qv, expr = """label in ["1", "3", "5", "7", "9"]"""),
        AnnRequest.Bm25Text("join hash scan",
          expr = """label in ["0", "2", "4", "6", "8"]"""),
        AnnRequest.SparseField(sparseClientQuery(spark, dir))),
      k = 10)
    df.select(col("key").cast("long").as("doc_id"),
        col("rank_0").as("vec_rank"), col("rank_1").as("lex_rank"),
        col("rank_2").as("sp_rank"), col("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
  }

  /** Per-JVM MULTI-VECTOR collection (Milvus 2.4's full schema, r16):
    * the embeddings as the dense PRIMARY and the documents' hashed tf
    * postings as a NAMED SPARSE_FLOAT_VECTOR field `lex` — the standard
    * dense+SPLADE hybrid row, one keyed store holding both. The field's
    * SPARSE_INVERTED_INDEX is built over a WRONG base (doc 0's weights
    * doubled), corrected by a re-upsert, and poisoned by an
    * upsert-then-delete decoy that would rank #1 in the sparse arm if a
    * tombstone leaked — the per-commit FIELD index auto-maintenance is
    * load-bearing for the oracle hash, the sparseClientFor pattern one
    * schema level up. */
  private val fieldClientRootCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def fieldClientFor(spark: SparkSession, dir: String): graft.api.GraftClient = {
    val root = fieldClientRootCache.computeIfAbsent(dir, { d =>
      val r = java.nio.file.Files.createTempDirectory("graft-fieldcli").toString
      val c = new graft.api.GraftClient(spark, r)
      val emb = t(spark, d, "embeddings")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      c.createCollection("hybfield", dim = dim, buckets = 4,
        vectorFields = Seq(graft.index.VecField("lex", 0, "dot",
          "SPARSE_INVERTED_INDEX", family = "SPARSE_FLOAT_VECTOR")))
      val tf = hashedPostings(spark, d)
      def rows(p: DataFrame) = emb
        .select(col("vec_id").as("doc_id"), col("embedding"), col("label"))
        .join(p.groupBy(col("doc_id"))
          .agg(map_from_entries(collect_list(struct(col("dim"), col("w"))))
            .as("lex")), Seq("doc_id"))
        .select(lpad(col("doc_id").cast("string"), 8, "0").as("key"),
          col("embedding").as("vec"), col("lex"),
          map(lit("label"), col("label").cast("string")).as("meta"))
      // wrong base (doc 0 doubled) → build → corrective re-upsert →
      // decoy put+delete: every later sparse-arm hit depends on the
      // field index rolling forward correctly per commit
      c.upsert("hybfield", rows(tf.withColumn("w",
        when(col("doc_id") === 0L, col("w") * 2).otherwise(col("w")))))
      c.buildIndex("hybfield", nlist = 8, field = "lex")
      c.upsert("hybfield", rows(tf).filter(col("key") === "00000000"))
      val qd = tf.filter(col("doc_id") === 0L).select("dim").head().getLong(0)
      import spark.implicits._
      c.upsert("hybfield", Seq(
        ("99999999", Seq.fill(dim)(9.9f), Map(qd -> 1000.0),
          Map("label" -> "9")))
        .toDF("key", "vec", "lex", "meta"))
      c.deleteByKeys("hybfield", Seq("99999999"))
      // ---- Milvus 2.6 add_collection_field ON THE ORACLE PATH (r16):
      // a nullable BINARY_VECTOR field added AFTER the collection
      // carries data, backfilled by re-upsert with doc 0's code WRONG
      // (complemented), the field's BIN_IVF built over that wrong
      // base, then corrected by a re-upsert and poisoned by a decoy
      // put+delete — knn_hamming_field's hash is right only if (a)
      // old rows gained the column with no rewrite, (b) the backfill
      // landed every field atomically, (c) the FIELD's cell
      // maintenance carried the correction and the tombstone.
      c.addCollectionField("hybfield", graft.index.VecField(
        "bcode", dim, "hamming", "BIN_IVF_FLAT",
        family = "BINARY_VECTOR", nullable = true))
      def rows2(p: DataFrame, complement0: Boolean) = rows(p)
        .join(emb.select(lpad(col("vec_id").cast("string"), 8, "0")
          .as("key"), graft.functions.BinaryVectorFunctions
            .pack_sign_bits(col("embedding")).as("bcode")), Seq("key"))
        .withColumn("bcode",
          if (complement0)
            // complement every word, then zero the pad bits — the pad
            // mask applies ONLY to the LAST word (masking every word
            // with it would zero real bits of non-last words whenever
            // dim > 64 with dim % 64 != 0, silently changing the
            // fixture's meaning at larger dims)
            when(col("key") === "00000000",
              transform(col("bcode"), (w, i) => bitwise_not(w)
                .bitwiseAND(
                  when(i === size(col("bcode")) - 1,
                    lit(if (dim % 64 == 0) -1L
                      else (1L << (dim % 64)) - 1))
                    .otherwise(lit(-1L)))))
              .otherwise(col("bcode"))
          else col("bcode"))
        .select(col("key"), col("vec"), col("lex"), col("bcode"),
          col("meta"))
      c.upsert("hybfield", rows2(tf, complement0 = true)) // wrong base
      c.buildIndex("hybfield", nlist = 4, field = "bcode")
      c.upsert("hybfield",
        rows2(tf, complement0 = false).filter(col("key") === "00000000"))
      // decoy: doc 0's own (corrected) code under a key that sorts
      // BEFORE "00000000" ('!' < '0') — a tombstone leak would rank it
      // #1 at Hamming distance 0 by the (dist, key) tie-break
      val q0codes = rows2(tf, complement0 = false)
        .filter(col("key") === "00000000").select("bcode")
        .head().getSeq[Long](0)
      c.upsert("hybfield", Seq(
        ("!decoy", Seq.fill(dim)(8.8f), Map(qd -> 1.0), q0codes,
          Map("label" -> "9")))
        .toDF("key", "vec", "lex", "bcode", "meta"))
      c.deleteByKeys("hybfield", Seq("!decoy"))
      r
    })
    new graft.api.GraftClient(spark, root)
  }

  /** B7×B6 (r16) — Milvus BINARY_VECTOR as a NAMED FIELD of a
    * multi-vector collection, declared via `add_collection_field`
    * (nullable, no rewrite) and BACKFILLED by re-upsert, on the ORACLE
    * path: `searchBinary(field = "bcode")` at FULL probe through the
    * field's own BIN_IVF_FLAT layout — built over a WRONG base (doc
    * 0's code complemented), corrected through per-commit FIELD cell
    * maintenance, and poisoned by a tombstoned decoy that would rank
    * ahead of doc 0 by key tie-break if the delete leaked. DuckDB
    * replays the sign-disagreement brute force. */
  def knnHammingField(spark: SparkSession, dir: String): DataFrame = {
    val client = fieldClientFor(spark, dir)
    val idx = client.listIndexes("hybfield")
      .filter(col("kind") === "BIN_IVF_FLAT").head()
    require(idx.getString(1) == "bcode" && idx.getBoolean(2),
      "knn_hamming_field: the FIELD's BIN_IVF_FLAT must be FRESH — " +
        "per-commit field cell maintenance failed")
    val q = t(spark, dir, "embeddings").filter(col("vec_id") === 0L)
      .select(pack_sign_bits(col("embedding"))).head().getSeq[Long](0).toArray
    val df = client.searchBinary("hybfield", q, k = 10, nprobe = 4,
      field = "bcode")
    require(df.queryExecution.executedPlan.toString.contains("centroidId"),
      "knn_hamming_field: search did not read the field's cell layout")
    df.select(col("vector_key").cast("long").as("vec_id"),
        col("distance").cast("long").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** B6 (r16 — VERDICT r15's #1) — Milvus `hybrid_search` across the
    * TWO vector fields of ONE multi-vector collection, on the ORACLE
    * path: a Dense arm on the primary embedding field ⊕ a SparseField
    * arm on the NAMED sparse field `lex` (dense+SPLADE, the standard
    * hybrid-retrieval schema), fused by RRF. The sparse arm rides the
    * sparse COLLECTION family through the field view — store-owned
    * maps, auto-maintained SPARSE_INVERTED_INDEX (freshness asserted,
    * postings dispatch plan-asserted on the standalone arm), exact
    * fallback — so scope/filter would apply BEFORE ranking, unlike the
    * attached layout it retires. DuckDB replays both rank windows and
    * the coalesced reciprocal-rank sum; the hash is wrong unless the
    * wrong-base correction and the decoy's tombstone were both carried
    * into the FIELD's postings by per-commit maintenance. */
  def hybridSparseField(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.AnnRequest
    val client = fieldClientFor(spark, dir)
    val idx = client.listIndexes("hybfield")
      .filter(col("kind") === "SPARSE_INVERTED_INDEX").head()
    require(idx.getString(1) == "lex" && idx.getBoolean(2),
      "hybrid_sparse_field: the FIELD's SPARSE_INVERTED_INDEX must be " +
        "FRESH — per-commit field-index auto-maintenance failed")
    val q = sparseClientQuery(spark, dir)
    // dispatch honesty on the arm itself: the fresh field index's
    // postings layout (dim-bucket prune, pushed IN) must serve it
    require(client.searchSparse("hybfield", q, k = 10, field = "lex")
        .queryExecution.executedPlan.toString.contains("In(dim"),
      "hybrid_sparse_field: the sparse arm did not read the field's " +
        "postings layout")
    val qv = t(spark, dir, "embeddings").filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    client.hybridSearchRequests("hybfield",
        Seq(AnnRequest.Dense(qv),
          AnnRequest.SparseField(q, field = "lex")),
        k = 10)
      .select(col("key").cast("long").as("doc_id"),
        col("rank_0").as("vec_rank"), col("rank_1").as("sp_rank"),
        col("rrf"))
      .orderBy(desc("rrf"), col("doc_id"))
  }

  /** B6×B7 (r13) — Milvus grouping search on a BINARY_VECTOR field, on
    * the ORACLE path: top-3 labels by best Hamming distance, 2 best
    * hits each, through the client collection at FULL probe (exact by
    * the layout contract, so DuckDB's two window ranks replay it
    * hash-identically). */
  def knnHammingGrouped(spark: SparkSession, dir: String): DataFrame = {
    val client = binClientFor(spark, dir)
    val q = t(spark, dir, "embeddings").filter(col("vec_id") === 0L)
      .select(pack_sign_bits(col("embedding"))).head().getSeq[Long](0).toArray
    client.searchBinaryGrouped("embbin", q, k = 3, groupByKey = "label",
        groupSize = 2, nprobe = 8)
      .select(col("group_value"), col("grp_rank"), col("rn"),
        col("vector_key").cast("long").as("vec_id"),
        col("distance").cast("long").as("dist"))
      .orderBy(col("grp_rank"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_hamming" -> knnHamming _,
    "binary_jaccard" -> binaryJaccard _,
    "sparse_dot_topk" -> sparseDotTopK _,
    "sparse_index_topk" -> sparseIndexTopK _,
    "hybrid_dense_sparse" -> hybridDenseSparse _,
    "knn_hamming_ivf" -> knnHammingIvf _,
    "knn_hamming_batched" -> knnHammingBatched _,
    "knn_hamming_range" -> knnHammingRange _,
    "knn_hamming_iter" -> knnHammingIter _,
    "knn_hamming_grouped" -> knnHammingGrouped _,
    "sparse_client_topk" -> sparseClientTopK _,
    "sparse_client_filtered" -> sparseClientFiltered _,
    "sparse_client_batched" -> sparseClientBatched _,
    "sparse_client_range" -> sparseClientRange _,
    "sparse_client_iter" -> sparseClientIter _,
    "sparse_client_grouped" -> sparseClientGrouped _,
    "sparse_client_milvus" -> sparseClientMilvus _,
    "hybrid_multi_rrf" -> hybridMultiRrf _,
    "hybrid_multi_expr" -> hybridMultiExpr _,
    "hybrid_sparse_field" -> hybridSparseField _,
    "knn_hamming_field" -> knnHammingField _
  )

  /** B6×B7 (r13) — Milvus `search_iterator` on a BINARY_VECTOR field,
    * on the ORACLE path: the first 100 drained rows (two 50-row pages —
    * the second page continues from the first's strict (distance, key)
    * keyset cursor, so page boundaries cannot duplicate or drop a row)
    * hash-compare against DuckDB's brute-force total ordering. Integer
    * distances need no hold-back margin — the binary drain's whole
    * correctness rests on the cursor algebra and the lossless deep-page
    * cell skip, both of which a single shifted row would expose. */
  def knnHammingIter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val client = binClientFor(spark, dir)
    val q = t(spark, dir, "embeddings").filter(col("vec_id") === 0L)
      .select(pack_sign_bits(col("embedding"))).head().getSeq[Long](0).toArray
    val rows = client.searchBinaryIterator("embbin", q, batchSize = 50)
      .take(2).flatten.toSeq
    rows.map(r => (r.getString(0).toLong, r.getDouble(1).toLong))
      .toDF("vec_id", "dist")
      .orderBy(col("dist"), col("vec_id"))
  }

  /** B6×B7 (r13) — Milvus range search on a BINARY_VECTOR field, on the
    * ORACLE path: `searchBinaryRange` over the client collection, band
    * `dist < (the 20th-nearest distance)` — data-derived, integer-exact
    * on both engines, so the band edge cannot flap. With the fresh
    * BIN_IVF_FLAT index the candidate cells pass a LOSSLESS Hamming
    * triangle-inequality prune over per-cell radii (integers — no fp
    * slack term exists); the hash match against DuckDB's brute-force
    * band is what proves losslessness (a dropped in-band row would
    * shrink the result; the cell layout is also plan-asserted). */
  def knnHammingRange(spark: SparkSession, dir: String): DataFrame = {
    val client = binClientFor(spark, dir)
    val q = t(spark, dir, "embeddings").filter(col("vec_id") === 0L)
      .select(pack_sign_bits(col("embedding"))).head().getSeq[Long](0).toArray
    val top20 = client.searchBinary("embbin", q, k = 20, nprobe = 8)
      .collect()
    // loud fixture invariants (r17): 20 rows must exist for "the
    // 20th-nearest" to mean anything, and the edge must sit above the
    // self-match's 0 or the band dist < r20 is empty
    require(top20.length == 20,
      s"knn_hamming_range: the 20th-nearest band edge needs >= 20 rows " +
        s"(got ${top20.length})")
    require(top20.last.getDouble(1) > 0.0,
      "knn_hamming_range: the 20th-nearest distance is 0 — the band " +
        "dist < r20 would be empty and the query vacuous")
    val r20 = top20.last.getDouble(1)
    val df = client.searchBinaryRange("embbin", q, radius = r20)
    require(df.queryExecution.executedPlan.toString.contains("centroidId"),
      "knn_hamming_range: range search did not read the cell layout")
    df.select(col("vector_key").cast("long").as("vec_id"),
        col("distance").cast("long").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  /** B4×B7 (r13) — BATCHED binary search through the client collection
    * on the ORACLE path: `searchBinaryBatch` probes each query's cells
    * executor-side (udf over the broadcast k-majority centers), joins
    * queries to cells on `centroidId`, and ranks every (query, row)
    * pair with the fused XOR+popcount kernel under the bounded
    * per-query heap. Full probe ⇒ each query's hits are exactly brute
    * force and hash-comparable; the cell layout is plan-asserted (the
    * exact-product fallback returns identical values here). Store keys
    * are zero-padded, so the engine's (dist, key) string tie-break
    * equals the oracle's (dist, vec_id) numeric one. */
  def knnHammingBatched(spark: SparkSession, dir: String): DataFrame = {
    val client = binClientFor(spark, dir)
    val queries = t(spark, dir, "embeddings").filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"),
        pack_sign_bits(col("embedding")).as("qcodes"))
    val df = client.searchBinaryBatch("embbin", queries, k = 10, nprobe = 8)
    require(df.queryExecution.executedPlan.toString.contains("centroidId"),
      "knn_hamming_batched: batch stage did not read the cell layout")
    df.select(col("qid"), col("vector_key").cast("long").as("vec_id"),
        col("distance").cast("long").as("dist"))
      .orderBy(col("qid"), col("dist"), col("vec_id"))
  }

  /** Per-JVM BINARY_VECTOR client collection over the sign-binarized
    * embeddings — the FULL lifecycle on the oracle path (r13; the r12
    * version built the module-level layout directly): `createCollection`
    * with Milvus's `BINARY_VECTOR` field type, the codes through the
    * keyed store's write path, `buildIndex("BIN_IVF_FLAT")` persisting
    * the k-majority cell layout with its VERSION stamp (the pqClientFor
    * pattern: build once per (dir, process)). */
  private val binIvfRootCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def binClientFor(spark: SparkSession, dir: String): graft.api.GraftClient = {
    val root = binIvfRootCache.computeIfAbsent(dir, { d =>
      val r = java.nio.file.Files.createTempDirectory("graft-binivf").toString
      val c = new graft.api.GraftClient(spark, r)
      val emb = t(spark, d, "embeddings")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      c.createCollection("embbin", dim = dim, metric = "hamming",
        indexType = "BIN_IVF_FLAT", nlist = 8, buckets = 4,
        vectorType = "BINARY_VECTOR")
      c.upsert("embbin", emb.select(
        lpad(col("vec_id").cast("string"), 8, "0").as("key"),
        pack_sign_bits(col("embedding")).as("vec"),
        map(lit("label"), col("label").cast("string")).as("meta")))
      c.buildIndex("embbin", nlist = 8)
      r
    })
    new graft.api.GraftClient(spark, root)
  }

  /** B7 (r12, client-envelope r13) — Milvus `BIN_IVF_FLAT` + HAMMING on
    * the ORACLE path THROUGH the client collection: the sign-binarized
    * corpus through the full write path, at rest in k-majority Hamming
    * cells, searched via `searchBinary` at FULL probe (`nprobe = nlist`
    * — the exact fallback, so the result is hash-comparable brute force;
    * the prune's recall behavior is BinIvfSpec's domain). Dispatch
    * honesty twice over: the index row must read FRESH (a stale stamp
    * would silently exact-scan) and the plan must read the partitioned
    * cell layout — a fall-through to the store scan would return
    * identical values here, so the layout is asserted, not assumed. */
  def knnHammingIvf(spark: SparkSession, dir: String): DataFrame = {
    val client = binClientFor(spark, dir)
    val q = t(spark, dir, "embeddings").filter(col("vec_id") === 0L)
      .select(pack_sign_bits(col("embedding"))).head().getSeq[Long](0).toArray
    val idx = client.listIndexes("embbin")
      .filter(col("kind") === "BIN_IVF_FLAT").head()
    require(idx.getBoolean(2),
      "knn_hamming_ivf: the BIN_IVF_FLAT index must be FRESH — a stale " +
        "stamp would route to the exact scan and leave the cells untested")
    val df = client.searchBinary("embbin", q, k = 10, nprobe = 8)
    require(df.queryExecution.executedPlan.toString.contains("centroidId"),
      "knn_hamming_ivf: search did not read the cell-partitioned layout")
    df.select(col("vector_key").cast("long").as("vec_id"),
        col("distance").cast("long").as("dist"))
      .orderBy(col("dist"), col("vec_id"))
  }

  val oracleSql: Map[String, String] = Map(
    // Per-position sign disagreement == packed-word Hamming (bijection on
    // sign patterns; DuckDB has no 64-bit popcount over packed arrays, so
    // the oracle counts positions directly).
    "knn_hamming" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           h AS (
             SELECT e.vec_id, e.label,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dist
             FROM embeddings e, q, LATERAL unnest(generate_series(1, len(e.embedding))) AS t(i)
             GROUP BY e.vec_id, e.label)
         SELECT vec_id, dist, label FROM h ORDER BY dist, vec_id LIMIT 10""",
    "knn_hamming_ivf" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           h AS (
             SELECT e.vec_id,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dist
             FROM embeddings e, q, LATERAL unnest(generate_series(1, len(e.embedding))) AS t(i)
             GROUP BY e.vec_id)
         SELECT vec_id, dist FROM h ORDER BY dist, vec_id LIMIT 10""",
    "knn_hamming_iter" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           h AS (
             SELECT e.vec_id,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dist
             FROM embeddings e, q, LATERAL unnest(generate_series(1, len(e.embedding))) AS t(i)
             GROUP BY e.vec_id)
         SELECT vec_id, dist FROM h ORDER BY dist, vec_id LIMIT 100""",
    "knn_hamming_range" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           h AS (
             SELECT e.vec_id,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dist
             FROM embeddings e, q, LATERAL unnest(generate_series(1, len(e.embedding))) AS t(i)
             GROUP BY e.vec_id),
           r AS (SELECT dist AS r20 FROM h ORDER BY dist, vec_id LIMIT 1 OFFSET 19)
         SELECT h.vec_id, h.dist FROM h, r WHERE h.dist < r.r20
         ORDER BY h.dist, h.vec_id""",
    "knn_hamming_grouped" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           h AS (
             SELECT e.vec_id, CAST(e.label AS VARCHAR) AS group_value,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dist
             FROM embeddings e, q, LATERAL unnest(generate_series(1, len(e.embedding))) AS t(i)
             GROUP BY e.vec_id, e.label),
           b AS (SELECT group_value, min(dist) AS best FROM h GROUP BY 1),
           rk AS (SELECT group_value,
                    ROW_NUMBER() OVER (ORDER BY best, group_value) AS grp_rank
                  FROM b),
           r AS (SELECT h.group_value, rk.grp_rank, h.vec_id, h.dist,
                   ROW_NUMBER() OVER (PARTITION BY h.group_value
                     ORDER BY h.dist, h.vec_id) AS rn
                 FROM h JOIN rk USING (group_value))
         SELECT group_value, grp_rank, rn, vec_id, dist FROM r
         WHERE grp_rank <= 3 AND rn <= 2
         ORDER BY grp_rank, rn""",
    "knn_hamming_batched" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
           h AS (
             SELECT q.qid, e.vec_id,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dist
             FROM embeddings e, q, LATERAL unnest(generate_series(1, len(e.embedding))) AS t(i)
             GROUP BY q.qid, e.vec_id),
           r AS (SELECT qid, vec_id, dist,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn
                 FROM h)
         SELECT qid, vec_id, dist FROM r WHERE rn <= 10
         ORDER BY qid, dist, vec_id""",
    "binary_jaccard" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           h AS (
             SELECT e.vec_id, e.label,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) AND (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS inter,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) OR (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS un
             FROM embeddings e, q, LATERAL unnest(generate_series(1, len(e.embedding))) AS t(i)
             GROUP BY e.vec_id, e.label)
         SELECT vec_id,
           round(CASE WHEN un = 0 THEN 0.0 ELSE 1.0 - inter::DOUBLE / un::DOUBLE END, 6) AS dist,
           label
         FROM h ORDER BY dist, vec_id LIMIT 10""",
    "sparse_dot_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0),
           nrm AS (SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm FROM tf GROUP BY 1),
           dt AS (SELECT t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
                  FROM tf t JOIN q USING (word) GROUP BY 1)
         SELECT d.doc_id, d.dot, round(d.dot::DOUBLE / (n.nrm * qn.qnrm), 6) AS cosine
         FROM dt d JOIN nrm n USING (doc_id), (SELECT nrm AS qnrm FROM nrm WHERE doc_id = 0) qn
         ORDER BY d.dot DESC, d.doc_id LIMIT 10""",
    "sparse_client_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0)
         SELECT t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
         FROM tf t JOIN q USING (word) GROUP BY 1
         ORDER BY dot DESC, doc_id LIMIT 10""",
    "sparse_client_filtered" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0)
         SELECT t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
         FROM tf t JOIN q USING (word)
         WHERE t.doc_id % 2 = 0
         GROUP BY 1
         ORDER BY dot DESC, doc_id LIMIT 10""",
    "sparse_client_batched" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT doc_id AS qid, word, tf AS qtf FROM tf WHERE doc_id < 3),
           d AS (SELECT q.qid, t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
                 FROM tf t JOIN q USING (word) GROUP BY 1, 2),
           r AS (SELECT qid, doc_id, dot,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, doc_id) AS rn
                 FROM d)
         SELECT qid, doc_id, dot FROM r WHERE rn <= 10
         ORDER BY qid, dot DESC, doc_id""",
    "hybrid_multi_rrf" ->
      """WITH tokens AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
           dl AS (SELECT doc_id, count(*) AS dlen FROM tokens GROUP BY 1),
           avgdl AS (SELECT avg(dlen) AS avgdl FROM dl),
           n AS (SELECT count(*) AS n_docs FROM documents),
           btf AS (SELECT doc_id, word, count(*) AS tf FROM tokens
                   WHERE word IN ('join','hash','scan') GROUP BY 1, 2),
           bdf AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens
                   WHERE word IN ('join','hash','scan') GROUP BY 1),
           bm25 AS (SELECT btf.doc_id,
               sum( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                    * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) ) AS bm25
             FROM btf JOIN bdf USING (word) JOIN dl USING (doc_id), avgdl, n
             GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 15),
           lex AS (SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM bm25),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
           knn AS (SELECT e.vec_id AS doc_id,
               list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
             FROM embeddings e, q ORDER BY dist, vec_id LIMIT 15),
           vec AS (SELECT doc_id,
               row_number() OVER (ORDER BY dist, doc_id) AS vec_rank FROM knn),
           stf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
                   FROM tokens GROUP BY 1, 2),
           sq AS (SELECT word, tf AS qtf FROM stf WHERE doc_id = 0),
           sdot AS (SELECT t.doc_id, CAST(sum(t.tf * sq.qtf) AS BIGINT) AS dot
                    FROM stf t JOIN sq USING (word) GROUP BY 1
                    ORDER BY dot DESC, doc_id LIMIT 15),
           sp AS (SELECT doc_id,
               row_number() OVER (ORDER BY dot DESC, doc_id) AS sp_rank FROM sdot)
         SELECT doc_id, vec_rank, lex_rank, sp_rank,
            round(coalesce(1.0 / (60 + vec_rank), 0)
              + coalesce(1.0 / (60 + lex_rank), 0)
              + coalesce(1.0 / (60 + sp_rank), 0), 6) AS rrf
         FROM vec
           FULL OUTER JOIN lex USING (doc_id)
           FULL OUTER JOIN sp USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 10""",
    "hybrid_multi_expr" ->
      """WITH tokens AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
           dl AS (SELECT doc_id, count(*) AS dlen FROM tokens GROUP BY 1),
           avgdl AS (SELECT avg(dlen) AS avgdl FROM dl),
           n AS (SELECT count(*) AS n_docs FROM documents),
           btf AS (SELECT doc_id, word, count(*) AS tf FROM tokens
                   WHERE word IN ('join','hash','scan') GROUP BY 1, 2),
           bdf AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens
                   WHERE word IN ('join','hash','scan') GROUP BY 1),
           bm25 AS (SELECT btf.doc_id,
               sum( ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                    * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl)) ) AS bm25
             FROM btf JOIN bdf USING (word) JOIN dl USING (doc_id), avgdl, n
             WHERE btf.doc_id IN (SELECT vec_id FROM embeddings
                                  WHERE label IN (0, 2, 4, 6, 8))
             GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 15),
           lex AS (SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM bm25),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
           knn AS (SELECT e.vec_id AS doc_id,
               list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
             FROM embeddings e, q WHERE e.label IN (1, 3, 5, 7, 9)
             ORDER BY dist, vec_id LIMIT 15),
           vec AS (SELECT doc_id,
               row_number() OVER (ORDER BY dist, doc_id) AS vec_rank FROM knn),
           stf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
                   FROM tokens GROUP BY 1, 2),
           sq AS (SELECT word, tf AS qtf FROM stf WHERE doc_id = 0),
           sdot AS (SELECT t.doc_id, CAST(sum(t.tf * sq.qtf) AS BIGINT) AS dot
                    FROM stf t JOIN sq USING (word) GROUP BY 1
                    ORDER BY dot DESC, doc_id LIMIT 15),
           sp AS (SELECT doc_id,
               row_number() OVER (ORDER BY dot DESC, doc_id) AS sp_rank FROM sdot)
         SELECT doc_id, vec_rank, lex_rank, sp_rank,
            round(coalesce(1.0 / (60 + vec_rank), 0)
              + coalesce(1.0 / (60 + lex_rank), 0)
              + coalesce(1.0 / (60 + sp_rank), 0), 6) AS rrf
         FROM vec
           FULL OUTER JOIN lex USING (doc_id)
           FULL OUTER JOIN sp USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 10""",
    "sparse_client_milvus" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0),
           gate AS (SELECT DISTINCT doc_id FROM tok
                    WHERE word = (SELECT min(word) FROM tok WHERE doc_id = 0))
         SELECT t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
         FROM tf t JOIN q USING (word)
         WHERE t.doc_id % 2 = 0 AND t.doc_id IN (SELECT doc_id FROM gate)
         GROUP BY 1
         ORDER BY dot DESC, doc_id LIMIT 10""",
    "sparse_client_grouped" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0),
           d AS (SELECT t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
                 FROM tf t JOIN q USING (word) GROUP BY 1),
           g AS (SELECT doc_id, dot, CAST(doc_id % 2 AS VARCHAR) AS group_value FROM d),
           b AS (SELECT group_value, max(dot) AS best FROM g GROUP BY 1),
           rk AS (SELECT group_value,
                    ROW_NUMBER() OVER (ORDER BY best DESC, group_value) AS grp_rank
                  FROM b),
           h AS (SELECT g.group_value, rk.grp_rank, g.doc_id, g.dot,
                   ROW_NUMBER() OVER (PARTITION BY g.group_value
                     ORDER BY g.dot DESC, g.doc_id) AS rn
                 FROM g JOIN rk USING (group_value))
         SELECT group_value, grp_rank, rn, doc_id, dot FROM h
         WHERE rn <= 3 AND grp_rank <= 2
         ORDER BY grp_rank, rn""",
    "sparse_client_iter" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0)
         SELECT t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
         FROM tf t JOIN q USING (word) GROUP BY 1
         ORDER BY dot DESC, doc_id LIMIT 100""",
    "sparse_client_range" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0),
           d AS (SELECT t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
                 FROM tf t JOIN q USING (word) GROUP BY 1),
           r AS (SELECT dot AS r10 FROM d ORDER BY dot DESC, doc_id LIMIT 1 OFFSET 9)
         SELECT d.doc_id, d.dot FROM d, r WHERE d.dot > r.r10
         ORDER BY d.dot DESC, d.doc_id""",
    "sparse_index_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           q AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0)
         SELECT t.doc_id, CAST(sum(t.tf * q.qtf) AS BIGINT) AS dot
         FROM tf t JOIN q USING (word) GROUP BY 1
         ORDER BY dot DESC, doc_id LIMIT 10""",
    // identical brute force to knn_hamming_ivf: the engine-side value
    // of the FIELD query is the add_collection_field + backfill +
    // field-maintenance choreography, not a different ranking
    "knn_hamming_field" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           h AS (
             SELECT e.vec_id,
               CAST(SUM(CASE WHEN (e.embedding[i] > 0) <> (q.qe[i] > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dist
             FROM embeddings e, q, LATERAL unnest(generate_series(1, len(e.embedding))) AS t(i)
             GROUP BY e.vec_id)
         SELECT vec_id, dist FROM h ORDER BY dist, vec_id LIMIT 10""",
    "hybrid_sparse_field" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           qw AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0),
           sp0 AS (SELECT t.doc_id, CAST(sum(t.tf * qw.qtf) AS BIGINT) AS dot
                   FROM tf t JOIN qw USING (word) GROUP BY 1
                   ORDER BY dot DESC, doc_id LIMIT 15),
           sp AS (SELECT doc_id,
                    row_number() OVER (ORDER BY dot DESC, doc_id) AS sp_rank FROM sp0),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
           dn0 AS (SELECT e.vec_id AS doc_id,
                     list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
                   FROM embeddings e, q ORDER BY dist, doc_id LIMIT 15),
           dn AS (SELECT doc_id,
                    row_number() OVER (ORDER BY dist, doc_id) AS vec_rank FROM dn0)
         SELECT doc_id, vec_rank, sp_rank,
            round(coalesce(1.0 / (60 + vec_rank), 0)
              + coalesce(1.0 / (60 + sp_rank), 0), 6) AS rrf
         FROM dn FULL OUTER JOIN sp USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 10""",
    "hybrid_dense_sparse" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
           tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           qw AS (SELECT word, tf AS qtf FROM tf WHERE doc_id = 0),
           sp0 AS (SELECT t.doc_id, CAST(sum(t.tf * qw.qtf) AS BIGINT) AS dot
                   FROM tf t JOIN qw USING (word) GROUP BY 1
                   ORDER BY dot DESC, doc_id LIMIT 15),
           sp AS (SELECT doc_id,
                    row_number() OVER (ORDER BY dot DESC, doc_id) AS sp_rank FROM sp0),
           q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
           dn0 AS (SELECT e.vec_id AS doc_id,
                     list_distance(e.embedding::DOUBLE[], q.qvec) AS dist
                   FROM embeddings e, q ORDER BY dist, doc_id LIMIT 15),
           dn AS (SELECT doc_id,
                    row_number() OVER (ORDER BY dist, doc_id) AS vec_rank FROM dn0)
         SELECT doc_id, sp_rank, vec_rank,
            round(coalesce(1.0 / (60 + sp_rank), 0)
              + coalesce(1.0 / (60 + vec_rank), 0), 6) AS rrf
         FROM sp FULL OUTER JOIN dn USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 10"""
  )
}
