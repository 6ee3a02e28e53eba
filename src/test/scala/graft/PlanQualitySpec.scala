package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Plan-quality regression guards: the physical properties that make the
  * declared queries scale are asserted here so a future refactor cannot
  * silently trade them away while staying value-correct.
  *
  * (`explain` strings are a stable-enough contract for these coarse
  * properties; each assertion names the scale behavior it protects.) */
class PlanQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("plan-quality-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate RETURNS AN EXISTING SESSION when another suite in the
    // same JVM created one first — builder confs are silently dropped on
    // that path, and the events fixture's ns-timestamp column then reads
    // as TIMESTAMP_NTZ instead of LONG. Set the read confs on whatever
    // session we actually got, so suite ordering can't break the reads.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.01"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no declared query ever plans a CartesianProduct") {
    // the global safety net behind every per-query guard: a future edit
    // that degrades any equi-join to an unconstrained product (the one
    // plan shape with no 100 TB story) fails here by name. Deliberate
    // 1-row cross joins ride explicit broadcast() hints and plan as
    // BroadcastNestedLoopJoin, which this does not flag.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      planOf(name).contains("CartesianProduct")
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }

  test("bucketed range-frame rewrite: same values, no 3-key window partitioning") {
    val canonical = graft.queries.WindowSetQueries.windowRangeFrame(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    val bucketed = graft.queries.WindowSetQueries.windowRangeFrameBucketed(spark, sf)
    val b = bucketed.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(b == canonical, "bucketed two-pass must reproduce the window frame counts")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "the rewrite must not fall back to a window over the 3-value status key")
  }

  test("LSH embedding dedup: bucket equi-join candidates, no all-pairs product") {
    val p = planOf("dedup_embedding_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay a bucket equi-join, never all-pairs")
    assert(p.contains("BroadcastHashJoin"),
      "the 1024-row plane table must broadcast, not shuffle the coordinates")
  }

  test("as-of join: one union-sort window, no inequality join or cartesian") {
    val p = planOf("asof_attribution")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the as-of must be the union-sort form — an inequality-join encoding " +
        "materializes every left row against its whole right history")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "no join operator at all: both sides flow through ONE window")
    assert(p.contains("Window"), "the running last-payload window is the operator")
  }

  test("range join: banded equi-join, never a nested-loop over the range predicate") {
    val p = planOf("range_join_events")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the tolerance predicate must ride a band equi-join — Spark plans a raw " +
        "|l.ts - r.ts| <= tol condition as a nested loop, quadratic per key")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      "the (key, band) join must be a hash/merge equi-join")
  }

  test("sessionize: both windows share one user_id partitioning (one shuffle)") {
    val p = planOf("sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"the gap-flag and session-id windows must reuse one user_id shuffle, saw $exchanges:\n" +
        p.take(2000))
  }

  test("single-query KNN: bounded top-k merge, no shuffle of the index side") {
    val p = planOf("knn_l2_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must plan as partial per-partition top-k + driver merge")
    assert(!p.contains("Exchange hashpartitioning"),
      "a KNN scan must not shuffle the index")
  }

  test("batched KNN: bounded heap partial-aggregates before its only shuffle") {
    val p = planOf("knn_batched")
    assert(p.contains("partial_topkbydistance"),
      "per-partition partial top-k must run before the exchange")
    assert(!p.contains("Window"), "the rank-window plan must stay gone")
  }

  test("grouped KNN: per-group bounded heap partial-aggregates before its one shuffle") {
    val p = planOf("knn_grouped")
    assert(p.contains("partial_topkbydistance"),
      "the per-group top-k must partial-aggregate map-side — a corpus-wide " +
        "rank window here would shuffle every scored row onto the group keys")
    assert(!p.contains("Window"),
      "the grouped plan must stay window-free: group ranking is a " +
        "TakeOrdered-k collect + broadcast join, never an unpartitioned " +
        "rank window (which serializes groupSize·|groups| rows in one task)")
    assert(p.contains("BroadcastHashJoin"),
      "the k winning groups must broadcast UNDER the heap agg so losing " +
        "groups' candidates drop map-side")
  }

  test("paged KNN: offset stays top-(offset+k)-pushed, never a full sort") {
    val p = planOf("knn_paged")
    assert(p.contains("TakeOrderedAndProject"),
      "pagination must bound every partition to offset+k rows before the " +
        "page window — a global Sort here breaks at corpus scale")
  }

  test("weighted hybrid: both arms stay top-k-pushed below their normalization windows") {
    val p = planOf("hybrid_weighted")
    // three TakeOrderedAndProject, exactly like hybrid_rrf's guard: the
    // bm25 arm's top-15, the knn arm's top-15, and the fused top-10 —
    // >= 1 would let either single arm silently degrade to a corpus sort
    val takes = "TakeOrderedAndProject".r.findAllMatchIn(p).size
    assert(takes >= 3,
      s"expected top-k pushdown in both arms and the fuse (got $takes):\n${p.take(2000)}")
  }

  test("dense+sparse hybrid: both arms top-k-pushed, sparse arm equi-joins on the term") {
    val p = planOf("hybrid_dense_sparse")
    val takes = "TakeOrderedAndProject".r.findAllMatchIn(p).size
    assert(takes >= 3,
      s"sparse top-15, dense top-15, fused top-10 must all stay pushed (got $takes)")
    assert(!p.contains("CartesianProduct"),
      "the sparse dot must be the postings equi-join on word, never a product")
  }

  test("text match KNN: the match set rides the postings index — bucket prune + pushed term filter") {
    val p = planOf("text_match_knn")
    assert(p.contains("TakeOrderedAndProject"),
      "the gated KNN must stay top-k-pushed")
    // the postings read must push the term predicate to the scan (the
    // bucket partition prune shows as the pushed IN over `term`)
    assert(p.contains("term"),
      s"the TEXT_MATCH gate must read term-pruned postings:\n${p.take(2000)}")
  }

  test("pricing summary: filter pushed into the parquet scan, partial aggregation") {
    val p = planOf("pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "the date filter must reach the scan (row-group pruning at scale)")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "aggregation must be partial (map-side) + final")
  }

  test("3-way join: no cartesian products, filters pushed to all three scans") {
    val p = planOf("join_revenue_top10")
    assert(!p.contains("CartesianProduct"))
    for (pushed <- Seq("l_shipdate", "o_orderdate", "c_mktsegment"))
      assert(p.contains(pushed), s"$pushed filter must reach its scan")
  }

  test("column pruning: a projection query reads only the needed columns") {
    val p = planOf("string_funcs")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty)
    assert(!readSchema.contains("p_retailprice"),
      "unprojected columns must not be read from parquet")
  }

  test("inverted-index dedup: no cartesian/nested-loop pair generation") {
    for (q <- Seq("dedup_jaccard_pairs", "dedup_minhash_bands", "dedup_ngram_jaccard")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must generate candidates via equi-joins, got:\n${p.take(2000)}")
    }
  }

  test("bounded-window filters are pushed to the scan, not applied post-hoc") {
    val p = planOf("quality_score")
    assert(p.contains("PushedFilters") && p.contains("doc_id"),
      "the doc_id window must prune at the scan")
  }

  test("contamination check: inverted-index gram join, never train×test product") {
    val p = planOf("contamination_ngrams")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "test-set contamination must equi-join on the gram (Σ df² work), " +
        s"not cross every train doc with every test doc:\n${p.take(2000)}")
  }

  test("sequence packing: the running-offset window is shard-partitioned") {
    val p = planOf("sequence_packing")
    assert(p.contains("hashpartitioning(shard"),
      "packing must cumsum per shard — a global-order window would pull " +
        s"the corpus through one partition:\n${p.take(2000)}")
  }

  test("bm25: rides the at-rest postings — bucket partition prune, pushed term filter") {
    val p = planOf("bm25_scores")
    assert(!p.contains("CartesianProduct"),
      "the term join must stay an equi-join on the term")
    // the query must read the persisted postings layout, pruned to the
    // query terms' hash-bucket dirs, with the term filter pushed into
    // parquet — never re-tokenize the corpus per query
    val scanLine = p.linesIterator.find(l =>
      l.contains("FileScan") && l.contains("postings"))
    assert(scanLine.isDefined, s"no postings scan in plan:\n${p.take(1500)}")
    assert(scanLine.get.contains("PartitionFilters: [") &&
      scanLine.get.replaceAll(".*PartitionFilters", "").contains("bucket"),
      s"bucket partition prune missing:\n${scanLine.get}")
    assert(scanLine.get.contains("In(term"),
      s"term filter not pushed to the postings scan:\n${scanLine.get}")
    assert(!p.contains("explode"),
      "tokenization must happen at build time, not per query")
  }

  test("perplexity proxy: doc_id window pruned at the scan, freq join stays equi") {
    val p = planOf("perplexity_proxy")
    // the 1-row corpus total rides a broadcast nested-loop cross by design;
    // the hazard is the token→freq join degenerating to a product
    assert(!p.contains("CartesianProduct"),
      "token→freq must be an equi-join on the word")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"the freq join must be hash/merge on the word:\n${p.take(1500)}")
    assert(p.contains("LessThan(doc_id,100)"),
      s"the doc_id < 100 window must reach the parquet scan:\n${p.take(1500)}")
  }

  test("vocab coverage: limit runs BELOW the rank window (top-k first, rank 40 words)") {
    val p = planOf("vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"the vocab top-40 must merge per-partition top-k on the driver:\n${p.take(2000)}")
    // a web-scale vocabulary is 1e8+ distinct words — the rank/cumsum
    // window must be the ancestor of the top-k (printed first), i.e. it
    // ranks the 40 survivors, never the whole vocabulary
    assert(p.indexOf("Window") >= 0 &&
        p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      s"the coverage window must rank only the 40 limited words:\n${p.take(2000)}")
  }

  test("hybrid rrf: both arms stay top-k-pushed below their rank windows") {
    val p = planOf("hybrid_rrf")
    assert(!p.contains("CartesianProduct"),
      "the fuse must stay a full-outer equi-join on doc_id")
    // three TakeOrderedAndProject: the bm25 arm's top-15, the knn arm's
    // top-15, the fused top-10 — each rank window sees <=15 survivors
    val takes = "TakeOrderedAndProject".r.findAllMatchIn(p).size
    assert(takes >= 3,
      s"expected top-k pushdown in both arms and the fuse (got $takes):\n${p.take(2000)}")
    assert(p.indexOf("Window") >= 0 &&
        p.indexOf("Window") < p.lastIndexOf("TakeOrderedAndProject"),
      s"rank windows must sit above their arms' top-k, never above the corpus:\n${p.take(2000)}")
  }

  test("pii redact: pure per-row work — no shuffle except the output sort") {
    val p = planOf("pii_redact")
    // redaction is map-only; the single Exchange in the plan is the
    // rangepartitioning for the final ORDER BY doc_id. A join or
    // aggregate here would mean the scrub stopped being embarrassingly
    // parallel.
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      s"pii scrub must stay per-row (no agg/join):\n${p.take(1500)}")
    val exchanges = "Exchange".r.findAllMatchIn(p).size
    assert(exchanges <= 1,
      s"expected at most the output-sort exchange, got $exchanges:\n${p.take(1500)}")
  }

  test("data mix weights: partial agg before the O(sources) shuffle; 1-row total broadcast") {
    val p = planOf("data_mix_weights")
    assert(!p.contains("CartesianProduct"),
      "the 1-row total must ride a broadcast, not a cartesian")
    // map-side combine: a partial_sum must appear below the exchange so
    // the shuffle carries per-partition per-source rows, not tokens
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"expected map-side partial aggregation before the shuffle:\n${p.take(1500)}")
  }

  test("corpus shuffle: limit runs BELOW the rank window (top-k first, rank 20 rows)") {
    val p = planOf("corpus_shuffle")
    assert(p.contains("TakeOrderedAndProject"),
      s"the limit must merge per-partition top-k on the driver:\n${p.take(2000)}")
    // tree printing puts children after parents: the window must be the
    // ancestor (printed first) and the top-k its input — the other order
    // means the whole corpus went through the single-partition window
    assert(p.indexOf("Window") >= 0 &&
        p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      s"row_number must rank only the 20 limited rows, not the corpus:\n${p.take(2000)}")
  }

  test("binary KNN (hamming/jaccard): bounded top-k merge, no shuffle of the index side") {
    // same contract as the dense family: the packed-popcount kernels must
    // not break the TakeOrderedAndProject shape or force a shuffle
    for (name <- Seq("knn_hamming", "binary_jaccard")) {
      val p = planOf(name)
      assert(p.contains("TakeOrderedAndProject"),
        s"$name: top-k must plan as partial per-partition top-k + driver merge")
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name: a binary KNN scan must not shuffle the index")
    }
  }

  test("sparse dot top-k: query postings broadcast, partial sums before the shuffle") {
    val p = planOf("sparse_dot_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"the query's nonzero dims must broadcast into the postings join:\n${p.take(2000)}")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"per-doc dots must partial-aggregate map-side before the shuffle:\n${p.take(2000)}")
    assert(p.contains("TakeOrderedAndProject"),
      "the final top-10 must merge per-partition top-k on the driver")
  }
}
