package graft.api

/** One Milvus `AnnSearchRequest` — an arm of
  * [[GraftClient.hybridSearchRequests]], Milvus's N-ary `hybrid_search`
  * (pymilvus takes a LIST of requests plus a ranker; the pairwise
  * hybrid surfaces are the two-arm special cases). Each arm carries its
  * own search knobs and, for the WeightedRanker, its weight.
  *
  * Reference anchor: the Milvus backend the reference app targets
  * (`milvus-app/pythonvectordbceph_milvus.py`) exposes `hybrid_search`
  * on collections with multiple vector fields; here the "fields" are
  * the collection's float vectors, its attached sparse index, and its
  * attached text index's BM25 function. */
sealed trait AnnRequest {
  def weight: Double

  /** This arm's own Milvus filter string (pymilvus
    * `AnnSearchRequest(..., expr=...)` — r14, VERDICT r13's #3): parsed
    * by the [[MilvusFilter]] grammar and INTERSECTED with
    * `hybridSearchRequests`' shared `filter`, exactly as Milvus applies
    * the request's expr to that arm only. Empty = no per-arm filter. */
  def expr: String
}

object AnnRequest {
  /** The dense arm — [[GraftClient.search]] over the collection's own
    * float vectors with its knobs (nprobe/refine for IVF families, ef
    * for HNSW). `field` names a declared EXTRA vector field of a
    * multi-vector collection (Milvus 2.4 — pymilvus
    * `AnnSearchRequest(anns_field=...)`): the arm then ranks THAT
    * field's vectors through its own index/staleness state; "" = the
    * primary `vec`, so two Dense arms on different fields is exactly
    * Milvus's cross-field hybrid_search. */
  case class Dense(qvec: Array[Float], nprobe: Int = 4, refine: Int = 4,
                   ef: Int = 0, weight: Double = 1.0,
                   expr: String = "", field: String = "") extends AnnRequest

  /** A sparse-field arm — the SPLADE/lexical second vector. Three
    * layouts serve it, strongest contract first:
    *
    *   - `field` nonempty: a declared SPARSE_FLOAT_VECTOR extra field
    *     of a multi-vector collection (Milvus 2.4's full schema) — the
    *     arm rides the sparse COLLECTION family through the field view:
    *     store-owned vectors, auto-maintained index with an exact
    *     staleness fallback, and partition scope / per-arm expr applied
    *     BEFORE ranking (exactly as Milvus scopes an anns_field arm).
    *   - the collection IS sparse (no field, no dir): its own search.
    *   - otherwise the ATTACHED sparse index
    *     ([[GraftClient.buildSparseIndex]]; `sparseDir` overrides with
    *     a caller-managed layout, no freshness tie —
    *     [[GraftClient.hybridDenseSparse]]'s exact contract). The
    *     attached layout keeps no vectors in the store, so scope/expr
    *     gate its hits AFTER ranking (order-preserving, may under-fill
    *     the arm below armK) — declaring the field retires that
    *     difference. */
  case class SparseField(query: Seq[(Long, Double)], sparseDir: String = "",
                         metric: String = "dot",
                         weight: Double = 1.0,
                         expr: String = "",
                         field: String = "") extends AnnRequest

  /** A Milvus 2.5 BM25 text request — a RAW query string analyzed by
    * the attached text index's own persisted analyzer and ranked from
    * its postings alone ([[GraftClient.fullTextSearch]]). */
  case class Bm25Text(query: String, weight: Double = 1.0,
                      expr: String = "") extends AnnRequest
}
