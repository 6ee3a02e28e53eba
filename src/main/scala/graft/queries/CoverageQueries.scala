package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables.t
import graft.functions.VectorFunctions._

/** Gap-closing declared queries for SURVEY §2 rows that earlier families
  * only exercised incidentally: A7 (float32 cast), B1 (full metadata
  * predicate grammar on filtered KNN), C3 (right outer), C4 (GROUPING
  * SETS), C12 (array set ops), C13 (json_tuple), C18 (IN subquery). */
object CoverageQueries {

  /** A7: float32 storage cast made observable — a double quantized through
    * float32 differs from the double-precision original exactly as numpy's
    * `np.float32` cast does (`s3vectors-app/pythonvectordbceph.py:191`). */
  def float32Cast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(
        col("vec_id"),
        round(vector_norm(col("embedding")), 6).as("norm_f64"),
        vector_norm(col("embedding")).cast("float").cast("double").as("norm_f32"),
        element_at(col("embedding"), 1).cast("double").as("first_at_rest"))
      .orderBy(col("vec_id"))

  /** B1: the Milvus-style metadata filter grammar — IN, BETWEEN, AND/OR/
    * NOT, != — as the pre-filter of a top-k search (B2 shape). */
  def knnFilteredGrammar(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    emb.crossJoin(broadcast(q))
      .filter(
        col("label").isin(1, 3, 5, 7) &&
          col("vec_id").between(10, 400) &&
          !(col("vec_id") % 10 === 0) ||
          (col("label") === 9 && col("vec_id") =!= 0))
      .select(col("vec_id"), l2_distance(col("embedding"), col("qvec")).as("dist"), col("label"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(15)
  }

  /** C3: right outer join — all orders kept, suppliers-nation side only
    * when present (synthetic null-extension on the left). */
  def joinRightOuter(spark: SparkSession, dir: String): DataFrame = {
    val bigCust = t(spark, dir, "customer").filter(col("c_acctbal") > 9500)
      .select(col("c_custkey"), col("c_mktsegment"))
    bigCust.join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "right_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment").asc_nulls_first)
  }

  /** C4: GROUPING SETS — mixed granularities in one pass. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders_v
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
  }

  /** C12: array set algebra over adjacent documents' vocabularies —
    * intersect/union/except sizes (set semantics on both engines via
    * distinct inputs; only sizes are compared because element ORDER after
    * set ops is engine-specific). */
  def arraySetFuncs(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
    val a = docs.filter(col("doc_id") < 50)
    val b = docs.select((col("doc_id") - 1).as("doc_id"), col("ws").as("ws_next"))
    a.join(b, Seq("doc_id"))
      .select(
        col("doc_id"),
        size(array_intersect(col("ws"), col("ws_next"))).cast("long").as("n_shared"),
        size(array_union(col("ws"), col("ws_next"))).cast("long").as("n_union"),
        size(array_except(col("ws"), col("ws_next"))).cast("long").as("n_only_here"))
      .orderBy(col("doc_id"))
  }

  /** C13: json_tuple — multi-field extraction in one generator call. */
  def jsonTuple(spark: SparkSession, dir: String): DataFrame =
    graft.core.Tables.events(spark, dir)
      .filter(col("event_id") < 1000)
      .select(col("event_id"), json_tuple(col("props"), "k").as("k_str"))
      .orderBy(col("event_id"))

  /** C18: IN subquery (positive form; NOT IN is not_in_subquery). */
  def inSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "part").createOrReplaceTempView("part_v")
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT p_partkey, p_name, p_size FROM part_v
         WHERE p_partkey IN (SELECT l_partkey FROM lineitem_v WHERE l_quantity >= 49)
           AND p_size < 30
         ORDER BY p_partkey""")
  }

  /** C6: multi-column ORDER BY with explicit NULLS FIRST / NULLS LAST on a
    * derived nullable column (the fixtures themselves are null-free). The
    * driver's compare re-sorts rows, so null ORDERING is asserted via the
    * rank column computed under the explicit null placement. */
  def nullsOrdering(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(nullif(col("o_orderstatus"), lit("P")).asc_nulls_first,
        col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        col("o_totalprice").as("price"),
        row_number().over(w).cast("long").as("pos"))
      .orderBy(col("pos"))
  }

  /** B8 (r10): the Milvus filter-STRING grammar with TYPED numeric
    * semantics over string metadata — ranges, numeric IN, and a LIKE
    * prefix, all through [[graft.api.MilvusFilter.parse]] exactly as a
    * migrating `client.query(filter=...)` caller hands them. The meta
    * map stores every value as a STRING (the engine's storage model);
    * the grammar's DOUBLE casts must make `price > 905.5` compare
    * numerically, bit-equal to the oracle's native-typed comparison
    * (string→double round-trips are exact for Spark-rendered doubles). */
  def milvusFilterTypedRange(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"),
        map(lit("price"), col("p_retailprice").cast("string"),
          lit("size"), col("p_size").cast("string"),
          lit("brand"), col("p_brand")).as("meta"))
      .filter(graft.api.MilvusFilter.parse(
        """price > 905.5 && size <= 20 && size in [2, 5, 8, 10, 20] && brand like "Brand#1%""""))
      .select(col("p_partkey"))
      .orderBy(col("p_partkey"))

  /** B8 (r10): the Milvus `json_contains` family through the same string
    * grammar — the reference's own `tags` field is JSON
    * (`milvus-app/pythonvectordbceph_milvus.py:96`). String membership
    * via `json_contains_any(tags, [...])` and NUMERIC membership via
    * `json_contains(sizes, 8)` (try-cast comparison, so the JSON number
    * 8 matches the literal 8). */
  def milvusJsonContains(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"),
        map(lit("tags"), to_json(array(col("p_brand"), col("p_type"))),
          lit("sizes"), to_json(array(col("p_size"), col("p_size") + 1000)))
          .as("meta"))
      .filter(graft.api.MilvusFilter.parse(
        """json_contains_any(tags, ["Brand#13", "Brand#7"]) && json_contains(sizes, 8)"""))
      .select(col("p_partkey"))
      .orderBy(col("p_partkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nulls_ordering" -> nullsOrdering _,
    "float32_cast" -> float32Cast _,
    "knn_filtered_grammar" -> knnFilteredGrammar _,
    "milvus_filter_typed_range" -> milvusFilterTypedRange _,
    "milvus_json_contains" -> milvusJsonContains _,
    "join_right_outer" -> joinRightOuter _,
    "grouping_sets" -> groupingSets _,
    "array_set_funcs" -> arraySetFuncs _,
    "json_tuple" -> jsonTuple _,
    "in_subquery" -> inSubquery _
  )

  val oracleSql: Map[String, String] = Map(
    "nulls_ordering" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null,
            o_totalprice AS price,
            ROW_NUMBER() OVER (ORDER BY NULLIF(o_orderstatus, 'P') ASC NULLS FIRST,
                               o_totalprice DESC, o_orderkey) AS pos
         FROM orders WHERE o_orderkey < 500 ORDER BY pos""",
    "float32_cast" ->
      """SELECT vec_id,
            round(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm_f64,
            sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))::FLOAT::DOUBLE AS norm_f32,
            embedding[1]::DOUBLE AS first_at_rest
         FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""",
    "knn_filtered_grammar" ->
      """SELECT e.vec_id, list_distance(e.embedding::DOUBLE[], q.qvec) AS dist, e.label
         FROM embeddings e,
              (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0) q
         WHERE (e.label IN (1,3,5,7) AND e.vec_id BETWEEN 10 AND 400
                AND NOT (e.vec_id % 10 = 0))
            OR (e.label = 9 AND e.vec_id <> 0)
         ORDER BY dist, vec_id LIMIT 15""",
    "milvus_filter_typed_range" ->
      """SELECT p_partkey FROM part
         WHERE p_retailprice > 905.5 AND p_size <= 20
           AND p_size IN (2, 5, 8, 10, 20) AND p_brand LIKE 'Brand#1%'
         ORDER BY p_partkey""",
    "milvus_json_contains" ->
      """SELECT p_partkey FROM part
         WHERE p_brand IN ('Brand#13', 'Brand#7') AND p_size = 8
         ORDER BY p_partkey""",
    "join_right_outer" ->
      """SELECT c_mktsegment, count(*) AS n_orders
         FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9500) c
         RIGHT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""",
    "grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "array_set_funcs" ->
      """WITH d AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS ws FROM documents)
         SELECT a.doc_id,
            len(list_intersect(a.ws, b.ws)) AS n_shared,
            len(list_distinct(list_concat(a.ws, b.ws))) AS n_union,
            len(list_filter(a.ws, w -> NOT list_contains(b.ws, w))) AS n_only_here
         FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
         WHERE a.doc_id < 50 ORDER BY a.doc_id""",
    "json_tuple" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str
         FROM events WHERE event_id < 1000 ORDER BY event_id""",
    "in_subquery" ->
      """SELECT p_partkey, p_name, p_size FROM part
         WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
           AND p_size < 30
         ORDER BY p_partkey"""
  )
}
