package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.core.Tables

/** Scalar-function surface: string (C9), date/time (C10), math (C11),
  * array (C12 built-ins), map/JSON (C13).
  *
  * All codegen'd built-ins — no UDFs anywhere, so every query below stays
  * inside one WholeStageCodegen span over the scan.
  */
object ScalarQueries {

  /** C9: string function bundle over `part` — concat/substring/case/trim/
    * length/like/regexp/split/lpad (A18's grammar and beyond). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "part")
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 5).as("name5"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        col("p_name").like("%red%").as("is_red"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        split(col("p_name"), " ").getItem(1).as("second_word"),
        lpad(col("p_brand"), 10, "*").as("brand_padded"),
        trim(lit("  x  ")).as("trimmed"))
      .orderBy(col("p_partkey"))

  /** C10: date/time bundle over `orders` — extract/trunc/add/diff, grouped
    * per month so the output is compact. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "orders")
      .select(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_epoch_end"))
      .groupBy(col("y"), col("m"), col("month_start"))
      .agg(count(lit(1)).as("n"),
        min(col("d")).as("min_day"), max(col("d")).as("max_day"),
        min(col("due_date")).as("min_due"),
        max(col("days_to_epoch_end")).as("max_days_left"))
      .orderBy(col("y"), col("m"))

  /** C11: math bundle over `lineitem`. */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"),
        // round to 6 on an irrational-ish value — rounding a 2-decimal
        // price to 1 decimal sits exactly on .X5 boundaries where Spark
        // (HALF_UP via BigDecimal) and DuckDB diverge per-ulp.
        round(col("l_extendedprice") / 7, 6).as("price_div7"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        // decimal cast snaps the fp error to exactly 2 dp; final DOUBLE so
        // both engines serialize the identical value for the driver's hash
        abs(col("l_discount") - 0.05).cast("decimal(8,2)").cast("double").as("disc_dev"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(log10(col("l_extendedprice")), 6).as("price_log10"),
        (col("l_orderkey") % 7).as("mod7"))
      .orderBy(col("l_orderkey"), col("line_no"))

  /** C12: array built-ins over tokenized document text — size/contains/
    * element_at/slice/sort/distinct plus the lambda trio
    * (transform/filter/aggregate). */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(
        col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        array_contains(col("words"), "spark").as("has_spark"),
        element_at(col("words"), 1).as("first_word"),
        concat_ws("|", slice(col("words"), 1, 3)).as("first3"),
        concat_ws("|", sort_array(array_distinct(col("words")))).as("vocab_sorted"),
        size(filter(col("words"), w => length(w) > 4)).cast("long").as("n_long_words"),
        aggregate(col("words"), lit(0L), (acc, w) => acc + length(w)).as("total_chars"),
        concat_ws("|", slice(transform(col("words"), w => upper(w)), 1, 2)).as("first2_upper"))
      .orderBy(col("doc_id"))

  /** C13: map/JSON bundle over `events.props` — get_json_object, from_json
    * to a typed map, map_keys/element_at (A2/A8's machinery generalized). */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val m = from_json(col("props"), DataType.fromDDL("map<string,int>"))
    ev.filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        m.getItem("k").as("k_int"),
        size(map_keys(m)).cast("long").as("n_keys"),
        element_at(map_keys(m), 1).as("first_key"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "string_funcs" -> stringFuncs _,
    "date_funcs" -> dateFuncs _,
    "math_funcs" -> mathFuncs _,
    "array_funcs" -> arrayFuncs _,
    "json_funcs" -> jsonFuncs _
  )

  val oracleSql: Map[String, String] = Map(
    "string_funcs" ->
      """SELECT p_partkey,
            p_brand || ':' || p_type AS brand_type,
            substring(p_name, 1, 5) AS name5,
            upper(p_name) AS name_upper,
            length(p_name) AS name_len,
            p_name LIKE '%red%' AS is_red,
            regexp_extract(p_name, '^(\w+)', 1) AS first_word,
            str_split(p_name, ' ')[2] AS second_word,
            lpad(p_brand, 10, '*') AS brand_padded,
            trim('  x  ') AS trimmed
         FROM part ORDER BY p_partkey""",
    "date_funcs" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
            CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
            count(*) AS n,
            min(day(o_orderdate)) AS min_day, max(day(o_orderdate)) AS max_day,
            min(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) :: DATE AS min_due,
            max(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS max_days_left
         FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""",
    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber AS line_no,
            round(l_extendedprice / 7, 6) AS price_div7,
            CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
            CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
            CAST(CAST(abs(l_discount - 0.05) AS DECIMAL(8,2)) AS DOUBLE) AS disc_dev,
            round(sqrt(l_extendedprice), 6) AS price_sqrt,
            round(pow(l_quantity, 2), 2) AS qty_sq,
            round(ln(l_extendedprice), 6) AS price_ln,
            round(log10(l_extendedprice), 6) AS price_log10,
            l_orderkey % 7 AS mod7
         FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, line_no""",
    "array_funcs" ->
      """SELECT doc_id,
            len(words) AS n_words,
            list_contains(words, 'spark') AS has_spark,
            words[1] AS first_word,
            array_to_string(words[1:3], '|') AS first3,
            array_to_string(list_sort(list_distinct(words)), '|') AS vocab_sorted,
            len(list_filter(words, w -> length(w) > 4)) AS n_long_words,
            length(replace(text, ' ', '')) AS total_chars,
            array_to_string(list_transform(words[1:2], w -> upper(w)), '|') AS first2_upper
         FROM (SELECT doc_id, text, str_split(text, ' ') AS words FROM documents WHERE doc_id < 100)
         ORDER BY doc_id""",
    "json_funcs" ->
      """SELECT event_id,
            json_extract_string(props, '$.k') AS k_str,
            CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
            len(json_keys(props)) AS n_keys,
            json_keys(props)[1] AS first_key
         FROM events WHERE event_id < 2000 ORDER BY event_id"""
  )
}
