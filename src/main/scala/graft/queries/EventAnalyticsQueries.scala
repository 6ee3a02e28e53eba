package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Event-analytics surface over the `events` stream table: as-of
  * attribution (the temporal-join operator, `operators/AsofJoin.scala`),
  * funnel progression, and cohort retention — the query family a
  * training-data/product pipeline runs against event logs.
  *
  * Scale posture: every query is one or two key-partitioned
  * shuffles (user_id / cohort date); nothing materializes a per-user
  * history beyond a window frame, and the as-of join is the union-sort
  * form — |L|+|R| rows through one shuffle, no inequality-join blowup.
  */
object EventAnalyticsQueries {

  /** As-of attribution: every purchase attributed to THE latest view at
    * or before it by the same user (kdb/pandas `merge_asof`, DuckDB
    * `ASOF JOIN` — which is exactly the oracle). Unmatched purchases
    * keep null attribution (left as-of). */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("user_id") < 200)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    graft.operators.AsofJoin.asofBackward(
        purchases, views, by = Seq("user_id"),
        leftTs = "purchase_ts", rightTs = "view_ts",
        rightPayload = Seq("view_id", "view_ts"),
        rightTieBreak = Some("view_id"))
      .orderBy(col("purchase_id"))
  }

  /** Range join: every (purchase, click) pair by the same user within
    * ±10 minutes — the banded equi-join operator
    * (`operators/RangeJoin.scala`), timestamps compared in integral
    * microseconds (float µs would round, epoch seconds truncate/round
    * differently across engines). Oracle is DuckDB's inequality join. */
  def rangeJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("user_id") < 100)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("c_us"))
    graft.operators.RangeJoin.within(p, c, Seq("user_id"),
        "p_us", "c_us", tolerance = 600000000L) // 10 min in µs
      .select(col("purchase_id"), col("user_id"), col("p_us"),
        col("click_id"), col("c_us"), (col("p_us") - col("c_us")).as("diff_us"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Funnel progression signup → view → purchase, each stage strictly
    * ordered after the previous one per user (min qualifying timestamp
    * carried forward). One row: users reaching each stage. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val v = ev.filter(col("event_type") === "view")
      .join(s, Seq("user_id")).filter(col("ts") >= col("s_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(v, Seq("user_id")).filter(col("ts") >= col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    s.agg(count(lit(1)).as("n_signup"))
      .crossJoin(v.agg(count(lit(1)).as("n_signup_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_signup_view_purchase")))
  }

  /** Cohort retention: users grouped by first-seen day, distinct active
    * users per (cohort day, day offset) for the first week. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        // cast: DuckDB's date_diff yields BIGINT, Spark's datediff INT —
        // the oracle compare is rendering-exact, type included
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_attribution" -> asofAttribution _,
    "range_join_events" -> rangeJoinEvents _,
    "event_funnel" -> eventFunnel _,
    "retention_cohorts" -> retentionCohorts _
  )

  val oracleSql: Map[String, String] = Map(
    // DuckDB's native ASOF JOIN is the oracle for the custom operator —
    // ties among right rows on (user, ts) cannot occur in the fixture
    // (verified: zero (user_id, ts) collisions at every sf), so the
    // tie-break choice cannot diverge.
    "asof_attribution" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id,
                      CAST(ts AS TIMESTAMP) AS purchase_ts
                    FROM events WHERE event_type = 'purchase' AND user_id < 200),
           v AS (SELECT event_id AS view_id, user_id,
                      CAST(ts AS TIMESTAMP) AS view_ts
                 FROM events WHERE event_type = 'view' AND user_id < 200)
         SELECT p.purchase_id, p.user_id, p.purchase_ts, v.view_id, v.view_ts
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.view_ts <= p.purchase_ts
         ORDER BY p.purchase_id""",
    "range_join_events" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us
                    FROM events WHERE user_id < 100),
           p AS (SELECT event_id AS purchase_id, user_id, us AS p_us
                 FROM e WHERE event_type = 'purchase'),
           c AS (SELECT event_id AS click_id, user_id, us AS c_us
                 FROM e WHERE event_type = 'click')
         SELECT p.purchase_id, p.user_id, p.p_us, c.click_id, c.c_us,
                p.p_us - c.c_us AS diff_us
         FROM p JOIN c ON p.user_id = c.user_id
           AND abs(p.p_us - c.c_us) <= 600000000
         ORDER BY purchase_id, click_id""",
    "event_funnel" ->
      """WITH s AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS s_ts
                    FROM events WHERE event_type = 'signup' GROUP BY 1),
           v AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS v_ts
                 FROM events e JOIN s ON e.user_id = s.user_id
                 WHERE e.event_type = 'view' AND CAST(e.ts AS TIMESTAMP) >= s.s_ts
                 GROUP BY 1),
           p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS p_ts
                 FROM events e JOIN v ON e.user_id = v.user_id
                 WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= v.v_ts
                 GROUP BY 1)
         SELECT (SELECT count(*) FROM s) AS n_signup,
                (SELECT count(*) FROM v) AS n_signup_view,
                (SELECT count(*) FROM p) AS n_signup_view_purchase""",
    "retention_cohorts" ->
      """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
           cohorts AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
         SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
                count(DISTINCT user_id) AS n_users
         FROM ev JOIN cohorts USING (user_id)
         WHERE date_diff('day', cohort_day, day) <= 7
         GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""
  )
}
