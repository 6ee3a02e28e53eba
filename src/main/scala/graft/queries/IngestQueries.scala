package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.core.Tables
import graft.ingest.IngestOps

/** Ingest-pipeline query surface (SURVEY §2 A2, A8–A11, A18, A19).
  *
  * The `events` fixture plays the role of the reference's S3-notification
  * stream (`s3vectors-app/pythonvectordbceph.py:121-147`): `user_id` is the
  * object key, `ts` the event time, `event_type == "error"` maps to
  * `ObjectRemoved:Delete`, everything else to `ObjectCreated:Put`.
  */
object IngestQueries {

  private val notifSchema: DataType =
    graft.streaming.StreamingIngest.notificationSchema

  /** A2: synthesize a Ceph-shaped S3 notification per event, then parse it
    * back with `from_json` and extract the nested fields — the exact access
    * pattern of `s3vectors-app/pythonvectordbceph.py:128-132`
    * (`Records[0].eventName`, `.s3.object.key`, `.s3.object.tags`). The
    * oracle computes the fields directly, so any loss in the to_json →
    * from_json roundtrip shows up as a mismatch. */
  def eventParse(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val record = struct(
      lit("2.2").as("eventVersion"),
      lit("ceph:s3").as("eventSource"),
      when(col("event_type") === "error", lit("ObjectRemoved:Delete"))
        .otherwise(lit("ObjectCreated:Put")).as("eventName"),
      struct(
        struct(concat(lit("bkt-"), col("user_id")).as("name")).as("bucket"),
        struct(
          concat(lit("objects/"), col("user_id"), lit("/"), col("event_id")).as("key"),
          col("event_id").as("size"),
          map(lit("k"), get_json_object(col("props"), "$.k")).as("tags")
        ).as("object")
      ).as("s3"))
    val notif = ev.select(
      col("event_id"),
      to_json(struct(array(record).as("Records"))).as("raw"))
    val rec = notif.select(
      col("event_id"),
      from_json(col("raw"), notifSchema).getField("Records").getItem(0).as("r"))
    rec.select(
        col("event_id"),
        col("r.eventName").as("event_name"),
        col("r.s3.bucket.name").as("bucket"),
        col("r.s3.object.key").as("object_key"),
        element_at(col("r.s3.object.tags"), "k").as("tag_k"))
      .filter(col("event_id") < 2000)
      .orderBy(col("event_id"))
  }

  /** A8: metadata construction — url concat + `to_json` of a string map,
    * with the reference's "tags only when non-empty" branch
    * (`s3vectors-app/pythonvectordbceph.py:178-184`). */
  def metadataToJson(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val url = concat_ws("/", lit("http://rgw"), concat(lit("bkt-"), col("user_id")),
      concat(lit("obj-"), col("event_id")))
    val k = get_json_object(col("props"), "$.k")
    ev.select(
        col("event_id"),
        to_json(map(
          lit("url"), url,
          lit("object_key"), concat(lit("obj-"), col("event_id")),
          lit("bucket"), concat(lit("bkt-"), col("user_id")))).as("meta_json"),
        when(k =!= "0", to_json(map(lit("k"), k))).as("tags_json"))
      .filter(col("event_id") < 2000)
      .orderBy(col("event_id"))
  }

  /** A9: last-write-wins upsert — latest event per key (window + rank
    * filter; `s3vectors-app/pythonvectordbceph.py:194-206` semantics). */
  def upsertLastWriteWins(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    IngestOps.upsertLatest(ev, col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("ts").as("last_ts"))
      .orderBy(col("user_id"))
  }

  /** A10: delete-by-key — anti-join the upserted index against keys that saw
    * an `ObjectRemoved:Delete` (here: any `error` event). */
  def deleteByKey(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val index = IngestOps.upsertLatest(ev, col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"))
    // Sparse delete set (every user has *some* error event in the fixture;
    // an unrestricted set would empty the index and make the check vacuous).
    val deletes = ev.filter(col("event_type") === "error" && col("event_id") % 50 === 0)
    IngestOps.deleteByKey(index, deletes, "user_id")
      .orderBy(col("user_id"))
  }

  /** A11: delete-by-predicate — Milvus `client.delete(filter=...)`
    * (`milvus-app/pythonvectordbceph_milvus.py:108-111`) as an anti-filter
    * over the upserted index. */
  def deleteByPredicate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val index = IngestOps.upsertLatest(ev, col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
    IngestOps.deleteByPredicate(index,
        col("last_type") === "click" || col("user_id") % 7 === 0)
      .orderBy(col("user_id"))
  }

  /** A18: name derivation — `re.sub('-','_',bucket)` and URL concat
    * (`milvus-app/pythonvectordbceph_milvus.py:81,105`). */
  def nameDerivation(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "part")
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), " ", "_").as("collection_name"),
        concat_ws("/", lit("http://rgw"), lower(col("p_brand")),
          lower(col("p_type")), regexp_replace(col("p_name"), " ", "-")).as("object_url"))
      .orderBy(col("p_partkey"))

  /** A19: type dispatch — the TEXT/IMAGE/other `match` at
    * `s3vectors-app/pythonvectordbceph.py:158-173` as CASE WHEN (the
    * `raise_error` arm is unit-tested, not declared — it would fail the
    * whole query by design). */
  def typeDispatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        when(col("event_type").isin("signup", "purchase"), "TEXT")
          .when(col("event_type").isin("click", "view"), "IMAGE")
          .otherwise("UNSUPPORTED").as("object_class"),
        col("value"))
      .groupBy(col("object_class"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("object_class"))

  /** A2, the deployed delivery path: the reference's Knative channel
    * (`s3vectors-app/knative-resources.yaml:1-41`) wraps each notification
    * in a CloudEvents 1.0 structured envelope before it reaches the
    * subscriber. Even event_ids get the envelope, odd ones stay bare RGW
    * posts, and BOTH go through the production `parseEvents` — the oracle
    * computes every output field directly, so a wrong branch in the
    * envelope dispatch (or any unwrap loss) hash-mismatches. */
  def cloudEventsParse(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val record = struct(
      lit("2.2").as("eventVersion"),
      lit("ceph:s3").as("eventSource"),
      when(col("event_type") === "error", lit("ObjectRemoved:Delete"))
        .otherwise(lit("ObjectCreated:Put")).as("eventName"),
      struct(
        struct(concat(lit("bkt-"), col("user_id")).as("name")).as("bucket"),
        struct(
          concat(lit("objects/"), col("user_id"), lit("/"), col("event_id")).as("key"),
          col("event_id").as("size"),
          map(lit("k"), get_json_object(col("props"), "$.k")).as("tags")
        ).as("object")
      ).as("s3"))
    val notif = struct(array(record).as("Records"))
    val envelope = struct(
      lit("1.0").as("specversion"),
      concat(lit("evt-"), col("event_id")).as("id"),
      lit("/rgw/notifications").as("source"),
      lit("dev.knative.channel.event").as("type"),
      notif.as("data"))
    val raw = ev.select(
      col("event_id"),
      (pmod(col("event_id"), lit(2)) === 0).as("enveloped"),
      when(pmod(col("event_id"), lit(2)) === 0, to_json(envelope))
        .otherwise(to_json(notif)).as("value"))
    graft.streaming.StreamingIngest.parseEvents(raw)
      .select(col("event_id"), col("event_name"), col("bucket"),
        col("key").as("object_key"),
        element_at(col("tags"), "k").as("tag_k"), col("enveloped"))
      .filter(col("event_id") < 2000)
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_parse" -> eventParse _,
    "cloudevents_parse" -> cloudEventsParse _,
    "metadata_to_json" -> metadataToJson _,
    "upsert_last_write_wins" -> upsertLastWriteWins _,
    "delete_by_key" -> deleteByKey _,
    "delete_by_predicate" -> deleteByPredicate _,
    "name_derivation" -> nameDerivation _,
    "type_dispatch" -> typeDispatch _
  )

  // DuckDB notes: events.ts is TIMESTAMP_NS — cast to TIMESTAMP(µs) to match
  // Spark's truncation (Tables.events); regexp_replace needs the 'g' flag
  // (Spark replaces all occurrences by default, DuckDB only the first).
  // The rank ORDER BY must use the µs-CAST ts, not raw ns: Spark ranks on
  // the truncated timestamp, so two same-user events inside one µs with ns
  // order opposite to event_id order would otherwise diverge.
  private val upsertIdx =
    """(SELECT user_id, event_id AS last_event_id, event_type AS last_type,
              CAST(ts AS TIMESTAMP) AS last_ts, value AS last_value
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn FROM events)
       WHERE rn = 1)"""

  val oracleSql: Map[String, String] = Map(
    "cloudevents_parse" ->
      """SELECT event_id,
            CASE WHEN event_type = 'error' THEN 'ObjectRemoved:Delete'
                 ELSE 'ObjectCreated:Put' END AS event_name,
            'bkt-' || user_id AS bucket,
            'objects/' || user_id || '/' || event_id AS object_key,
            json_extract_string(props, '$.k') AS tag_k,
            (event_id % 2 = 0) AS enveloped
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "event_parse" ->
      """SELECT event_id,
            CASE WHEN event_type = 'error' THEN 'ObjectRemoved:Delete'
                 ELSE 'ObjectCreated:Put' END AS event_name,
            'bkt-' || user_id AS bucket,
            'objects/' || user_id || '/' || event_id AS object_key,
            json_extract_string(props, '$.k') AS tag_k
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "metadata_to_json" ->
      """SELECT event_id,
            to_json(MAP {'url': 'http://rgw/bkt-' || user_id || '/obj-' || event_id,
                         'object_key': 'obj-' || event_id,
                         'bucket': 'bkt-' || user_id}) AS meta_json,
            CASE WHEN json_extract_string(props, '$.k') <> '0'
                 THEN to_json(MAP {'k': json_extract_string(props, '$.k')}) END AS tags_json
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "upsert_last_write_wins" ->
      s"SELECT user_id, last_event_id, last_type, last_ts FROM $upsertIdx ORDER BY user_id",
    "delete_by_key" ->
      s"""SELECT user_id, last_event_id, last_type FROM $upsertIdx i
          WHERE NOT EXISTS (SELECT 1 FROM events e
                            WHERE e.event_type = 'error' AND e.event_id % 50 = 0
                              AND e.user_id = i.user_id)
          ORDER BY user_id""",
    "delete_by_predicate" ->
      s"""SELECT user_id, last_event_id, last_type, last_value FROM $upsertIdx
          WHERE NOT (last_type = 'click' OR user_id % 7 = 0)
          ORDER BY user_id""",
    "name_derivation" ->
      """SELECT p_partkey,
            regexp_replace(p_name, ' ', '_', 'g') AS collection_name,
            'http://rgw/' || lower(p_brand) || '/' || lower(p_type) || '/'
              || regexp_replace(p_name, ' ', '-', 'g') AS object_url
         FROM part ORDER BY p_partkey""",
    "type_dispatch" ->
      """SELECT CASE WHEN event_type IN ('signup','purchase') THEN 'TEXT'
                     WHEN event_type IN ('click','view') THEN 'IMAGE'
                     ELSE 'UNSUPPORTED' END AS object_class,
                count(*) AS n, round(avg(value), 4) AS avg_value
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}
