package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.ingest.IngestOps

/** Structured-Streaming ingest path (SURVEY A1, A20, C15).
  *
  * The reference is event-driven: RGW bucket notifications push S3-event
  * JSON over HTTP into a Flask handler, one object per request
  * (`s3vectors-app/pythonvectordbceph.py:121-147`). The Spark-native
  * equivalent is a streaming DataFrame of raw notification JSON
  * (`readStream` on a landing prefix in production, `MemoryStream` in
  * tests) → `parseEvents` → `foreachBatch` merge, which batches thousands
  * of events per commit instead of one RPC per object.
  *
  * Consistency (A20): the reference reads with `consistency_level=Strong`
  * (`milvus-app/search.py:18`). Batch reads of the keyed index are
  * snapshot-consistent by construction; `Trigger.AvailableNow` drains every
  * pending event before the query runs — the streaming stand-in for a
  * strong read.
  */
object StreamingIngest {

  /** Ceph/S3 bucket-notification shape — the fields the reference reads at
    * `s3vectors-app/pythonvectordbceph.py:128-132` (`tags` is the Ceph
    * extension, always present — FIXTURES.md §2.1). */
  val notificationSchema: DataType = DataType.fromDDL(
    """Records array<struct<
      |  eventVersion: string, eventSource: string, eventName: string,
      |  s3: struct<
      |    bucket: struct<name: string>,
      |    object: struct<key: string, size: bigint, tags: map<string,string>>>>>
      |""".stripMargin.replace("\n", " "))

  /** CloudEvents 1.0 structured-mode envelope — what the reference's
    * Knative channel (`s3vectors-app/knative-resources.yaml:1-41`,
    * InMemoryChannel → Subscription) delivers to the subscriber: the S3
    * notification nested under `data`, spec metadata alongside. (Binary
    * mode carries the metadata in ce-* HTTP headers with the bare
    * notification as body — that shape needs no unwrap.) */
  val cloudEventsSchema: DataType = {
    import org.apache.spark.sql.types._
    new StructType()
      .add("specversion", StringType).add("id", StringType)
      .add("source", StringType).add("type", StringType)
      .add("time", StringType).add("datacontenttype", StringType)
      .add("data", notificationSchema)
  }

  /** A2 on a stream: raw JSON lines → one row per record with the fields
    * the ingest loop dispatches on. `Records` is exploded, so a batched
    * notification carrying several records yields several rows (the
    * reference reads only `Records[0]` — `pythonvectordbceph.py:128` —
    * and would silently drop the rest; we don't). A CloudEvents structured
    * envelope is unwrapped transparently — `specversion` present means the
    * notification sits under `data`; a bare notification parses as before,
    * so one stream can mix direct RGW posts and channel-delivered events.
    * `event_ts` is the event-time column downstream watermarks key on. */
  def parseEvents(raw: DataFrame, jsonCol: String = "value",
                  tsCol: Option[String] = None): DataFrame = {
    val ce = from_json(col(jsonCol), cloudEventsSchema)
    val records = when(ce.getField("specversion").isNotNull,
        ce.getField("data").getField("Records"))
      .otherwise(from_json(col(jsonCol), notificationSchema).getField("Records"))
    val base = raw
      .withColumn("__rec", explode(records))
      .select(
        col("__rec.eventName").as("event_name"),
        col("__rec.s3.bucket.name").as("bucket"),
        col("__rec.s3.object.key").as("key"),
        col("__rec.s3.object.size").as("size"),
        col("__rec.s3.object.tags").as("tags"),
        col("*"))
      .drop("__rec")
    tsCol.fold(base)(c => base.withColumn("event_ts", col(c)))
  }

  /** Split parsed events into the upsert stream and the delete stream —
    * the branch at `s3vectors-app/pythonvectordbceph.py:138`. */
  def isDelete(c: Column): Column = c.startsWith("ObjectRemoved")

  /** One micro-batch of the index merge: last-write-wins upsert of puts,
    * anti-join of deletes — the same set-at-a-time operators as the batch
    * path (IngestOps), applied to index ∪ batch. Used from `foreachBatch`.
    *
    * Event-TIME ordering holds WITHIN a micro-batch; the applied state is
    * the boundary ACROSS batches (no tombstone retention): a put whose
    * event_ts predates an already-applied delete but arrives in a LATER
    * batch re-creates the key. That is the reference's own semantics —
    * its handler applies events serially in arrival order with no
    * event-time reasoning, so a late re-delivered put resurrects there
    * too (`s3vectors-app/pythonvectordbceph.py:121-147`); retaining
    * delete tombstones (Cassandra-style, with an expiry) is the upgrade
    * if cross-batch event-time LWW is ever required. The production path
    * (`GraftClient.startIngest`) resolves by ARRIVAL order within each
    * batch for exactly this consistency.
    *
    * At scale the rewrite would be partitioned by key-bucket so a batch
    * only rewrites touched buckets; the merge PLAN (union → window →
    * anti-join) is unchanged. */
  def mergeBatch(index: DataFrame, batch: DataFrame): DataFrame = {
    val puts = batch.filter(!isDelete(col("event_name")))
      .select(col("key"), col("bucket"), col("tags"), col("event_ts"), col("seq"))
    val deletes = batch.filter(isDelete(col("event_name")))
    val merged = IngestOps.upsertLatest(
      index.unionByName(puts), col("key"), col("event_ts"), col("seq"))
    // A delete wins over any put at-or-before it; later re-puts resurrect
    // the key (matched by the reference's event ordering per object).
    val lastDelete = IngestOps.upsertLatest(deletes, col("key"), col("event_ts"), col("seq"))
      .select(col("key"), col("event_ts").as("del_ts"), col("seq").as("del_seq"))
    merged.join(lastDelete, Seq("key"), "left_outer")
      .filter(col("del_ts").isNull ||
        col("event_ts") > col("del_ts") ||
        (col("event_ts") === col("del_ts") && col("seq") > col("del_seq")))
      .drop("del_ts", "del_seq")
  }

  /** C15: event-time tumbling-window counts with watermark late-drop. */
  def tumblingCounts(events: DataFrame, tsCol: String, watermark: String,
                     windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_name"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_name"), col("n"))
}
