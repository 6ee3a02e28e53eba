package graft.core

/** The engine's typed core row (SURVEY §1.2): one row per ingested object —
  * key + float32 vector + open metadata map, mirroring the reference's
  * Milvus row `{embedded_vector, url, tags}`
  * (`milvus-app/pythonvectordbceph_milvus.py:150-152`) and S3Vectors row
  * `{key, data.float32, metadata}` (`s3vectors-app/pythonvectordbceph.py:197-205`).
  * Used with `Dataset[VectorRecord]` on the typed ingest path; the
  * relational/SQL surface stays `DataFrame`. */
case class VectorRecord(
    key: String,
    url: String,
    bucket: String,
    vec: Array[Float],
    meta: Map[String, String],
    ingestTs: java.sql.Timestamp)
