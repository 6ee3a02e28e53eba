package graft.ingest

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** External-inference hook (SURVEY A4/A5 closing the §7.0 gap): the
  * reference's real models (SentenceTransformer MiniLM, timm resnet34 —
  * `s3vectors-app/pythonvectordbceph.py:161-169`) can't run in the JVM, so
  * this embedder ships rows to an HTTP inference service instead, batching
  * `batchSize` inputs per round-trip when driven through
  * [[Embedder.embedDocumentsBulk]] (one request per batch per partition —
  * never one RPC per row, which is the reference's own anti-pattern).
  *
  * Wire protocol (any model server can adapt to it):
  *   POST <endpoint>  {"inputs":[{"text":"..."}|{"bytes_b64":"..."}, ...]}
  *   → 200            {"vectors":[[f32 × dim], ...]}   (same order/length)
  *
  * JSON via jackson-databind, which Spark already ships. The hashing
  * stand-in stays the default — select this one per session with
  * `spark.graft.embedder.endpoint` (see [[Embedder.configured]]). */
case class RemoteEmbedder(endpoint: String, dim: Int, batchSize: Int = 64,
                          connectTimeoutMs: Int = 5000,
                          readTimeoutMs: Int = 60000) extends BulkEmbedder {
  require(dim > 0 && batchSize > 0)

  override def embedText(text: String): Array[Float] =
    embedTexts(Seq(text)).head

  override def embedBytes(bytes: Array[Byte]): Array[Float] =
    embedItems(Seq(Right(bytes))).head

  override def embedTexts(texts: Seq[String]): Seq[Array[Float]] =
    embedItems(texts.map(Left(_)))

  /** One HTTP round-trip for a whole mixed batch. */
  override def embedItems(items: Seq[Either[String, Array[Byte]]]): Seq[Array[Float]] = {
    val mapper = RemoteEmbedder.mapper
    val root = mapper.createObjectNode()
    val arr = root.putArray("inputs")
    items.foreach {
      case Left(text) => arr.addObject().put("text", text)
      case Right(bytes) =>
        arr.addObject().put("bytes_b64", java.util.Base64.getEncoder.encodeToString(bytes))
    }
    val body = mapper.writeValueAsBytes(root)

    val conn = new URI(endpoint).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.getOutputStream.write(body)
      val status = conn.getResponseCode
      if (status != 200) {
        val err = Option(conn.getErrorStream)
          .map(s => new String(s.readAllBytes(), StandardCharsets.UTF_8)).getOrElse("")
        throw new java.io.IOException(s"embedding service $endpoint returned $status: $err")
      }
      val resp = mapper.readTree(conn.getInputStream)
      val vectors = resp.get("vectors")
      require(vectors != null && vectors.size() == items.size,
        s"embedding service returned ${if (vectors == null) "no" else vectors.size()} " +
          s"vectors for ${items.size} inputs")
      (0 until vectors.size()).map { i =>
        val v = vectors.get(i)
        require(v.size() == dim,
          s"embedding service returned dimension ${v.size()}, expected $dim")
        Array.tabulate(dim)(j => v.get(j).floatValue())
      }
    } finally conn.disconnect()
  }
}

object RemoteEmbedder {
  // ObjectMapper construction is Jackson's documented-expensive setup and
  // instances are thread-safe for read/write — one shared mapper per JVM,
  // not one per batch on the per-chunk ingest hot path
  private[ingest] val mapper = new ObjectMapper()
}
