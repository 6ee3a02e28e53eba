package graft.streaming

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** The reference's HTTP push boundary (A1): RGW bucket notifications POST
  * S3-event JSON to a Flask handler, one object per request
  * (`s3vectors-app/pythonvectordbceph.py:121-122`). Here the listener only
  * LANDS the payload — each POST body becomes one file under the landing
  * prefix `GraftClient.startIngest` consumes — so the stream stays the
  * system of record and the HTTP hop stays stateless and restartable. At
  * deployment scale this role is any webhook→object-store relay; the
  * engine's contract is just "notification files appear under the prefix".
  *
  * Durability/ordering: the body is written to a temp file and atomically
  * moved in, so the file stream never reads a half-received payload; the
  * landing filename carries a monotonic counter (resumed from the existing
  * files on restart) so same-mtime posts keep their arrival order under
  * startIngest's (mtime, path-length, path) sort. */
class LandingReceiver(landingDir: String, port: Int = 0) {
  private val dir = Paths.get(landingDir)
  Files.createDirectories(dir)

  private val seq = {
    val listing = Files.list(dir)
    val existing =
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        // strict match: a stray non-numeric file (e.g. `evt-test.json`)
        // must not throw in the constructor — it's simply not ours
        .collect { case n if n.matches("evt-\\d+\\.json") =>
          n.stripPrefix("evt-").stripSuffix(".json").toLong }
        .maxOption.getOrElse(-1L)
      finally listing.close()
    new java.util.concurrent.atomic.AtomicLong(existing + 1)
  }

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (status, msg) =
        if (ex.getRequestMethod != "POST") (405, "POST only")
        else {
          var tmp: java.nio.file.Path = null
          try {
            val body = ex.getRequestBody.readAllBytes()
            tmp = Files.createTempFile(dir, ".recv-", ".tmp")
            Files.write(tmp, body)
            Files.move(tmp, dir.resolve(f"evt-${seq.getAndIncrement()}%012d.json"),
              StandardCopyOption.ATOMIC_MOVE)
            tmp = null
            (200, "OK")
          } catch {
            case e: Exception =>
              // a failed receive must not leak its half-written temp file
              // into the landing dir forever
              if (tmp != null) Files.deleteIfExists(tmp)
              (500, Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
          }
        }
      val bytes = msg.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  })
  server.start()

  /** The bound port (pass port=0 to auto-assign, e.g. in tests). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}
