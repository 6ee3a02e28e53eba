package graft.sources

import java.io.{FileNotFoundException, InputStream}
import java.net.{HttpURLConnection, URI, URL, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A minimal Hadoop FileSystem speaking the S3 REST protocol — path-style
  * GET / HEAD / PUT / DELETE / ListObjectsV2 (with continuation-token
  * pagination), ranged reads, server-side COPY (`x-amz-copy-source`) for
  * rename, and `key/` zero-byte directory markers — registered in place of
  * S3A via `fs.s3a.impl = graft.sources.S3LiteFileSystem`.
  *
  * Why it exists: this build environment has no `hadoop-aws` jar and no
  * egress to fetch one, so the stock `S3AFileSystem` cannot load — yet the
  * engine's RGW story (`RgwConfig` + `ObjectSources` over `s3a://`, the
  * reference's `s3.get_object` read at `s3vectors-app/pythonvectordbceph
  * .py:155` and `put_vectors` write at `:194-206`) deserves an END-TO-END
  * drive, not just conf-layer assertions. This class honors the exact conf
  * contract `RgwConfig` writes — `fs.s3a.endpoint`, `fs.s3a.access.key`,
  * `fs.s3a.path.style.access`, per-bucket `fs.s3a.bucket.<name>.*`
  * overrides — so IngestCapabilitySpec can drive a real Spark scan AND a
  * real committer-mediated Spark write (create → rename → delete, the
  * FileOutputCommitter protocol) against an in-process S3 server using the
  * reference deployment's env-var contract.
  *
  * Production posture, stated loudly: deployments WITH `hadoop-aws` on the
  * classpath should keep the stock `S3AFileSystem` (SigV4 signing,
  * multipart upload, the zero-rename magic committer — none of which this
  * class implements; the Authorization header sent here carries the
  * access key in SigV4 Credential SHAPE but no real signature, and rename
  * is the non-atomic COPY+DELETE every plain-S3 filesystem has). What IS
  * implemented besides the verb set: bounded-backoff retry of transient
  * 5xx/429 shedding and mid-body reconnect on broken reads — the failure
  * modes a fleet-scale scan hits routinely (see [[withRetry]]).
  * The protocol subset here is RGW's S3 API surface, which is also why the
  * same spec doubles as the gateway-contract test. */
class S3LiteFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var bucket: String = _
  private var endpoint: String = _
  private var accessKey: String = _
  private var workDir: Path = _

  override def getScheme: String = "s3a"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    bucket = name.getHost
    require(bucket != null && bucket.nonEmpty, s"no bucket in URI $name")
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    // the same per-bucket-then-global resolution S3A applies to RgwConfig's keys
    def k(suffix: String): String =
      Option(conf.get(s"fs.s3a.bucket.$bucket.$suffix"))
        .getOrElse(conf.get(s"fs.s3a.$suffix"))
    endpoint = Option(k("endpoint")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException("fs.s3a.endpoint is not set (RgwConfig.apply does)"))
    accessKey = Option(k("access.key")).getOrElse("")
    require(Option(k("path.style.access")).forall(_.toBoolean),
      "S3LiteFileSystem implements path-style addressing only (RGW's mode; " +
        "RgwConfig defaults pathStyle=true)")
    workDir = new Path(fsUri.toString + "/")
  }

  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = workDir = dir

  private def keyOf(f: Path): String =
    makeQualified(f).toUri.getPath.stripPrefix("/")

  private def encKey(key: String): String =
    key.split("/", -1).map(s =>
      URLEncoder.encode(s, "UTF-8").replace("+", "%20")).mkString("/")

  private def connect(method: String, urlStr: String,
                      range: Option[Long] = None): HttpURLConnection = {
    val c = new URL(urlStr).openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    // SigV4-SHAPED credential header (access key + scope) so the gateway
    // side can attribute the caller; real request signing is S3A's job.
    c.setRequestProperty("Authorization",
      s"AWS4-HMAC-SHA256 Credential=$accessKey/19700101/us-east-1/s3/aws4_request, " +
        "SignedHeaders=host, Signature=s3lite-unsigned")
    range.foreach(p => c.setRequestProperty("Range", s"bytes=$p-"))
    c
  }

  private def objectUrl(key: String): String = s"$endpoint/$bucket/${encKey(key)}"

  // ---- transient-failure retry ----
  //
  // S3/RGW shed load with transient 5xx/429 (SlowDown, InternalError): at
  // fleet scale some fraction of requests ALWAYS sees them, and a
  // 1000-executor job that fails a task per transient response turns
  // routine shedding into job churn. hadoop-aws retries these in
  // S3ARetryPolicy; so does this client. Every verb issued here is
  // idempotent — HEAD / GET / LIST, full-object PUT (the body is
  // re-streamed from the local buffer), COPY, DELETE — so a blanket
  // bounded retry is safe.

  private def isTransient(rc: Int): Boolean =
    rc == 429 || rc == 500 || rc == 502 || rc == 503 || rc == 504

  /** Thrown INSIDE a [[withRetry]] op to mark a response worth retrying;
    * any other exception (404, contract violations, EOF) propagates. */
  private final class TransientHttpException(msg: String)
    extends java.io.IOException(msg)

  private def transientOrFail(rc: Int, what: String): Nothing =
    if (isTransient(rc)) throw new TransientHttpException(s"$what: HTTP $rc")
    else throw new java.io.IOException(s"$what: HTTP $rc")

  /** Bounded exponential backoff (4 attempts, 24/48/96 ms between). The
    * op must open a FRESH connection per invocation. */
  private def withRetry[T](what: String)(op: () => T): T = {
    var attempt = 0
    while (true) {
      try return op()
      catch {
        // SocketException covers ConnectException AND mid-request resets/
        // broken pipes — a gateway shedding load by dropping the
        // connection is as routine as a 503, and every op here is
        // idempotent (the PUT body re-streams from its local buffer)
        case e @ (_: TransientHttpException | _: java.net.SocketException |
                  _: java.net.SocketTimeoutException) =>
          attempt += 1
          if (attempt >= 4)
            throw new java.io.IOException(
              s"$what: giving up after $attempt attempts", e)
          Thread.sleep(12L << attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def qualified(key: String): Path =
    new Path(s"$fsUri/$key")

  private def fileStatusOf(key: String, len: Long, mtime: Long): FileStatus =
    new FileStatus(len, false, 1, 32L * 1024 * 1024, mtime, qualified(key))

  private def dirStatusOf(key: String): FileStatus =
    new FileStatus(0, true, 1, 0, 0, qualified(key.stripSuffix("/")))

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return dirStatusOf("")
    withRetry(s"HEAD $key") { () =>
      val c = connect("HEAD", objectUrl(key))
      try {
        c.getResponseCode match {
          case 200 =>
            fileStatusOf(key, c.getContentLengthLong, c.getLastModified)
          case 404 =>
            // objects under the prefix make it a "directory"
            val (entries, _, _) = listPage(key + "/", delimited = false, maxKeys = Some(1), token = None)
            if (entries.nonEmpty) dirStatusOf(key)
            else throw new FileNotFoundException(s"s3a://$bucket/$key")
          case other =>
            transientOrFail(other, s"HEAD $key")
        }
      } finally c.disconnect()
    }
  }

  /** One ListObjectsV2 page: (raw (key, size, mtime) entries — keys may be
    * `dir/` markers — common prefixes, next token). */
  private def listPage(prefix: String, delimited: Boolean, maxKeys: Option[Int],
                       token: Option[String]): (Seq[(String, Long, Long)], Seq[String], Option[String]) = {
    val q = new StringBuilder(s"list-type=2&prefix=${URLEncoder.encode(prefix, "UTF-8")}")
    if (delimited) q.append("&delimiter=%2F")
    maxKeys.foreach(m => q.append(s"&max-keys=$m"))
    token.foreach(t => q.append(s"&continuation-token=${URLEncoder.encode(t, "UTF-8")}"))
    withRetry(s"LIST $prefix") { () =>
    val c = connect("GET", s"$endpoint/$bucket?$q")
    try {
      if (c.getResponseCode != 200)
        transientOrFail(c.getResponseCode, s"LIST $prefix")
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder().parse(c.getInputStream)
      def texts(parent: org.w3c.dom.Element, tag: String): Seq[String] = {
        val nl = parent.getElementsByTagName(tag)
        (0 until nl.getLength).map(nl.item(_).getTextContent)
      }
      val root = doc.getDocumentElement
      val contents = doc.getElementsByTagName("Contents")
      val files = (0 until contents.getLength).map { i =>
        val e = contents.item(i).asInstanceOf[org.w3c.dom.Element]
        val key = texts(e, "Key").head
        val size = texts(e, "Size").headOption.map(_.toLong).getOrElse(0L)
        val mtime = texts(e, "LastModified").headOption
          .map(java.time.Instant.parse(_).toEpochMilli).getOrElse(0L)
        (key, size, mtime)
      }
      val cps = doc.getElementsByTagName("CommonPrefixes")
      val prefixes = (0 until cps.getLength).flatMap { i =>
        texts(cps.item(i).asInstanceOf[org.w3c.dom.Element], "Prefix")
      }
      val next = texts(root, "NextContinuationToken").headOption.filter(_.nonEmpty)
        .filter(_ => texts(root, "IsTruncated").headOption.contains("true"))
      (files, prefixes, next)
    } finally c.disconnect()
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    val st = getFileStatus(f)
    if (st.isFile) return Array(st)
    val prefix = if (key.isEmpty) "" else key + "/"
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
    var token: Option[String] = None
    var first = true
    while (first || token.isDefined) {
      first = false
      val (files, prefixes, next) = listPage(prefix, delimited = true, maxKeys = None, token)
      // `.../` zero-byte directory markers are layout metadata, not files
      out ++= files.collect {
        case (k, size, mtime) if !k.endsWith("/") => fileStatusOf(k, size, mtime)
      }
      out ++= prefixes.map(dirStatusOf)
      token = next
    }
    out.toArray
  }

  /** Every raw key under `prefix` (markers included) — the delete/rename
    * walk. */
  private def listKeysRaw(prefix: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var token: Option[String] = None
    var first = true
    while (first || token.isDefined) {
      first = false
      val (files, _, next) = listPage(prefix, delimited = false, maxKeys = None, token)
      out ++= files.map(_._1)
      token = next
    }
    out.toSeq
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    val len = getFileStatus(f).getLen
    new FSDataInputStream(new S3LiteInputStream(key, len))
  }

  /** Seek = close + reopen with an HTTP Range from the new offset — the
    * same lazy ranged-GET strategy S3A's random-IO mode uses. */
  private final class S3LiteInputStream(key: String, len: Long) extends FSInputStream {
    private var pos = 0L
    private var in: InputStream = _
    private var conn: HttpURLConnection = _

    private def closeCurrent(): Unit = {
      if (in != null) { try in.close() catch { case _: java.io.IOException => () }; in = null }
      if (conn != null) { conn.disconnect(); conn = null }
    }
    private def ensure(): Unit = if (in == null && pos < len) {
      withRetry(s"GET $key @$pos") { () =>
        // a prior attempt may have died between connect and stream-open
        // (retryable throw from getResponseCode/skipNBytes) — drop its
        // half-open connection before dialing again, or sustained
        // shedding leaks a socket per retry
        closeCurrent()
        conn = connect("GET", objectUrl(key), range = Some(pos))
        val rc = conn.getResponseCode
        if (rc != 200 && rc != 206) {
          closeCurrent()
          transientOrFail(rc, s"GET $key @$pos")
        }
        in = conn.getInputStream
        // a server/proxy may legally IGNORE the Range header and answer 200
        // with the full body — serving byte 0 as byte `pos` would corrupt
        // reads silently (e.g. a parquet footer seek returning header
        // bytes), so skip to the requested offset before serving anything
        if (rc == 200 && pos > 0L) {
          try in.skipNBytes(pos)
          catch { case _: java.io.EOFException =>
            closeCurrent()
            throw new java.io.EOFException(
              s"GET $key: un-ranged 200 body shorter than requested offset $pos")
          }
        }
      }
    }
    override def seek(p: Long): Unit = {
      if (p < 0 || p > len) throw new java.io.EOFException(s"seek($p) outside [0,$len]")
      if (p != pos) { closeCurrent(); pos = p }
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    // a body ending before the HEAD-reported length is a truncated
    // response, not EOF — surfacing it beats handing parquet/text readers
    // a silently short object
    private def shortBody(): Nothing =
      throw new java.io.EOFException(
        s"GET $key: body ended at $pos of $len bytes (truncated response)")
    /** A body that dies mid-flight (connection reset) is as routine as a
      * shed request at fleet scale: reopen once from the current offset —
      * `pos` tracks delivered bytes exactly, so the resumed ranged GET
      * continues byte-exact (S3AInputStream's onReadFailure does the
      * same). EOF is NOT recovered: shortBody is a real truncation. */
    private def readRecovering(doRead: () => Int): Int =
      try doRead()
      catch {
        case e: java.io.IOException if !e.isInstanceOf[java.io.EOFException] =>
          closeCurrent()
          ensure()
          doRead()
      }
    override def read(): Int = {
      if (pos >= len) return -1
      ensure()
      val b = readRecovering(() => in.read())
      if (b < 0) shortBody()
      pos += 1
      b
    }
    override def read(b: Array[Byte], off: Int, l: Int): Int = {
      if (pos >= len) return -1
      ensure()
      val n = readRecovering(() => in.read(b, off, l))
      if (n < 0) shortBody()
      if (n > 0) pos += n
      n
    }
    override def close(): Unit = closeCurrent()
  }

  // ---- write path: PUT / DELETE / COPY-rename / dir markers ----
  //
  // This is the subset a committer-mediated Spark write needs
  // (FileOutputCommitter: mkdirs _temporary → task streams → rename into
  // place → delete _temporary → touch _SUCCESS), mirroring the
  // reference's write side (`put_vectors`,
  // `s3vectors-app/pythonvectordbceph.py:194-206`). Rename is COPY+DELETE
  // — non-atomic exactly like every plain-S3 filesystem; real deployments
  // should prefer S3A's magic committer.

  /** Buffer to a local temp file, PUT once on close — bounded memory for
    * arbitrarily large part files, and the object appears atomically
    * (S3 PUT semantics) rather than as a growing partial. */
  private final class S3LitePutStream(key: String) extends java.io.OutputStream {
    private val tmp = java.nio.file.Files.createTempFile("s3lite-put", ".buf")
    private val out = new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(tmp))
    private var closed = false
    override def write(b: Int): Unit = out.write(b)
    override def write(b: Array[Byte], off: Int, l: Int): Unit = out.write(b, off, l)
    override def flush(): Unit = out.flush()
    override def close(): Unit = {
      if (closed) return
      closed = true
      out.close()
      // the local temp buffer makes the PUT safely retryable: each
      // attempt re-streams the full body from disk (full-object S3 PUT
      // is idempotent)
      try withRetry(s"PUT $key") { () =>
        val size = java.nio.file.Files.size(tmp)
        val c = connect("PUT", objectUrl(key))
        c.setDoOutput(true)
        c.setFixedLengthStreamingMode(size)
        val body = c.getOutputStream
        try java.nio.file.Files.copy(tmp, body) finally body.close()
        val rc = c.getResponseCode
        c.disconnect()
        if (rc != 200 && rc != 201 && rc != 204)
          transientOrFail(rc, s"PUT $key")
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  private def putEmpty(key: String): Unit =
    withRetry(s"PUT $key") { () =>
      val c = connect("PUT", objectUrl(key))
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(0L)
      c.getOutputStream.close()
      val rc = c.getResponseCode
      c.disconnect()
      if (rc != 200 && rc != 201 && rc != 204)
        transientOrFail(rc, s"PUT $key")
    }

  /** Server-side copy — S3 PUT + `x-amz-copy-source`, the rename
    * primitive (RGW implements CopyObject; bytes never leave the
    * gateway). */
  private def copyObject(srcKey: String, dstKey: String): Unit =
    withRetry(s"COPY $srcKey -> $dstKey") { () =>
      val c = connect("PUT", objectUrl(dstKey))
      c.setRequestProperty("x-amz-copy-source", s"/$bucket/${encKey(srcKey)}")
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(0L)
      c.getOutputStream.close()
      val rc = c.getResponseCode
      c.disconnect()
      if (rc != 200)
        transientOrFail(rc, s"COPY $srcKey -> $dstKey")
    }

  /** DELETE; 404 tolerated (S3 delete is idempotent, and dir markers are
    * optional). */
  private def deleteObject(key: String): Unit =
    withRetry(s"DELETE $key") { () =>
      val c = connect("DELETE", objectUrl(key))
      val rc = c.getResponseCode
      c.disconnect()
      if (rc != 200 && rc != 204 && rc != 404)
        transientOrFail(rc, s"DELETE $key")
    }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    require(key.nonEmpty, "cannot create an object at the bucket root")
    if (!overwrite) {
      val exists = try { getFileStatus(f); true }
                   catch { case _: FileNotFoundException => false }
      if (exists)
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(s"s3a://$bucket/$key")
    }
    new FSDataOutputStream(new S3LitePutStream(key), statistics)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "append is not an S3 operation (objects are immutable)")

  /** HDFS rename contract over COPY+DELETE: into an existing directory
    * moves src UNDER it; onto an existing file fails; otherwise src
    * becomes dst. Directory rename walks every key under the prefix —
    * the FileOutputCommitter job-commit path. */
  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = keyOf(src)
    val srcSt = try getFileStatus(src)
                catch { case _: FileNotFoundException => return false }
    val dstSt = try Some(getFileStatus(dst))
                catch { case _: FileNotFoundException => None }
    val target = dstSt match {
      case Some(d) if d.isDirectory =>
        val base = keyOf(dst)
        if (base.isEmpty) src.getName else s"$base/${src.getName}"
      case Some(_) => return false
      case None => keyOf(dst)
    }
    if (srcSt.isFile) {
      copyObject(srcKey, target)
      deleteObject(srcKey)
    } else {
      listKeysRaw(srcKey + "/").foreach { k =>
        val rel = k.stripPrefix(srcKey + "/")
        // nested `.../` markers move as fresh empty markers (an empty
        // subdirectory must survive the rename — HDFS contract); files
        // move by server-side copy
        if (k.endsWith("/")) { if (rel.nonEmpty) putEmpty(target + "/" + rel) }
        else copyObject(k, target + "/" + rel)
        deleteObject(k)
      }
      deleteObject(srcKey + "/") // src's own marker, if any
      putEmpty(target + "/")     // keep the moved dir visible even if empty
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    val st = try getFileStatus(f)
             catch { case _: FileNotFoundException => return false }
    if (st.isFile) deleteObject(key)
    else {
      val children = listKeysRaw(if (key.isEmpty) "" else key + "/")
      // the dir's own marker is layout metadata, not a child; anything
      // else — files OR subdirectory markers — makes it non-empty
      if (!recursive && children.exists(_ != key + "/"))
        throw new java.io.IOException(
          s"directory s3a://$bucket/$key is not empty (non-recursive delete)")
      children.foreach(deleteObject)
      if (key.nonEmpty) deleteObject(key + "/")
    }
    true
  }

  /** S3 has no directories; a `key/` zero-byte marker makes an EMPTY one
    * visible to getFileStatus (non-empty prefixes are already directories
    * by the listing probe). Ancestors materialize the same way lazily. */
  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val key = keyOf(f)
    if (key.isEmpty) return true
    // HDFS contract: mkdirs over an existing FILE — at the path or any
    // ancestor — must throw, not succeed. Silently writing the `key/`
    // marker would leave a same-named file and directory; readers then
    // resolve the name arbitrarily (HEAD wins → the file), so children
    // written under the "directory" become invisible to anyone who
    // trusted the mkdirs success. One HEAD per component: these paths
    // are shallow (committer staging dirs), never data-sized.
    val components = key.split("/")
    var prefix = ""
    components.foreach { c =>
      prefix = if (prefix.isEmpty) c else s"$prefix/$c"
      withRetry(s"HEAD $prefix") { () =>
        val h = connect("HEAD", objectUrl(prefix))
        try h.getResponseCode match {
          case 200 =>
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              s"mkdirs s3a://$bucket/$key: s3a://$bucket/$prefix is a file")
          case 404 => ()
          case other => transientOrFail(other, s"HEAD $prefix")
        } finally h.disconnect()
      }
    }
    putEmpty(key + "/")
    true
  }
}
