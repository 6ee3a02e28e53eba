package graft.sources

import java.io.{FileNotFoundException, InputStream}
import java.net.{HttpURLConnection, URI, URL, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A minimal READ-ONLY Hadoop FileSystem speaking the S3 REST protocol —
  * path-style GET / HEAD / ListObjectsV2 (with continuation-token
  * pagination) and ranged reads — registered in place of S3A via
  * `fs.s3a.impl = graft.sources.S3LiteFileSystem`.
  *
  * Why it exists: this build environment has no `hadoop-aws` jar and no
  * egress to fetch one, so the stock `S3AFileSystem` cannot load — yet the
  * engine's RGW story (`RgwConfig` + `ObjectSources` over `s3a://`, the
  * reference's `s3.get_object` path, `s3vectors-app/pythonvectordbceph
  * .py:155`) deserves an END-TO-END drive, not just conf-layer assertions.
  * This class honors the exact conf contract `RgwConfig` writes —
  * `fs.s3a.endpoint`, `fs.s3a.access.key`, `fs.s3a.path.style.access`,
  * per-bucket `fs.s3a.bucket.<name>.*` overrides — so
  * IngestCapabilitySpec can read fixtures through a real Spark scan
  * against an in-process S3 server using the reference deployment's
  * env-var contract.
  *
  * Production posture, stated loudly: deployments WITH `hadoop-aws` on the
  * classpath should keep the stock `S3AFileSystem` (SigV4 signing,
  * multipart, retries, committers — none of which this class implements;
  * the Authorization header sent here carries the access key in SigV4
  * Credential SHAPE but no real signature). The protocol subset here is
  * the read path of RGW's S3 API, which is also why the same spec doubles
  * as the gateway-contract test. */
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

  private def qualified(key: String): Path =
    new Path(s"$fsUri/$key")

  private def fileStatusOf(key: String, len: Long, mtime: Long): FileStatus =
    new FileStatus(len, false, 1, 32L * 1024 * 1024, mtime, qualified(key))

  private def dirStatusOf(key: String): FileStatus =
    new FileStatus(0, true, 1, 0, 0, qualified(key.stripSuffix("/")))

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return dirStatusOf("")
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
          throw new java.io.IOException(s"HEAD $key: HTTP $other")
      }
    } finally c.disconnect()
  }

  /** One ListObjectsV2 page: (file entries, common prefixes, next token). */
  private def listPage(prefix: String, delimited: Boolean, maxKeys: Option[Int],
                       token: Option[String]): (Seq[FileStatus], Seq[String], Option[String]) = {
    val q = new StringBuilder(s"list-type=2&prefix=${URLEncoder.encode(prefix, "UTF-8")}")
    if (delimited) q.append("&delimiter=%2F")
    maxKeys.foreach(m => q.append(s"&max-keys=$m"))
    token.foreach(t => q.append(s"&continuation-token=${URLEncoder.encode(t, "UTF-8")}"))
    val c = connect("GET", s"$endpoint/$bucket?$q")
    try {
      if (c.getResponseCode != 200)
        throw new java.io.IOException(s"LIST $prefix: HTTP ${c.getResponseCode}")
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
        fileStatusOf(key, size, mtime)
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
      out ++= files.filterNot(_.getPath.toUri.getPath.stripPrefix("/") == key)
      out ++= prefixes.map(dirStatusOf)
      token = next
    }
    out.toArray
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
      conn = connect("GET", objectUrl(key), range = Some(pos))
      val rc = conn.getResponseCode
      if (rc != 200 && rc != 206)
        throw new java.io.IOException(s"GET $key @$pos: HTTP $rc")
      in = conn.getInputStream
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
    override def read(): Int = {
      if (pos >= len) return -1
      ensure()
      val b = in.read()
      if (b < 0) shortBody()
      pos += 1
      b
    }
    override def read(b: Array[Byte], off: Int, l: Int): Int = {
      if (pos >= len) return -1
      ensure()
      val n = in.read(b, off, l)
      if (n < 0) shortBody()
      if (n > 0) pos += n
      n
    }
    override def close(): Unit = closeCurrent()
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"S3LiteFileSystem is the read-path wiring proof; $op belongs to the " +
        "real S3A filesystem (deploy with hadoop-aws on the classpath)")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = readOnly("create")
  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream = readOnly("append")
  override def rename(src: Path, dst: Path): Boolean = readOnly("rename")
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly("delete")
  override def mkdirs(f: Path, permission: FsPermission): Boolean = readOnly("mkdirs")
}
