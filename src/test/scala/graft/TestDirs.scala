package graft

import java.nio.file.{Files, Path}

/** Shared temp-dir helpers for specs — one definition so fixes (like the
  * stream-close on walk/list) land everywhere at once. */
object TestDirs {

  def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRec(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  def dirBytes(dir: String): Long = {
    val s = Files.walk(java.nio.file.Paths.get(dir))
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
    finally s.close()
  }

  /** bucket id → live relative data dir of a BucketedKeyedCollection,
    * parsed from its CURRENT manifest — the ground truth for "which
    * buckets did this commit actually rewrite". */
  def liveDirs(root: String): Map[Int, String] = {
    import scala.jdk.CollectionConverters._
    val dp = java.nio.file.Paths.get(root)
    val cur = new String(Files.readAllBytes(dp.resolve("CURRENT"))).trim.toLong
    Files.readAllLines(dp.resolve(f"manifest-$cur%08d")).asScala.toSeq.tail
      .filter(_.nonEmpty)
      .map { l => val Array(b, rel) = l.split(" ", 2); b.toInt -> rel }.toMap
  }

  /** One S3 bucket-notification JSON record — the reference handler's
    * input shape (`s3vectors-app/pythonvectordbceph.py:121-147`). */
  def notif(eventName: String, key: String, size: Long = 1,
            bucket: String = "bkt-0001", category: String = "docs"): String =
    s"""{"Records":[{"eventVersion":"2.2","eventSource":"ceph:s3","eventName":"$eventName",""" +
      s""""s3":{"bucket":{"name":"$bucket"},"object":{"key":"$key","size":$size,""" +
      s""""tags":{"category":"$category"}}}}]}"""
}
