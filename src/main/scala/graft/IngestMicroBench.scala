package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.ingest.HashingEmbedder

/** Single-threaded micro-benchmark of the embedding hot loop — the
  * measurement behind BASELINE.md's hash-reuse row. Times
  * `HashingEmbedder.embedText` (thread-local MD5, see
  * `graft.functions.Md5`) against an inline fresh-`MessageDigest`-per-token
  * baseline that reproduces the pre-reuse code path, on identical synthetic
  * docs. Pure JVM, no Spark — the UDF wraps exactly this loop. */
object IngestMicroBench {

  // the old code path: a fresh getInstance per token (kept here only as
  // the micro-bench baseline; identical math to HashingEmbedder.embedText,
  // normalization included, so the two timed loops do the same work)
  private def embedTextFresh(dim: Int, text: String): Array[Float] = {
    def bucketAndSign(s: String): (Int, Float) = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      val h = java.nio.ByteBuffer.wrap(d).getInt
      (math.floorMod(h, dim), if (((h >>> 31) & 1) == 0) 1.0f else -1.0f)
    }
    val v = new Array[Float](dim)
    val tokens = text.split("\\s+").filter(_.nonEmpty)
    for (t <- tokens) { val (b, s) = bucketAndSign("t:" + t); v(b) += s }
    for (w <- tokens.sliding(3) if w.length == 3) {
      val (b, s) = bucketAndSign("g:" + w.mkString(" ")); v(b) += s
    }
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n != 0.0) { i = 0; while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 } }
    v
  }

  def main(args: Array[String]): Unit = {
    val nDocs = 2000
    val rnd = new scala.util.Random(42)
    val docs = (0 until nDocs).map { _ =>
      (0 until 200).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
    }
    val emb = HashingEmbedder(384)

    def time(label: String)(f: => Unit): Double = {
      f // warmup
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${nDocs / sec}%10.0f docs/s  (${sec}%.3f s / $nDocs docs)")
      nDocs / sec
    }

    // sanity FIRST: the two paths must produce identical vectors — a
    // thread-local digest that failed to reset would speed up AND be wrong
    docs.take(50).foreach { d =>
      require(java.util.Arrays.equals(embedTextFresh(384, d), emb.embedText(d)),
        "fresh-digest and thread-local paths diverged")
    }
    val fresh = time("fresh-digest-per-token") { docs.foreach(embedTextFresh(384, _)) }
    val reused = time("thread-local-digest") { docs.foreach(emb.embedText) }
    println(f"speedup ${reused / fresh}%.2fx")
  }
}
