package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** 64-bit SimHash over token sets (C8 near-dup family).
  *
  * Classic Charikar scheme: each token hashes to 64 bits; bit i of the
  * fingerprint is the sign of Σ±1 over tokens' bit i. Near-duplicate
  * documents differ in few bits, so dedup at scale is a groupBy on rotated
  * fingerprint prefixes (each ≤ hamming-k match shares at least one of the
  * k+1 blocks) — O(N) shuffle like MinHash banding, but one 8-byte
  * fingerprint per doc instead of an r×b signature.
  *
  * md5-derived bits keep it deterministic across JVMs (no murmur seed
  * drift between Spark versions).
  */
object SimHash {

  def tokenHash64(token: String): Long = {
    val d = Md5.digest(token.getBytes(StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d).getLong
  }

  def simhash64(tokens: Iterable[String]): Long = {
    val weights = new Array[Int](64)
    for (t <- tokens) {
      val h = tokenHash64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) weights(i) += 1 else weights(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (weights(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Column form: array<string> tokens → bigint fingerprint. Null
    * ELEMENTS are skipped (a null token contributes no bits to a
    * bag-of-tokens sketch — unlike shingling, position doesn't matter),
    * instead of NPE-ing the task. */
  val simhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((tokens: Seq[String]) =>
      if (tokens == null) null
      else Long.box(simhash64(tokens.filter(_ != null))))

  def simhashCol(tokens: Column): Column = simhashUdf(tokens)

  /** Block keys for hamming-≤k bucketing: split the fingerprint into k+1
    * 16-bit blocks (k=3) — any pair within hamming 3 shares ≥1 intact
    * block, so candidate generation is a groupBy on (blockId, blockValue). */
  def blockKeys(fp: Long): Seq[(Int, Int)] =
    (0 until 4).map(i => (i, ((fp >>> (i * 16)) & 0xffffL).toInt))
}
