package graft.functions

import java.security.MessageDigest

/** Thread-local MD5 reuse for hot hashing loops (HashingEmbedder token
  * buckets, SimHash token bits). `MessageDigest.getInstance` per call costs
  * a provider lookup plus allocations — billions of them at 100 TB ingest.
  * `digest()` resets the instance after computing, so per-thread reuse is
  * safe and the output is byte-identical to a fresh instance's. */
object Md5 {
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def digest(bytes: Array[Byte]): Array[Byte] = local.get().digest(bytes)
}
