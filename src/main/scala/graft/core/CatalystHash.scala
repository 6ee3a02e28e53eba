package graft.core

import org.apache.spark.sql.types.DataType

/** Driver-side evaluation of `pmod(xxhash64(value), n)` via Catalyst's
  * own XxHash64 (seed 42, like the SQL function) — THE one copy of the
  * "driver and executors must hash identically" trick. Every at-rest
  * layout that routes by hash (partition-key collections route string
  * values, TextIndex routes terms, SparseIndex routes long dims) pairs an
  * executor-side `pmod(xxhash64(col), n)` with this function; sharing the
  * construction keeps the must-match-Catalyst invariant in one place
  * instead of one hand-rolled copy per layout. */
object CatalystHash {
  def pmodXxhash64(value: Any, dt: DataType, n: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(value, dt)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
    (((h % n) + n) % n).toInt
  }

  /** Raw SQL `xxhash64(string)` (seed 42), allocation-light for
    * per-token loops — [[graft.ingest.SparseFeaturizer]] hashes every
    * token of every streamed document to its postings dim, and the dims
    * must equal what `xxhash64(col("word"))` produced in the batch
    * postings builds. */
  def xxhash64String(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), 42L)
}
