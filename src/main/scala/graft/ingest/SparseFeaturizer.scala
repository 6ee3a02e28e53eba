package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, udf}

/** Pluggable SPARSE featurization boundary (r14, VERDICT r13's #4) —
  * the SPLADE-shaped twin of [[Embedder]]: text in, (dim → weight)
  * pairs out, the representation a SPARSE_FLOAT_VECTOR collection
  * stores (pymilvus `{dim: weight}` dicts). A learned sparse encoder
  * (SPLADE, uniCOIL) is an external model boundary exactly like the
  * dense embedders (no torch/ONNX in the JVM image — SURVEY §7.0);
  * what the engine owns is the capability shape: 64-bit dims, double
  * weights, per-partition-amortized execution, and dim compatibility
  * with the batch-built postings.
  *
  * Featurizers are TEXT-shaped: a binary object has no sparse lexical
  * form (the learned encoders are all text models), so the ingest
  * loop rejects bytes-only rows for sparse collections the way the
  * reference's 400 arm rejects unknown formats. */
trait SparseFeaturizer extends Serializable {
  /** Featurize one document into its sparse (dim → weight) vector.
    * Empty map = no features (the caller drops the row like a null
    * dense embedding). */
  def featurize(text: String): Map[Long, Double]
}

/** Deterministic hashing term-frequency stand-in for a learned sparse
  * encoder: whitespace tokens map to dims by the SAME hash Spark's SQL
  * `xxhash64(word)` computes (seed 42) and weights are raw term
  * frequencies. The dim parity is load-bearing, not cosmetic: every
  * batch surface in this engine builds sparse postings as
  * `xxhash64(col("word"))`, so documents streamed through this
  * featurizer and documents batch-upserted from the same text rank
  * identically under one query vocabulary — [[SparseIngestSpec]] pins
  * the JVM-side hash against the SQL function. */
case class HashingTfFeaturizer() extends SparseFeaturizer {
  override def featurize(text: String): Map[Long, Double] = {
    val m = scala.collection.mutable.HashMap.empty[Long, Double]
    for (t <- text.split("\\s+") if t.nonEmpty)
      m.updateWith(SparseFeaturizer.xxhash64(t)) {
        case Some(w) => Some(w + 1.0)
        case None => Some(1.0)
      }
    m.toMap
  }
}

object SparseFeaturizer {
  /** The default stand-in (the config-free path, like `Embedder.text`). */
  val hashingTf: SparseFeaturizer = HashingTfFeaturizer()

  /** Spark SQL `xxhash64(string)` replicated JVM-side, so Scala code
    * and SQL postings builds agree on every dim — delegates to
    * [[graft.core.CatalystHash]], THE one copy of the
    * must-match-Catalyst hashing trick. */
  def xxhash64(s: String): Long = graft.core.CatalystHash.xxhash64String(s)

  /** Column-level featurization: STRING → MAP<BIGINT,DOUBLE> (null in,
    * null out; empty feature set → null so the ingest loop's
    * vec-IS-NOT-NULL rejection arm drops it). The UDF closes over the
    * (serializable, stateless) featurizer once per task, not per row. */
  def featurizeCol(f: SparseFeaturizer)(c: Column): Column = {
    val u = udf { (s: String) =>
      if (s == null) null
      else {
        val m = f.featurize(s)
        if (m.isEmpty) null else m
      }
    }
    u(c)
  }

  /** Full ingest transform: (key, text) → (key, vec MAP<BIGINT,DOUBLE>)
    * — [[Embedder.embedDocuments]]'s shape for the sparse family. */
  def featurizeDocuments(df: DataFrame, textCol: String,
                         f: SparseFeaturizer = hashingTf): DataFrame =
    df.withColumn("vec", featurizeCol(f)(col(textCol)))
}
