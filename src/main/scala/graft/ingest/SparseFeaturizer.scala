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

/** A featurizer whose natural unit is a BATCH — [[BulkEmbedder]]'s
  * twin: a remote sparse-encoder service amortizes its round-trip over
  * `batchSize` inputs. Drive it through
  * [[SparseFeaturizer.featurizeDocumentsBulk]] so each partition
  * issues one request per chunk instead of one per row. */
trait BulkSparseFeaturizer extends SparseFeaturizer {
  def batchSize: Int
  def featurizeTexts(texts: Seq[String]): Seq[Map[Long, Double]]
  override def featurize(text: String): Map[Long, Double] =
    featurizeTexts(Seq(text)).head
}

/** External sparse-encoder hook — [[RemoteEmbedder]]'s twin for the
  * SPLADE/uniCOIL boundary (learned sparse models can't run in the JVM
  * image any more than the dense ones): ships text batches to an HTTP
  * service, one request per `batchSize` chunk per partition.
  *
  * Wire protocol (the indices/values split every sparse model server
  * and pymilvus use for sparse vectors):
  *   POST <endpoint>  {"inputs":[{"text":"..."}, ...]}
  *   → 200  {"vectors":[{"indices":[i64...],"values":[f64...]}, ...]}
  * (same order/length; indices and values arrays pairwise equal-sized).
  *
  * The hashing-TF stand-in stays the default — select this one per
  * session with `spark.graft.featurizer.endpoint`
  * (see [[SparseFeaturizer.configured]]). */
case class RemoteSparseFeaturizer(endpoint: String, batchSize: Int = 64,
                                  connectTimeoutMs: Int = 5000,
                                  readTimeoutMs: Int = 60000)
    extends BulkSparseFeaturizer {
  require(batchSize > 0)

  override def featurizeTexts(texts: Seq[String]): Seq[Map[Long, Double]] = {
    import java.nio.charset.StandardCharsets
    val mapper = RemoteEmbedder.mapper
    val root = mapper.createObjectNode()
    val arr = root.putArray("inputs")
    texts.foreach(t => arr.addObject().put("text", t))
    val body = mapper.writeValueAsBytes(root)
    val conn = new java.net.URI(endpoint).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
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
          .map(s => new String(s.readAllBytes(), StandardCharsets.UTF_8))
          .getOrElse("")
        throw new java.io.IOException(
          s"sparse featurizer service $endpoint returned $status: $err")
      }
      val resp = mapper.readTree(conn.getInputStream)
      val vectors = resp.get("vectors")
      require(vectors != null && vectors.size() == texts.size,
        s"featurizer service returned ${
          if (vectors == null) "no" else vectors.size()} vectors for " +
          s"${texts.size} inputs")
      (0 until vectors.size()).map { i =>
        val v = vectors.get(i)
        val idx = v.get("indices"); val vals = v.get("values")
        require(idx != null && vals != null && idx.size() == vals.size(),
          s"featurizer service vector $i: indices/values missing or " +
            "length-mismatched")
        (0 until idx.size())
          .map(j => idx.get(j).asLong() -> vals.get(j).asDouble()).toMap
      }
    } finally conn.disconnect()
  }
}

/** Deterministic hashing term-frequency stand-in for a learned sparse
  * encoder: whitespace tokens map to dims by the SAME hash Spark's SQL
  * `xxhash64(word)` computes (seed 42) and weights are raw term
  * frequencies. The dim parity is load-bearing, not cosmetic: every
  * batch surface in this engine builds sparse postings as
  * `xxhash64(col("word"))`, so documents streamed through this
  * featurizer and documents batch-upserted from the same text rank
  * identically under one query vocabulary — SparseClientSpec's
  * landing-file ingest test pins the JVM-side hash against the SQL
  * function. */
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
    * — [[Embedder.embedDocuments]]'s shape for the sparse family. A
    * [[BulkSparseFeaturizer]] routes through the batched per-partition
    * path (one service round-trip per chunk, never one per row). */
  def featurizeDocuments(df: DataFrame, textCol: String,
                         f: SparseFeaturizer = hashingTf): DataFrame =
    f match {
      case b: BulkSparseFeaturizer => featurizeDocumentsBulk(df, textCol, b)
      case _ => df.withColumn("vec", featurizeCol(f)(col(textCol)))
    }

  /** The batched boundary — [[Embedder.embedDocumentsBulk]]'s twin:
    * each partition groups its rows into `batchSize` chunks and
    * featurizes each chunk in ONE [[BulkSparseFeaturizer.featurizeTexts]]
    * call. Null texts map to null without occupying batch slots; empty
    * feature sets map to null (the ingest rejection arm). */
  def featurizeDocumentsBulk(df: DataFrame, textCol: String,
                             f: BulkSparseFeaturizer): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, MapType}
    val out = df.schema.add("vec", MapType(LongType, DoubleType))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(f.batchSize).flatMap { rows =>
        val texts = rows.map(r => if (r.isNullAt(idx)) null else r.getString(idx))
        val vecs = {
          val nonNull = texts.filter(_ != null)
          if (nonNull.isEmpty) Iterator.empty
          else f.featurizeTexts(nonNull).iterator
        }
        rows.zip(texts).map { case (r, t) =>
          val v = if (t == null) null else {
            val m = vecs.next()
            if (m.isEmpty) null else m
          }
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(org.apache.spark.sql.Encoders.row(out))
  }

  /** The session-configured featurizer ([[Embedder.configured]]'s twin
    * — the config gate for the external SPLADE hook): set
    * `spark.graft.featurizer.endpoint` to route featurization through a
    * [[RemoteSparseFeaturizer]] at that URL; unset, the deterministic
    * hashing-TF stand-in runs. Optional
    * `spark.graft.featurizer.batchSize`. */
  def configured(spark: org.apache.spark.sql.SparkSession): SparseFeaturizer =
    spark.conf.getOption("spark.graft.featurizer.endpoint") match {
      case Some(url) => RemoteSparseFeaturizer(url,
        spark.conf.getOption("spark.graft.featurizer.batchSize")
          .map(_.toInt).getOrElse(64))
      case None => hashingTf
    }
}
