package graft.ingest

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, udf}

/** Pluggable embedding boundary (SURVEY A4/A5, §7.0/§7.4.5).
  *
  * The reference embeds text with SentenceTransformer `all-MiniLM-L6-v2`
  * (dim 384, `s3vectors-app/pythonvectordbceph.py:161-163`) and images with
  * timm resnet34 avg-pool features, L2-normalized (dim 512, `:17-47`).
  * Real model inference is an external boundary in this engine (no
  * torch/ONNX in the JVM image — §7.0); what the engine owns is the
  * *capability shape*: dimension, normalization, float32 type, and the
  * partition-amortized execution (the reference reloads its model per event
  * — `pythonvectordbceph.py:162,168`; we instantiate once per partition).
  *
  * `HashingEmbedder` is the deterministic offline stand-in: token/byte
  * n-grams hashed into `dim` buckets, L2-normalized — same output contract
  * as the real models, reproducible everywhere.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Embed one document (text) into a unit-norm float32 vector. */
  def embedText(text: String): Array[Float]
  /** Embed one binary object (image stand-in). */
  def embedBytes(bytes: Array[Byte]): Array[Float]
}

/** An embedder whose natural unit is a BATCH — a remote inference service
  * amortizes its round-trip over `batchSize` inputs. Drive it through
  * [[Embedder.embedDocumentsBulk]] so each partition issues one request
  * per batch instead of one per row. */
trait BulkEmbedder extends Embedder {
  def batchSize: Int
  def embedTexts(texts: Seq[String]): Seq[Array[Float]]

  /** Mixed-modality batch (the A19 dispatch, batched): Left = text,
    * Right = bytes. Default fans out per item; a remote implementation
    * overrides this with one round-trip for the whole batch. */
  def embedItems(items: Seq[Either[String, Array[Byte]]]): Seq[Array[Float]] =
    items.map {
      case Left(text) => embedText(text)
      case Right(bytes) => embedBytes(bytes)
    }
}

/** Deterministic feature-hashing embedder. Text path: whitespace tokens +
  * their 3-gram shingles hashed (md5-derived) into buckets with ±1 signs.
  * Binary path: byte 4-grams. Both L2-normalized like the reference's image
  * vectors (`s3vectors-app/pythonvectordbceph.py:47`). */
case class HashingEmbedder(dim: Int) extends Embedder {
  require(dim > 0)

  private def bucketAndSign(s: String): (Int, Float) = {
    val d = graft.functions.Md5.digest(s.getBytes(StandardCharsets.UTF_8))
    val h = java.nio.ByteBuffer.wrap(d).getInt
    val b = math.floorMod(h, dim)
    (b, if (((h >>> 31) & 1) == 0) 1.0f else -1.0f)
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v
    else { i = 0; while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 }; v }
  }

  override def embedText(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val tokens = text.split("\\s+").filter(_.nonEmpty)
    for (t <- tokens) { val (b, s) = bucketAndSign("t:" + t); v(b) += s }
    for (w <- tokens.sliding(3) if w.length == 3) {
      val (b, s) = bucketAndSign("g:" + w.mkString(" ")); v(b) += s
    }
    normalize(v)
  }

  override def embedBytes(bytes: Array[Byte]): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i + 4 <= bytes.length) {
      val quad = java.util.Arrays.copyOfRange(bytes, i, i + 4)
      val (b, s) = bucketAndSign("b:" + java.util.Base64.getEncoder.encodeToString(quad))
      v(b) += s
      i += 4
    }
    normalize(v)
  }
}

object Embedder {
  /** Reference dimensions (text/image deployments). */
  val TextDim = 384  // all-MiniLM-L6-v2, s3vectors-app/sample-deployment-text.yaml:64
  val ImageDim = 512 // resnet34 avg-pool, s3vectors-app/README.md:216

  val text: Embedder = HashingEmbedder(TextDim)
  val image: Embedder = HashingEmbedder(ImageDim)

  /** Column-level text embedding. The UDF closes over the (serializable,
    * stateless) embedder once; Spark ships it per task, not per row — the
    * partition-amortization the reference lacks. */
  def embedTextCol(e: Embedder)(c: Column): Column = {
    val f = udf((s: String) => if (s == null) null else e.embedText(s))
    f(c)
  }

  def embedBytesCol(e: Embedder)(c: Column): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null else e.embedBytes(b))
    f(c)
  }

  /** Full ingest transform: text df (key, text) → (key, vec float32[dim]).
    * A [[BulkEmbedder]] routes through the batched per-partition path. */
  def embedDocuments(df: DataFrame, textCol: String, e: Embedder = text): DataFrame =
    e match {
      case b: BulkEmbedder => embedDocumentsBulk(df, textCol, b)
      case _ => df.withColumn("vec", embedTextCol(e)(col(textCol)))
    }

  /** The batched boundary: each partition groups its rows into
    * `batchSize`-sized chunks and embeds each chunk in ONE call — for a
    * remote service that's one HTTP round-trip per chunk, the shape the
    * reference's per-event model call should have had
    * (`s3vectors-app/pythonvectordbceph.py:161-163` reloads and runs the
    * model once per object). Null texts embed to null without a call. */
  def embedDocumentsBulk(df: DataFrame, textCol: String, e: BulkEmbedder): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val out = df.schema.add("vec", ArrayType(FloatType))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(e.batchSize).flatMap { rows =>
        val texts = rows.map(r => if (r.isNullAt(idx)) null else r.getString(idx))
        val vecs = {
          val nonNull = texts.filter(_ != null)
          if (nonNull.isEmpty) Iterator.empty else e.embedTexts(nonNull).iterator
        }
        rows.zip(texts).map { case (r, t) =>
          Row.fromSeq(r.toSeq :+ (if (t == null) null else vecs.next()))
        }
      }
    }(org.apache.spark.sql.Encoders.row(out))
  }

  /** The session-configured embedder (the config gate for the external
    * hook): set `spark.graft.embedder.endpoint` to route embedding through
    * a [[RemoteEmbedder]] at that URL; unset, the deterministic hashing
    * stand-in runs. Optional `spark.graft.embedder.batchSize`. */
  def configured(spark: org.apache.spark.sql.SparkSession, dim: Int = TextDim): Embedder =
    spark.conf.getOption("spark.graft.embedder.endpoint") match {
      case Some(url) => RemoteEmbedder(url, dim,
        spark.conf.getOption("spark.graft.embedder.batchSize").map(_.toInt).getOrElse(64))
      case None => HashingEmbedder(dim)
    }

  /** A19 per-object dispatch — the TEXT/IMAGE `match` at
    * `s3vectors-app/pythonvectordbceph.py:158-173` as a per-row CASE: rows
    * with `text` use the text kernel, binary rows the bytes kernel, both
    * from ONE embedder so every vector carries the collection's dimension
    * (the reference runs one deployment per modality for the same reason).
    * Rows with neither column set (the reference's "Unknown object format"
    * 400 arm) embed to NULL — callers drop them, matching the reference's
    * per-event rejection without killing the stream.
    *
    * A [[BulkEmbedder]] routes through the batched per-partition path —
    * this is the STREAMING-ingest embed boundary, so without the dispatch
    * a remote embedder would fall back to one RPC per row (the reference's
    * own anti-pattern) in exactly the path built to avoid it. */
  def embedObjects(df: DataFrame, e: Embedder = text): DataFrame = e match {
    case b: BulkEmbedder => embedObjectsBulk(df, b)
    case _ =>
      df.withColumn("vec",
        org.apache.spark.sql.functions.when(
          col("text").isNotNull, embedTextCol(e)(col("text")))
          .otherwise(embedBytesCol(e)(col("bytes"))))
  }

  /** Batched A19 dispatch: each partition groups rows into `batchSize`
    * chunks and embeds every chunk's text AND binary items in ONE
    * [[BulkEmbedder.embedItems]] call. Rows with neither modality embed
    * to null without occupying batch slots. */
  def embedObjectsBulk(df: DataFrame, e: BulkEmbedder): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val out = df.schema.add("vec", ArrayType(FloatType))
    val textIdx = df.schema.fieldIndex("text")
    val bytesIdx = df.schema.fieldIndex("bytes")
    df.mapPartitions { it =>
      it.grouped(e.batchSize).flatMap { rows =>
        val items = rows.map { r =>
          if (!r.isNullAt(textIdx)) Some(Left(r.getString(textIdx)))
          else if (!r.isNullAt(bytesIdx)) Some(Right(r.getAs[Array[Byte]](bytesIdx)))
          else None
        }
        val vecs = {
          val present = items.flatten
          if (present.isEmpty) Iterator.empty else e.embedItems(present).iterator
        }
        rows.zip(items).map { case (r, item) =>
          Row.fromSeq(r.toSeq :+ item.map(_ => vecs.next()).orNull)
        }
      }
    }(org.apache.spark.sql.Encoders.row(out))
  }
}
