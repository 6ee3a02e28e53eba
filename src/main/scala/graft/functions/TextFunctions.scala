package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a native Catalyst expression (C14/C8).
  *
  * Why an Expression and not `transform(sequence(...), i -> concat_ws(...))`:
  * the higher-order-function route interprets the lambda per element with
  * full variable binding — measured ~16× slower than compiled code on the
  * shingle workload (8s vs 0.5s at sf0.1), which multiplies into every
  * n-gram dedup/text query. A tight eval loop (and codegen twin) keeps
  * shingling at memcpy speed; at 100 TB the shingle projection runs once
  * per token, so constant factors here dominate the whole dedup pipeline.
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def prettyName: String = "ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngrams requires array<string>, got ${dt.catalogString}")
    }

  /** Shared by eval and codegen (via static call): the whole shingle loop. */
  override def nullSafeEval(a: Any): Any = NGrams.compute(a.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGrams.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c, n)
}

object NGrams {
  private val Space = UTF8String.fromString(" ")

  /** All consecutive n-grams of `words`, space-joined, order preserved.
    * Fewer than n words → empty array. */
  def compute(words: ArrayData, n: Int): GenericArrayData = {
    val len = words.numElements()
    val out = new Array[AnyRef](math.max(0, len - n + 1))
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = words.getUTF8String(i + j)
        // concatWs SKIPS nulls, which would silently emit shortened
        // shingles ("a b" from (a, null, b)) that then join against
        // honest ones downstream — corrupt matches with no signal.
        // Null elements have no shingle semantics; fail loudly.
        if (parts(j) == null)
          throw new IllegalArgumentException(
            s"ngrams: null element at position ${i + j} — filter nulls " +
              "out of the token array before shingling")
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Winnowed rolling-hash document fingerprint (LLM-pipeline mandate:
  * "document fingerprinting (rolling hash)").
  *
  * Classic winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public
  * algorithm): Rabin-style polynomial rolling hash over every `w`-byte
  * window of the UTF-8 text, then from each run of `k` consecutive hashes
  * keep the rightmost minimum. Guarantees: any shared substring of length
  * ≥ w + k − 1 contributes at least one common fingerprint, and a local
  * edit only perturbs fingerprints near the edit — exactly the property
  * needed for passage-level near-dup detection at corpus scale (fingerprints
  * feed the same inverted-index/banding joins as shingles, but are
  * byte-level and length-normalized). Output: sorted distinct selected
  * hashes. */
case class WinnowedFingerprint(child: Expression, window: Int, k: Int)
    extends UnaryExpression {
  require(window >= 2 && k >= 1, s"need window >= 2 and k >= 1, got w=$window k=$k")

  override def prettyName: String = "winnowed_fingerprint"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnowed_fingerprint requires string, got ${dt.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    WinnowedFingerprint.compute(a.asInstanceOf[UTF8String], window, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowedFingerprint.compute($c, $window, $k);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c, window, k)
}

object WinnowedFingerprint {
  private val Base = 257L
  private val Mod = 1000000007L

  def compute(text: UTF8String, w: Int, k: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    // rolling polynomial hash of every w-byte window
    val hashes = new Array[Long](n - w + 1)
    var pow = 1L // Base^(w-1) mod Mod
    var i = 1
    while (i < w) { pow = pow * Base % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i <= n - w) {
      h = ((h - (bytes(i - 1) & 0xff) * pow % Mod + Mod * Base) * Base +
        (bytes(i + w - 1) & 0xff)) % Mod
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each k-window of hashes
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    var start = 0
    while (start <= hashes.length - k) {
      var minIdx = start
      var j = start + 1
      while (j < start + k) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      selected += hashes(minIdx)
      start += 1
    }
    if (hashes.length < k) selected += hashes.min
    new GenericArrayData(selected.toArray)
  }
}

object TextFunctions {
  import GraftShim.{column, expression}

  def ngrams(words: Column, n: Int): Column = column(NGrams(expression(words), n))

  def winnowed_fingerprint(text: Column, window: Int, k: Int): Column =
    column(WinnowedFingerprint(expression(text), window, k))

  /** Register text kernels as SQL functions (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = GraftShim.functionRegistry(spark)
    def literalInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   fn: String, arg: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal int $arg, got $other")
    }
    reg.createOrReplaceTempFunction("ngrams", es => {
      if (es.length != 2)
        throw new IllegalArgumentException(s"ngrams expects 2 arguments, got ${es.length}")
      NGrams(es(0), literalInt(es(1), "ngrams", "n"))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("winnowed_fingerprint", es => {
      if (es.length != 3)
        throw new IllegalArgumentException(
          s"winnowed_fingerprint expects 3 arguments, got ${es.length}")
      WinnowedFingerprint(es(0),
        literalInt(es(1), "winnowed_fingerprint", "window"),
        literalInt(es(2), "winnowed_fingerprint", "k"))
    }, "scala_udf")
  }
}
