package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Binary-vector kernels: sign binarization + Hamming / Jaccard metrics.
  *
  * Milvus (the reference's backend, `milvus-app/pythonvectordbceph_milvus.py`)
  * supports BINARY_VECTOR fields with HAMMING and JACCARD metrics next to the
  * float metrics the reference configures; a migrating user binarizing
  * embeddings for cheap pre-filtering reaches these next. We own the metric
  * natively, on vectors packed 64 dims per long:
  *
  *   - [[PackSignBits]]  array<float|double> → array<long>: bit j of word w
  *     is set iff component (w·64+j) is strictly positive. 384-dim float32
  *     vectors become 6 longs — 32× smaller at rest, and one XOR+popcount
  *     per word at query time instead of 64 float ops.
  *   - [[HammingDistance]]  Σ Long.bitCount(a XOR b) → long.
  *   - [[JaccardDistance]]  1 − popcount(a AND b) / popcount(a OR b) → double
  *     (both-empty → 0.0: identical codes are distance zero by convention,
  *     matching "distance of a vector to itself is 0").
  *
  * Scale posture mirrors VectorFunctions: all three implement `doGenCode`,
  * so a binary KNN scan is a fused whole-stage-codegen loop over longs —
  * ~50 GB/s popcount throughput per core, which is why binary pre-rank is
  * the cheap first stage at 100 TB. Packing uses the float32-rounded read
  * ([[VectorKernels.elemAsFloat32]]) so a double-typed input binarizes
  * exactly like its float32 at-rest form (the frozen-encoding rule the
  * cell-assign and SQ8 kernels follow).
  */
object BinaryVectorKernels {
  private[functions] def checkWords(name: String, x: ArrayData, y: ArrayData): Int = {
    val (nx, ny) = (x.numElements(), y.numElements())
    if (nx != ny)
      throw new IllegalArgumentException(
        s"$name: code length mismatch ($nx vs $ny words)")
    nx
  }

  private[functions] def checkWordsCode(name: String, a: String, b: String, n: String): String =
    s"""
       |if ($a.numElements() != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$name: code length mismatch (" + $a.numElements() + " vs " + $b.numElements() + " words)");
       |}
       |int $n = $a.numElements();
     """.stripMargin

  // containsNull MUST be false: the word loop reads elements with
  // getLong, which renders a null slot as 0 — a silently wrong distance.
  // pack_sign_bits emits non-null elements; user-supplied codes with a
  // nullable element type are rejected at analysis, not misread at run.
  private[functions] def codesTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, false) => true
    case _ => false
  }
}

/** Common typing for the two packed-code metric kernels. */
abstract class BinaryCodeExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (BinaryVectorKernels.codesTypeOk(left.dataType) &&
        BinaryVectorKernels.codesTypeOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> packed codes with NON-NULL " +
          "elements (a null word would silently read as 0 — cast away the " +
          s"nullability if your codes carry none), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
}

/** Sign binarization: array<float|double> → array<long>, 64 dims per word,
  * bit j of word w set iff component (w·64+j) > 0. Trailing pad bits of the
  * last word are zero (and identical padding on both sides cancels in every
  * metric: XOR/AND of zeros contribute nothing). */
case class PackSignBits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "pack_sign_bits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${dt.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (VectorKernels.elemAsFloat32(child, v, i) > 0.0)
        words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (i, n, w) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("w"))
      s"""
         |int $n = $a.numElements();
         |long[] $w = new long[($n + 63) >>> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (${VectorKernels.elemAsFloat32(child, a, i)} > 0.0) {
         |    $w[$i >>> 6] |= (1L << ($i & 63));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Hamming distance over packed codes: Σ Long.bitCount(a_w XOR b_w). */
case class HammingDistance(left: Expression, right: Expression) extends BinaryCodeExpression {
  override def prettyName: String = "hamming_distance"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = BinaryVectorKernels.checkWords(prettyName, x, y)
    var s = 0L; var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
      s"""
         |${BinaryVectorKernels.checkWordsCode(prettyName, a, b, n)}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Jaccard distance over packed codes:
  * 1 − popcount(a AND b) / popcount(a OR b); both-empty → 0.0. */
case class JaccardDistance(left: Expression, right: Expression) extends BinaryCodeExpression {
  override def prettyName: String = "jaccard_distance"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = BinaryVectorKernels.checkWords(prettyName, x, y)
    var inter = 0L; var union = 0L; var i = 0
    while (i < n) {
      val (xw, yw) = (x.getLong(i), y.getLong(i))
      inter += java.lang.Long.bitCount(xw & yw)
      union += java.lang.Long.bitCount(xw | yw)
      i += 1
    }
    if (union == 0L) 0.0 else 1.0 - inter.toDouble / union.toDouble
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, in, un, xw, yw) = (ctx.freshName("i"), ctx.freshName("n"),
        ctx.freshName("inter"), ctx.freshName("union"),
        ctx.freshName("xw"), ctx.freshName("yw"))
      s"""
         |${BinaryVectorKernels.checkWordsCode(prettyName, a, b, n)}
         |long $in = 0L; long $un = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xw = $a.getLong($i); long $yw = $b.getLong($i);
         |  $in += java.lang.Long.bitCount($xw & $yw);
         |  $un += java.lang.Long.bitCount($xw | $yw);
         |}
         |${ev.value} = ($un == 0L) ? 0.0 : 1.0 - (double) $in / (double) $un;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Column-API + SQL registration surface for the binary-vector kernels. */
object BinaryVectorFunctions {
  import GraftShim.{column, expression}

  def pack_sign_bits(a: Column): Column = column(PackSignBits(expression(a)))
  def hamming_distance(a: Column, b: Column): Column =
    column(HammingDistance(expression(a), expression(b)))
  def jaccard_distance(a: Column, b: Column): Column =
    column(JaccardDistance(expression(a), expression(b)))

  private def arity(name: String, n: Int)(es: Seq[Expression]): Seq[Expression] = {
    if (es.length != n)
      throw new IllegalArgumentException(s"$name expects $n argument(s), got ${es.length}")
    es
  }

  /** Register the kernels as SQL functions in this session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = GraftShim.functionRegistry(spark)
    reg.createOrReplaceTempFunction("pack_sign_bits",
      es => { arity("pack_sign_bits", 1)(es); PackSignBits(es.head) }, "scala_udf")
    reg.createOrReplaceTempFunction("hamming_distance",
      es => { arity("hamming_distance", 2)(es); HammingDistance(es(0), es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_distance",
      es => { arity("jaccard_distance", 2)(es); JaccardDistance(es(0), es(1)) }, "scala_udf")
  }
}
