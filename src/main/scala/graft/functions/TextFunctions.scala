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
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  import GraftShim.{column, expression}

  def ngrams(words: Column, n: Int): Column = column(NGrams(expression(words), n))

  /** Register text kernels as SQL functions (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = GraftShim.functionRegistry(spark)
    reg.createOrReplaceTempFunction("ngrams", es => {
      if (es.length != 2)
        throw new IllegalArgumentException(s"ngrams expects 2 arguments, got ${es.length}")
      es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) =>
          NGrams(es(0), i)
        case other => throw new IllegalArgumentException(
          s"ngrams expects a literal int n, got $other")
      }
    }, "scala_udf")
  }
}
