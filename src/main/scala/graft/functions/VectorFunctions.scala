package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector distance/similarity kernels as native Catalyst expressions.
  *
  * The reference delegates these to its vector-store backend: L2/euclidean is
  * the configured metric (reference `s3vectors-app/pythonvectordbceph.py:114`,
  * `milvus-app/pythonvectordbceph_milvus.py:101`); L2 normalization of image
  * vectors at `s3vectors-app/pythonvectordbceph.py:47`; float32 storage cast
  * at `s3vectors-app/pythonvectordbceph.py:191`. We own the metric natively.
  *
  * Design notes (100 TB posture):
  *   - Arithmetic is always performed in `double` regardless of the stored
  *     element type (vectors rest as float32, matching the reference's
  *     `np.float32` storage + numpy's float64 compute promotion). This also
  *     makes results bit-identical to DuckDB's `list_*` functions over
  *     `DOUBLE[]`, which the correctness oracle relies on.
  *   - All binary kernels implement `doGenCode`, so they stay inside
  *     whole-stage codegen — a KNN scan over billions of rows is a single
  *     tight fused loop per partition, no virtual calls, no boxing.
  *   - Null elements inside a vector are not expected (schema declares
  *     non-null elements after ingest validation) and are read as 0.
  */
object VectorKernels {
  /** Java source snippet reading element `i` of ArrayData `arr` as double. */
  private[functions] def elemAsDouble(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType  => s"(double) $arr.getFloat($i)"
      case other => throw new IllegalStateException(s"unsupported vector element type $other")
    }

  private[functions] def elemAsDouble(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => arr.getDouble(i)
      case _          => arr.getFloat(i).toDouble
    }

  /** Element read that ROUNDS double inputs through float32 first. The
    * frozen-encoding kernels (cell assign, SQ8 codes/qmax) promise
    * bit-for-bit float32 recomputability regardless of the input column's
    * width — a double-typed vector must assign/encode exactly like its
    * float32 rounding, or incremental index maintenance re-deriving a
    * row's cell could disagree with the cell it was written to (the
    * pre-codegen udfs got this for free from their Seq[Float] signature;
    * [[NearestCentroids]] rounds explicitly the same way). The DISTANCE
    * kernels deliberately keep full double inputs — query-time precision
    * is not an at-rest contract. */
  private[functions] def elemAsFloat32(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => s"(double) (float) $arr.getDouble($i)"
      case FloatType  => s"(double) $arr.getFloat($i)"
      case other => throw new IllegalStateException(s"unsupported vector element type $other")
    }

  private[functions] def elemAsFloat32(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => arr.getDouble(i).toFloat.toDouble
      case _          => arr.getFloat(i).toDouble
    }

  /** Dimension agreement check shared by the binary kernels. The reference
    * backends reject mismatched dims at the index boundary (fixed-dim index,
    * `s3vectors-app/pythonvectordbceph.py:111-113`) and DuckDB's
    * `list_distance` errors likewise — a silently truncated distance would
    * diverge from both. */
  private[functions] def checkDims(name: String, x: ArrayData, y: ArrayData): Int = {
    val (nx, ny) = (x.numElements(), y.numElements())
    if (nx != ny)
      throw new IllegalArgumentException(
        s"$name: vector dimension mismatch ($nx vs $ny)")
    nx
  }

  /** Codegen twin of [[checkDims]]. */
  private[functions] def checkDimsCode(name: String, a: String, b: String, n: String): String =
    s"""
       |if ($a.numElements() != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$name: vector dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
       |}
       |int $n = $a.numElements();
     """.stripMargin
}

/** Common typing/validation for binary vector → double kernels. */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
}

/** Euclidean (L2) distance: sqrt(Σ (a_i − b_i)²). Reference metric
  * `euclidean` at `s3vectors-app/pythonvectordbceph.py:114`. */
case class L2Distance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = VectorKernels.checkDims(prettyName, x, y)
    var s = 0.0; var i = 0
    while (i < n) {
      val d = VectorKernels.elemAsDouble(left, x, i) - VectorKernels.elemAsDouble(right, y, i)
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s, d) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("d"))
      s"""
         |${VectorKernels.checkDimsCode(prettyName, a, b, n)}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${VectorKernels.elemAsDouble(left, a, i)} - ${VectorKernels.elemAsDouble(right, b, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Inner product Σ a_i·b_i. */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = VectorKernels.checkDims(prettyName, x, y)
    var s = 0.0; var i = 0
    while (i < n) {
      s += VectorKernels.elemAsDouble(left, x, i) * VectorKernels.elemAsDouble(right, y, i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
      s"""
         |${VectorKernels.checkDimsCode(prettyName, a, b, n)}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${VectorKernels.elemAsDouble(left, a, i)} * ${VectorKernels.elemAsDouble(right, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Cosine similarity: dot(a,b) / (‖a‖·‖b‖); 0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = VectorKernels.checkDims(prettyName, x, y)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xa = VectorKernels.elemAsDouble(left, x, i)
      val yb = VectorKernels.elemAsDouble(right, y, i)
      dot += xa * yb; na += xa * xa; nb += yb * yb; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n) = (ctx.freshName("i"), ctx.freshName("n"))
      val (dot, na, nb, xa, yb, den) =
        (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"),
          ctx.freshName("xa"), ctx.freshName("yb"), ctx.freshName("den"))
      s"""
         |${VectorKernels.checkDimsCode(prettyName, a, b, n)}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xa = ${VectorKernels.elemAsDouble(left, a, i)};
         |  double $yb = ${VectorKernels.elemAsDouble(right, b, i)};
         |  $dot += $xa * $yb; $na += $xa * $xa; $nb += $yb * $yb;
         |}
         |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** ‖v‖₂ — Euclidean norm of one vector. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vector_norm"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_norm requires array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) { val v = VectorKernels.elemAsDouble(child, x, i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (i, n, s, v) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("v"))
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${VectorKernels.elemAsDouble(child, a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** L2-normalize a vector to unit norm, preserving float32 element type.
  * Reference: `sklearn.preprocessing.normalize(v, norm="l2")` applied to
  * image embeddings at `s3vectors-app/pythonvectordbceph.py:47`.
  * Zero vectors pass through unchanged (sklearn behavior). */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "l2_normalize"

  override def dataType: DataType = child.dataType match {
    case at: ArrayType => at
    case _ => ArrayType(FloatType, containsNull = false)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"l2_normalize requires array<float|double>, got ${dt.catalogString}")
    }

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val v = VectorKernels.elemAsDouble(child, x, i); s += v * v; i += 1 }
    val norm = math.sqrt(s)
    if (norm == 0.0) x.copy()
    else if (isDouble) {
      val out = new Array[Double](n); i = 0
      while (i < n) { out(i) = x.getDouble(i) / norm; i += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Float](n); i = 0
      while (i < n) { out(i) = (x.getFloat(i) / norm).toFloat; i += 1 }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (i, n, s, v, norm, out) = (ctx.freshName("i"), ctx.freshName("n"),
        ctx.freshName("s"), ctx.freshName("v"), ctx.freshName("norm"), ctx.freshName("out"))
      val (jt, getter, divCast) =
        if (isDouble) ("double", s"$a.getDouble($i)", "")
        else ("float", s"$a.getFloat($i)", "(float) ")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${VectorKernels.elemAsDouble(child, a, i)};
         |  $s += $v * $v;
         |}
         |double $norm = java.lang.Math.sqrt($s);
         |if ($norm == 0.0) {
         |  ${ev.value} = $a.copy();
         |} else {
         |  $jt[] $out = new $jt[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $divCast($getter / $norm);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Fail the query if a vector's dimension ≠ expected — enforces the
  * fixed-dimension collection schema the reference declares at index create
  * (`VECTOR_DIMENSION` env, `s3vectors-app/pythonvectordbceph.py:111-113`,
  * `milvus-app/pythonvectordbceph_milvus.py:95`). */
case class AssertDim(child: Expression, dim: Int) extends UnaryExpression {
  override def prettyName: String = "assert_dim"
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"assert_dim requires array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim)
      throw new IllegalArgumentException(
        s"vector dimension ${x.numElements()} != declared dimension $dim")
    x
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "vector dimension " + $a.numElements() + " != declared dimension " + $dim);
         |}
         |${ev.value} = $a;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Nearest-centroid argmin over a BROADCAST center table: the IVF cell
  * assignment kernel (IvfIndex.assignCells). Semantics are frozen —
  * strict-less L2², ties to the lowest centroid id — because a row's cell
  * must be recomputable bit-for-bit at eviction time (GraftClient's
  * incremental index maintenance re-derives an old row's cell from its
  * vector; reference backend keeps its index live across upserts at
  * `milvus-app/pythonvectordbceph_milvus.py:100-102,154`).
  *
  * The centers ride a [[Broadcast]] (ship-once-per-executor, exactly like
  * the udf this replaces — nlist=16384 × dim 384 doubles is ~50 MB, too big
  * to serialize into every task), resolved once per generated class in
  * codegen init, so the per-row loop is a fused primitive argmin with no
  * boxing — this runs on every merge-commit's maintenance path. */
case class NearestCentroid(child: Expression,
    centers: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
  extends UnaryExpression {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = centers.value
    // an empty quantizer has NO cell to assign to — returning the
    // plausible-looking id 0 would write rows into a cell the quantizer
    // doesn't contain, silently breaking the frozen-recompute contract
    if (cs.isEmpty)
      throw new IllegalStateException("nearest_centroid: empty centroid set")
    if (v.numElements() != cs(0).length)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector dimension ${v.numElements()} != centroid dimension ${cs(0).length}")
    var best = 0; var bestD = Double.MaxValue
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      var s = 0.0; var j = 0
      while (j < c.length) {
        val d = c(j) - VectorKernels.elemAsFloat32(child, v, j)
        s += d * d; j += 1
      }
      if (s < bestD) { bestD = s; best = i }
      i += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centersBc", centers,
      "org.apache.spark.broadcast.Broadcast")
    // The broadcast is unwrapped ONCE per generated class instance, not per
    // row — the row loop sees a plain double[][].
    val cVar = ctx.addMutableState("double[][]", "nearestCentroidCenters",
      v => s"$v = (double[][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      val (i, j, c, s, d) = (ctx.freshName("i"), ctx.freshName("j"),
        ctx.freshName("c"), ctx.freshName("s"), ctx.freshName("d"))
      val (best, bestD) = (ctx.freshName("best"), ctx.freshName("bestD"))
      s"""
         |if ($cVar.length == 0) {
         |  throw new IllegalStateException("nearest_centroid: empty centroid set");
         |}
         |if ($a.numElements() != $cVar[0].length) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroid: vector dimension " + $a.numElements() +
         |    " != centroid dimension " + $cVar[0].length);
         |}
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $i = 0; $i < $cVar.length; $i++) {
         |  double[] $c = $cVar[$i];
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $c.length; $j++) {
         |    double $d = $c[$j] - ${VectorKernels.elemAsFloat32(child, a, j)};
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = $i; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Runtime kernel behind [[NearestCentroids]] — static so generated code
  * calls it directly (one call per row; the selection loop itself is
  * branch-predictable primitive arithmetic). */
object NearestCentroidsKernel {
  /** The `nprobe` centroid ids nearest to `v` under (L2², lowest-id-wins)
    * — EXACTLY CoarseQuantizer.probes' ordering, including its float32
    * rounding of the query (probes takes `Array[Float]`, so a double
    * vector is float-rounded BEFORE distances — the udf this replaced got
    * that cast from the analyzer) and of the normalized query (the cosine
    * path normalizes to a float vector before probing). Bounded-insertion
    * top-k: O(nlist·k) worst case with k = nprobe (typically ≤ 32), not a
    * full O(nlist·log nlist) argsort per row. nprobe ≤ 0 selects nothing
    * (the take(0) behavior of the driver-side probes). */
  def select(centers: Array[Array[Double]], v: ArrayData, vIsFloat: Boolean,
             normalize: Boolean, nprobe: Int): GenericArrayData = {
    if (nprobe <= 0 || centers.length == 0)
      return new GenericArrayData(Array.empty[Int])
    // same dim guard as NearestCentroid: a LONGER query would silently
    // rank cells by a prefix distance, a shorter one would die with a
    // bare ArrayIndexOutOfBoundsException — both paths (eval and codegen)
    // funnel through this kernel, so the check covers both
    if (v.numElements() != centers(0).length)
      throw new IllegalArgumentException(
        s"nearest_centroids: vector dimension ${v.numElements()} != " +
          s"centroid dimension ${centers(0).length}")
    val n = v.numElements()
    val q = new Array[Double](n)
    var i = 0
    while (i < n) {
      q(i) = if (vIsFloat) v.getFloat(i).toDouble
             else v.getDouble(i).toFloat.toDouble
      i += 1
    }
    if (normalize) {
      var s = 0.0; i = 0
      while (i < n) { s += q(i) * q(i); i += 1 }
      val nm = math.sqrt(s)
      if (nm != 0.0) {
        i = 0
        // float32-rounded, matching the reference probe path: the
        // normalized query is materialized as float before distances
        while (i < n) { q(i) = (q(i) / nm).toFloat.toDouble; i += 1 }
      }
    }
    val k = math.min(nprobe, centers.length)
    // ascending (dist, id) insertion buffer of size k
    val bd = new Array[Double](k)
    val bi = new Array[Int](k)
    var sz = 0
    var c = 0
    while (c < centers.length) {
      val ct = centers(c)
      var s = 0.0; var j = 0
      while (j < ct.length) { val d = ct(j) - q(j); s += d * d; j += 1 }
      if (sz < k || s < bd(sz - 1) || (s == bd(sz - 1) && c < bi(sz - 1))) {
        // insertion position: after all entries strictly better than (s, c)
        var p = if (sz < k) sz else sz - 1
        while (p > 0 && (bd(p - 1) > s || (bd(p - 1) == s && bi(p - 1) > c))) {
          if (p < k) { bd(p) = bd(p - 1); bi(p) = bi(p - 1) }
          p -= 1
        }
        bd(p) = s; bi(p) = c
        if (sz < k) sz += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bi, sz))
  }
}

/** The `nprobe` nearest centroid ids per query vector, DISTRIBUTED — the
  * batched-KNN probe step (cells chosen executor-side against the
  * broadcast quantizer; no driver loop over the query set). Replaces the
  * probe udf: no boxed `Seq[Float]` per row, and the selection is a
  * bounded insertion top-k instead of a full argsort over nlist. Output
  * order matches `CoarseQuantizer.probes` exactly (L2² ascending, ties to
  * the lowest id; cosine normalizes to float32 first). */
case class NearestCentroids(child: Expression,
    centers: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
    nprobe: Int, normalize: Boolean)
  extends UnaryExpression {
  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids requires array<float|double>, got ${dt.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    NearestCentroidsKernel.select(
      centers.value, a.asInstanceOf[ArrayData], isFloat, normalize, nprobe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centersBc", centers,
      "org.apache.spark.broadcast.Broadcast")
    val cVar = ctx.addMutableState("double[][]", "nearestCentroidsCenters",
      v => s"$v = (double[][]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.NearestCentroidsKernel.select(
         |  $cVar, $a, $isFloat, $normalize, $nprobe);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SQ8 symmetric int8 encoding, CODES half: `code_i = floor(x_i·127/qmax
  * + 0.5).toByte` with `qmax = max|x|` (explicit floor(+0.5), matching the
  * declared `embedding_quant_error` oracle arithmetic; an all-zero vector
  * encodes as all-zero codes). Paired with [[Sq8Qmax]]; both are codegen'd
  * so the per-merge-commit re-quantize of touched SQ8 cells is a fused
  * primitive loop, not a boxed `Seq[Float]` udf closure. The max-abs pass
  * runs in each expression (dim-bounded, branch-free) — cheaper than the
  * per-row boxing a shared struct-returning kernel would reintroduce. */
case class Sq8Codes(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sq8_codes"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_codes requires array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0; var i = 0
    while (i < n) {
      val x = math.abs(VectorKernels.elemAsFloat32(child, v, i))
      if (x > mx) mx = x
      i += 1
    }
    val codes = new Array[Byte](n)
    if (mx > 0) {
      i = 0
      while (i < n) {
        codes(i) = math.floor(
          VectorKernels.elemAsFloat32(child, v, i) * 127.0 / mx + 0.5).toByte
        i += 1
      }
    }
    codes
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (i, n, mx, x, codes) = (ctx.freshName("i"), ctx.freshName("n"),
        ctx.freshName("mx"), ctx.freshName("x"), ctx.freshName("codes"))
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs(${VectorKernels.elemAsFloat32(child, a, i)});
         |  if ($x > $mx) $mx = $x;
         |}
         |byte[] $codes = new byte[$n];
         |if ($mx > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $codes[$i] = (byte) java.lang.Math.floor(
         |      ${VectorKernels.elemAsFloat32(child, a, i)} * 127.0 / $mx + 0.5);
         |  }
         |}
         |${ev.value} = $codes;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** SQ8 symmetric int8 encoding, SCALE half: `qmax = max|x|` as double —
  * see [[Sq8Codes]]. */
case class Sq8Qmax(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sq8_qmax"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_qmax requires array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0; var i = 0
    while (i < n) {
      val x = math.abs(VectorKernels.elemAsFloat32(child, v, i))
      if (x > mx) mx = x
      i += 1
    }
    mx
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (i, n, mx, x) = (ctx.freshName("i"), ctx.freshName("n"),
        ctx.freshName("mx"), ctx.freshName("x"))
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs(${VectorKernels.elemAsFloat32(child, a, i)});
         |  if ($x > $mx) $mx = $x;
         |}
         |${ev.value} = $mx;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** L2 distance between an SQ8-encoded vector and a full-precision query.
  *
  * SQ8 storage (Sq8Index): codes are int8, `code_i = floor(x_i·127/qmax
  * + 0.5)` with `qmax = max|x|` per vector; dequantization is `code_i ·
  * qmax / 127`. This kernel fuses dequantize-and-distance so the scan
  * reads 1 byte per component instead of 4 and never materializes the
  * dequantized array. Same double arithmetic + codegen posture as
  * [[L2Distance]] — the approximate scan stays a fused loop. */
case class Sq8L2Distance(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "sq8_l2_distance"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val qOk = third.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (first.dataType == BinaryType && second.dataType == DoubleType && qOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, double, array<float|double>), got " +
          s"${first.dataType.catalogString} / ${second.dataType.catalogString} / " +
          third.dataType.catalogString)
  }

  override def nullSafeEval(bv: Any, mv: Any, qv: Any): Any = {
    val codes = bv.asInstanceOf[Array[Byte]]
    val mx = mv.asInstanceOf[Double]
    val q = qv.asInstanceOf[ArrayData]
    if (codes.length != q.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${codes.length} vs ${q.numElements()})")
    val scale = mx / 127.0
    var s = 0.0; var i = 0
    while (i < codes.length) {
      val d = codes(i) * scale - VectorKernels.elemAsDouble(third, q, i)
      s += d * d; i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, m, q) => {
      val (i, n, s, d, sc) = (ctx.freshName("i"), ctx.freshName("n"),
        ctx.freshName("s"), ctx.freshName("d"), ctx.freshName("sc"))
      s"""
         |if ($b.length != $q.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $b.length + " vs " + $q.numElements() + ")");
         |}
         |int $n = $b.length;
         |double $sc = $m / 127.0;
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $b[$i] * $sc - ${VectorKernels.elemAsDouble(third, q, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, sE: Expression, t: Expression): Expression = copy(f, sE, t)
}

/** Column-API + SQL registration surface for the vector kernels. */
object VectorFunctions {
  import GraftShim.{column, expression}

  def l2_distance(a: Column, b: Column): Column = column(L2Distance(expression(a), expression(b)))
  def dot_product(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def cosine_similarity(a: Column, b: Column): Column = column(CosineSimilarity(expression(a), expression(b)))
  def vector_norm(a: Column): Column = column(VectorNorm(expression(a)))
  def l2_normalize(a: Column): Column = column(L2Normalize(expression(a)))
  def assert_dim(a: Column, d: Int): Column = column(AssertDim(expression(a), d))
  def nearest_centroid(a: Column,
      centers: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    column(NearestCentroid(expression(a), centers))
  def nearest_centroids(a: Column,
      centers: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      nprobe: Int, normalize: Boolean): Column =
    column(NearestCentroids(expression(a), centers, nprobe, normalize))
  def sq8_l2_distance(codes: Column, qmax: Column, q: Column): Column =
    column(Sq8L2Distance(expression(codes), expression(qmax.cast("double")), expression(q)))
  def sq8_codes(a: Column): Column = column(Sq8Codes(expression(a)))
  def sq8_qmax(a: Column): Column = column(Sq8Qmax(expression(a)))

  /** Arity guard for the SQL builders — a readable error instead of an
    * IndexOutOfBoundsException on e.g. `l2_distance(v)`. */
  private def arity(name: String, n: Int)(es: Seq[Expression]): Seq[Expression] = {
    if (es.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${es.length}")
    es
  }

  /** Register all kernels as SQL functions in this session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = GraftShim.functionRegistry(spark)
    def reg2(name: String, f: (Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name,
        es => { arity(name, 2)(es); f(es(0), es(1)) }, "scala_udf")
    def reg1(name: String, f: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name,
        es => { arity(name, 1)(es); f(es.head) }, "scala_udf")
    def reg3(name: String, f: (Expression, Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name,
        es => { arity(name, 3)(es); f(es(0), es(1), es(2)) }, "scala_udf")
    reg2("l2_distance", L2Distance)
    reg2("dot_product", DotProduct)
    reg2("cosine_similarity", CosineSimilarity)
    reg3("sq8_l2_distance", Sq8L2Distance)
    reg1("vector_norm", VectorNorm)
    reg1("l2_normalize", L2Normalize)
    reg1("sq8_codes", Sq8Codes)
    reg1("sq8_qmax", Sq8Qmax)
    reg.createOrReplaceTempFunction("assert_dim", es => {
      arity("assert_dim", 2)(es)
      es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(d: Int, IntegerType) =>
          AssertDim(es(0), d)
        case other => throw new IllegalArgumentException(
          s"assert_dim expects a literal int dimension, got $other")
      }
    }, "scala_udf")
  }
}
