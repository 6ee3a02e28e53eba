package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels for the IVF_PQ index (Milvus `IVF_PQ` —
  * the heavier-compression sibling of IVF_SQ8 in the same `index_type`
  * config surface the reference backend exposes,
  * `milvus-app/pythonvectordbceph_milvus.py:100-102`).
  *
  * PQ splits each RESIDUAL vector (row minus its coarse IVF centroid,
  * the FAISS/Milvus IVF_PQ construction) into `m` contiguous subvectors
  * of `dsub = dim/m` components and stores, per subvector, the id of its
  * nearest codeword from a per-subspace codebook of `ksub ≤ 256`
  * centers — `m` BYTES per vector instead of `4·dim` (dim 384, m 16:
  * 96× smaller at rest than float32, vs SQ8's 4×).
  *
  * Query-time ranking is ADC (asymmetric distance computation): the
  * driver precomputes, per probed cell, a lookup table of squared
  * distances from the query's residual subvectors to every codeword
  * (`m·ksub` doubles — microseconds), and the scan's per-row work
  * collapses to `m` table lookups + adds. Both kernels are codegen'd
  * Catalyst expressions so encode (the per-merge-commit maintenance
  * path) and ADC (the stage-1 scan) stay fused primitive loops.
  *
  * Same frozen-recompute contract as [[NearestCentroid]]/[[Sq8Codes]]:
  * [[PqEncode]] reads vector elements through float32 rounding and
  * breaks argmin ties to the LOWEST code id, so a row's codes are
  * recomputable bit-for-bit at maintenance time regardless of the input
  * column's width. */
object PqKernels {
  /** Flattened per-cell ADC table: entry `j*ksub + c` = squared L2 from
    * the query residual's subvector `j` to codeword `c` of subspace `j`.
    * Driver-side, O(m·ksub·dsub) = O(ksub·dim) flops per probed cell. */
  def lutFor(qResidual: Array[Double],
             codebooks: Array[Array[Array[Double]]]): Array[Double] = {
    val m = codebooks.length
    require(m > 0, "empty PQ codebooks")
    val ksub = codebooks(0).length
    val dsub = codebooks(0)(0).length
    require(qResidual.length == m * dsub,
      s"query residual dim ${qResidual.length} != m*dsub (${m * dsub})")
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var s = 0.0; var t = 0
        while (t < dsub) {
          val d = qResidual(j * dsub + t) - w(t)
          s += d * d; t += 1
        }
        lut(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    lut
  }
}

/** PQ residual encoding: `(vec, centroidId) → m bytes` of per-subspace
  * nearest-codeword ids, computed against BROADCAST coarse centers and
  * codebooks (see [[PqKernels]] for the contract). Runs on every
  * merge-commit's touched-cell re-encode, so the row loop is a fused
  * primitive argmin per subspace inside whole-stage codegen. */
case class PqEncode(left: Expression, right: Expression,
    centers: Broadcast[Array[Array[Double]]],
    codebooks: Broadcast[Array[Array[Array[Double]]]])
  extends BinaryExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires (array<float|double>, int), got " +
            s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, cid: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cell = cid.asInstanceOf[Int]
    val cs = centers.value
    val cbs = codebooks.value
    if (cbs.isEmpty)
      throw new IllegalStateException("pq_encode: empty codebooks")
    val m = cbs.length
    val dsub = cbs(0)(0).length
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector dimension ${v.numElements()} != m*dsub (${m * dsub})")
    if (cell < 0 || cell >= cs.length)
      throw new IllegalArgumentException(
        s"pq_encode: centroidId $cell outside [0, ${cs.length})")
    val ctr = cs(cell)
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cb = cbs(j)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var s = 0.0; var t = 0
        while (t < dsub) {
          val i = j * dsub + t
          val d = VectorKernels.elemAsFloat32(left, v, i) - ctr(i) - w(t)
          s += d * d; t += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctrRef = ctx.addReferenceObj("pqCentersBc", centers,
      "org.apache.spark.broadcast.Broadcast")
    val cbRef = ctx.addReferenceObj("pqCodebooksBc", codebooks,
      "org.apache.spark.broadcast.Broadcast")
    // both broadcasts unwrap ONCE per generated class instance — the row
    // loop sees plain primitive arrays (the NearestCentroid pattern)
    val csVar = ctx.addMutableState("double[][]", "pqCenters",
      v => s"$v = (double[][]) $ctrRef.value();")
    val cbVar = ctx.addMutableState("double[][][]", "pqCodebooks",
      v => s"$v = (double[][][]) $cbRef.value();")
    nullSafeCodeGen(ctx, ev, (a, cid) => {
      val (mV, dsubV, ctr, out) = (ctx.freshName("m"), ctx.freshName("dsub"),
        ctx.freshName("ctr"), ctx.freshName("out"))
      val (j, c, t, i, s, d, cb, w) = (ctx.freshName("j"), ctx.freshName("c"),
        ctx.freshName("t"), ctx.freshName("i"), ctx.freshName("s"),
        ctx.freshName("d"), ctx.freshName("cb"), ctx.freshName("w"))
      val (best, bestD) = (ctx.freshName("best"), ctx.freshName("bestD"))
      s"""
         |if ($cbVar.length == 0) {
         |  throw new IllegalStateException("pq_encode: empty codebooks");
         |}
         |int $mV = $cbVar.length;
         |int $dsubV = $cbVar[0][0].length;
         |if ($a.numElements() != $mV * $dsubV) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector dimension " + $a.numElements() +
         |    " != m*dsub (" + ($mV * $dsubV) + ")");
         |}
         |if ($cid < 0 || $cid >= $csVar.length) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: centroidId " + $cid + " outside [0, " + $csVar.length + ")");
         |}
         |double[] $ctr = $csVar[$cid];
         |byte[] $out = new byte[$mV];
         |for (int $j = 0; $j < $mV; $j++) {
         |  double[][] $cb = $cbVar[$j];
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $w = $cb[$c];
         |    double $s = 0.0;
         |    for (int $t = 0; $t < $dsubV; $t++) {
         |      int $i = $j * $dsubV + $t;
         |      double $d = ${VectorKernels.elemAsFloat32(left, a, i)} - $ctr[$i] - $w[$t];
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $c; }
         |  }
         |  $out[$j] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ADC ranking: `(pqcode, centroidId) → approximate L2` via the probed
  * cells' precomputed lookup tables (`luts(cellId)` = the flattened
  * `m·ksub` table from [[PqKernels.lutFor]]; null for unprobed cells —
  * reaching one is a dispatch bug and throws rather than scoring
  * garbage). The per-row work is `m` loads + adds — far below even the
  * SQ8 kernel's per-component multiply. Query-time only: no float32
  * at-rest contract, full double arithmetic like the other distance
  * kernels. */
case class PqAdcDistance(left: Expression, right: Expression,
    luts: Broadcast[Array[Array[Double]]], ksub: Int)
  extends BinaryExpression {
  override def prettyName: String = "pq_adc_distance"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_distance requires (binary, int), got " +
            s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(codesAny: Any, cid: Any): Any = {
    val codes = codesAny.asInstanceOf[Array[Byte]]
    val cell = cid.asInstanceOf[Int]
    val ls = luts.value
    if (cell < 0 || cell >= ls.length || ls(cell) == null)
      throw new IllegalStateException(
        s"pq_adc_distance: cell $cell has no lookup table — it was not probed")
    val lut = ls(cell)
    var s = 0.0; var j = 0
    while (j < codes.length) {
      s += lut(j * ksub + (codes(j) & 0xFF))
      j += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLutsBc", luts,
      "org.apache.spark.broadcast.Broadcast")
    val lsVar = ctx.addMutableState("double[][]", "pqLuts",
      v => s"$v = (double[][]) $lutRef.value();")
    nullSafeCodeGen(ctx, ev, (codes, cid) => {
      val (j, s, lut) = (ctx.freshName("j"), ctx.freshName("s"), ctx.freshName("lut"))
      s"""
         |if ($cid < 0 || $cid >= $lsVar.length || $lsVar[$cid] == null) {
         |  throw new IllegalStateException(
         |    "pq_adc_distance: cell " + $cid + " has no lookup table — it was not probed");
         |}
         |double[] $lut = $lsVar[$cid];
         |double $s = 0.0;
         |for (int $j = 0; $j < $codes.length; $j++) {
         |  $s += $lut[$j * $ksub + ($codes[$j] & 0xFF)];
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-row PQ reconstruction error: `(vec, centroidId) → ‖v − ṽ‖` where
  * `ṽ = center + decode(encode(v))` — the quantization error the ADC
  * margin drain's hold-back bound needs (`|exact − adc| ≤ ‖v − ṽ‖` by
  * the triangle inequality, so a per-cell MAX of this value is PQ's ε —
  * the analytic `√d·qmax/254` SQ8 derives, measured instead because PQ's
  * error is data-dependent). Recomputes the encoding rather than reading
  * the code column: encode picks the per-subspace argmin, so the error
  * is exactly `√(Σ_j min_c ‖res_j − w_c‖²)` — same fused loop as
  * [[PqEncode]] keeping the min instead of the argmin, same float32 read
  * contract, so the bound covers precisely the codes at rest. */
case class PqReconError(left: Expression, right: Expression,
    centers: Broadcast[Array[Array[Double]]],
    codebooks: Broadcast[Array[Array[Array[Double]]]])
  extends BinaryExpression {
  override def prettyName: String = "pq_recon_error"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_recon_error requires (array<float|double>, int), got " +
            s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, cid: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cell = cid.asInstanceOf[Int]
    val cs = centers.value
    val cbs = codebooks.value
    if (cbs.isEmpty)
      throw new IllegalStateException("pq_recon_error: empty codebooks")
    val m = cbs.length
    val dsub = cbs(0)(0).length
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_recon_error: vector dimension ${v.numElements()} != m*dsub (${m * dsub})")
    if (cell < 0 || cell >= cs.length)
      throw new IllegalArgumentException(
        s"pq_recon_error: centroidId $cell outside [0, ${cs.length})")
    val ctr = cs(cell)
    var total = 0.0
    var j = 0
    while (j < m) {
      val cb = cbs(j)
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var s = 0.0; var t = 0
        while (t < dsub) {
          val i = j * dsub + t
          val d = VectorKernels.elemAsFloat32(left, v, i) - ctr(i) - w(t)
          s += d * d; t += 1
        }
        if (s < bestD) bestD = s
        c += 1
      }
      total += bestD
      j += 1
    }
    math.sqrt(total)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctrRef = ctx.addReferenceObj("pqCentersBc", centers,
      "org.apache.spark.broadcast.Broadcast")
    val cbRef = ctx.addReferenceObj("pqCodebooksBc", codebooks,
      "org.apache.spark.broadcast.Broadcast")
    val csVar = ctx.addMutableState("double[][]", "pqCenters",
      v => s"$v = (double[][]) $ctrRef.value();")
    val cbVar = ctx.addMutableState("double[][][]", "pqCodebooks",
      v => s"$v = (double[][][]) $cbRef.value();")
    nullSafeCodeGen(ctx, ev, (a, cid) => {
      val (mV, dsubV, ctr, tot) = (ctx.freshName("m"), ctx.freshName("dsub"),
        ctx.freshName("ctr"), ctx.freshName("tot"))
      val (j, c, t, i, s, d, cb, w) = (ctx.freshName("j"), ctx.freshName("c"),
        ctx.freshName("t"), ctx.freshName("i"), ctx.freshName("s"),
        ctx.freshName("d"), ctx.freshName("cb"), ctx.freshName("w"))
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($cbVar.length == 0) {
         |  throw new IllegalStateException("pq_recon_error: empty codebooks");
         |}
         |int $mV = $cbVar.length;
         |int $dsubV = $cbVar[0][0].length;
         |if ($a.numElements() != $mV * $dsubV) {
         |  throw new IllegalArgumentException(
         |    "pq_recon_error: vector dimension " + $a.numElements() +
         |    " != m*dsub (" + ($mV * $dsubV) + ")");
         |}
         |if ($cid < 0 || $cid >= $csVar.length) {
         |  throw new IllegalArgumentException(
         |    "pq_recon_error: centroidId " + $cid + " outside [0, " + $csVar.length + ")");
         |}
         |double[] $ctr = $csVar[$cid];
         |double $tot = 0.0;
         |for (int $j = 0; $j < $mV; $j++) {
         |  double[][] $cb = $cbVar[$j];
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $w = $cb[$c];
         |    double $s = 0.0;
         |    for (int $t = 0; $t < $dsubV; $t++) {
         |      int $i = $j * $dsubV + $t;
         |      double $d = ${VectorKernels.elemAsFloat32(left, a, i)} - $ctr[$i] - $w[$t];
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; }
         |  }
         |  $tot += $bestD;
         |}
         |${ev.value} = java.lang.Math.sqrt($tot);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Executor-side ADC for BATCHED search: `(qvec, pqcode, centroidId) →
  * approximate L2` computed directly from the broadcast centers +
  * codebooks — no per-query lookup table. The single-query path's
  * driver-built LUT is O(ksub·dim) once then O(m) per row, but a batch
  * of |Q| queries × nprobe cells would either loop on the driver or
  * shuffle |Q|·nprobe tables of m·ksub doubles (m 64, ksub 256: 128 KiB
  * EACH) — so the batch arm pays O(dim) fused flops per (query, code)
  * pair instead, the same per-pair cost as a float distance while stage
  * 1 still READS only m bytes per row (the at-rest win that matters at
  * corpus scale). Arithmetic matches the LUT path operation-for-
  * operation — (q−ctr)−w, inner t-sum per subspace, outer j-sum, sqrt —
  * so batch stage-1 distances are bit-identical to single-query ADC. */
case class PqAsymDistance(first: Expression, second: Expression,
    third: Expression,
    centers: Broadcast[Array[Array[Double]]],
    codebooks: Broadcast[Array[Array[Array[Double]]]])
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "pq_asym_distance"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val qOk = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (qOk && second.dataType == BinaryType && third.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, binary, int), got " +
          s"${first.dataType.catalogString} / ${second.dataType.catalogString} / " +
          third.dataType.catalogString)
  }

  override def nullSafeEval(qv: Any, codesAny: Any, cid: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[Array[Byte]]
    val cell = cid.asInstanceOf[Int]
    val cs = centers.value
    val cbs = codebooks.value
    if (cbs.isEmpty)
      throw new IllegalStateException(s"$prettyName: empty codebooks")
    val m = cbs.length
    val dsub = cbs(0)(0).length
    if (codes.length != m)
      throw new IllegalArgumentException(
        s"$prettyName: code length ${codes.length} != m ($m)")
    if (q.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"$prettyName: query dimension ${q.numElements()} != m*dsub (${m * dsub})")
    if (cell < 0 || cell >= cs.length)
      throw new IllegalArgumentException(
        s"$prettyName: centroidId $cell outside [0, ${cs.length})")
    val ctr = cs(cell)
    var total = 0.0
    var j = 0
    while (j < m) {
      val w = cbs(j)(codes(j) & 0xFF)
      var s = 0.0; var t = 0
      while (t < dsub) {
        val i = j * dsub + t
        val d = VectorKernels.elemAsFloat32(first, q, i) - ctr(i) - w(t)
        s += d * d; t += 1
      }
      total += s
      j += 1
    }
    math.sqrt(total)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctrRef = ctx.addReferenceObj("pqCentersBc", centers,
      "org.apache.spark.broadcast.Broadcast")
    val cbRef = ctx.addReferenceObj("pqCodebooksBc", codebooks,
      "org.apache.spark.broadcast.Broadcast")
    val csVar = ctx.addMutableState("double[][]", "pqCenters",
      v => s"$v = (double[][]) $ctrRef.value();")
    val cbVar = ctx.addMutableState("double[][][]", "pqCodebooks",
      v => s"$v = (double[][][]) $cbRef.value();")
    nullSafeCodeGen(ctx, ev, (q, codes, cid) => {
      val (mV, dsubV, ctr, tot) = (ctx.freshName("m"), ctx.freshName("dsub"),
        ctx.freshName("ctr"), ctx.freshName("tot"))
      val (j, t, i, s, d, w) = (ctx.freshName("j"), ctx.freshName("t"),
        ctx.freshName("i"), ctx.freshName("s"), ctx.freshName("d"),
        ctx.freshName("w"))
      s"""
         |if ($cbVar.length == 0) {
         |  throw new IllegalStateException("$prettyName: empty codebooks");
         |}
         |int $mV = $cbVar.length;
         |int $dsubV = $cbVar[0][0].length;
         |if ($codes.length != $mV) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: code length " + $codes.length + " != m (" + $mV + ")");
         |}
         |if ($q.numElements() != $mV * $dsubV) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: query dimension " + $q.numElements() +
         |    " != m*dsub (" + ($mV * $dsubV) + ")");
         |}
         |if ($cid < 0 || $cid >= $csVar.length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: centroidId " + $cid + " outside [0, " + $csVar.length + ")");
         |}
         |double[] $ctr = $csVar[$cid];
         |double $tot = 0.0;
         |for (int $j = 0; $j < $mV; $j++) {
         |  double[] $w = $cbVar[$j][$codes[$j] & 0xFF];
         |  double $s = 0.0;
         |  for (int $t = 0; $t < $dsubV; $t++) {
         |    int $i = $j * $dsubV + $t;
         |    double $d = ${VectorKernels.elemAsFloat32(first, q, i)} - $ctr[$i] - $w[$t];
         |    $s += $d * $d;
         |  }
         |  $tot += $s;
         |}
         |${ev.value} = java.lang.Math.sqrt($tot);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, sE: Expression, t: Expression): Expression = copy(f, sE, t)
}

/** Column-API surface for the PQ kernels (broadcast-parameterized like
  * [[VectorFunctions.nearest_centroid]] — not SQL-registrable: the
  * codebooks are index artifacts, not values a query can spell). */
object PqFunctions {
  import org.apache.spark.sql.GraftShim.{column, expression}

  def pq_encode(vec: Column, centroidId: Column,
                centers: Broadcast[Array[Array[Double]]],
                codebooks: Broadcast[Array[Array[Array[Double]]]]): Column =
    column(PqEncode(expression(vec), expression(centroidId), centers, codebooks))

  def pq_adc_distance(codes: Column, centroidId: Column,
                      luts: Broadcast[Array[Array[Double]]], ksub: Int): Column =
    column(PqAdcDistance(expression(codes), expression(centroidId), luts, ksub))

  def pq_recon_error(vec: Column, centroidId: Column,
                     centers: Broadcast[Array[Array[Double]]],
                     codebooks: Broadcast[Array[Array[Array[Double]]]]): Column =
    column(PqReconError(expression(vec), expression(centroidId), centers, codebooks))

  def pq_asym_distance(qvec: Column, codes: Column, centroidId: Column,
                       centers: Broadcast[Array[Array[Double]]],
                       codebooks: Broadcast[Array[Array[Array[Double]]]]): Column =
    column(PqAsymDistance(expression(qvec), expression(codes),
      expression(centroidId), centers, codebooks))
}
