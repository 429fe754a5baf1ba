package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled one-pass kernels for the embedding-similarity hot path. The
  * higher-order-function forms (`aggregate(zip_with(a, b, …))`) are
  * INTERPRETED per lane — every ANN/dedup gate's dominant pair cost is the
  * cosine fold, the vector twin of the tokenization cost TextKernels
  * removed. Each kernel is one static call inside whole-stage codegen
  * running the IDENTICAL left-to-right double accumulation, so every
  * produced double is bit-equal to the HOF form's (proved lane-for-lane in
  * VectorKernelsSpec) and the DuckDB oracles' sequential folds still match.
  *
  * Null/shape contract, mirrored from the HOF forms exactly:
  *   - different lengths → NULL (zip_with pads the shorter side with null
  *     lanes, which nulls the interpreted fold)
  *   - any null lane → NULL
  *   - cosine of a zero-norm side → NULL (the `when(denom =!= 0.0, …)`
  *     guard — NULL sorts last under desc, which ranking callers want)
  *   - NaN/Inf lanes propagate NaN like the IEEE folds (callers keep their
  *     nanvl guards)
  */
object VectorKernels {

  /** (Σ aᵢ·bᵢ) / (√(Σ aᵢ²) · √(Σ bᵢ²)) — three independent left folds in
    * one pass; null per the contract above.
    */
  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = Math.sqrt(na) * Math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  /** Σ aᵢ·bᵢ as one left fold; null per the contract above. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y
      i += 1
    }
    java.lang.Double.valueOf(d)
  }

  /** √(Σ (aᵢ−bᵢ)²) as one left fold; null per the contract above. */
  def euclidean(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val diff = x - y
      s += diff * diff
      i += 1
    }
    java.lang.Double.valueOf(Math.sqrt(s))
  }

  /** Cosine over int8 CODE arrays: the dot and both squared norms are
    * exact BIGINT folds (per-lane long multiply-add — the HOF form's
    * x.cast(long)·y.cast(long) accumulation, wrap semantics included),
    * the final ratio one IEEE DOUBLE expression mirrored from the HOF:
    * denom = (double) aa · (double) bb, NULL when 0, else ab / √denom.
    * `aL`/`bL` select long vs int element reads.
    */
  def quantizedCosine(a: ArrayData, b: ArrayData, aL: Boolean, bL: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0L; var aa = 0L; var bb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aL) a.getLong(i) else a.getInt(i).toLong
      val y = if (bL) b.getLong(i) else b.getInt(i).toLong
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val denom = aa.toDouble * bb.toDouble
    if (denom == 0.0) null else java.lang.Double.valueOf(ab.toDouble / Math.sqrt(denom))
  }
}

/** Shared shape for the binary float/double-array kernels: both sides must
  * be array<float> or array<double> (checked at analysis — the HOF forms
  * would accept any numeric array, but every caller is an embedding
  * column), result is a nullable double.
  */
sealed trait VectorPairKernel extends BinaryExpression {
  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == FloatType || lt == DoubleType) &&
          (rt == FloatType || rt == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"(${other._1.simpleString}, ${other._2.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** Catalyst expression: bit-exact compiled cosine similarity (see
  * [[VectorKernels.cosine]] for the contract).
  */
case class CosineKernel(left: Expression, right: Expression) extends VectorPairKernel {
  override def prettyName: String = "graft_cosine_kernel"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("graftCos")
      s"""
      java.lang.Double $r = graft.operators.VectorKernels.cosine(
        $a, $b, ${isFloat(left)}, ${isFloat(right)});
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineKernel = copy(left = newLeft, right = newRight)
}

/** Catalyst expression: bit-exact compiled dot product (see
  * [[VectorKernels.dot]] for the contract).
  */
case class DotKernel(left: Expression, right: Expression) extends VectorPairKernel {
  override def prettyName: String = "graft_dot_kernel"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("graftDot")
      s"""
      java.lang.Double $r = graft.operators.VectorKernels.dot(
        $a, $b, ${isFloat(left)}, ${isFloat(right)});
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotKernel = copy(left = newLeft, right = newRight)
}

/** Catalyst expression: bit-exact compiled euclidean distance (see
  * [[VectorKernels.euclidean]] for the contract).
  */
case class EuclideanKernel(left: Expression, right: Expression) extends VectorPairKernel {
  override def prettyName: String = "graft_euclidean_kernel"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.euclidean(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("graftEuc")
      s"""
      java.lang.Double $r = graft.operators.VectorKernels.euclidean(
        $a, $b, ${isFloat(left)}, ${isFloat(right)});
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): EuclideanKernel = copy(left = newLeft, right = newRight)
}

/** Catalyst expression: bit-exact compiled quantized-code cosine (see
  * [[VectorKernels.quantizedCosine]] for the contract; int/long code
  * arrays).
  */
case class QuantizedCosineKernel(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isLong(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == IntegerType || lt == LongType) &&
          (rt == IntegerType || rt == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<INT|BIGINT> inputs, got " +
        s"(${other._1.simpleString}, ${other._2.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantized_cosine_kernel"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.quantizedCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isLong(left), isLong(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("graftQCos")
      s"""
      java.lang.Double $r = graft.operators.VectorKernels.quantizedCosine(
        $a, $b, ${isLong(left)}, ${isLong(right)});
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): QuantizedCosineKernel =
    copy(left = newLeft, right = newRight)
}
