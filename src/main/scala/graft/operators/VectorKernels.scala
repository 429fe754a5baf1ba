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
  * Two read paths per kernel, chosen at PLAN time by the expression:
  * the float/double fast path (two booleans, no per-lane dispatch), and a
  * generic numeric path (`…Any`, a DataType-driven accessor) preserving
  * the HOF forms' per-lane `cast("double")` / `cast("long")` acceptance of
  * int/decimal arrays — the kernels must not narrow the public API.
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

  /** Lane read matching `cast(x as double)` for every numeric element
    * type (exact for float/integral widening; Decimal.toDouble like Cast).
    */
  private def numAt(a: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case dt: DecimalType => a.getDecimal(i, dt.precision, dt.scale).toDouble
    case other => throw new IllegalArgumentException(s"non-numeric lane type $other")
  }

  /** Lane read matching `cast(x as long)` (truncating for fractional
    * types, like Cast).
    */
  private def longAt(a: ArrayData, i: Int, t: DataType): Long = t match {
    case LongType => a.getLong(i)
    case IntegerType => a.getInt(i).toLong
    case ShortType => a.getShort(i).toLong
    case ByteType => a.getByte(i).toLong
    case FloatType => a.getFloat(i).toLong
    case DoubleType => a.getDouble(i).toLong
    case dt: DecimalType => a.getDecimal(i, dt.precision, dt.scale).toLong
    case other => throw new IllegalArgumentException(s"non-numeric lane type $other")
  }

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

  def cosineAny(a: ArrayData, b: ArrayData, at: DataType, bt: DataType): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = numAt(a, i, at); val y = numAt(b, i, bt)
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

  def dotAny(a: ArrayData, b: ArrayData, at: DataType, bt: DataType): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      d += numAt(a, i, at) * numAt(b, i, bt)
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

  def euclideanAny(a: ArrayData, b: ArrayData, at: DataType, bt: DataType): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val diff = numAt(a, i, at) - numAt(b, i, bt)
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

  def quantizedCosineAny(a: ArrayData, b: ArrayData, at: DataType, bt: DataType): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0L; var aa = 0L; var bb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = longAt(a, i, at); val y = longAt(b, i, bt)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val denom = aa.toDouble * bb.toDouble
    if (denom == 0.0) null else java.lang.Double.valueOf(ab.toDouble / Math.sqrt(denom))
  }
}

/** Shared shape for the binary numeric-array kernels: both sides must be
  * arrays of any numeric element (checked at analysis; per-lane coercion
  * matches the HOF forms' casts), result is a nullable double. Subclasses
  * name the kernel and its fast-path lane types; the eval/codegen
  * scaffolding lives here ONCE — a fix to the null-handling template must
  * not need four copies.
  */
sealed trait VectorPairKernel extends BinaryExpression {
  /** VectorKernels static method name; `<name>Any` is the generic twin. */
  protected def kernelMethod: String
  /** Lane types served by the fast (boolean-flag) path. */
  protected def fastTypes: Set[DataType]
  /** The fast path's per-side flag (e.g. "is float" / "is long"). */
  protected def fastFlag(t: DataType): Boolean

  protected def elemType(e: Expression): DataType = e.dataType match {
    // NullType side: the value is always NULL, so the null-safe eval /
    // codegen branch never runs — DoubleType only keeps the (dead)
    // generated code compiling. ArrayType(NullType) side (array(NULL,
    // NULL), array()): every LANE is null, so the kernels' isNullAt-first
    // loops never read a lane — DoubleType only names a read that cannot
    // happen.
    case NullType | ArrayType(NullType, _) => DoubleType
    case t => t.asInstanceOf[ArrayType].elementType
  }
  private def fastPath: Boolean =
    fastTypes.contains(elemType(left)) && fastTypes.contains(elemType(right))

  // NullType and ArrayType(NullType) are accepted on either side,
  // matching the HOF forms these kernels replaced (type coercion folded
  // both into the fold): a bare NULL yields NULL; an all-null-lane array
  // yields NULL via the first-lane null check; an EMPTY array() runs the
  // empty fold exactly like the HOF — dot 0.0, euclidean 0.0, cosine /
  // quantizedCosine NULL (zero denominator). The kernels must not narrow
  // the public API, and a constant-NULL shortcut here would WIDEN it
  // (dot(array(), array()) is 0.0, not NULL).
  private def acceptsSide(t: DataType): Boolean = t match {
    case NullType => true
    case ArrayType(_: NumericType, _) | ArrayType(NullType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (acceptsSide(left.dataType) && acceptsSide(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric ARRAY inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ad, bd) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (fastPath)
      VectorKernelDispatch.fast(kernelMethod, ad, bd,
        fastFlag(elemType(left)), fastFlag(elemType(right)))
    else
      VectorKernelDispatch.any(kernelMethod, ad, bd, elemType(left), elemType(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // a NullType child would reach the kernel call as java Object (the
    // nullSafeCodeGen value slot for NullType), which does not COMPILE —
    // Janino would throw and silently knock the whole stage back to
    // interpreted execution. The value is constantly null, so emit the
    // constant instead of a kernel call.
    if (left.dataType == NullType || right.dataType == NullType)
      ExprCode.forNullValue(dataType)
    else nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("graftVec")
      val call =
        if (fastPath)
          s"graft.operators.VectorKernels.$kernelMethod($a, $b, " +
            s"${fastFlag(elemType(left))}, ${fastFlag(elemType(right))})"
        else {
          val lt = ctx.addReferenceObj("graftLType", elemType(left),
            "org.apache.spark.sql.types.DataType")
          val rt = ctx.addReferenceObj("graftRType", elemType(right),
            "org.apache.spark.sql.types.DataType")
          s"graft.operators.VectorKernels.${kernelMethod}Any($a, $b, $lt, $rt)"
        }
      s"""
      java.lang.Double $r = $call;
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }
      """
    })
}

/** Interpreted-eval dispatch for the trait (codegen calls the statics
  * directly; this keeps the non-codegen path free of reflection).
  */
private[operators] object VectorKernelDispatch {
  def fast(m: String, a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): java.lang.Double =
    m match {
      case "cosine" => VectorKernels.cosine(a, b, fa, fb)
      case "dot" => VectorKernels.dot(a, b, fa, fb)
      case "euclidean" => VectorKernels.euclidean(a, b, fa, fb)
      case "quantizedCosine" => VectorKernels.quantizedCosine(a, b, fa, fb)
    }
  def any(m: String, a: ArrayData, b: ArrayData, at: DataType, bt: DataType): java.lang.Double =
    m match {
      case "cosine" => VectorKernels.cosineAny(a, b, at, bt)
      case "dot" => VectorKernels.dotAny(a, b, at, bt)
      case "euclidean" => VectorKernels.euclideanAny(a, b, at, bt)
      case "quantizedCosine" => VectorKernels.quantizedCosineAny(a, b, at, bt)
    }
}

/** The double-accumulating kernels' fast path serves float/double lanes
  * (flag = "is float").
  */
sealed trait DoubleVectorKernel extends VectorPairKernel {
  override protected val fastTypes: Set[DataType] = Set(FloatType, DoubleType)
  override protected def fastFlag(t: DataType): Boolean = t == FloatType
}

/** Catalyst expression: bit-exact compiled cosine similarity (see
  * [[VectorKernels.cosine]] for the contract).
  */
case class CosineKernel(left: Expression, right: Expression) extends DoubleVectorKernel {
  override def prettyName: String = "graft_cosine_kernel"
  override protected def kernelMethod: String = "cosine"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineKernel = copy(left = newLeft, right = newRight)
}

/** Catalyst expression: bit-exact compiled dot product (see
  * [[VectorKernels.dot]] for the contract).
  */
case class DotKernel(left: Expression, right: Expression) extends DoubleVectorKernel {
  override def prettyName: String = "graft_dot_kernel"
  override protected def kernelMethod: String = "dot"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotKernel = copy(left = newLeft, right = newRight)
}

/** Catalyst expression: bit-exact compiled euclidean distance (see
  * [[VectorKernels.euclidean]] for the contract).
  */
case class EuclideanKernel(left: Expression, right: Expression) extends DoubleVectorKernel {
  override def prettyName: String = "graft_euclidean_kernel"
  override protected def kernelMethod: String = "euclidean"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): EuclideanKernel = copy(left = newLeft, right = newRight)
}

/** Catalyst expression: bit-exact compiled quantized-code cosine (see
  * [[VectorKernels.quantizedCosine]] for the contract); the fast path
  * serves int/long code arrays (flag = "is long"), other numeric lanes
  * take the generic cast-to-long path like the HOF's x.cast("long").
  */
case class QuantizedCosineKernel(left: Expression, right: Expression)
    extends VectorPairKernel {
  override def prettyName: String = "graft_quantized_cosine_kernel"
  override protected def kernelMethod: String = "quantizedCosine"
  override protected val fastTypes: Set[DataType] = Set(IntegerType, LongType)
  override protected def fastFlag(t: DataType): Boolean = t == LongType
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): QuantizedCosineKernel =
    copy(left = newLeft, right = newRight)
}

/** Row-local quantization/projection kernels — the map-side cost of the
  * int8 storage path ([[graft.functions.VectorFunctions.quantizeInt8]] /
  * `signProject`), previously interpreted transform/zip_with/aggregate
  * stacks per row. Bit-compat contracts mirrored lane-for-lane from the
  * HOF forms (VectorKernelsSpec replays them, adversarial shapes
  * included):
  *
  * quantizeInt8: amax = null-skipping max of |x| with NaN-greatest
  * ordering (null for an empty/all-null vector); codes = all-zero when
  * amax == 0.0; otherwise per lane floor(x·127/amax + 0.5) through
  * double→long→int exactly like FLOOR + CAST (null lanes stay null; a
  * NaN amax zeroes finite lanes the way the HOF's NaN arithmetic did).
  *
  * signProject: NULL unless the code vector has exactly `dim` non-null
  * lanes; otherwise outDims exact BIGINT accumulators over the ±1 matrix.
  */
object VectorRowKernels {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def quantizeInt8(vec: ArrayData, aF: Boolean): InternalRow = {
    val n = vec.numElements()
    var amax = 0.0; var seen = false; var hasNaN = false
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val v = Math.abs(if (aF) vec.getFloat(i).toDouble else vec.getDouble(i))
        if (java.lang.Double.isNaN(v)) hasNaN = true
        else if (!seen || v > amax) amax = v
        seen = true
      }
      i += 1
    }
    if (!seen) {
      // empty or all-null lanes: array_max is null, and the HOF's
      // otherwise-branch zip_with against array_repeat(null, n) yields n
      // null code lanes (an EMPTY codes array for an empty vector) — not
      // a null codes field
      return new GenericInternalRow(Array[Any](null,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](n))))
    }
    val m = if (hasNaN) Double.NaN else amax
    val codes = new Array[Any](n)
    if (m == 0.0) {
      // the HOF's constant-lambda transform zeroes EVERY position,
      // null lanes included
      i = 0
      while (i < n) { codes(i) = 0; i += 1 }
    } else {
      i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) {
          val x = if (aF) vec.getFloat(i).toDouble else vec.getDouble(i)
          // FLOOR(double) -> BIGINT -> CAST INT, exactly (NaN -> 0L -> 0;
          // infinities saturate at Long then wrap to Int like Cast)
          codes(i) = Math.floor(x * 127.0 / m + 0.5).toLong.toInt
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](m, new GenericArrayData(codes)))
  }

  def signProject(codes: ArrayData, signs: Array[Array[Long]],
                  intElems: Boolean): GenericArrayData = {
    val outDims = signs.length
    val dim = signs(0).length
    if (codes.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (codes.isNullAt(i)) return null
      i += 1
    }
    val acc = new Array[Long](outDims)
    i = 0
    while (i < dim) {
      val c = if (intElems) codes.getInt(i).toLong else codes.getLong(i)
      var j = 0
      while (j < outDims) { acc(j) += c * signs(j)(i); j += 1 }
      i += 1
    }
    new GenericArrayData(acc.map(v => java.lang.Long.valueOf(v): Any))
  }
}

/** Catalyst expression: compiled [[VectorRowKernels.quantizeInt8]] —
  * struct(amax double, codes array<int>).
  */
case class QuantizeInt8Kernel(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false // incl. NullType: value is always NULL, branch is dead
  }
  // NullType accepted (yields NULL) — the kernel must not narrow the
  // HOF form it replaced, which coerced an untyped NULL and returned NULL.
  // ArrayType(NullType) (array(NULL, NULL), array()) is accepted too and
  // flows through the NORMAL eval/codegen path: all lanes are null, so
  // the !seen branch reproduces the HOF result exactly — struct(null
  // amax, n null code lanes), which a constant-NULL shortcut would get
  // WRONG (the HOF returns a non-null struct here, not NULL).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | NullType, _) | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("amax", DoubleType), StructField("codes", ArrayType(IntegerType))))
  override def prettyName: String = "graft_quantize_int8_kernel"
  override def nullSafeEval(input: Any): Any =
    VectorRowKernels.quantizeInt8(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // NullType child: see VectorPairKernel — emit the constant, never a
    // kernel call whose Object-typed argument would not compile
    if (child.dataType == NullType) ExprCode.forNullValue(dataType)
    else nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.operators.VectorRowKernels.quantizeInt8($v, $isFloat);
    """)
  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Kernel =
    copy(child = newChild)
}

/** Catalyst expression: compiled [[VectorRowKernels.signProject]] — the
  * ±1 matrix rides as a plan reference; output array<bigint>, NULL per
  * the guard contract.
  */
case class SignProjectKernel(child: Expression, signs: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(signs.nonEmpty && signs.map(_.length).distinct.length == 1,
    "signs must be a non-empty rectangular matrix")
  private def isInt: Boolean = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false // incl. NullType: value is always NULL, branch is dead
  }
  // NullType accepted (yields NULL) — same no-narrowing rule as above.
  // ArrayType(NullType) flows through the normal path: signProject's own
  // guard NULLs any vector that is not exactly `dim` non-null lanes, which
  // an all-null or empty array never is.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType | NullType, _) | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<INT|BIGINT> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sign_project_kernel"
  override def nullSafeEval(input: Any): Any =
    VectorRowKernels.signProject(input.asInstanceOf[ArrayData], signs, isInt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // NullType child: see VectorPairKernel — emit the constant, never a
    // kernel call whose Object-typed argument would not compile
    if (child.dataType == NullType) ExprCode.forNullValue(dataType)
    else nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("graftSigns", signs, "long[][]")
      s"""
      ${ev.value} = graft.operators.VectorRowKernels.signProject($v, $m, $isInt);
      if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })
  override protected def withNewChildInternal(newChild: Expression): SignProjectKernel =
    copy(child = newChild)
}
