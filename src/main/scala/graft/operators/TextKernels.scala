package graft.operators

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-scan text kernels for the hot tokenization path. `split(text,
  * "\\s+")` plus a `filter` lambda pays a regex NFA loop and an
  * interpreted higher-order function per row — measured ~1.5× on the
  * tokenization-dominated gate queries; this single-pass ASCII scan with a
  * static-call codegen does the same work inside whole-stage codegen.
  *
  * Whitespace set is RE2's `\s` — space, \t, \n, \f, \r — exactly what the
  * DuckDB oracle's `regexp_split_to_array(text, '\s+')` splits on. (Java's
  * `\s` additionally includes \x0B vertical tab; we standardize on the
  * RE2 set so both engines tokenize identically.) UTF-8 safe by
  * construction: multi-byte sequences never contain ASCII bytes, so a
  * byte-level scan cannot split inside a character.
  */
object TextKernels {

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0C || b == 0x0D

  /** Whitespace tokens with empties dropped (runs of separators collapse,
    * leading/trailing separators yield nothing).
    */
  def splitWhitespace(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var start = -1
    while (i < b.length) {
      if (isWs(b(i))) {
        if (start >= 0) { out += UTF8String.fromBytes(b, start, i - start); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out += UTF8String.fromBytes(b, start, b.length - start)
    new GenericArrayData(out.toArray)
  }

  private val Space = UTF8String.fromString(" ")
  private val GSentinel = UTF8String.fromString("g")

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".toCharArray

  /** Lowercase-hex md5 of `bytes` as 32 ASCII bytes — byte-identical to
    * Spark's `md5()` / DuckDB's `md5()` string output.
    */
  private def md5HexBytes(bytes: Array[Byte]): Array[Byte] = {
    val d = mdLocal.get(); d.reset()
    val h = d.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((h(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = Hex(h(i) & 0xF).toByte
      i += 1
    }
    out
  }

  /** k-token shingles of a token array, space-joined — the exact output of
    * `transform(sequence(1, n-k+1), i -> array_join(slice(t, i, k), ' '))`
    * with the size<k empty-array guard, in one allocation-light pass.
    */
  def tokenShingles(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
                    k: Int): GenericArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused shingle→distinct→hash→slice-minima: the
    * `sliceMinima(shingles(text, k), n, 8)` pipeline (TextFunctions) in ONE
    * Java pass — distinct k-gram shingles hashed by md5(s) (width ≤ 32 hex)
    * or md5(s)‖md5(s‖"#") (chained digest, width ≤ 64), running per-slice
    * byte minima over the 8-hex windows. The interpreted-HOF fold this
    * replaces allocates a transform(sequence)+zip_with accumulator per
    * ITEM; here the accumulator is n reused 8-byte arrays. "g" stays the
    * fold's +infinity (every hex byte < 'g'), so an item-less row returns
    * all-"g" minima exactly like the fold, and bandsFromMinima's NULL
    * guard fires identically.
    */
  def shingleSliceMinima(tokens: org.apache.spark.sql.catalyst.util.ArrayData,
                         shingleK: Int, n: Int, len: Int): GenericArrayData = {
    val width = n * len
    val nTok = tokens.numElements()
    val minima = new Array[Array[Byte]](n) // null = still "g"
    if (nTok >= shingleK) {
      val seen = new java.util.HashSet[UTF8String]()
      val parts = new Array[UTF8String](shingleK)
      var i = 0
      while (i <= nTok - shingleK) {
        var j = 0
        while (j < shingleK) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        val sh = UTF8String.concatWs(Space, parts: _*)
        if (seen.add(sh)) {
          val b = sh.getBytes
          val hex: Array[Byte] =
            if (width <= 32) md5HexBytes(b)
            else {
              val h1 = md5HexBytes(b)
              val b2 = java.util.Arrays.copyOf(b, b.length + 1)
              b2(b.length) = '#'
              val h2 = md5HexBytes(b2)
              val c = new Array[Byte](64)
              System.arraycopy(h1, 0, c, 0, 32)
              System.arraycopy(h2, 0, c, 32, 32)
              c
            }
          var s = 0
          while (s < n) {
            val off = s * len
            val cur = minima(s)
            var cmp = if (cur == null) -1 else 0
            var p = 0
            while (cmp == 0 && p < len) { // hex is ASCII: byte order = string order
              cmp = java.lang.Byte.compare(hex(off + p), cur(p))
              p += 1
            }
            if (cmp < 0) {
              val slice = new Array[Byte](len)
              System.arraycopy(hex, off, slice, 0, len)
              minima(s) = slice
            }
            s += 1
          }
        }
        i += 1
      }
    }
    val out = new Array[Any](n)
    var s = 0
    while (s < n) {
      out(s) = if (minima(s) == null) GSentinel
               else UTF8String.fromBytes(minima(s))
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression: string -> array<string> of whitespace tokens,
  * empties dropped. One static call in generated code — stays inside
  * whole-stage codegen like the image decoders.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    TextKernels.splitWhitespace(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.operators.TextKernels.splitWhitespace($s);
    """)

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

/** Catalyst expression: array<string> tokens -> array<string> of k-token
  * space-joined shingles (empty below k tokens). Replaces the interpreted
  * `transform(sequence(..), i -> array_join(slice(..)))` stack with one
  * static call that stays inside whole-stage codegen.
  */
case class TokenShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle width k >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenShingles(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = graft.operators.TextKernels.tokenShingles($t, $k);
    """)
  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

/** Catalyst expression: array<string> tokens -> the n 8-hex slice minima of
  * chained-md5 digests over the DISTINCT k-token shingles — the fused hot
  * loop of the banded-MinHash family (see TextKernels.shingleSliceMinima
  * for the bit-compat contract with TextFunctions.sliceMinima).
  */
case class ShingleSliceMinima(child: Expression, shingleK: Int, n: Int,
                              sliceLen: Int) extends UnaryExpression {
  require(shingleK >= 1 && n >= 1 && sliceLen >= 1 && n * sliceLen <= 64,
    "at most two chained md5 digests of slices")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_slice_minima"
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleSliceMinima(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      shingleK, n, sliceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = graft.operators.TextKernels.shingleSliceMinima($t, $shingleK, $n, $sliceLen);
    """)
  override protected def withNewChildInternal(newChild: Expression): ShingleSliceMinima =
    copy(child = newChild)
}
