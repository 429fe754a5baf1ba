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
