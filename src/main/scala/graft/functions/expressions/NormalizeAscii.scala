package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass canonicalization for fingerprinting: lowercase ASCII
  * letters, keep [a-z0-9], collapse space runs to one, trim — byte-for-
  * byte identical to
  * `trim(regexp_replace(regexp_replace(lower(x), "[^a-z0-9 ]", ""), " +", " "))`
  * on ASCII text (non-ASCII bytes are dropped, which matches the regex
  * chain for any character whose lowercase form is still non-ASCII; an
  * exotic codepoint that lowercases INTO ASCII, like U+212A KELVIN
  * SIGN → 'k', would diverge — the corpus and the oracle are ASCII).
  *
  * Exists because the composed form runs two JDK regex passes per
  * evaluation (~30µs/doc) and join planning evaluates the join key in
  * both the null filter and the projection of BOTH sides — x4 measured
  * 4 evaluations deep in its plan. This is one byte scan, and the
  * static-call `doGenCode` keeps the pipeline in whole-stage codegen.
  */
case class NormalizeAscii(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NormalizeAscii.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NormalizeAscii.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeAscii =
    copy(child = newChild)

  override def prettyName: String = "normalize_ascii"
}

object NormalizeAscii {
  def compute(input: UTF8String): UTF8String = {
    val in = input.getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      val c: Byte =
        if (b >= 'A' && b <= 'Z') (b + 32).toByte
        else b
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        // emit one space for any pending run, but never leading
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = c; n += 1
      } else if (c == ' ') {
        pendingSpace = true
      }
      // anything else (incl. non-ASCII bytes) is dropped
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }
}
