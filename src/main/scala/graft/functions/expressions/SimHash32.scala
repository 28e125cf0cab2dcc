package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash over the distinct whitespace words of a document:
  * bit i of the fingerprint is the sign of Σ over distinct words of
  * (±1 by bit i of the word's 32-bit md5 prefix). Replaces a
  * `transform(sequence(0,31), aggregate(...))` HOF tree (32 interpreted
  * folds over the word array per document). Scores are exact integer
  * sums, so the result is order-independent and bit-identical to both
  * the composed form and the DuckDB oracle (d3).
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // implicit-cast inputs: simhash32(numeric_col) analyzes via cast
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.SimHash32.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(input: UTF8String): Long = {
    // limit -1 keeps trailing empty tokens — bit-identical to Spark's
    // split(text, " ") and DuckDB's string_split on texts with
    // trailing/double spaces
    val words = input.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](words.length * 2)
    val scores = new Array[Int](32)
    val md = digests.get()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (seen.add(word)) {
        md.reset()
        val d = md.digest(word.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 8 hex chars = first 4 digest bytes, unsigned
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var i = 0
        while (i < 32) {
          if (((h >>> i) & 1L) == 1L) scores(i) += 1 else scores(i) -= 1
          i += 1
        }
      }
      w += 1
    }
    var fp = 0L
    var i = 0
    while (i < 32) { if (scores(i) > 0) fp |= 1L << i; i += 1 }
    fp
  }
}
