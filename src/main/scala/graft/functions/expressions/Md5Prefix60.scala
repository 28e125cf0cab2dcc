package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 60-bit md5 prefix as a long: identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)` (and the DuckDB oracle's
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`) — the first 15 hex chars
  * are the first 7.5 digest bytes, i.e. the first 8 bytes big-endian
  * shifted right a nibble. Always non-negative (fits 60 bits).
  *
  * Exists because the composed form materializes a 32-char hex string
  * and re-parses it per row — pure allocation churn on the dedup hot
  * path, where this runs once per (doc, shingle) posting. Here the
  * digest goes straight to a long; `doGenCode` is a static call so the
  * surrounding pipeline stays in whole-stage codegen.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // implicit-cast inputs so SQL-registered md5_prefix60(numeric_col)
  // analyzes like the composed conv(substring(md5(x))) form would
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Md5Prefix60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix60"
}

object Md5Prefix60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(input: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(input.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
