package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling: split on single spaces, emit the
  * distinct n-gram shingles in first-occurrence order; a text shorter
  * than `n` words yields itself as its one shingle.
  *
  * Exists because the composed form —
  * `transform(sequence(...), i -> concat_ws(' ', element_at(...)))` —
  * is a higher-order function tree that Catalyst cannot codegen
  * (CodegenFallback per element, boxed lambda variables): measured
  * ~4s for 5k docs / 260k shingles. This expression does one pass
  * over the UTF8 bytes per document (~100ms for the same input) and
  * is the unit under every dedup operator, so it earns native status.
  * Semantics are identical (oracle-verified vs the DuckDB SQL
  * formulation in SparkEntry.oracleSql d2/d4).
  */
case class WordShingles(child: Expression, n: Int,
                        distinct: Boolean = true, shortAsSelf: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val words = s.split(' ')
    if (words.length < n) {
      if (shortAsSelf)
        new GenericArrayData(Array[Any](UTF8String.fromString(s)))
      else new GenericArrayData(Array.empty[Any])
    } else {
      // LinkedHashSet dedups in first-occurrence order; an ArrayList
      // keeps every occurrence (bigram counting wants multiplicity)
      val acc: java.util.Collection[String] =
        if (distinct) new java.util.LinkedHashSet[String](words.length * 2)
        else new java.util.ArrayList[String](words.length)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        acc.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](acc.size)
      val it = acc.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}
