package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric arrays (float or double
  * elements), accumulating in double, strict left-to-right — the same
  * loop [[CosineSim]] runs, minus the two norm accumulators. Exists so
  * the pairwise operators can precompute each side's norm ONCE per row
  * (`sqrt(DotProduct(v, v))` — identical accumulation order to
  * CosineSim's internal norms) and pay only the dot per PAIR:
  * `round(dot/(norm_a*norm_b), 6)` is bit-equal to
  * `round(CosineSim(a, b), 6)` while doing a third of the arithmetic
  * in the O(pairs) hot loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"DotProduct: bad input type $t")
  }
  private lazy val leftFloat = elemIsFloat(left)
  private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // equal lengths required: silently truncating to min(len) would let
    // sqrt(DotProduct(v, v)) norms (full-vector) diverge from the fused
    // CosineSim on ragged inputs, breaking the bit-equality contract
    if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
      s"dot_product: vector lengths differ (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getX = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("dot_product: vector lengths differ ("
         |    + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ($getX) * ($getY);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)

  override def prettyName: String = "dot_product"
}
