package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane sign-bit bucket: bit i of the result is
  * `dot(vec, planes(i)) > 0`. One pass over the vector per plane,
  * strict left-to-right accumulation — identical doubles (hence
  * identical buckets) to the composed
  * `aggregate(zip_with(vec, plane, *), 0.0, +)` HOF form it replaces,
  * which Catalyst cannot codegen (boxed lambda per element, per
  * plane). The plane matrix rides along as a literal in the plan, the
  * same way the broadcast side of a map-side join would at scale.
  *
  * Planes are held as `IndexedSeq` (value equality) so two
  * semantically identical LshBucket expressions canonicalize equal —
  * subexpression elimination and exchange reuse see through them; an
  * `Array` field would compare by reference. At most 63 planes: bit
  * 63 is the Long sign bit and `1L << p` wraps beyond it.
  */
case class LshBucket(child: Expression,
                     planes: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(planes.length <= 63,
    s"lsh_bucket supports at most 63 planes, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires array<float>/array<double>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  // hot-loop view of the plane matrix (the case-class field stays a
  // Seq for semantic equality)
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    var bucket = 0L
    var p = 0
    while (p < planeArr.length) {
      val plane = planeArr(p)
      var dot = 0.0
      var i = 0
      val n = math.min(dims, plane.length)
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      if (dot > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  // the expression is evaluated via a reference to `this` (the plane
  // matrix isn't worth inlining into generated java); the surrounding
  // pipeline stays codegen'd
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBucketExpr", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)

  override def prettyName: String = "lsh_bucket"
}
