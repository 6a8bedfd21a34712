package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over array<float>/array<double> embedding
  * columns: ONE compiled pass per row-pair instead of Catalyst's
  * interpreted aggregate/zip_with lambdas (cosine verification of ~1M
  * candidate pairs was ~100x slower interpreted). */
abstract class VecBinaryExpression extends BinaryExpression {
  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** `vec_dot(a, b)` → double. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecExprs$$.MODULE$$.dot($a, $b, $leftIsFloat, $rightIsFloat)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** `vec_cosine(a, b)` → double: dot and both norms in one pass. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_cosine"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecExprs$$.MODULE$$.cosine($a, $b, $leftIsFloat, $rightIsFloat)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

object VecExprs {
  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Ragged pairs are CORRUPT DATA, not a prefix to silently score —
    * a partial dot over the common dims looks plausible and can cross
    * similarity thresholds. Fail loudly (try_capture redirects if the
    * pipeline wants rows, not failures). */
  @inline private def sameLength(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"vec op on vectors of different lengths: $n vs ${b.numElements()}")
    n
  }

  /** Shared by interpreted eval and generated Java (via MODULE$). */
  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = sameLength(a, b)
    var s = 0.0
    var i = 0
    while (i < n) { s += get(a, i, af) * get(b, i, bf); i += 1 }
    s
  }

  /** Matches `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`. */
  def cosine(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = sameLength(a, b)
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, af); val y = get(b, i, bf)
      s += x * y; na += x * x; nb += y * y
      i += 1
    }
    s / (math.sqrt(na) * math.sqrt(nb))
  }
}
