package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketchBytes, term)` → long: point-query a serialized
  * count-min sketch from inside a projection, so a sketch readout over
  * a distributed term table never has to collect the vocabulary to the
  * driver. The sketch argument must be foldable (a literal of the
  * serialized sketch — ~width·depth·8 bytes, shipped once per task
  * like any broadcast scalar); it is deserialized once per executor
  * JVM (transient lazy) and the per-row cost is the sketch's own
  * depth-many hashed reads. The string path hashes UTF-8 bytes exactly
  * as Spark's `count_min_sketch` aggregate adds them, so estimates are
  * consistent with sketches built by the built-in aggregate.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects a binary sketch, got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "cms_estimate expects a foldable (literal) sketch argument")
    // a NULL sketch literal would otherwise pass analysis and NPE
    // opaquely inside the lazy deserialization during codegen
    else if (left.eval(null) == null)
      TypeCheckResult.TypeCheckFailure(
        "cms_estimate sketch argument must not be null")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects a string term, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  // One deserialization per executor JVM (the expression tree is
  // serialized into the task closure; lazy re-materializes locally).
  @transient private lazy val cms: CountMinSketch = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(sketch: Any, term: Any): Any =
    cms.estimateCount(term.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmsRef = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, (_, t) => s"$cmsRef.estimateCount($t.toString())")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
}
