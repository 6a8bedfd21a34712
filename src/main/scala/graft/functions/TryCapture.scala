package graft.functions

import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `try_capture(expr)` → `struct<value: T, error: string>`: evaluates
  * the child and captures any runtime error (ANSI cast overflow,
  * malformed input, raise_error, divide-by-zero) as data instead of
  * failing the task — the executing form of SSIS's per-component
  * error-row redirection (`errorRowDisposition=RedirectRow`), which the
  * reference only carries as XML metadata. Exactly one of the struct
  * fields is meaningful: `error` is NULL on success; on failure `value`
  * is NULL and `error` holds the exception summary (the ErrorCode/
  * ErrorColumn analog).
  *
  * Codegen wraps the child's generated code in a Java try/catch, so the
  * row stays inside whole-stage codegen on the success path. */
case class TryCapture(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("value", child.dataType),
    StructField("error", StringType)))
  override def nullable: Boolean = false
  override def prettyName: String = "try_capture"

  override def eval(input: InternalRow): Any =
    try {
      InternalRow(child.eval(input), null)
    } catch {
      case NonFatal(e) => InternalRow(null, TryCapture.describe(e))
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val rowClass = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
    val values = ctx.freshName("values")
    val t = ctx.freshName("t")
    val code =
      code"""
        |Object[] $values = new Object[2];
        |try {
        |  ${childGen.code}
        |  $values[0] = ${childGen.isNull} ? null : (Object) ${childGen.value};
        |  $values[1] = null;
        |} catch (Throwable $t) {
        |  $values[0] = null;
        |  $values[1] = graft.functions.TryCapture$$.MODULE$$.capture($t);
        |}
        |final InternalRow ${ev.value} = new $rowClass($values);
      """.stripMargin
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TryCapture =
    copy(child = newChild)
}

object TryCapture {
  /** Exception → compact message. */
  def describe(e: Throwable): UTF8String =
    UTF8String.fromString(
      e.getClass.getSimpleName + ": " +
        Option(e.getMessage).map(_.linesIterator.next()).getOrElse(""))

  /** Generated-code catch handler: NonFatal errors become data, fatal
    * VM errors (OOM, StackOverflow) rethrow — matching the interpreted
    * eval's NonFatal semantics. */
  def capture(t: Throwable): UTF8String =
    if (NonFatal(t)) describe(t) else throw t
}
