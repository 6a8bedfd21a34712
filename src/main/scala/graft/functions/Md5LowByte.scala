package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_low_byte(s)` → int 0..255: the last byte of md5(s), unsigned.
  * Exactly equal to parsing the last two hex characters of the md5
  * hex string — the engine-portable md5-parity discipline (CDC
  * boundaries, split buckets) without allocating and substring-ing a
  * 32-char hex string per token: the built-in formulation runs
  * md5 → hex-encode → substring → instr per element; this runs the
  * digest and reads one byte. */
case class Md5LowByte(child: Expression) extends UnaryExpression {
  override def prettyName: String = "md5_low_byte"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_low_byte expects string, got ${child.dataType.catalogString}")
  override def nullSafeEval(s: Any): Any =
    Md5LowByte.lowByte(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.Md5LowByte$$.MODULE$$.lowByte($s)")
  override protected def withNewChildInternal(c: Expression): Md5LowByte =
    copy(child = c)
}

object Md5LowByte {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def lowByte(s: UTF8String): Int = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    digest(15) & 0xFF
  }
}
