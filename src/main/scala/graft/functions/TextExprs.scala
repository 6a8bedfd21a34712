package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup pipeline. Semantics mirror the
  * composed-Column formulations they replace (split on a literal space
  * with trailing empties kept, xxhash64 seed 42), but run as ONE
  * compiled pass per row instead of Catalyst's interpreted
  * higher-order-function lambdas — the shingle + simhash lambdas were
  * ~9 s of bench time at sf0.1.
  */

/** Distinct k-gram token shingles of a text column, k-grams joined with
  * U+0001 — `token_shingles(text, k)` → `array<string>`. */
case class TokenShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_shingles expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override def nullSafeEval(input: Any): Any =
    TokenShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenShingles$$.MODULE$$.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

object TokenShingles {
  /** Shared by interpreted eval and generated Java (via MODULE$). */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    // split on literal space, trailing empties kept — same as Spark's
    // split(text, " ") (regex split with limit -1)
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val out = new mutable.LinkedHashSet[String]
    var i = 0
    val last = math.max(n - k, 0)
    while (i <= last) {
      val end = math.min(i + k, n)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append('\u0001')
        sb.append(toks(j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }
}

/** 64-bit SimHash over the whitespace token multiset: each token's
  * xxhash64 (seed 42, matching `functions.xxhash64`) votes ±1 on every
  * bit; the fingerprint keeps the majority sign — `simhash64(text)` →
  * `bigint`. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by interpreted eval and generated Java (via MODULE$). */
  private val space = UTF8String.fromString(" ")

  def compute(text: UTF8String): Long = {
    val toks = text.split(space, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XXH64.hashUTF8String(toks(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
