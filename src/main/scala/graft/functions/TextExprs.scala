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

/** Hash-ordered prefix for PPJoin-style Jaccard prefix filtering:
  * sorts the (pre-distinct) token array by (xxhash64(token), token) —
  * a pseudo-random global total order — and keeps the first
  * `n - ceil(t*n) + 1` elements. One compiled pass replaces the
  * interpreted array_sort-of-structs + slice formulation —
  * `jaccard_prefix(tokens, t)` → `array<string>`. */
case class JaccardPrefix(child: Expression, threshold: Double) extends UnaryExpression {
  require(threshold > 0.0 && threshold <= 1.0, "threshold in (0,1]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jaccard_prefix expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "jaccard_prefix"

  override def nullSafeEval(input: Any): Any =
    JaccardPrefix.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JaccardPrefix$$.MODULE$$.compute($c, $threshold)")

  override protected def withNewChildInternal(newChild: Expression): JaccardPrefix =
    copy(child = newChild)
}

object JaccardPrefix {
  /** Shared by interpreted eval and generated Java (via MODULE$).
    * Ordering matches `array_sort(struct(xxhash64(tok), tok))`:
    * by hash, ties by token. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      threshold: Double): GenericArrayData = {
    // null elements are skipped (the replaced Column formulation
    // tolerated them); prefix length still derives from the FULL array
    // size so the bound matches the verification's set size
    val n = arr.numElements()
    val toks = Array.newBuilder[UTF8String]
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) toks += arr.getUTF8String(i)
      i += 1
    }
    val ts = toks.result()
    val hashes = ts.map(XXH64.hashUTF8String(_, 42L))
    val order = ts.indices.sortWith { (a, b) =>
      if (hashes(a) != hashes(b)) hashes(a) < hashes(b)
      else ts(a).compareTo(ts(b)) < 0
    }
    // epsilon before ceil: threshold*n can round UP past the exact
    // product (0.9*10 → 9.000000000000002 → ceil 10, prefix one too
    // short), while the verify filter compares sim >= threshold in
    // rounded doubles — a boundary pair would pass the filter but be
    // pruned here. The guard only ever ENLARGES the prefix: lossless.
    val prefLen = math.min(ts.length,
      n - math.ceil(threshold * n - 1e-9).toInt + 1)
    new GenericArrayData(
      order.take(math.max(prefLen, 0)).map(ts(_): Any).toArray)
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
