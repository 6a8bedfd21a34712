package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native MinHash signature: `numHashes` minima over a set of string
  * shingles, computed in ONE compiled pass per row.
  *
  * The composed-Column formulation (64 × `array_min(transform(sh,
  * s => xxhash64(lit(i), s)))`) re-hashes every *string* shingle per
  * hash function through Catalyst's interpreted higher-order-function
  * path — measured 43 s of a 74 s query at sf0.1. Here each shingle is
  * hashed once (`XXH64.hashUTF8String`) and the H hash functions are
  * cheap `XXH64.hashLong` permutations of that base in a tight loop:
  * the same signature quality at ~100× less cost, and `doGenCode`
  * keeps the row inside whole-stage codegen.
  *
  * Reference has no MinHash at all (fuzzy grouping is recognize-only,
  * data_engineering_parser.py:1114); this is the scale path for it.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig$$.MODULE$$.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private final val BaseSeed = 0x9747b28cL

  /** Shared by interpreted eval and generated Java (via MODULE$). */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = XXH64.hashUTF8String(arr.getUTF8String(i), BaseSeed)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashLong(base, j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API: `minhash_sig(shingles, 64)` → `array<long>`.
    * Resolves through the session function registry — the session must
    * be built with [[GraftExtensions]]. */
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    call_function("minhash_sig", shingles, lit(numHashes))
}
