package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-only set arithmetic over array<string> token/shingle sets:
  * the dedup verify joins (Jaccard, containment) only need |A∩B| and
  * |A∪B|, but `size(array_intersect(a, b))` materializes the whole
  * intersection array per candidate pair before counting it — on a
  * verify join evaluating millions of pairs against long shingle sets,
  * that allocation is the hot path. These expressions hash-count in
  * ONE pass per array and allocate nothing but the hash set. Element
  * NULLs are skipped (our token arrays never carry them); duplicate
  * elements count once — exactly `array_intersect`/`array_union`'s
  * set semantics, so swapping them in changes no result. */
abstract class StringSetBinary extends BinaryExpression {
  private def ok(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
}

/** `overlap_size(a, b)` → int: |set(a) ∩ set(b)|. */
case class OverlapSize(left: Expression, right: Expression)
    extends StringSetBinary {
  override def prettyName: String = "overlap_size"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetExprs.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetExprs$$.MODULE$$.overlap($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): OverlapSize = copy(left = l, right = r)
}

/** `jaccard_sets(a, b)` → double: |A∩B| / |A∪B| over element sets;
  * NULL when both sets are empty (matching `x / 0` division-null
  * semantics of the array_intersect/array_union formulation). */
case class JaccardSets(left: Expression, right: Expression)
    extends StringSetBinary {
  override def prettyName: String = "jaccard_sets"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    SetExprs.jaccardSets(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = graft.functions.SetExprs$$.MODULE$$.jaccardSets($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) r).doubleValue(); }
    """)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaccardSets = copy(left = l, right = r)
}

object SetExprs {
  /** |set(a) ∩ set(b)| — smaller side hashed, larger side probed;
    * matched elements are REMOVED from the set as they're counted, so
    * duplicate probe hits can't double-count and no second set is
    * allocated (this runs per candidate pair — allocation is the
    * point of the expression). */
  def overlap(a: ArrayData, b: ArrayData): Int = {
    val (s, l) = if (a.numElements <= b.numElements) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String](s.numElements * 2)
    var i = 0
    while (i < s.numElements) {
      val e = s.getUTF8String(i)
      if (e != null) set.add(e)
      i += 1
    }
    var cnt = 0
    i = 0
    while (i < l.numElements && !set.isEmpty) {
      val e = l.getUTF8String(i)
      if (e != null && set.remove(e)) cnt += 1
      i += 1
    }
    cnt
  }

  /** |A∩B| / |A∪B| over element sets, null when the union is empty. */
  def jaccardSets(a: ArrayData, b: ArrayData): Any = {
    val setA = new java.util.HashSet[UTF8String](a.numElements * 2)
    var i = 0
    while (i < a.numElements) {
      val e = a.getUTF8String(i)
      if (e != null) setA.add(e)
      i += 1
    }
    var nb = 0
    var inter = 0
    val setB = new java.util.HashSet[UTF8String](b.numElements * 2)
    i = 0
    while (i < b.numElements) {
      val e = b.getUTF8String(i)
      if (e != null && setB.add(e)) {
        nb += 1
        if (setA.contains(e)) inter += 1
      }
      i += 1
    }
    val union = setA.size + nb - inter
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
  }
}
