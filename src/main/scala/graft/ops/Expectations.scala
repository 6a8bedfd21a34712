package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality expectations — the dbt-test /
  * great-expectations pattern as ONE fused aggregate: every rule
  * compiles to a conditional-count expression over the same scan, so
  * auditing 50 expectations against a 100 TB table costs exactly one
  * pass (per-rule scans are how quality checks become the most
  * expensive job in a pipeline). Results come back as one row per
  * rule: (rule, col_name, n_violations, ok).
  *
  * Uniqueness is the one rule a projection cannot decide; two forms:
  *  - [[Unique]] — EXACT, fused as a count-distinct branch. One such
  *    rule already forces a full shuffle of every row on the audited
  *    key (two-phase keyed aggregate); with two or more, Spark plans
  *    expand+agg — every input row duplicated once per distinct branch
  *    — so N exact-Unique rules multiply the shuffled row volume
  *    N-fold at 100 TB. Still one scan of storage, but the widest
  *    audit shape (both stages asserted in ExpectationsSpec).
  *  - [[ApproxUnique]] — HyperLogLog++ (`approx_count_distinct`),
  *    which folds into the same plain hash aggregate as every other
  *    rule (no Expand node — asserted in ScaleSpec). At audit scale
  *    the question is "did uniqueness break materially", which the
  *    sketch answers at a fraction of the cost; `ok` concedes the
  *    estimator three standard deviations (duplicates <= 3*rsd*rows).
  */
object Expectations {

  sealed trait Rule {
    def name: String
    def column: String
  }
  /** Column must never be NULL. */
  final case class NotNull(column: String) extends Rule {
    val name = "not_null"
  }
  /** Column values must lie in [lo, hi] (NULLs count as violations). */
  final case class Between(column: String, lo: Double, hi: Double) extends Rule {
    val name = "between"
  }
  /** Column must match the regex (NULLs count as violations). */
  final case class Matches(column: String, regex: String) extends Rule {
    val name = "matches"
  }
  /** Column values must be members of the given set. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    val name = "in_set"
  }
  /** Column must be unique across the table (exact — see the expand
    * cost note in the object doc; prefer [[ApproxUnique]] for wide
    * audits over large tables). */
  final case class Unique(column: String) extends Rule {
    val name = "unique"
  }
  /** Column should be unique, judged by an HLL++ sketch with relative
    * standard deviation `rsd`: `n_violations` is the estimated
    * duplicate count (clamped at 0 — the estimator can overshoot the
    * true distinct count), `ok` tolerates THREE standard deviations of
    * estimator error (duplicates <= 3 * rsd * non-null rows — one rsd
    * would flag a perfectly unique column ~16% of the time). Unlike
    * [[Unique]] this compiles into the same single-pass hash aggregate
    * as every other rule — no Expand. */
  final case class ApproxUnique(column: String, rsd: Double = 0.05)
      extends Rule {
    require(rsd > 0 && rsd < 1, s"approx_unique rsd must be in (0,1): $rsd")
    val name = "approx_unique"
  }

  // coalesce: SUM over zero rows is NULL — an audit of an empty table
  // must report 0 violations / ok, matching the count-based rules
  private def violations(r: Rule): Column = r match {
    case NotNull(c) =>
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
    case Between(c, lo, hi) =>
      coalesce(sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L)
        .otherwise(0L)), lit(0L))
    case Matches(c, re) =>
      coalesce(sum(when(col(c).isNull || !col(c).rlike(re), 1L)
        .otherwise(0L)), lit(0L))
    case InSet(c, vs) =>
      coalesce(sum(when(col(c).isNull || !col(c).isin(vs: _*), 1L)
        .otherwise(0L)), lit(0L))
    case Unique(c) =>
      // duplicates = non-null rows minus distinct non-null values
      count(col(c)) - countDistinct(col(c))
    case ApproxUnique(c, rsd) =>
      greatest(count(col(c)) - approx_count_distinct(col(c), rsd), lit(0L))
  }

  /** One agg list + one result-struct list shared by both audit
    * shapes. ApproxUnique carries a second hidden aggregate (the
    * non-null row count) so its `ok` can scale the tolerance. */
  private def compile(rules: Seq[Rule]): (Seq[Column], Seq[Column]) = {
    require(rules.nonEmpty, "expectations: no rules given")
    val aggs = rules.zipWithIndex.flatMap {
      case (r @ ApproxUnique(c, _), i) => Seq(
        violations(r).cast("long").as(s"__v$i"),
        count(col(c)).cast("long").as(s"__n$i"))
      case (r, i) => Seq(violations(r).cast("long").as(s"__v$i"))
    }
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val ok = r match {
        case ApproxUnique(_, rsd) =>
          col(s"__v$i").cast("double") <= lit(3 * rsd) * col(s"__n$i")
        case _ => col(s"__v$i") === 0L
      }
      struct(lit(r.name).as("rule"), lit(r.column).as("col_name"),
        col(s"__v$i").as("n_violations"), ok.as("ok"))
    }
    (aggs, rows)
  }

  /** Audit `df` against `rules` in one aggregate pass. Returns one row
    * per rule: (rule, col_name, n_violations, ok), in rule order. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val (aggs, rows) = compile(rules)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("e"))
      .select(col("e.rule"), col("e.col_name"), col("e.n_violations"),
        col("e.ok"))
  }

  /** Per-group audit: the same fused single-pass aggregate, keyed by
    * `groupCol` — N rules over G groups still cost one scan and one
    * shuffle on the group key (the audit shape for "did quality break
    * in SOME segment/source/partition", where a global audit averages
    * the breakage away). Returns (groupCol, rule, col_name,
    * n_violations, ok), one row per group x rule. */
  def auditByGroup(df: DataFrame, groupCol: String,
      rules: Seq[Rule]): DataFrame = {
    val (aggs, rows) = compile(rules)
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), explode(array(rows: _*)).as("e"))
      .select(col(groupCol), col("e.rule"), col("e.col_name"),
        col("e.n_violations"), col("e.ok"))
  }

  /** Referential-integrity expectation — the one rule a single-table
    * pass cannot decide: count child rows whose key tuple has no match
    * in the parent (dbt's `relationships` test). SQL FK semantics
    * (MATCH SIMPLE): a tuple with ANY null component satisfies the
    * constraint and is skipped. Returns the same one-row
    * (rule, col_name, n_violations, ok) shape as [[audit]], so
    * cross-table rules `unionByName` into a single quality report.
    *
    * Scale shape: parent side is projected to its DISTINCT key tuples
    * before the LEFT ANTI join — a dimension-sized set Catalyst
    * broadcasts when it fits (the Lookup discipline); the child is
    * never shuffled wider than its key columns plus a count. */
  def foreignKey(child: DataFrame, parent: DataFrame,
      keys: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "foreignKey: no key columns given")
    val childKeys = keys.map(_._1)
    val nonNull = childKeys.map(col(_).isNotNull).reduce(_ && _)
    val parentKeys = parent
      .select(keys.map { case (c, p) => col(p).as(c) }: _*).distinct()
    val orphans = child.select(childKeys.map(col): _*).filter(nonNull)
      .join(parentKeys, childKeys, "left_anti")
    orphans.agg(count(lit(1)).as("n_violations"))
      .select(lit("foreign_key").as("rule"),
        lit(childKeys.mkString(",")).as("col_name"),
        col("n_violations"), (col("n_violations") === 0L).as("ok"))
  }

  /** Categorical distribution drift between a BASELINE frame and a
    * CURRENT frame — the Population Stability Index monitor a
    * production pipeline runs between corpus versions, ingest batches,
    * or train/serve slices before drift silently shifts a model's
    * input distribution. Per category of `keyCol`:
    * psi_term = (p_cur − p_base) · ln(p_cur / p_base), with add-alpha
    * smoothing over the UNION of categories so one-sided categories
    * stay finite; the total PSI is the sum (conventional read:
    * < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted).
    *
    * Scale shape: one wordcount-shaped aggregate per side keyed by
    * category, one outer join of two category-sized frames — never a
    * row-level join. Shares and psi terms round at 6 (the q127
    * discipline). Returns
    * (category, n_base, n_cur, share_base, share_cur, psi_term). */
  def distributionDrift(base: DataFrame, current: DataFrame,
      keyCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be positive: $alpha")
    def counts(df: DataFrame, out: String): DataFrame =
      df.groupBy(col(keyCol).cast("string").as("category"))
        .agg(count(lit(1)).as(out))
    // null-safe join: a NULL category is one category, not two
    // one-sided rows reporting phantom drift in both directions
    val b = counts(base, "n_base").alias("__dr_b")
    val c = counts(current, "n_cur").alias("__dr_c")
    val joined = b
      .join(c, col("__dr_b.category") <=> col("__dr_c.category"),
        "full_outer")
      .select(
        coalesce(col("__dr_b.category"), col("__dr_c.category"))
          .as("category"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // totals over the SMOOTHED masses: one category-bounded aggregate,
    // broadcast back as a single-row cross join (the audited benign
    // pattern) so shares are exact functions of exact counts
    val k = joined.agg(count(lit(1)).as("k"),
      sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    val withTot = joined.crossJoin(broadcast(k))
    val pB = (col("n_base") + lit(alpha)) /
      (col("tb") + lit(alpha) * col("k"))
    val pC = (col("n_cur") + lit(alpha)) /
      (col("tc") + lit(alpha) * col("k"))
    withTot.select(col("category"), col("n_base"), col("n_cur"),
      round(pB, 6).as("share_base"), round(pC, 6).as("share_cur"),
      round((pC - pB) * log(pC / pB), 6).as("psi_term"))
  }
}
