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
  * Uniqueness is the one rule a projection cannot decide; it runs as
  * an EXTRA count-distinct branch fused into the same aggregate
  * (Spark plans multi-distinct aggregates as a single expand+agg —
  * still one scan of the source).
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
  /** Column must be unique across the table. */
  final case class Unique(column: String) extends Rule {
    val name = "unique"
  }

  // coalesce: SUM over zero rows is NULL — an audit of an empty table
  // must report 0 violations / ok, matching the count-based Unique rule
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
  }

  /** Audit `df` against `rules` in one aggregate pass. Returns one row
    * per rule: (rule, col_name, n_violations, ok), in rule order. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations: no rules given")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      violations(r).cast("long").as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), lit(r.column).as("col_name"),
        col(s"__v$i").as("n_violations"),
        (col(s"__v$i") === 0L).as("ok"))
    }
    one.select(explode(array(rows: _*)).as("e"))
      .select(col("e.rule"), col("e.col_name"), col("e.n_violations"),
        col("e.ok"))
  }
}
