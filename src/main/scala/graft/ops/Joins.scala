package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Beyond-equi joins. The reference's joins are equality-only (every
  * generated condition is `left == right`,
  * mapping/enhanced_json_mapper.py:2717,1892) and Spark ships no
  * operator for either shape — both are composed scale-first from
  * relational primitives rather than naive theta-joins.
  */
object Joins {

  /** As-of join: for each left row, the single most recent right row
    * with rightTime <= leftTime on the same keys — the point-in-time
    * enrichment every feature/training pipeline needs.
    *
    * NOT executed as a range join: both sides are tagged and unioned,
    * then ONE window pass per key carries the latest right payload
    * forward to each left row. That is one shuffle on the keys and one
    * sort — the minimum possible exchange for the semantics — with
    * zero candidate explosion regardless of how many right rows
    * precede a left row. (A join-then-rank plan would fan out
    * |left| × |matching right| candidate rows before pruning.)
    *
    * `select`: (rightColumn, outputAlias) payload appended to each
    * left row — null when no right row precedes it. `rightTieBreak`:
    * among right rows sharing identical (keys, time) the one with the
    * LARGEST tie-break value wins, making the result deterministic;
    * without it such ties pick an arbitrary winner. Equal timestamps
    * match (<=, the usual as-of convention).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      select: Seq[(String, String)],
      rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val aliases = select.map(_._2)
    require(aliases.distinct.size == aliases.size &&
      !aliases.exists(leftCols.contains),
      s"asofJoin: output aliases $aliases collide")
    val lSchema = left.schema
    val rSchema = right.schema
    val timeType = lSchema(leftTime).dataType
    // tie-break keeps its NATIVE type (string/timestamp/decimal all
    // order correctly); left rows carry a typed null — their relative
    // order at equal (keys, time) is irrelevant, each sees the same
    // carried right payload
    val tieType = rightTieBreak.map(c => rSchema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val lPass = leftCols.filterNot(keys.contains)
    // a shared tagged schema: keys, time, side (right sorts before left
    // at equal time => <= semantics), tie-break, left pass-through
    // (typed nulls on the right side), right payload (nulls on the left)
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(tieType).as("__tie")) ++
        lPass.map(col) ++
        select.map { case (c, a) =>
          lit(null).cast(rSchema(c).dataType).as(s"__r_$a") }: _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).cast(timeType).as("__t"), lit(0).as("__side"),
          rightTieBreak.map(col).getOrElse(lit(0L).cast(tieType))
            .as("__tie")) ++
        lPass.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
        select.map { case (c, a) => col(c).as(s"__r_$a") }: _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = select.foldLeft(lTagged.unionByName(rTagged)) {
      case (df, (_, a)) =>
        df.withColumn(a, last(col(s"__r_$a"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ aliases.map(col): _*)
  }

  /** Range (band) join: each fact row matched to the band rows whose
    * half-open interval [lo, hi) contains its value.
    *
    * Executed as an EQUI-join on integer buckets of width `step`: each
    * band is replicated to the buckets its interval covers, each fact
    * row computes its single bucket, and the exact range predicate
    * filters the bucket-local candidates. Never a cross join — the
    * shuffle is an ordinary hash exchange on the bucket key, and
    * per-fact candidate fan-out is the number of bands overlapping one
    * bucket. Pick `step` near the typical band width so both the band
    * replication factor and the per-bucket fan-out stay O(1).
    */
  def bandJoin(facts: DataFrame, bands: DataFrame, valueCol: String,
      loCol: String, hiCol: String, step: Double): DataFrame = {
    require(step > 0, s"bandJoin: step must be positive, got $step")
    val b = bands.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol).cast("double") / step).cast("long"),
        floor(col(hiCol).cast("double") / step).cast("long"))))
    facts
      .withColumn("__bucket",
        floor(col(valueCol).cast("double") / step).cast("long"))
      .join(b, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
