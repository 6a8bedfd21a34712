package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Expectations._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType),
    StructField("tag", StringType)))
  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  test("audit counts every planted violation exactly, in one scan") {
    val df = frame(
      Row(1L, 5.0, "a-x"), Row(2L, 50.0, "b-y"), Row(2L, null, "zzz"),
      Row(null, -1.0, null), Row(4L, 9.0, "a-q"))
    val out = Expectations.audit(df, Seq(
        NotNull("id"),          // 1 null id
        Between("v", 0.0, 10.0), // -1.0 out, null counts, 50.0 out → 3
        Matches("tag", "^[ab]-"), // zzz + null → 2
        InSet("tag", Seq("a-x", "b-y", "a-q")), // zzz + null → 2
        Unique("id")))          // id=2 twice → 1 duplicate
      .select("rule", "col_name", "n_violations", "ok")
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(out("not_null") == ((1L, false)))
    assert(out("between") == ((3L, false)))
    assert(out("matches") == ((2L, false)))
    assert(out("in_set") == ((2L, false)))
    assert(out("unique") == ((1L, false)))
    // all-clean table → every rule ok
    val clean = Expectations.audit(
        frame(Row(1L, 5.0, "a-x"), Row(2L, 6.0, "b-y")),
        Seq(NotNull("id"), Unique("id"), Between("v", 0.0, 10.0)))
      .select("ok").as[Boolean].collect()
    assert(clean.forall(identity))
    // empty input: every rule reports 0 violations / ok (SUM over
    // zero rows is NULL without the coalesce — the pre-load check)
    val empty = Expectations.audit(frame(),
        Seq(NotNull("id"), Between("v", 0.0, 1.0), Unique("id")))
      .select("n_violations", "ok").as[(Long, Boolean)].collect()
    assert(empty.toSeq == Seq((0L, true), (0L, true), (0L, true)))
    // scale contract: the whole audit is ONE scan of the source
    val plan = Expectations.audit(df, Seq(
        NotNull("id"), Between("v", 0.0, 10.0), Unique("id")))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1, plan)
  }

  test("approx_unique judges material duplication without an Expand node") {
    // unique ids → ok; 60% duplicate tags → not ok (the estimated
    // duplicate count clears the 3-sigma line by a factor of ~4)
    val rows = (1L to 500L).map(i => Row(i, 1.0, s"t${i % 200}"))
    val df = frame(rows: _*)
    val out = Expectations.audit(df, Seq(
        ApproxUnique("id"), ApproxUnique("tag")))
      .select("col_name", "ok").as[(String, Boolean)].collect().toMap
    assert(out("id"), "unique column flagged as duplicated")
    assert(!out("tag"), "60% duplication not flagged")
    // the sketch folds into a plain hash aggregate: no Expand, one scan
    // (exact Unique in the same audit DOES plan an Expand — the cost
    // the approx rule exists to avoid)
    val approxPlan = Expectations.audit(df,
        Seq(NotNull("id"), ApproxUnique("id"), ApproxUnique("tag")))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
    assert("LocalTableScan".r.findAllIn(approxPlan).size == 1, approxPlan)
    assert(!approxPlan.contains("Exchange hashpartitioning"), approxPlan)
    // exact Unique costs: ONE distinct branch already forces a full
    // shuffle of every row on the audited key; TWO branches make
    // Spark expand each input row once per branch before aggregating
    val oneExact = Expectations.audit(df, Seq(NotNull("id"), Unique("id")))
      .queryExecution.executedPlan.toString
    assert(oneExact.contains("Exchange hashpartitioning"), oneExact)
    val twoExact = Expectations.audit(df, Seq(Unique("id"), Unique("tag")))
      .queryExecution.executedPlan.toString
    assert(twoExact.contains("Expand"), twoExact)
    // empty input: estimator reports 0 violations / ok
    val empty = Expectations.audit(frame(), Seq(ApproxUnique("id")))
      .select("n_violations", "ok").as[(Long, Boolean)].collect()
    assert(empty.toSeq == Seq((0L, true)))
  }

  test("auditByGroup fuses N rules x G groups into one keyed pass") {
    val df = frame(
      Row(1L, 5.0, "a"), Row(2L, -3.0, "a"), Row(2L, 7.0, "a"),
      Row(3L, 1.0, "b"), Row(null, 2.0, "b"))
    val out = Expectations.auditByGroup(df, "tag", Seq(
        NotNull("id"), Between("v", 0.0, 10.0), Unique("id")))
      .select("tag", "rule", "n_violations", "ok")
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("a", "not_null")) == ((0L, true)))
    assert(out(("a", "between")) == ((1L, false)))  // -3.0
    assert(out(("a", "unique")) == ((1L, false)))   // id=2 twice
    assert(out(("b", "not_null")) == ((1L, false))) // null id
    assert(out(("b", "between")) == ((0L, true)))
    assert(out(("b", "unique")) == ((0L, true)))    // null doesn't count
    assert(out.size == 6)
    // one scan feeding one keyed aggregate
    val plan = Expectations.auditByGroup(df, "tag", Seq(
        NotNull("id"), Between("v", 0.0, 10.0)))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1, plan)
  }

  test("distributionDrift: identical dists ~0, moved mass positive, one-sided finite") {
    def frame(cats: (String, Int)*) =
      cats.toSeq.flatMap { case (c, n) => Seq.fill(n)(c) }.toDF("src")
    // identical distributions: every psi term rounds to ~0 (alpha
    // smoothing leaves a tiny residue only if totals differ)
    val same = Expectations.distributionDrift(
        frame("a" -> 50, "b" -> 50), frame("a" -> 50, "b" -> 50), "src")
      .select("psi_term").as[Double].collect()
    assert(same.forall(t => math.abs(t) < 1e-6), same.toSeq.toString)
    // mass moved from a to b: both categories contribute positively
    // (sign of (pC-pB) matches sign of ln ratio)
    val moved = Expectations.distributionDrift(
        frame("a" -> 80, "b" -> 20), frame("a" -> 20, "b" -> 80), "src")
      .select("category", "psi_term").as[(String, Double)].collect().toMap
    assert(moved("a") > 0.1 && moved("b") > 0.1, moved.toString)
    // category present on one side only: smoothing keeps terms finite
    val oneSided = Expectations.distributionDrift(
        frame("a" -> 100), frame("a" -> 50, "zzz" -> 50), "src")
      .select("category", "psi_term").as[(String, Double)].collect().toMap
    assert(oneSided.size == 2 &&
      oneSided.values.forall(v => !v.isNaN && !v.isInfinite))
    assert(oneSided("zzz") > 0, "appearing category must contribute drift")
    // NULL is ONE category (null-safe join), not two phantom-drift rows
    def withNulls(nNull: Int, nA: Int) =
      (Seq.fill(nNull)(Option.empty[String]) ++
        Seq.fill(nA)(Option("a"))).toDF("src")
    val nullStable = Expectations.distributionDrift(
        withNulls(50, 50), withNulls(50, 50), "src").collect()
    assert(nullStable.length == 2, s"got ${nullStable.length} rows")
    assert(nullStable.forall(r => math.abs(r.getDouble(5)) < 1e-6),
      "identical null share must read as zero drift")
  }

  test("foreignKey: orphans counted, null tuples skipped, composite keys") {
    import spark.implicits._
    val parent = Seq((1, "a"), (2, "b")).toDF("pk", "pv")
    val child = Seq(
      (Some(1), "x"), // matches
      (Some(3), "x"), // orphan
      (None: Option[Int], "x"), // NULL fk -> MATCH SIMPLE, skipped
      (Some(3), "x")) // orphan again (counted per row)
      .toDF("fk", "cv")
    val r = Expectations.foreignKey(child, parent, Seq("fk" -> "pk"))
      .as[(String, String, Long, Boolean)].head()
    assert(r == (("foreign_key", "fk", 2L, false)))
    // composite: any-null component skips; both-non-null must match both
    val p2 = Seq((1, 10), (2, 20)).toDF("a", "b")
    val c2 = Seq(
      (Some(1), Some(10)), // matches
      (Some(1), Some(20)), // orphan (pair mismatch)
      (Some(1), None: Option[Int]), // skipped
      (None: Option[Int], Some(10))) // skipped
      .toDF("ca", "cb")
    val r2 = Expectations.foreignKey(c2, p2,
        Seq("ca" -> "a", "cb" -> "b"))
      .as[(String, String, Long, Boolean)].head()
    assert(r2 == (("foreign_key", "ca,cb", 1L, false)))
    // clean FK -> ok
    val r3 = Expectations.foreignKey(
        Seq(1, 2, 2).toDF("fk"), parent, Seq("fk" -> "pk"))
      .as[(String, String, Long, Boolean)].head()
    assert(r3 == (("foreign_key", "fk", 0L, true)))
  }
}
