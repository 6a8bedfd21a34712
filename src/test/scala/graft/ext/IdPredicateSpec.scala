package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bounded-plan contract behind the index re-rank reads: however
  * large the collected candidate id set grows (|queries|·pool at a
  * production batch), the scan predicate stays ≤ maxRanges intervals —
  * the r17-verdict "isin literal grows with the batch" hazard, killed
  * structurally. Coverage is a superset (callers re-join exactly);
  * endpoints are tight; non-rangeable id types opt out loudly. */
class IdPredicateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plan size is constant in the id count: 100x more ids, same " +
      "range budget; every id stays covered; endpoints are tight") {
    val rnd = new scala.util.Random(7)
    def sample(n: Int): Seq[Long] =
      Seq.fill(n)(rnd.nextLong() % 10000000L).distinct.sorted
    val small = sample(1000)
    val large = sample(100000)
    val rsSmall = IdPredicate.ranges(small.map(x => x: Any), 128).get
    val rsLarge = IdPredicate.ranges(large.map(x => x: Any), 128).get
    assert(rsSmall.size <= 128 && rsLarge.size <= 128,
      s"range budget blown: ${rsSmall.size} / ${rsLarge.size}")
    // superset coverage: every id falls inside some interval
    def covered(ids: Seq[Long], rs: Seq[(Any, Any)]): Boolean =
      ids.forall(id => rs.exists { case (lo, hi) =>
        id >= lo.asInstanceOf[Long] && id <= hi.asInstanceOf[Long] })
    assert(covered(small, rsSmall) && covered(large, rsLarge))
    // tight endpoints: the cover never widens past [min, max]
    assert(rsLarge.head._1 == large.head && rsLarge.last._2 == large.last)
    // the column form filters to exactly the covered superset
    val pred = IdPredicate.predicate(col("id"),
      large.map(x => x: Any), 128).get
    val kept = large.toDF("id").filter(pred).as[Long].collect().toSet
    assert(kept == large.toSet,
      "every candidate id must survive its own covering predicate")
    // and the predicate's string form is bounded (the analyzer-cost
    // proxy): far below what a 100k-element In literal would print
    assert(pred.toString.length < 20000,
      s"predicate blew up: ${pred.toString.length} chars")
  }

  test("numeric ids split at the largest gaps: two tight clusters " +
      "become two tight intervals, not one spanning the void") {
    val ids: Seq[Any] = ((0L to 99L) ++ (1000000L to 1000099L)).map(x => x: Any)
    val rs = IdPredicate.ranges(ids, 2).get
    assert(rs == Seq((0L, 99L), (1000000L, 1000099L)),
      s"expected the gap split, got $rs")
  }

  test("gap comparison is unsigned: ids spanning more than " +
      "Long.MaxValue still split at the true void") {
    // two tight clusters at the extremes of the signed-long range —
    // the cross-cluster gap exceeds Long.MaxValue, so a signed
    // difference wraps negative and a signed sort would cut INSIDE a
    // cluster, leaving one interval spanning nearly the whole space
    val lo = (0 until 50).map(i => Long.MinValue + 5 + i)
    val hi = (0 until 50).map(i => Long.MaxValue - 60 + i)
    val ids: Seq[Any] = (lo ++ hi).map(x => x: Any)
    val rs = IdPredicate.ranges(ids, 2).get
    assert(rs == Seq((lo.head, lo.last), (hi.head, hi.last)),
      s"expected the extreme-cluster split, got $rs")
  }

  test("small id sets become point predicates; empty sets match " +
      "nothing; strings chunk; non-rangeable types opt out") {
    val rs = IdPredicate.ranges(Seq(3L, 7L, 9L), 128).get
    assert(rs == Seq((3L, 3L), (7L, 7L), (9L, 9L)))
    val empty = IdPredicate.predicate(col("id"), Seq.empty).get
    assert(Seq(1L).toDF("id").filter(empty).isEmpty)
    val srs = IdPredicate.ranges(
      Seq("a", "b", "c", "x", "y", "z").map(x => x: Any), 2).get
    assert(srs.size <= 2 && srs.head._1 == "a" && srs.last._2 == "z")
    val spred = IdPredicate.predicate(col("id"),
      Seq("a", "c", "z").map(x => x: Any), 2).get
    assert(Seq("a", "c", "z", "zz").toDF("id").filter(spred)
      .as[String].collect().toSet.intersect(Set("a", "c", "z"))
      == Set("a", "c", "z"))
    assert(IdPredicate.ranges(Seq(Seq(1, 2): Any), 8).isEmpty,
      "array ids have no range order — callers must fall back")
  }
}
