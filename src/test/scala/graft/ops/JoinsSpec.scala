package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin: latest prior right row, <= semantics, null when none, tie-break") {
    val left = Seq(
      (1L, "u1", 100L), // before any right row -> null
      (2L, "u1", 200L), // exactly at a right ts -> matches it (<=)
      (3L, "u1", 350L), // between right rows -> latest prior
      (4L, "u2", 500L)  // other key
    ).toDF("event_id", "user", "t")
    val right = Seq(
      (10L, "u1", 200L),
      (11L, "u1", 300L),
      (12L, "u1", 300L), // tie at t=300: larger id wins
      (20L, "u2", 400L),
      (21L, "u3", 100L)  // key never joined
    ).toDF("rid", "user", "rt")
    val out = Joins.asofJoin(left, right, Seq("user"), "t", "rt",
        select = Seq("rid" -> "last_rid", "rt" -> "last_rt"),
        rightTieBreak = Some("rid"))
      .select("event_id", "last_rid", "last_rt")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, r, t) => k -> ((r, t)) }.toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((Some(10L), Some(200L))))
    assert(out(3L) == ((Some(12L), Some(300L))))
    assert(out(4L) == ((Some(20L), Some(400L))))
  }

  test("asofJoin: tie-break keeps its native type — string ordering, not a long cast") {
    val left = Seq((1L, "u1", 300L)).toDF("event_id", "user", "t")
    val right = Seq(
      ("apple", "u1", 300L),
      ("pear", "u1", 300L), // 'pear' > 'banana' > 'apple' lexically
      ("banana", "u1", 300L)
    ).toDF("tag", "user", "rt")
    val out = Joins.asofJoin(left, right, Seq("user"), "t", "rt",
        select = Seq("tag" -> "last_tag"),
        rightTieBreak = Some("tag"))
      .select("event_id", "last_tag").as[(Long, String)].collect().toMap
    assert(out(1L) == "pear")
  }

  test("bandJoin: bucket-blocked result equals the naive theta join, [lo,hi) bounds") {
    val rnd = new scala.util.Random(3)
    val facts = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 60.0))
      .toDF("id", "v")
    // boundary rows land exactly on band edges
    val edges = Seq((1001L, 10.0), (1002L, 25.0), (1003L, 0.0)).toDF("id", "v")
    val all = facts.unionByName(edges)
    val bands = Seq(("low", 0.0, 10.0), ("mid", 10.0, 25.0),
      ("high", 25.0, 50.0)).toDF("band", "lo", "hi")
    val blocked = Joins.bandJoin(all, bands, "v", "lo", "hi", step = 10.0)
      .select("id", "band").as[(Long, String)].collect().toSet
    val naive = all.join(bands, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band").as[(Long, String)].collect().toSet
    assert(blocked == naive)
    // half-open: 10.0 is mid, 25.0 is high, 0.0 is low; >=50 drops out
    val byId = blocked.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byId(1001L) == Set("mid"))
    assert(byId(1002L) == Set("high"))
    assert(byId(1003L) == Set("low"))
  }

  test("scale shape: asofJoin plans exactly one exchange; bandJoin never nested-loops") {
    val left = Seq((1L, "k", 10L)).toDF("id", "key", "t")
    val right = Seq((2L, "k", 5L)).toDF("rid", "key", "rt")
    val asofPlan = Joins.asofJoin(left, right, Seq("key"), "t", "rt",
      select = Seq("rid" -> "last_rid")).queryExecution.executedPlan.toString
    // the whole operator costs ONE hash exchange (for the window);
    // a second one would mean the union or projection re-shuffled
    assert("Exchange hashpartitioning".r.findAllMatchIn(asofPlan).size == 1,
      asofPlan)

    val facts = Seq((1L, 5.0)).toDF("id", "v")
    val bands = Seq(("b", 0.0, 10.0)).toDF("band", "lo", "hi")
    val bandPlan = Joins.bandJoin(facts, bands, "v", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!bandPlan.contains("CartesianProduct") &&
      !bandPlan.contains("BroadcastNestedLoopJoin"), bandPlan)
  }
}
