package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Set-rewrite mutation semantics, including the NULL-business-key rows
  * that the <=> join matches (a plain isNotNull witness would miss them). */
class MutationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType),
    StructField("w", IntegerType)))

  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Any, Any, Any)] =
    df.collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet

  test("applyUpdate replaces set columns on matched keys, incl. NULL key") {
    val target = frame(Row(1, "a", 10), Row(2, "b", 20), Row(null, "n", 30))
    val updates = frame(Row(2, "B!", 99), Row(null, "N!", 77))
    val out = Mutations.applyUpdate(target, updates, Seq("k"), Seq("v"))
    assert(asSet(out) == Set((1, "a", 10), (2, "B!", 20), (null, "N!", 30)))
  }

  test("applyUpdate with no matches is identity") {
    val target = frame(Row(1, "a", 10))
    val updates = frame(Row(9, "z", 0))
    assert(asSet(Mutations.applyUpdate(target, updates, Seq("k"), Seq("v", "w"))) ==
      Set((1, "a", 10)))
  }

  test("applyDelete removes matched keys only") {
    val target = frame(Row(1, "a", 10), Row(2, "b", 20), Row(3, "c", 30))
    val deletes = frame(Row(2, null, null), Row(9, null, null))
    assert(asSet(Mutations.applyDelete(target, deletes, Seq("k"))) ==
      Set((1, "a", 10), (3, "c", 30)))
  }

  test("applyUpdate handles dotted column names (alias refs quoted)") {
    val dotted = StructType(Seq(
      StructField("key.id", IntegerType), StructField("val.x", StringType)))
    val target = spark.createDataFrame(
      java.util.Arrays.asList(Row(1, "a"), Row(2, "b")), dotted)
    val updates = spark.createDataFrame(
      java.util.Arrays.asList(Row(2, "B!")), dotted)
    val out = Mutations.applyUpdate(target, updates, Seq("key.id"), Seq("val.x"))
    assert(out.collect().map(r => (r.get(0), r.get(1))).toSet ==
      Set((1, "a"), (2, "B!")))
  }

  test("scdType1 upserts: matched rows replaced, new keys appended") {
    val target = frame(Row(1, "a", 10), Row(2, "b", 20))
    val feed = frame(Row(2, "B", 21), Row(3, "c", 30))
    assert(asSet(Mutations.scdType1(target, feed, Seq("k"))) ==
      Set((1, "a", 10), (2, "B", 21), (3, "c", 30)))
  }

  test("scdType2 expires changed rows and inserts new versions") {
    val tSchema = StructType(schema.fields ++ Seq(
      StructField("valid_from", StringType), StructField("valid_to", StringType),
      StructField("is_current", BooleanType)))
    val target = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "a", 10, "r0", null, true),     // unchanged
      Row(2, "b", 20, "r0", null, true),     // changed in feed → expire
      Row(2, "old", 19, "r0", "r0", false),  // history row, untouched
      Row(null, "n", 30, "r0", null, true)), // NULL key, changed in feed
      tSchema)
    val feed = frame(Row(1, "a", 10), Row(2, "B", 21), Row(null, "N", 31),
      Row(4, "d", 40))
    val out = Mutations.scdType2(target, feed, Seq("k"), Seq("v", "w"), "r1")
    val rows = out.collect().map(r =>
      (r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5))).toSet
    assert(rows == Set(
      (1, "a", 10, "r0", null, true),      // unchanged current
      (2, "b", 20, "r0", "r1", false),     // expired
      (2, "old", 19, "r0", "r0", false),   // history preserved
      (null, "n", 30, "r0", "r1", false),  // NULL-key row expired too
      (2, "B", 21, "r1", null, true),      // new version
      (null, "N", 31, "r1", null, true),   // new NULL-key version
      (4, "d", 40, "r1", null, true)))     // brand-new key
  }
}
