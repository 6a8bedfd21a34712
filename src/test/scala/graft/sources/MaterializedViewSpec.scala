package graft.sources

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental maintenance == full recompute, under every change
  * shape the base table can emit: appends, CDF updates/deletes,
  * group birth and death, all-null sums, replayed refreshes. */
class MaterializedViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mv").toString + "/t"

  private def rows(r: (Int, Long, java.lang.Long)*): DataFrame =
    r.toSeq.toDF("k", "v", "w")

  /** The oracle: plain SQL aggregate of the base's current snapshot. */
  private def recompute(base: String): DataFrame =
    VersionedTable.read(spark, base)
      .groupBy("k").agg(count(lit(1)).as("cnt"),
        sum("v").as("sum_v"), sum("w").as("sum_w"))

  private def assertMatches(mv: String, base: String): Unit = {
    val got = MaterializedView.read(spark, mv)
    val want = recompute(base)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"mv ${got.collect().toSeq.sortBy(_.getInt(0))} != " +
        s"recompute ${want.collect().toSeq.sortBy(_.getInt(0))}")
  }

  test("create materializes the full aggregate; nulls reconstruct") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base,
      rows((1, 10L, 5L), (1, 20L, null), (2, 7L, null)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v", "w"))
    assertMatches(mv, base)
    // group 2: every w is null -> sum_w must be SQL NULL, not 0
    val g2 = MaterializedView.read(spark, mv).filter($"k" === 2).head()
    assert(g2.getLong(1) == 1L && g2.getLong(2) == 7L && g2.isNullAt(3))
    assert(MaterializedView.watermark(spark, mv) == 1L)
  }

  test("refresh applies appends, updates, deletes; groups die and are born") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base,
      rows((1, 10L, 1L), (2, 20L, null), (2, 5L, 4L)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v", "w"))
    // append: new group 3 + growth of group 1
    VersionedTable.append(spark, base, rows((3, 100L, null), (1, 1L, 2L)))
    // cdf update: group 2's values shift
    VersionedTable.updateWhere(spark, base, $"k" === 2,
      Map("v" -> ($"v" + 1000L)), cdf = true)
    // cdf delete: group 1 dies entirely
    VersionedTable.deleteWhere(spark, base, $"k" === 1, cdf = true)
    val v = MaterializedView.refresh(spark, base, mv)
    assertMatches(mv, base)
    assert(MaterializedView.read(spark, mv).filter($"k" === 1).isEmpty,
      "fully-deleted group must leave the view")
    assert(MaterializedView.watermark(spark, mv) == 4L)
    // replay: base unchanged -> refresh is a version no-op
    assert(MaterializedView.refresh(spark, base, mv) == v)
  }

  test("a group whose last non-null value dies goes back to NULL sum") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 1L, 9L), (1, 2L, null)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v", "w"))
    VersionedTable.deleteWhere(spark, base, $"w".isNotNull, cdf = true)
    MaterializedView.refresh(spark, base, mv)
    assertMatches(mv, base)
    val g = MaterializedView.read(spark, mv).head()
    assert(g.getLong(1) == 1L && g.isNullAt(3))
  }

  test("incremental equals recompute over a mixed commit sequence") {
    val (base, mv) = (tmp(), tmp())
    val rnd = new scala.util.Random(7)
    def batch(n: Int): DataFrame = rows(Seq.fill(n)((rnd.nextInt(6),
      rnd.nextInt(100).toLong,
      if (rnd.nextBoolean()) java.lang.Long.valueOf(rnd.nextInt(50))
      else null)): _*)
    VersionedTable.create(spark, base, batch(20))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v", "w"))
    (1 to 4).foreach { i =>
      VersionedTable.append(spark, base, batch(10))
      if (i % 2 == 0)
        VersionedTable.deleteWhere(spark, base,
          $"v" % 3 === i % 3, cdf = true)
      else
        VersionedTable.updateWhere(spark, base, $"v" % 4 === 1,
          Map("w" -> lit(7L)), cdf = true)
      MaterializedView.refresh(spark, base, mv) // refresh EVERY commit
      assertMatches(mv, base)
    }
    // and a multi-commit gap folded into one refresh
    VersionedTable.append(spark, base, batch(10))
    VersionedTable.deleteWhere(spark, base, $"k" === 0, cdf = true)
    MaterializedView.refresh(spark, base, mv)
    assertMatches(mv, base)
  }

  test("count-only view (no sum columns)") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 1L, null), (1, 2L, null)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq.empty)
    VersionedTable.append(spark, base, rows((2, 3L, 1L)))
    MaterializedView.refresh(spark, base, mv)
    val got = MaterializedView.read(spark, mv).as[(Int, Long)]
      .collect().toSet
    assert(got == Set((1, 2L), (2, 1L)))
  }

  test("non-CDF rewrite in the range refuses loudly") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 1L, 1L)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v"))
    VersionedTable.deleteWhere(spark, base, $"v" === 1L) // cdf = false
    val e = intercept[IllegalStateException](
      MaterializedView.refresh(spark, base, mv))
    assert(e.getMessage.contains("without change capture"))
  }

  test("bad definitions refuse") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 1L, 1L)))
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, base, mv, Seq.empty, Seq("v")))
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, base, mv, Seq("k"), Seq("k")))
    intercept[IllegalArgumentException](
      MaterializedView.create(spark, base, mv, Seq("k,x"), Seq.empty))
  }
}
