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

  // ---- join views -------------------------------------------------------

  private def jrecompute(l: String, r: String): DataFrame =
    VersionedTable.read(spark, l)
      .join(VersionedTable.read(spark, r), Seq("k"))
      .groupBy("g").agg(count(lit(1)).as("cnt"),
        sum("v").as("sum_v"), sum("w").as("sum_w"))

  private def jassert(mv: String, l: String, r: String): Unit = {
    val got = MaterializedView.read(spark, mv)
    val want = jrecompute(l, r)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"join mv ${got.collect().toSeq.sortBy(_.getInt(0))} != " +
        s"recompute ${want.collect().toSeq.sortBy(_.getInt(0))}")
  }

  private def ldf(r: (Int, Int, Long)*): DataFrame =
    r.toSeq.toDF("k", "g", "v")
  private def rdf(r: (Int, Long)*): DataFrame = r.toSeq.toDF("k", "w")

  test("join view: create aggregates the inner join; fan-out counted") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l,
      ldf((1, 10, 5L), (1, 10, 6L), (2, 20, 7L), (9, 30, 1L))) // k=9 dangles
    VersionedTable.create(spark, r, rdf((1, 100L), (2, 200L), (2, 201L)))
    MaterializedView.createJoin(spark, l, r, mv, Seq("k"), Seq("g"),
      Seq("v", "w"))
    jassert(mv, l, r)
    // k=2 joins two right rows: cnt=2, v counted twice
    val g20 = MaterializedView.read(spark, mv).filter($"g" === 20).head()
    assert(g20.getLong(1) == 2L && g20.getLong(2) == 14L &&
      g20.getLong(3) == 401L)
    assert(MaterializedView.watermarks(spark, mv) == (1L, 1L))
  }

  test("join view: one-sided deltas refresh correctly") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, ldf((1, 10, 5L), (2, 20, 7L)))
    VersionedTable.create(spark, r, rdf((1, 100L), (2, 200L)))
    MaterializedView.createJoin(spark, l, r, mv, Seq("k"), Seq("g"),
      Seq("v", "w"))
    VersionedTable.append(spark, l, ldf((1, 10, 50L))) // ΔL only
    MaterializedView.refreshJoin(spark, l, r, mv)
    jassert(mv, l, r)
    VersionedTable.updateWhere(spark, r, $"k" === 2,
      Map("w" -> lit(999L)), cdf = true) // ΔR only
    MaterializedView.refreshJoin(spark, l, r, mv)
    jassert(mv, l, r)
    assert(MaterializedView.watermarks(spark, mv) == (2L, 2L))
  }

  test("join view: the ΔL⋈ΔR cross term lands exactly once") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, ldf((1, 10, 5L)))
    VersionedTable.create(spark, r, rdf((1, 100L)))
    MaterializedView.createJoin(spark, l, r, mv, Seq("k"), Seq("g"),
      Seq("v", "w"))
    // BOTH sides gain key 7 in the same refresh window: the joined
    // (7,7) pair exists only through ΔL⋈ΔR
    VersionedTable.append(spark, l, ldf((7, 70, 1L)))
    VersionedTable.append(spark, r, rdf((7, 700L)))
    // and key 1 dies on the right while the left gains another k=1
    // row — mixed signs across the two terms
    VersionedTable.append(spark, l, ldf((1, 10, 6L)))
    VersionedTable.deleteWhere(spark, r, $"k" === 1, cdf = true)
    MaterializedView.refreshJoin(spark, l, r, mv)
    jassert(mv, l, r)
    val got = MaterializedView.read(spark, mv).as[(Int, Long, Long, Long)]
      .collect().toSet
    assert(got == Set((70, 1L, 1L, 700L))) // g=10 died with right k=1
    // replay: nothing advanced -> version no-op
    val v = VersionedTable.currentVersion(spark, mv).get
    assert(MaterializedView.refreshJoin(spark, l, r, mv) == v)
  }

  test("join view: multi-commit gaps on both sides fold into one refresh") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    val rnd = new scala.util.Random(11)
    def lb(n: Int) = ldf(Seq.fill(n)((rnd.nextInt(5), 10 * rnd.nextInt(3),
      rnd.nextInt(100).toLong)): _*)
    def rb(n: Int) = rdf(Seq.fill(n)((rnd.nextInt(5),
      rnd.nextInt(1000).toLong)): _*)
    VersionedTable.create(spark, l, lb(8))
    VersionedTable.create(spark, r, rb(4))
    MaterializedView.createJoin(spark, l, r, mv, Seq("k"), Seq("g"),
      Seq("v", "w"))
    VersionedTable.append(spark, l, lb(6))
    VersionedTable.deleteWhere(spark, l, $"v" % 3 === 0, cdf = true)
    VersionedTable.append(spark, r, rb(3))
    VersionedTable.updateWhere(spark, r, $"w" % 2 === 0,
      Map("w" -> ($"w" + 1L)), cdf = true)
    MaterializedView.refreshJoin(spark, l, r, mv)
    jassert(mv, l, r)
    assert(MaterializedView.watermarks(spark, mv) == (3L, 3L))
  }

  test("distinct-count sketches: insert-only maintenance tracks exact " +
      "distincts (sparse regime), all-null group reads 0") {
    val (base, mv) = (tmp(), tmp())
    // w doubles as the distinct-counted column; group 2 starts all-null
    VersionedTable.create(spark, base,
      rows((1, 1L, 10L), (1, 2L, 10L), (1, 3L, 11L), (2, 4L, null)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v"),
      distincts = Seq("w"))
    def distincts(): Map[Int, Long] =
      MaterializedView.read(spark, mv).select("k", "distinct_w")
        .as[(Int, Long)].collect().toMap
    assert(distincts() == Map(1 -> 2L, 2 -> 0L))
    // inserts only: new values, repeats, a first value for group 2
    VersionedTable.append(spark, base,
      rows((1, 5L, 11L), (1, 6L, 12L), (2, 7L, 99L), (3, 8L, 7L)))
    MaterializedView.refresh(spark, base, mv)
    // cnt/sum lanes stay exact alongside the sketch lane
    val lanes = MaterializedView.read(spark, mv)
      .select("k", "cnt", "sum_v").as[(Int, Long, Long)].collect()
      .map { case (k, c, s) => k -> ((c, s)) }.toMap
    val wantLanes = VersionedTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)), sum("v")).as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(lanes == wantLanes)
    assert(distincts() == Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
    // deletes in sketched groups: HLL cannot retract, so the touched
    // groups' sketches rebuild from the snapshot (partial recompute);
    // sketches are sparse here, so estimates are EXACT
    def exact(): Map[Int, Long] =
      VersionedTable.read(spark, base).groupBy("k")
        .agg(countDistinct($"w").as("d")).as[(Int, Long)].collect().toMap
    // kill group 1's only w=12 -> its distinct must DROP 3 -> 2
    VersionedTable.deleteWhere(spark, base, $"w" === 12L, cdf = true)
    MaterializedView.refresh(spark, base, mv)
    assert(distincts() == Map(1 -> 2L, 2 -> 1L, 3 -> 1L))
    assert(distincts() == exact())
    // delete ONE of group 1's duplicate w=10 rows -> distinct unchanged
    VersionedTable.deleteWhere(spark, base, $"v" === 1L, cdf = true)
    // and, in the SAME refresh window, insert a new value into the
    // delete-touched group plus kill group 3 entirely
    VersionedTable.append(spark, base, rows((1, 20L, 13L)))
    VersionedTable.deleteWhere(spark, base, $"k" === 3, cdf = true)
    MaterializedView.refresh(spark, base, mv)
    assert(distincts() == Map(1 -> 3L, 2 -> 1L),
      "dup-delete keeps 10, insert adds 13, group 3 leaves the view")
    // cnt/sum lanes stay exact through the delete-rescan path
    val lanes2 = MaterializedView.read(spark, mv)
      .select("k", "cnt", "sum_v").as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want2 = VersionedTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)), sum("v")).as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(lanes2 == want2)
  }

  test("distinct sketches survive deletes on a join view too") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l,
      ldf((1, 10, 5L), (2, 10, 6L), (3, 20, 5L)))
    VersionedTable.create(spark, r, rdf((1, 100L), (2, 200L), (3, 300L)))
    MaterializedView.createJoin(spark, l, r, mv, Seq("k"), Seq("g"),
      Seq("v"), distincts = Seq("w"))
    // deleting left k=2 removes g=10's w=6 pair -> distinct 2 -> 1;
    // g=20 untouched
    VersionedTable.deleteWhere(spark, l, $"k" === 2, cdf = true)
    MaterializedView.refreshJoin(spark, l, r, mv)
    val got = MaterializedView.read(spark, mv).select("g", "distinct_w")
      .as[(Int, Long)].collect().toMap
    assert(got == Map(10 -> 1L, 20 -> 1L))
  }

  test("distinct-count sketches on a join view") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, ldf((1, 10, 5L), (2, 10, 6L)))
    VersionedTable.create(spark, r, rdf((1, 100L), (2, 200L)))
    MaterializedView.createJoin(spark, l, r, mv, Seq("k"), Seq("g"),
      Seq("v"), distincts = Seq("w"))
    VersionedTable.append(spark, l, ldf((3, 10, 7L)))
    VersionedTable.append(spark, r, rdf((3, 200L))) // w=200 repeats
    MaterializedView.refreshJoin(spark, l, r, mv)
    val g10 = MaterializedView.read(spark, mv)
      .select("g", "cnt", "distinct_w").as[(Int, Long, Long)].head()
    assert(g10 == ((10, 3L, 2L))) // 3 joined rows, 2 distinct w values
  }

  test("min/max lane: deleted extrema recompute via touched-group rescan") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base,
      rows((1, 5L, 1L), (1, 9L, 2L), (2, 3L, null)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("w"),
      minmax = Seq("v"))
    def mm(): Map[Int, (Long, Long)] =
      MaterializedView.read(spark, mv).select("k", "min_v", "max_v")
        .as[(Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
    assert(mm() == Map(1 -> ((5L, 9L)), 2 -> ((3L, 3L))))
    // delete group 1's CURRENT MAX — the case pure delta state cannot
    // answer; the rescan lane must find the new max 5
    VersionedTable.deleteWhere(spark, base, $"v" === 9L, cdf = true)
    // and raise group 2's max by insert, leave group 3 born fresh
    VersionedTable.append(spark, base, rows((2, 8L, 1L), (3, 4L, 2L)))
    MaterializedView.refresh(spark, base, mv)
    assert(mm() == Map(1 -> ((5L, 5L)), 2 -> ((3L, 8L)), 3 -> ((4L, 4L))))
    // cnt/sum lanes agree with recompute alongside
    val want = VersionedTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("w").as("sum_w"),
        min("v").as("min_v"), max("v").as("max_v"))
    val got = MaterializedView.read(spark, mv)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // untouched-group invariance: mutate only group 2; group 1's row
    // must survive byte-identically (its files were never rewritten)
    val g1Before = got.filter($"k" === 1).collect().toSeq
    VersionedTable.updateWhere(spark, base, $"k" === 2,
      Map("v" -> lit(100L)), cdf = true)
    MaterializedView.refresh(spark, base, mv)
    assert(MaterializedView.read(spark, mv).filter($"k" === 1)
      .collect().toSeq == g1Before)
    assert(mm()(2) == ((100L, 100L)))
  }

  test("min/max lane on a join view") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, ldf((1, 10, 5L), (2, 10, 9L)))
    VersionedTable.create(spark, r, rdf((1, 100L), (2, 200L)))
    MaterializedView.createJoin(spark, l, r, mv, Seq("k"), Seq("g"),
      Seq("w"), minmax = Seq("v"))
    // delete the left row holding the max; the joined group's max
    // must fall back to 5 via the L1 JOIN R1 rescan
    VersionedTable.deleteWhere(spark, l, $"v" === 9L, cdf = true)
    MaterializedView.refreshJoin(spark, l, r, mv)
    val g = MaterializedView.read(spark, mv)
      .select("g", "min_v", "max_v").as[(Int, Long, Long)].head()
    assert(g == ((10, 5L, 5L)))
  }

  test("wrong-base and wrong-flavor accessors refuse") {
    val (base, other, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 1L, 1L)))
    VersionedTable.create(spark, other, rows((2, 2L, 2L)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v"))
    VersionedTable.append(spark, other, rows((3, 3L, 3L)))
    // refreshing against a same-schema FOREIGN table refuses loudly
    val e = intercept[IllegalArgumentException](
      MaterializedView.refresh(spark, other, mv))
    assert(e.getMessage.contains("wrong (or relocated) base"))
    // trailing slash is not a different table
    MaterializedView.refresh(spark, base + "/", mv)
    // join-flavor accessor on a single-table view refuses
    intercept[IllegalArgumentException](
      MaterializedView.watermarks(spark, mv))
    val (l, r, jmv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, ldf((1, 10, 5L)))
    VersionedTable.create(spark, r, rdf((1, 100L)))
    MaterializedView.createJoin(spark, l, r, jmv, Seq("k"), Seq("g"),
      Seq("v", "w"))
    intercept[IllegalArgumentException](
      MaterializedView.watermark(spark, jmv))
    // transposed left/right refuses before touching state
    VersionedTable.append(spark, l, ldf((2, 20, 6L)))
    val e2 = intercept[IllegalArgumentException](
      MaterializedView.refreshJoin(spark, r, l, jmv))
    assert(e2.getMessage.contains("wrong (or relocated) base"))
  }

  test("join view: refusals — column collision, wrong refresh flavor") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, ldf((1, 10, 5L)))
    VersionedTable.create(spark, r,
      Seq((1, 9L)).toDF("k", "v")) // v collides with left's v
    intercept[IllegalArgumentException](MaterializedView.createJoin(
      spark, l, r, mv, Seq("k"), Seq("g"), Seq("v")))
    val r2 = tmp()
    VersionedTable.create(spark, r2, rdf((1, 100L)))
    MaterializedView.createJoin(spark, l, r2, mv, Seq("k"), Seq("g"),
      Seq("v", "w"))
    intercept[IllegalArgumentException](
      MaterializedView.refresh(spark, l, mv))
    val (b2, m2) = (tmp(), tmp())
    VersionedTable.create(spark, b2, rows((1, 1L, 1L)))
    MaterializedView.create(spark, b2, m2, Seq("k"), Seq("v"))
    intercept[RuntimeException](
      MaterializedView.refreshJoin(spark, b2, b2, m2))
  }

  test("streaming ingest + per-batch refresh: MV tracks the live table") {
    // the deployment shape: micro-batches upsert into the base with
    // CDF capture, and the SAME foreachBatch refreshes the view —
    // exactly-once on both tables by their own batch watermarks
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base, rows((0, 0L, 0L)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v", "w"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_stream")
    dir.toFile.deleteOnExit()
    val src = dir.toString + "/in"
    rows((1, 10L, 1L), (2, 20L, 2L)).write
      .mode(org.apache.spark.sql.SaveMode.Append).parquet(src)
    val q = spark.readStream.schema(rows().schema).parquet(src)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        VersionedTable.streamingUpsert(spark, base, batch, Seq("k"),
          "ingest", id, cdf = true)
        MaterializedView.refresh(spark, base, mv): Unit
      }.start()
    try {
      q.processAllAvailable()
      assertMatches(mv, base)
      rows((1, 11L, 5L), (3, 30L, 3L)).write // update k=1, insert k=3
        .mode(org.apache.spark.sql.SaveMode.Append).parquet(src)
      q.processAllAvailable()
      assertMatches(mv, base)
    } finally q.stop()
  }

  test("concurrent refreshers: monotonic batchId keeps exactly one winner") {
    // two threads race the SAME refresh window; whichever commits
    // first wins, the loser's streamingApply no-ops on the recorded
    // batch id — the state must equal the recompute either way, with
    // exactly ONE new MV version
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 1L, 1L), (2, 2L, 2L)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v"))
    VersionedTable.append(spark, base, rows((1, 10L, 3L), (3, 30L, 4L)))
    VersionedTable.deleteWhere(spark, base, $"k" === 2, cdf = true)
    val mvBefore = VersionedTable.currentVersion(spark, mv).get
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    try {
      val fs = (1 to 2).map(_ => pool.submit(new java.util.concurrent
          .Callable[Long] {
        def call(): Long = {
          gate.await(10, TimeUnit.SECONDS)
          MaterializedView.refresh(spark, base, mv)
        }
      }))
      gate.countDown()
      val versions = fs.map(_.get(120, TimeUnit.SECONDS)).toSet
      // both racers report the same final version, one past the start
      assert(versions == Set(mvBefore + 1), s"got $versions")
    } finally pool.shutdown()
    val got = MaterializedView.read(spark, mv)
    val want = VersionedTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
    assert(got.count() == want.count() && got.exceptAll(want).isEmpty)
    assert(MaterializedView.watermark(spark, mv) == 3L)
  }

  test("view cascades: a cdf view feeds a downstream view's maintenance") {
    // base -> mv1 (per (k, w-bucket) count+sum, cdf) -> mv2 (per k
    // rollup of mv1's raw sums) — the dataflow-graph shape; mv2
    // delta-maintains off mv1's own refresh commits
    val (base, mv1, mv2) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, base,
      rows((1, 10L, 0L), (1, 20L, 1L), (2, 5L, 0L)))
    MaterializedView.create(spark, base, mv1, Seq("k", "w"), Seq("v"),
      cdf = true)
    MaterializedView.create(spark, mv1, mv2, Seq("k"), Seq("raw_v"))
    def rollup(): Map[Int, (Long, Long)] =
      MaterializedView.read(spark, mv2).select("k", "cnt", "sum_raw_v")
        .as[(Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
    assert(rollup() == Map(1 -> ((2L, 30L)), 2 -> ((1L, 5L))))
    // churn the base across every shape, refresh DOWN the cascade
    VersionedTable.append(spark, base, rows((1, 100L, 0L), (3, 7L, 2L)))
    VersionedTable.deleteWhere(spark, base, $"k" === 2, cdf = true)
    MaterializedView.refresh(spark, base, mv1)
    MaterializedView.refresh(spark, mv1, mv2)
    assert(rollup() == Map(1 -> ((2L, 130L)), 3 -> ((1L, 7L))))
    // and the rollup equals a direct recompute from the base
    val direct = VersionedTable.read(spark, base).groupBy("k")
      .agg(sum("v").as("s")).as[(Int, Long)].collect().toMap
    assert(rollup().view.mapValues(_._2).toMap == direct)
  }

  test("join-view race: stale larger-sum refresher aborts; retry converges") {
    // the non-nested-window race monotone batchId alone admits:
    // refresher A applies left (1,2] (batch 2+1=3), refresher B was
    // computed against watermarks (1,1) with a WIDER right window
    // (1,3] (batch 1+3=4 > 3) — B never saw A's left range, so letting
    // B commit would advance LeftV past changes B did not apply. The
    // read-version guard must turn B into StaleRefresh BEFORE any
    // state lands; a plain refreshJoin retry then converges.
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, Seq((1, 10L), (2, 20L)).toDF("k", "v"))
    VersionedTable.create(spark, r, Seq((1, 1L), (2, 2L)).toDF("k", "w"))
    MaterializedView.createJoin(spark, l, r, mv,
      joinKeys = Seq("k"), keys = Seq("k"), sums = Seq("v")) // (1, 1)
    // B's future window: right advances twice
    VersionedTable.append(spark, r, Seq((1, 3L)).toDF("k", "w")) // r=2
    VersionedTable.append(spark, r, Seq((2, 4L)).toDF("k", "w")) // r=3
    // A's window: left advances once; A refreshes and WINS
    VersionedTable.append(spark, l, Seq((3, 30L)).toDF("k", "v")) // l=2
    // A raced before right's appends: apply ONLY left (1,2] the way a
    // refresher that read (l1,r1)=(2,1) would — pin right at 1 via the
    // same commit channel (empty payload; only meta moves)
    val none = VersionedTable.read(spark, mv).limit(0)
      .localCheckpoint(true)
    VersionedTable.streamingApply(spark, mv, none,
      none.select("k"), Seq("k"), "mv_refresh", batchId = 3L,
      extraMeta = Map("mv.left_v" -> "2", "mv.right_v" -> "1"),
      expectMeta = Map("mv.left_v" -> "1", "mv.right_v" -> "1"))
    assert(MaterializedView.watermarks(spark, mv) == ((2L, 1L)))
    // B's commit: batch 4 > 3 passes the monotone check, but B's
    // snapshot predates A -> the pinned pair must refuse
    intercept[VersionedTable.StaleRefresh] {
      VersionedTable.streamingApply(spark, mv, none,
        none.select("k"), Seq("k"), "mv_refresh", batchId = 4L,
        extraMeta = Map("mv.left_v" -> "1", "mv.right_v" -> "3"),
        expectMeta = Map("mv.left_v" -> "1", "mv.right_v" -> "1"))
    }
    // replay precedence: an ALREADY-APPLIED batch no-ops even with a
    // stale pin (crash-replay of an old refresher must stay silent)
    val cur = VersionedTable.currentVersion(spark, mv).get
    assert(VersionedTable.streamingApply(spark, mv, none,
      none.select("k"), Seq("k"), "mv_refresh", batchId = 3L,
      expectMeta = Map("mv.left_v" -> "0", "mv.right_v" -> "0")) == cur)
    // B retries the PUBLIC way: re-reads watermarks (2,1), recomputes
    // against them, converges to the full recompute at (2,3)
    MaterializedView.refreshJoin(spark, l, r, mv)
    assert(MaterializedView.watermarks(spark, mv) == ((2L, 3L)))
    val got = MaterializedView.read(spark, mv)
    val want = VersionedTable.read(spark, l)
      .join(VersionedTable.read(spark, r), Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
    assert(got.count() == want.count() && got.exceptAll(want).isEmpty)
  }

  test("refreshAll: diamond DAG refreshes in dependency order") {
    // base -> mvA (sum v), base -> mvB (sum w), top = mvA ⋈ mvB on k —
    // the shared-base diamond. Both mids expose cnt/raw_* state, so
    // the top view disambiguates with per-side renames (persisted in
    // meta, applied on every refresh). refreshAll gets the views in a
    // deliberately wrong order and must still refresh mids before top.
    val (base, mvA, mvB, top) = (tmp(), tmp(), tmp(), tmp())
    VersionedTable.create(spark, base,
      rows((1, 10L, 100L), (1, 20L, 200L), (2, 30L, 300L)))
    MaterializedView.create(spark, base, mvA, Seq("k"), Seq("v"),
      cdf = true)
    MaterializedView.create(spark, base, mvB, Seq("k"), Seq("w"),
      cdf = true)
    MaterializedView.createJoin(spark, mvA, mvB, top,
      joinKeys = Seq("k"), keys = Seq("k"),
      sums = Seq("raw_v", "raw_w"),
      leftRename = Map("cnt" -> "cnt_a", "nn_v" -> "nn_a"),
      rightRename = Map("cnt" -> "cnt_b", "nn_w" -> "nn_b"))
    def topRead(): Map[Int, (Long, Long, Long)] =
      MaterializedView.read(spark, top)
        .select("k", "cnt", "sum_raw_v", "sum_raw_w")
        .as[(Int, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(topRead() == Map(1 -> ((1L, 30L, 300L)), 2 -> ((1L, 30L, 300L))))
    // churn the root: append to group 1, birth group 3, kill group 2
    VersionedTable.append(spark, base, rows((1, 1L, 2L), (3, 7L, 8L)))
    VersionedTable.deleteWhere(spark, base, $"k" === 2, cdf = true)
    val versions =
      MaterializedView.refreshAll(spark, Seq(top, mvB, mvA))
    assert(versions.keySet == Set(mvA, mvB, top))
    assert(topRead() ==
      Map(1 -> ((1L, 31L, 302L)), 3 -> ((1L, 7L, 8L))))
    // the top equals a direct recompute from the root
    val direct = VersionedTable.read(spark, base).groupBy("k")
      .agg(sum("v").as("sv"), sum("w").as("sw"))
      .as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((1L, r._2, r._3))).toMap
    assert(topRead() == direct)
    // an up-to-date diamond is a pure no-op pass
    assert(MaterializedView.refreshAll(spark, Seq(mvA, top, mvB))
      == versions)
    // PARALLEL pass: churn again, race the two mid views concurrently
    // (parallelism = 2 puts level-0 mvA/mvB on separate threads over
    // the shared base; the OCC machinery makes that safe), top waits
    // for its level — same answers as the sequential pass would give
    VersionedTable.append(spark, base, rows((3, 2L, 3L), (4, 4L, 5L)))
    VersionedTable.updateWhere(spark, base, $"k" === 1,
      Map("v" -> lit(50L)), cdf = true)
    val par = MaterializedView.refreshAll(spark, Seq(top, mvB, mvA),
      parallelism = 2)
    assert(par.keySet == Set(mvA, mvB, top))
    val direct2 = VersionedTable.read(spark, base).groupBy("k")
      .agg(sum("v").as("sv"), sum("w").as("sw"))
      .as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((1L, r._2, r._3))).toMap
    assert(topRead() == direct2)
    assert(MaterializedView.refreshAll(spark, Seq(mvA, top, mvB),
      parallelism = 4) == par, "parallel no-op pass must quiesce")
  }

  test("addSums widens a live view at the WATERMARK; maintained after") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base,
      rows((1, 1L, 10L), (1, 2L, null), (2, 3L, 30L))) // v1
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v"))
    VersionedTable.append(spark, base, rows((2, 4L, 40L), (3, 5L, null)))
    MaterializedView.refresh(spark, base, mv) // watermark = 2
    // base advances PAST the watermark before the evolution: the
    // backfill must come from snapshot@2, and the next refresh must
    // then apply (2, 3] to the new column like any other delta
    VersionedTable.append(spark, base, rows((1, 6L, 100L), (4, 7L, 7L)))
    MaterializedView.addSums(spark, base, mv, Seq("w"))
    assert(MaterializedView.watermark(spark, mv) == 2L,
      "evolution must not move the watermark")
    MaterializedView.refresh(spark, base, mv)
    def want() = VersionedTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"),
        sum("w").as("sum_w"))
    def got() = MaterializedView.read(spark, mv)
    assert(got().columns.toSeq == Seq("k", "cnt", "sum_v", "sum_w"))
    assert(got().exceptAll(want()).isEmpty && want().exceptAll(got()).isEmpty)
    // group 3: all-null w -> SQL NULL sum reconstructed through the
    // backfilled nn counter
    assert(got().filter($"k" === 3).head().isNullAt(3))
    // and deletes keep maintaining the widened column
    VersionedTable.deleteWhere(spark, base, $"k" === 2, cdf = true)
    MaterializedView.refresh(spark, base, mv)
    assert(got().exceptAll(want()).isEmpty && want().exceptAll(got()).isEmpty)
    // second evolution: a distinct sketch AND a min/max lane on v (a
    // column may carry several roles); both maintained by the next
    // refresh, including a delete that forces the rescan lanes
    MaterializedView.addColumns(spark, base, mv,
      distincts = Seq("w"), minmax = Seq("v"))
    VersionedTable.append(spark, base, rows((1, 200L, 100L)))
    VersionedTable.deleteWhere(spark, base, $"v" === 6L, cdf = true)
    MaterializedView.refresh(spark, base, mv)
    val full = MaterializedView.read(spark, mv)
    val wantFull = VersionedTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"),
        sum("w").as("sum_w"),
        countDistinct($"w").cast("long").as("distinct_w"),
        min("v").as("min_v"), max("v").as("max_v"))
    assert(full.count() == wantFull.count() &&
      full.exceptAll(wantFull).isEmpty, // sparse sketches are exact
      s"${full.collect().toSeq} vs ${wantFull.collect().toSeq}")
    // refusals: clash, unknown column, join views
    intercept[IllegalArgumentException](
      MaterializedView.addSums(spark, base, mv, Seq("v")))
    intercept[IllegalArgumentException](
      MaterializedView.addSums(spark, base, mv, Seq("nope")))
    val (l, r, jmv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, ldf((1, 10, 5L)))
    VersionedTable.create(spark, r, rdf((1, 100L)))
    MaterializedView.createJoin(spark, l, r, jmv, Seq("k"), Seq("g"),
      Seq("v"))
    intercept[IllegalArgumentException](
      MaterializedView.addSums(spark, l, jmv, Seq("w")))
  }

  test("rescan with an EMPTY touched-key set short-circuits: 0/0 audit, " +
      "no snapshot scan") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 5L, 1L), (2, 3L, 2L)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("w"),
      minmax = Seq("v"))
    // a base commit that changes NOTHING (empty append): the refresh
    // still runs (version advanced) with an empty delta — the rescan
    // key set is empty, which must short-circuit to a truthful 0/0
    // audit instead of the full-scan -1/-1 fallback
    VersionedTable.append(spark, base, rows())
    MaterializedView.refresh(spark, base, mv)
    assert(MaterializedView.watermark(spark, mv) == 2L,
      "the refresh must still advance the watermark")
    assert(MaterializedView.rescanProfile(spark, mv) == ((0, 0)),
      "empty rescan key set: no snapshot pass, 0/0 audit")
    val want = VersionedTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("w").as("sum_w"),
        min("v").as("min_v"), max("v").as("max_v"))
    val got = MaterializedView.read(spark, mv)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // and a real delta afterwards still maintains + rescans normally
    VersionedTable.deleteWhere(spark, base, $"v" === 5L, cdf = true)
    MaterializedView.refresh(spark, base, mv)
    val want2 = VersionedTable.read(spark, base).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("w").as("sum_w"),
        min("v").as("min_v"), max("v").as("max_v"))
    val got2 = MaterializedView.read(spark, mv)
    assert(got2.exceptAll(want2).isEmpty && want2.exceptAll(got2).isEmpty)
  }

  test("addColumns drift pin is BIDIRECTIONAL: a state group missing " +
      "from the view refuses instead of being silently dropped") {
    val (base, mv) = (tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 1L, 10L), (2, 2L, 20L)))
    MaterializedView.create(spark, base, mv, Seq("k"), Seq("v"))
    // corrupt the STATE: drop group 2's row from the view table
    // directly. The watermark snapshot still has the group, so an
    // inner join alone would pass |join| == |state| and silently bake
    // a one-group-short view into the widened commit
    VersionedTable.deleteWhere(spark, mv, $"k" === 2)
    val e = intercept[IllegalArgumentException](
      MaterializedView.addSums(spark, base, mv, Seq("w")))
    assert(e.getMessage.contains("diverge"), e.getMessage)
  }

  test("evolving under a dependent cascade view keeps the cascade " +
      "maintainable: the rewrite emits its derivable change rows") {
    // r15 pinned this as a REFUSAL (addColumns committed non-CDF and
    // downstream hit the rewrite guard); the evolution commit now
    // carries real change rows — preimage deletes + widened postimage
    // inserts — so the downstream feed crosses it as an ordinary
    // nets-to-zero batch and the cascade keeps maintaining
    val (base, mv1, mv2) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, base, rows((1, 1L, 10L), (2, 2L, 20L)))
    MaterializedView.create(spark, base, mv1, Seq("k"), Seq("v"),
      cdf = true)
    MaterializedView.create(spark, mv1, mv2, Seq("k"), Seq("raw_v"))
    MaterializedView.addColumns(spark, base, mv1, sums = Seq("w"))
    // mv1 keeps maintaining after its own evolution...
    VersionedTable.append(spark, base, rows((1, 3L, 30L)))
    MaterializedView.refresh(spark, base, mv1)
    // ...and mv2's feed crosses the evolution version cleanly
    MaterializedView.refresh(spark, mv1, mv2)
    // mv2 aggregates mv1's STORED state table (raw_v), the cascade
    // shape q181 uses
    def want() = VersionedTable.read(spark, mv1).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("raw_v").as("sum_raw_v"))
    val got = MaterializedView.read(spark, mv2)
    assert(got.exceptAll(want()).isEmpty && want().exceptAll(got).isEmpty,
      s"${got.collect().toSeq} vs ${want().collect().toSeq}")
    // and the cascade keeps flowing on later churn too
    VersionedTable.deleteWhere(spark, base, $"k" === 2, cdf = true)
    MaterializedView.refresh(spark, base, mv1)
    MaterializedView.refresh(spark, mv1, mv2)
    val got2 = MaterializedView.read(spark, mv2)
    assert(got2.exceptAll(want()).isEmpty && want().exceptAll(got2).isEmpty)
  }

  test("addColumnsJoin widens a live JOIN view at the pinned watermark " +
      "pair; maintained through later churn on both sides") {
    val (l, r, mv) = (tmp(), tmp(), tmp())
    VersionedTable.create(spark, l, ldf((1, 10, 5L), (2, 10, 9L),
      (3, 20, 2L)))
    VersionedTable.create(spark, r, rdf((1, 100L), (2, 200L), (3, 300L)))
    MaterializedView.createJoin(spark, l, r, mv, Seq("k"), Seq("g"),
      Seq("v"))
    // both bases advance PAST the pinned pair before the evolution:
    // the backfill must come from L@pinned ⋈ R@pinned, and the next
    // refresh must then apply the gap to the new column like any delta
    VersionedTable.append(spark, l, ldf((4, 20, 7L)))
    VersionedTable.append(spark, r, rdf((4, 400L)))
    MaterializedView.refreshJoin(spark, l, r, mv) // watermarks (2, 2)
    VersionedTable.append(spark, l, ldf((5, 10, 1L)))
    VersionedTable.append(spark, r, rdf((5, 500L)))
    MaterializedView.addColumnsJoin(spark, l, r, mv, sums = Seq("w"))
    def want() = VersionedTable.read(spark, l)
      .join(VersionedTable.read(spark, r), Seq("k"))
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"),
        sum("w").as("sum_w"))
    MaterializedView.refreshJoin(spark, l, r, mv)
    def got() = MaterializedView.read(spark, mv)
    assert(got().columns.toSeq == Seq("g", "cnt", "sum_v", "sum_w"))
    assert(got().exceptAll(want()).isEmpty && want().exceptAll(got()).isEmpty,
      s"${got().collect().toSeq} vs ${want().collect().toSeq}")
    // and a post-evolution delete (the ΔL⋈R lane) maintains the new
    // column too
    VersionedTable.deleteWhere(spark, l, $"v" === 9L, cdf = true)
    MaterializedView.refreshJoin(spark, l, r, mv)
    assert(got().exceptAll(want()).isEmpty && want().exceptAll(got()).isEmpty)
    // wrong-flavor refusal points the right way
    val (sbase, smv) = (tmp(), tmp())
    VersionedTable.create(spark, sbase, rows((1, 1L, 1L)))
    MaterializedView.create(spark, sbase, smv, Seq("k"), Seq("v"))
    val e = intercept[IllegalArgumentException](
      MaterializedView.addColumnsJoin(spark, sbase, sbase, smv,
        sums = Seq("w")))
    assert(e.getMessage.contains("use addColumns"))
  }

  test("NULL grouping keys refuse at create and at refresh") {
    // every maintenance join is equality-keyed (NULL never matches
    // NULL), so a null-keyed group would silently fork from its own
    // state; the guard must fire instead — at create, and when a
    // refresh window introduces the first null-keyed row
    val (base, mv) = (tmp(), tmp())
    val nullKey = Seq((null.asInstanceOf[java.lang.Integer], 1L, 1L),
      (Integer.valueOf(1), 2L, 2L)).toDF("k", "v", "w")
    VersionedTable.create(spark, base, nullKey)
    val e = intercept[Exception](
      MaterializedView.create(spark, base, mv, Seq("k"), Seq("v")))
    assert(e.getMessage != null && e.getMessage.contains("NULL value in grouping key"),
      s"got: ${e.getMessage}")
    val (base2, mv2) = (tmp(), tmp())
    VersionedTable.create(spark, base2, rows((1, 1L, 1L)))
    MaterializedView.create(spark, base2, mv2, Seq("k"), Seq("v"))
    VersionedTable.append(spark, base2,
      Seq((null.asInstanceOf[java.lang.Integer], 9L, 9L))
        .toDF("k", "v", "w"))
    val e2 = intercept[Exception](
      MaterializedView.refresh(spark, base2, mv2))
    assert(e2.getMessage != null &&
      e2.getMessage.contains("NULL value in grouping key"),
      s"got: ${e2.getMessage}")
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
