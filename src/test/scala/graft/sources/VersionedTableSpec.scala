package graft.sources

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ACID contract of the versioned-manifest copy-on-write table —
  * above all CRASH SAFETY: a torn write at any pre-publish point must
  * leave the visible snapshot bit-identical, because the manifest
  * rename is the only state transition. */
class VersionedTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vt").toString + "/t"

  private def dim(rows: (Int, String, Long)*): DataFrame =
    rows.toSeq.toDF("k", "name", "amt")

  private def rowsOf(df: DataFrame): Set[(Int, String, Long)] =
    df.select("k", "name", "amt").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  test("create + read round-trips at version 1") {
    val root = freshRoot()
    val v = VersionedTable.create(spark, root,
      dim((1, "a", 10L), (2, "b", 20L)))
    assert(v == 1L)
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
    assert(rowsOf(VersionedTable.read(spark, root)) ==
      Set((1, "a", 10L), (2, "b", 20L)))
  }

  test("merge updates matched, inserts unmatched, and time travel keeps v1") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L), (2, "b", 20L)))
    val v = VersionedTable.merge(spark, root,
      dim((2, "b2", 22L), (3, "c", 30L)), keys = Seq("k"))
    assert(v == 2L)
    assert(rowsOf(VersionedTable.read(spark, root)) ==
      Set((1, "a", 10L), (2, "b2", 22L), (3, "c", 30L)))
    // the old snapshot is immutable — readers pinned to v1 see v1
    assert(rowsOf(VersionedTable.read(spark, root, Some(1L))) ==
      Set((1, "a", 10L), (2, "b", 20L)))
  }

  test("copy-on-write is file-granular: untouched files are carried, not rewritten") {
    val root = freshRoot()
    // two files with disjoint key ranges (repartitionByRange + one
    // row group each)
    val base = dim((1 to 40).map(i => (i, s"n$i", i.toLong)): _*)
      .repartitionByRange(2, col("k"))
    VersionedTable.create(spark, root, base)
    def filesOf(df: DataFrame): Set[String] =
      df.select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSet
    val v1Files = filesOf(VersionedTable.read(spark, root, Some(1L)))
    assert(v1Files.size == 2)
    // touch ONE key → exactly one of the two files may be rewritten
    VersionedTable.merge(spark, root, dim((1, "updated", 999L)), Seq("k"))
    val v2Files = filesOf(VersionedTable.read(spark, root))
    assert((v1Files intersect v2Files).size == 1,
      s"expected exactly one carried file, got ${v1Files intersect v2Files}")
    assert(rowsOf(VersionedTable.read(spark, root))
      .contains((1, "updated", 999L)))
  }

  test("a torn pre-publish write never corrupts the visible snapshot") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L)))
    val before = rowsOf(VersionedTable.read(spark, root))
    // crash simulation 1: orphan data dir (committer died after
    // writing data files, before any manifest activity)
    dim((9, "garbage", 0L)).write
      .parquet(s"$root/data/orphan-${java.util.UUID.randomUUID()}")
    // crash simulation 2: torn manifest temp (died mid-write — note
    // HALF a manifest: magic line but no schema, an unparseable torso)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_manifests/.tmp-crashed"),
      "graft-versioned-table v1\nschema={".getBytes("UTF-8"))
    assert(VersionedTable.currentVersion(spark, root).contains(1L))
    assert(rowsOf(VersionedTable.read(spark, root)) == before)
    // and the table still accepts commits
    VersionedTable.merge(spark, root, dim((2, "b", 20L)), Seq("k"))
    assert(rowsOf(VersionedTable.read(spark, root)) ==
      before + ((2, "b", 20L)))
  }

  test("concurrent commit loses the CAS and recover() clears a dead lock") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L)))
    // another committer reserved v2 (or died holding the lock)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(
      s"$root/_manifests/v${"%020d".format(2)}.lock"))
    intercept[VersionedTable.CommitConflict] {
      VersionedTable.merge(spark, root, dim((1, "x", 1L)), Seq("k"))
    }
    // the failed attempt must not have changed anything
    assert(rowsOf(VersionedTable.read(spark, root)) == Set((1, "a", 10L)))
    VersionedTable.recover(spark, root)
    VersionedTable.merge(spark, root, dim((1, "x", 1L)), Seq("k"))
    assert(rowsOf(VersionedTable.read(spark, root)) == Set((1, "x", 1L)))
  }

  test("delete-matched merge shrinks the table") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L), (2, "b", 20L)))
    VersionedTable.merge(spark, root, dim((1, "a", 10L)), Seq("k"),
      deleteMatched = true)
    assert(rowsOf(VersionedTable.read(spark, root)) == Set((2, "b", 20L)))
  }

  test("scdType2Commit expires changed rows and inserts fresh versions") {
    val root = freshRoot()
    val t0 = Seq((1, "a", "2026-01-01", null.asInstanceOf[String], true),
        (2, "b", "2026-01-01", null.asInstanceOf[String], true))
      .toDF("k", "name", "valid_from", "valid_to", "is_current")
    VersionedTable.create(spark, root, t0)
    VersionedTable.scdType2Commit(spark, root,
      Seq((1, "a2"), (3, "c")).toDF("k", "name"),
      keys = Seq("k"), trackedCols = Seq("name"), runStamp = "2026-02-01")
    val got = VersionedTable.read(spark, root)
      .select("k", "name", "valid_to", "is_current").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(
      (1, "a", "2026-02-01", false),   // expired
      (1, "a2", null, true),           // replacement
      (2, "b", null, true),            // untouched
      (3, "c", null, true)))           // brand-new key
  }

  test("vacuum drops old versions and their unreferenced files only") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L)))
    VersionedTable.merge(spark, root, dim((1, "a2", 11L)), Seq("k"))
    VersionedTable.vacuum(spark, root, keepFrom = 2L)
    assert(rowsOf(VersionedTable.read(spark, root)) == Set((1, "a2", 11L)))
    intercept[Exception] { VersionedTable.read(spark, root, Some(1L)) }
  }

  test("streamingUpsert is exactly-once under at-least-once replay") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L), (2, "b", 20L)))
    val v2 = VersionedTable.streamingUpsert(spark, root,
      dim((1, "a2", 11L), (3, "c", 30L)), Seq("k"), "q", batchId = 0L)
    assert(v2 == 2L)
    val after0 = rowsOf(VersionedTable.read(spark, root))
    assert(after0 == Set((1, "a2", 11L), (2, "b", 20L), (3, "c", 30L)))
    // crash-replay of the SAME batch: no new version, no double-apply
    val replay = VersionedTable.streamingUpsert(spark, root,
      dim((1, "a2", 11L), (3, "c", 30L)), Seq("k"), "q", batchId = 0L)
    assert(replay == 2L)
    assert(rowsOf(VersionedTable.read(spark, root)) == after0)
    // next batch applies; a LATE replay of batch 0 after it is skipped
    assert(VersionedTable.streamingUpsert(spark, root,
      dim((2, "b2", 21L)), Seq("k"), "q", batchId = 1L) == 3L)
    assert(VersionedTable.streamingUpsert(spark, root,
      dim((1, "STALE", 99L)), Seq("k"), "q", batchId = 0L) == 3L)
    assert(rowsOf(VersionedTable.read(spark, root)) ==
      Set((1, "a2", 11L), (2, "b2", 21L), (3, "c", 30L)))
    // a DIFFERENT query's batch 0 is independent state
    assert(VersionedTable.streamingUpsert(spark, root,
      dim((4, "d", 40L)), Seq("k"), "q2", batchId = 0L) == 4L)
    // and the watermark meta survives non-streaming commits in between
    VersionedTable.merge(spark, root, dim((5, "e", 50L)), Seq("k"))
    assert(VersionedTable.streamingUpsert(spark, root,
      dim((1, "STALE2", 98L)), Seq("k"), "q", batchId = 1L) == 5L)
  }

  test("compact rewrites small files, preserves rows, keeps time travel") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L)))
    VersionedTable.streamingUpsert(spark, root, dim((2, "b", 20L)),
      Seq("k"), "q", 0L)
    VersionedTable.append(spark, root, dim((3, "c", 30L)))
    VersionedTable.append(spark, root, dim((4, "d", 40L)))
    val all = Set((1, "a", 10L), (2, "b", 20L), (3, "c", 30L), (4, "d", 40L))
    assert(rowsOf(VersionedTable.read(spark, root)) == all)
    def nFiles(v: Long) = VersionedTable.read(spark, root, Some(v))
      .select(input_file_name()).distinct().count()
    val before = nFiles(4L)
    assert(before >= 4L)
    val v5 = VersionedTable.compact(spark, root, smallFileBytes = 1 << 20)
    assert(v5 == 5L)
    assert(nFiles(5L) == 1L)
    assert(rowsOf(VersionedTable.read(spark, root)) == all)
    // pre-compact version still reads the old layout
    assert(nFiles(4L) == before)
    assert(rowsOf(VersionedTable.read(spark, root, Some(4L))) == all)
    // compacting an already-compact table is a no-op version-wise
    assert(VersionedTable.compact(spark, root, 1 << 20) == 5L)
    // the streaming watermark rode through: batch 0 still deduped
    assert(VersionedTable.streamingUpsert(spark, root,
      dim((9, "STALE", 9L)), Seq("k"), "q", 0L) == 5L)
  }

  test("two concurrent streaming writers both land via CAS retry") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((0, "seed", 0L)))
    val nBatches = 4
    // two writers, disjoint key ranges, racing every batch: losers of
    // the version CAS must retry against the fresh snapshot and land
    val writers = Seq("wa" -> 100, "wb" -> 200).map { case (q, off) =>
      new Thread(() => {
        (0 until nBatches).foreach { b =>
          VersionedTable.streamingUpsert(spark, root,
            dim((off + b, s"$q$b", b.toLong)), Seq("k"), q, b.toLong)
        }
      })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    // every batch from both writers committed exactly once
    assert(VersionedTable.currentVersion(spark, root)
      .contains(1L + 2 * nBatches))
    val got = rowsOf(VersionedTable.read(spark, root))
    val want = Set((0, "seed", 0L)) ++
      (0 until nBatches).flatMap(b =>
        Seq((100 + b, s"wa$b", b.toLong), (200 + b, s"wb$b", b.toLong)))
    assert(got == want)
    // and both watermarks survived the interleaving: stale replays skip
    assert(VersionedTable.streamingUpsert(spark, root,
      dim((999, "STALE", 9L)), Seq("k"), "wa", 0L) == 1L + 2 * nBatches)
    assert(VersionedTable.streamingUpsert(spark, root,
      dim((999, "STALE", 9L)), Seq("k"), "wb", nBatches - 1L) ==
      1L + 2 * nBatches)
  }

  test("readAppendsSince tails appends exactly and refuses rewrites") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L)))
    VersionedTable.append(spark, root, dim((2, "b", 20L)))
    VersionedTable.append(spark, root, dim((3, "c", 30L)))
    assert(rowsOf(VersionedTable.readAppendsSince(spark, root, 1L)) ==
      Set((2, "b", 20L), (3, "c", 30L)))
    assert(rowsOf(VersionedTable.readAppendsSince(spark, root, 2L)) ==
      Set((3, "c", 30L)))
    assert(VersionedTable.readAppendsSince(spark, root, 3L).isEmpty)
    // bounded upper end
    assert(rowsOf(VersionedTable.readAppendsSince(spark, root, 1L,
      toVersion = Some(2L))) == Set((2, "b", 20L)))
    // a rewrite in the range poisons the file diff: refuse, loudly
    VersionedTable.merge(spark, root, dim((1, "a2", 11L)), Seq("k"))
    intercept[IllegalStateException] {
      VersionedTable.readAppendsSince(spark, root, 1L)
    }
    // but a range strictly after the rewrite is clean again
    VersionedTable.append(spark, root, dim((4, "d", 40L)))
    assert(rowsOf(VersionedTable.readAppendsSince(spark, root, 4L)) ==
      Set((4, "d", 40L)))
  }

  test("model check: random op sequences match an in-memory reference") {
    // the table under ANY interleaving of its operations must equal a
    // trivial Map model — the strongest cheap contract for a storage
    // layer (op semantics compose, snapshots never tear, meta rides)
    val rnd = new scala.util.Random(2026)
    (1 to 5).foreach { trial =>
      val root = freshRoot()
      var model = Map[Int, (String, Long)](1 -> ("init", 1L))
      VersionedTable.create(spark, root, dim((1, "init", 1L)))
      var batchId = Map[String, Long]().withDefaultValue(-1L)
      (1 to 12).foreach { step =>
        def freshRows(n: Int): Seq[(Int, String, Long)] =
          (1 to n).map(_ => (rnd.nextInt(30),
            s"t${trial}s$step", rnd.nextInt(100).toLong))
            .groupBy(_._1).map(_._2.head).toSeq // key-unique
        rnd.nextInt(5) match {
          case 0 => // append brand-new keys only (append = no upsert)
            val rows = freshRows(3).map { case (k, n, a) =>
              (k + 1000 * step, n, a) }
            VersionedTable.append(spark, root, dim(rows: _*))
            model ++= rows.map { case (k, n, a) => k -> ((n, a)) }
          case 1 =>
            val rows = freshRows(4)
            VersionedTable.merge(spark, root, dim(rows: _*), Seq("k"))
            model ++= rows.map { case (k, n, a) => k -> ((n, a)) }
          case 2 =>
            val q = s"w${rnd.nextInt(2)}"
            val replay = rnd.nextBoolean() && batchId(q) >= 0
            val id = if (replay) batchId(q) else batchId(q) + 1
            val rows = freshRows(3)
            VersionedTable.streamingUpsert(spark, root, dim(rows: _*),
              Seq("k"), q, id)
            if (!replay) { // replayed batches must not apply
              batchId += q -> id
              model ++= rows.map { case (k, n, a) => k -> ((n, a)) }
            }
          case 3 =>
            VersionedTable.compact(spark, root, smallFileBytes = 1 << 20)
          case 4 =>
            val cur = VersionedTable.currentVersion(spark, root).get
            VersionedTable.vacuum(spark, root,
              keepFrom = (cur - rnd.nextInt(3)) max 1, orphanGraceMs = 0)
        }
        val got = rowsOf(VersionedTable.read(spark, root))
        val want = model.map { case (k, (n, a)) => (k, n, a) }.toSet
        assert(got == want, s"trial $trial step $step diverged")
      }
    }
  }

  test("vacuum sweeps torn-write orphan dirs past the grace window") {
    val root = freshRoot()
    VersionedTable.create(spark, root, dim((1, "a", 10L)))
    // simulate a torn write: a data dir no manifest ever referenced
    val orphan = new java.io.File(s"$root/data/orphan-fake-uuid")
    orphan.mkdirs()
    val junk = new java.io.File(orphan, "part-00000.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    // inside the grace window: a mid-flight commit must NOT be eaten
    VersionedTable.vacuum(spark, root, keepFrom = 1L,
      orphanGraceMs = 3600L * 1000)
    assert(junk.exists())
    // past the grace window: swept
    VersionedTable.vacuum(spark, root, keepFrom = 1L, orphanGraceMs = -1000L)
    assert(!orphan.exists())
    // the referenced data survived both sweeps
    assert(rowsOf(VersionedTable.read(spark, root)) == Set((1, "a", 10L)))
  }
}
