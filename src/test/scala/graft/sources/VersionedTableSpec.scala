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
}
