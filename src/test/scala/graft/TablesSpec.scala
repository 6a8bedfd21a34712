package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Physical-type robustness of the events loader. Round 10 lost 15
  * oracle rows because the driver regenerated events.parquet with a
  * different timestamp unit (ns→µs) and the loader hard-assumed the
  * old one; these fixtures pin all three physical encodings of the
  * SAME five logical rows through [[Tables.loadEvents]], so the next
  * regeneration is caught by `sbt test` instead of by the oracle gate.
  *
  *  - fixtures/events_ns  — TIMESTAMP(NANOS), the pre-round-10 layout
  *    (Spark surfaces it as BIGINT nanos under nanosAsLong)
  *  - fixtures/events_us  — timestamp[us] isAdjustedToUTC=false, the
  *    current layout (reads as TIMESTAMP_NTZ)
  *  - fixtures/events_utc — timestamp[us] isAdjustedToUTC=true
  *    (reads as TIMESTAMP; stripped to NTZ under the UTC session tz)
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private val allFixtures = Seq("events_ns", "events_us", "events_utc")

  test("loadEvents canonicalizes every physical ts encoding to TIMESTAMP_NTZ") {
    for (f <- allFixtures) {
      val df = Tables.loadEvents(spark, fixture(f))
      assert(df.schema("ts").dataType == TimestampNTZType,
        s"$f: expected TIMESTAMP_NTZ, got ${df.schema("ts").dataType}")
    }
  }

  test("all three encodings load the identical rows (ns truncated to µs)") {
    val collected = allFixtures.map { f =>
      f -> Tables.loadEvents(spark, fixture(f))
        .orderBy("event_id")
        .collect().map(_.toSeq).toSeq
    }
    val (refName, ref) = collected.head
    for ((f, rows) <- collected.tail)
      assert(rows == ref, s"$f rows differ from $refName")
    // pin one absolute value: 1704067200123456789 ns → 2024-01-01
    // 00:00:00.123456 (sub-µs tail truncated, not rounded)
    val ts0 = ref.head(1).asInstanceOf[java.time.LocalDateTime]
    assert(ts0 == java.time.LocalDateTime.parse("2024-01-01T00:00:00.123456"))
  }

  test("windowed aggregation works over every encoding") {
    val results = allFixtures.map { f =>
      Streams.tumblingAgg(Tables.loadEvents(spark, fixture(f)))
        .orderBy("ws", "event_type").collect().map(_.toSeq).toSeq
    }
    assert(results.distinct.size == 1)
    assert(results.head.nonEmpty)
  }

  test("the nanos sniff walks partitioned layouts (nested data files)") {
    // same ns fixture, laid out as Spark's own partitionBy would write
    // it: events.parquet/ as a DIRECTORY with a partition subdir
    val root = java.nio.file.Files.createTempDirectory("graft_evt").toFile
    val dataDir = new java.io.File(root, "events.parquet/dt=2024-01-01")
    assert(dataDir.mkdirs())
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(fixture("events_ns"), "events.parquet"),
      dataDir.toPath.resolve("part-00000.parquet"))
    val df = Tables.loadEvents(spark, root.toString)
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.count() == 5)
  }

  test("nanosAsLong is only set when the footer carries NANOS") {
    val fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    Tables.load(fresh, fixture("events_us"), "events").count()
    assert(fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false",
      "µs parquet must not flip the session-global nanos flag")
    Tables.load(fresh, fixture("events_ns"), "events").count()
    assert(fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }
}
