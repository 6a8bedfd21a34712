package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Incremental materialized-view maintenance over a [[VersionedTable]]
  * — the classic IVM shape (Griffin & Libkin, SIGMOD 1995; what
  * Materialize / Delta Live Tables sell): a grouped COUNT/SUM
  * aggregate kept up to date from the base table's row-level change
  * feed instead of re-aggregating the table.
  *
  * This is the 100 TB refresh path: a full recompute re-shuffles the
  * entire base table every cycle, while [[refresh]] reads ONLY the
  * change feed of the new commits ([[VersionedTable.readChanges]] —
  * per-commit change files and appended-file diffs, never a full
  * scan) and merges per-group deltas into the state table with a
  * file-granular [[VersionedTable.streamingApply]] commit. Work per
  * refresh is O(churn), not O(table).
  *
  * State model (the textbook one that survives deletes): per group,
  * `cnt` = COUNT(*), and per tracked column c, `nn_c` = COUNT(c)
  * (non-null) and `raw_c` = zero-filled SUM(c). Inserts add, deletes
  * subtract — COUNT and SUM are the self-maintainable aggregates;
  * `read` reconstructs SQL semantics exactly (`SUM` is NULL iff no
  * non-null value remains, AVG = raw/nn). MIN/MAX are NOT
  * self-maintainable under deletes and are deliberately out of scope
  * — a deleted extremum needs a rescan of the group, a different
  * operator.
  *
  * Exactness: incremental state equals a from-scratch recompute
  * EXACTLY for integer / long / decimal sum columns (associative
  * arithmetic; use the money-as-cents discipline). Float sums drift
  * by summation order like any distributed SUM.
  *
  * Consistency: the watermark (last applied base version) rides the
  * SAME atomic commit as the merged state — the
  * [[VersionedTable.streamingApply]] (queryName, batchId) transaction
  * pattern with batchId = base version — so "delta applied" and
  * "watermark advanced" can never diverge, and a crashed or replayed
  * refresh is a no-op. Concurrent refreshers are safe by the same
  * mechanism: each writes ABSOLUTE post-delta state for the groups it
  * touched, computed from a base-version range, and the monotonic
  * batchId drops the stale writer.
  */
object MaterializedView {

  /** Streaming-transaction identity of the maintenance writer; the
    * watermark lives at `stream.mv_refresh.batch` in the MV manifest. */
  private val Query = "mv_refresh"
  private val WatermarkKey = s"stream.$Query.batch"
  private val KeysKey = "mv.keys"
  private val SumsKey = "mv.sums"

  private def zero(dt: DataType): Column = lit(0).cast(dt)

  /** Full-aggregate state of `df`: (keys..., cnt, [nn_c, raw_c]...). */
  private def stateOf(df: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +: sums.flatMap(c => Seq(
      sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"nn_$c"),
      sum(col(c)).as(s"raw_$c")))
    val raw = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // zero-fill all-null sums so state arithmetic never meets NULL;
    // read() reconstructs the SQL NULL from nn_c
    raw.select(keys.map(col) ++ (col("cnt") +: sums.flatMap(c => Seq(
      col(s"nn_$c"),
      coalesce(col(s"raw_$c"),
        zero(raw.schema(s"raw_$c").dataType)).as(s"raw_$c")))): _*)
  }

  /** Materialize `SELECT keys, COUNT(*), SUM(c)... GROUP BY keys` of
    * the base table's CURRENT version into a new versioned table at
    * `mvRoot`. The definition and the initial watermark ride version
    * 1's manifest atomically. */
  def create(spark: SparkSession, baseRoot: String, mvRoot: String,
      keys: Seq[String], sums: Seq[String]): Long = {
    require(keys.nonEmpty, "materialized view needs grouping keys")
    (keys ++ sums).foreach(c => require(
      c.nonEmpty && !c.exists(ch => ch == ',' || ch == '=' || ch == '\n'
        || ch == '\r'),
      s"bad column name '$c' (',', '=', newline are reserved)"))
    require(keys.intersect(sums).isEmpty,
      s"columns cannot be both key and sum: ${keys.intersect(sums)}")
    val bv = VersionedTable.currentVersion(spark, baseRoot).getOrElse(
      throw new IllegalArgumentException(s"$baseRoot: no versioned table"))
    val snap = VersionedTable.read(spark, baseRoot, Some(bv))
    VersionedTable.create(spark, mvRoot, stateOf(snap, keys, sums),
      meta = Map(WatermarkKey -> bv.toString,
        KeysKey -> keys.mkString(","),
        SumsKey -> sums.mkString(",")))
  }

  private def definition(m: VersionedTable.Manifest)
      : (Seq[String], Seq[String], Long) = {
    def split(k: String): Seq[String] =
      m.meta.get(k).map(_.split(',').toSeq.filter(_.nonEmpty))
        .getOrElse(Seq.empty)
    val keys = split(KeysKey)
    require(keys.nonEmpty, "not a materialized view (no mv.keys meta)")
    (keys, split(SumsKey), m.meta(WatermarkKey).toLong)
  }

  /** Advance the view to the base table's current version by applying
    * the change feed (watermark, current]: one grouped aggregate over
    * the delta, one keyed join against the touched groups' stored
    * state, one atomic file-granular commit. Groups whose count
    * reaches zero are deleted from the view; a negative count —
    * impossible from a consistent feed — refuses loudly instead of
    * materializing a corrupt state. Returns the MV version (unchanged
    * if the base has not advanced). */
  def refresh(spark: SparkSession, baseRoot: String,
      mvRoot: String): Long = {
    val mvV = VersionedTable.currentVersion(spark, mvRoot).getOrElse(
      throw new IllegalArgumentException(s"$mvRoot: no versioned table"))
    val m = VersionedTable.readManifest(spark, mvRoot, mvV)
    val (keys, sums, last) = definition(m)
    val bv = VersionedTable.currentVersion(spark, baseRoot).getOrElse(
      throw new IllegalArgumentException(s"$baseRoot: no versioned table"))
    if (bv <= last) return mvV

    val rawType: Map[String, DataType] =
      sums.map(c => c -> m.schema(s"raw_$c").dataType).toMap
    val delta = VersionedTable.readChanges(spark, baseRoot, last, Some(bv))
    val sgn = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val dAggs = sum(sgn).as("d_cnt") +: sums.flatMap(c => Seq(
      sum(when(col(c).isNotNull, sgn).otherwise(0L)).as(s"dnn_$c"),
      coalesce(sum(when(col(c).isNotNull, col(c).cast(rawType(c)) * sgn)),
        zero(rawType(c))).as(s"draw_$c")))
    val d = delta.groupBy(keys.map(col): _*).agg(dAggs.head, dAggs.tail: _*)

    // left join: only groups the delta touched matter; an untouched
    // group's files are never rewritten (streamingApply is keyed COW)
    val state = VersionedTable.read(spark, mvRoot, Some(mvV))
    val joined = d.join(state, keys, "left")
    val newCnt = coalesce(col("cnt"), lit(0L)) + col("d_cnt")
    val guardedCnt = when(newCnt < 0, raise_error(concat(
        lit(s"materialized view $mvRoot: negative group count applying " +
          s"base versions ($last, $bv] — inconsistent change feed for key "),
        concat_ws(",", keys.map(k => col(k).cast("string")): _*)))
      .cast("long")).otherwise(newCnt)
    val outCols = keys.map(col) ++ (guardedCnt.as("cnt") +:
      sums.flatMap(c => Seq(
        (coalesce(col(s"nn_$c"), lit(0L)) + col(s"dnn_$c")).as(s"nn_$c"),
        (coalesce(col(s"raw_$c"), zero(rawType(c))) + col(s"draw_$c"))
          .cast(rawType(c)).as(s"raw_$c"))))
    // materialize the per-group post-delta state ONCE: it is tiny
    // (one row per TOUCHED group) but its lineage is the whole
    // delta-scan + aggregate + state join, which streamingApply's
    // commit machinery would otherwise re-execute for the touch
    // probe, the rewrite, and the write
    val next = joined.select(outCols: _*).localCheckpoint(eager = true)
    val upserts = next.filter(col("cnt") > 0)
      .select(m.schema.fieldNames.map(col).toIndexedSeq: _*)
    val delKeys = next.filter(col("cnt") === 0)
      .select(keys.map(col): _*)
    VersionedTable.streamingApply(spark, mvRoot, upserts, delKeys, keys,
      Query, batchId = bv)
  }

  /** The view with SQL aggregate semantics restored: (keys..., cnt,
    * sum_c...) where `sum_c` is NULL iff the group holds no non-null
    * value of c — exactly `SELECT keys, COUNT(*) AS cnt, SUM(c) AS
    * sum_c ... GROUP BY keys` over the base snapshot at the
    * watermark. */
  def read(spark: SparkSession, mvRoot: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(VersionedTable.currentVersion(spark, mvRoot))
      .getOrElse(throw new IllegalArgumentException(
        s"$mvRoot: no versioned table"))
    val m = VersionedTable.readManifest(spark, mvRoot, v)
    val (keys, sums, _) = definition(m)
    VersionedTable.read(spark, mvRoot, Some(v))
      .select(keys.map(col) ++ (col("cnt") +: sums.map(c =>
        when(col(s"nn_$c") > 0, col(s"raw_$c")).as(s"sum_$c"))): _*)
  }

  /** Last applied base version (the refresh watermark). */
  def watermark(spark: SparkSession, mvRoot: String): Long = {
    val v = VersionedTable.currentVersion(spark, mvRoot).getOrElse(
      throw new IllegalArgumentException(s"$mvRoot: no versioned table"))
    definition(VersionedTable.readManifest(spark, mvRoot, v))._3
  }
}
