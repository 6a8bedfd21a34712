package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for the two shuffle patterns the operator layer
  * can't fix declaratively: repeated co-located joins (bucketing) and
  * skewed keys (salting). SURVEY §7.4 item 5 calls both out for the
  * 100 TB posture of the incremental-load pattern.
  */
object Scale {

  /** Write `df` as a bucketed+sorted managed table: a join or aggregate
    * on `keys` between tables bucketed the same way needs NO shuffle —
    * the scan's output partitioning already satisfies the join's
    * requirement (verified by ScaleSpec: the joint plan has no
    * Exchange). This is the persisted analog of `repartition` for
    * pipelines that hit the same fact table repeatedly. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Size-targeted compaction with range clustering — the
    * small-files / data-skipping layout pass every long-lived 100 TB
    * table needs: `ceil(n / targetRowsPerFile)` output files, rows
    * range-partitioned AND sorted on `sortCols`, so each file owns a
    * DISJOINT key range and min/max footer stats prune file reads for
    * any range or point predicate on the sort key (the poor-man's
    * Z-order for one dimension; see [[compactWriteZ]] for two). One
    * sizing action, one range exchange to write. Returns the number of
    * part files ACTUALLY written — the sampling-based range partitioner
    * may leave partitions empty under duplicate or skewed sort keys,
    * and empty partitions write no file, so the observed count is the
    * contract, not the requested one. */
  def compactWrite(df: DataFrame, path: String, targetRowsPerFile: Long,
      sortCols: Seq[String]): Int = {
    require(targetRowsPerFile > 0 && sortCols.nonEmpty,
      s"need positive target and sort cols: $targetRowsPerFile, $sortCols")
    withSizingSource(df) { src =>
      val n = src.count()
      val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      src.repartitionByRange(files, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(path)
    }
    countPartFiles(df, path)
  }

  /** Two-dimensional data skipping: compaction clustered on the
    * INTERLEAVED BITS of two columns (the Z-order / Morton curve —
    * what Delta's OPTIMIZE ZORDER BY does for its file layout). Each
    * column is normalized to a 16-bit grid cell (bounds from one tiny
    * min/max aggregate, fused with the sizing count into a single
    * action), the two cell numbers are bit-interleaved into one 32-bit
    * Z value with the classic shift-and-mask spread (all codegen'd
    * column arithmetic — no UDF), and files are range-partitioned +
    * sorted on Z. Because the Z curve preserves locality in BOTH
    * dimensions, each file's min/max footer stats are narrow on BOTH
    * columns, so a predicate on EITHER prunes file reads — the
    * property a single-dimension sort cannot give (its second column
    * spans the full range in every file; q126 asserts the pruning on
    * each dimension in-query). NULLs in either column Z-sort first.
    * Same observed-file-count contract as [[compactWrite]]. */
  def compactWriteZ(df: DataFrame, path: String, targetRowsPerFile: Long,
      colA: String, colB: String): Int = {
    require(targetRowsPerFile > 0, s"need positive target: $targetRowsPerFile")
    withSizingSource(df) { src =>
      val r = src.agg(count(lit(1)),
        min(col(colA)).cast("double"), max(col(colA)).cast("double"),
        min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
      val n = r.getLong(0)
      val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      def bound(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
      val z = zValue(col(colA), bound(1), bound(2),
        col(colB), bound(3), bound(4))
      src.withColumn("__graft_z", z)
        .repartitionByRange(files, col("__graft_z"))
        .sortWithinPartitions(col("__graft_z"))
        .drop("__graft_z")
        .write.mode("overwrite").parquet(path)
    }
    countPartFiles(df, path)
  }

  /** Morton code of N columns (2 ≤ N ≤ 6), each normalized to a
    * min(16, 62/N)-bit grid over its [lo, hi]: bit j of column i lands
    * at position j·N + i, so every column's bits interleave at equal
    * weight and a range predicate on ANY of the N columns maps to a
    * bounded span of the curve — the property that makes per-file
    * min/max stats narrow on every clustered dimension at once. Pure
    * column arithmetic (codegen'd, map-only, ~bits·N OR terms — a
    * one-time rewrite job). Shared with the versioned table's Z-order
    * clustering. */
  private[graft] def zValueN(cols: Seq[(Column, Double, Double)]): Column = {
    require(cols.size >= 2 && cols.size <= 6,
      s"Z-order interleave needs 2..6 columns, got ${cols.size}")
    val k = cols.size
    val bits = math.min(16, 62 / k)
    def cell(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) *
          lit((1L << bits).toDouble)).cast("long")))
    cols.zipWithIndex.map { case ((c, lo, hi), i) =>
      val cl = cell(c, lo, hi)
      (0 until bits).map(j => shiftleft(
          shiftright(cl, j).bitwiseAND(lit(1L)), j * k + i): Column)
        .reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** The 2-column Morton code ([[zValueN]] with N = 2: colA on even
    * bits, colB on odd — colB owns the most significant bit). */
  private[graft] def zValue(a: Column, loA: Double, hiA: Double,
      b: Column, loB: Double, hiB: Double): Column =
    zValueN(Seq((a, loA, hiA), (b, loB, hiB)))

  /** Sizing policy shared by the compaction writers: both need one
    * action over the input BEFORE the write (row count / grid bounds).
    * When the input is a bare scan — optionally under pushdown-able
    * Project/Filter — that extra action reads only metadata / pruned
    * columns, and caching the full-width rows would cost more than it
    * saves, so the input runs as-is. Any heavier plan (joins,
    * aggregates, non-parquet sources) is persisted so the source is
    * scanned ONCE: the sizing action fills the cache, the write drains
    * it, and the blocks are dropped before returning. */
  private def withSizingSource(df: DataFrame)(body: DataFrame => Unit): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Project}
    @annotation.tailrec
    def scanCheap(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case pr: Project => scanCheap(pr.child)
      case f: LFilter => scanCheap(f.child)
      case _ => false
    }
    val cheap = scanCheap(df.queryExecution.optimizedPlan)
    val src = if (cheap) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try body(src)
    finally if (!cheap) { src.unpersist(blocking = true); () }
  }

  private def countPartFiles(df: DataFrame, path: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path),
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(_.getPath.getName.startsWith("part-"))
  }

  /** Skew-safe inner equi-join: every left row gets a random salt in
    * [0, saltFactor); the right side is replicated across all salts, so
    * one hot key spreads over `saltFactor` reducers instead of one.
    * AQE's skew-join split handles sort-merge cases adaptively at
    * runtime; explicit salting is for the shapes AQE cannot split
    * (full-outer joins, reused exchanges, pre-planned bucketings) or
    * deployments with AQE off. The salt is internal — output columns
    * equal a plain inner join's.
    *
    * MEASURED under a worst-case hot key (50% of a 40M-row fact on one
    * key, dim past broadcast size — `tools/gen_skew.py` +
    * `graft.tools.SkewBench`, table in SCALING.md "Skew, measured"):
    * unsalted with AQE skew-split off, the straggler task runs 7× the
    * median task (16.8 s wall); saltFactor=8 flattens it to 2× (5.4 s,
    * also beating AQE's runtime split at 7.4 s — the split happens
    * AFTER the skewed shuffle files exist, salting avoids writing them
    * skewed at all).
    *
    * The `saltFactor` dial: the hot partition shrinks ~linearly in it
    * while the REPLICATED side's shuffle grows ×saltFactor, so past
    * `hotShare × factRows / (rightRows)` the replication dominates —
    * measured: factor 8 = 5.4 s vs factor 32 = 13.6 s on the same data
    * (the 2M-row dim exploded to 64M rows). Size it to bring
    * hot-key-rows / saltFactor near the normal per-reducer row count,
    * and prefer [[saltedJoinBy]]'s deterministic salt when results
    * feed a hash-compared oracle. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = left.withColumn("__graft_salt",
      (rand(42L) * saltFactor).cast("int"))
    val r = right.withColumn("__graft_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, keys :+ "__graft_salt", "inner").drop("__graft_salt")
  }

  /** Deterministic variant for tests/oracles: salt from a hash of
    * `saltOn` instead of rand(). */
  def saltedJoinBy(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, saltOn: Column): DataFrame = {
    val l = left.withColumn("__graft_salt",
      pmod(xxhash64(saltOn), lit(saltFactor.toLong)).cast("int"))
    val r = right.withColumn("__graft_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, keys :+ "__graft_salt", "inner").drop("__graft_salt")
  }

  /** Derive the salt factor from the LEFT side's own key histogram —
    * the auto-dial (r13 verdict item 10) so the 100 TB user doesn't
    * hand-tune [[saltedJoinBy]]. One map-side-combined aggregate over
    * the (optionally sampled) keys yields the hottest key's share and
    * the total; the factor is how many fair partition shares the
    * hottest key occupies:
    *
    *   factor = ceil(maxKeyRows / (totalRows / shufflePartitions))
    *
    * clamped to [1, maxFactor]. A uniform key space derives factor 1
    * and [[saltedJoinAuto]] then skips salting entirely (zero overhead
    * on the non-skewed path). The histogram pass shuffles O(distinct
    * sampled keys) rows (map-side combine) — at billions of distinct
    * keys set `sampleFraction` < 1: relative frequencies of the hot
    * keys (the only thing the formula reads) survive uniform sampling,
    * and the fair-share denominator scales identically so the ratio is
    * unbiased wherever the hot key has sample mass at all. */
  def hotKeyFactor(df: DataFrame, keys: Seq[String],
      sampleFraction: Double = 1.0, maxFactor: Int = 64): Int = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction $sampleFraction out of (0, 1]")
    val partitions =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sampled =
      if (sampleFraction >= 1.0) df
      else df.sample(withReplacement = false, sampleFraction, seed = 42L)
    val r = sampled.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__mx"), sum(col("__n")).as("__total"))
      .head()
    if (r.isNullAt(0)) 1 // empty input: nothing to spread
    else {
      val mx = r.getLong(0)
      val total = r.getLong(1)
      val fair = math.max(1L, total / math.max(1, partitions))
      math.min(maxFactor.toLong,
        math.max(1L, (mx + fair - 1) / fair)).toInt
    }
  }

  /** [[saltedJoinBy]] with the factor derived by [[hotKeyFactor]];
    * factor 1 (no observed skew) takes the plain join — the auto path
    * costs nothing when the data isn't skewed. Returns the joined
    * frame plus the factor it chose (for logging/regression pinning;
    * SkewBench measures the auto dial within range of the hand-tuned
    * factor on the worst-case 50%-hot-key workload). */
  def saltedJoinAuto(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltOn: Column, sampleFraction: Double = 1.0,
      maxFactor: Int = 64): (DataFrame, Int) = {
    val factor = hotKeyFactor(left, keys, sampleFraction, maxFactor)
    if (factor <= 1) (left.join(right, keys, "inner"), 1)
    else (saltedJoinBy(left, right, keys, factor, saltOn), factor)
  }

  /** Checksum prefilter for incremental loads (SURVEY §7.4 item 5 —
    * the engine optimization the reference's codegen can't express):
    * instead of full-outer-joining BOTH complete sides, first join only
    * the narrow (key, checksum) projections to find keys that are new,
    * removed, or changed, then semi-join each full side down to those
    * keys. The wide-row shuffle then carries only the churn — at 1%
    * daily change that is a ~100x reduction in shuffled bytes; the
    * narrow pre-join shuffles a few dozen bytes per row.
    *
    * Returns (feedChanged, targetChanged): the full-row subsets whose
    * keys need processing. Feeding them to the usual merge-join/split
    * or SCD logic yields the same changed-row output as the unfiltered
    * pipeline (ScaleSpec asserts equality); rows with matching
    * checksums on both sides never leave their scan. */
  def changedKeys(feed: DataFrame, target: DataFrame, keys: Seq[String],
      feedChecksum: Column, targetChecksum: Column): (DataFrame, DataFrame) = {
    val f = feed.select(keys.map(col) :+ feedChecksum.as("__cs_f"): _*)
    val t = target.select(keys.map(col) :+ targetChecksum.as("__cs_t"): _*)
    val delta = f.join(t, keys, "full_outer")
      .filter(!(col("__cs_f") <=> col("__cs_t")))
      .select(keys.map(col): _*)
      .persist()
    delta.count()
    (feed.join(delta, keys, "left_semi"), target.join(delta, keys, "left_semi"))
  }
}
