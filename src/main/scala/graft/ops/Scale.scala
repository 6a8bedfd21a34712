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
    * Z-order for one dimension). One count action to size the layout,
    * one range exchange to write it. Returns the number of part files
    * ACTUALLY written — the sampling-based range partitioner may leave
    * partitions empty under duplicate or skewed sort keys, and empty
    * partitions write no file, so the observed count is the contract,
    * not the requested one. */
  def compactWrite(df: DataFrame, path: String, targetRowsPerFile: Long,
      sortCols: Seq[String]): Int = {
    require(targetRowsPerFile > 0 && sortCols.nonEmpty,
      s"need positive target and sort cols: $targetRowsPerFile, $sortCols")
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
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
    * runtime; explicit salting is for the planned-ahead case (known hot
    * keys, or aggregations AQE can't split). The salt is internal —
    * output columns equal a plain inner join's. */
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
