package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** An in-repo ACID table: versioned-manifest copy-on-write parquet —
  * the storage layer the reference reaches for Delta for
  * (/root/reference/mapping/enhanced_json_mapper.py:2042-2074 writes
  * `format("delta")` and merges on Databricks). This build ships no
  * Delta jar, so the same guarantees are built from first principles,
  * the way the public table formats (Delta's transaction log, Iceberg's
  * snapshot manifests) do it:
  *
  *  - **Data files are immutable.** Every commit writes NEW parquet
  *    files under `data/<commit-uuid>/`; nothing is ever modified in
  *    place. A mutation rewrites only the files that contain matched
  *    keys (file-granular copy-on-write) and carries every other file
  *    into the next manifest untouched — at 100 TB a merge touching
  *    0.1% of keys rewrites ~0.1% of files, not the table.
  *  - **A snapshot is a manifest.** `_manifests/v<N>.manifest` lists
  *    the data files (plus the schema) that make up version N. Readers
  *    resolve the highest published manifest ONCE and then read a
  *    frozen file list — a concurrent commit cannot tear a scan.
  *  - **Commit = atomic manifest publish.** The manifest is written to
  *    a dot-temp name and atomically renamed into place; a crash at
  *    ANY earlier point leaves only invisible garbage (orphan data
  *    dirs, dot-temp manifests) and the previous snapshot intact.
  *    VersionedTableSpec simulates the torn-write points.
  *  - **Optimistic concurrency.** A committer reserves exactly
  *    `base+1` via atomic create-exclusive on a `.lock` file; losing
  *    the race throws [[VersionedTable.CommitConflict]] — re-read,
  *    recompute, retry (the Delta/Iceberg OCC loop). The lock
  *    PERSISTS after publish as the version's reservation tombstone
  *    (deleting it would reopen the race for a committer still
  *    holding the old base — proven by the two-writer race spec);
  *    vacuum sweeps tombstones with their versions. A committer that
  *    crashed after reserving leaves an orphan lock; [[recover]]
  *    clears it once the holder is known dead. A multi-writer
  *    production deployment would put the reservation in a catalog
  *    service or a conditional put — the single creation point to
  *    swap, exactly like the reference swaps in Databricks' Delta.
  *
  * Paths go through the Hadoop FileSystem API, so the same code runs
  * against HDFS (where rename/create-exclusive are atomic by contract);
  * plain S3 would need the usual committer caveats.
  */
object VersionedTable {

  final class CommitConflict(msg: String)
    extends RuntimeException(msg)

  private val Magic = "graft-versioned-table v1"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(root: String) = new Path(root, "_manifests")
  private def manifestPath(root: String, v: Long) =
    new Path(manifestDir(root), f"v$v%020d.manifest")
  private def lockPath(root: String, v: Long) =
    new Path(manifestDir(root), f"v$v%020d.lock")

  private val ManifestRe = """v(\d{20})\.manifest""".r

  /** Highest published version, or None for a non-table path. One
    * directory listing — the only metadata read a snapshot needs. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return None
    val vs = f.listStatus(dir).map(_.getPath.getName).collect {
      case ManifestRe(d) => d.toLong
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  private final case class Manifest(version: Long, schema: StructType,
      files: Seq[String], meta: Map[String, String])

  private def readManifest(spark: SparkSession, root: String,
      v: Long): Manifest = {
    val p = manifestPath(root, v)
    val in = fs(spark, p).open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    require(lines.headOption.contains(Magic),
      s"$p is not a ${Magic} manifest")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(lines(1).stripPrefix("schema=")).asInstanceOf[StructType]
    // `meta k=v` lines ride between the schema and the file list —
    // table-level key-values that must move ATOMICALLY with the data
    // (streaming batch watermarks); relative file paths never start
    // with "meta "
    val (metaLines, fileLines) =
      lines.drop(2).filter(_.nonEmpty).partition(_.startsWith("meta "))
    val meta = metaLines.map { l =>
      val kv = l.stripPrefix("meta ")
      val i = kv.indexOf('=')
      require(i > 0, s"$p: bad meta line '$l'")
      kv.take(i) -> kv.drop(i + 1)
    }.toMap
    Manifest(v, schema, fileLines, meta)
  }

  /** Publish `files` (+ `meta`) as version `base + 1`. Atomic:
    * create-exclusive lock reservation (CAS — loser gets
    * [[CommitConflict]]), then write-temp + rename. */
  private def commit(spark: SparkSession, root: String, base: Long,
      schema: StructType, files: Seq[String],
      meta: Map[String, String] = Map.empty): Long = {
    val next = base + 1
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val lock = lockPath(root, next)
    try f.create(lock, /*overwrite=*/ false).close()
    catch {
      case _: java.io.IOException => throw new CommitConflict(
        s"version $next of $root is already reserved or published — " +
          "re-read the table, recompute against the new snapshot, and " +
          "retry (or run recover() if a committer died mid-commit)")
    }
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try {
      val w = new java.io.OutputStreamWriter(out, "UTF-8")
      w.write(Magic + "\n")
      w.write("schema=" + schema.json + "\n")
      meta.toSeq.sortBy(_._1).foreach { case (k, v) =>
        require(!k.contains('=') && !(k + v).exists(c => c == '\n' || c == '\r'),
          s"bad meta entry '$k'='$v'")
        w.write(s"meta $k=$v\n")
      }
      files.foreach(p => w.write(p + "\n"))
      w.flush(); w.close()
    } finally if (out != null) try out.close() catch { case _: Throwable => }
    // atomic publish: the manifest appears complete or not at all.
    // The lock is NOT deleted — it persists as the version's
    // reservation tombstone. Deleting it after publish reopens the
    // race: a concurrent committer that read the OLD current version
    // could then create-exclusive the same lock and collide with the
    // published manifest (a lost update — caught by the two-writer
    // race spec). Tombstones are swept with their version by vacuum.
    if (!f.rename(tmp, manifestPath(root, next)))
      throw new java.io.IOException(s"rename to v$next manifest failed")
    next
  }

  /** Clear the orphan lock a crashed committer left at current+1 —
    * call only when the holder is known dead (production: a catalog
    * service with leases makes this automatic). */
  def recover(spark: SparkSession, root: String): Unit = {
    val cur = currentVersion(spark, root).getOrElse(0L)
    val lock = lockPath(root, cur + 1)
    val f = fs(spark, lock)
    if (f.exists(lock) && !f.exists(manifestPath(root, cur + 1)))
      f.delete(lock, false)
  }

  /** Write `df` into new immutable files under data/<uuid>/ and return
    * their root-relative paths. Runs BEFORE any manifest is touched —
    * a crash leaves an invisible orphan dir. */
  private def writeData(spark: SparkSession, root: String,
      df: DataFrame): Seq[String] = {
    val sub = s"data/${java.util.UUID.randomUUID()}"
    val abs = new Path(root, sub)
    df.write.parquet(abs.toString)
    val f = fs(spark, abs)
    f.listStatus(abs).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted
      .map(n => s"$sub/$n").toSeq
  }

  /** Create the table at `root` with `df` as version 1. */
  def create(spark: SparkSession, root: String, df: DataFrame): Long = {
    require(currentVersion(spark, root).isEmpty,
      s"$root already holds a versioned table")
    commit(spark, root, 0L, df.schema, writeData(spark, root, df))
  }

  /** The snapshot a reader pins: resolve the manifest once, scan only
    * its files. `version = None` → latest; `Some(v)` → time travel. */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"$root: no versioned table"))
    val m = readManifest(spark, root, v)
    if (m.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        m.schema)
    else
      spark.read.schema(m.schema)
        .parquet(m.files.map(f => new Path(root, f).toString): _*)
  }

  /** Append-only commit: new files, no rewrite, manifest grows. */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val base = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root: no versioned table"))
    val m = readManifest(spark, root, base)
    val aligned = df.select(m.schema.fieldNames.map(col).toIndexedSeq: _*)
    commit(spark, root, base, m.schema,
      m.files ++ writeData(spark, root, aligned), m.meta)
  }

  /** Shared copy-on-write core: split the current snapshot into the
    * files that contain a key matched by `source` (rewritten) and the
    * rest (carried unchanged into the next manifest), build the
    * replacement rows with `rebuild(affectedRows, source, fullTarget)`,
    * and commit. Spark part-file names embed a job UUID, so matching
    * manifest entries by file name is exact. */
  private def cowCommit(spark: SparkSession, root: String,
      source: DataFrame, keys: Seq[String],
      // evaluated on the base manifest INSIDE the commit attempt, so a
      // meta guard (streaming batch watermark) sees exactly the
      // snapshot the commit builds on; None → already applied, skip
      metaUpdate: Map[String, String] => Option[Map[String, String]] =
        m => Some(m))(
      rebuild: (DataFrame, DataFrame, DataFrame) => DataFrame): Long = {
    val base = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root: no versioned table"))
    val m = readManifest(spark, root, base)
    val nextMeta = metaUpdate(m.meta) match {
      case Some(nm) => nm
      case None => return base // idempotent replay: nothing to do
    }
    val target = read(spark, root, Some(base))
    val srcKeys = source.select(keys.map(col): _*).dropDuplicates(keys)
    // rows matched per file → distinct file names: the collect is
    // bounded by the FILE count, never the row count
    val affectedNames: Set[String] =
      if (m.files.isEmpty) Set.empty
      else target.withColumn("__vt_file", input_file_name())
        .join(srcKeys, keys.map(k =>
          target(k) <=> srcKeys(k)).reduceOption(_ && _).getOrElse(lit(true)))
        .select(col("__vt_file")).distinct()
        .collect().map(r => new Path(r.getString(0)).getName).toSet
    val (affectedRel, keptRel) =
      m.files.partition(f => affectedNames.contains(new Path(f).getName))
    val affectedRows =
      if (affectedRel.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
      else spark.read.schema(m.schema)
        .parquet(affectedRel.map(f => new Path(root, f).toString): _*)
    val replacement = rebuild(affectedRows, source, target)
      .select(m.schema.fieldNames.map(col).toIndexedSeq: _*)
    val newRel =
      if (replacement.isEmpty) Seq.empty
      else writeData(spark, root, replacement)
    commit(spark, root, base, m.schema, keptRel ++ newRel, nextMeta)
  }

  /** MERGE INTO: matched target rows take the source's `setCols`
    * (default: every non-key column), unmatched source rows are
    * inserted, `deleteMatched` turns the matched branch into WHEN
    * MATCHED THEN DELETE. File-granular: only files containing a
    * matched key are rewritten. */
  def merge(spark: SparkSession, root: String, source: DataFrame,
      keys: Seq[String], setCols: Option[Seq[String]] = None,
      insertUnmatched: Boolean = true,
      deleteMatched: Boolean = false): Long =
    cowCommit(spark, root, source, keys) { (affected, src, full) =>
      val cols = full.columns.toSeq
      val s = src.select(cols.map(col): _*)
      val rewritten =
        if (deleteMatched) graft.ops.Mutations.applyDelete(affected, s, keys)
        else graft.ops.Mutations.applyUpdate(affected, s, keys,
          setCols.getOrElse(cols.filterNot(keys.contains)))
      val inserts =
        if (insertUnmatched && !deleteMatched)
          s.dropDuplicates(keys).join(full, keys, "left_anti")
        else s.limit(0)
      rewritten.unionByName(inserts)
    }

  /** SCD Type 2 against the stored dimension: expire changed current
    * rows, insert fresh versions ([[graft.ops.Mutations.scdType2]]
    * semantics), rewriting only the files that hold a matched key. */
  def scdType2Commit(spark: SparkSession, root: String, feed: DataFrame,
      keys: Seq[String], trackedCols: Seq[String], runStamp: String): Long =
    cowCommit(spark, root, feed, keys) { (affected, f, full) =>
      // brand-new keys (no current row anywhere) insert through the
      // same call: scdType2's full-outer join emits them from the
      // feed side, so the affected subset plus the feed is complete
      graft.ops.Mutations.scdType2(affected, f, keys, trackedCols, runStamp)
    }

  /** Exactly-once streaming MERGE sink — the `foreachBatch` body for
    * `writeStream` into a versioned table:
    *
    * {{{
    * stream.writeStream.foreachBatch { (batch, id) =>
    *   VersionedTable.streamingUpsert(spark, root, batch, keys, "q", id)
    * }
    * }}}
    *
    * Structured Streaming's contract is at-least-once delivery to
    * foreachBatch: after a crash the SAME (queryName, batchId) can be
    * replayed. Idempotence here rides the table's own atomicity — the
    * last applied batch id per query is a `meta` entry in the manifest,
    * read from the exact base snapshot the commit builds on and
    * published in the same atomic rename as the data files, so "data
    * applied" and "batch recorded" can never diverge (the Delta
    * `txn`/`setTransaction` pattern). A replayed or out-of-order batch
    * id returns the current version untouched; a [[CommitConflict]]
    * (another writer slipped in) re-reads and retries — if the winner
    * was THIS batch's earlier attempt, the retry sees the recorded id
    * and skips. */
  def streamingUpsert(spark: SparkSession, root: String, batch: DataFrame,
      keys: Seq[String], queryName: String, batchId: Long,
      maxRetries: Int = 10): Long = {
    require(queryName.nonEmpty && !queryName.contains('='),
      s"bad queryName '$queryName'")
    val metaKey = s"stream.$queryName.batch"
    var attempt = 0
    while (true) {
      try {
        return cowCommit(spark, root, batch, keys,
          metaUpdate = m =>
            if (m.get(metaKey).exists(_.toLong >= batchId)) None
            else Some(m + (metaKey -> batchId.toString))
        ) { (affected, src, full) =>
          val cols = full.columns.toSeq
          val s = src.select(cols.map(col): _*).dropDuplicates(keys)
          graft.ops.Mutations.applyUpdate(affected, s, keys,
              cols.filterNot(keys.contains))
            .unionByName(s.join(full, keys, "left_anti"))
        }
      } catch {
        case _: CommitConflict if attempt < maxRetries => attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Incremental read — the rows added AFTER `fromVersion`, up to
    * `toVersion` (default: latest): the change feed a downstream
    * consumer tails instead of re-scanning a 100 TB table per cycle.
    * File-granular and exact for APPEND commits (create/append/
    * streamingUpsert inserts of brand-new keys land in new files while
    * every base file is carried), which is the shape ingest pipelines
    * have. If the range contains a REWRITE (merge/SCD2 touching
    * existing keys, compact) the file diff no longer equals the row
    * delta — carried-forward rows sit inside rewritten files — so this
    * REFUSES loudly rather than emitting duplicates (row-level change
    * capture needs per-commit change files, the Delta CDF design;
    * re-read the snapshot instead). */
  def readAppendsSince(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val to = toVersion.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"$root: no versioned table"))
    require(fromVersion <= to, s"fromVersion $fromVersion is past $to")
    val mFrom = readManifest(spark, root, fromVersion)
    val mTo = readManifest(spark, root, to)
    val fromSet = mFrom.files.toSet
    val removed = fromSet -- mTo.files.toSet
    if (removed.nonEmpty)
      throw new IllegalStateException(
        s"$root versions $fromVersion->$to dropped ${removed.size} file(s) " +
          "(a merge/SCD2/compact rewrite): the file diff is not the row " +
          "delta — re-read the snapshot, or capture changes per commit")
    val added = mTo.files.filterNot(fromSet.contains)
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], mTo.schema)
    else spark.read.schema(mTo.schema)
      .parquet(added.map(f => new Path(root, f).toString): _*)
  }

  /** Rewrite every data file smaller than `smallFileBytes` into
    * `targetPartitions` right-sized files as a NEW version (Delta
    * OPTIMIZE / Iceberg rewrite_data_files): frequent small commits —
    * a streaming upsert every minute — otherwise accrete thousands of
    * tiny files and scans go metadata-bound. Contents are unchanged
    * (same rows, same schema, meta carried), old versions still
    * time-travel to the old layout until [[vacuum]]. Returns the new
    * version, or the current one if fewer than two small files exist. */
  def compact(spark: SparkSession, root: String, smallFileBytes: Long,
      targetPartitions: Int = 1): Long = {
    require(targetPartitions > 0, "targetPartitions must be positive")
    val base = currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root: no versioned table"))
    val m = readManifest(spark, root, base)
    val f = fs(spark, new Path(root))
    val (small, big) = m.files.partition(rel =>
      f.getFileStatus(new Path(root, rel)).getLen < smallFileBytes)
    if (small.size < 2) return base
    val rows = spark.read.schema(m.schema)
      .parquet(small.map(rel => new Path(root, rel).toString): _*)
      .repartition(targetPartitions)
    commit(spark, root, base, m.schema,
      big ++ writeData(spark, root, rows), m.meta)
  }

  /** Drop every version below `keepFrom` and any data file/dir no kept
    * manifest references — the GC that stops manifest/file accumulation
    * (Delta VACUUM / Iceberg expire_snapshots). Also sweeps ORPHAN data
    * dirs (a torn write that never reached its commit, or a committer
    * that lost the CAS after writing files): any `data/<uuid>/` dir
    * referenced by NO surviving manifest whose files are older than
    * `orphanGraceMs` is deleted — the grace window keeps the sweep from
    * eating a commit that is mid-flight RIGHT NOW (files written,
    * manifest rename pending), same reasoning as Delta VACUUM's
    * retention check. */
  def vacuum(spark: SparkSession, root: String, keepFrom: Long,
      orphanGraceMs: Long = 24L * 3600 * 1000): Unit = {
    val cur = currentVersion(spark, root).getOrElse(return)
    require(keepFrom <= cur, s"keepFrom $keepFrom is past current $cur")
    val dir = manifestDir(root)
    val f = fs(spark, dir)
    val versions = f.listStatus(dir).map(_.getPath.getName).collect {
      case ManifestRe(d) => d.toLong
    }.sorted
    val (drop, keep) = versions.partition(_ < keepFrom)
    val referenced = keep.flatMap(v =>
      readManifest(spark, root, v).files).toSet
    drop.foreach { v =>
      readManifest(spark, root, v).files
        .filterNot(referenced.contains)
        .foreach(rel => f.delete(new Path(root, rel), false))
      f.delete(manifestPath(root, v), false)
      f.delete(lockPath(root, v), false) // the version's CAS tombstone
    }
    // sweep data dirs emptied by the deletes, plus ORPHANS: dirs no
    // surviving manifest references, past the grace window (a torn
    // write's leftovers — see scaladoc)
    val referencedDirs = referenced.map(rel => new Path(rel).getParent.getName)
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    val dataDir = new Path(root, "data")
    if (f.exists(dataDir))
      f.listStatus(dataDir).filter(_.isDirectory).foreach { d =>
        val children = f.listStatus(d.getPath)
        val orphan = !referencedDirs.contains(d.getPath.getName) &&
          children.forall(_.getModificationTime < cutoff)
        if (children.isEmpty) f.delete(d.getPath, false)
        else if (orphan) f.delete(d.getPath, true)
      }
  }
}
