package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-based rewrites of the reference's per-row mutation patterns.
  *
  * SSIS OLE DB Command executes `EXEC sp_Update ?,?` PER ROW
  * (/root/reference/parsing/data_engineering_parser.py:878-917;
  * fixture Sample_Medium_Package.dtsx:637-757). A row loop cannot run on
  * Spark — and shouldn't anywhere at 100 TB. Each command shape becomes
  * one distributed set operation over the whole target (the Delta
  * `MERGE INTO` equivalent, expressed via joins since this build ships
  * no Delta jar; swap `applyUpdate` for DeltaTable.merge on a Delta-
  * enabled cluster and the call sites don't change).
  *
  * All joins are key-equi joins: they hash-partition both sides on the
  * business key, so they scale linearly and AQE can split skewed keys.
  */
object Mutations {

  private def keyCond(l: DataFrame, r: DataFrame, keys: Seq[String]): Column =
    keys.map(k => l(k) <=> r(k)).reduce(_ && _)

  /** UPDATE-shaped command: for target rows whose key appears in
    * `updates`, replace `setCols` with the update row's values
    * (equivalent: MERGE WHEN MATCHED THEN UPDATE SET ...). */
  def applyUpdate(target: DataFrame, updates: DataFrame,
                  keys: Seq[String], setCols: Seq[String]): DataFrame = {
    // explicit match witness: joins use <=>, so a NULL business key can
    // legitimately match — key-isNotNull would miss that row
    val flag = "__graft_matched"
    val u = updates.dropDuplicates(keys) // one command per key, like a keyed MERGE
      .withColumn(flag, lit(true))
    val joined = target.join(u, keyCond(target, u, keys), "left_outer")
    val matched = u(flag) === lit(true)
    val cols = target.columns.map { c =>
      if (setCols.contains(c)) when(matched, u(c)).otherwise(target(c)).as(c)
      else target(c).as(c)
    }
    joined.select(cols.toIndexedSeq: _*)
  }

  /** DELETE-shaped command (MERGE WHEN MATCHED THEN DELETE): anti-join. */
  def applyDelete(target: DataFrame, deletes: DataFrame, keys: Seq[String]): DataFrame =
    target.join(deletes.select(keys.map(col): _*).dropDuplicates(keys),
      keys, "left_anti")

  /** SCD Type 1: upsert — matched target rows take the feed's values,
    * unmatched feed rows are appended (reference recognizes SCD at
    * data_engineering_parser.py:1228-1232; the medium fixture hand-builds
    * this from merge-join + split + per-row commands). */
  def scdType1(target: DataFrame, feed: DataFrame, keys: Seq[String]): DataFrame = {
    val f = feed.dropDuplicates(keys)
    val kept = target.join(f, keys, "left_anti")
    kept.unionByName(f.select(target.columns.map(col).toIndexedSeq: _*))
  }

  /** SCD Type 2: expire changed rows, insert new versions. The target
    * carries (`validFrom`, `validTo`, `isCurrent`) metadata columns;
    * `trackedCols` drive change detection among current rows.
    *
    * At scale: one shuffle of each side on the business key; no windows.
    */
  def scdType2(target: DataFrame, feed: DataFrame, keys: Seq[String],
               trackedCols: Seq[String], runStamp: String,
               validFrom: String = "valid_from", validTo: String = "valid_to",
               isCurrent: String = "is_current"): DataFrame = {
    val dataCols = target.columns.filterNot(Seq(validFrom, validTo, isCurrent).contains)
    val f = feed.dropDuplicates(keys)

    val current = target.filter(col(isCurrent))
    val history = target.filter(!col(isCurrent))

    val flag = "__graft_matched"
    val fFlagged = f.withColumn(flag, lit(true))
    val changedCond = trackedCols.map(c => !(current(c) <=> fFlagged(c))).reduce(_ || _)
    val joined = current.join(fFlagged, keyCond(current, fFlagged, keys), "left_outer")
    val feedMatched = fFlagged(flag) === lit(true)

    // current rows: expire when the feed disagrees on any tracked column
    val expireRow = feedMatched && changedCond
    val keptCurrent = joined.select(
      (dataCols.map(c => current(c).as(c)) ++ Seq(
        current(validFrom).as(validFrom),
        when(expireRow, lit(runStamp)).otherwise(current(validTo)).as(validTo),
        when(expireRow, lit(false)).otherwise(current(isCurrent)).as(isCurrent))).toIndexedSeq: _*)

    // feed rows that are new keys or changed versions → fresh current rows
    val currentForAnti = current.select(
      (keys.map(col) ++ trackedCols.map(col)).toIndexedSeq: _*)
    val fresh = f.join(currentForAnti,
        keys.map(k => f(k) <=> currentForAnti(k)).reduce(_ && _) &&
          trackedCols.map(c => f(c) <=> currentForAnti(c)).reduce(_ && _),
        "left_anti")
      .select(dataCols.map(col).toIndexedSeq: _*)
      .withColumn(validFrom, lit(runStamp))
      .withColumn(validTo, lit(null).cast("string"))
      .withColumn(isCurrent, lit(true))

    history.select(target.columns.map(col).toIndexedSeq: _*)
      .unionByName(keptCurrent.select(target.columns.map(col).toIndexedSeq: _*))
      .unionByName(fresh.select(target.columns.map(col).toIndexedSeq: _*))
  }
}
