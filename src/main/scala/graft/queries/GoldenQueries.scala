package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ir._
import graft.ir.Component._
import graft.ir.CfTask._
import graft.dag.{ControlFlowExec, DataFlowExec, PipelineContext}
import graft.ops.Mutations

/** The golden pipeline: a native re-expression of the reference's
  * Sample_Medium_Package.dtsx "DFT Load" (lines 47-605) — the complete
  * checksum-based incremental upsert/delete pattern:
  *
  *   feed source → lookup chain → sort → checksum_NEW        (dtsx:47-295)
  *   existing source (CheckSum_OLD, DeletedFlag_OLD)         (dtsx:73-103)
  *   full-outer merge join on the business key               (dtsx:395-486)
  *   nullable-fix + processing-flag derived columns          (dtsx:362-551)
  *   5-way first-match conditional split                     (dtsx:552-605)
  *   per-port row counts; UPDATE/DELETE as set rewrites;
  *   INSERT appended                                         (dtsx:607-757)
  *
  * The reference emits the OLE DB commands as per-row stored-procedure
  * calls; here each becomes one distributed set operation
  * (graft.ops.Mutations), serialized by the control-flow executor —
  * the ordering SURVEY §7.4(2) requires.
  */
object GoldenQueries extends QueryPack {

  private val tracked =
    Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "n_name")
  private val feedCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  /** Build the simulated existing dimension: customers ≤ 1200, with some
    * stale balances (key%10==3) and some soft-deleted rows (key%10==7),
    * checksummed the same way the feed will be. */
  private def targetFlow = DataFlow("build_target", Seq(
    SourceTable("src", "customer", columns = feedCols,
      filter = Some("c_custkey <= 1200")),
    Lookup("lkp", "nation", joinKeys = Seq("c_nationkey" -> "n_nationkey"),
      copyColumns = Seq("n_name" -> "n_name")),
    DerivedColumn("tweak", Seq(
      "c_acctbal" -> "c_custkey % 10 == 3 ? c_acctbal + 5.0 : c_acctbal",
      "DeletedFlag" -> "c_custkey % 10 == 7 ? 1 : 0")),
    Checksum("chk", tracked, "CheckSum"),
    Destination("dst", "golden_target", WriteMode.Overwrite)),
    Seq(Path("src", "lkp"), Path("lkp", "tweak"), Path("tweak", "chk"),
      Path("chk", "dst")))

  /** The DFT Load flow: feed vs existing, split into staged actions. */
  private def dftFlow = DataFlow("dft_load", Seq(
    SourceTable("feed", "customer", columns = feedCols,
      filter = Some("c_custkey > 240")),
    Lookup("lkp", "nation", joinKeys = Seq("c_nationkey" -> "n_nationkey"),
      copyColumns = Seq("n_name" -> "n_name")),
    Sort("srt", keys = Seq("c_custkey" -> true)),              // dtsx:227 SRT
    Checksum("chk", tracked, "CheckSum"),
    RowCount("rc_feed", "User::FeedRows"),                     // dtsx:104 RC Select
    SourceQuery("exist", "SELECT * FROM golden_target"),
    MergeJoin("mj", "full",                                    // dtsx:395 MRGJ
      keys = Seq("k_old" -> "k_new"),
      leftSelect = Seq("c_custkey" -> "k_old", "CheckSum" -> "CheckSum_OLD",
        "DeletedFlag" -> "DeletedFlag_OLD"),
      rightSelect = Seq("c_custkey" -> "k_new") ++
        (tracked :+ "CheckSum").map {
          case "CheckSum" => "CheckSum" -> "CheckSum_NEW"
          case c => c -> c
        }),
    // dtsx:362 DER_NullableColumns: ISNULL used as a BOOLEAN test
    DerivedColumn("nullable", Seq(
      "DeletedFlag_OLD" -> "ISNULL(DeletedFlag_OLD) == TRUE ? 0 : DeletedFlag_OLD")),
    // dtsx:509 DER_ProcessingFlags
    DerivedColumn("flags", Seq(
      "InExistingFlag" -> "!ISNULL(CheckSum_OLD)",
      "InFeedFlag" -> "!ISNULL(CheckSum_NEW)",
      "CheckSumMatchesFlag" -> "CheckSum_NEW == CheckSum_OLD",
      "AlreadyHardDeletedFlag" -> "DeletedFlag_OLD == 1")),
    // dtsx:552 CSPL, EvaluationOrder 0..4, first match wins
    ConditionalSplit("cspl", Seq(
      "INSERT" -> "InExistingFlag == FALSE",
      "NOCHG_DELETED" -> "InFeedFlag == FALSE && AlreadyHardDeletedFlag == TRUE",
      "DELETE" -> "InFeedFlag == FALSE && AlreadyHardDeletedFlag == FALSE",
      "UPDATE" -> "CheckSumMatchesFlag == FALSE"),
      defaultOutput = "NOCHANGE"),
    RowCount("rc_ins", "User::InsertRows"),                    // dtsx:607 RC Insert
    RowCount("rc_upd", "User::UpdateRows"),
    RowCount("rc_del", "User::DeleteRows"),
    Destination("st_ins", "stage_insert", WriteMode.Overwrite),
    Destination("st_upd", "stage_update", WriteMode.Overwrite),
    Destination("st_del", "stage_delete", WriteMode.Overwrite),
    TrashDestination("tr_nochg", countInto = Some("User::NoChangeRows")),
    TrashDestination("tr_nodel", countInto = Some("User::NoChangeDeletedRows"))),
    Seq(
      Path("feed", "lkp"), Path("lkp", "srt"), Path("srt", "chk"),
      Path("chk", "rc_feed"),
      Path("rc_feed", "mj", toPort = "right"),
      Path("exist", "mj", toPort = "left"),
      Path("mj", "nullable"), Path("nullable", "flags"), Path("flags", "cspl"),
      Path("cspl", "rc_ins", fromPort = "INSERT"),
      Path("cspl", "rc_upd", fromPort = "UPDATE"),
      Path("cspl", "rc_del", fromPort = "DELETE"),
      Path("rc_ins", "st_ins"), Path("rc_upd", "st_upd"), Path("rc_del", "st_del"),
      Path("cspl", "tr_nochg", fromPort = "NOCHANGE"),
      Path("cspl", "tr_nodel", fromPort = "NOCHG_DELETED")))

  /** Execute the golden medium pipeline (build_target → dft_load) over
    * `dir`, returning the context it ran in — per-sink physical plans
    * captured inside ([[graft.dag.PipelineContext.sinkPlans]]), which
    * is how PlanAuditSpec audits this multi-sink pipeline (the q18
    * query entry returns only a post-hoc table read whose plan says
    * nothing about the pipeline itself). */
  def runGoldenMedium(s: SparkSession, dir: String): PipelineContext = {
    val ctx = PipelineContext.overDir(s, dir)
    val spec = PipelineSpec("golden",
      tasks = Seq(
        DataFlowTask("build_target", targetFlow),
        DataFlowTask("dft_load", dftFlow)),
      edges = Seq(PrecedenceEdge("build_target", "dft_load")))
    val res = ControlFlowExec.run(spec, ctx)
    require(res.succeeded("dft_load"),
      s"dft_load failed: ${res.statuses("dft_load")}")
    require(ctx.variables("User::FeedRows").asInstanceOf[Long] > 0L,
      "golden feed empty: the fixture's custkey thresholds (240/1200) " +
        "assume sf >= 0.01 (the driver gate's scale)")
    ctx
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The 100 TB posture of the incremental pattern (SURVEY §7.4(5)):
    // same final dimension state as q18, but the expensive wide-row
    // full-outer merge is PREFILTERED by ops.Scale.changedKeys — only
    // keys whose checksum differs between feed and target shuffle their
    // full rows; at 1% churn that is a ~100x reduction in shuffled
    // bytes. The oracle is the SAME final-state SQL as q18's, so this
    // row certifies prefiltered == unfiltered end-to-end.
    "q52_golden_incremental" -> { (s, dir) =>
      import graft.ops.Scale
      val feedColsQ = feedCols.map(col)
      val cust = graft.Tables.load(s, dir, "customer").select(feedColsQ: _*)
      val nat = graft.Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      def enrich(df: DataFrame): DataFrame =
        df.join(nat, df("c_nationkey") === nat("n_nationkey"), "left_outer")
          .drop("n_nationkey")
      val feed = enrich(cust.filter(col("c_custkey") > 240))
        .withColumn("CheckSum", hash(tracked.map(col): _*))
      val target = enrich(cust.filter(col("c_custkey") <= 1200))
        .withColumn("c_acctbal", when(col("c_custkey") % 10 === 3,
          col("c_acctbal") + 5.0).otherwise(col("c_acctbal")))
        .withColumn("DeletedFlag",
          when(col("c_custkey") % 10 === 7, 1).otherwise(0))
        .withColumn("CheckSum", hash(tracked.map(col): _*))

      // narrow (key, checksum) pre-join finds the churn; full rows of
      // unchanged keys never leave their scan
      val (feedChanged, targetChanged) = Scale.changedKeys(
        feed, target, Seq("c_custkey"), col("CheckSum"), col("CheckSum"))

      // churn-only full outer: INSERT / UPDATE / DELETE / NOCHG_DELETED
      val f2 = feedChanged
        .select(("c_custkey" +: tracked).map(c => col(c).as(s"f_$c")): _*)
        .withColumn("__in_feed", lit(true))
      val t2 = targetChanged.withColumn("__in_tgt", lit(true))
      // the churn join fans out into three branches (insert / update /
      // kept-deleted) — persist it, same rule the engine applies to
      // Multicast fan-outs; without this each branch re-runs the join
      // (exchange reuse only catches the branches whose pruned scans
      // stay textually identical)
      val j = f2.join(t2, col("f_c_custkey") <=> col("c_custkey"), "full_outer")
        .persist()
      val outCols = ("c_custkey" +: tracked) :+ "DeletedFlag"
      val inserted = j.filter(col("__in_tgt").isNull)
        .select(col("f_c_custkey").as("c_custkey") +:
          (tracked.map(c => col(s"f_$c").as(c)) :+ lit(0).as("DeletedFlag")): _*)
      val updated = j.filter(col("__in_feed").isNotNull && col("__in_tgt").isNotNull)
        .select(col("c_custkey") +:
          (tracked.map(c => col(s"f_$c").as(c)) :+ col("DeletedFlag")): _*)
      val keptDeleted = j.filter(col("__in_feed").isNull &&
          col("__in_tgt").isNotNull && col("DeletedFlag") === 1)
        .select(outCols.map(col): _*)
      val untouched = target
        .join(targetChanged.select("c_custkey"), Seq("c_custkey"), "left_anti")
        .select(outCols.map(col): _*)

      untouched.unionByName(updated).unionByName(inserted)
        .unionByName(keptDeleted)
        .orderBy(col("c_custkey"))
    },

    "q18_golden_medium" -> { (s, dir) =>
      runGoldenMedium(s, dir)

      // dtsx:637-757 — OLE DB command ports as set rewrites, serialized:
      // UPDATE then DELETE then INSERT-append (control-flow order).
      val target = s.table("golden_target")
      val updates = s.table("stage_update")
        .select((col("k_new").as("c_custkey") +: tracked.map(col)): _*)
      val deletes = s.table("stage_delete").select(col("k_old").as("c_custkey"))
      val inserts = s.table("stage_insert").select(
        col("k_new").as("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"), col("n_name"),
        col("DeletedFlag_OLD").as("DeletedFlag"), col("CheckSum_NEW").as("CheckSum"))

      val afterUpd = Mutations.applyUpdate(target, updates, Seq("c_custkey"), tracked)
      val afterDel = Mutations.applyDelete(afterUpd, deletes, Seq("c_custkey"))
      afterDel.unionByName(inserts)
        .drop("CheckSum")
        .orderBy(col("c_custkey"))
    }
  )

  private val finalStateSql =
    """WITH tgt AS (
      |  SELECT c.c_custkey, c.c_name, c.c_nationkey,
      |    CASE WHEN c.c_custkey % 10 = 3 THEN c.c_acctbal + 5.0 ELSE c.c_acctbal END AS c_acctbal,
      |    c.c_mktsegment, n.n_name,
      |    CASE WHEN c.c_custkey % 10 = 7 THEN 1 ELSE 0 END AS DeletedFlag
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE c.c_custkey <= 1200),
      |feed AS (
      |  SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
      |    c.c_mktsegment, n.n_name
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE c.c_custkey > 240)
      |SELECT f.c_custkey, f.c_name, f.c_nationkey, f.c_acctbal,
      |       f.c_mktsegment, f.n_name, t.DeletedFlag
      |FROM feed f JOIN tgt t ON f.c_custkey = t.c_custkey
      |UNION ALL
      |SELECT f.c_custkey, f.c_name, f.c_nationkey, f.c_acctbal,
      |       f.c_mktsegment, f.n_name, 0 AS DeletedFlag
      |FROM feed f WHERE f.c_custkey > 1200
      |UNION ALL
      |SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal,
      |       t.c_mktsegment, t.n_name, t.DeletedFlag
      |FROM tgt t WHERE t.c_custkey <= 240 AND t.c_custkey % 10 = 7
      |ORDER BY c_custkey""".stripMargin

  val oracles: Map[String, String] = Map(
    // q52 must land on the SAME final state as q18 — one oracle text,
    // two execution strategies (prefiltered vs full merge).
    "q52_golden_incremental" -> finalStateSql,
    // Final dimension state, derived directly (see query doc): common keys
    // take the feed's tracked values (UPDATE or values already equal) and
    // keep the target's DeletedFlag; keys only in the feed are inserts;
    // keys only in the target survive only if already soft-deleted.
    "q18_golden_medium" -> finalStateSql
  )
}
