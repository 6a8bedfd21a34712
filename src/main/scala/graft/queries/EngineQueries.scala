package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ir._
import graft.ir.Component._
import graft.dag.{DataFlowExec, PipelineContext}

/** Oracle queries that execute THROUGH the engine: each builds a DataFlow
  * of IR components and runs it via DataFlowExec.run — certifying the
  * composition layer (Kahn scheduling, port routing, expression
  * compilation inside components), not just standalone DataFrame code.
  *
  * Reference patterns exercised: ConditionalSplit first-match-wins
  * (enhanced_json_mapper.py:1969-2002 emits overlapping filters — we
  * implement the true SSIS semantics), MergeJoin JoinType 0/1/2
  * (data_engineering_parser.py:738-808), Merge (:812-871), Lookup chains
  * (Sample_Medium_Package.dtsx:119-226), Multicast/UnionAll
  * (enhanced_json_mapper.py:244-277), Sort+EliminateDuplicates
  * (:1936-1967), Pivot/Unpivot (data_engineering_parser.py:1220-1225),
  * Row Count (:1238-1239), sampling (:1096-1097).
  */
object EngineQueries extends QueryPack {

  private def run(s: SparkSession, dir: String, flow: DataFlow): Map[String, DataFrame] =
    DataFlowExec.run(flow, PipelineContext.overDir(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Cache Transform feeding a Lookup over the cached view (SSIS cache
    // connection manager pattern) — the ordering edge into the Lookup's
    // "cache" port is the data-less dependency the topo sort needs.
    "q56_cache_lookup" -> { (s, dir) =>
      val flow = DataFlow("q56", Seq(
        SourceTable("ref", "nation"),
        CacheTransform("ct", cacheName = "q56_nation_cache"),
        TrashDestination("tr"),
        SourceTable("stream", "customer",
          columns = Seq("c_custkey", "c_nationkey"),
          filter = Some("c_custkey <= 2000")),
        Lookup("lk", refTable = "",
          joinKeys = Seq("c_nationkey" -> "n_nationkey"),
          copyColumns = Seq("n_name" -> "n_name"),
          refSql = Some("SELECT * FROM q56_nation_cache"))),
        Seq(Path("ref", "ct"), Path("ct", "tr"),
          Path("ct", "lk", toPort = "cache"), Path("stream", "lk")))
      run(s, dir, flow)("lk.out").orderBy(col("c_custkey"))
    },

    // ForLoop container driving a DataFlow per iteration: the loop
    // variable reaches the flow through expression compilation, appends
    // accumulate across iterations (container + variable plumbing under
    // the oracle gate, not just unit tests).
    "q57_forloop_append" -> { (s, dir) =>
      import graft.ir.CfTask._
      import graft.dag.ControlFlowExec
      s.catalog.dropTempView("q57_sink")
      val body = DataFlow("body", Seq(
        SourceTable("src", "nation",
          filter = Some("n_nationkey == @[User::I]")),
        Destination("dst", "q57_sink", WriteMode.Append)),
        Seq(Path("src", "dst")))
      val spec = PipelineSpec("q57", tasks = Seq(
        ForLoop("loop", "User::I", init = Some("0"),
          whileExpr = "@[User::I] < 5", assign = Some("@[User::I] + 1"),
          body = Seq(DataFlowTask("dft", body)))),
        edges = Nil)
      val res = ControlFlowExec.run(spec,
        PipelineContext.overDir(s, dir))
      require(res.succeeded("loop"), s"loop failed: ${res.statuses("loop")}")
      s.table("q57_sink").orderBy(col("n_nationkey"))
    },

    // Sequence container wrapping a ForEach item enumerator: each
    // iteration binds User::R, runs a DataFlow that filters on the
    // variable, tags rows with it through expression compilation, and
    // appends — the container/variable plumbing q57 certifies for
    // ForLoop, now for ForEach + Sequence (closing §2.7's last
    // unit-only container paths).
    "q108_foreach_seq" -> { (s, dir) =>
      import graft.ir.CfTask._
      import graft.dag.ControlFlowExec
      s.catalog.dropTempView("q108_sink")
      val body = DataFlow("body", Seq(
        SourceTable("src", "nation",
          filter = Some("n_regionkey == @[User::R]")),
        DerivedColumn("tag", Seq("iter_r" -> "(DT_I4)@[User::R]")),
        Destination("dst", "q108_sink", WriteMode.Append)),
        Seq(Path("src", "tag"), Path("tag", "dst")))
      val spec = PipelineSpec("q108", tasks = Seq(
        Sequence("seq", body = Seq(
          ForEach("fe", "User::R", values = Seq(0, 1, 2, 3, 4),
            body = Seq(DataFlowTask("dft", body)))))),
        edges = Nil)
      val res = ControlFlowExec.run(spec, PipelineContext.overDir(s, dir))
      require(res.succeeded("seq"), s"seq failed: ${res.statuses("seq")}")
      s.table("q108_sink").orderBy(col("n_nationkey"))
    },

    // ForEachAdo — the recordset-driven loop (SSIS's work-queue
    // pattern): a RecordsetDestination captures the region keys into a
    // package variable, the ADO enumerator then drives one DataFlow
    // per key. Precedence edge orders fill before loop.
    "q115_foreach_ado" -> { (s, dir) =>
      import graft.ir.CfTask._
      import graft.dag.ControlFlowExec
      s.catalog.dropTempView("q115_sink")
      val fill = DataFlow("fill", Seq(
        SourceTable("src", "region", columns = Seq("r_regionkey")),
        RecordsetDestination("dst", "User::RS")),
        Seq(Path("src", "dst")))
      val body = DataFlow("body", Seq(
        SourceTable("src", "nation",
          filter = Some("n_regionkey == @[User::R]")),
        DerivedColumn("tag", Seq("iter_r" -> "(DT_I4)@[User::R]")),
        Destination("dst", "q115_sink", WriteMode.Append)),
        Seq(Path("src", "tag"), Path("tag", "dst")))
      val spec = PipelineSpec("q115", tasks = Seq(
        DataFlowTask("fill_rs", fill),
        ForEachAdo("loop", "User::R", "User::RS", columnIndex = 0,
          body = Seq(DataFlowTask("dft", body)))),
        edges = Seq(PrecedenceEdge("fill_rs", "loop")))
      val res = ControlFlowExec.run(spec, PipelineContext.overDir(s, dir))
      require(res.succeeded("loop"), s"loop failed: ${res.statuses("loop")}")
      s.table("q115_sink").orderBy(col("n_nationkey"))
    },

    // ScriptComponent — the arbitrary-Scala escape hatch (same stance
    // as the reference's Script Component passthrough) — under the
    // oracle gate: the script derives an upper-cased name and a
    // modular bucket; the oracle recomputes both in SQL. Closes the
    // last unit-only §2 row.
    "q109_script" -> { (s, dir) =>
      val flow = DataFlow("q109", Seq(
        SourceTable("src", "customer",
          columns = Seq("c_custkey", "c_name", "c_mktsegment")),
        ScriptComponent("sc", df => df
          .withColumn("name_u", upper(col("c_name")))
          .withColumn("bucket", pmod(col("c_custkey"), lit(7))))),
        Seq(Path("src", "sc")))
      run(s, dir, flow)("sc.out").orderBy(col("c_custkey"))
    },

    // ConditionalSplit: a row with o_totalprice > 200000 also satisfies
    // "> 100000" — first-match-wins must route it ONLY to 'big'.
    "q9_split" -> { (s, dir) =>
      val flow = DataFlow("q9", Seq(
        SourceTable("src", "orders"),
        ConditionalSplit("split",
          Seq("big" -> "o_totalprice > 200000", "mid" -> "o_totalprice > 100000"),
          defaultOutput = "small"),
        DerivedColumn("tag_big", Seq("bucket" -> "\"big\"")),
        DerivedColumn("tag_mid", Seq("bucket" -> "\"mid\"")),
        DerivedColumn("tag_small", Seq("bucket" -> "\"small\"")),
        UnionAll("u")),
        Seq(
          Path("src", "split"),
          Path("split", "tag_big", fromPort = "big"),
          Path("split", "tag_mid", fromPort = "mid"),
          Path("split", "tag_small", fromPort = "small"),
          Path("tag_big", "u"), Path("tag_mid", "u"), Path("tag_small", "u")))
      run(s, dir, flow)("u.out")
        .select(col("o_orderkey"), col("o_totalprice"), col("bucket"))
        .orderBy(col("o_orderkey"))
    },

    // MergeJoin JoinType=2 (full outer): unmatched rows on both sides.
    "q10_mergejoin_full" -> { (s, dir) =>
      val flow = DataFlow("q10", Seq(
        SourceTable("cust", "customer", columns = Seq("c_custkey", "c_name"),
          filter = Some("c_custkey <= 1200")),
        SourceTable("ord", "orders", filter = Some("o_totalprice > 150000")),
        Aggregate("agg", groupBy = Seq("o_custkey"),
          aggs = Seq(("count_star", "", "n_orders"))),
        MergeJoin("mj", "full", keys = Seq("c_custkey" -> "o_custkey")),
        DerivedColumn("key", Seq("k" -> "ISNULL(c_custkey) ? o_custkey : c_custkey"))),
        Seq(
          Path("cust", "mj", toPort = "left"),
          Path("ord", "agg"),
          Path("agg", "mj", toPort = "right"),
          Path("mj", "key")))
      run(s, dir, flow)("key.out").orderBy(col("k"))
    },

    // Multicast fan-out → per-branch CharacterMap + DerivedColumn → UnionAll.
    "q11_multicast_union" -> { (s, dir) =>
      val flow = DataFlow("q11", Seq(
        SourceTable("src", "nation"),
        Multicast("mc", Seq("a", "b")),
        CharacterMap("up", Seq(("n_name", "Uppercase", "nm"))),
        DerivedColumn("tag_u", Seq("tag" -> "\"U\"")),
        CharacterMap("lo", Seq(("n_name", "Lowercase", "nm"))),
        DerivedColumn("tag_l", Seq("tag" -> "\"L\"")),
        UnionAll("u")),
        Seq(
          Path("src", "mc"),
          Path("mc", "up", fromPort = "a"), Path("up", "tag_u"),
          Path("mc", "lo", fromPort = "b"), Path("lo", "tag_l"),
          Path("tag_u", "u"), Path("tag_l", "u")))
      run(s, dir, flow)("u.out")
        .select(col("n_nationkey"), col("nm"), col("tag"))
        .orderBy(col("n_nationkey"), col("tag"))
    },

    // Sort + EliminateDuplicates on the full key set ≡ DISTINCT.
    "q12_sort_dedup" -> { (s, dir) =>
      val flow = DataFlow("q12", Seq(
        SourceTable("src", "customer", columns = Seq("c_mktsegment", "c_nationkey")),
        Sort("sort", keys = Seq("c_mktsegment" -> true, "c_nationkey" -> true),
          eliminateDuplicates = true)),
        Seq(Path("src", "sort")))
      run(s, dir, flow)("sort.out")
    },

    // Pivot rows→columns with explicit values (single-pass, no
    // distinct-values pre-job — the 100 TB-safe form).
    "q13_pivot" -> { (s, dir) =>
      val flow = DataFlow("q13", Seq(
        SourceTable("src", "events"),
        Pivot("pv", groupBy = Seq("user_id"), pivotColumn = "event_type",
          pivotValues = Seq("click", "error", "purchase", "signup", "view"),
          valueColumn = "event_id", aggOp = "count")),
        Seq(Path("src", "pv")))
      run(s, dir, flow)("pv.out").orderBy(col("user_id"))
    },

    // DataConversion (DT_R8 cast) then Unpivot columns→rows.
    "q14_unpivot" -> { (s, dir) =>
      val flow = DataFlow("q14", Seq(
        SourceTable("src", "part"),
        DataConversion("conv", Seq(("p_size", "DT_R8", "p_size_d"))),
        Unpivot("up", idColumns = Seq("p_partkey"),
          valueColumns = Seq("p_size_d", "p_retailprice"),
          keyName = "k", valueName = "v")),
        Seq(Path("src", "conv"), Path("conv", "up")))
      run(s, dir, flow)("up.out").orderBy(col("p_partkey"), col("k"))
    },

    // Deterministic bucket sampling (scale-safe Percentage Sampling).
    "q15_sampling" -> { (s, dir) =>
      val flow = DataFlow("q15", Seq(
        SourceTable("src", "orders", columns = Seq("o_orderkey", "o_custkey")),
        Sampling("sample", keyColumn = "o_orderkey", buckets = 10, keep = 3)),
        Seq(Path("src", "sample")))
      run(s, dir, flow)("sample.out").orderBy(col("o_orderkey"))
    },

    // Lookup chain (as Sample_Medium_Package.dtsx:119-226) + RowCount tap
    // + Destination sink; result read back from the sink.
    "q16_lookup_chain" -> { (s, dir) =>
      val ctx = PipelineContext.overDir(s, dir)
      val flow = DataFlow("q16", Seq(
        SourceTable("src", "lineitem",
          columns = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),
        Lookup("lk_part", "part", joinKeys = Seq("l_partkey" -> "p_partkey"),
          copyColumns = Seq("p_brand" -> "p_brand")),
        Lookup("lk_supp", "supplier", joinKeys = Seq("l_suppkey" -> "s_suppkey"),
          copyColumns = Seq("s_name" -> "s_name")),
        RowCount("rc", "User::Q16Rows"),
        Destination("dst", "q16_sink", WriteMode.Overwrite)),
        Seq(Path("src", "lk_part"), Path("lk_part", "lk_supp"),
          Path("lk_supp", "rc"), Path("rc", "dst")))
      DataFlowExec.run(flow, ctx)
      ctx.unpersistAll()
      require(ctx.variables("User::Q16Rows").asInstanceOf[Long] > 0L,
        "row count tap not filled")
      s.table("q16_sink")
        .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"), col("s_name"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Merge (sorted union, NOT a join — data_engineering_parser.py:812-871).
    "q17_mergesorted" -> { (s, dir) =>
      val flow = DataFlow("q17", Seq(
        SourceTable("lo", "supplier", filter = Some("s_nationkey < 12")),
        SourceTable("hi", "supplier", filter = Some("s_nationkey >= 12")),
        MergeSorted("m", sortKeys = Seq("s_suppkey" -> true))),
        Seq(Path("lo", "m"), Path("hi", "m")))
      run(s, dir, flow)("m.out")
    }
  )

  val oracles: Map[String, String] = Map(
    "q56_cache_lookup" ->
      """SELECT c.c_custkey, c.c_nationkey, n.n_name
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_custkey <= 2000
        |ORDER BY c.c_custkey""".stripMargin,
    "q57_forloop_append" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_nationkey < 5 ORDER BY n_nationkey""".stripMargin,
    "q108_foreach_seq" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  CAST(n_regionkey AS INT) AS iter_r
        |FROM nation WHERE n_regionkey BETWEEN 0 AND 4
        |ORDER BY n_nationkey""".stripMargin,
    "q109_script" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  upper(c_name) AS name_u,
        |  CAST(c_custkey % 7 AS BIGINT) AS bucket
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q115_foreach_ado" ->
      """SELECT n.n_nationkey, n.n_name, n.n_regionkey,
        |  CAST(n.n_regionkey AS INT) AS iter_r
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY n.n_nationkey""".stripMargin,
    "q9_split" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q10_mergejoin_full" ->
      """SELECT c.c_custkey, c.c_name, o.o_custkey, o.n_orders,
        |  COALESCE(c.c_custkey, o.o_custkey) AS k
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 1200) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |           WHERE o_totalprice > 150000 GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY k""".stripMargin,
    "q11_multicast_union" ->
      """SELECT n_nationkey, UPPER(n_name) AS nm, 'U' AS tag FROM nation
        |UNION ALL
        |SELECT n_nationkey, LOWER(n_name) AS nm, 'L' AS tag FROM nation
        |ORDER BY n_nationkey, tag""".stripMargin,
    "q12_sort_dedup" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q13_pivot" ->
      """SELECT user_id,
        |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS click,
        |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'error'), 0) AS error,
        |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchase,
        |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'signup'), 0) AS signup,
        |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q14_unpivot" ->
      """SELECT p_partkey, k, v FROM (
        |  SELECT p_partkey, 'p_size_d' AS k, CAST(p_size AS DOUBLE) AS v FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_retailprice' AS k, p_retailprice AS v FROM part)
        |ORDER BY p_partkey, k""".stripMargin,
    "q15_sampling" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey % 10 < 3 ORDER BY o_orderkey""".stripMargin,
    "q16_lookup_chain" ->
      """SELECT l.l_orderkey, l.l_linenumber, p.p_brand, s.s_name
        |FROM lineitem l
        |LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "q17_mergesorted" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin
  )
}
