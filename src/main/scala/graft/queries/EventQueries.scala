package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streams

/** Event-stream analytics over the `events` table — windowed
  * aggregation, gap-based sessionization, and JSON property extraction.
  * Beyond-reference extension surface (the reference has no streaming,
  * window, or JSON ops — SURVEY §0); the same Streams definitions run
  * under Structured Streaming (StreamingSpec proves batch/stream
  * parity).
  *
  * Money goes through integer cents; session boundaries compare
  * microsecond integers — both so Spark and DuckDB agree bit-for-bit.
  */
object EventQueries extends QueryPack {

  /** `events` with `ts` canonicalized to TIMESTAMP_NTZ microseconds —
    * [[Tables.loadEvents]] dispatches on the parquet's actual physical
    * type (ns-as-long / µs-ntz / µs-utc), so a testdata regeneration
    * that changes the writer's timestamp unit cannot break this
    * family (TablesSpec proves both fixtures load identically). */
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)

  /** FLOOR division of the epoch-microsecond `ts` by `unitUs`, exact
    * on longs. Column `/` is DOUBLE division (an epoch micro ~0.3 µs
    * below a bucket boundary would round UP across it at week scale),
    * and Spark's `div` truncates toward zero while DuckDB's `//`
    * floors — they disagree on pre-1970 (negative) epochs.
    * Subtracting pmod first removes a non-negative remainder, making
    * the dividend exactly divisible, so `div` then IS floor division
    * for any sign — bit-for-bit DuckDB parity even if a regenerated
    * dataset plants pre-epoch timestamps. Catalyst folds the repeated
    * unix_micros subtree, so this stays one projection. */
  private def epochBucket(unitUs: Long): org.apache.spark.sql.Column =
    expr(s"(unix_micros(cast(ts as timestamp)) - " +
      s"pmod(unix_micros(cast(ts as timestamp)), ${unitUs}L)) div ${unitUs}L")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q41_event_windows" -> { (s, dir) =>
      Streams.tumblingAgg(events(s, dir))
        .orderBy(col("ws"), col("event_type"))
    },

    "q42_sessionize" -> { (s, dir) =>
      Streams.sessionAgg(events(s, dir))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Sliding windows (1h long, every 30m): each event lands in
    // exactly two windows — the oracle materializes both via a union
    // of the aligned bucket and its 30m-earlier neighbor.
    "q83_sliding_windows" -> { (s, dir) =>
      Streams.slidingAgg(events(s, dir))
        .orderBy(col("ws"), col("event_type"))
    },

    "q43_json_props" -> { (s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") > 50)
        .orderBy(col("event_id"))
    },

    // Custom keyed state (mapGroupsWithState) under the oracle gate: in
    // batch mode each group passes through the state function once, so
    // the running totals equal the plain aggregate — the same
    // definition streams with per-micro-batch updates (StreamingSpec).
    "q58_user_totals" -> { (s, dir) =>
      Streams.runningUserTotals(events(s, dir)).toDF()
        .orderBy(col("user_id"))
    },

    // Exact interpolated percentiles per event type over integer
    // cents. Both engines use the same linear-interpolation definition
    // (idx = p·(n-1)); the 1e-12 float-expression noise between their
    // interpolation formulas is killed by rounding to 4 decimals —
    // interpolated values over integers have ≤1 meaningful decimal.
    "q84_percentiles" -> { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(CAST(round(value*100) AS BIGINT), 0.5)"), 4)
            .as("p50_cents"),
          round(expr("percentile(CAST(round(value*100) AS BIGINT), 0.9)"), 4)
            .as("p90_cents"))
        .orderBy(col("event_type"))
    },

    // The analytic-function family (absent from the reference, SURVEY
    // §2.9): lag, row_number, running sum, ntile — one window
    // partitioning per user, deterministic (ts, event_id) order.
    "q86_analytics" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          row_number().over(w).as("evt_rank"),
          sum(col("cents")).over(wRun).as("run_cents"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("event_id"))
    },

    // HLL++ sketch under the gate: approx_count_distinct is
    // deterministic for fixed input, so the 3-sigma error-bound flag is
    // a stable, oracle-checkable claim (the oracle supplies the exact
    // count and expects the bound to hold). At 100 TB the sketch is the
    // only affordable distinct count — this row certifies its accuracy
    // contract, not just its existence.
    "q85_approx_distinct" -> { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.05).as("__appr"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("__appr") - col("n_exact")) <=
            lit(3) * lit(0.05) * col("n_exact")).as("hll_ok"))
        .orderBy(col("event_type"))
    },

    // As-of join (point-in-time): each purchase enriched with the
    // user's most recent prior view — DuckDB's native ASOF JOIN is the
    // oracle. Views are pre-deduped per (user, ts) so the tie winner
    // is pinned in both engines.
    "q66_asof_join" -> { (s, dir) =>
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("event_id")).as("view_id"))
      graft.ops.Joins.asofJoin(purchases, views, Seq("user_id"),
          "ts", "vts",
          select = Seq("view_id" -> "last_view_id", "vts" -> "last_view_ts"),
          rightTieBreak = Some("view_id"))
        .orderBy(col("event_id"))
    },

    // Stream-stream interval join in its batch mode (ONE definition
    // runs both; StreamingSpec proves parity): clicks attributed to
    // same-user views within the preceding 30 minutes.
    "q69_interval_join" -> { (s, dir) =>
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("cts"),
          col("user_id").as("cuser"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("ts").as("vts"),
          col("user_id").as("vuser"))
      Streams.intervalJoin(clicks, views, Seq("cuser" -> "vuser"),
          "cts", "vts", watermark = "2 hours", window = "30 minutes")
        .select(col("click_id"), col("view_id"))
        .orderBy(col("click_id"), col("view_id"))
    },

    // approx_percentile under the gate (the q85/q97 sketch
    // discipline): the KLL-style summary is deterministic for fixed
    // input, and its contract is a RANK bound — the number of values
    // at or below the estimate must sit within eps*n of the target
    // rank. Spark computes the estimate AND audits the rank against
    // the exact data; the oracle recomputes n exactly and expects
    // every bound to hold. At 100 TB the summary is the only
    // single-pass percentile — this row certifies its contract.
    "q98_approx_percentile" -> { (s, dir) =>
      val cents = events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      val approx = cents.groupBy("event_type")
        .agg(expr("approx_percentile(cents, 0.5, 1000)").as("__ap"))
      cents.join(approx, "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("cents") < col("__ap"), 1L).otherwise(0L))
            .as("__n_lt"),
          sum(when(col("cents") <= col("__ap"), 1L).otherwise(0L))
            .as("__n_le"))
        // tie-aware rank bound: the estimate's rank interval
        // [#(<est)+1, #(<=est)] must intersect n/2 ± eps*n (+1 floor)
        .select(col("event_type"), col("n"),
          (col("__n_lt") <= col("n") / 2 + col("n") / 1000 + 1 &&
            col("__n_le") >= col("n") / 2 - col("n") / 1000 - 1)
            .as("rank_ok"))
        .orderBy(col("event_type"))
    },

    // Conversion-funnel analysis: per user, the earliest view, the
    // earliest click at-or-after it, the earliest purchase at-or-after
    // that — three conditional min-aggregations chained by joins that
    // all reuse the user_id exchange. Exact microsecond comparisons.
    "q105_funnel" -> { (s, dir) =>
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        col("ts"))
      val tv = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      val tc = e.filter(col("event_type") === "click")
        .join(tv, "user_id")
        .filter(col("ts") >= col("t_view"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
      val tp = e.filter(col("event_type") === "purchase")
        .join(tc, "user_id")
        .filter(col("ts") >= col("t_click"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      tv.join(tc, Seq("user_id"), "left")
        .join(tp, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"),
          (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0) +
            when(col("t_purchase").isNotNull, 1).otherwise(0))
            .as("stage_reached"))
        .orderBy(col("user_id"))
    },

    // Z-score outlier screen with EXACT aggregates: Σx and Σx² stay
    // exact (decimal(38,0) on the Spark side, HUGEINT in the oracle —
    // a 64-bit sum would silently wrap at ~10× this scale and diverge
    // from the oracle), and only the FINAL flag comparison runs in
    // doubles, with both engines evaluating the identical expression
    // tree over identical exact inputs — every double op is correctly
    // rounded, so the comparison is deterministic, overflow-free, and
    // drift-free. One partial-aggregated shuffle + a broadcast join.
    // Trailing-window rate feature: each event carries its user's
    // event count over the preceding hour — a RANGE frame over
    // microsecond integers, so the frame is value-based and tie-safe
    // (every event at the same ts sees the same count in any engine).
    // ONE exchange on the user key; the classic feature-engineering
    // shape for fraud/abuse velocity signals.
    "q122_trailing_rate" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("__us"))
        .rangeBetween(-3600000000L, 0)
      events(s, dir)
        // unix_micros takes TIMESTAMP only; the NTZ→LTZ cast is exact
        // under the session's UTC timezone
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts").cast("timestamp")).as("__us"))
        .withColumn("n_trailing_1h", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("n_trailing_1h"))
        .orderBy(col("event_id"))
    },

    "q102_outliers" -> { (s, dir) =>
      val cents = events(s, dir)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("x"))
      val stats = cents.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      cents.join(broadcast(stats), "event_type")
        // |n·x − Σx|² > 4·n·(n·Σx² − (Σx)²)/(n−1), evaluated in doubles
        // over the exact sums with one fixed association on both sides;
        // n and x cast to double BEFORE multiplying — a long n·x product
        // wraps silently in Spark at web scale while DuckDB raises
        .withColumn("__d",
          col("n").cast("double") * col("x").cast("double") -
            col("sx").cast("double"))
        .withColumn("outlier",
          col("__d") * col("__d") >
            lit(4.0) * col("n") *
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) /
              (col("n") - 1))
        .filter(col("outlier"))
        .select(col("event_id"), col("event_type"), col("x"))
        .orderBy(col("event_id"))
    },

    // Time-series forward-fill (gap fill): every event carries the
    // user's most recent purchase amount — last-non-null over one
    // per-user window (integer cents; deterministic (ts, event_id)
    // order). DuckDB's IGNORE NULLS last_value is the oracle.
    "q90_gapfill" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).as("purchase_cents"))
        .withColumn("filled_cents",
          last(col("purchase_cents"), ignoreNulls = true).over(w))
        .orderBy(col("event_id"))
    },

    // Cohort retention — the product-analytics staple: users grouped
    // by first-seen week (their cohort), retention counted as
    // distinct users active at each whole-week offset from the cohort
    // week. Two aggregations that reuse ONE user_id exchange (min-ts
    // per user, then distinct users per cohort×offset) — exact
    // integer week arithmetic on microsecond epochs, so both engines
    // bucket identically with no timezone or calendar in play.
    "q141_cohort_retention" -> { (s, dir) =>
      // epochBucket = exact long FLOOR division — see its scaladoc for
      // why neither Column `/` (double rounding) nor bare `div`
      // (truncates, diverging from DuckDB `//` on pre-1970 epochs) is
      // safe here.
      val e = events(s, dir).select(col("user_id"),
        epochBucket(604800000000L).as("wk"))
      val cohorts = e.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      e.join(cohorts, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_wk"), col("offset_wk"))
    },

    // DAU / WAU stickiness — the engagement ratio every product
    // dashboard carries. COUNT(DISTINCT) over a trailing frame is not
    // a window function in either engine, so the trailing-7-day
    // membership is materialized by fanning each (user, day) out to
    // the 7 days it contributes to — a bounded ×7 row amplification
    // on the DEDUPED (user, day) pairs, then two distinct
    // aggregations. Exact long floor-division epoch-day arithmetic
    // (the epochBucket discipline); output days are the observed ones.
    "q143_dau_wau" -> { (s, dir) =>
      val ud = events(s, dir)
        .select(col("user_id"), epochBucket(86400000000L).as("day"))
        .distinct()
      val dau = ud.groupBy("day")
        .agg(countDistinct(col("user_id")).as("n_dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("n_wau"))
      dau.join(wau, "day")
        .select(col("day"), col("n_dau"), col("n_wau"),
          round(col("n_dau").cast("double") / col("n_wau"), 6)
            .as("stickiness"))
        .orderBy(col("day"))
    },

    // Range/band join via integer-bucket blocking: an equi-join plus
    // exact range filter, never a cross product; the oracle runs the
    // naive inequality join.
    "q67_band_join" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val bands = Seq(("low", 0.0, 10.0), ("mid", 10.0, 25.0),
        ("high", 25.0, 100.0)).toDF("band", "lo", "hi")
      graft.ops.Joins.bandJoin(li, bands, "l_quantity", "lo", "hi",
          step = 10.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("band"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q41_event_windows" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    // gap-based sessions: new session when the microsecond gap to the
    // previous event is >= 30 min (session_window's end bound is
    // exclusive, so exactly-gap starts a new session)
    "q42_sessionize" ->
      """WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q43_json_props" ->
      """SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events
        |WHERE CAST(props->>'$.k' AS INT) > 50
        |ORDER BY event_id""".stripMargin,
    "q83_sliding_windows" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws,
        |    event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts)
        |      - INTERVAL '30 minutes' AS ws,
        |    event_type, value FROM events)
        |SELECT ws, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM b GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q58_user_totals" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q86_analytics" ->
      """SELECT event_id,
        |  lag(event_id) OVER w AS prev_event_id,
        |  row_number() OVER w AS evt_rank,
        |  CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents,
        |  ntile(4) OVER w AS quartile
        |FROM (SELECT event_id, user_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q85_approx_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_exact, TRUE AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q84_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(CAST(round(value*100) AS BIGINT), 0.5), 4)
        |    AS p50_cents,
        |  round(quantile_cont(CAST(round(value*100) AS BIGINT), 0.9), 4)
        |    AS p90_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q105_funnel" ->
      """WITH tv AS (SELECT user_id, min(ts) AS t_view FROM events
        |    WHERE event_type = 'view' GROUP BY user_id),
        |tc AS (SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN tv ON e.user_id = tv.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= tv.t_view
        |  GROUP BY e.user_id),
        |tp AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN tc ON e.user_id = tc.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= tc.t_click
        |  GROUP BY e.user_id)
        |SELECT tv.user_id, tv.t_view, tc.t_click, tp.t_purchase,
        |  CAST(1 + CASE WHEN tc.t_click IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN tp.t_purchase IS NOT NULL THEN 1 ELSE 0 END
        |    AS INT) AS stage_reached
        |FROM tv LEFT JOIN tc ON tv.user_id = tc.user_id
        |LEFT JOIN tp ON tv.user_id = tp.user_id
        |ORDER BY tv.user_id""".stripMargin,
    "q122_trailing_rate" ->
      """SELECT event_id, user_id, ts,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS n_trailing_1h
        |FROM events ORDER BY event_id""".stripMargin,
    "q102_outliers" ->
      """WITH c AS (SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |st AS (SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(x * x) AS sxx FROM c GROUP BY 1)
        |SELECT event_id, event_type, x FROM c JOIN st USING (event_type)
        |WHERE (CAST(n AS DOUBLE) * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE))
        |  > ((4.0 * n) * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / (n - 1)
        |ORDER BY event_id""".stripMargin,
    "q98_approx_percentile" ->
      """SELECT event_type, COUNT(*) AS n, TRUE AS rank_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q90_gapfill" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) END AS purchase_cents
        |  FROM events)
        |SELECT event_id, user_id, ts, purchase_cents,
        |  last_value(purchase_cents IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
        |FROM e ORDER BY event_id""".stripMargin,
    "q66_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |    WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts AS vts, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, p.ts,
        |  v.view_id AS last_view_id, v.vts AS last_view_ts
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts >= v.vts
        |ORDER BY p.event_id""".stripMargin,
    "q69_interval_join" ->
      """WITH c AS (SELECT event_id AS click_id, ts AS cts, user_id AS u
        |    FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, ts AS vts, user_id AS u
        |  FROM events WHERE event_type = 'view')
        |SELECT c.click_id, v.view_id
        |FROM c JOIN v ON c.u = v.u
        |  AND v.vts >= c.cts - INTERVAL '30 minutes'
        |  AND v.vts <= c.cts
        |ORDER BY c.click_id, v.view_id""".stripMargin,
    "q143_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS n_dau
        |  FROM ud GROUP BY day),
        |f AS (SELECT ud.user_id, ud.day + ofs.o AS day
        |  FROM ud, (SELECT unnest(range(7)) AS o) ofs),
        |wau AS (SELECT day, COUNT(DISTINCT user_id) AS n_wau
        |  FROM f GROUP BY day)
        |SELECT dau.day, dau.n_dau, wau.n_wau,
        |  round(CAST(dau.n_dau AS DOUBLE) / wau.n_wau, 6) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY dau.day""".stripMargin,
    "q141_cohort_retention" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id)
        |SELECT c.cohort_wk, e.wk - c.cohort_wk AS offset_wk,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_wk, offset_wk""".stripMargin,
    "q67_band_join" ->
      """WITH b AS (SELECT * FROM (VALUES
        |    ('low', 0.0, 10.0), ('mid', 10.0, 25.0), ('high', 25.0, 100.0))
        |  AS t(band, lo, hi))
        |SELECT l.l_orderkey, l.l_linenumber, b.band
        |FROM lineitem l JOIN b
        |  ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin
  )
}
