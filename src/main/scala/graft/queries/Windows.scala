package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsofJoin

/** Window functions, event-stream analytics, AS-OF / range joins, pivot,
  * JSON extraction (SURVEY.md §2B rows: window functions, joins ASOF/range,
  * JSON functions).
  *
  * Oracle note: `events.ts` is TIMESTAMP(NANOS) in parquet; Spark reads it
  * as long-nanos and truncates to micros (Tables.load), so every oracle
  * query goes through a CTE that `cast(ts AS timestamp)`s — DuckDB's
  * ns→µs truncation — keeping both engines on identical µs values.
  */
object Windows {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Oracle CTE aligning DuckDB's view of events with Spark's (µs ts). */
  private val E =
    """WITH e AS (SELECT event_id, cast(ts AS timestamp) AS ts, user_id,
      |               event_type, value, props FROM events)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-N per group via row_number (raw doubles: exact cross-engine).
    "q24_window_topn" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
        col("o_orderkey"), col("o_totalprice"))
      val w = Window.partitionBy("y", "m")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .orderBy("y", "m", "rn")
    }),

    // Running (cumulative) sum — classic prefix aggregation frame.
    "q25_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("running"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // lag/lead over an event stream.
    "q26_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          lag("event_type", 1).over(w).as("prev_type"),
          lead("event_type", 1).over(w).as("next_type"))
        .orderBy("user_id", "event_id")
    }),

    // Moving average over a bounded ROWS frame.
    "q27_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(avg("value").over(w), 4).as("mov_avg"))
        .orderBy("user_id", "event_id")
    }),

    // ntile bucketing + per-bucket aggregate — distributed two-pass
    // global rank (range repartition + per-partition row_number +
    // driver-side offsets), NOT a single-partition Window.orderBy
    // (VERDICT r1: that plan moves every row to one task at scale).
    "q28_ntile" -> ((s, dir) => {
      graft.operators.DistributedRank.ntile(
          t(s, dir, "orders").select("o_totalprice", "o_orderkey"),
          n = 4, sortCols = Seq(col("o_totalprice").desc, col("o_orderkey")))
        .groupBy("tile")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("tot"))
        .orderBy("tile")
    }),

    // first_value / last_value over the full-partition frame.
    "q29_first_last" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("user_id"),
          first("event_type").over(w).as("first_type"),
          last("event_type").over(w).as("last_type"))
        .distinct()
        .orderBy("user_id")
    }),

    // JSON extraction from a string column (props = {"k": int}).
    "q30_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k").cast("long")).as("sum_k"),
          count(when(col("k") > 50, lit(1))).as("n_high"))
        .orderBy("event_type")
    }),

    // Sessionization: 30-min-gap session assignment via lag + cumulative
    // sum — the standard single-shuffle formulation.
    "q31_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
        .withColumn("session_id", sum("new_s").over(cum))
        .groupBy("user_id")
        .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // AS-OF join (custom operator — graft.operators.AsofJoin): for each
    // click, the user's most recent purchase at or before it.
    "q32_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      // dedupe right per (user, ts) so ties are deterministic in both engines
      val w = Window.partitionBy("user_id", "ts")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_event"), col("value").as("p_value"))
        .withColumn("rn", row_number().over(w.orderBy(col("p_event").desc)))
        .where(col("rn") === 1).drop("rn")
      AsofJoin.backward(clicks, purchases,
        keyL = "user_id", timeL = "ts", keyR = "user_id", timeR = "ts",
        rightCols = Seq("p_event", "p_value"))
        .select("event_id", "user_id", "p_event", "p_value")
        .orderBy("event_id")
    }),

    // Range join with an equi key (hash join + residual range filter —
    // no cross product at scale).
    "q33_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"))
      c.join(p, col("cu") === col("pu") &&
          col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("cu").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // Forward AS-OF join (DuckDB `ASOF ... ON l.ts <= r.ts`): each
    // click matched to the NEAREST FOLLOWING purchase of the same user.
    "q36_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val w = Window.partitionBy("user_id", "ts")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_event"), col("value").as("p_value"))
        .withColumn("rn", row_number().over(w.orderBy(col("p_event").desc)))
        .where(col("rn") === 1).drop("rn")
      AsofJoin.forward(clicks, purchases,
        keyL = "user_id", timeL = "ts", keyR = "user_id", timeR = "ts",
        rightCols = Seq("p_event", "p_value"))
        .select("event_id", "user_id", "p_event", "p_value")
        .orderBy("event_id")
    }),

    // Pivot (event_type → columns).
    "q34_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("user_id") +: types.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
        .orderBy("user_id")
    }),

    // Remaining rank-family window functions: percent_rank, cume_dist,
    // nth_value with an explicit frame, dense_rank — exact rational
    // outputs (rank arithmetic over integers), rounded once.
    "q40_rank_variants" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .where(col("l_orderkey") % 37 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"),
          dense_rank().over(w).as("drank"),
          round(percent_rank().over(w), 4).as("prank"),
          round(cume_dist().over(w), 4).as("cdist"),
          nth_value(col("l_quantity"), 3).over(wf).as("third_qty"))
        .orderBy("l_returnflag", "l_quantity", "l_orderkey",
          "l_linenumber")
    }),

    // Hopping (sliding) event-time windows via Spark's built-in
    // `window()` generator — 1 h windows every 30 min, so each event
    // lands in exactly 2 windows. Batch counterpart of the streaming
    // windowed aggregation (streaming/StreamIngest.scala); the oracle
    // re-derives the window starts with time_bucket arithmetic, so an
    // alignment or boundary bug (epoch offset, [start, end) vs
    // (start, end]) breaks the hash.
    "q38_hopping_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(col("window.start").as("w_start"),
          col("window.end").as("w_end"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // Trailing event-time RANGE frame: per-user rolling 1-hour count
    // and value sum — the interval-bounded frame class (distinct from
    // the row-counted frames of q25/q27). Spark expresses the interval
    // bound as a numeric range over exact integer microseconds; both
    // engines include frame endpoints, so the row sets agree exactly.
    "q43_rolling_window" -> ((s, dir) => {
      // cast: events.ts is TIMESTAMP_NTZ (tz-less parquet); unix_micros
      // accepts only LTZ, and the UTC session makes the cast exact
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts").cast("timestamp")))
        .rangeBetween(-3600000000L, 0L)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum("value").over(w), 4).as("sum_1h"))
        .orderBy("user_id", "event_id")
    }),

    // Rate-spike (burst) detection: per event-type minute counts
    // against a trailing 30-minute baseline that EXCLUDES the current
    // minute (upper bound −1 min), flagging minutes at >3× baseline —
    // the alerting primitive every log pipeline runs. One
    // map-side-combined bucket count, then an interval-RANGE window
    // per type; the baseline average divides an exact integer sum, so
    // the trunc4'd value and the flag are engine-stable.
    "q44_burst_detect" -> ((s, dir) => {
      val mc = t(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type")
        .orderBy(unix_micros(col("minute").cast("timestamp")))
        .rangeBetween(-1800000000L, -60000000L)
      mc.select(col("event_type"), col("minute"), col("n"),
          avg(col("n")).over(w).as("__base"))
        .select(col("event_type"), col("minute"), col("n"),
          graft.functions.TextFunctions.trunc4(col("__base"))
            .as("base_avg"),
          (col("__base").isNotNull &&
            col("n") > lit(3.0) * col("__base")).as("is_burst"))
        .orderBy("event_type", "minute")
    }),

    // Ordered conversion funnel (view → click → purchase within 72 h
    // of the first step): each stage is a user-keyed min-timestamp
    // aggregate joined forward with a strictly-after condition — three
    // map-side-combined aggregates, no window over event history, no
    // sequence explosion. The final rate divides two exact integers
    // (trunc4'd); the 3-row stage summary legitimately uses a bare
    // window (metadata-sized, the Sampling.scala:105 convention).
    "q45_funnel" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = e.where(col("event_type") === "click").join(s1, "user_id")
        .where(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 72 HOURS"))
        .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
      val s3 = e.where(col("event_type") === "purchase")
        .join(s2, "user_id")
        .where(col("ts") > col("t2") &&
          col("ts") <= col("t1") + expr("INTERVAL 72 HOURS"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      val stages = s1.select(lit("1_view").as("stage"), col("user_id"))
        .unionByName(s2.select(lit("2_click").as("stage"), col("user_id")))
        .unionByName(s3.select(lit("3_purchase").as("stage"),
          col("user_id")))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
      val wAll = Window.partitionBy()
      stages.select(col("stage"), col("n_users"),
          graft.functions.TextFunctions.trunc4(
            col("n_users").cast("double")
              / max(when(col("stage") === "1_view", col("n_users")))
                .over(wAll).cast("double")).as("conv"))
        .orderBy("stage")
    }),

    // Weekly retention cohorts: cohort = week of a user's first event,
    // cell = distinct users active at each week offset — integer-exact
    // (aligned week truncation, µs offsets divide evenly), two
    // map-side-combined aggregates and one user-keyed join.
    "q46_retention" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"), col("ts"))
      val cohort = e.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).as("cw"))
      val active = e.select(col("user_id"),
        date_trunc("week", col("ts")).as("aw")).distinct()
      active.join(cohort, "user_id")
        .select(col("cw").as("cohort_week"),
          ((unix_micros(col("aw").cast("timestamp"))
            - unix_micros(col("cw").cast("timestamp")))
            / lit(604800000000L)).cast("long").as("week_offset"),
          col("user_id"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // First-order event-transition matrix: per user, each event's
    // successor (lag over the (ts, event_id) total order), rolled up
    // to (from, to) counts and row-normalized probabilities — the
    // Markov-chain view of user behavior. One user-partitioned window
    // + one map-side-combined count; the probability divides exact
    // integers (trunc4'd).
    "q47_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("to_type"))
        .withColumn("from_type", lag("to_type", 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val wf = Window.partitionBy("from_type")
      pairs.select(col("from_type"), col("to_type"), col("n"),
          graft.functions.TextFunctions.trunc4(
            col("n").cast("double")
              / sum("n").over(wf).cast("double")).as("p"))
        .orderBy("from_type", "to_type")
    }),

    // Trailing active-user counts (DAU / 7-day WAU / 30-day MAU per
    // day): the user-day relation is deduped ONCE (map-side-combined
    // distinct), then the small day grid broadcast-joins user-days
    // within the 30-day horizon — the corpus never self-joins, and the
    // per-day distincts are one conditional-countDistinct aggregate.
    // Day arithmetic in exact integer microseconds over aligned
    // truncations.
    "q48_active_users" -> ((s, dir) => {
      val du = t(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val days = du.select(col("day").as("d")).distinct()
      def um(c: org.apache.spark.sql.Column) =
        unix_micros(c.cast("timestamp"))
      val j = du.join(broadcast(days),
        um(col("d")) - um(col("day")) >= 0L &&
          um(col("d")) - um(col("day")) <= 29L * 86400000000L)
        .withColumn("diff",
          ((um(col("d")) - um(col("day"))) / 86400000000L).cast("int"))
      j.groupBy("d")
        .agg(
          countDistinct(when(col("diff") === 0, col("user_id"))).as("dau"),
          countDistinct(when(col("diff") <= 6, col("user_id"))).as("wau"),
          countDistinct(col("user_id")).as("mau"))
        .orderBy("d")
    }),

    // Batch gap-based sessionization: events into visits by 30-minute
    // inactivity gap, rolled up per session. One shuffle by user; gap
    // math in exact integer microseconds (Sessionize scaladoc).
    "q42_sessionize" -> ((s, dir) => {
      graft.operators.Sessionize.sessions(
          t(s, dir, "events"), "user_id", "ts", "event_id", "value",
          gapSeconds = 1800)
        .orderBy("user_id", "session_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q40_rank_variants" -> """
      WITH f AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                        l_quantity
                 FROM lineitem WHERE l_orderkey % 37 = 0)
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             cast(dense_rank() OVER w AS int) AS drank,
             round(percent_rank() OVER w, 4) AS prank,
             round(cume_dist() OVER w, 4) AS cdist,
             nth_value(l_quantity, 3) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_quantity, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS third_qty
      FROM f
      WINDOW w AS (PARTITION BY l_returnflag
                   ORDER BY l_quantity, l_orderkey, l_linenumber)
      ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""",
    "q38_hopping_window" -> (E + """
      , grid AS (SELECT i FROM (SELECT unnest(range(0, 2)) AS i)),
      w AS (SELECT event_type, value,
                   time_bucket(INTERVAL 30 MINUTE, ts)
                     - i * INTERVAL 30 MINUTE AS w_start
            FROM e CROSS JOIN grid)
      SELECT w_start, w_start + INTERVAL 60 MINUTE AS w_end, event_type,
             count(*) AS n, round(sum(value), 4) AS sum_value
      FROM w GROUP BY 1, 2, 3 ORDER BY w_start, event_type"""),
    "q43_rolling_window" -> (E + """
      SELECT user_id, event_id, ts,
             count(*) OVER w AS n_1h,
             round(sum(value) OVER w, 4) AS sum_1h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                     AND CURRENT ROW)
      ORDER BY user_id, event_id"""),
    "q48_active_users" -> (E + """
      , du AS (SELECT DISTINCT user_id,
                 cast(date_trunc('day', ts) AS timestamp) AS day FROM e),
      days AS (SELECT DISTINCT day AS d FROM du),
      j AS (SELECT days.d, du.user_id,
              cast((epoch_us(days.d) - epoch_us(du.day)) / 86400000000
                AS int) AS diff
            FROM du JOIN days ON du.day <= days.d
              AND du.day >= days.d - INTERVAL 29 DAY)
      SELECT d,
             cast(count(DISTINCT CASE WHEN diff = 0 THEN user_id END)
               AS bigint) AS dau,
             cast(count(DISTINCT CASE WHEN diff <= 6 THEN user_id END)
               AS bigint) AS wau,
             cast(count(DISTINCT user_id) AS bigint) AS mau
      FROM j GROUP BY d ORDER BY d"""),
    "q47_transitions" -> (E + """
      , p AS (SELECT user_id, event_type AS to_type,
                lag(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS from_type
              FROM e),
      c AS (SELECT from_type, to_type, count(*) AS n
            FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, cast(n AS bigint) AS n,
             floor(n::DOUBLE / (sum(n) OVER (PARTITION BY from_type))::DOUBLE
               * 10000) / 10000 AS p
      FROM c ORDER BY from_type, to_type"""),
    "q45_funnel" -> (E + """
      , s1 AS (SELECT user_id, min(ts) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
             FROM e JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t1
               AND e.ts <= s1.t1 + INTERVAL 72 HOUR
             GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3
             FROM e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2
               AND e.ts <= s2.t1 + INTERVAL 72 HOUR
             GROUP BY 1),
      st AS (SELECT '1_view' AS stage, user_id FROM s1
             UNION ALL SELECT '2_click', user_id FROM s2
             UNION ALL SELECT '3_purchase', user_id FROM s3),
      c AS (SELECT stage, count(*) AS n_users FROM st GROUP BY 1)
      SELECT stage, cast(n_users AS bigint) AS n_users,
             floor(n_users::DOUBLE
               / (SELECT max(CASE WHEN stage = '1_view' THEN n_users END)
                  FROM c)::DOUBLE * 10000) / 10000 AS conv
      FROM c ORDER BY stage"""),
    "q46_retention" -> (E + """
      , c AS (SELECT user_id,
                cast(date_trunc('week', min(ts)) AS timestamp) AS cw
              FROM e GROUP BY 1),
      a AS (SELECT DISTINCT user_id,
              cast(date_trunc('week', ts) AS timestamp) AS aw FROM e)
      SELECT c.cw AS cohort_week,
             cast((epoch_us(a.aw) - epoch_us(c.cw)) / 604800000000
               AS bigint) AS week_offset,
             cast(count(DISTINCT a.user_id) AS bigint) AS n_users
      FROM a JOIN c USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""),
    "q44_burst_detect" -> (E + """
      , mc AS (SELECT event_type, date_trunc('minute', ts) AS minute,
                 count(*) AS n
               FROM e GROUP BY 1, 2),
      b AS (SELECT event_type, minute, n,
              avg(n) OVER (PARTITION BY event_type ORDER BY minute
                RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
                  AND INTERVAL 1 MINUTE PRECEDING) AS base
            FROM mc)
      SELECT event_type, minute, cast(n AS bigint) AS n,
             floor(base * 10000) / 10000 AS base_avg,
             (base IS NOT NULL AND n > 3.0::DOUBLE * base) AS is_burst
      FROM b ORDER BY event_type, minute"""),
    "q42_sessionize" -> (E + """
      , p AS (SELECT user_id, ts, event_id, value,
                lag(ts) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev
              FROM e),
      n AS (SELECT *, CASE WHEN prev IS NULL
                             OR ts - prev > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new FROM p),
      s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS session_id FROM n)
      SELECT user_id, cast(session_id AS bigint) AS session_id,
             min(ts) AS session_start, max(ts) AS session_end,
             cast(count(*) AS bigint) AS n_events,
             (epoch_us(max(ts)) - epoch_us(min(ts)))
               / 1000000.0 AS duration_s,
             round(sum(value), 4) AS sum_value
      FROM s GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""),
    "q24_window_topn" -> """
      SELECT * FROM (
        SELECT cast(year(o_orderdate) AS int) AS y,
               cast(month(o_orderdate) AS int) AS m,
               o_orderkey, o_totalprice,
               cast(row_number() OVER (PARTITION BY year(o_orderdate), month(o_orderdate)
                    ORDER BY o_totalprice DESC, o_orderkey) AS int) AS rn
        FROM orders)
      WHERE rn <= 3 ORDER BY y, m, rn""",
    "q25_window_running" -> """
      SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
      FROM orders ORDER BY o_custkey, o_orderkey""",
    "q26_lead_lag" -> (E + """
      SELECT user_id, event_id,
             lag(event_type, 1) OVER w AS prev_type,
             lead(event_type, 1) OVER w AS next_type
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""),
    "q27_moving_avg" -> (E + """
      SELECT user_id, event_id,
             round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
      FROM e ORDER BY user_id, event_id"""),
    "q28_ntile" -> """
      SELECT tile, count(*) AS n, round(sum(o_totalprice), 2) AS tot
      FROM (SELECT o_totalprice,
              cast(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS int) AS tile
            FROM orders)
      GROUP BY tile ORDER BY tile""",
    "q29_first_last" -> (E + """
      SELECT DISTINCT user_id,
             first_value(event_type) OVER w AS first_type,
             last_value(event_type) OVER w AS last_type
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id"""),
    "q30_json_extract" -> """
      SELECT event_type,
             cast(sum(cast(json_extract_string(props, '$.k') AS int)) AS bigint) AS sum_k,
             count(CASE WHEN cast(json_extract_string(props, '$.k') AS int) > 50 THEN 1 END) AS n_high
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q31_sessionize" -> (E + """
      , g AS (
        SELECT user_id, event_id, ts,
               lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM e),
      sess AS (
        SELECT user_id, event_id,
               CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM g),
      numbered AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM sess)
      SELECT user_id, cast(max(session_id) AS bigint) AS n_sessions,
             count(*) AS n_events
      FROM numbered GROUP BY user_id ORDER BY user_id"""),
    "q32_asof_join" -> (E + """
      , clicks AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
      purch AS (
        SELECT user_id, ts, event_id AS p_event, value AS p_value
        FROM (SELECT user_id, ts, event_id, value,
                row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
              FROM e WHERE event_type = 'purchase')
        WHERE rn = 1)
      SELECT c.event_id, c.user_id, p.p_event, p.p_value
      FROM clicks c ASOF LEFT JOIN purch p
        ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY c.event_id"""),
    "q36_asof_forward" -> (E + """
      , clicks AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
      purch AS (
        SELECT user_id, ts, event_id AS p_event, value AS p_value
        FROM (SELECT user_id, ts, event_id, value,
                row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
              FROM e WHERE event_type = 'purchase')
        WHERE rn = 1)
      SELECT c.event_id, c.user_id, p.p_event, p.p_value
      FROM clicks c ASOF LEFT JOIN purch p
        ON c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY c.event_id"""),
    "q33_range_join" -> (E + """
      , c AS (SELECT user_id AS cu, ts AS cts FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id AS pu, ts AS pts FROM e WHERE event_type = 'purchase')
      SELECT cu AS user_id, count(*) AS n_pairs
      FROM c JOIN p ON cu = pu AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR
      GROUP BY cu ORDER BY user_id"""),
    "q34_pivot" -> """
      SELECT user_id,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
             count(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
      FROM events GROUP BY user_id ORDER BY user_id"""
  )
}
