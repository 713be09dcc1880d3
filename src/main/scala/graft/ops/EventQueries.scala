package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / event-stream operators over the `events` table, expressed
  * as batch DataFrame programs (the streaming twins live in
  * [[graft.streaming.StreamingPipelines]] and are exercised by ScalaTest —
  * DuckDB cannot oracle a stream).
  *
  * Scale stance:
  *  - as-of join uses the union + last(ignoreNulls) running-state trick —
  *    one shuffle on (key), no per-row point lookups, no broadcast of the
  *    fact side; this is the standard big-data as-of formulation.
  *  - the range self-join buckets time into join keys so Spark gets an
  *    equi-join (hash, parallel) instead of a theta-join nested loop.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // Peak concurrency by SWEEP LINE: each event opens a 30-minute
    // interval; +1/−1 endpoint deltas, a running sum, and the maximum of
    // that sum is the peak number of simultaneously-open intervals per
    // event_type (capacity planning's core query). Ordering (us, delta)
    // makes ends sort before starts at a shared instant, so touching
    // half-open intervals never double-count; the default peer-inclusive
    // RANGE frame keeps the cumulative deterministic under full ties.
    // Scale: the prefix sum is TWO-LEVEL — within-day running sums ride a
    // (type, day) partitioning (parallel across days, the big-table
    // work), and each day's carry-in is the cumulative of the tiny
    // per-day delta totals (types × days rows) joined back. A single
    // per-type window would serialize the whole sweep through one task at
    // 100 TB; prefix-sum decomposition is exact, so the two formulations
    // agree bit-for-bit. The peak extraction is one struct-max aggregate
    // (peak, then earliest instant at peak), not a second window pass.
    "q151_peak_concurrency" -> ((s, d) => {
      val dayUs = 86400L * 1000000L
      val ev = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      val deltas = ev.select(col("event_type"), col("us"), lit(1L).as("delta"))
        .unionByName(ev.select(col("event_type"),
          (col("us") + 1800L * 1000000L).as("us"), lit(-1L).as("delta")))
        .withColumn("day", expr(s"us DIV ${dayUs}L"))
      val wDay = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("us"), col("delta"))
      val wCarry = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carries = deltas.groupBy("event_type", "day")
        .agg(sum(col("delta")).as("day_total"))
        .withColumn("carry",
          coalesce(sum(col("day_total")).over(wCarry), lit(0L)))
        .select("event_type", "day", "carry")
      deltas
        .withColumn("run_in_day", sum(col("delta")).over(wDay))
        .join(broadcast(carries), Seq("event_type", "day"))
        .withColumn("run", col("carry") + col("run_in_day"))
        .groupBy("event_type")
        .agg(max(struct(col("run"), (lit(0L) - col("us")).as("nus"))).as("m"))
        .select(col("event_type"), col("m.run").as("peak_n"),
          (lit(0L) - col("m.nus")).as("first_peak_us"))
        .orderBy("event_type")
    }),

    // NEAREST-tolerance join — the merge_asof(direction='nearest')
    // semantics q83's backward as-of can't express: align every error
    // event to its closest same-user purchase within ±6 hours (the
    // fixture's per-user event spacing is hours, so a minutes-scale
    // tolerance would leave the match path untested),
    // whichever side it falls on (ties prefer the earlier event, then
    // the smaller id — total order). Sensor/beacon alignment is the
    // production shape.
    // Scale: no per-user sort, no unbounded window — candidates come
    // from a (user, time-bucket) equi-join with the right side exploded
    // into its 3 adjacent tolerance-width buckets (any event within ±T
    // is provably in them), so the join fans out by per-user density in
    // a 3T window, never by history length. The best-candidate pick is
    // a per-left-row bounded window.
    "q224_nearest_join" -> ((s, d) => {
      val tolUs = 21600L * 1000000L
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("eid"), col("user_id"), col("us").as("eus"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("us").as("pus"))
      val errB = err.withColumn("b", expr(s"eus DIV ${tolUs}L"))
      val purB = pur.select(col("pid"), col("user_id"), col("pus"),
        explode(array(expr(s"pus DIV ${tolUs}L - 1"),
          expr(s"pus DIV ${tolUs}L"),
          expr(s"pus DIV ${tolUs}L + 1"))).as("b"))
      // no distinct: the 3 exploded buckets per purchase are DISTINCT
      // values and each error carries one bucket, so a (eid, pid) pair
      // can match at most once — a dedup here would be a pure extra
      // shuffle of the largest intermediate (review finding)
      val cand = errB.join(purB, Seq("user_id", "b"))
        .withColumn("delta", col("pus") - col("eus"))
        .filter(abs(col("delta")) <= tolUs)
        .select("eid", "pid", "delta")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("eid")
        .orderBy(abs(col("delta")), col("delta"), col("pid"))
      val best = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("eid", "pid", "delta")
      err.join(best, Seq("eid"), "left")
        .select(col("eid").as("error_id"),
          coalesce(col("pid"), lit(-1L)).as("nearest_purchase_id"),
          coalesce(col("delta"), lit(0L)).as("delta_us"),
          when(col("pid").isNull, lit("none"))
            .when(col("delta") <= 0, lit("backward"))
            .otherwise(lit("forward")).as("direction"))
        .orderBy("error_id")
    }),

    // TOUCH ATTRIBUTION — the conversion-credit assignment every
    // marketing/event pipeline runs: attribute each purchase to the
    // same user's first AND last touch (click or view) in the strictly
    // preceding 7 days; purchases with no touch in the window report
    // channel 'none'. Ties resolve totally: first = earliest ts then
    // smallest event_id, last = latest ts then largest event_id.
    // Scale: the q224 discipline — candidates come from a (user,
    // 7-day-bucket) equi-join with touches exploded into 2 adjacent
    // buckets (any touch within the backward window is provably in
    // them), so fan-out is per-user density in 14 days, never history
    // length; the best-candidate picks are bounded per-purchase
    // windows, and the report is a 2×channels rollup.
    "q241_touch_attribution" -> ((s, d) => {
      val winUs = 7L * 86400L * 1000000L
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          col("us").as("pus"), expr(s"us DIV ${winUs}L").as("b"))
      val touch = ev.filter(col("event_type").isin("click", "view"))
        .select(col("event_id").as("tid"), col("user_id"),
          col("event_type").as("channel"), col("us").as("tus"))
        .withColumn("b", explode(array(expr(s"tus DIV ${winUs}L"),
          expr(s"tus DIV ${winUs}L + 1"))))
      val cand = pur.join(touch, Seq("user_id", "b"))
        .filter(col("tus") < col("pus") && col("pus") - col("tus") <= winUs)
        .select("pid", "tid", "channel", "tus")
        // a touch whose two buckets BOTH meet the same purchase (b and
        // b+1 collide when the purchase sits in the touch's own bucket)
        // must count once
        .distinct()
      def pick(model: String, w: org.apache.spark.sql.expressions.WindowSpec) =
        cand.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("pid"), lit(model).as("model"), col("channel"))
      val first = pick("first_touch",
        org.apache.spark.sql.expressions.Window.partitionBy("pid")
          .orderBy(col("tus"), col("tid")))
      val last = pick("last_touch",
        org.apache.spark.sql.expressions.Window.partitionBy("pid")
          .orderBy(col("tus").desc, col("tid").desc))
      val models = pur.select("pid")
        .crossJoin(pur.sparkSession.range(1).select(explode(
          array(lit("first_touch"), lit("last_touch"))).as("model")))
      models.join(first.unionByName(last), Seq("pid", "model"), "left")
        .groupBy(col("model"), coalesce(col("channel"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy("model", "channel")
    }),

    // FUNNEL TIME-TO-CONVERT quantiles — how LONG conversion takes, the
    // dimension q130's count funnel drops: per user, the first view and
    // the first purchase strictly after it; latency in whole minutes,
    // cohorted by the weekday the journey STARTED (time-to-convert is
    // routinely day-of-week-shaped). Quantiles ride the q228 ceil-rank
    // histogram machinery — latency minutes are a bounded domain
    // (retention window), so the per-cohort census is control-plane-
    // sized and nothing sorts the user stream.
    // Scale: two map-side-combining min-aggregates on user_id ride ONE
    // shuffle each; the (cohort, minutes) census aggregates map-side.
    "q245_funnel_latency" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("vus"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(firstView, "user_id")
        .filter(col("us") > col("vus"))
        .groupBy("user_id").agg(min(col("us")).as("pus"), min(col("vus")).as("vus"))
      val h = conv
        .select(expr("CAST((vus DIV 86400000000) % 7 AS STRING)").as("start_weekday"),
          expr("(pus - vus) DIV 60000000").as("cents"))
        .groupBy("start_weekday", "cents").agg(count(lit(1)).as("c"))
      MonitoringQueries.latencyQuantilesOf(h, "start_weekday")
        .withColumnsRenamed(Map("p50" -> "p50_min", "p90" -> "p90_min",
          "p99" -> "p99_min", "n_events" -> "n_users"))
    }),

    // WILSON LOWER-BOUND ranking — the experiment readout that never
    // crowns a tiny lucky arm: 20 user-hash arms, per-arm conversion
    // (any purchase), ranked by the Wilson score interval's lower bound
    // at z = 2 — chosen because z² = 4 keeps every intermediate an
    // EXACT integer-derived double: LB = (x + 2 − 2·√(x(n−x)/n + 1)) /
    // (n + 4), one correctly-rounded sqrt and one division of exact
    // values, bit-identical cross-engine (the q56/q258 exact-moments
    // discipline; a float z like 1.96 would smear rounding across the
    // whole expression).
    // Scale: one (arm, user) rollup with map-side combine is the only
    // full-data pass; the ranking window runs over 20 control-plane
    // rows.
    "q262_wilson_bound" -> ((s, d) => {
      // success = a HIGH-VALUE purchase (≥ $99): the fixture's users all
      // purchase eventually, so plain conversion is a dead 100% readout;
      // the rare event splits arms genuinely and gives Wilson shrinkage
      // something to rank
      val u = Tables.events(s, d)
        .select((col("user_id") % 20).as("arm"), col("user_id"),
          when(col("event_type") === "purchase" && col("value") >= 99, 1L)
            .otherwise(0L).as("p"))
        .groupBy("arm", "user_id").agg(max(col("p")).as("purchased"))
      val st = u.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum(col("purchased")).as("x"))
        .withColumn("rate_bp", expr("(x * 10000) DIV n"))
        .withColumn("wilson_lb", expr(
          """(CAST(x AS DOUBLE) + 2.0
              - 2.0 * sqrt(CAST(x AS DOUBLE) * CAST(n - x AS DOUBLE)
                           / CAST(n AS DOUBLE) + 1.0))
             / CAST(n + 4 AS DOUBLE)"""))
      val w = Window.orderBy(col("wilson_lb").desc, col("arm"))
      st.withColumn("lb_rank", row_number().over(w).cast("long"))
        .select("lb_rank", "arm", "n", "x", "rate_bp", "wilson_lb")
        .orderBy("lb_rank")
    }),

    // DAU/WAU STICKINESS — the engagement ratio product dashboards
    // lead with: per day, distinct daily actives over distinct
    // trailing-7-day actives, in bp. The sliding-window DISTINCT is
    // the trap (a naive 7-day self-join re-scans history); instead
    // every (user, day) contributes itself to the 7 window-ends it can
    // appear in (bounded ×7 explode — the q224/q241 bucket discipline
    // applied to windows), one distinct collapses multi-day users per
    // window, and both censuses are map-side-combined counts. Days
    // without a full trailing window are excluded, not reported as
    // artificially sticky partial windows.
    "q263_stickiness" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("wday"))
        .distinct()
        .groupBy(col("wday").as("day")).agg(count(lit(1)).as("wau"))
      val bounds = ud.agg(min(col("day")).as("d0"), max(col("day")).as("dmax"))
      dau.join(wau, "day").crossJoin(broadcast(bounds))
        .filter(col("day") >= col("d0") + 6 && col("day") <= col("dmax"))
        .select(col("day"), col("dau"), col("wau"),
          expr("(dau * 10000) DIV wau").as("stickiness_bp"))
        .orderBy("day")
    }),

    // COHORT LTV curve — the revenue companion to q131's retention
    // counts: per signup cohort (epoch week of first event), weekly and
    // cumulative purchase revenue in exact cents, normalized per cohort
    // member (truncating DIV) — the curve a growth team reads to price
    // acquisition. Offsets with zero purchases simply don't emit a row
    // (the cumulative is still exact at every emitted offset).
    // Scale: the cohort assignment is one user-keyed min-aggregate, the
    // revenue rollup one (cohort, offset) aggregate with map-side
    // combine; the cumulative window runs over the calendar-sized
    // (cohort × offset) table, never events.
    "q266_cohort_ltv" -> ((s, d) => {
      val weekUs = 604800000000L
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      val cohort = ev.groupBy("user_id")
        .agg(expr(s"min(us) DIV ${weekUs}L").as("cw"))
      val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("n_users"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .withColumn("off", expr(s"us DIV ${weekUs}L - cw"))
        .groupBy("cw", "off")
        .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("week_cents"))
      val w = Window.partitionBy("cw").orderBy("off")
      rev.withColumn("cum_cents", sum(col("week_cents")).over(w))
        .join(broadcast(sizes), "cw")
        .select(col("cw").as("cohort_week"), col("off").as("week_offset"),
          col("n_users"), col("week_cents"), col("cum_cents"),
          expr("cum_cents DIV n_users").as("ltv_per_user_c"))
        .orderBy("cohort_week", "week_offset")
    }),

    // POINT-IN-TIME feature extraction — the leakage-safe feature-store
    // materialization every churn model needs: features computed ONLY
    // from events at or before a cutoff (newest event − 7 days), label
    // = any activity after it. Computing features over the full table
    // and a label over its tail is THE classic leakage bug; here the
    // cutoff is a one-row broadcast and the filter is explicit on both
    // engine sides. Features: recency (days since last pre-cutoff
    // event), total events, 14-day frequency, purchase cents.
    // Scale: two filtered user-keyed aggregates with map-side combine;
    // the label side reduces to a distinct user list before the join.
    "q268_pit_features" -> ((s, d) => {
      val dayUs = 86400000000L
      val ev = Tables.events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      val cut = ev.agg((max(col("us")) - lit(7L * dayUs)).as("cut"))
      val pre = ev.crossJoin(broadcast(cut)).filter(col("us") <= col("cut"))
      val feats = pre.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        max(col("us")).as("last_us"),
        sum(when(col("us") >= col("cut") - lit(14L * dayUs), 1L).otherwise(0L))
          .as("freq_14d"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).otherwise(0L))
          .as("monetary_c"),
        max(col("cut")).as("cut"))
      val label = ev.crossJoin(broadcast(cut)).filter(col("us") > col("cut"))
        .select("user_id").distinct().withColumn("active_after", lit(true))
      feats.join(label, Seq("user_id"), "left")
        .select(col("user_id"),
          expr("(cut - last_us) DIV 86400000000").as("recency_days"),
          col("n_events"), col("freq_14d"), col("monetary_c"),
          coalesce(col("active_after"), lit(false)).as("label_active"))
        .orderBy("user_id")
    }),

    // ATTRIBUTION-WINDOW sweep — the knob q241 fixes at 7 days, priced
    // across {1, 3, 7, 14}: what share of purchases has ANY preceding
    // touch within W days. ONE candidate pass at the widest window
    // (the q233/q189 one-pass-prices-the-curve discipline): per
    // purchase, the minimum touch gap from a (user, 14-day-bucket)
    // equi-join with a 2-bucket explode; each W then reads the same
    // per-purchase min-gap table. A purchase with no 14-day touch
    // appears with gap = ∞-sentinel and counts attributed nowhere.
    // Scale: the q224/q241 bucket discipline bounds candidate fan-out
    // by per-user density in 28 days; per-W counts are one 4-row
    // rollup over a |purchases|-row table.
    "q270_attribution_window_sweep" -> ((s, d) => {
      val dayUs = 86400000000L
      val maxW = 14L * dayUs
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"),
          col("us").as("pus"), expr(s"us DIV ${maxW}L").as("b"))
      val touch = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("us").as("tus"))
        .withColumn("b", explode(array(expr(s"tus DIV ${maxW}L"),
          expr(s"tus DIV ${maxW}L + 1"))))
      val gaps = pur.join(touch, Seq("user_id", "b"), "left")
        .withColumn("gap",
          when(col("tus").isNotNull && col("tus") < col("pus"),
            col("pus") - col("tus")).otherwise(lit(Long.MaxValue)))
        .groupBy("pid").agg(min(col("gap")).as("min_gap"))
      val nPur = gaps.agg(count(lit(1)).as("n_purchases"))
      gaps.crossJoin(broadcast(nPur))
        .select(col("n_purchases"),
          explode(array(Seq(1, 3, 7, 14).map(lit(_)): _*)).as("window_days"),
          col("min_gap"))
        .groupBy("window_days", "n_purchases")
        .agg(sum(when(col("min_gap") <= col("window_days") * dayUs, 1L)
          .otherwise(0L)).as("n_attributed"))
        .select(col("window_days"), col("n_purchases"), col("n_attributed"),
          expr("(n_attributed * 10000) DIV n_purchases").as("attr_bp"))
        .orderBy("window_days")
    }),

    // LONGEST ACTIVITY STREAK — gaps-and-islands on the DATE axis (the
    // engagement metric every product dashboard carries): distinct
    // active days per user, then day − row_number is constant exactly
    // within a consecutive-day run, so one subtraction turns streaks
    // into group keys — no iteration, no self-join. Day arithmetic is
    // epoch-µs DIV 86400e6 (integer, cross-engine exact); one user_id
    // shuffle carries the dedup, the island window, and both rollups.
    "q175_longest_streak" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
      val wd = Window.partitionBy(col("user_id")).orderBy(col("day"))
      days
        .withColumn("isl", col("day") - row_number().over(wd))
        .groupBy("user_id", "isl").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum(col("len")).as("n_active_days"),
          max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    }),

    // TIME-WEIGHTED average (the metrics/finance TWAP): a sampled value
    // is piecewise-constant until the next observation, so the honest
    // mean weights each reading by its holding duration, not its count
    // — the difference between "average of samples" and "average over
    // time" that burst-prone telemetry makes material. Weights are the
    // µs gaps from lead() under the total (ts, event_id) order; the
    // last reading has no duration and drops out; the aggregate is
    // Σ(cents·µs) DIV Σ(µs), all 64-bit integer (max |Σ| ≈ 1e5 cents ×
    // µs-per-decade ≈ 3e19/user — bounded here; a 100 TB deploy would
    // bucket per day first, q151-style, which also caps the products).
    // One user_id shuffle shared by the window and the aggregate.
    "q165_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") * 100).as("cents"))
        .withColumn("dur", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dur").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dur")).as("total_us"),
          sum(col("cents") * col("dur")).as("wsum"))
        .withColumn("twap_cents", expr("wsum DIV total_us"))
        .select("user_id", "n_intervals", "total_us", "twap_cents")
        .orderBy("user_id")
    }),

    // First-order MARKOV transition matrix over the event taxonomy —
    // the sequence-mining dual of q160's pattern regex: per user the
    // (state → next state) pairs come from lead() under the total
    // (ts, event_id) order (map-side after one user_id shuffle), and
    // the global matrix normalizes counts to fixed-point basis points
    // per source state (cnt·10000 DIV row_total — truncating integer,
    // no float probabilities). The matrix is |states|² rows — control-
    // plane-sized regardless of corpus scale, the property that makes
    // transition models cheap to maintain incrementally (q157's merge
    // algebra applies to the counts verbatim).
    "q166_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type").as("src"))
        .withColumn("dst", lead(col("src"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("src").agg(sum(col("n")).as("row_total"))
      pairs.join(broadcast(totals), "src")
        .withColumn("prob_bp", expr("(n * 10000) DIV row_total"))
        .select("src", "dst", "n", "prob_bp")
        .orderBy("src", "dst")
    }),

    // Native session_window — the BUILT-IN session operator next to
    // q82's manual gaps-and-islands formulation (same 30-minute gap
    // semantics: a session absorbs the next event iff it lands strictly
    // inside previous-event + gap, and the window's end extends to
    // last-event + gap). Having both graded proves the declarative
    // operator and the hand-rolled one agree; streaming reuses this
    // exact operator with watermarked state. Bounds are emitted as
    // epoch-µs integers so the ns→µs truncation of the events fixture
    // can't smuggle sub-µs drift into the comparison.
    "q164_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
        .select(
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("user_id"), col("n_events"), col("session_value"))
        .orderBy("user_id", "start_us")
    }),

    // Complex-event-processing by REGEX OVER ENCODED SEQUENCES (the
    // poor man's MATCH_RECOGNIZE, and the scalable one): each user's
    // event history becomes a compact string — one char per event
    // (v/c/p/s/e initials are distinct in this taxonomy), ordered by
    // the total (ts, event_id) key — and pattern counting is then a
    // per-row regexp over that string: here 'vc*p', a view followed by
    // any clicks then a purchase (non-overlapping matches, identical
    // left-to-right greedy semantics in java.util.regex and RE2 for an
    // alternation-free pattern — the q121 RE2 constraint). One shuffle
    // on user_id; sequences are session-sized, so the regex runs
    // map-side over millions of short strings, which is exactly how
    // CEP over 100 TB of clickstream should execute.
    "q160_event_pattern" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), substring(col("event_type"), 1, 1).as("c"))
        .groupBy("user_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("us"), col("event_id"), col("c")))),
          x => x.getField("c")), "").as("seq"))
        .select(col("user_id"), length(col("seq")).cast("long").as("seq_len"),
          size(expr("regexp_extract_all(seq, 'vc*p', 0)")).cast("long")
            .as("n_funnels"))
        .orderBy("user_id")
    }),

    // RANGE window frame (value-based, vs q18's ROWS frame): trailing
    // 1-hour event count per user. RANGE frames are peer-inclusive, so the
    // count is deterministic even under timestamp ties.
    "q76_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_trailing_1h"))
        .orderBy("user_id", "event_id")
    }),

    // Tumbling window aggregate via window() — start column == date_trunc.
    "q80_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(
          col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")
    }),

    // Sliding window (1h every 30m): each event lands in exactly 2 windows.
    "q81_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("n"), col("total_value"))
        .orderBy("window_start")
    }),

    // Sessionization: 30-minute inactivity gap, per user. lag → gap flag →
    // prefix-sum session id → per-session agg. One shuffle on user_id.
    "q82_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val withGap = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      withGap.groupBy("user_id", "session_id")
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .orderBy("user_id", "session_id")
    }),

    // As-of join: latest order (by o_orderdate <= event ts) per purchase
    // event, via union + running last(ignoreNulls) — the shuffle-once
    // formulation that scales to fact-sized both sides.
    "q83_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("k"), col("ts"),
          col("event_id"), lit(null).cast("bigint").as("o_key"))
      // dedupe order side to one row per (cust, date): keep max orderkey,
      // mirroring the oracle's ASOF tiebreak CTE.
      val ordWin = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ord = Tables.orders(s, d)
        .withColumn("rn", row_number().over(ordWin)).filter(col("rn") === 1)
        .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
          lit(null).cast("bigint").as("event_id"), col("o_orderkey").as("o_key"))
      val merged = ev.unionByName(ord)
      // order rows sort before event rows at identical ts (is_event = 0 first)
      val runW = Window.partitionBy(col("k"))
        .orderBy(col("ts"), col("event_id").isNotNull.cast("int"), col("o_key"))
        .rowsBetween(Window.unboundedPreceding, 0)
      merged
        .withColumn("asof_order", last(col("o_key"), ignoreNulls = true).over(runW))
        .filter(col("event_id").isNotNull)
        .select(col("event_id"), col("k").as("user_id"), col("asof_order"))
        .orderBy("event_id")
    }),

    // Range self-join: pairs of events for the same user within 10 minutes,
    // bucketed to an equi-join (bucket b joins b and b+1) — no theta join.
    "q84_range_join" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val withB = e.withColumn("b", expr("us DIV 600000000"))
      val left = withB.select(col("user_id").as("u"), col("event_id").as("id1"),
        col("us").as("s1"), col("b"))
      val right0 = withB.select(col("user_id").as("u"), col("event_id").as("id2"),
        col("us").as("s2"), col("b"))
      val right = right0.unionByName(right0.withColumn("b", col("b") - 1))
      left.join(right, Seq("u", "b"))
        .filter(col("s1") < col("s2") && col("s2") - col("s1") <= 600000000L)
        .select(col("u").as("user_id"), col("id1"), col("id2"))
        .distinct()
        .orderBy("user_id", "id1", "id2")
    }),

    // Gap detection: per user, intervals with no events for > 2 hours.
    "q85_gap_detect" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .filter(col("prev_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 7200L * 1000000L)
        .select(col("user_id"), col("prev_ts").as("gap_start"),
          col("ts").as("gap_end"),
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"))
        .orderBy("user_id", "gap_start")
    }),

    // Per-group top-k through the native bounded-heap aggregate
    // ([[graft.functions.TopKAgg]], a TypedImperativeAggregate) instead
    // of the window sort: each map task keeps a ≤k min-heap per group and
    // only k·groups entries shuffle — the q17/q22 shape without moving
    // the corpus. The oracle is the window formulation, which is exactly
    // the semantic claim: same rows, radically different physical cost.
    // PlanSpec pins the partial/final ObjectHashAggregate pair.
    "q127_topk_aggregate" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(graft.functions.TopKAgg.topk(col("value"), col("event_id"), 5).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("idx", "e")))
        .select(col("event_type"), (col("idx") + 1).cast("int").as("rank"),
          col("e.id").as("event_id"), col("e.score").as("value"))
        .orderBy("event_type", "rank")
    }),

    // Ordered funnel conversion: users who viewed, then clicked strictly
    // after their first view, then purchased strictly after that first
    // qualifying click. Each stage is one per-user min-timestamp
    // aggregate joined back to the raw stream — three shuffles, all on
    // user_id, so the exchanges line up and AQE reuses the partitioning.
    // Per-user state is one timestamp per stage: at 100 TB the stage
    // tables are |users| rows, orders of magnitude below the event
    // stream, and nothing ever sorts the full stream (the window-based
    // funnel formulation would).
    "q130_funnel" -> ((s, d) => {
      val e = Tables.events(s, d).select("user_id", "event_type", "ts")
      val t1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val t2 = e.filter(col("event_type") === "click")
        .join(t1, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val t3 = e.filter(col("event_type") === "purchase")
        .join(t2, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      def stage(df: DataFrame, name: String): DataFrame =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
      stage(t1, "1_view")
        .unionByName(stage(t2, "2_click"))
        .unionByName(stage(t3, "3_purchase"))
        .orderBy("stage")
    }),

    // Weekly cohort retention: users grouped by the ISO week of their
    // first event; each later active week lands in (cohort_week,
    // week_no) and the cell counts distinct active users. The weekly
    // activity set is deduped to (user, week) BEFORE the cohort join, so
    // the join input is |users|×|weeks| not |events|, and the final
    // count is a plain count (the distinct already happened map-side of
    // the join). date_trunc('week') is Monday-based in both engines;
    // cohort and activity weeks are both Mondays, so the day difference
    // is an exact multiple of 7 and integer DIV is safe.
    "q131_retention_cohorts" -> ((s, d) => {
      val e = Tables.events(s, d).select("user_id", "ts")
      val cohorts = e.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
        .select(col("user_id"),
          to_date(date_trunc("week", col("first_ts"))).as("cohort_week"))
      val weekly = e
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      weekly.join(cohorts, "user_id")
        .select(col("cohort_week"),
          expr("datediff(wk, cohort_week) DIV 7").as("week_no"))
        .groupBy("cohort_week", "week_no")
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_week", "week_no")
    }),

    // Type-2 slowly-changing dimension build: collapse each user's
    // event-type stream into state VERSIONS — consecutive equal states
    // become one row with [valid_from, valid_to) validity, valid_to =
    // the next version's start, NULL marks the current version. The
    // q82 gaps-and-islands machinery applied to state-change detection
    // instead of inactivity gaps: lag flags the change, a running sum
    // numbers the versions, lead closes the intervals. One shuffle on
    // user_id; the three windows share the same partitioning.
    "q139_scd2_intervals" -> ((s, d) =>
      scd2Versions(s, d).orderBy("user_id", "version")),

    // The TYPED Dataset escape hatch: KeyValueGroupedDataset.mapGroups
    // over case-class rows — per-user profile computed in plain Scala
    // (sort the user's events, walk once). This is the API for
    // per-group logic Catalyst can't express; here the logic IS
    // window-expressible on purpose, so the oracle proves the typed
    // path computes exactly what the declarative one would. Per-group
    // state is one user's events (bounded); the groupByKey shuffle is
    // the same exchange a window would need. Columnar loss (no codegen
    // inside mapGroups) is the documented price — q140 is the seam's
    // correctness witness, not the recommended default.
    "q140_typed_mapgroups" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_type"), col("event_id"))
        .as[UserEvent]
        .groupByKey(_.user_id)
        .mapGroups { (uid, it) =>
          val evs = it.toArray.sortBy(e => (e.us, e.event_id))
          val maxGap =
            if (evs.length < 2) None
            else Some(evs.iterator.zip(evs.iterator.drop(1))
              .map { case (a, b) => b.us - a.us }.max)
          (uid, evs.length.toLong, maxGap,
            evs.head.event_type, evs.last.event_type)
        }
        .toDF("user_id", "n_events", "max_gap_us", "first_type", "last_type")
        .orderBy("user_id")
    }),

    // INCREMENTAL SCD2 maintenance: apply a delta batch (events on/after
    // a cutoff) to the already-built dimension WITHOUT re-reading the
    // old events — the standing dimension is |versions| rows
    // (compressed), so at 100 TB the apply touches the delta plus a
    // version table orders of magnitude smaller than the event history.
    // The stitch is the observation that ISLANDS COMPOSE: re-running
    // the island machinery over the concatenated version streams
    // (weighted by each version's n_events) merges a boundary pair
    // whose states agree and renumbers everything — no special-cased
    // boundary logic to get wrong. Old and delta never share a
    // valid_from (cutoff separates them), and version ids serve as the
    // within-side tie-break. The oracle is the FULL REBUILD over all
    // events: incremental == rebuild is exactly the graded claim.
    "q147_scd2_incremental" -> ((s, d) => {
      val cutoff = lit("2024-01-15").cast("timestamp")
      val ev = Tables.events(s, d)
        .select("user_id", "event_id", "event_type", "ts")
      val oldDim = scd2VersionsOf(ev.filter(col("ts") < cutoff))
      val deltaDim = scd2VersionsOf(ev.filter(col("ts") >= cutoff))
      def asStream(dim: DataFrame, idOffset: Long): DataFrame =
        dim.select(col("user_id"),
          (col("version") + idOffset).as("event_id"),
          col("state").as("event_type"),
          col("valid_from").as("ts"), col("n_events"))
      scd2VersionsOf(
          asStream(oldDim, 0L).unionByName(asStream(deltaDim, 1000000L)),
          weight = col("n_events"))
        .orderBy("user_id", "version")
    }),

    // Temporal (interval-containment) join — USING the q139 dimension:
    // enrich each purchase event with the state version active at its
    // timestamp (ts ∈ [valid_from, valid_to), NULL valid_to = open).
    // The join is equi on user_id with the containment as a residual —
    // per-user version lists are bounded, so the residual scan inside a
    // hash-join row group is O(versions-per-user), not a theta join
    // (the fact-fact analogue would time-bucket like q84). Every
    // purchase matches exactly ONE version because the versions tile
    // each user's timeline from their first event (spec-pinned on q139
    // and re-checked by the oracle equality here).
    "q146_temporal_join" -> ((s, d) => {
      val versions = scd2Versions(s, d)
        .select(col("user_id").as("vu"), col("version"), col("state"),
          col("valid_from"), col("valid_to"))
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
        .join(versions,
          col("user_id") === col("vu") &&
            col("ts") >= col("valid_from") &&
            (col("valid_to").isNull || col("ts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("version"),
          col("state"), col("valid_from"))
        .orderBy("event_id")
    }),

    // Time-series regularization: project each sampled user's events
    // onto a dense hourly grid between their first and last activity
    // (sequence + explode — no generator UDF), left-join the real
    // hourly aggregate, and FORWARD-FILL gaps with the last observed
    // hourly total (last(_, ignoreNulls) over a ROWS frame). Downstream
    // models need the regular grid; the fill is the standard
    // last-observation-carried-forward. The grid explode is map-side;
    // the join and the fill window share the user_id partitioning. The
    // user sample (id % 7) bounds the output, the same budget idea as
    // the LSH caps.
    "q142_gap_fill" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("user_id") % 7 === 0)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
          col("value"))
      val hourly = e.groupBy("user_id", "h")
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("hour_value"))
      val grid = e.groupBy("user_id")
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val w = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("hour_value"), ignoreNulls = true).over(w).as("filled_value"))
        .orderBy("user_id", "h")
    })
  )

  /** q139's type-2 SCD version table (also consumed by q146/q147): per
    * user, state-change islands as versioned [valid_from, valid_to)
    * intervals, valid_to lead-closed, NULL = current. Three windows,
    * one user_id partitioning. */
  private def scd2Versions(s: SparkSession, d: String): DataFrame =
    scd2VersionsOf(Tables.events(s, d)
      .select("user_id", "event_id", "event_type", "ts"))

  /** Island machinery over an arbitrary (user_id, event_id, event_type,
    * ts) frame — q147 runs it on event SLICES and on version streams
    * (islands compose: re-islanding adjacent versions is exactly the
    * boundary-stitch an incremental SCD2 apply needs). `weight` counts
    * events per row (1 for raw events; n_events when re-islanding
    * pre-compressed versions). */
  private[graft] def scd2VersionsOf(events: DataFrame,
                             weight: Column = lit(1L)): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("wt", weight)
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1)
          .otherwise(0))
    val versions = flagged
      .withColumn("version", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "version")
      .agg(min(col("event_type")).as("state"),
        min(col("ts")).as("valid_from"),
        sum(col("wt")).as("n_events"))
    val wv = Window.partitionBy("user_id").orderBy("version")
    versions
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** The gaps-and-islands twin of native session_window, shared by the
    * batch q164 and the streaming q174 (same operator, same oracle). */
  private[ops] val sessionWindowOracle: String =
    s"""WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                           >= 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, ts, value,
                 SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
          FROM flagged)
        SELECT min(epoch_us(ts)) AS start_us,
               max(epoch_us(ts)) + 1800 * 1000000 AS end_us,
               user_id, count(*) AS n_events,
               ${oSum("value")} AS session_value
        FROM sessions GROUP BY user_id, sid
        ORDER BY user_id, start_us"""

  def oracles: Map[String, String] = Map(
    "q224_nearest_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            epoch_us(ts) AS us FROM events),
          err AS (SELECT event_id AS eid, user_id, us AS eus
                  FROM ev WHERE event_type = 'error'),
          pur AS (SELECT event_id AS pid, user_id, us AS pus
                  FROM ev WHERE event_type = 'purchase'),
          purb AS (SELECT pid, user_id, pus,
                          unnest([pus // 21600000000 - 1, pus // 21600000000,
                                  pus // 21600000000 + 1]) AS b
                   FROM pur),
          cand AS (SELECT eid, pid, pus - eus AS delta
                   FROM (SELECT eid, user_id, eus,
                                eus // 21600000000 AS b FROM err) e
                   JOIN purb USING (user_id, b)
                   WHERE abs(pus - eus) <= 21600000000),
          best AS (SELECT eid, pid, delta FROM (
                     SELECT cand.*, row_number() OVER (
                       PARTITION BY eid
                       ORDER BY abs(delta), delta, pid) AS rn
                     FROM cand) WHERE rn = 1)
          SELECT err.eid AS error_id,
                 coalesce(pid, -1) AS nearest_purchase_id,
                 coalesce(delta, 0) AS delta_us,
                 CASE WHEN pid IS NULL THEN 'none'
                      WHEN delta <= 0 THEN 'backward'
                      ELSE 'forward' END AS direction
          FROM err LEFT JOIN best USING (eid)
          ORDER BY error_id""",

    "q241_touch_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            epoch_us(ts) AS us FROM events),
          pur AS (SELECT event_id AS pid, user_id, us AS pus FROM ev
                  WHERE event_type = 'purchase'),
          touch AS (SELECT event_id AS tid, user_id,
                           event_type AS channel, us AS tus FROM ev
                    WHERE event_type IN ('click', 'view')),
          cand AS (SELECT pid, tid, channel, tus
                   FROM pur JOIN touch USING (user_id)
                   WHERE tus < pus AND pus - tus <= 604800000000),
          fst AS (SELECT pid, 'first_touch' AS model, channel FROM (
                    SELECT *, row_number() OVER (PARTITION BY pid
                                                 ORDER BY tus, tid) AS rn
                    FROM cand) WHERE rn = 1),
          lst AS (SELECT pid, 'last_touch' AS model, channel FROM (
                    SELECT *, row_number() OVER (PARTITION BY pid
                                                 ORDER BY tus DESC, tid DESC) AS rn
                    FROM cand) WHERE rn = 1),
          att AS (SELECT * FROM fst UNION ALL SELECT * FROM lst),
          dom AS (SELECT pid, model FROM pur,
                       (VALUES ('first_touch'), ('last_touch')) m(model))
          SELECT dom.model, coalesce(att.channel, 'none') AS channel,
                 count(*) AS n_purchases
          FROM dom LEFT JOIN att ON att.pid = dom.pid AND att.model = dom.model
          GROUP BY 1, 2 ORDER BY dom.model, channel""",

    "q245_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
          fv AS (SELECT user_id, min(us) AS vus FROM ev
                 WHERE event_type = 'view' GROUP BY user_id),
          conv AS (SELECT ev.user_id, min(us) AS pus, min(vus) AS vus
                   FROM ev JOIN fv USING (user_id)
                   WHERE event_type = 'purchase' AND us > vus
                   GROUP BY ev.user_id),
          h AS (SELECT CAST((vus // 86400000000) % 7 AS VARCHAR) AS start_weekday,
                       (pus - vus) // 60000000 AS cents,
                       count(*) AS c
                FROM conv GROUP BY 1, 2),
          n AS (SELECT start_weekday, CAST(sum(c) AS BIGINT) AS n
                FROM h GROUP BY 1),
          cum AS (SELECT h.start_weekday, cents,
                         CAST(sum(c) OVER (PARTITION BY h.start_weekday
                                           ORDER BY cents) AS BIGINT) AS cum,
                         n
                  FROM h JOIN n USING (start_weekday))
          SELECT start_weekday,
                 min(CASE WHEN cum * 100 >= n * 50 THEN cents END) AS p50_min,
                 min(CASE WHEN cum * 100 >= n * 90 THEN cents END) AS p90_min,
                 min(CASE WHEN cum * 100 >= n * 99 THEN cents END) AS p99_min,
                 max(n) AS n_users
          FROM cum GROUP BY start_weekday ORDER BY start_weekday""",

    "q266_cohort_ltv" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, value
                     FROM events),
          cohort AS (SELECT user_id,
                            CAST(min(us) // 604800000000 AS BIGINT) AS cw
                     FROM ev GROUP BY user_id),
          sizes AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_users
                    FROM cohort GROUP BY cw),
          rev AS (SELECT c.cw, (e.us // 604800000000) - c.cw AS off,
                         CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
                              AS BIGINT) AS week_cents
                  FROM ev e JOIN cohort c USING (user_id)
                  WHERE e.event_type = 'purchase'
                  GROUP BY 1, 2),
          cum AS (SELECT cw, off, week_cents,
                         CAST(sum(week_cents) OVER (PARTITION BY cw
                                                    ORDER BY off) AS BIGINT)
                           AS cum_cents
                  FROM rev)
          SELECT cw AS cohort_week, off AS week_offset, n_users,
                 week_cents, cum_cents,
                 cum_cents // n_users AS ltv_per_user_c
          FROM cum JOIN sizes USING (cw)
          ORDER BY cohort_week, week_offset""",

    "q268_pit_features" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type, value
                     FROM events),
          cut AS (SELECT max(us) - 604800000000 AS cut FROM ev),
          pre AS (SELECT ev.*, cut FROM ev CROSS JOIN cut
                  WHERE us <= cut),
          feats AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                           max(us) AS last_us,
                           CAST(sum(CASE WHEN us >= cut - 1209600000000
                                         THEN 1 ELSE 0 END) AS BIGINT)
                             AS freq_14d,
                           CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS monetary_c,
                           max(cut) AS cut
                    FROM pre GROUP BY user_id),
          lab AS (SELECT DISTINCT user_id, TRUE AS active_after
                  FROM ev CROSS JOIN cut WHERE us > cut)
          SELECT f.user_id,
                 (f.cut - f.last_us) // 86400000000 AS recency_days,
                 f.n_events, f.freq_14d, f.monetary_c,
                 coalesce(l.active_after, FALSE) AS label_active
          FROM feats f LEFT JOIN lab l USING (user_id)
          ORDER BY f.user_id""",

    "q270_attribution_window_sweep" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            epoch_us(ts) AS us FROM events),
          pur AS (SELECT event_id AS pid, user_id, us AS pus FROM ev
                  WHERE event_type = 'purchase'),
          touch AS (SELECT user_id, us AS tus FROM ev
                    WHERE event_type IN ('click', 'view')),
          gaps AS (SELECT p.pid,
                          CAST(coalesce(min(CASE WHEN t.tus < p.pus
                                AND p.pus - t.tus <= 2419200000000
                                THEN p.pus - t.tus END),
                                9223372036854775807) AS BIGINT) AS min_gap
                   FROM pur p LEFT JOIN touch t USING (user_id)
                   GROUP BY p.pid),
          np AS (SELECT CAST(count(*) AS BIGINT) AS n_purchases FROM gaps),
          sweep AS (SELECT w.window_days, np.n_purchases,
                           CAST(sum(CASE WHEN g.min_gap
                                              <= w.window_days * 86400000000
                                         THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_attributed
                    FROM gaps g
                    CROSS JOIN (VALUES (1), (3), (7), (14)) w(window_days)
                    CROSS JOIN np
                    GROUP BY 1, 2)
          SELECT CAST(window_days AS INTEGER) AS window_days, n_purchases,
                 n_attributed,
                 (n_attributed * 10000) // n_purchases AS attr_bp
          FROM sweep ORDER BY window_days""",

    "q262_wilson_bound" ->
      """WITH u AS (SELECT user_id % 20 AS arm, user_id,
                           max(CASE WHEN event_type = 'purchase'
                                     AND value >= 99
                                    THEN 1 ELSE 0 END) AS purchased
                    FROM events GROUP BY 1, 2),
          st AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(purchased) AS BIGINT) AS x
                 FROM u GROUP BY arm),
          wl AS (SELECT arm, n, x, (x * 10000) // n AS rate_bp,
                        (CAST(x AS DOUBLE) + 2.0
                         - 2.0 * sqrt(CAST(x AS DOUBLE) * CAST(n - x AS DOUBLE)
                                      / CAST(n AS DOUBLE) + 1.0))
                        / CAST(n + 4 AS DOUBLE) AS wilson_lb
                 FROM st)
          SELECT row_number() OVER (ORDER BY wilson_lb DESC, arm) AS lb_rank,
                 arm, n, x, rate_bp, wilson_lb
          FROM wl ORDER BY lb_rank""",

    "q263_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // 86400000000 AS day
                     FROM events),
          dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                  FROM ud GROUP BY day),
          contrib AS (SELECT DISTINCT user_id, wday FROM (
                        SELECT user_id,
                               unnest(generate_series(day, day + 6)) AS wday
                        FROM ud)),
          wau AS (SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau
                  FROM contrib GROUP BY wday),
          bounds AS (SELECT min(day) AS d0, max(day) AS dmax FROM ud)
          SELECT day, dau, wau, (dau * 10000) // wau AS stickiness_bp
          FROM dau JOIN wau USING (day) CROSS JOIN bounds
          WHERE day >= d0 + 6 AND day <= dmax
          ORDER BY day""",

    "q175_longest_streak" ->
      """WITH days AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day
                       FROM events),
          isl AS (SELECT user_id, day,
                         day - row_number() OVER (PARTITION BY user_id
                                                  ORDER BY day) AS isl
                  FROM days),
          runs AS (SELECT user_id, isl, count(*) AS len
                   FROM isl GROUP BY user_id, isl)
          SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
                 CAST(max(len) AS BIGINT) AS longest_streak,
                 count(*) AS n_streaks
          FROM runs GROUP BY user_id ORDER BY user_id""",

    "q165_time_weighted_avg" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                            CAST(floor(value * 100) AS BIGINT) AS cents
                     FROM events),
          gaps AS (SELECT user_id, cents,
                          lead(us) OVER (PARTITION BY user_id
                                         ORDER BY us, event_id) - us AS dur
                   FROM ev)
          SELECT user_id, count(*) AS n_intervals,
                 CAST(sum(dur) AS BIGINT) AS total_us,
                 CAST(sum(cents * dur) // sum(dur) AS BIGINT) AS twap_cents
          FROM gaps WHERE dur IS NOT NULL
          GROUP BY user_id ORDER BY user_id""",

    "q166_markov_transitions" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                            event_type AS src
                     FROM events),
          pairs AS (SELECT src,
                           lead(src) OVER (PARTITION BY user_id
                                           ORDER BY us, event_id) AS dst
                    FROM ev),
          cnt AS (SELECT src, dst, count(*) AS n FROM pairs
                  WHERE dst IS NOT NULL GROUP BY src, dst),
          tot AS (SELECT src, sum(n) AS row_total FROM cnt GROUP BY src)
          SELECT c.src, c.dst, CAST(c.n AS BIGINT) AS n,
                 CAST((c.n * 10000) // t.row_total AS BIGINT) AS prob_bp
          FROM cnt c JOIN tot t ON c.src = t.src
          ORDER BY c.src, c.dst""",

    "q164_session_window" -> sessionWindowOracle,

    "q160_event_pattern" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
                           substr(event_type, 1, 1) AS c
                    FROM events),
          s AS (SELECT user_id,
                       string_agg(c, '' ORDER BY us, event_id) AS seq
                FROM e GROUP BY user_id)
          SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
                 CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT)
                   AS n_funnels
          FROM s ORDER BY user_id""",

    "q151_peak_concurrency" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
          deltas AS (SELECT event_type, us, 1 AS delta FROM ev
                     UNION ALL
                     SELECT event_type, us + 1800 * 1000000, -1 FROM ev),
          d2 AS (SELECT event_type, us, delta,
                        us // 86400000000 AS day FROM deltas),
          carries AS (SELECT event_type, day,
                             COALESCE(sum(sum(delta)) OVER (
                               PARTITION BY event_type ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS carry
                      FROM d2 GROUP BY event_type, day),
          runs AS (SELECT d.event_type, d.us,
                          c.carry + sum(d.delta) OVER (
                            PARTITION BY d.event_type, d.day
                            ORDER BY d.us, d.delta) AS run
                   FROM d2 d JOIN carries c USING (event_type, day)),
          peaks AS (SELECT event_type, max(run) AS peak_n
                    FROM runs GROUP BY event_type)
          SELECT r.event_type, CAST(p.peak_n AS BIGINT) AS peak_n,
                 min(r.us) AS first_peak_us
          FROM runs r
          JOIN peaks p ON r.event_type = p.event_type AND r.run = p.peak_n
          GROUP BY r.event_type, p.peak_n ORDER BY r.event_type""",

    "q127_topk_aggregate" ->
      """SELECT event_type, CAST(rank AS INTEGER) AS rank, event_id, value FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rank
            FROM events)
          WHERE rank <= 5 ORDER BY event_type, rank""",

    "q76_range_frame" ->
      """SELECT user_id, event_id,
          count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING
                               AND CURRENT ROW) AS n_trailing_1h
          FROM events ORDER BY user_id, event_id""",

    "q80_tumbling_window" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
          count(*) AS n, ${oSum("value")} AS total_value
          FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "q81_sliding_window" ->
      s"""WITH assigned AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events)
          SELECT window_start, count(*) AS n, ${oSum("value")} AS total_value
          FROM assigned GROUP BY 1 ORDER BY window_start""",

    "q82_sessionize" ->
      s"""WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          sessions AS (
            SELECT user_id, ts, value,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM flagged)
          SELECT user_id, session_id, min(ts) AS session_start,
                 max(ts) AS session_end, count(*) AS n_events,
                 ${oSum("value")} AS session_value
          FROM sessions GROUP BY user_id, session_id
          ORDER BY user_id, session_id""",

    "q83_asof_join" ->
      """WITH ord AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY o_custkey, o_orderdate)
          SELECT e.event_id, e.user_id, o.o_orderkey AS asof_order
          FROM (SELECT * FROM events WHERE event_type = 'purchase') e
          ASOF LEFT JOIN ord o
            ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
          ORDER BY e.event_id""",

    "q84_range_join" ->
      """SELECT a.user_id, a.event_id AS id1, b.event_id AS id2
          FROM events a JOIN events b
            ON a.user_id = b.user_id
           AND b.ts > a.ts
           AND epoch_us(b.ts) - epoch_us(a.ts) <= 600 * 1000000
          ORDER BY a.user_id, id1, id2""",

    // epoch_us() in the stage comparisons mirrors Spark's ns→µs
    // truncation of events.ts (Tables.events): floor-to-µs is monotone,
    // so µs(min(ns)) = min(µs) and the strict > lands identically.
    "q130_funnel" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
          t1 AS (SELECT user_id, min(ts) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY 1),
          t2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN t1 USING (user_id)
                 WHERE event_type = 'click' AND epoch_us(ts) > epoch_us(t1)
                 GROUP BY 1),
          t3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN t2 USING (user_id)
                 WHERE event_type = 'purchase' AND epoch_us(ts) > epoch_us(t2)
                 GROUP BY 1)
          SELECT '1_view' AS stage, count(*) AS n_users FROM t1
          UNION ALL SELECT '2_click', count(*) FROM t2
          UNION ALL SELECT '3_purchase', count(*) FROM t3
          ORDER BY stage""",

    "q131_retention_cohorts" ->
      """WITH e AS (SELECT user_id, ts FROM events),
          cohorts AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
            FROM e GROUP BY 1),
          weekly AS (
            SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
            FROM e)
          SELECT cohort_week,
                 date_diff('day', cohort_week, wk) // 7 AS week_no,
                 count(*) AS n_active
          FROM weekly JOIN cohorts USING (user_id)
          GROUP BY 1, 2 ORDER BY cohort_week, week_no""",

    // the FULL REBUILD over all events — incremental apply must equal it
    "q147_scd2_incremental" ->
      """WITH flagged AS (
            SELECT user_id, event_id, event_type, ts,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id)),
          versions AS (
            SELECT user_id, version, min(event_type) AS state,
                   min(ts) AS valid_from, count(*) AS n_events
            FROM (SELECT user_id, event_type, ts,
                         CAST(SUM(chg) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS version
                  FROM flagged)
            GROUP BY user_id, version)
          SELECT user_id, version, state, valid_from, n_events,
                 lead(valid_from) OVER wv AS valid_to,
                 (lead(valid_from) OVER wv IS NULL) AS is_current
          FROM versions
          WINDOW wv AS (PARTITION BY user_id ORDER BY version)
          ORDER BY user_id, version""",

    // ordering mirrors Spark's µs view of ts (epoch_us) with event_id
    // as the deterministic tie-break, like q82
    "q139_scd2_intervals" ->
      """WITH flagged AS (
            SELECT user_id, event_id, event_type, ts,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id)),
          versions AS (
            SELECT user_id, version, min(event_type) AS state,
                   min(ts) AS valid_from, count(*) AS n_events
            FROM (SELECT user_id, event_type, ts,
                         CAST(SUM(chg) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS version
                  FROM flagged)
            GROUP BY user_id, version)
          SELECT user_id, version, state, valid_from, n_events,
                 lead(valid_from) OVER wv AS valid_to,
                 (lead(valid_from) OVER wv IS NULL) AS is_current
          FROM versions
          WINDOW wv AS (PARTITION BY user_id ORDER BY version)
          ORDER BY user_id, version""",

    // same CTE chain as q139; containment compared in epoch_us (the
    // Spark side sees µs-truncated ts on both join inputs)
    "q146_temporal_join" ->
      """WITH flagged AS (
            SELECT user_id, event_id, event_type, ts,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id)),
          versions AS (
            SELECT user_id, version, min(event_type) AS state,
                   min(ts) AS valid_from
            FROM (SELECT user_id, event_type, ts,
                         CAST(SUM(chg) OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS version
                  FROM flagged)
            GROUP BY user_id, version),
          closed AS (
            SELECT user_id, version, state, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY version) AS valid_to
            FROM versions)
          SELECT e.event_id, e.user_id, v.version, v.state, v.valid_from
          FROM (SELECT user_id, event_id, ts FROM events
                WHERE event_type = 'purchase') e
          JOIN closed v
            ON v.user_id = e.user_id
           AND epoch_us(e.ts) >= epoch_us(v.valid_from)
           AND (v.valid_to IS NULL OR epoch_us(e.ts) < epoch_us(v.valid_to))
          ORDER BY e.event_id""",

    "q140_typed_mapgroups" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type, event_id
                    FROM events),
          g AS (SELECT user_id, us, event_type,
                       us - lag(us) OVER w AS gap,
                       row_number() OVER w AS rn,
                       count(*) OVER (PARTITION BY user_id) AS n_events
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
          SELECT user_id, CAST(max(n_events) AS BIGINT) AS n_events,
                 max(gap) AS max_gap_us,
                 max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                 max(CASE WHEN rn = n_events THEN event_type END) AS last_type
          FROM g GROUP BY user_id ORDER BY user_id""",

    "q142_gap_fill" ->
      s"""WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, value
                     FROM events WHERE user_id % 7 = 0),
          hourly AS (SELECT user_id, h, count(*) AS n_events,
                            ${oSum("value")} AS hour_value
                     FROM e GROUP BY 1, 2),
          grid AS (SELECT user_id,
                          unnest(generate_series(h0, h1,
                                                 INTERVAL '1 hour')) AS h
                   FROM (SELECT user_id, min(h) AS h0, max(h) AS h1
                         FROM e GROUP BY 1)),
          joined AS (SELECT g.user_id, g.h,
                            coalesce(n_events, 0) AS n_events, hour_value
                     FROM grid g LEFT JOIN hourly
                       ON hourly.user_id = g.user_id AND hourly.h = g.h)
          SELECT user_id, h, CAST(n_events AS BIGINT) AS n_events,
                 last_value(hour_value IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY h
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_value
          FROM joined ORDER BY user_id, h""",

    "q85_gap_detect" ->
      """SELECT user_id, prev_ts AS gap_start, ts AS gap_end,
                 epoch_us(ts) - epoch_us(prev_ts) AS gap_us
          FROM (SELECT user_id, ts, event_id,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events)
          WHERE prev_ts IS NOT NULL AND epoch_us(ts) - epoch_us(prev_ts) > 7200000000
          ORDER BY user_id, gap_start"""
  )
}

/** q140's typed row (stable field order for the Encoder). */
case class UserEvent(user_id: Long, us: Long, event_type: String,
                     event_id: Long)
