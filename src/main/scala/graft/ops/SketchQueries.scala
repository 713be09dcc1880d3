package graft.ops

import graft.Tables
import graft.ext.MinHashAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch aggregates, table profiling, and data-quality audits, split
  * out of [[MiscQueries]] (round-12 maintainability split; query keys
  * and semantics unchanged — CORRECTNESS stays hash-identical).
  *
  * Families here:
  *  - native sketches and their SQL twins: KMV (q169/q156/q261),
  *    bitmap (q226/q162), CMS (q133/q225), MinHash UDAF (q45), HLL/GK
  *    vs exact (q36/q37), bloom prefilter (q67);
  *  - profiling / stats: ANALYZE-style NDV+histogram (q155), column
  *    profile (q167), join-cardinality advisor (q161), FD discovery
  *    (q267), inclusion dependencies (q271);
  *  - audits: DQ constraint sweep (q138), Benford digit audit (q250).
  *
  * The bitmap seams ([[qualifiedAudienceBitmaps]], [[bitmapOverlapMatrix]],
  * [[bitmapOverlapOracleSql]]) stay private[ops]: the streaming twin
  * q227 (ManifestFsQueries) rides the SAME matrix and oracle.
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // The NATIVE KMV aggregate ([[graft.functions.KMVAgg]], SQL
    // `graft_kmv`) doing q156's job without q156's plan: the RAW
    // (type, user) stream feeds the aggregate directly — no distinct()
    // pre-shuffle, no ranking window — because duplicate hashes
    // collapse inside each map task's ≤k buffer and partial sketches
    // merge by set-union-truncate through ObjectHashAggregate's
    // partial/final machinery (PlanSpec pins the shape: partial+final
    // ObjectHashAggregate, no Window, no pre-join distinct exchange).
    // The ORACLE IS the declarative window formulation — the two must
    // be indistinguishable, which is the same native-vs-declarative
    // contract q127/q143 pin for the top-k heap.
    // Native EXACT audience overlap — [[graft.functions.BitmapAgg]]
    // (the third TypedImperativeAggregate) builds one fixed-domain user
    // bitmap per event type with map-side OR partials (duplicates
    // collapse in the buffer; only domain/64 longs per group cross the
    // wire — constant in row count, unlike q162's declarative route
    // which must distinct() the membership stream first). Pairwise
    // intersections then run on the bitmap WORDS with codegen'd
    // higher-order functions (zip_with + bit_count) — set algebra
    // without ever re-scanning events. Exact counts, exact Jaccard bp;
    // the oracle recomputes both from the raw distinct memberships.
    // Membership is VALUE-QUALIFIED (an event worth >= 190) — on this
    // fixture every user touches every type, so the unqualified
    // audiences would be wall-to-wall 10000 bp; the high-value slice
    // gives each audience ~half the users and the overlap matrix real
    // structure to grade.
    "q226_bitmap_aggregate" -> ((s, d) =>
      bitmapOverlapMatrix(qualifiedAudienceBitmaps(Tables.events(s, d)))),

    "q169_kmv_aggregate" -> ((s, d) => {
      val hashed = Tables.events(s, d)
        .select(col("event_type"),
          md5(col("user_id").cast("string")).as("m"))
        .withColumn("h", expr(md5Bits32("m")))
      hashed.groupBy("event_type")
        .agg(graft.functions.KMVAgg.kmv(col("h"), 64).as("sk"))
        .select(col("event_type"), col("sk.cnt").as("cnt"),
          col("sk.kth").as("kth"), col("sk.est").as("est_distinct"))
        .orderBy("event_type")
    }),

    // Categorical COLUMN PROFILING — the data-profiling sweep every
    // ingestion pipeline runs before schema decisions: per column its
    // row count, exact NDV, dominant value with its share, and Gini
    // impurity 1 − Σp² as a concentration measure — in fixed-point
    // basis points with a single truncating DIV per metric
    // ((Σcnt²)·10⁴ DIV n², not a per-value division, so truncation
    // error doesn't accumulate; n²·10⁴ needs BIGINT headroom, fine to
    // ~10⁸ rows — beyond that, profile per-partition partials and
    // merge counts first, q157-style). The dominant value uses a
    // row_number under the total (cnt desc, value desc) order — an
    // explicit tie-break where arg_max would be nondeterministic.
    // Each profile is one hash aggregate over the column + a ranking
    // over its value domain; three columns union into one report.
    "q167_column_profile" -> ((s, d) => {
      def profile(tbl: String, cname: String, df: DataFrame): DataFrame = {
        val counts = df.select(col(cname).cast("string").as("v"))
          .groupBy("v").agg(count(lit(1)).as("cnt"))
        val wr = Window.orderBy(col("cnt").desc, col("v").desc)
        counts
          .withColumn("rn", row_number().over(wr))
          .agg(sum(col("cnt")).as("n"), count(lit(1)).as("ndv"),
            max(when(col("rn") === 1, col("v"))).as("top_value"),
            max(when(col("rn") === 1, col("cnt"))).as("top_cnt"),
            sum(col("cnt") * col("cnt")).as("ss"))
          .select(lit(tbl).as("tbl"), lit(cname).as("col_name"),
            col("n"), col("ndv"), col("top_value"),
            expr("(top_cnt * 10000) DIV n").as("top_share_bp"),
            expr("10000 - (ss * 10000) DIV (n * n)").as("gini_bp"))
      }
      profile("documents", "lang", Tables.documents(s, d))
        .unionByName(profile("documents", "source", Tables.documents(s, d)))
        .unionByName(profile("events", "event_type", Tables.events(s, d)))
        .orderBy("tbl", "col_name")
    }),

    // Cost-based-optimizer JOIN CARDINALITY ESTIMATION, shown against
    // ground truth: for each candidate equi-join the standard
    // containment formula est = |L|·|R| DIV max(ndv_L, ndv_R) — the
    // exact formula Catalyst's CBO (and every System-R descendant)
    // uses — next to the join's ACTUAL row count. The estimates run on
    // control-plane-sized stats (q155's ANALYZE outputs: a count and an
    // NDV per side), so join ORDER decisions never touch data; the
    // actuals are the audit. Emitting both makes the estimator's bias
    // measurable — on FK joins (orders⋈customer) containment is exact,
    // on skewed keys it under-counts, which is precisely the lesson a
    // CBO's plans inherit at 100 TB.
    "q161_join_cardinality" -> ((s, d) => {
      def edge(name: String, l: DataFrame, r: DataFrame,
               lk: String, rk: String): DataFrame = {
        val ls = l.agg(count(lit(1)).as("n_left"),
          countDistinct(col(lk)).as("ndv_left"))
        val rs = r.agg(count(lit(1)).as("n_right"),
          countDistinct(col(rk)).as("ndv_right"))
        val actual = l.join(r, l(lk) === r(rk))
          .agg(count(lit(1)).as("actual_rows"))
        ls.crossJoin(rs).crossJoin(actual)
          .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
            col("ndv_left"), col("ndv_right"),
            expr("(n_left * n_right) DIV greatest(ndv_left, ndv_right)")
              .as("est_rows"),
            col("actual_rows"))
      }
      edge("customer_nation", Tables.customer(s, d), Tables.nation(s, d),
          "c_nationkey", "n_nationkey")
        .unionByName(edge("orders_customer", Tables.orders(s, d),
          Tables.customer(s, d), "o_custkey", "c_custkey"))
        .unionByName(edge("lineitem_orders", Tables.lineitem(s, d),
          Tables.orders(s, d), "l_orderkey", "o_orderkey"))
        .orderBy("join_name")
    }),

    // BITMAP-INDEX set algebra — audience overlap the way OLAP engines
    // actually compute it: each audience (customers who placed an order
    // at priority p) becomes a compressed membership bitmap, 63 members
    // per row — (word = key DIV 63, bits = bit_or of 1 << (key % 63);
    // 63 not 64 because DuckDB's BIGINT << rejects bit 63, and keeping
    // the sign bit clear costs one lane of 64) —
    // and pairwise overlap is Σ bit_count(bits_a & bits_b) over an
    // equi-join on word. The bitmap build is one aggregate whose output
    // is |keyspace|/64 rows; the overlap join touches bitmaps, never
    // members — the 64× compression is why bitmap indexes beat
    // distinct-joins for audience intersection at scale. An exact
    // distinct-join overlap rides alongside as the in-row audit (the
    // two MUST agree; the spec pins it, the oracle hashes both).
    "q162_bitmap_overlap" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .select(col("o_orderpriority").as("seg"), col("o_custkey").as("k"))
        .distinct()
      val bm = m
        .withColumn("word", expr("k DIV 63"))
        .withColumn("bit", expr("shiftleft(1L, cast(k % 63 AS int))"))
        .groupBy("seg", "word")
        .agg(expr("bit_or(bit)").as("bits"))
      val a = bm.select(col("seg").as("seg_a"), col("word"), col("bits").as("ba"))
      val b = bm.select(col("seg").as("seg_b"), col("word"), col("bits").as("bb"))
      val bitmapOverlap = a.join(b, Seq("word"))
        .filter(col("seg_a") < col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(sum(expr("cast(bit_count(ba & bb) AS bigint)")).as("overlap_bitmap"))
      val ma = m.select(col("seg").as("seg_a"), col("k"))
      val mb = m.select(col("seg").as("seg_b"), col("k"))
      val exactOverlap = ma.join(mb, Seq("k"))
        .filter(col("seg_a") < col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(count(lit(1)).as("overlap_exact"))
      bitmapOverlap.join(exactOverlap, Seq("seg_a", "seg_b"))
        .orderBy("seg_a", "seg_b")
    }),

    // KMV (k-minimum-values) distinct-count sketch — the third sketch
    // family next to q37's HLL (rows-only) and q133's CMS: KMV is fully
    // DETERMINISTIC (the sketch is literally the k smallest 32-bit
    // md5-slice hashes of the member set), so unlike HLL it hash-matches
    // a DuckDB oracle exactly, and it is MERGEABLE — the union sketch is
    // the k smallest over the per-group sketches' union, demonstrated
    // here by deriving the ALL row from the group sketches alone (never
    // re-touching the raw rows; the classic distributed-distinct-count
    // merge). Estimate = (k−1)·2³² DIV kth-min in integer arithmetic;
    // groups holding fewer than k hashes are exact by definition. Scale:
    // one (type, user) dedup shuffle, then per-group top-k rides a
    // window over k·groups candidates; the raw stream is touched once.
    "q156_kmv_distinct" -> ((s, d) => {
      val k = 64
      val hashed = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("m", md5(col("user_id").cast("string")))
        .withColumn("h", expr(md5Bits32("m")))
        .select("event_type", "h")
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val sk = hashed.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("event_type", "h")
      val perGroup = sk.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), max(col("h")).as("kth"))
      val merged = sk.select(lit("ALL").as("event_type"), col("h")).distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), max(col("h")).as("kth"))
      val exactPer = hashed.groupBy("event_type")
        .agg(count(lit(1)).as("exact"))
      val exactAll = hashed.select("h").distinct()
        .agg(count(lit(1)).as("exact"))
        .select(lit("ALL").as("event_type"), col("exact"))
      perGroup.unionByName(merged)
        .join(exactPer.unionByName(exactAll), "event_type")
        .withColumn("est_distinct", when(col("cnt") < k, col("cnt"))
          .otherwise(expr(s"(${k - 1} * 4294967296) DIV kth")))
        .select("event_type", "exact", "cnt", "kth", "est_distinct")
        .orderBy("event_type")
    }),

    // ANALYZE-style optimizer statistics: exact NDV, min/max, and an
    // 8-bucket EQUI-DEPTH histogram for a column — the stats a
    // cost-based optimizer (and the q109/q135 zone-map planner) feeds
    // on. The histogram is computed at VALUE granularity: per-distinct-
    // value counts first (one hash aggregate over the rows — the only
    // full-data pass), then a prefix sum over the far smaller distinct-
    // value table assigns each value group bucket
    // (cum_before · k) DIV N + 1 — an explicit integer formula rather
    // than ntile, so remainder semantics can't diverge cross-engine,
    // and a heavy value never straddles buckets (compressed-histogram
    // convention). The ordered window runs over distinct values, not
    // rows — at 100 TB that's the difference between sorting the table
    // and sorting its value domain (and the domain window could itself
    // be two-leveled like q151 if the domain were huge).
    "q155_analyze_stats" -> ((s, d) => {
      val byV = Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice") * 100).as("c"))
        .groupBy("c").agg(count(lit(1)).as("cnt"))
      val tot = byV.agg(sum(col("cnt")).as("n_rows_total"),
        count(lit(1)).as("ndv"))
      val w = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      byV
        .withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("bucket", expr("(cum * 8) DIV n_rows_total + 1"))
        .groupBy("bucket", "ndv")
        .agg(min(col("c")).as("lo"), max(col("c")).as("hi"),
          sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_values"))
        .select("bucket", "lo", "hi", "n_rows", "n_values", "ndv")
        .orderBy("bucket")
    }),

    // Exact percentiles — interpolation is bit-identical to quantile_cont.
    "q36_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_extendedprice, 0.37)").as("p37_price"))
        .orderBy("l_returnflag")
    }),

    // Sketch aggregates (HLL++, GK-quantiles): the approx ESTIMATES are
    // engine-specific bytes, so the graded dump keeps only deterministic
    // columns — the exact values plus the within-tolerance booleans (HLL
    // default rsd 5% → 15% = 3σ budget; GK accuracy 1000 → 5% value
    // budget). The oracle recomputes the exact columns and asserts the
    // booleans literally TRUE, making the sketches fully hash-gradeable:
    // sketch drift past tolerance flips a boolean and fails the hash.
    // The raw estimates stay observable via [[approxSketchesFull]],
    // which ExtensionSpec pins row by row.
    "q37_approx_sketches" -> ((s, d) =>
      approxSketchesFull(s, d).select(
        "l_returnflag", "exact_parts", "exact_median",
        "parts_within_tol", "median_within_tol")),

    // Count-min sketch heavy-hitter estimation, built WITHOUT a custom
    // aggregate: the sketch IS a groupBy — every (lane, cell) count is a
    // cell of the 4×4096 grid, so map-side partial aggregation is the
    // sketch merge (cell-wise add, commutative → the estimate is
    // independent of partitioning/order, unlike HLL's engine-specific
    // layout, which is why q37 has no oracle and this does). The four
    // 12-bit lanes are disjoint slices of ONE md5 per key. Probes (a
    // fixed key set) join the control-plane-sized sketch and take the
    // min across lanes; exact counts ride the same filtered scan for
    // the overestimate-bound demo (CMS never underestimates — pinned in
    // ExtensionSpec alongside the estimate's accuracy).
    "q133_cms_heavy_hitters" -> ((s, d) => {
      cmsProbes(s, d).join(cmsSketch(s, d), Seq("lane", "cell"))
        .groupBy("l_partkey", "exact_n")
        .agg(min(col("c")).as("cms_est"))
        .select("l_partkey", "cms_est", "exact_n")
        .orderBy("l_partkey")
    }),

    // CMS WIDTH sweep — the sketch-memory tuning curve q133 needs before
    // deployment: count-min overestimate vs width ∈ {16, 256, 4096},
    // priced from ONE sketch pass (the q189/q207/q213 discipline). The
    // trick: a lane's width-16^k cell is the k-hex-digit PREFIX of its
    // width-4096 cell, so the smaller sketches are pure re-aggregations
    // of the 4096 sketch (cell DIV 16^(3−k)) — the corpus is hashed
    // once, and each width's counters are exact as if built directly.
    // Probes are the same low-key partkeys as q133 (exact counts known);
    // error = est − exact ≥ 0 always (CMS never underestimates), and the
    // curve must fall as width grows. All integer.
    "q225_cms_width_sweep" -> ((s, d) => {
      val widthOfK = "CASE k WHEN 1 THEN 16 WHEN 2 THEN 256 ELSE 4096 END"
      val cellkOfK = "CASE k WHEN 1 THEN cell DIV 256 WHEN 2 THEN cell DIV 16 ELSE cell END"
      val skk = cmsSketch(s, d)
        .select(col("lane"), col("cell"), col("c"),
          explode(array(lit(1), lit(2), lit(3))).as("k"))
        .withColumn("cellk", expr(cellkOfK))
        .groupBy("k", "lane", "cellk").agg(sum(col("c")).as("c"))
      val probes = cmsProbes(s, d)
        .select(col("l_partkey"), col("exact_n"), col("lane"), col("cell"),
          explode(array(lit(1), lit(2), lit(3))).as("k"))
        .withColumn("cellk", expr(cellkOfK))
      probes.join(skk, Seq("k", "lane", "cellk"))
        .groupBy("k", "l_partkey", "exact_n").agg(min(col("c")).as("est"))
        .groupBy("k").agg(count(lit(1)).as("n_probes"),
          sum(col("est") - col("exact_n")).as("total_overest"),
          max(col("est") - col("exact_n")).as("max_overest"),
          sum(col("exact_n")).as("sum_exact"))
        .select(expr(widthOfK).as("width"), col("n_probes"),
          col("total_overest"), col("max_overest"),
          expr("(total_overest * 1000000) DIV sum_exact").as("mean_overest_ppm"))
        .orderBy("width")
    }),

    // Data-quality constraint sweep (the "expectations" op a pipeline
    // runs before promoting a snapshot): referential integrity by
    // anti-join, key uniqueness by count-vs-distinct, domain and
    // null-rate checks by filtered counts — one violation count per
    // declared constraint. Each check is an independent aggregate over
    // its own scan (parquet pruning keeps each to the columns it
    // needs); the dim side of the FK anti-joins broadcasts. All-zero
    // violations on this fixture IS the assertion — the oracle proves
    // the checks compute the same emptiness, and ExtensionSpec proves
    // they fire on planted corruption.
    "q138_dq_checks" -> ((s, d) =>
      dqChecks(Tables.orders(s, d), Tables.customer(s, d),
        Tables.lineitem(s, d))),

    // Custom mergeable UDAF: per-source MinHash signature computed by a
    // typed Aggregator (partial states merge lane-wise — the property that
    // lets it run as a distributed partial+final aggregate).
    "q45_minhash_aggregator" -> ((s, d) => {
      val sig = udaf(new MinHashAgg(), org.apache.spark.sql.Encoders.STRING)
      val docs = Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .select(col("source"),
          explode(sequence(lit(1), size(col("words")) - 2)).as("pos"), col("words"))
        .select(col("source"),
          expr("concat_ws(' ', element_at(words, pos), element_at(words, pos + 1), element_at(words, pos + 2))").as("shingle"))
      docs.groupBy("source").agg(sig(col("shingle")).as("sig"))
        .select(col("source") +:
          (0 until 8).map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
        .orderBy("source")
    }),

    // Bloom pre-filter join: build a Bloom filter over the SMALL filtered
    // dim's keys, prune the fact scan with it BEFORE the shuffle, then
    // exact semi-join (false positives removed). At 100 TB this is the
    // difference between shuffling the full fact table and shuffling the
    // ~matching slice; the broadcast is O(bloom bits), never O(dim rows).
    // (Spark's AQE injects the same shape as a runtime filter when stats
    // allow; this is the explicit, always-on version.)
    "q67_bloom_prefilter" -> ((s, d) => {
      // persist: the dim is scanned twice eagerly right here (count for
      // sizing + filter build) — one parquet read, not two. The cache is
      // released before returning (a leaked cache would sit in executor
      // storage for the JVM lifetime in a long-lived session); the
      // semi-join side below re-reads the small filter-pushed parquet
      // once at execution time instead.
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      urgent.persist()
      // size the filter from the actual dim cardinality: a fixed guess
      // saturates at larger scale factors and the pre-filter stops pruning
      val bf =
        try {
          val expected = math.max(1000L, urgent.count())
          urgent.stat.bloomFilter("o_orderkey", expected, 0.01)
        } finally urgent.unpersist()
      Tables.lineitem(s, d)
        .filter(graft.functions.BloomProbe.mightContain(bf, col("l_orderkey")))
        .join(urgent.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // FUNCTIONAL-DEPENDENCY discovery — the data-profiling step (TANE's
    // check, restricted to a declared candidate set) that tells a
    // modeler which columns are safe join/normalization keys: for each
    // candidate determinant → dependent pair, count determinant groups
    // and groups carrying MORE than one dependent value (violations).
    // The mix is deliberate: true keys (o_orderkey → o_custkey,
    // c_custkey → c_nationkey, n_nationkey → n_regionkey) hold at 0
    // violations, plausible-but-false FDs (an order's supplier, a
    // nation's market segment) fail loudly — a profiler that can only
    // confirm is not a profiler.
    // Scale: each candidate is one (determinant)-keyed aggregate with a
    // partial distinct on the dependent (both stages map-side combine),
    // then a one-row rollup; candidates are independent branches.
    "q267_fd_discovery" -> ((s, d) => {
      def cand(df: DataFrame, det: String, dep: String, tbl: String): DataFrame =
        df.groupBy(col(det)).agg(countDistinct(col(dep)).as("nd"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(s"$tbl.$det -> $tbl.$dep").as("candidate"),
            col("n_groups"), col("n_violating"),
            (col("n_violating") === 0L).as("fd_holds"))
      Seq(
        cand(Tables.orders(s, d), "o_orderkey", "o_custkey", "orders"),
        cand(Tables.orders(s, d), "o_custkey", "o_orderpriority", "orders"),
        cand(Tables.customer(s, d), "c_custkey", "c_nationkey", "customer"),
        cand(Tables.customer(s, d), "c_nationkey", "c_mktsegment", "customer"),
        cand(Tables.lineitem(s, d), "l_orderkey", "l_suppkey", "lineitem"),
        cand(Tables.lineitem(s, d), "l_partkey", "l_suppkey", "lineitem"),
        cand(Tables.nation(s, d), "n_nationkey", "n_regionkey", "nation"))
        .reduce(_ unionByName _).orderBy("candidate")
    }),

    // INCLUSION-DEPENDENCY discovery — the cross-table companion to
    // q267's FDs (together they ARE schema profiling): for each
    // candidate foreign key, how many distinct child values have no
    // parent. Genuine FKs (lineitem→orders, orders→customer,
    // lineitem→supplier/part) hold at 0 orphans, and so does the
    // reversed customer⊆orders on THIS fixture (every customer has
    // ordered — measured, and itself a profiling finding). The
    // must-fail row is the production failure mode instead: checking
    // children against a PARTIAL parent snapshot (orders with status
    // 'F' only — the archived-parent bug every retention policy
    // eventually causes) strands most l_orderkeys as orphans.
    // Scale: each candidate reduces the child side to DISTINCT keys
    // before a left-anti join against the parent's distinct keys — two
    // map-side-combined distincts and one key-sized join per candidate.
    "q271_inclusion_dependency" -> ((s, d) => {
      def cand(child: DataFrame, ck: String, parent: DataFrame, pk: String,
               name: String): DataFrame = {
        val c = child.select(col(ck).as("k")).distinct()
        val p = parent.select(col(pk).as("k")).distinct()
        val orphans = c.join(p, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        c.agg(count(lit(1)).as("n_child_keys"))
          .crossJoin(orphans)
          .select(lit(name).as("candidate"), col("n_child_keys"),
            col("n_orphans"), (col("n_orphans") === 0L).as("ind_holds"))
      }
      Seq(
        cand(Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey", "lineitem.l_orderkey <= orders.o_orderkey"),
        cand(Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey", "orders.o_custkey <= customer.c_custkey"),
        cand(Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey", "lineitem.l_suppkey <= supplier.s_suppkey"),
        cand(Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey", "lineitem.l_partkey <= part.p_partkey"),
        cand(Tables.customer(s, d), "c_custkey",
          Tables.orders(s, d), "o_custkey", "customer.c_custkey <= orders.o_custkey"),
        cand(Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d).filter(col("o_orderstatus") === "F"), "o_orderkey",
          "lineitem.l_orderkey <= orders[status=F].o_orderkey"))
        .reduce(_ unionByName _).orderBy("candidate")
    }),

    // KMV SET-OPERATION estimates — the sketch algebra a federation
    // layer runs when only sketches travel: per event_type audience,
    // a K=64 minimum-values sketch over the md5-derived 32-bit user
    // hash; pairwise UNION by merging sketches (smallest K of the
    // merged distinct values — exactly the sketch the union's stream
    // would have produced) and INTERSECTION by inclusion–exclusion.
    // Every estimate is integer ((K−1)·2³² DIV h_K; a sketch holding
    // fewer than K values IS exact and says so), and the report prices
    // the estimator against the exact intersection in bp error —
    // sketches you can't error-audit are sketches you can't ship.
    // Scale: the only corpus passes are the (type, user) distinct and
    // a types-per-user pair expansion (≤ |types|² per user, map-side
    // combined); sketches are K-length arrays on a |types|-row control
    // plane, and the pair matrix is |types|² rows.
    "q261_kmv_set_ops" -> ((s, d) => {
      val k = 64
      val maxH = 1L << 32
      // membership unit = USER-DAY, not user: the fixture's users touch
      // every event type eventually, so user-level audiences are all
      // identical (a dead eval); within one day the type sets genuinely
      // partially overlap, which is what sketch set-ops must price
      val uh = Tables.events(s, d)
        .select(col("event_type"), col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
        .withColumn("m",
          md5(concat(col("user_id").cast("string"), lit(":"),
            col("day").cast("string"))))
        .withColumn("h", expr(md5Bits32("m")))
      def estExpr(ar: String, n: String): String =
        s"CASE WHEN $n < $k THEN $n ELSE (${k - 1}L * ${maxH}L) DIV element_at($ar, $k) END"
      val sk = uh.groupBy("event_type")
        .agg(expr(s"slice(array_sort(collect_set(h)), 1, $k)").as("ar"),
          count(lit(1)).as("n_exact"))
      val pairs = sk.select(col("event_type").as("type_a"),
          col("ar").as("ar_a"), col("n_exact").as("exact_a"))
        .crossJoin(broadcast(sk.select(col("event_type").as("type_b"),
          col("ar").as("ar_b"), col("n_exact").as("exact_b"))))
        .filter(col("type_a") < col("type_b"))
        .withColumn("ar_u",
          expr(s"slice(array_sort(array_union(ar_a, ar_b)), 1, $k)"))
        .withColumn("n_u", size(col("ar_u")).cast("long"))
        .withColumn("est_a", expr(estExpr("ar_a", "size(ar_a)")))
        .withColumn("est_b", expr(estExpr("ar_b", "size(ar_b)")))
        .withColumn("est_union", expr(estExpr("ar_u", "n_u")))
        .withColumn("est_inter",
          expr("greatest(CAST(0 AS BIGINT), est_a + est_b - est_union)"))
      val inter = uh.select(col("event_type").as("type_a"), col("user_id"), col("day"))
        .join(uh.select(col("event_type").as("type_b"), col("user_id"), col("day")),
          Seq("user_id", "day"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("exact_inter"))
      pairs.join(inter, Seq("type_a", "type_b"), "left")
        .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
        .select(col("type_a"), col("type_b"), col("exact_a"), col("exact_b"),
          col("exact_inter"), col("est_inter"),
          expr("(abs(est_inter - exact_inter) * 10000) DIV greatest(exact_inter, 1)")
            .as("err_bp"))
        .orderBy("type_a", "type_b")
    }),

    // BENFORD FIRST-DIGIT audit — the fabricated-data detector auditors
    // run on financial columns (q138 checks constraints; this checks the
    // DISTRIBUTION): organically-grown multiplicative quantities follow
    // log10(1+1/d) first-digit mass, and a synthesized or truncated feed
    // snaps away from it. Per column (l_extendedprice, o_totalprice),
    // amounts quantize to cents by the q228 floor trick (floor is
    // rounding-mode-free; both engines floor the SAME IEEE product), the
    // leading digit is the first character of the integer's decimal
    // string (no float log10 near-power-of-ten edge), and the report
    // carries observed count, observed bp (truncating), the Benford
    // expectation in bp as a shared CASE literal, and |obs − exp|.
    // Scale: two map-side digit extractions, each reduced by a 9-row
    // aggregate; the totals are one-row broadcasts. All integer.
    "q250_benford_audit" -> ((s, d) => {
      val expBp = """CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
                     WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792
                     WHEN 6 THEN 669 WHEN 7 THEN 580 WHEN 8 THEN 512
                     ELSE 458 END"""
      def branch(df: DataFrame, colName: String): DataFrame = {
        val digits = df
          .select(expr(s"CAST(substring(CAST(CAST(floor($colName * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT)").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val tot = digits.agg(sum(col("n")).as("nn"))
        digits.crossJoin(broadcast(tot))
          .select(lit(colName).as("col_name"), col("digit"), col("n"),
            expr("(n * 10000) DIV nn").as("obs_bp"),
            expr(expBp).cast("long").as("exp_bp"))
          .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
      }
      branch(Tables.lineitem(s, d), "l_extendedprice")
        .unionByName(branch(Tables.orders(s, d), "o_totalprice"))
        .orderBy("col_name", "digit")
    })
  )

  /** q138's constraint sweep over caller-supplied tables, so the spec can
    * plant corruption and watch each check fire (the all-zero graded
    * result alone can't distinguish "checks pass" from "checks dead"). */
  private[graft] def dqChecks(orders: DataFrame, customer: DataFrame,
                              lineitem: DataFrame): DataFrame = {
    def counted(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    counted("1_orders_fk_customer",
        orders.join(customer,
          orders("o_custkey") === customer("c_custkey"), "left_anti"))
      .unionByName(counted("2_lineitem_fk_orders",
        lineitem.join(orders,
          lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")))
      .unionByName(orders
        .agg((count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("n_violations"))
        .select(lit("3_orderkey_unique").as("check_name"),
          col("n_violations")))
      .unionByName(counted("4_quantity_domain",
        lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50)))
      .unionByName(counted("5_orderdate_not_null",
        orders.filter(col("o_orderdate").isNull)))
      .orderBy("check_name")
  }

  /** q37's full sketch-vs-exact row set, INCLUDING the engine-specific
    * approx estimates (HLL++ distinct count, GK median). The graded
    * q37 dump projects only the deterministic columns of this frame so
    * the DuckDB oracle can hash-match it; ExtensionSpec reads this full
    * version to pin the raw estimates against their tolerance budgets. */
  def approxSketchesFull(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"))
      .withColumn("parts_within_tol",
        abs(col("approx_parts") - col("exact_parts")) <= col("exact_parts") * lit(0.15) + lit(1))
      .withColumn("median_within_tol",
        abs(col("approx_median") - col("exact_median")) <= abs(col("exact_median")) * lit(0.05) + lit(1e-6))
      .orderBy("l_returnflag")

  /** DuckDB twin of q133's md5-slice cell: 12-bit value of the 3 hex
    * digits at `off` in column `m` (strpos ↔ Spark instr, 1-based). */
  private def oHex3(off: Int): String =
    (0 until 3).map(i =>
      s"(strpos('0123456789abcdef', substr(m, ${off + i}, 1)) - 1) * ${math.pow(16, 2 - i).toInt}")
      .mkString("(", " + ", ")")

  /** One column's DuckDB profile — the q167 oracle template. */
  private def oProfile(tbl: String, c: String): String =
    s"""SELECT '$tbl' AS tbl, '$c' AS col_name,
          CAST(sum(cnt) AS BIGINT) AS n, count(*) AS ndv,
          max(CASE WHEN rn = 1 THEN v END) AS top_value,
          CAST((max(CASE WHEN rn = 1 THEN cnt END) * 10000) // sum(cnt)
               AS BIGINT) AS top_share_bp,
          CAST(10000 - (sum(cnt * cnt) * 10000) // (sum(cnt) * sum(cnt))
               AS BIGINT) AS gini_bp
        FROM (SELECT v, cnt,
                     row_number() OVER (ORDER BY cnt DESC, v DESC) AS rn
              FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS cnt
                    FROM $tbl GROUP BY v))"""



  /** q133/q225 shared CMS machinery — ONE definition of the lane/cell
    * derivation (3 hex digits per lane of the key md5, width 4096) on
    * both engine sides, so the width-sweep's prefix-reaggregation trick
    * can never drift from the heavy-hitter sketch it prices. */
  private def cmsHex3(off: Int): String =
    (0 until 3).map(i =>
      s"(instr('0123456789abcdef', substring(m, ${off + i}, 1)) - 1) * ${math.pow(16, 2 - i).toInt}")
      .mkString("(", " + ", ")")
  private def cmsCellsOf: String =
    (1 to 4).map(r => cmsHex3(1 + 3 * (r - 1))).mkString(", ")

  /** The (lane, cell) → count base sketch over lineitem part keys. */
  /** r17: the 4×4096 sketch grid and the probe set are SHARED
    * artifacts — q133 (the estimate) and q225 (the width sweep) each
    * re-hashed the full fact table to rebuild them per pass. A CMS is
    * precisely the structure a deployment maintains ONCE and serves
    * many probes from, so both are pinned per (session, dataset): the
    * sketch is ≤16k (lane, cell, c) rows, the probe set ≤32·4 rows.
    * Both derivations are knob-free. Neither query is scale-probed
    * (the build is a fact-table aggregate with map-side combine — the
    * q10 shape whose linearity the suite already measures). */
  private val cmsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (graft.ext.GraphOps.Pinned, graft.ext.GraphOps.Pinned)]()

  /** Free the pinned CMS artifacts and forget them. */
  def clearCmsCache(): Unit = {
    cmsCache.values().forEach { case (a, b) => a.free(); b.free() }
    cmsCache.clear()
  }

  private def cmsArtifacts(s: SparkSession, d: String)
      : (graft.ext.GraphOps.Pinned, graft.ext.GraphOps.Pinned) = {
    graft.ext.GraphOps.sweepStopped(cmsCache)(_._1)
    cmsCache.computeIfAbsent((s, d), _ => (
      graft.ext.GraphOps.pin(Tables.lineitem(s, d)
        .select(md5(col("l_partkey").cast("string")).as("m"))
        .select(posexplode(expr(s"array($cmsCellsOf)")).as(Seq("lane", "cell")))
        .groupBy("lane", "cell").agg(count(lit(1)).as("c"))),
      graft.ext.GraphOps.pin(Tables.lineitem(s, d)
        .filter(col("l_partkey") <= 32)
        .groupBy("l_partkey").agg(count(lit(1)).as("exact_n"))
        .withColumn("m", md5(col("l_partkey").cast("string")))
        .select(col("l_partkey"), col("exact_n"),
          posexplode(expr(s"array($cmsCellsOf)")).as(Seq("lane", "cell"))))))
  }

  private def cmsSketch(s: SparkSession, d: String): DataFrame =
    cmsArtifacts(s, d)._1.df

  /** The low-key probe set with exact counts and per-lane cells. */
  private def cmsProbes(s: SparkSession, d: String): DataFrame =
    cmsArtifacts(s, d)._2.df

  /** DuckDB twins of [[cmsSketch]]/[[cmsProbes]]' lane expansion. */
  private def oCmsLaneCell: String = (1 to 4).map(r =>
    s"SELECT m, ${r - 1} AS lane, ${oHex3(1 + 3 * (r - 1))} AS cell FROM m")
    .mkString("\n UNION ALL ")
  private def oCmsProbeCell: String = (1 to 4).map(r =>
    s"SELECT l_partkey, exact_n, ${r - 1} AS lane, ${oHex3(1 + 3 * (r - 1))} AS cell FROM probes")
    .mkString("\n UNION ALL ")

  /** q226/q227 shared: value-qualified (an event worth >= 190) per-type
    * audience bitmaps over the 65536-user domain — ONE definition so the
    * batch query and its streaming twin can never diverge (the
    * ewmaOracleSql discipline). Works on any events-shaped frame,
    * batch or streaming. */
  private[ops] def qualifiedAudienceBitmaps(events: DataFrame): DataFrame =
    events.filter(col("value") >= 190.0)
      .groupBy("event_type")
      .agg(graft.functions.BitmapAgg.bitmap(col("user_id"), 65536).as("b"))
      .select(col("event_type"), col("b.cnt").as("n_users"), col("b.bits").as("bits"))

  /** q226/q227 shared: (event_type, n_users, bits) → the pairwise exact
    * overlap matrix via codegen'd word algebra. */
  private[ops] def bitmapOverlapMatrix(bm: DataFrame): DataFrame = {
    val a = bm.select(col("event_type").as("t1"),
      col("n_users").as("n_users_1"), col("bits").as("b1"))
    val b = bm.select(col("event_type").as("t2"),
      col("n_users").as("n_users_2"), col("bits").as("b2"))
    // [[graft.Mutations]]: `|` where `&` belongs — the one-character
    // bitwise typo the overlap hash must flag
    val bothOp =
      if (graft.Mutations.on("q226_or_instead_of_and")) "|" else "&"
    a.join(b, col("t1") < col("t2"))
      .withColumn("n_both", expr(
        s"""aggregate(zip_with(b1, b2, (x, y) -> CAST(bit_count(x $bothOp y) AS BIGINT)),
             CAST(0 AS BIGINT), (acc, v) -> acc + v)"""))
      .select(col("t1"), col("t2"), col("n_users_1"), col("n_users_2"),
        col("n_both"),
        expr("(n_both * 10000) DIV (n_users_1 + n_users_2 - n_both)")
          .as("jaccard_bp"))
      .orderBy("t1", "t2")
  }

  /** q226/q227 shared oracle (identical semantics: the streamed bitmaps
    * must equal the batch ones). */
  private[ops] val bitmapOverlapOracleSql: String =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events
                     WHERE value >= 190.0),
        cnt AS (SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1),
        dom AS (SELECT ca.event_type AS t1, cb.event_type AS t2,
                       ca.n_users AS n_users_1, cb.n_users AS n_users_2
                FROM cnt ca JOIN cnt cb
                  ON ca.event_type < cb.event_type),
        inter AS (SELECT a.event_type AS t1, b.event_type AS t2,
                         count(*) AS n_both
                  FROM tu a JOIN tu b
                    ON a.user_id = b.user_id AND a.event_type < b.event_type
                  GROUP BY 1, 2)
        SELECT dom.t1, dom.t2, n_users_1, n_users_2,
               CAST(coalesce(n_both, 0) AS BIGINT) AS n_both,
               (coalesce(n_both, 0) * 10000)
                 // (n_users_1 + n_users_2 - coalesce(n_both, 0))
                 AS jaccard_bp
        FROM dom LEFT JOIN inter
          ON inter.t1 = dom.t1 AND inter.t2 = dom.t2
        ORDER BY dom.t1, dom.t2"""

  def oracles: Map[String, String] = Map(
    // The declarative window-formulation KMV — native graft_kmv must
    // be indistinguishable from it.
    "q169_kmv_aggregate" ->
      s"""WITH uu AS (SELECT DISTINCT event_type, user_id FROM events),
          hm AS (SELECT event_type,
                        md5(CAST(user_id AS VARCHAR)) AS m FROM uu),
          hashed AS (SELECT DISTINCT event_type,
                            ${oMd5Bits32("m")} AS h FROM hm),
          sk AS (SELECT event_type, h FROM (
                   SELECT event_type, h,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY h) AS rn
                   FROM hashed) WHERE rn <= 64)
          SELECT event_type, count(*) AS cnt, max(h) AS kth,
                 CAST(CASE WHEN count(*) < 64 THEN count(*)
                           ELSE (63 * 4294967296) // max(h) END AS BIGINT)
                   AS est_distinct
          FROM sk GROUP BY event_type ORDER BY event_type""",

    "q167_column_profile" ->
      s"""SELECT * FROM (
            ${oProfile("documents", "lang")}
            UNION ALL ${oProfile("documents", "source")}
            UNION ALL ${oProfile("events", "event_type")})
          ORDER BY tbl, col_name""",

    "q161_join_cardinality" ->
      """WITH edges AS (
            SELECT 'customer_nation' AS join_name,
                   (SELECT count(*) FROM customer) AS n_left,
                   (SELECT count(*) FROM nation) AS n_right,
                   (SELECT count(DISTINCT c_nationkey) FROM customer) AS ndv_left,
                   (SELECT count(DISTINCT n_nationkey) FROM nation) AS ndv_right,
                   (SELECT count(*) FROM customer JOIN nation
                      ON c_nationkey = n_nationkey) AS actual_rows
            UNION ALL
            SELECT 'orders_customer',
                   (SELECT count(*) FROM orders),
                   (SELECT count(*) FROM customer),
                   (SELECT count(DISTINCT o_custkey) FROM orders),
                   (SELECT count(DISTINCT c_custkey) FROM customer),
                   (SELECT count(*) FROM orders JOIN customer
                      ON o_custkey = c_custkey)
            UNION ALL
            SELECT 'lineitem_orders',
                   (SELECT count(*) FROM lineitem),
                   (SELECT count(*) FROM orders),
                   (SELECT count(DISTINCT l_orderkey) FROM lineitem),
                   (SELECT count(DISTINCT o_orderkey) FROM orders),
                   (SELECT count(*) FROM lineitem JOIN orders
                      ON l_orderkey = o_orderkey))
          SELECT join_name, n_left, n_right, ndv_left, ndv_right,
                 CAST((n_left * n_right) // greatest(ndv_left, ndv_right)
                      AS BIGINT) AS est_rows,
                 actual_rows
          FROM edges ORDER BY join_name""",

    "q226_bitmap_aggregate" -> bitmapOverlapOracleSql,

    "q162_bitmap_overlap" ->
"""WITH m AS (SELECT DISTINCT o_orderpriority AS seg,
                           o_custkey AS k FROM orders),
          bm AS (SELECT seg, k // 63 AS word,
                        bit_or(1::BIGINT << CAST(k % 63 AS INTEGER)) AS bits
                 FROM m GROUP BY seg, word),
          bo AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
                        CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT)
                          AS overlap_bitmap
                 FROM bm a JOIN bm b
                   ON a.word = b.word AND a.seg < b.seg
                 GROUP BY a.seg, b.seg),
          eo AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
                        count(*) AS overlap_exact
                 FROM m a JOIN m b ON a.k = b.k AND a.seg < b.seg
                 GROUP BY a.seg, b.seg)
          SELECT bo.seg_a, bo.seg_b, bo.overlap_bitmap, eo.overlap_exact
          FROM bo JOIN eo
            ON bo.seg_a = eo.seg_a AND bo.seg_b = eo.seg_b
          ORDER BY bo.seg_a, bo.seg_b""",

    "q156_kmv_distinct" ->
      s"""WITH uu AS (SELECT DISTINCT event_type, user_id FROM events),
          hm AS (SELECT event_type,
                        md5(CAST(user_id AS VARCHAR)) AS m FROM uu),
          hashed AS (SELECT event_type, ${oMd5Bits32("m")} AS h FROM hm),
          sk AS (SELECT event_type, h FROM (
                   SELECT event_type, h,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY h) AS rn
                   FROM hashed) WHERE rn <= 64),
          per AS (SELECT event_type, count(*) AS cnt, max(h) AS kth
                  FROM sk GROUP BY event_type),
          mall AS (SELECT 'ALL' AS event_type, count(*) AS cnt,
                          max(h) AS kth
                   FROM (SELECT h FROM (
                           SELECT h, row_number() OVER (ORDER BY h) AS rn
                           FROM (SELECT DISTINCT h FROM sk))
                         WHERE rn <= 64)),
          exact_per AS (SELECT event_type, count(*) AS exact
                        FROM hashed GROUP BY event_type),
          exact_all AS (SELECT 'ALL' AS event_type,
                               count(DISTINCT h) AS exact FROM hashed),
          u AS (SELECT * FROM per UNION ALL SELECT * FROM mall),
          e AS (SELECT * FROM exact_per UNION ALL SELECT * FROM exact_all)
          SELECT u.event_type, e.exact, u.cnt, u.kth,
                 CAST(CASE WHEN u.cnt < 64 THEN u.cnt
                           ELSE (63 * 4294967296) // u.kth END AS BIGINT)
                   AS est_distinct
          FROM u JOIN e USING (event_type) ORDER BY u.event_type""",

    "q155_analyze_stats" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
                    FROM lineitem),
          byv AS (SELECT c, count(*) AS cnt FROM v GROUP BY c),
          tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows_total,
                         count(*) AS ndv FROM byv),
          b AS (SELECT c, cnt,
                       COALESCE(sum(cnt) OVER (ORDER BY c
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS cum
                FROM byv)
          SELECT CAST((cum * 8) // n_rows_total + 1 AS BIGINT) AS bucket,
                 min(c) AS lo, max(c) AS hi,
                 CAST(sum(cnt) AS BIGINT) AS n_rows,
                 count(*) AS n_values, ndv
          FROM b CROSS JOIN tot
          GROUP BY bucket, ndv ORDER BY bucket""",

    // NOT EXISTS, not NOT IN: the Spark side is a left_anti join, and
    // NOT IN diverges from it under NULL keys (UNKNOWN rows drop out;
    // a NULL in the subquery suppresses every violation)
    "q138_dq_checks" ->
      """SELECT '1_orders_fk_customer' AS check_name,
                (SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                  AS n_violations
          UNION ALL
          SELECT '2_lineitem_fk_orders',
                (SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
          UNION ALL
          SELECT '3_orderkey_unique',
                (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
          UNION ALL
          SELECT '4_quantity_domain',
                (SELECT count(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50)
          UNION ALL
          SELECT '5_orderdate_not_null',
                (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
          ORDER BY check_name""",

    "q225_cms_width_sweep" -> {
      val laneCell = oCmsLaneCell
      val probeCell = oCmsProbeCell
      s"""WITH m AS (SELECT md5(CAST(l_partkey AS VARCHAR)) AS m FROM lineitem),
          lanes AS ($laneCell),
          sketch AS (SELECT lane, cell, count(*) AS c FROM lanes GROUP BY 1, 2),
          ks AS (SELECT unnest([1, 2, 3]) AS k),
          skk AS (SELECT k, lane,
                         CASE k WHEN 1 THEN cell // 256
                                WHEN 2 THEN cell // 16 ELSE cell END AS cellk,
                         CAST(sum(c) AS BIGINT) AS c
                  FROM sketch CROSS JOIN ks GROUP BY 1, 2, 3),
          probes AS (SELECT l_partkey,
                            CAST(count(*) AS BIGINT) AS exact_n,
                            md5(CAST(l_partkey AS VARCHAR)) AS m
                     FROM lineitem WHERE l_partkey <= 32 GROUP BY l_partkey),
          pcell AS ($probeCell),
          pk AS (SELECT k, lane,
                        CASE k WHEN 1 THEN cell // 256
                               WHEN 2 THEN cell // 16 ELSE cell END AS cellk,
                        l_partkey, exact_n
                 FROM pcell CROSS JOIN ks),
          est AS (SELECT k, l_partkey, exact_n, min(c) AS est
                  FROM pk JOIN skk USING (k, lane, cellk)
                  GROUP BY 1, 2, 3),
          agg AS (SELECT k, count(*) AS n_probes,
                         CAST(sum(est - exact_n) AS BIGINT) AS total_overest,
                         CAST(max(est - exact_n) AS BIGINT) AS max_overest,
                         CAST(sum(exact_n) AS BIGINT) AS sum_exact
                  FROM est GROUP BY k)
          SELECT CASE k WHEN 1 THEN 16 WHEN 2 THEN 256 ELSE 4096 END AS width,
                 n_probes, total_overest, max_overest,
                 (total_overest * 1000000) // sum_exact AS mean_overest_ppm
          FROM agg ORDER BY width"""
    },

    "q133_cms_heavy_hitters" -> {
      val laneCell = oCmsLaneCell
      s"""WITH m AS (SELECT md5(CAST(l_partkey AS VARCHAR)) AS m FROM lineitem),
          lanes AS ($laneCell),
          sketch AS (SELECT lane, cell, count(*) AS c FROM lanes GROUP BY 1, 2),
          probes AS (SELECT l_partkey, count(*) AS exact_n,
                            md5(CAST(l_partkey AS VARCHAR)) AS m
                     FROM lineitem WHERE l_partkey <= 32 GROUP BY 1),
          pl AS ($oCmsProbeCell)
          SELECT l_partkey, CAST(min(c) AS BIGINT) AS cms_est,
                 CAST(exact_n AS BIGINT) AS exact_n
          FROM pl JOIN sketch USING (lane, cell)
          GROUP BY l_partkey, exact_n ORDER BY l_partkey"""
    },

    "q67_bloom_prefilter" ->
      s"""SELECT l_returnflag, count(*) AS n, ${oSum("l_quantity")} AS sum_qty
          FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                               WHERE o_orderpriority = '1-URGENT')
          GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q36_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS p50_qty,
                quantile_cont(l_quantity, 0.9) AS p90_qty,
                quantile_cont(l_extendedprice, 0.37) AS p37_price
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // q37: the dump holds only deterministic columns (exact values +
    // tolerance booleans) — the oracle recomputes the exact columns and
    // pins the booleans literally TRUE. A sketch drifting past its
    // budget flips the boolean and fails the hash, so the approx
    // aggregates are fully gradeable without dumping their bytes.
    "q37_approx_sketches" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS exact_parts,
                quantile_cont(l_extendedprice, 0.5) AS exact_median,
                TRUE AS parts_within_tol,
                TRUE AS median_within_tol
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q45_minhash_aggregator" -> {
      val lanes = (0 until 8).map(i =>
        s"min(substr(md5(shingle), ${1 + 4 * i}, 4)) AS m$i").mkString(", ")
      s"""WITH tok AS (SELECT source, str_split(text, ' ') AS words FROM documents
                       WHERE len(str_split(text, ' ')) >= 3),
          posn AS (SELECT source, words,
                          unnest(generate_series(1, len(words) - 2)) AS pos FROM tok),
          sh AS (SELECT source,
                        words[pos] || ' ' || words[pos+1] || ' ' || words[pos+2] AS shingle
                 FROM posn)
          SELECT source, $lanes FROM sh GROUP BY source ORDER BY source"""
    },

    "q271_inclusion_dependency" -> {
      def cand(childTbl: String, ck: String, parentTbl: String,
               pk: String): String =
        s"""SELECT '$childTbl.$ck <= $parentTbl.$pk' AS candidate,
                   CAST((SELECT count(DISTINCT $ck) FROM $childTbl) AS BIGINT)
                     AS n_child_keys,
                   CAST((SELECT count(*) FROM
                          (SELECT DISTINCT $ck AS k FROM $childTbl) c
                          WHERE NOT EXISTS (SELECT 1 FROM $parentTbl p
                                            WHERE p.$pk = c.k)) AS BIGINT)
                     AS n_orphans"""
      val archived =
        s"""SELECT 'lineitem.l_orderkey <= orders[status=F].o_orderkey'
                     AS candidate,
                   CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem)
                        AS BIGINT) AS n_child_keys,
                   CAST((SELECT count(*) FROM
                          (SELECT DISTINCT l_orderkey AS k FROM lineitem) c
                          WHERE NOT EXISTS (SELECT 1 FROM orders p
                                            WHERE p.o_orderkey = c.k
                                              AND p.o_orderstatus = 'F'))
                        AS BIGINT) AS n_orphans"""
      (Seq(
        cand("lineitem", "l_orderkey", "orders", "o_orderkey"),
        cand("orders", "o_custkey", "customer", "c_custkey"),
        cand("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        cand("lineitem", "l_partkey", "part", "p_partkey"),
        cand("customer", "c_custkey", "orders", "o_custkey")) :+ archived)
        .map(q => s"SELECT candidate, n_child_keys, n_orphans, n_orphans = 0 AS ind_holds FROM ($q)")
        .mkString("", "\nUNION ALL ", "\nORDER BY candidate")
    },

    "q267_fd_discovery" -> {
      def cand(tbl: String, det: String, dep: String): String =
        s"""SELECT '$tbl.$det -> $tbl.$dep' AS candidate,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_violating,
                   sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
            FROM (SELECT $det, count(DISTINCT $dep) AS nd
                  FROM $tbl GROUP BY $det)"""
      Seq(
        cand("orders", "o_orderkey", "o_custkey"),
        cand("orders", "o_custkey", "o_orderpriority"),
        cand("customer", "c_custkey", "c_nationkey"),
        cand("customer", "c_nationkey", "c_mktsegment"),
        cand("lineitem", "l_orderkey", "l_suppkey"),
        cand("lineitem", "l_partkey", "l_suppkey"),
        cand("nation", "n_nationkey", "n_regionkey"))
        .mkString("", "\nUNION ALL ", "\nORDER BY candidate")
    },

    "q261_kmv_set_ops" -> {
      def est(ar: String): String =
        s"""CASE WHEN len($ar) < 64 THEN CAST(len($ar) AS BIGINT)
                 ELSE CAST((63 * 4294967296) // $ar[64] AS BIGINT) END"""
      s"""WITH uh AS (SELECT DISTINCT event_type, user_id,
                             epoch_us(ts) // 86400000000 AS day
                      FROM events),
          hh AS (SELECT event_type, ${graft.ops.oMd5Bits32("m")} AS h
                 FROM (SELECT event_type,
                              md5(CAST(user_id AS VARCHAR) || ':' ||
                                  CAST(day AS VARCHAR)) AS m FROM uh)),
          sk AS (SELECT event_type,
                        (list_sort(list(DISTINCT h)))[1:64] AS ar,
                        CAST(count(*) AS BIGINT) AS n_exact
                 FROM hh GROUP BY 1),
          pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                           a.ar AS ar_a, b.ar AS ar_b,
                           a.n_exact AS exact_a, b.n_exact AS exact_b,
                           (list_sort(list_distinct(a.ar || b.ar)))[1:64] AS ar_u
                    FROM sk a CROSS JOIN sk b
                    WHERE a.event_type < b.event_type),
          est AS (SELECT type_a, type_b, exact_a, exact_b,
                         greatest(0, ${est("ar_a")} + ${est("ar_b")}
                                     - ${est("ar_u")}) AS est_inter
                  FROM pairs),
          inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                           CAST(count(*) AS BIGINT) AS exact_inter
                    FROM uh a JOIN uh b ON a.user_id = b.user_id
                                       AND a.day = b.day
                                       AND a.event_type < b.event_type
                    GROUP BY 1, 2)
          SELECT e.type_a, e.type_b, e.exact_a, e.exact_b,
                 CAST(coalesce(i.exact_inter, 0) AS BIGINT) AS exact_inter,
                 CAST(e.est_inter AS BIGINT) AS est_inter,
                 CAST((abs(e.est_inter - coalesce(i.exact_inter, 0)) * 10000)
                      // greatest(coalesce(i.exact_inter, 0), 1) AS BIGINT)
                   AS err_bp
          FROM est e LEFT JOIN inter i USING (type_a, type_b)
          ORDER BY e.type_a, e.type_b"""
    },

    "q250_benford_audit" ->
      """WITH src AS (
            SELECT 'l_extendedprice' AS col_name,
                   CAST(substr(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM lineitem
            UNION ALL
            SELECT 'o_totalprice',
                   CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT)
            FROM orders),
          digits AS (SELECT col_name, digit, count(*) AS n
                     FROM src GROUP BY 1, 2),
          tot AS (SELECT col_name, CAST(sum(n) AS BIGINT) AS nn
                  FROM digits GROUP BY 1),
          rep AS (SELECT d.col_name, d.digit, d.n,
                         (d.n * 10000) // t.nn AS obs_bp,
                         CAST(CASE d.digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
                              WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792
                              WHEN 6 THEN 669 WHEN 7 THEN 580 WHEN 8 THEN 512
                              ELSE 458 END AS BIGINT) AS exp_bp
                  FROM digits d JOIN tot t USING (col_name))
          SELECT col_name, digit, n, obs_bp, exp_bp,
                 abs(obs_bp - exp_bp) AS dev_bp
          FROM rep ORDER BY col_name, digit"""
  )
}
