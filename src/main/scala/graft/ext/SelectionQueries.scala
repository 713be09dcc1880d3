package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-SELECTION operators — the stage between curation (what is clean)
  * and sampling (what order to train on): deciding WHICH documents a
  * training run should prefer, and summarizing what a corpus contains so
  * the mixture designer can decide at all.
  *
  *  - q199: DSIR-style importance weighting (Xie et al. 2023, "Data
  *    Selection for Language Models via Importance Resampling"): score
  *    every raw document by how target-like its hashed-unigram profile
  *    is — weight = Σ_b n(d,b)·(ln p_target(b) − ln p_raw(b)) over
  *    [[SelectionQueries.DsirBuckets]] hash buckets — and keep the top
  *    [[SelectionQueries.DsirKeep]]. The bucket profiles are two global
  *    aggregates; per-document scoring is one (doc, bucket) aggregate
  *    joined against the broadcast-sized bucket table.
  *  - q200: per-label embedding centroids + the pairwise cosine matrix
  *    between them — the source-affinity map a mixture designer reads
  *    before re-weighting domains (and the cheap first look at whether
  *    two corpus slices are near-duplicates wholesale).
  *  - q203: the corpus report card — per source: doc/token volume,
  *    language mix (share + entropy), exact-duplicate count, mean
  *    length. One pass over the corpus, two shuffles.
  *
  * Cross-engine exactness: every aggregate that would sum doubles is
  * fixed-point — per-row doubles are quantized to micro-units
  * (`CAST(round(x·1e6) AS BIGINT)`) and summed as exact integers (or
  * DECIMAL(38,0) where products would overflow bigint), so accumulation
  * order can never change a hash-compared result. Per-row `ln`/`sqrt`
  * stay in doubles (deterministic given identical inputs) and displayed
  * values round at 1e-6 — the q66/q120 discipline.
  *
  * 100 TB notes: q199 is two corpus-wide token aggregates (bucket-keyed,
  * 64 groups — partial aggregation collapses them map-side) plus one
  * (doc_id, bucket) aggregate; nothing is ever all-pairs and the bucket
  * table joins broadcast. q200 reduces the corpus to (labels × dims)
  * fixed-point sums before any pair math — the pair join is over a
  * label-count-sized table, never over vectors. q203 is two
  * partial-aggregating shuffles keyed on (source[, lang]).
  */
object SelectionQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Hashed-unigram feature buckets for DSIR scoring. */
  private[ext] val DsirBuckets = 64

  /** Documents kept by the q199 importance-resampling top-k. */
  private[ext] val DsirKeep = 100

  /** The hex-share score expression over a `ws` word array — ONE string
    * for the seam and q325's tie plants. Oracle twin: [[OHexPred]]. */
  private[ext] val HexPredSql: String =
    """size(filter(ws, w -> w rlike '^[0-9a-f]{8,}$')) * 10000
       DIV size(ws)"""
  private[ext] val OHexPred: String =
    """CAST(len(list_filter(ws, w -> regexp_matches(w, '^[0-9a-f]{8,}$')))
       * 10000 // len(ws) AS BIGINT)"""

  /** The label-blind hex-gibberish scorer over the planted corpus — ONE
    * seam behind q323 (calibration) AND q325 (discrimination), so the
    * two audits can never grade different scorers. Planted docs (every
    * k-th word md5-replaced, k = 2 + (doc_id DIV 2) % 4 — decoupled
    * from the even/odd split parity) are all bad; the detector scores
    * the share of ≥8-char all-hex words in bp. Returns
    * (doc_id, bad, pred_bp, bin). Oracle twin: [[HexScoredSql]]. */
  private[ext] def hexGibberishScored(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 13 === 6)
      .select((col("doc_id") + 9100000L).as("doc_id"), expr("""
        concat_ws(' ', transform(sequence(1, size(split(text, ' '))),
          j -> IF(j % (2 + (doc_id DIV 2) % 4) = 0,
            substring(md5(concat(CAST(doc_id AS STRING), ':',
                                 CAST(j AS STRING))), 1, 10),
            element_at(split(text, ' '), j))))""")
        .as("text"))
    docs.unionByName(planted)
      .withColumn("ws", expr("filter(split(text, ' '), w -> w <> '')"))
      .select(col("doc_id"),
        (col("doc_id") >= 9100000L).cast("long").as("bad"),
        expr(HexPredSql).as("pred_bp"))
      .withColumn("bin", expr("least(pred_bp DIV 1000, 9)"))
  }

  /** DuckDB twin of [[hexGibberishScored]] — CTEs ending in `binned`
    * (doc_id, bad, pred_bp, bin). */
  private[ext] val HexScoredSql: String =
    s"""planted AS (
          SELECT documents.doc_id + 9100000 AS doc_id,
            array_to_string(list_transform(
              generate_series(1, len(str_split(text, ' '))),
              j -> CASE WHEN j % (2 + (documents.doc_id // 2) % 4) = 0
                   THEN substring(md5(CAST(documents.doc_id AS VARCHAR)
                                      || ':' || CAST(j AS VARCHAR)), 1, 10)
                   ELSE str_split(text, ' ')[j] END), ' ') AS text
          FROM documents WHERE documents.doc_id % 13 = 6),
        corpus AS (SELECT doc_id, text FROM documents
                   UNION ALL SELECT doc_id, text FROM planted),
        scored AS (
          SELECT doc_id,
            CAST(CASE WHEN doc_id >= 9100000 THEN 1 ELSE 0 END AS BIGINT)
              AS bad,
            $OHexPred AS pred_bp
          FROM (SELECT doc_id,
                  list_filter(str_split(text, ' '), w -> w <> '') AS ws
                FROM corpus)),
        binned AS (SELECT *, least(pred_bp // 1000, 9) AS bin FROM scored)"""

  /** q340's replica count and the Poisson(1) inverse-CDF thresholds on
    * the [[SamplingPipeline.drawExpr]] scale (16^5 = 2^20): threshold_k
    * = ⌊CDF_Poisson(1)(k) · 2^20⌋, so draw < threshold_k ⟺ the replica
    * weight is ≤ k. Integer constants, identical CASE in both engines. */
  private val BootstrapReplicas = 32
  private val PoissonCase: String = {
    // CDF(0..5) of Poisson(1) scaled by 2^20; tail mass beyond 6 is
    // < 6e-4 of 2^20 and maps to weight 6 (documented truncation).
    // Every constant is the exact floor (2.5/e · 2^20 = 964373.97 →
    // 964373), so re-deriving the ladder from the comment reproduces
    // the shipped results bit for bit.
    val th = Seq(385749L, 771499L, 964373L, 1028665L, 1044738L, 1047952L)
    th.zipWithIndex.map { case (t, k) => s"WHEN drw < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")
  }

  def queries: Map[String, Q] = Map(
    // POISSON-BOOTSTRAP CONFIDENCE INTERVALS — the uncertainty readout
    // every per-source corpus stat (and every eval metric) should ship
    // with, computed THE distributed way: a classical bootstrap
    // resamples N rows with replacement per replica (a global shuffle
    // per replica — unrunnable at 100 TB), while the Poisson bootstrap
    // gives each row an independent Poisson(1) weight per replica, so
    // ALL R replicas ride ONE map-side explode + ONE (source, replica)
    // aggregation. Weights are deterministic md5 draws through the
    // shared integer inverse-CDF ladder ([[PoissonCase]]), so both
    // engines draw identical replicas. Metric: per-source mean doc
    // length in ppm; the interval is the [2nd, 31st] order statistic
    // of the 32 replica estimates (a ~93.75% central interval — rank
    // positions, not interpolated percentiles, so integer-exact).
    // Mutation seam (knob OFF in every production plan): the classic
    // fixed-denominator slip — dividing each replica's weighted sum by
    // the SOURCE SIZE N instead of the replica's Σw biases every
    // estimate toward (Σw/N)·point and narrows the interval.
    "q340_bootstrap_ci" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
      val reps = docs.select(col("source"), col("doc_id"), col("n_chars"),
        explode(expr(s"sequence(0, ${BootstrapReplicas - 1})")).as("r"))
      val draw = SamplingPipeline.drawExpr(
        "concat(cast(doc_id as string), '#', cast(r as string))", "boot")
      val denom =
        if (graft.Mutations.on("q340_bootstrap_fixed_denominator")) "nr"
        else "sw"
      val est = reps
        .withColumn("drw", expr(draw))
        .withColumn("w", expr(PoissonCase).cast("long"))
        .groupBy("source", "r")
        .agg(sum(col("w") * col("n_chars")).as("swx"), sum(col("w")).as("sw"),
          count(lit(1)).as("nr"))
        .select(col("source"), col("r"),
          expr(s"CASE WHEN sw = 0 THEN CAST(0 AS BIGINT) " +
            s"ELSE (swx * 1000000) DIV ($denom) END").as("est_ppm"))
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("est_ppm"), col("r"))
      val ci = est.withColumn("rn", row_number().over(rw))
        .groupBy("source")
        .agg(max(when(col("rn") === 2, col("est_ppm"))).as("lo_ppm"),
          max(when(col("rn") === BootstrapReplicas - 1, col("est_ppm")))
            .as("hi_ppm"))
      val point = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("(sum(n_chars) * 1000000) DIV count(*)").as("point_ppm"))
      point.join(ci, "source")
        .select(col("source"), col("n_docs"), col("point_ppm"),
          col("lo_ppm"), col("hi_ppm"),
          (col("hi_ppm") - col("lo_ppm")).as("width_ppm"))
        .orderBy("source")
    }),

    // CALIBRATION AUDIT + HISTOGRAM-BINNING RECALIBRATION (ECE) — the
    // check a team runs before using a quality filter's scores as
    // probabilities or sampling weights: a score can RANK perfectly and
    // still be wildly miscalibrated. The fixture makes that concrete:
    // planted gibberish docs (every k-th word md5-replaced, k = 2 +
    // (doc_id DIV 2) % 4 — decoupled from the even/odd split parity, so
    // BOTH splits see every density class; ids + 9100000, oracle-mirrored) are ALL bad, but the
    // label-blind detector (share of ≥8-char all-hex words) predicts
    // only 10000/k bp ≈ 2000..5000 — systematic underestimation. The
    // audit bins eval-split docs by predicted bp (decile bins, capped),
    // compares predicted vs empirical bad rates per bin, and rolls up
    // the expected calibration error ECE = Σ n_b·|gap_b| DIV N. The fix
    // is graded alongside: histogram-binning calibration LEARNS the
    // per-bin empirical rate on the TRAIN split (even doc_ids) and
    // re-scores the EVAL split (odd) — recalibrated ECE collapses
    // (spec-pinned), and the split discipline is exactly what the
    // mutation knob breaks (evaluating on the training split, the
    // classic leakage that makes any calibrator look perfect).
    // All arithmetic integer bp; no float probabilities anywhere.
    // Scale: scoring is map-only (one in-row filter over words); the
    // train map is ≤10 rows broadcast back; the census is (arm, bin)-
    // sized. Nothing corpus-quadratic.
    "q323_calibration_ece" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): the ECE is
      // measured on the split the calibrator was FITTED on
      val evalParity =
        if (graft.Mutations.on("q323_eval_on_train")) 0 else 1
      val scored = hexGibberishScored(s, d)
      val train = scored.filter(col("doc_id") % 2 === 0)
        .groupBy("bin")
        .agg(expr("sum(bad) * 10000 DIV count(1)").as("rate_bp"))
      val ev = scored.filter(col("doc_id") % 2 === evalParity)
        .join(broadcast(train), Seq("bin"), "left")
        .select(col("doc_id"), col("bad"), explode(expr(
          """array(named_struct('arm', 'raw', 'p', pred_bp),
                   named_struct('arm', 'recalibrated',
                     'p', coalesce(rate_bp, pred_bp)))""")).as("ap"))
        .select(col("bad"), col("ap.arm").as("arm"), col("ap.p").as("p"),
          expr("least(ap.p DIV 1000, 9)").as("pbin"))
      val perBin = ev.groupBy("arm", "pbin")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(p) DIV count(1)").as("avg_pred_bp"),
          expr("sum(bad) * 10000 DIV count(1)").as("actual_bad_bp"))
        .withColumn("gap_bp", abs(col("avg_pred_bp") - col("actual_bad_bp")))
      val ece = perBin.groupBy("arm")
        .agg(expr("sum(n_docs * gap_bp) DIV sum(n_docs)").as("ece_bp"))
      perBin.join(broadcast(ece), "arm")
        .select(col("arm"), col("pbin"), col("n_docs"), col("avg_pred_bp"),
          col("actual_bad_bp"), col("gap_bp"), col("ece_bp"))
        .orderBy("arm", "pbin")
    }),

    // RANKING AUC (Mann-Whitney U) — the discrimination audit next to
    // q323's calibration audit, over the SAME scorer seam: does the
    // quality score rank bad above good, independent of its calibration?
    // AUC is computed by the VALUE-BUCKETED rank-sum formulation — group
    // by exact score, prefix-sum the negative counts, U₂ = Σ_s n1(s)·
    // (2·N0(<s) + n0(s)) in the ×2 integer scale (ties credit half, the
    // midrank convention — see the knob) — so there is NO global sort:
    // the bucket table is at most 10001 rows per split (scores are bp
    // integers), control-plane sized at any corpus scale. Tie classes
    // are PLANTED on both sides (19-word prefixes + one appended md5
    // checksum word → pred exactly 500 bp for a good class at +8.8M and
    // a bad class at +9.3M), so the tie term is load-bearing by
    // construction, and AUC is reported for the all/even/odd splits
    // (split stability — the q323 parity discipline read the other way).
    // Scale: scoring is map-only; the census is (split, score)-keyed
    // with map-side combine; the prefix window runs over ≤10001 rows.
    "q325_ranking_auc" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): ties scored
      // as LOSSES (strict > only) — the classic Mann-Whitney midrank
      // bug; every planted tie pair loses its half-credit
      val tieTerm =
        if (graft.Mutations.on("q325_ties_as_losses")) "CAST(0 AS BIGINT)"
        else "n1 * n0"
      val base = hexGibberishScored(s, d).select("doc_id", "bad", "pred_bp")
      val docs = Tables.documents(s, d).select("doc_id", "text")
      def tiePlant(m: Int, off: Long) =
        docs.filter(col("doc_id") % 17 === m)
          .withColumn("ws0", split(col("text"), " "))
          .filter(size(col("ws0")) >= 19)
          .select((col("doc_id") + off).as("doc_id"),
            expr("""concat(concat_ws(' ', slice(ws0, 1, 19)), ' ',
                    substring(md5(concat('tie:', CAST(doc_id AS STRING))),
                              1, 10))""").as("text"))
      val plants = tiePlant(9, 8800000L).unionByName(tiePlant(2, 9300000L))
        .withColumn("ws", expr("filter(split(text, ' '), w -> w <> '')"))
        .select(col("doc_id"),
          (col("doc_id") >= 9100000L).cast("long").as("bad"),
          expr(HexPredSql).as("pred_bp"))
      val scored = base.unionByName(plants)
        .select(col("bad"), col("pred_bp"), explode(expr(
          "array('all', IF(doc_id % 2 = 0, 'even', 'odd'))")).as("split"))
      val buckets = scored.groupBy("split", "pred_bp")
        .agg(sum(col("bad")).as("n1"), sum(lit(1L) - col("bad")).as("n0"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("split").orderBy("pred_bp")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      buckets
        .withColumn("n0_below", coalesce(sum(col("n0")).over(w), lit(0L)))
        .withColumn("u2", col("n1") * 2L * col("n0_below") + expr(tieTerm))
        .groupBy("split")
        .agg(sum(col("n1")).as("n_pos"), sum(col("n0")).as("n_neg"),
          count(lit(1)).as("n_scores"), sum(col("u2")).as("u2s"))
        .select(col("split"), col("n_pos"), col("n_neg"), col("n_scores"),
          expr("(u2s * 10000) DIV (2 * n_pos * n_neg)").as("auc_bp"))
        .orderBy("split")
    }),

    // DSIR importance weighting: target = the English slice, raw = the
    // whole corpus. Add-one smoothing over the bucket alphabet on both
    // profiles; the per-bucket log-ratio is quantized once (micro-nats,
    // bigint) so each document's weight is an EXACT integer dot product
    // n(d,·)·λ — order-independent, hash-stable. Top-k selection is
    // orderBy+limit = TakeOrderedAndProject (per-partition heaps + a
    // k-row merge), never a global sort.
    // TOKEN-BUDGET allocation — the greedy curriculum fill that turns a
    // per-source quality ranking into a concrete training manifest:
    // rank sources by a deterministic priority (share of docs meeting
    // the q61 length bar, in basis points), then walk the ranking
    // filling a fixed token budget (60% of the corpus here) — top
    // sources taken in full, the source straddling the budget boundary
    // taken partially, the tail excluded. This is the allocation step
    // every "data budget" paper assumes and every run config needs
    // spelled out; its output is directly consumable as q187 mixture
    // input (taken_tokens / src_tokens is the per-source rate).
    // Scale: per-source stats are one corpus pass with map-side partial
    // aggregation; the cumulative walk is a window over |sources| rows —
    // the control plane (thousands at most), NOT corpus-sized, so the
    // unpartitioned window is deliberate and safe. All integer.
    "q217_token_budget" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy("source").agg(
          sum(col("toks")).as("src_tokens"),
          count(lit(1)).as("n_docs"),
          sum(when(col("toks") >= 30, 1L).otherwise(0L)).as("n_ok"))
        .withColumn("priority_bp", expr("(n_ok * 10000) DIV n_docs"))
      val tot = per.agg(sum(col("src_tokens")).as("tt"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("priority_bp").desc, col("source"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      per.crossJoin(broadcast(tot))
        .withColumn("budget", expr("(tt * 6) DIV 10"))
        .withColumn("cum_prev",
          coalesce(sum(col("src_tokens")).over(w), lit(0L)))
        .withColumn("taken_tokens", expr(
          "greatest(CAST(0 AS BIGINT), least(src_tokens, budget - cum_prev))"))
        .withColumn("status",
          when(col("taken_tokens") === col("src_tokens"), "full")
            .when(col("taken_tokens") > 0, "partial")
            .otherwise("excluded"))
        .select("source", "priority_bp", "src_tokens", "taken_tokens", "status")
        .orderBy(col("priority_bp").desc, col("source"))
    }),

    "q199_dsir_importance" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("word"))
        // r17: FastMd5 — hex-identical to md5() (oracle unchanged), one
        // digest per executor thread; this is a per-TOKEN hash, the q41
        // shingle-hash argument verbatim
        .withColumn("m", graft.functions.FastMd5.fastMd5(col("word")))
        .withColumn("b", expr(s"${graft.ops.md5Bits32("m")} % $DsirBuckets"))
      // ONE pass over the token stream: the (doc, bucket) histogram.
      // Map-side combine collapses it to <= 64 rows per doc before the
      // shuffle; the bucket profile and its totals then fold over the
      // histogram (corpus-docs x 64 rows, then 64), never re-reading
      // the corpus — the exchange is reused across both consumers.
      val docb = tok.groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("n_db"))
      val prof = docb.groupBy("b").agg(
        sum(col("n_db")).as("cr"),
        coalesce(sum(when(col("lang") === "en", col("n_db"))), lit(0L)).as("ct"))
      val totals = prof.agg(sum(col("cr")).as("rr"), sum(col("ct")).as("tt"))
      val lam = prof.crossJoin(broadcast(totals))
        .select(col("b"),
          expr(s"""CAST(round((ln((ct + 1.0) / (tt + $DsirBuckets.0))
                              - ln((cr + 1.0) / (rr + $DsirBuckets.0))) * 1000000)
                   AS BIGINT)""").as("lam_fp"))
      docb.join(broadcast(lam), "b")
        .groupBy("doc_id", "lang")
        .agg(sum(col("n_db") * col("lam_fp")).as("w_fp"))
        .select(col("doc_id"), col("lang"),
          (col("w_fp").cast("double") / 1e6).as("weight"))
        .orderBy(col("weight").desc, col("doc_id")).limit(DsirKeep)
    }),

    // Label-centroid cosine matrix. Cosine is invariant to the positive
    // per-group scaling of a mean, so the centroid never needs the
    // divide: the fixed-point component SUMS are the centroid up to
    // scale, and dot/norms run over them in exact DECIMAL(38,0)
    // (s_fp products reach ~1e16·dims — past bigint at production group
    // sizes). Only the final cosine divides in doubles.
    "q200_label_centroids" -> ((s, d) => {
      val comp = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(sum(expr("CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"))
          .as("s_fp"))
      val nrm = comp.groupBy("label")
        .agg(sum(expr(
          "CAST(s_fp AS DECIMAL(19,0)) * CAST(s_fp AS DECIMAL(19,0))")).as("n2"))
        .select(col("label"), sqrt(col("n2").cast("double")).as("nn"))
      val pairs = comp.as("a")
        .join(comp.as("b"),
          col("a.pos") === col("b.pos") && col("a.label") < col("b.label"))
        .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
        .agg(sum(expr(
          "CAST(a.s_fp AS DECIMAL(19,0)) * CAST(b.s_fp AS DECIMAL(19,0))"))
          .as("dot"))
      pairs
        .join(nrm.select(col("label").as("label_a"), col("nn").as("na")), "label_a")
        .join(nrm.select(col("label").as("label_b"), col("nn").as("nb")), "label_b")
        .select(col("label_a"), col("label_b"),
          round(col("dot").cast("double") / (col("na") * col("nb")), 6)
            .as("cos_sim"))
        .orderBy("label_a", "label_b")
    }),

    // q203's corpus report THROUGH THE STREAMING ENGINE — the census a
    // continuously-ingesting corpus maintains live. The streaming stage
    // is ONE (source, lang) aggregate in Complete mode (count/sum are
    // streaming-legal; the exact-duplicate column needs a distinct and
    // stays batch-only in q203); the per-source rollup and entropy run
    // as batch arithmetic over the ~100-row census the stream emits.
    // Because every aggregate is deterministic integer arithmetic, the
    // streamed census equals the batch pass row-for-row — the same
    // resumable-ingest guarantee q198 grades for sampling, here for
    // reporting.
    "q208_stream_corpus_report" -> ((s, d) => {
      val docs = graft.streaming.StreamingPipelines.documentsStream(s, d)
      val agg = docs.groupBy("source", "lang").agg(
        count(lit(1)).as("c"),
        sum(size(split(col("text"), " "))).as("tok"),
        sum(col("n_chars")).as("chars"))
      val census = graft.streaming.StreamingPipelines.runToCompletion(s, agg)
      // join-free rollup (the streamed memory table must not self-join):
      // window the per-source total onto each census row, then ONE
      // aggregate carries counts, sums, and the entropy fold together
      census
        .withColumn("tot", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")))
        .withColumn("e_fp", expr(
          """CAST(round(-(CAST(c AS DOUBLE) / tot)
                        * ln(CAST(c AS DOUBLE) / tot) * 1000000)
             AS BIGINT)"""))
        .groupBy("source").agg(
          sum(col("c")).as("n_docs"),
          sum(col("tok")).as("total_tokens"),
          coalesce(sum(when(col("lang") === "en", col("c"))), lit(0L)).as("n_en"),
          sum(col("chars")).as("sum_chars"),
          sum(col("e_fp")).as("ent_fp"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          (col("n_en").cast("double") / col("n_docs")).as("pct_en"),
          (col("sum_chars").cast("double") / col("n_docs")).as("mean_chars"),
          (col("ent_fp").cast("double") / 1e6).as("lang_entropy"))
        .orderBy("source")
    }),

    // Corpus report card, one row per source: volume (docs, tokens),
    // language composition (English share + Shannon entropy of the lang
    // mix, micro-nat fixed point), exact-duplicate pressure (docs minus
    // distinct text hashes), mean length. The per-(source, lang) census
    // feeds the entropy; everything else rides one source-keyed
    // aggregate of map-side row features.
    "q203_corpus_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.select(col("source"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).as("n_tok"), md5(col("text")).as("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          count(when(col("lang") === "en", 1)).as("n_en"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("h")).as("n_distinct"))
      val ent = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .withColumn("tot", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")))
        .select(col("source"), expr(
          """CAST(round(-(CAST(c AS DOUBLE) / tot)
                        * ln(CAST(c AS DOUBLE) / tot) * 1000000)
             AS BIGINT)""").as("e_fp"))
        .groupBy("source").agg(sum(col("e_fp")).as("ent_fp"))
      base.join(ent, "source")
        .select(col("source"), col("n_docs"), col("total_tokens"),
          (col("n_en").cast("double") / col("n_docs")).as("pct_en"),
          (col("sum_chars").cast("double") / col("n_docs")).as("mean_chars"),
          (col("n_docs") - col("n_distinct")).as("dup_docs"),
          (col("ent_fp").cast("double") / 1e6).as("lang_entropy"))
        .orderBy("source")
    }),

    // BIGRAM-LM PERPLEXITY FILTER (the CCNet/KenLM step — Wenzek et al.
    // '20): score every document's per-token surprisal under an add-one
    // bigram language model TRAINED on the trusted slice (lang = 'en',
    // the q199 target-slice precedent), and census the corpus by
    // surprisal band — the quality filter that ships in front of every
    // web-scale pretraining corpus. Arithmetic is the q199 micro-nat
    // discipline: each model probability's ln is quantized ONCE at the
    // model-table grain (round(ln·1e6) → BIGINT), per-document scoring
    // is then an EXACT integer sum (no float accumulation order), and
    // the per-token mean is integer DIV. Backoff ladder: seen bigram →
    // ln((c₂+1)/(c₁+V)); unseen bigram, seen context → ln(1/(c₁+V));
    // unseen CONTEXT → ln(1/(T+V)) (an unseen context is at most one
    // event over the whole training mass T — the OOV ceiling). Banding
    // is SELF-CALIBRATING (the CCNet practice of cutting the scored
    // distribution per corpus rather than at absolute nats, which drift
    // with ln T): each doc's mean surprisal is placed as basis points
    // of the gap between the TRAIN slice's own mean surprisal (the
    // fluent anchor — in-distribution text sits at ≈ 0) and the OOV
    // ceiling (gibberish sits at ≈ 10000), cut at 12.5% / 37% / 75%.
    // The organic fixture shares one small vocabulary across languages
    // (near-uniform text ⇒ everything scores ≈ ln V), so — the q240
    // planted-failure-mode discipline — the three production failure
    // classes are planted in-query on BOTH engine sides: light
    // contamination (every 5th word md5-gibberished → b2), heavy
    // contamination (every 3rd → b3), and full gibberish (→ b4), each
    // under its own xx_* label so plants can never enter training and
    // the census separates them. Docs with <2 tokens have no bigrams
    // and are out of scope (the q62 length gate owns them).
    // Scale: model training is two (w1[,w2])-keyed counts over the
    // trusted slice with map-side combine; scoring is two hash joins of
    // the corpus bigram stream against model tables that shuffle on
    // their own keys (broadcast would cap the vocabulary — at corpus
    // scale a bigram model outgrows executor memory, the shuffle join
    // is the honest shape); everything after is a doc-keyed aggregate
    // and a ≤ |langs|×4-row census.
    "q309_bigram_perplexity" -> ((s, d) => {
      val (model, backoff, oov) = pplxModel(s, d)
      val corpus = pplxPlanted(
        Tables.documents(s, d).select("doc_id", "lang", "text"))
      pplxCensus(pplxPerDoc(pplxNats(corpus, model, backoff, oov)))
    }),

    // q309's scoring THROUGH THE STREAMING ENGINE — the quality filter
    // applied where production applies it: at INGEST, as documents
    // arrive. The model tables are batch-trained statics (the offline
    // model artifact); the stream side is the stateless plant + bigram
    // + backoff-join pipeline, the only stateful operator is the ONE
    // per-doc aggregate through the state store (Complete mode), and
    // the banding census reads the completed table — chained streaming
    // aggregations are unsupported, and the census is |langs|×4-sized
    // control-plane work anyway (the q220 discipline). Because scoring
    // is md5/ln-free-of-state integer arithmetic against static tables,
    // a streamed corpus scores IDENTICALLY to the batch pass — the
    // oracle is q309's, verbatim: the resumable-ingest guarantee for
    // the perplexity gate, graded rather than claimed.
    "q310_stream_perplexity" -> ((s, d) => {
      val (model, backoff, oov) = pplxModel(s, d)
      val sdocs = graft.streaming.StreamingPipelines.documentsStream(s, d)
        .select("doc_id", "lang", "text")
      val agg = pplxPerDoc(pplxNats(pplxPlanted(sdocs), model, backoff, oov))
      pplxCensus(graft.streaming.StreamingPipelines.runToCompletion(s, agg))
    })
  )

  /** q309/q310's shared machinery — ONE definition of the plants, the
    * bigram stream, the model, the scoring ladder, and the census, so
    * the streaming twin can never drift from the batch grade. All
    * stages up to the per-doc aggregate are STATELESS (safe on a
    * streaming DataFrame); the model builders aggregate and are
    * batch-only. */
  private def pplxPlanted(base: DataFrame): DataFrame = {
    def plant(mod: Int, offset: Long, tag: String, every: Int): DataFrame =
      base.filter(col("doc_id") % 20 === mod)
        .withColumn("ws", expr("filter(split(text, ' '), x -> x <> '')"))
        .filter(size(col("ws")) >= 2)
        .select((col("doc_id") + offset).as("doc_id"),
          lit(tag).as("lang"),
          expr(s"""concat_ws(' ', transform(ws, (w, i) ->
             CASE WHEN (i + 1) % $every = 0
                  THEN substring(md5(concat(w, '#',
                         CAST(i AS STRING))), 1, 6)
                  ELSE w END))""").as("text"))
    base
      .unionByName(plant(3, 5000000L, "xx_light", 5))
      .unionByName(plant(7, 6000000L, "xx_mix", 3))
      .unionByName(plant(11, 7000000L, "xx_gib", 1))
  }

  private def pplxBigrams(corpus: DataFrame): DataFrame = corpus
    .withColumn("ws", expr("filter(split(text, ' '), x -> x <> '')"))
    .filter(size(col("ws")) >= 2)
    .select(col("doc_id"), col("lang"), explode(expr(
      "transform(sequence(1, size(ws) - 1), i -> named_struct(" +
        "'w1', element_at(ws, i), 'w2', element_at(ws, i + 1)))")).as("b"))
    .select(col("doc_id"), col("lang"),
      col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** r17: the trained model IS an offline artifact — q309 (batch gate)
    * and q310 (the same gate at ingest) both score against it, and each
    * was re-training it per pass. One pinned (model, backoff, oov)
    * triple per (session, dataset); the TRAINING chain is knob-free
    * (q309's backoff knob sits in the scoring ladder, downstream), so
    * no knob key. The scale probe clears per timed q309 run so the
    * probed exponent still covers train + score. */
  private val pplxModelCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (GraphOps.Pinned, GraphOps.Pinned, GraphOps.Pinned)]()

  /** Free the pinned model tables and forget them. */
  def clearPplxModelCache(): Unit = {
    pplxModelCache.values().forEach { case (m, b, o) =>
      m.free(); b.free(); o.free()
    }
    pplxModelCache.clear()
  }

  private[graft] def pplxModel(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    GraphOps.sweepStopped(pplxModelCache)(_._1)
    val (m, b, o) = pplxModelCache.computeIfAbsent((s, d), _ => {
      val (m0, b0, o0) = pplxModelBuild(s, d)
      (GraphOps.pin(m0), GraphOps.pin(b0), GraphOps.pin(o0))
    })
    (m.df, b.df, o.df)
  }

  /** The batch-trained model artifact: (bigram table, context-backoff
    * table, 1-row OOV ceiling), micro-nat quantized at the table grain. */
  private def pplxModelBuild(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val train = pplxBigrams(
      Tables.documents(s, d).select("doc_id", "lang", "text"))
      .filter(col("lang") === "en")
    val uni = train.groupBy("w1").agg(count(lit(1)).as("c1"))
    val big = train.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val stats = train.select(col("w1").as("w"))
      .unionByName(train.select(col("w2").as("w")))
      .distinct().agg(count(lit(1)).as("v"))
      .crossJoin(train.agg(count(lit(1)).as("tt")))
    val model = big.join(uni, "w1").crossJoin(broadcast(stats))
      .select(col("w1"), col("w2"),
        expr("CAST(round(ln((c2 + 1.0) / (c1 + v)) * 1000000) AS BIGINT)")
          .as("mnat"))
    val backoff = uni.crossJoin(broadcast(stats))
      .select(col("w1"),
        expr("CAST(round(ln(1.0 / (c1 + v)) * 1000000) AS BIGINT)")
          .as("bnat"))
    val oov = stats.select(
      expr("CAST(round(ln(1.0 / (tt + v)) * 1000000) AS BIGINT)").as("onat"))
    (model, backoff, oov)
  }

  /** Per-bigram micro-nat costs under the backoff ladder — stateless,
    * so it runs identically on a batch or streaming corpus (the OOV
    * ceiling attaches via a constant-key equi-join: a stream-static
    * CROSS join is unsupported, the 1-row equi-join is the same plan). */
  private def pplxNats(corpus: DataFrame, model: DataFrame,
                       backoff: DataFrame, oov: DataFrame): DataFrame = {
    // mutation seam (knob OFF in every production plan): the backoff-
    // ladder skip — an unseen bigram with a SEEN context is charged
    // the OOV ceiling instead of ln(1/(c1+V))
    val ladder =
      if (graft.Mutations.on("q309_backoff_skips_context"))
        coalesce(col("mnat"), col("onat"))
      else coalesce(col("mnat"), col("bnat"), col("onat"))
    pplxBigrams(corpus).withColumn("k1", lit(1))
      .join(broadcast(model), Seq("w1", "w2"), "left")
      .join(broadcast(backoff), Seq("w1"), "left")
      .join(broadcast(oov.withColumn("k1", lit(1))), Seq("k1"))
      .select(col("doc_id"), col("lang"),
        (lit(0L) - ladder).as("nat"),
        (lit(0L) - col("onat")).as("ceil_nat"))
  }

  /** The ONE stateful step: per-doc bigram count, exact-integer
    * surprisal sum, and the ceiling — a plain aggregate, so it runs
    * through the streaming state store unchanged. */
  private def pplxPerDoc(nats: DataFrame): DataFrame =
    nats.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bg"), sum(col("nat")).as("sur"),
        max(col("ceil_nat")).as("ceil_nat"))

  /** Self-calibrating banding census over the per-doc table (batch —
    * reads the completed stream table in q310). */
  private def pplxCensus(perDoc0: DataFrame): DataFrame = {
    val perDoc = perDoc0.withColumn("mnat_tok", expr("sur DIV n_bg"))
    // the fluent anchor: the train slice's own token-weighted mean
    // surprisal under its own model (self-perplexity)
    val trm = perDoc.filter(col("lang") === "en")
      .agg(expr("sum(sur) DIV sum(n_bg)").as("trm"))
    // greatest(..., 0): sub-anchor docs clamp to 0 — banding is
    // unaffected (they are b1 either way) and the clamp keeps the
    // integer division on non-negative ground, where Spark's
    // truncating DIV and DuckDB's flooring // agree
    perDoc.crossJoin(broadcast(trm))
      .withColumn("gap_bp", expr(
        "(greatest(mnat_tok - trm, 0L) * 10000) DIV (ceil_nat - trm)"))
      .withColumn("band", expr(
        """CASE WHEN gap_bp < 1250 THEN 'b1_fluent'
                WHEN gap_bp < 3700 THEN 'b2_light_contam'
                WHEN gap_bp < 7500 THEN 'b3_heavy_contam'
                ELSE 'b4_gibberish' END"""))
      .groupBy("lang", "band")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(mnat_tok) DIV count(1)").as("avg_mnat_tok"),
        expr("sum(gap_bp) DIV count(1)").as("avg_gap_bp"))
      .orderBy("lang", "band")
  }

  /** The shared q309/q310 oracle (stream == batch). */
  private val pplxOracleSql: String = {
      def oPlant(mod: Int, offset: Long, tag: String, every: Int): String =
        s"""SELECT doc_id + $offset AS doc_id, '$tag' AS lang,
                   array_to_string(list_transform(range(1, len(ws) + 1),
                     i -> CASE WHEN i % $every = 0
                               THEN substr(md5(ws[i] || '#' ||
                                      CAST(i - 1 AS VARCHAR)), 1, 6)
                               ELSE ws[i] END), ' ') AS text
            FROM (SELECT doc_id,
                         list_filter(str_split(text, ' '), x -> x <> '') AS ws
                  FROM documents WHERE doc_id % 20 = $mod)
            WHERE len(ws) >= 2"""
      s"""WITH corpus AS (SELECT doc_id, lang, text FROM documents
                 UNION ALL ${oPlant(3, 5000000L, "xx_light", 5)}
                 UNION ALL ${oPlant(7, 6000000L, "xx_mix", 3)}
                 UNION ALL ${oPlant(11, 7000000L, "xx_gib", 1)}),
          ws AS (SELECT doc_id, lang,
                        list_filter(str_split(text, ' '),
                                    x -> x <> '') AS w
                 FROM corpus),
          bg AS (SELECT doc_id, lang,
                        w[i] AS w1, w[i + 1] AS w2
                 FROM (SELECT doc_id, lang, w,
                              unnest(generate_series(1, len(w) - 1)) AS i
                       FROM ws WHERE len(w) >= 2)),
          train AS (SELECT * FROM bg WHERE lang = 'en'),
          uni AS MATERIALIZED (SELECT w1, CAST(count(*) AS BIGINT) AS c1
                               FROM train GROUP BY w1),
          big AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
                               FROM train GROUP BY w1, w2),
          vs AS MATERIALIZED (SELECT
                  (SELECT CAST(count(*) AS BIGINT) FROM (
                     SELECT DISTINCT w FROM (
                       SELECT w1 AS w FROM train
                       UNION ALL SELECT w2 FROM train))) AS v,
                  (SELECT CAST(count(*) AS BIGINT) FROM train) AS tt),
          model AS MATERIALIZED (
            SELECT b.w1, b.w2,
                   CAST(round(ln((c2 + 1.0) / (c1 + v)) * 1000000) AS BIGINT)
                     AS mnat
            FROM big b JOIN uni u ON u.w1 = b.w1, vs),
          backoff AS MATERIALIZED (
            SELECT w1,
                   CAST(round(ln(1.0 / (c1 + v)) * 1000000) AS BIGINT) AS bnat
            FROM uni, vs),
          oov AS (SELECT CAST(round(ln(1.0 / (tt + v)) * 1000000) AS BIGINT)
                           AS onat
                  FROM vs),
          perdoc AS MATERIALIZED (SELECT doc_id, lang,
                            CAST(count(*) AS BIGINT) AS n_bg,
                            CAST(sum(0 - COALESCE(m.mnat, k.bnat, o.onat))
                              AS BIGINT) AS sur,
                            CAST(max(0 - o.onat) AS BIGINT) AS ceil_nat
                     FROM bg
                     LEFT JOIN model m ON m.w1 = bg.w1 AND m.w2 = bg.w2
                     LEFT JOIN backoff k ON k.w1 = bg.w1, oov o
                     GROUP BY doc_id, lang),
          trm AS (SELECT CAST(sum(sur) // sum(n_bg) AS BIGINT) AS trm
                  FROM perdoc WHERE lang = 'en'),
          banded AS (SELECT lang, sur // n_bg AS mnat_tok,
                            (greatest(sur // n_bg - trm, 0) * 10000)
                              // (ceil_nat - trm) AS gap_bp
                     FROM perdoc, trm)
          SELECT lang,
                 CASE WHEN gap_bp < 1250 THEN 'b1_fluent'
                      WHEN gap_bp < 3700 THEN 'b2_light_contam'
                      WHEN gap_bp < 7500 THEN 'b3_heavy_contam'
                      ELSE 'b4_gibberish' END AS band,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(mnat_tok) // count(*) AS BIGINT) AS avg_mnat_tok,
                 CAST(sum(gap_bp) // count(*) AS BIGINT) AS avg_gap_bp
          FROM banded
          GROUP BY 1, 2 ORDER BY lang, band"""
  }

  def oracles: Map[String, String] = Map(
    "q340_bootstrap_ci" -> {
      val draw = SamplingPipeline.drawExpr(
        "concat(cast(doc_id as string), '#', cast(r as string))", "boot")
      s"""WITH reps AS (SELECT source, doc_id, n_chars, r
                        FROM documents
                        CROSS JOIN (SELECT unnest(generate_series(0,
                          ${BootstrapReplicas - 1})) AS r)),
          drawn AS (SELECT source, r, n_chars, $draw AS drw FROM reps),
          wtab AS (SELECT source, r, n_chars, $PoissonCase AS w FROM drawn),
          est AS (SELECT source, r,
                    CASE WHEN sum(w) = 0 THEN CAST(0 AS BIGINT)
                         ELSE CAST((sum(w * n_chars) * 1000000) // sum(w)
                                AS BIGINT) END AS est_ppm
                  FROM wtab GROUP BY source, r),
          ranked AS (SELECT source, est_ppm,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY est_ppm, r) AS rn
                     FROM est),
          ci AS (SELECT source,
                   max(CASE WHEN rn = 2 THEN est_ppm END) AS lo_ppm,
                   max(CASE WHEN rn = ${BootstrapReplicas - 1}
                       THEN est_ppm END) AS hi_ppm
                 FROM ranked GROUP BY source),
          pt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST((sum(n_chars) * 1000000) // count(*) AS BIGINT)
                     AS point_ppm
                 FROM documents GROUP BY source)
          SELECT pt.source, n_docs, point_ppm, lo_ppm, hi_ppm,
                 hi_ppm - lo_ppm AS width_ppm
          FROM pt JOIN ci ON ci.source = pt.source
          ORDER BY pt.source"""
    },

    "q325_ranking_auc" ->
      s"""WITH $HexScoredSql,
          tie AS (
            SELECT documents.doc_id + 8800000 AS doc_id,
                   array_to_string(str_split(text, ' ')[1:19], ' ') || ' '
                   || substring(md5('tie:' || CAST(documents.doc_id AS VARCHAR)),
                                1, 10) AS text
            FROM documents
            WHERE documents.doc_id % 17 = 9
              AND len(str_split(text, ' ')) >= 19
            UNION ALL
            SELECT documents.doc_id + 9300000 AS doc_id,
                   array_to_string(str_split(text, ' ')[1:19], ' ') || ' '
                   || substring(md5('tie:' || CAST(documents.doc_id AS VARCHAR)),
                                1, 10) AS text
            FROM documents
            WHERE documents.doc_id % 17 = 2
              AND len(str_split(text, ' ')) >= 19),
          tsc AS (SELECT doc_id,
                    CAST(CASE WHEN doc_id >= 9100000 THEN 1 ELSE 0 END
                      AS BIGINT) AS bad,
                    $OHexPred AS pred_bp
                  FROM (SELECT doc_id,
                          list_filter(str_split(text, ' '), w -> w <> '') AS ws
                        FROM tie)),
          allsc AS (SELECT doc_id, bad, pred_bp FROM binned
                    UNION ALL SELECT doc_id, bad, pred_bp FROM tsc),
          sp AS (SELECT bad, pred_bp,
                   unnest(['all', CASE WHEN doc_id % 2 = 0
                                       THEN 'even' ELSE 'odd' END]) AS split
                 FROM allsc),
          bu AS (SELECT split, pred_bp,
                        CAST(sum(bad) AS BIGINT) AS n1,
                        CAST(sum(1 - bad) AS BIGINT) AS n0
                 FROM sp GROUP BY 1, 2),
          cb AS (SELECT *, CAST(COALESCE(sum(n0) OVER (PARTITION BY split
                   ORDER BY pred_bp ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n0_below
                 FROM bu),
          u AS (SELECT split, n1, n0,
                       n1 * 2 * n0_below + n1 * n0 AS u2
                FROM cb)
          SELECT split, CAST(sum(n1) AS BIGINT) AS n_pos,
                 CAST(sum(n0) AS BIGINT) AS n_neg,
                 count(*) AS n_scores,
                 CAST((CAST(sum(u2) AS BIGINT) * 10000)
                   // (2 * CAST(sum(n1) AS BIGINT) * CAST(sum(n0) AS BIGINT))
                   AS BIGINT) AS auc_bp
          FROM u GROUP BY split ORDER BY split""",

    "q323_calibration_ece" ->
      s"""WITH $HexScoredSql,
          train AS (SELECT bin,
                           CAST(sum(bad) * 10000 // count(*) AS BIGINT)
                             AS rate_bp
                    FROM binned WHERE doc_id % 2 = 0 GROUP BY bin),
          ev AS (
            SELECT bad, arm, p,
                   least(p // 1000, 9) AS pbin
            FROM (SELECT b.bad, u.arm,
                         CASE WHEN u.arm = 'raw' THEN b.pred_bp
                              ELSE COALESCE(t.rate_bp, b.pred_bp) END AS p
                  FROM binned b
                  LEFT JOIN train t ON t.bin = b.bin
                  CROSS JOIN (SELECT 'raw' AS arm
                              UNION ALL SELECT 'recalibrated') u
                  WHERE b.doc_id % 2 = 1)),
          per_bin AS (
            SELECT arm, pbin, count(*) AS n_docs,
                   CAST(sum(p) // count(*) AS BIGINT) AS avg_pred_bp,
                   CAST(sum(bad) * 10000 // count(*) AS BIGINT)
                     AS actual_bad_bp
            FROM ev GROUP BY arm, pbin),
          gaps AS (SELECT *, abs(avg_pred_bp - actual_bad_bp) AS gap_bp
                   FROM per_bin),
          ece AS (SELECT arm,
                         CAST(sum(n_docs * gap_bp) // sum(n_docs) AS BIGINT)
                           AS ece_bp
                  FROM gaps GROUP BY arm)
          SELECT g.arm, g.pbin, g.n_docs, g.avg_pred_bp, g.actual_bad_bp,
                 g.gap_bp, e.ece_bp
          FROM gaps g JOIN ece e USING (arm)
          ORDER BY g.arm, g.pbin""",

    "q217_token_budget" ->
      """WITH per AS (SELECT source,
              CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS src_tokens,
              count(*) AS n_docs,
              CAST(sum(CASE WHEN len(str_split(text, ' ')) >= 30
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
            FROM documents GROUP BY source),
          pr AS (SELECT *, (n_ok * 10000) // n_docs AS priority_bp FROM per),
          tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS tt FROM pr),
          cum AS (SELECT pr.*, (tt * 6) // 10 AS budget,
                    coalesce(sum(src_tokens) OVER (
                      ORDER BY priority_bp DESC, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_prev
                  FROM pr CROSS JOIN tot)
          SELECT source, priority_bp, src_tokens,
                 CAST(greatest(0, least(src_tokens, budget - cum_prev))
                   AS BIGINT) AS taken_tokens,
                 CASE WHEN greatest(0, least(src_tokens, budget - cum_prev))
                        = src_tokens THEN 'full'
                      WHEN greatest(0, least(src_tokens, budget - cum_prev))
                        > 0 THEN 'partial'
                      ELSE 'excluded' END AS status
          FROM cum ORDER BY priority_bp DESC, source""",

    "q199_dsir_importance" ->
      s"""WITH tok AS (SELECT doc_id, lang,
                              unnest(str_split(text, ' ')) AS word
                       FROM documents),
          tokb AS (SELECT doc_id, lang,
                          (${graft.ops.oMd5Bits32("md5(word)")}) % $DsirBuckets AS b
                   FROM tok),
          prof AS (SELECT b, count(*) AS cr,
                          count(CASE WHEN lang = 'en' THEN 1 END) AS ct
                   FROM tokb GROUP BY b),
          totals AS (SELECT count(*) AS rr,
                            count(CASE WHEN lang = 'en' THEN 1 END) AS tt
                     FROM tokb),
          lam AS (SELECT b,
                         CAST(round((ln((ct + 1.0) / (tt + $DsirBuckets.0))
                                     - ln((cr + 1.0) / (rr + $DsirBuckets.0)))
                                    * 1000000) AS BIGINT) AS lam_fp
                  FROM prof CROSS JOIN totals),
          docb AS (SELECT doc_id, lang, b, count(*) AS n_db
                   FROM tokb GROUP BY doc_id, lang, b)
          SELECT doc_id, lang,
                 CAST(CAST(SUM(n_db * lam_fp) AS BIGINT) AS DOUBLE) / 1e6
                   AS weight
          FROM docb JOIN lam USING (b)
          GROUP BY doc_id, lang
          ORDER BY weight DESC, doc_id LIMIT $DsirKeep""",

    "q200_label_centroids" ->
      """WITH px AS (SELECT label,
                            unnest(generate_series(1, len(embedding))) AS pos,
                            embedding
                     FROM embeddings),
          comp AS (SELECT label, pos,
                          CAST(SUM(CAST(round(
                                 CAST(embedding[pos] AS DOUBLE) * 1000000)
                               AS BIGINT)) AS BIGINT) AS s_fp
                   FROM px GROUP BY label, pos),
          nrm AS (SELECT label,
                         sqrt(CAST(SUM(CAST(s_fp AS DECIMAL(19,0))
                                       * CAST(s_fp AS DECIMAL(19,0)))
                                   AS DOUBLE)) AS nn
                  FROM comp GROUP BY label),
          pairs AS (SELECT a.label AS label_a, b.label AS label_b,
                           SUM(CAST(a.s_fp AS DECIMAL(19,0))
                               * CAST(b.s_fp AS DECIMAL(19,0))) AS dot
                    FROM comp a JOIN comp b
                      ON a.pos = b.pos AND a.label < b.label
                    GROUP BY a.label, b.label)
          SELECT label_a, label_b,
                 round(CAST(dot AS DOUBLE) / (na.nn * nb.nn), 6) AS cos_sim
          FROM pairs
          JOIN nrm na ON na.label = label_a
          JOIN nrm nb ON nb.label = label_b
          ORDER BY label_a, label_b""",

    "q208_stream_corpus_report" ->
      """WITH base AS (SELECT source,
                              count(*) AS n_docs,
                              CAST(SUM(len(str_split(text, ' '))) AS BIGINT)
                                AS total_tokens,
                              count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
                              CAST(SUM(n_chars) AS BIGINT) AS sum_chars
                       FROM documents GROUP BY source),
          lc AS (SELECT source, lang, count(*) AS c
                 FROM documents GROUP BY source, lang),
          ent AS (SELECT source,
                         CAST(SUM(CAST(round(
                                -(CAST(c AS DOUBLE) / tot)
                                * ln(CAST(c AS DOUBLE) / tot) * 1000000)
                              AS BIGINT)) AS BIGINT) AS ent_fp
                  FROM (SELECT source, lang, c,
                               SUM(c) OVER (PARTITION BY source) AS tot
                        FROM lc)
                  GROUP BY source)
          SELECT source, n_docs, total_tokens,
                 CAST(n_en AS DOUBLE) / n_docs AS pct_en,
                 CAST(sum_chars AS DOUBLE) / n_docs AS mean_chars,
                 CAST(ent_fp AS DOUBLE) / 1e6 AS lang_entropy
          FROM base JOIN ent USING (source)
          ORDER BY source""",

    "q203_corpus_report" ->
      """WITH base AS (SELECT source,
                              count(*) AS n_docs,
                              CAST(SUM(len(str_split(text, ' '))) AS BIGINT)
                                AS total_tokens,
                              count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
                              CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                              count(DISTINCT md5(text)) AS n_distinct
                       FROM documents GROUP BY source),
          lc AS (SELECT source, lang, count(*) AS c
                 FROM documents GROUP BY source, lang),
          ent AS (SELECT source,
                         CAST(SUM(CAST(round(
                                -(CAST(c AS DOUBLE) / tot)
                                * ln(CAST(c AS DOUBLE) / tot) * 1000000)
                              AS BIGINT)) AS BIGINT) AS ent_fp
                  FROM (SELECT source, lang, c,
                               SUM(c) OVER (PARTITION BY source) AS tot
                        FROM lc)
                  GROUP BY source)
          SELECT source, n_docs, total_tokens,
                 CAST(n_en AS DOUBLE) / n_docs AS pct_en,
                 CAST(sum_chars AS DOUBLE) / n_docs AS mean_chars,
                 n_docs - n_distinct AS dup_docs,
                 CAST(ent_fp AS DOUBLE) / 1e6 AS lang_entropy
          FROM base JOIN ent USING (source)
          ORDER BY source""",

    // q309: the same micro-nat quantization at the model-table grain
    // (round(ln·1e6) → BIGINT, the q199 discipline) so the per-doc sum
    // is exact-integer in both engines; the backoff ladder mirrors the
    // Spark coalesce(mnat, bnat, onat), the plants mirror the Spark
    // positional md5-gibberish transform (DuckDB range() is 1-based
    // list here vs Spark transform's 0-based index — the md5 salt uses
    // the 0-based value on both sides).
    "q309_bigram_perplexity" -> pplxOracleSql,
    // q310 streams the same scoring — stream == batch, graded
    // against the IDENTICAL oracle
    "q310_stream_perplexity" -> pplxOracleSql
  )
}
