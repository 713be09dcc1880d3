package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond dedup: within-document
  * repetition filtering (the Gopher-style quality gate), benchmark
  * contamination detection (n-gram overlap against a held-out eval set),
  * and PII redaction (regex scrub + audit counts).
  *
  * 100 TB design notes:
  *  - repetition is a per-document scan → two partial-aggregating shuffles
  *    keyed on (doc_id[, gram]) — high cardinality, embarrassingly
  *    parallel.
  *  - contamination joins corpus 8-grams against BENCHMARK 8-grams — the
  *    bench side is the small one (eval suites are thousands of docs, the
  *    corpus is billions), and boilerplate 8-grams shared by more than
  *    [[CurationQueries.BenchGramCap]] benchmark docs are dropped before
  *    the join (the stop-gram practice of decontamination pipelines;
  *    without it one license header fans every corpus doc into every
  *    bench doc). The cap rides the bench side's own aggregation — no
  *    extra shuffle of the (huge) corpus side.
  *  - redaction is map-only: regexp over each row, no shuffle at all.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Max distinct benchmark docs an 8-gram may appear in before it is
    * considered boilerplate and excluded from contamination matching.
    * Shared by the Spark operator AND the oracle SQL so the two can
    * never drift. */
  /** q334/q336 shared seam: the mojibake plant (classes keyed by doc_id
    * residue mod 11 — the fixture is verified ASCII-clean) and the
    * text-reading detectors (U+FFFD probe, C0-control regex, non-ASCII
    * codepoint count), classified by precedence. Wholly map-only. The
    * [[graft.Mutations]] "q334_nonascii_threshold" knob (foreign-script
    * cut at >= 2 instead of >= 1 — every single-homoglyph doc passes as
    * clean) lives HERE, so the batch census and the streaming ingest
    * gate red-case together. Expects (doc_id, source, text); returns
    * (doc_id, source, n_nonascii, cls). */
  private def encodingScored(docs: DataFrame): DataFrame = {
    val thr = if (graft.Mutations.on("q334_nonascii_threshold")) 2 else 1
    val planted = docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 11 === 3, concat(col("text"), lit(" \uFFFD")))
        .when(col("doc_id") % 11 === 5, concat(col("text"), lit("\u0007")))
        .when(col("doc_id") % 11 === 7 && instr(col("text"), "a") > 0,
          expr("concat(substring(text, 1, instr(text, 'a') - 1), 'а', " +
            "substring(text, instr(text, 'a') + 1))"))
        .otherwise(col("text")).as("text"))
    planted.select(col("doc_id"), col("source"),
        (instr(col("text"), "\uFFFD") > 0).as("has_repl"),
        col("text").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").as("has_ctl"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[^\\x00-\\x7F]", "")))
          .cast("long").as("n_nonascii"))
      .select(col("doc_id"), col("source"), col("n_nonascii"),
        when(col("has_repl"), "c1_replacement")
          .when(col("has_ctl"), "c2_control")
          .when(col("n_nonascii") >= thr, "c3_foreign_script")
          .otherwise("c0_clean").as("cls"))
  }

  /** The per-source integer-bp share over a completed (source, cls,
    * n_docs, n_nonascii_chars) census — shared by q334 (inline) and
    * q336 (post-stream, over the completed table). */
  private def encodingShare(census: DataFrame): DataFrame =
    census
      .withColumn("src_total", sum(col("n_docs"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("source")))
      .withColumn("share_bp", expr("n_docs * 10000 DIV src_total"))
      .drop("src_total")
      .orderBy("source", "cls")

  private[ext] val BenchGramCap = 100

  /** SHARED BENCHMARK-SUITE ARTIFACT (r17 optimization): the capped
    * bench gram table + its bloom filter are literally described as "an
    * OFFLINE artifact" in q333's scaladoc — yet q331 (batch) and q333
    * (ingest twin) each rebuilt the window-capped gram table and the
    * two eager bloom-build actions per pass. One pinned table + one
    * built filter per (session, dataset); the build is KNOB-FREE (the
    * q331_probe_key_mismatch knob lives in the PROBE expression,
    * downstream of the artifact), so no knob key. */
  private val decontamCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String),
    (GraphOps.Pinned, org.apache.spark.util.sketch.BloomFilter)]()

  /** Free the pinned bench gram table and forget the artifact. */
  def clearDecontamCache(): Unit = {
    decontamCache.values().forEach(_._1.free())
    decontamCache.clear()
  }

  /** (capped bench gram table, bloom over xxhash64 of its distinct
    * grams) — q331's build, verbatim, built once per session. */
  private def benchBloomArtifact(s: SparkSession, d: String)
      : (DataFrame, org.apache.spark.util.sketch.BloomFilter) = {
    GraphOps.sweepStopped(decontamCache)(_._1)
    val (p, bf) = decontamCache.computeIfAbsent((s, d), _ => {
      val benchDocs = Tables.documents(s, d).select("doc_id", "text")
        .filter(col("doc_id") % 97 === 0)
      val bw = Window.partitionBy("g")
      val bc = GraphOps.pin(eightGrams(benchDocs)
        .withColumn("bn", count(lit(1)).over(bw))
        .filter(col("bn") <= BenchGramCap)
        .select(col("g"), col("doc_id").as("bench_id")))
      val gs = bc.df.select(xxhash64(col("g")).as("gh")).distinct()
      (bc, gs.stat.bloomFilter("gh", math.max(1000L, gs.count()), 0.01))
    })
    (p.df, bf)
  }

  /** `idCol + offset` with the disjointness invariant guarded IN-PLAN
    * (r15 advice): planted ids assume no organic doc_id ever reaches the
    * offset. On a rescaled fixture that crossed it, planted rows would
    * silently collide with organic ones IDENTICALLY on both engine
    * sides, so the oracle comparison could not catch the corruption.
    * assert_true makes the run fail loudly instead, costs one comparison
    * per planted row, and keeps the build lazy (no driver-side max()
    * job — the q101 guard spec counts build jobs). */
  private def plantedId(idCol: Column, offset: Long): Column =
    when(assert_true(idCol < offset,
      lit(s"organic doc_id reached the planted-id offset $offset — " +
        "planted rows would silently merge; rescale the offset")).isNull,
      idCol + offset)

  /** q335/q339's shared prompt log: instruction templates (doc_id mod 3)
    * prepended to per-doc payloads, plus exact re-submissions
    * (doc_id ≡ 2 mod 13, planted at +5M — the retry/regenerate
    * pattern). Returns (doc_id, toks, n_toks). */
  private def prefixCachePrompts(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      concat(
        when(col("doc_id") % 3 === 0,
          lit("please summarize the following document for me : "))
          .when(col("doc_id") % 3 === 1,
            lit("please translate the following text into french : "))
          .otherwise(lit("")),
        col("text")).as("prompt"))
    val resubmits = base.filter(col("doc_id") % 13 === 2)
      .select(plantedId(col("doc_id"), 5000000L).as("doc_id"), col("prompt"))
    base.unionByName(resubmits)
      .select(col("doc_id"), split(col("prompt"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_toks"))
  }

  private val PrefixCacheKs = Seq(4, 8, 16)

  /** The (k, prefix) cache-group census — map-side explode over the
    * swept depths, then ONE (k, pfx)-keyed aggregation. This is the
    * stateless+stateful split q339 streams: the explode rides the
    * micro-batch map, the groupBy is the state store. */
  private def prefixGroups(prompts: DataFrame): DataFrame =
    prompts.select(col("n_toks"),
        explode(array(PrefixCacheKs.map(k =>
          struct(lit(k).as("k"),
            when(col("n_toks") >= k,
              concat_ws(" ", expr(s"slice(toks, 1, $k)"))).as("pfx"))): _*))
          .as("x"))
      .select(col("x.k").as("k"), col("x.pfx").as("pfx"), col("n_toks"))
      .filter(col("pfx").isNotNull)
      .groupBy("k", "pfx")
      .agg(count(lit(1)).as("n"), sum(col("n_toks")).as("grp_toks"))

  /** ONE DuckDB oracle for q335 AND its streaming twin q339 — the
    * streamed census over the finite source must equal the batch
    * report row for row. */
  private val prefixCacheOracle: String = {
    def arm(k: Int): String =
      s"""SELECT $k AS k,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS n_prompts,
             CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
               AS n_shared_prompts,
             CAST(sum(CASE WHEN n >= 2 THEN (n - 1) * $k ELSE 0 END)
               AS BIGINT) AS cacheable_tokens,
             CAST(sum(CASE WHEN n >= 2 THEN (n - 1) * $k ELSE 0 END)
               * 10000 // sum(grp_toks) AS BIGINT) AS hit_bp
          FROM (SELECT array_to_string(toks[1:$k], ' ') AS pfx,
                       count(*) AS n, sum(n_toks) AS grp_toks
                FROM ptoks WHERE n_toks >= $k GROUP BY 1)"""
    s"""WITH base AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0
                 THEN 'please summarize the following document for me : '
                      || text
                 WHEN doc_id % 3 = 1
                 THEN 'please translate the following text into french : '
                      || text
                 ELSE text END AS prompt
          FROM documents),
        prompts AS (SELECT doc_id, prompt FROM base
                    UNION ALL
                    SELECT doc_id + 5000000 AS doc_id, prompt FROM base
                    WHERE doc_id % 13 = 2),
        ptoks AS (SELECT doc_id, str_split(prompt, ' ') AS toks,
                         CAST(len(str_split(prompt, ' ')) AS BIGINT)
                           AS n_toks
                  FROM prompts)
        ${arm(4)} UNION ALL ${arm(8)} UNION ALL ${arm(16)}
        ORDER BY k"""
  }

  /** Per-depth cache report over [[prefixGroups]] output — carries the
    * q335 first-occupant knob (the ONE seam; q339 red-cases with it). */
  private def prefixCacheReport(groups: DataFrame): DataFrame = {
    val hitTokens =
      if (graft.Mutations.on("q335_cache_counts_first")) "n" else "n - 1"
    groups.groupBy("k")
      .agg(
        count(lit(1)).as("n_groups"),
        sum(col("n")).as("n_prompts"),
        sum(when(col("n") >= 2, col("n")).otherwise(0L))
          .as("n_shared_prompts"),
        sum(when(col("n") >= 2, expr(s"($hitTokens) * k"))
          .otherwise(0L)).as("cacheable_tokens"),
        sum(col("grp_toks")).as("total_tokens"))
      .select(col("k").cast("int").as("k"), col("n_groups"), col("n_prompts"),
        col("n_shared_prompts"), col("cacheable_tokens"),
        expr("cacheable_tokens * 10000 DIV total_tokens").as("hit_bp"))
      .orderBy("k")
  }

  /** Shared-count threshold: a (corpus doc, bench doc) pair with at least
    * this many distinct common 8-grams is flagged as contaminated. */
  private[ext] val ContaminationMinOverlap = 3

  /** q311's per-registered-domain document cap. */
  private[graft] val DomainDocCap = 10

  /** q316's suffix-truncation cap: the longest exact repeat the detector
    * measures before saturating (a ≥-threshold gate, not a ruler). */
  private[graft] val RepeatLcpCap = 64

  /** q311's deterministic URL synthesis from (source, doc_id) — ONE SQL
    * fragment evaluated verbatim by BOTH engines (Spark `expr` and the
    * DuckDB oracle), so the synthetic crawl can never drift between
    * them: ~|sources| registered domains spread over four suffixes
    * (two of them two-level public suffixes), three subdomain variants,
    * and a two-segment path. */
  private[ext] val UrlSynthSql: String =
    """concat('https://',
         CASE doc_id % 3 WHEN 1 THEN 'www.' WHEN 2 THEN 'blog.' ELSE '' END,
         'd', substring(md5(concat('dom:', source)), 1, 6), '.',
         CASE WHEN substring(md5(source), 1, 1) IN ('0','1','2','3') THEN 'com'
              WHEN substring(md5(source), 1, 1) IN ('4','5','6','7') THEN 'org'
              WHEN substring(md5(source), 1, 1) IN ('8','9','a','b') THEN 'co.uk'
              ELSE 'com.au' END,
         '/p/', CAST(doc_id % 100 AS STRING), '/', CAST(doc_id AS STRING))"""

  /** q311/q315's blocklist membership predicate over a registered
    * domain — ONE definition feeding the batch blocklist TABLE, the
    * streaming map-side flag, and (inlined) the oracle SQL. */
  private[ext] val BlockedPredSql: String =
    "substring(md5(concat('blk:', reg_domain)), 1, 1) IN ('0','1','2','3')"

  /** q311/q315's shared STATELESS URL pipeline: synthesize
    * ([[UrlSynthSql]]), parse the host, reduce to the registered domain
    * (public-suffix aware), classify the suffix, flag blocklist
    * membership, and attach the seeded cap draw. Every column is
    * map-side computable — the same definition runs on the batch frame
    * (q311) and the streaming one (q315), so the two graded dispositions
    * can never drift. Carries the q311 mutation seam: with the knob on,
    * the registered domain degrades to last-two-labels. */
  private[ext] def urlParsed(docs: DataFrame): DataFrame = {
    // mutation seam (knob OFF in every production plan): the public-
    // suffix list ignored — registered domain = last two labels, so
    // every .co.uk / .com.au publisher merges into ONE pseudo-domain
    val regDomain =
      if (graft.Mutations.on("q311_suffix_list_ignored"))
        expr("concat_ws('.', slice(labels, size(labels) - 1, 2))")
      else expr(
        """CASE WHEN concat_ws('.', slice(labels, size(labels) - 1, 2))
                     IN ('co.uk', 'com.au')
                THEN concat_ws('.', slice(labels, size(labels) - 2, 3))
                ELSE concat_ws('.', slice(labels, size(labels) - 1, 2))
           END""")
    docs.select(col("doc_id"), expr(UrlSynthSql).as("url"))
      .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/]+)/", 1))
      .withColumn("labels", split(col("host"), "\\."))
      .withColumn("reg_domain", regDomain)
      .withColumn("suffix", expr(
        """CASE WHEN concat_ws('.', slice(labels, size(labels) - 1, 2))
                     IN ('co.uk', 'com.au')
                THEN concat_ws('.', slice(labels, size(labels) - 1, 2))
                ELSE element_at(labels, -1) END"""))
      .withColumn("draw",
        expr(SamplingPipeline.drawExpr("doc_id", "urlcap")).cast("long"))
      .select("doc_id", "host", "reg_domain", "suffix", "draw")
  }

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "555-[0-9]{4}"

  /** Raw word-8-gram stream of (doc_id, text) rows — duplicates included;
    * map-only. The corpus side joins this stream directly (no corpus-wide
    * distinct shuffle) and dedups AFTER the join, where rows are
    * match-bounded. */
  private def eightGramsRaw(df: DataFrame): DataFrame =
    df.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 8)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("words")) - 7)).as("pos"), col("words"))
      .select(col("doc_id"),
        expr("concat_ws(' ', slice(words, pos, 8))").as("g"))

  /** Distinct word-8-gram set per doc (the small benchmark side, where
    * the stop-gram cap needs true per-gram doc counts). */
  private def eightGrams(df: DataFrame): DataFrame = eightGramsRaw(df).distinct()

  /** [[eightGramsRaw]] with the 1-based word POSITION kept — the q330
    * span-surgery variant of the q101 gram stream (same windowing, same
    * ≥8-word floor; a construction change lands in both or neither). */
  private def eightGramsPos(df: DataFrame): DataFrame =
    df.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 8)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("words")) - 7)).as("pos"), col("words"))
      .select(col("doc_id"), col("pos"),
        expr("concat_ws(' ', slice(words, pos, 8))").as("g"))

  /** Guard-mode (opt-in) cache of the capped benchmark 8-gram side: ONE
    * persisted instance per (session, data dir), reused across query
    * builds — without this every build stacked a fresh MEMORY_AND_DISK
    * entry that nothing ever unpersisted. The guard count is stored with
    * the frame so later builds re-evaluate the broadcast-vs-fallback
    * decision against the CURRENT cap conf without re-running the job. */
  private val guardCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Long)]()

  private def guardedBenchSide(s: SparkSession, d: String,
                               benchCapped: DataFrame): DataFrame = {
    val (cached, n) = guardCache.computeIfAbsent((s, d), _ => {
      val c = benchCapped.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (c, c.count())
    })
    val maxBroadcastGrams =
      s.conf.get("graft.contamination.maxBroadcastGrams", "20000000").toLong
    if (n <= maxBroadcastGrams) broadcast(cached)
    else {
      log.warn(
        s"benchmark 8-gram set has $n rows (> $maxBroadcastGrams); " +
          "falling back to an unhinted join for contamination matching")
      cached
    }
  }

  /** Unpersist and drop every guard-mode cache entry — for tests and for
    * long-lived sessions rotating to a new benchmark set. */
  def clearGuardCache(): Unit = {
    import scala.jdk.CollectionConverters._
    guardCache.values.asScala.foreach(_._1.unpersist(blocking = false))
    guardCache.clear()
  }

  /** q216's boilerplate guard: grams present in more than this many
    * sources are dropped before the source-pair self-join. */
  private[ext] val SourceGramCap = 16

  private val eightGramsSql =
    """tok8 AS (SELECT doc_id, str_split(text, ' ') AS words FROM corpus
                WHERE len(str_split(text, ' ')) >= 8),
       g8 AS (SELECT DISTINCT doc_id,
                     array_to_string(words[pos:pos+7], ' ') AS g
              FROM (SELECT doc_id, words,
                           unnest(generate_series(1, len(words) - 7)) AS pos
                    FROM tok8))"""

  def queries: Map[String, Q] = Map(
    // URL / DOMAIN CURATION — the front door of every web-crawl corpus
    // (CommonCrawl/C4/RefinedWeb all lead with it): parse each document's
    // URL, reduce the host to its REGISTERED domain (eTLD+1 against a
    // public-suffix list — 'a.blog.co.uk' and 'www.blog.co.uk' are the
    // same publisher; naive last-two-labels would merge every .co.uk
    // site into one), drop documents whose registered domain is on the
    // ops blocklist, and cap the survivors at [[DomainDocCap]] docs per
    // domain by a seeded md5 draw (the anti-SEO-farm measure: one domain
    // must not dominate the corpus). The fixture has no URL column, so —
    // the q238/q309 discipline — URLs derive deterministically from
    // (source, doc_id) IN-QUERY on both engine sides ([[UrlSynthSql]]:
    // ~20 registered domains over 4 suffixes incl. the two-level
    // 'co.uk'/'com.au', 3 subdomain variants, so suffix-list handling,
    // subdomain collapse, blocking, and capping all measurably bite at
    // every scale). Census per suffix: hosts, registered domains, docs,
    // blocked, kept, capped, and the kept doc_id sum — the last pins the
    // EXACT kept set (draw order + tiebreak), not just its size.
    // Scale: URL synthesis + parse + eTLD reduction are map-only string
    // ops; the blocklist derives from a distinct aggregate whose output
    // is |domains| rows (tiny) and joins back broadcast; the per-domain
    // cap is ONE shuffle on reg_domain where the rank≤cap filter becomes
    // a WindowGroupLimit (per-partition top-k BEFORE the exchange — a
    // mega-domain ships cap-sized prefixes per map task, not its full
    // row set); the census is a 4-row aggregate.
    "q311_url_curation" -> ((s, d) => {
      val parsed = urlParsed(Tables.documents(s, d))
      // the production shape: the ops blocklist is a TABLE (here derived
      // from the domain set by the same predicate [[urlParsed]] exposes
      // as a flag) joined broadcast — at 100 TB the list is thousands of
      // rows against billions of documents
      val blocklist = parsed.select("reg_domain").distinct()
        .filter(expr(BlockedPredSql)).withColumn("blocked", lit(true))
      val flagged = parsed.join(broadcast(blocklist), Seq("reg_domain"), "left")
        .withColumn("blocked", coalesce(col("blocked"), lit(false)))
      val totals = flagged.groupBy("suffix")
        .agg(countDistinct(col("host")).as("n_hosts"),
          countDistinct(col("reg_domain")).as("n_domains"),
          count(lit(1)).as("n_docs"),
          sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"))
      // the kept branch filters rank ≤ cap — Catalyst plants a
      // WindowGroupLimit, so each map task ships only a cap-sized prefix
      // per domain into the one reg_domain exchange
      val w = Window.partitionBy("reg_domain").orderBy(
        col("draw"), col("doc_id"))
      val kept = flagged.filter(!col("blocked"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= DomainDocCap)
        .groupBy("suffix")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
      totals.join(kept, Seq("suffix"), "left")
        .select(col("suffix"), col("n_hosts"), col("n_domains"),
          col("n_docs"), col("n_blocked"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_docs") - col("n_blocked") - coalesce(col("n_kept"), lit(0L)))
            .as("n_capped"),
          coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
        .orderBy("suffix")
    }),

    // q311's DOMAIN CAP THROUGH THE STREAMING ENGINE — the disposition
    // applied where a crawl pipeline applies it: at INGEST. The whole
    // URL pipeline ([[urlParsed]]: synthesize, parse, eTLD+1, suffix,
    // draw) is stateless, the blocklist flag is map-side (in production
    // a static broadcast table — [[BlockedPredSql]] stands in for it on
    // the same seam the batch blocklist TABLE derives from), and the
    // ONE stateful operator is a per-domain aggregate through the state
    // store: a count plus a [[graft.functions.TopKAgg]] bounded heap of
    // the [[DomainDocCap]] smallest draws — per-domain state is
    // cap-bounded NO MATTER how many documents a domain ships, which is
    // exactly why the heap aggregate (and not a rank window, which
    // cannot run incrementally) is the streaming shape. The census
    // reads the completed per-domain table (the q220/q310 discipline —
    // a |domains|-row control plane). The draw is seeded md5, so the
    // streamed disposition selects the IDENTICAL kept set as the batch
    // pass: the oracle is q311's census minus the host column, and a
    // spec pins stream == batch row-for-row.
    "q315_stream_domain_cap" -> ((s, d) => {
      val sdocs = graft.streaming.StreamingPipelines.documentsStream(s, d)
        .select("doc_id", "source")
      val parsed = urlParsed(sdocs).withColumn("blocked", expr(BlockedPredSql))
      val perDomain = parsed.groupBy("suffix", "reg_domain", "blocked")
        .agg(count(lit(1)).as("n_docs"),
          graft.functions.TopKAgg.topk(
            (lit(0L) - col("draw")).cast("double"), col("doc_id"),
            DomainDocCap).as("kept"))
      val done = graft.streaming.StreamingPipelines.runToCompletion(s, perDomain)
      done.groupBy("suffix").agg(
          countDistinct(col("reg_domain")).as("n_domains"),
          sum(col("n_docs")).as("n_docs"),
          sum(when(col("blocked"), col("n_docs")).otherwise(0L))
            .as("n_blocked"),
          sum(when(!col("blocked"), size(col("kept")).cast("long"))
            .otherwise(0L)).as("n_kept"),
          sum(when(!col("blocked"),
            expr("aggregate(kept, CAST(0 AS BIGINT), (a, x) -> a + x.id)"))
            .otherwise(0L)).as("kept_id_sum"))
        .select(col("suffix"), col("n_domains"), col("n_docs"),
          col("n_blocked"), col("n_kept"),
          (col("n_docs") - col("n_blocked") - col("n_kept")).as("n_capped"),
          col("kept_id_sum"))
        .orderBy("suffix")
    }),

    // EXACT-REPEAT DETECTOR (suffix-sorted max intra-document repeat) —
    // the Gopher repetition rule done EXACTLY: q100 measures 3-gram
    // duplication RATIOS, this measures the length of the longest
    // substring occurring twice in a document — the classic suffix-array
    // identity max_rep = max adjacent-LCP over the sorted suffix set,
    // computed wholly IN-ROW: suffixes capped at [[RepeatLcpCap]] chars
    // (a repeat longer than the cap reports as the cap — the detector is
    // a ≥-threshold gate, not a measurement past it), `array_sort`, one
    // early-stop fold per adjacent pair. The DuckDB twin exploits that
    // prefix equality is MONOTONE in k: LCP = count of k with equal
    // k-prefixes (no fold needed) — two formulations, one semantics,
    // which is itself part of what the oracle grades. Planted rows
    // (doc_id ≡ 4 mod 9, text ≥ cap chars: the doc's own 80-char prefix
    // appended) saturate the cap while organic text tops out near 24 —
    // the separation the production gate (max_rep ≥ 40) cuts on.
    // Scale: entirely map-side (per-doc in-row work bounded by
    // len·cap); the census is one (source, cls) aggregate; nothing
    // corpus-sized is exchanged at all.
    "q316_exact_repeats" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): the cap
      // fencepost — suffixes truncated one char short, every at-cap
      // repeat under-reports and the saturated plants shift
      val cap =
        if (graft.Mutations.on("q316_lcp_cap_off_by_one")) RepeatLcpCap - 1
        else RepeatLcpCap
      val docs = Tables.documents(s, d).select("doc_id", "source", "text")
      val corpus = docs.select(col("doc_id"), col("source"),
          lit("organic").as("cls"), col("text"))
        .unionByName(docs
          .filter(col("doc_id") % 9 === 4 && length(col("text")) >= 80)
          .select((col("doc_id") + 9000000L).as("doc_id"), col("source"),
            lit("xx_rep").as("cls"),
            concat(col("text"), lit(" "),
              expr("substring(text, 1, 80)")).as("text")))
      val perDoc = corpus.withColumn("sf", expr(
          s"array_sort(transform(sequence(1, length(text)), " +
            s"i -> substring(text, i, $cap)))"))
        .withColumn("max_rep", expr("""
          array_max(transform(sequence(1, size(sf) - 1), p ->
            aggregate(
              sequence(1, least(length(element_at(sf, p)),
                               length(element_at(sf, p + 1)))),
              named_struct('k', CAST(0 AS BIGINT), 'stop', false),
              (acc, i) -> CASE WHEN NOT acc.stop AND
                  substring(element_at(sf, p), i, 1) =
                  substring(element_at(sf, p + 1), i, 1)
                THEN named_struct('k', acc.k + 1L, 'stop', false)
                ELSE named_struct('k', acc.k, 'stop', true) END).k))"""))
        .select("doc_id", "source", "cls", "max_rep")
      perDoc.groupBy("source", "cls")
        .agg(count(lit(1)).as("n_docs"),
          max(col("max_rep")).as("max_max_rep"),
          expr("sum(max_rep) * 100 DIV count(1)").as("avg_rep_x100"),
          sum(when(col("max_rep") >= 20, 1L).otherwise(0L)).as("n_over_20"),
          sum(when(col("max_rep") >= 40, 1L).otherwise(0L)).as("n_over_40"))
        .orderBy("source", "cls")
    }),

    // CORPUS SNAPSHOT DIFF — the crawl-over-crawl CDC a curation team
    // publishes between corpus drops: classify every doc across two
    // snapshots as added / removed / changed / unchanged (content
    // equality by text hash, not mtime) and account the TOKEN delta per
    // class — the number that prices re-tokenization, re-dedup and
    // re-embedding work for the incremental pipeline (only added+changed
    // docs re-enter it). Snapshots derive deterministically from the
    // fixture: A drops doc_id ≡ 7 (mod 10) ("added later"), B drops
    // ≡ 5 (mod 17) ("removed") and appends a revision marker to ≡ 3
    // (mod 13) ("changed"); the residue classes overlap, so the
    // precedence (added/removed outrank changed) is exercised, not
    // assumed.
    // Scale: ONE full-outer hash join on doc_id — the canonical CDC
    // exchange — with md5/token counts computed map-side and the class
    // rollup aggregating to 4 rows; no sort, no second scan.
    "q238_corpus_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val a = docs.filter(col("doc_id") % 10 =!= 7)
      val b = docs.filter(col("doc_id") % 17 =!= 5)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 3, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      def sig(df: DataFrame, h: String, t: String): DataFrame =
        df.select(col("doc_id"), md5(col("text")).as(h),
          size(split(col("text"), " ")).cast("long").as(t))
      sig(a, "ha", "ta").join(sig(b, "hb", "tb"), Seq("doc_id"), "full_outer")
        .withColumn("change_type",
          when(col("ha").isNull, "added")
            .when(col("hb").isNull, "removed")
            .when(col("ha") =!= col("hb"), "changed")
            .otherwise("unchanged"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("ta"), lit(0L))).as("tokens_a"),
          sum(coalesce(col("tb"), lit(0L))).as("tokens_b"),
          sum(coalesce(col("tb"), lit(0L)) - coalesce(col("ta"), lit(0L)))
            .as("token_delta"))
        .orderBy("change_type")
    }),

    // GOLDEN-RECORD SURVIVORSHIP — the master-data-management merge that
    // follows entity resolution (q126 finds the cluster; this builds its
    // one surviving record): per entity and PER FIELD, the latest
    // non-null version wins — partial updates (a version touching only
    // lang, another only source) merge instead of clobbering, which is
    // what separates field-level survivorship from q154's whole-row
    // last-writer-wins. Each field is one filtered struct-max
    // (max over (ts, value) where value non-null — ts is unique per
    // entity version, so the winner is deterministic); all fields and
    // the version count ride a single hash aggregate on entity.
    "q176_golden_record" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val v0 = docs.select(col("doc_id").as("entity"), lit(0L).as("ts"),
        col("lang"), col("source"), col("n_chars"))
      val v1 = docs.filter(col("doc_id") % 4 === 1)
        .select(col("doc_id").as("entity"), lit(1L).as("ts"),
          lit("xx").as("lang"), lit(null).cast("string").as("source"),
          lit(null).cast("long").as("n_chars"))
      val v2 = docs.filter(col("doc_id") % 6 === 2)
        .select(col("doc_id").as("entity"), lit(2L).as("ts"),
          lit(null).cast("string").as("lang"),
          concat(col("source"), lit("_v2")).as("source"),
          (col("n_chars") + 5).as("n_chars"))
      def latest(c: String) =
        max(when(col(c).isNotNull, struct(col("ts"), col(c).as("v"))))
          .getField("v")
      v0.unionByName(v1).unionByName(v2)
        .groupBy("entity")
        .agg(latest("lang").as("lang"), latest("source").as("source"),
          latest("n_chars").as("n_chars"), count(lit(1)).as("n_versions"))
        .orderBy("entity")
    }),

    // Within-document repetition: fraction of word-3-gram occurrences
    // that are repeats of an earlier 3-gram in the same doc — the
    // boilerplate/spam signal the Gopher quality rules filter on.
    // PER-SUBGROUP ADAPTIVE QUALITY THRESHOLD — a fixed global cutoff
    // over-filters whichever language scores low (the classic curation
    // bias); the production fix is a PER-LANG percentile threshold.
    // Scale shape: the exact p25 is computed WITHOUT sorting documents —
    // scores live in the bounded fixed-point domain [0, 10000] bp, so an
    // aggregate to (lang, score) counts (map-side partials, ≤ langs ×
    // 10001 rows) plus a window over that control-plane-sized histogram
    // yields the exact rank-⌈N/4⌉ threshold; docs then probe the ~5-row
    // threshold table by broadcast. Score = lexical diversity
    // (distinct/total tokens, truncating DIV).
    "q185_adaptive_threshold" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"), col("lang"),
          expr("(size(array_distinct(ws)) * 10000) DIV size(ws)").as("score_bp"))
      val hist = scored.groupBy("lang", "score_bp").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("lang").orderBy("score_bp")
      val thr = hist
        .withColumn("cum", sum("c").over(w))
        .withColumn("n", sum("c").over(Window.partitionBy("lang")))
        .filter(col("cum") >= expr("(n + 3) DIV 4") &&
          col("cum") - col("c") < expr("(n + 3) DIV 4"))
        .select(col("lang"), col("score_bp").as("threshold_bp"),
          col("n").as("n_docs"))
      scored.join(broadcast(thr), "lang")
        .groupBy(col("lang"), col("n_docs"), col("threshold_bp"))
        .agg(sum(when(col("score_bp") >= col("threshold_bp"), 1L)
            .otherwise(0L)).as("n_kept"),
          sum(when(col("score_bp") >= col("threshold_bp"), 0L)
            .otherwise(1L)).as("n_dropped"))
        .select("lang", "n_docs", "threshold_bp", "n_kept", "n_dropped")
        .orderBy("lang")
    }),

    // TOKENIZER VOCABULARY COVERAGE — the OOV-rate filter every
    // tokenizer-bound pipeline runs before training: build the vocab as
    // the corpus's top-16 tokens by frequency (count desc, token asc —
    // a total order, so the cut is deterministic), then score every doc
    // by its out-of-vocabulary TOKEN rate in basis points and gate at
    // ≤ 3000. Scale shape: the vocab is a TakeOrderedAndProject over
    // the wordcount aggregate (partial top-k per partition, k rows to
    // the driver-side sort), then broadcasts into a map-side probe —
    // the corpus stream shuffles once, keyed on doc_id, with partial
    // aggregation. Rates are truncating-DIV fixed point (no float).
    "q180_oov_rate" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val vocab = words.groupBy("word").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("word")).limit(16)
        .select(col("word"), lit(1).as("in_vocab"))
      words.join(broadcast(vocab), Seq("word"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          expr("(n_oov * 10000) DIV n_tokens").as("oov_bp"),
          when(expr("(n_oov * 10000) DIV n_tokens") <= 3000, 1L)
            .otherwise(0L).as("kept"))
        .orderBy("doc_id")
    }),

    "q100_repetition" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("words")) - 2)).as("pos"), col("words"))
        .select(col("doc_id"),
          expr("concat_ws(' ', slice(words, pos, 3))").as("g"))
      // two-phase: (doc, gram) partial counts combine map-side, then the
      // per-doc rollup reduces an already-shrunk stream
      g.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          round(lit(1) - col("n_distinct") / col("n_grams"), 6).as("dup_ratio"))
        .withColumn("verdict",
          when(col("dup_ratio") > 0.2, "repetitive").otherwise("ok"))
        .orderBy("doc_id")
    }),

    // Benchmark contamination: corpus docs sharing >= ContaminationMinOverlap
    // distinct 8-grams with a benchmark doc. Benchmark = docs with
    // doc_id % 97 == 0; the corpus side plants a near-copy of each bench
    // doc (first word dropped, doc_id + 3M) among the clean docs, so the
    // detector must flag exactly the planted leaks and none of the
    // organic text.
    // SPAN-LEVEL DECONTAMINATION — the surgical upgrade to q101's
    // doc-level verdict: production pipelines don't always drop a
    // contaminated doc wholesale, they excise the overlapping SPAN and
    // keep the rest. Matched 8-gram POSITIONS (the [[eightGramsPos]]
    // twin of q101's gram stream, against the same stop-gram-capped
    // bench side) merge into maximal spans by the gaps-and-islands
    // window — a match at pos covers words [pos, pos+7], spans merge
    // while the next match starts within prev+8 (overlap or adjacency;
    // width is fixed so ends are monotone in pos and one lag suffices)
    // — and the census accounts the removal per class: the planted
    // contaminated docs (q101's +3M first-word-dropped bench copies)
    // excise at ~10000 bp (the whole doc is one span) while organic
    // docs lose only the coincidental-overlap tail. Doc-level drop
    // (q101) vs span-level surgery (this) is exactly the
    // recall-vs-yield tradeoff a curation team prices.
    // Scale: the gram stream is the q101 scan (map-only into a
    // broadcast join); positions per doc are doc-length-bounded, the
    // island window partitions by doc_id, and the census is 2 rows.
    "q330_span_decontamination" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): the span end
      // fencepost — a match at pos covers [pos, pos+6], every span's
      // last word survives excision; removed_words shifts on EVERY span
      val endOff =
        if (graft.Mutations.on("q330_span_end_off_by_one")) 6 else 7
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val benchDocs = docs.filter(col("doc_id") % 97 === 0)
      val planted = benchDocs
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 10)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat_ws(" ", expr("slice(words, 2, size(words) - 1)")).as("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0).unionByName(planted)
      val bw = org.apache.spark.sql.expressions.Window.partitionBy("g")
      val benchCapped = eightGrams(benchDocs)
        .withColumn("bn", count(lit(1)).over(bw))
        .filter(col("bn") <= BenchGramCap)
        .select("g").distinct()
      val hits = eightGramsPos(corpus)
        .join(broadcast(benchCapped), "g")
        .select("doc_id", "pos").distinct()
      val iw = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val spans = hits
        .withColumn("prev", coalesce(lag(col("pos"), 1).over(iw), lit(-100)))
        .withColumn("newi",
          when(col("pos") > col("prev") + 8, 1L).otherwise(0L))
        .withColumn("island", sum(col("newi")).over(iw))
        .groupBy("doc_id", "island")
        .agg(min(col("pos")).as("sstart"),
          (max(col("pos")) + endOff).as("send"))
      val tot = corpus.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      val perDoc = spans.groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("send") - col("sstart") + 1).as("removed_words"))
        .join(tot, Seq("doc_id"), "right")
        .na.fill(0L, Seq("n_spans", "removed_words"))
      perDoc
        .select(when(col("doc_id") >= 3000000L, "planted")
          .otherwise("organic").as("cls"),
          col("n_spans"), col("removed_words"), col("n_words"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
          sum(col("n_spans")).as("n_spans"),
          sum(col("removed_words")).as("removed_words"),
          sum(col("n_words")).as("total_words"),
          expr("sum(removed_words) * 10000 DIV sum(n_words)")
            .as("removed_bp"))
        .orderBy("cls")
    }),

    // BLOOM-ROUTED DECONTAMINATION — q101's verdict through the scale
    // path: when the benchmark suite's gram set outgrows a raw
    // broadcast, build a BLOOM FILTER over the capped bench grams
    // (O(bits), ~1.2 bytes/gram at 1% FPP — megabytes where the raw
    // set is gigabytes) and prune the corpus gram stream MAP-SIDE with
    // the codegen BloomFilterMightContain probe (the q67 seam) BEFORE
    // any join: grams failing the bloom never enter an exchange. The
    // exact verify join then runs on the ~matching slice alone — false
    // positives die there, false negatives cannot exist (bloom
    // guarantee) — so the verdict is IDENTICAL to q101's (spec-pinned
    // engine-side; the oracle is q101's verbatim). Here the pruned
    // verify still broadcasts the bench side; at a scale where it
    // cannot, the same plan shuffles only the pruned slice — which is
    // the whole point of the bloom stage.
    // Scale: bloom build is two control-plane actions over the
    // bench-suite-sized capped gram set; the corpus pass is map-only
    // through the codegen probe; everything after is match-bounded.
    "q331_bloom_decontamination" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): the probe
      // keys a DIFFERENT domain than the build (xxhash64 of md5(g)
      // instead of xxhash64(g)) — the classic build/probe serialization
      // mismatch: true matches fail the bloom and real contamination
      // silently vanishes
      val probeCol =
        if (graft.Mutations.on("q331_probe_key_mismatch"))
          xxhash64(md5(col("g")))
        else xxhash64(col("g"))
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val benchDocs = docs.filter(col("doc_id") % 97 === 0)
      val planted = benchDocs
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 10)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat_ws(" ", expr("slice(words, 2, size(words) - 1)")).as("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0).unionByName(planted)
      // r17: the capped gram table + bloom are the shared session
      // artifact ([[benchBloomArtifact]] — one build serves q331/q333).
      // Both sides key on xxhash64(g): the native codegen probe takes a
      // BIGINT, and a 64-bit key is the production shape regardless —
      // the gram string never enters the filter
      val (benchCapped, bf) = benchBloomArtifact(s, d)
      eightGramsRaw(corpus)
        .filter(graft.functions.BloomProbe.mightContain(bf, probeCol))
        .join(broadcast(benchCapped), "g")
        .select("doc_id", "bench_id", "g").distinct()
        .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("overlap"))
        .filter(col("overlap") >= ContaminationMinOverlap)
        .groupBy("doc_id")
        .agg(countDistinct(col("bench_id")).as("n_bench_docs"),
          max(col("overlap")).as("max_overlap"))
        .orderBy("doc_id")
    }),

    // STREAMING BLOOM-ROUTED DECONTAMINATION — q331's ingest twin, the
    // gate production actually runs: the corpus arrives as a STREAM
    // while the benchmark suite is an OFFLINE artifact (the bloom + the
    // capped gram table are batch-built statics — the q310 model-table
    // discipline). The gram explode, bloom probe, and bench join are
    // STATELESS (the codegen probe prunes map-side BEFORE the
    // stream-static broadcast join — the batch plan's shape, verbatim);
    // the ONE stateful operator is the (doc, bench, gram) match count
    // through the state store, so state is MATCH-bounded (bloom
    // survivors only), never corpus-bounded — routing the probe in
    // front of the state is the whole point. Chained streaming
    // aggregations are unsupported, so the overlap filter and the
    // per-doc verdict read the COMPLETED table (the q220 discipline).
    // Organic docs pass through; bench docs arrive as their planted
    // near-copies (drop-first-word, +3M ids) via one branchless
    // map-only projection — no stream-batch union needed. Oracle is
    // q101's VERBATIM (the verdict is identical across q101/q331/q333);
    // StreamingSpec pins stream == batch row-for-row, and the
    // q331_probe_key_mismatch knob red-cases this member through the
    // same seam.
    "q333_stream_decontamination" -> ((s, d) => {
      val probeCol =
        if (graft.Mutations.on("q331_probe_key_mismatch"))
          xxhash64(md5(col("g")))
        else xxhash64(col("g"))
      // batch statics: the benchmark artifact (q331's build, verbatim,
      // r17: served from the shared session pin — ONE build for the
      // batch gate and the ingest gate)
      val (benchCapped, bf) = benchBloomArtifact(s, d)
      val sdocs = graft.streaming.StreamingPipelines.documentsStream(s, d)
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("words"))
        .filter(col("doc_id") % 97 =!= 0 || size(col("words")) >= 10)
        .select(
          when(col("doc_id") % 97 === 0, plantedId(col("doc_id"), 3000000L))
            .otherwise(col("doc_id")).as("doc_id"),
          when(col("doc_id") % 97 === 0,
            expr("concat_ws(' ', slice(words, 2, size(words) - 1))"))
            .otherwise(col("text")).as("text"))
      val matched = eightGramsRaw(sdocs)
        .filter(graft.functions.BloomProbe.mightContain(bf, probeCol))
        .join(broadcast(benchCapped), "g")
        .groupBy("doc_id", "bench_id", "g").agg(count(lit(1)).as("n"))
      val done = graft.streaming.StreamingPipelines.runToCompletion(s, matched)
      // completed-table keys are already distinct (doc, bench, gram)
      // triples, so the batch count per pair IS the distinct-gram overlap
      done.groupBy("doc_id", "bench_id").agg(count(lit(1)).as("overlap"))
        .filter(col("overlap") >= ContaminationMinOverlap)
        .groupBy("doc_id")
        .agg(countDistinct(col("bench_id")).as("n_bench_docs"),
          max(col("overlap")).as("max_overlap"))
        .orderBy("doc_id")
    }),

    // ENCODING-HYGIENE CENSUS — the curation gate that runs before any
    // text op: per (source, class) counts of the three mojibake classes
    // a crawl actually carries, with detectors that READ THE TEXT (the
    // plant labels are never consulted): c1 = U+FFFD replacement chars
    // (a decoder already lost bytes), c2 = C0 control characters other
    // than tab/LF/CR (binary junk in a "text" field), c3 = non-ASCII
    // codepoints in an ASCII corpus (the wrong-charset / homoglyph
    // class — planted as ONE Cyrillic 'а' substituted for the first
    // 'a', exactly the single-char case a byte-level heuristic misses).
    // The fixture is verified ASCII-clean, so all three classes are
    // planted in-query on BOTH engine sides (the q240 discipline) by
    // doc_id residue mod 11; the census pins exact per-source counts
    // and integer-bp shares. Scale: wholly map-only per row (two
    // substring probes + one regex + one codepoint count); the census
    // is a (source, cls) aggregate — nothing corpus-sized shuffles.
    // [[graft.Mutations]] "q334_nonascii_threshold": the foreign-script
    // cut at ≥2 codepoints instead of ≥1 — the off-by-one that passes
    // every single-homoglyph doc as clean.
    "q334_encoding_hygiene" -> ((s, d) =>
      encodingShare(encodingScored(
        Tables.documents(s, d).select("doc_id", "source", "text"))
        .groupBy("source", "cls")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_nonascii")).as("n_nonascii_chars")))),

    // q334 AT INGEST — the hygiene gate applied where production applies
    // it, completing the ingest-gate set (quality q310 / domain cap q315
    // / DP q328 / decontamination q333 / hygiene here): the plant +
    // detectors are STATELESS map work on the stream (ONE shared seam
    // with q334 — encodingScored — so the threshold knob red-cases
    // both), the ONE stateful operator is the (source, cls) count/sum
    // through the state store — state bounded at |sources|*4 rows
    // regardless of volume — and the per-source share window reads the
    // COMPLETED table (the q220 discipline). Oracle is q334's verbatim;
    // a spec pins stream == batch row-for-row.
    "q336_stream_encoding_hygiene" -> ((s, d) => {
      val sdocs = graft.streaming.StreamingPipelines.documentsStream(s, d)
        .select("doc_id", "source", "text")
      val agg = encodingScored(sdocs)
        .groupBy("source", "cls")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_nonascii")).as("n_nonascii_chars"))
      encodingShare(
        graft.streaming.StreamingPipelines.runToCompletion(s, agg))
    }),

    // PREFIX-CACHE ACCOUNTING — the inference-serving question none of
    // the packing ops answer: how many prompt tokens would a KV prefix
    // cache absorb? The prompt log is built from the corpus the way
    // serving traffic actually looks — a small set of instruction
    // TEMPLATES (doc_id mod 3) prepended to per-doc payloads, plus
    // exact RE-SUBMISSIONS (doc_id ≡ 2 mod 13, +5M ids — the
    // retry/regenerate pattern). The census sweeps the cache key depth
    // k ∈ {4, 8, 16} (the q289 budget-sweep shape): per k, prompts are
    // grouped by their first-k tokens and a group of n prompts caches
    // (n−1)·k tokens — so the sweep shows the knee at template length
    // (shallow keys share across every templated prompt; deep keys only
    // across true duplicates), exactly the table a serving deployment
    // reads before sizing its radix cache.
    // Scale: per k, ONE prefix-keyed exchange (skinny (pfx, n_toks)
    // rows) and a one-row census; the sweep is 3 such passes — nothing
    // quadratic, no driver collect.
    // [[graft.Mutations]] "q335_cache_counts_first": a group of n bills
    // n·k cached tokens instead of (n−1)·k — the first occupant (who
    // MISSES and pays the prefill) billed as a hit; every shared group
    // inflates.
    "q335_prefix_cache" -> ((s, d) =>
      prefixCacheReport(prefixGroups(prefixCachePrompts(
        Tables.documents(s, d).select("doc_id", "text"))))),

    // q335 AT INGEST — prefix-cache accounting where serving actually
    // meters it: the prompt construction and the (k, prefix) explode are
    // STATELESS map work on the stream (ONE shared prompt/report seam
    // with q335, so the first-occupant knob red-cases both), the ONE
    // stateful operator is the (k, prefix) count/token-sum through the
    // state store — state is key-spaced (distinct prefixes × 3 depths),
    // never prompt-spaced — and the per-k rollup reads the COMPLETED
    // table (the q220 discipline). Oracle is q335's verbatim; a spec
    // pins stream == batch row-for-row.
    "q339_stream_prefix_cache" -> ((s, d) => {
      val sdocs = graft.streaming.StreamingPipelines.documentsStream(s, d)
        .select("doc_id", "text")
      val groups = prefixGroups(prefixCachePrompts(sdocs))
      prefixCacheReport(
        graft.streaming.StreamingPipelines.runToCompletion(s, groups))
    }),

    "q101_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val benchDocs = docs.filter(col("doc_id") % 97 === 0)
      val planted = benchDocs
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 10)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat_ws(" ", expr("slice(words, 2, size(words) - 1)")).as("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0).unionByName(planted)
      val bench8 = eightGrams(benchDocs)
      // stop-gram cap on the bench side (rides its own aggregation)
      val bw = org.apache.spark.sql.expressions.Window.partitionBy("g")
      val benchCapped = bench8
        .withColumn("bn", count(lit(1)).over(bw))
        .filter(col("bn") <= BenchGramCap)
        .select(col("g"), col("doc_id").as("bench_id"))
      // corpus side: RAW gram stream into a map-side broadcast join — the
      // only corpus-wide work is the scan itself; dedup to distinct
      // (doc, bench, gram) triples happens post-join on match-bounded
      // rows. The broadcast is HINTED, not left to the size estimator:
      // benchCapped sits behind a window aggregate whose stats inherit
      // the full documents-scan estimate, so auto-broadcast would
      // silently flip to a sort-merge join (shuffling the whole corpus
      // gram stream) exactly when the corpus grows. The bench set itself
      // is eval-suite sized — thousands of docs — and stays broadcastable.
      // By default that is enforced by Spark itself: a hinted broadcast
      // past the 8 GB limit hard-fails the job loudly, and the query
      // stays FULLY LAZY (building it runs no job — plan-only consumers
      // pay nothing). An opt-in guard trades that hard failure for a
      // graceful sort-merge fallback: it persists the capped bench side
      // so its one guard count() and the join share a single computation
      // of the window aggregate, memoized per (session, data dir) so
      // repeated builds reuse ONE cache entry instead of stacking a new
      // MEMORY_AND_DISK table per build (see [[guardedBenchSide]] /
      // [[clearGuardCache]]).
      val guardEnabled =
        s.conf.get("graft.contamination.broadcastGuard", "false").toBoolean
      val benchSide =
        if (!guardEnabled) broadcast(benchCapped)
        else guardedBenchSide(s, d, benchCapped)
      eightGramsRaw(corpus)
        .join(benchSide, "g")
        .select("doc_id", "bench_id", "g").distinct()
        .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("overlap"))
        .filter(col("overlap") >= ContaminationMinOverlap)
        .groupBy("doc_id")
        .agg(countDistinct(col("bench_id")).as("n_bench_docs"),
          max(col("overlap")).as("max_overlap"))
        .orderBy("doc_id")
    }),

    // Incremental snapshot dedup: admit or reject each NEW document
    // against the EXISTING corpus — the daily-increment pattern. The
    // increment's minhash bands join only against the old corpus's bands
    // (never old × old: the standing corpus was already deduped, so the
    // incremental cost is |new| × band-collisions, not |corpus|²),
    // candidates verify at exact 3-gram Jaccard >= 0.5, and boilerplate
    // band buckets are capped by their OLD-side population with the same
    // shared constant the batch dedup uses. The increment plants
    // near-copies of old docs (must be rejected) and word-reversed docs
    // (share no 3-grams — must be admitted).
    // CROSS-SOURCE overlap matrix — which feeds are re-crawls of each
    // other: distinct word-8-gram sets per SOURCE, pairwise shared-gram
    // counts, and a containment share against the smaller side (the
    // q179 containment axis lifted from doc pairs to source pairs).
    // This is the audit run before source-level mixture weighting
    // (q187/q196): two sources with high containment are one source for
    // sampling purposes, and double-weighting them silently skews the
    // mix. Grams present in only one source carry no pair signal and
    // grams in more than [[SourceGramCap]] sources are boilerplate;
    // both are dropped BEFORE the self-join, so the per-gram pair
    // fan-out is bounded by the cap squared — the same guard discipline
    // as the LSH mega-bucket cap, applied at source granularity.
    // Scale: the (source, gram) distinct is the corpus-sized shuffle
    // (map-side partial); the self-join then moves only multi-source
    // grams; per-source set sizes are a tiny broadcast.
    "q216_source_overlap" -> ((s, d) => {
      val sg = Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 8)
        .select(col("source"),
          explode(sequence(lit(1), size(col("words")) - 7)).as("pos"),
          col("words"))
        .select(col("source"),
          expr("concat_ws(' ', slice(words, pos, 8))").as("g"))
        .distinct()
      val sizes = sg.groupBy("source").agg(count(lit(1)).as("sz"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      val capped = sg.withColumn("ns", count(lit(1)).over(w))
        .filter(col("ns") >= 2 && col("ns") <= SourceGramCap)
      capped.select(col("g"), col("source").as("src_a"))
        .join(capped.select(col("g"), col("source").as("src_b")), Seq("g"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sizes.select(col("source").as("src_a"),
          col("sz").as("sz_a"))), "src_a")
        .join(broadcast(sizes.select(col("source").as("src_b"),
          col("sz").as("sz_b"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          expr("(n_shared * 10000) DIV least(sz_a, sz_b)").as("containment_bp"))
        .orderBy("src_a", "src_b")
    }),

    "q103_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val newNear = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 10)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat_ws(" ", expr("slice(words, 2, size(words) - 1)")).as("text"))
      val newFresh = docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          array_join(reverse(split(col("text"), " ")), " ").as("text"))
      val incoming = newNear.unionByName(newFresh)
      val oldBands = DedupQueries.bandTable(
        DedupQueries.minhash(DedupQueries.shinglesRawOf(docs)))
      val newBands = DedupQueries.bandTable(
        DedupQueries.minhash(DedupQueries.shinglesRawOf(incoming)))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
      val oldCapped = oldBands
        .withColumn("bn", count(lit(1)).over(w))
        .filter(col("bn") <= DedupQueries.DefaultMaxBucket).drop("bn")
      val cands = newBands.select(col("band"), col("bh"), col("doc_id").as("id1"))
        .join(oldCapped.select(col("band"), col("bh"), col("doc_id").as("id2")),
          Seq("band", "bh"))
        .select("id1", "id2").distinct()
      val j = DedupQueries.jaccardOf(cands,
        DedupQueries.shinglesOf(docs.unionByName(incoming)))
      val dup = j.filter(col("jaccard") >= 0.5)
        .groupBy(col("id1").as("new_id"))
        .agg(min(col("id2")).as("best_old"), round(max(col("jaccard")), 6).as("max_j"))
      incoming.select(col("doc_id").as("new_id"))
        .join(dup, Seq("new_id"), "left")
        .select(col("new_id"),
          when(col("best_old").isNull, "admit").otherwise("duplicate").as("verdict"),
          coalesce(col("best_old"), lit(-1L)).as("best_old"),
          coalesce(col("max_j"), lit(0.0)).as("max_j"))
        .orderBy("new_id")
    }),

    // PII redaction with audit counts: scrub emails/phone extensions,
    // report how much was removed. The fixture corpus carries no PII, so
    // each doc plants a deterministic contact line (mirrored in the
    // oracle); map-only — the redaction itself never shuffles.
    "q102_pii_redact" -> ((s, d) => {
      val raw = Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" call 555-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))).as("raw"))
      raw.select(col("doc_id"),
          size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("raw"), lit(PhoneRe), lit(0))).as("n_phones"),
          length(regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>")).as("redacted_len"))
        .orderBy("doc_id")
    }),

    // Entity resolution (record linkage): match dirty records back to a
    // deduplicated entity dictionary by blocked fuzzy join — the
    // cross-source curation step that unifies near-identical metadata.
    // Dictionary = DISTINCT part names (64 entities, min-key as entity
    // id); dirty records = every 5th part row with its 3rd character
    // dropped (a planted typo at edit distance 1). Blocking on the
    // 2-char name prefix (which the typo provably preserves) bounds the
    // candidate pairs — the ER answer to an all-pairs levenshtein, same
    // role as LSH bands in q41. Best match = (min levenshtein, min
    // entity id). At 100 TB the record side is fact-sized and the entity
    // dictionary is broadcast; levenshtein runs only inside blocks.
    // All-integer scoring (edit distance), no float hygiene needed.
    "q126_entity_resolution" -> ((s, d) => {
      val parts = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
      val entities = parts.groupBy("p_name")
        .agg(min(col("p_partkey")).as("entity_id"))
        .select(col("entity_id"), col("p_name").as("ent_name"),
          substring(col("p_name"), 1, 2).as("blk"))
      val dirty = parts.filter(col("p_partkey") % 5 === 0)
        .select((col("p_partkey") + 1000000L).as("rec_id"),
          concat(substring(col("p_name"), 1, 2), expr("substring(p_name, 4)")).as("rec_name"))
        .withColumn("blk", substring(col("rec_name"), 1, 2))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("rec_id").orderBy(col("lev"), col("entity_id"))
      dirty.join(broadcast(entities), "blk")
        .select(col("rec_id"), col("rec_name"), col("entity_id"), col("ent_name"),
          levenshtein(col("rec_name"), col("ent_name")).as("lev"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("rec_id"), col("rec_name"),
          col("entity_id").as("matched_entity"),
          col("ent_name").as("matched_name"), col("lev"))
        .orderBy("rec_id")
    }),

    // Novelty scoring — the inverse of q100's repetition and q101's
    // contamination: how much of each document's distinct 8-gram set
    // appears NOWHERE else in the corpus (df = 1)? High-novelty docs
    // carry information no other doc has (what a curation pass wants to
    // keep); near-zero novelty means boilerplate. Two shuffles, both on
    // the gram: the df aggregate and the join back to each doc's gram
    // set; the per-doc ratio aggregate reuses the doc_id partitioning.
    // The ratio is fixed-point basis points via truncating DIV — no
    // cross-engine float.
    "q141_novelty_score" -> ((s, d) => {
      val grams = eightGrams(Tables.documents(s, d).select("doc_id", "text"))
      val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
      grams.join(df, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .select(col("doc_id"), col("n_grams"), col("n_unique"),
          expr("(n_unique * 10000) DIV n_grams").as("novelty_bp"))
        .orderBy("doc_id")
    }),

    // Deterministic seeded corpus shuffle — the training-order primitive:
    // epoch order must be (a) uniform, (b) reproducible from a seed, (c)
    // computable WITHOUT a global sort state (any worker can place any
    // doc). Rank = md5(doc_id ':' seed): changing the seed permutes the
    // corpus wholesale, same seed always replays the same order. The
    // top-K head per seed is graded (TakeOrderedAndProject — no global
    // sort materializes; a full epoch would range-partition by the same
    // hash). Two seeds in one result pin seed-sensitivity.
    "q186_seeded_shuffle" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      // per-seed top-64 head: TakeOrderedAndProject per branch — no
      // global sort materializes; the union is 128 rows, so the ranking
      // window below is control-plane-sized at any corpus scale (and
      // seed is a real 2-valued column AFTER the union, so the window
      // keeps a partition key instead of folding to one partition)
      Seq(42, 7).map { sd =>
        docs.select(lit(sd).as("seed"), col("doc_id"),
            md5(concat(col("doc_id").cast("string"), lit(s":$sd"))).as("h"))
          .orderBy("h").limit(64)
      }.reduce(_ unionAll _)
        .withColumn("pos",
          row_number().over(Window.partitionBy("seed").orderBy("h")).cast("long"))
        .drop("h")
        .orderBy("seed", "pos")
    }),

    // Source-mixture sampling — the data-mixing step of a training
    // pipeline: per-source target weights (epochs), where w=2.5 means
    // "2 full copies + half the docs get a third", w=0 drops the source.
    // The fractional part is decided per-doc by a DETERMINISTIC uniform
    // draw (first 5 md5 hex digits of the doc id as an integer in
    // [0, 16^5)), compared against an integer threshold — exact in both
    // engines, no float, and stable under re-runs (critical: a retry
    // that re-samples would break epoch bookkeeping). Map-only per doc +
    // one per-source aggregate; at 100 TB this IS the plan.
    // REPETITION-exposure report — what the trainer actually experiences
    // under q187's mixture weights: per source, docs sampled, total
    // draws, the worst per-doc copy count, tokens drawn, and the share
    // of drawn tokens that are REPEATS (copy 2+ of a doc) in basis
    // points. Upweighting a source past 1.0 buys volume by repetition;
    // this is the ledger that prices it (the memorization-risk signal a
    // data-mixing review asks for, dual to q196's weight update). Same
    // deterministic draw as q187 — the report describes exactly the
    // sample the pipeline would emit, not a re-roll.
    // Scale: map-only per-doc arithmetic + one source-keyed aggregate.
    "q232_effective_epochs" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          (expr(MixFloorCase).cast("long") +
            when(expr(s"($MixDrawExpr)") < expr(MixThreshCase), 1L)
              .otherwise(0L)).as("nc"))
      per.groupBy("source").agg(
          count(lit(1)).as("n_docs_in"),
          sum(when(col("nc") > 0, 1L).otherwise(0L)).as("n_docs_sampled"),
          sum(col("nc")).as("n_draws"),
          max(col("nc")).as("max_copies"),
          sum(col("toks") * col("nc")).as("tokens_drawn"),
          sum(col("toks") * greatest(col("nc") - 1, lit(0L))).as("rt"))
        .withColumn("repeat_bp", expr(
          """CASE WHEN tokens_drawn = 0 THEN CAST(0 AS BIGINT)
             ELSE (rt * 10000) DIV tokens_drawn END"""))
        .select("source", "n_docs_in", "n_docs_sampled", "n_draws",
          "max_copies", "tokens_drawn", "repeat_bp")
        .orderBy("source")
    }),

    "q187_mixture_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          expr(s"($MixDrawExpr)").as("u"),
          expr(MixFloorCase).as("w_floor"),
          expr(MixThreshCase).as("u_thresh"))
        .select(col("source"),
          (col("w_floor") + when(col("u") < col("u_thresh"), 1L).otherwise(0L)).as("n_copies"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_copies")).as("n_copies"))
        .withColumn("rate_bp", expr("(n_copies * 10000) DIV n_docs"))
        .orderBy("source")
    }),

    // Sequence packing (concat-and-chunk): documents become one token
    // stream per source, chunked into fixed-length training sequences —
    // each doc's placement is (first sequence, offset, how many chunk
    // boundaries it straddles), all from ONE prefix sum over the
    // per-source doc order. Per-source windows are the scale path:
    // packing is per-shard in production, so the window key is the shard
    // and no global single-partition sort exists. Token counts reuse
    // q62's whitespace tokenization.
    "q188_sequence_pack" -> ((s, d) => {
      val L = SeqPackLen
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_tok"),
          expr(s"cum_before DIV $L").as("seq_id"),
          expr(s"cum_before % $L").as("start_off"),
          expr(s"((cum_before + n_tok - 1) DIV $L) - (cum_before DIV $L)").as("n_straddles"))
        .orderBy("doc_id")
    }),

    // Packing-efficiency report — the metric a pipeline reads when
    // tuning MaxSeqLen: per source, sequences produced (= ceil of the
    // token total), fill rate (only the final partial sequence is
    // waste under concat-and-chunk), and how many documents get CUT
    // across a sequence boundary (context loss, the cost side of
    // packing). Drives [[SamplingPipeline.packSequences]] for the
    // per-doc straddle flags; the report itself is one source-keyed
    // aggregate over its output.
    "q206_packing_report" -> ((s, d) => {
      val L = SeqPackLen
      val packed = SamplingPipeline.packSequences(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok")),
        "doc_id", "source", "n_tok", L)
      packed.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tok"),
          sum(when(col("n_straddles") > 0, 1L).otherwise(0L)).as("cut_docs"))
        .select(col("source"), col("n_docs"), col("total_tok"),
          expr(s"(total_tok + ${L - 1}) DIV $L").as("n_seqs"),
          expr(s"(total_tok * 10000) DIV (((total_tok + ${L - 1}) DIV $L) * $L)")
            .as("fill_bp"),
          col("cut_docs"),
          expr("(cut_docs * 10000) DIV n_docs").as("cut_rate_bp"))
        .orderBy("source")
    }),

    // PACK ATTENTION CONTAMINATION — the cost q206's cut-doc count
    // does NOT price: under concat-and-chunk packing WITHOUT document-
    // boundary attention masks, every token attends across doc seams,
    // so a sequence holding several documents trains on cross-document
    // token pairs — noise gradients a masked dataloader avoids. Per
    // source: sequences, mixed sequences (>1 doc), cross-document
    // within-sequence token pairs Σ_{i<j} tᵢ·tⱼ = (T² − Σtᵢ²)/2 (exact
    // integers — T² − Σtᵢ² is always even), total within-sequence pairs
    // T(T−1)/2, and the contamination share in bp — the number that
    // decides whether the training stack needs boundary masks at its
    // chosen MaxSeqLen. Rides [[SamplingPipeline.packSequences]]
    // verbatim (the q188 seam — one placement definition for layout,
    // efficiency report, and this), so the three views can never
    // disagree about where a document sits.
    // Scale: the one per-shard prefix-sum window q188 already pays;
    // occupancy explodes each doc into its (≤ straddles+1) touched
    // sequences — bounded fan-out; everything after is two map-side-
    // combined aggregates keyed (source, seq) then source.
    "q304_pack_attention" -> ((s, d) => {
      val L = SeqPackLen
      val packed = SamplingPipeline.packSequences(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok")),
        "doc_id", "source", "n_tok", L)
      val occ = packed.filter(col("n_tok") > 0)
        .withColumn("cum", col("seq_id") * L + col("start_off"))
        .select(col("source"), col("cum"), col("n_tok"),
          explode(expr(s"sequence(seq_id, (cum + n_tok - 1) DIV $L)")).as("seq"))
        .select(col("source"), col("seq"),
          (least((col("seq") + 1) * L, col("cum") + col("n_tok")) -
            greatest(col("seq") * L, col("cum"))).as("t"))
      val per = occ.groupBy("source", "seq").agg(
        sum(col("t")).as("tt"), sum(col("t") * col("t")).as("s2"),
        count(lit(1)).as("n_docs_in"))
      // mutation seam (knob OFF in every production plan): tt² DIV 2 for
      // tt·(tt−1) DIV 2 — self-pairs in the denominator, deflating the
      // contamination share on every row
      val totalExpr =
        if (graft.Mutations.on("q304_total_includes_self_pairs"))
          "(tt * tt) DIV 2"
        else "(tt * (tt - 1)) DIV 2"
      per.groupBy("source").agg(
          count(lit(1)).as("n_seqs"),
          sum(when(col("n_docs_in") > 1, 1L).otherwise(0L)).as("mixed_seqs"),
          sum(expr("(tt * tt - s2) DIV 2")).as("cross_pairs"),
          sum(expr(totalExpr)).as("total_pairs"))
        .withColumn("contamination_bp", expr(
          "CASE WHEN total_pairs = 0 THEN 0" +
            " ELSE (cross_pairs * 10000) DIV total_pairs END"))
        .orderBy("source")
    }),

    // DATASET CARD — the one-page datasheet (Gebru et al. '18) a data
    // team ships WITH a corpus: volume, composition, duplication, and
    // licensing in one fixed-domain metric table. Every line reuses
    // arithmetic another graded query owns (q62 token counts, q203's
    // language mix, q40's md5 exact-dup rule, q296's source-derived
    // license tiers), so the card can never disagree with the
    // deep-dive queries it summarizes. All-integer values (counts or
    // truncating-DIV basis points). Scale: three aggregates — one
    // doc-level pass (tokens/lang/license flags), one md5-keyed dup
    // count, one lang-keyed count for the entropy fold — every one
    // map-side partial; the card itself is a 10-row union.
    "q299_dataset_card" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(when(expr("CAST(substring(source, 4) AS INT) % 3 = 2"), 1L)
          .otherwise(0L)).as("n_restricted"),
        countDistinct(col("source")).as("n_sources"))
      val dups = docs.groupBy(md5(col("text")).as("fp"))
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_exact_dups"))
      // corpus language-mix Shannon entropy in micro-nats (q203's
      // round-then-cast fixed-point rule, corpus-level): Σ -p·ln(p)
      val ent = docs.groupBy("lang").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .agg(coalesce(sum(expr(
          """CAST(round(-(CAST(c AS DOUBLE) / n)
                        * ln(CAST(c AS DOUBLE) / n) * 1000000)
             AS BIGINT)""")),
          lit(0L)).as("lang_entropy_unat"))
      base.crossJoin(broadcast(dups)).crossJoin(broadcast(ent))
        .select(expr(
          """stack(10,
               'n_docs', n_docs,
               'n_tokens', n_tokens,
               'mean_doc_tokens', n_tokens DIV n_docs,
               'n_sources', n_sources,
               'en_share_bp', (n_en * 10000) DIV n_docs,
               'lang_entropy_unat', lang_entropy_unat,
               'exact_dup_docs', n_exact_dups,
               'exact_dup_bp', (n_exact_dups * 10000) DIV n_docs,
               'restricted_docs', n_restricted,
               'restricted_share_bp', (n_restricted * 10000) DIV n_docs
             ) AS (metric, value)"""))
        .orderBy("metric")
    }),

    // MaxSeqLen BUDGET SWEEP — q206's packing report priced at L ∈
    // {512, 1024, 2048, 4096} simultaneously, the way q207 sweeps
    // q51's probe count: the tuning curve behind the single most
    // consequential dataloader constant. The tradeoff the table
    // exposes: larger L → fewer boundaries → fewer documents CUT
    // across sequences (context loss shrinks) but a fatter final
    // partial sequence per shard (fill dips at small shards); smaller
    // L inverts both. ONE pass prices the whole curve (the q189
    // discipline): the per-source prefix sum is computed ONCE — doc
    // placement depends only on cum_before, which is L-independent —
    // then each row explodes into the 4 budgets and one (source,
    // seq_len)-keyed aggregate scores every budget. All arithmetic
    // integer (DIV/%); at 100 TB this is q188's per-shard window + a
    // 4× bounded map-side fan-out, no extra shuffle.
    "q289_pack_budget_sweep" -> ((s, d) => {
      val ls = Seq(512L, 1024L, 2048L, 4096L)
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("seq_len", explode(array(ls.map(lit(_)): _*)))
        .groupBy("source", "seq_len")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tok"),
          sum(when(expr("((cum_before + n_tok - 1) DIV seq_len)" +
              " > (cum_before DIV seq_len)"), 1L).otherwise(0L)).as("cut_docs"))
        .select(col("source"), col("seq_len"), col("n_docs"), col("total_tok"),
          expr("(total_tok + seq_len - 1) DIV seq_len").as("n_seqs"),
          expr("(total_tok * 10000) DIV (((total_tok + seq_len - 1) DIV seq_len) * seq_len)")
            .as("fill_bp"),
          col("cut_docs"),
          expr("(cut_docs * 10000) DIV n_docs").as("cut_rate_bp"))
        .orderBy("source", "seq_len")
    }),

    // Length-bucketed batching — the padding-efficiency dual of q188's
    // packing (packing concatenates; bucketing groups LIKE lengths so a
    // padded batch wastes little): docs bin by next power-of-2 token
    // length, and each bucket reports its batch count (batch=32) and the
    // exact padding waste against the bucket cap in basis points. The
    // waste column is what a dataloader tuner reads to pick bucket
    // boundaries. Map-side binning + one aggregate — at 100 TB this IS
    // the plan (same shape as q187).
    "q190_length_buckets" -> ((s, d) => {
      Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("bucket_cap", expr(LenBucketCase))
        .groupBy("bucket_cap")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          max(col("n_tok")).as("max_tok"))
        // pad target: the bucket cap, except the overflow bucket pads to
        // its longest doc (as a real dataloader would) — keeps waste_bp
        // non-negative even when docs exceed the top boundary
        .select(col("bucket_cap"), col("n_docs"),
          expr("(n_docs + 31) DIV 32").as("n_batches"),
          expr("((n_docs * greatest(bucket_cap, max_tok) - sum_tok) * 10000)" +
            " DIV (n_docs * greatest(bucket_cap, max_tok))").as("waste_bp"))
        .orderBy("bucket_cap")
    }),

    // q187's mixture sampling THROUGH THE STREAMING ENGINE — the
    // property that makes deterministic sampling production-safe,
    // graded rather than claimed: because every draw is md5(id:salt)
    // arithmetic (no rand(), no state), a streamed corpus samples
    // IDENTICALLY to the batch pass — the oracle is q187's, verbatim.
    // In a real deployment this is the resumable-ingest guarantee: a
    // micro-batch that retries, or a corpus that arrives over weeks,
    // draws the same copies the one-shot batch job would have.
    "q198_stream_mixture" -> ((s, d) => {
      val docs = graft.streaming.StreamingPipelines.documentsStream(s, d)
      val agg = docs
        .select(col("source"),
          expr(s"($MixDrawExpr)").as("u"),
          expr(MixFloorCase).as("w_floor"),
          expr(MixThreshCase).as("u_thresh"))
        .select(col("source"),
          (col("w_floor") + when(col("u") < col("u_thresh"), 1L).otherwise(0L)).as("n_copies"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_copies")).as("n_copies"))
      graft.streaming.StreamingPipelines.runToCompletion(s, agg)
        .withColumn("rate_bp", expr("(n_copies * 10000) DIV n_docs"))
        .orderBy("source")
    }),

    // MIXTURE REWEIGHTING round (the DoReMi-family loop): update
    // per-source sampling weights multiplicatively from a per-source
    // proxy score — sources scoring above the corpus mean gain weight,
    // below lose it, clamped then renormalized to Σ=10000 bp. One round
    // of the loop that sits between epochs: score → reweight → feed the
    // new weights to mixtureSample (q187) for the next epoch. ALL
    // integer arithmetic (the exp() of the textbook update is a float
    // cross-engine hazard; a first-order 1+η·advantage step in basis
    // points is deterministic and is what the clamp makes safe). Plan:
    // one map-side doc score + one per-source aggregate; the 20-row
    // weight table does its clamp/normalize as control-plane arithmetic.
    "q196_mixture_reweight" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("source"),
          expr("size(array_distinct(split(text, ' '))) * 10000L DIV size(split(text, ' '))")
            .as("score_bp"))
      val perSrc = scored.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("score_bp")).as("sum_bp"))
        .withColumn("src_score_bp", expr("sum_bp DIV n_docs"))
      val global = perSrc.agg(
        expr("sum(sum_bp) DIV sum(n_docs)").as("corpus_score_bp"),
        count(lit(1)).as("n_sources"))
      val raw = perSrc.crossJoin(broadcast(global))
        .withColumn("old_w_bp", expr("10000 DIV n_sources"))
        .withColumn("advantage_bp", col("src_score_bp") - col("corpus_score_bp"))
        // first-order multiplicative step, clamped to [1/4x, 4x]
        .withColumn("raw_w_bp", expr(
          "greatest(old_w_bp DIV 4, least(old_w_bp * 4, " +
            "(old_w_bp * (10000 + advantage_bp)) DIV 10000))"))
      val total = raw.agg(sum(col("raw_w_bp")).as("tot"))
      raw.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"), col("src_score_bp"),
          col("old_w_bp"), col("advantage_bp"),
          expr("(raw_w_bp * 10000) DIV tot").as("new_w_bp"))
        .orderBy("source")
    }),

    // Quality-filter ABLATION MATRIX — the analysis a pipeline runs
    // before choosing its filter stack: apply K candidate filters to
    // every doc in one pass and report the pairwise agreement matrix
    // (both pass / only-first / only-second / neither). Two filters
    // that agree on ~everything are redundant; one that kills what the
    // others keep needs a human look. All four filters are integer-
    // deterministic: word-count bounds, distinct-word diversity, avg
    // word length (length(text)*10 DIV n_words), and q180's top-16
    // vocab coverage. Plan: one broadcast vocab probe + one doc_id
    // aggregate, then the 6-pair matrix is ONE global aggregate (24
    // map-side sums) unpivoted by stack — the matrix never shuffles
    // doc-grained rows by filter pair.
    "q195_filter_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("words", split(col("text"), " "))
        .withColumn("nw", size(col("words")).cast("long"))
      val vocab = docs.select(explode(col("words")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("word")).limit(16)
        .select(col("word"), lit(1L).as("inv"))
      val cov = docs.select(col("doc_id"), explode(col("words")).as("word"))
        .join(broadcast(vocab), Seq("word"), "left")
        .groupBy("doc_id").agg(count(lit(1)).as("n_tok"),
          sum(coalesce(col("inv"), lit(0L))).as("n_inv"))
      val flags = docs.join(cov, "doc_id")
        .select(
          (col("nw") >= 20 && col("nw") <= 1000).as("f_len"),
          (size(array_distinct(col("words"))).cast("long") * 2 >= col("nw")).as("f_div"),
          expr("length(text) * 10 DIV nw BETWEEN 30 AND 90").as("f_wlen"),
          (col("n_inv") * 10 >= col("n_tok") * 8).as("f_vocab"))
      val fs = Seq("f_len", "f_div", "f_wlen", "f_vocab")
      val pairs = for { i <- fs.indices; j <- fs.indices if i < j }
        yield (fs(i), fs(j))
      def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
      val aggCols = pairs.flatMap { case (a, b) => Seq(
        cnt(col(a) && col(b)).as(s"${a}__${b}__both"),
        cnt(col(a) && !col(b)).as(s"${a}__${b}__f1"),
        cnt(!col(a) && col(b)).as(s"${a}__${b}__f2"),
        cnt(!col(a) && !col(b)).as(s"${a}__${b}__neither"))
      }
      val one = flags.agg(aggCols.head, aggCols.tail: _*)
      val stackArgs = pairs.map { case (a, b) =>
        s"'$a', '$b', ${a}__${b}__both, ${a}__${b}__f1, ${a}__${b}__f2, ${a}__${b}__neither"
      }.mkString(", ")
      one.select(expr(s"stack(${pairs.size}, $stackArgs) AS " +
          "(f1, f2, n_both, n_f1_only, n_f2_only, n_neither)"))
        .orderBy("f1", "f2")
    }),

    // END-TO-END sampling composition — the pipeline the brief actually
    // describes, as ONE query driving all four [[SamplingPipeline]]
    // stages in sequence: seeded epoch shuffle → mixture replication →
    // per-shard sequence packing (in epoch order, each copy its own
    // pack unit) → length bucketing. Grading the composition pins that
    // the stages' working columns (`epoch_order`, `copy_idx`, `__cum`,
    // `bucket_cap`) compose without collisions and that the per-copy
    // pack key (epoch_order:doc_id:copy_idx) is the deterministic total
    // order a resumable dataloader needs. Same scale shape as the
    // stages separately: map-only until the one per-shard pack window.
    "q192_sampling_pipeline" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      val ordered = SamplingPipeline.epochOrder(base, "doc_id", 42)
      val mixed = SamplingPipeline.mixtureSample(ordered, "doc_id", "source",
        MixWeights.toMap, MixDefaultWeight)
      val keyed = mixed.withColumn("pack_key",
        concat_ws(":", col("epoch_order"), col("doc_id").cast("string"),
          col("copy_idx").cast("string")))
      val packed = SamplingPipeline.packSequences(
        keyed, "pack_key", "source", "n_tok", SeqPackLen)
      SamplingPipeline.lengthBucket(packed, "n_tok")
        .select("doc_id", "copy_idx", "source", "n_tok",
          "seq_id", "start_off", "n_straddles", "bucket_cap")
        .orderBy("doc_id", "copy_idx")
    }),

    // PARETO MASS-COVERAGE report — the concentration audit q234 runs
    // on join keys, applied to corpus governance: per source, how few
    // documents carry 80% of the characters (k80), and what share of
    // mass the top 1% of documents owns. A source where 3 docs carry
    // 80% is a scrape of one template; a flat source spreads risk. k80
    // is the smallest desc-sorted prefix whose cumulative chars reach
    // 80% (integer comparison cum·100 ≥ total·80 — no float rank);
    // top-1% count is ceil(n/100) = (n + 99) DIV 100.
    // Scale: one (source)-keyed window over docs sorted (n_chars desc,
    // doc_id) — the q69 per-source cumulative discipline (per-source
    // linear, parallel across sources; a skewed mega-source would ride
    // the q151 two-level prefix-sum split, unneeded at fixture shape);
    // the report rows are one aggregate over the cumulated table.
    "q252_pareto_mass" -> ((s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      val cum = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rk", row_number().over(w))
        .withColumn("cum", sum(col("n_chars")).over(w))
      val tot = cum.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      cum.join(broadcast(tot), "source")
        .groupBy(col("source"), col("n_docs"), col("total_chars"))
        .agg(
          min(when(col("cum") * 100 >= col("total_chars") * 80, col("rk")))
            .as("k80_docs"),
          sum(when(col("rk") <= expr("(n_docs + 99) DIV 100"), col("n_chars"))
            .otherwise(lit(0L))).as("top1_chars"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          col("k80_docs"),
          expr("(k80_docs * 10000) DIV n_docs").as("k80_docs_bp"),
          expr("(top1_chars * 10000) DIV total_chars").as("top1pct_share_bp"))
        .orderBy("source")
    })
  )

  /** q190's bucket ladder — [[SamplingPipeline]]'s canonical boundaries
    * rendered once as an integer CASE expression (a float pow/ceil(log2)
    * bucket could round differently across engines at exact powers of
    * two). Docs longer than the top boundary land in the overflow cap. */
  private[ext] val LenBucketCase: String = SamplingPipeline.ladderExpr(
    "n_tok", SamplingPipeline.DefaultBucketBounds, SamplingPipeline.DefaultOverflowCap)

  /** Fixed training-sequence length (tokens) for q188's packing. */
  private[ext] val SeqPackLen = 2048

  /** q187's fixed demo weights. The draw / CASE expressions come from
    * [[SamplingPipeline]] — THE single definition shared by the Spark
    * plan, the user API, and the oracle SQL, so none can drift. */
  private[ext] val MixWeights: Seq[(String, Double)] =
    Seq("src0" -> 2.5, "src1" -> 0.0, "src2" -> 1.5)
  private[ext] val MixDefaultWeight = 0.8
  private[ext] val MixDrawExpr: String = SamplingPipeline.drawExpr("doc_id", "mix")
  private[ext] val (mixFloorCase, mixThreshCase) =
    SamplingPipeline.weightCases("source", MixWeights, MixDefaultWeight)
  private[ext] def MixFloorCase: String = mixFloorCase
  private[ext] def MixThreshCase: String = mixThreshCase

  /** Shared oracle CTEs for q311/q315: URL synthesis, host parse, eTLD+1
    * reduction, blocklist, and the per-domain draw rank `k` — ONE copy so
    * the batch census and its streaming twin grade the same disposition. */
  private val urlOracleCtes: String =
    s"""u AS (SELECT doc_id, $UrlSynthSql AS url FROM documents),
        h AS (SELECT doc_id,
                     regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host
              FROM u),
        l AS (SELECT doc_id, host, str_split(host, '.') AS labels FROM h),
        r AS (SELECT doc_id, host,
                CASE WHEN array_to_string(labels[len(labels)-1:], '.')
                          IN ('co.uk', 'com.au')
                     THEN array_to_string(labels[len(labels)-2:], '.')
                     ELSE array_to_string(labels[len(labels)-1:], '.')
                END AS reg_domain,
                CASE WHEN array_to_string(labels[len(labels)-1:], '.')
                          IN ('co.uk', 'com.au')
                     THEN array_to_string(labels[len(labels)-1:], '.')
                     ELSE labels[len(labels)] END AS suffix
              FROM l),
        b AS (SELECT DISTINCT reg_domain FROM r
              WHERE substring(md5('blk:' || reg_domain), 1, 1)
                    IN ('0','1','2','3')),
        k AS (SELECT r.doc_id, r.host, r.suffix, r.reg_domain,
                (b.reg_domain IS NOT NULL) AS blocked,
                row_number() OVER (PARTITION BY r.reg_domain
                  ORDER BY ${SamplingPipeline.drawExpr("r.doc_id", "urlcap")},
                           r.doc_id) AS rk
              FROM r LEFT JOIN b USING (reg_domain))"""

  /** q101's DuckDB verdict — shared VERBATIM with q331, whose bloom
    * stage is recall-1 pruning only (FPs die at the exact verify), so
    * the two paths must grade identically. */
  private val OContaminationVerdict: String =
    s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
          planted AS (SELECT doc_id + 3000000 AS doc_id,
                             array_to_string(str_split(text, ' ')[2:], ' ') AS text
                      FROM bench WHERE len(str_split(text, ' ')) >= 10),
          corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
                     UNION ALL SELECT doc_id, text FROM planted),
          $eightGramsSql,
          btok AS (SELECT doc_id, str_split(text, ' ') AS words FROM bench
                   WHERE len(str_split(text, ' ')) >= 8),
          b8 AS (SELECT DISTINCT doc_id,
                        array_to_string(words[pos:pos+7], ' ') AS g
                 FROM (SELECT doc_id, words,
                              unnest(generate_series(1, len(words) - 7)) AS pos
                       FROM btok)),
          bcap AS (SELECT g, doc_id AS bench_id FROM (
                     SELECT b.*, count(*) OVER (PARTITION BY g) AS bn FROM b8 b)
                   WHERE bn <= $BenchGramCap),
          hits AS (SELECT c.doc_id, p.bench_id, count(*) AS overlap
                   FROM g8 c JOIN bcap p USING (g)
                   GROUP BY 1, 2
                   HAVING count(*) >= $ContaminationMinOverlap)
          SELECT doc_id, CAST(count(DISTINCT bench_id) AS BIGINT) AS n_bench_docs,
                 CAST(max(overlap) AS BIGINT) AS max_overlap
          FROM hits GROUP BY doc_id ORDER BY doc_id"""

  def oracles: Map[String, String] = Map(
    "q311_url_curation" ->
      s"""WITH $urlOracleCtes
          SELECT suffix,
                 count(DISTINCT host) AS n_hosts,
                 count(DISTINCT reg_domain) AS n_domains,
                 count(*) AS n_docs,
                 CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_blocked,
                 CAST(sum(CASE WHEN NOT blocked AND rk <= $DomainDocCap
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(sum(CASE WHEN NOT blocked AND rk > $DomainDocCap
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
                 CAST(sum(CASE WHEN NOT blocked AND rk <= $DomainDocCap
                               THEN doc_id ELSE 0 END) AS BIGINT)
                   AS kept_id_sum
          FROM k GROUP BY suffix ORDER BY suffix""",

    // q315: the identical disposition graded through the streaming
    // engine — q311's census minus the host column
    "q315_stream_domain_cap" ->
      s"""WITH $urlOracleCtes
          SELECT suffix,
                 count(DISTINCT reg_domain) AS n_domains,
                 count(*) AS n_docs,
                 CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_blocked,
                 CAST(sum(CASE WHEN NOT blocked AND rk <= $DomainDocCap
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(sum(CASE WHEN NOT blocked AND rk > $DomainDocCap
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
                 CAST(sum(CASE WHEN NOT blocked AND rk <= $DomainDocCap
                               THEN doc_id ELSE 0 END) AS BIGINT)
                   AS kept_id_sum
          FROM k GROUP BY suffix ORDER BY suffix""",

    // q316: LCP via the monotone-prefix identity (count of k with equal
    // k-prefixes) — fold-free, same semantics as the Spark early-stop fold
    "q316_exact_repeats" ->
      s"""WITH corpus AS (
            SELECT doc_id, source, 'organic' AS cls, text FROM documents
            UNION ALL
            SELECT doc_id + 9000000 AS doc_id, source, 'xx_rep' AS cls,
                   text || ' ' || substring(text, 1, 80) AS text
            FROM documents WHERE doc_id % 9 = 4 AND length(text) >= 80),
          sfx AS (
            SELECT doc_id, source, cls,
              list_sort(list_transform(generate_series(1, length(text)),
                i -> substring(text, i, $RepeatLcpCap))) AS sf
            FROM corpus),
          lcp AS (
            SELECT doc_id, source, cls,
              CAST(list_max(list_transform(generate_series(1, len(sf) - 1),
                p -> len(list_filter(
                       generate_series(1, least(length(sf[p]),
                                                length(sf[p+1]))),
                       k -> substring(sf[p], 1, k) =
                            substring(sf[p+1], 1, k))))) AS BIGINT)
                AS max_rep
            FROM sfx)
          SELECT source, cls, count(*) AS n_docs,
                 max(max_rep) AS max_max_rep,
                 CAST(sum(max_rep) AS BIGINT) * 100 // count(*)
                   AS avg_rep_x100,
                 CAST(sum(CASE WHEN max_rep >= 20 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_over_20,
                 CAST(sum(CASE WHEN max_rep >= 40 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_over_40
          FROM lcp GROUP BY source, cls ORDER BY source, cls""",

    "q238_corpus_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
          b AS (SELECT doc_id,
                       CASE WHEN doc_id % 13 = 3 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 17 <> 5),
          sa AS (SELECT doc_id, md5(text) AS ha,
                        CAST(len(str_split(text, ' ')) AS BIGINT) AS ta FROM a),
          sb AS (SELECT doc_id, md5(text) AS hb,
                        CAST(len(str_split(text, ' ')) AS BIGINT) AS tb FROM b),
          j AS (SELECT ha, ta, hb, tb
                FROM sa FULL OUTER JOIN sb ON sa.doc_id = sb.doc_id),
          c AS (SELECT CASE WHEN ha IS NULL THEN 'added'
                            WHEN hb IS NULL THEN 'removed'
                            WHEN ha <> hb THEN 'changed'
                            ELSE 'unchanged' END AS change_type, ta, tb
                FROM j)
          SELECT change_type, count(*) AS n_docs,
                 CAST(sum(coalesce(ta, 0)) AS BIGINT) AS tokens_a,
                 CAST(sum(coalesce(tb, 0)) AS BIGINT) AS tokens_b,
                 CAST(sum(coalesce(tb, 0) - coalesce(ta, 0)) AS BIGINT)
                   AS token_delta
          FROM c GROUP BY change_type ORDER BY change_type""",

    "q186_seeded_shuffle" ->
      """WITH h AS (
            SELECT 42 AS seed, doc_id,
                   md5(CAST(doc_id AS VARCHAR) || ':42') AS h FROM documents
            UNION ALL
            SELECT 7, doc_id,
                   md5(CAST(doc_id AS VARCHAR) || ':7') FROM documents),
          r AS (SELECT seed, doc_id,
                       row_number() OVER (PARTITION BY seed ORDER BY h) AS pos
                FROM h)
          SELECT seed, doc_id, CAST(pos AS BIGINT) AS pos
          FROM r WHERE pos <= 64 ORDER BY seed, pos""",

    "q232_effective_epochs" ->
      s"""WITH per AS (SELECT source,
                  CAST(len(str_split(text, ' ')) AS BIGINT) AS toks,
                  CAST($mixFloorCase AS BIGINT) +
                    CASE WHEN ($MixDrawExpr) < $mixThreshCase
                         THEN 1 ELSE 0 END AS nc
             FROM documents),
          agg AS (SELECT source,
                  count(*) AS n_docs_in,
                  CAST(sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_docs_sampled,
                  CAST(sum(nc) AS BIGINT) AS n_draws,
                  CAST(max(nc) AS BIGINT) AS max_copies,
                  CAST(sum(toks * nc) AS BIGINT) AS tokens_drawn,
                  CAST(sum(toks * greatest(nc - 1, 0)) AS BIGINT) AS rt
             FROM per GROUP BY source)
          SELECT source, n_docs_in, n_docs_sampled, n_draws, max_copies,
                 tokens_drawn,
                 CASE WHEN tokens_drawn = 0 THEN 0
                      ELSE (rt * 10000) // tokens_drawn END AS repeat_bp
          FROM agg ORDER BY source""",

    "q187_mixture_sample" ->
      s"""WITH u AS (SELECT source, ($MixDrawExpr) AS u,
                  $mixFloorCase AS w_floor,
                  $mixThreshCase AS u_thresh
             FROM documents),
          c AS (SELECT source,
                       w_floor + CASE WHEN u < u_thresh THEN 1 ELSE 0 END
                         AS n_copies
                FROM u)
          SELECT source, count(*) AS n_docs,
                 CAST(sum(n_copies) AS BIGINT) AS n_copies,
                 CAST(sum(n_copies) * 10000 // count(*) AS BIGINT) AS rate_bp
          FROM c GROUP BY source ORDER BY source""",

    "q188_sequence_pack" ->
      s"""WITH t AS (SELECT doc_id, source,
                  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
             FROM documents),
          c AS (SELECT doc_id, source, n_tok,
                       COALESCE(sum(n_tok) OVER (PARTITION BY source
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS cum_before
                FROM t)
          SELECT doc_id, source, n_tok,
                 CAST(cum_before // $SeqPackLen AS BIGINT) AS seq_id,
                 CAST(cum_before % $SeqPackLen AS BIGINT) AS start_off,
                 CAST(((cum_before + n_tok - 1) // $SeqPackLen)
                      - (cum_before // $SeqPackLen) AS BIGINT) AS n_straddles
          FROM c ORDER BY doc_id""",

    // q304: the q188 prefix-sum CTEs, per-sequence occupancy via
    // generate_series over touched sequences, exact integer pair sums.
    "q304_pack_attention" ->
      s"""WITH t AS (SELECT doc_id, source,
                  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
             FROM documents),
          c AS (SELECT doc_id, source, n_tok,
                       COALESCE(sum(n_tok) OVER (PARTITION BY source
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS cum
                FROM t WHERE n_tok > 0),
          occ AS (SELECT source,
                         unnest(generate_series(CAST(cum // $SeqPackLen AS BIGINT),
                           CAST((cum + n_tok - 1) // $SeqPackLen AS BIGINT))) AS seq,
                         cum, n_tok
                  FROM c),
          tok AS (SELECT source, seq,
                         least((seq + 1) * $SeqPackLen, cum + n_tok)
                           - greatest(seq * $SeqPackLen, cum) AS t
                  FROM occ),
          per AS (SELECT source, seq, sum(t) AS tt, sum(t * t) AS s2,
                         count(*) AS n_docs_in
                  FROM tok GROUP BY source, seq)
          SELECT source, CAST(count(*) AS BIGINT) AS n_seqs,
                 CAST(sum(CASE WHEN n_docs_in > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS mixed_seqs,
                 CAST(sum((tt * tt - s2) // 2) AS BIGINT) AS cross_pairs,
                 CAST(sum((tt * (tt - 1)) // 2) AS BIGINT) AS total_pairs,
                 CAST(CASE WHEN sum((tt * (tt - 1)) // 2) = 0 THEN 0
                      ELSE (sum((tt * tt - s2) // 2) * 10000)
                           // sum((tt * (tt - 1)) // 2) END AS BIGINT)
                   AS contamination_bp
          FROM per GROUP BY source ORDER BY source""",

    "q206_packing_report" ->
      s"""WITH t AS (SELECT doc_id, source,
                  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
             FROM documents),
          c AS (SELECT doc_id, source, n_tok,
                       COALESCE(sum(n_tok) OVER (PARTITION BY source
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS cum_before
                FROM t),
          s AS (SELECT source, count(*) AS n_docs,
                       CAST(SUM(n_tok) AS BIGINT) AS total_tok,
                       CAST(SUM(CASE WHEN ((cum_before + n_tok - 1) // $SeqPackLen)
                                      > (cum_before // $SeqPackLen)
                                     THEN 1 ELSE 0 END) AS BIGINT) AS cut_docs
                FROM c GROUP BY source)
          SELECT source, n_docs, total_tok,
                 CAST((total_tok + ${SeqPackLen - 1}) // $SeqPackLen AS BIGINT)
                   AS n_seqs,
                 CAST(total_tok * 10000
                      // (((total_tok + ${SeqPackLen - 1}) // $SeqPackLen)
                         * $SeqPackLen) AS BIGINT) AS fill_bp,
                 cut_docs,
                 CAST(cut_docs * 10000 // n_docs AS BIGINT) AS cut_rate_bp
          FROM s ORDER BY source""",

    // q299: three scalar aggregates unioned into the fixed metric table.
    "q299_dataset_card" ->
      s"""WITH d AS (SELECT doc_id, text, lang, source,
                  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
             FROM documents),
          base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                          CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
                          CAST(count(*) FILTER (
                            WHERE CAST(substring(source, 4) AS INT) % 3 = 2)
                            AS BIGINT) AS n_restricted,
                          CAST(count(DISTINCT source) AS BIGINT) AS n_sources
                   FROM d),
          dups AS (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS n_exact_dups
                   FROM (SELECT md5(text) AS fp, count(*) AS n FROM d GROUP BY fp)),
          ent AS (SELECT CAST(coalesce(sum(CAST(round(
                            -(CAST(c AS DOUBLE) / n)
                            * ln(CAST(c AS DOUBLE) / n) * 1000000)
                            AS BIGINT)), 0) AS BIGINT)
                    AS lang_entropy_unat
                  FROM (SELECT lang, count(*) AS c FROM d GROUP BY lang)
                  CROSS JOIN (SELECT count(*) AS n FROM d))
          SELECT metric, value FROM (
            SELECT 'n_docs' AS metric, n_docs AS value FROM base
            UNION ALL SELECT 'n_tokens', n_tokens FROM base
            UNION ALL SELECT 'mean_doc_tokens', n_tokens // n_docs FROM base
            UNION ALL SELECT 'n_sources', n_sources FROM base
            UNION ALL SELECT 'en_share_bp', (n_en * 10000) // n_docs FROM base
            UNION ALL SELECT 'lang_entropy_unat', lang_entropy_unat FROM ent
            UNION ALL SELECT 'exact_dup_docs', n_exact_dups FROM dups
            UNION ALL SELECT 'exact_dup_bp', (n_exact_dups * 10000) // n_docs
                      FROM dups CROSS JOIN base
            UNION ALL SELECT 'restricted_docs', n_restricted FROM base
            UNION ALL SELECT 'restricted_share_bp',
                             (n_restricted * 10000) // n_docs FROM base)
          ORDER BY metric""",

    // q289: q206's chain with the ONE L-independent prefix sum crossed
    // into the 4 budgets before the aggregate.
    "q289_pack_budget_sweep" ->
      s"""WITH t AS (SELECT doc_id, source,
                  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
             FROM documents),
          c AS (SELECT doc_id, source, n_tok,
                       COALESCE(sum(n_tok) OVER (PARTITION BY source
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS cum_before
                FROM t),
          l AS (SELECT CAST(unnest([512, 1024, 2048, 4096]) AS BIGINT)
                  AS seq_len),
          s AS (SELECT source, seq_len, count(*) AS n_docs,
                       CAST(SUM(n_tok) AS BIGINT) AS total_tok,
                       CAST(SUM(CASE WHEN ((cum_before + n_tok - 1) // seq_len)
                                      > (cum_before // seq_len)
                                     THEN 1 ELSE 0 END) AS BIGINT) AS cut_docs
                FROM c CROSS JOIN l GROUP BY source, seq_len)
          SELECT source, seq_len, n_docs, total_tok,
                 CAST((total_tok + seq_len - 1) // seq_len AS BIGINT)
                   AS n_seqs,
                 CAST(total_tok * 10000
                      // (((total_tok + seq_len - 1) // seq_len)
                         * seq_len) AS BIGINT) AS fill_bp,
                 cut_docs,
                 CAST(cut_docs * 10000 // n_docs AS BIGINT) AS cut_rate_bp
          FROM s ORDER BY source, seq_len""",

    "q190_length_buckets" ->
      s"""WITH t AS (SELECT CAST(len(str_split(text, ' ')) AS BIGINT)
                       AS n_tok FROM documents),
          b AS (SELECT n_tok, $LenBucketCase AS bucket_cap FROM t),
          agg AS (SELECT bucket_cap, count(*) AS n_docs,
                         sum(n_tok) AS sum_tok, max(n_tok) AS max_tok
                  FROM b GROUP BY bucket_cap)
          SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
                 CAST(n_docs AS BIGINT) AS n_docs,
                 CAST((n_docs + 31) // 32 AS BIGINT) AS n_batches,
                 CAST((n_docs * greatest(bucket_cap, max_tok) - sum_tok) * 10000
                      // (n_docs * greatest(bucket_cap, max_tok)) AS BIGINT)
                   AS waste_bp
          FROM agg ORDER BY bucket_cap""",

    // q198: streamed sampling must be indistinguishable from batch —
    // the oracle IS q187's.
    "q198_stream_mixture" ->
      s"""WITH u AS (SELECT source, ($MixDrawExpr) AS u,
                  $mixFloorCase AS w_floor,
                  $mixThreshCase AS u_thresh
             FROM documents),
          c AS (SELECT source,
                       w_floor + CASE WHEN u < u_thresh THEN 1 ELSE 0 END
                         AS n_copies
                FROM u)
          SELECT source, count(*) AS n_docs,
                 CAST(sum(n_copies) AS BIGINT) AS n_copies,
                 CAST(sum(n_copies) * 10000 // count(*) AS BIGINT) AS rate_bp
          FROM c GROUP BY source ORDER BY source""",

    // q196: same integer update unrolled.
    "q196_mixture_reweight" ->
      """WITH scored AS (SELECT source,
                  (len(list_distinct(str_split(text, ' '))) * 10000)
                    // len(str_split(text, ' ')) AS score_bp
             FROM documents),
          per_src AS (SELECT source, count(*) AS n_docs,
                             sum(score_bp) AS sum_bp
                      FROM scored GROUP BY source),
          g AS (SELECT sum(sum_bp) // sum(n_docs) AS corpus_score_bp,
                       count(*) AS n_sources
                FROM per_src),
          raw AS (SELECT source, n_docs, sum_bp // n_docs AS src_score_bp,
                         10000 // n_sources AS old_w_bp,
                         (sum_bp // n_docs) - corpus_score_bp AS advantage_bp,
                         greatest((10000 // n_sources) // 4,
                           least((10000 // n_sources) * 4,
                             ((10000 // n_sources) *
                              (10000 + (sum_bp // n_docs) - corpus_score_bp))
                               // 10000)) AS raw_w_bp
                  FROM per_src, g),
          t AS (SELECT sum(raw_w_bp) AS tot FROM raw)
          SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                 CAST(src_score_bp AS BIGINT) AS src_score_bp,
                 CAST(old_w_bp AS BIGINT) AS old_w_bp,
                 CAST(advantage_bp AS BIGINT) AS advantage_bp,
                 CAST((raw_w_bp * 10000) // tot AS BIGINT) AS new_w_bp
          FROM raw, t ORDER BY source""",

    // q195: same flags, 6 pair-aggregates unioned.
    "q195_filter_matrix" -> {
      val fs = Seq("f_len", "f_div", "f_wlen", "f_vocab")
      val fpairs = for { i <- fs.indices; j <- fs.indices if i < j }
        yield (fs(i), fs(j))
      val rows = fpairs.map { case (a, b) =>
        s"""SELECT '$a' AS f1, '$b' AS f2,
              CAST(sum(CASE WHEN $a AND $b THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
              CAST(sum(CASE WHEN $a AND NOT $b THEN 1 ELSE 0 END) AS BIGINT) AS n_f1_only,
              CAST(sum(CASE WHEN NOT $a AND $b THEN 1 ELSE 0 END) AS BIGINT) AS n_f2_only,
              CAST(sum(CASE WHEN NOT $a AND NOT $b THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
            FROM flags"""
      }.mkString("\nUNION ALL\n")
      s"""WITH d AS (SELECT doc_id, text, str_split(text, ' ') AS words,
                            CAST(len(str_split(text, ' ')) AS BIGINT) AS nw
                     FROM documents),
          w AS (SELECT doc_id, unnest(words) AS word FROM d),
          vocab AS (SELECT word FROM (SELECT word, count(*) AS c FROM w
                                      GROUP BY word
                                      ORDER BY c DESC, word LIMIT 16)),
          cov AS (SELECT w.doc_id, count(*) AS n_tok, count(v.word) AS n_inv
                  FROM w LEFT JOIN vocab v ON w.word = v.word
                  GROUP BY w.doc_id),
          flags AS (SELECT (nw BETWEEN 20 AND 1000) AS f_len,
                           (len(list_distinct(words)) * 2 >= nw) AS f_div,
                           (length(text) * 10 // nw BETWEEN 30 AND 90) AS f_wlen,
                           (n_inv * 10 >= n_tok * 8) AS f_vocab
                    FROM d JOIN cov USING (doc_id))
          $rows
          ORDER BY f1, f2"""
    },

    // q192: the four stages unrolled — every constant and CASE comes
    // from the same SamplingPipeline definitions the Spark side uses.
    "q192_sampling_pipeline" ->
      s"""WITH t AS (SELECT doc_id, source,
                  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
                  md5(CAST(doc_id AS VARCHAR) || ':42') AS epoch_order,
                  ($MixDrawExpr) AS u,
                  $mixFloorCase AS w_floor,
                  $mixThreshCase AS u_thresh
             FROM documents),
          c AS (SELECT *, w_floor + CASE WHEN u < u_thresh THEN 1 ELSE 0 END
                            AS n_copies
                FROM t),
          x AS (SELECT doc_id, source, n_tok, epoch_order,
                       unnest(generate_series(1, CAST(n_copies AS BIGINT)))
                         AS copy_idx
                FROM c WHERE n_copies > 0),
          k AS (SELECT *, epoch_order || ':' || CAST(doc_id AS VARCHAR)
                            || ':' || CAST(copy_idx AS VARCHAR) AS pack_key
                FROM x),
          p AS (SELECT *, COALESCE(sum(n_tok) OVER (PARTITION BY source
                            ORDER BY pack_key
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS cum
                FROM k)
          SELECT doc_id, CAST(copy_idx AS BIGINT) AS copy_idx, source, n_tok,
                 CAST(cum // $SeqPackLen AS BIGINT) AS seq_id,
                 CAST(cum % $SeqPackLen AS BIGINT) AS start_off,
                 CAST(((cum + n_tok - 1) // $SeqPackLen)
                      - (cum // $SeqPackLen) AS BIGINT) AS n_straddles,
                 CAST($LenBucketCase AS BIGINT) AS bucket_cap
          FROM p ORDER BY doc_id, copy_idx""",

    "q176_golden_record" ->
      """WITH v AS (
            SELECT doc_id AS entity, 0 AS ts, lang, source, n_chars
            FROM documents
            UNION ALL
            SELECT doc_id, 1, 'xx', NULL, NULL FROM documents
            WHERE doc_id % 4 = 1
            UNION ALL
            SELECT doc_id, 2, NULL, source || '_v2', n_chars + 5
            FROM documents WHERE doc_id % 6 = 2)
          SELECT entity,
                 arg_max(lang, ts) FILTER (WHERE lang IS NOT NULL) AS lang,
                 arg_max(source, ts) FILTER (WHERE source IS NOT NULL)
                   AS source,
                 CAST(arg_max(n_chars, ts) FILTER (WHERE n_chars IS NOT NULL)
                      AS BIGINT) AS n_chars,
                 count(*) AS n_versions
          FROM v GROUP BY entity ORDER BY entity""",

    "q141_novelty_score" ->
      """WITH tok AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents
                      WHERE len(str_split(text, ' ')) >= 8),
          g8 AS (SELECT DISTINCT doc_id,
                        array_to_string(words[pos:pos+7], ' ') AS g
                 FROM (SELECT doc_id, words,
                              unnest(generate_series(1, len(words) - 7)) AS pos
                       FROM tok)),
          dfreq AS (SELECT g, count(*) AS df FROM g8 GROUP BY g),
          agg AS (SELECT doc_id, count(*) AS n_grams,
                         sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_unique
                  FROM g8 JOIN dfreq USING (g) GROUP BY doc_id)
          SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                 CAST(n_unique AS BIGINT) AS n_unique,
                 CAST(n_unique * 10000 AS BIGINT) // CAST(n_grams AS BIGINT)
                   AS novelty_bp
          FROM agg ORDER BY doc_id""",

    "q126_entity_resolution" ->
      """WITH parts AS (SELECT p_partkey, p_name FROM part),
          entities AS (SELECT min(p_partkey) AS entity_id, p_name AS ent_name,
                              substr(p_name, 1, 2) AS blk
                       FROM parts GROUP BY p_name),
          dirty AS (SELECT p_partkey + 1000000 AS rec_id,
                           substr(p_name, 1, 2) || substr(p_name, 4) AS rec_name
                    FROM parts WHERE p_partkey % 5 = 0),
          cand AS (SELECT d.rec_id, d.rec_name, e.entity_id, e.ent_name,
                          levenshtein(d.rec_name, e.ent_name) AS lev
                   FROM dirty d JOIN entities e ON substr(d.rec_name, 1, 2) = e.blk),
          best AS (SELECT *, row_number() OVER (PARTITION BY rec_id
                                                ORDER BY lev, entity_id) AS rn
                   FROM cand)
          SELECT rec_id, rec_name, entity_id AS matched_entity,
                 ent_name AS matched_name, CAST(lev AS INTEGER) AS lev
          FROM best WHERE rn = 1 ORDER BY rec_id""",

    "q185_adaptive_threshold" ->
      """WITH scored AS (
            SELECT doc_id, lang,
                   (len(list_distinct(str_split(text, ' '))) * 10000)
                     // len(str_split(text, ' ')) AS score_bp
            FROM documents),
          hist AS (SELECT lang, score_bp, count(*) AS c
                   FROM scored GROUP BY 1, 2),
          cum AS (SELECT lang, score_bp, c,
                         sum(c) OVER (PARTITION BY lang
                                      ORDER BY score_bp) AS cum,
                         sum(c) OVER (PARTITION BY lang) AS n
                  FROM hist),
          thr AS (SELECT lang, score_bp AS threshold_bp, n FROM cum
                  WHERE cum >= (n + 3) // 4 AND cum - c < (n + 3) // 4)
          SELECT s.lang, CAST(t.n AS BIGINT) AS n_docs,
                 CAST(t.threshold_bp AS BIGINT) AS threshold_bp,
                 CAST(count(*) FILTER (WHERE s.score_bp >= t.threshold_bp)
                      AS BIGINT) AS n_kept,
                 CAST(count(*) FILTER (WHERE s.score_bp < t.threshold_bp)
                      AS BIGINT) AS n_dropped
          FROM scored s JOIN thr t USING (lang)
          GROUP BY s.lang, t.n, t.threshold_bp
          ORDER BY s.lang""",

    "q180_oov_rate" ->
      """WITH w AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word
                    FROM documents),
          vocab AS (SELECT word FROM (
                      SELECT word, count(*) AS c FROM w GROUP BY word
                      ORDER BY c DESC, word LIMIT 16)),
          per AS (SELECT w.doc_id, count(*) AS n_tokens,
                         count(*) FILTER (WHERE v.word IS NULL) AS n_oov
                  FROM w LEFT JOIN vocab v ON w.word = v.word
                  GROUP BY w.doc_id)
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(n_oov AS BIGINT) AS n_oov,
                 CAST(n_oov * 10000 AS BIGINT) // CAST(n_tokens AS BIGINT)
                   AS oov_bp,
                 CAST(CASE WHEN (n_oov * 10000) // n_tokens <= 3000
                           THEN 1 ELSE 0 END AS BIGINT) AS kept
          FROM per ORDER BY doc_id""",

    "q100_repetition" ->
      """WITH tok AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents
                      WHERE len(str_split(text, ' ')) >= 3),
          g3 AS (SELECT doc_id, array_to_string(words[pos:pos+2], ' ') AS g
                 FROM (SELECT doc_id, words,
                              unnest(generate_series(1, len(words) - 2)) AS pos
                       FROM tok)),
          pc AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
          agg AS (SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct
                  FROM pc GROUP BY doc_id)
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(n_grams AS BIGINT) AS n_grams,
                 CAST(n_distinct AS BIGINT) AS n_distinct,
                 round(1 - n_distinct / n_grams, 6) AS dup_ratio,
                 CASE WHEN round(1 - n_distinct / n_grams, 6) > 0.2
                      THEN 'repetitive' ELSE 'ok' END AS verdict
          FROM agg ORDER BY doc_id""",

    "q330_span_decontamination" ->
      s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
          planted AS (SELECT doc_id + 3000000 AS doc_id,
                             array_to_string(str_split(text, ' ')[2:], ' ') AS text
                      FROM bench WHERE len(str_split(text, ' ')) >= 10),
          corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
                     UNION ALL SELECT doc_id, text FROM planted),
          btok AS (SELECT doc_id, str_split(text, ' ') AS words FROM bench
                   WHERE len(str_split(text, ' ')) >= 8),
          b8 AS (SELECT DISTINCT doc_id,
                        array_to_string(words[pos:pos+7], ' ') AS g
                 FROM (SELECT doc_id, words,
                              unnest(generate_series(1, len(words) - 7)) AS pos
                       FROM btok)),
          bg AS (SELECT DISTINCT g FROM (
                   SELECT b.*, count(*) OVER (PARTITION BY g) AS bn FROM b8 b)
                 WHERE bn <= $BenchGramCap),
          ctok AS (SELECT doc_id, str_split(text, ' ') AS words FROM corpus
                   WHERE len(str_split(text, ' ')) >= 8),
          cpos AS (SELECT doc_id, pos,
                          array_to_string(words[pos:pos+7], ' ') AS g
                   FROM (SELECT doc_id, words,
                           unnest(generate_series(1, len(words) - 7)) AS pos
                         FROM ctok)),
          hits AS (SELECT DISTINCT doc_id, pos FROM cpos JOIN bg USING (g)),
          isl AS (SELECT doc_id, pos,
                    CASE WHEN pos > COALESCE(lag(pos) OVER (
                           PARTITION BY doc_id ORDER BY pos), -100) + 8
                         THEN 1 ELSE 0 END AS newi
                  FROM hits),
          isl2 AS (SELECT doc_id, pos,
                     sum(newi) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS island
                   FROM isl),
          spans AS (SELECT doc_id, island, min(pos) AS sstart,
                           max(pos) + 7 AS send
                    FROM isl2 GROUP BY 1, 2),
          tot AS (SELECT doc_id,
                         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words
                  FROM corpus),
          per_doc AS (SELECT t.doc_id,
                        CAST(COALESCE(sp.n_spans, 0) AS BIGINT) AS n_spans,
                        CAST(COALESCE(sp.removed, 0) AS BIGINT)
                          AS removed_words,
                        t.n_words
                      FROM tot t
                      LEFT JOIN (SELECT doc_id, count(*) AS n_spans,
                                   CAST(sum(send - sstart + 1) AS BIGINT)
                                     AS removed
                                 FROM spans GROUP BY doc_id) sp
                        USING (doc_id))
          SELECT CASE WHEN doc_id >= 3000000 THEN 'planted'
                      ELSE 'organic' END AS cls,
                 count(*) AS n_docs,
                 CAST(sum(CASE WHEN n_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_docs_hit,
                 CAST(sum(n_spans) AS BIGINT) AS n_spans,
                 CAST(sum(removed_words) AS BIGINT) AS removed_words,
                 CAST(sum(n_words) AS BIGINT) AS total_words,
                 CAST(sum(removed_words) * 10000 // sum(n_words) AS BIGINT)
                   AS removed_bp
          FROM per_doc GROUP BY 1 ORDER BY 1""",

    "q101_contamination" -> OContaminationVerdict,

    "q331_bloom_decontamination" -> OContaminationVerdict,
    // the streaming twin's verdict is the same table — one oracle, three
    // routes (exact join / bloom-routed / bloom-routed at ingest)
    "q333_stream_decontamination" -> OContaminationVerdict,

    "q335_prefix_cache" -> prefixCacheOracle,

    // the streamed census over the finite source must equal the batch
    // report exactly — ONE oracle for both engines' executions
    "q339_stream_prefix_cache" -> prefixCacheOracle,

    "q334_encoding_hygiene" ->
      s"""WITH planted AS (SELECT doc_id, source,
                 CASE WHEN doc_id % 11 = 3 THEN text || ' ' || chr(65533)
                      WHEN doc_id % 11 = 5 THEN text || chr(7)
                      WHEN doc_id % 11 = 7 AND instr(text, 'a') > 0
                        THEN substring(text, 1, instr(text, 'a') - 1) ||
                             chr(1072) ||
                             substring(text, instr(text, 'a') + 1)
                      ELSE text END AS text
               FROM documents),
          scored AS (SELECT doc_id, source,
                 instr(text, chr(65533)) > 0 AS has_repl,
                 regexp_matches(text,
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]') AS has_ctl,
                 CAST(length(text) - length(regexp_replace(text,
                   '[^\\x00-\\x7F]', '', 'g')) AS BIGINT) AS n_nonascii
               FROM planted),
          cls AS (SELECT *, CASE WHEN has_repl THEN 'c1_replacement'
                                 WHEN has_ctl THEN 'c2_control'
                                 WHEN n_nonascii >= 1 THEN 'c3_foreign_script'
                                 ELSE 'c0_clean' END AS cls
                  FROM scored),
          agg AS (SELECT source, cls, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(n_nonascii) AS BIGINT) AS n_nonascii_chars
                  FROM cls GROUP BY source, cls)
          SELECT source, cls, n_docs, n_nonascii_chars,
                 CAST(n_docs * 10000 //
                      sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
                   AS share_bp
          FROM agg ORDER BY source, cls""",

    // the ingest twin's census is the same table — one oracle, two routes
    "q336_stream_encoding_hygiene" ->
      s"""WITH planted AS (SELECT doc_id, source,
                 CASE WHEN doc_id % 11 = 3 THEN text || ' ' || chr(65533)
                      WHEN doc_id % 11 = 5 THEN text || chr(7)
                      WHEN doc_id % 11 = 7 AND instr(text, 'a') > 0
                        THEN substring(text, 1, instr(text, 'a') - 1) ||
                             chr(1072) ||
                             substring(text, instr(text, 'a') + 1)
                      ELSE text END AS text
               FROM documents),
          scored AS (SELECT doc_id, source,
                 instr(text, chr(65533)) > 0 AS has_repl,
                 regexp_matches(text,
                   '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]') AS has_ctl,
                 CAST(length(text) - length(regexp_replace(text,
                   '[^\\x00-\\x7F]', '', 'g')) AS BIGINT) AS n_nonascii
               FROM planted),
          cls AS (SELECT *, CASE WHEN has_repl THEN 'c1_replacement'
                                 WHEN has_ctl THEN 'c2_control'
                                 WHEN n_nonascii >= 1 THEN 'c3_foreign_script'
                                 ELSE 'c0_clean' END AS cls
                  FROM scored),
          agg AS (SELECT source, cls, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(sum(n_nonascii) AS BIGINT) AS n_nonascii_chars
                  FROM cls GROUP BY source, cls)
          SELECT source, cls, n_docs, n_nonascii_chars,
                 CAST(n_docs * 10000 //
                      sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
                   AS share_bp
          FROM agg ORDER BY source, cls""",

    "q216_source_overlap" ->
      s"""WITH sg AS (SELECT DISTINCT source,
                        array_to_string(words[pos:pos+7], ' ') AS g
                      FROM (SELECT source, words,
                              unnest(generate_series(1, len(words) - 7)) AS pos
                            FROM (SELECT source, str_split(text, ' ') AS words
                                  FROM documents
                                  WHERE len(str_split(text, ' ')) >= 8))),
          sizes AS (SELECT source, count(*) AS sz FROM sg GROUP BY source),
          capped AS (SELECT source, g FROM (
                       SELECT sg.*, count(*) OVER (PARTITION BY g) AS ns
                       FROM sg) WHERE ns >= 2 AND ns <= $SourceGramCap),
          pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                           count(*) AS n_shared
                    FROM capped a JOIN capped b
                      ON a.g = b.g AND a.source < b.source
                    GROUP BY 1, 2)
          SELECT src_a, src_b, n_shared,
                 CAST((n_shared * 10000) // least(sa.sz, sb.sz) AS BIGINT)
                   AS containment_bp
          FROM pairs
          JOIN sizes sa ON sa.source = src_a
          JOIN sizes sb ON sb.source = src_b
          ORDER BY src_a, src_b""",

    "q103_incremental_dedup" -> {
      val lanes = (0 until 8).map(i =>
        s"min(substr(md5(g), ${1 + 4 * i}, 4)) AS m$i").mkString(", ")
      val bandSel = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, m${2 * b} || m${2 * b + 1} AS bh FROM mh")
        .mkString(" UNION ALL ")
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
          newnear AS (SELECT doc_id + 4000000 AS doc_id,
                             array_to_string(str_split(text, ' ')[2:], ' ') AS text
                      FROM docs WHERE doc_id % 10 = 0
                        AND len(str_split(text, ' ')) >= 10),
          newfresh AS (SELECT doc_id + 5000000 AS doc_id,
                              array_to_string(list_reverse(str_split(text, ' ')), ' ') AS text
                       FROM docs WHERE doc_id % 10 = 5),
          incoming AS (SELECT * FROM newnear UNION ALL SELECT * FROM newfresh),
          allde AS (SELECT * FROM docs UNION ALL SELECT * FROM incoming),
          tok AS (SELECT doc_id, str_split(text, ' ') AS words FROM allde
                  WHERE len(str_split(text, ' ')) >= 3),
          sh AS (SELECT DISTINCT doc_id,
                        words[pos] || ' ' || words[pos+1] || ' ' || words[pos+2] AS g
                 FROM (SELECT doc_id, words,
                              unnest(generate_series(1, len(words) - 2)) AS pos
                       FROM tok)),
          mh AS (SELECT doc_id, $lanes FROM sh GROUP BY doc_id),
          bands AS ($bandSel),
          oldc AS (SELECT doc_id, band, bh FROM (
                     SELECT b.*, count(*) OVER (PARTITION BY band, bh) AS bn
                     FROM bands b WHERE doc_id < 4000000)
                   WHERE bn <= ${DedupQueries.DefaultMaxBucket}),
          cand AS (SELECT DISTINCT n.doc_id AS id1, o.doc_id AS id2
                   FROM bands n JOIN oldc o USING (band, bh)
                   WHERE n.doc_id >= 4000000),
          inter AS (SELECT c.id1, c.id2, count(*) AS i
                    FROM cand c
                    JOIN sh a ON a.doc_id = c.id1
                    JOIN sh b ON b.doc_id = c.id2 AND b.g = a.g
                    GROUP BY 1, 2),
          sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
          jac AS (SELECT i1.id1, i1.id2, i1.i / (sa.n + sb.n - i1.i) AS j
                  FROM inter i1
                  JOIN sizes sa ON sa.doc_id = i1.id1
                  JOIN sizes sb ON sb.doc_id = i1.id2),
          dup AS (SELECT id1 AS new_id, min(id2) AS best_old,
                         round(max(j), 6) AS max_j
                  FROM jac WHERE j >= 0.5 GROUP BY id1)
          SELECT i.doc_id AS new_id,
                 CASE WHEN d.best_old IS NULL THEN 'admit' ELSE 'duplicate' END AS verdict,
                 CAST(coalesce(d.best_old, -1) AS BIGINT) AS best_old,
                 coalesce(d.max_j, 0.0) AS max_j
          FROM incoming i LEFT JOIN dup d ON d.new_id = i.doc_id
          ORDER BY new_id"""
    },

    "q102_pii_redact" ->
      """WITH raw AS (SELECT doc_id,
              text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
              (CASE WHEN doc_id % 3 = 0
                    THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END) AS raw
            FROM documents)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
                 CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS INTEGER) AS n_phones,
                 CAST(length(regexp_replace(regexp_replace(raw,
                      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                      '555-[0-9]{4}', '<PHONE>', 'g')) AS INTEGER) AS redacted_len
          FROM raw ORDER BY doc_id""",

    "q252_pareto_mass" ->
      """WITH cum AS (SELECT source, doc_id, n_chars,
                            row_number() OVER w AS rk,
                            CAST(sum(n_chars) OVER w AS BIGINT) AS cum
                      FROM documents
                      WINDOW w AS (PARTITION BY source
                                   ORDER BY n_chars DESC, doc_id)),
          tot AS (SELECT source, count(*) AS n_docs,
                         CAST(sum(n_chars) AS BIGINT) AS total_chars
                  FROM documents GROUP BY source),
          rep AS (SELECT c.source, t.n_docs, t.total_chars,
                         min(CASE WHEN c.cum * 100 >= t.total_chars * 80
                                  THEN c.rk END) AS k80_docs,
                         CAST(sum(CASE WHEN c.rk <= (t.n_docs + 99) // 100
                                       THEN c.n_chars ELSE 0 END) AS BIGINT)
                           AS top1_chars
                  FROM cum c JOIN tot t USING (source)
                  GROUP BY 1, 2, 3)
          SELECT source, n_docs, total_chars, k80_docs,
                 (k80_docs * 10000) // n_docs AS k80_docs_bp,
                 (top1_chars * 10000) // total_chars AS top1pct_share_bp
          FROM rep ORDER BY source"""
  )
}
