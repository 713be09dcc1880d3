package graft.ext

import graft.Tables
import graft.ops.{davg, dsum, oAvg, oSum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language-ID
  * (stopword heuristic), quality scoring, token counting, document
  * fingerprinting, n-gram stats. All run as single scan → explode/groupBy
  * pipelines — the shuffles are keyed on doc_id or the n-gram itself, both
  * high-cardinality, so they parallelize cleanly at 100 TB.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private val en = Seq("the", "and", "of", "to", "a", "in", "is")
  private val de = Seq("der", "die", "das", "und", "ist", "nicht")
  private val es = Seq("el", "la", "los", "que", "por", "una")
  private val fr = Seq("le", "les", "des", "est", "dans", "pour")
  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Word-bigram (phrase) token stream of (idCol, w) rows, duplicates
    * included — the shared lexical-index tokenization of q119 and q125,
    * with [[oBigramTokens]] as its DuckDB twin and [[BigramStopCap]] the
    * shared stop-term cap. ONE implementation per engine side: a cap
    * divergence between hand-maintained copies of this logic was caught
    * in review (q125's Spark side had drifted to a 0.9N cap while its
    * oracle said 0.1N — latent until a corpus has a mid-frequency term). */
  private[ext] def bigramTokens(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("w"))

  /** DuckDB twin of [[bigramTokens]] — a SELECT over `$src`. */
  private[ext] def oBigramTokens(src: String, idCol: String): String =
    s"""SELECT $idCol, ws[i] || ' ' || ws[i + 1] AS w
        FROM (SELECT $idCol, ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM (SELECT $idCol, str_split(text, ' ') AS ws FROM $src)
              WHERE len(ws) >= 2)"""

  /** Terms in more than 1/[[BigramStopCap]] of documents are stop terms. */
  private[ext] val BigramStopCap = 10

  /** BM25 (k1=1.2, b=0.75) top-k per query over a (doc_id, text) corpus,
    * query docs selected by `queryPred` over doc_id: (qid, rank, doc_id,
    * score). Shared by q125 (graded ranking) and q221 (known-item eval) —
    * ONE implementation per engine side, [[oBm25Ctes]] is the twin.
    *
    * Plan notes (measured on q125): tf feeds five consumers (dl, corpus
    * stats, idf, query terms, the posting join); AQE exchange reuse
    * collapses the repeated subtree at runtime (a localCheckpoint variant
    * measured the same steady state with a worse cold pass). dl derives
    * from the aggregated tf table so the raw posting stream is shuffled
    * exactly once; query terms come from the already-aggregated tf table,
    * never a re-shuffle of the raw stream; corpus stats broadcast. */
  private[ext] def bm25TopK(corpus: DataFrame, queryPred: org.apache.spark.sql.Column,
                            k: Int,
                            candPred: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val toks = bigramTokens(corpus, "doc_id")
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    bm25TopKFromTf(tf, tf, queryPred, k, candPred)
  }

  /** The chain below the per-doc (doc_id, w, tf) table — the INDEX seam
    * (r16): q345 feeds a STANDING on-disk base index unioned with the
    * delta's freshly tokenized tf. tf is per-doc, so index ∪ delta is
    * row-identical to a from-scratch build — the equality the oracle
    * checks. `statsTf` is the table the corpus statistics (dl, N,
    * avgdl, df/idf) derive from — always `tf` in production; q345's
    * stats-not-refreshed knob passes the stale base index here (the
    * classic incremental-index bug: postings appended, global stats
    * not recomputed — fresh docs lose their dl rows and every idf is
    * stale). */
  private[ext] def bm25TopKFromTf(tf: DataFrame, statsTf: DataFrame,
                                  queryPred: org.apache.spark.sql.Column,
                                  k: Int,
                                  candPred: org.apache.spark.sql.Column): DataFrame = {
    val dl = statsTf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val na = dl.agg(count(lit(1)).as("n_docs"), davg(col("dl"), 6).as("avgdl"))
    val idf = statsTf.groupBy("w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(na))
      .filter(col("df") * BigramStopCap <= col("n_docs"))
      .select(col("w"),
        round(log(((col("n_docs") - col("df")).cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6).as("idf"),
        col("avgdl"))
    val qt = tf.filter(queryPred)
      .select(col("doc_id").as("qid"), col("w"))
    val term = qt.join(idf, "w").join(tf, "w")
      .join(dl, "doc_id")
      .filter(col("doc_id") =!= col("qid") && candPred)
      .select(col("qid"), col("doc_id"),
        round(col("idf") * ((col("tf").cast("double") * lit(2.2))
          / (col("tf").cast("double")
            + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))),
          6).as("ts"))
    val scored = term.groupBy("qid", "doc_id").agg(dsum(col("ts"), 6).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "rank", "doc_id", "score")
  }

  /** Session-memoized BM25 top-20 over the plain documents corpus with
    * the mod-50 query set — q125 (top-10 = a rank filter of it) and
    * q231 (stage-1 cascade candidates) are two reads of ONE lexical
    * index build (r16: the cluster-ledger / NSW-memo discipline applied
    * to BM25; the two queries each rebuilt the identical tf/idf/posting
    * chain per pass). Knob-free path, so the memo needs no knob key;
    * pinned via localCheckpoint — |queries|·20 rows. */
  private val bm25Cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      GraphOps.Pinned]()

  /** Free the pinned blocks and forget the memo — the NSW cache's
    * freeShared discipline (r16 advice: a bare clear() left the
    * checkpointed blocks to the context cleaner's GC schedule). */
  def clearBm25Cache(): Unit = {
    bm25Cache.values().forEach(_.free())
    bm25Cache.clear()
  }

  private[graft] def sharedDocBm25Top20(s: SparkSession, d: String): DataFrame = {
    GraphOps.sweepStopped(bm25Cache)(_._1)
    // r17: the ledger is built THROUGH the incremental path — standing
    // base postings read off the q345 disk index, only the 10% delta
    // tokenized fresh, stats over the merged table. tf is per-doc and
    // base/delta are doc-disjoint, so the merged posting table is ROW-
    // IDENTICAL to a from-scratch build and the ranking is bit-equal
    // (per-term scores round at the same grain, dsum is decimal-exact,
    // ties break on doc_id) — ExtensionSpec pins the equality. One
    // index maintenance serves all three lexical consumers (q125, q231,
    // q345), which is what an index owner actually operates: nobody
    // re-tokenizes the corpus because a second query arrived.
    bm25Cache.computeIfAbsent((s, d), _ => {
      val (_, tf) = bm25MergedTf(s, d)
      GraphOps.pin(bm25TopKFromTf(tf, tf, col("doc_id") % 50 === 0, 20,
        lit(true)))
    }).df
  }

  /** q345's STANDING base index: the (doc_id, w, tf) posting table of
    * the base corpus (doc_id % 10 ≠ 7), written to parquet once per
    * (session, dataset) — the q128 index-store precedent for the
    * lexical route. The incremental query READS this and tokenizes
    * only the delta. */
  private val bm25BaseIdxCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  def clearBm25BaseIndex(): Unit = bm25BaseIdxCache.clear()

  /** Build-once accessor for the standing base posting index (parquet
    * path) — extracted from q345 so the shared top-20 ledger build can
    * ride the same artifact. */
  private def bm25BaseIdx(s: SparkSession, d: String): String = {
    GraphOps.sweepStopped(bm25BaseIdxCache)(_._1)
    bm25BaseIdxCache.computeIfAbsent((s, d), _ => {
      val p = graft.ops.Scratch.dir("graft_bm25_idx") + "/tf"
      bigramTokens(Tables.documents(s, d).select("doc_id", "text")
          .filter(col("doc_id") % 10 =!= 7), "doc_id")
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(p)
      p
    })
  }

  /** (base postings read from the standing index, base ∪ freshly
    * tokenized delta) — the incremental-maintenance seam shared by the
    * q345 red-case (stale stats = score against the base table) and the
    * production ledger build. */
  private def bm25MergedTf(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val baseTf = s.read.parquet(bm25BaseIdx(s, d))
    val deltaTf = bigramTokens(Tables.documents(s, d).select("doc_id", "text")
        .filter(col("doc_id") % 10 === 7), "doc_id")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    (baseTf, baseTf.unionByName(deltaTf))
  }

  /** DuckDB twin of [[bm25TopK]]: the CTE chain `toks … ranked` over
    * corpus source `$src` with query predicate `$qtWhere` (over tf's
    * doc_id). The caller selects from `ranked` (qid, doc_id, score,
    * rank). */
  private[ext] def oBm25Ctes(src: String, qtWhere: String,
                             candWhere: String = "TRUE"): String =
    s"""toks AS (${oBigramTokens(src, "doc_id")}),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
        dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        na AS (SELECT count(*) AS n_docs, ${oAvg("CAST(dl AS DOUBLE)", 6)} AS avgdl FROM dl),
        idf AS (SELECT w,
                       round(ln((CAST(n_docs - df AS DOUBLE) + 0.5)
                                / (CAST(df AS DOUBLE) + 0.5) + 1.0), 6) AS idf,
                       avgdl
                FROM (SELECT w, count(*) AS df FROM tf GROUP BY w), na
                WHERE df * $BigramStopCap <= n_docs),
        qt AS (SELECT doc_id AS qid, w FROM tf WHERE $qtWhere),
        term AS (SELECT qt.qid, tf.doc_id,
                        round(idf * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                          / (CAST(tf AS DOUBLE)
                            + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                              + CAST(0.75 AS DOUBLE) * (CAST(dl.dl AS DOUBLE) / avgdl)))),
                          6) AS ts
                 FROM qt JOIN idf USING (w) JOIN tf USING (w)
                 JOIN dl ON dl.doc_id = tf.doc_id
                 WHERE tf.doc_id <> qt.qid AND $candWhere),
        scored AS (SELECT qid, doc_id, ${oSum("ts", 6)} AS score
                   FROM term GROUP BY qid, doc_id),
        ranked AS (SELECT qid, doc_id, score,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY score DESC, doc_id) AS rank
                   FROM scored)"""

  /** q134's merge-table size: ranks applied in priority order at encode. */
  private[ext] val EncodeMerges = 8

  /** q229's boilerplate bar: a chunk in more than this many documents is
    * template text, not content. Far below the planted footer's df
    * (n_docs/3) and far above organic chunk df at every fixture scale. */
  private[ext] val BoilerplateDocCap = 10

  def queries: Map[String, Q] = Map(
    // EVAL-HARNESS ANSWER SCORING (SQuAD-style token F1 + exact match)
    // — the scoring pass every LLM eval pipeline runs over (prediction,
    // gold) pairs, expressed as the corpus-scale operator it is: bag-of-
    // tokens F1 uses the MULTISET intersection Σ_t min(cnt_pred(t),
    // cnt_gold(t)) (repeated tokens credit once per occurrence — see the
    // knob for the classic set-based miscount), EM is string equality.
    // Three deterministic system arms derive from each gold (the first
    // 8 words of every ≥12-word doc, oracle-mirrored): 'exact' (EM
    // 100%), 'corrupt3' (every 3rd token replaced by an md5-derived
    // token — F1 ≈ 7500 bp, EM 0), and 'reversed' (same multiset,
    // reversed order — F1 exactly 10000 bp with EM 0: the bag-metric
    // blind spot the arm exists to demonstrate). All arithmetic is
    // integer bp; per-row work is an in-row O(k²) fold at k = 8.
    // Scale: ONE corpus scan, the three arms exploded in-row (map-only;
    // nothing per-pair is exchanged), census is a 3-group aggregate —
    // the operator is embarrassingly parallel at any corpus size.
    "q321_eval_token_f1" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): overlap
      // counted over DISTINCT shared tokens instead of the multiset min
      val interTerm =
        if (graft.Mutations.on("q321_set_intersection"))
          "CASE WHEN size(filter(pred, x -> x = w)) > 0 THEN 1L ELSE 0L END"
        else
          """CAST(least(size(filter(pred, x -> x = w)),
                        size(filter(gold, x -> x = w))) AS BIGINT)"""
      val scored = Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 12)
        .withColumn("gold", expr("slice(ws, 1, 8)"))
        .withColumn("ap", explode(expr("""array(
            named_struct('arm', 'exact', 'pred', gold),
            named_struct('arm', 'corrupt3', 'pred',
              transform(sequence(1, size(gold)),
                j -> CASE WHEN j % 3 = 0
                       THEN substring(md5(concat(CAST(doc_id AS STRING), ':',
                                                 CAST(j AS STRING))), 1, 6)
                       ELSE element_at(gold, j) END)),
            named_struct('arm', 'reversed', 'pred', reverse(gold)))""")))
        .select(col("doc_id"), col("gold"),
          col("ap.arm").as("arm"), col("ap.pred").as("pred"))
        .withColumn("inter", expr(
          s"aggregate(array_distinct(gold), CAST(0 AS BIGINT), (a, w) -> a + $interTerm)"))
        .withColumn("f1_bp", expr(
          "(2 * inter * 10000) DIV (size(pred) + size(gold))"))
        .withColumn("em", (concat_ws(" ", col("pred")) ===
          concat_ws(" ", col("gold"))).cast("long"))
      scored.groupBy("arm")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("em")).as("n_em"),
          expr("sum(f1_bp) DIV count(1)").as("mean_f1_bp"),
          sum(when(col("f1_bp") === 10000, 1L).otherwise(0L)).as("n_perfect"),
          min(col("f1_bp")).as("min_f1_bp"))
        .orderBy("arm")
    }),

    // Vocabulary-growth curve (Heaps' law checkpoints) — how fast the
    // distinct BIGRAM-type vocabulary grows as the corpus is ingested
    // in doc_id order, measured at the 10/25/50/100% document
    // checkpoints: the tokenizer-budget question (is the phrase
    // vocabulary saturating, or does doubling the corpus keep minting
    // new types?) answered with exact integers instead of a fitted
    // exponent. Bigram types, not unigrams: the fixture's closed word
    // vocabulary saturates in the first checkpoint, while the
    // combinatorial space keeps growing — which is also the unit a
    // BPE-style tokenizer actually budgets for. Each type reduces to
    // its FIRST-appearance doc; vocab at a checkpoint is then one
    // filtered count — no per-checkpoint rescan of the corpus.
    // Scale: one corpus explode into a word-keyed min aggregate
    // (map-side partial min); checkpoints are a 4-row broadcast the
    // word table fans against. The fixture's doc_ids are dense so the
    // cutoff is (n_docs·pct) DIV 100 directly; production ids would
    // take the cutoff from an id quantile instead — same plan.
    // VOCABULARY HEALTH report card — the one-row corpus diagnostic a
    // tokenizer team reads before training: type and token volume,
    // type-token ratio, hapax/dis-legomena shares (the long-tail mass
    // that blows up vocab size without earning merges), and how much of
    // the token stream the top-10 types absorb (the stop-word ceiling
    // on compression). All integer basis points — no Zipf log-log fit,
    // so the card is bit-exact cross-engine.
    // Scale: ONE word-keyed count aggregate over the corpus (map-side
    // combine), then type-level rollups; the top-10 mass is
    // TakeOrderedAndProject over the type table, never a token sort.
    "q244_vocab_health" -> ((s, d) => {
      val freq = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("c"))
      val tot = freq.agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_dis"))
      val top10 = freq.orderBy(col("c").desc, col("w")).limit(10)
        .agg(sum(col("c")).as("top10_tokens"))
      tot.crossJoin(top10)
        .select(col("n_types"), col("n_tokens"),
          expr("(n_types * 10000) DIV n_tokens").as("type_token_bp"),
          col("n_hapax"),
          expr("(n_hapax * 10000) DIV n_types").as("hapax_share_bp"),
          col("n_dis"),
          expr("(top10_tokens * 10000) DIV n_tokens").as("top10_mass_bp"))
    }),

    "q218_vocab_growth" -> ((s, d) => {
      val pcts = Seq(10, 25, 50, 100)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
      val nd = docs.agg(count(lit(1)).as("nd"))
      val wordMin = bigramTokens(Tables.documents(s, d), "doc_id")
        .groupBy("w").agg(min(col("doc_id")).as("first_doc"))
      val docToks = docs.select(col("doc_id"),
        size(col("words")).cast("long").as("toks"))
      val cps = nd.select(explode(array(pcts.map(lit(_)): _*)).as("pct"), col("nd"))
        .withColumn("cutoff", expr("(nd * pct) DIV 100"))
        .select("pct", "cutoff")
      val vocab = wordMin.crossJoin(broadcast(cps))
        .filter(col("first_doc") < col("cutoff"))
        .groupBy("pct", "cutoff").agg(count(lit(1)).as("vocab"))
      val toks = docToks.crossJoin(broadcast(cps))
        .filter(col("doc_id") < col("cutoff"))
        .groupBy("pct").agg(sum(col("toks")).as("n_tokens"))
      vocab.join(toks, "pct")
        .select(col("pct"), col("cutoff").as("n_docs_cut"),
          col("n_tokens"), col("vocab"))
        .orderBy("pct")
    }),

    // Paragraph-level boilerplate fraction — the CCNet/Dolma-style
    // chunk-dedup audit, the third dedup granularity after whole-doc
    // (q40) and character runs (q116): split every doc into
    // non-overlapping 8-word chunks, count how many documents each
    // chunk appears in, and report per source what share of its chunk
    // mass is boilerplate (a chunk in > [[BoilerplateDocCap]] docs).
    // A fixed 16-word header planted on every 3rd doc is the ground
    // truth: planted as a PREFIX so it always aligns with the chunk
    // grid (fixed-stride chunking is alignment-sensitive — a footer
    // planted at the tail lands mid-chunk for most doc lengths and
    // dilutes into unique chunks; measured before switching), giving
    // exactly two boilerplate chunks per planted doc. Trailing
    // sub-8-word tails are dropped (both engines, by the same DIV).
    // Scale: one corpus pass explodes chunks; the chunk-df aggregate is
    // chunk-keyed with map-side partials; the df table joins back on
    // the same key — no pair work, ever. (This is the REMOVAL side's
    // audit: production drops flagged chunks in the same pass.)
    "q229_boilerplate_fraction" -> ((s, d) => {
      val header = "subscribe to our newsletter for updates and follow " +
        "us on all social media channels today friends"
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 3 === 0, concat(lit(header + " "), col("text")))
            .otherwise(col("text")).as("text"))
      val chunks = docs
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 8)
        .select(col("doc_id"), col("source"), explode(expr(
          """transform(sequence(0, CAST(size(ws) DIV 8 AS INT) - 1),
               i -> concat_ws(' ', slice(ws, i * 8 + 1, 8)))""")).as("chunk"))
      val df = chunks.select(col("doc_id"), col("chunk")).distinct()
        .groupBy("chunk").agg(count(lit(1)).as("n_docs_with"))
      chunks.join(df, "chunk")
        .withColumn("is_boiler",
          when(col("n_docs_with") > BoilerplateDocCap, 1L).otherwise(0L))
        .groupBy("source").agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("is_boiler")).as("n_boiler_chunks"),
          countDistinct(when(col("is_boiler") === 1, col("doc_id"))).as("n_docs_with_boiler"))
        .withColumn("boiler_bp", expr("(n_boiler_chunks * 10000) DIV n_chunks"))
        .select("source", "n_docs", "n_chunks", "n_boiler_chunks",
          "n_docs_with_boiler", "boiler_bp")
        .orderBy("source")
    }),

    // Collocation mining by pointwise mutual information — the classic
    // phrase-discovery pass (word2vec's phrase pre-join, terminology
    // extraction). PMI = log P(a,b)/(P(a·)P(·b)) is monotone in the
    // integer cross-ratio n_ab·N / (n_a·n_b), so ranking happens in
    // exact fixed-point basis points (×10000, truncating DIV) — no
    // cross-engine log/float. All probabilities come from ONE bigram
    // count table: marginals are re-aggregations of the (a,b) counts
    // (vocab²-bounded, broadcast back), N is a one-row crossJoin, and
    // the min-support n_ab ≥ 5 filter kills the hapax pairs that
    // saturate PMI. The only ordered step is the global top-20, which
    // runs as TakeOrderedAndProject (per-partition heads + a 20-row
    // merge), never a full sort.
    "q152_pmi_collocations" -> ((s, d) => {
      val ws = Tables.documents(s, d)
        .select(split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
      val cab = ws.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), " +
            "i -> struct(element_at(ws, i) AS a, element_at(ws, i + 1) AS b))"))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      val ca = cab.groupBy("a").agg(sum(col("n_ab")).as("n_a"))
      val cb = cab.groupBy("b").agg(sum(col("n_ab")).as("n_b"))
      val n = cab.agg(sum(col("n_ab")).as("n_total"))
      cab.filter(col("n_ab") >= 5)
        .join(broadcast(ca), "a").join(broadcast(cb), "b")
        .crossJoin(broadcast(n))
        .withColumn("pmi_bp", expr("(n_ab * n_total * 10000) DIV (n_a * n_b)"))
        .select("a", "b", "n_ab", "pmi_bp")
        .orderBy(col("pmi_bp").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Language-ID confusion matrix: labeled lang × stopword-predicted lang.
    "q60_lang_id" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("word"))
      val scores = words.groupBy("doc_id", "lang").agg(
        count(when(col("word").isin(en: _*), 1)).as("s_en"),
        count(when(col("word").isin(de: _*), 1)).as("s_de"),
        count(when(col("word").isin(es: _*), 1)).as("s_es"),
        count(when(col("word").isin(fr: _*), 1)).as("s_fr"))
      val pred = scores.withColumn("predicted",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
             col("s_en") >= col("s_fr") && col("s_en") > 0, "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") &&
                col("s_de") > 0, "de")
          .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
          .when(col("s_fr") > 0, "fr")
          .otherwise("und"))
      pred.groupBy("lang", "predicted").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "predicted")
    }),

    // Quality scoring: length/word-shape/stopword-ratio heuristics.
    "q61_quality_score" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("n_words", size(col("words")))
        .withColumn("n_stop",
          size(filter(col("words"), w => w.isin((en ++ de ++ es ++ fr): _*))))
        .withColumn("stop_ratio", col("n_stop") / col("n_words"))
        .withColumn("avg_word_len",
          (length(col("text")) - (col("n_words") - 1)) / col("n_words"))
        .withColumn("quality_bucket",
          when(col("n_words") < 30, "too_short")
            .when(col("stop_ratio") > 0.15, "stopword_heavy")
            .when(col("avg_word_len") > 5.5, "long_words")
            .otherwise("ok"))
        .select("doc_id", "n_words", "n_stop", "stop_ratio", "avg_word_len", "quality_bucket")
        .orderBy("doc_id")
    }),

    // Token counting: whitespace split vs a BPE-ish regex tokenizer.
    "q62_token_count" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).as("re_tokens"),
          size(array_distinct(split(col("text"), " "))).as("distinct_tokens"))
        .orderBy("doc_id")
    }),

    // Document fingerprint: normalize → hash → group (content clustering).
    "q63_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))).as("fp"))
        .groupBy("fp")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .select("keep_id", "fp", "n")
        .orderBy("keep_id")
    }),

    // Corpus-level top word-bigrams.
    "q64_top_bigrams" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 2)
        .select(explode(sequence(lit(1), size(col("words")) - 1)).as("pos"), col("words"))
        .select(expr("concat_ws(' ', element_at(words, pos), element_at(words, pos + 1))").as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(30)
    }),

    // Bigram language-model scoring: train P(w2|w1) = c(w1,w2)/c(w1·) on
    // the corpus itself, score each doc by its mean bigram log-probability
    // — the perplexity-style quality filter of training-data curation.
    // Each log-prob is rounded to 6 decimals BEFORE the decimal-exact mean
    // (ln is ulp-unsafe cross-engine; rounded it is stable — q27
    // precedent). Shuffles key on the bigram/context token — high
    // cardinality, no broadcast of the (vocab-sized) model tables.
    "q73_lm_score" -> ((s, d) => {
      val bi = Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 2)
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("words")) - 1)).as("pos"), col("words"))
        .select(col("doc_id"),
          expr("element_at(words, pos)").as("w1"),
          expr("element_at(words, pos + 1)").as("w2"))
      val biCnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val ctxCnt = bi.groupBy("w1").agg(count(lit(1)).as("cu"))
      bi.join(biCnt, Seq("w1", "w2")).join(ctxCnt, Seq("w1"))
        .select(col("doc_id"),
          round(log(col("cb").cast("double") / col("cu")), 6).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), davg(col("lp"), 6).as("lm_score"))
        .orderBy("doc_id")
    }),

    // Full BM25 ranking (k1=1.2, b=0.75): the production lexical scorer —
    // true term frequencies, document-length normalization against the
    // corpus mean, and the BM25+ log-idf. q119's fusion uses integer
    // overlap weights; this is the real thing. Terms are word BIGRAMS
    // (phrase postings) with stop terms (df > N/10) dropped before the
    // posting join — same discriminativeness rationale as q119: this
    // fixture's 31-word unigram vocabulary is ALL stop words (a unigram
    // variant measured 17s at sf0.1 from ~15M posting pairs; the bigram
    // index is ~1.3s). At 100 TB the posting join shuffles on TERM, doc
    // stats ride the posting rows, and the corpus statistics (N, avgdl)
    // are one broadcast scalar row. Float hygiene: idf is ln rounded to
    // 6dp (q73's ulp-safe pattern), each per-term score is rounded to 6dp
    // before the decimal-exact per-document sum — order-independent and
    // engine-identical.
    "q125_bm25" -> ((s, d) =>
      // top-10 = a rank filter of the memoized top-20 (same scoring,
      // same window order — the index is built once per session and
      // shared with q231's cascade)
      sharedDocBm25Top20(s, d).filter(col("rank") <= 10)
        .orderBy("qid", "rank")),

    // INCREMENTAL BM25 INDEX MAINTENANCE — the lexical member of the
    // incremental family (IVF q128, Merkle q329, MV q157, manifest
    // q124): a STANDING posting index on disk (the base corpus'
    // (doc, term, tf) table — built once per session, the q128
    // index-store precedent) absorbs a 10%-of-corpus delta by
    // tokenizing ONLY the delta and unioning posting rows; dl/N/avgdl/
    // idf are recomputed over the merged table (count merges — exact
    // by construction). tf is per-doc, so index ∪ delta is ROW-
    // IDENTICAL to a from-scratch build: the oracle computes BM25 from
    // scratch over the full corpus, and equality IS the incremental ==
    // rebuild witness (the q329 discipline). from_delta marks hits
    // that came from the newly ingested docs — the freshness readout
    // an index owner actually watches after a merge.
    // Scale: the whole point — at 100 TB the base is never re-
    // tokenized; the merge is one doc-disjoint union + the standard
    // stats rollups over the merged postings.
    // Mutation seam (knob OFF in every production plan): postings
    // appended but global stats NOT recomputed — fresh docs lose their
    // dl rows and every idf is stale; rankings shift wherever a delta
    // doc should have placed.
    "q345_incremental_bm25" -> ((s, d) => {
      // r17: the incremental build (standing index + delta-only
      // tokenize + merged stats) IS the shared lexical ledger's build
      // path now — sharedDocBm25Top20 performs the maintenance once per
      // session and q125/q231/q345 all consume the merged index, so the
      // graded top-10 is a rank filter of that ledger (row-identical to
      // the old per-call build: same merged tf, same stats, same
      // rounding, ties on doc_id). The stats-not-refreshed red-case
      // must score against STALE base stats, so it bypasses the ledger
      // and builds from the seam directly — knob isolation by
      // construction (the knob-on path never touches the memo).
      val ranked =
        if (graft.Mutations.on("q345_stats_not_refreshed")) {
          val (baseTf, tf) = bm25MergedTf(s, d)
          bm25TopKFromTf(tf, baseTf, col("doc_id") % 50 === 0, 10, lit(true))
        } else sharedDocBm25Top20(s, d).filter(col("rank") <= 10)
      ranked
        .withColumn("from_delta", (col("doc_id") % 10 === 7).cast("long"))
        .orderBy("qid", "rank")
    }),

    // KNOWN-ITEM retrieval eval — the self-labeling quality gate for the
    // lexical index: plant a near-copy (+2M, first word dropped — the
    // q54-corpus mutation) of every 25th long-enough doc, query BM25
    // with the ORIGINAL, and ask whether its copy tops the ranking.
    // MRR@10 in exact ppm (1e6 DIV rank — integer, no float means),
    // plus hit@1 / hit@10 counts. This completes the eval suite: q204
    // grades the vector route with nDCG, q210 grades the dedup LSH,
    // q221 grades the lexical route — each against a truth the corpus
    // itself defines. Shares ALL machinery with q125 via [[bm25TopK]]
    // (one implementation per engine side, the bigramTokens rule).
    // Scale: identical plan shape to q125 on the augmented corpus; the
    // eval join is queries-sized.
    "q221_bm25_mrr" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val copies = docs
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 10)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat_ws(" ", expr("slice(words, 2, size(words) - 1)")).as("text"))
      val corpus = docs.unionByName(copies)
      val ranked = bm25TopK(corpus,
        col("doc_id") % 25 === 0 && col("doc_id") < 2000000L, 10)
      // eligible queries: those whose planted copy exists
      val expected = copies.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") - 2000000L).as("qid"), col("doc_id").as("hit_id"))
      val found = ranked.join(expected,
        ranked("qid") === expected("qid") && ranked("doc_id") === expected("hit_id"))
        .select(expected("qid"), col("rank"))
      expected.join(found, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("rank"), lit(0)).as("rank"))
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("rank") === 1, 1L).otherwise(0L)).as("n_hit1"),
          sum(when(col("rank") >= 1, 1L).otherwise(0L)).as("n_hit10"),
          expr("sum(IF(rank >= 1, 1000000 DIV rank, CAST(0 AS BIGINT)))")
            .as("rr_sum_ppm"))
        .select(col("n_queries"), col("n_hit1"), col("n_hit10"),
          expr("rr_sum_ppm DIV n_queries").as("mrr_ppm"))
    }),

    // One BPE tokenizer-training round at corpus scale: count adjacent
    // symbol pairs over the WORD-TYPE table (the first groupBy collapses
    // the corpus to its vocabulary — the standard BPE trick that makes
    // every later round vocabulary-sized, not corpus-sized), pick the
    // argmax pair (count desc, pair asc tie-break), apply the merge
    // greedily, recount. Output: the chosen merge + top-20 pairs after it.
    //
    // Merge application is a LITERAL string replace, exact by
    // construction: each symbol is rendered as " <sym>;" — the leading
    // space and trailing ';' bound both ends (';' is outside the corpus
    // alphabet, pinned by TextAnalysisSpec), and replace()'s left-to-right
    // non-overlapping scan IS greedy BPE. A lookaround regex would need
    // PCRE (DuckDB's RE2 has none); a fold over the symbol array has no
    // DuckDB init-value twin — the delimited-string form works identically
    // in both engines. At 100 TB: one corpus shuffle on word, then
    // vocabulary-sized pair aggregations; the merge pair is a broadcast
    // scalar.
    "q121_bpe_merge" -> ((s, d) => {
      val words = wordTypes(Tables.documents(s, d))
      val sym0 = words.select(
        regexp_replace(col("word"), "(.)", " $1;").as("symstr"), col("n"))
      val top1 = pairCounts(sym0).orderBy(col("cnt").desc, col("pair")).limit(1)
        .select(col("pair").as("mp"))
      val merged = sym0.crossJoin(broadcast(top1))
        .select(expr(
          "replace(symstr, ' ' || replace(mp, ' ', '; ') || ';', " +
            "' ' || replace(mp, ' ', '') || ';')").as("symstr"),
          col("n"))
      val w = Window.orderBy(col("cnt").desc, col("pair"))
      pairCounts(merged).crossJoin(broadcast(top1))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("pair"), col("cnt"), col("mp").as("first_merge"))
        .orderBy("rank")
    }),

    // BPE ENCODE — the apply half of q121's training round: a fixed
    // priority-ranked merge table (top-[[EncodeMerges]] pairs of the
    // initial pair counts; a trained tokenizer's merge list is exactly
    // such a ranked artifact) applied to every word type in priority
    // order. The merge table is COLLECTED to the driver once — it is a
    // model artifact, control-plane sized like q57's bound prefetch —
    // and each merge is one literal `replace` on the ` sym;` rendering
    // (greedy left-to-right non-overlapping by q121's argument), so
    // the whole encode is [[EncodeMerges]] fused map-only expressions
    // over ONE word-type aggregation. The earlier one-row-broadcast-
    // per-rank formulation recomputed the corpus aggregate and the
    // global rank window once per merge (~9 redundant corpus passes —
    // review catch), and annihilated the table outright when fewer
    // than [[EncodeMerges]] pairs existed (empty crossJoin); the
    // driver fold does neither. lit() patterns, not string-spliced
    // SQL, so no escaping hazard. Output: the most frequent word
    // types with their post-merge tokenization and compression.
    "q134_bpe_encode" -> ((s, d) => {
      bpeEncodedTypes(Tables.documents(s, d))
        .withColumn("syms",
          expr("filter(transform(split(symstr, ';'), x -> trim(x)), x -> x <> '')"))
        .select(col("word"), col("n"),
          length(col("word")).cast("long").as("n_chars"),
          size(col("syms")).cast("long").as("n_tokens"),
          concat_ws(" ", col("syms")).as("encoding"))
        .orderBy(col("n").desc, col("word")).limit(30)
    }),

    // Hashed linear quality classifier (the fastText-style serving
    // shape): token → 12-bit feature bucket (md5 slice), bucket →
    // integer weight in [−2048, 2047] derived from a second md5 slice —
    // a deterministic stand-in for trained weights that keeps the
    // fixture self-contained; production swaps the weight EXPRESSION
    // for a broadcast weight-vector lookup, the plan is identical.
    // Score = (Σ token weights) DIV n_tokens, all integer (the q120
    // lesson: no cross-engine float). One explode + one doc_id
    // aggregate: map-side partial aggregation collapses each doc's
    // tokens before the shuffle, so the exchange carries |docs| rows,
    // not |tokens| — embarrassingly parallel at any corpus size.
    "q136_quality_classifier" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val scored = toks
        .withColumn("m", md5(col("tok")))
        .withColumn("wgt", expr(
          "(instr('0123456789abcdef', substring(md5(substring(m, 1, 3)), 1, 1)) - 1) * 256 + " +
            "(instr('0123456789abcdef', substring(md5(substring(m, 1, 3)), 2, 1)) - 1) * 16 + " +
            "(instr('0123456789abcdef', substring(md5(substring(m, 1, 3)), 3, 1)) - 1) - 2048"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("wgt")).as("w_total"))
      scored
        .select(col("doc_id"), col("n_tokens"),
          expr("w_total DIV n_tokens").as("score_fp"),
          (expr("w_total DIV n_tokens") > 0).as("keep"))
        .orderBy("doc_id")
    }),

    // The REAL multi-round BPE training loop — [[trainBpe]] iterating
    // q121's single round [[EncodeMerges]] times: count pairs over the
    // vocabulary, argmax (count desc, pair asc), apply the merge, recount.
    // This closes the last "one round of X" placeholder in the text
    // stack: q121 demos the round, q134 demos the apply-side, q191
    // grades the composed trainer. Oracle = the same rounds unrolled as
    // SQL CTEs (the q114 power-iteration pattern).
    "q191_bpe_train" -> ((s, d) =>
      trainedMerges(s, d, EncodeMerges)),

    // The tokenizer EVAL curve — train (q191's loop) then apply the
    // merges cumulatively and report corpus token totals per merge
    // count: the artifact that decides how many merges a tokenizer is
    // worth. Every apply step is a literal replace over the word-TYPE
    // table (vocabulary-sized, q121's argument) and each curve point is
    // one tiny aggregate; the baseline (0 merges = characters) rides
    // the same union. Grades the train→apply COMPOSITION end to end.
    "q197_bpe_compression" -> ((s, d) => {
      // r17: the merge table is the shared trained artifact
      // ([[trainedMerges]] — one training serves q191 and this curve)
      val merges = trainedMerges(s, d, EncodeMerges)
        .orderBy("rank").select("pair").collect().map(_.getString(0)).toSeq
      val sym0 = wordTypes(Tables.documents(s, d)).select(
        regexp_replace(col("word"), "(.)", " $1;").as("symstr"), col("n"))
      val frames = merges.scanLeft(sym0) { (df, mp) =>
        df.select(call_function("replace", col("symstr"),
          lit(" " + mp.replace(" ", "; ") + ";"),
          lit(" " + mp.replace(" ", "") + ";")).as("symstr"), col("n"))
      }
      val curve = frames.zipWithIndex.map { case (df, k) =>
        df.select(col("n"),
            expr("size(filter(transform(split(symstr, ';'), x -> trim(x)), x -> x <> ''))")
              .cast("long").as("n_syms"))
          .agg(sum(col("n") * col("n_syms")).as("total_tokens"))
          .select(lit(k).as("n_merges"), col("total_tokens"))
      }.reduce(_ unionByName _)
      val base = curve.filter(col("n_merges") === 0)
        .select(col("total_tokens").as("base_tokens"))
      curve.crossJoin(broadcast(base))
        .select(col("n_merges"), col("total_tokens"),
          expr("(total_tokens * 10000) DIV base_tokens").as("compression_bp"))
        .orderBy("n_merges")
    }),

    // LEXICAL CONCENTRATION audit — the diversity lens q244's TTR
    // misses: two sources can share a type/token ratio while one
    // spreads mass evenly and the other is 40% a single word. Per
    // source: Gini–Simpson diversity 1 − Σp² in integer bp (each
    // term's p is first fixed to bp — c·10000 DIV N — then weighted by
    // its count and renormalized, identical truncation both engines;
    // no float Σp² whose summation order could drift), plus the
    // dominant word and its bp share — the release report reads both
    // (low diversity + a stopword dominant is prose; low diversity +
    // a content-word dominant is a template scrape).
    // Scale: ONE (source, word) posting shuffle with map-side partial
    // counts — the q125/q66 discipline; the Σ over types and the
    // dominant-word argmax are per-source aggregates over the posting
    // table, and the struct-max argmax needs no second window pass.
    "q253_lexical_diversity" -> ((s, d) => {
      val posting = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("source", "word").agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds three branches; materialize the shuffle once
      val totals = posting.groupBy("source")
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
          max(col("c")).as("top_c"))
      val dom = posting.join(broadcast(totals.select("source", "top_c")), "source")
        .filter(col("c") === col("top_c"))
        .groupBy("source").agg(max(col("word")).as("top_word"))
      val conc = posting.join(broadcast(totals.select("source", "n_tokens")), "source")
        .groupBy("source")
        .agg(sum(expr("(c * 10000 DIV n_tokens) * c")).as("conc_num"))
      totals.join(conc, "source").join(dom, "source")
        .select(col("source"), col("n_tokens"), col("n_types"),
          expr("10000 - conc_num DIV n_tokens").as("simpson_bp"),
          col("top_word"),
          expr("(top_c * 10000) DIV n_tokens").as("top_share_bp"))
        .orderBy("source")
    }),

    // WORD BURSTINESS — the Church–Gale dispersion statistic TF-IDF
    // and PMI don't expose: a word's variance-to-mean ratio of
    // per-document counts (zeros included). Function words hover near
    // VMR ≈ 1 (Poisson-ish scatter); topical/template words are
    // BURSTY — absent almost everywhere, dense where they land. For
    // the 20 heaviest words (count desc, word tie-break):
    // vmr_c = 100·(N·Σc² − (Σc)²) DIV (N·Σc) — the ×100 fixed-point
    // VMR, exact in BIGINT (N·Σc²·100 ≲ 1.4e18 at sf10; the bound is
    // documented, not hoped).
    // Scale: one (doc, word) shuffle for per-doc counts, one word-
    // keyed rollup for the moments (both map-side combined), and the
    // top-20 is TakeOrderedAndProject — per-partition heaps, never a
    // full sort of the vocabulary.
    "q254_word_burstiness" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val perDoc = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      perDoc.groupBy("word")
        .agg(count(lit(1)).as("df"), sum(col("c")).as("tot"),
          sum(col("c") * col("c")).as("s2"))
        .crossJoin(broadcast(n))
        .select(col("word"), col("df"), col("tot"),
          expr("((n_docs * s2 - tot * tot) * 100) DIV (n_docs * tot)")
            .as("vmr_c"))
        .orderBy(col("tot").desc, col("word")).limit(20)
    }),

    // TRIGRAM-INDEX substring search — the pg_trgm pattern: a LIKE
    // '%pat%' scan accelerated by character-trigram candidacy.
    // Candidates = docs containing EVERY trigram of the pattern
    // (guaranteed superset of true matches for patterns ≥ 3 chars —
    // recall is structural, which the n_verified = n_direct columns
    // prove per pattern); verification = exact substring test on
    // candidates only; the report prices index precision in bp (the
    // decision input for whether the index pays for a given pattern
    // length). Three patterns of different lengths sweep the knob.
    // Scale: the pattern set is a FIXED ≤ 8 trigram literals, so the
    // index probe compiles to a handful of codegen'd substring scans —
    // ONE map-side pass computing (candidate?, direct-hit?) per
    // (doc, pattern) with zero joins and zero pre-aggregation
    // exchanges; the only shuffle is the 3-row-per-partition partial
    // rollup. (The r15 shape exploded every doc into its trigram
    // stream and re-joined docs for verification — the allocation
    // churn behind its 1.8× quiet-to-loaded swing. A posting-table
    // plan only pays when patterns are ad-hoc; the oracle keeps that
    // formulation, proving the two equivalent.)
    "q275_trigram_search" -> ((s, d) => {
      val patterns = Seq("par", "windo", "agg")
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val arms = patterns.map { p =>
        val tris = p.sliding(3).toSeq.distinct
        val nt = tris.map(t =>
          when(locate(t, col("text")) > 0, 1).otherwise(0)).reduce(_ + _)
        struct(lit(p).as("pattern"),
          (nt === lit(tris.size)).cast("long").as("is_cand"),
          (locate(p, col("text")) > 0).cast("long").as("is_direct"))
      }
      docs.select(explode(array(arms: _*)).as("a"))
        .groupBy(col("a.pattern").as("pattern"))
        .agg(sum(col("a.is_cand")).as("n_candidates"),
          sum(col("a.is_cand") * col("a.is_direct")).as("n_verified"),
          sum(col("a.is_direct")).as("n_direct"))
        .filter(col("n_candidates") > 0)
        .select(col("pattern"), col("n_candidates"), col("n_verified"),
          col("n_direct"),
          expr("(n_verified * 10000) DIV n_candidates").as("precision_bp"))
        .orderBy("pattern")
    }),

    // SCORE-DECILE gains table — the classifier eval ROC curves hide
    // from a pipeline owner: rank the corpus by a score, cut into ten
    // EXACT rank deciles, and report each decile's positive share and
    // the cumulative lift over the base rate (a useful ranker front-
    // loads positives: lift ≫ 10000 in decile 0, → 10000 by decile 9).
    // Score = en-stopword share in bp (the q61 signal family). The
    // fixture's lang label is TEXT-INDEPENDENT (measured: 'the'
    // appears in ~72% of docs of every lang), so any honest text score
    // is liftless against it — a dead eval. The label is therefore
    // PLANTED as a calibrated-classifier coin (the q240/q242 in-query
    // plant discipline): pos iff the doc's md5 hex digit (0..15) falls
    // below score_bp DIV 312 — the coin's bias is monotone in the
    // score, which is exactly the property a gains table exists to
    // surface, and the whole plant is deterministic on both engines.
    // Deciles WITHOUT a global document sort: the (score, pos) census
    // is domain-bounded (≤ 10001 score values × 2), a total order
    // (score desc, pos asc) makes every cell's rank interval exact,
    // and the q260 overlap trick splits boundary ties exactly — ties
    // resolve negatives-first, so the reported lift is the
    // CONSERVATIVE reading of tied scores on both engines.
    // Scale: one corpus pass builds the census; everything after —
    // cumulative, decile explode (×10), 10-row lift window — runs on
    // the bounded census. BIGINT bound: cum_pos·n·10⁴ ≲ 4e15 at sf1.
    "q269_score_deciles" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("n_words", size(col("words")).cast("long"))
        .withColumn("n_stop",
          size(filter(col("words"), w => w.isin(en: _*))).cast("long"))
        .withColumn("score_bp", expr("(n_stop * 10000) DIV n_words"))
        .withColumn("hv", expr(
          "instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1)) - 1"))
        .select((col("hv") < expr("score_bp DIV 312")).as("pos"),
          col("score_bp"))
        .groupBy("score_bp", "pos").agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("score_bp").desc, col("pos"))
      val tot = cells.agg(sum(col("c")).as("n"),
        sum(when(col("pos"), col("c")).otherwise(0L)).as("npos"))
      val dec = cells.withColumn("cum", sum(col("c")).over(w))
        .crossJoin(broadcast(tot))
        .select(col("pos"), col("c"), col("cum"), col("n"), col("npos"),
          explode(expr("sequence(0, 9)")).as("decile"))
        // [[graft.Mutations]]: shift the interval's lower bound up by one
        // (the boundary-row loss that silently deflates every decile cut
        // — the bug class the hash must catch at each decile edge)
        .withColumn("kept", expr(
          s"""greatest(CAST(0 AS BIGINT),
               least(cum, ((decile + 1) * n) DIV 10)
               - greatest(cum - c, (decile * n) DIV 10${
            if (graft.Mutations.on("q269_interval_lower_off_by_one")) " + 1"
            else ""}))"""))
        .groupBy(col("decile"), col("n"), col("npos"))
        .agg(sum(col("kept")).as("n_docs"),
          sum(when(col("pos"), col("kept")).otherwise(0L)).as("n_pos"))
      val wd = Window.orderBy("decile")
      dec.withColumn("cum_n", sum(col("n_docs")).over(wd))
        .withColumn("cum_pos", sum(col("n_pos")).over(wd))
        .select(col("decile"), col("n_docs"), col("n_pos"),
          expr("(n_pos * 10000) DIV greatest(n_docs, 1)").as("pos_bp"),
          expr("(cum_pos * n * 10000) DIV (cum_n * greatest(npos, 1))").as("cum_lift_bp"))
        .orderBy("decile")
    }),

    // TOKENIZER FERTILITY by language — the per-cohort cost metric a
    // multilingual tokenizer review reads: average BPE tokens per word
    // (fertility) and characters per token, per lang, under the SAME
    // global q134 merge table (a shared tokenizer serves every
    // language; per-lang training would hide exactly the imbalance
    // this measures). A high-fertility language pays more sequence
    // length per word of content — the q217 token-budget lens, priced
    // per language. Centi-fixed-point integers throughout.
    // Scale: the encode stage is per word TYPE (vocabulary-sized, the
    // q134 contract); the per-(lang, word) counts ride one posting
    // shuffle; the final rollup is |langs| rows.
    "q259_tokenizer_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val enc = bpeEncodedTypes(docs)
        .select(col("word"),
          expr("size(filter(transform(split(symstr, ';'), x -> trim(x)), x -> x <> ''))")
            .cast("long").as("toks"))
      val perLang = docs
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("lang", "word").agg(count(lit(1)).as("n"))
      perLang.join(enc, "word")
        .groupBy("lang")
        .agg(sum(col("n")).as("n_words"),
          sum(col("n") * col("toks")).as("n_tokens"),
          sum(col("n") * length(col("word")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          expr("(n_tokens * 100) DIV n_words").as("fertility_c"),
          expr("(n_chars * 100) DIV n_tokens").as("chars_per_token_c"))
        .orderBy("lang")
    }),

    // Sliding-window CHUNKING with overlap — the RAG/pretraining prep
    // step between curation and embedding: every doc splits into
    // 32-token windows at stride 24 (8-token overlap carries context
    // across boundaries), the last window short. Chunk count is pure
    // integer (1 + ceil((n_tok − W)/S) via (x + S−1) DIV S — no float
    // ceil, the q190 ladder discipline), and each chunk row carries the
    // md5 of its EXACT token slice, so the oracle verifies the slicing
    // itself, not just the bookkeeping: a one-off start or length
    // produces a different fingerprint. Map-only: each doc explodes
    // into its own chunks locally — no shuffle, no join; at 100 TB this
    // is one codegen'd projection pass (the chunk table then feeds
    // embedding/packing downstream).
    "q283_chunk_overlap" -> ((s, d) =>
      chunked(Tables.documents(s, d).select("doc_id", "text"))
        .select("doc_id", "chunk_idx", "start_tok", "chunk_len", "chunk_md5")
        .orderBy("doc_id", "chunk_idx")),

    // Chunk-level BOILERPLATE census — exact dedup at q283's chunk
    // granularity, the sub-document twin of q40: chunk the corpus, then
    // census every fingerprint that recurs across documents. The
    // planted structure tells the whole story of this method's power
    // AND its blind spot: a 40-token header prepended to every 7th doc
    // is stride-ALIGNED (every copy starts at token 1), so its first
    // window fingerprints identically corpus-wide and the census
    // catches the full span in one group; a 40-token footer appended to
    // every 5th doc lands at a doc-dependent offset, so its windows
    // only collide between docs sharing the same length residue mod
    // stride — the census fragments it into small alignment classes
    // (exactly why UNaligned boilerplate needs the shingle/winnowing
    // machinery, q116). Scale: chunking is map-only; the census is one
    // (chunk_md5)-keyed count with map-side partials; top-25 rides
    // TakeOrdered, no global sort.
    // Skip-gram CO-OCCURRENCE counts — the (center, context) table
    // word-embedding training (word2vec/GloVe) consumes: symmetric ±3
    // window, integer distance weight 4−|offset| (the linear decay
    // word2vec's dynamic window approximates in expectation — but
    // deterministic, no sampled window sizes). q64/q152 count ADJACENT
    // bigrams; this is the general windowed pair table, and its top-20
    // by weighted mass is the graded head. Scale: map-side position ×
    // offset explode (≤6 pairs per token, bounded fan-out) into ONE
    // (center, context)-keyed count with map-side partials; top-20
    // rides TakeOrdered. At 100 TB this is the standard one-shuffle
    // co-occurrence build.
    "q286_skipgram_counts" -> ((s, d) =>
      skipgramPairs(Tables.documents(s, d))
        .groupBy("center", "context")
        .agg(count(lit(1)).as("n_pairs"), sum(col("w")).as("w_sum"))
        .orderBy(col("w_sum").desc, col("center"), col("context"))
        .limit(20)),

    // q286 through the REAL streaming engine — the co-occurrence table
    // is exactly the artifact a production pipeline maintains
    // INCREMENTALLY as the corpus grows: the pair explode is stateless
    // (the shared [[skipgramPairs]] seam runs unchanged on a streaming
    // DataFrame), per-batch partial counts merge in the state store,
    // and Complete mode makes the final table equal the batch
    // aggregation — so the DuckDB oracle is q286's VERBATIM, the
    // stream==batch discipline of q170/q143/q198. Top-20 is batch-side
    // post-processing on the completed (vocab²-bounded) count table.
    "q295_stream_skipgram" -> ((s, d) => {
      val docs = graft.streaming.StreamingPipelines.documentsStream(s, d)
      val agg = skipgramPairs(docs)
        .groupBy("center", "context")
        .agg(count(lit(1)).as("n_pairs"), sum(col("w")).as("w_sum"))
      graft.streaming.StreamingPipelines.runToCompletion(s, agg)
        .orderBy(col("w_sum").desc, col("center"), col("context"))
        .limit(20)
    }),

    // TextRank KEYWORD extraction (Mihalcea & Tarau '04) — damped
    // PageRank over q286's word co-occurrence graph: a word matters
    // when it co-occurs with words that matter. The corpus-level
    // keyword list is the labeling/topic-tag primitive a curation
    // pipeline runs after counting (q286 builds the table, this ranks
    // it). Composition is total seam reuse: the pair stream is
    // [[skipgramPairs]] (ONE definition with q286 — the window knob
    // red-cases both), the update is [[GraphQueries.dampedUpdate]]
    // (ONE seam with q120/q243 — the damping knob now covers FOUR
    // queries), rounds = [[GraphQueries.PageRankRounds]]. Weighted
    // TextRank update in MICRO-rank fixed point (1e6 = rank 1.0, not
    // q120's nano): per-edge contribution (r·w_ij) DIV wdeg_i needs
    // the r×w product in range — micro units bound it ≤ ~1e17 at any
    // plausible corpus scale (nano would overflow Long at ~10⁵ vocab
    // × heavy hubs), and 1e-6 quantization is irrelevant to a top-20
    // ranking. Scale: identical shape to q120 — the edge table
    // (distinct word pairs) shuffles once on src per round carrying
    // its weighted degree; the rank vector is vocab-sized; top-20
    // rides TakeOrdered. Nothing collects to the driver.
    "q288_textrank_keywords" -> ((s, d) => {
      val e = skipgramPairs(Tables.documents(s, d))
        .groupBy(col("center").as("src"), col("context").as("dst"))
        .agg(sum(col("w")).as("wsum"))
      val wd = e.groupBy("src").agg(sum(col("wsum")).as("wdeg"))
      val ew = e.join(wd, "src")
      val nodes = wd.select(col("src").as("node"))
      var ranks = nodes.withColumn("r", lit(1000000L))
      for (_ <- 1 to GraphQueries.PageRankRounds) {
        val contrib = ew.join(ranks, col("src") === col("node"))
          .groupBy("dst").agg(sum(expr("(r * wsum) DIV wdeg")).as("cs"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            expr(GraphQueries.dampedUpdate("150000")).as("r"))
      }
      ranks.select(col("node").as("word"),
          (col("r").cast("double") / lit(1e6)).as("tr"))
        .orderBy(col("tr").desc, col("word")).limit(20)
    }),

    // VOCAB BUDGET SWEEP — the tuning curve behind q180's fixed
    // 16-type vocabulary: corpus OOV token rate at vocab budgets
    // N ∈ {8, 16, 32, 64}, all priced from ONE word-count pass (the
    // q189/q207/q289 discipline). The vocab cut is the same total
    // order q180 uses (count desc, word asc); where the oov_bp curve
    // flattens is the budget a tokenizer team ships. Scale shape: one
    // token-keyed count shuffle (map-side partials), then the global
    // top-64 rides TakeOrderedAndProject — 64 rows, never a full
    // sort; those 64 ranked rows explode into the budgets that can
    // see them (rk <= N) and join the 1-row corpus totals. The curve
    // SATURATES when the budget exceeds the type inventory
    // (covered_types pins at n_types, oov at 0) — exercised at
    // sf0.001 where the corpus holds ~31 types.
    "q291_vocab_budget_sweep" -> ((s, d) => {
      val budgets = Seq(8L, 16L, 32L, 64L)
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
      val totals = wc.agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"))
      // bounded: the window ranks the 64 TakeOrdered survivors only
      val top = wc.orderBy(col("c").desc, col("word")).limit(64)
        .withColumn("rk",
          row_number().over(Window.orderBy(col("c").desc, col("word"))))
      top.select(col("c"), col("rk"),
          explode(array(budgets.map(lit(_)): _*)).as("vocab_budget"))
        .filter(col("rk") <= col("vocab_budget"))
        .groupBy("vocab_budget")
        .agg(count(lit(1)).as("covered_types"),
          sum(col("c")).as("covered_tokens"))
        .crossJoin(broadcast(totals))
        .select(col("vocab_budget"), col("covered_types"), col("n_types"),
          col("n_tokens"), col("covered_tokens"),
          (col("n_tokens") - col("covered_tokens")).as("oov_tokens"),
          expr("((n_tokens - covered_tokens) * 10000) DIV n_tokens")
            .as("oov_bp"))
        .orderBy("vocab_budget")
    }),

    // STOP-GRAM CAP SWEEP — the eval behind [[BigramStopCap]] (= 10):
    // BM25 drops every bigram appearing in more than 1/cap of the
    // corpus (df · cap > n_docs — boilerplate grams carry no ranking
    // signal and their postings dominate the index). This query prices
    // the cap at ∈ {2, 5, 10, 20, 40} from ONE posting pass (the
    // q189/q289 discipline): per cap, how many gram TYPES are stopped
    // and how much posting MASS (total occurrences) the index sheds,
    // both in exact counts + integer bp. Monotone by construction —
    // a larger cap stops a superset of grams (spec-pinned). Scale:
    // the same (gram)-keyed df/tf aggregate BM25 already pays; each
    // gram-type row explodes into the 5 caps; totals are a 1-row
    // broadcast. Zero per-cap corpus re-reads.
    "q298_stopcap_sweep" -> ((s, d) => {
      val caps = Seq(2L, 5L, 10L, 20L, 40L)
      val g = bigramTokens(Tables.documents(s, d).select("doc_id", "text"), "doc_id")
        .groupBy("w").agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("tf"))
      val tot = g.agg(count(lit(1)).as("n_grams"), sum(col("tf")).as("n_postings"))
      val nd = Tables.documents(s, d)
        .filter(size(split(col("text"), " ")) >= 2)
        .agg(count(lit(1)).as("n_docs"))
      val stopped = g.crossJoin(broadcast(nd))
        .select(col("df"), col("tf"), col("n_docs"),
          explode(array(caps.map(lit(_)): _*)).as("cap"))
        .filter(col("df") * col("cap") > col("n_docs"))
        .groupBy("cap")
        .agg(count(lit(1)).as("stopped_grams"),
          sum(col("tf")).as("stopped_postings"))
      // zero-hit caps still emit rows: the curve's domain is fixed
      s.range(1).select(explode(array(caps.map(lit(_)): _*)).as("cap"))
        .crossJoin(broadcast(tot))
        .join(stopped, Seq("cap"), "left")
        .select(col("cap"),
          coalesce(col("stopped_grams"), lit(0L)).as("stopped_grams"),
          col("n_grams"),
          expr("(coalesce(stopped_grams, 0) * 10000) DIV n_grams")
            .as("stopped_grams_bp"),
          coalesce(col("stopped_postings"), lit(0L)).as("stopped_postings"),
          col("n_postings"),
          expr("(coalesce(stopped_postings, 0) * 10000) DIV n_postings")
            .as("stopped_mass_bp"))
        .orderBy("cap")
    }),

    // CHUNK-GRANULARITY RETRIEVAL — the RAG index-granularity question
    // q221 (doc-level MRR) and q283 (the chunker) leave open: when the
    // index holds 32-token CHUNKS instead of whole documents, can a
    // known-item query still locate its source? Corpus = the docs
    // PLUS their chunks (re-keyed doc*1000+idx, offset so ids never
    // collide); queries = every 25th doc (q221's cadence) searching
    // with its full text; candidates restricted to chunks via
    // [[bm25TopK]]'s new candidate predicate (the query docs share
    // the postings build but never compete with their own chunks).
    // Output per query: its chunk count, the best rank any of its own
    // chunks reaches, how many of its chunks crowd the top-10, and
    // reciprocal rank in exact ppm — the fragmentation diagnostic
    // (one strong chunk vs the doc's term mass diluted across many).
    // Scale: one postings shuffle exactly like q125/q221 — the chunk
    // explode is bounded (~n_tok/stride rows per doc) and map-side.
    "q294_chunk_retrieval" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val ch = chunked(docs)
      val chunkDocs = ch.select(
        (col("doc_id") * 1000L + col("chunk_idx") + 1000000000L).as("doc_id"),
        col("chunk_text").as("text"))
      val ranked = bm25TopK(docs.unionByName(chunkDocs),
        col("doc_id") % 25 === 0 && col("doc_id") < 1000000000L, 10,
        col("doc_id") >= 1000000000L)
      val expected = docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("qid"))
      val nch = ch.groupBy(col("doc_id").as("qid"))
        .agg(count(lit(1)).as("n_chunks"))
      val own = ranked
        .filter(expr("(doc_id - 1000000000) DIV 1000") === col("qid"))
        .groupBy("qid").agg(min(col("rank")).as("best_rank"),
          count(lit(1)).as("n_own_top10"))
      expected.join(nch, "qid")
        .join(own, Seq("qid"), "left")
        .select(col("qid"), col("n_chunks"),
          coalesce(col("best_rank"), lit(0)).as("best_rank"),
          coalesce(col("n_own_top10"), lit(0L)).as("n_own_top10"),
          expr("IF(coalesce(best_rank, 0) >= 1, 1000000 DIV best_rank," +
            " CAST(0 AS BIGINT))").as("rr_ppm"))
        .orderBy("qid")
    }),

    "q285_boilerplate_chunks" -> ((s, d) => {
      val hdr = (0 until 40).map(i => s"b$i").mkString(" ")
      val ftr = (0 until 40).map(i => s"f$i").mkString(" ")
      val corpus = Tables.documents(s, d).select(col("doc_id"),
        concat(
          when(col("doc_id") % 7 === 3, lit(hdr + " ")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 5 === 2, lit(" " + ftr)).otherwise(lit("")))
          .as("text"))
      chunked(corpus)
        .groupBy("chunk_md5", "chunk_len")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("chunk_md5"))
        .limit(25)
    }),

    // UNIGRAM-LM TOKENIZER ROUND (SentencePiece-style) — the one
    // tokenizer family the merge-based BPE suite (q121/q134/q191) does
    // not cover: a vocabulary of substring PIECES with per-piece costs,
    // Viterbi best-segmentation of every word type, then one EM round
    // (usage-count M-step) grading vocabulary pruning by loss delta.
    // All arithmetic is exact-integer (the q120 discipline): a piece's
    // cost is its surprisal in WHOLE BITS — length(bin(total DIV cnt)),
    // i.e. ⌊log₂(total/cnt)⌋+1, computed purely on BIGINTs (no float
    // log whose last ulp could differ across engines) — and the Viterbi
    // tie-break is (cost, path-string) lexicographic, identical to the
    // oracle's ORDER BY cost, path. Seed vocabulary = every substring
    // piece of length ≤ [[UniMaxPieceLen]] with weighted corpus count ≥
    // [[UniMinPieceCnt]], plus ALL single characters (segmentability
    // guarantee); word types longer than [[UniMaxWordLen]] chars sit
    // outside the segmentable cohort (the operator's documented bound —
    // production SentencePiece bounds candidate length the same way).
    // The E-step DP runs IN-ROW: each word's vocab occurrences are
    // collected once and a single `aggregate` HOF walks positions
    // 1..len carrying the best (cost, path) per prefix — no per-round
    // joins, no lineage growth, one shuffle to collect and one to count
    // usage. Output: top-30 pieces by usage (corpus count, old/new bit
    // costs) + a '__vocab__' summary row (vocab size, corpus loss
    // before/after re-costing the same segmentation, pieces pruned) +
    // a '__fertility__' row comparing unigram fertility against the
    // BPE encode over the SAME word-type cohort (the q259 comparison,
    // via the shared [[bpeEncodedTypes]] seam).
    // Scale: occurrences are |types|·len·[[UniMaxPieceLen]] rows of
    // small structs; everything downstream is piece- or word-keyed
    // aggregation with map-side combine — no pair joins, no iteration.
    "q307_unigram_lm" -> ((s, d) => {
      val P = UniMaxPieceLen
      // mutation seam (knob OFF in every production plan): the DP frame
      // fencepost — max-length pieces silently unusable in the Viterbi
      // even though the vocabulary carries (and prices) them
      val dpP =
        if (graft.Mutations.on("q307_piece_len_fencepost")) P - 1 else P
      // r18 NOTE (measured): widening the single-split tokenize scan
      // (conditional repartition to defaultParallelism) moved nothing —
      // the 0.5s map stage runs OFF the critical path while the DP
      // chain below is the bottleneck; reverted per guide §1.3.
      val docs = Tables.documents(s, d)
      val types = wordTypes(docs).filter(length(col("word")) <= UniMaxWordLen)
      val occ = types.select(col("word"), col("n"), explode(expr(
          s"flatten(transform(sequence(1, length(word)), i -> " +
            s"transform(sequence(1, least($P, length(word) - i + 1)), " +
            s"l -> named_struct('i', i, 'l', l, 'piece', substring(word, i, l)))))"))
          .as("o"))
        .select(col("word"), col("n"), col("o.i").as("i"),
          col("o.l").as("l"), col("o.piece").as("piece"))
      val cnts = occ.groupBy("piece").agg(sum(col("n")).as("cnt"))
      val vocab = cnts.filter(
        length(col("piece")) === 1 || col("cnt") >= UniMinPieceCnt)
      val tot = vocab.agg(sum(col("cnt")).as("t"))
      val costed = vocab.crossJoin(broadcast(tot))
        .select(col("piece"), col("cnt"),
          expr("CAST(length(bin(t DIV cnt)) AS BIGINT)").as("bits"))
      // r18 (guide §2.2/§4): the Viterbi DP below is one giant aggregate
      // HOF per word type (interpreted lambdas, CPU-heavy on tiny
      // bytes), and AQE's byte-based coalescing ran it on a SINGLE
      // task. Repartitioning the occurrence rows by word BEFORE the
      // collect keeps exchange count identical (HashPartitioning(word)
      // satisfies the (word, n) grouping — same co-location, explicit
      // width AQE won't coalesce) and the DP then runs on
      // defaultParallelism tasks. Arithmetic untouched.
      val plist = occ.join(costed.select("piece", "bits"), "piece")
        .repartition(s.sparkContext.defaultParallelism, col("word"))
        .groupBy("word", "n")
        .agg(collect_list(struct(col("i"), col("l"), col("piece"),
          col("bits"))).as("ps"))
      val best = plist.withColumn("best", expr(s"""
        element_at(
          aggregate(
            sequence(1, length(word)),
            array(named_struct('cost', CAST(0 AS BIGINT), 'path', '')),
            (acc, j) -> concat(acc, array(
              array_min(filter(
                transform(sequence(1, least($dpP, j)), l ->
                  CASE WHEN size(filter(ps,
                         p -> p.i = j - l + 1 AND p.l = l)) = 1
                    THEN named_struct(
                      'cost', element_at(acc, j - l + 1).cost +
                        element_at(filter(ps,
                          p -> p.i = j - l + 1 AND p.l = l), 1).bits,
                      'path', concat(element_at(acc, j - l + 1).path, '|',
                        element_at(filter(ps,
                          p -> p.i = j - l + 1 AND p.l = l), 1).piece))
                  END),
                x -> x IS NOT NULL))))),
          length(word) + 1)"""))
        .select(col("word"), col("n"), col("best.cost").as("cost"),
          col("best.path").as("path"))
      val usage = best
        .select(col("n"),
          explode(split(expr("substring(path, 2)"), "\\|")).as("piece"))
        .groupBy("piece").agg(sum(col("n")).as("used"))
      val uTot = usage.agg(sum(col("used")).as("ut"))
      val rep = costed.join(usage, Seq("piece"), "left")
        .withColumn("used", coalesce(col("used"), lit(0L)))
        .crossJoin(broadcast(uTot))
        .withColumn("new_bits", when(col("used") > 0,
          expr("CAST(length(bin(ut DIV used)) AS BIGINT)")).otherwise(lit(0L)))
      val top = rep.filter(col("used") > 0)
        .orderBy(col("used").desc, col("piece")).limit(30)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("used").desc, col("piece"))).cast("long"))
      val sm = rep.agg(
          count(lit(1)).as("vocab_size"),
          sum(when(col("used") === 0, 1L).otherwise(0L)).as("n_pruned"),
          sum(col("used") * col("bits")).as("loss_before"),
          sum(col("used") * col("new_bits")).as("loss_after"))
        .select(lit(0L).as("rank"), lit("__vocab__").as("piece"),
          col("vocab_size").cast("long").as("cnt"),
          col("loss_before").as("bits"), col("n_pruned").as("used"),
          col("loss_after").as("new_bits"))
      // fertility comparison over the SAME cohort: unigram pieces/word
      // vs the shared-seam BPE encode, both weighted by type count
      val uniFert = best.agg(sum(col("n")).as("nw"),
        sum(col("n") *
          (size(split(expr("substring(path, 2)"), "\\|"))).cast("long"))
          .as("np"))
      val bpeFert = bpeEncodedTypes(docs)
        .filter(length(col("word")) <= UniMaxWordLen)
        .select(col("n"), expr(
          "CAST(size(filter(transform(split(symstr, ';'), x -> trim(x)), " +
            "x -> x <> '')) AS BIGINT)").as("n_syms"))
        .agg(sum(col("n") * col("n_syms")).as("bp_np"))
      val fert = uniFert.crossJoin(bpeFert)
        .select(lit(-1L).as("rank"), lit("__fertility__").as("piece"),
          col("nw").as("cnt"),
          expr("(np * 10000) DIV nw").as("bits"),
          expr("(bp_np * 10000) DIV nw").as("used"),
          (col("bp_np") - col("np")).as("new_bits"))
      top.select(col("rank"), col("piece"), col("cnt"), col("bits"),
          col("used"), col("new_bits"))
        .unionByName(sm).unionByName(fert)
        .orderBy("rank", "piece")
    }),

    // WORDPIECE ENCODE (BERT-style) — the THIRD tokenizer family next
    // to merge-based BPE (q121/q134) and Viterbi unigram-LM (q307), and
    // the one whose vocabulary is POSITIONAL: a piece is a word-initial
    // entry or a '##'-continuation entry, never both implicitly, and
    // encoding is greedy LONGEST-match-first from the left — no merges,
    // no DP. Vocabulary: every single character (segmentability
    // guarantee) plus multi-char pieces whose weighted corpus count AT
    // THAT POSITION CLASS (initial vs continuation) reaches
    // [[UniMinPieceCnt]]; cohort = word types ≤ [[UniMaxWordLen]] chars
    // (q307's bounds, so the fertility rows compare like for like).
    // The greedy walk is precomputed as a STEP TABLE — longest vocab
    // match per (word, position) — and then executed IN-ROW by one
    // `aggregate` HOF over at most [[UniMaxWordLen]] iterations (each
    // step consumes ≥ 1 char), the q307 in-row discipline: no per-round
    // joins, no recursion in the engine. Output: top-30 pieces by
    // weighted usage (positional vocab count, usage, distinct types
    // using) + a '__vocab__' row (initial/continuation vocab sizes,
    // entries actually used, cohort size) + a '__fertility__' row
    // (weighted words / chars / pieces and pieces-per-word bp — the
    // compression number a tokenizer ships with).
    // Scale: occurrence generation is |types|·len·[[UniMaxPieceLen]]
    // in-row rows; vocab and step tables are piece-/word-keyed
    // aggregates with map-side combine; the walk is one collect_list
    // per word type + a constant-bound HOF — no pair joins, nothing
    // corpus-sized leaves the type table.
    "q312_wordpiece" -> ((s, d) => {
      val P = UniMaxPieceLen
      // mutation seam (knob OFF in every production plan): greedy takes
      // the SHORTEST match — the defining longest-match rule broken;
      // every multi-char word char-segments and usage collapses onto
      // single characters
      val pickL =
        if (graft.Mutations.on("q312_greedy_shortest_match")) min(col("l"))
        else max(col("l"))
      val types = wordTypes(Tables.documents(s, d))
        .filter(length(col("word")) <= UniMaxWordLen)
      val occ = types.select(col("word"), col("n"), explode(expr(
          s"flatten(transform(sequence(1, length(word)), i -> " +
            s"transform(sequence(1, least($P, length(word) - i + 1)), " +
            s"l -> named_struct('i', i, 'l', l, 'piece', substring(word, i, l)))))"))
          .as("o"))
        .select(col("word"), col("n"), col("o.i").as("i"),
          col("o.l").as("l"), col("o.piece").as("piece"),
          (col("o.i") === 1).as("ini"))
      val pvoc = occ.groupBy("piece", "ini")
        .agg(sum(col("n")).as("cnt"))
        .filter(length(col("piece")) === 1 || col("cnt") >= UniMinPieceCnt)
      val steps = occ.join(pvoc.select("piece", "ini"), Seq("piece", "ini"))
        .groupBy("word", "i").agg(pickL.as("l"))
        .withColumn("rp", expr(
          "concat(IF(i > 1, '##', ''), substring(word, i, l))"))
      val walked = steps.join(types, "word")
        .groupBy("word", "n")
        .agg(collect_list(struct(col("i"), col("l"), col("rp"))).as("ps"))
        .withColumn("walk", expr(s"""
          aggregate(sequence(1, $UniMaxWordLen),
            named_struct('pos', 1, 'path', ''),
            (acc, j) -> CASE WHEN acc.pos <= length(word)
              THEN named_struct(
                'pos', acc.pos +
                  element_at(filter(ps, p -> p.i = acc.pos), 1).l,
                'path', concat(acc.path, '|',
                  element_at(filter(ps, p -> p.i = acc.pos), 1).rp))
              ELSE acc END)"""))
        .select(col("word"), col("n"),
          expr("substring(walk.path, 2)").as("path"))
      val usage = walked
        .select(col("word"), col("n"), explode(split(col("path"), "\\|")).as("rp"))
        .groupBy("rp").agg(sum(col("n")).as("used"),
          countDistinct(col("word")).as("n_types"))
      val rendered = pvoc.withColumn("rp", expr(
          "concat(IF(ini, '', '##'), piece)"))
        .select(col("rp"), col("ini"), col("cnt"))
      val rep = rendered.join(usage, Seq("rp"), "left")
        .withColumn("used", coalesce(col("used"), lit(0L)))
        .withColumn("n_types", coalesce(col("n_types"), lit(0L)))
      val top = rep.filter(col("used") > 0)
        .orderBy(col("used").desc, col("rp")).limit(30)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("used").desc, col("rp"))).cast("long"))
        .select(col("rank"), col("rp").as("piece"),
          col("ini").cast("long").as("ini"), col("cnt"), col("used"),
          col("n_types"))
      val vsum = rep.agg(
          sum(when(col("ini"), 1L).otherwise(0L)).as("n_ini"),
          sum(when(!col("ini"), 1L).otherwise(0L)).as("n_cont"),
          sum(when(col("used") > 0, 1L).otherwise(0L)).as("n_used"))
        .crossJoin(types.agg(count(lit(1)).as("n_cohort")))
        .select(lit(0L).as("rank"), lit("__vocab__").as("piece"),
          col("n_ini").as("ini"), col("n_cont").as("cnt"),
          col("n_used").as("used"), col("n_cohort").as("n_types"))
      val fert = walked.agg(
          sum(col("n")).as("nw"),
          sum(col("n") * length(col("word")).cast("long")).as("nc"),
          sum(col("n") *
            size(split(col("path"), "\\|")).cast("long")).as("np"))
        .select(lit(-1L).as("rank"), lit("__fertility__").as("piece"),
          col("nw").as("ini"), col("nc").as("cnt"), col("np").as("used"),
          expr("(np * 10000) DIV nw").as("n_types"))
      top.unionByName(vsum).unionByName(fert).orderBy("rank", "piece")
    })
  )

  /** q307's segmentable-cohort and seed-vocabulary bounds: word types
    * longer than [[UniMaxWordLen]] chars are out of cohort, candidate
    * pieces run to [[UniMaxPieceLen]] chars, and a multi-char piece
    * needs weighted corpus count ≥ [[UniMinPieceCnt]] to enter the seed
    * vocabulary (single chars always enter — segmentability). */
  private[ext] val UniMaxWordLen = 12
  private[ext] val UniMaxPieceLen = 4
  private[ext] val UniMinPieceCnt = 3

  /** q283/q285's shared sliding-window chunker over (doc_id, text):
    * W-token windows at stride S (default 32/24 — 8-token overlap), the
    * last window short; each chunk fingerprinted with the md5 of its
    * EXACT token slice. Chunk count is pure integer ((x + S−1) DIV S —
    * no float ceil, the q190 ladder discipline). ONE definition (with
    * the [[chunkSqlCtes]] SQL twin) so the graded layout and the
    * census built on it can never disagree about boundaries.
    * [[graft.Mutations]] "q283_stride_off_by_one": stride 25 instead of
    * 24 — the window-arithmetic typo class; every downstream
    * fingerprint shifts, so both q283 and q285 go red. */
  private[graft] def chunked(docs: DataFrame, w: Int = 32, s0: Int = 24): DataFrame = {
    val s1 = if (graft.Mutations.on("q283_stride_off_by_one")) s0 + 1 else s0
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_tok", size(col("ws")).cast("long"))
      .withColumn("n_chunks",
        expr(s"1L + (greatest(0L, n_tok - $w) + ${s1 - 1}) DIV $s1"))
      .withColumn("chunk_idx",
        explode(expr("sequence(0L, n_chunks - 1)")))
      .withColumn("start_tok", col("chunk_idx") * s1 + 1)
      .withColumn("chunk_len",
        least(lit(w.toLong), col("n_tok") - col("start_tok") + 1))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("chunk_len"),
        concat_ws(" ",
          expr("slice(ws, CAST(start_tok AS INT), CAST(chunk_len AS INT))"))
          .as("chunk_text"))
      .withColumn("chunk_md5", md5(col("chunk_text")))
  }

  /** q286/q288's shared skip-gram pair stream over `documents`:
    * symmetric ±[[SkipgramRadius]] window, integer distance weight
    * (radius+1)−|offset|, bounds-filtered — ≤2·radius pairs per token,
    * map-only bounded fan-out. ONE definition (with [[skipgramSqlCtes]])
    * so the count table and the TextRank graph built on it can never
    * disagree about the window. [[graft.Mutations]]
    * "q286_window_off_by_one": radius 4 instead of 3 — the window-bound
    * typo class; extra pairs shift both the counts and the rank mass,
    * so q286 AND q288 go red. */
  private[graft] def skipgramPairs(docs: DataFrame): DataFrame = {
    val r = if (graft.Mutations.on("q286_window_off_by_one")) SkipgramRadius + 1
            else SkipgramRadius
    val offs = ((-r to -1) ++ (1 to r)).mkString(", ")
    // two codegen'd generators (position × offset) with plain projected
    // expressions, instead of nested higher-order lambdas (transform/
    // filter/flatten are INTERPRETED per element — this explode feeds
    // q286/q288/q295, so the lambda dispatch was the hot path). The
    // emitted pair stream is identical row-for-row.
    docs
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("ws"), explode(expr("sequence(1, size(ws))")).as("i"))
      .select(col("ws"), col("i"), explode(expr(s"array($offs)")).as("o"))
      .filter(expr("i + o >= 1 AND i + o <= size(ws)"))
      .select(expr("element_at(ws, i)").as("center"),
        expr("element_at(ws, CAST(i + o AS INT))").as("context"),
        expr(s"${r + 1} - abs(o)").as("w"))
  }

  /** Symmetric skip-gram window radius for q286/q288. */
  private val SkipgramRadius = 3

  /** ONE oracle string for the skip-gram count table — q286 (batch) and
    * q295 (streaming twin) must grade against the identical SQL. */
  private def skipgramCountSql: String =
    s"""WITH $skipgramSqlCtes
        SELECT center, context, count(*) AS n_pairs,
               CAST(sum(w) AS BIGINT) AS w_sum
        FROM pr GROUP BY center, context
        ORDER BY w_sum DESC, center, context LIMIT 20"""

  /** SQL twin of [[skipgramPairs]]: CTE chain ending in
    * `pr(center, context, w)` over `documents`. */
  private def skipgramSqlCtes: String = {
    val offVals = ((-SkipgramRadius to -1) ++ (1 to SkipgramRadius))
      .map(o => s"($o)").mkString(", ")
    s"""tok AS (SELECT str_split(text, ' ') AS ws FROM documents
                WHERE len(str_split(text, ' ')) >= 2),
        pos AS (SELECT ws, unnest(generate_series(1, len(ws))) AS i FROM tok),
        off AS (SELECT * FROM (VALUES $offVals) AS t(o)),
        pr AS (SELECT ws[i] AS center, ws[i + o] AS context,
                      ${SkipgramRadius + 1} - abs(o) AS w
               FROM pos CROSS JOIN off
               WHERE i + o BETWEEN 1 AND len(ws))"""
  }

  /** SQL twin of [[chunked]] over a `corpus(doc_id, text)` relation:
    * CTE chain ending in `chunks(doc_id, chunk_idx, start_tok,
    * chunk_len, chunk_md5)`. */
  private def chunkSqlCtes: String =
    """t AS (SELECT doc_id, str_split(text, ' ') AS ws,
                   CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
            FROM corpus),
      c AS (SELECT doc_id, ws, n_tok,
                   1 + (greatest(0, n_tok - 32) + 23) // 24 AS n_chunks
            FROM t),
      x AS (SELECT doc_id, ws, n_tok,
                   unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
            FROM c),
      chunks AS (SELECT doc_id, chunk_idx, start_tok, chunk_len, chunk_text,
                        md5(chunk_text) AS chunk_md5 FROM (
                   SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                          CAST(chunk_idx * 24 + 1 AS BIGINT) AS start_tok,
                          CAST(least(32, n_tok - (chunk_idx * 24 + 1) + 1)
                               AS BIGINT) AS chunk_len,
                          array_to_string(
                            ws[(chunk_idx * 24 + 1):
                               (chunk_idx * 24 +
                                least(32, n_tok - chunk_idx * 24))],
                            ' ') AS chunk_text
                   FROM x))"""

  /** Multi-round BPE trainer: iterates q121's training round `nMerges`
    * times over the word-TYPE table and returns the ranked merge table
    * (rank, pair, cnt) — the model artifact a tokenizer ships.
    *
    * Scale shape: ONE corpus-sized shuffle builds the word-type
    * vocabulary; every round after that is vocabulary-sized (pair
    * count + argmax + literal-replace merge, q121's argument). Each
    * round's symbol table is pinned via [[GraphOps.pin]] — the
    * iterative-DataFrame lineage-truncation pattern — so round k's plan
    * never re-derives rounds 1..k-1, and the previous round's blocks
    * are freed explicitly (O(1) storage in rounds, not O(n)). Only the
    * 1-row argmax crosses to the driver per round: the merge table is
    * control-plane sized by definition (q134's collect argument). */
  /** r17: the ranked merge table is THE tokenizer model artifact — q191
    * (the training grade) and q197 (the eval curve) each ran the full
    * [[trainBpe]] loop (nMerges sequential pair-count + argmax rounds)
    * per pass. One training per (session, dataset, nMerges); the rows
    * are control-plane sized (≤ nMerges), so the memo holds them
    * directly — no pinned blocks to free. The chain is knob-free. */
  private val bpeMergeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), Seq[(Int, String, Long)]]()

  /** Forget the memoized merge tables (scale probes / fixture rewrites). */
  def clearBpeMergeCache(): Unit = bpeMergeCache.clear()

  private def trainedMerges(s: SparkSession, d: String, nMerges: Int): DataFrame = {
    GraphOps.sweepStopped(bpeMergeCache)(_._1)
    val rows = bpeMergeCache.computeIfAbsent((s, d, nMerges), _ =>
      trainBpe(Tables.documents(s, d), nMerges)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq)
    s.createDataFrame(rows).toDF("rank", "pair", "cnt")
  }

  def trainBpe(docs: DataFrame, nMerges: Int): DataFrame = {
    val s = docs.sparkSession
    var cur = GraphOps.pin(wordTypes(docs).select(
      regexp_replace(col("word"), "(.)", " $1;").as("symstr"), col("n")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= nMerges && !exhausted) {
      val top = pairCounts(cur.df)
        .orderBy(col("cnt").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) exhausted = true // no adjacent pairs left: stop —
        // further rounds would re-run the identical empty aggregate
      else {
        val mp = top(0).getString(0)
        merges += ((k, mp, top(0).getLong(1)))
        val next = GraphOps.pin(cur.df.select(
          call_function("replace", col("symstr"),
            lit(" " + mp.replace(" ", "; ") + ";"),
            lit(" " + mp.replace(" ", "") + ";")).as("symstr"),
          col("n")))
        cur.free()
        cur = next
        k += 1
      }
    }
    cur.free()
    s.createDataFrame(merges.toSeq).toDF("rank", "pair", "cnt")
  }

  /** THE word-type (vocabulary) table: whitespace words with corpus
    * counts. Single definition shared by q121, q134, and [[trainBpe]] —
    * the BPE prefix-property pin (trainBpe round 1 == q121's
    * first_merge) holds exactly as long as all three consume the same
    * tokenization, so there is one copy to edit. */
  private def wordTypes(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      // r18 (guide §2.2/§4): every consumer runs CPU-heavy per-type
      // passes (q134/q259's merge-fold encode, q307's piece explode +
      // DP, q121's pair counts) whose bytes are tiny, so AQE coalesced
      // the post-aggregate side to ONE task (~0.5-0.7s serialized per
      // query). An explicit word-keyed exchange at defaultParallelism
      // AFTER the aggregate keeps the map-side partial agg intact
      // (repartitioning the raw token stream would kill it) and costs
      // one vocabulary-sized shuffle; at cluster scale the width pins
      // to the cluster's parallelism instead of a local constant.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("word"))

  /** q134/q259's shared encode stage: the corpus word-type table with
    * each type's symbol string after applying the [[EncodeMerges]]
    * highest-ranked merges from one global pair-count pass. The merge
    * list is control-plane (≤ [[EncodeMerges]] rows collected); the
    * encode itself is a map-side replace chain over |types| rows. */
  private def bpeEncodedTypes(docs: DataFrame): DataFrame = {
    val sym0 = wordTypes(docs).select(col("word"), col("n"),
      regexp_replace(col("word"), "(.)", " $1;").as("symstr"))
    val merges: Seq[String] = pairCounts(sym0.select("symstr", "n"))
      .orderBy(col("cnt").desc, col("pair")).limit(EncodeMerges)
      .select("pair").collect().map(_.getString(0)).toSeq
    merges.foldLeft(sym0) { (df, mp) =>
      df.select(col("word"), col("n"),
        call_function("replace", col("symstr"),
          lit(" " + mp.replace(" ", "; ") + ";"),
          lit(" " + mp.replace(" ", "") + ";")).as("symstr"))
    }
  }

  /** Adjacent-symbol pair counts over a ` sym;`-rendered word-type table
    * (symstr, n), weighted by word-type count — the counting stage of
    * q121's BPE training round, shared with q134's merge-table build.
    * Extra input columns pass through untouched (they are dropped by the
    * aggregate's projection). */
  private def pairCounts(df: DataFrame): DataFrame =
    df.withColumn("syms",
        expr("filter(transform(split(symstr, ';'), x -> trim(x)), x -> x <> '')"))
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))")).as("pair"),
        col("n"))
      .groupBy("pair").agg(sum(col("n")).as("cnt"))

  /** DuckDB twin of the q121 pair-count stage: adjacent symbol pairs of
    * `$src.symstr`, weighted by word-type count `n`, as CTE `$out`. */
  private def oPairCounts(src: String, out: String, mat: Boolean = false): String =
    s"""$out AS ${if (mat) "MATERIALIZED " else ""}(SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
          SELECT list_element(syms, i) || ' ' || list_element(syms, i + 1) AS pair, n
          FROM (SELECT syms, n, unnest(generate_series(1, len(syms) - 1)) AS i
                FROM (SELECT syms, n FROM (
                        SELECT list_filter(list_transform(str_split(symstr, ';'),
                                                          x -> trim(x)),
                                           x -> x <> '') AS syms, n
                        FROM $src)
                      WHERE len(syms) >= 2)))
        GROUP BY pair)"""

  def oracles: Map[String, String] = Map(
    "q321_eval_token_f1" ->
      s"""WITH golds AS (
            SELECT doc_id, ws[1:8] AS gold
            FROM (SELECT doc_id, str_split(text, ' ') AS ws FROM documents)
            WHERE len(ws) >= 12),
          arms AS (
            SELECT doc_id, gold, 'exact' AS arm, gold AS pred FROM golds
            UNION ALL
            SELECT doc_id, gold, 'corrupt3' AS arm,
              list_transform(generate_series(1, len(gold)),
                j -> CASE WHEN j % 3 = 0
                       THEN substring(md5(CAST(doc_id AS VARCHAR) || ':'
                                          || CAST(j AS VARCHAR)), 1, 6)
                       ELSE gold[j] END) AS pred
            FROM golds
            UNION ALL
            SELECT doc_id, gold, 'reversed' AS arm,
              list_reverse(gold) AS pred FROM golds),
          scored AS (
            SELECT arm,
              CAST(list_sum(list_transform(list_distinct(gold),
                w -> least(len(list_filter(pred, x -> x = w)),
                           len(list_filter(gold, x -> x = w))))) AS BIGINT)
                AS inter,
              len(pred) AS np, len(gold) AS ng,
              CASE WHEN array_to_string(pred, ' ') = array_to_string(gold, ' ')
                   THEN 1 ELSE 0 END AS em
            FROM arms)
          SELECT arm, count(*) AS n_docs,
                 CAST(sum(em) AS BIGINT) AS n_em,
                 CAST(sum((2 * inter * 10000) // (np + ng)) AS BIGINT)
                   // count(*) AS mean_f1_bp,
                 CAST(sum(CASE WHEN (2 * inter * 10000) // (np + ng) = 10000
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_perfect,
                 CAST(min((2 * inter * 10000) // (np + ng)) AS BIGINT)
                   AS min_f1_bp
          FROM scored GROUP BY arm ORDER BY arm""",

    "q229_boilerplate_fraction" ->
      s"""WITH docs AS (SELECT doc_id, source,
              CASE WHEN doc_id % 3 = 0
                   THEN 'subscribe to our newsletter for updates and follow us on all social media channels today friends ' || text
                   ELSE text END AS text
            FROM documents),
          chunks AS (SELECT doc_id, source,
                            array_to_string(ws[i * 8 + 1 : i * 8 + 8], ' ') AS chunk
                     FROM (SELECT doc_id, source, ws,
                             unnest(generate_series(0, len(ws) // 8 - 1)) AS i
                           FROM (SELECT doc_id, source,
                                   str_split(text, ' ') AS ws FROM docs)
                           WHERE len(ws) >= 8)),
          df AS (SELECT chunk, count(*) AS n_docs_with FROM (
                   SELECT DISTINCT doc_id, chunk FROM chunks) GROUP BY chunk),
          j AS (SELECT c.doc_id, c.source, c.chunk,
                       CASE WHEN n_docs_with > $BoilerplateDocCap
                            THEN 1 ELSE 0 END AS is_boiler
                FROM chunks c JOIN df USING (chunk))
          SELECT source,
                 count(DISTINCT doc_id) AS n_docs,
                 count(*) AS n_chunks,
                 CAST(sum(is_boiler) AS BIGINT) AS n_boiler_chunks,
                 count(DISTINCT CASE WHEN is_boiler = 1 THEN doc_id END)
                   AS n_docs_with_boiler,
                 (CAST(sum(is_boiler) AS BIGINT) * 10000) // count(*)
                   AS boiler_bp
          FROM j GROUP BY source ORDER BY source""",

    "q244_vocab_health" ->
      """WITH freq AS (SELECT w, count(*) AS c FROM (
                         SELECT unnest(str_split(text, ' ')) AS w
                         FROM documents) WHERE w <> '' GROUP BY w),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
                         CAST(sum(c) AS BIGINT) AS n_tokens,
                         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_hapax,
                         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_dis
                  FROM freq),
          t10 AS (SELECT CAST(sum(c) AS BIGINT) AS top10_tokens FROM (
                    SELECT c FROM freq ORDER BY c DESC, w LIMIT 10))
          SELECT n_types, n_tokens,
                 CAST(n_types * 10000 // n_tokens AS BIGINT) AS type_token_bp,
                 n_hapax,
                 CAST(n_hapax * 10000 // n_types AS BIGINT) AS hapax_share_bp,
                 n_dis,
                 CAST(top10_tokens * 10000 // n_tokens AS BIGINT) AS top10_mass_bp
          FROM tot CROSS JOIN t10""",

    "q218_vocab_growth" ->
      s"""WITH nd AS (SELECT count(*) AS nd FROM documents),
          cps AS (SELECT pct, (nd * pct) // 100 AS cutoff
                  FROM (SELECT unnest([10, 25, 50, 100]) AS pct)
                  CROSS JOIN nd),
          wm AS (SELECT w, min(doc_id) AS first_doc FROM (
                   ${oBigramTokens("documents", "doc_id")})
                 GROUP BY w),
          dt AS (SELECT doc_id,
                        CAST(len(str_split(text, ' ')) AS BIGINT) AS toks
                 FROM documents),
          vocab AS (SELECT pct, cutoff, count(*) AS vocab
                    FROM wm CROSS JOIN cps WHERE first_doc < cutoff
                    GROUP BY 1, 2),
          tk AS (SELECT pct, CAST(sum(toks) AS BIGINT) AS n_tokens
                 FROM dt CROSS JOIN cps WHERE doc_id < cutoff GROUP BY pct)
          SELECT vocab.pct, cutoff AS n_docs_cut, n_tokens, vocab
          FROM vocab JOIN tk ON tk.pct = vocab.pct
          ORDER BY vocab.pct""",
    "q152_pmi_collocations" ->
      """WITH ws AS (SELECT str_split(text, ' ') AS w FROM documents
                     WHERE len(str_split(text, ' ')) >= 2),
          big AS (SELECT w[i] AS a, w[i+1] AS b
                  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                        FROM ws)),
          cab AS (SELECT a, b, count(*) AS n_ab FROM big GROUP BY a, b),
          ca AS (SELECT a, sum(n_ab) AS n_a FROM cab GROUP BY a),
          cb AS (SELECT b, sum(n_ab) AS n_b FROM cab GROUP BY b),
          tot AS (SELECT sum(n_ab) AS n_total FROM cab)
          SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
                 CAST((n_ab * n_total * 10000) // (n_a * n_b) AS BIGINT)
                   AS pmi_bp
          FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot
          WHERE n_ab >= 5
          ORDER BY pmi_bp DESC, a, b LIMIT 20""",

    "q125_bm25" ->
      s"""WITH ${oBm25Ctes("documents", "doc_id % 50 = 0")}
          SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, score
          FROM ranked WHERE rank <= 10 ORDER BY qid, rank""",

    // from-scratch BM25 over the FULL corpus: equality against the
    // Spark side's index ∪ delta plan IS the incremental == rebuild
    // witness (the q329 discipline)
    "q345_incremental_bm25" ->
      s"""WITH ${oBm25Ctes("documents", "doc_id % 50 = 0")}
          SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, score,
                 CAST(CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END AS BIGINT)
                   AS from_delta
          FROM ranked WHERE rank <= 10 ORDER BY qid, rank""",

    "q221_bm25_mrr" ->
      s"""WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 2000000 AS doc_id,
                   array_to_string(str_split(text, ' ')[2:], ' ') AS text
            FROM documents WHERE len(str_split(text, ' ')) >= 10),
          ${oBm25Ctes("corpus", "doc_id % 25 = 0 AND doc_id < 2000000")},
          expected AS (SELECT doc_id - 2000000 AS qid, doc_id AS hit_id
                       FROM corpus
                       WHERE doc_id >= 2000000 AND doc_id % 25 = 0),
          found AS (SELECT e.qid, r.rank
                    FROM ranked r JOIN expected e
                      ON r.qid = e.qid AND r.doc_id = e.hit_id
                    WHERE r.rank <= 10),
          rr AS (SELECT e.qid, coalesce(f.rank, 0) AS rank
                 FROM expected e LEFT JOIN found f ON f.qid = e.qid)
          SELECT count(*) AS n_queries,
                 CAST(sum(CASE WHEN rank = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hit1,
                 CAST(sum(CASE WHEN rank >= 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hit10,
                 CAST(CAST(sum(CASE WHEN rank >= 1 THEN 1000000 // rank
                                    ELSE 0 END) AS BIGINT)
                      // count(*) AS BIGINT) AS mrr_ppm
          FROM rr""",

    "q121_bpe_merge" ->
      s"""WITH w AS (SELECT word, count(*) AS n
                     FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
                     WHERE word <> '' GROUP BY word),
          s0 AS (SELECT regexp_replace(word, '(.)', ' ${"\\1"};', 'g') AS symstr, n FROM w),
          ${oPairCounts("s0", "p0")},
          top1 AS (SELECT pair AS mp FROM p0 ORDER BY cnt DESC, pair LIMIT 1),
          m AS (SELECT replace(symstr,
                               ' ' || replace((SELECT mp FROM top1), ' ', '; ') || ';',
                               ' ' || replace((SELECT mp FROM top1), ' ', '') || ';') AS symstr,
                       n
                FROM s0),
          ${oPairCounts("m", "p1")}
          SELECT CAST(rank AS INTEGER) AS rank, pair, cnt,
                 (SELECT mp FROM top1) AS first_merge
          FROM (SELECT pair, cnt,
                       row_number() OVER (ORDER BY cnt DESC, pair) AS rank
                FROM p1)
          WHERE rank <= 20 ORDER BY rank""",

    "q134_bpe_encode" ->
      s"""WITH $oEncodeCtes
          SELECT word, CAST(n AS BIGINT) AS n,
                 CAST(length(word) AS BIGINT) AS n_chars,
                 CAST(len(syms) AS BIGINT) AS n_tokens,
                 array_to_string(syms, ' ') AS encoding
          FROM (SELECT word, n,
                       list_filter(list_transform(str_split(symstr, ';'),
                                                  x -> trim(x)),
                                   x -> x <> '') AS syms
                FROM e$EncodeMerges)
          ORDER BY n DESC, word LIMIT 30""",

    "q259_tokenizer_fertility" ->
      s"""WITH $oEncodeCtes,
          enc AS (SELECT word,
                         CAST(len(list_filter(list_transform(
                             str_split(symstr, ';'), x -> trim(x)),
                             x -> x <> '')) AS BIGINT) AS toks
                  FROM e$EncodeMerges),
          pl AS (SELECT lang, word, count(*) AS n FROM (
                   SELECT lang, unnest(str_split(text, ' ')) AS word
                   FROM documents)
                 WHERE word <> '' GROUP BY 1, 2)
          SELECT pl.lang, CAST(sum(pl.n) AS BIGINT) AS n_words,
                 CAST(sum(pl.n * enc.toks) AS BIGINT) AS n_tokens,
                 CAST(sum(pl.n * enc.toks) * 100 // sum(pl.n) AS BIGINT)
                   AS fertility_c,
                 CAST(sum(pl.n * length(pl.word)) * 100
                      // sum(pl.n * enc.toks) AS BIGINT)
                   AS chars_per_token_c
          FROM pl JOIN enc USING (word)
          GROUP BY pl.lang ORDER BY pl.lang""",

    "q136_quality_classifier" ->
      """WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
                       FROM documents),
          wgts AS (SELECT doc_id,
                          (strpos('0123456789abcdef', substr(md5(substr(md5(tok), 1, 3)), 1, 1)) - 1) * 256
                          + (strpos('0123456789abcdef', substr(md5(substr(md5(tok), 1, 3)), 2, 1)) - 1) * 16
                          + (strpos('0123456789abcdef', substr(md5(substr(md5(tok), 1, 3)), 3, 1)) - 1)
                          - 2048 AS wgt
                   FROM toks WHERE tok <> ''),
          agg AS (SELECT doc_id, count(*) AS n_tokens,
                         CAST(sum(wgt) AS BIGINT) AS w_total
                  FROM wgts GROUP BY doc_id)
          SELECT doc_id, n_tokens, w_total // n_tokens AS score_fp,
                 (w_total // n_tokens) > 0 AS keep
          FROM agg ORDER BY doc_id""",

    "q73_lm_score" ->
      s"""WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents
                     WHERE len(str_split(text, ' ')) >= 2),
          bi AS (SELECT doc_id, words[pos] AS w1, words[pos + 1] AS w2
                 FROM (SELECT doc_id, words,
                              unnest(generate_series(1, len(words) - 1)) AS pos
                       FROM w)),
          bc AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2),
          uc AS (SELECT w1, count(*) AS cu FROM bi GROUP BY 1),
          p AS (SELECT doc_id, round(ln(CAST(cb AS DOUBLE) / cu), 6) AS lp
                FROM bi JOIN bc USING (w1, w2) JOIN uc USING (w1))
          SELECT doc_id, count(*) AS n_bigrams, ${oAvg("lp", 6)} AS lm_score
          FROM p GROUP BY doc_id ORDER BY doc_id""",

    "q60_lang_id" ->
      s"""WITH wrds AS (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS word
                        FROM documents),
          scores AS (SELECT doc_id, lang,
                       count(CASE WHEN word IN ${inList(en)} THEN 1 END) AS s_en,
                       count(CASE WHEN word IN ${inList(de)} THEN 1 END) AS s_de,
                       count(CASE WHEN word IN ${inList(es)} THEN 1 END) AS s_es,
                       count(CASE WHEN word IN ${inList(fr)} THEN 1 END) AS s_fr
                     FROM wrds GROUP BY doc_id, lang),
          pred AS (SELECT lang,
                     CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                          WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
                          WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                          WHEN s_fr > 0 THEN 'fr'
                          ELSE 'und' END AS predicted
                   FROM scores)
          SELECT lang, predicted, count(*) AS n_docs FROM pred
          GROUP BY lang, predicted ORDER BY lang, predicted""",

    "q61_quality_score" ->
      s"""SELECT doc_id,
            CAST(len(str_split(text, ' ')) AS INTEGER) AS n_words,
            CAST(len(list_filter(str_split(text, ' '),
                 w -> w IN ${inList(en ++ de ++ es ++ fr)})) AS INTEGER) AS n_stop,
            len(list_filter(str_split(text, ' '),
                 w -> w IN ${inList(en ++ de ++ es ++ fr)})) / len(str_split(text, ' ')) AS stop_ratio,
            (length(text) - (len(str_split(text, ' ')) - 1)) / len(str_split(text, ' ')) AS avg_word_len,
            CASE WHEN len(str_split(text, ' ')) < 30 THEN 'too_short'
                 WHEN len(list_filter(str_split(text, ' '),
                      w -> w IN ${inList(en ++ de ++ es ++ fr)})) / len(str_split(text, ' ')) > 0.15
                   THEN 'stopword_heavy'
                 WHEN (length(text) - (len(str_split(text, ' ')) - 1)) / len(str_split(text, ' ')) > 5.5
                   THEN 'long_words'
                 ELSE 'ok' END AS quality_bucket
          FROM documents ORDER BY doc_id""",

    "q62_token_count" ->
      """SELECT doc_id,
            CAST(len(str_split(text, ' ')) AS INTEGER) AS ws_tokens,
            CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS re_tokens,
            CAST(len(list_distinct(str_split(text, ' '))) AS INTEGER) AS distinct_tokens
          FROM documents ORDER BY doc_id""",

    "q63_fingerprint" ->
      """WITH fps AS (SELECT doc_id,
              md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
            FROM documents)
          SELECT min(doc_id) AS keep_id, fp, count(*) AS n
          FROM fps GROUP BY fp ORDER BY keep_id""",

    "q64_top_bigrams" ->
      """WITH tok AS (SELECT str_split(text, ' ') AS words FROM documents
                      WHERE len(str_split(text, ' ')) >= 2),
          posn AS (SELECT words, unnest(generate_series(1, len(words) - 1)) AS pos FROM tok),
          bg AS (SELECT words[pos] || ' ' || words[pos+1] AS bigram FROM posn)
          SELECT bigram, count(*) AS n FROM bg
          GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30""",

    // q191: the trainer's rounds unrolled as CTEs — pair-count → argmax
    // → literal merge, EncodeMerges times (the q114 power-iteration
    // oracle pattern). Every round CTE is MATERIALIZED: each s$i is
    // referenced twice (p$i+1 and s$i+1), so DuckDB's default inlining
    // would expand the chain 2^rounds times — the SQL analogue of the
    // lineage blowup GraphOps.pin prevents on the Spark side.
    "q191_bpe_train" -> {
      val sel = (1 to EncodeMerges).map(i =>
        s"SELECT CAST($i AS INTEGER) AS rank, mp AS pair, cnt FROM t$i")
        .mkString("\nUNION ALL ")
      s"""WITH $oBpeTrainCtes
          SELECT rank, pair, cnt FROM ($sel) ORDER BY rank"""
    },

    // q197: the same training chain, read out as the compression curve —
    // per merge count, the corpus token total over the word-TYPE table
    // (Σ n × symbols(word)), bp-normalized against the 0-merge (char)
    // baseline.
    "q197_bpe_compression" -> {
      val counts = (0 to EncodeMerges).map(k =>
        s"""SELECT CAST($k AS INTEGER) AS n_merges,
               CAST(sum(n * len(list_filter(list_transform(str_split(symstr, ';'),
                                                           x -> trim(x)),
                                            x -> x <> ''))) AS BIGINT)
                 AS total_tokens
            FROM s$k""").mkString("\nUNION ALL ")
      s"""WITH $oBpeTrainCtes,
          tc AS ($counts),
          base AS (SELECT total_tokens AS base_tokens FROM tc WHERE n_merges = 0)
          SELECT n_merges, total_tokens,
                 CAST((total_tokens * 10000) // base_tokens AS BIGINT)
                   AS compression_bp
          FROM tc, base ORDER BY n_merges"""
    },

    "q275_trigram_search" -> {
      val patterns = Seq("par", "windo", "agg")
      val patTris = patterns.flatMap(p =>
        p.sliding(3).toSeq.distinct.map(t => (p, t)))
      val ptValues = patTris.map { case (p, t) => s"('$p', '$t')" }.mkString(", ")
      val needCase = patterns.map(p =>
        s"WHEN '$p' THEN ${p.sliding(3).toSeq.distinct.size}").mkString(" ")
      val patValues = patterns.map(p => s"('$p')").mkString(", ")
      s"""WITH pt AS (SELECT * FROM (VALUES $ptValues) v(pattern, tri)),
          doctris AS (SELECT DISTINCT doc_id, tri FROM (
                        SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(length(text) - 2, 0)),
                                 i -> substr(text, i, 3))) AS tri
                        FROM documents)
                      WHERE tri IN (SELECT tri FROM pt)),
          cand AS (SELECT pattern, doc_id FROM (
                     SELECT pt.pattern, dt.doc_id,
                            count(DISTINCT dt.tri) AS nt
                     FROM doctris dt JOIN pt USING (tri)
                     GROUP BY 1, 2)
                   WHERE nt = CASE pattern $needCase END),
          verified AS (SELECT pattern, CAST(count(*) AS BIGINT) AS n_verified
                       FROM cand JOIN documents USING (doc_id)
                       WHERE strpos(text, pattern) > 0
                       GROUP BY pattern),
          candn AS (SELECT pattern, CAST(count(*) AS BIGINT) AS n_candidates
                    FROM cand GROUP BY pattern),
          direct AS (SELECT p.pattern, CAST(count(*) AS BIGINT) AS n_direct
                     FROM documents
                     CROSS JOIN (VALUES $patValues) p(pattern)
                     WHERE strpos(text, p.pattern) > 0
                     GROUP BY p.pattern)
          SELECT c.pattern, c.n_candidates,
                 CAST(coalesce(v.n_verified, 0) AS BIGINT) AS n_verified,
                 CAST(coalesce(dr.n_direct, 0) AS BIGINT) AS n_direct,
                 (coalesce(v.n_verified, 0) * 10000) // c.n_candidates
                   AS precision_bp
          FROM candn c LEFT JOIN verified v USING (pattern)
          LEFT JOIN direct dr USING (pattern)
          ORDER BY c.pattern"""
    },

    "q269_score_deciles" ->
      s"""WITH cells AS (
            SELECT pos, score_bp, count(*) AS c FROM (
              SELECT (strpos('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                       < score_bp // 312 AS pos,
                     score_bp
              FROM (SELECT doc_id,
                           (CAST(len(list_filter(str_split(text, ' '),
                                w -> w IN ${inList(en)})) AS BIGINT) * 10000)
                             // len(str_split(text, ' ')) AS score_bp
                    FROM documents))
            GROUP BY 1, 2),
          tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                         CAST(sum(CASE WHEN pos THEN c ELSE 0 END) AS BIGINT)
                           AS npos
                  FROM cells),
          cum AS (SELECT pos, c, score_bp,
                         CAST(sum(c) OVER (ORDER BY score_bp DESC, pos)
                              AS BIGINT) AS cum
                  FROM cells),
          dec AS (SELECT cum.pos, cum.c, cum.cum, tot.n, tot.npos,
                         d.decile,
                         greatest(0, least(cum.cum, ((d.decile + 1) * tot.n) // 10)
                                     - greatest(cum.cum - cum.c,
                                                (d.decile * tot.n) // 10))
                           AS kept
                  FROM cum CROSS JOIN tot
                  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS decile) d),
          per AS (SELECT decile, n, npos,
                         CAST(sum(kept) AS BIGINT) AS n_docs,
                         CAST(sum(CASE WHEN pos THEN kept ELSE 0 END)
                              AS BIGINT) AS n_pos
                  FROM dec GROUP BY 1, 2, 3),
          fin AS (SELECT decile, n_docs, n_pos, n, npos,
                         CAST(sum(n_docs) OVER (ORDER BY decile) AS BIGINT)
                           AS cum_n,
                         CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT)
                           AS cum_pos
                  FROM per)
          SELECT CAST(decile AS INTEGER) AS decile, n_docs, n_pos,
                 (n_pos * 10000) // greatest(n_docs, 1) AS pos_bp,
                 (cum_pos * n * 10000) // (cum_n * greatest(npos, 1)) AS cum_lift_bp
          FROM fin ORDER BY decile""",

    "q253_lexical_diversity" ->
      """WITH posting AS (SELECT source, word, count(*) AS c FROM (
                            SELECT source, unnest(str_split(text, ' ')) AS word
                            FROM documents)
                          WHERE word <> '' GROUP BY 1, 2),
          totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                            count(*) AS n_types, CAST(max(c) AS BIGINT) AS top_c
                     FROM posting GROUP BY source),
          dom AS (SELECT p.source, max(p.word) AS top_word
                  FROM posting p JOIN totals t USING (source)
                  WHERE p.c = t.top_c GROUP BY p.source),
          conc AS (SELECT p.source,
                          CAST(sum((p.c * 10000 // t.n_tokens) * p.c)
                               AS BIGINT) AS conc_num
                   FROM posting p JOIN totals t USING (source)
                   GROUP BY p.source)
          SELECT t.source, t.n_tokens, t.n_types,
                 10000 - conc.conc_num // t.n_tokens AS simpson_bp,
                 dom.top_word,
                 (t.top_c * 10000) // t.n_tokens AS top_share_bp
          FROM totals t JOIN conc USING (source) JOIN dom USING (source)
          ORDER BY t.source""",

    "q254_word_burstiness" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
          perdoc AS (SELECT doc_id, word, count(*) AS c FROM (
                       SELECT doc_id, unnest(str_split(text, ' ')) AS word
                       FROM documents)
                     WHERE word <> '' GROUP BY 1, 2),
          mom AS (SELECT word, count(*) AS df, CAST(sum(c) AS BIGINT) AS tot,
                         CAST(sum(c * c) AS BIGINT) AS s2
                  FROM perdoc GROUP BY word)
          SELECT word, df, tot,
                 ((n_docs * s2 - tot * tot) * 100) // (n_docs * tot) AS vmr_c
          FROM mom CROSS JOIN n
          ORDER BY tot DESC, word LIMIT 20""",

    // q283: W=32 / S=24 mirrored as integers via the shared chunk CTE
    // chain; the md5 fingerprints the token slice exactly as the Spark
    // side slices it.
    "q283_chunk_overlap" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
          $chunkSqlCtes
          SELECT doc_id, chunk_idx, start_tok, chunk_len, chunk_md5
          FROM chunks ORDER BY doc_id, chunk_idx""",

    // q286: positions × the six offsets, bounds-filtered — the same
    // pair stream the Spark explode emits (shared CTE chain with q288).
    "q286_skipgram_counts" -> skipgramCountSql,

    // q295: the stream must equal the batch, so the oracle is q286's
    // VERBATIM (the q170/q143/q198 stream==batch discipline).
    "q295_stream_skipgram" -> skipgramCountSql,

    // q288: the shared pair CTEs aggregated to a weighted edge table,
    // then PageRankRounds unrolled damped micro-rank rounds (85/100
    // hardcoded — the knob's red side) mirroring q120's oracle shape.
    "q288_textrank_keywords" -> {
      def round(k: Int, prev: String): String =
        s"""c$k AS (SELECT dst, sum((r * wsum) // wdeg) AS cs
                    FROM ew JOIN $prev ON ew.src = $prev.node GROUP BY dst),
            r$k AS (SELECT node, 150000 + (85 * coalesce(cs, 0)) // 100 AS r
                    FROM nodes LEFT JOIN c$k ON c$k.dst = nodes.node)"""
      val rounds = (1 to GraphQueries.PageRankRounds)
        .map(k => round(k, if (k == 1) "r0" else s"r${k - 1}"))
        .mkString(",\n")
      s"""WITH $skipgramSqlCtes,
          e AS (SELECT center AS src, context AS dst,
                       CAST(sum(w) AS BIGINT) AS wsum
                FROM pr GROUP BY center, context),
          wd AS (SELECT src, sum(wsum) AS wdeg FROM e GROUP BY src),
          ew AS (SELECT e.src, e.dst, e.wsum, wd.wdeg FROM e JOIN wd USING (src)),
          nodes AS (SELECT src AS node FROM wd),
          r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
          $rounds
          SELECT node AS word, CAST(r AS DOUBLE) / 1e6 AS tr
          FROM r${GraphQueries.PageRankRounds}
          ORDER BY tr DESC, word LIMIT 20"""
    },

    // q291: one word-count pass; the ranked top-64 joins each budget
    // it is visible to (rk <= N), totals cross-joined (1 row).
    "q291_vocab_budget_sweep" ->
      """WITH w AS (SELECT unnest(str_split(text, ' ')) AS word FROM documents),
          wc AS (SELECT word, count(*) AS c FROM w GROUP BY word),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
                         CAST(sum(c) AS BIGINT) AS n_tokens FROM wc),
          top AS (SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rk
                  FROM wc ORDER BY c DESC, word LIMIT 64),
          b AS (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS vocab_budget),
          cov AS (SELECT b.vocab_budget,
                         CAST(count(*) AS BIGINT) AS covered_types,
                         CAST(sum(top.c) AS BIGINT) AS covered_tokens
                  FROM b JOIN top ON top.rk <= b.vocab_budget
                  GROUP BY b.vocab_budget)
          SELECT vocab_budget, covered_types, n_types, n_tokens,
                 covered_tokens,
                 n_tokens - covered_tokens AS oov_tokens,
                 CAST((n_tokens - covered_tokens) * 10000 // n_tokens
                      AS BIGINT) AS oov_bp
          FROM cov CROSS JOIN tot ORDER BY vocab_budget""",

    // q298: one gram df/tf pass crossed into the 5 caps; zero-hit caps
    // still emit (left join against the literal cap table).
    "q298_stopcap_sweep" ->
      s"""WITH g AS (SELECT w, count(DISTINCT doc_id) AS df, count(*) AS tf
                     FROM (${oBigramTokens("documents", "doc_id")}) GROUP BY w),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n_grams,
                         CAST(sum(tf) AS BIGINT) AS n_postings FROM g),
          nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
                 WHERE len(str_split(text, ' ')) >= 2),
          c AS (SELECT CAST(unnest([2, 5, 10, 20, 40]) AS BIGINT) AS cap),
          st AS (SELECT cap, CAST(count(*) AS BIGINT) AS stopped_grams,
                        CAST(sum(tf) AS BIGINT) AS stopped_postings
                 FROM g CROSS JOIN nd CROSS JOIN c
                 WHERE df * cap > n_docs GROUP BY cap)
          SELECT c.cap,
                 CAST(coalesce(st.stopped_grams, 0) AS BIGINT) AS stopped_grams,
                 tot.n_grams,
                 CAST((coalesce(st.stopped_grams, 0) * 10000) // tot.n_grams
                      AS BIGINT) AS stopped_grams_bp,
                 CAST(coalesce(st.stopped_postings, 0) AS BIGINT)
                   AS stopped_postings,
                 tot.n_postings,
                 CAST((coalesce(st.stopped_postings, 0) * 10000) // tot.n_postings
                      AS BIGINT) AS stopped_mass_bp
          FROM c CROSS JOIN tot LEFT JOIN st ON st.cap = c.cap
          ORDER BY c.cap""",

    // q294: the shared chunk CTEs re-keyed into the BM25 corpus; the
    // candidate predicate keeps query docs out of the ranking.
    "q294_chunk_retrieval" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
          $chunkSqlCtes,
          bmc AS (SELECT doc_id, text FROM corpus
                  UNION ALL
                  SELECT doc_id * 1000 + chunk_idx + 1000000000 AS doc_id,
                         chunk_text AS text FROM chunks),
          ${oBm25Ctes("bmc", "doc_id % 25 = 0 AND doc_id < 1000000000",
                      "tf.doc_id >= 1000000000")},
          expected AS (SELECT doc_id AS qid FROM corpus WHERE doc_id % 25 = 0),
          nch AS (SELECT doc_id AS qid, count(*) AS n_chunks
                  FROM chunks GROUP BY doc_id),
          own AS (SELECT r.qid, min(r.rank) AS best_rank,
                         count(*) AS n_own_top10
                  FROM ranked r
                  WHERE r.rank <= 10
                    AND (r.doc_id - 1000000000) // 1000 = r.qid
                  GROUP BY r.qid)
          SELECT e.qid, CAST(nch.n_chunks AS BIGINT) AS n_chunks,
                 CAST(coalesce(own.best_rank, 0) AS BIGINT) AS best_rank,
                 CAST(coalesce(own.n_own_top10, 0) AS BIGINT) AS n_own_top10,
                 CAST(CASE WHEN coalesce(own.best_rank, 0) >= 1
                           THEN 1000000 // own.best_rank
                           ELSE 0 END AS BIGINT) AS rr_ppm
          FROM expected e JOIN nch ON nch.qid = e.qid
          LEFT JOIN own ON own.qid = e.qid
          ORDER BY e.qid""",

    // q285: planted header (aligned) + footer (unaligned) boilerplate,
    // then the cross-doc fingerprint census over the shared chunk CTEs.
    "q285_boilerplate_chunks" -> {
      val hdr = (0 until 40).map(i => s"b$i").mkString(" ")
      val ftr = (0 until 40).map(i => s"f$i").mkString(" ")
      s"""WITH corpus AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 7 = 3 THEN '$hdr ' ELSE '' END)
                     || text ||
                   (CASE WHEN doc_id % 5 = 2 THEN ' $ftr' ELSE '' END)
                     AS text
            FROM documents),
          $chunkSqlCtes
          SELECT chunk_md5, chunk_len,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                 count(*) AS n_chunks
          FROM chunks
          GROUP BY chunk_md5, chunk_len
          HAVING count(DISTINCT doc_id) >= 2
          ORDER BY n_docs DESC, chunk_md5 LIMIT 25"""
    },

    // q307: the unigram-LM round as one big unrolled CTE — whole-bit
    // integer piece costs (length(bin(total // cnt)) — no float log),
    // the Viterbi DP unrolled position by position (d1..d[MaxWordLen],
    // each step a ≤[MaxPieceLen]-arm union with (cost, path) argmin by
    // row_number — the exact tie-break Spark's array_min on
    // struct(cost, path) applies), then usage counts, the M-step
    // re-costing, and the same three report bands. BPE fertility rides
    // the shared oEncodeCtes encode chain over the same cohort.
    "q307_unigram_lm" -> {
      val P = UniMaxPieceLen
      val dpSteps = (1 to UniMaxWordLen).map { j =>
        val arms = (1 to math.min(P, j)).map { l =>
          s"""SELECT d.word, d.n, d.cost + p.bits AS cost,
                     d.path || '|' || p.piece AS path
              FROM d${j - l} d JOIN pv p
                ON p.word = d.word AND p.l = $l AND p.i = ${j - l + 1}"""
        }.mkString("\n UNION ALL\n")
        s"""d$j AS MATERIALIZED (SELECT word, n, cost, path FROM (
               SELECT *, row_number() OVER (PARTITION BY word
                           ORDER BY cost, path) AS rn
               FROM ($arms)) WHERE rn = 1)"""
      }.mkString(",\n")
      val finArms = (1 to UniMaxWordLen).map(j =>
        s"SELECT word, n, cost, path FROM d$j WHERE len(word) = $j")
        .mkString("\n UNION ALL\n")
      s"""WITH $oEncodeCtes,
          types AS MATERIALIZED (SELECT word, CAST(n AS BIGINT) AS n FROM w
                    WHERE len(word) <= $UniMaxWordLen),
          pos AS MATERIALIZED (SELECT word, n,
                         unnest(generate_series(1, len(word))) AS i
                  FROM types),
          occ AS MATERIALIZED (SELECT word, n, i,
                         unnest(generate_series(1,
                           least($P, len(word) - i + 1))) AS l
                  FROM pos),
          occ2 AS MATERIALIZED (SELECT word, n, i, l, substr(word, i, l) AS piece
                   FROM occ),
          cnts AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
                   FROM occ2 GROUP BY piece),
          vocab AS MATERIALIZED (SELECT piece, cnt FROM cnts
                    WHERE len(piece) = 1 OR cnt >= $UniMinPieceCnt),
          tt AS MATERIALIZED (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM vocab),
          costed AS MATERIALIZED (SELECT piece, cnt,
                            CAST(length(bin(t // cnt)) AS BIGINT) AS bits
                     FROM vocab, tt),
          pv AS MATERIALIZED (SELECT o.word, o.n, o.i, o.l, o.piece, c.bits
                 FROM occ2 o JOIN costed c USING (piece)),
          d0 AS MATERIALIZED (SELECT word, n, CAST(0 AS BIGINT) AS cost, '' AS path
                 FROM types),
          $dpSteps,
          fin AS MATERIALIZED ($finArms),
          usage AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS used FROM (
                      SELECT n, unnest(str_split(substr(path, 2), '|'))
                               AS piece
                      FROM fin)
                    GROUP BY piece),
          ut AS MATERIALIZED (SELECT CAST(sum(used) AS BIGINT) AS u FROM usage),
          rep AS MATERIALIZED (SELECT c.piece, c.cnt, c.bits,
                         CAST(COALESCE(g.used, 0) AS BIGINT) AS used,
                         CASE WHEN COALESCE(g.used, 0) > 0
                              THEN CAST(length(bin(u // g.used)) AS BIGINT)
                              ELSE CAST(0 AS BIGINT) END AS new_bits
                  FROM costed c LEFT JOIN usage g USING (piece), ut),
          top AS (SELECT CAST(row_number() OVER (ORDER BY used DESC, piece)
                           AS BIGINT) AS rank,
                         piece, cnt, bits, used, new_bits
                  FROM rep WHERE used > 0
                  ORDER BY used DESC, piece LIMIT 30),
          sm AS (SELECT CAST(0 AS BIGINT) AS rank, '__vocab__' AS piece,
                        CAST(count(*) AS BIGINT) AS cnt,
                        CAST(sum(used * bits) AS BIGINT) AS bits,
                        CAST(sum(CASE WHEN used = 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS used,
                        CAST(sum(used * new_bits) AS BIGINT) AS new_bits
                 FROM rep),
          uf AS (SELECT CAST(sum(n) AS BIGINT) AS nw,
                        CAST(sum(n * len(str_split(substr(path, 2), '|')))
                          AS BIGINT) AS np
                 FROM fin),
          bf AS (SELECT CAST(sum(n * len(list_filter(list_transform(
                          str_split(symstr, ';'), x -> trim(x)),
                          x -> x <> ''))) AS BIGINT) AS bp_np
                 FROM e$EncodeMerges WHERE len(word) <= $UniMaxWordLen),
          fert AS (SELECT CAST(-1 AS BIGINT) AS rank,
                          '__fertility__' AS piece,
                          nw AS cnt,
                          (np * 10000) // nw AS bits,
                          (bp_np * 10000) // nw AS used,
                          bp_np - np AS new_bits
                   FROM uf, bf)
          SELECT * FROM (SELECT * FROM top UNION ALL SELECT * FROM sm
                         UNION ALL SELECT * FROM fert)
          ORDER BY rank, piece"""
    },

    "q312_wordpiece" -> {
      val P = UniMaxPieceLen
      // greedy walk unrolled: each step consumes >= 1 char, so
      // UniMaxWordLen steps fully segment every cohort word
      val gSteps = (1 to UniMaxWordLen).map { j =>
        s"""g$j AS MATERIALIZED (SELECT g.word, g.n,
               CASE WHEN g.pos <= len(g.word) THEN g.pos + s.l
                    ELSE g.pos END AS pos,
               CASE WHEN g.pos <= len(g.word) THEN g.path || '|' || s.rp
                    ELSE g.path END AS path
             FROM g${j - 1} g LEFT JOIN st2 s
               ON s.word = g.word AND s.i = g.pos)"""
      }.mkString(",\n")
      s"""WITH w AS (SELECT word, count(*) AS n
                 FROM (SELECT unnest(str_split(text, ' ')) AS word
                       FROM documents)
                 WHERE word <> '' GROUP BY word),
          types AS MATERIALIZED (SELECT word, CAST(n AS BIGINT) AS n FROM w
                    WHERE len(word) <= $UniMaxWordLen),
          pos AS MATERIALIZED (SELECT word, n,
                         unnest(generate_series(1, len(word))) AS i
                  FROM types),
          occ AS MATERIALIZED (SELECT word, n, i,
                         unnest(generate_series(1,
                           least($P, len(word) - i + 1))) AS l
                  FROM pos),
          occ2 AS MATERIALIZED (SELECT word, n, i, l,
                          substr(word, i, l) AS piece, (i = 1) AS ini
                   FROM occ),
          pvoc AS MATERIALIZED (SELECT piece, ini, CAST(sum(n) AS BIGINT) AS cnt
                   FROM occ2 GROUP BY piece, ini
                   HAVING len(piece) = 1 OR sum(n) >= $UniMinPieceCnt),
          st AS MATERIALIZED (SELECT o.word, o.i, max(o.l) AS l
                 FROM occ2 o JOIN pvoc v
                   ON v.piece = o.piece AND v.ini = o.ini
                 GROUP BY o.word, o.i),
          st2 AS MATERIALIZED (SELECT word, i, l,
                         (CASE WHEN i > 1 THEN '##' ELSE '' END ||
                          substr(word, i, l)) AS rp
                  FROM st),
          g0 AS MATERIALIZED (SELECT word, n, 1 AS pos, '' AS path FROM types),
          $gSteps,
          fin AS MATERIALIZED (SELECT word, n, substr(path, 2) AS path
                  FROM g$UniMaxWordLen),
          usage AS MATERIALIZED (SELECT rp, CAST(sum(n) AS BIGINT) AS used,
                           CAST(count(DISTINCT word) AS BIGINT) AS n_types
                    FROM (SELECT word, n, unnest(str_split(path, '|')) AS rp
                          FROM fin)
                    GROUP BY rp),
          rendered AS (SELECT (CASE WHEN ini THEN '' ELSE '##' END || piece)
                                AS rp, ini, cnt
                       FROM pvoc),
          rep AS (SELECT r.rp, r.ini, r.cnt,
                         CAST(COALESCE(u.used, 0) AS BIGINT) AS used,
                         CAST(COALESCE(u.n_types, 0) AS BIGINT) AS n_types
                  FROM rendered r LEFT JOIN usage u USING (rp)),
          top AS (SELECT CAST(row_number() OVER (ORDER BY used DESC, rp)
                           AS BIGINT) AS rank,
                         rp AS piece,
                         CAST(CASE WHEN ini THEN 1 ELSE 0 END AS BIGINT)
                           AS ini,
                         cnt, used, n_types
                  FROM rep WHERE used > 0
                  ORDER BY used DESC, rp LIMIT 30),
          vs AS (SELECT CAST(0 AS BIGINT) AS rank, '__vocab__' AS piece,
                        CAST(sum(CASE WHEN ini THEN 1 ELSE 0 END) AS BIGINT)
                          AS ini,
                        CAST(sum(CASE WHEN ini THEN 0 ELSE 1 END) AS BIGINT)
                          AS cnt,
                        CAST(sum(CASE WHEN used > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS used,
                        (SELECT CAST(count(*) AS BIGINT) FROM types)
                          AS n_types
                 FROM rep),
          fert AS (SELECT CAST(-1 AS BIGINT) AS rank,
                          '__fertility__' AS piece,
                          CAST(sum(n) AS BIGINT) AS ini,
                          CAST(sum(n * len(word)) AS BIGINT) AS cnt,
                          CAST(sum(n * len(str_split(path, '|')))
                            AS BIGINT) AS used,
                          (CAST(sum(n * len(str_split(path, '|')))
                             AS BIGINT) * 10000)
                            // CAST(sum(n) AS BIGINT) AS n_types
                   FROM fin)
          SELECT * FROM (SELECT * FROM top UNION ALL SELECT * FROM vs
                         UNION ALL SELECT * FROM fert)
          ORDER BY rank, piece"""
    }
  )

  /** The unrolled BPE training chain (w, s0, then p$i/t$i/s$i per round)
    * shared by the q191 and q197 oracles — one copy of the round SQL. */
  /** DuckDB twin of [[bpeEncodedTypes]] — the q134/q259 shared encode
    * chain: global word types, the ONE-pass merge ranking, and the
    * e0..e[[EncodeMerges]] replace ladder. LEFT JOIN ON TRUE + CASE,
    * not CROSS JOIN: a missing rank i must be a no-op, not annihilate
    * the table (mirrors the Spark fold, which simply has fewer merges
    * to apply). */
  private def oEncodeCtes: String = {
    val encSteps = (1 to EncodeMerges).map { i =>
      s"""e$i AS (SELECT word, n,
                         CASE WHEN mp IS NULL THEN symstr
                              ELSE replace(symstr,
                                           ' ' || replace(mp, ' ', '; ') || ';',
                                           ' ' || replace(mp, ' ', '') || ';')
                         END AS symstr
                  FROM e${i - 1}
                  LEFT JOIN (SELECT pair AS mp FROM ranked WHERE r = $i)
                    ON TRUE)"""
    }.mkString(",\n")
    s"""w AS (SELECT word, count(*) AS n
                     FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
                     WHERE word <> '' GROUP BY word),
          e0 AS (SELECT word, n,
                        regexp_replace(word, '(.)', ' ${"\\1"};', 'g') AS symstr
                 FROM w),
          s0 AS (SELECT symstr, n FROM e0),
          ${oPairCounts("s0", "p0")},
          ranked AS (SELECT pair, row_number() OVER (ORDER BY cnt DESC, pair) AS r
                     FROM p0),
          $encSteps"""
  }

  private def oBpeTrainCtes: String = {
    val rounds = (1 to EncodeMerges).map { i =>
      s"""${oPairCounts(s"s${i - 1}", s"p$i", mat = true)},
          t$i AS MATERIALIZED (SELECT pair AS mp, cnt FROM p$i
                  ORDER BY cnt DESC, pair LIMIT 1),
          s$i AS MATERIALIZED (SELECT replace(symstr,
                                 ' ' || replace((SELECT mp FROM t$i), ' ', '; ') || ';',
                                 ' ' || replace((SELECT mp FROM t$i), ' ', '') || ';')
                           AS symstr, n
                  FROM s${i - 1})"""
    }.mkString(",\n")
    s"""w AS MATERIALIZED (SELECT word, count(*) AS n
                   FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
                   WHERE word <> '' GROUP BY word),
        s0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', ' ${"\\1"};', 'g') AS symstr, n FROM w),
        $rounds"""
  }
}
