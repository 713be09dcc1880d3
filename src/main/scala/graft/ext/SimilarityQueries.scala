package graft.ext

import graft.Tables
import graft.functions.VectorOps
import graft.ops.{davg, oAvg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - q50: brute-force cosine top-k — the recall-1 baseline. The query set
  *    is tiny and BROADCAST; the big side streams map-only (no shuffle of
  *    the corpus), so this scales linearly with corpus size at 100 TB.
  *  - q51: IVF-style ANN — assign every vector to its nearest of 16
  *    deterministic pseudo-centroids (cells), probe the 4 cells nearest to
  *    each query, search only those cells. The cell assignment is the
  *    O(n·C) map-only pass; the search touches ~C/4 of the corpus. On a
  *    real deployment centroids come from k-means and the assignment is
  *    written bucketed-by-cell so probes prune at the file level.
  *
  * Norms are computed once per vector and carried, never recomputed inside
  * pair scoring. All folds sequential-double (see [[VectorOps]]).
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  private def normed(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))

  /** SHARED LEXICAL RANK TABLE (r17 optimization): q119 and q194 fuse
    * the SAME lexical retriever (distinct bigram postings → stop-capped
    * idf-style weights → per-query summed scores → rank) with two
    * different semantic retrievers — before this each pass rebuilt the
    * identical words/terms/score/rank chain twice per suite pass. One
    * pinned (qid, doc_id, lex_rank) table per (session, dataset), the
    * cluster-ledger discipline; the chain is KNOB-FREE, so no knob key.
    * Production shape: the lexical index is ONE artifact consulted by
    * every hybrid route, not a per-query rebuild. */
  private val lexRankCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), GraphOps.Pinned]()

  /** Free the pinned lexical rank table and forget it (the scale probe
    * clears per timed q119 run — the build probe; q194 measures the
    * post-pin steady state). */
  def clearLexRankCache(): Unit = {
    lexRankCache.values().forEach(_.free())
    lexRankCache.clear()
  }

  private[graft] def sharedLexRank(s: SparkSession, d: String): DataFrame = {
    GraphOps.sweepStopped(lexRankCache)(_._1)
    lexRankCache.computeIfAbsent((s, d), _ => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val words = TextQueries.bigramTokens(docs, "doc_id").distinct()
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val terms = words.groupBy("w").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .filter(col("df") * TextQueries.BigramStopCap <= col("n_docs"))
        .select(col("w"), (col("n_docs") - col("df")).as("wt"))
      val qWords = words.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("qid"), col("w"))
      val lex = qWords.join(terms, "w").join(words, "w")
        .filter(col("doc_id") =!= col("qid"))
        .groupBy("qid", "doc_id").agg(sum(col("wt")).as("lex_score"))
      val lw = Window.partitionBy("qid")
        .orderBy(col("lex_score").desc, col("doc_id"))
      GraphOps.pin(lex.withColumn("lex_rank", row_number().over(lw))
        .select("qid", "doc_id", "lex_rank"))
    }).df
  }

  /** Nearest-centroid cell assignment (cosine, ties to the smaller cell
    * id) — map-only against the broadcast centroid table. Shared by q51's
    * one-shot build and q128's incremental maintenance. Input and output
    * carry (vec_id, embedding, nrm); output adds `cell`. */
  private def cellAssign(n: DataFrame, cent: DataFrame): DataFrame = {
    val aw = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id"))
    n.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        (VectorOps.dotSeq(col("embedding"), col("ce")) / (col("nrm") * col("cn"))).as("ccos"))
      .withColumn("arn", row_number().over(aw)).filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id").as("cell"))
  }

  /** One persisted ANN cell index per (session, dataset) — the q110
    * memoization precedent: the index build is a one-time layout
    * investment; the graded steady state is delta assignment + probe.
    * Like the q101 guard cache, entries live for the process unless
    * cleared — call [[clearIndexCache]] when a dataset's files are
    * rewritten in place (the graded fixtures are read-only) or when
    * rotating sessions in a long-lived JVM. */
  private val annIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Drop every memoized ANN index path — the next q128 build re-indexes.
    * (The parquet dirs themselves are Scratch-managed: deleted on JVM
    * exit.) */
  def clearIndexCache(): Unit = annIndexCache.clear()

  /** q346's standing STRUCTURAL index (assignments + cell stats + hub
    * shortlists), persisted once per (session, dataset) — the q128
    * store precedent extended to the structure a cell-local search
    * actually serves from. */
  private val ivfStructCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Drop every memoized structural-index path — the next q346 build
    * re-indexes. */
  def clearIvfStructCache(): Unit = ivfStructCache.clear()

  /** q346's per-cell hub-shortlist depth. */
  private[graft] val HubK = 8

  /** [[cellAssign]] variant that keeps the assigned-centroid cosine,
    * floor-quantized to integer micro-units (exact downstream sums —
    * the q122 discipline) instead of the embedding: (vec_id, cell,
    * qcos). Map-only against the broadcast centroids. */
  private def qcosAssign(nv: DataFrame, cent: DataFrame): DataFrame = {
    val aw = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id"))
    nv.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cent_id"),
        (VectorOps.dotSeq(col("embedding"), col("ce")) / (col("nrm") * col("cn"))).as("ccos"))
      .withColumn("arn", row_number().over(aw)).filter(col("arn") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"),
        floor(col("ccos") * lit(1e6)).as("qcos"))
  }

  /** SHARED NSW build — the converged layer-0 adjacency and the layer-1
    * entry beam, memoized per (session, dataset, reverse-edges knob)
    * in the [[DedupQueries.sharedCandidatePairs]] discipline (r15
    * verdict item 2: q308 and q332 each ran the identical NN-descent
    * build, the suite's most expensive machinery, twice per pass).
    * This is exactly what a production ANN deployment does: the graph
    * is BUILT once and SERVED many times; the graded queries are two
    * reads of one index. The knob state is part of the KEY, not a
    * cache clear: MutationSpec's red-case constructs the degraded
    * graph in its own slot, so both q308 and q332 still go red while
    * the production slot stays untouched. Values are GraphOps pins
    * (id-tuple tables: n·M adjacency rows, |queries|·beam beam rows —
    * MEMORY_AND_DISK, disk-backed at scale); entries live for the
    * session; [[clearNswCache]] frees the blocks and drops them. */
  private val nswCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Boolean), NswEngine]()

  /** Free every memoized NSW engine's storage blocks (normed-corpus pin,
    * adjacency, entry beam) and forget it — the next q308/q332 build
    * re-descends. */
  def clearNswCache(): Unit = {
    nswCache.values().forEach(_.freeShared())
    nswCache.clear()
  }

  /** The session's NSW engine for (dataset, knob) — the whole engine is
    * the memo unit so the normed-corpus pin is shared too, not just the
    * graph. */
  private[graft] def nswEngine(s: SparkSession, d: String): NswEngine = {
    // stopped-session entries are dropped, not freed: a dead context's
    // blocks are already gone (r16 advice — the sweep every session-
    // keyed memo runs, see [[GraphOps.sweepStopped]])
    GraphOps.sweepStopped(nswCache)(_._1)
    nswCache.computeIfAbsent(
      (s, d, graft.Mutations.on("q308_reverse_edges_dropped")),
      _ => new NswEngine(s, d))
  }

  /** q50's brute-force cosine top-k per query (qid < 10, self excluded):
    * (qid, rank, vec_id, cos_sim), unordered. The query side broadcasts;
    * the corpus streams through once; the per-query top-k is a bounded
    * window. Shared by q50 and the q204 truth side. */
  private def bruteTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val n = normed(s, d)
    val q = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = n.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos_sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "cos_sim")
  }

  /** The 16 seed centroids over the normed corpus. ONE seam for every
    * IVF consumer (q51/q128/q204/q207/q287/q292…), so [[graft
    * .Mutations]] can plant the index-build fencepost
    * ("q51_seed_fencepost": 17 seeds) once and red-case the family —
    * the oracle CTEs hardcode `vec_id < 16`, so every cell boundary
    * shifts and the harness goes red. Knob read at plan-construction
    * time (compile-time constant when off). */
  private def seedCentroids(n: DataFrame): DataFrame = {
    val c = if (graft.Mutations.on("q51_seed_fencepost")) 17 else 16
    n.filter(col("vec_id") < c)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("nrm").as("cn"))
  }

  /** Per-query probed cells: the `maxProbes` nearest centroids per qid
    * (qid < 10), with the probe rank `prn` attached — map-only against
    * the broadcast centroid table. Shared by [[ivfTopK]] (fixed probe
    * count) and q207 (the probe-count sweep). */
  private def probedCells(n: DataFrame, cent: DataFrame,
                          maxProbes: Int): DataFrame = {
    val pw = Window.partitionBy(col("qid")).orderBy(col("pcos").desc, col("cent_id"))
    n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      .crossJoin(broadcast(cent))
      .select(col("qid"), col("qe"), col("qn"), col("cent_id"),
        (VectorOps.dotSeq(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("pcos"))
      .withColumn("prn", row_number().over(pw)).filter(col("prn") <= maxProbes)
      .select(col("qid"), col("qe"), col("qn"), col("cent_id").as("cell"), col("prn"))
  }

  /** q51's IVF route: 16 seed centroids, 4-probe cell search, top-k per
    * query: (qid, rank, vec_id, cos_sim), unordered. Shared by q51 and
    * the q204 system side. */
  private def ivfTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val n = normed(s, d)
    val cent = seedCentroids(n)
    // cell assignment: map-only pass against broadcast centroids
    val assign = cellAssign(n, cent)
    val probes = probedCells(n, cent, 4).drop("prn")
    // search only probed cells
    val rw = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id"))
    probes.join(assign, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos_sim"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "cos_sim")
  }

  private val normedSql =
    s"n AS (SELECT vec_id, embedding, ${VectorOps.oNorm("embedding")} AS nrm FROM embeddings)"

  /** Semantic-dedup corpus: embeddings ∪ planted scaled copies
    * (vec_id + 100k, every 10th vector, elements ×2). A scaled copy has
    * cosine exactly ~1.0 with its original (same direction), so it is a
    * semantic duplicate by construction; the organic table's max pairwise
    * cosine is ~0.53, so a 0.99 threshold isolates exactly the planted
    * structure. ×2 is chosen because it is exact in float32 — both
    * engines produce bit-identical copies. */
  private def semCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d).select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))").as("embedding"))
    base.unionByName(planted)
  }

  private val semCorpusSql =
    """emb AS (SELECT vec_id, embedding FROM embeddings
               UNION ALL
               SELECT vec_id + 100000 AS vec_id,
                      list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS embedding
               FROM embeddings WHERE vec_id % 10 = 0)"""

  /** Cosine threshold above which two vectors count as semantic dups. */
  private val SemDupThreshold = 0.99

  def queries: Map[String, Q] = Map(
    // Semantic dedup over embeddings: sign-LSH banded candidate generation
    // (a positive scalar multiple lands on the same side of every random
    // hyperplane, so planted copies collide in ALL bands — recall 1.0 by
    // construction), exact cosine >= 0.99 on candidates only, survivor =
    // smaller vec_id. The band/cap/self-join machinery is
    // [[DedupQueries.signLshCosineCandidates]], shared with q44. At
    // 100 TB the corpus shuffles once on (band, bh); no all-pairs path
    // exists; the mega-bucket cap bounds the worst cell.
    "q107_semantic_dedup" -> ((s, d) =>
      DedupQueries.signLshCosineCandidates(semCorpus(s, d))
        .filter(col("cos_sim") >= SemDupThreshold)
        .select(col("id1").as("survivor_id"), col("id2").as("removed_id"),
          col("cos_sim"))
        .orderBy("survivor_id", "removed_id")),

    // SemDeDup (Abbas et al. 2023): semantic dedup scoped to k-means
    // cells — assign every vector to its nearest centroid (the q51 cell
    // map, broadcast centroids, map-only), then prune near-duplicates
    // ONLY within each cell: a vector is removed iff a lower-id
    // cell-mate sits above the cosine threshold; its keeper is the
    // smallest such id. Complements q107's sign-LSH route: LSH bands
    // bound recall probabilistically, cells bound PAIR WORK structurally
    // (cell population caps the quadratic surface; K grows with the
    // corpus so cells stay constant-sized). The planted ×2 copies land
    // in their original's cell deterministically — a positive scalar
    // multiple has the SAME cosine to every centroid (dot and norm both
    // scale by exactly 2 in IEEE doubles), so recall on the planted
    // structure is 1.0 by construction.
    "q201_semdedup" -> ((s, d) => {
      val n = semCorpus(s, d).select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"))
      val cent = n.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      val assign = cellAssign(n, cent)
      val a = assign.select(col("cell"), col("vec_id").as("ka"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = assign.select(col("cell"), col("vec_id").as("kb"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      val pairs = a.join(b, Seq("cell")).filter(col("ka") < col("kb"))
        .select(col("cell"), col("ka"), col("kb"),
          (VectorOps.dotSeq(col("ea"), col("eb")) / (col("na") * col("nb")))
            .as("cos"))
        .filter(col("cos") >= SemDupThreshold)
      val w = Window.partitionBy(col("kb")).orderBy(col("ka"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("kb").as("removed_id"), col("ka").as("keeper_id"),
          col("cell"), round(col("cos"), 6).as("cos_sim"))
        .orderBy("removed_id")
    }),

    "q50_knn_brute" -> ((s, d) =>
      bruteTopK(s, d, 5).orderBy("qid", "rank")),

    "q51_ivf_ann" -> ((s, d) =>
      ivfTopK(s, d, 5).orderBy("qid", "rank")),

    // Retrieval-quality EVAL for the ANN stack: nDCG@5 of the q51 IVF
    // route against q50's brute-force truth, per query. Graded
    // relevance = 6 − brute rank (top truth hit worth 5, fifth worth
    // 1); a system hit outside the truth top-5 contributes 0. Gains are
    // quantized to micro-units per row and summed as exact integers
    // (the q66 fixed-point discipline), so per-query DCG/IDCG are
    // hash-stable. This is the measurement a pipeline runs when tuning
    // the probe count / cell count trade-off — recall@k (q49) tells you
    // WHAT was missed, nDCG tells you how much the RANKING suffered.
    // Scale: truth is the expensive side (brute force) but runs over
    // the same bounded query set; everything downstream is top-k-sized.
    "q204_ann_ndcg" -> ((s, d) => {
      val truth = bruteTopK(s, d, 5)
        .select(col("qid"), col("vec_id"), col("rank").as("rt"),
          (lit(6) - col("rank")).as("rel"))
      val sys = ivfTopK(s, d, 5)
        .select(col("qid"), col("vec_id"), col("rank").as("rs"))
      val dcg = sys
        .join(truth.select(col("qid"), col("vec_id"), col("rel")),
          Seq("qid", "vec_id"), "left")
        .select(col("qid"), expr(
          "CAST(round(coalesce(rel, 0) / log2(rs + 1.0) * 1000000) AS BIGINT)")
          .as("g_fp"))
        .groupBy("qid").agg(sum(col("g_fp")).as("dcg_fp"))
      val idcg = truth
        .select(col("qid"), expr(
          "CAST(round(rel / log2(rt + 1.0) * 1000000) AS BIGINT)").as("g_fp"))
        .groupBy("qid").agg(sum(col("g_fp")).as("idcg_fp"))
      dcg.join(idcg, "qid")
        .select(col("qid"),
          round(col("dcg_fp").cast("double") / col("idcg_fp"), 6).as("ndcg"))
        .orderBy("qid")
    }),

    // Hybrid retrieval with reciprocal-rank fusion — the RAG serving shape:
    // a lexical retriever and a vector retriever each produce a ranking per
    // query; RRF fuses them without score calibration. Lexical side is an
    // inverted-index join over word-BIGRAM postings (phrase indexing),
    // df-weighted with INTEGER weights (wt = N − df, rarer ⇒ heavier —
    // idf-flavored but exact, so the score sum is order-independent
    // without decimal help), stop terms (df > N/10) dropped before the
    // join like q101's stop-gram cap. Bigrams, not unigrams, because
    // postings must be DISCRIMINATIVE to bound the join: this fixture's
    // synthetic 31-word unigram vocabulary has median df ≈ 0.8N (every
    // unigram is a stop word — a unigram variant both emptied the cap'd
    // term list AND fanned to ~15M posting pairs uncapped), while its
    // ~900 bigrams sit at median df ≈ 0.06N; real Zipfian corpora put
    // most MASS in such a head too, which is why production phrase/
    // shingle indexes exist. At 100 TB the posting join shuffles on TERM
    // (the inverted-index sharding), the query side is tiny, and the
    // semantic side is q50's broadcast-queries map-only scan; the fuse is
    // a (qid, doc)-keyed outer join of two top-k-able rank lists.
    // Hybrid retrieval, PRODUCTION shape — q119's RRF fuse with the
    // semantic retriever routed through the q51 IVF cell index instead
    // of brute force: per-query vector work drops from ALL N vectors to
    // the 4 probed cells' members. The cell count is the scale knob
    // (production grows it ~√N, making per-query work O(√N·dim)); this
    // is the named fix for the SCALE_r9 q119 caveat — the demo query
    // set still grows with the corpus, but each query's cost no longer
    // scans the whole index. Lexical branch and fuse are identical to
    // q119, so the two queries differ ONLY in the retriever routing.
    "q194_hybrid_rrf_ivf" -> ((s, d) => {
      // r17: the lexical branch is the shared pinned rank table (built
      // once per session, identical chain) — only the IVF-routed
      // semantic branch and the fuse are per-pass work.
      val lexRank = sharedLexRank(s, d)
      val n = normed(s, d)
      val cent = n.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("nrm").as("cn"))
      val assign = cellAssign(n, cent)
      val q = n.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val pw = Window.partitionBy(col("qid")).orderBy(col("pcos").desc, col("cent_id"))
      val probes = q.crossJoin(broadcast(cent))
        .select(col("qid"), col("qe"), col("qn"), col("cent_id"),
          (VectorOps.dotSeq(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("pcos"))
        .withColumn("prn", row_number().over(pw)).filter(col("prn") <= 4)
        .select(col("qid"), col("qe"), col("qn"), col("cent_id").as("cell"))
      val rw = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("doc_id"))
      val semRank = probes.join(assign, "cell")
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("doc_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos_sim"))
        .withColumn("sem_rank", row_number().over(rw))
        .select("qid", "doc_id", "sem_rank")
      val fused = lexRank.join(semRank, Seq("qid", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)))
      val fw = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id"))
      fused.withColumn("rank", row_number().over(fw))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("doc_id"),
          coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
          coalesce(col("sem_rank"), lit(0)).as("sem_rank"),
          col("rrf"))
        .orderBy("qid", "rank")
    }),

    "q119_hybrid_rrf" -> ((s, d) => {
      // r17: lexical branch = the shared pinned rank table (one build
      // per session serves q119 AND q194); the brute-force semantic
      // branch — this query's own baseline role — is unchanged.
      val lexRank = sharedLexRank(s, d)
      val n = normed(s, d)
      val q = n.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val sem = n.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("doc_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos_sim"))
      val sw = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("doc_id"))
      val semRank = sem.withColumn("sem_rank", row_number().over(sw))
        .select("qid", "doc_id", "sem_rank")
      // RRF: 1/(60+rank) per list, absent ⇒ 0. Integer ranks make each term
      // a deterministic IEEE division; the two-term sum has a fixed order.
      val fused = lexRank.join(semRank, Seq("qid", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)))
      val fw = Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id"))
      fused.withColumn("rank", row_number().over(fw))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("doc_id"),
          coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
          coalesce(col("sem_rank"), lit(0)).as("sem_rank"),
          col("rrf"))
        .orderBy("qid", "rank")
    }),

    // Incremental ANN index maintenance — the ANN twin of q103's
    // new×old-only dedup principle: the standing corpus's cell
    // assignments are a PERSISTED index (built once per session+dataset,
    // the q110 memoization precedent), and an arriving delta batch is
    // assigned in a DELTA-SIZED map-only job against the same (fixed)
    // centroids — the corpus is never re-assigned, which at 100 TB is
    // the difference between touching a day's ingest and rebuilding the
    // index. Queries then probe cells over the union index exactly as
    // q51. Delta = every 7th vector scaled ×0.5 (power-of-two scaling is
    // EXACT in IEEE floats and commutes with the sequential fold, so a
    // delta copy's cosine ties its original bit-for-bit and the
    // (cos desc, vec_id) order resolves deterministically in both
    // engines). PlanSpec pins that the graded plan consumes the index
    // from disk.
    "q128_incremental_ann" -> ((s, d) => {
      val n = normed(s, d)
      val cent = n.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("nrm").as("cn"))
      GraphOps.sweepStopped(annIndexCache)(_._1)
      val idxPath = annIndexCache.computeIfAbsent((s, d), _ => {
        val p = graft.ops.Scratch.dir("graft_ann_idx") + "/assign"
        cellAssign(n, cent).write.mode("overwrite").parquet(p)
        p
      })
      val oldIdx = s.read.parquet(idxPath)
      val delta = Tables.embeddings(s, d).filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 200000L).as("vec_id"),
          expr("transform(embedding, x -> x * CAST(0.5 AS FLOAT))").as("embedding"))
        .withColumn("nrm", VectorOps.norm(col("embedding")))
      val index = oldIdx.unionByName(cellAssign(delta, cent))
      val q = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val pw = Window.partitionBy(col("qid")).orderBy(col("pcos").desc, col("cent_id"))
      val probes = q.crossJoin(broadcast(cent))
        .select(col("qid"), col("qe"), col("qn"), col("cent_id"),
          (VectorOps.dotSeq(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("pcos"))
        .withColumn("prn", row_number().over(pw)).filter(col("prn") <= 4)
        .select(col("qid"), col("qe"), col("qn"), col("cent_id").as("cell"))
      val rw = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id"))
      probes.join(index, "cell")
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos_sim"))
        .withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos_sim")
        .orderBy("qid", "rank")
    }),

    // INCREMENTAL IVF INDEX MAINTENANCE — the vector twin of q345's
    // incremental BM25 (r16 verdict item 3): q128 maintains the
    // POSTINGS incrementally; this maintains the index STRUCTURE. The
    // standing index (built once per session+dataset from the base
    // corpus, persisted to parquet — the q128 store precedent) carries
    // three tables: per-vector cell assignments with the centroid
    // cosine floor-quantized to integer micro-units (the q122
    // discipline — every downstream stat is exact integer arithmetic),
    // per-cell occupancy stats (n, Σqcos), and the per-cell HUB
    // SHORTLIST (the HubK vectors closest to the centroid — the entry
    // points a cell-local search starts from). A 10% delta
    // (vec_id % 10 = 7) is absorbed by: (1) re-route — assign ONLY the
    // delta against the fixed centroids, map-only, delta-sized;
    // (2) stats merge — count/sum adds, exact by construction;
    // (3) LOCAL repair — the merged shortlist re-ranks base-top-HubK ∪
    // delta-in-cell, which is LOSSLESS (a base vector outside its base
    // shortlist is dominated by HubK still-present base vectors and
    // can never enter the merged one) and touches HubK + |delta-in-
    // cell| rows per cell, never the cell population. The oracle
    // builds the same census FROM SCRATCH over the full corpus, so
    // oracle equality IS the incremental == rebuild witness (the
    // q345/q329 discipline). Output per cell: occupancy, delta share,
    // Σqcos, shortlist floor, delta entrants, and an overfull flag
    // (n > 1 + 125%·N/16 — the rebalance signal an index operator
    // pages on).
    // Scale: at 100 TB the base is never re-assigned or re-ranked; the
    // round is one delta-sized broadcast pass + 16-cell-sized merges.
    // Mutation seam (knob OFF in every production plan): postings
    // appended but cell stats NOT refreshed — the q345 bug class on
    // the vector route; every delta-receiving cell's occupancy and
    // Σqcos go stale while n_from_delta still reports the ingest.
    "q346_incremental_ivf_maintenance" -> ((s, d) => {
      val n = normed(s, d)
      val cent = seedCentroids(n)
      GraphOps.sweepStopped(ivfStructCache)(_._1)
      val idxPath = ivfStructCache.computeIfAbsent((s, d), _ => {
        val p = graft.ops.Scratch.dir("graft_ivf_struct")
        val assigned = qcosAssign(n.filter(col("vec_id") % 10 =!= 7), cent)
        assigned.write.mode("overwrite").parquet(s"$p/assign")
        val hw = Window.partitionBy(col("cell"))
          .orderBy(col("qcos").desc, col("vec_id"))
        s.read.parquet(s"$p/assign")
          .withColumn("hr", row_number().over(hw)).filter(col("hr") <= HubK)
          .select("cell", "vec_id", "qcos")
          .write.mode("overwrite").parquet(s"$p/hubs")
        s.read.parquet(s"$p/assign")
          .groupBy("cell").agg(count(lit(1)).as("bn"), sum(col("qcos")).as("bsum"))
          .write.mode("overwrite").parquet(s"$p/stats")
        p
      })
      val baseHubs = s.read.parquet(s"$idxPath/hubs")
      val baseStats = s.read.parquet(s"$idxPath/stats")
      val delta = qcosAssign(n.filter(col("vec_id") % 10 === 7), cent)
      val deltaStats = delta.groupBy("cell")
        .agg(count(lit(1)).as("dn"), sum(col("qcos")).as("dsum"))
      val stale = graft.Mutations.on("q346_cell_stats_not_refreshed")
      val stats = baseStats.join(deltaStats, Seq("cell"), "full_outer")
        .select(col("cell"),
          (if (stale) coalesce(col("bn"), lit(0L))
           else coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_vectors"),
          coalesce(col("dn"), lit(0L)).as("n_from_delta"),
          (if (stale) coalesce(col("bsum"), lit(0L))
           else coalesce(col("bsum"), lit(0L)) + coalesce(col("dsum"), lit(0L)))
            .as("sum_qcos"))
      val hw = Window.partitionBy(col("cell"))
        .orderBy(col("qcos").desc, col("vec_id"))
      val hubs = baseHubs
        .unionByName(delta.select("cell", "vec_id", "qcos"))
        .withColumn("hr", row_number().over(hw)).filter(col("hr") <= HubK)
        .groupBy("cell").agg(min(col("qcos")).as("hub_min_qcos"),
          sum(when(col("vec_id") % 10 === 7, 1L).otherwise(0L)).as("n_delta_hubs"))
      val total = stats.agg(sum(col("n_vectors")).as("nt"))
      stats.join(hubs, Seq("cell"))
        .crossJoin(broadcast(total))
        .select(col("cell"), col("n_vectors"), col("n_from_delta"),
          col("sum_qcos"), col("hub_min_qcos"), col("n_delta_hubs"),
          (col("n_vectors") > lit(1L) + expr("(5 * nt) DIV 64")).as("overfull"))
        .orderBy("cell")
    }),

    // Product-quantization ANN with asymmetric distance computation — the
    // memory-compression scale path that complements q51's IVF: the corpus
    // is stored as M=8 one-byte codes (64 float dims → 8 bytes), queries
    // score candidates by summing M precomputed LUT entries instead of a
    // 64-dim float kernel. Encode is a one-time map-only indexing pass
    // against the broadcast codebook (16 centroids × 8 subspaces); the
    // search never touches raw corpus vectors. At 100 TB the codes table
    // is ~1000× smaller than the embeddings and the LUT is
    // queries × 8 × 16 rows — broadcast by construction.
    // Cross-engine exactness: LUT distances are floor-quantized to
    // integer micro-units (floor is rounding-mode-free, unlike decimal
    // casts — the q120 lesson), so the ADC sum is exact integer
    // arithmetic, exactly like production PQ's uint8/16 SIMD LUTs.
    "q122_pq_adc" -> ((s, d) =>
      pqAdcRanked(s, d)
        .filter(col("rank") <= 5)
        .select("qid", "rank", "vec_id", "adc_dist")
        .orderBy("qid", "rank")),

    // The ANN serving CASCADE: coarse quantized search (q122's PQ-ADC)
    // proposes top-[[AdcRerankPool]] candidates per query, then the exact
    // full-precision cosine re-scores ONLY those — the retrieve-cheap /
    // rerank-expensive two-stage shape every production vector store
    // runs. At 100 TB stage 1 touches 8-byte codes and stage 2 touches
    // 20 raw vectors per query instead of the corpus; the rerank join is
    // candidate-bounded by construction.
    "q129_adc_rerank" -> ((s, d) => {
      val cand = pqAdcRanked(s, d).filter(col("rank") <= AdcRerankPool)
        .select("qid", "vec_id")
      val n = normed(s, d)
      val q = n.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      val rw = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
      cand.join(n, "vec_id").join(broadcast(q), "qid")
        .select(col("qid"), col("vec_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cos_sim"))
        .withColumn("rank", row_number().over(rw)).filter(col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos_sim")
        .orderBy("qid", "rank")
    }),

    // Top principal component by distributed power iteration — the PCA
    // kernel of embedding whitening/compression. Each round is ONE
    // map-only pass over the corpus: s_i = x_i·v − mu·v (row-local fold
    // against the broadcast-literal direction), then a (dim)-keyed
    // partial aggregate of x_ij·s_i — the corpus never row-shuffles; only
    // 64 (dim, sum) cells move, so the round is scan-bound at 100 TB.
    // Centering never materializes centered vectors: w = Σ x s − mu Σ s.
    // The 64-double direction vector is driver-collected per round
    // (control-plane, like q88's centroids). Cross-engine float hygiene:
    // row folds are sequential doubles (DotProduct ≡ list_reduce), sums
    // decimal-exact, and all driver scalar math uses the same operation
    // order the oracle's unrolled SQL performs — bit-identical loadings.
    "q114_power_iteration" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val mu = e.select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("dim").agg(davg(col("x").cast("double"), 9).as("m"))
        .orderBy("dim").collect().map(_.getDouble(1))
      var v = Array.tabulate(Dims)(i => if (i == 0) 1.0 else 0.0)
      for (_ <- 0 until PowerIterRounds) {
        val muDotV = mu.zip(v).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
        val vLit = array(v.toIndexedSeq.map(lit): _*)
        val scored = e.select(col("embedding"),
          (VectorOps.dotSeq(col("embedding"), vLit) - lit(muDotV)).as("s"))
        // Σs rides the SAME aggregation job as the per-dim sums: every dim
        // group contains each row exactly once, so any group's dsum(s)
        // equals the global Σs with identical decimal rounding — one
        // corpus pass per round, not two
        val rows = scored
          .select(posexplode(col("embedding")).as(Seq("dim", "x")), col("s"))
          .groupBy("dim").agg(
            graft.ops.dsum(col("x").cast("double") * col("s"), 6).as("a"),
            graft.ops.dsum(col("s"), 6).as("ss"))
          .orderBy("dim").collect()
        val a = rows.map(_.getDouble(1))
        val sSum = rows.head.getDouble(2)
        val w = a.indices.map(j => a(j) - mu(j) * sSum).toArray
        val nrm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
        v = w.map(_ / nrm)
      }
      import s.implicits._
      v.zipWithIndex.map { case (x, i) => (i, x) }.toSeq
        .toDF("dim", "loading").orderBy("dim")
    }),

    // One Lloyd (k-means) refinement round — the training loop that
    // produces q51's IVF centroids, with oracle parity: deterministic
    // seeds (vec_id < 8), cosine assignment against broadcast centroids
    // (map-only over the corpus), per-dimension decimal-exact means for
    // the new centroids, then reassignment. The per-round cost is one
    // corpus scan + one (cluster, dim)-keyed aggregate — at 100 TB the
    // corpus never shuffles by row, only the 8×64 centroid matrix moves.
    // IVF probe-count sweep — recall@5 vs probes ∈ {1,2,4,8}, the tuning
    // curve for the q51/q194 route (more probed cells = more vector
    // comparisons = higher recall; the production question is where the
    // curve flattens). ONE pass prices the whole curve (the q189
    // discipline): cell candidates are materialized once at the MAX
    // probe count with the probe rank attached, the sweep explodes each
    // candidate only into the probe budgets that would have seen it
    // (prn <= p), and per-(qid, p) top-5 + a truth semi-join score
    // every budget simultaneously. Recall arithmetic is pure integer.
    "q207_ivf_probe_sweep" -> ((s, d) => {
      val ps = Seq(1, 2, 4, 8)
      val n = normed(s, d)
      val cent = seedCentroids(n)
      val assign = cellAssign(n, cent)
      val cand = probedCells(n, cent, ps.max).join(assign, "cell")
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("prn"), col("vec_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm")))
            .as("cos_sim"))
      val swept = cand
        .withColumn("p", explode(array(ps.map(lit(_)): _*)))
        .filter(col("prn") <= col("p"))
      val rw = Window.partitionBy("qid", "p")
        .orderBy(col("cos_sim").desc, col("vec_id"))
      val sysTop = swept.withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 5)
      val truth = bruteTopK(s, d, 5).select(col("qid"), col("vec_id"))
      val truthN = truth.agg(count(lit(1)).as("n_truth"))
      val hits = sysTop.join(truth, Seq("qid", "vec_id"))
        .groupBy("p").agg(count(lit(1)).as("n_hits"))
      n.sparkSession.range(1)
        .select(explode(array(ps.map(lit(_)): _*)).as("p"))
        .join(hits, Seq("p"), "left")
        .crossJoin(broadcast(truthN))
        .select(col("p").as("probes"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          expr("(coalesce(n_hits, 0) * 10000) DIV n_truth").as("recall_bp"))
        .orderBy("probes")
    }),

    // Two-stage retrieval CASCADE — the standard serving topology
    // (cheap wide recall, expensive narrow precision) as one graded
    // query: BM25 retrieves top-20 per query (q125's machinery via the
    // shared bm25TopK), then every candidate WITH an embedding is
    // re-scored by exact cosine against the query vector and the final
    // top-5 ranks rerankable candidates by cosine ahead of
    // vector-less ones in lexical order. The PARTIALLY-embedded corpus
    // is the deliberate hard case (at sf0.1 only 2/5 of docs carry
    // vectors): the cascade must degrade per-candidate, not per-query.
    // Scale: stage-2 cost is |queries|·20 lookups against the vector
    // table — the whole point of cascading; the vector side joins on
    // its key, no scan of the embedding corpus beyond the join.
    "q231_rerank_cascade" -> ((s, d) => {
      val cand = TextQueries.sharedDocBm25Top20(s, d)
      val n = normed(s, d)
      val qv = n.select(col("vec_id").as("qid"),
        col("embedding").as("qe"), col("nrm").as("qn"))
      val cv = n.select(col("vec_id").as("doc_id"),
        col("embedding").as("ce"), col("nrm").as("cn"))
      val up = cand.join(qv, Seq("qid"), "left").join(cv, Seq("doc_id"), "left")
        .withColumn("cos",
          when(col("qe").isNotNull && col("ce").isNotNull,
            VectorOps.dotSeq(col("qe"), col("ce")) / (col("qn") * col("cn"))))
        .select(col("qid"), col("doc_id"), col("rank"), col("cos"))
      val w = Window.partitionBy("qid").orderBy(
        when(col("cos").isNotNull, 0).otherwise(1),
        when(col("cos").isNotNull, -col("cos")).otherwise(lit(0.0)),
        col("rank"), col("doc_id"))
      up.withColumn("final_rank", row_number().over(w))
        .filter(col("final_rank") <= 5)
        .select(col("qid"), col("final_rank"), col("doc_id"),
          when(col("cos").isNotNull, "rerank").otherwise("lexical").as("stage"),
          col("cos").as("cos_sim"))
        .orderBy("qid", "final_rank")
    }),

    // Matryoshka truncation sweep (Kusupati et al. 2022) — recall@5 of
    // brute-force cosine at PREFIX dimensionalities {8, 16, 32, 64} vs
    // the full-width truth: the tuning curve for serving truncated
    // embeddings (4× less memory/bandwidth per halving if the head of
    // the vector carries the signal). ONE queries×corpus pass prices
    // the whole curve (the q189/q207 discipline): prefix slices and
    // their norms are computed once per vector map-side, each pair
    // explodes into its |dims| (m, cos_m) rows, and per-(qid, m) top-5
    // + a truth self-join score every width simultaneously. The m=64
    // row is the recall-10000 anchor by construction. Recall arithmetic
    // is pure integer; cosines ride the sequential-fold [[VectorOps]]
    // kernels so the sweep hash-grades cross-engine.
    "q213_matryoshka_recall" -> ((s, d) => {
      val ms = Seq(8, 16, 32, 64)
      val pre = ms.foldLeft(Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))) { (acc, m) =>
        acc.withColumn(s"e$m", slice(col("embedding"), 1, m))
          .withColumn(s"n$m", VectorOps.norm(col(s"e$m")))
      }
      val q = pre.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid") +:
          ms.flatMap(m => Seq(col(s"e$m").as(s"qe$m"), col(s"n$m").as(s"qn$m"))): _*)
      val scored = pre.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          explode(array(ms.map(m => struct(lit(m).as("m"),
            (VectorOps.dotSeq(col(s"qe$m"), col(s"e$m")) /
              (col(s"qn$m") * col(s"n$m"))).as("cos"))): _*)).as("mc"))
        .select(col("qid"), col("vec_id"), col("mc.m").as("m"), col("mc.cos").as("cos"))
      val rw = Window.partitionBy("qid", "m")
        .orderBy(col("cos").desc, col("vec_id"))
      val top = scored.withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 5)
      val truth = top.filter(col("m") === ms.max).select(col("qid"), col("vec_id"))
      val truthN = truth.agg(count(lit(1)).as("n_truth"))
      val hits = top.join(truth, Seq("qid", "vec_id"))
        .groupBy("m").agg(count(lit(1)).as("n_hits"))
      pre.sparkSession.range(1)
        .select(explode(array(ms.map(lit(_)): _*)).as("m"))
        .join(hits, Seq("m"), "left")
        .crossJoin(broadcast(truthN))
        .select(col("m").as("dims"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          expr("(coalesce(n_hits, 0) * 10000) DIV n_truth").as("recall_bp"))
        .orderBy("dims")
    }),

    // ANN index HEALTH report — the cell-population census an index
    // operator monitors: a skewed cell map means probe latency variance
    // (hot cells scan more) and is the trigger for re-training
    // centroids (q88's Lloyd round). balance_bp = 10000 means the cell
    // holds exactly its fair 1/16 share. One map-only assignment pass +
    // one 16-group aggregate; the totals row broadcasts back.
    "q209_ann_index_stats" -> ((s, d) => {
      val n = normed(s, d)
      val cent = seedCentroids(n)
      val cells = cellAssign(n, cent)
        .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
      val tot = cells.agg(sum(col("n_vecs")).as("n_total"))
      cells.crossJoin(broadcast(tot))
        .select(col("cell"), col("n_vecs"),
          expr("(n_vecs * 10000) DIV n_total").as("share_bp"),
          expr("(n_vecs * 16 * 10000) DIV n_total").as("balance_bp"))
        .orderBy("cell")
    }),

    // INDEX REBALANCE PLAN — the maintenance-action list an IVF operator
    // derives from q209's census: a cell holding over 1.5× its fair
    // share is SPLIT (hot cells dominate probe latency — splitting puts
    // a centroid where the data is), a cell under half its share is
    // MERGED away (probes that read it waste a seek per query), the
    // rest KEEP. cells_after (split→2, merge→0, keep→1) sums to the
    // capacity the next q88 re-training round is sized for. Thresholds
    // are integer bp on the SAME balance_bp q209 publishes, so the plan
    // can never disagree with the census it claims to act on.
    // The organic index is too healthy to exercise the plan (measured
    // balance 6400-13440 bp at sf0.01 — all keep), so the fixture
    // PLANTS the production failure mode: a duplicate cohort one corpus
    // in size, all landing in vector 0's cell (a crawler re-ingesting a
    // mirrored site). The hot cell must come out split, the halved
    // organic shares push the thin cells under the merge line, and the
    // mid cells keep — all three actions exercised at every scale.
    // Scale: identical cost shape to q209 — one map-only assignment
    // pass, one K-group aggregate, a one-row broadcast total; the plan
    // itself is control-plane-sized (K rows).
    "q237_ivf_rebalance_plan" -> ((s, d) => {
      val n = normed(s, d)
      val v0 = n.filter(col("vec_id") === 0)
        .select(col("embedding").as("e0"), col("nrm").as("n0"))
      val hot = n.crossJoin(broadcast(v0))
        .select((col("vec_id") + 1000000L).as("vec_id"),
          col("e0").as("embedding"), col("n0").as("nrm"))
      val corpus = n.unionByName(hot)
      val cent = seedCentroids(n) // centroids stay the ORGANIC seeds
      val cells = cellAssign(corpus, cent)
        .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
      val tot = cells.agg(sum(col("n_vecs")).as("n_total"))
      cells.crossJoin(broadcast(tot))
        .withColumn("balance_bp", expr("(n_vecs * 16 * 10000) DIV n_total"))
        .withColumn("action",
          when(col("balance_bp") > 15000, "split")
            .when(col("balance_bp") < 5000, "merge")
            .otherwise("keep"))
        .withColumn("cells_after",
          when(col("action") === "split", 2L)
            .when(col("action") === "merge", 0L).otherwise(1L))
        .select("cell", "n_vecs", "balance_bp", "action", "cells_after")
        .orderBy("cell")
    }),

    "q88_kmeans_refine" -> ((s, d) => {
      val n = normed(s, d)
      def assign(cent: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
        n.crossJoin(broadcast(cent))
          .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"),
            (VectorOps.dotSeq(col("embedding"), col("ce")) / (col("nrm") * col("cn"))).as("ccos"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("vec_id"), col("nrm"), col("cid").as("cluster"))
      }
      val cent0 = n.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
      val a1 = assign(cent0)
      val dims = a1.join(n.select("vec_id", "embedding"), "vec_id")
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
      val cent1 = dims
        .groupBy("cluster", "dim").agg(davg(col("v").cast("double"), 8).as("m"))
        .groupBy("cluster")
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), x -> x.m)").as("ce"))
        .select(col("cluster").as("cid"), col("ce"),
          VectorOps.norm(col("ce")).as("cn"))
      assign(cent1)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"), davg(col("nrm"), 6).as("avg_nrm"))
        .orderBy("cluster")
    }),

    // SCALAR-QUANTIZATION recall sweep — the storage rung between q213's
    // Matryoshka truncation (fewer dims) and q122's PQ (codebooks):
    // keep every dim, shrink every value to b bits. For b ∈ {2,4,6,8},
    // base vectors quantize per-dim to round-half-up integers in
    // [−(2^(b−1)−1), 2^(b−1)−1] (floor(x·s + 0.5) — floor is the
    // rounding-mode-free cross-engine rounding, the q228/q122 trick)
    // and dequantize to q/s; queries stay fp32 — the asymmetric-distance
    // deployment shape. Recall@5 of each rung against the fp truth in
    // one pass: every (query, base) pair scores all four rungs plus
    // truth from ONE broadcast cross join (the q189/q213 one-pass-
    // prices-the-curve discipline).
    // Scale: the q50 bounded-cohort contract — the demo query set is
    // 10 vectors, so the cross join is |base|×10 with a broadcast
    // small side; production swaps the scorer for the q51/q194 IVF
    // route, the eval harness is unchanged.
    "q256_sq_recall" -> ((s, d) => {
      val bits = Seq(2, 4, 6, 8)
      def scale(b: Int): Int = (1 << (b - 1)) - 1
      val pre = bits.foldLeft(Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            VectorOps.norm(col("embedding")).as("nf"))) { (acc, b) =>
        val s0 = scale(b)
        acc.withColumn(s"r$b", expr(
            s"transform(embedding, x -> floor(CAST(x AS DOUBLE) * $s0 + 0.5) / $s0)"))
          .withColumn(s"n$b", VectorOps.norm(col(s"r$b")))
      }
      val q = pre.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nf").as("qn"))
      val scored = pre.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          explode(array(
            struct(lit(0).as("b"),
              (VectorOps.dotSeq(col("qe"), col("embedding")) /
                (col("qn") * col("nf"))).as("cos")) +:
            bits.map(b => struct(lit(b).as("b"),
              // a vector can quantize to all-zero at low bit widths
              // (|x| < 1/2s) — a pinned -2 sorts below every real
              // cosine on BOTH engines instead of NaN-vs-NULL drift
              when(col(s"n$b") === 0.0, lit(-2.0))
                .otherwise(VectorOps.dotSeq(col("qe"), col(s"r$b")) /
                  (col("qn") * col(s"n$b"))).as("cos"))): _*)).as("bc"))
        .select(col("qid"), col("vec_id"), col("bc.b").as("b"),
          col("bc.cos").as("cos"))
      val rw = Window.partitionBy("qid", "b")
        .orderBy(col("cos").desc, col("vec_id"))
      val top = scored.withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 5)
      val truth = top.filter(col("b") === 0).select(col("qid"), col("vec_id"))
      val truthN = truth.agg(count(lit(1)).as("n_truth"))
      val hits = top.filter(col("b") =!= 0).join(truth, Seq("qid", "vec_id"))
        .groupBy("b").agg(count(lit(1)).as("n_hits"))
      pre.sparkSession.range(1)
        .select(explode(array(bits.map(lit(_)): _*)).as("b"))
        .join(hits, Seq("b"), "left")
        .crossJoin(broadcast(truthN))
        .select(col("b").as("bits"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          expr("(coalesce(n_hits, 0) * 10000) DIV n_truth").as("recall_bp"))
        .orderBy("bits")
    }),

    // Greedy k-CENTER coreset (Gonzalez 2-approximation) — DIVERSITY
    // selection, the complement of dedup: dedup removes what is too
    // close, this SELECTS the k docs that best spread over embedding
    // space (coreset seeding, eval-set construction, diverse few-shot
    // pools). Seed = min vec_id; each of the k−1 following rounds picks
    // the point FARTHEST (max-min cosine distance, ties to min vec_id)
    // from everything selected so far. Output: (rank, vec_id,
    // maximin_dist) — rank r's distance is non-increasing in r and IS
    // the coverage radius the (r−1)-center solution achieves, so the
    // curve doubles as the "how many centers do I need" diagnostic.
    // Determinism: distances ride the sequential-fold [[VectorOps]]
    // kernels (bit-identical cross-engine), so raw-double argmax ties
    // break identically; the seed row reports NULL (no prior set).
    // Scale: the textbook distributed k-center — k passes, each a
    // map-only min-against-≤k-broadcast-centers + one 1-row argmax
    // (TakeOrdered, no global sort). The per-round 1-row collect is
    // control-plane (the q183 exception); production caps k at
    // coreset sizes (10²–10³) and runs over a pre-sketched corpus.
    "q284_kcenter_coreset" -> ((s, d) => {
      val k = 8
      val n = normed(s, d)
      var selected = Vector(0L)
      var picked = Vector[(Int, Long, Option[Double])]((1, 0L, None))
      for (r <- 2 to k) {
        val sel = broadcast(n.filter(col("vec_id").isInCollection(selected))
          .select(col("vec_id").as("sid"), col("embedding").as("se"),
            col("nrm").as("sn")))
        val Array(row) = n.filter(!col("vec_id").isInCollection(selected))
          .crossJoin(sel)
          .select(col("vec_id"),
            (lit(1.0) - VectorOps.dotSeq(col("embedding"), col("se"))
              / (col("nrm") * col("sn"))).as("dist"))
          .groupBy("vec_id").agg(min(col("dist")).as("mind"))
          .orderBy(col("mind").desc, col("vec_id")).limit(1)
          .collect()
        selected :+= row.getLong(0)
        picked :+= ((r, row.getLong(0), Some(row.getDouble(1))))
      }
      import s.implicits._
      picked.toDF("rank", "vec_id", "maximin_dist")
        .select(col("rank"), col("vec_id"),
          col("maximin_dist").cast("double").as("maximin_dist"))
        .orderBy("rank")
    }),

    // FILTERED vector search — the production ANN question q51/q207
    // don't answer: top-k under a metadata predicate (label = the
    // query's own label here; "same tenant / same language / same
    // license" in a real corpus). Two routes, graded against each
    // other per query:
    //   truth  = PRE-filter: exact cosine top-5 over the label subset
    //            (the small-selectivity plan — filter first, brute
    //            force the survivors);
    //   system = POST-filter: q51's IVF probe route, label predicate
    //            applied AFTER candidate generation (the big-
    //            selectivity plan — the index knows nothing of the
    //            filter).
    // The output row is the tuning table: n_label (subset size),
    // n_cand (how many label-matching candidates the 4 probed cells
    // even contain), and recall_bp — post-filtering loses recall
    // exactly when a selective filter leaves too few matching
    // vectors inside the probed cells, which is why real systems
    // pick pre- vs post-filter by estimated selectivity. Integer
    // recall in bp over n_truth = least(5, n_label); ties broken by
    // vec_id everywhere; cosine folds ride the shared [[VectorOps]]
    // kernels so truth and system rank identically cross-engine.
    // Scale: the label table joins the assignment co-keyed on vec_id
    // (in production the label is CARRIED in the index rows — the
    // q128 layout); the truth side hash-joins queries×corpus on the
    // label key (10 broadcast queries, corpus streams map-only); no
    // all-pairs path, windows bounded per qid.
    "q287_filtered_ann" -> ((s, d) => {
      val lab = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val n = normed(s, d)
      val cent = seedCentroids(n)
      val assign = cellAssign(n, cent).join(lab, "vec_id")
      val (ql, _, nlab, truth) = labelTruth(s, d)
      // system: GLOBAL IVF probes, label filter applied post-candidate
      val cs = probedCells(n, cent, 4).drop("prn")
        .join(assign, "cell")
        .filter(col("vec_id") =!= col("qid"))
        .join(ql.select(col("qid"), col("qlabel")), "qid")
        .filter(col("label") === col("qlabel"))
        .select(col("qid"), col("vec_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm")))
            .as("cos_sim"))
      filteredAnnReport(ql, nlab, truth, cs)
    }),

    // LABEL-PARTITIONED IVF — the production FIX for the recall loss
    // q287 prices: instead of filtering candidates after probing a
    // label-blind global index, the index itself is partitioned by the
    // filter key (per-label centroids, per-label cells — the "one
    // index per tenant/language/license" layout). The whole probe
    // budget is then spent INSIDE the filtered subset: 4 probed cells
    // out of each label's 8 cover half the subset by construction,
    // where q287's 4-of-16 global probes cover whatever fraction of
    // the subset happens to collide with them. Candidates are
    // label-pure with no post-check (cells belong to exactly one
    // label). Same output schema and the SAME truth stream as q287
    // ([[labelTruth]] — one definition, so the two routes' recall
    // columns compare line by line; the spec pins the improvement).
    // Scale: centroid table is labels×8 rows broadcast both for
    // assignment and probing; assignment joins label-keyed (never a
    // corpus×all-centroids cross); per-query work is 4 label-local
    // cells. The layout answer to a low-cardinality filter — for
    // high-cardinality predicates the pre-filter brute-force route
    // (q287's truth side) takes over below the selectivity cliff.
    "q290_label_partitioned_ivf" -> ((s, d) => {
      val lab = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val nl = normed(s, d).join(lab, "vec_id")
      val (ql, q, nlab, truth) = labelTruth(s, d)
      // per-label centroids: the 8 smallest vec_ids within each label
      val cw = Window.partitionBy("label").orderBy("vec_id")
      val cent = nl.withColumn("crn", row_number().over(cw))
        .filter(col("crn") <= 8)
        .select(col("label").as("clabel"), col("vec_id").as("cent_id"),
          col("embedding").as("ce"), col("nrm").as("cn"))
      // assignment: label-keyed join against the broadcast centroid
      // table — every vector lands in a cell of its OWN label
      val aw = Window.partitionBy("vec_id")
        .orderBy(col("ccos").desc, col("cent_id"))
      val assign = nl.join(broadcast(cent), col("label") === col("clabel"))
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
          (VectorOps.dotSeq(col("embedding"), col("ce")) / (col("nrm") * col("cn")))
            .as("ccos"))
        .withColumn("arn", row_number().over(aw)).filter(col("arn") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("cent_id").as("cell"))
      // probes: the 4 nearest same-label centroids per query
      val pw = Window.partitionBy("qid")
        .orderBy(col("pcos").desc, col("cent_id"))
      val probes = q.join(broadcast(cent), col("qlabel") === col("clabel"))
        .select(col("qid"), col("qe"), col("qn"), col("cent_id"),
          (VectorOps.dotSeq(col("qe"), col("ce")) / (col("qn") * col("cn")))
            .as("pcos"))
        .withColumn("prn", row_number().over(pw)).filter(col("prn") <= 4)
        .select(col("qid"), col("qe"), col("qn"), col("cent_id").as("cell"))
      // candidates: label-pure by construction — no post-filter
      val cs = probes.join(assign, "cell")
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm")))
            .as("cos_sim"))
      filteredAnnReport(ql, nlab, truth, cs)
    }),

    // SEMANTIC PACK ORDER — in-context-pretraining-style corpus
    // ordering (Shi et al. '23): feed the dataloader documents in an
    // order where ADJACENT docs are topically related, so a packed
    // context window (q188) holds coherent text instead of random
    // shards. The order: group by IVF cell (the q51 index — seam
    // reuse), inside each cell march from the centroid outward
    // (cent_cos desc, vec_id tiebreak), cells concatenated in cell-id
    // order. Scale: position is NEVER a global sort — per-cell
    // windows (the cell is the shard) plus a 16-row broadcast prefix
    // sum of cell sizes gives seq_pos = cell_offset + pos_in_cell,
    // the q188/q289 two-level placement trick applied to ordering.
    // q293 prices the coherence this buys.
    "q292_semantic_pack_order" -> ((s, d) => semPackOrder(s, d)),

    // PACK COHERENCE EVAL — what q292's ordering actually buys: the
    // mean cosine between ADJACENT documents (the pairs that share a
    // context window after packing) under the semantic order vs the
    // naive doc-id order. Two rows, directly comparable; the semantic
    // row must win (spec-pinned). The doc-id baseline exploits dense
    // ids: adjacency is a key-shift join (vec_id ↔ vec_id + 1), no
    // ordering state at all; the semantic side joins seq_pos ↔
    // seq_pos + 1, co-keyed. Means are decimal-exact ([[graft.ops
    // .davg]]) over per-pair cosines rounded to 6dp, so the two
    // engines agree bit-for-bit regardless of accumulation order.
    "q293_pack_coherence" -> ((s, d) => {
      val n = normed(s, d)
      def adjMean(pairs: DataFrame, name: String): DataFrame =
        pairs
          .join(n.select(col("vec_id").as("ida"),
            col("embedding").as("ea"), col("nrm").as("na")), "ida")
          .join(n.select(col("vec_id").as("idb"),
            col("embedding").as("eb"), col("nrm").as("nb")), "idb")
          .select(round(
            VectorOps.dotSeq(col("ea"), col("eb")) / (col("na") * col("nb")),
            6).as("cos"))
          .agg(count(lit(1)).as("n_pairs"), davg(col("cos"), 6).as("mean_adj_cos"))
          .select(lit(name).as("ordering"), col("n_pairs"), col("mean_adj_cos"))
      val ord = semPackOrder(s, d).select("seq_pos", "doc_id")
      val sem = adjMean(
        ord.select(col("seq_pos"), col("doc_id").as("ida"))
          .join(ord.select((col("seq_pos") - 1).as("seq_pos"),
            col("doc_id").as("idb")), "seq_pos")
          .select("ida", "idb"),
        "semantic")
      val naive = adjMean(
        n.select(col("vec_id").as("ida"), (col("vec_id") + 1).as("idb"))
          .join(n.select(col("vec_id").as("idb")), "idb")
          .select("ida", "idb"),
        "doc_id")
      sem.unionByName(naive).orderBy("ordering")
    }),

    // HARD-NEGATIVE MINING — the contrastive-training data op: for each
    // labeled query, the most-similar vectors of a DIFFERENT label
    // (high cosine + wrong label = exactly the pairs a contrastive loss
    // learns the most from), with a near-dup ceiling (cos ≥ 0.98 means
    // the "negative" is probably a mislabeled duplicate — a false
    // negative that POISONS training, so it is excluded, the standard
    // mining hygiene). Top-5 per query by (cos desc, vec_id). Scale:
    // the 10-query table broadcasts; the corpus streams through one
    // map-only score pass (label inequality rides the broadcast
    // nested-loop's residual — never a corpus×corpus pair surface);
    // per-query top-5 is a bounded window. A production miner routes
    // candidates through the IVF cells (q51/q290) instead of streaming
    // the corpus; the brute pass IS the recall-1.0 reference the index
    // variants grade against, exactly the q287 truth discipline.
    // The corpus is embeddings ∪ PLANTED MISLABELED DUPLICATES (an exact
    // copy of every query vector under a different label, vec_id + 1M —
    // the q44-family planted-copy discipline): cos(query, its copy) ≈ 1.0
    // with an unequal label, so each plant is precisely the false
    // negative the ceiling exists to exclude — the production plan drops
    // all ten, and the q300_neardup_ceiling_dropped red-case proves the
    // harness notices when a build stops dropping them.
    "q300_hard_negatives" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val planted = base.filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          (col("label") + 1).as("label"), col("embedding"))
      val nl = base.unionByName(planted)
        .withColumn("nrm", VectorOps.norm(col("embedding")))
      val q = nl.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qe"), col("nrm").as("qn"))
      // mutation seam (knob OFF in every production plan): no ceiling —
      // the planted duplicates poison every query's top-5
      val ceiling =
        if (graft.Mutations.on("q300_neardup_ceiling_dropped"))
          lit(Double.MaxValue)
        else lit(0.98)
      val scored = nl.join(broadcast(q), col("label") =!= col("qlabel"))
        .select(col("qid"), col("vec_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm")))
            .as("cos_sim"))
        .filter(col("cos_sim") < ceiling)
      val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos_sim")
        .orderBy("qid", "rank")
    }),

    // MARGIN-BASED BITEXT MINING (Artetxe & Schwenk '19 ratio margin) —
    // the parallel-pair miner of multilingual pipelines: raw cosine
    // over-selects hubs (vectors close to EVERYTHING), so each pair is
    // scored by its cosine RELATIVE to both endpoints' neighborhoods —
    // margin = 2·cos(x,y) / (μ₄(x) + μ₄(y)), μ₄ the mean of the
    // endpoint's top-4 candidate cosines — and a pair is mined only if
    // each side is the other's best margin (mutual top-1). "Languages"
    // here are the even/odd vec_id halves (the fixture carries no
    // bilingual split; the operator is the real one). Scale: total
    // seam reuse — candidates come from [[signLshCosineCandidates]]
    // (banded, capped, never all-pairs), neighborhoods are per-endpoint
    // top-4 over CANDIDATES (exactly how production miners take μ over
    // the FAISS top-k, not the corpus); the fold over the top-4 runs on
    // a sorted array (deterministic sequential sum, the q215
    // discipline), so the double margin is bit-equal cross-engine.
    "q301_margin_bitext" -> ((s, d) => {
      val cand = DedupQueries.signLshCosineCandidates(Tables.embeddings(s, d))
        .filter(!isnan(col("cos_sim")) &&
          pmod(col("id1") + col("id2"), lit(2)) === 1)
      val sym = cand.select(col("id1").as("src"), col("id2").as("dst"), col("cos_sim"))
        .unionByName(
          cand.select(col("id2").as("src"), col("id1").as("dst"), col("cos_sim")))
      // negated-cos struct sort = (cos desc, dst asc) without a
      // comparator lambda; slice+aggregate = ordered sequential mean
      val nb = sym.groupBy("src")
        .agg(collect_list(struct((-col("cos_sim")).as("nc"),
          col("dst").as("dst"))).as("ns"))
        .select(col("src"), expr("slice(array_sort(ns), 1, 4)").as("top"))
        .select(col("src"),
          expr("aggregate(top, CAST(0.0 AS DOUBLE), (acc, x) -> acc - x.nc)" +
            " / size(top)").as("mtop"))
      val scored = cand
        .join(nb.select(col("src").as("id1"), col("mtop").as("m1")), "id1")
        .join(nb.select(col("src").as("id2"), col("mtop").as("m2")), "id2")
        .select(
          when(pmod(col("id1"), lit(2)) === 0, col("id1")).otherwise(col("id2"))
            .as("x_id"),
          when(pmod(col("id1"), lit(2)) === 0, col("id2")).otherwise(col("id1"))
            .as("y_id"),
          (col("cos_sim") * 2 / (col("m1") + col("m2"))).as("margin"))
      val xw = Window.partitionBy("x_id").orderBy(col("margin").desc, col("y_id"))
      val yw = Window.partitionBy("y_id").orderBy(col("margin").desc, col("x_id"))
      // mutation seam (knob OFF in every production plan): one-sided
      // best accepted — hub pairs flood the mined set
      val mined =
        if (graft.Mutations.on("q301_mutual_top1_broken"))
          col("xr") === 1 || col("yr") === 1
        else col("xr") === 1 && col("yr") === 1
      scored.withColumn("xr", row_number().over(xw))
        .withColumn("yr", row_number().over(yw))
        .filter(mined)
        .select(col("x_id"), col("y_id"), round(col("margin"), 6).as("margin"))
        .orderBy("x_id")
    }),

    // CLUSTER-BALANCED SAMPLING — density-equalizing downsampling: per
    // IVF cell, keep the ⌊√size⌋ smallest seeded-md5 draws, so dense
    // regions (many near-duplicate embeddings) are downweighted and
    // sparse regions survive — the √-temperature between uniform
    // sampling (which replicates density skew) and per-cell-constant
    // quotas (which over-samples noise cells). Deterministic end to
    // end: the draw is the shared [[SamplingPipeline.drawExpr]] md5
    // integer, √ via floor(sqrt(double)) — exact for any count below
    // 2^52, same bits in both engines. Scale: cell assignment is the
    // one broadcast map-only pass every IVF consumer pays; then ONE
    // cell-keyed exchange carries both windows (size + rank share the
    // partition key); quotas never collect to the driver.
    // GRAPH-BASED ANN (two-layer NSW = HNSW's hierarchy at depth 2) —
    // the one production index family the suite's IVF/PQ/SQ/Matryoshka
    // variants don't cover (r13 verdict stretch 9). Each layer's k-NN
    // GRAPH is built the scalable way (NN-descent, Dong et al. WWW'11):
    // every vector seeds [[NswM]] deterministic md5-drawn random
    // neighbors (layer 0 also unions the banded sign-LSH candidates —
    // free real-data quality), then [[NswDescentRounds]] refinement
    // rounds replace each node's list with the top-[[NswM]] of
    // {current ∪ reversed ∪ neighbors-of-neighbors} by exact cosine —
    // O(n·M²) per round, never an all-pairs surface (the third round
    // bought the last recall tier: 88% → 90% mean, 60% → 80% MIN —
    // the graph-quality floor the walk could not route around). Search is greedy
    // BEAM walking in the q144/q235 fixed-round discipline: each round
    // expands the current per-query beam's out-edges, scores exact
    // cosine, and keeps the [[NswBeam]] best (cos desc, vec_id) seen so
    // far — monotone, deterministic, tie-broken identically in both
    // engines. HIERARCHY (r14 verdict item 2 — flat entry gave 74%
    // mean recall@5): LAYER 1 is the deterministic 1/[[NswLayerStride]]
    // subsample (HNSW's upper level: size n/stride, its own NN-descent
    // graph) walked [[NswL1Rounds]] rounds from 16 fixed layer-1
    // entries; the layer-1 beam — already query-adaptive — IS the
    // layer-0 entry set (the scores carry over unchanged: layer-1
    // nodes are corpus vectors), then [[NswRounds]] layer-0 rounds
    // refine. Graded: each query's top-5 walk result with per-hit
    // truth membership and recall@5 bp against q50's brute-force
    // truth — the recall a production HNSW tunes M/beam/rounds
    // against (sf0.01: mean 90%, min 80%).
    // Scale: every build round is bounded fan-out (M² per node, the
    // layer-1 build over n/32 nodes); each search round is one bounded
    // probe join (|queries|·beam·M candidate rows) against the corpus —
    // a 100 TB deployment serves the walk from an index store, and this
    // plan IS that access pattern: beam-sized lookups, never a
    // corpus×corpus surface. Rounds are lineage-pinned (GraphOps.pin).
    "q308_nsw_graph_ann" -> ((s, d) => {
      val e = nswEngine(s, d)
      // graph + entry beam come from the session memo (r15 verdict
      // item 2): built once, served to q308 AND q332
      val beam = e.walk(e.sharedLayeredBeam,
        e.sharedLayer0Edges.select("src", "dst"), NswRounds)
      e.grade(beam.df)
        .select(col("qid"), col("rank"), col("vec_id"), col("cos_sim"),
          col("in_truth"), col("recall_bp"))
        .orderBy("qid", "rank")
    }),

    // ENTRY-STRATEGY ABLATION for the graph-ANN walk — the measured WHY
    // of q308's hierarchy (r14 verdict item 2): the SAME layer-0 graph
    // walked the same [[NswRounds]] rounds from (a) the r14-style flat
    // entry (the 16 fixed seed vectors, query-blind) vs (b) the layer-1
    // beam (query-adaptive). Per (strategy, qid): recall@5 bp vs q50's
    // brute truth, plus the per-strategy mean — the table a deployment
    // reads before paying for an upper layer. Rides [[NswEngine]]'s ONE
    // machinery (graph built once, walked twice), so the two arms can
    // never drift from the graded q308 plan; the q308 reverse-edges
    // knob red-cases this member too (shared descent seam).
    "q332_ann_entry_ablation" -> ((s, d) => {
      val e = nswEngine(s, d)
      val edges0 = e.sharedLayer0Edges
      // r18 (guide §2.4, verdict item 6): the two arms walk the SAME
      // pinned graph with independent per-(strategy, qid) beams, so they
      // are batched into ONE walk pass keyed by arm — one probe join /
      // beam aggregate / pinned round per hop instead of two sequential
      // walk chains. Per (strategy, qid) the recurrence is unchanged
      // (every walk operator keys on the full prefix), so the graded
      // rows are identical to the two-walk formulation.
      val b0 = e.sharedLayeredBeam.withColumn("strategy", lit("b_layered"))
        .unionByName(e.flatEntryBeam.withColumn("strategy", lit("a_flat16")))
      val keys = Seq("strategy", "qid")
      val beam = e.walk(b0, edges0.select("src", "dst"), NswRounds, keys)
      val arms = e.grade(beam.df, keys)
        .groupBy(col("strategy"), col("qid"))
        .agg(sum(col("in_truth")).as("n_hits"))
        .select(col("strategy"), col("qid"),
          col("n_hits"), (col("n_hits") * 2000).cast("long").as("recall_bp"))
      // the layered-beam/edges0 pins belong to the session memo
      // ([[nswCache]]) — alive for every later q308/q332 read
      arms
        .withColumn("strategy_mean_bp",
          expr("CAST(sum(recall_bp) OVER (PARTITION BY strategy) " +
            "DIV count(*) OVER (PARTITION BY strategy) AS BIGINT)"))
        .orderBy("strategy", "qid")
    }),

    // STREAMING ANN INGEST — the index-maintenance half the batch IVF
    // family (q51 build, q128 incremental, q237 rebalance plan) leaves
    // to a scheduled job: route ARRIVING vectors to their nearest seed
    // centroid AT INGEST and keep the per-cell census (count, id sum,
    // min id) in the state store — the signal a deployment watches to
    // trigger q237's rebalance. The centroid table is a BATCH static
    // (the q333 discipline) collected once — 16 rows, a control-plane
    // pick like the BPE merge table — and burned into a map-side
    // argmax: per row, 16 codegen'd dot products against literal
    // centroid arrays, array_max over (ccos, -cent_id) structs (ties to
    // the SMALLER cell id, exactly cellAssign's window order). No
    // per-vector window, no stream self-join; the ONE stateful operator
    // is the |cells|-keyed census. Rides the q51 seedCentroids seam, so
    // the fencepost knob red-cases this member too. Oracle recomputes
    // the assignment relationally (q303's CTE chain) — streamed ingest
    // over the finite source must equal the batch census row for row.
    "q343_stream_ann_ingest" -> ((s, d) => {
      val cents = seedCentroids(normed(s, d))
        .select("cent_id", "ce", "cn").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
        .sortBy(_._1)
      val nrm = VectorOps.norm(col("embedding"))
      val scored = cents.map { case (id, ce, cn) =>
        struct(
          (VectorOps.dotSeq(col("embedding"), typedlit(ce)) / (nrm * lit(cn)))
            .as("ccos"),
          lit(-id).as("nid"))
      }
      val best = array_max(array(scored.toIndexedSeq: _*))
      val agg = graft.streaming.StreamingPipelines.embeddingsStream(s, d)
        .select(col("vec_id"), (-best.getField("nid")).as("cell"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("id_sum"),
          min(col("vec_id")).as("id_min"))
      graft.streaming.StreamingPipelines.runToCompletion(s, agg)
        .orderBy("cell")
    }),

    "q303_cluster_balanced_sample" -> ((s, d) => {
      val n = normed(s, d)
      val assign = cellAssign(n, seedCentroids(n)).select(col("vec_id"), col("cell"))
      val cw = Window.partitionBy("cell")
      val rw = Window.partitionBy("cell").orderBy(col("draw"), col("vec_id"))
      assign
        .withColumn("draw", expr(SamplingPipeline.drawExpr("vec_id", "cbs")))
        .withColumn("cell_size", count(lit(1)).over(cw))
        .withColumn("pos", row_number().over(rw))
        .withColumn("quota",
          // mutation seam (knob OFF in every production plan): ⌈√n⌉ for
          // ⌊√n⌋ — every non-perfect-square cell admits one extra row
          if (graft.Mutations.on("q303_quota_ceil"))
            expr("CAST(ceil(sqrt(CAST(cell_size AS DOUBLE))) AS BIGINT)")
          else
            expr("CAST(floor(sqrt(CAST(cell_size AS DOUBLE))) AS BIGINT)"))
        .filter(col("pos") <= col("quota"))
        .select(col("cell"), col("pos"), col("vec_id"), col("cell_size"),
          col("quota"))
        .orderBy("cell", "pos")
    }),

    // BINARY-QUANTIZATION ANN (1-bit sign codes + Hamming prefilter +
    // exact rerank) — the quantization family the suite's PQ (q122) /
    // SQ (q256) / Matryoshka (q213) variants don't cover, and the one
    // production serves hottest: each 64-float vector compresses to
    // TWO BIGINT sign words (32× smaller), candidate generation is a
    // popcount scan (bit_count over XOR — the SIMD shape), and only
    // the [[HamCandidates]] best-Hamming candidates per query ever
    // touch full vectors for the exact-cosine rerank. Graded like
    // q308: per-hit truth membership + recall@5 bp against q50's
    // brute truth — measured here at ~64% recall from scanning 6.4%
    // of the corpus with 3% of the bytes, the trade a deployment
    // tunes the candidate count against.
    // Scale: code building is one map-only pass (two in-row bit
    // folds); the Hamming scan broadcasts 10 query code-pairs and
    // exchanges ONLY (qid, vec_id, hamming) skinny rows — the
    // rank≤candidates filter plants a WindowGroupLimit, so each map
    // task ships a candidate-sized prefix; full vectors are fetched
    // by a candidate-bounded join afterwards, never shuffled with the
    // scan. At 100 TB the code column is the index artifact: 1/32 of
    // the corpus bytes, scanned without touching embeddings at all.
    "q314_binary_hamming_ann" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): rerank
      // dropped — the top-5 ranked by Hamming alone, the "quantized
      // scores are enough" fallacy; membership and order both shift
      val rerank = !graft.Mutations.on("q314_rerank_dropped")
      val n = normed(s, d)
      def bitCode(lo: Int, hi: Int) = expr(
        s"""aggregate(sequence($lo, $hi), CAST(0 AS BIGINT),
            (a, j) -> a + IF(element_at(embedding, j) > CAST(0 AS FLOAT),
              shiftleft(CAST(1 AS BIGINT), j - $lo), CAST(0 AS BIGINT)))""")
      val codes = n.select(col("vec_id"),
        bitCode(1, 32).as("c1"), bitCode(33, 64).as("c2"))
      val qCodes = codes.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("c1").as("qc1"),
          col("c2").as("qc2"))
      val qVecs = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"))
      val hw = Window.partitionBy("qid").orderBy(col("hamming"), col("vec_id"))
      val cand = codes.crossJoin(broadcast(qCodes))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("hamming", expr(
          "CAST(bit_count(c1 ^ qc1) + bit_count(c2 ^ qc2) AS BIGINT)"))
        .withColumn("hrn", row_number().over(hw))
        .filter(col("hrn") <= HamCandidates)
        .select("qid", "vec_id", "hamming")
      val scored = cand.join(n, "vec_id").join(broadcast(qVecs), "qid")
        .select(col("qid"), col("vec_id"), col("hamming"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) /
            (col("qn") * col("nrm"))).as("cos"))
      val ow =
        if (rerank) Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("vec_id"))
        else Window.partitionBy("qid")
          .orderBy(col("hamming"), col("vec_id"))
      val truth = bruteTopK(s, d, 5)
        .select(col("qid"), col("vec_id"), lit(1L).as("in_truth"))
      scored.withColumn("rank", row_number().over(ow))
        .filter(col("rank") <= 5)
        .join(truth, Seq("qid", "vec_id"), "left")
        .withColumn("in_truth", coalesce(col("in_truth"), lit(0L)))
        .withColumn("recall_bp",
          (sum(col("in_truth")).over(Window.partitionBy("qid")) * 2000L)
            .cast("long"))
        .select(col("qid"), col("rank"), col("vec_id"), col("hamming"),
          round(col("cos"), 6).as("cos_sim"), col("in_truth"),
          col("recall_bp"))
        .orderBy("qid", "rank")
    }),

    // RESIDUAL (two-level) QUANTIZATION ANN — the fifth quantization
    // family next to PQ (q122), SQ (q256), Matryoshka (q213) and binary
    // (q314): a coarse full-vector codebook approximates each vector,
    // a SECOND codebook trained on the residuals refines it, and
    // queries score candidates against the 16×16 reconstruction table
    // (c1 + c2) — the RQ/IVF-ADC shape production stores use when one
    // codebook is too coarse and PQ's subspace independence is too
    // lossy. Both levels are graded side by side as arms ('rq1' ranks
    // by the level-1 reconstruction alone, 'rq2' by the two-level sum):
    // the per-arm QUANTIZATION-ERROR census carries the refinement
    // guarantee (err_rq2 ≤ err_rq1 per vector, structural via the zero
    // code — spec pins the strict corpus-level drop), and per-hit
    // recall vs the q314-style brute cosine truth reports how each arm
    // ranks on this near-random fixture (where modest error gains move
    // recall noisily — exactly why the error census, not recall, is
    // the graded refinement claim).
    // Bit-exactness by construction: vectors land on an integer grid
    // FIRST (unit-normalized components × 4096, floored — the int8-ish
    // pre-quantization production RQ runs on), so every codebook
    // distance, residual, reconstruction and ADC score downstream is
    // exact BIGINT arithmetic — no cross-engine float anywhere past
    // the one floor(x/nrm·4096).
    // Scale: encode passes are map-only against broadcast 16-row
    // codebooks; the reconstruction table is 256 control-plane rows;
    // the ADC join carries a 2-byte-per-vector codes table against a
    // broadcast 2560-row LUT — raw vectors are never touched at search
    // time (the q122 memory story, compounded by the second level).
    "q324_residual_quantize" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): the residual
      // computed as c1 − v instead of v − c1 — the classic RQ sign slip:
      // the level-2 codebook trains on mirrored residuals and every
      // two-level reconstruction degrades
      val residExpr =
        if (graft.Mutations.on("q324_residual_sign_flipped"))
          "zip_with(c1v, iv, (a, b) -> a - b)"
        else "zip_with(iv, c1v, (a, b) -> a - b)"
      def il2(a: String, b: String) =
        s"""aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)),
            CAST(0 AS BIGINT), (acc, v) -> acc + v)"""
      val n = normed(s, d)
      // r18 (guide §2.2/§4): the two encode passes below are zip_with/
      // aggregate lambda loops (not whole-stage-codegen) over 17
      // codebook candidates x 64 dims per vector — CPU-heavy on tiny
      // bytes, so AQE's byte-based coalescing ran them as SINGLE-task
      // stages (4 x ~0.5s serialized). An explicit vec_id repartition
      // sized by defaultParallelism parallelizes the encode AND is the
      // one exchange the argmin windows (partitionBy vec_id) needed
      // anyway — exchange count is unchanged at any scale, the shuffle
      // just moves BELOW the heavy compute. Measured 2.6s -> see
      // OPTIMIZATION_r18.md; arithmetic untouched.
      val g = n.select(col("vec_id"), expr(
        """transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) / nrm * 4096) AS BIGINT))""")
        .as("iv"))
        .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      // codebooks train on ranges DISJOINT from the query ids: a seed
      // book containing the queries themselves degenerates the ADC (a
      // query that IS a centroid puts every same-cell zero-code
      // candidate at distance exactly 0)
      val c1 = g.filter(col("vec_id") >= 100 && col("vec_id") < 116)
        .select(col("vec_id").as("k1"), col("iv").as("c1v"))
      val w1 = Window.partitionBy("vec_id").orderBy(col("d1"), col("k1"))
      val a1 = g.crossJoin(broadcast(c1))
        .withColumn("d1", expr(il2("iv", "c1v")))
        .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
        .select(col("vec_id"), col("iv"), col("k1").as("code1"), col("c1v"),
          col("d1"))
      val resid = a1.withColumn("rv", expr(residExpr))
        .select("vec_id", "code1", "d1", "rv")
      // the ZERO code (k2 = −1) is load-bearing: with it in the book,
      // argmin over level 2 can always "stay at c1", so per-vector
      // two-level error is ≤ level-1 error STRUCTURALLY — the escape
      // hatch production RQ books carry for vectors the residual book
      // cannot improve
      val c2 = resid.filter(col("vec_id") >= 116 && col("vec_id") < 132)
        .select(col("vec_id").as("k2"), col("rv").as("c2v"))
        .unionByName(c1.limit(1).select(lit(-1L).as("k2"),
          expr("transform(c1v, x -> CAST(0 AS BIGINT))").as("c2v")))
      val w2 = Window.partitionBy("vec_id").orderBy(col("d2"), col("k2"))
      val codes = resid.crossJoin(broadcast(c2))
        .withColumn("d2", expr(il2("rv", "c2v")))
        .withColumn("rn", row_number().over(w2)).filter(col("rn") === 1)
        .select(col("vec_id"), col("code1"), col("k2").as("code2"),
          col("d1"), col("d2"))
      // corpus-level quantization-error census — the number RQ exists
      // to lower; the zero code makes err2 ≤ err1 per vector, so the
      // arm comparison is the graded refinement guarantee
      val errs = codes.agg(
          expr("sum(d1) DIV count(1)").as("e1"),
          expr("sum(d2) DIV count(1)").as("e2"))
        .select(explode(expr(
          """array(named_struct('arm', 'rq1', 'err_mean_q', e1),
                   named_struct('arm', 'rq2', 'err_mean_q', e2))""")).as("ee"))
        .select(col("ee.arm").as("arm"), col("ee.err_mean_q").as("err_mean_q"))
      val rec = c1.crossJoin(c2)   // 16×16 control-plane reconstruction table
        .select(col("k1"), col("k2"), col("c1v").as("rec1"),
          expr("zip_with(c1v, c2v, (a, b) -> a + b)").as("rec2"))
      val q = g.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("iv").as("qv"))
      val lut = q.crossJoin(broadcast(rec))
        .select(col("qid"), col("k1"), col("k2"),
          expr(il2("qv", "rec1")).as("dq1"), expr(il2("qv", "rec2")).as("dq2"))
      val scored = codes.join(broadcast(lut),
          col("code1") === col("k1") && col("code2") === col("k2"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), explode(expr(
          """array(named_struct('arm', 'rq1', 'adc', dq1),
                   named_struct('arm', 'rq2', 'adc', dq2))""")).as("aa"))
        .select(col("qid"), col("vec_id"), col("aa.arm").as("arm"),
          col("aa.adc").as("adc_l2q"))
      val ow = Window.partitionBy("arm", "qid").orderBy(col("adc_l2q"), col("vec_id"))
      val truth = bruteTopK(s, d, 5)
        .select(col("qid"), col("vec_id"), lit(1L).as("in_truth"))
      scored.withColumn("rank", row_number().over(ow)).filter(col("rank") <= 5)
        .join(truth, Seq("qid", "vec_id"), "left")
        .withColumn("in_truth", coalesce(col("in_truth"), lit(0L)))
        .withColumn("recall_bp",
          (sum(col("in_truth")).over(Window.partitionBy("arm", "qid")) * 2000L)
            .cast("long"))
        .join(broadcast(errs), "arm")
        .select("arm", "qid", "rank", "vec_id", "adc_l2q", "in_truth",
          "recall_bp", "err_mean_q")
        .orderBy("arm", "qid", "rank")
    })
  )

  /** q292's ordering, shared with its q293 eval: IVF cell grouping,
    * centroid-outward within-cell order, two-level positions (per-cell
    * window + broadcast cell-size prefix sum — no global sort). */
  private def semPackOrder(s: SparkSession, d: String): DataFrame = {
    val n = normed(s, d)
    val cent = seedCentroids(n)
    val scored = cellAssign(n, cent)
      .join(broadcast(cent.withColumnRenamed("cent_id", "cell")), "cell")
      .select(col("vec_id"), col("cell"),
        (VectorOps.dotSeq(col("embedding"), col("ce")) / (col("nrm") * col("cn")))
          .as("cent_cos"))
    val pw = Window.partitionBy("cell").orderBy(col("cent_cos").desc, col("vec_id"))
    val pos = scored.withColumn("pos_in_cell", row_number().over(pw))
    // mutation seam (knob OFF in every production plan): an INCLUSIVE
    // frame end is the two-level placement off-by-one — offsets include
    // the cell's own size, blocks overlap, and no count surface notices
    val frameEnd =
      if (graft.Mutations.on("q292_offset_inclusive")) 0L else -1L
    val ow = Window.orderBy("cell")
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    // 16-row control plane: cell sizes + exclusive prefix sum
    val offs = pos.groupBy("cell").agg(count(lit(1)).as("csz"))
      .withColumn("coff", coalesce(sum(col("csz")).over(ow), lit(0L)))
      .select("cell", "coff")
    pos.join(broadcast(offs), "cell")
      .select((col("coff") + col("pos_in_cell")).as("seq_pos"),
        col("vec_id").as("doc_id"), col("cell"),
        round(col("cent_cos"), 6).as("cent_cos"))
      .orderBy("seq_pos")
  }

  /** Shared pre-filter TRUTH machinery for the filtered-ANN family
    * (q287 post-filter eval, q290 label-partitioned fix): the 10
    * labeled queries `ql(qid, qlabel)` (broadcast) and
    * `q(qid, qlabel, qe, qn)`, the per-query label-subset size
    * `nlab(qid, n_label)` (self excluded), and the exact cosine top-5
    * `truth(qid, vec_id)` over the subset. ONE definition so both
    * routes grade against the identical truth stream and their
    * recall_bp columns compare line by line. */
  private def labelTruth(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val lab = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val n = normed(s, d)
    val ql = broadcast(lab.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("label").as("qlabel")))
    val q = n.join(ql, col("vec_id") === col("qid"))
      .select(col("qid"), col("qlabel"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    // mutation seam (knob OFF in every production plan): dropping the
    // label-equality predicate makes the truth the GLOBAL top-5 — the
    // classic filtered-search bug where the filter is applied to the
    // system side but not the ground truth
    val labelPred =
      if (graft.Mutations.on("q287_label_truth_dropped")) lit(true)
      else col("label") === col("qlabel")
    val ts = n.join(lab, "vec_id")
      .join(broadcast(q), labelPred && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (VectorOps.dotSeq(col("qe"), col("embedding")) / (col("qn") * col("nrm")))
          .as("cos_sim"))
    val nlab = ts.groupBy("qid").agg(count(lit(1)).as("n_label"))
    val tw = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    val truth = ts.withColumn("rk", row_number().over(tw))
      .filter(col("rk") <= 5).select("qid", "vec_id")
    (ql, q, nlab, truth)
  }

  /** Assemble the filtered-ANN report from a candidate score stream
    * `cs(qid, vec_id, cos_sim)`: candidate counts, system top-5 by
    * (cos_sim desc, vec_id), hits vs truth, integer recall_bp over
    * least(5, n_label). Zero-candidate queries still emit a row
    * (left joins), so the report's domain is the full query set. */
  private def filteredAnnReport(ql: DataFrame, nlab: DataFrame,
      truth: DataFrame, cs: DataFrame): DataFrame = {
    val tw = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))
    val ncand = cs.groupBy("qid").agg(count(lit(1)).as("n_cand"))
    val sys5 = cs.withColumn("rk", row_number().over(tw))
      .filter(col("rk") <= 5).select("qid", "vec_id")
    val hits = sys5.join(truth, Seq("qid", "vec_id"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    ql.join(nlab, "qid")
      .join(ncand, Seq("qid"), "left")
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), col("qlabel"), col("n_label"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("(coalesce(n_hits, 0) * 10000) DIV least(5, n_label)")
          .as("recall_bp"))
      .orderBy("qid")
  }

  /** One greedy k-center round for the q284 oracle: min-distance of
    * every unselected point against the ≤(k−1)-row selected set, then
    * the deterministic farthest-point argmax (ties to min vec_id). */
  private def kcenterRoundSql(k: Int): String = {
    val p = k - 1
    s"""r$k AS (SELECT n.vec_id,
                min(1 - ${VectorOps.oDot("n.embedding", "s.se")} / (n.nrm * s.sn))
                  AS mind
           FROM n CROSS JOIN (SELECT s2.embedding AS se, s2.nrm AS sn
                              FROM n s2 JOIN sel$p ON s2.vec_id = sel$p.vec_id) s
           WHERE n.vec_id NOT IN (SELECT vec_id FROM sel$p)
           GROUP BY n.vec_id),
        pick$k AS (SELECT vec_id, mind FROM r$k
                   ORDER BY mind DESC, vec_id LIMIT 1),
        sel$k AS (SELECT vec_id FROM sel$p
                  UNION ALL SELECT vec_id FROM pick$k)"""
  }

  /** Power-iteration rounds for q114. Two is enough to demonstrate the
    * loop (the oracle unrolls the same count); production would iterate
    * to a convergence tolerance. */
  private val PowerIterRounds = 2
  private val Dims = 64

  /** q308's NSW shape: out-degree kept per node, NN-descent refinement
    * rounds for the graph build, beam width per query, and fixed
    * greedy-walk rounds for the search. */
  /** q314's Hamming prefilter width: candidates per query that survive
    * the popcount scan and reach the exact rerank (6.4% of this corpus
    * — measured recall@5 ≈ 64%; 64 would buy 72%). */
  private val HamCandidates = 32

  private val NswM = 8
  private val NswDescentRounds = 3
  private val NswBeam = 16
  private val NswRounds = 4

  /** q308's layer-1 geometry (r14 verdict item 2): the upper layer is
    * every stride-th vector (HNSW's level-1 sample) with its own
    * NN-descent graph ([[NswL1DescentRounds]] refinement rounds — the
    * n/stride node set converges fast), walked [[NswL1Rounds]] rounds
    * before its beam seeds the layer-0 walk. */
  private val NswLayerStride = 32
  private val NswL1Rounds = 2
  private val NswL1DescentRounds = 0

  // ---- q308/q332 shared DuckDB oracle fragments ----

  /** Seed scoring + top-M adjacency over CTE `${p}c0` → `${p}a0`. Both
    * layers' pair sets carry only their own ids, so scoring joins the
    * full nvec in both chains (the engine-side note). */
  private def oNswA0(p: String): String =
    s"""${p}s0 AS (SELECT p.src, p.dst,
                    ${VectorOps.oDot("a.embedding", "b.embedding")} /
                      (a.nrm * b.nrm) AS ecos
             FROM ${p}c0 p
             JOIN nvec a ON a.vec_id = p.src
             JOIN nvec b ON b.vec_id = p.dst),
      ${p}a0 AS MATERIALIZED (SELECT src, dst, ecos FROM (
             SELECT *, row_number() OVER (PARTITION BY src
                         ORDER BY ecos DESC, dst) AS rn
             FROM ${p}s0) WHERE rn <= $NswM)"""

  /** NN-descent rounds `${p}a1..${p}a$rounds` over `${p}a0`. */
  private def oNswDescent(p: String, rounds: Int): String =
    (1 to rounds).map { r =>
      s"""${p}u$r AS (SELECT src, dst, ecos FROM ${p}a${r - 1}
                  UNION ALL SELECT dst, src, ecos FROM ${p}a${r - 1}),
          ${p}th$r AS (SELECT DISTINCT x.src, y.dst
                   FROM ${p}u$r x JOIN ${p}u$r y ON y.src = x.dst
                   WHERE x.src <> y.dst),
          ${p}ts$r AS (SELECT p.src, p.dst,
                          ${VectorOps.oDot("a.embedding", "b.embedding")} /
                            (a.nrm * b.nrm) AS ecos
                   FROM ${p}th$r p
                   JOIN nvec a ON a.vec_id = p.src
                   JOIN nvec b ON b.vec_id = p.dst),
          ${p}a$r AS MATERIALIZED (SELECT src, dst, ecos FROM (
              SELECT *, row_number() OVER (PARTITION BY src
                          ORDER BY ecos DESC, dst) AS rn
              FROM (SELECT src, dst, max(ecos) AS ecos FROM (
                      SELECT * FROM ${p}u$r UNION ALL SELECT * FROM ${p}ts$r)
                    GROUP BY src, dst))
              WHERE rn <= $NswM)"""
    }.mkString(",\n")

  /** Fixed-round beam walk over CTE `$edges`, continuing `${p}b0`. */
  private def oNswWalk(p: String, edges: String, rounds: Int): String =
    (1 to rounds).map { r =>
      s"""${p}nr$r AS (SELECT DISTINCT b.qid, e.dst AS vec_id
                 FROM ${p}b${r - 1} b JOIN $edges e ON e.src = b.vec_id),
        ${p}sc$r AS (SELECT nr.qid, nr.vec_id,
                        ${VectorOps.oDot("q.qe", "v.embedding")} /
                          (q.qn * v.nrm) AS cos
                 FROM ${p}nr$r nr
                 JOIN nvec v ON v.vec_id = nr.vec_id
                 JOIN qv q ON q.qid = nr.qid),
        ${p}b$r AS MATERIALIZED (SELECT qid, vec_id, cos FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos DESC, vec_id) AS rn
            FROM (SELECT qid, vec_id, max(cos) AS cos FROM (
                    SELECT * FROM ${p}b${r - 1}
                    UNION ALL SELECT * FROM ${p}sc$r)
                  GROUP BY qid, vec_id))
            WHERE rn <= $NswBeam)"""
    }.mkString(",\n")

  /** Everything both q308 and q332 share: sign-LSH candidates, the
    * normed corpus, query set, layer-0 build (aN, nsw_e, nsw_u),
    * layer-1 build + walk (laN, lnsw_u, lbN), and the layered entry
    * beam `b0`. Opens the WITH — callers append their walk + grading
    * CTEs. */
  private def oNswPrelude: String = {
    val draw = SamplingPipeline.drawExpr(
      "concat(cast(src AS STRING), '#', cast(k AS STRING))", "nsw")
    val draw1 = SamplingPipeline.drawExpr(
      "concat(cast(src AS STRING), '#', cast(k AS STRING))", "nsw1")
    s"""WITH ${DedupQueries.oSignLshCandSql("embeddings")},
        nvec AS MATERIALIZED (SELECT vec_id, embedding,
                 ${VectorOps.oNorm("embedding")} AS nrm FROM embeddings),
        qv AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qe,
                 nrm AS qn FROM nvec WHERE vec_id < 10),
        cntv AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nvec),
        seedp AS (SELECT src, dst FROM (
                    SELECT src, ($draw) % cnt AS dst FROM (
                      SELECT v.vec_id AS src, kk.k AS k, c.cnt
                      FROM nvec v
                      CROSS JOIN (SELECT unnest(generate_series(1, $NswM))
                                    AS k) kk
                      CROSS JOIN cntv c))
                  WHERE dst <> src),
        cpn AS MATERIALIZED (SELECT id1, id2, cos_sim FROM cand
                             WHERE NOT isnan(cos_sim)),
        lshp AS (SELECT id1 AS src, id2 AS dst FROM cpn
                 UNION ALL SELECT id2, id1 FROM cpn),
        c0 AS (SELECT DISTINCT src, dst FROM (
                 SELECT * FROM seedp UNION ALL SELECT * FROM lshp)),
        ${oNswA0("")},
        ${oNswDescent("", NswDescentRounds)},
        nsw_e AS MATERIALIZED (SELECT src, dst FROM a$NswDescentRounds),
        nsw_u AS (SELECT src, dst FROM nsw_e
                  UNION ALL SELECT dst, src FROM nsw_e),
        nvec1 AS MATERIALIZED (SELECT vec_id FROM nvec
                 WHERE vec_id % $NswLayerStride = 0),
        cntv1 AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nvec1),
        lc0 AS (SELECT DISTINCT src, dst FROM (
                  SELECT src, (($draw1) % cnt) * $NswLayerStride AS dst
                  FROM (SELECT v.vec_id AS src, kk.k AS k, c.cnt
                        FROM nvec1 v
                        CROSS JOIN (SELECT unnest(generate_series(1, $NswM))
                                      AS k) kk
                        CROSS JOIN cntv1 c))
                WHERE dst <> src),
        ${oNswA0("l")},
        ${if (NswL1DescentRounds > 0) oNswDescent("l", NswL1DescentRounds) + ","
          else "" /* layer-1 graph = the scored seed adjacency la0 */}
        lnsw_e AS MATERIALIZED (SELECT src, dst FROM la$NswL1DescentRounds),
        lnsw_u AS (SELECT src, dst FROM lnsw_e
                   UNION ALL SELECT dst, src FROM lnsw_e),
        lb0 AS MATERIALIZED (SELECT qid, vec_id, cos FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cos DESC, vec_id) AS rn
            FROM (SELECT q.qid, v.vec_id,
                         ${VectorOps.oDot("q.qe", "v.embedding")} /
                           (q.qn * v.nrm) AS cos
                  FROM qv q CROSS JOIN nvec v
                  WHERE v.vec_id % $NswLayerStride = 0
                    AND v.vec_id < ${16 * NswLayerStride}))
            WHERE rn <= $NswBeam),
        ${oNswWalk("l", "lnsw_u", NswL1Rounds)},
        b0 AS MATERIALIZED (SELECT qid, vec_id, cos FROM lb$NswL1Rounds)"""
  }

  /** q50's brute top-5 as the truth CTE (`truth`). */
  private def oNswTruth: String =
    s"""tsc AS (SELECT q.qid, v.vec_id,
                       ${VectorOps.oDot("q.qe", "v.embedding")} /
                         (q.qn * v.nrm) AS cos
                FROM nvec v CROSS JOIN qv q WHERE v.vec_id <> q.qid),
        truth AS MATERIALIZED (SELECT qid, vec_id FROM (
                   SELECT qid, vec_id,
                          row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, vec_id) AS r
                   FROM tsc) WHERE r <= 5)"""

  /** The q308/q332 NSW machinery — ONE implementation of the normed-
    * corpus pin, the NN-descent build, the bidirectional beam walk, and
    * the truth grading, so the graded query and its ablation can never
    * drift. See q308's entry comment for the algorithm and scale story.
    *
    * The normed corpus is probed by every build and search round — pin
    * it once instead of re-scanning parquet + recomputing norms ~10×.
    * (Returned-result lineage keeps pins alive; blocks are reclaimed by
    * the context cleaner once results are GC'd — the CC labels
    * discipline.) */
  private[graft] final class NswEngine(s: SparkSession, d: String) {
    private val nPin = GraphOps.pin(normed(s, d))
    val n: DataFrame = nPin.df
    val q: DataFrame = n.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    private val cntDf = n.agg(count(lit(1)).as("cnt"))
    private val draw = SamplingPipeline.drawExpr(
      "concat(cast(src AS STRING), '#', cast(k AS STRING))", "nsw")
    private val seedPairs = n.select(col("vec_id").as("src"))
      .select(col("src"), explode(expr(s"sequence(1, $NswM)")).as("k"))
      .crossJoin(broadcast(cntDf)) // 1-row total — control-plane
      .select(col("src"), (expr(draw) % col("cnt")).as("dst"))
      .filter(col("dst") =!= col("src"))
    private val lshPairs = DedupQueries
      .signLshCosineCandidates(Tables.embeddings(s, d))
      .filter(!isnan(col("cos_sim")))
      .select(explode(array(
        struct(col("id1").as("src"), col("id2").as("dst")),
        struct(col("id2").as("src"), col("id1").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    private def scorePairs(p: DataFrame): DataFrame =
      p.join(n.select(col("vec_id").as("src"), col("embedding").as("se"),
          col("nrm").as("sn")), "src")
        .join(n.select(col("vec_id").as("dst"), col("embedding").as("de"),
          col("nrm").as("dn")), "dst")
        .select(col("src"), col("dst"),
          (VectorOps.dotSeq(col("se"), col("de")) / (col("sn") * col("dn")))
            .as("ecos"))
    private val ew = Window.partitionBy("src").orderBy(col("ecos").desc, col("dst"))
    private def topM(adj: DataFrame): DataFrame =
      adj.withColumn("rn", row_number().over(ew))
        .filter(col("rn") <= NswM).drop("rn")
    // mutation seam (knob OFF in every production plan): NN-descent
    // refining over out-edges only — the reverse pass is what makes
    // the neighbor-of-neighbor pool symmetric; dropping it is the
    // classic NN-descent convergence bug. ONE seam: both layers'
    // builds — and q332's two arms — share this descent.
    private val withReverse = !graft.Mutations.on("q308_reverse_edges_dropped")

    /** NN-descent over any initial candidate pair set. Layer-1 pairs
      * only carry layer-1 ids, so scoring/refinement against the FULL
      * normed corpus is identical to scoring against the subsample —
      * one build, two layers. Returns the adjacency pin — (src, dst)
      * is a lazy projection of it; re-pinning the projection would buy
      * nothing but another materialization job. */
    def descend(c0: DataFrame, rounds: Int): GraphOps.Pinned = {
      var adj = GraphOps.pin(topM(scorePairs(c0)))
      for (_ <- 1 to rounds) {
        val und =
          if (withReverse)
            adj.df.unionByName(adj.df.select(col("dst").as("src"),
              col("src").as("dst"), col("ecos")))
          else adj.df
        val twoHop = und.select(col("src"), col("dst").as("mid"))
          .join(und.select(col("src").as("mid"), col("dst")), "mid")
          .filter(col("src") =!= col("dst"))
          .select("src", "dst").distinct()
        val next = GraphOps.pin(topM(
          und.unionByName(scorePairs(twoHop))
            .groupBy("src", "dst").agg(max(col("ecos")).as("ecos"))))
        adj.free()
        adj = next
      }
      adj
    }

    /** The cands side is ALWAYS bounded (≤ |queries|·beam·M rows), so
      * broadcasting it and streaming the corpus is the scale-correct
      * shape — the index-store lookup pattern. Extra key columns on
      * `cands` (e.g. q332's strategy arm) ride through untouched. */
    def scoreOf(cands: DataFrame, keyCols: Seq[String] = Seq("qid")): DataFrame =
      n.join(broadcast(cands), "vec_id").join(broadcast(q), "qid")
        .select(keyCols.map(col) ++ Seq(col("vec_id"),
          (VectorOps.dotSeq(col("qe"), col("embedding")) /
            (col("qn") * col("nrm"))).as("cos")): _*)
    /** Beam ranking window over an arbitrary key prefix — (qid) for the
      * production walk, (strategy, qid) for q332's batched arms. */
    def bwOver(keyCols: Seq[String]): org.apache.spark.sql.expressions.WindowSpec =
      Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("cos").desc, col("vec_id"))
    val bw: org.apache.spark.sql.expressions.WindowSpec = bwOver(Seq("qid"))

    /** Fixed-round greedy beam walk over `edges`, continuing from the
      * given beam — the one walk both layers (and both q332 arms) run.
      * The walk expands BOTH directions of each stored edge (HNSW links
      * are bidirectional): a true neighbor always has out-edges INTO
      * its own region even when nothing points at it, so in-edge
      * expansion is what lets the beam enter that region — measured
      * +10pp mean recall@5 over out-edges-only at zero build cost (the
      * union is two scans of the pinned edge RDD; q332 grades the
      * shipped build's entry margin at 90% layered vs 84% flat). The incoming beam
      * stays UNPINNED: round 1 references it twice (union + probe
      * broadcast) — a one-time duplication of a beam-sized plan,
      * cheaper than a dedicated materialization job. */
    def walk(b0: DataFrame, edges: DataFrame, rounds: Int,
             keyCols: Seq[String] = Seq("qid")): GraphOps.Pinned = {
      // r18 (q332): `keyCols` generalizes the per-query beam key so
      // INDEPENDENT walks over the same graph can be batched into ONE
      // pass — beams tagged by arm, every round's probe join / beam
      // aggregate / rank window keyed (arm, qid). Per (arm, qid) the
      // recurrence is unchanged (all operators key on the full prefix),
      // so results are row-identical to two sequential walks; the win
      // is one pinned round chain instead of one per arm (half the
      // sequential materialization jobs — guide §2.4, one shuffle per
      // hop instead of two).
      val und = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      var beam: GraphOps.Pinned = null
      var cur: DataFrame = b0
      for (_ <- 1 to rounds) {
        val nbr = und
          .join(broadcast(cur.select(keyCols.map(col) :+
            col("vec_id").as("src"): _*)), "src")
          .select(keyCols.map(col) :+ col("dst").as("vec_id"): _*).distinct()
        val next = GraphOps.pin(cur.unionByName(scoreOf(nbr, keyCols))
          .groupBy((keyCols :+ "vec_id").map(col): _*)
          .agg(max(col("cos")).as("cos"))
          .withColumn("rn", row_number().over(bwOver(keyCols)))
          .filter(col("rn") <= NswBeam).drop("rn"))
        if (beam != null) beam.free()
        beam = next
        cur = next.df
      }
      beam
    }

    // LAYER 1: the 1/stride subsample's own NN-descent graph (md5 seed
    // pairs only — the LSH candidates thin to ~1/stride² inside the
    // subsample, not worth their plan). dst = (draw % |layer1|) · stride
    // maps the draw back onto the contiguous-id subsample.
    private val n1ids = n.filter(pmod(col("vec_id"), lit(NswLayerStride)) === 0)
    private val cnt1Df = n1ids.agg(count(lit(1)).as("cnt"))
    private val draw1 = SamplingPipeline.drawExpr(
      "concat(cast(src AS STRING), '#', cast(k AS STRING))", "nsw1")
    private val seed1 = n1ids.select(col("vec_id").as("src"))
      .select(col("src"), explode(expr(s"sequence(1, $NswM)")).as("k"))
      .crossJoin(broadcast(cnt1Df)) // 1-row total — control-plane
      .select(col("src"),
        ((expr(draw1) % col("cnt")) * NswLayerStride).as("dst"))
      .filter(col("dst") =!= col("src"))

    private def layer0Edges(): GraphOps.Pinned =
      descend(seedPairs.unionByName(lshPairs).distinct(), NswDescentRounds)

    /** The (layer-0 adjacency, layer-1 entry beam) this engine serves —
      * built on first touch, then REUSED by every q308/q332 evaluation
      * in the session ([[nswCache]] holds the engine). Consumers never
      * free these pins; [[clearNswCache]] releases them. */
    private var sharedOpt: Option[(GraphOps.Pinned, GraphOps.Pinned)] = None
    private def sharedBuild: (GraphOps.Pinned, GraphOps.Pinned) =
      synchronized {
        sharedOpt.getOrElse {
          val b = (layer0Edges(), layeredEntryBeam())
          sharedOpt = Some(b); b
        }
      }
    def sharedLayer0Edges: DataFrame = sharedBuild._1.df
    def sharedLayeredBeam: DataFrame = sharedBuild._2.df
    def freeShared(): Unit = synchronized {
      sharedOpt.foreach { case (e0, b1) => e0.free(); b1.free() }
      sharedOpt = None
      nPin.free()
    }

    private def topEntry(cands: DataFrame): DataFrame =
      scoreOf(cands)
        .withColumn("rn", row_number().over(bw))
        .filter(col("rn") <= NswBeam).drop("rn")

    /** The r14-style query-blind entry: the 16 fixed seed vectors scored
      * and topped — q332's baseline arm. 10 qids × 16 entry ids, a
      * control-plane cross of two bounded sets. */
    def flatEntryBeam: DataFrame =
      topEntry(q.select(col("qid"))
        .crossJoin(n.filter(col("vec_id") < 16).select(col("vec_id"))))

    /** The layer-1 walk: 16 fixed layer-1 entries, [[NswL1Rounds]]
      * rounds over the subsample graph — the query-adaptive entry set
      * (and its exact-cosine scores, unchanged between layers) that
      * seeds the layer-0 walk, HNSW's descent step. */
    private def layeredEntryBeam(): GraphOps.Pinned = {
      val edges1 = descend(seed1.distinct(), NswL1DescentRounds)
      val beam1 = walk(
        topEntry(q.select(col("qid")).crossJoin(
          n1ids.filter(col("vec_id") < 16 * NswLayerStride).select(col("vec_id")))),
        edges1.df.select("src", "dst"), NswL1Rounds)
      edges1.free()
      beam1
    }

    /** Per-hit truth grading vs q50's brute top-5: (qid, rank, vec_id,
      * cos_sim, in_truth, recall_bp), unordered. `keyCols` extends the
      * ranking key for batched multi-arm beams (the walk's seam); extra
      * key columns ride through into the output. */
    def grade(beamDf: DataFrame,
              keyCols: Seq[String] = Seq("qid")): DataFrame = {
      val truth = bruteTopK(s, d, 5)
        .select(col("qid"), col("vec_id"), lit(1L).as("in_truth"))
      beamDf.filter(col("vec_id") =!= col("qid"))
        .withColumn("rank", row_number().over(bwOver(keyCols)))
        .filter(col("rank") <= 5)
        .join(truth, Seq("qid", "vec_id"), "left")
        .withColumn("in_truth", coalesce(col("in_truth"), lit(0L)))
        .withColumn("recall_bp",
          (sum(col("in_truth"))
            .over(Window.partitionBy(keyCols.map(col): _*)) * 2000)
            .cast("long"))
        .select(keyCols.filterNot(_ == "qid").map(col) ++
          Seq(col("qid"), col("rank"), col("vec_id"),
            round(col("cos"), 6).as("cos_sim"), col("in_truth"),
            col("recall_bp")): _*)
    }
  }

  /** PQ geometry for q122: M subspaces × SubDim dims (M·SubDim = Dims),
    * 16 codebook entries per subspace (vec_id < 16, the q51 convention). */
  private val PqM = 8
  private val PqSubDim = 8

  /** Stage-1 candidate pool per query for q129's exact rerank. */
  private val AdcRerankPool = 20

  /** q122's PQ-ADC scoring, unlimited: every (query, candidate) in the
    * probed code space with its floor-quantized asymmetric distance and
    * per-query rank. Shared by q122 (top-5) and q129 (top-20 → exact
    * rerank) so the two stages can never drift. */
  private def pqAdcRanked(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    def subs(df: DataFrame, outId: String): DataFrame =
      df.select(col("vec_id").as(outId),
        explode(expr(s"transform(sequence(0, ${PqM - 1}), " +
          s"m -> struct(m AS m, slice(embedding, m * $PqSubDim + 1, $PqSubDim) AS sub))")).as("x"))
        .select(col(outId), col("x.m").as("m"), col("x.sub").as("sub"))
    val cb = subs(e.filter(col("vec_id") < 16), "k")
      .select(col("m"), col("k"), col("sub").as("cent"))
    val encw = Window.partitionBy("vec_id", "m").orderBy(col("dist"), col("k"))
    val codes = subs(e, "vec_id")
      .join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("k"),
        VectorOps.l2sq(col("sub"), col("cent")).as("dist"))
      .withColumn("rn", row_number().over(encw)).filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("k").as("code"))
    val lut = subs(e.filter(col("vec_id") < 10), "qid")
      .join(broadcast(cb), "m")
      .select(col("qid"), col("m"), col("k").as("code"),
        floor(VectorOps.l2sq(col("sub"), col("cent")) * lit(1e6)).as("dq"))
    val rw = Window.partitionBy("qid").orderBy(col("adc_dist"), col("vec_id"))
    codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id").agg(sum(col("dq")).as("micro"))
      .select(col("qid"), col("vec_id"),
        (col("micro").cast("double") / lit(1e6)).as("adc_dist"))
      .withColumn("rank", row_number().over(rw))
  }

  /** Unrolled DuckDB twin of one power-iteration round: direction list in
    * CTE `$prev`, produces `v$k`. Mirrors the Spark/driver math op-for-op
    * (same folds, same decimal scales, same scalar operation order). */
  private def powerIterSql(k: Int, prev: String): String = {
    import graft.ops.oSum
    s"""md$k AS (SELECT ${VectorOps.oDot("(SELECT ml FROM mul)", s"(SELECT vl FROM $prev)")} AS mdv),
        s$k AS (SELECT vec_id, embedding,
                  ${VectorOps.oDot("embedding", s"(SELECT vl FROM $prev)")} - (SELECT mdv FROM md$k) AS s
                FROM x),
        a$k AS (SELECT dim, ${oSum("CAST(v AS DOUBLE) * s", 6)} AS a
                FROM (SELECT s, unnest(generate_series(0, len(embedding) - 1)) AS dim,
                             unnest(embedding) AS v
                      FROM s$k)
                GROUP BY dim),
        ss$k AS (SELECT ${oSum("s", 6)} AS ss FROM s$k),
        w$k AS (SELECT a$k.dim, a$k.a - mu.m * (SELECT ss FROM ss$k) AS w
                FROM a$k JOIN mu USING (dim)),
        n$k AS (SELECT ${VectorOps.oNorm("list(w ORDER BY dim)")} AS nrm FROM w$k),
        v$k AS (SELECT list(w / (SELECT nrm FROM n$k) ORDER BY dim) AS vl FROM w$k)"""
  }

  /** DuckDB twin of [[pqAdcRanked]]: CTE chain ending in `adcranked`
    * (qid, vec_id, adc_dist, rank). Shared by the q122 and q129 oracles. */
  private def oPqAdcCtes: String =
    s"""x AS (SELECT vec_id, embedding FROM embeddings),
        subs AS (SELECT vec_id, m,
                        embedding[m * $PqSubDim + 1 : m * $PqSubDim + $PqSubDim] AS sub
                 FROM (SELECT vec_id, embedding,
                              unnest(generate_series(0, ${PqM - 1})) AS m
                       FROM x)),
        cb AS (SELECT m, vec_id AS k, sub AS cent FROM subs WHERE vec_id < 16),
        enc AS (SELECT vec_id, m, k AS code FROM (
                  SELECT s.vec_id, s.m, cb.k,
                         row_number() OVER (PARTITION BY s.vec_id, s.m
                                            ORDER BY ${VectorOps.oL2sq("s.sub", "cb.cent")}, cb.k) AS rn
                  FROM subs s JOIN cb ON cb.m = s.m)
                WHERE rn = 1),
        lut AS (SELECT s.vec_id AS qid, s.m, cb.k AS code,
                       CAST(floor(${VectorOps.oL2sq("s.sub", "cb.cent")} * 1e6) AS BIGINT) AS dq
                FROM subs s JOIN cb ON cb.m = s.m
                WHERE s.vec_id < 10),
        adc AS (SELECT lut.qid, enc.vec_id,
                       CAST(sum(dq) AS DOUBLE) / 1e6 AS adc_dist
                FROM enc JOIN lut ON lut.m = enc.m AND lut.code = enc.code
                WHERE enc.vec_id <> lut.qid
                GROUP BY 1, 2),
        adcranked AS (SELECT qid, vec_id, adc_dist,
                             row_number() OVER (PARTITION BY qid
                                                ORDER BY adc_dist, vec_id) AS rank
                      FROM adc)"""

  def oracles: Map[String, String] = Map(
    "q114_power_iteration" -> {
      val iters = (1 to PowerIterRounds)
        .map(k => powerIterSql(k, if (k == 1) "v0" else s"v${k - 1}"))
        .mkString(",\n")
      s"""WITH x AS (SELECT vec_id, embedding FROM embeddings),
          mu AS (SELECT dim, ${oAvg("CAST(v AS DOUBLE)", 9)} AS m
                 FROM (SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim,
                              unnest(embedding) AS v
                       FROM x)
                 GROUP BY dim),
          mul AS (SELECT list(m ORDER BY dim) AS ml FROM mu),
          v0 AS (SELECT list_transform(range(0, $Dims),
                   i -> CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END) AS vl),
          $iters
          SELECT dim, w / (SELECT nrm FROM n$PowerIterRounds) AS loading
          FROM w$PowerIterRounds ORDER BY dim"""
    },

    "q107_semantic_dedup" ->
      s"""WITH $semCorpusSql,
          ${DedupQueries.oSignLshCandSql("emb")}
          SELECT id1 AS survivor_id, id2 AS removed_id, cos_sim FROM cand
          WHERE cos_sim >= $SemDupThreshold
          ORDER BY survivor_id, removed_id""",

    "q119_hybrid_rrf" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
          words AS (SELECT DISTINCT doc_id, w
                    FROM (${TextQueries.oBigramTokens("docs", "doc_id")})),
          nd AS (SELECT count(*) AS n_docs FROM docs),
          terms AS (SELECT w, (SELECT n_docs FROM nd) - df AS wt
                    FROM (SELECT w, count(*) AS df FROM words GROUP BY w)
                    WHERE df * ${TextQueries.BigramStopCap} <= (SELECT n_docs FROM nd)),
          qw AS (SELECT doc_id AS qid, w FROM words WHERE doc_id % 50 = 0),
          lex AS (SELECT qw.qid, words.doc_id, sum(wt) AS lex_score
                  FROM qw JOIN terms USING (w) JOIN words USING (w)
                  WHERE words.doc_id <> qw.qid GROUP BY 1, 2),
          lr AS (SELECT qid, doc_id,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY lex_score DESC, doc_id) AS lex_rank
                 FROM lex),
          $normedSql,
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM n WHERE vec_id % 50 = 0),
          sem AS (SELECT q.qid, n.vec_id AS doc_id,
                         ${VectorOps.oDot("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cos_sim
                  FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
          sr AS (SELECT qid, doc_id,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos_sim DESC, doc_id) AS sem_rank
                 FROM sem),
          fused AS (SELECT coalesce(lr.qid, sr.qid) AS qid,
                           coalesce(lr.doc_id, sr.doc_id) AS doc_id,
                           lex_rank, sem_rank,
                           coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank), CAST(0 AS DOUBLE))
                             + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem_rank), CAST(0 AS DOUBLE)) AS rrf
                    FROM lr FULL OUTER JOIN sr
                      ON lr.qid = sr.qid AND lr.doc_id = sr.doc_id)
          SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id,
                 CAST(coalesce(lex_rank, 0) AS INTEGER) AS lex_rank,
                 CAST(coalesce(sem_rank, 0) AS INTEGER) AS sem_rank, rrf
          FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                             ORDER BY rrf DESC, doc_id) AS rank
                FROM fused)
          WHERE rank <= 5 ORDER BY qid, rank""",

    // q194: q119's lexical branch + fuse verbatim; the semantic branch
    // goes through q51's IVF CTEs with q119's query set.
    "q194_hybrid_rrf_ivf" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
          words AS (SELECT DISTINCT doc_id, w
                    FROM (${TextQueries.oBigramTokens("docs", "doc_id")})),
          nd AS (SELECT count(*) AS n_docs FROM docs),
          terms AS (SELECT w, (SELECT n_docs FROM nd) - df AS wt
                    FROM (SELECT w, count(*) AS df FROM words GROUP BY w)
                    WHERE df * ${TextQueries.BigramStopCap} <= (SELECT n_docs FROM nd)),
          qw AS (SELECT doc_id AS qid, w FROM words WHERE doc_id % 50 = 0),
          lex AS (SELECT qw.qid, words.doc_id, sum(wt) AS lex_score
                  FROM qw JOIN terms USING (w) JOIN words USING (w)
                  WHERE words.doc_id <> qw.qid GROUP BY 1, 2),
          lr AS (SELECT qid, doc_id,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY lex_score DESC, doc_id) AS lex_rank
                 FROM lex),
          $normedSql,
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, n.embedding, n.nrm, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM n WHERE vec_id % 50 = 0),
          pc AS (SELECT q.qid, q.qe, q.qn, cent.cent_id,
                        ${VectorOps.oDot("q.qe", "cent.ce")} / (q.qn * cent.cn) AS pcos
                 FROM q CROSS JOIN cent),
          probes AS (SELECT qid, qe, qn, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                                                    ORDER BY pcos DESC, cent_id) AS prn
                       FROM pc) WHERE prn <= 4),
          sem AS (SELECT p.qid, a.vec_id AS doc_id,
                         ${VectorOps.oDot("p.qe", "a.embedding")} / (p.qn * a.nrm) AS cos_sim
                  FROM probes p JOIN assign a ON a.cell = p.cell
                  WHERE a.vec_id <> p.qid),
          sr AS (SELECT qid, doc_id,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY cos_sim DESC, doc_id) AS sem_rank
                 FROM sem),
          fused AS (SELECT coalesce(lr.qid, sr.qid) AS qid,
                           coalesce(lr.doc_id, sr.doc_id) AS doc_id,
                           lex_rank, sem_rank,
                           coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank), CAST(0 AS DOUBLE))
                             + coalesce(CAST(1.0 AS DOUBLE) / (60 + sem_rank), CAST(0 AS DOUBLE)) AS rrf
                    FROM lr FULL OUTER JOIN sr
                      ON lr.qid = sr.qid AND lr.doc_id = sr.doc_id)
          SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id,
                 CAST(coalesce(lex_rank, 0) AS INTEGER) AS lex_rank,
                 CAST(coalesce(sem_rank, 0) AS INTEGER) AS sem_rank, rrf
          FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                             ORDER BY rrf DESC, doc_id) AS rank
                FROM fused)
          WHERE rank <= 5 ORDER BY qid, rank""",

    "q201_semdedup" ->
      s"""WITH $semCorpusSql,
          n AS (SELECT vec_id, embedding,
                       ${VectorOps.oNorm("embedding")} AS nrm FROM emb),
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                   FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, n.embedding, n.nrm, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")}
                          / (n.nrm * cent.cn) AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          pairs AS (SELECT a.cell, a.vec_id AS ka, b.vec_id AS kb,
                           ${VectorOps.oDot("a.embedding", "b.embedding")}
                             / (a.nrm * b.nrm) AS cos
                    FROM assign a JOIN assign b
                      ON a.cell = b.cell AND a.vec_id < b.vec_id),
          sel AS (SELECT cell, ka, kb, cos,
                         row_number() OVER (PARTITION BY kb ORDER BY ka) AS rn
                  FROM pairs WHERE cos >= $SemDupThreshold)
          SELECT kb AS removed_id, ka AS keeper_id, cell,
                 round(cos, 6) AS cos_sim
          FROM sel WHERE rn = 1 ORDER BY removed_id""",

    // q308: the NN-descent NSW build (md5-seeded random graph ∪ sign-
    // LSH candidates, then bounded neighbor-of-neighbor refinement
    // rounds a0..a[DescentRounds]), the multi-entry greedy beam walk
    // unrolled round by round (b0..bR, each a union + (qid, vec_id)
    // dedup + top-B window — the exact monotone iteration the Spark
    // loop pins), and the q50 brute truth for per-hit membership and
    // recall@5. Every adjacency/beam CTE is MATERIALIZED: each is
    // referenced by the next round AND the dedup union, and the
    // iteration would otherwise inline exponentially.
    // q308 / q332 share ONE oracle prelude ([[oNswPrelude]]): build,
    // layers, walks — only the final grading SELECT differs per query.
    "q308_nsw_graph_ann" ->
      s"""$oNswPrelude,
          ${oNswWalk("", "nsw_u", NswRounds)},
          $oNswTruth,
          fnd AS (SELECT qid, vec_id, cos,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY cos DESC, vec_id) AS rank
                  FROM b$NswRounds WHERE vec_id <> qid),
          hits AS (SELECT f.qid, f.rank, f.vec_id,
                          round(f.cos, 6) AS cos_sim,
                          CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END
                            AS in_truth
                   FROM fnd f LEFT JOIN truth t
                     ON t.qid = f.qid AND t.vec_id = f.vec_id
                   WHERE f.rank <= 5)
          SELECT qid, rank, vec_id, cos_sim,
                 CAST(in_truth AS BIGINT) AS in_truth,
                 CAST(sum(in_truth) OVER (PARTITION BY qid) * 2000
                   AS BIGINT) AS recall_bp
          FROM hits ORDER BY qid, rank""",

    // the ablation: the SAME layer-0 walk chain (b*) plus a second walk
    // (f*) from the flat 16-seed entry, recall per (strategy, qid)
    "q332_ann_entry_ablation" ->
      s"""$oNswPrelude,
          ${oNswWalk("", "nsw_u", NswRounds)},
          fb0 AS MATERIALIZED (SELECT qid, vec_id, cos FROM (
              SELECT *, row_number() OVER (PARTITION BY qid
                          ORDER BY cos DESC, vec_id) AS rn
              FROM (SELECT q.qid, v.vec_id,
                           ${VectorOps.oDot("q.qe", "v.embedding")} /
                             (q.qn * v.nrm) AS cos
                    FROM qv q CROSS JOIN nvec v WHERE v.vec_id < 16))
              WHERE rn <= $NswBeam),
          ${oNswWalk("f", "nsw_u", NswRounds)},
          $oNswTruth,
          fnd_b AS (SELECT qid, vec_id FROM (
                      SELECT qid, vec_id,
                             row_number() OVER (PARTITION BY qid
                               ORDER BY cos DESC, vec_id) AS rank
                      FROM b$NswRounds WHERE vec_id <> qid)
                    WHERE rank <= 5),
          fnd_f AS (SELECT qid, vec_id FROM (
                      SELECT qid, vec_id,
                             row_number() OVER (PARTITION BY qid
                               ORDER BY cos DESC, vec_id) AS rank
                      FROM fb$NswRounds WHERE vec_id <> qid)
                    WHERE rank <= 5),
          rec_b AS (SELECT f.qid,
                           CAST(sum(CASE WHEN t.vec_id IS NULL THEN 0
                                         ELSE 1 END) AS BIGINT) AS n_hits
                    FROM fnd_b f LEFT JOIN truth t
                      ON t.qid = f.qid AND t.vec_id = f.vec_id
                    GROUP BY f.qid),
          rec_f AS (SELECT f.qid,
                           CAST(sum(CASE WHEN t.vec_id IS NULL THEN 0
                                         ELSE 1 END) AS BIGINT) AS n_hits
                    FROM fnd_f f LEFT JOIN truth t
                      ON t.qid = f.qid AND t.vec_id = f.vec_id
                    GROUP BY f.qid),
          arms AS (SELECT 'b_layered' AS strategy, qid, n_hits FROM rec_b
                   UNION ALL
                   SELECT 'a_flat16' AS strategy, qid, n_hits FROM rec_f)
          SELECT strategy, qid, n_hits,
                 CAST(n_hits * 2000 AS BIGINT) AS recall_bp,
                 CAST(sum(n_hits * 2000) OVER (PARTITION BY strategy) //
                      count(*) OVER (PARTITION BY strategy)
                   AS BIGINT) AS strategy_mean_bp
          FROM arms ORDER BY strategy, qid""",

    "q50_knn_brute" ->
      s"""WITH $normedSql,
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM n WHERE vec_id < 10),
          scored AS (SELECT q.qid, n.vec_id,
                            ${VectorOps.oDot("q.qe", "n.embedding")} / (q.qn * n.nrm) AS cos_sim
                     FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
          ranked AS (SELECT qid, vec_id, cos_sim,
                            row_number() OVER (PARTITION BY qid
                                               ORDER BY cos_sim DESC, vec_id) AS rank
                     FROM scored)
          SELECT qid, rank, vec_id, cos_sim FROM ranked
          WHERE rank <= 5 ORDER BY qid, rank""",

    "q128_incremental_ann" ->
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings
                       UNION ALL
                       SELECT vec_id + 200000 AS vec_id,
                              list_transform(embedding, x -> x * CAST(0.5 AS FLOAT)) AS embedding
                       FROM embeddings WHERE vec_id % 7 = 0),
          n AS (SELECT vec_id, embedding, ${VectorOps.oNorm("embedding")} AS nrm FROM emb),
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, n.embedding, n.nrm, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM n WHERE vec_id < 10),
          pc AS (SELECT q.qid, q.qe, q.qn, cent.cent_id,
                        ${VectorOps.oDot("q.qe", "cent.ce")} / (q.qn * cent.cn) AS pcos
                 FROM q CROSS JOIN cent),
          probes AS (SELECT qid, qe, qn, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                                                    ORDER BY pcos DESC, cent_id) AS prn
                       FROM pc) WHERE prn <= 4),
          cand AS (SELECT p.qid, a.vec_id,
                          ${VectorOps.oDot("p.qe", "a.embedding")} / (p.qn * a.nrm) AS cos_sim
                   FROM probes p JOIN assign a ON a.cell = p.cell
                   WHERE a.vec_id <> p.qid),
          ranked AS (SELECT qid, vec_id, cos_sim,
                            row_number() OVER (PARTITION BY qid
                                               ORDER BY cos_sim DESC, vec_id) AS rank
                     FROM cand)
          SELECT qid, rank, vec_id, cos_sim FROM ranked
          WHERE rank <= 5 ORDER BY qid, rank""",

    // from-scratch rebuild of the q346 structural census — equality with
    // the engine's incremental maintenance IS the correctness claim
    "q346_incremental_ivf_maintenance" ->
      s"""WITH $normedSql,
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, cent_id AS cell,
                            CAST(floor(1e6 * ccos) AS BIGINT) AS qcos FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          stats AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
                           CAST(sum(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_from_delta,
                           CAST(sum(qcos) AS BIGINT) AS sum_qcos
                    FROM assign GROUP BY cell),
          tot AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS nt FROM stats),
          hub AS (SELECT cell, vec_id, qcos,
                         row_number() OVER (PARTITION BY cell
                                            ORDER BY qcos DESC, vec_id) AS hr
                  FROM assign),
          hub8 AS (SELECT cell, min(qcos) AS hub_min_qcos,
                          CAST(sum(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_delta_hubs
                   FROM hub WHERE hr <= $HubK GROUP BY cell)
          SELECT s.cell, s.n_vectors, s.n_from_delta, s.sum_qcos,
                 hub8.hub_min_qcos, hub8.n_delta_hubs,
                 s.n_vectors > 1 + (5 * nt) // 64 AS overfull
          FROM stats s JOIN hub8 USING (cell) CROSS JOIN tot
          ORDER BY cell""",

    "q122_pq_adc" ->
      s"""WITH $oPqAdcCtes
          SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, adc_dist
          FROM adcranked
          WHERE rank <= 5 ORDER BY qid, rank""",

    "q129_adc_rerank" ->
      s"""WITH $oPqAdcCtes,
          cand AS (SELECT qid, vec_id FROM adcranked WHERE rank <= $AdcRerankPool),
          nv AS (SELECT vec_id, embedding, ${VectorOps.oNorm("embedding")} AS nrm
                 FROM embeddings),
          rer AS (SELECT c.qid, c.vec_id,
                         ${VectorOps.oDot("q.embedding", "n.embedding")} / (q.nrm * n.nrm) AS cos_sim
                  FROM cand c
                  JOIN nv n ON n.vec_id = c.vec_id
                  JOIN nv q ON q.vec_id = c.qid)
          SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, cos_sim FROM (
            SELECT qid, vec_id, cos_sim,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos_sim DESC, vec_id) AS rank
            FROM rer)
          WHERE rank <= 5 ORDER BY qid, rank""",

    "q51_ivf_ann" ->
      s"""WITH $normedSql,
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, n.embedding, n.nrm, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM n WHERE vec_id < 10),
          pc AS (SELECT q.qid, q.qe, q.qn, cent.cent_id,
                        ${VectorOps.oDot("q.qe", "cent.ce")} / (q.qn * cent.cn) AS pcos
                 FROM q CROSS JOIN cent),
          probes AS (SELECT qid, qe, qn, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                                                    ORDER BY pcos DESC, cent_id) AS prn
                       FROM pc) WHERE prn <= 4),
          cand AS (SELECT p.qid, a.vec_id,
                          ${VectorOps.oDot("p.qe", "a.embedding")} / (p.qn * a.nrm) AS cos_sim
                   FROM probes p JOIN assign a ON a.cell = p.cell
                   WHERE a.vec_id <> p.qid),
          ranked AS (SELECT qid, vec_id, cos_sim,
                            row_number() OVER (PARTITION BY qid
                                               ORDER BY cos_sim DESC, vec_id) AS rank
                     FROM cand)
          SELECT qid, rank, vec_id, cos_sim FROM ranked
          WHERE rank <= 5 ORDER BY qid, rank""",

    "q207_ivf_probe_sweep" ->
      s"""WITH $normedSql,
          bq AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
                 FROM n WHERE vec_id < 10),
          bs AS (SELECT bq.qid, n.vec_id,
                        ${VectorOps.oDot("bq.qe", "n.embedding")} / (bq.qn * n.nrm) AS cos_sim
                 FROM n CROSS JOIN bq WHERE n.vec_id <> bq.qid),
          bt AS (SELECT qid, vec_id FROM (
                   SELECT qid, vec_id,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY cos_sim DESC, vec_id) AS rank
                   FROM bs) WHERE rank <= 5),
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, n.embedding, n.nrm, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          pc AS (SELECT bq.qid, bq.qe, bq.qn, cent.cent_id,
                        ${VectorOps.oDot("bq.qe", "cent.ce")} / (bq.qn * cent.cn) AS pcos
                 FROM bq CROSS JOIN cent),
          probes AS (SELECT qid, qe, qn, cent_id AS cell, prn FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                                                    ORDER BY pcos DESC, cent_id) AS prn
                       FROM pc) WHERE prn <= 8),
          cand AS (SELECT p.qid, p.prn, a.vec_id,
                          ${VectorOps.oDot("p.qe", "a.embedding")} / (p.qn * a.nrm) AS cos_sim
                   FROM probes p JOIN assign a ON a.cell = p.cell
                   WHERE a.vec_id <> p.qid),
          budgets AS (SELECT unnest([1, 2, 4, 8]) AS p),
          swept AS (SELECT b.p, c.qid, c.vec_id, c.cos_sim
                    FROM budgets b JOIN cand c ON c.prn <= b.p),
          systop AS (SELECT p, qid, vec_id FROM (
                       SELECT p, qid, vec_id,
                              row_number() OVER (PARTITION BY qid, p
                                                 ORDER BY cos_sim DESC, vec_id) AS rank
                       FROM swept) WHERE rank <= 5),
          tn AS (SELECT count(*) AS n_truth FROM bt),
          hits AS (SELECT p, count(*) AS n_hits
                   FROM systop JOIN bt USING (qid, vec_id) GROUP BY p)
          SELECT b.p AS probes,
                 CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
                 CAST(coalesce(hits.n_hits, 0) * 10000 // tn.n_truth AS BIGINT)
                   AS recall_bp
          FROM budgets b LEFT JOIN hits ON hits.p = b.p CROSS JOIN tn
          ORDER BY probes""",

    "q231_rerank_cascade" ->
      s"""WITH ${TextQueries.oBm25Ctes("documents", "doc_id % 50 = 0")},
          cand AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= 20),
          nv AS (SELECT vec_id, embedding,
                        ${VectorOps.oNorm("embedding")} AS nrm FROM embeddings),
          up AS (SELECT c.qid, c.doc_id, c.rank,
                        CASE WHEN q.vec_id IS NOT NULL AND v.vec_id IS NOT NULL
                             THEN ${VectorOps.oDot("q.embedding", "v.embedding")}
                                  / (q.nrm * v.nrm)
                        END AS cos
                 FROM cand c
                 LEFT JOIN nv q ON q.vec_id = c.qid
                 LEFT JOIN nv v ON v.vec_id = c.doc_id),
          fr AS (SELECT qid, doc_id, cos,
                        row_number() OVER (PARTITION BY qid ORDER BY
                          CASE WHEN cos IS NOT NULL THEN 0 ELSE 1 END,
                          CASE WHEN cos IS NOT NULL THEN -cos ELSE 0.0 END,
                          rank, doc_id) AS final_rank
                 FROM up)
          SELECT qid, CAST(final_rank AS INTEGER) AS final_rank, doc_id,
                 CASE WHEN cos IS NOT NULL THEN 'rerank'
                      ELSE 'lexical' END AS stage,
                 cos AS cos_sim
          FROM fr WHERE final_rank <= 5 ORDER BY qid, final_rank""",

    "q213_matryoshka_recall" -> {
      val ms = Seq(8, 16, 32, 64)
      val preCols = ms.map(m =>
        s"embedding[1:$m] AS e$m, ${VectorOps.oNorm(s"embedding[1:$m]")} AS n$m")
        .mkString(", ")
      val qCols = ms.map(m => s"e$m AS qe$m, n$m AS qn$m").mkString(", ")
      val scoredSql = ms.map(m =>
        s"""SELECT q.qid, p.vec_id, $m AS m,
              ${VectorOps.oDot(s"q.qe$m", s"p.e$m")} / (q.qn$m * p.n$m) AS cos
            FROM pre p CROSS JOIN q WHERE p.vec_id <> q.qid""")
        .mkString("\n UNION ALL ")
      s"""WITH pre AS (SELECT vec_id, $preCols FROM embeddings),
          q AS (SELECT vec_id AS qid, $qCols FROM pre WHERE vec_id < 10),
          scored AS ($scoredSql),
          top5 AS (SELECT m, qid, vec_id FROM (
                     SELECT m, qid, vec_id,
                            row_number() OVER (PARTITION BY qid, m
                                               ORDER BY cos DESC, vec_id) AS rank
                     FROM scored) WHERE rank <= 5),
          truth AS (SELECT qid, vec_id FROM top5 WHERE m = ${ms.max}),
          tn AS (SELECT count(*) AS n_truth FROM truth),
          hits AS (SELECT m, count(*) AS n_hits
                   FROM top5 JOIN truth USING (qid, vec_id) GROUP BY m),
          dm AS (SELECT unnest([${ms.mkString(", ")}]) AS m)
          SELECT dm.m AS dims,
                 CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
                 CAST(coalesce(hits.n_hits, 0) * 10000 // tn.n_truth AS BIGINT)
                   AS recall_bp
          FROM dm LEFT JOIN hits ON hits.m = dm.m CROSS JOIN tn
          ORDER BY dims"""
    },

    "q209_ann_index_stats" ->
      s"""WITH $normedSql,
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          cells AS (SELECT cell, count(*) AS n_vecs FROM assign GROUP BY cell),
          tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total FROM cells)
          SELECT cell, n_vecs,
                 CAST(n_vecs * 10000 // n_total AS BIGINT) AS share_bp,
                 CAST(n_vecs * 16 * 10000 // n_total AS BIGINT) AS balance_bp
          FROM cells CROSS JOIN tot ORDER BY cell""",

    "q237_ivf_rebalance_plan" ->
      s"""WITH $normedSql,
          hot AS (SELECT n.vec_id + 1000000 AS vec_id, v0.e0 AS embedding,
                         v0.n0 AS nrm
                  FROM n CROSS JOIN (SELECT embedding AS e0, nrm AS n0
                                     FROM n WHERE vec_id = 0) v0),
          pc AS (SELECT vec_id, embedding, nrm FROM n
                 UNION ALL SELECT vec_id, embedding, nrm FROM hot),
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
          ac AS (SELECT pc.vec_id, cent.cent_id,
                        ${VectorOps.oDot("pc.embedding", "cent.ce")} / (pc.nrm * cent.cn) AS ccos
                 FROM pc CROSS JOIN cent),
          assign AS (SELECT vec_id, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          cells AS (SELECT cell, count(*) AS n_vecs FROM assign GROUP BY cell),
          tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total FROM cells),
          plan AS (SELECT cell, n_vecs,
                          CAST(n_vecs * 16 * 10000 // n_total AS BIGINT) AS balance_bp
                   FROM cells CROSS JOIN tot)
          SELECT cell, n_vecs, balance_bp,
                 CASE WHEN balance_bp > 15000 THEN 'split'
                      WHEN balance_bp < 5000 THEN 'merge'
                      ELSE 'keep' END AS action,
                 CAST(CASE WHEN balance_bp > 15000 THEN 2
                           WHEN balance_bp < 5000 THEN 0
                           ELSE 1 END AS BIGINT) AS cells_after
          FROM plan ORDER BY cell""",

    "q204_ann_ndcg" ->
      s"""WITH $normedSql,
          bq AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
                 FROM n WHERE vec_id < 10),
          bs AS (SELECT bq.qid, n.vec_id,
                        ${VectorOps.oDot("bq.qe", "n.embedding")} / (bq.qn * n.nrm) AS cos_sim
                 FROM n CROSS JOIN bq WHERE n.vec_id <> bq.qid),
          bt AS (SELECT qid, vec_id, rank, 6 - rank AS rel FROM (
                   SELECT qid, vec_id,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY cos_sim DESC, vec_id) AS rank
                   FROM bs) WHERE rank <= 5),
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, n.embedding, n.nrm, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          pc AS (SELECT bq.qid, bq.qe, bq.qn, cent.cent_id,
                        ${VectorOps.oDot("bq.qe", "cent.ce")} / (bq.qn * cent.cn) AS pcos
                 FROM bq CROSS JOIN cent),
          probes AS (SELECT qid, qe, qn, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                                                    ORDER BY pcos DESC, cent_id) AS prn
                       FROM pc) WHERE prn <= 4),
          cand AS (SELECT p.qid, a.vec_id,
                          ${VectorOps.oDot("p.qe", "a.embedding")} / (p.qn * a.nrm) AS cos_sim
                   FROM probes p JOIN assign a ON a.cell = p.cell
                   WHERE a.vec_id <> p.qid),
          st AS (SELECT qid, vec_id, rank FROM (
                   SELECT qid, vec_id,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY cos_sim DESC, vec_id) AS rank
                   FROM cand) WHERE rank <= 5),
          dcg AS (SELECT st.qid,
                         CAST(SUM(CAST(round(coalesce(bt.rel, 0)
                                / log2(st.rank + 1.0) * 1000000) AS BIGINT))
                           AS BIGINT) AS dcg_fp
                  FROM st LEFT JOIN bt
                    ON bt.qid = st.qid AND bt.vec_id = st.vec_id
                  GROUP BY st.qid),
          idcg AS (SELECT qid,
                          CAST(SUM(CAST(round(rel / log2(rank + 1.0) * 1000000)
                                 AS BIGINT)) AS BIGINT) AS idcg_fp
                   FROM bt GROUP BY qid)
          SELECT qid, round(CAST(dcg_fp AS DOUBLE) / idcg_fp, 6) AS ndcg
          FROM dcg JOIN idcg USING (qid) ORDER BY qid""",

    "q88_kmeans_refine" ->
      s"""WITH $normedSql,
          cent0 AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id < 8),
          s1 AS (SELECT n.vec_id, n.nrm, c.cid,
                        ${VectorOps.oDot("n.embedding", "c.ce")} / (n.nrm * c.cn) AS ccos
                 FROM n CROSS JOIN cent0 c),
          a1 AS (SELECT vec_id, nrm, cid AS cluster FROM (
                   SELECT *, row_number() OVER (PARTITION BY vec_id
                                                ORDER BY ccos DESC, cid) AS rn
                   FROM s1) WHERE rn = 1),
          dims AS (SELECT a1.cluster,
                          unnest(generate_series(0, len(n.embedding) - 1)) AS dim,
                          unnest(n.embedding) AS v
                   FROM a1 JOIN n USING (vec_id)),
          cm AS (SELECT cluster, dim, ${oAvg("CAST(v AS DOUBLE)", 8)} AS m
                 FROM dims GROUP BY 1, 2),
          cent1 AS (SELECT cluster AS cid, list(m ORDER BY dim) AS ce
                    FROM cm GROUP BY cluster),
          cent1n AS (SELECT cid, ce, ${VectorOps.oNorm("ce")} AS cn FROM cent1),
          s2 AS (SELECT n.vec_id, n.nrm, c.cid,
                        ${VectorOps.oDot("n.embedding", "c.ce")} / (n.nrm * c.cn) AS ccos
                 FROM n CROSS JOIN cent1n c),
          a2 AS (SELECT vec_id, nrm, cid AS cluster FROM (
                   SELECT *, row_number() OVER (PARTITION BY vec_id
                                                ORDER BY ccos DESC, cid) AS rn
                   FROM s2) WHERE rn = 1)
          SELECT cluster, count(*) AS n_members, ${oAvg("nrm", 6)} AS avg_nrm
          FROM a2 GROUP BY cluster ORDER BY cluster""",

    // q284: seed = vec_id 0, then 7 unrolled farthest-point rounds; the
    // final SELECT stitches the seed row (NULL maximin — no prior set)
    // to each round's pick.
    "q284_kcenter_coreset" -> {
      val rounds = (2 to 8).map(kcenterRoundSql).mkString(",\n")
      val picks = (2 to 8).map(r =>
        s"UNION ALL SELECT $r AS rank, vec_id, mind AS maximin_dist FROM pick$r")
        .mkString("\n")
      s"""WITH $normedSql,
          sel1 AS (SELECT CAST(0 AS BIGINT) AS vec_id),
          $rounds
          SELECT 1 AS rank, CAST(0 AS BIGINT) AS vec_id,
                 CAST(NULL AS DOUBLE) AS maximin_dist
          $picks
          ORDER BY rank"""
    },

    "q256_sq_recall" -> {
      val bits = Seq(2, 4, 6, 8)
      def scale(b: Int): Int = (1 << (b - 1)) - 1
      val preCols = bits.map { b =>
        val s0 = scale(b)
        s"""list_transform(embedding,
              x -> floor(CAST(x AS DOUBLE) * $s0 + 0.5) / $s0) AS r$b"""
      }.mkString(", ")
      val normCols = bits.map(b =>
        s"${VectorOps.oNorm(s"r$b")} AS n$b").mkString(", ")
      val scoredSql = (s"""SELECT q.qid, p.vec_id, 0 AS b,
              ${VectorOps.oDot("q.qe", "p.embedding")} / (q.qn * p.nf) AS cos
            FROM pre p CROSS JOIN q WHERE p.vec_id <> q.qid""" +:
        bits.map(b =>
          s"""SELECT q.qid, p.vec_id, $b AS b,
                CASE WHEN p.n$b = 0 THEN -2.0
                     ELSE ${VectorOps.oDot("q.qe", s"p.r$b")} / (q.qn * p.n$b)
                END AS cos
              FROM pre p CROSS JOIN q WHERE p.vec_id <> q.qid"""))
        .mkString("\n UNION ALL ")
      s"""WITH pre0 AS (SELECT vec_id, embedding,
                              ${VectorOps.oNorm("embedding")} AS nf, $preCols
                        FROM embeddings),
          pre AS (SELECT *, $normCols FROM pre0),
          q AS (SELECT vec_id AS qid, embedding AS qe, nf AS qn
                FROM pre WHERE vec_id < 10),
          scored AS ($scoredSql),
          top5 AS (SELECT b, qid, vec_id FROM (
                     SELECT b, qid, vec_id,
                            row_number() OVER (PARTITION BY qid, b
                                               ORDER BY cos DESC, vec_id) AS rank
                     FROM scored) WHERE rank <= 5),
          truth AS (SELECT qid, vec_id FROM top5 WHERE b = 0),
          tn AS (SELECT count(*) AS n_truth FROM truth),
          hits AS (SELECT b, count(*) AS n_hits
                   FROM top5 JOIN truth USING (qid, vec_id)
                   WHERE b <> 0 GROUP BY b),
          dm AS (SELECT unnest([${bits.mkString(", ")}]) AS b)
          SELECT dm.b AS bits,
                 CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
                 CAST(coalesce(hits.n_hits, 0) * 10000 // tn.n_truth AS BIGINT)
                   AS recall_bp
          FROM dm LEFT JOIN hits ON hits.b = dm.b CROSS JOIN tn
          ORDER BY bits"""
    },

    // q287: the q51 probe chain with the label carried; truth = exact
    // top-5 over the label subset (shared CTEs with q290), system =
    // post-filtered IVF candidates, recall over least(5, n_label).
    "q287_filtered_ann" ->
      s"""WITH $labelTruthSqlCtes,
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                   FROM n WHERE vec_id < 16),
          ac AS (SELECT nl.vec_id, nl.embedding, nl.nrm, nl.label, cent.cent_id,
                        ${VectorOps.oDot("nl.embedding", "cent.ce")} / (nl.nrm * cent.cn) AS ccos
                 FROM nl CROSS JOIN cent),
          assign AS (SELECT vec_id, embedding, nrm, label, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          pc AS (SELECT q.qid, q.qlabel, q.qe, q.qn, cent.cent_id,
                        ${VectorOps.oDot("q.qe", "cent.ce")} / (q.qn * cent.cn) AS pcos
                 FROM q CROSS JOIN cent),
          probes AS (SELECT qid, qlabel, qe, qn, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                                                    ORDER BY pcos DESC, cent_id) AS prn
                       FROM pc) WHERE prn <= 4),
          cs AS (SELECT p.qid, a.vec_id,
                        ${VectorOps.oDot("p.qe", "a.embedding")} / (p.qn * a.nrm) AS cos_sim
                 FROM probes p JOIN assign a ON a.cell = p.cell
                 WHERE a.vec_id <> p.qid AND a.label = p.qlabel),
          $filteredAnnReportSql""",

    // q290: per-label centroids (8 smallest vec_ids within each label),
    // label-keyed assignment and probes — candidates label-pure, no
    // post-filter; report and truth CTEs shared verbatim with q287.
    "q290_label_partitioned_ivf" ->
      s"""WITH $labelTruthSqlCtes,
          cent AS (SELECT label AS clabel, vec_id AS cent_id,
                          embedding AS ce, nrm AS cn FROM (
                     SELECT nl.*, row_number() OVER (PARTITION BY label
                                                     ORDER BY vec_id) AS crn
                     FROM nl) WHERE crn <= 8),
          ac AS (SELECT nl.vec_id, nl.embedding, nl.nrm, cent.cent_id,
                        ${VectorOps.oDot("nl.embedding", "cent.ce")} / (nl.nrm * cent.cn) AS ccos
                 FROM nl JOIN cent ON cent.clabel = nl.label),
          assign AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                                                    ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          pc AS (SELECT q.qid, q.qe, q.qn, cent.cent_id,
                        ${VectorOps.oDot("q.qe", "cent.ce")} / (q.qn * cent.cn) AS pcos
                 FROM q JOIN cent ON cent.clabel = q.qlabel),
          probes AS (SELECT qid, qe, qn, cent_id AS cell FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                                                    ORDER BY pcos DESC, cent_id) AS prn
                       FROM pc) WHERE prn <= 4),
          cs AS (SELECT p.qid, a.vec_id,
                        ${VectorOps.oDot("p.qe", "a.embedding")} / (p.qn * a.nrm) AS cos_sim
                 FROM probes p JOIN assign a ON a.cell = p.cell
                 WHERE a.vec_id <> p.qid),
          $filteredAnnReportSql""",

    // q292: the q51 assignment, per-cell centroid-outward positions,
    // exclusive prefix-sum cell offsets.
    "q292_semantic_pack_order" ->
      s"""WITH $semPackOrderSqlCtes
          SELECT CAST(coff + pic AS BIGINT) AS seq_pos, vec_id AS doc_id,
                 CAST(cell AS BIGINT) AS cell, round(cent_cos, 6) AS cent_cos
          FROM pos JOIN offs USING (cell) ORDER BY seq_pos""",

    // q293: adjacent-pair mean cosine under q292's order (seq_pos
    // key-shift) vs dense doc-id order (vec_id key-shift), decimal-
    // exact means over 6dp-rounded pair cosines.
    "q293_pack_coherence" ->
      s"""WITH $semPackOrderSqlCtes,
          ord AS (SELECT coff + pic AS seq_pos, vec_id FROM pos JOIN offs USING (cell)),
          sp AS (SELECT a.vec_id AS ida, b.vec_id AS idb
                 FROM ord a JOIN ord b ON b.seq_pos = a.seq_pos + 1),
          np AS (SELECT a.vec_id AS ida, b.vec_id AS idb
                 FROM n a JOIN n b ON b.vec_id = a.vec_id + 1),
          sc AS (SELECT round(${VectorOps.oDot("na.embedding", "nb.embedding")}
                              / (na.nrm * nb.nrm), 6) AS cos
                 FROM sp JOIN n na ON na.vec_id = sp.ida
                         JOIN n nb ON nb.vec_id = sp.idb),
          nc AS (SELECT round(${VectorOps.oDot("na.embedding", "nb.embedding")}
                              / (na.nrm * nb.nrm), 6) AS cos
                 FROM np JOIN n na ON na.vec_id = np.ida
                         JOIN n nb ON nb.vec_id = np.idb)
          SELECT 'doc_id' AS ordering, CAST(count(*) AS BIGINT) AS n_pairs,
                 ${oAvg("cos", 6)} AS mean_adj_cos FROM nc
          UNION ALL
          SELECT 'semantic' AS ordering, CAST(count(*) AS BIGINT) AS n_pairs,
                 ${oAvg("cos", 6)} AS mean_adj_cos FROM sc
          ORDER BY ordering""",

    // q300: cross-label cosine top-5 under the 0.98 near-dup ceiling —
    // the n/nl/q relations are labelTruth's verbatim (shared CTEs).
    "q300_hard_negatives" ->
      s"""WITH base AS (SELECT vec_id, label, embedding FROM embeddings),
          plant AS (SELECT vec_id + 1000000 AS vec_id, label + 1 AS label,
                           embedding
                    FROM base WHERE vec_id < 10),
          corp AS (SELECT * FROM base UNION ALL SELECT * FROM plant),
          nl AS (SELECT vec_id, label, embedding,
                        ${VectorOps.oNorm("embedding")} AS nrm
                 FROM corp),
          q AS (SELECT vec_id AS qid, label AS qlabel,
                       embedding AS qe, nrm AS qn
                FROM nl WHERE vec_id < 10),
          scored AS (SELECT q.qid, nl.vec_id,
                            ${VectorOps.oDot("q.qe", "nl.embedding")} / (q.qn * nl.nrm)
                              AS cos_sim
                     FROM q JOIN nl ON nl.label <> q.qlabel),
          hard AS (SELECT * FROM scored WHERE cos_sim < 0.98)
          SELECT qid, rank, vec_id, cos_sim FROM (
            SELECT qid, vec_id, cos_sim,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos_sim DESC, vec_id) AS rank
            FROM hard) WHERE rank <= 5 ORDER BY qid, rank""",

    // q301: the sign-LSH candidate seam, cross-parity pairs, negated-cos
    // struct sort for the top-4 ordered fold, ratio margin, mutual top-1.
    "q301_margin_bitext" ->
      s"""WITH ${DedupQueries.oSignLshCandSql("embeddings")},
          cp AS (SELECT id1, id2, cos_sim FROM cand
                 WHERE NOT isnan(cos_sim) AND (id1 + id2) % 2 = 1),
          sym AS (SELECT id1 AS src, id2 AS dst, cos_sim FROM cp
                  UNION ALL SELECT id2, id1, cos_sim FROM cp),
          nbl AS (SELECT src,
                         list_sort(list({'nc': -cos_sim, 'dst': dst})) AS ns
                  FROM sym GROUP BY src),
          nb AS (SELECT src,
                        list_reduce(
                          list_prepend(CAST(0.0 AS DOUBLE),
                            list_transform(ns[1:least(4, len(ns))], x -> -x.nc)),
                          (acc, v) -> acc + v) / least(4, len(ns)) AS mtop
                 FROM nbl),
          scored AS (SELECT CASE WHEN cp.id1 % 2 = 0 THEN cp.id1 ELSE cp.id2 END AS x_id,
                            CASE WHEN cp.id1 % 2 = 0 THEN cp.id2 ELSE cp.id1 END AS y_id,
                            cp.cos_sim * 2 / (a.mtop + b.mtop) AS margin
                     FROM cp JOIN nb a ON a.src = cp.id1
                             JOIN nb b ON b.src = cp.id2),
          rk AS (SELECT x_id, y_id, margin,
                        row_number() OVER (PARTITION BY x_id
                                           ORDER BY margin DESC, y_id) AS xr,
                        row_number() OVER (PARTITION BY y_id
                                           ORDER BY margin DESC, x_id) AS yr
                 FROM scored)
          SELECT x_id, y_id, round(margin, 6) AS margin FROM rk
          WHERE xr = 1 AND yr = 1 ORDER BY x_id""",

    // q303: the q51 assignment CTEs, the shared md5 draw, √-quota keep.
    "q343_stream_ann_ingest" ->
      s"""WITH $normedSql,
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                   FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn)
                          AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, cent_id AS cell FROM (
                       SELECT vec_id, cent_id,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1)
          SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
                 CAST(sum(vec_id) AS BIGINT) AS id_sum,
                 CAST(min(vec_id) AS BIGINT) AS id_min
          FROM assign GROUP BY cell ORDER BY cell""",

    "q303_cluster_balanced_sample" -> {
      val draw = SamplingPipeline.drawExpr("vec_id", "cbs")
      s"""WITH $normedSql,
          cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                   FROM n WHERE vec_id < 16),
          ac AS (SELECT n.vec_id, cent.cent_id,
                        ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn)
                          AS ccos
                 FROM n CROSS JOIN cent),
          assign AS (SELECT vec_id, cent_id AS cell FROM (
                       SELECT vec_id, cent_id,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY ccos DESC, cent_id) AS arn
                       FROM ac) WHERE arn = 1),
          drawn AS (SELECT vec_id, cell, $draw AS draw FROM assign),
          sized AS (SELECT vec_id, cell,
                           CAST(count(*) OVER (PARTITION BY cell) AS BIGINT)
                             AS cell_size,
                           row_number() OVER (PARTITION BY cell
                                              ORDER BY draw, vec_id) AS pos
                    FROM drawn)
          SELECT cell, pos, vec_id, cell_size,
                 CAST(floor(sqrt(CAST(cell_size AS DOUBLE))) AS BIGINT) AS quota
          FROM sized
          WHERE pos <= CAST(floor(sqrt(CAST(cell_size AS DOUBLE))) AS BIGINT)
          ORDER BY cell, pos"""
    },

    // q314: sign codes as two 32-bit words, popcount Hamming prefilter,
    // exact rerank, q50-truth grading. DuckDB's ^ is POWER — xor() is
    // the bitwise operator here.
    "q314_binary_hamming_ann" -> {
      def oCode(lo: Int, hi: Int): String =
        s"""CAST(list_sum(list_transform(generate_series($lo, $hi),
              j -> CASE WHEN embedding[j] > 0
                        THEN (CAST(1 AS BIGINT) << (j - $lo))
                        ELSE 0 END)) AS BIGINT)"""
      s"""WITH $normedSql,
          codes AS (SELECT vec_id, ${oCode(1, 32)} AS c1,
                           ${oCode(33, 64)} AS c2
                    FROM n),
          qc AS (SELECT vec_id AS qid, c1 AS qc1, c2 AS qc2 FROM codes
                 WHERE vec_id < 10),
          qv AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM n
                 WHERE vec_id < 10),
          ham AS (SELECT qc.qid, c.vec_id,
                         CAST(bit_count(xor(c.c1, qc.qc1)) +
                              bit_count(xor(c.c2, qc.qc2)) AS BIGINT)
                           AS hamming
                  FROM codes c CROSS JOIN qc WHERE c.vec_id <> qc.qid),
          cand AS (SELECT qid, vec_id, hamming FROM (
                     SELECT *, row_number() OVER (PARTITION BY qid
                       ORDER BY hamming, vec_id) AS hrn
                     FROM ham) WHERE hrn <= $HamCandidates),
          scored AS (SELECT cand.qid, cand.vec_id, cand.hamming,
                            ${VectorOps.oDot("qv.qe", "n2.embedding")} /
                              (qv.qn * n2.nrm) AS cos
                     FROM cand JOIN n n2 ON n2.vec_id = cand.vec_id
                     JOIN qv ON qv.qid = cand.qid),
          t5 AS (SELECT * FROM (
                   SELECT *, row_number() OVER (PARTITION BY qid
                     ORDER BY cos DESC, vec_id) AS rank
                   FROM scored) WHERE rank <= 5),
          truth AS (SELECT qid, vec_id FROM (
                      SELECT qv.qid, n2.vec_id,
                             row_number() OVER (PARTITION BY qv.qid
                               ORDER BY ${VectorOps.oDot("qv.qe", "n2.embedding")} /
                                          (qv.qn * n2.nrm) DESC,
                                        n2.vec_id) AS rk
                      FROM n n2 CROSS JOIN qv
                      WHERE n2.vec_id <> qv.qid) WHERE rk <= 5),
          fin AS (SELECT t5.qid, t5.rank, t5.vec_id, t5.hamming,
                         round(t5.cos, 6) AS cos_sim,
                         CAST(CASE WHEN tr.vec_id IS NOT NULL
                                   THEN 1 ELSE 0 END AS BIGINT) AS in_truth
                  FROM t5 LEFT JOIN truth tr
                    ON tr.qid = t5.qid AND tr.vec_id = t5.vec_id)
          SELECT qid, rank, vec_id, hamming, cos_sim, in_truth,
                 CAST(sum(in_truth) OVER (PARTITION BY qid) * 2000
                   AS BIGINT) AS recall_bp
          FROM fin ORDER BY qid, rank"""
    },

    "q324_residual_quantize" -> {
      def oIl2(a: String, b: String): String =
        s"""CAST(list_sum(list_transform(generate_series(1, len($a)),
            i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"""
      s"""WITH $normedSql,
          g AS (SELECT vec_id, list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) / nrm * 4096) AS BIGINT))
                  AS iv
                FROM n),
          c1 AS (SELECT vec_id AS k1, iv AS c1v FROM g
                 WHERE vec_id >= 100 AND vec_id < 116),
          a1 AS (SELECT vec_id, iv, k1 AS code1, c1v, d1 FROM (
                   SELECT g.vec_id, g.iv, c1.k1, c1.c1v,
                          ${oIl2("g.iv", "c1.c1v")} AS d1,
                          row_number() OVER (PARTITION BY g.vec_id
                            ORDER BY ${oIl2("g.iv", "c1.c1v")}, c1.k1) AS rn
                   FROM g CROSS JOIN c1) WHERE rn = 1),
          resid AS (SELECT vec_id, code1, d1,
                           list_transform(generate_series(1, len(iv)),
                             i -> iv[i] - c1v[i]) AS rv
                    FROM a1),
          c2 AS (SELECT vec_id AS k2, rv AS c2v FROM resid
                 WHERE vec_id >= 116 AND vec_id < 132
                 UNION ALL
                 SELECT CAST(-1 AS BIGINT) AS k2,
                        list_transform(c1v, x -> CAST(0 AS BIGINT)) AS c2v
                 FROM (SELECT c1v FROM c1 LIMIT 1)),
          codes AS (SELECT vec_id, code1, k2 AS code2, d1, d2 FROM (
                      SELECT r.vec_id, r.code1, c2.k2, r.d1,
                             ${oIl2("r.rv", "c2.c2v")} AS d2,
                             row_number() OVER (PARTITION BY r.vec_id
                               ORDER BY ${oIl2("r.rv", "c2.c2v")}, c2.k2) AS rn
                      FROM resid r CROSS JOIN c2) WHERE rn = 1),
          errs AS (SELECT arm, CASE WHEN arm = 'rq1' THEN e1 ELSE e2 END
                            AS err_mean_q
                   FROM (SELECT CAST(sum(d1) // count(*) AS BIGINT) AS e1,
                                CAST(sum(d2) // count(*) AS BIGINT) AS e2
                         FROM codes)
                   CROSS JOIN (SELECT 'rq1' AS arm
                               UNION ALL SELECT 'rq2') arms),
          rec AS (SELECT k1, k2, c1v AS rec1,
                         list_transform(generate_series(1, len(c1v)),
                           i -> c1v[i] + c2v[i]) AS rec2
                  FROM c1 CROSS JOIN c2),
          qg AS (SELECT vec_id AS qid, iv AS qv FROM g WHERE vec_id < 10),
          lut AS (SELECT qid, k1, k2,
                         ${oIl2("qv", "rec1")} AS dq1,
                         ${oIl2("qv", "rec2")} AS dq2
                  FROM qg CROSS JOIN rec),
          scored AS (SELECT qid, vec_id, arm,
                            CASE WHEN arm = 'rq1' THEN dq1 ELSE dq2 END
                              AS adc_l2q
                     FROM codes
                     JOIN lut ON lut.k1 = codes.code1
                             AND lut.k2 = codes.code2
                     CROSS JOIN (SELECT 'rq1' AS arm
                                 UNION ALL SELECT 'rq2') arms
                     WHERE vec_id <> qid),
          t5 AS (SELECT * FROM (
                   SELECT *, row_number() OVER (PARTITION BY arm, qid
                     ORDER BY adc_l2q, vec_id) AS rank
                   FROM scored) WHERE rank <= 5),
          qv AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM n
                 WHERE vec_id < 10),
          truth AS (SELECT qid, vec_id FROM (
                      SELECT qv.qid, n2.vec_id,
                             row_number() OVER (PARTITION BY qv.qid
                               ORDER BY ${VectorOps.oDot("qv.qe", "n2.embedding")} /
                                          (qv.qn * n2.nrm) DESC,
                                        n2.vec_id) AS rk
                      FROM n n2 CROSS JOIN qv
                      WHERE n2.vec_id <> qv.qid) WHERE rk <= 5),
          fin AS (SELECT t5.arm, t5.qid, t5.rank, t5.vec_id, t5.adc_l2q,
                         CAST(CASE WHEN tr.vec_id IS NOT NULL
                                   THEN 1 ELSE 0 END AS BIGINT) AS in_truth
                  FROM t5 LEFT JOIN truth tr
                    ON tr.qid = t5.qid AND tr.vec_id = t5.vec_id)
          SELECT fin.arm, qid, rank, vec_id, adc_l2q, in_truth,
                 CAST(sum(in_truth) OVER (PARTITION BY fin.arm, qid) * 2000
                   AS BIGINT) AS recall_bp,
                 errs.err_mean_q
          FROM fin JOIN errs ON errs.arm = fin.arm
          ORDER BY fin.arm, qid, rank"""
    }
  )

  /** Shared oracle CTEs for q292/q293: the q51 cell assignment with the
    * winning centroid's cosine carried (`pos` adds the within-cell
    * position, `offs` the exclusive cell-offset prefix sum). */
  private def semPackOrderSqlCtes: String =
    s"""$normedSql,
        cent AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn
                 FROM n WHERE vec_id < 16),
        ac AS (SELECT n.vec_id, cent.cent_id,
                      ${VectorOps.oDot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) AS ccos
               FROM n CROSS JOIN cent),
        assign AS (SELECT vec_id, cent_id AS cell, ccos AS cent_cos FROM (
                     SELECT *, row_number() OVER (PARTITION BY vec_id
                                                  ORDER BY ccos DESC, cent_id) AS arn
                     FROM ac) WHERE arn = 1),
        pos AS (SELECT vec_id, cell, cent_cos,
                       row_number() OVER (PARTITION BY cell
                                          ORDER BY cent_cos DESC, vec_id) AS pic
                FROM assign),
        offs AS (SELECT cell, COALESCE(sum(csz) OVER (ORDER BY cell
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS coff
                 FROM (SELECT cell, count(*) AS csz FROM pos GROUP BY cell))"""

  /** Shared oracle CTEs for the filtered-ANN family (q287/q290): the
    * labeled normed corpus `nl`, queries `q`, exact label-subset scores
    * `ts`, subset sizes `nlab`, and exact top-5 `truth` — the SQL twin
    * of [[labelTruth]], one definition for both oracles. */
  private def labelTruthSqlCtes: String =
    s"""$normedSql,
        lab AS (SELECT vec_id, label FROM embeddings),
        nl AS (SELECT n.vec_id, n.embedding, n.nrm, lab.label
               FROM n JOIN lab ON lab.vec_id = n.vec_id),
        q AS (SELECT vec_id AS qid, label AS qlabel,
                     embedding AS qe, nrm AS qn
              FROM nl WHERE vec_id < 10),
        ts AS (SELECT q.qid, nl.vec_id,
                      ${VectorOps.oDot("q.qe", "nl.embedding")} / (q.qn * nl.nrm) AS cos_sim
               FROM q JOIN nl ON nl.label = q.qlabel AND nl.vec_id <> q.qid),
        nlab AS (SELECT qid, count(*) AS n_label FROM ts GROUP BY qid),
        truth AS (SELECT qid, vec_id FROM (
                    SELECT qid, vec_id,
                           row_number() OVER (PARTITION BY qid
                                              ORDER BY cos_sim DESC, vec_id) AS rk
                    FROM ts) WHERE rk <= 5)"""

  /** SQL twin of [[filteredAnnReport]]: consumes `cs(qid, vec_id,
    * cos_sim)` plus the [[labelTruthSqlCtes]] relations and emits the
    * final 6-column report (ends with the SELECT). */
  private def filteredAnnReportSql: String =
    """ncand AS (SELECT qid, count(*) AS n_cand FROM cs GROUP BY qid),
       sys5 AS (SELECT qid, vec_id FROM (
                  SELECT qid, vec_id,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY cos_sim DESC, vec_id) AS rk
                  FROM cs) WHERE rk <= 5),
       hits AS (SELECT s.qid, count(*) AS n_hits
                FROM sys5 s JOIN truth t ON t.qid = s.qid AND t.vec_id = s.vec_id
                GROUP BY s.qid)
       SELECT q.qid, q.qlabel, nlab.n_label,
              coalesce(ncand.n_cand, 0) AS n_cand,
              coalesce(hits.n_hits, 0) AS n_hits,
              (coalesce(hits.n_hits, 0) * 10000) // least(5, nlab.n_label)
                AS recall_bp
       FROM q JOIN nlab ON nlab.qid = q.qid
       LEFT JOIN ncand ON ncand.qid = q.qid
       LEFT JOIN hits ON hits.qid = q.qid
       ORDER BY q.qid"""
}
