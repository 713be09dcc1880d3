package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 optimization memos: each shared pin must (a) be served as
  * the identical object on a memo hit, (b) carry exactly the
  * unmemoized derivation, and (c) keep every mutation knob isolated —
  * a red-case run must neither read a knob-blind memo nor poison the
  * production entry. The NSW-memo witness discipline applied to the
  * r17 additions (signature tables, chunk stores, lexical rank table,
  * perplexity model, incremental BM25 ledger). */
class MemoSpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "pinned table must equal the unmemoized derivation exactly")
  }

  test("signature memos carry the ledger-build derivations and are shared") {
    val sh1 = DedupQueries.sharedShingles(spark, sf)
    assert(sh1 eq DedupQueries.sharedShingles(spark, sf),
      "same (session, dataset) must reuse ONE distinct-shingle pin")
    sameRows(sh1, DedupQueries.shinglesOf(DedupQueries.corpus(spark, sf)))
    val mh1 = DedupQueries.sharedMinhashSigs(spark, sf)
    assert(mh1 eq DedupQueries.sharedMinhashSigs(spark, sf),
      "same (session, dataset) must reuse ONE signature pin")
    sameRows(mh1, DedupQueries.minhash(
      DedupQueries.shinglesRawOf(DedupQueries.corpus(spark, sf))))
  }

  test("q41/q43 ride the ledger: outputs equal the unmemoized derivations") {
    val q41 = DedupQueries.queries("q41_minhash_lsh")(spark, sf)
    sameRows(q41, DedupQueries.candidatePairsOf(
      DedupQueries.shinglesRawOf(DedupQueries.corpus(spark, sf))))
    val q43 = DedupQueries.queries("q43_ngram_jaccard")(spark, sf)
    val c = DedupQueries.corpus(spark, sf)
    sameRows(q43, DedupQueries.jaccardOf(
      DedupQueries.candidatePairsOf(DedupQueries.shinglesRawOf(c)),
      DedupQueries.shinglesOf(c)))
  }

  test("chunk memos: identity, and the divisor knob keys its own entry") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val cdc = DedupQueries.sharedCdcBaseChunks(spark, sf, DedupQueries.CdcDivisor)
    assert(cdc eq DedupQueries.sharedCdcBaseChunks(spark, sf,
      DedupQueries.CdcDivisor))
    sameRows(cdc, DedupQueries.cdcChunkRows(docs, DedupQueries.CdcDivisor))
    val fixed = DedupQueries.sharedFixedBaseChunks(spark, sf)
    sameRows(fixed, DedupQueries.fixedChunkRows(docs))
    // the divisor keys the memo: a knob-on q313 run builds ITS OWN
    // entry (div = 63) and production output is identical afterwards
    def q313(): String = DedupQueries.queries("q313_cdc_chunks")(spark, sf)
      .collect().map(_.toString).sorted.mkString("|")
    val before = q313()
    val mutated = graft.Mutations.withMutation("q313_divisor_off_by_one") {
      val cm = DedupQueries.sharedCdcBaseChunks(spark, sf,
        DedupQueries.CdcDivisor - 1)
      assert(!(cm eq cdc), "knob-on run must not read the production pin")
      q313()
    }
    assert(mutated != before, "divisor knob must still redden off the memo")
    assert(q313() == before, "red-case run must not poison the production pin")
  }

  test("lexical rank memo carries the q119/q194 chain and is shared") {
    val lr = SimilarityQueries.sharedLexRank(spark, sf)
    assert(lr eq SimilarityQueries.sharedLexRank(spark, sf))
    // unmemoized reconstruction — the exact chain both queries fused
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
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
    val lw = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("lex_score").desc, col("doc_id"))
    sameRows(lr, lex.withColumn("lex_rank", row_number().over(lw))
      .select("qid", "doc_id", "lex_rank"))
  }

  test("perplexity model memo equals a fresh training run; knob is downstream") {
    val (m, b, o) = SelectionQueries.pplxModel(spark, sf)
    val (m2, b2, o2) = SelectionQueries.pplxModel(spark, sf)
    assert((m eq m2) && (b eq b2) && (o eq o2),
      "same (session, dataset) must reuse ONE model artifact")
    def q309(): String = SelectionQueries
      .queries("q309_bigram_perplexity")(spark, sf)
      .collect().map(_.toString).sorted.mkString("|")
    val before = q309()
    // the backoff knob lives in the scoring ladder — a red-case run
    // shares the knob-free model pin and must not poison production
    val mutated = graft.Mutations.withMutation("q309_backoff_skips_context") {
      val (mm, _, _) = SelectionQueries.pplxModel(spark, sf)
      assert(mm eq m, "the knob-free model must be shared with red-case runs")
      q309()
    }
    assert(mutated != before, "backoff knob must still redden off the shared model")
    assert(q309() == before, "red-case run must not poison the model pin")
  }

  test("incremental BM25 ledger equals a from-scratch build; q345 knob bypasses it") {
    // the ledger is built THROUGH the incremental path (standing base
    // index + delta tokenize + merged stats); equality with the
    // from-scratch ranking is the incremental == rebuild witness at
    // spec level (the oracle re-checks it end to end)
    val ledger = TextQueries.sharedDocBm25Top20(spark, sf)
    val scratch = TextQueries.bm25TopK(
      graft.Tables.documents(spark, sf).select("doc_id", "text"),
      col("doc_id") % 50 === 0, 20)
    assert(ledger.exceptAll(scratch).isEmpty && scratch.exceptAll(ledger).isEmpty,
      "incrementally built ledger must equal the from-scratch ranking")
    def q345(): String = TextQueries
      .queries("q345_incremental_bm25")(spark, sf)
      .collect().map(_.toString).sorted.mkString("|")
    val before = q345()
    val mutated = graft.Mutations.withMutation("q345_stats_not_refreshed")(q345())
    assert(mutated != before, "stale-stats knob must still redden")
    assert(q345() == before, "red-case run must not poison the ledger")
  }
}
