package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 scratch: stage decompositions of the PPJoin family for the
  * Lab harness (package-private access to DedupQueries seams) —
  * the evidence harness behind OPTIMIZATION_r18.md. */
object DedupLab {
  type Timer = String => (=> DataFrame) => Unit

  private def q149Corpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "text")
    val planted = base.filter(col("doc_id") % 89 === 2)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 12)
      .select((col("doc_id") + 7000000L).as("doc_id"),
        concat_ws(" ", expr("slice(ws, 3, size(ws) - 2)")).as("text"))
    base.unionByName(planted)
  }

  def q149Stages(s: SparkSession, d: String, time: Timer): Unit = {
    val c = q149Corpus(s, d)
    val toks = DedupQueries.shingles(c).withColumnRenamed("shingle", "w")
    val tNum = 3; val tDen = 5
    time("toks_distinct")(toks)
    val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq)
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    time("sizes")(sizes)
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("w"))
    val prefix = toks.join(dfreq, "w").join(sizes, "doc_id")
      .withColumn("pos", row_number().over(pw))
      .filter(col("pos") <=
        col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
      .select(col("doc_id"), col("w"), col("sz"))
    time("prefix_window")(prefix)
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * tNum <= col("b.sz") * tDen &&
          col("b.sz") * tNum <= col("a.sz") * tDen)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .distinct()
    time("cands_selfjoin")(cands)
    val sets = toks.groupBy("doc_id").agg(collect_list(col("w")).as("ss"))
    time("sets_collect")(sets)
    time("full_q149")(DedupQueries.prefixJaccardPairs(q149Corpus(s, d), 3, 5)
      .orderBy("id1", "id2"))
  }

  /** In-row prototype: per-doc DISTINCT shingle ARRAY computed map-side
    * (no distinct exchange, no sizes aggregate, no collect_list). */
  private def docShingleArrays(corpus: DataFrame): DataFrame =
    corpus.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(1, size(ws) - 2),
           i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
                          element_at(ws, i + 2))))""").as("arr"))

  def q149xStages(s: SparkSession, d: String, time: Timer): Unit = {
    val c = q149Corpus(s, d)
    val tNum = 3; val tDen = 5
    val docsArr = docShingleArrays(c)
    time("x_docsArr")(docsArr)
    val toks = docsArr.select(col("doc_id"), expr("size(arr)").as("sz"),
      explode(col("arr")).as("w"))
    val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
    time("x_dfreq")(dfreq)
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("w"))
    val prefix = toks.join(dfreq, "w")
      .withColumn("pos", row_number().over(pw))
      .filter(col("pos") <=
        col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
      .select(col("doc_id"), col("w"), col("sz"))
    time("x_prefix")(prefix)
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * tNum <= col("b.sz") * tDen &&
          col("b.sz") * tNum <= col("a.sz") * tDen)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .distinct()
    time("x_cands")(cands)
    val interCol = size(array_intersect(col("sa"), col("sb"))).cast("long")
    val full = cands
      .join(docsArr.select(col("doc_id").as("id1"), col("arr").as("sa")), "id1")
      .join(docsArr.select(col("doc_id").as("id2"), col("arr").as("sb")), "id2")
      .withColumn("inter", interCol)
      .filter(col("inter") * (tNum + tDen) >= (col("sz1") + col("sz2")) * tNum)
      .select(col("id1"), col("id2"), col("inter"),
        (col("sz1") + col("sz2") - col("inter")).as("union_sz"),
        expr("(inter * 10000) DIV (sz1 + sz2 - inter)").as("jacc_bp"))
      .orderBy("id1", "id2")
    time("x_full_q149")(full)
  }

  /** Pin-toks prototype: the distinct token table is localCheckpointed
    * ONCE inside the query (fresh per invocation), so its 6 plan
    * consumers read a pinned RDD instead of re-decoding the distinct
    * exchange per stage. */
  def q149pStages(s: SparkSession, d: String, time: Timer): Unit = {
    val tNum = 3; val tDen = 5
    def full(): DataFrame = {
      val c = q149Corpus(s, d)
      val toks = GraphOps.pin(
        DedupQueries.shingles(c).withColumnRenamed("shingle", "w")).df
      val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("w"))
      val szw = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val prefix = toks.join(dfreq, "w")
        .withColumn("sz", count(lit(1)).over(szw))
        .withColumn("pos", row_number().over(pw))
        .filter(col("pos") <=
          col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
        .select(col("doc_id"), col("w"), col("sz"))
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") * tNum <= col("b.sz") * tDen &&
            col("b.sz") * tNum <= col("a.sz") * tDen)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          col("a.sz").as("sz1"), col("b.sz").as("sz2"))
        .distinct()
      val sets = toks.groupBy("doc_id").agg(collect_list(col("w")).as("ss"))
      val interCol = size(array_intersect(col("sa"), col("sb"))).cast("long")
      cands
        .join(sets.select(col("doc_id").as("id1"), col("ss").as("sa")), "id1")
        .join(sets.select(col("doc_id").as("id2"), col("ss").as("sb")), "id2")
        .withColumn("inter", interCol)
        .filter(col("inter") * (tNum + tDen) >= (col("sz1") + col("sz2")) * tNum)
        .select(col("id1"), col("id2"), col("inter"),
          (col("sz1") + col("sz2") - col("inter")).as("union_sz"),
          expr("(inter * 10000) DIV (sz1 + sz2 - inter)").as("jacc_bp"))
        .orderBy("id1", "id2")
    }
    time("p_full_q149_pin_szw")(full())
    time("p_full_q149_pin_szw2")(full())
  }

  /** PPJoin positional-filter prototype (Xiao et al. WWW'08): lossless
    * candidate prune in the self-join ON clause. */
  def q149posStages(s: SparkSession, d: String, time: Timer): Unit = {
    val tNum = 3; val tDen = 5
    def cands(posFilter: Boolean): DataFrame = {
      val c = q149Corpus(s, d)
      val toks = DedupQueries.shingles(c).withColumnRenamed("shingle", "w")
      val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("w"))
      val prefix = toks.join(dfreq, "w").join(sizes, "doc_id")
        .withColumn("pos", row_number().over(pw))
        .filter(col("pos") <=
          col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
        .select(col("doc_id"), col("w"), col("sz"), col("pos"))
      val base = col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * tNum <= col("b.sz") * tDen &&
        col("b.sz") * tNum <= col("a.sz") * tDen
      val posb = (least(col("a.pos"), col("b.pos")) +
        least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))) *
        (tNum + tDen) >= (col("a.sz") + col("b.sz")) * tNum
      prefix.as("a").join(prefix.as("b"), if (posFilter) base && posb else base)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          col("a.sz").as("sz1"), col("b.sz").as("sz2"))
        .distinct()
    }
    def full(posFilter: Boolean): DataFrame = {
      val c = q149Corpus(s, d)
      val toks = DedupQueries.shingles(c).withColumnRenamed("shingle", "w")
      val sets = toks.groupBy("doc_id").agg(collect_list(col("w")).as("ss"))
      val interCol = size(array_intersect(col("sa"), col("sb"))).cast("long")
      cands(posFilter)
        .join(sets.select(col("doc_id").as("id1"), col("ss").as("sa")), "id1")
        .join(sets.select(col("doc_id").as("id2"), col("ss").as("sb")), "id2")
        .withColumn("inter", interCol)
        .filter(col("inter") * (tNum + tDen) >= (col("sz1") + col("sz2")) * tNum)
        .select(col("id1"), col("id2"), col("inter"),
          (col("sz1") + col("sz2") - col("inter")).as("union_sz"),
          expr("(inter * 10000) DIV (sz1 + sz2 - inter)").as("jacc_bp"))
        .orderBy("id1", "id2")
    }
    println("[lab] cand rows no-pos: " + cands(false).count() +
      "  with-pos: " + cands(true).count())
    time("pos_cands_nofilter")(cands(false))
    time("pos_cands_filter")(cands(true))
    time("pos_full_nofilter")(full(false))
    time("pos_full_filter")(full(true))
  }

  /** collect_set restructure: ONE doc_id exchange builds the per-doc
    * distinct shingle ARRAY (collect_set over the raw stream, partials
    * dedup map-side); toks / sz / verify arrays all derive from it —
    * the distinct exchange, the sizes aggregate + join, and the separate
    * sets aggregate drop out (6 shuffle exchanges → 4). */
  def q149csStages(s: SparkSession, d: String, time: Timer): Unit = {
    val tNum = 3; val tDen = 5
    def full(): DataFrame = {
      val c = q149Corpus(s, d)
      val sets = DedupQueries.shinglesRaw(c)
        .groupBy("doc_id").agg(collect_set(col("shingle")).as("ss"))
      val toks = sets.select(col("doc_id"), size(col("ss")).cast("long").as("sz"),
        explode(col("ss")).as("w"))
      val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("w"))
      val prefix = toks.join(dfreq, "w")
        .withColumn("pos", row_number().over(pw))
        .filter(col("pos") <=
          col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
        .select(col("doc_id"), col("w"), col("sz"))
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") * tNum <= col("b.sz") * tDen &&
            col("b.sz") * tNum <= col("a.sz") * tDen)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          col("a.sz").as("sz1"), col("b.sz").as("sz2"))
        .distinct()
      val interCol = size(array_intersect(col("sa"), col("sb"))).cast("long")
      cands
        .join(sets.select(col("doc_id").as("id1"), col("ss").as("sa")), "id1")
        .join(sets.select(col("doc_id").as("id2"), col("ss").as("sb")), "id2")
        .withColumn("inter", interCol)
        .filter(col("inter") * (tNum + tDen) >= (col("sz1") + col("sz2")) * tNum)
        .select(col("id1"), col("id2"), col("inter"),
          (col("sz1") + col("sz2") - col("inter")).as("union_sz"),
          expr("(inter * 10000) DIV (sz1 + sz2 - inter)").as("jacc_bp"))
        .orderBy("id1", "id2")
    }
    time("cs_full_q149")(full())
    time("cs_full_q149_b")(full())
    time("old_full_q149")(DedupQueries.prefixJaccardPairs(q149Corpus(s, d), 3, 5)
      .orderBy("id1", "id2"))
  }

  /** sz-via-window, nothing else changed: count(*) over the SAME doc_id
    * window exchange the prefix rank already pays, dropping the sizes
    * aggregate + its join (the q149p experiment minus the pin). */
  def q149wStages(s: SparkSession, d: String, time: Timer): Unit = {
    val tNum = 3; val tDen = 5
    def full(): DataFrame = {
      val c = q149Corpus(s, d)
      val toks = DedupQueries.shingles(c).withColumnRenamed("shingle", "w")
      val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("w"))
      val szw = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val prefix = toks.join(dfreq, "w")
        .withColumn("sz", count(lit(1)).over(szw))
        .withColumn("pos", row_number().over(pw))
        .filter(col("pos") <=
          col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
        .select(col("doc_id"), col("w"), col("sz"))
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") * tNum <= col("b.sz") * tDen &&
            col("b.sz") * tNum <= col("a.sz") * tDen)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          col("a.sz").as("sz1"), col("b.sz").as("sz2"))
        .distinct()
      val sets = toks.groupBy("doc_id").agg(collect_list(col("w")).as("ss"))
      val interCol = size(array_intersect(col("sa"), col("sb"))).cast("long")
      cands
        .join(sets.select(col("doc_id").as("id1"), col("ss").as("sa")), "id1")
        .join(sets.select(col("doc_id").as("id2"), col("ss").as("sb")), "id2")
        .withColumn("inter", interCol)
        .filter(col("inter") * (tNum + tDen) >= (col("sz1") + col("sz2")) * tNum)
        .select(col("id1"), col("id2"), col("inter"),
          (col("sz1") + col("sz2") - col("inter")).as("union_sz"),
          expr("(inter * 10000) DIV (sz1 + sz2 - inter)").as("jacc_bp"))
        .orderBy("id1", "id2")
    }
    time("w_full_q149")(full())
    time("w_full_q149_b")(full())
    time("old_full_q149")(DedupQueries.prefixJaccardPairs(q149Corpus(s, d), 3, 5)
      .orderBy("id1", "id2"))
    time("old_full_q149_b")(DedupQueries.prefixJaccardPairs(q149Corpus(s, d), 3, 5)
      .orderBy("id1", "id2"))
  }

  /** Candidate-doc selectivity: what fraction of docs (and of token rows)
    * survive a semi-join against the candidate-pair doc ids — the §3.2
    * prefilter's upper-bound win for the verify (collect_list) leg. */
  def selectivity(s: SparkSession, d: String): Unit = {
    def report(tag: String, toks: DataFrame, cands: DataFrame): Unit = {
      val candDocs = cands.select(col("id1").as("doc_id"))
        .unionByName(cands.select(col("id2").as("doc_id"))).distinct()
      val nDocs = toks.select("doc_id").distinct().count()
      val nCand = candDocs.count()
      val nToks = toks.count()
      val nToksF = toks.join(broadcast(candDocs), Seq("doc_id"), "leftsemi").count()
      println(f"[lab] $tag%-10s docs=$nDocs%8d candDocs=$nCand%8d (${100.0 * nCand / nDocs}%5.1f%%)  toks=$nToks%9d after=$nToksF%9d (${100.0 * nToksF / nToks}%5.1f%%)")
    }
    // q149
    locally {
      val c = q149Corpus(s, d)
      val toks = DedupQueries.shingles(c).withColumnRenamed("shingle", "w")
      val tNum = 3; val tDen = 5
      val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("w"))
      val prefix = toks.join(dfreq, "w").join(sizes, "doc_id")
        .withColumn("pos", row_number().over(pw))
        .filter(col("pos") <=
          col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
        .select(col("doc_id"), col("w"), col("sz"))
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") * tNum <= col("b.sz") * tDen &&
            col("b.sz") * tNum <= col("a.sz") * tDen)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      report("q149", toks, cands)
    }
    // q210 truth leg (t = 1/2)
    locally {
      val sampled = Tables.documents(s, d).select("doc_id", "text")
        .filter(expr(s"(${DedupQueries.q210DrawSql}) < ${DedupQueries.Q210SampleThresh}"))
      val c = DedupQueries.corpusFrom(sampled)
      val toks = DedupQueries.shingles(c).withColumnRenamed("shingle", "w")
      val tNum = 1; val tDen = 2
      val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("w"))
      val prefix = toks.join(dfreq, "w").join(sizes, "doc_id")
        .withColumn("pos", row_number().over(pw))
        .filter(col("pos") <=
          col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
        .select(col("doc_id"), col("w"), col("sz"))
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") * tNum <= col("b.sz") * tDen &&
            col("b.sz") * tNum <= col("a.sz") * tDen)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      report("q210truth", toks, cands)
    }
    // q205 LSH verify leg
    locally {
      val c0 = DedupQueries.corpus(s, d)
      val c1 = DedupPipeline.exactDedup(c0, "doc_id", "text")
        .select(col("doc_id"), col("text"))
      val sh = DedupQueries.shinglesOf(c1)
      val pairs = DedupQueries.candidatePairsOf(DedupQueries.shinglesRawOf(c1))
        .select(col("id1"), col("id2"))
      report("q205lsh", sh.withColumnRenamed("shingle", "w"), pairs)
    }
    // q179 containment (one-sided: id1 side is the contained candidate)
    locally {
      val base = Tables.documents(s, d).select("doc_id", "text")
      val planted = base.filter(col("doc_id") % 97 === 3)
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 16)
        .select((col("doc_id") + 8000000L).as("doc_id"),
          concat_ws(" ", expr("slice(ws, 1, size(ws) DIV 2)")).as("text"))
      val corpus = base.unionByName(planted)
      val toks = DedupQueries.shingles(corpus).withColumnRenamed("shingle", "w")
      val tNum = 9; val tDen = 10
      val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("w"))
      val prefix = toks.join(dfreq, "w").join(sizes, "doc_id")
        .withColumn("pos", row_number().over(pw))
        .filter(col("pos") <=
          col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
        .select(col("doc_id"), col("w"), col("sz"))
      val full = toks.join(sizes, "doc_id")
      val cands = prefix.as("a").join(full.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") =!= col("b.doc_id") &&
            col("b.sz") * tDen >= col("a.sz") * tNum)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      report("q179", toks, cands)
    }
  }

  def q210Stages(s: SparkSession, d: String, time: Timer): Unit = {
    val sampled = Tables.documents(s, d).select("doc_id", "text")
      .filter(expr(s"(${DedupQueries.q210DrawSql}) < ${DedupQueries.Q210SampleThresh}"))
    val c = DedupQueries.corpusFrom(sampled)
    val sh = DedupQueries.shingles(c)
    time("shingles")(sh)
    val truth = DedupQueries.prefixJaccardPairsFromToks(
      sh.withColumnRenamed("shingle", "w"), 1, 2).select("id1", "id2")
    time("truth_ppjoin")(truth)
    val cand = DedupQueries.candidatePairs(
      DedupQueries.bandTable(DedupQueries.minhash(sh)))
    time("cand_bands")(cand)
    time("full_q210")(graft.SparkEntry.queries("q210_lsh_eval")(s, d))
  }

  def q205Stages(s: SparkSession, d: String, time: Timer): Unit = {
    val c0 = DedupQueries.corpus(s, d)
    time("corpus")(c0)
    val c1 = DedupPipeline.exactDedup(c0, "doc_id", "text")
    time("exactDedup")(c1)
    val corpus = c1.select(col("doc_id"), col("text"))
    val shRaw = DedupQueries.shinglesRawOf(corpus)
    val pairs = DedupQueries.candidatePairsOf(shRaw)
    time("lsh_pairs")(pairs)
    val jac = DedupQueries.jaccardOf(pairs, DedupQueries.shinglesOf(corpus))
    time("jaccard_verify")(jac)
    val c2 = DedupPipeline.nearDedup(c1, "doc_id", "text", 0.9)
    time("nearDedup")(c2)
    time("full_q205")(graft.SparkEntry.queries("q205_dedup_funnel")(s, d))
  }

  def q179Stages(s: SparkSession, d: String, time: Timer): Unit = {
    val base = Tables.documents(s, d).select("doc_id", "text")
    val planted = base.filter(col("doc_id") % 97 === 3)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 16)
      .select((col("doc_id") + 8000000L).as("doc_id"),
        concat_ws(" ", expr("slice(ws, 1, size(ws) DIV 2)")).as("text"))
    val corpus = base.unionByName(planted)
    val toks = DedupQueries.shingles(corpus).withColumnRenamed("shingle", "w")
    time("toks")(toks)
    val tNum = 9; val tDen = 10
    val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("w"))
    val prefix = toks.join(dfreq, "w").join(sizes, "doc_id")
      .withColumn("pos", row_number().over(pw))
      .filter(col("pos") <=
        col("sz") - expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen") + 1)
      .select(col("doc_id"), col("w"), col("sz"))
    time("prefix")(prefix)
    val full = toks.join(sizes, "doc_id")
    time("full_side")(full)
    val cands = prefix.as("a").join(full.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.sz") * tDen >= col("a.sz") * tNum)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sz").as("sz1"))
      .distinct()
    time("cands")(cands)
    time("full_q179")(graft.SparkEntry.queries("q179_containment_join")(s, d))
  }
}
