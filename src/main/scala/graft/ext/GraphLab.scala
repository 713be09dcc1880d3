package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 scratch: HITS / iterative-loop pinning experiments (guide
  * §5 — per-round plan-tree truncation vs AQE stage reuse) —
  * the evidence harness behind OPTIMIZATION_r18.md. */
object GraphLab {
  type Timer = String => (=> DataFrame) => Unit

  /** q199 hash-leg A/B (verdict item 7): FastMd5 vs interpreted md5 on
    * the token map stage, amplified 5x so the per-token hash dominates
    * the fixed costs; plus a distinct-vocab variant that hashes each
    * WORD once and broadcast-joins buckets back onto the stream. */
  def q199hash(s: SparkSession, d: String, time: Timer): Unit = {
    val docs = graft.Tables.documents(s, d).select("doc_id", "lang", "text")
    val big = (1 to 5).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val nBuckets = 64
    def tokFast(src: DataFrame) = src
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .withColumn("m", graft.functions.FastMd5.fastMd5(col("word")))
      .withColumn("b", expr(s"${graft.ops.md5Bits32("m")} % $nBuckets"))
      .select("doc_id", "lang", "b")
    def tokSlow(src: DataFrame) = src
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .withColumn("m", md5(col("word")))
      .withColumn("b", expr(s"${graft.ops.md5Bits32("m")} % $nBuckets"))
      .select("doc_id", "lang", "b")
    def tokVocab(src: DataFrame) = {
      val words = src.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      val vocab = words.select("word").distinct()
        .withColumn("m", graft.functions.FastMd5.fastMd5(col("word")))
        .withColumn("b", expr(s"${graft.ops.md5Bits32("m")} % $nBuckets"))
        .select("word", "b")
      words.join(broadcast(vocab), "word").select("doc_id", "lang", "b")
    }
    def agg(tok: DataFrame) =
      tok.groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("n_db"))
    time("q199_fast_5x")(agg(tokFast(big)))
    time("q199_slow_5x")(agg(tokSlow(big)))
    time("q199_vocab_5x")(agg(tokVocab(big)))
    time("q199_fast_5x_b")(agg(tokFast(big)))
    time("q199_slow_5x_b")(agg(tokSlow(big)))
    time("q199_vocab_5x_b")(agg(tokVocab(big)))
    time("q199_full_now")(graft.SparkEntry.queries("q199_dsir_importance")(s, d))
  }

  /** q120 pagerank: production (no per-round pin, AQE reuse) vs
    * pin-ranks-per-round (verdict item 8 — localCheckpoint the
    * loop-carried frame). */
  def q120(s: SparkSession, d: String, time: Timer): Unit = {
    val g = GraphQueries.tradeGraph(s, d)
    def finish(ranks: DataFrame): DataFrame =
      ranks.select(
          concat(when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")),
            expr("node DIV 2").cast("string")).as("node"),
          (col("r").cast("double") / lit(1e9)).as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(20)
    def build(pinRounds: Boolean): DataFrame = {
      val ebase = g.ebase
      val e = ebase.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(ebase.select(col("supp").as("src"), col("cust").as("dst")))
      val od = g.deg.select(col("node").as("src"), col("dg").as("outdeg"))
      val ew = e.join(od, "src")
      val nodes = g.deg.select(col("node"))
      var ranks = nodes.withColumn("r", lit(1000000000L))
      var prev: GraphOps.Pinned = null
      for (_ <- 1 to GraphQueries.PageRankRounds) {
        val contrib = ew.join(ranks, col("src") === col("node"))
          .groupBy("dst").agg(sum(expr("r DIV outdeg")).as("cs"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            expr(GraphQueries.dampedUpdate("150000000")).as("r"))
        if (pinRounds) {
          val p = GraphOps.pin(ranks)
          if (prev != null) prev.free()
          prev = p; ranks = p.df
        }
      }
      finish(ranks)
    }
    time("q120_prod")(build(false))
    time("q120_prod_b")(build(false))
    time("q120_pin")(build(true))
    time("q120_pin_b")(build(true))
  }

  /** q144/q235/q211: the loop frame is referenced TWICE per round
    * (relax-join + union, or msgs-join + census), the q202 blowup shape
    * — A/B per-round pin vs production. */
  def doubleRefLoops(s: SparkSession, d: String, time: Timer): Unit = {
    val g = GraphQueries.tradeGraph(s, d)

    def bfs(pin: Boolean): DataFrame = {
      val ebase = g.ebase
      val e = ebase.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(ebase.select(col("supp").as("src"), col("cust").as("dst")))
      val nodes = g.deg.select(col("node"))
      val sources = graft.Tables.supplier(s, d)
        .filter(col("s_nationkey") % 5 === 3)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      var dist = nodes
        .join(sources.withColumn("z", lit(0L)), Seq("node"), "left")
        .select(col("node"), coalesce(col("z"), lit(GraphQueries.BfsInf)).as("dist"))
      var prev: GraphOps.Pinned = null
      for (_ <- 1 to GraphQueries.BfsRounds) {
        val relax = e.join(dist.filter(col("dist") < GraphQueries.BfsInf),
            col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
        dist = dist.unionByName(relax)
          .groupBy("node").agg(min(col("dist")).as("dist"))
        if (pin) {
          val p = GraphOps.pin(dist)
          if (prev != null) prev.free()
          prev = p; dist = p.df
        }
      }
      def render(c: String) = concat(
        when(col(c) % 2 === 0, lit("c")).otherwise(lit("s")),
        expr(s"CAST($c DIV 2 AS STRING)"))
      dist.groupBy("dist").agg(count(lit(1)).as("n_nodes"),
          min(render("node")).as("first_node"))
        .orderBy("dist")
    }

    def sssp(pin: Boolean): DataFrame = {
      val e = g.ebase.withColumn("cost", expr("1 + 100 DIV n_ord"))
        .select(col("cust").as("src"), col("supp").as("dst"), col("cost"))
        .unionByName(g.ebase.withColumn("cost", expr("1 + 100 DIV n_ord"))
          .select(col("supp").as("src"), col("cust").as("dst"), col("cost")))
      val nodes = g.deg.select(col("node"))
      val sources = graft.Tables.supplier(s, d)
        .filter(col("s_nationkey") % 5 === 3)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      var dist = nodes
        .join(sources.withColumn("z", lit(0L)), Seq("node"), "left")
        .select(col("node"), coalesce(col("z"), lit(GraphQueries.SsspInf)).as("dist"))
      var prev: GraphOps.Pinned = null
      for (_ <- 1 to GraphQueries.SsspRounds) {
        val relax = e.join(dist.filter(col("dist") < GraphQueries.SsspInf),
            col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + col("cost")).as("dist"))
        dist = dist.unionByName(relax)
          .groupBy("node").agg(min(col("dist")).as("dist"))
        if (pin) {
          val p = GraphOps.pin(dist)
          if (prev != null) prev.free()
          prev = p; dist = p.df
        }
      }
      dist.groupBy(expr(s"CASE WHEN dist >= ${GraphQueries.SsspInf} THEN -1 ELSE dist DIV 10 END").as("decile"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("dist")).as("min_dist"),
          min(col("node")).as("first_node"), max(col("node")).as("last_node"))
        .orderBy("decile")
    }

    def lpa(pin: Boolean): DataFrame = {
      val bb = GraphQueries.sharedSupplierBackbone(s, d)
      val adj = bb.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(bb.select(col("v").as("src"), col("u").as("dst")))
      var lab = adj.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
      val rounds = (1 to GraphQueries.LpaRounds).map { k =>
        val msgs = adj.join(lab, col("dst") === col("node"))
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("src")).orderBy(col("c").desc, col("lbl"))
        lab = msgs.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("src").as("node"), col("lbl"))
        // every round's census reads that round's lab at the FINAL
        // action, so no pin may be freed before then — pins stay live
        if (pin) { lab = GraphOps.pin(lab).df }
        val sizes = lab.groupBy("lbl").agg(count(lit(1)).as("n"))
        val agg1 = sizes.agg(count(lit(1)).as("n_communities"),
          max(col("n")).as("largest_size"))
        sizes.crossJoin(broadcast(agg1))
          .groupBy("n_communities", "largest_size")
          .agg(min(when(col("n") === col("largest_size"), col("lbl")))
            .as("top_community"))
          .select(lit(k).as("round"), col("n_communities"),
            col("largest_size"), col("top_community"))
      }
      rounds.reduce(_ unionByName _).orderBy("round")
    }

    time("q144_prod")(bfs(false))
    time("q144_prod_b")(bfs(false))
    time("q144_pin")(bfs(true))
    time("q144_pin_b")(bfs(true))
    time("q235_prod")(sssp(false))
    time("q235_prod_b")(sssp(false))
    time("q235_pin")(sssp(true))
    time("q235_pin_b")(sssp(true))
    time("q211_prod")(lpa(false))
    time("q211_prod_b")(lpa(false))
    time("q211_pin")(lpa(true))
    time("q211_pin_b")(lpa(true))
  }

  /** q202 variants: production (no pin), per-round pin of both score
    * vectors, and pin + single-window normalization. */
  def q202(s: SparkSession, d: String, time: Timer): Unit = {
    val g = GraphQueries.tradeGraph(s, d)

    def finish(h: DataFrame, a: DataFrame): DataFrame = {
      val hubs = h.select(
          concat(lit("c"), col("cust").cast("string")).as("node"),
          lit("hub").as("kind"),
          (col("h").cast("double") / 1e6).as("score"))
        .orderBy(col("score").desc, col("node")).limit(10)
      val auths = a.select(
          concat(lit("s"), col("supp").cast("string")).as("node"),
          lit("authority").as("kind"),
          (col("a").cast("double") / 1e6).as("score"))
        .orderBy(col("score").desc, col("node")).limit(10)
      hubs.unionByName(auths)
        .orderBy(col("kind"), col("score").desc, col("node"))
    }

    def prod(): DataFrame = {
      val e = g.ebase.select(expr("cust DIV 2").as("cust"),
        expr("supp DIV 2").as("supp"))
      var h = g.deg.filter(col("node") % 2 === 0)
        .select(expr("node DIV 2").as("cust")).withColumn("h", lit(1000000L))
      var a: DataFrame = h
      for (_ <- 1 to GraphQueries.HitsRounds) {
        val araw = e.join(h, "cust")
          .groupBy("supp").agg(sum(col("h")).as("ar"))
        val amax = araw.agg(max(col("ar")).as("am"))
        a = araw.crossJoin(broadcast(amax))
          .select(col("supp"), expr("(ar * 1000000) DIV am").as("a"))
        val hraw = e.join(a, "supp")
          .groupBy("cust").agg(sum(col("a")).as("hr"))
        val hmax = hraw.agg(max(col("hr")).as("hm"))
        h = hraw.crossJoin(broadcast(hmax))
          .select(col("cust"), expr("(hr * 1000000) DIV hm").as("h"))
      }
      finish(h, a)
    }

    /** Per-half-step pin: each normalized score vector is
      * localCheckpointed, so the next half-step (and the final top-10)
      * read an ExistingRDD instead of re-planning the whole prefix. */
    def pinned(): DataFrame = {
      val e = g.ebase.select(expr("cust DIV 2").as("cust"),
        expr("supp DIV 2").as("supp"))
      var h = g.deg.filter(col("node") % 2 === 0)
        .select(expr("node DIV 2").as("cust")).withColumn("h", lit(1000000L))
      var a: DataFrame = h
      val pins = scala.collection.mutable.ArrayBuffer.empty[GraphOps.Pinned]
      for (_ <- 1 to GraphQueries.HitsRounds) {
        val araw = e.join(h, "cust")
          .groupBy("supp").agg(sum(col("h")).as("ar"))
        val amax = araw.agg(max(col("ar")).as("am"))
        val ap = GraphOps.pin(araw.crossJoin(broadcast(amax))
          .select(col("supp"), expr("(ar * 1000000) DIV am").as("a")))
        pins += ap; a = ap.df
        val hraw = e.join(a, "supp")
          .groupBy("cust").agg(sum(col("a")).as("hr"))
        val hmax = hraw.agg(max(col("hr")).as("hm"))
        val hp = GraphOps.pin(hraw.crossJoin(broadcast(hmax))
          .select(col("cust"), expr("(hr * 1000000) DIV hm").as("h")))
        pins += hp; h = hp.df
      }
      val out = finish(h, a)
      // NOTE: pins leak until session end in this scratch harness; the
      // production form would free them after the collect.
      out
    }

    /** Window-normalized: the per-half-step max rides a whole-frame
      * window over the raw aggregate instead of a separate scalar
      * aggregate + crossJoin (one fewer aggregate per half-step). */
    def windowed(): DataFrame = {
      val e = g.ebase.select(expr("cust DIV 2").as("cust"),
        expr("supp DIV 2").as("supp"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      var h = g.deg.filter(col("node") % 2 === 0)
        .select(expr("node DIV 2").as("cust")).withColumn("h", lit(1000000L))
      var a: DataFrame = h
      for (_ <- 1 to GraphQueries.HitsRounds) {
        a = e.join(h, "cust")
          .groupBy("supp").agg(sum(col("h")).as("ar"))
          .withColumn("am", max(col("ar")).over(wAll))
          .select(col("supp"), expr("(ar * 1000000) DIV am").as("a"))
        h = e.join(a, "supp")
          .groupBy("cust").agg(sum(col("a")).as("hr"))
          .withColumn("hm", max(col("hr")).over(wAll))
          .select(col("cust"), expr("(hr * 1000000) DIV hm").as("h"))
      }
      finish(h, a)
    }

    /** Pin only the loop-carried h per round (a only on the last round,
      * where the final auths read it) — half the materialization jobs of
      * `pinned`; window normalization drops the scalar agg + crossJoin. */
    def pinWin(): DataFrame = {
      val e = g.ebase.select(expr("cust DIV 2").as("cust"),
        expr("supp DIV 2").as("supp"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      var h = g.deg.filter(col("node") % 2 === 0)
        .select(expr("node DIV 2").as("cust")).withColumn("h", lit(1000000L))
      var a: DataFrame = h
      for (r <- 1 to GraphQueries.HitsRounds) {
        a = e.join(h, "cust")
          .groupBy("supp").agg(sum(col("h")).as("ar"))
          .withColumn("am", max(col("ar")).over(wAll))
          .select(col("supp"), expr("(ar * 1000000) DIV am").as("a"))
        if (r == GraphQueries.HitsRounds) a = GraphOps.pin(a).df
        h = GraphOps.pin(e.join(a, "supp")
          .groupBy("cust").agg(sum(col("a")).as("hr"))
          .withColumn("hm", max(col("hr")).over(wAll))
          .select(col("cust"), expr("(hr * 1000000) DIV hm").as("h"))).df
      }
      finish(h, a)
    }

    /** Scale-safe hybrid: scalar-agg + broadcast normalization (no
      * single-partition window), pinning h per round and a on the last
      * round only. */
    def pinAgg(): DataFrame = {
      val e = g.ebase.select(expr("cust DIV 2").as("cust"),
        expr("supp DIV 2").as("supp"))
      var h = g.deg.filter(col("node") % 2 === 0)
        .select(expr("node DIV 2").as("cust")).withColumn("h", lit(1000000L))
      var a: DataFrame = h
      for (r <- 1 to GraphQueries.HitsRounds) {
        val araw = e.join(h, "cust")
          .groupBy("supp").agg(sum(col("h")).as("ar"))
        val amax = araw.agg(max(col("ar")).as("am"))
        a = araw.crossJoin(broadcast(amax))
          .select(col("supp"), expr("(ar * 1000000) DIV am").as("a"))
        if (r == GraphQueries.HitsRounds) a = GraphOps.pin(a).df
        val hraw = e.join(a, "supp")
          .groupBy("cust").agg(sum(col("a")).as("hr"))
        val hmax = hraw.agg(max(col("hr")).as("hm"))
        h = GraphOps.pin(hraw.crossJoin(broadcast(hmax))
          .select(col("cust"), expr("(hr * 1000000) DIV hm").as("h"))).df
      }
      finish(h, a)
    }

    time("q202_prod")(prod())
    time("q202_prod_b")(prod())
    time("q202_pinwin")(pinWin())
    time("q202_pinwin_b")(pinWin())
    time("q202_pinagg")(pinAgg())
    time("q202_pinagg_b")(pinAgg())
  }
}
