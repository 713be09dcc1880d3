package graft.ext

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a relationship graph derived from the
  * fact tables — the web-graph/citation-style quality signal a curation
  * pipeline feeds into document scoring (link-based quality weighting).
  *
  * q120 runs [[PageRankRounds]] damped PageRank rounds over the bipartite
  * customer↔supplier trade graph (distinct (cust, supp) pairs from
  * orders ⋈ lineitem, both directions, so every node has out-degree ≥ 1
  * and no dangling-mass correction is needed for the demo).
  *
  * 100 TB design: the per-round cost is the Pregel-style message pass —
  * edges ⋈ ranks shuffles on src, the contribution aggregate shuffles on
  * dst; the edge table (the big side) carries its out-degree and can be
  * pre-partitioned by src so every round reuses one exchange. The rank
  * vector is |V| rows — orders of magnitude smaller than |E|. Nothing is
  * ever collected to the driver; rounds are a fixed unrolled count here
  * (production iterates to an L1-delta tolerance with the same plan).
  *
  * Cross-engine exactness: the recurrence runs in FIXED-POINT integer
  * arithmetic — ranks in nano-rank units (1e9 = rank 1.0), contributions
  * by truncating integer division (`DIV` ≡ DuckDB `//` for positives),
  * damping as (85·Σ) DIV 100 — so every round is bit-exact in both
  * engines with no float anywhere until the final display cast. Decimal
  * casts (the q114 pattern) were tried first and are NOT enough here: a
  * quotient like 1/1024 is exactly representable and ends in …5 at the
  * cut digit, where Spark's decimal cast (HALF_UP) and DuckDB's
  * (half-even) disagree, and double-space round() diverges too (Spark
  * rounds via exact BigDecimal, DuckDB in float arithmetic). The 1e-9
  * quantization error per edge is irrelevant to a ranking operator.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Unrolled PageRank rounds; enough to demonstrate convergence behavior
    * while keeping the oracle CTE chain readable. */
  private[ext] val PageRankRounds = 3

  /** The damped integer fixed-point update shared by q120 (global,
    * teleport = 0.15 everywhere), q243 (personalized, teleport only
    * on seeds), and q288 (TextRank over the word co-occurrence graph,
    * micro-rank units): `teleport + (85·Σ contributions) DIV 100`.
    * ONE seam so the three queries cannot drift, and so
    * [[graft.Mutations]] can plant the classic damping off-by-one
    * (85 → 86) once and cover the whole integer-fixed-point family —
    * the oracle CTEs hardcode 85, so the mutated engine diverges and
    * the harness goes red. Knob read at plan-construction time
    * (compile-time constant when off). */
  private[ext] def dampedUpdate(teleportExpr: String): String = {
    val num = if (graft.Mutations.on("q120_damping_off_by_one")) 86 else 85
    s"$teleportExpr + ($num * coalesce(cs, 0)) DIV 100"
  }

  def queries: Map[String, Q] = Map(
    "q120_pagerank" -> ((s, d) => {
      // node ids stay LONG through every shuffle (parity-encoded:
      // customers 2k, suppliers 2k+1 — disjoint even though both key
      // spaces start at 0); the display string is rendered only on the
      // final 20 rows. String keys in the per-round joins measured ~20%
      // slower end-to-end.
      // Edge table and degrees ride the shared [[tradeGraph]] ledger —
      // built once per (session, dataset), read here; for a symmetrized
      // edge set out-degree ≡ degree, so `od` IS the pinned degree table.
      // No checkpoint between rounds: AQE query-stage reuse already
      // dedups the repeated per-round exchanges.
      val g = tradeGraph(s, d)
      val ebase = g.ebase
      val e = ebase.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(ebase.select(col("supp").as("src"), col("cust").as("dst")))
      val od = g.deg.select(col("node").as("src"), col("dg").as("outdeg"))
      val ew = e.join(od, "src")
      val nodes = g.deg.select(col("node"))
      var ranks = nodes.withColumn("r", lit(1000000000L))
      for (_ <- 1 to PageRankRounds) {
        val contrib = ew.join(ranks, col("src") === col("node"))
          .groupBy("dst").agg(sum(expr("r DIV outdeg")).as("cs"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            expr(dampedUpdate("150000000")).as("r"))
      }
      ranks.select(
          concat(when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")),
            expr("node DIV 2").cast("string")).as("node"),
          (col("r").cast("double") / lit(1e9)).as("pr"))
        .orderBy(col("pr").desc, col("node")).limit(20)
    }),

    // PERSONALIZED PageRank — influence FROM a trusted seed set rather
    // than global importance: teleport mass lands only on the seeds
    // (q235's cohort — suppliers with s_nationkey % 5 = 3), so a node
    // ranks by how reachable it is from trust, the primitive behind
    // seed-based quality propagation in corpus curation (trust flows
    // from vetted domains; harmonic/PPR variants rank the crawl).
    // Same fixed-point integer discipline as q120: init 10⁹ on each
    // seed and 0 elsewhere, round r' = seed·150000000 + (85·Σ r/outdeg)
    // DIV 100 — every round bit-exact cross-engine, and non-seed nodes
    // unreachable from the seeds stay EXACTLY 0 (a float formulation
    // would leak epsilon mass everywhere). Top-20 by rank with a seed
    // flag; unlike q120's global ranks, customers trading with trusted
    // suppliers outrank globally-popular but untrusted ones.
    // Scale: identical shape to q120 — per-round edge-keyed
    // contribution shuffle + node-sized rank table; AQE stage reuse
    // dedups the repeated edge derivation (the q120 measurement).
    "q243_personalized_pagerank" -> ((s, d) => {
      // edges/degrees off the shared [[tradeGraph]] ledger (q120's note)
      val g = tradeGraph(s, d)
      val ebase = g.ebase
      val e = ebase.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(ebase.select(col("supp").as("src"), col("cust").as("dst")))
      val od = g.deg.select(col("node").as("src"), col("dg").as("outdeg"))
      val ew = e.join(od, "src")
      val seeds = Tables.supplier(s, d)
        .filter(col("s_nationkey") % 5 === 3)
        .select((col("s_suppkey") * 2 + 1).as("node"), lit(1).as("is_seed"))
      val nodes = g.deg.select(col("node"))
        .join(seeds, Seq("node"), "left")
        .select(col("node"), coalesce(col("is_seed"), lit(0)).as("is_seed"))
      var ranks = nodes.withColumn("r",
        expr("CAST(is_seed AS BIGINT) * 1000000000"))
      for (_ <- 1 to PageRankRounds) {
        val contrib = ew.join(ranks, col("src") === col("node"))
          .groupBy("dst").agg(sum(expr("r DIV outdeg")).as("cs"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"), col("is_seed"),
            expr(dampedUpdate("CAST(is_seed AS BIGINT) * 150000000"))
              .as("r"))
      }
      ranks.select(
          concat(when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")),
            expr("node DIV 2").cast("string")).as("node"),
          col("is_seed"),
          (col("r").cast("double") / lit(1e9)).as("ppr"))
        .orderBy(col("ppr").desc, col("node")).limit(20)
    }),

    // Triangle counting over the supplier co-occurrence graph (edge =
    // two suppliers served the same order), the classic O(m^{3/2})
    // degree-ordered formulation: orient every edge from the π-smaller
    // endpoint (π = (degree, id) — ties broken by id), enumerate wedges
    // only at each edge's tail, and close each wedge against the
    // oriented edge list. Every triangle is counted exactly once, at
    // its π-smallest corner, and the wedge fan-out at any node is
    // bounded by its OUT-degree under π — the heavy hub that would
    // generate deg² wedges undirected generates almost none, because
    // nearly all its edges point INTO it. π is carried as one long
    // (deg << 32 | id): pure map-side arithmetic, no global rank
    // window over the node set.
    // Scale: the co-occurrence self-join fans out quadratically only
    // within one order's supplier set (bounded by order size, ≤7 here),
    // and the raw co-occurrence graph is then SPARSIFIED to its
    // [[TriangleEdgeBudget]] heaviest edges (count-desc, (u, v)
    // tie-break — deterministic at the cutoff) before any wedge is
    // enumerated. Without the backbone the graph saturates — at sf0.1
    // the 1000 suppliers share ~450k of the ~500k possible edges and
    // Σdeg² ≈ 8×10⁸ wedges (measured: 22.8s); the fixed edge budget
    // bounds wedge work at ANY scale, the same cap discipline as the
    // LSH mega-bucket guards. The top-k itself is
    // TakeOrderedAndProject — per-partition heaps + a k-row merge,
    // never a full sort of the edge list. Wedge and closure joins then
    // shuffle only backbone-sized inputs.
    "q132_triangle_count" -> ((s, d) => {
      triangleCounts(sharedSupplierBackbone(s, d))
        .withColumnRenamed("node", "supplier")
        .orderBy(col("n_triangles").desc, col("supplier")).limit(20)
    }),

    // TWO-HOP reach over the same backbone — the friends-of-friends
    // aggregate (recommendation candidate pools, influence radii):
    // distinct suppliers within ≤ 2 edges of each node. One adjacency
    // self-join on the shared hop node produces the 2-paths; union with
    // the 1-hop edges and a distinct collapses multiplicity (a node
    // reachable both directly and through a wedge counts once); self-
    // pairs are excluded in the join condition, never post-hoc. All
    // joins shuffle backbone-sized inputs only — the q132 edge budget
    // is what bounds Σdeg², exactly as it bounds the wedge count there.
    "q173_two_hop_reach" -> ((s, d) => {
      // the 5000-row backbone feeds FOUR plan branches (two adjacency
      // directions × the x/y self-join) — the shared session pin
      // materializes the heavy co-occurrence aggregation once per
      // (session, dataset), not once per branch or per query
      val bb = sharedSupplierBackbone(s, d)
      val adj = bb.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(bb.select(col("v").as("src"), col("u").as("dst")))
      val two = adj.as("x").join(adj.as("y"),
          col("x.dst") === col("y.src") && col("x.src") =!= col("y.dst"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
      adj.unionByName(two).distinct()
        .groupBy("src").agg(count(lit(1)).as("reach_2hop"))
        .select(col("src").as("supplier"), col("reach_2hop"))
        .orderBy(col("reach_2hop").desc, col("supplier")).limit(20)
    }),

    // Multi-source BFS over the q120 trade graph: distance-from-any-
    // seed-supplier (s_nationkey % 5 = 3 — a nation cohort non-empty at
    // every fixture scale) in [[BfsRounds]] Bellman-Ford-style relaxation
    // rounds — each round is ONE edges ⋈ dist join plus a min-aggregate
    // (the Pregel message pass again, integer distances so every round
    // is bit-exact cross-engine, the q120 discipline). The distance
    // vector is |V| rows; edges carry the big side and can be
    // pre-partitioned by src so all rounds reuse one exchange. Output
    // is the per-distance census with lexicographic witness nodes.
    "q144_multisource_bfs" -> ((s, d) => {
      // edges off the shared [[tradeGraph]] ledger; the node set is the
      // pinned degree table's key column (every node appears as src in
      // the symmetrized view — same set, no distinct shuffle)
      val g = tradeGraph(s, d)
      val ebase = g.ebase
      val e = ebase.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(ebase.select(col("supp").as("src"), col("cust").as("dst")))
      val nodes = g.deg.select(col("node"))
      val sources = Tables.supplier(s, d)
        .filter(col("s_nationkey") % 5 === 3)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      var dist = nodes
        .join(sources.withColumn("z", lit(0L)), Seq("node"), "left")
        .select(col("node"), coalesce(col("z"), lit(BfsInf)).as("dist"))
      // r18 (guide §5): dist is referenced TWICE per round (frontier
      // filter + union), so the unrolled plan duplicates each round's
      // subtree — pinning the loop-carried frame keeps rounds
      // constant-size (measured 1.28->1.16 and 1.51->1.15 on two A/Bs;
      // the q202 pattern). Arithmetic unchanged; previous pins freed as
      // soon as their successor materializes.
      var prevDist: GraphOps.Pinned = null
      for (_ <- 1 to BfsRounds) {
        // frontier discipline: only REACHED nodes relax. Provably
        // result-identical (an unreached node's candidate is
        // sentinel+1, which never beats the neighbor's own sentinel in
        // the min) but the round-1 join shrinks from |E| ⋈ |V| to
        // |E| ⋈ |seeds| — the oracle keeps the unfiltered form as the
        // semantic spec.
        val relax = e.join(dist.filter(col("dist") < BfsInf),
            col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
        val p = GraphOps.pin(dist.unionByName(relax)
          .groupBy("node").agg(min(col("dist")).as("dist")))
        if (prevDist != null) prevDist.free()
        prevDist = p
        dist = p.df
      }
      def render(c: String): Column = concat(
        when(col(c) % 2 === 0, lit("c")).otherwise(lit("s")),
        expr(s"CAST($c DIV 2 AS STRING)"))
      dist.groupBy("dist")
        .agg(count(lit(1)).as("n_nodes"),
          min(col("node")).as("lo"), max(col("node")).as("hi"))
        .select(col("dist"), col("n_nodes"),
          render("lo").as("first_node"), render("hi").as("last_node"))
        .orderBy("dist")
    }),

    // WEIGHTED single-source shortest paths over the trade graph — the
    // min-plus dual of q144's hop BFS: edge cost is derived from link
    // strength (more shared orders = cheaper hop, cost = 1 + 100 DIV
    // n_orders — integer, ≥ 1), seeds are q144's nation cohort, and
    // [[SsspRounds]] Bellman-Ford relaxation rounds propagate
    // dist' = min(dist, dist[src] + cost). Integer distances, so every
    // round is bit-exact cross-engine (the q120 discipline). Output is
    // the distance-decile census with lexicographic witnesses (the q144
    // shape — stable at any scale where a per-node dump is not).
    // Scale: a round is one edges ⋈ dist join + a min-aggregate — the
    // Pregel pass; the dist vector is |V| rows and edges carry their
    // cost, pre-partitionable on src so all rounds reuse one exchange.
    "q235_weighted_sssp" -> ((s, d) => {
      // the shared [[tradeGraph]] ledger carries exactly the (cust,
      // supp, n_ord) aggregate this query needs — cost is a map-side
      // derivation of the pinned multiplicity
      val g = tradeGraph(s, d)
      val ebase = g.ebase.withColumn("cost", expr("1 + 100 DIV n_ord"))
      val e = ebase.select(col("cust").as("src"), col("supp").as("dst"), col("cost"))
        .unionByName(ebase.select(col("supp").as("src"), col("cust").as("dst"), col("cost")))
      val nodes = g.deg.select(col("node"))
      val sources = Tables.supplier(s, d)
        .filter(col("s_nationkey") % 5 === 3)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      var dist = nodes
        .join(sources.withColumn("z", lit(0L)), Seq("node"), "left")
        .select(col("node"), coalesce(col("z"), lit(SsspInf)).as("dist"))
      for (_ <- 1 to SsspRounds) {
        val relax = e.join(dist.filter(col("dist") < SsspInf),
            col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + col("cost")).as("dist"))
        dist = dist.unionByName(relax)
          .groupBy("node").agg(min(col("dist")).as("dist"))
      }
      dist.groupBy(expr(s"CASE WHEN dist >= $SsspInf THEN -1 ELSE dist DIV 10 END").as("decile"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("dist")).as("min_dist"),
          min(col("node")).as("first_node"), max(col("node")).as("last_node"))
        .orderBy("decile")
    }),

    // HITS (hubs & authorities) over the DIRECTED customer→supplier
    // trade graph — the link-analysis dual of q120's PageRank: a
    // supplier's authority is the summed hub weight of the customers
    // buying from it; a customer's hub weight is the summed authority
    // of its suppliers. [[HitsRounds]] unrolled mutual-reinforcement
    // rounds; after each half-step scores are renormalized to
    // micro-units by the step's max (the power-iteration normalization
    // that stops the recurrence growing without bound). Everything is
    // FIXED-POINT integer arithmetic — exact bigint sums, truncating
    // DIV against a broadcast one-row max — so every round is bit-exact
    // cross-engine (the q120 discipline; see its header for why decimal
    // and double rounding are NOT enough).
    // Scale: each half-step is one edges ⋈ scores shuffle keyed on the
    // join side plus a partial-aggregating groupBy — the Pregel message
    // pass. The score vectors are |V| rows; the max is a one-row
    // aggregate broadcast back (never a driver collect). Edges can be
    // pre-partitioned once on cust (and a supp-keyed copy kept) so all
    // rounds reuse two exchanges.
    "q202_hits" -> ((s, d) => {
      // the shared [[tradeGraph]] ledger stores parity-encoded ids; the
      // raw (cust, supp) keys this directed formulation ranks over are a
      // map-side DIV 2 away (cust = 2k is even, supp = 2k+1 odd — the
      // encoding is a bijection, so distinctness carries through), and
      // the customer set is the even half of the pinned degree table.
      val g = tradeGraph(s, d)
      val e = g.ebase.select(expr("cust DIV 2").as("cust"),
        expr("supp DIV 2").as("supp"))
      var h = g.deg.filter(col("node") % 2 === 0)
        .select(expr("node DIV 2").as("cust")).withColumn("h", lit(1000000L))
      var a: DataFrame = h // placeholder; HitsRounds >= 1 always reassigns
      // r18 (guide §5, GraphOps header): h is referenced TWICE per round
      // (next half-step + final hubs) and a likewise, so without lineage
      // truncation the plan tree duplicates subtrees combinatorially —
      // the unrolled 2-round plan was 576 Exchange/HashAggregate nodes
      // and the warm pass spent ~1.3s of 3.2s in AQE replanning gaps.
      // Pinning the loop-carried h each round (and a on the last round,
      // where the final auths read it) keeps every round's plan
      // constant-size: measured 2.45s -> 1.68s warm A/B on a quiet box.
      // The mutual-reinforcement arithmetic is untouched (same exact
      // integer sums, same broadcast one-row max normalization — still
      // never a driver collect, never a single-partition window); each
      // previous h pin is freed once its successor is materialized.
      var prevH: GraphOps.Pinned = null
      for (r <- 1 to HitsRounds) {
        val araw = e.join(h, "cust")
          .groupBy("supp").agg(sum(col("h")).as("ar"))
        val amax = araw.agg(max(col("ar")).as("am"))
        a = araw.crossJoin(broadcast(amax))
          .select(col("supp"), expr("(ar * 1000000) DIV am").as("a"))
        if (r == HitsRounds) a = GraphOps.pin(a).df
        val hraw = e.join(a, "supp")
          .groupBy("cust").agg(sum(col("a")).as("hr"))
        val hmax = hraw.agg(max(col("hr")).as("hm"))
        val hp = GraphOps.pin(hraw.crossJoin(broadcast(hmax))
          .select(col("cust"), expr("(hr * 1000000) DIV hm").as("h")))
        if (prevH != null) prevH.free()
        prevH = hp
        h = hp.df
      }
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
    }),

    // Synchronous label propagation (community detection) over the q132
    // supplier backbone — the cheap communities pass a curation pipeline
    // runs to group near-boilerplate SOURCES before sampling (the graph
    // dual of q54's connected components: LPA splits a connected blob
    // into dense cores instead of one giant component). Every node
    // starts labeled with itself; each of [[LpaRounds]] synchronous
    // rounds relabels every node with its neighbors' PLURALITY label —
    // count desc, label asc, so the argmax is total and the whole
    // recurrence is integer-deterministic cross-engine (the q120
    // discipline; no scores, no floats at all).
    // Scale: a round is one adj ⋈ labels shuffle keyed on dst plus a
    // (node, label) count and a per-node top-1 window — the Pregel
    // message pass again. Label vector is |V| rows; adjacency is the
    // big side and can be pre-partitioned once so every round reuses
    // its exchange. Synchronous (not async sweep) so rounds are
    // order-free and the result is partitioning-independent.
    "q211_label_propagation" -> ((s, d) => {
      // backbone feeds 2 directions × LpaRounds plan branches — read
      // the shared session pin (q173's rationale, now cross-query).
      // The OUTPUT is the per-round convergence census
      // (communities left, largest community, its label) rather than the
      // final labeling: on a dense backbone plurality labels coalesce
      // fast, and the trajectory — how fast structure collapses — is the
      // operator's production signal (it is how you pick the round
      // budget before communities merge past usefulness).
      val bb = sharedSupplierBackbone(s, d)
      val adj = bb.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(bb.select(col("v").as("src"), col("u").as("dst")))
      var lab = adj.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
      val rounds = (1 to LpaRounds).map { k =>
        val msgs = adj.join(lab, col("dst") === col("node"))
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("src")).orderBy(col("c").desc, col("lbl"))
        // r18 (guide §5): each round's labels feed BOTH the next round's
        // message join and this round's census, so without truncation
        // the plan duplicates every prior round's subtree per consumer —
        // pin per round (measured 1.28-1.97 -> 1.03-1.36 A/B, the q202
        // pattern). No pin is freed: every round's census reads its
        // round's labels at the final action. Label arithmetic unchanged.
        lab = GraphOps.pin(msgs.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("src").as("node"), col("lbl"))).df
        // census: |communities| rows reduce to ONE via a broadcast
        // one-row aggregate — no global window, no driver collect
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
    }),

    // k-CORE decomposition over the q120 bipartite trade graph — the
    // cohesion census (which customers/suppliers survive in mutually
    // dense trading cores) by iterated peeling: drop every node whose
    // current degree is below k, shrink the edge set to surviving
    // endpoints, repeat [[KCoreRounds]] synchronous rounds for
    // k ∈ {4, 8, 16} (at the smallest fixture the 16-core is EMPTY —
    // an honest "no such core" row, not an error). The BIPARTITE graph is the one with real degree
    // variance — the supplier co-occurrence graph is near-complete at
    // every fixture scale (measured: avg degree 99/100 at sf0.01), so
    // cores there are trivial. Output per k: surviving
    // core size (nodes, edges) plus a CONVERGED witness — edge count
    // unchanged over the final round — computed as a one-row cross of
    // two count aggregates, so the fixed round budget is honest: a
    // fixture where peeling hasn't settled shows converged=false and
    // fails the spec pin instead of silently reporting a non-core.
    // Scale (r17, the incremental formulation): a synchronous peel
    // round removes exactly the nodes currently below k — a FRONTIER
    // that is |V|-bounded and usually tiny (tens of nodes here) — and
    // only edges INCIDENT to that frontier change any surviving
    // degree. So the round state is (degree table, cumulative removed
    // set, edge count), all |V|-sized or smaller, and a round costs
    // one map-scan of the pinned base edges under broadcast anti/semi
    // joins (no |E|-sized shuffle, no |E|-row materialization — r16's
    // 0.707 scale exponent, the suite's steepest, was exactly those
    // per-round full-set degree aggregates + semi-joins + pins) plus
    // a |V|-keyed degree update. The broadcast hint is honest for the
    // frontier; at a scale where the CUMULATIVE removed set outgrows
    // broadcast, the identical plan runs with the hint dropped and
    // AQE picking the join side. The final census needs no edge
    // materialization at all: node count = maintained degrees > 0,
    // edge count = maintained counter, converged = counter unchanged
    // over the last executed round — the same fixed point the oracle
    // unrolls declaratively.
    // Cores NEST (16-core ⊆ 8-core ⊆ 4-core) and the peel operator is
    // MONOTONE (E ⊆ F ⟹ peelₖ(E) ⊆ peelₖ(F), and peelₖ(E) ⊇ k-core
    // whenever E ⊇ k-core), so each k peels from the PREVIOUS k's
    // converged core instead of the full graph: the chained round
    // state is sandwiched between the k-core and the full-graph round
    // state at every round, so the fixed point, the round budget, and
    // the converged witness are all unchanged — while the later ks'
    // degree aggregates and semi-joins run over the (much smaller)
    // prior core instead of re-peeling the base edge set (r14 verdict
    // item 1: the full-graph re-peel was a 2-3× constant-factor tax on
    // the suite's most expensive query).
    "q230_kcore" -> ((s, d) => {
      // INCREMENTAL peel off the shared [[tradeGraph]] ledger: degrees
      // start as the ledger's pinned table (r16 verdict item 4 — the
      // full-set round-1 aggregate is gone) and each round maintains
      // them by subtracting only the edges the removed frontier takes
      // with it. The chained-k state (degrees, removed set, edge count)
      // carries across k ∈ {4, 8, 16} exactly like the old chained
      // cores — same fixed point, same converged witness. Removing a
      // node removes exactly its incident edges, so the maintained
      // degree of a survivor is its degree within the surviving edge
      // set BY INDUCTION — the invariant the memo-identity spec pins.
      val peelOffByOne = graft.Mutations.on("q230_peel_off_by_one")
      val g = tradeGraph(s, d)
      val bb = g.ebase.select(col("cust").as("u"), col("supp").as("v"))
      var deg: GraphOps.Pinned = g.degrees // SHARED pin — never freed here
      var degShared = true
      var removedAll: Option[GraphOps.Pinned] = None
      var eN = g.nEdges
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Long, Long, Boolean)]
      for (k <- Seq(4, 8, 16)) {
        var settled = false
        var r = 0
        var eNPrev = eN
        while (r < KCoreRounds && !settled) {
          r += 1
          eNPrev = eN
          // [[graft.Mutations]]: peel with > instead of >= — in removal
          // form, remove <= k instead of < k — computes the (k+1)-core
          // under the k label, the strictness off-by-one every peeling
          // implementation risks
          val rem = GraphOps.pin(deg.df.filter(
            if (peelOffByOne) col("dg") <= k else col("dg") < k)
            .select("node"))
          if (rem.n == 0) { settled = true; rem.free() }
          else {
            // surviving edge set = pinned base minus every node removed
            // so far — a map-scan under broadcast anti joins, evaluated
            // only to find the frontier's incident edges (never
            // materialized as a new |E|-row pin)
            val alive = removedAll match {
              case None => bb
              case Some(ra) => bb
                .join(broadcast(ra.df.select(col("node").as("u"))),
                  Seq("u"), "left_anti")
                .join(broadcast(ra.df.select(col("node").as("v"))),
                  Seq("v"), "left_anti")
            }
            // edges the frontier takes with it, flagged per endpoint
            val re = GraphOps.pin(alive
              .join(broadcast(rem.df.select(col("node").as("u"),
                lit(1).as("ru"))), Seq("u"), "left")
              .join(broadcast(rem.df.select(col("node").as("v"),
                lit(1).as("rv"))), Seq("v"), "left")
              .filter(col("ru").isNotNull || col("rv").isNotNull))
            eN -= re.n
            // each lost edge decrements its SURVIVING endpoint (an edge
            // with both endpoints removed decrements nobody)
            val loss = re.df.select(
                when(col("ru").isNotNull && col("rv").isNull, col("v"))
                  .when(col("rv").isNotNull && col("ru").isNull, col("u"))
                  .as("node"))
              .filter(col("node").isNotNull)
              .groupBy("node").agg(count(lit(1)).as("l"))
            val nd = GraphOps.pin(deg.df
              .join(rem.df, Seq("node"), "left_anti")
              .join(loss, Seq("node"), "left")
              .select(col("node"),
                (col("dg") - coalesce(col("l"), lit(0L))).as("dg")))
            re.free()
            val na = GraphOps.pin(removedAll match {
              case None => rem.df
              case Some(ra) => ra.df.unionByName(rem.df)
            })
            removedAll.foreach(_.free())
            rem.free()
            removedAll = Some(na)
            if (!degShared) deg.free()
            deg = nd
            degShared = false
          }
        }
        // census off the maintained state: a surviving node is in the
        // core iff it still has a live edge (dg > 0 — at settle all
        // survivors are >= k anyway; the filter also covers a budget-
        // exhausted fixture honestly)
        val nNodes = deg.df.filter(col("dg") > 0).count()
        out += ((k, nNodes, eN, eN == eNPrev))
      }
      if (!degShared) deg.free()
      removedAll.foreach(_.free())
      import s.implicits._
      out.toSeq.toDF("k", "n_core_nodes", "n_core_edges", "converged")
        .orderBy("k")
    }),

    // LOCAL CLUSTERING COEFFICIENT census — the cohesion metric the
    // triangle COUNT (q132) doesn't give: a hub with 50 triangles over
    // 1000 possible wedges is sparse; a 5-degree node with 10 is a
    // clique. Per node, coeff = 2·tri / (deg·(deg−1)) in truncating
    // bp; the census bands nodes (deg < 2 undefined / 0 / (0, 2500] /
    // (2500, 5000] / (5000, 10000]) — the shape a community-detection
    // pass reads before choosing its algorithm.
    // The graph is the co-occurrence graph sparsified PER NODE: each
    // supplier keeps its [[KnnDegreeCap]] heaviest co-order edges
    // (count desc, neighbor-id tie-break) and an undirected edge
    // survives if EITHER endpoint kept it — the union-kNN backbone.
    // q132's GLOBAL edge budget would be degenerate here: below sf0.1
    // the co-occurrence graph is literally complete (every supplier
    // pair shares an order), a global top-5000 keeps all of it, and
    // every coefficient is 10000 — a one-row dead census. Per-node
    // capping bounds degree at ANY corpus scale (≤ 2·cap), so the
    // census stays informative and Σdeg² stays O(|V|·cap²).
    // Scale: the per-node top-k is a bounded window over the node-
    // keyed directed edge list (never the raw fact table); wedge work
    // rides the π-ordered triangleCounts machinery; the band rollup is
    // control-plane-sized.
    "q248_clustering_coefficient" -> ((s, d) => {
      val bb = sharedKnnBackbone(s, d)
      val deg = bb.select(col("u").as("node"))
        .unionByName(bb.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val withTri = deg.join(triangleCounts(bb), Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("n_triangles"), lit(0L)).as("tri"))
        .withColumn("coeff_bp", expr(
          "CASE WHEN deg < 2 THEN CAST(0 AS BIGINT) " +
            "ELSE (2 * tri * 10000) DIV (deg * (deg - 1)) END"))
      withTri.withColumn("band",
          when(col("deg") < 2, "b0_deg_lt_2")
            .when(col("coeff_bp") === 0, "b1_zero")
            .when(col("coeff_bp") <= 2500, "b2_low")
            .when(col("coeff_bp") <= 5000, "b3_mid")
            .otherwise("b4_high"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_nodes"), sum(col("tri")).as("sum_triangles"),
          min(col("coeff_bp")).as("min_coeff_bp"),
          max(col("coeff_bp")).as("max_coeff_bp"))
        .orderBy("band")
    }),

    // DEGREE ASSORTATIVITY — do hubs link to hubs (r > 0, social-style)
    // or to leaves (r < 0, internet-style)? The one-number structural
    // fingerprint that picks between graph algorithms (e.g. hub-
    // percolation robustness). Newman's r over the symmetrized q248
    // union-kNN backbone: every undirected edge contributes both
    // orientations, so Σj = Σk and r = (M·Σjk − (Σj)²) /
    // (M·Σj² − (Σj)²). The three moments are EXACT BIGINTs (degree ≤
    // 2·cap, so M·Σjk ≲ 1e15 at sf10); only the final ratio is a
    // double — one division of two exact integers, deterministic to
    // the bit on both engines (the q56 exact-moments discipline).
    // Scale: two node-keyed joins decorate edges with endpoint degrees
    // (degree table is |V| rows), then ONE one-row moment aggregate.
    "q258_degree_assortativity" -> ((s, d) => {
      val bb = sharedKnnBackbone(s, d)
      val deg = bb.select(col("u").as("node"))
        .unionByName(bb.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val dd = bb
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      dd.agg(count(lit(1)).as("n_edges"),
          sum(col("du") + col("dv")).as("sj"),
          sum(col("du") * col("du") + col("dv") * col("dv")).as("sj2"),
          (sum(col("du") * col("dv")) * 2).as("sjk"))
        .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
        .select(col("n_nodes"), col("n_edges"),
          expr("2 * n_edges * sjk - sj * sj").as("num"),
          expr("2 * n_edges * sj2 - sj * sj").as("den"))
        .select(col("n_nodes"), col("n_edges"), col("num"), col("den"),
          // a regular graph has zero degree variance — r is undefined;
          // a pinned 0.0 beats NaN-vs-NULL cross-engine drift
          when(col("den") === 0L, lit(0.0))
            .otherwise(col("num").cast("double") / col("den").cast("double"))
            .as("assortativity_r"))
    })
  )

  /** SHARED bipartite trade-graph ledger — the ONE
    * `orders ⋈ lineitem → parity-encoded (cust, supp)` derivation that
    * six graph queries (q120/q243/q144/q202/q235/q230) each rebuilt per
    * pass, every rebuild paying the same join + distinct exchange (r16
    * verdict item 1: AQE reuses query stages WITHIN a query, never
    * across them — the repeats were ~11% of the quiet suite). Memoized
    * per (session, dataset) in the cluster-ledger / NSW / BM25 memo
    * discipline ([[DedupQueries.sharedClusters]],
    * [[SimilarityQueries.nswEngine]], [[TextQueries.sharedDocBm25Top20]]):
    * a production graph service LANDS the edge list once and every
    * analytics pass is a read of that table, not a re-derivation.
    *
    * The memo carries the co-order multiplicity `n_ord` (q235 derives
    * its edge costs from it; everyone else drops the column — the
    * groupBy already guarantees the distinctness the old per-query
    * `.distinct()` bought), plus the pinned DEGREE table over the
    * undirected view: q120/q243's out-degrees (for a symmetrized edge
    * set out-degree ≡ degree), q144/q235's node set, q202's customer
    * set, and q230's round-1 peel degrees all read it instead of
    * re-aggregating the edge table. Both frames are [[GraphOps.pin]]ned
    * (edge-count rows of three longs; MEMORY_AND_DISK, disk-backed at
    * scale) and the pin's eager count seeds q230's early-exit witness.
    *
    * The derivation is KNOB-FREE: every [[graft.Mutations]] seam in the
    * family (q120/q243 damping, q230 peel strictness) sits downstream
    * of the edge table, so red-case runs share the production build —
    * exactly the cluster-ledger situation, no knob key needed. Entries
    * live for the session; [[clearTradeGraphCache]] frees the pinned
    * blocks and drops them. */
  private[ext] final case class TradeGraph(edges: GraphOps.Pinned,
                                           degrees: GraphOps.Pinned) {
    /** Distinct parity-encoded (cust, supp, n_ord): cust = o_custkey·2,
      * supp = l_suppkey·2 + 1, n_ord = shared-order count. */
    def ebase: DataFrame = edges.df
    /** Edge count — known for free from the pin's eager materialization. */
    def nEdges: Long = edges.n
    /** (node, dg) over the undirected view — every node's degree. */
    def deg: DataFrame = degrees.df
    def free(): Unit = { edges.free(); degrees.free() }
  }

  private val tradeCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), TradeGraph]()

  /** Free every memoized trade-graph ledger's storage blocks and forget
    * it — the next graph query re-derives. (Fixtures are read-only, so
    * in-place dataset rewrites are the only production reason to.) */
  def clearTradeGraphCache(): Unit = {
    tradeCache.values().forEach(_.free())
    tradeCache.clear()
  }

  private[graft] def tradeGraph(s: SparkSession, d: String): TradeGraph = {
    GraphOps.sweepStopped(tradeCache)(_._1)
    tradeCache.computeIfAbsent((s, d), _ => {
      val eb = GraphOps.pin(
        Tables.orders(s, d).select("o_orderkey", "o_custkey")
          .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("cust"),
            (col("l_suppkey") * 2 + 1).as("supp"))
          .groupBy("cust", "supp").agg(count(lit(1)).as("n_ord")))
      val dg = GraphOps.pin(
        eb.df.select(col("cust").as("node"))
          .unionByName(eb.df.select(col("supp").as("node")))
          .groupBy("node").agg(count(lit(1)).as("dg")))
      TradeGraph(eb, dg)
    })
  }

  /** Session-memoized pins of the two supplier co-occurrence backbones
    * — the same cross-query rebuild as [[tradeGraph]] for the backbone
    * families: q132/q173/q211 each re-ran the global-budget co-order
    * aggregate (q173/q211 additionally each paying their own
    * localCheckpoint of it), q248/q258 the union-kNN variant. The
    * derivations stay in [[supplierBackbone]]/[[knnBackbone]] unmemoized
    * (plan pins and specs exercise them directly); queries read the
    * shared pins. Knob-free paths, like the trade ledger. */
  private val backboneCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), GraphOps.Pinned]()

  /** Free every memoized backbone pin and forget it. */
  def clearBackboneCache(): Unit = {
    backboneCache.values().forEach(_.free())
    backboneCache.clear()
  }

  private[graft] def sharedSupplierBackbone(s: SparkSession, d: String): DataFrame = {
    GraphOps.sweepStopped(backboneCache)(_._1)
    backboneCache.computeIfAbsent((s, d, "global"),
      _ => GraphOps.pin(supplierBackbone(s, d))).df
  }

  private[graft] def sharedKnnBackbone(s: SparkSession, d: String): DataFrame = {
    GraphOps.sweepStopped(backboneCache)(_._1)
    backboneCache.computeIfAbsent((s, d, "knn"),
      _ => GraphOps.pin(knnBackbone(s, d))).df
  }

  /** The q132 supplier co-occurrence backbone, shared with q173: the
    * [[TriangleEdgeBudget]] heaviest co-order edges (count desc,
    * deterministic (u, v) tie-break) via TakeOrderedAndProject. */
  private[graft] def supplierBackbone(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("u"), col("v"))
      .limit(TriangleEdgeBudget)
      .select("u", "v")
  }

  /** q132's co-occurrence backbone size: the heaviest edges kept before
    * wedge enumeration. */
  private[ext] val TriangleEdgeBudget = 5000

  /** q248/q258: per-node heaviest-edge cap for the union-kNN backbone —
    * bounds any node's degree at ≤ 2·cap regardless of corpus scale. */
  private[ext] val KnnDegreeCap = 8

  /** DuckDB twin of [[knnBackbone]] — yields the `edges` CTE. */
  private val oKnnBackboneCtes: String =
    s"""li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
              FROM lineitem),
          co AS (SELECT a.sk AS cu, b.sk AS cv, count(*) AS c
                 FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
                 GROUP BY 1, 2),
          dir AS (SELECT cu AS n, cv AS nbr, c FROM co
                  UNION ALL SELECT cv, cu, c FROM co),
          pick AS (SELECT n, nbr FROM (
                     SELECT n, nbr,
                            row_number() OVER (PARTITION BY n
                                               ORDER BY c DESC, nbr) AS rk
                     FROM dir) WHERE rk <= $KnnDegreeCap),
          edges AS (SELECT DISTINCT least(n, nbr) AS u,
                                    greatest(n, nbr) AS v
                    FROM pick)"""

  /** The q248/q258 union-kNN supplier backbone: each supplier keeps its
    * [[KnnDegreeCap]] heaviest co-order edges (count desc, neighbor-id
    * tie-break); an undirected edge survives if EITHER endpoint kept it.
    * Unlike [[supplierBackbone]]'s global budget (degenerate below sf0.1
    * where the co-occurrence graph is complete), per-node capping keeps
    * the graph sparse at every corpus scale. */
  private[graft] def knnBackbone(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val co = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("cu"), col("b.sk").as("cv"))
      .agg(count(lit(1)).as("c"))
    val dir = co.select(col("cu").as("n"), col("cv").as("nbr"), col("c"))
      .unionByName(co.select(col("cv").as("n"), col("cu").as("nbr"), col("c")))
    val wk = Window.partitionBy(col("n"))
      .orderBy(col("c").desc, col("nbr"))
    dir.withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= KnnDegreeCap)
      .select(least(col("n"), col("nbr")).as("u"),
        greatest(col("n"), col("nbr")).as("v"))
      .distinct()
  }

  /** q144's unrolled frontier-relaxation rounds. */
  private[ext] val BfsRounds = 3

  /** q202's unrolled HITS mutual-reinforcement rounds. */
  private[ext] val HitsRounds = 2

  /** q211's synchronous label-propagation rounds. */
  private[ext] val LpaRounds = 3

  /** q235's unrolled weighted-relaxation rounds. */
  private[ext] val SsspRounds = 3

  /** q235's unreached sentinel — far above any reachable 3-hop cost
    * (per-hop cost ≤ 101), survives min() intact for unreached nodes. */
  private[ext] val SsspInf = 999999L

  /** q230's fixed peel-round budget; the converged witness in the output
    * proves it suffices on the graded fixtures (measured: peeling settles
    * in 2 rounds at every scale — 4 buys double headroom at 2/3 the
    * eager-pin cost of the initial 6). */
  private[ext] val KCoreRounds = 4

  /** q144's unreached-distance sentinel (the trade graph's diameter is
    * far below it; survives min() intact for never-relaxed nodes). */
  private[ext] val BfsInf = 999L

  /** Degree-ordered per-node triangle participation over an undirected
    * simple graph given as distinct (u, v) edges with u < v. Returns
    * (node, n_triangles) for every node in ≥1 triangle; each triangle
    * credits all three corners. See q132's header for the π-orientation
    * argument; node ids must fit in 32 bits (π-keys pack deg << 32 | id).
    */
  private[graft] def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("n"))
      .unionByName(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val pk = edges
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(expr("shiftleft(du, 32) + u").as("pu"),
        expr("shiftleft(dv, 32) + v").as("pv"))
    val e = pk.select(
      when(col("pu") < col("pv"), col("pu")).otherwise(col("pv")).as("src"),
      when(col("pu") < col("pv"), col("pv")).otherwise(col("pu")).as("dst"))
    val wedges = e.as("x").join(e.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("a"), col("x.dst").as("b"), col("y.dst").as("c"))
    val tris = wedges.join(e,
      wedges("b") === e("src") && wedges("c") === e("dst"))
    // π-keys drop back to raw node ids (low 32 bits) for display
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("p"))
      .select((col("p") % (1L << 32)).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** One unrolled DuckDB PageRank round: nano-rank integers in CTE `$prev`
    * (column r), produces `r$k`. `//` is DuckDB's integer division —
    * truncating for positives exactly like Spark's `DIV`. */
  private def prRoundSql(k: Int, prev: String): String =
    s"""c$k AS (SELECT dst, sum(r // outdeg) AS cs
                FROM ew JOIN $prev ON ew.src = $prev.node GROUP BY dst),
        r$k AS (SELECT node, 150000000 + (85 * coalesce(cs, 0)) // 100 AS r
                FROM nodes LEFT JOIN c$k ON c$k.dst = nodes.node)"""

  /** One unrolled DuckDB HITS round over hub CTE `$prevH` → `a$k`, `h$k`.
    * MATERIALIZED is required: every intermediate is referenced twice
    * (by its max subquery and the next half-step), so default inlining
    * would double the chain per round — the SQL analogue of the lineage
    * blowup [[GraphOps.pin]] prevents (the q191 lesson). */
  private def hitsRoundSql(k: Int, prevH: String): String =
    s"""ar$k AS MATERIALIZED (SELECT supp, CAST(sum(h) AS BIGINT) AS ar
                FROM e JOIN $prevH USING (cust) GROUP BY supp),
        a$k AS MATERIALIZED (SELECT supp,
                  (ar * 1000000) // (SELECT max(ar) FROM ar$k) AS a
                FROM ar$k),
        hr$k AS MATERIALIZED (SELECT cust, CAST(sum(a) AS BIGINT) AS hr
                FROM e JOIN a$k USING (supp) GROUP BY cust),
        h$k AS MATERIALIZED (SELECT cust,
                  (hr * 1000000) // (SELECT max(hr) FROM hr$k) AS h
                FROM hr$k)"""

  /** One unrolled DuckDB label-propagation round over CTE `$prev` → `l$k`.
    * MATERIALIZED for the q202 reason: each label table feeds the next
    * round's join; default inlining would double the chain per round. */
  private def lpaRoundSql(k: Int, prev: String): String =
    s"""m$k AS MATERIALIZED (SELECT a.src, l.lbl, count(*) AS c
                FROM adj a JOIN $prev l ON l.node = a.dst GROUP BY 1, 2),
        l$k AS MATERIALIZED (SELECT src AS node, lbl FROM (
                  SELECT m$k.*, row_number() OVER (
                    PARTITION BY src ORDER BY c DESC, lbl) AS rn FROM m$k)
                WHERE rn = 1),
        s$k AS MATERIALIZED (SELECT lbl, count(*) AS n FROM l$k GROUP BY lbl),
        c$k AS (SELECT $k AS round, count(*) AS n_communities,
                  max(n) AS largest_size,
                  min(CASE WHEN n = (SELECT max(n) FROM s$k) THEN lbl END)
                    AS top_community
                FROM s$k)"""

  /** One unrolled DuckDB k-core peel round for core `$k`: `$prev` →
    * `e${k}_$r`. MATERIALIZED — every edge table feeds a degree count
    * AND the next round (the q202 inlining-blowup reason). */
  private def kcoreRoundSql(k: Int, r: Int, prev: String): String =
    s"""d${k}_$r AS MATERIALIZED (SELECT n, count(*) AS dg FROM (
            SELECT u AS n FROM $prev UNION ALL SELECT v FROM $prev)
          GROUP BY n),
        k${k}_$r AS MATERIALIZED (SELECT n FROM d${k}_$r WHERE dg >= $k),
        e${k}_$r AS MATERIALIZED (SELECT u, v FROM $prev
          WHERE u IN (SELECT n FROM k${k}_$r)
            AND v IN (SELECT n FROM k${k}_$r))"""

  /** One unrolled DuckDB weighted relaxation round over CTE `$prev` →
    * `w$k` (the q235 min-plus pass; MATERIALIZED, the q202 reason). */
  private def ssspRoundSql(k: Int, prev: String): String =
    s"""w$k AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
          SELECT node, dist FROM $prev
          UNION ALL
          SELECT e.dst AS node, $prev.dist + e.cost AS dist
          FROM e JOIN $prev ON e.src = $prev.node
          WHERE $prev.dist < $SsspInf)
        GROUP BY node)"""

  /** One unrolled DuckDB BFS relaxation round over CTE `$prev` → `d$k`. */
  private def bfsRoundSql(k: Int, prev: String): String =
    s"""d$k AS (SELECT node, min(dist) AS dist FROM (
          SELECT node, dist FROM $prev
          UNION ALL
          SELECT e.dst AS node, $prev.dist + 1 AS dist
          FROM e JOIN $prev ON e.src = $prev.node)
        GROUP BY node)"""

  def oracles: Map[String, String] = Map(
    "q144_multisource_bfs" -> {
      val rounds = (1 to BfsRounds)
        .map(k => bfsRoundSql(k, s"d${k - 1}")).mkString(",\n")
      s"""WITH ebase AS (SELECT DISTINCT o_custkey * 2 AS cust,
                                l_suppkey * 2 + 1 AS supp
                         FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          e AS (SELECT cust AS src, supp AS dst FROM ebase
                UNION ALL
                SELECT supp AS src, cust AS dst FROM ebase),
          nodes AS (SELECT DISTINCT src AS node FROM e),
          srcs AS (SELECT DISTINCT s_suppkey * 2 + 1 AS node
                   FROM supplier WHERE s_nationkey % 5 = 3),
          d0 AS (SELECT nodes.node,
                        CASE WHEN srcs.node IS NOT NULL
                             THEN 0 ELSE $BfsInf END AS dist
                 FROM nodes LEFT JOIN srcs ON srcs.node = nodes.node),
          $rounds
          SELECT dist, count(*) AS n_nodes,
                 (CASE WHEN min(node) % 2 = 0 THEN 'c' ELSE 's' END)
                   || CAST(min(node) // 2 AS VARCHAR) AS first_node,
                 (CASE WHEN max(node) % 2 = 0 THEN 'c' ELSE 's' END)
                   || CAST(max(node) // 2 AS VARCHAR) AS last_node
          FROM d$BfsRounds GROUP BY dist ORDER BY dist"""
    },

    "q120_pagerank" -> {
      val rounds = (1 to PageRankRounds)
        .map(k => prRoundSql(k, if (k == 1) "r0" else s"r${k - 1}"))
        .mkString(",\n")
      s"""WITH ebase AS (SELECT DISTINCT o_custkey * 2 AS cust,
                                l_suppkey * 2 + 1 AS supp
                         FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          e AS (SELECT cust AS src, supp AS dst FROM ebase
                UNION ALL
                SELECT supp AS src, cust AS dst FROM ebase),
          od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
          ew AS (SELECT e.src, e.dst, od.outdeg FROM e JOIN od USING (src)),
          nodes AS (SELECT src AS node FROM od),
          r0 AS (SELECT node, 1000000000 AS r FROM nodes),
          $rounds
          SELECT (CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END)
                   || CAST(node // 2 AS VARCHAR) AS node,
                 CAST(r AS DOUBLE) / 1e9 AS pr
          FROM r$PageRankRounds
          ORDER BY pr DESC, node LIMIT 20"""
    },

    "q243_personalized_pagerank" -> {
      def round(k: Int, prev: String): String =
        s"""c$k AS (SELECT dst, sum(r // outdeg) AS cs
                    FROM ew JOIN $prev ON ew.src = $prev.node GROUP BY dst),
            r$k AS (SELECT node, is_seed,
                           CAST(is_seed AS BIGINT) * 150000000
                             + (85 * coalesce(cs, 0)) // 100 AS r
                    FROM nodes LEFT JOIN c$k ON c$k.dst = nodes.node)"""
      val rounds = (1 to PageRankRounds)
        .map(k => round(k, if (k == 1) "r0" else s"r${k - 1}"))
        .mkString(",\n")
      s"""WITH ebase AS (SELECT DISTINCT o_custkey * 2 AS cust,
                                l_suppkey * 2 + 1 AS supp
                         FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          e AS (SELECT cust AS src, supp AS dst FROM ebase
                UNION ALL
                SELECT supp AS src, cust AS dst FROM ebase),
          od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
          ew AS (SELECT e.src, e.dst, od.outdeg FROM e JOIN od USING (src)),
          sd AS (SELECT DISTINCT s_suppkey * 2 + 1 AS node, 1 AS is_seed
                 FROM supplier WHERE s_nationkey % 5 = 3),
          nodes AS MATERIALIZED (
            SELECT od.src AS node, CAST(coalesce(sd.is_seed, 0) AS INTEGER) AS is_seed
            FROM od LEFT JOIN sd ON sd.node = od.src),
          r0 AS (SELECT node, is_seed,
                        CAST(is_seed AS BIGINT) * 1000000000 AS r FROM nodes),
          $rounds
          SELECT (CASE WHEN node % 2 = 0 THEN 'c' ELSE 's' END)
                   || CAST(node // 2 AS VARCHAR) AS node,
                 is_seed,
                 CAST(r AS DOUBLE) / 1e9 AS ppr
          FROM r$PageRankRounds
          ORDER BY ppr DESC, node LIMIT 20"""
    },

    "q202_hits" -> {
      val rounds = (1 to HitsRounds)
        .map(k => hitsRoundSql(k, if (k == 1) "h0" else s"h${k - 1}"))
        .mkString(",\n")
      s"""WITH e AS MATERIALIZED (
              SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          h0 AS (SELECT DISTINCT cust, CAST(1000000 AS BIGINT) AS h FROM e),
          $rounds,
          hubs AS (SELECT 'c' || CAST(cust AS VARCHAR) AS node,
                          'hub' AS kind, CAST(h AS DOUBLE) / 1e6 AS score
                   FROM h$HitsRounds ORDER BY score DESC, node LIMIT 10),
          auths AS (SELECT 's' || CAST(supp AS VARCHAR) AS node,
                           'authority' AS kind,
                           CAST(a AS DOUBLE) / 1e6 AS score
                    FROM a$HitsRounds ORDER BY score DESC, node LIMIT 10)
          SELECT node, kind, score FROM hubs
          UNION ALL SELECT node, kind, score FROM auths
          ORDER BY kind, score DESC, node"""
    },

    "q230_kcore" -> {
      val ks = Seq(4, 8, 16)
      // the CTE chain mirrors the engine's nested peel: k=4 peels from
      // the base edge set, each later k from the previous k's converged
      // core (same fixed point and witness — see the engine-side
      // monotonicity note)
      val baseOf = ks.zip("e0" +: ks.init.map(p => s"e${p}_$KCoreRounds")).toMap
      val chains = ks.map { k =>
        (1 to KCoreRounds)
          .map(r => kcoreRoundSql(k, r,
            if (r == 1) baseOf(k) else s"e${k}_${r - 1}"))
          .mkString(",\n")
      }.mkString(",\n")
      val finals = ks.map { k =>
        val last = s"e${k}_$KCoreRounds"
        val prev = s"e${k}_${KCoreRounds - 1}"
        s"""SELECT $k AS k,
              (SELECT count(*) FROM (SELECT DISTINCT n FROM (
                 SELECT u AS n FROM $last UNION ALL SELECT v FROM $last)))
                AS n_core_nodes,
              (SELECT count(*) FROM $last) AS n_core_edges,
              (SELECT count(*) FROM $last) = (SELECT count(*) FROM $prev)
                AS converged"""
      }.mkString("\n UNION ALL ")
      s"""WITH e0 AS MATERIALIZED (
            SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
          $chains
          $finals
          ORDER BY k"""
    },

    "q235_weighted_sssp" -> {
      val rounds = (1 to SsspRounds)
        .map(k => ssspRoundSql(k, s"w${k - 1}")).mkString(",\n")
      s"""WITH eb AS (SELECT o_custkey * 2 AS cust, l_suppkey * 2 + 1 AS supp,
                             count(*) AS n_ord
                      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                      GROUP BY 1, 2),
          ec AS (SELECT cust, supp, 1 + 100 // n_ord AS cost FROM eb),
          e AS MATERIALIZED (SELECT cust AS src, supp AS dst, cost FROM ec
                UNION ALL SELECT supp, cust, cost FROM ec),
          nodes AS (SELECT DISTINCT src AS node FROM e),
          srcs AS (SELECT DISTINCT s_suppkey * 2 + 1 AS node
                   FROM supplier WHERE s_nationkey % 5 = 3),
          w0 AS (SELECT nodes.node,
                        CASE WHEN srcs.node IS NOT NULL
                             THEN 0 ELSE $SsspInf END AS dist
                 FROM nodes LEFT JOIN srcs ON srcs.node = nodes.node),
          $rounds
          SELECT CASE WHEN dist >= $SsspInf THEN -1 ELSE dist // 10 END
                   AS decile,
                 count(*) AS n_nodes, min(dist) AS min_dist,
                 min(node) AS first_node, max(node) AS last_node
          FROM w$SsspRounds GROUP BY 1 ORDER BY decile"""
    },

    "q211_label_propagation" -> {
      val rounds = (1 to LpaRounds)
        .map(k => lpaRoundSql(k, s"l${k - 1}")).mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                     FROM lineitem),
          edges AS (SELECT u, v FROM (
                      SELECT a.sk AS u, b.sk AS v, count(*) AS c
                      FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
                      GROUP BY 1, 2)
                    ORDER BY c DESC, u, v LIMIT $TriangleEdgeBudget),
          adj AS MATERIALIZED (SELECT u AS src, v AS dst FROM edges
                  UNION ALL SELECT v, u FROM edges),
          l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM adj),
          $rounds
          ${(1 to LpaRounds).map(k => s"SELECT * FROM c$k").mkString(" UNION ALL ")}
          ORDER BY round"""
    },

    "q173_two_hop_reach" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                     FROM lineitem),
          edges AS (SELECT u, v FROM (
                      SELECT a.sk AS u, b.sk AS v, count(*) AS c
                      FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
                      GROUP BY 1, 2)
                    ORDER BY c DESC, u, v LIMIT $TriangleEdgeBudget),
          adj AS (SELECT u AS src, v AS dst FROM edges
                  UNION ALL SELECT v, u FROM edges),
          two AS (SELECT x.src AS src, y.dst AS dst
                  FROM adj x JOIN adj y
                    ON x.dst = y.src AND x.src <> y.dst),
          reach AS (SELECT DISTINCT src, dst FROM (
                      SELECT src, dst FROM adj
                      UNION ALL SELECT src, dst FROM two))
          SELECT src AS supplier, count(*) AS reach_2hop
          FROM reach GROUP BY src
          ORDER BY reach_2hop DESC, supplier LIMIT 20""",

    "q132_triangle_count" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                     FROM lineitem),
          edges AS (SELECT u, v FROM (
                      SELECT a.sk AS u, b.sk AS v, count(*) AS c
                      FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
                      GROUP BY 1, 2)
                    ORDER BY c DESC, u, v LIMIT $TriangleEdgeBudget),
          deg AS (SELECT n, count(*) AS deg FROM (
                    SELECT u AS n FROM edges
                    UNION ALL SELECT v FROM edges) GROUP BY n),
          pk AS (SELECT du.deg * 4294967296 + u AS pu,
                        dv.deg * 4294967296 + v AS pv
                 FROM edges
                 JOIN deg du ON du.n = u
                 JOIN deg dv ON dv.n = v),
          e AS (SELECT CASE WHEN pu < pv THEN pu ELSE pv END AS src,
                       CASE WHEN pu < pv THEN pv ELSE pu END AS dst
                FROM pk),
          wedges AS (SELECT x.src AS a, x.dst AS b, y.dst AS c
                     FROM e x JOIN e y
                       ON x.src = y.src AND x.dst < y.dst),
          tris AS (SELECT a, b, c FROM wedges
                   JOIN e ON wedges.b = e.src AND wedges.c = e.dst)
          SELECT p % 4294967296 AS supplier, count(*) AS n_triangles
          FROM (SELECT a AS p FROM tris
                UNION ALL SELECT b FROM tris
                UNION ALL SELECT c FROM tris)
          GROUP BY supplier
          ORDER BY n_triangles DESC, supplier LIMIT 20""",

    "q248_clustering_coefficient" ->
      s"""WITH $oKnnBackboneCtes,
          deg AS (SELECT n, count(*) AS deg FROM (
                    SELECT u AS n FROM edges
                    UNION ALL SELECT v FROM edges) GROUP BY n),
          pk AS (SELECT du.deg * 4294967296 + u AS pu,
                        dv.deg * 4294967296 + v AS pv
                 FROM edges
                 JOIN deg du ON du.n = u
                 JOIN deg dv ON dv.n = v),
          e AS (SELECT CASE WHEN pu < pv THEN pu ELSE pv END AS src,
                       CASE WHEN pu < pv THEN pv ELSE pu END AS dst
                FROM pk),
          wedges AS (SELECT x.src AS a, x.dst AS b, y.dst AS c
                     FROM e x JOIN e y
                       ON x.src = y.src AND x.dst < y.dst),
          tris AS (SELECT a, b, c FROM wedges
                   JOIN e ON wedges.b = e.src AND wedges.c = e.dst),
          tcnt AS (SELECT p % 4294967296 AS node,
                          CAST(count(*) AS BIGINT) AS tri
                   FROM (SELECT a AS p FROM tris
                         UNION ALL SELECT b FROM tris
                         UNION ALL SELECT c FROM tris)
                   GROUP BY node),
          pern AS (SELECT deg.n AS node, CAST(deg AS BIGINT) AS deg,
                          coalesce(tri, 0) AS tri,
                          CASE WHEN deg < 2 THEN CAST(0 AS BIGINT)
                               ELSE (2 * coalesce(tri, 0) * 10000)
                                    // (deg * (deg - 1)) END AS coeff_bp
                   FROM deg LEFT JOIN tcnt ON tcnt.node = deg.n),
          banded AS (SELECT CASE WHEN deg < 2 THEN 'b0_deg_lt_2'
                                 WHEN coeff_bp = 0 THEN 'b1_zero'
                                 WHEN coeff_bp <= 2500 THEN 'b2_low'
                                 WHEN coeff_bp <= 5000 THEN 'b3_mid'
                                 ELSE 'b4_high' END AS band,
                            tri, coeff_bp
                     FROM pern)
          SELECT band, count(*) AS n_nodes,
                 CAST(sum(tri) AS BIGINT) AS sum_triangles,
                 min(coeff_bp) AS min_coeff_bp, max(coeff_bp) AS max_coeff_bp
          FROM banded GROUP BY band ORDER BY band""",

    "q258_degree_assortativity" ->
      s"""WITH $oKnnBackboneCtes,
          deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
                    SELECT u AS n FROM edges
                    UNION ALL SELECT v FROM edges) GROUP BY n),
          dd AS (SELECT du.deg AS du, dv.deg AS dv
                 FROM edges
                 JOIN deg du ON du.n = edges.u
                 JOIN deg dv ON dv.n = edges.v),
          mom AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
                         CAST(sum(du + dv) AS BIGINT) AS sj,
                         CAST(sum(du * du + dv * dv) AS BIGINT) AS sj2,
                         CAST(2 * sum(du * dv) AS BIGINT) AS sjk
                  FROM dd),
          nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
          SELECT n_nodes, n_edges,
                 CAST(2 * n_edges * sjk - sj * sj AS BIGINT) AS num,
                 CAST(2 * n_edges * sj2 - sj * sj AS BIGINT) AS den,
                 CASE WHEN 2 * n_edges * sj2 - sj * sj = 0 THEN 0.0
                      ELSE CAST(2 * n_edges * sjk - sj * sj AS DOUBLE)
                           / CAST(2 * n_edges * sj2 - sj * sj AS DOUBLE)
                 END AS assortativity_r
          FROM mom CROSS JOIN nn"""
  )
}
