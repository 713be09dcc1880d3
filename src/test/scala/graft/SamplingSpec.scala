package graft

import graft.ext.SamplingPipeline
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property pins for the sampling-stage API ([[SamplingPipeline]],
  * graded as q186-q190/q192): the invariants a training dataloader
  * depends on, checked over ScalaCheck-generated inputs rather than the
  * fixture corpus — the shapes the fixtures don't explore (arbitrary id
  * ranges, shard skew, fractional weights, token-length extremes).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  /** Draw from a generator with a FIXED seed so a failing case replays
    * identically on re-run (Gen.sample alone reseeds randomly — a
    * statistical-bound failure would then be undebuggable). */
  private def sampled[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  // distinct ids keep every order total
  private val idGen: Gen[List[Long]] =
    Gen.listOfN(150, Gen.chooseNum(0L, 5000000L)).map(_.distinct)

  test("epochOrder: a seed-reproducible permutation that differs across seeds") {
    val ids = sampled(idGen, 11L)
    val df = ids.toDF("doc_id")
    def order(seed: Int): Seq[Long] =
      SamplingPipeline.epochOrder(df, "doc_id", seed)
        .orderBy("epoch_order").select("doc_id").as[Long].collect().toSeq
    val a1 = order(42); val a2 = order(42)
    assert(a1 == a2, "same seed must replay the identical order")
    assert(a1.sorted == ids.sorted,
      "epoch order must be a permutation — every id exactly once")
    for (seed <- Seq(7, 1, 99)) {
      val b = order(seed)
      assert(b.sorted == ids.sorted)
      assert(b != a1, s"seed $seed produced seed 42's order")
    }
  }

  test("mixtureSample: copies in {floor(w), floor(w)+1}, deterministic, rate near w") {
    val ids = sampled(Gen.listOfN(400, Gen.chooseNum(0L, 10000000L)), 22L).distinct
    val df = ids.map(id => (id, "s")).toDF("doc_id", "source")
    for (w <- Seq(0.0, 0.3, 1.0, 1.7, 2.5, 3.25, 97.5)) {
      def run() = SamplingPipeline
        .mixtureSample(df, "doc_id", "source", Map("s" -> w))
        .select("doc_id", "copy_idx").as[(Long, Long)].collect().toSeq.sorted
      val r1 = run()
      assert(r1 == run(), s"w=$w: re-run must reproduce identical samples")
      if (w == 0.0) assert(r1.isEmpty, "weight 0 must drop the source")
      else {
        val perRow = r1.groupBy(_._1).view.mapValues(_.length)
        val fl = math.floor(w).toLong
        perRow.foreach { case (id, c) =>
          assert(c == fl || c == fl + 1, s"w=$w id=$id got $c copies")
          // copy_idx is a contiguous 1..c sequence per row
        }
        r1.groupBy(_._1).foreach { case (id, rows) =>
          assert(rows.map(_._2).sorted == (1L to rows.length).toList,
            s"w=$w id=$id copy_idx not contiguous")
        }
        if (fl == 0) // rows may legitimately be absent
          assert(perRow.keySet.subsetOf(ids.toSet))
        else assert(perRow.keySet == ids.toSet,
          s"w=$w: every row must appear when floor(w) >= 1")
        // binomial 4-sigma bound on the fractional draws: sd <= sqrt(n/4)
        val n = ids.size
        val slack = 4 * math.sqrt(n / 4.0) + 1
        assert(math.abs(r1.size - w * n) <= slack,
          s"w=$w: ${r1.size} copies of $n rows misses target by > 4 sigma")
      }
    }
  }

  test("packSequences: positions advance by exactly n_tok — no overlap, no gap") {
    val L = 128
    val rows = sampled(Gen.listOfN(200, for {
      shard <- Gen.oneOf("a", "b", "c")
      tok <- Gen.chooseNum(1L, 300L)
    } yield (shard, tok)), 33L).zipWithIndex
      .map { case ((sh, tok), i) => (i.toLong, sh, tok) }
    val df = rows.toDF("id", "shard", "tok")
    val out = SamplingPipeline.packSequences(df, "id", "shard", "tok", L)
      .select("id", "shard", "tok", "seq_id", "start_off", "n_straddles")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(out.length == rows.length, "packing must keep every row")
    assert(out.map(_._3).sum == rows.map(_._3).sum, "token totals conserved")
    out.groupBy(_._2).foreach { case (shard, g) =>
      val inOrder = g.sortBy(_._1)
      var expectPos = 0L // each shard's stream starts at sequence 0, offset 0
      inOrder.foreach { case (id, _, tok, seqId, off, straddles) =>
        val pos = seqId * L + off
        assert(pos == expectPos,
          s"shard $shard id $id starts at $pos, expected $expectPos (gap/overlap)")
        assert(off >= 0 && off < L)
        assert(straddles == (pos + tok - 1) / L - pos / L,
          s"shard $shard id $id straddle count wrong")
        expectPos += tok
      }
    }
  }

  test("lengthBucket: total, monotone, and cap >= n_tok below the overflow cap") {
    val toks = sampled(Gen.listOfN(300, Gen.chooseNum(0L, 6000L)), 44L)
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "n_tok")
    val out = SamplingPipeline.lengthBucket(df, "n_tok")
      .select("n_tok", "bucket_cap").as[(Long, Long)].collect()
    assert(out.length == toks.length, "bucketing must be total")
    val caps = (SamplingPipeline.DefaultBucketBounds :+
      SamplingPipeline.DefaultOverflowCap).toSet
    out.foreach { case (tok, cap) =>
      assert(caps.contains(cap), s"unknown bucket $cap")
      if (tok <= SamplingPipeline.DefaultBucketBounds.last)
        assert(cap >= tok, s"tok $tok in bucket $cap pads negatively")
      else assert(cap == SamplingPipeline.DefaultOverflowCap)
    }
    // monotone: sort by tok, caps must be non-decreasing
    val byTok = out.sortBy(_._1).map(_._2)
    assert(byTok.zip(byTok.tail).forall(p => p._1 <= p._2),
      "bucket caps must be monotone in token count")
  }

  test("sampling stages compose without column collisions (q192 shape)") {
    val ids = sampled(idGen, 55L)
    val df = ids.map(id => (id, if (id % 2 == 0) "s" else "t", 1L + id % 97))
      .toDF("doc_id", "source", "n_tok")
    val composed = SamplingPipeline.lengthBucket(
      SamplingPipeline.packSequences(
        SamplingPipeline.mixtureSample(
          SamplingPipeline.epochOrder(df, "doc_id", 13),
          "doc_id", "source", Map("s" -> 1.5, "t" -> 0.5))
          .withColumn("pack_key", concat_ws(":", col("epoch_order"),
            col("doc_id").cast("string"), col("copy_idx").cast("string"))),
        "pack_key", "source", "n_tok", 64),
      "n_tok")
    val cols = composed.columns.toSeq
    assert(Seq("doc_id", "source", "n_tok", "epoch_order", "copy_idx",
      "seq_id", "start_off", "n_straddles", "bucket_cap").forall(cols.contains),
      s"composition lost a stage column: $cols")
    assert(cols.distinct == cols, s"duplicate columns after composition: $cols")
    assert(composed.count() > 0)
  }

  test("chunked: windows tile every doc with exact stride, for arbitrary lengths") {
    // the q283/q285 seam over generated token counts — including the
    // boundary shapes the fixture can't guarantee (empty-ish docs,
    // exact window multiples, stride-aligned lengths, giant docs)
    val lens = (sampled(Gen.listOfN(60, Gen.chooseNum(1, 400)), 33L) ++
      Seq(1, 31, 32, 33, 55, 56, 57, 24, 48, 2000)).distinct
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((w, s0) <- Seq((32, 24), (16, 16), (8, 3))) {
      val ch = ext.TextQueries.chunked(df, w, s0)
        .select("doc_id", "chunk_idx", "start_tok", "chunk_len")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, text) =>
        val nTok = text.split(" ", -1).length
        val got = ch(id)
        val wantChunks = 1 + (math.max(0, nTok - w) + s0 - 1) / s0
        assert(got.length == wantChunks, s"W=$w S=$s0 doc $id len $nTok")
        got.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
          assert(idx == i && start == i.toLong * s0 + 1, s"W=$w S=$s0 doc $id c$i")
          assert(len == math.min(w.toLong, nTok - start + 1), s"W=$w S=$s0 doc $id c$i")
          assert(len >= 1, s"W=$w S=$s0 doc $id c$i empty window")
        }
        // tiling: last chunk reaches the last token; when S < W every
        // token is covered (overlap >= 0); when S == W coverage is exact
        val last = got.last
        assert(last._3 + last._4 - 1 == nTok, s"W=$w S=$s0 doc $id tail")
        if (s0 <= w) {
          val covered = got.flatMap(c => c._3 to (c._3 + c._4 - 1)).toSet
          assert(covered == (1L to nTok.toLong).toSet, s"W=$w S=$s0 doc $id gap")
        }
      }
    }
  }
}
