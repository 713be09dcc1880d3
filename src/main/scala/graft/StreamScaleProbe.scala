package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Steady-state streaming scale probe — the fix for SCALE_r12d's q295
  * reading (exponent −0.75), which measured per-query engine startup
  * (state-store init, offset log), not data: both scales completed in ONE
  * micro-batch, so there was nothing steady to measure.
  *
  * Method: split the input table into K single-file parquet chunks, run
  * the stateful pipeline through the real micro-batch engine with
  * `maxFilesPerTrigger=1` (K data batches), and score ONLY batches 2..K —
  * the first data batch absorbs source initialization, codegen, and the
  * state-store bootstrap that poisoned the r12 number. Each probe runs
  * twice per scale and keeps the run with the higher steady throughput
  * (JIT warm), exactly the min-of-2 discipline of [[Bench]] in
  * throughput form. The 10× fixture is [[ScaleProbe.generate]]'s
  * shape-preserving one (grouped vocabulary / offset user ids), so
  * per-key state densities stay at 1× levels while volume grows 10×.
  *
  * Reported per probe and scale: steady-state rows/sec, first-batch vs
  * steady per-batch seconds (the startup cost now ISOLATED instead of
  * averaged in), and the final state-store row count + bytes — the
  * state-growth note the scale story needs (aggregation state is
  * key-spaced: vocab² pairs for skip-grams, types×days for the census —
  * NOT row-spaced, so 10× rows must grow state far less than 10×).
  *
  * Exponent: ln(steady_sec_10x / steady_sec_1x) / ln 10 over the SAME
  * number of steady batches (each 10× larger) — the data-path scaling of
  * per-batch processing, startup-free by construction.
  *
  * Usage: runMain graft.StreamScaleProbe [genDir] [outJson]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object StreamScaleProbe {
  private val Factor = 10
  private[graft] val Chunks = 8
  private[graft] val StatePartitions = 4 // the graded-run discipline

  private[graft] case class RunStats(
      batches: Int, firstBatchSec: Double, steadySec: Double,
      steadyRows: Long, stateRows: Long, stateBytes: Long) {
    def rowsPerSec: Double = if (steadySec > 0) steadyRows / steadySec else -1
  }

  /** Split `table` into [[Chunks]] single-file parquet chunks so the
    * file stream source sees exactly K data micro-batches — shared by
    * this probe and [[StreamStateBackendProbe]]. */
  private[graft] def chunkTable(spark: SparkSession, srcDir: String,
                                table: String, idCol: String,
                                tag: String): String = {
    val df = if (table == "events") Tables.events(spark, srcDir)
             else spark.read.parquet(s"$srcDir/$table.parquet")
    writeChunks(spark, tag,
      i => df.filter(pmod(col(idCol), lit(Chunks)) === i))
  }

  /** [[chunkTable]] for EVENT-TIME pipelines: chunk i is the i-th ntile
    * of the `ts` order, so the stream's watermark ADVANCES monotonically
    * across micro-batches — the shape append-mode session eviction
    * needs (id-modulo chunks all span the full time range, making every
    * batch after the first fully late). */
  private[graft] def chunkEventsByTime(spark: SparkSession, srcDir: String,
                                       tag: String): String = {
    val df = Tables.events(spark, srcDir)
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val ranked = df.withColumn("__nt", ntile(Chunks).over(w))
    writeChunks(spark, tag,
      i => ranked.filter(col("__nt") === i + 1).drop("__nt"))
  }

  private def writeChunks(spark: SparkSession, tag: String,
                          part: Int => DataFrame): String = {
    val dir = java.nio.file.Paths.get(ops.Scratch.dir(s"graft_stream_$tag"))
    val prior = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      for (i <- 0 until Chunks) {
        val tmp = dir.resolve(s"tmp$i")
        part(i).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val files = java.nio.file.Files.list(tmp).iterator()
        var moved = false
        while (files.hasNext && !moved) {
          val p = files.next()
          if (p.getFileName.toString.endsWith(".parquet")) {
            java.nio.file.Files.move(p, dir.resolve(f"chunk$i%02d.parquet"))
            moved = true
          }
        }
        // drop the _SUCCESS/_committed noise so the source sees K files
        java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prior)
    dir.toString
  }

  /** Run ONE chunked stream to completion and score its steady state —
    * the single scorer shared by this probe and
    * [[StreamStateBackendProbe]] (r15 advice: the near-verbatim copy in
    * the backend probe could drift). Conf overrides (state partitions
    * always; provider class for the backend probe) are applied for the
    * whole run and restored after. The triggerExecution lookup is
    * GUARDED: a progress row without that entry scores 0 instead of
    * NPEing. */
  private[graft] def runOnce(spark: SparkSession, mk: => DataFrame,
                             mode: OutputMode = OutputMode.Update(),
                             confs: Seq[(String, String)] = Nil): RunStats = {
    val all = ("spark.sql.shuffle.partitions" -> StatePartitions.toString) +: confs
    val olds = all.map { case (k, _) => k -> spark.conf.getOption(k) }
    all.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = mk.writeStream.outputMode(mode).format("noop").start()
      try q.processAllAvailable() finally q.stop()
      val data = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        .sortBy(_.batchId)
      val secs = data.map(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toLong)
          .getOrElse(0L) / 1e3)
      val steady = data.drop(1)
      val lastState = data.reverse.flatMap(_.stateOperators.headOption).headOption
      RunStats(
        batches = data.size,
        firstBatchSec = secs.headOption.getOrElse(-1.0),
        steadySec = secs.drop(1).sum,
        steadyRows = steady.map(_.numInputRows).sum,
        stateRows = lastState.map(_.numRowsTotal).getOrElse(-1L),
        stateBytes = lastState.map(_.memoryUsedBytes).getOrElse(-1L))
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Best-of-2 [[runOnce]] — the JIT-warm discipline of [[Bench]]. */
  private[graft] def bestOf2(spark: SparkSession, mk: => DataFrame,
                             mode: OutputMode = OutputMode.Update(),
                             confs: Seq[(String, String)] = Nil): RunStats =
    (1 to 2).map(_ => runOnce(spark, mk, mode, confs))
      .minBy(r => if (r.steadySec > 0) r.steadySec else Double.MaxValue)

  def main(args: Array[String]): Unit = {
    val genDir = args.lift(0).getOrElse("/tmp/graft_scale10x")
    val outJson = args.lift(1).getOrElse("SCALE_r13_stream.json")
    val base = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ScaleProbe.generate(spark, base, genDir)

    // --- chunked stream inputs: K plain files, one micro-batch each ---
    def chunkTable(srcDir: String, table: String, idCol: String,
                   tag: String): String =
      StreamScaleProbe.chunkTable(spark, srcDir, table, idCol, tag)

    def best(mk: => DataFrame): RunStats = bestOf2(spark, mk)

    val docSchema = spark.read.parquet(s"$base/documents.parquet").schema

    def docsStream(dir: String): DataFrame =
      spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)

    def eventsStream(dir: String): DataFrame =
      spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
        .option("maxFilesPerTrigger", "1").parquet(dir)

    // probe 1: q295's pipeline — stateless skip-gram pair explode into a
    // vocab²-keyed count/sum aggregation (state = co-occurrence table)
    def skipgram(dir: String): DataFrame =
      ext.TextQueries.skipgramPairs(docsStream(dir))
        .groupBy("center", "context")
        .agg(count(lit(1)).as("n_pairs"), sum(col("w")).as("w_sum"))

    // probe 2: q251's streaming leg — the (type, day)-keyed daily census
    // feeding the CUSUM fold (state = types × days, retention-bounded)
    def census(dir: String): DataFrame =
      eventsStream(dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("cnt"))

    val probes: Seq[(String, String, String, String, String => DataFrame)] = Seq(
      ("q295_stream_skipgram", "documents", "doc_id",
        "skip-gram co-occurrence aggregation (vocab^2-keyed state)",
        skipgram _),
      ("q251_stream_cusum", "events", "event_id",
        "daily event census feeding CUSUM (types x days state)",
        census _))

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rows = probes.map { case (name, table, idCol, what, mk) =>
      val d1 = chunkTable(base, table, idCol, s"${name}_1x")
      val d10 = chunkTable(genDir, table, idCol, s"${name}_10x")
      val r1 = best(mk(d1))
      val r10 = best(mk(d10))
      val exp = math.log(r10.steadySec / r1.steadySec) / math.log(Factor)
      println(f"[stream-scale] $name%-24s steady 1x=${r1.steadySec}%7.2fs " +
        f"(${r1.rowsPerSec}%,.0f rows/s) 10x=${r10.steadySec}%7.2fs " +
        f"(${r10.rowsPerSec}%,.0f rows/s) exponent=$exp%5.2f state " +
        f"${r1.stateRows}%d -> ${r10.stateRows}%d rows")
      def side(r: RunStats) =
        s"""{"data_batches":${r.batches},"first_batch_sec":${fmt(r.firstBatchSec)},""" +
          s""""steady_sec":${fmt(r.steadySec)},"steady_rows":${r.steadyRows},""" +
          s""""steady_rows_per_sec":${fmt(r.rowsPerSec)},""" +
          s""""state_rows_final":${r.stateRows},"state_bytes_final":${r.stateBytes}}"""
      s"""{"query":"$name","what":"$what","scale_1x":${side(r1)},""" +
        s""""scale_10x":${side(r10)},"exponent":${fmt(exp)},""" +
        s""""state_growth":${fmt(
          if (r1.stateRows > 0) r10.stateRows.toDouble / r1.stateRows else -1)}}"""
    }

    val notes =
      "method: K=" + Chunks + " single-file chunks, maxFilesPerTrigger=1, " +
        "noop sink, Update mode, state partitions " + StatePartitions +
        " (the graded-run discipline); steady-state = batches 2..K (the " +
        "first data batch absorbs source init + codegen + state-store " +
        "bootstrap, the startup cost that made SCALE_r12d's one-batch " +
        "q295 probe read exponent -0.75); best of 2 runs per scale; " +
        "exponent = ln(steady10/steady1)/ln(10) over equal steady batch " +
        "counts, each batch 10x larger at 10x. state_growth is final " +
        "state-store rows 10x/1x - KEY-spaced, not row-spaced: the " +
        "census is flat (same types x days at any volume) and the " +
        "skip-gram table grows exactly with the key space - the 10x " +
        "fixture's group-suffixed vocabulary is 10 disjoint 1x-shaped " +
        "sub-corpora, so pair keys grow 10x linearly (a shared-vocab " +
        "corpus would hold state flat; real corpora sit between, per " +
        "Heaps' law) - never with the quadratic pair STREAM."
    val json = "{\n\"schema\":\"graft-scale-stream/1\",\n" +
      s""""factor":$Factor,"chunks":$Chunks,"cpus":$cpus,""" + "\n" +
      s""""notes":"$notes",""" + "\n" +
      "\"probes\":[\n" + rows.mkString(",\n") + "\n]\n}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(s"""{"metric":"stream_scale_path","path":"$outJson"}""")
    spark.stop()
  }
}
