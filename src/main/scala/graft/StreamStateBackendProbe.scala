package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Spillable-state-backend probe (r14 verdict item 3; extended r16 per
  * r15 verdict item 5): every graded streaming query runs on the DEFAULT
  * in-memory (HDFS-backed) state store — fine for the suite's
  * bounded-state designs, but the 100 TB ingest story needs the
  * spillable backend demonstrated. This probe runs TWO state shapes
  * through the real micro-batch engine under BOTH providers:
  *
  *   - POINT-KEYED state: q295's skip-gram co-occurrence aggregation
  *     (vocab² pair keys — the suite's largest streaming state), id-
  *     modulo chunks, Update mode;
  *   - MERGING state: q174's session-window aggregation, where a later
  *     batch can BRIDGE two stored sessions and the store must merge
  *     (and, with the watermark, EVICT) them — the state-backend path
  *     with genuinely different semantics from point upsert. Chunks are
  *     event-TIME ntiles so the watermark advances across batches
  *     (id-modulo chunks would make every post-first batch fully late),
  *     Append mode + 1 h watermark — eviction actually runs.
  *
  * Providers:
  *   - `HDFSBackedStateStoreProvider` (default: executor-heap state,
  *     snapshotted to the checkpoint dir), and
  *   - `RocksDBStateStoreProvider` (off-heap RocksDB instances that
  *     SPILL TO DISK — the backend a 100 TB deployment runs).
  *
  * Graded two ways, mirroring the quantitative + semantic halves of the
  * in-memory story:
  *
  *   1. THROUGHPUT: [[StreamScaleProbe]]'s steady-state scorer verbatim
  *      (shared code, K single-file chunks, maxFilesPerTrigger=1,
  *      batches 2..K scored, best of 2) at 1× and 10× per provider.
  *   2. EQUALITY: the full streamed aggregate (Complete mode, memory
  *      sink — exactly the graded q174/q295 execution shape) must equal
  *      the one-shot batch aggregate over the same chunk files ROW FOR
  *      ROW under RocksDB, for BOTH state shapes.
  *
  * Usage: runMain graft.StreamStateBackendProbe [genDir] [outJson]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object StreamStateBackendProbe {
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val genDir = args.lift(0).getOrElse("/tmp/graft_scale10x")
    val outJson = args.lift(1).getOrElse("SCALE_r16_stream.json")
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
    val docs1 = StreamScaleProbe.chunkTable(spark, base, "documents",
      "doc_id", "backend_1x")
    val docs10 = StreamScaleProbe.chunkTable(spark, genDir, "documents",
      "doc_id", "backend_10x")
    val ev1 = StreamScaleProbe.chunkEventsByTime(spark, base, "backend_ev1x")
    val ev10 = StreamScaleProbe.chunkEventsByTime(spark, genDir, "backend_ev10x")

    val docSchema = spark.read.parquet(s"$base/documents.parquet").schema
    val evSchema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    def docsStream(dir: String): DataFrame =
      spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
    def eventsStream(dir: String): DataFrame =
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)

    def skipgram(docs: DataFrame): DataFrame =
      ext.TextQueries.skipgramPairs(docs)
        .groupBy("center", "context")
        .agg(count(lit(1)).as("n_pairs"), sum(col("w")).as("w_sum"))
    // q174's operator: session merge in the state store; the watermarked
    // append form is the eviction-exercising throughput shape, the
    // unwatermarked Complete form is the graded-query equality shape
    def sessions(events: DataFrame): DataFrame =
      events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          graft.ops.dsum(col("value")).as("session_value"))
    def sessionsAppend(dir: String): DataFrame =
      sessions(eventsStream(dir).withWatermark("ts", "1 hour"))

    // --- stream == batch equality under RocksDB (1x chunk sets), both
    // state shapes, Complete mode — the graded execution shape ---
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    def equalUnderRocks(tag: String, stream: DataFrame,
                        batch: DataFrame): Boolean = {
      val olds = Seq(ProviderKey, "spark.sql.shuffle.partitions")
        .map(k => k -> spark.conf.getOption(k))
      spark.conf.set(ProviderKey, Rocks)
      spark.conf.set("spark.sql.shuffle.partitions",
        StreamScaleProbe.StatePartitions.toString)
      try {
        val name = s"graft_rocksdb_eq_$tag"
        val q = stream.writeStream.outputMode(OutputMode.Complete())
          .format("memory").queryName(name).start()
        try q.processAllAvailable() finally q.stop()
        val streamed = canon(spark.table(name))
        val expected = canon(batch)
        val ok = streamed == expected
        if (!ok) println(s"[state-backend] EQUALITY FAILED ($tag): " +
          s"stream=${streamed.size} rows batch=${expected.size} rows")
        ok
      } finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    val skipgramEq = equalUnderRocks("skipgram",
      skipgram(docsStream(docs1)),
      skipgram(spark.read.schema(docSchema).parquet(docs1)))
    val sessionEq = equalUnderRocks("session",
      sessions(eventsStream(ev1)),
      sessions(spark.read.schema(evSchema).parquet(ev1)))

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def side(r: StreamScaleProbe.RunStats) =
      s"""{"data_batches":${r.batches},"first_batch_sec":${fmt(r.firstBatchSec)},""" +
        s""""steady_sec":${fmt(r.steadySec)},"steady_rows":${r.steadyRows},""" +
        s""""steady_rows_per_sec":${fmt(r.rowsPerSec)},""" +
        s""""state_rows_final":${r.stateRows},"state_bytes_final":${r.stateBytes}}"""

    val shapes: Seq[(String, String, String, OutputMode, String => DataFrame)] = Seq(
      ("q295_skipgram_update", docs1, docs10, OutputMode.Update(),
        dir => skipgram(docsStream(dir))),
      ("q174_session_append", ev1, ev10, OutputMode.Append(),
        dir => sessionsAppend(dir)))
    val rows = for {
      (shape, d1, d10, mode, mk) <- shapes
      (tag, provider) <- Seq("hdfs_default" -> Hdfs, "rocksdb" -> Rocks)
    } yield {
      val r1 = StreamScaleProbe.bestOf2(spark, mk(d1), mode,
        Seq(ProviderKey -> provider))
      val r10 = StreamScaleProbe.bestOf2(spark, mk(d10), mode,
        Seq(ProviderKey -> provider))
      val exp = math.log(r10.steadySec / r1.steadySec) / math.log(10)
      println(f"[state-backend] $shape%-22s $tag%-13s steady 1x=${r1.steadySec}%7.2fs " +
        f"(${r1.rowsPerSec}%,.0f rows/s) 10x=${r10.steadySec}%7.2fs " +
        f"(${r10.rowsPerSec}%,.0f rows/s) exponent=$exp%5.2f state " +
        f"${r1.stateRows}%d -> ${r10.stateRows}%d rows")
      s"""{"shape":"$shape","provider":"$tag","class":"$provider",""" +
        s""""scale_1x":${side(r1)},"scale_10x":${side(r10)},""" +
        s""""exponent":${fmt(exp)}}"""
    }

    val notes =
      "Two state shapes through the real micro-batch engine under the " +
        "default HDFS-backed in-memory provider AND RocksDB (the " +
        "spill-to-disk backend a 100 TB ingest runs): q295's skip-gram " +
        "aggregation (point-keyed vocab^2 state, Update mode, id-modulo " +
        "chunks) and q174's session windows (MERGING state - a later " +
        "batch bridges stored sessions and the store must merge them; " +
        "Append mode + 1h watermark over event-TIME ntile chunks, so " +
        "the watermark advances and eviction actually runs). Method = " +
        "StreamScaleProbe's shared scorer: K=" + StreamScaleProbe.Chunks +
        " single-file chunks, maxFilesPerTrigger=1, noop sink, state " +
        "partitions " + StreamScaleProbe.StatePartitions + ", steady = " +
        "batches 2..K, best of 2 runs per (shape, scale, provider). " +
        "state_bytes_final under RocksDB reports the provider's " +
        "memoryUsedBytes surface (block-cache + memtable residency, not " +
        "total SST bytes - the on-disk state is exactly what makes the " +
        "backend spillable). stream_equals_batch_rocksdb re-runs each " +
        "1x stream in Complete mode (the graded q174/q295 execution " +
        "shape) into a memory sink and compares the final aggregate ROW " +
        "FOR ROW against the one-shot batch aggregate over the same " +
        "chunk files."
    val json = "{\n\"schema\":\"graft-state-backend/2\",\n" +
      s""""factor":10,"chunks":${StreamScaleProbe.Chunks},"cpus":$cpus,""" + "\n" +
      s""""stream_equals_batch_rocksdb":$skipgramEq,""" + "\n" +
      s""""session_stream_equals_batch_rocksdb":$sessionEq,""" + "\n" +
      s""""notes":"$notes",""" + "\n" +
      "\"probes\":[\n" + rows.mkString(",\n") + "\n]\n}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(s"""{"metric":"state_backend_path","path":"$outJson"}""")
    require(skipgramEq, "RocksDB stream != batch (skipgram) — backend swap broke semantics")
    require(sessionEq, "RocksDB stream != batch (session) — backend swap broke semantics")
    spark.stop()
  }
}
