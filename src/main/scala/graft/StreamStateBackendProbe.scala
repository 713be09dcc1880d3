package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Spillable-state-backend probe (r14 verdict item 3 / "What's missing"
  * 2): every graded streaming query runs on the DEFAULT in-memory
  * (HDFS-backed) state store — fine for the suite's bounded-state
  * designs, but the 100 TB ingest story needs the spillable backend
  * demonstrated at least once. This probe runs the suite's LARGEST-STATE
  * streaming pipeline — q295's skip-gram co-occurrence aggregation,
  * whose state is the vocab² pair table — through the real micro-batch
  * engine under BOTH providers:
  *
  *   - `HDFSBackedStateStoreProvider` (the default: state lives in
  *     executor heap, snapshotted to the checkpoint dir), and
  *   - `RocksDBStateStoreProvider` (state lives in off-heap RocksDB
  *     instances that SPILL TO DISK — the backend a 100 TB deployment
  *     runs, where per-partition state exceeds executor heap).
  *
  * Graded two ways, mirroring the quantitative + semantic halves of the
  * in-memory story:
  *
  *   1. THROUGHPUT: [[StreamScaleProbe]]'s steady-state method verbatim
  *      (K single-file chunks, maxFilesPerTrigger=1, batches 2..K scored,
  *      best of 2) at 1× and 10×, so the RocksDB cost is a ratio against
  *      the in-memory baseline measured the same minute, plus the
  *      exponent showing the data-path scaling survives the backend swap.
  *   2. EQUALITY: the full streamed aggregate (Complete mode, memory
  *      sink) must equal the one-shot batch aggregate over the same
  *      chunk files ROW FOR ROW under RocksDB — the same stream==batch
  *      pin every graded streaming query carries on the default store.
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
    val outJson = args.lift(1).getOrElse("SCALE_r15_stream.json")
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
    val d1 = StreamScaleProbe.chunkTable(spark, base, "documents",
      "doc_id", "backend_1x")
    val d10 = StreamScaleProbe.chunkTable(spark, genDir, "documents",
      "doc_id", "backend_10x")

    val docSchema = spark.read.parquet(s"$base/documents.parquet").schema
    def docsStream(dir: String): DataFrame =
      spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
    def skipgram(docs: DataFrame): DataFrame =
      ext.TextQueries.skipgramPairs(docs)
        .groupBy("center", "context")
        .agg(count(lit(1)).as("n_pairs"), sum(col("w")).as("w_sum"))

    def withConfs[T](pairs: (String, String)*)(body: => T): T = {
      val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    def runOnce(dir: String, provider: String): StreamScaleProbe.RunStats =
      withConfs(ProviderKey -> provider,
        "spark.sql.shuffle.partitions" -> StreamScaleProbe.StatePartitions.toString) {
        val q = skipgram(docsStream(dir)).writeStream
          .outputMode(OutputMode.Update()).format("noop").start()
        try q.processAllAvailable() finally q.stop()
        val data = q.recentProgress.toSeq.filter(_.numInputRows > 0)
          .sortBy(_.batchId)
        val secs = data.map(_.durationMs.get("triggerExecution").toLong / 1e3)
        val steady = data.drop(1)
        val lastState = data.reverse.flatMap(_.stateOperators.headOption).headOption
        StreamScaleProbe.RunStats(
          batches = data.size,
          firstBatchSec = secs.headOption.getOrElse(-1.0),
          steadySec = secs.drop(1).sum,
          steadyRows = steady.map(_.numInputRows).sum,
          stateRows = lastState.map(_.numRowsTotal).getOrElse(-1L),
          stateBytes = lastState.map(_.memoryUsedBytes).getOrElse(-1L))
      }

    def best(dir: String, provider: String): StreamScaleProbe.RunStats =
      (1 to 2).map(_ => runOnce(dir, provider))
        .minBy(r => if (r.steadySec > 0) r.steadySec else Double.MaxValue)

    // --- stream == batch equality under RocksDB (1x chunk set) ---
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val equalityOk = withConfs(ProviderKey -> Rocks,
      "spark.sql.shuffle.partitions" -> StreamScaleProbe.StatePartitions.toString) {
      val q = skipgram(docsStream(d1)).writeStream
        .outputMode(OutputMode.Complete())
        .format("memory").queryName("graft_rocksdb_eq").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = canon(spark.table("graft_rocksdb_eq"))
      val batch = canon(skipgram(spark.read.schema(docSchema).parquet(d1)))
      val ok = streamed == batch
      if (!ok) println(s"[state-backend] EQUALITY FAILED: " +
        s"stream=${streamed.size} rows batch=${batch.size} rows")
      ok
    }

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def side(r: StreamScaleProbe.RunStats) =
      s"""{"data_batches":${r.batches},"first_batch_sec":${fmt(r.firstBatchSec)},""" +
        s""""steady_sec":${fmt(r.steadySec)},"steady_rows":${r.steadyRows},""" +
        s""""steady_rows_per_sec":${fmt(r.rowsPerSec)},""" +
        s""""state_rows_final":${r.stateRows},"state_bytes_final":${r.stateBytes}}"""
    val rows = Seq("hdfs_default" -> Hdfs, "rocksdb" -> Rocks).map {
      case (tag, provider) =>
        val r1 = best(d1, provider)
        val r10 = best(d10, provider)
        val exp = math.log(r10.steadySec / r1.steadySec) / math.log(10)
        println(f"[state-backend] $tag%-13s steady 1x=${r1.steadySec}%7.2fs " +
          f"(${r1.rowsPerSec}%,.0f rows/s) 10x=${r10.steadySec}%7.2fs " +
          f"(${r10.rowsPerSec}%,.0f rows/s) exponent=$exp%5.2f state " +
          f"${r1.stateRows}%d -> ${r10.stateRows}%d rows")
        s"""{"provider":"$tag","class":"$provider","scale_1x":${side(r1)},""" +
          s""""scale_10x":${side(r10)},"exponent":${fmt(exp)}}"""
    }

    val notes =
      "q295's skip-gram aggregation (the suite's largest streaming state: " +
        "vocab^2 pair keys) through the real micro-batch engine under the " +
        "default HDFS-backed in-memory provider AND RocksDB (the " +
        "spill-to-disk backend a 100 TB ingest runs). Method = " +
        "StreamScaleProbe's verbatim: K=" + StreamScaleProbe.Chunks +
        " single-file chunks, maxFilesPerTrigger=1, noop sink, Update " +
        "mode, state partitions " + StreamScaleProbe.StatePartitions +
        ", steady = batches 2..K, best of 2 runs per (scale, provider). " +
        "state_bytes_final under RocksDB reports the provider's " +
        "memoryUsedBytes surface (block-cache + memtable residency, not " +
        "total SST bytes - the on-disk state is exactly what makes the " +
        "backend spillable). stream_equals_batch_rocksdb re-runs the 1x " +
        "stream in Complete mode into a memory sink and compares the " +
        "final aggregate ROW FOR ROW against the one-shot batch aggregate " +
        "over the same chunk files - the same stream==batch pin the " +
        "graded queries carry on the default store."
    val json = "{\n\"schema\":\"graft-state-backend/1\",\n" +
      s""""factor":10,"chunks":${StreamScaleProbe.Chunks},"cpus":$cpus,""" + "\n" +
      s""""stream_equals_batch_rocksdb":$equalityOk,""" + "\n" +
      s""""notes":"$notes",""" + "\n" +
      "\"probes\":[\n" + rows.mkString(",\n") + "\n]\n}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(s"""{"metric":"state_backend_path","path":"$outJson"}""")
    require(equalityOk, "RocksDB stream != batch — the backend swap broke semantics")
    spark.stop()
  }
}
