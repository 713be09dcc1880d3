package graft

import graft.ops.{EventQueries, MonitoringQueries}
import graft.streaming.StreamingPipelines
import org.apache.spark.sql.functions._

/** Streaming engine vs batch-twin equivalence (no DuckDB oracle exists for
  * a stream, so the batch queries are the spec). */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling windows equal the batch aggregation") {
    val streamed = StreamingPipelines.runToCompletion(spark,
        StreamingPipelines.tumblingCounts(StreamingPipelines.eventsStream(spark, sf)))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("window_start", "event_type").collect()
    val batch = EventQueries.queries("q80_tumbling_window")(spark, sf).collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming sliding windows equal the batch aggregation") {
    val streamed = StreamingPipelines.runToCompletion(spark,
        StreamingPipelines.eventsStream(spark, sf)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n")))
      .select(col("window.start").as("window_start"), col("n"))
      .orderBy("window_start").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
      .orderBy("window_start").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("TopKAgg heap state merges across MULTIPLE micro-batches") {
    // the graded q143 sees the single events file in one micro-batch;
    // this pin splits the source 4 ways and throttles to one file per
    // trigger, so the final heap is the result of state-store merges
    // across four batches — it must still equal the batch top-k
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_files").toString
    Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .groupBy("event_type")
      .agg(graft.functions.TopKAgg.topk(col("value"), col("event_id"), 5).as("top"))
    val got = StreamingPipelines.runToCompletion(spark, stream)
      .select(col("event_type"), posexplode(col("top")).as(Seq("idx", "e")))
      .select(col("event_type"), col("e.id"), col("e.score"))
      .orderBy("event_type", "idx").collect()
    val want = EventQueries.queries("q127_topk_aggregate")(spark, sf)
      .select(col("event_type"), col("event_id"), col("value")).collect()
    assert(got.toSeq == want.toSeq)
  }

  test("KMVAgg sketch state merges across MULTIPLE micro-batches") {
    // the q143 contract for the second TypedImperativeAggregate: split
    // the source 4 ways, one file per trigger — the final sketch is
    // built from state-store set-union merges across four batches and
    // must equal the batch q169 result exactly
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv_files").toString
    Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("m"))
      .withColumn("h", expr(graft.ops.md5Bits32("m")))
      .groupBy("event_type")
      .agg(graft.functions.KMVAgg.kmv(col("h"), 64).as("sk"))
    val got = StreamingPipelines.runToCompletion(spark, stream)
      .select(col("event_type"), col("sk.cnt"), col("sk.kth"), col("sk.est"))
      .orderBy("event_type").collect()
    val want = ops.SketchQueries.queries("q169_kmv_aggregate")(spark, sf)
      .collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("planted defect 'q170_kmv_merge_drops_other' loses whole batches " +
      "across the state store — the multi-batch red-case") {
    // The partial-merge defect class ONLY shows where merge() actually
    // runs: map-side partials in batch, and — the case this test pins —
    // the state-store set-union across micro-batches. Same 4-batch
    // shape as the green test above, but with the knob on the final
    // sketches must NOT equal the batch q169 truth (dropped `other`
    // loses batches 2-4 and/or sibling partitions). A single-buffer
    // unit test would pass the defect silently; this one cannot.
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv_mut").toString
    Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    def run(): Seq[Seq[Any]] = {
      // construct INSIDE the knob scope: kmv() resolves the knob at
      // plan-construction time, never per-merge
      val stream = spark.readStream
        .schema(Tables.events(spark, sf).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .select(col("event_type"), md5(col("user_id").cast("string")).as("m"))
        .withColumn("h", expr(graft.ops.md5Bits32("m")))
        .groupBy("event_type")
        .agg(graft.functions.KMVAgg.kmv(col("h"), 64).as("sk"))
      StreamingPipelines.runToCompletion(spark, stream)
        .select(col("event_type"), col("sk.cnt"), col("sk.kth"), col("sk.est"))
        .orderBy("event_type").collect().map(_.toSeq).toSeq
    }
    val want = run()
    val mutated = Mutations.withMutation("q170_kmv_merge_drops_other")(run())
    assert(mutated != want,
      "dropping merge's `other` side did NOT change the multi-batch " +
        "sketch — the cross-batch merge path is untested")
    assert(run() == want, "knob leaked into later stream constructions")
  }

  test("BitmapAgg bitmap state ORs across MULTIPLE micro-batches") {
    // the q143/q170 contract for the third TypedImperativeAggregate:
    // split the source 4 ways, one file per trigger — the final bitmap
    // is built from state-store word-OR merges across four batches and
    // its exact count must equal the batch countDistinct
    val dir = java.nio.file.Files.createTempDirectory("graft_bm_files").toString
    Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .filter(col("value") >= 190.0)
      .groupBy("event_type")
      .agg(graft.functions.BitmapAgg.bitmap(col("user_id"), 65536).as("b"))
    val got = StreamingPipelines.runToCompletion(spark, stream)
      .select(col("event_type"), col("b.cnt"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Tables.events(spark, sf).filter(col("value") >= 190.0)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("stream-static join enriches events against a dimension") {
    // static side: user_id → customer name (broadcastable dim)
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val joined = StreamingPipelines.eventsStream(spark, sf)
      .join(dim, Seq("user_id"), "left")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val streamed = StreamingPipelines.runToCompletion(spark, joined)
      .orderBy("c_mktsegment").collect()
    val batch = Tables.events(spark, sf).join(dim, Seq("user_id"), "left")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streamed skip-gram counts equal the batch co-occurrence table") {
    // the shared skipgramPairs seam runs statelessly on the streaming
    // DataFrame; Complete-mode counts must equal q286's batch table
    val streamed = ext.TextQueries.queries("q295_stream_skipgram")(spark, sf)
      .collect()
    val batch = ext.TextQueries.queries("q286_skipgram_counts")(spark, sf)
      .collect()
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("foreachBatch sink lands per-batch parquet output") {
    val out = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    val q = StreamingPipelines.eventsStream(spark, sf)
      .select("event_id", "event_type")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(s"$out/batch")
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val landed = spark.read.parquet(s"$out/batch")
    assert(landed.count() == Tables.events(spark, sf).count())
  }

  test("streaming dedup drops duplicate event_ids") {
    // duplicate the stream by unioning it with itself, then streaming
    // dropDuplicates must restore exactly the distinct id count
    val base = StreamingPipelines.eventsStream(spark, sf)
    val doubled = base.union(base).select("event_id", "event_type")
    val deduped = doubled.dropDuplicates("event_id")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val got = StreamingPipelines.runToCompletion(spark, deduped)
      .orderBy("event_type").collect()
    val want = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("fslist streams new objects as micro-batches (continuous inventory)") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_stream_inv")
    def put(name: String, mtimeMs: Long): Unit = {
      val p = Files.createFile(dir.resolve(name))
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtimeMs))
    }
    for (f <- 0 until 5) put(s"gen1_$f", 1700000000000L)
    val name = "graft_inv_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = spark.readStream.format("graft.sources.FsListSource")
      .option("path", dir.toString).load()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 5, "first batch must emit the initial objects")
      for (f <- 0 until 3) put(s"gen2_$f", 1700000001000L)
      q.processAllAvailable()
      val rows = spark.table(name)
      assert(rows.count() == 8, "second batch must emit exactly the new objects")
      assert(rows.select("Key").distinct().count() == 8, "no object may be re-emitted")
      // idle trigger: nothing new → nothing emitted
      q.processAllAvailable()
      assert(spark.table(name).count() == 8)
    } finally q.stop()
  }

  test("foreachBatch manifest maintenance folds batches into one snapshot") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_maintain_src")
    val snapRoot = Files.createTempDirectory("graft_maintain_snap").toString
    def put(name: String, mtimeMs: Long, bytes: Int = 0): Unit = {
      val p = dir.resolve(name)
      Files.write(p, Array.fill[Byte](bytes)('x'))
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtimeMs))
    }
    for (f <- 0 until 4) put(s"obj$f", 1700000000000L, bytes = f)
    val maintainer = new graft.streaming.StreamingPipelines
      .ManifestMaintainer(spark, snapRoot)
    val q = spark.readStream.format("graft.sources.FsListSource")
      .option("path", dir.toString).load()
      .writeStream.outputMode("append").foreachBatch(maintainer).start()
    try {
      q.processAllAvailable()
      def snapMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
        df.select("Key", "Size").collect()
          .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
      val s1 = snapMap(maintainer.current().get)
      assert(s1 == Map("obj0" -> 0L, "obj1" -> 1L, "obj2" -> 2L, "obj3" -> 3L))
      // snapshots are FULL manifests committed through the DSv2 write
      // half (r15 verdict stretch 7): manifest schema at read-back,
      // _SUCCESS marker present, staging prefix cleaned
      assert(maintainer.current().get.columns.toSeq ==
        Seq("Bucket", "Key", "FileName", "Size", "LastModified"))
      val vDirs = new java.io.File(snapRoot).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
      assert(vDirs.nonEmpty)
      vDirs.foreach { vd =>
        val names = vd.list().toSeq
        assert(names.contains("_SUCCESS"), s"$vd missing DSv2 _SUCCESS")
        assert(!names.exists(_.startsWith("_staging")), s"$vd staging litter")
        assert(names.exists(n => n.startsWith("part-") && n.endsWith(".parquet")))
      }
      // second wave: two new objects AND an overwrite of obj1 (newer
      // mtime, bigger size) — the maintainer must upsert, not append
      put("obj4", 1700000001000L, bytes = 40)
      put("obj1", 1700000001000L, bytes = 11)
      q.processAllAvailable()
      val s2 = snapMap(maintainer.current().get)
      assert(s2 == Map("obj0" -> 0L, "obj1" -> 11L, "obj2" -> 2L,
        "obj3" -> 3L, "obj4" -> 40L))
      // at most two snapshot versions on disk (older ones retired)
      val versions = new java.io.File(snapRoot).list().count(_.startsWith("v"))
      assert(versions <= 2, s"expected <= 2 retained versions, got $versions")
      // restart: a NEW maintainer over the same root resumes the committed
      // snapshot from the _CURRENT pointer instead of starting empty
      val resumed = new graft.streaming.StreamingPipelines
        .ManifestMaintainer(spark, snapRoot)
      val s3 = snapMap(resumed.current().get)
      assert(s3 == s2, "restarted maintainer must resume the committed snapshot")
      // time travel: both retained versions are readable (v1 = current,
      // v0 = previous); unwritten versions raise — the q124 read API
      assert(resumed.asOf(1).count() == 5)
      assert(resumed.asOf(0).count() == 4)
      intercept[IllegalArgumentException](resumed.asOf(2))
    } finally q.stop()
  }

  test("maxObjectsPerTrigger drains a backlog in bounded batches") {
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_bounded")
    for (f <- 0 until 6) {
      val p = Files.createFile(dir.resolve(s"obj$f"))
      Files.setLastModifiedTime(p, FileTime.fromMillis(1700000000000L + f * 1000))
    }
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.Set.empty[String]
    val q = spark.readStream.format("graft.sources.FsListSource")
      .option("path", dir.toString)
      .option("maxObjectsPerTrigger", "2").load()
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val keys = b.select("Key").collect().map(_.getString(0))
        if (keys.nonEmpty) { batchSizes += keys.length.toLong; seen ++= keys }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.size == 6, s"all objects must be emitted exactly once, got $seen")
      assert(batchSizes.length >= 2,
        s"a 6-object backlog at maxObjectsPerTrigger=2 must take several batches: $batchSizes")
      assert(batchSizes.forall(_ <= 4),
        s"each batch must stay near the bound (mtime-granular): $batchSizes")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the FULL backlog under maxObjectsPerTrigger") {
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_avnow")
    for (f <- 0 until 7) {
      val p = Files.createFile(dir.resolve(s"obj$f"))
      Files.setLastModifiedTime(p, FileTime.fromMillis(1700000000000L + f * 1000))
    }
    val name = "graft_avnow_" + java.util.UUID.randomUUID.toString.replace("-", "")
    // an under-reporting latestOffset would make AvailableNow stop after
    // ~3 objects and report clean completion — reportLatestOffset pins
    // the true end, so the query must emit all 7 before terminating
    val q = spark.readStream.format("graft.sources.FsListSource")
      .option("path", dir.toString)
      .option("maxObjectsPerTrigger", "3").load()
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query must terminate")
      assert(spark.table(name).select("Key").distinct().count() == 7,
        "the full backlog must drain before AvailableNow stops")
    } finally q.stop()
  }

  test("streaming inventory offset never rewinds after restart") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_offset")
    val scan = new graft.sources.FsListScan(dir.toString, "/", None)
    val stream = new graft.sources.FsListMicroBatchStream(dir.toString, scan)
    // restore a checkpointed offset over a now-EMPTY directory (the
    // newest objects were deleted while the stream was down): the probe
    // sees nothing, but the restored high-water mark must hold — a
    // rewound offset log would re-emit any mtime-preserving re-appearance
    stream.deserializeOffset("""{"maxMtimeMs":1700000005000}""")
    val latest = stream.latestOffset(stream.initialOffset(),
        stream.getDefaultReadLimit).asInstanceOf[graft.sources.FsListOffset]
    assert(latest.maxMtimeMs == 1700000005000L, "offset must not rewind")
    intercept[IllegalArgumentException] {
      graft.sources.FsListOffset.parse("""{"bogus":1}""")
    }
  }

  test("persistent probe failures fail the stream instead of idling forever") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_probe_fail")
    val scan = new graft.sources.FsListScan(dir.toString, "/", None)
    val stream = new graft.sources.FsListMicroBatchStream(dir.toString, scan)
    // mid-stream state (a successful history), then the path vanishes
    stream.deserializeOffset("""{"maxMtimeMs":1700000005000}""")
    Files.delete(dir)
    val cap = graft.sources.FsListMicroBatchStream.MaxConsecutiveProbeFailures
    // the first cap-1 failed probes are swallowed no-op triggers...
    for (_ <- 1 until cap) {
      val o = stream.latestOffset(stream.initialOffset(),
        stream.getDefaultReadLimit).asInstanceOf[graft.sources.FsListOffset]
      assert(o.maxMtimeMs == 1700000005000L, "failed probe must hold the high-water mark")
    }
    // ...the cap-th consecutive failure propagates and fails the query
    intercept[Exception] {
      stream.latestOffset(stream.initialOffset(), stream.getDefaultReadLimit)
    }
  }

  test("offset probe is scoped to the pushed Key prefix") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_probe_prefix")
    def put(name: String, mtimeMs: Long): Unit = {
      val p = Files.createFile(dir.resolve(name))
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtimeMs))
    }
    put("a_in", 1700000001000L)
    put("b_out", 1700000009000L) // newer, but OUTSIDE the subscription
    val scan = new graft.sources.FsListScan(dir.toString, "/", Some(s"$dir/a"))
    val stream = new graft.sources.FsListMicroBatchStream(dir.toString, scan)
    val latest = stream.latestOffset(stream.initialOffset(),
      stream.getDefaultReadLimit).asInstanceOf[graft.sources.FsListOffset]
    // an out-of-prefix object must not advance the offset (it would widen
    // the boundary-mtime miss window for in-prefix objects)
    assert(latest.maxMtimeMs == 1700000001000L,
      s"offset must track only the subscribed prefix, got ${latest.maxMtimeMs}")
  }

  test("flatMapGroupsWithState sessionization agrees with batch session counts") {
    // batch sessionization (oracle-verified q82): sessions per user
    val batch = EventQueries.queries("q82_sessionize")(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
      .orderBy("user_id").collect()
    // stateful operator emits only CLOSED sessions; the final open session
    // per user stays in state → expect exactly one fewer per user
    val streamed = StreamingPipelines.sessionize(spark, Tables.events(spark, sf))
      .groupBy("user_id").agg(count(lit(1)).as("n_closed"),
        sum(col("n_events")).as("n_events"))
      .orderBy("user_id").collect()
    val batchMap = batch.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val streamMap = streamed.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(batchMap.keySet == streamMap.keySet)
    batchMap.foreach { case (uid, (nSess, _)) =>
      assert(streamMap(uid)._1 == nSess - 1,
        s"user $uid: closed=${streamMap(uid)._1}, batch=$nSess")
    }
  }

  test("streamed mixture sampling is row-identical to the batch pass") {
    // the deterministic-draw property graded by q198: no rand(), no
    // state — a streamed corpus must sample exactly what batch q187 does
    val streamRows = ext.CurationQueries.queries("q198_stream_mixture")(spark, sf)
      .collect().toSeq
    val batchRows = ext.CurationQueries.queries("q187_mixture_sample")(spark, sf)
      .collect().toSeq
    assert(streamRows.nonEmpty && streamRows == batchRows,
      s"stream/batch divergence: ${streamRows.diff(batchRows)}")
  }

  test("streamed corpus report equals the batch report on shared columns") {
    // q208 streams the (source, lang) census; q203 computes it in batch.
    // Deterministic integer aggregates must make the two row-identical
    // on every column both produce (q203 additionally reports dup_docs,
    // which needs a distinct and is batch-only).
    val shared = Seq("source", "n_docs", "total_tokens", "pct_en",
      "mean_chars", "lang_entropy")
    val streamRows = ext.SelectionQueries
      .queries("q208_stream_corpus_report")(spark, sf)
      .select(shared.map(col): _*).collect().toSeq
    val batchRows = ext.SelectionQueries
      .queries("q203_corpus_report")(spark, sf)
      .select(shared.map(col): _*).collect().toSeq
    assert(streamRows.nonEmpty && streamRows == batchRows,
      s"stream/batch divergence: ${streamRows.diff(batchRows)}")
  }

  // ------------------------------------------------------------------
  // Events data-contract tests (round-7 lesson: the fixture's ts unit
  // flipped from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and a silent
  // assumption produced 25 wrong answers). These pin: (a) batch AND
  // streaming results are identical on micros- and nanos-typed copies
  // of the same data; (b) a mangled fixture fails loudly.
  // ------------------------------------------------------------------

  /** Write an events file with an explicit Parquet TIMESTAMP(`unit`)
    * annotation on `ts`. `tsScale` multiplies the micros value into the
    * target unit's raw encoding (1000 for a true nanos file, 1 to mangle).
    */
  private def writeEventsFile(path: String, unit: org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit,
      rows: Array[org.apache.spark.sql.Row], tsScale: Long): Unit = {
    import org.apache.parquet.schema.{Types, LogicalTypeAnnotation => LTA}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LTA.timestampType(false, unit)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LTA.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .optional(BINARY).as(LTA.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter.builder(new org.apache.hadoop.fs.Path(path))
      .withConf(spark.sessionState.newHadoopConf())
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = gf.newGroup()
      g.add("event_id", r.getLong(0))
      g.add("ts", r.getLong(1) * tsScale)
      g.add("user_id", r.getLong(2))
      g.add("event_type", r.getString(3))
      g.add("value", r.getDouble(4))
      if (!r.isNullAt(5)) g.add("props", r.getString(5))
      writer.write(g)
    } finally writer.close()
  }

  private lazy val eventsRawRows: Array[org.apache.spark.sql.Row] =
    Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .collect()

  test("events contract: batch queries identical on micros- and nanos-typed fixtures") {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val base = java.nio.file.Files.createTempDirectory("ev-contract").toString
    val usDir = s"$base/us"; val nsDir = s"$base/ns"
    new java.io.File(usDir).mkdirs(); new java.io.File(nsDir).mkdirs()
    writeEventsFile(s"$usDir/events.parquet", TimeUnit.MICROS, eventsRawRows, 1L)
    writeEventsFile(s"$nsDir/events.parquet", TimeUnit.NANOS, eventsRawRows, 1000L)
    for (q <- Seq("q80_tumbling_window", "q82_sessionize", "q164_session_window")) {
      val a = EventQueries.queries(q)(spark, usDir).collect()
      val b = EventQueries.queries(q)(spark, nsDir).collect()
      assert(a.nonEmpty && a.toSeq == b.toSeq, s"$q diverges between µs and ns fixtures")
    }
  }

  test("events contract: streaming source identical on micros- and nanos-typed fixtures") {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val base = java.nio.file.Files.createTempDirectory("ev-contract-stream").toString
    val usDir = s"$base/us"; val nsDir = s"$base/ns"
    new java.io.File(usDir).mkdirs(); new java.io.File(nsDir).mkdirs()
    writeEventsFile(s"$usDir/events.parquet", TimeUnit.MICROS, eventsRawRows, 1L)
    writeEventsFile(s"$nsDir/events.parquet", TimeUnit.NANOS, eventsRawRows, 1000L)
    def run(dir: String) = StreamingPipelines.runToCompletion(spark,
        StreamingPipelines.tumblingCounts(StreamingPipelines.eventsStream(spark, dir)))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total_value"))
      .orderBy("ws", "event_type").collect()
    val a = run(usDir); val b = run(nsDir)
    assert(a.nonEmpty && a.toSeq == b.toSeq, "streaming diverges between µs and ns fixtures")
  }

  test("table contract: a fixture with a dropped column fails loudly at load") {
    val dir = java.nio.file.Files.createTempDirectory("tbl-mangled").toString
    // a "documents" fixture missing the text column — the generalized
    // round-7 failure shape (driver regenerates, schema silently differs)
    spark.range(5).selectExpr("id AS doc_id", "'en' AS lang")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] { Tables.documents(spark, dir) }
    assert(e.getMessage.contains("testdata contract violation") &&
      e.getMessage.contains("text"),
      s"expected a loud schema error naming the column, got: ${e.getMessage}")
  }

  test("table contract: a fixture regenerated at the same path re-validates") {
    // the contract caches key on (path, mtime, length) — a driver
    // regeneration at the SAME path must re-run the guard, not reuse
    // the first load's verdict
    val dir = java.nio.file.Files.createTempDirectory("tbl-regen").toString
    val docs = s"$dir/documents.parquet"
    spark.range(5).selectExpr("id AS doc_id", "'t' AS text", "'en' AS lang",
      "'web' AS source", "1 AS n_chars").write.parquet(docs)
    assert(Tables.documents(spark, dir).count() == 5) // caches the verdict
    // regenerate in place with a mangled schema (text dropped)
    spark.range(3).selectExpr("id AS doc_id", "'en' AS lang")
      .write.mode("overwrite").parquet(docs)
    val e = intercept[IllegalArgumentException] { Tables.documents(spark, dir) }
    assert(e.getMessage.contains("testdata contract violation"),
      s"stale cached verdict bypassed the guard: ${e.getMessage}")
  }

  test("events contract: a ts-sorted multi-part directory passes the span guard") {
    // each part then covers a small slice of the timeline — the guard
    // must combine footer stats ACROSS parts, not judge part-00000 alone
    val dir = java.nio.file.Files.createTempDirectory("ev-multipart").toString
    // µs output (not Spark's default INT96) so each part carries usable
    // INT64 footer stats and the cross-part combine is really exercised
    val prior = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try Tables.events(spark, sf)
      // explicit N disables AQE coalescing: 4 ts-ranged parts, each
      // covering only a slice of the timeline
      .repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
      .write.parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prior)
    val parts = new java.io.File(s"$dir/events.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts > 1, s"fixture must be multi-part to exercise the combine (got $parts)")
    val n = Tables.events(spark, dir).count()
    assert(n == Tables.events(spark, sf).count())
  }

  test("streamed latency quantiles equal the batch census exactly") {
    // the q239 contract: the cent histogram is the streaming state, so
    // the final Complete-mode census must reproduce q228's batch
    // quantiles bit-for-bit — resumable ingest loses nothing
    val streamed = MonitoringQueries.queries("q239_stream_latency_quantiles")(spark, sf)
      .collect()
    val batch = MonitoringQueries.queries("q228_latency_quantiles")(spark, sf)
      .collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("events contract: a unit-mangled fixture fails loudly, not silently") {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val dir = java.nio.file.Files.createTempDirectory("ev-mangled").toString
    // micros-scale raw values annotated as NANOS: the resolved span
    // collapses 1000× (days → minutes) — exactly round 7's failure mode
    writeEventsFile(s"$dir/events.parquet", TimeUnit.NANOS, eventsRawRows, 1L)
    val e = intercept[RuntimeException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("events contract violation"),
      s"expected a loud contract error, got: ${e.getMessage}")
  }
}
