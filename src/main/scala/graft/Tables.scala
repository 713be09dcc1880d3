package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md §B). Every query receives `sfDir` and loads through here so
  * path handling lives in one place. Parquet scans get column pruning +
  * predicate pushdown from Catalyst for free.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Columns every query layer assumes per table. The full events incident
    * (round 7) generalized: a driver-side fixture regeneration that drops
    * or renames a column should fail HERE with one error naming table and
    * column, not as N obscure analysis errors downstream. Plan-time only —
    * `spark.read.parquet` resolves the schema from footers, no data scan —
    * and deliberately a SUBSET check: added columns are fine.
    */
  private val RequiredCols: Map[String, Seq[String]] = Map(
    "region"    -> Seq("r_regionkey", "r_name"),
    "nation"    -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"  -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
    "supplier"  -> Seq("s_suppkey", "s_name", "s_nationkey"),
    "part"      -> Seq("p_partkey", "p_name"),
    "orders"    -> Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
    "lineitem"  -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding"))

  private val schemaChecked = new ConcurrentHashMap[String, Boolean]()

  /** Cache key for per-fixture contract verdicts: path PLUS a change
    * fingerprint, so a fixture regenerated mid-session at the same path
    * (the documented driver workflow) re-validates instead of silently
    * reusing a stale verdict. Single files key on (mtime, length). A
    * DIRECTORY's own length is a filesystem constant and its mtime can
    * have coarse granularity (1 s on several filesystems — a fast
    * in-place regeneration would collide), so directories key on the
    * children's (name, length, mtime) set instead: one listStatus per
    * load, noise next to the query it fronts. */
  private def fixtureKey(s: SparkSession, path: String): String = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
    val st = fs.getFileStatus(hp)
    if (st.isDirectory) {
      val kids = fs.listStatus(hp)
        .map(c => s"${c.getPath.getName}:${c.getLen}:${c.getModificationTime}")
        .sorted.mkString(",")
      s"$path@dir:${kids.hashCode}:${kids.length}"
    } else s"$path@${st.getModificationTime}:${st.getLen}"
  }

  private def checked(s: SparkSession, d: String, name: String): DataFrame = {
    val df = load(s, d, name)
    schemaChecked.computeIfAbsent(fixtureKey(s, s"$d/$name.parquet"), { _ =>
      val have = df.schema.fieldNames.toSet
      val missing = RequiredCols.getOrElse(name, Nil).filterNot(have)
      require(missing.isEmpty,
        s"testdata contract violation: $d/$name.parquet is missing " +
          s"column(s) ${missing.mkString(", ")} (found: ${have.toSeq.sorted.mkString(", ")}). " +
          "The fixture's schema changed; update the queries/oracles deliberately.")
      true
    })
    df
  }

  def region(s: SparkSession, d: String): DataFrame    = checked(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = checked(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = checked(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = checked(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = checked(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = checked(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = checked(s, d, "lineitem")

  /** Resolved time unit + footer-stats span (in micros) for one events file. */
  private[graft] final case class TsContract(unit: TimeUnit, spanMicros: Long, file: String)

  /** Per-part-file footer stats (micros): building block of [[TsContract]]. */
  private final case class FileTsStats(unit: TimeUnit, minMicros: Long,
      maxMicros: Long, spanMicros: Long, file: String)

  private val tsContractCache = new ConcurrentHashMap[String, TsContract]()

  /** Read the `ts` column's Parquet logical type annotation and min/max
    * statistics straight from the footer (no data scan). The fixture has
    * flipped between TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across driver
    * regenerations, so the unit MUST come from the file, never be assumed.
    *
    * Directory fixtures footer-read EVERY part: the span guard needs the
    * global min/max (a ts-sorted write gives each part a tiny span — the
    * first part alone would trip a false violation), and a mixed-unit
    * directory must fail loudly rather than decide off part-00000.
    */
  private[graft] def eventsTsContract(s: SparkSession, path: String): TsContract =
    // keyed on (path, mtime, length) — see fixtureKey: a regenerated
    // events fixture must re-resolve its unit, not reuse the old verdict
    tsContractCache.computeIfAbsent(fixtureKey(s, path), { _ =>
      val p = path
      val conf = s.sessionState.newHadoopConf()
      val hp   = new Path(p)
      val fs   = hp.getFileSystem(conf)
      val files: Seq[Path] =
        if (fs.getFileStatus(hp).isDirectory) {
          val parts = fs.listStatus(hp).map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
            .sortBy(_.getName).toSeq
          if (parts.isEmpty) sys.error(s"events contract: no parquet part files under $p")
          parts
        } else Seq(hp)
      val perFile = files.map(f => oneFileContract(conf, f))
      val units = perFile.map(_.unit).distinct
      require(units.size == 1,
        s"events contract: $p mixes ts units across part files (${units.mkString(", ")})")
      // combine to the global span: per-file spans were computed from each
      // footer's min/max in the SAME resolved unit, already in micros
      if (perFile.exists(_.spanMicros == Long.MaxValue))
        TsContract(units.head, Long.MaxValue, perFile.head.file)
      else {
        val mins = perFile.map(_.minMicros).min
        val maxs = perFile.map(_.maxMicros).max
        TsContract(units.head, maxs - mins, perFile.head.file)
      }
    })

  private def oneFileContract(conf: org.apache.hadoop.conf.Configuration,
                              file: Path): FileTsStats = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        import scala.jdk.CollectionConverters._
        // explicit-schema reads return NULLS for absent columns instead of
        // failing, so column presence must be checked here, off the footer
        val have = schema.getFields.asScala.map(_.getName).toSet
        val missing = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
          .filterNot(have)
        require(missing.isEmpty,
          s"testdata contract violation: $file is missing column(s) " +
            s"${missing.mkString(", ")} (found: ${have.toSeq.sorted.mkString(", ")})")
        val tsField = schema.getFields.asScala.find(_.getName == "ts")
          .getOrElse(sys.error(s"events contract: $file has no `ts` column"))
        val isInt96 = tsField.isPrimitive &&
          tsField.asPrimitiveType().getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96
        val unit = tsField.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit
          case null if isInt96 =>
            // legacy Spark/Hive INT96 timestamps carry no annotation;
            // Spark's native reader handles them, so route to the
            // TIMESTAMP-schema branch. Footer stats are binary → the span
            // guard degrades to a no-op for these files.
            return FileTsStats(TimeUnit.MICROS, 0L, 0L, Long.MaxValue, file.toString)
          case other =>
            sys.error(
              s"events contract: $file column `ts` is not a Parquet TIMESTAMP " +
                s"(logical type: $other). Refusing to guess the unit.")
        }
        val divisor = unit match {
          case TimeUnit.NANOS  => 1000000000L
          case TimeUnit.MICROS => 1000000L
          case TimeUnit.MILLIS => 1000L
        }
        var minV = Long.MaxValue
        var maxV = Long.MinValue
        for (rg <- reader.getFooter.getBlocks.asScala) {
          rg.getColumns.asScala.find(_.getPath.toDotString == "ts").foreach { cc =>
            val st = cc.getStatistics
            if (st != null && st.hasNonNullValue) {
              (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  minV = math.min(minV, mn); maxV = math.max(maxV, mx)
                case _ => // non-INT64 stats: skip, span guard degrades to no-op
              }
            }
          }
        }
        if (minV == Long.MaxValue) // no stats → span guard degrades to no-op
          FileTsStats(unit, 0L, 0L, Long.MaxValue, file.toString)
        else {
          def toMicros(v: Long): Long =
            (v / divisor) * 1000000L + ((v % divisor) * 1000000L) / divisor
          FileTsStats(unit, toMicros(minV), toMicros(maxV),
            toMicros(maxV) - toMicros(minV), file.toString)
        }
      } finally reader.close()
    }

  private val MinPlausibleSpanMicros = 24L * 3600 * 1000000      // 1 day
  private val MaxPlausibleSpanMicros = 50L * 365 * 24 * 3600 * 1000000 // 50 years

  /** Contract resolution + loud span guard, shared by the batch loader and
    * the streaming source. The resolved timeline span — footer min/max
    * stats in the RESOLVED unit, no data scan — must be days-to-decades: a
    * unit misread inflates or collapses it 1000×, so this fails with one
    * loud error naming the file and unit instead of producing dozens of
    * confidently wrong query results (the round-7 lesson).
    */
  private[graft] def checkedEventsContract(s: SparkSession, path: String): TsContract = {
    val c = eventsTsContract(s, path)
    if (c.spanMicros != Long.MaxValue &&
        (c.spanMicros < MinPlausibleSpanMicros || c.spanMicros > MaxPlausibleSpanMicros)) {
      sys.error(
        f"events contract violation: ${c.file} declares ts as TIMESTAMP(${c.unit}) " +
          f"but the footer-stats span in that unit is ${c.spanMicros / 1000000.0}%.1f s " +
          "— expected between 1 day and 50 years. The fixture's unit or encoding " +
          "changed; fix Tables.eventsTsContract's interpretation, don't trust results.")
    }
    c
  }

  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = s"$d/events.parquet"
    checkedEventsContract(s, path).unit match {
      case TimeUnit.NANOS =>
        s.read
          .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
          .parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        // MICROS / MILLIS: Spark's native timestamp reader handles these.
        // Explicit TimestampType schema (session TZ is UTC everywhere) so an
        // isAdjustedToUTC=false file doesn't flip the column to TIMESTAMP_NTZ
        // via inferTimestampNTZ and change downstream function semantics.
        s.read
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
          .parquet(path)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = checked(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = checked(s, d, "embeddings")
}
