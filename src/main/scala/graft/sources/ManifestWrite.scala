package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DSv2 WRITE half of the fslist connector (r14 verdict stretch 7): the
  * reference's upload leg (src/main.rs:321-359 — buffer the whole
  * manifest in RAM, then one PutObject) re-expressed as Spark's batch
  * commit protocol: every task streams its partition straight into its
  * OWN parquet file under a query-scoped staging prefix, the driver's
  * `commit` publishes all staged files at the destination atomically-
  * enough for object stores (move + `_SUCCESS` marker), and `abort` —
  * task- or job-level — removes exactly the staged garbage. No RAM
  * buffering, no single-writer bottleneck: at 100 TB the manifest itself
  * is big data and lands as one file per task, in parallel.
  *
  * The writer talks Hadoop `FileSystem` end to end (via the same shipped
  * fs.* property map the read side uses), so the identical code path
  * commits to local disk and to `s3a://` stores — exercised against the
  * in-process s3a MemFileSystem by ConnectorSpec, sandbox-style.
  *
  * Schema is the manifest contract ([[graft.manifest.ManifestGen.schema]])
  * and nothing else — a mismatched frame fails loudly at planning, not
  * as a corrupt file at read-back. `SaveMode.Overwrite` maps to DSv2
  * truncate, with publish-first/delete-last ordering: the commit renames
  * the whole new generation in, THEN deletes the superseded part files —
  * a crash mid-commit can leave extra files but never destroys the old
  * generation before the new one is fully at the destination, and a
  * failed commit's abort rolls back whatever it had already renamed.
  * Read-after-successful-commit sees exactly one generation.
  */
class ManifestWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val want = graft.manifest.ManifestGen.schema
    val got = info.schema()
    require(shapeOf(got) == shapeOf(want),
      s"fslist write requires the manifest schema ${shapeOf(want)}, " +
        s"got ${shapeOf(got)}")
    new ManifestBatchWrite(path, doTruncate, info.queryId())
  }

  private def shapeOf(s: StructType): Seq[(String, String)] =
    s.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
}

private[sources] class ManifestBatchWrite(path: String, truncate: Boolean,
                                          queryId: String)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  // ship the session's fs.* config exactly like the read side — a bare
  // Configuration on the executor would lack s3a credentials/endpoints
  private val fsProps: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val shipPrefixes = Seq("fs.", "hadoop.security.", "dfs.", "io.")
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .map(_.iterator().asScala.map(e => e.getKey -> e.getValue)
        .filter { case (k, _) => shipPrefixes.exists(k.startsWith) }.toMap)
      .getOrElse(Map.empty)
  }

  private def stagingDir = new Path(path, s"_staging-$queryId")

  // destinations this commit has already renamed in — driver-side state so
  // a failed commit's abort() can roll back the partial publish
  private val published = scala.collection.mutable.ArrayBuffer.empty[Path]

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val fs = new Path(path).getFileSystem(FsListReader.confFor(fsProps))
    fs.mkdirs(stagingDir)
    new ManifestWriterFactory(stagingDir.toString, fsProps)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(FsListReader.confFor(fsProps))
    // the new generation's file names are known up front from the task
    // commit messages (UUID-suffixed, so they can't collide with an older
    // generation's names — the filterNot is belt and braces)
    val newNames = messages.map { case m: ManifestCommit =>
      new Path(m.stagedFile).getName
    }.toSet
    // snapshot the SUPERSEDED generation before any mutation
    val superseded =
      if (truncate)
        Option(fs.globStatus(new Path(root, "part-*.parquet"))).toSeq.flatten
          .map(_.getPath).filterNot(p => newNames.contains(p.getName))
      else Seq.empty
    // publish FIRST: rename the whole new generation in. A rename failure
    // here throws with the old generation untouched; Spark then calls
    // abort(), which rolls back the files already renamed (`published`).
    messages.foreach { case m: ManifestCommit =>
      val src = new Path(m.stagedFile)
      val dst = new Path(root, src.getName)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"manifest commit: rename $src -> $dst failed")
      published += dst
    }
    // POINT OF NO RETURN: the new generation is fully published. From
    // here a failure (superseded delete, _SUCCESS create, staging
    // cleanup) must NOT trigger a rollback — abort() deleting the new
    // files after the old ones are gone would destroy BOTH generations,
    // the exact outcome the publish-first ordering exists to prevent.
    // Clearing the rollback ledger makes abort a staging-only cleanup
    // past this line; the destination keeps the complete new generation.
    published.clear()
    // FENCE before deleting: _SUCCESS records the committed
    // generation's file names, and it lands BEFORE the superseded
    // deletes — a crash mid-delete leaves both generations' part files
    // on disk, but every fenced read (ManifestGen.read) filters to the
    // recorded set instead of glob-reading duplicated rows (r16
    // advice). A crash between publish and fence leaves the OLD
    // generation's fence in place, so readers see the old snapshot —
    // the correct not-yet-committed view; the fence write is the
    // commit point.
    val committed: Seq[String] =
      if (truncate) newNames.toSeq.sorted
      else Option(fs.globStatus(new Path(root, "part-*.parquet"))).toSeq.flatten
        .map(_.getPath.getName).sorted // post-publish glob: old ∪ new
    val succ = fs.create(new Path(root, "_SUCCESS"), true)
    succ.write(committed.mkString("\n").getBytes("UTF-8"))
    succ.close()
    // delete LAST: only after the new generation is fully at the
    // destination may the old one go (r15 advice: the previous
    // delete-then-rename order could destroy both generations)
    superseded.foreach(p => fs.delete(p, false))
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(FsListReader.confFor(fsProps))
    // roll back any partial publish from a failed commit, then drop the
    // staged garbage; previously-published (old-generation) files stay
    published.foreach(p => fs.delete(p, false))
    fs.delete(stagingDir, true)
  }
}

private[sources] case class ManifestCommit(stagedFile: String, rows: Long)
    extends WriterCommitMessage

private[sources] class ManifestWriterFactory(stagingDir: String,
                                             fsProps: Map[String, String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(stagingDir, partitionId, taskId, fsProps)
}

private[sources] object ManifestDataWriter {
  /** The manifest contract as a parquet MessageType — matches what
    * `spark.read.parquet` maps back to [[graft.manifest.ManifestGen
    * .schema]] (strings, signed int64 Size, TIMESTAMP(MICROS, UTC)). */
  val MessageSchema: MessageType = Types.buildMessage()
    .required(PrimitiveTypeName.BINARY)
    .as(LogicalTypeAnnotation.stringType()).named("Bucket")
    .required(PrimitiveTypeName.BINARY)
    .as(LogicalTypeAnnotation.stringType()).named("Key")
    .required(PrimitiveTypeName.BINARY)
    .as(LogicalTypeAnnotation.stringType()).named("FileName")
    .required(PrimitiveTypeName.INT64).named("Size")
    .required(PrimitiveTypeName.INT64)
    .as(LogicalTypeAnnotation.timestampType(true,
      LogicalTypeAnnotation.TimeUnit.MICROS)).named("LastModified")
    .named("graft_manifest")
}

private[sources] class ManifestDataWriter(stagingDir: String, partitionId: Int,
                                          taskId: Long,
                                          fsProps: Map[String, String])
    extends DataWriter[InternalRow] {
  import ManifestDataWriter.MessageSchema

  private val file = new Path(stagingDir,
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.parquet")
  private var rows = 0L
  private val writer: ParquetWriter[org.apache.parquet.example.data.Group] = {
    val conf = new org.apache.hadoop.conf.Configuration(
      FsListReader.confFor(fsProps))
    GroupWriteSupport.setSchema(MessageSchema, conf)
    ExampleParquetWriter.builder(file)
      .withConf(conf)
      .withType(MessageSchema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withDictionaryEncoding(true)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    require((0 to 4).forall(!row.isNullAt(_)),
      "manifest columns are non-null by contract (null-defaulting happens " +
        "upstream in applyManifestSemantics)")
    val g = new SimpleGroup(MessageSchema)
    g.add("Bucket", row.getUTF8String(0).toString)
    g.add("Key", row.getUTF8String(1).toString)
    g.add("FileName", row.getUTF8String(2).toString)
    g.add("Size", row.getLong(3))
    g.add("LastModified", row.getLong(4)) // Spark internal = UTC micros
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    ManifestCommit(file.toString, rows)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    val fs = file.getFileSystem(FsListReader.confFor(fsProps))
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}
