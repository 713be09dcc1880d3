package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode

/** Pins the truncate-commit ordering fixed after the r15 advice: the old
  * delete-then-rename order could destroy BOTH generations when a rename
  * failed mid-loop (old already deleted, new partially published, abort
  * cleaning neither). Now commit publishes the whole new generation
  * FIRST, deletes the superseded files LAST, and a failed commit's abort
  * rolls back exactly the files it had already renamed in.
  *
  * The failure is injected for real: a commit message pointing at a
  * staged file that does not exist makes the second rename return false
  * mid-loop, exactly the crash point the advice describes.
  */
class ManifestWriteOrderSpec extends graft.SparkSpec {
  import graft.manifest.ManifestGen

  private def entries(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map(i =>
      ManifestGen.ManifestEntry("b", s"/d/$tag$i.bin", s"$tag$i.bin",
        10L + i, new java.sql.Timestamp(1700000000000L + i))).toDF()
  }

  test("failed truncate commit keeps the old generation intact and abort " +
      "rolls back the partial publish") {
    val dir = Files.createTempDirectory("mw-order").toFile
    dir.deleteOnExit()
    val dest = dir.getAbsolutePath

    // generation 1 through the real DSv2 path
    entries(4, "a").repartition(2)
      .write.format("graft.sources.FsListSource")
      .option("path", dest).mode(SaveMode.Append).save()
    def partFiles: Set[String] =
      Option(dir.listFiles()).toSeq.flatten.map(_.getName)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet")).toSet
    val gen1 = partFiles
    assert(gen1.size == 2, s"expected 2 gen-1 part files, got $gen1")

    // hand-drive a truncate commit whose SECOND rename fails: one staged
    // file is real, the other never existed
    val write = new ManifestBatchWrite(dest, truncate = true, queryId = "order-test")
    val staging = Paths.get(dest, "_staging-order-test")
    Files.createDirectories(staging)
    val realStaged = staging.resolve("part-00000-77-deadbeef.parquet")
    Files.write(realStaged, Array[Byte](1, 2, 3))
    val messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(
        ManifestCommit(realStaged.toString, 1L),
        ManifestCommit(staging.resolve("part-00001-78-cafebabe.parquet").toString, 1L))

    val e = intercept[java.io.IOException] { write.commit(messages) }
    // local FS throws FileNotFound from rename; MemFileSystem-style stores
    // return false and hit our explicit IOException — both are mid-loop
    assert(e.getMessage.contains("rename") || e.getMessage.contains("not exist"),
      e.getMessage)
    // the crash point: old generation must still be FULLY present — the
    // pre-fix order had already deleted it here
    assert(gen1.subsetOf(partFiles),
      s"old generation lost on failed commit: had $gen1, now $partFiles")

    // Spark calls abort after a failed commit: the one file the loop DID
    // rename in must be rolled back, staging dropped, old generation kept
    write.abort(messages)
    assert(partFiles == gen1,
      s"abort must remove the partially published file: $partFiles vs $gen1")
    assert(!Files.exists(staging), "abort must drop the staging prefix")
    assert(!Files.exists(Paths.get(dest, "part-00000-77-deadbeef.parquet")))

    // and the data is still readable as generation 1
    assert(ManifestGen.read(spark, dest).count() == 4)

    // a clean truncate commit afterwards still leaves exactly one
    // generation (the happy path the ordering change must not break)
    entries(3, "b").coalesce(1)
      .write.format("graft.sources.FsListSource")
      .option("path", dest).mode(SaveMode.Overwrite).save()
    assert(ManifestGen.read(spark, dest).count() == 3)
    assert(partFiles.intersect(gen1).isEmpty,
      "superseded generation must be deleted after a successful commit")
  }

  test("abort past the point of no return keeps the published new generation") {
    // once the new generation is fully renamed in and the superseded
    // files are being deleted, a failure (e.g. the _SUCCESS create)
    // still triggers Spark's abort — but rolling back the new files
    // THEN would destroy both generations. The commit clears its
    // rollback ledger at the point of no return, so a post-commit
    // abort must be a staging-only cleanup.
    val dir = Files.createTempDirectory("mw-ponr").toFile
    dir.deleteOnExit()
    val dest = dir.getAbsolutePath
    entries(2, "a").coalesce(1)
      .write.format("graft.sources.FsListSource")
      .option("path", dest).mode(SaveMode.Append).save()
    val write = new ManifestBatchWrite(dest, truncate = true, queryId = "ponr")
    val staging = Paths.get(dest, "_staging-ponr")
    Files.createDirectories(staging)
    // stage a real parquet the commit can rename in: reuse gen-1's file
    // bytes under a staged name
    val gen1File = Option(dir.listFiles()).toSeq.flatten
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val stagedName = "part-00000-99-0badf00d.parquet"
    Files.copy(gen1File.toPath, staging.resolve(stagedName))
    val messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(ManifestCommit(staging.resolve(stagedName).toString, 2L))
    write.commit(messages) // succeeds: new generation published, old deleted
    def parts: Set[String] = Option(dir.listFiles()).toSeq.flatten
      .map(_.getName).filter(n => n.startsWith("part-") && n.endsWith(".parquet")).toSet
    assert(parts == Set(stagedName))
    // Spark may still call abort if something AFTER commit's publish
    // throws at the coordinator — it must not touch the published files
    write.abort(messages)
    assert(parts == Set(stagedName),
      "post-publish abort must keep the new generation intact")
    assert(ManifestGen.read(spark, dest).count() == 2)
  }

  test("mixed-generation destination (crash between fence and deletes) " +
      "reads as the committed generation only") {
    // r16 advice: a failure AFTER the point of no return used to leave
    // both generations' part files visible to an unfenced glob —
    // silently duplicated rows. The fence (_SUCCESS records the
    // committed names, written BEFORE the superseded deletes) makes the
    // read path filter to the new generation even with the old files
    // still on disk.
    val dir = Files.createTempDirectory("mw-fence").toFile
    dir.deleteOnExit()
    val dest = dir.getAbsolutePath
    entries(4, "a").repartition(2)
      .write.format("graft.sources.FsListSource")
      .option("path", dest).mode(SaveMode.Append).save()
    def parts: Set[String] = Option(dir.listFiles()).toSeq.flatten
      .map(_.getName).filter(n => n.startsWith("part-") && n.endsWith(".parquet")).toSet
    val gen1 = parts
    assert(gen1.size == 2)
    // stash gen-1's files, run a clean truncate commit (which deletes
    // them), then RESTORE them — byte-identical to a crash that stopped
    // between the fence write and the superseded deletes
    val stash = Files.createTempDirectory("mw-fence-stash")
    gen1.foreach(n => Files.copy(Paths.get(dest, n), stash.resolve(n)))
    entries(3, "b").coalesce(1)
      .write.format("graft.sources.FsListSource")
      .option("path", dest).mode(SaveMode.Overwrite).save()
    val gen2 = parts
    assert(gen2.intersect(gen1).isEmpty && gen2.size == 1)
    gen1.foreach(n => Files.copy(stash.resolve(n), Paths.get(dest, n)))
    assert(parts == gen1 ++ gen2, "both generations on disk — the crash state")
    // the fenced read returns ONLY the committed generation's rows
    val got = ManifestGen.read(spark, dest)
    assert(got.count() == 3,
      s"fenced read must exclude the superseded generation (got ${got.count()})")
    import spark.implicits._
    assert(got.select("FileName").as[String].collect().toSet ==
      Set("b0.bin", "b1.bin", "b2.bin"))
    // and a directory with a LEGACY empty _SUCCESS still glob-reads
    Files.write(Paths.get(dest, "_SUCCESS"), Array.emptyByteArray)
    assert(ManifestGen.read(spark, dest).count() == 7,
      "empty fence must fall back to the plain directory read")
  }
}
