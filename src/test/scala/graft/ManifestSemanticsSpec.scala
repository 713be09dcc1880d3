package graft

import graft.manifest.ManifestGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Reference scalar semantics (/root/reference/src/main.rs:361-390):
  * FileName = after-last-delimiter, null sentinels, epoch-0 fallback. */
class ManifestSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def fileName(key: String, delim: String): String = {
    val listed = Seq((key, 1L, 0L)).toDF("Key", "Size", "mtime_ms")
    ManifestGen.applyManifestSemantics(listed, "b", delim)
      .select("FileName").as[String].head()
  }

  test("FileName = substring after last delimiter") {
    assert(fileName("a/b/c.txt", "/") == "c.txt")
    assert(fileName("no-delim", "/") == "no-delim")        // absent → whole key
    assert(fileName("trailing/", "/") == "")               // trailing → empty
    assert(fileName("a//b", "/") == "b")
    assert(fileName("xZZyZZz", "ZZ") == "z")               // multi-char delim
  }

  test("null sentinels: missing key → empty, missing size → 0, missing mtime → epoch 0") {
    val listed = Seq((Option.empty[String], Option.empty[Long], Option.empty[Long]))
      .toDF("Key", "Size", "mtime_ms")
    val row = ManifestGen.applyManifestSemantics(listed, "b", "/").head()
    assert(row.getString(1) == "")
    assert(row.getLong(3) == 0L)
    assert(row.getTimestamp(4).getTime == 0L)
  }

  test("property: FileName is a suffix of Key and contains no delimiter") {
    val keyGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('/'))).map(_.mkString)
    val keys = Gen.listOfN(100, keyGen).sample.get.distinct
    // run through one Spark job instead of 100 (each fileName() is a job)
    import spark.implicits._
    val df = keys.map(k => (k, 1L, 0L)).toDF("Key", "Size", "mtime_ms")
    val rows = ManifestGen.applyManifestSemantics(df, "b", "/")
      .select("Key", "FileName").as[(String, String)].collect()
    rows.foreach { case (key, fn) =>
      assert(key.endsWith(fn), s"'$fn' not suffix of '$key'")
      assert(!fn.contains("/"), s"'$fn' contains delimiter")
    }
  }

  test("fromDir lists a real directory with exact sizes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_m").toFile
    java.nio.file.Files.write(new java.io.File(dir, "x.bin").toPath, Array.fill[Byte](123)(1))
    val sub = new java.io.File(dir, "sub"); sub.mkdir()
    java.nio.file.Files.write(new java.io.File(sub, "y.bin").toPath, Array.fill[Byte](7)(2))
    val m = ManifestGen.fromDir(spark, dir.getAbsolutePath).orderBy("Key").collect()
    assert(m.length == 2)
    assert(m.map(_.getString(2)).toSet == Set("x.bin", "y.bin"))
    assert(m.map(_.getLong(3)).sorted.toSeq == Seq(7L, 123L))
    assert(m.forall(_.getString(0) == dir.getName))
  }

  test("manifest write → read round-trip preserves schema and rows") {
    val out = java.nio.file.Files.createTempDirectory("graft_rt").toString
    val m = ManifestGen.fromDir(spark, sf)
    ManifestGen.write(m, out)
    val back = ManifestGen.read(spark, out)
    assert(back.schema.fieldNames.toSeq ==
      Seq("Bucket", "Key", "FileName", "Size", "LastModified"))
    assert(back.schema("Size").dataType == LongType)
    assert(back.count() == m.count())
    assert(back.orderBy("Key").collect().toSeq == m.orderBy("Key").collect().toSeq)
  }

  test("reads back a reference-style UINT_64-Size manifest as LongType") {
    // Fixture written with Parquet UINT_64 Size (DuckDB UBIGINT COPY),
    // mirroring the reference's unsigned schema (src/main.rs:139). Spark
    // surfaces UINT_64 as DecimalType(20,0); ManifestGen.read normalizes.
    val path = getClass.getResource("/uint64_manifest.parquet").getPath
    assert(spark.read.parquet(path).schema("Size").dataType ==
      DecimalType(20, 0), "fixture must really carry Parquet UINT_64")
    val df = ManifestGen.read(spark, path)
    assert(df.schema("Size").dataType == LongType)
    val sizes = df.orderBy("Key").select("Size").as[Long].collect().toSeq
    assert(sizes == Seq(0L, 1000L, 2000L, 3000L, Long.MaxValue))
    assert(df.schema.fieldNames.toSeq ==
      Seq("Bucket", "Key", "FileName", "Size", "LastModified"))
  }

  test("UINT_64 Size past the signed range fails loudly instead of nulling out") {
    val path = getClass.getResource("/uint64_overflow.parquet").getPath
    val ex = intercept[Exception] {
      ManifestGen.read(spark, path).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("exceeds signed 64-bit range")),
      s"expected the overflow error, got: ${ex.getMessage}")
  }

  test("fslist DSv2 source matches driver-side listing and prunes by prefix") {
    val viaDsv2 = spark.read.format("graft.sources.FsListSource")
      .option("path", sf).load()
    val viaDriver = ManifestGen.fromDir(spark, sf)
    assert(viaDsv2.select("Key", "Size").orderBy("Key").collect().toSeq ==
      viaDriver.select("Key", "Size").orderBy("Key").collect().toSeq)
    // prefix filter prunes partitions AND returns correct rows
    val pruned = viaDsv2.filter(col("Key").startsWith(s"$sf/l"))
    assert(pruned.select("FileName").as[String].collect().toSet == Set("lineitem.parquet"))
    val partitions = new graft.sources.FsListScan(sf, "/", Some(s"$sf/l")).planInputPartitions()
    assert(partitions.length == 1, "planning should prune non-matching shards")
  }

  test("zone-map stats manifest skips non-overlapping files, result pruning-invariant") {
    val out = java.nio.file.Files.createTempDirectory("graft_zm").toString
    Tables.documents(spark, sf)
      .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(out)
    val stats = graft.manifest.ZoneMap.statsManifest(spark, out, "doc_id").collect()
    assert(stats.length == 8, "one stats row per file")
    // disjoint ranges (the compaction contract zone maps rely on)
    val zones = stats.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(zones.sliding(2).forall(p => p.length < 2 || p(0)._2 < p(1)._1))
    // a range hitting 1 of 8 zones plans exactly the overlapping file(s)
    val hi = zones.head._2
    val prunedFiles = graft.manifest.ZoneMap
      .prunedRead(spark, out, "doc_id", 0L, hi)
      .select(col("_metadata.file_path")).distinct().count()
    assert(prunedFiles == 1, s"expected 1 file planned, got $prunedFiles")
    // pruning-invariance: pruned read + residual predicate == base table
    val viaZones = graft.manifest.ZoneMap.prunedRead(spark, out, "doc_id", 0L, hi)
      .filter(col("doc_id").between(0L, hi)).select("doc_id").as[Long].collect().toSet
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id").between(0L, hi)).select("doc_id").as[Long].collect().toSet
    assert(viaZones == base)
    // empty-overlap edge: no file qualifies, schema preserved, zero rows
    val none = graft.manifest.ZoneMap.prunedRead(spark, out, "doc_id", -100L, -1L)
    assert(none.count() == 0 && none.columns.contains("text"))
  }

  test("Z-order layout prunes on BOTH dimensions; a single-column sort cannot") {
    import graft.manifest.ZoneMap
    // 64×64 grid, 6 bits per dim → z < 4096; 16 z-range files each cover
    // a 256-value z run = a 16×16 RECTANGLE of the (a, b) plane
    val grid = spark.range(64).select(col("id").as("a"))
      .crossJoin(spark.range(64).select(col("id").as("b")))
    val zDir = java.nio.file.Files.createTempDirectory("graft_zgrid").toString
    grid.withColumn("z", ZoneMap.zvalue("a", "b", 6))
      .repartitionByRange(16, col("z")).sortWithinPartitions("z").drop("z")
      .write.mode("overwrite").parquet(zDir)
    // a narrow box on EITHER single dimension prunes to ≤ a quarter
    val aOnly = ZoneMap.boxFiles(spark, zDir, Seq(("a", 0L, 15L), ("b", 0L, 63L)))
    val bOnly = ZoneMap.boxFiles(spark, zDir, Seq(("a", 0L, 63L), ("b", 16L, 31L)))
    assert(aOnly.size <= 4, s"a-box planned ${aOnly.size} of 16 files")
    assert(bOnly.size <= 4, s"b-box planned ${bOnly.size} of 16 files")
    // both dims together: the intersection rectangle
    val both = ZoneMap.boxFiles(spark, zDir, Seq(("a", 0L, 15L), ("b", 16L, 31L)))
    assert(both.size <= 2, s"2-d box planned ${both.size} of 16 files")
    // the same data sorted by a alone: the b-only box prunes NOTHING
    // (compare against the layout's ACTUAL file count — range
    // partitioning samples boundaries and may write fewer files)
    val aDir = java.nio.file.Files.createTempDirectory("graft_asort").toString
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(aDir)
    val aFiles = ZoneMap.statsManifestMulti(spark, aDir, Seq("b")).count()
    val bOnLinear = ZoneMap.boxFiles(spark, aDir, Seq(("b", 16L, 31L)))
    assert(bOnLinear.size.toLong == aFiles,
      "a-sorted layout must not prune a b-box")
    // pruning-invariance of the box read
    val viaZ = ZoneMap.prunedReadBox(spark, zDir, Seq(("a", 0L, 15L), ("b", 16L, 31L)))
      .filter(col("a") <= 15 && col("b").between(16, 31)).count()
    assert(viaZ == 16L * 16L)
  }

  test("manifest diff classifies added/removed/changed/unchanged") {
    import org.apache.spark.sql.functions.col
    val oldM = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("Key", "Size")
    val newM = Seq(("b", 2L), ("c", 9L), ("d", 4L)).toDF("Key", "Size")
    val d = graft.manifest.ManifestDiff.diff(oldM, newM)
      .orderBy("Key").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d == Map("a" -> "removed", "b" -> "unchanged",
      "c" -> "changed", "d" -> "added"))
  }

  test("manifest merge: upsert replaces, insert adds, delete wins over upsert") {
    val snap = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("Key", "Size")
    val ups  = Seq(("b", 20L), ("d", 4L), ("e", 5L)).toDF("Key", "Size")
    val dels = Seq(Tuple1("c"), Tuple1("e")).toDF("Key")
    val m = graft.manifest.ManifestDiff.merge(snap, ups, dels)
      .orderBy("Key").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(m.toSeq == Seq("a" -> 1L, "b" -> 20L, "d" -> 4L))
  }

  test("property: merge keyset = (snapshot ∪ upserts) \\ deletes, upsert value wins") {
    // nonEmptyListOf, not suchThat(_.nonEmpty): a failing suchThat makes
    // sample return None intermittently
    val keyGen = Gen.listOfN(40,
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6)))
    val keys = keyGen.sample.get.distinct
    val third = math.max(keys.size / 3, 1)
    val (snapKeys, upsKeys, delKeys) =
      (keys.take(2 * third), keys.drop(third), keys.filter(_.hashCode % 3 == 0))
    import spark.implicits._
    val snap = snapKeys.map(k => (k, 1L)).toDF("Key", "Size")
    val ups = upsKeys.map(k => (k, 2L)).toDF("Key", "Size")
    val dels = delKeys.map(Tuple1(_)).toDF("Key")
    val got = graft.manifest.ManifestDiff.merge(snap, ups, dels)
      .as[(String, Long)].collect().toMap
    val expected = (snapKeys.map(_ -> 1L).toMap ++ upsKeys.map(_ -> 2L).toMap)
      .removedAll(delKeys)
    assert(got == expected)
  }

  test("partitioned manifest write prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val m = ManifestGen.fromDir(spark, sf)
      .withColumn("pfx", org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.col("FileName"), 1, 1))
    ManifestGen.writePartitioned(m, out, Seq("pfx"))
    val back = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("pfx") === "l")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(pfx"),
      s"expected partition pruning in:\n${plan.take(800)}")
    assert(back.count() == 1) // only lineitem.parquet starts with 'l'
  }

  test("fslist DSv2 column pruning and limit pushdown") {
    val viaDsv2 = spark.read.format("graft.sources.FsListSource")
      .option("path", sf).load()
    // pruning: a 2-column projection reads a 2-column schema from the scan
    val pruned = viaDsv2.select("Key", "Size")
    val scanSchema = pruned.queryExecution.executedPlan.collectLeaves()
      .head.schema.fieldNames.toSeq
    assert(scanSchema == Seq("Key", "Size"), s"scan read $scanSchema")
    assert(pruned.count() == 10)
    // limit: each shard stops early; global limit still exact
    assert(viaDsv2.limit(3).count() == 3)
    // direct reader check: per-partition cap honored
    val r = new graft.sources.FsListReader(
      graft.sources.FsListPartition(sf, "b"), "/",
      Array("Key"), Some(2))
    var n = 0
    while (r.next()) n += 1
    assert(n == 2)
    assert(r.get().numFields == 1)
  }
}
