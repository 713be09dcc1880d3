package graft.manifest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps over a parquet directory: a per-file (min, max)
  * stats manifest for one key column, and a pruned read that plans only
  * the files whose zone overlaps a range predicate.
  *
  * This is the manifest idea (reference: src/main.rs writes Key/Size/mtime
  * per object) extended with COLUMN stats, the way Delta/Iceberg manifests
  * drive data skipping: the stats table is one row per file — control-plane
  * sized at any data scale — so overlap filtering is a driver-side planning
  * step and the data-plane job opens only surviving files. Spark's own
  * parquet reader skips row groups via pushed footers but still opens every
  * file; at 100 TB with thousands of files behind a high-latency store,
  * file-level planning off a manifest is the difference between O(files)
  * and O(matching files) opens.
  */
object ZoneMap {

  /** Zone-overlap test: [kmin, kmax] ∩ [lo, hi] ≠ ∅. ONE definition for
    * the single-key ([[prunedRead]]) and box ([[boxFiles]]) planners.
    * [[graft.Mutations]] "q109_prune_or_instead_of_and" plants the
    * AND→OR typo here: the inverted test admits MORE files, so every
    * downstream result stays hash-green behind the residual row filter —
    * the one defect class the oracle comparison is structurally blind
    * to. The red-case therefore asserts the planned file COUNT
    * (MutationSpec), which is also the property this module exists to
    * deliver at 100 TB: O(matching files) opens, not O(files). */
  private def overlaps(minC: org.apache.spark.sql.Column,
                       maxC: org.apache.spark.sql.Column,
                       lo: Long, hi: Long): org.apache.spark.sql.Column =
    if (graft.Mutations.on("q109_prune_or_instead_of_and"))
      maxC >= lo || minC <= hi
    else maxC >= lo && minC <= hi

  /** One row per parquet file under `dir`: (file, kmin, kmax) for `keyCol`.
    * Built by scanning ONLY the key column (columnar projection), grouped
    * on the file-constant `_metadata.file_path`, so the build reads one
    * column of each file once — the writer-side cost of maintaining stats.
    * In a production writer these rows are recorded at write time (the
    * footer already holds them); recomputing here keeps the demo
    * self-contained without a custom parquet footer reader. */
  def statsManifest(s: SparkSession, dir: String, keyCol: String): DataFrame =
    s.read.parquet(dir)
      .select(col("_metadata.file_path").as("file"), col(keyCol))
      .groupBy("file")
      .agg(min(col(keyCol)).as("kmin"), max(col(keyCol)).as("kmax"))

  /** Read only the files whose [kmin, kmax] zone intersects [lo, hi].
    * The stats manifest is collected driver-side — one row per file, the
    * same control-plane footprint as Spark's own FileIndex — and the
    * returned frame still needs the exact row-level predicate applied by
    * the caller (zones admit whole files, not rows). */
  def prunedRead(s: SparkSession, dir: String, keyCol: String,
                 lo: Long, hi: Long): DataFrame = {
    val files = statsManifest(s, dir, keyCol)
      .filter(overlaps(col("kmin"), col("kmax"), lo, hi))
      .select("file").collect().map(_.getString(0)).sorted
    if (files.isEmpty) s.read.parquet(dir).filter(lit(false))
    else s.read.parquet(files.toIndexedSeq: _*)
  }

  /** Bit-interleaved Z-value of two non-negative integer columns
    * (`a` in the odd bit positions, `b` in the even), `bits` bits per
    * dimension — the write-time clustering key for multi-dimension
    * skipping (q135). Pure arithmetic expression: codegen-friendly,
    * no UDF.
    *
    * PRECONDITION: values must fit in `bits` bits — higher bits are
    * silently ignored (value 2^bits + k interleaves like k), which
    * makes z-runs stop being rectangles and quietly destroys the
    * pruning benefit (results stay correct via the residual filter,
    * the LAYOUT degrades). Callers size `bits` to the key domain with
    * headroom: 2×31 bits fits in a positive long, so there is no
    * reason to run close to the domain edge. */
  def zvalue(a: String, b: String, bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map(i => expr(
      s"shiftleft(shiftright($a, $i) & 1, ${2 * i + 1}) + " +
        s"shiftleft(shiftright($b, $i) & 1, ${2 * i})")).reduce(_ + _)

  /** Multi-column stats manifest: one row per file with (min_c, max_c)
    * for every key column — the manifest shape that makes MULTI-dimension
    * skipping possible when the layout clusters several columns at once
    * (e.g. a Z-order sort, q135). Still one scan of just the key columns. */
  def statsManifestMulti(s: SparkSession, dir: String,
                         keyCols: Seq[String]): DataFrame = {
    val aggs = keyCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    s.read.parquet(dir)
      .select(col("_metadata.file_path").as("file") +: keyCols.map(col): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose per-column zones ALL intersect the box (conjunction of
    * per-dimension range predicates). Driver-side planning, like
    * [[prunedRead]]. */
  def boxFiles(s: SparkSession, dir: String,
               box: Seq[(String, Long, Long)]): Seq[String] = {
    val keep = box.map { case (c, lo, hi) =>
      overlaps(col(s"min_$c"), col(s"max_$c"), lo, hi)
    }.reduce(_ && _)
    statsManifestMulti(s, dir, box.map(_._1))
      .filter(keep).select("file")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Read only the files surviving [[boxFiles]]; callers still apply the
    * exact row-level box predicate (zones admit whole files). */
  def prunedReadBox(s: SparkSession, dir: String,
                    box: Seq[(String, Long, Long)]): DataFrame = {
    val files = boxFiles(s, dir, box)
    if (files.isEmpty) s.read.parquet(dir).filter(lit(false))
    else s.read.parquet(files: _*)
  }
}
