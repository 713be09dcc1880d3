package graft.ops

import graft.Tables
import graft.manifest.{ManifestGen, ZoneMap}
import graft.streaming.StreamingPipelines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Live filesystem manifests (the reference's actual job) plus the
  * streaming-engine query. The DuckDB oracles for q90-q92 use read_blob()
  * over the scale-factor directory; oracle SQL has no parameter channel,
  * so the directory (and the bucket name derived from it) appear as
  * placeholder tokens that [[graft.Verify]] substitutes with the actual
  * sfDir when it writes oracle_sql.json — the oracles then compare
  * correctly at EVERY scale factor, not just the driver's gate scale.
  */
object ManifestFsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Substituted by [[graft.Verify]] with the scale-factor directory. */
  val SfDirToken = "__GRAFT_SF_DIR__"
  /** Substituted by [[graft.Verify]] with the directory's basename (the
    * manifest Bucket column for a local-path listing). */
  val SfBucketToken = "__GRAFT_SF_BUCKET__"

  private val t2Dir = SfDirToken

  /** Spark 4 bundles the avro datasource CLASSES in spark-sql, but this
    * image ships no spark-avro module/service registration, so
    * `format("avro")` fails provider lookup with a deploy hint — the
    * fully qualified FileFormat class resolves directly instead. */
  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  /** One bucketed-table layout per (session, dataset) — see q110. Table
    * names carry the dataset hash so the same session can hold layouts for
    * several datasets without clobbering; the map value is the (lineitem,
    * orders) table-name pair. Warehouse dirs are [[Scratch]]-registered
    * for JVM-exit cleanup. */
  private val bucketedTables = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, String)]()

  /** Compaction rewrite shared by q105 and ConnectorSpec: range-partition
    * on Key into `n` outputs and sort within each, so every output file
    * covers a contiguous, disjoint Key range (file-level min/max stat
    * pruning for downstream prefix queries). */
  private[graft] def compact(s: SparkSession, fragDir: String,
                             outDir: String, n: Int): Unit =
    s.read.parquet(fragDir)
      .repartitionByRange(n, col("Key")).sortWithinPartitions("Key")
      .write.mode("overwrite").parquet(outDir)

  /** One Merkle level: group child digests by (tag, parent) and md5 them
    * in child order — the ONE tree builder behind q327 (two-arm audit)
    * AND q329 (incremental maintenance). Input carries (tag, <parent>,
    * <childOrd>, h); output is (tag, node, h). */
  private def merkleUp(df: DataFrame, tag: String, parent: String,
                       childOrd: String): DataFrame =
    df.groupBy(col(tag), col(parent).as("node"))
      .agg(md5(concat_ws("", expr(
        s"""transform(array_sort(collect_list(named_struct(
            'o', $childOrd, 'd', h))), x -> x.d)"""))).as("h"))

  def queries: Map[String, Q] = Map(
    // SHARD REBALANCE AUDIT (consistent hashing) — the routing decision
    // every sharded store makes before growing the fleet: when shard
    // count goes 8 → 9, what fraction of keys MOVE? Two arms over the
    // same md5 draws: RENDEZVOUS (HRW) hashing — each key goes to the
    // node maximizing draw(key#node), so adding a node moves exactly
    // the keys the NEW node now wins (~1/9) — vs naive MOD hashing
    // (draw(key) % N), which reshuffles ~8/9 of all keys on the same
    // event. The census prices both (moved_bp) and carries the balance
    // witness (max_shard_share_bp ≈ 10000/9 when healthy). Wholly
    // in-row and map-only: per key, two fixed-size transform+argmax
    // folds; the census is an (arm, shard) aggregate.
    // [[graft.Mutations]] "q338_weight_ignores_key": the HRW weight
    // computed on the NODE alone — the classic rendezvous bug: every
    // key elects the same winner, moved_bp reads a flattering 0 while
    // max_shard_share_bp goes to 10000 (the whole corpus on one shard)
    // — which is WHY the balance witness is in the output.
    "q338_shard_rebalance" -> ((s, d) => {
      val keyPart =
        if (graft.Mutations.on("q338_weight_ignores_key")) "''"
        else "cast(doc_id AS STRING)"
      val draw = graft.ext.SamplingPipeline.drawExpr(
        s"concat($keyPart, '#', cast(i AS STRING))", "hrw")
      val modDraw = graft.ext.SamplingPipeline.drawExpr(
        "cast(doc_id AS STRING)", "modhash")
      val nodes8 = (0 until 8).mkString(", ")
      val nodes9 = (0 until 9).mkString(", ")
      val base = Tables.documents(s, d).select("doc_id")
      val hrw = base
        .withColumn("a8", expr(s"transform(array($nodes8), i -> $draw)"))
        .withColumn("a9", expr(s"transform(array($nodes9), i -> $draw)"))
        .select(lit("a_hrw").as("arm"),
          expr("array_position(a8, array_max(a8))").as("shard_b"),
          expr("array_position(a9, array_max(a9))").as("shard_a"))
      val md = base.select(lit("b_mod").as("arm"),
        (expr(modDraw) % 8 + 1).as("shard_b"),
        (expr(modDraw) % 9 + 1).as("shard_a"))
      hrw.unionByName(md)
        .select(col("arm"), col("shard_a"),
          (col("shard_b") =!= col("shard_a")).cast("long").as("moved"))
        .groupBy("arm", "shard_a")
        .agg(count(lit(1)).as("n"), sum(col("moved")).as("n_moved"))
        .groupBy("arm")
        .agg(sum(col("n")).as("n_keys"), sum(col("n_moved")).as("n_moved"),
          max(col("n")).as("max_shard"))
        .select(col("arm"), col("n_keys"), col("n_moved"),
          expr("n_moved * 10000 DIV n_keys").as("moved_bp"),
          expr("max_shard * 10000 DIV n_keys").as("max_shard_share_bp"))
        .orderBy("arm")
    }),

    // MERKLE INTEGRITY TREE + CORRUPTION LOCALIZATION — the hierarchical
    // digest that turns q145's flat digest-reconcile into a log-probe
    // SEARCH: 64 leaves (doc_id % 64) → 8 interior nodes (leaf DIV 8) →
    // one root, each digest an md5 over its children's digests in child
    // order, so any byte flip changes exactly ONE path to the root and
    // a verifier walks log(n) digests instead of re-hashing the corpus.
    // Graded as the audit, not a claim: a 'tampered' arm plants one
    // appended byte on one deterministic doc, and the output counts
    // clean-vs-tampered digest mismatches per level (exactly 1 at each)
    // plus the mismatched ids — the oracle independently recomputes both
    // trees and pins that the located leaf IS the tampered doc's leaf.
    // Scale: the per-leaf digest aggregates per-doc md5s (32 bytes/doc,
    // leaf-local, doc_id-ordered in-row); every level above works on
    // 32-byte child digests only. Production holds leaf SIZE fixed and
    // grows leaf count (tree depth log n) — the 64/8 fanout here is the
    // fixture-sized instance of that shape.
    "q327_merkle_audit" -> ((s, d) => {
      // mutation seam (knob OFF in every production plan): the leaf
      // fanout modulus slips to 63 — every leaf's membership shifts and
      // the corruption localizes to the wrong leaf id
      val fan =
        if (graft.Mutations.on("q327_fanout_off_by_one")) 63 else 64
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val culprit = docs.select(min(when(col("doc_id") % 97 === 13,
        col("doc_id"))).as("bad_id"))
      val arms = docs.crossJoin(broadcast(culprit))
        .select(col("doc_id"), col("bad_id"), explode(expr(
          """array(named_struct('arm', 'clean', 't', text),
                   named_struct('arm', 'tampered',
                     't', IF(doc_id = bad_id, concat(text, 'X'), text)))"""))
          .as("at"))
        .select(col("at.arm").as("arm"), col("doc_id"),
          (col("doc_id") % fan).as("leaf"), md5(col("at.t")).as("h"))
      val leaves = merkleUp(arms.withColumnRenamed("leaf", "lf"),
          "arm", "lf", "doc_id")
        .withColumnRenamed("node", "leaf")
      val nodes = merkleUp(leaves.withColumn("grp", expr("leaf DIV 8")),
        "arm", "grp", "leaf")
      val root = merkleUp(nodes.withColumn("all", lit(0L)),
        "arm", "all", "node")
      def diffed(df: org.apache.spark.sql.DataFrame, lvl: String,
                 idc: String): org.apache.spark.sql.DataFrame = {
        val c = df.filter(col("arm") === "clean")
          .select(col(idc).as("id"), col("h").as("hc"))
        val t = df.filter(col("arm") === "tampered")
          .select(col(idc).as("id"), col("h").as("ht"))
        c.join(t, "id")
          .agg(count(lit(1)).as("n_nodes"),
            sum(when(col("hc") =!= col("ht"), 1L).otherwise(0L))
              .as("n_mismatch"),
            min(when(col("hc") =!= col("ht"), col("id"))).as("mismatched_id"))
          .select(lit(lvl).as("level"), col("n_nodes"), col("n_mismatch"),
            coalesce(col("mismatched_id"), lit(-1L)).as("mismatched_id"))
      }
      diffed(leaves, "1_leaf", "leaf")
        .unionByName(diffed(nodes, "2_node", "node"))
        .unionByName(diffed(root, "3_root", "node"))
        .orderBy("level")
    }),

    // INCREMENTAL MERKLE MAINTENANCE — the property that makes q327's
    // tree operational at corpus scale: when a delta lands (here every
    // doc_id ≡ 2 mod 10 edited with a revision prefix), only the DIRTY
    // path recomputes — dirty leaves from the changed docs, their
    // parent nodes from mixed (recomputed + spliced-from-v1) children,
    // and the root — while clean digests splice from the v1 tree
    // untouched. The graded claim is incremental ≡ full rebuild at
    // every level (n_incr_equal_full = n_total), with n_recomputed
    // counting the dirty set — the work a 100 TB store saves (dirty
    // leaves, not corpus) each snapshot. The knob plants the classic
    // incremental-maintenance bug: parents NOT recomputed (nodes
    // spliced wholesale from v1) — stale interior digests, the
    // equality census goes red on the node and root rows.
    // Scale: the v1/full trees are q327's shape; the incremental path
    // touches |dirty| leaves' docs + |dirty| nodes + the root — the
    // log-path claim, graded as set equality not asserted.
    "q329_incremental_merkle" -> ((s, d) => {
      val recomputeParents =
        !graft.Mutations.on("q329_parents_not_recomputed")
      val docs = Tables.documents(s, d).select("doc_id", "text")
      def hashed(ver: String, df: org.apache.spark.sql.DataFrame) =
        df.select(lit(ver).as("ver"), col("doc_id"),
          (col("doc_id") % 64).as("lf"), md5(col("text")).as("h"))
      val v2docs = docs.select(col("doc_id"),
        when(col("doc_id") % 10 === 2, concat(lit("rev2 "), col("text")))
          .otherwise(col("text")).as("text"))
      val both = hashed("v1", docs).unionByName(hashed("v2", v2docs))
      val leaves = merkleUp(both, "ver", "lf", "doc_id")
        .withColumnRenamed("node", "leaf")
      val nodes = merkleUp(leaves.withColumn("grp", expr("leaf DIV 8")),
        "ver", "grp", "leaf")
      val root = merkleUp(nodes.withColumn("all", lit(0L)),
        "ver", "all", "node")
      val dirtyLeaves = docs.filter(col("doc_id") % 10 === 2)
        .select((col("doc_id") % 64).as("id")).distinct()
      val dirtyNodes = dirtyLeaves.select(expr("id DIV 8").as("id")).distinct()
      def split(df: org.apache.spark.sql.DataFrame, idc: String,
                ver: String) =
        df.filter(col("ver") === ver).select(col(idc).as("id"), col("h"))
      // incremental leaf level: dirty leaves take v2's recomputation,
      // clean leaves splice from v1
      val leavesIncr = split(leaves, "leaf", "v2")
          .join(dirtyLeaves, Seq("id"), "left_semi")
        .unionByName(split(leaves, "leaf", "v1")
          .join(dirtyLeaves, Seq("id"), "left_anti"))
      // node level: recompute dirty nodes from the spliced leaf set (or
      // — the knob — splice everything from v1)
      val nodesRecomputed = merkleUp(
          leavesIncr.withColumn("ver", lit("incr"))
            .withColumnRenamed("id", "leaf")
            .withColumn("grp", expr("leaf DIV 8")),
          "ver", "grp", "leaf")
        .select(col("node").as("id"), col("h"))
      val nodesIncr =
        if (recomputeParents)
          nodesRecomputed.join(dirtyNodes, Seq("id"), "left_semi")
            .unionByName(split(nodes, "node", "v1")
              .join(dirtyNodes, Seq("id"), "left_anti"))
        else split(nodes, "node", "v1")
      val rootIncr = merkleUp(
          nodesIncr.withColumn("ver", lit("incr"))
            .withColumnRenamed("id", "nid")
            .withColumnRenamed("h", "h0")
            .select(col("ver"), col("nid"), col("h0").as("h"),
              lit(0L).as("all")),
          "ver", "all", "nid")
        .select(col("node").as("id"), col("h"))
      def level(lvl: String, incr: org.apache.spark.sql.DataFrame,
                full: org.apache.spark.sql.DataFrame, idc: String,
                dirty: Option[org.apache.spark.sql.DataFrame]) = {
        val f = split(full, idc, "v2")
        val joined = incr.withColumnRenamed("h", "hi").join(
          f.withColumnRenamed("h", "hf"), "id")
        val nRec = dirty.map(_.count()).getOrElse(1L)
        joined.agg(count(lit(1)).as("n_total"),
            sum(when(col("hi") === col("hf"), 1L).otherwise(0L))
              .as("n_incr_equal_full"))
          .select(lit(lvl).as("level"), col("n_total"),
            lit(nRec).as("n_recomputed"), col("n_incr_equal_full"))
      }
      level("1_leaf", leavesIncr, leaves, "leaf", Some(dirtyLeaves))
        .unionByName(level("2_node", nodesIncr, nodes, "node",
          Some(dirtyNodes)))
        .unionByName(level("3_root", rootIncr, root, "node", None))
        .orderBy("level")
    }),

    // Driver-side listing path (control-plane sized inventories).
    "q90_manifest_fs" -> ((s, d) => {
      ManifestGen.fromDir(s, d)
        .select("Bucket", "Key", "FileName", "Size")
        .orderBy("Key")
    }),

    // DSv2 scale path: executor-side sharded listing with prefix pushdown.
    "q91_fslist_source" -> ((s, d) => {
      s.read.format("graft.sources.FsListSource").option("path", d).load()
        .filter(col("Key").startsWith(s"$d/c"))
        .select("Bucket", "Key", "FileName", "Size")
        .orderBy("Key")
    }),

    // Manifest write → read round-trip, then a query on the round-tripped
    // manifest (exercises the Parquet sink + Size normalization on read).
    "q92_manifest_roundtrip" -> ((s, d) => {
      val out = Scratch.dir("graft_manifest")
      val m = ManifestGen.fromDir(s, d)
      ManifestGen.write(m, out)
      ManifestGen.read(s, out)
        .groupBy("Bucket")
        .agg(count(lit(1)).as("n_files"), sum(col("Size")).as("total_bytes"),
          max(col("FileName")).as("max_name"))
        .orderBy("Bucket")
    }),

    // Incremental inventory: diff two (synthetically evolved) manifest
    // snapshots derived deterministically from `documents` — full outer
    // join, all four statuses exercised.
    "q95_manifest_diff" -> ((s, d) => {
      def keyCol = concat(col("source"), lit("/"), col("doc_id").cast("string"), lit(".txt"))
      val docs = Tables.documents(s, d)
      val oldM = docs.filter(col("doc_id") % 7 =!= 0)
        .select(keyCol.as("Key"), col("n_chars").as("Size"))
      val newM = docs.filter(col("doc_id") % 5 =!= 0)
        .select(keyCol.as("Key"), (col("n_chars") + col("doc_id") % 3).as("Size"))
      graft.manifest.ManifestDiff.diff(oldM, newM).orderBy("Key")
    }),

    // MERGE/upsert on an inventory snapshot: apply a changeset (upserts +
    // deletes) to a manifest — the apply half of q95's diff. Plan shape:
    // one full-outer + one anti join, both Key-keyed, one shuffle chain.
    "q111_manifest_merge" -> ((s, d) => {
      def keyCol = concat(col("source"), lit("/"), col("doc_id").cast("string"), lit(".txt"))
      val docs = Tables.documents(s, d)
      val snapshot = docs.filter(col("doc_id") % 7 =!= 0)
        .select(keyCol.as("Key"), col("n_chars").as("Size"))
      val upserts = docs.filter(col("doc_id") % 5 === 0)
        .select(keyCol.as("Key"), (col("n_chars") + lit(100)).as("Size"))
      val deletes = docs.filter(col("doc_id") % 11 === 0).select(keyCol.as("Key"))
      graft.manifest.ManifestDiff.merge(snapshot, upserts, deletes)
        .orderBy("Key")
    }),

    // Time travel over the versioned snapshot store: commit v0 (the base
    // inventory) and v1 (after an upsert changeset) through
    // [[StreamingPipelines.ManifestMaintainer]] — the write-new-then-
    // swap-pointer discipline with ≤2-version retention — then read BOTH
    // versions back via the asOf() API and diff them. This grades the
    // version-pointer machinery (atomic _CURRENT swap, retention window)
    // that q106's continuous maintenance relies on, in a batch-checkable
    // form: the diff of two committed versions must equal the changeset
    // that separates them. At 100 TB the diff is one Key-partitioned
    // full-outer join of two manifest snapshots (the q95 shape); the
    // commits are full-snapshot writes here and partition-aligned
    // incremental writes in a production table format.
    "q124_manifest_timetravel" -> ((s, d) => {
      def keyCol = concat(col("source"), lit("/"), col("doc_id").cast("string"), lit(".txt"))
      val docs = Tables.documents(s, d)
      val base = docs.select(keyCol.as("Key"), col("n_chars").as("Size"))
      val changeset = docs.filter(col("doc_id") % 10 === 0)
        .select(keyCol.as("Key"), (col("n_chars") + lit(100)).as("Size"))
      val m = new StreamingPipelines.ManifestMaintainer(s, Scratch.dir("graft_tt"))
      m(base, 0L)      // commit v0
      m(changeset, 1L) // commit v1 = merge(v0, changeset)
      graft.manifest.ManifestDiff.diff(m.asOf(0), m.asOf(1))
        .groupBy("status")
        .agg(count(lit(1)).as("n"),
          sum(col("old_size")).as("total_old"),
          sum(col("new_size")).as("total_new"))
        .orderBy("status")
    }),

    // Bucketed co-located join as a GRADED query (PlanSpec separately pins
    // the no-shuffle plan): both fact tables written bucketed on the join
    // key, so the join consumes the on-disk hash partitioning instead of
    // exchanging — at 100 TB this is the difference between a join that
    // moves both tables and one that moves nothing. The bucketed tables
    // are INFRASTRUCTURE (a one-time layout investment amortized across
    // every co-located join, which is the whole point of bucketing), so
    // they are written once per (session, dataset) and reused — same
    // memoization precedent as CurationQueries' guard cache.
    "q110_bucketed_join" -> ((s, d) => {
      val (liTbl, oTbl) = bucketedTables.computeIfAbsent((s, d), _ => {
        val wh = Scratch.dir("graft_bkt_wh")
        // full-content hash, not String.hashCode: two datasets colliding
        // on hashCode would silently clobber each other's catalog tables
        val tag = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        val (li, o) = (s"graft_li_bkt_$tag", s"graft_o_bkt_$tag")
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_extendedprice")
          .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$wh/li").saveAsTable(li)
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$wh/o").saveAsTable(o)
        (li, o)
      })
      s.table(liTbl)
        .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // CSV sink + source round-trip: Spark's CSV writer emits Java
    // Double.toString, which reparses to the identical double, so the
    // aggregate over the round-tripped data must equal the original.
    "q93_csv_roundtrip" -> ((s, d) => {
      val out = Scratch.dir("graft_csv")
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true")
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING")
        .csv(out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderpriority")
    }),

    // JSON-lines sink + source round-trip.
    "q94_json_roundtrip" -> ((s, d) => {
      val out = Scratch.dir("graft_json")
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite").json(out)
      s.read
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
        .json(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          min(col("o_orderkey")).as("min_key"))
        .orderBy("o_orderstatus")
    }),

    // ORC sink + source round-trip (the columnar alternative when the
    // downstream stack is ORC-native); aggregate equality against the
    // base table proves lossless round-tripping.
    "q97_orc_roundtrip" -> ((s, d) => {
      val out = Scratch.dir("graft_orc")
      Tables.part(s, d).write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("total_price"),
          max(col("p_size")).as("max_size"))
        .orderBy("p_brand")
    }),

    // Avro sink + source round-trip — the row-oriented interchange format
    // of the streaming/Kafka world (Spark 4 bundles the avro datasource
    // in spark-sql). Same proof shape as q97: the oracle aggregates the
    // ORIGINAL parquet table, so equality holds iff the avro hop
    // preserved every row — including the timestamp-micros logical type
    // (max o_orderdate) and the double→cents integerization. DuckDB
    // reads no avro; it never needs to.
    "q193_avro_roundtrip" -> ((s, d) => {
      val out = Scratch.dir("graft_avro")
      Tables.orders(s, d).write.mode("overwrite").format(AvroFmt).save(out)
      s.read.format(AvroFmt).load(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("cents"),
          max(col("o_orderdate")).as("last_order"))
        .orderBy("o_orderstatus")
    }),

    // Plain-text sink + source: serialize rows to delimited lines, read
    // back with spark.read.text and re-parse — the lowest-common-
    // denominator interchange path.
    "q98_text_roundtrip" -> ((s, d) => {
      val out = Scratch.dir("graft_text")
      Tables.documents(s, d)
        .select(concat_ws("\t", col("doc_id"), col("lang"), col("n_chars")).as("value"))
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .select(split(col("value"), "\t").as("f"))
        .select(element_at(col("f"), 2).as("lang"),
          element_at(col("f"), 3).cast("long").as("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    }),

    // Schema evolution across parquet generations: an inventory written
    // before a column existed reads together with the new generation via
    // mergeSchema; missing values surface as nulls. At 100 TB manifests
    // accrete columns over years — rewriting history per schema change is
    // not an option.
    "q104_schema_evolution" -> ((s, d) => {
      val out = Scratch.dir("graft_evolve")
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
        .write.mode("overwrite").parquet(s"$out/v1")
      docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$out/v2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          count(col("n_chars")).as("n_with_chars"),
          coalesce(sum(col("n_chars")), lit(0L)).as("total_chars"))
        .orderBy("lang")
    }),

    // Manifest compaction: the nightly-increment pathology leaves a
    // manifest as thousands of tiny files; rewrite key-range-partitioned
    // and sorted, so each output file covers a contiguous Key range and
    // downstream prefix queries prune whole files on parquet min/max
    // stats. The aggregate proves losslessness; ConnectorSpec asserts the
    // file count collapses and the per-file key ranges are disjoint.
    // RLE LAYOUT ADVISOR — the storage-layout question behind q105's
    // compaction and q135's Z-order: which sort order makes a column
    // run-length-encode well? For each candidate order the advisor
    // counts VALUE RUNS per column (1 at every position whose value
    // differs from its predecessor under that order) — runs are what
    // parquet's RLE/dictionary pages and min-max skipping key off, so
    // rows DIV runs is the compressibility signal a table optimizer
    // ranks orders by. o_orderkey is unique, so both candidate orders
    // are TOTAL and run counts are deterministic cross-engine (a
    // lineitem draft hit exactly this: its (orderkey, linenumber)
    // "key" has fixture duplicates, making runs tie-order-dependent).
    // At fleet scale runs are counted per file (they don't cross row
    // groups), making the window per-partition — the q151 split again.
    "q172_rle_layout_advisor" -> ((s, d) => {
      def runs(name: String,
               ord: Seq[org.apache.spark.sql.Column]): DataFrame = {
        val w = Window.orderBy(ord: _*)
        def flag(c: String) = when(lag(col(c), 1).over(w).isNull ||
          lag(col(c), 1).over(w) =!= col(c), 1L).otherwise(0L)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_orderstatus"))
          .withColumn("f_pri", flag("o_orderpriority"))
          .withColumn("f_st", flag("o_orderstatus"))
          .agg(sum(col("f_pri")).as("r_pri"), sum(col("f_st")).as("r_st"),
            count(lit(1)).as("n_rows"))
          .select(lit(name).as("sort_order"), col("r_pri"), col("r_st"),
            col("n_rows"))
      }
      runs("by_orderkey", Seq(col("o_orderkey")))
        .unionByName(runs("by_priority",
          Seq(col("o_orderpriority"), col("o_orderkey"))))
        .select(col("sort_order"), expr(
          """stack(2, 'o_orderpriority', r_pri, 'o_orderstatus', r_st)
             AS (column_name, n_runs)"""),
          col("n_rows"))
        .withColumn("rows_per_run", expr("n_rows DIV n_runs"))
        .select("sort_order", "column_name", "n_runs", "rows_per_run")
        .orderBy("sort_order", "column_name")
    }),

    // CDC changelog apply (the Debezium/Delta-CDF consume shape): a
    // keyed changelog of INSERT/UPDATE/DELETE ops with per-key sequence
    // numbers collapses to final table state by last-writer-wins —
    // one struct-max aggregate per key picks the highest-seq op (seq is
    // unique per key, so the winner is deterministic and ARRIVAL ORDER
    // IS IRRELEVANT — the property that lets a 100 TB backfill replay
    // shuffled partitions), tombstones drop after the reduction, and
    // the op count rides the same aggregate. No window sort: the plan
    // is one hash aggregation on key with map-side partials. The
    // changelog here is derived deterministically from orders (insert
    // for every key, update for md5-digit h1 < 6, delete for h2 < 4).
    "q154_cdc_apply" -> ((s, d) => {
      val hx = (i: Int) => expr(
        s"instr('0123456789abcdef', substring(md5(cast(key AS string)), $i, 1)) - 1")
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("key"),
          floor(col("o_totalprice") * 100).as("v"))
        .withColumn("h1", hx(1)).withColumn("h2", hx(2))
      val log = base
        .select(col("key"), lit(0L).as("seq"), lit("I").as("op"),
          col("v").as("value"))
        .unionByName(base.filter(col("h1") < 6)
          .select(col("key"), lit(1L).as("seq"), lit("U").as("op"),
            (col("v") + 1111L).as("value")))
        .unionByName(base.filter(col("h2") < 4)
          .select(col("key"), lit(2L).as("seq"), lit("D").as("op"),
            lit(null).cast("long").as("value")))
      log.groupBy("key")
        .agg(max(struct(col("seq"), col("op"), col("value"))).as("last"),
          count(lit(1)).as("n_ops"))
        .filter(col("last.op") =!= "D")
        .select(col("key"), col("last.value").as("value"),
          col("last.seq").as("last_seq"), col("n_ops"))
        .orderBy("key")
    }),

    // Compaction PLANNING (the decide half of q105's physical rewrite):
    // greedy next-fit bin packing of a fragmented file inventory into
    // target-size output groups, the planner inside every lakehouse
    // OPTIMIZE/compact command. Files are modeled from orders (one file
    // per order, bytes = price in cents via floor — double CAST rounds
    // in DuckDB but truncates in Spark, floor is identical in both),
    // partitioned by o_orderpriority (compaction never crosses table
    // partitions). The bin id is a running-sum bucket:
    // bin = (Σ sizes of earlier files) DIV target — one window over the
    // per-partition key order, so the plan is a single hash-partitioned
    // sort per table partition, never a global sort, and the assignment
    // is deterministic (unique key order) and independent of input file
    // layout — exactly what a restartable 100 TB compaction job needs.
    "q150_compaction_binpack" -> ((s, d) => {
      val target = 1000000000L // 1e9 "bytes" per output group
      val w = Window.partitionBy(col("pri")).orderBy(col("key"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.orders(s, d)
        .select(col("o_orderpriority").as("pri"),
          col("o_orderkey").as("key"),
          floor(col("o_totalprice") * 100).as("bytes"))
        .withColumn("cum", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("bin_id", expr(s"cum DIV ${target}L"))
        .groupBy("pri", "bin_id")
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
          min(col("key")).as("min_key"), max(col("key")).as("max_key"))
        .orderBy("pri", "bin_id")
    }),

    "q105_manifest_compaction" -> ((s, d) => {
      val out = Scratch.dir("graft_compact")
      Tables.documents(s, d)
        .select(concat(col("source"), lit("/"), col("doc_id").cast("string"),
            lit(".txt")).as("Key"),
          col("n_chars").as("Size"))
        .repartition(64) // fragmented state
        .write.mode("overwrite").parquet(s"$out/frag")
      compact(s, s"$out/frag", s"$out/compact", 4)
      s.read.parquet(s"$out/compact")
        .agg(count(lit(1)).as("n"), sum(col("Size")).as("total_size"),
          min(col("Key")).as("min_key"), max(col("Key")).as("max_key"))
    }),

    // Hive-partitioned manifest write + partition-pruned read: the scan
    // for one Bucket must touch only that partition's files (PlanSpec
    // asserts the PartitionFilters) — the layout ManifestGen
    // .writePartitioned uses so bucket/prefix queries skip the rest of a
    // 100 TB manifest at the directory level.
    "q96_partitioned_prune" -> ((s, d) => {
      val out = Scratch.dir("graft_part")
      Tables.documents(s, d)
        .select(col("source").as("Bucket"),
          concat(col("source"), lit("/"), col("doc_id").cast("string"),
            lit(".txt")).as("Key"),
          col("n_chars").as("Size"))
        .write.mode("overwrite").partitionBy("Bucket").parquet(out)
      s.read.parquet(out)
        .filter(col("Bucket") === "src1")
        .agg(count(lit(1)).as("n"), sum(col("Size")).as("total_size"),
          min(col("Key")).as("min_key"))
    }),

    // Nested-struct parquet round-trip: write docs with a metadata struct,
    // read back filtering/aggregating on nested fields only. Nested schema
    // pruning keeps the (large) text column out of the scan entirely —
    // the multimodal-metadata access pattern at 100 TB (PlanSpec asserts
    // the pruned ReadSchema).
    "q79_nested_roundtrip" -> ((s, d) => {
      val out = Scratch.dir("graft_nested")
      Tables.documents(s, d)
        .select(col("doc_id"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"),
          col("text"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("meta.lang") === "en")
        .groupBy(col("meta.source").as("source"))
        .agg(count(lit(1)).as("n"), sum(col("meta.n_chars")).as("total_chars"))
        .orderBy("source")
    }),

    // Real Structured Streaming execution (file source → watermark →
    // tumbling windows → memory sink), result equal to the batch twin q80.
    "q86_stream_tumbling" -> ((s, d) => {
      val agg = StreamingPipelines.tumblingCounts(StreamingPipelines.eventsStream(s, d))
      StreamingPipelines.runToCompletion(s, agg)
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("window_start", "event_type")
    }),

    // The native bounded-heap aggregate ([[graft.functions.TopKAgg]],
    // q127) driven through the REAL streaming engine: per-micro-batch
    // partial heaps merge into the state store via the aggregate's own
    // serialize/merge path — the proof that the custom
    // TypedImperativeAggregate is streaming-safe, not just batch-safe.
    // Complete mode over the finite source makes the final table equal
    // the batch q127, which is exactly what the shared oracle checks.
    "q143_stream_topk" -> ((s, d) => {
      val agg = StreamingPipelines.eventsStream(s, d)
        .groupBy("event_type")
        .agg(graft.functions.TopKAgg.topk(col("value"), col("event_id"), 5)
          .as("top"))
      StreamingPipelines.runToCompletion(s, agg)
        .select(col("event_type"), posexplode(col("top")).as(Seq("idx", "e")))
        .select(col("event_type"), (col("idx") + 1).cast("int").as("rank"),
          col("e.id").as("event_id"), col("e.score").as("value"))
        .orderBy("event_type", "rank")
    }),

    // The native KMV sketch ([[graft.functions.KMVAgg]], q169) driven
    // through the REAL streaming engine, the q143 contract applied to
    // the second TypedImperativeAggregate: per-micro-batch partial
    // sketches merge into the state store via the aggregate's own
    // serialize/set-union path — distinct-count-over-a-stream with k
    // longs of state per group, the streaming cardinality shape that
    // HLL serves in production but KMV serves DETERMINISTICALLY, so
    // Complete mode over the finite source must equal batch q169
    // exactly (shared oracle; StreamingSpec additionally forces a
    // multi-batch run so the cross-batch merge path is what's tested).
    "q170_stream_kmv" -> ((s, d) => {
      val agg = StreamingPipelines.eventsStream(s, d)
        .select(col("event_type"),
          md5(col("user_id").cast("string")).as("m"))
        .withColumn("h", expr(graft.ops.md5Bits32("m")))
        .groupBy("event_type")
        .agg(graft.functions.KMVAgg.kmv(col("h"), 64).as("sk"))
      StreamingPipelines.runToCompletion(s, agg)
        .select(col("event_type"), col("sk.cnt").as("cnt"),
          col("sk.kth").as("kth"), col("sk.est").as("est_distinct"))
        .orderBy("event_type")
    }),

    // The native BitmapAgg through the REAL streaming engine — per-batch
    // partial bitmaps word-OR in the state store exactly as map-side
    // partials do in batch (the q170 contract for the third
    // TypedImperativeAggregate); Complete mode over the finite source
    // must equal batch q226, so the oracle is q226's verbatim. Exact
    // distinct audiences from a stream, constant state per group.
    "q227_stream_bitmap" -> ((s, d) => {
      val agg = StreamingPipelines.eventsStream(s, d)
        .filter(col("value") >= 190.0)
        .groupBy("event_type")
        .agg(graft.functions.BitmapAgg.bitmap(col("user_id"), 65536).as("b"))
      // localCheckpoint breaks the memory-sink lineage BEFORE the pair
      // self-join — the streamed table itself must not self-join (the
      // q208 conflicting-refs landmine); the checkpointed copy is 5 rows
      val bm = StreamingPipelines.runToCompletion(s, agg)
        .select(col("event_type"), col("b.cnt").as("n_users"), col("b.bits").as("bits"))
        .localCheckpoint()
      SketchQueries.bitmapOverlapMatrix(bm)
    }),

    // Native session_window through the REAL streaming engine — q164's
    // operator with streaming state: per-micro-batch partial sessions
    // merge (and MERGE ADJACENT SESSIONS when a later batch bridges a
    // gap) in the session-window state store. Complete mode over the
    // finite source must equal the batch q164 exactly — same oracle.
    "q174_stream_session_window" -> ((s, d) => {
      val agg = StreamingPipelines.eventsStream(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          graft.ops.dsum(col("value")).as("session_value"))
      StreamingPipelines.runToCompletion(s, agg)
        .select(
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("user_id"), col("n_events"), col("session_value"))
        .orderBy("user_id", "start_us")
    }),

    // Streaming deduplication with bounded state
    // (dropDuplicatesWithinWatermark): the stream doubled by self-union
    // collapses back to one row per event_id; state for an id is evictable
    // once the watermark passes it — the unbounded-stream-safe dedup.
    "q89_stream_dedup" -> ((s, d) => {
      // project to the dedup key + watermark + output columns up front —
      // state entries and the sink hold 3 columns, not the full event row
      val ev = StreamingPipelines.eventsStream(s, d)
        .select("event_id", "ts", "event_type")
      val doubled = ev.unionByName(ev)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
      StreamingPipelines.runAppendToCompletion(s, doubled)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Stream-stream interval join (watermarked both sides, Append mode) —
    // Continuous inventory: the DSv2 listing as a micro-batch STREAM
    // (mtime-watermark offsets) run to completion over the finite fixture
    // dir — the streaming twin of q90's one-shot scan. The emitted set
    // equals the batch listing, which is what the oracle checks.
    "q106_stream_inventory" -> ((s, d) => {
      val inv = s.readStream.format("graft.sources.FsListSource")
        .option("path", d).load()
      StreamingPipelines.runAppendToCompletion(s, inv)
        .groupBy("Bucket")
        .agg(count(lit(1)).as("n_objects"), sum(col("Size")).as("total_bytes"))
        .orderBy("Bucket")
    }),

    // The bounded-trigger drain path as a graded query: same continuous
    // inventory as q106, but the backlog is forced through
    // maxObjectsPerTrigger=3 micro-batches (the sf dir holds ~10 files,
    // so several bounded batches run). The emitted UNION must equal the
    // one-shot listing — throttling changes batch boundaries, never rows.
    "q118_stream_inventory_bounded" -> ((s, d) => {
      val inv = s.readStream.format("graft.sources.FsListSource")
        .option("path", d).option("maxObjectsPerTrigger", "3").load()
      StreamingPipelines.runAppendToCompletion(s, inv)
        .groupBy("Bucket")
        .agg(count(lit(1)).as("n_objects"), sum(col("Size")).as("total_bytes"))
        .orderBy("Bucket")
    }),

    // The flatMapGroupsWithState custom-state operator GRADED through the
    // real streaming engine (it was previously only ScalaTest-pinned
    // against its batch twin q82). Append mode with NoTimeout over a
    // finite source emits exactly the CLOSED sessions — a session closes
    // when a later event of the same user reveals a 30-minute gap; each
    // user's final session stays in state forever. The oracle mirrors
    // that semantics exactly: gaps-and-islands sessionization minus each
    // user's last session, with the per-session value sum folded in the
    // operator's (ts, value) event order via list_reduce (the Scala
    // foldLeft and the SQL sequential fold are the same op chain).
    "q123_stream_sessionize" -> ((s, d) => {
      val sess = StreamingPipelines.sessionize(
        s, StreamingPipelines.eventsStream(s, d))
      StreamingPipelines.runAppendToCompletion(s, sess)
        .orderBy("user_id", "session_start")
    }),

    // Stream-stream interval join: view→click funnel within 10 minutes,
    // watermarked both sides, Append mode; result equals the batch join.
    "q87_stream_join" -> ((s, d) => {
      val joined = StreamingPipelines.viewClickJoin(
        StreamingPipelines.eventsStream(s, d))
      StreamingPipelines.runAppendToCompletion(s, joined)
        .orderBy("user_id", "view_id", "click_id")
    }),

    // Stream-static enrichment: the events STREAM joined per-micro-batch to
    // a broadcast static dimension (customer), then aggregated per segment.
    // The canonical streaming-ETL shape: the dim never shuffles the stream
    // (broadcast hash join inside each batch), join state is zero (static
    // side is not stateful), and the only stateful op is the final agg.
    // At 100 TB/day the stream side stays map-only until the segment agg.
    "q108_stream_static_join" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = StreamingPipelines.eventsStream(s, d)
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      StreamingPipelines.runToCompletion(s, enriched)
        .orderBy("c_mktsegment", "event_type")
    }),

    // Manifest-with-column-stats data skipping (zone maps): compact the
    // documents table into disjoint doc_id ranges, record a per-FILE
    // (min, max) stats manifest — the Delta/Iceberg planning pattern built
    // on the reference's manifest concept — then answer a selective range
    // query by reading ONLY the files whose zone overlaps the predicate.
    // The stats manifest is control-plane sized (one row per file at any
    // data scale), so the overlap filter is a driver-side plan step, not a
    // data-plane job; the pruned read touches 1 of 8 files here
    // (ConnectorSpec pins the file-skipping). Result is pruning-invariant,
    // which is exactly what the oracle on the base table checks.
    "q109_zonemap_skipping" -> ((s, d) => {
      val out = Scratch.dir("graft_zonemap")
      Tables.documents(s, d)
        .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(out)
      val pruned = ZoneMap.prunedRead(s, out, "doc_id", lo = 0L, hi = 59L)
      pruned.filter(col("doc_id").between(0, 59))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    }),

    // Z-ORDER layout + MULTI-dimension zone-map skipping — q109's
    // single-key compaction generalized to two clustering columns: rows
    // sort by the bit-interleaved (l_partkey, l_suppkey) Z-value, so a
    // z-contiguous file occupies a small RECTANGLE of the key plane and
    // its per-file (min, max) zones are tight in BOTH columns — a box
    // predicate on either dimension (or both) prunes files, which no
    // single-column sort can offer for its non-sort dimension
    // (ManifestSemanticsSpec pins exactly that comparison). The Z-value
    // exists only at write time (dropped before the sink); reads plan
    // off the multi-column stats manifest, driver-side, one row per
    // file. 21 bits per dimension (z < 2^42) covers keys to ~2M —
    // partkey reaches 200k at sf1, so 16 bits would silently alias
    // above sf0.1 (zvalue ignores high bits; see its precondition) —
    // and two 31-bit dims still fit a positive long, so headroom is
    // free. The technique is bit-width-agnostic.
    "q135_zorder_skipping" -> ((s, d) => {
      val out = Scratch.dir("graft_zorder")
      val z = ZoneMap.zvalue("l_partkey", "l_suppkey", 21)
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice")
        .withColumn("z", z)
        .repartitionByRange(16, col("z")).sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite").parquet(out)
      val pruned = ZoneMap.prunedReadBox(s, out,
        Seq(("l_partkey", 16L, 40L), ("l_suppkey", 2L, 4L)))
      pruned
        .filter(col("l_partkey").between(16, 40) &&
          col("l_suppkey").between(2, 4))
        .groupBy("l_partkey", "l_suppkey")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"))
        .orderBy("l_partkey", "l_suppkey")
    }),

    // Snapshot reconciliation by COMMUTATIVE bucket digests — the
    // anti-entropy / Merkle-leaf pattern: to compare two 100 TB
    // snapshot replicas you ship 64 (count, Σ row-hash) digests per
    // side, not the rows; only buckets whose digests disagree need a
    // row-level diff (q95's job, now scoped to ~1/64 of the keyspace
    // per differing bucket). The row hash is a 32-bit md5 slice of
    // (key, payload); Σ over a bucket is order/partition-independent
    // (the q133 additivity argument), so the digest is deterministic
    // on any cluster. v1 plants deletes (id % 101 = 5), updates
    // (id % 97 = 3), and inserts (id % 103 = 7, re-keyed); the query
    // reports exactly the disagreeing buckets.
    "q145_digest_reconcile" -> ((s, d) => {
      val v0 = Tables.documents(s, d).select("doc_id", "text")
      val v1 = v0.filter(col("doc_id") % 101 =!= 5)
        .select(col("doc_id"),
          when(col("doc_id") % 97 === 3, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(v0.filter(col("doc_id") % 103 === 7)
          .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))
      def digest(df: DataFrame): DataFrame =
        df.withColumn("m",
            md5(concat_ws(":", col("doc_id").cast("string"), col("text"))))
          .select((col("doc_id") % 64).as("bucket"),
            expr(md5Bits32("m")).as("h"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum(col("h")).as("hsum"))
      val d0 = digest(v0).select(col("bucket"),
        col("n").as("n0"), col("hsum").as("h0"))
      val d1 = digest(v1).select(col("bucket"),
        col("n").as("n1"), col("hsum").as("h1"))
      d0.join(d1, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n0"), lit(0L)).as("n0"),
          coalesce(col("n1"), lit(0L)).as("n1"),
          (coalesce(col("h1"), lit(0L)) - coalesce(col("h0"), lit(0L)))
            .as("hsum_delta"))
        .filter(col("n0") =!= col("n1") || col("hsum_delta") =!= 0)
        .orderBy("bucket")
    })
  )

  def oracles: Map[String, String] = Map(
    "q338_shard_rebalance" -> {
      val draw = graft.ext.SamplingPipeline.drawExpr(
        "concat(cast(doc_id AS STRING), '#', cast(i AS STRING))", "hrw")
      val modDraw = graft.ext.SamplingPipeline.drawExpr(
        "cast(doc_id AS STRING)", "modhash")
      val nodes8 = (0 until 8).mkString(", ")
      val nodes9 = (0 until 9).mkString(", ")
      s"""WITH hrw AS (SELECT 'a_hrw' AS arm,
                  list_position(a8, list_max(a8)) AS shard_b,
                  list_position(a9, list_max(a9)) AS shard_a
               FROM (SELECT
                  list_transform([$nodes8], i -> $draw) AS a8,
                  list_transform([$nodes9], i -> $draw) AS a9
                  FROM documents)),
          md AS (SELECT 'b_mod' AS arm,
                  ($modDraw) % 8 + 1 AS shard_b,
                  ($modDraw) % 9 + 1 AS shard_a
               FROM documents),
          both_arms AS (SELECT arm, shard_a,
                  CASE WHEN shard_b <> shard_a THEN 1 ELSE 0 END AS moved
               FROM (SELECT * FROM hrw UNION ALL SELECT * FROM md)),
          per_shard AS (SELECT arm, shard_a, count(*) AS n,
                  sum(moved) AS n_moved
               FROM both_arms GROUP BY arm, shard_a)
          SELECT arm, CAST(sum(n) AS BIGINT) AS n_keys,
                 CAST(sum(n_moved) AS BIGINT) AS n_moved,
                 CAST(sum(n_moved) * 10000 // sum(n) AS BIGINT) AS moved_bp,
                 CAST(max(n) * 10000 // sum(n) AS BIGINT)
                   AS max_shard_share_bp
          FROM per_shard GROUP BY arm ORDER BY arm"""
    },

    "q327_merkle_audit" ->
      """WITH culprit AS (SELECT min(CASE WHEN doc_id % 97 = 13
                                          THEN doc_id END) AS bad_id
                          FROM documents),
          arms AS (SELECT a.arm, d.doc_id,
                          CAST(d.doc_id % 64 AS BIGINT) AS leaf,
                          md5(CASE WHEN a.arm = 'tampered'
                                    AND d.doc_id = (SELECT bad_id FROM culprit)
                                   THEN d.text || 'X' ELSE d.text END) AS h
                   FROM documents d
                   CROSS JOIN (SELECT 'clean' AS arm
                               UNION ALL SELECT 'tampered') a),
          leaves AS (SELECT arm, leaf,
                            md5(string_agg(h, '' ORDER BY doc_id)) AS h
                     FROM arms GROUP BY arm, leaf),
          nodes AS (SELECT arm, CAST(leaf // 8 AS BIGINT) AS node,
                           md5(string_agg(h, '' ORDER BY leaf)) AS h
                    FROM leaves GROUP BY 1, 2),
          root AS (SELECT arm, CAST(0 AS BIGINT) AS node,
                          md5(string_agg(h, '' ORDER BY nodes.node)) AS h
                   FROM nodes GROUP BY arm),
          dl AS (SELECT '1_leaf' AS level, count(*) AS n_nodes,
                   CAST(sum(CASE WHEN c.h <> t.h THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_mismatch,
                   CAST(COALESCE(min(CASE WHEN c.h <> t.h THEN leaf END), -1)
                     AS BIGINT) AS mismatched_id
                 FROM (SELECT leaf, h FROM leaves WHERE arm = 'clean') c
                 JOIN (SELECT leaf, h FROM leaves WHERE arm = 'tampered') t
                   USING (leaf)),
          dn AS (SELECT '2_node' AS level, count(*) AS n_nodes,
                   CAST(sum(CASE WHEN c.h <> t.h THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_mismatch,
                   CAST(COALESCE(min(CASE WHEN c.h <> t.h THEN node END), -1)
                     AS BIGINT) AS mismatched_id
                 FROM (SELECT node, h FROM nodes WHERE arm = 'clean') c
                 JOIN (SELECT node, h FROM nodes WHERE arm = 'tampered') t
                   USING (node)),
          dr AS (SELECT '3_root' AS level, count(*) AS n_nodes,
                   CAST(sum(CASE WHEN c.h <> t.h THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_mismatch,
                   CAST(COALESCE(min(CASE WHEN c.h <> t.h THEN node END), -1)
                     AS BIGINT) AS mismatched_id
                 FROM (SELECT node, h FROM root WHERE arm = 'clean') c
                 JOIN (SELECT node, h FROM root WHERE arm = 'tampered') t
                   USING (node))
          SELECT * FROM dl UNION ALL SELECT * FROM dn
          UNION ALL SELECT * FROM dr ORDER BY level""",

    "q329_incremental_merkle" ->
      """WITH v2 AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 2 THEN 'rev2 ' || text
                            ELSE text END AS text
                     FROM documents),
          hboth AS (SELECT 'v1' AS ver, doc_id,
                           CAST(doc_id % 64 AS BIGINT) AS lf, md5(text) AS h
                    FROM documents
                    UNION ALL
                    SELECT 'v2' AS ver, doc_id,
                           CAST(doc_id % 64 AS BIGINT) AS lf, md5(text) AS h
                    FROM v2),
          leaves AS (SELECT ver, lf AS leaf,
                            md5(string_agg(h, '' ORDER BY doc_id)) AS h
                     FROM hboth GROUP BY 1, 2),
          nodes AS (SELECT ver, CAST(leaf // 8 AS BIGINT) AS node,
                           md5(string_agg(h, '' ORDER BY leaf)) AS h
                    FROM leaves GROUP BY 1, 2),
          root AS (SELECT ver, CAST(0 AS BIGINT) AS node,
                          md5(string_agg(h, '' ORDER BY nodes.node)) AS h
                   FROM nodes GROUP BY ver),
          dirty_leaves AS (SELECT DISTINCT CAST(doc_id % 64 AS BIGINT) AS id
                           FROM documents WHERE doc_id % 10 = 2),
          dirty_nodes AS (SELECT DISTINCT CAST(id // 8 AS BIGINT) AS id
                          FROM dirty_leaves),
          leaves_incr AS (
            SELECT leaf AS id, h FROM leaves
            WHERE ver = 'v2' AND leaf IN (SELECT id FROM dirty_leaves)
            UNION ALL
            SELECT leaf AS id, h FROM leaves
            WHERE ver = 'v1' AND leaf NOT IN (SELECT id FROM dirty_leaves)),
          nodes_rec AS (SELECT CAST(id // 8 AS BIGINT) AS id,
                               md5(string_agg(h, '' ORDER BY leaves_incr.id))
                                 AS h
                        FROM leaves_incr GROUP BY 1),
          nodes_incr AS (
            SELECT id, h FROM nodes_rec
            WHERE id IN (SELECT id FROM dirty_nodes)
            UNION ALL
            SELECT node AS id, h FROM nodes
            WHERE ver = 'v1' AND node NOT IN (SELECT id FROM dirty_nodes)),
          root_incr AS (SELECT CAST(0 AS BIGINT) AS id,
                               md5(string_agg(h, '' ORDER BY nodes_incr.id))
                                 AS h
                        FROM nodes_incr),
          l1 AS (SELECT '1_leaf' AS level, count(*) AS n_total,
                        (SELECT count(*) FROM dirty_leaves) AS n_recomputed,
                        CAST(sum(CASE WHEN i.h = f.h THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_incr_equal_full
                 FROM leaves_incr i
                 JOIN (SELECT leaf AS id, h FROM leaves WHERE ver = 'v2') f
                   USING (id)),
          l2 AS (SELECT '2_node' AS level, count(*) AS n_total,
                        (SELECT count(*) FROM dirty_nodes) AS n_recomputed,
                        CAST(sum(CASE WHEN i.h = f.h THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_incr_equal_full
                 FROM nodes_incr i
                 JOIN (SELECT node AS id, h FROM nodes WHERE ver = 'v2') f
                   USING (id)),
          l3 AS (SELECT '3_root' AS level, count(*) AS n_total,
                        CAST(1 AS BIGINT) AS n_recomputed,
                        CAST(sum(CASE WHEN i.h = f.h THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_incr_equal_full
                 FROM root_incr i
                 JOIN (SELECT node AS id, h FROM root WHERE ver = 'v2') f
                   USING (id))
          SELECT * FROM l1 UNION ALL SELECT * FROM l2
          UNION ALL SELECT * FROM l3 ORDER BY level""",

    "q90_manifest_fs" ->
      s"""SELECT '$SfBucketToken' AS Bucket, filename AS Key,
            str_split(filename, '/')[-1] AS FileName,
            CAST(size AS BIGINT) AS Size
          FROM read_blob('$t2Dir/*')
          ORDER BY Key""",

    "q91_fslist_source" ->
      s"""SELECT '$SfBucketToken' AS Bucket, filename AS Key,
            str_split(filename, '/')[-1] AS FileName,
            CAST(size AS BIGINT) AS Size
          FROM read_blob('$t2Dir/*')
          WHERE filename LIKE '$t2Dir/c%'
          ORDER BY Key""",

    "q92_manifest_roundtrip" ->
      s"""SELECT '$SfBucketToken' AS Bucket, CAST(count(*) AS BIGINT) AS n_files,
            CAST(sum(size) AS BIGINT) AS total_bytes,
            max(str_split(filename, '/')[-1]) AS max_name
          FROM read_blob('$t2Dir/*')""",

    "q106_stream_inventory" ->
      s"""SELECT '$SfBucketToken' AS Bucket,
            count(*) AS n_objects,
            CAST(sum(size) AS BIGINT) AS total_bytes
          FROM read_blob('$t2Dir/*')""",

    "q118_stream_inventory_bounded" ->
      s"""SELECT '$SfBucketToken' AS Bucket,
            count(*) AS n_objects,
            CAST(sum(size) AS BIGINT) AS total_bytes
          FROM read_blob('$t2Dir/*')""",

    "q104_schema_evolution" ->
      """WITH v1 AS (SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
                     FROM documents WHERE doc_id % 2 = 0),
          v2 AS (SELECT doc_id, lang, n_chars
                 FROM documents WHERE doc_id % 2 <> 0),
          merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
          SELECT lang, count(*) AS n,
                 count(n_chars) AS n_with_chars,
                 CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS total_chars
          FROM merged GROUP BY lang ORDER BY lang""",

    "q172_rle_layout_advisor" ->
      """WITH natural_f AS (
            SELECT CASE WHEN lag(o_orderpriority) OVER wn IS NULL
                          OR lag(o_orderpriority) OVER wn <> o_orderpriority
                        THEN 1 ELSE 0 END AS f_pri,
                   CASE WHEN lag(o_orderstatus) OVER wn IS NULL
                          OR lag(o_orderstatus) OVER wn <> o_orderstatus
                        THEN 1 ELSE 0 END AS f_st
            FROM orders
            WINDOW wn AS (ORDER BY o_orderkey)),
          flag_f AS (
            SELECT CASE WHEN lag(o_orderpriority) OVER wf IS NULL
                          OR lag(o_orderpriority) OVER wf <> o_orderpriority
                        THEN 1 ELSE 0 END AS f_pri,
                   CASE WHEN lag(o_orderstatus) OVER wf IS NULL
                          OR lag(o_orderstatus) OVER wf <> o_orderstatus
                        THEN 1 ELSE 0 END AS f_st
            FROM orders
            WINDOW wf AS (ORDER BY o_orderpriority, o_orderkey)),
          packed AS (
            SELECT 'by_orderkey' AS sort_order,
                   CAST(sum(f_pri) AS BIGINT) AS r_pri,
                   CAST(sum(f_st) AS BIGINT) AS r_st,
                   count(*) AS n_rows
            FROM natural_f
            UNION ALL
            SELECT 'by_priority',
                   CAST(sum(f_pri) AS BIGINT), CAST(sum(f_st) AS BIGINT),
                   count(*)
            FROM flag_f),
          unpacked AS (
            SELECT sort_order, 'o_orderpriority' AS column_name,
                   r_pri AS n_runs, n_rows FROM packed
            UNION ALL
            SELECT sort_order, 'o_orderstatus', r_st, n_rows FROM packed)
          SELECT sort_order, column_name, n_runs,
                 CAST(n_rows // n_runs AS BIGINT) AS rows_per_run
          FROM unpacked ORDER BY sort_order, column_name""",

    "q154_cdc_apply" ->
      """WITH base AS (SELECT o_orderkey AS key,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
                   strpos('0123456789abcdef',
                          substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1
                     AS h1,
                   strpos('0123456789abcdef',
                          substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1
                     AS h2
                 FROM orders),
          changelog AS (
            SELECT key, 0 AS seq, 'I' AS op, v AS value FROM base
            UNION ALL
            SELECT key, 1, 'U', v + 1111 FROM base WHERE h1 < 6
            UNION ALL
            SELECT key, 2, 'D', CAST(NULL AS BIGINT) FROM base WHERE h2 < 4),
          ranked AS (SELECT key, value, seq, op,
                            count(*) OVER (PARTITION BY key) AS n_ops,
                            row_number() OVER (PARTITION BY key
                                               ORDER BY seq DESC) AS rn
                     FROM changelog)
          SELECT key, value, CAST(seq AS BIGINT) AS last_seq, n_ops
          FROM ranked WHERE rn = 1 AND op <> 'D' ORDER BY key""",

    "q150_compaction_binpack" ->
      """WITH f AS (SELECT o_orderpriority AS pri, o_orderkey AS key,
                           CAST(floor(o_totalprice * 100) AS BIGINT) AS bytes
                    FROM orders),
          binned AS (SELECT pri, key, bytes,
                            COALESCE(sum(bytes) OVER (
                              PARTITION BY pri ORDER BY key
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0)
                              // 1000000000 AS bin_id
                     FROM f)
          SELECT pri, CAST(bin_id AS BIGINT) AS bin_id,
                 count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS bin_bytes,
                 min(key) AS min_key, max(key) AS max_key
          FROM binned GROUP BY pri, bin_id ORDER BY pri, bin_id""",

    "q105_manifest_compaction" ->
      """WITH m AS (SELECT source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS Key,
                           n_chars AS Size
                    FROM documents)
          SELECT count(*) AS n, CAST(sum(Size) AS BIGINT) AS total_size,
                 min(Key) AS min_key, max(Key) AS max_key
          FROM m""",

    "q95_manifest_diff" ->
      """WITH oldm AS (
            SELECT source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS Key,
                   n_chars AS old_size
            FROM documents WHERE doc_id % 7 <> 0),
          newm AS (
            SELECT source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS Key,
                   n_chars + doc_id % 3 AS new_size
            FROM documents WHERE doc_id % 5 <> 0)
          SELECT Key,
                 CASE WHEN old_size IS NULL THEN 'added'
                      WHEN new_size IS NULL THEN 'removed'
                      WHEN old_size <> new_size THEN 'changed'
                      ELSE 'unchanged' END AS status,
                 old_size, new_size
          FROM oldm FULL OUTER JOIN newm USING (Key)
          ORDER BY Key""",

    "q93_csv_roundtrip" ->
      s"""SELECT o_orderpriority, count(*) AS n, ${oSum("o_totalprice")} AS total
          FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q94_json_roundtrip" ->
      s"""SELECT o_orderstatus, count(*) AS n, ${oSum("o_totalprice")} AS total,
                 min(o_orderkey) AS min_key
          FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q97_orc_roundtrip" ->
      s"""SELECT p_brand, count(*) AS n, ${oSum("p_retailprice")} AS total_price,
                 CAST(max(p_size) AS INTEGER) AS max_size
          FROM part GROUP BY p_brand ORDER BY p_brand""",

    "q193_avro_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS cents,
                max(o_orderdate) AS last_order
          FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q98_text_roundtrip" ->
      """SELECT lang, count(*) AS n,
                CAST(sum(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY lang ORDER BY lang""",

    "q96_partitioned_prune" ->
      """SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_size,
                min(source || '/' || CAST(doc_id AS VARCHAR) || '.txt') AS min_key
          FROM documents WHERE source = 'src1'""",

    "q79_nested_roundtrip" ->
      """SELECT source, count(*) AS n,
                CAST(sum(n_chars) AS BIGINT) AS total_chars
          FROM documents WHERE lang = 'en'
          GROUP BY source ORDER BY source""",

    "q86_stream_tumbling" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
          count(*) AS n, ${oSum("value")} AS total_value
          FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",

    // Same declarative KMV formulation as the batch q169 oracle — the
    // streamed sketch must be indistinguishable from it.
    "q174_stream_session_window" -> EventQueries.sessionWindowOracle,

    // q227: the streamed bitmap must equal batch q226 — same oracle.
    "q227_stream_bitmap" -> SketchQueries.bitmapOverlapOracleSql,

    "q170_stream_kmv" ->
      s"""WITH uu AS (SELECT DISTINCT event_type, user_id FROM events),
          hm AS (SELECT event_type,
                        md5(CAST(user_id AS VARCHAR)) AS m FROM uu),
          hashed AS (SELECT DISTINCT event_type,
                            ${graft.ops.oMd5Bits32("m")} AS h FROM hm),
          sk AS (SELECT event_type, h FROM (
                   SELECT event_type, h,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY h) AS rn
                   FROM hashed) WHERE rn <= 64)
          SELECT event_type, count(*) AS cnt, max(h) AS kth,
                 CAST(CASE WHEN count(*) < 64 THEN count(*)
                           ELSE (63 * 4294967296) // max(h) END AS BIGINT)
                   AS est_distinct
          FROM sk GROUP BY event_type ORDER BY event_type""",

    "q89_stream_dedup" ->
      """SELECT event_type, count(*) AS n
          FROM events GROUP BY event_type ORDER BY event_type""",

    // q127's oracle verbatim — the streaming run must equal the batch one
    "q143_stream_topk" ->
      """SELECT event_type, CAST(rank AS INTEGER) AS rank, event_id, value FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rank
            FROM events)
          WHERE rank <= 5 ORDER BY event_type, rank""",

    "q123_stream_sessionize" ->
      """WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
          sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged),
          agg AS (
            SELECT user_id, session_id,
                   make_timestamp(epoch_us(min(ts)) // 1000 * 1000) AS session_start,
                   count(*) AS n_events,
                   list_reduce(list(value ORDER BY ts, value), (a, b) -> a + b) AS total_value
            FROM sessions GROUP BY user_id, session_id)
          SELECT user_id, session_start, n_events, total_value FROM (
            SELECT *, max(session_id) OVER (PARTITION BY user_id) AS last_sid
            FROM agg)
          WHERE session_id < last_sid
          ORDER BY user_id, session_start""",

    "q87_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
          FROM events v JOIN events c
            ON v.user_id = c.user_id
           AND v.event_type = 'view' AND c.event_type = 'click'
           AND c.ts > v.ts
           AND epoch_us(c.ts) - epoch_us(v.ts) <= 600 * 1000000
          ORDER BY v.user_id, view_id, click_id""",

    "q108_stream_static_join" ->
      s"""SELECT c.c_mktsegment, e.event_type, count(*) AS n,
            ${oSum("e.value")} AS total_value
          FROM events e JOIN customer c ON e.user_id = c.c_custkey
          GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""",

    "q124_manifest_timetravel" ->
      """WITH labeled AS (
            SELECT CASE WHEN doc_id % 10 = 0 THEN 'changed' ELSE 'unchanged' END AS status,
                   n_chars AS old_size,
                   CASE WHEN doc_id % 10 = 0 THEN n_chars + 100 ELSE n_chars END AS new_size
            FROM documents)
          SELECT status, count(*) AS n,
                 CAST(sum(old_size) AS BIGINT) AS total_old,
                 CAST(sum(new_size) AS BIGINT) AS total_new
          FROM labeled GROUP BY status ORDER BY status""",

    "q111_manifest_merge" ->
      """WITH snap AS (
            SELECT source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS Key,
                   n_chars AS old_size
            FROM documents WHERE doc_id % 7 <> 0),
          ups AS (
            SELECT source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS Key,
                   n_chars + 100 AS new_size
            FROM documents WHERE doc_id % 5 = 0),
          dels AS (
            SELECT source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS Key
            FROM documents WHERE doc_id % 11 = 0),
          merged AS (
            SELECT Key, coalesce(new_size, old_size) AS Size
            FROM snap FULL OUTER JOIN ups USING (Key))
          SELECT Key, Size FROM merged
          WHERE Key NOT IN (SELECT Key FROM dels)
          ORDER BY Key""",

    "q110_bucketed_join" ->
      s"""SELECT o.o_orderpriority, count(*) AS n_items,
            ${oSum("l.l_quantity")} AS sum_qty,
            ${oSum("l.l_extendedprice")} AS sum_price
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1 ORDER BY o_orderpriority""",

    // Pruning-invariance is the contract: the zone-mapped read plus the
    // residual predicate must equal the same predicate on the base table.
    "q109_zonemap_skipping" ->
      """SELECT lang, count(*) AS n,
            CAST(sum(n_chars) AS BIGINT) AS total_chars,
            min(doc_id) AS min_id, max(doc_id) AS max_id
          FROM documents WHERE doc_id BETWEEN 0 AND 59
          GROUP BY lang ORDER BY lang""",

    "q145_digest_reconcile" -> {
      val h32 = oMd5Bits32("m")
      s"""WITH v0 AS (SELECT doc_id, text FROM documents),
          v1 AS (SELECT doc_id,
                        CASE WHEN doc_id % 97 = 3 THEN text || ' v2'
                             ELSE text END AS text
                 FROM v0 WHERE doc_id % 101 <> 5
                 UNION ALL
                 SELECT doc_id + 5000000, text FROM v0 WHERE doc_id % 103 = 7),
          d0 AS (SELECT bucket, count(*) AS n0, CAST(sum(h) AS BIGINT) AS h0
                 FROM (SELECT doc_id % 64 AS bucket, $h32 AS h
                       FROM (SELECT doc_id, text,
                                    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS m
                             FROM v0))
                 GROUP BY bucket),
          d1 AS (SELECT bucket, count(*) AS n1, CAST(sum(h) AS BIGINT) AS h1
                 FROM (SELECT doc_id % 64 AS bucket, $h32 AS h
                       FROM (SELECT doc_id, text,
                                    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS m
                             FROM v1))
                 GROUP BY bucket)
          SELECT bucket, coalesce(n0, 0) AS n0, coalesce(n1, 0) AS n1,
                 coalesce(h1, 0) - coalesce(h0, 0) AS hsum_delta
          FROM d0 FULL OUTER JOIN d1 USING (bucket)
          WHERE coalesce(n0, 0) <> coalesce(n1, 0)
             OR coalesce(h1, 0) - coalesce(h0, 0) <> 0
          ORDER BY bucket"""
    },

    // Pruning-invariance again: Z-layout + zones + residual box == box
    // predicate on the base table.
    "q135_zorder_skipping" ->
      s"""SELECT l_partkey, l_suppkey, count(*) AS n,
            ${oSum("l_quantity")} AS sum_qty,
            min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
          FROM lineitem
          WHERE l_partkey BETWEEN 16 AND 40 AND l_suppkey BETWEEN 2 AND 4
          GROUP BY l_partkey, l_suppkey ORDER BY l_partkey, l_suppkey"""
  )
}
