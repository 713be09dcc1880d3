package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column convention: media payloads travel as opaque `binary`
  * columns next to typed metadata, and decode / feature-extraction runs as
  * a partition-wise typed pipeline (`Dataset.mapPartitions`) so per-batch
  * setup (codec init, model load) happens once per partition, not per row.
  *
  * Two codecs share the pipeline: [[ImageIoCodec]] REALLY decodes
  * PNG/JPEG/GIF/BMP headers via the JDK's `javax.imageio` (no external
  * native libs needed), and [[FakeCodec]] is a clearly-marked
  * deterministic stand-in ("decodes" width/height/frames from the MD5 of
  * the payload bytes) used where the oracle needs engine-independent
  * values — the graded q71 runs the fake path because DuckDB cannot
  * decode images, while `decodeAllImageIo` is the production entry
  * (spec-verified against generated PNG/JPEG bytes in ExtensionSpec).
  */
object Multimodal {
  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
                       n_frames: Int, fmt: String)

  /** Deterministic fake decoder (stands in for e.g. libjpeg/ffmpeg probe).
    * Real implementation would parse the payload header; this derives the
    * same fields from MD5 so the result is verifiable cross-engine.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(payload).map("%02x".format(_)).mkString
      def hv(i: Int) = Integer.parseInt(h.substring(i, i + 1), 16)
      val width = 64 + hv(0) * 16 + hv(1)
      val height = 64 + hv(2) * 16 + hv(3)
      val frames = 1 + hv(4) % 8
      val fmt = Seq("rgb", "gray", "yuv")(hv(5) % 3)
      (width, height, frames, fmt)
    }
  }

  /** Partition-wise decode: one codec instance per partition. */
  def decodeAll(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m =>
        val (w, h, f, fmt) = FakeCodec.decode(m.payload)
        MediaMeta(m.doc_id, m.payload.length, w, h, f, fmt)
      }
    }.toDF()
  }

  /** REAL image codec over the JDK's built-in readers (PNG, JPEG, GIF,
    * BMP ship with `javax.imageio` — no external native libs). This is a
    * HEADER-level probe: dimensions, frame count, and band count come
    * from the reader's metadata path (`getWidth`/`getImageTypes`), so no
    * full pixel raster is materialized per row — the right cost shape
    * for a 100 TB metadata sweep, where full decode belongs to the
    * downstream feature-extraction stage, not the census.
    * Returns None for payloads no installed reader claims, so callers
    * can route non-image bytes explicitly instead of crashing the task. */
  object ImageIoCodec {
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, String)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val frames = try math.max(r.getNumImages(true), 1)
              catch { case _: Throwable => 1 } // readers that can't count ahead
            val bands = {
              val ts = r.getImageTypes(0)
              if (ts.hasNext) ts.next().getNumBands else 3
            }
            val fmt = if (bands >= 3) "rgb" else "gray" // FakeCodec's vocabulary
            Some((w, h, frames, fmt))
          } catch { case _: Throwable => None // truncated/corrupt header
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    }
  }

  /** [[decodeAll]] with the REAL codec: payloads an installed reader
    * claims decode for real; anything else falls back to the
    * deterministic [[FakeCodec]] with a `stub_` fmt prefix, so mixed
    * corpora (the production reality) neither crash nor silently fake —
    * the routing is visible in the output. Same partition-wise shape:
    * codec lookup state is JVM-wide, rows stream through the iterator. */
  def decodeAllImageIo(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m =>
        ImageIoCodec.decode(m.payload) match {
          case Some((w, h, f, fmt)) =>
            MediaMeta(m.doc_id, m.payload.length, w, h, f, fmt)
          case None =>
            val (w, h, f, fmt) = FakeCodec.decode(m.payload)
            MediaMeta(m.doc_id, m.payload.length, w, h, f, s"stub_$fmt")
        }
      }
    }.toDF()
  }

  type Q = (SparkSession, String) => DataFrame

  /** pHash LSH band value: the 15-bit slice `band` of the 60-bit hash.
    * ONE seam for q113's batch near-dup join and q347's streamed ingest
    * census, so [[graft.Mutations]] can plant the classic band-mask
    * width slip (& 16383 — 14 bits instead of 15) once. q113's verified
    * pairs ABSORB the slip (a narrower mask only MERGES buckets, so
    * candidates are a superset and the hamming ≤ 4 verification rescues
    * the output); the q347 census is the surface that shifts, so the
    * red-case pins that member — the q51_seed_fencepost pattern. Knob
    * read at plan-construction time (compile-time constant when off). */
  private[ext] def bandValueSql: String = {
    val mask = if (graft.Mutations.on("q347_band_mask_short")) 16383 else 32767
    s"(phash >> (band * 15)) & $mask"
  }

  def queries: Map[String, Q] = Map(
    // Media table convention: binary payload + SQL-side metadata. The
    // graded projection hex-encodes the payload (raw binary is kept for
    // downstream ops — ExtensionSpec covers the binary round-trip; the
    // oracle harness can only hash text/numeric columns).
    "q70_media_metadata" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          lower(hex(encode(col("text"), "UTF-8"))).as("payload_hex"),
          octet_length(col("text")).as("byte_len"),
          md5(col("text")).as("checksum"))
        .orderBy("doc_id")
    }),

    // Typed partition-wise decode through the binary-column pipeline.
    "q71_media_decode" -> ((s, d) => {
      val media = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      decodeAll(s, media).orderBy("doc_id")
    }),

    // Perceptual-hash near-dup over media payloads: the image-dedup shape.
    // A real pipeline computes a 64-bit pHash from decoded pixels (similar
    // images → small Hamming distance); the codec-free stand-in derives a
    // 60-bit hash from the payload digest and PLANTS near-copies whose
    // hash differs in exactly one bit (doc_id % 10, id + 200000) — what a
    // re-encoded image's pHash looks like. Matching machinery is the real
    // thing and is decoder-agnostic: 4×15-bit Hamming LSH bands (k bit
    // flips leave ≥ 4−k bands intact, so 1-flip copies collide in 3 of
    // 4), mega-bucket cap, candidates-only bit_count verification at
    // Hamming ≤ 4. One shuffle on (band, value); no all-pairs path.
    "q113_phash_neardup" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("phash"))
      val planted = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          expr("phash ^ (CAST(1 AS BIGINT) << CAST(doc_id % 15 AS INT))").as("phash"))
      val corpus = base.unionByName(planted)
      val bands = corpus.select(col("doc_id"), col("phash"),
          explode(expr("array(0, 1, 2, 3)")).as("band"))
        .withColumn("bv", expr(bandValueSql))
      val bw = Window.partitionBy("band", "bv")
      val capped = bands.withColumn("bkt_n", count(lit(1)).over(bw))
        .filter(col("bkt_n") <= DedupQueries.DefaultMaxBucket).drop("bkt_n")
      val l = capped.select(col("band"), col("bv"),
        col("doc_id").as("id1"), col("phash").as("p1"))
      val r = capped.select(col("band"), col("bv"),
        col("doc_id").as("id2"), col("phash").as("p2"))
      l.join(r, Seq("band", "bv")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          expr("bit_count(p1 ^ p2)").cast("int").as("hamming"))
        .filter(col("hamming") <= 4)
        .distinct()
        .orderBy("id1", "id2")
    }),

    // STREAMED MULTIMODAL INGEST — the media member of the at-ingest
    // family (q339 prefix-cache, q342 schema-drift, q343 ANN routing;
    // r16 verdict item 6: multimodal was the one north-star family with
    // no streaming twin): arriving media are pHashed and LSH-banded AT
    // INGEST, and the ONE stateful operator keeps the (band, bucket)
    // census — the standing structure q113's batch near-dup join later
    // probes, and the saturation signal (collision buckets, max bucket
    // occupancy) that tells an operator when a band's mega-bucket cap
    // is about to bite. Planted near-copies ride the SAME map-side
    // explode as the base rows (one pass, no stream union); the per-
    // band rollup runs as a batch read of the completed census (the
    // q342 discipline). Bands come from the [[bandValueSql]] seam; this
    // census is the surface the band-mask knob can redden (q113's
    // verified pairs absorb it — see the seam's scaladoc). The
    // oracle computes the identical census relationally — streamed
    // ingest over the finite source must equal it row for row.
    // Scale: ingest work is map-side (hash + ≤8 rows per doc); state
    // is bucket-keyed, bounded by 4·2¹⁵ live keys per band layout.
    "q347_stream_phash_ingest" -> ((s, d) => {
      val ph = expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
      val rows = graft.streaming.StreamingPipelines.documentsStream(s, d)
        .select(col("doc_id"), ph.as("phash"))
        .select(explode(when(col("doc_id") % 10 === 0,
            array(struct(col("doc_id"), col("phash")),
              struct((col("doc_id") + 200000L).as("doc_id"),
                expr("phash ^ (CAST(1 AS BIGINT) << CAST(doc_id % 15 AS INT))")
                  .as("phash"))))
          .otherwise(array(struct(col("doc_id"), col("phash"))))).as("m"))
        .select(col("m.doc_id").as("doc_id"), col("m.phash").as("phash"))
      val bands = rows.select(col("doc_id"), col("phash"),
          explode(expr("array(0, 1, 2, 3)")).as("band"))
        .withColumn("bv", expr(bandValueSql))
      val census = bands.groupBy("band", "bv")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("id_min"))
      graft.streaming.StreamingPipelines.runToCompletion(s, census)
        .groupBy("band")
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("n")).as("n_docs"),
          sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_collision_buckets"),
          max(col("n")).as("max_bucket_n"),
          min(when(col("n") >= 2, col("id_min"))).as("first_collider"))
        .orderBy("band")
    }),

    // Frame sampling: fixed-stride byte windows over the binary payload
    // (the video-frame / audio-chunk extraction shape: explode an index,
    // slice the blob, fingerprint each slice).
    // CLIP-REUSE detection — cross-media shared-segment discovery at
    // FRAME granularity (which videos contain the same footage), the
    // partial-overlap case q113's whole-media pHash can't see: sample
    // fixed-stride frames (the q72 extraction shape), fingerprint each,
    // and join media on shared frame fingerprints. Planted "re-edits"
    // (every 7th doc, first frame overwritten, the rest intact) must
    // surface as pairs sharing exactly their surviving frames. The
    // overwritten frame is IDENTICAL across all re-edits — a
    // boilerplate mega-bucket by construction — and is killed by the
    // [[ClipFrameCap]] guard before the join, exercising the same cap
    // discipline as the LSH band buckets at a cap the fixture actually
    // crosses.
    // Scale: frames-per-media is a constant (sampling stride), the join
    // is fingerprint-keyed with bounded buckets, pair counts aggregate
    // map-side — never all-pairs across media.
    "q223_clip_reuse" -> ((s, d) => {
      val (frames, reedits) = reeditFrames(s, d)
      // Scale-independent cap: the template frame's bucket size equals
      // the re-edit count, so a fixed constant only bites on fixtures
      // with more re-edits than the constant. Derive the cap from the
      // planted count itself — max(2, min(ClipFrameCap, n_re − 1)) —
      // so the mega-bucket dies at ANY corpus size with ≥3 re-edits
      // while genuine base↔re-edit buckets (size ≤ 2) always survive;
      // at production scale the static ClipFrameCap ceiling governs.
      val nRe = reedits.agg(count(lit(1)).as("n_re"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("fh")
      val capped = frames.crossJoin(broadcast(nRe))
        .withColumn("cap",
          greatest(lit(2L), least(lit(ClipFrameCap.toLong), col("n_re") - 1)))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("n") <= col("cap")).drop("n", "cap", "n_re")
      capped.select(col("fh"), col("doc_id").as("id1"))
        .join(capped.select(col("fh"), col("doc_id").as("id2")), Seq("fh"))
        .filter(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("n_shared_frames"))
        .orderBy("id1", "id2")
    }),

    // FRAME INVERTED-INDEX census — the health report of the store
    // q223 queries: per frame fingerprint, how many media carry it,
    // banded (unique / pair / reused 3-10 / template >10). The census
    // is what JUSTIFIES q223's mega-bucket cap: the planted template
    // frame shows up as the b4 band's max_df — the reader sees exactly
    // what the cap kills and how big it is before any pair join runs.
    // Same reeditFrames construction as q223 (one definition per
    // engine side), NO cap here — the census prices the raw index.
    // Scale: frames-per-media constant, one fh-keyed count with
    // map-side combine, then a 4-row band rollup.
    "q264_frame_index" -> ((s, d) => {
      val (frames, _) = reeditFrames(s, d)
      frames.groupBy("fh").agg(count(lit(1)).as("df"))
        .withColumn("band",
          when(col("df") === 1, "b1_unique")
            .when(col("df") === 2, "b2_pair")
            .when(col("df") <= 10, "b3_reused")
            .otherwise("b4_template"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_frames"), sum(col("df")).as("n_postings"),
          max(col("df")).as("max_df"))
        .orderBy("band")
    }),

    // PAYLOAD POOLING — the resize / feature-extract step of the
    // multimodal brief, graded: the payload's first 256 bytes read as a
    // 16×16 grid, box-filtered down to a 4×4 integer feature map (each
    // cell the truncating mean of its 4×4 byte block) — exactly the
    // average-pool a thumbnailer or a patch embedder runs, on the
    // deterministic text-byte payload so the oracle can grade the
    // arithmetic (the q71 stub-codec contract: real plumbing, engine-
    // independent values; the ImageIo path reuses this shape on real
    // pixels). Documents shorter than 256 bytes pad with spaces (byte
    // 32 — NUL is not portable VARCHAR in DuckDB), and the pad mass is
    // IN the mean, so short payloads converge visibly toward flat 32s.
    // Scale: map-side only — one 16-way explode per doc, no shuffle
    // until the per-doc 16-cell rollup (map-side combined).
    "q281_payload_pooling" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .select(col("doc_id"),
          explode(expr("sequence(0, 15)")).as("cell"), col("text"))
        .select(col("doc_id"), col("cell"),
          expr("""aggregate(
                    transform(sequence(0, 15), i ->
                      ascii(substring(rpad(text, 256, ' '),
                        (cell DIV 4) * 64 + (i DIV 4) * 16
                          + (cell % 4) * 4 + (i % 4) + 1, 1))),
                    CAST(0 AS BIGINT), (acc, v) -> acc + v)""").as("blk_sum"))
        .withColumn("pooled", expr("blk_sum DIV 16"))
        .groupBy("doc_id")
        .agg(sum(col("blk_sum")).as("total_mass"),
          min(col("pooled")).as("min_pool"), max(col("pooled")).as("max_pool"),
          expr("array_sort(collect_list(struct(cell, pooled)))").as("cells"))
        .select(col("doc_id"), col("total_mass"), col("min_pool"),
          col("max_pool"),
          expr("array_join(transform(cells, x -> CAST(x.pooled AS STRING)), ',')")
            .as("feature_csv"))
        .orderBy("doc_id")
    }),

    "q72_frame_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(3))).as("frame_idx"), col("payload"))
        .select(col("doc_id"), col("frame_idx"),
          expr("substring(payload, frame_idx * 64 + 1, 64)").as("frame"))
        .filter(octet_length(col("frame")) > 0)
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"),
          octet_length(col("frame")).as("frame_len"))
        .orderBy("doc_id", "frame_idx")
    })
  )

  /** q223's boilerplate-frame guard CEILING: a frame fingerprint shared
    * by more than the effective cap is template footage (here: the
    * re-edits' common overwritten frame), not reuse signal — dropped
    * before the join. The effective cap is max(2, min(this, n_re − 1)),
    * derived from the planted re-edit count so the guard bites at any
    * corpus size with ≥3 re-edits instead of only on fixtures larger
    * than a tuned constant; this value is the production ceiling. */
  private[ext] val ClipFrameCap = 50

  /** q223/q264's shared corpus + frame-fingerprint table: documents plus
    * the planted re-edits (every 7th doc, first 64-byte frame overwritten
    * by an identical template), fixed-stride 64-byte frames fingerprinted
    * and deduped per media. Returns (frames, reedits). */
  private def reeditFrames(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val reedits = docs
      .filter(col("doc_id") % 7 === 0 && length(col("text")) >= 129)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(lit("x" * 64), expr("substring(text, 65)")).as("text"))
    val corpus = docs.unionByName(reedits)
    val frames = corpus
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(3))).as("frame_idx"), col("text"))
      .select(col("doc_id"),
        expr("substring(text, frame_idx * 64 + 1, 64)").as("frame"))
      .filter(length(col("frame")) === 64)
      .select(col("doc_id"), md5(col("frame")).as("fh"))
      .distinct()
    (frames, reedits)
  }

  /** DuckDB twin of [[reeditFrames]] — yields `corpus` and `frames`. */
  private val oReeditFramesCtes: String =
    """corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 5000000 AS doc_id,
                   repeat('x', 64) || substr(text, 65) AS text
            FROM documents WHERE doc_id % 7 = 0 AND length(text) >= 129),
          frames AS (SELECT DISTINCT doc_id, md5(frame) AS fh FROM (
                       SELECT doc_id,
                              substr(text, frame_idx * 64 + 1, 64) AS frame
                       FROM (SELECT doc_id, text,
                               unnest(generate_series(0, 3)) AS frame_idx
                             FROM corpus))
                     WHERE length(frame) = 64)"""

  private def hvSql(i: Int) =
    s"(strpos('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1)"

  def oracles: Map[String, String] = Map(
    "q223_clip_reuse" ->
      s"""WITH $oReeditFramesCtes,
          nre AS (SELECT count(*) AS n_re FROM corpus
                  WHERE doc_id >= 5000000),
          capped AS (SELECT doc_id, fh FROM (
                       SELECT f.*, count(*) OVER (PARTITION BY fh) AS n
                       FROM frames f), nre
                     WHERE n <= greatest(2, least($ClipFrameCap, n_re - 1)))
          SELECT a.doc_id AS id1, b.doc_id AS id2,
                 count(*) AS n_shared_frames
          FROM capped a JOIN capped b
            ON a.fh = b.fh AND a.doc_id < b.doc_id
          GROUP BY 1, 2 ORDER BY id1, id2""",

    "q264_frame_index" ->
      s"""WITH $oReeditFramesCtes,
          posting AS (SELECT fh, CAST(count(*) AS BIGINT) AS df
                      FROM frames GROUP BY fh),
          banded AS (SELECT CASE WHEN df = 1 THEN 'b1_unique'
                                 WHEN df = 2 THEN 'b2_pair'
                                 WHEN df <= 10 THEN 'b3_reused'
                                 ELSE 'b4_template' END AS band, df
                     FROM posting)
          SELECT band, count(*) AS n_frames,
                 CAST(sum(df) AS BIGINT) AS n_postings,
                 max(df) AS max_df
          FROM banded GROUP BY band ORDER BY band""",

    "q281_payload_pooling" ->
      """WITH cells AS (SELECT doc_id,
                               unnest(generate_series(0, 15)) AS cell,
                               rpad(text, 256, ' ') AS t
                        FROM documents),
          blocks AS (SELECT doc_id, cell,
                            CAST(list_sum(list_transform(
                              generate_series(0, 15), i ->
                                ord(substr(t, (cell // 4) * 64
                                  + (i // 4) * 16 + (cell % 4) * 4
                                  + (i % 4) + 1, 1)))) AS BIGINT) AS blk_sum
                     FROM cells),
          pooled AS (SELECT doc_id, cell, blk_sum,
                            blk_sum // 16 AS pooled
                     FROM blocks)
          SELECT doc_id, CAST(sum(blk_sum) AS BIGINT) AS total_mass,
                 min(pooled) AS min_pool, max(pooled) AS max_pool,
                 string_agg(CAST(pooled AS VARCHAR), ',' ORDER BY cell)
                   AS feature_csv
          FROM pooled GROUP BY doc_id ORDER BY doc_id""",

    "q70_media_metadata" ->
      """SELECT doc_id, lower(hex(encode(text))) AS payload_hex,
            CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
            md5(text) AS checksum
          FROM documents ORDER BY doc_id""",

    "q71_media_decode" ->
      s"""SELECT doc_id,
            CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
            CAST(64 + ${hvSql(0)} * 16 + ${hvSql(1)} AS INTEGER) AS width,
            CAST(64 + ${hvSql(2)} * 16 + ${hvSql(3)} AS INTEGER) AS height,
            CAST(1 + ${hvSql(4)} % 8 AS INTEGER) AS n_frames,
            CASE ${hvSql(5)} % 3 WHEN 0 THEN 'rgb' WHEN 1 THEN 'gray'
                                 ELSE 'yuv' END AS fmt
          FROM documents ORDER BY doc_id""",

    "q113_phash_neardup" ->
      s"""WITH base AS (SELECT doc_id,
                   ('0x' || substr(md5(text), 1, 15))::BIGINT AS phash
            FROM documents),
          planted AS (SELECT doc_id + 200000 AS doc_id,
                   xor(phash, (CAST(1 AS BIGINT) << CAST(doc_id % 15 AS INTEGER))) AS phash
            FROM base WHERE doc_id % 10 = 0),
          corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
          bands AS (SELECT doc_id, phash, band,
                   (phash >> (band * 15)) & 32767 AS bv
            FROM corpus, (SELECT unnest([0, 1, 2, 3]) AS band)),
          capped AS (SELECT doc_id, phash, band, bv FROM (
                   SELECT b.*, count(*) OVER (PARTITION BY band, bv) AS bkt_n
                   FROM bands b) WHERE bkt_n <= ${DedupQueries.DefaultMaxBucket}),
          cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                   CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
            FROM capped a JOIN capped b
              ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
          SELECT id1, id2, hamming FROM cand
          WHERE hamming <= 4 ORDER BY id1, id2""",

    // relational twin of the streamed ingest census — equality over the
    // finite source is the stream==batch witness
    "q347_stream_phash_ingest" ->
      """WITH base AS (SELECT doc_id,
                   ('0x' || substr(md5(text), 1, 15))::BIGINT AS phash
            FROM documents),
          planted AS (SELECT doc_id + 200000 AS doc_id,
                   xor(phash, (CAST(1 AS BIGINT) << CAST(doc_id % 15 AS INTEGER))) AS phash
            FROM base WHERE doc_id % 10 = 0),
          corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
          bands AS (SELECT doc_id, phash, band,
                   (phash >> (band * 15)) & 32767 AS bv
            FROM corpus, (SELECT unnest([0, 1, 2, 3]) AS band)),
          buckets AS (SELECT band, bv, CAST(count(*) AS BIGINT) AS n,
                             min(doc_id) AS id_min
                      FROM bands GROUP BY 1, 2)
          SELECT CAST(band AS INTEGER) AS band,
                 CAST(count(*) AS BIGINT) AS n_buckets,
                 CAST(sum(n) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_collision_buckets,
                 max(n) AS max_bucket_n,
                 min(CASE WHEN n >= 2 THEN id_min END) AS first_collider
          FROM buckets GROUP BY band ORDER BY band""",

    "q72_frame_sample" ->
      """SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
            md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_md5,
            CAST(octet_length(encode(substr(text, frame_idx * 64 + 1, 64))) AS INTEGER) AS frame_len
          FROM (SELECT doc_id, text, unnest(generate_series(0, 3)) AS frame_idx
                FROM documents)
          WHERE octet_length(encode(substr(text, frame_idx * 64 + 1, 64))) > 0
          ORDER BY doc_id, frame_idx"""
  )
}
