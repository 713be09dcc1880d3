package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column convention: media payloads travel as opaque `binary`
  * columns next to typed metadata, and decode / feature-extraction runs as
  * a partition-wise typed pipeline (`Dataset.mapPartitions`) so per-batch
  * setup (codec init, model load) happens once per partition, not per row.
  *
  * The container has no image/audio codecs, so [[FakeCodec]] is a
  * clearly-marked deterministic stand-in: it "decodes" width/height/frames
  * from the MD5 of the payload bytes. The Spark-side plumbing — binary
  * columns, schema, partition-wise batching, typed output — is the real
  * thing and is what a production codec would drop into.
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

  type Q = (SparkSession, String) => DataFrame

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

    // Frame sampling: fixed-stride byte windows over the binary payload
    // (the video-frame / audio-chunk extraction shape: explode an index,
    // slice the blob, fingerprint each slice).
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

  private def hvSql(i: Int) =
    s"(strpos('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1)"

  def oracles: Map[String, String] = Map(
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
