package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media payload: bytes + typed metadata (SURVEY.md §2.7 E2
  * generalized — the reference fetches Slack image bytes and carries them
  * as (media_type, data) structs, `slackEventServer.js:157-184`). */
case class MediaRecord(doc_id: Long, mime: String, media: Array[Byte])

/** Decoded/extracted features for one media payload. */
case class MediaFeature(doc_id: Long, mime: String, n_bytes: Long,
                        width: Int, height: Int, rs_width: Int, rs_height: Int,
                        n_frames: Int, content_hash: String, frame_hashes: String)

/** Multimodal columns: image/audio/video as opaque binary columns with
  * typed metadata, processed by an imperative per-partition decoder —
  * the one operator family where row-at-a-time native code beats
  * expressions (real decoders are C libraries, not SQL).
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (this container
  * has no image/audio codecs): "dimensions" come from the payload's md5,
  * "frame sampling" hashes byte-range slices. Everything around the stub
  * is the real production plumbing and is what these queries verify:
  *  - binary payload column + mime metadata in a typed Dataset[MediaRecord]
  *  - mapPartitions batch shape: ONE decoder instance per partition
  *    (MessageDigest here; a JNI codec handle in production), amortized
  *    across the partition's rows — never per-row setup
  *  - per-row decode work parallel across partitions, no shuffle
  *  - downstream relational composition (q30 aggregates the typed output)
  *
  * Scale notes (100 TB): payloads stay opaque bytes end-to-end (no
  * base64 inflation in flight); decode is map-side only; the only
  * shuffle anywhere is q30's 3-group aggregation. Real-decoder swap-in
  * touches exactly one function (decodeStub).
  */
object MediaOps {

  /** The documents table as a media corpus: payload = UTF-8 text bytes,
    * mime assigned round-robin. (Docs are pure ASCII, so byte length,
    * char length, and DuckDB octet_length all agree — asserted in tests.) */
  def mediaCorpus(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).selectExpr(
      "doc_id",
      """CASE cast(doc_id % 3 as int) WHEN 0 THEN 'image/png'
        |WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END as mime"""
        .stripMargin.replace("\n", " "),
      "cast(text as binary) as media")

  private def md5hex(md: MessageDigest, bytes: Array[Byte]): String =
    Tables.hex(md.digest(bytes))

  /** SQL-semantics substring over bytes: 1-based, length-clamped. */
  private def sqlSlice(bytes: Array[Byte], pos: Int, len: Int): Array[Byte] = {
    val from = math.min(math.max(pos - 1, 0), bytes.length)
    val until = math.min(from + math.max(len, 0), bytes.length)
    java.util.Arrays.copyOfRange(bytes, from, until)
  }

  /** >>> DECODE STUB <<< — stands in for a real image/audio/video
    * decoder. Deterministic: features derive from md5 + byte slices so
    * the DuckDB oracle can reproduce them exactly. */
  private def decodeStub(md: MessageDigest, r: MediaRecord): MediaFeature = {
    val n = r.media.length.toLong
    val hash = md5hex(md, r.media)
    def hv(i: Int) = Character.digit(hash.charAt(i), 16)
    val width  = 16 * hv(0) + hv(1) + 16   // fake "decoded" dimensions
    val height = 16 * hv(2) + hv(3) + 16
    val nFrames = 1 + (n % 5).toInt        // fake stream length
    val seg = (n / nFrames).toInt          // frame-sample stride
    val frames = (0 until nFrames).map { f =>
      md5hex(md, sqlSlice(r.media, 1 + f * seg, seg)).substring(0, 8)
    }.mkString(",")
    MediaFeature(r.doc_id, r.mime, n, width, height,
      math.max(width / 2, 1), math.max(height / 2, 1), nFrames, hash, frames)
  }

  /** Shared decode pass: one decoder per partition over the media corpus
    * (the single implementation q29 and q30 both consume — a real
    * decoder is expensive enough that two copies of this block would
    * inevitably drift). */
  private def decodedFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // no sort (round 6): per-record decode values are row-local and the
    // gate compares canonicalized rows (see RelOps header) — the decode
    // runs straight off the scan.
    val corpus = mediaCorpus(s, d)
    corpus.as[MediaRecord]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5") // per-partition, reused
        it.map(r => decodeStub(md, r))
      }
      .toDF()
  }

  /** q29 — decode/feature-extract/resize/frame-sample over the media
    * corpus via mapPartitions (decoder instantiated once per partition). */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    decodedFeatures(s, d)

  // DuckDB twin of the stub, over the same bytes (text is ASCII so char
  // ops == byte ops; mod/div arithmetic is integer-exact in both).
  val mediaFeaturesSql: String = {
    def hv(i: Int) = s"(strpos('0123456789abcdef', substr(content_hash, $i, 1)) - 1)"
    s"""WITH m AS (SELECT doc_id,
       |  CASE (doc_id % 3)::INT WHEN 0 THEN 'image/png'
       |       WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
       |  text, length(text)::BIGINT AS n_bytes, md5(text) AS content_hash
       |  FROM documents),
       |dims AS (SELECT *,
       |  (16 * ${hv(1)} + ${hv(2)} + 16)::INT AS width,
       |  (16 * ${hv(3)} + ${hv(4)} + 16)::INT AS height,
       |  (1 + (n_bytes % 5))::INT AS n_frames FROM m),
       |seg AS (SELECT *, (n_bytes // n_frames)::INT AS seg FROM dims)
       |SELECT doc_id, mime, n_bytes, width, height,
       |  greatest(width // 2, 1)::INT AS rs_width,
       |  greatest(height // 2, 1)::INT AS rs_height,
       |  n_frames, content_hash,
       |  array_to_string(list_transform(range(0, n_frames),
       |    f -> substr(md5(substr(text, (1 + f * seg)::INT, seg)), 1, 8)), ',') AS frame_hashes
       |FROM seg ORDER BY doc_id""".stripMargin
  }

  /** q30 — the typed mapPartitions output composes relationally: per-mime
    * decode statistics (the only shuffle in the module, 3 groups). */
  def mediaStats(s: SparkSession, d: String): DataFrame = {
    decodedFeatures(s, d)
      .groupBy("mime")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("n_frames").cast("long")).as("sum_frames"),
        min(col("content_hash")).as("min_hash"))
  }

  val mediaStatsSql: String = {
    def hv(i: Int) = s"(strpos('0123456789abcdef', substr(content_hash, $i, 1)) - 1)"
    s"""WITH m AS (SELECT doc_id,
       |  CASE (doc_id % 3)::INT WHEN 0 THEN 'image/png'
       |       WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
       |  length(text)::BIGINT AS n_bytes, md5(text) AS content_hash
       |  FROM documents)
       |SELECT mime, COUNT(*) AS n_media, SUM(n_bytes)::BIGINT AS total_bytes,
       |  SUM((16 * ${hv(1)} + ${hv(2)} + 16)::BIGINT)::BIGINT AS sum_width,
       |  SUM((1 + (n_bytes % 5))::BIGINT)::BIGINT AS sum_frames,
       |  MIN(content_hash) AS min_hash
       |FROM m GROUP BY mime ORDER BY mime""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_media_features" -> ((s, d) => mediaFeatures(s, d)),
    "q30_media_stats"    -> ((s, d) => mediaStats(s, d)),
  )

  def oracle: Map[String, String] = Map(
    "q29_media_features" -> mediaFeaturesSql,
    "q30_media_stats"    -> mediaStatsSql,
  )
}
