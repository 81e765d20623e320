package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-verified queries exercising the text/line/serde operators over
  * the `documents` table. The testdata text is plain word-salad, so each
  * query first constructs a deterministic "newsletter-shaped" input with
  * the SAME expression in Spark and in the DuckDB oracle, then applies the
  * operator chain — the oracle verifies the operator, not the fixture.
  */
object TextQueries {
  private val id = col("doc_id")
  private val idStr = col("doc_id").cast("string")

  /** Newsletter body exercising T4–T17 (see TextOracle.newsletterBodySql). */
  private def newsletterBody: Column = concat(
    lit("Intro chatter that should disappear\n"),
    lit("Together With SponsorCo\n"),
    lit("TLDR Tech "), col("lang"), lit("\n"),
    upper(substring(col("text"), 1, 18)), lit("\n"),
    lit("["), substring(col("text"), 19, 30), lit("]\n"),
    lit("by John Smith Reporter\n"),
    lit("Content-Type: text/plain; charset=utf-8\r\n"),
    lit("Content-Transfer-Encoding: quoted-printable\n"),
    lit("--=_boundary_42\n"),
    lit("See https://img.example.com/pic"), idStr, lit(".png for details\n"),
    lit("café <b>bold</b> news\r"),
    substring(col("text"), 1, 120), lit("\n"),
    when(id % 3 === 0, lit("How did we do today? rate us\nmore stuff"))
      .otherwise(lit("Love TLDR? Tell your friends and get rewards!\ntrailing junk")))

  private val newsletterBodySql: String =
    """'Intro chatter that should disappear' || chr(10) ||
      |'Together With SponsorCo' || chr(10) ||
      |'TLDR Tech ' || lang || chr(10) ||
      |upper(substr(text, 1, 18)) || chr(10) ||
      |'[' || substr(text, 19, 30) || ']' || chr(10) ||
      |'by John Smith Reporter' || chr(10) ||
      |'Content-Type: text/plain; charset=utf-8' || chr(13) || chr(10) ||
      |'Content-Transfer-Encoding: quoted-printable' || chr(10) ||
      |'--=_boundary_42' || chr(10) ||
      |'See https://img.example.com/pic' || doc_id::VARCHAR || '.png for details' || chr(10) ||
      |'caf' || chr(233) || ' <b>bold</b> news' || chr(13) ||
      |substr(text, 1, 120) || chr(10) ||
      |CASE WHEN doc_id % 3 = 0 THEN 'How did we do today? rate us' || chr(10) || 'more stuff'
      |     ELSE 'Love TLDR? Tell your friends and get rewards!' || chr(10) || 'trailing junk' END"""
      .stripMargin.replace("\n", " ")

  /** Body with heading/URL line structure exercising every W1 branch:
    * merge, paragraph-merge, ≥300-char non-heading, empty heading, and a
    * URL line acting as heading for the next URL. */
  private def linkedBody: Column = concat_ws("\n",
    substring(col("text"), 1, 24),
    concat(lit("https://news.example.com/a/"), idStr),
    substring(col("text"), 25, 80),
    concat(lit("https://news.example.com/b/"), idStr),
    repeat(substring(col("text"), 1, 40), 9),
    concat(lit("https://news.example.com/c/"), idStr),
    lit(""),
    concat(lit("https://news.example.com/d/"), idStr),
    concat(lit("https://news.example.com/e/"), idStr))

  private val linkedBodySql: String =
    """concat_ws(chr(10),
      |substr(text, 1, 24),
      |'https://news.example.com/a/' || doc_id::VARCHAR,
      |substr(text, 25, 80),
      |'https://news.example.com/b/' || doc_id::VARCHAR,
      |repeat(substr(text, 1, 40), 9),
      |'https://news.example.com/c/' || doc_id::VARCHAR,
      |'',
      |'https://news.example.com/d/' || doc_id::VARCHAR,
      |'https://news.example.com/e/' || doc_id::VARCHAR)""".stripMargin.replace("\n", " ")

  /** Word-salad text broken into ~40-char lines (same regex both sides). */
  private def lineifiedBody: Column =
    regexp_replace(col("text"), "(.{40}) ", "$1\n")
  private val lineifiedBodySql: String =
    """regexp_replace(text, '(.{40}) ', '\1' || chr(10), 'g')"""

  // ---------------------------------------------------------------- queries

  /** NO sort at all (round 6; previously these queries pre-sorted the
    * cheap fixture to dodge the trailing-orderBy sampling double-exec —
    * measured q09 1.33s → 0.70s). The correctness gate canonicalizes
    * rows before comparing (row-order-insensitive; see RelOps header),
    * and every value in these queries is row-local, so even the
    * pre-sort's range exchange is pure overhead: the chains run with no
    * ordering exchange at all. (q09 additionally carries the gated
    * Tables.fanOut hash exchange — PlanBudgetSpec pins shuffles=1 —
    * because its 11-pass regex chain on a one-task test scan was
    * single-core; the gate is a no-op at production file counts.) */
  def cleanText(s: SparkSession, d: String): DataFrame =
    // 11 regex passes/row dominate — fan the single-file scan out
    // across cores before the chain (plan-time no-op at scale)
    Tables.fanOut(Tables.documents(s, d), "doc_id")
      .select(id, newsletterBody.as("b"))
      .select(id, TextOps.cleanBodyPlain(col("b")).as("cleaned"))

  def subjectStyle(s: SparkSession, d: String): DataFrame = {
    val subj = when(id % 5 === 0, lit(null).cast("string"))
      .when(id % 5 === 1, lit(""))
      .otherwise(concat(lit("Doc "), idStr))
    Tables.documents(s, d)
      .select(id, subj.as("s"))
      .select(id, TextOps.subjectStyle(col("s")).as("subject_styled"))
  }

  def hyperlinkWindowed(s: SparkSession, d: String): DataFrame =
    LineOps.hyperlinkHeadingsWindowed(
      Tables.documents(s, d).select(id, linkedBody.as("b")), "doc_id", "b")

  def hyperlinkHof(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(id, linkedBody.as("b"))
      .select(id, LineOps.hyperlinkHeadingsHof("b").as("body_linked"))

  // q13/q14: block_no is the per-row array ordinal from posexplode —
  // row-local, so no input ordering is needed (see cleanText note)
  def chunkBlocks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(id, lineifiedBody.as("b"))
      .select(id, posexplode(LineOps.chunkBlocks("b", 120)).as(Seq("block_no", "block")))
      .select(id, col("block_no").cast("long").as("block_no"), col("block"))

  def blockKit(s: SparkSession, d: String): DataFrame =
    LineOps.blockKitRows(
      Tables.documents(s, d).select(
        id,
        concat(lit("*Doc "), idStr, lit("*")).as("subj"),
        lineifiedBody.as("b")),
      "doc_id", "subj", "b", 120)

  def qpRoundtrip(s: SparkSession, d: String): DataFrame = {
    val qp = concat(
      regexp_replace(regexp_replace(col("text"), "a", "=61"), "e", "=65"),
      lit("=3D=20caf=C3=A9"), lit("=\n"), lit("end"))
    // per-row regex×2 + UDF chain with no natural exchange: spread the
    // single-file test scan (Tables.fanOut; no-op at scale). r6's
    // presentation-sort removal dropped the incidental range exchange
    // that had been providing this parallelism (0.267→1.374 s).
    Tables.fanOut(Tables.documents(s, d), "doc_id")
      .select(id, qp.as("q"))
      .select(id, Serde.quotedPrintableDecode(col("q")).as("decoded"))
  }

  def avroRoundtrip(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(id, substring(col("text"), 1, 50).as("t"))
      .select(Serde.fromAvroEmail(
        Serde.toAvroEmail(id.cast("int"), concat(lit("Doc "), idStr),
          col("t"))).as("r"))
      .select(col("r.seqno").as("seqno"), col("r.subject").as("subject"),
              col("r.body").as("body"))

  def mentionStrip(s: SparkSession, d: String): DataFrame = {
    val raw = when(id % 7 === 0, lit("<@U0AAA111>  <@U0BBB222> "))
      .otherwise(concat(lit("<@U0AAA111> hello "), substring(col("text"), 1, 30),
                        lit(" <@U0BBB222>")))
    val stripped = TextOps.stripMentions(col("raw"))
    Tables.documents(s, d)
      .select(id, raw.as("raw"))
      .select(id,
        when(stripped === "",
          lit("Hi! I was mentioned but didn't see a question. How can I help you?"))
          .otherwise(stripped).as("msg_reply"))
  }

  // ----------------------------------------------------------------- oracle

  def oracle: Map[String, String] = Map(
    "q09_clean_text" ->
      TextOracle.cleanBodySql(newsletterBodySql,
        "SELECT doc_id, b AS cleaned FROM"),
    "q10_subject_style" ->
      """WITH s AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       WHEN doc_id % 5 = 1 THEN ''
        |       ELSE 'Doc ' || doc_id::VARCHAR END AS subj FROM documents)
        |SELECT doc_id, CASE WHEN subj IS NULL OR subj = '' THEN '*No Subject*'
        |  ELSE '*' || subj || '*' END AS subject_styled
        |FROM s ORDER BY doc_id""".stripMargin,
    "q11_hyperlink_headings" -> hyperlinkOracle,
    "q12_hyperlink_headings_hof" -> hyperlinkOracle,
    "q13_chunk_blocks" ->
      LineOracle.chunkSql(
        s"src AS (SELECT doc_id, $lineifiedBodySql AS b FROM documents)", 120,
        "SELECT doc_id, block_no, block FROM rows_ ORDER BY doc_id, block_no"),
    "q14_block_kit" ->
      LineOracle.chunkSql(
        s"src AS (SELECT doc_id, $lineifiedBodySql AS b FROM documents)", 120,
        """SELECT * FROM (
          |  SELECT doc_id, 0::BIGINT AS block_no, 'section' AS btype,
          |    'mrkdwn' AS ttype,
          |    '*Subject:* *Doc ' || doc_id::VARCHAR || '*' || chr(10) || '*Body:*' AS btext
          |  FROM documents
          |  UNION ALL
          |  SELECT doc_id, block_no + 1, 'section', 'mrkdwn', block FROM rows_
          |) ORDER BY doc_id, block_no""".stripMargin),
    "q15_qp_roundtrip" ->
      """SELECT doc_id, text || '= caf' || chr(233) || 'end' AS decoded
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q16_avro_roundtrip" ->
      """SELECT doc_id::INTEGER AS seqno, 'Doc ' || doc_id::VARCHAR AS subject,
        |  substr(text, 1, 50) AS body FROM documents ORDER BY seqno""".stripMargin,
    "q17_mention_strip" ->
      """WITH raw AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN '<@U0AAA111>  <@U0BBB222> '
        |       ELSE '<@U0AAA111> hello ' || substr(text, 1, 30) || ' <@U0BBB222>' END AS r
        |  FROM documents),
        |st AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(r, '<@[A-Z0-9]+>', '', 'g'),
        |                 '\A\s+|\s+\z', '', 'g') AS s FROM raw)
        |SELECT doc_id, CASE WHEN s = ''
        |  THEN 'Hi! I was mentioned but didn''t see a question. How can I help you?'
        |  ELSE s END AS msg_reply
        |FROM st ORDER BY doc_id""".stripMargin,
  )

  private def hyperlinkOracle: String =
    LineOracle.hyperlinkSql(
      s"src AS (SELECT doc_id, $linkedBodySql AS b FROM documents)",
      "SELECT doc_id, body_linked FROM agg ORDER BY doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q09_clean_text"             -> ((s, d) => cleanText(s, d)),
    "q10_subject_style"          -> ((s, d) => subjectStyle(s, d)),
    "q11_hyperlink_headings"     -> ((s, d) => hyperlinkWindowed(s, d)),
    "q12_hyperlink_headings_hof" -> ((s, d) => hyperlinkHof(s, d)),
    "q13_chunk_blocks"           -> ((s, d) => chunkBlocks(s, d)),
    "q14_block_kit"              -> ((s, d) => blockKit(s, d)),
    "q15_qp_roundtrip"           -> ((s, d) => qpRoundtrip(s, d)),
    "q16_avro_roundtrip"         -> ((s, d) => avroRoundtrip(s, d)),
    "q17_mention_strip"          -> ((s, d) => mentionStrip(s, d)),
  )
}
