package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Slack event-server routing leg (SURVEY.md §2.7/§2.6): the one-line
  * filters and the context-source selection that decide WHICH events reach
  * enrichment and WHAT history context they carry.
  *
  * Reference semantics:
  *  - E4 bot/self-message filter — drop `subtype === 'bot_message' || bot_id`
  *    (`Slack Event Server/slackEventServer.js:116`), the anti-feedback-loop
  *    guard.
  *  - E5 DM-channel filter — keep only `channel_type === 'im'`
  *    (`slackEventServer.js:121`).
  *  - E3 image mimetype filter — `file.mimetype.startsWith('image/')`
  *    (`slackEventServer.js:245`).
  *  - A4 context-source selection — `thread_ts ? threadHistory :
  *    channelHistory` (`slackEventServer.js:227`): a per-event choice
  *    between two aggregation scopes.
  *  - Z4 base64 encode — `Buffer.from(bytes).toString('base64')`
  *    (`slackEventServer.js:174`), here the built-in codegen'd `base64()`
  *    over the opaque media bytes.
  *
  * Scale notes (100 TB): the filters are per-row predicates fused into the
  * scan (no shuffle). The two context aggregates shuffle once each on their
  * keys and collapse to one row per channel/thread — tiny relative to the
  * event stream — so the A4 joins broadcast under AQE and the fact side
  * never shuffles for them.
  */
object Routing {

  /** E4 — bot/self-message filter (`slackEventServer.js:116`). */
  def dropBotMessages(df: DataFrame): DataFrame =
    df.filter(!(coalesce(col("subtype"), lit("")) === "bot_message") &&
              col("bot_id").isNull)

  /** E5 — DM-channel filter (`slackEventServer.js:121`). */
  def onlyDms(df: DataFrame): DataFrame =
    df.filter(col("channel_type") === "im")

  /** E3 — image-mimetype filter (`slackEventServer.js:245`). */
  def onlyImages(df: DataFrame, mimeCol: String = "mime"): DataFrame =
    df.filter(col(mimeCol).startsWith("image/"))

  /** A4 — context-source selection (`slackEventServer.js:227`). */
  def selectContext(threadCtx: Column, channelCtx: Column, threadTs: Column): Column =
    when(threadTs.isNotNull, threadCtx).otherwise(channelCtx)

  /** Last-K history context per key: most recent K by (ts_us, event_id),
    * re-sorted ascending, "user: text" lines joined by newline — the A2/A3
    * aggregate parameterized by grouping key (channel vs thread). */
  private def historyByKey(ev: DataFrame, keys: Seq[String], k: Int,
                           outName: String): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("ts_us").desc, col("event_id").desc)
    ev.withColumn("line", concat(col("user_id").cast("string"), lit(": "), col("props")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(keyCols: _*)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("line")))),
          x => x.getField("line")),
        "\n").as(outName))
  }

  /** Slack-shaped event fields derived deterministically from the events
    * table (same expressions in the DuckDB twin — the oracle verifies the
    * routing operators, not the fixture). */
  private def slackShaped(ev: DataFrame): DataFrame = ev.select(
    col("event_id"), col("user_id"), col("ts_us"), col("props"),
    concat(lit("C"), (col("user_id") % 20).cast("string")).as("channel"),
    when(col("event_id") % 10 === 0, lit("bot_message"))
      .otherwise(lit(null).cast("string")).as("subtype"),
    when(col("event_id") % 11 === 0, lit("B001"))
      .otherwise(lit(null).cast("string")).as("bot_id"),
    when(col("event_id") % 3 === 0, lit("im")).otherwise(lit("channel")).as("channel_type"),
    when(col("event_id") % 2 === 0,
      concat(lit("T"), (col("user_id") % 5).cast("string")))
      .otherwise(lit(null).cast("string")).as("thread_ts"))

  /** q39 — the full message-handler route (`slackEventServer.js:114-151`):
    * E4 drop bots → E5 keep DMs → A4 pick thread-vs-channel context. */
  def eventRouting(s: SparkSession, d: String): DataFrame = {
    val ev = slackShaped(Tables.events(s, d))
    val chanCtx = historyByKey(ev, Seq("channel"), k = 5, "chan_context")
    val thrCtx = historyByKey(ev.filter(col("thread_ts").isNotNull),
      Seq("channel", "thread_ts"), k = 5, "thr_context")
    onlyDms(dropBotMessages(ev))
      .join(chanCtx, Seq("channel"))
      .join(thrCtx, Seq("channel", "thread_ts"), "left")
      .select(col("event_id"), col("channel"),
        coalesce(col("thread_ts"), lit("")).as("thread_key"),
        selectContext(col("thr_context"), col("chan_context"), col("thread_ts"))
          .as("context"))
  }

  val eventRoutingSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, props,
      |    'C' || (user_id % 20)::VARCHAR AS channel,
      |    CASE WHEN event_id % 10 = 0 THEN 'bot_message' END AS subtype,
      |    CASE WHEN event_id % 11 = 0 THEN 'B001' END AS bot_id,
      |    CASE WHEN event_id % 3 = 0 THEN 'im' ELSE 'channel' END AS channel_type,
      |    CASE WHEN event_id % 2 = 0 THEN 'T' || (user_id % 5)::VARCHAR END AS thread_ts,
      |    user_id::VARCHAR || ': ' || props AS line
      |  FROM events),
      |chan AS (
      |  SELECT channel, string_agg(line, chr(10) ORDER BY ts_us, event_id) AS chan_context
      |  FROM (SELECT *, row_number() OVER (PARTITION BY channel
      |          ORDER BY ts_us DESC, event_id DESC) AS rn FROM ev) t
      |  WHERE rn <= 5 GROUP BY channel),
      |thr AS (
      |  SELECT channel, thread_ts,
      |    string_agg(line, chr(10) ORDER BY ts_us, event_id) AS thr_context
      |  FROM (SELECT *, row_number() OVER (PARTITION BY channel, thread_ts
      |          ORDER BY ts_us DESC, event_id DESC) AS rn
      |        FROM ev WHERE thread_ts IS NOT NULL) t
      |  WHERE rn <= 5 GROUP BY channel, thread_ts)
      |SELECT e.event_id, e.channel, coalesce(e.thread_ts, '') AS thread_key,
      |  CASE WHEN e.thread_ts IS NOT NULL THEN thr.thr_context
      |       ELSE chan.chan_context END AS context
      |FROM ev e
      |JOIN chan ON e.channel = chan.channel
      |LEFT JOIN thr ON e.channel = thr.channel AND e.thread_ts = thr.thread_ts
      |WHERE coalesce(e.subtype, '') <> 'bot_message' AND e.bot_id IS NULL
      |  AND e.channel_type = 'im'
      |ORDER BY e.event_id""".stripMargin

  /** q40 — Z4 + E3 over the media corpus: keep image payloads, emit the
    * base64 wire form the reference sends to the LLM
    * (`slackEventServer.js:174,245`). Bytes stay opaque binary until this
    * final projection — base64's 4/3 inflation is paid only at the sink
    * edge, never carried through shuffles. */
  def mediaBase64(s: SparkSession, d: String): DataFrame =
    onlyImages(MediaOps.mediaCorpus(s, d))
      .select(col("doc_id"), col("mime"),
        // Spark's base64() MIME-chunks with \r\n every 76 chars; the
        // reference's Buffer.toString('base64') is unchunked — strip.
        regexp_replace(base64(col("media")), "[\r\n]", "").as("b64"),
        length(col("media")).cast("long").as("n_bytes"))

  val mediaBase64Sql: String =
    """SELECT doc_id,
      |  CASE (doc_id % 3)::INT WHEN 0 THEN 'image/png'
      |       WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
      |  to_base64(text::BLOB) AS b64,
      |  octet_length(text::BLOB)::BIGINT AS n_bytes
      |FROM documents WHERE (doc_id % 3)::INT = 0
      |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_event_routing" -> ((s, d) => eventRouting(s, d)),
    "q40_media_base64"  -> ((s, d) => mediaBase64(s, d)),
  )

  def oracle: Map[String, String] = Map(
    "q39_event_routing" -> eventRoutingSql,
    "q40_media_base64"  -> mediaBase64Sql,
  )
}
