package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One enrichment request: the assembled context (A2-A4 output) plus the
  * user message (E1 input shape, `slackEventServer.js:224-231`). */
case class PromptRequest(id: Long, context: String, message: String)
/** One enrichment reply. */
case class PromptReply(id: Long, reply: String)

/** Offline-deterministic analogue of the reference's per-record LLM
  * enrichment (E1, `Slack Event Server/slackEventServer.js:224-276`): the
  * non-deterministic network call becomes a deterministic summarize/
  * keyword-extract operator so the oracle can verify it, while the
  * surrounding dataflow — context assembly, per-record enrichment column,
  * routing — is the same shape the online path uses.
  *
  * The online variant (real LLM behind `mapPartitions` with per-partition
  * HTTP connection reuse, `.asNondeterministic()`, never a Catalyst
  * expression) is deliberately NOT in the oracle map; its plumbing is the
  * MediaOps mapPartitions pattern with a client instead of a digest.
  *
  * Scale: explode → count → top-k per doc is two shuffles on doc_id/token;
  * the first-sentence extraction and prompt assembly are per-row
  * expression work fused into the scan.
  */
object Enrich {

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  private def stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  /** q31 — keyword summary per document: top-5 non-stopword tokens by
    * (frequency desc, token asc), the leading sentence, and a token count —
    * the deterministic "summarize this document" enrichment. */
  def keywordSummary(s: SparkSession, d: String): DataFrame = {
    // tokenize-explode + lead-sentence split are per-row-heavy on both
    // consumer branches — fan the single-file scan out (no-op at scale)
    val docs = Tables.fanOut(Tables.documents(s, d), "doc_id")
    val toks = docs
      .selectExpr("doc_id", "explode(split(text, ' ')) as tok")
      .filter(!col("tok").isin(Stopwords: _*) && col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val top = toks
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("cnt").desc, col("tok"))))
      .filter(col("rk") <= 5)
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("rk"), col("tok")))),
        x => x.getField("tok")), ",").as("keywords"))
    docs.selectExpr("doc_id",
        "element_at(split(text, '\\\\.'), 1) as lead_sentence",
        "cast(size(filter(split(text, ' '), t -> t != '')) as bigint) as n_tokens")
      .join(top, Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(keywords, '') as keywords",
                  "lead_sentence", "n_tokens")
  }

  val keywordSummarySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |cnts AS (
       |  SELECT doc_id, tok, COUNT(*) AS cnt FROM toks
       |  WHERE tok NOT IN ($stopList) AND tok <> ''
       |  GROUP BY doc_id, tok),
       |rk AS (
       |  SELECT doc_id, tok, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rk FROM cnts),
       |top AS (
       |  SELECT doc_id, string_agg(tok, ',' ORDER BY rk) AS keywords
       |  FROM rk WHERE rk <= 5 GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(top.keywords, '') AS keywords,
       |  string_split(d.text, '.')[1] AS lead_sentence,
       |  len(list_filter(string_split(d.text, ' '), t -> t <> ''))::BIGINT AS n_tokens
       |FROM documents d LEFT JOIN top ON d.doc_id = top.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Prompt assembly mirroring the reference's persona + context + user
    * message + markup instruction (`slackEventServer.js:233-239`). Pure
    * string work — runs on the executors inside [[enrichOnline]]. */
  def buildPrompt(context: String, message: String): String =
    s"""You are a helpful assistant in a Slack workspace.
       |Recent conversation context:
       |$context
       |
       |User message: $message
       |Format your reply with Slack markup.""".stripMargin

  /** E1 — the ONLINE enrichment plumbing (`slackEventServer.js:224-276`):
    * per-record completion calls via mapPartitions with ONE client per
    * partition, the same amortization rule as the MediaOps decoders.
    * `mkClient` is a serializable factory producing the blocking
    * prompt→reply call; tests inject a mock, production injects an HTTP
    * client (connection reuse across the partition's rows is exactly what
    * the factory boundary provides). Non-deterministic by nature (network
    * I/O), so it is NOT in the oracle map and must never be re-expressed
    * as a Catalyst expression — mapPartitions guarantees once-per-row
    * evaluation within the batch instead of optimizer-driven re-execution.
    *
    * Scale notes (100 TB): pure map-side work, no shuffle; parallelism ==
    * partitions; a rate-limited backend bounds it by repartitioning to
    * the allowed concurrency, not by throttling inside the call. */
  def enrichOnline(reqs: Dataset[PromptRequest],
                   mkClient: () => String => String): Dataset[PromptReply] = {
    import reqs.sparkSession.implicits._
    reqs.mapPartitions { it =>
      val complete = mkClient() // per-partition, reused across rows
      it.map(r => PromptReply(r.id, complete(buildPrompt(r.context, r.message))))
    }
  }

  /** [[enrichOnline]] with the backpressure contract ENCODED instead of
    * narrated: a rate-limited backend is bounded by running at most
    * `maxConcurrency` concurrent clients, which in the mapPartitions
    * model means at most that many partitions. `coalesce` (narrow, no
    * shuffle) folds excess partitions together; a dataset already at or
    * below the bound is untouched, so in-flight client count is always
    * min(input partitions, maxConcurrency). Throttling lives HERE, at
    * the parallelism level — never as sleeps inside the call, which
    * would hold executor slots hostage. */
  def enrichOnline(reqs: Dataset[PromptRequest], mkClient: () => String => String,
                   maxConcurrency: Int): Dataset[PromptReply] = {
    require(maxConcurrency > 0, s"maxConcurrency must be positive: $maxConcurrency")
    val bounded =
      if (reqs.rdd.getNumPartitions > maxConcurrency) reqs.coalesce(maxConcurrency)
      else reqs
    enrichOnline(bounded, mkClient)
  }

  /** E1 ERROR SEMANTICS (r18, VERDICT r17 #7): [[enrichOnline]] crosses a
    * real socket but had no failure model — one broken connection killed
    * the task and, after Spark's task retries, the batch. The reference
    * substitutes an error VALUE per record rather than dropping it or
    * failing the batch (`Producer/kafkaProducer.js:197-201` — the T18
    * "[Body decode error]" discipline; `slackEventServer.js:272-275`
    * rethrows only at the transport edge): each record gets up to
    * `maxRetries` fresh-connection retries, then the `sentinel` reply,
    * and the batch COMPLETES. The errored count is surfaced through a
    * LongAccumulator (Spark's native observability channel — readable on
    * the driver after any action, visible in the UI), never by failing
    * the job. A dead client is dropped and re-minted lazily, so one
    * poisoned record costs its retries but the partition's surviving
    * records keep the connection-per-partition amortization.
    *
    * A `null` RETURN from the client counts as a failed attempt exactly
    * like a thrown exception (the client is dropped and re-minted) —
    * otherwise a backend that signals failure by returning null instead
    * of throwing would spin the retry loop forever and pin the executor
    * slot.
    *
    * Accumulator contract: Spark accumulators inside transformations are
    * AT-LEAST-ONCE — task retries, speculative duplicates, and a second
    * action on the returned Dataset each re-add. Read `errored` as an
    * operational signal after exactly ONE action; for an exact count,
    * derive it from the data (`filter($"reply" === sentinel).count()`),
    * which is what the failure-injection spec pins. */
  def enrichOnlineSafe(reqs: Dataset[PromptRequest],
                       mkClient: () => String => String,
                       maxConcurrency: Int,
                       maxRetries: Int = 2,
                       sentinel: String = "[enrichment unavailable]")
      : (Dataset[PromptReply], org.apache.spark.util.LongAccumulator) = {
    require(maxConcurrency > 0, s"maxConcurrency must be positive: $maxConcurrency")
    require(maxRetries >= 0, s"maxRetries must be non-negative: $maxRetries")
    import reqs.sparkSession.implicits._
    val errored = reqs.sparkSession.sparkContext
      .longAccumulator("graft.enrich.errored")
    val bounded =
      if (reqs.rdd.getNumPartitions > maxConcurrency) reqs.coalesce(maxConcurrency)
      else reqs
    val out = bounded.mapPartitions { it =>
      var client: String => String = null
      it.map { r =>
        val prompt = buildPrompt(r.context, r.message)
        var reply: String = null
        var attempt = 0
        while (reply == null && attempt <= maxRetries) {
          try {
            if (client == null) client = mkClient()
            reply = client(prompt)
            if (reply == null) { // null return == failure: same discipline as a throw
              client = null
              attempt += 1
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              client = null // broken connection: re-mint on the next try
              attempt += 1
          }
        }
        if (reply == null) { errored.add(1L); PromptReply(r.id, sentinel) }
        else PromptReply(r.id, reply)
      }
    }
    (out, errored)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_keyword_summary" -> ((s, d) => keywordSummary(s, d)),
  )

  def oracle: Map[String, String] = Map(
    "q31_keyword_summary" -> keywordSummarySql,
  )
}
