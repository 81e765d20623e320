package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-row / structural operators: a record's body treated as a line
  * table (SURVEY.md §2.5).
  *
  *  - W1 hyperlinkHeadings (`Consumer/kafkaConsumer.js:94-115`): pair each
  *    line with its successor; when the successor is a bare URL and the
  *    line is a non-empty "heading" (<300 chars), merge to `<url|heading>`
  *    and consume the URL line. Consumption is sequential (a consumed URL
  *    can't be a heading), which closed-forms to run parity.
  *  - W2 splitIntoBlocks (`kafkaConsumer.js:76-90`): greedy fold of lines
  *    into ≤maxLen blocks. Faithful quirks: an oversized first line pushes
  *    an empty block; a non-empty tail is flushed, an empty tail dropped.
  *  - W3 Block Kit assembly (`kafkaConsumer.js:123-140`).
  *
  * Two W1 implementations with identical semantics:
  *  - window route: explode → Window(lag/lead) → re-agg. Demonstrates real
  *    window functions; shuffles once on doc_id (no skew — docs bounded).
  *  - HOF route: one aggregate() fold per row. ZERO shuffle — at 100 TB
  *    this is the production path (per-record work, embarrassingly
  *    parallel); the window route is the oracle-checked relational demo.
  */
object LineOps {

  private val URL_LINE = """^https?://\S+$"""

  /** W1, window-function route. Input df needs (idCol, bodyCol); returns
    * (id, body_linked). */
  def hyperlinkHeadingsWindowed(df: DataFrame, idCol: String, bodyCol: String): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val lines = df.select(col(idCol), posexplode(split(col(bodyCol), "\n", -1)).as(Seq("pos", "line")))
    val flagged = lines
      .withColumn("is_url", col("line").rlike(URL_LINE))
      .withColumn("prev_line", lag(col("line"), 1).over(byDoc))
      // m: this line is a URL whose predecessor is a non-empty heading (<300)
      .withColumn("m",
        col("is_url") &&
        coalesce(col("prev_line") =!= "" && length(col("prev_line")) < 300, lit(false)))
      // islands of consecutive m-lines; the island opener (rn=1) is the
      // non-m line, so within an island consumed alternates from rn=2:
      // consumed(j) = m(j) && !consumed(j-1)  ⇒  consumed ⟺ rn even
      .withColumn("grp", sum(when(col("m"), 0).otherwise(1)).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val byRun = Window.partitionBy(col(idCol), col("grp")).orderBy(col("pos"))
    val consumed = flagged
      .withColumn("rn", row_number().over(byRun))
      .withColumn("consumed", col("m") && col("rn") % 2 === 0)
      .withColumn("next_consumed", coalesce(lead(col("consumed"), 1).over(byDoc), lit(false)))
      .withColumn("next_line", lead(col("line"), 1).over(byDoc))
    consumed
      .filter(!col("consumed"))
      .withColumn("out",
        when(col("next_consumed"), concat(lit("<"), col("next_line"), lit("|"), col("line"), lit(">")))
          .otherwise(col("line")))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("out")))), x => x.getField("out")),
        "\n").as("body_linked"))
  }

  /** W1, higher-order-function route: the same sequential fold the JS
    * runs, as one aggregate() over the line array — per-row, no shuffle,
    * fully parallel across records. `bodyCol` is a column name (or SQL
    * fragment) resolvable in the input plan. */
  def hyperlinkHeadingsHof(bodyCol: String): Column = {
    // NB on escaping: s-interpolated Scala strings process \\ -> \ and the
    // result is parsed by Spark's SQL parser which ALSO unescapes literals,
    // so '\\n' here reaches the SQL text as \n (a newline) and '\\\\S'
    // reaches the regex engine as \S.
    val fold =
      s"""aggregate(
         |  split($$BODY$$, '\\n', -1),
         |  named_struct('out', cast(array() as array<string>), 'pend', '', 'has', false),
         |  (acc, l) -> CASE
         |    WHEN acc.has AND l rlike '^https?://\\\\S+$$' AND acc.pend != '' AND length(acc.pend) < 300
         |      THEN named_struct('out', array_append(acc.out, concat('<', l, '|', acc.pend, '>')),
         |                        'pend', '', 'has', false)
         |    WHEN acc.has
         |      THEN named_struct('out', array_append(acc.out, acc.pend), 'pend', l, 'has', true)
         |    ELSE named_struct('out', acc.out, 'pend', l, 'has', true) END,
         |  acc -> array_join(CASE WHEN acc.has THEN array_append(acc.out, acc.pend)
         |                         ELSE acc.out END, '\\n'))""".stripMargin
    expr(fold.replace("$BODY$", bodyCol))
  }

  /** W2 — greedy stateful chunking as an aggregate() fold (pure SQL, no
    * UDTF, no shuffle). Returns array<string> of blocks. */
  def chunkBlocks(bodyCol: String, maxLen: Int): Column = {
    val fold =
      s"""aggregate(
         |  split($$BODY$$, '\\n', -1),
         |  named_struct('blocks', cast(array() as array<string>), 'cur', ''),
         |  (acc, l) -> CASE
         |    WHEN length(acc.cur) + 1 + length(l) > $maxLen
         |      THEN named_struct('blocks', array_append(acc.blocks, acc.cur), 'cur', l)
         |    ELSE named_struct('blocks', acc.blocks,
         |                      'cur', CASE WHEN acc.cur = '' THEN l
         |                                  ELSE concat(acc.cur, '\\n', l) END) END,
         |  acc -> CASE WHEN acc.cur != '' THEN array_append(acc.blocks, acc.cur)
         |              ELSE acc.blocks END)""".stripMargin
    expr(fold.replace("$BODY$", bodyCol))
  }

  /** W3 — Block Kit assembly, exploded to relational rows (one per
    * section) rather than opaque JSON so the oracle can hash-match:
    * block 0 is the subject section `*Subject:* <subject>\n*Body:*`,
    * blocks 1..N the body chunks (`kafkaConsumer.js:123-140`). */
  def blockKitRows(df: DataFrame, idCol: String, subjectCol: String, bodyCol: String,
                   maxLen: Int): DataFrame = {
    val chunked = df.select(
      col(idCol),
      concat(lit("*Subject:* "), col(subjectCol), lit("\n*Body:*")).as("subject_text"),
      chunkBlocks(bodyCol, maxLen).as("chunks"))
    chunked.select(
      col(idCol),
      posexplode(concat(array(col("subject_text")), col("chunks"))).as(Seq("block_no", "btext")))
      .select(col(idCol), col("block_no").cast("long").as("block_no"),
              lit("section").as("btype"), lit("mrkdwn").as("ttype"), col("btext"))
  }
}

/** DuckDB twins for LineOps (see TextOracle for conventions). */
object LineOracle {
  /** W1 window route as DuckDB SQL. `srcCte` must yield (doc_id, b). */
  def hyperlinkSql(srcCte: String, finalSelect: String): String =
    s"""WITH $srcCte,
       |ls AS (SELECT doc_id, string_split(b, chr(10)) AS l FROM src),
       |lines AS (SELECT doc_id, i::BIGINT AS pos, l[i] AS line
       |          FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM ls)),
       |flag AS (SELECT doc_id, pos, line,
       |    regexp_matches(line, '^https?://\\S+$$') AS is_url,
       |    lag(line) OVER w AS prev_line
       |  FROM lines WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |m AS (SELECT *, (is_url AND coalesce(prev_line <> '' AND length(prev_line) < 300, false)) AS mm
       |  FROM flag),
       |grps AS (SELECT *, sum(CASE WHEN mm THEN 0 ELSE 1 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM m),
       |runs AS (SELECT *, row_number() OVER (PARTITION BY doc_id, grp ORDER BY pos) AS rn FROM grps),
       |cons AS (SELECT *, (mm AND rn % 2 = 0) AS consumed FROM runs),
       |nxt AS (SELECT *, coalesce(lead(consumed) OVER w2, false) AS next_consumed,
       |    lead(line) OVER w2 AS next_line
       |  FROM cons WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)),
       |outl AS (SELECT doc_id, pos,
       |    CASE WHEN next_consumed THEN '<' || next_line || '|' || line || '>' ELSE line END AS o
       |  FROM nxt WHERE NOT consumed),
       |agg AS (SELECT doc_id, string_agg(o, chr(10) ORDER BY pos) AS body_linked
       |        FROM outl GROUP BY doc_id)
       |$finalSelect""".stripMargin

  /** W2 greedy chunker as a DuckDB recursive CTE (the fold is inherently
    * sequential per record). `srcCte` must yield (doc_id, b). Emits
    * (doc_id, block_no, block). */
  def chunkSql(srcCte: String, maxLen: Int, finalSelect: String): String =
    s"""WITH RECURSIVE $srcCte,
       |ls AS (SELECT doc_id, string_split(b, chr(10)) AS l FROM src),
       |st AS (
       |  SELECT doc_id, l, 1 AS i, '' AS cur, []::VARCHAR[] AS blocks FROM ls
       |  UNION ALL
       |  SELECT doc_id, l, i + 1,
       |    CASE WHEN length(cur) + 1 + length(l[i]) > $maxLen THEN l[i]
       |         WHEN cur = '' THEN l[i]
       |         ELSE cur || chr(10) || l[i] END,
       |    CASE WHEN length(cur) + 1 + length(l[i]) > $maxLen
       |         THEN list_append(blocks, cur) ELSE blocks END
       |  FROM st WHERE i <= len(l)),
       |fin AS (SELECT doc_id,
       |    CASE WHEN cur <> '' THEN list_append(blocks, cur) ELSE blocks END AS blocks
       |  FROM st WHERE i = len(l) + 1),
       |ex AS (SELECT doc_id, blocks, unnest(generate_series(1, len(blocks))) AS bi FROM fin),
       |rows_ AS (SELECT doc_id, (bi - 1)::BIGINT AS block_no, blocks[bi] AS block FROM ex)
       |$finalSelect""".stripMargin
}
