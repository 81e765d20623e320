package graft

import org.apache.spark.sql.functions._

/** JS-faithful sequential models of W1/W2 (the reference algorithms,
  * `Consumer/kafkaConsumer.js:76-90,94-115`), used as ground truth for
  * both Spark routes. */
object LineModels {
  private val Url = "^https?://\\S+$".r

  /** hyperlinkHeadings: pair heading + following bare-URL line. */
  def hyperlink(body: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pend: Option[String] = None
    for (l <- body.split("\n", -1)) pend match {
      case Some(p) if Url.matches(l) && p.nonEmpty && p.length < 300 =>
        out += s"<$l|$p>"; pend = None
      case Some(p) => out += p; pend = Some(l)
      case None    => pend = Some(l)
    }
    pend.foreach(out += _)
    out.mkString("\n")
  }

  /** splitIntoBlocks: greedy ≤maxLen fold with the reference's quirks. */
  def chunk(body: String, maxLen: Int): Vector[String] = {
    var blocks = Vector.empty[String]
    var cur = ""
    for (l <- body.split("\n", -1)) {
      if (cur.length + 1 + l.length > maxLen) { blocks :+= cur; cur = l }
      else cur = if (cur.isEmpty) l else cur + "\n" + l
    }
    if (cur.nonEmpty) blocks :+= cur
    blocks
  }
}

/** Deterministic pseudo-random line corpus exercising every branch:
  * empty lines, bare URLs, URL runs, 300+-char headings, long lines. */
object LineCorpus {
  def bodies(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    def line(): String = rnd.nextInt(8) match {
      case 0 => ""
      case 1 | 2 => s"https://ex.am/${rnd.alphanumeric.take(6).mkString}"
      case 3 => "x" * (295 + rnd.nextInt(10)) // straddles the 300 boundary
      case 4 => "A" * (1 + rnd.nextInt(40))   // caps heading-ish
      case _ => rnd.alphanumeric.take(1 + rnd.nextInt(60)).mkString(" ", " ", "")
    }
    (0 until n).map(_ => (0 until rnd.nextInt(14)).map(_ => line()).mkString("\n"))
  }
}

class LineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = LineCorpus.bodies(200, seed = 42)

  test("W1: window route == HOF route == JS model on branch-covering corpus") {
    val df = corpus.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "body")
    val win = LineOps.hyperlinkHeadingsWindowed(df, "doc_id", "body")
      .orderBy("doc_id").collect().map(_.getString(1))
    val hof = df.select(col("doc_id"), LineOps.hyperlinkHeadingsHof("body").as("b"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val model = corpus.map(LineModels.hyperlink)
    assert(win.toSeq == model)
    assert(hof.toSeq == model)
  }

  test("W1: idempotent on URL-free text") {
    val noUrl = corpus.map(_.replaceAll("(?m)^https?://\\S+$", "plain"))
    noUrl.foreach { b => assert(LineModels.hyperlink(b) == b) }
    val df = noUrl.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "body")
    val hof = df.select(col("doc_id"), LineOps.hyperlinkHeadingsHof("body").as("b"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(hof.toSeq == noUrl)
  }

  test("W2: Spark fold == JS model, including quirks") {
    for (maxLen <- Seq(10, 40, 2900)) {
      val df = corpus.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "body")
      val got = df.select(col("doc_id"), LineOps.chunkBlocks("body", maxLen).as("c"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1).toVector)
      assert(got.toSeq == corpus.map(LineModels.chunk(_, maxLen)))
    }
  }

  test("W1/W2: 10k-body randomized differential — Spark routes == JS models") {
    // the r6 stretch goal: the 200-body corpus above proves route
    // equality on every branch; this drives the same differential at
    // 10 000 random bodies in ONE DataFrame pass per route (batching is
    // what makes 10k cases affordable — per-case Spark jobs would not be)
    val big = LineCorpus.bodies(10000, seed = 1337)
    val df = big.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("doc_id", "body")
    val hof = df.select(col("doc_id"), LineOps.hyperlinkHeadingsHof("body").as("b"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(hof.toSeq == big.map(LineModels.hyperlink))
    val win = LineOps.hyperlinkHeadingsWindowed(df, "doc_id", "body")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(win.toSeq == big.map(LineModels.hyperlink))
    for (maxLen <- Seq(17, 120)) {
      val got = df.select(col("doc_id"), LineOps.chunkBlocks("body", maxLen).as("c"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1).toVector)
      assert(got.toSeq == big.map(LineModels.chunk(_, maxLen)))
    }
  }

  test("W2 quirk: oversized first line pushes an empty block (reference-faithful)") {
    assert(LineModels.chunk("x" * 50, 10) == Vector("", "x" * 50))
  }

  test("W2 quirk: empty tail dropped, non-empty tail flushed") {
    assert(LineModels.chunk("ab\ncd", 40) == Vector("ab\ncd"))
    assert(LineModels.chunk("", 40) == Vector.empty)
  }

  test("W3: Block Kit rows = 1 subject section + N chunk sections, ordered") {
    val df = Seq((1L, "Subj", "l1\nl2\nl3")).toDF("id", "subject", "body")
    val rows = LineOps.blockKitRows(df, "id", "subject", "body", maxLen = 5)
      .orderBy("block_no").collect()
    assert(rows.map(_.getString(4)).toSeq ==
      Seq("*Subject:* Subj\n*Body:*", "l1\nl2", "l3"))
    assert(rows.forall(r => r.getString(2) == "section" && r.getString(3) == "mrkdwn"))
  }
}
