package graft

import org.scalacheck.{Gen, Prop, Properties}

/** The T12+T13 fusion theorem (TextOps.stripMimeAndMarkup): one
  * alternation pass `<[^>]+>|[^\x20-\x7E\n]` equals the sequential
  * strip-tags-then-strip-non-ASCII passes for EVERY string. Pinned here
  * over adversarial generators (tag soup, unclosed brackets, non-ASCII
  * inside and around tags) on the same java.util.regex engine Spark's
  * regexp_replace compiles to. */
object TextFusionProps extends Properties("TextFusion") {

  private def sequential(s: String): String =
    s.replaceAll("<[^>]+>", "").replaceAll("[^\\x20-\\x7E\n]", "")

  private def fused(s: String): String =
    s.replaceAll("<[^>]+>|[^\\x20-\\x7E\n]", "")

  // tag-soup alphabet: heavy on brackets, newlines, controls, non-ASCII
  private val genChar: Gen[Char] = Gen.frequency(
    4 -> Gen.oneOf('<', '>'),
    4 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\n', '\r', '\t'),
    2 -> Gen.oneOf('é', 'ß', '文', '\uD83C', '\u0001', '\u00A0'),
    1 -> Gen.oneOf('/', '=', '"', '&', ';'))
  private val genSoup: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.stringOfN(n, genChar))

  property("fused pass == sequential T12∘T13 on adversarial tag soup") =
    Prop.forAll(genSoup) { s => fused(s) == sequential(s) }

  property("fused pass == sequential T12∘T13 on structured HTML-ish text") =
    Prop.forAll(Gen.listOfN(8, Gen.oneOf(
      "<b>", "</b>", "<", ">", "café", "<a href=\"x\">", "text",
      "<<x>y>", "\r\n", "<é>", "plain <i>words</i>", " "))) { parts =>
      val s = parts.mkString
      fused(s) == sequential(s)
    }

  // ---- T14: bold-ALL-CAPS two passes fused into one alternation ----

  private def t14Sequential(s: String): String =
    s.replaceAll("(?m)^ *([A-Z0-9&](?:[A-Z0-9 &]*[A-Z0-9&])?) *$", "*$1*")
      .replaceAll("(?m)^ +$", "**")

  private def t14Fused(s: String): String =
    s.replaceAll("(?m)^ *([A-Z0-9&](?:[A-Z0-9 &]*[A-Z0-9&])?) *$|^ +$", "*$1*")

  private val genCapsLine: Gen[String] = Gen.frequency(
    4 -> Gen.chooseNum(0, 12).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(
        3 -> Gen.oneOf('A', 'Z', '0', '9', '&', ' '),
        1 -> Gen.oneOf('a', '*', '[', ']')))),
    2 -> Gen.chooseNum(0, 6).flatMap(n => Gen.stringOfN(n, Gen.const(' '))),
    1 -> Gen.const("HEADLINE NEWS & MORE"))
  private val genCapsText: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, genCapsLine)).map(_.mkString("\n"))

  property("T14 fused alternation == sequential two passes") =
    Prop.forAll(genCapsText) { s => t14Fused(s) == t14Sequential(s) }

  // ---- T15+T16: bracket strip + image-URL strip fused ----

  private def t1516Sequential(s: String): String =
    s.replaceAll("(?m)^\\[|\\]$", "")
      .replaceAll("(?i)https?://\\S+\\.(png|jpg|jpeg|gif|svg)", "")

  private def t1516Fused(s: String): String =
    s.replaceAll("(?m)^\\[|\\]$|(?i:https?://\\S+\\.(?:png|jpg|jpeg|gif|svg))", "")

  private val genUrlishLine: Gen[String] = Gen.frequency(
    3 -> Gen.listOfN(3, Gen.oneOf(
      "[", "]", "https://a.png", "http://x", "HTTPS://B.JPG", "text",
      "https://a.png]", "[https://b.gif", "x]y", "https://u.v]w.svg",
      "https://a.png]b.png", ".png", "by Jo", " ")).map(_.mkString),
    1 -> Gen.chooseNum(0, 20).flatMap(n => Gen.stringOfN(n,
      Gen.oneOf('[', ']', 'h', 't', 'p', 's', ':', '/', '.', 'a', 'g', ' '))))
  private val genUrlishText: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, genUrlishLine)).map(_.mkString("\n"))

  property("T15+T16 fused alternation == sequential two passes") =
    Prop.forAll(genUrlishText) { s => t1516Fused(s) == t1516Sequential(s) }

  // ---- T17 is NOT fusable with T15/T16: pinned counterexample ----
  // Deleting a line-leading "[" (T15) exposes a byline that T17's
  // ^\s*by then matches; a single fused scan of the ORIGINAL string
  // misses it. This documents WHY stripBracketsImagesBylines keeps T17
  // as a second pass.
  private def t17(s: String): String =
    s.replaceAll("(?im)^\\s*by [A-Z][a-z]+(?: [A-Z][a-z]+)*.*(\n|$)", "")

  property("three-way fusion would DIVERGE from sequential (T17 kept separate)") = {
    val s = "[by John Smith\nkeep"
    val sequentialResult = t17(t1516Sequential(s)) // T15 exposes the byline → deleted
    val threeWayFused = s.replaceAll(
      "(?m)^\\[|\\]$|(?i:https?://\\S+\\.(?:png|jpg|jpeg|gif|svg))" +
        "|(?im:^\\s*by [A-Z][a-z]+(?: [A-Z][a-z]+)*.*(\n|$))", "")
    Prop(sequentialResult == "keep" && threeWayFused != sequentialResult)
  }
}
