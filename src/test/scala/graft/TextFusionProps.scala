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
}
