package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties over the JS-faithful models (SURVEY.md §5).
  * The models are proven equal to both Spark routes in LineOpsSpec
  * (including a 10k-body single-pass differential), so these invariants
  * transfer to the Spark implementations. Driven at 10 000 cases per
  * property — the models are pure string folds, so the full run stays
  * in seconds while covering the branch space far past the default 100. */
object LineOpsProps extends Properties("LineOps") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10000)

  private val genLine: Gen[String] = Gen.frequency(
    2 -> Gen.const(""),
    3 -> Gen.stringOfN(8, Gen.alphaNumChar).map("https://u.rl/" + _),
    2 -> Gen.chooseNum(290, 310).map("h" * _),
    5 -> Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))
      .map(_.replace("\n", " ")))
  private val genBody: Gen[String] =
    Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, genLine)).map(_.mkString("\n"))
  private val genMax: Gen[Int] = Gen.chooseNum(5, 120)

  property("chunk: oversized blocks are always single lines") =
    Prop.forAll(genBody, genMax) { (b, max) =>
      LineModels.chunk(b, max).forall(bl => bl.length <= max || !bl.contains("\n"))
    }

  property("chunk: reconstruction is exact when every line fits") =
    Prop.forAll(genMax, Gen.chooseNum(0, 12)) { (max, n) =>
      val lineGen = Gen.chooseNum(1, math.max(1, max - 1))
        .flatMap(k => Gen.stringOfN(k, Gen.alphaChar))
      Prop.forAll(Gen.listOfN(n, lineGen)) { lines =>
        val body = lines.mkString("\n")
        body.isEmpty || LineModels.chunk(body, max).mkString("\n") == body
      }
    }

  property("chunk: block line-sets cover all non-artifact input lines") =
    Prop.forAll(genBody, genMax) { (b, max) =>
      val flat = LineModels.chunk(b, max).flatMap(_.split("\n", -1))
      val orig = b.split("\n", -1).toSeq
      // flattened output = original with possible inserted/dropped ''
      flat.filter(_.nonEmpty) == orig.filter(_.nonEmpty)
    }

  property("hyperlink: output line count <= input; merges only remove URL lines") =
    Prop.forAll(genBody) { b =>
      val in = b.split("\n", -1)
      val out = LineModels.hyperlink(b).split("\n", -1)
      out.length <= in.length &&
        (in.length - out.length) <= in.count(_.matches("^https?://\\S+$"))
    }

  property("hyperlink: idempotent on URL-free bodies") =
    Prop.forAll(genBody) { b =>
      val clean = b.split("\n", -1).map(l =>
        if (l.matches("^https?://\\S+$")) "x" + l else l).mkString("\n")
      LineModels.hyperlink(clean) == clean
    }

  property("hyperlink: every merged pair preserves heading and url text") =
    Prop.forAll(genBody) { b =>
      // generated URLs contain no '|', so a lazy url group parses the
      // merge exactly even when the heading itself contains '|' or '>'
      val Merged = "<(https?://[^|]+)\\|(.*)>".r
      val inLines = b.split("\n", -1).toSet
      LineModels.hyperlink(b).split("\n", -1).forall {
        case l @ Merged(url, head) => inLines(l) || (inLines(url) && inLines(head))
        case _ => true
      }
    }
}
