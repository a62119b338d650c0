package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the BPE-ish pretokenizer regex: a
  * pretokenizer must be LOSSLESS (concatenating the extracted tokens
  * reproduces the input byte-for-byte) and its three content classes
  * plus space runs must partition the token stream. Checked against
  * the same Java regex engine Spark's regexp_extract_all uses.
  */
object TextAnalysisProps extends Properties("bpe-pretokenizer") {

  private val re = TextAnalysis.BpeRe.r

  // Strings over the full class mix: letters, digits, punctuation,
  // spaces (including runs and leading/trailing spaces).
  private val chunk = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.stringOfN(2, Gen.numChar),
    Gen.oneOf("!!", ".", "v2.5", "#", "??"),
    Gen.oneOf(" ", "  ", "   "))
  private val textGen = Gen.listOf(chunk).map(_.mkString)

  property("extraction is lossless") = Prop.forAll(textGen) { s =>
    re.findAllIn(s).mkString == s
  }

  property("classes partition the token stream") = Prop.forAll(textGen) { s =>
    val toks = re.findAllIn(s).toList
    val word = toks.count(_.matches("^ ?[a-z].*"))
    val num = toks.count(_.matches("^ ?[0-9].*"))
    val other = toks.count(_.matches("^ ?[^a-z0-9 ].*"))
    val space = toks.count(_.matches("^ +$"))
    word + num + other + space == toks.length
  }

  property("no token mixes content classes") = Prop.forAll(textGen) { s =>
    re.findAllIn(s).forall { t =>
      val body = t.stripPrefix(" ")
      body.forall(_.isLetter) || body.forall(_.isDigit) ||
        body.forall(c => !c.isLetterOrDigit && c != ' ') || t.forall(_ == ' ')
    }
  }

  // The compiled q_bpe_tokens scan vs the regex ground truth — over an
  // ADVERSARIAL alphabet (uppercase, accents, CJK, an astral-plane
  // emoji = surrogate pair), not just the corpus's lowercase soup: the
  // kernel's char-range classes must agree with the regex's code-point
  // classes everywhere, including multi-char "other" runs.
  private val nastyChunk = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.stringOfN(2, Gen.numChar),
    Gen.oneOf("!!", "A", "É", "中文", "😀", "v2.5", "#", "a1b", "9z"),
    Gen.oneOf(" ", "  ", "   "))
  private val nastyGen = Gen.listOf(nastyChunk).map(_.mkString)

  property("compiled class counter == regex class counts") = Prop.forAll(nastyGen) { s =>
    val toks = re.findAllIn(s).toList
    val expected = Array(
      toks.length.toLong,
      toks.count(_.matches("^ ?[a-z].*")).toLong,
      toks.count(_.matches("^ ?[0-9].*")).toLong,
      toks.count(_.matches("^ ?[^a-z0-9 ].*")).toLong)
    val got = new graft.functions.expressions.BpeClassCounter()
      .counts(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      .toLongArray()
    got.sameElements(expected)
  }
}
