package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Fuzz properties for the export normalizer: arbitrary garbage —
  * including malformed JSON and truncated exports — must never throw,
  * and unrecognized content must pass through byte-identical.
  */
object NormalizerProps extends Properties("normalizer") {

  private val jsonish = Gen.oneOf(
    Gen.const("{"), Gen.const("["), Gen.const("{\"type\":"),
    Gen.const("""{"mapping": """), Gen.const("""[{"type": "message""""),
    Gen.const("""{"messages": [{"role":"""))

  private val garbage: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.asciiPrintableStr, jsonish)).map(_.mkString("\n")),
    // Truncated versions of a valid export.
    Gen.choose(0, 80).map(n =>
      """{"messages": [{"role": "user", "content": "hi"}, {"role": "assistant", "content": "hello"}]}"""
        .take(n)))

  property("normalizeText never throws") = Prop.forAll(garbage) { s =>
    Normalizer.normalizeText(s); true
  }

  property("unrecognized non-JSON content passes through unchanged") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val t = s.trim
      // Anything that is not JSON-ish and lacks 3+ transcript markers
      // must come back byte-identical.
      val markers = s.split("\n").count(_.trim.startsWith(">"))
      if (t.isEmpty || "{[".contains(t.take(1)) || markers >= 3) true
      else Normalizer.normalizeText(s) == s
    }

  property("a valid flat-messages export always yields > markers") =
    Prop.forAll(Gen.alphaStr.suchThat(_.nonEmpty), Gen.alphaStr.suchThat(_.nonEmpty)) { (q, a) =>
      val export = s"""{"messages": [{"role": "user", "content": "$q"}, {"role": "assistant", "content": "$a"}]}"""
      val out = Normalizer.normalizeText(export)
      out.startsWith(s"> ${q.trim}") && out.contains(a.trim)
    }
}
