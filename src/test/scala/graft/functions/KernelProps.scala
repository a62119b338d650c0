package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.expressions.TextHashWorker

/** ScalaCheck properties for the compiled per-row kernels: each kernel
  * must equal an independent brute-force reference on arbitrary token
  * streams (the corpus-level equality with the declarative twins is
  * pinned separately in Wave5Spec; these cover the input space the
  * fixture corpus doesn't reach — empty tokens, repeated runs,
  * single-token docs, heavy duplication).
  */
object KernelProps extends Properties("compiled-kernels") {

  private val tok = Gen.oneOf("a", "b", "ab", "xyz", "q1", "", "Zz")
  private val textGen = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, tok)).map(_.mkString(" "))

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  private def shingles(text: String): Seq[String] = {
    val t = text.split(" ", -1)
    if (t.length < 3) Seq.empty
    else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
  }

  property("winnow prints == brute-force window minima") =
    Prop.forAll(textGen, Gen.choose(2, 6)) { (text, w) =>
      val hs = shingles(text).map(hash60)
      val expected =
        if (hs.isEmpty) Set.empty[Long]
        else if (hs.length < w) Set(hs.min)
        else hs.sliding(w).map(_.min).toSet
      val got = TextHashWorker.winnowPrints(text, w).toLongArray.toSet
      Prop(got == expected) :| s"text='$text' w=$w got=$got exp=$expected"
    }

  property("min-shingle md5 == brute force (null iff < 3 tokens)") =
    Prop.forAll(textGen) { text =>
      val sh = shingles(text)
      val got = Option(TextHashWorker.minShingleMd5(text)).map(_.toString)
      val expected = if (sh.isEmpty) None else Some(sh.map(md5Hex).min)
      Prop(got == expected) :| s"text='$text' got=$got exp=$expected"
    }

  property("simhash == brute-force nibble vote") =
    Prop.forAll(textGen) { text =>
      val toks = text.split(" ", -1)
      val sums = new Array[Int](16)
      toks.foreach { t =>
        val h = md5Hex(t)
        (0 until 16).foreach { p =>
          val nib = Integer.parseInt(h.charAt(p).toString, 16)
          sums(p) += (if (nib >= 8) 1 else -1)
        }
      }
      val expected = sums.map(s0 => if (s0 >= 0) '1' else '0').mkString
      val got = TextHashWorker.simhashBits(text).toString
      Prop(got == expected) :| s"text='$text' got=$got exp=$expected"
    }

  property("minhash sigs == brute-force per-band min over mixed hashes") =
    Prop.forAll(textGen, Gen.listOfN(4, Gen.choose(1L, 1000000L)), Gen.oneOf(2147483647L, 1000000007L)) {
      (text, mixes, p) =>
        val as = mixes.toArray
        val sh = shingles(text)
        val expected: Option[Seq[Long]] =
          if (sh.isEmpty) None
          else Some(as.indices.map { b =>
            sh.map(s => ((hash60(s) % p) * as(b) + b) % p).min
          })
        val got = Option(TextHashWorker.minhashSigs(text, as, p)).map(_.toLongArray.toSeq)
        Prop(got == expected) :| s"text='$text' got=$got exp=$expected"
    }

  property("span hashes == brute-force n-gram md5 prefixes (ordered / distinct)") =
    Prop.forAll(textGen, Gen.choose(1, 5), Gen.oneOf(false, true)) { (text, n, distinct) =>
      val toks = text.split(" ", -1)
      val all =
        if (toks.length < n) Seq.empty[Long]
        else (0 to toks.length - n).map(i => hash60(toks.slice(i, i + n).mkString(" ")))
      val expected = if (distinct) all.distinct else all
      val got = TextHashWorker.spanHashes(text, n, distinct).toLongArray.toSeq
      Prop(got == expected) :| s"text='$text' n=$n distinct=$distinct got=$got exp=$expected"
    }

  property("span scrub == brute-force covered-position removal") =
    Prop.forAll(textGen, Gen.choose(1, 5), Gen.choose(0, 8).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1L, 45L)))) { (text, n, starts) =>
      val toks = text.split(" ", -1)
      val covered = (1 to toks.length).filter(pos =>
        starts.exists(s0 => s0 <= pos && pos <= s0 + n - 1)).toSet
      val kept = (1 to toks.length).filterNot(covered).map(p0 => toks(p0 - 1))
      val row = TextHashWorker.spanScrub(text, starts.toArray, n)
      val got = (row.getLong(0), row.getLong(1), row.getUTF8String(2).toString)
      val expected = (toks.length.toLong, covered.size.toLong, kept.mkString(" "))
      Prop(got == expected) :| s"text='$text' n=$n starts=$starts got=$got exp=$expected"
    }

  property("gopher stats == brute-force gram counting") =
    Prop.forAll(textGen) { text =>
      val worker = new graft.functions.expressions.GopherRepWorker(
        Array(2, 3, 4), Array(5, 6, 7))
      val got = worker.stats(text).toLongArray
      val toks = text.split(" ", -1)
      def grams(n: Int): Seq[String] =
        if (toks.length < n) Seq.empty
        else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
      val exp = Array(toks.length.toLong) ++
        Seq(2, 3, 4).map { n =>
          val c = grams(n).groupBy(identity).view.mapValues(_.size)
          if (c.isEmpty) 0L
          else {
            val (g, cnt) = c.maxBy { case (g0, c0) => (c0, g0) }
            cnt.toLong * g.length
          }
        } ++
        Seq(5, 6, 7).map { n =>
          grams(n).groupBy(identity).collect {
            case (g0, occ) if occ.size >= 2 => occ.size.toLong * g0.length
          }.sum
        }
      Prop(got.sameElements(exp)) :|
        s"text='$text' got=${got.mkString(",")} exp=${exp.mkString(",")}"
    }

  // The BPE pretokenizer scanner vs the regex it replaces — over an
  // alphabet the corpus never exercises: PIPES (the wrap delimiter the
  // regex excludes like a space), uppercase, accents, CJK, an
  // astral-plane emoji (surrogate pair), runs of separators, and
  // leading/trailing separators.
  private val preChunk = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.stringOfN(2, Gen.numChar),
    Gen.oneOf("|", "||", " | ", "A", "\u00c9", "\u4e2d\u6587", "\ud83d\ude00", "!!", "a1b", "9z", "v2.5"),
    Gen.oneOf(" ", "  ", "   "))
  private val preGen = Gen.listOf(preChunk).map(_.mkString)

  property("bpe pretoken scanner == regex extraction") = Prop.forAll(preGen) { s =>
    val got = Bpe.pretokens(s).toList
    val exp = Bpe.PretokenRe.r.findAllIn(s).toList
    Prop(got == exp) :| s"text='$s' got=$got exp=$exp"
  }

  // Word 5-grams kernel vs a brute-force split — over inputs with
  // multi-space runs (empty tokens), leading/trailing spaces, unicode:
  // the kernel's substring shortcut must equal joining the sliced
  // tokens for every split shape.
  private val gramChunk = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.stringOfN(2, Gen.numChar),
    Gen.oneOf("\u4e2d", "\ud83d\ude00", "x", ""),
    Gen.oneOf(" ", "  ", "   "))
  private val gramGen = Gen.listOf(gramChunk).map(_.mkString)

  property("bucket counts kernel == brute-force md5-hash histogram") =
    Prop.forAll(textGen, Gen.oneOf(8, 64, 1024)) { (text, buckets) =>
      val exp = text.split(" ", -1).toSeq
        .map(t => (hash60(t) % buckets, 1L))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .toSeq.sortBy(_._1)
      val arr = graft.functions.expressions.TextHashWorker
        .bucketCounts(text, buckets)
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getLong(0), r.getLong(1))
      }
      Prop(got == exp) :| s"text='$text' buckets=$buckets got=$got exp=$exp"
    }

  property("kernel round6 == Catalyst Round(_, 6) on adversarial doubles") = {
    // The centroid kernels' round6 claims bit-parity with Spark's
    // round(_, 6) — the rounding the declarative twins and the
    // oracle-facing outputs go through. Pin it against the ACTUAL
    // Catalyst expression (not a re-statement of the same BigDecimal
    // call) on exact .5-boundary ties, negatives, huge/tiny magnitudes,
    // and non-finite values.
    import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
    val boundary = Gen.choose(-2000000L, 2000000L).map(n => (n + 0.5) / 1e6)
    val wild = Gen.oneOf(
      Gen.choose(-1e12, 1e12), Gen.choose(-1.0, 1.0),
      Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.MinPositiveValue,
        -Double.MinPositiveValue, 4.9999995e-1, -4.9999995e-1))
    Prop.forAll(Gen.oneOf(boundary, wild)) { x =>
      val kernel = graft.functions.expressions.CentroidKernels.round6(x)
      val catalyst = Round(Literal(x), Literal(6)).eval(null).asInstanceOf[Double]
      Prop((kernel == catalyst) ||
        (java.lang.Double.isNaN(kernel) && java.lang.Double.isNaN(catalyst))) :|
        s"x=$x kernel=$kernel catalyst=$catalyst"
    }
  }

  property("word n-grams kernel == brute-force sliding join, n = 2..6") =
    Prop.forAll(gramGen, Gen.choose(2, 6)) { (s, n) =>
      val toks = s.split(" ", -1)
      val exp: Seq[String] =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val got = new graft.functions.expressions.WordGramsWorker(n)
        .grams(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType).toSeq.map(_.toString)
      Prop(got == exp) :| s"text='$s' n=$n got=$got exp=$exp"
    }

  property("token stats kernel == brute-force counts (n, distinct, top)") =
    Prop.forAll(textGen) { text =>
      val toks = text.split(" ", -1).toSeq
      val byTok = toks.groupBy(identity).map { case (_, v) => v.size }
      val exp = Seq(toks.size.toLong, byTok.size.toLong, byTok.max.toLong)
      val got = new graft.functions.expressions.TokenStatsWorker()
        .stats(text).toLongArray.toSeq
      Prop(got == exp) :| s"text='$text' got=$got exp=$exp"
    }
}
