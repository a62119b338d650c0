package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic invariants for the wave-3 curation operators: duplicated-
  * span removal (q_span_scrub), CCNet perplexity terciles
  * (q_ppl_buckets), prototypicality pruning (q_proto_prune), stride
  * context windows (q_context_windows), and the UniMax language budget
  * waterfill (q_unimax_mix). The oracle gate checks values at sf0.01;
  * these pin the properties values alone can't: scrub-vs-audit
  * consistency, tercile balance, prefix-drop structure, full token
  * coverage, and the waterfill's budget/cap laws.
  */
class CurationWave3Spec extends SparkSpec {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, Sf)

  // ---------------------------------------------------------- span scrub
  test("span_scrub removes exactly the audited duplicated spans' tokens") {
    val scrub = run("q_span_scrub").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val audit = run("q_span_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_dup_spans
    val original = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrub.keySet == original.keySet, "every document is scrubbed")
    scrub.foreach { case (id, (nToks, nRemoved, clean)) =>
      val toks = original(id).split(" ", -1)
      assert(nToks == toks.length, s"doc $id token count")
      assert(nRemoved >= 0 && nRemoved <= nToks)
      val cleanToks = if (clean.isEmpty) Array.empty[String] else clean.split(" ", -1)
      assert(cleanToks.length == nToks - nRemoved,
        s"doc $id: clean length ${cleanToks.length} != $nToks - $nRemoved")
      // A doc loses tokens iff the audit found a duplicated span in it,
      // and an untouched doc comes back verbatim.
      val hasDup = audit.get(id).exists(_ > 0)
      assert((nRemoved > 0) == hasDup,
        s"doc $id: removed=$nRemoved but audit dup spans=${audit.get(id)}")
      if (nRemoved == 0) assert(clean == original(id), s"doc $id must be verbatim")
      // Survivors are a subsequence of the original token stream.
      var i = 0
      cleanToks.foreach { t =>
        while (i < toks.length && toks(i) != t) i += 1
        assert(i < toks.length, s"doc $id: '$t' out of order vs original")
        i += 1
      }
    }
  }

  // ---------------------------------------------------------- ppl buckets
  test("ppl_buckets cuts each language into balanced, ordered terciles") {
    val rows = run("q_ppl_buckets").collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(0), r.getString(3)))
    val scored = run("q_lm_quality").count()
    assert(rows.length == scored, "every LM-scored document is bucketed")
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._4).view.mapValues(_.size).toMap
      val counts = Seq("head", "middle", "tail").map(sizes.getOrElse(_, 0))
      assert(counts.max - counts.min <= 1,
        s"$lang: tercile sizes $counts not balanced")
      // In (xent, doc_id) order the buckets are contiguous:
      // head ≤ middle ≤ tail along the sort key.
      val ordered = rs.sortBy(r => (r._2, r._3)).map(_._4)
      val boundaryOk = ordered.zip(ordered.tail).forall {
        case (a, b) => rank(a) <= rank(b)
      }
      assert(boundaryOk, s"$lang: buckets not contiguous along (xent, doc_id)")
    }
  }
  private def rank(b: String): Int = b match {
    case "head" => 0; case "middle" => 1; case _ => 2
  }

  // ---------------------------------------------------------- proto prune
  test("proto_prune drops exactly the ceil(25%) most prototypical per cluster") {
    val rows = run("q_proto_prune").collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getLong(0), r.getLong(3), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (cl, rs) =>
      val n = rs.length
      val wantDrop = math.ceil(n * 0.25).toLong
      val dropped = rs.filter(_._5 == 0)
      assert(dropped.length == wantDrop, s"cluster $cl: ${dropped.length} != $wantDrop dropped")
      // The dropped set is the PREFIX of the (csim desc, vec_id) order —
      // most prototypical first.
      val order = rs.sortBy(r => (-r._2, r._3))
      assert(order.take(wantDrop.toInt).forall(_._5 == 0) &&
        order.drop(wantDrop.toInt).forall(_._5 == 1),
        s"cluster $cl: dropped set is not the prototypical prefix")
      // rn is exactly the position in that order.
      order.zipWithIndex.foreach { case (r, i) =>
        assert(r._4 == i + 1, s"cluster $cl: rn ${r._4} != ${i + 1}")
      }
    }
  }

  // ------------------------------------------------------ context windows
  test("context_windows tile every document: full coverage, exact slices, stride law") {
    val wins = run("q_context_windows").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val original = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    assert(wins.map(_._1).toSet == original.keySet, "every doc windows")
    wins.groupBy(_._1).foreach { case (id, ws) =>
      val toks = original(id)
      val sorted = ws.sortBy(_._2)
      // Starts advance by exactly the stride; window ids are dense.
      sorted.zipWithIndex.foreach { case ((_, winId, start, _, _), i) =>
        assert(winId == i, s"doc $id: win ids not dense")
        assert(start == 1 + i.toLong * 48, s"doc $id: start $start != ${1 + i * 48}")
      }
      // Each window's text is the exact token slice, capped at 64.
      sorted.foreach { case (_, _, start, wtoks, text) =>
        assert(wtoks == math.min(64L, toks.length - start + 1))
        val want = toks.slice(start.toInt - 1, start.toInt - 1 + wtoks.toInt).mkString(" ")
        assert(text == want, s"doc $id window at $start mismatches slice")
      }
      // Full coverage: the union of [start, start+wtoks-1] is [1, n].
      val covered = sorted.flatMap { case (_, _, st, wt, _) => st until (st + wt) }.toSet
      assert(covered == (1L to toks.length.toLong).toSet,
        s"doc $id: windows cover ${covered.size}/${toks.length} tokens")
      // Every non-first window honors the min-tail rule.
      sorted.drop(1).foreach { case (_, _, _, wt, _) => assert(wt >= 16) }
    }
  }

  // ---------------------------------------------------------- unimax mix
  test("unimax_mix waterfill: budget exhausted, caps honored, uncapped langs equal") {
    val rows = run("q_unimax_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val totalToks = rows.map(_._2).sum
    val budget = totalToks / 2
    val eps = 1e-3
    // Allocations sum to the budget and never exceed the 2-epoch cap.
    assert(math.abs(rows.map(_._4).sum - budget) <= rows.length * eps,
      s"allocations ${rows.map(_._4).sum} != budget $budget")
    rows.foreach { case (lang, nToks, cap, alloc, epochs) =>
      assert(cap == nToks * 2, s"$lang cap")
      assert(alloc <= cap + eps, s"$lang over cap: $alloc > $cap")
      assert(epochs <= 2.0 + eps, s"$lang epochs $epochs > 2")
      assert(math.abs(epochs - alloc / nToks) <= eps)
    }
    // Uncapped languages (alloc < cap) all receive the SAME share.
    val uncapped = rows.filter(r => r._4 < r._3 - eps).map(_._4)
    if (uncapped.length > 1)
      assert(uncapped.max - uncapped.min <= eps,
        s"uncapped shares differ: $uncapped")
  }

  // ------------------------------------------------------ temperature mix
  test("temperature_mix flattens toward uniform and spends the budget") {
    val rows = run("q_temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val budget = rows.map(_._2).sum / 2
    val eps = 1e-3
    assert(math.abs(rows.map(_._5).sum - budget) <= rows.length * eps)
    assert(math.abs(rows.map(_._4).sum - 1.0) <= 1e-4, "p_temp sums to 1")
    // α < 1 compresses: the largest language loses share, the smallest
    // gains — and the ordering of shares is preserved.
    val byRaw = rows.sortBy(_._3)
    assert(byRaw.last._4 < byRaw.last._3, "largest lang must lose share")
    assert(byRaw.head._4 > byRaw.head._3, "smallest lang must gain share")
    assert(byRaw.map(_._4).sameElements(byRaw.map(_._4).sorted),
      "temperature scaling must preserve share order")
    rows.foreach { case (lang, n, _, _, alloc, epochs) =>
      assert(math.abs(epochs - alloc / n) <= eps, s"$lang epochs ratio")
    }
  }

  // --------------------------------------------------- dedup cluster hist
  test("dedup_cluster_hist partitions the corpus into power-of-two buckets") {
    val rows = run("q_dedup_cluster_hist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val corpus = graft.io.Tables.documents(spark, Sf).count()
    assert(rows.map(_._3).sum == corpus,
      s"histogram docs ${rows.map(_._3).sum} != corpus $corpus")
    rows.foreach { case (b, nClusters, nDocs, minSz, maxSz) =>
      assert(nClusters > 0)
      assert(minSz >= (1L << b) && maxSz < (1L << (b + 1)),
        s"bucket $b: sizes [$minSz, $maxSz] outside [2^$b, 2^${b + 1})")
      assert(nDocs >= nClusters * minSz && nDocs <= nClusters * maxSz)
    }
    // Buckets are disjoint and ordered.
    assert(rows.map(_._1).sameElements(rows.map(_._1).distinct.sorted))
  }

  // -------------------------------------------------------- gopher rep
  test("gopher_rep signals match an independent recomputation; keep flag honors the cuts") {
    val rows = run("q_gopher_rep").collect()
      .map(r => (r.getLong(0), (2 to 7).map(i => r.getDouble(i - 1)).toVector, r.getInt(7)))
    val original = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val cuts = Vector(0.20, 0.18, 0.16, 0.15, 0.14, 0.13)
    rows.foreach { case (id, sigs, kept) =>
      val (text, nch) = original(id)
      val toks = text.split(" ", -1)
      def grams(n: Int) = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      // top-n char fraction, n = 2..4 (argmax by count then gram).
      (2 to 4).foreach { n =>
        val byG = grams(n).groupBy(identity).view.mapValues(_.size).toMap
        val want = if (byG.isEmpty) 0.0 else {
          val (g, c) = byG.maxBy { case (g, c) => (c, g) }
          BigDecimal(c.toLong * g.length / nch.toDouble)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        assert(math.abs(sigs(n - 2) - want) <= 1e-9, s"doc $id top$n: ${sigs(n - 2)} != $want")
      }
      // dup-n char fraction, n = 5..7.
      (5 to 7).foreach { n =>
        val byG = grams(n).groupBy(identity).view.mapValues(_.size).toMap
        val dc = byG.collect { case (g, c) if c >= 2 => c.toLong * g.length }.sum
        val want = BigDecimal(dc / nch.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(sigs(n - 2) - want) <= 1e-9, s"doc $id dup$n: ${sigs(n - 2)} != $want")
      }
      val wantKeep = sigs.zip(cuts).forall { case (s0, c0) => s0 <= c0 }
      assert((kept == 1) == wantKeep, s"doc $id keep flag")
    }
  }

  // ------------------------------------------------------- bpe fertility
  test("bpe_fertility roll-up matches the raw corpus word/char mass") {
    val rows = run("q_bpe_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val raw = graft.io.Tables.documents(spark, Sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("d"),
        sum(size(split(col("text"), " ")).cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(_._1).toSet == raw.keySet)
    rows.foreach { case (lang, nDocs, nWords, nSub, fert, cps) =>
      assert((nDocs, nWords) == raw(lang), s"$lang doc/word mass")
      // Every whitespace word pretokenizes to ≥ 1 subword, so fertility
      // ≥ 1; and a subword has ≥ 1 char.
      assert(nSub >= nWords, s"$lang subwords $nSub < words $nWords")
      assert(fert >= 1.0 && cps >= 1.0, s"$lang fertility=$fert cps=$cps")
      assert(math.abs(fert - nSub.toDouble / nWords) <= 1e-3)
    }
  }
}
