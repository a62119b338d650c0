package graft

import java.nio.file.Files

/** LoCoMo benchmark harness (LocomoRunner) — the min_score threshold
  * regression contract mirroring the reference's committed
  * tests/unit/test_locomo_threshold.py (default 0.0, explicit values
  * honored verbatim, threshold actually forwarded into retrieval),
  * plus the metric invariants a DuckDB oracle cannot see: refusal
  * monotonicity in the threshold, recall monotonicity in k, the
  * adversarial category's empty-retrieval scoring, and determinism.
  */
class LocomoSpec extends SparkSpec {

  // Miniature LoCoMo-shaped corpus: 4 conversations x 4 sessions x 8
  // turns, 10 QA each over the 5 categories; adversarial questions use
  // a disjoint vocabulary slice so a threshold CAN refuse them.
  private lazy val dataPath: String = {
    var state = 999L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (math.abs(state >>> 33) % bound).toInt
    }
    val vocab = (0 until 400).map(i => s"w$i")
    val advVocab = (0 until 50).map(i => s"a$i")
    val sb = new StringBuilder
    for (c <- 0 until 4) {
      val turns = scala.collection.mutable.ArrayBuffer[(String, Seq[String], Seq[String])]()
      for (s <- 1 to 4) {
        val topic = Seq.fill(6)(vocab(nextInt(400)))
        for (t <- 0 until 8)
          turns += ((s"D$s:$t", topic, Seq.fill(5)(vocab(nextInt(400)))))
      }
      val turnJson = turns.zipWithIndex.map { case ((tid, topic, uniq), i) =>
        val sess = i / 8 + 1
        s"""{"turn_id":"$tid","session":$sess,"turn_index":${i % 8},"speaker":"p${i % 2}","text":"${(topic ++ uniq).mkString(" ")}"}"""
      }.mkString("[", ",", "]")
      val qaJson = (0 until 10).map { i =>
        val cat = Seq("single_hop", "multi_hop", "temporal", "open_domain", "adversarial")(i % 5)
        if (cat == "adversarial") {
          val q = Seq.fill(6)(advVocab(nextInt(50))).mkString(" ")
          s"""{"qa_id":"c${c}_q$i","question":"$q","answer":"","category":"$cat","evidence":[],"adversarial_answer":"n/a"}"""
        } else {
          val nEv = if (cat == "multi_hop") 2 else 1
          val evIdx = Seq.fill(nEv)(nextInt(turns.size)).distinct
          val ev = evIdx.map(turns(_))
          val q = (ev.flatMap(_._3.take(2)) ++ ev.head._2.take(2)).mkString(" ")
          val evIds = ev.map(e => s""""${e._1}"""").mkString("[", ",", "]")
          s"""{"qa_id":"c${c}_q$i","question":"$q","answer":"x","category":"$cat","evidence":$evIds,"adversarial_answer":""}"""
        }
      }.mkString("[", ",", "]")
      sb.append(s"""{"conv_id":"conv_$c","turns":$turnJson,"qa":$qaJson}\n""")
    }
    val p = Files.createTempFile("locomo_spec", ".json")
    Files.writeString(p, sb.toString)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def run(minScore: Double = 0.0) =
    LocomoRunner.run(spark, dataPath, minScore = minScore, topK = 10)

  test("default min_score is 0.0: nothing refused, every QA retrieves") {
    val m = run()
    assert(m.minScore == 0.0)
    assert(m.adversarialRefusalRate == 0.0,
      s"threshold 0 should refuse nothing, got ${m.adversarialRefusalRate}")
    assert(m.totalQa == 40)
    assert(m.recallAtK(5) > 0.3, s"degenerate corpus: R@5 ${m.recallAtK(5)}")
  }

  test("explicit min_score is honored verbatim and forwarded into retrieval") {
    val strict = run(minScore = 0.99)
    assert(strict.minScore == 0.99)
    // At 0.99 nothing clears the bar: every QA refuses, including the
    // adversarial ones (refusal 1.0) — the reference's forwarding test
    // observed the engine kwarg; here the observable IS the behavior.
    assert(strict.adversarialRefusalRate == 1.0)
    assert(strict.recallAtK(5) == 0.0 && strict.mrr == 0.0)
  }

  test("adversarial refusal is monotone in the threshold, recall anti-monotone") {
    val sweep = Seq(0.0, 0.3, 0.5, 0.7, 0.99).map(t => run(t))
    sweep.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi.adversarialRefusalRate >= lo.adversarialRefusalRate,
        s"refusal fell ${lo.minScore}->${hi.minScore}")
      assert(hi.recallAtK(5) <= lo.recallAtK(5) + 1e-12,
        s"recall rose with a stricter threshold ${lo.minScore}->${hi.minScore}")
    }
    // The threshold exists to separate: somewhere in the sweep the
    // adversarial questions (disjoint vocabulary) refuse while real
    // recall is still materially positive.
    assert(sweep.exists(m => m.adversarialRefusalRate > 0.8 && m.recallAtK(5) > 0.2),
      "no operating point separates adversarial refusal from recall")
  }

  test("recall is monotone in k; NDCG <= recall; MRR in [0,1]") {
    val m = run()
    assert(m.recallAtK(1) <= m.recallAtK(5) && m.recallAtK(5) <= m.recallAtK(10))
    // NDCG is deliberately NOT asserted monotone in k: with multi-turn
    // evidence the ideal DCG grows faster than the achieved DCG as the
    // cutoff widens, so NDCG@10 can sit below NDCG@1 (the reference's
    // formula has the same property — longmemeval/metrics.py:150-163).
    Seq(1, 5, 10).foreach { k =>
      assert(m.ndcgAtK(k) <= m.recallAtK(k) + 1e-12,
        s"NDCG@$k ${m.ndcgAtK(k)} above recall@$k ${m.recallAtK(k)}")
    }
    assert(m.mrr >= 0.0 && m.mrr <= 1.0)
    // Single-position cutoff: a retrieved list either hits at rank 1 or
    // not, so NDCG@1 == recall@1 exactly (both are the hit indicator).
    assert(math.abs(m.ndcgAtK(1) - m.recallAtK(1)) < 1e-12)
  }

  test("adversarial QAs are excluded from the retrieval metrics") {
    val m = run()
    val adv = m.perCategory("adversarial")
    assert(adv.count == 8)
    assert(adv.recallAtK.isEmpty && adv.ndcgAtK.isEmpty,
      "adversarial bucket must report refusal only")
    val nonAdvN = m.perCategory.filter(_._1 != "adversarial").values.map(_.count).sum
    assert(nonAdvN == 32)
  }

  test("the run is deterministic") {
    val a = run(0.3)
    val b = run(0.3)
    assert(a.recallAtK == b.recallAtK && a.mrr == b.mrr &&
      a.ndcgAtK == b.ndcgAtK &&
      a.adversarialRefusalRate == b.adversarialRefusalRate)
  }
}
