package graft

import java.nio.file.Files

/** Feedback-learning benchmark harness (FlbRunner): the closed loop's
  * qualitative contract on a miniature corpus — oracle feedback lifts
  * recall, noisy feedback doesn't, the baseline round is identical
  * across modes/weights (no feedback exists yet), and the whole run is
  * deterministic (hash-RNG simulator, no Python-Random state to
  * replay).
  */
class FlbSpec extends SparkSpec {

  // Miniature FLB corpus mirroring tools/gen_flb.py's hardness knob:
  // topics from a small GLOBAL pool so look-alike sessions flood the
  // shared store and feedback has signal to add. Deterministic LCG, no
  // java.util.Random-ordering dependence.
  private lazy val dataPath: String = {
    var state = 12345L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (math.abs(state >>> 33) % bound).toInt
    }
    val vocab = (0 until 300).map(i => s"w$i")
    val topics = Array.fill(6)(Array.fill(12)(vocab(nextInt(300))))
    val sb = new StringBuilder
    for (qid <- 0 until 40) {
      val topicIds = Array.fill(4)(nextInt(6))
      val hay = (0 until 20).map { s =>
        val sid = qid * 100 + s
        val topic = topics(topicIds(s / 5))
        val uniq = Array.fill(5)(vocab(nextInt(300)))
        (sid, topic, uniq, s"session $sid " + (topic ++ uniq).mkString(" "))
      }
      val ans = hay(qid % 20)
      val qtoks = ans._2.take(8) ++ ans._3.take(1)
      val hayJson = hay.map { case (sid, _, _, text) =>
        s"""{"session_id":$sid,"text":"$text"}"""
      }.mkString("[", ",", "]")
      sb.append(
        s"""{"question_id":$qid,"question":"question ${qtoks.mkString(" ")}","answer_session_id":${ans._1},"question_type":"t${qid % 2}","haystack":$hayJson}\n""")
    }
    val p = Files.createTempFile("flb_spec", ".json")
    Files.writeString(p, sb.toString)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def run(mode: String, rounds: Int = 2, weight: Double = 0.15) =
    FlbRunner.run(spark, dataPath, mode = mode, rounds = rounds,
      weight = weight, seed = 42, topK = 10)

  test("oracle feedback materially lifts R@5 over the baseline round") {
    val r = run("oracle", rounds = 3)
    val base = r.rounds.head
    assert(base.r5 < 0.9, s"baseline saturated (${base.r5}) — corpus not hard enough to measure uplift")
    assert(r.deltaR5 > 0.1, s"oracle uplift ${r.deltaR5} not materially positive")
    assert(r.deltaMrr > 0.0, s"oracle MRR delta ${r.deltaMrr} not positive")
  }

  test("noisy feedback is a lower bound: no material improvement") {
    val oracle = run("oracle")
    val noisy = run("noisy")
    assert(noisy.deltaR5 < oracle.deltaR5,
      s"noisy uplift ${noisy.deltaR5} not below oracle ${oracle.deltaR5}")
    assert(noisy.deltaR5 < 0.1,
      s"noisy feedback produced material improvement (${noisy.deltaR5}) — the loop is noise-driven")
  }

  test("realistic mode lands between noisy and oracle") {
    val (o, r, n) = (run("oracle"), run("realistic"), run("noisy"))
    assert(r.deltaR5 <= o.deltaR5 + 1e-9,
      s"realistic ${r.deltaR5} above oracle ${o.deltaR5}")
    assert(r.deltaR5 >= n.deltaR5 - 1e-9,
      s"realistic ${r.deltaR5} below noisy ${n.deltaR5}")
  }

  test("baseline round is identical across modes and weights (no feedback yet)") {
    val rs = Seq(run("oracle"), run("noisy"), run("realistic", weight = 0.3))
      .map(_.rounds.head)
    assert(rs.map(m => (m.r5, m.mrr, m.ndcg5)).distinct.size == 1,
      s"round-1 metrics diverged: $rs")
  }

  test("the whole run is deterministic (hash-RNG simulator)") {
    val a = run("realistic", rounds = 3)
    val b = run("realistic", rounds = 3)
    assert(a.rounds.map(m => (m.round, m.r5, m.mrr, m.ndcg5)) ==
      b.rounds.map(m => (m.round, m.r5, m.mrr, m.ndcg5)))
  }

  test("invalid simulator mode is rejected") {
    intercept[IllegalArgumentException] { run("bogus") }
  }
}
