package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Entity detection on a crafted conversational corpus — verifies the
  * reference's classification branches (entity_detector.py:553-626):
  * person (ratio ≥ 0.7, two signal categories, score ≥ 5), project
  * (ratio ≤ 0.3), and the no-signal frequency-only uncertain case.
  */
class EntitiesSpec extends SparkSpec {

  private lazy val lines = {
    import spark.implicits._
    Seq(
      "Alice: let me check the build",
      "Alice said the tests are green",
      "hey Alice can you review this",
      "Alice: pushing the fix now",
      "deployed Graftkit with the new config",
      "Graftkit v2 shipped yesterday",
      "building Graftkit took a while",
      "Corpus has rows and Corpus has columns and Corpus is big",
      "Dave said nothing else").toDF("text")
  }

  private lazy val detected =
    Entities.detect(lines, col("text")).collect()
      .map(r => r.getString(0) -> r).toMap

  test("dialogue + verb + direct address classify as person") {
    val alice = detected("Alice")
    assert(alice.getString(1) == "person")
    // ps = 3*2 dialogue + 2*1 said + 4*1 hey = 12, ratio 1.0 → 0.99 cap.
    assert(alice.getDouble(2) == 0.99)
    assert(alice.getLong(3) == 4L) // frequency
    assert(alice.getLong(4) == 12L) // person_score
  }

  test("project verbs + versioned mention classify as project") {
    val kit = detected("Graftkit")
    assert(kit.getString(1) == "project")
    assert(kit.getLong(5) == 7L) // 2*2 project verbs + 3*1 versioned
    assert(kit.getDouble(2) == 0.99)
  }

  test("frequent name without signals is uncertain with freq-scaled confidence") {
    val corpus = detected("Corpus")
    assert(corpus.getString(1) == "uncertain")
    assert(corpus.getDouble(2) == 0.06) // min(0.4, 3/50)
  }

  test("below-min-frequency names are dropped") {
    assert(!detected.contains("Dave"))
  }

  test("classification invariants hold over a randomized corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val names = Seq("Alice", "Bob", "Graftkit", "Pipeline9", "Corpus", "Zed")
    val forms = Seq[String => String](
      n => s"$n: checking in",
      n => s"$n said something",
      n => s"hey $n look at this",
      n => s"deployed $n yesterday",
      n => s"$n v3 is out",
      n => s"just mentioning $n here")
    val corpus = (1 to 400).map { _ =>
      forms(rnd.nextInt(forms.length))(names(rnd.nextInt(names.length)))
    }.toDF("text")
    val rows = Entities.detect(corpus, col("text")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (typ, conf, freq, ps, prs) =
        (r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(freq >= 3, s"min frequency violated: $r")
      assert(conf >= 0.0 && conf <= 0.99, s"confidence out of range: $r")
      val total = ps + prs
      if (typ == "person")
        assert(total > 0 && ps >= 5 && ps.toDouble / total >= 0.7, s"person rule violated: $r")
      if (typ == "project")
        assert(total > 0 && ps.toDouble / total <= 0.3, s"project rule violated: $r")
    }
  }

  test("detected rows feed GraphStore entities") {
    val es = Entities.toEntities(
      Entities.detect(lines, col("text"))).collect()
    val alice = es.find(_.name == "Alice").get
    assert(alice.id == "detected-alice")
    assert(alice.entityType == "person")
    assert(alice.properties("detection_method") == "regex_heuristic")
  }
}
