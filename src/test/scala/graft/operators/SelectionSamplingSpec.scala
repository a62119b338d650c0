package graft.operators

import graft.{SparkEntry, SparkSpec}
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 additions: Bloom-prefiltered decontamination, weighted
  * sampling without replacement, and the NB quality classifier. The
  * DuckDB oracle pins exact results; these tests pin the properties
  * the oracle cannot see — the bloom's no-false-negative construction
  * and useful selectivity, the two-stage top-k's equivalence to the
  * single-stage form, and the classifier's planted class separation.
  */
class SelectionSamplingSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.01"

  test("bloom probe never false-negatives and actually prunes") {
    val docs = Tables.documents(spark, Sf01)
    val keys = docs.select(concat(lit("k"), col("doc_id")).as("k"))
      .filter(col("doc_id") % 2 === 0)
    val words = QualityFilters.bloomBitmap(keys, "k", 1 << 18)
    val all = docs.select(concat(lit("k"), col("doc_id")).as("k"),
        (col("doc_id") % 2 === 0).as("planted"))
      .withColumn("hit", QualityFilters.bloomProbe(col("k"), words))
      .collect()
    val missedPlanted = all.count(r => r.getBoolean(1) && !r.getBoolean(2))
    assert(missedPlanted == 0, s"$missedPlanted planted keys missed the bloom")
    val nonPlanted = all.count(r => !r.getBoolean(1))
    val fp = all.count(r => !r.getBoolean(1) && r.getBoolean(2))
    // ~250 keys in a 2^18-bit filter: fp rate should be tiny; 20 % is
    // a loose ceiling that still proves the probe prunes.
    assert(fp.toDouble / nonPlanted < 0.2,
      s"bloom passed $fp of $nonPlanted non-planted keys")
  }

  test("bloom decontamination result is the exact overlap (bloom invisible)") {
    val docs = Tables.documents(spark, Sf01)
    def grams(c: org.apache.spark.sql.Column) = {
      val toks = split(c, " ")
      val idx = when(size(toks) >= 5, sequence(lit(1), size(toks) - 4))
        .otherwise(array().cast("array<int>"))
      transform(idx, i => concat_ws(" ", slice(toks, i, lit(5))))
    }
    val held = docs.filter(col("doc_id") % 3 === 0)
      .select(explode(grams(col("text"))).as("gram")).distinct()
    val exact = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), explode(grams(col("text"))).as("gram"))
      .join(held, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min("gram").as("first_hit"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val got = SparkEntry.queries("q_decontaminate_bloom")(spark, Sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == exact, "bloom-prefiltered overlap differs from exact overlap")
    assert(got.nonEmpty, "degenerate: no overlap at all")
  }

  test("two-stage weighted sample equals the single-stage top-k") {
    val u = expr("(cast(conv(substring(md5(cast(concat('es', cast(doc_id as string)) as binary)), 1, 15), 16, 10) as bigint) + 0.5) / 1152921504606846976.0")
    val single = Tables.documents(spark, Sf01)
      .select(col("doc_id"), col("lang"),
        u.as("u"), expr("ln(1.0 + n_chars)").as("w"))
      .select(col("doc_id"), col("lang"), expr("-ln(u) / w").as("es_key"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("es_key"), col("doc_id"))))
      .filter(col("rk") <= 25)
      .select(col("doc_id"), col("lang"), round(col("es_key"), 6).as("es_key"),
        col("rk").cast("long").as("rk"))
      .collect().map(_.toSeq).toSet
    val got = SparkEntry.queries("q_weighted_sample")(spark, Sf01)
      .collect().map(_.toSeq).toSet
    assert(got == single, "salted two-stage top-k changed the selected sample")
  }

  test("weighted sample is biased toward heavier documents") {
    val docs = Tables.documents(spark, Sf01)
    val meanAll = docs.agg(avg("n_chars")).head().getDouble(0)
    val sel = SparkEntry.queries("q_weighted_sample")(spark, Sf01)
      .select("doc_id")
    val meanSel = docs.join(sel, "doc_id").agg(avg("n_chars")).head().getDouble(0)
    // w = ln(1+n_chars) strictly increases with length, so on this
    // fixed corpus the deterministic sample must lean heavy.
    assert(meanSel > meanAll,
      s"selected mean n_chars $meanSel not above corpus mean $meanAll")
  }

  test("source overlap matrix is upper-triangular and bounded by gram counts") {
    val docs = Tables.documents(spark, Sf01)
    def grams(c: org.apache.spark.sql.Column) = {
      val toks = split(c, " ")
      val idx = when(size(toks) >= 5, sequence(lit(1), size(toks) - 4))
        .otherwise(array().cast("array<int>"))
      transform(idx, i => concat_ws(" ", slice(toks, i, lit(5))))
    }
    val perSource = docs
      .select(col("source"), explode(grams(col("text"))).as("gram")).distinct()
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = SparkEntry.queries("q_source_overlap")(spark, Sf01).collect()
    assert(m.nonEmpty, "degenerate: no cross-source span overlap at all")
    m.foreach { r =>
      val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a < b, s"matrix row not upper-triangular: ($a, $b)")
      assert(n <= math.min(perSource(a), perSource(b)),
        s"($a, $b) shares $n grams but the smaller side only has " +
          s"${math.min(perSource(a), perSource(b))}")
    }
  }

  test("multi-probe ANN dominates single-probe and its recall ladder holds") {
    def top5(name: String) = SparkEntry.queries(name)(spark, Sf01)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("q_knn_cosine")(spark, Sf01)
      .select("vec_id").limit(5).collect().map(_.getLong(0)).toSet
    val single = top5("q_ann_bucket")
    val multi = top5("q_ann_multiprobe")
    def recall(s: Set[Long]) = (s intersect exact).size
    assert(recall(multi) >= recall(single),
      s"multi-probe recall ${recall(multi)} below single-probe ${recall(single)}")
    // Candidate superset ⇒ the k-th best sim can only improve.
    def sims(name: String) = SparkEntry.queries(name)(spark, Sf01)
      .select("sim").collect().map(_.getDouble(0)).sorted.reverse
    val (ss, ms) = (sims("q_ann_bucket"), sims("q_ann_multiprobe"))
    ss.zip(ms).foreach { case (a, b) =>
      assert(b >= a, s"multi-probe top-k sims not pointwise >= single-probe")
    }
  }

  test("pareto keep rule is sparse, deterministic, and quality-leaning") {
    val out = SparkEntry.queries("q_pareto_select")(spark, Sf01)
    val kept = out.filter(col("kept") === 1)
    val dropped = out.filter(col("kept") === 0)
    assert(kept.count() > 0, "degenerate: nothing kept")
    // Pareto(9) draws are mostly tiny, so with scores well below 1 the
    // rule must stay sparse — an inverted comparison keeps the bulk.
    assert(kept.count() < dropped.count(), "keep rule not sparse")
    val mKept = kept.agg(avg("logit")).head().getDouble(0)
    val mDropped = dropped.agg(avg("logit")).head().getDouble(0)
    assert(mKept > mDropped,
      s"kept mean logit $mKept not above dropped $mDropped")
  }

  test("multi-probe semantic decontamination: subset of exact, recall above the measured floor") {
    val e = Tables.embeddings(spark, Sf01)
    // The codebook is corpus-sized now (k = max(10, ceil(sqrt n))) —
    // the fixed-k quadratic-at-scale defect round 8 flagged. k comes
    // from the codebook itself (empty seed cells drop out).
    val k = QualityFilters
      .semanticDecontCodebook(e, QualityFilters.semanticDecontK(e))
      .count().toInt
    def hitSet(p: Int) = QualityFilters.semanticDecontHits(e, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val probed = hitSet(4)
    // Probing every cell puts each train vec in all k cells, so the
    // join degenerates to the exact train × bench compare.
    val exact = hitSet(k)
    assert(probed.subsetOf(exact), "probed hits not a subset of the exact compare")
    val recall = probed.size.toDouble / exact.size
    // Measured: P=4 of the ~sqrt(n)-cell codebook on this corpus.
    // Finer cells than the old 10-label codebook concentrate true
    // tau=0.3 neighbors less per cell, so the per-probe floor is lower
    // than the old 10-cell 58% — the production recall knob is nprobe.
    assert(recall >= 0.3,
      s"P=4 recall $recall below the measured floor (${probed.size}/${exact.size})")
    assert(recall < 1.0, "P=4 unexpectedly exhaustive — blocking is not blocking")
  }

  test("sampled minhash calibration: subset of the full audit, same values, bounded drift") {
    def rows(name: String) = SparkEntry.queries(name)(spark, Sf01)
      .select("doc_a", "doc_b", "bands_matched", "true_jaccard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
    val full = rows("q_minhash_estimate").toMap
    val sampled = rows("q_minhash_estimate_sampled")
    assert(sampled.nonEmpty, "sampled audit returned nothing")
    // Family-cap sampling only ever REMOVES pairs: every surviving pair
    // must exist in the full audit with identical band count and
    // identical true Jaccard (dropping other family members cannot
    // change whether two survivors collide in a band).
    sampled.foreach { case (pair, v) =>
      assert(full.get(pair).contains(v),
        s"sampled pair $pair=$v missing or different in the full audit (${full.get(pair)})")
    }
    assert(sampled.length <= full.size)
    // The audit's deliverable is the per-band-count calibration means;
    // the capped sample must reproduce them within a small drift.
    def bandMeans(m: Seq[((Long, Long), (Long, Double))]) =
      m.groupBy(_._2._1).map { case (b, xs) =>
        b -> xs.map(_._2._2).sum / xs.size
      }
    val fm = bandMeans(full.toSeq)
    val sm = bandMeans(sampled.toSeq)
    sm.foreach { case (b, mean) =>
      assert(math.abs(mean - fm(b)) < 0.1,
        s"band $b calibration drifted: sampled $mean vs full ${fm(b)}")
    }
  }

  test("minhash estimator is calibrated: true Jaccard rises with bands matched") {
    // The reason minBands exists: 1-band collisions are chance-level
    // (true J ~ 0.01 on this corpus), >= 2 bands means real overlap.
    // Grouped means must be strictly increasing in band count.
    val means = SparkEntry.queries("q_minhash_estimate")(spark, Sf01)
      .groupBy("bands_matched").agg(avg("true_jaccard").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    assert(means.length >= 2, s"degenerate band histogram: ${means.toSeq}")
    means.sliding(2).foreach { case Array((b1, m1), (b2, m2)) =>
      assert(m1 < m2, s"mean true Jaccard not increasing: $b1→$m1 vs $b2→$m2")
    }
  }

  test("per-source KL divergence is non-negative and covers every source") {
    val kl = SparkEntry.queries("q_source_divergence")(spark, Sf01).collect()
    val nSources = Tables.documents(spark, Sf01)
      .select("source").distinct().count()
    assert(kl.length == nSources, s"${kl.length} rows for $nSources sources")
    kl.foreach { r =>
      // Gibbs: both sides are proper distributions over the vocab
      // support (the smoothing normalizes them), so KL >= 0 exactly.
      assert(r.getDouble(2) >= 0.0, s"negative KL for ${r.getString(0)}")
      assert(r.getLong(1) > 0L, s"empty token count for ${r.getString(0)}")
    }
  }

  test("quality classifier separates the planted curated sources") {
    val docs = Tables.documents(spark, Sf01)
    val scored = SparkEntry.queries("q_quality_classifier")(spark, Sf01)
      .join(docs.select("doc_id", "source"), "doc_id")
      .withColumn("pos", col("source").isin("src0", "src1", "src2", "src3"))
    val means = scored.groupBy("pos").agg(avg("logit").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"curated-source mean logit ${means(true)} not above crawl ${means(false)}")
    // Bayes with a 1:4 crawl-heavy prior on near-identical synthetic
    // class distributions must stay crawl-dominant — an inverted
    // balance would mean the prior or the weights flipped sign.
    val nPos = scored.filter(col("pred") === 1).count()
    assert(nPos < scored.count() / 2, s"crawl-heavy prior lost: $nPos positive")
  }
}
