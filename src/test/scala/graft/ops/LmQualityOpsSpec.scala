package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-worked semantics of the round-13 LM-quality/mixture operators:
  * normalization-invariant dedup, the per-language CCNet gate, Stupid
  * Backoff bigram scoring, and the token-budget domain mixture. */
class LmQualityOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── Dedup.normalizedGroups ─────────────────────────────────────────

  test("normalizedGroups: casing/punctuation/whitespace variants " +
    "collapse to one canonical group with the raw-variant count") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "hello world"),
      (4L, "HELLO-WORLD?"),
      (5L, "a different doc")).toDF("doc_id", "text")
    val out = Dedup.normalizedGroups(docs)
      .select("n_copies", "n_variants", "keep_id")
      .as[(Long, Long, Long)].collect().toSet
    // the four variants share canonical key "hello world" and are four
    // DISTINCT raw texts; plain exact dedup (q20) would see four
    // singleton groups here
    assert(out == Set((4L, 4L, 1L), (1L, 1L, 5L)), s"got $out")
  }

  test("normalizedGroups: null text forms the null-hash group with " +
    "n_variants 0 (count-distinct ignores nulls on both engines)") {
    val docs = Seq((1L, Some("x")), (2L, None), (3L, None))
      .toDF("doc_id", "text")
    val nullGroup = Dedup.normalizedGroups(docs)
      .filter(col("canon_hash").isNull)
      .select("n_copies", "n_variants", "keep_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(nullGroup == Seq((2L, 0L, 2L)), s"got $nullGroup")
  }

  test("canonicalKey: digits survive, interior punctuation becomes a " +
    "separator (no accidental word gluing)") {
    val out = Seq(Tuple1("Top-10 results,see§4.2"))
      .toDF("text")
      .select(Dedup.canonicalKey(col("text"))).as[String].head()
    // '-' ',' '§' '.' all open a gap; "see" and "4" must NOT fuse
    assert(out == "top 10 results see 4 2", s"got '$out'")
  }

  // ── TextAnalysis.perLangSurprisalGate ──────────────────────────────

  test("perLangSurprisalGate: hand-worked per-lang LM and dyadic " +
    "percentile bounds") {
    // lang xx: tokens a:3 b:3 c:2, W=8 → bits a,b = ⌊log2(8 div 3)⌋ = 1,
    // c = ⌊log2 4⌋ = 2. Scores: doc1 [a,a]→1000, doc2 [a,b]→1000,
    // doc3 [b,b]→1000, doc4 [c,c]→2000. N=4: p25 rank 0.75 → lo=1000;
    // p75 rank 2.25 → hi = 1000 + 0.25·(2000−1000) = 1250.
    val docs = Seq(
      (1L, "xx", "a a"), (2L, "xx", "a b"),
      (3L, "xx", "b b"), (4L, "xx", "c c"),
      // single-doc lang: N=1 → k0=k1=0 → lo=hi=its own score → head
      (5L, "yy", "z z z")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.perLangSurprisalGate(docs)
      .select("doc_id", "lang", "n_tokens", "bits_x1000_per_token",
        "bucket", "lo_x100", "hi_x100")
      .as[(Long, String, Long, Long, String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "xx", 2L, 1000L, "head", 100000L, 125000L),
      (2L, "xx", 2L, 1000L, "head", 100000L, 125000L),
      (3L, "xx", 2L, 1000L, "head", 100000L, 125000L),
      (4L, "xx", 2L, 2000L, "tail", 100000L, 125000L),
      (5L, "yy", 3L, 0L, "head", 0L, 0L)), s"got $out")
  }

  test("perLangSurprisalGate: bounds agree with Spark's own exact " +
    "percentile() per lang on real data, and buckets follow them") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val out = TextAnalysis.perLangSurprisalGate(docs).cache()
    try {
      val ref = out.groupBy("lang").agg(
        floor(expr("percentile(bits_x1000_per_token, 0.25)") * 100)
          .cast("long").as("ref_lo"),
        floor(expr("percentile(bits_x1000_per_token, 0.75)") * 100)
          .cast("long").as("ref_hi"))
      val joined = out.select("lang", "lo_x100", "hi_x100").distinct()
        .join(ref, Seq("lang"))
      assert(joined.filter(col("lo_x100") =!= col("ref_lo") ||
        col("hi_x100") =!= col("ref_hi")).isEmpty,
        "histogram percentile bounds diverge from percentile()")
      // every lang is nonempty in all three buckets at this sf, and
      // heads are at most ~25% + ties of the lang's docs
      val buckets = out.groupBy("lang").pivot("bucket")
        .count().na.fill(0L)
      assert(buckets.filter(col("head") === 0 || col("middle") === 0 ||
        col("tail") === 0).isEmpty, "degenerate bucket split")
    } finally out.unpersist(blocking = false)
  }

  // ── TextAnalysis.stupidBackoff ─────────────────────────────────────

  test("stupidBackoff: hand-worked slice LM — seen bigram, " +
    "backoff-to-unigram, OOV floor, and the context-free first token") {
    // slice = doc 7: "a b a c" → uni a:2 b:1 c:1, W=4;
    // bigram seen-bits: "a b" ⌊log2(2 div 1)⌋=1, "b a" 0, "a c" 1
    val docs = Seq(
      (7L, "a b a c"),   // the LM slice itself
      (1L, "a b x"),     // seen first (1) + seen bigram (1) + OOV (4)
      (2L, "q"),         // unseen first: ⌊log2((10·4) div 4)⌋ = 3
      (3L, "c c")        // seen first (2) + backoff-seen: ⌊log2(10)⌋ = 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoff(docs)
      .select("doc_id", "n_tokens", "n_backoff", "surprisal_bits",
        "bits_x1000_per_token")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 1L, 6L, 2000L),
      (2L, 1L, 1L, 3L, 3000L),
      (3L, 2L, 1L, 5L, 2500L),
      (7L, 4L, 0L, 3L, 750L)), s"got $out")
  }

  test("stupidBackoff: slice-covered text scores strictly below " +
    "token-salad of the same length on the sf0.001 corpus, and the " +
    "backoff fraction is a real signal (neither 0 nor 1)") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val out = TextAnalysis.stupidBackoff(docs).cache()
    try {
      val (nb, nt) = out.agg(sum("n_backoff"), sum("n_tokens"))
        .as[(Long, Long)].head()
      assert(nb > 0 && nb < nt,
        s"backoff fall-through degenerate: $nb of $nt")
      // the slice docs themselves (trained-on text) must average
      // below the corpus at large
      val sliceAvg = out.filter(pmod(col("doc_id"), lit(10)) === 7)
        .agg(avg("bits_x1000_per_token")).as[Double].head()
      val restAvg = out.filter(pmod(col("doc_id"), lit(10)) =!= 7)
        .agg(avg("bits_x1000_per_token")).as[Double].head()
      assert(sliceAvg < restAvg,
        s"in-model text not cheaper: slice $sliceAvg vs rest $restAvg")
    } finally out.unpersist(blocking = false)
  }

  // ── Sampling.mixtureBudget ─────────────────────────────────────────

  test("mixtureBudget: the binding source keeps everything, others " +
    "thin to share, unmapped sources drop with rate 0") {
    def doc(id: Long, src: String) =
      (id, src, Seq.fill(10)("t").mkString(" "))  // 10 tokens each
    val docs = (
      Seq(doc(1, "A")) ++                               // T_A = 10
      (2L to 5L).map(doc(_, "B")) ++                    // T_B = 40
      (6L to 10L).map(doc(_, "C"))                      // unmapped
    ).toDF("doc_id", "source", "text")
    // targets A,B = 500‰ each: B* = min(10·1000/500, 40·1000/500) = 20
    // → rate_A = (500·20) div 10 = 1000 (binding: keep all),
    //   rate_B = (500·20) div 40 = 250
    val out = Sampling.mixtureBudget(docs,
      Map("A" -> 500L, "B" -> 500L)).cache()
    try {
      val rates = out.select("source", "rate_pm").distinct()
        .as[(String, Long)].collect().toSet
      assert(rates == Set(("A", 1000L), ("B", 250L), ("C", 0L)),
        s"got $rates")
      // rate 1000 means the mod-1000 acceptance cannot reject
      assert(out.filter(col("source") === "A" && !col("keep")).isEmpty)
      assert(out.filter(col("source") === "C" && col("keep")).isEmpty)
    } finally out.unpersist(blocking = false)
  }

  test("mixtureBudget: achieved per-source token shares track the " +
    "targets on the sf0.01 corpus (within sampling noise)") {
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.01",
      "documents")
    val targets = Map("src0" -> 300L, "src1" -> 300L, "src2" -> 200L,
      "src3" -> 100L, "src4" -> 50L, "src5" -> 50L)
    val kept = Sampling.mixtureBudget(docs, targets)
      .filter(col("keep"))
      .groupBy("source").agg(sum("n_tokens").as("tok"))
      .as[(String, Long)].collect().toMap
    val total = kept.values.sum.toDouble
    targets.foreach { case (s, w) =>
      val achieved = kept.getOrElse(s, 0L) / total * 1000
      // 25 docs/source at sf0.01 → generous tolerance; the law itself
      // is hash-gated in q119, this pins the macro behavior
      assert(math.abs(achieved - w) < 100,
        s"$s achieved ${achieved}‰ vs target ${w}‰")
    }
    assert(!kept.contains("src7"), "unmapped source leaked through")
  }

  test("mixtureBudget: weight guards reject out-of-range and empty " +
    "target maps") {
    val docs = Seq((1L, "A", "x")).toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      Sampling.mixtureBudget(docs, Map.empty[String, Long])
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureBudget(docs, Map("A" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureBudget(docs, Map("A" -> 1001L))
    }
  }

  // ── plan guards ────────────────────────────────────────────────────

  test("q117/q118 plan shape: the corpus is never sort-merge joined — " +
    "vocabularies, bounds, and the slice LM all ride broadcast") {
    val sf = "/root/testdata/sf0.001"
    Seq("q117_perlang_surprisal_gate", "q118_stupid_backoff").foreach {
      name =>
        val plan = graft.queries.Registry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("SortMergeJoin"),
          s"$name sort-merge joins:\n$plan")
        assert(!plan.contains("ShuffledHashJoin"),
          s"$name shuffle-joins:\n$plan")
        assert(plan.contains("BroadcastHashJoin"),
          s"$name lost its broadcast joins")
    }
  }
}
