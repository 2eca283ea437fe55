package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Aho–Corasick blocklist kernel: hand-worked match semantics,
  * equivalence with a driver-side per-phrase reference, and survival
  * at real blocklist sizes (where a per-phrase Column fold cannot
  * even be planned). */
class MatchExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: per phrase independently, leftmost
    * non-overlapping occurrences in the casefolded text — the
    * replace-length-trick semantics. */
  private def ref(text: String, phrases: Seq[String]): Long = {
    val t = text.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
    phrases.map { p0 =>
      val p = p0.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      var count = 0L
      var from = 0
      var i = t.indexOf(p, from)
      while (i >= 0) {
        count += 1
        from = i + p.length
        i = t.indexOf(p, from)
      }
      count
    }.sum
  }

  private def run(texts: Seq[String], phrases: Seq[String]): Seq[Long] =
    texts.toDF("text")
      .select(TextFunctions.multiMatchCount(col("text"), phrases))
      .collect().map(_.getLong(0)).toSeq

  test("hand cases: nested phrases, self-adjacent runs, case folding, " +
    "boundary matches, cross-phrase overlap") {
    // "fast" nested in "fast merge": both count at one site (2 hits)
    assert(run(Seq("a fast merge b"), Seq("fast merge", "fast")) ==
      Seq(2L))
    // self-run: "table table table" has 2 overlapping "table table"
    // sites but non-overlap greedy counts 1; "aaaa" vs "aa" counts 2
    assert(run(Seq("table table table"), Seq("table table")) == Seq(1L))
    assert(run(Seq("aaaa"), Seq("aa")) == Seq(2L))
    // case-insensitive
    assert(run(Seq("FAST Fast fAsT"), Seq("fast")) == Seq(3L))
    // matches at the very start and very end
    assert(run(Seq("end at start"), Seq("end", "start")) == Seq(2L))
    // different phrases may overlap each other freely
    assert(run(Seq("abcd"), Seq("abc", "bcd")) == Seq(2L))
    // no match, empty text
    assert(run(Seq("nothing here", ""), Seq("zzz")) == Seq(0L, 0L))
    // null propagates
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.multiMatchCount(col("text"), Seq("x")))
      .collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("equivalence with the driver-side per-phrase reference on " +
    "randomized small-alphabet texts (dense accidental overlaps)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abAB "
    val texts = (1 to 200).map { _ =>
      (1 to rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val phrases = Seq("a", "ab", "ba", "aa", "a b", "bab", "abab")
    val got = run(texts, phrases)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == ref(t, phrases), s"diverged on '$t'")
    }
  }

  test("a 10,000-phrase blocklist builds, stays one plan node, and " +
    "matches the reference — the scale a per-phrase fold cannot plan") {
    val rnd = new scala.util.Random(13)
    val words = (1 to 2501).map(i => s"w${i}x")
    // 10k phrases: single words, two-word phrases, and prefix-nested
    // families (w1x inside "w1x w1x") to stress dictionary-suffix
    // links
    val phrases = (words ++
      words.sliding(2, 1).map(_.mkString(" ")).toSeq ++
      words.take(2500).map(w => s"$w $w") ++
      words.take(2500).map(w => s"$w ${w}z")).distinct.take(10000)
    assert(phrases.size == 10000, s"fixture sized ${phrases.size}")
    val texts = (1 to 50).map { _ =>
      (1 to 100).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" ")
    }
    // repartition blocks ConvertToLocalRelation's driver-side eval,
    // so the projection actually runs through generated code
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      .repartition(2)
      .select(col("id"), TextFunctions
        .multiMatchCount(col("text"), phrases).as("hits"))
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1).map(_._2).toSeq
    // the whole projection stays inside whole-stage codegen — the
    // phrase list is data, not expression-tree depth. (AQE's plan
    // toString hides codegen spans both before and after execution,
    // so the shape is asserted on a non-adaptive compile of the same
    // frame.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = texts.zipWithIndex.map(_.swap).toDF("id", "text")
        .repartition(2)
        .select(TextFunctions.multiMatchCount(col("text"), phrases))
        .queryExecution.executedPlan.toString
      // the "*(n)" prefix is the compact-plan WholeStageCodegen
      // marker; a fallen-out projection prints bare "Project"
      assert(plan.contains("WholeStageCodegen") ||
        plan.linesIterator.exists(_.trim.matches("""\*\(\d+\) Project.*""")),
        s"kernel fell out of codegen:\n${plan.take(2000)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    texts.zip(got).foreach { case (t, g) =>
      assert(g == ref(t, phrases), "10k-phrase divergence")
    }
    assert(got.sum > 0, "degenerate fixture: nothing matched")
  }

  test("build guards: empty list, empty phrase, non-ASCII phrase, " +
    "case-fold duplicates all rejected") {
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("café")))
    intercept[IllegalArgumentException](
      AhoCorasick.build(Seq("Fast", "fast")))
  }

  // ── scrub (MultiMatchScrubExpr): sequential replace-chain semantics ──

  /** Driver-side scrub reference: the LITERAL sequential replace
    * chain — `String.replace` is leftmost-non-overlapping greedy,
    * exactly DuckDB's `replace` — with per-stage counts taken on the
    * text that stage scans. */
  private def scrubRef(text: String, phrases: Seq[String])
      : (String, Long, Long) = {
    var t = text.map(c =>
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
    var spans = 0L
    var nBytes = 0L
    phrases.foreach { p0 =>
      val p = p0.map(c =>
        if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      var c = 0L
      var from = 0
      var i = t.indexOf(p, from)
      while (i >= 0) { c += 1; from = i + p.length; i = t.indexOf(p, from) }
      spans += c
      nBytes += c * p.length
      t = t.replace(p, "*" * p.length)
    }
    (t, spans, nBytes)
  }

  private def runScrub(texts: Seq[String], phrases: Seq[String])
      : Seq[(String, Long, Long)] =
    texts.toDF("text")
      .select(TextFunctions.multiMatchScrub(col("text"), phrases).as("s"))
      .select(col("s.scrubbed"), col("s.n_spans"), col("s.n_bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("scrub hand cases: list order is priority — prefix shadowing, " +
    "suffix shadowing, self-runs, rejected-candidate re-eligibility") {
    // "fast" first: it masks, so "fast merge" can NEVER fire
    assert(runScrub(Seq("a fast merge"), Seq("fast", "fast merge")) ==
      Seq(("a **** merge", 1L, 4L)))
    // reversed priority: the longer phrase wins the same site
    assert(runScrub(Seq("a fast merge"), Seq("fast merge", "fast")) ==
      Seq(("a **********", 1L, 10L)))
    // suffix shadowing: nested "value" is gone, standalone survives
    assert(runScrub(Seq("hash value value"), Seq("hash value", "value")) ==
      Seq(("**********" + " " + "*****", 2L, 15L)))
    // same-phrase greedy self-run: every other site
    assert(runScrub(Seq("table table table"), Seq("table table")) ==
      Seq(("*********** table", 1L, 11L)))
    // a candidate overlapping a REJECTED candidate stays eligible:
    // "bc" masks [0,1]; "cc"@1 is rejected (byte 1 masked) but
    // "cc"@2 — overlapping the rejected one — is accepted
    assert(runScrub(Seq("bccc"), Seq("bc", "cc")) ==
      Seq(("****", 2L, 4L)))
    // case folding applies to the OUTPUT too (scrub of lower(text))
    assert(runScrub(Seq("FAST Data"), Seq("fast")) ==
      Seq(("**** data", 1L, 4L)))
    // no hits: casefolded text unchanged
    assert(runScrub(Seq("clean doc"), Seq("zzz")) ==
      Seq(("clean doc", 0L, 0L)))
    // null propagates as a null struct → null fields
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.multiMatchScrub(col("text"), Seq("x")).as("s"))
      .select(col("s.scrubbed"), col("s.n_spans")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("scrub equivalence with the literal replace chain on randomized " +
    "small-alphabet texts (dense overlaps, mixed case)") {
    val rnd = new scala.util.Random(21)
    val alphabet = "abcABC "
    val texts = (1 to 300).map { _ =>
      (1 to rnd.nextInt(80)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    // order matters: include phrases that nest/overlap every which way
    val phrases = Seq("ab", "abc", "bc", "ca", "aa", "b c", "cab")
    val got = runScrub(texts, phrases)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == scrubRef(t, phrases), s"diverged on '$t'")
    }
    // and under the REVERSED priority order (different accepted sets)
    val gotR = runScrub(texts, phrases.reverse)
    texts.zip(gotR).foreach { case (t, g) =>
      assert(g == scrubRef(t, phrases.reverse), s"rev diverged on '$t'")
    }
    assert(got.map(_._2).sum > 0, "degenerate fixture: nothing masked")
    assert(got != gotR, "fixture never exercised order sensitivity")
  }

  test("scrub guards: multi-char mask and mask-inside-phrase rejected " +
    "(replace rescans masked text — a phrase containing the mask " +
    "could be fabricated)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    intercept[IllegalArgumentException](
      MultiMatchScrubExpr(Literal("t"), Seq("ab"), "**"))
    intercept[IllegalArgumentException](
      MultiMatchScrubExpr(Literal("t"), Seq("a*b"), "*"))
  }
}
