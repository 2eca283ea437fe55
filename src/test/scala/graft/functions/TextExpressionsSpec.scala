package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused BPE-apply kernel: equivalence with a driver-side
  * reference scan, survival at production merge counts (where a
  * per-merge Column fold cannot even be planned), and codegen
  * health. */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: Sennrich's greedy left-to-right scan,
    * merge by merge, in plain Scala collections. */
  private def ref(w: String, merges: Seq[String]): String = {
    var toks: List[String] = w.map(_.toString).toList
    merges.foreach { pair =>
      val Array(a, b) = pair.split(" ", 2)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = toks
      while (rest.nonEmpty) {
        rest match {
          case x :: y :: tail if x == a && y == b =>
            out += a + b; rest = tail
          case x :: tail =>
            out += x; rest = tail
          case Nil =>
        }
      }
      toks = out.toList
    }
    toks.mkString(" ", " ", " ")
  }

  test("bpeEncode matches the driver-side reference scan on hand " +
    "cases including back-to-back disjoint and self-pair runs") {
    val words = Seq("abab", "aaa", "aaaaa", "murmur", "banana", "x",
      "abcabcabc")
    val merges = Seq("a b", "ab c", "m u", "mu r", "a n", "an an", "a a")
    val got = words.toDF("w")
      .select(TextFunctions.bpeEncode(col("w"), merges).as("s"))
      .collect().map(_.getString(0))
    val want = words.map(w => ref(w, merges))
    assert(got.toSeq == want)
    // the two shapes a delimiter-consuming replace gets wrong:
    assert(ref("abab", Seq("a b")) == " ab ab ")
    assert(ref("aaaaa", Seq("a a")) == " aa aa a ")
  }

  test("a production-scale merge list (1,200 merges) plans, stays in " +
    "whole-stage codegen, and evaluates correctly") {
    // doubling chain: merge 'a a', 'aa aa', ... 'a128 a128', so a
    // 256-run collapses to ONE symbol through 8 dependent merges,
    // plus disjoint pairs padding the list to 1,200 — the fold form
    // at this size is a deep expression tree that cannot be planned,
    // let alone compiled into one 64 KB Janino method.
    val chain = (1 to 8).scanLeft("a") { (s, _) => s + s }
    val chainMerges = chain.init.map(s => s"$s $s") // a a, aa aa, ...
    val pad = (1 to 1192).map(i => s"x$i y$i")
    val merges = chainMerges ++ pad
    assert(merges.size == 1200)
    // route through parquet: a LocalRelation project is evaluated
    // eagerly by ConvertToLocalRelation and never reaches codegen —
    // the assertion below needs a real scan stage
    val dir = tmpDir("bpe-kernel-scale")
    Seq("a" * 256, "a" * 255, "x1y1", "b").toDF("w")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("w"), TextFunctions.bpeEncode(col("w"), merges).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' is the whole-stage-codegen marker in SparkPlan.toString;
    // the Project carrying the kernel must sit inside a codegen stage
    assert(plan.split("\n").exists(l =>
      l.trim.matches("""\*\(\d+\) Project .*bpe_encode.*""")), plan.take(2000))
    assert(!plan.contains("CodegenFallback"), plan.take(2000))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // 'a'*256 = 2^8: the chain collapses it to a single symbol —
    // every level pairs cleanly (the shape a delimiter-consuming
    // replace breaks at level one)
    assert(got("a" * 256) == " " + "a" * 256 + " ")
    // 'a'*255 = 2^8-1: binary decomposition, biggest first
    assert(got("a" * 255) ==
      (7 to 0 by -1).map(k => "a" * (1 << k)).mkString(" ", " ", " "))
    assert(got("a" * 255) == ref("a" * 255, merges))
    assert(got("x1y1") == " x 1 y 1 ") // pads never match spaced chars
    assert(got("b") == " b ")
  }

  test("null input produces null; empty merge list is identity " +
    "spacing; code points space per character like substr") {
    val got = Seq(Some("ab"), None).toDF("w")
      .select(TextFunctions.bpeEncode(col("w"), Seq.empty).as("s"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some(" a b "), None))
    // non-ASCII: spacing must count code points, not UTF-16 units —
    // identical to substr(w, i, 1) (what Bpe.spacedChars walks) and
    // DuckDB's w[i]
    val wide = Seq("é日😀a").toDF("w")
    val kernel = wide.select(TextFunctions.bpeEncode(col("w"), Seq.empty))
      .collect()(0).getString(0)
    val column = wide.select(concat(lit(" "), concat_ws(" ",
      transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))), lit(" ")))
      .collect()(0).getString(0)
    assert(kernel == column)
    assert(kernel == " é 日 😀 a ")
  }

  test("bpeAdjacentPairs matches the transform-based Column " +
    "formulation and keeps the pair-count projection in codegen") {
    val cases = Seq(" a b c ", " x ", " aa a aa ", " a b a b ", "  ")
    val df = cases.toDF("s")
    val kernel = df.select(TextFunctions.bpeAdjacentPairs(col("s")))
      .collect().map(_.getSeq[String](0))
    // the original higher-order formulation, verbatim
    val syms = split(trim(col("s")), " ")
    val legacy = df.select(
      when(size(syms) > 1,
        transform(sequence(lit(1), size(syms) - 1),
          j => concat(element_at(syms, j), lit(" "),
            element_at(syms, j + 1))))
        .otherwise(array().cast("array<string>")))
      .collect().map(_.getSeq[String](0))
    assert(kernel.toSeq == legacy.toSeq)
    assert(kernel(0) == Seq("a b", "b c"))
    assert(kernel(1) == Seq.empty)
    assert(kernel(2) == Seq("aa a", "a aa"))
    // codegen: the trainer's pair-count shape (explode over the
    // kernel) must sit in a whole-stage-codegen stage, which the
    // transform formulation never could (HigherOrderFunction is
    // CodegenFallback)
    val dir = tmpDir("bpe-pairs-scan")
    df.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(explode(TextFunctions.bpeAdjacentPairs(col("s"))).as("pair"))
      .queryExecution.executedPlan.toString
    assert(plan.split("\n").exists(l =>
      l.trim.matches("""\*\(\d+\) Generate explode.*""")), plan.take(1500))
    assert(!plan.contains("CodegenFallback"), plan.take(1500))
  }

  test("boundary control-char symbols survive the kernels: only " +
    "SPACES are stripped, like Spark trim / DuckDB trim — not " +
    "java's String.trim") {
    // tokens() splits on \s+, so non-\s control chars (e.g. \u0001)
    // are legitimate symbol content; a java trim would strip one at
    // an encoding boundary and silently delete the symbol
    val enc = " \u0001 b "
    val pairs = Seq(enc).toDF("s")
      .select(TextFunctions.bpeAdjacentPairs(col("s")))
      .collect()(0).getSeq[String](0)
    assert(pairs == Seq("\u0001 b"))
    // the legacy Column formulation agrees (split/trim strip spaces only)
    val syms = split(trim(col("s")), " ")
    val legacy = Seq(enc).toDF("s")
      .select(when(size(syms) > 1,
        transform(sequence(lit(1), size(syms) - 1),
          j => concat(element_at(syms, j), lit(" "),
            element_at(syms, j + 1))))
        .otherwise(array().cast("array<string>")))
      .collect()(0).getSeq[String](0)
    assert(pairs == legacy)
    // merge application: the control-char token is preserved verbatim
    val merged = Seq(enc).toDF("s")
      .select(TextFunctions.bpeMergeSpaced(col("s"), Seq("\u0001 b")))
      .collect()(0).getString(0)
    assert(merged == " \u0001b ")
    val identity = Seq(enc).toDF("s")
      .select(TextFunctions.bpeMergeSpaced(col("s"), Seq("x y")))
      .collect()(0).getString(0)
    assert(identity == enc)
    // raw-word spacing path too
    val spaced = Seq("\u0001b").toDF("w")
      .select(TextFunctions.bpeEncode(col("w"), Seq.empty))
      .collect()(0).getString(0)
    assert(spaced == " \u0001 b ")
  }

  test("wordShingles matches the legacy transform formulations " +
    "exactly (3-gram distinct/all, L-gram windows) and stays in " +
    "codegen") {
    val texts = Seq(
      "the cat sat on the mat the cat sat",
      "a b", "", "x y z", "w w w w w w",
      "one two three four five six seven")
    val df = texts.toDF("text")
      .select(split(trim(lower(col("text"))), "\\s+").as("w"))
    def legacy3(all: Boolean) = {
      val base = when(size(col("w")) >= 3,
        transform(sequence(lit(0), size(col("w")) - lit(3)), i =>
          concat_ws(" ",
            element_at(col("w"), i + lit(1)),
            element_at(col("w"), i + lit(2)),
            element_at(col("w"), i + lit(3)))))
        .otherwise(array().cast("array<string>"))
      if (all) base else array_distinct(base)
    }
    def legacyL(l: Int) =
      when(size(col("w")) >= l,
        transform(sequence(lit(0), size(col("w")) - lit(l)),
          i => concat_ws(" ", slice(col("w"), i + lit(1), lit(l)))))
        .otherwise(array().cast("array<string>"))
    for ((kernel, legacy) <- Seq(
      (TextFunctions.wordShingles(col("w"), 3, distinct = true),
        legacy3(all = false)),
      (TextFunctions.wordShingles(col("w"), 3, distinct = false),
        legacy3(all = true)),
      (TextFunctions.wordShingles(col("w"), 5, distinct = false),
        legacyL(5)),
      (TextFunctions.wordShingles(col("w"), 1, distinct = false),
        legacyL(1)))) {
      val got = df.select(kernel).collect().map(_.getSeq[String](0))
      val want = df.select(legacy).collect().map(_.getSeq[String](0))
      assert(got.toSeq == want.toSeq)
    }
    // the corpus projection stays inside a whole-stage-codegen stage
    val dir = tmpDir("shingle-scan")
    texts.toDF("text").write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(split(trim(lower(col("text"))), "\\s+").as("w"))
      .select(explode(TextFunctions.wordShingles(col("w"), 3,
        distinct = true)).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.split("\n").exists(l =>
      l.trim.matches("""\*\(\d+\) Generate explode.*""")), plan.take(1500))
    assert(!plan.contains("CodegenFallback"), plan.take(1500))
  }

  test("bpeMergeSpaced applies merges to an existing spaced encoding " +
    "(the trainer's per-step rewrite)") {
    val got = Seq(" a b a b ", " a a a a a ", " x ").toDF("s")
      .select(TextFunctions.bpeMergeSpaced(col("s"), Seq("a b")).as("m"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq(" ab ab ", " a a a a a ", " x "))
    val self = Seq(" a a a a a ").toDF("s")
      .select(TextFunctions.bpeMergeSpaced(col("s"), Seq("a a")))
      .collect()(0).getString(0)
    assert(self == " aa aa a ")
  }

  test("normalizeText kernel ≡ the regex chain it replaced, on hand " +
    "cases spanning punctuation, unicode, digits, and edge shapes") {
    val cases = Seq(
      "Hello, World!", "  leading and trailing  ", "ALL-CAPS?TEXT",
      "a§b", "déjà vu", "tabs\tand\nnewlines", "digits 42 stay-42",
      "", "...", "   ", "a", "mixed:Ünïcödé and ascii",
      "中文字符 between words", "a  b   c", "under_score", "x'y\"z")
    val df = cases.toDF("text")
    val rows = df.select(
        TextFunctions.normalizeText(col("text")).as("kernel"),
        graft.ops.Dedup.canonicalKeyRegex(col("text")).as("regex"))
      .collect()
    rows.zip(cases).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"kernel '${r.getString(0)}' != regex '${r.getString(1)}' " +
          s"for input '$in'")
    }
    // and the kernel's own contract on a few pinned outputs
    val pinned = Seq("Hello, World!" -> "hello world",
      "..." -> "", "a§b" -> "a b", "under_score" -> "under score")
    pinned.foreach { case (in, want) =>
      val got = Seq(in).toDF("t")
        .select(TextFunctions.normalizeText(col("t")))
        .collect()(0).getString(0)
      assert(got == want, s"'$in' -> '$got', want '$want'")
    }
  }

  test("normalizeText ≡ regex chain on randomized mixed strings, " +
    "interpreted eval ≡ codegen, null propagates") {
    val rnd = new scala.util.Random(42)
    val alphabet =
      "abcXYZ019 \t\n.,;:!?-_()[]§µ€中éÜ𝄞" // incl. a 4-byte char
    val strs = (1 to 300).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val rows = strs.toDF("text").select(
        TextFunctions.normalizeText(col("text")).as("kernel"),
        graft.ops.Dedup.canonicalKeyRegex(col("text")).as("regex"))
      .collect()
    rows.zip(strs).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1), s"diverged on '$in'")
    }
    // interpreted twin (direct eval path) agrees with the codegen run
    strs.take(50).foreach { s =>
      val interp = NormalizeTextExpr.normalize(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      val viaDf = Seq(s).toDF("t")
        .select(TextFunctions.normalizeText(col("t")))
        .collect()(0).getString(0)
      assert(interp == viaDf, s"eval/codegen split on '$s'")
    }
    val nullOut = Seq(Option.empty[String]).toDF("t")
      .select(TextFunctions.normalizeText(col("t"))).collect()(0)
    assert(nullOut.isNullAt(0), "null must propagate")
  }
}
