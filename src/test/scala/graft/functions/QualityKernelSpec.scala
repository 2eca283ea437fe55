package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextAnalysis

/** Round-18 equivalence pins for the fused stage-1–3 kernels: the
  * byte-scan quality stats ([[QualityKernel]]), the token counter
  * ([[NTokensExpr]]) and the fused PII scrub ([[RegexScrubExpr]])
  * must be ROW-IDENTICAL to the Column chains they replaced
  * (`TextAnalysis.qualityColumns` / `qualityKeepColumns` /
  * `piiScrubColumns` / `scrubTextColumns`), which are kept
  * `private[graft]` exactly so this comparison can never drift from
  * what production replaced. The corpus below is adversarial, not
  * random: every known divergence channel of the byte-scan rewrite
  * gets a row (unicode lowercase expansion, non-space \s boundaries
  * kept by split(-1) but not by trim, shared-delimiter stopword
  * overlaps counted once by the replace trick, PII patterns adjacent
  * to each other so a later pass sees an earlier pass's output). */
class QualityKernelSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial: Seq[String] = Seq(
    "",                       // empty: split("", -1) == [""] => 1 word
    " ",                      // trims to empty
    "   ",                    // multi-space trim
    "\t",                     // \s trim does NOT strip: ["",""] => 2
    "\ta word\t",             // leading AND trailing non-space \s
    "a\nb\r\ncd\fe",    // every Java \s class member
    "the the the",            // shared-delimiter overlap: " the the " counts 1+1 via two disjoint scans
    "the the",                // padded " the the " counts ONE " the "
    "a and the of to in or an", // all stopwords
    "The AND Of",             // case folding
    "İstanbul the İ K the",  // U+0130 / U+212A: unicode lowercase expansion / ASCII folding
    "ẞ der ß STRASSE the",   // sharp s
    "x" * 50,                 // one long word: avg_word_len gate
    ("word " * 30).trim,      // passes length, no stopwords
    (("the quick. brown, fox! jumps? over; the: lazy dog " * 4).trim),
    "a@b.co 555-123-4567 1.2.3.4",
    "joe@example.com writes to sue@ex.org.uk from 10.0.0.1",
    "phone 123-456-7890 and 123.456.7890 end",
    "evil@1.2.3.4 the ip inside an email",          // email eats the IP first
    "ip 999.999.999.999 borderline 1.2.3.4.5",      // greedy IP edges
    "<EMAIL> already scrubbed 012-345-6789",        // pre-existing mask text
    "mixed: a@b.cc,c@d.dd 111-222-3333;4.3.2.1:",   // punct adjacency
    "¿the español? über die straße. 中文 的 文本 the",
    null.asInstanceOf[String]) ++
    // deterministic pseudo-random rows mixing everything
    (0 until 200).map { i =>
      val words = (0 until (i % 37)).map { j =>
        val r = (i * 31 + j * 17) % 11
        r match {
          case 0 => "the"
          case 1 => "and"
          case 2 => "a"
          case 3 => s"w$j@ex$i.com"
          case 4 => s"${100 + j}-${200 + i % 700}-${1000 + i}"
          case 5 => s"${i % 256}.${j % 256}.1.${(i + j) % 256}"
          case 6 => "tok" + ("x" * (j % 9))
          case 7 => "Ünïcödé" + j
          case 8 => "p.,!?;:q"
          case 9 => if (j % 2 == 0) "\tt" else "of"
          case _ => s"v${i}_$j"
        }
      }
      words.mkString(if (i % 5 == 0) "  " else " ")
    }

  private def corpus = adversarial.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("quality: fused kernel row-identical to the Column chain") {
    val a = TextAnalysis.quality(corpus).orderBy("doc_id").collect()
    val b = TextAnalysis.qualityColumns(corpus).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("qualityKeep: fused kernel row-identical to the Column chain") {
    val a = corpus.select(col("doc_id"),
      TextAnalysis.qualityKeep(col("text")).as("k"))
      .orderBy("doc_id").collect()
    val b = corpus.select(col("doc_id"),
      TextAnalysis.qualityKeepColumns(col("text")).as("k"))
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("nTokens: fused counter == size(split(trim(lower), \\s+))") {
    val a = corpus.select(col("doc_id"),
      QualityFunctions.nTokens(col("text")).as("n"))
      .orderBy("doc_id").collect()
    val b = corpus.select(col("doc_id"),
      size(graft.ops.Hashing.tokens(col("text"))).cast("long").as("n"))
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("piiScrub: fused kernel row-identical to the Column chain") {
    val a = TextAnalysis.piiScrub(corpus).orderBy("doc_id").collect()
    val b = TextAnalysis.piiScrubColumns(corpus).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("scrubText: fused kernel row-identical to the chained replace") {
    val a = corpus.select(col("doc_id"),
      TextAnalysis.scrubText(col("text")).as("t"))
      .orderBy("doc_id").collect()
    val b = corpus.select(col("doc_id"),
      TextAnalysis.scrubTextColumns(col("text")).as("t"))
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("qualityGates keep == filter(qualityKeep) survivors") {
    val viaGates = TextAnalysis.qualityGates(corpus)
      .filter(col("keep")).select("doc_id").orderBy("doc_id").collect()
    val viaFilter = corpus.filter(TextAnalysis.qualityKeep(col("text")))
      .select("doc_id").orderBy("doc_id").collect()
    assert(viaGates.toSeq == viaFilter.toSeq)
  }

  test("kernels run inside whole-stage codegen (no fallback)") {
    // a projection of all three kernels must stay in one codegen stage:
    // CollapseCodegenStages ejects CodegenFallback expressions, so the
    // executedPlan would show the expression outside WholeStageCodegen
    // a local Seq collapses to LocalTableScan (ConvertToLocalRelation
    // evaluates projections eagerly), which would vacuously pass or
    // fail — build the text column from range() so a real stage runs
    val df = spark.range(64)
      .select(concat(lit("the word a@b.co "), col("id")).as("text"))
      .select(
        TextAnalysis.qualityKeep(col("text")).as("k"),
        QualityFunctions.nTokens(col("text")).as("n"),
        TextAnalysis.scrubText(col("text")).as("s"))
    // the executedPlan toString marks codegen stages with the *(n)
    // prefix; the Project carrying the kernels must be inside one
    val plan = df.queryExecution.executedPlan.toString
    val kernelLine = plan.linesIterator
      .find(_.contains("quality_keep")).getOrElse("")
    assert(kernelLine.trim.startsWith("*("),
      s"kernel Project not whole-stage-codegen'd:\n$plan")
  }
}
