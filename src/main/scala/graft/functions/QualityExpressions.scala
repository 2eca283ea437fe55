package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document quality statistics — the capstone's stage-1
  * gate ([[graft.ops.TextAnalysis.qualityKeep]]) and the q29/q52
  * report ([[graft.ops.TextAnalysis.quality]]/`qualityGates`) share
  * one text kernel instead of a ~14-pass Column chain.
  *
  * Why a kernel and not the Column formulation (round-18, guide §1.2
  * step 2 "per-task work" after the round-17 verdict named stages 1–3
  * the largest unoptimized term): the Column form evaluates, PER ROW,
  * `lower`+`concat` (one full-string materialization), EIGHT
  * `replace` passes each allocating a full-length copy just to
  * measure the length delta (the stopword counts), a regex `split`
  * materializing the token ARRAY just to take its size, and a
  * `regexp_count` NFA scan for the punctuation tally — and the gate
  * composition evaluates that chain once in the length-histogram pass
  * and again in the serving pass. This kernel computes the same five
  * numbers in one lowercase materialization plus flat byte scans: no
  * regex, no token array, no per-needle copies.
  *
  * Exact-equivalence contract with the Column chain (spec-pinned,
  * QualityKernelSpec):
  *
  *  - n_words replays `size(split(trim(lower(t)), "\\s+"))`: ASCII
  *    space trim at both ends, then Java `Pattern.split(-1)` segment
  *    counting — leading/trailing empty segments from non-space \s
  *    boundaries INCLUDED, empty-after-trim input = 1 (Pattern.split
  *    on "" yields [""]). Counting runs of Java `\s` = [ \t\n\x0B\f\r]
  *    on the RAW bytes is exact: no Unicode character lowercases into
  *    ASCII whitespace, and ASCII bytes never occur inside multi-byte
  *    UTF-8 sequences.
  *  - n_stopwords replays the replace-length trick per needle:
  *    independent non-overlapping left-to-right scans of
  *    `' ' + lower(t) + ' '` for each `" w "` needle — the SAME
  *    `UTF8String.toLowerCase` the `lower` Column calls, so Unicode
  *    case folding is identical by construction; back-to-back
  *    occurrences sharing a delimiter space count ONCE per the
  *    replace semantics (" the the " → 1).
  *  - n_punct replays `regexp_count(t, "[.,!?;:]")` as a byte tally
  *    (single-char ASCII class; safe in UTF-8).
  *  - avg_word_len_x1000 replays
  *    `floor(cast(length(t) as double) * 1000 / greatest(n_words, 1))`
  *    in the same double arithmetic.
  *
  * Null input produces null (the Column chain's null propagation);
  * interpreted eval and codegen share the JVM methods. */
object QualityKernel {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** `size(split(trim(lower(t)), "\\s+"))` without the array. */
  def nWords(t: UTF8String): Long = {
    val n = t.numBytes()
    var lo = 0
    var hi = n
    while (lo < hi && t.getByte(lo) == ' ') lo += 1
    while (hi > lo && t.getByte(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return 1L // Pattern.split("", -1) == [""]
    var runs = 0L
    var i = lo
    var inRun = false
    while (i < hi) {
      val ws = isWs(t.getByte(i))
      if (ws && !inRun) runs += 1
      inRun = ws
      i += 1
    }
    runs + 1L
  }

  /** `regexp_count(t, "[.,!?;:]")` as a byte tally. */
  def nPunct(t: UTF8String): Long = {
    var c = 0L
    var i = 0
    val n = t.numBytes()
    while (i < n) {
      val b = t.getByte(i)
      if (b == '.' || b == ',' || b == '!' || b == '?' || b == ';' ||
        b == ':') c += 1
      i += 1
    }
    c
  }

  /** Σ over needles of the non-overlapping occurrence count of
    * `" needle "` in `' ' + lower(t) + ' '` — the replace-length
    * trick's number, needle by needle on the shared lowered bytes. */
  def nStopwords(t: UTF8String, needles: Array[Array[Byte]]): Long = {
    val low = t.toLowerCase
    val n = low.numBytes()
    val padded = new Array[Byte](n + 2)
    padded(0) = ' '
    var i = 0
    while (i < n) { padded(i + 1) = low.getByte(i); i += 1 }
    padded(n + 1) = ' '
    var total = 0L
    var w = 0
    while (w < needles.length) {
      val nd = needles(w)
      var from = 0
      val last = padded.length - nd.length
      while (from <= last) {
        var j = 0
        while (j < nd.length && padded(from + j) == nd(j)) j += 1
        if (j == nd.length) { total += 1L; from += nd.length }
        else from += 1
      }
      w += 1
    }
    total
  }

  /** floor(chars·1000 / max(words, 1)) in the Column chain's double
    * arithmetic. */
  def avgLenX1000(nChars: Long, words: Long): Long =
    math.floor(nChars.toDouble * 1000.0 /
      math.max(words, 1L).toDouble).toLong

  /** The q11/q52 keep law over the five stats. */
  def keep(t: UTF8String, needles: Array[Array[Byte]]): Boolean = {
    val words = nWords(t)
    if (words < 20L || words > 1000L) return false
    val avg = avgLenX1000(t.numChars().toLong, words)
    if (avg < 3000L || avg > 15000L) return false
    if (nPunct(t) * 5L > words) return false
    nStopwords(t, needles) * 20L >= words
  }

  /** (n_chars, n_words, n_punct, n_stopwords, avg_word_len_x1000). */
  def stats(t: UTF8String, needles: Array[Array[Byte]]): InternalRow = {
    val chars = t.numChars().toLong
    val words = nWords(t)
    InternalRow(chars, words, nPunct(t), nStopwords(t, needles),
      avgLenX1000(chars, words))
  }

  private[functions] def toNeedles(stopwords: Seq[String]): Array[Array[Byte]] =
    stopwords.map(w => (" " + w + " ")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
}

/** [[QualityKernel.keep]] as a codegen-friendly boolean predicate —
  * the capstone stage-1 filter. `stopwords` rides as a Seq so the
  * case-class equality stays structural (Catalyst canonicalization);
  * the needle byte arrays are built once per instance. */
case class QualityKeepExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "quality_keep"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  @transient private lazy val needles = QualityKernel.toNeedles(stopwords)

  override def nullSafeEval(input: Any): Any =
    QualityKernel.keep(input.asInstanceOf[UTF8String], needles)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val nRef = ctx.addReferenceObj("qgNeedles", needles, "byte[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.QualityKernel.keep($c, $nRef);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[QualityKernel.stats]] as one struct-producing expression — the
  * q29/q11/q52 report form. */
case class QualityStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "quality_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false),
    StructField("avg_word_len_x1000", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  @transient private lazy val needles = QualityKernel.toNeedles(stopwords)

  override def nullSafeEval(input: Any): Any =
    QualityKernel.stats(input.asInstanceOf[UTF8String], needles)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val nRef = ctx.addReferenceObj("qgNeedles", needles, "byte[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.QualityKernel.stats($c, $nRef);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `size(split(trim(lower(t)), "\\s+"))` as one byte scan — the
  * length-gate family's token count without materializing the token
  * array ([[QualityKernel.nWords]]'s contract). */
case class NTokensExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "n_tokens_fast"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    QualityKernel.nWords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.QualityKernel.nWords($c);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused sequential regex scrub — [[graft.ops.TextAnalysis.piiScrub]]
  * / `scrubText` in ONE expression: apply `patterns(i) →
  * replacements(i)` in order, each pass over the PREVIOUS pass's
  * output (the chained-`regexp_replace` law), and report the per-pass
  * match count (which replays `regexp_count` on that pass's input for
  * free — the count IS the number of replacements made).
  *
  * Why a kernel: the Column chain pays one UTF8String→String
  * conversion, one java.util.regex pass AND one full-copy rebuild per
  * pattern per row — plus, for q63's counts, a SECOND regex pass per
  * pattern (`regexp_count` over the same intermediate). Here the
  * string crosses the UTF8String boundary once each way, each count
  * rides its replace pass, and a pass that finds NO match (the common
  * case: most documents carry no PII) re-uses the input string with
  * zero copies. Same java.util.regex engine, same
  * `Matcher.appendReplacement` semantics (replacements carry no $/\
  * escapes), so output is byte-identical to the chain by
  * construction (spec-pinned, QualityKernelSpec).
  *
  * Output: struct(n_0 .. n_{k-1}: long, scrubbed: string). */
case class RegexScrubExpr(child: Expression, patterns: Seq[String],
                          replacements: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.length == replacements.length,
    "patterns and replacements must pair up")
  require(replacements.forall(r => !r.contains("$") && !r.contains("\\")),
    "replacement strings must be literal (no $ group refs or escapes)")

  override def prettyName: String = "regex_scrub"

  override def dataType: DataType = StructType(
    patterns.indices.map(i =>
      StructField(s"n_$i", LongType, nullable = false)) :+
      StructField("scrubbed", StringType, nullable = false))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  @transient private lazy val compiled =
    patterns.map(java.util.regex.Pattern.compile).toArray
  @transient private lazy val repl = replacements.toArray

  override def nullSafeEval(input: Any): Any =
    RegexScrubExpr.run(input.asInstanceOf[UTF8String], compiled, repl)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("scrubPatterns", compiled,
      "java.util.regex.Pattern[]")
    val rRef = ctx.addReferenceObj("scrubRepl", repl, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.RegexScrubExpr.run($c, $pRef, $rRef);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexScrubExpr {
  /** The shared eval/codegen kernel: sequential replaceAll with
    * per-pass match counts; a no-match pass costs one regex scan and
    * zero copies. */
  def run(t: UTF8String, patterns: Array[java.util.regex.Pattern],
          repl: Array[String]): InternalRow = {
    var s = t.toString
    val out = new Array[Any](patterns.length + 1)
    var i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(s)
      var c = 0L
      if (m.find()) {
        val sb = new java.lang.StringBuilder(s.length + 16)
        do { c += 1L; m.appendReplacement(sb, repl(i)) } while (m.find())
        m.appendTail(sb)
        s = sb.toString
      }
      out(i) = c
      i += 1
    }
    out(patterns.length) = UTF8String.fromString(s)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

object QualityFunctions {
  /** Column API for [[QualityKeepExpr]]. */
  def qualityKeep(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(QualityKeepExpr(
      ColumnBridge.expression(text), stopwords))

  /** Column API for [[QualityStatsExpr]]. */
  def qualityStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(QualityStatsExpr(
      ColumnBridge.expression(text), stopwords))

  /** Column API for [[NTokensExpr]]. */
  def nTokens(text: Column): Column =
    ColumnBridge.column(NTokensExpr(ColumnBridge.expression(text)))

  /** Column API for [[RegexScrubExpr]]. */
  def regexScrub(text: Column, patterns: Seq[String],
                 replacements: Seq[String]): Column =
    ColumnBridge.column(RegexScrubExpr(
      ColumnBridge.expression(text), patterns, replacements))
}
