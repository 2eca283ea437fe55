package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-phrase matcher (Aho & Corasick 1975) — the
  * blocklist/decontamination primitive: count occurrences of EVERY
  * phrase of a (possibly 10k-entry) phrase list in one pass over the
  * text. Neither of the Column-level formulations survives a real
  * blocklist: a single alternation regex of 10k literals is an NFA
  * with 10k-way branching per char (and Janino chokes long before the
  * pattern compiles), and a per-phrase `replace`/`contains` fold is
  * 10k full scans per row AND a 10k-deep expression tree that blows
  * the analyzer and the 64 KB generated-method limit — the same
  * failure shape the BPE merge fold had ([[BpeApplyExpr]] scaladoc).
  * Here the phrase list is DATA: the automaton rides into generated
  * code as one reference object, and the text is scanned once
  * whatever the phrase count.
  *
  * Match semantics, chosen to replay EXACTLY in the oracle: for each
  * phrase independently, LEFTMOST NON-OVERLAPPING occurrences in the
  * ASCII-casefolded text — precisely what the replace-length trick
  * `(len(s) - len(replace(s, p, ''))) / len(p)` counts over
  * `lower(text)` — summed across phrases (matches of DIFFERENT
  * phrases may overlap; each phrase is its own greedy scan). The
  * automaton reports all match ends in position order, so per-phrase
  * greedy = "count when start > last counted end", one int compare.
  * Dictionary-suffix links (not merged output lists, which go
  * quadratic on suffix-chain phrase sets) surface nested phrases —
  * "fast" inside "fast merge" — at output-sensitive cost.
  *
  * Case folding is ASCII A–Z only, applied to the INPUT bytes on the
  * fly (phrases are required ASCII and folded at build). Non-ASCII
  * input bytes walk the failure function like any non-matching byte;
  * since every phrase byte is ASCII, unicode text cannot create or
  * destroy matches — so for match COUNTS the only divergence class
  * vs the oracle's `lower()` is the same two Java/ICU case-folding
  * exotics (İ, K) named in [[NormalizeTextExpr]]'s scaladoc. The
  * SCRUBBED STRING is a stronger claim: this kernel passes cased
  * non-ASCII bytes through unchanged ('Ü' stays 'Ü') while an oracle
  * chained over `lower(text)` folds them ('ü'), so string-level
  * oracle parity additionally requires text free of cased non-ASCII
  * characters — the q121/q129 corpora satisfy this (all-ASCII), and
  * [[MultiMatchScrubExpr]]'s scaladoc pins the precondition.
  *
  * Scale: a pure projection — zero shuffles at any corpus size; the
  * automaton is built once per executor (transient-lazy) and shared
  * across rows; per-row scratch is thread-local (tasks share the
  * plan's reference object across threads).
  */
final class AhoCorasick private (
    val nPhrases: Int,
    phraseLens: Array[Int],
    keys: Array[Int], vals: Array[Int], mask: Int,
    fail: Array[Int], dictLink: Array[Int], phraseAt: Array[Int])
    extends Serializable {

  // per-thread scratch: lastEnd per phrase, epoch-stamped so reset is
  // O(1) per row instead of O(nPhrases)
  @transient private lazy val scratch =
    new ThreadLocal[AhoCorasick.Scratch] {
      override def initialValue(): AhoCorasick.Scratch =
        new AhoCorasick.Scratch(new Array[Int](nPhrases),
          new Array[Long](nPhrases))
    }

  private def lookup(state: Int, b: Int): Int = {
    val key = (state << 8) | b
    var i = (key * 0x9E3779B1) & mask
    while (true) {
      val k = keys(i)
      if (k == key) return vals(i)
      if (k == -1) return -1
      i = (i + 1) & mask
    }
    -1 // unreachable
  }

  private def step(state0: Int, b: Int): Int = {
    var state = state0
    while (true) {
      val g = lookup(state, b)
      if (g >= 0) return g
      if (state == 0) return 0
      state = fail(state)
    }
    0 // unreachable
  }

  /** Σ over phrases of leftmost-non-overlapping occurrence counts in
    * the ASCII-casefolded bytes of `s`. */
  def countHits(s: UTF8String): Long = {
    val bytes = s.getBytes
    val sc = scratch.get()
    sc.epoch += 1
    val epoch = sc.epoch
    var st = 0
    var count = 0L
    var i = 0
    while (i < bytes.length) {
      var b = bytes(i) & 0xFF
      if (b >= 'A' && b <= 'Z') b += 32
      st = step(st, b)
      var v = if (phraseAt(st) >= 0) st else dictLink(st)
      while (v >= 0) {
        val pid = phraseAt(v)
        val start = i - phraseLens(pid) + 1
        if (sc.stamp(pid) != epoch || start > sc.lastEnd(pid)) {
          count += 1
          sc.lastEnd(pid) = i
          sc.stamp(pid) = epoch
        }
        v = dictLink(v)
      }
      i += 1
    }
    count
  }

  // scrub scratch: a growable candidate buffer and an epoch-stamped
  // masked-byte map, both reused across rows without clearing
  @transient private lazy val scrubScratch =
    new ThreadLocal[AhoCorasick.ScrubScratch] {
      override def initialValue(): AhoCorasick.ScrubScratch =
        new AhoCorasick.ScrubScratch
    }

  /** Sequential-priority scrub — the semantics of the nested
    * length-preserving replace chain
    * `replace(…replace(lower(text), p₁, mask^|p₁|)…, pₖ, mask^|pₖ|)`
    * with phrases in LIST order, computed in ONE automaton pass:
    *
    * collect every (phrase, start) occurrence in the casefolded
    * bytes, sort by (priority, start), then accept a candidate iff
    * none of its bytes is already masked, masking on accept. That
    * byte test alone reproduces BOTH chain effects — an earlier
    * phrase's mask hides any overlapping later-phrase occurrence
    * (the masked text simply no longer contains it, and since the
    * mask byte appears in no phrase, masking can never CREATE an
    * occurrence), and same-phrase greedy non-overlap falls out
    * because an accepted span's own bytes are masked before the next
    * same-phrase candidate (processed in start order) is examined.
    * Candidates overlapping a REJECTED candidate stay eligible,
    * exactly as `replace`'s resumed scan would find them.
    *
    * Returns (scrubbed, n_spans, n_bytes) as an [[InternalRow]]:
    * the ASCII-casefolded text with accepted spans overwritten by
    * `mask`, the accepted-span count, and the total masked bytes.
    * Cost is one text scan plus output-sensitive resolution work
    * (sort + one byte test per candidate byte). */
  def scrubRow(s: UTF8String, mask: Byte): InternalRow = {
    val src = s.getBytes
    // own copy: getBytes may alias the UnsafeRow buffer, and we fold
    // + mask in place
    val bytes = java.util.Arrays.copyOf(src, src.length)
    val sc = scrubScratch.get()
    var nc = 0
    var st = 0
    var i = 0
    while (i < bytes.length) {
      var b = bytes(i) & 0xFF
      if (b >= 'A' && b <= 'Z') { b += 32; bytes(i) = b.toByte }
      st = step(st, b)
      var v = if (phraseAt(st) >= 0) st else dictLink(st)
      while (v >= 0) {
        val pid = phraseAt(v)
        sc.addCand(nc, pid.toLong << 32 | (i - phraseLens(pid) + 1).toLong)
        nc += 1
        v = dictLink(v)
      }
      i += 1
    }
    java.util.Arrays.sort(sc.cand, 0, nc)
    val masked = sc.ensureMasked(bytes.length)
    sc.epoch += 1
    val epoch = sc.epoch
    var spans = 0L
    var nBytes = 0L
    var j = 0
    while (j < nc) {
      val packed = sc.cand(j)
      val pid = (packed >>> 32).toInt
      val start = (packed & 0xFFFFFFFFL).toInt
      val end = start + phraseLens(pid)
      var k = start
      var free = true
      while (free && k < end) {
        if (masked(k) == epoch) free = false
        k += 1
      }
      if (free) {
        k = start
        while (k < end) {
          masked(k) = epoch
          bytes(k) = mask
          k += 1
        }
        spans += 1
        nBytes += phraseLens(pid)
      }
      j += 1
    }
    new GenericInternalRow(
      Array[Any](UTF8String.fromBytes(bytes), spans, nBytes))
  }
}

object AhoCorasick {
  private[functions] final class Scratch(val lastEnd: Array[Int],
                                         val stamp: Array[Long]) {
    var epoch: Long = 0L
  }

  private[functions] final class ScrubScratch {
    var cand: Array[Long] = new Array[Long](64)
    private var masked: Array[Long] = new Array[Long](256)
    var epoch: Long = 0L
    def addCand(n: Int, packed: Long): Unit = {
      if (n == cand.length)
        cand = java.util.Arrays.copyOf(cand, cand.length * 2)
      cand(n) = packed
    }
    def ensureMasked(len: Int): Array[Long] = {
      if (masked.length < len) {
        masked = new Array[Long](
          java.lang.Integer.highestOneBit(math.max(len - 1, 1)) * 2)
        epoch += 1 // fresh array is all-zero; keep stamps unambiguous
      }
      masked
    }
  }

  /** Build from distinct, non-empty, ASCII phrases (folded to
    * lowercase here — the matcher is case-insensitive). */
  def build(phrases: Seq[String]): AhoCorasick = {
    require(phrases.nonEmpty, "need at least one phrase")
    val folded = phrases.map { p =>
      require(p.nonEmpty, "empty phrase")
      require(p.forall(_ < 128), s"non-ASCII phrase '$p'")
      p.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
    }
    require(folded.distinct.size == folded.size,
      "duplicate phrases (after case folding) — each would be " +
        "counted once but the per-phrase oracle sum counts it twice")
    // trie with per-node hash children (build-time only)
    val children =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Integer, Integer]())
    val phraseAtB = scala.collection.mutable.ArrayBuffer(-1)
    folded.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { ch =>
        val b = ch.toInt
        val nxt = children(node).get(b)
        node = if (nxt != null) nxt.intValue()
        else {
          children += new java.util.HashMap[Integer, Integer]()
          phraseAtB += -1
          val id = children.size - 1
          children(node).put(b, id)
          id
        }
      }
      phraseAtB(node) = pid
    }
    val n = children.size
    // the flat edge table packs (state << 8) | byte into one Int —
    // injective only while state < 2^24; past that two states would
    // silently share a key and the automaton would mis-transition
    require(n < (1 << 24),
      s"blocklist trie has $n nodes; the packed edge-table key " +
        "supports < 2^24 — split the phrase set across expressions")
    val fail = new Array[Int](n)
    val dictLink = Array.fill(n)(-1)
    val phraseAt = phraseAtB.toArray
    // BFS failure links
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, v) => queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      dictLink(u) =
        if (phraseAt(fail(u)) >= 0) fail(u) else dictLink(fail(u))
      children(u).forEach { (b, v) =>
        // fail(v): the deepest proper suffix of v's string that is a
        // trie node — follow u's fail chain until a b-transition or
        // the root. (f walks strictly shallower nodes, so it can
        // never rediscover v itself.)
        var f = fail(u)
        var set = false
        while (!set) {
          val g = children(f).get(b)
          if (g != null) { fail(v) = g.intValue(); set = true }
          else if (f == 0) { fail(v) = 0; set = true }
          else f = fail(f)
        }
        queue.add(v)
      }
    }
    // flatten edges into one open-addressed table
    var edges = 0
    children.foreach(m => edges += m.size())
    var cap = java.lang.Integer.highestOneBit(
      math.max(16, edges * 2 - 1)) * 2
    val keys = Array.fill(cap)(-1)
    val vals = new Array[Int](cap)
    val mask = cap - 1
    var s0 = 0
    while (s0 < n) {
      children(s0).forEach { (b, v) =>
        val key = (s0 << 8) | b.intValue()
        var i = (key * 0x9E3779B1) & mask
        while (keys(i) != -1) i = (i + 1) & mask
        keys(i) = key
        vals(i) = v.intValue()
      }
      s0 += 1
    }
    new AhoCorasick(folded.size, folded.map(_.length).toArray,
      keys, vals, mask, fail, dictLink, phraseAt)
  }
}

/** Long count of blocklist hits — see [[AhoCorasick]] for semantics
  * and the scale argument. Carries `phrases: Seq[String]` (structural
  * equals/hashCode for Catalyst canonicalization — the
  * [[BpeApplyExpr]] lesson); the built automaton rides into generated
  * code as one reference object. */
case class MultiMatchCountExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "multi_match_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  @transient private lazy val ac = AhoCorasick.build(phrases)

  override def nullSafeEval(input: Any): Any =
    ac.countHits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("blocklistAc", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $acRef.countHits($c);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Blocklist scrub/redact — struct(scrubbed STRING, n_spans LONG,
  * n_bytes LONG). Semantics are the SEQUENTIAL replace chain (phrase
  * list order = priority: an earlier phrase's mask hides overlapping
  * later-phrase occurrences), length-preserving mask — chosen because
  * that is exactly what nested `replace(…, p, repeat(mask, len(p)))`
  * calls over `lower(text)` compute, so the whole scrubbed string
  * sits under the oracle hash gate as a chained-CTE replay. Computed
  * in ONE [[AhoCorasick]] pass + output-sensitive resolution
  * ([[AhoCorasick.scrubRow]] proves the equivalence) where the
  * replace chain itself is |phrases| full scans per row. The mask
  * char must appear in no phrase: `replace` RESCANS its output, and
  * only a phrase-free mask byte guarantees masking never creates an
  * occurrence — the property the one-pass resolution relies on.
  *
  * Oracle-parity precondition (STRING level): the kernel case-folds
  * ASCII A–Z only, so the scrubbed string matches the
  * `lower(text)`-chained oracle only on text with no cased
  * non-ASCII characters (a 'Ü' survives here, folds there). Match
  * positions/counts are unaffected — phrases are ASCII, so cased
  * non-ASCII bytes can never sit inside a match. */
case class MultiMatchScrubExpr(child: Expression, phrases: Seq[String],
                               mask: String)
    extends UnaryExpression {
  require(mask.length == 1 && mask.head < 128,
    s"mask must be one ASCII char, got '$mask'")
  require(phrases.forall(!_.contains(mask.head)),
    s"mask char '$mask' occurs in a phrase — the oracle's replace " +
      "chain rescans masked text, so masking could fabricate a match")

  override def prettyName: String = "multi_match_scrub"
  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType),
    StructField("n_spans", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  @transient private lazy val ac = AhoCorasick.build(phrases)

  override def nullSafeEval(input: Any): Any =
    ac.scrubRow(input.asInstanceOf[UTF8String], mask.head.toByte)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("scrubAc", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $acRef.scrubRow($c, (byte) ${mask.head.toInt});
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
