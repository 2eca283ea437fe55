package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed BPE merge training: hand-worked merge sequences,
  * the greedy left-to-right overlap rule, argmax tie-break, early
  * exhaustion, and the spaced-encoding helpers. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("hand-worked merge sequence with greedy overlap: 'aaa' merges " +
    "left-to-right, training stops when no pair remains") {
    // vocab: {aaa: 2, ab: 1}
    // step 1: pairs 'a a' x4 (two overlapping occurrences per 'aaa'),
    //         'a b' x1 -> merge 'a a'; greedy: ' a a a ' -> ' aa a '
    // step 2: pairs 'aa a' x2, 'a b' x1 -> merge 'aa a' -> ' aaa '
    // step 3: only 'a b' x1 remains -> merge it
    // step 4: no pairs anywhere -> early stop at 3 rows
    val got = Bpe.trainMerges(docs("aaa aaa ab"), steps = 5)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1, "a a", 4L),
      (2, "aa a", 2L),
      (3, "a b", 1L)))
  }

  test("argmax ties break on the lexicographically smaller pair") {
    // {ab: 2, cd: 2}: 'a b' and 'c d' both total 2 -> 'a b' first
    val got = Bpe.trainMerges(docs("ab cd", "ab cd"), steps = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "a b", 2L)))
  }

  test("word counts weight the pairs: a frequent word's pair beats a " +
    "longer rare word's") {
    // {to: 3, xyz: 1}: 't o' total 3 beats 'x y'/'y z' total 1
    val got = Bpe.trainMerges(docs("to to to xyz"), steps = 1)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("t o", 3L)))
  }

  test("subwordCounts: learned merges applied per word, summed per doc; " +
    "wordless docs at (0, 0)") {
    val d = docs("aaa aaa ab", "")
    // after 1 merge ('a a'): aaa -> [aa, a] (2 subwords), ab -> [a, b] (2)
    val one = Bpe.subwordCounts(d, Seq("a a")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(one.toSeq == Seq((0L, 3L, 6L), (1L, 0L, 0L)))
    // after the full 3-merge training both words are single subwords
    val merges = Bpe.trainMerges(d, steps = 5).orderBy("step")
      .collect().map(_.getString(1)).toSeq
    assert(merges == Seq("a a", "aa a", "a b"))
    val full = Bpe.subwordCounts(d, merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.toSeq == Seq((0L, 3L, 3L), (1L, 0L, 0L)))
  }

  test("back-to-back disjoint occurrences merge at the fixpoint: " +
    "'abab' -> [ab, ab], 'murmur' -> [mur, mur]") {
    // the string-replace bug this kernel replaced: " a b a b " ->
    // " ab a b " (the first match consumes the second's leading
    // delimiter space). The greedy token scan merges both:
    // reference BPE yields [ab, ab].
    val two = Bpe.subwordCounts(docs("abab"), Seq("a b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(two.toSeq == Seq((0L, 1L, 2L)))
    // three merges m u -> mu, mu r -> mur; "murmur" must land at
    // exactly [mur, mur] (2 subwords), not [mur, mu, r]
    val mur = Bpe.subwordCounts(docs("murmur"), Seq("m u", "mu r"))
      .collect().map(r => (r.getLong(2)))
    assert(mur.toSeq == Seq(2L))
    // and training sees the post-fixpoint pair statistics: after
    // merging 'a b' in {abab: 1}, the remaining pair is 'ab ab'
    // (count 1), NOT 'ab a'/'a b' from a half-merged encoding
    val got = Bpe.trainMerges(docs("abab"), steps = 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "a b", 2L), (2, "ab ab", 1L)))
  }

  test("a run of five alternating symbols merges everywhere: " +
    "'ababababab' -> [ab x5]") {
    val n = Bpe.subwordCounts(docs("ababababab"), Seq("a b"))
      .collect().map(_.getLong(2))
    assert(n.toSeq == Seq(5L))
  }

  test("self-pair runs pair greedily adjacent like reference BPE: " +
    "'aaaaa' -> [aa, aa, a], so the next merge is 'aa a' not 'a aa'") {
    // a delimiter-consuming string replace mispairs the run as
    // [aa, a, aa], whose pair stats then rank 'a aa' first — the
    // token-scan kernel must see [aa, aa, a] and rank 'aa a' first
    // (tie at total 1, lexicographic break)
    val got = Bpe.trainMerges(docs("aaaaa"), steps = 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "a a", 4L), (2, "aa a", 1L)))
    // and the applied tokenizer agrees: 5 chars -> 3 subwords after
    // merge one, 2 after both ([aaa, aa])
    assert(Bpe.subwordCounts(docs("aaaaa"), Seq("a a"))
      .collect().map(_.getLong(2)).toSeq == Seq(3L))
    assert(Bpe.subwordCounts(docs("aaaaa"), Seq("a a", "aa a"))
      .collect().map(_.getLong(2)).toSeq == Seq(2L))
  }

  test("batched training keeps the top pairwise-disjoint pairs per " +
    "round with pre-round counts, on a fixed round schedule") {
    // vocab {ab: 2, cd: 3, ef: 1}: pairs 'c d'(3) > 'a b'(2) > 'e f'(1)
    // steps=3 batch=2 -> rounds [cap 2, cap 1]:
    //   round 1 keeps 'c d' and 'a b' (disjoint), both at pre-round
    //   totals; round 2 keeps 'e f'
    val got = Bpe.trainMergesBatched(
        docs("ab ab cd cd cd ef"), steps = 3, batch = 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, 1, "c d", 3L),
      (2, 1, "a b", 2L),
      (3, 2, "e f", 1L)))
  }

  test("batched training skips a candidate sharing a symbol with a " +
    "better kept pair; a conflict-shrunk round does not backfill") {
    // vocab {aa: 1, ab: 1}: pairs 'a a'(1) and 'a b'(1) tie, 'a a'
    // wins the lexicographic break; 'a b' shares symbol a -> skipped.
    // steps=2 batch=2 is ONE round, so only one merge lands even
    // though 'a b' would have been mergeable in a later round.
    val got = Bpe.trainMergesBatched(docs("aa ab"), steps = 2, batch = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((1, 1, "a a")))
    // the same steps at batch=1 (strict schedule) merges both
    val strict = Bpe.trainMergesBatched(docs("aa ab"), steps = 2,
        batch = 1)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getString(2)))
    assert(strict.toSeq == Seq((1, "a a"), (2, "a b")))
  }

  test("batched selection blocks a candidate touching a kept pair's " +
    "FUSED symbol (the different-split hazard)") {
    // 'abc' can exist as a symbol from an earlier ('a','bc') merge
    // while ('ab','c') is merged NOW: keeping ('ab','c') creates new
    // 'abc' tokens mid-round, so ('abc','d') — string-disjoint from
    // {ab, c} — must NOT be kept at its pre-round count
    val kept = Bpe.selectDisjoint(Seq(
      ("ab c", 10L),   // keep: rank 1; closure {ab, c, abc}
      ("abc d", 8L),   // BLOCKED: touches the fused 'abc'
      ("x abc", 7L),   // BLOCKED: right symbol is fine, left... x free,
                       // but 'abc' on the right is fused — blocked
      ("x y", 6L),     // keep: fully disjoint; closure adds {x, y, xy}
      ("c d", 5L),     // BLOCKED: 'c' used by rank 1
      ("d e", 4L)      // keep: d and e untouched
    ), cap = 3)
    assert(kept == Seq(("ab c", 10L), ("x y", 6L), ("d e", 4L)))
    // cap truncates the walk even with eligible candidates left
    assert(Bpe.selectDisjoint(Seq(("a b", 3L), ("c d", 2L), ("e f", 1L)),
      cap = 2) == Seq(("a b", 3L), ("c d", 2L)))
  }

  test("conflict worst case: a hub corpus keeps exactly one merge per " +
    "round whatever the batch size (batched degrades to strict)") {
    // the word "abacadae" is a HUB: symbols a,b,a,c,a,d,a,e — every
    // adjacent pair contains "a", so the rank-1 keep's {a, x, ax}
    // closure blocks the entire candidate pool.
    //   round 1: all pairs tie at 5, "a b" wins lex, everything else
    //            shares "a" -> 1 kept (cap was 4)
    //   round 2: word is now ab,a,c,a,d,a,e — every pair STILL
    //            contains "a"; "a c" wins, rest blocked -> 1 kept
    // 8 requested steps at batch=4 deliver 2 merges in 2 rounds: the
    // documented no-backfill degradation, with the fixed schedule
    // intact (round numbers 1 and 2, not re-planned).
    val hub = docs(Seq.fill(5)("abacadae").mkString(" "))
    val got = Bpe.trainMergesBatched(hub, steps = 8, batch = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, 1, "a b", 5L),
      (2, 2, "a c", 5L)))
    // a deeper candidate pool cannot rescue the round: the closure
    // blocks every candidate it adds
    val deep = Bpe.trainMergesBatched(hub, steps = 8, batch = 4,
        candPool = 64)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(deep.toSeq == got.toSeq)
  }

  test("batched batch=1 reproduces the strict trainer's merge " +
    "sequence exactly") {
    val d = docs("aaa aaa ab", "to to to xyz")
    val strict = Bpe.trainMerges(d, steps = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val batched = Bpe.trainMergesBatched(d, steps = 4, batch = 1)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(2), r.getLong(3)))
    assert(batched.toSeq == strict.toSeq)
  }

  test("spacedChars and adjacentPairs helpers") {
    val df = Seq("abc", "x").toDF("w")
      .select(Bpe.spacedChars(col("w")).as("s"))
    val rows = df.select(col("s"), Bpe.adjacentPairs(col("s")).as("p"))
      .collect()
    assert(rows(0).getString(0) == " a b c ")
    assert(rows(0).getSeq[String](1) == Seq("a b", "b c"))
    assert(rows(1).getString(0) == " x ")
    assert(rows(1).getSeq[String](1) == Seq.empty)
  }
}
