package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Hashing.tokens

/** Distributed BPE (byte-pair-encoding) merge training — the
  * tokenizer-training stage of a pretraining pipeline (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"; the word-level trainer GPT-2/SentencePiece
  * descend from).
  *
  * The classic algorithm: collapse the corpus to a word vocabulary
  * {word → count}; represent each word as a character-symbol
  * sequence; repeatedly (a) count adjacent symbol pairs weighted by
  * word count, (b) merge the most frequent pair into one symbol
  * everywhere. The learned merge list IS the tokenizer.
  *
  * Distributed shape — the key fact is that after the first pass the
  * working set is the VOCABULARY, not the corpus:
  *  - one corpus pass + one shuffle builds {word → count} with
  *    map-side combine (the q30 token-count shape); at 100 TB the
  *    corpus is read once, ever;
  *  - each merge step is a pair-explode + sum aggregate over the
  *    (cached) vocabulary — millions of rows, not corpus rows — and a
  *    distributed TakeOrdered(1) for the argmax: the only thing the
  *    driver ever holds is ONE (pair, count) row per step, which is
  *    bounded state exactly like a real BPE trainer's merge list;
  *  - the merge rewrite is a literal string replace on the spaced
  *    symbol encoding (below) — a map-only projection, no shuffle.
  *
  * Symbol encoding and determinism (oracle-replayable): a word's
  * symbol sequence is kept as the string " c h a r s " (symbols
  * space-joined, one leading/trailing space). Merging pair (a, b)
  * is `replace(s, " a b ", " ab ")` applied TWICE ([[mergePair]]) —
  * both Spark and DuckDB replace literal occurrences left-to-right
  * without overlap, which handles overlapping repeats greedily
  * ("a a a" → "aa a", not "a aa") but misses the second of two
  * back-to-back DISJOINT occurrences (the shared delimiter space:
  * " a b a b " → " ab a b "); the second pass provably reaches the
  * greedy fixpoint (see [[mergePair]]), so the rewrite is exact
  * greedy BPE per Sennrich et al. Pair counts weight every adjacent
  * occurrence (the classic count; the count/merge overlap mismatch
  * is part of the original algorithm). Argmax tie-break: highest
  * total, then lexicographically smallest pair — a total order, so
  * the merge sequence is unique. Symbols never contain spaces (they
  * are concatenations of non-space characters), so the spaced
  * encoding is unambiguous.
  */
object Bpe {

  /** {word → count} over the corpus, empty tokens dropped. */
  def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** The spaced character-symbol encoding of a word:
    * "abc" → " a b c ". */
  private[ops] def spacedChars(w: Column): Column =
    concat(lit(" "),
      concat_ws(" ", transform(sequence(lit(1), length(w)),
        i => w.substr(i, lit(1)))),
      lit(" "))

  /** Adjacent symbol pairs of a spaced encoding, as "a b" strings —
    * one entry per occurrence (overlaps counted, the classic BPE
    * statistic). Empty for single-symbol words. */
  private[ops] def adjacentPairs(s: Column): Column = {
    val syms = split(trim(s), " ")
    when(size(syms) > 1,
      transform(sequence(lit(1), size(syms) - 1),
        j => concat(element_at(syms, j), lit(" "),
          element_at(syms, j + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** One BPE merge of pair (a, b) applied to a spaced encoding at the
    * greedy-left-to-right FIXPOINT. A single literal `replace` scans
    * its input, so of two back-to-back disjoint occurrences only the
    * first matches — the match consumes the delimiter space the
    * second needs (" a b a b " → " ab a b ", where reference BPE
    * yields " ab ab "). Two passes are always enough: (1) a skipped
    * occurrence regains its leading space in the output, because the
    * replacement " ab " ends with one; (2) two skipped occurrences
    * are never adjacent — a skipped occurrence's intact trailing
    * space gives the NEXT occurrence its leading space, so that one
    * matches; (3) merging (a, b) can never create a new " a b "
    * occurrence, since the fused symbol "ab" differs from both "a"
    * and "b" and carries no internal space. Hence after pass one all
    * survivors sit space-isolated, pass two merges them all, and the
    * result is the exact greedy merge of Sennrich et al.'s trainer.
    * DuckDB's `replace` has the same non-overlapping left-to-right
    * scan, so the oracle nests the same two calls. */
  private[ops] def mergePair(s: Column, a: String, b: String): Column = {
    def once(c: Column): Column =
      call_function("replace", c, lit(s" $a $b "), lit(s" $a$b "))
    once(once(s))
  }

  /** Apply a trained merge list to the corpus and count subwords per
    * document — the tokenizer APPLIED, closing the train→tokenize
    * loop (and the number a data pipeline actually bills by: tokens
    * under the learned vocabulary, not whitespace words).
    *
    * The merges are a driver-held Seq of "a b" pairs in training
    * order — bounded state (the merge list IS the tokenizer; real
    * vocabularies are ~30k entries). Applying them is a fold of
    * literal replaces over the VOCABULARY's spaced encodings (the
    * same fixpoint [[mergePair]] semantics as training — one map-only
    * projection with 2·steps replaces fused by codegen), after which
    * each word's subword count joins back to the corpus word stream
    * and sums per document. Two exchanges total at any corpus size:
    * the vocab groupBy and the per-doc sum; the merge application
    * itself never touches corpus rows.
    *
    * Output: (doc_id, n_words, n_subwords) — wordless docs at (0, 0). */
  def subwordCounts(docs: DataFrame, merges: Seq[String]): DataFrame = {
    val vocab = wordVocab(docs)
    val merged = merges.foldLeft(spacedChars(col("w"))) { (s, pair) =>
      val Array(a, b) = pair.split(" ", 2)
      mergePair(s, a, b)
    }
    val vmap = vocab.select(col("w"),
      size(split(trim(merged), " ")).cast("long").as("n_sub"))
    // one null sentinel word per doc (the q91 trick): every doc is
    // present in the per-doc aggregate — count(w) skips the sentinel
    // and a null w matches nothing in the vocab join — so no
    // corpus-sized join-back of the doc list is needed. Exchanges:
    // the vocab-keyed word join and the per-doc sum, nothing else.
    val dw = docs.select(col("doc_id"),
      explode(concat(
        filter(coalesce(tokens(col("text")),
          array().cast("array<string>")), _ =!= ""),
        array(lit(null).cast("string")))).as("w"))
    dw.join(vmap, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(col("w")).as("n_words"),
        coalesce(sum(col("n_sub")), lit(0L)).as("n_subwords"))
      .select("doc_id", "n_words", "n_subwords")
  }

  /** Train `steps` merges over the corpus's word vocabulary.
    * Returns the merge table: (step 1-based, pair "a b", total
    * weighted count) — the trained artifact, in merge order. Stops
    * early if no pair remains (tiny corpora).
    *
    * Step-count honesty: each merge is one distributed aggregate over
    * the cached vocabulary — ~1.5 s of fixed job overhead per step at
    * local[32] (ProbeText). Fine for the tens-to-hundreds of merges
    * the oracle-checked q92 exercises; a production 30k-merge
    * vocabulary wants the standard batching refinement (apply the
    * top-B pairwise-DISJOINT pairs per round — symbols untouched by
    * one accepted merge cannot have their counts invalidated by it),
    * which cuts rounds ~B-fold at slightly different (documented,
    * still deterministic) greedy semantics. The per-step DATA cost is
    * already vocabulary-bounded either way; it is only the scheduler
    * round-trips that batching amortizes. */
  def trainMerges(docs: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = wordVocab(docs)
      .select(spacedChars(col("w")).as("s"), col("cnt"))
    vocab.cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val best = vocab
        .select(explode(adjacentPairs(col("s"))).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("pair")).limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getString(0)
        val total = best(0).getLong(1)
        merges += ((step, pair, total))
        val Array(a, b) = pair.split(" ", 2)
        val next = vocab.select(
          mergePair(col("s"), a, b).as("s"), col("cnt"))
        next.cache()
        next.count() // materialize before dropping the parent cache
        vocab.unpersist()
        vocab = next
        step += 1
      }
    }
    vocab.unpersist()
    merges.toSeq.toDF("step", "pair", "total")
      .select(col("step").cast("int").as("step"), col("pair"),
        col("total").cast("long").as("total"))
  }
}
