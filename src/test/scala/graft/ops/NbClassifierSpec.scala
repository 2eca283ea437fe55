package graft.ops

import graft.SparkSpec

/** [[TextAnalysis.nbLangClassifier]] — hand-worked integer-bits NB on
  * a corpus WITH lexical class signal (the driver corpus's lang labels
  * are independent of its text, so the gated q140 exercises mechanics;
  * this spec shows the classifier actually separates classes when the
  * evidence exists), plus the unseen-token tie-break and the
  * broadcast/shuffle join-branch equality. */
class NbClassifierSpec extends SparkSpec {

  private def corpus = {
    val sp = spark
    import sp.implicits._
    // train slice (doc_id % 10 = 7): one doc per class.
    //   class aa: "xx xx xx"; class bb: "yy yy yy"
    // model: N = 2, n_c = 1 → prior = ⌊log2(2)⌋ = 1 for both;
    //   V = 2, T_c = 3 → bits(seen) = ⌊log2(5 div 4)⌋ = 0,
    //   default = ⌊log2(5)⌋ = 2
    Seq(
      (7L, "aa", "xx xx xx"),
      (17L, "bb", "yy yy yy"),
      (0L, "aa", "xx xx"),   // aa: 1+0+0 = 1 beats bb: 1+2+2 = 5
      (1L, "bb", "yy"),      // bb: 1+0 = 1 beats aa: 1+2 = 3
      (2L, "bb", "zz"))      // unseen token: 3 = 3 tie → 'aa' wins
      .toDF("doc_id", "lang", "text")
  }

  test("hand-worked scores: seen evidence wins, unseen-token ties go " +
    "to the lexicographically smallest class, correctness flags") {
    val got = TextAnalysis.nbLangClassifier(corpus)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got === Seq(
      (0L, "aa", "aa", 1L, true),
      (1L, "bb", "bb", 1L, true),
      (2L, "bb", "aa", 3L, false)))
  }

  test("a NULL-lang train doc is excluded from the class set (a NULL " +
    "class would tie-break NULLS FIRST in Spark and NULLS LAST in the " +
    "DuckDB oracle)") {
    val sp = spark
    import sp.implicits._
    // the NULL-lang train doc shares doc 2's unseen token 'zz': were a
    // NULL class trained, it would score 'zz' as SEEN and win doc 2
    val withNull = corpus.union(
      Seq((27L, Option.empty[String], Option("zz zz"))).toDF(
        "doc_id", "lang", "text"))
    val got = TextAnalysis.nbLangClassifier(withNull)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getString(2)))
    // same predictions as the null-free corpus; no NULL class anywhere
    assert(got === Seq((0L, "aa"), (1L, "bb"), (2L, "aa")))
  }

  test("forced shuffle-hash vocabulary branch produces the identical " +
    "result (the VocabJoin dispatch contract)") {
    val broadcastRows = spark.conf
      .getOption("graft.vocab.broadcastMaxRows")
    try {
      val a = TextAnalysis.nbLangClassifier(corpus)
        .orderBy("doc_id").collect().toSeq.map(_.toString)
      spark.conf.set("graft.vocab.broadcastMaxRows", "0")
      val b = TextAnalysis.nbLangClassifier(corpus)
        .orderBy("doc_id").collect().toSeq.map(_.toString)
      assert(a === b)
    } finally {
      broadcastRows match {
        case Some(v) => spark.conf.set("graft.vocab.broadcastMaxRows", v)
        case None => spark.conf.unset("graft.vocab.broadcastMaxRows")
      }
    }
  }
}
