package graft.ops

import graft.SparkSpec

/** Hand-computed fixed-point BM25 and collocation-lift values — the
  * same arithmetic the q110/q111 oracles replay, verified here
  * against by-hand integer evaluation so a regression is localized
  * to the operator, not discovered as an opaque oracle hash miss. */
class RetrievalSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def docs(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // Corpus: N = 4, Σdl = 10, avgdl_x1000 = 2500.
  //   idf_x1M at df = 2: (10^6·(8−4+1)) div 5 = 1,000,000
  //   tfn_x1M(tf, dl) = (5.5·10^10·tf) div (25000·tf + 7500 + 9000·dl)
  private val corpus = Seq(
    0L -> "apple banana apple",
    1L -> "apple cherry",
    2L -> "banana banana banana cherry",
    3L -> "durian")

  test("clusterKeywords: cluster-specific terms outrank the token " +
    "shared by every cluster; idf counts CLUSTERS (incl. token-less " +
    "singletons); ranks tie-break by token") {
    val sp = spark
    import sp.implicits._
    // clusters: {0,1} (root 0), {2} (root 2), {3} (root 3, null text).
    // 'common' appears in both token-bearing clusters (df=2);
    // cluster terms appear in one (df=1). N = 3 clusters.
    val d = docs(
      0L -> "alpha alpha common",
      1L -> "alpha beta",
      2L -> "gamma gamma common",
      3L -> null.asInstanceOf[String])
    val cl = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 3L))
      .toDF("doc_id", "cluster_root")
    val got = Retrieval.clusterKeywords(d, cl, m = 2)
      .orderBy("cluster_root", "rank").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // idf_x1M: df=1 → (10^6·(6−2+1)) div 3 = 1,666,666; df=2 →
    // (10^6·(6−4+1)) div 5 = 600,000
    assert(got === Seq(
      (0L, 1L, "alpha", 3L, 3L * 1666666L),
      (0L, 2L, "beta", 1L, 1666666L),
      (2L, 1L, "gamma", 2L, 2L * 1666666L),
      (2L, 2L, "common", 1L, 600000L)))
    // the null-text cluster labels nothing but still counts in N —
    // the same all-docs convention q131 uses
    assert(!got.exists(_._1 == 3L))
  }

  test("bm25TopK matches the by-hand fixed-point arithmetic") {
    val out = Retrieval.bm25TopK(docs(corpus: _*),
      Seq("apple", "cherry"), k = 3).collect()
    // d1: apple tf=1,dl=2 → 1,089,108; cherry same → 2,178,216 (2 terms)
    // d0: apple tf=2,dl=3 → 110e9 div 84500 = 1,301,775
    // d2: cherry tf=1,dl=4 → 55e9 div 68500 = 802,919
    assert(out.toSeq === Seq(
      Row(1L, 1L, 2L, 2178216L),
      Row(2L, 0L, 1L, 1301775L),
      Row(3L, 2L, 1L, 802919L)))
  }

  test("bm25TopK k truncates the ranking, ties broken by doc_id") {
    val out = Retrieval.bm25TopK(docs(corpus: _*),
      Seq("apple", "cherry"), k = 2).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 0L))
    // identical single-term docs score identically; doc_id breaks the tie
    val tie = Retrieval.bm25TopK(
      docs(7L -> "same text", 5L -> "same text"), Seq("same"), k = 2)
      .collect()
    assert(tie.map(_.getLong(1)).toSeq === Seq(5L, 7L))
    assert(tie.map(_.getLong(3)).distinct.length === 1)
  }

  test("bm25Scores omits documents matching no term") {
    val out = Retrieval.bm25Scores(docs(corpus: _*), Seq("durian"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(3L))
  }

  // Bigrams: (a,b)=3, (b,a)=1, (b,c)=1, (c,c)=1; W = 6; a=b=c=3.
  private val colloCorpus = Seq(
    0L -> "a b a b", 1L -> "a b c", 2L -> "c c")

  test("collocations matches the by-hand integer lift") {
    val out = TextAnalysis.collocations(docs(colloCorpus: _*),
      minCount = 2, k = 10).collect()
    // lift(a,b) = (10^6·3·6) div 9 = 2,000,000; only pair ≥ minCount
    assert(out.toSeq === Seq(Row(1L, "a", "b", 3L, 3L, 3L, 2000000L)))
  }

  test("hybridTopK: hand-worked RRF fusion — both-lists doc beats " +
    "either single-list doc, absent ranks carry 0, integer 10^6 div " +
    "(60 + rank) contributions") {
    val sp = spark
    import sp.implicits._
    // lexical side over `corpus` with terms = ["apple"]:
    //   doc0 (tf=2, dl=3): tfn = 1.1e11 div 84500 = 1,301,775 → rank 1
    //   doc1 (tf=1, dl=2): tfn = 5.5e10 div 50500 = 1,089,108 → rank 2
    // vector side from query vec 9 = [1, 0]:
    //   vec1 = [1, 0] → sim 1,000,000 → rank 1
    //   vec5 = [.6, .8] → sim 600,000 → rank 2
    // fused (rrfK = 60): doc1 both lists = 16129 + 16393 = 32522;
    // doc0 lex-only = 16393; doc5 vec-only = 16129.
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (5L, Seq(0.6f, 0.8f), 0),
      (9L, Seq(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Retrieval.hybridTopK(docs(corpus: _*), emb,
        Seq("apple"), queryVecId = 9L, nLex = 5, nVec = 5, k = 4)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got === Seq(
      (1L, 1L, 2L, 1L, 32522L),
      (2L, 0L, 1L, 0L, 16393L),
      (3L, 5L, 0L, 2L, 16129L)))
  }

  test("passageTopK: the term-dense chunk of a long doc outranks " +
    "diffuse matches, ids decompose, ties break on the composite id") {
    val sp = spark
    import sp.implicits._
    // width 4 / stride 2 over:
    //   doc 0 "x x x x apple apple" → chunks 0 (no hit), 1 (tf 1,
    //     dl 4), 2 (tf 2, dl 2 — the DENSE span)
    //   doc 1 "apple y y y" → chunk 0 (tf 1, dl 4), chunk 1 (no hit)
    // passage-level stats rank (0,2) first; (0,1) and (1,0) tie on
    // the identical (tf 1, dl 4) score and break on the composite id.
    val d = Seq(0L -> "x x x x apple apple", 1L -> "apple y y y")
      .toDF("doc_id", "text")
    val got = Retrieval.passageTopK(d, Seq("apple"), width = 4,
        stride = 2, k = 10).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(t => (t._1, t._2, t._3)) === Seq(
      (1L, 0L, 2L), (2L, 0L, 1L), (3L, 1L, 0L)))
    assert(got.forall(_._4 == 1L)) // n_terms
  }

  test("passageTopK: a doc spilling past idSpan chunks fails loudly " +
    "instead of aliasing into a wrong (doc_id, chunk_idx) pair") {
    val sp = spark
    import sp.implicits._
    // idSpan 2 with width 1 / stride 1 over a 3-token doc → chunk_idx
    // reaches 2 = idSpan: composite id 0·2+2 would alias to (1, 0)
    val d = Seq(0L -> "apple apple apple").toDF("doc_id", "text")
    val e = intercept[Exception] {
      Retrieval.passageTopK(d, Seq("apple"), width = 1, stride = 1,
        k = 10, idSpan = 2L).collect()
    }
    assert(e.getMessage.contains("composite id out of range"))
    // a doc_id past Long.MaxValue / idSpan trips the overflow arm
    val big = Seq((Long.MaxValue / 2L) -> "apple").toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      Retrieval.passageTopK(big, Seq("apple"), width = 1, stride = 1,
        k = 10, idSpan = 4L).collect()
    }
    assert(e2.getMessage.contains("composite id out of range"))
    // the in-range shape is untouched
    val ok = Retrieval.passageTopK(d, Seq("apple"), width = 1,
      stride = 1, k = 10, idSpan = 4L).collect()
    assert(ok.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 0L), (0L, 1L), (0L, 2L)))
  }

  test("collocations ranks ties lexicographically") {
    val out = TextAnalysis.collocations(docs(colloCorpus: _*),
      minCount = 1, k = 10).collect()
    assert(out.map(r => (r.getString(1), r.getString(2))).toSeq ===
      Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "c")))
    // the three singleton pairs share lift (10^6·6) div 9 = 666,666
    assert(out.drop(1).map(_.getLong(6)).distinct.toSeq === Seq(666666L))
  }

  test("collocations ignores sub-bigram docs") {
    val out = TextAnalysis.collocations(
      docs(0L -> "solo", 1L -> "x y"), minCount = 1, k = 10).collect()
    assert(out.toSeq === Seq(Row(1L, "x", "y", 1L, 1L, 1L, 1000000L)))
  }

  test("served postings index ≡ the scan path row-for-row, and the " +
    "query-time probe is bucket-pruned to the terms' buckets") {
    val wh = java.nio.file.Files
      .createTempDirectory("bm25idx").toString
    val d = docs(corpus: _*)
    val pt = Retrieval.buildPostingsIndex(d, wh, "postings",
      nBuckets = 4)
    val stats = spark.read.parquet(
      graft.engine.TableStore.tablePath(wh, "postings_stats"))
    val served = Retrieval.bm25TopKFromIndex(spark.table(pt), stats,
      Seq("apple", "cherry"), k = 3)
    val scan = Retrieval.bm25TopK(d, Seq("apple", "cherry"), k = 3)
    assert(served.orderBy("rank").collect().toSeq ===
      scan.orderBy("rank").collect().toSeq)
    // bucket pruning: the IN-predicate probe must select a strict
    // subset of the 4 buckets (terms hash into at most 2)
    val plan = served.queryExecution.executedPlan.toString
    val sel = """SelectedBucketsCount: (\d+) out of (\d+)""".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in plan:\n${plan.take(1500)}")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"probe read every bucket: ${sel.get.matched}")
    // and the 1-row stats artifact really carries the corpus stats
    // (raw totals + derived average: N = 4, Σdl = 10, avgdl = 2500)
    assert(stats.collect().toSeq === Seq(Row(4L, 10L, 2500L)))
  }

  test("absorb: grown postings index ≡ from-scratch index on the full " +
    "corpus, stats updated exactly from raw totals") {
    val wh = java.nio.file.Files
      .createTempDirectory("bm25absorb").toString
    val baseDocs = docs(corpus.take(2): _*)   // N=2, Σdl=5
    val deltaDocs = docs(corpus.drop(2): _*)  // N=2, Σdl=5
    val pt = Retrieval.buildPostingsIndex(baseDocs, wh, "p",
      nBuckets = 4)
    Retrieval.absorbIntoPostingsIndex(pt, wh, "p", deltaDocs)
    val stats = spark.read.parquet(
      graft.engine.TableStore.tablePath(wh, "p_stats"))
    assert(stats.collect().toSeq === Seq(Row(4L, 10L, 2500L)))
    // spark.table caches relation metadata per plan; re-resolve
    val grown = Retrieval.bm25TopKFromIndex(spark.table(pt), stats,
      Seq("apple", "cherry"), k = 3).orderBy("rank").collect().toSeq
    val scratch = Retrieval.bm25TopK(docs(corpus: _*),
      Seq("apple", "cherry"), k = 3).orderBy("rank").collect().toSeq
    assert(grown === scratch)
  }

  test("bm25TopKBatch: each per-query ranking equals the single-serve " +
    "path exactly, with overlapping term sets (the df double-count " +
    "trap)") {
    val wh = java.nio.file.Files
      .createTempDirectory("bm25batch").toString
    val d = docs(corpus: _*)
    val pt = Retrieval.buildPostingsIndex(d, wh, "p", nBuckets = 4)
    val stats = spark.read.parquet(
      graft.engine.TableStore.tablePath(wh, "p_stats"))
    // "apple" is shared by queries 0 and 1 — df must stay global
    val batch = Map(0L -> Seq("apple", "cherry"),
      1L -> Seq("apple", "banana"), 2L -> Seq("durian"))
    val got = Retrieval.bm25TopKBatch(spark.table(pt), stats, batch, 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val want = batch.toSeq.sortBy(_._1).flatMap { case (q, terms) =>
      Retrieval.bm25TopKFromIndex(spark.table(pt), stats, terms, 3)
        .orderBy("rank").collect()
        .map(r => (q, r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
    }
    assert(got.toSeq == want)
    intercept[IllegalArgumentException](
      Retrieval.bm25TopKBatch(spark.table(pt), stats, Map.empty, 3))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopKBatch(spark.table(pt), stats,
        Map(0L -> Seq.empty[String]), 3))
  }

  test("tfidfKeywords: hand-worked integer scores; rare terms beat " +
    "frequent ones; score ties break by token") {
    // df: apple 2, banana 2, cherry 2, durian 1 over N = 4
    //   idf(df=2) = (1e6·5)//5 = 1,000,000; idf(df=1) = 7e6//3 = 2,333,333
    val out = Retrieval.tfidfKeywords(docs(corpus: _*), m = 3)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, "apple", 2L, 2000000L), (0L, 2L, "banana", 1L, 1000000L),
      (1L, 1L, "apple", 1L, 1000000L), (1L, 2L, "cherry", 1L, 1000000L),
      (2L, 1L, "banana", 3L, 3000000L), (2L, 2L, "cherry", 1L, 1000000L),
      (3L, 1L, "durian", 1L, 2333333L)))
    intercept[IllegalArgumentException](
      Retrieval.tfidfKeywords(docs(corpus: _*), m = 0))
  }

  test("phrase search from the positional index: hand-worked counts, " +
    "overlapping self-runs included, 3-term phrases, absent terms") {
    val wh = java.nio.file.Files
      .createTempDirectory("phraseidx").toString
    val d = docs(
      0L -> "big data big data big",   // "big data" at 1,3 → 2
      1L -> "data big data",           // "big data" at 2 → 1
      2L -> "big big big",             // self-run "big big": pos 1,2 → 2
      3L -> "no match here")
    val pt = Retrieval.buildPositionalIndex(d, wh, "pos", nBuckets = 2)
    def count(phrase: Seq[String]) =
      Retrieval.phraseCountFromIndex(spark.table(pt), phrase)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(count(Seq("big", "data")) == Seq((0L, 2L), (1L, 1L)))
    // overlapping occurrences count (position-join semantics)
    assert(count(Seq("big", "big")) == Seq((2L, 2L)))
    assert(count(Seq("big", "data", "big")) == Seq((0L, 2L)))
    assert(count(Seq("zz", "big")).isEmpty)
    intercept[IllegalArgumentException](
      Retrieval.phraseCountFromIndex(spark.table(pt), Seq("solo")))
  }

  test("compact: merges the absorb-appended file sets back to one " +
    "file set, serve results bit-identical before and after") {
    val wh = java.nio.file.Files
      .createTempDirectory("bm25compact").toString
    val pt = Retrieval.buildPostingsIndex(docs(corpus.take(2): _*),
      wh, "p", nBuckets = 2)
    Retrieval.absorbIntoPostingsIndex(pt, wh, "p",
      docs(corpus.slice(2, 3): _*))
    Retrieval.absorbIntoPostingsIndex(pt, wh, "p",
      docs(corpus.slice(3, 4): _*))
    def files = new java.io.File(
      graft.engine.TableStore.tablePath(wh, "p")).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val stats = spark.read.parquet(
      graft.engine.TableStore.tablePath(wh, "p_stats"))
    val before = Retrieval.bm25TopKFromIndex(spark.table(pt), stats,
      Seq("apple", "cherry"), k = 3).orderBy("rank").collect().toSeq
    val nBefore = files
    // storage-level guard: compaction must NOT materialize a second
    // copy of the (production: corpus-sized) index in the block store
    // — the rewrite reads a snapshotted file list by path instead.
    // cache entries and persisted RDDs are both zero after the call;
    // the pre-round-14 cache()+count() formulation fails this assert.
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val ct = Retrieval.compactPostingsIndex(spark, wh, "p", nBuckets = 2)
    assert(spark.sharedState.cacheManager.isEmpty,
      "compactPostingsIndex left a cached copy of the index")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "compactPostingsIndex left a persisted RDD")
    val nAfter = files
    assert(nAfter < nBefore,
      s"compaction did not shrink the file count: $nBefore -> $nAfter")
    val after = Retrieval.bm25TopKFromIndex(spark.table(ct), stats,
      Seq("apple", "cherry"), k = 3).orderBy("rank").collect().toSeq
    assert(after === before)
  }
}
