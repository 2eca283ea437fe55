package graft.ops

import graft.SparkSpec

/** Round-17 single-pass vocab-cache twins: the `cachedDispatch` flag
  * on tfidfKeywords / clusterKeywords / referenceOverlapScore swaps
  * [[VocabJoin.join]] for [[VocabJoin.joinCached]] and MUST be
  * row-invisible — it only changes whether the vocabulary frame's
  * lineage re-runs per action. ProbeVocabCache measures the two at
  * sf0.1 (q91 ships cached, 1.22 → 0.85 s; q131/q136 measured a wash
  * and ship uncached); this spec pins that the flag can never change
  * a result, on both the shipped and the rejected settings, so the
  * probe's A/B and the gate stay comparable across rounds. */
class VocabJoinCachedSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the cat sat on the mat", "src0"),
    (1L, "the dog ate the cat food", "src1"),
    (2L, "a mat and a cat and a dog", "src0"),
    (3L, "the cat sat on the mat", "src1"),
    (4L, "entirely novel words here today", "src1"))
    .toDF("doc_id", "text", "source")

  test("cached and uncached dispatch twins are row-identical for " +
    "tfidfKeywords, clusterKeywords and referenceOverlapScore") {
    spark.sharedState.cacheManager.clearCache()
    val tfidf = Seq(true, false).map(c =>
      Retrieval.tfidfKeywordsDispatch(corpus, 2, c)
        .orderBy("doc_id", "rank").collect().toSeq)
    assert(tfidf.head === tfidf.last, "tfidfKeywords twins diverged")

    val clusters = Dedup.dupClusters(corpus, 0.8, bucketCap = Some(16))
    val ck = Seq(true, false).map(c =>
      Retrieval.clusterKeywordsDispatch(corpus, clusters, 2, c)
        .orderBy("cluster_root", "rank").collect().toSeq)
    assert(ck.head === ck.last, "clusterKeywords twins diverged")

    val ref = Seq(true, false).map(c =>
      TextAnalysis.referenceOverlapDispatch(corpus, "src0", 1, c)
        .orderBy("doc_id").collect().toSeq)
    assert(ref.head === ref.last, "referenceOverlapScore twins diverged")
    // the exact-duplicate pair (docs 0 and 3) must actually cluster,
    // or the clusterKeywords assertion above compared trivial input
    assert(clusters.filter($"cluster_root" =!= $"doc_id").count() > 0,
      "fixture regression: no non-trivial cluster in the corpus")
    spark.sharedState.cacheManager.clearCache()
  }

  test("the shipped q91 form serves the vocabulary from the cache " +
    "(InMemoryRelation in the executed plan)") {
    spark.sharedState.cacheManager.clearCache()
    val out = TextAnalysis.referenceOverlapScore(corpus, "src0", 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") ||
      plan.contains("InMemoryRelation"),
      s"expected the cached ref vocabulary in the serving plan:\n$plan")
    spark.sharedState.cacheManager.clearCache()
  }
}
