package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Measured evidence for the LSH band-width trade documented on
  * [[Similarity.nearDupPairs]]: narrow bands (the loose-threshold
  * parity configuration) admit most pairs as candidates, wide bands
  * (the production near-dup configuration) prune by orders of
  * magnitude — on the real embeddings table, not synthetic toys. */
class CandidatePruningSpec extends SparkSpec {

  test("8-bit bands prune candidates by >10x vs 2-bit bands on real embeddings") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    val sigs = Similarity
      .lshSignatures(emb, Similarity.hyperplanes(64, 64, 42L))
      .cache()
    val narrow = Similarity.bandCandidates(sigs, 64, 2).count()
    val wide = Similarity.bandCandidates(sigs, 64, 8).count()
    sigs.unpersist()
    // 2-bit bands at threshold 0.4: nearly everything is a candidate
    // (the honest parity-configuration cost) ...
    assert(narrow > allPairs / 2, s"narrow=$narrow of $allPairs")
    // ... while 8 bands of 8 bits keep random pairs (P ~ 1-(1-2^-8)^8
    // ~ 3%) out of the join. >10x is deliberately conservative so
    // embedding correlation can't flake the test.
    assert(wide * 10 < narrow,
      s"wide bands failed to prune: wide=$wide narrow=$narrow")
    assert(wide < allPairs / 10, s"wide=$wide of $allPairs")
  }

  test("blocked exact kernel returns the identical pair set as LSH+rerank " +
    "on real embeddings, for any block count") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaLsh = asSet(Similarity.nearDupPairsLsh(emb, 0.4))
    // nBlocks = 1 degenerates to a single all-pairs tile; 7 leaves some
    // tiles off-diagonal and some blocks uneven; 64 makes blocks tiny
    for (nb <- Seq(1, 7, 64)) {
      val viaBlocked = asSet(Similarity.allPairsBlocked(emb, 0.4, nb))
      assert(viaBlocked == viaLsh,
        s"nBlocks=$nb: blocked=${viaBlocked.size} lsh=${viaLsh.size}")
    }
    // every pair oriented and unique
    val pairs = Similarity.allPairsBlocked(emb, 0.4).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      pairs.length)
  }

  test("nearDupPairs dispatches: low threshold takes the blocked kernel " +
    "(no join anywhere), high threshold the LSH checkpoint path") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val lowPlan = Similarity.nearDupPairs(emb, 0.4)
      .queryExecution.optimizedPlan.toString
    assert(!lowPlan.contains("Join"), s"blocked path must not join:\n$lowPlan")
    // the blocked path is a lazy kernel over an ExternalRDD ...
    assert(lowPlan.contains("ExternalRDD"), lowPlan)
    // ... while the LSH path returns its eagerly-checkpointed edge set
    val highPlan = Similarity.nearDupPairs(emb, 0.9)
      .queryExecution.optimizedPlan.toString
    assert(highPlan.contains("LogicalRDD"), highPlan)
  }
}
