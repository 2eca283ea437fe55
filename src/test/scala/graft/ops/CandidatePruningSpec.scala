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

  test("bandCandidatesWords on a 2-word signature (q69's 128/16 config) " +
    "yields exactly the brute-force band-sharing pairs") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .limit(300)
    val planes = Similarity.hyperplanes(128, 64)
    val sigs = Similarity.lshSignatureWords(emb, planes).cache()
    val got = Similarity.bandCandidatesWords(sigs, 128, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force from the raw words: band j = bits [16j, 16j+16) of
    // word (16j)/64 — any shared (j, value) makes a candidate pair
    val words = sigs.select("vec_id", "sigw").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    def band(w: Seq[Long], j: Int): Long =
      (w(16 * j / 64) >>> (16 * j % 64)) & 0xffffL
    val expected = (for {
      (ia, wa) <- words; (ib, wb) <- words if ia < ib
      if (0 until 8).exists(j => band(wa, j) == band(wb, j))
    } yield (ia, ib)).toSet
    sigs.unpersist()
    assert(got == expected, s"got=${got.size} expected=${expected.size}")
    assert(expected.nonEmpty) // the check must actually see collisions
  }

  test("lshBandConfig embodies the sizing law: word-aligned bits ~ log2(n), " +
    "bands priced to the miss bound, moderate-sim pricing blows up loudly") {
    // bits tier boundaries
    assert(Similarity.lshBandConfig(256)._2 == 8)
    assert(Similarity.lshBandConfig(257)._2 == 16)
    assert(Similarity.lshBandConfig(1L << 16)._2 == 16)
    assert(Similarity.lshBandConfig((1L << 16) + 1)._2 == 32)
    assert(Similarity.lshBandConfig(1L << 40)._2 == 32)
    // the derived band count actually satisfies the miss bound, and
    // one band fewer would not — the count is minimal, not padded
    for (n <- Seq(2050L, 1L << 20, 1L << 30); miss <- Seq(1e-4, 1e-6)) {
      val (nPlanes, bits) = Similarity.lshBandConfig(n, 0.99, miss)
      val p = 1.0 - math.acos(0.99) / math.Pi
      val pBand = math.pow(p, bits)
      val nBands = nPlanes / bits
      assert(nPlanes % bits == 0)
      assert(math.pow(1 - pBand, nBands) <= miss)
      if (nBands > 4) assert(math.pow(1 - pBand, nBands - 1) > miss)
    }
    // the scaladoc's worked sizes
    assert(Similarity.lshBandConfig(1L << 12) == (240, 16))
    assert(Similarity.lshBandConfig(1L << 30) == (1152, 32))
    // pricing recall below the crossover is a contract violation, not
    // a thousand-band config
    intercept[IllegalArgumentException] {
      Similarity.lshBandConfig(1000, recallSim = 0.5)
    }
  }

  test("nearDupPairsLshAuto == the fixed-config path at the derived config, " +
    "and finds every planted 0.995 pair on the real corpus") {
    val emb = Similarity.plantNearDups(
      Tables(spark, "/root/testdata/sf0.01", "embeddings"), 50)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val auto = asSet(Similarity.nearDupPairsLshAuto(emb, 0.7))
    val (nPlanes, bits) = Similarity.lshBandConfig(emb.count())
    val explicitCfg = asSet(Similarity.nearDupPairsLsh(emb, 0.7, nPlanes, bits))
    assert(auto == explicitCfg)
    // at the auto config's miss bound (1e-4 priced at 0.99; plants sit
    // at ~0.995) all 50 plants must land
    assert(auto.size == 50, s"got ${auto.size} pairs")
  }

  test("auto path at the 8-bit tier (n <= 256), and hyperplanes are " +
    "prefix-stable across plane budgets (one seeded LCG stream fills " +
    "row-major) — the property that lets the q76 oracle serve both " +
    "tiers from one literal set") {
    val planes240 = Similarity.hyperplanes(240, 64)
    val planes64 = Similarity.hyperplanes(64, 64)
    assert(planes64.zip(planes240.take(64)).forall {
      case (a, b) => a.sameElements(b) })
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 150)
    val planted = Similarity.plantNearDups(emb, 50) // 150 + 50 clones = 200
    assert(Similarity.lshBitsForCorpus(planted.count()) == 8)
    assert(Similarity.lshBandConfig(200L) == (64, 8))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val auto = asSet(Similarity.nearDupPairsLshAuto(planted, 0.7))
    val explicitCfg = asSet(Similarity.nearDupPairsLsh(planted, 0.7, 64, 8))
    assert(auto == explicitCfg)
    assert(auto.size == 50, s"got ${auto.size} pairs")
  }

  test("the 32-bit tier EXECUTES: the (1152, 32) config the law " +
    "prescribes at 1e9 vectors runs end-to-end (18-word signatures, " +
    "32-bit band extraction) and recovers every plant with exact " +
    "precision") {
    // the tier can't be reached through the auto path at test scale
    // (it needs n > 2^16), so drive the fixed-config form with the
    // exact sizes lshBandConfig(2^30) derives — this is the one
    // config in the scaladoc's worked sizes that otherwise never runs
    assert(Similarity.lshBandConfig(1L << 30) == (1152, 32))
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 60)
    val planted = Similarity.plantNearDups(emb, 20)
    val got = Similarity.nearDupPairsLsh(planted, 0.7, 1152, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth from the exact blocked kernel at the same threshold
    // (nearDupPairs at 0.7 would dispatch to LSH — call it directly)
    val exact = Similarity.allPairsBlocked(planted, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "LSH emitted a pair the exact kernel denies")
    assert(got.size == 20, s"got ${got.size} of 20 plants")
    assert(got == exact)
  }

  test("plantNearDups: every planted clone pairs with its source through " +
    "the 8-bit-band LSH path at the 0.7 production threshold, at ~0.995 " +
    "cosine; the organic corpus contributes no pair") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val pairs = Similarity
      .nearDupPairsLsh(Similarity.plantNearDups(emb, 50), 0.7,
        bitsPerBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    // exactly the 50 plants: source i pairs clone i+off where off is
    // the data-derived max(vec_id)+1 (disjoint at any corpus size);
    // nothing else (organic near-dups top out near cos 0.6 < 0.7)
    val off = emb.agg(org.apache.spark.sql.functions.max("vec_id"))
      .head.getLong(0) + 1
    assert(pairs.map(p => (p._1, p._2)) ==
      (0L until 50L).map(i => (i, i + off)),
      s"got ${pairs.size} pairs: ${pairs.take(5)}")
    // a +0.1 single-element perturbation of a unit vector sits at
    // cos ~0.995 — well above threshold, so banding has huge margin
    assert(pairs.forall(_._3 >= 990000L), s"low sims: ${pairs.filter(_._3 < 990000L)}")
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

  test("dense triangular tile index bijects live tiles onto partitions: " +
    "every partition holds exactly one tile") {
    for (nB <- Seq(1, 2, 7, 16, 32)) {
      val nTiles = nB * (nB + 1) / 2
      val live = for (bi <- 0 until nB; bj <- bi until nB)
        yield Similarity.tileIndex(bi, bj, nB)
      // bijection [0, nTiles) — the sparse bi*nB+bj key this replaced
      // spanned [0, nB^2) and collided modulo nTiles
      assert(live.sorted == (0 until nTiles), s"nB=$nB: $live")
      // the inverse recovers the block pair
      for (bi <- 0 until nB; bj <- bi until nB)
        assert(Similarity.tileBlocks(Similarity.tileIndex(bi, bj, nB), nB)
          == (bi, bj), s"nB=$nB bi=$bi bj=$bj")
      // and HashPartitioner over the dense keys is one-tile-per-partition
      val part = new org.apache.spark.HashPartitioner(nTiles)
      val assigned = live.map(part.getPartition)
      assert(assigned.distinct.length == nTiles,
        s"nB=$nB: tiles stacked on a partition: $assigned")
    }
  }

  test("deriveNBlocks applies the two-blocks-fit-an-executor rule with " +
    "the local default as floor") {
    import Similarity.{deriveNBlocks, DefaultBlockBytes, MinBlocks}
    // tiny local corpora stay at the floor (round-4 plan shape unchanged)
    assert(deriveNBlocks(1L << 20) == MinBlocks)
    assert(deriveNBlocks(0L) == MinBlocks)
    // at scale the budget, not the floor, decides
    assert(deriveNBlocks(100L << 30) ==
      math.ceil((100L << 30).toDouble / DefaultBlockBytes).toInt)
    // exact multiples don't over-allocate
    assert(deriveNBlocks(DefaultBlockBytes * 64) == 64)
    assert(deriveNBlocks(DefaultBlockBytes * 64 + 1) == 65)
    // custom budget honored
    assert(deriveNBlocks(1000, targetBlockBytes = 100, floor = 2) == 10)
  }

  test("deriveNBlocks treats the stat-less sizeInBytes sentinel as unknown " +
    "and caps so nTiles always fits an Int") {
    import Similarity.{deriveNBlocks, MinBlocks, MaxBlocks, UnknownSizeThreshold}
    // Catalyst's no-stats sentinel (Long.MaxValue and nearby defaults)
    // must fall back to the floor, not saturate to Int.MaxValue
    assert(deriveNBlocks(Long.MaxValue) == MinBlocks)
    assert(deriveNBlocks(UnknownSizeThreshold) == MinBlocks)
    // a genuine-but-huge estimate below the sentinel threshold clamps to
    // the cap, keeping nB(nB+1)/2 inside Int for HashPartitioner
    val capped = deriveNBlocks(UnknownSizeThreshold - 1)
    assert(capped == MaxBlocks)
    assert(MaxBlocks.toLong * (MaxBlocks + 1) / 2 <= Int.MaxValue)
  }

  test("allPairsBlocked runs on a stats-less createDataFrame input " +
    "(regression: nBlocks saturated and HashPartitioner(negative) threw)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rdd = spark.sparkContext.parallelize(Seq(
      Row(0L, Seq(1.0f, 2.0f, 3.0f)),
      Row(1L, Seq(1.0f, 2.0f, 3.0f)),
      Row(2L, Seq(-3.0f, 1.0f, 0.5f))))
    val emb = spark.createDataFrame(rdd, schema)
    // the premise: this plan really does report the unknown-size sentinel
    val size = emb.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size >= BigInt(Similarity.UnknownSizeThreshold),
      s"expected a stat-less sentinel, got $size — pick a stat-less source")
    val pairs = Similarity.allPairsBlocked(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("zero-norm vectors join no pair in either branch (shared convention)") {
    import spark.implicits._
    // vec 0 and 1 are identical (cos 1), vec 2 is all-zero, vec 3 far
    val emb = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f), "a"),
      (1L, Array(1.0f, 2.0f, 3.0f), "b"),
      (2L, Array(0.0f, 0.0f, 0.0f), "z"),
      (3L, Array(-3.0f, 1.0f, 0.5f), "c")
    ).toDF("vec_id", "embedding", "label")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.allPairsBlocked(emb, 0.4, nBlocks = 3)
    val lsh = Similarity.nearDupPairsLsh(emb, 0.4, dim = 3)
    assert(!ids(blocked).contains(2L), "blocked kernel emitted a 0-norm pair")
    assert(!ids(lsh).contains(2L), "LSH path emitted a 0-norm pair")
    // identical-pair-set contract holds in the degenerate case too
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(asSet(blocked) == asSet(lsh))
    assert(asSet(blocked).map(p => (p._1, p._2)).contains((0L, 1L)))
  }

  test("nearDupPairs dispatches: low threshold takes the blocked kernel " +
    "(no join anywhere), high threshold the LSH materialized path") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val lowPlan = Similarity.nearDupPairs(emb, 0.4)
      .queryExecution.optimizedPlan.toString
    assert(!lowPlan.contains("Join"), s"blocked path must not join:\n$lowPlan")
    // the blocked path is a lazy kernel over an ExternalRDD ...
    assert(lowPlan.contains("ExternalRDD"), lowPlan)
    // ... while the LSH path returns its eagerly-materialized edge set
    // (cache + count — Checkpoints.materialize, not a checkpoint)
    val highPlan = Similarity.nearDupPairs(emb, 0.9)
      .queryExecution.optimizedPlan.toString
    assert(highPlan.contains("InMemoryRelation"), highPlan)
  }
}
