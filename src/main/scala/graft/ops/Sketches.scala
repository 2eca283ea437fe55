package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Hashing.{h60, h60b, tokens}

/** Bounded-state frequency sketching — the Count-Min Sketch (Cormode &
  * Muthukrishnan 2005) over the corpus token stream, the frequency-side
  * complement of the HLL cardinality row (q34): approximate per-token
  * counts from a d×w integer grid whose size is FIXED at any corpus
  * scale, where the exact vocabulary aggregate grows with Heaps' law.
  * In a training-data pipeline this is how a 100-TB pass tracks
  * heavy-hitter tokens/shingles (stop-shingle candidates, boilerplate
  * alarms) without carrying the vocabulary through an exchange.
  *
  * Determinism: row i's hash is (h60 + i·h60b) mod w — the Kirsch–
  * Mitzenmacher double-hashing family (2006: two base hashes derive
  * all d rows without loss for Bloom/CMS-style structures), and the
  * house [[h60]]/[[h60b]] pair comes from ONE md5 digest (whole-stage
  * codegen subexpression-eliminates the shared digest), so the whole
  * grid costs one md5 per token instead of d salted ones — measured
  * 1.77 → 1.56 s on the sf0.1 gate query (the rest of its wall is
  * the exact-count accounting side and fixed costs, not the grid).
  * Engine-portable: the DuckDB
  * oracle rebuilds the sketch bit-for-bit; every count is an integer.
  * No overflow: h60 + i·h60b ≤ 2^60 + 15·2^60 &lt; 2^63. The CMS
  * guarantee (estimate never underestimates; overestimate ≤ εN with
  * probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉) holds for ANY hash
  * family on the no-underestimate side — that invariant rides the
  * gated result as a hash-checked boolean column.
  *
  * Plan shape: one corpus-sized explode feeding a (row, bucket) count
  * aggregate that map-side-combines into ≤ d·w cells per task — the
  * exchange after partial aggregation is bounded by partitions·d·w
  * rows REGARDLESS of corpus size (the whole point of a sketch);
  * estimates then probe the ≤ d·w-row sketch by broadcast.
  */
object Sketches {

  private def kmBucket(i: Int, c: org.apache.spark.sql.Column,
                       width: Int) =
    pmod(h60(c) + lit(i.toLong) * h60b(c), lit(width.toLong))

  /** The sketch itself: (row_i, bucket, cnt), ≤ depth·width rows.
    * Empty cells are absent (their count is 0). */
  def cmsSketch(docs: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    val tok = docs.select(explode(tokens(col("text"))).as("t"))
    val buckets = array((0 until depth).map(i =>
      kmBucket(i, col("t"), width)): _*)
    tok.select(posexplode(buckets).as(Seq("row_i", "bucket")))
      .select(col("row_i").cast("long").as("row_i"), col("bucket"))
      .groupBy("row_i", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise merge of sketches built with the SAME (depth, width):
    * CMS is DISTRIBUTIVE — sketch(A ⊎ B) = sketch(A) + sketch(B),
    * exactly, cell by cell — which is what makes it the 100-TB tool:
    * sketch each shard/day/batch independently, fold the bounded
    * grids, and the merged estimate is bit-identical to sketching
    * the union corpus in one pass (SketchesSpec pins the equality).
    * An incremental pipeline maintains a running sketch by adding
    * each micro-batch's grid; nothing about the corpus ever meets an
    * exchange. */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("row_i", "bucket").agg(sum(col("cnt")).as("cnt"))
  }

  /** Probe the sketch for `probes`' estimated counts beside their
    * exact counts (the exact side exists for accuracy accounting —
    * a production pass keeps only the sketch). Output per probe:
    * (token, exact_cnt, cms_est, no_underestimate). */
  def cmsEstimates(docs: DataFrame, probes: Seq[String], depth: Int = 4,
                   width: Int = 1024): DataFrame = {
    require(probes.nonEmpty, "cmsEstimates needs at least one probe")
    val sk = cmsSketch(docs, depth, width)
    val sp = docs.sparkSession
    import sp.implicits._
    val pb = probes.toDF("token")
      .select(col("token"), posexplode(array((0 until depth).map(i =>
        kmBucket(i, col("token"), width)): _*))
        .as(Seq("row_i", "bucket")))
      .select(col("token"), col("row_i").cast("long").as("row_i"),
        col("bucket"))
    // the sketch is ≤ d·w rows — broadcast it onto the probe grid;
    // a missing cell is a zero count
    val est = pb.join(broadcast(sk), Seq("row_i", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    val exact = docs.select(explode(tokens(col("text"))).as("t"))
      .filter(col("t").isin(probes: _*))
      .groupBy(col("t").as("token")).agg(count(lit(1)).as("exact_cnt"))
    est.join(broadcast(exact), Seq("token"), "left")
      .select(col("token"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
        col("cms_est"),
        (col("cms_est") >= coalesce(col("exact_cnt"), lit(0L)))
          .as("no_underestimate"))
  }

  /** Heavy hitters via the sketch→rescue pattern (the frequency twin
    * of [[graft.ops.IncrementalDedup]]'s bloom→rescue): every token
    * with exact count ≥ `minCount`, found WITHOUT shuffling the full
    * per-token count frame. Three passes, each bounded:
    *
    *  1. the corpus folds into the d×w grid (exchange ≤
    *     partitions·d·w rows at any corpus size);
    *  2. the DISTINCT token stream (vocabulary-sized — Heaps,
    *     sublinear) probes the broadcast grid; the CMS
    *     no-underestimate guarantee makes the survivors a strict
    *     SUPERSET of the true heavy hitters — zero false negatives,
    *     by construction, for any hash family;
    *  3. exact rescue recounts ONLY the candidates (the corpus
    *     filtered by the broadcast candidate set — candidates are
    *     ≤ N/minCount true hitters + the εN-overcount collisions, a
    *     sliver), and exact < minCount false positives drop.
    *
    * The exact groupBy this replaces shuffles one row per distinct
    * token; here the only vocabulary-sized exchange is the DISTINCT
    * in pass 2 — and an incremental deployment replaces passes 1–2
    * with a maintained [[cmsMerge]] grid and skips the distinct
    * entirely (probe only NEW tokens per batch). In a training
    * pipeline this feeds the stop-shingle/df-cap lists (q47/q61's
    * guards) and boilerplate alarms. Output: (token, exact_cnt,
    * cms_est), exact_cnt ≥ minCount, cms_est ≥ exact_cnt always. */
  def heavyHitters(docs: DataFrame, minCount: Long, depth: Int = 4,
                   width: Int = 1024): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val sk = cmsSketch(docs, depth, width)
    val tok = docs.select(explode(tokens(col("text"))).as("t"))
    val pb = tok.distinct()
      .select(col("t"), posexplode(array((0 until depth).map(i =>
        kmBucket(i, col("t"), width)): _*))
        .as(Seq("row_i", "bucket")))
      .select(col("t"), col("row_i").cast("long").as("row_i"),
        col("bucket"))
    val cand = pb.join(broadcast(sk), Seq("row_i", "bucket"), "left")
      .groupBy("t")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
      .filter(col("cms_est") >= minCount)
    val exact = tok.join(broadcast(cand.select("t")), Seq("t"))
      .groupBy("t").agg(count(lit(1)).as("exact_cnt"))
    cand.join(exact, Seq("t"))
      .filter(col("exact_cnt") >= minCount)
      .select(col("t").as("token"), col("exact_cnt"), col("cms_est"))
  }
}
