package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Hashing.h60

/** Corpus-balancing sampling for training-data pipelines. */
object Sampling {

  /** Priority sampling (Duffield, Lund & Thorup 2007, "Priority
    * sampling for estimation of arbitrary subset sums") — WEIGHTED
    * sampling without replacement with the unbiased subset-sum
    * estimator, the principled way to downsample a corpus by token
    * mass and still report exact-in-expectation token totals:
    *
    *   u_i        = (h30_i + 1) / 2³⁰      (hash-derived uniform)
    *   priority_i = ⌊w_i · 2³⁰ / (h30_i + 1)⌋   (≈ w_i / u_i, in
    *                w units — all int64, exact on both engines)
    *   sample     = top k by (priority desc, doc_id)
    *   τ          = the (k+1)-th priority (0 when the corpus has ≤ k
    *                rows — then the sample is exhaustive and exact)
    *   ŵ_i        = max(w_i, τ)            (the paper's estimator:
    *                E[Σ_sample ŵ] = Σ_corpus w, any subset)
    *
    * w_i is the whitespace token count (what a data pipeline bills
    * by); h30 is the TOP 30 bits of the salted [[Hashing.h60]], so
    * u is content-independent, stable under corpus growth, and
    * engine-portable; w·2³⁰ bounds w < 8.5·10⁹ tokens per doc before
    * int64 overflow (far past any real document). Discrete hashes
    * can tie where the paper's continuous u cannot — the (priority,
    * doc_id) order makes ties deterministic on both engines.
    *
    * Plan: the weight+priority projection is per-row (zero
    * shuffles); top-(k+1) is TakeOrdered (per-partition heaps + a
    * (k+1)-row driver merge); τ and the ranks are windows over those
    * k+1 rows only. One corpus pass at any scale.
    * Output: (rank, doc_id, w, priority, tau, w_hat). */
  def prioritySample(docs: DataFrame, k: Int,
                     salt: String = "prio"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val scored = docs.select(col("doc_id"),
        coalesce(size(Hashing.tokens(col("text"))).cast("long"), lit(0L))
          .as("w"),
        h60(concat_ws(":", lit(salt), col("doc_id"))).as("h"))
      .select(col("doc_id"), col("w"),
        Hashing.idiv(col("w") * lit(1073741824L),
          shiftright(col("h"), 30) + lit(1L)).as("priority"))
    val top = scored.orderBy(col("priority").desc, col("doc_id"))
      .limit(k + 1)
    val win = Window.orderBy(col("priority").desc, col("doc_id"))
    val ranked = top.withColumn("rank", row_number().over(win).cast("long"))
    val tau = ranked
      .agg(max(when(col("rank") === (k + 1), col("priority"))).as("t"))
    ranked.filter(col("rank") <= k)
      .crossJoin(broadcast(tau))
      .select(col("rank"), col("doc_id"), col("w"), col("priority"),
        coalesce(col("t"), lit(0L)).as("tau"),
        greatest(col("w"), coalesce(col("t"), lit(0L))).as("w_hat"))
  }

  /** Deterministic train/val/test assignment by content-independent
    * hash: bucket = h60("split:" + doc_id) mod 1000, train below
    * `trainPerMille`, val below `trainPerMille + valPerMille`, test
    * above. Properties a pretraining pipeline needs and a random()
    * split lacks: stable under re-runs and corpus growth (a doc's
    * split never changes when other docs arrive), engine-portable
    * (md5-derived [[Hashing.h60]]), and per-row — ZERO shuffles, the
    * assignment is a projection. The salt prefix decorrelates this
    * hash from any other doc_id-keyed hashing in the pipeline. */
  def hashSplit(docs: DataFrame, trainPerMille: Int = 980,
                valPerMille: Int = 10): DataFrame =
    withSplit(docs, trainPerMille, valPerMille)
      .select(col("doc_id"), col("bucket"), col("split"))

  /** [[hashSplit]]'s assignment appended to the input row (every
    * input column retained) — the composition form: the end of a
    * curation pipeline (q73) splits rows that already carry cluster
    * and token columns, and a join-back by doc_id would shuffle for a
    * value that is a pure projection. Input must not already carry
    * `bucket`/`split`. */
  def withSplit(docs: DataFrame, trainPerMille: Int = 980,
                valPerMille: Int = 10): DataFrame = {
    require(trainPerMille > 0 && valPerMille >= 0 &&
      trainPerMille + valPerMille < 1000,
      s"bad split: train=$trainPerMille val=$valPerMille")
    docs
      .withColumn("bucket", pmod(Hashing.h60(
        concat(lit("split:"), col("doc_id").cast("string"))), lit(1000L)))
      .withColumn("split",
        when(col("bucket") < trainPerMille, "train")
          .when(col("bucket") < trainPerMille + valPerMille, "val")
          .otherwise("test"))
  }

  /** Leakage-safe train/val/test split: [[hashSplit]]'s assignment
    * keyed by the NEAR-DUP CLUSTER ROOT instead of the doc id, so an
    * entire duplicate cluster lands in one split — the fix for the
    * classic eval-leakage failure where a doc and its near-duplicate
    * straddle train and test and the held-out score is fiction
    * (the same failure q51/q125 DETECT; this prevents it at split
    * time). Takes any (doc_id, cluster_root) frame — q35's exact
    * clusters, q46's embedding clusters, the q67 capped
    * materialization all drop in. Deliberately the SAME salt and
    * arithmetic as [[hashSplit]]: a singleton (root = own id) gets
    * the identical assignment the plain split would give it, so
    * moving to cluster-safe splitting reassigns ONLY docs that are
    * part of a multi-doc cluster (spec-pinned). Pure projection over
    * the clusters frame — zero additional shuffles.
    * Output: (doc_id, cluster_root, bucket, split). */
  def leakageSafeSplit(clusters: DataFrame, trainPerMille: Int = 980,
                       valPerMille: Int = 10): DataFrame = {
    require(trainPerMille > 0 && valPerMille >= 0 &&
      trainPerMille + valPerMille < 1000,
      s"bad split: train=$trainPerMille val=$valPerMille")
    clusters.select(col("doc_id"), col("cluster_root"))
      .withColumn("bucket", pmod(Hashing.h60(
        concat(lit("split:"), col("cluster_root").cast("string"))),
        lit(1000L)))
      .withColumn("split",
        when(col("bucket") < trainPerMille, "train")
          .when(col("bucket") < trainPerMille + valPerMille, "val")
          .otherwise("test"))
  }

  /** Per-language cap: keep at most `cap` documents per predicted
    * language, chosen in deterministic pseudo-random order (h60 of the
    * doc id, doc_id tie-break) so reruns and the oracle agree exactly.
    *
    * Scale: one shuffle by language + per-group top-k. Spark rewrites
    * the `row_number <= cap` filter into a WindowGroupLimit, so each
    * group keeps a bounded heap instead of fully sorting — the same
    * shape as the q03 top-k. Skewed groups (one language dominating a
    * web corpus) are bounded by the group-limit pushdown running
    * map-side before the shuffle.
    */
  def groupCap(docs: DataFrame, cap: Int): DataFrame = {
    val lang = TextAnalysis.langId(docs)
      .select(col("doc_id"), col("predicted").as("lang"))
    lang.withColumn("rn",
        row_number().over(Window.partitionBy("lang")
          .orderBy(h60(col("doc_id")), col("doc_id"))))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
  }

  /** Temperature resampling — the multilingual-mixture rebalancing of
    * a pretraining pipeline: per-group acceptance rate
    * `(n_min / n_g)^exponent`, where exponent = 1 − 1/T maps to the
    * standard temperature-T mixture p_g ∝ n_g^(1/T), scaled so the
    * RAREST group is kept whole and every other group is downsampled
    * toward its target share (no replication — this is the
    * sampling-without-replacement form). exponent 0 = keep everything
    * (T=1, natural mix), 0.5 = T=2 (the common choice), 1 = fully
    * equalized group counts (T→∞).
    *
    * Determinism & oracle parity: acceptance is
    * `h60("mix:" + doc_id) % 1e6 < floor(rate · 1e6)` — per-row and
    * engine-portable like [[hashSplit]] (salted to decorrelate from
    * the split hash). At exponents 0.5 and 1.0 the rate math is
    * sqrt / plain division — BOTH correctly-rounded IEEE ops in Spark
    * and DuckDB, so the thresholds replay bit-exactly; other
    * exponents go through pow(), whose last-ulp behavior is NOT
    * specified cross-engine — fine in production, but registry
    * oracles should stick to the exact pair. Unlike [[hashSplit]],
    * retention is corpus-dependent BY DESIGN (rates derive from group
    * counts): adding documents can change every rate — the mixture is
    * a property of the corpus, not the row.
    *
    * Scale: one tiny groupBy(lang) agg + a 1-row global min + a
    * broadcast of the per-group thresholds back onto the stream —
    * the corpus itself is never shuffled; the filter is a pushed
    * per-row predicate. */
  def temperatureMix(docs: DataFrame, exponent: Double = 0.5,
                     byCol: String = "lang"): DataFrame =
    withMix(docs, exponent, byCol)
      .select(col("doc_id"), col(byCol), col("rate_ppm"))

  /** Fixed-rate resampling by a categorical quality bucket — the
    * CCNet output stage: keep the reference-like head, thin the
    * middle, drop most of the tail. `ratesPpm` maps bucket value →
    * acceptance rate in parts-per-million; buckets absent from the
    * map get rate 0 (dropped). Acceptance is the family's salted-hash
    * predicate `h60(salt + ":" + doc_id) % 1e6 < rate` — per-row,
    * deterministic, stable under corpus growth, ZERO shuffles (the
    * rate is a literal when-chain, not a join). Output: input rows
    * that survive, plus their `rate_ppm`. */
  def bucketSample(docs: DataFrame, bucketCol: String,
                   ratesPpm: Map[String, Long],
                   salt: String = "bucketmix"): DataFrame = {
    require(ratesPpm.nonEmpty, "need at least one bucket rate")
    require(ratesPpm.values.forall(r => r >= 0 && r <= 1000000L),
      "rates are parts-per-million: [0, 1000000]")
    require(!docs.columns.contains("rate_ppm"),
      "bucketSample input must not already carry rate_ppm")
    val rate = ratesPpm.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (b, r)) =>
        when(col(bucketCol) === b, lit(r)).otherwise(acc)
    }
    docs.withColumn("rate_ppm", rate)
      .filter(pmod(h60(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
        lit(1000000L)) < col("rate_ppm"))
  }

  /** [[temperatureMix]]'s acceptance appended to the input row (every
    * input column retained, plus `rate_ppm`; accepted rows only) —
    * the composition form, mirroring [[withSplit]]: a pipeline that
    * continues past the mix (q77 packs the survivors) needs the text,
    * and re-attaching it by doc_id would shuffle the corpus for rows
    * this stage already held. The group column leads the output (join
    * key); input must not already carry `rate_ppm`. Plan: tiny
    * per-group agg + 1-row min + broadcast thresholds — the corpus is
    * never shuffled, acceptance is a pushed per-row predicate. */
  def withMix(docs: DataFrame, exponent: Double = 0.5,
              byCol: String = "lang"): DataFrame = {
    require(exponent >= 0 && exponent <= 1, s"bad exponent $exponent")
    // enforce the scaladoc contract: an input already carrying rate_ppm
    // would fail as an ambiguous column inside the threshold join —
    // fail here, at the call site, with the contract named
    require(!docs.columns.contains("rate_ppm"),
      "withMix input must not already carry rate_ppm (it is this " +
        "operator's output column)")
    val counts = docs.groupBy(col(byCol))
      .agg(count(lit(1)).cast("double").as("n"))
    val nMin = counts.agg(min(col("n")).as("n_min"))
    val ratio = col("n_min") / col("n")
    val rate =
      if (exponent == 0.5) sqrt(ratio)
      else if (exponent == 1.0) ratio
      else if (exponent == 0.0) lit(1.0)
      else pow(ratio, lit(exponent))
    val thresholds = counts.crossJoin(broadcast(nMin))
      .select(col(byCol), floor(rate * lit(1000000.0)).cast("long")
        .as("rate_ppm"))
    docs.join(broadcast(thresholds), Seq(byCol))
      .filter(pmod(h60(concat(lit("mix:"), col("doc_id").cast("string"))),
        lit(1000000L)) < col("rate_ppm"))
  }

  /** Token-budget domain mixture (The Pile's mixing weights, the
    * application step of DoReMi-style learned weights): given target
    * per-source shares w_s in PER-MILLE, find the largest total token
    * budget B the corpus can serve at exactly those proportions —
    * the BINDING source is the one with the fewest tokens relative
    * to its weight, B = min over weighted sources of
    * (T_s·1000 div w_s) — then downsample every source to its share:
    *
    *   rate_pm_s = min(1000, (w_s · B) div T_s)
    *
    * The binding source keeps (almost) everything; oversupplied
    * sources thin to proportion; sources ABSENT from `targetsPm` get
    * rate 0 and are dropped — their rows still appear in the output
    * with keep = false, so the mixture report is complete. All
    * integer: T_s from one per-source token-count aggregate, the min
    * and the rates replay verbatim in the oracle. 64-bit bound:
    * w_s·B ≤ 1000·B ≤ 1000·1000·T — safe below ~9·10^12 corpus
    * tokens; past that, express weights per-cent.
    *
    * Acceptance is the family's salted-hash predicate
    * (h60("budget:" + doc_id) mod 1000 < rate — q66's modulus):
    * per-row, deterministic, stable under corpus growth. Plan: ONE
    * corpus-sized exchange (the per-source token aggregate, 2-int
    * rows after map-side combine); the |sources|-row rate frame
    * broadcasts back and keep is a pushed per-row predicate — the
    * corpus text is never shuffled.
    *
    * Output: (doc_id, source, n_tokens, rate_pm, keep) for every
    * input row with a NON-NULL `byCol` — the rate join is an
    * equi-join on the source key, and null != null on both engines,
    * so null-source docs drop (matching the oracle). Callers with
    * nullable sources bucket them first (coalesce to an "unknown"
    * source) if they must be budgeted. */
  def mixtureBudget(docs: DataFrame, targetsPm: Map[String, Long],
                    byCol: String = "source",
                    salt: String = "budget"): DataFrame = {
    require(targetsPm.nonEmpty, "need at least one target weight")
    require(targetsPm.values.forall(w => w >= 1 && w <= 1000),
      "weights are per-mille shares: [1, 1000]")
    val weights = targetsPm.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s0, w)) => when(col(byCol) === s0, lit(w)).otherwise(acc)
    }
    val toks = docs.withColumn("n_tokens",
      coalesce(size(Hashing.tokens(col("text"))).cast("long"), lit(0L)))
    val stats = toks.withColumn("w_pm", weights)
      .groupBy(col(byCol), col("w_pm"))
      .agg(sum(col("n_tokens")).as("t_s"))
    val budget = stats.filter(col("w_pm") > 0)
      .agg(min(Hashing.idiv(col("t_s") * lit(1000L), col("w_pm"))).as("b"))
    val rates = stats.crossJoin(broadcast(budget))
      .select(col(byCol),
        when(col("w_pm") > 0 && col("t_s") > 0,
          least(lit(1000L), Hashing.idiv(col("w_pm") * col("b"),
            col("t_s")))).otherwise(lit(0L)).as("rate_pm"))
    toks.join(broadcast(rates), Seq(byCol))
      .withColumn("keep",
        pmod(h60(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
          lit(1000L)) < col("rate_pm"))
      .select(col("doc_id"), col(byCol), col("n_tokens"),
        col("rate_pm"), col("keep"))
  }
}
