package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Hashing.h60

/** Corpus-balancing sampling for training-data pipelines. */
object Sampling {

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
}
