package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Hashing.h60

/** Corpus-balancing sampling for training-data pipelines. */
object Sampling {

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
