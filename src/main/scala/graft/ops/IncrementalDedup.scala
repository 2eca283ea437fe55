package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) dedup: admit only documents not already in
  * the historical corpus, without joining the full history.
  *
  * The 100 TB problem: each incoming batch must be checked against
  * billions of historical documents. A join touches the whole history
  * per batch; instead, a Bloom filter over historical content hashes
  * (built once, incrementally maintainable) is broadcast and each new
  * row probes it locally:
  *   - `mightContain == false` -> definitely new (no false negatives:
  *     a true duplicate can never slip through),
  *   - `mightContain == true` -> either a real dup or a false positive
  *     (rate `fpp`); the exact variant rescues those by joining ONLY
  *     the flagged rows — a tiny fraction — against history.
  *
  * Deterministic: Spark's BloomFilter uses fixed seeds, and the probed
  * value is the engine-portable h60 content hash.
  */
object IncrementalDedup {

  /** Fast path: drop rows whose content hash is probably in history.
    * Loses ~fpp of genuinely-new docs (acceptable for training-data
    * dedup); never admits a true duplicate. */
  private def buildFilter(history: DataFrame, expectedItems: Long, fpp: Double) = {
    val hashed = history.select(Hashing.h60(col("text")).as("h"))
    val bf = hashed.stat.bloomFilter("h", expectedItems, fpp)
    // explicit broadcast: a billion-item filter is hundreds of MB —
    // ship it once per executor, not once per task closure
    history.sparkSession.sparkContext.broadcast(bf)
  }

  def probablyNewDocs(history: DataFrame, batch: DataFrame,
                      expectedItems: Long, fpp: Double): DataFrame = {
    val bfB = buildFilter(history, expectedItems, fpp)
    val mightContain = udf((h: Long) => bfB.value.mightContainLong(h))
    batch.withColumn("__h", Hashing.h60(col("text")))
      .filter(!mightContain(col("__h")))
      .drop("__h")
  }

  /** Exact path: bloom-filter prefilter, then anti-join ONLY the flagged
    * rows against history — new docs lost to false positives are
    * rescued; output = batch rows whose text does not appear in
    * history, exactly. */
  def newDocsExact(history: DataFrame, batch: DataFrame,
                   expectedItems: Long, fpp: Double): DataFrame = {
    val hashed = history.select(Hashing.h60(col("text")).as("h"))
    val bfB = buildFilter(history, expectedItems, fpp)
    val mightContain = udf((h: Long) => bfB.value.mightContainLong(h))
    val withHash = batch.withColumn("__h", Hashing.h60(col("text")))
    val clean = withHash.filter(!mightContain(col("__h")))
    val flagged = withHash.filter(mightContain(col("__h")))
      .join(hashed, col("__h") === col("h"), "left_anti") // false positives survive
    clean.unionByName(flagged).drop("__h")
  }
}
