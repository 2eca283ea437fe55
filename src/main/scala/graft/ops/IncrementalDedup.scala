package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Incremental (cross-batch) dedup: admit only documents not already in
  * the historical corpus, without joining the full history.
  *
  * The 100 TB problem: each incoming batch must be checked against
  * billions of historical documents. A join touches the whole history
  * per batch; instead, a Bloom filter over historical content hashes
  * (built once, incrementally maintainable) is shipped to executors and
  * each new row probes it locally:
  *   - `might_contain == false` -> definitely new (no false negatives:
  *     a true duplicate can never slip through),
  *   - `might_contain == true` -> either a real dup or a false positive
  *     (rate `fpp`); the exact variant rescues those by joining ONLY
  *     the flagged rows — a tiny fraction — against history.
  *
  * The probe is the catalyst [[BloomFilterMightContain]] expression (the
  * one Spark's runtime row-level filtering injects), so the filter stays
  * inside whole-stage codegen — no Scala UDF breaking fusion. The
  * serialized filter is a plan literal, which rides the task-binary
  * broadcast once per executor exactly like an explicit
  * `sparkContext.broadcast` did.
  *
  * Null semantics (pinned by the q44 oracle's `NOT EXISTS`): a NULL
  * batch text equals nothing in history, so null-text rows are admitted;
  * null-text history rows match nothing and are excluded from the
  * filter.
  *
  * Deterministic: Spark's BloomFilter uses fixed seeds, and the probed
  * value is the engine-portable h60 content hash.
  */
object IncrementalDedup {

  /** None when history has no non-null-text rows: `stat.bloomFilter`
    * over zero rows yields a filter with null internals (its writeTo
    * NPEs), and semantically an empty history flags nothing anyway —
    * callers treat None as "probe always false". */
  private def filterBytes(history: DataFrame, expectedItems: Long,
                          fpp: Double): Option[Array[Byte]] = {
    val src = history.filter(col("text").isNotNull)
    if (src.isEmpty) None
    else {
      val bf = src.stat.bloomFilter(Hashing.h60(col("text")), expectedItems, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      Some(bos.toByteArray)
    }
  }

  /** Codegen'd bloom probe: `might_contain(<filter literal>, h)`. */
  private def mightContain(bfBytes: Array[Byte], h: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bfBytes, BinaryType), ColumnBridge.expression(h)))

  /** Fast path: drop rows whose content hash is probably in history.
    * Loses ~fpp of genuinely-new docs (acceptable for training-data
    * dedup); never admits a true duplicate. */
  def probablyNewDocs(history: DataFrame, batch: DataFrame,
                      expectedItems: Long, fpp: Double): DataFrame = {
    val probe = filterBytes(history, expectedItems, fpp)
      .map(mightContain(_, col("__h"))).getOrElse(lit(false))
    val withHash = batch.withColumn("__h", Hashing.h60(col("text")))
    withHash.filter(col("text").isNotNull)
      .filter(!probe)
      .unionByName(withHash.filter(col("text").isNull))
      .drop("__h")
  }

  /** Exact path: bloom-filter prefilter, then anti-join ONLY the flagged
    * rows against history — new docs lost to false positives are
    * rescued; output = batch rows whose text does not appear in
    * history, exactly. The rescue join keys on the hash (shuffle
    * locality) AND the text itself, so a 60-bit hash collision between
    * a new doc and a different historical doc cannot drop the new doc. */
  def newDocsExact(history: DataFrame, batch: DataFrame,
                   expectedItems: Long, fpp: Double): DataFrame = {
    val probe = filterBytes(history, expectedItems, fpp)
      .map(mightContain(_, col("__h"))).getOrElse(lit(false))
    val histKeyed = history.filter(col("text").isNotNull)
      .select(Hashing.h60(col("text")).as("__hh"), col("text").as("__htext"))
    val withHash = batch.withColumn("__h", Hashing.h60(col("text")))
    val nullText = withHash.filter(col("text").isNull)
    val notNull = withHash.filter(col("text").isNotNull)
    val clean = notNull.filter(!probe)
    val flagged = notNull.filter(probe)
      .join(histKeyed,
        col("__h") === col("__hh") && col("text") === col("__htext"),
        "left_anti") // false positives (and hash collisions) survive
    clean.unionByName(flagged).unionByName(nullText).drop("__h")
  }

  /** Exact path WITHOUT the Bloom prefilter: one anti-join of the
    * whole batch keyed on (hash, text). Output is identical to
    * [[newDocsExact]] by construction — the Bloom only ever
    * short-circuits rows the anti-join would keep anyway
    * (IncrementalDedupSpec pins the equality). The right call while
    * history is SMALL: the filter build costs an emptiness probe plus
    * a full-history aggregation action per batch, and under broadcast
    * size the anti-join is map-side anyway. [[graft.streaming.StreamingDedup]]
    * dispatches between the two on the history table's on-disk size. */
  def newDocsExactDirect(history: DataFrame, batch: DataFrame): DataFrame = {
    val histKeyed = history.filter(col("text").isNotNull)
      .select(Hashing.h60(col("text")).as("__hh"), col("text").as("__htext"))
    val withHash = batch.withColumn("__h", Hashing.h60(col("text")))
    val nullText = withHash.filter(col("text").isNull)
    val notNull = withHash.filter(col("text").isNotNull)
      .join(histKeyed,
        col("__h") === col("__hh") && col("text") === col("__htext"),
        "left_anti")
    notNull.unionByName(nullText).drop("__h")
  }
}
