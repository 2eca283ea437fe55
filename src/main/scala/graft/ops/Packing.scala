package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Hashing.tokens

/** Sequence packing for LLM pretraining: documents are concatenated in
  * doc_id order into one global token stream, then split into
  * fixed-length context windows ("concat-and-chunk", the packing used
  * by GPT-style pretraining). Per document the operator computes its
  * [start, end) offset in that stream, the chunk it starts in, and how
  * many chunk boundaries it straddles.
  *
  * Scale design: the naive global prefix sum is `Window.orderBy(doc_id)`
  * with no partition key, which Spark executes as a SINGLE task — dead
  * at corpus scale. Here the prefix sum is two-level:
  *   1. docs bucket by `doc_id / bucketSize`; the within-bucket
  *      exclusive cumsum is an ordinary partitioned window (distributed,
  *      one shuffle);
  *   2. bucket totals cumsum on the bucket table — rows =
  *      idRange / bucketSize (thousands, not billions), so its
  *      single-partition window is trivially safe — and the resulting
  *      bucket base offsets broadcast-join back.
  * Both levels are deterministic: bucketing is arithmetic on doc_id, no
  * range-partitioner sampling anywhere.
  */
object Packing {

  /** Per-doc whitespace-token count and exclusive global start offset
    * in the doc_id-ordered token stream. `keepCols` names extra input
    * columns carried through to the output — they ride the
    * (doc_id, n_tokens, bucket) rows through the bucket window's one
    * shuffle (text is projected away before it either way), so the
    * shuffle payload grows only by their width; the composition form
    * for pipelines that pack rows already carrying lineage columns
    * (q77's lang/rate_ppm), where a join-back by doc_id would shuffle
    * twice for values this stage already held. */
  /** Column names this operator generates internally or emits; a
    * keepCols entry colliding with one would fail as an ambiguous
    * column deep inside the bucket window — reject it at entry with
    * the offending name instead. */
  private val ReservedCols = Set("doc_id", "n_tokens", "bucket",
    "cum_in_bucket", "btotal", "base", "start_offset", "chunk_id",
    "spans_boundary", "chunks_crossed")

  private def requireKeepable(keepCols: Seq[String]): Unit = {
    val bad = keepCols.filter(ReservedCols)
    require(bad.isEmpty,
      s"keepCols ${bad.mkString(", ")} collide(s) with columns this " +
        "operator generates (" + ReservedCols.toSeq.sorted.mkString(", ") +
        ") — rename before packing")
  }

  def withOffsets(docs: DataFrame, bucketSize: Long = 65536L,
                  keepCols: Seq[String] = Nil): DataFrame = {
    requireKeepable(keepCols)
    val toks = docs.select(
      col("doc_id") +:
      // null text counts as 0 tokens, explicitly: size(tokens(null)) is
      // NULL under ANSI semantics, and a NULL n_tokens would poison the
      // window sum here while DuckDB's window sum (which skips NULLs)
      // would still produce a defined offset — the two engines would
      // silently disagree on every later doc's start_offset.
      coalesce(size(tokens(col("text"))).cast("long"), lit(0L))
        .as("n_tokens") +:
      floor(col("doc_id") / lit(bucketSize)).cast("long").as("bucket") +:
      keepCols.map(col): _*)
    val inBucket = toks.withColumn("cum_in_bucket",
      sum(col("n_tokens"))
        .over(Window.partitionBy("bucket").orderBy("doc_id"))
        - col("n_tokens"))
    // bucket base offsets: tiny frame (one row per bucket), so the
    // unpartitioned window is intentional and safe
    val bases = toks.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("btotal"))
      .withColumn("base",
        coalesce(sum(col("btotal")).over(Window.orderBy("bucket"))
          - col("btotal"), lit(0L)))
      .select(col("bucket"), col("base"))
    inBucket.join(broadcast(bases), Seq("bucket"))
      .select(col("doc_id") +: col("n_tokens") +:
        (col("base") + col("cum_in_bucket")).as("start_offset") +:
        keepCols.map(col): _*)
  }

  /** Chunk assignment at a fixed context length: first chunk, whether
    * the doc spans a chunk boundary, and how many boundaries it
    * crosses. Empty docs (0 tokens) sit at their offset crossing
    * nothing. `keepCols` carries extra input columns through (see
    * [[withOffsets]]). */
  def packChunks(docs: DataFrame, contextLen: Long = 512L,
                 bucketSize: Long = 65536L,
                 keepCols: Seq[String] = Nil): DataFrame = {
    requireKeepable(keepCols)
    val off = withOffsets(docs, bucketSize, keepCols)
    val lastTok = greatest(col("start_offset") + col("n_tokens") - 1,
      col("start_offset"))
    val firstChunk = floor(col("start_offset") / lit(contextLen)).cast("long")
    val lastChunk = floor(lastTok / lit(contextLen)).cast("long")
    off.select(col("doc_id") +: col("n_tokens") +: col("start_offset") +:
      firstChunk.as("chunk_id") +:
      (lastChunk > firstChunk).as("spans_boundary") +:
      (lastChunk - firstChunk).as("chunks_crossed") +:
      keepCols.map(col): _*)
  }
}
