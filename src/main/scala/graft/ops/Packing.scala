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
      coalesce(graft.functions.QualityFunctions.nTokens(col("text")), lit(0L))
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

  /** Sliding-window document chunking — the RAG/retrieval-corpus prep
    * that [[packChunks]]'s boundary-crossing concat deliberately is
    * not: each document is cut into overlapping windows of `width`
    * tokens every `stride` tokens (stride < width ⇒ overlap preserves
    * context across cuts; the last windows may be short), document
    * boundaries are never crossed, and every (doc_id, chunk_idx)
    * addresses a stable retrievable unit.
    *
    * Map-only: the window list is built per row with higher-order
    * functions and exploded — no shuffle anywhere, embarrassingly
    * parallel at any corpus size. Chunk text is reconstructed from
    * the NORMALIZED token stream ([[Hashing.tokens]]: trim, lower,
    * split on whitespace — empty tokens dropped), which is what makes
    * it byte-replayable cross-engine; a byte-offset variant over raw
    * text would carry the raw whitespace instead.
    *
    * Output: (doc_id, chunk_idx 0-based, n_tokens, chunk_text); docs
    * with no tokens emit no window. */
  /** Length-bucketed batch assembly — the padding-efficiency batching
    * trainers use (group similar-length sequences so a batch's pad-to-
    * max waste shrinks; the T5/fairseq "length bucketing" strategy):
    * every document gets a GLOBAL dense rank under the total order
    * (n_tokens, doc_id) and batch_id = rank div batchSize, so batch
    * contents are deterministic at any parallelism.
    *
    * The global rank uses [[withOffsets]]' two-level trick with
    * LENGTH-RANGE buckets instead of id ranges: bucket =
    * n_tokens div lenBucket is monotone in the rank order, so
    * in-bucket row_numbers plus broadcast per-bucket base counts
    * compose to the exact global rank — one corpus exchange keyed on
    * the length bucket, never a single-partition global window.
    * (A range-repartition would sample nondeterministic boundaries;
    * the arithmetic bucket is what keeps the result hash-stable.)
    * Skew note: lenBucket bounds how many distinct lengths share a
    * bucket, not how many DOCS — a corpus massed on one length still
    * hot-spots that bucket's sort; shrink lenBucket toward 1 and the
    * exchange approaches a per-length hash partition.
    *
    * Output: (doc_id, n_tokens, rank, batch_id); the last batch may
    * be short. */
  def lengthBatches(docs: DataFrame, batchSize: Int = 32,
                    lenBucket: Long = 16L): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(lenBucket >= 1, s"lenBucket must be >= 1, got $lenBucket")
    val toks = docs.select(col("doc_id"),
      coalesce(graft.functions.QualityFunctions.nTokens(col("text")), lit(0L))
        .as("n_tokens"))
    val b = toks.withColumn("lbucket",
      floor(col("n_tokens") / lit(lenBucket)).cast("long"))
    val inB = b.withColumn("rin",
      row_number().over(Window.partitionBy("lbucket")
        .orderBy("n_tokens", "doc_id")).cast("long") - 1L)
    val bases = b.groupBy("lbucket").agg(count(lit(1)).as("bn"))
      .withColumn("base",
        coalesce(sum(col("bn")).over(Window.orderBy("lbucket"))
          - col("bn"), lit(0L)))
      .select(col("lbucket"), col("base"))
    val rank = col("base") + col("rin")
    inB.join(broadcast(bases), Seq("lbucket"))
      .select(col("doc_id"), col("n_tokens"), rank.as("rank"),
        Hashing.idiv(rank, lit(batchSize.toLong)).as("batch_id"))
  }

  /** Per-batch padding accounting for [[lengthBatches]] BESIDE the
    * arrival-order baseline (batches cut from the (doc_id) order by
    * the same two-level rank, id-range buckets) — the padding saving
    * is IN the result, not a claim beside it: per batch,
    * pad_tokens = n_docs·max_len − sum_len and
    * pad_x1000 = (1000·pad_tokens) div (n_docs·max_len).
    * Output: (strategy ∈ length|arrival, batch_id, n_docs, max_len,
    * sum_len, pad_tokens, pad_x1000). */
  def lengthBatchStats(docs: DataFrame, batchSize: Int = 32,
                       lenBucket: Long = 16L,
                       idBucket: Long = 65536L): DataFrame = {
    require(idBucket >= 1, s"idBucket must be >= 1, got $idBucket")
    val byLen = lengthBatches(docs, batchSize, lenBucket)
      .select(lit("length").as("strategy"), col("batch_id"),
        col("n_tokens"))
    val toks = docs.select(col("doc_id"),
      coalesce(graft.functions.QualityFunctions.nTokens(col("text")), lit(0L))
        .as("n_tokens"))
      .withColumn("bucket", floor(col("doc_id") / lit(idBucket)).cast("long"))
    val inB = toks.withColumn("rin",
      row_number().over(Window.partitionBy("bucket").orderBy("doc_id"))
        .cast("long") - 1L)
    val bases = toks.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("base",
        coalesce(sum(col("bn")).over(Window.orderBy("bucket"))
          - col("bn"), lit(0L)))
      .select(col("bucket"), col("base"))
    val byArr = inB.join(broadcast(bases), Seq("bucket"))
      .select(lit("arrival").as("strategy"),
        Hashing.idiv(col("base") + col("rin"), lit(batchSize.toLong))
          .as("batch_id"),
        col("n_tokens"))
    val cap = col("n_docs") * col("max_len")
    byLen.unionByName(byArr)
      .groupBy("strategy", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("sum_len"))
      .select(col("strategy"), col("batch_id"), col("n_docs"),
        col("max_len"), col("sum_len"),
        (cap - col("sum_len")).as("pad_tokens"),
        Hashing.idiv(lit(1000L) * (cap - col("sum_len")),
          greatest(cap, lit(1L))).as("pad_x1000"))
  }

  def slidingWindows(docs: DataFrame, width: Int,
                     stride: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width], got $stride")
    val toks = filter(coalesce(tokens(col("text")),
      array().cast("array<string>")), _ =!= "")
    val t = size(toks)
    // windows start at 0, stride, 2·stride, ... while start < T
    val nWin = when(t > 0,
      floor((t - 1).cast("double") / lit(stride)).cast("int") + 1)
      .otherwise(lit(0))
    // sequence(0, -1) would run DESCENDING; greatest-guard the top end
    // and drop the one empty window a token-less doc would emit
    docs.select(col("doc_id"), toks.as("toks"), nWin.as("n_win"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), greatest(col("n_win") - 1, lit(0))),
        i => {
          val start = i * stride
          val len = least(lit(width), size(col("toks")) - start)
          struct(i.cast("long").as("chunk_idx"),
            len.cast("long").as("n_tokens"),
            array_join(slice(col("toks"), start + 1, len), " ")
              .as("chunk_text"))
        })).as("w"))
      .filter(col("w.n_tokens") > 0)
      .select(col("doc_id"), col("w.chunk_idx"), col("w.n_tokens"),
        col("w.chunk_text"))
  }
}
