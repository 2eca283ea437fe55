package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.{pqAdcScore, pqEncode, pqLut}

/** Product quantization: the compression layer of billion-scale
  * similarity search (Jégou/Douze/Schmid, "Product quantization for
  * nearest neighbor search", TPAMI 2011 — the FAISS `IndexPQ` /
  * `IndexIVFPQ` layout).
  *
  * A d-dim vector is split into `m` contiguous subspaces of
  * dsub = d/m; each subspace is quantized independently against a
  * ksub-entry sub-codebook, and the vector is stored as m codes of
  * `bitsPerCode` bits packed into one long. At the default
  * m=8 / ksub=16 over 64-dim float32 this is 256 B → 4 B per vector
  * (64×), which is what lets an ANN index over 10⁹+ vectors live in
  * executor memory — and what turns the candidate scan from a d-dim
  * float rerank into m table lookups per vector (asymmetric distance
  * computation, ADC).
  *
  * Scale posture, piece by piece:
  *  - codebooks are m·ksub·dsub = d·ksub doubles — a few KB,
  *    INDEPENDENT of corpus size. Collecting the sample to the driver
  *    and embedding the trained codebooks in the plan is bounded O(1)
  *    state at any corpus scale (exactly how FAISS ships trained
  *    codebooks to every search node); this differs from the IVF
  *    centroid case, where k grows with n and the quantizer must stay
  *    a DataFrame ([[IvfIndex.sampleCentroidsDf]]).
  *  - encoding is ONE scan: n·ksub·d fused multiply-adds inside
  *    whole-stage codegen ([[graft.functions.PqEncodeExpr]]), no
  *    shuffle, output one long per vector.
  *  - ADC search broadcasts the (tiny) query side WITH its per-query
  *    lookup tables ([[graft.functions.PqLutExpr]], O(d·ksub) work
  *    per query, done once); the corpus side streams codes through
  *    [[graft.functions.PqAdcScoreExpr]] at m adds per row. The
  *    corpus never shuffles for scoring; only the per-query top-k
  *    window moves (query_id, vec_id, score) rows.
  *
  * Determinism / oracle parity: codebooks come from the ksub
  * lowest-vec_id sample vectors (a LIMIT subquery in the DuckDB
  * replay — the q74/q78 pin-free quantizer pattern, constant-size
  * here), all distances are the c2 − 2·⟨x,c⟩ sequential-fold form the
  * rest of the vector family uses, ADC sums fold in ascending
  * subspace order, and every ranked value is floor-scaled to an
  * integer before the (value, vec_id) tie-broken window — so encode,
  * top-k and recall all replay bit-for-bit in SQL.
  */
object Pq {

  /** PQ geometry. `dim` must equal m·dsub of the corpus vectors;
    * ksub must fit bitsPerCode; m·bitsPerCode must fit a long. */
  final case class PqConfig(m: Int = 8, ksub: Int = 16,
                            bitsPerCode: Int = 4, dim: Int = 64) {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    require(ksub <= (1 << bitsPerCode),
      s"ksub=$ksub does not fit bitsPerCode=$bitsPerCode")
    require(m.toLong * bitsPerCode <= 63,
      s"m=$m x $bitsPerCode bits overflows a non-negative long")
    def dsub: Int = dim / m
  }

  /** Deterministic sample codebooks: sub-codebook j is the j-th
    * dsub-slice of the ksub lowest-vec_id vectors, code = rank in that
    * sample (0-based, vec_id-ascending). The collect is ksub rows —
    * constant-size driver state at any corpus scale — and the sample
    * replays in SQL as `ORDER BY vec_id LIMIT ksub` + row_number.
    * (For higher recall per bit, refine these with per-subspace Lloyd
    * sweeps — [[IvfIndex.refineCentroidsDf]] over sliced vectors — at
    * the cost of a pinned, non-replayable codebook; the sample form
    * keeps the whole PQ family under the hash-check regime.) */
  def sampleCodebooks(embeddings: DataFrame,
                      cfg: PqConfig): Array[Array[Array[Double]]] = {
    val rows = embeddings.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(cfg.ksub).collect()
    // a short sample would silently desynchronize from the cfg.ksub
    // LUT stride every downstream kernel threads (pqAdcScore indexes
    // j·ksub + c) — fail loud instead of reading the wrong entries
    require(rows.length == cfg.ksub,
      s"corpus has only ${rows.length} vectors; PQ codebook sampling " +
        s"needs at least ksub=${cfg.ksub} (shrink cfg.ksub to fit)")
    val samples: Array[Array[Double]] = rows
      .sortBy(_.getLong(0))
      .map(_.getSeq[Any](1).map {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue()
      }.padTo(cfg.dim, 0.0).toArray)
    Array.tabulate(cfg.m) { j =>
      samples.map(_.slice(j * cfg.dsub, (j + 1) * cfg.dsub))
    }
  }

  /** One-scan PQ encoding: (vec_id, pq_code) with code_j in bits
    * [j·bitsPerCode, (j+1)·bitsPerCode) of the packed long. */
  def encode(embeddings: DataFrame, codebooks: Array[Array[Array[Double]]],
             bitsPerCode: Int): DataFrame =
    embeddings.select(col("vec_id"),
      pqEncode(col("embedding"), codebooks, bitsPerCode).as("pq_code"))

  /** ADC top-k: for each query (vec_id < nQueries), the k corpus
    * vectors with the smallest ADC approximate squared-L2 (self
    * excluded), ranked on the floor-scaled score with vec_id
    * tie-break. Output: (query_id, rank, vec_id, adc_x1e6).
    *
    * Plan: codebook sample (LIMIT ksub) → one encode scan → broadcast
    * of nQueries (query_id, lut) rows → scored stream → per-query
    * top-k window. The corpus is read once and never shuffled before
    * the window; at 100 TB the window input is the only exchange and
    * carries three narrow columns. */
  def adcTopK(embeddings: DataFrame, cfg: PqConfig,
              nQueries: Int, k: Int): DataFrame = {
    val cb = sampleCodebooks(embeddings, cfg)
    val codes = encode(embeddings, cb, cfg.bitsPerCode)
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        pqLut(col("embedding"), cb).as("lut"))
    val scored = codes.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        floor(pqAdcScore(col("lut"), col("pq_code"),
          cfg.m, cfg.ksub, cfg.bitsPerCode) * 1e6)
          .cast("long").as("adc_x1e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_x1e6"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "adc_x1e6")
  }

  /** Exact squared-L2 top-k baseline (self excluded): the full-vector
    * twin ADC is measured against. d(q,v) = ⟨v,v⟩ − 2⟨q,v⟩ (the ‖q‖²
    * constant cancels in ranking), floor-scaled, vec_id tie-break.
    * Output: (query_id, rank, vec_id, l2_x1e6). */
  def exactL2TopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("v2", Similarity.dot(col("v"), col("v")))
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        floor((col("v2") - lit(2.0) * Similarity.dot(col("qv"), col("v")))
          * 1e6).cast("long").as("l2_x1e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("l2_x1e6"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "l2_x1e6")
  }

  /** Two-stage production search: ADC shortlist → exact rerank. The
    * compressed scan ranks ALL corpus vectors at m adds each and keeps
    * the top `shortlist` per query; only those nQueries·shortlist
    * finalists get their full float vectors back (a broadcast semi-join
    * fetch against the corpus — the Spark form of the point-lookup a
    * serving system would do) and are reranked by exact squared-L2.
    * This is how IVF-PQ deployments actually answer queries: the
    * codes bound memory bandwidth, the rerank restores precision, and
    * recall@k is governed by the (cheap) shortlist depth rather than
    * by raw code fidelity. Output: (query_id, rank, vec_id, l2_x1e6). */
  def adcRerankTopK(embeddings: DataFrame, cfg: PqConfig, nQueries: Int,
                    k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist smaller than k=$k")
    val cand = adcTopK(embeddings, cfg, nQueries, shortlist)
      .select(col("query_id"), col("vec_id"))
    exactRerank(embeddings, cand, nQueries, k)
  }

  /** Exact squared-L2 rerank of a (query_id, vec_id) candidate frame:
    * fetch the finalists' full vectors (broadcast semi-join — the
    * candidate side is nQueries·shortlist rows, corpus-size-
    * independent), score, keep the top k per query. */
  private def exactRerank(embeddings: DataFrame, cand: DataFrame,
                          nQueries: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("v2", Similarity.dot(col("v"), col("v")))
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.join(broadcast(cand), "vec_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("vec_id"),
        floor((col("v2") - lit(2.0) * Similarity.dot(col("qv"), col("v")))
          * 1e6).cast("long").as("l2_x1e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("l2_x1e6"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "l2_x1e6")
  }

  /** Recall of the two-stage (shortlist + rerank) top-k against the
    * exact top-k: the number that prices the shortlist depth. Output:
    * (query_id, exact_k, rerank_hits). */
  def adcRerankRecall(embeddings: DataFrame, cfg: PqConfig, nQueries: Int,
                      k: Int, shortlist: Int): DataFrame = {
    val ex = exactL2TopK(embeddings, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val rr = adcRerankTopK(embeddings, cfg, nQueries, k, shortlist)
      .select(col("query_id").as("rq"), col("vec_id").as("rv"))
    ex.join(rr, ex("query_id") === rr("rq") && ex("vec_id") === rr("rv"),
        "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("exact_k"), count(col("rv")).as("rerank_hits"))
      .orderBy("query_id")
  }

  /** IVF-PQ: the full billion-scale serving layout (FAISS
    * `IndexIVFPQ`) — coarse cells bound WHERE to look, PQ codes bound
    * WHAT it costs to look, exact rerank restores precision:
    *
    *  1. coarse quantizer = [[IvfIndex.sampleQuantizerDf]] (the
    *     SQL-replayable lowest-k sample, k = ⌈n/cellSize⌉);
    *     every corpus vector is placed in its ONE nearest cell via
    *     [[IvfIndex.assignViaJoin]] (broadcast-chunk kernel — k past
    *     driver scale is fine);
    *  2. each query probes its `nProbe` nearest cells and ADC-scores
    *     ONLY co-resident codes: ~nProbe·cellSize candidates per
    *     query regardless of corpus size, vs the n-row full ADC scan
    *     of [[adcTopK]];
    *  3. the per-query ADC shortlist is exactly reranked
    *     ([[exactRerank]]).
    *
    * Plan shape: the (vec_id → cell) placement joins the codes once
    * on vec_id (at production scale this pair is PERSISTED bucketed
    * by cell — [[IvfIndex.buildCellIndex]]'s layout with pq_code as
    * payload — so the join is a build-time cost, not a per-query
    * one); the query side (probes + LUTs, nQueries·nProbe rows) is
    * broadcast, so candidate generation is a broadcast hash join on
    * cell — the corpus never shuffles at query time.
    * Output: (query_id, rank, vec_id, l2_x1e6). */
  def ivfPqTopK(embeddings: DataFrame, cfg: PqConfig, cellSize: Int,
                nProbe: Int, nQueries: Int, k: Int,
                shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist smaller than k=$k")
    val (cents, kCells) = IvfIndex.sampleQuantizerDf(embeddings, cellSize)
    val cb = sampleCodebooks(embeddings, cfg)
    serveFromIndexed(placeAndEncode(embeddings, cents, kCells, cb, cfg),
      embeddings, cents, kCells, cb, cfg, nProbe, nQueries, k, shortlist)
  }

  /** [[ivfPqTopK]] with the coarse cell size derived from the corpus
    * by the √n/nProbe law ([[IvfIndex.ivfCellConfig]]) — the serving
    * default, so a caller never has to guess the knob that balances
    * assignment (n²/c) against rerank (n·c·p²): both terms then grow
    * as n^1.5·p at any corpus size. The pinned-cellSize form stays
    * for stable regression rows (q89/q90/q94) and experiments.
    * Auto-sizing reuses the quantizer's own corpus count
    * ([[IvfIndex.sampleQuantizerAutoDf]]) — no extra scan. */
  def ivfPqTopKAuto(embeddings: DataFrame, cfg: PqConfig, nProbe: Int,
                    nQueries: Int, k: Int, shortlist: Int,
                    rotation: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist smaller than k=$k")
    // OPQ composed into serving: the optional orthonormal rotation is
    // ONE MatVecExpr projection applied before everything else, so the
    // whole pipeline — quantizer sample, coarse placement, codebooks,
    // query LUTs, rerank — runs coherently in rotated space (the faiss
    // OPQMatrix-chained-to-IndexIVFPQ layout). It fuses into the one
    // corpus scan (d² multiply-adds per row inside codegen) and adds
    // nothing to any exchange; R is d² doubles of plan state, like the
    // codebooks. Orthonormality preserves exact L2, so recall measured
    // against the UNROTATED exact baseline stays the honest metric
    // ([[ivfPqRecallAutoRotated]]).
    val base = rotation.fold(embeddings)(r =>
      embeddings.select(col("vec_id"),
        graft.functions.VectorFunctions.matVec(col("embedding"), r)
          .as("embedding")))
    val (cents, kCells, _) =
      IvfIndex.sampleQuantizerAutoDf(base, nProbe)
    val cb = sampleCodebooks(base, cfg)
    serveFromIndexed(placeAndEncode(base, cents, kCells, cb, cfg),
      base, cents, kCells, cb, cfg, nProbe, nQueries, k, shortlist)
  }

  /** Recall of the auto-sized IVF-PQ top-k against the exact top-k —
    * [[ivfPqRecall]] through [[ivfPqTopKAuto]], so the derived-cell
    * law itself sits under the hash check (the oracle rederives
    * c = max(1, round(√n/nProbe)) from its own corpus count,
    * q81-style). Output: (query_id, exact_k, ivfpq_hits). */
  def ivfPqRecallAuto(embeddings: DataFrame, cfg: PqConfig, nProbe: Int,
                      nQueries: Int, k: Int, shortlist: Int): DataFrame = {
    val ex = exactL2TopK(embeddings, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val iv = ivfPqTopKAuto(embeddings, cfg, nProbe, nQueries, k,
        shortlist)
      .select(col("query_id").as("iq"), col("vec_id").as("iv"))
    ex.join(iv, ex("query_id") === iv("iq") && ex("vec_id") === iv("iv"),
        "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("exact_k"), count(col("iv")).as("ivfpq_hits"))
      .orderBy("query_id")
  }

  /** Rotated-vs-unrotated IVF-PQ serving recall — the OPQ rotation
    * priced inside the FULL serving path (rotate → place → ADC →
    * rerank), not just the flat ADC scan ([[adcRecallRotated]]).
    * Both pipelines are the auto-sized serving default
    * ([[ivfPqTopKAuto]]) at equal candidate budgets (same nProbe,
    * same shortlist), and both report hits against the UNROTATED
    * exact top-k — the right shared baseline, since the rotation is
    * orthonormal and preserves exact L2.
    * Output: (query_id, exact_k, ivfpq_hits, rot_hits). */
  def ivfPqRecallAutoRotated(embeddings: DataFrame, cfg: PqConfig,
                             rotation: Array[Array[Double]], nProbe: Int,
                             nQueries: Int, k: Int,
                             shortlist: Int): DataFrame = {
    val ex = exactL2TopK(embeddings, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val iv = ivfPqTopKAuto(embeddings, cfg, nProbe, nQueries, k,
        shortlist)
      .select(col("query_id").as("iq"), col("vec_id").as("iv"))
    val rot = ivfPqTopKAuto(embeddings, cfg, nProbe, nQueries, k,
        shortlist, rotation = Some(rotation))
      .select(col("query_id").as("rq"), col("vec_id").as("rv"))
    ex.join(iv, ex("query_id") === iv("iq") && ex("vec_id") === iv("iv"),
        "left")
      .join(rot, ex("query_id") === rot("rq") && ex("vec_id") === rot("rv"),
        "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("exact_k"), count(col("iv")).as("ivfpq_hits"),
        count(col("rv")).as("rot_hits"))
      .orderBy("query_id")
  }

  /** One-pass (cell, vec_id, pq_code) placement: the code is computed
    * in the SAME projection as the assignment input and rides the
    * chunk join / per-vector merge as an assignViaJoin keepCol — no
    * corpus-sized encode⋈assignment join, no extra exchange beyond
    * the assignment's own merge. */
  private[graft] def placeAndEncode(embeddings: DataFrame, cents: DataFrame,
                             kCells: Long,
                             cb: Array[Array[Array[Double]]],
                             cfg: PqConfig): DataFrame =
    IvfIndex.assignViaJoin(
      embeddings.select(col("vec_id"), col("embedding").as("v"),
        pqEncode(col("embedding"), cb, cfg.bitsPerCode).as("pq_code")),
      cents, nProbe = 1, kEstimate = Some(kCells),
      keepCols = Seq("pq_code"))

  /** Persist the IVF-PQ serving index: (cell, vec_id, pq_code)
    * BUCKETED BY cell — [[IvfIndex.buildCellIndex]]'s layout with the
    * packed code as the payload instead of the float vector, i.e. the
    * ~36×-smaller artifact a search tier actually memory-maps. Build
    * once (the n·k placement assignment is paid HERE, not per query);
    * serve many via [[ivfPqTopKFromIndex]]. Returns the catalog table
    * name. */
  def buildIvfPqIndex(embeddings: DataFrame, cfg: PqConfig, cellSize: Int,
                      warehouse: String, table: String,
                      nBuckets: Int): String = {
    val (cents, kCells) = IvfIndex.sampleQuantizerDf(embeddings, cellSize)
    val cb = sampleCodebooks(embeddings, cfg)
    val indexed = placeAndEncode(embeddings, cents, kCells, cb, cfg)
      .select("cell", "vec_id", "pq_code")
    graft.engine.TableStore.writeBucketed(indexed, warehouse, table,
      nBuckets, Seq("cell"))
  }

  /** Serve top-k from a PERSISTED index ([[buildIvfPqIndex]]): the
    * query-time plan is the index scan + broadcast probe join + ADC +
    * rerank — no encode, no placement assignment, no corpus pass
    * except the bounded rerank fetch. Centroids and codebooks are
    * re-derived from the corpus by the same deterministic sampling
    * (cheap: a TakeOrdered and a ksub-row collect), which is the
    * faiss-style contract that index and query sides share one pinned
    * quantizer. Result ≡ [[ivfPqTopK]] row-for-row (PqSpec). */
  def ivfPqTopKFromIndex(index: DataFrame, embeddings: DataFrame,
                         cfg: PqConfig, cellSize: Int, nProbe: Int,
                         nQueries: Int, k: Int,
                         shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist smaller than k=$k")
    val (cents, kCells) = IvfIndex.sampleQuantizerDf(embeddings, cellSize)
    val cb = sampleCodebooks(embeddings, cfg)
    serveFromIndexed(index, embeddings, cents, kCells, cb, cfg,
      nProbe, nQueries, k, shortlist)
  }

  /** The query-time tail with the quantizer PINNED by the caller —
    * public because the add-many lifecycle requires it: once an index
    * holds vectors placed by a given quantizer, every later query and
    * every later delta batch must use those SAME centroids/codebooks
    * (the faiss contract; see [[graft.streaming.StreamingVectorIngest]]).
    * [[ivfPqTopK]]/[[ivfPqTopKFromIndex]] wrap this with the
    * corpus-derived sample quantizer for the static-corpus case.
    * Probe assignment for the (tiny) query side, broadcast of
    * (probes, LUTs), ADC over cell-co-resident codes, shortlist
    * window, exact rerank. */
  def ivfPqServe(indexed: DataFrame, embeddings: DataFrame,
                 cents: DataFrame, kCells: Long,
                 cb: Array[Array[Array[Double]]],
                 cfg: PqConfig, nProbe: Int, nQueries: Int,
                 k: Int, shortlist: Int): DataFrame =
    serveFromIndexed(indexed, embeddings, cents, kCells, cb, cfg,
      nProbe, nQueries, k, shortlist)

  private def deletesPath(warehouse: String, table: String): String =
    graft.engine.TableStore.tablePath(warehouse, s"${table}_deletes")

  /** DELETE from a persisted IVF-PQ index — the Lucene/faiss
    * tombstone pattern, the verb that completes the lifecycle beside
    * build ([[buildIvfPqIndex]]), absorb
    * ([[IvfIndex.absorbIntoCellIndex]]'s twin), compact
    * ([[graft.streaming.StreamingVectorIngest.compact]]) and serve:
    * the ids append to a side `<table>_deletes` parquet (|deletes|
    * cost — the corpus-sized index is NOT touched), [[liveIndex]]
    * excludes them at serve time by broadcast anti-join (tombstone
    * count is bounded between purges), and [[purgeDeletes]]
    * physically drops them at the next maintenance window.
    * Idempotent: re-deleting an id is harmless (exclusion is an
    * anti-join; purge deduplicates). */
  def deleteFromIndex(warehouse: String, table: String,
                      ids: DataFrame): Unit =
    ids.select(col("vec_id").cast("long").as("vec_id"))
      .write.mode("append").parquet(deletesPath(warehouse, table))

  /** The accumulated tombstone set (empty frame when none). */
  def indexTombstones(spark: org.apache.spark.sql.SparkSession,
                      warehouse: String, table: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(deletesPath(warehouse, table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(p.toString).select("vec_id")
    else spark.range(0).select(col("id").as("vec_id"))
  }

  /** The index minus its tombstones — what serving reads between
    * purges. The anti-join sits ABOVE the bucketed scan, so cell
    * (bucket) pruning still applies to the probe. */
  def liveIndex(spark: org.apache.spark.sql.SparkSession,
                warehouse: String, table: String): DataFrame = {
    val name = graft.engine.TableStore.bucketedName(spark, warehouse, table)
    spark.table(name).join(
      broadcast(indexTombstones(spark, warehouse, table).distinct()),
      Seq("vec_id"), "left_anti")
  }

  /** Physically drop tombstoned rows: the q128 compactor pattern —
    * snapshot the index's file list, read by path (no catalog race
    * with the staged swap, no in-memory copy), anti-join the
    * tombstones, rewrite through the atomic bucketed swap, then clear
    * the tombstone table. Crash between swap and clear leaves
    * tombstones naming already-purged ids — the anti-join of absent
    * ids is a no-op, so the sequence is idempotent and serve results
    * never change across the window. Also merges the per-absorb file
    * sets back to one per bucket (a purge IS a compaction). */
  def purgeDeletes(spark: org.apache.spark.sql.SparkSession,
                   warehouse: String, table: String,
                   nBuckets: Int): String = {
    import org.apache.hadoop.fs.Path
    val name = graft.engine.TableStore.bucketedName(spark, warehouse, table)
    val schema = spark.table(name).schema
    val dst = new Path(graft.engine.TableStore.tablePath(warehouse, table))
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(fs.makeQualified(dst))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
    // repartition on the bucket key = one file per bucket out (the
    // q128 compactor contract; repartition's HashPartitioning IS the
    // bucket id function) — a purge is also a compaction
    val live = spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
      .join(broadcast(indexTombstones(spark, warehouse, table).distinct()),
        Seq("vec_id"), "left_anti")
      .repartition(nBuckets, col("cell"))
    val out = graft.engine.TableStore.writeBucketed(live, warehouse, table,
      nBuckets, Seq("cell"))
    fs.delete(new Path(deletesPath(warehouse, table)), true)
    out
  }

  private def serveFromIndexed(indexed: DataFrame, embeddings: DataFrame,
                               cents: DataFrame, kCells: Long,
                               cb: Array[Array[Array[Double]]],
                               cfg: PqConfig, nProbe: Int, nQueries: Int,
                               k: Int, shortlist: Int): DataFrame = {
    val qbase = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding").as("v"))
    val qprobes = IvfIndex.assignViaJoin(qbase, cents, nProbe = nProbe,
        kEstimate = Some(kCells))
      .select(col("vec_id").as("query_id"), col("cell"))
    val qlut = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        pqLut(col("embedding"), cb).as("lut"))
    val scored = indexed.join(broadcast(qprobes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(qlut), "query_id")
      .select(col("query_id"), col("vec_id"),
        floor(pqAdcScore(col("lut"), col("pq_code"),
          cfg.m, cfg.ksub, cfg.bitsPerCode) * 1e6)
          .cast("long").as("adc_x1e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_x1e6"), col("vec_id"))
    val cand = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    exactRerank(embeddings, cand, nQueries, k)
  }

  /** Recall of the IVF-PQ top-k against the exact squared-L2 top-k:
    * both loss sources — cell probing (misses outside the nProbe
    * cells) and code fidelity (shortlist ordering) — folded into one
    * hash-checked number. Output: (query_id, exact_k, ivfpq_hits). */
  def ivfPqRecall(embeddings: DataFrame, cfg: PqConfig, cellSize: Int,
                  nProbe: Int, nQueries: Int, k: Int,
                  shortlist: Int): DataFrame = {
    val ex = exactL2TopK(embeddings, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val iv = ivfPqTopK(embeddings, cfg, cellSize, nProbe, nQueries, k,
        shortlist)
      .select(col("query_id").as("iq"), col("vec_id").as("iv"))
    ex.join(iv, ex("query_id") === iv("iq") && ex("vec_id") === iv("iv"),
        "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("exact_k"), count(col("iv")).as("ivfpq_hits"))
      .orderBy("query_id")
  }

  /** Recall of the ADC top-k against the exact squared-L2 top-k — the
    * honesty row for the ~36× compression (the q45/q58 pattern: both
    * sides deterministic, so the recall claim itself sits under the
    * hash check). Output: (query_id, exact_k, adc_hits). */
  def adcRecall(embeddings: DataFrame, cfg: PqConfig,
                nQueries: Int, k: Int): DataFrame = {
    val ex = exactL2TopK(embeddings, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val adc = adcTopK(embeddings, cfg, nQueries, k)
      .select(col("query_id").as("aq"), col("vec_id").as("av"))
    ex.join(adc, ex("query_id") === adc("aq") && ex("vec_id") === adc("av"),
        "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("exact_k"), count(col("av")).as("adc_hits"))
      .orderBy("query_id")
  }

  /** Rotated-vs-unrotated ADC recall — OPQ's rotation priced against
    * the same exact baseline in one frame. The corpus is rotated by
    * the orthonormal `rotation` (one [[graft.functions.MatVecExpr]]
    * projection fused into the encode scan — rotation at serving
    * time is a free rider on the read), the FULL PQ pipeline
    * (codebook sample, encode, LUT, ADC top-k) reruns in rotated
    * space, and each query reports hits against the unrotated exact
    * top-k alongside the unrotated ADC hits. Orthonormality preserves
    * exact L2, so the unrotated exact set is the right baseline for
    * both columns. Output: (query_id, exact_k, adc_hits, rot_hits).
    *
    * Scale: identical to [[adcRecall]] — the rotation adds d² fused
    * multiply-adds per row to the one encode scan and nothing to the
    * shuffle; R itself is d² doubles of plan state, like the
    * codebooks. */
  def adcRecallRotated(embeddings: DataFrame, cfg: PqConfig,
                       rotation: Array[Array[Double]],
                       nQueries: Int, k: Int): DataFrame = {
    val ex = exactL2TopK(embeddings, nQueries, k)
      .select(col("query_id"), col("vec_id"))
    val adc = adcTopK(embeddings, cfg, nQueries, k)
      .select(col("query_id").as("aq"), col("vec_id").as("av"))
    val rotated = embeddings.select(col("vec_id"),
      graft.functions.VectorFunctions.matVec(col("embedding"), rotation)
        .as("embedding"))
    val rot = adcTopK(rotated, cfg, nQueries, k)
      .select(col("query_id").as("rq"), col("vec_id").as("rv"))
    ex.join(adc, ex("query_id") === adc("aq") && ex("vec_id") === adc("av"),
        "left")
      .join(rot, ex("query_id") === rot("rq") && ex("vec_id") === rot("rv"),
        "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("exact_k"), count(col("av")).as("adc_hits"),
        count(col("rv")).as("rot_hits"))
      .orderBy("query_id")
  }
}
