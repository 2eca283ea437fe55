package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffle + sharding — the last stage between a
  * curated corpus and the trainer: pretraining consumes sequences in
  * pseudo-random order, re-randomized every epoch, sharded into the
  * files data-loader workers stream.
  *
  * Why not `ORDER BY rand()`: a global random sort is a RangePartitioner
  * job — a sampling pass over the corpus plus a full sort — and
  * `rand()` is not stable under task retries, so a lost executor can
  * emit a different epoch than the one a checkpoint recorded. Here the
  * permutation is a HASH: `h = h60("shuffle:<epoch>:" || key)` (the
  * md5-derived, engine-portable [[Hashing.h60]], so the whole operator
  * replays in the DuckDB oracle), `shard = h mod nShards`, and the
  * within-shard order is (h, key) — a total order, collision-proof via
  * the key tiebreak, bit-stable under retries, and changing the epoch
  * salt re-permutes everything.
  *
  * Scale shape: ONE hash-partition exchange on `shard` + a per-shard
  * local sort (the `Window.partitionBy(shard)`), no sampling pass, no
  * global sort. Each shard is a single task's sort, so `nShards` must
  * be chosen the way trainer shard counts already are: total rows /
  * target rows-per-file (thousands of shards at corpus scale — which
  * also saturates cluster parallelism; a tiny nShards under-parallelizes
  * AND over-sizes files). The (shard, shard_pos) pair is a stable
  * address: an interrupted epoch resumes from (shard, pos) exactly.
  */
object Sharding {

  /** Columns this operator generates; a colliding input would fail as
    * ambiguous deep inside the window — reject by name at entry. */
  private val Reserved = Set("shard", "shard_pos", "__shuffle_h")

  /** Assign every row a shard in [0, nShards) and a dense 0-based
    * position within its shard, both functions of
    * h60("shuffle:<epoch>:" || key) alone — deterministic,
    * epoch-salted, oracle-replayable. All input columns ride through.
    * `keyCol` must be unique per row (it is the permutation domain and
    * the collision tiebreak). */
  def epochShards(rows: DataFrame, nShards: Int, epoch: Int,
                  keyCol: String = "chunk_id"): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    val bad = rows.columns.filter(Reserved)
    require(bad.isEmpty,
      s"input column(s) ${bad.mkString(", ")} collide with columns this " +
        "operator generates (" + Reserved.toSeq.sorted.mkString(", ") +
        ") — rename before sharding")
    val h = Hashing.h60(
      concat(lit(s"shuffle:$epoch:"), col(keyCol).cast("string")))
    val w = Window.partitionBy("shard")
      .orderBy(col("__shuffle_h"), col(keyCol))
    rows.withColumn("__shuffle_h", h)
      .withColumn("shard", pmod(col("__shuffle_h"), lit(nShards.toLong)))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("__shuffle_h")
  }
}
