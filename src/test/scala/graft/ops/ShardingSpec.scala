package graft.ops

import graft.SparkSpec
import graft.engine.Tables

/** [[Sharding.epochShards]] — the deterministic epoch shuffle.
  * Contracts: the output is a permutation (every input row exactly
  * once, shard_pos dense per shard), shard and order equal the
  * h60Scala driver model exactly, a different epoch yields a different
  * permutation, and reserved-column collisions fail by name at entry.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def chunks = Packing
    .packChunks(Tables(spark, "/root/testdata/sf0.001", "documents"), 512L)
    .select("chunk_id").distinct()

  test("epochShards equals the h60 driver model: shard, order, dense " +
    "positions") {
    val got = Sharding.epochShards(chunks, 8, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = chunks.collect().map(_.getLong(0))
      .map { id =>
        val h = Hashing.h60Scala(s"shuffle:1:$id")
        (id, h % 8, h)
      }
      .groupBy(_._2).toSeq.flatMap { case (_, rs) =>
        rs.toSeq.sortBy(r => (r._3, r._1)).zipWithIndex
          .map { case ((id, s, _), i) => (id, s, i.toLong) }
      }.toSet
    assert(got.length == chunks.count(), "must be a permutation")
    assert(got.toSet == want)
    // dense positions per shard
    got.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"shard $shard positions not dense")
    }
  }

  test("a different epoch re-permutes (and no shard is empty at this " +
    "size)") {
    val e1 = Sharding.epochShards(chunks, 8, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e2 = Sharding.epochShards(chunks, 8, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e1 != e2, "epoch salt must change the permutation")
    assert(e1.map(_._2).size == 8 && e2.map(_._2).size == 8)
  }

  test("reserved-column collisions fail by name at entry") {
    val bad = Seq((1L, 0L)).toDF("chunk_id", "shard")
    val e = intercept[IllegalArgumentException] {
      Sharding.epochShards(bad, 4, 0)
    }
    assert(e.getMessage.contains("shard"))
  }
}
