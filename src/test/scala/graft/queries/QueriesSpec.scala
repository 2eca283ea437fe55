package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.ops.Similarity
import graft.engine.Tables

/** Smoke + semantics over the registered capability queries (sf0.001)
  * and ANN recall vs the exact baseline. */
class QueriesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query returns a non-empty deterministic result") {
    Registry.all.foreach { q =>
      val df = q.fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("queries and oracleSql keys line up") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    // every query except the documented rows-only ones has an oracle
    val rowsOnly = qk -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q26_ann_lsh_topk"), s"unexpected rows-only: $rowsOnly")
  }

  test("ANN LSH top-k recall >= 0.5 vs brute force at k=5") {
    val emb = Tables(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, 20, 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annTopK(emb, 20, 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall too low")
  }
}
