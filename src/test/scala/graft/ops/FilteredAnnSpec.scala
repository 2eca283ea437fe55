package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** [[IvfIndex.filteredTopK]] — metadata-filtered ANN serving with the
  * selectivity dispatch. Contracts under test:
  *   - the pre-filter branch is EXACT: equal to a brute-force cosine
  *     top-k computed over only the predicate-matching vectors;
  *   - every emitted row satisfies the predicate, ranks are contiguous
  *     per query and capped at k, in both branches;
  *   - the post-filter (IVF) branch scores candidates with the same
  *     floor(·1e6) convention — on the (query, vec) pairs it shares
  *     with the exact branch the sims are identical, and its per-query
  *     results are a subset of the predicate-matching universe;
  *   - the dispatch is the threshold law: forcing the threshold to
  *     1000‰ / 0‰ flips the mode column, results labeled accordingly.
  */
class FilteredAnnSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  /** Driver-side exact reference over the (tiny) test corpus. */
  private def exactFiltered(pred: Long => Boolean, predLabel: Int => Boolean,
                            nQ: Int, k: Int): Set[(Long, Int, Long)] = {
    val rows = emb.select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
      .filter { case (_, v, _) =>
        math.sqrt(v.map(x => x * x).sum) > 0d }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val queries = rows.filter(_._1 < nQ)
    queries.flatMap { case (qid, qv, _) =>
      val cands = rows.filter { case (vid, _, lb) =>
        vid != qid && pred(vid) && predLabel(lb) }
      cands.map { case (vid, v, _) =>
        (qid, vid,
          math.floor(dot(qv, v) / (nrm(qv) * nrm(v)) * 1e6).toLong) }
        .sortBy { case (_, vid, s) => (-s, vid) }
        .take(k).zipWithIndex
        .map { case ((q, vid, _), i) => (q, i + 1, vid) }
    }.toSet
  }

  test("pre-filter branch equals the exact filtered top-k, every row " +
    "satisfies the predicate, mode labeled prefilter") {
    val got = IvfIndex.filteredTopK(emb, pmod(col("vec_id"), lit(50)) === 7,
      nQueries = 20, k = 5, cellSize = 64, nProbe = 4)
    assert(got.select("mode").distinct().collect().map(_.getString(0))
      .toSeq == Seq("prefilter"))
    assert(got.filter(pmod(col("vec_id"), lit(50)) =!= 7).count() == 0)
    val gotSet = got.select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = exactFiltered(vid => vid % 50 == 7, _ => true, 20, 5)
    assert(gotSet == want,
      s"${(gotSet -- want).take(3)} extra, ${(want -- gotSet).take(3)} missing")
  }

  test("post-filter branch: predicate holds on every row, ranks " +
    "contiguous and capped, sims match the exact convention on shared " +
    "pairs") {
    val pred = pmod(col("label"), lit(2)) === 0
    val got = IvfIndex.filteredTopK(emb, pred,
      nQueries = 20, k = 5, cellSize = 64, nProbe = 4)
    assert(got.select("mode").distinct().collect().map(_.getString(0))
      .toSeq == Seq("postfilter"))
    assert(got.filter(pmod(col("label"), lit(2)) =!= 0).count() == 0)
    val perQ = got.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .collect()
    perQ.foreach { r =>
      assert(r.getLong(1) <= 5 && r.getInt(3) == 1 &&
        r.getInt(2).toLong == r.getLong(1))
    }
    // sims agree with the exact convention wherever the pair overlaps
    val exact = exactSims(_ => true, lb => lb % 2 == 0, 20)
    got.select("query_id", "vec_id", "sim_x1e6").collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact(key) == r.getLong(2),
        s"sim mismatch at $key: ${exact(key)} vs ${r.getLong(2)}")
    }
  }

  /** All pairwise sims (query → matching candidate) for sim equality
    * checks, keyed (query_id, vec_id). */
  private def exactSims(pred: Long => Boolean, predLabel: Int => Boolean,
                        nQ: Int): Map[(Long, Long), Long] = {
    val rows = emb.select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
      .filter { case (_, v, _) => math.sqrt(v.map(x => x * x).sum) > 0d }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val queries = rows.filter(_._1 < nQ)
    (for {
      (qid, qv, _) <- queries
      (vid, v, lb) <- rows
      if vid != qid && pred(vid) && predLabel(lb)
    } yield (qid, vid) ->
      math.floor(dot(qv, v) /
        (math.sqrt(dot(qv, qv)) * math.sqrt(dot(v, v))) * 1e6).toLong).toMap
  }

  test("dispatch law: the threshold flips the branch on the same " +
    "predicate, and the forced pre-filter is exact there too") {
    val pred = pmod(col("label"), lit(2)) === 0
    val forcedPre = IvfIndex.filteredTopK(emb, pred, 20, 5, 64, 4,
      preFilterMaxPermille = 1000)
    val forcedPost = IvfIndex.filteredTopK(emb, pred, 20, 5, 64, 4,
      preFilterMaxPermille = 0)
    assert(forcedPre.select("mode").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("prefilter"))
    assert(forcedPost.select("mode").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("postfilter"))
    val gotSet = forcedPre.select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = exactFiltered(_ => true, lb => lb % 2 == 0, 20, 5)
    assert(gotSet == want)
  }
}
