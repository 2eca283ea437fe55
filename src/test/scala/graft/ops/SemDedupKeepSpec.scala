package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SemDeDup keep policy: centroid-nearest member wins (not the
  * lowest id), singletons and zero vectors keep themselves. */
class SemDedupKeepSpec extends SparkSpec {
  import spark.implicits._

  private def unit(axis: Int, tilt: Double, tiltAxis: Int): Seq[Float] = {
    val v = Array.fill(64)(0.0)
    v(axis) = 1.0
    v(tiltAxis) = tilt
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat).toSeq
  }

  test("centroid-nearest member is kept — the middle of a fan, not the " +
    "lowest id; singletons and the zero vector keep themselves") {
    // three unit vectors fanned 0 / ~5.7 / ~11.3 degrees apart in the
    // (e0, e1) plane: all pairwise cos > 0.98 -> one cluster; the
    // centroid's direction is the middle of the fan, so vec 1 (NOT
    // the lowest id 0) is the representative
    val rows = Seq(
      (0L, unit(0, 0.0, 1)),
      (1L, unit(0, 0.1, 1)),
      (2L, unit(0, 0.2, 1)),
      (50L, unit(7, 0.0, 8)),            // far singleton
      (60L, Seq.fill(64)(0f)))           // zero vector: pairs with nobody
      .toDF("vec_id", "embedding")
    val got = Similarity.semDedupKeep(rows, 0.4)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val byId = got.map(t => t._1 -> t).toMap
    // one cluster rooted at 0 containing 0,1,2
    assert(Seq(0L, 1L, 2L).forall(id => byId(id)._2 == 0L))
    assert(got.count { case (id, root, _) => root == 0L } == 3)
    // the centroid-nearest middle vector wins, not the lowest id
    assert(byId(1L)._3, "vec 1 (centroid-nearest) must be kept")
    assert(!byId(0L)._3 && !byId(2L)._3)
    // singleton and zero vector keep themselves at their own root
    assert(byId(50L)._2 == 50L && byId(50L)._3)
    assert(byId(60L)._2 == 60L && byId(60L)._3)
  }
}
