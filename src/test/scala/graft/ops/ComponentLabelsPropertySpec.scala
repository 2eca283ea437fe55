package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check for the RDD connected-components kernel: on random
  * graphs, componentLabels must agree with a driver-side union-find —
  * same partition of nodes into components, min-id root per component,
  * keep marking exactly the roots. Exercises singleton re-union,
  * convergence detection, and the cogroup round against shapes the two
  * oracle queries never produce (chains, stars, multi-edges,
  * self-loops, empty graphs). */
class ComponentLabelsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(1042L + i)).get)

  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // path-compress to the true min root
    nodes.map(n => n -> find(n)).toMap
  }

  test("componentLabels matches driver-side union-find on random graphs") {
    val nodeIds = (0L until 40L).map(_ * 7 + 3) // non-contiguous ids
    val edgeGen = Gen.listOfN(35,
      Gen.zip(Gen.oneOf(nodeIds), Gen.oneOf(nodeIds)))
    samples(edgeGen, 6).zipWithIndex.foreach { case (edges, i) =>
      val expected = unionFind(nodeIds, edges)
      val got = Dedup.componentLabels(
          nodeIds.toDF("id"),
          edges.toDF("a", "b"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(got.length == nodeIds.length, s"case $i: row count")
      got.foreach { case (id, root, keep) =>
        assert(root == expected(id), s"case $i: node $id root")
        assert(keep == (id == root), s"case $i: node $id keep flag")
      }
    }
  }

  test("edge endpoints outside `nodes` bridge components but emit no " +
    "output row (the universe is exactly `nodes`)") {
    // 1 -9- 2: node 9 is not in nodes but connects 1 and 2
    val got = Dedup.componentLabels(
        Seq(1L, 2L, 3L).toDF("id"),
        Seq((1L, 9L), (9L, 2L)).toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSet == Set((1L, 1L, true), (2L, 1L, false), (3L, 3L, true)))
  }

  test("empty edge set: every node is its own singleton component") {
    val got = Dedup.componentLabels(
        (1L to 5L).toDF("id"),
        Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSet == (1L to 5L).map(i => (i, i, true)).toSet)
  }

  test("self-loops and duplicate edges change nothing") {
    val got = Dedup.componentLabels(
        (1L to 4L).toDF("id"),
        Seq((1L, 2L), (2L, 1L), (3L, 3L), (1L, 2L)).toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
  }
}
