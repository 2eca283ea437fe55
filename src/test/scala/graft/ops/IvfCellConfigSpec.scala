package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[IvfIndex.ivfCellConfig]] — the derived flat-IVF cell-size law
  * (c* = sqrt(n)/nProbe). Pins the properties the scaladoc prices:
  * monotone growth with the corpus, the assignment/rerank balance at
  * the optimum, and near-optimality of the integer rounding against
  * the true integer minimum of the work model. */
class IvfCellConfigSpec extends AnyFunSuite {

  /** The work model from the scaladoc: assignment n·k = n²/c plus
    * rerank Σn_c² ≈ n·c·p². */
  private def work(n: Long, c: Long, p: Int): Double =
    n.toDouble * n / c + n.toDouble * c * p * p

  test("monotone non-decreasing in n, positive everywhere") {
    for (p <- Seq(1, 2, 4)) {
      var prev = 0
      for (n <- Seq(0L, 1L, 10L, 100L, 5050L, 1000000L, 1000000000L)) {
        val c = IvfIndex.ivfCellConfig(n, p)
        assert(c >= 1, s"n=$n p=$p: c=$c")
        assert(c >= prev, s"n=$n p=$p: c=$c < previous $prev")
        prev = c
      }
    }
  }

  test("clamp: tiny corpora get singleton cells, never zero") {
    assert(IvfIndex.ivfCellConfig(0) == 1)
    assert(IvfIndex.ivfCellConfig(1) == 1)
    assert(IvfIndex.ivfCellConfig(3, nProbe = 4) == 1)
  }

  test("balance: at the derived size, assignment and rerank work agree " +
    "within rounding (both n^1.5·p)") {
    for (n <- Seq(100000L, 10000000L, 1000000000L); p <- Seq(1, 2, 4)) {
      val c = IvfIndex.ivfCellConfig(n, p).toLong
      val assignW = n.toDouble * n / c
      val rerankW = n.toDouble * c * p * p
      val ratio = assignW / rerankW
      assert(ratio > 0.5 && ratio < 2.0,
        s"n=$n p=$p c=$c: assignment/rerank = $ratio")
    }
  }

  test("near-optimal: the rounded integer c is within 1% of the best " +
    "integer c under the work model") {
    for (n <- Seq(4096L, 100000L, 10000000L); p <- Seq(1, 2)) {
      val c = IvfIndex.ivfCellConfig(n, p).toLong
      val got = work(n, c, p)
      // the model is convex in c, so scanning a window around the
      // analytic optimum finds the true integer minimum
      val opt = math.sqrt(n.toDouble) / p
      val lo = math.max(1L, math.floor(opt).toLong - 2)
      val best = (lo to lo + 4).map(work(n, _, p)).min
      assert(got <= best * 1.01, s"n=$n p=$p: work(c=$c)=$got best=$best")
    }
  }

  test("the old fixed 64 loses to the law by the predicted margin at " +
    "1e9 vectors") {
    val n = 1000000000L
    val derived = work(n, IvfIndex.ivfCellConfig(n, 2).toLong, 2)
    val fixed = work(n, 64L, 2)
    // scaladoc: ~250x assignment reduction dominates; total should be
    // two orders of magnitude apart
    assert(fixed / derived > 100.0, s"fixed=$fixed derived=$derived")
  }
}
