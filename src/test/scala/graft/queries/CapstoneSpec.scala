package graft.queries

import graft.SparkSpec

/** q147 (curation capstone v2) — the invariants the hash gate cannot
  * see. The oracle compares both engines row-for-row, but a 0-row
  * result matches a 0-row oracle: the round-15 first cut of this
  * query "passed" with ZERO packed rows because a pinned CE θ killed
  * every document. These asserts make vacuity and contract drift
  * loud. */
class CapstoneSpec extends SparkSpec {

  private lazy val rows = Registry
    .queries("q147_curation_capstone")(spark, "/root/testdata/sf0.001")
    .collect()

  test("the capstone is NON-VACUOUS: documents survive all ten " +
    "stages at the smallest sf (a 0-row result would still hash-match " +
    "a 0-row oracle)") {
    assert(rows.nonEmpty, "every document died in the cascade — the " +
      "gate is vacuous (re-derive the CE threshold / gate rates)")
  }

  test("decontamination evidence: no bench-slice doc (doc_id%10=3) " +
    "reaches the packed output") {
    assert(rows.forall(_.getLong(0) % 10 != 3),
      "a bench (eval) document survived into the training stream")
  }

  test("packing contract: start_offset is the running sum of " +
    "n_tokens in doc_id order and the chunk arithmetic is internally " +
    "consistent") {
    // output: doc_id, n_tokens, start_offset, chunk_id,
    // spans_boundary, chunks_crossed, lang, rate_ppm
    var run = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val (n, off) = (r.getLong(1), r.getLong(2))
      assert(off == run, s"doc ${r.getLong(0)}: offset $off != $run")
      run += n
      val last = math.max(off + n - 1, off)
      assert(r.getLong(3) == off / 512,
        s"doc ${r.getLong(0)}: chunk_id mismatch")
      assert(r.getBoolean(4) == (last / 512 > off / 512),
        s"doc ${r.getLong(0)}: spans_boundary mismatch")
      assert(r.getLong(5) == last / 512 - off / 512,
        s"doc ${r.getLong(0)}: chunks_crossed mismatch")
    }
  }

  test("temperature-mix contract: rate_ppm is constant per lang and " +
    "the min-count lang (rarest surviving class) carries rate 10^6") {
    val byLang = rows.groupBy(_.getString(6))
      .map { case (l, rs) => (l, rs.map(_.getLong(7)).distinct) }
    byLang.foreach { case (l, rates) =>
      assert(rates.size == 1, s"lang $l has ${rates.size} distinct rates")
    }
    // sqrt(n_min/n) = 1 for the rarest lang => 1,000,000 ppm; the mix
    // then thins nothing from it, so its full rate must appear
    assert(byLang.values.exists(_.head == 1000000L),
      s"no lang carries the n_min rate: ${byLang}")
  }
}
