package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver tail-captures ~2000 chars of stdout and json-parses the
  * LAST line — round 7's bench went `parsed: null` when the probes
  * object rode on the compact line past that window. These tests pin
  * the output contract against registry growth, without a Spark
  * session (pure string math). */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults(n: Int): Seq[(String, Bench.Probe)] =
    (0 until n).map { i =>
      (f"q$i%02d_some_long_query_name_x", Bench.Probe(123.456, 123.789,
        Some(123.5)))
    }

  test("compact line for the REAL registry plus growth headroom stays " +
    "inside the driver's tail window") {
    // every actual query name, worst realistic per-query time (two
    // digits of seconds), plus five future queries of the current
    // maximum name width — if this assert starts failing, shrink the
    // line (shorter names / drop 'unit') BEFORE the driver goes blind
    // again like round 7
    val names = SparkEntry.queries.keys.toSeq.sorted
    val widest = names.map(_.length).max
    val grown = names ++ (0 until 5).map(i => s"q9$i" + "_x" * ((widest - 3) / 2))
    val rs = grown.map((_, Bench.Probe(99.99, 99.99, None)))
    val line = Bench.compactLine(rs, "/root/testdata/sf0.1")
    assert(line.length < 1940, s"compact line ${line.length} bytes at " +
      s"${grown.size} queries — the driver window is ~2000 incl. trailing " +
      "noise, and the degradation ladder has no more bytes to give")
    assert(!line.contains("probes"), "probes must never ride the compact line")
    // at today's registry size with realistic times, full precision holds
    val today = SparkEntry.queries.keys.toSeq.sorted
      .map((_, Bench.Probe(2.34, 2.41, None)))
    assert(Bench.compactLine(today, "/root/testdata/sf0.1")
      .contains("\":2.34"), "premature precision degradation")
  }

  test("probe stability: reprobe settles an outlier; no-reprobe pairs " +
    "must agree directly; any failed run is unstable") {
    assert(Bench.Probe(1.0, 1.2, None).stable)
    assert(!Bench.Probe(1.0, 2.0, None).stable)
    // outlier 11.9 settled by two agreeing runs -> stable
    assert(Bench.Probe(11.9, 2.3, Some(2.7)).stable)
    // three mutually-disagreeing runs -> unstable
    assert(!Bench.Probe(1.0, 2.0, Some(4.0)).stable)
    assert(!Bench.Probe(-1.0, 1.0, None).stable)
    // best ignores failed runs; all-failed reports -1
    assert(Bench.Probe(-1.0, 1.5, Some(1.4)).best == 1.4)
    assert(Bench.Probe(-1.0, -1.0, None).best == -1.0)
  }

  test("both lines are valid JSON and locale-proof") {
    val default = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // comma decimals
      val rs = fakeResults(3)
      val compact = Bench.compactLine(rs, "/sf")
      val probes = Bench.probesLine(rs)
      // a comma decimal separator would corrupt these parses
      assert(compact.matches(""".*"value":\d+\.\d{2},.*"""), compact)
      assert(probes.contains("\"runs\":[123.456,123.789]"), probes)
    } finally java.util.Locale.setDefault(default)
  }
}
