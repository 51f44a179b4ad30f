package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract: the headline line must stay inside the
  * driver's ~2 KB tail-capture window no matter how the query surface
  * grows or how catastrophically a round fails — four rounds of bench
  * artifacts (r05–r09) were lost to this line outgrowing the capture.
  * The full artifact is the file copy; only the headline's size is a
  * hard contract.
  */
class BenchSpec extends AnyFunSuite {

  private val Window = 2048
  private val sf = "/root/testdata/sf0.1"

  private def ok(s: Double): Either[String, (Double, Double)] = Right((s, s * 1.3))
  private def err: Either[String, (Double, Double)] =
    Left("org.apache.spark.sql.AnalysisException: " + ("x" * 160))

  test("headline stays under the tail window at any query count and failure mix") {
    val mixes: Seq[Bench.Results] = Seq(
      Seq.empty, // zero queries
      (1 to 148).map(i => (f"q$i%03d_some_rather_long_query_name", ok(i * 0.37))),
      (1 to 1000).map(i => (f"q$i%04d_some_rather_long_query_name", ok(i * 1.13))),
      // catastrophic round: EVERYTHING fails with long messages
      (1 to 1000).map(i => (f"q$i%04d_some_rather_long_query_name", err)),
      // mixed: alternating pass/fail
      (1 to 500).map(i =>
        (f"q$i%03d_mixed_name", if (i % 2 == 0) ok(0.5) else err)))
    mixes.foreach { results =>
      val line = Bench.headlineJson(results, sf, repeats = 3)
      assert(line.length < Window,
        s"headline ${line.length}B >= $Window B at ${results.size} queries")
      assert(!line.contains("\n"), "headline must be one line")
    }
  }

  test("headline and file artifact agree on totals; failures excluded from totals") {
    val results: Bench.Results = Seq(
      ("q1_a", ok(1.5)), ("q2_b", err), ("q3_c", ok(0.25)))
    val head = Bench.headlineJson(results, sf, repeats = 3)
    val full = Bench.fullJson(results, sf, repeats = 3)
    // min total = 1.75, first-run total = 1.75*1.3 = 2.275
    assert(head.contains("\"value\":1.7500") && full.contains("\"value\":1.7500"))
    assert(head.contains("\"first_run_total\":2.2750"))
    assert(head.contains("\"failed\":[\"q2_b\"]"))
    assert(head.contains("\"query_count\":3"))
    assert(full.contains("\"q2_b\":\"err\"") && full.contains("\"q1_a\":1.5000"))
    assert(full.contains("\"errors\":{\"q2_b\":"))
  }

  test("failed list caps at 20 names on the headline, full list in the file") {
    val results: Bench.Results = (1 to 60).map(i => (f"q$i%02d_x", err))
    val head = Bench.headlineJson(results, sf, repeats = 1)
    assert(head.contains("\"...+40\""), s"cap marker missing: $head")
    val full = Bench.fullJson(results, sf, repeats = 1)
    assert(full.contains("\"q60_x\"") && !full.contains("\"...+"))
  }
}
