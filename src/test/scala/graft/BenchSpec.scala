package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract: the headline line must stay inside the
  * driver's ~2 KB tail-capture window no matter how the query surface
  * grows or how catastrophically a round fails — four rounds of bench
  * artifacts (r05–r09) were lost to this line outgrowing the capture.
  * The full artifact is the file copy; only the headline's size is a
  * hard contract. Round 14 adds the self-attribution fields (loadavg,
  * median total, repeat spread) — pinned here so the artifact can
  * separate "loaded host" from "slow code" without out-of-band reruns.
  */
class BenchSpec extends AnyFunSuite {

  private val Window = 2048
  private val sf = "/root/testdata/sf0.1"

  // three samples per query: first run 1.3×, min s, median 1.1× s
  private def ok(s: Double): Either[String, Seq[Double]] =
    Right(Seq(s * 1.3, s, s * 1.1))
  private def err: Either[String, Seq[Double]] =
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
      val line = Bench.headlineJson(results, sf, repeats = 3,
        loadStart = "31.92 28.44 20.01", loadEnd = "30.07 29.11 21.55")
      assert(line.length < Window,
        s"headline ${line.length}B >= $Window B at ${results.size} queries")
      assert(!line.contains("\n"), "headline must be one line")
    }
  }

  test("headline and file artifact agree on totals; failures excluded from totals") {
    val results: Bench.Results = Seq(
      ("q1_a", ok(1.5)), ("q2_b", err), ("q3_c", ok(0.25)))
    val head = Bench.headlineJson(results, sf, repeats = 3,
      loadStart = "1.00 2.00 3.00", loadEnd = "4.00 5.00 6.00")
    val full = Bench.fullJson(results, sf, repeats = 3,
      loadStart = "1.00 2.00 3.00", loadEnd = "4.00 5.00 6.00")
    // min total = 1.75, first-run total = 1.75*1.3, median total = 1.75*1.1
    assert(head.contains("\"value\":1.7500") && full.contains("\"value\":1.7500"))
    assert(head.contains("\"first_run_total\":2.2750"))
    assert(head.contains("\"median_total\":1.9250") &&
      full.contains("\"median_total\":1.9250"))
    // repeat totals are 2.275 / 1.75 / 1.925 → spread = 2.275/1.75 = 1.3
    assert(head.contains("\"spread\":1.3000") && full.contains("\"spread\":1.3000"))
    assert(head.contains("\"load_start\":\"1.00 2.00 3.00\"") &&
      full.contains("\"load_end\":\"4.00 5.00 6.00\""))
    assert(head.contains("\"failed\":[\"q2_b\"]"))
    assert(head.contains("\"query_count\":3"))
    assert(full.contains("\"q2_b\":\"err\"") && full.contains("\"q1_a\":1.5000"))
    assert(full.contains("\"queries_median\":") &&
      full.contains("\"q1_a\":1.6500"), s"median map missing: $full")
    assert(full.contains("\"errors\":{\"q2_b\":"))
  }

  test("spread: 1.0 on empty / single-repeat; robust to a failed query's short samples") {
    assert(Bench.spread(Seq.empty) == 1.0)
    assert(Bench.spread(Seq(("q1", Right(Seq(2.0))))) == 1.0)
    // aligned by index over successful queries only
    val r: Bench.Results = Seq(
      ("q1", Right(Seq(1.0, 2.0, 1.0))), ("q2", Right(Seq(1.0, 2.0, 1.0))),
      ("q3", err))
    assert(math.abs(Bench.spread(r) - 2.0) < 1e-12)
  }

  test("loadavg reads three fields on Linux") {
    val l = Bench.loadavg()
    assert(l.isEmpty || l.split(" ").length == 3, s"unexpected loadavg: $l")
  }

  test("failed list caps at 20 names on the headline, full list in the file") {
    val results: Bench.Results = (1 to 60).map(i => (f"q$i%02d_x", err))
    val head = Bench.headlineJson(results, sf, repeats = 1)
    assert(head.contains("\"...+40\""), s"cap marker missing: $head")
    val full = Bench.fullJson(results, sf, repeats = 1)
    assert(full.contains("\"q60_x\"") && !full.contains("\"...+"))
  }

  test("isolate mode: fresh child JVM per query, child min merged; unknown query is an error") {
    // real e2e — two child JVMs at sf0.001 (one valid cheap query, one
    // bogus name); proves the command construction, env plumbing, and
    // child-artifact parse, not just string helpers
    val r = Bench.isolateRun(Seq("q01_pricing_summary", "zz_not_a_query"),
      "/root/testdata/sf0.001", repeats = 1,
      warmupDir = "/root/testdata/sf0.001", timeoutSec = 600L)
    assert(r.map(_._1) == Seq("q01_pricing_summary", "zz_not_a_query"))
    r.head._2 match {
      case Right(samples) =>
        assert(samples.length == 1 && samples.head > 0.0)
      case Left(m) => fail(s"isolated q01 failed: $m")
    }
    assert(r(1)._2.isLeft, "a query name the child cannot resolve must be an error")
  }
}
