package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural evidence gate (round-13 verdict item #2): three consecutive
  * rounds cited scale-probe artifacts that were never committed. The gate
  * lives in `tools/evidence_check.py`; this spec runs it at HEAD so
  * `sbt test` fails on any dangling `BENCH_*.json` citation, internally
  * inconsistent bench JSON, or unfilled "(filled below" stub in a delta
  * doc — the exact failure classes of rounds 11-13.
  */
class EvidenceGateSpec extends AnyFunSuite {

  test("evidence_check.py passes at HEAD") {
    val repoRoot = {
      var d = new java.io.File(".").getCanonicalFile
      while (d != null && !new java.io.File(d, "tools/evidence_check.py").exists())
        d = d.getParentFile
      assert(d != null, "could not locate repo root containing tools/evidence_check.py")
      d
    }
    val pb = new ProcessBuilder("python3", "tools/evidence_check.py", repoRoot.getPath)
    pb.directory(repoRoot)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val code = p.waitFor()
    assert(code == 0, s"evidence gate failed:\n$out")
  }
}
