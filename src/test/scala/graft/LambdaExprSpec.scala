package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.Cypher

/** Cypher lambda-expression surface: list comprehensions, reduce,
  * all/any/none/single quantifiers, map projections, map literals, pattern
  * comprehensions (ref `functions_eval_math.go:499-1560`,
  * `executor_mutations.go:680-857`). All compile to Catalyst HOFs —
  * filter/transform/aggregate/forall/exists — with no UDFs.
  */
class LambdaExprSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val g = GraphQueries.graph(spark, sf)

  private def one(q: String): Seq[Any] =
    Cypher.run(g, q).collect().head.toSeq.toSeq
  // single-row anchor so RETURN-only expressions have a frame
  private val anchor = "MATCH (r:Region) WHERE r.key = 0 "

  test("list comprehension: filter + transform") {
    assert(one(anchor + "RETURN [x IN [1,2,3,4,5] WHERE x % 2 = 1 | x * 10] AS l")
      == Seq(Seq(10L, 30L, 50L)))
  }

  test("list comprehension: filter only / transform only / identity") {
    assert(one(anchor + "RETURN [x IN [1,2,3] WHERE x > 1] AS l") == Seq(Seq(2L, 3L)))
    assert(one(anchor + "RETURN [x IN [1,2] | x + 1] AS l") == Seq(Seq(2L, 3L)))
    assert(one(anchor + "RETURN [x IN [7]] AS l") == Seq(Seq(7L)))
  }

  test("list comprehension: nested lambdas keep separate scopes") {
    assert(one(anchor + "RETURN [x IN [1,2] | [y IN [3,4] | x * y]] AS l")
      == Seq(Seq(Seq(3L, 4L), Seq(6L, 8L))))
  }

  test("reduce: non-commutative integer fold is left-to-right") {
    // ((0*2+1)*2+2)*2+3 = 11
    assert(one(anchor + "RETURN reduce(acc = 0, x IN [1,2,3] | acc * 2 + x) AS v")
      == Seq(11L))
  }

  test("reduce: integer seed widens over a double list") {
    assert(one(anchor + "RETURN reduce(acc = 0, x IN [1.5, 2.5] | acc + x) AS v")
      == Seq(4.0d))
  }

  test("quantifiers: all / any / none / single") {
    assert(one(anchor +
      """RETURN all(x IN [1,2,3] WHERE x > 0) AS a,
                all(x IN [1,2,3] WHERE x > 1) AS b,
                any(x IN [1,2,3] WHERE x = 2) AS c,
                any(x IN [1,2,3] WHERE x = 9) AS d,
                none(x IN [1,2,3] WHERE x = 9) AS e,
                single(x IN [1,2,3] WHERE x = 2) AS f,
                single(x IN [1,2,2] WHERE x = 2) AS g""")
      == Seq(true, false, true, false, true, true, false))
  }

  test("map projection and map literal: field access round-trips") {
    assert(one(anchor +
      """WITH r{.name, k2: r.key + 1} AS m, {tag: 'x', v: 7} AS lit
         RETURN m.k2 AS k2, lit.tag AS tag, lit.v AS v""")
      == Seq(1L, "x", 7L))
  }

  test("map projection .* expands hoisted property fields") {
    val row = Cypher.run(g, anchor + "RETURN r{.*} AS m").collect().head
    val m = row.getStruct(0)
    assert(m.schema.fieldNames.contains("name") && m.schema.fieldNames.contains("key"))
  }

  test("pattern comprehension collects per outer row") {
    val n = one(
      """MATCH (n:Nation) WHERE n.key = 1
         RETURN size([(n)<-[:FROM]-(c:Customer) | c.key]) AS cnt""").head
    val oracle = one(
      """MATCH (n:Nation) WHERE n.key = 1
         OPTIONAL MATCH (n)<-[:FROM]-(c:Customer)
         RETURN count(c) AS cnt""").head
    assert(n == oracle)
  }

  test("quantifier over a collected column from the graph") {
    assert(one(
      """MATCH (n:Nation) WITH collect(n.key) AS ks
         RETURN all(x IN ks WHERE x >= 0) AS ok, none(x IN ks WHERE x > 998) AS nn""")
      == Seq(true, true))
  }
}
