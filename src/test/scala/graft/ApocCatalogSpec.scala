package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.{ApocCatalog, Ast, Cypher, Planner}
import graft.graph.GraphStore

/** The coverage contract behind `apoc.help`: every name in [[ApocCatalog]]
  * (the reference registry's full 983-name surface) must RESOLVE in the
  * live dispatcher — as a CALL procedure, as a compilable function, or
  * through the Cypher string surface. A name that merely sits in the list
  * without an implementation fails here.
  */
class ApocCatalogSpec extends AnyFunSuite {
  import TestSpark._
  import Ast._

  test("catalog has exactly the reference surface, lowercased and distinct") {
    assert(ApocCatalog.all.size == 983)
    assert(ApocCatalog.all.distinct.size == 983)
    assert(ApocCatalog.all.forall(n => n == n.toLowerCase && n.startsWith("apoc.")))
  }

  test("every ApocCatalog name resolves as a procedure or function") {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(g)
    val procs = Planner.procedureNames.toSet

    // a frame with a node var n and a rel var r bound, for probe compiles
    val probeFrame = {
      val seed = Planner.seedFrame(g)
      val df = g.nodes.limit(1).select(
        org.apache.spark.sql.functions.col("id").as("n_id"),
        org.apache.spark.sql.functions.col("labels").as("n_labels"),
        org.apache.spark.sql.functions.col("properties").as("n_properties"),
        org.apache.spark.sql.functions.col("id").as("m_id"),
        org.apache.spark.sql.functions.col("labels").as("m_labels"),
        org.apache.spark.sql.functions.col("properties").as("m_properties"))
      Planner.Frame(df, seed.kinds ++ Map("n" -> Planner.NodeK, "m" -> Planner.NodeK))
    }

    def unknownFn(e: Throwable): Boolean =
      e.getMessage != null && e.getMessage.contains("unknown function")

    val argShapes: Seq[Seq[Expr]] = Seq(
      Seq(Lit(1L)), Seq(Lit("x")), Seq(Lit("x"), Lit("y")),
      Seq(Lit(1L), Lit(2L)), Seq(ListLit(Seq(Lit(1L), Lit(2L)))),
      Seq(ListLit(Seq(Lit(1L), Lit(2L))), Lit(1L)),
      Seq(Variable("n")), Seq(Variable("n"), Lit("x")),
      Seq(Variable("n"), Variable("m")), Seq())

    def resolvesAsFn(name: String): Boolean = argShapes.exists { args =>
      try { Planner.compile(FnCall(name, args, false), probeFrame, Map.empty); true }
      catch {
        case e: Throwable if unknownFn(e) => false
        case _: Throwable => true // a case arm matched; args were wrong
      }
    }

    // last resort: plan (never execute) a tiny query using the name in
    // entity position — some members only exist via grouped-join rewrites
    def resolvesViaCypher(name: String): Boolean = Seq(
      s"MATCH (n:Region) RETURN $name(n) AS x",
      s"MATCH (n:Region) RETURN $name(n, 'PLACED') AS x",
      s"MATCH (n:Region)-[r]->(m) RETURN $name(r) AS x",
      s"MATCH (n:Region)-[r]->(m) RETURN $name(r, n) AS x",
      s"CALL $name() YIELD value RETURN value"
    ).exists { q =>
      try { Cypher.run(g, q); true }
      catch {
        case e: Throwable if e.getMessage != null &&
          (e.getMessage.contains("unknown function") ||
            e.getMessage.contains("unknown procedure")) => false
        case _: Throwable => true
      }
    }

    val unresolved = ApocCatalog.all.filterNot(procs)
      .filterNot(resolvesAsFn)
      .filterNot(resolvesViaCypher)
    assert(unresolved.isEmpty,
      s"${unresolved.size} catalog names do not resolve: ${unresolved.mkString(", ")}")
  }

  test("apoc.help filters by substring and types by registry membership") {
    val g = GraphQueries.graph(spark, sf)
    val rows = Cypher.run(g,
      "CALL apoc.help('text.indexof') YIELD name, type RETURN name, type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("apoc.text.indexof", "function")))
    val iter = Cypher.run(g,
      "CALL apoc.help('periodic.iterate') YIELD name, type RETURN name, type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(iter == Set(("apoc.periodic.iterate", "procedure")))
  }
}
