package graft.cypher

/** Typed Cypher AST — the piece the reference lacks entirely (it routes raw
  * query strings through ~60 regex/keyword handlers,
  * `/root/reference/pkg/cypher/executor.go:1153-1441`, which is why its chaos
  * tests exist). A real AST makes planning compositional and injection-proof.
  */
object Ast {

  // ---- expressions ----------------------------------------------------
  sealed trait Expr
  case class Lit(v: Any) extends Expr // String | Long | Double | Boolean | null
  case class Variable(name: String) extends Expr
  case class Prop(variable: String, key: String) extends Expr
  case class Param(name: String) extends Expr
  case class FnCall(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  case class Bin(op: String, l: Expr, r: Expr) extends Expr // + - * / % = <> < > <= >= AND OR IN =~ STARTSWITH ENDSWITH CONTAINS
  case class Not(e: Expr) extends Expr
  case class IsNull(e: Expr, negated: Boolean) extends Expr
  case class CaseExpr(scrutinee: Option[Expr], whens: Seq[(Expr, Expr)], default: Option[Expr]) extends Expr
  case class ListLit(items: Seq[Expr]) extends Expr
  case class Index(list: Expr, idx: Expr) extends Expr
  // l[from..to] — Neo4j slice: 0-based, from inclusive, to exclusive,
  // negatives count from the end, out-of-range clamps
  case class SliceExpr(list: Expr, from: Option[Expr], to: Option[Expr]) extends Expr
  case class HasLabel(variable: String, label: String) extends Expr
  /** exists((a)-[:T]->(b)) or EXISTS { (a)-[:T]->(b) [WHERE …] } */
  case class ExistsPattern(path: PatternPath, where: Option[Expr] = None) extends Expr
  /** COUNT { (a)-[:T]->(b) [WHERE …] } expression subquery. */
  case class CountPattern(path: PatternPath, where: Option[Expr]) extends Expr
  /** COLLECT { MATCH … RETURN x } expression subquery (correlated by
    * shared variable names, Neo4j-style).
    */
  case class CollectSubquery(inner: SingleQuery) extends Expr
  case class CountStar() extends Expr
  /** `[x IN list WHERE pred | proj]` — either part optional
    * (ref `functions_eval_math.go:1411-1560`). Compiles to Catalyst
    * `filter`/`transform` HOFs (codegen'd, no UDF).
    */
  case class ListComp(variable: String, list: Expr, where: Option[Expr],
      proj: Option[Expr]) extends Expr
  /** `reduce(acc = init, x IN list | step)` (ref
    * `functions_eval_math.go:499-548`) → Catalyst `aggregate` HOF.
    */
  case class ReduceExpr(acc: String, init: Expr, variable: String, list: Expr,
      step: Expr) extends Expr
  /** `all/any/none/single(x IN list WHERE pred)` list predicates →
    * `forall`/`exists` HOFs (3-valued logic matches openCypher).
    */
  case class Quantifier(kind: String, variable: String, list: Expr,
      where: Expr) extends Expr
  /** One item of a map projection: `.key` (property), `key: expr`
    * (computed), `.*` (all properties), or `var` (outer variable by name).
    */
  case class MapProjItem(key: String, value: Option[Expr])
  /** `n{.name, total: x, .*}` (ref `executor_mutations.go:680-857`) →
    * named struct column.
    */
  case class MapProjection(variable: String, items: Seq[MapProjItem]) extends Expr
  /** `{k1: e1, k2: e2}` map literal in expression position → named struct. */
  case class MapLit(items: Seq[(String, Expr)]) extends Expr

  // ---- patterns -------------------------------------------------------
  sealed trait Dir
  case object DirOut extends Dir
  case object DirIn extends Dir
  case object DirBoth extends Dir

  /** `extraLabels`: additional labels in `(:A:B:C)` — ALL must be present. */
  case class NodePat(variable: Option[String], label: Option[String], props: Map[String, Expr],
      extraLabels: Seq[String] = Seq.empty)
  /** `altTypes`: alternation types in `[:T1|T2]` — rel type must be ANY of
    * (relType ++ altTypes).
    */
  case class RelPat(
      variable: Option[String],
      relType: Option[String],
      dir: Dir,
      varLength: Option[(Int, Int)], // (min,max); None = single hop
      props: Map[String, Expr],
      altTypes: Seq[String] = Seq.empty)
  /** `pathVar`: `p = …` binding; `shortest`: Some("single") for
    * shortestPath(…), Some("all") for allShortestPaths(…).
    */
  case class PatternPath(first: NodePat, hops: Seq[(RelPat, NodePat)],
      pathVar: Option[String] = None, shortest: Option[String] = None)

  // ---- clauses --------------------------------------------------------
  case class SortItem(expr: Expr, ascending: Boolean)
  case class ProjectionItem(expr: Expr, alias: Option[String])

  sealed trait Clause
  /** `hints`: USING INDEX/SCAN/JOIN hints (accepted for parity —
    * `index_hints.go:1-40`; Catalyst's CBO makes them advisory no-ops,
    * surfaced in EXPLAIN).
    */
  case class MatchClause(paths: Seq[PatternPath], optional: Boolean, where: Option[Expr],
      hints: Seq[String] = Seq.empty) extends Clause
  // ---- write clauses (§2.8) ----
  case class CreateClause(paths: Seq[PatternPath]) extends Clause
  case class MergeClause(path: PatternPath,
      onCreateSet: Seq[(Prop, Expr)], onMatchSet: Seq[(Prop, Expr)]) extends Clause
  case class SetClause(items: Seq[(Prop, Expr)]) extends Clause
  case class DeleteClause(vars: Seq[String], detach: Boolean) extends Clause
  case class RemoveClause(items: Seq[Prop]) extends Clause
  case class ForeachClause(variable: String, list: Expr, updates: Seq[Clause]) extends Clause
  /** CALL { … } subquery; correlation via a leading import WITH.
    * `inTransactionsOf`: CALL { … } IN TRANSACTIONS [OF n ROWS] — the
    * write executor applies the body in driving-row batches (§2.8
    * `executor_subqueries.go:580,666`).
    */
  case class CallSubquery(inner: SingleQuery,
      inTransactionsOf: Option[Long] = None) extends Clause
  /** CALL db.labels() YIELD label [AS l] WHERE … — procedure invocation
    * (§2.9 YIELD post-processing, `call.go:36-56`).
    */
  case class CallProc(name: String, args: Seq[Expr],
      yields: Seq[(String, Option[String])], where: Option[Expr]) extends Clause
  case class WithClause(
      items: Seq[ProjectionItem], distinct: Boolean, where: Option[Expr],
      orderBy: Seq[SortItem], skip: Option[Long], limit: Option[Long]) extends Clause
  case class UnwindClause(expr: Expr, alias: String) extends Clause
  case class ReturnClause(
      items: Seq[ProjectionItem], distinct: Boolean,
      orderBy: Seq[SortItem], skip: Option[Long], limit: Option[Long]) extends Clause

  /** One single-part query; UNION combines several. */
  case class SingleQuery(clauses: Seq[Clause])
  case class Query(parts: Seq[SingleQuery], unionAll: Seq[Boolean]) // unionAll.size == parts.size-1
}
