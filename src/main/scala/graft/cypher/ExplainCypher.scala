package graft.cypher

import Ast._

/** EXPLAIN surface (SURVEY §2.9): maps the typed AST to the reference's
  * plan-operator vocabulary (`/root/reference/pkg/cypher/explain.go:37-80`:
  * NodeByLabelScan, AllNodesScan, Expand(All), OptionalExpand,
  * VarLengthExpand, Filter, EagerAggregation, Projection, Sort, Skip,
  * Limit, Distinct, Unwind, ProduceResults). The Spark physical plan is
  * available separately via DataFrame.explain; this view answers "what
  * would Neo4j call these steps".
  */
object ExplainCypher {

  def operators(query: String): Seq[String] = {
    val q = Parser.parse(query)
    val ops = Vector.newBuilder[String]
    q.parts.foreach { part =>
      part.clauses.foreach {
        case m: MatchClause =>
          m.paths.foreach { p =>
            ops += (p.first.label match {
              case Some(l) => s"NodeByLabelScan(:$l)"
              case None => "AllNodesScan"
            })
            p.hops.foreach { case (rel, node) =>
              val relName = rel.relType.map(t => s":$t").getOrElse("")
              ops += (rel.varLength match {
                case Some((mn, mx)) => s"VarLengthExpand($relName*$mn..$mx)"
                case None if m.optional => s"OptionalExpand($relName)"
                case None => s"Expand($relName)"
              })
              node.label.foreach(l => ops += s"Filter(:$l)")
            }
          }
          m.hints.foreach(h => ops += s"Hint($h)")
          if (m.where.isDefined) ops += "Filter"
        case u: UnwindClause => ops += s"Unwind(${u.alias})"
        case w: WithClause =>
          ops += (if (w.items.exists(i => hasAgg(i.expr))) "EagerAggregation" else "Projection")
          if (w.where.isDefined) ops += "Filter"
          if (w.orderBy.nonEmpty) ops += "Sort"
          if (w.skip.isDefined) ops += "Skip"
          if (w.limit.isDefined) ops += "Limit"
          if (w.distinct) ops += "Distinct"
        case r: ReturnClause =>
          ops += (if (r.items.exists(i => hasAgg(i.expr))) "EagerAggregation" else "Projection")
          if (r.distinct) ops += "Distinct"
          if (r.orderBy.nonEmpty) ops += "Sort"
          if (r.skip.isDefined) ops += "Skip"
          if (r.limit.isDefined) ops += "Limit"
        case _: CreateClause => ops += "Create"
        case _: MergeClause => ops += "Merge"
        case _: SetClause => ops += "SetProperty"
        case d: DeleteClause => ops += (if (d.detach) "DetachDelete" else "Delete")
        case _: RemoveClause => ops += "RemoveProperty"
        case _: ForeachClause => ops += "Foreach"
        case _: CallSubquery => ops += "Apply" // Neo4j's CALL{} operator
        case cp: CallProc => ops += s"ProcedureCall(${cp.name})"
      }
    }
    ops += "ProduceResults"
    ops.result()
  }

  private def hasAgg(e: Expr): Boolean = e match {
    case CountStar() => true
    case FnCall(n, args, _) =>
      Set("count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp")
        .contains(n) || args.exists(hasAgg)
    case Bin(_, l, r) => hasAgg(l) || hasAgg(r)
    case Not(x) => hasAgg(x)
    case _ => false
  }
}
