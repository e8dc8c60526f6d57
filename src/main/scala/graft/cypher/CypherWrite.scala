package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.{GraphStore, PropertyGraph}
import Ast._
import Planner.{Frame, NodeK, ValK}

/** Write-clause executor (SURVEY §2.8: `create.go`, `merge.go`,
  * `executor_mutations.go`): runs a Cypher statement containing
  * CREATE / MERGE [ON CREATE SET / ON MATCH SET] / SET / DELETE /
  * DETACH DELETE / REMOVE against a [[GraphStore]], interleaved with the
  * read clauses (MATCH/UNWIND/WITH) planned by [[Planner.advance]].
  *
  * Determinism contract: created nodes must carry a `key` property (their
  * id becomes `Label:key`) — auto-generated ids would break snapshot
  * replay. Relationship creation requires both endpoints bound. Each write
  * clause commits one snapshot swap; the statement sees its own writes.
  */
object CypherWrite {

  case class WriteResult(
      nodesCreated: Long, nodesDeleted: Long,
      relationshipsCreated: Long, relationshipsDeleted: Long,
      propertiesSet: Long, returned: Option[DataFrame])

  def execute(store: GraphStore, query: String,
      params: Map[String, Any] = Map.empty): WriteResult = {
    val q = Parser.parse(query)
    require(q.parts.size == 1, "UNION not supported in write statements")
    var g = store.snapshot
    var frame = Planner.seedFrame(g)
    var first = true
    var nc, nd, rc, rd, ps = 0L
    var returned: Option[DataFrame] = None

    def refresh(): Unit = { g = store.snapshot }

    /** Apply one WRITE clause against a binding frame; returns the frame
      * (possibly with newly bound variables). Shared by the main clause
      * loop and FOREACH bodies (FOREACH nests arbitrarily).
      */
    def applyWrite(c: Clause, frame0: Frame): Frame = c match {
      case CreateClause(paths) =>
        var fr = frame0
        paths.foreach { p =>
          if (p.hops.isEmpty) {
            val (df, v) = nodeRows(fr, p.first, params)
            nc += store.createNodes(df.dropDuplicates("id")).nodesCreated
            refresh()
            fr = bindNodeInFrame(fr, v, p.first, params)
          } else {
            require(p.hops.size == 1, "CREATE supports single-hop relationship patterns")
            val (rel, endPat) = p.hops.head
            val aVar = p.first.variable.getOrElse(sys.error("CREATE rel: unbound start"))
            val bVar = endPat.variable.getOrElse(sys.error("CREATE rel: unbound end"))
            require(fr.kinds.get(aVar).contains(NodeK) && fr.kinds.get(bVar).contains(NodeK),
              "CREATE relationship requires both endpoints bound")
            val t = rel.relType.getOrElse(sys.error("CREATE rel needs a type"))
            val props = rel.props.map { case (k, e) => (k, Planner.compile(e, fr, params)) }
            val edges = fr.df.select(
              concat_ws("|", lit(t), col(s"${aVar}_id"), col(s"${bVar}_id")).as("id"),
              col(s"${aVar}_id").as("src"), col(s"${bVar}_id").as("dst"),
              lit(t).as("rel_type"),
              map_from_arrays(
                array(props.keys.toSeq.map(lit(_)): _*),
                array(props.values.toSeq.map(_.cast("string")): _*)).as("properties"),
              props.get("weight").map(_.cast("double")).getOrElse(lit(1.0)).as("weight"))
            rc += store.createEdges(edges).relationshipsCreated
            refresh()
          }
        }
        fr
      case MergeClause(path, onCreateSet, onMatchSet) if path.hops.nonEmpty =>
        // relationship MERGE: match by (src, dst, rel_type) against the
        // current snapshot, create only the missing edges (merge.go:26-40
        // pattern-match-then-create, set-based)
        require(path.hops.size == 1, "MERGE supports single-hop relationship patterns")
        val (rel, endPat) = path.hops.head
        val aVar = path.first.variable.getOrElse(sys.error("MERGE rel: unbound start"))
        val bVar = endPat.variable.getOrElse(sys.error("MERGE rel: unbound end"))
        require(frame0.kinds.get(aVar).contains(NodeK) && frame0.kinds.get(bVar).contains(NodeK),
          "MERGE relationship requires both endpoints bound")
        val t = rel.relType.getOrElse(sys.error("MERGE rel needs a type"))
        val props = rel.props.map { case (k, e) => (k, Planner.compile(e, frame0, params)) }
        val cand = frame0.df.select(
          concat_ws("|", lit(t), col(s"${aVar}_id"), col(s"${bVar}_id")).as("id"),
          col(s"${aVar}_id").as("src"), col(s"${bVar}_id").as("dst"),
          lit(t).as("rel_type"),
          map_from_arrays(
            array(props.keys.toSeq.map(lit(_)): _*),
            array(props.values.toSeq.map(_.cast("string")): _*)).as("properties"),
          props.get("weight").map(_.cast("double")).getOrElse(lit(1.0)).as("weight"))
          .dropDuplicates("id")
        val missing = cand.join(g.edges.select("src", "dst", "rel_type"),
          Seq("src", "dst", "rel_type"), "left_anti").localCheckpoint(true)
        // existing edges matched by the pattern (their ORIGINAL ids — the
        // snapshot's, not the deterministic candidate ids)
        val matched = g.edges
          .join(cand.select("src", "dst", "rel_type"), Seq("src", "dst", "rel_type"), "left_semi")
          .select("id").localCheckpoint(true)
        rc += store.createEdges(missing).relationshipsCreated
        refresh()
        val relVarName = rel.variable
        def edgeSet(items: Seq[(Prop, Expr)], ids: DataFrame): Unit =
          items.foreach { case (Prop(v, key), e) =>
            require(relVarName.contains(v),
              s"ON SET target $v must be the MERGE relationship variable")
            val value = Planner.compile(e, Planner.seedFrame(store.snapshot), params)
            ps += store.setEdgeProperty(ids, key, value).propertiesSet
            refresh()
          }
        edgeSet(onCreateSet, missing.select("id"))
        edgeSet(onMatchSet, matched)
        frame0
      case MergeClause(path, onCreateSet, onMatchSet) =>
        val (cand, v) = nodeRows(frame0, path.first, params)
        val candD = cand.dropDuplicates("id").localCheckpoint(true)
        val existing = candD.join(g.nodes.select("id"), Seq("id"), "left_semi")
          .select("id").localCheckpoint(true)
        nc += store.mergeNodes(candD).nodesCreated
        refresh()
        val createdIds = candD.select("id").join(existing, Seq("id"), "left_anti")
        onCreateSet.foreach { case (Prop(_, key), e) =>
          ps += applySet(store, frame0, createdIds, key, e, params); refresh()
        }
        onMatchSet.foreach { case (Prop(_, key), e) =>
          ps += applySet(store, frame0, existing, key, e, params); refresh()
        }
        bindNodeInFrame(frame0, v, path.first, params)
      case SetClause(items) =>
        items.foreach { case (Prop(v, key), e) =>
          require(frame0.kinds.get(v).contains(NodeK), s"SET target $v must be a bound node")
          val updates = frame0.df.select(col(s"${v}_id").as("id"),
            Planner.compile(e, frame0, params).as("newval")).dropDuplicates("id")
          ps += store.setNodeProperties(updates, key).propertiesSet
          refresh()
        }
        frame0
      case DeleteClause(vars, detach) =>
        vars.foreach { v =>
          require(frame0.kinds.get(v).contains(NodeK), s"DELETE target $v must be a bound node")
          val ids = frame0.df.select(col(s"${v}_id").as("id")).dropDuplicates()
          val stats = store.deleteNodes(ids, detach)
          nd += stats.nodesDeleted; rd += stats.relationshipsDeleted
          refresh()
        }
        frame0
      case RemoveClause(items) =>
        items.foreach { case Prop(v, key) =>
          require(frame0.kinds.get(v).contains(NodeK), s"REMOVE target $v must be a bound node")
          val updates = frame0.df.select(col(s"${v}_id").as("id"),
            lit(null).as("newval")).dropDuplicates("id")
          ps += store.setNodeProperties(updates, key).propertiesSet
          refresh()
        }
        frame0
      case ForeachClause(v, listE, updates) =>
        // FOREACH body binds the element var per row; frame changes inside
        // the body stay inside (Cypher scoping)
        val cc = Planner.compile(listE, frame0, params)
        var inner = Frame(frame0.df.withColumn(v, explode(cc)),
          frame0.kinds + (v -> ValK))
        updates.foreach(uc => inner = applyWrite(uc, inner))
        frame0
      case other => sys.error(s"not a write clause: $other")
    }

    q.parts.head.clauses.foreach {
      case c @ (_: MatchClause | _: UnwindClause | _: WithClause | _: CallSubquery | _: CallProc) =>
        val (f2, first2) = Planner.advance(g, frame, first, c, params)
        frame = f2; first = first2
      case r: ReturnClause =>
        val (f2, _) = Planner.advance(g, frame, first, r, params)
        returned = Some(f2.df)
      case w =>
        frame = applyWrite(w, frame)
    }
    WriteResult(nc, nd, rc, rd, ps, returned)
  }

  /** Build node rows for a CREATE/MERGE pattern from the current frame. */
  private def nodeRows(frame: Frame, pat: NodePat,
      params: Map[String, Any]): (DataFrame, String) = {
    val label = pat.label.getOrElse(sys.error("CREATE/MERGE node needs a label"))
    val v = pat.variable.getOrElse("_n")
    def p(key: String): Option[Column] =
      pat.props.get(key).map(e => Planner.compile(e, frame, params))
    val keyCol = p("key").getOrElse(sys.error(
      "CREATE/MERGE node needs a `key` property (deterministic ids)"))
    val df = frame.df.select(
      concat_ws(":", lit(label), keyCol.cast("string")).as("id"),
      array((label +: pat.extraLabels).map(lit(_)): _*).as("labels"),
      keyCol.cast("long").as("key"),
      p("name").getOrElse(lit(null)).cast("string").as("name"),
      p("acctbal").getOrElse(lit(null)).cast("double").as("acctbal"),
      p("mktsegment").getOrElse(lit(null)).cast("string").as("mktsegment"),
      expr("map()").cast("map<string,string>").as("properties"))
    (df, v)
  }

  /** Bind the created/merged node variable per frame row by recomputing its
    * columns from the pattern expressions (same rows, same order).
    */
  private def bindNodeInFrame(frame: Frame, v: String, pat: NodePat,
      params: Map[String, Any]): Frame = {
    if (frame.kinds.contains(v)) return frame
    val label = pat.label.get
    def p(key: String): Option[Column] =
      pat.props.get(key).map(e => Planner.compile(e, frame, params))
    val keyCol = p("key").get
    val df = frame.df
      .withColumn(s"${v}_id", concat_ws(":", lit(label), keyCol.cast("string")))
      .withColumn(s"${v}_labels", array((label +: pat.extraLabels).map(lit(_)): _*))
      .withColumn(s"${v}_key", keyCol.cast("long"))
      .withColumn(s"${v}_name", p("name").getOrElse(lit(null)).cast("string"))
      .withColumn(s"${v}_acctbal", p("acctbal").getOrElse(lit(null)).cast("double"))
      .withColumn(s"${v}_mktsegment", p("mktsegment").getOrElse(lit(null)).cast("string"))
      .withColumn(s"${v}_properties", expr("map()").cast("map<string,string>"))
    Frame(df, frame.kinds + (v -> NodeK))
  }

  private def applySet(store: GraphStore, frame: Frame, ids: DataFrame,
      key: String, e: Expr, params: Map[String, Any]): Long = {
    val value = Planner.compile(e, Planner.seedFrame(store.snapshot), params)
    store.setNodeProperty(ids, key, value).propertiesSet
  }
}
