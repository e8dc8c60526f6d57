package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.{GraphStore, PropertyGraph}

/** CALL-surface registry for the apoc write/refactor families — create,
  * merge, refactor, nodes (ref `apoc/create/create.go`,
  * `apoc/merge/merge.go`, `apoc/refactor/refactor.go`,
  * `apoc/nodes/nodes.go`). Every mutation is a whole-set DataFrame rewrite
  * swapped through the versioned store — the Delta-style commit shape —
  * never a per-row driver loop; the reference mutates its in-memory maps
  * row by row.
  */
object ApocWriteProcs {

  private def arg(args: Seq[Any], i: Int): Option[String] =
    args.lift(i).map(_.toString).filter(_.nonEmpty)
  private def argInt(args: Seq[Any], i: Int, dflt: Int): Int =
    args.lift(i).map(_.toString.toDouble.toInt).getOrElse(dflt)
  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  private def oneRow(g: PropertyGraph, cols: (String, Any)*): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    cols.foldLeft(Seq(1).toDF("_one")) { case (d, (n, v)) =>
      d.withColumn(n, lit(v)) }.drop("_one")
  }
  private def store: GraphStore = GraphStore.currentStore

  /** Labels CSV + properties-JSON → a node row in the store's node schema
    * (hoisted key/name parsed from the map when present).
    */
  private def nodeRow(g: PropertyGraph, id: String, labels: Seq[String],
      props: Seq[(String, String)]): DataFrame = {
    val p = props.toMap
    g.nodes.limit(0).unionByName(
      g.nodes.sparkSession.range(1).select(
        lit(id).as("id"),
        array(labels.map(lit(_)): _*).cast("array<string>").as("labels"),
        lit(p.get("key").map(_.toLong).orNull).cast("long").as("key"),
        lit(p.getOrElse("name", null)).cast("string").as("name"),
        lit(p.get("acctbal").map(_.toDouble).orNull).cast("double").as("acctbal"),
        lit(p.getOrElse("mktsegment", null)).cast("string").as("mktsegment"),
        (if (props.isEmpty) map().cast("map<string,string>")
         else map(props.flatMap { case (k, v) =>
           Seq(lit(k), lit(v)) }: _*)).as("properties")),
      allowMissingColumns = true)
  }

  private def jsonProps(s: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    graft.functions.JsonImpls.parse(s).toSeq.flatMap(n =>
      n.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq)
  }

  val procedures: Map[String, (PropertyGraph, Seq[Any]) => DataFrame] = Map(
    // ---- apoc.create.* stored entities (create.go; the v* virtual
    // constructors are scalar functions elsewhere)
    "apoc.create.node" -> ((g, args) => {
      // (id, labelsCsv, propsJson)
      val s = store
      val row = nodeRow(s.snapshot, args(0).toString,
        csv(args(1).toString), jsonProps(arg(args, 2).getOrElse("{}")))
      val st = s.createNodes(row)
      oneRow(g, "id" -> args(0).toString, "nodesCreated" -> st.nodesCreated)
    }),
    "apoc.create.nodes" -> ((g, args) => {
      // (labelsCsv, idsCsv) — one batch create
      val s = store
      val rows = csv(args(1).toString).map(id =>
        nodeRow(s.snapshot, id, csv(args(0).toString), Nil))
        .reduce(_.unionByName(_))
      val st = s.createNodes(rows)
      oneRow(g, "nodesCreated" -> st.nodesCreated)
    }),
    "apoc.create.relationship" -> ((g, args) => {
      // (srcId, relType, propsJson, dstId)
      val s = store
      val props = jsonProps(arg(args, 2).getOrElse("{}"))
      val e = s.snapshot.edges.limit(0).unionByName(
        g.nodes.sparkSession.range(1).select(
          concat_ws("|", lit(args(1).toString), lit(args(0).toString),
            lit(args(3).toString)).as("id"),
          lit(args(0).toString).as("src"),
          lit(args(3).toString).as("dst"),
          lit(args(1).toString).as("rel_type"),
          (if (props.isEmpty) map().cast("map<string,string>")
           else map(props.flatMap { case (k, v) =>
             Seq(lit(k), lit(v)) }: _*)).as("properties"),
          lit(1.0).as("weight")),
        allowMissingColumns = true)
      val st = s.createEdges(e)
      oneRow(g, "relationshipsCreated" -> st.relationshipsCreated)
    }),
    "apoc.create.uuids" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      // distributed uuid generation (create.go:261)
      spark.range(argInt(args, 0, 1)).select(expr("uuid()").as("uuid"))
    }),
    "apoc.create.clone" -> ((g, args) => {
      // (nodeId, newId) — copy with a fresh id (create.go:274)
      val s = store
      val src = s.snapshot.nodes.filter(col("id") === args(0).toString)
        .withColumn("id", lit(args(1).toString))
      val st = s.createNodes(src)
      oneRow(g, "id" -> args(1).toString, "nodesCreated" -> st.nodesCreated)
    }),
    "apoc.create.clonesubgraph" -> ((g, args) => {
      // (idsCsv, suffix): clone the nodes and the edges among them,
      // ids suffixed (create.go:295)
      val s = store
      val ids = csv(args(0).toString)
      val suffix = arg(args, 1).getOrElse("_copy")
      val g0 = s.snapshot
      val nodes = g0.nodes.filter(col("id").isin(ids: _*))
        .withColumn("id", concat(col("id"), lit(suffix)))
      val edges = g0.edges
        .filter(col("src").isin(ids: _*) && col("dst").isin(ids: _*))
        .withColumn("src", concat(col("src"), lit(suffix)))
        .withColumn("dst", concat(col("dst"), lit(suffix)))
        .withColumn("id", concat(col("id"), lit(suffix)))
      val st1 = s.createNodes(nodes)
      val st2 = s.createEdges(edges)
      oneRow(g, "nodesCreated" -> st1.nodesCreated,
        "relationshipsCreated" -> st2.relationshipsCreated)
    }),

    // ---- apoc.merge.* (merge.go) over the store's MERGE machinery
    "apoc.merge.node" -> ((g, args) => {
      // (labelsCsv, identPropsJson): match-or-create via Cypher MERGE
      val labels = csv(args(0).toString).mkString(":")
      val props = jsonProps(args(1).toString)
        .map { case (k, v) =>
          val lit0 = if (v.forall(c => c.isDigit || c == '-')) v else s"'$v'"
          s"$k: $lit0" }
        .mkString("{", ", ", "}")
      val st = CypherWrite.execute(store, s"MERGE (n:$labels $props)")
      oneRow(g, "nodesCreated" -> st.nodesCreated)
    }),
    "apoc.merge.nodeeager" -> ((g, args) => {
      val labels = csv(args(0).toString).mkString(":")
      val props = jsonProps(args(1).toString)
        .map { case (k, v) =>
          val lit0 = if (v.forall(c => c.isDigit || c == '-')) v else s"'$v'"
          s"$k: $lit0" }
        .mkString("{", ", ", "}")
      val st = CypherWrite.execute(store, s"MERGE (n:$labels $props)")
      oneRow(g, "nodesCreated" -> st.nodesCreated)
    }),
    "apoc.merge.relationship" -> ((g, args) => {
      // (srcId, relType, dstId): create unless present (merge.go:68)
      val s = store
      val (src, rt, dst) = (args(0).toString, args(1).toString, args(2).toString)
      val exists = s.snapshot.edges.filter(col("src") === src &&
        col("dst") === dst && col("rel_type") === rt).limit(1).count() > 0
      if (exists) oneRow(g, "relationshipsCreated" -> 0L)
      else {
        val e = s.snapshot.edges.limit(0).unionByName(
          g.nodes.sparkSession.range(1).select(
            concat_ws("|", lit(rt), lit(src), lit(dst)).as("id"),
            lit(src).as("src"), lit(dst).as("dst"), lit(rt).as("rel_type"),
            map().cast("map<string,string>").as("properties"),
            lit(1.0).as("weight")),
          allowMissingColumns = true)
        oneRow(g, "relationshipsCreated" -> s.createEdges(e).relationshipsCreated)
      }
    }),
    "apoc.merge.relationshipeager" -> ((g, args) =>
      ApocWriteProcs.procedures("apoc.merge.relationship")(g, args)),

    // ---- apoc.refactor.* whole-set rewrites (refactor.go)
    "apoc.refactor.renamelabel" -> ((g, args) => {
      // old → new on every node (refactor.go:269)
      val s = store
      val (from, to) = (args(0).toString, args(1).toString)
      val n = s.snapshot.nodes.filter(array_contains(col("labels"), from)).count()
      s.replaceNodes(s.snapshot.nodes.withColumn("labels",
        when(array_contains(col("labels"), from),
          array_union(array_remove(col("labels"), lit(from)), array(lit(to))))
          .otherwise(col("labels"))))
      oneRow(g, "updated" -> n)
    }),
    "apoc.refactor.renametype" -> ((g, args) => {
      val s = store
      val (from, to) = (args(0).toString, args(1).toString)
      val n = s.snapshot.edges.filter(col("rel_type") === from).count()
      s.replaceEdges(s.snapshot.edges.withColumn("rel_type",
        when(col("rel_type") === from, lit(to)).otherwise(col("rel_type"))))
      oneRow(g, "updated" -> n)
    }),
    "apoc.refactor.renameproperty" -> ((g, args) => {
      // rename the key in every node's property map (refactor.go:317)
      val s = store
      val (from, to) = (args(0).toString, args(1).toString)
      val n = s.snapshot.nodes
        .filter(map_contains_key(col("properties"), from)).count()
      s.replaceNodes(s.snapshot.nodes.withColumn("properties",
        when(map_contains_key(col("properties"), from),
          map_concat(
            map_filter(col("properties"), (k, _) => k =!= from),
            map(lit(to), element_at(col("properties"), from))))
          .otherwise(col("properties"))))
      oneRow(g, "updated" -> n)
    }),
    "apoc.refactor.renamerelproperty" -> ((g, args) => {
      val s = store
      val (from, to) = (args(0).toString, args(1).toString)
      val n = s.snapshot.edges
        .filter(map_contains_key(col("properties"), from)).count()
      s.replaceEdges(s.snapshot.edges.withColumn("properties",
        when(map_contains_key(col("properties"), from),
          map_concat(
            map_filter(col("properties"), (k, _) => k =!= from),
            map(lit(to), element_at(col("properties"), from))))
          .otherwise(col("properties"))))
      oneRow(g, "updated" -> n)
    }),
    "apoc.refactor.settype" -> ((g, args) => {
      // (relId, newType) (refactor.go:365)
      val s = store
      s.replaceEdges(s.snapshot.edges.withColumn("rel_type",
        when(col("id") === args(0).toString, lit(args(1).toString))
          .otherwise(col("rel_type"))))
      oneRow(g, "updated" -> 1L)
    }),
    "apoc.refactor.changetype" -> ((g, args) => {
      val s = store
      s.replaceEdges(s.snapshot.edges.withColumn("rel_type",
        when(col("id") === args(0).toString, lit(args(1).toString))
          .otherwise(col("rel_type"))))
      oneRow(g, "updated" -> 1L)
    }),
    "apoc.refactor.invertrelationship" -> ((g, args) => {
      // swap endpoints of one edge (refactor.go:375)
      val s = store
      val hit = col("id") === args(0).toString
      s.replaceEdges(s.snapshot.edges
        .withColumn("_s", col("src"))
        .withColumn("src", when(hit, col("dst")).otherwise(col("src")))
        .withColumn("dst", when(hit, col("_s")).otherwise(col("dst")))
        .drop("_s"))
      oneRow(g, "updated" -> 1L)
    }),
    "apoc.refactor.redirectrelationship" -> ((g, args) => {
      // (relId, newEndId) — re-point dst (refactor.go:385)
      val s = store
      s.replaceEdges(s.snapshot.edges.withColumn("dst",
        when(col("id") === args(0).toString, lit(args(1).toString))
          .otherwise(col("dst"))))
      oneRow(g, "updated" -> 1L)
    }),
    "apoc.refactor.from" -> ((g, args) => {
      // (relId, newStartId) — re-point src (refactor.go:395)
      val s = store
      s.replaceEdges(s.snapshot.edges.withColumn("src",
        when(col("id") === args(0).toString, lit(args(1).toString))
          .otherwise(col("src"))))
      oneRow(g, "updated" -> 1L)
    }),
    "apoc.refactor.to" -> ((g, args) => {
      val s = store
      s.replaceEdges(s.snapshot.edges.withColumn("dst",
        when(col("id") === args(0).toString, lit(args(1).toString))
          .otherwise(col("dst"))))
      oneRow(g, "updated" -> 1L)
    }),
    "apoc.refactor.clonenodes" -> ((g, args) => {
      val s = store
      val ids = csv(args(0).toString)
      val suffix = arg(args, 1).getOrElse("_copy")
      val st = s.createNodes(s.snapshot.nodes.filter(col("id").isin(ids: _*))
        .withColumn("id", concat(col("id"), lit(suffix))))
      oneRow(g, "nodesCreated" -> st.nodesCreated)
    }),
    "apoc.refactor.mergenodes" -> ((g, args) => {
      // (idsCsv): fold into the FIRST id — properties last-wins, incident
      // edges redirected, the rest deleted (refactor.go:25)
      val s = store
      val ids = csv(args(0).toString)
      require(ids.size >= 2, "apoc.refactor.mergeNodes needs >= 2 ids")
      val keep = ids.head
      val losers = ids.tail
      val g0 = s.snapshot
      // merged property map: later ids override earlier
      val merged = g0.nodes.filter(col("id").isin(ids: _*))
        .select(explode(map_entries(col("properties"))).as("e"), col("id"))
        .withColumn("ord", array_position(
          array(ids.map(lit(_)): _*).cast("array<string>"), col("id")))
        .groupBy(col("e.key").as("k"))
        .agg(max_by(col("e.value"), col("ord")).as("v"))
        .agg(map_from_entries(collect_list(struct(col("k"), col("v")))).as("m"))
        .collect().headOption.flatMap(r => Option(r.get(0)))
      val mergedProps = merged.map(_.asInstanceOf[Map[String, String]])
        .getOrElse(Map.empty)
      val nodes = g0.nodes.filter(!col("id").isin(losers: _*))
        .withColumn("properties",
          when(col("id") === keep, (
            if (mergedProps.isEmpty) map().cast("map<string,string>")
            else map(mergedProps.toSeq.sortBy(_._1).flatMap { case (k, v) =>
              Seq(lit(k), lit(v)) }: _*)))
            .otherwise(col("properties")))
      val edges = g0.edges
        .withColumn("src", when(col("src").isin(losers: _*), lit(keep))
          .otherwise(col("src")))
        .withColumn("dst", when(col("dst").isin(losers: _*), lit(keep))
          .otherwise(col("dst")))
        .filter(col("src") =!= col("dst")) // self-loops from the fold drop
      s.replaceGraph(PropertyGraph(nodes, edges))
      oneRow(g, "mergedInto" -> keep, "nodesRemoved" -> losers.size.toLong)
    }),
    "apoc.refactor.collapsenode" -> ((g, args) => {
      // replace a node by edges between its in- and out-neighbors
      // (refactor.go:160)
      val s = store
      val id = args(0).toString
      val rt = arg(args, 1).getOrElse("COLLAPSED")
      val g0 = s.snapshot
      val in = g0.edges.filter(col("dst") === id).select(col("src").as("a"))
      val out = g0.edges.filter(col("src") === id).select(col("dst").as("b"))
      val bridges = in.crossJoin(out).filter(col("a") =!= col("b"))
        .select(
          concat_ws("|", lit(rt), col("a"), col("b")).as("id"),
          col("a").as("src"), col("b").as("dst"), lit(rt).as("rel_type"),
          map().cast("map<string,string>").as("properties"),
          lit(1.0).as("weight"))
      val edges = g0.edges.filter(col("src") =!= id && col("dst") =!= id)
        .unionByName(g0.edges.limit(0).unionByName(bridges,
          allowMissingColumns = true))
      s.replaceGraph(PropertyGraph(g0.nodes.filter(col("id") =!= id), edges))
      oneRow(g, "collapsed" -> id)
    }),
    "apoc.refactor.extractnode" -> ((g, args) => {
      // edge → node + two edges (refactor.go:188): (relId, label)
      val s = store
      val relId = args(0).toString
      val label = arg(args, 1).getOrElse("Extracted")
      val g0 = s.snapshot
      val hit = g0.edges.filter(col("id") === relId).collect()
      require(hit.nonEmpty, s"no relationship $relId")
      val (src, dst, rt) = (hit.head.getAs[String]("src"),
        hit.head.getAs[String]("dst"), hit.head.getAs[String]("rel_type"))
      val nid = s"$label:$relId"
      val newNode = nodeRow(g0, nid, Seq(label), Nil)
      val mk = (eid: String, a: String, b: String) =>
        g0.edges.limit(0).unionByName(
          g0.nodes.sparkSession.range(1).select(
            lit(eid).as("id"), lit(a).as("src"), lit(b).as("dst"),
            lit(rt).as("rel_type"),
            map().cast("map<string,string>").as("properties"),
            lit(1.0).as("weight")),
          allowMissingColumns = true)
      s.replaceGraph(PropertyGraph(
        g0.nodes.unionByName(newNode),
        g0.edges.filter(col("id") =!= relId)
          .unionByName(mk(s"$relId#in", src, nid))
          .unionByName(mk(s"$relId#out", nid, dst))))
      oneRow(g, "nodeId" -> nid)
    }),
    "apoc.refactor.deleteandreconnect" -> ((g, args) => {
      // delete nodes, bridge their neighbors (refactor.go:405)
      val s = store
      val ids = csv(args(0).toString)
      val rt = arg(args, 1).getOrElse("RECONNECTED")
      ids.foreach { id =>
        ApocWriteProcs.procedures("apoc.refactor.collapsenode")(
          s.snapshot, Seq(id, rt))
      }
      oneRow(g, "deleted" -> ids.size.toLong)
    }),
    "apoc.refactor.normalizeasboolean" -> ((g, args) => {
      // (nodeId?, prop, truesCsv, falsesCsv) over ALL nodes (refactor.go:216)
      val s = store
      val prop = args(0).toString
      val trues = csv(args(1).toString)
      val falses = csv(args(2).toString)
      val v = element_at(col("properties"), prop)
      s.replaceNodes(s.snapshot.nodes.withColumn("properties",
        when(v.isin(trues: _*),
          map_concat(map_filter(col("properties"), (k, _) => k =!= prop),
            map(lit(prop), lit("true"))))
          .when(v.isin(falses: _*),
            map_concat(map_filter(col("properties"), (k, _) => k =!= prop),
              map(lit(prop), lit("false"))))
          .otherwise(col("properties"))))
      oneRow(g, "normalized" -> prop)
    }),
    "apoc.refactor.categorizeproperty" -> ((g, args) => {
      // (prop, newLabelPrefix): value → :<prefix><value> label (the
      // reference's category extraction, refactor.go:243, label form)
      val s = store
      val prop = args(0).toString
      val prefix = arg(args, 1).getOrElse("")
      val v = element_at(col("properties"), prop)
      s.replaceNodes(s.snapshot.nodes.withColumn("labels",
        when(v.isNotNull, array_union(col("labels"),
          array(concat(lit(prefix), v)))).otherwise(col("labels"))))
      oneRow(g, "categorized" -> prop)
    }),

    // ---- apoc.nodes.* collection procedures (nodes.go)
    "apoc.nodes.get" -> ((g, args) =>
      g.nodes.filter(col("id").isin(csv(args(0).toString): _*))
        .select("id", "labels").orderBy("id")),
    "apoc.nodes.delete" -> ((g, args) => {
      val st = store.deleteNodes(
        store.snapshot.nodes.filter(
          col("id").isin(csv(args(0).toString): _*)).select("id"),
        detach = args.lift(1).forall(_.toString.toBoolean))
      oneRow(g, "nodesDeleted" -> st.nodesDeleted)
    }),
    "apoc.nodes.link" -> ((g, args) => {
      // chain the ids with relType edges (nodes.go:65)
      val s = store
      val ids = csv(args(0).toString)
      val rt = arg(args, 1).getOrElse("LINKED")
      val pairs0 = ids.zip(ids.drop(1))
      val rows = pairs0.map { case (a, b) =>
        g.nodes.sparkSession.range(1).select(
          concat_ws("|", lit(rt), lit(a), lit(b)).as("id"),
          lit(a).as("src"), lit(b).as("dst"), lit(rt).as("rel_type"),
          map().cast("map<string,string>").as("properties"),
          lit(1.0).as("weight"))
      }.reduceOption(_.unionByName(_))
      val st = rows.map(r => s.createEdges(
        s.snapshot.edges.limit(0).unionByName(r, allowMissingColumns = true)))
      oneRow(g, "relationshipsCreated" ->
        st.map(_.relationshipsCreated).getOrElse(0L))
    }),
    "apoc.nodes.collapse" -> ((g, args) => {
      // first-to-last single edge (nodes.go:86)
      val ids = csv(args(0).toString)
      ApocWriteProcs.procedures("apoc.nodes.link")(g,
        Seq(s"${ids.head},${ids.last}", arg(args, 1).getOrElse("COLLAPSED")))
    }),
    "apoc.nodes.group" -> ((g, args) => { // property → grouped ids (nodes.go:116)
      val v = element_at(col("properties"), args(0).toString)
      g.nodes.filter(v.isNotNull)
        .groupBy(v.as("value"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .orderBy("value")
    }),
    "apoc.nodes.partition" -> ((g, args) => { // round-robin n-way (nodes.go:136)
      val n = argInt(args, 0, 2)
      g.nodes.select(col("id"),
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("id")) % n).as("part"))
        .groupBy("part").agg(sort_array(collect_list(col("id"))).as("ids"))
        .orderBy("part")
    }),
    "apoc.nodes.distinct" -> ((g, args) =>
      g.nodes.filter(col("id").isin(csv(args(0).toString): _*))
        .select("id").distinct().orderBy("id")),
    "apoc.nodes.union" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      (csv(args(0).toString) ++ csv(args(1).toString)).distinct.sorted.toDF("id")
    }),
    "apoc.nodes.intersect" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      csv(args(0).toString).intersect(csv(args(1).toString))
        .distinct.sorted.toDF("id")
    }),
    "apoc.nodes.difference" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      csv(args(0).toString).diff(csv(args(1).toString))
        .distinct.sorted.toDF("id")
    }),
    "apoc.nodes.sort" -> ((g, args) => { // by property (nodes.go:257)
      val v = element_at(col("properties"), args(0).toString)
      val asc = args.lift(1).forall(_.toString.toBoolean)
      g.nodes.filter(v.isNotNull).select(col("id"), v.as("value"))
        .orderBy(if (asc) col("value").asc else col("value").desc)
    }),
    "apoc.nodes.connected" -> ((g, args) => {
      // any edge among the id set (nodes.go:342)
      val ids = csv(args(0).toString)
      val n = g.edges.filter(col("src").isin(ids: _*) &&
        col("dst").isin(ids: _*)).limit(1).count()
      oneRow(g, "value" -> (n > 0))
    }),
    "apoc.nodes.isdense" -> ((g, args) => {
      // avg degree of the set > threshold (nodes.go:362)
      val ids = csv(args(0).toString)
      val th = args.lift(1).map(_.toString.toDouble).getOrElse(50.0)
      val deg = g.edges.filter(col("src").isin(ids: _*)).count() +
        g.edges.filter(col("dst").isin(ids: _*)).count()
      oneRow(g, "value" -> (deg.toDouble / ids.size > th))
    }),
    "apoc.nodes.relationships" -> ((g, args) => {
      val ids = csv(args(0).toString)
      val es = arg(args, 1).map(g.edgesByType).getOrElse(g.edges)
      es.filter(col("src").isin(ids: _*) || col("dst").isin(ids: _*))
        .select("id", "src", "dst", "rel_type").orderBy("id")
    }),
    "apoc.nodes.distinctrels" -> ((g, args) => {
      val ids = csv(args(0).toString)
      g.edges.filter(col("src").isin(ids: _*) || col("dst").isin(ids: _*))
        .select("rel_type").distinct().orderBy("rel_type")
    }),
    "apoc.nodes.tomap" -> ((g, args) => { // keyProperty → id (nodes.go:430)
      val v = element_at(col("properties"), args(0).toString)
      g.nodes.filter(v.isNotNull)
        .agg(map_from_entries(sort_array(collect_list(
          struct(v.as("k"), col("id").as("v"))))).as("map"))
    }),
    "apoc.nodes.cycles" -> ((g, args) => {
      // 2-cycles (mutual edges) among the ids — the reference's cycle
      // scan bounded to the pair form (nodes.go:492 does DFS per node)
      val ids = csv(args(0).toString)
      val es = g.edges.filter(col("src").isin(ids: _*) &&
        col("dst").isin(ids: _*)).select("src", "dst")
      es.join(es.toDF("dst", "src"), Seq("src", "dst"))
        .filter(col("src") < col("dst")).distinct().orderBy("src")
    }),
    "apoc.nodes.frommap" -> ((g, args) => {
      // JSON {id: labelCsv} → batch create
      val s = store
      val entries = jsonProps(args(0).toString)
      val rows = entries.map { case (id, labels) =>
        nodeRow(s.snapshot, id, csv(labels), Nil) }
        .reduceOption(_.unionByName(_))
      val st = rows.map(s.createNodes)
      oneRow(g, "nodesCreated" -> st.map(_.nodesCreated).getOrElse(0L))
    }),
    // ---- merge/refactor/export/import leftovers (aliases + small forms)
    "apoc.merge.mergenode" -> ((g, args) =>
      ApocWriteProcs.procedures("apoc.merge.node")(g, args)),
    "apoc.merge.mergerelationship" -> ((g, args) =>
      ApocWriteProcs.procedures("apoc.merge.relationship")(g, args)),
    "apoc.merge.nodes" -> ((g, args) => {
      // JSON [{labelsCsv: identJson}, …] shorthand: {labels: propsJson}
      val specs = jsonProps(args(0).toString)
      var created = 0L
      specs.foreach { case (labels, props) =>
        val df = ApocWriteProcs.procedures("apoc.merge.node")(g, Seq(labels, props))
        created += df.collect().head.getAs[Long]("nodesCreated")
      }
      oneRow(g, "nodesCreated" -> created)
    }),
    "apoc.merge.batch" -> ((g, args) =>
      ApocWriteProcs.procedures("apoc.merge.nodes")(g, args)),
    "apoc.merge.pattern" -> ((g, args) => {
      // (srcId, relType, dstId): ensure both-direction pattern edge
      ApocWriteProcs.procedures("apoc.merge.relationship")(g, args)
    }),
    "apoc.refactor.clonesubgraph" -> ((g, args) =>
      ApocWriteProcs.procedures("apoc.create.clonesubgraph")(g, args)),
    "apoc.refactor.clonesubgraphfrompaths" -> ((g, args) =>
      ApocWriteProcs.procedures("apoc.create.clonesubgraph")(g, args)),
    "apoc.refactor.mergerelationships" -> ((g, args) => {
      // keep the FIRST rel id, drop the rest (refactor.go:64; props of the
      // kept edge win — the reference's config default)
      val s = store
      val ids = csv(args(0).toString)
      require(ids.size >= 2, "apoc.refactor.mergeRelationships needs >= 2 ids")
      s.replaceEdges(s.snapshot.edges.filter(!col("id").isin(ids.tail: _*)))
      oneRow(g, "kept" -> ids.head, "removed" -> (ids.size - 1).toLong)
    }),
    "apoc.refactor.normalize" -> ((g, args) => {
      // (prop, newLabel, relType): extract a property value into its own
      // node, linked per owner (refactor.go:481)
      val s = store
      val (prop, label, rt) = (args(0).toString, args(1).toString, args(2).toString)
      val g0 = s.snapshot
      val v = element_at(col("properties"), prop)
      val owners = g0.nodes.filter(v.isNotNull)
        .select(col("id").as("owner"), v.as("value"))
      val newNodes = owners.select(col("value")).distinct()
        .select(
          concat(lit(s"$label:"), col("value")).as("id"),
          array(lit(label)).as("labels"),
          lit(null).cast("long").as("key"),
          col("value").as("name"),
          lit(null).cast("double").as("acctbal"),
          lit(null).cast("string").as("mktsegment"),
          map(lit("value"), col("value")).as("properties"))
      val newEdges = owners.select(
        concat_ws("|", lit(rt), col("owner"), col("value")).as("id"),
        col("owner").as("src"),
        concat(lit(s"$label:"), col("value")).as("dst"),
        lit(rt).as("rel_type"),
        map().cast("map<string,string>").as("properties"),
        lit(1.0).as("weight"))
      s.replaceGraph(PropertyGraph(
        g0.nodes.unionByName(
          g0.nodes.limit(0).unionByName(newNodes, allowMissingColumns = true)),
        g0.edges.unionByName(
          g0.edges.limit(0).unionByName(newEdges, allowMissingColumns = true))))
      oneRow(g, "extracted" -> prop, "label" -> label)
    }),
    "apoc.refactor.denormalize" -> ((g, args) => {
      // copy the neighbor's `prop` back onto each src (refactor.go:511)
      val s = store
      val (rt, prop) = (args(0).toString, args(1).toString)
      val g0 = s.snapshot
      val vals = g0.edges.filter(col("rel_type") === rt)
        .join(g0.nodes.select(col("id").as("dst"),
          element_at(col("properties"), prop).as("_v")), "dst")
        .groupBy(col("src").as("id")).agg(max(col("_v")).as("newval"))
        .filter(col("newval").isNotNull)
      val st = s.setNodeProperties(vals, prop)
      oneRow(g, "updated" -> st.propertiesSet)
    }),
    "apoc.export.tostring" -> ((g, _) =>
      g.nodes.orderBy("id").limit(1000)
        .select(to_json(struct(col("id"), col("labels"))).as("value"))),
    "apoc.export.tofile" -> ((g, args) => {
      val n = graft.sources.Formats.exportNodesJson(g, None, args(0).toString)
      oneRow(g, "file" -> args(0).toString, "nodes" -> n, "done" -> true)
    }),
    "apoc.export.csvdata" -> ((g, args) => {
      val n = graft.sources.Formats.exportCsv(
        g.nodes.select(col("id"), col("key"), col("name")), args(0).toString)
      oneRow(g, "file" -> args(0).toString, "rows" -> n, "done" -> true)
    }),
    "apoc.export.jsondata" -> ((g, args) => {
      val n = graft.sources.Formats.exportNodesJson(g, arg(args, 1), args(0).toString)
      oneRow(g, "file" -> args(0).toString, "nodes" -> n, "done" -> true)
    }),
    "apoc.export.cypherall" -> ((g, args) =>
      ApocGraphProcs.procedures("apoc.export.cypher")(g, args)),
    "apoc.export.cypherdata" -> ((g, args) =>
      ApocGraphProcs.procedures("apoc.export.cypher")(g, args)),
    "apoc.export.graphmlall" -> ((g, args) =>
      ApocGraphProcs.procedures("apoc.export.graphml")(g, args)),
    "apoc.export.graphmldata" -> ((g, args) =>
      ApocGraphProcs.procedures("apoc.export.graphml")(g, args)),
    "apoc.import.cypher" -> ((g, args) =>
      ApocSysProcs.procedures("apoc.cypher.runfile")(g, args)),
    "apoc.import.cypherdata" -> ((g, args) =>
      ApocSysProcs.procedures("apoc.cypher.runmany")(g, args)),
    "apoc.import.jsondata" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      Seq(graft.functions.JsonImpls.parse(args(0).toString)
        .map(graft.functions.JsonImpls.renderGo).getOrElse("")).toDF("value")
    }),
    "apoc.import.csvdata" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      args(0).toString.split("\n").map(_.split(",").map(_.trim).toSeq)
        .toSeq.toDF("fields")
    }),
    "apoc.import.graphmldata" -> ((g, args) => {
      val nodes = "<node id=\"([^\"]+)\"".r
        .findAllMatchIn(args(0).toString).map(_.group(1)).toSeq
      oneRow(g, "nodes" -> nodes.size.toLong)
    }),
    "apoc.import.validateschema" -> ((g, args) =>
      oneRow(g, "valid" ->
        graft.functions.JsonImpls.parse(args(0).toString).isDefined)),
    "apoc.import.batch" -> ((g, args) => throw new IllegalArgumentException(
      "apoc.import.batch takes a Go function — use CALL {} IN TRANSACTIONS")),
    "apoc.import.filter" -> ((g, args) => throw new IllegalArgumentException(
      "apoc.import.filter takes a Go function — filter with WHERE after load")),
    "apoc.import.transform" -> ((g, args) => throw new IllegalArgumentException(
      "apoc.import.transform takes a Go function — project after load")),
    "apoc.import.stream" -> ((g, args) => throw new IllegalArgumentException(
      "apoc.import.stream: use Structured Streaming readStream instead")),
    "apoc.import.merge" -> ((g, args) =>
      ApocWriteProcs.procedures("apoc.merge.nodes")(g, args)),
    "apoc.load.jsonparams" -> ((g, args) =>
      graft.sources.Formats.importNodesJson(g.nodes.sparkSession, args(0).toString)),
    "apoc.load.jsonschema" -> ((g, args) => {
      val df = g.nodes.sparkSession.read.json(args(0).toString)
      oneRow(g, "schema" -> df.schema.toDDL)
    }),

    "apoc.nodes.filter" -> ((g, args) => throw new IllegalArgumentException(
      "apoc.nodes.filter takes a Go function (nodes.go:301) — use MATCH … WHERE")),
    "apoc.nodes.map" -> ((g, args) => throw new IllegalArgumentException(
      "apoc.nodes.map takes a Go function (nodes.go:316) — use RETURN projections")),
    "apoc.nodes.reduce" -> ((g, args) => throw new IllegalArgumentException(
      "apoc.nodes.reduce takes a Go function (nodes.go:329) — use aggregations")),
    "apoc.nodes.batch" -> ((g, args) => throw new IllegalArgumentException(
      "apoc.nodes.batch takes a Go function (nodes.go:470) — use CALL {} IN TRANSACTIONS")))
}
