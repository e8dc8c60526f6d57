package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphStore, PropertyGraph}

/** Neo4j/NornicDB compatibility procedures — the CALL dispatcher's long
  * metadata tail (`/root/reference/pkg/cypher/call.go:676-805`,
  * `call_compat.go:37-120,803`, `call_index_mgmt.go`): schema listings
  * (`db.indexes`, `db.constraints`, `db.index.stats`,
  * `db.schema.nodeProperties`/`relProperties`), index-management no-op
  * acks (`db.awaitIndex[es]`, `db.resampleIndex`), the query-statistics
  * family (`db.stats.*`), cache clearing (`db.clearQueryCaches`), DBMS
  * info (`dbms.info`/`listConfig`/`clientConfig`/`listConnections`/
  * `procedures`/`functions`), the engine's own extension procedures
  * (`nornicdb.version`/`stats`/`decay.info` — kept under the reference's
  * names so a compat client's scripts run unchanged), and transaction
  * metadata (`tx.setMetaData`, active-transaction-only).
  *
  * Static shapes are literal one-row frames (they ARE the contract);
  * data-driven ones (`db.index.stats`, `nornicdb.stats`, the schema
  * property listings) are grouped aggregations over the graph — the same
  * plans at 100 TB, nothing driver-side beyond the bounded catalog.
  */
object CompatProcs {

  private def spark(g: PropertyGraph): SparkSession = g.nodes.sparkSession

  private def statusRow(g: PropertyGraph, msg: String): DataFrame = {
    val s = spark(g); import s.implicits._
    Seq(msg).toDF("status")
  }

  /** Hoisted node property columns (the loader contract, Tables.scala). */
  private val hoistedNodeProps = Seq("key", "name", "acctbal", "mktsegment")

  /** CALL db.indexes() — call.go:862-896 shape:
    * (name, type, labelsOrTypes, properties, state), always ONLINE.
    */
  def dbIndexes(g: PropertyGraph): DataFrame = {
    val s = spark(g); import s.implicits._
    val defs = GraphStore.currentOption.map(_.catalog.listIndexes).getOrElse(Nil)
    defs.map(i => (i.name, i.kind, Seq(i.label), i.properties, "ONLINE"))
      .toDF("name", "type", "labelsOrTypes", "properties", "state")
  }

  /** CALL db.constraints() — call.go:926-960. */
  def dbConstraints(g: PropertyGraph): DataFrame = {
    val s = spark(g); import s.implicits._
    val defs = GraphStore.currentOption.map(_.catalog.listConstraints).getOrElse(Nil)
    defs.map(c => (c.name, c.kind, Seq(c.label), c.properties))
      .toDF("name", "type", "labelsOrTypes", "properties")
  }

  /** CALL db.index.stats() — storage/schema.go:1142-1178: per index,
    * totalEntries = indexed entities (label + property present),
    * uniqueValues = distinct values, selectivity = unique/total. One
    * grouped aggregation per catalog index (catalog is bounded); each agg
    * is a distributed count over the label's partition.
    */
  def dbIndexStats(g: PropertyGraph): DataFrame = {
    val s = spark(g); import s.implicits._
    val defs = GraphStore.currentOption.map(_.catalog.listIndexes).getOrElse(Nil)
    val empty = Seq.empty[(String, String, String, String, Long, Long, Double)]
      .toDF("name", "type", "label", "property", "totalEntries", "uniqueValues",
        "selectivity")
    defs.foldLeft(empty) { (acc, idx) =>
      val prop = idx.properties.headOption.getOrElse("")
      val valueCol =
        if (hoistedNodeProps.contains(prop)) col(prop)
        else element_at(col("properties"), prop)
      val one = g.nodes
        .filter(array_contains(col("labels"), idx.label) && valueCol.isNotNull)
        .agg(count(lit(1)).as("totalEntries"),
          countDistinct(valueCol).as("uniqueValues"))
        .select(lit(idx.name).as("name"), lit(idx.kind).as("type"),
          lit(idx.label).as("label"), lit(prop).as("property"),
          col("totalEntries"), col("uniqueValues"),
          when(col("totalEntries") > 0,
            col("uniqueValues").cast("double") / col("totalEntries").cast("double"))
            .otherwise(lit(0.0)).as("selectivity"))
      acc.unionByName(one)
    }
  }

  /** CALL db.schema.nodeProperties() — call.go:1074-1103:
    * (nodeLabel, propertyName, propertyType) for every property observed
    * on a node of the label (hoisted columns when non-null + dynamic map
    * keys), propertyType = "ANY" like the reference.
    */
  def schemaNodeProperties(g: PropertyGraph): DataFrame = {
    val hoisted = hoistedNodeProps.map(p =>
      g.nodes.filter(col(p).isNotNull)
        .select(explode(col("labels")).as("nodeLabel"), lit(p).as("propertyName")))
    val dynamic = g.nodes
      .select(explode(col("labels")).as("nodeLabel"), col("properties"))
      .select(col("nodeLabel"), explode(map_keys(col("properties"))).as("propertyName"))
    (hoisted :+ dynamic).reduce(_ unionByName _)
      .distinct()
      .withColumn("propertyType", lit("ANY"))
  }

  /** CALL db.schema.relProperties() — call.go:1105-1131:
    * (relType, propertyName, "ANY") from edge weight + dynamic keys.
    */
  def schemaRelProperties(g: PropertyGraph): DataFrame = {
    val weight = g.edges.filter(col("weight").isNotNull)
      .select(col("rel_type").as("relType"), lit("weight").as("propertyName"))
    val dynamic = g.edges
      .select(col("rel_type").as("relType"),
        explode(map_keys(col("properties"))).as("propertyName"))
    weight.unionByName(dynamic).distinct()
      .withColumn("propertyType", lit("ANY"))
  }

  /** CALL nornicdb.stats() — call.go:981-994: node/edge totals plus
    * distinct label and relationship-type counts, one row.
    */
  def nornicdbStats(g: PropertyGraph): DataFrame = {
    val labels = g.nodes.select(explode(col("labels")).as("l"))
      .agg(countDistinct(col("l")).as("labels"))
    val rels = g.edges.agg(countDistinct(col("rel_type")).as("relationshipTypes"))
    g.nodes.agg(count(lit(1)).as("nodes"))
      .crossJoin(broadcast(g.edges.agg(count(lit(1)).as("relationships"))))
      .crossJoin(broadcast(labels))
      .crossJoin(broadcast(rels))
  }

  /** CALL db.stats.retrieveAllAnTheStats() — call_index_mgmt.go:93-119:
    * GRAPH COUNTS row + QUERIES row, map payloads as JSON text.
    */
  def statsRetrieveAll(g: PropertyGraph): DataFrame = {
    val s = spark(g); import s.implicits._
    val counts = g.nodes.agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(g.edges.agg(count(lit(1)).as("r"))))
      .select(lit("GRAPH COUNTS").as("section"),
        concat(lit("{\"nodeCount\": "), col("n"),
          lit(", \"relationshipCount\": "), col("r"), lit("}")).as("data"))
    val queries = Seq(("QUERIES",
      """{"totalQueries": 0, "cachedQueries": 0, "avgExecutionMs": 0}"""))
      .toDF("section", "data")
    counts.unionByName(queries)
  }

  /** CALL dbms.procedures() — live registry listing (the reference
    * hardcodes a starter table, call.go:1159-1180; ours lists every
    * registered CALL name with its execution mode).
    */
  def dbmsProcedures(g: PropertyGraph): DataFrame = {
    val s = spark(g); import s.implicits._
    Planner.procedureNames
      .map { n =>
        val mode =
          if (n.startsWith("dbms.")) "DBMS"
          else if (n.startsWith("apoc.trigger") || n.startsWith("apoc.periodic") ||
            n.contains(".create") || n.contains(".drop") || n.startsWith("apoc.atomic"))
            "WRITE"
          else "READ"
        (n, s"Procedure $n", mode)
      }
      .toDF("name", "description", "mode").orderBy("name")
  }

  /** CALL dbms.functions() — call.go:1183-1210's category table. */
  def dbmsFunctions(g: PropertyGraph): DataFrame = {
    val s = spark(g); import s.implicits._
    Seq(
      ("count", "Counts items", "Aggregating"),
      ("sum", "Sums numeric values", "Aggregating"),
      ("avg", "Averages numeric values", "Aggregating"),
      ("min", "Returns minimum value", "Aggregating"),
      ("max", "Returns maximum value", "Aggregating"),
      ("collect", "Collects values into a list", "Aggregating"),
      ("id", "Returns internal ID", "Scalar"),
      ("labels", "Returns labels of a node", "Scalar"),
      ("type", "Returns type of relationship", "Scalar"),
      ("properties", "Returns properties map", "Scalar"),
      ("keys", "Returns property keys", "Scalar"),
      ("coalesce", "Returns first non-null value", "Scalar"),
      ("toString", "Converts to string", "Scalar"),
      ("toInteger", "Converts to integer", "Scalar"),
      ("toFloat", "Converts to float", "Scalar"),
      ("toBoolean", "Converts to boolean", "Scalar"),
      ("size", "Returns size of list/string", "Scalar"),
      ("length", "Returns path length", "Scalar"),
      ("head", "Returns first list element", "List"),
      ("tail", "Returns list without first element", "List"),
      ("last", "Returns last list element", "List"),
      ("range", "Creates a range list", "List"))
      .toDF("name", "description", "category")
  }

  /** CALL tx.setMetaData({...}) — call_compat.go:803-852: requires an
    * active explicit transaction; stores the metadata on it.
    */
  def txSetMetadata(g: PropertyGraph, args: Seq[Any]): DataFrame = {
    val tx = GraphStore.activeTransaction.getOrElse(
      throw new IllegalStateException(
        "tx.setMetaData() requires an active transaction. Use a transaction block first"))
    val meta = args.headOption match {
      case Some(m: Map[_, _]) if m.nonEmpty => m.map { case (k, v) => k.toString -> v }
      case _ => throw new IllegalArgumentException(
        "tx.setMetaData requires a metadata object: {key: value}")
    }
    tx.setTxMetadata(meta.toMap)
    statusRow(g, "Transaction metadata set successfully")
  }

  val procedures: Map[String, (PropertyGraph, Seq[Any]) => DataFrame] = Map(
    "db.indexes" -> ((g, _) => dbIndexes(g)),
    "db.constraints" -> ((g, _) => dbConstraints(g)),
    "db.index.stats" -> ((g, _) => dbIndexStats(g)),
    "db.schema.nodeproperties" -> ((g, _) => schemaNodeProperties(g)),
    "db.schema.relproperties" -> ((g, _) => schemaRelProperties(g)),
    "db.awaitindex" -> ((g, _) => statusRow(g, "Index is online")),
    "db.awaitindexes" -> ((g, _) => statusRow(g, "All indexes are online")),
    "db.resampleindex" -> ((g, _) => statusRow(g, "Index statistics updated")),
    "db.clearquerycaches" -> ((g, _) => {
      // the Spark-native analog of call_compat.go:760-800's four cache
      // clears: drop all cached/checkpointed relations in the session
      spark(g).catalog.clearCache()
      statusRow(g, "Query caches cleared")
    }),
    "db.stats.clear" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(("QUERIES", """{"cleared": true}""")).toDF("section", "data")
    }),
    "db.stats.collect" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(("QUERIES", true, "Query collection started"))
        .toDF("section", "success", "message")
    }),
    "db.stats.retrieve" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(("QUERIES", """{"totalQueries": 0, "cachedQueries": 0, "avgExecutionMs": 0}"""))
        .toDF("section", "data")
    }),
    "db.stats.retrieveallanthestats" -> ((g, _) => statsRetrieveAll(g)),
    "db.stats.status" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(("QUERIES", "idle", "Statistics collection is available"))
        .toDF("section", "status", "message")
    }),
    "db.stats.stop" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(("QUERIES", true, "Statistics collection stopped"))
        .toDF("section", "success", "message")
    }),
    "dbms.info" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(("graft-instance", "graft", "2024-01-01T00:00:00Z"))
        .toDF("id", "name", "creationDate")
    }),
    "dbms.listconfig" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(
        ("graft.version", "Engine version", "1.0.0", false),
        ("graft.bolt.enabled", "Bolt protocol enabled", "true", false),
        ("graft.http.enabled", "HTTP API enabled", "true", false))
        .toDF("name", "description", "value", "dynamic")
    }),
    "dbms.clientconfig" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(
        ("server.bolt.advertised_address", "localhost:7687"),
        ("server.http.advertised_address", "localhost:7474"))
        .toDF("name", "value")
    }),
    "dbms.listconnections" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq.empty[(String, String, String, String, String, String)]
        .toDF("connectionId", "connectTime", "connector", "username",
          "userAgent", "clientAddress")
    }),
    "dbms.procedures" -> ((g, _) => dbmsProcedures(g)),
    "dbms.functions" -> ((g, _) => dbmsFunctions(g)),
    "nornicdb.version" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      Seq(("1.0.0", "graft", "community")).toDF("version", "build", "edition")
    }),
    "nornicdb.stats" -> ((g, _) => nornicdbStats(g)),
    "nornicdb.decay.info" -> ((g, _) => {
      val s = spark(g); import s.implicits._
      // the stock half-lives (pkg/decay defaults; the same 7/69/693-day
      // constants graft.functions.Decay uses)
      Seq((true, "7 days", "69 days", "693 days", 0.05))
        .toDF("enabled", "halfLifeEpisodic", "halfLifeSemantic",
          "halfLifeProcedural", "archiveThreshold")
    }),
    "tx.setmetadata" -> ((g, args) => txSetMetadata(g, args)),

    // ---- the CALL dispatcher's dotted apoc aliases (call.go:640-667):
    // the reference routes APOC.EXPORT.CSV.ALL / APOC.LOAD.JSON /
    // APOC.ALGO.WCC etc.; these bind the dotted spellings to the engine's
    // existing implementations so reference scripts run verbatim.
    // (apoc.load.json / apoc.load.csv are already in the base registry,
    // Planner.scala:203-206 — NOT re-bound here: the JSON loader reads the
    // engine's own JSON-lines export format)
    "apoc.export.csv.all" -> ((g, args) => {
      val n = graft.sources.Formats.exportCsv(
        g.nodes.select(col("id"), col("key"), col("name")), args(0).toString)
      val s = spark(g); import s.implicits._
      Seq((args(0).toString, n, true)).toDF("file", "rows", "done")
    }),
    "apoc.export.json.all" -> ((g, args) => {
      val n = graft.sources.Formats.exportNodesJson(g, None, args(0).toString)
      val s = spark(g); import s.implicits._
      Seq((args(0).toString, n, true)).toDF("file", "nodes", "done")
    }),
    // query-scoped exports (apoc_load_export.go): run the inner Cypher,
    // write its result
    "apoc.export.csv.query" -> ((g, args) => {
      val df = Cypher.run(g, args(0).toString)
      val n = graft.sources.Formats.exportCsv(df, args(1).toString)
      val s = spark(g); import s.implicits._
      Seq((args(1).toString, n, true)).toDF("file", "rows", "done")
    }),
    "apoc.export.json.query" -> ((g, args) => {
      val df = Cypher.run(g, args(0).toString)
      val path = args(1).toString
      df.coalesce(1).write.mode("overwrite").json(path)
      val s = spark(g); import s.implicits._
      Seq((path, df.count(), true)).toDF("file", "rows", "done")
    }),
    // apoc.neighbors.byhop(startId[, relType[, maxLevel]]) —
    // distinct nodes first reached at each hop (neighbors.go byhop)
    "apoc.neighbors.byhop" -> ((g, args) => {
      val start = g.nodes.filter(col("id") === args(0).toString).select("id")
      val relType = args.lift(1).map(_.toString).filter(_.nonEmpty)
      val maxLevel = args.lift(2).map(_.toString.toDouble.toInt).getOrElse(3)
      graft.operators.PathExpand.neighborsByHop(g, start, maxLevel, relType)
        .select(col("hop"), col("n_nodes")).orderBy("hop")
    }),
    // apoc.algo.wcc([label]) → (node, componentId) per node
    // (apoc_community.go:332-350). Component label = min member id — the
    // reference's ints are iteration-order arbitrary; same partition.
    "apoc.algo.wcc" -> ((g, args) => {
      val base = graft.algos.GraphXAlgos.wcc(g)
      val scoped = args.headOption.map(_.toString).filter(_.nonEmpty) match {
        case Some(l) => base.join(g.nodesByLabel(l).select("id"), "id")
        case None => base
      }
      scoped.select(col("id").as("node"), col("component").as("componentId"))
    }),
    // apoc.algo.labelpropagation([label]) → (node, community)
    // (apoc_community.go:225-243; 20 rounds like maxIterations)
    "apoc.algo.labelpropagation" -> ((g, args) => {
      val base = graft.algos.GraphXAlgos.labelPropagation(g, 20)
      val scoped = args.headOption.map(_.toString).filter(_.nonEmpty) match {
        case Some(l) => base.join(g.nodesByLabel(l).select("id"), "id")
        case None => base
      }
      scoped.select(col("id").as("node"), col("label").as("community"))
    }))
}
