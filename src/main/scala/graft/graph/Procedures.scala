package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Metadata procedures (SURVEY §2.11: `db.labels`, `db.relationshipTypes`,
  * `db.propertyKeys`, `db.schema.visualization` —
  * `/root/reference/pkg/cypher/call.go:676-790,818,841`): catalog queries
  * over the graph itself, each a small aggregation.
  */
object Procedures {

  /** CALL db.labels() — distinct labels with node counts. */
  def dbLabels(g: PropertyGraph): DataFrame =
    g.nodes.select(explode(col("labels")).as("label"))
      .groupBy("label").agg(count(lit(1)).as("n_nodes"))

  /** CALL db.relationshipTypes() */
  def dbRelationshipTypes(g: PropertyGraph): DataFrame =
    g.edges.groupBy(col("rel_type")).agg(count(lit(1)).as("n_rels"))

  /** CALL db.propertyKeys() — hoisted property columns plus keys observed
    * in the dynamic property map.
    */
  def dbPropertyKeys(g: PropertyGraph): DataFrame = {
    val hoisted = Seq("key", "name", "acctbal", "mktsegment")
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val fromMap = g.nodes.select(explode(map_keys(col("properties"))).as("property_key"))
      .union(g.edges.select(explode(map_keys(col("properties")))))
      .distinct()
    hoisted.toDF("property_key").union(fromMap).distinct()
  }

  /** CALL dbms.components() — engine identity (the reference reports
    * name/version/edition, `call.go:676-790`).
    */
  def dbmsComponents(g: PropertyGraph): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    Seq(("graft", org.apache.spark.SPARK_VERSION, "spark-native"))
      .toDF("name", "version", "edition")
  }

  /** CALL db.info(): node/edge totals. */
  def dbInfo(g: PropertyGraph): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    Seq((g.nodes.count(), g.edges.count())).toDF("node_count", "relationship_count")
  }

  /** CALL apoc.meta.stats() — the reference's exact yield surface
    * (apoc/meta/meta.go:93-98): labelCount, relTypeCount,
    * propertyKeyCount (distinct keys of the string property maps),
    * nodeCount, relCount.
    */
  def metaStats(g: PropertyGraph): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, map_keys}
    val labelCount = g.nodes.select(explode(col("labels")).as("l")).distinct().count()
    val relTypeCount = g.edges.select("rel_type").distinct().count()
    val propertyKeyCount = g.nodes
      .select(explode(map_keys(col("properties"))).as("k"))
      .union(g.edges.select(explode(map_keys(col("properties"))).as("k")))
      .distinct().count()
    Seq((labelCount, relTypeCount, propertyKeyCount, g.nodes.count(), g.edges.count()))
      .toDF("labelCount", "relTypeCount", "propertyKeyCount", "nodeCount", "relCount")
  }

  /** CALL db.ping() */
  def dbPing(g: PropertyGraph): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    Seq(true).toDF("success")
  }

  /** CALL db.schema.nodeTypeProperties() — Neo4j's schema introspection
    * rows (nodeType, nodeLabels, propertyName, propertyTypes,
    * mandatory). Listed by the reference's SHOW PROCEDURES
    * (executor_show.go:45); the row shape is the published Neo4j
    * contract. Hoisted typed columns report their Spark-mapped Cypher
    * type; string-map properties report String. `mandatory` = the
    * property is present on every node of the label — one distributed
    * aggregation, no per-label loop.
    */
  def nodeTypeProperties(g: PropertyGraph): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def cypherType(dt: DataType): String = dt match {
      case LongType | IntegerType | ShortType => "Long"
      case DoubleType | FloatType => "Double"
      case BooleanType => "Boolean"
      case _: DecimalType => "Double"
      case _ => "String"
    }
    val meta = Set("id", "labels", "properties")
    val hoisted = g.nodes.schema.fields.filterNot(f => meta(f.name))
      .map(f => f.name -> cypherType(f.dataType)).toMap
    val perLabel = g.nodes.select(explode(col("labels")).as("label"),
      col("properties"), struct(g.nodes.columns.map(col): _*).as("n"))
    // one row per (label, property) PRESENCE: hoisted non-null columns
    // union non-null string-map values — deduped per row (hoisted
    // properties are mirrored into the map, and the map keeps null
    // values for schema-uniform labels)
    val occur = perLabel.select(col("label"),
        explode(array_distinct(concat(
          array(hoisted.keys.toSeq.sorted.map(k =>
            when(col(s"n.$k").isNotNull, lit(k))): _*),
          map_keys(map_filter(coalesce(col("properties"),
              expr("map()").cast("map<string,string>")),
            (_, v) => v.isNotNull))))).as("propertyName"))
      .filter(col("propertyName").isNotNull)
    val labelTotals = perLabel.groupBy("label").agg(count(lit(1)).as("total"))
    occur.groupBy("label", "propertyName").agg(count(lit(1)).as("present"))
      .join(labelTotals, "label")
      .select(
        concat(lit(":`"), col("label"), lit("`")).as("nodeType"),
        array(col("label")).as("nodeLabels"),
        col("propertyName"),
        array(coalesce(element_at(typedLit(hoisted), col("propertyName")),
          lit("String"))).as("propertyTypes"),
        (col("present") === col("total")).as("mandatory"))
  }

  /** CALL db.schema.relTypeProperties() — (relType, propertyName,
    * propertyTypes, mandatory) over edge properties (string map).
    */
  def relTypeProperties(g: PropertyGraph): DataFrame = {
    import org.apache.spark.sql.functions._
    val occur = g.edges.select(col("rel_type"),
        explode(map_keys(map_filter(coalesce(col("properties"),
            expr("map()").cast("map<string,string>")),
          (_, v) => v.isNotNull))).as("propertyName"))
    val totals = g.edges.groupBy("rel_type").agg(count(lit(1)).as("total"))
    occur.groupBy("rel_type", "propertyName").agg(count(lit(1)).as("present"))
      .join(totals, "rel_type")
      .select(concat(lit(":`"), col("rel_type"), lit("`")).as("relType"),
        col("propertyName"),
        array(lit("String")).as("propertyTypes"),
        (col("present") === col("total")).as("mandatory"))
  }

  /** CALL db.schema.visualization() — (src_label, rel_type, dst_label)
    * triples present in the graph.
    */
  def schemaVisualization(g: PropertyGraph): DataFrame = {
    val nodeLabel = g.nodes.select(col("id"), element_at(col("labels"), 1).as("lbl"))
    g.edges.select("src", "dst", "rel_type")
      .join(nodeLabel.toDF("src", "src_label"), "src")
      .join(nodeLabel.toDF("dst", "dst_label"), "dst")
      .select("src_label", "rel_type", "dst_label")
      .distinct()
  }
}
