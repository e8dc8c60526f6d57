package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** External-format parity (SURVEY §2.1: `apoc.load.json/csv`,
  * `apoc.export.json/csv`, Neo4j JSON export shape —
  * `/root/reference/pkg/cypher/apoc_load_export.go`,
  * `pkg/storage/types.go:475-500`). Spark's native readers/writers do the
  * heavy lifting; this wraps them in the reference's node/rel JSON shape.
  */
object Formats {

  /** Export nodes in the Neo4j JSON shape: {id, labels, properties}. */
  def exportNodesJson(g: PropertyGraph, labelFilter: Option[String], path: String): Long = {
    val nodes = labelFilter.map(g.nodesByLabel).getOrElse(g.nodes)
    val shaped = nodes.select(col("id"), col("labels"), col("properties"))
    shaped.write.mode("overwrite").json(path)
    shaped.count()
  }

  def importNodesJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Export relationships: {id, type, startNode, endNode, properties}. */
  def exportEdgesJson(g: PropertyGraph, relType: Option[String], path: String): Long = {
    val es = relType.map(g.edgesByType).getOrElse(g.edges)
    val shaped = es.select(col("id"), col("rel_type").as("type"),
      col("src").as("startNode"), col("dst").as("endNode"), col("properties"))
    shaped.write.mode("overwrite").json(path)
    shaped.count()
  }

  def exportCsv(df: DataFrame, path: String): Long = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    df.count()
  }

  /** LOAD CSV WITH HEADERS analog (`clauses.go:1799` rejects this in the
    * reference's embedded mode; trivially supported here).
    */
  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)
}
