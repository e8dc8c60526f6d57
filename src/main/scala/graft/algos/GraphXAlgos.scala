package graft.algos

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import graft.graph.PropertyGraph

/** GraphX-backed algorithm variants (SURVEY §7: "GraphX handles graph
  * traversal analytics"). The property graph's string node ids are mapped
  * to dense Longs with a `zipWithIndex` dictionary (collision-free by
  * construction, unlike hashing — SURVEY §7 "hard parts"), the algorithm
  * runs as an in-memory Pregel loop (no per-round query planning/shuffle
  * setup, which dominates the DataFrame variants' wall-clock), and results
  * join back to string ids.
  */
object GraphXAlgos {

  /** Connected components via GraphX Pregel. Returns (id, component) where
    * component = min string id of the component (same contract as
    * [[Algorithms.wcc]]).
    */
  def wcc(g: PropertyGraph, relType: Option[String] = None): DataFrame = {
    val spark = g.nodes.sparkSession
    val es = relType.map(g.edgesByType).getOrElse(g.edges)
      .select("src", "dst").distinct()

    val endpoints = es.select(col("src").as("id"))
      .union(es.select(col("dst").as("id"))).distinct()
    val dict = endpoints.rdd.map(_.getString(0)).zipWithIndex()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val edgeRdd = es.rdd.map(r => (r.getString(0), r.getString(1)))
      .join(dict) // src → srcIdx
      .map { case (_, (dst, srcIdx)) => (dst, srcIdx) }
      .join(dict) // dst → dstIdx
      .map { case (_, (srcIdx, dstIdx)) => Edge(srcIdx, dstIdx, ()) }

    val graph = Graph.fromEdges(edgeRdd, (), StorageLevel.MEMORY_AND_DISK,
      StorageLevel.MEMORY_AND_DISK)
    val cc = graph.connectedComponents()

    val revDict = dict.map { case (id, idx) => (idx, id) }
    val assigned = cc.vertices // (vertexIdx, componentRootIdx)
      .join(revDict)
      .map { case (_, (rootIdx, id)) => (rootIdx, id) }
    // component label = min string id within the component
    val rootToMin = assigned.reduceByKey((a, b) => if (a <= b) a else b)
    val rows = assigned.join(rootToMin)
      .map { case (_, (id, minId)) => Row(id, minId) }

    val schema = StructType(Seq(
      StructField("id", StringType), StructField("component", StringType)))
    val out = spark.createDataFrame(rows, schema)
    out
  }

  /** Static PageRank via GraphX (same update rule as
    * [[Algorithms.pageRank]]: r ← 0.15 + 0.85·Σ r(src)/outdeg), Pregel
    * in-memory iterations. Returns (id, r).
    */
  def pageRank(g: PropertyGraph, iters: Int): DataFrame = {
    val spark = g.nodes.sparkSession
    val es = g.edges.select("src", "dst")

    val endpoints = g.nodes.select("id")
    val dict = endpoints.rdd.map(_.getString(0)).zipWithIndex()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val edgeRdd = es.rdd.map(r => (r.getString(0), r.getString(1)))
      .join(dict)
      .map { case (_, (dst, srcIdx)) => (dst, srcIdx) }
      .join(dict)
      .map { case (_, (srcIdx, dstIdx)) => Edge(srcIdx, dstIdx, 1.0) }

    val graph = Graph.fromEdges(edgeRdd, 1.0, StorageLevel.MEMORY_AND_DISK,
      StorageLevel.MEMORY_AND_DISK)
    val ranks = graph.staticPageRank(iters, 0.15).vertices

    val revDict = dict.map { case (id, idx) => (idx, id) }
    val rows = ranks.join(revDict).map { case (_, (r, id)) => Row(id, r) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", StringType), StructField("r", DoubleType))))
  }
}
