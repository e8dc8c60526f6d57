package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}

/** Round 11: the lazy bucketization path. A long keyed-mutation sequence
  * crosses the deferral bound (4th commit), the lazy conversion (buckets
  * become filter views of a pinned parent), per-bucket depth-bounded
  * materialization, and a wholesale invalidate+re-bucketize — and the
  * store's final contents must equal a driver-side replay of the same
  * operations. This is the regression net for the pure-set bookkeeping:
  * a bucket wrongly left "pure" after a rewrite would double-count or
  * drop rows here.
  */
class Round11BucketSpec extends AnyFunSuite {
  import TestSpark._

  private def freshStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
  }

  private def mkNodes(ids: Seq[Long]) =
    spark.createDataFrame(ids.map(Tuple1(_))).toDF("n")
      .select(concat(lit("T:"), col("n")).as("id"),
        array(lit("T")).as("labels"), col("n").as("key"),
        concat(lit("name"), col("n")).as("name"),
        lit(1.0).as("acctbal"), lit(null).cast("string").as("mktsegment"),
        expr("map()").cast("map<string,string>").as("properties"))

  test("20-step mutation sequence across the deferral bound matches a " +
      "driver-side replay") {
    val store = freshStore()
    // model: id -> (exists, nameOverride)
    val model = scala.collection.mutable.Map.empty[Long, String]

    // 1-2: two batch creates (still deferred, whole-frame path)
    store.createNodes(mkNodes(1L to 40L))
    (1L to 40L).foreach(i => model(i) = s"name$i")
    store.createNodes(mkNodes(41L to 80L))
    (41L to 80L).foreach(i => model(i) = s"name$i")

    // 3: per-row SET (3rd commit, still deferred)
    store.setNodeProperty(
      mkNodes(Seq(5L, 17L, 63L)).select("id"), "name", lit("touched-a"))
    Seq(5L, 17L, 63L).foreach(i => model(i) = "touched-a")

    // 4: crosses the bound -> lazy conversion, then touched-bucket rewrite
    store.setNodeProperty(
      mkNodes(Seq(6L, 70L)).select("id"), "name", lit("touched-b"))
    Seq(6L, 70L).foreach(i => model(i) = "touched-b")

    // 5-12: enough single-bucket SETs to push several buckets past
    // maxDepth (forcing per-bucket materialization of view-lineage frames)
    (1L to 8L).foreach { k =>
      store.setNodeProperty(mkNodes(Seq(k)).select("id"), "name", lit(s"pass$k"))
      model(k) = s"pass$k"
    }

    // 13: delete a slice (touches several buckets)
    store.deleteNodes(mkNodes(Seq(2L, 41L, 79L)).select("id"), detach = true)
    Seq(2L, 41L, 79L).foreach(model.remove)

    // 14: merge re-inserts one deleted id and skips an existing one
    store.mergeNodes(mkNodes(Seq(2L, 50L)))
    model(2L) = "name2"

    // 15: wholesale replace (invalidate) then more keyed commits
    store.replaceNodes(store.snapshot.nodes
      .withColumn("name", when(col("id") === "T:33", lit("replaced"))
        .otherwise(col("name"))))
    model(33L) = "replaced"
    (1L to 4L).foreach { k =>
      store.setNodeProperty(mkNodes(Seq(k + 20)).select("id"), "name",
        lit(s"post$k"))
      model(k + 20) = s"post$k"
    }

    val got = store.snapshot.nodes.select("id", "name").collect()
      .map(r => r.getString(0).stripPrefix("T:").toLong -> r.getString(1)).toMap
    assert(got.keySet == model.keySet,
      s"missing=${model.keySet -- got.keySet} extra=${got.keySet -- model.keySet}")
    model.foreach { case (k, v) =>
      assert(got(k) == v, s"id $k: expected $v got ${got(k)}")
    }
    // the properties map mirrors the hoisted column for SET rows
    // (id 6: step-4 "touched-b" then overwritten by the loop's "pass6")
    val props = store.snapshot.nodes.filter(col("id") === "T:6")
      .select(element_at(col("properties"), "name")).head.getString(0)
    assert(props == "pass6")
  }
}
