package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a subset of registered queries (args = query names;
  * no args = all). Same session config as [[Bench]] so numbers are
  * comparable; pre-warms the same caches.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = GraphQueries.graph(spark, sfDir)
    g.nodes.count(); g.edges.count()
    graft.algos.GraphXAlgos.warm(g)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          println(f"TIMING $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
        case None => println(s"TIMING $name MISSING")
      }
    }
    spark.stop()
  }
}
