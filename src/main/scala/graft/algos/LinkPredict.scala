package graft.algos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Per-source link prediction — the `gds.linkPrediction.<algo>.stream`
  * CALL family (`/root/reference/pkg/cypher/linkprediction.go:74-335`,
  * `pkg/linkpredict/topology.go:244-600`) and the hybrid
  * `gds.linkPrediction.predict.stream`
  * (`linkprediction.go:336`, `pkg/linkpredict/hybrid.go:120-280`).
  *
  * The reference walks an in-memory adjacency map per call; here the
  * neighbor set of the source is a tiny broadcast and the candidate scan
  * is ONE distributed join over the (filtered) edge table — the same plan
  * at 60k edges and at 100 TB. Candidate semantics match `topology.go`:
  * candidates share ≥1 neighbor with the source (all non-neighbors for
  * preferentialAttachment), the source itself and its direct neighbors
  * are excluded.
  *
  * Oracle-exactness: log/division terms are rounded to 9 decimals and
  * summed through DECIMAL(28,12) (the repo-wide pattern from
  * [[Algorithms.linkPrediction]]) so a SQL oracle hash-matches.
  */
object LinkPredict {

  private case class Adj(und: DataFrame, deg: DataFrame)

  private val undCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[PropertyGraph,
      java.util.concurrent.ConcurrentHashMap[String, Adj]]())

  /** Undirected, deduplicated (a, b) adjacency AND its degree table over
    * the given rel types — both CACHED (MEMORY_AND_DISK, so heap-pressure
    * eviction spills instead of dropping the build) per (graph, relTypes):
    * every predictFrom/hybridFrom call on the same graph is a point query
    * over this shared build, with no per-call degree shuffle.
    */
  private def adjacency(g: PropertyGraph, relTypes: Seq[String]): Adj = {
    val inner = undCache.synchronized {
      var m = undCache.get(g)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Adj]()
        undCache.put(g, m)
      }
      m
    }
    inner.computeIfAbsent(relTypes.distinct.sorted.mkString("|"), _ => {
      val es = g.edgesByTypes(relTypes)
      val und = es.select(col("src").as("a"), col("dst").as("b"))
        .union(es.select(col("dst").as("a"), col("src").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct().cache()
      val deg = und.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg")).cache()
      Adj(und, deg)
    })
  }

  /** Pre-materialize the cached adjacency + degrees for a rel-type set
    * (bench warm path, alongside the GraphX ctx warm — point queries then
    * measure the prediction, not the one-time adjacency build).
    */
  def warm(g: PropertyGraph, relTypes: Seq[String]): Unit = {
    val a = adjacency(g, relTypes)
    a.und.count(); a.deg.count(); ()
  }

  private def decSum9(term: Column): Column =
    sum(round(term, 9).cast("decimal(28,12)")).cast("double")

  /** (node1, node2, score) for one topology algorithm from one source. */
  def predictFrom(g: PropertyGraph, source: String, algo: String,
      topK: Int, relTypes: Seq[String] = Nil): DataFrame = {
    scoredFrom(g, source, algo, relTypes)
      .select(lit(source).as("node1"), col("t").as("node2"), col("score"))
      .orderBy(col("score").desc, col("node2").asc)
      .limit(topK)
  }

  /** Unlimited scored candidates (t, score) — shared by the single-algo
    * stream surface and the hybrid blend (which normalizes BEFORE top-k).
    */
  private def scoredFrom(g: PropertyGraph, source: String, algo: String,
      relTypes: Seq[String]): DataFrame = {
    val adj = adjacency(g, relTypes)
    val und = adj.und
    val deg = adj.deg
    val nbrs = und.filter(col("a") === source).select(col("b").as("z"))
    val srcDeg = deg.filter(col("n") === source).select(col("deg").as("sdeg"))

    algo match {
      case "preferential_attachment" =>
        // all non-neighbor nodes, score = deg(s)·deg(t) (topology.go:525)
        deg.filter(col("n") =!= source)
          .join(broadcast(nbrs), col("n") === col("z"), "left_anti")
          .crossJoin(broadcast(srcDeg))
          .select(col("n").as("t"),
            (col("sdeg") * col("deg")).cast("double").as("score"))
      case _ =>
        // common-neighbor family: expand source → z → t (topology.go:244)
        val cands = und
          .join(broadcast(nbrs), col("a") === col("z"))
          .select(col("z"), col("b").as("t"))
          .filter(col("t") =!= source)
          .join(broadcast(nbrs.select(col("z").as("t2"))),
            col("t") === col("t2"), "left_anti")
          .join(deg.withColumnRenamed("n", "z").withColumnRenamed("deg", "zdeg"), "z")
        val grouped = cands.groupBy("t")
        algo match {
          case "common_neighbors" =>
            grouped.agg(count(lit(1)).cast("double").as("score"))
          case "resource_allocation" => // Σ 1/deg(z) (topology.go:577)
            grouped.agg(decSum9(lit(1.0) / col("zdeg")).as("score"))
          case "jaccard" => // |∩| / |∪| (topology.go:377)
            grouped.agg(count(lit(1)).as("cn"))
              .join(deg.withColumnRenamed("n", "t").withColumnRenamed("deg", "tdeg"), "t")
              .crossJoin(broadcast(srcDeg))
              .select(col("t"), (col("cn").cast("double") /
                (col("sdeg") + col("tdeg") - col("cn"))).as("score"))
          case _ => // adamic_adar (default, topology.go:453): Σ 1/ln(deg(z))
            grouped.agg(decSum9(lit(1.0) / log(col("zdeg"))).as("score"))
        }
    }
  }

  /** Hybrid predict.stream: min-max-normalized topology blended with
    * embedding cosine (`hybrid.go:222-280`, defaults `hybrid.go:120`:
    * weights 0.5/0.5, adamic_adar, normalize, minThreshold 0.3).
    * `emb` maps entity id → ARRAY<numeric> (named node embeddings or an
    * embedding table keyed to the entity).
    */
  def hybridFrom(g: PropertyGraph, source: String, emb: DataFrame,
      topK: Int, relTypes: Seq[String] = Nil,
      topologyWeight: Double = 0.5, semanticWeight: Double = 0.5,
      algo: String = "adamic_adar", minThreshold: Double = 0.3): DataFrame = {
    val topo = scoredFrom(g, source, algo, relTypes)
    // min-max over all candidates via ONE agg broadcast back onto the rows
    // — not a single-partition window, which would funnel every candidate
    // of a hub source into one task at scale
    val stats = topo.agg(min("score").as("mn"), max("score").as("mx"))
    val range = col("mx") - col("mn")
    val topoN = when(range === 0.0, lit(1.0))
      .otherwise((col("score") - col("mn")) / range)
    // source vector: driver-side point lookup (hybrid.go:241-252). A source
    // with NO embedding under this property must still emit topology-only
    // predictions with semantic_score 0 — a crossJoin against the empty
    // lookup frame would annihilate every candidate instead.
    val srcVec: Option[Seq[Double]] = emb.filter(col("id") === source)
      .select(col("embedding").cast("array<double>")).limit(1)
      .collect().headOption.flatMap(r =>
        if (r.isNullAt(0)) None else Some(r.getSeq[Double](0)))
    val qe = srcVec.map(v => array(v.map(lit): _*))
      .getOrElse(lit(null).cast("array<double>"))
    topo.crossJoin(broadcast(stats))
      .withColumn("topology_score", topoN)
      .join(emb.withColumnRenamed("id", "t"), Seq("t"), "left_outer")
      .withColumn("qe", qe)
      .withColumn("semantic_score",
        when(col("embedding").isNull || col("qe").isNull, lit(0.0))
          .otherwise(cosExact(col("embedding"), col("qe"))))
      .withColumn("hybrid",
        lit(topologyWeight) * col("topology_score") +
          lit(semanticWeight) * col("semantic_score"))
      .filter(col("hybrid") >= minThreshold)
      .select(lit(source).as("node1"), col("t").as("node2"),
        col("hybrid").as("score"), col("topology_score"), col("semantic_score"),
        reason(col("topology_score"), col("semantic_score")).as("reason"))
      .orderBy(col("score").desc, col("node2").asc)
      .limit(topK)
  }

  /** DECIMAL-routed cosine, rounded to 12 — bit-replayable in SQL. */
  private def cosExact(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column = aggregate(
      zip_with(x, y, (p, q) => (p.cast("double") * q.cast("double")).cast("decimal(38,18)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)"),
      (acc, v) => (acc + v).cast("decimal(38,18)")).cast("double")
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 12)
  }

  private def reason(topo: Column, sem: Column): Column =
    when(topo > 0.6 && sem > 0.6, lit("Strong structural connection and semantic similarity"))
      .when(topo > 0.6, lit("Strong structural connection, moderate semantic match"))
      .when(sem > 0.6, lit("Weak structural connection, strong semantic similarity"))
      .otherwise(lit("Moderate structural and semantic signals"))
}
