package graft.algos

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import graft.graph.PropertyGraph

/** GraphX-backed algorithm variants (SURVEY §7: "GraphX handles graph
  * traversal analytics"). The property graph's string node ids are mapped
  * to dense Longs with a `zipWithIndex` dictionary (collision-free by
  * construction, unlike hashing — SURVEY §7 "hard parts"), the algorithm
  * runs as an in-memory loop (no per-round query planning/shuffle setup,
  * which dominates the DataFrame variants' wall-clock), and results join
  * back to string ids.
  *
  * Two scale decisions, both from round-1/2 bench profiling:
  *  - the dictionary + translated edges are CACHED per (graph, relType) —
  *    one build serves PageRank, WCC, LPA, and Louvain;
  *  - parallel edges are CONTRACTED to (multiplicity, weight-sum) BEFORE
  *    id translation, so the two translation RDD joins run on distinct
  *    pairs, not the raw edge multiset (≈2× fewer rows on CONTAINS).
  */
object GraphXAlgos {

  /** Cached id dictionary + translated contracted edges for one
    * (graph, relType). Edge attr = (multiplicity, weightSum) of the
    * directed pair. The undirected adjacency used by LPA/Louvain is
    * derived lazily once per weighted/unweighted flavor and cached too
    * (louvain + label_prop share it).
    */
  final case class Ctx(
      dict: RDD[(String, Long)], // string id → dense idx
      rev: RDD[(Long, String)], // dense idx → string id
      edges: RDD[Edge[(Double, Double)]]) {
    private val adjCache = new ConcurrentHashMap[Boolean, RDD[(Long, (Long, Double))]]()
    def adjByB(weighted: Boolean): RDD[(Long, (Long, Double))] =
      adjCache.computeIfAbsent(weighted, { w =>
        // hash-partitioned BEFORE persisting: the LPA iteration joins this
        // against an identically-partitioned label RDD every round, so the
        // (large) adjacency never reshuffles — only the (small) per-round
        // vote messages do. Width is derived SEPARATELY from the ctx edge
        // width: the per-round vote join+tally does real work per row, so
        // it wants all cores busy (finer target), while Pregel supersteps
        // want few fat partitions (launch overhead × ~20 rounds).
        val part = new org.apache.spark.HashPartitioner(
          GraphXAlgos.adjWidthFor(2L * edges.count(), // both orientations
            edges.sparkContext.defaultParallelism))
        val rdd = edges
          .flatMap { e =>
            val ew = if (w) e.attr._2 else e.attr._1
            Seq(((e.srcId, e.dstId), ew), ((e.dstId, e.srcId), ew))
          }
          .reduceByKey(_ + _)
          .map { case ((a, b), ew) => (b, (a, ew)) }
          .partitionBy(part)
          .persist(StorageLevel.MEMORY_AND_DISK)
        rdd.count()
        rdd
      })

    /** Order-preserving label codes: rank of the string id in sorted
      * order, so Long comparisons agree with String comparisons (LPA's
      * max-label tie-break, WCC's min-id labeling). Iterating with Long
      * labels keeps the per-round shuffles primitive-typed; [[rankToId]]
      * decodes at the end. Built lazily once per ctx.
      */
    lazy val idxToRank: RDD[(Long, Long)] = {
      val r = dict.sortBy(_._1).zipWithIndex()
        .map { case ((_, idx), rank) => (idx, rank) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      r.count()
      r
    }
    lazy val rankToId: RDD[(Long, String)] = {
      val r = idxToRank.join(rev)
        .map { case (_, (rank, id)) => (rank, id) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      r.count()
      r
    }

    /** Distinct (from, to) pair adjacency per direction ("out"|"in"|"both"),
      * hash-partitioned and cached — the BFS loops in [[BfsRdd]] join their
      * frontier against this without reshuffling the adjacency per level.
      */
    private val pairCache = new ConcurrentHashMap[String, RDD[(Long, Long)]]()
    def pairsByDir(dir: String): RDD[(Long, Long)] =
      pairCache.computeIfAbsent(dir, { d =>
        val base = edges.map(e => (e.srcId, e.dstId))
        val oriented = d match {
          case "out" => base // contracted: already distinct
          case "in"  => base.map(_.swap)
          case _     => base.union(base.map(_.swap)).distinct()
        }
        // scale-aware width, NOT the ctx edge width: the BFS loops shuffle
        // a frontier against this every level, and shuffle-block count
        // grows as maps × reducers — the round-13 LPA lesson applies to
        // every per-round shuffle (round-13 verdict item #6). Fine target
        // = the COARSE 128k/partition: a frontier pass does trivial work
        // per row (launch-bound, like Pregel supersteps), so the vote
        // pass's 32k target just multiplied task launches — measured
        // +35-120% on the sf0.1 BFS rows before this was split out.
        val part = new org.apache.spark.HashPartitioner(
          GraphXAlgos.adjWidthFor(
            (if (d == "both") 2L else 1L) * edges.count(),
            edges.sparkContext.defaultParallelism,
            fineTarget = GraphXAlgos.EdgesPerPartition))
        val rdd = oriented.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
        rdd.count()
        rdd
      })

    /** Per-partition CSR index of the pair adjacency (one [[CsrAdj]] per
      * partition, self-loops dropped) — the iterative loops (WCC min-label,
      * SCC trim) `zipPartitions` their per-round delta against this instead
      * of RDD-joining the pair RDD: a co-partitioned RDD join is a COGROUP
      * that re-materializes the full adjacency partition into a hash map
      * EVERY round (~2.6 s/round fixed cost at sf1, the round-12 profile's
      * dominant term), while the CSR lookup costs only the delta's edges.
      * Same idea as GraphX's indexed vertex/edge partitions, kept to
      * exactly the two primitives these loops need.
      */
    /** Materialized component labelings, keyed by algorithm — the same
      * derived-index pattern as [[csrByDir]] and the search tier's HNSW
      * partition-graph cache: a ctx belongs to ONE immutable graph
      * snapshot (writes produce a new PropertyGraph → a new ctx), so a
      * computed labeling can never go stale, and repeat analytics over a
      * loaded store pay the loop once (the reference's benchmarks
      * likewise run against loaded storage — BASELINE.md).
      */
    private val resultCache = new ConcurrentHashMap[String, DataFrame]()
    private[algos] def cachedResult(key: String)(f: => DataFrame): DataFrame =
      resultCache.computeIfAbsent(key, _ => f)

    /** Per-partition WEIGHTED CSR of the undirected vote adjacency (one
      * [[CsrWAdj]] per [[adjByB]] partition, same partitioner) — the LPA
      * vote loop `zipPartitions` labels against this instead of RDD-joining
      * [[adjByB]]: the join is a COGROUP that re-materializes the full
      * adjacency partition into a hash map EVERY round, and its output
      * shuffles ONE RECORD PER (edge, label) — the term that put
      * q_algo_louvain/label_prop at 35.7×/34.6× of sf0.1 in the round-12
      * sf3 probe. The CSR pass tallies votes into a per-partition map
      * first, so the shuffle carries one record per DISTINCT (dst, label)
      * per partition (round-13 verdict item #2's "emit votes through the
      * CSR substrate" option).
      */
    private val voteCsrCache = new ConcurrentHashMap[Boolean, RDD[CsrWAdj]]()
    def voteCsr(weighted: Boolean): RDD[CsrWAdj] =
      voteCsrCache.computeIfAbsent(weighted, { w =>
        val rdd = adjByB(w)
          .mapPartitions(it => Iterator.single(CsrWAdj.build(it)),
            preservesPartitioning = true)
          .persist(StorageLevel.MEMORY_AND_DISK)
        rdd.count()
        rdd
      })

    private val csrCache = new ConcurrentHashMap[String, RDD[CsrAdj]]()
    def csrByDir(dir: String): RDD[CsrAdj] =
      csrCache.computeIfAbsent(dir, { d =>
        val base = edges.map(e => (e.srcId, e.dstId))
          .filter { case (a, b) => a != b }
        val oriented = d match {
          case "out" => base
          case "in"  => base.map(_.swap)
          case _     => base.union(base.map(_.swap)).distinct()
        }
        // scale-aware width (round-13 verdict item #6): the WCC delta loop
        // and SCC trim/FW-BW rounds shuffle state at THIS width every
        // round; the flat ctx edge width put sf10 at ~1000 partitions →
        // ~1M shuffle blocks per round (maps × reducers), the exact term
        // that dominated the round-12 sf3 LPA probe. Fine target = the
        // coarse 128k/partition (delta passes are launch-bound — see
        // pairsByDir); the 4·par cap and 4M bytes floor do the scale work.
        val part = new org.apache.spark.HashPartitioner(
          GraphXAlgos.adjWidthFor(
            (if (d == "both") 2L else 1L) * edges.count(),
            edges.sparkContext.defaultParallelism,
            fineTarget = GraphXAlgos.EdgesPerPartition))
        val rdd = oriented.partitionBy(part)
          .mapPartitions(it => Iterator.single(CsrAdj.build(it)),
            preservesPartitioning = true)
          .persist(StorageLevel.MEMORY_AND_DISK)
        rdd.count()
        rdd
      })
  }

  /** Compact per-partition adjacency: sorted source array + offsets +
    * neighbor array (CSR). Built once per ctx direction, looked up by
    * binary search — primitive arrays, no per-edge boxing, stable under
    * MEMORY_AND_DISK serialization.
    */
  private[graft] final class CsrAdj(
      val keys: Array[Long], val offs: Array[Int], val nbrs: Array[Long])
      extends Serializable {
    def degree(v: Long): Int = {
      val i = java.util.Arrays.binarySearch(keys, v)
      if (i >= 0) offs(i + 1) - offs(i) else 0
    }
    /** Iterator of (neighbor, payload) for every neighbor of `v`. */
    def emit[T](v: Long, payload: T): Iterator[(Long, T)] = {
      val i = java.util.Arrays.binarySearch(keys, v)
      if (i < 0) Iterator.empty
      else new Iterator[(Long, T)] {
        private var j = offs(i)
        private val end = offs(i + 1)
        def hasNext: Boolean = j < end
        def next(): (Long, T) = { val n = nbrs(j); j += 1; (n, payload) }
      }
    }
  }

  private[graft] object CsrAdj {
    def build(it: Iterator[(Long, Long)]): CsrAdj = {
      val arr = it.toArray.sortBy(_._1)
      val nbrs = new Array[Long](arr.length)
      val keysBuf = new scala.collection.mutable.ArrayBuffer[Long]()
      val offsBuf = new scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < arr.length) {
        val k = arr(i)._1
        if (keysBuf.isEmpty || keysBuf.last != k) { keysBuf += k; offsBuf += i }
        nbrs(i) = arr(i)._2
        i += 1
      }
      offsBuf += arr.length
      new CsrAdj(keysBuf.toArray, offsBuf.toArray, nbrs)
    }
  }

  /** [[CsrAdj]] with a parallel edge-weight array — the LPA/Louvain vote
    * substrate. keys = voters (the `b` side of [[Ctx.adjByB]]), nbrs =
    * the vote receivers, wts = the contracted edge weight (multiplicity
    * or weight-sum per the `weighted` flavor).
    */
  private[graft] final class CsrWAdj(
      val keys: Array[Long], val offs: Array[Int],
      val nbrs: Array[Long], val wts: Array[Double]) extends Serializable {
    def indexOf(v: Long): Int = java.util.Arrays.binarySearch(keys, v)
  }

  private[graft] object CsrWAdj {
    def build(it: Iterator[(Long, (Long, Double))]): CsrWAdj = {
      val arr = it.toArray.sortBy(_._1)
      val nbrs = new Array[Long](arr.length)
      val wts = new Array[Double](arr.length)
      val keysBuf = new scala.collection.mutable.ArrayBuffer[Long]()
      val offsBuf = new scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < arr.length) {
        val k = arr(i)._1
        if (keysBuf.isEmpty || keysBuf.last != k) { keysBuf += k; offsBuf += i }
        nbrs(i) = arr(i)._2._1
        wts(i) = arr(i)._2._2
        i += 1
      }
      offsBuf += arr.length
      new CsrWAdj(keysBuf.toArray, offsBuf.toArray, nbrs, wts)
    }
  }

  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[PropertyGraph, ConcurrentHashMap[String, Ctx]]())

  private def ctx(g: PropertyGraph, relType: Option[String]): Ctx =
    ctxFor(g, relType.toSeq)

  /** Cached context for an arbitrary rel-type set (empty = all edges) —
    * shared by the algorithm family AND the [[BfsRdd]] path queries, so one
    * build (pre-warmed by the bench) serves both.
    */
  private[graft] def ctxFor(g: PropertyGraph, relTypes: Seq[String]): Ctx = {
    val inner = cache.synchronized {
      var m = cache.get(g)
      if (m == null) { m = new ConcurrentHashMap[String, Ctx](); cache.put(g, m) }
      m
    }
    val key = if (relTypes.isEmpty) "*" else relTypes.distinct.sorted.mkString("|")
    inner.computeIfAbsent(key, _ => build(g, relTypes))
  }

  /** Contracted edges per partition the ctx aims for. ~128k edge tuples is
    * a few MB per partition — big enough that Pregel superstep task-launch
    * overhead stays negligible (the sf0.1 full graph, ~1.3M pairs, gets ~11
    * partitions; fixture-sized projections collapse to one), small enough
    * that a partition never threatens executor memory. A fixed session
    * width here was the round-5 regression: every superstep on a tiny graph
    * paid 32 task launches (wcc_star 0.45 → 11.8 s), and a too-small target
    * re-creates it from the other side (width cap → 64 tiny tasks).
    */
  private[graft] val EdgesPerPartition = 131072L

  /** Finer width target for the LPA/Louvain undirected adjacency: its
    * per-round vote pass is compute-bound per row (not launch-bound like
    * Pregel supersteps), so ~32k rows per partition keeps every core busy
    * on the sf0.1 CONTAINS graph while fixtures still collapse to 1.
    * This is the FLOOR target only — see [[adjWidthFor]]: applied
    * unclamped it put the sf3 vote adjacency at 2384 partitions, and the
    * per-round label shuffle's 2384×2384 ≈ 5.7M shuffle blocks were the
    * dominant cost of the 35.7×/34.6× probe rows (measured round 13:
    * with per-partition CSR tallies replacing the join, rounds STILL ran
    * 43-53 s — the work wasn't in the tally at all).
    */
  private[graft] val AdjEdgesPerPartition = 32768L

  /** Bytes ceiling for one vote-adjacency partition (~100 MB of CSR
    * arrays + tally map at 24-ish bytes/edge). The width never drops
    * below what keeps partitions under this, no matter the core count —
    * the round-12 lesson that cores are the wrong ceiling, preserved.
    */
  private[graft] val AdjMaxEdgesPerPartition = 1L << 22

  /** Per-task entry cap for the LPA vote tally map — ~512k boxed
    * (dst,label)→weight entries ≈ 60-100 MB of heap, flushed to the
    * shuffle and restarted when exceeded (the downstream combineByKey
    * merges partials, so chunking is exact). Bounds vote-pass heap
    * independently of [[AdjMaxEdgesPerPartition]], whose ~24 bytes/edge
    * sizing is right for the CSR arrays but 5× low for the tally map
    * (round-13 ADVICE item 2).
    */
  private[graft] def TallyFlushEntries: Int =
    // system-property override is TEST plumbing (forces chunking on small
    // graphs so the exactness spec doesn't need a 512k-edge fixture);
    // local-mode executors share the driver JVM so the property is seen
    sys.props.get("graft.test.tallyFlushEntries").map(_.toInt)
      .getOrElse(1 << 19)

  /** Scale-aware width for the LPA vote adjacency: fine-grained
    * (32k/partition) while that stays under ~4 waves per core — small
    * graphs keep every core busy — but capped at 4·parallelism once the
    * graph is large enough that per-round real work saturates the cores
    * anyway, because shuffle-block count grows QUADRATICALLY in width
    * (M maps × R reduces) and dominated the sf3 rounds. The bytes bound
    * overrides the cap so per-partition size stays constant at any
    * scale: at 100× sf3 (7.8 G vote edges) the width is back up to
    * ~1860, each partition still ≤ [[AdjMaxEdgesPerPartition]].
    */
  private[graft] def adjWidthFor(nEdges: Long, defaultPar: Int,
      fineTarget: Long = AdjEdgesPerPartition): Int = {
    val fine = nEdges / fineTarget + 1
    val coarseCap = math.max(1L, 4L * defaultPar)
    val bytesFloor = nEdges / AdjMaxEdgesPerPartition + 1
    math.min(MaxWidth.toLong,
      math.max(bytesFloor, math.min(fine, coarseCap))).toInt
  }

  /** Hard ceiling on data-derived widths — a runaway backstop (4096
    * partitions × 128k edge tuples ≈ half a billion edges), far above any
    * width this engine derives in practice, NOT a sizing device.
    */
  private[graft] val MaxWidth = 4096

  /** Lineage hygiene for the hand-rolled iterative loops (round-14).
    *
    * Two distinct failure modes share one cause — per-round RDDs keep the
    * whole loop history reachable through their lineage:
    *
    *  1. Every per-round shuffle (LPA vote tallies, WCC delta messages,
    *     SCC color/sweep rounds) leaves its shuffle FILES on executor
    *     disk until the driver GC collects the ShuffleDependency, and
    *     while the chain is reachable nothing is collectable: disk grows
    *     linearly in rounds × shuffle volume. Invisible at sf0.1
    *     (megabytes); the round-14 sf10 probe measured one
    *     label-propagation child writing 64 GB of blockmgr files before
    *     dying of disk exhaustion (ENOSPC inside DiskStore.put).
    *  2. DAGScheduler walks the lineage graph when planning each round's
    *     jobs; loops whose round RDD references the previous round MORE
    *     THAN ONCE (the SCC sweep's `union` + `subtractByKey` both reach
    *     back to `inScc`) make that walk grow super-linearly with depth —
    *     a 40-round sweep froze the scheduler event loop for over half an
    *     hour of CPU on a 120-vertex fixture.
    *
    * So every pinned round RDD is `localCheckpoint()`-ed UNCONDITIONALLY:
    * the mark is placed before the round's own materializing count(), the
    * truncation happens inside that same job (no extra job — all
    * partitions are freshly cached), and the superseded chain becomes
    * unreachable. localCheckpoint trades executor-loss re-computability
    * for it — acceptable: the loops' source CSRs stay cached, a lost
    * round restarts the query, and the reliable-checkpoint alternative
    * is the deployment knob a cluster operator flips via the store's
    * checkpointDir.
    *
    * The `System.gc()` nudge that lets ContextCleaner reap the dead
    * shuffles NOW (a large driver heap may never full-GC on its own) is
    * the only part with a real cost, so it is gated: every
    * [[LoopCkptEvery]]-th round on graphs past [[LoopCkptMinEdges]]
    * oriented edges. Small graphs never pay it.
    */
  private[graft] val LoopCkptEvery = 3
  private[graft] def LoopCkptMinEdges: Long =
    // system-property override is TEST plumbing (forces the GC-nudge
    // cadence on fixture-sized graphs so the engaged path is spec-checked
    // without a 32M-edge fixture); local-mode executors share the driver
    // JVM so the property is seen
    sys.props.get("graft.test.loopCkptMinEdges").map(_.toLong)
      .getOrElse(1L << 25) // 32M oriented edges

  /** True on the rounds where the loop should GC-nudge. */
  private[graft] def hygieneRound(round: Int, nEdges: Long): Boolean =
    nEdges >= LoopCkptMinEdges && round % LoopCkptEvery == 0

  private[graft] def loopGc(round: Int, nEdges: Long): Unit =
    if (hygieneRound(round, nEdges)) System.gc()

  /** Max boundary label pairs the WCC union-find endgame will collect to
    * the driver (~100 MB boxed at this bound). Above it — early rounds,
    * or adversarially fragmented graphs at cluster scale — the loop just
    * keeps running distributed rounds instead. (sys-prop override is
    * TEST plumbing, mirroring [[TallyFlushEntries]].)
    */
  private[graft] def EndgamePairCap: Long =
    sys.props.get("graft.test.endgamePairCap").map(_.toLong)
      .getOrElse(2000000L)

  /** When the FORCED endgame (round budget exhausted, labels still
    * moving) sees more than this multiple of [[EndgamePairCap]] boundary
    * pairs, it closes the label-pair graph DISTRIBUTED (pointer-jumping
    * min-propagation, O(log n) rounds, no driver state) instead of
    * streaming the pairs through a driver union-find — whose parent map
    * grows with every distinct label mentioned and is then broadcast,
    * a driver-OOM risk on adversarial topologies far past the cap
    * (round-13 ADVICE item 3). Near-cap forced runs keep the driver
    * path: one machine-local pass beats ~15 extra shuffle rounds.
    */
  private[graft] val EndgameDistributedFactor = 4L

  /** Partition width for a ctx holding `nEdges` contracted edges: scales
    * with DATA SIZE so per-partition bytes stay CONSTANT as data grows.
    * The round-11 version clamped this to 2·defaultParallelism, which
    * inverted the invariant on a fixed-core box: past the cap every
    * partition grew linearly with data, and the LPA vote join/tally's
    * per-partition state OOM'd the sf3 probe (BENCH_r11_sf3). Cores are
    * the wrong ceiling — Spark schedules any width over any core count;
    * only per-partition size must stay bounded. Small projections still
    * collapse toward 1 partition (no fixed-width tiny-task tax), and the
    * Pregel launch-overhead concern is handled by routing big graphs off
    * Pregel entirely ([[pregelMaxEdges]]), not by capping width.
    */
  private[graft] def widthFor(nEdges: Long, defaultPar: Int,
      target: Long = EdgesPerPartition): Int =
    math.max(1L, math.min(MaxWidth.toLong, nEdges / target + 1)).toInt

  private def build(g: PropertyGraph, relTypes: Seq[String]): Ctx = {
    val es = g.edgesByTypes(relTypes)
      .groupBy("src", "dst")
      .agg(count(lit(1)).cast("double").as("cnt"), sum("weight").as("wsum"))
    // full-graph contexts take the node table as the endpoint superset —
    // skips a 2×|E| union+distinct shuffle; Graph.fromEdges only
    // materializes endpoint vertices anyway
    val endpoints = relTypes match {
      case Seq() => g.nodes.select("id")
      case _ => es.select(col("src").as("id"))
        .union(es.select(col("dst").as("id"))).distinct()
    }
    // one map-side-combined count pass sizes the whole ctx: every
    // downstream width — translation joins, edge RDD, Pregel supersteps,
    // LPA adjacency — derives from it instead of a data-blind constant
    val par = widthFor(es.count(), g.nodes.sparkSession.sparkContext.defaultParallelism)
    val hp = new org.apache.spark.HashPartitioner(par)
    val dict = endpoints.rdd.map(_.getString(0)).zipWithIndex()
      .partitionBy(hp) // co-partitioned with both translation joins
      .persist(StorageLevel.MEMORY_AND_DISK)
    dict.count() // pin before reuse: zipWithIndex must evaluate exactly once
    val edgeRdd = es.rdd
      .map(r => (r.getString(0), (r.getString(1), r.getDouble(2), r.getDouble(3))))
      .join(dict, hp)
      .map { case (_, ((dst, c, w), srcIdx)) => (dst, (srcIdx, c, w)) }
      .join(dict, hp)
      .map { case (_, ((srcIdx, c, w), dstIdx)) => Edge(srcIdx, dstIdx, (c, w)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    edgeRdd.count()
    // rev carries the ctx partitioner so result-decode joins
    // (vertices ⋈ rev) run at ctx width, not the Catalyst shuffle width
    val rev = dict.map(_.swap).partitionBy(hp)
      .persist(StorageLevel.MEMORY_AND_DISK)
    Ctx(dict, rev, edgeRdd)
  }

  private def toDf(g: PropertyGraph, rows: RDD[Row], schema: StructType): DataFrame =
    g.nodes.sparkSession.createDataFrame(rows, schema)

  /** Pre-build the contexts the headline algorithm/path queries touch, so
    * benchmarks measure the algorithms rather than the one-time dictionary
    * build (the reference's benchmarks likewise run against loaded storage).
    * Warms: full-graph ctx (+ out/both pair adjacency for the BFS family)
    * and the CONTAINS ctx (+ both LPA vote flavors).
    */
  def warm(g: PropertyGraph): Unit = {
    val full = ctxFor(g, Nil)
    full.pairsByDir("out"); full.pairsByDir("both")
    val contains = ctxFor(g, Seq("CONTAINS"))
    contains.voteCsr(false); contains.voteCsr(true)
  }

  /** Connected components as min-rank propagation over the cached
    * undirected adjacency. Returns (id, component) where component = min
    * string id of the component (same contract as [[Algorithms.wcc]]).
    *
    * This deliberately does NOT use GraphX `connectedComponents()`: its
    * Pregel loop keeps every superstep's full graph replica cached
    * MEMORY_ONLY, which goes super-linear the moment the (graph × rounds)
    * working set outgrows the executors — the round-10 sf1 bench measured
    * 12.7× at 10× data from exactly that residency model. Here each round
    * is one co-partitioned join (adjacency never reshuffles) + a min
    * reduce, labels are primitive Long RANKS of the string ids (so Long
    * min agrees with String min exactly, like [[labelPropagation]]), state
    * is MEMORY_AND_DISK, and every superseded round is unpersisted — the
    * resident set is O(|V| + |E|) regardless of round count. Convergence =
    * accumulator-counted label changes hitting zero, checked every round
    * for free on the materializing count. Rounds ≤ graph diameter, same as
    * Pregel CC (reference behavior: apoc_community.go:332).
    */
  /** Contracted-edge count above which full-graph WCC leaves GraphX
    * Pregel for the pointer-jumping DataFrame loop. Below it Pregel's
    * VertexRDD index-joins win on constant factors (1.4 s vs 4.7 s at
    * sf0.1, ~1.3M pairs); above it Pregel's per-superstep graph replicas
    * are what measured 12.7-25.4× at 10× data under heap pressure.
    * 5M sits BELOW the measured degradation point (sf1 ≈ 13M pairs
    * degraded; sf0.1 ≈ 1.3M was healthy) so the scale route actually
    * engages at the scale where Pregel was measured degrading — the
    * round-11 value (20M) sat above it and the routing never fired.
    */
  private[graft] val PregelMaxEdgesDefault = 5000000L

  /** Deployment-tunable: size this to what comfortably fits the
    * executors' aggregate memory (Pregel is the fastest plan whenever
    * its superstep replicas fit; the DF path is the spill-safe fallback
    * past that).
    */
  private[graft] def pregelMaxEdges(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.wcc.pregelMaxEdges")
      .orElse(sys.env.get("GRAFT_WCC_PREGEL_MAX_EDGES"))
      .map(_.toLong).getOrElse(PregelMaxEdgesDefault)

  def wcc(g: PropertyGraph, relType: Option[String] = None,
      maxIter: Int = 50): DataFrame = {
    val c = ctx(g, relType)
    // the delta loop labels every ctx-dict vertex already (the full-graph
    // dict is the whole node table), so only the Pregel route — whose
    // Graph.fromEdges materializes endpoint vertices only — needs the
    // singleton union.
    // maxIter is a ROUND BUDGET, not a result knob: past it the delta loop
    // forces the union-find endgame (edge contraction over the current
    // label regions — exact components from any intermediate state), so
    // the labeling is identical for every maxIter ≥ 1 and one "wcc" memo
    // entry serves all callers (round-12 ADVICE: the budget used to be
    // silently ignored AND a budget exhaustion returned unconverged
    // labels; both fixed).
    if (c.edges.count() <= pregelMaxEdges(g.nodes.sparkSession))
      withSingletons(g, relType, wccPregel(g, c), "component")
    else c.cachedResult("wcc")(wccDeltaLoop(g, c, maxIter))
  }

  /** Every-node contract (apoc_community.go:332 labels every node): both
    * component algorithms label edge ENDPOINTS; for full-graph runs the
    * isolated nodes — present in g.nodes but touching no edge — come back
    * as their own singleton components. Applied identically on every
    * route so results never depend on which size tier served the query
    * (round-11 ADVICE: the Pregel route used to skip this). Typed
    * projections stay endpoint-only (the typed ctx dictionary is
    * endpoint-only too — a node outside the projection isn't in scope).
    */
  private def withSingletons(g: PropertyGraph, relType: Option[String],
      base: DataFrame, labelCol: String): DataFrame = relType match {
    case Some(_) => base
    case None =>
      val singles = g.nodes.select(col("id"))
        .join(base.select("id"), Seq("id"), "left_anti")
        .withColumn(labelCol, col("id"))
      base.unionByName(singles)
  }

  /** Scale path (kept callable for specs): DELTA HashMin over the cached
    * ctx adjacency, iterated in idx space with the STRING id as the
    * label — min(label) over neighbors, but each round only the vertices
    * whose label changed last round re-send, so total message volume is
    * O(|E| · avg label-improvements per edge) ≈ a small constant × |E|,
    * not rounds × |E|. Every shuffle is keyed by VERTEX (reduceByKey min
    * with map-side combiners — hub-degree and giant-component skew both
    * collapse in the combiner), never by label: a label-keyed join
    * (pointer jumping's lookup, or a decode join on the component id)
    * serializes the giant component into one task the moment HashMin
    * converges toward few labels — the round-12 profile measured exactly
    * that. Resident set O(|V|+|E|) with per-round unpersist (the property
    * Pregel's superstep replicas lack — 12.7-25.4× at 10× data under
    * heap pressure). String labels need no rank dictionaries, so the
    * one-time [[Ctx.idxToRank]]/[[Ctx.rankToId]] sort-builds (~28 s at
    * sf1) stay off this path entirely; [[Ctx.rev]] decodes vertices by a
    * co-partitioned idx-keyed join.
    */
  private[graft] def wccScale(g: PropertyGraph,
      relType: Option[String]): DataFrame = {
    val c = ctx(g, relType)
    c.cachedResult("wcc")(wccDeltaLoop(g, c))
  }

  /** Honest-loop twins for the bench/oracle rows: ALWAYS run the
    * bounded-residency scale loops — no small-graph GraphX route, no
    * per-ctx result memo — so (a) sf0.01 oracle rows pin the scale
    * machinery's contract (the routed rows never reach it below the
    * routing thresholds), and (b) scale sweeps track the real algorithmic
    * cost alongside the legitimate memoized number (round-12 verdict #3:
    * "the bench needs an honest-loop twin row").
    */
  def wccLoopFresh(g: PropertyGraph, relType: Option[String] = None): DataFrame =
    wccDeltaLoop(g, ctx(g, relType))

  /** See [[wccLoopFresh]] — the SCC trim+FW-BW coloring loop, unrouted. */
  def sccLoopFresh(g: PropertyGraph, relType: Option[String] = None): DataFrame =
    sccScale(g, ctx(g, relType))

  private[graft] def wccDeltaLoop(g: PropertyGraph, c: Ctx,
      maxIter: Int = 50): DataFrame = {
    val sc = c.edges.sparkContext
    val csr = c.csrByDir("both") // per-partition CSR, pinned once per ctx
    val part = new org.apache.spark.HashPartitioner(csr.getNumPartitions)
    // lineage hygiene (see the [[LoopCkptEvery]] scaladoc): every pinned
    // round RDD truncates its lineage inside its own count() job — blocks
    // are freshly cached, so truncation is free; only the GC nudge that
    // lets ContextCleaner reap the dead shuffles runs on a gated cadence
    val nEdges = 2L * c.edges.count()
    def pin[T](r: RDD[T]): RDD[T] = {
      val p = r.persist(StorageLevel.MEMORY_AND_DISK)
      p.localCheckpoint()
      p.count(); p
    }
    val debug = sys.env.get("GRAFT_ALGO_DEBUG").exists(v => v == "1" || v == "true")
    // labels are the vertex's own dense idx — a deterministic component
    // REPRESENTATIVE only; the min-STRING contract is settled at decode.
    // The (label, changed) flag rides in one pinned RDD per round; the
    // changed-delta is a narrow view over it.
    var state: RDD[(Long, (Long, Boolean))] =
      pin(c.rev.partitionBy(part)
        .mapPartitions(_.map { case (v, _) => (v, (v, true)) },
          preservesPartitioning = true))
    var prev: RDD[(Long, (Long, Boolean))] = null
    var changed = state.count() // every vertex "changed" at init
    val totalV = changed
    var lastEndgameTry = -100
    var iter = 0
    // ONE message pass collects the distinct boundary label pairs, a
    // driver union-find closes them transitively, and a broadcast relabel
    // finishes in one narrow pass. Exact from ANY intermediate labeling
    // (it is edge contraction over the current label regions). `force`
    // ignores EndgamePairCap — the convergence path of last resort.
    def endgame(force: Boolean): Unit = {
      val t1 = System.nanoTime()
      val lbls = state.mapValues(_._1)
      // same source-side prune as the round messages: for a true
      // boundary pair at least one direction has lbl(from) < to (both
      // filtered would force lbl(u)=lbl(v) by the ≤-chain), so pair
      // detection is lossless
      val offered = csr.zipPartitions(lbls, preservesPartitioning = false) {
        (cit, lit) =>
          if (cit.hasNext) {
            val adj = cit.next()
            lit.flatMap { case (v, l) => adj.emit(v, l).filter(_._1 > l) }
          } else Iterator.empty
      }.partitionBy(part)
      // per-partition dedup before the distinct shuffle; the global
      // distinct matters — a local-dedup count overestimated 5× on the
      // CONTAINS graph and wrongly skipped a viable endgame
      val boundary = offered.zipPartitions(state,
        preservesPartitioning = false) { (mit, sit) =>
          val lbl = new java.util.HashMap[java.lang.Long, java.lang.Long]()
          sit.foreach { case (v, (l, _)) => lbl.put(v, l) }
          val seen = new java.util.HashSet[(Long, Long)]()
          mit.flatMap { case (to, lf) =>
            val lt = lbl.get(to)
            if (lt == null || lt.longValue() == lf) Iterator.empty
            else {
              val p = (math.min(lf, lt.longValue()), math.max(lf, lt.longValue()))
              if (seen.add(p)) Iterator.single(p) else Iterator.empty
            }
          }
      }.distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val nPairs = boundary.count()
      if (force && nPairs > EndgameDistributedFactor * EndgamePairCap) {
        // ---- distributed closure (no driver state) ----
        // Pointer-jumping min-propagation over the boundary label-pair
        // graph: parent(x) ← min(parent(x), parents of neighbors), then
        // parent(x) ← parent(parent(x)) — halves remaining depth per
        // round, so O(log n) rounds close any topology. Exact for the
        // same reason as the union-find: this is edge contraction over
        // the current label regions. Relabeling joins on the OLD labels
        // (region representatives — many, roughly balanced), so the
        // giant-component key-skew of a label-keyed shuffle never forms.
        val pairW = new org.apache.spark.HashPartitioner(
          adjWidthFor(2L * nPairs, sc.defaultParallelism))
        val bothDir = boundary
          .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
          .partitionBy(pairW).persist(StorageLevel.MEMORY_AND_DISK)
        var parent: RDD[(Long, Long)] = bothDir
          .reduceByKey(pairW, (a: Long, b: Long) => math.min(a, b))
          .map { case (x, m) => (x, math.min(x, m)) }
          .persist(StorageLevel.MEMORY_AND_DISK)
        var movedRows = 1L
        var pjRound = 0
        while (movedRows > 0) {
          pjRound += 1
          val viaNbr = bothDir.join(parent, pairW)
            .map { case (_, (nbr, p)) => (nbr, p) }
          val prop = parent.union(viaNbr).reduceByKey(pairW, (a: Long, b: Long) => math.min(a, b))
          val jumped = prop.map(_.swap).join(prop, pairW)
            .map { case (_, (x, pp)) => (x, pp) }
            .reduceByKey(pairW, (a: Long, b: Long) => math.min(a, b))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val accPj = sc.longAccumulator
          jumped.join(parent, pairW).foreach { case (_, (nw, old)) =>
            if (nw != old) accPj.add(1)
          }
          movedRows = accPj.value
          parent.unpersist(false)
          parent = jumped
          if (debug) System.err.println(
            f"[wccDelta] endgame-dist round $pjRound: moved=$movedRows")
        }
        val roots = parent.filter { case (x, p) => p != x }
        val finalState = pin(state
          .map { case (v, (l, _)) => (l, v) }
          .leftOuterJoin(roots, pairW)
          .map { case (l, (v, r)) => (v, (r.getOrElse(l), false)) }
          .partitionBy(part))
        parent.unpersist(false); bothDir.unpersist(false)
        if (prev != null) { prev.unpersist(false); prev = null }
        state.unpersist(false)
        state = finalState
        changed = 0
        if (debug) System.err.println(
          f"[wccDelta] endgame (distributed): $nPairs boundary pairs, " +
            f"$pjRound rounds, ${(System.nanoTime() - t1) / 1e9}%.1f s")
      } else if (nPairs <= EndgamePairCap || force) {
        val parentMap = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        def find(x: Long): Long = {
          var r = x
          while ({ val p = parentMap.get(r); p != null && p.longValue() != r }) r = parentMap.get(r)
          var c2 = x // path compression
          while (c2 != r) { val p = parentMap.get(c2); parentMap.put(c2, r); c2 = p.longValue() }
          r
        }
        // forced runs stream partition-at-a-time so the driver never holds
        // the whole pair set AND its collect buffer together
        val pairIt =
          if (nPairs <= EndgamePairCap) boundary.collect().iterator
          else boundary.toLocalIterator
        pairIt.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
            parentMap.put(hi, lo)
          }
        }
        // resolve every mentioned label to its root once, then broadcast
        val resolved = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        val it2 = parentMap.keySet().iterator()
        while (it2.hasNext) { val k = it2.next(); resolved.put(k, find(k.longValue())) }
        val bc = sc.broadcast(resolved)
        val finalState = pin(state.mapPartitions(_.map { case (v, (l, _)) =>
          val r = bc.value.get(l)
          (v, (if (r != null) r.longValue() else l, false))
        }, preservesPartitioning = true))
        if (prev != null) { prev.unpersist(false); prev = null }
        state.unpersist(false)
        state = finalState
        changed = 0
        if (debug) System.err.println(
          f"[wccDelta] endgame: $nPairs boundary pairs, ${(System.nanoTime() - t1) / 1e9}%.1f s")
      } else if (debug) System.err.println(
        f"[wccDelta] endgame skipped: $nPairs pairs > cap, ${(System.nanoTime() - t1) / 1e9}%.1f s")
      boundary.unpersist(false)
    }
    while (changed > 0 && iter < maxIter) {
      iter += 1
      val t0 = System.nanoTime()
      val delta = state.filter(_._2._2).mapValues(_._1) // narrow, cached parent
      // CSR lookup instead of an RDD join: per-round cost ∝ delta's edges,
      // not the full adjacency; reduceByKey's map-side combiners absorb
      // hub-degree and giant-component skew before the shuffle.
      // preservesPartitioning MUST be false: the emitted keys are DST
      // vertices — claiming the src partitioning here made reduceByKey
      // skip its shuffle and silently drop every cross-partition message
      // (single-partition fixtures can't catch it; Round12ScaleSpec's
      // multi-partition chain does).
      // source-side prune: a label ≥ the receiver's idx can never improve
      // (labels start at the vertex's own idx and only decrease), so it
      // is dropped BEFORE the shuffle — halves round-1 volume and more
      // later. No combiner pass either: the receiver-side merge below is
      // already a per-partition min map, and skipping the combiner's
      // boxed hash machinery is faster than the volume it would save.
      val msgs = csr.zipPartitions(delta, preservesPartitioning = false) {
        (cit, dit) =>
          if (cit.hasNext) {
            val adj = cit.next()
            dit.flatMap { case (v, lbl) => adj.emit(v, lbl).filter(_._1 > lbl) }
          } else Iterator.empty
      }.partitionBy(part)
      val acc = sc.longAccumulator
      // min-merge messages into state per partition: msgs materialize into
      // a small per-partition map (≤ touched vertices), state streams
      val next = pin(state.zipPartitions(msgs, preservesPartitioning = true) {
        (sit, mit) =>
          val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
          mit.foreach { case (v, l) =>
            val cur = m.get(v)
            if (cur == null || l < cur.longValue()) m.put(v, l)
          }
          sit.map { case (v, (cur, _)) =>
            val cand = m.get(v)
            val nw = if (cand != null && cand.longValue() < cur) cand.longValue() else cur
            if (nw != cur) acc.add(1)
            (v, (nw, nw != cur))
          }
      })
      loopGc(iter, nEdges)
      changed = acc.value
      if (debug) System.err.println(
        f"[wccDelta] round $iter: changed=$changed ${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (prev != null) prev.unpersist(false)
      prev = state
      state = next
      // ---- union-find endgame ----
      // Once a few rounds have coarsened the label regions, the remaining
      // rounds are a diameter tail (the round-12 profile measured 16
      // sub-1 s rounds after round 4; a chain graph would take its whole
      // length). The label-region graph is tiny by then: ONE message pass
      // collects the distinct boundary label pairs, a driver union-find
      // closes them transitively, and a broadcast relabel finishes in one
      // narrow pass. Guarded by a pair cap — if the boundary exceeds it
      // (early rounds, or adversarially fragmented graphs at cluster
      // scale) the attempt is retried every 6 rounds while distributed
      // rounds keep shrinking it.
      if (changed > 0 && iter >= 3 &&
          (iter - lastEndgameTry >= 6 || changed * 8 < totalV) &&
          iter - lastEndgameTry >= 2) {
        lastEndgameTry = iter
        endgame(force = false)
      }
    }
    // Round budget exhausted with labels still moving (diameter > maxIter
    // and every capped attempt skipped — e.g. a huge grid/mesh whose
    // boundary stays over EndgamePairCap): force the endgame. Union-find
    // over the boundary label-pair graph is EDGE CONTRACTION, exact from
    // ANY intermediate labeling, so this converges correctly where the
    // pre-round-13 code returned partially-propagated labels as final
    // components (round-12 ADVICE, medium). The chunked toLocalIterator
    // collect bounds the driver to one partition batch at a time; the
    // warning records that an adversarial topology pushed past the cap.
    if (changed > 0) {
      System.err.println(s"[wccDelta] WARNING: unconverged after $maxIter " +
        "rounds; forcing union-find endgame past EndgamePairCap")
      endgame(force = true)
    }
    // decode: labels are idx REPRESENTATIVES; the output contract is the
    // component's min STRING id. Non-singleton components are few (the
    // giant + a handful), so their min strings fit a broadcast map and
    // the decode is one narrow state⋈rev pass — singletons (label == own
    // idx, not in the map) emit their own id. Falls back to the
    // distributed reduce+join shape if the component set is adversarially
    // large for the driver.
    val nontrivial = state.filter { case (v, (l, _)) => l != v }
      .map(_._2._1).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nLabels = nontrivial.count()
    // ONE pinned state⋈rev co-partitioned pass serves both the min-map
    // build and the output rows (round-12 ADVICE: the broadcast branch
    // ran the decode join twice, doubling the pass over |V|)
    val decoded = pin(state.join(c.rev, part)
      .map { case (_, ((lbl, _), id)) => (lbl, id) })
    val rows =
      if (nLabels <= EndgamePairCap) {
        val ntSet = new java.util.HashSet[java.lang.Long]()
        nontrivial.collect().foreach(l => ntSet.add(l))
        val bcSet = sc.broadcast(ntSet)
        val minMap = new java.util.HashMap[java.lang.Long, String]()
        decoded.mapPartitions(_.filter { case (l, _) => bcSet.value.contains(l) })
          .reduceByKey((a: String, b: String) => if (a <= b) a else b)
          .collect().foreach { case (l, s) => minMap.put(l, s) }
        val bcMin = sc.broadcast(minMap)
        decoded.map { case (l, id) =>
          val m = bcMin.value.get(l)
          Row(id, if (m != null) m else id)
        }
      } else {
        val minByLbl = decoded
          .reduceByKey(part, (a: String, b: String) => if (a <= b) a else b)
        decoded.join(minByLbl, part)
          .map { case (_, (id, minId)) => Row(id, minId) }
      }
    val out = toDf(g, rows, StructType(Seq(
      StructField("id", StringType), StructField("component", StringType))))
    val pinned = out.localCheckpoint(true) // realize before freeing the parts
    if (prev != null) prev.unpersist(false)
    state.unpersist(false); nontrivial.unpersist(false)
    decoded.unpersist(false)
    pinned
  }

  /** Small/medium graphs: GraphX Pregel CC (index-joined supersteps). */
  private def wccPregel(g: PropertyGraph, c: Ctx): DataFrame = {
    val graph = Graph.fromEdges(c.edges, (), StorageLevel.MEMORY_AND_DISK,
      StorageLevel.MEMORY_AND_DISK)
    val cc = graph.connectedComponents()
    val assigned = cc.vertices // (vertexIdx, componentRootIdx)
      .join(c.rev)
      .map { case (_, (rootIdx, id)) => (rootIdx, id) }
    // component label = min string id within the component
    val rootToMin = assigned.reduceByKey((a, b) => if (a <= b) a else b)
    val rows = assigned.join(rootToMin)
      .map { case (_, (id, minId)) => Row(id, minId) }
    toDf(g, rows, StructType(Seq(
      StructField("id", StringType), StructField("component", StringType))))
  }

  /** Per-node triangle counts over a long-keyed undirected pair-edge
    * DataFrame (`a`, `b`) — e.g. the part co-occurrence graph. GraphX
    * `triangleCount` on the canonicalized simple graph (reference
    * `apoc/community/community.go:324`). Returns (id, triangles).
    */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val edgeRdd = pairs.select(col("a").cast("long"), col("b").cast("long")).rdd
      .map { r =>
        val (x, y) = (r.getLong(0), r.getLong(1))
        Edge(math.min(x, y), math.max(x, y), ())
      }
      .distinct()
    val graph = Graph.fromEdges(edgeRdd, (), StorageLevel.MEMORY_AND_DISK,
        StorageLevel.MEMORY_AND_DISK)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
    val rows = graph.triangleCount().vertices.map { case (id, n) => Row(id, n.toLong) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType), StructField("triangles", LongType))))
  }

  /** Local clustering coefficient 2·tri / (k·(k−1)) per node of a pair
    * graph (`community.go:390`); k = distinct-neighbor degree.
    */
  def clusteringCoefficients(pairs: DataFrame): DataFrame = {
    val und = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val deg = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("k"))
    triangleCounts(pairs).join(deg, Seq("id"), "left")
      .select(col("id"),
        when(coalesce(col("k"), lit(0L)) < 2, lit(0.0))
          .otherwise(lit(2.0) * col("triangles") / (col("k") * (col("k") - 1)))
          .as("coefficient"))
  }

  /** Contracted-edge count above which SCC leaves GraphX
    * `stronglyConnectedComponents` for the trim+coloring RDD loop
    * ([[sccScale]]). GraphX SCC has the same unbounded superstep
    * residency profile as pre-fix WCC (round-11 sf1: 30.9× at 10× data)
    * and no internal checkpointing hook, so past this bound the
    * checkpoint-disciplined loop takes over. Same deployment knob shape
    * as [[pregelMaxEdges]].
    */
  private[graft] def sccMaxEdges(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.scc.graphxMaxEdges")
      .orElse(sys.env.get("GRAFT_SCC_GRAPHX_MAX_EDGES"))
      .map(_.toLong).getOrElse(PregelMaxEdgesDefault)

  /** Strongly connected components (Tarjan semantics, `community.go:517`).
    * Returns (id, component) with the component labeled by its minimum
    * string id, like [[wcc]]. Small/medium graphs run GraphX's iterative
    * SCC (index-join constant factors win); past [[sccMaxEdges]] the
    * bounded-residency [[sccScale]] loop serves.
    */
  def scc(g: PropertyGraph, relType: Option[String] = None,
      numIter: Int = 8): DataFrame = {
    val c = ctx(g, relType)
    // sccScale's trim covers every ctx-dict vertex (isolated nodes die in
    // round 1 as their own SCCs), so only the GraphX route needs the
    // singleton union
    if (c.edges.count() <= sccMaxEdges(g.nodes.sparkSession))
      withSingletons(g, relType, sccGraphX(g, c, numIter), "component")
    else sccScale(g, c)
  }

  private def sccGraphX(g: PropertyGraph, c: Ctx, numIter: Int): DataFrame = {
    val graph = Graph.fromEdges(c.edges, (), StorageLevel.MEMORY_AND_DISK,
      StorageLevel.MEMORY_AND_DISK)
    val comp = graph.stronglyConnectedComponents(numIter)
    val assigned = comp.vertices.join(c.rev)
      .map { case (_, (rootIdx, id)) => (rootIdx, id) }
    val rootToMin = assigned.reduceByKey((a, b) => if (a <= b) a else b)
    val rows = assigned.join(rootToMin).map { case (_, (id, minId)) => Row(id, minId) }
    toDf(g, rows, StructType(Seq(
      StructField("id", StringType), StructField("component", StringType))))
  }

  /** Scale SCC: trim + forward-coloring + backward sweep (the FW-BW/
    * coloring family — Orzan's coloring as in the distributed-SCC
    * literature), iterated as co-partitioned RDD joins with the same
    * residency discipline as [[labelPropagation]]: every superseded round
    * is unpersisted, resident state stays O(|V|+|E|) no matter how many
    * rounds run — the property GraphX SCC lacks (round-11 sf1 measured it
    * 30.9× at 10× data).
    *
    * Vertices iterate on the ctx's dense idx directly — idx mins serve
    * only as deterministic PIVOTS (color roots), never as the output
    * label, so no order-preserving rank dictionary is needed: the final
    * min-string-id label (same contract as [[sccGraphX]], spec-asserted
    * on the cycle fixture) is computed at decode by a combiner-safe
    * per-root string min.
    *
    *  - TRIM: a vertex with no in-edges or no out-edges inside the live
    *    subgraph is its own SCC; peeling to fixpoint resolves any DAG
    *    region (the TPC-H projection is a DAG, so the full q_algo_scc row
    *    never reaches coloring). Trim is DELTA-BASED degree peeling: the
    *    edge sets are pinned ONCE (both orientations, co-partitioned) and
    *    each round touches only the edges incident to the layer that just
    *    died — live in/out degree counters decrement by co-partitioned
    *    delta joins — so total trim edge work is O(|E|), not
    *    O(depth·|E|). The round-12 sf1 profile measured the previous
    *    rebuild-the-edge-set-per-round trim at 17.3× of sf0.1 (30.2 s);
    *    the per-round full-edge rebuild was the super-linear term.
    *  - COLOR: propagate min rank FORWARD to fixpoint; v's color = min
    *    rank that reaches v.
    *  - SWEEP: for each color root r (color(r)==r), walk BACKWARD inside
    *    color class r; everything reached is SCC(r) (reaches r AND is
    *    reached by r through min-color paths). Peel, repeat.
    *
    * Each outer round peels ≥1 SCC per color class, and trim collapses
    * the acyclic residue between rounds, so rounds ≤ SCC-DAG depth.
    */
  private[graft] def sccScale(g: PropertyGraph, c: Ctx,
      maxOuter: Int = 64): DataFrame = {
    val sc = c.edges.sparkContext
    // per-partition CSR adjacency in both orientations, built once per ctx
    // (self-loops dropped there — a self-loop never merges components and
    // every vertex is in its own SCC anyway). NO id translation: the loop
    // iterates on the ctx's dense idx directly (trim singletons label
    // themselves; sweep SCCs get their min-string label at decode), so
    // the one-time idxToRank/rankToId sort-builds stay off this path.
    val outCsr = c.csrByDir("out")
    val inCsr = c.csrByDir("in")
    val part = new org.apache.spark.HashPartitioner(outCsr.getNumPartitions)
    // lineage hygiene (see the [[LoopCkptEvery]] scaladoc): every pinned
    // round RDD truncates — the `done` buffer would otherwise retain
    // every trim/sweep round's upstream shuffles until the final union,
    // and the sweep loop's double back-reference to `inScc` (union +
    // subtractByKey) makes the un-truncated DAG walk super-linear in depth
    val nEdges = 2L * c.edges.count()
    val engaged = nEdges >= LoopCkptMinEdges
    def pin[T](r: RDD[T]): RDD[T] = {
      val p = r.persist(StorageLevel.MEMORY_AND_DISK)
      p.localCheckpoint()
      p.count(); p
    }
    val debug = sys.env.get("GRAFT_ALGO_DEBUG").exists(v => v == "1" || v == "true")
    val done = scala.collection.mutable.Buffer.empty[RDD[(Long, Long)]]
    // ---- delta trim to fixpoint (phase 1, O(|E|) total edge work) ----
    // live (out, in) degree per vertex via CSR lookups; a vertex leaves
    // the live set the round a counter hits 0, and only ITS incident
    // edges are re-counted (emitted from the CSR, reduced map-side)
    var deg: RDD[(Long, (Long, Long))] =
      pin(c.rev.partitionBy(part).zipPartitions(outCsr, inCsr,
        preservesPartitioning = true) { (vit, oit, iit) =>
          val o = if (oit.hasNext) oit.next() else null
          val in = if (iit.hasNext) iit.next() else null
          vit.map { case (v, _) =>
            (v, ((if (o != null) o.degree(v) else 0).toLong,
              (if (in != null) in.degree(v) else 0).toLong))
          }
      })
    var trimRound = 0
    var trimming = true
    while (trimming) {
      trimRound += 1
      val t0 = System.nanoTime()
      val dead = pin(deg.filter { case (_, (o, i)) => o == 0L || i == 0L }
        .mapValues(_ => ()))
      if (dead.isEmpty()) { dead.unpersist(false); trimming = false }
      else {
        done += pin(dead.map { case (v, _) => (v, v) })
        // dOut: dead-src edges (u→v) decrement IN(v); dIn: dead-dst edges
        // (u→v, v dead) decrement OUT(u). Emitted via CSR lookup — cost ∝
        // the dying layer's incident edges; combiners absorb hubs.
        val dOut = outCsr.zipPartitions(dead, preservesPartitioning = false) {
          (cit, dit) =>
            if (cit.hasNext) { val adj = cit.next(); dit.flatMap { case (u, _) => adj.emit(u, 1L) } }
            else Iterator.empty
        }.reduceByKey(part, _ + _)
        val dIn = inCsr.zipPartitions(dead, preservesPartitioning = false) {
          (cit, dit) =>
            if (cit.hasNext) { val adj = cit.next(); dit.flatMap { case (v, _) => adj.emit(v, 1L) } }
            else Iterator.empty
        }.reduceByKey(part, _ + _)
        val next = pin(deg.zipPartitions(dead, dOut, dIn,
          preservesPartitioning = true) { (dit, deadIt, oIt, iIt) =>
            val deadSet = new java.util.HashSet[java.lang.Long]()
            deadIt.foreach { case (v, _) => deadSet.add(v) }
            val inDec = new java.util.HashMap[java.lang.Long, java.lang.Long]()
            oIt.foreach { case (v, n) =>
              val cur = inDec.get(v)
              inDec.put(v, if (cur == null) n else cur.longValue() + n)
            }
            val outDec = new java.util.HashMap[java.lang.Long, java.lang.Long]()
            iIt.foreach { case (v, n) =>
              val cur = outDec.get(v)
              outDec.put(v, if (cur == null) n else cur.longValue() + n)
            }
            dit.collect {
              case (v, (o, i)) if !deadSet.contains(v) =>
                val oD = outDec.get(v)
                val iD = inDec.get(v)
                (v, (o - (if (oD != null) oD.longValue() else 0L),
                  i - (if (iD != null) iD.longValue() else 0L)))
            }
        })
        if (debug) System.err.println(
          f"[sccTrim] round $trimRound ${(System.nanoTime() - t0) / 1e9}%.1f s")
        loopGc(trimRound, nEdges)
        dead.unpersist(false); deg.unpersist(false)
        deg = next
      }
    }
    // ---- cyclic core (phase 2): the bounded color+sweep loop ----
    // materialize the surviving subgraph once (sized by the live core's
    // edges, emitted from the CSR); each outer round below works on this
    // (small) core, re-trimming through the cheap `alive` check
    val liveKeys = deg.mapValues(_ => ())
    var edges = pin(outCsr.zipPartitions(liveKeys,
      preservesPartitioning = false) { (cit, lit) =>
        if (cit.hasNext) { val adj = cit.next(); lit.flatMap { case (u, _) => adj.emit(u, u) } }
        else Iterator.empty
      } // (dst, liveSrc) for every live-src edge
      .join(liveKeys, part) // keep only live dst
      .map { case (v, (u, _)) => (u, v) }
      .partitionBy(part))
    var remaining = pin(liveKeys.partitionBy(part))
    var outer = 0
    while (outer < maxOuter && !remaining.isEmpty()) {
      outer += 1
      // ---- re-trim the (small) core to fixpoint ----
      var coreTrim = true
      while (coreTrim && !remaining.isEmpty()) {
        // distinct BEFORE the join: raw keys/values repeat once per edge,
        // and joining multisets would square per-vertex degree
        val alive = pin(edges.keys.distinct().map((_, ()))
          .join(edges.values.distinct().map((_, ())), part)
          .mapValues(_ => ()))
        val trimmed = remaining.subtractByKey(alive, part)
        if (trimmed.isEmpty()) { alive.unpersist(false); coreTrim = false }
        else {
          done += pin(trimmed.map { case (v, _) => (v, v) })
          val nextRem = pin(remaining.join(alive, part).mapValues(_ => ()))
          val nextEdges = pin(edges.join(nextRem, part)
            .map { case (u, (v, _)) => (v, u) }
            .join(nextRem, part).map { case (v, (u, _)) => (u, v) }
            .partitionBy(part))
          alive.unpersist(false); remaining.unpersist(false); edges.unpersist(false)
          remaining = nextRem; edges = nextEdges
        }
      }
      if (!remaining.isEmpty()) {
        // ---- forward min-color propagation to fixpoint ----
        var colors = pin(remaining.map { case (v, _) => (v, v) }.partitionBy(part))
        var changed = 1L
        var colorRound = 0
        while (changed > 0) {
          colorRound += 1
          val acc = sc.longAccumulator
          val msgs = edges.join(colors, part)
            .map { case (_, (dst, cl)) => (dst, cl) }
            .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
          val next = pin(colors.leftOuterJoin(msgs, part).mapValues {
            case (cur, m) =>
              val nw = math.min(cur, m.getOrElse(cur))
              if (nw != cur) acc.add(1)
              nw
          })
          changed = acc.value
          loopGc(colorRound, nEdges)
          colors.unpersist(false); colors = next
        }
        // ---- backward sweep from color roots within their class ----
        // edges tagged by color on both ends, kept only same-class; keyed
        // by DST so the backward frontier join is a single co-partitioned
        // join per level
        val classEdges = pin(edges.join(colors, part)
          .map { case (u, (v, cu)) => (v, (u, cu)) }
          .join(colors, part)
          .flatMap { case (v, ((u, cu), cv)) =>
            if (cu == cv) Some((v, (u, cu))) else None }
          .partitionBy(part))
        var frontier = pin(colors.filter { case (v, cl) => v == cl })
        var inScc = frontier
        var sweeping = !frontier.isEmpty()
        var sweepRound = 0
        while (sweeping) {
          sweepRound += 1
          val next = pin(classEdges.join(frontier, part)
            .flatMap { case (_, ((u, cu), r)) => if (cu == r) Some((u, r)) else None }
            .distinct()
            .subtractByKey(inScc, part))
          loopGc(sweepRound, nEdges)
          if (next.isEmpty()) { next.unpersist(false); sweeping = false }
          else {
            val merged = pin(inScc.union(next).partitionBy(part))
            if (frontier ne inScc) frontier.unpersist(false)
            inScc.unpersist(false)
            inScc = merged; frontier = next
          }
        }
        done += inScc
        val nextRem = pin(remaining.subtractByKey(inScc, part))
        val nextEdges = pin(edges.join(nextRem, part)
          .map { case (u, (v, _)) => (v, u) }
          .join(nextRem, part).map { case (v, (u, _)) => (u, v) }
          .partitionBy(part))
        classEdges.unpersist(false); colors.unpersist(false)
        remaining.unpersist(false); edges.unpersist(false)
        remaining = nextRem; edges = nextEdges
        if (engaged) System.gc() // reap the outer round's dead shuffles
      }
    }
    // residue past maxOuter (adversarial depth only): own-id singletons —
    // same bounded-iteration semantics as GraphX SCC's numIter cutoff
    val all = (done.toSeq :+ remaining.map { case (v, _) => (v, v) })
      .reduce(_ union _)
    // decode (memberIdx, rootIdx) → (id, min string id of the SCC): one
    // uniform idx-keyed join for the member strings, then a combiner-safe
    // min per root (trim singletons have root == self, so these keys are
    // unique; only a giant sweep SCC concentrates a root key)
    val memberId = all.join(c.rev, part)
      .map { case (_, (r, idV)) => (r, idV) }
    val minByRoot = memberId
      .reduceByKey(part, (a: String, b: String) => if (a <= b) a else b)
    val rows = memberId.join(minByRoot, part)
      .map { case (_, (idV, minId)) => Row(idV, minId) }
    val out = toDf(g, rows, StructType(Seq(
      StructField("id", StringType), StructField("component", StringType))))
    val pinned = out.localCheckpoint(true) // realize before freeing the parts
    done.foreach(_.unpersist(false))
    remaining.unpersist(false); edges.unpersist(false); deg.unpersist(false)
    pinned
  }

  /** Static PageRank (same update rule as [[Algorithms.pageRank]]:
    * r ← 0.15 + 0.85·Σ r(src)·mult/outdeg, where outdeg counts parallel
    * edges) as aggregateMessages rounds on the contracted graph.
    * Returns (id, r).
    */
  def pageRank(g: PropertyGraph, iters: Int,
      relType: Option[String] = None): DataFrame = {
    val c = ctx(g, relType)
    val base = Graph.fromEdges(c.edges.map(e => Edge(e.srcId, e.dstId, e.attr._1)), 0.0,
      StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    val outW = base.aggregateMessages[Double](t => t.sendToSrc(t.attr), _ + _)
    var graph = base.outerJoinVertices(outW) { (_, _, ow) => (1.0, ow.getOrElse(0.0)) }
    // per-round vertex pinning, same residency discipline as [[wcc]]:
    // without it every aggregateMessages recomputes the full join chain
    // back to the base (O(iters²) work), and Pregel-style MEMORY_ONLY
    // accumulation is what degraded under memory pressure at sf1
    graph.vertices.persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val msgs = graph.aggregateMessages[Double](
        t => if (t.srcAttr._2 > 0) t.sendToDst(t.srcAttr._1 * t.attr / t.srcAttr._2),
        _ + _)
      val next = graph.outerJoinVertices(msgs) { case (_, (_, ow), m) =>
        (0.15 + 0.85 * m.getOrElse(0.0), ow)
      }
      next.vertices.persist(StorageLevel.MEMORY_AND_DISK)
      next.vertices.count()
      graph.vertices.unpersist(false)
      graph = next
    }
    val rows = graph.vertices.join(c.rev).map { case (_, ((r, _), id)) => Row(id, r) }
    toDf(g, rows, StructType(Seq(
      StructField("id", StringType), StructField("r", DoubleType))))
  }

  /** Label propagation with EXACTLY the [[Algorithms.labelPropagation]]
    * semantics (parallel-edge contraction, weight-sum votes, argmax by
    * (weight, label) with the same tie-break), but iterated as in-memory
    * RDD joins over the cached dictionary — no per-round Catalyst planning.
    * Returns (id, label).
    */
  def labelPropagation(g: PropertyGraph, iters: Int,
      relType: Option[String] = None, weighted: Boolean = false): DataFrame = {
    val c = ctx(g, relType)
    // undirected contraction: both orientations of every directed pair,
    // votes = weight-sum or multiplicity (matches the DataFrame und build)
    val csr = c.voteCsr(weighted)
    val debug = sys.env.get("GRAFT_ALGO_DEBUG").exists(v => v == "1" || v == "true")

    // Round structure (round-13 rework — the sf3 probe measured the old
    // adjByB.join(labels) + two reduceByKeys at 35.7×/34.6× of sf0.1):
    //  (1) labels are co-partitioned with the pinned CSR adjacency, so
    //      the vote pass is a zipPartitions — no per-round cogroup
    //      re-materialization of the adjacency, no shuffle of edge data;
    //  (2) votes are tallied into a per-partition (dst, label) → weight
    //      map BEFORE the shuffle, so the one shuffle per round carries
    //      per-partition-distinct aggregates, not one record per edge —
    //      and its volume COLLAPSES as labels converge;
    //  (3) the receiver merges partial tallies per dst and takes the
    //      argmax by (weight, label) — labels are order-preserving Long
    //      RANKS of the string ids (c.idxToRank), so the Long tie-break
    //      agrees with the String tie-break exactly;
    //  (4) the label update is a zipPartitions against the (small) tally,
    //      not a cogroup over the full label set.
    val part = new org.apache.spark.HashPartitioner(
      math.max(1, csr.getNumPartitions))
    // lineage-hygiene gate: both orientations of the contracted edge set
    // (edges is pinned, so the count is a cached-RDD count)
    val nVoteEdges = 2L * c.edges.count()
    val init = c.idxToRank.partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK) // initial label = own rank
    var labels: RDD[(Long, Long)] = init
    for (round <- 1 to iters) {
      val t0 = System.nanoTime()
      val votes: RDD[(Long, (Long, Double))] =
        csr.zipPartitions(labels, preservesPartitioning = false) { (cit, lit) =>
          if (!cit.hasNext) Iterator.empty
          else {
            val adj = cit.next()
            // tally in bounded chunks: early rounds (all labels distinct)
            // hold ~one boxed (dst,label)→weight entry PER EDGE, well over
            // 100 bytes each — unchunked, a 4M-edge partition's map can
            // reach several hundred MB per concurrent task (round-13
            // ADVICE). Flushing at TallyFlushEntries keeps per-task heap
            // bounded; the downstream combineByKey merges partial tallies,
            // so chunked emission is exact. A chunk can overshoot by the
            // max degree of its last source vertex — fine, the cap is a
            // heap bound, not a contract.
            import scala.jdk.CollectionConverters._
            val flushCap = TallyFlushEntries // hoisted off the hot loop
            def chunks(): Iterator[(Long, (Long, Double))] = {
              if (!lit.hasNext) Iterator.empty
              else {
                val acc = new java.util.HashMap[(Long, Long), Array[Double]]()
                while (lit.hasNext && acc.size < flushCap) {
                  val (b, lb) = lit.next()
                  val i = adj.indexOf(b)
                  if (i >= 0) {
                    var j = adj.offs(i); val end = adj.offs(i + 1)
                    while (j < end) {
                      val k = (adj.nbrs(j), lb)
                      val cur = acc.get(k)
                      if (cur == null) acc.put(k, Array(adj.wts(j)))
                      else cur(0) += adj.wts(j)
                      j += 1
                    }
                  }
                }
                acc.entrySet().iterator().asScala
                  .map(e => (e.getKey._1, (e.getKey._2, e.getValue()(0)))) ++
                  chunks() // lazy RHS: next chunk builds only when reached
              }
            }
            chunks()
          }
        }
      // single label-keyed shuffle: merge the partial (label → weight)
      // tallies per dst, then argmax. mapSideCombine=false — the
      // zipPartitions pass above IS the map-side combine, over primitive
      // CSR arrays instead of the shuffle writer's boxed machinery.
      type LMap = java.util.HashMap[java.lang.Long, java.lang.Double]
      val tally: RDD[(Long, Long)] = votes.combineByKeyWithClassTag[LMap](
        (v: (Long, Double)) => { val m = new LMap; m.put(v._1, v._2); m },
        (m: LMap, v: (Long, Double)) => {
          val c0 = m.get(v._1)
          m.put(v._1, if (c0 == null) v._2 else c0 + v._2); m
        },
        (m1: LMap, m2: LMap) => {
          val (big, sm) = if (m1.size >= m2.size) (m1, m2) else (m2, m1)
          val it = sm.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next(); val c0 = big.get(e.getKey)
            big.put(e.getKey,
              if (c0 == null) e.getValue else c0 + e.getValue)
          }
          big
        },
        part, mapSideCombine = false
      ).mapValues { m =>
        // same argmax as max(struct(w, nl)): weight first, then label
        var bw = Double.NegativeInfinity; var bl = Long.MinValue
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val w = e.getValue.doubleValue(); val l = e.getKey.longValue()
          if (w > bw || (w == bw && l > bl)) { bw = w; bl = l }
        }
        bl
      }
      val next = labels.zipPartitions(tally, preservesPartitioning = true) {
        (lit, tit) =>
          val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
          tit.foreach { case (v, lb) => m.put(v, lb) }
          lit.map { case (v, old) =>
            val nw = m.get(v)
            (v, if (nw != null) nw.longValue() else old)
          }
      }.persist(StorageLevel.MEMORY_AND_DISK)
      next.localCheckpoint() // lineage hygiene: see [[LoopCkptEvery]]
      next.count()
      loopGc(round, nVoteEdges)
      if (debug) System.err.println(
        f"[lpa] round $round: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (labels ne init) labels.unpersist()
      labels = next
    }
    val rows = labels
      .map { case (idx, rank) => (rank, idx) }
      .join(c.rankToId) // decode label rank → label string id
      .map { case (_, (idx, lbId)) => (idx, lbId) }
      .join(c.rev)
      .map { case (_, (lb, id)) => Row(id, lb) }
    val out = toDf(g, rows, StructType(Seq(
      StructField("id", StringType), StructField("label", StringType))))
    // the caller consumes a DataFrame; free the iteration lineage once the
    // rows RDD is realized through it (init stays only if iters == 0)
    if (labels ne init) init.unpersist()
    out
  }

  /** Louvain-style communities (GraphX LPA weighted-majority local moves) +
    * modularity of the final partition — same contract as
    * [[Algorithms.louvain]].
    */
  def louvain(g: PropertyGraph, iters: Int,
      relType: Option[String] = None): (DataFrame, DataFrame) = {
    // cached: modularity joins the communities twice (src + dst side)
    val communities = labelPropagation(g, iters, relType, weighted = true)
      .localCheckpoint(true)
    (communities, Algorithms.modularity(g, communities, relType))
  }
}
