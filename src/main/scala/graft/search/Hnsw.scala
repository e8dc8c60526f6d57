package graft.search

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Batch HNSW ANN tier (SURVEY §2.11; reference
  * `/root/reference/pkg/search/hnsw_index.go:35-50` — M=16,
  * efConstruction=200, efSearch=100, cosine distance).
  *
  * The reference's HNSW is a single-node in-memory structure; the Spark
  * shape is PARTITION-LOCAL build + global merge probe: each partition
  * builds an independent HNSW over its vectors (embarrassingly parallel, no
  * shuffle), a probe searches every partition's graph with efSearch and the
  * per-partition top-k are merged by a tiny global sort. At 100 TB the
  * adjacency ([[hnswIndex]]) is persisted partitioned and probes fan out to
  * partition-local searches — query cost is partitions × efSearch, not a
  * full scan; recall stays high because each sub-graph is exact-HNSW over
  * its shard (asserted ≥ 0.95 vs brute force in SearchPipelineSpec through
  * the [[Eval]] harness).
  */
object Hnsw {

  /** In-memory single-partition HNSW graph over normalized float vectors.
    * Insertion-order deterministic; levels seeded by vector id.
    */
  final class Graph(m: Int, efConstruction: Int) extends Serializable {
    private val mL = 1.0 / math.log(m.toDouble)
    private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    private val ids = mutable.ArrayBuffer.empty[Long]
    // links(level)(node) = neighbor node indices
    private val links = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]]
    private var entry: Int = -1
    private var topLevel: Int = -1
    private val nodeLevel = mutable.ArrayBuffer.empty[Int]

    def size: Int = vecs.length

    private def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    // vectors are normalized → cosine distance = 1 − dot
    private def dist(a: Array[Float], b: Array[Float]): Double = 1.0 - dot(a, b)

    private def randomLevel(id: Long): Int = {
      val u = new java.util.Random(id * 2654435761L + 42L).nextDouble()
      math.min((-math.log(math.max(u, 1e-12)) * mL).toInt, 31)
    }

    private def ensureLevel(l: Int): Unit =
      while (links.length <= l) {
        val layer = mutable.ArrayBuffer.fill(vecs.length)(null: mutable.ArrayBuffer[Int])
        links += layer
      }

    /** Best-first search of one layer; returns up to `ef` closest (dist, node). */
    private def searchLayer(q: Array[Float], start: Int, ef: Int, level: Int): mutable.PriorityQueue[(Double, Int)] = {
      val visited = mutable.BitSet(start)
      // candidates: closest-first; results: farthest-first (bounded by ef)
      val cand = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(-_._1))
      val res = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(_._1))
      val d0 = dist(q, vecs(start))
      cand.enqueue((d0, start)); res.enqueue((d0, start))
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (dc > res.head._1 && res.size >= ef) { cand.clear() }
        else {
          val nbrs = links(level)(c)
          if (nbrs != null) nbrs.foreach { n =>
            if (!visited(n)) {
              visited += n
              val dn = dist(q, vecs(n))
              if (res.size < ef || dn < res.head._1) {
                cand.enqueue((dn, n)); res.enqueue((dn, n))
                if (res.size > ef) res.dequeue()
              }
            }
          }
        }
      }
      res
    }

    private def greedyDescend(q: Array[Float], from: Int, fromLevel: Int, toLevel: Int): Int = {
      var curr = from
      var level = fromLevel
      while (level > toLevel) {
        var improved = true
        while (improved) {
          improved = false
          val nbrs = links(level)(curr)
          if (nbrs != null) {
            var best = dist(q, vecs(curr))
            nbrs.foreach { n =>
              val dn = dist(q, vecs(n))
              if (dn < best) { best = dn; curr = n; improved = true }
            }
          }
        }
        level -= 1
      }
      curr
    }

    def insert(id: Long, vec: Array[Float]): Unit = {
      val idx = vecs.length
      vecs += vec; ids += id
      val lvl = randomLevel(id)
      nodeLevel += lvl
      ensureLevel(math.max(lvl, math.max(topLevel, 0)))
      links.foreach(layer => while (layer.length <= idx) layer += null)
      (0 to lvl).foreach(l => links(l)(idx) = mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = idx; topLevel = lvl; return }

      var curr = greedyDescend(vec, entry, topLevel, math.min(lvl, topLevel) + 0)
      // for layers ≤ lvl: connect to the M closest of an efC search
      var level = math.min(lvl, topLevel)
      while (level >= 0) {
        val found = searchLayer(vec, curr, efConstruction, level).toSeq.sortBy(_._1)
        val maxM = if (level == 0) 2 * m else m
        val selected = found.take(m).map(_._2)
        selected.foreach { n =>
          links(level)(idx) += n
          val ln = links(level)(n)
          ln += idx
          if (ln.length > maxM) {
            // prune to the maxM closest neighbors of n
            val pruned = ln.map(x => (dist(vecs(n), vecs(x)), x)).sortBy(_._1)
              .take(maxM).map(_._2)
            links(level)(n) = mutable.ArrayBuffer.from(pruned)
          }
        }
        if (found.nonEmpty) curr = found.head._2
        level -= 1
      }
      if (lvl > topLevel) { topLevel = lvl; entry = idx }
    }

    /** Top-k ids by cosine similarity (efSearch-bounded layer-0 sweep). */
    def search(q: Array[Float], k: Int, efSearch: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Seq.empty
      val start = greedyDescend(q, entry, topLevel, 0)
      searchLayer(q, start, math.max(efSearch, k), 0).toSeq
        .sortBy(_._1).take(k)
        .map { case (d, n) => (ids(n), 1.0 - d) } // back to cosine similarity
    }

    /** (id, level, neighbor-ids) rows — the serializable adjacency. */
    def adjacency: Iterator[(Long, Int, Seq[Long])] =
      links.indices.iterator.flatMap { l =>
        links(l).indices.iterator
          .filter(i => links(l)(i) != null)
          .map(i => (ids(i), l, links(l)(i).toSeq.map(ids(_))))
      }
  }

  private[search] def normalize(v: Seq[Float]): Array[Float] = {
    val a = v.toArray
    var n = 0.0; var i = 0
    while (i < a.length) { n += a(i).toDouble * a(i).toDouble; i += 1 }
    val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
    a.map(x => (x * inv).toFloat)
  }

  private def buildPartition(rows: Iterator[Row], m: Int, efC: Int): Graph = {
    val g = new Graph(m, efC)
    rows.foreach(r => g.insert(r.getLong(0), normalize(r.getSeq[Float](1))))
    g
  }

  /** BUILT per-partition graphs, persisted and keyed by
    * (embedding plan, m, efC) — the index is ingest-time state (the
    * reference benchmarks search against a loaded HNSW,
    * hnsw_index.go:35), so probes must not pay the build: the first
    * caller constructs each partition's graph once, every later probe —
    * same query or a different one — reuses the resident structures.
    * At scale this is the in-memory face of the persisted [[hnswIndex]]
    * adjacency.
    */
  private val indexCache = scala.collection.concurrent.TrieMap
    .empty[(Int, Int, Int), org.apache.spark.rdd.RDD[Graph]]

  private def builtIndex(emb: DataFrame, m: Int, efC: Int)
      : org.apache.spark.rdd.RDD[Graph] = {
    val key = (emb.queryExecution.analyzed.canonicalized.hashCode, m, efC)
    indexCache.getOrElseUpdate(key, {
      val rdd = emb.select(col("vec_id"), col("embedding")).rdd
        .mapPartitions(rows => Iterator.single(buildPartition(rows, m, efC)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      rdd
    })
  }

  /** Serialized adjacency of every partition-local graph:
    * (partition, vec_id, level, neighbors). At scale this is the persisted
    * index, written partitioned-by partition id.
    */
  def hnswIndex(emb: DataFrame, m: Int = 16, efC: Int = 200): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id"), col("embedding"))
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        buildPartition(rows, m, efC).adjacency
          .map { case (id, l, nbrs) => (pid, id, l, nbrs) }
      }
      .toDF("partition", "vec_id", "level", "neighbors")
  }

  /** Batched multi-query probe: build each partition graph ONCE, search it
    * for every query (the eval-harness path — queries broadcast by closure,
    * one graph build per partition regardless of query count). Returns
    * (query_id, vec_id, cos_sim), k rows per (partition, query).
    */
  def searchPartitions(emb: DataFrame, queries: Seq[(Long, Array[Float])],
      k: Int, m: Int = 16, efC: Int = 200, efS: Int = 100): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    builtIndex(emb, m, efC)
      .flatMap { g =>
        queries.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k + 1, efS).map { case (id, cos) => (qid, id, cos) }
        }
      }
      .toDF("query_id", "vec_id", "cos_sim")
  }

  /** ANN top-k: each partition searches its local graph (efS-bounded), the
    * per-partition top-k merge on the driver-side LIMIT — k·partitions rows,
    * not the corpus. Rides the shared built index (the graph contains the
    * query vector; searching k+1 and dropping self matches the
    * build-without-self result).
    */
  def hnswTopK(emb: DataFrame, queryId: Long, k: Int, m: Int = 16,
      efC: Int = 200, efS: Int = 100): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = normalize(emb.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0))
    builtIndex(emb, m, efC)
      .flatMap(_.search(q, k + 1, efS))
      .toDF("vec_id", "cos_sim")
      .filter(col("vec_id") =!= queryId)
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }
}
