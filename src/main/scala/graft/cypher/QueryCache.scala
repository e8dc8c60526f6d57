package graft.cypher

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import graft.graph.GraphStore

/** Label-aware result cache — the reference's `SmartQueryCache`
  * (`/root/reference/pkg/cypher/cache.go:476-530`): cached results are
  * tagged with the node labels the query depends on, so a write to :User
  * invalidates only :User-touching entries while :Product queries stay
  * cached. LRU-bounded, TTL-checked on read, FNV-keyed on (query, params).
  *
  * Under Spark this sits ABOVE the engine (results are materialized rows;
  * plans themselves are already cached by Catalyst/the graph cache) — the
  * value is skipping recomputation on repeated dashboard-style reads, same
  * as the reference. Labels are extracted from the parsed AST (every node
  * pattern + HasLabel predicate); a query with no label anywhere depends
  * on the wildcard and is invalidated by every write.
  */
final class QueryCache(maxSize: Int = 1000, ttlMillis: Long = 5 * 60 * 1000,
    maxRowsPerEntry: Int = 10000) {

  private final case class Entry(rows: Array[Row], schema: org.apache.spark.sql.types.StructType,
      labels: Set[String], storedAtMs: Long, version: Long)

  private val entries = mutable.LinkedHashMap.empty[String, Entry] // LRU: insertion order
  private val labelIndex = mutable.Map.empty[String, mutable.Set[String]]
  val hits = new AtomicLong(0)
  val misses = new AtomicLong(0)
  val smartInvalidations = new AtomicLong(0)

  /** FNV-1a over query + rendered params (cache.go `cacheKeyFNV`). */
  private def key(query: String, params: Map[String, Any]): String = {
    val s = query + "|" + params.toSeq.sortBy(_._1).mkString(",")
    var h = 0xcbf29ce484222325L
    s.foreach { c => h ^= c; h *= 0x100000001b3L }
    java.lang.Long.toHexString(h)
  }

  /** Node labels the query depends on (cache.go `PutWithLabels` labels). */
  private[graft] def labelsOf(query: String): Set[String] = {
    import Ast._
    val found = mutable.Set.empty[String]
    def fromPath(p: PatternPath): Unit =
      (p.first +: p.hops.map(_._2)).foreach { n =>
        found ++= n.label; found ++= n.extraLabels
      }
    def fromExpr(e: Expr): Unit = e match {
      case HasLabel(_, l) => found += l
      case ExistsPattern(p, w) => fromPath(p); w.foreach(fromExpr)
      case CountPattern(p, w) => fromPath(p); w.foreach(fromExpr)
      case CollectSubquery(inner) => fromQuery(inner)
      case Bin(_, l, r) => fromExpr(l); fromExpr(r)
      case Not(x) => fromExpr(x)
      case IsNull(x, _) => fromExpr(x)
      case FnCall(_, args, _) => args.foreach(fromExpr)
      case CaseExpr(s, ws, d) =>
        s.foreach(fromExpr); ws.foreach { case (a, b) => fromExpr(a); fromExpr(b) }
        d.foreach(fromExpr)
      case ListLit(items) => items.foreach(fromExpr)
      case Index(l, i) => fromExpr(l); fromExpr(i)
      case _ => ()
    }
    def fromQuery(q: SingleQuery): Unit = q.clauses.foreach {
      case MatchClause(paths, _, where, _) =>
        paths.foreach(fromPath); where.foreach(fromExpr)
      case WithClause(items, _, where, _, _, _) =>
        items.foreach(i => fromExpr(i.expr)); where.foreach(fromExpr)
      case ReturnClause(items, _, _, _, _) => items.foreach(i => fromExpr(i.expr))
      case UnwindClause(e, _) => fromExpr(e)
      case CallSubquery(inner, _) => fromQuery(inner)
      case _ => ()
    }
    Parser.parse(query).parts.foreach(fromQuery)
    // no label anywhere (e.g. MATCH (n) RETURN n): wildcard dependency
    if (found.isEmpty) Set("*") else found.toSet
  }

  /** Cached run: returns the cached rows as a local DataFrame on hit;
    * executes, materializes, and stores on miss.
    */
  def run(store: GraphStore, query: String,
      params: Map[String, Any] = Map.empty): DataFrame = synchronized {
    val k = key(query, params)
    val spark = store.snapshot.nodes.sparkSession
    entries.get(k) match {
      case Some(e) if System.currentTimeMillis() - e.storedAtMs <= ttlMillis =>
        hits.incrementAndGet()
        // LRU touch: re-insert at the tail
        entries.remove(k); entries(k) = e
        spark.createDataFrame(
          spark.sparkContext.parallelize(e.rows.toSeq, 1), e.schema)
      case other =>
        other.foreach(_ => removeKey(k)) // expired
        misses.incrementAndGet()
        val df = Cypher.run(store.snapshot, query, params)
        // maxSize caps ENTRIES; this caps ROWS PER ENTRY. The reference's
        // cache holds protocol-sized result sets — a full-table read must
        // not land on the driver just because it was cacheable. The probe
        // is one short-circuited limit; past the cap the distributed frame
        // is returned uncached.
        val probe = df.limit(maxRowsPerEntry + 1).collect()
        if (probe.length > maxRowsPerEntry) df
        else {
          val labels = labelsOf(query)
          if (entries.size >= maxSize) entries.headOption.foreach(h => removeKey(h._1))
          entries(k) = Entry(probe, df.schema, labels, System.currentTimeMillis(),
            store.version)
          labels.foreach(l => labelIndex.getOrElseUpdate(l, mutable.Set.empty) += k)
          spark.createDataFrame(spark.sparkContext.parallelize(probe.toSeq, 1), df.schema)
        }
    }
  }

  /** Invalidate entries depending on any of `labels` (cache.go
    * `InvalidateLabels`): wildcard entries always go; a write with no
    * known label set clears everything.
    */
  def invalidateLabels(labels: Seq[String]): Unit = synchronized {
    val victims =
      if (labels.isEmpty) entries.keys.toSeq
      else (labels :+ "*").flatMap(l => labelIndex.getOrElse(l, Set.empty)).distinct
    victims.foreach(removeKey)
    smartInvalidations.incrementAndGet()
  }

  def size: Int = synchronized(entries.size)

  private def removeKey(k: String): Unit = {
    entries.remove(k)
    labelIndex.values.foreach(_ -= k)
  }
}
