package graft.cypher

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Per-database query guardrails — the reference's limit enforcement
  * (`/root/reference/pkg/multidb/enforcement.go:381-495` +
  * `pkg/cypher/executor.go:561-591`): max concurrent queries, query/write
  * rate limits (token bucket, 1-second refill), and a statement timeout.
  *
  * One implementation, called from every server loop's execute path.
  * With no limits installed for a database the guard is a straight
  * pass-through (zero overhead — bench queries never pay for it). Error
  * messages mirror the reference's shapes so server loops surface the
  * same refusals (`ErrQueryLimitExceeded` / `ErrRateLimitExceeded`).
  *
  * The statement timeout cancels the statement's Spark job group
  * (`interruptOnCancel`) — the distributed analog of the reference's
  * `context.WithTimeout`: executors stop working, not just the caller.
  */
object QueryGuard {

  /** 0 = unlimited for every knob (enforcement.go `IsUnlimited`). */
  final case class Limits(
      maxConcurrentQueries: Int = 0,
      maxQueriesPerSecond: Int = 0,
      maxWritesPerSecond: Int = 0,
      maxQueryTimeMs: Long = 0)

  final class LimitExceeded(msg: String) extends RuntimeException(msg)

  /** Token bucket: starts full, refills `rate` tokens/second, capped at
    * `rate` (enforcement.go:462-495).
    */
  private final class Bucket(rate: Int) {
    private var tokens = rate
    private var last = System.nanoTime()
    def allow(): Boolean = synchronized {
      val now = System.nanoTime()
      val add = ((now - last) / 1e9 * rate).toInt
      if (add > 0) { tokens = math.min(tokens + add, rate); last = now }
      if (tokens > 0) { tokens -= 1; true } else false
    }
  }

  private val registry = TrieMap.empty[String, Limits]
  private val active = TrieMap.empty[String, AtomicInteger]
  private val queryBuckets = TrieMap.empty[String, Bucket]
  private val writeBuckets = TrieMap.empty[String, Bucket]
  private val timer = new java.util.Timer("query-guard", true)

  def install(db: String, limits: Limits): Unit = {
    registry(db) = limits
    queryBuckets.remove(db)
    writeBuckets.remove(db)
  }
  def uninstall(db: String): Unit = {
    registry.remove(db); queryBuckets.remove(db); writeBuckets.remove(db)
  }

  /** Admission + timeout around one statement's plan-and-materialize.
    * No limits installed for `db` → `body` runs untouched.
    */
  def guarded[T](db: String, isWrite: Boolean = false)(body: => T): T = {
    val l = registry.getOrElse(db, null)
    if (l == null) return body
    if (l.maxQueriesPerSecond > 0 &&
        !queryBuckets.getOrElseUpdate(db, new Bucket(l.maxQueriesPerSecond)).allow())
      throw new LimitExceeded(s"rate limit exceeded: database '$db' " +
        s"exceeded max_queries_per_second (${l.maxQueriesPerSecond})")
    if (isWrite && l.maxWritesPerSecond > 0 &&
        !writeBuckets.getOrElseUpdate(db, new Bucket(l.maxWritesPerSecond)).allow())
      throw new LimitExceeded(s"rate limit exceeded: database '$db' " +
        s"exceeded max_writes_per_second (${l.maxWritesPerSecond})")
    val counter = active.getOrElseUpdate(db, new AtomicInteger)
    if (l.maxConcurrentQueries > 0) {
      val now = counter.incrementAndGet()
      if (now > l.maxConcurrentQueries) {
        counter.decrementAndGet()
        throw new LimitExceeded(s"query limit exceeded: database '$db' " +
          s"has reached max_concurrent_queries limit " +
          s"(${now - 1}/${l.maxConcurrentQueries})")
      }
    }
    try {
      if (l.maxQueryTimeMs > 0) withTimeout(db, l.maxQueryTimeMs)(body)
      else body
    } finally {
      if (l.maxConcurrentQueries > 0) counter.decrementAndGet()
    }
  }

  private def withTimeout[T](db: String, ms: Long)(body: => T): T = {
    val spark = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    val group = s"guard-$db-${java.util.UUID.randomUUID()}"
    val fired = new AtomicBoolean(false)
    spark.foreach(_.sparkContext.setJobGroup(group,
      s"guarded statement ($db)", interruptOnCancel = true))
    val task = new java.util.TimerTask {
      def run(): Unit = {
        fired.set(true)
        spark.foreach(_.sparkContext.cancelJobGroup(group))
      }
    }
    timer.schedule(task, ms)
    def timeout = new LimitExceeded(
      s"query timeout: database '$db' exceeded max_query_time (${ms}ms)")
    try {
      val r = body
      if (fired.get) throw timeout
      r
    } catch {
      case _: Exception if fired.get => throw timeout
    } finally {
      task.cancel()
      spark.foreach(_.sparkContext.clearJobGroup())
    }
  }
}
