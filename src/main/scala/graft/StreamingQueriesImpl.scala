package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphStore, PropertyGraph}
import graft.streaming.EventStreams

/** Streaming/temporal surface (§2.12) + mutation surface (§2.8). Window
  * logic is batch/streaming-identical (same `window`/`session_window`
  * expressions); oracles emulate the window algebra with `time_bucket` and
  * lag-based sessionization in DuckDB.
  */
object StreamingQueriesImpl {

  import OracleSafe._

  /** memory-sink query names must be fresh per run */
  val runCounter = new java.util.concurrent.atomic.AtomicLong(0)

  val queries: Map[String, GQuery] = Map(
    "q_stream_tumbling" -> GQuery(
      (s, d) => EventStreams.tumbling(Tables.events(s, d)),
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS wstart,
                      event_type, COUNT(*) AS n, ${sqlSum("value")} AS total
               FROM events GROUP BY 1, 2"""), "2.12"),

    "q_stream_sliding" -> GQuery(
      (s, d) => EventStreams.sliding(Tables.events(s, d)),
      Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type FROM events),
              w AS (
                SELECT time_bucket(INTERVAL '30 minutes', t) AS halfslot, event_type FROM e),
              -- a 1h window sliding by 30min covers each 30-min half-slot twice:
              -- windows starting at halfslot and halfslot - 30min
              expanded AS (
                SELECT halfslot AS wstart, event_type FROM w
                UNION ALL
                SELECT halfslot - INTERVAL '30 minutes', event_type FROM w)
              SELECT wstart, event_type, COUNT(*) AS n
              FROM expanded GROUP BY 1, 2"""), "2.12"),

    "q_stream_session" -> GQuery(
      (s, d) => EventStreams.sessions(Tables.events(s, d)),
      Some(s"""WITH e AS (
                 SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value,
                        CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                                  >= INTERVAL '30 minutes'
                             OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                             THEN 1 ELSE 0 END AS is_start
                 FROM events),
               sess AS (
                 SELECT user_id, t, value,
                        SUM(is_start) OVER (PARTITION BY user_id ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS sid
                 FROM e)
               SELECT user_id, MIN(t) AS session_start,
                      MAX(t) + INTERVAL '30 minutes' AS session_end,
                      COUNT(*) AS n_events, ${sqlSum("value")} AS total
               FROM sess GROUP BY user_id, sid"""), "2.12"),

    "q_stream_coaccess" -> GQuery(
      (s, d) => EventStreams.coAccessPairs(Tables.events(s, d)),
      Some("""WITH b AS (SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
                                event_type FROM events)
              SELECT x.event_type AS ta, y.event_type AS tb, COUNT(*) AS n_buckets
              FROM b x JOIN b y ON x.bucket = y.bucket AND x.event_type < y.event_type
              GROUP BY 1, 2"""), "2.12"),

    // arbitrary per-key streaming state: the Kalman fold carried in
    // GroupState across micro-batches — hash-matches the BATCH oracle
    "q_stream_kalman_state" -> GQuery(
      (s, d) => EventStreams.streamingKalman(s, d,
        s"kalman_state_${StreamingQueriesImpl.runCounter.incrementAndGet()}"),
      Some(FunctionQueriesImpl.kalmanOracleSql), "2.12"),

    "q_mutation_merge" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        val store = new GraphStore(g)
        val before = store.snapshot.nodes.count()
        // candidate Customer nodes with ids 1..2000: some exist, some are new
        val candidates = s.range(1, 2001)
          .select(concat(lit("Customer:"), col("id")).as("id"),
            array(lit("Customer")).as("labels"),
            col("id").as("key"),
            concat(lit("merged-"), col("id")).as("name"),
            lit(0.0).as("acctbal"), lit(null).cast("string").as("mktsegment"),
            expr("map()").cast("map<string,string>").as("properties"))
          .select("id", "labels", "key", "name", "acctbal", "mktsegment", "properties")
        val stats = store.mergeNodes(candidates.selectExpr(
          "id", "labels", "key", "name", "acctbal", "mktsegment", "properties"))
        val after = store.snapshot.nodes.count()
        import s.implicits._
        Seq((before, stats.nodesCreated, after)).toDF("nodes_before", "created", "nodes_after")
      },
      Some("""WITH t AS (SELECT
                 (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM orders)
               + (SELECT COUNT(*) FROM part) + (SELECT COUNT(*) FROM supplier)
               + (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region) AS nodes_before,
                 2000 - (SELECT COUNT(*) FROM customer
                         WHERE c_custkey BETWEEN 1 AND 2000) AS created)
              SELECT nodes_before, created, nodes_before + created AS nodes_after FROM t"""),
      "2.8"),

    "q_mutation_detach_delete" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        val store = new GraphStore(g)
        val victims = store.snapshot.nodes
          .filter(array_contains(col("labels"), "Customer") && col("key") <= 100)
          .select("id")
        val stats = store.deleteNodes(victims, detach = true)
        val remaining = store.snapshot.nodes.count()
        import s.implicits._
        Seq((stats.nodesDeleted, stats.relationshipsDeleted, remaining))
          .toDF("nodes_deleted", "edges_deleted", "nodes_after")
      },
      Some("""WITH t AS (SELECT
                 (SELECT COUNT(*) FROM customer WHERE c_custkey <= 100) AS nodes_deleted,
                 (SELECT COUNT(*) FROM orders WHERE o_custkey <= 100)
                   + (SELECT COUNT(*) FROM customer WHERE c_custkey <= 100) AS edges_deleted,
                 (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM orders)
                   + (SELECT COUNT(*) FROM part) + (SELECT COUNT(*) FROM supplier)
                   + (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region)
                   - (SELECT COUNT(*) FROM customer WHERE c_custkey <= 100) AS nodes_after)
              SELECT nodes_deleted, edges_deleted, nodes_after FROM t"""),
      "2.8"))
}
