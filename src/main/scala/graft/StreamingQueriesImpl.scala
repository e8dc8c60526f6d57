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

    // cyclic access-pattern detection (pattern_detector.go:200-321): the
    // oracle replays the daily/weekly concentration formulas and burst
    // window with identical double arithmetic. Trend (Kalman velocity) is
    // cross-checked in FunctionStreamingSpec instead — its 2-state fold has
    // no compact SQL replay.
    "q_temporal_patterns" -> GQuery(
      (s, d) => graft.streaming.TemporalPatterns.detect(Tables.events(s, d)),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
              nw AS (SELECT MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS now_s FROM e),
              agg AS (
                SELECT user_id AS entity, COUNT(*) AS total,
                       SUM(CASE WHEN floor(epoch(ts)) > (SELECT now_s FROM nw) - 60.0
                                THEN 1 ELSE 0 END) AS in_window
                FROM e GROUP BY user_id),
              hh AS (SELECT user_id AS entity, hour(ts) AS h, COUNT(*) AS c
                     FROM e GROUP BY 1, 2),
              hmax AS (SELECT entity, h AS peak_hour, c AS max_h FROM (
                         SELECT entity, h, c,
                                ROW_NUMBER() OVER (PARTITION BY entity
                                  ORDER BY c DESC, h ASC) AS rn FROM hh)
                       WHERE rn = 1),
              dd AS (SELECT user_id AS entity, dayofweek(ts) AS d, COUNT(*) AS c
                     FROM e GROUP BY 1, 2),
              dmax AS (SELECT entity, d AS peak_day, c AS max_d FROM (
                         SELECT entity, d, c,
                                ROW_NUMBER() OVER (PARTITION BY entity
                                  ORDER BY c DESC, d ASC) AS rn FROM dd)
                       WHERE rn = 1),
              base AS (
                SELECT a.entity, a.total, a.in_window,
                       hm.peak_hour, hm.max_h, dm.peak_day, dm.max_d,
                       GREATEST(LEAST((hm.max_h / (a.total / 24.0) - 1.0) / 3.0, 1.0), 0.0) AS daily_conf,
                       GREATEST(LEAST((dm.max_d / (a.total / 7.0) - 1.0) / 2.0, 1.0), 0.0) AS weekly_conf,
                       LEAST(a.in_window / 60.0 / 10.0, 1.0) AS burst_conf
                FROM agg a JOIN hmax hm ON hm.entity = a.entity
                           JOIN dmax dm ON dm.entity = a.entity
                WHERE a.total >= 10)
              SELECT entity, 'daily' AS pattern, daily_conf AS confidence,
                     CAST(peak_hour AS INT) AS peak_hour, CAST(-1 AS INT) AS peak_day,
                     86400.0 AS period
              FROM base WHERE daily_conf >= 0.3
              UNION ALL
              SELECT entity, 'weekly', weekly_conf, CAST(-1 AS INT),
                     CAST(peak_day AS INT), 604800.0
              FROM base WHERE weekly_conf >= 0.4
              UNION ALL
              SELECT entity, 'burst', burst_conf, CAST(-1 AS INT), CAST(-1 AS INT), 60.0
              FROM base WHERE in_window >= 5"""), "2.12"),

    // STREAMING pattern detector: per-entity histograms in GroupState,
    // updated per access like the reference's RecordAccess — daily/weekly
    // identical to the batch detector; burst anchored per-entity (the
    // oracle replays that anchor with a per-user MAX)
    "q_stream_temporal" -> GQuery(
      (s, d) => graft.streaming.TemporalPatterns.detectStreaming(s, d,
        s"tmp_pat_${System.nanoTime}"),
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                                CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
                         FROM events),
              agg AS (
                SELECT user_id AS entity, COUNT(*) AS total, MAX(sec) AS now_s
                FROM e GROUP BY user_id),
              win AS (
                SELECT e.user_id AS entity, COUNT(*) AS in_window
                FROM e JOIN agg ON agg.entity = e.user_id
                WHERE e.sec > agg.now_s - 60 GROUP BY 1),
              hh AS (SELECT user_id AS entity, hour(ts) AS h, COUNT(*) AS c
                     FROM e GROUP BY 1, 2),
              hmax AS (SELECT entity, h AS peak_hour, c AS max_h FROM (
                         SELECT entity, h, c,
                                ROW_NUMBER() OVER (PARTITION BY entity
                                  ORDER BY c DESC, h ASC) AS rn FROM hh)
                       WHERE rn = 1),
              dd AS (SELECT user_id AS entity, dayofweek(ts) AS d, COUNT(*) AS c
                     FROM e GROUP BY 1, 2),
              dmax AS (SELECT entity, d AS peak_day, c AS max_d FROM (
                         SELECT entity, d, c,
                                ROW_NUMBER() OVER (PARTITION BY entity
                                  ORDER BY c DESC, d ASC) AS rn FROM dd)
                       WHERE rn = 1),
              base AS (
                SELECT a.entity, a.total, w.in_window,
                       hm.peak_hour, hm.max_h, dm.peak_day, dm.max_d,
                       GREATEST(LEAST((hm.max_h / (a.total / 24.0) - 1.0) / 3.0, 1.0), 0.0) AS daily_conf,
                       GREATEST(LEAST((dm.max_d / (a.total / 7.0) - 1.0) / 2.0, 1.0), 0.0) AS weekly_conf,
                       LEAST(w.in_window / 60.0 / 10.0, 1.0) AS burst_conf
                FROM agg a JOIN hmax hm ON hm.entity = a.entity
                           JOIN dmax dm ON dm.entity = a.entity
                           JOIN win w ON w.entity = a.entity
                WHERE a.total >= 10)
              SELECT entity, 'daily' AS pattern, daily_conf AS confidence,
                     CAST(peak_hour AS INT) AS peak_hour, CAST(-1 AS INT) AS peak_day,
                     86400.0 AS period
              FROM base WHERE daily_conf >= 0.3
              UNION ALL
              SELECT entity, 'weekly', weekly_conf, CAST(-1 AS INT),
                     CAST(peak_day AS INT), 604800.0
              FROM base WHERE weekly_conf >= 0.4
              UNION ALL
              SELECT entity, 'burst', burst_conf, CAST(-1 AS INT), CAST(-1 AS INT), 60.0
              FROM base WHERE in_window >= 5"""), "2.12"),

    // online vector-index maintenance: a readStream of embeddings upserted
    // batch-by-batch into the store's named node embeddings (foreachBatch
    // = the Delta-MERGE shape at 100 TB), then exact top-k over the final
    // index state — the oracle replays the same cosine over the source
    "q_stream_vector_upsert" -> GQuery(
      (s, d) => {
        val store = new graft.graph.GraphStore(GraphQueries.graph(s, d))
        graft.streaming.VectorIngest.streamingUpsert(s, d, store, "stream_emb")
        val emb = store.nodeEmbeddings.filter(col("name") === "stream_emb")
          .select(col("entity_id").as("id"), col("embedding"))
        val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0L)
          .select("embedding").head.getSeq[Float](0).map(_.toDouble)
        graft.search.VectorSearch.topKExactLit(emb, "id", "embedding", qv, 10)
      },
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
              comp AS (
                SELECT e.vec_id,
                  CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot,
                  CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na2,
                  CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nb2
                FROM embeddings e CROSS JOIN q CROSS JOIN generate_series(1, 64) t(i)
                GROUP BY e.vec_id)
              SELECT 'Vec:' || vec_id AS node, round(dot / (sqrt(na2) * sqrt(nb2)), 12) AS score
              FROM comp ORDER BY score DESC, node LIMIT 10"""),
      "2.12"),

    // arbitrary per-key streaming state: the Kalman fold carried in
    // GroupState across micro-batches — hash-matches the BATCH oracle
    "q_stream_kalman_state" -> GQuery(
      (s, d) => EventStreams.streamingKalman(s, d,
        s"kalman_state_${StreamingQueriesImpl.runCounter.incrementAndGet()}"),
      Some(FunctionQueriesImpl.kalmanOracleSql), "2.12"),

    // streaming exact dedup: stateful dropDuplicates on the rolling-hash
    // fingerprint across micro-batches — the ingest-side twin of
    // q_dedup_exact; counts replayed against the batch corpus
    "q_stream_dedup" -> GQuery(
      (s, d) => graft.streaming.StreamDedup.dedupStats(s, d,
        s"stream_dedup_${StreamingQueriesImpl.runCounter.incrementAndGet()}"),
      Some("""WITH f AS (SELECT
                list_reduce(
                  list_transform(string_split(lower(text), ' '),
                    w -> CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) % 2147483647),
                  (acc, h) -> (acc * 31 + h) % 2147483647) AS fp
              FROM documents)
              SELECT (SELECT COUNT(*) FROM f) AS n_docs,
                     (SELECT COUNT(DISTINCT fp) FROM f) AS n_unique,
                     (SELECT COUNT(*) FROM f) - (SELECT COUNT(DISTINCT fp) FROM f)
                       AS n_dupes"""), "2.12"),

    // streaming MinHash-LSH NEAR-dup: band state accumulated across
    // micro-batches, candidates from the band equi-join, verified by
    // signature agreement (>= 8/16 components ~ estimated Jaccard >= 0.5);
    // order-independent (larger doc_id flags), so the batch oracle replays
    // the exact counts
    "q_stream_dedup_minhash" -> GQuery(
      (s, d) => graft.streaming.StreamDedup.nearDupStats(s, d),
      Some("""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
              sh AS (
                SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(ws) >= 3 THEN
                    list_transform(generate_series(1, len(ws) - 2),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                  ELSE [] END)) AS shingle
                FROM d),
              mh AS (
                SELECT doc_id, s,
                       MIN(substring(md5(CAST(s // 4 AS VARCHAR) || '_' || shingle),
                                     (s % 4) * 8 + 1, 8)) AS mn
                FROM sh CROSS JOIN generate_series(0, 15) t(s)
                GROUP BY doc_id, s),
              sig AS (SELECT doc_id, list(mn ORDER BY s) AS sg FROM mh GROUP BY doc_id),
              bands AS (
                SELECT doc_id, b,
                       sg[b*4+1] || '_' || sg[b*4+2] || '_' || sg[b*4+3] || '_' || sg[b*4+4] AS bsig
                FROM sig CROSS JOIN generate_series(0, 3) t(b)),
              cand AS (
                SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                FROM bands x JOIN bands y
                  ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
              dup AS (
                SELECT DISTINCT c.b
                FROM cand c
                  JOIN sig sa ON sa.doc_id = c.a
                  JOIN sig sb ON sb.doc_id = c.b
                WHERE len(list_filter(generate_series(1, 16),
                          i -> sa.sg[i] = sb.sg[i])) >= 8)
              SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                     (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM dup) AS n_unique,
                     (SELECT COUNT(*) FROM dup) AS n_dupes"""), "2.12"),

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
