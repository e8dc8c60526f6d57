package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, TextAnalysis}

/** LLM-training-data pipeline surface (builder brief): dedup family,
  * text analysis, multimodal plumbing — each over `documents`/`embeddings`.
  */
/** Shared DuckDB CTE: similarity pairs over embeddings `vec_id < 200` at
  * threshold 0.25 — the edge set both inference rows build on.
  */
object InferPairsSql {
  val pairs200: String =
    """e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
      comp AS (
        SELECT p1.vec_id AS a, p2.vec_id AS b,
          CAST(SUM(CAST(CAST(p1.embedding[i] AS DOUBLE) * CAST(p2.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot,
          CAST(SUM(CAST(CAST(p1.embedding[i] AS DOUBLE) * CAST(p1.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na2,
          CAST(SUM(CAST(CAST(p2.embedding[i] AS DOUBLE) * CAST(p2.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nb2
        FROM e p1 JOIN e p2 ON p1.vec_id < p2.vec_id
        CROSS JOIN generate_series(1, 64) t(i)
        GROUP BY p1.vec_id, p2.vec_id),
      pairs AS (
        SELECT a, b, round(dot / (sqrt(na2) * sqrt(nb2)), 12) AS conf
        FROM comp WHERE round(dot / (sqrt(na2) * sqrt(nb2)), 12) >= 0.25)"""
}

object PipelineQueries {

  /** DuckDB replay of one [[graft.operators.ChunkImpls.chunkText]] step's
    * boundary scan for a source yielding (doc_id, text, L, ci, s):
    * e0 = min(s+size, L); when the window is not final, prefer the LAST
    * paragraph / sentence / word break past size/2 (embed_queue.go:870-884).
    * lastIndexOf(c, pat) = len(c) − strpos(reverse(c), reverse(pat)) −
    * len(pat) + 1, or −1 when absent.
    */
  private def chunkBoundary(src: String, size: Int, overlap: Int): String = {
    val mid = size / 2
    s"""SELECT doc_id, L, ci, s,
          CASE WHEN e0 >= L THEN e0
               WHEN ip > $mid THEN s + ip
               WHEN isx > $mid THEN s + isx + 1
               WHEN iw > $mid THEN s + iw
               ELSE e0 END AS e
        FROM (
          SELECT doc_id, L, ci, s, e0,
            CASE WHEN rp_p = 0 THEN -1 ELSE cl - rp_p - 1 END AS ip,
            CASE WHEN rp_s = 0 THEN -1 ELSE cl - rp_s - 1 END AS isx,
            CASE WHEN rp_w = 0 THEN -1 ELSE cl - rp_w END AS iw
          FROM (
            SELECT doc_id, L, ci, s, e0, length(c) AS cl,
              strpos(reverse(c), reverse(chr(10) || chr(10))) AS rp_p,
              strpos(reverse(c), reverse('. ')) AS rp_s,
              strpos(reverse(c), ' ') AS rp_w
            FROM (
              SELECT doc_id, L, ci, s,
                least(s + $size, L) AS e0, substr(text, s + 1, $size) AS c
              FROM ($src) src0) l1) l2) l3"""
  }

  /** Full recursive-CTE replay of the chunk table: base window at s=0,
    * then advance by (e − overlap) while the Go loop would continue —
    * including its tail-overlap re-emit for multi-window texts; texts of
    * one window never recurse (the early return at embed_queue.go:857).
    */
  private def chunkCte(size: Int, overlap: Int): String =
    s"""WITH RECURSIVE ch(doc_id, L, ci, s, e) AS (
          SELECT doc_id, L, ci, s, e FROM (
            ${chunkBoundary(
              s"SELECT doc_id, text, length(text) AS L, 0 AS ci, 0 AS s FROM documents",
              size, overlap)}) base
          UNION ALL
          SELECT doc_id, L, ci, s, e FROM (
            ${chunkBoundary(
              s"""SELECT d.doc_id, d.text, ch.L, ch.ci + 1 AS ci,
                    CASE WHEN ch.e - $overlap <= ch.s THEN ch.e
                         ELSE ch.e - $overlap END AS s
                  FROM ch JOIN documents d USING (doc_id)
                  WHERE ch.L > $size
                    AND (CASE WHEN ch.e - $overlap <= ch.s THEN ch.e
                              ELSE ch.e - $overlap END) < ch.L""",
              size, overlap)}) step
        )"""

  /** FNV-1a 64 fold over a token column `t` (the minhash/fastrp replay
    * technique: UBIGINT xor-multiply mod 2^64 per character).
    */
  private val fnvFold =
    """list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
         list_transform(string_split(t, ''), c -> CAST(ord(c) AS UBIGINT))),
         (h, c) -> CAST(CAST(xor(h, c) AS HUGEINT) * 1099511628211
           % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT))"""

  /** Shared CTE chain: chunk table (recursive CTE) → per-chunk TextEmbed
    * projection — ends at `ce(chunk_id, doc_id, emb)`; oracles append
    * their own tails.
    */
  private def chunkEmbCte(size: Int, overlap: Int, dim: Int): String =
    s"""${chunkCte(size, overlap)},
        chunks AS (
          SELECT ch.doc_id,
                 CAST(ch.doc_id AS VARCHAR) || '-chunk-' || ch.ci AS chunk_id,
                 substr(d.text, ch.s + 1, ch.e - ch.s) AS chunk
          FROM ch JOIN documents d USING (doc_id)),
        ctoks AS (
          SELECT chunk_id, doc_id, unnest(string_split(lower(chunk), ' ')) AS t
          FROM chunks),
        chv AS (SELECT chunk_id, doc_id, $fnvFold AS u FROM ctoks WHERE t <> ''),
        csum AS (
          SELECT chunk_id, doc_id,
            ((CAST(CASE WHEN u >= 9223372036854775808
                THEN CAST(CAST(u AS HUGEINT) - 18446744073709551616 AS BIGINT)
                ELSE CAST(u AS BIGINT) END AS BIGINT) % $dim) + $dim) % $dim AS b,
            SUM(CASE WHEN u % 2 = 0 THEN CAST(1.0 AS DOUBLE)
                     ELSE CAST(-1.0 AS DOUBLE) END) AS x
          FROM chv GROUP BY 1, 2, 3),
        dims AS (SELECT unnest(generate_series(0, ${dim - 1})) AS dd),
        raw AS (
          SELECT g.chunk_id, g.doc_id, g.dd,
                 COALESCE(su.x, CAST(0.0 AS DOUBLE)) AS x
          FROM (SELECT c.chunk_id, c.doc_id, dims.dd
                FROM chunks c CROSS JOIN dims) g
          LEFT JOIN csum su ON su.chunk_id = g.chunk_id AND su.b = g.dd),
        vl AS (SELECT chunk_id, doc_id, list(x ORDER BY dd) AS v
               FROM raw GROUP BY 1, 2),
        nr AS (SELECT chunk_id, doc_id, v,
                 sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(v, x -> x * x)), (a, b) -> a + b)) AS n
               FROM vl),
        ce AS (SELECT chunk_id, doc_id,
                 CASE WHEN n > 0 THEN list_transform(v, x -> x / n)
                      ELSE v END AS emb FROM nr)"""

  /** Replay of [[graft.operators.Chunker.searchChunks]]: the shared chain
    * → DECIMAL dot vs the query projection → best chunk per doc (max by
    * (score, chunk_id)) → top-k.
    */
  private def chunkSearchOracle(query: String, k: Int, size: Int,
      overlap: Int, dim: Int): String =
    s"""${chunkEmbCte(size, overlap, dim)},
        qtoks AS (SELECT unnest(string_split(lower('$query'), ' ')) AS t),
        qhv AS (SELECT $fnvFold AS u FROM qtoks WHERE t <> ''),
        qsum AS (
          SELECT ((CAST(CASE WHEN u >= 9223372036854775808
                THEN CAST(CAST(u AS HUGEINT) - 18446744073709551616 AS BIGINT)
                ELSE CAST(u AS BIGINT) END AS BIGINT) % $dim) + $dim) % $dim AS b,
            SUM(CASE WHEN u % 2 = 0 THEN CAST(1.0 AS DOUBLE)
                     ELSE CAST(-1.0 AS DOUBLE) END) AS x
          FROM qhv GROUP BY 1),
        qraw AS (SELECT dims.dd, COALESCE(q.x, CAST(0.0 AS DOUBLE)) AS x
                 FROM dims LEFT JOIN qsum q ON q.b = dims.dd),
        qvl AS (SELECT list(x ORDER BY dd) AS v FROM qraw),
        qnr AS (SELECT v, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(v, x -> x * x)), (a, b) -> a + b)) AS n FROM qvl),
        q AS (SELECT CASE WHEN n > 0 THEN list_transform(v, x -> x / n)
                     ELSE v END AS qe FROM qnr),
        score AS (
          SELECT ce.chunk_id, ce.doc_id,
            round(CAST(SUM(CAST(ce.emb[i] * q.qe[i] AS DECIMAL(38,18))) AS DOUBLE), 12) AS score
          FROM ce CROSS JOIN q CROSS JOIN generate_series(1, $dim) t(i)
          GROUP BY 1, 2),
        best AS (
          SELECT doc_id, chunk_id, score,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, chunk_id DESC) AS rn
          FROM score)
        SELECT doc_id, chunk_id, score FROM best WHERE rn = 1
        ORDER BY score DESC, doc_id LIMIT $k"""

  val queries: Map[String, GQuery] = Map(
    // document chunking (embed_queue.go:856; defaults 512/50 scaled to the
    // synthetic corpus): fixed windows snapped to the last paragraph/
    // sentence/word break past the midpoint, (end − overlap) stepping,
    // chunk ids '<id>-chunk-<i>' like the granular index (search.go:690)
    "q_text_chunks" -> GQuery(
      (s, d) => graft.operators.Chunker.chunkDocs(
        Tables.documents(s, d), "text", "doc_id", 128, 16),
      Some(s"""${chunkCte(128, 16)}
               SELECT ch.doc_id, ch.ci AS chunk_idx,
                      CAST(ch.doc_id AS VARCHAR) || '-chunk-' || ch.ci AS chunk_id,
                      substr(d.text, ch.s + 1, ch.e - ch.s) AS chunk
               FROM ch JOIN documents d USING (doc_id)"""), "pipeline"),

    // chunk-level search with node-level grouping (search.go:687): every
    // chunk embedded with the disclosed TextEmbed projection, scored
    // against the query text's projection, best chunk per doc, top-k.
    // The oracle replays chunking (recursive CTE) + per-chunk projection
    // (FNV fold per token) + DECIMAL dot + max-per-doc in one SQL query.
    "q_text_chunk_search" -> GQuery(
      (s, d) => graft.operators.Chunker.searchChunks(
        Tables.documents(s, d), "fast table scan merge", 10, 128, 16),
      Some(chunkSearchOracle("fast table scan merge", 10, 128, 16, 64)), "pipeline"),

    // the reference's background embed worker (embed_queue.go:509-535) as
    // a REAL Structured Streaming run: documents stream → exact chunker →
    // TextEmbed projection → foreachBatch upsert of '<id>-chunk-<i>'
    // named embeddings into a fresh store. The oracle replays the whole
    // pipeline (recursive chunk CTE + per-chunk projection) and the
    // embeddings compare as %.6f strings (arrays are pandas-unhashable)
    "q_stream_embed_queue" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        val store = new graft.graph.GraphStore(
          graft.graph.PropertyGraph(g.nodes.filter("false"), g.edges.filter("false")),
          registerGlobal = false)
        graft.streaming.EmbedQueue.streamingChunkEmbed(s, d, store, 128, 16)
        store.nodeEmbeddings.select(col("entity_id"), col("name"),
          array_join(transform(col("embedding"),
            x => format_string("%.6f", x)), ";").as("emb_str"))
      },
      Some(s"""${chunkEmbCte(128, 16, 64)}
               SELECT chunk_id AS entity_id, 'content' AS name,
                      array_to_string(list_transform(emb, x -> printf('%.6f', x)), ';') AS emb_str
               FROM ce"""), "pipeline"),

    "q_dedup_exact" -> GQuery(
      (s, d) => Dedup.exactGroups(Tables.documents(s, d)),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n FROM documents
              GROUP BY text HAVING COUNT(*) > 1"""), "pipeline"),

    "q_dedup_ngram_jaccard" -> GQuery(
      (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), 3, 0.5, 300L),
      Some("""WITH words AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                             FROM documents WHERE doc_id < 300),
              sh AS (SELECT doc_id, unnest(list_distinct(
                       [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        FOR i IN generate_series(1, len(w)-2)])) AS shingle
                     FROM words),
              sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              inter AS (SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS inter
                        FROM sh s1 JOIN sh s2
                          ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
                        GROUP BY 1, 2)
              SELECT a, b,
                     CAST(inter AS DOUBLE) / (sza.sz + szb.sz - inter) AS jac
              FROM inter JOIN sz sza ON inter.a = sza.doc_id
                         JOIN sz szb ON inter.b = szb.doc_id
              WHERE CAST(inter AS DOUBLE) / (sza.sz + szb.sz - inter) >= 0.5"""),
      "pipeline"),

    // hash-based signatures (Spark murmur3) are not reproducible in DuckDB —
    // rows-only check here; recall vs exact Jaccard asserted in ScalaTest
    // md5-seeded minhash → the DuckDB oracle replays the ENTIRE LSH
    // pipeline (signatures, banding, candidate join, exact-Jaccard verify)
    // bit-exactly — not just the final pair set
    "q_dedup_minhash_lsh" -> GQuery(
      (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), 3, 16, 4, 0.5),
      Some("""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
              sh AS (
                SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(ws) >= 3 THEN
                    list_transform(generate_series(1, len(ws) - 2),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                  ELSE [] END)) AS shingle
                FROM d),
              szs AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
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
              inter AS (
                SELECT c.a, c.b, COUNT(*) AS i
                FROM cand c
                  JOIN sh sa ON sa.doc_id = c.a
                  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
                GROUP BY c.a, c.b)
              SELECT i2.a, i2.b, CAST(i2.i AS DOUBLE) / (za.sz + zb.sz - i2.i) AS jac
              FROM inter i2
                JOIN szs za ON za.doc_id = i2.a
                JOIN szs zb ON zb.doc_id = i2.b
              WHERE CAST(i2.i AS DOUBLE) / (za.sz + zb.sz - i2.i) >= 0.5"""),
      "pipeline"),

    // cluster resolution over the (oracle-replayable) ngram-Jaccard pairs:
    // the DuckDB oracle recomputes the pairs AND the connected components
    // (recursive transitive-closure CTE) and the keep-first canonical
    "q_dedup_clusters" -> GQuery(
      (s, d) => Dedup.dedupClusters(
        Dedup.ngramJaccardPairs(Tables.documents(s, d), 3, 0.5, 300L)),
      Some("""WITH RECURSIVE
              words AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                        FROM documents WHERE doc_id < 300),
              sh AS (SELECT doc_id, unnest(list_distinct(
                       [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        FOR i IN generate_series(1, len(w)-2)])) AS shingle
                     FROM words),
              sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              inter AS (SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS inter
                        FROM sh s1 JOIN sh s2
                          ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
                        GROUP BY 1, 2),
              p AS (SELECT a, b FROM inter
                      JOIN sz sza ON inter.a = sza.doc_id
                      JOIN sz szb ON inter.b = szb.doc_id
                    WHERE CAST(inter AS DOUBLE) / (sza.sz + szb.sz - inter) >= 0.5),
              e AS (SELECT a AS x, b AS y FROM p UNION ALL SELECT b, a FROM p),
              cc(doc_id, lbl) AS (
                SELECT DISTINCT x AS doc_id, x AS lbl FROM e
                UNION
                SELECT e.x, cc.lbl FROM cc JOIN e ON e.y = cc.doc_id)
              SELECT doc_id, MIN(lbl) AS cluster_id,
                     doc_id = MIN(lbl) AS canonical
              FROM cc GROUP BY doc_id"""),
      "pipeline"),

    // fast signature tier (codegen'd FNV-1a 64, seeded '<j>_' prefix):
    // the oracle replays the byte fold in HUGEINT mod 2^64 (the
    // apoc.hashing technique), the banding, and the exact-Jaccard verify
    "q_dedup_minhash_fast" -> GQuery(
      (s, d) => Dedup.minhashLshPairsFast(Tables.documents(s, d), 3, 16, 4, 0.5),
      Some("""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
              sh AS (
                SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(ws) >= 3 THEN
                    list_transform(generate_series(1, len(ws) - 2),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                  ELSE [] END)) AS shingle
                FROM d),
              szs AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
              hv AS (
                SELECT doc_id, s,
                  list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
                    list_transform(string_split(CAST(s AS VARCHAR) || '_' || shingle, ''),
                      c -> CAST(ord(c) AS UBIGINT))),
                    (h, c) -> CAST(CAST(xor(h, c) AS HUGEINT) * 1099511628211
                      % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT)) AS u
                FROM sh CROSS JOIN generate_series(0, 15) t(s)),
              mh AS (
                SELECT doc_id, s,
                  MIN(CASE WHEN u >= 9223372036854775808
                       THEN CAST(CAST(u AS HUGEINT) - 18446744073709551616 AS BIGINT)
                       ELSE CAST(u AS BIGINT) END) AS mn
                FROM hv GROUP BY doc_id, s),
              sig AS (SELECT doc_id, list(mn ORDER BY s) AS sg FROM mh GROUP BY doc_id),
              bands AS (
                SELECT doc_id, b,
                       CAST(sg[b*4+1] AS VARCHAR) || '_' || CAST(sg[b*4+2] AS VARCHAR)
                         || '_' || CAST(sg[b*4+3] AS VARCHAR) || '_' || CAST(sg[b*4+4] AS VARCHAR) AS bsig
                FROM sig CROSS JOIN generate_series(0, 3) t(b)),
              cand AS (
                SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                FROM bands x JOIN bands y
                  ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
              inter AS (
                SELECT c.a, c.b, COUNT(*) AS i
                FROM cand c
                  JOIN sh sa ON sa.doc_id = c.a
                  JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
                GROUP BY c.a, c.b)
              SELECT i2.a, i2.b, CAST(i2.i AS DOUBLE) / (za.sz + zb.sz - i2.i) AS jac
              FROM inter i2
                JOIN szs za ON za.doc_id = i2.a
                JOIN szs zb ON zb.doc_id = i2.b
              WHERE CAST(i2.i AS DOUBLE) / (za.sz + zb.sz - i2.i) >= 0.5"""),
      "pipeline"),

    // md5-based word hash → signatures are engine-independent; the oracle
    // recomputes simhash from scratch and takes the EXACT Hamming join —
    // legitimate because the 4-window bucketing is lossless for dist ≤ 3
    // (pigeonhole), which the oracle equality therefore also proves
    "q_dedup_simhash" -> GQuery(
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d), 3, 1000L),
      Some("""WITH words AS (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                FROM documents WHERE doc_id < 1000),
              wh AS (SELECT doc_id,
                       CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) AS h
                     FROM words),
              bits AS (
                SELECT doc_id, i,
                       SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM wh CROSS JOIN generate_series(0, 31) t(i)
                GROUP BY doc_id, i),
              sig AS (
                SELECT doc_id,
                       SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS sh
                FROM bits GROUP BY doc_id),
              b AS (SELECT doc_id, sh FROM sig)
              SELECT x.doc_id AS a, y.doc_id AS b,
                     CAST(bit_count(xor(x.sh, y.sh)) AS INT) AS dist
              FROM b x JOIN b y ON x.doc_id < y.doc_id
              WHERE bit_count(xor(x.sh, y.sh)) <= 3"""),
      "pipeline"),

    "q_dedup_embedding" -> GQuery(
      (s, d) => Dedup.embeddingNearDups(Tables.embeddings(s, d), 0.35, 300L),
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
              comp AS (
                SELECT p1.vec_id AS a, p2.vec_id AS b,
                  CAST(SUM(CAST(CAST(p1.embedding[i] AS DOUBLE) * CAST(p2.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot,
                  CAST(SUM(CAST(CAST(p1.embedding[i] AS DOUBLE) * CAST(p1.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na2,
                  CAST(SUM(CAST(CAST(p2.embedding[i] AS DOUBLE) * CAST(p2.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nb2
                FROM e p1 JOIN e p2 ON p1.vec_id < p2.vec_id
                CROSS JOIN generate_series(1, 64) t(i)
                GROUP BY p1.vec_id, p2.vec_id)
              SELECT a, b, round(dot / (sqrt(na2) * sqrt(nb2)), 12) AS cos_sim
              FROM comp WHERE round(dot / (sqrt(na2) * sqrt(nb2)), 12) >= 0.35"""),
      "pipeline"),

    // LSH-bucketed variant: candidates share a hyperplane-sign bucket in any
    // of 16 tables (equi-join), verified with the exact DECIMAL cosine. The
    // oracle replays the ENTIRE pipeline (md5-derived plane constants are
    // inlined identically in both engines); recall vs the exact pair set is
    // asserted in SearchPipelineSpec.
    "q_dedup_embedding_lsh" -> GQuery(
      (s, d) => Dedup.embeddingNearDupsLsh(Tables.embeddings(s, d), 0.35, 300L,
        nBits = 4, nTables = 16),
      Some(Dedup.embeddingLshOracle(0.35, 300L, nBits = 4, nTables = 16, dim = 64)),
      "pipeline"),

    "q_text_quality" -> GQuery(
      (s, d) => TextAnalysis.quality(Tables.documents(s, d)),
      Some("""SELECT doc_id,
                CAST(length(text) AS INT) AS n_chars,
                CAST(len(string_split(lower(text), ' ')) AS INT) AS n_words,
                CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')) AS avg_token_len,
                CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> w IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
                  / len(string_split(lower(text), ' ')) AS stopword_ratio,
                CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
                  / len(string_split(lower(text), ' ')) AS ttr
              FROM documents"""), "pipeline"),

    "q_text_langid" -> GQuery(
      (s, d) => TextAnalysis.languageId(Tables.documents(s, d)),
      Some("""SELECT doc_id,
                CASE WHEN en > ds THEN 'en'
                     WHEN ds > en THEN 'dataspeak'
                     ELSE 'unknown' END AS pred_lang
              FROM (SELECT doc_id,
                      len(list_filter(string_split(lower(text), ' '),
                        w -> w IN ('the','a','value','fast'))) AS en,
                      len(list_filter(string_split(lower(text), ' '),
                        w -> w IN ('table','query','scan'))) AS ds
                    FROM documents)"""), "pipeline"),

    "q_text_tokens" -> GQuery(
      (s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d)),
      Some("""SELECT doc_id,
                CAST(len(string_split(lower(text), ' ')) AS INT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS re_tokens,
                CAST(len(list_distinct(string_split(lower(text), ' '))) AS INT) AS distinct_tokens,
                CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS est_bpe_tokens
              FROM documents"""), "pipeline"),

    // relationship auto-inference: near-dup pairs become SIMILAR_TO edges
    // in a fresh store; the oracle recomputes the pair set + weights
    "q_infer_similar_edges" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        val store = new graft.graph.GraphStore(graft.graph.PropertyGraph(
          g.nodes.filter("false"), g.edges.filter("false")))
        graft.operators.Inference.inferSimilarEdges(
          store, Tables.embeddings(s, d), "Doc:", 0.35, 300L)
        store.snapshot.edges.select(col("src"), col("dst"), col("weight"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
              comp AS (
                SELECT p1.vec_id AS a, p2.vec_id AS b,
                  CAST(SUM(CAST(CAST(p1.embedding[i] AS DOUBLE) * CAST(p2.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot,
                  CAST(SUM(CAST(CAST(p1.embedding[i] AS DOUBLE) * CAST(p1.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na2,
                  CAST(SUM(CAST(CAST(p2.embedding[i] AS DOUBLE) * CAST(p2.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nb2
                FROM e p1 JOIN e p2 ON p1.vec_id < p2.vec_id
                CROSS JOIN generate_series(1, 64) t(i)
                GROUP BY p1.vec_id, p2.vec_id)
              SELECT 'Doc:' || a AS src, 'Doc:' || b AS dst,
                     round(dot / (sqrt(na2) * sqrt(nb2)), 12) AS weight
              FROM comp WHERE round(dot / (sqrt(na2) * sqrt(nb2)), 12) >= 0.35"""),
      "pipeline"),

    // SuggestTransitive (inference.go:736-777): similarity edges A→B→C
    // compose into RELATES_TO suggestions with multiplied confidence;
    // the self-join is replayed pair-for-pair in DuckDB.
    "q_infer_transitive" -> GQuery(
      (s, d) => {
        val pairs = Dedup.embeddingNearDups(Tables.embeddings(s, d), 0.25, 200L)
          .select(
            concat(lit("Doc:"), col("a")).as("src"),
            concat(lit("Doc:"), col("b")).as("dst"),
            col("cos_sim").as("confidence"))
        graft.operators.Inference.suggestTransitive(pairs, 0.10)
          .withColumn("confidence", round(col("confidence"), 12))
      },
      Some(s"""WITH ${InferPairsSql.pairs200}
              SELECT 'Doc:' || ab.a AS source_id, 'Doc:' || bc.b AS target_id,
                     'RELATES_TO' AS rel_type,
                     round(ab.conf * bc.conf, 12) AS confidence,
                     'Transitive via Doc:' || ab.b AS reason,
                     'transitive' AS method
              FROM pairs ab JOIN pairs bc ON ab.b = bc.a
              WHERE ab.a <> bc.b AND ab.conf * bc.conf >= 0.10"""),
      "pipeline"),

    // CooldownTable gate (cooldown.go:123-151): per-label cooldown windows;
    // priors 240 s old at asOf block relates_to (300 s) but not coaccess
    // (60 s); unseen pairs are "first materialization".
    "q_infer_cooldown" -> GQuery(
      (s, d) => {
        val pairs = Dedup.embeddingNearDups(Tables.embeddings(s, d), 0.25, 200L)
          .select(
            concat(lit("Doc:"), col("a")).as("src"),
            concat(lit("Doc:"), col("b")).as("dst"),
            col("cos_sim").as("confidence"))
        val sugg = graft.operators.Inference.suggestTransitive(pairs, 0.10)
          .select(
            col("source_id").as("src"), col("target_id").as("dst"),
            when(replace(col("source_id"), lit("Doc:"), lit("")).cast("int") % 2 === 0,
              "relates_to").otherwise("coaccess").as("label"))
          .distinct()
        val prior = sugg
          .filter(replace(col("dst"), lit("Doc:"), lit("")).cast("int") % 3 === 0)
          .withColumn("materialized_at",
            lit("2024-01-01 00:02:00").cast("timestamp"))
        graft.operators.Inference
          .cooldownFilter(sugg, prior, "2024-01-01 00:06:00")
          .groupBy("label", "allowed", "cooldown_reason")
          .agg(count(lit(1)).as("n"))
      },
      Some(s"""WITH ${InferPairsSql.pairs200},
              sugg AS (
                SELECT DISTINCT 'Doc:' || ab.a AS src, 'Doc:' || bc.b AS dst,
                  CASE WHEN ab.a % 2 = 0 THEN 'relates_to'
                       ELSE 'coaccess' END AS label
                FROM pairs ab JOIN pairs bc ON ab.b = bc.a
                WHERE ab.a <> bc.b AND ab.conf * bc.conf >= 0.10)
              SELECT label,
                (CAST(replace(dst, 'Doc:', '') AS INT) % 3 <> 0
                 OR label = 'coaccess') AS allowed,
                CASE WHEN CAST(replace(dst, 'Doc:', '') AS INT) % 3 <> 0
                       THEN 'first materialization for this pair'
                     WHEN label = 'coaccess' THEN 'cooldown expired'
                     ELSE 'cooldown active' END AS cooldown_reason,
                count(*) AS n
              FROM sugg GROUP BY 1, 2, 3"""),
      "pipeline"),

    // EdgeDecay sweep (edge_decay.go:213-308): similarity edges age by a
    // deterministic per-pair offset; manual/grace/delete/decay/keep all
    // populated and the whole verdict listing replays in DuckDB.
    "q_infer_edge_decay" -> GQuery(
      (s, d) => {
        val edges = Dedup.embeddingNearDups(Tables.embeddings(s, d), 0.25, 200L)
          .select(col("a"), col("b"), col("cos_sim").as("confidence"))
          .withColumn("updated_at",
            expr("timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, cast((a*7 + b*3) % 40 + 5 as int), 0, 0, 0)"))
          .withColumn("created_at", col("updated_at"))
          .withColumn("auto_generated", (col("a") + col("b")) % 5 =!= 0)
        graft.operators.Inference.decayEdges(edges, "2024-02-15 00:00:00")
          .select("a", "b", "days_since", "decayed_confidence", "action")
      },
      Some(s"""WITH ${InferPairsSql.pairs200},
              edges AS (
                SELECT a, b, conf AS confidence,
                  TIMESTAMP '2024-01-01 00:00:00'
                    + to_days(CAST((a*7 + b*3) % 40 + 5 AS INT)) AS updated_at,
                  ((a + b) % 5 <> 0) AS auto_generated
                FROM pairs),
              sweep AS (
                SELECT a, b, confidence, auto_generated,
                  (epoch(TIMESTAMP '2024-02-15 00:00:00') - epoch(updated_at))
                    / 86400.0 AS days_since,
                  round(confidence * pow(0.95, (epoch(TIMESTAMP '2024-02-15 00:00:00')
                    - epoch(updated_at)) / 86400.0), 8) AS dc,
                  (epoch(TIMESTAMP '2024-02-15 00:00:00') - epoch(updated_at))
                    < 7 * 86400 AS in_grace
                FROM edges)
              SELECT a, b, days_since,
                CASE WHEN NOT auto_generated OR in_grace
                     THEN confidence ELSE dc END AS decayed_confidence,
                CASE WHEN NOT auto_generated THEN 'SKIP_MANUAL'
                     WHEN in_grace THEN 'GRACE'
                     WHEN dc < 0.3 THEN 'DELETE'
                     WHEN dc < confidence THEN 'DECAY'
                     ELSE 'KEEP' END AS action
              FROM sweep"""),
      "pipeline"),

    // PII scrubbing: the corpus is PII-free word soup, so deterministic
    // fake PII is injected per doc (email/SSN/phone/IP derived from
    // doc_id), then redacted; the oracle replays injection + the same
    // RE2-compatible regex chain in DuckDB, proving the redaction
    // actually fires (counts taken pre-redaction)
    "q_text_redact_pii" -> GQuery(
      (s, d) => {
        val injected = Tables.documents(s, d).withColumn("text",
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com ph 555-"),
            lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
            lit("-0199 ip 10.0."), pmod(col("doc_id"), lit(256)),
            lit("."), pmod(col("doc_id"), lit(100)), lit(" ssn 123-45-6789")))
        TextAnalysis.redactPii(injected)
      },
      Some("""WITH injected AS (
                SELECT doc_id,
                  text || ' contact user' || doc_id || '@example.com ph 555-' ||
                  lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199 ip 10.0.' ||
                  (doc_id % 256) || '.' || (doc_id % 100) || ' ssn 123-45-6789' AS text
                FROM documents)
              SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(text,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                      '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
                    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
                  '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g') AS text,
                CAST(len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
                CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssns,
                CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
                CAST(len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ips
              FROM injected"""),
      "pipeline"),

    // md5-based word hash → the rolling-hash fold is replayed in SQL
    "q_text_fingerprint" -> GQuery(
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d)),
      Some("""SELECT doc_id,
                list_reduce(
                  list_transform(string_split(lower(text), ' '),
                    w -> CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) % 2147483647),
                  (acc, h) -> (acc * 31 + h) % 2147483647) AS fingerprint
              FROM documents"""),
      "pipeline"),

    // REAL decode: even doc_ids carry ImageIO-encoded PNG bytes of a
    // deterministic grayscale pattern; the engine decodes them back with
    // javax.imageio and the oracle replays width/height/channels/avg-luma
    // straight from the pattern formula — a fake decoder cannot reproduce
    // avg_luma through the lossless PNG round-trip. Odd doc_ids exercise
    // the non-image fallback (sentinel dims, no nulls → dtype-stable).
    "q_multimodal_features" -> GQuery(
      (s, d) => Multimodal.decodeImageFeatures(
        Multimodal.withImagePayload(Tables.documents(s, d)))
        .select("doc_id", "kind", "width", "height", "channels", "avg_luma"),
      Some("""WITH imgs AS (
                SELECT doc_id, CAST(8 + doc_id % 8 AS INT) AS w,
                       CAST(8 + doc_id % 5 AS INT) AS h
                FROM documents WHERE doc_id % 2 = 0),
              px AS (
                SELECT i.doc_id, i.w, i.h,
                       (i.doc_id * 31 + gx.x * 7 + gy.y * 13) % 256 AS g
                FROM imgs i
                CROSS JOIN (SELECT unnest(generate_series(0, 14)) AS x) gx
                CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS y) gy
                WHERE gx.x < i.w AND gy.y < i.h),
              png AS (
                SELECT doc_id, 'png' AS kind, MIN(w) AS width, MIN(h) AS height,
                       CAST(1 AS INT) AS channels,
                       CAST(SUM(g) AS DOUBLE) / (MIN(w) * MIN(h)) AS avg_luma
                FROM px GROUP BY doc_id)
              SELECT doc_id, kind, width, height, channels, avg_luma FROM png
              UNION ALL
              SELECT doc_id, 'bin' AS kind, CAST(-1 AS INT), CAST(-1 AS INT),
                     CAST(0 AS INT), CAST(-1.0 AS DOUBLE)
              FROM documents WHERE doc_id % 2 = 1"""), "pipeline"),

    // the byte-stat fallback tier stays covered on raw text payloads
    "q_multimodal_bytes" -> GQuery(
      (s, d) => Multimodal.extractFeatures(
        Multimodal.withPayload(Tables.documents(s, d)))
        .select("doc_id", "n_bytes", "header_byte"),
      Some("""SELECT doc_id,
                CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
                ascii(substring(text, 1, 1)) AS header_byte
              FROM documents"""), "pipeline"))
}
