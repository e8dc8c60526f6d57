package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.{BM25, Hnsw, Hybrid, Mmr, Rerank, VectorSearch}

/** Search surface (SURVEY.md §2.11): BM25 fulltext, vector top-k
  * (brute/exact/ANN), RRF hybrid fusion.
  */
object SearchQueries {

  private val bmTerms = Seq("spark", "table", "query")

  /** Quality floors for the ANN verdict rows (margin below the measured
    * sf0.001 and sf0.01 values; raw macros asserted in
    * SearchPipelineSpec).
    */
  val annIvfFloor = 0.3
  val annHnswFloor = 0.9
  val evalHnswBounds: Seq[(String, Double)] =
    Seq("recall_at_k" -> 0.9, "ndcg_at_k" -> 0.85)

  val queries: Map[String, GQuery] = Map(
    "q_bm25_topk" -> GQuery(
      (s, d) => BM25.search(Tables.documents(s, d), bmTerms, 20),
      Some(BM25.oracleSql(bmTerms, 20)), "2.11"),

    // headline tier: codegen'd double HOFs. Scores are float sums (not
    // hash-comparable), but the RANKING is — fp error ~1e-13 cannot reorder
    // distinct random vectors — so the query returns (vec_id, rank) and the
    // oracle recomputes the ranking with exact DECIMAL scores.
    "q_vector_topk" -> GQuery(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        import org.apache.spark.sql.expressions.Window
        VectorSearch.bruteTopK(
            emb.filter(col("vec_id") =!= 0L), emb.filter(col("vec_id") === 0L), 10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cos_sim").desc, col("vec_id").asc)))
          .select("vec_id", "rank")
      },
      Some(s"""SELECT vec_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
               FROM (${VectorSearch.bruteTopKExactOracle(0L, 10, 64)})"""),
      "2.11"),

    // DECIMAL-routed tier: scores hash-match the SQL oracle bit-for-bit
    // (the oracle fixture; the benched headline path is q_vector_topk)
    "q_vector_topk_exact" -> GQuery(
      (s, d) => VectorSearch.bruteTopKExact(Tables.embeddings(s, d), 0L, 10),
      Some(VectorSearch.bruteTopKExactOracle(0L, 10, 64)), "2.11"),

    // the vector index's SimilarityFunc alternatives (schema.go:311):
    // raw dot-product and euclidean 1/(1+d) rankings, DECIMAL-replayed
    "q_vector_topk_dot" -> GQuery(
      (s, d) => VectorSearch.bruteTopKMetric(Tables.embeddings(s, d), 0L, 10, "dot"),
      Some(VectorSearch.bruteTopKMetricOracle(0L, 10, 64, "dot")), "2.11"),

    "q_vector_topk_euclidean" -> GQuery(
      (s, d) => VectorSearch.bruteTopKMetric(Tables.embeddings(s, d), 0L, 10, "euclidean"),
      Some(VectorSearch.bruteTopKMetricOracle(0L, 10, 64, "euclidean")), "2.11"),

    // MMR diversification (search.go:1544): greedy λ·rel − (1−λ)·maxSim
    // over a bounded RRF candidate set; the 10-step selection replays as
    // chained argmax CTEs in DuckDB
    "q_hybrid_mmr" -> GQuery(
      (s, d) => {
        val cand = Tables.embeddings(s, d).filter(col("vec_id") < 40)
          .select(col("vec_id").as("id"),
            (lit(1.0) / (col("vec_id") + lit(60))).as("rel"),
            col("embedding"))
        Mmr.select(cand, 10, 0.5)
      },
      Some(Mmr.selectOracle(40, 10, 0.5, 64)), "2.11"),

    // bit-count tuned for weakly-similar corpora: P[collision] per table is
    // (1 - θ/π)^nBits; at cosine≈0.37 (θ≈68°) 4 bits × 8 tables ⇒ ~0.73
    // recall. High-similarity near-dup corpora would use 8–16 bits.
    // Oracle-checked: the md5-integer planes + bucket match + DECIMAL
    // rerank replay bit-for-bit in SQL (was rows-only through round 3).
    "q_vector_ann_lsh" -> GQuery(
      (s, d) => VectorSearch.annTopK(Tables.embeddings(s, d), 0L, 10, nBits = 4, nTables = 8),
      Some(VectorSearch.annLshOracle(0L, 10, nBits = 4, nTables = 8, dim = 64)), "2.11"),

    // IVF: k-means coarse quantizer, probe the 4 nearest of 16 lists —
    // the partition-pruned scale path. The approximate id list has no SQL
    // replay, so the row emits the deterministic verdict instead: recall
    // of the probed top-10 vs the brute-force truth, thresholded (the
    // oracle is the expected PASS row; exactness at nProbe == nLists is
    // asserted in SearchPipelineSpec).
    "q_vector_ann_ivf" -> GQuery(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        graft.search.Eval.annPassRow(
          VectorSearch.ivfTopK(emb, 0L, 10, nLists = 16, nProbe = 4),
          emb, 0L, 10, "ivf", annIvfFloor)
      },
      Some(s"""SELECT 'ivf:recall@10' AS metric,
                 CAST($annIvfFloor AS DOUBLE) AS threshold, true AS pass"""),
      "2.11"),

    // HNSW: partition-local graphs (M=16, efC=200, efS=100 — the reference's
    // hnsw_index.go:35-50 parameters), per-partition top-k merged, same
    // verdict-row shape (recall@10 >= 0.95 also asserted in spec).
    "q_vector_ann_hnsw" -> GQuery(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        graft.search.Eval.annPassRow(
          Hnsw.hnswTopK(emb, 0L, 10), emb, 0L, 10, "hnsw", annHnswFloor)
      },
      Some(s"""SELECT 'hnsw:recall@10' AS metric,
                 CAST($annHnswFloor AS DOUBLE) AS threshold, true AS pass"""),
      "2.11"),

    // macro recall/ndcg of the HNSW tier over 20 queries as verdict rows
    // (raw macros asserted in SearchPipelineSpec)
    "q_eval_hnsw_quality" -> GQuery(
      (s, d) => graft.search.Eval.passRows(
        graft.search.Eval.hnswVsBrute(s, Tables.embeddings(s, d), 20, 10),
        "hnsw", evalHnswBounds),
      Some(graft.search.Eval.passRowsOracle("hnsw", evalHnswBounds)), "2.11"),

    "q_hybrid_rrf" -> GQuery(
      (s, d) => {
        val bm = BM25.search(Tables.documents(s, d), bmTerms, 100)
        val vs = VectorSearch.bruteTopKExact(Tables.embeddings(s, d), 0L, 100)
        Hybrid.rrf(bm, vs, "doc_id", "vec_id", 100, 10)
      },
      Some {
        val bmSql = BM25.oracleSql(bmTerms, 100)
        val vsSql = VectorSearch.bruteTopKExactOracle(0L, 100, 64)
        s"""WITH bm AS ($bmSql),
            bmr AS (SELECT doc_id AS id,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank_text
                    FROM bm),
            cs AS ($vsSql),
            csr AS (SELECT vec_id AS id,
                      ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rank_vec
                    FROM cs)
            SELECT id,
                   COALESCE(1.0 / (60 + rank_text), 0.0)
                 + COALESCE(1.0 / (60 + rank_vec), 0.0) AS rrf
            FROM bmr FULL OUTER JOIN csr USING (id)
            ORDER BY rrf DESC, id LIMIT 10"""
      }, "2.11"),

    // cross-encoder rerank stage over BM25 candidates (rerank.go:132). The
    // encoder is the disclosed lexical-overlap STUB (no model runtime in
    // container); the oracle replays candidate generation + overlap scoring
    // + both rankings exactly.
    "q_hybrid_rerank" -> GQuery(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val cands = BM25.search(docs, bmTerms, 20)
          .withColumnRenamed("doc_id", "id")
          .withColumnRenamed("score", "bi_score")
          .join(docs.select(col("doc_id").as("id"), col("text").as("content")), "id")
        Rerank.rerank(cands, bmTerms.mkString(" "), topK = 20)
          .select(col("id"), col("original_rank"), col("new_rank"),
            col("cross_score"))
      },
      Some {
        val bmSql = BM25.oracleSql(bmTerms, 20)
        val q = bmTerms.map(t => s"'$t'").mkString("[", ",", "]")
        s"""WITH bm AS ($bmSql),
            cand AS (
              SELECT bm.doc_id AS id, bm.score AS bi_score,
                     ROW_NUMBER() OVER (ORDER BY bm.score DESC, bm.doc_id) AS original_rank,
                     list_distinct(string_split(lower(d.text), ' ')) AS ct
              FROM bm JOIN documents d ON d.doc_id = bm.doc_id),
            scored AS (
              SELECT id, original_rank,
                     len(list_filter(ct, t -> list_contains($q, t)))
                       / CAST(len(ct) + ${bmTerms.size}
                              - len(list_filter(ct, t -> list_contains($q, t))) AS DOUBLE)
                       AS cross_score
              FROM cand)
            SELECT id, CAST(original_rank AS INT) AS original_rank,
                   CAST(ROW_NUMBER() OVER (ORDER BY cross_score DESC, id) AS INT) AS new_rank,
                   cross_score
            FROM scored"""
      }, "2.11"),

    // the IR-metric layer itself, oracle-checked on a deterministic
    // fixture (customer → ranked orders; relevant = status-'F' orders):
    // per-query precision/recall/mrr are exact rationals, DCG/IDCG route
    // round-9 terms through DECIMAL — proves the harness.go mirror the
    // ANN eval rows rely on
    "q_eval_metrics" -> GQuery(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, d).filter(col("o_custkey") <= 50)
        val ranked = o.select(col("o_custkey").as("query_id"),
            col("o_orderkey").as("item_id"))
          .withColumn("rank", row_number().over(
            Window.partitionBy("query_id").orderBy("item_id")))
        val relevant = o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("query_id"), col("o_orderkey").as("item_id"))
        graft.search.Eval.metrics(ranked, relevant, 10, exact = true)
      },
      Some("""WITH ranked AS (
                SELECT o_custkey AS query_id, o_orderkey AS item_id,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rank
                FROM orders WHERE o_custkey <= 50),
              rel AS (SELECT o_custkey AS query_id, o_orderkey AS item_id
                      FROM orders WHERE o_custkey <= 50 AND o_orderstatus = 'F'),
              topk AS (SELECT r.query_id, r.rank,
                              CASE WHEN rl.item_id IS NULL THEN 0 ELSE 1 END AS is_rel
                       FROM ranked r LEFT JOIN rel rl
                         ON r.query_id = rl.query_id AND r.item_id = rl.item_id
                       WHERE r.rank <= 10),
              relc AS (SELECT query_id, COUNT(*) AS n_rel FROM rel GROUP BY query_id),
              pq AS (SELECT query_id, SUM(is_rel) AS hits,
                            MIN(CASE WHEN is_rel = 1 THEN rank END) AS first_hit,
                            CAST(SUM(CASE WHEN is_rel = 1
                              THEN CAST(round(1.0 / (ln(rank + 1) / ln(2)), 9) AS DECIMAL(28,12))
                              ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS dcg
                     FROM topk GROUP BY query_id),
              m AS (SELECT p.query_id, hits, first_hit, dcg, n_rel,
                      CAST(list_reduce(list_prepend(CAST(0 AS DECIMAL(28,12)),
                        list_transform(generate_series(1, LEAST(n_rel, 10)),
                          i -> CAST(round(1.0 / (ln(i + 1) / ln(2)), 9) AS DECIMAL(28,12)))),
                        (a, x) -> CAST(a + x AS DECIMAL(28,12))) AS DOUBLE) AS idcg
                    FROM pq p JOIN relc USING (query_id))
              SELECT query_id,
                     CAST(hits AS DOUBLE) / 10 AS precision_at_k,
                     CAST(hits AS DOUBLE) / n_rel AS recall_at_k,
                     COALESCE(CAST(1.0 AS DOUBLE) / first_hit, CAST(0.0 AS DOUBLE)) AS mrr,
                     round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 9) AS ndcg_at_k
              FROM m"""),
      "2.11"),

    // ---- CALL-procedure surface over the same engines (SURVEY §2.11,
    // call_vector.go:35 / call_fulltext.go:38 / search.go:890). Each runs
    // through the Cypher string surface (CALL … YIELD … WHERE) and must
    // match the direct-API twins above.

    // db.index.vector.queryNodes: index over the embeddings table; query
    // vector = vec 0's embedding passed as a $param; k=11 then YIELD-WHERE
    // drops the query row itself (score 1.0) → identical to the exact
    // brute top-10 oracle that excludes vec 0.
    "q_cypher_call_vector_index" -> GQuery(
      (s, d) => {
        graft.search.SearchIndexes.registerVector(graft.search.SearchIndexes.VectorIdx(
          "emb64", () => Tables.embeddings(s, d), "vec_id", "embedding", "DATASET"))
        val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0L)
          .select("embedding").head.getSeq[Float](0).map(_.toDouble)
        graft.cypher.Cypher.run(GraphQueries.graph(s, d),
          """CALL db.index.vector.queryNodes('emb64', 11, $qv) YIELD node, score
             WHERE node <> 0
             RETURN node AS vec_id, score AS cos_sim""",
          Map("qv" -> qv))
      },
      Some(VectorSearch.bruteTopKExactOracle(0L, 10, 64)), "2.11"),

    // TEXT query through the vector CALL surface (the reference embeds
    // query text server-side, search.go:851ff via pkg/embed; the
    // disclosed TextEmbed hash-projection stands in) — the oracle replays
    // the whole projection + DECIMAL cosine in SQL
    "q_cypher_call_search_text" -> GQuery(
      (s, d) => {
        graft.search.SearchIndexes.registerVector(graft.search.SearchIndexes.VectorIdx(
          "emb64", () => Tables.embeddings(s, d), "vec_id", "embedding", "DATASET"))
        graft.cypher.Cypher.run(GraphQueries.graph(s, d),
          """CALL db.index.vector.queryNodes('emb64', 10, 'graph vector search engine')
             YIELD node, score
             RETURN node AS vec_id, score AS cos_sim""")
      },
      Some(VectorSearch.textTopKOracle("graph vector search engine", 10, 64)), "2.11"),

    // db.index.fulltext.queryNodes over a documents-backed index — same
    // BM25 pipeline and oracle as q_bm25_topk
    "q_cypher_call_fulltext" -> GQuery(
      (s, d) => {
        graft.search.SearchIndexes.registerFulltext(graft.search.SearchIndexes.FulltextIdx(
          "docs_ft", () => Tables.documents(s, d), "doc_id", "text", "DATASET"))
        graft.cypher.Cypher.run(GraphQueries.graph(s, d),
          s"""CALL db.index.fulltext.queryNodes('docs_ft', '${bmTerms.mkString(" ")}', 20)
              YIELD node, score
              RETURN node AS doc_id, score""")
      },
      Some(BM25.oracleSql(bmTerms, 20)), "2.11"),

    // db.index.hybrid.queryNodes — the CALL projection of the reference's
    // rrfHybridSearch (search.go:890, candidateLimit = 2·k): vector list
    // here INCLUDES the query row (the caller passes an external vector)
    "q_cypher_call_hybrid" -> GQuery(
      (s, d) => {
        graft.search.SearchIndexes.registerVector(graft.search.SearchIndexes.VectorIdx(
          "emb64", () => Tables.embeddings(s, d), "vec_id", "embedding", "DATASET"))
        graft.search.SearchIndexes.registerFulltext(graft.search.SearchIndexes.FulltextIdx(
          "docs_ft", () => Tables.documents(s, d), "doc_id", "text", "DATASET"))
        val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0L)
          .select("embedding").head.getSeq[Float](0).map(_.toDouble)
        graft.cypher.Cypher.run(GraphQueries.graph(s, d),
          s"""CALL db.index.hybrid.queryNodes('emb64', 'docs_ft', 10,
                '${bmTerms.mkString(" ")}', $$qv)
              YIELD node, score
              RETURN node, score""",
          Map("qv" -> qv))
      },
      Some {
        val bmSql = BM25.oracleSql(bmTerms, 20)
        s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            comp AS (
              SELECT e.vec_id,
                CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot,
                CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na2,
                CAST(SUM(CAST(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nb2
              FROM embeddings e CROSS JOIN q CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY e.vec_id),
            vs AS (SELECT vec_id, round(dot / (sqrt(na2) * sqrt(nb2)), 12) AS cos_sim
                   FROM comp ORDER BY cos_sim DESC, vec_id LIMIT 20),
            csr AS (SELECT vec_id AS id,
                      ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rank_vec
                    FROM vs),
            bm AS ($bmSql),
            bmr AS (SELECT doc_id AS id,
                      ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank_text
                    FROM bm)
            SELECT id AS node,
                   COALESCE(1.0 / (60 + rank_text), 0.0)
                 + COALESCE(1.0 / (60 + rank_vec), 0.0) AS score
            FROM bmr FULL OUTER JOIN csr USING (id)
            ORDER BY score DESC, node LIMIT 10"""
      }, "2.11"),

    // named per-node embeddings round-trip (types.go:196 NamedEmbeddings,
    // call_compat.go:663 setNodeVectorProperty, call_compat.go:344
    // createNodeIndex): set three vectors through the store, index them,
    // query back — scores are exact rationals, the oracle is closed-form
    "q_cypher_vector_property" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        new graft.graph.GraphStore(g) // registers as currentStore
        def run(q: String) = graft.cypher.Cypher.run(g, q)
        run("CALL db.create.setNodeVectorProperty('Customer:1', 'profile', [3.0, 4.0, 0.0])")
        run("CALL db.create.setNodeVectorProperty('Customer:2', 'profile', [6.0, 8.0, 0.0])")
        run("CALL db.create.setNodeVectorProperty('Customer:3', 'profile', [4.0, -3.0, 0.0])")
        run("CALL db.index.vector.createNodeIndex('cust_profile', 'Customer', 'profile', 3, 'cosine')")
        run("""CALL db.index.vector.queryNodes('cust_profile', 3, [3.0, 4.0, 0.0])
               YIELD node, score RETURN node, score""")
      },
      Some("""SELECT * FROM (VALUES
                ('Customer:1', CAST(1.0 AS DOUBLE)),
                ('Customer:2', CAST(1.0 AS DOUBLE)),
                ('Customer:3', CAST(0.0 AS DOUBLE))) AS t(node, score)"""),
      "2.11"),

    // SearchOptions on the CALL surface (search.go:116 Labels, :161
    // MinSimilarity): label scoping restricts the candidate set before
    // ranking, minScore thresholds the similarity — the oracle replays
    // BOTH filters in SQL over the same written vectors
    "q_cypher_call_search_options" -> GQuery(
      (s, d) => {
        val g = GraphQueries.graph(s, d)
        new graft.graph.GraphStore(g) // registers as currentStore
        def run(q: String) = graft.cypher.Cypher.run(g, q)
        run("CALL db.create.setNodeVectorProperty('Customer:1', 'profile5', [1.0, 0.0, 0.0])")
        run("CALL db.create.setNodeVectorProperty('Customer:2', 'profile5', [3.0, 4.0, 0.0])")
        run("CALL db.create.setNodeVectorProperty('Customer:3', 'profile5', [-1.0, 0.0, 0.0])")
        run("CALL db.create.setNodeVectorProperty('Supplier:1', 'profile5', [1.0, 0.0, 0.0])")
        run("CALL db.index.vector.createNodeIndex('mix_profile', '*', 'profile5', 3, 'cosine')")
        run("""CALL db.index.vector.queryNodes('mix_profile', 10, [1.0, 0.0, 0.0],
                 {labels: ['Customer'], minScore: 0.5})
               YIELD node, score RETURN node, score""")
      },
      Some("""WITH emb(node, label, e1, e2, e3) AS (VALUES
                ('Customer:1', 'Customer', 1.0, 0.0, 0.0),
                ('Customer:2', 'Customer', 3.0, 4.0, 0.0),
                ('Customer:3', 'Customer', -1.0, 0.0, 0.0),
                ('Supplier:1', 'Supplier', 1.0, 0.0, 0.0)),
              scored AS (
                SELECT node,
                  round((CAST(e1 AS DOUBLE) * 1.0 + CAST(e2 AS DOUBLE) * 0.0
                         + CAST(e3 AS DOUBLE) * 0.0) /
                    (sqrt(CAST(e1 AS DOUBLE) * e1 + CAST(e2 AS DOUBLE) * e2
                          + CAST(e3 AS DOUBLE) * e3) * sqrt(1.0)), 12) AS score
                FROM emb WHERE label = 'Customer')
              SELECT node, score FROM scored WHERE score >= 0.5
              ORDER BY score DESC, node LIMIT 10"""),
      "2.11"))
}
