package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.{BM25, Hnsw, Hybrid, Rerank, VectorSearch}

/** Search surface (SURVEY.md §2.11): BM25 fulltext, vector top-k
  * (brute/exact/ANN), RRF hybrid fusion.
  */
object SearchQueries {

  private val bmTerms = Seq("spark", "table", "query")

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

    // bit-count tuned for weakly-similar corpora: P[collision] per table is
    // (1 - θ/π)^nBits; at cosine≈0.37 (θ≈68°) 4 bits × 8 tables ⇒ ~0.73
    // recall. High-similarity near-dup corpora would use 8–16 bits.
    "q_vector_ann_lsh" -> GQuery(
      (s, d) => VectorSearch.annTopK(Tables.embeddings(s, d), 0L, 10, nBits = 4, nTables = 8),
      None, "2.11"),

    // IVF: k-means coarse quantizer, probe the 4 nearest of 16 lists —
    // the partition-pruned scale path (rows-only; exactness at
    // nProbe == nLists asserted in SearchPipelineSpec)
    "q_vector_ann_ivf" -> GQuery(
      (s, d) => VectorSearch.ivfTopK(Tables.embeddings(s, d), 0L, 10,
        nLists = 16, nProbe = 4),
      None, "2.11"),

    // HNSW: partition-local graphs (M=16, efC=200, efS=100 — the reference's
    // hnsw_index.go:35-50 parameters), per-partition top-k merged. Rows-only;
    // recall@10 >= 0.95 vs brute asserted in SearchPipelineSpec via Eval.
    "q_vector_ann_hnsw" -> GQuery(
      (s, d) => Hnsw.hnswTopK(Tables.embeddings(s, d), 0L, 10),
      None, "2.11"),

    // macro recall/ndcg of the HNSW tier over 20 queries (rows-only; the
    // numbers themselves are asserted in spec)
    "q_eval_hnsw_quality" -> GQuery(
      (s, d) => graft.search.Eval.hnswVsBrute(s, Tables.embeddings(s, d), 20, 10),
      None, "2.11"),

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
      }, "2.11"))
}
