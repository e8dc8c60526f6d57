package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, TextAnalysis}

/** LLM-training-data pipeline surface (builder brief): dedup family,
  * text analysis, multimodal plumbing — each over `documents`/`embeddings`.
  */
object PipelineQueries {

  val queries: Map[String, GQuery] = Map(
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
    "q_dedup_minhash_lsh" -> GQuery(
      (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), 3, 16, 4, 0.5),
      None, "pipeline"),

    "q_dedup_simhash" -> GQuery(
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d), 3, 1000L),
      None, "pipeline"),

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

    "q_text_fingerprint" -> GQuery(
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d)),
      None, "pipeline"), // murmur3 word hashes not reproducible in DuckDB

    "q_multimodal_features" -> GQuery(
      (s, d) => Multimodal.extractFeatures(
        Multimodal.withPayload(Tables.documents(s, d)))
        .select("doc_id", "n_bytes", "header_byte"),
      Some("""SELECT doc_id,
                CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
                ascii(substring(text, 1, 1)) AS header_byte
              FROM documents"""), "pipeline"))
}
