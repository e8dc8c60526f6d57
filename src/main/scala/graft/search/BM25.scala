package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 fulltext scoring as a posting-list join+aggregate pipeline.
  *
  * Re-expresses the reference's in-memory inverted index
  * (`/root/reference/pkg/search/fulltext_index.go:12-18,125-230`,
  * k1=1.2 b=0.75) as DataFrames: postings (term, doc, tf), doc lengths and
  * corpus stats are plain aggregations, so at 100 TB the index build is one
  * shuffle and a query is a broadcast of the (tiny) per-term df table + one
  * join on doc_id — no driver-side state.
  *
  * All floating-point constants appear as identical literals on the DuckDB
  * oracle side, and per-term scores are summed through DECIMAL(28,12), so
  * scores are bit-stable across engines.
  */
object BM25 {

  /** (doc_id, term) token stream — lowercase, whitespace split. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))

  /** Top-k docs for a bag-of-words query. `restrict` (single `doc_id`
    * column) optionally limits RESULTS to a candidate set — applied after
    * scoring, so idf/avgdl stay corpus-global like the reference's one
    * shared inverted index with post-hoc candidate filtering
    * (`search.go:1351` filterCandidatesByType).
    */
  def search(docs: DataFrame, terms: Seq[String], k: Int,
      restrict: Option[DataFrame] = None): DataFrame = {
    val toks = tokens(docs)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))

    val s: Column =
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
        col("tf") * 2.2 /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") /
          (col("sum_dl").cast("double") / col("n_docs"))))

    val scored = tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id") // doc-keyed join, co-partitioned with tf
      .crossJoin(broadcast(stats))
      .withColumn("s", s)
      .groupBy("doc_id")
      .agg(sum(col("s").cast("decimal(28,12)")).cast("double").as("score"))
    restrict.fold(scored)(r => scored.join(r, Seq("doc_id"), "left_semi"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The oracle-side SQL for the same computation (kept adjacent so the
    * formula literals stay in sync). `terms` must be plain words. */
  def oracleSql(terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(",")
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
               WHERE term IN ($inList) GROUP BY doc_id, term),
        dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 /
                   (tf + 1.2 * (0.25 + 0.75 * dl /
                     (CAST(sum_dl AS DOUBLE) / n_docs))) AS s
          FROM tf JOIN dfreq USING(term) JOIN dl USING(doc_id) CROSS JOIN stats)
        SELECT doc_id, CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE) AS score
        FROM scored GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT $k"""
  }
}
