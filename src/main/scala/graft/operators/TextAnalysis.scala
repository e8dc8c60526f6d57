package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: quality scoring,
  * language ID (n-gram/marker heuristic), token counting, document
  * fingerprinting. Everything is a per-row column expression or one
  * aggregation — embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Per-doc quality features. All integer arithmetic until the final
    * double divisions, so results are bit-stable vs a SQL oracle.
    */
  def quality(docs: DataFrame): DataFrame = {
    val words = split(lower(col("text")), " ")
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(words).as("n_words"),
      (length(col("text")).cast("double") / size(words)).as("avg_token_len"),
      (size(filter(words, w => w.isin(stopwords: _*))).cast("double") /
        size(words)).as("stopword_ratio"),
      (size(array_distinct(words)).cast("double") / size(words)).as("ttr"))
  }

  /** Marker-word language heuristic. The synthetic corpus is English-ish
    * word soup, so this is a deterministic classifier exercising the
    * n-gram-scoring *shape* (argmax over per-language marker counts), not a
    * real model.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val words = split(lower(col("text")), " ")
    val enScore = size(filter(words, w => w.isin("the", "a", "value", "fast")))
    val dataScore = size(filter(words, w => w.isin("table", "query", "scan")))
    docs.select(col("doc_id"),
      when(enScore > dataScore, "en")
        .when(dataScore > enScore, "dataspeak")
        .otherwise("unknown").as("pred_lang"))
  }

  /** Token counts: whitespace tokens, regex word tokens, distinct tokens,
    * and a BPE-ish subword estimate (ceil of chars/4 — the common
    * chars-per-token rule of thumb, deterministic).
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val words = split(lower(col("text")), " ")
    docs.select(
      col("doc_id"),
      size(words).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+")).as("re_tokens"),
      size(array_distinct(words)).as("distinct_tokens"),
      ceil(length(col("text")).cast("double") / 4).cast("long").as("est_bpe_tokens"))
  }

  /** Polynomial rolling-hash fingerprint over words:
    * h = Σ (h*31 + wordhash) mod 2^31-1, computed with a HOF fold —
    * deterministic, distributed, no UDF. The word hash is the top 60 bits
    * of md5 (cross-engine reproducible, unlike murmur3: a DuckDB oracle can
    * recompute it bit-exactly). acc < 2^31 and hash < 2^31 keep the fold in
    * long range with no overflow.
    */
  def fingerprintCol(text: Column): Column = {
    val words = split(lower(text), " ")
    val m = lit(2147483647L) // 2^31 - 1
    aggregate(words, lit(0L),
      (acc, w) => (acc * 31 + conv(substring(md5(w), 1, 15), 16, 10).cast("long") % m) % m)
  }

  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintCol(col("text")).as("fingerprint"))

  /** PII patterns for the scrubbing pass an LLM training pipeline runs
    * before tokenization (the batch complement of the privacy surface's
    * pseudonymization, `db_privacy.go`). Order matters: SSN before phone
    * (disjoint shapes, but explicit), card runs before anything that
    * could eat their digits. Kept to RE2-compatible constructs so a
    * DuckDB oracle replays the same redactions.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    ("\\b\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]"),
    ("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]"))

  /** Redact PII in place and count what each family matched (counts are
    * taken BEFORE redaction so they survive overlapping rewrites). A pure
    * regexp chain — codegen'd, embarrassingly parallel, no UDF.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = Seq("n_emails", "n_ssns", "n_phones", "n_ips")
      .zip(piiPatterns).map { case (name, (pat, _)) =>
        regexp_count(col(textCol), lit(pat)).as(name)
      }
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (pat, tag)) => regexp_replace(c, pat, tag)
    }
    docs.select(col("doc_id") +: redacted.as(textCol) +: counts: _*)
  }
}
