package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text→vector projection — a DISCLOSED stand-in for the
  * reference's server-side embedder (`/root/reference/pkg/embed`, local
  * llama.cpp models via `pkg/localllm`; `pkg/search/search.go:851ff`
  * embeds text queries before the vector scan). Zero-egress rules out a
  * real model, so the CALL surface accepts text through the classic
  * feature-hashing trick instead: each whitespace token FNV-1a-hashes to
  * one of `dim` buckets with a parity sign, and the bucket-count vector
  * l2-normalizes. Deterministic, SQL-replayable (the
  * q_cypher_call_search_text oracle folds the same FNV-1a in DuckDB),
  * and cosine-meaningful — texts sharing tokens share buckets.
  *
  * NOT a semantic embedding: swap in a real encoder behind the same
  * (text → Array[Double]) contract for production use.
  */
object TextEmbed {

  /** Default dimension matches the testdata embedding tables. */
  val Dim = 64

  def tokens(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  /** Driver-side form for CALL-argument query texts (tiny input). */
  def embed(text: String, dim: Int = Dim): Seq[Double] = {
    val v = new Array[Double](dim)
    tokens(text).foreach { t =>
      val h = HashImpls.fnv1a64(t.getBytes("UTF-8"))
      val b = (((h % dim) + dim) % dim).toInt
      v(b) += (if ((h & 1L) == 0L) 1.0 else -1.0)
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n > 0) v.map(_ / n).toSeq else v.toSeq
  }

  /** Distributed column form for bulk embedding of a text column — same
    * formula as [[embed]], expressed with codegen'd HOFs over the
    * [[HashExprs]] FNV expression (call `HashExprs.ensure(spark)` once
    * per session before using it).
    */
  def embedCol(c: Column, dim: Int = Dim): Column = {
    val toks = filter(split(lower(c), "\\s+"), t => length(t) > 0)
    val contribs = transform(toks, t => struct(
      pmod(HashExprs.fnv1a64(t), lit(dim.toLong)).as("b"),
      when(pmod(HashExprs.fnv1a64(t), lit(2L)) === 0L, lit(1.0))
        .otherwise(lit(-1.0)).as("s")))
    val raw = aggregate(contribs, array_repeat(lit(0.0), dim), (acc, t) =>
      transform(acc, (x, i) =>
        x + when(t.getField("b") === i.cast("long"), t.getField("s"))
          .otherwise(lit(0.0))))
    val nrm = sqrt(aggregate(raw, lit(0.0), (a, x) => a + x * x))
    when(nrm > 0, transform(raw, x => x / nrm)).otherwise(raw)
  }
}
