package graft.functions

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{Column, SparkSession}

/** Pluggable embedding seam — the injection point the reference exposes by
  * construction (`/root/reference/pkg/embed/embed.go` defines the embedder
  * interface the server wires to llama.cpp via `pkg/localllm`; everything
  * downstream — text-query vector CALLs (`pkg/search/search.go:851ff`),
  * chunk pipelines, the embed queue — goes through it).
  *
  * The engine's default is the DISCLOSED deterministic [[TextEmbed]] hash
  * projection (zero-egress sandbox: no real model). A deployment swaps in
  * a real encoder by implementing the two methods and calling
  * [[Embedder.set]] (or scoping with [[Embedder.withEmbedder]]) — no call
  * site edits: the vector CALL surface, `Chunker.searchChunks`, and the
  * streaming embed queue all resolve [[Embedder.current]] at run time.
  */
trait Embedder {
  /** Output dimension (must match the vectors already in the store). */
  def dim: Int
  /** Provider/model names the ops surfaces disclose (embed stats). */
  def provider: String = "builtin"
  def model: String = "hash-projection"
  /** Driver-side single-text form (CALL-argument query texts — tiny). */
  def embed(text: String): Seq[Double]
  /** Distributed column form for bulk embedding: `text column → ARRAY<DOUBLE>`
    * column. Implementations should stay codegen-friendly (a native
    * Expression or mapInPandas batch, never a driver collect).
    */
  def embedCol(spark: SparkSession, c: Column): Column
}

object Embedder {

  /** Default implementation: the disclosed [[TextEmbed]] feature-hashing
    * projection — bit-identical to the arithmetic the DuckDB oracles
    * replay.
    */
  object HashProjection extends Embedder {
    val dim: Int = TextEmbed.Dim
    def embed(text: String): Seq[Double] = TextEmbed.embed(text, dim)
    def embedCol(spark: SparkSession, c: Column): Column = {
      HashExprs.ensure(spark)
      TextEmbed.embedCol(c, dim)
    }
  }

  private val cur = new AtomicReference[Embedder](HashProjection)

  def current: Embedder = cur.get

  /** Install a different embedder process-wide (a deployment's one-time
    * wiring call). */
  def set(e: Embedder): Unit = cur.set(e)

  /** Run `f` with `e` installed, restoring the previous embedder after —
    * for tests and scoped pipelines. */
  def withEmbedder[T](e: Embedder)(f: => T): T = {
    val prev = cur.getAndSet(e)
    try f finally cur.set(prev)
  }
}
