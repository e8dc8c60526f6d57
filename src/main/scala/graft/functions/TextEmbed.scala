package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

  /** Codegen entry: one JVM call per row, identical arithmetic (and float
    * op order) to [[embed]]. */
  def embedU(text: UTF8String, dim: Int): GenericArrayData =
    new GenericArrayData(embed(text.toString, dim).toArray)

  /** Distributed column form for bulk embedding of a text column — one
    * codegen'd expression call per row. (The first cut was a nested-HOF
    * fold: O(tokens × dim) array rebuilds per row plus Catalyst expression
    * duplication re-evaluating the fold for the normalize branch — 105 s
    * for the sf0.1 chunk-search row; this form is ~1 s. Same lesson as the
    * round-5 LSH fix: imperative per-row loops belong in a native
    * `Expression`, not in stacked `aggregate`/`transform` lambdas.)
    * Call `HashExprs.ensure(spark)` once per session before using it.
    */
  def embedCol(c: Column, dim: Int = Dim): Column =
    call_function("graft_text_embed", c, lit(dim))
}

/** embed(text, dim) → ARRAY<DOUBLE>: the [[TextEmbed]] hash projection as
  * a single codegen'd call.
  */
case class TextEmbedExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override protected def nullSafeEval(t: Any, d: Any): Any =
    TextEmbed.embedU(t.asInstanceOf[UTF8String], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) =>
      s"graft.functions.TextEmbed$$.MODULE$$.embedU($t, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
