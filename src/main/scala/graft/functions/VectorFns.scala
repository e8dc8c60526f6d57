package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity as pure Catalyst column expressions (codegen'd
  * higher-order functions — no UDF/serialization in the hot path).
  *
  * Mirrors `vector.similarity.cosine` / `.euclidean`
  * (`/root/reference/pkg/cypher/functions_eval_math.go:680-698`), which the
  * reference evaluates per-row in Go over `[]float32`; here `zip_with` +
  * `aggregate` fuse into whole-stage codegen over the ArrayType(Float)
  * column, so a brute-force top-k scan is one vectorized pass.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors. */
  def cosineCol(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  def euclideanDist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val dd = x.cast("double") - y.cast("double")
        dd * dd
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Reference's euclidean *similarity*: 1 / (1 + distance). */
  def euclideanSimCol(a: Column, b: Column): Column =
    lit(1.0) / (lit(1.0) + euclideanDist(a, b))
}
