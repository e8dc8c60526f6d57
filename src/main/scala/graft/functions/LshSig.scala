package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) random-hyperplane LSH signature — the hot loop of the
  * ANN index build (`/root/reference/pkg/search/search.go` LSH tier, SURVEY
  * §2.11). Replaces the interpreted `aggregate(zip_with(...))` HOF fold
  * (nBits × dim lambda-evaluated multiply-adds per row) with one JVM loop
  * inside whole-stage codegen — same arithmetic, same result bits:
  * the fold is left-to-right from 0.0 over ascending j exactly like the
  * Catalyst HOF and the DuckDB `list_reduce(list_prepend(0.0, ...))`
  * oracle replay, and the md5-derived integer plane components are shared
  * with [[graft.operators.Dedup.lshPlaneComponent]].
  */
object LshImpls {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** Flattened nBits×dim plane matrix for one hash table (row-major). */
  def planes(table: Int, nBits: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((table, nBits, dim), _ => {
      val w = new Array[Double](nBits * dim)
      var p = 0
      while (p < nBits) {
        var j = 0
        while (j < dim) {
          w(p * dim + j) = graft.operators.Dedup.lshPlaneComponent(table, p, j).toDouble
          j += 1
        }
        p += 1
      }
      w
    })

  /** nBits-char '0'/'1' signature: char_p = sign(Σ_j v_j · plane_{t,p,j}).
    * Accumulation order matches the HOF/SQL fold (ascending j from 0.0), so
    * results are bit-identical to the previous interpreted implementation.
    */
  def signature(arr: ArrayData, table: Int, nBits: Int, dim: Int): UTF8String = {
    val w = planes(table, nBits, dim)
    val n = math.min(dim, arr.numElements())
    val out = new Array[Byte](nBits)
    var p = 0
    while (p < nBits) {
      var acc = 0.0
      val base = p * dim
      var j = 0
      while (j < n) {
        acc += arr.getDouble(j) * w(base + j)
        j += 1
      }
      out(p) = if (acc >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** lshSignature(embedding: array<double>) → nBits-char bucket string for
  * hash table `table`. Static plane constants are resolved once per
  * (table, nBits, dim) and shared across rows/tasks.
  */
case class LshSignatureExpr(child: Expression, table: Int, nBits: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override protected def nullSafeEval(input: Any): Any =
    LshImpls.signature(input.asInstanceOf[ArrayData], table, nBits, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshImpls$$.MODULE$$.signature($c, $table, $nBits, $dim)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
