package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document chunking — the reference's embed-queue text splitter
  * (`/root/reference/pkg/nornicdb/embed_queue.go:856-897` `chunkText`,
  * defaults ChunkSize=512 / ChunkOverlap=50 at `embed_queue.go:65-67`):
  * fixed-size character windows that prefer to break at a paragraph
  * (`\n\n`), then a sentence (`. `), then a word boundary — whichever
  * last occurs past the window's midpoint — stepping forward by
  * (end − overlap). Multi-chunk nodes index every chunk as
  * `<id>-chunk-<i>` alongside the node id (`pkg/search/search.go:687`),
  * enabling granular chunk-level search with node-level grouping.
  *
  * Faithful to the reference INCLUDING its tail quirk: for texts longer
  * than one window the final step re-emits the last `overlap` characters
  * as a short trailing chunk (the Go loop's `nextStart = end − overlap`
  * lands before `len(text)` once more after the last full window).
  *
  * Index arithmetic is on UTF-16 chars where Go slices bytes — identical
  * for ASCII corpora (the oracle replays char-indexed; disclosed).
  *
  * 100 TB shape: chunking is one generated-code pass (no shuffle); the
  * exploded chunk table partitions by doc like any fact table, and the
  * chunk-embedding join inherits the vector-search bucketing paths.
  */
object ChunkImpls {
  /** Codegen entry: UTF8String in, Catalyst array out (janino-friendly —
    * no lambdas in generated code, one static call).
    */
  def chunkTextU(text: UTF8String, size: Int, overlap: Int): GenericArrayData =
    new GenericArrayData(
      chunkText(text.toString, size, overlap).map(UTF8String.fromString(_)))

  /** Exact port of `chunkText` (embed_queue.go:856). */
  def chunkText(text: String, size: Int, overlap: Int): Array[String] = {
    if (text.length <= size) return Array(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < text.length) {
      var end = math.min(start + size, text.length)
      if (end < text.length) {
        val chunk = text.substring(start, end)
        val para = chunk.lastIndexOf("\n\n")
        val sent = chunk.lastIndexOf(". ")
        val word = chunk.lastIndexOf(" ")
        if (para > size / 2) end = start + para
        else if (sent > size / 2) end = start + sent + 1
        else if (word > size / 2) end = start + word
      }
      out += text.substring(start, end)
      var next = end - overlap
      if (next <= start) next = end
      start = next
    }
    out.toArray
  }
}

/** ARRAY<STRING> of chunks for (text, size, overlap) — codegen'd single
  * JVM call per row (the boundary scan is an imperative loop no SQL HOF
  * expresses).
  */
case class ChunkTextExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  override protected def nullSafeEval(t: Any, s: Any, o: Any): Any =
    ChunkImpls.chunkTextU(t.asInstanceOf[UTF8String],
      s.asInstanceOf[Int], o.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s, o) =>
      s"graft.operators.ChunkImpls$$.MODULE$$.chunkTextU($t, $s, $o)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

object Chunker {

  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def ensure(spark: SparkSession): Unit = {
    if (registered.contains(spark)) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_chunk_text", a => ChunkTextExpr(a(0), a(1), a(2)), "built-in")
    registered.add(spark)
  }

  def chunkCol(text: Column, size: Int, overlap: Int): Column =
    call_function("graft_chunk_text", text, lit(size), lit(overlap))

  /** Exploded chunk table: (doc_id, chunk_idx, chunk_id, chunk). */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String,
      size: Int, overlap: Int): DataFrame = {
    ensure(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
        posexplode(chunkCol(col(textCol), size, overlap)).as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_id",
        concat(col("doc_id").cast("string"), lit("-chunk-"), col("chunk_idx")))
      .select("doc_id", "chunk_idx", "chunk_id", "chunk")
  }

  /** Chunk-level text search with node-level grouping (`search.go:687`
    * granular tier): embed every chunk via the pluggable
    * [[graft.functions.Embedder]] seam (default: the disclosed TextEmbed
    * projection), score against the query text's embedding, and keep
    * each doc's best chunk — max-sim aggregation, one shuffle.
    */
  def searchChunks(docs: DataFrame, queryText: String, k: Int,
      size: Int, overlap: Int): DataFrame = {
    val spark = docs.sparkSession
    val embedder = graft.functions.Embedder.current
    val chunks = chunkDocs(docs, "text", "doc_id", size, overlap)
      .withColumn("emb", embedder.embedCol(spark, col("chunk")))
    val qv = embedder.embed(queryText)
    val qe = array(qv.map(lit): _*)
    val scored = chunks.withColumn("score",
      round(aggregate(zip_with(col("emb"), qe, (x, y) => (x * y).cast("decimal(38,18)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)"),
        (acc, x) => (acc + x).cast("decimal(38,18)")).cast("double"), 12))
    scored.groupBy("doc_id")
      .agg(max(struct(col("score"), col("chunk_id"))).as("best"))
      .select(col("doc_id"), col("best.chunk_id").as("chunk_id"),
        col("best.score").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
