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
    val Array(sfDir, outFile) = args
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    auditQueries.foreach { name =>
      val df = QueryRegistry.queryFns(name)(spark, sfDir)
      sb.append(s"\n===== $name =====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    spark.stop()
  }
}
