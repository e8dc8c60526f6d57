package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.GraphStore

/** Streaming embedding ingest (SURVEY §2.12): a `readStream` over an
  * embedding source upserts each micro-batch into the store's named
  * node-embedding table via `foreachBatch` — the online index-maintenance
  * path. The reference writes embeddings synchronously on node store
  * (`pkg/storage/types.go:196` NamedEmbeddings + the vector index update
  * hooks); here the same contract is a streaming MERGE: at 100 TB the
  * foreachBatch body is a Delta-style MERGE keyed on (entity_id, name),
  * and vector search over the index sees every completed batch.
  */
object VectorIngest {

  /** Drive the embeddings parquet through a real Structured Streaming
    * query, upserting every micro-batch into `store`'s node embeddings
    * under `embName` with ids `Vec:<vec_id>`. Returns after the stream
    * drains; the store then serves the freshest index state.
    */
  def streamingUpsert(spark: SparkSession, sfDir: String, store: GraphStore,
      embName: String): Unit = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("basePath", sfDir)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(sfDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.setNodeVectorProperties(batch.select(
          concat(lit("Vec:"), col("vec_id")).as("entity_id"),
          lit(embName).as("name"),
          transform(col("embedding"), x => x.cast("double")).as("embedding")))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
