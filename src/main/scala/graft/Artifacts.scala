package graft

import org.apache.spark.sql.SparkSession

/** Shared root for persisted derived artifacts (ANN ground truths,
  * bucketed warehouse layouts). Rides the session conf so a deployment
  * points it at durable shared storage (object store / DFS at cluster
  * scale); the env var and /tmp default serve the local harness.
  */
object Artifacts {
  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.artifactDir")
      .orElse(sys.env.get("GRAFT_ARTIFACT_DIR"))
      .getOrElse("/tmp/graft_artifacts")
}
