package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard config.
  *
  * Tuned for the driver's local[32] harness but cluster-safe: AQE on (runtime
  * shuffle-partition coalescing + skew-join splitting), broadcast threshold
  * raised so every TESTDATA dimension table broadcasts, shuffle partitions
  * sized for the local core count rather than the 200 default.
  */
object GraftSession {
  def builder(master: String = "local[*]", cpus: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Cypher/APOC map semantics: duplicate keys resolve to the LAST
      // value (Go map overwrite), not an ANSI error
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // compress serialized RDD blocks (disk spill of the MEMORY_AND_DISK
      // graph/ctx caches): boxed-long graph RDDs shrink 3-6× under lz4,
      // bounding per-executor spill dirs at scale (round-14 sf10 lesson)
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
