package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Memory-decay scoring, the reference's background re-scoring loop
  * (`/root/reference/pkg/decay/decay.go:144-152,503`): exponential
  * half-life decay per memory tier plus a logarithmic access-frequency
  * boost. Here it is a pure column expression — a scheduled batch job at
  * scale is one `withColumn` over the nodes table, embarrassingly parallel.
  */
object Decay {

  /** Tier half-lives in days (short/medium/long — decay.go:144-152). */
  val halfLives: Map[String, Double] = Map(
    "short" -> 7.0, "medium" -> 69.0, "long" -> 693.0)

  /** score = 2^(−age_days / halfLife), rounded for cross-engine hashing. */
  def decayScore(ageDays: Column, halfLifeDays: Column): Column =
    round(pow(lit(2.0), -ageDays.cast("double") / halfLifeDays), 9)

  /** Access boost: 1 + ln(1 + accessCount)/10 (decay.go:503 flavor). */
  def accessBoost(accessCount: Column): Column =
    round(lit(1.0) + log(lit(1.0) + accessCount.cast("double")) / 10.0, 9)

  def tierHalfLife(tier: Column): Column =
    when(tier === "short", 7.0).when(tier === "medium", 69.0).otherwise(693.0)
}
