package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Result serialization layer (SURVEY §3.2: the Neo4j HTTP transaction API,
  * `/root/reference/pkg/server/server_db.go:757,1117` returns
  * `{"results":[{"columns":[…],"data":[{"row":…}…]}]}`; Bolt streams the
  * same records as PackStream, `pkg/bolt/server.go:1333`).
  *
  * The per-row payload is produced DISTRIBUTED (`to_json` per row,
  * codegen'd); only the protocol envelope — by definition the single-client
  * sink — is assembled on the driver, bounded by `limit`. A 100 TB result
  * is exported with [[rowsJson]] + `df.write` instead of the envelope.
  */
object ResultJson {

  /** One JSON object per result row, keyed by column name. */
  def rowsJson(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("row_json"))

  /** Lossless inverse of [[rowsJson]] given the original schema. */
  def parseRows(jsonDf: DataFrame, schema: StructType): DataFrame =
    jsonDf.select(from_json(col("row_json"), schema).as("r")).select("r.*")

  /** One statement's result object `{"columns":…,"data":[{"row":…}…]}`
    * (the element of the envelope's `results` array).
    */
  def resultObject(df: DataFrame, maxRows: Int = 10000): String = {
    val cols = df.columns.map(c => "\"" + c.replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    val rows = rowsJson(df).limit(maxRows).collect()
      .map(r => "{\"row\":" + r.getString(0) + "}")
    s"""{"columns":$cols,"data":[${rows.mkString(",")}]}"""
  }

  /** HTTP transaction-API response envelope (single statement, driver-side
    * tail: the client connection is the bottleneck, not this concat).
    */
  def envelope(df: DataFrame, maxRows: Int = 10000): String =
    s"""{"results":[${resultObject(df, maxRows)}],"errors":[]}"""
}
