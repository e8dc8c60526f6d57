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

  // ================== Neo4j HTTP-API row format (server_db.go:455-506) ==

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.ObjectNode
  import scala.jdk.CollectionConverters._

  /** Embedding-vector property names stripped from HTTP node payloads
    * (too large to serialize; metadata like embedding_model stays —
    * server_db.go:965-1000).
    */
  private val embeddingKeys = Set("embedding", "embeddings", "vector",
    "vectors", "_embedding", "_embeddings", "chunk_embedding",
    "chunk_embeddings")

  /** The reference's hashStringToInt64 (server_db.go:1046-1057): Neo4j
    * drivers expect a numeric id in row meta beside the elementId.
    */
  private def hash31(s: String): Long = {
    var h = 0L
    s.foreach(c => h = h * 31 + c)
    if (h < 0) -h else h
  }

  /** Entity properties: the nested `properties` map when present,
    * otherwise the hoisted top-level fields (the planner types frequent
    * properties as real columns) — the reference's map-node fallback
    * "properties might be at top level" (server_db.go:920-934). Metadata
    * keys and embedding vectors are skipped either way.
    */
  private def entityProps(mapper: ObjectMapper, o: ObjectNode,
      metaKeys: Set[String]): JsonNode = {
    val out = mapper.createObjectNode()
    val nested = o.get("properties")
    if (nested != null && nested.isObject)
      nested.fields().asScala.foreach { e =>
        if (!embeddingKeys(e.getKey.toLowerCase)) out.set[JsonNode](e.getKey, e.getValue)
      }
    else
      o.fields().asScala.foreach { e =>
        if (!metaKeys(e.getKey) && !embeddingKeys(e.getKey.toLowerCase))
          out.set[JsonNode](e.getKey, e.getValue)
      }
    out
  }

  /** Convert one value to Neo4j HTTP form
    * (convertValueToNeo4jFormat, server_db.go:838-879): entity structs
    * become elementId-keyed objects (`4:nornicdb:` nodes /
    * `5:nornicdb:` relationships), containers recurse, scalars pass.
    */
  private def neoConvert(mapper: ObjectMapper, n: JsonNode): JsonNode = n match {
    case o: ObjectNode if o.has("elementId") => o // already converted
    case o: ObjectNode if o.has("id") && o.has("type") &&
        o.has("start") && o.has("end") =>
      val out = mapper.createObjectNode()
      out.put("elementId", "5:nornicdb:" + o.get("id").asText())
      out.put("type", o.get("type").asText())
      out.put("startNodeElementId", "4:nornicdb:" + o.get("start").asText())
      out.put("endNodeElementId", "4:nornicdb:" + o.get("end").asText())
      out.set[JsonNode]("properties", entityProps(mapper, o,
        Set("id", "type", "start", "end", "properties", "elementId")))
      out
    case o: ObjectNode if o.has("id") && o.has("labels") =>
      val out = mapper.createObjectNode()
      out.put("elementId", "4:nornicdb:" + o.get("id").asText())
      out.set[JsonNode]("labels",
        Option[JsonNode](o.get("labels")).getOrElse(mapper.createArrayNode()))
      out.set[JsonNode]("properties", entityProps(mapper, o,
        Set("id", "labels", "properties", "elementId")))
      out
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      o.fields().asScala.foreach(e =>
        out.set[JsonNode](e.getKey, neoConvert(mapper, e.getValue)))
      out
    case a if a.isArray =>
      val out = mapper.createArrayNode()
      a.elements().asScala.foreach(e => out.add(neoConvert(mapper, e)))
      out
    case other => other
  }

  /** Per-value row meta (generateRowMeta, server_db.go:1012-1044):
    * `{"id":…,"type":"node"|"relationship","deleted":false,
    * "elementId":…}` for entities, null otherwise.
    */
  private def metaFor(mapper: ObjectMapper, v: JsonNode): JsonNode =
    if (v != null && v.isObject && v.has("elementId")) {
      val eid = v.get("elementId").asText()
      val m = mapper.createObjectNode()
      m.put("id", hash31(eid.stripPrefix("4:nornicdb:").stripPrefix("5:nornicdb:")))
      m.put("type", if (eid.startsWith("5:")) "relationship" else "node")
      m.put("deleted", false)
      m.put("elementId", eid)
      m
    } else mapper.nullNode()

  /** One statement's result in the Neo4j HTTP-API shape the reference
    * serves (server_db.go:773-790): `row` is an ARRAY in column order,
    * `meta` carries entity ids, `stats` appears when the statement asked
    * includeStats. Row JSON is still produced distributed ([[rowsJson]],
    * codegen'd `to_json`); only the bounded collected tail reshapes
    * object → array on the driver.
    */
  def resultObjectNeo4j(df: DataFrame, maxRows: Int = 10000,
      stats: Option[Boolean] = None): String = {
    val mapper = new ObjectMapper()
    val names = df.columns
    val cols = names.map(c => "\"" + c.replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    val data = rowsJson(df).limit(maxRows).collect().map { r =>
      val obj = mapper.readTree(r.getString(0))
      val rowArr = mapper.createArrayNode()
      val metaArr = mapper.createArrayNode()
      names.foreach { c =>
        // to_json omits null struct fields → absent = null
        val v = Option[JsonNode](obj.get(c)).map(neoConvert(mapper, _))
          .getOrElse(mapper.nullNode())
        rowArr.add(v)
        metaArr.add(metaFor(mapper, v))
      }
      s"""{"row":${mapper.writeValueAsString(rowArr)},"meta":${
        mapper.writeValueAsString(metaArr)}}"""
    }
    val statsJson = stats.map(cu =>
      s""","stats":{${if (cu) "\"contains_updates\":true" else ""}}""")
      .getOrElse("")
    s"""{"columns":$cols,"data":[${data.mkString(",")}]$statsJson}"""
  }
}
