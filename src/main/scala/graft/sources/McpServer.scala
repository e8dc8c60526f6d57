package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Embedder
import graft.graph.GraphStore

/** Thin MCP (Model Context Protocol) endpoint — the memory-graph tool
  * surface (behavioral spec `/root/reference/pkg/mcp/server.go:41-42,
  * 167-196,281-343` and `tools.go:17-356`): JSON-RPC 2.0 over HTTP with
  * `initialize`, `tools/list`, and `tools/call`, plus the REST aliases
  * `/mcp/tools/list` and `/mcp/tools/call`.
  *
  * Tools implemented (the knowledge-graph core four):
  *   - `store(content, type, title, tags)` → node with a deterministic
  *     content-hash id; the content embeds through the pluggable
  *     [[Embedder]] seam into the store's named-embedding table
  *     (server.go:460-530; ids here are FNV-based, not wall-clock, so
  *     snapshot replay stays deterministic).
  *   - `recall(id | type, tags, limit)` → filtered node listing
  *     (server.go:532).
  *   - `discover(query, limit)` → cosine top-k over stored content
  *     embeddings (server.go:613).
  *   - `link(from, to, type)` → relationship (server.go:711).
  *
  * Tool-call results follow the MCP content shape
  * `{"content":[{"type":"text","text":<json>}], "isError":…}`
  * (server.go:395-405). The reference's task/tasks tools are a task-
  * manager layer over the same store — out of engine scope.
  */
final class McpServer(store: GraphStore, port: Int = 0,
    token: Option[String] = None) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  def boundPort: Int = server.getAddress.getPort

  def start(): McpServer = {
    server.createContext("/mcp", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  private def spark = store.snapshot.nodes.sparkSession

  val toolNames = Seq("store", "recall", "discover", "link")

  // ======================================================== dispatch =====

  private def handle(ex: HttpExchange): Unit = {
    try {
      if (!ServerAuth.bearerOk(ex, token)) {
        respond(ex, 401,
          """{"jsonrpc":"2.0","id":null,"error":{"code":-32001,"message":"unauthorized: bearer token required"}}""")
        return
      }
      val path = ex.getRequestURI.getPath
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      path match {
        case "/mcp/tools/list" =>
          respond(ex, 200, toolsJson)
        case "/mcp/tools/call" =>
          // REST alias: {"name": ..., "arguments": {...}}
          respond(ex, 200, callTool(strField(body, "name").getOrElse(""), body))
        case _ => // JSON-RPC 2.0
          val id = rawField(body, "id").getOrElse("null")
          strField(body, "method") match {
            case Some("initialize") =>
              respond(ex, 200, rpcResult(id,
                s"""{"protocolVersion":"2024-11-05","serverInfo":{"name":"graft","version":"0.7"},"capabilities":{"tools":{}}}"""))
            case Some("tools/list") =>
              respond(ex, 200, rpcResult(id, toolsJson))
            case Some("tools/call") =>
              val name = strField(body, "name").getOrElse("")
              respond(ex, 200, rpcResult(id, callTool(name, body)))
            case Some(other) =>
              respond(ex, 200,
                s"""{"jsonrpc":"2.0","id":$id,"error":{"code":-32601,"message":${jstr(s"unknown method $other")}}}""")
            case None =>
              respond(ex, 400,
                s"""{"jsonrpc":"2.0","id":$id,"error":{"code":-32700,"message":"parse error"}}""")
          }
      }
    } catch {
      case e: Exception =>
        respond(ex, 400, s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.toString))}}""")
    }
  }

  private def rpcResult(id: String, result: String): String =
    s"""{"jsonrpc":"2.0","id":$id,"result":$result}"""

  private def toolsJson: String = {
    val tools = Seq(
      ("store", "Store knowledge as a graph node; content embeds for semantic search.",
        """{"type":"object","properties":{"content":{"type":"string"},"type":{"type":"string","default":"memory"},"title":{"type":"string"},"tags":{"type":"array","items":{"type":"string"}}},"required":["content"]}"""),
      ("recall", "Retrieve nodes by id or filter by type/tags.",
        """{"type":"object","properties":{"id":{"type":"string"},"type":{"type":"array","items":{"type":"string"}},"tags":{"type":"array","items":{"type":"string"}},"limit":{"type":"integer","default":10}}}"""),
      ("discover", "Semantic similarity search over stored content.",
        """{"type":"object","properties":{"query":{"type":"string"},"limit":{"type":"integer","default":10}},"required":["query"]}"""),
      ("link", "Create a relationship between two stored nodes.",
        """{"type":"object","properties":{"from":{"type":"string"},"to":{"type":"string"},"type":{"type":"string","default":"RELATES_TO"}},"required":["from","to"]}"""))
    val objs = tools.map { case (n, d, schema) =>
      s"""{"name":"$n","description":${jstr(d)},"inputSchema":$schema}"""
    }
    s"""{"tools":[${objs.mkString(",")}]}"""
  }

  private def callTool(name: String, body: String): String =
    try {
      val json = name match {
        case "store" => storeTool(body)
        case "recall" => recallTool(body)
        case "discover" => discoverTool(body)
        case "link" => linkTool(body)
        case other => throw new IllegalArgumentException(s"unknown tool $other")
      }
      s"""{"content":[{"type":"text","text":${jstr(json)}}],"isError":false}"""
    } catch {
      case e: Exception =>
        s"""{"content":[{"type":"text","text":${jstr(
          Option(e.getMessage).getOrElse(e.toString))}}],"isError":true}"""
    }

  // ========================================================== tools ======

  private def nodeSchema: StructType = store.snapshot.nodes.schema

  private def storeTool(body: String): String = {
    val content = strField(body, "content").getOrElse(
      throw new IllegalArgumentException("content is required"))
    val nodeType = strField(body, "type").getOrElse("memory").capitalize
    val title = strField(body, "title").getOrElse(content.take(100))
    val tags = strArray(body, "tags")
    // deterministic content-hash id (no wall-clock — replay-safe)
    val key = PackStream.hashStringToInt64(content)
    val id = s"$nodeType:$key"
    val props = Map("key" -> key.toString, "title" -> title,
      "content" -> content) ++
      (if (tags.nonEmpty) Map("tags" -> tags.mkString(",")) else Map.empty)
    val base: Map[String, Any] = Map("id" -> id, "labels" -> Seq(nodeType),
      "properties" -> props)
    val row = Row.fromSeq(nodeSchema.fields.toSeq.map { f =>
      base.get(f.name).getOrElse(f.name match {
        case "key" => key
        case "name" => title
        case _ => null
      })
    })
    store.createNodes(spark.createDataFrame(
      java.util.Collections.singletonList(row), nodeSchema))
    val emb = Embedder.current.embed(content)
    store.setNodeVectorProperties(spark.createDataFrame(
      java.util.Collections.singletonList(Row(id, "content",
        emb.toArray.toSeq)),
      StructType(Seq(StructField("entity_id", StringType),
        StructField("name", StringType),
        StructField("embedding", ArrayType(DoubleType))))))
    s"""{"id":"$id","title":${jstr(title)},"embedded":true}"""
  }

  private def recallTool(body: String): String = {
    val limit = intField(body, "limit").getOrElse(10)
    val nodes = store.snapshot.nodes
    val byId = strField(body, "id")
    val types = strArray(body, "type")
    val tags = strArray(body, "tags")
    var df = nodes
    byId.foreach(i => df = df.filter(col("id") === i))
    if (types.nonEmpty)
      df = df.filter(types.map(t => array_contains(col("labels"), t.capitalize))
        .reduce(_ || _))
    // ALL specified tags must be present (server.go recall contract)
    tags.foreach { t =>
      df = df.filter(array_contains(
        split(coalesce(element_at(col("properties"), "tags"), lit("")), ","), t))
    }
    val rows = df.select(col("id"),
        coalesce(element_at(col("properties"), "title"), col("name")).as("title"))
      .orderBy("id").limit(limit).collect()
    s"""{"nodes":[${rows.map(r =>
      s"""{"id":${jstr(r.getString(0))},"title":${jstr(
        Option(r.getString(1)).getOrElse(""))}}""").mkString(",")}],"count":${rows.length}}"""
  }

  private def discoverTool(body: String): String = {
    val query = strField(body, "query").getOrElse(
      throw new IllegalArgumentException("query is required"))
    val limit = intField(body, "limit").getOrElse(10)
    val qv = Embedder.current.embed(query)
    val qe = array(qv.map(lit): _*)
    val rows = store.nodeEmbeddings.filter(col("name") === "content")
      .withColumn("score",
        aggregate(zip_with(col("embedding"), qe, (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
      .orderBy(col("score").desc, col("entity_id").asc)
      .limit(limit)
      .select("entity_id", "score").collect()
    s"""{"matches":[${rows.map(r =>
      s"""{"id":${jstr(r.getString(0))},"score":${r.getDouble(1)}}""").mkString(",")}]}"""
  }

  private def linkTool(body: String): String = {
    val from = strField(body, "from").getOrElse(
      throw new IllegalArgumentException("from is required"))
    val to = strField(body, "to").getOrElse(
      throw new IllegalArgumentException("to is required"))
    val relType = strField(body, "type").getOrElse("RELATES_TO")
    val es = store.snapshot.edges.schema
    val base: Map[String, Any] = Map(
      "id" -> s"$relType|$from|$to", "src" -> from, "dst" -> to,
      "rel_type" -> relType, "weight" -> 1.0,
      "properties" -> Map.empty[String, String])
    val row = Row.fromSeq(es.fields.toSeq.map(f => base.get(f.name).orNull))
    store.createEdges(spark.createDataFrame(
      java.util.Collections.singletonList(row), es))
    s"""{"from":"$from","to":"$to","type":"$relType","created":true}"""
  }

  // ================================================== tiny JSON lite =====

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def strField(body: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(body).map(m => m.group(1)
        .replace("\\\"", "\"").replace("\\n", "\n").replace("\\\\", "\\"))

  private def rawField(body: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*([0-9]+|\"[^\"]*\"|null)").r
      .findFirstMatchIn(body).map(_.group(1))

  private def intField(body: String, key: String): Option[Int] =
    ("\"" + key + "\"\\s*:\\s*(-?[0-9]+)").r
      .findFirstMatchIn(body).map(_.group(1).toInt)

  private def strArray(body: String, key: String): Seq[String] =
    ("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
      .findFirstMatchIn(body).map(_.group(1)).toSeq
      .flatMap(inner => "\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(inner).map(_.group(1)))

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
