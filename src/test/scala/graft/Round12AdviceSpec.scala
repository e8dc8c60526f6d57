package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.{HttpTxServer, RequestValidation => RV}

/** Round-12 ADVICE fixes: environment-derived SSRF mode actually reaches
  * the guards, malformed percent-encoding answers 400 (never a 500 /
  * dropped connection), keyed upserts neither trip unique constraints on
  * their own replaced rows nor count replaces against max_nodes, and the
  * gRPC surface takes bodies past the 10 MB HTTP cap.
  */
class Round12AdviceSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def emptyStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
  }

  private def get(url: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("isDev derives from the configured environment like the reference") {
    assert(RV.isDev("development") && RV.isDev("dev") && RV.isDev("") && RV.isDev(null))
    assert(!RV.isDev("production") && !RV.isDev("staging") && !RV.isDev("Production"))
  }

  test("production server refuses private-host url params; dev server allows them") {
    val prod = new HttpTxServer(emptyStore(), isDevelopment = false).start()
    val dev = new HttpTxServer(emptyStore()).start()
    try {
      val (ps, pb) = get(s"http://127.0.0.1:${prod.boundPort}/health" +
        "?url=http://localhost:9999/cb")
      assert(ps == 400 && pb.contains("not allowed in production"), s"$ps $pb")
      val (ds, _) = get(s"http://127.0.0.1:${dev.boundPort}/health" +
        "?url=http://localhost:9999/cb")
      assert(ds == 200)
      // production still serves clean traffic
      val (ok, _) = get(s"http://127.0.0.1:${prod.boundPort}/health")
      assert(ok == 200)
    } finally { prod.stop(); dev.stop() }
  }

  test("malformed percent-encoding in the query string answers 400, not 500") {
    val server = new HttpTxServer(emptyStore()).start()
    try {
      // raw socket: java.net.URI refuses the malformed escape client-side
      def rawGet(pathQuery: String): (Int, String) = {
        val s = new java.net.Socket("127.0.0.1", server.boundPort)
        try {
          s.getOutputStream.write(
            (s"GET $pathQuery HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n").getBytes)
          s.getOutputStream.flush()
          val all = new String(s.getInputStream.readAllBytes())
          (all.split(" ")(1).toInt, all)
        } finally s.close()
      }
      // end-to-end the client must see a 400 refusal (the JDK listener
      // happens to pre-reject this form; a transport that didn't would
      // hit the middleware's own refusal, asserted below)
      val (s1, _) = rawGet("/health?x=%zz")
      assert(s1 == 400)
      val (s2, _) = rawGet("/health?x=%20ok")
      assert(s2 == 200)
      // the middleware itself refuses rather than throwing
      assert(RV.decodeQuery("x=%zz") == Left("invalid query string"))
      assert(RV.decodeQuery("x=%") == Left("invalid query string"))
      assert(RV.decodeQuery("a=1&b=%20c") == Right(Map("a" -> "1", "b" -> " c")))
    } finally server.stop()
  }

  test("re-upserting an existing row under a unique constraint succeeds " +
      "(replaced rows are not clashes)") {
    val store = emptyStore()
    graft.cypher.CypherDdl.tryExecute(store,
      "CREATE CONSTRAINT consent_subj FOR (c:Consent) REQUIRE c.subject IS UNIQUE")
    val sp = spark
    import sp.implicits._
    def consentRow(granted: String) = Seq(("consent:1", granted)).toDF("id", "granted")
      .select(col("id"), array(lit("Consent")).as("labels"),
        map(lit("subject"), lit("user-7"), lit("granted"), col("granted"))
          .as("properties"))
    store.upsertNodes(consentRow("true"))
    // same id, same unique subject value — a replace, not a clash
    store.upsertNodes(consentRow("false"))
    val props = store.snapshot.nodes.filter(col("id") === "consent:1")
      .select(element_at(col("properties"), "granted")).collect()
    assert(props.length == 1 && props.head.getString(0) == "false")
    // a DIFFERENT id reusing the subject value must still refuse
    val clash = intercept[Exception] {
      store.upsertNodes(Seq(("consent:2", "true")).toDF("id", "granted")
        .select(col("id"), array(lit("Consent")).as("labels"),
          map(lit("subject"), lit("user-7")).as("properties")))
    }
    assert(clash.getMessage.contains("unique constraint"))
  }

  test("pure replace at the max_nodes boundary is not refused") {
    val store = emptyStore()
    val sp = spark
    import sp.implicits._
    def node(id: String, v: String) = Seq((id, v)).toDF("id", "v")
      .select(col("id"), array(lit("N")).as("labels"),
        map(lit("v"), col("v")).as("properties"))
    store.setStorageLimits(maxNodes = 2)
    store.upsertNodes(node("a", "1"))
    store.upsertNodes(node("b", "1"))
    store.upsertNodes(node("a", "2")) // at the cap, but net-new = 0
    assert(store.snapshot.nodes.count() == 2)
    val over = intercept[IllegalStateException] { store.upsertNodes(node("c", "1")) }
    assert(over.getMessage.contains("max_nodes"))
  }

  test("gRPC guard accepts declared bodies past the 10 MB HTTP cap, " +
      "HTTP guard still refuses them") {
    assert(RV.GrpcMaxBodyBytes > RV.MaxBodyBytes)
    var served = 0
    val h: com.sun.net.httpserver.HttpExchange => Unit = { ex =>
      served += 1
      ex.getRequestBody.readAllBytes() // consume so close() never blocks
      ex.sendResponseHeaders(200, -1); ex.close()
    }
    // synthetic exchanges via a throwaway listener: one guard per surface
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    srv.createContext("/grpc", (ex: com.sun.net.httpserver.HttpExchange) =>
      RV.guard(RV.GrpcTypes, true, RV.GrpcMaxBodyBytes)(h)(ex))
    srv.createContext("/http", (ex: com.sun.net.httpserver.HttpExchange) =>
      RV.guard(RV.JsonTypes)(h)(ex))
    srv.start()
    try {
      val payload = new Array[Byte]((RV.MaxBodyBytes + 1).toInt)
      def post(path: String): Int = {
        val r = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.getAddress.getPort}$path"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofByteArray(payload)).build(),
          HttpResponse.BodyHandlers.ofString())
        r.statusCode()
      }
      assert(post("/http") == 413) // the HTTP cap still refuses >10 MB
      assert(post("/grpc") == 200) // the gRPC cap admits the same body
      assert(served == 1)
    } finally srv.stop(0)
  }
}
