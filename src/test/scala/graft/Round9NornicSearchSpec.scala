package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.CypherWrite
import graft.graph.{GraphStore, PropertyGraph}
import graft.sources.{GraphQlServer, Protobuf, QdrantGrpcServer}

/** Round-9: the NornicDB-native gRPC search service
  * (nornicdb_search.proto / search_service.go:58-121) — SearchText frames
  * driven byte-for-byte, cross-checked against the GraphQL `search` field
  * (both delegate to the same hybrid engine).
  */
class Round9NornicSearchSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def call(port: Int, msg: Protobuf.W): Seq[(Int, Array[Byte])] = {
    val resp = client.send(HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:$port/nornicdb.grpc.v1.NornicSearch/SearchText"))
      .header("Content-Type", "application/grpc-web+proto")
      .POST(HttpRequest.BodyPublishers.ofByteArray(
        Protobuf.grpcFrame(0, msg.bytes))).build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(resp.statusCode() == 200)
    Protobuf.grpcFrames(resp.body())
  }
  private def trailerOf(frames: Seq[(Int, Array[Byte])]): String =
    new String(frames.find(_._1 == 0x80).get._2, "UTF-8")
  private def dataOf(frames: Seq[(Int, Array[Byte])]): Seq[Protobuf.Field] =
    Protobuf.fields(frames.find(_._1 == 0).get._2)

  private def seededStore(): GraphStore = {
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    val names = Seq("graph vector search engine", "vector index rebuild",
      "kalman filter streaming", "regional revenue report",
      "search quality evaluation")
    names.zipWithIndex.foreach { case (n, i) =>
      CypherWrite.execute(store,
        s"CREATE (d:Doc {key: ${i + 1}, name: '$n'})")
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = names.zipWithIndex.map { case (n, i) =>
      Row(s"Doc:${i + 1}", "embedding",
        graft.functions.Embedder.current.embed(n))
    }
    import scala.jdk.CollectionConverters._
    store.setNodeVectorProperties(spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("entity_id", StringType),
        StructField("name", StringType),
        StructField("embedding", ArrayType(DoubleType))))))
    store
  }

  test("SearchText: hybrid hits over the wire match the GraphQL search field") {
    val store = seededStore()
    val grpc = QdrantGrpcServer.forStore(store).start()
    val gql = new GraphQlServer(store).start()
    try {
      val frames = call(grpc.boundPort, Protobuf.w()
        .str(2, "vector search").uint(3, 3))
      assert(trailerOf(frames).contains("grpc-status: 0"))
      val data = dataOf(frames)
      assert(Protobuf.find(data, 1).get.str == "rrf_hybrid")
      val hits = Protobuf.all(data, 2).map(_.msg)
      assert(hits.nonEmpty && hits.size <= 3)
      val wireIds = hits.map(h => Protobuf.find(h, 1).get.str)
      // diagnostics: every hit carries a positive score and at least one
      // leg rank; labels round-trip; properties Struct carries name
      hits.foreach { h =>
        assert(Protobuf.find(h, 4).get.floatVal > 0f)
        val vr = Protobuf.find(h, 6).map(_.num).getOrElse(0L)
        val br = Protobuf.find(h, 7).map(_.num).getOrElse(0L)
        assert(vr > 0 || br > 0, "hit missing both leg ranks")
        assert(Protobuf.all(h, 2).map(_.str).contains("Doc"))
        val fields = Protobuf.all(Protobuf.find(h, 3).get.msg, 1).map(_.msg)
        assert(fields.exists(f => Protobuf.find(f, 1).get.str == "name"))
      }
      // cross-check: the GraphQL search field (same engine) agrees on ids
      val gqlResp = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${gql.boundPort}/graphql"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """query { search(query: "vector search", options: {limit: 3}) { results { node { id } } } }"""))
        .build(), HttpResponse.BodyHandlers.ofString()).body()
      wireIds.foreach(id => assert(gqlResp.contains(s""""id":"$id""""),
        s"$id missing from GraphQL search: $gqlResp"))
    } finally { grpc.stop(); gql.stop() }
  }

  test("SearchText falls back to BM25-only when the store has no embeddings") {
    val g = GraphQueries.graph(spark, sf)
    val store = new GraphStore(PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    CypherWrite.execute(store,
      "CREATE (d:Doc {key: 1, name: 'plain text only document'})")
    val grpc = QdrantGrpcServer.forStore(store).start()
    try {
      val frames = call(grpc.boundPort,
        Protobuf.w().str(2, "plain text document").uint(3, 5))
      assert(trailerOf(frames).contains("grpc-status: 0"))
      val data = dataOf(frames)
      assert(Protobuf.find(data, 1).get.str == "fulltext")
      assert(Protobuf.find(data, 3).exists(_.num == 1L)) // fallback_triggered
      assert(Protobuf.all(data, 2).nonEmpty)
      // missing query → INVALID_ARGUMENT
      val bad = call(grpc.boundPort, Protobuf.w().uint(3, 5))
      assert(trailerOf(bad).contains("grpc-status: 3"))
    } finally grpc.stop()
  }
}
