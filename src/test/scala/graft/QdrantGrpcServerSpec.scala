package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.search.QdrantPoints
import graft.search.QdrantPoints.Filter
import graft.sources.{Protobuf, QdrantGrpcServer}

/** Integration: real gRPC-Web frames (5-byte framing + protobuf messages
  * with the upstream qdrant field numbers) against the wire server, the
  * way BoltServerSpec drives PackStream byte-for-byte. Results are
  * cross-checked against the QdrantPoints engines directly.
  */
class QdrantGrpcServerSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()
  private val dim = 64

  private def call(port: Int, method: String, msg: Protobuf.W,
      bearer: Option[String] = None): Seq[(Int, Array[Byte])] = {
    val b = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/qdrant.Points/$method"))
      .header("Content-Type", "application/grpc-web+proto")
      .POST(HttpRequest.BodyPublishers.ofByteArray(Protobuf.grpcFrame(0, msg.bytes)))
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    assert(resp.statusCode() == 200)
    Protobuf.grpcFrames(resp.body())
  }

  private def trailerOf(frames: Seq[(Int, Array[Byte])]): String =
    new String(frames.find(_._1 == 0x80).get._2, "UTF-8")
  private def dataOf(frames: Seq[(Int, Array[Byte])]): Seq[Protobuf.Field] =
    Protobuf.fields(frames.find(_._1 == 0).get._2)

  // Condition{1 field{1 key, 2 match{2 integer}}} inside Filter{2 must}
  private def mustIntEq(key: String, v: Long): Protobuf.W =
    Protobuf.w().msg(2, Protobuf.w().msg(1,
      Protobuf.w().str(1, key).msg(2, Protobuf.w().uint(2, v))))

  private val qv: Seq[Float] =
    (0 until dim).map(i => if (i % 7 == 0) 1.0f else 0.25f)

  test("Search: filtered top-k with payload matches the engine; trailers say status 0") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts).start()
    try {
      val req = Protobuf.w()
        .str(1, "embeddings")
        .packedFloats(2, qv)
        .msg(3, mustIntEq("label", 1))
        .uint(4, 5)
        .msg(6, Protobuf.w().bool(1, true)) // with_payload { enable: true }
      val frames = call(server.boundPort, "Search", req)
      assert(trailerOf(frames).contains("grpc-status: 0"))
      val hits = Protobuf.all(dataOf(frames), 1).map(_.msg)
      val expected = QdrantPoints.search(pts, "vec_id", "embedding",
        qv.map(_.toDouble), 5, Filter(must = Seq(col("label") === 1)))
        .collect().map(r => (r.getAs[Number](0).longValue(), r.getDouble(1)))
      assert(hits.size == expected.length && expected.nonEmpty)
      hits.zip(expected).foreach { case (h, (eid, escore)) =>
        val id = Protobuf.find(Protobuf.find(h, 1).get.msg, 1).get.num
        val score = Protobuf.find(h, 3).get.floatVal
        assert(id == eid, s"wire id $id != engine id $eid")
        assert(math.abs(score - escore) < 1e-6, s"score $score != $escore")
        // payload carries the label payload field as integer_value 1
        val payloadEntries = Protobuf.all(h, 2).map(_.msg)
        val labelEntry = payloadEntries.find(e =>
          Protobuf.find(e, 1).exists(_.str == "label")).get
        val v = Protobuf.find(labelEntry, 2).get.msg
        assert(Protobuf.find(v, 3).map(_.num).contains(1L))
      }
    } finally server.stop()
  }

  test("Count and Scroll match the engine; scroll next_page_offset is the page's last id") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts).start()
    try {
      val p = server.boundPort
      // CountPoints{1 collection, 2 filter}
      val cnt = call(p, "Count", Protobuf.w()
        .str(1, "embeddings").msg(2, mustIntEq("label", 1)))
      val cntVal = Protobuf.find(
        Protobuf.find(dataOf(cnt), 1).get.msg, 1).get.num
      val expectedCnt = pts.filter(col("label") === 1).count()
      assert(cntVal == expectedCnt && expectedCnt > 0)

      // ScrollPoints{1 collection, 2 filter, 3 offset(PointId), 4 limit}
      val scr = call(p, "Scroll", Protobuf.w()
        .str(1, "embeddings")
        .msg(2, mustIntEq("label", 0))
        .msg(3, Protobuf.w().uint(1, 100))
        .uint(4, 10))
      val data = dataOf(scr)
      val ids = Protobuf.all(data, 2).map(rp =>
        Protobuf.find(Protobuf.find(rp.msg, 1).get.msg, 1).get.num)
      val engineIds = QdrantPoints.scroll(pts, "vec_id",
        Filter(must = Seq(col("label") === 0)), Some(100L), 10)
        .collect().map(_.getAs[Number](0).longValue()).toSeq
      assert(ids == engineIds && ids.size == 10)
      // reference semantics: next offset echoes the page's LAST id when
      // more rows remain (points_service.go:476-481)
      val next = Protobuf.find(data, 1).map(n => Protobuf.find(n.msg, 1).get.num)
      assert(next.contains(ids.last))
      // scroll rows carry payload
      val firstPayload = Protobuf.all(Protobuf.all(data, 2).head.msg, 2)
      assert(firstPayload.nonEmpty)
    } finally server.stop()
  }

  test("Recommend resolves example ids and matches the engine's literal-vector path") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts).start()
    try {
      val req = Protobuf.w()
        .str(1, "embeddings")
        .msg(2, Protobuf.w().uint(1, 0)) // positive: point 0
        .msg(2, Protobuf.w().uint(1, 2)) // positive: point 2
        .msg(3, Protobuf.w().uint(1, 1)) // negative: point 1
        .uint(5, 5)
      val frames = call(server.boundPort, "Recommend", req)
      assert(trailerOf(frames).contains("grpc-status: 0"))
      val hits = Protobuf.all(dataOf(frames), 1).map(_.msg)
      def vecOf(id: Long): Seq[Double] =
        pts.filter(col("vec_id") === id).select("embedding").collect()
          .head.getSeq[Number](0).map(_.doubleValue()).toSeq
      val expected = QdrantPoints.recommend(pts, "vec_id", "embedding",
        Seq(vecOf(0), vecOf(2)), Seq(vecOf(1)), 5)
        .collect().map(r => (r.getAs[Number](0).longValue(), r.getDouble(1)))
      assert(hits.size == expected.length && expected.nonEmpty)
      hits.zip(expected).foreach { case (h, (eid, escore)) =>
        val id = Protobuf.find(Protobuf.find(h, 1).get.msg, 1).get.num
        assert(id == eid)
        assert(math.abs(Protobuf.find(h, 3).get.floatVal - escore) < 1e-6)
      }
      // unknown example id → INVALID_ARGUMENT trailer, not a crash
      val bad = call(server.boundPort, "Recommend", Protobuf.w()
        .str(1, "embeddings").msg(2, Protobuf.w().uint(1, 999999999L)).uint(5, 3))
      assert(trailerOf(bad).contains("grpc-status: 3"))
    } finally server.stop()
  }

  test("SearchBatch and SearchGroups match the engines over the wire") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts).start()
    try {
      val p = server.boundPort
      val qv2: Seq[Float] = (0 until dim).map(i => if (i < 8) 1.0f else 0.0f)
      // SearchBatchPoints{1 collection, 2 search_points{2 vector, 4 limit}}
      val batch = call(p, "SearchBatch", Protobuf.w()
        .str(1, "embeddings")
        .msg(2, Protobuf.w().str(1, "embeddings").packedFloats(2, qv).uint(4, 3))
        .msg(2, Protobuf.w().str(1, "embeddings").packedFloats(2, qv2).uint(4, 2)))
      assert(trailerOf(batch).contains("grpc-status: 0"))
      val results = Protobuf.all(dataOf(batch), 1).map(_.msg)
      assert(results.size == 2)
      val engine = QdrantPoints.searchBatch(pts, "vec_id", "embedding",
        Seq(qv.map(_.toDouble), qv2.map(_.toDouble)), 3).collect()
        .groupBy(_.getInt(0))
      Seq(3, 2).zipWithIndex.foreach { case (lim, qi) =>
        val wireIds = Protobuf.all(results(qi), 1).map(sp =>
          Protobuf.find(Protobuf.find(sp.msg, 1).get.msg, 1).get.num)
        val engIds = engine(qi).sortBy(-_.getDouble(2)).take(lim)
          .map(_.getAs[Number](1).longValue()).toSeq
        assert(wireIds == engIds, s"batch $qi: $wireIds != $engIds")
      }

      // SearchPointGroups{…, 4 limit(groups), 10 group_by, 11 group_size}
      val grp = call(p, "SearchGroups", Protobuf.w()
        .str(1, "embeddings").packedFloats(2, qv)
        .uint(4, 2).str(10, "label").uint(11, 3))
      val groupsMsg = Protobuf.find(dataOf(grp), 1).get.msg
      val groups = Protobuf.all(groupsMsg, 1).map(_.msg)
      val engineGroups = QdrantPoints.searchGroups(pts, "vec_id", "embedding",
        qv.map(_.toDouble), "label", 2, 3).collect()
        .groupBy(_.getString(0))
      assert(groups.size == engineGroups.size && groups.nonEmpty)
      groups.foreach { g =>
        val key = Protobuf.find(Protobuf.find(g, 1).get.msg, 3).get.str
        val hitIds = Protobuf.all(g, 2).map(sp =>
          Protobuf.find(Protobuf.find(sp.msg, 1).get.msg, 1).get.num)
        val engIds = engineGroups(key).sortBy(-_.getDouble(2))
          .map(_.getAs[Number](1).longValue()).toSeq
        assert(hitIds == engIds, s"group $key: $hitIds != $engIds")
      }
    } finally server.stop()
  }

  test("Collections registry: create/list/exists/delete; unknown collection is NOT_FOUND") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts).start()
    try {
      val p = server.boundPort
      // search against an unknown collection → grpc-status 5
      val missing = call(p, "Search", Protobuf.w()
        .str(1, "nope").packedFloats(2, qv).uint(4, 3))
      assert(trailerOf(missing).contains("grpc-status: 5"))

      // default collection listed; create/exists/delete lifecycle
      def names(): Seq[String] = {
        val frames = client.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:$p/qdrant.Collections/List"))
          .header("Content-Type", "application/grpc-web+proto")
          .POST(HttpRequest.BodyPublishers.ofByteArray(
            Protobuf.grpcFrame(0, Protobuf.w().bytes))).build(),
          HttpResponse.BodyHandlers.ofByteArray())
        Protobuf.all(Protobuf.fields(
          Protobuf.grpcFrames(frames.body()).find(_._1 == 0).get._2), 1)
          .map(d => Protobuf.find(d.msg, 1).get.str)
      }
      assert(names() == Seq("embeddings"))
      val created = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p/qdrant.Collections/Create"))
        .header("Content-Type", "application/grpc-web+proto")
        .POST(HttpRequest.BodyPublishers.ofByteArray(Protobuf.grpcFrame(0,
          Protobuf.w().str(1, "docs").bytes))).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(new String(Protobuf.grpcFrames(created.body())
        .find(_._1 == 0x80).get._2, "UTF-8").contains("grpc-status: 0"))
      assert(names() == Seq("docs", "embeddings"))
      // route manually since call() targets /qdrant.Points
      val ex2 = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p/qdrant.Collections/CollectionExists"))
        .header("Content-Type", "application/grpc-web+proto")
        .POST(HttpRequest.BodyPublishers.ofByteArray(Protobuf.grpcFrame(0,
          Protobuf.w().str(1, "docs").bytes))).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      val existsMsg = Protobuf.fields(
        Protobuf.grpcFrames(ex2.body()).find(_._1 == 0).get._2)
      assert(Protobuf.find(Protobuf.find(existsMsg, 1).get.msg, 1)
        .exists(_.num == 1L))
      val del = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p/qdrant.Collections/Delete"))
        .header("Content-Type", "application/grpc-web+proto")
        .POST(HttpRequest.BodyPublishers.ofByteArray(Protobuf.grpcFrame(0,
          Protobuf.w().str(1, "docs").bytes))).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(new String(Protobuf.grpcFrames(del.body())
        .find(_._1 == 0x80).get._2, "UTF-8").contains("grpc-status: 0"))
      assert(names() == Seq("embeddings"))
    } finally server.stop()
  }

  test("store-backed lifecycle: upsert, search sees the writes, get, delete") {
    val g = GraphQueries.graph(spark, sf)
    val store = new graft.graph.GraphStore(graft.graph.PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    val server = QdrantGrpcServer.forStore(store, collection = "points").start()
    try {
      val p = server.boundPort
      def pointStruct(id: Long, vec: Seq[Float], payload: (String, String)*): Protobuf.W = {
        val ps = Protobuf.w().msg(1, Protobuf.w().uint(1, id))
        payload.foreach { case (k, v) =>
          ps.msg(3, Protobuf.w().str(1, k).msg(2, Protobuf.w().str(4, v)))
        }
        ps.msg(4, Protobuf.w().msg(1, Protobuf.w().packedFloats(1, vec)))
      }
      // Upsert three points with orthogonal-ish vectors
      val up = call(p, "Upsert", Protobuf.w().str(1, "points")
        .msg(3, pointStruct(1, Seq(1f, 0f, 0f), "name" -> "alpha", "kind" -> "a"))
        .msg(3, pointStruct(2, Seq(0f, 1f, 0f), "name" -> "beta", "kind" -> "b"))
        .msg(3, pointStruct(3, Seq(0f, 0f, 1f), "name" -> "gamma", "kind" -> "a")))
      assert(trailerOf(up).contains("grpc-status: 0"), new String(up.head._2))
      // UpdateResult status = 2 (Completed)
      assert(Protobuf.find(Protobuf.find(dataOf(up), 1).get.msg, 2)
        .exists(_.num == 2L))

      // Search: query along [1,0,0] ranks point 1 first; payload returned
      val sr = call(p, "Search", Protobuf.w().str(1, "points")
        .packedFloats(2, Seq(1f, 0f, 0f)).uint(4, 2)
        .msg(6, Protobuf.w().bool(1, true)))
      val hits = Protobuf.all(dataOf(sr), 1).map(_.msg)
      assert(hits.nonEmpty)
      val topId = Protobuf.find(Protobuf.find(hits.head, 1).get.msg, 1).get.num
      assert(topId == 1L, s"expected point 1 first, got $topId")
      val payloadKeys = Protobuf.all(hits.head, 2).map(e =>
        Protobuf.find(e.msg, 1).get.str)
      assert(payloadKeys.contains("name") && payloadKeys.contains("kind"))

      // Upsert overwrite: point 1's payload changes, search sees it
      val up2 = call(p, "Upsert", Protobuf.w().str(1, "points")
        .msg(3, pointStruct(1, Seq(1f, 0f, 0f), "name" -> "alpha2", "kind" -> "a")))
      assert(trailerOf(up2).contains("grpc-status: 0"))
      val got = call(p, "Get", Protobuf.w().str(1, "points")
        .msg(2, Protobuf.w().uint(1, 1)))
      val rp = Protobuf.all(dataOf(got), 1).head.msg
      val nameVal = Protobuf.all(rp, 2).map(_.msg).find(e =>
        Protobuf.find(e, 1).exists(_.str == "name")).flatMap(e =>
        Protobuf.find(Protobuf.find(e, 2).get.msg, 4).map(_.str))
      assert(nameVal.contains("alpha2"), s"payload after overwrite: $nameVal")

      // Count, then Delete by id list, then Count again
      def countAll(): Long = Protobuf.find(Protobuf.find(dataOf(
        call(p, "Count", Protobuf.w().str(1, "points"))), 1).get.msg, 1).get.num
      assert(countAll() == 3L)
      val del = call(p, "Delete", Protobuf.w().str(1, "points")
        .msg(3, Protobuf.w().msg(1, Protobuf.w()
          .msg(1, Protobuf.w().uint(1, 2))
          .msg(1, Protobuf.w().uint(1, 3)))))
      assert(trailerOf(del).contains("grpc-status: 0"))
      assert(countAll() == 1L)

      def idSelector(field: Int, id: Long): Protobuf.W =
        Protobuf.w().msg(field, Protobuf.w().msg(1, Protobuf.w().msg(1,
          Protobuf.w().uint(1, id))))
      def payloadKeysOf(id: Long): Seq[String] = {
        val got2 = call(p, "Get", Protobuf.w().str(1, "points")
          .msg(2, Protobuf.w().uint(1, id)))
        Protobuf.all(Protobuf.all(dataOf(got2), 1).head.msg, 2)
          .map(e => Protobuf.find(e.msg, 1).get.str)
      }
      // SetPayload merges a key onto point 1
      val sp = call(p, "SetPayload", Protobuf.w().str(1, "points")
        .msg(3, Protobuf.w().str(1, "tier").msg(2, Protobuf.w().str(4, "gold")))
        .msg(5, Protobuf.w().msg(1, Protobuf.w().msg(1, Protobuf.w().uint(1, 1)))))
      assert(trailerOf(sp).contains("grpc-status: 0"), new String(sp.head._2))
      assert(payloadKeysOf(1).contains("tier") && payloadKeysOf(1).contains("kind"))
      // OverwritePayload drops keys absent from the new payload
      val ow = call(p, "OverwritePayload", Protobuf.w().str(1, "points")
        .msg(3, Protobuf.w().str(1, "only").msg(2, Protobuf.w().str(4, "x")))
        .msg(5, Protobuf.w().msg(1, Protobuf.w().msg(1, Protobuf.w().uint(1, 1)))))
      assert(trailerOf(ow).contains("grpc-status: 0"))
      val afterOw = payloadKeysOf(1)
      assert(afterOw.contains("only") && !afterOw.contains("tier") &&
        !afterOw.contains("kind"), afterOw.toString)
      // DeletePayload removes a named key
      val dp = call(p, "DeletePayload", Protobuf.w().str(1, "points")
        .str(3, "only")
        .msg(5, Protobuf.w().msg(1, Protobuf.w().msg(1, Protobuf.w().uint(1, 1)))))
      assert(trailerOf(dp).contains("grpc-status: 0"))
      assert(!payloadKeysOf(1).contains("only"))
      // UpdateVectors re-points the embedding; search follows
      val uv = call(p, "UpdateVectors", Protobuf.w().str(1, "points")
        .msg(3, Protobuf.w().msg(1, Protobuf.w().uint(1, 1))
          .msg(2, Protobuf.w().msg(1, Protobuf.w().packedFloats(1, Seq(0f, 1f, 0f))))))
      assert(trailerOf(uv).contains("grpc-status: 0"))
      val sr2 = call(p, "Search", Protobuf.w().str(1, "points")
        .packedFloats(2, Seq(0f, 1f, 0f)).uint(4, 1))
      val top2 = Protobuf.find(Protobuf.find(
        Protobuf.all(dataOf(sr2), 1).head.msg, 1).get.msg, 1).get.num
      assert(top2 == 1L)
      // DeleteVectors: the point drops out of the searchable view
      val dv = call(p, "DeleteVectors", Protobuf.w().str(1, "points")
        .msg(3, Protobuf.w().msg(1, Protobuf.w().msg(1, Protobuf.w().uint(1, 1)))))
      assert(trailerOf(dv).contains("grpc-status: 0"))
      assert(countAll() == 0L)

      // mutations against a read-only endpoint refuse with status 9
      val ro = new QdrantGrpcServer(() => Tables.embeddings(spark, sf)).start()
      try {
        val refused = call(ro.boundPort, "Upsert", Protobuf.w()
          .str(1, "embeddings").msg(3, pointStruct(9, Seq(1f))))
        assert(trailerOf(refused).contains("grpc-status: 9"))
      } finally ro.stop()
    } finally server.stop()
  }

  test("Collections Get/Update and field-index hints") {
    val g = GraphQueries.graph(spark, sf)
    val store = new graft.graph.GraphStore(graft.graph.PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    val server = QdrantGrpcServer.forStore(store, collection = "points").start()
    try {
      val p = server.boundPort
      def cCall(method: String, w: Protobuf.W) = {
        val resp = client.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$p/qdrant.Collections/$method"))
          .header("Content-Type", "application/grpc-web+proto")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(
            Protobuf.grpcFrame(0, w.bytes))).build(),
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        Protobuf.grpcFrames(resp.body())
      }
      val got = cCall("Get", Protobuf.w().str(1, "points"))
      assert(trailerOf(got).contains("grpc-status: 0"))
      assert(Protobuf.find(Protobuf.find(dataOf(got), 1).get.msg, 1)
        .exists(_.num == 1L)) // status Green
      assert(trailerOf(cCall("Get", Protobuf.w().str(1, "nope")))
        .contains("grpc-status: 5"))
      assert(trailerOf(cCall("Update", Protobuf.w().str(1, "points")))
        .contains("grpc-status: 0"))
      // field index hints land in the schema catalog
      val fi = call(p, "CreateFieldIndex",
        Protobuf.w().str(1, "points").str(3, "kind"))
      assert(trailerOf(fi).contains("grpc-status: 0"))
      assert(store.catalog.listIndexes.exists(_.name == "qdrant_points_kind"))
      val dfi = call(p, "DeleteFieldIndex",
        Protobuf.w().str(1, "points").str(3, "kind"))
      assert(trailerOf(dfi).contains("grpc-status: 0"))
      assert(!store.catalog.listIndexes.exists(_.name == "qdrant_points_kind"))
    } finally server.stop()
  }

  test("universal Query API: nearest by dense vector, by point id, by document text; QueryBatch") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts).start()
    try {
      val p = server.boundPort
      def nearest(input: Protobuf.W): Protobuf.W = Protobuf.w()
        .str(1, "embeddings")
        .msg(3, Protobuf.w().msg(1, input))
        .uint(8, 4)
      // dense input ≡ Search with the same vector
      val dense = call(p, "Query", nearest(
        Protobuf.w().msg(2, Protobuf.w().packedFloats(1, qv))))
      assert(trailerOf(dense).contains("grpc-status: 0"))
      val denseIds = Protobuf.all(dataOf(dense), 1).map(h =>
        Protobuf.find(Protobuf.find(h.msg, 1).get.msg, 1).get.num)
      val engineIds = QdrantPoints.search(pts, "vec_id", "embedding",
        qv.map(_.toDouble), 4).collect().map(_.getAs[Number](0).longValue()).toSeq
      assert(denseIds == engineIds)
      // id input: query = point 7's own stored vector → 7 ranks first
      val byId = call(p, "Query", nearest(
        Protobuf.w().msg(1, Protobuf.w().uint(1, 7))))
      val top = Protobuf.all(dataOf(byId), 1).map(h =>
        Protobuf.find(Protobuf.find(h.msg, 1).get.msg, 1).get.num).head
      assert(top == 7L, s"self-query should rank the point first, got $top")
      // unknown id → NOT_FOUND
      val missing = call(p, "Query", nearest(
        Protobuf.w().msg(1, Protobuf.w().uint(1, 987654321L))))
      assert(trailerOf(missing).contains("grpc-status: 5"))
      // document input embeds through the seam (dim-64 fake)
      object Dim64 extends graft.functions.Embedder {
        val dim = 64
        def embed(text: String): Seq[Double] =
          (0 until 64).map(i => if (i == text.length % 64) 1.0 else 0.0)
        def embedCol(s: org.apache.spark.sql.SparkSession,
            c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          throw new UnsupportedOperationException("driver-side only in this spec")
      }
      graft.functions.Embedder.withEmbedder(Dim64) {
        val doc = call(p, "Query", nearest(
          Protobuf.w().msg(5, Protobuf.w().str(1, "hello"))))
        assert(trailerOf(doc).contains("grpc-status: 0"))
        assert(Protobuf.all(dataOf(doc), 1).nonEmpty)
      }
      // QueryBatch: two sub-queries → two BatchResults matching singles
      val batch = call(p, "QueryBatch", Protobuf.w().str(1, "embeddings")
        .msg(2, nearest(Protobuf.w().msg(2, Protobuf.w().packedFloats(1, qv))))
        .msg(2, nearest(Protobuf.w().msg(1, Protobuf.w().uint(1, 7)))))
      val results = Protobuf.all(dataOf(batch), 1).map(_.msg)
      assert(results.size == 2)
      val b0 = Protobuf.all(results(0), 1).map(h =>
        Protobuf.find(Protobuf.find(h.msg, 1).get.msg, 1).get.num)
      assert(b0 == denseIds)
    } finally server.stop()
  }

  test("snapshots service: create persists a loadable snapshot; list/delete manage it") {
    val g = GraphQueries.graph(spark, sf)
    val store = new graft.graph.GraphStore(graft.graph.PropertyGraph(
      g.nodes.filter(org.apache.spark.sql.functions.array_contains(
        org.apache.spark.sql.functions.col("labels"), "Region"))
        .localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)), registerGlobal = false)
    val server = QdrantGrpcServer.forStore(store, collection = "points").start()
    try {
      val p = server.boundPort
      def snapCall(method: String, w: Protobuf.W) = {
        val resp = client.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$p/qdrant.Snapshots/$method"))
          .header("Content-Type", "application/grpc-web+proto")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(
            Protobuf.grpcFrame(0, w.bytes))).build(),
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        Protobuf.grpcFrames(resp.body())
      }
      val created = snapCall("Create", Protobuf.w().str(1, "points"))
      assert(trailerOf(created).contains("grpc-status: 0"), new String(created.head._2))
      val desc = Protobuf.find(dataOf(created), 1).get.msg
      val name = Protobuf.find(desc, 1).get.str
      assert(name.startsWith("points-v"))
      assert(Protobuf.find(desc, 3).get.num > 0, "snapshot has zero size")
      // the artifact is a real GraphStore snapshot — load it back
      val loaded = graft.graph.GraphStore.load(spark,
        s"${server.snapshotsDir}/$name", registerGlobal = false)
      assert(loaded.snapshot.nodes.count() == store.snapshot.nodes.count())
      // list shows it; delete removes it; double delete is NOT_FOUND
      val listed = snapCall("List", Protobuf.w().str(1, "points"))
      assert(Protobuf.all(dataOf(listed), 1).exists(d =>
        Protobuf.find(d.msg, 1).exists(_.str == name)))
      val del = snapCall("Delete", Protobuf.w().str(1, "points").str(2, name))
      assert(trailerOf(del).contains("grpc-status: 0"))
      val again = snapCall("Delete", Protobuf.w().str(1, "points").str(2, name))
      assert(trailerOf(again).contains("grpc-status: 5"))
    } finally server.stop()
  }

  test("embedding deletes replay through the WAL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qdr_wal").toString
    val g = GraphQueries.graph(spark, sf)
    val store = new graft.graph.GraphStore(graft.graph.PropertyGraph(
      g.nodes.filter("false").localCheckpoint(true),
      g.edges.filter("false").localCheckpoint(true)),
      registerGlobal = false, walDir = Some(dir))
    store.setNodeVectorProperty("points:1", "embedding", Seq(1.0, 0.0))
    store.setNodeVectorProperty("points:2", "embedding", Seq(0.0, 1.0))
    store.deleteNodeEmbeddings(Seq("points:1"))
    assert(store.nodeEmbeddings.count() == 1)
    val replayed = graft.graph.GraphStore.loadWal(spark, dir, registerGlobal = false)
    val left = replayed.nodeEmbeddings.select("entity_id").collect().map(_.getString(0))
    assert(left.toSeq == Seq("points:2"), left.toSeq.toString)
  }

  test("bearer token gates the endpoint with grpc-status 16") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts, token = Some("qdr-tok")).start()
    try {
      val req = Protobuf.w().str(1, "embeddings").msg(2, mustIntEq("label", 1))
      val no = call(server.boundPort, "Count", req)
      assert(trailerOf(no).contains("grpc-status: 16"))
      assert(no.forall(_._1 == 0x80)) // trailers-only, no data leaked
      val ok = call(server.boundPort, "Count", req, bearer = Some("qdr-tok"))
      assert(trailerOf(ok).contains("grpc-status: 0"))
    } finally server.stop()
  }

  test("RecommendBatch delegates each sub to the full Recommend path") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts).start()
    try {
      val p = server.boundPort
      def hitIds(msg: Seq[Protobuf.Field]): Seq[Long] =
        Protobuf.all(msg, 1).map(sp =>
          Protobuf.find(Protobuf.find(sp.msg, 1).get.msg, 1).get.num)
      // sub 0: positive 0, limit 4; sub 1: positive 2 / negative 1, limit 3
      val batch = call(p, "RecommendBatch", Protobuf.w()
        .str(1, "embeddings")
        .msg(2, Protobuf.w().msg(2, Protobuf.w().uint(1, 0)).uint(5, 4))
        .msg(2, Protobuf.w().msg(2, Protobuf.w().uint(1, 2))
          .msg(3, Protobuf.w().uint(1, 1)).uint(5, 3)))
      assert(trailerOf(batch).contains("grpc-status: 0"))
      val results = Protobuf.all(dataOf(batch), 1).map(_.msg)
      assert(results.size == 2)
      val single0 = hitIds(dataOf(call(p, "Recommend", Protobuf.w()
        .str(1, "embeddings").msg(2, Protobuf.w().uint(1, 0)).uint(5, 4))))
      val single1 = hitIds(dataOf(call(p, "Recommend", Protobuf.w()
        .str(1, "embeddings").msg(2, Protobuf.w().uint(1, 2))
        .msg(3, Protobuf.w().uint(1, 1)).uint(5, 3))))
      assert(hitIds(results(0)) == single0 && single0.size == 4)
      assert(hitIds(results(1)) == single1 && single1.size == 3)
      // empty batch → INVALID_ARGUMENT
      val bad = call(p, "RecommendBatch", Protobuf.w().str(1, "embeddings"))
      assert(trailerOf(bad).contains("grpc-status: 3"))
    } finally server.stop()
  }

  test("SearchBatch honors per-sub filter/threshold/payload (full-Search delegation)") {
    val pts = Tables.embeddings(spark, sf)
    val server = new QdrantGrpcServer(() => pts).start()
    try {
      // sub 0: filter label==1; sub 1: plain but with score_threshold
      val batch = call(server.boundPort, "SearchBatch", Protobuf.w()
        .str(1, "embeddings")
        .msg(2, Protobuf.w().str(1, "embeddings").packedFloats(2, qv)
          .msg(3, mustIntEq("label", 1)).uint(4, 4)
          .msg(6, Protobuf.w().bool(1, true)))
        .msg(2, Protobuf.w().str(1, "embeddings").packedFloats(2, qv)
          .uint(4, 4).float(8, 0.5f)))
      assert(trailerOf(batch).contains("grpc-status: 0"))
      val results = Protobuf.all(dataOf(batch), 1).map(_.msg)
      assert(results.size == 2)

      val filtered = QdrantPoints.search(pts, "vec_id", "embedding",
        qv.map(_.toDouble), 4, Filter(must = Seq(col("label") === 1)))
        .collect().map(_.getAs[Number](0).longValue()).toSeq
      val thresholded = QdrantPoints.search(pts, "vec_id", "embedding",
        qv.map(_.toDouble), 4, Filter(), minScore = Some(0.5))
        .collect().map(r => (r.getAs[Number](0).longValue(), r.getDouble(1))).toSeq

      val ids0 = Protobuf.all(results(0), 1).map(sp =>
        Protobuf.find(Protobuf.find(sp.msg, 1).get.msg, 1).get.num)
      assert(ids0 == filtered, s"filtered sub: $ids0 != $filtered")
      // every hit of the filtered sub really has label==1 and carries payload
      val label1 = pts.filter(col("label") === 1).select("vec_id")
        .collect().map(_.getAs[Number](0).longValue()).toSet
      assert(ids0.forall(label1.contains))
      assert(Protobuf.all(results(0), 1).forall(sp =>
        Protobuf.all(sp.msg, 2).nonEmpty)) // with_payload honored per sub

      val hits1 = Protobuf.all(results(1), 1).map { sp =>
        (Protobuf.find(Protobuf.find(sp.msg, 1).get.msg, 1).get.num,
          Protobuf.find(sp.msg, 3).get.floatVal.toDouble)
      }
      assert(hits1.map(_._1) == thresholded.map(_._1),
        s"threshold sub: $hits1 != $thresholded")
      assert(hits1.forall(_._2 >= 0.5))
    } finally server.stop()
  }
}
