package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.search.QdrantPoints
import graft.search.QdrantPoints.Filter

/** Qdrant-compatible wire endpoint over the [[QdrantPoints]] engines —
  * the upstream Qdrant gRPC contract (`package qdrant`, the same one the
  * reference serves: `/root/reference/pkg/qdrantgrpc/server.go`,
  * `points_service.go:263-726`) with hand-rolled protobuf framing
  * ([[Protobuf]] — no protobuf-java in the sandbox, same approach as the
  * Bolt loop's hand-rolled PackStream).
  *
  * Transport is **gRPC-Web** (`application/grpc-web+proto` over HTTP/1.1:
  * 5-byte frame prefix, trailers as a 0x80 frame) because the JDK ships no
  * HTTP/2 server — the message bytes on the wire are identical to gRPC
  * proper, only the framing layer differs (the disclosed h2 limitation).
  *
  * Served RPCs: `/qdrant.Points/{Search, SearchBatch, SearchGroups,
  * Scroll, Count, Recommend, Upsert, Get, Delete}` and
  * `/qdrant.Collections/{Create, List, Delete, CollectionExists}`.
  * A store-backed endpoint ([[QdrantGrpcServer.forStore]]) maps points
  * to nodes (Point → Node, server.go:29-31) so mutations commit through
  * the engine and every search sees them; a read-only points provider
  * refuses mutations with grpc-status 9 and Creates metadata-only
  * collections. Unknown collections get grpc-status 5 NOT_FOUND like
  * the reference's registry.GetCollection error. Field numbers follow
  * the public qdrant points.proto
  * (v1.x): SearchPoints{1 collection, 2 vector(packed float), 3 filter,
  * 4 limit, 6 with_payload, 8 score_threshold, 9 offset};
  * Filter{1 should, 2 must, 3 must_not}; Condition{1 field, 3 has_id};
  * FieldCondition{1 key, 2 match{1 keyword, 2 integer, 3 boolean,
  * 4 text}, 3 range{1 lt, 2 gt, 3 gte, 4 lte}}; PointId{1 num, 2 uuid};
  * ScoredPoint{1 id, 2 payload, 3 score}; SearchResponse{1 result,
  * 2 time}; CountPoints{1 collection, 2 filter}; CountResponse{1
  * result{1 count}, 2 time}; ScrollPoints{1 collection, 2 filter,
  * 3 offset, 4 limit}; ScrollResponse{1 next_page_offset, 2 result,
  * 3 time}; RecommendPoints{1 collection, 2 positive, 3 negative,
  * 4 filter, 5 limit, 9 score_threshold, 10 offset}.
  *
  * Scroll pagination matches the reference exactly: the request offset id
  * is exclusive, `next_page_offset` echoes the LAST id of the page when
  * more rows remain (`points_service.go:476-481`).
  *
  * `token`: optional bearer gate (gRPC status 16 UNAUTHENTICATED without
  * it — the reference's authenticator hook, `server_auth_test.go`).
  */
final class QdrantGrpcServer(points: () => DataFrame, idCol: String = "vec_id",
    embCol: String = "embedding", port: Int = 0, token: Option[String] = None,
    collectionName: String = "embeddings",
    store: Option[graft.graph.GraphStore] = None,
    rbac: Option[ServerAuth.Rbac] = None,
    isDevelopment: Boolean = true,
    maxBodyBytes: Long = RequestValidation.GrpcMaxBodyBytes) {

  /** Per-method RBAC (qdrantgrpc/server.go:557-601
    * defaultMethodPermissions): searches/reads need `read`, point
    * mutations `write`/`delete`, collection DDL `create`/`delete`,
    * snapshots `admin`. Missing permission → grpc-status 7
    * PERMISSION_DENIED. A bare `token` is an admin credential.
    */
  private val effectiveRbac: Option[ServerAuth.Rbac] =
    rbac.orElse(ServerAuth.Rbac.legacy(token))

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Collection registry (`registry.go`): the constructor's points
    * provider under `collectionName`, plus metadata-only collections
    * clients Create (no point storage behind them — Upsert is the
    * engine-side ingest path, `streaming/VectorIngest.scala`).
    */
  private val collections =
    scala.collection.concurrent.TrieMap[String, Option[() => DataFrame]](
      collectionName -> Some(points))

  def boundPort: Int = server.getAddress.getPort

  def start(): QdrantGrpcServer = {
    // gRPC body cap is the larger MaxRequestSize-style bound: batch vector
    // upserts legitimately exceed the 10 MB HTTP cap (round-11 ADVICE)
    val guarded = RequestValidation.guard(RequestValidation.GrpcTypes,
      isDevelopment, maxBodyBytes)(handle)
    server.createContext("/qdrant.Points", (ex: HttpExchange) => guarded(ex))
    server.createContext("/qdrant.Collections", (ex: HttpExchange) => guarded(ex))
    server.createContext("/qdrant.Snapshots", (ex: HttpExchange) => guarded(ex))
    // the NornicDB-native search API rides the same endpoint (the
    // reference registers it on the Qdrant gRPC server,
    // server_qdrantgrpc.go:95-103)
    server.createContext("/nornicdb.grpc.v1.NornicSearch",
      (ex: HttpExchange) => guarded(ex))
    server.setExecutor(null)
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  import Protobuf.{Field => PF}

  /** Statuses: 3 INVALID_ARGUMENT, 5 NOT_FOUND, 12 UNIMPLEMENTED,
    * 13 INTERNAL, 16 UNAUTHENTICATED. */
  private final class GrpcError(val code: Int, msg: String) extends RuntimeException(msg)

  /** defaultMethodPermissions (qdrantgrpc/server.go:557-601). */
  private val methodPerms: Map[String, ServerAuth.Permission] = {
    import ServerAuth.Permission._
    Map(
      "Points/Search" -> Read, "Points/SearchBatch" -> Read,
      "Points/SearchGroups" -> Read, "Points/Scroll" -> Read,
      "Points/Get" -> Read, "Points/Count" -> Read,
      "Points/Recommend" -> Read, "Points/RecommendBatch" -> Read,
      "Points/Query" -> Read,
      "Points/QueryBatch" -> Read,
      "Points/Upsert" -> Write, "Points/UpdateVectors" -> Write,
      "Points/DeleteVectors" -> Write, "Points/SetPayload" -> Write,
      "Points/OverwritePayload" -> Write, "Points/DeletePayload" -> Write,
      "Points/ClearPayload" -> Write,
      "Points/Delete" -> Delete,
      "Points/CreateFieldIndex" -> Create, "Points/DeleteFieldIndex" -> Create,
      "Collections/Create" -> Create, "Collections/Update" -> Create,
      "Collections/Delete" -> Delete,
      "Collections/Get" -> Read, "Collections/List" -> Read,
      "Collections/CollectionExists" -> Read,
      "Snapshots/Create" -> Admin, "Snapshots/List" -> Admin,
      "Snapshots/Delete" -> Admin,
      "NornicSearch/SearchText" -> Read)
  }

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    try {
      val role = ServerAuth.roleOf(ex, effectiveRbac) match {
        case Some(r) => r
        case None =>
          respondTrailersOnly(ex, 16, "unauthenticated: bearer token required")
          return
      }
      val methodName =
        path.stripPrefix("/qdrant.").stripPrefix("/nornicdb.grpc.v1.")
      methodPerms.get(methodName).foreach { needed =>
        if (!ServerAuth.can(role, needed)) {
          respondTrailersOnly(ex, 7,
            s"permission denied: $methodName requires ${needed.name}")
          return
        }
      }
      val body = ex.getRequestBody.readAllBytes()
      val req = Protobuf.grpcFrames(body).collectFirst {
        case (0, payload) => Protobuf.fields(payload)
      }.getOrElse(throw new IllegalArgumentException("no DATA frame in request"))
      val t0 = System.nanoTime()
      def secs: Double = (System.nanoTime() - t0) / 1e9
      val isWriteMethod = methodPerms.get(methodName).exists(p =>
        p == ServerAuth.Permission.Write || p == ServerAuth.Permission.Delete)
      val resp = graft.cypher.QueryGuard.guarded(collectionName,
          isWriteMethod) { methodName match {
        case "NornicSearch/SearchText" => searchText(req, secs)
        case "Points/Search" => search(req, secs)
        case "Points/SearchBatch" => searchBatch(req, secs)
        case "Points/SearchGroups" => searchGroups(req, secs)
        case "Points/Count" => countResp(req, secs)
        case "Points/Scroll" => scroll(req, secs)
        case "Points/Recommend" => recommend(req, secs)
        case "Points/RecommendBatch" => recommendBatch(req, secs)
        case "Points/Query" => queryPoints(req, secs)
        case "Points/QueryBatch" => queryBatch(req, secs)
        case "Points/Upsert" => upsert(req, secs)
        case "Points/Get" => getPoints(req, secs)
        case "Points/Delete" => deletePoints(req, secs)
        case "Points/SetPayload" => setPayload(req, secs, overwrite = false)
        case "Points/OverwritePayload" => setPayload(req, secs, overwrite = true)
        case "Points/DeletePayload" => deletePayload(req, secs)
        case "Points/ClearPayload" => clearPayload(req, secs)
        case "Points/UpdateVectors" => updateVectors(req, secs)
        case "Points/DeleteVectors" => deleteVectors(req, secs)
        case "Collections/Create" => collectionsCreate(req, secs)
        case "Collections/List" => collectionsList(secs)
        case "Collections/Delete" => collectionsDelete(req, secs)
        case "Collections/CollectionExists" => collectionsExists(req, secs)
        case "Collections/Get" => collectionsGet(req, secs)
        case "Collections/Update" => collectionsUpdate(req, secs)
        case "Points/CreateFieldIndex" => fieldIndex(req, secs, create = true)
        case "Points/DeleteFieldIndex" => fieldIndex(req, secs, create = false)
        case "Snapshots/Create" => snapshotCreate(req, secs)
        case "Snapshots/List" => snapshotList(req, secs)
        case "Snapshots/Delete" => snapshotDelete(req, secs)
        case other =>
          respondTrailersOnly(ex, 12, s"unimplemented method: $other")
          return
      } }
      respondOk(ex, resp.bytes)
    } catch {
      case e: graft.cypher.QueryGuard.LimitExceeded =>
        respondTrailersOnly(ex, 8, // RESOURCE_EXHAUSTED
          Option(e.getMessage).getOrElse("query limit exceeded"))
      case e: GrpcError =>
        respondTrailersOnly(ex, e.code, Option(e.getMessage).getOrElse("error"))
      case e: IllegalArgumentException =>
        respondTrailersOnly(ex, 3, Option(e.getMessage).getOrElse("invalid argument"))
      case e: Exception =>
        respondTrailersOnly(ex, 13, Option(e.getMessage).getOrElse(e.toString))
    }
  }

  // ================================================= request decoding ====

  private def collectionOf(req: Seq[PF]): String = {
    val name = Protobuf.find(req, 1).map(_.str).getOrElse("")
    require(name.nonEmpty, "collection_name is required")
    name
  }

  /** Resolve the points provider; metadata-only collections have no
    * points behind them, unknown ones are NOT_FOUND (the reference's
    * registry.GetCollection error path).
    */
  private def pointsOf(req: Seq[PF]): DataFrame =
    collections.get(collectionOf(req)) match {
      case Some(Some(p)) => p()
      case Some(None) =>
        throw new GrpcError(9, "collection has no point storage behind it " +
          "(metadata-only; ingest goes through the engine)")
      case None =>
        throw new GrpcError(5, s"collection not found: ${collectionOf(req)}")
    }


  /** vector: packed (wire 2) and unpacked (wire 5) repeated float. */
  private def vectorOf(req: Seq[PF], no: Int): Seq[Double] =
    Protobuf.all(req, no).flatMap {
      case f if f.wire == 2 => f.floats.map(_.toDouble)
      case f => Seq(f.floatVal.toDouble)
    }

  private def filterOf(req: Seq[PF], no: Int): Filter =
    Protobuf.find(req, no).map { f =>
      val fs = f.msg
      def conds(fieldNo: Int): Seq[Column] =
        Protobuf.all(fs, fieldNo).map(c => condition(c.msg))
      Filter(must = conds(2), mustNot = conds(3), should = conds(1))
    }.getOrElse(Filter())

  private def condition(fs: Seq[PF]): Column =
    Protobuf.find(fs, 1).map(fc => fieldCondition(fc.msg))
      .orElse(Protobuf.find(fs, 3).map { h => // HasIdCondition{1 has_id}
        val ids = Protobuf.all(h.msg, 1).map(p => pointIdNum(p.msg))
        col(idCol).isin(ids: _*)
      })
      .getOrElse(throw new IllegalArgumentException(
        "unsupported condition (field/has_id only)"))

  private def fieldCondition(fs: Seq[PF]): Column = {
    val key = Protobuf.find(fs, 1).getOrElse(
      throw new IllegalArgumentException("field condition needs key")).str
    require(key.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid payload key: $key")
    val c = col(key)
    Protobuf.find(fs, 2).map { m => // Match oneof
      val mf = m.msg
      Protobuf.find(mf, 1).map(k => c === k.str)
        .orElse(Protobuf.find(mf, 2).map(i => c === i.num))
        .orElse(Protobuf.find(mf, 3).map(b => c === (b.num != 0)))
        .orElse(Protobuf.find(mf, 4).map(t => c.contains(t.str)))
        .getOrElse(throw new IllegalArgumentException("unsupported match kind"))
    }.orElse(Protobuf.find(fs, 3).map { r => // Range{1 lt, 2 gt, 3 gte, 4 lte}
      val rf = r.msg
      Seq(Protobuf.find(rf, 1).map(v => c < v.doubleVal),
        Protobuf.find(rf, 2).map(v => c > v.doubleVal),
        Protobuf.find(rf, 3).map(v => c >= v.doubleVal),
        Protobuf.find(rf, 4).map(v => c <= v.doubleVal)).flatten
        .reduceOption(_ && _).getOrElse(lit(true))
    }).getOrElse(throw new IllegalArgumentException(
      "unsupported field condition (match/range only)"))
  }

  private def pointIdNum(fs: Seq[PF]): Long =
    Protobuf.find(fs, 1).map(_.num).orElse(
      Protobuf.find(fs, 2).map(_.str.toLong)).getOrElse(
      throw new IllegalArgumentException("point id needs num or uuid"))

  private def withPayloadEnabled(req: Seq[PF], no: Int): Boolean =
    Protobuf.find(req, no).exists { wp =>
      // WithPayloadSelector{1 enable, 2 include, 3 exclude} — any include
      // list also turns payload on (thin: full set, not the subset)
      Protobuf.find(wp.msg, 1).forall(_.num != 0)
    }

  // ================================================ response encoding ====

  private def pointIdMsg(id: Long): Protobuf.W = Protobuf.w().uint(1, id)

  /** payload map entries from every non-id/non-vector column; a
    * properties string-map column flattens into per-key fields (hoisted
    * columns win on key collision).
    */
  private def payloadMsg(sp: Protobuf.W, mapField: Int, row: Row): Unit = {
    val emitted = scala.collection.mutable.Set.empty[String]
    def emit(k: String, value: Protobuf.W): Unit =
      if (emitted.add(k)) sp.msg(mapField, Protobuf.w().str(1, k).msg(2, value))
    row.schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (f.name != idCol && f.name != embCol && !row.isNullAt(i)) {
        row.get(i) match {
          case n: Long => emit(f.name, Protobuf.w().uint(3, n))
          case n: Int => emit(f.name, Protobuf.w().uint(3, n.toLong))
          case n: Short => emit(f.name, Protobuf.w().uint(3, n.toLong))
          case d: Double => emit(f.name, Protobuf.w().double(2, d))
          case d: Float => emit(f.name, Protobuf.w().double(2, d.toDouble))
          case b: Boolean => emit(f.name, Protobuf.w().bool(5, b))
          case s: String => emit(f.name, Protobuf.w().str(4, s))
          case m: scala.collection.Map[_, _] =>
            m.foreach { case (k, v) =>
              if (v != null) emit(String.valueOf(k), Protobuf.w().str(4, String.valueOf(v)))
            }
          case _: scala.collection.Seq[_] => () // labels arrays: structural, not payload
          case other => emit(f.name, Protobuf.w().str(4, String.valueOf(other)))
        }
      }
    }
  }

  private def scoredPoints(resp: Protobuf.W, hits: Seq[Row],
      payload: Map[Long, Row], field: Int = 1): Unit =
    hits.foreach { r =>
      val id = r.get(0) match {
        case l: Long => l
        case i: Int => i.toLong
        case other => other.toString.toLong
      }
      val sp = Protobuf.w()
        .msg(1, pointIdMsg(id))
        .float(3, r.getDouble(1).toFloat)
      payload.get(id).foreach(payloadMsg(sp, 2, _))
      resp.msg(field, sp)
    }

  private def payloadRows(pts: DataFrame, ids: Seq[Long]): Map[Long, Row] =
    if (ids.isEmpty) Map.empty
    else pts.filter(col(idCol).isin(ids: _*)).drop(embCol).collect()
      .map(r => r.getAs[Number](idCol).longValue() -> r).toMap

  /** The shared search body: ONLY the repeated field-1 ScoredPoints (so
    * it doubles as a BatchResult for the batch RPCs).
    */
  private def searchHitsMsg(pts: DataFrame, req: Seq[PF], vec: Seq[Double],
      limitNo: Int, filterNo: Int, thresholdNo: Int, offsetNo: Int,
      payloadNo: Int): Protobuf.W = {
    require(vec.nonEmpty, "vector is required")
    val limit = Protobuf.find(req, limitNo).map(_.num.toInt).filter(_ > 0).getOrElse(10)
    val filter = filterOf(req, filterNo)
    val minScore = Protobuf.find(req, thresholdNo).map(_.floatVal.toDouble)
    val offset = Protobuf.find(req, offsetNo).map(_.num.toInt).getOrElse(0)
    val hits = QdrantPoints.search(pts, idCol, embCol, vec, limit,
      filter, minScore, offset).collect().toSeq
    val payload =
      if (withPayloadEnabled(req, payloadNo))
        payloadRows(pts, hits.map(_.getAs[Number](0).longValue()))
      else Map.empty[Long, Row]
    val resp = Protobuf.w()
    scoredPoints(resp, hits, payload)
    resp
  }

  private def searchCore(pts: DataFrame, req: Seq[PF], vec: Seq[Double],
      limitNo: Int, filterNo: Int, thresholdNo: Int, offsetNo: Int,
      payloadNo: Int, secs: => Double): Protobuf.W =
    searchHitsMsg(pts, req, vec, limitNo, filterNo, thresholdNo, offsetNo,
      payloadNo).double(2, secs)

  /** NornicSearch/SearchText (nornicdb_search.proto):
    * SearchTextRequest{1 database, 2 query, 3 limit, 4 labels,
    * 5 min_similarity} → SearchTextResponse{1 search_method,
    * 2 hits SearchHit{1 node_id, 2 labels, 3 properties Struct,
    * 4 score, 5 rrf_score, 6 vector_rank, 7 bm25_rank},
    * 3 fallback_triggered, 4 message, 5 time_seconds}. Delegates to the
    * shared hybrid engine (`SearchCallProcs.searchTextDetailed`) with the
    * Embedder seam as the embed-query hook (search_service.go:58-121);
    * limit clamps to 1000 (maxLimit default, search_service.go:44-46).
    */
  private def searchText(req: Seq[PF], secs: => Double): Protobuf.W = {
    val s = store.getOrElse(throw new GrpcError(12,
      "NornicSearch needs a store-backed endpoint"))
    val query = Protobuf.find(req, 2).map(_.str).getOrElse("")
    require(query.nonEmpty, "query is required")
    val limit0 = Protobuf.find(req, 3).map(_.num.toInt).getOrElse(0)
    val limit = math.min(if (limit0 <= 0) 10 else limit0, 1000)
    val labels = Protobuf.all(req, 4).map(_.str)
    val minSim = Protobuf.find(req, 5).map(_.floatVal.toDouble)
    val (df, method, fallback, msg) =
      graft.cypher.SearchCallProcs.searchTextDetailed(
        s, query, limit, labels, minSim)
    val rows = df.collect() // post-top-k serving materialization
    val resp = Protobuf.w().str(1, method)
    rows.foreach { r =>
      val hit = Protobuf.w().str(1, r.getString(0))
      Option(r.getSeq[String](1)).getOrElse(Nil).foreach(hit.str(2, _))
      val props = Option(r.getAs[Map[String, String]](2)).getOrElse(Map.empty)
      if (props.nonEmpty) {
        // google.protobuf.Struct{1 fields map<string, Value{3 string}>}
        val st = Protobuf.w()
        props.toSeq.sortBy(_._1).foreach { case (k, v) =>
          st.msg(1, Protobuf.w().str(1, k).msg(2, Protobuf.w().str(3, v)))
        }
        hit.msg(3, st)
      }
      hit.float(4, r.getDouble(3).toFloat)
      hit.float(5, r.getDouble(4).toFloat)
      hit.uint(6, r.getInt(5))
      hit.uint(7, r.getInt(6))
      resp.msg(2, hit)
    }
    if (fallback) resp.bool(3, true)
    if (msg.nonEmpty) resp.str(4, msg)
    resp.double(5, secs)
  }

  private def search(req: Seq[PF], secs: => Double): Protobuf.W =
    searchCore(pointsOf(req), req, vectorOf(req, 2), limitNo = 4,
      filterNo = 3, thresholdNo = 8, offsetNo = 9, payloadNo = 6, secs)

  /** SearchBatchPoints{1 collection, 2 search_points} → one-scan batched
    * scoring (`QdrantPoints.searchBatch` — the scale-correct inversion of
    * the reference's N-search loop, points_service.go:697-726). Response
    * SearchBatchResponse{1 result BatchResult{1 result ScoredPoint…},
    * 2 time}.
    */
  private def searchBatch(req: Seq[PF], secs: => Double): Protobuf.W = {
    val pts = pointsOf(req)
    val subs = Protobuf.all(req, 2).map(_.msg)
    require(subs.nonEmpty, "search_points is required")
    val vecs = subs.map(s => vectorOf(s, 2))
    require(vecs.forall(_.nonEmpty), "every search needs a vector")
    val resp = Protobuf.w()
    // each SearchPoints sub-message is the SAME shape as single Search;
    // the reference delegates every sub-search to full Search
    // (points_service.go:697-726). Subs carrying filter/threshold/offset/
    // payload take that exact path; the plain vector+limit case keeps the
    // one-scan batched scoring (the scale-correct inversion of the loop).
    val plain = subs.forall(s =>
      Seq(3, 6, 8, 9).forall(no => Protobuf.find(s, no).isEmpty))
    if (plain) {
      val limits = subs.map(s =>
        Protobuf.find(s, 4).map(_.num.toInt).filter(_ > 0).getOrElse(10))
      val rows = QdrantPoints.searchBatch(pts, idCol, embCol, vecs, limits.max)
        .collect().groupBy(_.getInt(0))
      subs.indices.foreach { qi =>
        val batch = Protobuf.w()
        val hits = rows.getOrElse(qi, Array.empty).sortBy(-_.getDouble(2))
          .take(limits(qi)).toSeq
          .map(r => Row(r.get(1), r.getDouble(2)))
        scoredPoints(batch, hits, Map.empty)
        resp.msg(1, batch)
      }
    } else subs.zip(vecs).foreach { case (s, vec) =>
      resp.msg(1, searchHitsMsg(pts, s, vec, limitNo = 4, filterNo = 3,
        thresholdNo = 8, offsetNo = 9, payloadNo = 6))
    }
    resp.double(2, secs)
  }

  /** SearchPointGroups{1 collection, 2 vector, 3 filter, 4 limit(groups),
    * 10 group_by, 11 group_size} → GroupsResult{1 groups PointGroup{1 id
    * GroupId{3 string_value}, 2 hits}} (points_service.go:804-880).
    */
  private def searchGroups(req: Seq[PF], secs: => Double): Protobuf.W = {
    val pts = pointsOf(req)
    val vec = vectorOf(req, 2)
    require(vec.nonEmpty, "vector is required")
    val groupBy = Protobuf.find(req, 10).map(_.str).getOrElse(
      throw new IllegalArgumentException("group_by is required"))
    require(groupBy.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid group_by: $groupBy")
    val groupLimit = Protobuf.find(req, 4).map(_.num.toInt).filter(_ > 0).getOrElse(3)
    val groupSize = Protobuf.find(req, 11).map(_.num.toInt).filter(_ > 0).getOrElse(10)
    val rows = QdrantPoints.searchGroups(pts, idCol, embCol, vec, groupBy,
      groupLimit, groupSize, filterOf(req, 3)).collect()
    val groups = Protobuf.w()
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (key, hits) =>
      val g = Protobuf.w().msg(1, Protobuf.w().str(3, key))
      hits.sortBy(-_.getDouble(2)).foreach { r =>
        scoredPoints(g, Seq(Row(r.get(1), r.getDouble(2))), Map.empty, field = 2)
      }
      groups.msg(1, g)
    }
    Protobuf.w().msg(1, groups).double(2, secs)
  }

  private def countResp(req: Seq[PF], secs: => Double): Protobuf.W = {
    val n = QdrantPoints.countPoints(pointsOf(req), filterOf(req, 2))
      .collect().head.getLong(0)
    Protobuf.w()
      .msg(1, Protobuf.w().uint(1, n))
      .double(2, secs)
  }

  private def scroll(req: Seq[PF], secs: => Double): Protobuf.W = {
    val pts = pointsOf(req)
    val filter = filterOf(req, 2)
    val after = Protobuf.find(req, 3).map(p => pointIdNum(p.msg))
    val limit = Protobuf.find(req, 4).map(_.num.toInt).filter(_ > 0).getOrElse(10)
    // over-fetch one row to learn whether a next page exists
    val ids = QdrantPoints.scroll(pts, idCol, filter, after, limit + 1)
      .collect().map(_.getAs[Number](0).longValue()).toSeq
    val page = ids.take(limit)
    val payload = payloadRows(pts, page)
    val resp = Protobuf.w()
    if (ids.length > limit) resp.msg(1, pointIdMsg(page.last))
    page.foreach { id =>
      val rp = Protobuf.w().msg(1, pointIdMsg(id))
      payload.get(id).foreach(payloadMsg(rp, 2, _))
      resp.msg(2, rp)
    }
    resp.double(3, secs)
  }

  private def recommendHits(pts: DataFrame, req: Seq[PF]): Protobuf.W = {
    val posIds = Protobuf.all(req, 2).map(p => pointIdNum(p.msg))
    val negIds = Protobuf.all(req, 3).map(p => pointIdNum(p.msg))
    require(posIds.nonEmpty, "at least one positive example is required")
    // resolve example ids → vectors (bounded point lookup, like the
    // reference's resolveExampleVectors)
    val byId = pts.filter(col(idCol).isin((posIds ++ negIds): _*))
      .select(col(idCol), col(embCol)).collect()
      .map(r => r.getAs[Number](0).longValue() ->
        r.getSeq[Number](1).map(_.doubleValue()).toSeq).toMap
    def resolve(ids: Seq[Long]): Seq[Seq[Double]] = ids.map(id =>
      byId.getOrElse(id, throw new IllegalArgumentException(s"point $id not found")))
    val vec = QdrantPoints.recommendVector(resolve(posIds), resolve(negIds))
    searchHitsMsg(pts, req, vec, limitNo = 5, filterNo = 4, thresholdNo = 9,
      offsetNo = 10, payloadNo = 7)
  }

  private def recommend(req: Seq[PF], secs: => Double): Protobuf.W =
    recommendHits(pointsOf(req), req).double(2, secs)

  /** RecommendBatchPoints{1 collection, 2 recommend_points} — each sub
    * runs the full Recommend path against the outer collection
    * (points_service.go:774-801 delegates sub-by-sub the same way);
    * response = repeated BatchResult.
    */
  private def recommendBatch(req: Seq[PF], secs: => Double): Protobuf.W = {
    val pts = pointsOf(req)
    val subs = Protobuf.all(req, 2).map(_.msg)
    require(subs.nonEmpty, "recommend_points are required")
    val resp = Protobuf.w()
    subs.foreach(s => resp.msg(1, recommendHits(pts, s)))
    resp.double(2, secs)
  }

  // ================================================== universal Query ====

  /** VectorInput{1 id | 2 dense{1 data} | 5 document{1 text}} → query
    * vector (points_service.go:1013-1052 vectorFromInput: id resolves
    * the stored embedding, document embeds through the seam — the
    * reference's EmbedQuery hook).
    */
  private def vectorFromInput(pts: DataFrame, in: Seq[PF]): Seq[Double] =
    Protobuf.find(in, 2).map(d => vectorOf(d.msg, 1))
      .orElse(Protobuf.find(in, 1).map { pid =>
        val id = pointIdNum(pid.msg)
        val row = pts.filter(col(idCol) === id).select(embCol).limit(1).collect()
        if (row.isEmpty) throw new GrpcError(5, s"point not found: $id")
        row.head.getSeq[Number](0).map(_.doubleValue()).toSeq
      })
      .orElse(Protobuf.find(in, 5).map { doc =>
        val text = Protobuf.find(doc.msg, 1).map(_.str).getOrElse(
          throw new IllegalArgumentException("document.text is required"))
        graft.functions.Embedder.current.embed(text)
      })
      .getOrElse(throw new GrpcError(12,
        "vector input variant is not implemented (id/dense/document only)"))

  /** QueryPoints{1 collection, 3 query{1 nearest(VectorInput)}, 5 filter,
    * 7 score_threshold, 8 limit, 9 offset, 11 with_payload} — delegates
    * to the Search body like the reference (points_service.go:937-993).
    */
  private def queryHits(req: Seq[PF]): Protobuf.W = {
    val pts = pointsOf(req)
    val qmsg = Protobuf.find(req, 3).getOrElse(throw new GrpcError(12,
      "query without Query.variant is not implemented")).msg
    val nearest = Protobuf.find(qmsg, 1).getOrElse(throw new GrpcError(12,
      "only Query.nearest is implemented")).msg
    searchHitsMsg(pts, req, vectorFromInput(pts, nearest), limitNo = 8,
      filterNo = 5, thresholdNo = 7, offsetNo = 9, payloadNo = 11)
  }

  private def queryPoints(req: Seq[PF], secs: => Double): Protobuf.W =
    queryHits(req).double(2, secs)

  /** QueryBatchPoints{1 collection, 2 query_points} → BatchResult per
    * sub-query (the reference loops Query, points_service.go:995-1011).
    */
  private def queryBatch(req: Seq[PF], secs: => Double): Protobuf.W = {
    val subs = Protobuf.all(req, 2).map(_.msg)
    require(subs.nonEmpty, "query_points is required")
    val resp = Protobuf.w()
    subs.foreach(sub => resp.msg(1, queryHits(sub)))
    resp.double(2, secs)
  }

  // ====================================================== mutations ======

  private def mutationStore: graft.graph.GraphStore =
    store.getOrElse(throw new GrpcError(9,
      "point mutations need a store-backed endpoint (read-only points provider)"))

  /** qdrant.Value → Scala (subset: {2 double, 3 integer, 4 string, 5 bool}). */
  private def valueToAny(fs: Seq[PF]): Any =
    Protobuf.find(fs, 4).map[Any](_.str)
      .orElse(Protobuf.find(fs, 3).map(_.num))
      .orElse(Protobuf.find(fs, 2).map(_.doubleVal))
      .orElse(Protobuf.find(fs, 5).map(_.num != 0))
      .orNull

  /** One node row per point, conformed to the store's nodes schema
    * (Point → Node mapping, server.go:29-31: id `<collection>:<num>`,
    * label = collection, payload → properties).
    */
  private def nodeRowsDf(s: graft.graph.GraphStore, collection: String,
      pts: Seq[(Long, Map[String, Any])]): DataFrame = {
    val schema = s.snapshot.nodes.schema
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    pts.foreach { case (num, payload) =>
      rows.add(Row.fromSeq(schema.fields.toSeq.map { f =>
        f.name match {
          case "id" => s"$collection:$num"
          case "labels" => Seq(collection)
          case "key" => num
          case "name" => payload.get("name").map(String.valueOf).orNull
          case "properties" => payload.map { case (k, v) => k -> String.valueOf(v) }
          case _ => null
        }
      }))
    }
    s.snapshot.nodes.sparkSession.createDataFrame(rows, schema)
  }

  /** UpsertPoints{1 collection, 3 points PointStruct{1 id, 3 payload,
    * 4 vectors{1 vector{1 data}}}} → insert-if-missing nodes, overwrite
    * payload properties, batch-upsert embeddings
    * (points_service.go:43-182). Response
    * PointsOperationResponse{1 UpdateResult{2 status=2 Completed}}.
    */
  private def upsert(req: Seq[PF], secs: => Double): Protobuf.W = {
    val s = mutationStore
    val coll = collectionOf(req)
    require(collections.contains(coll), s"collection not found: $coll")
    val pts = Protobuf.all(req, 3).map(_.msg).map { p =>
      val id = pointIdNum(Protobuf.find(p, 1).getOrElse(
        throw new IllegalArgumentException("point needs an id")).msg)
      val payload = Protobuf.all(p, 3).map(_.msg).flatMap { e =>
        Protobuf.find(e, 1).map(_.str).map { k =>
          k -> Protobuf.find(e, 2).map(v => valueToAny(v.msg)).orNull
        }
      }.toMap
      val vec = Protobuf.find(p, 4).flatMap(vs =>
        Protobuf.find(vs.msg, 1).map(v => vectorOf(v.msg, 1)))
      (id, payload, vec)
    }
    require(pts.nonEmpty, "points are required")
    s.mergeNodes(nodeRowsDf(s, coll, pts.map(p => (p._1, p._2))))
    // existing nodes keep their row through MERGE — overwrite payload
    // properties per key (hoisted-or-map contract)
    val spark = s.snapshot.nodes.sparkSession
    import spark.implicits._
    pts.flatMap(p => p._2.keys).distinct.foreach { k =>
      val updates = pts.collect { case (id, payload, _) if payload.contains(k) =>
        (s"$coll:$id", String.valueOf(payload(k)))
      }.toDF("id", "newval")
      s.setNodeProperties(updates, k)
    }
    val embRows = pts.collect { case (id, _, Some(v)) =>
      (s"$coll:$id", "embedding", v)
    }
    if (embRows.nonEmpty)
      s.setNodeVectorProperties(embRows.toDF("entity_id", "name", "embedding"))
    Protobuf.w()
      .msg(1, Protobuf.w().uint(2, 2)) // UpdateResult{status: Completed}
      .double(2, secs)
  }

  /** GetPoints{1 collection, 2 ids} → GetResponse{1 RetrievedPoint…}. */
  private def getPoints(req: Seq[PF], secs: => Double): Protobuf.W = {
    val pts = pointsOf(req)
    val ids = Protobuf.all(req, 2).map(p => pointIdNum(p.msg))
    require(ids.nonEmpty, "ids are required")
    val rows = payloadRows(pts, ids)
    val resp = Protobuf.w()
    ids.filter(rows.contains).foreach { id =>
      val rp = Protobuf.w().msg(1, pointIdMsg(id))
      payloadMsg(rp, 2, rows(id))
      resp.msg(1, rp)
    }
    resp.double(2, secs)
  }

  /** DeletePoints{1 collection, 3 selector{1 ids list | 2 filter}} →
    * detach-delete the backing nodes (points_service.go:227-260).
    */
  private def deletePoints(req: Seq[PF], secs: => Double): Protobuf.W = {
    val s = mutationStore
    val coll = collectionOf(req)
    val sel = Protobuf.find(req, 3).getOrElse(
      throw new IllegalArgumentException("points selector is required")).msg
    val nodeIds: Seq[String] = Protobuf.find(sel, 1) match {
      case Some(idsList) =>
        Protobuf.all(idsList.msg, 1).map(p => s"$coll:${pointIdNum(p.msg)}")
      case None =>
        val f = Protobuf.find(sel, 2).getOrElse(
          throw new IllegalArgumentException("selector needs ids or filter"))
        val fs = f.msg
        def conds(no: Int): Seq[Column] = Protobuf.all(fs, no).map(c => condition(c.msg))
        val filter = Filter(must = conds(2), mustNot = conds(3), should = conds(1))
        pointsOf(req).filter(QdrantPoints.pred(filter))
          .select(col(idCol)).collect()
          .map(r => s"$coll:${r.getAs[Number](0).longValue()}").toSeq
    }
    val targets = s.snapshot.nodes
      .filter(col("id").isin(nodeIds: _*)).select("id")
    val stats = s.deleteNodes(targets, detach = true)
    Protobuf.w()
      .msg(1, Protobuf.w().uint(1, stats.nodesDeleted).uint(2, 2))
      .double(2, secs)
  }

  /** Resolve a PointsSelector{1 ids list | 2 filter} to node ids. */
  private def resolveSelector(req: Seq[PF], sel: Seq[PF], coll: String): Seq[String] =
    Protobuf.find(sel, 1) match {
      case Some(idsList) =>
        Protobuf.all(idsList.msg, 1).map(p => s"$coll:${pointIdNum(p.msg)}")
      case None =>
        val f = Protobuf.find(sel, 2).getOrElse(
          throw new IllegalArgumentException("selector needs ids or filter"))
        val fs = f.msg
        def conds(no: Int): Seq[Column] = Protobuf.all(fs, no).map(c => condition(c.msg))
        val filter = Filter(must = conds(2), mustNot = conds(3), should = conds(1))
        pointsOf(req).filter(QdrantPoints.pred(filter))
          .select(col(idCol)).collect()
          .map(r => s"$coll:${r.getAs[Number](0).longValue()}").toSeq
    }

  private def completedResponse(secs: => Double): Protobuf.W =
    Protobuf.w().msg(1, Protobuf.w().uint(2, 2)).double(2, secs)

  /** Map-property keys currently present on the target nodes (bounded
    * point read — payload mutations are point operations).
    */
  private def existingMapKeys(s: graft.graph.GraphStore,
      nodeIds: Seq[String]): Seq[String] =
    if (nodeIds.isEmpty) Nil
    else s.snapshot.nodes.filter(col("id").isin(nodeIds: _*))
      .select(explode(map_keys(col("properties"))).as("k"))
      .distinct().collect().map(_.getString(0)).toSeq

  /** SetPayloadPoints{1 collection, 3 payload, 5 points_selector} —
    * merge keys onto the targets; `overwrite` first drops keys absent
    * from the new payload (points_service.go:487-530 updatePayload).
    */
  private def setPayload(req: Seq[PF], secs: => Double,
      overwrite: Boolean): Protobuf.W = {
    val s = mutationStore
    val coll = collectionOf(req)
    val payload = Protobuf.all(req, 3).map(_.msg).flatMap { e =>
      Protobuf.find(e, 1).map(_.str).map { k =>
        k -> Protobuf.find(e, 2).map(v => valueToAny(v.msg)).orNull
      }
    }.toMap
    require(payload.nonEmpty, "payload is required")
    val sel = Protobuf.find(req, 5).getOrElse(
      throw new IllegalArgumentException("points_selector is required")).msg
    val nodeIds = resolveSelector(req, sel, coll)
    val spark = s.snapshot.nodes.sparkSession
    import spark.implicits._
    if (overwrite)
      existingMapKeys(s, nodeIds).filterNot(payload.contains).foreach { k =>
        s.setNodeProperties(nodeIds.map(id => (id, null: String)).toDF("id", "newval"), k)
      }
    payload.foreach { case (k, v) =>
      s.setNodeProperties(nodeIds.map(id => (id, String.valueOf(v))).toDF("id", "newval"), k)
    }
    completedResponse(secs)
  }

  /** DeletePayloadPoints{1 collection, 3 keys, 5 points_selector}. */
  private def deletePayload(req: Seq[PF], secs: => Double): Protobuf.W = {
    val s = mutationStore
    val coll = collectionOf(req)
    val keys = Protobuf.all(req, 3).map(_.str)
    require(keys.nonEmpty, "keys are required")
    val sel = Protobuf.find(req, 5).getOrElse(
      throw new IllegalArgumentException("points_selector is required")).msg
    val nodeIds = resolveSelector(req, sel, coll)
    val spark = s.snapshot.nodes.sparkSession
    import spark.implicits._
    keys.foreach { k =>
      s.setNodeProperties(nodeIds.map(id => (id, null: String)).toDF("id", "newval"), k)
    }
    completedResponse(secs)
  }

  /** ClearPayloadPoints{1 collection, 3 points selector}: drop every
    * map-property key on the targets.
    */
  private def clearPayload(req: Seq[PF], secs: => Double): Protobuf.W = {
    val s = mutationStore
    val coll = collectionOf(req)
    val sel = Protobuf.find(req, 3).getOrElse(
      throw new IllegalArgumentException("points selector is required")).msg
    val nodeIds = resolveSelector(req, sel, coll)
    val spark = s.snapshot.nodes.sparkSession
    import spark.implicits._
    existingMapKeys(s, nodeIds).foreach { k =>
      s.setNodeProperties(nodeIds.map(id => (id, null: String)).toDF("id", "newval"), k)
    }
    completedResponse(secs)
  }

  /** UpdatePointVectors{1 collection, 3 points PointVectors{1 id,
    * 2 vectors{1 vector{1 data}}}} — one batched embedding upsert.
    */
  private def updateVectors(req: Seq[PF], secs: => Double): Protobuf.W = {
    val s = mutationStore
    val coll = collectionOf(req)
    val rows = Protobuf.all(req, 3).map(_.msg).flatMap { pv =>
      val id = pointIdNum(Protobuf.find(pv, 1).getOrElse(
        throw new IllegalArgumentException("point vectors need an id")).msg)
      Protobuf.find(pv, 2).flatMap(vs =>
        Protobuf.find(vs.msg, 1).map(v => vectorOf(v.msg, 1)))
        .map(vec => (s"$coll:$id", "embedding", vec))
    }
    require(rows.nonEmpty, "points with vectors are required")
    val spark = s.snapshot.nodes.sparkSession
    import spark.implicits._
    s.setNodeVectorProperties(rows.toDF("entity_id", "name", "embedding"))
    completedResponse(secs)
  }

  /** DeletePointVectors{1 collection, 3 points_selector}: remove the
    * targets' embeddings (they drop out of every search RPC — the
    * store-points view inner-joins on embeddings).
    */
  private def deleteVectors(req: Seq[PF], secs: => Double): Protobuf.W = {
    val s = mutationStore
    val coll = collectionOf(req)
    val sel = Protobuf.find(req, 3).getOrElse(
      throw new IllegalArgumentException("points_selector is required")).msg
    val nodeIds = resolveSelector(req, sel, coll)
    s.deleteNodeEmbeddings(nodeIds)
    completedResponse(secs)
  }

  // ====================================================== snapshots ======

  /** Snapshot artifacts live under one root per server (the reference
    * stores them as NornicDB snapshot artifacts, `snapshots_service.go`);
    * Create is a full GraphStore.persist — partitioned parquet through
    * the cluster writers, no driver collect.
    */
  private lazy val snapshotsRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("qdrant_snapshots")
    p.toFile.deleteOnExit()
    p
  }
  private[graft] def snapshotsDir: String = snapshotsRoot.toString

  private def dirSize(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(dirSize).sum

  private def snapshotDesc(name: String): Protobuf.W = {
    val dir = snapshotsRoot.resolve(name).toFile
    Protobuf.w().str(1, name).uint(3, dirSize(dir))
  }

  /** CreateSnapshotRequest{1 collection} → {1 SnapshotDescription{1 name,
    * 3 size}, 2 time}. Deterministic names: `<collection>-v<version>`.
    */
  private def snapshotCreate(req: Seq[PF], secs: => Double): Protobuf.W = {
    val s = mutationStore
    val coll = collectionOf(req)
    require(collections.contains(coll), s"collection not found: $coll")
    val name = s"$coll-v${s.version}"
    s.persist(snapshotsRoot.resolve(name).toString)
    Protobuf.w().msg(1, snapshotDesc(name)).double(2, secs)
  }

  private def snapshotList(req: Seq[PF], secs: => Double): Protobuf.W = {
    val coll = collectionOf(req)
    val resp = Protobuf.w()
    Option(snapshotsRoot.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$coll-v"))
      .map(_.getName).sorted
      .foreach(n => resp.msg(1, snapshotDesc(n)))
    resp.double(2, secs)
  }

  private def snapshotDelete(req: Seq[PF], secs: => Double): Protobuf.W = {
    val coll = collectionOf(req)
    val name = Protobuf.find(req, 2).map(_.str).getOrElse(
      throw new IllegalArgumentException("snapshot_name is required"))
    require(name.startsWith(s"$coll-v") && !name.contains("..") && !name.contains("/"),
      s"unknown snapshot $name for collection $coll")
    val dir = snapshotsRoot.resolve(name).toFile
    if (!dir.exists()) throw new GrpcError(5, s"snapshot not found: $name")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(dir)
    Protobuf.w().double(1, secs)
  }

  // ==================================================== collections ======

  private def collectionsCreate(req: Seq[PF], secs: => Double): Protobuf.W = {
    val name = collectionOf(req)
    require(!collections.contains(name), s"collection already exists: $name")
    // store-backed endpoints give new collections live point storage
    // (label = collection); read-only endpoints register metadata only
    collections.put(name, store.map(s =>
      () => QdrantGrpcServer.storePoints(s, name)))
    Protobuf.w().bool(1, true).double(2, secs)
  }

  private def collectionsList(secs: => Double): Protobuf.W = {
    val resp = Protobuf.w()
    collections.keys.toSeq.sorted.foreach(n =>
      resp.msg(1, Protobuf.w().str(1, n)))
    resp.double(2, secs)
  }

  private def collectionsDelete(req: Seq[PF], secs: => Double): Protobuf.W = {
    val name = collectionOf(req)
    val existed = collections.remove(name).isDefined
    Protobuf.w().bool(1, existed).double(2, secs)
  }

  private def collectionsExists(req: Seq[PF], secs: => Double): Protobuf.W =
    Protobuf.w()
      .msg(1, Protobuf.w().bool(1, collections.contains(collectionOf(req))))
      .double(2, secs)

  /** Get: minimal-but-valid CollectionInfo{1 status = 1 Green} (the
    * reference also fills defaults only, collections_service.go).
    */
  private def collectionsGet(req: Seq[PF], secs: => Double): Protobuf.W = {
    val name = collectionOf(req)
    if (!collections.contains(name))
      throw new GrpcError(5, s"collection not found: $name")
    Protobuf.w().msg(1, Protobuf.w().uint(1, 1)).double(2, secs)
  }

  /** Update: validates existence, no-op — the engine manages its own
    * physical params (the reference's Update is the same no-op).
    */
  private def collectionsUpdate(req: Seq[PF], secs: => Double): Protobuf.W = {
    val name = collectionOf(req)
    if (!collections.contains(name))
      throw new GrpcError(5, s"collection not found: $name")
    Protobuf.w().bool(1, true).double(2, secs)
  }

  /** CreateFieldIndex{1 collection, 3 field_name} / DeleteFieldIndex —
    * recorded as layout hints in the store's SchemaCatalog (payload
    * filters here are Catalyst predicates; the hint drives nothing but
    * is listed by SHOW INDEXES, like the reference's registry entry).
    */
  private def fieldIndex(req: Seq[PF], secs: => Double,
      create: Boolean): Protobuf.W = {
    val coll = collectionOf(req)
    val field = Protobuf.find(req, 3).map(_.str).getOrElse(
      throw new IllegalArgumentException("field_name is required"))
    store.foreach { s =>
      val idxName = s"qdrant_${coll}_$field"
      if (create) s.catalog.createIndex(idxName, "PAYLOAD", coll, Seq(field))
      else s.catalog.dropIndex(idxName)
    }
    Protobuf.w()
      .msg(1, Protobuf.w().uint(2, 2)) // UpdateResult{status: Completed}
      .double(2, secs)
  }

  // ======================================================= transport =====

  private val contentType = "application/grpc-web+proto"

  private def trailers(status: Int, message: String): Array[Byte] = {
    val msg = message.replaceAll("[\r\n]", " ")
    Protobuf.grpcFrame(0x80,
      s"grpc-status: $status\r\ngrpc-message: $msg\r\n"
        .getBytes(StandardCharsets.UTF_8))
  }

  private def respondOk(ex: HttpExchange, message: Array[Byte]): Unit = {
    val body = Protobuf.grpcFrame(0, message) ++ trailers(0, "")
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(200, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }

  private def respondTrailersOnly(ex: HttpExchange, status: Int,
      message: String): Unit = {
    val body = trailers(status, message)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(200, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }
}

object QdrantGrpcServer {
  /** Store-backed points view: nodes labeled `collection` joined with
    * their "embedding"-named vectors; vec_id = node key. Filterable
    * payload columns: `vec_id`, `name` (hoisted); map-only payload keys
    * come back in responses but are not filterable (disclosed thin
    * layer — the reference hoists nothing and scans nodes instead,
    * points_service.go:436-443).
    */
  def storePoints(store: graft.graph.GraphStore, collection: String): DataFrame = {
    val emb = store.nodeEmbeddings.filter(col("name") === "embedding")
      .select(col("entity_id").as("__nid"), col("embedding"))
    store.snapshot.nodesByLabel(collection)
      .select(col("id").as("__nid"), col("key").as("vec_id"),
        col("name"), col("properties"))
      .join(emb, "__nid").drop("__nid")
  }

  /** Read-write endpoint over a [[graft.graph.GraphStore]]: Upsert/Get/
    * Delete mutate nodes + embeddings, Create registers live
    * label-backed collections, and every search RPC sees committed
    * writes (the reference's unified-index promise, server.go:12-15).
    */
  def forStore(store: graft.graph.GraphStore, collection: String = "points",
      port: Int = 0, token: Option[String] = None,
      rbac: Option[ServerAuth.Rbac] = None): QdrantGrpcServer =
    new QdrantGrpcServer(() => storePoints(store, collection), "vec_id",
      "embedding", port, token, collection, Some(store), rbac)
}
