package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.Row

import graft.graph.PropertyGraph

/** Thin Bolt server loop over the existing PackStream layer — enough for a
  * stock Neo4j driver to connect over `bolt://` and run read queries.
  *
  * Behavioral spec: `/root/reference/pkg/bolt/server.go`:
  *   - handshake (server.go:866-897): 4-byte magic 60 60 B0 17, 16 bytes of
  *     proposed versions, server answers `00 00 04 04` (Bolt 4.4);
  *   - chunked messages (server.go:970-1007): 2-byte BE length per chunk,
  *     empty chunk terminates; each message is a PackStream struct whose
  *     signature routes it (server.go:1032-1058);
  *   - RUN [query, params, extra] executes Cypher (server.go:1243,1376);
  *     SUCCESS carries `fields` (server.go:1357);
  *   - PULL streams RECORD messages then SUCCESS with `type`/`db`, honoring
  *     the `n` option and `has_more` (server.go:1422-1520);
  *   - FAILURE carries {code, message} (server.go:1831); post-failure
  *     requests are IGNORED until RESET (standard Bolt state machine).
  *
  * One JVM thread per connection; the query itself runs on the Spark
  * cluster — the server loop only streams the already-bounded result rows
  * (the reference materializes `result.Rows` the same way,
  * server.go:1422). BEGIN/COMMIT/ROLLBACK answer SUCCESS: the engine is
  * statement-autocommit (snapshot swap per statement), matching the
  * reference's default executor mode.
  */
final class BoltServer(graph: () => PropertyGraph, port: Int = 0,
    token: Option[String] = None,
    store: Option[graft.graph.GraphStore] = None,
    rbac: Option[ServerAuth.Rbac] = None,
    tls: Option[javax.net.ssl.SSLContext] = None) {

  /** Connection RBAC (auth.go:183-188): write statements need `write` →
    * Neo.ClientError.Security.Forbidden. A bare `token` is an admin
    * credential.
    */
  private val effectiveRbac: Option[ServerAuth.Rbac] =
    rbac.orElse(ServerAuth.Rbac.legacy(token))

  // with TLS material the listener speaks bolt+s (the reference's
  // server.tls config / NORNICDB_BOLT_TLS_ENABLED); the session protocol
  // above the socket is identical
  private val server: ServerSocket = tls match {
    case Some(ctx) => ctx.getServerSocketFactory.createServerSocket(port)
    case None => new ServerSocket(port)
  }
  private val running = new AtomicBoolean(false)
  @volatile private var acceptor: Thread = _

  /** The bound TCP port (useful with `port = 0`). */
  def boundPort: Int = server.getLocalPort

  def start(): BoltServer = {
    running.set(true)
    acceptor = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          val t = new Thread(() => handle(sock), s"bolt-session-${sock.getPort}")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: java.net.SocketException => // closed during accept
        }
      }
    }, "bolt-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    this
  }

  def stop(): Unit = {
    running.set(false)
    server.close()
  }

  // ======================================================== session ======

  private def handle(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      val negotiated = handshake(in, out).getOrElse(return)
      // Bolt 5.0+ entity structs carry element_id fields — the record
      // encoder switches shape on the negotiated major
      val v5 = negotiated._1 >= 5
      var lastResult: Option[(Seq[String], Seq[Row])] = None
      var resultIndex = 0
      var failed = false
      var open = true
      // the reference refuses unauthenticated Bolt by default
      // (pkg/auth/auth.go); with auth configured, HELLO/LOGON must carry
      // `credentials` that resolve to a role before any RUN is served
      var role: Option[ServerAuth.Role] =
        if (effectiveRbac.isEmpty) Some(ServerAuth.Role.Admin) else None
      def authed = role.isDefined
      // wrong credentials → immediate FAILURE; absent credentials leave
      // the session unauthenticated (a 5.1 driver LOGONs next; anyone
      // else hits the RUN gate below). Returns false on FAILURE.
      def checkAuth(fields: Seq[_]): Boolean =
        (effectiveRbac, ServerAuth.boltCredentials(fields)) match {
          case (None, _) => role = Some(ServerAuth.Role.Admin); true
          case (Some(r), Some(c)) => r.resolve(Some(c)) match {
            case some @ Some(_) => role = some; true
            case None =>
              failed = true
              sendFailure(out, "Neo.ClientError.Security.Unauthorized",
                "invalid credentials")
              false
          }
          case (Some(_), None) => true // await LOGON; RUN stays gated
        }
      while (open) {
        readMessage(in) match {
          case None => // empty message: no-op
          case Some(msg) =>
            val (decoded, _) = PackStream.decode(msg, 0)
            val (sig, fields) = decoded match {
              case (s: Int, fs: Seq[_]) => (s, fs)
              case other =>
                throw new IllegalArgumentException(s"not a Bolt message: $other")
            }
            sig match {
              case 0x01 => // HELLO (auth map may ride along, Bolt ≤5.0)
                if (checkAuth(fields))
                  sendSuccess(out, Map("server" -> "graft/0.7",
                    "connection_id" -> s"bolt-${sock.getPort}"))
              case 0x6A => // LOGON (Bolt 5.1+ drivers split auth out of HELLO)
                if (checkAuth(fields)) sendSuccess(out, Map.empty)
              case 0x66 => // ROUTE (4.3+; neo4j:// drivers send it pre-RUN)
                // single-server routing table: this server fills all three
                // roles (the reference acks with ttl 300, server.go:1529-
                // 1537; addresses filled in so stock neo4j:// URIs work)
                val addr = s"127.0.0.1:$boundPort"
                sendSuccess(out, Map("rt" -> Map(
                  "ttl" -> 300L,
                  "db" -> "neo4j",
                  "servers" -> Seq(
                    Map("addresses" -> Seq(addr), "role" -> "ROUTE"),
                    Map("addresses" -> Seq(addr), "role" -> "READ"),
                    Map("addresses" -> Seq(addr), "role" -> "WRITE")))))
              case 0x02 => // GOODBYE
                open = false
              case 0x0F => // RESET
                lastResult = None; resultIndex = 0; failed = false
                sendSuccess(out, Map.empty)
              case 0x10 => // RUN [query, params, extra]
                if (failed) sendIgnored(out)
                else if (!authed) {
                  failed = true
                  sendFailure(out, "Neo.ClientError.Security.Unauthorized",
                    "authentication required before RUN")
                } else {
                  try {
                    val query = fields.head.toString
                    val params = fields.lift(1) match {
                      case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v }
                      case _ => Map.empty[String, Any]
                    }
                    // statements with write clauses route through
                    // CypherWrite against the store (statement-autocommit,
                    // server.go:1376 routes RUN to the same executor the
                    // write paths use) — read-only servers refuse them
                    val isWrite = BoltServer.isWriteStatement(query)
                    if (isWrite && !role.exists(
                        ServerAuth.can(_, ServerAuth.Permission.Write))) {
                      failed = true
                      sendFailure(out, "Neo.ClientError.Security.Forbidden",
                        "Write permission required")
                    } else graft.cypher.QueryGuard.guarded("neo4j", isWrite) {
                      val df =
                        if (isWrite && store.isDefined) {
                          val s = store.get
                          graft.cypher.CypherWrite.execute(s, query,
                            params.toMap).returned.getOrElse(
                            s.snapshot.nodes.sparkSession.emptyDataFrame)
                        } else graft.cypher.Cypher.run(graph(), query, params)
                      val cols = df.columns.toSeq
                      val rows = df.collect().toSeq
                      lastResult = Some((cols, rows))
                      resultIndex = 0
                      sendSuccess(out, Map("fields" -> cols, "t_first" -> 0L))
                    }
                  } catch {
                    case e: graft.cypher.QueryGuard.LimitExceeded =>
                      failed = true
                      sendFailure(out, "Neo.TransientError.General.ResourceExhausted",
                        Option(e.getMessage).getOrElse("query limit exceeded"))
                    case e: Exception =>
                      failed = true
                      sendFailure(out, "Neo.ClientError.Statement.SyntaxError",
                        Option(e.getMessage).getOrElse(e.toString))
                  }
                }
              case 0x3F => // PULL {n}
                if (failed) sendIgnored(out)
                else lastResult match {
                  case None => sendSuccess(out, Map.empty)
                  case Some((_, rows)) =>
                    val n = fields.headOption match {
                      case Some(m: Map[_, _]) =>
                        m.asInstanceOf[Map[String, Any]].get("n") match {
                          case Some(l: Long) => l.toInt
                          case _ => -1
                        }
                      case _ => -1
                    }
                    val end =
                      if (n < 0) rows.length
                      else math.min(rows.length, resultIndex + n)
                    while (resultIndex < end) {
                      writeFramed(out, PackStream.encodeRecord(
                        rows(resultIndex).toSeq.map(boltValue), v5))
                      resultIndex += 1
                    }
                    if (resultIndex < rows.length)
                      sendSuccess(out, Map("has_more" -> true))
                    else {
                      lastResult = None; resultIndex = 0
                      sendSuccess(out, Map("type" -> "r", "t_last" -> 0L,
                        "db" -> "graft"))
                    }
                }
              case 0x2F => // DISCARD
                if (failed) sendIgnored(out)
                else { lastResult = None; resultIndex = 0; sendSuccess(out, Map.empty) }
              case 0x11 | 0x12 | 0x13 => // BEGIN / COMMIT / ROLLBACK
                sendSuccess(out, Map.empty)
              case other =>
                failed = true
                sendFailure(out, "Neo.ClientError.Request.Invalid",
                  f"unknown message type 0x$other%02X")
            }
        }
      }
    } catch {
      case _: EOFException => // client hung up
      case _: java.net.SocketException =>
    } finally sock.close()
  }

  /** Versions this server speaks: the 4.x family the reference pins
    * (server.go:140-144, always answering 4.4) plus the 5.x family —
    * HELLO/LOGON split, element_id entity structs — so 5.x-only stock
    * drivers connect.
    */
  private val supportedVersions: Set[(Int, Int)] =
    ((0 to 4).map((4, _)) ++ (0 to 8).map((5, _))).toSet

  /** Negotiate the highest mutually supported version from the client's
    * four proposals (each word: [reserved, minor-range, minor, major] —
    * a range word like 00 03 04 05 proposes 5.4 down to 5.1). No common
    * version → answer 00 00 00 00 and hang up, per the Bolt spec.
    */
  private def handshake(in: InputStream, out: OutputStream): Option[(Int, Int)] = {
    val magic = readFully(in, 4)
    if (!(magic(0) == 0x60.toByte && magic(1) == 0x60.toByte &&
        magic(2) == 0xB0.toByte && magic(3) == 0x17.toByte)) return None
    val words = readFully(in, 16)
    val candidates = (0 until 4).flatMap { i =>
      val range = words(i * 4 + 1) & 0xFF
      val minor = words(i * 4 + 2) & 0xFF
      val major = words(i * 4 + 3) & 0xFF
      (math.max(0, minor - range) to minor).map((major, _))
    }
    val chosen = candidates.filter(supportedVersions).sortBy(identity).lastOption
    chosen match {
      case Some((maj, min)) =>
        out.write(Array[Byte](0x00, 0x00, min.toByte, maj.toByte))
      case None =>
        out.write(Array[Byte](0x00, 0x00, 0x00, 0x00))
    }
    out.flush()
    chosen
  }

  /** Read one chunk-framed message; None for the empty (no-op) message. */
  private def readMessage(in: InputStream): Option[Array[Byte]] = {
    val buf = new ByteArrayOutputStream()
    var done = false
    while (!done) {
      val hdr = readFully(in, 2)
      val size = ((hdr(0) & 0xFF) << 8) | (hdr(1) & 0xFF)
      if (size == 0) done = true
      else buf.write(readFully(in, size))
    }
    val b = buf.toByteArray
    if (b.isEmpty) None else Some(b)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new EOFException()
      off += r
    }
    b
  }

  private def writeFramed(out: OutputStream, message: Array[Byte]): Unit = {
    out.write(PackStream.frame(message))
    out.flush()
  }

  private def struct1(sig: Int, field: Any): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(0xB1); b.write(sig)
    PackStream.write(b, field)
    b.toByteArray
  }

  private def sendSuccess(out: OutputStream, meta: Map[String, Any]): Unit =
    writeFramed(out, struct1(0x70, meta))

  private def sendFailure(out: OutputStream, code: String, message: String): Unit =
    writeFramed(out, struct1(0x7F, Map("code" -> code, "message" -> message)))

  private def sendIgnored(out: OutputStream): Unit = {
    val b = new ByteArrayOutputStream()
    b.write(0xB0); b.write(0x7E)
    writeFramed(out, b.toByteArray)
  }

  /** Spark Row values → PackStream-encodable values (timestamps/dates as
    * ISO strings — the thin server's simplification). Entity-shaped
    * structs become real Bolt Node (0x4E) / Relationship (0x52)
    * structures with FNV-hashed numeric ids, exactly what a stock driver
    * materializes as graph types (packstream.go:527,701-727) — not plain
    * lists.
    */
  /** An entity struct's properties: the nested `properties` map when
    * present, else the hoisted top-level columns (the planner types
    * frequent properties as real columns) — the HTTP layer's fallback
    * (server_db.go:920-934), embedding vectors skipped.
    */
  private def entityProps(r: Row, metaKeys: Set[String]): Map[String, Any] = {
    val names = r.schema.fieldNames
    if (names.contains("properties") && r.getAs[Any]("properties") != null)
      r.getAs[scala.collection.Map[String, Any]]("properties")
        .map { case (k, mv) => k -> boltValue(mv) }.toMap
    else names.iterator
      .filterNot(k => metaKeys(k) || k.toLowerCase.contains("embedding"))
      .flatMap(k => Option(r.getAs[Any](k)).map(mv => k -> boltValue(mv)))
      .toMap
  }

  private[sources] def boltValue(v: Any): Any = v match {
    case r: Row if r.schema != null && {
        val f = r.schema.fieldNames.toSet
        f("id") && f("type") && f("start") && f("end") } =>
      PackStream.BoltRel(
        PackStream.hashStringToInt64(String.valueOf(r.getAs[Any]("id"))),
        PackStream.hashStringToInt64(String.valueOf(r.getAs[Any]("start"))),
        PackStream.hashStringToInt64(String.valueOf(r.getAs[Any]("end"))),
        String.valueOf(r.getAs[Any]("type")),
        entityProps(r, Set("id", "type", "start", "end", "properties")),
        // 5.x element ids ARE the native string ids the numerics hash from
        elementId = String.valueOf(r.getAs[Any]("id")),
        startElementId = String.valueOf(r.getAs[Any]("start")),
        endElementId = String.valueOf(r.getAs[Any]("end")))
    case r: Row if r.schema != null && {
        val f = r.schema.fieldNames.toSet
        f("id") && f("labels") } =>
      PackStream.BoltNode(
        PackStream.hashStringToInt64(String.valueOf(r.getAs[Any]("id"))),
        Option(r.getAs[scala.collection.Seq[String]]("labels")).map(_.toSeq)
          .getOrElse(Nil),
        entityProps(r, Set("id", "labels", "properties")),
        elementId = String.valueOf(r.getAs[Any]("id")))
    case s: scala.collection.Seq[_] => s.map(boltValue)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => k.toString -> boltValue(mv) }
    case r: Row => r.toSeq.map(boltValue)
    case t: java.sql.Timestamp => t.toString
    case d: java.sql.Date => d.toString
    case other => other
  }
}

object BoltServer {
  private[sources] val writeRe =
    """(?is).*\b(CREATE|MERGE|DELETE|REMOVE)\b.*|(?is).*\bSET\s.*""".r

  /** True when the statement carries a write clause. Quoted string
    * literals are blanked first so a keyword *inside a value* (e.g.
    * `WHERE n.name = 'SET x'`) never routes a read to the write path —
    * and on a store-less server a keyword-in-literal read keeps working.
    */
  private[sources] def isWriteStatement(query: String): Boolean = {
    val b = new StringBuilder(query.length)
    var i = 0
    var quote: Char = 0
    while (i < query.length) {
      val c = query.charAt(i)
      if (quote != 0) {
        if (c == '\\' && i + 1 < query.length) i += 1 // skip escaped char
        else if (c == quote) { quote = 0; b.append(' ') }
        // chars inside a literal are dropped
      } else if (c == '\'' || c == '"') quote = c
      else b.append(c)
      i += 1
    }
    writeRe.pattern.matcher(b.toString).matches()
  }

  /** Store-backed server: reads see the store's current snapshot, write
    * statements commit through [[graft.cypher.CypherWrite]].
    */
  def forStore(store: graft.graph.GraphStore, port: Int = 0,
      token: Option[String] = None,
      rbac: Option[ServerAuth.Rbac] = None): BoltServer =
    new BoltServer(() => store.snapshot, port, token, Some(store), rbac)
}
