package graft

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.cypher.Plugins
import graft.graph.{GraphStore, PropertyGraph}
import graft.sources._

/** The runnable server — the engine's `nornicdb serve` analog
  * (`/root/reference/cmd/nornicdb/main.go:71-649`): one entrypoint that
  * loads the YAML/env/flag config ([[GraftConfig]]), opens (or creates)
  * the WAL-backed [[GraphStore]] under the data directory, wires
  * authentication + RBAC from config, loads procedure plugins
  * ([[Plugins]]), and boots every protocol surface:
  *
  *   - HTTP on `http_port`: tx API (/db/{db}/tx[/commit]), the plain REST
  *     surface (discovery/health/status/metrics/nornicdb/gdpr/admin/auth),
  *     MCP at /mcp, and GraphQL at /graphql — one listener, one mux, like
  *     the reference's server_router.go;
  *   - Bolt on `bolt_port` (Neo4j drivers);
  *   - optionally the Qdrant-compatible gRPC surface (+ NornicSearch) on
  *     its own port (NORNICDB_QDRANT_GRPC_ENABLED, default off — matching
  *     config.go:517-523).
  *
  * Subcommands mirror the reference CLI: `serve` (default), `version`,
  * `init` (main.go:101-162). SIGINT/SIGTERM stop every listener
  * gracefully (main.go:629-647) via a JVM shutdown hook.
  *
  * Durability: every mutation commits through the store's [[graft.graph.DeltaLog]]
  * (delta rows only); restart replays checkpoint + tail, so `serve` over
  * an existing data dir resumes exactly where the last process stopped —
  * the reference's WAL recovery shape (`pkg/storage/wal_engine.go:28-45`).
  *
  * Read-only mode (NORNICDB_READ_ONLY) caps every resolved credential at
  * Viewer via [[ServerAuth.Rbac.maxRole]], so writes are refused on every
  * surface with the standard Forbidden shape.
  */
object GraftServer {

  private val version = "0.1.0"

  /** Everything `boot` started — the spec (and the shutdown hook) stops
    * it as one unit.
    */
  final case class Handles(config: GraftConfig, store: GraphStore,
      http: Option[HttpTxServer], bolt: Option[BoltServer],
      qdrant: Option[QdrantGrpcServer],
      authenticator: Option[Authenticator],
      pluginStats: Plugins.LoadStats,
      heimdall: Option[graft.streaming.HeimdallScheduler],
      https: Option[HttpTxServer] = None) {
    def httpPort: Int = http.map(_.boundPort).getOrElse(-1)
    def httpsPort: Int = https.map(_.boundPort).getOrElse(-1)
    def boltPort: Int = bolt.map(_.boundPort).getOrElse(-1)
    def qdrantPort: Int = qdrant.map(_.boundPort).getOrElse(-1)
    def stop(): Unit = {
      heimdall.foreach(_.stop())
      bolt.foreach(_.stop())
      qdrant.foreach(_.stop())
      https.foreach(_.stop())
      http.foreach(_.stop())
    }
  }

  /** Open the store under `dataDir`: WAL replay when a log exists,
    * otherwise a fresh empty graph whose mutations start logging
    * immediately (reference: nornicdb.Open on the BadgerDB dir).
    */
  def openStore(spark: SparkSession, dataDir: String): GraphStore = {
    val walDir = s"$dataDir/graph"
    new File(walDir).mkdirs()
    val hasCommits = Option(new File(s"$walDir/_log").listFiles())
      .exists(_.exists(_.getName.endsWith(".json")))
    if (hasCommits) GraphStore.loadWal(spark, walDir)
    else new GraphStore(PropertyGraph.empty(spark), walDir = Some(walDir))
  }

  /** Boot every configured surface; non-blocking (the caller owns the
    * wait). This is the test seam — `main` adds config discovery, the
    * banner, and the shutdown hook around it.
    */
  def boot(spark: SparkSession, cfg: GraftConfig): Handles = {
    val store = openStore(spark, cfg.dataDir)

    // ---- authentication (main.go:506-541): admin user + JWT secret ----
    val jwtSecret: Array[Byte] =
      if (cfg.jwtSecret.nonEmpty) cfg.jwtSecret.getBytes("UTF-8")
      else {
        // generated secret — tokens invalidate on restart (main.go:516-518)
        val b = new Array[Byte](32)
        new java.security.SecureRandom().nextBytes(b)
        b
      }
    val authenticator = cfg.adminUser.map { case (user, password) =>
      val a = new Authenticator(jwtSecret,
        minPasswordLength = cfg.minPasswordLength,
        maxFailedLogins = cfg.maxFailedLogins,
        lockoutDurationMs = cfg.lockoutDurationMs,
        tokenTtlSec = cfg.tokenExpirySec)
      // the configured admin password may be shorter than the user-facing
      // policy floor (the reference's default is literally "password");
      // admin bootstrap bypasses the policy like CreateUser in main.go:534
      // — the password is stored EXACTLY as configured, never padded, so
      // login always sees the same bytes the operator wrote down
      a.createUser(user, password, Seq(ServerAuth.Role.Admin),
          bypassPolicy = true)
        .left.foreach(e => System.err.println(s"admin user: ${e.message}"))
      a
    }
    val rbac = authenticator.map { a =>
      val base = a.rbac()
      if (cfg.readOnly) base.copy(maxRole = Some(ServerAuth.Role.Viewer))
      else base
    }.orElse {
      // read-only with auth "none": everyone is an anonymous Viewer so
      // writes refuse on every surface (config.go:116 applies regardless
      // of the auth provider)
      if (cfg.readOnly) Some(ServerAuth.Rbac(Map.empty,
        openRole = Some(ServerAuth.Role.Viewer),
        maxRole = Some(ServerAuth.Role.Viewer)))
      else None
    }

    // ---- runtime procedure plugins (plugins.go:56-148) ----
    val pluginStats = Plugins.loadFromDir(cfg.pluginsDir)
    pluginStats.warnings.foreach(w => System.err.println(s"plugin: $w"))

    // ---- Heimdall scheduled analysis (pkg/heimdall/scheduler.go) ----
    // built before HTTP so /api/bifrost mounts on the shared listener
    val heimdall =
      if (!cfg.heimdallEnabled) None
      else {
        // configured api_url → real chat-completion provider on the
        // Analyst seam (falls back to the deterministic summary per
        // request on provider failure); empty → zero-egress stand-in
        val analyst =
          if (cfg.heimdallApiUrl.isEmpty) graft.streaming.HeimdallScheduler.DeterministicAnalyst
          else new graft.streaming.HttpAnalyst(graft.streaming.HttpAnalystConfig(
            apiUrl = cfg.heimdallApiUrl, model = cfg.heimdallModel,
            apiKey = cfg.heimdallApiKey))
        Some(new graft.streaming.HeimdallScheduler(store,
          intervalMs = cfg.heimdallIntervalMs,
          anomalyDetection = cfg.heimdallAnomalyDetection,
          runtimeDiagnosis = cfg.heimdallRuntimeDiagnosis,
          memoryCuration = cfg.heimdallMemoryCuration,
          analyst = analyst,
          model = cfg.heimdallModel))
      }

    // ---- TLS material (server.tls / NORNICDB_TLS_DIR; config.go:218) ----
    val sslCtx =
      if (!cfg.tlsEnabled && !cfg.httpsEnabled) None
      else {
        val ctx = ServerTls.fromConfig(cfg.tlsCertFile, cfg.tlsKeyFile,
          cfg.tlsBaseDirectory)
        // fail-fast: an operator who configured encryption must never get
        // cleartext listeners because the cert silently failed to load
        if (ctx.isEmpty) throw new IllegalStateException(
          "tls: enabled but no loadable cert/key pair — refusing to start" +
            " (fix server.tls cert/key or unset tls/https enabled)")
        ctx
      }

    // ---- protocol surfaces ----
    // the production-only SSRF refusals key off the configured environment
    // (NewSecurityMiddlewareWithConfig, middleware.go) — round-11 ADVICE:
    // the guard default (dev) must never serve a production config
    val isDev = graft.sources.RequestValidation.isDev(cfg.environment)
    val graphql = new GraphQlServer(store, rbac = rbac, isDevelopment = isDev)
    // OAuth activates only with NORNICDB_AUTH_PROVIDER=oauth and a
    // user store to link identities into (oauth.go:99-112)
    val oauth = authenticator.flatMap(a =>
      OAuthConfig.fromEnv().map(c => new OAuthClient(c, a)))
    def buildHttp(port: Int, ctx: Option[javax.net.ssl.SSLContext]) = {
      val s = new HttpTxServer(store, port = port, rbac = rbac,
        authenticator = authenticator, oauth = oauth, tls = ctx,
        isDevelopment = isDev)
      s.mount("/graphql")(graphql.handleExchange)
      // the reference wraps /api/bifrost (status, SSE, chat) in withAuth
      // (server_router.go:211-219): require an authenticated role with
      // Read permission before any Heimdall data streams out
      heimdall.foreach(h => s.mount("/api/bifrost") { ex =>
        ServerAuth.roleOf(ex, rbac) match {
          case Some(role) if ServerAuth.can(role, ServerAuth.Permission.Read) =>
            h.handleExchange(ex)
          case Some(_) =>
            HttpTxServer.respondStatic(ex, 403,
              """{"error":"Read permission required"}""")
          case None =>
            HttpTxServer.respondStatic(ex, 401,
              """{"error":"authentication required"}""")
        }
      })
      s.start()
    }
    val http =
      if (!cfg.httpEnabled) None
      else Some(buildHttp(cfg.httpPort, None))
    // the HTTPS mux serves the same surface on its own port
    // (server.https in the example yaml; AllowHTTP = http_enabled here)
    val https =
      if (!cfg.httpsEnabled) None
      else sslCtx.map(c => buildHttp(cfg.httpsPort, Some(c)))
    val bolt =
      if (!cfg.boltEnabled) None
      else Some(new BoltServer(() => store.snapshot, port = cfg.boltPort,
        store = Some(store), rbac = rbac,
        tls = if (cfg.tlsEnabled) sslCtx else None).start())
    val qdrant =
      if (!cfg.qdrantGrpcEnabled) None
      else Some(new QdrantGrpcServer(
        () => store.nodeEmbeddings.selectExpr("entity_id AS vec_id", "embedding"),
        port = cfg.qdrantGrpcPort, store = Some(store), rbac = rbac,
        isDevelopment = isDev).start())

    heimdall.foreach(_.start())

    Handles(cfg, store, http, bolt, qdrant, authenticator, pluginStats,
      heimdall, https)
  }

  // ------------------------------------------------------------- CLI ----

  private def parseFlags(args: Seq[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val key = a.stripPrefix("--")
        if (key.contains("=")) {
          val Array(k, v) = key.split("=", 2)
          out += k -> v
        } else if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          out += key -> args(i + 1); i += 1
        } else out += key -> "true"
      }
      i += 1
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val (cmd, rest) =
      if (args.nonEmpty && !args(0).startsWith("--")) (args(0), args.drop(1).toSeq)
      else ("serve", args.toSeq)
    val flags = parseFlags(rest)

    cmd match {
      case "version" =>
        println(s"Graft v$version (Spark ${org.apache.spark.SPARK_VERSION})")

      case "init" =>
        val dataDir = flags.getOrElse("data-dir", "./data")
        Seq("", "/graph", "/indexes", "/embeddings")
          .foreach(d => new File(dataDir + d).mkdirs())
        println(s"initialized data directory: $dataDir")

      case "serve" =>
        val cfg = GraftConfig.load(path = flags.get("config"), flags = flags)
        val spark = GraftSession.get()
        val h = boot(spark, cfg)
        sys.addShutdownHook {
          System.err.println("shutting down...")
          h.stop()
        }
        println(s"Graft v$version ready")
        println(s"  data dir:  ${cfg.dataDir}")
        h.http.foreach(s => println(
          s"  HTTP API:  http://${cfg.host}:${s.boundPort}  (tx, REST, /mcp, /graphql)"))
        h.https.foreach(s => println(
          s"  HTTPS API: https://${cfg.host}:${s.boundPort}  (same surface, TLS)"))
        h.bolt.foreach(s => println(s"  Bolt:      bolt" +
          s"${if (cfg.tlsEnabled) "+s" else ""}://${cfg.host}:${s.boundPort}"))
        h.qdrant.foreach(s => println(s"  Qdrant:    grpc://${cfg.host}:${s.boundPort}"))
        println(s"  auth:      ${if (cfg.authEnabled) "enabled" else "DISABLED"}")
        if (h.pluginStats.loaded > 0) println(
          s"  plugins:   ${h.pluginStats.loaded} loaded (${h.pluginStats.functions} functions)")
        // block until SIGINT/SIGTERM — the shutdown hook stops the servers
        Thread.currentThread().join()

      case other =>
        System.err.println(s"unknown command: $other (serve|version|init)")
        sys.exit(1)
    }
  }
}
