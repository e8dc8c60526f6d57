package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Server configuration — the engine's analog of the reference's config
  * contract (`/root/reference/pkg/config/config.go`,
  * `nornicdb.example.yaml`, `cmd/nornicdb/main.go:71-142`):
  *
  *   precedence:  command-line flags  >  NORNICDB_* environment  >  YAML
  *                config file  >  defaults;
  *   search order for the file (config.go:2420-2461): NORNICDB_CONFIG,
  *   ~/.nornicdb/config.yaml, ./config.yaml, ./nornicdb.yaml,
  *   /config/nornicdb.yaml, /config/config.yaml,
  *   ~/.config/nornicdb/config.yaml.
  *
  * The YAML reader handles the subset the reference config actually uses —
  * nested maps by indentation, scalars (quoted or bare, inline `#`
  * comments), and `- item` string lists. No external YAML dependency.
  */
final case class GraftConfig(
    host: String = "127.0.0.1",
    boltPort: Int = 7687,
    httpPort: Int = 7474,
    boltEnabled: Boolean = true,
    httpEnabled: Boolean = true,
    dataDir: String = "./data",
    // auth: None = disabled ("none"), Some((user, password)) = enabled
    adminUser: Option[(String, String)] = Some(("admin", "password")),
    minPasswordLength: Int = 8,
    tokenExpirySec: Long = 24 * 3600L,
    jwtSecret: String = "",
    maxFailedLogins: Int = 5,
    lockoutDurationMs: Long = 15 * 60 * 1000L,
    defaultDatabase: String = "neo4j",
    readOnly: Boolean = false,
    encryptionPassword: String = "",
    pluginsDir: String = "./plugins",
    mcpEnabled: Boolean = true,
    // TLS material (server.tls in the example yaml, config.go:218-243):
    // PEM cert chain + PKCS#8 key, or a base directory with
    // public.crt/private.key (the NORNICDB_TLS_DIR contract)
    tlsEnabled: Boolean = false,
    tlsCertFile: String = "",
    tlsKeyFile: String = "",
    tlsBaseDirectory: String = "",
    httpsEnabled: Boolean = false,
    httpsPort: Int = 7473,
    qdrantGrpcEnabled: Boolean = false,
    qdrantGrpcPort: Int = 6334,
    heimdallEnabled: Boolean = false,
    heimdallIntervalMs: Long = 60 * 60 * 1000L,
    // per-task feature flags + display model name (heimdall types.go:
    // 174-200 defaults: anomaly/runtime on, curation experimental-off)
    heimdallAnomalyDetection: Boolean = true,
    heimdallRuntimeDiagnosis: Boolean = true,
    heimdallMemoryCuration: Boolean = false,
    heimdallModel: String = "deterministic-standin",
    // OpenAI-compatible chat endpoint for the real-model analyst
    // (llama.cpp `llama-server`; scheduler.go:180 Manager.Generate).
    // Empty = the disclosed deterministic stand-in (zero-egress default).
    heimdallApiUrl: String = "",
    heimdallApiKey: String = "",
    environment: String = "development") {

  def authEnabled: Boolean = adminUser.isDefined
}

object GraftConfig {

  /** Parse a Go-style duration ("100ms", "30s", "15m", "24h"); bare numbers
    * are seconds (main.go parses durations with time.ParseDuration).
    */
  def durationMs(s: String): Long = {
    val t = s.trim
    def num(suffix: String): Option[Double] =
      if (t.endsWith(suffix))
        t.dropRight(suffix.length).trim.toDoubleOption
      else None
    num("ms").map(_.toLong)
      .orElse(num("s").map(d => (d * 1000).toLong))
      .orElse(num("m").map(d => (d * 60 * 1000).toLong))
      .orElse(num("h").map(d => (d * 3600 * 1000).toLong))
      .orElse(t.toDoubleOption.map(d => (d * 1000).toLong))
      .getOrElse(0L)
  }

  /** Flatten the YAML subset into dotted keys ("server.bolt_port" →
    * "7687"); `- item` lists land under their key joined by ' '.
    */
  def parseYaml(text: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // stack of (indent, dottedPrefix)
    var stack = List.empty[(Int, String)]
    var listKey: Option[String] = None
    text.linesIterator.foreach { raw =>
      val noTabs = raw.replace("\t", "  ")
      val trimmed = noTabs.trim
      if (trimmed.nonEmpty && !trimmed.startsWith("#")) {
        val indent = noTabs.takeWhile(_ == ' ').length
        def unquote(v0: String): String = {
          // strip an inline comment only outside quotes
          val v = if (v0.startsWith("\"") || v0.startsWith("'")) v0
            else v0.split(" #", 2).head.trim
          if (v.length >= 2 && ((v.head == '"' && v.last == '"') ||
              (v.head == '\'' && v.last == '\''))) v.substring(1, v.length - 1)
          else v
        }
        if (trimmed.startsWith("- ") || trimmed == "-") {
          listKey.foreach { k =>
            val item = unquote(trimmed.stripPrefix("-").trim)
            out(k) = out.get(k).filter(_.nonEmpty)
              .map(_ + " " + item).getOrElse(item)
          }
        } else {
          listKey = None
          stack = stack.dropWhile(_._1 >= indent)
          val prefix = stack.headOption.map(_._2 + ".").getOrElse("")
          val idx = trimmed.indexOf(':')
          if (idx > 0) {
            val key = prefix + trimmed.substring(0, idx).trim
            val value = trimmed.substring(idx + 1).trim
            if (value.isEmpty || value == "|" || value == ">") {
              // section header (or a key whose value is a list)
              stack = (indent, key) :: stack
              listKey = Some(key)
              out.getOrElseUpdate(key, "")
            } else out(key) = unquote(value)
          }
        }
      }
    }
    out.toMap
  }

  /** Config file discovery, mirroring config.go:2420-2461's order. */
  def findConfigFile(env: String => Option[String] = k => sys.env.get(k),
      cwd: String = "."): Option[String] = {
    val home = System.getProperty("user.home", "")
    val candidates =
      env("NORNICDB_CONFIG").filter(_.trim.nonEmpty).toSeq ++ Seq(
        s"$home/.nornicdb/config.yaml",
        s"$cwd/config.yaml", s"$cwd/nornicdb.yaml",
        "/config/nornicdb.yaml", "/config/config.yaml",
        s"$home/.config/nornicdb/config.yaml")
    candidates.find(p => new File(p).isFile)
  }

  /** Load with the reference's precedence: `flags` (from the CLI) beat
    * `env` (NORNICDB_*) beat the `file` beat defaults. `env` and flag maps
    * are injected so specs can exercise precedence hermetically.
    */
  def load(path: Option[String] = None,
      env: String => Option[String] = k => sys.env.get(k),
      flags: Map[String, String] = Map.empty): GraftConfig = {
    val filePath = path.filter(_.trim.nonEmpty).orElse(findConfigFile(env))
    val y: Map[String, String] = filePath match {
      case Some(p) =>
        parseYaml(new String(Files.readAllBytes(new File(p).toPath),
          StandardCharsets.UTF_8))
      case None => Map.empty
    }
    // resolution helpers: flag name, env names, yaml keys (first hit wins
    // within each tier)
    def pick(flag: String, envs: Seq[String], yamls: Seq[String]): Option[String] =
      flags.get(flag)
        .orElse(envs.view.flatMap(env(_)).headOption)
        .orElse(yamls.view.flatMap(y.get).filter(_.nonEmpty).headOption)
    def bool(v: String): Boolean =
      Seq("true", "1", "yes", "on").contains(v.trim.toLowerCase)

    val d = GraftConfig()
    val host = pick("address", Seq("NORNICDB_ADDRESS", "NORNICDB_BOLT_ADDRESS"),
      Seq("server.host")).getOrElse(d.host)
    val boltPort = pick("bolt-port", Seq("NORNICDB_BOLT_PORT"),
      Seq("server.bolt_port")).flatMap(_.toIntOption).getOrElse(d.boltPort)
    val httpPort = pick("http-port", Seq("NORNICDB_HTTP_PORT"),
      Seq("server.http_port")).flatMap(_.toIntOption).getOrElse(d.httpPort)
    val boltEnabled = pick("bolt-enabled", Seq("NORNICDB_BOLT_ENABLED"),
      Seq("server.bolt_enabled")).map(bool).getOrElse(d.boltEnabled)
    val httpEnabled = pick("http-enabled", Seq("NORNICDB_HTTP_ENABLED"),
      Seq("server.http_enabled")).map(bool).getOrElse(d.httpEnabled)
    val dataDir = pick("data-dir", Seq("NORNICDB_DATA_DIR"),
      Seq("server.data_dir", "database.data_dir", "storage.path"))
      .getOrElse(d.dataDir)

    // NORNICDB_AUTH uses "/" (Neo4j convention) — the YAML uses ":"
    // (config.go:22, example yaml server.auth). "none" disables auth; the
    // dedicated auth: section (enabled/username/password) also applies.
    val authSpec = pick("auth", Seq("NORNICDB_AUTH"), Seq("server.auth"))
    val noAuthFlag = flags.get("no-auth").exists(bool)
    val authSectionOff = y.get("auth.enabled").exists(v => !bool(v))
    val adminUser: Option[(String, String)] =
      if (noAuthFlag) None
      else authSpec match {
        case Some("none") => None
        case Some(s) =>
          val sep = if (s.contains("/")) "/" else ":"
          val parts = s.split(sep, 2)
          if (parts.length == 2) Some((parts(0), parts(1)))
          else d.adminUser
        case None if authSectionOff => None
        case None =>
          val u = y.getOrElse("auth.username", "admin")
          val p = flags.get("admin-password")
            .orElse(y.get("auth.password")).getOrElse("password")
          Some((u, p))
      }
    // --admin-password overrides whatever the file said
    val adminFinal = adminUser.map { case (u, p) =>
      (u, flags.getOrElse("admin-password", p))
    }

    GraftConfig(
      host = host, boltPort = boltPort, httpPort = httpPort,
      boltEnabled = boltEnabled, httpEnabled = httpEnabled,
      dataDir = dataDir, adminUser = adminFinal,
      minPasswordLength = pick("min-password-length",
        Seq("NORNICDB_MIN_PASSWORD_LENGTH"), Seq("auth.min_password_length"))
        .flatMap(_.toIntOption).getOrElse(d.minPasswordLength),
      tokenExpirySec = pick("token-expiry", Seq("NORNICDB_AUTH_TOKEN_EXPIRY"),
        Seq("auth.token_expiry")).map(v => durationMs(v) / 1000)
        .getOrElse(d.tokenExpirySec),
      jwtSecret = pick("jwt-secret", Seq("NORNICDB_AUTH_JWT_SECRET"),
        Seq("auth.jwt_secret")).getOrElse(d.jwtSecret),
      maxFailedLogins = pick("max-failed-logins",
        Seq("NORNICDB_MAX_FAILED_LOGINS"), Seq("compliance.max_failed_logins"))
        .flatMap(_.toIntOption).getOrElse(d.maxFailedLogins),
      lockoutDurationMs = pick("lockout-duration",
        Seq("NORNICDB_LOCKOUT_DURATION"), Seq("compliance.lockout_duration"))
        .map(durationMs).getOrElse(d.lockoutDurationMs),
      defaultDatabase = pick("default-database",
        Seq("NORNICDB_DEFAULT_DATABASE"), Seq("database.default_database"))
        .getOrElse(d.defaultDatabase),
      readOnly = pick("read-only", Seq("NORNICDB_READ_ONLY"),
        Seq("database.read_only")).map(bool).getOrElse(d.readOnly),
      encryptionPassword = pick("encryption-password",
        Seq("NORNICDB_ENCRYPTION_PASSWORD"),
        Seq("database.encryption_password")).getOrElse(d.encryptionPassword),
      pluginsDir = pick("plugins-dir", Seq("NORNICDB_PLUGINS_DIR"),
        Seq("server.plugins_dir")).getOrElse(d.pluginsDir),
      mcpEnabled = pick("mcp-enabled", Seq("NORNICDB_MCP_ENABLED"),
        Seq("server.mcp_enabled")).map(bool).getOrElse(d.mcpEnabled),
      tlsEnabled = pick("bolt-tls-enabled", Seq("NORNICDB_BOLT_TLS_ENABLED"),
        Seq("server.tls.enabled")).map(bool).getOrElse(d.tlsEnabled),
      tlsCertFile = pick("tls-cert", Nil, Seq("server.tls.cert_file"))
        .getOrElse(d.tlsCertFile),
      tlsKeyFile = pick("tls-key", Nil, Seq("server.tls.key_file"))
        .getOrElse(d.tlsKeyFile),
      tlsBaseDirectory = pick("tls-dir", Seq("NORNICDB_TLS_DIR"),
        Seq("server.tls.base_directory")).getOrElse(d.tlsBaseDirectory),
      httpsEnabled = pick("https-enabled", Seq("NORNICDB_HTTPS_ENABLED"),
        Seq("server.https.enabled")).map(bool).getOrElse(d.httpsEnabled),
      httpsPort = pick("https-port", Seq("NORNICDB_HTTPS_PORT"),
        Seq("server.https.port")).flatMap(_.toIntOption).getOrElse(d.httpsPort),
      qdrantGrpcEnabled = pick("qdrant-grpc-enabled",
        Seq("NORNICDB_QDRANT_GRPC_ENABLED"), Seq("qdrant_grpc.enabled"))
        .map(bool).getOrElse(d.qdrantGrpcEnabled),
      qdrantGrpcPort = pick("qdrant-grpc-listen-addr",
        Seq("NORNICDB_QDRANT_GRPC_LISTEN_ADDR"), Seq("qdrant_grpc.listen_addr"))
        .map(a => a.split(":").last.trim)
        .flatMap(_.toIntOption).getOrElse(d.qdrantGrpcPort),
      heimdallEnabled = pick("heimdall-enabled",
        Seq("NORNICDB_HEIMDALL_ENABLED"), Seq("heimdall.enabled"))
        .map(bool).getOrElse(d.heimdallEnabled),
      heimdallIntervalMs = pick("heimdall-interval",
        Seq("NORNICDB_HEIMDALL_INTERVAL"), Seq("heimdall.interval"))
        .map(durationMs).getOrElse(d.heimdallIntervalMs),
      heimdallAnomalyDetection = pick("heimdall-anomaly-detection",
        Seq("NORNICDB_HEIMDALL_ANOMALY_DETECTION"),
        Seq("heimdall.anomaly_detection")).map(bool)
        .getOrElse(d.heimdallAnomalyDetection),
      heimdallRuntimeDiagnosis = pick("heimdall-runtime-diagnosis",
        Seq("NORNICDB_HEIMDALL_RUNTIME_DIAGNOSIS"),
        Seq("heimdall.runtime_diagnosis")).map(bool)
        .getOrElse(d.heimdallRuntimeDiagnosis),
      heimdallMemoryCuration = pick("heimdall-memory-curation",
        Seq("NORNICDB_HEIMDALL_MEMORY_CURATION"),
        Seq("heimdall.memory_curation")).map(bool)
        .getOrElse(d.heimdallMemoryCuration),
      heimdallModel = pick("heimdall-model", Seq("NORNICDB_HEIMDALL_MODEL"),
        Seq("heimdall.model")).getOrElse(d.heimdallModel),
      heimdallApiUrl = pick("heimdall-api-url",
        Seq("NORNICDB_HEIMDALL_API_URL"), Seq("heimdall.api_url"))
        .getOrElse(d.heimdallApiUrl),
      heimdallApiKey = pick("heimdall-api-key",
        Seq("NORNICDB_HEIMDALL_API_KEY"), Seq("heimdall.api_key"))
        .getOrElse(d.heimdallApiKey),
      environment = pick("environment", Seq("NORNICDB_ENV"),
        Seq("server.environment")).getOrElse(d.environment))
  }
}
