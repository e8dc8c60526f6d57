package graft

import java.io.{BufferedReader, File, FileOutputStream, InputStreamReader}
import java.net.{Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.jar.{JarEntry, JarOutputStream, Manifest => JarManifest}

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.{Cypher, Plugins}
import graft.sources.GraftConfig

/** Round-10 verdict items 2/3/5: the runnable server entrypoint
  * (`/root/reference/cmd/nornicdb/main.go:71-649`), the config contract
  * (`pkg/config/config.go`, `nornicdb.example.yaml`), runtime procedure
  * plugins (`pkg/nornicdb/plugins.go`, behavior from
  * `plugin_e2e_test.go`), and the Heimdall scheduler + Bifrost SSE bridge
  * (`pkg/heimdall/scheduler.go`, `bifrost.go`, `handler.go`).
  */
class Round10ServerSpec extends AnyFunSuite {
  import TestSpark._

  private val client = HttpClient.newHttpClient()

  private def get(url: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(url: String, body: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // ------------------------------------------------------------ config ----

  test("GraftConfig: YAML subset, env precedence, flags beat env beat file") {
    val yaml =
      """# example config (nornicdb.example.yaml shape)
        |server:
        |  host: "0.0.0.0"
        |  bolt_port: 7688   # inline comment
        |  http_port: 7475
        |  data_dir: /tmp/yaml-data
        |auth:
        |  username: alice
        |  password: wonderland
        |  token_expiry: 12h
        |database:
        |  read_only: true
        |""".stripMargin
    val f = new File(tmpDir("cfg"), "config.yaml")
    Files.write(f.toPath, yaml.getBytes(StandardCharsets.UTF_8))

    // file only
    val c1 = GraftConfig.load(path = Some(f.getPath), env = _ => None)
    assert(c1.host == "0.0.0.0" && c1.boltPort == 7688 && c1.httpPort == 7475)
    assert(c1.dataDir == "/tmp/yaml-data" && c1.readOnly)
    assert(c1.adminUser.contains(("alice", "wonderland")))
    assert(c1.tokenExpirySec == 12 * 3600L)

    // env beats file (NORNICDB_* contract, config.go)
    val env = Map("NORNICDB_BOLT_PORT" -> "9999", "NORNICDB_AUTH" -> "bob/builder")
    val c2 = GraftConfig.load(path = Some(f.getPath), env = env.get)
    assert(c2.boltPort == 9999 && c2.adminUser.contains(("bob", "builder")))

    // flags beat env
    val c3 = GraftConfig.load(path = Some(f.getPath), env = env.get,
      flags = Map("bolt-port" -> "1111", "auth" -> "none"))
    assert(c3.boltPort == 1111 && c3.adminUser.isEmpty && !c3.authEnabled)

    // durations: Go time.ParseDuration forms
    assert(GraftConfig.durationMs("100ms") == 100L)
    assert(GraftConfig.durationMs("30s") == 30000L)
    assert(GraftConfig.durationMs("15m") == 15 * 60000L)
    assert(GraftConfig.durationMs("24h") == 24 * 3600000L)

    // the shipped example file loads to the values it documents
    val ex = GraftConfig.load(path = Some("/root/repo/graft.example.yaml"),
      env = _ => None)
    assert(ex.boltPort == 7687 && ex.httpPort == 7474 && ex.host == "127.0.0.1")
    assert(ex.adminUser.contains(("admin", "password")) && ex.mcpEnabled)
    assert(ex.pluginsDir == "./plugins" && !ex.readOnly && !ex.qdrantGrpcEnabled)
    assert(ex.tokenExpirySec == 24 * 3600L && ex.lockoutDurationMs == 15 * 60000L)
    assert(!ex.heimdallEnabled && ex.heimdallIntervalMs == 3600000L)
  }

  // ----------------------------------------------------------- plugins ----

  /** Compile a tiny Java plugin with the in-JVM compiler and jar it — the
    * analog of plugin_e2e_test.go building a real `.so` before loading.
    */
  private def buildPluginJar(dir: File): File = {
    val src = new File(dir, "DemoPlugin.java")
    Files.write(src.toPath,
      """import java.util.*;
        |import java.util.function.Function;
        |public class DemoPlugin {
        |  public String name() { return "demo"; }
        |  public String version() { return "1.0.0"; }
        |  public String type() { return "function"; }
        |  public Map<String, Object> functions() {
        |    Map<String, Object> m = new LinkedHashMap<>();
        |    Function<Object[], Object> hello = args -> {
        |      Map<String, Object> row = new LinkedHashMap<>();
        |      row.put("greeting", "hello" + (args.length > 0 ? " " + args[0] : ""));
        |      return row;
        |    };
        |    m.put("custom.hello", Arrays.asList(hello, "says hello"));
        |    Function<Object[], Object> add = args ->
        |      ((Number) args[0]).longValue() + ((Number) args[1]).longValue();
        |    m.put("add", add);
        |    return m;
        |  }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val compiler = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(compiler != null, "JDK compiler available in test JVM")
    assert(compiler.run(null, null, null, src.getPath) == 0, "plugin compiles")

    val jar = new File(dir, "demo-plugin.jar")
    val mf = new JarManifest()
    mf.getMainAttributes.putValue("Manifest-Version", "1.0")
    mf.getMainAttributes.putValue("Plugin-Class", "DemoPlugin")
    val out = new JarOutputStream(new FileOutputStream(jar), mf)
    val cls = new File(dir, "DemoPlugin.class")
    out.putNextEntry(new JarEntry("DemoPlugin.class"))
    out.write(Files.readAllBytes(cls.toPath))
    out.closeEntry()
    out.close()
    jar
  }

  test("plugins: jar loads, CALL custom.hello() yields rows, bad jar warns") {
    Plugins.reset()
    val dir = new File(tmpDir("plugins"))
    buildPluginJar(dir)
    // a corrupt artifact beside it: must warn, not crash (plugins.go:96-102)
    Files.write(new File(dir, "broken.jar").toPath,
      "not a jar at all".getBytes(StandardCharsets.UTF_8))

    val stats = Plugins.loadFromDir(dir.getPath)
    assert(stats.loaded == 1 && stats.failed == 1)
    assert(stats.functions >= 2)
    assert(stats.warnings.exists(_.contains("broken.jar")))

    // namespaced name registers verbatim AND under apoc.<plugin>.<fn>
    val g = GraphQueries.graph(spark, sf)
    val rows = Cypher.run(g, "CALL custom.hello('world')").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "hello world")

    val yielded = Cypher.run(g,
      "CALL apoc.demo.custom.hello('there') YIELD greeting RETURN greeting AS g")
      .collect()
    assert(yielded.length == 1 && yielded(0).getString(0) == "hello there")

    // scalar result → single `value` column, primitive type kept
    val sum = Cypher.run(g, "CALL apoc.demo.add(20, 22)").collect()
    assert(sum.length == 1 && sum(0).getLong(0) == 42L)

    // catalog lists plugin procedures beside built-ins (plugins.go:104-113)
    assert(graft.cypher.Planner.procedureNames.contains("custom.hello"))
    Plugins.reset()
  }

  // ------------------------------------------------------ server boot ----

  test("GraftServer: config boot, all surfaces answer, WAL durability, shutdown") {
    val data = tmpDir("graft-data")
    val yaml =
      s"""server:
         |  host: 127.0.0.1
         |  bolt_port: 0
         |  http_port: 0
         |  auth: none
         |  data_dir: $data
         |qdrant_grpc:
         |  enabled: true
         |  listen_addr: ":0"
         |heimdall:
         |  enabled: true
         |  interval: 24h
         |""".stripMargin
    val f = new File(tmpDir("cfg2"), "graft.yaml")
    Files.write(f.toPath, yaml.getBytes(StandardCharsets.UTF_8))

    val cfg = GraftConfig.load(path = Some(f.getPath), env = _ => None)
    assert(!cfg.authEnabled && cfg.qdrantGrpcEnabled && cfg.heimdallEnabled)

    val h = GraftServer.boot(spark, cfg)
    try {
      assert(h.httpPort > 0 && h.boltPort > 0 && h.qdrantPort > 0)
      val base = s"http://127.0.0.1:${h.httpPort}"

      // HTTP discovery + health
      val (s1, b1) = get(s"$base/")
      assert(s1 == 200 && b1.contains("bolt"))

      // tx API write + read on the same listener
      val (s2, b2) = post(s"$base/db/neo4j/tx/commit",
        """{"statements":[{"statement":"CREATE (x:BootSpec {key: 910001, name: 'durable'})"}]}""")
      assert(s2 == 200 && b2.contains(""""errors":[]"""))
      val (_, b3) = post(s"$base/db/neo4j/tx/commit",
        """{"statements":[{"statement":"MATCH (x:BootSpec) RETURN x.name AS nm"}]}""")
      assert(b3.contains("durable"))

      // GraphQL mounted on the shared mux
      val (s4, b4) = post(s"$base/graphql", """{"query":"query { labels }"}""")
      assert(s4 == 200 && b4.contains("BootSpec"))

      // MCP on the shared mux
      assert(get(s"$base/mcp/health")._1 == 200)

      // Bolt: magic + version proposal → 4-byte answer
      val sock = new Socket("127.0.0.1", h.boltPort)
      try {
        val out = sock.getOutputStream
        out.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17,
          0, 0, 4, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
        out.flush()
        val ans = new Array[Byte](4)
        var read = 0
        while (read < 4) {
          val n = sock.getInputStream.read(ans, read, 4 - read)
          assert(n > 0); read += n
        }
        assert(ans(2) == 4 && ans(3) == 4) // negotiated 4.4
      } finally sock.close()

      // Qdrant gRPC port accepts connections
      new Socket("127.0.0.1", h.qdrantPort).close()

      // Heimdall status on the shared mux
      val (s5, b5) = get(s"$base/api/bifrost/status")
      assert(s5 == 200 && b5.contains("\"bifrost\""))
    } finally h.stop()

    // durability: a second boot over the same data dir replays the WAL
    val h2 = GraftServer.boot(spark, cfg.copy(
      qdrantGrpcEnabled = false, heimdallEnabled = false))
    try {
      val (_, back) = post(
        s"http://127.0.0.1:${h2.httpPort}/db/neo4j/tx/commit",
        """{"statements":[{"statement":"MATCH (x:BootSpec) RETURN x.name AS nm"}]}""")
      assert(back.contains("durable"), s"WAL replay lost the write: $back")
    } finally h2.stop()

    // graceful shutdown: the old HTTP port refuses further requests
    intercept[Exception](get(s"http://127.0.0.1:${h.httpPort}/"))
  }

  test("GraftServer: read-only mode refuses writes on every surface, reads pass") {
    val data = tmpDir("graft-ro")
    val cfg = GraftConfig(host = "127.0.0.1", boltPort = 0, httpPort = 0,
      adminUser = None, dataDir = data, readOnly = true,
      qdrantGrpcEnabled = false, heimdallEnabled = false)
    val h = GraftServer.boot(spark, cfg)
    try {
      val base = s"http://127.0.0.1:${h.httpPort}"
      val (_, w) = post(s"$base/db/neo4j/tx/commit",
        """{"statements":[{"statement":"CREATE (x:RoSpec {key: 1})"}]}""")
      assert(w.contains("Forbidden"), s"write must refuse in read-only: $w")
      val (s2, r) = post(s"$base/db/neo4j/tx/commit",
        """{"statements":[{"statement":"RETURN 1 AS one"}]}""")
      assert(s2 == 200 && r.contains(""""errors":[]"""), s"reads must pass: $r")
    } finally h.stop()
  }

  // ----------------------------------------------------------- heimdall ----

  test("Heimdall: Bifrost SSE delivers task notifications, chat + metrics") {
    val data = tmpDir("graft-heim")
    val cfg = GraftConfig(host = "127.0.0.1", boltPort = 0, httpPort = 0,
      adminUser = None, dataDir = data, boltEnabled = false,
      heimdallEnabled = true, heimdallIntervalMs = 24 * 3600 * 1000L)
    val h = GraftServer.boot(spark, cfg)
    try {
      val heim = h.heimdall.get
      val base = s"http://127.0.0.1:${h.httpPort}"

      // SSE handshake: connected greeting with a client_id
      val resp = client.send(HttpRequest.newBuilder(
          URI.create(s"$base/api/bifrost/events")).GET().build(),
        HttpResponse.BodyHandlers.ofInputStream())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type")
        .orElse("").startsWith("text/event-stream"))
      val reader = new BufferedReader(new InputStreamReader(
        resp.body(), StandardCharsets.UTF_8))
      def nextData(): String = {
        var line = reader.readLine()
        while (line != null && !line.startsWith("data: ")) line = reader.readLine()
        assert(line != null, "SSE stream ended early")
        line.stripPrefix("data: ")
      }
      val greeting = nextData()
      assert(greeting.contains("\"connected\"") && greeting.contains("client_id"))
      // registration is async from the client's view — wait for it
      var spin = 0
      while (!heim.isConnected && spin < 100) { Thread.sleep(20); spin += 1 }
      assert(heim.isConnected)

      // a scheduled task run notifies connected clients over the bridge
      val runsBefore = graft.streaming.HeimdallScheduler.taskRuns.get()
      val res = heim.runTaskNow("runtime_diagnosis")
      assert(res.level == "info" && res.content.contains("heap_used_mb"))
      val note = nextData()
      assert(note.contains("heimdall:runtime_diagnosis"))
      assert(graft.streaming.HeimdallScheduler.taskRuns.get() == runsBefore + 1)

      // anomaly task measures the live store shape
      val res2 = heim.runTaskNow("anomaly_detection")
      assert(res2.content.contains("nodes=") && res2.content.contains("dangling_endpoints="))
      assert(nextData().contains("heimdall:anomaly_detection"))

      // OpenAI-shaped chat endpoint (handler.go:207), non-streaming
      val (cs, cb) = post(s"$base/api/bifrost/chat/completions",
        """{"model":"x","messages":[{"role":"user","content":"how are the graphs"}]}""")
      assert(cs == 200 && cb.contains("\"choices\"") &&
        cb.contains("how are the graphs") && cb.contains("\"finish_reason\":\"stop\""))

      // status reflects the live counters
      val (_, st) = get(s"$base/api/bifrost/status")
      assert(st.contains("\"connection_count\":1"))

      // ...and the shared Prometheus exposition exports them
      val (_, prom) = get(s"$base/metrics")
      assert(prom.contains("nornicdb_heimdall_task_runs_total"))
      assert(prom.contains("nornicdb_bifrost_connected_clients 1"))
      reader.close()
    } finally h.stop()
  }
}
