package graft

import java.net.{InetSocketAddress, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphStore
import graft.streaming.{HeimdallScheduler, HttpAnalyst, HttpAnalystConfig}

/** Round 11: the Heimdall real-model analyst provider
  * (`pkg/heimdall/scheduler.go:180` Manager.Generate via the OpenAI
  * chat-completion wire form, `handler.go:207`) against a local stand-in:
  * scheduled task → provider-generated notification over Bifrost SSE,
  * request counters increment, provider failure degrades per-request to
  * the deterministic stand-in instead of erroring the task.
  */
class Round11HeimdallSpec extends AnyFunSuite {
  import TestSpark._

  private val providerCalls = new AtomicInteger
  private val client = HttpClient.newHttpClient()

  private def startProvider(): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress(0), 0)
    srv.createContext("/v1/chat/completions", { ex =>
      providerCalls.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val resp =
        if (!auth.contains("Bearer hm-key")) (401, """{"error":"no key"}""")
        else if (!body.contains("\"model\":\"tiny-slm\"") ||
          !body.contains("\"role\":\"system\"") ||
          !body.contains("\"role\":\"user\""))
          (400, """{"error":"bad request shape"}""")
        else {
          // echo the task tag from the user message to prove the
          // measured context reached the model
          val tag = """\[([a-z_]+)\]""".r.findFirstMatchIn(body)
            .map(_.group(1)).getOrElse("?")
          (200, s"""{"id":"cc-1","choices":[{"index":0,"message":{"role":"assistant","content":"MODEL VERDICT for $tag: all clear"},"finish_reason":"stop"}]}""")
        }
      val b = resp._2.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(resp._1, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    srv.start(); srv
  }

  test("scheduled task flows through the HTTP analyst and out over " +
      "Bifrost SSE; counters increment") {
    val provider = startProvider()
    try {
      val url = s"http://127.0.0.1:${provider.getAddress.getPort}"
      val analyst = new HttpAnalyst(HttpAnalystConfig(
        apiUrl = url, model = "tiny-slm", apiKey = "hm-key"))
      val store = new GraphStore(GraphQueries.graph(spark, sf))
      val h = new HeimdallScheduler(store, anomalyDetection = true,
        runtimeDiagnosis = true, analyst = analyst, model = "tiny-slm")

      // mount the bifrost surface and attach an SSE client
      val srv = HttpServer.create(new InetSocketAddress(0), 0)
      srv.createContext("/api/bifrost", (ex: com.sun.net.httpserver.HttpExchange) =>
        h.handleExchange(ex))
      srv.start()
      try {
        val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
        val sse = client.send(
          HttpRequest.newBuilder(URI.create(s"$base/api/bifrost/events")).GET().build(),
          HttpResponse.BodyHandlers.ofInputStream())
        assert(sse.statusCode() == 200)
        // greeting line first
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(sse.body(), StandardCharsets.UTF_8))
        val greeting = reader.readLine()
        assert(greeting.contains("Connected to Bifrost"), greeting)

        val runsBefore = HeimdallScheduler.taskRuns.get
        val r = h.runTaskNow("runtime_diagnosis")
        assert(r.level == "info")
        assert(r.content.startsWith("MODEL VERDICT for runtime_diagnosis"), r.content)
        assert(HeimdallScheduler.taskRuns.get == runsBefore + 1)
        assert(providerCalls.get >= 1)

        // the provider-generated analysis arrives at the SSE client
        val deadline = System.currentTimeMillis() + 5000
        var line: String = null
        while (line == null && System.currentTimeMillis() < deadline) {
          val l = reader.readLine()
          if (l != null && l.contains("MODEL VERDICT")) line = l
        }
        assert(line != null && line.contains("notification"), s"got: $line")
        h.stop()
      } finally srv.stop(0)
    } finally provider.stop(0)
  }

  test("provider failure degrades per-request to the deterministic " +
      "stand-in (wrong key, dead endpoint)") {
    val provider = startProvider()
    try {
      val url = s"http://127.0.0.1:${provider.getAddress.getPort}"
      // wrong key → 401 → fallback text (the stand-in's [task] context)
      val badKey = new HttpAnalyst(HttpAnalystConfig(
        apiUrl = url, model = "tiny-slm", apiKey = "wrong"))
      assert(badKey.analyze("chat", "ctx") == "[chat] ctx")
      // dead endpoint → transport error → same fallback
      val dead = new HttpAnalyst(HttpAnalystConfig(
        apiUrl = "http://127.0.0.1:9", model = "tiny-slm", timeoutMs = 500))
      assert(dead.analyze("anomaly_detection", "nodes=1") ==
        "[anomaly_detection] nodes=1")
    } finally provider.stop(0)
  }
}
