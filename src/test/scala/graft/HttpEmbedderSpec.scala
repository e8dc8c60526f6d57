package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CachedEmbedder, Embedder, HttpEmbedder, HttpEmbedderConfig}

/** HTTP embedding providers against a local stand-in serving both wire
  * forms (`/root/reference/pkg/embed/embed.go`): Ollama
  * `{"model","prompt"}` → `{"embedding"}` per text, OpenAI batched
  * `{"model","input":[…]}` + Bearer → indexed `data` rows; plus the
  * FNV-keyed LRU CachedEmbedder (`cached_embedder.go`).
  */
class HttpEmbedderSpec extends AnyFunSuite {
  import TestSpark._

  private val ollamaCalls = new AtomicInteger
  private val openaiCalls = new AtomicInteger

  /** Deterministic 4-dim vector from the text length + first char. */
  private def fakeVec(t: String): Seq[Double] =
    Seq(t.length.toDouble, t.headOption.map(_.toInt).getOrElse(0).toDouble, 1.0, 0.5)

  private def startStub(): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress(0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length); ex.getResponseBody.write(b); ex.close()
    }
    srv.createContext("/api/embeddings", { ex =>
      ollamaCalls.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val prompt = """"prompt"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
      if (!body.contains("\"model\":\"mxbai-embed-large\""))
        respond(ex, 400, """{"error":"wrong model"}""")
      else respond(ex, 200,
        s"""{"embedding":[${fakeVec(prompt).mkString(",")}]}""")
    })
    srv.createContext("/v1/embeddings", { ex =>
      openaiCalls.incrementAndGet()
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains("Bearer sk-test-123")) { respond(ex, 401, """{"error":"no key"}"""); () }
      else {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val inputs = """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(
          body.substring(body.indexOf("["))).map(_.group(1)).toSeq
        // answer REVERSED to prove index-based reordering
        val rows = inputs.zipWithIndex.reverse.map { case (t, i) =>
          s"""{"embedding":[${fakeVec(t).mkString(",")}],"index":$i}"""
        }
        respond(ex, 200, s"""{"data":[${rows.mkString(",")}]}""")
      }
    })
    srv.createContext("/embedding", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val content = """"content"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
      respond(ex, 200, s"""{"embedding":[${fakeVec(content).mkString(",")}]}""")
    })
    srv.createContext("/embedding-list", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val content = """"content"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
      respond(ex, 200,
        s"""[{"index":0,"embedding":[[${fakeVec(content).mkString(",")}]]}]""")
    })
    srv.start(); srv
  }

  test("ollama + openai wire forms, distributed embedCol, error shapes") {
    val srv = startStub()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val ollama = new HttpEmbedder(HttpEmbedderConfig(
        "ollama", base, "/api/embeddings", "mxbai-embed-large"), dim = 4)
      assert(ollama.embed("graph") == fakeVec("graph"))

      val openai = new HttpEmbedder(HttpEmbedderConfig(
        "openai", base, "/v1/embeddings", "text-embedding-3-small",
        apiKey = "sk-test-123"), dim = 4)
      assert(openai.embed("vector") == fakeVec("vector"))
      // a true batch: one request, out-of-order response re-ordered
      val before = openaiCalls.get()
      val openaiCfg = HttpEmbedderConfig("openai", base, "/v1/embeddings",
        "text-embedding-3-small", apiKey = "sk-test-123")
      val batch = HttpEmbedder.request(openaiCfg, Seq("alpha", "bz", "cc"), 4)
      assert(openaiCalls.get() == before + 1)
      assert(batch == Seq(fakeVec("alpha"), fakeVec("bz"), fakeVec("cc")))

      // distributed column form over a real DataFrame
      import spark.implicits._
      val texts = Seq("one", "twoo", "three").toDF("t")
      val out = texts.select(col("t"),
        ollama.embedCol(spark, col("t")).as("v")).collect()
      out.foreach(r => assert(
        r.getAs[scala.collection.Seq[Double]]("v").toSeq ==
          fakeVec(r.getAs[String]("t"))))

      // provider errors carry status + body (embed.go:409-411)
      val bad = new HttpEmbedder(HttpEmbedderConfig(
        "openai", base, "/v1/embeddings", "m", apiKey = "wrong"), dim = 4)
      val e = intercept[IllegalArgumentException](bad.embed("x"))
      assert(e.getMessage.contains("401") && e.getMessage.contains("no key"))
      // unknown provider refused at construction
      intercept[IllegalArgumentException](
        HttpEmbedderConfig("not-a-provider", base, "/x", "m"))

      // llama.cpp server wire form (`llama-server --embedding`): both the
      // object shape and the newer row-batched list shape parse
      val llama = new HttpEmbedder(HttpEmbedderConfig(
        "llamacpp", base, "/embedding", ""), dim = 4)
      assert(llama.embed("gguf") == fakeVec("gguf"))
      val llamaList = new HttpEmbedder(HttpEmbedderConfig(
        "llamacpp", base, "/embedding-list", ""), dim = 4)
      assert(llamaList.embed("rows") == fakeVec("rows"))
    } finally srv.stop(0)
  }

  test("CachedEmbedder: FNV-keyed LRU, hit/miss stats, bounded eviction") {
    val calls = new AtomicInteger
    val base = new Embedder {
      val dim = 2
      def embed(text: String): Seq[Double] = {
        calls.incrementAndGet(); Seq(text.length.toDouble, 7.0) }
      def embedCol(spark: org.apache.spark.sql.SparkSession,
          c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        org.apache.spark.sql.functions.udf(
          (s: String) => embed(s)).apply(c)
    }
    val cached = new CachedEmbedder(base, maxSize = 2)
    assert(cached.embed("aa") == Seq(2.0, 7.0))
    assert(cached.embed("aa") == Seq(2.0, 7.0)) // hit
    assert(calls.get() == 1)
    assert(cached.stats._1 == 1 && cached.stats._2 == 1)
    cached.embed("bb"); cached.embed("cc") // evicts "aa" (LRU, size 2)
    cached.embed("aa")
    assert(calls.get() == 4, s"calls ${calls.get()}") // aa re-embedded
    assert(cached.stats._3 == 2)
    // the seam composes: CachedEmbedder is a drop-in Embedder
    Embedder.withEmbedder(cached) {
      assert(Embedder.current.embed("aa") == Seq(2.0, 7.0))
    }
  }
}
