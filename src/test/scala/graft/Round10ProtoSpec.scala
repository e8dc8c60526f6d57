package graft

import java.io.ByteArrayOutputStream
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.search.{HttpReranker, HttpRerankerConfig, Rerank}
import graft.sources.{BoltServer, PackStream}

/** Round-10 verdict items 6/7: Bolt 5.x version negotiation + element_id
  * entity structs (the reference pins 4.4, `pkg/bolt/server.go:866-897`;
  * 5.x-only stock drivers need the negotiated answer), and the
  * cross-encoder rerank HTTP provider on the [[Rerank.Encoder]] seam
  * (`pkg/search/rerank.go:132-301` wire forms).
  */
class Round10ProtoSpec extends AnyFunSuite {
  import TestSpark._

  private def struct(sig: Int, fields: Any*): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(0xB0 + fields.length); b.write(sig)
    fields.foreach(PackStream.write(b, _))
    b.toByteArray
  }

  private def readMessage(in: java.io.InputStream): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    var done = false
    while (!done) {
      val h0 = in.read(); val h1 = in.read()
      require(h0 >= 0 && h1 >= 0, "stream closed mid-message")
      val size = (h0 << 8) | h1
      if (size == 0 && buf.size() > 0) done = true
      else if (size > 0) {
        val b = new Array[Byte](size)
        var off = 0
        while (off < size) {
          val r = in.read(b, off, size - off); require(r >= 0); off += r
        }
        buf.write(b)
      }
    }
    buf.toByteArray
  }

  // ------------------------------------------------------------- bolt ----

  test("Bolt: 5.x-only range proposal negotiates 5.8, RUN/PULL streams 5.x structs") {
    val g = GraphQueries.graph(spark, sf)
    val server = new BoltServer(() => g).start()
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      val out = sock.getOutputStream
      val in = sock.getInputStream

      // proposals: 5.8 down to 5.5 (range word), 5.4 down to 5.0 — NO 4.x
      out.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17,
        0, 3, 8, 5, 0, 4, 4, 5, 0, 0, 0, 0, 0, 0, 0, 0))
      out.flush()
      val version = new Array[Byte](4)
      var read = 0
      while (read < 4) { val n = in.read(version, read, 4 - read); assert(n > 0); read += n }
      assert(version.toSeq == Seq[Byte](0, 0, 8, 5), "highest mutual = 5.8")

      // HELLO (5.x: no credentials inside), then RUN/PULL
      out.write(PackStream.frame(struct(0x01, Map("user_agent" -> "spec/5"))))
      out.flush()
      val (helloSig, _) = PackStream.decode(readMessage(in), 0)._1 match {
        case (s: Int, f: Seq[_]) => (s, f)
      }
      assert(helloSig == 0x70, "HELLO SUCCESS")

      out.write(PackStream.frame(struct(0x10,
        "MATCH (c:Customer) RETURN c ORDER BY c.key LIMIT 1",
        Map.empty[String, Any], Map.empty[String, Any])))
      out.write(PackStream.frame(struct(0x3F, Map("n" -> -1L))))
      out.flush()
      assert((readMessage(in)(1) & 0xFF) == 0x70, "RUN SUCCESS")

      val record = readMessage(in)
      assert((record(1) & 0xFF) == 0x71, "RECORD")
      // the struct marker for a 5.x Node is B4 (4 fields incl element_id)
      val fields = PackStream.decode(record, 0)._1.asInstanceOf[Seq[Any]]
      val node = fields.head.asInstanceOf[PackStream.BoltNode]
      assert(node.labels.contains("Customer"))
      assert(node.elementId.startsWith("Customer:"),
        s"5.x node must carry its string element_id, got '${node.elementId}'")
      assert(node.id == PackStream.hashStringToInt64(node.elementId),
        "numeric id stays the FNV hash of the element id")
      assert((readMessage(in)(1) & 0xFF) == 0x70, "PULL SUCCESS")

      // 4.4-only client on the same server still negotiates 4.4 and gets
      // the 3-field node struct (no element_id)
      sock.close()
      val s44 = new Socket("127.0.0.1", server.boundPort)
      val o44 = s44.getOutputStream; val i44 = s44.getInputStream
      o44.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17,
        0, 0, 4, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
      o44.flush()
      val v44 = new Array[Byte](4)
      var r44 = 0
      while (r44 < 4) { val n = i44.read(v44, r44, 4 - r44); assert(n > 0); r44 += n }
      assert(v44.toSeq == Seq[Byte](0, 0, 4, 4))
      o44.write(PackStream.frame(struct(0x01, Map("user_agent" -> "spec/4"))))
      o44.write(PackStream.frame(struct(0x10,
        "MATCH (c:Customer) RETURN c ORDER BY c.key LIMIT 1",
        Map.empty[String, Any], Map.empty[String, Any])))
      o44.write(PackStream.frame(struct(0x3F, Map("n" -> -1L))))
      o44.flush()
      readMessage(i44); readMessage(i44) // HELLO + RUN SUCCESS
      val rec44 = readMessage(i44)
      val n44 = PackStream.decode(rec44, 0)._1.asInstanceOf[Seq[Any]]
        .head.asInstanceOf[PackStream.BoltNode]
      assert(n44.elementId.isEmpty, "4.4 node struct has no element_id field")
      s44.close()

      // no mutual version → 00 00 00 00 answer
      val sBad = new Socket("127.0.0.1", server.boundPort)
      sBad.getOutputStream.write(Array[Byte](0x60, 0x60, 0xB0.toByte, 0x17,
        0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)) // 9.0 only
      sBad.getOutputStream.flush()
      val vBad = new Array[Byte](4)
      var rBad = 0
      var eof = false
      while (rBad < 4 && !eof) {
        val n = sBad.getInputStream.read(vBad, rBad, 4 - rBad)
        if (n < 0) eof = true else rBad += n
      }
      assert(rBad == 4 && vBad.toSeq == Seq[Byte](0, 0, 0, 0))
      sBad.close()
    } finally server.stop()
  }

  // ----------------------------------------------------------- rerank ----

  /** A local model-serving stand-in: scores each document by the count of
    * query tokens it contains (deterministic), answering in the requested
    * format — the same role the embedder specs' stand-in HTTP providers
    * play (zero egress).
    */
  private def standInProvider(format: String): HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/rerank", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val root = graft.functions.JsonImpls.parse(body).get
      val query = root.get("query").asText()
      val docs = (0 until root.get("documents").size())
        .map(i => root.get("documents").get(i).asText())
      val qTok = query.toLowerCase.split("\\s+").toSet
      val scores = docs.map(d =>
        d.toLowerCase.split("\\s+").count(qTok.contains).toDouble)
      val json = format match {
        case "cohere" =>
          s"""{"results":[${scores.zipWithIndex.map { case (sc, i) =>
            s"""{"index":$i,"relevance_score":$sc}""" }.mkString(",")}]}"""
        case "tei" => s"""{"scores":[${scores.mkString(",")}]}"""
        case "simple" =>
          s"""{"rankings":[${scores.zipWithIndex.map { case (sc, i) =>
            s"""{"index":$i,"score":$sc}""" }.mkString(",")}]}"""
        case "broken" => """{"nonsense": true}"""
      }
      val bytes = json.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes); ex.close()
    })
    s.createContext("/health", (ex: HttpExchange) => {
      ex.sendResponseHeaders(200, 2L); ex.getResponseBody.write("ok".getBytes)
      ex.close()
    })
    s.start(); s
  }

  private def candidates() = {
    import spark.implicits._
    Seq(
      ("d1", "the quick brown fox", 0.9),
      ("d2", "graph database engines are fast", 0.8),
      ("d3", "fast graph engines use spark", 0.7)
    ).toDF("id", "content", "bi_score")
  }

  test("HttpReranker: Cohere-format provider reranks through the Encoder seam") {
    val provider = standInProvider("cohere")
    try {
      val rr = new HttpReranker(HttpRerankerConfig(
        s"http://127.0.0.1:${provider.getAddress.getPort}/rerank", model = "ce-1"))
      assert(rr.isAvailable)
      val out = Rerank.rerank(candidates(), "fast graph engines",
        encoder = rr.encoder).collect()
      // d3 and d2 each contain all 3 query tokens (score 3.0); d1 has
      // none (score 0.0) and must sink to the bottom despite its bi rank
      assert(out.length == 3)
      val byId = out.map(r => r.getAs[String]("id") -> r.getAs[Double]("cross_score")).toMap
      assert(byId("d3") == 3.0 && byId("d2") == 3.0 && byId("d1") == 0.0)
      assert(out.last.getAs[String]("id") == "d1")
      assert(out.last.getAs[Int]("new_rank") == 3)
      assert(out.last.getAs[Int]("original_rank") == 1) // was top by bi_score
    } finally provider.stop(0)
  }

  test("HttpReranker: TEI + simple formats parse; failure falls back to bi score") {
    for (fmt <- Seq("tei", "simple")) {
      val provider = standInProvider(fmt)
      try {
        val rr = new HttpReranker(HttpRerankerConfig(
          s"http://127.0.0.1:${provider.getAddress.getPort}/rerank"))
        val scores = rr.score("fast graph engines",
          Seq("no overlap here", "fast graph engines use spark"))
        assert(scores == Seq(0.0, 3.0), s"format $fmt")
      } finally provider.stop(0)
    }

    // unparseable response → pass-through (rerank.go:152-156)
    val broken = standInProvider("broken")
    try {
      val rr = new HttpReranker(HttpRerankerConfig(
        s"http://127.0.0.1:${broken.getAddress.getPort}/rerank"))
      val out = Rerank.rerank(candidates(), "anything",
        encoder = rr.encoder).collect()
      out.foreach { r =>
        assert(r.getAs[Double]("cross_score") == r.getAs[Double]("bi_score"))
      }
    } finally broken.stop(0)

    // dead provider → pass-through, and isAvailable is false
    val rrDead = new HttpReranker(HttpRerankerConfig("http://127.0.0.1:9/rerank",
      timeoutMs = 500))
    assert(!rrDead.isAvailable)
    val out2 = Rerank.rerank(candidates(), "anything", encoder = rrDead.encoder)
      .collect()
    out2.foreach { r =>
      assert(r.getAs[Double]("cross_score") == r.getAs[Double]("bi_score"))
    }
  }
}
