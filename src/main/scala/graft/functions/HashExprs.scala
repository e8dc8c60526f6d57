package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM replays of the reference's non-cryptographic hash loops
  * (`/root/reference/apoc/hashing/hashing.go:87-358`). All arithmetic is
  * wrapping 64-bit — exactly what Go's uint32/uint64 ops do and what
  * Spark's ANSI-mode HOF arithmetic refuses to do, hence native Catalyst
  * expressions (with codegen) instead of `aggregate()` folds.
  *
  * 64-bit results come back as the SAME 64 bits in a signed long (values
  * above 2^63 print negative where Go prints unsigned — documented, the
  * bits are identical). 32-bit results are widened to non-negative longs.
  */
object HashImpls {
  /** FNV-1 64-bit (hashing.go:110): multiply then xor. */
  def fnv164(bytes: Array[Byte]): Long = {
    var h = -3750763034362895579L // 14695981039346656037 (offset basis)
    var i = 0
    while (i < bytes.length) {
      h = h * 1099511628211L
      h = h ^ (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** FNV-1a 64-bit (hashing.go:123): xor then multiply. The reference's
    * cityHash64 (hashing.go:297) is an alias of this.
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = -3750763034362895579L
    var i = 0
    while (i < bytes.length) {
      h = h ^ (bytes(i) & 0xffL)
      h = h * 1099511628211L
      i += 1
    }
    h
  }

  /** Standard MurmurHash3 x86 32-bit with seed (hashing.go:246-291) — the
    * reference implements the canonical algorithm, which differs from
    * Spark's `hash()` in tail handling, so it is replayed here verbatim.
    */
  def murmur3(bytes: Array[Byte], seed: Long): Long = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed.toInt
    val nblocks = bytes.length / 4
    var i = 0
    while (i < nblocks) {
      var k = (bytes(i * 4) & 0xff) | ((bytes(i * 4 + 1) & 0xff) << 8) |
        ((bytes(i * 4 + 2) & 0xff) << 16) | ((bytes(i * 4 + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    (bytes.length & 3) match {
      case 3 =>
        k1 ^= (bytes(tail + 2) & 0xff) << 16
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 2 =>
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 1 =>
        k1 ^= bytes(tail) & 0xff
      case _ =>
    }
    if ((bytes.length & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h ^= k1
    }
    h ^= bytes.length
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h & 0xffffffffL
  }

  /** The reference's SIMPLIFIED xxHash32 (hashing.go:303-327): a per-byte
    * rotate-multiply loop, NOT canonical xxHash — replayed as written.
    */
  def xxhash32(bytes: Array[Byte], seed: Long): Long = {
    val p1 = 2654435761L.toInt; val p2 = 2246822519L.toInt
    val p3 = 3266489917L.toInt; val p5 = 374761393
    var h = seed.toInt + p5 + bytes.length
    var i = 0
    while (i < bytes.length) {
      h += (bytes(i) & 0xff) * p5
      h = Integer.rotateLeft(h, 11) * p1
      i += 1
    }
    h ^= h >>> 15
    h *= p2
    h ^= h >>> 13
    h *= p3
    h ^= h >>> 16
    h & 0xffffffffL
  }

  /** The reference's SIMPLIFIED xxHash64 (hashing.go:329-352). */
  def xxhash64(bytes: Array[Byte], seed: Long): Long = {
    val p1 = -7046029288634856825L // 11400714785074694791
    val p2 = -4417276706812531889L // 14029467366897019727
    val p3 = 1609587929392839161L
    val p5 = 2870177450012600261L
    var h = seed + p5 + bytes.length
    var i = 0
    while (i < bytes.length) {
      h += (bytes(i) & 0xffL) * p5
      h = java.lang.Long.rotateLeft(h, 11) * p1
      i += 1
    }
    h ^= h >>> 33
    h *= p2
    h ^= h >>> 29
    h *= p3
    h ^= h >>> 32
    h
  }

  /** Jump consistent hash (hashing.go:228-243); key is the raw 64 bits. */
  def jumpHash(key0: Long, buckets: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      key = key * 2862933555777941757L + 1
      // Go: float64(b+1) * (float64(1<<31) / float64((key>>33)+1)); key>>33
      // is a uint64 logical shift
      j = ((b + 1).toDouble * ((1L << 31).toDouble / ((key >>> 33) + 1).toDouble)).toLong
    }
    b.toInt
  }

  /** Rendezvous (HRW) hash (hashing.go:200-226): argmax over nodes of the
    * UNSIGNED fnv1a64(key+node); ties keep the earlier node, empty list "".
    * Initial max is 0 with node[0] selected, matching the Go loop exactly
    * (a first-node hash of 0 keeps node[0]).
    */
  def rendezvous(key: UTF8String, nodes: Array[UTF8String]): UTF8String = {
    if (nodes.isEmpty) return UTF8String.EMPTY_UTF8
    var maxHash = 0L
    var sel = nodes(0)
    val k = key.toString
    var i = 0
    while (i < nodes.length) {
      val h = fnv1a64((k + nodes(i).toString).getBytes("UTF-8"))
      if (java.lang.Long.compareUnsigned(h, maxHash) > 0) {
        maxHash = h
        sel = nodes(i)
      }
      i += 1
    }
    sel
  }
}

/** 1-arg string hash: algo ∈ fnv164 | fnv1a64 | cityhash64. */
case class HashStr64(child: Expression, algo: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    algo match {
      case "fnv164" => HashImpls.fnv164(b)
      case _ => HashImpls.fnv1a64(b)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (algo == "fnv164") "fnv164" else "fnv1a64"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpls$$.MODULE$$.$fn($c.getBytes())")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 2-arg (value, seed) hash: algo ∈ murmur3 | xxhash32 | xxhash64. */
case class HashSeeded(left: Expression, right: Expression, algo: String)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)
  override protected def nullSafeEval(v: Any, s: Any): Any = {
    val b = v.asInstanceOf[UTF8String].getBytes
    val seed = s.asInstanceOf[Long]
    algo match {
      case "murmur3" => HashImpls.murmur3(b, seed)
      case "xxhash32" => HashImpls.xxhash32(b, seed)
      case _ => HashImpls.xxhash64(b, seed)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    defineCodeGen(ctx, ev, (c, s) =>
      s"graft.functions.HashImpls$$.MODULE$$.$algo($c.getBytes(), $s)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** jumpHash(key: long, buckets: int) → bucket index. */
case class JumpHashExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override protected def nullSafeEval(k: Any, b: Any): Any =
    HashImpls.jumpHash(k.asInstanceOf[Long], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, b) =>
      s"graft.functions.HashImpls$$.MODULE$$.jumpHash($k, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** rendezvousHash(key: string, nodes: array<string>) → selected node. */
case class RendezvousHashExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType, ArrayType(StringType))
  override protected def nullSafeEval(k: Any, ns: Any): Any = {
    val arr = ns.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val nodes = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < nodes.length) { nodes(i) = arr.getUTF8String(i); i += 1 }
    HashImpls.rendezvous(k.asInstanceOf[UTF8String], nodes)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Session-scoped registration of the hash expressions so the planner can
  * reach them through `call_function` (no UDFs, no serialization — these
  * stay native Catalyst expressions inside whole-stage codegen).
  */
object HashExprs {
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def ensure(spark: SparkSession): Unit = {
    if (registered.contains(spark)) return
    val reg = spark.sessionState.functionRegistry
    def one(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")
    one("graft_fnv164")(a => HashStr64(a.head, "fnv164"))
    one("graft_fnv1a64")(a => HashStr64(a.head, "fnv1a64"))
    one("graft_cityhash64")(a => HashStr64(a.head, "cityhash64"))
    one("graft_murmur3")(a => HashSeeded(a(0), a(1), "murmur3"))
    one("graft_xxhash32")(a => HashSeeded(a(0), a(1), "xxhash32"))
    one("graft_xxhash64")(a => HashSeeded(a(0), a(1), "xxhash64"))
    one("graft_jumphash")(a => JumpHashExpr(a(0), a(1)))
    one("graft_rendezvous")(a => RendezvousHashExpr(a(0), a(1)))
    one("graft_json_pretty")(a => JsonUnaryExpr(a.head, "pretty"))
    one("graft_json_flatten")(a => JsonUnaryExpr(a.head, "flatten"))
    one("graft_json_unflatten")(a => JsonUnaryExpr(a.head, "unflatten"))
    one("graft_json_set")(a => JsonSetExpr(a(0), a(1), a(2)))
    one("graft_json_delete")(a => JsonDeleteExpr(a(0), a(1)))
    one("graft_xml")(a => XmlStrExpr(a))
    one("graft_xml_validate")(a => XmlBoolExpr(a))
    one("graft_xml_query")(a => XmlArrExpr(a))
    def intLit(e: Expression): Int = e.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => other.toString.toInt
    }
    one("graft_lsh_sig")(a => LshSignatureExpr(a(0), intLit(a(1)), intLit(a(2)), intLit(a(3))))
    one("graft_jarowinkler")(a => JaroWinklerExpr(a(0), a(1)))
    one("graft_soundex")(a => RefSoundexExpr(a(0)))
    one("graft_text_embed")(a => TextEmbedExpr(a(0), a(1)))
    registered.add(spark)
  }

  def fnv164(c: Column): Column = org.apache.spark.sql.functions.call_function("graft_fnv164", c)
  def fnv1a64(c: Column): Column = org.apache.spark.sql.functions.call_function("graft_fnv1a64", c)
}
