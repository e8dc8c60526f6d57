package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.{ApocCatalog, Ast, Cypher, Planner}
import graft.graph.GraphStore

/** The coverage contract behind `apoc.help`: every name in [[ApocCatalog]]
  * (the reference registry's full 983-name surface) must RESOLVE in the
  * live dispatcher — as a CALL procedure, as a compilable function, or
  * through the Cypher string surface. A name that merely sits in the list
  * without an implementation fails here.
  */
class ApocCatalogSpec extends AnyFunSuite {
  import TestSpark._
  import Ast._

  test("catalog has exactly the reference surface, lowercased and distinct") {
    assert(ApocCatalog.all.size == 983)
    assert(ApocCatalog.all.distinct.size == 983)
    assert(ApocCatalog.all.forall(n => n == n.toLowerCase && n.startsWith("apoc.")))
  }

  test("every ApocCatalog name resolves as a procedure or function") {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(g)
    val procs = Planner.procedureNames.toSet

    // a frame with a node var n and a rel var r bound, for probe compiles
    val probeFrame = {
      val seed = Planner.seedFrame(g)
      val df = g.nodes.limit(1).select(
        org.apache.spark.sql.functions.col("id").as("n_id"),
        org.apache.spark.sql.functions.col("labels").as("n_labels"),
        org.apache.spark.sql.functions.col("properties").as("n_properties"),
        org.apache.spark.sql.functions.col("id").as("m_id"),
        org.apache.spark.sql.functions.col("labels").as("m_labels"),
        org.apache.spark.sql.functions.col("properties").as("m_properties"))
      Planner.Frame(df, seed.kinds ++ Map("n" -> Planner.NodeK, "m" -> Planner.NodeK))
    }

    def unknownFn(e: Throwable): Boolean =
      e.getMessage != null && e.getMessage.contains("unknown function")

    val argShapes: Seq[Seq[Expr]] = Seq(
      Seq(Lit(1L)), Seq(Lit("x")), Seq(Lit("x"), Lit("y")),
      Seq(Lit(1L), Lit(2L)), Seq(ListLit(Seq(Lit(1L), Lit(2L)))),
      Seq(ListLit(Seq(Lit(1L), Lit(2L))), Lit(1L)),
      Seq(Variable("n")), Seq(Variable("n"), Lit("x")),
      Seq(Variable("n"), Variable("m")), Seq())

    def resolvesAsFn(name: String): Boolean = argShapes.exists { args =>
      try { Planner.compile(FnCall(name, args, false), probeFrame, Map.empty); true }
      catch {
        case e: Throwable if unknownFn(e) => false
        case _: Throwable => true // a case arm matched; args were wrong
      }
    }

    // last resort: plan (never execute) a tiny query using the name in
    // entity position — some members only exist via grouped-join rewrites
    def resolvesViaCypher(name: String): Boolean = Seq(
      s"MATCH (n:Region) RETURN $name(n) AS x",
      s"MATCH (n:Region) RETURN $name(n, 'PLACED') AS x",
      s"MATCH (n:Region)-[r]->(m) RETURN $name(r) AS x",
      s"MATCH (n:Region)-[r]->(m) RETURN $name(r, n) AS x",
      s"CALL $name() YIELD value RETURN value"
    ).exists { q =>
      try { Cypher.run(g, q); true }
      catch {
        case e: Throwable if e.getMessage != null &&
          (e.getMessage.contains("unknown function") ||
            e.getMessage.contains("unknown procedure")) => false
        case _: Throwable => true
      }
    }

    val unresolved = ApocCatalog.all.filterNot(procs)
      .filterNot(resolvesAsFn)
      .filterNot(resolvesViaCypher)
    assert(unresolved.isEmpty,
      s"${unresolved.size} catalog names do not resolve: ${unresolved.mkString(", ")}")
  }

  test("smoke calls: the most-used catalog names execute with real args") {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(g)
    def value(expr: String): Any =
      Cypher.run(g, s"RETURN $expr AS v").collect()(0).get(0)
    def seqOf(expr: String): List[Any] =
      value(expr).asInstanceOf[scala.collection.Seq[Any]].toList

    // exact-value assertions (deterministic scalar semantics)
    assert(value("apoc.text.indexOf('hello', 'l')") == 2L)
    assert(value("apoc.text.join(['a','b','c'], '-')") == "a-b-c")
    assert(value("apoc.text.replace('aaa', 'a', 'b')") == "bbb")
    assert(value("apoc.text.capitalize('hello')") == "Hello")
    assert(value("apoc.text.lpad('7', 3, '0')") == "007")
    assert(value("apoc.text.rpad('7', 3, '0')") == "700")
    assert(value("apoc.text.distance('kitten', 'sitting')") == 3L)
    assert(seqOf("apoc.text.split('a,b', ',')") == List("a", "b"))
    assert(value("apoc.coll.sum([1,2,3])") == 6.0)
    assert(value("apoc.coll.avg([1,2,3])") == 2.0)
    assert(value("apoc.coll.max([1,5,3])") == 5L)
    assert(value("apoc.coll.min([1,5,3])") == 1L)
    assert(value("apoc.coll.contains([1,2], 2)") == true)
    assert(value("apoc.coll.indexOf([1,2,3], 2)") == 1L)
    assert(value("apoc.coll.isEmpty([])") == true)
    assert(value("apoc.coll.occurrences([1,1,2], 1)") == 2L)
    assert(value("apoc.coll.containsAll([1,2,3], [1,2])") == true)
    assert(seqOf("apoc.coll.reverse([1,2])") == List(2L, 1L))
    assert(seqOf("apoc.coll.sort([3,1,2])") == List(1L, 2L, 3L))
    assert(seqOf("apoc.coll.toSet([1,1,2])") == List(1L, 2L))
    assert(seqOf("apoc.coll.flatten([[1],[2]])") == List(1L, 2L))
    assert(seqOf("apoc.coll.intersection([1,2], [2,3])") == List(2L))
    assert(seqOf("apoc.coll.subtract([1,2], [2])") == List(1L))
    assert(seqOf("apoc.coll.duplicates([1,1,2])") == List(1L))
    assert(value("apoc.convert.toInteger('42')") == 42L)
    assert(value("apoc.convert.toFloat('1.5')") == 1.5)
    assert(value("apoc.convert.toBoolean('true')") == true)
    assert(value("apoc.number.format(1234)") != null)
    assert(value("apoc.convert.toJson([1,2])") != null)
    // string-typed elements by design (Columns need one value type)
    assert(seqOf("apoc.convert.fromJsonList('[1,2]')") == List("1", "2"))

    // execute + non-null (shape-sensitive names: result form varies but a
    // wrong arg shape or a broken dispatcher arm throws here)
    val nonNull = Seq(
      "apoc.coll.union([1], [2])", "apoc.coll.zip([1], [2])",
      "apoc.coll.pairs([1,2,3])", "apoc.coll.frequencies([1,1,2])",
      "apoc.coll.partition([1,2,3,4], 2)",
      "apoc.map.fromLists(['a'], [1])",
      "apoc.map.merge(apoc.map.fromLists(['a'], [1]), apoc.map.fromLists(['b'], [2]))",
      "apoc.convert.fromJsonMap('{\"a\": 1}')",
      // 2-arg (dateStr, format) per the reference's own date.go:15
      "apoc.date.parse('1970-01-02', 'yyyy-MM-dd')",
      "apoc.date.format(0, 's', 'yyyy-MM-dd')",
      "apoc.hashing.fnv164('x')", "apoc.util.md5('a')",
      "apoc.text.clean('a b!')", "apoc.temporal.format(date('2020-01-02'), 'yyyy')",
      "apoc.math.round(3.456, 2)", "apoc.coll.sumLongs([1,2])")
    val broken = nonNull.flatMap { e =>
      try { if (value(e) == null) Some(s"$e -> null") else None }
      catch { case t: Throwable => Some(s"$e -> ${t.getMessage}") }
    }
    assert(broken.isEmpty, s"smoke calls failed:\n${broken.mkString("\n")}")

    // entity + procedure smoke on the micro fixture
    assert(Cypher.run(g,
      "MATCH (n:Nation) RETURN apoc.node.degree(n) AS v LIMIT 1")
      .collect()(0).getLong(0) >= 0L)
    assert(Cypher.run(g, "CALL apoc.meta.stats() YIELD nodeCount RETURN nodeCount")
      .collect()(0).getLong(0) > 0)
  }

  test("smoke calls, round 6: +60 usage-ranked names execute with real args") {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(g)
    def value(expr: String): Any =
      Cypher.run(g, s"RETURN $expr AS v").collect()(0).get(0)
    def seqOf(expr: String): List[Any] =
      value(expr).asInstanceOf[scala.collection.Seq[Any]].toList
    def dbl(expr: String): Double = value(expr).toString.toDouble

    // exact-value assertions
    assert(value("apoc.text.reverse('abc')") == "cba")
    assert(value("apoc.text.repeat('ab', 2)") == "abab")
    assert(value("apoc.text.swapCase('aB')") == "Ab")
    assert(value("apoc.text.base64Encode('ab')") == "YWI=")
    assert(value("apoc.text.base64Decode('YWI=')") == "ab")
    assert(value("apoc.text.urldecode(apoc.text.urlencode('a b&c'))") == "a b&c")
    assert(value("apoc.text.hammingDistance('abc', 'abd')") == 1L)
    assert(value("apoc.text.camelCase('hello world')") != null)
    assert(value("apoc.text.snakeCase('helloWorld')") != null)
    assert(value("apoc.text.slug('a b')") != null)
    assert(value("apoc.coll.containsAny([1,2], [2,9])") == true)
    assert(value("apoc.coll.containsDuplicates([1,1,2])") == true)
    assert(seqOf("apoc.coll.dropDuplicateNeighbors([1,1,2,1])") == List(1L, 2L, 1L))
    assert(seqOf("apoc.coll.insert([1,3], 1, 2)") == List(1L, 2L, 3L))
    assert(seqOf("apoc.coll.set([1,2], 0, 9)") == List(9L, 2L))
    assert(seqOf("apoc.coll.disjunction([1,2], [2,3])").toSet == Set(1L, 3L))
    assert(value("apoc.bitwise.op(6, '&', 3)") == 2L)
    assert(value("apoc.bitwise.and(6, 3)") == 2L)
    assert(value("apoc.bitwise.or(6, 3)") == 7L)
    assert(value("apoc.bitwise.xor(6, 3)") == 5L)
    assert(value("apoc.bitwise.countbits(7)") == 3L)
    assert(seqOf("apoc.map.keys(apoc.map.fromLists(['a'], [1]))") == List("a"))
    assert(dbl("apoc.math.sigmoid(0.0)") == 0.5)
    assert(dbl("apoc.math.cos(0.0)") == 1.0)
    assert(dbl("apoc.math.tanh(0.0)") == 0.0)
    assert(value("apoc.math.maxLong([1,5,3])") == 5L)
    assert(value("apoc.math.minLong([1,5,3])") == 1L)
    assert(value("apoc.number.isEven(2)") == true)
    assert(value("apoc.number.isOdd(3)") == true)
    assert(value("apoc.number.isPrime(7)") == true)
    assert(value("apoc.number.gcd(12, 8)") == 4L)
    assert(value("apoc.number.lcm(4, 6)") == 12L)
    assert(value("apoc.number.factorial(5)") == 120L)
    assert(value("apoc.number.fibonacci(10)") == 55L)
    assert(value("apoc.number.toHex(255)") == "FF")
    assert(value("apoc.number.fromHex('ff')") == 255L)
    assert(value("apoc.number.toBinary(5)") == "101")
    assert(value("apoc.number.fromBinary('101')") == 5L)
    assert(value("apoc.number.romanize(4)") == "IV")
    assert(value("apoc.number.arabize('IV')") == 4L)
    assert(value("apoc.number.sign(-3)") == -1L)
    assert(value("apoc.number.parseInt('42')") == 42L)
    assert(dbl("apoc.number.parseFloat('1.5')") == 1.5)
    assert(dbl("apoc.number.sqrt(9.0)") == 3.0)
    assert(math.abs(dbl("apoc.scoring.cosine([1.0,0.0], [0.0,1.0])")) < 1e-12)
    assert(math.abs(dbl("apoc.scoring.jaccard([1,2], [2,3])") - 1.0 / 3) < 1e-12)

    // execute + non-null (shape-sensitive: a broken arm throws)
    val nonNull = Seq(
      "apoc.text.charAt('abc', 1)", "apoc.text.code('a')",
      "apoc.text.fromCodePoint(97)", "apoc.text.indexesOf('aba', 'a')",
      "apoc.text.regexGroups('a1b2', '([a-z])([0-9])')",
      "apoc.text.bytecount('abc')", "apoc.text.sorensenDiceSimilarity('night', 'nacht')",
      "apoc.text.fuzzyMatch('kitten', 'kitten')",
      "apoc.coll.containsSorted([1,2,3], 2)", "apoc.coll.different([1,2], [2])",
      "apoc.coll.duplicatesWithCount([1,1,2])", "apoc.coll.frequenciesAsMap([1,1,2])",
      "apoc.coll.pairsMin([1,2,3])", "apoc.coll.runningTotal([1,2,3])",
      "apoc.coll.slice([1,2,3,4], 1, 2)", "apoc.coll.split([1,2,3,2,4], 2)",
      "apoc.coll.unionAll([1], [1,2])", "apoc.coll.removeAll([1,2,1], 1)",
      "apoc.coll.fill('x', 2)",
      "apoc.coll.sortMaps([apoc.map.fromLists(['a'], [2]), apoc.map.fromLists(['a'], [1])], 'a')",
      "apoc.map.setKey(apoc.map.fromLists(['a'], [1]), 'b', 2)",
      "apoc.map.removeKey(apoc.map.fromLists(['a'], [1]), 'a')",
      "apoc.map.submap(apoc.map.fromLists(['a','b'], [1,2]), ['a'])",
      "apoc.map.values(apoc.map.fromLists(['a'], [1]))",
      "apoc.map.clean(apoc.map.fromLists(['a'], [1]), [], [])",
      "apoc.map.flatten(apoc.map.fromLists(['a'], [1]))",
      "apoc.map.fromValues(['a', '1'])",
      "apoc.math.nextPrime(10)", "apoc.math.logit(0.5)",
      "apoc.number.format(1234.5, '#,##0.0')", "apoc.number.clamp(5, 0, 3)",
      "apoc.number.lerp(0.0, 10.0, 0.5)", "apoc.number.toBase(255, 16)",
      "apoc.number.fromBase('ff', 16)",
      "apoc.scoring.dice([1,2], [2,3])", "apoc.scoring.euclidean([1.0,0.0], [0.0,1.0])",
      "apoc.scoring.manhattan([1.0,0.0], [0.0,1.0])", "apoc.scoring.sigmoid(1.0)",
      "apoc.scoring.minmax(5.0, 0.0, 10.0, 0.0, 1.0)", "apoc.scoring.normalize([1.0, 3.0])",
      "apoc.scoring.softmax([1.0, 2.0])", "apoc.scoring.zscore(5.0, 4.0, 2.0)",
      "apoc.json.size('[1,2,3]')", "apoc.json.validate('{\"a\": 1}')",
      "apoc.json.keys('{\"a\": 1}')", "apoc.json.compact('{\"a\":  1}')",
      "apoc.util.sha1('a')", "apoc.util.sha256('a')", "apoc.util.typeof(1)",
      "apoc.util.repeat('ab', 2)", "apoc.util.coalesce(null, 2)",
      "apoc.hashing.sha512('a')", "apoc.hashing.xxhash64('a', 0)",
      "apoc.hashing.murmurhash3('a', 0)",
      "apoc.hashing.fingerprint(apoc.map.fromLists(['a'], [1]))",
      "apoc.diff.lists([1,2], [2,3])",
      "apoc.diff.maps(apoc.map.fromLists(['a'], [1]), apoc.map.fromLists(['a'], [2]))",
      "apoc.temporal.quarter(date('2024-05-01'))",
      "apoc.temporal.isLeapYear(2024)",
      "apoc.temporal.weekOfYear(date('2024-05-01'))",
      "apoc.temporal.daysInMonth(2024, 2)",
      "apoc.date.add(0, 1, 'd')", "apoc.date.fromUnixtime(0)",
      "apoc.date.toYears(0)")
    val broken = nonNull.flatMap { e =>
      try { if (value(e) == null) Some(s"$e -> null") else None }
      catch { case t: Throwable => Some(s"$e -> ${t.getMessage}") }
    }
    assert(broken.isEmpty, s"smoke calls failed:\n${broken.mkString("\n")}")

    // entity-positional names on the live graph
    assert(Cypher.run(g,
      "MATCH (n:Region) RETURN apoc.label.has(n, 'Region') AS v LIMIT 1")
      .collect()(0).getBoolean(0))
    assert(Cypher.run(g,
      "MATCH (n:Region) RETURN apoc.node.labels(n) AS v LIMIT 1")
      .collect()(0).getSeq[String](0).contains("Region"))
    assert(Cypher.run(g,
      "MATCH (n:Region) RETURN apoc.meta.isNode(n) AS v LIMIT 1")
      .collect()(0).getBoolean(0))
  }

  test("smoke calls, round 6b: +60 names in the thin-coverage families") {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(g)
    def value(expr: String): Any =
      Cypher.run(g, s"RETURN $expr AS v").collect()(0).get(0)
    def seqOf(expr: String): List[Any] =
      value(expr).asInstanceOf[scala.collection.Seq[Any]].toList
    def dbl(expr: String): Double = value(expr).toString.toDouble

    // apoc.math — exact values
    assert(dbl("apoc.math.abs(-3.5)") == 3.5)
    assert(dbl("apoc.math.ceil(1.2)") == 2.0)
    assert(dbl("apoc.math.floor(1.8)") == 1.0)
    assert(dbl("apoc.math.exp(0.0)") == 1.0)
    assert(dbl("apoc.math.log(1.0)") == 0.0)
    assert(dbl("apoc.math.log10(100.0)") == 2.0)
    assert(dbl("apoc.math.pow(2.0, 10.0)") == 1024.0)
    assert(dbl("apoc.math.sin(0.0)") == 0.0)
    assert(dbl("apoc.math.tan(0.0)") == 0.0)
    assert(dbl("apoc.math.sinh(0.0)") == 0.0)
    assert(dbl("apoc.math.cosh(0.0)") == 1.0)
    assert(dbl("apoc.math.acos(1.0)") == 0.0)
    assert(dbl("apoc.math.asin(0.0)") == 0.0)
    assert(dbl("apoc.math.atan(0.0)") == 0.0)
    assert(dbl("apoc.math.atan2(0.0, 1.0)") == 0.0)
    assert(dbl("apoc.math.mean([1.0, 2.0, 3.0])") == 2.0)
    assert(dbl("apoc.math.median([1.0, 2.0, 3.0])") == 2.0)
    assert(dbl("apoc.math.sum([1.0, 2.0])") == 3.0)
    assert(dbl("apoc.math.product([2.0, 3.0])") == 6.0)
    assert(value("apoc.math.isPrime(13)") == true)
    assert(value("apoc.math.gcd(18, 12)") == 6L)
    assert(value("apoc.math.lcm(3, 4)") == 12L)
    assert(value("apoc.math.factorial(4)") == 24L)
    assert(value("apoc.math.fibonacci(7)") == 13L)

    // apoc.util — exact where deterministic
    assert(value("apoc.util.md5hex('a')") == "0cc175b9c0f1b6a831c399e269772661")
    assert(value("apoc.util.when(true, 'yes', 'no')") == "yes")
    assert(value("apoc.util.case([false, 'a', true, 'b'], 'z')") == "b")
    assert(value("apoc.util.encodebase64('ab')") == "YWI=")
    assert(value("apoc.util.decodebase64('YWI=')") == "ab")
    assert(value("apoc.util.decodeurl(apoc.util.encodeurl('a b'))") == "a b")
    assert(value("apoc.util.decompress(apoc.util.compress('hello'))") == "hello")
    assert(seqOf("apoc.util.range(1, 3)") == List(1L, 2L, 3L))
    assert(value("apoc.util.sha1hex('a')") == "86f7e437faa5a7fce15d1ddcb9eaeaea377667b8")

    // apoc.convert / json property surgery
    assert(value("apoc.convert.toString(42)") == "42")
    assert(seqOf("apoc.convert.toIntList(['1','2'])") == List(1L, 2L))
    assert(seqOf("apoc.convert.toFloatList(['1.5'])") == List(1.5))
    assert(seqOf("apoc.convert.toBooleanList(['true','false'])") == List(true, false))
    assert(seqOf("apoc.convert.toStringList([1,2])") == List("1", "2"))
    assert(seqOf("apoc.convert.toSet([1,1,2])") == List(1L, 2L))
    assert(value("apoc.convert.getJsonProperty('{\"a\": 7}', 'a')") == "7")

    // apoc.date
    assert(value("apoc.date.toISO8601(0, 's')") != null)
    assert(value("apoc.date.fromISO8601('1970-01-01T00:00:01Z')") != null)
    assert(value("apoc.date.convert(120, 's', 'm')") == 2L)
    assert(value("apoc.date.field(0, 'year', 'UTC')") == 1970L)
    assert(value("apoc.date.fields(0)") != null)
    assert(value("apoc.date.convertFormat('1970-01-02', 'yyyy-MM-dd', 'yyyy/MM/dd')") != null)
    assert(value("apoc.date.toYears(0)") != null)

    // apoc.temporal
    assert(value("apoc.temporal.dayOfWeek(date('2024-05-06'))") != null)
    assert(value("apoc.temporal.dayOfYear(date('2024-02-01'))") == 32L)
    assert(value("apoc.temporal.isWeekend(date('2024-05-04'))") == true)
    assert(value("apoc.temporal.isWeekday(date('2024-05-06'))") == true)
    assert(value("apoc.temporal.toEpochMillis(date('1970-01-02'))") != null)
    assert(value("apoc.temporal.fromEpochMillis(0)") != null)
    assert(value("apoc.temporal.startOf(date('2024-05-06'), 'month')") != null)
    assert(value("apoc.temporal.endOf(date('2024-05-06'), 'month')") != null)
    assert(value("apoc.temporal.truncate(date('2024-05-06'), 'year')") != null)
    assert(value("apoc.temporal.isBetween(date('2024-05-06'), date('2024-01-01'), date('2025-01-01'))") != null)

    // apoc.text long tail
    assert(value("apoc.text.trim('  a  ')") == "a")
    assert(value("apoc.text.ltrim('  a')") == "a")
    assert(value("apoc.text.rtrim('a  ')") == "a")
    assert(value("apoc.text.capitalizeAll('ab cd')") == "AB CD") // ToUpper per text.go:64
    assert(value("apoc.text.decapitalize('Ab')") == "ab")
    assert(value("apoc.text.upperCamelCase('hello world')") != null)
    assert(value("apoc.text.format('a%sb', ['X'])") != null)
    assert(value("apoc.text.compareCleaned('a b!', 'a b')") != null)
    assert(value("apoc.text.phonetic('hello')") != null)
    assert(seqOf("apoc.text.doubleMetaphone('Smith')") == List("S530"))
    assert(math.abs(dbl("apoc.text.jaroWinklerDistance('martha', 'marhta')")
      - 0.9611111111111111) < 1e-12) // text.go:250 example
    assert(dbl("apoc.text.jaroWinklerDistance('abc', 'abc')") == 1.0)
    assert(dbl("apoc.text.jaroWinklerDistance('abc', 'xyz')") == 0.0)
    assert(seqOf("apoc.text.bytes('ab')").nonEmpty)

    // apoc.agg composes with collect() (list slices, agg.go)
    val aggRows = Cypher.run(g,
      """MATCH (n:Nation) WITH collect(n.key) AS ks
         RETURN apoc.agg.median(ks) AS med, apoc.agg.first(ks) AS fst,
                apoc.agg.last(ks) AS lst, apoc.agg.product(ks) AS prd,
                apoc.agg.statistics(ks) AS stats, apoc.agg.mode(ks) AS mode,
                apoc.agg.stdev(ks) AS sd, apoc.agg.nth(ks, 1) AS nth""").collect()
    assert(aggRows.length == 1 && aggRows(0).get(0) != null && aggRows(0).get(4) != null)
  }

  test("smoke calls, round 7: +125 names toward full-catalog execution") {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(g)
    def value(expr: String): Any =
      Cypher.run(g, s"RETURN $expr AS v").collect()(0).get(0)

    // (expr, expected) — expected None = execute + non-null only
    val cases: Seq[(String, Option[Any])] = Seq(
      // apoc.number tail — exact values
      "apoc.number.abs(-3)" -> Some(3L),
      "apoc.number.ceil(1.2)" -> Some(2.0),
      "apoc.number.floor(1.8)" -> Some(1.0),
      "apoc.number.exp(0.0)" -> Some(1.0),
      "apoc.number.log(1.0)" -> Some(0.0),
      "apoc.number.log10(100.0)" -> Some(2.0),
      "apoc.number.power(2, 10)" -> Some(1024.0),
      "apoc.number.fromOctal('10')" -> Some(8L),
      "apoc.number.toOctal(8)" -> Some("10"),
      // apoc.bitwise tail
      "apoc.bitwise.not(0)" -> Some(-1L),
      "apoc.bitwise.leftShift(1, 3)" -> Some(8L),
      "apoc.bitwise.rightShift(8, 3)" -> Some(1L),
      "apoc.bitwise.setBit(0, 2)" -> Some(4L),
      "apoc.bitwise.clearBit(7, 1)" -> Some(5L),
      "apoc.bitwise.testBit(4, 2)" -> Some(true),
      "apoc.bitwise.toggleBit(0, 1)" -> Some(2L),
      "apoc.bitwise.rotateLeft(1, 1)" -> None,
      "apoc.bitwise.rotateRight(2, 1)" -> None,
      "apoc.bitwise.reverseBits(1)" -> None,
      // apoc.math tail
      "apoc.math.sqrt(16.0)" -> Some(4.0),
      "apoc.math.clamp(5.0, 0.0, 3.0)" -> Some(3.0),
      "apoc.math.lerp(0.0, 10.0, 0.25)" -> Some(2.5),
      "apoc.math.mode([1,1,2])" -> None,
      "apoc.math.maxDouble([1.5, 2.5])" -> None,
      "apoc.math.normalize(5.0, 0.0, 10.0, 0.0, 1.0)" -> Some(0.5),
      "apoc.math.range(1, 3)" -> None,
      // apoc.stats
      "apoc.stats.max([1.0, 5.0, 3.0])" -> Some(5.0),
      "apoc.stats.min([1.0, 5.0, 3.0])" -> Some(1.0),
      "apoc.stats.range([1.0, 5.0])" -> Some(4.0),
      "apoc.stats.count([1,2,3])" -> Some(3L),
      "apoc.stats.correlation([1.0,2.0,3.0], [2.0,4.0,6.0])" -> None,
      "apoc.stats.covariance([1.0,2.0], [2.0,4.0])" -> None,
      "apoc.stats.iqr([1.0,2.0,3.0,4.0])" -> None,
      "apoc.stats.quartiles([1.0,2.0,3.0,4.0])" -> None,
      "apoc.stats.zscore([1.0, 5.0, 9.0])" -> None,
      "apoc.stats.normalize([1.0, 3.0])" -> None,
      // apoc.scoring tail
      "apoc.scoring.overlap([1,2], [2,3])" -> None,
      "apoc.scoring.tf('a', 'a b a')" -> None,
      "apoc.scoring.idf('term', 10, 2)" -> None,
      "apoc.scoring.tfidf('a', 'a b a', 10, 2)" -> None,
      
      "apoc.scoring.percentile(2.0, [1.0, 2.0, 3.0])" -> None,
      "apoc.scoring.pareto(1, 10, 100, 2)" -> None,
      "apoc.scoring.existence(5, true)" -> None,
      // apoc.util tail
      "apoc.util.sha256hex('a')" -> None,
      "apoc.util.md5base64('a')" -> None,
      "apoc.util.sha1base64('a')" -> None,
      "apoc.util.sha256base64('a')" -> None,
      "apoc.util.validatepattern('abc', '[a-z]+')" -> None,
      "apoc.util.formattimestamp(0, 'yyyy-MM-dd')" -> None,
      "apoc.util.parsetimestamp('1970-01-02T00:00:00Z')" -> Some(86400L),
      // apoc.hashing tail
      "apoc.hashing.md5('a')" -> None,
      "apoc.hashing.sha1('a')" -> None,
      "apoc.hashing.sha256('a')" -> None,
      "apoc.hashing.sha384('a')" -> None,
      // apoc.convert / json tail
      "apoc.convert.toList([1,2])" -> None,
      "apoc.convert.toMap(apoc.map.fromLists(['a'], [1]))" -> None,
      "apoc.convert.toSortedJsonMap(apoc.map.fromLists(['b','a'], [1,2]))" -> None,
      "apoc.json.parse('{\"a\": 1}')" -> None,
      "apoc.json.stringify(apoc.map.fromLists(['a'], [1]))" -> None,
      "apoc.json.values('{\"a\": 1, \"b\": 2}')" -> None,
      "apoc.json.path('{\"a\": {\"b\": 7}}', '$.a.b')" -> None,
      // apoc.map tail
      
      "apoc.map.mget(apoc.map.fromLists(['a','b'], [1,2]), ['a'])" -> None,
      "apoc.map.removeKeys(apoc.map.fromLists(['a','b'], [1,2]), ['a'])" -> None,
      "apoc.map.setEntry(apoc.map.fromLists(['a'], [1]), 'b', 2)" -> None,
      "apoc.map.sortedProperties(apoc.map.fromLists(['b','a'], [1,2]))" -> None,
      // apoc.coll tail
      "apoc.coll.isNotEmpty([1])" -> Some(true),
      "apoc.coll.insertAll([1,4], 1, [2,3])" -> None,
      // apoc.text / date / temporal tail
      "apoc.text.decapitalizeAll('AB CD')" -> Some("ab cd"),
      "apoc.date.systemTimezone()" -> None,
      "apoc.temporal.add(date('2024-05-06'), 1, 'days')" -> None,
      "apoc.temporal.subtract(date('2024-05-06'), 1, 'days')" -> None,
      "apoc.temporal.difference(date('2024-05-06'), date('2024-05-08'), 'days')" -> Some(2L),
      "apoc.temporal.toUTC(datetime('2024-05-06T00:00:00Z'))" -> None,
      "apoc.temporal.toLocal(datetime('2024-05-06T00:00:00Z'), 'UTC')" -> None)

    // nondeterministic-by-design names: the dispatcher REFUSES them with a
    // documented error (wall-clock / RNG would break snapshot replay) —
    // that refusal IS the asserted behavior
    val refused = Seq(
      "apoc.util.now()", "apoc.util.nowinseconds()", "apoc.util.timestamp()",
      "apoc.util.randomuuid()", "apoc.util.uuid()", "apoc.coll.shuffle([1,2])",
      "apoc.coll.randomItem([1,2])", "apoc.coll.randomItems([1,2], 1)",
      "apoc.date.currentTimestamp()", "apoc.temporal.age(date('2020-01-01'))")
    val notRefused = refused.flatMap { e =>
      try { value(e); Some(s"$e -> executed (expected refusal)") }
      catch {
        case t: Throwable
          if t.getMessage != null && (t.getMessage.contains("nondeterministic") ||
            t.getMessage.contains("wall-clock")) => None
        case t: Throwable => Some(s"$e -> wrong error: " + t.getMessage)
      }
    }
    assert(notRefused.isEmpty,
      s"refusal contract broken:\n" + notRefused.mkString("\n"))

    val broken = cases.flatMap { case (e, expected) =>
      try {
        val got = value(e)
        expected match {
          case Some(want) if got != want => Some(s"$e -> $got (wanted $want)")
          case None if got == null => Some(s"$e -> null")
          case _ => None
        }
      } catch { case t: Throwable => Some(s"$e -> threw ${t.getMessage}") }
    }
    assert(broken.isEmpty, s"round-7 smoke failures:\n${broken.mkString("\n")}")

    // entity-positional names on the live graph (node / rel / label)
    val entityCases: Seq[(String, Option[Any])] = Seq(
      "MATCH (n:Region) RETURN apoc.node.toMap(n) AS v LIMIT 1" -> None,
      "MATCH (n:Region) RETURN apoc.node.hasLabels(n, ['Region']) AS v LIMIT 1" -> Some(true),
      "MATCH (n:Region) RETURN apoc.node.relationshipTypesOut(n) AS v LIMIT 1" -> None,
      "MATCH (n:Region) RETURN apoc.node.relationshipTypesIn(n) AS v LIMIT 1" -> None,
      "MATCH (n:Region) RETURN apoc.label.pattern(labels(n)) AS v LIMIT 1" -> Some(":Region"),
      "MATCH (n:Region) RETURN apoc.label.hasAll(n, ['Region']) AS v LIMIT 1" -> Some(true),
      "MATCH (n:Region) RETURN apoc.label.hasAny(n, ['Region','Nope']) AS v LIMIT 1" -> Some(true),
      "MATCH (n:Region) RETURN apoc.label.toString(labels(n)) AS v LIMIT 1" -> Some("Region"),
      "MATCH (n:Region) RETURN apoc.label.fromString(':Region') AS v LIMIT 1" -> None,
      "MATCH (n:Region) RETURN apoc.label.normalize('region name') AS v LIMIT 1" -> None,
      "MATCH ()-[r:PLACED]->() RETURN apoc.rel.id(r) AS v LIMIT 1" -> None,
      "MATCH ()-[r:PLACED]->() RETURN apoc.rel.properties(r) AS v LIMIT 1" -> None,
      "MATCH ()-[r:PLACED]->() RETURN apoc.rel.toMap(r) AS v LIMIT 1" -> None,
      "MATCH ()-[r:PLACED]->() RETURN apoc.rel.type(r) AS v LIMIT 1" -> Some("PLACED"),
      "MATCH ()-[r:PLACED]->() RETURN apoc.rel.id(r) AS v LIMIT 1" -> None)
    val entityBroken = entityCases.flatMap { case (q, expected) =>
      try {
        val got = Cypher.run(g, q).collect()(0).get(0)
        expected match {
          case Some(want) if got != want => Some(s"$q -> $got (wanted $want)")
          case None if got == null => Some(s"$q -> null")
          case _ => None
        }
      } catch { case t: Throwable => Some(s"$q -> threw ${t.getMessage}") }
    }
    assert(entityBroken.isEmpty,
      s"round-7 entity smoke failures:\n${entityBroken.mkString("\n")}")
  }

  test("smoke calls, round 7b: search/cypher/meta/data procedure families") {
    val g = GraphQueries.graph(spark, sf)
    new GraphStore(g)
    def count(q: String): Long = Cypher.run(g, q).count()
    def one(q: String): Any = Cypher.run(g, q).collect()(0).get(0)

    // apoc.search.* — the label/property scan family (search.go:28-591)
    assert(count("CALL apoc.search.node('Region', 'name', 'AFRICA') YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.nodeAll('Region', '{\"name\":\"AFRICA\"}') YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.nodeAny('Region', '{\"name\":\"AFRICA\"}') YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.nodeReduced('Region', '{\"name\":\"AFRICA\"}', 5) YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.multiSearchAll('Region,Nation', '{\"name\":\"AFRICA\"}') YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.multiSearchAny('Region,Nation', '{\"name\":\"AFRICA\"}') YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.parallel('Region,Nation', 'name', 'AFRICA') YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.fullText('Region', 'name', 'africa asia') YIELD id RETURN id") == 2)
    assert(count("CALL apoc.search.fuzzy('Region', 'name', 'AFRIKA', 2) YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.regex('Region', 'name', 'A.*A') YIELD id RETURN id") >= 2)
    assert(count("CALL apoc.search.prefix('Region', 'name', 'A') YIELD id RETURN id") >= 3)
    assert(count("CALL apoc.search.suffix('Region', 'name', 'ICA') YIELD id RETURN id") >= 2)
    assert(count("CALL apoc.search.contains('Region', 'name', 'EUR') YIELD id RETURN id") == 1)
    assert(count("CALL apoc.search.range('Nation', 'key', 0, 3) YIELD id RETURN id") == 4)

    // apoc.cypher.* pass-through procedures (cypher.go)
    assert(one("CALL apoc.cypher.run('MATCH (r:Region) RETURN count(r) AS n') YIELD n RETURN n") == 5L)
    assert(one("CALL apoc.cypher.runFirstColumnSingle('MATCH (r:Region) RETURN count(r)') YIELD value RETURN value").toString == "5")
    assert(count("CALL apoc.cypher.runFirstColumnMany('MATCH (r:Region) RETURN r.name') YIELD value RETURN value") == 5)
    assert(count("CALL apoc.cypher.toList('MATCH (r:Region) RETURN r.name AS name') YIELD list RETURN list") >= 1)

    // apoc.meta.* type functions (meta.go:134)
    assert(one("RETURN apoc.meta.type(1) AS v") == "INTEGER")
    assert(one("RETURN apoc.meta.type('x') AS v") == "STRING")
    assert(one("RETURN apoc.meta.type(1.5) AS v") == "FLOAT")
    assert(one("RETURN apoc.meta.isType(1, 'INTEGER') AS v") == true)
    assert(one("RETURN apoc.meta.cypherType([1,2]) AS v").toString.contains("LIST"))

    // apoc.data / text extraction
    assert(one("RETURN apoc.data.domain('user@example.com') AS v") == "example.com")
  }

  test("apoc.help filters by substring and types by registry membership") {
    val g = GraphQueries.graph(spark, sf)
    val rows = Cypher.run(g,
      "CALL apoc.help('text.indexof') YIELD name, type RETURN name, type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("apoc.text.indexof", "function")))
    val iter = Cypher.run(g,
      "CALL apoc.help('periodic.iterate') YIELD name, type RETURN name, type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(iter == Set(("apoc.periodic.iterate", "procedure")))
  }
}
