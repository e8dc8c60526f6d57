package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cypher.Cypher

/** The Cypher query surface (SURVEY.md §2.2–§2.10) exercised END-TO-END
  * through the string front end: every query here goes
  * lexer → parser → AST → planner → DataFrame, with a hand-derived DuckDB
  * SQL oracle over the raw star schema.
  *
  * Graph projection property map (FIXTURES.md §4): every node hoists
  * `key` (source PK), `name`, `acctbal` (Customer.c_acctbal /
  * Order.o_totalprice / Part.p_retailprice / Supplier.s_acctbal),
  * `mktsegment` (Customer.c_mktsegment / Order.o_orderpriority /
  * Part.p_brand).
  */
object CypherQueries {

  private def cq(name: String, section: String, cypherText: String, oracle: String,
      params: Map[String, Any] = Map.empty): (String, GQuery) =
    name -> GQuery(
      (s: SparkSession, d: String) => Cypher.run(GraphQueries.graph(s, d), cypherText, params),
      Option(oracle).filter(_.nonEmpty), section)

  val queries: Map[String, GQuery] = Map(
    cq("q_cypher_match_filter", "2.2",
      """MATCH (c:Customer)
         WHERE c.acctbal > 5000 AND c.mktsegment = 'BUILDING'
         RETURN c.key AS c_custkey, c.name AS c_name""",
      """SELECT c_custkey, c_name FROM customer
         WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING'"""),

    cq("q_cypher_expand_agg", "2.4",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
         RETURN c.mktsegment AS segment, count(o) AS n_orders""",
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_orders
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY c_mktsegment"""),

    cq("q_cypher_chain_sum", "2.3",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)-[r:CONTAINS]->(p:Part)
         RETURN c.mktsegment AS segment, sum(r.quantity) AS total_qty""",
      // l_quantity is integral-valued → double sum is exact in any order
      """SELECT c_mktsegment AS segment, SUM(l_quantity) AS total_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment"""),

    cq("q_cypher_optional_match", "2.3",
      """MATCH (c:Customer)
         OPTIONAL MATCH (c)-[:PLACED]->(o:Order)
         RETURN c.key AS c_custkey, count(o) AS n_orders""",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey"""),

    cq("q_cypher_string_predicates", "2.2",
      """MATCH (p:Part)
         WHERE p.name STARTS WITH 's' AND p.name CONTAINS 'l' AND NOT p.name ENDS WITH 'bolt'
         RETURN p.key AS p_partkey, p.name AS p_name""",
      """SELECT p_partkey, p_name FROM part
         WHERE p_name LIKE 's%' AND p_name LIKE '%l%' AND p_name NOT LIKE '%bolt'"""),

    cq("q_cypher_regex", "2.2",
      """MATCH (p:Part) WHERE p.name =~ '^(red|blue) (bolt|gear)$'
         RETURN p.key AS p_partkey, p.name AS p_name""",
      """SELECT p_partkey, p_name FROM part
         WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)$')"""),

    cq("q_cypher_orderby_limit", "2.6",
      """MATCH (o:Order)
         RETURN o.key AS o_orderkey, o.acctbal AS o_totalprice
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),

    cq("q_cypher_distinct_skip", "2.6",
      """MATCH (c:Customer)
         RETURN DISTINCT c.mktsegment AS segment
         ORDER BY segment SKIP 1 LIMIT 3""",
      """SELECT DISTINCT c_mktsegment AS segment FROM customer
         ORDER BY segment LIMIT 3 OFFSET 1"""),

    cq("q_cypher_with_having", "2.9",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
         WITH c, count(o) AS n WHERE n >= 20
         RETURN c.mktsegment AS segment, count(c) AS n_cust""",
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_cust FROM (
           SELECT c_custkey, c_mktsegment, COUNT(*) AS n
           FROM customer JOIN orders ON o_custkey = c_custkey
           GROUP BY c_custkey, c_mktsegment HAVING COUNT(*) >= 20)
         GROUP BY c_mktsegment"""),

    cq("q_cypher_unwind", "2.9",
      """UNWIND [1, 2, 3, 4, 5] AS x RETURN x, x * x AS sq""",
      """SELECT x, x * x AS sq FROM
         (SELECT CAST(unnest([1,2,3,4,5]) AS BIGINT) AS x)"""),

    cq("q_cypher_multi_match", "2.3",
      """MATCH (c:Customer)-[:FROM]->(n:Nation)
         MATCH (s:Supplier)-[:LOCATED_IN]->(n)
         RETURN n.name AS n_name, count(*) AS n_pairs""",
      """SELECT n_name, COUNT(*) AS n_pairs
         FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN supplier ON s_nationkey = n_nationkey
         GROUP BY n_name"""),

    cq("q_cypher_var_length", "2.3",
      """MATCH (r:Region)<-[*1..2]-(x)
         RETURN r.name AS r_name, count(x) AS n""",
      """SELECT r_name,
           (SELECT COUNT(*) FROM nation n2 WHERE n2.n_regionkey = region.r_regionkey)
         + (SELECT COUNT(*) FROM customer JOIN nation n3 ON c_nationkey = n3.n_nationkey
            WHERE n3.n_regionkey = region.r_regionkey)
         + (SELECT COUNT(*) FROM supplier JOIN nation n4 ON s_nationkey = n4.n_nationkey
            WHERE n4.n_regionkey = region.r_regionkey) AS n
         FROM region"""),

    cq("q_cypher_exists", "2.3",
      """MATCH (c:Customer)
         WHERE EXISTS((c)-[:PLACED]->(o:Order {mktsegment: '1-URGENT'}))
         RETURN c.key AS c_custkey""",
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""),

    cq("q_cypher_not_exists", "2.3",
      """MATCH (c:Customer)
         WHERE NOT EXISTS((c)-[:PLACED]->(o:Order {mktsegment: '1-URGENT'}))
         RETURN c.key AS c_custkey""",
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""),

    cq("q_cypher_case", "2.2",
      """MATCH (o:Order)
         RETURN CASE WHEN o.acctbal < 50000 THEN 'small'
                     WHEN o.acctbal < 150000 THEN 'medium'
                     ELSE 'large' END AS bucket, count(*) AS n""",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS bucket, COUNT(*) AS n
         FROM orders GROUP BY 1"""),

    cq("q_cypher_union", "2.7",
      """MATCH (c:Customer)-[:FROM]->(n:Nation) RETURN n.key AS nationkey
         UNION
         MATCH (s:Supplier)-[:LOCATED_IN]->(n:Nation) RETURN n.key AS nationkey""",
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
         UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier"""),

    cq("q_cypher_scalar_fns", "2.10",
      """MATCH (c:Customer) WHERE c.key <= 100
         RETURN c.key AS k, abs(c.acctbal) AS abs_bal,
                toString(c.key) AS ks, toUpper(c.name) AS uname,
                substring(c.name, 0, 8) AS sub8, size(c.name) AS name_len""",
      """SELECT c_custkey AS k, ABS(c_acctbal) AS abs_bal,
                CAST(c_custkey AS VARCHAR) AS ks, UPPER(c_name) AS uname,
                substring(c_name, 1, 8) AS sub8,
                CAST(length(c_name) AS INT) AS name_len
         FROM customer WHERE c_custkey <= 100"""),

    cq("q_cypher_entity_fns", "2.10",
      """MATCH (c:Customer)-[r:PLACED]->(o:Order) WHERE c.key <= 10
         RETURN id(c) AS cid, labels(c)[0] AS lbl, type(r) AS rtype, o.key AS okey""",
      """SELECT 'Customer:' || c_custkey AS cid, 'Customer' AS lbl,
                'PLACED' AS rtype, o_orderkey AS okey
         FROM customer JOIN orders ON o_custkey = c_custkey
         WHERE c_custkey <= 10"""),

    cq("q_cypher_collect", "2.4",
      // joined to a string: the driver's pandas row-sort can't hash arrays
      """MATCH (n:Nation)
         RETURN n.key % 5 AS grp, apoc.text.join(sort(collect(n.name)), ',') AS names""",
      """SELECT CAST(n_nationkey % 5 AS BIGINT) AS grp,
                array_to_string(list_sort(list(n_name)), ',') AS names
         FROM nation GROUP BY 1"""),

    cq("q_cypher_param", "2.2",
      """MATCH (c:Customer) WHERE c.acctbal > $minbal
         RETURN c.key AS c_custkey""",
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000""",
      params = Map("minbal" -> 9000L)),

    cq("q_cypher_call_correlated", "2.9",
      """MATCH (c:Customer)
         CALL { WITH c MATCH (c)-[:PLACED]->(o:Order) RETURN count(o) AS n_orders }
         RETURN c.key AS c_custkey, n_orders""",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey"""),

    cq("q_cypher_call_uncorrelated", "2.9",
      """MATCH (n:Nation)
         CALL { MATCH (r:Region) RETURN count(r) AS n_regions }
         RETURN count(n) AS n_nations, min(n_regions) AS n_regions""",
      """SELECT (SELECT COUNT(*) FROM nation) AS n_nations,
                (SELECT COUNT(*) FROM region) AS n_regions"""),

    cq("q_cypher_apoc_fns", "2.10",
      """MATCH (p:Part) WHERE p.key <= 200
         RETURN p.key AS k,
                apoc.util.md5(p.name) AS h,
                levenshtein(p.name, 'red bolt') AS lev,
                lpad(toString(p.key), 8, '0') AS padded,
                apoc.text.capitalize(p.name) AS cap""",
      """SELECT p_partkey AS k, md5(p_name) AS h,
                CAST(levenshtein(p_name, 'red bolt') AS INT) AS lev,
                lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
                upper(substring(p_name, 1, 1)) || substring(p_name, 2) AS cap
         FROM part WHERE p_partkey <= 200"""),

    cq("q_cypher_apoc_fns2", "2.10",
      // round-2 APOC additions: OrNull casts, charAt/code/byteCount,
      // coll occurrences/sumLongs/pairs
      """MATCH (p:Part) WHERE p.key <= 100
         RETURN p.key AS k,
                toIntegerOrNull(p.mktsegment) AS ion,
                toIntegerOrNull(toString(p.key)) AS ion2,
                apoc.text.charAt(p.name, 1) AS c1,
                apoc.text.code(p.name) AS code,
                apoc.text.byteCount(p.name) AS bc,
                apoc.coll.occurrences(split(p.name, ' '), 'red') AS occ,
                apoc.coll.sumLongs([p.key, 1, 2]) AS sl,
                size(apoc.coll.pairs(split(p.name, ' '))) AS np""",
      """SELECT p_partkey AS k,
                TRY_CAST(p_brand AS BIGINT) AS ion,
                TRY_CAST(CAST(p_partkey AS VARCHAR) AS BIGINT) AS ion2,
                substring(p_name, 2, 1) AS c1,
                ascii(p_name) AS code,
                CAST(octet_length(CAST(p_name AS BLOB)) AS INT) AS bc,
                CAST(len(list_filter(string_split(p_name, ' '), w -> w = 'red')) AS INT) AS occ,
                p_partkey + 3 AS sl,
                CAST(len(string_split(p_name, ' ')) - 1 AS INT) AS np
         FROM part WHERE p_partkey <= 100"""),

    cq("q_cypher_apoc_coll", "2.10",
      // round-3 apoc.coll.* tranche: 17 functions, DuckDB replays each
      """MATCH (p:Part) WHERE p.key <= 120
         WITH p, split(p.name, ' ') AS ws
         RETURN p.key AS k,
                apoc.coll.containsAll(ws, ['red']) AS has_red,
                apoc.coll.containsAny(ws, ['red', 'green']) AS has_rg,
                apoc.coll.containsDuplicates(ws) AS has_dup,
                apoc.text.join(apoc.coll.different(ws, ['red']), ',') AS diff_red,
                apoc.text.join(apoc.coll.sort(apoc.coll.disjunction(ws, ['red', 'blue'])), ',') AS disj,
                apoc.text.join(apoc.coll.dropDuplicateNeighbors(ws), ',') AS ddn,
                apoc.text.join(apoc.coll.sort(apoc.coll.duplicates(ws)), ',') AS dups,
                apoc.text.join(apoc.coll.fill('x', 3), ',') AS filled,
                apoc.text.join(apoc.coll.insert(ws, 1, 'X'), ',') AS ins,
                apoc.text.join(apoc.coll.remove(ws, 0), ',') AS rem,
                apoc.text.join(apoc.coll.set(ws, 0, 'Y'), ',') AS st,
                size(apoc.coll.split(ws, 2)) AS nsplit,
                size(apoc.coll.pairsMin(ws)) AS npmin,
                last(apoc.coll.runningTotal([toFloat(p.key), 2.0, 3.0])) AS rt,
                apoc.coll.isEmpty(ws) AS emp,
                apoc.coll.isNotEmpty(ws) AS nemp""",
      """SELECT p_partkey AS k,
                list_has_all(ws, ['red']) AS has_red,
                list_has_any(ws, ['red', 'green']) AS has_rg,
                len(list_distinct(ws)) < len(ws) AS has_dup,
                COALESCE(array_to_string(list_filter(ws, (x, i) -> list_position(ws, x) = i AND x <> 'red'), ','), '') AS diff_red,
                COALESCE(array_to_string(list_sort(list_distinct(list_concat(
                  list_filter(ws, x -> x NOT IN ('red', 'blue')),
                  list_filter(['red', 'blue'], x -> NOT list_contains(ws, x))))), ','), '') AS disj,
                COALESCE(array_to_string(list_filter(ws, (x, i) -> i = 1 OR x <> ws[i - 1]), ','), '') AS ddn,
                COALESCE(array_to_string(list_sort(list_distinct(
                  list_filter(ws, x -> len(list_filter(ws, y -> y = x)) > 1))), ','), '') AS dups,
                'x,x,x' AS filled,
                COALESCE(array_to_string(list_concat(list_concat(ws[1:1], ['X']), ws[2:]), ','), '') AS ins,
                COALESCE(array_to_string(ws[2:], ','), '') AS rem,
                COALESCE(array_to_string(list_concat(['Y'], ws[2:]), ','), '') AS st,
                CAST(ceil(len(ws) / 2.0) AS INT) AS nsplit,
                CAST(floor(len(ws) / 2) AS INT) AS npmin,
                CAST(p_partkey AS DOUBLE) + 5.0 AS rt,
                len(ws) = 0 AS emp,
                len(ws) > 0 AS nemp
         FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws
               FROM part WHERE p_partkey <= 120)"""),

    cq("q_cypher_apoc_text", "2.10",
      // round-3 apoc.text.* tranche: case conversion, distances, slug, dice
      """MATCH (p:Part) WHERE p.key <= 120
         RETURN p.key AS k,
                apoc.text.swapCase(p.name) AS sc,
                apoc.text.camelCase(p.name) AS cc,
                apoc.text.upperCamelCase(p.name) AS ucc,
                apoc.text.snakeCase(p.name) AS snk,
                apoc.text.compareCleaned(p.name, 'red bolt') AS cmp,
                apoc.text.hammingDistance(p.name, p.name) AS ham0,
                apoc.text.hammingDistance(apoc.text.charAt(p.name, 0), 'x') AS ham1,
                apoc.text.fuzzyMatch(p.name, 'burlywood') AS fm,
                apoc.text.slug(p.name) AS slg,
                apoc.text.sorensenDiceSimilarity(p.name, 'metallic red') AS dice,
                apoc.text.fromCodePoint(65 + p.key % 26) AS cp,
                size(apoc.text.indexesOf(p.name, 'e')) AS ne,
                last(apoc.text.indexesOf(p.name, 'e')) AS lastpos""",
      """SELECT p_partkey AS k,
                array_to_string(list_transform(string_split(p_name, ''),
                  c -> CASE WHEN c = lower(c) THEN upper(c) ELSE lower(c) END), '') AS sc,
                ws[1] || array_to_string(list_transform(ws[2:], w -> upper(w[1]) || w[2:]), '') AS cc,
                array_to_string(list_transform(ws, w -> upper(w[1]) || w[2:]), '') AS ucc,
                array_to_string(ws, '_') AS snk,
                regexp_replace(lower(p_name), '[^a-z0-9]', '', 'g') = 'redbolt' AS cmp,
                CAST(0 AS INT) AS ham0,
                CAST(CASE WHEN substring(p_name, 1, 1) = 'x' THEN 0 ELSE 1 END AS INT) AS ham1,
                (1.0 - CAST(levenshtein(p_name, 'burlywood') AS DOUBLE)
                     / greatest(length(p_name), 9)) >= 0.5 AS fm,
                regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'),
                  '^-+|-+$', '', 'g') AS slg,
                CASE WHEN p_name = 'metallic red' THEN 1.0
                     WHEN length(p_name) < 2 THEN 0.0
                     ELSE 2.0 * len(list_intersect(bg1, bg2))
                          / (len(bg1) + len(bg2)) END AS dice,
                chr(CAST(65 + p_partkey % 26 AS INT)) AS cp,
                CAST(len(epos) AS INT) AS ne,
                epos[-1] AS lastpos
         FROM (SELECT *,
                 list_filter(string_split(p_name, ' '), w -> w <> '') AS ws,
                 list_filter(generate_series(0, length(p_name) - 1),
                   i -> substring(p_name, CAST(i + 1 AS INT), 1) = 'e') AS epos,
                 list_distinct(list_transform(
                   list_filter(generate_series(0, length(p_name)), i -> i + 2 <= length(p_name)),
                   i -> substring(p_name, CAST(i + 1 AS INT), 2))) AS bg1,
                 list_distinct(list_transform(
                   list_filter(generate_series(0, 12), i -> i + 2 <= 12),
                   i -> substring('metallic red', CAST(i + 1 AS INT), 2))) AS bg2
               FROM part WHERE p_partkey <= 120)"""),

    cq("q_cypher_apoc_map", "2.10",
      // round-3 apoc.map.* tranche: every op reduces to part columns
      """MATCH (p:Part) WHERE p.key <= 100
         WITH p, apoc.map.fromLists(['a', 'b'], [p.key, toInteger(p.size)]) AS m
         RETURN p.key AS k,
                apoc.map.get(m, 'a') AS ga,
                apoc.map.get(m, 'c', -1) AS gc,
                apoc.map.get(apoc.map.setKey(m, 'c', p.key + 1), 'c') AS sk,
                size(apoc.map.removeKeys(m, ['a'])) AS nrk,
                apoc.coll.sum(apoc.map.mget(m, ['a', 'b'])) AS sm,
                apoc.map.get(apoc.map.fromValues(['x', toString(p.key), 'y', '2']), 'x') AS fv,
                size(apoc.map.submap(m, ['a'])) AS nsub,
                size(apoc.map.sortedProperties(m)) AS nsp,
                size(apoc.map.clean(m, ['a'], [-999])) AS ncl,
                apoc.map.get(apoc.map.merge(m, apoc.map.fromLists(['z'], [9])), 'z') AS mz""",
      """SELECT p_partkey AS k,
                CAST(p_partkey AS BIGINT) AS ga,
                CAST(-1 AS BIGINT) AS gc,
                CAST(p_partkey + 1 AS BIGINT) AS sk,
                CAST(1 AS INT) AS nrk,
                CAST(p_partkey + p_size AS DOUBLE) AS sm,
                CAST(p_partkey AS VARCHAR) AS fv,
                CAST(1 AS INT) AS nsub,
                CAST(2 AS INT) AS nsp,
                CAST(1 AS INT) AS ncl,
                CAST(9 AS BIGINT) AS mz
         FROM part WHERE p_partkey <= 100"""),

    cq("q_cypher_apoc_num", "2.10",
      // round-3 apoc.number/math tranche: base conversions, range remaps,
      // primality, gcd/lcm, roman numerals, list statistics — every column
      // replayed in DuckDB (roman via the classic repeat/replace chain)
      """MATCH (p:Part) WHERE p.key <= 120
         RETURN p.key AS k,
                apoc.number.toHex(p.key) AS hx,
                apoc.number.fromHex(apoc.number.toHex(p.key)) AS hx2,
                apoc.number.toBinary(p.key) AS bn,
                apoc.number.fromBinary(apoc.number.toBinary(p.key)) AS bn2,
                apoc.number.clamp(toFloat(p.key), 10.0, 50.0) AS cl,
                apoc.number.lerp(0.0, toFloat(p.key), 0.5) AS lp,
                apoc.number.normalize(toFloat(p.key), 0.0, 200.0) AS nm,
                apoc.number.map(toFloat(p.key), 0.0, 200.0, 0.0, 10.0) AS mp,
                apoc.number.isEven(p.key) AS ev,
                apoc.number.isPrime(p.key) AS pr,
                apoc.number.gcd(p.key, 36) AS gc,
                apoc.number.lcm(p.key, 4) AS lc,
                apoc.number.fibonacci(11) AS fib,
                apoc.number.factorial(6) AS fact,
                apoc.number.romanize(p.key) AS rom,
                apoc.number.arabize(apoc.number.romanize(p.key)) AS arab,
                apoc.math.percentile([1.0, 2.0, 3.0, 4.0, toFloat(p.key)], 50.0) AS pct,
                apoc.math.stdDev([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]) AS sd,
                apoc.math.mode([1.0, 2.0, 2.0, toFloat(p.key)]) AS md,
                apoc.math.mean([toFloat(p.key), 4.0]) AS mn""",
      """SELECT p_partkey AS k,
                upper(format('{:x}', p_partkey)) AS hx,
                p_partkey AS hx2,
                bin(p_partkey) AS bn,
                p_partkey AS bn2,
                GREATEST(LEAST(CAST(p_partkey AS DOUBLE), 50.0), 10.0) AS cl,
                CAST(p_partkey AS DOUBLE) * 0.5 AS lp,
                CAST(p_partkey AS DOUBLE) / 200.0 AS nm,
                CAST(p_partkey AS DOUBLE) / 200.0 * 10.0 AS mp,
                p_partkey % 2 = 0 AS ev,
                p_partkey >= 2 AND len(list_filter(range(2, CAST(floor(sqrt(p_partkey)) AS BIGINT) + 1),
                  d -> p_partkey % d = 0)) = 0 AS pr,
                gcd(p_partkey, 36) AS gc,
                lcm(p_partkey, 4) AS lc,
                CAST(89 AS BIGINT) AS fib,
                CAST(720 AS BIGINT) AS fact,
                replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(
                  repeat('I', CAST(p_partkey AS INT)),
                  'IIIII', 'V'), 'IIII', 'IV'), 'VV', 'X'), 'VIV', 'IX'),
                  'XXXXX', 'L'), 'XXXX', 'XL'), 'LL', 'C'), 'LXL', 'XC'),
                  'CCCCC', 'D'), 'CCCC', 'CD'), 'DD', 'M'), 'DMD', 'CM') AS rom,
                p_partkey AS arab,
                list_sort([1.0, 2.0, 3.0, 4.0, CAST(p_partkey AS DOUBLE)])[3] AS pct,
                2.0 AS sd,
                CASE WHEN p_partkey = 1 THEN 1.0 ELSE 2.0 END AS md,
                (CAST(p_partkey AS DOUBLE) + 4.0) / 2 AS mn
         FROM part WHERE p_partkey <= 120"""),

    cq("q_cypher_apoc_date", "2.10",
      // round-3 apoc.date tranche over Order.orderdate (string-map prop):
      // parse → field extraction / arithmetic / ISO round-trip
      """MATCH (o:Order) WHERE o.key <= 500
         WITH o.key AS k, apoc.date.parse(o['orderdate'], 'yyyy-MM-dd HH:mm:ss') AS ts
         RETURN k,
                apoc.date.field(ts, 'year') AS y,
                apoc.date.field(ts, 'dayOfWeek') AS dow,
                apoc.date.field(ts, 'dayOfYear') AS doy,
                apoc.date.add(ts, 3, 'days') AS ts3,
                apoc.date.convert(86400000, 'ms', 'hours') AS cv,
                apoc.date.toISO8601(ts) AS iso,
                apoc.date.fromISO8601(apoc.date.toISO8601(ts)) AS rt,
                apoc.date.toYears(ts) AS yrs,
                apoc.date.fields(ts)['weekOfYear'] AS woy""",
      """SELECT o_orderkey AS k,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(dayofweek(o_orderdate) AS INT) AS dow,
                CAST(dayofyear(o_orderdate) AS INT) AS doy,
                CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) + 259200 AS ts3,
                CAST(24 AS BIGINT) AS cv,
                strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ') AS iso,
                CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS rt,
                CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) / 31557600.0 AS yrs,
                CAST(weekofyear(o_orderdate) AS INT) AS woy
         FROM orders WHERE o_orderkey <= 500"""),

    cq("q_cypher_apoc_temporal", "2.10",
      // round-3 apoc.temporal tranche on TimestampType (datetime())
      """MATCH (o:Order) WHERE o.key <= 500
         WITH o.key AS k, datetime(o['orderdate']) AS t,
              apoc.date.parse(o['orderdate'], 'yyyy-MM-dd HH:mm:ss') AS ts
         RETURN k,
                apoc.temporal.quarter(t) AS q,
                apoc.temporal.weekOfYear(t) AS woy,
                apoc.temporal.dayOfYear(t) AS doy,
                apoc.temporal.isWeekend(t) AS we,
                apoc.temporal.isLeapYear(apoc.date.field(ts, 'year')) AS leap,
                apoc.temporal.daysInMonth(2024, 2) AS dim,
                toString(apoc.temporal.startOf(t, 'month')) AS som,
                toString(apoc.temporal.endOf(t, 'month')) AS eom,
                apoc.temporal.difference(apoc.temporal.startOf(t, 'year'), t, 'days') AS dd,
                apoc.temporal.toEpochMillis(t) AS ms""",
      """SELECT o_orderkey AS k,
                CAST(quarter(o_orderdate) AS INT) AS q,
                CAST(weekofyear(o_orderdate) AS INT) AS woy,
                CAST(dayofyear(o_orderdate) AS INT) AS doy,
                dayofweek(o_orderdate) IN (0, 6) AS we,
                (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0)
                  OR year(o_orderdate) % 400 = 0 AS leap,
                CAST(29 AS INT) AS dim,
                CAST(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS som,
                CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
                     + INTERVAL 1 MONTH - INTERVAL 1 MICROSECOND AS VARCHAR) AS eom,
                CAST(dayofyear(o_orderdate) - 1 AS BIGINT) AS dd,
                CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) * 1000 AS ms
         FROM orders WHERE o_orderkey <= 500"""),

    cq("q_cypher_apoc_util_hash", "2.10",
      // round-3 apoc.util/hashing tranche: digests, base64, FNV-1a fold,
      // pattern validation, typeOf, repeat/range
      """MATCH (p:Part) WHERE p.key <= 100
         RETURN p.key AS k,
                apoc.util.sha256(p.name) AS h256,
                apoc.util.md5base64(p.name) AS mb64,
                apoc.util.encodeBase64(p.name) AS eb64,
                apoc.util.decodeBase64(apoc.util.encodeBase64(p.name)) AS rt,
                apoc.util.validatePattern(p.name, '^[a-z ]+$') AS vp,
                apoc.util.typeOf(p.name) AS tn,
                apoc.util.typeOf(p.key) AS tk,
                size(apoc.util.repeat('x', 4)) AS nrep,
                last(apoc.util.range(1, 10, 3)) AS rng,
                apoc.hashing.fnv1a(p.name) AS fnv,
                apoc.hashing.consistentHash(p.name, 16) AS ch,
                apoc.util.parseTimestamp('2024-01-15T10:30:00Z') AS pts""",
      """SELECT p_partkey AS k,
                sha256(p_name) AS h256,
                to_base64(unhex(md5(p_name))) AS mb64,
                to_base64(encode(p_name)) AS eb64,
                p_name AS rt,
                regexp_matches(p_name, '^[a-z ]+$') AS vp,
                'STRING' AS tn,
                'INTEGER' AS tk,
                CAST(4 AS INT) AS nrep,
                CAST(10 AS BIGINT) AS rng,
                list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
                  list_transform(string_split(p_name, ''), c -> CAST(ord(c) AS BIGINT))),
                  (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS fnv,
                CAST(list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
                  list_transform(string_split(p_name, ''), c -> CAST(ord(c) AS UBIGINT))),
                  (h, c) -> CAST(CAST(xor(h, c) AS HUGEINT) * 1099511628211
                    % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT))
                  % 16 AS INT) AS ch,
                CAST(1705314600 AS BIGINT) AS pts
         FROM part WHERE p_partkey <= 100"""),

    cq("q_cypher_apoc_json", "2.10",
      // round-3 apoc.convert/json tranche: toJson round-trips, JSON-path
      // extraction, keys/size/validate
      """MATCH (p:Part) WHERE p.key <= 100
         WITH p, apoc.convert.toJson([p.name, toString(p.key)]) AS js
         RETURN p.key AS k, js,
                apoc.json.validate(js) AS ok,
                apoc.json.size(js) AS sz,
                apoc.convert.getJsonProperty('{"a": 1, "b": 2}', 'b') AS gb,
                apoc.json.path('{"a": {"c": 7}}', '$.a.c') AS pc,
                apoc.text.join(apoc.convert.toStringList(apoc.convert.fromJsonList(js)), '|') AS rt,
                apoc.text.join(apoc.json.keys('{"x": 1, "y": 2}'), ',') AS ks""",
      """SELECT p_partkey AS k,
                to_json([p_name, CAST(p_partkey AS VARCHAR)]) AS js,
                true AS ok,
                CAST(2 AS INT) AS sz,
                '2' AS gb,
                '7' AS pc,
                p_name || '|' || CAST(p_partkey AS VARCHAR) AS rt,
                'x,y' AS ks
         FROM part WHERE p_partkey <= 100"""),

    cq("q_cypher_apoc_json2", "2.10",
      // round-3 long-tail tranche: the Go-marshal-shaped tree rewrites
      // (sorted keys, shortest numbers) — every column is a string-level
      // DuckDB replay of the canonical rendering
      """MATCH (p:Part) WHERE p.key <= 50
         WITH p, '{"key":' + toString(p.key) + ',"name":"' + p.name + '"}' AS j
         RETURN p.key AS k,
                apoc.json.compact(' ' + j + ' ') AS cj,
                apoc.json.type(j) AS tj,
                apoc.json.type('[1]') AS ta,
                apoc.json.type('{oops') AS tb,
                apoc.json.flatten('{"a":{"b":' + toString(p.key) + '}}') AS fl,
                apoc.json.unflatten('{"a.b":' + toString(p.key) + '}') AS uf,
                apoc.json.set('{"k":1}', '$.m', p.key) AS st,
                apoc.json.delete(j, '$.name') AS dl,
                apoc.json.merge('{"a":1}', j) AS mg,
                apoc.json.pretty('{"k":' + toString(p.key) + '}') AS pr""",
      """SELECT p_partkey AS k,
                '{"key":' || p_partkey || ',"name":"' || p_name || '"}' AS cj,
                'object' AS tj, 'array' AS ta, 'invalid' AS tb,
                '{"a.b":' || p_partkey || '}' AS fl,
                '{"a":{"b":' || p_partkey || '}}' AS uf,
                '{"k":1,"m":' || p_partkey || '}' AS st,
                '{"key":' || p_partkey || '}' AS dl,
                '{"a":1,"key":' || p_partkey || ',"name":"' || p_name || '"}' AS mg,
                '{' || chr(10) || '  "k": ' || p_partkey || chr(10) || '}' AS pr
         FROM part WHERE p_partkey <= 50"""),

    cq("q_cypher_apoc_hash64", "2.10",
      // 64-bit FNV family (native wrapping-multiply Catalyst expressions,
      // HashExprs.scala) — DuckDB replays the byte fold in HUGEINT modulo
      // 2^64 and converts to the same signed-64 bits
      """MATCH (p:Part) WHERE p.key <= 50
         RETURN p.key AS k,
                apoc.hashing.fnv164(p.name) AS f1,
                apoc.hashing.fnv1a64(p.name) AS f1a,
                apoc.hashing.cityHash64(p.name) AS city,
                apoc.hashing.consistentHash(p.name, 7) AS ch7""",
      """WITH f AS (
           SELECT p_partkey AS k,
             list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
               list_transform(string_split(p_name, ''), c -> CAST(ord(c) AS UBIGINT))),
               (h, c) -> xor(CAST(CAST(h AS HUGEINT) * 1099511628211
                 % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT), c)) AS u1,
             list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),
               list_transform(string_split(p_name, ''), c -> CAST(ord(c) AS UBIGINT))),
               (h, c) -> CAST(CAST(xor(h, c) AS HUGEINT) * 1099511628211
                 % CAST(18446744073709551616 AS HUGEINT) AS UBIGINT)) AS u1a
           FROM part WHERE p_partkey <= 50)
         SELECT k,
           CASE WHEN u1 >= 9223372036854775808
                THEN CAST(CAST(u1 AS HUGEINT) - 18446744073709551616 AS BIGINT)
                ELSE CAST(u1 AS BIGINT) END AS f1,
           CASE WHEN u1a >= 9223372036854775808
                THEN CAST(CAST(u1a AS HUGEINT) - 18446744073709551616 AS BIGINT)
                ELSE CAST(u1a AS BIGINT) END AS f1a,
           CASE WHEN u1a >= 9223372036854775808
                THEN CAST(CAST(u1a AS HUGEINT) - 18446744073709551616 AS BIGINT)
                ELSE CAST(u1a AS BIGINT) END AS city,
           CAST(u1a % 7 AS INT) AS ch7
         FROM f"""),

    cq("q_cypher_apoc_breadth", "2.10",
      // map/util/diff/number/math/temporal long-tail completion — constants
      // and per-row arithmetic DuckDB can replay directly
      """MATCH (p:Part) WHERE p.key <= 50
         WITH p, apoc.map.fromLists(['a', 'b'], [p.key, p.key + 1]) AS m
         RETURN p.key AS k,
                apoc.map.get(apoc.map.mergeList([m, apoc.map.fromLists(['a'], [p.key + 5])]), 'a') AS ml,
                apoc.map.get(apoc.map.setLists(m, ['c'], [p.key * 2]), 'c') AS sl,
                size(apoc.map.keys(m)) AS nk,
                apoc.util.when(p.key > 25, 'hi', 'lo') AS w,
                apoc.util.case([p.key > 25, 'hi'], 'lo') AS uc,
                apoc.util.coalesce(null, p.name) AS co,
                apoc.map.get(apoc.util.merge(m, apoc.map.fromLists(['a'], [p.key * 10])), 'a') AS um,
                apoc.diff.summary(apoc.diff.maps(m, apoc.map.fromLists(['a', 'c'], [p.key, 9])))['added'] AS da,
                apoc.map.get(apoc.diff.merge(m, apoc.map.fromLists(['a'], [p.key]), 'combine'), 'a') AS cb,
                apoc.number.exact(p.key + 0.5) AS ne,
                apoc.number.parse(toString(p.key) + ',000') AS np,
                apoc.math.nextPrime(p.key) AS pr,
                apoc.math.stdev([p.key, p.key + 2.0]) AS sd,
                apoc.temporal.formatDuration(apoc.temporal.duration(p.key, 'minutes'), 'x') AS fd,
                apoc.date.toUnixTime(apoc.date.fromUnixTime(p.key * 1000)) AS tu,
                apoc.temporal.format(apoc.date.fromUnixTime(p.key * 86400), 'yyyy-MM-dd') AS tf""",
      """SELECT p_partkey AS k,
                CAST(p_partkey + 5 AS BIGINT) AS ml,
                CAST(p_partkey * 2 AS BIGINT) AS sl,
                CAST(2 AS INT) AS nk,
                CASE WHEN p_partkey > 25 THEN 'hi' ELSE 'lo' END AS w,
                CASE WHEN p_partkey > 25 THEN 'hi' ELSE 'lo' END AS uc,
                p_name AS co,
                CAST(p_partkey * 10 AS BIGINT) AS um,
                CAST(1 AS INT) AS da,
                CAST(p_partkey * 2 AS BIGINT) AS cb,
                CAST(p_partkey AS VARCHAR) || '.5' AS ne,
                CAST(p_partkey * 1000 AS DOUBLE) AS np,
                list_min(list_filter(range(p_partkey + 1, p_partkey + 301),
                  c -> c >= 2 AND len(list_filter(
                    range(2, CAST(floor(sqrt(c)) AS BIGINT) + 1),
                    d -> d < c AND c % d = 0)) = 0)) AS pr,
                CAST(1.0 AS DOUBLE) AS sd,
                printf('%02d:%02d:%02d', p_partkey // 60, p_partkey % 60, 0) AS fd,
                CAST(p_partkey * 1000 AS BIGINT) AS tu,
                strftime(to_timestamp(p_partkey * 86400), '%Y-%m-%d') AS tf
         FROM part WHERE p_partkey <= 50"""),

    cq("q_cypher_apoc_label_stats", "2.11",
      // apoc.label.stats (apoc/label): per-label node counts — one
      // exploded aggregation
      """CALL apoc.label.stats() YIELD label, n RETURN label, n""",
      """SELECT label, n FROM (
           SELECT 'Customer' AS label, COUNT(*) AS n FROM customer
           UNION ALL SELECT 'Order', COUNT(*) FROM orders
           UNION ALL SELECT 'Part', COUNT(*) FROM part
           UNION ALL SELECT 'Supplier', COUNT(*) FROM supplier
           UNION ALL SELECT 'Nation', COUNT(*) FROM nation
           UNION ALL SELECT 'Region', COUNT(*) FROM region)"""),

    cq("q_cypher_apoc_community_density", "2.11",
      // apoc.community.density over SUPPLIES — integer counts, one division
      """CALL apoc.community.density('SUPPLIES') YIELD density RETURN density""",
      """WITH p AS (SELECT DISTINCT least('Supplier:' || l_suppkey, 'Part:' || l_partkey) AS a,
                           greatest('Supplier:' || l_suppkey, 'Part:' || l_partkey) AS b
                    FROM lineitem),
           n AS (SELECT COUNT(DISTINCT x) AS n FROM
                   (SELECT a AS x FROM p UNION SELECT b FROM p)),
           m AS (SELECT COUNT(*) AS m FROM p)
         SELECT CASE WHEN n < 2 THEN 0.0
                     ELSE CAST(m AS DOUBLE) / (n * (n - 1) / 2) END AS density
         FROM n, m"""),

    cq("q_cypher_apoc_search", "2.11",
      // apoc.search surface (apoc/search/search.go): one distributed filter
      // per call over the label shard (the reference loops all nodes)
      """CALL apoc.search.contains('Customer', 'name', '00000042')
           YIELD id, value RETURN id, value""",
      """SELECT 'Customer:' || c_custkey AS id, c_name AS value
         FROM customer WHERE c_name LIKE '%00000042%'"""),

    cq("q_cypher_apoc_search_all", "2.11",
      // nodeAll with a JSON criteria map — conjunctive property equality
      """CALL apoc.search.nodeAll('Customer', '{"mktsegment": "BUILDING"}')
           YIELD id RETURN count(*) AS n""",
      """SELECT COUNT(*) AS n FROM customer WHERE c_mktsegment = 'BUILDING'"""),

    cq("q_cypher_apoc_spatial", "2.10",
      // apoc.spatial arithmetic members (bbox/within/centroid/geojson —
      // min/max/avg only; the trig members ride the spec and the existing
      // haversine oracle in q_fn_point_distance)
      """MATCH (c:Customer) WHERE c.key <= 100
         WITH c, point({longitude: toFloat(c.key % 180 - 90),
                        latitude: toFloat(c.key % 90 - 45)}) AS p,
              point({longitude: 0.0, latitude: 0.0}) AS o
         RETURN c.key AS k,
                apoc.spatial.boundingBox([p, o])['maxLat'] AS bbmax,
                apoc.spatial.boundingBox([p, o])['minLon'] AS bbmin,
                apoc.spatial.within(p, apoc.spatial.boundingBox([p, o])) AS w,
                apoc.spatial.centroid([p, o]).y AS cy,
                apoc.spatial.toGeoJSON(p).coordinates[0] AS gx,
                apoc.spatial.contains(apoc.spatial.boundingBox([p, o]),
                                      apoc.spatial.boundingBox([o, o])) AS ct""",
      """SELECT c_custkey AS k,
                greatest(CAST(c_custkey % 90 - 45 AS DOUBLE), 0.0) AS bbmax,
                least(CAST(c_custkey % 180 - 90 AS DOUBLE), 0.0) AS bbmin,
                true AS w,
                (CAST(c_custkey % 90 - 45 AS DOUBLE) + 0.0) / 2 AS cy,
                CAST(c_custkey % 180 - 90 AS DOUBLE) AS gx,
                true AS ct
         FROM customer WHERE c_custkey <= 100"""),

    cq("q_cypher_apoc_xml", "2.10",
      // apoc.xml family (apoc/xml/xml.go): parse/canonicalize, attribute
      // and text access, //tag query, Go-style JSON conversion — all
      // string-level DuckDB replays
      """MATCH (p:Part) WHERE p.key <= 50
         WITH p, '<part id="' + toString(p.key) + '"><name>' + p.name + '</name></part>' AS x
         RETURN p.key AS k,
                apoc.xml.parse(' ' + x) AS canon,
                apoc.xml.validate(x) AS ok,
                apoc.xml.getAttribute(x, 'id') AS gid,
                apoc.xml.getText(apoc.xml.query(x, '//name')[0]) AS nm,
                apoc.xml.setAttribute(x, 'v', '2') AS sa,
                apoc.xml.toJson(x) AS tj,
                apoc.xml.escape('<' + p.name) AS esc""",
      """SELECT p_partkey AS k,
                '<part id="' || p_partkey || '"><name>' || p_name || '</name></part>' AS canon,
                true AS ok,
                CAST(p_partkey AS VARCHAR) AS gid,
                p_name AS nm,
                '<part id="' || p_partkey || '" v="2"><name>' || p_name || '</name></part>' AS sa,
                '{"attributes":{"id":"' || p_partkey
                  || '"},"children":[{"attributes":{},"name":"name","text":"'
                  || p_name || '"}],"name":"part"}' AS tj,
                '&lt;' || p_name AS esc
         FROM part WHERE p_partkey <= 50"""),

    cq("q_cypher_apoc_meta_card", "2.11",
      // apoc.meta.cardinality (meta.go:503): three distributed counts
      """CALL apoc.meta.cardinality('Customer', 'PLACED', 'Order')
           YIELD startCount, relCount, endCount
         RETURN startCount, relCount, endCount""",
      """SELECT (SELECT COUNT(*) FROM customer) AS startCount,
                (SELECT COUNT(*) FROM orders) AS relCount,
                (SELECT COUNT(*) FROM orders) AS endCount"""),

    cq("q_cypher_apoc_schema_nodes", "2.11",
      // apoc.schema.nodes (schema.go:56): label → observed property keys —
      // one grouped aggregation over the exploded property map. The list is
      // string-joined: the driver's pandas row-sort can't hash raw array
      // columns (round-1 lesson, RelationalQueries.scala:244).
      """CALL apoc.schema.nodes() YIELD label, properties
         RETURN label, apoc.text.join(properties, ',') AS properties""",
      """SELECT * FROM (VALUES
           ('Customer', 'acctbal,key,mktsegment,name'),
           ('Nation',   'acctbal,key,mktsegment,name'),
           ('Order',    'acctbal,key,mktsegment,name,orderdate,orderstatus'),
           ('Part',     'acctbal,key,mktsegment,name,size,type'),
           ('Region',   'acctbal,key,mktsegment,name'),
           ('Supplier', 'acctbal,key,mktsegment,name'))
         AS t(label, properties)"""),

    cq("q_cypher_apoc_node_rel", "2.10",
      // apoc.node/rel entity accessors (apoc/node/node.go, apoc/rel/rel.go):
      // degree rides the COUNT{} grouped-join machinery (never per-row);
      // endpoint accessors read the carried src/dst columns
      """MATCH (c:Customer)-[r:PLACED]->(o:Order) WHERE c.key <= 30
         RETURN c.key AS k, o.key AS ok,
                apoc.node.degreeOut(c, 'PLACED') AS dout,
                apoc.rel.startNode(r) AS sn,
                apoc.rel.endNode(r) AS en,
                apoc.rel.direction(r, c) AS dir,
                apoc.rel.otherNode(r, c) AS onid,
                apoc.rel.isLoop(r) AS lp,
                apoc.rel.isDirectedBetween(r, c, o) AS idb,
                apoc.rel.isType(r, 'PLACED') AS it,
                apoc.rel.weight(r, 'missing', 2.5) AS w,
                apoc.node.property(c, 'name') AS nm""",
      """SELECT c_custkey AS k, o_orderkey AS ok,
                (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = c.c_custkey) AS dout,
                'Customer:' || c_custkey AS sn,
                'Order:' || o_orderkey AS en,
                'OUTGOING' AS dir,
                'Order:' || o_orderkey AS onid,
                false AS lp, true AS idb, true AS it,
                CAST(2.5 AS DOUBLE) AS w,
                c_name AS nm
         FROM customer c JOIN orders o ON o_custkey = c_custkey
         WHERE c_custkey <= 30"""),

    cq("q_cypher_apoc_stats", "2.10",
      // apoc.stats.* list statistics (apoc/stats/stats.go): population
      // moments, [0,1]-fraction percentiles, min-max normalize, IQR
      // outlier fences — folds replayed LEFT-TO-RIGHT over the same sorted
      // list in DuckDB so double sums agree bit-for-bit (skewness/kurtosis
      // use pow() whose low bits differ across libm — spec-checked instead)
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
         WITH c.key AS k, apoc.coll.sort(collect(o.acctbal)) AS xs, count(o) AS n
         WHERE n >= 5
         RETURN k,
                apoc.stats.mean(xs) AS mn,
                apoc.stats.median(xs) AS md,
                apoc.stats.variance(xs) AS vr,
                apoc.stats.stdDev(xs) AS sd,
                apoc.stats.percentile(xs, 0.95) AS p95,
                apoc.stats.iqr(xs) AS iqr,
                apoc.stats.range(xs) AS rg,
                apoc.stats.sum(xs) AS sm,
                apoc.stats.count(xs) AS ct,
                apoc.stats.zScore(xs)[1] AS z1,
                apoc.stats.normalize(xs)[1] AS n1,
                apoc.text.join([x IN apoc.stats.histogram(xs, 4) | toString(x)], ',') AS hg,
                size(apoc.stats.outliers(xs)) AS no,
                apoc.stats.correlation(xs, xs) AS cor,
                apoc.stats.covariance(xs, xs) AS cov,
                apoc.stats.quartiles(xs)['Q2'] AS q2""",
      """WITH g AS (
           SELECT c_custkey AS k, list_sort(list(o_totalprice)) AS xs, COUNT(*) AS n
           FROM customer JOIN orders ON o_custkey = c_custkey
           GROUP BY c_custkey HAVING COUNT(*) >= 5),
         s AS (SELECT k, xs, n,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
                   (a, x) -> a + x) / n AS mn FROM g),
         v AS (SELECT *, dx, dx / n AS vr FROM (
                 SELECT *, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(xs, x -> (x - mn) * (x - mn))),
                   (a, x) -> a + x) AS dx FROM s)),
         p AS (SELECT *,
                 xs[CAST(floor(CAST(0.95 AS DOUBLE) * (n - 1)) AS INT) + 1]
                   * (1.0 - (CAST(0.95 AS DOUBLE) * (n - 1)
                        - floor(CAST(0.95 AS DOUBLE) * (n - 1))))
                 + xs[CAST(ceil(CAST(0.95 AS DOUBLE) * (n - 1)) AS INT) + 1]
                   * (CAST(0.95 AS DOUBLE) * (n - 1)
                        - floor(CAST(0.95 AS DOUBLE) * (n - 1))) AS p95,
                 xs[CAST(floor(0.25 * (n - 1)) AS INT) + 1]
                   * (1.0 - (0.25 * (n - 1) - floor(0.25 * (n - 1))))
                 + xs[CAST(ceil(0.25 * (n - 1)) AS INT) + 1]
                   * (0.25 * (n - 1) - floor(0.25 * (n - 1))) AS q1,
                 xs[CAST(floor(0.5 * (n - 1)) AS INT) + 1]
                   * (1.0 - (0.5 * (n - 1) - floor(0.5 * (n - 1))))
                 + xs[CAST(ceil(0.5 * (n - 1)) AS INT) + 1]
                   * (0.5 * (n - 1) - floor(0.5 * (n - 1))) AS q2,
                 xs[CAST(floor(0.75 * (n - 1)) AS INT) + 1]
                   * (1.0 - (0.75 * (n - 1) - floor(0.75 * (n - 1))))
                 + xs[CAST(ceil(0.75 * (n - 1)) AS INT) + 1]
                   * (0.75 * (n - 1) - floor(0.75 * (n - 1))) AS q3
               FROM v)
         SELECT k, mn, q2 AS md, vr, sqrt(vr) AS sd, p95,
                q3 - q1 AS iqr,
                xs[n] - xs[1] AS rg,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
                  (a, x) -> a + x) AS sm,
                CAST(n AS INT) AS ct,
                (xs[2] - mn) / sqrt(vr) AS z1,
                (xs[2] - xs[1]) / (xs[n] - xs[1]) AS n1,
                array_to_string(list_transform(range(0, 4), b -> CAST(len(list_filter(xs,
                  v -> least(CAST(floor((v - xs[1]) / ((xs[n] - xs[1]) / 4.0)) AS INT),
                    3) = b)) AS VARCHAR)), ',') AS hg,
                CAST(len(list_filter(xs,
                  v -> v < q1 - 1.5 * (q3 - q1) OR v > q3 + 1.5 * (q3 - q1))) AS INT) AS no,
                CASE WHEN dx = 0 THEN 0.0 ELSE dx / sqrt(dx * dx) END AS cor,
                vr AS cov,
                q2
         FROM p"""),

    cq("q_cypher_apoc_agg", "2.10",
      // round-3 apoc.agg.* tranche: composes with collect() — the reference
      // implements these over value slices (apoc/agg/agg.go)
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
         WITH c.key AS k, apoc.coll.sort(collect(o.acctbal)) AS prices, count(o) AS n
         WHERE n >= 5
         RETURN k,
                apoc.agg.median(prices) AS med,
                apoc.agg.percentile(prices, 25.0) AS p25,
                apoc.agg.stdev(prices) AS sd,
                apoc.agg.statistics(prices)['mean'] AS mean,
                apoc.agg.statistics(prices)['count'] AS cnt,
                apoc.agg.minItems(prices, 2)[1] AS min2,
                apoc.agg.maxItems(prices, 2)[1] AS max2,
                apoc.agg.nth(prices, 0) AS nth0,
                size(apoc.agg.slice(prices, 1, 3)) AS nsl,
                apoc.agg.first(prices) AS fst,
                apoc.agg.last(prices) AS lst""",
      """WITH g AS (
           SELECT c_custkey AS k, list_sort(list(o_totalprice)) AS prices, COUNT(*) AS n
           FROM customer JOIN orders ON o_custkey = c_custkey
           GROUP BY c_custkey HAVING COUNT(*) >= 5),
         s AS (SELECT k, prices AS sp, n,
                      list_sum(prices) / n AS mean FROM g)
         SELECT k,
                CASE WHEN n % 2 = 1 THEN sp[(n + 1) // 2]
                     ELSE (sp[n // 2] + sp[n // 2 + 1]) / 2.0 END AS med,
                sp[CAST(floor(0.25 * (n - 1)) AS INT) + 1]
                  * (1.0 - (0.25 * (n - 1) - floor(0.25 * (n - 1))))
                + sp[CAST(ceil(0.25 * (n - 1)) AS INT) + 1]
                  * (0.25 * (n - 1) - floor(0.25 * (n - 1))) AS p25,
                sqrt(list_sum(list_transform(sp, x -> (x - mean) * (x - mean))) / n) AS sd,
                mean,
                CAST(n AS DOUBLE) AS cnt,
                sp[2] AS min2,
                sp[CAST(n AS INT) - 1] AS max2,
                sp[1] AS nth0,
                CAST(2 AS INT) AS nsl,
                sp[1] AS fst,
                sp[CAST(n AS INT)] AS lst
         FROM s"""),

    cq("q_cypher_meta_schema", "2.11",
      // apoc.meta.schema: label + relType inventory with counts
      """CALL apoc.meta.schema() YIELD name, type, n
         RETURN name, type, n""",
      """SELECT * FROM (
           SELECT 'Customer' AS name, 'node' AS type, (SELECT COUNT(*) FROM customer) AS n
           UNION ALL SELECT 'Order', 'node', (SELECT COUNT(*) FROM orders)
           UNION ALL SELECT 'Part', 'node', (SELECT COUNT(*) FROM part)
           UNION ALL SELECT 'Supplier', 'node', (SELECT COUNT(*) FROM supplier)
           UNION ALL SELECT 'Nation', 'node', (SELECT COUNT(*) FROM nation)
           UNION ALL SELECT 'Region', 'node', (SELECT COUNT(*) FROM region)
           UNION ALL SELECT 'PLACED', 'relationship', (SELECT COUNT(*) FROM orders)
           UNION ALL SELECT 'CONTAINS', 'relationship', (SELECT COUNT(*) FROM lineitem)
           UNION ALL SELECT 'SUPPLIES', 'relationship',
             (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
           UNION ALL SELECT 'FROM', 'relationship', (SELECT COUNT(*) FROM customer)
           UNION ALL SELECT 'LOCATED_IN', 'relationship', (SELECT COUNT(*) FROM supplier)
           UNION ALL SELECT 'IN', 'relationship', (SELECT COUNT(*) FROM nation))"""),

    cq("q_cypher_apoc_scoring", "2.10",
      // apoc.scoring.* tranche: IR/statistics scoring math, every column
      // replayed in DuckDB (set similarity over part-name words)
      """MATCH (p:Part) WHERE p.key <= 100
         WITH p, split(p.name, ' ') AS ws
         RETURN p.key AS k,
                apoc.scoring.tf('red', p.name) AS tf,
                apoc.scoring.idf('red', 100, 30) AS idf,
                apoc.scoring.bm25(2.0, toFloat(size(ws)), 3.0, 1.2, 0.75) AS bm,
                apoc.scoring.jaccard(ws, ['red', 'bolt']) AS jac,
                apoc.scoring.overlap(ws, ['red', 'bolt']) AS ov,
                apoc.scoring.dice(ws, ['red', 'bolt']) AS dc,
                apoc.scoring.pageRank([0.25, 0.5], 0.5) AS pr,
                apoc.scoring.percentile(toFloat(p.key), [25.0, 50.0, 75.0]) AS pct,
                apoc.scoring.zScore(toFloat(p.key), 50.0, 10.0) AS zs,
                apoc.scoring.minMax(toFloat(p.key), 0.0, 200.0, 0.0, 1.0) AS mm,
                apoc.scoring.pareto(10.0, toFloat(p.key), 200.0, 0.5) AS par,
                apoc.scoring.existence(p.name, true) AS ex""",
      """SELECT p_partkey AS k,
                CAST(len(list_filter(ws, w -> w = 'red')) AS DOUBLE) / len(ws) AS tf,
                ln(CAST(100 AS DOUBLE) / CAST(30 AS DOUBLE)) AS idf,
                2.0 * (1.2 + 1.0) /
                  (2.0 + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(len(ws) AS DOUBLE) / 3.0))) AS bm,
                CAST(len(list_intersect(dws, ['red', 'bolt'])) AS DOUBLE)
                  / (len(dws) + 2 - len(list_intersect(dws, ['red', 'bolt']))) AS jac,
                CAST(len(list_intersect(dws, ['red', 'bolt'])) AS DOUBLE)
                  / LEAST(len(dws), 2) AS ov,
                2.0 * len(list_intersect(dws, ['red', 'bolt']))
                  / (len(dws) + 2) AS dc,
                (1.0 - 0.5) + 0.5 * (0.25 + 0.5) AS pr,
                CAST(len(list_filter([25.0, 50.0, 75.0], v -> v < p_partkey)) AS DOUBLE) / 3 AS pct,
                (CAST(p_partkey AS DOUBLE) - 50.0) / 10.0 AS zs,
                CAST(p_partkey AS DOUBLE) / 200.0 AS mm,
                CASE WHEN p_partkey <= 10 THEN 0.0
                     WHEN p_partkey >= 200 THEN 0.5
                     ELSE (CAST(p_partkey AS DOUBLE) - 10.0) / 190.0 * 0.5 END AS par,
                1.0 AS ex
         FROM (SELECT p_partkey,
                      list_filter(string_split_regex(lower(p_name), '\s+'), w -> w <> '') AS ws,
                      list_distinct(list_filter(string_split_regex(lower(p_name), '\s+'), w -> w <> '')) AS dws
               FROM part WHERE p_partkey <= 100)"""),

    // CALL-surface export → load round-trip (apoc/load, apoc/export):
    // export region nodes to JSON, re-load through apoc.load.json, count
    "q_cypher_load_export" -> GQuery(
      (s, d) => {
        Cypher.run(GraphQueries.graph(s, d),
          "CALL apoc.export.json('/tmp/graft_export/region_call', 'Region') YIELD nodes RETURN nodes")
        Cypher.run(GraphQueries.graph(s, d),
          """CALL apoc.load.json('/tmp/graft_export/region_call')
             YIELD id RETURN count(id) AS n_loaded""")
      },
      Some("SELECT CAST(COUNT(*) AS BIGINT) AS n_loaded FROM region"), "2.1"),

    cq("q_cypher_in_list", "2.2",
      """MATCH (o:Order) WHERE o.mktsegment IN ['1-URGENT', '2-HIGH']
         RETURN o.mktsegment AS pri, count(*) AS n""",
      """SELECT o_orderpriority AS pri, COUNT(*) AS n FROM orders
         WHERE o_orderpriority IN ('1-URGENT','2-HIGH') GROUP BY 1"""),

    cq("q_cypher_xor", "2.2",
      """MATCH (c:Customer)
         WHERE c.acctbal > 5000 XOR c.mktsegment = 'BUILDING'
         RETURN c.key AS c_custkey""",
      """SELECT c_custkey FROM customer
         WHERE (c_acctbal > 5000) <> (c_mktsegment = 'BUILDING')"""),

    cq("q_cypher_var_length_zero", "2.3",
      // [*0..1]: the zero-hop pair (n, n) plus each nation's region edge
      """MATCH (n:Nation)-[:IN*0..1]->(x) RETURN count(*) AS n""",
      """SELECT 2 * (SELECT COUNT(*) FROM nation) AS n"""),

    cq("q_cypher_rel_alternation", "2.3",
      // [:FROM|PLACED]: customer out-edges of either type
      """MATCH (c:Customer)-[:FROM|PLACED]->(x) RETURN count(*) AS n""",
      """SELECT (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM orders) AS n"""),

    cq("q_cypher_count_subquery", "2.9",
      """MATCH (c:Customer)
         RETURN c.key AS c_custkey, COUNT { (c)-[:PLACED]->(o:Order) } AS n_orders""",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey"""),

    cq("q_cypher_count_subquery_where", "2.9",
      // COUNT {} as a WHERE predicate (reference COUNT{…} routing,
      // executor_mutations.go:1994)
      """MATCH (c:Customer) WHERE COUNT { (c)-[:PLACED]->(o:Order) } >= 15
         RETURN c.key AS c_custkey""",
      """SELECT c_custkey FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey HAVING COUNT(*) >= 15"""),

    cq("q_cypher_collect_subquery", "2.9",
      """MATCH (n:Nation)
         RETURN n.name AS nation,
                apoc.text.join(COLLECT { MATCH (n)<-[:FROM]-(c:Customer) RETURN c.name }, ',') AS custs""",
      """SELECT n_name AS nation,
                COALESCE(array_to_string(
                  list_sort(list(c_name) FILTER (c_name IS NOT NULL)), ','), '') AS custs
         FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
         GROUP BY n_name"""),

    cq("q_cypher_exists_subquery", "2.3",
      // EXISTS {} block form with an inner WHERE
      """MATCH (c:Customer)
         WHERE EXISTS { (c)-[:PLACED]->(o:Order) WHERE o.acctbal > 300000 }
         RETURN c.key AS c_custkey""",
      """SELECT c_custkey FROM customer WHERE EXISTS
           (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)"""),

    cq("q_cypher_dynamic_prop", "1.2",
      // non-hoisted properties resolved through the string-map fallback
      """MATCH (o:Order) WHERE o.orderstatus = 'F'
         RETURN o.key AS o_orderkey, o.orderdate AS od""",
      """SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS od
         FROM orders WHERE o_orderstatus = 'F'"""),

    cq("q_cypher_dynamic_prop_num", "1.2",
      """MATCH (p:Part) WHERE toInteger(p.size) > 40
         RETURN p.key AS p_partkey, toInteger(p.size) AS psize""",
      """SELECT p_partkey, CAST(p_size AS BIGINT) AS psize
         FROM part WHERE p_size > 40"""),

    cq("q_cypher_all_shortest", "2.3",
      // allShortestPaths through the string surface — one multi-pair BFS
      """MATCH p = allShortestPaths((c:Customer {key: 102})-[*..4]->(t:Part {key: 1784}))
         RETURN apoc.text.join(nodes(p), '>') AS path, length(p) AS len""",
      """SELECT DISTINCT 'Customer:102>Order:' || o_orderkey || '>Part:1784' AS path,
                CAST(2 AS INT) AS len
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_custkey = 102 AND l_partkey = 1784"""),

    cq("q_cypher_shortest_single", "2.3",
      // shortestPath(): one deterministic path per (start, end) pair
      """MATCH p = shortestPath((c:Customer {key: 1})-[*..4]->(r:Region))
         RETURN apoc.text.join(nodes(p), '>') AS path, length(p) AS len""",
      """SELECT 'Customer:1>Nation:' || c_nationkey || '>Region:' || n_regionkey AS path,
                CAST(2 AS INT) AS len
         FROM customer JOIN nation ON n_nationkey = c_nationkey
         WHERE c_custkey = 1"""),

    cq("q_cypher_call_topk", "2.9",
      // per-group ORDER/LIMIT inside a correlated CALL {}: top-2 orders
      // per customer as one row_number window, never a per-row loop
      """MATCH (c:Customer) WHERE c.key <= 50
         CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
                RETURN o.key AS ok, o.acctbal AS tot
                ORDER BY tot DESC, ok ASC LIMIT 2 }
         RETURN c.key AS ck, ok, tot""",
      """SELECT ck, ok, tot FROM (
           SELECT c_custkey AS ck, o_orderkey AS ok, o_totalprice AS tot,
                  row_number() OVER (PARTITION BY c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM customer JOIN orders ON o_custkey = c_custkey
           WHERE c_custkey <= 50) t WHERE rn <= 2"""),

    cq("q_cypher_collect_orderby", "2.9",
      // COLLECT {} ordered by a NON-returned expression (key-struct sort)
      """MATCH (n:Nation)
         RETURN n.name AS nation,
                apoc.text.join(COLLECT {
                  MATCH (n)<-[:FROM]-(c:Customer) WHERE c.key <= 100
                  RETURN c.name ORDER BY c.key DESC }, ',') AS custs""",
      // outer COALESCE: zero-match list aggregates (and array_to_string of
      // an empty list) are NULL in DuckDB, but Cypher COLLECT {} of
      // nothing is [] → ''
      """SELECT n_name AS nation,
                COALESCE(array_to_string(list(c_name ORDER BY c_custkey DESC)
                  FILTER (c_name IS NOT NULL), ','), '') AS custs
         FROM nation LEFT JOIN customer
           ON c_nationkey = n_nationkey AND c_custkey <= 100
         GROUP BY n_name"""),

    cq("q_cypher_apoc_neighbors", "2.11",
      // apoc.neighbors CALL surface (apoc/neighbors/neighbors.go) —
      // toHop replays the reference's ≤ maxHops−1 pop loop, so maxHops=2
      // yields distance ≤ 1 from Nation:1 over ALL edge types
      """CALL apoc.neighbors.toHop('Nation:1', '', 2) YIELD node_id, depth
         RETURN depth, count(*) AS n ORDER BY depth""",
      """SELECT CAST(0 AS INT) AS depth, CAST(1 AS BIGINT) AS n
         UNION ALL
         SELECT 1,
           (SELECT COUNT(*) FROM customer WHERE c_nationkey = 1)
           + (SELECT COUNT(*) FROM supplier WHERE s_nationkey = 1)
           + 1"""),

    cq("q_cypher_apoc_algo_degree", "2.11",
      // apoc.algo.degreeCentrality (algo.go:220): undirected degree per
      // node over PLACED edges — one distributed count, no driver loop
      """CALL apoc.algo.degreeCentrality('PLACED') YIELD id, score
         RETURN id, score""",
      """SELECT 'Customer:' || o_custkey AS id, COUNT(*) AS score
         FROM orders GROUP BY o_custkey
         UNION ALL
         SELECT 'Order:' || o_orderkey, 1 FROM orders"""),

    cq("q_cypher_apoc_paths", "2.11",
      // apoc.paths traversal surface (paths.go) riding the bounded
      // distributed simple-path BFS; the oracle enumerates the 2-hop
      // Customer→Order→Part paths
      """CALL apoc.paths.withinLength('Customer:102', 'Part:1784', '', 0, 2)
           YIELD path, length
         RETURN apoc.text.join(path, '>') AS p, length""",
      """SELECT DISTINCT 'Customer:102>Order:' || o_orderkey || '>Part:1784' AS p,
                CAST(2 AS INT) AS length
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_custkey = 102 AND l_partkey = 1784"""),

    cq("q_cypher_apoc_paths_dist", "2.11",
      // apoc.paths.distance = shortest hop count (paths.go:359)
      """CALL apoc.paths.distance('Customer:102', 'Part:1784', '') YIELD value
         RETURN value""",
      "SELECT CAST(2 AS INT) AS value"),

    cq("q_cypher_apoc_allpairs", "2.11",
      // apoc.algo.allPairs (algo.go:392): label-bounded pairwise distances
      // as ONE multi-source BFS — nations meet at distance 2 through their
      // shared region
      """CALL apoc.algo.allPairs('Nation', '', 2) YIELD source, target, distance
         RETURN source, target, distance""",
      """SELECT 'Nation:' || a.n_nationkey AS source,
                'Nation:' || b.n_nationkey AS target,
                CAST(2 AS INT) AS distance
         FROM nation a JOIN nation b
           ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey"""),

    cq("q_cypher_call_proc", "2.9",
      // CALL + YIELD + WHERE through the string surface (call.go:36-56)
      """CALL db.labels() YIELD label, n_nodes WHERE n_nodes > 10
         RETURN label, n_nodes ORDER BY label""",
      """SELECT label, n_nodes FROM (
           SELECT 'Customer' AS label, COUNT(*) AS n_nodes FROM customer
           UNION ALL SELECT 'Order', COUNT(*) FROM orders
           UNION ALL SELECT 'Part', COUNT(*) FROM part
           UNION ALL SELECT 'Supplier', COUNT(*) FROM supplier
           UNION ALL SELECT 'Nation', COUNT(*) FROM nation
           UNION ALL SELECT 'Region', COUNT(*) FROM region)
         WHERE n_nodes > 10 ORDER BY label"""),

    cq("q_cypher_db_info", "2.11",
      // metadata breadth: db.info totals through CALL + YIELD
      """CALL db.info() YIELD node_count, relationship_count
         RETURN node_count, relationship_count""",
      """SELECT (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM orders)
              + (SELECT COUNT(*) FROM part) + (SELECT COUNT(*) FROM supplier)
              + (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region) AS node_count,
              (SELECT COUNT(*) FROM orders) + (SELECT COUNT(*) FROM lineitem)
              + (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
              + (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
              + (SELECT COUNT(*) FROM nation) AS relationship_count"""),

    cq("q_cypher_apoc_run", "2.11",
      // apoc.cypher.run: the engine invoked recursively on a query string
      """CALL apoc.cypher.run('MATCH (r:Region) RETURN r.name AS name') YIELD name
         RETURN name ORDER BY name""",
      """SELECT r_name AS name FROM region ORDER BY r_name"""),

    cq("q_cypher_call_proc_yield_as", "2.9",
      """CALL db.schema.visualization() YIELD src_label AS s, rel_type AS r, dst_label AS d
         RETURN s, r, d""",
      """SELECT s, r, d FROM (VALUES
           ('Customer','PLACED','Order'), ('Order','CONTAINS','Part'),
           ('Supplier','SUPPLIES','Part'), ('Customer','FROM','Nation'),
           ('Supplier','LOCATED_IN','Nation'), ('Nation','IN','Region')) t(s, r, d)"""),

    cq("q_cypher_sum_distinct", "2.4",
      // each customer key appears once per order — DISTINCT dedups exactly
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
         RETURN c.mktsegment AS segment, sum(DISTINCT c.key) AS key_sum,
                avg(DISTINCT c.key) AS key_avg""",
      """SELECT c_mktsegment AS segment,
                CAST(SUM(DISTINCT c_custkey) AS BIGINT) AS key_sum,
                CAST(AVG(DISTINCT c_custkey) AS DOUBLE) AS key_avg
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY c_mktsegment"""),

    cq("q_cypher_apoc_bitwise", "2.10",
      // full apoc.bitwise family (apoc/bitwise/bitwise.go); inputs are
      // small non-negatives so Go's arithmetic shifts = logical shifts
      """MATCH (c:Customer) WHERE c.key <= 100
         RETURN c.key AS k,
                apoc.bitwise.and(c.key, 12) AS b_and,
                apoc.bitwise.or(c.key, 5) AS b_or,
                apoc.bitwise.xor(c.key, 9) AS b_xor,
                apoc.bitwise.not(c.key) AS b_not,
                apoc.bitwise.leftShift(c.key, 3) AS b_shl,
                apoc.bitwise.rightShift(c.key, 1) AS b_shr,
                apoc.bitwise.setBit(c.key, 10) AS b_set,
                apoc.bitwise.clearBit(c.key, 2) AS b_clr,
                apoc.bitwise.toggleBit(c.key, 0) AS b_tgl,
                apoc.bitwise.testBit(c.key, 1) AS b_tst,
                apoc.bitwise.countBits(c.key) AS b_cnt,
                apoc.bitwise.reverseBits(c.key * 2) AS b_rev,
                apoc.bitwise.rotateLeft(c.key, 4) AS b_rol,
                apoc.bitwise.rotateRight(c.key * 16, 4) AS b_ror""",
      """WITH t AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
                    WHERE c_custkey <= 100)
         SELECT k, k & 12 AS b_and, k | 5 AS b_or, xor(k, 9) AS b_xor,
                ~k AS b_not, k << 3 AS b_shl, k >> 1 AS b_shr,
                k | (1 << 10) AS b_set, k & ~(1 << 2) AS b_clr,
                xor(k, 1) AS b_tgl, (k & 2) <> 0 AS b_tst,
                CAST(bit_count(k) AS BIGINT) AS b_cnt,
                list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 64)),
                  (acc, i) -> (acc << 1) | ((k * 2 >> i) & 1)) AS b_rev,
                (k << 4) | (k >> 60) AS b_rol,
                -- (k*16)<<60 is exactly 0 (low 4 bits are 0); DuckDB raises
                -- on overflowing shifts, so the zero term is dropped here
                (k * 16) >> 4 AS b_ror
         FROM t"""),

    // ---- lambda expression surface (§2.2, ref functions_eval_math.go) ----

    cq("q_cypher_list_comp", "2.2",
      // [x IN list WHERE p | e] → Catalyst filter+transform HOFs
      // (joined to a string: the driver's row-sort can't hash arrays)
      """MATCH (n:Nation)
         WITH n.key % 5 AS grp, sort(collect(n.key)) AS ks
         RETURN grp,
                apoc.text.join([x IN ks WHERE x % 2 = 0 | toString(x * 10)], ',') AS evens""",
      """SELECT CAST(n_nationkey % 5 AS BIGINT) AS grp,
                array_to_string(list_transform(
                  list_filter(list_sort(list(CAST(n_nationkey AS BIGINT))),
                              x -> x % 2 = 0),
                  x -> CAST(x * 10 AS VARCHAR)), ',') AS evens
         FROM nation GROUP BY 1"""),

    cq("q_cypher_reduce", "2.2",
      // reduce(acc = init, x IN list | step) → aggregate HOF; the sorted
      // input makes the non-commutative fold order-deterministic
      """MATCH (n:Nation)
         WITH n.key % 5 AS grp, sort(collect(n.key)) AS ks
         RETURN grp, reduce(acc = 0, x IN ks | acc * 2 + x) AS folded""",
      """SELECT CAST(n_nationkey % 5 AS BIGINT) AS grp,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_sort(list(CAST(n_nationkey AS BIGINT)))),
                  (acc, x) -> acc * 2 + x) AS folded
         FROM nation GROUP BY 1"""),

    cq("q_fn_point_in_polygon", "2.10",
      // polygon() + point.contains/intersects (functions_eval_math.go:
      // 1041-1198): ray casting over a CONCAVE 5-vertex arrow, replayed
      // edge-by-edge in DuckDB with the same crossing formula (XOR chain
      // == the fold's inside-toggling; .5 vertices vs integer-grid
      // points keep the horizontal-boundary branch off this data)
      """MATCH (c:Customer) WHERE c.key <= 600
         WITH c.mktsegment AS seg,
              point({x: toFloat(c.key % 7), y: toFloat((c.key * 3) % 7)}) AS p,
              polygon([point({x: 0.5, y: 0.5}), point({x: 6.5, y: 0.5}),
                       point({x: 3.5, y: 3.5}), point({x: 6.5, y: 6.5}),
                       point({x: 0.5, y: 6.5})]) AS poly
         RETURN seg,
                sum(CASE WHEN point.contains(poly, p) THEN 1 ELSE 0 END) AS n_inside,
                sum(CASE WHEN point.intersects(p, poly) THEN 1 ELSE 0 END) AS n_hit,
                count(*) AS n""",
      """WITH pts AS (
           SELECT c_mktsegment AS seg,
                  CAST(c_custkey % 7 AS DOUBLE) AS px,
                  CAST((c_custkey * 3) % 7 AS DOUBLE) AS py
           FROM customer WHERE c_custkey <= 600),
         hit AS (
           SELECT seg,
             ((((CASE WHEN (0.5 > py) <> (6.5 > py)
                 THEN px < (0.5 - 0.5) * (py - 0.5) / (6.5 - 0.5) + 0.5
                 ELSE false END
             <> CASE WHEN (0.5 > py) <> (0.5 > py)
                 THEN px < (0.5 - 6.5) * (py - 0.5) / (0.5 - 0.5) + 6.5
                 ELSE false END)
             <> CASE WHEN (3.5 > py) <> (0.5 > py)
                 THEN px < (6.5 - 3.5) * (py - 3.5) / (0.5 - 3.5) + 3.5
                 ELSE false END)
             <> CASE WHEN (6.5 > py) <> (3.5 > py)
                 THEN px < (3.5 - 6.5) * (py - 6.5) / (3.5 - 6.5) + 6.5
                 ELSE false END)
             <> CASE WHEN (6.5 > py) <> (6.5 > py)
                 THEN px < (6.5 - 0.5) * (py - 6.5) / (6.5 - 6.5) + 0.5
                 ELSE false END) AS inside
           FROM pts)
         SELECT seg,
                CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
                CAST(sum(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
                count(*) AS n
         FROM hit GROUP BY seg"""),

    cq("q_cypher_kalman_fold", "2.10",
      // the kalman.* Cypher function family (kalman_functions.go): state
      // is a user-held JSON string threaded through reduce(); DuckDB
      // replays the exact default-config recurrence (x/lx/p fold with
      // q=0.0001, r=88, p0=30) in the same floating-point op order
      """MATCH (c:Customer) WHERE c.key <= 1000
         WITH c.key % 5 AS grp, sort(collect(c.key)) AS ks
         WITH grp, size(ks) AS n_obs, [k IN ks | toFloat(k % 97)] AS series
         WITH grp, n_obs,
              reduce(s = kalman.init(), m IN series | kalman.process(m, s).state) AS fs
         RETURN grp, round(kalman.state(fs), 9) AS est,
                round(kalman.predict(fs, 5), 9) AS pred5,
                round(kalman.rate(fs), 9) AS trend, n_obs""",
      // recursive-CTE fold (the EvolutionQueries idiom) — a list_reduce
      // struct accumulator is NOT safe: DuckDB 1.0 updates the struct
      // field by field, so later fields observe already-updated values
      """WITH RECURSIVE m AS (
           SELECT CAST(c_custkey % 5 AS BIGINT) AS grp,
                  CAST(c_custkey % 97 AS DOUBLE) AS z,
                  row_number() OVER (PARTITION BY c_custkey % 5
                                     ORDER BY c_custkey) AS i
           FROM customer WHERE c_custkey <= 1000),
         cnt AS (SELECT grp, CAST(count(*) AS INT) AS n_obs FROM m GROUP BY grp),
         r AS (
           SELECT grp, 0 AS i, CAST(0.0 AS DOUBLE) AS x,
                  CAST(0.0 AS DOUBLE) AS lx, CAST(30.0 AS DOUBLE) AS p
           FROM cnt
           UNION ALL
           SELECT r.grp, m.i,
             ((r.x + (r.x - r.lx))
              + ((r.p + CAST(0.0001 AS DOUBLE)) /
                 ((r.p + CAST(0.0001 AS DOUBLE)) + CAST(88.0 AS DOUBLE)))
                * (m.z - (r.x + (r.x - r.lx)))) AS x,
             (r.x + (r.x - r.lx)) AS lx,
             ((CAST(1.0 AS DOUBLE) -
               (r.p + CAST(0.0001 AS DOUBLE)) /
               ((r.p + CAST(0.0001 AS DOUBLE)) + CAST(88.0 AS DOUBLE)))
              * (r.p + CAST(0.0001 AS DOUBLE))) AS p
           FROM r JOIN m ON m.grp = r.grp AND m.i = r.i + 1)
         SELECT r.grp, round(r.x, 9) AS est,
                round(r.x + 5 * (r.x - r.lx), 9) AS pred5,
                round(r.x - r.lx, 9) AS trend, cnt.n_obs
         FROM r JOIN cnt ON cnt.grp = r.grp AND r.i = cnt.n_obs"""),

    cq("q_cypher_quantifiers", "2.2",
      // all/any/none/single(x IN list WHERE p) → forall/exists HOFs
      """MATCH (c:Customer) WHERE c.key <= 200
         WITH c.mktsegment AS seg, collect(c.acctbal) AS bals
         RETURN seg,
                all(x IN bals WHERE x > -1000) AS all_ok,
                any(x IN bals WHERE x > 9000) AS any_big,
                none(x IN bals WHERE x > 99999) AS none_huge,
                single(x IN bals WHERE x < -900) AS one_deep""",
      """SELECT c_mktsegment AS seg,
                len(list_filter(list(c_acctbal), x -> x > -1000)) = len(list(c_acctbal)) AS all_ok,
                len(list_filter(list(c_acctbal), x -> x > 9000)) > 0 AS any_big,
                len(list_filter(list(c_acctbal), x -> x > 99999)) = 0 AS none_huge,
                len(list_filter(list(c_acctbal), x -> x < -900)) = 1 AS one_deep
         FROM customer WHERE c_custkey <= 200 GROUP BY c_mktsegment"""),

    cq("q_cypher_map_projection", "2.2",
      // n{.prop, computed: e} + {map literal} → named structs; fields are
      // re-extracted so the driver hashes scalars, not structs
      """MATCH (c:Customer) WHERE c.key <= 50
         WITH c{.name, .mktsegment, key2: c.key + 1} AS m, {tag: 'x', v: c.key} AS lit
         RETURN m.name AS name, m.mktsegment AS seg, m.key2 AS key2,
                lit.tag AS tag, lit.v AS v""",
      """SELECT c_name AS name, c_mktsegment AS seg,
                c_custkey + 1 AS key2, 'x' AS tag, c_custkey AS v
         FROM customer WHERE c_custkey <= 50"""),

    cq("q_cypher_pattern_comp", "2.9",
      // [(n)<-[:T]-(c) WHERE p | e] — desugared to the COLLECT {} grouped
      // left join (no ORDER BY → deterministic value sort)
      """MATCH (n:Nation)
         RETURN n.name AS nation,
                apoc.text.join([(n)<-[:FROM]-(c:Customer) WHERE c.key <= 100 | c.name], ',') AS custs""",
      """SELECT n_name AS nation,
                COALESCE(array_to_string(list_sort(
                  list(c_name) FILTER (c_name IS NOT NULL)), ','), '') AS custs
         FROM nation LEFT JOIN customer
           ON c_nationkey = n_nationkey AND c_custkey <= 100
         GROUP BY n_name"""))
}
