package graft

import org.apache.spark.sql.SparkSession

import graft.cypher.{Cypher, CypherWrite}
import graft.graph.{GraphStore, PropertyGraph}

/** Northwind compat fixture — the reference's own published benchmark
  * workload (`/root/reference/pkg/cypher/northwind_fastpaths_test.go:11-40`
  * seed; query family from the same file and
  * `docs/performance/benchmarks-vs-neo4j.md:49-56`), loaded through the
  * engine's OWN Cypher write surface so BASELINE comparisons share a
  * workload name with the reference's table. Oracles are VALUES-based
  * relational twins of the 48-node graph.
  */
object NorthwindFixture {

  /** The reference test's seed statements (verbatim semantics; a `key`
    * property is added per node because this engine derives deterministic
    * node ids from it — queries never read it). */
  private val seed = Seq(
    "CREATE (:Category {key: 1, categoryID: 1, categoryName: 'Beverages'})",
    "CREATE (:Category {key: 2, categoryID: 2, categoryName: 'Condiments'})",
    "CREATE (:Supplier {key: 1, supplierID: 1, companyName: 'Exotic Liquids'})",
    "CREATE (:Supplier {key: 2, supplierID: 2, companyName: 'New Orleans Cajun Delights'})",
    "MATCH (c:Category {categoryID: 1}) CREATE (p:Product {key: 1, productID: 1, productName: 'Chai', unitPrice: 18.0})-[:PART_OF]->(c)",
    "MATCH (c:Category {categoryID: 1}) CREATE (p:Product {key: 2, productID: 2, productName: 'Chang', unitPrice: 19.0})-[:PART_OF]->(c)",
    "MATCH (c:Category {categoryID: 2}) CREATE (p:Product {key: 3, productID: 3, productName: 'Aniseed Syrup', unitPrice: 10.0})-[:PART_OF]->(c)",
    "MATCH (c:Category {categoryID: 1}) CREATE (p:Product {key: 4, productID: 4, productName: 'NoOrders', unitPrice: 5.0})-[:PART_OF]->(c)",
    "MATCH (s:Supplier {supplierID: 1}) MATCH (p:Product {productID: 1}) CREATE (s)-[:SUPPLIES]->(p)",
    "MATCH (s:Supplier {supplierID: 1}) MATCH (p:Product {productID: 3}) CREATE (s)-[:SUPPLIES]->(p)",
    "MATCH (s:Supplier {supplierID: 2}) MATCH (p:Product {productID: 2}) CREATE (s)-[:SUPPLIES]->(p)",
    "CREATE (:Customer {key: 901, customerID: 'ALFKI', companyName: 'Alfreds Futterkiste'})",
    "CREATE (:Customer {key: 902, customerID: 'ANATR', companyName: 'Ana Trujillo Emparedados y helados'})",
    "MATCH (c:Customer {customerID: 'ALFKI'}) CREATE (o:Order {key: 10643, orderID: 10643})<-[:PURCHASED]-(c)",
    "MATCH (c:Customer {customerID: 'ALFKI'}) CREATE (o:Order {key: 10308, orderID: 10308})<-[:PURCHASED]-(c)",
    "MATCH (o:Order {orderID: 10643}) MATCH (p:Product {productID: 1}) CREATE (o)-[:ORDERS {quantity: 5}]->(p)",
    "MATCH (o:Order {orderID: 10643}) MATCH (p:Product {productID: 2}) CREATE (o)-[:ORDERS {quantity: 2}]->(p)",
    "MATCH (o:Order {orderID: 10308}) MATCH (p:Product {productID: 3}) CREATE (o)-[:ORDERS {quantity: 3}]->(p)")

  // one build per JVM — every q_nw_* row shares it (the reference seeds
  // once per test executor the same way)
  @volatile private var cached: Option[PropertyGraph] = None

  def graph(s: SparkSession, d: String): PropertyGraph = synchronized {
    cached.getOrElse {
      val base = GraphQueries.graph(s, d)
      val store = new GraphStore(PropertyGraph(
        base.nodes.filter("false").localCheckpoint(true),
        base.edges.filter("false").localCheckpoint(true)),
        registerGlobal = false)
      seed.foreach(CypherWrite.execute(store, _))
      // read-only handoff: compact the mutation layers' partitions
      val g = PropertyGraph(
        store.snapshot.nodes.coalesce(4).localCheckpoint(true),
        store.snapshot.edges.coalesce(4).localCheckpoint(true))
      cached = Some(g)
      g
    }
  }

  /** Relational twin of the seed, as DuckDB CTEs. */
  val tablesSql: String =
    """products(pid, pname, price, cid) AS (VALUES
         (1, 'Chai', 18.0, 1), (2, 'Chang', 19.0, 1),
         (3, 'Aniseed Syrup', 10.0, 2), (4, 'NoOrders', 5.0, 1)),
       categories(cid, cname) AS (VALUES (1, 'Beverages'), (2, 'Condiments')),
       suppliers(sid, sname) AS (VALUES
         (1, 'Exotic Liquids'), (2, 'New Orleans Cajun Delights')),
       supplies(sid, pid) AS (VALUES (1, 1), (1, 3), (2, 2)),
       customers(custid, custname) AS (VALUES
         ('ALFKI', 'Alfreds Futterkiste'),
         ('ANATR', 'Ana Trujillo Emparedados y helados')),
       orders_nw(oid, custid) AS (VALUES (10643, 'ALFKI'), (10308, 'ALFKI')),
       orderlines(oid, pid, qty) AS (VALUES
         (10643, 1, 5), (10643, 2, 2), (10308, 3, 3))"""
}

/** The reference's Northwind query family as oracle-checked registry rows
  * (northwind_fastpaths_test.go + benchmarks-vs-neo4j.md). All run through
  * the Cypher surface against the seeded store.
  */
object NorthwindQueries {
  import NorthwindFixture.{graph, tablesSql}

  private def q(cypher: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => Cypher.run(graph(s, d), cypher)

  val queries: Map[String, GQuery] = Map(
    // supplier → category through products (northwind_fastpaths_test.go:46)
    "q_nw_supplier_category" -> GQuery(
      q("""MATCH (s:Supplier)-[:SUPPLIES]->(p:Product)-[:PART_OF]->(c:Category)
           RETURN s.companyName AS supplier, c.categoryName AS category,
                  count(p) AS products
           ORDER BY products DESC"""),
      Some(s"""WITH $tablesSql
               SELECT sname AS supplier, cname AS category,
                      count(*) AS products
               FROM supplies JOIN suppliers USING (sid)
                 JOIN products USING (pid) JOIN categories USING (cid)
               GROUP BY 1, 2"""), "2.3"),

    // customer → category through orders+products (…_test.go:65)
    "q_nw_customer_category" -> GQuery(
      q("""MATCH (c:Customer)-[:PURCHASED]->(o:Order)-[:ORDERS]->(p:Product)-[:PART_OF]->(cat:Category)
           RETURN c.companyName AS customer, cat.categoryName AS category,
                  count(DISTINCT o) AS orders
           ORDER BY orders DESC LIMIT 10"""),
      Some(s"""WITH $tablesSql
               SELECT custname AS customer, cname AS category,
                      count(DISTINCT oid) AS orders
               FROM orders_nw JOIN customers USING (custid)
                 JOIN orderlines USING (oid) JOIN products USING (pid)
                 JOIN categories USING (cid)
               GROUP BY 1, 2"""), "2.3"),

    // customer → supplier through orders+products (…_test.go:80)
    "q_nw_customer_supplier" -> GQuery(
      q("""MATCH (c:Customer)-[:PURCHASED]->(o:Order)-[:ORDERS]->(p:Product)<-[:SUPPLIES]-(s:Supplier)
           RETURN c.companyName AS customer, s.companyName AS supplier,
                  count(DISTINCT o) AS orders
           ORDER BY orders DESC LIMIT 10"""),
      Some(s"""WITH $tablesSql
               SELECT custname AS customer, sname AS supplier,
                      count(DISTINCT oid) AS orders
               FROM orders_nw JOIN customers USING (custid)
                 JOIN orderlines USING (oid) JOIN supplies USING (pid)
                 JOIN suppliers USING (sid)
               GROUP BY 1, 2"""), "2.3"),

    // products per category (…_test.go:96)
    "q_nw_products_per_category" -> GQuery(
      q("""MATCH (c:Category)<-[:PART_OF]-(p:Product)
           RETURN c.categoryName AS category, count(p) AS productCount
           ORDER BY productCount DESC"""),
      Some(s"""WITH $tablesSql
               SELECT cname AS category, count(*) AS productCount
               FROM products JOIN categories USING (cid) GROUP BY 1"""), "2.4"),

    // average price per category (…_test.go:108)
    "q_nw_avg_price" -> GQuery(
      q("""MATCH (c:Category)<-[:PART_OF]-(p:Product)
           RETURN c.categoryName AS category, avg(p.unitPrice) AS avgPrice,
                  count(p) AS products
           ORDER BY avgPrice DESC"""),
      Some(s"""WITH $tablesSql
               SELECT cname AS category, CAST(avg(price) AS DOUBLE) AS avgPrice,
                      count(*) AS products
               FROM products JOIN categories USING (cid) GROUP BY 1"""), "2.4"),

    // total quantity per product (…_test.go:122)
    "q_nw_qty_per_product" -> GQuery(
      q("""MATCH (p:Product)<-[r:ORDERS]-(:Order)
           RETURN p.productName AS product, sum(r.quantity) AS totalOrdered
           ORDER BY totalOrdered DESC LIMIT 10"""),
      Some(s"""WITH $tablesSql
               SELECT pname AS product, CAST(sum(qty) AS DOUBLE) AS totalOrdered
               FROM orderlines JOIN products USING (pid) GROUP BY 1"""), "2.4"),

    // orders per customer (…_test.go:136)
    "q_nw_orders_per_customer" -> GQuery(
      q("""MATCH (c:Customer)-[:PURCHASED]->(o:Order)
           RETURN c.companyName AS customer, count(o) AS orderCount
           ORDER BY orderCount DESC"""),
      Some(s"""WITH $tablesSql
               SELECT custname AS customer, count(*) AS orderCount
               FROM orders_nw JOIN customers USING (custid) GROUP BY 1"""), "2.4"),

    // products per supplier (…_test.go:146)
    "q_nw_products_per_supplier" -> GQuery(
      q("""MATCH (s:Supplier)-[:SUPPLIES]->(p:Product)
           RETURN s.companyName AS supplier, count(p) AS productCount
           ORDER BY productCount DESC"""),
      Some(s"""WITH $tablesSql
               SELECT sname AS supplier, count(*) AS productCount
               FROM supplies JOIN suppliers USING (sid) GROUP BY 1"""), "2.4"),

    // top products by revenue (…_test.go:158; benchmarks table row 2)
    "q_nw_top_revenue" -> GQuery(
      q("""MATCH (p:Product)<-[r:ORDERS]-(:Order)
           WITH p, sum(p.unitPrice * r.quantity) AS revenue
           RETURN p.productName AS product, revenue
           ORDER BY revenue DESC LIMIT 10"""),
      Some(s"""WITH $tablesSql
               SELECT pname AS product, CAST(sum(price * qty) AS DOUBLE) AS revenue
               FROM orderlines JOIN products USING (pid) GROUP BY 1"""), "2.4"),

    // point lookup by id (benchmarks 'Find customer by ID')
    "q_nw_point_lookup" -> GQuery(
      q("""MATCH (c:Customer {customerID: 'ALFKI'})
           RETURN c.companyName AS customer"""),
      Some(s"""WITH $tablesSql
               SELECT custname AS customer FROM customers
               WHERE custid = 'ALFKI'"""), "2.1"),

    // products with no orders (benchmarks 'Products with/without orders')
    "q_nw_no_orders" -> GQuery(
      q("""MATCH (p:Product)
           WHERE NOT EXISTS { MATCH (p)<-[:ORDERS]-(:Order) }
           RETURN p.productName AS product"""),
      Some(s"""WITH $tablesSql
               SELECT pname AS product FROM products
               WHERE pid NOT IN (SELECT pid FROM orderlines)"""), "2.3"),

    // count all relationships (benchmarks 'Count all relationships')
    "q_nw_count_rels" -> GQuery(
      q("MATCH ()-[r]->() RETURN count(r) AS rels"),
      Some("""SELECT CAST(4 + 3 + 2 + 3 AS BIGINT) AS rels"""), "2.1"))
}
