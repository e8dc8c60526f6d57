package graft.cypher

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import graft.graph.{GraphStore, PropertyGraph}

/** Multi-database management surface (SURVEY §2.9 system commands;
  * reference `pkg/cypher/executor_show.go:206-330`,
  * `composite_commands.go`, `pkg/multidb/manager.go`):
  *
  *   CREATE DATABASE name [IF NOT EXISTS] · DROP DATABASE name [IF EXISTS]
  *   SHOW DATABASES · SHOW DATABASE name
  *   CREATE ALIAS a FOR DATABASE db · DROP ALIAS a ·
  *   SHOW ALIASES [FOR DATABASE db]
  *   CREATE COMPOSITE DATABASE name (ALIAS a FOR DATABASE db)+ ·
  *   DROP COMPOSITE DATABASE name · SHOW COMPOSITE DATABASES ·
  *   SHOW CONSTITUENTS FOR COMPOSITE DATABASE name ·
  *   ALTER COMPOSITE DATABASE name ADD ALIAS a FOR DATABASE db |
  *     DROP ALIAS a
  *
  * Each database is a [[GraphStore]] (optimistic-tx snapshots); aliases
  * point at databases; a composite database resolves to the UNION graph of
  * its constituents (the reference routes sub-queries per constituent; a
  * union DataFrame is the Spark-native equivalent — label/partition pruning
  * recovers per-constituent access). Result shapes mirror the reference's
  * column sets exactly.
  */
final class DatabaseCatalog(template: PropertyGraph, defaultName: String = "neo4j") {

  private def emptyStore(): GraphStore = new GraphStore(PropertyGraph(
    template.nodes.filter("false").localCheckpoint(true),
    template.edges.filter("false").localCheckpoint(true)))

  private val databases = mutable.LinkedHashMap[String, GraphStore](
    defaultName -> new GraphStore(template))
  private val aliases = mutable.LinkedHashMap.empty[String, String] // alias → db
  private val composites = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, String]]

  def store(name: String): GraphStore = synchronized {
    databases.getOrElse(resolveAlias(name),
      throw new IllegalArgumentException(s"database $name does not exist"))
  }

  private def resolveAlias(name: String): String = aliases.getOrElse(name, name)

  /** The graph a `USE name` selects: database, alias, or composite. */
  def graph(name: String): PropertyGraph = synchronized {
    composites.get(name) match {
      case Some(cs) =>
        val parts = cs.values.toSeq.map(db => databases(db).snapshot)
        require(parts.nonEmpty, s"composite $name has no constituents")
        parts.reduce((a, b) => PropertyGraph(
          a.nodes.unionByName(b.nodes), a.edges.unionByName(b.edges)))
      case None => store(name).snapshot
    }
  }

  def defaultGraph: PropertyGraph = graph(defaultName)

  def catalogView: Map[String, PropertyGraph] = synchronized {
    (databases.keys.map(n => n -> graph(n)) ++
      aliases.keys.map(a => a -> graph(a)) ++
      composites.keys.map(c => c -> graph(c))).toMap
  }

  // --- command surface ---------------------------------------------------

  private val createDb = """(?is)^\s*CREATE\s+DATABASE\s+(\w+)(\s+IF\s+NOT\s+EXISTS)?\s*$""".r
  private val dropDb = """(?is)^\s*DROP\s+DATABASE\s+(\w+)(\s+IF\s+EXISTS)?\s*$""".r
  private val showDbs = """(?is)^\s*SHOW\s+DATABASES\s*$""".r
  private val showDb = """(?is)^\s*SHOW\s+DATABASE\s+(\w+)\s*$""".r
  private val createAlias = """(?is)^\s*CREATE\s+ALIAS\s+(\w+)\s+FOR\s+DATABASE\s+(\w+)\s*$""".r
  private val dropAlias = """(?is)^\s*DROP\s+ALIAS\s+(\w+)\s*$""".r
  private val showAliases = """(?is)^\s*SHOW\s+ALIASES(?:\s+FOR\s+DATABASE\s+(\w+))?\s*$""".r
  private val aliasClause = """(?is)ALIAS\s+(\w+)\s+FOR\s+DATABASE\s+(\w+)""".r
  private val createComposite = """(?is)^\s*CREATE\s+COMPOSITE\s+DATABASE\s+(\w+)((?:\s+ALIAS\s+\w+\s+FOR\s+DATABASE\s+\w+)+)\s*$""".r
  private val dropComposite = """(?is)^\s*DROP\s+COMPOSITE\s+DATABASE\s+(\w+)\s*$""".r
  private val showComposites = """(?is)^\s*SHOW\s+COMPOSITE\s+DATABASES\s*$""".r
  private val showConstituents = """(?is)^\s*SHOW\s+CONSTITUENTS\s+FOR\s+COMPOSITE\s+DATABASE\s+(\w+)\s*$""".r
  private val alterCompositeAdd = """(?is)^\s*ALTER\s+COMPOSITE\s+DATABASE\s+(\w+)\s+ADD\s+ALIAS\s+(\w+)\s+FOR\s+DATABASE\s+(\w+)\s*$""".r
  private val alterCompositeDrop = """(?is)^\s*ALTER\s+COMPOSITE\s+DATABASE\s+(\w+)\s+DROP\s+ALIAS\s+(\w+)\s*$""".r

  /** True if [[execute]] can handle this statement. */
  def handles(command: String): Boolean = command match {
    case createDb(_, _) | dropDb(_, _) | showDbs() | showDb(_)
       | createAlias(_, _) | dropAlias(_) | showAliases(_)
       | createComposite(_, _) | dropComposite(_) | showComposites()
       | showConstituents(_) | alterCompositeAdd(_, _, _)
       | alterCompositeDrop(_, _) => true
    case _ => false
  }

  def execute(command: String): DataFrame = synchronized {
    val spark = template.nodes.sparkSession
    import spark.implicits._

    def nameDf(n: String) = Seq(n).toDF("name")

    command match {
      case createDb(name, ifNot) =>
        if (databases.contains(name)) {
          if (ifNot == null)
            throw new IllegalArgumentException(s"database $name already exists")
        } else databases(name) = emptyStore()
        nameDf(name)

      case dropDb(name, ifExists) =>
        if (!databases.contains(name)) {
          if (ifExists == null)
            throw new IllegalArgumentException(s"database $name does not exist")
        } else {
          require(name != defaultName, s"cannot drop the default database $name")
          databases.remove(name)
          aliases.filterInPlace((_, db) => db != name)
          composites.foreach { case (_, cs) => cs.filterInPlace((_, db) => db != name) }
        }
        nameDf(name)

      case showDbs() => showDatabasesDf(None)
      case showDb(name) => showDatabasesDf(Some(name))

      case createAlias(alias, db) =>
        require(databases.contains(db), s"database $db does not exist")
        require(!aliases.contains(alias), s"alias $alias already exists")
        aliases(alias) = db
        nameDf(alias)

      case dropAlias(alias) =>
        require(aliases.remove(alias).isDefined, s"alias $alias does not exist")
        nameDf(alias)

      case showAliases(forDb) =>
        aliases.toSeq
          .filter { case (_, db) => forDb == null || db == forDb }
          .map { case (a, db) => (a, db, "standard", "read-write") }
          .toDF("alias", "database", "type", "access_mode")

      case createComposite(name, clauses) =>
        require(!composites.contains(name), s"composite database $name already exists")
        val cs = mutable.LinkedHashMap.empty[String, String]
        aliasClause.findAllMatchIn(clauses).foreach { m =>
          val (a, db) = (m.group(1), m.group(2))
          require(databases.contains(db), s"database $db does not exist")
          cs(a) = db
        }
        require(cs.nonEmpty, "at least one constituent required")
        composites(name) = cs
        nameDf(name)

      case dropComposite(name) =>
        require(composites.remove(name).isDefined,
          s"composite database $name does not exist")
        nameDf(name)

      case showComposites() =>
        composites.keys.toSeq.map(n => (n, "composite", "online"))
          .toDF("name", "type", "status")

      case showConstituents(name) =>
        val cs = composites.getOrElse(name,
          throw new IllegalArgumentException(s"composite database $name does not exist"))
        cs.toSeq.map { case (a, db) => (a, db, "standard", "read-write") }
          .toDF("alias", "database", "type", "access_mode")

      case alterCompositeAdd(name, alias, db) =>
        val cs = composites.getOrElse(name,
          throw new IllegalArgumentException(s"composite database $name does not exist"))
        require(databases.contains(db), s"database $db does not exist")
        cs(alias) = db
        Seq((name, "add", alias, db))
          .toDF("composite_database", "action", "alias", "database")

      case alterCompositeDrop(name, alias) =>
        val cs = composites.getOrElse(name,
          throw new IllegalArgumentException(s"composite database $name does not exist"))
        require(cs.remove(alias).isDefined, s"alias $alias is not a constituent of $name")
        Seq((name, "drop", alias)).toDF("composite_database", "action", "alias")

      case other =>
        throw new IllegalArgumentException(s"unsupported system command: $other")
    }
  }

  /** SHOW DATABASES / SHOW DATABASE name — Neo4j-compatible 12-column shape
    * (executor_show.go:237: name, type, access, address, role, writer,
    * requestedStatus, currentStatus, statusMessage, default, home,
    * constituents).
    */
  private def showDatabasesDf(only: Option[String]): DataFrame = {
    val spark = template.nodes.sparkSession
    import spark.implicits._
    val singles = databases.keys.toSeq.map(n =>
      (n, "standard", Seq.empty[String]))
    val comps = composites.toSeq.map { case (n, cs) =>
      (n, "composite", cs.keys.toSeq) }
    (singles ++ comps)
      .filter { case (n, _, _) => only.forall(_ == n) }
      .map { case (n, tpe, constituents) =>
        (n, tpe, "read-write", "localhost:7687", "primary", true,
          "online", "online", "", n == defaultName, n == defaultName,
          constituents)
      }
      .toDF("name", "type", "access", "address", "role", "writer",
        "requestedStatus", "currentStatus", "statusMessage", "default",
        "home", "constituents")
  }

  /** USE-aware query routing over this catalog: system commands execute
    * against the catalog, everything else goes through [[Cypher.runMulti]].
    */
  def run(query: String, params: Map[String, Any] = Map.empty): DataFrame =
    if (handles(query)) execute(query)
    else Cypher.runMulti(catalogView, defaultGraph, query, params)
}
