package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.graph.GraphStore
import Lexer._

/** Schema DDL surface (SURVEY §2.9: `pkg/cypher/schema.go:19` DDL parse,
  * `executor_show.go` SHOW):
  *
  *   CREATE [FULLTEXT|VECTOR|RANGE|TEXT] INDEX <name> FOR (n:Label) ON (n.p[, n.q…])
  *   CREATE CONSTRAINT <name> FOR (n:Label) REQUIRE n.p IS UNIQUE
  *   DROP INDEX <name> | DROP CONSTRAINT <name>
  *   SHOW INDEXES | SHOW CONSTRAINTS
  *
  * Token-based (no string routing); returns Some(df) when the statement is
  * DDL, None otherwise so callers can fall through to the query executor.
  */
object CypherDdl {

  def tryExecute(store: GraphStore, query: String): Option[DataFrame] = {
    val toks = Lexer.tokenize(query)
    def word(i: Int): String = toks.lift(i) match {
      case Some(Kw(t)) => t
      case Some(Ident(t)) => t.toUpperCase
      case _ => ""
    }
    val spark = store.snapshot.nodes.sparkSession
    (word(0), word(1)) match {
      case ("SHOW", "INDEXES") => Some(showIndexes(spark, store))
      case ("SHOW", "CONSTRAINTS") => Some(showConstraints(spark, store))
      case ("SHOW", "PROCEDURES") => Some(ShowCatalog.proceduresDf(spark))
      case ("SHOW", "FUNCTIONS") => Some(ShowCatalog.functionsDf(spark))
      case ("DROP", "INDEX") =>
        store.catalog.dropIndex(identAt(toks, 2)); Some(emptyOk(spark))
      case ("DROP", "CONSTRAINT") =>
        store.catalog.dropConstraint(identAt(toks, 2)); Some(emptyOk(spark))
      case ("CREATE", "INDEX") => Some(createIndex(spark, store, toks, 2, "RANGE"))
      case ("CREATE", k @ ("FULLTEXT" | "VECTOR" | "RANGE" | "TEXT")) if word(2) == "INDEX" =>
        Some(createIndex(spark, store, toks, 3, k))
      case ("CREATE", "CONSTRAINT") => Some(createConstraint(spark, store, toks))
      case _ => None
    }
  }

  private def identAt(toks: Vector[Tok], i: Int): String = toks.lift(i) match {
    case Some(Ident(t)) => t
    case Some(k: Kw) => k.orig
    case other => sys.error(s"expected a name, got ${other.map(_.text).getOrElse("<eof>")}")
  }

  /** Cursor-based tail parse: <name> FOR (v:Label) ON|REQUIRE … */
  private final class Cur(toks: Vector[Tok], var i: Int) {
    def peek: Tok = toks.lift(i).getOrElse(EOF)
    def next(): Tok = { val t = peek; i += 1; t }
    def ident(): String = next() match {
      case Ident(t) => t
      case k: Kw => k.orig
      case t => sys.error(s"expected identifier, got ${t.text}")
    }
    def sym(s: String): Unit = {
      val t = next()
      require(t == Sym(s), s"expected '$s', got ${t.text}")
    }
    def isWord(s: String): Boolean = peek match {
      case Kw(t) => t == s
      case Ident(t) => t.equalsIgnoreCase(s)
      case _ => false
    }
    def word(s: String): Unit = { require(isWord(s), s"expected $s, got ${peek.text}"); i += 1 }
  }

  /** (v:Label) → label; then props `(v.p[, v.q]*)` share the parse. */
  private def labelPattern(c: Cur): String = {
    c.sym("("); c.ident(); c.sym(":")
    val label = c.ident()
    c.sym(")")
    label
  }

  private def propList(c: Cur): Seq[String] = {
    c.sym("(")
    val props = Vector.newBuilder[String]
    def one(): Unit = { c.ident(); c.sym("."); props += c.ident() }
    one()
    while (c.peek == Sym(",")) { c.next(); one() }
    c.sym(")")
    props.result()
  }

  private def createIndex(spark: SparkSession, store: GraphStore,
      toks: Vector[Tok], from: Int, kind: String): DataFrame = {
    val c = new Cur(toks, from)
    val name = c.ident()
    c.word("FOR")
    val label = labelPattern(c)
    c.word("ON")
    if (c.isWord("EACH")) c.next()
    val props = propList(c)
    store.catalog.createIndex(name, kind, label, props)
    emptyOk(spark)
  }

  private def createConstraint(spark: SparkSession, store: GraphStore,
      toks: Vector[Tok]): DataFrame = {
    val c = new Cur(toks, 2)
    val name = c.ident()
    c.word("FOR")
    val label = labelPattern(c)
    c.word("REQUIRE")
    val props =
      if (c.peek == Sym("(")) propList(c)
      else { c.ident(); c.sym("."); Seq(c.ident()) }
    c.word("IS")
    c.word("UNIQUE")
    store.catalog.createConstraint(name, "UNIQUE", label, props)
    emptyOk(spark)
  }

  private def showIndexes(spark: SparkSession, store: GraphStore): DataFrame = {
    import spark.implicits._
    store.catalog.listIndexes
      .map(d => (d.name, d.kind, d.label, d.properties.mkString(","), "ONLINE"))
      .toDF("name", "type", "label", "properties", "state")
  }

  private def showConstraints(spark: SparkSession, store: GraphStore): DataFrame = {
    import spark.implicits._
    store.catalog.listConstraints
      .map(d => (d.name, d.kind, d.label, d.properties.mkString(",")))
      .toDF("name", "type", "label", "properties")
  }

  private def emptyOk(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("ok").toDF("status").limit(0)
  }
}
