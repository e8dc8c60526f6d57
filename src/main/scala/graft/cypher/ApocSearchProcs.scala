package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** CALL-surface registry for apoc.search.* (ref `apoc/search/search.go`).
  * Every member is the same shape in the reference: scan nodes of a label,
  * filter on a property predicate — here ONE distributed filter over the
  * label shard (predicate pushdown applies; the reference loops all nodes
  * per call). Results are (id, value) rows ordered by id — the reference
  * returns storage-ordered node lists, ours are deterministically sorted.
  */
object ApocSearchProcs {

  private def arg(args: Seq[Any], i: Int): Option[String] =
    args.lift(i).map(_.toString).filter(_.nonEmpty)
  private def argInt(args: Seq[Any], i: Int, dflt: Int): Int =
    args.lift(i).map(_.toString.toDouble.toInt).getOrElse(dflt)

  /** Property column: hoisted typed column first, string map fallback. */
  private def propCol(g: PropertyGraph, prop: String): Column =
    if (g.nodes.columns.contains(prop))
      coalesce(col(prop).cast("string"), element_at(col("properties"), prop))
    else element_at(col("properties"), prop)

  private def shard(g: PropertyGraph, label: String): DataFrame =
    if (label.isEmpty) g.nodes else g.nodesByLabel(label)

  /** (id, value) result rows for nodes passing `pred` on `prop`. */
  private def hits(g: PropertyGraph, label: String, prop: String,
      pred: Column => Column): DataFrame = {
    val v = propCol(g, prop)
    shard(g, label).filter(pred(v))
      .select(col("id"), v.as("value")).orderBy("id")
  }

  /** criteria JSON {prop: value, …} → per-property equality predicates. */
  private def criteria(s: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    graft.functions.JsonImpls.parse(s).toSeq.flatMap(n =>
      n.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq)
  }

  val procedures: Map[String, (PropertyGraph, Seq[Any]) => DataFrame] = Map(
    "apoc.search.node" -> ((g, args) => // exact property match (search.go:28)
      hits(g, args(0).toString, args(1).toString, v => v === args(2).toString)),
    "apoc.search.nodeall" -> ((g, args) => { // ALL criteria (search.go:53)
      val cs = criteria(args(1).toString)
      cs.foldLeft(shard(g, args(0).toString)) { case (df, (p, v)) =>
        df.filter(propCol(g, p) === v)
      }.select("id").orderBy("id")
    }),
    "apoc.search.nodeany" -> ((g, args) => { // ANY criterion (search.go:84)
      val cs = criteria(args(1).toString)
      val pred = cs.map { case (p, v) => propCol(g, p) === v }
        .reduceOption(_ || _).getOrElse(lit(false))
      shard(g, args(0).toString).filter(pred).select("id").orderBy("id")
    }),
    "apoc.search.nodereduced" -> ((g, args) => { // ALL + limit (search.go:111)
      val cs = criteria(args(1).toString)
      cs.foldLeft(shard(g, args(0).toString)) { case (df, (p, v)) =>
        df.filter(propCol(g, p) === v)
      }.select("id").orderBy("id").limit(argInt(args, 2, 100))
    }),
    "apoc.search.multisearchall" -> ((g, args) => { // labels CSV (search.go:124)
      val labels = args(0).toString.split(",").map(_.trim).filter(_.nonEmpty)
      val cs = criteria(args(1).toString)
      labels.map { l =>
        cs.foldLeft(shard(g, l)) { case (df, (p, v)) =>
          df.filter(propCol(g, p) === v) }.select("id")
      }.reduceOption(_.unionAll(_)).getOrElse(g.nodes.limit(0).select("id"))
        .distinct().orderBy("id")
    }),
    "apoc.search.multisearchany" -> ((g, args) => {
      val labels = args(0).toString.split(",").map(_.trim).filter(_.nonEmpty)
      val cs = criteria(args(1).toString)
      val pred = cs.map { case (p, v) => propCol(g, p) === v }
        .reduceOption(_ || _).getOrElse(lit(false))
      labels.map(l => shard(g, l).filter(pred).select("id"))
        .reduceOption(_.unionAll(_)).getOrElse(g.nodes.limit(0).select("id"))
        .distinct().orderBy("id")
    }),
    "apoc.search.parallel" -> ((g, args) => { // Spark IS the parallel scan
      val labels = args(0).toString.split(",").map(_.trim).filter(_.nonEmpty)
      labels.map(l => shard(g, l).filter(
          propCol(g, args(1).toString) === args(2).toString).select("id"))
        .reduceOption(_.unionAll(_)).getOrElse(g.nodes.limit(0).select("id"))
        .distinct().orderBy("id")
    }),
    // fullText: ANY whitespace-separated query word is a substring,
    // case-insensitive (search.go:162)
    "apoc.search.fulltext" -> ((g, args) => {
      val words = args(2).toString.toLowerCase.split("\\s+").filter(_.nonEmpty)
      hits(g, args(0).toString, args(1).toString,
        v => words.map(w => lower(v).contains(w))
          .reduceOption(_ || _).getOrElse(lit(false)))
    }),
    "apoc.search.fuzzy" -> ((g, args) => // levenshtein ≤ max (search.go:196)
      hits(g, args(0).toString, args(1).toString, v =>
        levenshtein(lower(v), lit(args(2).toString.toLowerCase)) <=
          argInt(args, 3, 2))),
    "apoc.search.regex" -> ((g, args) =>
      hits(g, args(0).toString, args(1).toString,
        v => v.rlike(args(2).toString))),
    "apoc.search.match" -> ((g, args) => // alias of regex (search.go:591)
      hits(g, args(0).toString, args(1).toString,
        v => v.rlike(args(2).toString))),
    "apoc.search.prefix" -> ((g, args) =>
      hits(g, args(0).toString, args(1).toString,
        v => v.startsWith(args(2).toString))),
    "apoc.search.suffix" -> ((g, args) =>
      hits(g, args(0).toString, args(1).toString,
        v => v.endsWith(args(2).toString))),
    "apoc.search.contains" -> ((g, args) =>
      hits(g, args(0).toString, args(1).toString,
        v => v.contains(args(2).toString))),
    "apoc.search.range" -> ((g, args) => // numeric [min, max] (search.go:345)
      hits(g, args(0).toString, args(1).toString, v =>
        v.cast("double") >= args(2).toString.toDouble &&
          v.cast("double") <= args(3).toString.toDouble)),
    "apoc.search.in" -> ((g, args) => { // CSV value list (search.go:429)
      val vs = args(2).toString.split(",").map(_.trim)
      hits(g, args(0).toString, args(1).toString, v => v.isin(vs: _*))
    }),
    "apoc.search.notin" -> ((g, args) => {
      val vs = args(2).toString.split(",").map(_.trim)
      hits(g, args(0).toString, args(1).toString,
        v => v.isNotNull && !v.isin(vs: _*))
    }),
    "apoc.search.exists" -> ((g, args) =>
      hits(g, args(0).toString, args(1).toString, v => v.isNotNull)),
    "apoc.search.missing" -> ((g, args) => { // property absent (search.go:512)
      val v = propCol(g, args(1).toString)
      shard(g, args(0).toString).filter(v.isNull)
        .select("id").orderBy("id")
    }),
    "apoc.search.null" -> ((g, args) => { // stored-but-null ≡ absent here
      // (string property maps cannot hold nulls — disclosed)
      val v = propCol(g, args(1).toString)
      shard(g, args(0).toString).filter(v.isNull)
        .select("id").orderBy("id")
    }),
    "apoc.search.notnull" -> ((g, args) =>
      hits(g, args(0).toString, args(1).toString, v => v.isNotNull)),
    // score: per-hit word-overlap count, descending (search.go:605)
    "apoc.search.score" -> ((g, args) => {
      val words = args(2).toString.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val v = propCol(g, args(1).toString)
      val score = words.map(w =>
        when(lower(v).contains(w), 1).otherwise(0)).reduceOption(_ + _)
        .getOrElse(lit(0))
      shard(g, args(0).toString).filter(v.isNotNull)
        .select(col("id"), v.as("value"), score.as("score"))
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("id"))
    }),
    "apoc.search.suggest" -> ((g, args) => // prefix values, limited (search.go:712)
      hits(g, args(0).toString, args(1).toString,
        v => v.startsWith(args(2).toString))
        .select("value").limit(argInt(args, 3, 5))),
    "apoc.search.autocomplete" -> ((g, args) =>
      hits(g, args(0).toString, args(1).toString,
        v => v.startsWith(args(2).toString))
        .select("value").limit(10)),
    "apoc.search.didyoumean" -> ((g, args) => // closest values (search.go:743)
      hits(g, args(0).toString, args(1).toString,
        v => levenshtein(lower(v), lit(args(2).toString.toLowerCase)) <= 3)
        .select("value").limit(5)),
    // index management delegates to the schema catalog (search.go:763)
    "apoc.search.index" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      graft.graph.GraphStore.currentOption.foreach(_.catalog.createIndex(
        s"ft_${args(0)}_${args(1)}", "fulltext", args(0).toString,
        Seq(args(1).toString)))
      Seq(true).toDF("created")
    }),
    "apoc.search.dropindex" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      graft.graph.GraphStore.currentOption.foreach(_.catalog.dropIndex(
        s"ft_${args(0)}_${args(1)}"))
      Seq(true).toDF("dropped")
    }),
    "apoc.search.reindex" -> ((g, args) => {
      val spark = g.nodes.sparkSession
      import spark.implicits._
      Seq(true).toDF("reindexed")
    }))

  /** apoc.search.highlight is a pure scalar (text, query, pre, post) —
    * exposed via the Planner's function surface.
    */
  def highlight(text: Column, query: String, pre: String, post: String): Column =
    regexp_replace(text, "(?i)" + java.util.regex.Pattern.quote(query),
      java.util.regex.Matcher.quoteReplacement(pre) + "$0" +
        java.util.regex.Matcher.quoteReplacement(post))
}
