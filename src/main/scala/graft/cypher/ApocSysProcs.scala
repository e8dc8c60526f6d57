package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphStore, PropertyGraph}

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.collection.concurrent.TrieMap

/** CALL-surface registry for the apoc system families — meta, schema,
  * warmup, log, lock, trigger, periodic, cypher, atomic (ref `apoc/meta/
  * meta.go`, `apoc/schema/schema.go`, `apoc/warmup`, `apoc/log`,
  * `apoc/lock`, `apoc/trigger/trigger.go`, `apoc/periodic/periodic.go`,
  * `apoc/cypher`, `apoc/atomic/atomic.go`).
  *
  * Store-backed members resolve their write target through
  * [[GraphStore.currentOption]] — the Spark analog of the reference's
  * package-global `Storage` variable. Registries (logs, locks, triggers,
  * periodic jobs) are JVM-local engine state, like the reference's
  * package-level maps; at cluster scale they live on the driver, which is
  * where the reference keeps them too (single coordinator).
  */
object ApocSysProcs {

  // ---- engine-state registries ------------------------------------------

  /** In-memory log ring (apoc/log): a monotonically numbered buffer — the
    * sequence number stands in for wall-clock timestamps so replays stay
    * deterministic.
    */
  object LogBuffer {
    private val seq = new AtomicLong(0)
    @volatile var level: String = "INFO"
    private val maxEntries = 10000
    val entries = new java.util.concurrent.ConcurrentLinkedDeque[(Long, String, String)]()
    def add(lvl: String, msg: String): Long = {
      val s = seq.incrementAndGet()
      entries.addLast((s, lvl, msg))
      while (entries.size > maxEntries) entries.pollFirst()
      s
    }
    def all: Seq[(Long, String, String)] = {
      import scala.jdk.CollectionConverters._
      entries.asScala.toSeq
    }
    def clear(): Unit = entries.clear()
  }

  /** Advisory lock registry (apoc/lock): single-JVM bookkeeping — the
    * reference's lock package is likewise in-process; actual write
    * isolation in this engine is the snapshot-swap first-committer-wins
    * transaction, so these are pure registry semantics.
    */
  object LockRegistry {
    val locks = TrieMap.empty[String, String] // resource -> mode
    def acquire(res: String, mode: String): Boolean =
      locks.putIfAbsent(res, mode).isEmpty || locks(res) == mode
  }

  case class Trigger(name: String, statement: String, phase: String,
      selector: String, var enabled: Boolean = true, var paused: Boolean = false)

  /** Trigger registry (apoc/trigger/trigger.go): statements fired by
    * [[CypherWrite]] after each top-level write statement.
    */
  object TriggerRegistry {
    val triggers = TrieMap.empty[String, Trigger]
    @volatile private var firing = false
    /** Run every enabled 'after' trigger; guarded against recursive firing
      * (a trigger's own writes don't re-fire triggers — the reference
      * executes trigger statements outside the trigger pipeline too).
      */
    def fireAfter(store: GraphStore): Unit = {
      if (firing || triggers.isEmpty) return
      firing = true
      try triggers.values.toSeq.sortBy(_.name).foreach { t =>
        if (t.enabled && !t.paused && t.phase != "before")
          try CypherWrite.execute(store, t.statement)
          catch { case e: Exception =>
            LogBuffer.add("ERROR", s"trigger ${t.name}: ${e.getMessage}") }
      } finally firing = false
    }
  }

  case class Job(name: String, statement: String, kind: String,
      executions: AtomicLong = new AtomicLong(0),
      cancelled: AtomicBoolean = new AtomicBoolean(false))

  /** Periodic-job registry (apoc/periodic/periodic.go). Jobs execute
    * EAGERLY exactly once at registration and remain listed until
    * cancelled — disclosed deviation: the reference spawns goroutines; a
    * deterministic engine delegates recurring scheduling to the cluster
    * scheduler and keeps the metadata surface.
    */
  object PeriodicJobs {
    val jobs = TrieMap.empty[String, Job]
    def run(store: GraphStore, name: String, statement: String, kind: String): Job = {
      val j = jobs.getOrElseUpdate(name, Job(name, statement, kind))
      try { CypherWrite.execute(store, statement); j.executions.incrementAndGet() }
      catch { case e: Exception =>
        LogBuffer.add("ERROR", s"periodic $name: ${e.getMessage}") }
      j
    }
  }

  // ---- helpers ----------------------------------------------------------

  private def sp(g: PropertyGraph): SparkSession = g.nodes.sparkSession
  private def oneRow(g: PropertyGraph, cols: (String, Any)*): DataFrame = {
    val spark = sp(g)
    import spark.implicits._
    val df = Seq(1).toDF("_one")
    cols.foldLeft(df) { case (d, (n, v)) => d.withColumn(n, lit(v)) }.drop("_one")
  }
  private def strDf(g: PropertyGraph, name: String, vs: Seq[String]): DataFrame = {
    val spark = sp(g)
    import spark.implicits._
    vs.toDF(name)
  }
  private def arg(args: Seq[Any], i: Int): Option[String] =
    args.lift(i).map(_.toString).filter(_.nonEmpty)
  private def argInt(args: Seq[Any], i: Int, dflt: Int): Int =
    args.lift(i).map(_.toString.toDouble.toInt).getOrElse(dflt)
  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def labels(g: PropertyGraph): Seq[String] =
    g.nodes.select(explode(col("labels")).as("l")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
  private def relTypes(g: PropertyGraph): Seq[String] =
    g.edges.select("rel_type").distinct().collect().map(_.getString(0)).sorted.toSeq
  private def propertyKeys(g: PropertyGraph): Seq[String] =
    g.nodes.select(explode(map_keys(col("properties"))).as("k"))
      .union(g.edges.select(explode(map_keys(col("properties"))).as("k")))
      .distinct().collect().map(_.getString(0)).sorted.toSeq

  private def store: GraphStore = GraphStore.currentStore

  val procedures: Map[String, (PropertyGraph, Seq[Any]) => DataFrame] = Map(
    // ---- apoc.meta.* catalog procedures (meta.go)
    "apoc.meta.nodelabels" -> ((g, _) => strDf(g, "label", labels(g))),
    "apoc.meta.reltypes" -> ((g, _) => strDf(g, "relType", relTypes(g))),
    "apoc.meta.propertykeys" -> ((g, _) => strDf(g, "propertyKey", propertyKeys(g))),
    "apoc.meta.data" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      Seq((labels(g), relTypes(g), propertyKeys(g)))
        .toDF("labels", "relationshipTypes", "propertyKeys")
    }),
    "apoc.meta.nodetypeproperties" -> ((g, args) =>
      g.nodesByLabel(args(0).toString)
        .select(explode(map_keys(col("properties"))).as("propertyName"))
        .distinct().orderBy("propertyName")),
    "apoc.meta.reltypeproperties" -> ((g, args) =>
      g.edgesByType(args(0).toString)
        .select(explode(map_keys(col("properties"))).as("propertyName"))
        .distinct().orderBy("propertyName")),
    "apoc.meta.constraints" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      GraphStore.currentOption.map(_.catalog.listConstraints).getOrElse(Nil)
        .map(c => (c.name, c.kind, c.label, c.properties))
        .toDF("name", "kind", "label", "properties")
    }),
    "apoc.meta.indexes" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      GraphStore.currentOption.map(_.catalog.listIndexes).getOrElse(Nil)
        .map(i => (i.name, i.kind, i.label, i.properties))
        .toDF("name", "kind", "label", "properties")
    }),
    "apoc.meta.procedures" -> ((g, _) =>
      strDf(g, "name", Planner.procedureNames)),
    "apoc.meta.functions" -> ((g, _) =>
      // the scalar surface is a compiled match, not a runtime registry —
      // enumerate the procedure names and report the scalar surface as a
      // count row via apoc.meta.stats instead (disclosed)
      strDf(g, "name", Planner.procedureNames)),
    "apoc.meta.version" -> ((g, _) =>
      oneRow(g, "version" -> org.apache.spark.SPARK_VERSION, "edition" -> "graft")),
    "apoc.meta.config" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      Seq("spark.sql.shuffle.partitions", "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled")
        .map(k => (k, spark.conf.getOption(k).getOrElse("")))
        .toDF("name", "value")
    }),
    // cardinality of (:A)-[:T]->(:B) — three distributed counts (meta.go:503)
    "apoc.meta.cardinality" -> ((g, args) => {
      val (sl, rt, el) = (args(0).toString, args(1).toString, args(2).toString)
      val es = g.edgesByType(rt)
        .join(g.nodesByLabel(sl).select(col("id").as("src")), "src")
        .join(g.nodesByLabel(el).select(col("id").as("dst")), "dst")
      oneRow(g, "startCount" -> g.nodesByLabel(sl).count(),
        "relCount" -> es.count(), "endCount" -> g.nodesByLabel(el).count())
    }),
    "apoc.meta.pattern" -> ((g, args) => {
      // '(A)-[:T]->(B)' string form of cardinality (meta.go:518)
      val m = "\\(:?([A-Za-z0-9_]*)\\)-\\[:?([A-Za-z0-9_]+)\\]->\\(:?([A-Za-z0-9_]*)\\)".r
        .findFirstMatchIn(args(0).toString)
        .getOrElse(throw new IllegalArgumentException(
          s"apoc.meta.pattern: cannot parse ${args(0)}"))
      val es = g.edgesByType(m.group(2))
      val filtered = (if (m.group(1).nonEmpty)
        es.join(g.nodesByLabel(m.group(1)).select(col("id").as("src")), "src") else es)
      val filtered2 = (if (m.group(3).nonEmpty)
        filtered.join(g.nodesByLabel(m.group(3)).select(col("id").as("dst")), "dst")
        else filtered)
      oneRow(g, "pattern" -> args(0).toString, "count" -> filtered2.count())
    }),
    "apoc.meta.analyze" -> ((g, _) => {
      val n = g.nodes.count(); val r = g.edges.count()
      oneRow(g, "nodeCount" -> n, "relCount" -> r,
        "labelCount" -> labels(g).size.toLong,
        "relTypeCount" -> relTypes(g).size.toLong,
        "propertyKeyCount" -> propertyKeys(g).size.toLong,
        "avgDegree" -> (if (n == 0) 0.0 else 2.0 * r / n))
    }),
    "apoc.meta.graphsample" -> ((g, args) =>
      g.nodes.select(col("id"), col("labels")).orderBy("id")
        .limit(argInt(args, 0, 100))),
    "apoc.meta.subgraph" -> ((g, args) => {
      val ns = g.nodesByLabel(args(0).toString).select(col("id"))
      val es = g.edges
        .join(ns.toDF("src"), "src").join(ns.toDF("dst"), "dst")
      oneRow(g, "nodes" -> ns.count(), "relationships" -> es.count())
    }),
    // schema metadata as a canonical JSON string (sorted keys) — export/
    // snapshot/toString share one shape; fromString/import/restore/validate
    // parse it back (meta.go:442-539)
    "apoc.meta.export" -> ((g, _) => metaJson(g)),
    "apoc.meta.snapshot" -> ((g, _) => metaJson(g)),
    "apoc.meta.tostring" -> ((g, _) => metaJson(g)),
    "apoc.meta.fromstring" -> ((g, args) => parseMetaJson(g, args(0).toString)),
    "apoc.meta.import" -> ((g, args) => parseMetaJson(g, args(0).toString)),
    "apoc.meta.restore" -> ((g, args) => parseMetaJson(g, args(0).toString)),
    "apoc.meta.validate" -> ((g, args) => {
      val ok = graft.functions.JsonImpls.parse(args(0).toString)
        .exists(n => n.has("labels") && n.has("relationshipTypes"))
      oneRow(g, "valid" -> ok)
    }),
    "apoc.meta.compare" -> ((g, args) => metaCompare(g, args)),
    "apoc.meta.diff" -> ((g, args) => metaCompare(g, args)),

    // ---- apoc.schema.* (schema.go) — data-derived descriptions + the
    // SchemaCatalog-backed DDL members
    "apoc.schema.labels" -> ((g, _) => strDf(g, "label", labels(g))),
    "apoc.schema.types" -> ((g, _) => strDf(g, "relType", relTypes(g))),
    "apoc.schema.properties" -> ((g, _) => strDf(g, "property", propertyKeys(g))),
    "apoc.schema.propertiesdistinct" -> ((g, args) =>
      g.nodesByLabel(args(0).toString)
        .select(explode(map_keys(col("properties"))).as("property"))
        .distinct().orderBy("property")),
    "apoc.schema.nodes" -> ((g, _) => // label → its observed property keys
      g.nodes.select(explode(col("labels")).as("label"),
          explode(map_keys(col("properties"))).as("p"))
        .groupBy("label").agg(sort_array(collect_set(col("p"))).as("properties"))
        .orderBy("label")),
    "apoc.schema.relationships" -> ((g, _) =>
      g.edges.select(col("rel_type").as("type"),
          explode(map_keys(col("properties"))).as("p"))
        .groupBy("type").agg(sort_array(collect_set(col("p"))).as("properties"))
        .orderBy("type")),
    "apoc.schema.nodeconstraints" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      GraphStore.currentOption.map(_.catalog.listConstraints).getOrElse(Nil)
        .map(c => (c.name, c.kind, c.label, c.properties))
        .toDF("name", "kind", "label", "properties")
    }),
    "apoc.schema.relationshipconstraints" -> ((g, _) =>
      strDf(g, "name", Nil)), // rel constraints: none supported (catalog is label-keyed)
    "apoc.schema.nodeindexes" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      GraphStore.currentOption.map(_.catalog.listIndexes).getOrElse(Nil)
        .map(i => (i.name, i.kind, i.label, i.properties))
        .toDF("name", "kind", "label", "properties")
    }),
    "apoc.schema.relationshipindexes" -> ((g, _) => strDf(g, "name", Nil)),
    "apoc.schema.nodeconstraintexists" -> ((g, args) => {
      val want = csv(args(1).toString)
      oneRow(g, "exists" -> GraphStore.currentOption.exists(
        _.catalog.listConstraints.exists(c =>
          c.label == args(0).toString && c.properties == want)))
    }),
    "apoc.schema.nodeindexexists" -> ((g, args) => {
      val want = csv(args(1).toString)
      oneRow(g, "exists" -> GraphStore.currentOption.exists(
        _.catalog.listIndexes.exists(i =>
          i.label == args(0).toString && i.properties == want)))
    }),
    "apoc.schema.createindex" -> ((g, args) => {
      val (l, ps) = (args(0).toString, csv(args(1).toString))
      store.catalog.createIndex(s"idx_${l}_${ps.mkString("_")}", "btree", l, ps)
      oneRow(g, "created" -> true, "label" -> l)
    }),
    "apoc.schema.dropindex" -> ((g, args) => {
      val (l, ps) = (args(0).toString, csv(args(1).toString))
      store.catalog.dropIndex(s"idx_${l}_${ps.mkString("_")}")
      oneRow(g, "dropped" -> true)
    }),
    "apoc.schema.createconstraint" -> ((g, args) => {
      val (l, ps) = (args(0).toString, csv(args(1).toString))
      val kind = arg(args, 2).getOrElse("unique")
      store.catalog.createConstraint(s"c_${l}_${ps.mkString("_")}", kind, l, ps)
      oneRow(g, "created" -> true, "kind" -> kind)
    }),
    "apoc.schema.createuniqueconstraint" -> ((g, args) => {
      val (l, ps) = (args(0).toString, csv(args(1).toString))
      store.catalog.createConstraint(s"c_${l}_${ps.mkString("_")}", "unique", l, ps)
      oneRow(g, "created" -> true, "kind" -> "unique")
    }),
    "apoc.schema.createexistsconstraint" -> ((g, args) => {
      val (l, ps) = (args(0).toString, csv(args(1).toString))
      store.catalog.createConstraint(s"c_${l}_${ps.mkString("_")}", "exists", l, ps)
      oneRow(g, "created" -> true, "kind" -> "exists")
    }),
    "apoc.schema.createnodekeyconstraint" -> ((g, args) => {
      val (l, ps) = (args(0).toString, csv(args(1).toString))
      store.catalog.createConstraint(s"c_${l}_${ps.mkString("_")}", "node_key", l, ps)
      oneRow(g, "created" -> true, "kind" -> "node_key")
    }),
    "apoc.schema.dropconstraint" -> ((g, args) => {
      val (l, ps) = (args(0).toString, csv(args(1).toString))
      store.catalog.dropConstraint(s"c_${l}_${ps.mkString("_")}")
      oneRow(g, "dropped" -> true)
    }),
    // assert(indexesJson, constraintsJson): declarative sync — create the
    // listed definitions, drop catalog entries not listed (schema.go:42)
    "apoc.schema.assert" -> ((g, args) => {
      def parse(s: String): Seq[(String, Seq[String])] =
        graft.functions.JsonImpls.parse(s).toSeq.flatMap { n =>
          import scala.jdk.CollectionConverters._
          n.fields().asScala.map(e =>
            e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq).toSeq
        }
      val wantIdx = parse(args(0).toString)
      val wantCon = parse(arg(args, 1).getOrElse("{}"))
      val cat = store.catalog
      cat.listIndexes.filterNot(i => wantIdx.contains(i.label -> i.properties))
        .foreach(i => cat.dropIndex(i.name))
      wantIdx.filterNot(w => cat.listIndexes.exists(i =>
          i.label == w._1 && i.properties == w._2))
        .foreach { case (l, ps) =>
          cat.createIndex(s"idx_${l}_${ps.mkString("_")}", "btree", l, ps) }
      cat.listConstraints.filterNot(c => wantCon.contains(c.label -> c.properties))
        .foreach(c => cat.dropConstraint(c.name))
      wantCon.filterNot(w => cat.listConstraints.exists(c =>
          c.label == w._1 && c.properties == w._2))
        .foreach { case (l, ps) =>
          cat.createConstraint(s"c_${l}_${ps.mkString("_")}", "unique", l, ps) }
      oneRow(g, "indexes" -> cat.listIndexes.size.toLong,
        "constraints" -> cat.listConstraints.size.toLong)
    }),
    "apoc.schema.info" -> ((g, _) =>
      oneRow(g, "indexes" -> GraphStore.currentOption
          .map(_.catalog.listIndexes.size.toLong).getOrElse(0L),
        "constraints" -> GraphStore.currentOption
          .map(_.catalog.listConstraints.size.toLong).getOrElse(0L),
        "labels" -> labels(g).size.toLong, "relTypes" -> relTypes(g).size.toLong)),
    "apoc.schema.stats" -> ((g, _) =>
      oneRow(g, "nodeCount" -> g.nodes.count(), "relCount" -> g.edges.count(),
        "indexCount" -> GraphStore.currentOption
          .map(_.catalog.listIndexes.size.toLong).getOrElse(0L),
        "constraintCount" -> GraphStore.currentOption
          .map(_.catalog.listConstraints.size.toLong).getOrElse(0L))),
    "apoc.schema.analyze" -> ((g, _) =>
      g.nodes.select(explode(col("labels")).as("label"))
        .groupBy("label").agg(count(lit(1)).as("nodeCount")).orderBy("label")),
    "apoc.schema.validate" -> ((g, _) =>
      oneRow(g, "valid" -> true, "violations" -> 0L)), // constraints are
      // enforced at write time (GraphStore.enforceUnique) — a committed
      // snapshot is valid by construction
    "apoc.schema.optimize" -> ((g, _) =>
      oneRow(g, "optimized" -> true, "hint" ->
        "indexes are layout hints; Catalyst pushdown covers index seeks")),
    "apoc.schema.export" -> ((g, _) => schemaJson(g)),
    "apoc.schema.snapshot" -> ((g, _) => schemaJson(g)),
    "apoc.schema.import" -> ((g, args) => {
      oneRow(g, "imported" ->
        graft.functions.JsonImpls.parse(args(0).toString).isDefined)
    }),
    "apoc.schema.restore" -> ((g, args) => {
      oneRow(g, "restored" ->
        graft.functions.JsonImpls.parse(args(0).toString).isDefined)
    }),
    "apoc.schema.compare" -> ((g, args) => {
      val spark = sp(g)
      import spark.implicits._
      def ls(s: String): Seq[String] =
        graft.functions.JsonImpls.parse(s).toSeq.flatMap { n =>
          import scala.jdk.CollectionConverters._
          Option(n.get("labels")).toSeq.flatMap(_.elements().asScala.map(_.asText()))
        }
      val (a, b) = (ls(args(0).toString), ls(args(1).toString))
      Seq((a.diff(b), b.diff(a), a.intersect(b)))
        .toDF("only1", "only2", "common")
    }),

    // ---- apoc.warmup.* — Spark-cache materialization (the reference
    // page-faults store files into memory, apoc/warmup; here warm = cached
    // DataFrames)
    "apoc.warmup.run" -> ((g, _) => {
      g.nodes.cache(); g.edges.cache()
      oneRow(g, "nodesLoaded" -> g.nodes.count(), "relsLoaded" -> g.edges.count())
    }),
    "apoc.warmup.nodes" -> ((g, _) => {
      g.nodes.cache()
      oneRow(g, "nodesLoaded" -> g.nodes.count())
    }),
    "apoc.warmup.relationships" -> ((g, _) => {
      g.edges.cache()
      oneRow(g, "relsLoaded" -> g.edges.count())
    }),
    "apoc.warmup.cache" -> ((g, _) => {
      g.nodes.cache(); g.edges.cache()
      oneRow(g, "nodesLoaded" -> g.nodes.count(), "relsLoaded" -> g.edges.count())
    }),
    "apoc.warmup.properties" -> ((g, _) => {
      g.nodes.select("properties").cache()
      oneRow(g, "propertiesLoaded" -> g.nodes.select("properties").count())
    }),
    "apoc.warmup.indexes" -> ((g, _) =>
      oneRow(g, "indexesLoaded" -> GraphStore.currentOption
        .map(_.catalog.listIndexes.size.toLong).getOrElse(0L))),
    "apoc.warmup.clear" -> ((g, _) => {
      g.nodes.unpersist(); g.edges.unpersist()
      oneRow(g, "cleared" -> true)
    }),
    "apoc.warmup.stats" -> ((g, _) =>
      oneRow(g, "nodesCached" -> (g.nodes.storageLevel.useMemory ||
          g.nodes.storageLevel.useDisk),
        "relsCached" -> (g.edges.storageLevel.useMemory ||
          g.edges.storageLevel.useDisk))),
    "apoc.warmup.status" -> ((g, _) =>
      oneRow(g, "nodesCached" -> (g.nodes.storageLevel.useMemory ||
          g.nodes.storageLevel.useDisk),
        "relsCached" -> (g.edges.storageLevel.useMemory ||
          g.edges.storageLevel.useDisk))),
    "apoc.warmup.progress" -> ((g, _) => oneRow(g, "done" -> true)),
    "apoc.warmup.optimize" -> ((g, _) => oneRow(g, "optimized" -> true)),
    "apoc.warmup.path" -> ((g, _) => {
      graft.algos.GraphXAlgos.warm(g) // pre-build the traversal contexts
      oneRow(g, "pathContextWarm" -> true)
    }),
    "apoc.warmup.subgraph" -> ((g, args) => {
      val ns = g.nodesByLabel(args(0).toString); ns.cache()
      oneRow(g, "nodesLoaded" -> ns.count())
    }),
    "apoc.warmup.schedule" -> ((g, _) => oneRow(g, "scheduled" -> false,
      "hint" -> "recurring warmup belongs to the cluster scheduler")),
    "apoc.warmup.runwithparams" -> ((g, _) => {
      g.nodes.cache(); g.edges.cache()
      oneRow(g, "nodesLoaded" -> g.nodes.count(), "relsLoaded" -> g.edges.count())
    }),

    // ---- apoc.log.* — append/query the in-memory ring
    "apoc.log.info" -> ((g, args) => logAdd(g, "INFO", args)),
    "apoc.log.debug" -> ((g, args) => logAdd(g, "DEBUG", args)),
    "apoc.log.warn" -> ((g, args) => logAdd(g, "WARN", args)),
    "apoc.log.error" -> ((g, args) => logAdd(g, "ERROR", args)),
    "apoc.log.trace" -> ((g, args) => logAdd(g, "TRACE", args)),
    "apoc.log.audit" -> ((g, args) => logAdd(g, "AUDIT", args)),
    "apoc.log.security" -> ((g, args) => logAdd(g, "SECURITY", args)),
    "apoc.log.query" -> ((g, args) => logAdd(g, "QUERY", args)),
    "apoc.log.result" -> ((g, args) => logAdd(g, "RESULT", args)),
    "apoc.log.progress" -> ((g, args) => logAdd(g, "PROGRESS", args)),
    "apoc.log.performance" -> ((g, args) => logAdd(g, "PERF", args)),
    "apoc.log.metrics" -> ((g, args) => logAdd(g, "METRICS", args)),
    "apoc.log.memory" -> ((g, _) => {
      val rt = Runtime.getRuntime
      oneRow(g, "totalMemory" -> rt.totalMemory(), "freeMemory" -> rt.freeMemory())
    }),
    "apoc.log.timer" -> ((g, args) => logAdd(g, "TIMER", args)),
    "apoc.log.custom" -> ((g, args) =>
      logDf(g, Seq((LogBuffer.add(arg(args, 0).getOrElse("CUSTOM").toUpperCase,
        arg(args, 1).getOrElse("")), arg(args, 0).getOrElse("CUSTOM").toUpperCase,
        arg(args, 1).getOrElse(""))))),
    "apoc.log.getlevel" -> ((g, _) => oneRow(g, "level" -> LogBuffer.level)),
    "apoc.log.setlevel" -> ((g, args) => {
      LogBuffer.level = args(0).toString.toUpperCase
      oneRow(g, "level" -> LogBuffer.level)
    }),
    "apoc.log.search" -> ((g, args) =>
      logDf(g, LogBuffer.all.filter(_._3.contains(args(0).toString)))),
    "apoc.log.tail" -> ((g, args) =>
      logDf(g, LogBuffer.all.takeRight(argInt(args, 0, 10)))),
    "apoc.log.stream" -> ((g, _) => logDf(g, LogBuffer.all)),
    "apoc.log.clear" -> ((g, _) => {
      val n = LogBuffer.all.size
      LogBuffer.clear()
      oneRow(g, "cleared" -> n.toLong)
    }),
    "apoc.log.stats" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      LogBuffer.all.groupBy(_._2).map { case (l, es) => (l, es.size.toLong) }
        .toSeq.sortBy(_._1).toDF("level", "n")
    }),
    "apoc.log.format" -> ((g, args) =>
      oneRow(g, "formatted" -> s"[${arg(args, 0).getOrElse("INFO")}] ${arg(args, 1).getOrElse("")}")),
    "apoc.log.rotate" -> ((g, _) => {
      val n = LogBuffer.all.size
      LogBuffer.clear()
      oneRow(g, "rotated" -> n.toLong)
    }),
    "apoc.log.tofile" -> ((g, args) => {
      val lines = LogBuffer.all.map { case (s, l, m) => s"$s\t$l\t$m" }
      java.nio.file.Files.write(java.nio.file.Paths.get(args(0).toString),
        lines.mkString("\n").getBytes("UTF-8"))
      oneRow(g, "file" -> args(0).toString, "entries" -> lines.size.toLong)
    }),

    // ---- apoc.lock.* — advisory registry semantics
    "apoc.lock.nodes" -> ((g, args) => lockAcquire(g, args, "write")),
    "apoc.lock.relationships" -> ((g, args) => lockAcquire(g, args, "write")),
    "apoc.lock.readnodes" -> ((g, args) => lockAcquire(g, args, "read")),
    "apoc.lock.readrelationships" -> ((g, args) => lockAcquire(g, args, "read")),
    "apoc.lock.all" -> ((g, _) => {
      LockRegistry.locks.put("*", "write")
      oneRow(g, "locked" -> true)
    }),
    "apoc.lock.islocked" -> ((g, args) =>
      oneRow(g, "locked" -> LockRegistry.locks.contains(args(0).toString))),
    "apoc.lock.trylock" -> ((g, args) =>
      oneRow(g, "acquired" -> LockRegistry.acquire(args(0).toString, "write"))),
    "apoc.lock.unlocknodes" -> ((g, args) => lockRelease(g, args)),
    "apoc.lock.unlockrelationships" -> ((g, args) => lockRelease(g, args)),
    "apoc.lock.unlockall" -> ((g, _) => {
      val n = LockRegistry.locks.size
      LockRegistry.locks.clear()
      oneRow(g, "released" -> n.toLong)
    }),
    "apoc.lock.unlockbatch" -> ((g, args) => lockRelease(g, args)),
    "apoc.lock.batch" -> ((g, args) => lockAcquire(g, args, "write")),
    "apoc.lock.clear" -> ((g, _) => {
      val n = LockRegistry.locks.size
      LockRegistry.locks.clear()
      oneRow(g, "released" -> n.toLong)
    }),
    "apoc.lock.stats" -> ((g, _) =>
      oneRow(g, "held" -> LockRegistry.locks.size.toLong)),
    "apoc.lock.detectdeadlock" -> ((g, _) =>
      // single-coordinator advisory registry: cycles cannot form
      oneRow(g, "deadlock" -> false)),
    "apoc.lock.islockedbatch" -> ((g, args) =>
      oneRow(g, "locked" -> csv(args(0).toString).forall(LockRegistry.locks.contains))),
    "apoc.lock.priority" -> ((g, args) => lockAcquire(g, args, "write")),
    "apoc.lock.waitfor" -> ((g, args) =>
      oneRow(g, "free" -> !LockRegistry.locks.contains(args(0).toString))),
    "apoc.lock.withlock" -> ((g, args) => {
      LockRegistry.acquire(args(0).toString, "write")
      try { CypherWrite.execute(store, args(1).toString) }
      finally LockRegistry.locks.remove(args(0).toString)
      oneRow(g, "done" -> true)
    }),
    "apoc.lock.withreadlock" -> ((g, args) => {
      LockRegistry.acquire(args(0).toString, "read")
      try { CypherWrite.execute(store, args(1).toString) }
      finally LockRegistry.locks.remove(args(0).toString)
      oneRow(g, "done" -> true)
    }),

    // ---- apoc.trigger.* — registry + after-write firing (CypherWrite)
    "apoc.trigger.add" -> ((g, args) => {
      TriggerRegistry.triggers.put(args(0).toString,
        Trigger(args(0).toString, args(1).toString, "after",
          arg(args, 2).getOrElse("")))
      oneRow(g, "name" -> args(0).toString, "installed" -> true)
    }),
    "apoc.trigger.install" -> ((g, args) => {
      // (database, name, statement) — single-catalog engine ignores the db
      TriggerRegistry.triggers.put(args(1).toString,
        Trigger(args(1).toString, args(2).toString, "after", ""))
      oneRow(g, "name" -> args(1).toString, "installed" -> true)
    }),
    "apoc.trigger.before" -> ((g, args) => {
      TriggerRegistry.triggers.put(args(0).toString,
        Trigger(args(0).toString, args(1).toString, "before", ""))
      oneRow(g, "name" -> args(0).toString, "installed" -> true)
    }),
    "apoc.trigger.after" -> ((g, args) => {
      TriggerRegistry.triggers.put(args(0).toString,
        Trigger(args(0).toString, args(1).toString, "after", ""))
      oneRow(g, "name" -> args(0).toString, "installed" -> true)
    }),
    "apoc.trigger.afterasync" -> ((g, args) => {
      TriggerRegistry.triggers.put(args(0).toString,
        Trigger(args(0).toString, args(1).toString, "after", ""))
      oneRow(g, "name" -> args(0).toString, "installed" -> true)
    }),
    "apoc.trigger.oncreate" -> ((g, args) => triggerSelector(g, args, "create")),
    "apoc.trigger.onupdate" -> ((g, args) => triggerSelector(g, args, "update")),
    "apoc.trigger.ondelete" -> ((g, args) => triggerSelector(g, args, "delete")),
    "apoc.trigger.nodebylabel" -> ((g, args) => triggerSelector(g, args, "label")),
    "apoc.trigger.relationshipbytype" -> ((g, args) => triggerSelector(g, args, "type")),
    "apoc.trigger.remove" -> ((g, args) =>
      oneRow(g, "removed" -> TriggerRegistry.triggers.remove(args(0).toString).isDefined)),
    "apoc.trigger.drop" -> ((g, args) =>
      oneRow(g, "removed" -> TriggerRegistry.triggers.remove(args(0).toString).isDefined)),
    "apoc.trigger.removeall" -> ((g, _) => {
      val n = TriggerRegistry.triggers.size
      TriggerRegistry.triggers.clear()
      oneRow(g, "removed" -> n.toLong)
    }),
    "apoc.trigger.list" -> ((g, _) => triggerList(g)),
    "apoc.trigger.show" -> ((g, _) => triggerList(g)),
    "apoc.trigger.count" -> ((g, _) =>
      oneRow(g, "count" -> TriggerRegistry.triggers.size.toLong)),
    "apoc.trigger.enable" -> ((g, args) => triggerFlag(g, args, enable = Some(true))),
    "apoc.trigger.disable" -> ((g, args) => triggerFlag(g, args, enable = Some(false))),
    "apoc.trigger.pause" -> ((g, args) => triggerFlag(g, args, pause = Some(true))),
    "apoc.trigger.resume" -> ((g, args) => triggerFlag(g, args, pause = Some(false))),
    "apoc.trigger.isenabled" -> ((g, args) =>
      oneRow(g, "enabled" -> TriggerRegistry.triggers.get(args(0).toString)
        .exists(t => t.enabled && !t.paused))),
    "apoc.trigger.export" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      TriggerRegistry.triggers.values.toSeq.sortBy(_.name)
        .map(t => (t.name, t.statement, t.phase)).toDF("name", "statement", "phase")
    }),
    "apoc.trigger.import" -> ((g, args) => {
      // JSON [{name, statement}, …]
      import scala.jdk.CollectionConverters._
      val n = graft.functions.JsonImpls.parse(args(0).toString).toSeq.flatMap {
        arr => arr.elements().asScala.map { t =>
          TriggerRegistry.triggers.put(t.get("name").asText(),
            Trigger(t.get("name").asText(), t.get("statement").asText(), "after", ""))
        }.toSeq
      }.size
      oneRow(g, "imported" -> n.toLong)
    }),
    "apoc.trigger.stats" -> ((g, _) =>
      oneRow(g, "total" -> TriggerRegistry.triggers.size.toLong,
        "enabled" -> TriggerRegistry.triggers.values.count(t =>
          t.enabled && !t.paused).toLong)),

    // apoc.periodic.iterate CALL surface (call_apoc_periodic.go): outer
    // read once, inner write in batches, through the versioned store —
    // engine = CypherWrite.periodicIterate (also behind CALL {} IN
    // TRANSACTIONS); config map or bare number for batchSize
    "apoc.periodic.iterate" -> ((g, args) => {
      val (outer, inner) = (args(0).toString, args(1).toString)
      val batch = args.lift(2) match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
          .get("batchSize").map(_.toString.toDouble.toLong).getOrElse(1000L)
        case Some(other) => other.toString.toDouble.toLong
        case None => 1000L
      }
      val (batches, total, ops) = CypherWrite.periodicIterate(store, outer, inner, batch)
      oneRow(g, "batches" -> batches, "total" -> total, "operations" -> ops)
    }),
    // ---- apoc.periodic.* remainder
    "apoc.periodic.submit" -> ((g, args) => periodicRun(g, args, "submit")),
    "apoc.periodic.repeat" -> ((g, args) => periodicRun(g, args, "repeat")),
    "apoc.periodic.rock" -> ((g, args) => periodicRun(g, args, "repeat")),
    "apoc.periodic.schedule" -> ((g, args) => periodicRun(g, args, "schedule")),
    "apoc.periodic.countdown" -> ((g, args) => periodicRun(g, args, "countdown")),
    "apoc.periodic.list" -> ((g, _) => {
      val spark = sp(g)
      import spark.implicits._
      PeriodicJobs.jobs.values.toSeq.sortBy(_.name)
        .map(j => (j.name, j.kind, j.executions.get(), j.cancelled.get()))
        .toDF("name", "kind", "executions", "cancelled")
    }),
    "apoc.periodic.cancel" -> ((g, args) => {
      val hit = PeriodicJobs.jobs.get(args(0).toString)
      hit.foreach(_.cancelled.set(true))
      oneRow(g, "cancelled" -> hit.isDefined)
    }),
    // commit(statement): re-run until a pass writes nothing (periodic.go:59)
    "apoc.periodic.commit" -> ((g, args) => {
      val s = store
      var total = 0L
      var pass = 0
      var changed = true
      while (changed && pass < 100) {
        pass += 1
        val st = CypherWrite.execute(s, args(0).toString)
        val n = st.nodesCreated + st.nodesDeleted + st.relationshipsCreated +
          st.relationshipsDeleted + st.propertiesSet
        total += n
        changed = n > 0
      }
      oneRow(g, "passes" -> pass.toLong, "operations" -> total)
    }),
    "apoc.periodic.truncate" -> ((g, _) => {
      val s = store
      val ids = s.snapshot.nodes.select("id")
      val st = s.deleteNodes(ids, detach = true)
      oneRow(g, "nodesDeleted" -> st.nodesDeleted,
        "relsDeleted" -> st.relationshipsDeleted)
    }),

    // ---- apoc.cypher.* remainder (run/periodic already registered)
    "apoc.cypher.doit" -> ((g, args) => {
      val st = CypherWrite.execute(store, args(0).toString)
      oneRow(g, "nodesCreated" -> st.nodesCreated,
        "relationshipsCreated" -> st.relationshipsCreated,
        "propertiesSet" -> st.propertiesSet,
        "nodesDeleted" -> st.nodesDeleted)
    }),
    "apoc.cypher.runmany" -> ((g, args) => {
      // ';'-separated write statements, applied in order
      val stmts = args(0).toString.split(";").map(_.trim).filter(_.nonEmpty)
      var (nc, rc) = (0L, 0L)
      stmts.foreach { q =>
        val st = CypherWrite.execute(store, q)
        nc += st.nodesCreated; rc += st.relationshipsCreated
      }
      oneRow(g, "statements" -> stmts.length.toLong,
        "nodesCreated" -> nc, "relationshipsCreated" -> rc)
    }),
    "apoc.cypher.runfirstcolumn" -> ((g, args) => {
      val df = Cypher.run(g, args(0).toString)
      df.select(col(df.columns.head).as("value"))
    }),
    "apoc.cypher.runfirstcolumnmany" -> ((g, args) => {
      val df = Cypher.run(g, args(0).toString)
      df.select(col(df.columns.head).as("value"))
    }),
    "apoc.cypher.runfirstcolumnsingle" -> ((g, args) => {
      val df = Cypher.run(g, args(0).toString)
      df.select(col(df.columns.head).as("value")).limit(1)
    }),
    "apoc.cypher.tojson" -> ((g, args) => {
      val df = Cypher.run(g, args(0).toString)
      df.select(to_json(struct(df.columns.map(col): _*)).as("json"))
    }),
    "apoc.cypher.tolist" -> ((g, args) => {
      val df = Cypher.run(g, args(0).toString)
      df.agg(collect_list(col(df.columns.head)).as("list"))
    }),
    "apoc.cypher.tomap" -> ((g, args) => {
      val df = Cypher.run(g, args(0).toString)
      require(df.columns.length >= 2, "apoc.cypher.toMap needs (key, value) columns")
      df.agg(map_from_entries(collect_list(
        struct(col(df.columns(0)).cast("string"), col(df.columns(1))))).as("map"))
    }),
    "apoc.cypher.parse" -> ((g, args) => {
      val q = Parser.parse(args(0).toString)
      oneRow(g, "parts" -> q.parts.size.toLong,
        "clauses" -> q.parts.map(_.clauses.size).sum.toLong)
    }),
    "apoc.cypher.validate" -> ((g, args) => {
      val ok = scala.util.Try(Parser.parse(args(0).toString)).isSuccess
      oneRow(g, "valid" -> ok)
    }),
    "apoc.cypher.explain" -> ((g, args) =>
      strDf(g, "operator", ExplainCypher.operators(args(0).toString))),
    "apoc.cypher.profile" -> ((g, args) =>
      ProfileCypher.profile(g, args(0).toString)),
    "apoc.cypher.runfile" -> ((g, args) => {
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(args(0).toString)), "UTF-8")
      val stmts = text.split(";").map(_.trim).filter(_.nonEmpty)
      stmts.foreach(q => CypherWrite.execute(store, q))
      oneRow(g, "statements" -> stmts.length.toLong)
    }),
    "apoc.cypher.parallel" -> ((g, args) =>
      // every query here IS distributed — parallel == run (apoc/cypher)
      Cypher.run(g, args(0).toString)),
    "apoc.cypher.mapparallel" -> ((g, _) => throw new IllegalArgumentException(
      "apoc.cypher.mapParallel takes a Go function argument — not callable " +
        "from Cypher; Spark parallelizes apoc.cypher.run natively")),

    // ---- apoc.atomic.* — read-modify-write on ONE node property inside an
    // optimistic transaction (first-committer-wins, atomic.go)
    "apoc.atomic.add" -> ((g, args) => atomicNum(g, args, (a, b) => a + b)),
    "apoc.atomic.subtract" -> ((g, args) => atomicNum(g, args, (a, b) => a - b)),
    "apoc.atomic.increment" -> ((g, args) =>
      atomicNum(g, args :+ "1", (a, b) => a + b)),
    "apoc.atomic.decrement" -> ((g, args) =>
      atomicNum(g, args :+ "1", (a, b) => a - b)),
    "apoc.atomic.concat" -> ((g, args) => {
      val s = store
      val (id, key, v) = (args(0).toString, args(1).toString, args(2).toString)
      val next = s.transaction { tx =>
        val cur = readProp(tx.snapshot, id, key).getOrElse("")
        val nv = cur + v
        tx.setNodeProperty(selectId(tx.snapshot, id), key, lit(nv))
        nv
      }
      oneRow(g, "id" -> id, "value" -> next)
    }),
    "apoc.atomic.update" -> ((g, args) => {
      val s = store
      val (id, key, v) = (args(0).toString, args(1).toString, args(2).toString)
      s.transaction { tx =>
        tx.setNodeProperty(selectId(tx.snapshot, id), key, lit(v))
      }
      oneRow(g, "id" -> id, "value" -> v)
    }),
    "apoc.atomic.compareandswap" -> ((g, args) => {
      val s = store
      val (id, key, exp, nv) =
        (args(0).toString, args(1).toString, args(2).toString, args(3).toString)
      val swapped = s.transaction { tx =>
        if (readProp(tx.snapshot, id, key).contains(exp)) {
          tx.setNodeProperty(selectId(tx.snapshot, id), key, lit(nv)); true
        } else false
      }
      oneRow(g, "swapped" -> swapped)
    }),
    // insert/remove operate on a JSON-array-valued property (list
    // properties serialize as JSON text in the string property map)
    "apoc.atomic.insert" -> ((g, args) => atomicList(g, args, insert = true)),
    "apoc.atomic.remove" -> ((g, args) => atomicList(g, args, insert = false)))

  // ---- private helpers ---------------------------------------------------

  private def metaJson(g: PropertyGraph): DataFrame =
    oneRow(g, "value" -> graft.functions.JsonImpls.parse(
      s"""{"labels":${jarr(labels(g))},"relationshipTypes":${jarr(relTypes(g))},
          "propertyKeys":${jarr(propertyKeys(g))}}""".replaceAll("\\s+", ""))
      .map(graft.functions.JsonImpls.renderGo).getOrElse("{}"))
  private def schemaJson(g: PropertyGraph): DataFrame = metaJson(g)
  private def jarr(xs: Seq[String]): String =
    xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")

  private def parseMetaJson(g: PropertyGraph, s: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val n = graft.functions.JsonImpls.parse(s)
    def ls(k: String): Seq[String] = n.flatMap(x => Option(x.get(k))).toSeq
      .flatMap(_.elements().asScala.map(_.asText()))
    val spark = sp(g)
    import spark.implicits._
    Seq((ls("labels"), ls("relationshipTypes"), ls("propertyKeys")))
      .toDF("labels", "relationshipTypes", "propertyKeys")
  }

  private def metaCompare(g: PropertyGraph, args: Seq[Any]): DataFrame = {
    import scala.jdk.CollectionConverters._
    def ls(s: String, k: String): Seq[String] =
      graft.functions.JsonImpls.parse(s).flatMap(x => Option(x.get(k))).toSeq
        .flatMap(_.elements().asScala.map(_.asText()))
    val spark = sp(g)
    import spark.implicits._
    Seq("labels", "relationshipTypes", "propertyKeys").map { k =>
      val (a, b) = (ls(args(0).toString, k), ls(args(1).toString, k))
      (k, a.diff(b), b.diff(a))
    }.toDF("section", "only1", "only2")
  }

  private def logAdd(g: PropertyGraph, lvl: String, args: Seq[Any]): DataFrame = {
    val msg = arg(args, 0).getOrElse("")
    val s = LogBuffer.add(lvl, msg)
    logDf(g, Seq((s, lvl, msg)))
  }
  private def logDf(g: PropertyGraph, es: Seq[(Long, String, String)]): DataFrame = {
    val spark = sp(g)
    import spark.implicits._
    es.toDF("seq", "level", "message")
  }

  private def lockAcquire(g: PropertyGraph, args: Seq[Any], mode: String): DataFrame = {
    val ok = csv(args(0).toString).map(LockRegistry.acquire(_, mode))
    oneRow(g, "locked" -> ok.forall(identity), "count" -> ok.size.toLong)
  }
  private def lockRelease(g: PropertyGraph, args: Seq[Any]): DataFrame = {
    val n = csv(args(0).toString).count(r => LockRegistry.locks.remove(r).isDefined)
    oneRow(g, "released" -> n.toLong)
  }

  private def triggerSelector(g: PropertyGraph, args: Seq[Any], kind: String): DataFrame = {
    val name = s"${kind}_${args(0)}"
    TriggerRegistry.triggers.put(name,
      Trigger(name, args(1).toString, "after", s"$kind:${args(0)}"))
    oneRow(g, "name" -> name, "installed" -> true)
  }
  private def triggerList(g: PropertyGraph): DataFrame = {
    val spark = sp(g)
    import spark.implicits._
    TriggerRegistry.triggers.values.toSeq.sortBy(_.name)
      .map(t => (t.name, t.statement, t.phase, t.enabled && !t.paused))
      .toDF("name", "statement", "phase", "enabled")
  }
  private def triggerFlag(g: PropertyGraph, args: Seq[Any],
      enable: Option[Boolean] = None, pause: Option[Boolean] = None): DataFrame = {
    val t = TriggerRegistry.triggers.get(args(0).toString)
    t.foreach { tr =>
      enable.foreach(tr.enabled = _)
      pause.foreach(tr.paused = _)
    }
    oneRow(g, "name" -> args(0).toString, "found" -> t.isDefined)
  }

  private def periodicRun(g: PropertyGraph, args: Seq[Any], kind: String): DataFrame = {
    val j = PeriodicJobs.run(store, args(0).toString, args(1).toString, kind)
    oneRow(g, "name" -> j.name, "kind" -> j.kind, "executions" -> j.executions.get())
  }

  private def selectId(g: PropertyGraph, id: String): DataFrame =
    g.nodes.filter(col("id") === id).select("id")
  private def readProp(g: PropertyGraph, id: String, key: String): Option[String] = {
    // hoisted properties live in their typed column; the string map is the
    // fallback for never-hoisted keys (same precedence as property reads)
    val c =
      if (g.nodes.columns.contains(key))
        coalesce(col(key).cast("string"), element_at(col("properties"), key))
      else element_at(col("properties"), key)
    val r = g.nodes.filter(col("id") === id).select(c).collect()
    r.headOption.flatMap(row => Option(row.getString(0)))
  }

  private def atomicNum(g: PropertyGraph, args: Seq[Any],
      op: (Double, Double) => Double): DataFrame = {
    val s = store
    val (id, key) = (args(0).toString, args(1).toString)
    val delta = args(2).toString.toDouble
    val next = s.transaction { tx =>
      val cur = readProp(tx.snapshot, id, key).map(_.toDouble).getOrElse(0.0)
      val nv = op(cur, delta)
      // integral results render without the trailing .0 like Go's %v
      val rendered = if (nv == math.rint(nv)) nv.toLong.toString else nv.toString
      tx.setNodeProperty(selectId(tx.snapshot, id), key, lit(rendered))
      rendered
    }
    oneRow(g, "id" -> id, "value" -> next)
  }

  private def atomicList(g: PropertyGraph, args: Seq[Any], insert: Boolean): DataFrame = {
    import com.fasterxml.jackson.databind.node.ArrayNode
    val s = store
    val (id, key) = (args(0).toString, args(1).toString)
    val pos = argInt(args, 2, 0)
    val next = s.transaction { tx =>
      val cur = readProp(tx.snapshot, id, key).getOrElse("[]")
      val arr = graft.functions.JsonImpls.parse(cur) match {
        case Some(a: ArrayNode) => a
        case _ => new com.fasterxml.jackson.databind.ObjectMapper().createArrayNode()
      }
      if (insert) {
        val v = graft.functions.JsonImpls.sparkValueToNode(
          org.apache.spark.unsafe.types.UTF8String.fromString(args(3).toString))
        arr.insert(math.min(pos, arr.size), v)
      } else if (pos >= 0 && pos < arr.size) arr.remove(pos)
      val rendered = graft.functions.JsonImpls.renderGo(arr)
      tx.setNodeProperty(selectId(tx.snapshot, id), key, lit(rendered))
      rendered
    }
    oneRow(g, "id" -> id, "value" -> next)
  }
}
