package graft.cypher

import java.io.File
import java.net.URLClassLoader
import java.util.jar.JarFile

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StringType, StructField, StructType}

import graft.graph.PropertyGraph

/** Runtime procedure plugins — the JVM analog of the reference's `.so`
  * plugin loader (`/root/reference/pkg/nornicdb/plugins.go:1-148` +
  * `apoc/plugin/plugin.go:1-213`, behavior mirrored from
  * `plugin_e2e_test.go`): at server start a configured directory is
  * scanned for plugin artifacts, each is loaded, its functions extracted
  * by reflection, and every function registers into the CALL surface so
  * `CALL apoc.<plugin>.<fn>(...)` resolves like any built-in procedure.
  *
  * Artifact form: a `.jar` on the plugins directory (the JVM's loadable
  * unit, like Go's `.so`). The jar names its entry class in the manifest
  * (`Plugin-Class: com.example.MyPlugin`) or defaults to a root-package
  * class named `Plugin` — the counterpart of Go's exported `Plugin`
  * symbol (plugins.go:157).
  *
  * Entry-class contract (duck-typed via reflection, exactly like the
  * reference's `reflect.ValueOf(sym)` probing — no compile-time
  * dependency on this engine):
  *
  *   - `String name()` and `String version()` (plugins.go:210-218);
  *   - optional `String type()` — "function"/"apoc"/"" load as function
  *     plugins; anything else is refused (plugins.go:192-200; the
  *     reference's "heimdall" plugin type maps to [[graft.streaming]]
  *     scheduler tasks and is out of the jar-loading contract);
  *   - `java.util.Map<String, ?> functions()` — each value is either a
  *     `java.util.function.Function<Object[], Object>` handler or a
  *     `java.util.List` of `[handler, description]` (the Go shape is a
  *     struct {Handler, Description}, plugins.go:321-328).
  *
  * Naming rule (plugins.go:330-334): a function name not already
  * prefixed `apoc.` registers as `apoc.<pluginName>.<fnName>`; a
  * namespaced raw name (contains '.') ALSO registers verbatim so
  * `CALL custom.hello()` works when a plugin exports `custom.hello`.
  *
  * A plugin that fails to load is a WARNING, never a crash
  * (plugins.go:96-102 — the loop continues and counts the failure).
  *
  * Handler results map to CALL rows:
  *   - `java.util.Map`                  → one row, one column per key;
  *   - `java.util.List` of maps         → one row per element;
  *   - scalar (String/Long/Double/Bool) → one row, column `value`.
  * Handlers run driver-side on literal arguments (CALL args are already
  * driver-evaluated, Planner.planCallProc) — plugins extend the CALL
  * surface, not the per-row expression path, so nothing here touches the
  * distributed hot path.
  */
object Plugins {

  final case class PluginFunction(name: String,
      handler: Array[AnyRef] => AnyRef, description: String, category: String)

  final case class LoadedPlugin(name: String, version: String, path: String,
      functions: Seq[PluginFunction])

  final case class LoadStats(loaded: Int, failed: Int, functions: Int,
      warnings: Seq[String])

  private val loadedPlugins = TrieMap.empty[String, LoadedPlugin]
  private val pluginProcs =
    TrieMap.empty[String, (PropertyGraph, Seq[Any]) => DataFrame]

  /** The live CALL registrations contributed by plugins (consulted by
    * [[Planner]] after the built-in registry).
    */
  def procedures: collection.Map[String, (PropertyGraph, Seq[Any]) => DataFrame] =
    pluginProcs

  def listLoadedPlugins: Seq[LoadedPlugin] = loadedPlugins.values.toSeq
  def getPluginFunction(name: String): Option[PluginFunction] =
    loadedPlugins.values.flatMap(_.functions)
      .find(_.name.equalsIgnoreCase(name))

  /** Drop every plugin registration (test isolation). */
  def reset(): Unit = { loadedPlugins.clear(); pluginProcs.clear() }

  /** Scan `dir` for `*.jar` plugins and register their functions.
    * Missing/empty directory is a no-op; a bad plugin is a warning in the
    * returned stats, not an exception (plugins.go:56-148).
    */
  def loadFromDir(dir: String): LoadStats = {
    val d = new File(dir)
    if (dir.isEmpty || !d.isDirectory) return LoadStats(0, 0, 0, Nil)
    val jars = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".jar")).sortBy(_.getName)
    var ok, failed, fns = 0
    val warnings = Seq.newBuilder[String]
    jars.foreach { jar =>
      try {
        val p = loadJar(jar)
        loadedPlugins(p.name) = p
        p.functions.foreach(register)
        ok += 1; fns += p.functions.size
      } catch {
        case e: Exception =>
          failed += 1
          warnings += s"${jar.getName}: ${Option(e.getMessage).getOrElse(e.toString)}"
      }
    }
    LoadStats(ok, failed, fns, warnings.result())
  }

  private def register(fn: PluginFunction): Unit = {
    val wrapped: (PropertyGraph, Seq[Any]) => DataFrame =
      (g, args) => toDf(g.nodes.sparkSession,
        fn.handler(args.map(_.asInstanceOf[AnyRef]).toArray))
    pluginProcs(fn.name.toLowerCase) = wrapped
  }

  private def loadJar(jar: File): LoadedPlugin = {
    val entryClass = {
      val jf = new JarFile(jar)
      try {
        Option(jf.getManifest)
          .flatMap(m => Option(m.getMainAttributes.getValue("Plugin-Class")))
          .map(_.trim).filter(_.nonEmpty).getOrElse("Plugin")
      } finally jf.close()
    }
    // parent = this engine's loader so plugin classes may call back into
    // shared JDK types; the plugin's own classes stay in its loader
    val loader = new URLClassLoader(Array(jar.toURI.toURL), getClass.getClassLoader)
    val cls =
      try loader.loadClass(entryClass)
      catch {
        case _: ClassNotFoundException =>
          throw new IllegalArgumentException(
            s"no Plugin symbol ($entryClass not found)")
      }
    val inst = cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]

    def strMethod(names: String*): Option[String] =
      names.view.flatMap { n =>
        try Option(cls.getMethod(n).invoke(inst)).map(_.toString)
        catch { case _: NoSuchMethodException => None }
      }.headOption

    // type detection, plugins.go:176-201: missing/empty/"function"/"apoc"
    // load as function plugins; anything else is refused
    strMethod("type", "Type").map(_.trim.toLowerCase).foreach { t =>
      if (t.nonEmpty && t != "function" && t != "apoc")
        throw new IllegalArgumentException(s"unknown plugin type '$t'")
    }
    val name = strMethod("name", "Name").getOrElse(
      throw new IllegalArgumentException("no name() method"))
    val version = strMethod("version", "Version").getOrElse("")

    val fnMap =
      try cls.getMethod("functions").invoke(inst)
      catch {
        case _: NoSuchMethodException =>
          try cls.getMethod("Functions").invoke(inst)
          catch {
            case _: NoSuchMethodException =>
              throw new IllegalArgumentException("no functions() method")
          }
      }
    val functions = fnMap match {
      case m: java.util.Map[_, _] =>
        m.asScala.toSeq.flatMap { case (k, v) =>
          val rawName = k.toString
          val (handler, desc) = v match {
            case f: java.util.function.Function[_, _] =>
              (f.asInstanceOf[java.util.function.Function[Array[AnyRef], AnyRef]], "")
            case l: java.util.List[_] if !l.isEmpty &&
                l.get(0).isInstanceOf[java.util.function.Function[_, _]] =>
              (l.get(0).asInstanceOf[java.util.function.Function[Array[AnyRef], AnyRef]],
                if (l.size > 1) String.valueOf(l.get(1)) else "")
            case other =>
              throw new IllegalArgumentException(
                s"function $rawName: unsupported handler ${other.getClass.getName}")
          }
          val h: Array[AnyRef] => AnyRef = args => handler.apply(args)
          // apoc.<plugin>.<fn> (plugins.go:330-334), plus the verbatim
          // name when the plugin already namespaced it
          val full =
            if (rawName.startsWith("apoc.")) rawName
            else s"apoc.$name.$rawName"
          val primary = PluginFunction(full, h, desc, name)
          if (rawName.contains(".") && rawName != full)
            Seq(primary, PluginFunction(rawName, h, desc, name))
          else Seq(primary)
        }
      case other => throw new IllegalArgumentException(
        s"functions() returned ${other.getClass.getName}, expected Map")
    }
    LoadedPlugin(name, version, jar.getPath, functions)
  }

  /** Handler result → CALL rows (stringly-typed map/list columns — the
    * plugin surface mirrors the properties map's schema-free floor;
    * scalars keep their primitive type).
    */
  private[cypher] def toDf(spark: SparkSession, result: AnyRef): DataFrame = {
    def mapRows(ms: Seq[java.util.Map[_, _]]): DataFrame = {
      val cols = ms.flatMap(_.asScala.keys.map(_.toString)).distinct.sorted
      val schema = StructType(cols.map(c => StructField(c, StringType)))
      val rows = ms.map { m =>
        val lookup = m.asScala.map { case (k, v) => k.toString -> v }.toMap
        Row.fromSeq(cols.map(c =>
          lookup.get(c).filter(_ != null).map(String.valueOf).orNull))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    }
    def scalar(v: AnyRef, tpe: org.apache.spark.sql.types.DataType): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(v)), 1),
        StructType(Seq(StructField("value", tpe))))
    result match {
      case null => scalar(null, StringType)
      case m: java.util.Map[_, _] => mapRows(Seq(m))
      case l: java.util.List[_] if l.asScala.forall(_.isInstanceOf[java.util.Map[_, _]]) =>
        mapRows(l.asScala.toSeq.map(_.asInstanceOf[java.util.Map[_, _]]))
      case i: java.lang.Integer => scalar(java.lang.Long.valueOf(i.longValue), LongType)
      case i: java.lang.Long => scalar(i, LongType)
      case f: java.lang.Float => scalar(java.lang.Double.valueOf(f.doubleValue), DoubleType)
      case x: java.lang.Double => scalar(x, DoubleType)
      case b: java.lang.Boolean => scalar(b, BooleanType)
      case s => scalar(String.valueOf(s), StringType)
    }
  }
}
