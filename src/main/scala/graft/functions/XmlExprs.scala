package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable.ArrayBuffer

/** JVM replay of the reference's XML element model and operations
  * (`/root/reference/apoc/xml/xml.go`). Elements are carried as XML TEXT
  * in columns (the reference passes Go structs between its functions; a
  * columnar engine serializes between calls), parsed on demand.
  *
  * Deviations, all disclosed: attribute order is SORTED (Go ranges a map —
  * nondeterministic); escape/unescape apply replacements in dependency
  * order (`&` first / last — the reference's random map order can
  * double-escape); toJson emits real JSON via [[JsonImpls]] (the
  * reference's `fmt.Sprintf("%v")` of a Go map is not JSON and is
  * nondeterministically ordered).
  */
object XmlImpls {

  case class XElem(name: String, attrs: Seq[(String, String)], text: String,
      children: Seq[XElem])

  def parse(s: String): Option[XElem] =
    try {
      val f = DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(false)
      // entity expansion off: parser is reachable from query text
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      val doc = f.newDocumentBuilder()
        .parse(new org.xml.sax.InputSource(new java.io.StringReader(s)))
      Some(fromDom(doc.getDocumentElement))
    } catch { case _: Exception => None }

  private def fromDom(e: org.w3c.dom.Element): XElem = {
    val attrs = ArrayBuffer.empty[(String, String)]
    val am = e.getAttributes
    for (i <- 0 until am.getLength) {
      val a = am.item(i)
      attrs += ((a.getNodeName, a.getNodeValue))
    }
    var text = ""
    val children = ArrayBuffer.empty[XElem]
    val ns = e.getChildNodes
    for (i <- 0 until ns.getLength) ns.item(i) match {
      case ce: org.w3c.dom.Element => children += fromDom(ce)
      case t: org.w3c.dom.Text =>
        val tt = t.getData.trim
        if (tt.nonEmpty) text = tt // last non-empty wins (xml.go:67)
      case _ =>
    }
    XElem(e.getTagName, attrs.sortBy(_._1).toSeq, text, children.toSeq)
  }

  /** Compact single-line rendering (canonical between calls). */
  def renderCompact(e: XElem): String = {
    val sb = new StringBuilder
    def walk(x: XElem): Unit = {
      sb.append('<').append(x.name)
      x.attrs.foreach { case (k, v) => sb.append(s""" $k="$v"""") }
      if (x.children.isEmpty && x.text.isEmpty) sb.append("/>")
      else {
        sb.append('>')
        sb.append(x.text)
        x.children.foreach(walk)
        sb.append("</").append(x.name).append('>')
      }
    }
    walk(e)
    sb.toString
  }

  /** The reference's writeElement format (xml.go:95-133): 2-space indent,
    * text inline, self-closing empties, newline-terminated tags.
    */
  def renderPretty(e: XElem): String = {
    val sb = new StringBuilder
    def walk(x: XElem, depth: Int): Unit = {
      val pad = "  " * depth
      sb.append(pad).append('<').append(x.name)
      x.attrs.foreach { case (k, v) => sb.append(s""" $k="$v"""") }
      if (x.children.isEmpty && x.text.isEmpty) { sb.append("/>\n"); return }
      sb.append('>')
      if (x.text.nonEmpty) sb.append(x.text) else sb.append('\n')
      x.children.foreach(walk(_, depth + 1))
      if (x.children.nonEmpty) sb.append(pad)
      sb.append("</").append(x.name).append(">\n")
    }
    walk(e, 0)
    sb.toString
  }

  def toJsonNode(e: XElem): com.fasterxml.jackson.databind.JsonNode = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val o = m.createObjectNode()
    o.put("name", e.name)
    val ao = m.createObjectNode()
    e.attrs.foreach { case (k, v) => ao.put(k, v) }
    o.set[com.fasterxml.jackson.databind.JsonNode]("attributes", ao)
    if (e.text.nonEmpty) o.put("text", e.text)
    if (e.children.nonEmpty) {
      val arr = m.createArrayNode()
      e.children.foreach(c => arr.add(toJsonNode(c)))
      o.set[com.fasterxml.jackson.databind.JsonNode]("children", arr)
    }
    o
  }

  def fromJsonNode(n: com.fasterxml.jackson.databind.JsonNode): XElem = {
    import scala.jdk.CollectionConverters._
    XElem(
      Option(n.get("name")).map(_.asText()).getOrElse(""),
      Option(n.get("attributes")).toSeq.flatMap(a =>
        a.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq)
        .sortBy(_._1),
      Option(n.get("text")).map(_.asText()).getOrElse(""),
      Option(n.get("children")).toSeq.flatMap(c =>
        c.elements().asScala.map(fromJsonNode).toSeq))
  }

  /** //tag descendants or /tag direct children (xml.go:198). */
  def query(e: XElem, path: String): Seq[XElem] =
    if (path.startsWith("//")) {
      val tag = path.stripPrefix("//")
      val out = ArrayBuffer.empty[XElem]
      def walk(x: XElem): Unit = {
        if (x.name == tag) out += x
        x.children.foreach(walk)
      }
      walk(e)
      out.toSeq
    } else if (path.startsWith("/"))
      e.children.filter(_.name == path.stripPrefix("/"))
    else Nil

  def escape(s: String): String = // & first — dependency-ordered
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")
  def unescape(s: String): String = // &amp; last
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")

  /** The string-level op dispatcher behind the graft_xml* functions. */
  def strOp(op: String, args: Seq[String]): String = {
    def p(i: Int): Option[XElem] = parse(args(i))
    op match {
      case "parse" => p(0).map(renderCompact).getOrElse("")
      case "tostring" | "clone" => p(0).map(renderPretty).getOrElse(args(0))
      case "prettify" => p(0).map(renderPretty).getOrElse("")
      case "minify" => // trim lines, join without separators (xml.go:375)
        args(0).split("\n").map(_.trim).filter(_.nonEmpty).mkString("")
      case "tojson" | "tomap" =>
        p(0).map(e => JsonImpls.renderGo(toJsonNode(e))).getOrElse("")
      case "fromjson" => // the reference wraps escaped JSON (xml.go:410)
        JsonImpls.parse(args(0)) match {
          case Some(n) if n.has("name") => renderCompact(fromJsonNode(n))
          case _ => s"<json>${escape(args(0))}</json>"
        }
      case "frommap" =>
        JsonImpls.parse(args(0)).map(n => renderCompact(fromJsonNode(n)))
          .getOrElse("")
      case "gettext" => p(0).map(_.text).getOrElse("")
      case "settext" =>
        p(0).map(e => renderCompact(e.copy(text = args(1)))).getOrElse("")
      case "getattribute" =>
        p(0).flatMap(_.attrs.collectFirst {
          case (k, v) if k == args(1) => v }).getOrElse("")
      case "setattribute" =>
        p(0).map { e =>
          val kept = e.attrs.filterNot(_._1 == args(1)) :+ (args(1) -> args(2))
          renderCompact(e.copy(attrs = kept.sortBy(_._1)))
        }.getOrElse("")
      case "addchild" =>
        (p(0), p(1)) match {
          case (Some(parent), Some(child)) =>
            renderCompact(parent.copy(children = parent.children :+ child))
          case _ => args(0)
        }
      case "removechild" => // by child tag name (string surface)
        p(0).map { e =>
          val idx = e.children.indexWhere(_.name == args(1))
          if (idx < 0) renderCompact(e)
          else renderCompact(e.copy(children =
            e.children.patch(idx, Nil, 1)))
        }.getOrElse(args(0))
      case "create" => // (name, attrsJson, text) (xml.go:300)
        import scala.jdk.CollectionConverters._
        val attrs = args.lift(1).filter(_.nonEmpty)
          .flatMap(JsonImpls.parse).toSeq
          .flatMap(n => n.fields().asScala.map(e =>
            e.getKey -> e.getValue.asText()).toSeq)
          .sortBy(_._1)
        renderCompact(XElem(args(0), attrs, args.lift(2).getOrElse(""), Nil))
      case "namespace" => // xmlns:<prefix> attribute (xml.go:467)
        p(0).map { e =>
          val kept = e.attrs.filterNot(_._1 == s"xmlns:${args(1)}") :+
            (s"xmlns:${args(1)}" -> args(2))
          renderCompact(e.copy(attrs = kept.sortBy(_._1)))
        }.getOrElse("")
      case "getnamespace" =>
        p(0).flatMap(_.attrs.collectFirst {
          case (k, v) if k == s"xmlns:${args(1)}" => v }).getOrElse("")
      case "escape" => escape(args(0))
      case "unescape" => unescape(args(0))
      case "transform" => args(0) // XSLT placeholder in the reference too
      case other => throw new IllegalArgumentException(s"unknown xml op $other")
    }
  }
}

/** String-returning XML op: graft_xml(opLit, args…). */
case class XmlStrExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val op = vs.head.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      XmlImpls.strOp(op, vs.tail.map(_.asInstanceOf[UTF8String].toString)))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** validate(xml [, schema]) → well-formedness (the reference's schema arg
  * is unused by its placeholder too).
  */
case class XmlBoolExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    XmlImpls.parse(v.asInstanceOf[UTF8String].toString).isDefined
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** query(xml, path) → matching elements as compact XML strings. */
case class XmlArrExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val hits = XmlImpls.parse(vs(0).asInstanceOf[UTF8String].toString).toSeq
      .flatMap(e => XmlImpls.query(e, vs(1).asInstanceOf[UTF8String].toString))
    new GenericArrayData(hits.map(h =>
      UTF8String.fromString(XmlImpls.renderCompact(h))).toArray[Any])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
