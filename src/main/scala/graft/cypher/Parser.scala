package graft.cypher

import Ast._
import Lexer._

/** Recursive-descent Cypher parser (read surface + mutation headers).
  *
  * Grammar follows openCypher's shape for the clauses in SURVEY §2: MATCH /
  * OPTIONAL MATCH (with WHERE), WITH, UNWIND, RETURN (DISTINCT, ORDER BY,
  * SKIP, LIMIT), UNION [ALL], expressions with standard precedence
  * (OR < AND < NOT < comparison < additive < multiplicative < unary <
  * postfix), CASE, list literals/indexing, function calls, var-length
  * relationship patterns.
  */
final class Parser(tokens: Vector[Tok]) {
  private var pos = 0

  private def peek: Tok = tokens(pos)
  private def next(): Tok = { val t = tokens(pos); pos += 1; t }
  private def isKw(k: String): Boolean = peek match { case Kw(`k`) => true; case _ => false }
  private def isSym(s: String): Boolean = peek match { case Sym(`s`) => true; case _ => false }
  private def eatKw(k: String): Unit =
    if (isKw(k)) pos += 1 else fail(s"expected $k")
  private def eatSym(s: String): Unit =
    if (isSym(s)) pos += 1 else fail(s"expected '$s'")
  private def tryKw(k: String): Boolean = { if (isKw(k)) { pos += 1; true } else false }
  private def trySym(s: String): Boolean = { if (isSym(s)) { pos += 1; true } else false }
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"parse error at token ${peek.text}: $msg")

  // ---- entry ----------------------------------------------------------
  def parseQuery(): Query = {
    val parts = Vector.newBuilder[SingleQuery]
    val unionAll = Vector.newBuilder[Boolean]
    parts += parseSingle()
    while (tryKw("UNION")) {
      unionAll += tryKw("ALL")
      parts += parseSingle()
    }
    if (peek != EOF) fail("trailing input")
    Query(parts.result(), unionAll.result())
  }

  private def parseSingle(): SingleQuery = {
    val clauses = Vector.newBuilder[Clause]
    var done = false
    while (!done) {
      peek match {
        case Kw("MATCH") => clauses += parseMatch(optional = false)
        case Kw("OPTIONAL") =>
          next(); clauses += parseMatch(optional = true)
        case Kw("WITH") => clauses += parseWith()
        case Kw("UNWIND") => clauses += parseUnwind()
        case Kw("CREATE") => clauses += parseCreate()
        case Kw("MERGE") => clauses += parseMerge()
        case Kw("SET") => clauses += parseSetClause()
        case Kw("DELETE") => clauses += parseDelete(detach = false)
        case Kw("DETACH") => next(); clauses += parseDelete(detach = true)
        case Kw("REMOVE") => clauses += parseRemove()
        case Kw("FOREACH") => clauses += parseForeach()
        case Kw("CALL") =>
          next()
          if (trySym("{")) {
            val inner = parseSingle()
            eatSym("}")
            // CALL { … } IN TRANSACTIONS [OF n ROWS]
            var inTx: Option[Long] = None
            if (isKw("IN") && tokens.lift(pos + 1).exists(_.text.equalsIgnoreCase("TRANSACTIONS"))) {
              next(); next()
              inTx = Some(1000L)
              if (peek.text.equalsIgnoreCase("OF")) {
                next()
                peek match {
                  case NumLit(t) => next(); inTx = Some(t.toLong)
                  case _ => fail("expected a row count after OF")
                }
                if (peek.text.equalsIgnoreCase("ROWS")) next()
              }
            }
            clauses += CallSubquery(inner, inTx)
          } else clauses += parseCallProc()
        case Kw("RETURN") => clauses += parseReturn(); done = true
        case _ => done = true
      }
      if (isKw("UNION") || peek == EOF) done = true
    }
    SingleQuery(clauses.result())
  }

  // ---- clauses --------------------------------------------------------
  /** CALL db.labels() YIELD label AS l, n WHERE … */
  private def parseCallProc(): CallProc = {
    val name = new StringBuilder(identName())
    while (trySym(".")) { name += '.'; name ++= identName() }
    val args = Vector.newBuilder[Expr]
    if (trySym("(")) {
      if (!isSym(")")) {
        args += parseExpr()
        while (trySym(",")) args += parseExpr()
      }
      eatSym(")")
    }
    val yields = Vector.newBuilder[(String, Option[String])]
    if (tryKw("YIELD")) {
      def one(): Unit = {
        val c = identName()
        val alias = if (tryKw("AS")) Some(identName()) else None
        yields += ((c, alias))
      }
      one()
      while (trySym(",")) one()
    }
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    CallProc(name.result().toLowerCase, args.result(), yields.result(), where)
  }

  private def parseMatch(optional: Boolean): MatchClause = {
    eatKw("MATCH")
    val paths = Vector.newBuilder[PatternPath]
    paths += parsePathTop()
    while (trySym(",")) paths += parsePathTop()
    val hints = Vector.newBuilder[String]
    while (peek match { case Ident(t) => t.equalsIgnoreCase("USING"); case _ => false }) {
      next()
      identName().toUpperCase match {
        case "INDEX" =>
          val v = identName(); eatSym(":"); val l = identName()
          val props = Vector.newBuilder[String]
          if (trySym("(")) {
            props += identName()
            while (trySym(",")) props += identName()
            eatSym(")")
          }
          hints += s"INDEX $v:$l(${props.result().mkString(",")})"
        case "SCAN" =>
          val v = identName(); eatSym(":"); val l = identName()
          hints += s"SCAN $v:$l"
        case "JOIN" =>
          eatKw("ON"); hints += s"JOIN ON ${identName()}"
        case other => fail(s"unknown hint USING $other")
      }
    }
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    MatchClause(paths.result(), optional, where, hints.result())
  }

  /** A MATCH pattern element: optional `p =` binding, optional
    * shortestPath(…) / allShortestPaths(…) wrapper.
    */
  private def parsePathTop(): PatternPath = {
    var pathVar: Option[String] = None
    peek match {
      case Ident(nm) if pos + 1 < tokens.length && tokens(pos + 1) == Sym("=") =>
        pathVar = Some(nm); next(); next()
      case _ =>
    }
    peek match {
      case Ident(fn) if fn.equalsIgnoreCase("shortestPath") ||
          fn.equalsIgnoreCase("allShortestPaths") =>
        next(); eatSym("(")
        val p = parsePath()
        eatSym(")")
        p.copy(pathVar = pathVar,
          shortest = Some(if (fn.toLowerCase.startsWith("all")) "all" else "single"))
      case _ => parsePath().copy(pathVar = pathVar)
    }
  }

  private def parseWith(): WithClause = {
    eatKw("WITH")
    val distinct = tryKw("DISTINCT")
    val items = parseProjectionItems()
    val (orderBy, skip, limit) = parseTail()
    val where = if (tryKw("WHERE")) Some(parseExpr()) else None
    WithClause(items, distinct, where, orderBy, skip, limit)
  }

  private def parseCreate(): CreateClause = {
    eatKw("CREATE")
    val paths = Vector.newBuilder[PatternPath]
    paths += parsePath()
    while (trySym(",")) paths += parsePath()
    CreateClause(paths.result())
  }

  private def parseMerge(): MergeClause = {
    eatKw("MERGE")
    val path = parsePath()
    var onCreate = Seq.empty[(Prop, Expr)]
    var onMatch = Seq.empty[(Prop, Expr)]
    while (isKw("ON")) {
      next()
      if (tryKw("CREATE")) { eatKw("SET"); onCreate = onCreate ++ parseSetItems() }
      else if (tryKw("MATCH")) { eatKw("SET"); onMatch = onMatch ++ parseSetItems() }
      else fail("expected CREATE or MATCH after ON")
    }
    MergeClause(path, onCreate, onMatch)
  }

  private def parseSetItems(): Seq[(Prop, Expr)] = {
    val items = Vector.newBuilder[(Prop, Expr)]
    def one(): Unit = {
      // target is strictly `var.prop` — parseExpr would eat the `=` as a
      // comparison operator
      val v = identName()
      eatSym(".")
      val k = identName()
      eatSym("=")
      items += ((Prop(v, k), parseExpr()))
    }
    one()
    while (trySym(",")) one()
    items.result()
  }

  private def parseSetClause(): SetClause = {
    eatKw("SET")
    SetClause(parseSetItems())
  }

  private def parseDelete(detach: Boolean): DeleteClause = {
    eatKw("DELETE")
    val vars = Vector.newBuilder[String]
    vars += identName()
    while (trySym(",")) vars += identName()
    DeleteClause(vars.result(), detach)
  }

  private def parseRemove(): RemoveClause = {
    eatKw("REMOVE")
    val items = Vector.newBuilder[Prop]
    def one(): Unit = parseExpr() match {
      case p: Prop => items += p
      case other => fail(s"REMOVE target must be a property, got $other")
    }
    one()
    while (trySym(",")) one()
    RemoveClause(items.result())
  }

  private def parseForeach(): ForeachClause = {
    eatKw("FOREACH")
    eatSym("(")
    val v = identName()
    eatKw("IN")
    val l = parseExpr()
    eatSym("|")
    val inner = Vector.newBuilder[Clause]
    while (!isSym(")")) {
      peek match {
        case Kw("SET") => inner += parseSetClause()
        case Kw("CREATE") => inner += parseCreate()
        case Kw("MERGE") => inner += parseMerge()
        case Kw("DELETE") => inner += parseDelete(detach = false)
        case Kw("DETACH") => next(); inner += parseDelete(detach = true)
        case Kw("REMOVE") => inner += parseRemove()
        case Kw("FOREACH") => inner += parseForeach()
        case t => fail(s"unsupported clause in FOREACH: ${t.text}")
      }
    }
    eatSym(")")
    ForeachClause(v, l, inner.result())
  }

  private def parseUnwind(): UnwindClause = {
    eatKw("UNWIND")
    val e = parseExpr()
    eatKw("AS")
    val a = identName()
    UnwindClause(e, a)
  }

  private def parseReturn(): ReturnClause = {
    eatKw("RETURN")
    val distinct = tryKw("DISTINCT")
    val items = parseProjectionItems()
    val (orderBy, skip, limit) = parseTail()
    ReturnClause(items, distinct, orderBy, skip, limit)
  }

  private def parseTail(): (Seq[SortItem], Option[Long], Option[Long]) = {
    val orderBy =
      if (tryKw("ORDER")) {
        eatKw("BY")
        val items = Vector.newBuilder[SortItem]
        def one(): SortItem = {
          val e = parseExpr()
          val asc =
            if (tryKw("DESC") || tryKw("DESCENDING")) false
            else { tryKw("ASC"); tryKw("ASCENDING"); true }
          SortItem(e, asc)
        }
        items += one()
        while (trySym(",")) items += one()
        items.result()
      } else Seq.empty
    val skip = if (tryKw("SKIP")) Some(longLit()) else None
    val limit = if (tryKw("LIMIT")) Some(longLit()) else None
    (orderBy, skip, limit)
  }

  private def longLit(): Long = next() match {
    case NumLit(t) => t.toLong
    case t => fail(s"expected integer, got ${t.text}")
  }

  private def parseProjectionItems(): Seq[ProjectionItem] = {
    val items = Vector.newBuilder[ProjectionItem]
    def one(): ProjectionItem = {
      if (isSym("*")) { next(); ProjectionItem(Variable("*"), None) }
      else {
        val e = parseExpr()
        val alias = if (tryKw("AS")) Some(identName()) else None
        ProjectionItem(e, alias)
      }
    }
    items += one()
    while (trySym(",")) items += one()
    items.result()
  }

  private def identName(): String = next() match {
    case Ident(t) => t
    case k @ Kw(_) => k.orig // keywords usable as labels/aliases, case kept
    case t => fail(s"expected identifier, got ${t.text}")
  }

  // ---- patterns -------------------------------------------------------
  private def parsePath(): PatternPath = {
    val first = parseNodePat()
    val hops = Vector.newBuilder[(RelPat, NodePat)]
    while (isSym("-") || isSym("<-") || isSym("<->")) {
      val rel = parseRelPat()
      val node = parseNodePat()
      hops += ((rel, node))
    }
    PatternPath(first, hops.result())
  }

  private def parseNodePat(): NodePat = {
    eatSym("(")
    var variable: Option[String] = None
    var label: Option[String] = None
    var props: Map[String, Expr] = Map.empty
    peek match {
      case Ident(nm) => variable = Some(nm); next()
      case _ =>
    }
    var extraLabels = Vector.empty[String]
    if (trySym(":")) {
      label = Some(identName())
      while (trySym(":")) extraLabels :+= identName() // (:A:B) — all must hold
    }
    if (isSym("{")) props = parseMapLit()
    eatSym(")")
    NodePat(variable, label, props, extraLabels)
  }

  private def parseRelPat(): RelPat = {
    // directions:  -[..]->   <-[..]-   -[..]-   <->
    var dir: Dir = DirBoth
    var leftArrow = false
    if (trySym("<-")) leftArrow = true
    else if (trySym("<->")) { dir = DirBoth }
    else eatSym("-")

    var variable: Option[String] = None
    var relType: Option[String] = None
    var altTypes = Vector.empty[String]
    var varLength: Option[(Int, Int)] = None
    var props: Map[String, Expr] = Map.empty

    if (trySym("[")) {
      peek match {
        case Ident(nm) => variable = Some(nm); next()
        case _ =>
      }
      if (trySym(":")) {
        relType = Some(identName())
        while (trySym("|")) { trySym(":"); altTypes :+= identName() } // [:T1|T2] alternation
      }
      if (trySym("*")) {
        var min = 1
        var max = 10
        peek match {
          case NumLit(t) =>
            next(); min = t.toInt; max = t.toInt
            if (trySym("..")) peek match {
              case NumLit(u) => next(); max = u.toInt
              case _ => max = 10
            }
          case Sym("..") =>
            next()
            peek match { case NumLit(u) => next(); min = 1; max = u.toInt; case _ => }
          case _ =>
        }
        varLength = Some((min, max))
      }
      if (isSym("{")) props = parseMapLit()
      eatSym("]")
    }

    if (leftArrow) { eatSym("-"); dir = DirIn }
    else if (trySym("->")) dir = DirOut
    else if (trySym("-")) { if (dir != DirIn) dir = DirBoth }
    RelPat(variable, relType, dir, varLength, props, altTypes)
  }

  private def parseMapLit(): Map[String, Expr] = {
    eatSym("{")
    val m = Map.newBuilder[String, Expr]
    if (!isSym("}")) {
      def one(): Unit = { val k = identName(); eatSym(":"); m += (k -> parseExpr()) }
      one()
      while (trySym(",")) one()
    }
    eatSym("}")
    m.result()
  }

  // ---- expressions ----------------------------------------------------
  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseXor()
    while (tryKw("OR")) l = Bin("OR", l, parseXor())
    l
  }
  // Cypher precedence: OR < XOR < AND < NOT
  private def parseXor(): Expr = {
    var l = parseAnd()
    while (tryKw("XOR")) l = Bin("XOR", l, parseAnd())
    l
  }
  private def parseAnd(): Expr = {
    var l = parseNot()
    while (tryKw("AND")) l = Bin("AND", l, parseNot())
    l
  }
  private def parseNot(): Expr =
    if (tryKw("NOT")) Not(parseNot()) else parseComparison()

  private def parseComparison(): Expr = {
    var l = parseAdditive()
    var done = false
    while (!done) {
      peek match {
        case Sym(op @ ("=" | "<>" | "<" | ">" | "<=" | ">=" | "=~")) =>
          next(); l = Bin(op, l, parseAdditive())
        case Kw("IN") => next(); l = Bin("IN", l, parseAdditive())
        case Kw("STARTS") => next(); eatKw("WITH"); l = Bin("STARTSWITH", l, parseAdditive())
        case Kw("ENDS") => next(); eatKw("WITH"); l = Bin("ENDSWITH", l, parseAdditive())
        case Kw("CONTAINS") => next(); l = Bin("CONTAINS", l, parseAdditive())
        case Kw("IS") =>
          next()
          val neg = tryKw("NOT")
          eatKw("NULL")
          l = IsNull(l, neg)
        case _ => done = true
      }
    }
    l
  }

  private def parseAdditive(): Expr = {
    var l = parseMultiplicative()
    var done = false
    while (!done) {
      if (trySym("+")) l = Bin("+", l, parseMultiplicative())
      else if (trySym("-")) l = Bin("-", l, parseMultiplicative())
      else done = true
    }
    l
  }
  private def parseMultiplicative(): Expr = {
    var l = parseUnary()
    var done = false
    while (!done) {
      if (trySym("*")) l = Bin("*", l, parseUnary())
      else if (trySym("/")) l = Bin("/", l, parseUnary())
      else if (trySym("%")) l = Bin("%", l, parseUnary())
      else if (trySym("^")) l = Bin("^", l, parseUnary())
      else done = true
    }
    l
  }
  private def parseUnary(): Expr =
    if (trySym("-")) Bin("-", Lit(0L), parseUnary())
    else if (trySym("+")) parseUnary()
    else parsePostfix()

  private def parsePostfix(): Expr = {
    var e = parsePrimary()
    var done = false
    while (!done) {
      if (isSym(".")) {
        next()
        val key = identName()
        e match {
          case Variable(v) => e = Prop(v, key)
          case _ => e = FnCall("_propOf", Seq(e, Lit(key)))
        }
      } else if (isSym("[")) {
        next()
        if (trySym("..")) { // l[..to]
          val to = if (isSym("]")) None else Some(parseExpr())
          eatSym("]")
          e = SliceExpr(e, None, to)
        } else {
          val idx = parseExpr()
          if (trySym("..")) { // l[from..] / l[from..to]
            val to = if (isSym("]")) None else Some(parseExpr())
            eatSym("]")
            e = SliceExpr(e, Some(idx), to)
          } else {
            eatSym("]")
            e = Index(e, idx)
          }
        }
      } else if (isSym(":")) {
        // label predicate n:Label (only valid on a bare variable)
        e match {
          case Variable(v) =>
            next(); val lbl = identName(); e = HasLabel(v, lbl)
          case _ => done = true
        }
      } else if (isSym("{")) {
        // map projection n{.key, alias: expr, .*, var} (only on a variable)
        e match {
          case Variable(v) =>
            next()
            val items = Vector.newBuilder[MapProjItem]
            def one(): Unit = {
              if (trySym(".")) {
                if (trySym("*")) items += MapProjItem("*", None)
                else { val k = identName(); items += MapProjItem(k, Some(Prop(v, k))) }
              } else {
                val k = identName()
                if (trySym(":")) items += MapProjItem(k, Some(parseExpr()))
                else items += MapProjItem(k, Some(Variable(k)))
              }
            }
            if (!isSym("}")) { one(); while (trySym(",")) one() }
            eatSym("}")
            e = MapProjection(v, items.result())
          case _ => done = true
        }
      } else done = true
    }
    e
  }

  /** COUNT/EXISTS used as a plain identifier (a YIELD column, an alias)
    * rather than the aggregate/subquery form: next token is neither '('
    * nor '{'.
    */
  private def kwAsVariable: Boolean = tokens.lift(pos + 1) match {
    case Some(Sym("(")) | Some(Sym("{")) => false
    case _ => true
  }

  private def parsePrimary(): Expr = {
    peek match {
      case Kw("COUNT") if kwAsVariable => next(); Variable("count")
      case Kw("EXISTS") if kwAsVariable => next(); Variable("exists")
      case Kw("COUNT") =>
        next()
        if (trySym("{")) { // COUNT { [MATCH] <path> [WHERE …] } subquery
          tryKw("MATCH")
          val p = parsePath()
          val w = if (tryKw("WHERE")) Some(parseExpr()) else None
          eatSym("}")
          CountPattern(p, w)
        } else {
          eatSym("(")
          if (trySym("*")) { eatSym(")"); CountStar() }
          else {
            val distinct = tryKw("DISTINCT")
            val arg = parseExpr()
            eatSym(")")
            FnCall("count", Seq(arg), distinct)
          }
        }
      case Kw("EXISTS") =>
        next()
        if (trySym("{")) { // EXISTS { [MATCH] <path> [WHERE …] }
          tryKw("MATCH")
          val p = parsePath()
          val w = if (tryKw("WHERE")) Some(parseExpr()) else None
          eatSym("}")
          ExistsPattern(p, w)
        } else {
          eatSym("(")
          val p = parsePath()
          eatSym(")")
          ExistsPattern(p)
        }
      case Kw("CASE") =>
        next()
        val scrutinee = if (!isKw("WHEN")) Some(parseExpr()) else None
        val whens = Vector.newBuilder[(Expr, Expr)]
        while (tryKw("WHEN")) {
          val c = parseExpr(); eatKw("THEN"); val v = parseExpr()
          whens += ((c, v))
        }
        val default = if (tryKw("ELSE")) Some(parseExpr()) else None
        eatKw("END")
        CaseExpr(scrutinee, whens.result(), default)
      case Kw("TRUE") => next(); Lit(true)
      case Kw("FALSE") => next(); Lit(false)
      case Kw("NULL") => next(); Lit(null)
      case NumLit(t) =>
        next()
        if (t.contains('.') || t.contains('e') || t.contains('E')) Lit(t.toDouble) else Lit(t.toLong)
      case StrLit(t) => next(); Lit(t)
      case Sym("$") => next(); Param(identName())
      case Sym("(") =>
        next(); val e = parseExpr(); eatSym(")"); e
      case Sym("[") =>
        // `[x IN list …]` → list comprehension; `[(a)-[…]->(b) … | e]` →
        // pattern comprehension (backtracks to list literal); else literal
        if (tokens.lift(pos + 1).exists { case Ident(_) => true; case _ => false } &&
            tokens.lift(pos + 2).exists { case Kw("IN") => true; case _ => false })
          parseListComprehension()
        else if (tokens.lift(pos + 1).exists { case Sym("(") => true; case _ => false })
          parsePatternComprehensionOrList()
        else
          parseListLiteral()
      case Sym("{") =>
        // map literal in expression position → ordered named struct
        next()
        val items = Vector.newBuilder[(String, Expr)]
        if (!isSym("}")) {
          def one(): Unit = { val k = identName(); eatSym(":"); items += ((k, parseExpr())) }
          one()
          while (trySym(",")) one()
        }
        eatSym("}")
        MapLit(items.result())
      case Kw("ALL") if tokens.lift(pos + 1).exists { case Sym("(") => true; case _ => false } =>
        next()
        parseQuantifierBody("all")
      case Ident(nm) =>
        next()
        if (nm.equalsIgnoreCase("reduce") && isSym("(")) {
          // reduce(acc = init, x IN list | step)
          next()
          val accName = identName()
          eatSym("=")
          val init = parseExpr()
          eatSym(",")
          val v = identName()
          eatKw("IN")
          val listE = parseExpr()
          eatSym("|")
          val step = parseExpr()
          eatSym(")")
          ReduceExpr(accName, init, v, listE, step)
        } else if (Set("any", "none", "single").contains(nm.toLowerCase) && isSym("(") &&
            tokens.lift(pos + 1).exists { case Ident(_) => true; case _ => false } &&
            tokens.lift(pos + 2).exists { case Kw("IN") => true; case _ => false }) {
          parseQuantifierBody(nm.toLowerCase)
        } else if (nm.equalsIgnoreCase("collect") && isSym("{")) {
          // COLLECT { MATCH … RETURN x } expression subquery
          next()
          val inner = parseSingle()
          eatSym("}")
          CollectSubquery(inner)
        } else if (isSym("(")) {
          // function call; dotted names like apoc.coll.sum
          var fname = nm
          // (dotted handled in parsePostfix via Prop; function names with dots
          //  are pre-joined here only when '(' directly follows the ident)
          next() // '('
          val distinct = tryKw("DISTINCT")
          val args = Vector.newBuilder[Expr]
          if (!isSym(")")) {
            args += parseExpr()
            while (trySym(",")) args += parseExpr()
          }
          eatSym(")")
          FnCall(fname.toLowerCase, args.result(), distinct)
        } else if (isSym(".") && pos + 2 < tokens.length) {
          // lookahead for dotted function name: a.b.c(
          var j = pos
          val parts = Vector.newBuilder[String]
          parts += nm
          var isFn = false
          while (j + 1 < tokens.length && tokens(j) == Sym(".") &&
            (tokens(j + 1) match {
              // keywords are legal name parts after a dot: apoc.coll.set,
              // apoc.map.merge — the lexer tags them Kw, not Ident
              case Ident(_) | Kw(_) => true
              case _ => false
            })) {
            parts += tokens(j + 1).text
            j += 2
            if (j < tokens.length && tokens(j) == Sym("(")) isFn = true
          }
          if (isFn && j < tokens.length && tokens(j) == Sym("(")) {
            pos = j + 1 // past '('
            val distinct = tryKw("DISTINCT")
            val args = Vector.newBuilder[Expr]
            if (!isSym(")")) {
              args += parseExpr()
              while (trySym(",")) args += parseExpr()
            }
            eatSym(")")
            FnCall(parts.result().mkString(".").toLowerCase, args.result(), distinct)
          } else Variable(nm)
        } else Variable(nm)
      case t => fail(s"unexpected token ${t.text}")
    }
  }

  private def parseListLiteral(): Expr = {
    eatSym("[")
    val items = Vector.newBuilder[Expr]
    if (!isSym("]")) {
      items += parseExpr()
      while (trySym(",")) items += parseExpr()
    }
    eatSym("]")
    ListLit(items.result())
  }

  /** `[x IN list [WHERE pred] [| proj]]` (both tails optional). */
  private def parseListComprehension(): Expr = {
    eatSym("[")
    val v = identName()
    eatKw("IN")
    val listE = parseExpr()
    val whereE = if (tryKw("WHERE")) Some(parseExpr()) else None
    val projE = if (trySym("|")) Some(parseExpr()) else None
    eatSym("]")
    ListComp(v, listE, whereE, projE)
  }

  /** `(x IN list WHERE pred)` body of all/any/none/single. */
  private def parseQuantifierBody(kind: String): Expr = {
    eatSym("(")
    val v = identName()
    eatKw("IN")
    val listE = parseExpr()
    eatKw("WHERE")
    val pred = parseExpr()
    eatSym(")")
    Quantifier(kind, v, listE, pred)
  }

  /** `[(a)-[:T]->(b) [WHERE w] | proj]` — desugars to the COLLECT {}
    * expression subquery (grouped left join, never per-row). Backtracks to a
    * plain list literal if the bracket body isn't a pattern.
    */
  private def parsePatternComprehensionOrList(): Expr = {
    val start = pos
    try {
      eatSym("[")
      val p = parsePath()
      val w = if (tryKw("WHERE")) Some(parseExpr()) else None
      eatSym("|")
      val proj = parseExpr()
      eatSym("]")
      CollectSubquery(SingleQuery(Seq(
        MatchClause(Seq(p), optional = false, where = w),
        ReturnClause(Seq(ProjectionItem(proj, Some("_pc"))),
          distinct = false, Seq.empty, None, None))))
    } catch {
      case _: IllegalArgumentException =>
        pos = start
        parseListLiteral()
    }
  }
}

object Parser {
  def parse(query: String): Query = new Parser(Lexer.tokenize(query)).parseQuery()
}
