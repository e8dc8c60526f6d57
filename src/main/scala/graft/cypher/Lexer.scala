package graft.cypher

/** Hand-rolled tokenizer for the Cypher surface in SURVEY §2.
  * Case-insensitive keywords, `'…'`/`"…"` strings with backslash escapes,
  * backtick identifiers, ints/floats, multi-char operators.
  */
object Lexer {
  sealed trait Tok { def text: String }
  // uppercased keyword; `orig` keeps the source spelling so identifiers that
  // collide with keywords (a label named `Order`) survive as written
  case class Kw(text: String)(val orig: String) extends Tok
  case class Ident(text: String) extends Tok
  case class StrLit(text: String) extends Tok
  case class NumLit(text: String) extends Tok
  case class Sym(text: String) extends Tok
  case object EOF extends Tok { val text = "<eof>" }

  private val keywords = Set(
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "UNWIND", "AS", "ORDER",
    "BY", "SKIP", "LIMIT", "DISTINCT", "AND", "OR", "XOR", "NOT", "IN",
    "STARTS", "ENDS", "CONTAINS", "IS", "NULL", "ASC", "ASCENDING", "DESC",
    "DESCENDING", "CASE", "WHEN", "THEN", "ELSE", "END", "TRUE", "FALSE",
    "UNION", "ALL", "EXISTS", "COUNT", "CREATE", "MERGE", "SET", "DELETE",
    "DETACH", "REMOVE", "ON", "CALL", "YIELD", "FOREACH")

  private val symbols3 = Seq("<->")
  private val symbols2 = Seq("<=", ">=", "<>", "=~", "->", "<-", "..", "+=")
  private val symbols1 = "()[]{}<>=,.:;|+-*/%^$".map(_.toString)

  def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && q(i + 1) == '/') { // line comment
        while (i < n && q(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && q(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(q(i) == '*' && q(i + 1) == '/')) i += 1
        i += 2
      } else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != quote) {
          if (q(i) == '\\' && i + 1 < n) {
            q(i + 1) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case other => sb.append(other)
            }
            i += 2
          } else { sb.append(q(i)); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException(s"unterminated string literal")
        i += 1
        out += StrLit(sb.toString)
      } else if (c == '`') {
        val j = q.indexOf('`', i + 1)
        if (j < 0) throw new IllegalArgumentException("unterminated backtick identifier")
        out += Ident(q.substring(i + 1, j)); i = j + 1
      } else if (c.isDigit) {
        val start = i
        while (i < n && q(i).isDigit) i += 1
        // fraction — but never eat the ".." range operator
        if (i + 1 < n && q(i) == '.' && q(i + 1).isDigit) {
          i += 1
          while (i < n && q(i).isDigit) i += 1
        }
        if (i < n && (q(i) == 'e' || q(i) == 'E')) {
          var j = i + 1
          if (j < n && (q(j) == '+' || q(j) == '-')) j += 1
          if (j < n && q(j).isDigit) {
            i = j
            while (i < n && q(i).isDigit) i += 1
          }
        }
        out += NumLit(q.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        val w = q.substring(start, i)
        if (keywords.contains(w.toUpperCase)) out += Kw(w.toUpperCase)(w)
        else out += Ident(w)
      } else {
        val rest = q.substring(i)
        symbols3.find(rest.startsWith) match {
          case Some(s) => out += Sym(s); i += s.length
          case None => symbols2.find(rest.startsWith) match {
            case Some(s) => out += Sym(s); i += s.length
            case None =>
              if (symbols1.contains(c.toString)) { out += Sym(c.toString); i += 1 }
              else throw new IllegalArgumentException(s"unexpected character '$c' at $i")
          }
        }
      }
    }
    out += EOF
    out.result()
  }
}
