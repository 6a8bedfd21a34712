package graft.expr

sealed trait Tok
object Tok {
  final case class Num(text: String) extends Tok
  final case class Str(value: String) extends Tok
  final case class Ident(name: String) extends Tok
  final case class ColRef(name: String) extends Tok
  final case class VarRef(ns: String, name: String) extends Tok
  final case class Op(sym: String) extends Tok
  case object Eof extends Tok
}

final class ExprParseException(msg: String) extends RuntimeException(msg)

/** Tokenizer for SSIS expressions.
  *
  * Grammar surface observed in the reference fixtures:
  * `[Col]` / `[Comp].Col` column refs (expression_translator.py:109-126),
  * `#{..Columns[Col]}` refs, `@[User::X]` variables
  * (enhanced_json_mapper.py:2484-2487), `(DT_I4)` cast prefixes
  * (Sample_Medium_Package.dtsx:328), C-style operators and literals.
  */
object Lexer {
  private val multiOps = Seq("==", "!=", "<=", ">=", "&&", "||", "<<", ">>")
  private val singleOps = "+-*/%<>!?:(),&|^~"

  def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    def fail(msg: String) = throw new ExprParseException(s"$msg at offset $i in: $s")
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          s(i) match {
            case '\\' if i + 1 < n =>
              s(i + 1) match {
                case 'n' => sb.append('\n'); case 't' => sb.append('\t')
                case 'r' => sb.append('\r'); case '"' => sb.append('"')
                case '\\' => sb.append('\\')
                case other => sb.append('\\').append(other)
              }
              i += 2
            case '"' => closed = true; i += 1
            case ch => sb.append(ch); i += 1
          }
        }
        if (!closed) fail("unterminated string literal")
        out += Tok.Str(sb.toString)
      }
      else if (c == '[') {
        // [Column Name] — may be followed by .Col / .[Col] (component-qualified)
        val close = s.indexOf(']', i)
        if (close < 0) fail("unterminated [column] reference")
        var name = s.substring(i + 1, close)
        i = close + 1
        // component-qualified: keep only the trailing column segment
        while (i < n && s(i) == '.') {
          i += 1
          if (i < n && s(i) == '[') {
            val c2 = s.indexOf(']', i)
            if (c2 < 0) fail("unterminated [column] reference")
            name = s.substring(i + 1, c2); i = c2 + 1
          } else {
            val start = i
            while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
            if (i == start) fail("expected column name after '.'")
            name = s.substring(start, i)
          }
        }
        out += Tok.ColRef(name)
      }
      else if (c == '#' && i + 1 < n && s(i + 1) == '{') {
        // #{Package\Comp.Outputs[Out].Columns[Col]} → Col
        val close = s.indexOf('}', i)
        if (close < 0) fail("unterminated #{...} reference")
        val body = s.substring(i + 2, close)
        val m = "Columns\\[([^\\]]+)\\]".r.findAllMatchIn(body).toSeq
        if (m.isEmpty) fail(s"no Columns[..] segment in #{...} reference")
        out += Tok.ColRef(m.last.group(1))
        i = close + 1
      }
      else if (c == '@') {
        i += 1
        if (i < n && s(i) == '[') {
          val close = s.indexOf(']', i)
          if (close < 0) fail("unterminated @[...] variable")
          val body = s.substring(i + 1, close)
          i = close + 1
          body.split("::") match {
            case Array(ns, v) => out += Tok.VarRef(ns, v)
            case Array(v)     => out += Tok.VarRef("User", v)
            case _            => fail(s"malformed variable reference @[$body]")
          }
        } else {
          val start = i
          while (i < n && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == ':')) i += 1
          if (i == start) fail("expected variable name after '@'")
          val body = s.substring(start, i)
          body.split("::") match {
            case Array(ns, v) => out += Tok.VarRef(ns, v)
            case Array(v)     => out += Tok.VarRef("User", v)
            case _            => fail(s"malformed variable reference @$body")
          }
        }
      }
      else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val start = i
        while (i < n && s(i).isDigit) i += 1
        if (i < n && s(i) == '.') { i += 1; while (i < n && s(i).isDigit) i += 1 }
        if (i < n && (s(i) == 'e' || s(i) == 'E')) {
          i += 1
          if (i < n && (s(i) == '+' || s(i) == '-')) i += 1
          while (i < n && s(i).isDigit) i += 1
        }
        val numEnd = i
        // numeric suffixes (L, U, UL...) — parsed and dropped
        while (i < n && "lLuU".indexOf(s(i)) >= 0) i += 1
        out += Tok.Num(s.substring(start, numEnd))
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Tok.Ident(s.substring(start, i))
      }
      else {
        multiOps.find(op => s.startsWith(op, i)) match {
          case Some(op) => out += Tok.Op(op); i += op.length
          case None =>
            if (singleOps.indexOf(c) >= 0) { out += Tok.Op(c.toString); i += 1 }
            else fail(s"unexpected character '$c'")
        }
      }
    }
    out += Tok.Eof
    out.result()
  }
}
