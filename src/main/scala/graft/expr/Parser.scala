package graft.expr

import Expr._

/** Pratt parser for SSIS expressions.
  *
  * Precedence (tightest-binding last), matching the public SSIS
  * expression-language operator table (which follows C):
  *   ?:  ||  &&  |  ^  &  ==/!=  relational  <</>>  +/-  * / %  unary/cast
  */
object Parser {
  def parse(input: String): Expr = {
    val p = new Parser(Lexer.tokenize(input), input)
    val e = p.parseTernary()
    p.expectEof()
    e
  }

  private val precedence: Seq[Set[String]] = Seq(
    Set("||"), Set("&&"), Set("|"), Set("^"), Set("&"),
    Set("==", "!="), Set("<", ">", "<=", ">="), Set("<<", ">>"),
    Set("+", "-"), Set("*", "/", "%"))
}

private final class Parser(toks: Vector[Tok], input: String) {
  private var pos = 0
  private def peek: Tok = toks(math.min(pos, toks.length - 1))
  private def advance(): Tok = { val t = peek; pos += 1; t }
  private def fail(msg: String) =
    throw new ExprParseException(s"$msg (token ${peek} at #$pos) in: $input")
  private def expectOp(sym: String): Unit = peek match {
    case Tok.Op(`sym`) => pos += 1
    case _ => fail(s"expected '$sym'")
  }
  def expectEof(): Unit = peek match {
    case Tok.Eof => ()
    case _ => fail("trailing input after expression")
  }

  def parseTernary(): Expr = {
    val cond = parseBinary(0)
    peek match {
      case Tok.Op("?") =>
        pos += 1
        val t = parseTernary()
        expectOp(":")
        val f = parseTernary()
        Ternary(cond, t, f)
      case _ => cond
    }
  }

  private def parseBinary(level: Int): Expr = {
    if (level >= Parser.precedence.length) return parseUnary()
    var left = parseBinary(level + 1)
    var go = true
    while (go) peek match {
      case Tok.Op(sym) if Parser.precedence(level)(sym) =>
        pos += 1
        val right = parseBinary(level + 1)
        left = Binary(sym, left, right)
      case _ => go = false
    }
    left
  }

  private def parseUnary(): Expr = peek match {
    case Tok.Op("!") => pos += 1; Unary("!", parseUnary())
    case Tok.Op("-") => pos += 1; Unary("-", parseUnary())
    case Tok.Op("+") => pos += 1; parseUnary()
    case Tok.Op("~") => pos += 1; Unary("~", parseUnary())
    case Tok.Op("(") if castAhead => parseCast()
    case _ => parsePrimary()
  }

  /** Lookahead: '(' Ident(DT_*) → this paren is a cast prefix. */
  private def castAhead: Boolean = toks(pos + 1) match {
    case Tok.Ident(n) if n.toUpperCase.startsWith("DT_") => true
    case _ => false
  }

  private def parseCast(): Expr = {
    expectOp("(")
    val name = advance() match {
      case Tok.Ident(n) => n.toUpperCase
      case _ => fail("expected DT_ type name")
    }
    val args = Seq.newBuilder[Int]
    while (peek == Tok.Op(",")) {
      pos += 1
      advance() match {
        case Tok.Num(t) => args += t.toInt
        case _ => fail("expected integer cast argument")
      }
    }
    expectOp(")")
    Cast(DtType(name, args.result()), parseUnary())
  }

  private def parseDtTypeArg(): DtType = {
    // inside NULL(DT_I4) / NULL(DT_NUMERIC, 18, 2)
    val name = advance() match {
      case Tok.Ident(n) => n.toUpperCase
      case _ => fail("expected DT_ type name")
    }
    val args = Seq.newBuilder[Int]
    while (peek == Tok.Op(",")) {
      pos += 1
      advance() match {
        case Tok.Num(t) => args += t.toInt
        case _ => fail("expected integer type argument")
      }
    }
    DtType(name, args.result())
  }

  private def parsePrimary(): Expr = advance() match {
    case Tok.Num(t) =>
      if (t.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) DoubleLit(t.toDouble)
      else IntLit(t.toLong)
    case Tok.Str(s) => StrLit(s)
    case Tok.ColRef(c) => ColRef(c)
    case Tok.VarRef(ns, v) => VarRef(ns, v)
    case Tok.Ident(id) =>
      val upper = id.toUpperCase
      upper match {
        case "TRUE" => BoolLit(true)
        case "FALSE" => BoolLit(false)
        case "NULL" if peek == Tok.Op("(") =>
          pos += 1 // '('
          val dt = parseDtTypeArg()
          expectOp(")")
          TypedNull(dt)
        case "NULL" => NullLit
        case _ if peek == Tok.Op("(") =>
          pos += 1
          val args = Seq.newBuilder[Expr]
          if (peek != Tok.Op(")")) {
            args += parseTernary()
            while (peek == Tok.Op(",")) { pos += 1; args += parseTernary() }
          }
          expectOp(")")
          Call(upper, args.result())
        case _ => ColRef(id) // bare column name
      }
    case Tok.Op("(") =>
      val e = parseTernary()
      expectOp(")")
      e
    case t => fail(s"unexpected token $t")
  }
}
