package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Expr._

/** Compiles a parsed SSIS expression to a Catalyst Column tree.
  *
  * Deliberate fixes over the reference's regex translator
  * (/root/reference/mapping/expression_translator.py:19-68):
  *   - `ISNULL(x)` is a BOOLEAN test → `x.isNull` (the reference wrongly
  *     emits `coalesce`, translator.py:47; the fixture uses it as a bool:
  *     Sample_Medium_Package.dtsx:368,526);
  *   - `FINDSTRING(s, sub, occ)` → `locate(sub, s)` arg swap, with real
  *     occurrence support (translator.py:40 only handles occ=1);
  *   - nested ternaries parse correctly (translator.py:157-172 is one
  *     greedy regex);
  *   - string `+` is concatenation, int/int division stays integral
  *     (C semantics, as SSIS defines);
  *   - DATEADD/DATEDIFF get real datepart dispatch with T-SQL boundary
  *     counting (translator.py:25-26 marks these "simplified").
  */
object Compiler {

  /** Minimal static types — just enough to disambiguate SSIS operators. */
  sealed trait ETy
  object ETy {
    case object SStr extends ETy
    case object SBool extends ETy
    case object SInt extends ETy    // integral numeric
    case object SFloat extends ETy  // fractional numeric (incl. decimal)
    case object STime extends ETy
    case object SDate extends ETy
    case object SUnknown extends ETy
  }
  import ETy._

  def compile(text: String, schema: StructType, vars: Map[String, Any] = Map.empty): Column =
    emit(Parser.parse(text), schema, vars)

  /** Static type of an expression under `schema`. */
  def infer(e: Expr, schema: StructType, vars: Map[String, Any] = Map.empty): ETy = e match {
    case IntLit(_) => SInt
    case DoubleLit(_) => SFloat
    case StrLit(_) => SStr
    case BoolLit(_) => SBool
    case NullLit => SUnknown
    case TypedNull(dt) => tyOf(toDataType(dt))
    case ColRef(n) =>
      schema.fields.find(_.name.equalsIgnoreCase(n)).map(f => tyOf(f.dataType)).getOrElse(SUnknown)
    case VarRef(_, n) => vars.get(n).map {
      case _: String => SStr
      case _: Boolean => SBool
      case _: Int | _: Long | _: Short | _: Byte => SInt
      case _: Double | _: Float | _: BigDecimal => SFloat
      case _: java.sql.Timestamp | _: java.time.Instant => STime
      case _: java.sql.Date | _: java.time.LocalDate => SDate
      case _ => SUnknown
    }.getOrElse(SUnknown)
    case Cast(dt, _) => tyOf(toDataType(dt))
    case Unary("!", _) => SBool
    case Unary(_, c) => infer(c, schema, vars)
    case Binary(op, l, r) => op match {
      case "==" | "!=" | "<" | ">" | "<=" | ">=" | "&&" | "||" => SBool
      case "+" =>
        (infer(l, schema, vars), infer(r, schema, vars)) match {
          case (SStr, _) | (_, SStr) => SStr
          case (SFloat, _) | (_, SFloat) => SFloat
          case _ => SInt
        }
      case "/" | "*" | "-" | "%" =>
        (infer(l, schema, vars), infer(r, schema, vars)) match {
          case (SFloat, _) | (_, SFloat) => SFloat
          case _ => SInt
        }
      case _ => SInt
    }
    case Ternary(_, t, f) =>
      val tt = infer(t, schema, vars)
      if (tt != SUnknown) tt else infer(f, schema, vars)
    case Call(name, cargs) => name match {
      case "LEN" | "FINDSTRING" | "CODEPOINT" | "TOKENCOUNT" | "DATEDIFF" | "DATEPART" |
           "DAY" | "MONTH" | "YEAR" | "SIGN" => SInt
      case "ABS" | "CEILING" | "EXP" | "FLOOR" | "LN" | "LOG" | "POWER" | "ROUND" |
           "SQUARE" | "SQRT" => SFloat
      case "SUBSTRING" | "UPPER" | "LOWER" | "TRIM" | "LTRIM" | "RTRIM" | "REPLACE" |
           "REPLICATE" | "REVERSE" | "RIGHT" | "LEFT" | "TOKEN" | "HEX" => SStr
      case "GETDATE" | "GETUTCDATE" | "DATEADD" => STime
      case "ISNULL" => SBool
      case "IIF" if cargs.length == 3 =>
        infer(Ternary(cargs(0), cargs(1), cargs(2)), schema, vars)
      case _ => SUnknown
    }
  }

  private def tyOf(dt: DataType): ETy = dt match {
    case StringType => SStr
    case BooleanType => SBool
    case ByteType | ShortType | IntegerType | LongType => SInt
    case FloatType | DoubleType | _: DecimalType => SFloat
    case TimestampType | TimestampNTZType => STime
    case DateType => SDate
    case _ => SUnknown
  }

  /** DT_* → Spark type (SSIS type table, SURVEY.md §1.2). */
  def toDataType(dt: DtType): DataType = dt.name match {
    case "DT_I1" => ByteType
    case "DT_I2" => ShortType
    case "DT_I4" => IntegerType
    case "DT_I8" => LongType
    case "DT_UI1" => ShortType      // unsigned byte: widen (SURVEY §1.2 caveat)
    case "DT_UI2" => IntegerType
    case "DT_UI4" => LongType
    case "DT_UI8" => DecimalType(20, 0)
    case "DT_R4" => FloatType
    case "DT_R8" => DoubleType
    case "DT_BOOL" => BooleanType
    case "DT_STR" | "DT_WSTR" | "DT_TEXT" | "DT_NTEXT" | "DT_GUID" => StringType
    case "DT_NUMERIC" => DecimalType(dt.args.headOption.getOrElse(38), dt.args.lift(1).getOrElse(0))
    case "DT_DECIMAL" => DecimalType(28, dt.args.headOption.getOrElse(0))
    case "DT_CY" => DecimalType(19, 4)
    case "DT_DATE" | "DT_DBTIMESTAMP" | "DT_DBTIMESTAMP2" | "DT_FILETIME" => TimestampType
    case "DT_DBDATE" => DateType
    case "DT_DBTIME" | "DT_DBTIME2" => StringType
    case "DT_BYTES" | "DT_IMAGE" => BinaryType
    case other => throw new ExprParseException(s"unsupported cast type $other")
  }

  def emit(e: Expr, schema: StructType, vars: Map[String, Any] = Map.empty): Column = {
    def go(e: Expr): Column = e match {
      case IntLit(v) => if (v >= Int.MinValue && v <= Int.MaxValue) lit(v.toInt) else lit(v)
      case DoubleLit(v) => lit(v)
      case StrLit(v) => lit(v)
      case BoolLit(v) => lit(v)
      case NullLit => lit(null)
      case TypedNull(dt) => lit(null).cast(toDataType(dt))
      case ColRef(n) => col(n)
      case VarRef(ns, n) =>
        vars.get(n).orElse(vars.get(s"$ns::$n")) match {
          case Some(v) => lit(v)
          case None => throw new ExprParseException(s"unbound variable @[$ns::$n]")
        }
      case Cast(dt, c) => go(c).cast(toDataType(dt))
      case Unary("!", c) => !go(c)
      case Unary("-", c) => negate(go(c))
      case Unary("~", c) => bitwise_not(go(c))
      case Unary(op, _) => throw new ExprParseException(s"unsupported unary $op")
      case Binary(op, l, r) =>
        val (lc, rc) = (go(l), go(r))
        op match {
          case "+" =>
            val ty = infer(Binary("+", l, r), schema, vars)
            if (ty == SStr) concat(lc, rc) else lc + rc
          case "-" => lc - rc
          case "*" => lc * rc
          case "/" =>
            val lt = infer(l, schema, vars); val rt = infer(r, schema, vars)
            if (lt == SInt && rt == SInt) call_function("div", lc, rc) else lc / rc
          case "%" => lc % rc
          case "==" => lc === rc
          case "!=" => lc =!= rc
          case "<" => lc < rc
          case ">" => lc > rc
          case "<=" => lc <= rc
          case ">=" => lc >= rc
          case "&&" => lc && rc
          case "||" => lc || rc
          case "&" => lc.bitwiseAND(rc)
          case "|" => lc.bitwiseOR(rc)
          case "^" => lc.bitwiseXOR(rc)
          case "<<" => call_function("shiftleft", lc, rc)
          case ">>" => call_function("shiftright", lc, rc)
          case other => throw new ExprParseException(s"unsupported operator $other")
        }
      case Ternary(c, t, f) => when(go(c), go(t)).otherwise(go(f))
      case Call(name, args) => emitCall(name, args, args.map(go), schema, vars)
    }
    go(e)
  }

  private def emitCall(name: String, raw: Seq[Expr], args: Seq[Column],
                       schema: StructType, vars: Map[String, Any]): Column = {
    def arity(n: Int): Unit =
      if (args.length != n)
        throw new ExprParseException(s"$name expects $n args, got ${args.length}")
    name match {
      // IIF(c,t,f) — same semantics as the ?: ternary
      // (reference: expression_translator.py:59)
      case "IIF" => arity(3); when(args(0), args(1)).otherwise(args(2))
      // ---- math (SSIS math function set) ----
      case "ABS" => arity(1); abs(args(0))
      case "CEILING" => arity(1); ceil(args(0))
      case "EXP" => arity(1); exp(args(0))
      case "FLOOR" => arity(1); floor(args(0))
      case "LN" => arity(1); log(args(0))
      case "LOG" => arity(1); log10(args(0)) // SSIS LOG is base-10
      case "POWER" => arity(2); pow(args(0), args(1))
      case "ROUND" => arity(2); call_function("round", args(0), args(1))
      case "SIGN" => arity(1); signum(args(0))
      case "SQUARE" => arity(1); args(0) * args(0)
      case "SQRT" => arity(1); sqrt(args(0))

      // ---- string ----
      case "CODEPOINT" => arity(1); ascii(args(0))
      case "FINDSTRING" =>
        // FINDSTRING(str, sub, occurrence) — 1-based position of the
        // occurrence'th match, 0 if absent. Reference swaps args and drops
        // the occurrence (expression_translator.py:40).
        arity(3)
        raw(2) match {
          case IntLit(occ) if occ >= 1 =>
            var p: Column = locate1(args(1), args(0), lit(1))
            for (_ <- 2L to occ)
              p = when(p === 0, lit(0)).otherwise(locate1(args(1), args(0), p + 1))
            p
          case _ => throw new ExprParseException(
            "FINDSTRING occurrence must be a positive integer literal")
        }
      case "HEX" => arity(1); upper(hex(args(0)))
      case "LEN" => arity(1); length(args(0))
      case "LEFT" => arity(2); call_function("left", args(0), args(1))
      case "RIGHT" => arity(2); call_function("right", args(0), args(1))
      case "LOWER" => arity(1); lower(args(0))
      case "UPPER" => arity(1); upper(args(0))
      case "LTRIM" => arity(1); ltrim(args(0))
      case "RTRIM" => arity(1); rtrim(args(0))
      case "TRIM" => arity(1); trim(args(0))
      case "REPLACE" => arity(3); call_function("replace", args(0), args(1), args(2))
      case "REPLICATE" => arity(2); call_function("repeat", args(0), args(1))
      case "REVERSE" => arity(1); reverse(args(0))
      case "SUBSTRING" => // 1-based in both SSIS and Spark
        arity(3); call_function("substring", args(0), args(1), args(2))
      case "TOKEN" =>
        arity(3)
        try_element_at(tokens(args(0), raw(1)), args(2))
      case "TOKENCOUNT" =>
        arity(2)
        size(tokens(args(0), raw(1)))

      // ---- date/time ----
      case "GETDATE" | "GETUTCDATE" => arity(0); current_timestamp()
      case "DATEADD" =>
        arity(3)
        val n = args(1).cast(IntegerType)
        val z = lit(0)
        def iv(years: Column = z, months: Column = z, weeks: Column = z, days: Column = z,
               hours: Column = z, mins: Column = z, secs: Column = z): Column =
          make_interval(years, months, weeks, days, hours, mins, secs.cast(DecimalType(18, 6)))
        datePart(raw(0)) match {
          case "year" => args(2) + iv(years = n)
          case "quarter" => args(2) + iv(months = n * 3)
          case "month" => args(2) + iv(months = n)
          case "week" => args(2) + iv(weeks = n)
          case "day" => args(2) + iv(days = n)
          case "hour" => args(2) + iv(hours = n)
          case "minute" => args(2) + iv(mins = n)
          case "second" => args(2) + iv(secs = n)
          case p => throw new ExprParseException(s"DATEADD: unsupported datepart $p")
        }
      case "DATEDIFF" =>
        // T-SQL/SSIS semantics: count of datepart *boundaries crossed*.
        arity(3)
        val (a, b) = (args(1), args(2))
        def secondsDiv(n: Long): Column =
          floor(unix_timestamp(b) / n) - floor(unix_timestamp(a) / n)
        datePart(raw(0)) match {
          case "year" => (year(b) - year(a)).cast(LongType)
          case "quarter" => ((year(b) * 4 + quarter(b)) - (year(a) * 4 + quarter(a))).cast(LongType)
          case "month" => ((year(b) * 12 + month(b)) - (year(a) * 12 + month(a))).cast(LongType)
          // epoch day 0 = Thursday; +4 aligns week boundaries to Sunday
          case "week" => floor((unix_date(to_date(b)) + 4) / 7) - floor((unix_date(to_date(a)) + 4) / 7)
          case "day" => datediff(to_date(b), to_date(a)).cast(LongType)
          case "hour" => secondsDiv(3600L)
          case "minute" => secondsDiv(60L)
          case "second" => unix_timestamp(b) - unix_timestamp(a)
          case p => throw new ExprParseException(s"DATEDIFF: unsupported datepart $p")
        }
      case "DATEPART" =>
        arity(2)
        datePart(raw(0)) match {
          case "year" => year(args(1))
          case "quarter" => quarter(args(1))
          case "month" => month(args(1))
          case "week" => weekofyear(args(1))
          case "day" => dayofmonth(args(1))
          case "dayofyear" => dayofyear(args(1))
          case "weekday" => dayofweek(args(1))
          case "hour" => hour(args(1))
          case "minute" => minute(args(1))
          case "second" => second(args(1))
          case p => throw new ExprParseException(s"DATEPART: unsupported datepart $p")
        }
      case "DAY" => arity(1); dayofmonth(args(0))
      case "MONTH" => arity(1); month(args(0))
      case "YEAR" => arity(1); year(args(0))

      // ---- null handling ----
      case "ISNULL" => arity(1); args(0).isNull // boolean! (see scaladoc)
      case "REPLACENULL" => arity(2); coalesce(args(0), args(1))

      case other => throw new ExprParseException(s"unknown function $other")
    }
  }

  /** locate with Column start position (Scala API only takes Int). */
  private def locate1(sub: Column, str: Column, from: Column): Column =
    call_function("locate", sub, str, from)

  /** SSIS TOKEN/TOKENCOUNT: split on ANY character in `delims`, empty
    * tokens are skipped. Delimiters must be a string literal (they form
    * the regex character class at compile time). */
  private def tokens(s: Column, delims: Expr): Column = delims match {
    case StrLit(d) =>
      val cls = "[" + java.util.regex.Pattern.quote(d) + "]"
      filter(split(s, cls), t => t =!= lit(""))
    case _ => throw new ExprParseException("TOKEN delimiters must be a string literal")
  }

  private def datePart(e: Expr): String = e match {
    case StrLit(p) => p.toLowerCase match {
      case "year" | "yyyy" | "yy" => "year"
      case "quarter" | "qq" | "q" => "quarter"
      case "month" | "mm" | "m" => "month"
      case "week" | "wk" | "ww" => "week"
      case "day" | "dd" | "d" => "day"
      case "dayofyear" | "dy" | "y" => "dayofyear"
      case "weekday" | "dw" => "weekday"
      case "hour" | "hh" => "hour"
      case "minute" | "mi" | "n" => "minute"
      case "second" | "ss" | "s" => "second"
      case other => other
    }
    case _ => throw new ExprParseException("datepart must be a string literal")
  }
}
