package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import scala.util.Random
import Expr._

/** Property test: random SSIS expression ASTs → rendered text → parsed →
  * compiled → evaluated by Spark, compared against a direct Scala
  * interpreter of the same AST. Catches precedence/associativity/
  * rendering bugs the example-based spec can't.
  */
class ExprPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- random AST generation (ints kept small: ANSI mode overflows are errors) ----
  sealed trait Ty; case object TInt extends Ty; case object TBool extends Ty; case object TStr extends Ty

  def genExpr(rng: Random, ty: Ty, depth: Int): Expr = {
    if (depth <= 0) ty match {
      case TInt => IntLit(rng.nextInt(10))
      case TBool => BoolLit(rng.nextBoolean())
      case TStr => StrLit(rng.alphanumeric.take(rng.nextInt(4)).mkString)
    } else ty match {
      case TInt => rng.nextInt(6) match {
        case 0 => Binary("+", genExpr(rng, TInt, depth - 1), genExpr(rng, TInt, depth - 1))
        case 1 => Binary("-", genExpr(rng, TInt, depth - 1), genExpr(rng, TInt, depth - 1))
        case 2 => Binary("*", genExpr(rng, TInt, depth - 1), genExpr(rng, TInt, depth - 1))
        case 3 => Ternary(genExpr(rng, TBool, depth - 1),
                          genExpr(rng, TInt, depth - 1), genExpr(rng, TInt, depth - 1))
        case 4 => Unary("-", genExpr(rng, TInt, depth - 1))
        case _ => IntLit(rng.nextInt(10))
      }
      case TBool => rng.nextInt(7) match {
        case 0 => Binary("&&", genExpr(rng, TBool, depth - 1), genExpr(rng, TBool, depth - 1))
        case 1 => Binary("||", genExpr(rng, TBool, depth - 1), genExpr(rng, TBool, depth - 1))
        case 2 => Unary("!", genExpr(rng, TBool, depth - 1))
        case 3 => Binary("==", genExpr(rng, TInt, depth - 1), genExpr(rng, TInt, depth - 1))
        case 4 => Binary("<", genExpr(rng, TInt, depth - 1), genExpr(rng, TInt, depth - 1))
        case 5 => Binary(">=", genExpr(rng, TInt, depth - 1), genExpr(rng, TInt, depth - 1))
        case _ => BoolLit(rng.nextBoolean())
      }
      case TStr => rng.nextInt(3) match {
        case 0 => Binary("+", genExpr(rng, TStr, depth - 1), genExpr(rng, TStr, depth - 1))
        case 1 => Ternary(genExpr(rng, TBool, depth - 1),
                          genExpr(rng, TStr, depth - 1), genExpr(rng, TStr, depth - 1))
        case _ => StrLit(rng.alphanumeric.take(rng.nextInt(4)).mkString)
      }
    }
  }

  /** Render with NO parentheses beyond what precedence requires is hard;
    * render fully parenthesized for binaries, bare for the rest — the
    * parser must reconstruct the same tree. */
  def render(e: Expr): String = e match {
    case IntLit(v) => v.toString
    case BoolLit(v) => if (v) "TRUE" else "FALSE"
    case StrLit(v) => "\"" + v + "\""
    case Unary(op, c) => op + "(" + render(c) + ")"
    case Binary(op, l, r) => "(" + render(l) + " " + op + " " + render(r) + ")"
    case Ternary(c, t, f) => "(" + render(c) + " ? " + render(t) + " : " + render(f) + ")"
    case other => sys.error(s"unrenderable $other")
  }

  /** Also render a *minimally* parenthesized variant to exercise precedence. */
  def renderMin(e: Expr, parentPrec: Int): String = {
    def prec(op: String): Int = op match {
      case "||" => 1; case "&&" => 2; case "==" | "!=" => 3
      case "<" | ">" | "<=" | ">=" => 4
      case "+" | "-" => 5; case "*" => 6; case _ => 9
    }
    e match {
      case IntLit(v) => v.toString
      case BoolLit(v) => if (v) "TRUE" else "FALSE"
      case StrLit(v) => "\"" + v + "\""
      case Unary(op, c) => op + renderMin(c, 8)
      case Binary(op, l, r) =>
        val p = prec(op)
        // left-assoc: left child at p, right child at p+1
        val s = renderMin(l, p) + " " + op + " " + renderMin(r, p + 1)
        if (p < parentPrec) "(" + s + ")" else s
      case Ternary(c, t, f) =>
        val s = renderMin(c, 1) + " ? " + renderMin(t, 0) + " : " + renderMin(f, 0)
        if (parentPrec > 0) "(" + s + ")" else s
      case other => sys.error(s"unrenderable $other")
    }
  }

  def interp(e: Expr): Any = e match {
    case IntLit(v) => v.toInt
    case BoolLit(v) => v
    case StrLit(v) => v
    case Unary("-", c) => -interp(c).asInstanceOf[Int]
    case Unary("!", c) => !interp(c).asInstanceOf[Boolean]
    case Binary(op, l, r) => (op, interp(l), interp(r)) match {
      case ("+", a: Int, b: Int) => a + b
      case ("+", a: String, b: String) => a + b
      case ("-", a: Int, b: Int) => a - b
      case ("*", a: Int, b: Int) => a * b
      case ("&&", a: Boolean, b: Boolean) => a && b
      case ("||", a: Boolean, b: Boolean) => a || b
      case ("==", a, b) => a == b
      case ("<", a: Int, b: Int) => a < b
      case (">=", a: Int, b: Int) => a >= b
      case x => sys.error(s"bad interp $x")
    }
    case Ternary(c, t, f) => if (interp(c).asInstanceOf[Boolean]) interp(t) else interp(f)
    case other => sys.error(s"uninterpretable $other")
  }

  test("500 random expressions: Spark eval == direct interpretation (both renderings)") {
    val rng = new Random(42)
    val schema = StructType(Seq(StructField("dummy", IntegerType)))
    val cases = (1 to 250).map { i =>
      val ty = Seq(TInt, TBool, TStr)(rng.nextInt(3))
      genExpr(rng, ty, 1 + rng.nextInt(4))
    }
    val texts = cases.flatMap(e => Seq(render(e), renderMin(e, 0)))
    val expected = cases.flatMap(e => Seq(interp(e), interp(e)))
    val cols = texts.zipWithIndex.map { case (t, i) =>
      Compiler.compile(t, schema).as(s"c$i")
    }
    val df = spark.createDataFrame(java.util.List.of(Row(1)), schema)
    val row = df.select(cols: _*).head
    texts.indices.foreach { i =>
      val got = row.get(i)
      assert(got == expected(i),
        s"mismatch on #$i: `${texts(i)}` spark=$got interp=${expected(i)}")
    }
  }
}
