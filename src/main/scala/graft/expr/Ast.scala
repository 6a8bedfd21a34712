package graft.expr

/** AST for the SSIS expression language.
  *
  * The reference translates this language with single-pass regex
  * substitution (/root/reference/mapping/expression_translator.py:70-172),
  * which breaks on nested ternaries and mis-handles ISNULL. We parse it
  * properly: lexer → Pratt parser → typed compiler to Catalyst Columns.
  */
sealed trait Expr

object Expr {
  final case class IntLit(v: Long) extends Expr
  final case class DoubleLit(v: Double) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  /** Typed null: NULL(DT_I4) */
  final case class TypedNull(dt: DtType) extends Expr

  /** [Col], bare Col, [Comp].Col, #{...Columns[Col]} — resolved to the
    * trailing column name (lineage prefixes are Catalyst's job). */
  final case class ColRef(name: String) extends Expr
  /** @[User::X] / @[System::X] / @X */
  final case class VarRef(namespace: String, name: String) extends Expr

  /** (DT_I4)x, (DT_STR, 50, 1252)x, (DT_NUMERIC, 18, 2)x */
  final case class Cast(dt: DtType, child: Expr) extends Expr
  final case class Unary(op: String, child: Expr) extends Expr
  final case class Binary(op: String, left: Expr, right: Expr) extends Expr
  /** cond ? t : f  (right-associative, nests arbitrarily) */
  final case class Ternary(cond: Expr, t: Expr, f: Expr) extends Expr
  final case class Call(name: String, args: Seq[Expr]) extends Expr
}

/** A DT_* cast target with its optional (length | precision, scale[, codepage]) args. */
final case class DtType(name: String, args: Seq[Int])
