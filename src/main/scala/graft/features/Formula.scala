package graft.features

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal arithmetic/conditional expression AST for feature formulas.
  *
  * One definition renders to BOTH a Catalyst `Column` and ANSI SQL text
  * (DuckDB oracle), guaranteeing the two engines evaluate the *same* IEEE
  * double expression tree in the same order — which is what makes the
  * driver's hash compare (and the north rule's allclose) hold bit-for-bit
  * without any rounding fudge.
  *
  * Only the operations the reference's feature layers use exist here
  * (`/root/reference/LR_Model_train/LR_Advanced.py:394-473`): +,-,*,/ on
  * doubles, literals, greatest, abs, and right-closed conditional chains.
  */
sealed trait Ex {
  def +(o: Ex): Ex = Bin("+", this, o)
  def -(o: Ex): Ex = Bin("-", this, o)
  def *(o: Ex): Ex = Bin("*", this, o)
  def /(o: Ex): Ex = Bin("/", this, o)
  def >(o: Ex): Cond = Cmp(">", this, o)
  def <=(o: Ex): Cond = Cmp("<=", this, o)
}
final case class Ref(name: String) extends Ex           // column or earlier feature
final case class Lit(v: Double) extends Ex              // double literal
final case class LitI(v: Int) extends Ex                // integer literal
final case class Bin(op: String, a: Ex, b: Ex) extends Ex
final case class GreatestOf(xs: Seq[Ex]) extends Ex
final case class AbsOf(x: Ex) extends Ex
final case class CaseOf(branches: Seq[(Cond, Ex)], default: Ex) extends Ex

sealed trait Cond
final case class Cmp(op: String, a: Ex, b: Ex) extends Cond

object Formula {

  /** Render to a Catalyst Column; `resolve` maps a Ref to its expansion
    * (earlier features are inlined so evaluation order is frozen). */
  def toColumn(e: Ex, resolve: String => Ex): Column = e match {
    case Ref(n)   => resolve(n) match {
      case Ref(base) if base == n => col(n).cast("double")
      case other                  => toColumn(other, resolve)
    }
    case Lit(v)   => lit(v)
    case LitI(v)  => lit(v)
    case Bin(op, a, b) =>
      val (x, y) = (toColumn(a, resolve), toColumn(b, resolve))
      op match { case "+" => x + y; case "-" => x - y; case "*" => x * y; case "/" => x / y }
    case GreatestOf(xs) => greatest(xs.map(toColumn(_, resolve)): _*)
    case AbsOf(x)       => abs(toColumn(x, resolve))
    case CaseOf(bs, d)  =>
      val first = when(toCond(bs.head._1, resolve), toColumn(bs.head._2, resolve))
      bs.tail.foldLeft(first) { case (acc, (c, v)) =>
        acc.when(toCond(c, resolve), toColumn(v, resolve))
      }.otherwise(toColumn(d, resolve))
  }

  private def toCond(c: Cond, resolve: String => Ex): Column = c match {
    case Cmp(">", a, b)  => toColumn(a, resolve) > toColumn(b, resolve)
    case Cmp("<=", a, b) => toColumn(a, resolve) <= toColumn(b, resolve)
    case Cmp(op, _, _)   => throw new IllegalArgumentException(op)
  }

  /** Render to SQL text (DuckDB-compatible ANSI). Fully parenthesized so
    * associativity is identical to the Column form. */
  def toSql(e: Ex, resolve: String => Ex): String = e match {
    case Ref(n) => resolve(n) match {
      case Ref(base) if base == n => s"CAST($n AS DOUBLE)"
      case other                  => toSql(other, resolve)
    }
    case Lit(v)  => s"CAST($v AS DOUBLE)"
    case LitI(v) => v.toString
    case Bin(op, a, b)  => s"(${toSql(a, resolve)} $op ${toSql(b, resolve)})"
    case GreatestOf(xs) => xs.map(toSql(_, resolve)).mkString("GREATEST(", ", ", ")")
    case AbsOf(x)       => s"ABS(${toSql(x, resolve)})"
    case CaseOf(bs, d) =>
      bs.map { case (c, v) => s"WHEN ${condSql(c, resolve)} THEN ${toSql(v, resolve)}" }
        .mkString("CASE ", " ", s" ELSE ${toSql(d, resolve)} END")
  }

  private def condSql(c: Cond, resolve: String => Ex): String = c match {
    case Cmp(op, a, b) => s"(${toSql(a, resolve)} $op ${toSql(b, resolve)})"
  }

  /** Column/feature names a formula reads (for dependency leveling). */
  def refsOf(e: Ex): Set[String] = e match {
    case Ref(n)         => Set(n)
    case Bin(_, a, b)   => refsOf(a) ++ refsOf(b)
    case GreatestOf(xs) => xs.flatMap(refsOf).toSet
    case AbsOf(x)       => refsOf(x)
    case CaseOf(bs, d)  =>
      bs.flatMap { case (c, v) => condRefs(c) ++ refsOf(v) }.toSet ++ refsOf(d)
    case _              => Set.empty
  }

  private def condRefs(c: Cond): Set[String] = c match {
    case Cmp(_, a, b) => refsOf(a) ++ refsOf(b)
  }
}
