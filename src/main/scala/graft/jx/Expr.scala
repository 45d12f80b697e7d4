package graft.jx

/** JX ("JSON Query Expressions") expression AST.
  *
  * Mirrors the operator set of the reference's vendored expression language
  * (public mozilla/ActiveData-ETL `vendor/jx_base/expressions.py` — see
  * SURVEY.md §2i; reference checkout empty this round, citations are to the
  * public repo structure).  This is the *logical* language only — compilation
  * to Spark Catalyst `Column`s lives in [[ExprCompiler]].
  *
  * JX null ("missing") semantics differ from SQL 3VL and are the heart of the
  * language (SURVEY.md §7 hard parts):
  *   - `missing(x)` is true for SQL NULL, empty string, and empty array.
  *   - booleans coerce missing -> false (no UNKNOWN).
  *   - `eq` is null-safe (eq(null,null) = true).
  *   - variadic arithmetic (`add`,`mult`,`max`,`min`) IGNORES missing
  *     operands and returns `default` (or null) only when ALL are missing.
  *   - strict binary ops (`sub`,`div`,`mod`,`exp`) propagate null; div/mod
  *     by zero -> null, never an error.
  */
sealed trait Expr

object Expr {
  /** value: null | java.lang.Boolean | java.lang.Long | java.lang.Double |
    * String | Seq[Any] */
  final case class Lit(value: Any) extends Expr
  /** Dot-path variable; "." = whole row. Missing paths compile to null. */
  final case class Var(path: String) extends Expr
  final case class Tup(items: Seq[Expr]) extends Expr
  /** Window-relative row access {"rows":[v, offset]} -> lag/lead. */
  final case class Rows(value: Expr, offset: Int) extends Expr
  /** Implicit window ordinal. */
  case object RowNum extends Expr

  final case class And(terms: Seq[Expr]) extends Expr
  final case class Or(terms: Seq[Expr]) extends Expr
  final case class Not(term: Expr) extends Expr

  /** op in eq|ne|gt|gte|lt|lte */
  final case class Cmp(op: String, l: Expr, r: Expr) extends Expr
  final case class In(value: Expr, set: Seq[Any]) extends Expr
  final case class BetweenNum(value: Expr, lo: Expr, hi: Expr) extends Expr
  /** JX string-`between`: extract substring strictly between prefix and
    * suffix; null when either bound is absent from the input. */
  final case class BetweenStr(value: Expr, prefix: String, suffix: String)
      extends Expr

  final case class When(cond: Expr, thn: Expr, els: Expr) extends Expr
  final case class Case(whens: Seq[(Expr, Expr)], els: Expr) extends Expr
  final case class Coalesce(terms: Seq[Expr]) extends Expr
  final case class Missing(term: Expr) extends Expr
  final case class Exists(term: Expr) extends Expr

  /** Variadic, null-ignoring: op in add|mult|max|min. */
  final case class Arith(op: String, terms: Seq[Expr], default: Option[Expr])
      extends Expr
  /** Strict binary: op in sub|div|mod|exp. div/mod-by-zero -> null. */
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Round(term: Expr, digits: Int) extends Expr
  final case class FloorD(term: Expr, digits: Int) extends Expr
  final case class Abs(term: Expr) extends Expr

  final case class StrLen(term: Expr) extends Expr
  final case class StrLeft(term: Expr, n: Expr) extends Expr
  final case class StrRight(term: Expr, n: Expr) extends Expr
  /** Everything but the first n chars. */
  final case class StrNotLeft(term: Expr, n: Expr) extends Expr
  /** Everything but the last n chars. */
  final case class StrNotRight(term: Expr, n: Expr) extends Expr
  final case class ConcatOp(terms: Seq[Expr], separator: String) extends Expr
  final case class Prefix(term: Expr, prefix: Expr) extends Expr
  final case class Suffix(term: Expr, suffix: Expr) extends Expr
  /** 0-based index of substring, or null when absent (JX `find`). */
  final case class Find(term: Expr, substring: Expr) extends Expr
  final case class SplitOp(term: Expr, separator: String) extends Expr
  /** Anchored full match (JX `regex`). */
  final case class RegexMatch(term: Expr, pattern: String) extends Expr

  /** kind in number|integer|string|boolean — null on failed cast. */
  final case class CastOp(kind: String, term: Expr) extends Expr
  final case class IsKind(kind: String, term: Expr) extends Expr

  /** {"date":"today-7day"} relative/absolute date literal (UTC). */
  final case class DateLit(spec: String) extends Expr
  /** timestamp -> unix seconds (double). */
  final case class Unix(term: Expr) extends Expr
  /** unix seconds -> timestamp. */
  final case class FromUnix(term: Expr) extends Expr

  /** Flatten all leaf columns under prefix ("." = all). */
  final case class Leaves(prefix: String) extends Expr
  /** Object -> array of {name, value} pairs (JX `items`); values
    * stringified when the object's fields have mixed types. */
  final case class Items(term: Expr) extends Expr
  final case class GetOp(obj: Expr, key: Expr) extends Expr
}
