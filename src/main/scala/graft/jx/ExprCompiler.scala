package graft.jx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Expr._

/** Compiles a JX [[Expr]] to a Spark Catalyst [[Column]] tree.
  *
  * This replaces the reference's per-op `to_python` compilers (public repo
  * `vendor/jx_python/expressions/` per-op files, SURVEY.md §2b P4) with a pure
  * Expr -> Column function: no custom Catalyst `Expression`s are needed —
  * every JX op composes from codegen'd builtins (SURVEY.md §4 verdict), so
  * the whole compiled tree stays inside whole-stage codegen.
  *
  * JX null-semantics encapsulation (SURVEY.md §7 "what's hard"):
  *  - [[missing]] treats SQL null, empty string and empty array as missing;
  *  - boolean context coerces missing -> false ([[toBool]]);
  *  - `eq` is null-safe (`<=>`);
  *  - variadic add/mult/max/min ignore missing operands, yield `default`
  *    only when ALL operands are missing;
  *  - div/mod by zero -> null (`try_divide`/`try_mod`), casts -> `try_cast`,
  *    so compiled plans are ANSI-mode-safe.
  */
class ExprCompiler(schema: StructType) {

  /** Rough JX type of an expression, for missing-semantics decisions. */
  private sealed trait Kind
  private case object KStr extends Kind
  private case object KNum extends Kind
  private case object KBool extends Kind
  private case object KArr extends Kind
  private case object KTime extends Kind
  private case object KOther extends Kind

  private def dtKind(dt: DataType): Kind = dt match {
    case StringType                       => KStr
    case _: NumericType                   => KNum
    case BooleanType                      => KBool
    case _: ArrayType                     => KArr
    case TimestampType | DateType         => KTime
    case _                                => KOther
  }

  /** Resolve the Spark type of a dot-path against the schema, digging
    * through structs. None when the path doesn't exist (JX: missing). */
  def pathType(path: String): Option[DataType] = {
    def dig(dt: DataType, parts: List[String]): Option[DataType] =
      (dt, parts) match {
        case (t, Nil) => Some(t)
        case (s: StructType, p :: rest) =>
          s.fields.find(_.name == p).flatMap(f => dig(f.dataType, rest))
        case _ => None
      }
    dig(schema, path.split('.').toList)
  }

  private def kindOf(e: Expr): Kind = e match {
    case Var(p)         => pathType(p).map(dtKind).getOrElse(KOther)
    case Lit(_: String) => KStr
    case Lit(_: java.lang.Long) | Lit(_: java.lang.Double) => KNum
    case Lit(_: java.lang.Boolean) => KBool
    case Lit(_: Seq[_]) => KArr
    case DateLit(_)     => KTime
    case _: And | _: Or | _: Not | _: Cmp | _: In | _: BetweenNum |
        _: Missing | _: Exists | _: Prefix | _: Suffix | _: RegexMatch |
        _: IsKind => KBool
    case _: Arith | _: Bin | _: Round | _: FloorD | _: Abs | _: StrLen |
        _: Find | _: Unix | RowNum => KNum
    case _: BetweenStr | _: StrLeft | _: StrRight | _: StrNotLeft |
        _: StrNotRight | _: ConcatOp => KStr
    case _: SplitOp     => KArr
    case FromUnix(_)    => KTime
    case CastOp(k, _)   => k match {
      case "number"  => KNum
      case "integer" => KNum
      case "string"  => KStr
      case "boolean" => KBool
      case _         => KOther
    }
    case When(_, t, e2) =>
      val kt = kindOf(t); if (kt != KOther) kt else kindOf(e2)
    case Case(ws, els)  =>
      (ws.map(_._2) :+ els).map(kindOf).find(_ != KOther).getOrElse(KOther)
    case Coalesce(ts)   =>
      ts.map(kindOf).find(_ != KOther).getOrElse(KOther)
    case _ => KOther
  }

  /** Var that exists in the schema -> col; otherwise JX missing -> null. */
  private def varCol(path: String): Column =
    if (path == ".") struct(schema.fieldNames.map(col).toIndexedSeq: _*)
    else pathType(path) match {
      case Some(_) => col(path)
      case None    => lit(null)
    }

  /** JX missing(x): null, empty string, or empty array. */
  def missing(e: Expr): Column = e match {
    case Lit(null) => lit(true)
    case Lit(s: String) => lit(s.isEmpty)
    case Lit(_) => lit(false)
    case DateLit(_) => lit(false)
    case Var(p) if pathType(p).isEmpty => lit(true)
    case _ =>
      val c = compile(e)
      kindOf(e) match {
        case KStr => c.isNull || c === lit("")
        case KArr => c.isNull || size(c) === 0
        case _    => c.isNull
      }
  }

  /** JX boolean coercion: missing -> false (no 3VL UNKNOWN). Use in
    * VALUE context (select output, window guards, bucket whens). */
  def toBool(e: Expr): Column = coalesce(compile(e), lit(false))

  /** Boolean for FILTER context. Spark's Filter drops null-condition
    * rows, which IS the JX missing->false rule, so the raw predicate is
    * equivalent there — and unlike `coalesce(pred, false)` it stays
    * pushable into the parquet scan (predicate pushdown at 100 TB is
    * the difference between reading a partition and reading the lake).
    * AND/OR recurse (3VL null ≡ false at the filter boundary by
    * induction); ops with value-context semantics (not, when) coerce
    * internally via [[toBool]]. */
  def filterBool(e: Expr): Column = e match {
    case Expr.And(ts) =>
      ts.map(filterBool).reduceOption(_ && _).getOrElse(lit(true))
    case Expr.Or(ts) =>
      ts.map(filterBool).reduceOption(_ || _).getOrElse(lit(false))
    case other => compile(other)
  }

  /** Null-out empty strings so string ops see JX-missing as null. */
  private def strOf(e: Expr): Column = {
    val c = compile(e).cast(StringType)
    nullif(c, lit(""))
  }

  def compile(e: Expr): Column = e match {
    case Lit(null)        => lit(null)
    case Lit(v: Seq[_])   => array(v.map(x => lit(x)).toIndexedSeq: _*)
    case Lit(v)           => lit(v)
    case Var(p)           => varCol(p)
    case DateLit(spec)    => lit(RelDate.parseTimestamp(spec))
    case Tup(items)       => struct(items.map(compile).toIndexedSeq: _*)
    case Rows(_, _) | RowNum =>
      throw new IllegalStateException(
        "rows/rownum are window-relative; only valid inside a window clause")

    case And(ts) =>
      ts.map(toBool).reduceOption(_ && _).getOrElse(lit(true))
    case Or(ts) =>
      ts.map(toBool).reduceOption(_ || _).getOrElse(lit(false))
    case Not(t) => !toBool(t)

    case Cmp("eq", l, r)  => compile(l) <=> compile(r)
    case Cmp("ne", l, r)  => !(compile(l) <=> compile(r))
    case Cmp("gt", l, r)  => compile(l) > compile(r)
    case Cmp("gte", l, r) => compile(l) >= compile(r)
    case Cmp("lt", l, r)  => compile(l) < compile(r)
    case Cmp("lte", l, r) => compile(l) <= compile(r)
    case Cmp(op, _, _) =>
      throw new IllegalArgumentException(s"bad cmp op: $op")

    case In(v, set) => compile(v).isin(set: _*)
    case BetweenNum(v, lo, hi) =>
      compile(v).between(compile(lo), compile(hi))
    case BetweenStr(v, pre, suf) =>
      // substring strictly between prefix and suffix, or null
      val s = strOf(v)
      val start = locate(pre, s) // 1-based; 0 = absent
      val afterPre = start + lit(pre.length)
      val end = locate(suf, s, afterPre)
      when(start > 0 && end > 0,
           s.substr(afterPre, end - afterPre)).otherwise(lit(null))

    case When(c, t, els) =>
      when(toBool(c), compile(t)).otherwise(compile(els))
    case Case(whens, els) =>
      whens.foldRight(compile(els)) { case ((c, t), acc) =>
        when(toBool(c), compile(t)).otherwise(acc)
      }
    case Coalesce(ts) =>
      // JX coalesce skips missing (incl. empty string for string kinds)
      val cs = ts.map { t =>
        kindOf(t) match {
          case KStr => nullif(compile(t).cast(StringType), lit(""))
          case _    => compile(t)
        }
      }
      coalesce(cs.toIndexedSeq: _*)

    case Missing(t) => missing(t)
    case Exists(t)  => !missing(t)

    case Arith(op, ts, default) =>
      val d = default.map(compile).getOrElse(lit(null))
      val allMissing = ts.map(missing).reduce(_ && _)
      val combined = op match {
        case "add" =>
          ts.map(t => coalesce(compile(t).cast(DoubleType), lit(0.0)))
            .reduce(_ + _)
        case "mult" =>
          ts.map(t => coalesce(compile(t).cast(DoubleType), lit(1.0)))
            .reduce(_ * _)
        case "max" => greatest(ts.map(compile).toIndexedSeq: _*)
        case "min" => least(ts.map(compile).toIndexedSeq: _*)
        case o => throw new IllegalArgumentException(s"bad arith op: $o")
      }
      when(allMissing, d).otherwise(combined)

    case Bin("sub", l, r) => compile(l) - compile(r)
    case Bin("div", l, r) => try_divide(compile(l), compile(r))
    case Bin("mod", l, r) => try_mod(compile(l), compile(r))
    case Bin("exp", l, r) => pow(compile(l), compile(r))
    case Bin(op, _, _) =>
      throw new IllegalArgumentException(s"bad binary op: $op")

    case Round(t, d)  => round(compile(t), d)
    case FloorD(t, 0) => floor(compile(t))
    case FloorD(t, d) =>
      // floor to a multiple of 10^-d (JX floor-with-digits)
      val scale = math.pow(10, d)
      floor(compile(t) * lit(scale)) / lit(scale)
    case Abs(t) => abs(compile(t))

    case StrLen(t) => length(strOf(t))
    case StrLeft(t, n) =>
      val c = strOf(t); c.substr(lit(1), greatest(compile(n), lit(0)))
    case StrRight(t, n) =>
      val c = strOf(t); val k = greatest(compile(n), lit(0))
      c.substr(greatest(length(c) - k + 1, lit(1)), k)
    case StrNotLeft(t, n) =>
      val c = strOf(t); val k = greatest(compile(n), lit(0))
      c.substr(k + 1, greatest(length(c) - k, lit(0)))
    case StrNotRight(t, n) =>
      val c = strOf(t); val k = greatest(compile(n), lit(0))
      c.substr(lit(1), greatest(length(c) - k, lit(0)))
    case ConcatOp(ts, sep) =>
      // JX concat skips missing terms entirely
      concat_ws(sep, ts.map(t => strOf(t)).toIndexedSeq: _*)
    case Prefix(t, p)  => strOf(t).startsWith(compile(p))
    case Suffix(t, s)  => strOf(t).endsWith(compile(s))
    case Find(t, sub) =>
      // 0-based index or null (JX find); locate is 1-based, 0 when absent
      val idx = locate_expr(compile(sub), strOf(t))
      when(idx > 0, idx - 1).otherwise(lit(null))
    case SplitOp(t, sep) =>
      split(strOf(t), java.util.regex.Pattern.quote(sep))
    case RegexMatch(t, pattern) =>
      strOf(t).rlike(s"^(?:$pattern)$$")

    case CastOp("number", t)  => try_cast_double(compile(t))
    case CastOp("integer", t) => try_cast(compile(t), LongType)
    case CastOp("string", t)  => compile(t).cast(StringType)
    case CastOp("boolean", t) => try_cast(compile(t), BooleanType)
    case CastOp(k, _) =>
      throw new IllegalArgumentException(s"bad cast kind: $k")
    case IsKind(k, t) =>
      val c = compile(t)
      k match {
        case "number"  => try_cast_double(c).isNotNull
        case "string"  => c.cast(StringType).isNotNull
        case "boolean" => try_cast(c, BooleanType).isNotNull
        case other => throw new IllegalArgumentException(s"is_$other?")
      }

    case Unix(t)     => unix_timestamp(compile(t)).cast(DoubleType)
    case FromUnix(t) => timestamp_seconds(compile(t))

    case Leaves(_) =>
      throw new IllegalStateException(
        "leaves is a projection form; handled by the select planner")
    case Items(t) =>
      // object -> [{name, value}] (JX items). Struct fields need a
      // common value type: stringify (JX values are dynamically typed;
      // string is the lossless common form). Maps use map_entries.
      t match {
        case Var(p) => pathType(p) match {
          case Some(st: StructType) =>
            array(st.fields.toIndexedSeq.map { f =>
              struct(lit(f.name).as("name"),
                     col(s"$p.${f.name}").cast(StringType).as("value"))
            }: _*)
          case Some(_: MapType) => map_entries(compile(t))
          case other => throw new IllegalArgumentException(
            s"items needs an object column, got $other at $p")
        }
        case _ => map_entries(compile(t))
      }
    case GetOp(obj, key) => key match {
      // JSON integers parse as long; element_at wants an int index
      case Lit(i: java.lang.Long) => element_at(compile(obj), lit(i.intValue))
      case _ => element_at(compile(obj), compile(key))
    }
  }

  // --- small wrappers over SQL functions not exposed (or awkward) in the
  //     Scala functions API ---

  private def locate(sub: String, in: Column): Column =
    expr_call("locate", lit(sub), in)
  private def locate(sub: String, in: Column, from: Column): Column =
    expr_call("locate", lit(sub), in, from)
  private def locate_expr(sub: Column, in: Column): Column =
    expr_call("locate", sub, in)
  private def try_mod(l: Column, r: Column): Column =
    expr_call("try_mod", l, r)
  private def try_cast_double(c: Column): Column =
    try_cast(c, DoubleType)
  private def try_cast(c: Column, dt: DataType): Column =
    c.try_cast(dt)
  private def expr_call(fn: String, args: Column*): Column =
    call_function(fn, args: _*)
}

object ExprCompiler {
  def apply(df: DataFrame): ExprCompiler = new ExprCompiler(df.schema)
}
