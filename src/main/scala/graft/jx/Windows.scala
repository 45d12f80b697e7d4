package graft.jx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** JX `window` clause -> Spark window functions (SURVEY.md §2f; public repo
  * `vendor/jx_python/jx.py` window(), `jx_python/windows.py`).
  *
  * Mapping: edges -> partitionBy, sort -> orderBy, range{min,max} ->
  * rowsBetween, absent range + aggregate -> whole-partition frame,
  * rownum -> row_number, {"rows":[v,off]} -> lag/lead. All are native
  * Spark `WindowExec` — sort-based, spillable, scales per-partition.
  */
object Windows {

  def apply(df: DataFrame, w: WindowClause): DataFrame = {
    val compiler = ExprCompiler(df)

    val partCols = w.edges.map(compiler.compile)
    val sortCols = w.sort.map { s =>
      val c = compiler.compile(s.value)
      if (s.descending) c.desc_nulls_last else c.asc_nulls_first
    }
    var spec = Window.partitionBy(partCols.toIndexedSeq: _*)
    if (sortCols.nonEmpty) spec = spec.orderBy(sortCols.toIndexedSeq: _*)

    val out: Column = (w.value, w.aggregate) match {
      case (Some(Expr.Rows(v, off)), _) =>
        val c = compiler.compile(v)
        if (off <= 0) lag(c, -off).over(spec) else lead(c, off).over(spec)
      case (Some(Expr.RowNum), _) | (None, Some("rownum")) =>
        (row_number().over(spec) - 1) // JX rownum is 0-based
      case (valueOpt, Some(agg)) =>
        val framed = w.range match {
          case Some((mn, mx)) =>
            spec.rowsBetween(mn.getOrElse(Window.unboundedPreceding),
                             mx.getOrElse(Window.unboundedFollowing))
          case None =>
            // JX: no range -> aggregate over the whole partition even
            // when sorted (cumulative needs an explicit range {max: 0})
            spec.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
        }
        val base = valueOpt.map(compiler.compile)
        val guarded = w.where match {
          case Some(cond) =>
            Some(when(compiler.toBool(cond),
                      base.getOrElse(lit(1))).otherwise(lit(null)))
          case None => base
        }
        Aggs.aggColumn(agg, guarded.map(c =>
          Aggs.castForAgg(agg, c)), None).over(framed)
      case (Some(v), None) =>
        compiler.compile(v) // plain per-row value (no frame)
      case (None, None) =>
        throw new IllegalArgumentException(
          s"window ${w.name} needs a value or aggregate")
    }
    df.withColumn(w.name, out)
  }
}
