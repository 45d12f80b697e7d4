package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-log-line parsing — the Spark re-expression of the
  * reference's log transforms (SURVEY.md §2k T3 unittest/mozlog parse,
  * T4 perfherder extract): filter the marker lines out of a raw text
  * column, split/decode fields, drop malformed rows to a quarantine
  * instead of erroring (JX: bad input -> missing, never raise).
  *
  * All parsing is builtin column ops (split / regexp_extract / from_json
  * / try_cast) so it is codegen'd and runs scan-local — the 100 TB cost
  * is one pass over the log bytes with predicate pushdown on the marker
  * prefix.
  */
object LogParse {

  /** Parse `PREFIX|field|field|...` delimited lines into typed columns.
    * Rows that do not start with the prefix, or whose fields fail their
    * casts, yield nulls (quarantine with `isMalformed`). */
  def parseDelimited(lines: DataFrame, line: Column, prefix: String,
                     fields: Seq[(String, DataType)]): DataFrame = {
    val parts = split(regexp_replace(line,
      "^" + java.util.regex.Pattern.quote(prefix + "|"), ""), "\\|")
    val cols = fields.zipWithIndex.map { case ((name, dt), i) =>
      element_at(parts, i + 1).try_cast(dt).as(name)
    }
    lines
      .filter(line.startsWith(prefix + "|"))
      .select(cols.toIndexedSeq: _*)
  }

  /** Extract JSON payloads embedded after a marker (perfherder-style
    * `MARKER: {json}` lines) and decode with an explicit schema. */
  def parseMarkedJson(lines: DataFrame, line: Column, marker: String,
                      schema: DataType): DataFrame = {
    val payload = regexp_extract(line,
      java.util.regex.Pattern.quote(marker) + ":?\\s*(\\{.*\\})$", 1)
    lines
      .filter(line.contains(marker))
      .select(from_json(payload, schema).as("payload"))
      .select(col("payload.*"))
  }

  /** Malformed-input quarantine flag for a parsed frame: true when every
    * parsed field is null (the JX missing-not-error discipline). */
  def isMalformed(parsed: Seq[Column]): Column =
    parsed.map(_.isNull).reduce(_ && _)

  /** JSON scrub (SURVEY.md §2j; public repo `vendor/mo_json/__init__.py`
    * `scrub`): tolerate the dirt real logs carry — bare NaN / Infinity /
    * -Infinity tokens (invalid JSON, emitted by careless float
    * serializers) become null, and raw control characters (also invalid
    * inside JSON) become spaces. Pure regexp_replace chain: codegen'd,
    * row-local, scan-speed at any scale. */
  def scrubJsonLine(line: Column): Column = {
    val noNan = regexp_replace(line,
      "(?<=[:,\\[\\s])(NaN|-?Infinity)(?=[\\s,}\\]]|$)", "null")
    regexp_replace(noNan, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", " ")
  }

  /** Lenient JSON-lines decode: scrub, then PERMISSIVE from_json —
    * lines that are still broken yield an all-null row (quarantine via
    * [[isMalformed]]), never an error. */
  def parseJsonLenient(lines: DataFrame, line: Column,
                       schema: StructType): DataFrame =
    lines.select(from_json(scrubJsonLine(line), schema,
        Map("mode" -> "PERMISSIVE")).as("payload"))
      .select(col("payload.*"))

  /** lcov-style sectioned records (SURVEY.md §2k T5 grcov/gcov): input is
    * one row per `(file marker line | data line)` pair list:
    * `SF:<name>` opens a section, `DA:<line>,<hits>` adds a datum. The
    * caller supplies the section key per row (e.g. carried through the
    * producing explode); this parses the DA payload and aggregates
    * per-section coverage: lines total, lines covered, coverage ratio. */
  def coverageFromDaLines(rows: DataFrame, sectionKey: Column,
                          line: Column): DataFrame = {
    val parts = split(regexp_replace(line, "^DA:", ""), ",")
    rows
      .filter(line.startsWith("DA:"))
      .select(sectionKey.as("source_file"),
        element_at(parts, 1).try_cast(IntegerType).as("line_no"),
        element_at(parts, 2).try_cast(LongType).as("hits"))
      .filter(col("line_no").isNotNull)
      .groupBy(col("source_file"))
      .agg(count(lit(1)).as("lines_total"),
           sum(when(col("hits") > 0, 1L).otherwise(0L)).as("lines_covered"),
           round(sum(when(col("hits") > 0, 1L).otherwise(0L))
             .cast(DoubleType) / count(lit(1)), 6).as("coverage"))
  }
}
