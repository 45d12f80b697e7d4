package graft.jx

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JX `edges` + domains -> dense cube (SURVEY.md §2e; public repo
  * `vendor/jx_base/domains.py`, `jx_python/cubes/aggs.py`).
  *
  * Plan shape (scales to 100 TB — no driver-side collect anywhere):
  * {{{
  *   bucketed = fact.withColumn(bucket_i, bucketExpr_i ...)
  *   sparse   = bucketed.groupBy(bucket_*).agg(...)       // partial+final
  *   domain   = crossJoin of per-edge domain DFs          // tiny, broadcast
  *   dense    = domain.join(sparse, keys <=> , "left")    // broadcast-left
  * }}}
  * Domain tables are a few rows per edge (|partitions| or (max-min)/interval
  * or top-k) and the sparse side is post-aggregation (bounded by the domain
  * product), so the dense join broadcasts the sparse side and never
  * shuffles the fact table a second time. The DefaultDomain top-k is itself
  * a distributed groupBy/count/limit — two passes over the fact, zero
  * collects.
  */
object Domains {
  import DomainSpec._

  /** Bucket expression + ordered domain DataFrame for one edge.
    * Domain DF columns: value (named edge.name) + __ord for output order.
    * `membershipFromDomain` marks data-driven domains (DefaultDomain):
    * bucket values outside the domain must be nullified (into the
    * overflow partition) via a broadcast membership join — the domain is
    * data-dependent, so membership can't be a literal predicate.
    * `maxCardinality` is the STATIC upper bound on the domain size
    * (|partitions|, range steps, or DefaultDomain's top-k limit); the
    * true size may be smaller for data-driven domains — the guard in
    * [[denseCube]] counts actuals only when this bound trips. */
  final case class EdgePlan(bucket: Column, domain: DataFrame,
                            membershipFromDomain: Boolean = false,
                            maxCardinality: Int = Int.MaxValue)

  def plan(spark: SparkSession, df: DataFrame, edge: EdgeClause,
           compiler: ExprCompiler): EdgePlan = {
    val name = edge.name
    edge.domain match {
      case SetDomain(parts) =>
        val v = compiler.compile(edge.value.getOrElse(
          throw new IllegalArgumentException(s"edge $name needs a value")))
        val dt = sparkTypeOfValue(parts)
        val norm = parts.map(normalizeTo(dt, _))
        val schema = StructType(Seq(
          StructField(name, dt, nullable = true),
          StructField("__ord", IntegerType, nullable = false)))
        val domain = spark.createDataFrame(
          spark.sparkContext.parallelize(norm.zipWithIndex.map {
            case (p, i) => org.apache.spark.sql.Row(p, i)
          }, 1), schema)
        // values outside the partition list -> null bucket (overflow)
        val inSet = v.isin(parts.filter(_ != null): _*)
        EdgePlan(when(inSet, v).otherwise(lit(null)).cast(schema.head.dataType),
                 domain, maxCardinality = parts.size)

      case PredicateDomain(parts) =>
        val bucket = parts.foldRight(lit(null).cast(StringType)) {
          case ((pname, where), acc) =>
            when(compiler.toBool(where), lit(pname)).otherwise(acc)
        }
        val rows = parts.map(_._1).zipWithIndex
        val domain = spark.createDataFrame(rows).toDF(name, "__ord")
        EdgePlan(bucket, domain, maxCardinality = parts.size)

      case TimeDomain(minSpec, maxSpec, _, months) if months > 0 =>
        // calendar-aware buckets: month arithmetic, DATE-typed edges
        val v = compiler.compile(edge.value.get)
        val minDate = java.time.Instant
          .ofEpochMilli(RelDate.parseMillis(minSpec))
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
        val maxDate = java.time.Instant
          .ofEpochMilli(RelDate.parseMillis(maxSpec))
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
        val totalMonths = java.time.temporal.ChronoUnit.MONTHS
          .between(minDate, maxDate)
        val n = math.ceil(totalMonths.toDouble / months).toInt
        val minLit = lit(java.sql.Date.valueOf(minDate))
        val idx = floor(months_between(v, minLit) / months)
        val inRange =
          v >= lit(java.sql.Timestamp.valueOf(minDate.atStartOfDay)) &&
            v < lit(java.sql.Timestamp.valueOf(maxDate.atStartOfDay))
        val bucket = when(inRange,
          add_months(minLit, (idx * months).cast(IntegerType)))
          .otherwise(lit(null))
        val domain = spark.range(n.toLong).toDF("__ord")
          .select(add_months(minLit,
                    (col("__ord") * months).cast(IntegerType)).as(name),
                  col("__ord").cast(IntegerType).as("__ord"))
        EdgePlan(bucket, domain, maxCardinality = n)

      case TimeDomain(minSpec, maxSpec, intervalSec, _) =>
        val v = compiler.compile(edge.value.get)
        val minMs = RelDate.parseMillis(minSpec)
        val maxMs = RelDate.parseMillis(maxSpec)
        val stepMs = intervalSec * 1000L
        val n = math.ceil((maxMs - minMs).toDouble / stepMs).toInt
        val sec = unix_timestamp(v) // seconds
        val minSec = minMs / 1000L
        val bucketSec = (floor((sec - lit(minSec)) / lit(intervalSec)) *
          lit(intervalSec)) + lit(minSec)
        val inRange = sec >= lit(minSec) && sec < lit(maxMs / 1000L)
        val bucket = when(inRange, timestamp_seconds(bucketSec))
          .otherwise(lit(null))
        val domain = spark.range(n.toLong).toDF("__ord")
          .select(timestamp_seconds(col("__ord") * intervalSec + minSec)
                    .as(name),
                  col("__ord").cast(IntegerType).as("__ord"))
        EdgePlan(bucket, domain, maxCardinality = n)

      case RangeDomain(minV, maxV, interval) =>
        numericRange(spark, name, compiler.compile(edge.value.get),
          minV, maxV, interval)

      case DurationDomain(minSec, maxSec, intervalSec) =>
        // durations are plain seconds — the named domain shares the
        // RangeDomain bucket arithmetic (reference DurationDomain keys
        // are durations; ours are their second counts)
        numericRange(spark, name, compiler.compile(edge.value.get),
          minSec, maxSec, intervalSec)

      case DefaultDomain(limit) =>
        // two-pass, fully distributed: top-k most frequent values become
        // the domain; everything else -> null (overflow partition when
        // allowNulls). Order: frequency desc, then value, for determinism.
        val v = compiler.compile(edge.value.get)
        val freq = df.select(v.as(name)).where(col(name).isNotNull)
          .groupBy(name).count()
          .orderBy(col("count").desc, col(name))
          .limit(limit)
        // materialize the (≤ limit rows) top-k once: the domain frame
        // has THREE consumers (membership join, domain cross-join, and
        // the guard's count when the static bound trips) and each
        // would otherwise re-run the full fact aggregation — at 100 TB
        // that is two extra corpus scans per DefaultDomain edge
        val domain = freq.select(
          col(name),
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("count").desc, col(name))) - 1).as("__ord"))
          .localCheckpoint()
        // bucket = raw value; non-top-k values are nullified into the
        // overflow partition by the membership join in denseCube (JX
        // DefaultDomain lumps the remainder into the null part when
        // allowNulls; otherwise the dense join drops it).
        EdgePlan(v, domain, membershipFromDomain = true,
                 maxCardinality = limit)
    }
  }

  /** Dense numeric buckets [min, max) step interval — RangeDomain and
    * DurationDomain share this shape. */
  private def numericRange(spark: SparkSession, name: String, value: Column,
                           minV: Double, maxV: Double, interval: Double)
      : EdgePlan = {
    val v = value.cast(DoubleType)
    val n = math.ceil((maxV - minV) / interval).toInt
    val bucketExpr = floor((v - lit(minV)) / lit(interval)) *
      lit(interval) + lit(minV)
    val inRange = v >= lit(minV) && v < lit(maxV)
    val bucket = when(inRange, bucketExpr).otherwise(lit(null))
    val domain = spark.range(n.toLong).toDF("__ord")
      .select((col("__ord") * interval + minV).cast(DoubleType).as(name),
              col("__ord").cast(IntegerType).as("__ord"))
    EdgePlan(bucket, domain, maxCardinality = n)
  }

  private def sparkTypeOfValue(parts: Seq[Any]): DataType = {
    // any double => whole domain is double (JX numbers are unified)
    if (parts.exists(_.isInstanceOf[java.lang.Double])) DoubleType
    else parts.collectFirst {
      case _: String            => StringType
      case _: java.lang.Long    => LongType
      case _: java.lang.Boolean => BooleanType
    }.getOrElse(StringType)
  }

  private def normalizeTo(dt: DataType, v: Any): Any = (dt, v) match {
    case (_, null)                      => null
    case (DoubleType, l: java.lang.Long) => java.lang.Double.valueOf(l.doubleValue)
    case (StringType, other)            => other.toString
    case _                              => v
  }

  /** Execute the full edges pipeline: bucket -> sparse agg -> dense join.
    * Output columns: edge names (in order) then aggregate columns, rows
    * ordered by domain order. */
  /** One aggregate output of a query: name, aggregate column, JX
    * aggregate keyword, and the optional fill-in default. */
  final case class AggSpec(name: String, col: Column, aggregate: String,
                           default: Option[Any])

  def denseCube(spark: SparkSession, df: DataFrame, edges: Seq[EdgeClause],
                aggs: Seq[AggSpec],
                compiler: ExprCompiler): DataFrame = {
    val plans = edges.map(e => plan(spark, df, e, compiler))
    val names = edges.map(_.name)

    val bucketed0 = edges.zip(plans).foldLeft(df) { case (d, (e, p)) =>
      d.withColumn(s"__bucket_${e.name}", p.bucket)
    }
    // data-driven domains (DefaultDomain): nullify non-member buckets so
    // the remainder lands in the overflow partition — a broadcast join
    // against the (tiny, top-k) domain, no extra shuffle of the fact
    val bucketed = edges.zip(plans).foldLeft(bucketed0) {
      case (d, (e, p)) if p.membershipFromDomain =>
        val mem = s"__member_${e.name}"
        d.join(broadcast(p.domain.select(col(e.name).as(mem))),
            col(s"__bucket_${e.name}") === col(mem), "left")
          .withColumn(s"__bucket_${e.name}",
            when(col(mem).isNotNull, col(s"__bucket_${e.name}")))
          .drop(mem)
      case (d, _) => d
    }
    val sparse = bucketed
      .groupBy(names.map(n => col(s"__bucket_$n")).toIndexedSeq: _*)
      .agg(aggs.head.col.as(aggs.head.name),
           aggs.tail.map(a => a.col.as(a.name)).toIndexedSeq: _*)

    // cross-join the (tiny) domains; each keeps its __ord as __ord_<name>
    val domainAll = plans.zip(names).map { case (p, n) =>
      val d = p.domain.withColumnRenamed("__ord", s"__ord_$n")
      val withNull =
        if (edges.find(_.name == n).get.allowNulls)
          d.unionByName(
            d.sparkSession.createDataFrame(
              d.sparkSession.sparkContext.parallelize(
                Seq(org.apache.spark.sql.Row(null, Int.MaxValue)), 1),
              StructType(Seq(
                StructField(n, d.schema.head.dataType, nullable = true),
                StructField(s"__ord_$n", IntegerType, nullable = false)))))
        else d
      withNull
    }.reduce(_.crossJoin(_))

    // Dense-cube driver guard (r11 verdict ask #1): the dense result is
    // collected by Service.render/Formats.toCube and edges queries are
    // exempt from the service default limit, so the domain-cardinality
    // PRODUCT is the only bound on driver memory. Static per-edge upper
    // bounds (|partitions|, range steps, DefaultDomain's top-k limit,
    // +1 for the allowNulls overflow row) are free to check; only when
    // their product crosses the broadcast threshold do we pay a count()
    // of each (tiny) domain to get the true product — a DefaultDomain
    // bound is its limit, but the real domain may be far smaller.
    // Above `spark.graft.cube.maxCells` the query fails loudly (the
    // Formats.toCube:53 precedent); between the broadcast threshold and
    // the cap, the dense join runs as a shuffle join instead of the
    // unconditional broadcast(sparse).
    val capCells = spark.conf.getOption("spark.graft.cube.maxCells")
      .map(_.toLong).getOrElse(100000L)
    val bcastCells = spark.conf.getOption("spark.graft.cube.broadcastCells")
      .map(_.toLong).getOrElse(32768L)
    def cellProduct(size: (EdgeClause, EdgePlan) => BigInt): BigInt =
      edges.zip(plans).map { case (e, p) =>
        size(e, p) + (if (e.allowNulls) 1 else 0) }.product
    val staticBound = cellProduct((_, p) => BigInt(p.maxCardinality))
    val cells =
      if (staticBound <= bcastCells) staticBound
      else cellProduct((_, p) => BigInt(p.domain.count()))
    if (cells > capCells) throw new IllegalArgumentException(
      s"dense cube would materialize $cells cells " +
        s"(domain cardinality product over ${names.mkString(", ")}), " +
        s"above spark.graft.cube.maxCells=$capCells — narrow the edge " +
        "domains (smaller default-domain limits, coarser ranges) or " +
        "raise the cap")
    val joinCond = names.map(n => domainAll(n) <=> sparse(s"__bucket_$n"))
      .reduce(_ && _)
    // the hashed (right) side is the POST-AGGREGATION sparse cube, whose
    // row count is bounded by `cells` — broadcast below the threshold,
    // shuffle join above it (the dense join then adds one exchange of
    // the sparse side, never of the fact).
    // the merge hint (not just dropping broadcast()) is required:
    // Catalyst's size ESTIMATE for the sparse side is a few KB per
    // column and would auto-broadcast a 10^5-row sparse cube anyway
    val dense =
      if (cells <= bcastCells)
        domainAll.join(broadcast(sparse), joinCond, "left")
      else domainAll.join(sparse.hint("merge"), joinCond, "left")

    val aggCols = aggs.map { a =>
      a.default match {
        // JX select.default fills EMPTY (densified) cells too
        case Some(d) => coalesce(col(a.name), lit(d)).as(a.name)
        case None if Aggs.zeroWhenEmpty(a.aggregate) =>
          coalesce(col(a.name), lit(0L)).as(a.name)
        case None => col(a.name)
      }
    }
    dense
      .orderBy(names.map(n => col(s"__ord_$n").asc).toIndexedSeq: _*)
      .select((names.map(col) ++ aggCols).toIndexedSeq: _*)
  }
}
