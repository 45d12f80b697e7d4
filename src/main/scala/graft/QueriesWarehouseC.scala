package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import graft.etl.{Lineage, LogParse, MozLog}
import graft.jx.{Formats, QueryParser, Runner}
import graft.llm.{Contamination, Dedup, Multimodal, Pipelines, Similarity, TextAnalysis}
import graft.meta.MetaColumns
import graft.operators.{CountMin, Joins, Kmv, Sessionize, SetOps}
import graft.streaming.EventStream
import graft.tables.Catalog

/** Query + oracle definitions — warehouse analytics: TPC-H-ish BI, time series, stats, DQ, dimensional/CDC.
  * Concatenated into SparkEntry.queries / SparkEntry.oracleSql (the
  * driver contract); see SparkEntry's scaladoc for the output and
  * floating-point conventions every entry follows. */
private[graft] object QueriesWarehouseC {
  import QueryShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- SUPPLIER CONCENTRATION (HHI) per part: revenue shares
    //     squared and summed — emitted as the EXACT integer pair
    //     (Σ rᵢ², (Σ rᵢ)²) plus the double dividing once, so the
    //     concentration index hash-matches unrounded. Top 50 most
    //     concentrated multi-supplier parts, full tiebreak. ---
    "q287_hhi_concentration" -> { (spark, dir) =>
      val rev = tbl(spark, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("r"))
      rev.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("r") * col("r")).as("hhi_num"),
          sum(col("r")).as("__tot"))
        .filter(col("n_suppliers") >= 2)
        .withColumn("hhi_den", col("__tot") * col("__tot"))
        .withColumn("hhi", col("hhi_num").cast("double") /
          col("hhi_den").cast("double"))
        .select(col("l_partkey"), col("n_suppliers"), col("hhi_num"),
          col("hhi_den"), col("hhi"))
        .orderBy(col("hhi").desc, col("l_partkey"))
        .limit(50)
    },


    // --- COHORT LTV CURVES: users cohorted by first-event ISO week;
    //     per (cohort, weeks-since) the active users, value cents,
    //     and the cohort's CUMULATIVE cents — the lifetime-value
    //     readout behind retention economics. Cohort-partitioned
    //     window over a weeks-grain frame (dozens of rows per
    //     cohort), exact integers. ---
    "q288_cohort_ltv" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_week"))
      val grid = ev.join(cohorts, Seq("user_id"))
        .withColumn("weeks_since",
          expr("datediff(wk, cohort_week) div 7"))
        .groupBy(col("cohort_week"), col("weeks_since"))
        .agg(count_distinct(col("user_id")).as("n_users"),
          sum(col("cents")).as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_week")).orderBy(col("weeks_since"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      grid.withColumn("cum_cents", sum(col("cents")).over(w))
        .orderBy(col("cohort_week"), col("weeks_since"))
    },


    // --- DISCOUNT-RESPONSE correlation per priority class: Pearson r
    //     between discount basis points and quantity, from exact
    //     integer power sums (the q249 discipline) — does a deeper
    //     discount move volume. num/den ints are the hash gate. ---
    "q289_discount_response" -> { (spark, dir) =>
      val rows = tbl(spark, dir, "lineitem")
        .select(col("l_orderkey"),
          expr("CAST(round(l_discount * 10000) AS BIGINT)").as("x"),
          expr("CAST(round(l_quantity) AS BIGINT)").as("y"))
        .join(tbl(spark, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority")), Seq("l_orderkey"))
      rows.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
          sum(col("x") * col("x")).as("__sxx"),
          sum(col("y") * col("y")).as("__syy"),
          sum(col("x") * col("y")).as("__sxy"))
        .select(col("o_orderpriority"), col("n"),
          (col("n") * col("__sxy") - col("__sx") * col("__sy"))
            .as("num"),
          (col("n") * col("__sxx") - col("__sx") * col("__sx"))
            .as("den_x"),
          (col("n") * col("__syy") - col("__sy") * col("__sy"))
            .as("den_y"))
        .withColumn("r",
          when(col("den_x") > 0 && col("den_y") > 0,
            col("num").cast("double") /
              (sqrt(col("den_x").cast("double")) *
                sqrt(col("den_y").cast("double")))))
        .orderBy(col("o_orderpriority"))
    },


    // --- CONVERSION LATENCY with CENSORING: per user, days from
    //     first view to the first purchase AT OR AFTER it; users who
    //     never purchase after their first view are CENSORED and
    //     counted, not dropped (the survival-analysis bookkeeping a
    //     naive join silently gets wrong). Integer-day census +
    //     exact median among converters. ---
    "q291_conversion_latency" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("__v"))
      // conditional MIN inside the aggregation, NOT a filter on the
      // join: a user whose only purchases precede their first view
      // must stay as a censored row, not vanish
      val conv = firstView.join(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("us").as("__p")),
          Seq("user_id"), "left")
        .groupBy(col("user_id"))
        .agg(max(col("__v")).as("__v"),
          min(when(col("__p") >= col("__v"), col("__p"))).as("__fp"))
        .select(col("user_id"),
          expr("CASE WHEN __fp IS NULL THEN NULL " +
            "ELSE (__fp - __v) div 86400000000 END").as("delay_days"))
      // global median among converters WITHOUT a constant-group
      // window (the q171 lesson): tiny day-value census + a non-equi
      // cumulative join + the integer threshold rule
      val cen = conv.filter(col("delay_days").isNotNull)
        .groupBy(col("delay_days")).agg(count(lit(1)).as("__w"))
      val cum = cen.join(broadcast(cen.select(
          col("delay_days").as("__v2"), col("__w").as("__w2"))),
          col("__v2") <= col("delay_days"))
        .groupBy(col("delay_days")).agg(sum(col("__w2")).as("__cw"))
      val qs = cum.crossJoin(broadcast(
          cen.agg(sum(col("__w")).as("__tw"))))
        .filter(col("__cw") * 2 >= col("__tw"))
        .agg(min(col("delay_days")).as("p50_days"))
      conv.agg(count(lit(1)).as("n_viewers"),
          sum(when(col("delay_days").isNotNull, 1L).otherwise(0L))
            .as("n_converted"),
          max(col("delay_days")).as("max_days"))
        .crossJoin(broadcast(qs))
        .withColumn("conversion_frac",
          col("n_converted").cast("double") /
            col("n_viewers").cast("double"))
    },


    // --- REVENUE WATERFALL per return flag: gross -> discount ->
    //     tax -> net decomposition in exact cents (the reconciliation
    //     view finance closes the books with). ---
    "q292_revenue_waterfall" -> { (spark, dir) =>
      tbl(spark, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            .as("__gross"),
          expr("CAST(round(l_extendedprice * l_discount * 100) " +
            "AS BIGINT)").as("__disc"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * " +
            "l_tax * 100) AS BIGINT)").as("__tax"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("__gross")).as("gross_cents"),
          sum(col("__disc")).as("discount_cents"),
          sum(col("__tax")).as("tax_cents"),
          sum(col("__gross") - col("__disc") + col("__tax"))
            .as("net_cents"))
        .orderBy(col("l_returnflag"))
    },

    // --- MERGEABLE QUANTILE MANIFESTS (the distribution member of
    //     the partition-manifest family: Fingerprint = equality,
    //     KMV = distinct, this = quantiles): per-batch rank-spaced
    //     weighted summaries (every 16th order statistic per shard),
    //     merged across two ingest halves by UNION, answering
    //     p50/p90/p99 per event type from summary rows only — the
    //     100 TB shape where "p95 across any partition subset" never
    //     re-scans history. The oracle replays the summaries, the
    //     merge, the quantile selection, the exact twin, AND the
    //     rank-error-bound check relationally — a hash match proves
    //     the whole construction, bound included. ---
    "q294_quantile_manifest" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val qsum = graft.operators.QuantileSummary
      val ev = tbl(spark, dir, "events").select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        col("event_id"))
      def summ(d: DataFrame) = qsum.shardSummary(d, col("event_type"),
        col("cents"), col("event_id"), shards = 8, k = 16)
      val merged = qsum.merge(Seq(
        summ(ev.filter(pmod(col("event_id"), lit(2)) === 0)),
        summ(ev.filter(pmod(col("event_id"), lit(2)) =!= 0))))
      val withTgt = qsum.quantiles(merged, Seq(0.5, 0.9, 0.99))
        .select(col("grp"), col("q"), col("value").as("approx_cents"),
          col("n"))
        .withColumn("tgt",
          ceil(col("q") * col("n") - lit(1e-9)).cast("long"))
      // exact twin + bound flags from the raw table (distinct-value
      // cumulative frame: the window runs over value census rows)
      val counts = ev.groupBy(col("event_type").as("grp"),
          col("cents").as("v")).agg(count(lit(1)).as("c"))
      val cum = counts.withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val exact = withTgt.select(col("grp"), col("q"), col("tgt"))
        .join(cum, Seq("grp"))
        .filter(col("cum") >= greatest(col("tgt"), lit(1L)))
        .groupBy(col("grp"), col("q"))
        .agg(min(col("v")).as("exact_cents"))
      val cumR = cum.select(col("grp").as("__g"), col("v"),
        col("c").as("c_at"), col("cum").as("rank_le"))
      val le = withTgt.join(cumR, withTgt("grp") === cumR("__g") &&
          col("approx_cents") === cumR("v"))
        .select(col("grp"), col("q"), col("approx_cents"), col("n"),
          col("tgt"), col("rank_le"), col("c_at"))
      val parts = ev.groupBy(col("event_type").as("grp"))
        .agg(countDistinct(pmod(col("event_id"), lit(2)) * 10 +
          pmod(col("event_id"), lit(8))).as("np"))
      le.join(exact, Seq("grp", "q")).join(parts, Seq("grp"))
        .select(col("grp").as("event_type"), col("q"),
          col("approx_cents"), col("exact_cents"), col("n"),
          col("rank_le"), col("tgt"),
          (col("rank_le") - col("c_at") < col("tgt") &&
            col("rank_le") >= col("tgt") - col("np") * 15L)
            .as("within_bound"))
        .orderBy(col("event_type"), col("q"))
    },

    // --- ZONE-MAP SKIP ESTIMATOR (the data-skipping planner q120's
    //     z-order layout feeds): model each candidate layout as
    //     value-range zones (zone ≅ one file's parquet min/max
    //     footer), census per-zone min/max of BOTH predicate
    //     columns, and count what a (date band AND partkey band)
    //     scan could skip under each layout — natural insertion
    //     order skips ~nothing, date-linear skips on date only,
    //     z-order skips on both at the sqrt rate. The "sort your
    //     100 TB table along the curve of its two scan keys"
    //     decision, quantified in exact integers. ---
    "q296_zone_skip" -> { (spark, dir) =>
      val base = tbl(spark, dir, "lineitem").select(
          col("l_orderkey"),
          datediff(to_date(col("l_shipdate")),
            to_date(lit("1992-01-01"))).cast("long").as("dy"),
          pmod(col("l_partkey"), lit(1024)).cast("long").as("pk"))
        .withColumn("z",
          graft.operators.ZOrder.zValue(col("dy"), col("pk"), 12))
      def skip(mnd: Column, mxd: Column, mnp: Column, mxp: Column) =
        mxd < 1500L || mnd > 1600L || mxp < 100L || mnp > 200L
      def census(layout: String, zone: Column) = base
        .groupBy(zone.as("zone"))
        .agg(min(col("dy")).as("mnd"), max(col("dy")).as("mxd"),
          min(col("pk")).as("mnp"), max(col("pk")).as("mxp"),
          count(lit(1)).as("nr"))
        .withColumn("__skip", skip(col("mnd"), col("mxd"),
          col("mnp"), col("mxp")))
        .groupBy(lit(layout).as("layout"))
        .agg(count(lit(1)).as("n_zones"),
          sum(when(col("__skip"), 1L).otherwise(0L))
            .as("zones_skipped"),
          sum(col("nr")).as("rows_total"),
          sum(when(col("__skip"), col("nr")).otherwise(0L))
            .as("rows_skipped"))
      val matching = base.agg(sum(when(
          col("dy").between(1500L, 1600L) &&
          col("pk").between(100L, 200L), 1L).otherwise(0L))
        .as("rows_matching"))
      census("natural", expr("l_orderkey div 2048"))
        .unionByName(census("bydate", expr("dy div 32")))
        .unionByName(census("zorder", expr("z div 65536")))
        .crossJoin(broadcast(matching))
        .orderBy(col("layout"))
    },

    // --- JOIN-CARDINALITY ESTIMATION from 64-row histograms (the
    //     ANALYZE-statistics planner input as data): per join key, a
    //     bucketed (rows, ndv) histogram built in one scan; any
    //     equi-join's size estimated by the containment rule
    //     Σ_b rows_A·rows_B / max(ndv_A, ndv_B) — the number a
    //     join-order / broadcast decision reads BEFORE touching
    //     100 TB. Estimates AND true sizes (key-census products, no
    //     join materialized) are emitted with their ratio, so the
    //     estimation error itself is hash-gated. ---
    "q297_join_cardinality" -> { (spark, dir) =>
      val js = graft.operators.JoinStats
      def actual(a: DataFrame, ka: Column, b: DataFrame,
                 kb: Column) = {
        val ca = a.groupBy(ka.cast("long").as("k"))
          .agg(count(lit(1)).as("__ca"))
        val cb = b.groupBy(kb.cast("long").as("k"))
          .agg(count(lit(1)).as("__cb"))
        ca.join(cb, "k")
          .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L))
            .as("actual"))
      }
      def edge(name: String, a: DataFrame, ka: Column, b: DataFrame,
               kb: Column) =
        js.estimateEquiJoin(js.bucketHistogram(a, ka, 64),
            js.bucketHistogram(b, kb, 64))
          .crossJoin(actual(a, ka, b, kb))
          .select(lit(name).as("join_name"), col("est"),
            col("actual"),
            round(col("est").cast("double") /
              col("actual").cast("double"), 6).as("ratio"))
      val li = tbl(spark, dir, "lineitem")
      val ord = tbl(spark, dir, "orders")
      val cust = tbl(spark, dir, "customer")
      // a many-to-many edge where per-bucket uniformity genuinely
      // errs (the FK edges estimate exactly — the easy case): the
      // Cauchy-Schwarz direction makes the histogram UNDERestimate
      // under within-bucket skew, and the ratio shows by how much
      val ev = tbl(spark, dir, "events")
      edge("lineitem_orders", li, col("l_orderkey"), ord,
          col("o_orderkey"))
        .unionByName(edge("orders_customer", ord, col("o_custkey"),
          cust, col("c_custkey")))
        .unionByName(edge("lineitem_suppkey_self", li,
          col("l_suppkey"), li, col("l_suppkey")))
        .unionByName(edge("events_user_self", ev, col("user_id"),
          ev, col("user_id")))
        .orderBy(col("join_name"))
    },

    // --- FUNCTIONAL-DEPENDENCY DISCOVERY (the schema-profiling
    //     complement of q226's FK discovery): A → B holds iff
    //     ndv(A) = ndv(A,B); the violation count ndv(A,B) − ndv(A)
    //     says how many determinant values break it — what tells a
    //     100 TB warehouse which columns can be normalized out,
    //     which "id" columns are dirty, and which dimension
    //     attributes are safe to denormalize. One exact
    //     count_distinct pass per candidate, no joins. ---
    "q298_fd_discovery" -> { (spark, dir) =>
      val ord = tbl(spark, dir, "orders")
      val li = tbl(spark, dir, "lineitem")
      def fd(table: String, df: DataFrame, a: String, b: String) =
        df.agg(count_distinct(col(a)).as("ndv_a"),
            count_distinct(struct(col(a), col(b))).as("ndv_ab"))
          .select(lit(s"$table.$a->$b").as("candidate"),
            col("ndv_a"), col("ndv_ab"),
            (col("ndv_ab") === col("ndv_a")).as("fd_holds"),
            (col("ndv_ab") - col("ndv_a")).as("violations"))
      fd("orders", ord, "o_orderkey", "o_custkey")
        .unionByName(fd("orders", ord, "o_orderkey",
          "o_orderpriority"))
        .unionByName(fd("orders", ord, "o_custkey",
          "o_orderpriority"))
        .unionByName(fd("lineitem", li, "l_orderkey", "l_returnflag"))
        .unionByName(fd("lineitem", li, "l_partkey", "l_suppkey"))
        .orderBy(col("candidate"))
    },

    // --- LAYOUT DECAY under append (q296's operational sequel: WHEN
    //     to re-optimize): the same zone-skip census on a FRESH
    //     z-order layout vs an AGED one where the latest 10% of rows
    //     arrived unsorted into tail zones — the universal fate of
    //     an optimized 100 TB table under continuous ingest. The
    //     scanned-row delta between the two layouts is the exact
    //     price of deferring the re-layout, which is what a
    //     compaction scheduler weighs against the re-sort cost. ---
    "q299_zone_decay" -> { (spark, dir) =>
      val base = tbl(spark, dir, "lineitem").select(
          col("l_orderkey"),
          datediff(to_date(col("l_shipdate")),
            to_date(lit("1992-01-01"))).cast("long").as("dy"),
          pmod(col("l_partkey"), lit(1024)).cast("long").as("pk"))
        .withColumn("z",
          graft.operators.ZOrder.zValue(col("dy"), col("pk"), 12))
      val isTail = pmod(col("l_orderkey"), lit(10)) === 9
      def census(layout: String, zone: Column) = base
        .groupBy(zone.as("zone"))
        .agg(min(col("dy")).as("mnd"), max(col("dy")).as("mxd"),
          min(col("pk")).as("mnp"), max(col("pk")).as("mxp"),
          count(lit(1)).as("nr"))
        .withColumn("__skip", col("mxd") < 1500L ||
          col("mnd") > 1600L || col("mxp") < 100L || col("mnp") > 200L)
        .groupBy(lit(layout).as("layout"))
        .agg(count(lit(1)).as("n_zones"),
          sum(when(col("__skip"), 1L).otherwise(0L))
            .as("zones_skipped"),
          sum(when(col("__skip"), col("nr")).otherwise(0L))
            .as("rows_skipped"),
          sum(when(col("__skip"), 0L).otherwise(col("nr")))
            .as("rows_scanned"))
      // fresh: every row in its z-curve zone; aged: the newest 10%
      // landed in arrival-order tail zones instead
      census("fresh", expr("z div 65536"))
        .unionByName(census("aged", when(isTail,
          expr("10000 + l_orderkey div 2048"))
          .otherwise(expr("z div 65536"))))
        .orderBy(col("layout"))
    },

    // --- MANIFEST-ONLY HEALTH REPORT (the capstone composing all
    //     four manifest families): two ingest halves each write
    //     per-partition manifests — additive content fingerprints
    //     (equality), KMV sketches (distinct), rank-spaced summaries
    //     (distribution), MG top-m (frequency) — and the morning
    //     health dashboard (row counts + fps per type, distinct
    //     users, p50/p95 value, top user per type) is answered from
    //     MERGED MANIFESTS ONLY: at 100 TB this report costs a few
    //     thousand manifest rows, zero data scans, history never
    //     re-read. The oracle rebuilds every family relationally —
    //     one hash gate over the whole composition. ---
    "q300_manifest_health" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val fpOp = graft.operators.Fingerprint
      val qsOp = graft.operators.QuantileSummary
      val hhOp = graft.operators.HeavyHitters
      val kmvOp = graft.operators.Kmv
      val ev = tbl(spark, dir, "events").select(col("event_type"),
        col("user_id"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      def half(h: Int) = ev.filter(pmod(col("event_id"), lit(2)) === h)
      // volume: additive content fingerprints per event type
      def fpr(d: DataFrame) = fpOp.contentFingerprint(d,
        col("event_type"), Seq(col("event_id"), col("cents")))
      val vol = fpOp.merge(fpr(half(0)), fpr(half(1)))
      val volRows = vol.select(lit("volume").as("section"), col("grp"),
          lit("n_rows").as("metric"),
          col("n_rows").cast("double").as("value"))
        .unionByName(vol.select(lit("volume").as("section"),
          col("grp"), lit("fp").as("metric"),
          col("fp").cast("double").as("value")))
      // distinct users: merged KMV sketches
      val sk = kmvOp.merge(Seq(
        kmvOp.sketch(half(0), col("user_id"), 256),
        kmvOp.sketch(half(1), col("user_id"), 256)), 256)
      val duRows = kmvOp.estimate(sk, 256)
        .select(lit("distinct").as("section"), lit("all").as("grp"),
          lit("users_est").as("metric"),
          round(col("distinct_est"), 6).as("value"))
      // distribution: merged rank-spaced summaries, p50/p95 cents
      def qsum(d: DataFrame) = qsOp.shardSummary(d, col("event_type"),
        col("cents"), col("event_id"), shards = 4, k = 32)
      val qRows = qsOp.quantiles(
          qsOp.merge(Seq(qsum(half(0)), qsum(half(1)))),
          Seq(0.5, 0.95))
        .select(lit("distribution").as("section"), col("grp"),
          when(col("q") === 0.5, "p50_cents").otherwise("p95_cents")
            .as("metric"),
          col("value").cast("double").as("value"))
      // frequency: merged MG summaries, top user per event type
      def hsum(d: DataFrame) = hhOp.shardSummaries(d,
        col("event_type"), col("user_id"),
        pmod(col("event_id"), lit(4)), m = 8)
      val (h1, l1) = hsum(half(0))
      val (h2, l2) = hsum(half(1))
      val (ms, _) = hhOp.merge(Seq(h1, h2), Seq(l1, l2))
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("est").desc, col("value").asc)
      val top = ms.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 1)
      val hhRows = top.select(lit("frequency").as("section"),
          col("grp"), lit("top_user_id").as("metric"),
          col("value").cast("double").as("value"))
        .unionByName(top.select(lit("frequency").as("section"),
          col("grp"), lit("top_user_est").as("metric"),
          col("est").cast("double").as("value")))
      volRows.unionByName(duRows).unionByName(qRows)
        .unionByName(hhRows)
        .orderBy(col("section"), col("grp"), col("metric"))
    },

    // --- STATS-DRIVEN BROADCAST PLANNING (the decision Spark's
    //     file-size heuristic can't make): post-filter cardinality of
    //     a dimension estimated from a 22-row equi-width value
    //     histogram — manifest data, one scan to build, additively
    //     maintainable — converted to bytes and checked against two
    //     broadcast thresholds. The census emits, per filter cut, the
    //     estimate, the TRUE filtered count (so the estimation error
    //     is itself hash-gated, q297-style), and both decisions; all
    //     arithmetic is exact floor-division integers the oracle
    //     replays. JoinPlannerSpec proves the decisions drive REAL
    //     physical plans (BroadcastHashJoin vs SortMergeJoin with
    //     Spark's own heuristic disabled). ---
    "q315_join_planner" -> { (spark, dir) =>
      val jp = graft.operators.JoinPlanner
      val lo = -1000L; val w = 500L; val nb = 22
      val cuts = Seq(-500L, 0L, 1000L, 3000L, 9000L, 11000L)
      val cust = tbl(spark, dir, "customer")
      // the manifest: built once, read per scenario (22 rows)
      val hist = jp.valueHistogram(cust, col("c_acctbal"), lo, w, nb)
        .localCheckpoint()
      val ests = cuts.map { c =>
        jp.estimateBelow(hist, lo, w, nb, c)
          .select(lit(c).as("cut"), col("est").as("est_rows"))
      }.reduce(_ unionByName _)
      // true filtered counts in ONE scan: conditional sums, unstacked
      val tAggs = cuts.zipWithIndex.map { case (c, i) =>
        coalesce(sum(when(floor(col("c_acctbal")) < lit(c), lit(1L))),
          lit(0L)).as(s"t$i")
      }
      val truths = cust.agg(tAggs.head, tAggs.tail: _*)
        .selectExpr("stack(" + cuts.size + ", " +
          cuts.zipWithIndex.map { case (c, i) => s"${c}L, t$i" }
            .mkString(", ") + ") AS (cut, true_rows)")
      ests.join(truths, "cut")
        .withColumn("est_bytes", col("est_rows") * lit(200L))
        .withColumn("bcast_100kb", col("est_bytes") <= lit(100000L))
        .withColumn("bcast_1mb", col("est_bytes") <= lit(1000000L))
        .orderBy(col("cut"))
    },

    // --- SELECTIVE RECOMPUTATION driven by the fingerprint manifest
    //     (the 100 TB refresh story end-to-end): a snapshot v2
    //     mutates a deterministic subset of rows confined to shards
    //     3 and 7; per-shard content fingerprints of v1 and v2 are
    //     diffed, ONLY the stale shards are recomputed from v2, and
    //     the spliced materialized view (carried v1 shards + fresh
    //     stale shards) rolls up to the answer. The oracle rebuilds
    //     from v2 in full AND replays the manifest diff — a hash
    //     match proves the diff caught exactly the changed shards
    //     and the splice is exact; a single missed shard would carry
    //     stale cents into the rollup and go red. History is never
    //     re-scanned: v1 appears only through its MV and manifest. ---
    "q316_selective_recompute" -> { (spark, dir) =>
      val fpOp = graft.operators.Fingerprint
      val base = tbl(spark, dir, "events")
        .select(col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("shard", pmod(col("event_id"), lit(16L)))
      val v2 = base.withColumn("cents",
        when((col("shard") === 3 || col("shard") === 7) &&
          pmod(col("event_id"), lit(5)) === 0, col("cents") + 1)
          .otherwise(col("cents")))
      def man(d: DataFrame) = fpOp.contentFingerprint(d, col("shard"),
        Seq(col("event_id"), col("event_type"), col("cents")))
      // the stale set drives two branches (anti + semi): checkpoint it
      val stale = man(base)
        .join(man(v2).select(col("grp"), col("n_rows").as("__n2"),
          col("fp").as("__f2")), Seq("grp"))
        .filter(col("fp") =!= col("__f2") ||
          col("n_rows") =!= col("__n2"))
        .select(col("grp").as("shard"))
        .localCheckpoint()
      def mv(d: DataFrame) = d.groupBy(col("shard"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val spliced = mv(base).join(stale, Seq("shard"), "left_anti")
        .unionByName(mv(v2.join(stale, Seq("shard"), "left_semi")))
      spliced.groupBy(col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
        .crossJoin(broadcast(
          stale.agg(count(lit(1)).as("n_stale_shards"))))
        .orderBy(col("event_type"))
    },

    // --- JOIN-ORDER SELECTION from histogram manifests (the q297 →
    //     q315 planner story completed): for the 4-table star
    //     lineitem ⋈ orders ⋈ customer + supplier, the dominant
    //     left-deep cost term is the FIRST join's cardinality — each
    //     candidate first edge is estimated from the 64-row bucket
    //     histograms (exact containment-rule integers), the smallest
    //     estimate wins (tie: edge name asc), and the full join then
    //     executes with the chosen pair leftmost (Spark's CBO join
    //     reorder is off by default, so the DataFrame order IS the
    //     plan order). The census hash-gates every estimate, the
    //     TRUE pairwise sizes (key-census products, no join
    //     materialized), the choice, and the executed result count. ---
    "q321_join_order" -> { (spark, dir) =>
      val js = graft.operators.JoinStats
      val li = tbl(spark, dir, "lineitem")
      val ord = tbl(spark, dir, "orders")
      val cust = tbl(spark, dir, "customer")
      val supp = tbl(spark, dir, "supplier")
      def actual(a: DataFrame, ka: Column, b: DataFrame, kb: Column) = {
        val ca = a.groupBy(ka.cast("long").as("k"))
          .agg(count(lit(1)).as("__ca"))
        val cb = b.groupBy(kb.cast("long").as("k"))
          .agg(count(lit(1)).as("__cb"))
        ca.join(cb, "k")
          .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L))
            .as("actual"))
      }
      def edge(name: String, a: DataFrame, ka: Column,
               b: DataFrame, kb: Column) =
        js.estimateEquiJoin(js.bucketHistogram(a, ka, 64),
            js.bucketHistogram(b, kb, 64))
          .crossJoin(actual(a, ka, b, kb))
          .select(lit(name).as("edge"), col("est"), col("actual"))
      val census = edge("li_orders", li, col("l_orderkey"),
          ord, col("o_orderkey"))
        .unionByName(edge("li_supplier", li, col("l_suppkey"),
          supp, col("s_suppkey")))
        .unionByName(edge("orders_customer", ord, col("o_custkey"),
          cust, col("c_custkey")))
        .localCheckpoint() // feeds the choice, the plan, the output
      val chosen = census
        .orderBy(col("est").asc, col("edge").asc)
        .select(col("edge")).head().getString(0) // one bounded pull:
        // the planner reads 3 manifest rows, never data
      val joined = chosen match {
        case "li_orders" =>
          li.join(ord, col("l_orderkey") === col("o_orderkey"))
            .join(cust, col("o_custkey") === col("c_custkey"))
            .join(supp, col("l_suppkey") === col("s_suppkey"))
        case "li_supplier" =>
          li.join(supp, col("l_suppkey") === col("s_suppkey"))
            .join(ord, col("l_orderkey") === col("o_orderkey"))
            .join(cust, col("o_custkey") === col("c_custkey"))
        case _ =>
          ord.join(cust, col("o_custkey") === col("c_custkey"))
            .join(li, col("l_orderkey") === col("o_orderkey"))
            .join(supp, col("l_suppkey") === col("s_suppkey"))
      }
      census
        .withColumn("chosen", col("edge") === lit(chosen))
        .crossJoin(broadcast(
          joined.agg(count(lit(1)).as("final_rows"))))
        .orderBy(col("edge"))
    },

    // --- BACKFILL PLANNER (manifests × lineage): after a bad
    //     upstream batch, which derived tables must recompute, and in
    //     what order? Stale SOURCES come from the q316 fingerprint
    //     manifest diff (shards 3 and 7 mutate); staleness then
    //     propagates through a derivation DAG by frontier BFS
    //     (Graph.bfsHops — the existing operator), and the min-hop
    //     is the backfill WAVE: wave-0 sources re-ingest, wave-1
    //     dailies rebuild from them, wave-2+ roll up. Fresh nodes
    //     (wave −1) are exactly what selective recomputation skips.
    //     The oracle replays the manifest diff AND the closure as a
    //     recursive CTE over the same literal DAG. ---
    "q322_backfill_planner" -> { (spark, dir) =>
      import spark.implicits._
      val fpOp = graft.operators.Fingerprint
      val base = tbl(spark, dir, "events")
        .select(col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("shard", pmod(col("event_id"), lit(16L)))
      val v2 = base.withColumn("cents",
        when((col("shard") === 3 || col("shard") === 7) &&
          pmod(col("event_id"), lit(5)) === 0, col("cents") + 1)
          .otherwise(col("cents")))
      def man(d: DataFrame) = fpOp.contentFingerprint(d, col("shard"),
        Seq(col("event_id"), col("event_type"), col("cents")))
      val seeds = man(base)
        .join(man(v2).select(col("grp"), col("n_rows").as("__n2"),
          col("fp").as("__f2")), Seq("grp"))
        .filter(col("fp") =!= col("__f2") ||
          col("n_rows") =!= col("__n2"))
        .select(concat(lit("shard_"), col("grp").cast("string"))
          .as("node"))
      val edges = ((0 to 7).map(i => (s"shard_$i", "daily_lo")) ++
        (8 to 15).map(i => (s"shard_$i", "daily_hi")) ++
        Seq(("daily_lo", "weekly"), ("daily_hi", "weekly"),
          ("weekly", "dashboard"), ("daily_lo", "quality_report"),
          ("shard_12", "audit_extract"))).toDF("src", "dst")
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      val reach = graft.operators.Graph.bfsHops(edges, seeds,
        maxHops = 4)
      nodes.join(reach, Seq("node"), "left")
        .select(col("node"), col("hop").isNotNull.as("stale"),
          coalesce(col("hop"), lit(-1)).cast("int").as("wave"))
        .orderBy(col("node"))
    },


    // --- ENCODING ADVISOR (q285's dict-vs-plain decision, grown to
    //     the full Parquet scheme menu over NUMERIC columns): per
    //     512-key row group in the pinned (l_orderkey, l_linenumber)
    //     layout, estimate encoded bytes under plain / RLE / dict /
    //     delta from exact per-group stats (run count via lag, max
    //     abs delta, distinct count; bit widths via length(bin(x)) —
    //     the libm-free floor(log2)+1) and pick the argmin per
    //     column. Plain is BIT-PACKED at the max-value width (a
    //     64-bit plain is a strawman every scheme beats), so delta
    //     wins only where deltas are genuinely narrower than values
    //     (sorted keys), dict only where few large values repeat
    //     (the enum-code column), RLE only on long runs (the
    //     rowgroup-constant batch-id column) — all four regimes are
    //     exercised. Ties prefer the simpler scheme (plain < rle <
    //     dict < delta). This is the decision a columnar writer
    //     makes per page at 100 TB; estimating it from ONE windowed
    //     scan of the melted table (partitioned windows only — the
    //     row group is the partition, exactly how pages bound
    //     encoder state) makes layout policy a query, not a rewrite
    //     experiment. All arithmetic is exact integers. ---
    "q325_encoding_advisor" -> { (spark, dir) =>
      val src = tbl(spark, dir, "lineitem").select(
        expr("l_orderkey div 512").as("rg"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_orderkey").as("v1"), col("l_partkey").as("v2"),
        col("l_suppkey").as("v3"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("v4"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v5"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("v6"),
        expr("(l_suppkey % 4) * 1000003 + 7").as("v7"),
        expr("(l_orderkey div 512) * 1000").as("v8"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // corpus — the pinned layout orders by the full value tuple so
      // any remaining ties are fully identical rows and every
      // column's run sequence is engine-deterministic
      // r10 verdict ask #6 — the 8-way ROW melt used to be the
      // heaviest 100x wall in the repo (382.9 s): the 8 per-column
      // lag sequences now share ONE window over the UN-MELTED table
      // (all lag/chg/delta expressions ride the same partitioned
      // sort), the per-rowgroup stats aggregate in one pass (the 8
      // countDistincts expand map-side and partial-aggregate before
      // the shuffle), and only the TINY per-rowgroup stats frame
      // (rows = rowgroups, not rows x columns) is melted for the
      // per-column rollup. Windowed rows drop 8x, melt input ~4000x.
      val names = Seq("l_orderkey" -> "v1", "l_partkey" -> "v2",
        "l_suppkey" -> "v3", "l_quantity" -> "v4",
        "l_extendedprice" -> "v5", "l_shipdate" -> "v6",
        "status_code" -> "v7", "batch_id" -> "v8")
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("rg"))
        .orderBy(col("ok"), col("ln"), col("v2"), col("v3"),
          col("v4"), col("v5"), col("v6"))
      val lagged = names.foldLeft(src) { case (d, (_, v)) =>
        d.withColumn(s"__lag_$v", lag(col(v), 1).over(win))
      }
      val staged = names.foldLeft(lagged) { case (d, (_, v)) =>
        d.withColumn(s"__chg_$v", when(col(s"__lag_$v").isNotNull &&
            col(v) =!= col(s"__lag_$v"), 1L).otherwise(0L))
          .withColumn(s"__ad_$v", abs(col(v) - col(s"__lag_$v")))
      }
      val aggCols = names.flatMap { case (_, v) => Seq(
        (sum(col(s"__chg_$v")) + 1).as(s"runs_$v"),
        max(col(s"__ad_$v")).as(s"maxd_$v"),
        max(col(v)).as(s"maxv_$v"),
        countDistinct(col(v)).as(s"nd_$v")) }
      val perRg = staged.groupBy(col("rg"))
        .agg(count(lit(1)).as("n"), aggCols: _*)
      val g = perRg.select(col("rg"), col("n"), explode(array(
          names.map { case (cn, v) =>
            struct(lit(cn).as("colname"), col(s"nd_$v").as("nd"),
              col(s"runs_$v").as("runs"), col(s"maxd_$v").as("maxd"),
              col(s"maxv_$v").as("maxv")) }: _*)).as("e"))
        .select(col("rg"), col("n"), col("e.colname").as("colname"),
          col("e.nd").as("nd"), col("e.runs").as("runs"),
          col("e.maxd").as("maxd"), col("e.maxv").as("maxv"))
      g.select(col("colname"),
          expr("(n * length(bin(maxv)) + 7) div 8").as("bp"),
          expr("runs * ((length(bin(maxv)) + 7) div 8 + 2)").as("br"),
          expr("""nd * ((length(bin(maxv)) + 7) div 8) +
            (n * length(bin(nd - 1)) + 7) div 8""").as("bd"),
          expr("""(length(bin(maxv)) + 7) div 8 + CASE WHEN n = 1
            THEN 0 ELSE
            ((n - 1) * (length(bin(maxd)) + 1) + 7) div 8 END""")
            .as("bdel"))
        .groupBy(col("colname"))
        .agg(count(lit(1)).as("n_rowgroups"),
          sum(col("bp")).as("bytes_plain"),
          sum(col("br")).as("bytes_rle"),
          sum(col("bd")).as("bytes_dict"),
          sum(col("bdel")).as("bytes_delta"))
        .withColumn("best", expr("""CASE
          WHEN bytes_plain <= least(bytes_rle, bytes_dict, bytes_delta)
            THEN 'plain'
          WHEN bytes_rle <= least(bytes_dict, bytes_delta) THEN 'rle'
          WHEN bytes_dict <= bytes_delta THEN 'dict'
          ELSE 'delta' END"""))
        .orderBy(col("colname"))
    },


    // --- MATERIALIZED-VIEW ADVISOR (the workload side of the q296/
    //     q321 planner family): candidate MVs are the 7 non-empty
    //     grouping sets over (event_type, day, user_bucket); their
    //     cardinalities come from ONE cube pass (grouping_id maps
    //     each cube row to its candidate bitmask — no per-candidate
    //     rescans), a literal workload of 8 query shapes joins by
    //     bitmask subsumption (a query is answerable from an MV iff
    //     its dims ⊆ the MV's), and utility = rows-saved-per-
    //     MV-row picks the winner. At 100 TB this is the "which
    //     rollup do we maintain" decision made entirely from one
    //     aggregate scan. Benefit/utility are exact integer sums
    //     and one exact division. ---
    "q326_mv_advisor" -> rounded("utility" -> 6)({ (spark, dir) =>
      import spark.implicits._
      val ev = tbl(spark, dir, "events").select(
        col("event_type").as("et"), to_date(col("ts")).as("day"),
        pmod(col("user_id"), lit(16L)).as("ub"))
      val base = ev.agg(count(lit(1)).as("__base"))
      val cands = ev.cube(col("et"), col("day"), col("ub"))
        .agg(grouping_id().as("__gid"), count(lit(1)).as("__cnt"))
        .withColumn("mask",
          when(expr("__gid & 4") === 0, 1L).otherwise(0L) +
          when(expr("__gid & 2") === 0, 2L).otherwise(0L) +
          when(expr("__gid & 1") === 0, 4L).otherwise(0L))
        .filter(col("mask") =!= 0)
        .groupBy(col("mask")).agg(count(lit(1)).as("mv_rows"))
      val wl = Seq((0L, 30L), (1L, 20L), (2L, 10L), (3L, 15L),
          (4L, 5L), (5L, 4L), (6L, 3L), (7L, 2L))
        .toDF("qmask", "freq")
      val scored = cands.crossJoin(broadcast(wl))
        .filter(expr("(qmask & mask) = qmask"))
        .crossJoin(broadcast(base))
        .groupBy(col("mask"), col("mv_rows"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("freq") * (col("__base") - col("mv_rows")))
            .as("benefit"))
        .withColumn("utility", col("benefit").cast("double") /
          col("mv_rows").cast("double"))
      val bu = scored.agg(max(col("utility")).as("__bu"))
      val s2 = scored.crossJoin(broadcast(bu))
      val bm = s2.filter(col("utility") === col("__bu"))
        .agg(min(col("mask")).as("__bm"))
      s2.crossJoin(broadcast(bm))
        .withColumn("chosen", col("mask") === col("__bm"))
        .withColumn("dims", expr("""CASE mask
          WHEN 1 THEN 'event_type' WHEN 2 THEN 'day'
          WHEN 3 THEN 'event_type+day' WHEN 4 THEN 'user_bucket'
          WHEN 5 THEN 'event_type+user_bucket'
          WHEN 6 THEN 'day+user_bucket'
          ELSE 'event_type+day+user_bucket' END"""))
        .select(col("mask"), col("dims"), col("mv_rows"),
          col("n_queries"), col("benefit"), col("utility"),
          col("chosen"))
        .orderBy(col("mask"))
    }),


    // --- SORT-KEY ADVISOR (q296's zone-map skip estimate, turned
    //     into the decision it exists for): for each candidate sort
    //     key, simulate the post-sort layout as 64 equal-WIDTH value
    //     zones (a broadcast min/max plus integer bucketing — no
    //     global sort, no global window), collect per-zone min/max
    //     manifests for every predicate column, and replay a literal
    //     workload of range scans against them: a zone is skipped
    //     iff its [min,max] misses the predicate range. The
    //     freq-weighted scanned-row total picks which sort order to
    //     maintain — the "which curve do we sort 100 TB along"
    //     decision, answered from manifests. Exact integers
    //     throughout; the fraction divides once. ---
    "q328_sortkey_advisor" -> rounded("scan_frac" -> 6)({ (spark, dir) =>
      import spark.implicits._
      val li = tbl(spark, dir, "lineitem").select(
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("sd"),
        col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .localCheckpoint() // three candidate passes + three min/max
      def zonesFor(c: String, name: String): DataFrame = {
        val mm = li.agg(min(col(c)).as("__mn"), max(col(c)).as("__mx"))
        li.crossJoin(broadcast(mm))
          .withColumn("zone",
            expr(s"(($c - __mn) * 64) div (__mx - __mn + 1)"))
          .groupBy(col("zone"))
          .agg(count(lit(1)).as("zn"),
            min(col("sd")).as("mn_sd"), max(col("sd")).as("mx_sd"),
            min(col("pk")).as("mn_pk"), max(col("pk")).as("mx_pk"),
            min(col("sk")).as("mn_sk"), max(col("sk")).as("mx_sk"))
          .withColumn("candidate", lit(name))
      }
      val zs = zonesFor("sd", "l_shipdate")
        .unionByName(zonesFor("pk", "l_partkey"))
        .unionByName(zonesFor("sk", "l_suppkey"))
      val wl = Seq((1L, "sd", 8766L, 9130L, 10L),
          (2L, "sd", 9496L, 9586L, 8L), (3L, "pk", 100L, 500L, 4L),
          (4L, "sk", 10L, 20L, 3L), (5L, "sd", 9282L, 9311L, 6L))
        .toDF("wid", "pcol", "lo", "hi", "freq")
      val per = zs.crossJoin(broadcast(wl))
        .withColumn("mnp", expr(
          "CASE pcol WHEN 'sd' THEN mn_sd WHEN 'pk' THEN mn_pk ELSE mn_sk END"))
        .withColumn("mxp", expr(
          "CASE pcol WHEN 'sd' THEN mx_sd WHEN 'pk' THEN mx_pk ELSE mx_sk END"))
        .withColumn("scan", when(col("mxp") < col("lo") ||
          col("mnp") > col("hi"), 0L).otherwise(col("zn")))
        .groupBy(col("candidate"))
        .agg(sum(col("freq") * col("scan")).as("weighted_scanned"),
          sum(col("freq") * col("zn")).as("weighted_total"))
        .withColumn("scan_frac",
          col("weighted_scanned").cast("double") /
            col("weighted_total").cast("double"))
      val bw = per.agg(min(col("weighted_scanned")).as("__bw"))
      val p2 = per.crossJoin(broadcast(bw))
      val bc = p2.filter(col("weighted_scanned") === col("__bw"))
        .agg(min(col("candidate")).as("__bc"))
      p2.crossJoin(broadcast(bc))
        .withColumn("chosen", col("candidate") === col("__bc"))
        .select(col("candidate"), col("weighted_scanned"),
          col("weighted_total"), col("scan_frac"), col("chosen"))
        .orderBy(col("candidate"))
    }),


    // --- RANGE-PARTITION PLANNER from quantile manifests (what the
    //     q294 summaries exist FOR): per return-flag stream, derive
    //     P=8 range boundaries from the mergeable rank-spaced
    //     summary (integer rank targets (i·n) div 8 — no doubles at
    //     all), assign every row by boundary comparison, and gate
    //     the resulting balance against the summary's PROVEN rank-
    //     error bound: each partition must sit within 2·shards·(k−1)
    //     + max-tie + rounding of n/8. At 100 TB this is how a range
    //     shuffle (or a sorted rewrite) picks its split points
    //     WITHOUT a global sort — the manifest is read, the bound
    //     certifies the plan before any data moves. The composite
    //     value (partkey, orderkey, linenumber) keeps ties rare and
    //     the bound tight. ---
    "q329_range_partition_planner" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val qsum = graft.operators.QuantileSummary
      val li = tbl(spark, dir, "lineitem").select(
        col("l_returnflag").as("rf"),
        (col("l_partkey") * 131072L + col("l_orderkey") * 8L +
          col("l_linenumber")).as("vv"),
        (col("l_orderkey") * 8L + col("l_linenumber")).as("t"))
      val summary = qsum.shardSummary(li, col("rf"), col("vv"),
        col("t"), shards = 8, k = 16)
      val agg = summary.groupBy(col("grp"), col("value"))
        .agg(sum(col("w")).as("w"))
      val cum = agg
        .withColumn("cw", sum(col("w")).over(
          Window.partitionBy(col("grp")).orderBy(col("value"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", sum(col("w")).over(
          Window.partitionBy(col("grp"))))
      val cuts = cum.crossJoin(broadcast(
          spark.range(1, 8).select(col("id").as("i"))))
        .filter(col("cw") >= greatest(expr("(i * n) div 8"), lit(1L)))
        .groupBy(col("grp"), col("i")).agg(min(col("value")).as("bnd"))
      val cen = li.groupBy(col("rf").as("grp"), col("vv"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // census feeds totals, ties, assignment
      val tot = cen.groupBy(col("grp")).agg(sum(col("c")).as("n"),
        max(col("c")).as("maxc"))
      val parts = cen.join(broadcast(cuts), Seq("grp"))
        .groupBy(col("grp"), col("vv"), col("c"))
        .agg(sum(when(col("bnd") < col("vv"), 1L).otherwise(0L))
          .as("pid"))
        .groupBy(col("grp"), col("pid"))
        .agg(sum(col("c")).as("n_rows"))
      parts.join(broadcast(tot), Seq("grp"))
        .withColumn("expected", expr("n div 8"))
        .withColumn("dev", col("n_rows") - col("expected"))
        // 2 boundaries x shards*(k-1)=120 rank error, + the largest
        // value-tie (a boundary value lands whole), + 7 for the
        // floor(n/8) vs exact-eighths rounding drift
        .withColumn("within_bound",
          abs(col("dev")) <= lit(240L) + col("maxc") + 7)
        .select(col("grp").as("l_returnflag"), col("pid"),
          col("n_rows"), col("expected"), col("dev"),
          col("within_bound"))
        .orderBy(col("l_returnflag"), col("pid"))
    },


    // --- CACHE-TIER ADVISOR (the q326 utility rule pointed at the
    //     buffer pool): rank tables by access-weighted density
    //     (workload frequency per row), admit the density-ordered
    //     prefix that fits a 60%-of-corpus capacity, and report the
    //     workload fraction the cached tier captures. The 100 TB
    //     shape: table sizes are one metadata read each (here exact
    //     counts), the decision table is 10 rows, and the hot-tier
    //     placement that usually gets hand-tuned becomes a query.
    //     Density is an exact integer ratio; the prefix rule is one
    //     limit-protected cumulative window over the 10-row frame. ---
    "q330_cache_advisor" -> rounded("density" -> 6, "hit_frac" -> 6)({
      (spark, dir) =>
      val freqs = Seq("lineitem" -> 50L, "orders" -> 40L,
        "events" -> 30L, "documents" -> 12L, "embeddings" -> 9L,
        "customer" -> 8L, "part" -> 6L, "supplier" -> 4L,
        "nation" -> 2L, "region" -> 1L)
      val sizes = freqs.map { case (name, fq) =>
        tbl(spark, dir, name).agg(count(lit(1)).as("n_rows"))
          .select(lit(name).as("tname"), col("n_rows"),
            lit(fq).as("freq"))
      }.reduce(_ unionByName _)
      val cap = sizes.agg(expr("(sum(n_rows) * 6) div 10").as("__cap"),
        sum(col("freq")).as("__totf"))
      val base = sizes.crossJoin(broadcast(cap))
        .withColumn("density", col("freq").cast("double") /
          col("n_rows").cast("double"))
      // cumulative size in density-desc order via a broadcast
      // self-join over the catalog-bounded (10-row) frame — a global
      // window here would be the one anti-shape the plan audit bans,
      // and the frame is too small to deserve one
      val other = base.select(col("tname").as("__t2"),
        col("n_rows").as("__r2"), col("density").as("__d2"))
      val ranked = base.join(broadcast(other),
          col("__d2") > col("density") ||
          (col("__d2") === col("density") &&
            col("__t2") <= col("tname")))
        .groupBy(col("tname"), col("n_rows"), col("freq"),
          col("density"), col("__cap"), col("__totf"))
        .agg(sum(col("__r2")).as("cum_rows"))
        .withColumn("cached", col("cum_rows") <= col("__cap"))
      val hit = ranked.agg((sum(when(col("cached"), col("freq"))
          .otherwise(0L)).cast("double") /
          max(col("__totf")).cast("double")).as("__hit"))
      ranked.crossJoin(broadcast(hit))
        .select(col("tname"), col("n_rows"), col("freq"),
          col("density"), col("cum_rows"), col("cached"),
          col("__cap").as("cap_rows"), col("__hit").as("hit_frac"))
        .orderBy(col("tname"))
    }),


    // --- BLOOM-PREFILTER SIZING from KMV manifests (join prefilters
    //     are how a 100 TB fact scan skips rows whose key can't
    //     match a FILTERED dimension): each filtered dim's key count
    //     comes from its deterministic KMV sketch (exact under k
    //     keys, the (k−1)/t estimate above — both paths exercised
    //     across SFs), the bits-per-key menu carries the standard
    //     optimal-k false-positive rates, and each filter gets the
    //     best bpk whose table fits its bit share — or NO filter
    //     (bpk 0, fpp 1) when even 4 bpk doesn't fit, which the
    //     sf0.1 part/customer filters genuinely hit at this budget.
    //     Expected wasted fetches = fpp × true-negative probes. The
    //     decision reads three sketches and three count aggregates;
    //     no data is rescanned per candidate. ---
    "q332_bloom_planner" -> rounded("n_keys_est" -> 6,
        "expected_false" -> 6)({ (spark, dir) =>
      import spark.implicits._
      val k = 256
      def estF(name: String, d: DataFrame, key: Column) =
        Kmv.estimate(Kmv.sketch(d, key, k), k)
          .select(lit(name).as("fname"),
            col("distinct_est").as("n_keys_est"))
      val ests = estF("part", tbl(spark, dir, "part")
          .filter(pmod(col("p_partkey"), lit(10)) === 0),
          col("p_partkey"))
        .unionByName(estF("supplier", tbl(spark, dir, "supplier")
          .filter(pmod(col("s_suppkey"), lit(10)) === 0),
          col("s_suppkey")))
        .unionByName(estF("customer", tbl(spark, dir, "customer")
          .filter(pmod(col("c_custkey"), lit(10)) === 0),
          col("c_custkey")))
      val li = tbl(spark, dir, "lineitem")
      def pr(name: String, d: DataFrame, hitc: Column) =
        d.agg(count(lit(1)).as("probes"),
            sum(when(hitc, 1L).otherwise(0L)).as("matches"))
          .select(lit(name).as("fname"), col("probes"),
            col("matches"))
      val probes = pr("part", li,
          pmod(col("l_partkey"), lit(10)) === 0)
        .unionByName(pr("supplier", li,
          pmod(col("l_suppkey"), lit(10)) === 0))
        .unionByName(pr("customer", tbl(spark, dir, "orders"),
          pmod(col("o_custkey"), lit(10)) === 0))
      val menu = Seq((4L, 0.146), (8L, 0.0215), (12L, 0.00314),
        (16L, 0.000458)).toDF("bpk", "fpp")
      val fits = ests.crossJoin(broadcast(menu))
        .filter(ceil(col("n_keys_est") * col("bpk")) <= lit(2048L))
        .groupBy(col("fname")).agg(max(col("bpk")).as("bpk"))
      ests.join(fits, Seq("fname"), "left")
        .withColumn("bpk", coalesce(col("bpk"), lit(0L)))
        .join(broadcast(menu.withColumnRenamed("bpk", "__b")),
          col("bpk") === col("__b"), "left")
        .withColumn("fpp", coalesce(col("fpp"), lit(1.0)))
        .withColumn("bits", when(col("bpk") > 0,
          ceil(col("n_keys_est") * col("bpk"))).otherwise(0L))
        .join(probes, Seq("fname"))
        .withColumn("negatives", col("probes") - col("matches"))
        .withColumn("expected_false",
          col("fpp") * col("negatives").cast("double"))
        .select(col("fname"), col("n_keys_est"), col("bpk"),
          col("bits"), col("fpp"), col("probes"), col("negatives"),
          col("expected_false"))
        .orderBy(col("fname"))
    }),


    // --- SNAPSHOT-RETENTION planner (GFS-style keep-7-daily /
    //     4-weekly / 12-monthly, applied to table snapshots — the
    //     VACUUM/expire decision a lakehouse table makes): each day
    //     of the event stream is one snapshot; the policy keeps the
    //     last 7 days, the last day of each of the last 4 weeks, and
    //     the last day of each of the last 12 months, expiring
    //     everything else. Emits the full keep/expire manifest with
    //     per-rule attribution and the reclaimed-bytes headline —
    //     all date arithmetic and integer byte math, no data read
    //     beyond one day-grain aggregate. ---
    "q344_snapshot_retention" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val snaps = tbl(spark, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("bytes", col("n_rows") * 64L)
      val mx = snaps.agg(max(col("day")).as("__dmax"))
      val flagged = snaps.crossJoin(broadcast(mx))
        .withColumn("__wk", date_trunc("week", col("day")))
        .withColumn("__mo", date_trunc("month", col("day")))
        .withColumn("__wmax", max(col("day")).over(
          Window.partitionBy(col("__wk"))))
        .withColumn("__mmax", max(col("day")).over(
          Window.partitionBy(col("__mo"))))
        .withColumn("keep_daily",
          datediff(col("__dmax"), col("day")) < 7)
        .withColumn("keep_weekly",
          col("day") === col("__wmax") &&
            datediff(col("__dmax"), col("day")) < 28)
        .withColumn("keep_monthly",
          col("day") === col("__mmax") &&
            datediff(col("__dmax"), col("day")) < 365)
        .withColumn("kept", col("keep_daily") || col("keep_weekly") ||
          col("keep_monthly"))
      val heads = flagged.agg(
        sum(when(!col("kept"), col("bytes")).otherwise(0L))
          .as("__reclaimed"),
        sum(when(col("kept"), col("bytes")).otherwise(0L))
          .as("__kept"))
      flagged.crossJoin(broadcast(heads))
        .select(col("day"), col("n_rows"), col("bytes"),
          col("keep_daily"), col("keep_weekly"), col("keep_monthly"),
          col("kept"), col("__reclaimed").as("reclaimed_bytes"),
          col("__kept").as("kept_bytes"))
        .orderBy(col("day"))
    },


    // --- PARTITION-GRAIN advisor (the Iceberg/Hive partition-spec
    //     decision): bucket the stream at hour/day/week grain,
    //     estimate per-partition bytes, and pick the grain whose
    //     partitions mostly land in the target file-size band —
    //     too-fine grains drown in small files, too-coarse ones
    //     blow past the band, and the SWEET SPOT MOVES WITH VOLUME
    //     (a different grain wins at sf0.1 than at sf0.01, which is
    //     exactly why this is computed, not configured). One scan
    //     per grain over the same aggregate shape. ---
    "q345_partition_grain" -> rounded("in_band_frac" -> 6)({
      (spark, dir) =>
      val ev = tbl(spark, dir, "events").select(col("ts"))
      def grain(name: String): DataFrame =
        ev.groupBy(date_trunc(name, col("ts")).as("__p"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__bytes", col("__n") * 64L)
          .groupBy()
          .agg(count(lit(1)).as("n_partitions"),
            min(col("__bytes")).as("min_bytes"),
            max(col("__bytes")).as("max_bytes"),
            sum(when(col("__bytes").between(4096L, 65536L), 1L)
              .otherwise(0L)).as("n_in_band"))
          .withColumn("grain", lit(name))
      val per = grain("hour").unionByName(grain("day"))
        .unionByName(grain("week"))
        .withColumn("in_band_frac", col("n_in_band").cast("double") /
          col("n_partitions").cast("double"))
      val bf = per.agg(max(col("in_band_frac")).as("__bf"))
      val p2 = per.crossJoin(broadcast(bf))
      val bg = p2.filter(col("in_band_frac") === col("__bf"))
        .agg(min(col("grain")).as("__bg"))
      p2.crossJoin(broadcast(bg))
        .withColumn("chosen", col("grain") === col("__bg"))
        .select(col("grain"), col("n_partitions"), col("min_bytes"),
          col("max_bytes"), col("n_in_band"), col("in_band_frac"),
          col("chosen"))
        .orderBy(col("grain"))
    }),


    // --- ERASURE-IMPACT manifest (right-to-be-forgotten, planned
    //     before executed): for the deletion cohort (every 97th
    //     customer/user), the rows and bytes each table must erase —
    //     customers directly, orders by key, lineitems through the
    //     order semi-join, events by user. The manifest is what a
    //     deletion job and its auditor both read; at 100 TB it costs
    //     four counting scans (the lineitem one a key semi-join),
    //     never a rewrite. ---
    "q346_erasure_impact" -> rounded("frac" -> 6)({ (spark, dir) =>
      val cust = tbl(spark, dir, "customer")
        .filter(pmod(col("c_custkey"), lit(97)) === 0)
        .select(col("c_custkey"))
      val ord = tbl(spark, dir, "orders")
        .join(broadcast(cust),
          col("o_custkey") === col("c_custkey"), "left_semi")
      def census(name: String, hit: DataFrame, total: DataFrame) =
        hit.agg(count(lit(1)).as("n_erase"))
          .crossJoin(total.agg(count(lit(1)).as("__tot")))
          .select(lit(name).as("tname"), col("n_erase"),
            (col("n_erase") * 64L).as("bytes"),
            (col("n_erase").cast("double") /
              col("__tot").cast("double")).as("frac"))
      census("customer", cust, tbl(spark, dir, "customer"))
        .unionByName(census("orders", ord, tbl(spark, dir, "orders")))
        .unionByName(census("lineitem",
          tbl(spark, dir, "lineitem").join(
            broadcast(ord.select(col("o_orderkey"))),
            col("l_orderkey") === col("o_orderkey"), "left_semi"),
          tbl(spark, dir, "lineitem")))
        .unionByName(census("events",
          tbl(spark, dir, "events")
            .filter(pmod(col("user_id"), lit(97)) === 0),
          tbl(spark, dir, "events")))
        .orderBy(col("tname"))
    }),


    // --- REPLICA-PLACEMENT census (3-way replication over 4 racks,
    //     hash-homed): each of the 16 key shards gets a primary rack
    //     from its portable hash and two replicas on the next racks
    //     around the ring (never co-racked with the primary by
    //     construction). The census is what a placement audit reads:
    //     per rack, the homed shards, replica count, and total bytes
    //     hosted, with the balance flag (max/min hosted bytes ≤ 2×)
    //     that pages someone when a rack runs hot. Data contributes
    //     only the per-shard sizes — one aggregate. ---
    "q348_replica_placement" -> rounded("bytes_frac" -> 6)({
      (spark, dir) =>
      val kmv = graft.operators.Kmv
      val shards = tbl(spark, dir, "lineitem")
        .groupBy(pmod(col("l_orderkey"), lit(16L)).as("shard"))
        .agg((count(lit(1)) * 64L).as("bytes"))
        .withColumn("p", pmod(kmv.h48(col("shard")), lit(4L)))
      val placed = shards
        .select(col("shard"), col("bytes"), col("p").as("rack"),
          lit("primary").as("role"))
        .unionByName(shards.select(col("shard"), col("bytes"),
          pmod(col("p") + 1, lit(4L)).as("rack"),
          lit("replica").as("role")))
        .unionByName(shards.select(col("shard"), col("bytes"),
          pmod(col("p") + 2, lit(4L)).as("rack"),
          lit("replica").as("role")))
      val racks = placed.groupBy(col("rack"))
        .agg(sum(when(col("role") === "primary", 1L).otherwise(0L))
            .as("n_primary"),
          sum(when(col("role") === "replica", 1L).otherwise(0L))
            .as("n_replica"),
          sum(col("bytes")).as("hosted_bytes"))
      val tot = racks.agg(sum(col("hosted_bytes")).as("__tot"),
        max(col("hosted_bytes")).as("__mx"),
        min(col("hosted_bytes")).as("__mn"))
      racks.crossJoin(broadcast(tot))
        .withColumn("bytes_frac", col("hosted_bytes").cast("double") /
          col("__tot").cast("double"))
        .withColumn("balanced", col("__mx") <= col("__mn") * 2)
        .select(col("rack"), col("n_primary"), col("n_replica"),
          col("hosted_bytes"), col("bytes_frac"), col("balanced"))
        .orderBy(col("rack"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q287_hhi_concentration" -> """
      WITH rev AS (SELECT l_partkey, l_suppkey,
                          CAST(sum(CAST(round(l_extendedprice * 100)
                            AS BIGINT)) AS BIGINT) AS r
                   FROM lineitem GROUP BY 1, 2),
      h AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(r * r) AS BIGINT) AS hhi_num,
                   CAST(sum(r) AS BIGINT) AS tot
            FROM rev GROUP BY 1)
      SELECT l_partkey, n_suppliers, hhi_num,
             tot * tot AS hhi_den,
             CAST(hhi_num AS DOUBLE) / CAST(tot * tot AS DOUBLE)
               AS hhi
      FROM h WHERE n_suppliers >= 2
      ORDER BY hhi DESC, l_partkey LIMIT 50""",


    "q288_cohort_ltv" -> """
      WITH e AS (SELECT user_id,
                        CAST(date_trunc('week', ts) AS DATE) AS wk,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      c AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1),
      g AS (SELECT c.cohort_week,
                   date_diff('day', c.cohort_week, e.wk) // 7
                     AS weeks_since,
                   CAST(count(DISTINCT e.user_id) AS BIGINT)
                     AS n_users,
                   CAST(sum(e.cents) AS BIGINT) AS cents
            FROM e JOIN c USING (user_id) GROUP BY 1, 2)
      SELECT cohort_week, weeks_since, n_users, cents,
             CAST(sum(cents) OVER (PARTITION BY cohort_week
               ORDER BY weeks_since ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_cents
      FROM g ORDER BY 1, 2""",


    "q289_discount_response" -> """
      WITH rws AS (SELECT o.o_orderpriority,
                          CAST(round(l.l_discount * 10000) AS BIGINT)
                            AS x,
                          CAST(round(l.l_quantity) AS BIGINT) AS y
                   FROM lineitem l JOIN orders o
                     ON o.o_orderkey = l.l_orderkey),
      s AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM rws GROUP BY 1)
      SELECT o_orderpriority, n,
             n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS den_x,
             n * syy - sy * sy AS den_y,
             CASE WHEN n * sxx - sx * sx > 0 AND
                       n * syy - sy * sy > 0 THEN
               CAST(n * sxy - sx * sy AS DOUBLE) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                  sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             END AS r
      FROM s ORDER BY o_orderpriority""",


    "q291_conversion_latency" -> """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                 FROM events),
      fv AS (SELECT user_id, min(us) AS v FROM e
             WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT fv.user_id, fv.v,
                   min(CASE WHEN p.us >= fv.v THEN p.us END) AS fp
            FROM fv LEFT JOIN (SELECT user_id, us FROM e
              WHERE event_type = 'purchase') p
              ON p.user_id = fv.user_id
            GROUP BY 1, 2),
      d AS (SELECT user_id, CASE WHEN fp IS NULL THEN NULL
                   ELSE (fp - v) // 86400000000 END AS delay_days
            FROM c),
      cen AS (SELECT delay_days AS v, CAST(count(*) AS BIGINT) AS w
              FROM d WHERE delay_days IS NOT NULL GROUP BY 1),
      cum AS (SELECT x.v, CAST(sum(y.w) AS BIGINT) AS cw
              FROM cen x JOIN cen y ON y.v <= x.v GROUP BY 1),
      tw AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM cen),
      p AS (SELECT CAST(min(v) AS BIGINT) AS p50_days
            FROM cum CROSS JOIN tw WHERE cw * 2 >= t)
      SELECT CAST(count(*) AS BIGINT) AS n_viewers,
             CAST(sum(CASE WHEN delay_days IS NOT NULL THEN 1 ELSE 0
               END) AS BIGINT) AS n_converted,
             CAST(max(delay_days) AS BIGINT) AS max_days,
             (SELECT p50_days FROM p) AS p50_days,
             CAST(sum(CASE WHEN delay_days IS NOT NULL THEN 1 ELSE 0
               END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS conversion_frac
      FROM d""",


    "q292_revenue_waterfall" -> """
      WITH l AS (SELECT l_returnflag,
                        CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS gross,
                        CAST(round(l_extendedprice * l_discount * 100)
                          AS BIGINT) AS disc,
                        CAST(round(l_extendedprice * (1 - l_discount)
                          * l_tax * 100) AS BIGINT) AS tax
                 FROM lineitem)
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(gross) AS BIGINT) AS gross_cents,
             CAST(sum(disc) AS BIGINT) AS discount_cents,
             CAST(sum(tax) AS BIGINT) AS tax_cents,
             CAST(sum(gross - disc + tax) AS BIGINT) AS net_cents
      FROM l GROUP BY 1 ORDER BY 1""",

    // full relational replay: per-(half, shard) rank-spaced summaries
    // -> union merge -> integer-threshold selection -> exact twin ->
    // rank-error-bound flag, all exact integers
    "q294_quantile_manifest" -> """
      WITH b AS (SELECT event_type AS grp,
                        CAST(round(value * 100) AS BIGINT) AS v,
                        event_id AS t,
                        event_id % 2 AS half, event_id % 8 AS sh
                 FROM events),
      r AS (SELECT grp, v, half, sh,
                   row_number() OVER (PARTITION BY grp, half, sh
                     ORDER BY v, t) AS rn,
                   count(*) OVER (PARTITION BY grp, half, sh) AS nn
            FROM b),
      s AS (SELECT grp, v AS value, least(16, nn - rn + 1) AS w
            FROM r WHERE (rn - 1) % 16 = 0),
      agg AS (SELECT grp, value, CAST(sum(w) AS BIGINT) AS w
              FROM s GROUP BY 1, 2),
      c AS (SELECT grp, value,
                   CAST(sum(w) OVER (PARTITION BY grp ORDER BY value
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
                   CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS n
            FROM agg),
      qq AS (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) AS t(q)),
      appx AS (SELECT grp, q, min(value) AS approx_cents, max(n) AS n
               FROM c CROSS JOIN qq
               WHERE cw >= greatest(
                 CAST(ceil(q * n - 1e-9) AS BIGINT), 1)
               GROUP BY 1, 2),
      wt AS (SELECT grp, q, approx_cents, n,
                    CAST(ceil(q * n - 1e-9) AS BIGINT) AS tgt
             FROM appx),
      rawc AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
               FROM b GROUP BY 1, 2),
      rcum AS (SELECT grp, v, c,
                      CAST(sum(c) OVER (PARTITION BY grp ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM rawc),
      ex AS (SELECT w2.grp, w2.q, min(r2.v) AS exact_cents
             FROM wt w2 JOIN rcum r2 ON r2.grp = w2.grp
               AND r2.cum >= greatest(w2.tgt, 1)
             GROUP BY 1, 2),
      le AS (SELECT w2.grp, w2.q, r2.cum AS rank_le, r2.c AS c_at
             FROM wt w2 JOIN rcum r2 ON r2.grp = w2.grp
               AND r2.v = w2.approx_cents),
      parts AS (SELECT grp, CAST(count(DISTINCT half * 10 + sh)
                  AS BIGINT) AS np
                FROM b GROUP BY 1)
      SELECT w2.grp AS event_type, w2.q AS q, w2.approx_cents,
             e.exact_cents, w2.n, l.rank_le, w2.tgt,
             (l.rank_le - l.c_at < w2.tgt
              AND l.rank_le >= w2.tgt - p.np * 15) AS within_bound
      FROM wt w2
      JOIN ex e ON e.grp = w2.grp AND e.q = w2.q
      JOIN le l ON l.grp = w2.grp AND l.q = w2.q
      JOIN parts p ON p.grp = w2.grp
      ORDER BY 1, 2""",

    // zones = value ranges; skip = any conjunct's band disjoint from
    // the zone's min/max box — exact integer censuses per layout
    "q296_zone_skip" -> """
      WITH b AS (SELECT l_orderkey,
                   CAST(date_diff('day', DATE '1992-01-01',
                     CAST(l_shipdate AS DATE)) AS BIGINT) AS dy,
                   CAST(l_partkey % 1024 AS BIGINT) AS pk
                 FROM lineitem),
      zz AS (SELECT l_orderkey, dy, pk,
               CAST(list_sum(list_transform(generate_series(0, 11),
                 i -> (((dy >> i) & 1) << (2 * i)) +
                      (((pk >> i) & 1) << (2 * i + 1)))) AS BIGINT)
                 AS z
             FROM b),
      lay AS (SELECT 'natural' AS layout, l_orderkey // 2048 AS zone,
                     dy, pk FROM zz
              UNION ALL
              SELECT 'bydate', dy // 32, dy, pk FROM zz
              UNION ALL
              SELECT 'zorder', z // 65536, dy, pk FROM zz),
      zc AS (SELECT layout, zone, min(dy) AS mnd, max(dy) AS mxd,
                    min(pk) AS mnp, max(pk) AS mxp,
                    CAST(count(*) AS BIGINT) AS nr
             FROM lay GROUP BY 1, 2),
      cen AS (SELECT layout, CAST(count(*) AS BIGINT) AS n_zones,
                CAST(sum(CASE WHEN mxd < 1500 OR mnd > 1600
                    OR mxp < 100 OR mnp > 200 THEN 1 ELSE 0 END)
                  AS BIGINT) AS zones_skipped,
                CAST(sum(nr) AS BIGINT) AS rows_total,
                CAST(sum(CASE WHEN mxd < 1500 OR mnd > 1600
                    OR mxp < 100 OR mnp > 200 THEN nr ELSE 0 END)
                  AS BIGINT) AS rows_skipped
              FROM zc GROUP BY 1),
      m AS (SELECT CAST(sum(CASE WHEN dy BETWEEN 1500 AND 1600
                AND pk BETWEEN 100 AND 200 THEN 1 ELSE 0 END)
              AS BIGINT) AS rows_matching
            FROM b)
      SELECT layout, n_zones, zones_skipped, rows_total,
             rows_skipped, m.rows_matching
      FROM cen CROSS JOIN m ORDER BY layout""",

    // histogram containment estimates vs exact key-census products;
    // // is DuckDB integer floor-div, matching Spark's div on the
    // same non-negative longs
    "q297_join_cardinality" -> """
      WITH h1a AS (SELECT l_orderkey % 64 AS bucket,
                     CAST(count(*) AS BIGINT) AS ra,
                     CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ka
                   FROM lineitem GROUP BY 1),
      h1b AS (SELECT o_orderkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS rb,
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS kb
              FROM orders GROUP BY 1),
      e1 AS (SELECT CAST(sum((ra * rb) // greatest(ka, kb))
               AS BIGINT) AS est
             FROM h1a JOIN h1b USING (bucket)),
      a1 AS (SELECT CAST(sum(ca * cb) AS BIGINT) AS actual
             FROM (SELECT l_orderkey AS k, count(*) AS ca
                   FROM lineitem GROUP BY 1) x
             JOIN (SELECT o_orderkey AS k, count(*) AS cb
                   FROM orders GROUP BY 1) y USING (k)),
      h2a AS (SELECT o_custkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS ra,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS ka
              FROM orders GROUP BY 1),
      h2b AS (SELECT c_custkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS rb,
                CAST(count(DISTINCT c_custkey) AS BIGINT) AS kb
              FROM customer GROUP BY 1),
      e2 AS (SELECT CAST(sum((ra * rb) // greatest(ka, kb))
               AS BIGINT) AS est
             FROM h2a JOIN h2b USING (bucket)),
      a2 AS (SELECT CAST(sum(ca * cb) AS BIGINT) AS actual
             FROM (SELECT o_custkey AS k, count(*) AS ca
                   FROM orders GROUP BY 1) x
             JOIN (SELECT c_custkey AS k, count(*) AS cb
                   FROM customer GROUP BY 1) y USING (k))
      SELECT 'lineitem_orders' AS join_name, e1.est, a1.actual,
             round(CAST(e1.est AS DOUBLE) / CAST(a1.actual AS DOUBLE),
               6) AS ratio
      FROM e1 CROSS JOIN a1
      UNION ALL
      SELECT 'orders_customer', e2.est, a2.actual,
             round(CAST(e2.est AS DOUBLE) / CAST(a2.actual AS DOUBLE),
               6)
      FROM e2 CROSS JOIN a2
      UNION ALL
      SELECT 'lineitem_suppkey_self', e3.est, a3.actual,
             round(CAST(e3.est AS DOUBLE) / CAST(a3.actual AS DOUBLE),
               6)
      FROM (SELECT CAST(sum((ra * ra) // ka) AS BIGINT) AS est
            FROM (SELECT l_suppkey % 64 AS bucket,
                    CAST(count(*) AS BIGINT) AS ra,
                    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ka
                  FROM lineitem GROUP BY 1)) e3
      CROSS JOIN (SELECT CAST(sum(ca * ca) AS BIGINT) AS actual
                  FROM (SELECT l_suppkey, count(*) AS ca
                        FROM lineitem GROUP BY 1)) a3
      UNION ALL
      SELECT 'events_user_self', e4.est, a4.actual,
             round(CAST(e4.est AS DOUBLE) / CAST(a4.actual AS DOUBLE),
               6)
      FROM (SELECT CAST(sum((ra * ra) // ka) AS BIGINT) AS est
            FROM (SELECT user_id % 64 AS bucket,
                    CAST(count(*) AS BIGINT) AS ra,
                    CAST(count(DISTINCT user_id) AS BIGINT) AS ka
                  FROM events GROUP BY 1)) e4
      CROSS JOIN (SELECT CAST(sum(ca * ca) AS BIGINT) AS actual
                  FROM (SELECT user_id, count(*) AS ca
                        FROM events GROUP BY 1)) a4
      ORDER BY 1""",

    // A -> B iff ndv(A) = ndv(A,B); DuckDB's count(DISTINCT (a, b))
    // over a row-tuple mirrors Spark's count_distinct(struct(a, b))
    "q298_fd_discovery" -> """
      WITH c AS (
        SELECT 'orders.o_orderkey->o_custkey' AS candidate,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv_a,
               CAST(count(DISTINCT (o_orderkey, o_custkey))
                 AS BIGINT) AS ndv_ab
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderkey->o_orderpriority',
               CAST(count(DISTINCT o_orderkey) AS BIGINT),
               CAST(count(DISTINCT (o_orderkey, o_orderpriority))
                 AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey->o_orderpriority',
               CAST(count(DISTINCT o_custkey) AS BIGINT),
               CAST(count(DISTINCT (o_custkey, o_orderpriority))
                 AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem.l_orderkey->l_returnflag',
               CAST(count(DISTINCT l_orderkey) AS BIGINT),
               CAST(count(DISTINCT (l_orderkey, l_returnflag))
                 AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.l_partkey->l_suppkey',
               CAST(count(DISTINCT l_partkey) AS BIGINT),
               CAST(count(DISTINCT (l_partkey, l_suppkey))
                 AS BIGINT)
        FROM lineitem)
      SELECT candidate, ndv_a, ndv_ab,
             (ndv_ab = ndv_a) AS fd_holds,
             (ndv_ab - ndv_a) AS violations
      FROM c ORDER BY candidate""",

    // fresh z-zones vs aged (10% unsorted tail) under the q296 band
    "q299_zone_decay" -> """
      WITH b AS (SELECT l_orderkey,
                   CAST(date_diff('day', DATE '1992-01-01',
                     CAST(l_shipdate AS DATE)) AS BIGINT) AS dy,
                   CAST(l_partkey % 1024 AS BIGINT) AS pk
                 FROM lineitem),
      zz AS (SELECT l_orderkey, dy, pk,
               CAST(list_sum(list_transform(generate_series(0, 11),
                 i -> (((dy >> i) & 1) << (2 * i)) +
                      (((pk >> i) & 1) << (2 * i + 1)))) AS BIGINT)
                 AS z
             FROM b),
      lay AS (SELECT 'fresh' AS layout, z // 65536 AS zone, dy, pk
              FROM zz
              UNION ALL
              SELECT 'aged',
                     CASE WHEN l_orderkey % 10 = 9
                          THEN 10000 + l_orderkey // 2048
                          ELSE z // 65536 END,
                     dy, pk
              FROM zz),
      zc AS (SELECT layout, zone, min(dy) AS mnd, max(dy) AS mxd,
                    min(pk) AS mnp, max(pk) AS mxp,
                    CAST(count(*) AS BIGINT) AS nr
             FROM lay GROUP BY 1, 2)
      SELECT layout, CAST(count(*) AS BIGINT) AS n_zones,
             CAST(sum(CASE WHEN mxd < 1500 OR mnd > 1600
                 OR mxp < 100 OR mnp > 200 THEN 1 ELSE 0 END)
               AS BIGINT) AS zones_skipped,
             CAST(sum(CASE WHEN mxd < 1500 OR mnd > 1600
                 OR mxp < 100 OR mnp > 200 THEN nr ELSE 0 END)
               AS BIGINT) AS rows_skipped,
             CAST(sum(CASE WHEN mxd < 1500 OR mnd > 1600
                 OR mxp < 100 OR mnp > 200 THEN 0 ELSE nr END)
               AS BIGINT) AS rows_scanned
      FROM zc GROUP BY 1 ORDER BY 1""",

    // every manifest family replayed relationally; halves merge
    // additively (fingerprints/KMV proved half-merge ≡ whole by
    // construction; quantile/MG partitions keyed by event_id % 4,
    // which implies the % 2 half split)
    "q300_manifest_health" -> """
      WITH ev AS (SELECT event_type AS grp, user_id, event_id,
                         CAST(round(value * 100) AS BIGINT) AS cents,
                         event_id % 4 AS sh
                  FROM events),
      r AS (SELECT grp,
              (CAST(strlen(CAST(event_id AS VARCHAR)) AS VARCHAR)
               || ':' || CAST(event_id AS VARCHAR)) ||
              (CAST(strlen(CAST(cents AS VARCHAR)) AS VARCHAR)
               || ':' || CAST(cents AS VARCHAR)) AS rend
            FROM ev),
      vol AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(sum(CAST(('0x' || substring(md5(rend), 1, 8))
                       AS BIGINT) % 2147483647) % 2147483647
                       AS BIGINT) AS fp
              FROM r GROUP BY 1),
      kh AS (SELECT DISTINCT CAST(('0x' || substring(md5(
               CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
             FROM ev),
      kk AS (SELECT h FROM kh ORDER BY h LIMIT 256),
      kagg AS (SELECT count(*) AS c, max(h) AS hk FROM kk),
      kest AS (SELECT CASE WHEN c < 256 THEN CAST(c AS DOUBLE)
                           ELSE CAST(255 AS DOUBLE)
                                * CAST(281474976710656 AS DOUBLE)
                                / CAST(hk AS DOUBLE) END AS e
               FROM kagg),
      qr AS (SELECT grp, cents AS v, event_id AS t, sh,
                    row_number() OVER (PARTITION BY grp, sh
                      ORDER BY cents, event_id) AS rn,
                    count(*) OVER (PARTITION BY grp, sh) AS nn
             FROM ev),
      qs AS (SELECT grp, v AS value, least(32, nn - rn + 1) AS w
             FROM qr WHERE (rn - 1) % 32 = 0),
      qa AS (SELECT grp, value, CAST(sum(w) AS BIGINT) AS w
             FROM qs GROUP BY 1, 2),
      qc AS (SELECT grp, value,
                    CAST(sum(w) OVER (PARTITION BY grp ORDER BY value
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
                    CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT)
                      AS n
             FROM qa),
      qq AS (SELECT * FROM (VALUES (0.5), (0.95)) AS t(q)),
      qans AS (SELECT grp, q, min(value) AS value
               FROM qc CROSS JOIN qq
               WHERE cw >= greatest(
                 CAST(ceil(q * n - 1e-9) AS BIGINT), 1)
               GROUP BY 1, 2),
      fc AS (SELECT grp, sh, user_id AS v,
                    CAST(count(*) AS BIGINT) AS c
             FROM ev GROUP BY 1, 2, 3),
      fr AS (SELECT grp, sh, v, c,
                    row_number() OVER (PARTITION BY grp, sh
                      ORDER BY c DESC, v ASC) AS rn
             FROM fc),
      ft AS (SELECT grp, sh,
                    coalesce(max(CASE WHEN rn = 9 THEN c END), 0)
                      AS th
             FROM fr GROUP BY 1, 2),
      fs AS (SELECT r2.grp, r2.v,
                    CAST(sum(r2.c - t2.th) AS BIGINT) AS est
             FROM fr r2 JOIN ft t2 USING (grp, sh)
             WHERE r2.rn <= 8 AND r2.c - t2.th > 0
             GROUP BY 1, 2),
      ftop AS (SELECT grp, v, est FROM
                 (SELECT grp, v, est, row_number() OVER (
                    PARTITION BY grp ORDER BY est DESC, v ASC) AS rnk
                  FROM fs)
               WHERE rnk <= 1)
      SELECT * FROM (
        SELECT 'volume' AS section, grp, 'n_rows' AS metric,
               CAST(n_rows AS DOUBLE) AS value FROM vol
        UNION ALL
        SELECT 'volume', grp, 'fp', CAST(fp AS DOUBLE) FROM vol
        UNION ALL
        SELECT 'distinct', 'all', 'users_est', round(e, 6) FROM kest
        UNION ALL
        SELECT 'distribution', grp,
               CASE WHEN q = 0.5 THEN 'p50_cents'
                    ELSE 'p95_cents' END,
               CAST(value AS DOUBLE) FROM qans
        UNION ALL
        SELECT 'frequency', grp, 'top_user_id', CAST(v AS DOUBLE)
        FROM ftop
        UNION ALL
        SELECT 'frequency', grp, 'top_user_est', CAST(est AS DOUBLE)
        FROM ftop
      ) ORDER BY section, grp, metric""",


    "q315_join_planner" -> """
      WITH h AS (SELECT greatest(0, least(21,
                     (CAST(floor(c_acctbal) AS BIGINT) - (-1000)) // 500
                   )) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows
                 FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
      cuts AS (SELECT CAST(cut AS BIGINT) AS cut FROM (VALUES (-500),
                 (0), (1000), (3000), (9000), (11000)) AS t(cut)),
      prm AS (SELECT cut,
                greatest(0, least(21, (cut - (-1000)) // 500)) AS cb
              FROM cuts),
      prm2 AS (SELECT cut, cb,
                 greatest(0, least(500, cut - (-1000 + cb * 500)))
                   AS frac
               FROM prm),
      est AS (SELECT p.cut,
                CAST(sum(CASE WHEN h.bucket < p.cb THEN h.n_rows
                              WHEN h.bucket = p.cb
                                THEN (h.n_rows * p.frac) // 500
                              ELSE 0 END) AS BIGINT) AS est_rows
              FROM prm2 p CROSS JOIN h GROUP BY 1),
      tr AS (SELECT c.cut,
               CAST(count(*) FILTER (
                 WHERE floor(cu.c_acctbal) < c.cut) AS BIGINT)
                 AS true_rows
             FROM cuts c CROSS JOIN customer cu GROUP BY 1)
      SELECT e.cut, e.est_rows, t.true_rows,
             e.est_rows * 200 AS est_bytes,
             e.est_rows * 200 <= 100000 AS bcast_100kb,
             e.est_rows * 200 <= 1000000 AS bcast_1mb
      FROM est e JOIN tr t USING (cut) ORDER BY cut""",


    "q316_selective_recompute" -> """
      WITH b AS (SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   event_id % 16 AS shard
                 FROM events),
      v2 AS (SELECT event_id, event_type, shard,
               CASE WHEN (shard = 3 OR shard = 7) AND event_id % 5 = 0
                    THEN cents + 1 ELSE cents END AS cents
             FROM b),
      h1 AS (SELECT shard,
               CAST(('0x' || substring(md5(
                 CAST(strlen(CAST(event_id AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(event_id AS VARCHAR) ||
                 (CASE WHEN event_type IS NULL THEN 'N'
                       ELSE CAST(strlen(event_type) AS VARCHAR)
                            || ':' || event_type END) ||
                 CAST(strlen(CAST(cents AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(cents AS VARCHAR)), 1, 8))
                 AS BIGINT) % 2147483647 AS hh
             FROM b),
      h2 AS (SELECT shard,
               CAST(('0x' || substring(md5(
                 CAST(strlen(CAST(event_id AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(event_id AS VARCHAR) ||
                 (CASE WHEN event_type IS NULL THEN 'N'
                       ELSE CAST(strlen(event_type) AS VARCHAR)
                            || ':' || event_type END) ||
                 CAST(strlen(CAST(cents AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(cents AS VARCHAR)), 1, 8))
                 AS BIGINT) % 2147483647 AS hh
             FROM v2),
      m1 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(hh) % 2147483647 AS BIGINT) AS fp
             FROM h1 GROUP BY 1),
      m2 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(hh) % 2147483647 AS BIGINT) AS fp
             FROM h2 GROUP BY 1),
      stale AS (SELECT m1.shard FROM m1 JOIN m2 USING (shard)
                WHERE m1.fp <> m2.fp OR m1.n <> m2.n),
      ns AS (SELECT CAST(count(*) AS BIGINT) AS n_stale_shards
             FROM stale)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents, ns.n_stale_shards
      FROM v2 CROSS JOIN ns
      GROUP BY event_type, ns.n_stale_shards
      ORDER BY event_type""",


    "q321_join_order" -> """
      WITH h1a AS (SELECT l_orderkey % 64 AS bucket,
                     CAST(count(*) AS BIGINT) AS ra,
                     CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ka
                   FROM lineitem GROUP BY 1),
      h1b AS (SELECT o_orderkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS rb,
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS kb
              FROM orders GROUP BY 1),
      e1 AS (SELECT CAST(sum((ra * rb) // greatest(ka, kb))
               AS BIGINT) AS est
             FROM h1a JOIN h1b USING (bucket)),
      a1 AS (SELECT CAST(sum(ca * cb) AS BIGINT) AS actual
             FROM (SELECT l_orderkey AS k, count(*) AS ca
                   FROM lineitem GROUP BY 1) x
             JOIN (SELECT o_orderkey AS k, count(*) AS cb
                   FROM orders GROUP BY 1) y USING (k)),
      h2a AS (SELECT l_suppkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS ra,
                CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ka
              FROM lineitem GROUP BY 1),
      h2b AS (SELECT s_suppkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS rb,
                CAST(count(DISTINCT s_suppkey) AS BIGINT) AS kb
              FROM supplier GROUP BY 1),
      e2 AS (SELECT CAST(sum((ra * rb) // greatest(ka, kb))
               AS BIGINT) AS est
             FROM h2a JOIN h2b USING (bucket)),
      a2 AS (SELECT CAST(sum(ca * cb) AS BIGINT) AS actual
             FROM (SELECT l_suppkey AS k, count(*) AS ca
                   FROM lineitem GROUP BY 1) x
             JOIN (SELECT s_suppkey AS k, count(*) AS cb
                   FROM supplier GROUP BY 1) y USING (k)),
      h3a AS (SELECT o_custkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS ra,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS ka
              FROM orders GROUP BY 1),
      h3b AS (SELECT c_custkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS rb,
                CAST(count(DISTINCT c_custkey) AS BIGINT) AS kb
              FROM customer GROUP BY 1),
      e3 AS (SELECT CAST(sum((ra * rb) // greatest(ka, kb))
               AS BIGINT) AS est
             FROM h3a JOIN h3b USING (bucket)),
      a3 AS (SELECT CAST(sum(ca * cb) AS BIGINT) AS actual
             FROM (SELECT o_custkey AS k, count(*) AS ca
                   FROM orders GROUP BY 1) x
             JOIN (SELECT c_custkey AS k, count(*) AS cb
                   FROM customer GROUP BY 1) y USING (k)),
      census AS (
        SELECT 'li_orders' AS edge, e1.est, a1.actual
        FROM e1 CROSS JOIN a1
        UNION ALL
        SELECT 'li_supplier', e2.est, a2.actual
        FROM e2 CROSS JOIN a2
        UNION ALL
        SELECT 'orders_customer', e3.est, a3.actual
        FROM e3 CROSS JOIN a3),
      pick AS (SELECT edge AS chosen_edge FROM census
               ORDER BY est ASC, edge ASC LIMIT 1),
      fin AS (SELECT CAST(count(*) AS BIGINT) AS final_rows
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey)
      SELECT census.edge, census.est, census.actual,
             census.edge = pick.chosen_edge AS chosen,
             fin.final_rows
      FROM census CROSS JOIN pick CROSS JOIN fin
      ORDER BY census.edge""",


    "q322_backfill_planner" -> """
      WITH RECURSIVE
      b AS (SELECT event_id, event_type,
              CAST(round(value * 100) AS BIGINT) AS cents,
              event_id % 16 AS shard
            FROM events),
      v2 AS (SELECT event_id, event_type, shard,
               CASE WHEN (shard = 3 OR shard = 7) AND event_id % 5 = 0
                    THEN cents + 1 ELSE cents END AS cents
             FROM b),
      h1 AS (SELECT shard,
               CAST(('0x' || substring(md5(
                 CAST(strlen(CAST(event_id AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(event_id AS VARCHAR) ||
                 (CASE WHEN event_type IS NULL THEN 'N'
                       ELSE CAST(strlen(event_type) AS VARCHAR)
                            || ':' || event_type END) ||
                 CAST(strlen(CAST(cents AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(cents AS VARCHAR)), 1, 8))
                 AS BIGINT) % 2147483647 AS hh
             FROM b),
      h2 AS (SELECT shard,
               CAST(('0x' || substring(md5(
                 CAST(strlen(CAST(event_id AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(event_id AS VARCHAR) ||
                 (CASE WHEN event_type IS NULL THEN 'N'
                       ELSE CAST(strlen(event_type) AS VARCHAR)
                            || ':' || event_type END) ||
                 CAST(strlen(CAST(cents AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(cents AS VARCHAR)), 1, 8))
                 AS BIGINT) % 2147483647 AS hh
             FROM v2),
      m1 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(hh) % 2147483647 AS BIGINT) AS fp
             FROM h1 GROUP BY 1),
      m2 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(hh) % 2147483647 AS BIGINT) AS fp
             FROM h2 GROUP BY 1),
      seeds AS (SELECT 'shard_' || CAST(m1.shard AS VARCHAR) AS node
                FROM m1 JOIN m2 USING (shard)
                WHERE m1.fp <> m2.fp OR m1.n <> m2.n),
      edges AS (SELECT * FROM (VALUES
        ('shard_0', 'daily_lo'), ('shard_1', 'daily_lo'),
        ('shard_2', 'daily_lo'), ('shard_3', 'daily_lo'),
        ('shard_4', 'daily_lo'), ('shard_5', 'daily_lo'),
        ('shard_6', 'daily_lo'), ('shard_7', 'daily_lo'),
        ('shard_8', 'daily_hi'), ('shard_9', 'daily_hi'),
        ('shard_10', 'daily_hi'), ('shard_11', 'daily_hi'),
        ('shard_12', 'daily_hi'), ('shard_13', 'daily_hi'),
        ('shard_14', 'daily_hi'), ('shard_15', 'daily_hi'),
        ('daily_lo', 'weekly'), ('daily_hi', 'weekly'),
        ('weekly', 'dashboard'), ('daily_lo', 'quality_report'),
        ('shard_12', 'audit_extract')) AS t(src, dst)),
      nodes AS (SELECT DISTINCT node FROM (
                  SELECT src AS node FROM edges
                  UNION ALL SELECT dst FROM edges)),
      r AS (SELECT node, 0 AS hop FROM seeds
            UNION
            SELECT e.dst, r.hop + 1 FROM edges e
            JOIN r ON e.src = r.node),
      mh AS (SELECT node, CAST(min(hop) AS INT) AS hop
             FROM r GROUP BY 1)
      SELECT n.node, mh.hop IS NOT NULL AS stale,
             CAST(coalesce(mh.hop, -1) AS INT) AS wave
      FROM nodes n LEFT JOIN mh USING (node)
      ORDER BY n.node""",


    "q325_encoding_advisor" -> """
      WITH src AS (SELECT l_orderkey // 512 AS rg, l_orderkey AS ok,
                          l_linenumber AS ln, l_orderkey AS v1,
                          l_partkey AS v2, l_suppkey AS v3,
                          CAST(round(l_quantity) AS BIGINT) AS v4,
                          CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS v5,
                          CAST(date_diff('day', DATE '1970-01-01',
                            CAST(l_shipdate AS DATE)) AS BIGINT) AS v6,
                          (l_suppkey % 4) * 1000003 + 7 AS v7,
                          (l_orderkey // 512) * 1000 AS v8
                   FROM lineitem),
      m AS (SELECT rg, ok, ln, v2 AS t2, v3 AS t3, v4 AS t4,
                   v5 AS t5, v6 AS t6, 'l_orderkey' AS colname,
                   v1 AS v
              FROM src
            UNION ALL SELECT rg, ok, ln, v2, v3, v4, v5, v6,
              'l_partkey', v2 FROM src
            UNION ALL SELECT rg, ok, ln, v2, v3, v4, v5, v6,
              'l_suppkey', v3 FROM src
            UNION ALL SELECT rg, ok, ln, v2, v3, v4, v5, v6,
              'l_quantity', v4 FROM src
            UNION ALL SELECT rg, ok, ln, v2, v3, v4, v5, v6,
              'l_extendedprice', v5 FROM src
            UNION ALL SELECT rg, ok, ln, v2, v3, v4, v5, v6,
              'l_shipdate', v6 FROM src
            UNION ALL SELECT rg, ok, ln, v2, v3, v4, v5, v6,
              'status_code', v7 FROM src
            UNION ALL SELECT rg, ok, ln, v2, v3, v4, v5, v6,
              'batch_id', v8 FROM src),
      w AS (SELECT rg, colname, v,
                   CASE WHEN lag(v) OVER win IS NOT NULL
                         AND v <> lag(v) OVER win THEN 1 ELSE 0 END
                     AS chg,
                   abs(v - lag(v) OVER win) AS ad
            FROM m WINDOW win AS (PARTITION BY colname, rg
              ORDER BY ok, ln, t2, t3, t4, t5, t6)),
      g AS (SELECT colname, rg, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT v) AS BIGINT) AS nd,
                   CAST(sum(chg) + 1 AS BIGINT) AS runs,
                   max(ad) AS maxd, max(v) AS maxv
            FROM w GROUP BY 1, 2),
      b AS (SELECT colname,
                   (n * length(bin(maxv)) + 7) // 8 AS bp,
                   runs * ((length(bin(maxv)) + 7) // 8 + 2) AS br,
                   nd * ((length(bin(maxv)) + 7) // 8) +
                     (n * length(bin(nd - 1)) + 7) // 8 AS bd,
                   (length(bin(maxv)) + 7) // 8 + CASE WHEN n = 1
                     THEN 0 ELSE
                     ((n - 1) * (length(bin(maxd)) + 1) + 7) // 8
                   END AS bdel
            FROM g),
      s AS (SELECT colname, CAST(count(*) AS BIGINT) AS n_rowgroups,
                   CAST(sum(bp) AS BIGINT) AS bytes_plain,
                   CAST(sum(br) AS BIGINT) AS bytes_rle,
                   CAST(sum(bd) AS BIGINT) AS bytes_dict,
                   CAST(sum(bdel) AS BIGINT) AS bytes_delta
            FROM b GROUP BY 1)
      SELECT colname, n_rowgroups, bytes_plain, bytes_rle,
             bytes_dict, bytes_delta,
             CASE WHEN bytes_plain <= least(bytes_rle, bytes_dict,
                    bytes_delta) THEN 'plain'
                  WHEN bytes_rle <= least(bytes_dict, bytes_delta)
                    THEN 'rle'
                  WHEN bytes_dict <= bytes_delta THEN 'dict'
                  ELSE 'delta' END AS best
      FROM s ORDER BY colname""",


    "q326_mv_advisor" -> """
      WITH e AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
                        user_id % 16 AS ub FROM events),
      base AS (SELECT CAST(count(*) AS BIGINT) AS b FROM e),
      cands AS (
        SELECT 1 AS mask, CAST(count(*) AS BIGINT) AS mv_rows
          FROM (SELECT DISTINCT et FROM e)
        UNION ALL SELECT 2, CAST(count(*) AS BIGINT)
          FROM (SELECT DISTINCT day FROM e)
        UNION ALL SELECT 3, CAST(count(*) AS BIGINT)
          FROM (SELECT DISTINCT et, day FROM e)
        UNION ALL SELECT 4, CAST(count(*) AS BIGINT)
          FROM (SELECT DISTINCT ub FROM e)
        UNION ALL SELECT 5, CAST(count(*) AS BIGINT)
          FROM (SELECT DISTINCT et, ub FROM e)
        UNION ALL SELECT 6, CAST(count(*) AS BIGINT)
          FROM (SELECT DISTINCT day, ub FROM e)
        UNION ALL SELECT 7, CAST(count(*) AS BIGINT)
          FROM (SELECT DISTINCT et, day, ub FROM e)),
      wl(qmask, freq) AS (VALUES (0, 30), (1, 20), (2, 10), (3, 15),
        (4, 5), (5, 4), (6, 3), (7, 2)),
      sc AS (SELECT c.mask, c.mv_rows,
                    CAST(count(*) AS BIGINT) AS n_queries,
                    CAST(sum(w.freq * (base.b - c.mv_rows))
                      AS BIGINT) AS benefit
             FROM cands c CROSS JOIN base
             JOIN wl w ON (w.qmask & c.mask) = w.qmask
             GROUP BY 1, 2),
      ut AS (SELECT *, benefit * 1.0 / mv_rows AS u FROM sc),
      best AS (SELECT mask AS bm FROM ut
               ORDER BY u DESC, mask ASC LIMIT 1)
      SELECT CAST(ut.mask AS BIGINT) AS mask,
             CASE ut.mask WHEN 1 THEN 'event_type' WHEN 2 THEN 'day'
               WHEN 3 THEN 'event_type+day' WHEN 4 THEN 'user_bucket'
               WHEN 5 THEN 'event_type+user_bucket'
               WHEN 6 THEN 'day+user_bucket'
               ELSE 'event_type+day+user_bucket' END AS dims,
             ut.mv_rows, ut.n_queries, ut.benefit,
             round(ut.u, 6) AS utility,
             (ut.mask = best.bm) AS chosen
      FROM ut CROSS JOIN best ORDER BY ut.mask""",


    "q328_sortkey_advisor" -> """
      WITH li AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                    CAST(l_shipdate AS DATE)) AS BIGINT) AS sd,
                    l_partkey AS pk, l_suppkey AS sk FROM lineitem),
      z1 AS (SELECT 'l_shipdate' AS candidate,
                    ((l.sd - m.mn) * 64) // (m.mx - m.mn + 1) AS zone,
                    CAST(count(*) AS BIGINT) AS zn,
                    min(l.sd) AS mn_sd, max(l.sd) AS mx_sd,
                    min(l.pk) AS mn_pk, max(l.pk) AS mx_pk,
                    min(l.sk) AS mn_sk, max(l.sk) AS mx_sk
             FROM li l CROSS JOIN
               (SELECT min(sd) AS mn, max(sd) AS mx FROM li) m
             GROUP BY 1, 2),
      z2 AS (SELECT 'l_partkey',
                    ((l.pk - m.mn) * 64) // (m.mx - m.mn + 1),
                    CAST(count(*) AS BIGINT),
                    min(l.sd), max(l.sd), min(l.pk), max(l.pk),
                    min(l.sk), max(l.sk)
             FROM li l CROSS JOIN
               (SELECT min(pk) AS mn, max(pk) AS mx FROM li) m
             GROUP BY 1, 2),
      z3 AS (SELECT 'l_suppkey',
                    ((l.sk - m.mn) * 64) // (m.mx - m.mn + 1),
                    CAST(count(*) AS BIGINT),
                    min(l.sd), max(l.sd), min(l.pk), max(l.pk),
                    min(l.sk), max(l.sk)
             FROM li l CROSS JOIN
               (SELECT min(sk) AS mn, max(sk) AS mx FROM li) m
             GROUP BY 1, 2),
      zs AS (SELECT * FROM z1 UNION ALL SELECT * FROM z2
             UNION ALL SELECT * FROM z3),
      wl(wid, pcol, lo, hi, freq) AS (VALUES
        (1, 'sd', 8766, 9130, 10), (2, 'sd', 9496, 9586, 8),
        (3, 'pk', 100, 500, 4), (4, 'sk', 10, 20, 3),
        (5, 'sd', 9282, 9311, 6)),
      fl AS (SELECT z.candidate, w.freq, z.zn,
                    CASE w.pcol WHEN 'sd' THEN z.mn_sd
                      WHEN 'pk' THEN z.mn_pk ELSE z.mn_sk END AS mnp,
                    CASE w.pcol WHEN 'sd' THEN z.mx_sd
                      WHEN 'pk' THEN z.mx_pk ELSE z.mx_sk END AS mxp,
                    w.lo, w.hi
             FROM zs z CROSS JOIN wl w),
      per AS (SELECT candidate,
                     CAST(sum(freq * CASE WHEN mxp < lo OR mnp > hi
                       THEN 0 ELSE zn END) AS BIGINT)
                       AS weighted_scanned,
                     CAST(sum(freq * zn) AS BIGINT) AS weighted_total
              FROM fl GROUP BY 1),
      best AS (SELECT candidate AS bc FROM per
               ORDER BY weighted_scanned ASC, candidate ASC LIMIT 1)
      SELECT per.candidate, per.weighted_scanned, per.weighted_total,
             round(per.weighted_scanned * 1.0 / per.weighted_total, 6)
               AS scan_frac,
             (per.candidate = best.bc) AS chosen
      FROM per CROSS JOIN best ORDER BY per.candidate""",


    "q329_range_partition_planner" -> """
      WITH b AS (SELECT l_returnflag AS grp,
                        l_partkey * 131072 + l_orderkey * 8 +
                          l_linenumber AS vv,
                        l_orderkey * 8 + l_linenumber AS t
                 FROM lineitem),
      r AS (SELECT grp, vv,
                   row_number() OVER (PARTITION BY grp, t % 8
                     ORDER BY vv, t) AS rn,
                   count(*) OVER (PARTITION BY grp, t % 8) AS nn
            FROM b),
      s AS (SELECT grp, vv AS value, least(16, nn - rn + 1) AS w
            FROM r WHERE (rn - 1) % 16 = 0),
      agg AS (SELECT grp, value, CAST(sum(w) AS BIGINT) AS w
              FROM s GROUP BY 1, 2),
      c AS (SELECT grp, value,
                   CAST(sum(w) OVER (PARTITION BY grp ORDER BY value
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
                   CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT)
                     AS n
            FROM agg),
      ii AS (SELECT unnest(generate_series(1, 7)) AS i),
      cuts AS (SELECT grp, i, min(value) AS bnd
               FROM c CROSS JOIN ii
               WHERE cw >= greatest((i * n) // 8, 1)
               GROUP BY 1, 2),
      cen AS (SELECT grp, vv, CAST(count(*) AS BIGINT) AS c
              FROM b GROUP BY 1, 2),
      tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n,
                     CAST(max(c) AS BIGINT) AS maxc
              FROM cen GROUP BY 1),
      pidc AS (SELECT cen.grp, cen.vv, cen.c,
                      CAST(sum(CASE WHEN cuts.bnd < cen.vv
                        THEN 1 ELSE 0 END) AS BIGINT) AS pid
               FROM cen JOIN cuts USING (grp) GROUP BY 1, 2, 3),
      parts AS (SELECT grp, pid, CAST(sum(c) AS BIGINT) AS n_rows
                FROM pidc GROUP BY 1, 2)
      SELECT p.grp AS l_returnflag, p.pid, p.n_rows,
             t.n // 8 AS expected,
             p.n_rows - t.n // 8 AS dev,
             (abs(p.n_rows - t.n // 8) <= 240 + t.maxc + 7)
               AS within_bound
      FROM parts p JOIN tot t USING (grp)
      ORDER BY 1, 2""",


    "q330_cache_advisor" -> """
      WITH sz AS (
        SELECT 'lineitem' AS tname, CAST(count(*) AS BIGINT) AS rows_,
               50 AS freq FROM lineitem
        UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT), 40
          FROM orders
        UNION ALL SELECT 'events', CAST(count(*) AS BIGINT), 30
          FROM events
        UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT), 12
          FROM documents
        UNION ALL SELECT 'embeddings', CAST(count(*) AS BIGINT), 9
          FROM embeddings
        UNION ALL SELECT 'customer', CAST(count(*) AS BIGINT), 8
          FROM customer
        UNION ALL SELECT 'part', CAST(count(*) AS BIGINT), 6
          FROM part
        UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT), 4
          FROM supplier
        UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT), 2
          FROM nation
        UNION ALL SELECT 'region', CAST(count(*) AS BIGINT), 1
          FROM region),
      cap AS (SELECT (sum(rows_) * 6) // 10 AS cap_rows,
                     CAST(sum(freq) AS BIGINT) AS totf FROM sz),
      rk AS (SELECT sz.tname, sz.rows_, sz.freq, cap.cap_rows,
                    cap.totf, sz.freq * 1.0 / sz.rows_ AS density,
                    CAST(sum(sz.rows_) OVER (ORDER BY
                      sz.freq * 1.0 / sz.rows_ DESC, sz.tname ASC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                      AS cum_rows
             FROM sz CROSS JOIN cap),
      fl AS (SELECT *, (cum_rows <= cap_rows) AS cached FROM rk),
      hit AS (SELECT sum(CASE WHEN cached THEN freq ELSE 0 END)
                * 1.0 / max(totf) AS hit_frac FROM fl)
      SELECT fl.tname, fl.rows_ AS n_rows, fl.freq,
             round(fl.density, 6) AS density, fl.cum_rows, fl.cached,
             CAST(fl.cap_rows AS BIGINT) AS cap_rows,
             round(hit.hit_frac, 6) AS hit_frac
      FROM fl CROSS JOIN hit ORDER BY fl.tname""",


    "q332_bloom_planner" -> """
      WITH menu AS (
        SELECT 4 AS bpk, CAST(0.146 AS DOUBLE) AS fpp
        UNION ALL SELECT 8, CAST(0.0215 AS DOUBLE)
        UNION ALL SELECT 12, CAST(0.00314 AS DOUBLE)
        UNION ALL SELECT 16, CAST(0.000458 AS DOUBLE)),
      hp AS (SELECT DISTINCT CAST(('0x' || substring(md5(
               CAST(p_partkey AS VARCHAR)), 1, 12)) AS BIGINT) AS h
             FROM part WHERE p_partkey % 10 = 0),
      kp AS (SELECT h FROM hp ORDER BY h LIMIT 256),
      ep AS (SELECT 'part' AS fname,
               CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                    ELSE CAST(255 AS DOUBLE)
                         * CAST(281474976710656 AS DOUBLE)
                         / CAST(max(h) AS DOUBLE) END AS n_keys_est
             FROM kp),
      hs AS (SELECT DISTINCT CAST(('0x' || substring(md5(
               CAST(s_suppkey AS VARCHAR)), 1, 12)) AS BIGINT) AS h
             FROM supplier WHERE s_suppkey % 10 = 0),
      ks AS (SELECT h FROM hs ORDER BY h LIMIT 256),
      es AS (SELECT 'supplier' AS fname,
               CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                    ELSE CAST(255 AS DOUBLE)
                         * CAST(281474976710656 AS DOUBLE)
                         / CAST(max(h) AS DOUBLE) END AS n_keys_est
             FROM ks),
      hc AS (SELECT DISTINCT CAST(('0x' || substring(md5(
               CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT) AS h
             FROM customer WHERE c_custkey % 10 = 0),
      kc AS (SELECT h FROM hc ORDER BY h LIMIT 256),
      ec AS (SELECT 'customer' AS fname,
               CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                    ELSE CAST(255 AS DOUBLE)
                         * CAST(281474976710656 AS DOUBLE)
                         / CAST(max(h) AS DOUBLE) END AS n_keys_est
             FROM kc),
      ests AS (SELECT * FROM ep UNION ALL SELECT * FROM es
               UNION ALL SELECT * FROM ec),
      pr AS (
        SELECT 'part' AS fname, CAST(count(*) AS BIGINT) AS probes,
               CAST(sum(CASE WHEN l_partkey % 10 = 0 THEN 1 ELSE 0
                 END) AS BIGINT) AS matches
        FROM lineitem
        UNION ALL
        SELECT 'supplier', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN l_suppkey % 10 = 0 THEN 1 ELSE 0
                 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'customer', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_custkey % 10 = 0 THEN 1 ELSE 0
                 END) AS BIGINT)
        FROM orders),
      fits AS (SELECT e.fname, CAST(max(m.bpk) AS BIGINT) AS bpk
               FROM ests e JOIN menu m
                 ON ceil(e.n_keys_est * m.bpk) <= 2048
               GROUP BY 1),
      ch AS (SELECT e.fname, e.n_keys_est,
                    coalesce(f.bpk, 0) AS bpk
             FROM ests e LEFT JOIN fits f USING (fname)),
      ch2 AS (SELECT ch.fname, ch.n_keys_est, ch.bpk,
                     coalesce(m.fpp, CAST(1.0 AS DOUBLE)) AS fpp,
                     CASE WHEN ch.bpk > 0 THEN
                       CAST(ceil(ch.n_keys_est * ch.bpk) AS BIGINT)
                     ELSE 0 END AS bits
              FROM ch LEFT JOIN menu m ON m.bpk = ch.bpk)
      SELECT ch2.fname, round(ch2.n_keys_est, 6) AS n_keys_est,
             CAST(ch2.bpk AS BIGINT) AS bpk, ch2.bits, ch2.fpp,
             pr.probes, pr.probes - pr.matches AS negatives,
             round(ch2.fpp * (pr.probes - pr.matches), 6)
               AS expected_false
      FROM ch2 JOIN pr USING (fname) ORDER BY fname""",


    "q344_snapshot_retention" -> """
      WITH s AS (SELECT CAST(ts AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS n_rows,
                        CAST(count(*) * 64 AS BIGINT) AS bytes
                 FROM events GROUP BY 1),
      mx AS (SELECT max(day) AS dmax FROM s),
      f AS (SELECT s.*, mx.dmax,
                   max(s.day) OVER (PARTITION BY
                     date_trunc('week', s.day)) AS wmax,
                   max(s.day) OVER (PARTITION BY
                     date_trunc('month', s.day)) AS mmax
            FROM s CROSS JOIN mx),
      g AS (SELECT day, n_rows, bytes,
                   (date_diff('day', day, dmax) < 7) AS keep_daily,
                   (day = wmax AND date_diff('day', day, dmax) < 28)
                     AS keep_weekly,
                   (day = mmax AND date_diff('day', day, dmax) < 365)
                     AS keep_monthly
            FROM f),
      g2 AS (SELECT *, (keep_daily OR keep_weekly OR keep_monthly)
               AS kept FROM g),
      h AS (SELECT CAST(sum(CASE WHEN NOT kept THEN bytes ELSE 0 END)
                     AS BIGINT) AS reclaimed_bytes,
                   CAST(sum(CASE WHEN kept THEN bytes ELSE 0 END)
                     AS BIGINT) AS kept_bytes
            FROM g2)
      SELECT g2.day, g2.n_rows, g2.bytes, g2.keep_daily,
             g2.keep_weekly, g2.keep_monthly, g2.kept,
             h.reclaimed_bytes, h.kept_bytes
      FROM g2 CROSS JOIN h ORDER BY g2.day""",


    "q345_partition_grain" -> """
      WITH ph AS (SELECT date_trunc('hour', ts) AS p,
                         CAST(count(*) * 64 AS BIGINT) AS b
                  FROM events GROUP BY 1),
      pd AS (SELECT date_trunc('day', ts) AS p,
                    CAST(count(*) * 64 AS BIGINT) AS b
             FROM events GROUP BY 1),
      pw AS (SELECT date_trunc('week', ts) AS p,
                    CAST(count(*) * 64 AS BIGINT) AS b
             FROM events GROUP BY 1),
      per AS (
        SELECT 'hour' AS grain, CAST(count(*) AS BIGINT)
                 AS n_partitions,
               CAST(min(b) AS BIGINT) AS min_bytes,
               CAST(max(b) AS BIGINT) AS max_bytes,
               CAST(sum(CASE WHEN b BETWEEN 4096 AND 65536
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band
        FROM ph
        UNION ALL
        SELECT 'day', CAST(count(*) AS BIGINT), CAST(min(b) AS BIGINT),
               CAST(max(b) AS BIGINT),
               CAST(sum(CASE WHEN b BETWEEN 4096 AND 65536
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM pd
        UNION ALL
        SELECT 'week', CAST(count(*) AS BIGINT),
               CAST(min(b) AS BIGINT), CAST(max(b) AS BIGINT),
               CAST(sum(CASE WHEN b BETWEEN 4096 AND 65536
                 THEN 1 ELSE 0 END) AS BIGINT)
        FROM pw),
      pf AS (SELECT *, n_in_band * 1.0 / n_partitions AS ibf
             FROM per),
      best AS (SELECT grain AS bg FROM pf
               ORDER BY ibf DESC, grain ASC LIMIT 1)
      SELECT pf.grain, pf.n_partitions, pf.min_bytes, pf.max_bytes,
             pf.n_in_band, round(pf.ibf, 6) AS in_band_frac,
             (pf.grain = best.bg) AS chosen
      FROM pf CROSS JOIN best ORDER BY pf.grain""",


    "q346_erasure_impact" -> """
      WITH dc AS (SELECT c_custkey FROM customer
                  WHERE c_custkey % 97 = 0),
      do_ AS (SELECT o_orderkey FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM dc)),
      u AS (
        SELECT 'customer' AS tname,
               CAST((SELECT count(*) FROM dc) AS BIGINT) AS n_erase,
               CAST((SELECT count(*) FROM customer) AS BIGINT) AS tot
        UNION ALL
        SELECT 'orders',
               CAST((SELECT count(*) FROM do_) AS BIGINT),
               CAST((SELECT count(*) FROM orders) AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_orderkey IN
                       (SELECT o_orderkey FROM do_)) AS BIGINT),
               CAST((SELECT count(*) FROM lineitem) AS BIGINT)
        UNION ALL
        SELECT 'events',
               CAST((SELECT count(*) FROM events
                     WHERE user_id % 97 = 0) AS BIGINT),
               CAST((SELECT count(*) FROM events) AS BIGINT))
      SELECT tname, n_erase, n_erase * 64 AS bytes,
             round(n_erase * 1.0 / tot, 6) AS frac
      FROM u ORDER BY tname""",


    "q348_replica_placement" -> """
      WITH s AS (SELECT l_orderkey % 16 AS shard,
                        CAST(count(*) * 64 AS BIGINT) AS bytes
                 FROM lineitem GROUP BY 1),
      sp AS (SELECT shard, bytes,
                    CAST(('0x' || substring(md5(
                      CAST(shard AS VARCHAR)), 1, 12)) AS BIGINT) % 4
                      AS p
             FROM s),
      placed AS (
        SELECT shard, bytes, p AS rack, 'primary' AS role FROM sp
        UNION ALL
        SELECT shard, bytes, (p + 1) % 4, 'replica' FROM sp
        UNION ALL
        SELECT shard, bytes, (p + 2) % 4, 'replica' FROM sp),
      racks AS (SELECT rack,
                       CAST(sum(CASE WHEN role = 'primary'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_primary,
                       CAST(sum(CASE WHEN role = 'replica'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_replica,
                       CAST(sum(bytes) AS BIGINT) AS hosted_bytes
                FROM placed GROUP BY 1),
      t AS (SELECT CAST(sum(hosted_bytes) AS BIGINT) AS tot,
                   CAST(max(hosted_bytes) AS BIGINT) AS mx,
                   CAST(min(hosted_bytes) AS BIGINT) AS mn
            FROM racks)
      SELECT racks.rack, racks.n_primary, racks.n_replica,
             racks.hosted_bytes,
             round(racks.hosted_bytes * 1.0 / t.tot, 6) AS bytes_frac,
             (t.mx <= t.mn * 2) AS balanced
      FROM racks CROSS JOIN t ORDER BY racks.rack"""
  )
}
