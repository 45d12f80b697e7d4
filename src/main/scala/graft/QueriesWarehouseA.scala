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
private[graft] object QueriesWarehouseA {
  import QueryShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- M7: gap-based sessionization (batch form) ---
    "q20_sessionize" -> { (spark, dir) =>
      val events = tbl(spark, dir, "events")
      Sessionize.withSessionIds(events, col("user_id"), col("ts"), 1800L)
        .groupBy(col("user_id"))
        .agg((max(col("session_id")) + 1).as("n_sessions"),
             count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },


    // --- §2e DurationDomain: dense duration buckets with
    //     duration-string bounds ("30minute" / "5minute"); the events
    //     value column is read as a seconds duration ---
    "q50_edges_duration" -> rounded("sum_value" -> 4)(jx("""
      {"from": "events",
       "edges": [{"name": "dur", "value": "value",
                  "domain": {"type": "duration", "min": 0,
                             "max": "30minute", "interval": "5minute"}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "sum_value", "value": "value",
                   "aggregate": "sum"}]}""")),


    // --- skew: two-phase salted aggregation must equal the plain
    //     aggregate exactly ---
    "q60_salted_agg" -> rounded("sum_qty" -> 4)({ (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      graft.operators.Skew.saltedAgg(li, Seq(col("l_returnflag")), 32,
          partial = Seq(sum(col("l_quantity")).as("s"),
            count(lit(1)).as("c")),
          fin = Seq(sum(col("s")).as("sum_qty"), sum(col("c")).as("n")))
        .orderBy(col("l_returnflag"))
    }),


    // --- skew: salted replicated join must equal the plain join ---
    "q61_salted_join" -> { (spark, dir) =>
      val s = tbl(spark, dir, "supplier")
      val n = tbl(spark, dir, "nation")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
      graft.operators.Skew.saltedJoin(s, n, "s_nationkey", 8)
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_suppliers"))
        .orderBy(col("n_name"))
    },


    // --- bucketed co-located join: both sides written bucketBy the
    //     join key, so the join itself needs no exchange (the
    //     BucketingSpec asserts the exchange-free plan; here the
    //     results are differentially checked). This is the 100 TB
    //     fact-to-fact join shape when broadcast is impossible ---
    "q73_bucketed_join" -> rounded("sum_qty" -> 4)({ (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val o = tbl(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      // a fresh session's in-memory metastore doesn't know tables a
      // previous run left in the warehouse dir — drop both the entry
      // and any stale location before the bucketed write
      Seq("q73_li", "q73_o").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val wh = spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        val loc = new java.io.File(wh, t)
        if (loc.exists()) rm(loc)
      }
      li.write.bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("q73_li")
      o.write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("q73_o")
      spark.table("q73_li")
        .join(spark.table("q73_o"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    }),


    // --- incremental NEAR-dup dedup against a persisted MinHash
    //     signature index: 70% of documents are the "historical"
    //     corpus (only their 64-long signatures are written); the new
    //     batch is the other 30% plus truncated-tail variants of
    //     historical docs. Cross-set near-dup pairs are found by the
    //     banded join + signature-agreement estimate WITHOUT re-reading
    //     historical text; recall-floored against the exact cross-set
    //     n-gram-Jaccard twin (computed in full by the DuckDB oracle,
    //     q26-style).
    //     BENCH NOTE — do not chase this query's wall time as a probe
    //     regression: per bench iteration it pays (a) the minhash
    //     index PARQUET WRITE (an ingest cost a production pipeline
    //     pays once per corpus, not per probe) and (b) the full exact
    //     inverted-index twin, which exists only as the recall oracle.
    //     The operator under test — the banded LSH probe of the
    //     signature index — is the small remainder (~1s of the ~4-7s
    //     headline at sf0.1; see BENCHMARKS.md) ---
    "q95_incremental_neardup" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val hist = docs.filter(pmod(col("doc_id"), lit(10)) < 7)
        .select(col("doc_id"), col("text"))
      val variants = hist.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val fresh = docs.filter(pmod(col("doc_id"), lit(10)) >= 7)
        .select(col("doc_id"), col("text"))
        .unionByName(variants)
      val idx = Scratch.dir("graft_q95").toString + "/minhash_idx"
      Dedup.writeMinhashIndex(hist, col("doc_id"), col("text"), idx,
        numHashes = 64)
      val found = Dedup.incrementalNearDups(spark, fresh,
          col("doc_id"), col("text"), idx,
          numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("new_id"), col("old_id"))
      // exact cross-set twin over ONE staged shingle scan of both sets
      val staged = hist.unionByName(fresh)
        .select(col("doc_id").as("id"),
          TextAnalysis.shingleHashes(col("text"), 3).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def isHist(c: Column): Column =
        c < 1000000L && pmod(c, lit(10)) < 7
      val exact = Dedup.ngramJaccardPairsFromShingles(
          staged.select(col("id"), col("sh").as("s")),
          threshold = 0.5, maxDf = 16)
        .filter(isHist(col("id_a")) =!= isHist(col("id_b")))
        .select(
          when(isHist(col("id_a")), col("id_b"))
            .otherwise(col("id_a")).as("new_id"),
          when(isHist(col("id_a")), col("id_a"))
            .otherwise(col("id_b")).as("old_id"))
      val hits = found.join(exact, Seq("new_id", "old_id"))
      exact.agg(count(lit(1)).as("pairs_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("__hits")))
        .select(col("pairs_exact"),
          (col("__hits") >= col("pairs_exact") * 0.9)
            .as("recall_floor_met"))
    },


    // --- one Lloyd k-means update step from the deterministic
    //     lowest-id init (k=8): row-local assignment + a (cell, dim)
    //     grouped mean whose key cardinality k·d lets map-side partial
    //     aggregation collapse the shuffle; the oracle replays assign
    //     + element-wise per-cell means (KMeansSpec covers the
    //     multi-round fit loop the oracle can't express; q107 oracles
    //     the full fit on this same vector family).
    //     INPUT IS HASHED-BoW, NOT embeddings, on purpose: per-cell
    //     avg() over arbitrary doubles re-sums in partition-dependent
    //     order and a last-ULP flip can cross a round-6 boundary;
    //     integer-count vectors make every mean an EXACT integer-sum
    //     ratio — order-independent in any engine ---
    "q101_kmeans_step" -> rounded("c" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val vecs = graft.llm.Featurize.hashedBow(docs, col("doc_id"),
        col("text"), dim = 32)
      graft.llm.KMeans.updateStep(vecs, col("doc_id"), col("v"),
          graft.llm.KMeans.init(vecs, col("doc_id"), col("v"), 8))
        .orderBy(col("cell"), col("dim"))
    }),


    // --- corpus snapshot diff: the incremental-refresh primitive —
    //     one full-outer join of two md5 fingerprint frames classifies
    //     every id as added/removed/changed/unchanged; the synthetic
    //     "current" snapshot drops ids ≡3 (mod 17), edits ids ≡1
    //     (mod 13), and adds +2M copies of ids ≡5 (mod 11) ---
    "q105_snapshot_diff" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val cur0 = docs.filter(pmod(col("doc_id"), lit(17)) =!= 3)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(13)) === 1,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))
            .as("text"))
      val added = docs.filter(pmod(col("doc_id"), lit(11)) === 5)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val fpOf = (df: org.apache.spark.sql.DataFrame) =>
        Pipelines.withFingerprint(df, col("doc_id"), col("text"))
      Pipelines.snapshotDiff(fpOf(docs), fpOf(cur0.unionByName(added)))
        .select(col("id").as("doc_id"), col("status"))
        .orderBy(col("doc_id"))
    },


    // --- FITTED-quantizer IVF index, oracled end-to-end: the same
    //     2-round Lloyd fit as q107 feeds ivfWriteIndexFitted (cell-
    //     partitioned parquet + centroid sidecar), then queries probe
    //     their nprobe=4 nearest FITTED cells through the partition-
    //     pruned path. Integer BoW vectors again make fit AND ranking
    //     bit-exact; the oracle replays fit -> assignment -> probe-
    //     cell selection -> within-cell exact ranking. Like q95, the
    //     bench headline charges the per-iteration index WRITE (an
    //     ingest cost), not the probe ---
    "q109_ivf_fitted_probe" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      // the fit + index build is STAGED (Staged.getOrBuildPath): the
      // integer-BoW Lloyd fit is bit-exact, so a second run in the
      // same JVM (bench iteration 2) probes the already-written index
      // instead of re-fitting — the ingest cost is paid once per
      // (corpus, params), exactly as a 100 TB serving path would
      val idx = graft.operators.Staged.getOrBuildPath(
          s"ivf_fitted::$dir::var_trunc30_dim32_k16_i2") { p =>
        val variants = docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          col("text").substr(lit(1),
            greatest(length(col("text")) - 30, lit(1))).as("text"))
        val vecs = graft.llm.Featurize.hashedBow(
          docs.unionByName(variants), col("doc_id"), col("text"),
          dim = 32)
        val vecsCp = vecs.localCheckpoint()
        val means = graft.llm.KMeans.fit(vecsCp, col("doc_id"),
          col("v"), k = 16, iters = 2)
        graft.llm.Similarity.ivfWriteIndexFitted(vecsCp, col("doc_id"),
          col("v"), s"$p/ivf_fitted", means)
        // the index (and its centroid sidecar) is on disk now — the
        // fit and the checkpointed corpus can be freed; queries
        // re-derive their 4 vectors from the tiny filtered base table
        graft.llm.Lifecycle.release(vecsCp)
        graft.llm.Lifecycle.release(means)
      } + "/ivf_fitted"
      val queries = graft.llm.Featurize.hashedBow(
        docs.filter(col("doc_id") < 4), col("doc_id"), col("text"),
        dim = 32)
      graft.llm.Similarity.ivfProbeIndexed(spark, idx,
        queries, col("doc_id"), col("v"),
        k = 5, nlist = 16, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    },


    // --- z-order (Morton) layout keys: the bit-interleave that
    //     drives ZOrder.writeZOrdered's two-column data-skipping
    //     layout, oracled as plain bit arithmetic (the layout law
    //     itself — per-file rectangle widths — is ZOrderSpec's job;
    //     an engine cannot hash-compare file boundaries) ---
    "q120_zorder_key" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      orders.select(col("o_orderkey"),
          pmod(col("o_custkey"), lit(1024)).cast("long").as("a"),
          pmod(col("o_orderkey"), lit(1024)).cast("long").as("b"))
        .withColumn("z",
          graft.operators.ZOrder.zValue(col("a"), col("b"), 10))
        .orderBy(col("z"), col("o_orderkey"))
        .limit(200)
    },


    // --- sink compaction: the documents table written as 32 tiny
    //     files (a micro-batch sink's droppings), compacted to
    //     ~1000-row files with an atomic directory swap. The oracled
    //     invariant is CONTENT IDENTITY — the compacted table must
    //     hash-match the original source rows; the file-count
    //     collapse itself is asserted in SinksSpec ---
    "q128_compaction" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val tmp = Scratch.dir("graft_q128").toString + "/frag"
      docs.repartition(32).write.parquet(tmp)
      graft.sources.Sinks.compact(spark, tmp, targetRowsPerFile = 1000)
      spark.read.parquet(tmp).orderBy(col("doc_id"))
    },


    // --- ordered-step funnel over the event log: view -> click ->
    //     purchase, each step strictly after the user's previous-step
    //     time; per-step reach counts and conversion vs step 1 (exact
    //     integer ratio). Per step: one pushable type filter + one
    //     user-keyed join + min() — no windows, no event collection ---
    "q133_funnel" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      graft.operators.Funnel.summary(ev, col("user_id"), col("ts"),
          col("event_type"), Seq("view", "click", "purchase"))
        .orderBy(col("step_ix"))
    },


    // --- cohort retention: entities cohorted by first-event ISO week,
    //     per-week-offset active fraction (exact integer ratio). One
    //     user-keyed join + narrow distinct — no windows ---
    "q135_retention" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      graft.operators.Retention.cohortRetention(ev, col("user_id"),
          col("ts"), maxWeeks = 3)
        .orderBy(col("cohort_week"), col("wk"))
    },


    // --- copy-on-write DELETE by key: the documents table written as
    //     16 range-clustered files, every doc_id ≡ 3 (mod 7) deleted
    //     — only victim-bearing files are rewritten (SinksSpec holds
    //     the untouched-files law); the oracled invariant is the
    //     surviving CONTENT ---
    "q136_delete_by_key" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val tmp = Scratch.dir("graft_q136").toString + "/tbl"
      docs.repartitionByRange(16, col("doc_id")).write.parquet(tmp)
      graft.sources.Sinks.deleteByKey(spark, tmp, "doc_id",
        docs.filter(pmod(col("doc_id"), lit(7)) === 3)
          .select(col("doc_id")))
      spark.read.parquet(tmp).orderBy(col("doc_id"))
    },


    // --- EXACT per-group quantiles by distributed rank selection
    //     (histogram refine — no per-group sort buffer, the scale
    //     path for percentile() on groups that dwarf an executor).
    //     The selected values are INPUT values, so they hash-compare
    //     with no rounding; the oracle ranks with a plain window ---
    "q137_exact_quantile" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val p50 = graft.operators.ExactQuantile.quantileDisc(
          li, col("l_returnflag"), col("l_extendedprice"), p = 0.5)
        .select(col("grp").as("l_returnflag"), col("n"),
          col("q").as("p50"))
      val p90 = graft.operators.ExactQuantile.quantileDisc(
          li, col("l_returnflag"), col("l_extendedprice"), p = 0.9)
        .select(col("grp").as("l_returnflag"), col("q").as("p90"))
      p50.join(p90, Seq("l_returnflag")).orderBy(col("l_returnflag"))
    },


    // --- SCD Type-2 dimension build from the raw event log: each
    //     user's event_type history collapsed into validity intervals
    //     [valid_from, valid_to) — one row per consecutive run, the
    //     latest run open-ended. Two windows + a groupBy all riding
    //     ONE entity-keyed exchange; the oracle replays with the
    //     same lag/run-sum/lead windows ---
    "q139_scd2" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      graft.operators.Scd.buildType2(ev, col("user_id"), col("ts"),
          col("event_type"))
        .orderBy(col("entity"), col("valid_from"))
    },


    // --- the two SCD halves composed: a state dimension built from
    //     the signup/error sub-log (q139's operator), then purchase
    //     facts enriched with the state in force at purchase time and
    //     rolled up per state. The per-state value sum folds the
    //     value-sorted list (engine-identical), rounded to 4 ---
    "q142_asof_dimension" -> rounded("sum_value" -> 4)({ (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val dim = graft.operators.Scd.buildType2(
        ev.filter(col("event_type").isin("signup", "error")),
        col("user_id"), col("ts"), col("event_type"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.operators.Scd.asOfEnrich(facts, col("user_id"), col("ts"),
          dim)
        .groupBy(col("attr"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"),
          aggregate(array_sort(collect_list(col("value"))), lit(0.0d),
            (acc, x) => acc + x).as("sum_value"))
        .select(col("attr").as("state"), col("n_purchases"),
          col("n_users"), col("sum_value"))
        .orderBy(col("state"))
    }),


    // --- incremental SCD2 MERGE, differentially proven: Spark builds
    //     the dimension from the pre-cutoff log only, then advances it
    //     with the post-cutoff batch via mergeType2 (historical log
    //     never re-read; every join batch-bounded + broadcast); the
    //     oracle REBUILDS from the full log — a hash match proves
    //     incremental ≡ batch on real data ---
    "q143_scd2_merge" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val cut = lit("2024-01-21 00:00:00").cast("timestamp")
      val dim = graft.operators.Scd.buildType2(
        ev.filter(col("ts") < cut), col("user_id"), col("ts"),
        col("event_type"))
      graft.operators.Scd.mergeType2(dim, ev.filter(col("ts") >= cut),
          col("user_id"), col("ts"), col("event_type"))
        .orderBy(col("entity"), col("valid_from"))
    },


    // --- token-distribution Shannon entropy per document (the Gopher
    //     diversity signal): exact-ratio ln inputs, value-sorted fold
    //     for the per-doc sum — engine-identical under round-6 ---
    "q145_entropy" -> rounded("entropy" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      graft.llm.TextAnalysis.tokenEntropy(docs, col("doc_id"),
          col("text"))
        .select(col("id").as("doc_id"), col("n_tokens"), col("entropy"))
        .orderBy(col("doc_id"))
    }),


    // --- count-min sketch (d=4, w=1024) over the token stream,
    //     probed with 20 fixed watchlist tokens: est ≥ true always
    //     (the sketch never undercounts), and the md5 hashes are
    //     portable so the oracle rebuilds the SAME sketch and the
    //     estimates hash-compare exactly — integer arithmetic only ---
    "q152_count_min" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val toks = docs.select(
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val sketch = CountMin.build(toks, col("tok"), depth = 4,
        width = 1024)
      val watch = Seq("the", "and", "spark", "query", "vector", "de",
        "la", "und", "der", "data", "of", "to", "le", "les", "el",
        "en", "für", "avec", "con", "zzzabsent")
      import spark.implicits._
      val probes = watch.toDF("tok")
      val truth = toks.join(probes, Seq("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("true_n"))
      CountMin.estimate(sketch, probes, col("tok"), depth = 4,
          width = 1024)
        .withColumnRenamed("key", "tok")
        .join(probes, Seq("tok"))
        .join(truth, Seq("tok"), "left")
        .select(col("tok"), col("est"),
          coalesce(col("true_n"), lit(0L)).as("true_n"),
          (col("est") >= coalesce(col("true_n"), lit(0L)))
            .as("never_undercounts"))
        .orderBy(col("tok"))
    },


    // --- KMV distinct-count sketch (k=256) on l_orderkey: portable
    //     md5 hashes, so the oracle rebuilds the same k smallest and
    //     the (k−1)·2⁴⁸/h_k estimate is bit-identical — a sketch
    //     whose accuracy claim is CHECKED, not assumed ---
    "q153_kmv_distinct" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val k = 256
      val est = Kmv.estimate(Kmv.sketch(li, col("l_orderkey"), k), k)
      val exact = li.agg(
        countDistinct(col("l_orderkey")).cast("double").as("n_exact"))
      est.crossJoin(exact)
        .select(round(col("distinct_est"), 6).as("distinct_est"),
          col("n_exact"),
          (abs(col("distinct_est") - col("n_exact")) <=
            col("n_exact") * 0.2).as("within_20pct"))
    },


    // --- CMS inner-product JOIN-SIZE estimate: size lineitem ⋈
    //     orders(⅓ sample) from two fixed d·w sketches without
    //     touching either table again; never undercounts, and the
    //     oracle rebuilds both sketches exactly ---
    "q154_cms_join_size" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
        .select(col("l_orderkey").as("k"))
      val ord = tbl(spark, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(col("o_orderkey").as("k"))
      val est = CountMin.joinSizeEstimate(
        CountMin.build(li, col("k"), depth = 4, width = 4096),
        CountMin.build(ord, col("k"), depth = 4, width = 4096))
      val truth = li.join(ord, Seq("k"))
        .agg(count(lit(1)).as("true_join"))
      est.crossJoin(truth)
        .select(col("join_size_est"), col("true_join"),
          (col("join_size_est") >= col("true_join"))
            .as("never_undercounts"))
    },


    // --- per-entity exponential smoothing (EWMA, α = 1/2): the
    //     classic streaming smoother as an order-fixed left fold over
    //     each user's time-ordered values, seeded with the first
    //     value. α = 1/2 keeps every step exact IEEE (×0.5 is an
    //     exponent decrement; + is one rounding shared by both
    //     engines), so the result hash-compares UNROUNDED against the
    //     oracle's list_reduce over the same ordered list. State is
    //     bounded by each user's OWN event count (the per-entity
    //     analytics bound, same as the funnel/session family). ---
    "q157_ewma" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("value")))).as("__seq"))
        .withColumn("__vals", expr("transform(__seq, x -> x.value)"))
        .select(col("user_id"), col("n_events"),
          expr("""aggregate(slice(__vals, 2, size(__vals)),
                    element_at(__vals, 1),
                    (s, x) -> 0.5 * x + 0.5 * s)""").as("ewma"))
        .orderBy(col("user_id"))
    },


    // --- first-order Markov transition mining over per-user event
    //     sequences: lag inside a user-partitioned window (entity-
    //     keyed — never global) pairs each event with its
    //     predecessor kind; transition counts aggregate and the
    //     conditional probability is an exact integer ratio (one
    //     IEEE division, bit-identical across engines unrounded).
    //     The probability window runs over the |kinds|² count frame,
    //     not the corpus. ---
    "q158_markov_transitions" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = pairs.groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("prev_type"))
      counts
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(wp).cast("double"))
        .orderBy(col("prev_type"), col("event_type"))
    },


    // --- calendar gap-fill / resample: the complete per-type daily
    //     grid (min..max day × distinct types), daily counts
    //     zero-filled, gap days flagged, and the last observed daily
    //     count carried forward (last-ignoreNulls over a
    //     type-partitioned window — the window runs over the
    //     |days|×|types| grid, never the event log). TimeDomain (q04)
    //     densifies one dimension; this is the two-dimensional
    //     product with forward-fill — the time-series resampling
    //     shape. ---
    "q159_gap_fill" -> dated("day")({ (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val daily = ev.groupBy(col("event_type"),
          date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("__n"))
      val days = ev.agg(date_trunc("DAY", min(col("ts"))).as("__lo"),
          date_trunc("DAY", max(col("ts"))).as("__hi"))
        .select(explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as("day"))
      val types = ev.select(col("event_type")).distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      types.crossJoin(days)
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("__n"), lit(0L)).as("n"),
          col("__n").isNull.as("is_gap"),
          last(col("__n"), ignoreNulls = true).over(w).as("carry_n"))
        .orderBy(col("event_type"), col("day"))
    }),


    // --- data-profiling operator: per-column row/null/distinct
    //     counts + min/max, melted to one row per column — the
    //     data-quality census every ingest pipeline runs first. ONE
    //     pass over the table (a single wide agg; the per-column
    //     stats ride the same scan), then a row-local explode of the
    //     5-struct array. The count_distincts expand the agg ~5×; at
    //     100 TB swap them for approx_count_distinct (the exact/
    //     approx trade q67 oracles). Strings for min/max use
    //     type-pinned formats (microsecond-padded timestamps,
    //     DECIMAL(18,6) doubles) so both engines print identically. ---
    "q161_profile" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      def nulls(c: String) =
        sum(when(col(c).isNull, 1L).otherwise(0L))
      def longCol(c: String) = Seq(nulls(c).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
      val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val wide = ev.agg(count(lit(1)).as("__n"),
        (longCol("event_id") ++ longCol("user_id") ++
          Seq(nulls("event_type").as("__nn_event_type"),
            count_distinct(col("event_type")).as("__nd_event_type"),
            min(col("event_type")).as("__mn_event_type"),
            max(col("event_type")).as("__mx_event_type"),
            nulls("ts").as("__nn_ts"),
            count_distinct(col("ts")).as("__nd_ts"),
            date_format(min(col("ts")), tsFmt).as("__mn_ts"),
            date_format(max(col("ts")), tsFmt).as("__mx_ts"),
            nulls("value").as("__nn_value"),
            count_distinct(col("value")).as("__nd_value"),
            min(col("value")).cast("decimal(18,6)").cast("string")
              .as("__mn_value"),
            max(col("value")).cast("decimal(18,6)").cast("string")
              .as("__mx_value"))): _*)
      def row(c: String) = struct(lit(c).as("col_name"),
        col("__n").as("n_rows"), col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"), col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))
      wide.select(explode(array(row("event_id"), row("user_id"),
          row("event_type"), row("ts"), row("value"))).as("p"))
        .select(col("p.*")).orderBy(col("col_name"))
    },


    // --- robust per-group outlier detection (median/MAD): both
    //     medians via ExactQuantile.quantileDisc — the distributed
    //     histogram-refine rank selection (q137's scale path), so no
    //     executor ever buffers a whole group. DISCRETE quantiles
    //     select an actual data value (no interpolation), making med,
    //     MAD and every |x−med| comparison bit-exact across engines —
    //     the outlier count needs no rounding guard. ---
    "q162_robust_outliers" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"), col("value").cast("double").as("v"))
        .filter(col("v").isNotNull)
      val med = graft.operators.ExactQuantile.quantileDisc(ev,
          col("event_type"), col("v"), 0.5)
        .select(col("grp").as("event_type"), col("n"),
          col("q").as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("__ad", abs(col("v") - col("med")))
      val mad = graft.operators.ExactQuantile.quantileDisc(dev,
          col("event_type"), col("__ad"), 0.5)
        .select(col("grp").as("event_type"), col("q").as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(min(col("n")).as("n"), min(col("med")).as("med"),
          min(col("mad")).as("mad"),
          sum(when(col("__ad") > lit(3.0) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    },


    // --- golden-record survivorship: q75's duplicate clusters
    //     (connected components over the synthetic match pairs, plus
    //     every unmatched doc as its own singleton cluster), then
    //     per-cluster canonicalization — the longest member (ties →
    //     smallest id) survives as the representative, sources merge
    //     by min. The survivor pick is a row_number over a
    //     CLUSTER-partitioned window (entity-keyed, never global) —
    //     the record-linkage "merge" step after blocking+matching. ---
    "q163_golden_record" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val ids = docs.select(col("doc_id"))
      val chain = ids.alias("a").join(ids.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            pmod(col("a.doc_id"), lit(7)) =!= 6)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val cross = ids.alias("a").join(ids.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 14 &&
            pmod(col("a.doc_id"), lit(21)) === 3)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val comp = Dedup.connectedComponents(chain.unionByName(cross),
          col("id_a"), col("id_b"))
        .withColumnRenamed("id", "doc_id")
      val member = docs.join(comp, Seq("doc_id"), "left")
        .withColumn("comp", coalesce(col("comp"), col("doc_id")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("comp"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val rep = member.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("comp"), col("doc_id").as("rep_id"),
          col("n_chars").as("rep_chars"))
      member.groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"),
          min(col("source")).as("src_min"))
        .join(rep, Seq("comp"))
        .orderBy(col("comp"))
    },


    // --- time-based rolling window: 7-day rolling event counts per
    //     type via a RANGE frame over the daily-aggregated series —
    //     the window runs over |days|×|types| rows (pre-aggregated),
    //     never the event log, and the frame is value-based (a day
    //     with no preceding data contributes nothing silently —
    //     unlike a ROWS frame, which would reach back past gaps). ---
    "q164_rolling_window" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val daily = ev.groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(datediff(col("day"), to_date(lit("1970-01-01"))))
        .rangeBetween(-6, 0)
      daily.withColumn("roll7", sum(col("n")).over(w))
        .orderBy(col("event_type"), col("day"))
    },


    // --- A/B experiment readout: users hash-split into arms by the
    //     same md5 bucketing as q77 (deterministic, engine-portable),
    //     conversion = any purchase event; the two-proportion pooled
    //     z-score is computed in a pinned evaluation order of exact
    //     ratios, one sqrt (correctly rounded per IEEE in both
    //     engines) and one division — hash-compared UNROUNDED. ---
    "q165_ab_test" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val users = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("conv"))
        .withColumn("arm",
          when(Pipelines.hashBucket(col("user_id"), 100) < 50, "A")
            .otherwise("B"))
      users.agg(
          sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === "A", col("conv")).otherwise(0L))
            .as("conv_a"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("arm") === "B", col("conv")).otherwise(0L))
            .as("conv_b"))
        .withColumn("rate_a",
          col("conv_a").cast("double") / col("n_a").cast("double"))
        .withColumn("rate_b",
          col("conv_b").cast("double") / col("n_b").cast("double"))
        .withColumn("__p",
          (col("conv_a") + col("conv_b")).cast("double") /
            (col("n_a") + col("n_b")).cast("double"))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          col("rate_a"), col("rate_b"),
          ((col("rate_a") - col("rate_b")) /
            sqrt((col("__p") * (lit(1.0) - col("__p"))) *
              ((lit(1.0) / col("n_a").cast("double")) +
                (lit(1.0) / col("n_b").cast("double"))))).as("z"))
    },


    // --- fuzzy string matching: sorted-neighborhood blocking (q148's
    //     operator) + exact Levenshtein distance on a fixed-length
    //     prefix, keep distance <= 8. Edit distance is integer-exact
    //     in both engines (unit costs); the blocking bounds the
    //     candidate set at rows × window, so the O(len²) kernel runs
    //     on a linear number of pairs — the classic record-linkage
    //     compare step after blocking. ---
    "q166_edit_distance" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val base = docs.unionByName(variants)
        .withColumn("pfx", lower(substring(trim(col("text")), 1, 40)))
      val pairs = graft.llm.Dedup.sortedNeighborhoodPairs(base,
        col("doc_id"), lower(substring(trim(col("text")), 1, 24)),
        window = 3, blockPrefix = 8)
      pairs
        .join(base.select(col("doc_id").as("id_a"),
          col("pfx").as("pfx_a")), Seq("id_a"))
        .join(base.select(col("doc_id").as("id_b"),
          col("pfx").as("pfx_b")), Seq("id_b"))
        .withColumn("dist", levenshtein(col("pfx_a"), col("pfx_b")))
        .filter(col("dist") <= 8)
        .select(col("id_a"), col("id_b"), col("dist"))
        .orderBy(col("id_a"), col("id_b"))
    },


    // --- rolling distinct actives (DAU / trailing-7-day WAU): the
    //     distinct (day, user) frame range-joins a broadcast day
    //     grid (|days| rows — the small side of an inequality join is
    //     ALWAYS the grid), then one distinct-count per grid day.
    //     Distinct-over-a-sliding-window cannot ride a window frame
    //     (no DISTINCT aggs over frames) — the grid join IS the
    //     textbook shape, and its cost is |active-pairs| × 7, not
    //     |events| × 7. ---
    "q167_rolling_dau" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val du = ev.select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      val grid = du.agg(min(col("day")).as("__lo"),
          max(col("day")).as("__hi"))
        .select(explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as("gday"))
      broadcast(grid)
        .join(du, col("day").between(date_sub(col("gday"), 6),
          col("gday")), "left")
        .groupBy(col("gday"))
        .agg(count_distinct(when(col("day") === col("gday"),
          col("user_id"))).as("dau"),
          count_distinct(col("user_id")).as("wau7"))
        .withColumnRenamed("gday", "day")
        .orderBy(col("day"))
    },


    // --- equi-depth histogram: ntile(10) over a TOTAL order
    //     (value, event_id) inside type-partitioned windows makes the
    //     bin assignment deterministic in both engines; per-bin
    //     count/lo/hi are exact parquet values. The window is
    //     per-type — at a truly skewed 100 TB corpus the same output
    //     comes from ExactQuantile boundary selection (q137/q162's
    //     histogram-refine path) instead of an in-partition sort. ---
    "q168_equidepth_hist" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("v"), col("event_id"))
      ev.select(col("event_type"), col("value").as("v"),
          col("event_id"))
        .withColumn("bin", ntile(10).over(w))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
          max(col("v")).as("hi"))
        .orderBy(col("event_type"), col("bin"))
    },


    // --- debounce (ingestion de-noising): an event within 5 s of the
    //     SAME user's previous event of the same kind is noise — one
    //     lag inside a (user, kind)-partitioned window, integer
    //     microsecond arithmetic, exact in both engines. (Previous-
    //     EVENT debounce, the windowable form; previous-KEPT-event
    //     debounce is inherently sequential per key and belongs to
    //     the keyed-state streaming family if ever needed.) ---
    "q169_debounce" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      ev.select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"), us.as("__us"))
        .withColumn("__pus", lag(col("__us"), 1).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("__pus").isNull ||
            col("__us") - col("__pus") > 5000000L, 1L).otherwise(0L))
            .as("n_kept"))
        .orderBy(col("event_type"))
    },


    // --- time-weighted average (hold-until-next integration) in
    //     EXACT fixed-point: values are cents (round(value*100) —
    //     identical in both engines since the product is computed on
    //     the same doubles), hold durations are integer microseconds,
    //     so Σ(cents·dt) and Σdt are exact BIGINT sums in ANY
    //     aggregation order — the order-dependence of double
    //     summation is engineered away, and the final twa is two
    //     exact divisions, hash-compared UNROUNDED. Σ(cents·dt) ≤
    //     max_cents·span_µs ≈ 1.3e17 per user — no i64 overflow. ---
    "q170_twa" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.select(col("user_id"), col("ts"), col("event_id"),
          us.as("__us"),
          round(col("value") * 100).cast("long").as("__cents"))
        .withColumn("__nus", lead(col("__us"), 1).over(w))
        .filter(col("__nus").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("__cents") * (col("__nus") - col("__us")))
            .as("__num"),
          sum(col("__nus") - col("__us")).as("__den"))
        .select(col("user_id"), col("n_intervals"),
          (col("__num").cast("double") / col("__den").cast("double") /
            lit(100.0)).as("twa"))
        .orderBy(col("user_id"))
    },


    // --- conversion-lag quantiles PER EXPERIMENT ARM: each user's
    //     first view joined to their earliest purchase at-or-after it
    //     (micro-second exact), arms assigned by the q165 md5 split,
    //     then per-arm p50/p90 via ExactQuantile's distributed rank
    //     selection — no global sort or window anywhere (the group
    //     column is real data, so every internal window stays
    //     partitioned); the oracle replays it with arm-partitioned
    //     rank windows. Integer microseconds end-to-end (doubles only
    //     transit quantileDisc's value channel, exact below 2^53). ---
    "q171_time_to_convert" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val vv = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(us).as("v_us"))
      val pp = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), us.as("p_us"))
      val conv = vv.join(pp, Seq("user_id"))
        .filter(col("p_us") >= col("v_us"))
        .groupBy(col("user_id"))
        .agg(min(col("p_us") - col("v_us")).as("dt"))
        .withColumn("arm",
          when(Pipelines.hashBucket(col("user_id"), 100) < 50, "A")
            .otherwise("B"))
      val p50 = graft.operators.ExactQuantile.quantileDisc(conv,
          col("arm"), col("dt"), 0.5)
        .select(col("grp").as("arm"), col("n").as("n_users"),
          col("q").cast("long").as("p50_us"))
      val p90 = graft.operators.ExactQuantile.quantileDisc(conv,
          col("arm"), col("dt"), 0.9)
        .select(col("grp").as("arm"),
          col("q").cast("long").as("p90_us"))
      p50.join(p90, Seq("arm")).orderBy(col("arm"))
    },


    // --- sequence mining: top-10 opening 3-step event paths. The
    //     per-user prefix is an order-fixed slice of that user's OWN
    //     events (entity-bounded state, like the funnel family); the
    //     top-k is a distributed TakeOrdered over the tiny
    //     distinct-path frame. ---
    "q173_top_paths" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      ev.groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("__seq"))
        .select(array_join(slice(
          expr("transform(__seq, x -> x.event_type)"), 1, 3), ">")
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(10)
    },


    // --- min-max feature scaling + decile binning: the normalizer is
    //     (v - min)/(max - min) against a broadcast per-type min/max
    //     frame — three IEEE ops on identical inputs, so the
    //     normalized values (and their per-bin min/max) hash-compare
    //     UNROUNDED; the bin edge floor(norm*10) is deterministic for
    //     the same reason. ---
    "q174_minmax_scale" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val mm = ev.groupBy(col("event_type"))
        .agg(min(col("value")).as("__mn"), max(col("value")).as("__mx"))
      ev.join(broadcast(mm), Seq("event_type"))
        .withColumn("__norm",
          (col("value") - col("__mn")) / (col("__mx") - col("__mn")))
        .withColumn("decile",
          least(floor(col("__norm") * 10), lit(9L)).cast("int"))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"), min(col("__norm")).as("lo"),
          max(col("__norm")).as("hi"))
        .orderBy(col("event_type"), col("decile"))
    },


    // --- referential-integrity audit: orphan counts per FK relation
    //     via LEFT ANTI joins against deliberately-holed parent sets
    //     (so the audit provably counts, instead of reporting zeros
    //     on clean TPC-H data). Each relation is one anti-join whose
    //     parent side is a one-column frame — broadcast when small,
    //     Bloom-prefiltered when not (q116/q117's path). ---
    "q175_ref_integrity" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val lineitem = tbl(spark, dir, "lineitem")
      val cust = tbl(spark, dir, "customer")
        .filter(pmod(col("c_custkey"), lit(10)) =!= 3)
        .select(col("c_custkey"))
      val ords = orders.filter(pmod(col("o_orderkey"), lit(17)) =!= 5)
        .select(col("o_orderkey").as("__pk"))
      def audit(name: String, child: DataFrame, fk: Column,
                parent: DataFrame, pk: Column) =
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(child.join(parent, fk === pk, "left_anti")
            .agg(count(lit(1)).as("n_orphans")))
          .withColumn("relation", lit(name))
          .select(col("relation"), col("n_child"), col("n_orphans"))
      audit("lineitem->orders", lineitem, col("l_orderkey"),
          ords, col("__pk"))
        .unionByName(audit("orders->customer", orders,
          col("o_custkey"), cust, col("c_custkey")))
        .orderBy(col("relation"))
    },


    // --- SCD Type 1 / CDC apply (Scd.latestWins): fold an upsert +
    //     delete change batch into a snapshot, highest version wins,
    //     a winning delete removes the key. One union + one
    //     key-partitioned row_number — a single exchange, snapshot
    //     and changes never join. Keys in both change sets (7·13)
    //     prove delete-beats-earlier-upsert ordering. ---
    "q176_cdc_apply" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val base = orders.withColumn("__v", lit(0L))
        .withColumn("__del", lit(false))
      val upserts = orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100.0)
        .withColumn("__v", lit(1L)).withColumn("__del", lit(false))
      val deletes = orders.filter(pmod(col("o_orderkey"), lit(13)) === 0)
        .withColumn("__v", lit(2L)).withColumn("__del", lit(true))
      graft.operators.Scd.latestWins(base,
          upserts.unionByName(deletes),
          keyCols = Seq("o_orderkey"), versionCol = "__v",
          deleteCol = "__del")
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          sum(when(pmod(col("o_orderkey"), lit(7)) === 0, 1L)
            .otherwise(0L)).as("n_updated"))
    },


    // --- int8 scalar quantization of the embedding corpus (the
    //     compression every large vector store applies before ANN):
    //     per-DIMENSION affine (min, scale=(max-min)/255) codes,
    //     reported as a per-dim audit — code count and max
    //     reconstruction error. Everything after the float->double
    //     widening (exact) is deterministic IEEE (sub/div/round-half-
    //     up on non-negatives/mult/abs), so the audit hash-compares
    //     UNROUNDED. One posexplode + one broadcast of the 64-row
    //     stats frame; row-count scales as rows x dims, the quantize
    //     itself is row-local. ---
    "q177_int8_quantize" -> { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
      val dims = e.select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "__f")))
        .select(col("dim"), col("__f").cast("double").as("v"))
      val mm = dims.groupBy(col("dim"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
      dims.join(broadcast(mm), Seq("dim"))
        .withColumn("code",
          round((col("v") - col("mn")) / col("scale")).cast("int"))
        .withColumn("err",
          abs(col("v") - (col("mn") + col("code") * col("scale"))))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"), min(col("mn")).as("mn"),
          min(col("mx")).as("mx"), min(col("scale")).as("scale"),
          max(col("err")).as("max_err"),
          count_distinct(col("code")).as("n_codes"))
        .orderBy(col("dim"))
    },


    // --- inter-event latency histogram in power-of-two buckets (the
    //     HdrHistogram shape): bucket = floor(log2(gap_µs)) computed
    //     EXACTLY as length(bin(gap)) - 1 — a string-length trick
    //     instead of libm log2, so bucket edges can never waver by a
    //     ULP between engines. Gaps via one lag in a user-partitioned
    //     window; the histogram is a tiny bucket-keyed aggregate. ---
    "q179_gap_histogram" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.select(col("user_id"), col("ts"), col("event_id"),
          us.as("__us"))
        .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
        .filter(col("__gap").isNotNull && col("__gap") > 0)
        .withColumn("bucket",
          (length(bin(col("__gap"))) - 1).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("__gap")).as("min_gap"),
          max(col("__gap")).as("max_gap"))
        .orderBy(col("bucket"))
    },


    // --- activity heatmap: weekday × hour event counts (the on-call
    //     dashboard staple). Day-of-week conventions differ between
    //     engines (Spark Sunday=1, DuckDB Sunday=0) — pinned
    //     explicitly rather than discovered in production. ---
    "q180_activity_heatmap" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      ev.select((dayofweek(col("ts")) - 1).as("dow"),
          hour(col("ts")).as("hour"))
        .groupBy(col("dow"), col("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("dow"), col("hour"))
    },


    // --- per-group OLS trend: the slope/intercept of daily counts
    //     vs day index, from the four INTEGER power sums (Σx, Σy,
    //     Σxy, Σx²) — exact in any aggregation order, so the closed-
    //     form slope = (kΣxy − ΣxΣy) / (kΣx² − (Σx)²) is a division
    //     of exact integers and hash-compares UNROUNDED. The trend-
    //     detection shape that scales: one tiny per-type aggregate
    //     over the daily series, no window at all. ---
    "q181_trend_slope" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val daily = ev.groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      val origin = daily.agg(min(col("day")).as("__d0"))
      val s = daily.crossJoin(broadcast(origin))
        .withColumn("x", datediff(col("day"), col("__d0")).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("k"), sum(col("x")).as("__sx"),
          sum(col("y")).as("__sy"),
          sum(col("x") * col("y")).as("__sxy"),
          sum(col("x") * col("x")).as("__sxx"))
      s.withColumn("slope",
          (col("k") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") /
            (col("k") * col("__sxx") - col("__sx") * col("__sx"))
              .cast("double"))
        .withColumn("intercept",
          (col("__sy").cast("double") -
            col("slope") * col("__sx").cast("double")) /
            col("k").cast("double"))
        .select(col("event_type"), col("k"), col("slope"),
          col("intercept"))
        .orderBy(col("event_type"))
    },


    // --- nearest-in-time join (the sensor-alignment shape): each
    //     purchase matches the SAME user's closest view within ±1 h —
    //     an equi-join on the entity with a range residual, then
    //     top-1 per purchase via a purchase-partitioned row_number
    //     ordered by (|Δt|, view id) so ties break deterministically.
    //     The as-of join (q41) looks only backward; this is the
    //     two-sided variant, same one-exchange plan. ---
    "q182_nearest_join" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          us.as("p_us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("v_id"),
          us.as("v_us"))
      val cand = p.join(v, Seq("user_id"))
        .withColumn("abs_dt", abs(col("p_us") - col("v_us")))
        .filter(col("abs_dt") <= 3600000000L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_id"))
        .orderBy(col("abs_dt"), col("v_id"))
      cand.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("p_id"), col("user_id"), col("v_id"),
          col("abs_dt"))
        .orderBy(col("p_id"))
    },


    // --- TIMED funnel: q133's view→click→purchase chain with a
    //     1-hour cap on each step-to-step wait (Funnel.reachTimes
    //     maxGap) — the product-analytics convention where a
    //     conversion that takes a day doesn't count. Same greedy
    //     earliest-time semantics, same one-exchange entity-keyed
    //     chain; the oracle adds the same bound to each min-join. ---
    "q183_timed_funnel" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      graft.operators.Funnel.summary(ev, col("user_id"), col("ts"),
          col("event_type"), Seq("view", "click", "purchase"),
          maxGap = Some("1 hour"))
        .orderBy(col("step_ix"))
    },


    // --- per-group Gini concentration of spend, EXACT: values as
    //     cents (the q170 fixed-point trick), ranks from a
    //     type-partitioned window over (value, id) — tie order cannot
    //     matter because tied ranks carry equal values — and the
    //     closed form (2·Σi·xᵢ)/(n·Σx) − (n+1)/n is divisions of
    //     exact integers in a pinned order, hash-compared UNROUNDED. ---
    "q186_gini" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      ev.select(col("event_type"), col("value"), col("event_id"),
          round(col("value") * 100).cast("long").as("__cents"))
        .withColumn("__i", row_number().over(w).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("__cents")).as("__sx"),
          sum(col("__i") * col("__cents")).as("__swx"))
        .select(col("event_type"), col("n"),
          ((lit(2L) * col("__swx")).cast("double") /
            (col("n") * col("__sx")).cast("double") -
            (col("n") + lit(1L)).cast("double") /
              col("n").cast("double")).as("gini"))
        .orderBy(col("event_type"))
    },


    // --- KMV set-operation estimates (theta-sketch recipe): buyers
    //     vs positive-balance customers — union, Jaccard and
    //     intersection estimated from two 512-hash sketches, next to
    //     their exact truths. The within-20% flags compare the
    //     UNROUNDED estimates; they hash-match regardless of sketch
    //     luck because the oracle replays the identical sketch. ---
    "q188_kmv_setops" -> { (spark, dir) =>
      val k = 512
      val orders = tbl(spark, dir, "orders")
      val cust = tbl(spark, dir, "customer")
        .filter(col("c_acctbal") > 0)
      val a = Kmv.sketch(orders, col("o_custkey"), k)
      val b = Kmv.sketch(cust, col("c_custkey"), k)
      val ea = orders.select(col("o_custkey").as("key")).distinct()
      val eb = cust.select(col("c_custkey").as("key")).distinct()
      val exu = ea.unionByName(eb).distinct()
        .agg(count(lit(1)).as("n_union"))
      val exi = ea.join(eb, Seq("key"), "left_semi")
        .agg(count(lit(1)).as("n_intersect"))
      Kmv.setEstimates(a, b, k)
        .crossJoin(exu).crossJoin(exi)
        .select(round(col("union_est"), 6).as("union_est"),
          round(col("jaccard_est"), 6).as("jaccard_est"),
          round(col("intersect_est"), 6).as("intersect_est"),
          col("n_union"), col("n_intersect"),
          (abs(col("union_est") - col("n_union")) <=
            col("n_union") * 0.2).as("union_within_20pct"),
          (abs(col("intersect_est") - col("n_intersect")) <=
            col("n_intersect") * 0.2).as("intersect_within_20pct"))
    },


    // --- ROLLING distinct actives on the SKETCH path: per-day KMV
    //     sketches (k smallest user-hashes per day) merged across
    //     each trailing-7-day window — mergeability is the whole
    //     point of KMV (q153), and it is what replaces q167's exact
    //     grid-join when the distinct sets stop fitting: the window
    //     union handles k·7 rows per day instead of every active
    //     user. Day-partitioned rank windows only; estimates replay
    //     bit-for-bit in the oracle, with q167's exact WAU alongside
    //     as truth. ---
    "q190_rolling_distinct_kmv" -> { (spark, dir) =>
      val k = 256
      val ev = tbl(spark, dir, "events")
      val dh = ev.select(to_date(col("ts")).as("day"),
          Kmv.h48(col("user_id")).as("h")).distinct()
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day")).orderBy(col("h"))
      val daily = dh.withColumn("__rn", row_number().over(wd))
        .filter(col("__rn") <= k).drop("__rn")
      val grid = dh.agg(min(col("day")).as("__lo"),
          max(col("day")).as("__hi"))
        .select(explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 day"))).as("gday"))
      val windowed = broadcast(grid)
        .join(daily, col("day").between(date_sub(col("gday"), 6),
          col("gday")))
        .select(col("gday"), col("h")).distinct()
      val wg = org.apache.spark.sql.expressions.Window
        .partitionBy(col("gday")).orderBy(col("h"))
      val est = windowed.withColumn("__rn", row_number().over(wg))
        .filter(col("__rn") <= k)
        .groupBy(col("gday"))
        .agg(count(lit(1)).as("__c"), max(col("h")).as("__hk"))
        .select(col("gday"),
          when(col("__c") < k, col("__c").cast("double"))
            .otherwise(lit((k - 1).toDouble * 281474976710656.0) /
              col("__hk").cast("double")).as("wau7_est"))
      val du = ev.select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      val exact = broadcast(grid.withColumnRenamed("gday", "g2"))
        .join(du, col("day").between(date_sub(col("g2"), 6),
          col("g2")))
        .groupBy(col("g2"))
        .agg(count_distinct(col("user_id")).as("wau7_exact"))
      est.join(exact, col("gday") === col("g2"))
        .select(col("gday").as("day"),
          round(col("wau7_est"), 6).as("wau7_est"),
          col("wau7_exact"),
          (abs(col("wau7_est") - col("wau7_exact")) <=
            col("wau7_exact") * 0.2).as("within_20pct"))
        .orderBy(col("day"))
    },


    // --- hierarchical ratio-to-parent (the OLAP drill-down staple):
    //     nation sales as a share of their region, sales kept EXACT
    //     as cents (2-dp money through the q170 fixed-point trick) so
    //     the shares are single divisions of exact integers —
    //     unrounded hash match. Dimensions broadcast; one fact
    //     exchange on the nation grouping. ---
    "q191_ratio_to_parent" -> { (spark, dir) =>
      val o = tbl(spark, dir, "orders")
      val c = tbl(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = tbl(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = tbl(spark, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      val sales = o
        .select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("__cents"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("__cents")).as("__nc"), count(lit(1)).as("n_orders"))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("r_name"))
      sales
        .withColumn("__rc", sum(col("__nc")).over(wr))
        .select(col("r_name"), col("n_name"), col("n_orders"),
          (col("__nc").cast("double") / lit(100.0)).as("sales"),
          (col("__nc").cast("double") / col("__rc").cast("double"))
            .as("share_of_region"))
        .orderBy(col("r_name"), col("n_name"))
    },


    // --- Kaplan-Meier survival of user lifetimes (right-censored at
    //     the observation edge): risk sets and churn counts from the
    //     lifetime histogram via a reversed cumulative sum, then the
    //     survival product S(t)=Π(1−dᵤ/nᵤ) as an ORDER-FIXED fold
    //     over the ≤|days| per-day factors (the q103/q157 fold
    //     discipline — exact divisions, multiplication order pinned
    //     by t, so S(t) hash-compares UNROUNDED). Everything before
    //     the fold is integer arithmetic; the factor frame is
    //     days-sized, never user-sized. ---
    "q192_survival" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val life = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("__f"),
          max(to_date(col("ts"))).as("__l"))
      val edge = ev.agg(max(to_date(col("ts"))).as("__maxd"))
      val lt = life.crossJoin(broadcast(edge))
        .select(datediff(col("__l"), col("__f")).as("lifetime"),
          (col("__l") === col("__maxd")).as("__cens"))
        .filter(col("lifetime") >= 1)
      val byLt = lt.groupBy(col("lifetime"))
        .agg(count(lit(1)).as("__all"),
          sum(when(!col("__cens"), 1L).otherwise(0L)).as("d"))
        // the histogram has <= |observation days| rows; the explicit
        // limit states the bound the global window below rides on
        .orderBy(col("lifetime")).limit(100000)
      val wrev = org.apache.spark.sql.expressions.Window
        .orderBy(col("lifetime").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val km = byLt
        .withColumn("n_risk", sum(col("__all")).over(wrev))
        .select(col("lifetime").as("t"), col("n_risk"), col("d"),
          (lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")).as("__factor"))
      km.agg(array_sort(collect_list(struct(col("t"), col("n_risk"),
          col("d"), col("__factor")))).as("__a"))
        .select(posexplode(col("__a")).as(Seq("__i", "__r")))
        .select(col("__r.t").as("t"), col("__r.n_risk").as("n_risk"),
          col("__r.d").as("d"), col("__i"))
        .crossJoin(km.agg(array_sort(collect_list(struct(col("t"),
          col("__factor")))).as("__fs")))
        .select(col("t"), col("n_risk"), col("d"),
          expr("""aggregate(slice(transform(__fs, x -> x.__factor),
                    1, __i + 1), CAST(1.0 AS DOUBLE), (s, x) -> s * x)""")
            .as("survival"))
        .orderBy(col("t"))
    },


    // --- trimmed mean per group (the robust-aggregation complement
    //     of q162's median/MAD): trim outside the discrete [p10,p90]
    //     values (real data points via ExactQuantile — bit-exact
    //     bounds), then the mean of survivors as a CENTS ratio —
    //     exact integer sums in any order, one final division,
    //     unrounded hash match. ---
    "q194_trimmed_mean" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"), col("value").cast("double").as("v"),
          round(col("value") * 100).cast("long").as("__cents"))
      val p10 = graft.operators.ExactQuantile.quantileDisc(ev,
          col("event_type"), col("v"), 0.1)
        .select(col("grp").as("event_type"), col("q").as("__lo"))
      val p90 = graft.operators.ExactQuantile.quantileDisc(ev,
          col("event_type"), col("v"), 0.9)
        .select(col("grp").as("event_type"), col("q").as("__hi"))
      ev.join(broadcast(p10), Seq("event_type"))
        .join(broadcast(p90), Seq("event_type"))
        .filter(col("v") >= col("__lo") && col("v") <= col("__hi"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("__cents")).as("__sc"))
        .select(col("event_type"), col("n_kept"),
          (col("__sc").cast("double") / col("n_kept").cast("double") /
            lit(100.0)).as("trimmed_mean"))
        .orderBy(col("event_type"))
    },


    // --- batch sessionization readout (operators.Sessionize): 30-min
    //     gap sessions per user, then the session-size histogram with
    //     exact integer duration stats — entity-partitioned windows
    //     only, integer microseconds end-to-end. ---
    "q195_session_stats" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val per = Sessionize.withSessionIds(ev, col("user_id"),
          col("ts"), gapSec = 1800)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("__ne"),
          (max(us) - min(us)).as("__dur"))
      per.groupBy(col("__ne").as("events_per_session"))
        .agg(count(lit(1)).as("n_sessions"),
          min(col("__dur")).as("min_dur_us"),
          max(col("__dur")).as("max_dur_us"),
          sum(col("__dur")).as("total_dur_us"))
        .orderBy(col("events_per_session"))
    },


    // --- deterministic per-group MODE: the most frequent value
    //     bucket per type, ties broken by the smaller bucket — the
    //     aggregate SQL's mode() leaves tie order unspecified, pinned
    //     here on BOTH sides via an explicit (count desc, bucket asc)
    //     rank over the tiny per-type bucket census. ---
    "q197_mode" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val buckets = ev
        .select(col("event_type"),
          (floor(col("value") / 50) * 50).cast("long").as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("bucket").asc)
      buckets.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("event_type"), col("bucket").as("mode_bucket"),
          col("n").as("n_mode"))
        .orderBy(col("event_type"))
    },


    // --- empirical CDF readout at fixed thresholds: P(v <= t) per
    //     type for t ∈ {100, 200, 300} — conditional counts over one
    //     scan, exact integer ratios, no window at all (the
    //     cume_dist-at-a-point form that actually scales). ---
    "q198_cdf_at" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      def le(t: Int) = sum(when(col("value") <= t.toDouble, 1L)
        .otherwise(0L))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), le(100).as("__c100"),
          le(200).as("__c200"), le(300).as("__c300"))
        .select(col("event_type"), col("n"),
          (col("__c100").cast("double") / col("n").cast("double"))
            .as("cdf_100"),
          (col("__c200").cast("double") / col("n").cast("double"))
            .as("cdf_200"),
          (col("__c300").cast("double") / col("n").cast("double"))
            .as("cdf_300"))
        .orderBy(col("event_type"))
    },


    // --- trailing-window anomaly days: each day's count vs the
    //     TRAILING-7-day mean/std of its type, z-scored. Variance
    //     from integer power sums over a value-based RANGE frame
    //     ending at -1 (the current day never contaminates its own
    //     baseline) — exact in any order; mean/var/z are pinned-order
    //     IEEE divisions + one sqrt, so the flags and z hash-compare
    //     UNROUNDED. Window over the |days|×|types| daily frame. ---
    "q199_anomaly_days" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val daily = ev.groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(datediff(col("day"), to_date(lit("1970-01-01"))))
        .rangeBetween(-7, -1)
      daily
        .withColumn("__k", count(col("n")).over(w))
        .withColumn("__sx", sum(col("n")).over(w))
        .withColumn("__sxx", sum(col("n") * col("n")).over(w))
        .filter(col("__k") >= 3)
        .withColumn("__mean",
          col("__sx").cast("double") / col("__k").cast("double"))
        .withColumn("__var",
          (col("__k") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double") /
            (col("__k") * (col("__k") - 1)).cast("double"))
        .filter(col("__var") > 0)
        .withColumn("z",
          (col("n").cast("double") - col("__mean")) /
            sqrt(col("__var")))
        .select(col("event_type"), col("day"), col("n"), col("z"),
          (abs(col("z")) > 2.0).as("is_anomaly"))
        .orderBy(col("event_type"), col("day"))
    },


    // --- incremental materialized-view maintenance
    //     (IncrementalAgg.merge): the daily (type, day) -> (n, cents)
    //     aggregate maintained across three OVERLAPPING-KEY deltas
    //     (users split by id mod 3, so every delta touches every key
    //     and the sums must truly combine), each round persisted to
    //     parquet and re-read — history merged, never recomputed. The
    //     oracle recomputes from the full log: hash equality proves
    //     the incremental path exact (the q143/q125 differential
    //     pattern). ---
    "q200_incremental_mv" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"),
          round(col("value") * 100).cast("long").as("__cents"))
      val store = Scratch.dir("graft_q200").toString
      var current: DataFrame = null
      for (i <- 0 until 3) {
        val delta = ev.filter(pmod(col("user_id"), lit(3)) === i)
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n"), sum(col("__cents")).as("cents"))
        val merged =
          if (current == null) delta
          else graft.operators.IncrementalAgg.merge(current, delta,
            keys = Seq("event_type", "day"), sums = Seq("n", "cents"))
        merged.write.mode("overwrite").parquet(s"$store/v$i")
        current = spark.read.parquet(s"$store/v$i")
      }
      current.orderBy(col("event_type"), col("day"))
    },


    // --- multi-touch LINEAR attribution: every view in the hour
    //     before a purchase shares that conversion equally (1/k
    //     each); daily credit totals fold the credits VALUE-SORTED
    //     (the q103 deterministic-sum discipline), so mixed-
    //     denominator rational credits sum identically in both
    //     engines and the result hash-compares UNROUNDED. ---
    "q201_attribution" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          us.as("p_us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          us.as("v_us"))
      val cand = p.join(v, Seq("user_id"))
        .filter(col("v_us") <= col("p_us") &&
          col("v_us") >= col("p_us") - 3600000000L)
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_id"))
      cand.withColumn("__credit",
          lit(1.0) / count(lit(1)).over(wk).cast("double"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_touches"),
          array_sort(collect_list(col("__credit"))).as("__cs"))
        .select(col("day"), col("n_touches"),
          expr("aggregate(__cs, CAST(0.0 AS DOUBLE), (s, x) -> s + x)")
            .as("credit"))
        .orderBy(col("day"))
    },


    // --- Pareto concentration: the spend share of each type's top
    //     10% of users — exact cents per user, a type-partitioned
    //     rank, and ONE division of exact integer sums (unrounded
    //     hash match). The "how concentrated is this metric" readout
    //     next to q186's Gini. ---
    "q202_pareto" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val perUser = ev.groupBy(col("event_type"), col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("__cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("__cents").desc, col("user_id").asc)
      perUser
        .withColumn("__rn", row_number().over(w))
        .withColumn("__nu", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"))))
        // integer ceil(n/10): (n+9) div 10 — FP 0.1 would misround
        // exact decile boundaries (30 × 0.1 = 3.0000000000000004)
        .withColumn("__cut", expr("(__nu + 9) div 10"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("__cents")).as("__total"),
          sum(when(col("__rn") <= col("__cut"), col("__cents"))
            .otherwise(0L)).as("__top"))
        .select(col("event_type"), col("n_users"),
          (col("__top").cast("double") / col("__total").cast("double"))
            .as("top10_share"))
        .orderBy(col("event_type"))
    },


    // --- data-contract rule evaluation (the dbt-tests shape):
    //     uniqueness / not-null / accepted-values / range rules, each
    //     one narrow scan + a violation count, melted to one row per
    //     rule with a pass flag — the declarative DQ readout that
    //     complements the q161 census and q175 FK audit. An
    //     accepted-values rule is deliberately violated ('X' status
    //     exists) so the evaluator provably counts. ---
    "q203_dq_rules" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val ev = tbl(spark, dir, "events")
      def rule(name: String, violations: DataFrame) =
        violations.agg(count(lit(1)).as("n_violations"))
          .withColumn("rule", lit(name))
          .select(col("rule"), col("n_violations"),
            (col("n_violations") === 0).as("passed"))
      rule("orders.o_orderkey unique",
          orders.groupBy(col("o_orderkey"))
            .agg(count(lit(1)).as("__c")).filter(col("__c") > 1))
        .unionByName(rule("events.value not_null",
          ev.filter(col("value").isNull)))
        .unionByName(rule("orders.o_orderstatus accepted[O,F,P]",
          orders.filter(!col("o_orderstatus").isin("O", "F", "P"))))
        .unionByName(rule("events.value range[0,)",
          ev.filter(col("value") < 0)))
        .orderBy(col("rule"))
    },


    // --- SESSION-GAP SENSITIVITY sweep (pick the sessionize gap
    //     FROM the data, not folklore): one scan of the event stream
    //     fans out against four candidate inactivity gaps; per gap,
    //     the session count, singleton share, and largest session.
    //     The elbow in this table is where the gap stops splitting
    //     real visits — the parameter every sessionized metric
    //     downstream inherits. Windows stay partitioned by
    //     (user, gap); integers end to end. ---
    "q340_session_gap_sweep" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val ev = tbl(spark, dir, "events").select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_id"))
      val gapsDf = Seq(300L, 900L, 1800L, 3600L)
        .map(_ * 1000000L).toDF("gap_us")
      val wU = Window.partitionBy(col("user_id"), col("gap_us"))
        .orderBy(col("t"), col("event_id"))
      val marked = ev.crossJoin(broadcast(gapsDf))
        .withColumn("__lag", lag(col("t"), 1).over(wU))
        .withColumn("__st", when(col("__lag").isNull ||
          col("t") - col("__lag") > col("gap_us"), 1L).otherwise(0L))
        .withColumn("__sid", sum(col("__st")).over(
          wU.rowsBetween(Window.unboundedPreceding, 0)))
      marked.groupBy(col("gap_us"), col("user_id"), col("__sid"))
        .agg(count(lit(1)).as("__ev"))
        .groupBy(col("gap_us"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("__ev") === 1, 1L).otherwise(0L))
            .as("n_singletons"),
          max(col("__ev")).as("max_session_events"))
        .withColumn("gap_minutes", expr("gap_us div 60000000"))
        .select(col("gap_minutes"), col("n_sessions"),
          col("n_singletons"), col("max_session_events"))
        .orderBy(col("gap_minutes"))
    },


    // --- FUNNEL-WINDOW SENSITIVITY sweep (q183's attribution window
    //     as the swept knob): per candidate step window (1 h / 6 h /
    //     24 h), the users converting view→click and click→purchase
    //     under first-qualifying-event semantics. The window is the
    //     most litigated constant in funnel reporting — this is the
    //     table that settles it. First events are per-user minima
    //     (order-independent); the tiny per-user frame broadcasts
    //     against each event scan. ---
    "q341_funnel_window_sweep" -> rounded("purchase_rate" -> 6)({
      (spark, dir) =>
      import spark.implicits._
      val ev = tbl(spark, dir, "events").select(col("user_id"),
        col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      val ws = Seq(3600L, 21600L, 86400L).map(_ * 1000000L)
        .toDF("w_us")
      val v1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("t")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(broadcast(v1), Seq("user_id"))
        .crossJoin(broadcast(ws))
        .filter(col("t") > col("t1") &&
          col("t") <= col("t1") + col("w_us"))
        .groupBy(col("user_id"), col("w_us"))
        .agg(min(col("t")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(broadcast(t2), Seq("user_id"))
        .filter(col("t") > col("t2") &&
          col("t") <= col("t2") + col("w_us"))
        .groupBy(col("user_id"), col("w_us"))
        .agg(min(col("t")).as("t3"))
      val nv = v1.agg(count(lit(1)).as("n_view_users"))
      ws.crossJoin(broadcast(nv))
        .join(t2.groupBy(col("w_us"))
          .agg(count(lit(1)).as("n_click_conv")), Seq("w_us"), "left")
        .join(t3.groupBy(col("w_us"))
          .agg(count(lit(1)).as("n_purchase_conv")), Seq("w_us"),
          "left")
        .withColumn("n_click_conv",
          coalesce(col("n_click_conv"), lit(0L)))
        .withColumn("n_purchase_conv",
          coalesce(col("n_purchase_conv"), lit(0L)))
        .withColumn("w_hours", expr("w_us div 3600000000"))
        .withColumn("purchase_rate",
          col("n_purchase_conv").cast("double") /
            col("n_view_users").cast("double"))
        .select(col("w_hours"), col("n_view_users"),
          col("n_click_conv"), col("n_purchase_conv"),
          col("purchase_rate"))
        .orderBy(col("w_hours"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q20_sessionize" -> """
      WITH g AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts))
      SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM g GROUP BY 1 ORDER BY 1""",


    "q50_edges_duration" -> """
      WITH d AS (SELECT CAST(unnest(generate_series(0, 1500, 300)) AS DOUBLE)
                   AS dur),
      s AS (SELECT floor(value / 300) * 300 AS dur, count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events WHERE value >= 0 AND value < 1800 GROUP BY 1)
      SELECT d.dur, coalesce(s.n, 0) AS n, s.sum_value
      FROM d LEFT JOIN s USING (dur)
      ORDER BY d.dur""",


    "q60_salted_agg" -> """
      SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
             count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1""",


    "q61_salted_join" -> """
      SELECT n_name, count(*) AS n_suppliers
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1""",


    "q73_bucketed_join" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1""",


    // exact CROSS-SET (new batch vs historical 70%) n-gram-Jaccard
    // pairs, df-capped at 16 like the engine's exact twin; the LSH +
    // signature-estimate path must recover >= 90% of them
    "q95_incremental_neardup" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents WHERE doc_id % 10 < 7),
      tk AS (SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
             FROM base),
      sh AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                      list_distinct(list_transform(
                        generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END AS s
             FROM tk),
      ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
      keep AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) <= 16),
      ex AS (SELECT doc_id, ex0.g FROM ex0 JOIN keep USING (g)),
      sz AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_shared
                FROM ex a JOIN ex b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE round(CAST(n_shared AS DOUBLE)
                    / (sa.sz + sb.sz - n_shared), 6) >= 0.5
          AND ((id_a < 1000000 AND id_a % 10 < 7)
               <> (id_b < 1000000 AND id_b % 10 < 7)))
      SELECT count(*) AS pairs_exact, TRUE AS recall_floor_met
      FROM pairs""",


    // one Lloyd step: nearest-centroid assignment (8 lowest-id
    // vectors, ties to lower cent_id) then element-wise per-cell
    // means; equal-length unnests zip in DuckDB
    // hashed-BoW input on purpose: integer-count vectors make every
    // per-cell mean an exact integer-sum ratio, order-independent in
    // both engines (the avg-reorder hazard embeddings would carry)
    "q101_kmeans_step" -> s"""
      WITH $bowDenseDocsSql,
      cents AS (SELECT doc_id AS cent_id, v AS cv FROM dense
                ORDER BY doc_id LIMIT 8),
      scored AS (SELECT dense.doc_id, dense.v, cents.cent_id,
                        list_cosine_similarity(dense.v, cents.cv) AS cos
                 FROM dense CROSS JOIN cents),
      assigned AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT doc_id, v, cent_id AS cell,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY cos DESC, cent_id ASC) AS rn
          FROM scored) WHERE rn = 1),
      x AS (SELECT cell,
                   unnest(generate_series(1, len(v))) AS dim,
                   unnest(v) AS val
            FROM assigned)
      SELECT cell, CAST(dim AS INT) AS dim, round(avg(val), 6) AS c
      FROM x GROUP BY 1, 2 ORDER BY 1, 2""",


    // full-outer fingerprint join: added / removed / changed /
    // unchanged per id
    "q105_snapshot_diff" -> """
      WITH prev AS (SELECT doc_id AS id, md5(text) AS fp FROM documents),
      cur0 AS (SELECT doc_id,
                 CASE WHEN doc_id % 13 = 1 THEN text || ' v2'
                      ELSE text END AS text
               FROM documents WHERE doc_id % 17 <> 3),
      curadd AS (SELECT doc_id + 2000000 AS doc_id, text
                 FROM documents WHERE doc_id % 11 = 5),
      cur AS (SELECT doc_id AS id, md5(text) AS fp FROM
                (SELECT * FROM cur0 UNION ALL SELECT * FROM curadd)),
      j AS (SELECT coalesce(p.id, c.id) AS doc_id,
              CASE WHEN p.id IS NULL THEN 'added'
                   WHEN c.id IS NULL THEN 'removed'
                   WHEN p.fp <> c.fp THEN 'changed'
                   ELSE 'unchanged' END AS status
            FROM prev p FULL OUTER JOIN cur c ON p.id = c.id)
      SELECT doc_id, status FROM j ORDER BY doc_id""",


    "q109_ivf_fitted_probe" -> q109OracleSql,


    // Morton interleave as plain bit arithmetic: the per-bit terms
    // occupy disjoint positions, so summing them == OR-ing them
    "q120_zorder_key" -> """
      WITH t AS (SELECT o_orderkey,
                   CAST(o_custkey % 1024 AS BIGINT) AS a,
                   CAST(o_orderkey % 1024 AS BIGINT) AS b
                 FROM orders)
      SELECT o_orderkey, a, b,
        CAST(list_sum(list_transform(generate_series(0, 9), i ->
          (((a >> i) & 1) << (2 * i)) + (((b >> i) & 1) << (2 * i + 1))
          )) AS BIGINT) AS z
      FROM t ORDER BY z, o_orderkey LIMIT 200""",


    // compaction only changes file layout: content == the source
    "q128_compaction" -> """
      SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id""",


    // chained per-step funnel: each step's reach time is the earliest
    // event of that type strictly after the previous step's time
    "q133_funnel" -> funnelSummarySql,


    // cohort = Monday-truncated week of first event; offset = whole
    // weeks of day-difference from the cohort week start
    "q135_retention" -> """
      WITH f AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1),
      c AS (SELECT user_id,
                   CAST(date_trunc('week', t0) AS DATE) AS cohort_week
            FROM f),
      a AS (SELECT DISTINCT e.user_id, c.cohort_week,
              CAST(date_diff('day', c.cohort_week, CAST(e.ts AS DATE))
                   // 7 AS INT) AS wk
            FROM events e JOIN c USING (user_id)
            WHERE date_diff('day', c.cohort_week, CAST(e.ts AS DATE))
                   // 7 <= 3),
      act AS (SELECT cohort_week, wk, CAST(count(*) AS BIGINT)
                AS n_active FROM a GROUP BY 1, 2),
      sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT)
               AS cohort_size FROM c GROUP BY 1)
      SELECT act.cohort_week, wk, n_active, cohort_size,
             CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE)
               AS retention
      FROM act JOIN sz USING (cohort_week)
      ORDER BY cohort_week, wk""",


    // copy-on-write delete: surviving content == source minus victims
    "q136_delete_by_key" -> """
      SELECT doc_id, source, n_chars FROM documents
      WHERE doc_id % 7 <> 3 ORDER BY doc_id""",


    // rank-window replay of the discrete quantile: the ceil(p*n)-th
    // smallest value per group (selected values are input values —
    // no rounding needed)
    "q137_exact_quantile" -> """
      WITH x AS (SELECT l_returnflag,
                        CAST(l_extendedprice AS DOUBLE) AS v
                 FROM lineitem WHERE l_extendedprice IS NOT NULL),
      r AS (SELECT l_returnflag, v,
                   row_number() OVER (PARTITION BY l_returnflag
                     ORDER BY v) AS rnk,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM x)
      SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
             max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN v END) AS p50,
             max(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT)
                      THEN v END) AS p90
      FROM r GROUP BY 1 ORDER BY 1""",


    // lag flags run starts, a running sum numbers runs, lead closes
    // each interval — the same three windows the operator uses
    "q139_scd2" -> scd2RebuildSql,


    // SCD2 build over the state sub-log (as q139), then the as-of
    // range join and a per-state rollup; the value sum is a fold over
    // the value-sorted list in both engines
    "q142_asof_dimension" -> """
      WITH st AS (SELECT user_id AS entity, ts AS t,
                         event_type AS attr,
                         CASE WHEN lag(event_type) OVER
                                (PARTITION BY user_id ORDER BY ts)
                                IS DISTINCT FROM event_type
                              THEN 1 ELSE 0 END AS chg
                  FROM events
                  WHERE event_type IN ('signup', 'error')),
      r AS (SELECT entity, t, attr,
                   sum(chg) OVER (PARTITION BY entity ORDER BY t
                     ROWS UNBOUNDED PRECEDING) AS run
            FROM st),
      c AS (SELECT entity, run, min(attr) AS attr,
                   min(t) AS valid_from
            FROM r GROUP BY entity, run),
      dim AS (SELECT entity, attr, valid_from,
                lead(valid_from) OVER
                  (PARTITION BY entity ORDER BY run) AS valid_to
              FROM c),
      f AS (SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'),
      j AS (SELECT f.user_id, f.value, d.attr AS state
            FROM f LEFT JOIN dim d ON f.user_id = d.entity
              AND f.ts >= d.valid_from
              AND (d.valid_to IS NULL OR f.ts < d.valid_to))
      SELECT state, count(*) AS n_purchases,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             round(list_reduce(list(value ORDER BY value),
                               (a, b) -> a + b), 4) AS sum_value
      FROM j GROUP BY 1 ORDER BY 1""",


    // FULL REBUILD from the complete log (q139's oracle verbatim) —
    // the Spark side merges incrementally from a pre-cutoff dimension,
    // so the hash match is the incremental ≡ batch proof
    "q143_scd2_merge" -> scd2RebuildSql,


    // token counts -> exact-ratio entropy terms -> value-sorted fold;
    // + CAST(0 AS DOUBLE) normalizes the single-token -0.0 (Spark's
    // fold starts at +0.0, list_reduce starts at the first element)
    "q145_entropy" -> """
      WITH tk AS (SELECT doc_id, unnest(list_filter(
              string_split_regex(lower(trim(text)), '\s+'),
              x -> length(x) > 0)) AS t FROM documents),
      cnt AS (SELECT doc_id, t, count(*) AS c FROM tk GROUP BY 1, 2),
      n AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS nd
            FROM cnt GROUP BY 1),
      terms AS (SELECT cnt.doc_id, nd,
                  -(CAST(c AS DOUBLE) / nd)
                    * ln(CAST(c AS DOUBLE) / nd) AS term
                FROM cnt JOIN n ON cnt.doc_id = n.doc_id)
      SELECT doc_id, CAST(max(nd) AS BIGINT) AS n_tokens,
             round(list_reduce(list(term ORDER BY term),
                               (a, b) -> a + b)
                   + CAST(0 AS DOUBLE), 6) AS entropy
      FROM terms GROUP BY 1 ORDER BY 1""",


    // the SAME sketch rebuilt: md5("j_tok") 16-bit buckets mod 1024,
    // occupied (j,bucket) cell counts, min over the 4 probed cells —
    // integer arithmetic end to end, no tolerance anywhere
    "q152_count_min" -> """
      WITH toks AS (SELECT unnest(list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          x -> length(x) > 0)) AS tok FROM documents),
      js AS (SELECT unnest(generate_series(0, 3)) AS j),
      cells AS (SELECT j,
                  CAST(('0x' || substring(md5(
                    CAST(j AS VARCHAR) || '_' || tok), 1, 4))
                    AS INTEGER) % 1024 AS bucket,
                  count(*) AS n
                FROM toks, js GROUP BY 1, 2),
      watch AS (SELECT unnest(['the','and','spark','query','vector',
                  'de','la','und','der','data','of','to','le','les',
                  'el','en','für','avec','con','zzzabsent']) AS tok),
      probes AS (SELECT tok, j,
                   CAST(('0x' || substring(md5(
                     CAST(j AS VARCHAR) || '_' || tok), 1, 4))
                     AS INTEGER) % 1024 AS bucket
                 FROM watch, js),
      est AS (SELECT tok, CAST(min(coalesce(c.n, 0)) AS BIGINT) AS est
              FROM probes p LEFT JOIN cells c USING (j, bucket)
              GROUP BY tok),
      truth AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_n
                FROM toks JOIN watch USING (tok) GROUP BY 1)
      SELECT w.tok, est,
             coalesce(true_n, 0) AS true_n,
             est >= coalesce(true_n, 0) AS never_undercounts
      FROM watch w JOIN est USING (tok) LEFT JOIN truth USING (tok)
      ORDER BY w.tok""",


    // same 48-bit md5 hashes, same k smallest, same (k-1)*2^48/h_k
    // division — the estimate is one deterministic IEEE op chain
    "q153_kmv_distinct" -> """
      WITH h AS (SELECT DISTINCT CAST(('0x' || substring(md5(
                   CAST(l_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) AS h
                 FROM lineitem),
      k AS (SELECT h FROM h ORDER BY h LIMIT 256),
      agg AS (SELECT count(*) AS c, max(h) AS hk FROM k),
      est AS (SELECT CASE WHEN c < 256 THEN CAST(c AS DOUBLE)
                          ELSE CAST(255 AS DOUBLE)
                               * CAST(281474976710656 AS DOUBLE)
                               / CAST(hk AS DOUBLE) END AS e
              FROM agg),
      ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE)
               AS n_exact FROM lineitem)
      SELECT round(e, 6) AS distinct_est, n_exact,
             abs(e - n_exact) <= n_exact * 0.2 AS within_20pct
      FROM est, ex""",


    // both sketches rebuilt cell-for-cell; inner product per hash row,
    // min over rows — integer arithmetic end to end
    "q154_cms_join_size" -> """
      WITH js AS (SELECT unnest(generate_series(0, 3)) AS j),
      a AS (SELECT j, CAST(('0x' || substring(md5(
               CAST(j AS VARCHAR) || '_' || CAST(l_orderkey AS VARCHAR)),
               1, 4)) AS INTEGER) % 4096 AS bucket, count(*) AS na
            FROM lineitem, js GROUP BY 1, 2),
      b AS (SELECT j, CAST(('0x' || substring(md5(
               CAST(j AS VARCHAR) || '_' || CAST(o_orderkey AS VARCHAR)),
               1, 4)) AS INTEGER) % 4096 AS bucket, count(*) AS nb
            FROM orders, js WHERE o_orderkey % 3 = 0 GROUP BY 1, 2),
      ip AS (SELECT a.j, CAST(sum(na * nb) AS BIGINT) AS ip
             FROM a JOIN b USING (j, bucket) GROUP BY 1),
      est AS (SELECT CAST(min(ip) AS BIGINT) AS join_size_est FROM ip),
      t AS (SELECT CAST(count(*) AS BIGINT) AS true_join
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey % 3 = 0)
      SELECT join_size_est, true_join,
             join_size_est >= true_join AS never_undercounts
      FROM est, t""",


    "q157_ewma" -> ewmaSql,


    "q158_markov_transitions" -> """
      WITH s AS (SELECT user_id, event_type,
                        lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_type
                 FROM events),
      c AS (SELECT prev_type, event_type, count(*) AS n
            FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, event_type, CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE) /
               CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      FROM c ORDER BY prev_type, event_type""",


    "q159_gap_fill" -> """
      WITH b AS (SELECT date_trunc('day', min(ts)) AS lo,
                        date_trunc('day', max(ts)) AS hi FROM events),
      d AS (SELECT unnest(generate_series((SELECT lo FROM b),
                   (SELECT hi FROM b), INTERVAL 1 DAY)) AS day),
      t AS (SELECT DISTINCT event_type FROM events),
      s AS (SELECT event_type, date_trunc('day', ts) AS day,
                   count(*) AS n
            FROM events GROUP BY 1, 2)
      SELECT t.event_type, CAST(d.day AS DATE) AS day,
             CAST(coalesce(s.n, 0) AS BIGINT) AS n,
             s.n IS NULL AS is_gap,
             CAST(last_value(s.n IGNORE NULLS) OVER
               (PARTITION BY t.event_type ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS carry_n
      FROM t CROSS JOIN d LEFT JOIN s
        ON s.event_type = t.event_type AND s.day = d.day
      ORDER BY t.event_type, d.day""",


    "q161_profile" -> """
      SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
             CAST(min(event_id) AS VARCHAR) AS min_s,
             CAST(max(event_id) AS VARCHAR) AS max_s
      FROM events
      UNION ALL
      SELECT 'user_id', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(count(DISTINCT user_id) AS BIGINT),
             CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
      FROM events
      UNION ALL
      SELECT 'event_type', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(count(DISTINCT event_type) AS BIGINT),
             min(event_type), max(event_type)
      FROM events
      UNION ALL
      SELECT 'ts', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(count(DISTINCT ts) AS BIGINT),
             strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f'),
             strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f')
      FROM events
      UNION ALL
      SELECT 'value', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(count(DISTINCT value) AS BIGINT),
             CAST(CAST(min(value) AS DECIMAL(18,6)) AS VARCHAR),
             CAST(CAST(max(value) AS DECIMAL(18,6)) AS VARCHAR)
      FROM events
      ORDER BY col_name""",


    "q162_robust_outliers" -> """
      WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS v
                 FROM events WHERE value IS NOT NULL),
      r AS (SELECT event_type, v,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY v) AS rnk,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM e),
      m AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                   max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
                            THEN v END) AS med
            FROM r GROUP BY 1),
      d AS (SELECT e.event_type, abs(e.v - m.med) AS ad
            FROM e JOIN m USING (event_type)),
      dr AS (SELECT event_type, ad,
                    row_number() OVER (PARTITION BY event_type
                      ORDER BY ad) AS rnk,
                    count(*) OVER (PARTITION BY event_type) AS n
             FROM d),
      md AS (SELECT event_type,
                    max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
                             THEN ad END) AS mad
             FROM dr GROUP BY 1),
      o AS (SELECT d.event_type,
                   CAST(sum(CASE WHEN d.ad > 3.0 * md.mad
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_outliers
            FROM d JOIN md USING (event_type) GROUP BY 1)
      SELECT m.event_type, m.n, m.med, md.mad, o.n_outliers
      FROM m JOIN md USING (event_type) JOIN o USING (event_type)
      ORDER BY m.event_type""",


    "q163_golden_record" -> """
      WITH RECURSIVE
      ids AS (SELECT doc_id FROM documents),
      e AS (
        SELECT a.doc_id AS x, b.doc_id AS y FROM ids a JOIN ids b
          ON b.doc_id = a.doc_id + 1 AND a.doc_id % 7 <> 6
        UNION ALL
        SELECT a.doc_id, b.doc_id FROM ids a JOIN ids b
          ON b.doc_id = a.doc_id + 14 AND a.doc_id % 21 = 3),
      ed AS (SELECT x, y FROM e UNION ALL SELECT y, x FROM e),
      r AS (SELECT x AS id, x AS rr FROM ed
            UNION
            SELECT ed.x, r.rr FROM ed JOIN r ON ed.y = r.id),
      c AS (SELECT id, min(rr) AS comp FROM r GROUP BY id),
      m AS (SELECT d.doc_id, d.source, d.n_chars,
                   coalesce(c.comp, d.doc_id) AS comp
            FROM documents d LEFT JOIN c ON c.id = d.doc_id),
      g AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members,
                   min(source) AS src_min FROM m GROUP BY 1),
      rk AS (SELECT comp, doc_id, n_chars, row_number() OVER
               (PARTITION BY comp ORDER BY n_chars DESC, doc_id ASC)
               AS rn
             FROM m)
      SELECT g.comp, g.n_members, g.src_min, rk.doc_id AS rep_id,
             rk.n_chars AS rep_chars
      FROM g JOIN rk ON rk.comp = g.comp AND rk.rn = 1
      ORDER BY g.comp""",


    "q164_rolling_window" -> """
      WITH d AS (SELECT event_type,
                        CAST(date_trunc('day', ts) AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS n
                 FROM events GROUP BY 1, 2)
      SELECT event_type, day, n,
             CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
               AS BIGINT) AS roll7
      FROM d ORDER BY event_type, day""",


    "q165_ab_test" -> """
      WITH u AS (SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS conv
                 FROM events GROUP BY 1),
      a AS (SELECT CASE WHEN CAST(('0x' ||
                     substring(md5(CAST(user_id AS VARCHAR)), 1, 4))
                     AS INTEGER) % 100 < 50
                   THEN 'A' ELSE 'B' END AS arm, conv
            FROM u),
      w AS (SELECT
              CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END)
                   AS BIGINT) AS conv_a,
              CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END)
                   AS BIGINT) AS conv_b
            FROM a),
      r AS (SELECT *,
              CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
              CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
              CAST(conv_a + conv_b AS DOUBLE) /
                CAST(n_a + n_b AS DOUBLE) AS p
            FROM w)
      SELECT n_a, conv_a, n_b, conv_b, rate_a, rate_b,
             (rate_a - rate_b) / sqrt((p * (1.0 - p)) *
               ((1.0 / CAST(n_a AS DOUBLE)) +
                (1.0 / CAST(n_b AS DOUBLE)))) AS z
      FROM r""",


    "q166_edit_distance" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents),
      k AS (SELECT doc_id, lower(substring(trim(text), 1, 24)) AS key,
                   lower(substring(trim(text), 1, 40)) AS pfx
            FROM base),
      r AS (SELECT doc_id, key, pfx,
                   substring(key, 1, 8) AS block,
                   row_number() OVER (PARTITION BY substring(key, 1, 8)
                     ORDER BY key, doc_id) AS rn
            FROM k),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.pfx AS pfx_a, b.pfx AS pfx_b
            FROM r a JOIN r b ON a.block = b.block
              AND b.rn > a.rn AND b.rn <= a.rn + 3)
      SELECT id_a, id_b,
             CAST(levenshtein(pfx_a, pfx_b) AS INT) AS dist
      FROM p WHERE levenshtein(pfx_a, pfx_b) <= 8
      ORDER BY id_a, id_b""",


    "q167_rolling_dau" -> """
      WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
                    AS day, user_id FROM events),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM du),
      g AS (SELECT CAST(unnest(generate_series(
              CAST((SELECT lo FROM b) AS TIMESTAMP),
              CAST((SELECT hi FROM b) AS TIMESTAMP),
              INTERVAL 1 DAY)) AS DATE) AS day)
      SELECT g.day,
             CAST(count(DISTINCT CASE WHEN du.day = g.day
               THEN du.user_id END) AS BIGINT) AS dau,
             CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau7
      FROM g LEFT JOIN du ON du.day BETWEEN g.day - 6 AND g.day
      GROUP BY g.day ORDER BY g.day""",


    "q168_equidepth_hist" -> """
      WITH t AS (SELECT event_type, value AS v,
                        ntile(10) OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS bin
                 FROM events)
      SELECT event_type, CAST(bin AS INT) AS bin,
             CAST(count(*) AS BIGINT) AS n, min(v) AS lo, max(v) AS hi
      FROM t GROUP BY 1, 2 ORDER BY 1, 2""",


    "q169_debounce" -> """
      WITH s AS (SELECT event_type, epoch_us(ts) AS us,
                        lag(epoch_us(ts)) OVER (
                          PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS pus
                 FROM events)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN pus IS NULL OR us - pus > 5000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM s GROUP BY 1 ORDER BY 1""",


    "q170_twa" -> """
      WITH s AS (SELECT user_id, epoch_us(ts) AS us,
                        CAST(round(value * 100) AS BIGINT) AS cents,
                        lead(epoch_us(ts)) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS nus
                 FROM events),
      i AS (SELECT user_id, cents, nus - us AS dt
            FROM s WHERE nus IS NOT NULL)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
             CAST(sum(cents * dt) AS DOUBLE) /
               CAST(sum(dt) AS DOUBLE) / 100.0 AS twa
      FROM i GROUP BY 1 ORDER BY 1""",


    "q171_time_to_convert" -> """
      WITH vv AS (SELECT user_id, min(epoch_us(ts)) AS v_us
                  FROM events WHERE event_type = 'view' GROUP BY 1),
      pp AS (SELECT user_id, epoch_us(ts) AS p_us
             FROM events WHERE event_type = 'purchase'),
      c AS (SELECT vv.user_id,
                   CASE WHEN CAST(('0x' || substring(md5(
                       CAST(vv.user_id AS VARCHAR)), 1, 4))
                       AS INTEGER) % 100 < 50
                   THEN 'A' ELSE 'B' END AS arm,
                   min(p_us - v_us) AS dt
            FROM vv JOIN pp USING (user_id)
            WHERE p_us >= v_us GROUP BY 1, 2),
      r AS (SELECT arm, dt,
                   row_number() OVER (PARTITION BY arm ORDER BY dt)
                     AS rnk,
                   count(*) OVER (PARTITION BY arm) AS n
            FROM c)
      SELECT arm, CAST(max(n) AS BIGINT) AS n_users,
             CAST(max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
                           THEN dt END) AS BIGINT) AS p50_us,
             CAST(max(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT)
                           THEN dt END) AS BIGINT) AS p90_us
      FROM r GROUP BY arm ORDER BY arm""",


    "q173_top_paths" -> """
      WITH s AS (SELECT user_id,
                        list(event_type ORDER BY ts, event_id) AS seq
                 FROM events GROUP BY 1),
      p AS (SELECT array_to_string(seq[1:3], '>') AS path FROM s)
      SELECT path, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 10""",


    "q174_minmax_scale" -> """
      WITH mm AS (SELECT event_type, min(value) AS mn, max(value) AS mx
                  FROM events GROUP BY 1),
      n AS (SELECT e.event_type,
                   (e.value - mm.mn) / (mm.mx - mm.mn) AS norm
            FROM events e JOIN mm USING (event_type))
      SELECT event_type,
             CAST(least(floor(norm * 10), 9) AS INT) AS decile,
             CAST(count(*) AS BIGINT) AS n,
             min(norm) AS lo, max(norm) AS hi
      FROM n GROUP BY 1, 2 ORDER BY 1, 2""",


    "q175_ref_integrity" -> """
      WITH cust AS (SELECT c_custkey FROM customer
                    WHERE c_custkey % 10 <> 3),
      ords AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 17 <> 5)
      SELECT 'lineitem->orders' AS relation,
             CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
             CAST((SELECT count(*) FROM lineitem l
                   LEFT JOIN ords o ON l.l_orderkey = o.o_orderkey
                   WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_orphans
      UNION ALL
      SELECT 'orders->customer',
             CAST((SELECT count(*) FROM orders) AS BIGINT),
             CAST((SELECT count(*) FROM orders x
                   LEFT JOIN cust c ON x.o_custkey = c.c_custkey
                   WHERE c.c_custkey IS NULL) AS BIGINT)
      ORDER BY relation""",


    "q176_cdc_apply" -> """
      WITH merged AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 13 <> 0)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             round(sum(price), 2) AS sum_price,
             CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_updated
      FROM merged""",


    "q177_int8_quantize" -> """
      WITH d AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
                        CAST(generate_subscripts(embedding, 1) - 1
                             AS INT) AS dim
                 FROM embeddings),
      mm AS (SELECT dim, min(v) AS mn, max(v) AS mx,
                    (max(v) - min(v)) / 255.0 AS scale
             FROM d GROUP BY 1),
      q AS (SELECT d.dim, d.v, mm.mn, mm.mx, mm.scale,
                   CAST(round((d.v - mm.mn) / mm.scale) AS INT) AS code
            FROM d JOIN mm USING (dim)),
      e AS (SELECT dim, mn, mx, scale, code,
                   abs(v - (mn + code * scale)) AS err
            FROM q)
      SELECT dim, CAST(count(*) AS BIGINT) AS n, min(mn) AS mn,
             min(mx) AS mx, min(scale) AS scale, max(err) AS max_err,
             CAST(count(DISTINCT code) AS BIGINT) AS n_codes
      FROM e GROUP BY 1 ORDER BY 1""",


    "q179_gap_histogram" -> """
      WITH s AS (SELECT user_id, epoch_us(ts) AS us,
                        lag(epoch_us(ts)) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS pus
                 FROM events),
      g AS (SELECT us - pus AS gap FROM s
            WHERE pus IS NOT NULL AND us - pus > 0)
      SELECT CAST(length(bin(gap)) - 1 AS INT) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             min(gap) AS min_gap, max(gap) AS max_gap
      FROM g GROUP BY 1 ORDER BY 1""",


    "q180_activity_heatmap" -> """
      SELECT CAST(dayofweek(ts) AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",


    "q181_trend_slope" -> """
      WITH daily AS (SELECT event_type,
                            CAST(date_trunc('day', ts) AS DATE) AS day,
                            CAST(count(*) AS BIGINT) AS y
                     FROM events GROUP BY 1, 2),
      o AS (SELECT min(day) AS d0 FROM daily),
      s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(date_diff('day', o.d0, day)) AS BIGINT)
                     AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(date_diff('day', o.d0, day) * y) AS BIGINT)
                     AS sxy,
                   CAST(sum(date_diff('day', o.d0, day) *
                            date_diff('day', o.d0, day)) AS BIGINT)
                     AS sxx
            FROM daily CROSS JOIN o GROUP BY 1),
      r AS (SELECT event_type, k,
                   CAST(k * sxy - sx * sy AS DOUBLE) /
                     CAST(k * sxx - sx * sx AS DOUBLE) AS slope,
                   sx, sy
            FROM s)
      SELECT event_type, k, slope,
             (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
               CAST(k AS DOUBLE) AS intercept
      FROM r ORDER BY event_type""",


    "q182_nearest_join" -> """
      WITH p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
                 FROM events WHERE event_type = 'purchase'),
      v AS (SELECT user_id, event_id AS v_id, epoch_us(ts) AS v_us
            FROM events WHERE event_type = 'view'),
      c AS (SELECT p.p_id, p.user_id, v.v_id,
                   abs(p.p_us - v.v_us) AS abs_dt
            FROM p JOIN v USING (user_id)
            WHERE abs(p.p_us - v.v_us) <= 3600000000),
      r AS (SELECT *, row_number() OVER (PARTITION BY p_id
              ORDER BY abs_dt, v_id) AS rn
            FROM c)
      SELECT p_id, user_id, v_id, abs_dt
      FROM r WHERE rn = 1 ORDER BY p_id""",


    "q183_timed_funnel" -> """
      WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts) AS t
             FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t
               AND e.ts <= s1.t + INTERVAL 1 HOUR GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts) AS t
             FROM events e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t
               AND e.ts <= s2.t + INTERVAL 1 HOUR GROUP BY 1),
      u AS (SELECT 1 AS step_ix, 'view' AS step, count(*) AS n FROM s1
            UNION ALL
            SELECT 2, 'click', count(*) FROM s2
            UNION ALL
            SELECT 3, 'purchase', count(*) FROM s3),
      f AS (SELECT n AS n1 FROM u WHERE step_ix = 1)
      SELECT step_ix, step, CAST(n AS BIGINT) AS n_users,
             CAST(n AS DOUBLE) / CAST(f.n1 AS DOUBLE) AS conv
      FROM u CROSS JOIN f
      WHERE n > 0 -- engine drop-off TRUNCATES: an unreached step has
                  -- no row (a small-SF 1-hour funnel can empty out)
      ORDER BY step_ix""",


    "q186_gini" -> """
      WITH s AS (SELECT event_type, value, event_id,
                        CAST(round(value * 100) AS BIGINT) AS cents,
                        CAST(row_number() OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS BIGINT) AS i
                 FROM events),
      g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS sx,
                   CAST(sum(i * cents) AS BIGINT) AS swx
            FROM s GROUP BY 1)
      SELECT event_type, n,
             CAST(2 * swx AS DOUBLE) / CAST(n * sx AS DOUBLE) -
               CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
      FROM g ORDER BY event_type""",


    "q188_kmv_setops" -> """
      WITH sa AS (SELECT DISTINCT CAST(('0x' || substring(md5(
                    CAST(o_custkey AS VARCHAR)), 1, 12)) AS BIGINT)
                    AS h FROM orders),
      ka AS (SELECT h FROM sa ORDER BY h LIMIT 512),
      sb AS (SELECT DISTINCT CAST(('0x' || substring(md5(
               CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT) AS h
             FROM customer WHERE c_acctbal > 0),
      kb2 AS (SELECT h FROM sb ORDER BY h LIMIT 512),
      u AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb2)
            ORDER BY h LIMIT 512),
      uc AS (SELECT count(*) AS ku, max(h) AS hk FROM u),
      ib AS (SELECT count(*) AS kboth FROM u
             WHERE h IN (SELECT h FROM ka)
               AND h IN (SELECT h FROM kb2)),
      ue AS (SELECT CASE WHEN ku < 512 THEN CAST(ku AS DOUBLE)
                         ELSE CAST(511 AS DOUBLE)
                              * CAST(281474976710656 AS DOUBLE)
                              / CAST(hk AS DOUBLE) END AS uest,
                    ku
             FROM uc),
      exu AS (SELECT CAST(count(*) AS BIGINT) AS n_union FROM
                (SELECT o_custkey AS k FROM orders
                 UNION
                 SELECT c_custkey FROM customer WHERE c_acctbal > 0)),
      exi AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
                AS n_intersect
              FROM orders WHERE o_custkey IN
                (SELECT c_custkey FROM customer WHERE c_acctbal > 0))
      SELECT round(uest, 6) AS union_est,
             round(CAST(kboth AS DOUBLE) / CAST(ku AS DOUBLE), 6)
               AS jaccard_est,
             round(CAST(kboth AS DOUBLE) / CAST(ku AS DOUBLE) * uest,
               6) AS intersect_est,
             n_union, n_intersect,
             abs(uest - n_union) <= n_union * 0.2
               AS union_within_20pct,
             abs(CAST(kboth AS DOUBLE) / CAST(ku AS DOUBLE) * uest
                 - n_intersect) <= n_intersect * 0.2
               AS intersect_within_20pct
      FROM ue, ib, exu, exi""",


    "q190_rolling_distinct_kmv" -> """
      WITH dh AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
                    AS day,
                    CAST(('0x' || substring(md5(
                      CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)
                      AS h
                  FROM events),
      daily AS (SELECT day, h FROM
                 (SELECT day, h, row_number() OVER (PARTITION BY day
                    ORDER BY h) AS rn FROM dh)
                WHERE rn <= 256),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM dh),
      g AS (SELECT CAST(unnest(generate_series(
              CAST((SELECT lo FROM b) AS TIMESTAMP),
              CAST((SELECT hi FROM b) AS TIMESTAMP),
              INTERVAL 1 DAY)) AS DATE) AS gday),
      wnd AS (SELECT DISTINCT g.gday, d.h
              FROM g JOIN daily d
                ON d.day BETWEEN g.gday - 6 AND g.gday),
      topw AS (SELECT gday, h FROM
                (SELECT gday, h, row_number() OVER (PARTITION BY gday
                   ORDER BY h) AS rn FROM wnd)
               WHERE rn <= 256),
      est AS (SELECT gday, count(*) AS c, max(h) AS hk
              FROM topw GROUP BY 1),
      ee AS (SELECT gday,
               CASE WHEN c < 256 THEN CAST(c AS DOUBLE)
                    ELSE CAST(255 AS DOUBLE)
                         * CAST(281474976710656 AS DOUBLE)
                         / CAST(hk AS DOUBLE) END AS wau7_est
             FROM est),
      du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
               AS day, user_id FROM events),
      ex AS (SELECT g.gday, CAST(count(DISTINCT du.user_id) AS BIGINT)
               AS wau7_exact
             FROM g JOIN du ON du.day BETWEEN g.gday - 6 AND g.gday
             GROUP BY 1)
      SELECT ee.gday AS day, round(ee.wau7_est, 6) AS wau7_est,
             ex.wau7_exact,
             abs(ee.wau7_est - ex.wau7_exact) <= ex.wau7_exact * 0.2
               AS within_20pct
      FROM ee JOIN ex ON ee.gday = ex.gday
      ORDER BY ee.gday""",


    "q191_ratio_to_parent" -> """
      WITH s AS (SELECT r.r_name, n.n_name,
                        CAST(sum(CAST(round(o.o_totalprice * 100)
                          AS BIGINT)) AS BIGINT) AS nc,
                        CAST(count(*) AS BIGINT) AS n_orders
                 FROM orders o
                 JOIN customer c ON o.o_custkey = c.c_custkey
                 JOIN nation n ON c.c_nationkey = n.n_nationkey
                 JOIN region r ON n.n_regionkey = r.r_regionkey
                 GROUP BY 1, 2),
      t AS (SELECT *, CAST(sum(nc) OVER (PARTITION BY r_name)
                           AS BIGINT) AS rc
            FROM s)
      SELECT r_name, n_name, n_orders,
             CAST(nc AS DOUBLE) / 100.0 AS sales,
             CAST(nc AS DOUBLE) / CAST(rc AS DOUBLE)
               AS share_of_region
      FROM t ORDER BY r_name, n_name""",


    "q192_survival" -> """
      WITH life AS (SELECT user_id,
                      CAST(date_trunc('day', min(ts)) AS DATE) AS f,
                      CAST(date_trunc('day', max(ts)) AS DATE) AS l
                    FROM events GROUP BY 1),
      edge AS (SELECT CAST(date_trunc('day', max(ts)) AS DATE)
                 AS maxd FROM events),
      lt AS (SELECT date_diff('day', f, l) AS lifetime,
                    l = edge.maxd AS cens
             FROM life CROSS JOIN edge
             WHERE date_diff('day', f, l) >= 1),
      bylt AS (SELECT lifetime, CAST(count(*) AS BIGINT) AS alln,
                      CAST(sum(CASE WHEN cens THEN 0 ELSE 1 END)
                           AS BIGINT) AS d
               FROM lt GROUP BY 1),
      km AS (SELECT lifetime AS t, d,
                    CAST(sum(alln) OVER (ORDER BY lifetime DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS n_risk
             FROM bylt),
      f2 AS (SELECT t, n_risk, d,
                    1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                      AS factor
             FROM km),
      arr AS (SELECT list(factor ORDER BY t) AS fs FROM f2)
      SELECT f2.t, f2.n_risk, f2.d,
             list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
               (SELECT fs FROM arr)[1:
                 (SELECT CAST(count(*) AS INT) FROM f2 x
                  WHERE x.t <= f2.t)]),
               (s, x) -> s * x) AS survival
      FROM f2 ORDER BY f2.t""",


    "q194_trimmed_mean" -> """
      WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS v,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      rk AS (SELECT event_type, v,
                    row_number() OVER (PARTITION BY event_type
                      ORDER BY v) AS rnk,
                    count(*) OVER (PARTITION BY event_type) AS n
             FROM e),
      q AS (SELECT event_type,
                   max(CASE WHEN rnk = CAST(ceil(0.1 * n) AS BIGINT)
                            THEN v END) AS lo,
                   max(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT)
                            THEN v END) AS hi
            FROM rk GROUP BY 1)
      SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(e.cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               / 100.0 AS trimmed_mean
      FROM e JOIN q USING (event_type)
      WHERE e.v >= q.lo AND e.v <= q.hi
      GROUP BY 1 ORDER BY 1""",


    "q195_session_stats" -> """
      WITH s AS (SELECT user_id, epoch_us(ts) AS us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      g AS (SELECT user_id, us,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY us
                     ROWS UNBOUNDED PRECEDING) - 1 AS sid
            FROM s),
      p AS (SELECT user_id, sid, count(*) AS ne,
                   max(us) - min(us) AS dur
            FROM g GROUP BY 1, 2)
      SELECT CAST(ne AS BIGINT) AS events_per_session,
             CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(min(dur) AS BIGINT) AS min_dur_us,
             CAST(max(dur) AS BIGINT) AS max_dur_us,
             CAST(sum(dur) AS BIGINT) AS total_dur_us
      FROM p GROUP BY 1 ORDER BY 1""",


    "q197_mode" -> """
      WITH b AS (SELECT event_type,
                        CAST(floor(value / 50) * 50 AS BIGINT)
                          AS bucket,
                        count(*) AS n
                 FROM events GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY n DESC, bucket ASC) AS rn
            FROM b)
      SELECT event_type, bucket AS mode_bucket,
             CAST(n AS BIGINT) AS n_mode
      FROM r WHERE rn = 1 ORDER BY event_type""",


    "q198_cdf_at" -> """
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cdf_100,
             CAST(sum(CASE WHEN value <= 200 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cdf_200,
             CAST(sum(CASE WHEN value <= 300 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cdf_300
      FROM events GROUP BY 1 ORDER BY 1""",


    "q199_anomaly_days" -> """
      WITH daily AS (SELECT event_type,
                       CAST(date_trunc('day', ts) AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY 1, 2),
      wn AS (SELECT event_type, day, n,
               CAST(count(n) OVER tw AS BIGINT) AS k,
               CAST(sum(n) OVER tw AS BIGINT) AS sx,
               CAST(sum(n * n) OVER tw AS BIGINT) AS sxx
             FROM daily
             WINDOW tw AS (PARTITION BY event_type ORDER BY day
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                 AND INTERVAL 1 DAY PRECEDING)),
      v AS (SELECT event_type, day, n, k,
              CAST(sx AS DOUBLE) / CAST(k AS DOUBLE) AS mean,
              CAST(k * sxx - sx * sx AS DOUBLE) /
                CAST(k * (k - 1) AS DOUBLE) AS var
            FROM wn WHERE k >= 3)
      SELECT event_type, day, n,
             (CAST(n AS DOUBLE) - mean) / sqrt(var) AS z,
             abs((CAST(n AS DOUBLE) - mean) / sqrt(var)) > 2.0
               AS is_anomaly
      FROM v WHERE var > 0 ORDER BY event_type, day""",


    // full recompute from the raw log — hash equality proves the
    // three-delta incremental merge exact
    "q200_incremental_mv" -> """
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",


    "q201_attribution" -> """
      WITH p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
                 FROM events WHERE event_type = 'purchase'),
      v AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   epoch_us(ts) AS v_us
            FROM events WHERE event_type = 'view'),
      c AS (SELECT p.p_id, v.day,
                   count(*) OVER (PARTITION BY p.p_id) AS k
            FROM p JOIN v ON p.user_id = v.user_id
              AND v.v_us <= p.p_us
              AND v.v_us >= p.p_us - 3600000000),
      cr AS (SELECT day, 1.0 / CAST(k AS DOUBLE) AS credit FROM c)
      SELECT day, CAST(count(*) AS BIGINT) AS n_touches,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(credit ORDER BY credit)), (s, x) -> s + x)
               AS credit
      FROM cr GROUP BY day ORDER BY day""",


    "q202_pareto" -> """
      WITH pu AS (SELECT event_type, user_id,
                    CAST(sum(CAST(round(value * 100) AS BIGINT))
                         AS BIGINT) AS cents
                  FROM events GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY cents DESC, user_id ASC) AS rn,
              count(*) OVER (PARTITION BY event_type) AS nu
            FROM pu)
      SELECT event_type, CAST(max(nu) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN rn <= (nu + 9) // 10 THEN cents
                           ELSE 0 END) AS DOUBLE) /
               CAST(sum(cents) AS DOUBLE) AS top10_share
      FROM r GROUP BY event_type ORDER BY event_type""",


    "q203_dq_rules" -> """
      WITH u AS (
        SELECT 'orders.o_orderkey unique' AS rule,
               CAST((SELECT count(*) FROM (SELECT o_orderkey
                     FROM orders GROUP BY 1 HAVING count(*) > 1))
                    AS BIGINT) AS n_violations
        UNION ALL
        SELECT 'events.value not_null',
               CAST((SELECT count(*) FROM events WHERE value IS NULL)
                    AS BIGINT)
        UNION ALL
        SELECT 'orders.o_orderstatus accepted[O,F,P]',
               CAST((SELECT count(*) FROM orders
                     WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
                    AS BIGINT)
        UNION ALL
        SELECT 'events.value range[0,)',
               CAST((SELECT count(*) FROM events WHERE value < 0)
                    AS BIGINT))
      SELECT rule, n_violations, n_violations = 0 AS passed
      FROM u ORDER BY rule""",


    "q340_session_gap_sweep" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id
                 FROM events),
      g AS (SELECT CAST(m AS BIGINT) * 60000000 AS gap_us
            FROM (VALUES (5), (15), (30), (60)) AS v(m)),
      mk AS (SELECT e.user_id, g.gap_us, e.t, e.event_id,
                    CASE WHEN lag(e.t) OVER w IS NULL
                          OR e.t - lag(e.t) OVER w > g.gap_us
                    THEN 1 ELSE 0 END AS st
             FROM e CROSS JOIN g
             WINDOW w AS (PARTITION BY e.user_id, g.gap_us
               ORDER BY e.t, e.event_id)),
      sid AS (SELECT user_id, gap_us,
                     sum(st) OVER (PARTITION BY user_id, gap_us
                       ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
                       AS sid
              FROM mk),
      ses AS (SELECT gap_us, user_id, sid,
                     CAST(count(*) AS BIGINT) AS ev
              FROM sid GROUP BY 1, 2, 3)
      SELECT gap_us // 60000000 AS gap_minutes,
             CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(CASE WHEN ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons,
             CAST(max(ev) AS BIGINT) AS max_session_events
      FROM ses GROUP BY 1 ORDER BY 1""",


    "q341_funnel_window_sweep" -> """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
                 FROM events),
      ws AS (SELECT CAST(h * 3600000000 AS BIGINT) AS w_us
             FROM (VALUES (1), (6), (24)) AS v(h)),
      v1 AS (SELECT user_id, min(t) AS t1 FROM e
             WHERE event_type = 'view' GROUP BY 1),
      t2 AS (SELECT e.user_id, ws.w_us, min(e.t) AS t2
             FROM e JOIN v1 USING (user_id) CROSS JOIN ws
             WHERE e.event_type = 'click' AND e.t > v1.t1
               AND e.t <= v1.t1 + ws.w_us
             GROUP BY 1, 2),
      t3 AS (SELECT e.user_id, t2.w_us, min(e.t) AS t3
             FROM e JOIN t2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.t > t2.t2
               AND e.t <= t2.t2 + t2.w_us
             GROUP BY 1, 2),
      nv AS (SELECT CAST(count(*) AS BIGINT) AS n_view_users FROM v1),
      c2 AS (SELECT w_us, CAST(count(*) AS BIGINT) AS n_click_conv
             FROM t2 GROUP BY 1),
      c3 AS (SELECT w_us, CAST(count(*) AS BIGINT) AS n_purchase_conv
             FROM t3 GROUP BY 1)
      SELECT ws.w_us // 3600000000 AS w_hours, nv.n_view_users,
             coalesce(c2.n_click_conv, 0) AS n_click_conv,
             coalesce(c3.n_purchase_conv, 0) AS n_purchase_conv,
             round(coalesce(c3.n_purchase_conv, 0) * 1.0
               / nv.n_view_users, 6) AS purchase_rate
      FROM ws CROSS JOIN nv
      LEFT JOIN c2 USING (w_us) LEFT JOIN c3 USING (w_us)
      ORDER BY 1"""
  )
}
