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

/** Driver contract — see SURVEY.md §7 + BASELINE.md.
  *
  * Each `queries` entry is one operator/capability from SURVEY.md §2,
  * expressed through the JX engine (graft.jx) where the capability is part
  * of the JX language, or through the graft library operators (dedup,
  * similarity, text analysis) for the LLM-pipeline extensions. Every entry
  * has a DuckDB `oracleSql` twin on the same parquet tables unless the op
  * is not SQL-expressible (then the driver records a rows-only check).
  *
  * Floating-point policy: double-valued aggregates are rounded (4-6
  * digits) IN BOTH the Spark query and the oracle SQL, so hash-compare is
  * insensitive to summation order (Spark's partial aggregates and DuckDB
  * sum in different orders; the true FP error is ~1e-9 relative, far below
  * the rounding grain).
  */
object SparkEntry {

  /** JX-engine query helper: JSON in, DataFrame out. */
  private def jx(json: String): (SparkSession, String) => DataFrame =
    (spark, dir) => new Runner(spark, new Catalog(spark, dir)).run(json)

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    new Catalog(spark, dir).table(name)

  /** Round the named double columns for FP-stable oracle comparison. */
  private def rounded(cols: (String, Int)*)(
      fn: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame = { (spark, dir) =>
    val df = fn(spark, dir)
    val m = cols.toMap
    df.select(df.columns.map { c =>
      m.get(c) match {
        case Some(d) => round(col(c), d).as(c)
        case None    => col(c)
      }
    }.toIndexedSeq: _*)
  }

  /** Cast day-aligned timestamp columns to DATE (oracle-compare-stable). */
  private def dated(cols: String*)(fn: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame = { (spark, dir) =>
    val df = fn(spark, dir)
    val s = cols.toSet
    df.select(df.columns.map { c =>
      if (s.contains(c)) to_date(col(c)).as(c) else col(c)
    }.toIndexedSeq: _*)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 skeleton through the full JX pipeline (SURVEY.md §7 M1). */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_groupby_aggs")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * OUTPUT CONTRACT: no raw array/struct columns in a query's final
    * output — the driver's comparator sorts rows by every column and
    * cannot sort array cells. Explode (doc_id, j, value) or
    * array_to_string instead (q118 learned this the hard way). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- M1/M2: filter + groupby + aggregates (SURVEY.md §2b, §2d) ---
    "q01_groupby_aggs" -> rounded(
      "sum_qty" -> 4, "sum_base_price" -> 2, "sum_disc_price" -> 2,
      "avg_qty" -> 6, "avg_price" -> 6, "avg_disc" -> 6)(jx("""
      {"from": "lineitem",
       "where": {"lte": ["l_shipdate", {"date": "1998-09-02"}]},
       "groupby": ["l_returnflag", "l_linestatus"],
       "select": [
         {"name": "sum_qty", "value": "l_quantity", "aggregate": "sum"},
         {"name": "sum_base_price", "value": "l_extendedprice", "aggregate": "sum"},
         {"name": "sum_disc_price",
          "value": {"mult": ["l_extendedprice", {"sub": [1, "l_discount"]}]},
          "aggregate": "sum"},
         {"name": "avg_qty", "value": "l_quantity", "aggregate": "average"},
         {"name": "avg_price", "value": "l_extendedprice", "aggregate": "average"},
         {"name": "avg_disc", "value": "l_discount", "aggregate": "average"},
         {"name": "count_order", "aggregate": "count"}],
       "sort": ["l_returnflag", "l_linestatus"]}""")),

    // --- M1: filter + computed select + sort + limit (SURVEY.md §2b,2g,2i) ---
    "q02_filter_select_sort" -> rounded("revenue" -> 4)(jx("""
      {"from": "lineitem",
       "where": {"and": [
         {"gte": ["l_shipdate", {"date": "1996-01-01"}]},
         {"lt":  ["l_shipdate", {"date": "1996-07-01"}]},
         {"gt":  ["l_discount", 0.05]}]},
       "select": [
         "l_orderkey", "l_linenumber",
         {"name": "revenue",
          "value": {"mult": ["l_extendedprice", {"sub": [1, "l_discount"]}]}}],
       "sort": [{"value": {"mult": ["l_extendedprice", {"sub": [1, "l_discount"]}]}, "sort": -1},
                "l_orderkey", "l_linenumber"],
       "limit": 100}""")),

    // --- M3: edges with SetDomain — dense cube incl. empty partition ---
    "q03_edges_set_dense" -> rounded("sum_price" -> 2)(jx("""
      {"from": "orders",
       "edges": [{"name": "status", "value": "o_orderstatus",
                  "domain": {"type": "set",
                             "partitions": ["O", "F", "P", "X"]}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "sum_price", "value": "o_totalprice",
                   "aggregate": "sum"}]}""")),

    // --- M3: edges with TimeDomain — dense weekly buckets ---
    "q04_edges_time" -> rounded("sum_price" -> 2)(dated("week")(jx("""
      {"from": "orders",
       "edges": [{"name": "week", "value": "o_orderdate",
                  "domain": {"type": "time", "min": "1996-01-01",
                             "max": "1996-04-01", "interval": "week"}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "sum_price", "value": "o_totalprice",
                   "aggregate": "sum"}]}"""))),

    // --- M3: edges with RangeDomain — dense numeric buckets ---
    "q05_edges_range" -> rounded("avg_price" -> 6)(jx("""
      {"from": "lineitem",
       "edges": [{"name": "qty_bucket", "value": "l_quantity",
                  "domain": {"type": "range", "min": 0, "max": 60,
                             "interval": 10}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "avg_price", "value": "l_extendedprice",
                   "aggregate": "average"}]}""")),

    // --- M3: edges with DefaultDomain — data-driven top-k partitions ---
    "q06_edges_topk" -> rounded("sum_retail" -> 2)(jx("""
      {"from": "part",
       "edges": [{"name": "brand", "value": "p_brand",
                  "domain": {"type": "default", "limit": 5}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "sum_retail", "value": "p_retailprice",
                   "aggregate": "sum"}]}""")),

    // --- M3: predicate-partition edge (bucket by arbitrary where) ---
    "q07_edges_predicate" -> rounded("avg_bal" -> 6)(jx("""
      {"from": "customer",
       "edges": [{"name": "tier",
                  "domain": {"type": "set", "partitions": [
                    {"name": "negative", "where": {"lt": ["c_acctbal", 0]}},
                    {"name": "low",  "where": {"and": [{"gte": ["c_acctbal", 0]},
                                                       {"lt": ["c_acctbal", 5000]}]}},
                    {"name": "high", "where": {"gte": ["c_acctbal", 5000]}}]}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "avg_bal", "value": "c_acctbal",
                   "aggregate": "average"}]}""")),

    // --- M4: window clause — running sum, lag, rownum (SURVEY.md §2f) ---
    "q08_window" -> rounded("running_qty" -> 4)(jx("""
      {"from": "lineitem",
       "where": {"and": [{"gte": ["l_shipdate", {"date": "1996-01-01"}]},
                         {"lt":  ["l_shipdate", {"date": "1996-02-01"}]}]},
       "select": ["l_suppkey", "l_orderkey", "l_linenumber",
                  "running_qty", "prev_qty", "rn"],
       "window": [
         {"name": "running_qty", "value": "l_quantity", "aggregate": "sum",
          "edges": ["l_suppkey"],
          "sort": ["l_shipdate", "l_orderkey", "l_linenumber"],
          "range": {"max": 0}},
         {"name": "prev_qty", "value": {"rows": ["l_quantity", -1]},
          "edges": ["l_suppkey"],
          "sort": ["l_shipdate", "l_orderkey", "l_linenumber"]},
         {"name": "rn", "value": {"rownum": []},
          "edges": ["l_suppkey"],
          "sort": ["l_shipdate", "l_orderkey", "l_linenumber"]}],
       "sort": ["l_suppkey", "rn"]}""")),

    // --- M2: global aggregates incl. exact median/percentile/cardinality ---
    "q09_global_aggs" -> rounded(
      "sum_qty" -> 4, "med_qty" -> 6, "p90_qty" -> 6, "std_qty" -> 6)(jx("""
      {"from": "lineitem",
       "select": [
         {"name": "n", "aggregate": "count"},
         {"name": "sum_qty", "value": "l_quantity", "aggregate": "sum"},
         {"name": "min_ship", "value": "l_shipdate", "aggregate": "minimum"},
         {"name": "max_ship", "value": "l_shipdate", "aggregate": "maximum"},
         {"name": "med_qty", "value": "l_quantity", "aggregate": "median"},
         {"name": "p90_qty", "value": "l_quantity", "aggregate": "percentile",
          "percentile": 0.9},
         {"name": "n_parts", "value": "l_partkey", "aggregate": "cardinality"},
         {"name": "std_qty", "value": "l_quantity", "aggregate": "std"}]}""")),

    // --- M1: string expression ops (SURVEY.md §2i strings) ---
    "q10_string_exprs" -> jx("""
      {"from": "part",
       "select": [
         "p_partkey",
         {"name": "name_l5", "value": {"left": ["p_name", 5]}},
         {"name": "name_r4", "value": {"right": ["p_name", 4]}},
         {"name": "name_tail", "value": {"not_left": ["p_name", 6]}},
         {"name": "pos_ol", "value": {"find": ["p_name", {"literal": "ol"}]}},
         {"name": "brand_type",
          "value": {"concat": ["p_brand", "p_type"], "separator": " / "}},
         {"name": "is_economy", "value": {"prefix": {"p_type": "ECONOMY"}}},
         {"name": "has_red", "value": {"regex": ["p_name", ".*red.*"]}},
         {"name": "n_words",
          "value": {"length": {"concat": ["p_name"], "separator": ""}}}],
       "sort": ["p_partkey"]}"""),

    // --- M1: JX null/missing semantics (SURVEY.md §7 hard parts) ---
    "q11_null_semantics" -> jx("""
      {"from": "customer",
       "select": [
         "c_custkey",
         {"name": "maybe_name",
          "value": {"when": {"lt": ["c_acctbal", 0]},
                    "then": {"literal": ""}, "else": "c_name"}},
         {"name": "is_missing",
          "value": {"missing": {"when": {"lt": ["c_acctbal", 0]},
                                "then": {"literal": ""}, "else": "c_name"}}},
         {"name": "fallback",
          "value": {"coalesce": [
            {"when": {"lt": ["c_acctbal", 0]},
             "then": {"literal": ""}, "else": "c_name"},
            {"literal": "NONE"}]}},
         {"name": "add_ignores_missing",
          "value": {"add": ["c_acctbal", "no.such.column"]}},
         {"name": "all_missing_default",
          "value": {"add": ["no.such.a", "no.such.b"], "default": 0}},
         {"name": "eq_null_safe",
          "value": {"eq": ["no.such.a", "no.such.b"]}}],
       "sort": ["c_custkey"]}"""),

    // --- M1: time expressions — unix/from_unix/floor-to-day + groupby ---
    "q12_time_exprs" -> dated("day")(jx("""
      {"from": "events",
       "where": {"and": [{"gte": ["ts", {"date": "2024-01-05"}]},
                         {"lt":  ["ts", {"date": "2024-01-20"}]}]},
       "groupby": [{"name": "day",
                    "value": {"from_unix": {"mult": [
                      {"floor": {"div": [{"unix": "ts"}, 86400]}}, 86400]}}}],
       "select": [{"name": "n", "aggregate": "count"}],
       "sort": ["day"]}""")),

    // --- M2: collection aggregates — union (set) over groups ---
    // The union agg result (sorted array) is serialized to a CSV string for
    // the driver compare, which hashes scalar cells only; ArraySpec covers
    // the raw array form.
    "q13_collect_aggs" -> { (spark, dir) =>
      val df = jx("""
        {"from": "lineitem",
         "groupby": ["l_returnflag"],
         "select": [
           {"name": "statuses", "value": "l_linestatus", "aggregate": "union"},
           {"name": "n_status", "value": "l_linestatus",
            "aggregate": "cardinality"},
           {"name": "one_flag", "value": "l_returnflag", "aggregate": "one"}],
         "sort": ["l_returnflag"]}""")(spark, dir)
      df.withColumn("statuses", array_join(col("statuses"), ","))
    },

    // --- M5 J1: enrichment broadcast joins, customer->nation->region ---
    "q14_join_enrich" -> rounded("sum_bal" -> 2)({ (spark, dir) =>
      val customer = tbl(spark, dir, "customer")
      val nation = tbl(spark, dir, "nation")
      val region = tbl(spark, dir, "region")
      Joins.enrich(
          Joins.enrich(customer, nation,
            customer("c_nationkey") === nation("n_nationkey")),
          region, col("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"), sum("c_acctbal").as("sum_bal"))
        .orderBy(col("r_name"))
    }),

    // --- M5: left-semi join (EXISTS) ---
    "q15_semi_join" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val li = tbl(spark, dir, "lineitem")
      Joins.semi(orders, li.filter(col("l_discount") > 0.08),
          orders("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    // --- M5: left-anti join (NOT EXISTS) ---
    "q16_anti_join" -> { (spark, dir) =>
      val customer = tbl(spark, dir, "customer")
      val orders = tbl(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf(
          "2001-01-01 00:00:00")))
      val nation = tbl(spark, dir, "nation")
      val inactive = Joins.anti(customer, orders,
        customer("c_custkey") === orders("o_custkey"))
      Joins.enrich(inactive, nation,
          inactive("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_inactive"))
        .orderBy(col("n_name"))
    },

    // --- M5 J3: concat heterogeneous sources (unionByName) ---
    "q17_union_concat" -> rounded("sum_bal" -> 2)({ (spark, dir) =>
      val customer = tbl(spark, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_acctbal").as("acctbal"),
                col("c_mktsegment").as("segment"),
                lit("customer").as("kind"))
      val supplier = tbl(spark, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_acctbal").as("acctbal"),
                lit("supplier").as("kind"))
      SetOps.concat(Seq(customer, supplier))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), sum("acctbal").as("sum_bal"),
             count(col("segment")).as("n_with_segment"))
        .orderBy(col("kind"))
    }),

    // --- M5 J4: nested reassembly (un-explode): order + lineitem array ---
    "q18_nested_reassembly" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val li = tbl(spark, dir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      // quantities rendered as a CSV of ints (integer-valued in the data):
      // the driver compare hashes scalar cells, not arrays
      Joins.reassemble(orders, li, "o_orderkey",
          "lines", Seq(col("l_linenumber"), col("l_quantity")))
        .select(col("o_orderkey"),
                when(col("lines").isNull, lit(0))
                  .otherwise(size(col("lines"))).as("n_lines"),
                when(col("lines").isNull, lit(null))
                  .otherwise(array_join(transform(col("lines"),
                    x => x.getField("l_quantity").cast("int").cast("string")),
                    ",")).as("quantities"))
        .orderBy(col("o_orderkey"))
    },

    // --- M7/2l: tumbling-window 2-D dense cube over the event stream ---
    "q19_events_cube" -> rounded("sum_value" -> 4)(dated("day")(jx("""
      {"from": "events",
       "edges": [
         {"name": "day", "value": "ts",
          "domain": {"type": "time", "min": "2024-01-01",
                     "max": "2024-01-08", "interval": "day"}},
         {"name": "etype", "value": "event_type",
          "domain": {"type": "set",
                     "partitions": ["click", "view", "purchase", "signup",
                                    "error"]}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "sum_value", "value": "value",
                   "aggregate": "sum"}]}"""))),

    // --- M7: gap-based sessionization (batch form) ---
    "q20_sessionize" -> { (spark, dir) =>
      val events = tbl(spark, dir, "events")
      Sessionize.withSessionIds(events, col("user_id"), col("ts"), 1800L)
        .groupBy(col("user_id"))
        .agg((max(col("session_id")) + 1).as("n_sessions"),
             count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // --- M7/2l: exact dedup by deterministic id (at-least-once replay) ---
    "q21_dedup_ids" -> { (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val deduped = events.dropDuplicates("user_id", "event_type")
      deduped.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_user_types"))
        .orderBy(col("event_type"))
    },

    // --- M8: text quality scoring over documents ---
    "q22_text_quality" -> rounded(
      "punct_ratio" -> 6, "stopword_ratio" -> 6, "mean_word_len" -> 6)({
      (spark, dir) =>
        val docs = tbl(spark, dir, "documents")
        // single-pass native TextStats kernel for the scan signals;
        // stopword ratio needs token membership, stays column math
        TextAnalysis.withTextStats(docs, col("text"))
          .withColumn("stopword_ratio",
            TextAnalysis.stopwordRatio(col("text")))
          .select("doc_id", "n_chars", "n_tokens", "punct_ratio",
                  "stopword_ratio", "mean_word_len")
          .orderBy(col("doc_id"))
    }),

    // --- M8: token counting (whitespace + BPE-ish subword estimate) ---
    "q23_token_counts" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      docs.groupBy(col("lang"))
        .agg(sum(TextAnalysis.tokenCount(col("text"))).as("ws_tokens"),
             sum(TextAnalysis.bpeishTokenCount(col("text")))
               .as("bpeish_tokens"))
        .orderBy(col("lang"))
    },

    // --- M8: language ID (n-gram/stopword heuristic; label-free) ---
    "q24_lang_id" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      TextAnalysis.withLangId(docs, col("text"), "lang_pred")
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))
    },

    // --- M8: exact dedup after a simulated double-ingest ---
    "q25_dedup_exact" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val reingested = SetOps.concat(Seq(
        docs,
        docs.withColumn("doc_id", col("doc_id") + 1000000L)))
      Dedup.exactByKey(reingested, Seq(col("text")), col("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    },

    // --- M8: MinHash+LSH near-dup RECALL vs the exact inverted-index
    //     pairs (q43's operator, same df cap). The LSH pair list itself
    //     is not SQL-expressible, but the comparison against the exact
    //     pair set is deterministic (fixed hash seeds), so the oracle
    //     checks the exact-pair count exactly and the recall floor as a
    //     boolean. Measured recall: 0.988 (sf0.01) / 0.984 (sf0.1) —
    //     floor 0.9 has margin while still catching a silently broken
    //     signature/banding path (which would land near 0). ---
    "q26_dedup_minhash" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      // near-dup variant: drop the tail (plain codegen'd substring —
      // no interpreted token lambdas in the corpus construction)
      val truncated = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(truncated)
      // both dedup signals share ONE staged shingle-hash scan — the
      // LSH path and its exact twin otherwise each re-hash the corpus
      val staged = corpus.select(col("doc_id").as("id"),
          TextAnalysis.shingleHashes(col("text"), 3).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val found = Dedup.minhashPairsFromShingles(staged,
          numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val exact = Dedup.ngramJaccardPairsFromShingles(
          staged.select(col("id"), col("sh").as("s")),
          threshold = 0.5, maxDf = 16)
        .select(col("id_a"), col("id_b"))
      val hits = found.join(exact, Seq("id_a", "id_b"))
      exact.agg(count(lit(1)).as("pairs_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("__hits")))
        .select(col("pairs_exact"),
          (col("__hits") >= col("pairs_exact") * 0.9).as("recall_floor_met"))
    },

    // --- M8: SimHash near-dup fingerprints + hamming distance, on the
    //     PORTABLE md5-hash variant so DuckDB can recompute the bit
    //     votes digit-by-digit from the md5 hex (the native xxhash
    //     kernel has the same bit-majority semantics; spec-covered) ---
    "q27_dedup_simhash" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val variant = array_join(slice(TextAnalysis.tokens(col("text")), lit(1),
        greatest(TextAnalysis.tokenCount(col("text")) - 5, lit(1))), " ")
      docs.select(
          col("doc_id"),
          Dedup.hamming64(Dedup.simhash64Portable(col("text")),
              Dedup.simhash64Portable(variant)).cast(LongType)
            .as("hamming_to_truncated"))
        .orderBy(col("doc_id"))
    },

    // --- M8: exact ANN baseline — brute-force cosine top-k ---
    "q28_ann_cosine" -> { (spark, dir) =>
      val emb = tbl(spark, dir, "embeddings")
      Similarity.bruteForceTopK(
          emb, col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") < 8), col("vec_id"), col("embedding"),
          k = 5)
        .orderBy(col("query_id"), col("rank"))
    },

    // --- M8: multi-table LSH ANN recall vs exact brute-force top-k
    //     (q28's operator). Deterministic given the fixed hyperplane
    //     seeds; the oracle checks the exact top-k count exactly and
    //     the recall floor as a boolean. Measured recall at
    //     planes=4/tables=16: 0.825 (sf0.01) / 0.975 (sf0.1); floor
    //     0.6 has margin but catches a broken bucket/candidate path
    //     (single-table LSH measured 0.05 — silently broken, hence
    //     the multi-table rewrite). ---
    "q29_ann_lsh" -> { (spark, dir) =>
      val emb = tbl(spark, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(
          emb, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"), k = 5)
        .select(col("query_id"), col("vec_id"))
      val approx = Similarity.lshTopK(
          emb, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"),
          k = 5, planes = 4, tables = 16)
        .select(col("query_id"), col("vec_id"))
      val hits = approx.join(exact, Seq("query_id", "vec_id"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("__hits")))
        .select(col("n_exact"),
          (col("__hits") >= col("n_exact") * 0.6).as("recall_floor_met"))
    },

    // --- M8: document fingerprinting + multimodal binary plumbing.
    //     Output keeps to the DETERMINISTIC portable columns (md5
    //     checksum/fingerprint, byte length, decode ok) so the whole
    //     row is oracle-checkable; the stub decode's fake width/height
    //     stay out of the compare (native xxhash fingerprint and stub
    //     decode are spec-covered) ---
    "q30_fingerprint_media" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val payload = encode(col("text"), "UTF-8") // opaque binary payload
      Multimodal.mediaPipeline(
          docs.select(col("doc_id"), col("text")), payload,
          lit("text/plain"))
        .select(col("doc_id"),
                TextAnalysis.fingerprintPortable(col("text"))
                  .as("fingerprint"),
                md5(payload).as("checksum_md5"),
                col("media_meta.n_bytes").as("n_bytes"),
                col("decoded.ok").as("decode_ok"))
        .orderBy(col("doc_id"))
    },

    // --- M7: Structured Streaming tumbling agg (batch/stream parity:
    //     the oracle is the equivalent BATCH SQL over the same data) ---
    "q31_stream_tumbling" -> rounded("sum_value" -> 4)(dated("day")({
      (spark, dir) =>
        val ev = EventStream.readTable(spark, dir, "events")
        val agg = EventStream.tumblingAgg(ev, "ts", "1 day", "1 day",
          "event_type")
        EventStream.runToCompletion(spark, agg)
          .select(col("window.start").as("day"), col("event_type"),
                  col("n"), col("sum_value"))
          .orderBy(col("day"), col("event_type"))
    })),

    // --- M6 T3/T4: structured-log-line parse (roundtrip through a raw
    //     text form, with malformed noise lines quarantined out) ---
    "q32_etl_parse" -> rounded("sum_value" -> 4)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val good = events.select(concat_ws("|", lit("EVT"), col("event_id"),
        col("event_type"), col("value")).as("line"))
      val noise = events.filter(col("event_id") % 10 === 0)
        .select(concat(lit("GARBAGE "), col("event_id")).as("line"))
      val lines = SetOps.concat(Seq(good, noise))
      LogParse.parseDelimited(lines, col("line"), "EVT",
          Seq(("event_id", LongType), ("event_type", StringType),
              ("value", DoubleType)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // --- M6 T7: etl lineage chain (two stages, flattened out) ---
    "q33_etl_lineage" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val withHead = Lineage.withEtl(docs, col("doc_id"), "raw-docs",
        col("source"), "extract", t0, "rev1")
      val staged = withHead.withColumn("etl",
        Lineage.etlStage(col("doc_id") + 1000000L, col("etl"), "join", t0,
          "rev1"))
      staged.select(col("doc_id"),
          col("etl.id").as("etl_id"),
          col("etl.type").as("etl_type"),
          col("etl.source.id").as("parent_id"),
          col("etl.source.source.bucket").as("root_bucket"),
          col("etl.source.source.key").as("root_key"),
          col("etl.timestamp").as("etl_ts"),
          col("etl.revision").as("etl_rev"))
        .orderBy(col("doc_id"))
    },

    // --- meta.columns: schema-as-a-table introspection ---
    "q34_meta_columns" -> { (spark, dir) =>
      MetaColumns.table(spark, new Catalog(spark, dir))
        .orderBy(col("table_name"), col("column_name"))
    },

    // --- M1: remaining scalar op families — in/case/mod/exp/floor-digits/
    //     abs/split+get/tuple (SURVEY.md §2i) ---
    "q36_exprs_misc" -> rounded("power_kprice" -> 6)(jx("""
      {"from": "orders",
       "select": [
         "o_orderkey",
         {"name": "is_active", "value": {"in": {"o_orderstatus": ["O", "P"]}}},
         {"name": "prio_class",
          "value": {"case": [
            {"when": {"prefix": {"o_orderpriority": "1"}}, "then": {"literal": "urgent"}},
            {"when": {"prefix": {"o_orderpriority": "2"}}, "then": {"literal": "high"}},
            {"literal": "normal"}]}},
         {"name": "key_mod7", "value": {"mod": ["o_orderkey", 7]}},
         {"name": "power_kprice",
          "value": {"exp": [{"div": ["o_totalprice", 1000]}, 2]}},
         {"name": "price_floor2", "value": {"floor": ["o_totalprice", 2]}},
         {"name": "abs_centered",
          "value": {"abs": {"sub": ["o_totalprice", 150000]}}},
         {"name": "prio_word",
          "value": {"get": [{"split": ["o_orderpriority", "-"]}, 2]}},
         {"name": "between_num",
          "value": {"between": ["o_totalprice", 50000, 150000]}}],
       "sort": ["o_orderkey"]}""")),

    // --- M7/2l: sliding event-time windows (batch form, dense) ---
    "q37_events_sliding" -> rounded("sum_value" -> 4)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      events
        .filter(col("ts") >= lit(java.sql.Timestamp.valueOf(
          "2024-01-01 00:00:00")) &&
          col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-04 00:00:00")))
        .groupBy(window(col("ts"), "12 hours", "6 hours"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("window.start").as("win_start"), col("n"),
                col("sum_value"))
        .filter(col("win_start") >= lit(java.sql.Timestamp.valueOf(
          "2024-01-01 00:00:00")))
        .orderBy(col("win_start"))
    }),

    // --- M3: calendar-month TimeDomain (Duration is calendar-aware) ---
    "q38_edges_month" -> rounded("sum_price" -> 2)(jx("""
      {"from": "orders",
       "edges": [{"name": "month", "value": "o_orderdate",
                  "domain": {"type": "time", "min": "1996-01-01",
                             "max": "1997-01-01", "interval": "month"}}],
       "select": [{"name": "n", "aggregate": "count"},
                  {"name": "sum_price", "value": "o_totalprice",
                   "aggregate": "sum"}]}""")),

    // --- M1: subquery from — `from: {query}` composes pipelines ---
    "q39_subquery_from" -> rounded("avg_rev" -> 4)(jx("""
      {"from": {"from": "lineitem",
                "where": {"gte": ["l_shipdate", {"date": "1997-01-01"}]},
                "groupby": ["l_orderkey"],
                "select": [{"name": "order_rev",
                            "value": {"mult": ["l_extendedprice",
                                               {"sub": [1, "l_discount"]}]},
                            "aggregate": "sum"},
                           {"name": "n_lines", "aggregate": "count"}]},
       "groupby": ["n_lines"],
       "select": [{"name": "n_orders", "aggregate": "count"},
                  {"name": "avg_rev", "value": "order_rev",
                   "aggregate": "average"}],
       "sort": ["n_lines"]}""")),

    // --- M4+M2: first/last window aggregates + exists aggregate,
    //     composed through a subquery (SURVEY.md §2d, §2f) ---
    "q40_first_last_exists" -> jx("""
      {"from": {"from": "lineitem",
                "where": {"and": [{"gte": ["l_shipdate", {"date": "1997-01-01"}]},
                                  {"lt":  ["l_shipdate", {"date": "1997-02-01"}]}]},
                "select": ["l_suppkey", "first_qty", "last_qty",
                           {"name": "hd",
                            "value": {"when": {"gt": ["l_discount", 0.08]},
                                      "then": 1}}],
                "window": [
                  {"name": "first_qty", "value": "l_quantity",
                   "aggregate": "first", "edges": ["l_suppkey"],
                   "sort": ["l_shipdate", "l_orderkey", "l_linenumber"]},
                  {"name": "last_qty", "value": "l_quantity",
                   "aggregate": "last", "edges": ["l_suppkey"],
                   "sort": ["l_shipdate", "l_orderkey", "l_linenumber"]}]},
       "groupby": ["l_suppkey"],
       "select": [
         {"name": "first_qty", "value": "first_qty", "aggregate": "one"},
         {"name": "last_qty", "value": "last_qty", "aggregate": "one"},
         {"name": "any_high_disc", "value": "hd", "aggregate": "exists"}],
       "sort": ["l_suppkey"]}"""),

    // --- M5: as-of (point-in-time) join — last signup before each
    //     purchase, per user; oracle is DuckDB's native ASOF JOIN ---
    "q41_asof_join" -> { (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val signups = events.filter(col("event_type") === "signup")
        .select("user_id", "ts", "event_id")
      Joins.asOf(purchases, signups, "user_id",
          col("ts"), col("ts"), Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("asof_event_id"))
        .orderBy(col("event_id"))
    },

    // --- M5: range join — event values against arbitrary bands ---
    "q42_range_join" -> rounded("sum_value" -> 4)({ (spark, dir) =>
      import spark.implicits._
      val events = tbl(spark, dir, "events")
      val bands = Seq(
        ("tiny", 0.0, 50.0), ("small", 50.0, 100.0),
        ("mid", 100.0, 200.0), ("large", 200.0, 500.0),
        ("huge", 500.0, 2000.0))
        .toDF("band", "lo", "hi")
      Joins.rangeJoin(events, col("value"), bands,
          col("lo"), col("hi"), bucketWidth = 100.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .orderBy(col("band"))
    }),

    // --- S1/2j: JSON-lines payload decode (from_json with schema) ---
    "q35_json_decode" -> { (spark, dir) =>
      val events = tbl(spark, dir, "events")
      events.select(col("event_type"),
          from_json(col("props"), new StructType().add("k", IntegerType))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    },

    // --- M8: exact n-gram Jaccard near-dup pairs via inverted index
    //     (the exact counterpart of q26's MinHash+LSH approximation) ---
    "q43_dedup_ngram" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val truncated = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(truncated)
      // maxDf=16 (mirrored in the oracle): lossless at sf0.01 (max df
      // there is 14) and prunes the template-heavy hot shingles at
      // larger sf, where the uncapped self-join was 52% of the bench
      Dedup.ngramJaccardPairs(corpus, col("doc_id"), col("text"),
          shingleN = 3, threshold = 0.5, maxDf = 16)
        .orderBy(col("id_a"), col("id_b"))
    },

    // --- M8: embedding-cosine near-dup pairs, exact all-pairs baseline
    //     (corpus = embeddings + deterministic one-component-bumped
    //     variants; natural pairs top out at cosine ~0.51, variants sit
    //     at 0.87-0.92, so 0.8 selects exactly the near-dups) ---
    "q44_dedup_embedding" -> { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val variant = e.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), (x, i) =>
          x + when(i.cast("long") === pmod(col("vec_id"), size(col("v"))),
            lit(0.5)).otherwise(lit(0.0))).as("v"))
      Dedup.bruteForceEmbeddingPairs(e.unionByName(variant),
          col("vec_id"), col("v"), threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },

    // --- M8: IVF similarity search; probing ALL cells makes it exact, so
    //     the brute-force oracle checks the IVF plumbing end-to-end (the
    //     scale path drops nprobe << nlist and turns cell assignment into
    //     a partition column) ---
    "q45_ann_ivf" -> { (spark, dir) =>
      val emb = tbl(spark, dir, "embeddings")
      Similarity.ivfTopK(
          emb, col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") < 8), col("vec_id"), col("embedding"),
          k = 5, nlist = 16, nprobe = 16)
        .orderBy(col("query_id"), col("rank"))
    },

    // --- M7/2l: native session_window (batch form of the streaming
    //     session operator; one row per gap-bounded session) ---
    "q46_session_window" -> { (spark, dir) =>
      // NTZ-proof: session_window/unix_micros need TimestampType (the
      // cast is value-preserving under the UTC session tz)
      val events = EventStream.normalizeEventTime(tbl(spark, dir, "events"))
      events
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
                 col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
        .select(col("user_id"),
                unix_micros(col("sw.start")).as("session_start_us"),
                col("n_ev"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // --- §2d breadth: grouping-set subtotals (rollup) — not a JX clause
    //     (JX's cube is the edges model); Spark-native for oracle parity ---
    "q47_rollup" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      // subtotal rows are tagged via grouping(), not NULL-coalescing,
      // so genuine NULL group values can never masquerade as subtotals
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             round(sum(col("l_quantity")), 4).as("sum_qty"),
             grouping(col("l_returnflag")).as("__g1"),
             grouping(col("l_linestatus")).as("__g2"))
        .select(when(col("__g1") === 1, lit("ALL"))
                  .otherwise(col("l_returnflag")).as("rflag"),
                when(col("__g2") === 1, lit("ALL"))
                  .otherwise(col("l_linestatus")).as("lstatus"),
                col("n"), col("sum_qty"))
        .orderBy(col("rflag"), col("lstatus"))
    },

    // --- cube/table result shaping: pivot (2-D dense table, the format
    //     half of the edges model as a first-class relational op) ---
    "q48_pivot" -> { (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = events.withColumn("day", to_date(col("ts")))
        .groupBy(col("day")).pivot("event_type", types).agg(count(lit(1)))
      p.select(col("day") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("day"))
    },

    // --- §2k T3: mozlog typed-ADT transform end-to-end. Structured
    //     log lines are GENERATED from the events table (one test per
    //     user, one subtest per event, deterministic status mapping,
    //     plus non-JSON noise), parsed by the typed flatMap, and
    //     assembled into per-test docs with the status-priority
    //     rollup; the oracle re-derives the same docs from events
    //     directly ---
    "q49_mozlog_tests" -> { (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val statusOf = when(col("event_type") === "error", "FAIL")
        .when(col("event_type") === "purchase", "TIMEOUT")
        .otherwise("PASS")
      val statusLines = events.select(to_json(struct(
        lit("test_status").as("action"),
        col("event_id").as("time"),
        concat(lit("test_"), col("user_id")).as("test"),
        concat(lit("sub_"), col("event_id")).as("subtest"),
        statusOf.as("status"),
        lit("PASS").as("expected"))).as("line"))
      val endLines = events.groupBy(col("user_id"))
        .agg(max(col("event_id")).as("m"))
        .select(to_json(struct(
          lit("test_end").as("action"),
          (col("m") + 1).as("time"),
          concat(lit("test_"), col("user_id")).as("test"),
          lit("OK").as("status"),
          lit("OK").as("expected"))).as("line"))
      val noise = events.filter(col("event_id") % 7 === 0)
        .select(concat(lit("not json "), col("event_id")).as("line"))
      val lines = SetOps.concat(Seq(statusLines, endLines, noise))
      MozLog.testDocs(MozLog.parse(lines, col("line")))
        .orderBy(col("test"))
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

    // --- §2l: watermarked streaming dedup end-to-end. The events table
    //     is streamed TWICE (an at-least-once replay), dedupByKey
    //     suppresses the duplicates with watermark-bounded state, and
    //     the batch-parity oracle is the plain single-copy aggregate ---
    "q51_stream_dedup" -> rounded("sum_value" -> 4)({ (spark, dir) =>
      val replayed = EventStream.readTable(spark, dir, "events")
        .unionByName(EventStream.readTable(spark, dir, "events"))
      val deduped = EventStream.dedupByKey(replayed, "ts", "1 day",
        "event_id")
      EventStream.runToCompletion(spark, deduped, mode = "append")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // --- §2j JSON scrub: dirty JSON-lines ingest (bare NaN values,
    //     fully broken lines) through the lenient decoder; dirt lands
    //     as nulls / an all-null quarantine group, never an error ---
    "q52_json_scrub" -> rounded("sum_v" -> 4)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val json = to_json(struct(col("event_id").as("id"),
        col("event_type").as("t"), col("value").as("v")))
      val dirty = when(col("event_id") % 17 === 0, lit("{broken"))
        .when(col("event_id") % 10 === 0,
          regexp_replace(json, "\"v\":[-0-9.Ee+]+", "\"v\":NaN"))
        .otherwise(json)
      val parsed = LogParse.parseJsonLenient(
        events.select(dirty.as("line")), col("line"),
        new StructType().add("id", LongType).add("t", StringType)
          .add("v", DoubleType))
      parsed.groupBy(col("t"))
        .agg(count(lit(1)).as("n_rows"), count(col("id")).as("n_id"),
          count(col("v")).as("n_v"), sum(col("v")).as("sum_v"))
        .orderBy(col("t"))
    }),

    // --- M8: embedding near-dup pairs on the LSH scale path, recall
    //     vs the exact all-pairs baseline (q44's operator) on the same
    //     corpus. Deterministic fixed-seed hyperplanes; oracle checks
    //     the exact-pair count and the recall floor. ---
    "q53_dedup_embedding_lsh" -> { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
        .filter(col("vec_id") < 1000)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val variant = e.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), (x, i) =>
          x + when(i.cast("long") === pmod(col("vec_id"), size(col("v"))),
            lit(0.5)).otherwise(lit(0.0))).as("v"))
      val corpus = e.unionByName(variant)
      val found = Dedup.embeddingPairs(corpus, col("vec_id"), col("v"),
          planes = 4, tables = 8, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      val exact = Dedup.bruteForceEmbeddingPairs(corpus, col("vec_id"),
          col("v"), threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      val hits = found.join(exact, Seq("id_a", "id_b"))
      exact.agg(count(lit(1)).as("pairs_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("__hits")))
        .select(col("pairs_exact"),
          (col("__hits") >= col("pairs_exact") * 0.9).as("recall_floor_met"))
    },

    // --- S2 + T8: partitioned block sink + backfill read-back. The
    //     events are written as (event_type, day)-partitioned parquet
    //     blocks to a fresh dir and re-read; the oracle aggregates the
    //     source directly, so the write->read roundtrip must be
    //     lossless (incl. the partition-column date typing) ---
    "q54_sink_blocks" -> rounded("sum_value" -> 4)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val out = Scratch.dir("graft_q54")
        .toString
      // repartition on the block key before the partitioned write: one
      // file per block instead of (tasks × blocks) small files — the
      // small-files guard every partitioned 100 TB sink needs
      graft.sources.Sinks.writeBlocks(
        events.withColumn("day", to_date(col("ts")))
          .repartition(col("event_type"), col("day")), out,
        Seq("event_type", "day"))
      spark.read.parquet(out)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"),
             countDistinct(col("day")).as("n_days"))
        .orderBy(col("event_type"))
    }),

    // --- S6: time-rolled sink with retention — rows older than the
    //     cutoff never reach the partition dirs (epoch-ms "now" so the
    //     cutoff is TZ-independent: 2024-01-31T00:00Z - 10 days) ---
    "q55_sink_rollover" -> rounded("sum_value" -> 4)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val out = Scratch.dir("graft_q55")
        .toString
      graft.sources.Sinks.writeRollover(events, out, col("ts"),
        retainDays = 10, now = new java.sql.Timestamp(1706659200000L))
      spark.read.parquet(out)
        .groupBy(col("__date"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .orderBy(col("__date"))
    }),

    // --- P2/2i: tuple -> nested struct, then leaves projection
    //     flattens it back with dotted->underscore names ---
    "q56_select_leaves" -> jx("""
      {"from": {"from": "events",
                "select": ["event_id",
                           {"name": "kv",
                            "value": {"tuple": ["event_type", "value"]}}]},
       "select": {"leaves": "."},
       "sort": ["event_id"],
       "limit": 100}"""),

    // --- 2j typed-JSON + S5: encode to type-suffixed JSON lines,
    //     write them through a TEXT sink (the ES-shaped egress), read
    //     back, decode, and aggregate; oracle aggregates the source ---
    "q57_typed_json_sink" -> rounded("sum_v" -> 4)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val sel = events.select(col("event_id"), col("event_type"),
        col("value"), col("ts"))
      val encSchema = graft.etl.TypedJson.encode(sel).schema
      val out = Scratch.dir("graft_q57")
        .toString
      graft.etl.TypedJson.encodeJsonLines(sel)
        .write.mode("overwrite").text(out)
      val back = spark.read.text(out)
        .select(from_json(col("value"), encSchema).as("j"))
        .select(col("j.*"))
      graft.etl.TypedJson.decode(back)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
             max(col("ts")).as("max_ts_unix"))
        .orderBy(col("event_type"))
    }),

    // --- 2d stats bundle: one aggregate producing the full stats
    //     struct, flattened for the oracle ---
    "q58_stats_bundle" -> { (spark, dir) =>
      jx("""{"from": "lineitem", "groupby": ["l_returnflag"],
            "select": [{"name": "s", "value": "l_quantity",
                        "aggregate": "stats"}],
            "sort": ["l_returnflag"]}""")(spark, dir)
        .select(col("l_returnflag"),
          col("s.count").as("n"),
          round(col("s.sum"), 4).as("sum_qty"),
          round(col("s.min"), 4).as("min_qty"),
          round(col("s.max"), 4).as("max_qty"),
          round(col("s.avg"), 6).as("avg_qty"),
          round(col("s.std"), 6).as("std_qty"),
          round(col("s.var"), 6).as("var_qty"))
    },

    // --- 2h: intersect / except over customer key sets ---
    "q59_intersect_except" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val o = orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey"))
      val f = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      SetOps.intersect(o, f).agg(count(lit(1)).as("n_both"))
        .crossJoin(SetOps.except(o, f).agg(count(lit(1)).as("n_only_open")))
    },

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

    // --- S7: split sink — one computed frame fanned out to two sinks
    //     (full copy + filtered copy), both read back and compared ---
    "q62_split_sink" -> { (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val d1 = Scratch.dir("graft_q62a")
        .toString
      val d2 = Scratch.dir("graft_q62b")
        .toString
      graft.sources.Sinks.split(events, Seq(
        df => df.write.mode("overwrite").parquet(d1),
        df => df.filter(col("event_type") =!= "error")
          .write.mode("overwrite").parquet(d2)))
      val a = spark.read.parquet(d1).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_all"))
      val b = spark.read.parquet(d2).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_filtered"))
      a.join(b, Seq("event_type"), "left")
        .select(col("event_type"), col("n_all"),
          coalesce(col("n_filtered"), lit(0L)).as("n_filtered"))
        .orderBy(col("event_type"))
    },

    // --- 2k T1/T2: normalization reshape roundtrip — children nested
    //     into the parent doc (J4 reassemble), then T1-style
    //     re-normalized by explode with parent fields carried; the
    //     roundtrip must equal the plain relational join ---
    "q63_nest_unnest" -> rounded("sum_qty" -> 4)({ (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val li = tbl(spark, dir, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val nested = Joins.reassemble(orders, li, "o_orderkey", "lines",
        Seq(col("l_linenumber"), col("l_quantity")))
      nested
        .select(col("o_orderstatus"), explode(col("lines")).as("ln"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
             sum(col("ln.l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    }),

    // --- 2d union/list aggregates as deterministic CSV columns (both
    //     are array_sort'ed, so the CSV is stable under parallelism) ---
    "q64_union_list_aggs" -> { (spark, dir) =>
      jx("""{"from": "orders",
            "where": {"lt": ["o_custkey", 50]},
            "groupby": ["o_orderstatus"],
            "select": [
              {"name": "prios", "value": "o_orderpriority",
               "aggregate": "union"},
              {"name": "keys", "value": "o_orderkey", "aggregate": "list"}],
            "sort": ["o_orderstatus"]}""")(spark, dir)
        .select(col("o_orderstatus"),
          array_join(col("prios"), ",").as("prios_csv"),
          array_join(transform(col("keys"), _.cast(StringType)), ",")
            .as("keys_csv"))
    },

    // --- §2l: the UNBOUNDED-output streaming shape — watermarked
    //     APPEND-mode tumbling aggregation into a real parquet file
    //     sink (checkpointed), then read back. The backlog is staged
    //     as two files (events + a far-future sentinel) streamed one
    //     file per micro-batch, so the second batch advances the
    //     watermark past the real windows and flushes them to the
    //     sink; windows not past the final watermark stay in state ---
    "q66_stream_file_sink" -> rounded("sum_value" -> 4)(dated("day")({
      (spark, dir) =>
        // normalize BEFORE staging so the staged file and the TZ-typed
        // sentinel row share one schema and the watermark accepts it
        val events = EventStream.normalizeEventTime(
            tbl(spark, dir, "events"))
          .select(col("ts"), col("event_type"), col("value"))
        val src = Scratch.dir("graft_q66src")
          .toString
        events.coalesce(1).write.mode("append").parquet(src)
        // sentinel: 2024-03-01T00:00Z — far past every real event
        spark.createDataFrame(Seq(
            (new java.sql.Timestamp(1709251200000L), "sentinel", 0.0)))
          .toDF("ts", "event_type", "value")
          .coalesce(1).write.mode("append").parquet(src)
        val stream = spark.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
        val agg = EventStream.tumblingAgg(stream, "ts", "1 day", "1 hour",
          "event_type")
        val out = Scratch.dir("graft_q66out")
          .toString
        val ckpt = Scratch.dir("graft_q66ck")
          .toString
        EventStream.runToSink(spark, agg, out, ckpt)
          .filter(col("event_type") =!= "sentinel")
          .select(col("window.start").as("day"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy(col("day"), col("event_type"))
    })),

    // --- 2d approx aggregates (the exact=false scale path): HLL
    //     cardinality and approx percentile, checked against their
    //     exact twins with relative-error bounds (HLL default rsd is
    //     5%; bound 10% => deterministic-true unless the sketch path
    //     breaks; the exact values themselves are SQL-oracled) ---
    "q67_approx_aggs" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      li.agg(
          countDistinct(col("l_orderkey")).as("n_exact"),
          approx_count_distinct(col("l_orderkey")).as("__n_approx"),
          expr("percentile(l_extendedprice, 0.5)").as("__med_exact"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("__med_approx"))
        .select(col("n_exact"),
          (abs(col("__n_approx") - col("n_exact")) <=
            col("n_exact") * 0.1).as("card_within_10pct"),
          (abs(col("__med_approx") - col("__med_exact")) <=
            abs(col("__med_exact")) * 0.05).as("median_within_5pct"))
    },

    // --- 2k T4: perfherder-style marked-JSON extraction from mixed
    //     log lines (marker lines decoded, plain lines skipped);
    //     doubles roundtrip losslessly through Spark's shortest-repr
    //     formatting, so the oracle aggregates the source directly ---
    "q68_perfherder" -> rounded("avg_value" -> 6)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val lines = events.select(
        when(col("event_id") % 3 === 0,
          concat(lit("PERFHERDER_DATA: {\"suite\": \""), col("event_type"),
            lit("\", \"value\": "), col("value"), lit("}")))
          .otherwise(concat(lit("plain log line "), col("event_id")))
          .as("line"))
      LogParse.parseMarkedJson(lines, col("line"), "PERFHERDER_DATA",
          new StructType().add("suite", StringType)
            .add("value", DoubleType))
        .groupBy(col("suite"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
        .orderBy(col("suite"))
    }),

    // --- 2k T5: lcov-style DA-line coverage aggregation, sections
    //     keyed by order status; SF/noise lines filtered out ---
    "q69_coverage" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val da = orders.select(col("o_orderstatus").as("sk"),
        concat(lit("DA:"), col("o_orderkey") % 1000, lit(","),
          when(col("o_totalprice") > 150000, 1).otherwise(0)).as("line"))
      val noise = orders.filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderstatus").as("sk"),
          concat(lit("SF:file_"), col("o_orderstatus")).as("line"))
      LogParse.coverageFromDaLines(SetOps.concat(Seq(da, noise)),
          col("sk"), col("line"))
        .orderBy(col("source_file"))
    },

    // --- LLM end-to-end corpus prep: score -> quality floor -> exact
    //     fingerprint dedup -> minhash near-dup removal. The SQL-
    //     expressible stage counts (quality survivors via the full
    //     composite score formula, exact-dedup survivors via the
    //     portable fingerprint) are oracled exactly; the LSH removal
    //     stage is bounded (can only shrink the corpus, and near-dups
    //     at jaccard>=0.8 are <10% of these corpora) ---
    "q70_corpus_prep" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      // ONE pipeline, audited per stage: the staged Pipelines API
      // (scoreCorpus -> exactByKey -> removeNearDups) lets the query
      // count each stage without re-running the whole preparation
      val scored = graft.llm.Pipelines.scoreCorpus(docs, col("text"),
          minQuality = 0.3, portableFingerprint = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exact = Dedup.exactByKey(scored, Seq(col("fingerprint")),
          col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prepared = graft.llm.Pipelines.removeNearDups(exact,
        col("doc_id"), col("text"), nearDupJaccard = 0.8)
      scored.agg(count(lit(1)).as("n_quality"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .crossJoin(prepared.agg(count(lit(1)).as("__n_final")))
        .select(col("n_quality"), col("n_exact"),
          (col("__n_final") <= col("n_exact") &&
            col("__n_final") >= col("n_exact") * 0.9)
            .as("final_within_bounds"))
    },

    // --- dynamic-schema merge policy: two heterogeneous frames
    //     (disjoint optional columns + a long-vs-double conflict on
    //     `value`) merged by the widening rules and unioned; missing
    //     columns land as null (JX missing semantics) ---
    "q71_schema_merge" -> rounded("sum_v" -> 4)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val a = events.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("event_type"), col("value"))
      val b = events.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"),
          col("value").cast(LongType).as("value"))
      graft.tables.SchemaMerge.unionAll(Seq(a, b))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
          count(col("user_id")).as("n_user"))
        .orderBy(col("event_type"))
    }),

    // --- 2l/2m custom keyed state: mapGroupsWithState running counts
    //     drained over the event stream; the FINAL count per key must
    //     equal the batch aggregate (update-mode memory sink keeps the
    //     latest state emission per key) ---
    "q72_stream_state" -> { (spark, dir) =>
      val ev = EventStream.readTable(spark, dir, "events")
      val counts = EventStream.runningCounts(ev, "user_id")
      EventStream.runToCompletion(spark, counts, mode = "update")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"))
        .orderBy(col("user_id"))
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

    // --- meta.tables: the table inventory as a queryable frame ---
    "q74_meta_tables" -> { (spark, dir) =>
      MetaColumns.tables(spark, new Catalog(spark, dir))
        .orderBy(col("table_name"))
    },

    // --- 2i items: object -> [{name, value}] pairs (stringified
    //     values), through a tuple-built struct ---
    "q65_items" -> { (spark, dir) =>
      jx("""{"from": {"from": "events",
                      "select": ["event_id",
                                 {"name": "kv",
                                  "value": {"tuple": ["event_type",
                                                      "user_id"]}}]},
            "select": ["event_id",
                       {"name": "kv_items", "value": {"items": "kv"}}],
            "sort": ["event_id"],
            "limit": 50}""")(spark, dir)
        .select(col("event_id"),
          array_join(transform(col("kv_items"),
            s => concat_ws("=", s.getField("name"), s.getField("value"))),
            ";").as("items_csv"))
    },

    // --- dedup clustering: pairwise near-dup output -> transitive
    //     connected components (min-id label) -> cluster census. The
    //     edge list is a deterministic chain+cross-link graph over doc
    //     ids (chains of 7, merged in pairs by a +14 cross edge every
    //     21 ids) so the closure is genuinely multi-hop; the oracle
    //     recomputes it with a recursive CTE. ---
    "q75_dedup_clusters" -> { (spark, dir) =>
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
      val chain = ids.alias("a").join(ids.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            pmod(col("a.doc_id"), lit(7)) =!= 6)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val cross = ids.alias("a").join(ids.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 14 &&
            pmod(col("a.doc_id"), lit(21)) === 3)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      Dedup.connectedComponents(chain.unionByName(cross),
          col("id_a"), col("id_b"))
        .groupBy(col("comp")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("comp"))
    },

    // --- Gopher-style repetition quality signals (dup-token /
    //     dup-2gram / top-token-char fractions), all row-local column
    //     math; keep-flag computed on the UNROUNDED ratios ---
    "q76_repetition" -> rounded("dup_tok_frac" -> 6,
        "dup_2gram_frac" -> 6, "top_tok_frac" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      docs.select(col("doc_id"),
          TextAnalysis.dupTokenFrac(col("text")).as("dup_tok_frac"),
          TextAnalysis.dupNgramFrac(col("text"), 2).as("dup_2gram_frac"),
          TextAnalysis.topTokenCharFrac(col("text")).as("top_tok_frac"))
        .withColumn("keep",
          col("dup_2gram_frac") <= 0.03 && col("top_tok_frac") <= 0.1)
        .orderBy(col("doc_id"))
    }),

    // --- deterministic train/val/test split: md5-bucket of the id
    //     (stable under reshuffling/reruns, engine-portable) ---
    "q77_hash_split" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      docs.select(Pipelines.splitAssign(col("doc_id")).as("split"),
          Pipelines.hashBucket(col("doc_id"), 100).as("bucket"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("bucket")).as("min_bucket"),
          max(col("bucket")).as("max_bucket"))
        .orderBy(col("split"))
    },

    // --- benchmark decontamination: train docs sharing any word
    //     8-gram with an eval set (here: 12-token prefixes of every
    //     97th doc, so the sources are genuinely contaminated) ---
    "q78_decontaminate" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val evalSet = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(array_join(slice(TextAnalysis.tokens(col("text")), 1, 12),
          " ").as("etext"))
      Contamination.sharedGrams(docs, col("doc_id"), col("text"),
          evalSet, col("etext"), n = 8)
        .orderBy(col("id"))
    },

    // --- sequence packing: shard by hash bucket, concatenate docs in
    //     id order, chunk at a 2048-token budget; each doc reports the
    //     pack range it spans ---
    "q79_seq_packing" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val withShard = docs.select(col("doc_id"),
        pmod(Pipelines.hashBucket(col("doc_id"), 100), lit(4)).as("shard"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
      Pipelines.packSequences(withShard, col("doc_id"), col("shard"),
          col("n_tok"), budget = 2048)
        .orderBy(col("id"))
    },

    // --- PII redaction: synthetic emails/phones/IPs injected into
    //     every other doc, redacted to typed tags; clean docs must
    //     pass through byte-identical (the full redacted text is
    //     hash-compared, not just the counts) ---
    "q80_redact_pii" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val dirty = when(pmod(col("doc_id"), lit(2)) === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com"),
          lit(" or 555-"),
          lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("doc_id") * 7, lit(10000)).cast("string"), 4, "0"),
          lit(" from 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit(".77")))
        .otherwise(col("text"))
      docs.select(col("doc_id"),
          TextAnalysis.piiCounts(dirty).as("__p"),
          TextAnalysis.redactPii(dirty).as("redacted"))
        .select(col("doc_id"),
          (col("__p.emails") + col("__p.phones") + col("__p.ips"))
            .as("n_pii"),
          col("redacted"))
        .orderBy(col("doc_id"))
    },

    // --- TF-IDF relevance: smoothed idf over the corpus, scores for a
    //     3-term query; output keyed by doc id (no rank column, so
    //     engine-ulp idf differences cannot reorder the compare) ---
    "q81_tfidf" -> rounded("score" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      graft.llm.Relevance.tfidfScores(docs, col("doc_id"), col("text"),
          Seq("spark", "query", "vector"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // --- incremental exact dedup: an incoming batch (the odd-id half
    //     PLUS re-ingested copies of every 50th even-id doc under new
    //     ids) deduped against the even half's fingerprint store —
    //     re-ingests must vanish, then the batch dedups internally ---
    "q82_incremental_dedup" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .withColumn("fp", TextAnalysis.fingerprintPortable(col("text")))
      val old = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val replayed = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
      val incoming = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .unionByName(replayed)
      val survivors = Dedup.incrementalExact(incoming, col("doc_id"),
        col("fp"), old.select(col("fp")).distinct())
      incoming.agg(count(lit(1)).as("n_incoming"))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors"),
          coalesce(sum(when(col("doc_id") >= 100000L, 1L).otherwise(0L)),
            lit(0L)).as("n_replayed_kept")))
    },

    // --- BM25 relevance, same 3-term query as q81: tf saturation +
    //     length normalization; avglen is an exact long-sum/count
    //     division so only ln() is transcendental (round 6 absorbs) ---
    "q83_bm25" -> rounded("score" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      graft.llm.Relevance.bm25Scores(docs, col("doc_id"), col("text"),
          Seq("spark", "query", "vector"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // --- line/paragraph repetition fractions, on a constructed
    //     multi-line corpus (the parquet docs are single-line): every
    //     doc gets duplicate lines, every third a duplicate paragraph
    //     and a fully duplicated line-4 ---
    "q84_dup_lines" -> rounded("dup_line_frac" -> 6,
        "dup_para_frac" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val pre = substring(col("text"), 1, 60)
      val third = pmod(col("doc_id"), lit(3)) === 0
      val multiA = concat(col("text"), lit("\n"), pre, lit("\n"), pre,
        lit("\n\n"), when(third, col("text"))
          .otherwise(concat(pre, lit(" tail"))))
      val multiB = concat(pre, lit("\n\n"), pre, lit("\n\n"),
        when(third, pre).otherwise(col("text")))
      docs.select(col("doc_id"),
          TextAnalysis.dupLineFrac(multiA).as("dup_line_frac"),
          TextAnalysis.dupParaFrac(multiB).as("dup_para_frac"))
        .orderBy(col("doc_id"))
    }),

    // --- corpus curation: top-3 quality docs per predicted language,
    //     via the bounded-state top-k Aggregator (map-side combinable;
    //     a window would sort one whole partition per language).
    //     quality is pre-rounded to 6, so the rank order is identical
    //     across engines; ties keep the smaller doc id ---
    "q85_curation_topk" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val scored = docs.select(col("doc_id"),
        TextAnalysis.langIdFast(col("text")).as("lang_pred"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      graft.llm.Curation.topKPerGroup(scored, col("lang_pred"),
          col("doc_id"), col("quality"), k = 3)
        .select(col("grp").as("lang_pred"), col("rk"),
          col("id").as("doc_id"), col("score").as("quality"))
        .orderBy(col("lang_pred"), col("rk"))
    },

    // --- M8: product-quantization ANN (PQ-ADC candidates + exact
    //     re-rank), recall floor vs the brute-force baseline — the
    //     deterministic codebook (lowest-id vectors) makes the recall
    //     a fixed number per corpus ---
    "q86_ann_pq" -> { (spark, dir) =>
      val emb = tbl(spark, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(
          emb, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"), k = 5)
        .select(col("query_id"), col("vec_id"))
      val approx = Similarity.pqTopK(
          emb, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"),
          k = 5, m = 8, ksub = 16, refine = 64)
        .select(col("query_id"), col("vec_id"))
      val hits = approx.join(exact, Seq("query_id", "vec_id"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("__hits")))
        .select(col("n_exact"),
          (col("__hits") >= col("n_exact") * 0.6).as("recall_floor_met"))
    },

    // --- 2l stream-static anti-join: a document stream deduped
    //     against a static fingerprint store (even-id docs); only
    //     odd-id docs with unseen fingerprints reach the sink ---
    "q87_stream_dedup_store" -> { (spark, dir) =>
      val stream = EventStream.readTable(spark, dir, "documents")
        .filter(pmod(col("doc_id"), lit(2)) === 1)
        .withColumn("fp", TextAnalysis.fingerprintPortable(col("text")))
      val store = tbl(spark, dir, "documents")
        .filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(TextAnalysis.fingerprintPortable(col("text")).as("fp"))
        .distinct()
      val survivors = EventStream.dedupAgainstStore(stream, col("fp"),
        store)
      EventStream.runToCompletion(spark, survivors, mode = "append")
        .agg(count(lit(1)).as("n_survivors"),
          count_distinct(col("fp")).as("n_distinct_fp"))
    },

    // --- J2 block co-group proper: typed cogroup of orders and
    //     lineitem per order key, the per-key imperative-merge form
    //     (l_quantity is integral, so the in-function double sum is
    //     order-independent) ---
    "q88_cogroup" -> rounded("sum_qty" -> 4)({ (spark, dir) =>
      import spark.implicits._
      val o = tbl(spark, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey").cast("long")).as[Long]
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(10)) === 0)
        .select(col("l_orderkey").cast("long"),
          col("l_quantity").cast("double")).as[(Long, Double)]
      Joins.coGroup(o, li)(identity, _._1) { (k, os, ls) =>
        val items = ls.toVector
        Iterator((k, os.size.toLong, items.size.toLong,
          items.map(_._2).sum))
      }.toDF("o_orderkey", "n_orders", "n_items", "sum_qty")
        .orderBy(col("o_orderkey"))
    }),

    // --- 2l stream-stream interval join: purchases within 30 minutes
    //     of a view by the same user, both sides watermarked (state
    //     evicts at watermark + interval); inner matches emit without
    //     waiting for the watermark, so the backlog drains in one
    //     AvailableNow pass ---
    "q89_stream_interval_join" -> { (spark, dir) =>
      // every-third-user slice: the interval-join STATE (not the
      // result) is what the memory-backed local state store pays for —
      // the slice keeps the capability check while bounding that cost
      val views = EventStream.readTable(spark, dir, "events")
        .filter(col("event_type") === "view" &&
          pmod(col("user_id"), lit(3)) === 0)
        .select(col("user_id"), col("ts").as("a_ts"),
          col("event_id").as("a_id"))
      val purchases = EventStream.readTable(spark, dir, "events")
        .filter(col("event_type") === "purchase" &&
          pmod(col("user_id"), lit(3)) === 0)
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      // drain watermark DERIVED from the static backlog's event-time
      // span (EventStream.backlogSpanWatermark): even if the source
      // delivered the backlog across many micro-batches, no row can be
      // late-dropped vs the batch oracle — the single-batch assumption
      // is enforced away, not assumed (EventStreamSpec holds the
      // multi-batch law at maxFilesPerTrigger=1)
      val joined = EventStream.intervalJoin(
        views, "a_ts", purchases, "b_ts",
        col("user_id") === col("b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("interval 30 minutes"),
        watermark = EventStream.backlogSpanWatermark(
          tbl(spark, dir, "events"), "ts"))
      EventStream.runToCompletion(spark, joined, mode = "append")
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("user_id")).as("n_users"),
          min(col("a_id")).as("min_view_id"))
    },

    // --- tokenizer vocabulary induction: top-20 tokens of the train
    //     split with stable ids (count desc, token asc), plus the
    //     held-out split's OOV rate against that vocab. Top-k is a
    //     distributed orderBy().limit() (TakeOrderedAndProject — each
    //     partition keeps k, the driver merges k×partitions rows); the
    //     rank window then runs over the 20 survivors only, never over
    //     the full distinct-token table ---
    "q90_vocab" -> rounded("oov_rate" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 9)
      val heldout = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      val counts = train
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val top = counts.orderBy(col("cnt").desc, col("tok").asc).limit(20)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("tok").asc)
      val vocab = top
        .withColumn("tok_id", row_number().over(w).cast("int"))
      val ho = heldout
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val oov = ho.join(vocab.select(col("tok")), Seq("tok"), "left_anti")
        .agg(count(lit(1)).as("__n_oov"))
        .crossJoin(ho.agg(count(lit(1)).as("__n_ho")))
        .select((col("__n_oov").cast("double") / col("__n_ho"))
          .as("oov_rate"))
      vocab.crossJoin(oov)
        .select(col("tok_id"), col("tok"), col("cnt"), col("oov_rate"))
        .orderBy(col("tok_id"))
    }),

    // --- deterministic stratified sampling: per-source corpus mixing
    //     ratios (src0 -> 30%, src1 -> 50%, default 80%) via md5
    //     buckets; kept counts per source are exactly reproducible ---
    "q91_stratified_sample" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      Pipelines.stratifiedSample(docs, col("doc_id"), col("source"),
          pct = Map("src0" -> 30, "src1" -> 50), defaultPct = 80)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        .orderBy(col("source"))
    },

    // --- cube result format end-to-end: a 2-edge JX query with
    //     format:"cube" runs through Formats.toCube (the DRIVER-SIDE
    //     dense N-dim matrix the reference's query service returns),
    //     then the cube is re-exploded to (edge_a, edge_b, value) rows
    //     INSIDE the query — coordinate arithmetic, domain order,
    //     densified empty cells ("X" status never occurs -> n=0 row)
    //     and the allowNulls overflow partition (2 of 5 priorities are
    //     outside the domain -> the null prio row) all land in the
    //     hash-compare. The cube is bounded by the domain product
    //     (4×4 cells), never by the fact table — driver-safe ---
    "q92_cube_format" -> rounded("sum_price" -> 2)({ (spark, dir) =>
      val q = QueryParser.parse("""
        {"from": "orders",
         "format": "cube",
         "edges": [
           {"name": "status", "value": "o_orderstatus",
            "domain": {"type": "set",
                       "partitions": ["O", "F", "P", "X"]}},
           {"name": "prio", "value": "o_orderpriority", "allowNulls": true,
            "domain": {"type": "set",
                       "partitions": ["1-URGENT", "2-HIGH", "3-MEDIUM"]}}],
         "select": [{"name": "n", "aggregate": "count"},
                    {"name": "sum_price", "value": "o_totalprice",
                     "aggregate": "sum"}]}""")
      val cube = Formats
        .shaped(new Runner(spark, new Catalog(spark, dir)), q)
        .asInstanceOf[Formats.JxCube]
      val nCube = cube.data("n")
      val pCube = cube.data("sum_price")
      val rows = for {
        (a, i) <- cube.domains(0).zipWithIndex
        (b, j) <- cube.domains(1).zipWithIndex
      } yield org.apache.spark.sql.Row(a, b,
          nCube(i).asInstanceOf[IndexedSeq[Any]](j),
          pCube(i).asInstanceOf[IndexedSeq[Any]](j))
      val schema = StructType(Seq(
        org.apache.spark.sql.types.StructField("status", StringType),
        org.apache.spark.sql.types.StructField("prio", StringType),
        org.apache.spark.sql.types.StructField("n", LongType),
        org.apache.spark.sql.types.StructField("sum_price", DoubleType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    }),

    // --- S4 at-least-once REDELIVERY (not just replay): the backlog
    //     arrives as two blocks in separate micro-batches
    //     (maxFilesPerTrigger=1, modification-time ordered) and the
    //     second block re-delivers a subset of block 1's events — the
    //     visibility-timeout duplicate a queue-driven pipeline must
    //     absorb. dedupByKey suppresses the redelivered rows (in-state
    //     duplicates drop against state; rows behind the advanced
    //     watermark drop as late — either path suppresses), so the
    //     oracle is the plain single-copy aggregate ---
    "q93_stream_redelivery" -> rounded("sum_value" -> 4)({ (spark, dir) =>
      val events = tbl(spark, dir, "events")
      val stage = Scratch.dir("graft_q93").toString
      def stageBlock(df: DataFrame, name: String, modMs: Long): Unit = {
        val tmp = s"$stage/_$name"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = new java.io.File(s"$stage/$name.parquet")
        java.nio.file.Files.move(part.toPath, dest.toPath)
        dest.setLastModified(modMs) // file-source batch order = modTime
      }
      stageBlock(events, "block1", 1000000L)
      stageBlock(events.filter(col("event_id") % 5 === 0), "block2",
        2000000L)
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$stage/block1.parquet").schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "block*.parquet")
        .parquet(stage)
      val deduped = EventStream.dedupByKey(stream, "ts", "1 day",
        "event_id")
      EventStream.runToCompletion(spark, deduped, mode = "append")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // --- §2m modern arbitrary state (transformWithState): per-user
    //     running counts through a named ValueState + event-time
    //     expiry timer on the RocksDB provider — q72's semantics on
    //     the API Spark evolves state management on. The TTL is wider
    //     than the backlog's span, so no timer fires during the drain
    //     and the last update per key equals the batch count ---
    "q94_stream_state_tws" -> { (spark, dir) =>
      val providerKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      try {
        val ev = EventStream.readTable(spark, dir, "events")
        val counts = EventStream.runningCountsTws(ev, "user_id", "ts",
          watermark = "1 day", ttlMs = 3650L * 24 * 3600 * 1000)
        EventStream.runToCompletion(spark, counts, mode = "update")
          .groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"))
          .orderBy(col("user_id"))
      } finally prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    },

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

    // --- SemDeDup (Abbas et al. 2023): cluster-bucketed semantic dedup
    //     over embeddings — same corpus-plus-variants construction as
    //     q44 so near-identical pairs exist, but pairs are compared
    //     only WITHIN a quantizer cell (N²/k, the published recipe's
    //     scale bound) instead of all-pairs. The oracle replays the
    //     deterministic quantizer (8 lowest-id vectors; ties to the
    //     lower centroid id) and the within-cell threshold join ---
    "q96_semdedup" -> { (spark, dir) =>
      val e = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val variant = e.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), (x, i) =>
          x + when(i.cast("long") === pmod(col("vec_id"), size(col("v"))),
            lit(0.5)).otherwise(lit(0.0))).as("v"))
      graft.llm.SemDedup.duplicates(e.unionByName(variant),
          col("vec_id"), col("v"), nlist = 8, threshold = 0.8)
        .orderBy(col("dup_id"))
    },

    // --- model-based quality filtering: linear-classifier inference
    //     over one text_stats kernel pass; rational features + the
    //     algebraic sigmoid keep every double bit-identical across
    //     engines, so score AND keep-decision are hash-compared, not
    //     just spot-checked ---
    "q97_quality_classifier" -> rounded("score" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      graft.llm.QualityModel.classify(docs, col("text"))
        .select(col("doc_id"), col("score"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // --- overlapping token-window chunking (64-token windows, stride
    //     48): every chunk's token count and exact text re-derived by
    //     the oracle from the same whitespace tokenization ---
    "q98_chunk_docs" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      Pipelines.chunkDocs(docs, col("doc_id"), col("text"),
          size = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_ix"))
    },

    // --- BPE vocabulary induction, round-0 statistic: weighted
    //     adjacent character-pair counts over the word-frequency table
    //     (the per-merge-round distributed count; BpeSpec covers the
    //     iterative train loop the oracle can't express). Top-20 under
    //     a total order (freq desc, pair asc) so the set is
    //     deterministic ---
    "q99_bpe_pairs" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val words = graft.llm.Bpe.wordFreqs(docs, col("text"))
        .select(col("word"), col("freq"),
          graft.llm.Bpe.initSymbols(col("word")).as("symbols"))
      graft.llm.Bpe.pairCounts(words, col("symbols"), col("freq"))
        .orderBy(col("pair_freq").desc, col("a").asc, col("b").asc)
        .limit(20)
    },

    // --- temperature-based mixture weighting (sampling ∝ size^τ,
    //     τ=0.5): per-source sampling probability, document budget and
    //     repeat rate for corpus blending; p pinned to 9 digits before
    //     the integer budget so libm pow ULP differences cannot flip a
    //     document count ---
    "q100_mixture_weights" -> rounded("p" -> 6, "rate" -> 6)({
      (spark, dir) =>
        val docs = tbl(spark, dir, "documents")
        Pipelines.mixtureWeights(docs, col("source"),
            temperature = 0.5, budget = 100000L)
          .orderBy(col("source"))
    }),

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

    // --- feature-hashing bridge: hashed bag-of-words vectors over the
    //     documents table (portable md5 buckets, integer counts — dot
    //     products exact in doubles, so cosines are bit-identical
    //     across engines with NO rounding hazard), fed into SemDeDup.
    //     Near-dups exist by construction (q95-style tail-truncated
    //     variants); 32 dims means hash collisions also surface some
    //     natural pairs — the documented hashing trade, identical in
    //     both engines. Honest scale caveat: BoW vectors are stopword-
    //     correlated, so the lowest-id quantizer buckets unevenly here
    //     (worst cell ~30% of the corpus at sf0.1) — the cell join is
    //     an equi-join, so AQE skew-split absorbs the hot cell, and a
    //     production run refines the centroids with KMeans.fit (q101)
    //     before bucketing, which the oracle cannot cheaply replay ---
    "q102_hashed_bow_semdedup" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val vecs = graft.llm.Featurize.hashedBow(
        docs.unionByName(variants), col("doc_id"), col("text"), dim = 32)
      graft.llm.SemDedup.duplicates(vecs, col("doc_id"), col("v"),
          nlist = 16, threshold = 0.95)
        .groupBy(col("cell"))
        // min/max, not avg: the per-pair cosines are bit-exact in both
        // engines, but an AVERAGE re-sums them in engine-dependent
        // order and a last-ULP difference can flip the 6th rounded
        // digit (observed once); min/max are order-independent
        // SELECTIONS of exact values
        .agg(count(lit(1)).as("n_dups"),
             sum(when(col("dup_id") === col("kept_id") + 1000000L, 1L)
               .otherwise(0L)).as("n_variant_pairs"),
             min(col("max_cosine")).as("min_cosine"),
             max(col("max_cosine")).as("top_cosine"))
        .orderBy(col("cell"))
    },

    // --- n-gram LM perplexity scoring (CCNet-style quality filter):
    //     interpolated add-1 unigram+bigram model trained on the md5
    //     hash-split train docs, scoring the held-out test split by
    //     average token log-probability. λ=0.5 ON PURPOSE: 1-λ must be
    //     IEEE-exact in BOTH engines (1-0.7 is 0.30000000000000004 in
    //     Scala but a different literal in SQL); probabilities are
    //     exact count ratios, so only ln() (≤1 ULP libm skew) sits
    //     under the 6-digit rounding: deterministicAvg folds the
    //     VALUE-SORTED per-doc log-probs (both engines reduce the same
    //     ordered list), killing the partition-dependent avg() reorder
    //     that could intermittently flip a rounded digit ---
    "q103_lm_score" -> rounded("avg_logprob" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val train = docs.filter(Pipelines.hashBucket(col("doc_id")) < 80)
      val test = docs.filter(Pipelines.hashBucket(col("doc_id")) >= 90)
      graft.llm.LangModel.scoreDocs(test, col("doc_id"), col("text"),
          graft.llm.LangModel.unigrams(train, col("text")),
          graft.llm.LangModel.bigrams(train, col("text")),
          lambda = 0.5, k = 1.0, deterministicAvg = true)
        .orderBy(col("doc_id"))
    }),

    // --- substring-level duplication (Lee et al. exact-substring
    //     recipe, rolling 20-token window instead of suffix arrays):
    //     per doc, the fraction of span starts whose span also occurs
    //     in another doc. Variants share almost all spans with their
    //     originals (frac near 1); the base docs measure the corpus's
    //     natural boilerplate. The fraction is an exact integer ratio
    //     — bit-identical in both engines ---
    "q104_dup_spans" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("text").substr(lit(1),
            greatest(length(col("text")) - 30, lit(1))).as("text"))
      Dedup.duplicatedSpans(docs.unionByName(variants),
          col("doc_id"), col("text"), n = 20, minDocs = 2)
        .orderBy(col("doc_id"))
    },

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

    // --- JX over LLM output (Runner.runOn composes the two halves of
    //     the library): a dense 2-edge cube — SetDomain on lang ×
    //     RangeDomain on the quality-model score decile — computed
    //     over the classifier frame. The decile edge multiplies the
    //     score by 10 INSIDE JX so bucket arithmetic stays on
    //     engine-identical doubles (a 0.1-interval domain would join
    //     on inexact binary fractions) ---
    "q106_jx_over_llm" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val scored = graft.llm.QualityModel.classify(docs, col("text"))
        .select(col("doc_id"), col("lang"), col("score"))
      val q = QueryParser.parse("""
        {"from": "scored",
         "edges": [
           {"name": "lang", "value": "lang",
            "domain": {"type": "set",
                       "partitions": ["de", "en", "es", "fr"]}},
           {"name": "score_decile", "value": {"mult": ["score", 10]},
            "domain": {"type": "range", "min": 0, "max": 10,
                       "interval": 1}}],
         "select": [{"name": "n", "aggregate": "count"}]}""")
      Runner.runOn(scored, q)
        .orderBy(col("lang"), col("score_decile"))
    },

    // --- SemDeDup under a FITTED quantizer (the paper's own recipe:
    //     cluster with k-means, then dedup within cells): hashed-BoW
    //     vectors -> 2 Lloyd rounds from the lowest-id init ->
    //     within-fitted-cell pairs. BoW counts are integers, so every
    //     Lloyd mean is an EXACT rational (integer sum / count) —
    //     bit-identical across engines in any summation order — and
    //     the whole fit loop is oracle-replayable, not just one step
    //     (q101). This is the production path that kills q102's hot
    //     lowest-id cell; the measured cell balance is in
    //     BENCHMARKS.md ---
    "q107_semdedup_fitted" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val vecs = graft.llm.Featurize.hashedBow(
        docs.unionByName(variants), col("doc_id"), col("text"), dim = 32)
      // fit reads a checkpointed copy so the Lloyd rounds don't
      // recompute the BoW chain per round; the blocks are freed as
      // soon as the (itself checkpoint-backed) centroid table exists
      val vecsCp = vecs.localCheckpoint()
      val means = graft.llm.KMeans.fit(vecsCp, col("doc_id"), col("v"),
        k = 16, iters = 2)
      graft.llm.Lifecycle.release(vecsCp)
      graft.llm.SemDedup.duplicatesFitted(vecs, col("doc_id"), col("v"),
          means, threshold = 0.95)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_dups"),
             sum(when(col("dup_id") === col("kept_id") + 1000000L, 1L)
               .otherwise(0L)).as("n_variant_pairs"),
             min(col("max_cosine")).as("min_cosine"),
             max(col("max_cosine")).as("top_cosine"))
        .orderBy(col("cell"))
    },

    // --- the OTHER hot-cell mitigation: secondary-hash splitting of
    //     oversized cells under the (deliberately degenerate on BoW)
    //     lowest-id quantizer. Every subcell is capped at ~200 rows,
    //     restoring the Σ|cell|² bound; the price — pairs straddling a
    //     split are not compared — is deterministic (portable md5
    //     subcell hash) and therefore hash-compared, not hidden:
    //     variant pairs land in different subcells unless their ids
    //     hash together, so n_variant_pairs here is a measured recall
    //     loss vs q102's same pairs ---
    "q108_semdedup_split" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val vecs = graft.llm.Featurize.hashedBow(
        docs.unionByName(variants), col("doc_id"), col("text"), dim = 32)
      val assigned = graft.llm.SemDedup.assign(vecs, col("doc_id"),
        col("v"), nlist = 16)
      val split = graft.llm.SemDedup.splitOversizedCells(assigned,
        cap = 200)
      graft.llm.SemDedup.duplicatesAssigned(split, threshold = 0.95)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_dups"),
             sum(when(col("dup_id") === col("kept_id") + 1000000L, 1L)
               .otherwise(0L)).as("n_variant_pairs"),
             min(col("max_cosine")).as("min_cosine"),
             max(col("max_cosine")).as("top_cosine"))
        .orderBy(col("cell"))
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
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val vecs = graft.llm.Featurize.hashedBow(
        docs.unionByName(variants), col("doc_id"), col("text"), dim = 32)
      val vecsCp = vecs.localCheckpoint()
      val means = graft.llm.KMeans.fit(vecsCp, col("doc_id"), col("v"),
        k = 16, iters = 2)
      val idx = Scratch.dir("graft_q109").toString + "/ivf_fitted"
      graft.llm.Similarity.ivfWriteIndexFitted(vecsCp, col("doc_id"),
        col("v"), idx, means)
      // the index (and its centroid sidecar) is on disk now — the fit
      // and the checkpointed corpus can be freed; queries re-derive
      // their 4 vectors from the tiny filtered base table
      graft.llm.Lifecycle.release(vecsCp)
      graft.llm.Lifecycle.release(means)
      val queries = graft.llm.Featurize.hashedBow(
        docs.filter(col("doc_id") < 4), col("doc_id"), col("text"),
        dim = 32)
      graft.llm.Similarity.ivfProbeIndexed(spark, idx,
        queries, col("doc_id"), col("v"),
        k = 5, nlist = 16, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    },

    // --- quality-model TRAINING, one batch-gradient step (the q97
    //     inference module's missing half): gradient of the mean
    //     squared error under the ALGEBRAIC sigmoid, whose derivative
    //     0.5/(1+|x|)² is rational — every per-row term is exact IEEE
    //     math, and the per-feature sums fold VALUE-SORTED term lists
    //     (deterministicSum), so the whole gradient hash-compares with
    //     no transcendental in sight. Label: lang == 'en' (train an
    //     English-prose classifier). One pass, map-side partials,
    //     numFeatures+1 doubles leave the executors ---
    "q110_quality_grad" -> rounded("g" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      graft.llm.QualityModel.gradient(docs, col("text"),
          when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)),
          deterministicSum = true)
        .orderBy(col("feature"))
    }),

    // --- INCREMENTAL semantic dedup against a persisted assignment
    //     index (the q95 shape on the embedding side): 70% of docs are
    //     "historical" — a 2-round fit on THEM freezes the quantizer,
    //     and they persist only as the cell-partitioned (vec_id, cv)
    //     index + centroid sidecar (the very artifact q109 probes for
    //     ANN). The new batch (the other 30% plus tail-truncated
    //     variants of everything) is assigned under the frozen
    //     quantizer and compared only within its touched cells — the
    //     historical side is read through a partition-pruned IN-list,
    //     never rescanned in full. Any historical match dedups a new
    //     vector (history is canonical); within the batch the lower
    //     id survives ---
    "q111_semdedup_incremental" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val vecs = graft.llm.Featurize.hashedBow(
        docs.unionByName(variants), col("doc_id"), col("text"), dim = 32)
      val isHist = col("doc_id") < 1000000L &&
        pmod(col("doc_id"), lit(10)) < 7
      val histV = vecs.filter(isHist).localCheckpoint()
      val means = graft.llm.KMeans.fit(histV, col("doc_id"), col("v"),
        k = 16, iters = 2)
      val idx = Scratch.dir("graft_q111").toString + "/sem_idx"
      graft.llm.Similarity.ivfWriteIndexFitted(histV, col("doc_id"),
        col("v"), idx, means)
      graft.llm.Lifecycle.release(histV)
      graft.llm.Lifecycle.release(means)
      graft.llm.SemDedup.incrementalDuplicates(spark,
          vecs.filter(!isHist), col("doc_id"), col("v"), idx,
          threshold = 0.95)
        .orderBy(col("dup_id"))
    },

    // --- the quality filter in its PRODUCTION position: on the ingest
    //     stream. classify is stateless row-local column math, so it
    //     rides a file stream unchanged (no watermark, no state store)
    //     and append-mode drains emit every row in one AvailableNow
    //     pass; the oracle is exactly q97's — the stream must produce
    //     the BATCH answer bit-for-bit, which is the stream/batch
    //     parity claim under the same hash gate as everything else ---
    "q112_stream_classify" -> rounded("score" -> 6)({ (spark, dir) =>
      val stream = EventStream.readTable(spark, dir, "documents")
      val scored = graft.llm.QualityModel.classify(stream, col("text"))
        .select(col("doc_id"), col("score"), col("keep"))
      EventStream.runToCompletion(spark, scored, mode = "append")
        .orderBy(col("doc_id"))
    }),

    // --- CONTINUOUS semantic dedup: q111's loop closed. The new set
    //     arrives as TWO micro-batches (even doc_ids, then odd); each
    //     batch dedups against the persisted index and appends its
    //     SURVIVORS before the next batch — so an odd-batch vector
    //     near-identical to an even-batch survivor is caught even
    //     though no history ever sits in memory. The oracle replays
    //     both stages sequentially under the frozen fitted quantizer;
    //     batch order is pinned by distinct file mtimes ---
    "q113_stream_semdedup" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val vecs = graft.llm.Featurize.hashedBow(
        docs.unionByName(variants), col("doc_id"), col("text"), dim = 32)
      val isHist = col("doc_id") < 1000000L &&
        pmod(col("doc_id"), lit(10)) < 7
      val histV = vecs.filter(isHist).localCheckpoint()
      val means = graft.llm.KMeans.fit(histV, col("doc_id"), col("v"),
        k = 16, iters = 2)
      val tmp = Scratch.dir("graft_q113").toString
      graft.llm.Similarity.ivfWriteIndexFitted(histV, col("doc_id"),
        col("v"), tmp + "/idx", means)
      graft.llm.Lifecycle.release(histV)
      graft.llm.Lifecycle.release(means)
      val newV = vecs.filter(!isHist)
      newV.filter(pmod(col("doc_id"), lit(2)) === 0)
        .coalesce(1).write.mode("append").parquet(tmp + "/src")
      Thread.sleep(1100) // distinct mtime second pins the batch order
      newV.filter(pmod(col("doc_id"), lit(2)) === 1)
        .coalesce(1).write.mode("append").parquet(tmp + "/src")
      val schema = spark.read.parquet(tmp + "/src").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp + "/src")
      graft.llm.SemDedup.streamingDedup(spark, stream, col("doc_id"),
          col("v"), tmp + "/idx", tmp + "/dups", tmp + "/cp",
          threshold = 0.95)
        .orderBy(col("dup_id"))
    },

    // --- cluster-BALANCED corpus subsampling (diversity-preserving
    //     curation): 20 docs from every fitted k-means cell, picked by
    //     a portable md5 order (hash asc, id asc — a deterministic
    //     "random" both engines replay). Composes three operators:
    //     hashed-BoW featurize -> 2-round Lloyd fit -> bounded-state
    //     per-group top-k (the q85 Aggregator — map-side combinable,
    //     never a whole-cell window sort). The balanced pick is what a
    //     naive global sample can't give: every semantic region keeps
    //     representation no matter how skewed the corpus ---
    "q114_cluster_sample" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val vecs = graft.llm.Featurize.hashedBow(docs, col("doc_id"),
        col("text"), dim = 32)
      val vecsCp = vecs.localCheckpoint()
      val means = graft.llm.KMeans.fit(vecsCp, col("doc_id"), col("v"),
        k = 16, iters = 2)
      val assigned = graft.llm.SemDedup.assignFitted(vecsCp,
        col("doc_id"), col("v"), means)
      // means stays checkpoint-backed until the result is consumed
      // (the plan references it lazily); Lifecycle.release is the
      // caller-side hook once materialized
      graft.llm.Curation.topKPerGroup(assigned, col("cell"),
          col("vec_id"),
          -Pipelines.hashBucket(col("vec_id"), 65536).cast("double"),
          k = 20)
        .select(col("grp").as("cell"), col("rk"), col("id").as("doc_id"))
        .orderBy(col("cell"), col("rk"))
    },

    // --- classifier evaluation: per-source ROC-AUC (tie-corrected
    //     Mann-Whitney rank estimator) + confusion counts for the q97
    //     quality model against the lang=='en' label. Every number is
    //     EXACT: scores are bit-identical rationals, average ranks are
    //     half-integers, and auc/precision/recall/accuracy are single
    //     divisions of exact sums — hash-compared UNROUNDED. The rank
    //     window runs over distinct (source, score) pairs, never the
    //     corpus ---
    "q115_classifier_eval" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val scored = graft.llm.QualityModel.classify(docs, col("text"))
      graft.llm.Eval.binaryMetrics(scored, col("source"), col("score"),
          coalesce(col("lang") === "en", lit(false)))
        .select(col("grp").as("source"), col("n"), col("npos"),
          col("nneg"), col("tp"), col("fp"), col("tn"), col("fn"),
          col("auc"), col("precision"), col("recall"), col("accuracy"))
        .orderBy(col("source"))
    },

    // --- LARGE-large corpus overlap through a broadcast Bloom
    //     prefilter: which training docs' exact content (md5
    //     fingerprint) also appears in a second corpus too big to
    //     broadcast as rows? The smaller side is sketched executor-
    //     side (only the bitmap reaches the driver), the big side is
    //     might_contain-filtered BEFORE its shuffle, then an exact
    //     semi join confirms — no false negatives, so the result is
    //     IDENTICAL to the plain semi join the oracle runs. The second
    //     corpus: every doc_id%3==0 doc verbatim (these overlap) plus
    //     modified doc_id%3==1 texts (these must not) ---
    "q116_bloom_overlap" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val big = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      val other = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(md5(col("text")).as("fp"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(3)) === 1)
          .select(md5(concat(col("text"), lit(" x2"))).as("fp")))
      graft.llm.Bloom.prefilteredSemiJoin(big, col("fp"),
          other, col("fp"), expectedItems = 200000L)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // --- the decontamination dual: exact anti join with the Bloom
    //     short-circuit — provably-clean rows (sketch says absent)
    //     bypass the shuffle entirely; only possible matches join.
    //     False positives re-checked by the exact anti join, so the
    //     kept set equals the oracle's NOT EXISTS ---
    "q117_bloom_decontaminate" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val big = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      val other = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(md5(col("text")).as("fp"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(3)) === 1)
          .select(md5(concat(col("text"), lit(" x2"))).as("fp")))
      graft.llm.Bloom.prefilteredAntiJoin(big, col("fp"),
          other, col("fp"), expectedItems = 200000L)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // --- Johnson-Lindenstrauss random projection (Achlioptas ±1
    //     matrix, md5-derived so any engine replays it): 32-dim
    //     hashed-BoW -> 8-dim, pure row-local arithmetic with the
    //     sign matrix embedded as a plan literal — zero shuffle. On
    //     integer BoW counts every component is an exact ±integer
    //     sum, hash-compared UNROUNDED. Output is EXPLODED to
    //     (doc_id, j, component) rows per the output contract — the
    //     driver's comparator cannot sort raw array cells ---
    "q118_random_projection" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val vecs = graft.llm.Featurize.hashedBow(docs, col("doc_id"),
        col("text"), dim = 32)
      vecs.select(col("doc_id"),
          graft.llm.Featurize.randomProject(col("v"), 32, 8).as("p"))
        .select(col("doc_id"),
          posexplode(col("p")).as(Seq("j", "component")))
        .withColumn("j", col("j").cast("long"))
        .orderBy(col("doc_id"), col("j"))
    },

    // --- full precision-recall sweep in ONE pass (every distinct
    //     score is a threshold; confusion counts are cumulative sums
    //     over the score-descending frame — no per-threshold rescan).
    //     Counts exact, ratios single divisions; thr rounded AFTER
    //     all computation in both engines ---
    "q119_pr_curve" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val scored = graft.llm.QualityModel.classify(docs, col("text"))
      graft.llm.Eval.prCurve(scored, col("source"), col("score"),
          coalesce(col("lang") === "en", lit(false)))
        .select(col("grp").as("source"), round(col("thr"), 6).as("thr"),
          col("tp"), col("fp"), col("precision"), col("recall"))
        .orderBy(col("source"), col("thr"))
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

    // --- token-BUDGET balanced subsampling: a 10k-token target split
    //     into equal per-source shares; per-source keep thresholds
    //     are exact-integer-ratio rationals floor'd to the md5 bucket
    //     space, membership a pure function of doc_id. Verified via
    //     per-source kept-doc/kept-token totals ---
    "q121_token_budget" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .withColumn("n_tok",
          graft.llm.TextAnalysis.tokenCount(col("text")))
      val kept = Pipelines.sampleToTokenBudget(docs, col("doc_id"),
        col("source"), col("n_tok"), budgetTokens = 10000L)
      kept.groupBy(col("source"))
        .agg(count(lit(1)).as("kept_docs"),
          sum(col("n_tok").cast("long")).as("kept_tokens"))
        .orderBy(col("source"))
    },

    // --- chi-squared feature selection: which hashed-BoW slots carry
    //     the lang=='en' label signal. Contingency cells are exact
    //     integer counts, chi2 one final division of exact integer
    //     products — hash-compared unrounded ---
    "q122_chi2_features" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val vecs = graft.llm.Featurize.hashedBow(docs, col("doc_id"),
          col("text"), dim = 32)
        .join(docs.select(col("doc_id"),
          coalesce(col("lang") === "en", lit(false)).as("y")),
          Seq("doc_id"))
      graft.llm.Eval.chiSquaredSlots(vecs, col("v"), col("y"))
        .orderBy(col("b"))
    },

    // --- calibration / reliability table for the quality classifier:
    //     mean predicted score vs empirical positive rate per decile
    //     bin. The mean rides the value-sorted fold (the q103/q110
    //     verification surface); counts and the rate are exact ---
    "q123_calibration" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val scored = graft.llm.QualityModel.classify(docs, col("text"))
      graft.llm.Eval.calibrationBins(scored, col("score"),
          coalesce(col("lang") === "en", lit(false)),
          deterministicMean = true)
        .orderBy(col("bin"))
    },

    // --- n-gram novelty: fraction of each doc's distinct 3-grams
    //     that are corpus-unique (df=1) — the boilerplate-vs-fresh-
    //     prose curation scalar. Engine joins on hashed shingles
    //     (hash equality ≡ gram equality); the oracle replays the
    //     string grams — counts agree exactly ---
    "q124_novelty" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      graft.llm.Curation.noveltyScores(docs, col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },

    // --- INCREMENTAL n-gram LM training: the 70% history trains a
    //     model persisted as parquet count tables; the 30% batch's
    //     counts are merged in WITHOUT re-reading history text (only
    //     the vocabulary-bounded count tables shuffle). Because
    //     integer count addition is associative, the merged model is
    //     bit-identical to a full retrain — the oracle TRAINS FROM
    //     SCRATCH on the whole corpus and the scores still
    //     hash-match ---
    "q125_lm_incremental" -> rounded("avg_logprob" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val hist = docs.filter(pmod(col("doc_id"), lit(10)) < 7)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 7)
      val tmp = Scratch.dir("graft_q125").toString
      graft.llm.LangModel.writeModel(
        graft.llm.LangModel.unigrams(hist, col("text")),
        graft.llm.LangModel.bigrams(hist, col("text")), tmp)
      val (u0, b0) = graft.llm.LangModel.readModel(spark, tmp)
      val uni = graft.llm.LangModel.mergeUnigrams(u0,
        graft.llm.LangModel.unigrams(batch, col("text")))
      val bi = graft.llm.LangModel.mergeBigrams(b0,
        graft.llm.LangModel.bigrams(batch, col("text")))
      graft.llm.LangModel.scoreDocs(
          docs.filter(pmod(col("doc_id"), lit(7)) === 0),
          col("doc_id"), col("text"), uni, bi,
          lambda = 0.5, k = 1.0, deterministicAvg = true)
        .orderBy(col("doc_id"))
    }),

    // --- streaming TRENDING tokens (windowed heavy hitters): the
    //     documents stream tumbles on a doc_id-derived event time,
    //     per-window token counts accumulate in the streaming agg
    //     (the state the 100 TB deployment keeps: windows × vocab,
    //     watermark-bounded); the top-5-per-window cut is the batch
    //     serving pass over the drained counts — chained aggregation
    //     is not a streaming operator, by Spark's own rules. Oracle
    //     replays both halves relationally; stream/batch parity is
    //     the hash gate ---
    "q126_stream_trending" -> { (spark, dir) =>
      val stream = EventStream.readTable(spark, dir, "documents")
      val toks = stream.select(
        timestamp_seconds(col("doc_id")).as("ts"),
        explode(graft.llm.TextAnalysis.tokens(col("text"))).as("w"))
      val counts = toks
        .groupBy(window(col("ts"), "100 seconds"), col("w"))
        .agg(count(lit(1)).as("c"))
      val drained = EventStream.runToCompletion(spark, counts)
      val rkW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("win_start"))
        .orderBy(col("c").desc, col("w"))
      drained
        .select(col("window.start").cast("long").as("win_start"),
          col("w"), col("c"))
        .withColumn("rk", row_number().over(rkW))
        .filter(col("rk") <= 5)
        .select(col("win_start"), col("rk"), col("w"), col("c"))
        .orderBy(col("win_start"), col("rk"))
    },

    // --- the FULL curation pipeline, one query, every stage an
    //     operator this library ships: exact dedup (md5 content,
    //     min-id survivor) -> quality-model filter (keep = score >=
    //     0.5) -> benchmark decontamination (8-gram overlap with the
    //     doc_id%97 eval set, hashed-shingle broadcast join) ->
    //     token-budget balanced sampling (10k tokens, equal source
    //     shares). The oracle replays all four stages relationally —
    //     per-source kept docs/tokens hash-match, which pins every
    //     intermediate frame ---
    "q127_pipeline" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val fp = docs.select(col("doc_id"), col("source"), col("text"),
        md5(col("text")).as("fp"))
      val keepIds = fp.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val s1 = fp.join(keepIds, Seq("doc_id"), "left_semi")
      val s2 = graft.llm.QualityModel.classify(s1, col("text"))
        .filter(col("keep"))
        .select(col("doc_id"), col("source"), col("text"))
      val evalSet = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      val s3 = graft.llm.Contamination.decontaminate(s2, col("doc_id"),
        col("text"), evalSet, col("text"), n = 8)
      val s3t = s3.withColumn("n_tok",
        graft.llm.TextAnalysis.tokenCount(col("text")))
      val kept = Pipelines.sampleToTokenBudget(s3t, col("doc_id"),
        col("source"), col("n_tok"), budgetTokens = 10000L)
      kept.groupBy(col("source"))
        .agg(count(lit(1)).as("kept_docs"),
          sum(col("n_tok").cast("long")).as("kept_tokens"))
        .orderBy(col("source"))
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

    // --- BPE ENCODE end-to-end: train 10 merge rules on the corpus
    //     word-frequency table (batchSize=4 exercises the batched
    //     trainer — this is the first cross-engine hash-compare of
    //     the batched==sequential law outside BpeSpec), then apply
    //     the rules to every word and emit the corpus token-frequency
    //     table under the trained vocabulary. The oracle RETRAINS the
    //     merges sequentially as 10 chained CTE rounds (pair count ->
    //     top-1 -> one replace() pass over a space-wrapped symbol
    //     string, whose non-overlapping left-to-right scan is exactly
    //     mergePair's greedy fold), then re-encodes. All counts are
    //     exact integers ---
    "q129_bpe_encode" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val merges = graft.llm.Bpe.train(spark, docs, col("text"),
        numMerges = 10, batchSize = 4)
      graft.llm.Bpe.wordFreqs(docs, col("text"))
        .select(explode(graft.llm.Bpe.applyMerges(
            graft.llm.Bpe.initSymbols(col("word")), merges)).as("token"),
          col("freq"))
        .groupBy(col("token")).agg(sum(col("freq")).as("tok_freq"))
        .orderBy(col("tok_freq").desc, col("token").asc)
        .limit(30)
    },

    // --- MMR diversified top-k: relevance = cosine to the vec_id=0
    //     query embedding, candidates = exact top-64, then 8 greedy
    //     maximal-marginal-relevance picks (λ=0.5 — IEEE-exact in both
    //     engines, so score arithmetic is exact products on
    //     bit-identical cosines). The oracle replays the greedy loop
    //     as chained CTEs; selection compares UNROUNDED, display
    //     rounds to 6 ---
    "q130_mmr_select" -> rounded("rel" -> 6, "mmr" -> 6)({ (spark, dir) =>
      val emb = tbl(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv"))
      val cands = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"), col("qv"))
        .withColumn("rel", Similarity.cosine(col("v"), col("qv")))
        .drop("qv")
        .orderBy(col("rel").desc, col("vec_id").asc).limit(64)
      Similarity.mmrSelect(cands, col("vec_id"), col("v"), col("rel"),
          k = 8)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("rank"))
    }),

    // --- mixture MATERIALIZATION: q100's temperature weights applied
    //     as an actual training mix — every source lands on exactly
    //     target_docs rows via whole-epoch repeats plus a
    //     deterministic md5-ordered fractional slice (budget 5000:
    //     sources upsample at sf0.001, downsample at sf0.1 — both
    //     regimes hash-compared). id_sum pins WHICH docs were chosen
    //     and how often, not just how many ---
    "q131_mixture_materialize" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val w = Pipelines.mixtureWeights(docs, col("source"),
        temperature = 0.5, budget = 5000L)
      Pipelines.materializeMixture(docs, col("doc_id"), col("source"), w)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("id")).as("n_docs_kept"),
          max(col("copy")).cast("int").as("max_copy"),
          sum(col("id")).as("id_sum"))
        .orderBy(col("source"))
    },

    // --- CONTAINMENT dedup signal: near-SUBSET pairs (prefix-
    //     truncated variants of every 5th doc are injected — their
    //     shingles are a strict subset of the original's, so
    //     cont_a_in_b lands on exactly 1.0 where Jaccard would sit
    //     well below any threshold). Ratios are exact integer
    //     divisions, hash-compared unrounded; the oracle mines the
    //     same df-capped gram space with string n-grams ---
    "q132_containment" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          col("text").substr(lit(1),
            greatest(length(col("text")) - 40, lit(1))).as("text"))
      graft.llm.Dedup.containmentPairs(docs.unionByName(variants),
          col("doc_id"), col("text"),
          shingleN = 3, threshold = 0.9, maxDf = 64)
        .orderBy(col("id_a"), col("id_b"))
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

    // --- collocation mining: adjacent-token pairs ranked by lift =
    //     c_ab·N/(c_a·c_b) — PMI's ordering via exact products, no
    //     libm log in the compare. Top 25 (lift desc, a, b) with pair
    //     count >= 5 ---
    "q134_collocations" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      graft.llm.TextAnalysis.collocations(docs, col("text"),
          minCount = 5)
        .orderBy(col("lift").desc, col("a").asc, col("b").asc)
        .limit(25)
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

    // --- STREAMING funnel with batch parity: the event log drained
    //     through the order-insensitive keyed state op, per-user
    //     deepest-step results re-aggregated to the q133 summary —
    //     one oracle serves both the batch and streaming forms ---
    "q138_stream_funnel" -> { (spark, dir) =>
      val steps = Seq("view", "click", "purchase")
      val ev = EventStream.readTable(spark, dir, "events")
      val reached = EventStream.streamingFunnel(ev, "user_id", "ts",
        "event_type", steps)
      val fin = EventStream.runToCompletion(spark, reached,
          mode = "update")
        .groupBy(col("user_id"))
        .agg(max(col("reached")).as("reached"))
      val perStep = fin.filter(col("reached") >= 1)
        .select(explode(sequence(lit(1), col("reached"))).as("step_ix"))
        .groupBy(col("step_ix")).agg(count(lit(1)).as("n_users"))
      val name = steps.zipWithIndex.foldLeft(lit(null).cast("string")) {
        case (acc, (s, i)) =>
          when(col("step_ix") === i + 1, lit(s)).otherwise(acc)
      }
      val first = perStep.filter(col("step_ix") === 1)
        .select(col("n_users").as("__n1"))
      perStep.crossJoin(broadcast(first))
        .select(col("step_ix"), name.as("step"), col("n_users"),
          (col("n_users").cast("double") / col("__n1").cast("double"))
            .as("conv"))
        .orderBy(col("step_ix"))
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

    // --- per-source boilerplate stripping (CCNet-style): docs get a
    //     synthetic nav header + copyright footer shared across their
    //     source (and a 25%-frequency subscribe line that must SURVIVE
    //     the 50% bar); the census explodes distinct lines only, the
    //     strip is a row-local array filter against a broadcast
    //     per-source boilerplate list — document text never shuffles ---
    "q140_boilerplate" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val multi = docs.select(col("doc_id"), col("source"),
        concat(
          lit("== "), col("source"), lit(" navigation ==\n"),
          col("text"), lit("\n"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit("subscribe to "), col("source"), lit("\n")))
            .otherwise(lit("")),
          lit("copyright "), col("source")).as("text"))
      graft.llm.Pipelines.stripBoilerplate(multi, col("doc_id"),
          col("source"), col("text"), minDocFrac = 0.5, minDocs = 2)
        .orderBy(col("doc_id"))
    },

    // --- PageRank centrality over the parts-ordered-together graph:
    //     3 fixed iterations in DETERMINISTIC mode (per-node sums fold
    //     the value-sorted contribution list, so every iteration is
    //     bit-exact across engines — the q103 trick applied to a graph
    //     loop); damping stays 0.85 with the oracle computing
    //     1 - CAST(0.85 AS DOUBLE) so both engines subtract the same
    //     IEEE double. Top 50 by rounded rank, node tiebreak ---
    "q141_pagerank" -> { (spark, dir) =>
      // part universe sampled 1-in-4: a pair survives iff BOTH ends
      // do (~1/16 of edges), keeping the bench-scale graph in the
      // tens of thousands of edges while exercising the same loop
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0)
      val edges = graft.operators.Graph.coOccurrenceEdges(li,
        col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.pageRank(edges, iterations = 3,
          damping = 0.85, deterministic = true)
        .select(col("node"), round(col("pr"), 9).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(50)
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

    // --- q143's loop closed as a STREAM: the change log drains as
    //     three time-ordered micro-batches (file mtimes pin the
    //     order), each advancing the parquet-persisted dimension via
    //     mergeType2 with the materialize-then-swap discipline; the
    //     oracle is STILL the full rebuild — three chained merges must
    //     reproduce the batch dimension bit-for-bit ---
    "q144_stream_scd2" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
      val tmp = Scratch.dir("graft_q144").toString
      val cuts = Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00")
        .map(s => lit(s).cast("timestamp"))
      val parts = Seq(
        ev.filter(col("ts") < cuts(0)),
        ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
        ev.filter(col("ts") >= cuts(1)))
      // explicit mtime stamps pin batch order with no sleeps
      EventStream.writeOrderedBatches(parts, tmp + "/src")
      val schema = spark.read.parquet(tmp + "/src").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp + "/src")
      graft.operators.Scd.streamingMergeType2(spark, stream,
          col("user_id"), col("ts"), col("event_type"),
          tmp + "/dim", tmp + "/cp")
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

    // --- weighted PageRank: co-order STRENGTH (shared-order counts)
    //     splits each part's rank proportionally instead of evenly —
    //     same deterministic-fold loop as q141, 2 iterations ---
    "q146_pagerank_weighted" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0)
      val edges = graft.operators.Graph.coOccurrenceEdgesWeighted(li,
        col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.pageRank(edges, iterations = 2,
          damping = 0.85, deterministic = true, weighted = true)
        .select(col("node"), round(col("pr"), 9).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(50)
    },

    // --- per-node triangle counts over the same co-order graph:
    //     canonical a<b edges, wedge self-join on the lower endpoint,
    //     one closing equi-join — exact integers end to end ---
    "q147_triangles" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0)
      val edges = graft.operators.Graph.coOccurrenceEdges(li,
        col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.triangleCounts(edges)
        .orderBy(col("node"))
    },

    // --- sorted-neighborhood blocking over near-dup titles: variants
    //     share their source doc's prefix, so the (key, id) sort puts
    //     them adjacent within the key-prefix block; candidates within
    //     window 3 score full trigram Jaccard (exact set ratio).
    //     The third candidate-generation family (sort order) next to
    //     LSH bands and SemDeDup cells ---
    "q148_sorted_neighborhood" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val base = docs.unionByName(variants)
      val pairs = graft.llm.Dedup.sortedNeighborhoodPairs(base,
        col("doc_id"), lower(substring(trim(col("text")), 1, 24)),
        window = 3, blockPrefix = 8)
      // hashed shingles ride the fused native kernel; array_intersect/
      // array_union dedup internally, so hash-set Jaccard == the
      // oracle's string-trigram Jaccard (the q43 equivalence)
      val sh = base.select(col("doc_id"),
        graft.llm.TextAnalysis.shingleHashes(col("text"), 3).as("s"))
      pairs
        .join(sh.select(col("doc_id").as("id_a"), col("s").as("sa")),
          Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("s").as("sb")),
          Seq("id_b"))
        .withColumn("jaccard",
          round(graft.llm.Dedup.jaccard(col("sa"), col("sb")), 6))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // --- TEXTBOOK PageRank (dangling-mass redistribution) over a
    //     bipartite customer→order edge list where EVERY order node
    //     is a sink: without the redistribution its received mass
    //     would leak each round and ranks drift off-standard. The
    //     node set is src ∪ dst; deterministic fold keeps the per-
    //     round dangling sum bit-exact for the oracle's replay ---
    "q149_pagerank_dangling" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val edges = orders.select(col("o_custkey").as("src"),
        (col("o_orderkey") + 10000000L).as("dst"))
      graft.operators.Graph.pageRank(edges, iterations = 3,
          damping = 0.85, deterministic = true, danglingMass = true)
        .select(col("node"), round(col("pr"), 12).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(100)
    },

    // --- EXACT all-pairs Jaccard via PREFIX FILTERING (AllPairs/
    //     PPJoin): q43's corpus with NO df cap — the oracle computes
    //     the full uncapped truth and the prefix-filtered path must
    //     equal it exactly (the filter is lossless by pigeonhole;
    //     the df-cap it replaces silently drops hot shingles) ---
    "q150_prefix_filter_jaccard" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val truncated = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(1))).as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(truncated)
      val staged = corpus.select(col("doc_id").as("id"),
        TextAnalysis.shingleHashes(col("text"), 3).as("s"))
      Dedup.prefixFilterJaccardPairs(staged, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },

    // --- reciprocal-rank fusion of the q81 tf-idf and q83 BM25
    //     rankings (same 3-term query): each input is its TOP-200
    //     list (the real RRF shape — fusing retrieved lists, and the
    //     orderBy().limit() is a distributed TakeOrdered, so the rank
    //     window runs over 200 rows, never the corpus); ranks over
    //     ROUNDED scores so a libm last-ULP can never flip an order
    //     across engines; the fused score is a fixed-order sum of
    //     exact IEEE divisions, hash-compared UNROUNDED ---
    "q151_rank_fusion" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val terms = Seq("spark", "query", "vector")
      val t = graft.llm.Relevance.tfidfScores(docs, col("doc_id"),
          col("text"), terms)
        .select(col("id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("id").asc).limit(200)
      val b = graft.llm.Relevance.bm25Scores(docs, col("doc_id"),
          col("text"), terms)
        .select(col("id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("id").asc).limit(200)
      graft.llm.Relevance.reciprocalRankFusion(Seq(t, b), k = 60)
        .select(col("id").as("doc_id"),
          col("rank_0").as("rank_tfidf"), col("rank_1").as("rank_bm25"),
          col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(50)
    },

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

    // --- positional phrase search: a marker sentence is appended to
    //     every 7th doc (self-constructed, so testdata regeneration
    //     can't invalidate the phrase), the corpus is indexed once as
    //     (id, pos, tok) postings, and the 3-token phrase resolves by
    //     aligned-offset postings joins anchored at the rarest token.
    //     Every 21st doc gets the marker TWICE — occurrence counts,
    //     not just membership ---
    "q155_phrase_search" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val marker = lit(" needle in the haystack marker")
      val corpus = docs.select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0, marker)
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(21)) === 0, marker)
            .otherwise(lit(""))).as("text"))
      val idx = graft.llm.Phrase.postings(corpus, col("doc_id"),
        col("text"))
      graft.llm.Phrase.phraseOccurrences(idx,
          Seq("needle", "in", "the"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // --- stream-stream LEFT OUTER interval join: views with no
    //     purchase by the same user within 30 minutes emit with a
    //     null right side once the watermark passes their interval.
    //     The drain needs TWO things the inner join (q89) does not:
    //     the whole real backlog in ONE micro-batch (single file +
    //     maxFilesPerTrigger=1 — outer parity breaks if a match lands
    //     after its view's interval passed the watermark) and a
    //     far-future sentinel file per side so the FINAL watermark
    //     passes every view's upper bound (outer state is not flushed
    //     at stream end). Watermark is small (real out-of-orderness),
    //     NOT backlogSpanWatermark — see leftOuterIntervalJoin docs.
    "q156_stream_outer_join" -> { (spark, dir) =>
      val events = EventStream.normalizeEventTime(
          tbl(spark, dir, "events"))
        .filter(pmod(col("user_id"), lit(3)) === 0 &&
          col("event_type").isin("view", "purchase"))
        .select(col("ts"), col("event_type"), col("user_id"),
          col("event_id"))
      val src = Scratch.dir("graft_q156src")
        .toString
      events.coalesce(1).write.mode("append").parquet(src)
      // sentinels: 2024-03-01T00:00Z, far past every real event; the
      // negative user ids can never join and are filtered from output
      spark.createDataFrame(Seq(
          (new java.sql.Timestamp(1709251200000L), "view", -1L, -1L),
          (new java.sql.Timestamp(1709251200000L), "purchase", -2L, -2L)))
        .toDF("ts", "event_type", "user_id", "event_id")
        .coalesce(1).write.mode("append").parquet(src)
      def stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val views = stream.filter(col("event_type") === "view")
        .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
          col("event_id").as("a_id"))
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      val joined = EventStream.leftOuterIntervalJoin(
        views, "a_ts", purchases, "b_ts",
        col("a_user") === col("b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("interval 30 minutes"),
        watermark = "1 second")
      EventStream.runToCompletion(spark, joined, mode = "append")
        .filter(col("a_user") >= 0)
        .agg(count(lit(1)).as("n_rows"),
          count(col("b_ts")).as("n_matched"),
          sum(when(col("b_ts").isNull, 1L).otherwise(0L))
            .as("n_unmatched"),
          count_distinct(col("a_user")).as("n_users"),
          min(when(col("b_ts").isNull, col("a_id")))
            .as("min_unmatched_id"))
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

    // --- boolean postings retrieval (must / mustNot) over the same
    //     positional index as q155: rarest-first semi-join
    //     intersection, anti-join exclusions last (Phrase
    //     .booleanSearch) ---
    "q160_boolean_search" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val idx = graft.llm.Phrase.postings(docs, col("doc_id"),
        col("text"))
      graft.llm.Phrase.booleanSearch(idx,
          must = Seq("spark", "query"), mustNot = Seq("vector"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

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

    // --- q93's redelivery drain on the MODERN dedup API
    //     (dropDuplicatesWithinWatermark): replayed keys suppress even
    //     though only the KEY matches (no ts in the dedup key), and
    //     the suppression state expires at first-seen + delay instead
    //     of growing with every key ever seen. Replayed rows are
    //     either within the horizon (deduped) or behind the watermark
    //     (late-dropped) — both roads lead to the batch-distinct
    //     oracle. ---
    "q172_stream_dedup_modern" -> rounded("sum_value" -> 4)({
      (spark, dir) =>
        val events = tbl(spark, dir, "events")
        val stage = Scratch.dir("graft_q172").toString
        def stageBlock(df: DataFrame, name: String, modMs: Long): Unit = {
          val tmp = s"$stage/_$name"
          df.coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dest = new java.io.File(s"$stage/$name.parquet")
          java.nio.file.Files.move(part.toPath, dest.toPath)
          dest.setLastModified(modMs)
        }
        stageBlock(events, "block1", 1000000L)
        stageBlock(events.filter(col("event_id") % 5 === 0), "block2",
          2000000L)
        val stream = spark.readStream
          .schema(spark.read.parquet(s"$stage/block1.parquet").schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "block*.parquet")
          .parquet(stage)
        val deduped = EventStream.dedupByKeyWithinWatermark(stream,
          "ts", "1 day", "event_id")
        EventStream.runToCompletion(spark, deduped, mode = "append")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
          .orderBy(col("event_type"))
    }),

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

    // --- STREAMING EWMA with exact batch parity: the event log
    //     drains as three CHRONOLOGICAL blocks (the ordered-batch
    //     discipline streamingEwma's contract requires), keyed state
    //     folds each batch in (ts, id) order, and the final update
    //     per key hash-matches q157's batch fold — the same
    //     stream-equals-batch differential oracle as q113/q144. ---
    "q178_stream_ewma" -> { (spark, dir) =>
      val events = EventStream.normalizeEventTime(
          tbl(spark, dir, "events"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value"))
      val b = events.agg(
          min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
        .collect()(0)
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val cut1 = lo + (hi - lo) / 3
      val cut2 = lo + 2 * ((hi - lo) / 3)
      val us = unix_micros(col("ts"))
      val src = Scratch.dir("graft_q178")
        .toString + "/ev"
      EventStream.writeOrderedBatches(Seq(
        events.filter(us <= cut1),
        events.filter(us > cut1 && us <= cut2),
        events.filter(us > cut2)), src)
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val updates = EventStream.streamingEwma(stream, "user_id", "ts",
        "event_id", "value")
      EventStream.runToCompletion(spark, updates, mode = "update")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("ewma"))).as("__f"))
        .select(col("user_id"), col("__f.n_events").as("n_events"),
          col("__f.ewma").as("ewma"))
        .orderBy(col("user_id"))
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

    // --- local clustering coefficient over the q147 co-occurrence
    //     graph: 2·tri/(d·(d−1)) per node — exact integer counts
    //     (degree-oriented triangle enumeration) + one pinned-order
    //     IEEE division, hash-compared UNROUNDED; degree-<2 nodes
    //     report 0.0 by convention. ---
    "q184_clustering_coeff" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0)
      val edges = graft.operators.Graph.coOccurrenceEdges(li,
        col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.clusteringCoefficients(edges)
        .orderBy(col("node"))
    },

    // --- STREAM-STATIC dimensional enrichment: purchases stream
    //     against the SCD2 state dimension built from each user's
    //     NON-purchase history (Scd.buildType2), matched as-of the
    //     purchase time via the interval condition — a stateless
    //     stream-static left join (no watermark, no state store), the
    //     warehouse enrichment pattern in continuous form. The final
    //     count-by-state runs on the drained sink, and the oracle
    //     rebuilds dim + interval-joins in SQL. ---
    "q185_stream_asof_enrich" -> { (spark, dir) =>
      val ev = EventStream.normalizeEventTime(tbl(spark, dir, "events"))
      val dim = graft.operators.Scd.buildType2(
        ev.filter(col("event_type") =!= "purchase"),
        col("user_id"), col("ts"), col("event_type"))
      val stream = EventStream.readTable(spark, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      val enriched = graft.operators.Scd.asOfEnrich(stream,
        col("user_id"), col("ts"), dim)
      EventStream.runToCompletion(spark, enriched, mode = "append")
        .groupBy(col("attr").as("state"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("state"))
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

    // --- per-doc keyword extraction: top-3 terms by the exact
    //     tf·N/df relevance ratio (same ORDERING family as tf-idf —
    //     x↦ln x is monotone — but computed as one exact-integer
    //     division, so no libm anywhere near the ranking). The rank
    //     window is DOC-partitioned over that doc's own distinct
    //     terms; df and N are broadcast-sized census frames. ---
    "q187_keywords" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val scored = tf.join(df, Seq("tok"))
        .crossJoin(broadcast(n))
        .withColumn("score",
          (col("tf") * col("__n")).cast("double") /
            col("df").cast("double"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"), col("score"))
        .orderBy(col("doc_id"), col("rank"))
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

    // --- FULL OUTER stream-stream interval join: q156's harness with
    //     BOTH sides' unmatched rows flushing after the sentinel —
    //     completes the supported stream-stream matrix (inner q89 /
    //     left q156 / full here; Spark has no stream-stream
    //     semi/anti). Purchases with no view in the PRECEDING 30
    //     minutes surface as null-left rows — the orphan-detection
    //     readout an at-least-once pipeline monitors. ---
    "q189_stream_full_outer" -> { (spark, dir) =>
      val events = EventStream.normalizeEventTime(
          tbl(spark, dir, "events"))
        .filter(pmod(col("user_id"), lit(3)) === 0 &&
          col("event_type").isin("view", "purchase"))
        .select(col("ts"), col("event_type"), col("user_id"),
          col("event_id"))
      val src = Scratch.dir("graft_q189src")
        .toString
      events.coalesce(1).write.mode("append").parquet(src)
      spark.createDataFrame(Seq(
          (new java.sql.Timestamp(1709251200000L), "view", -1L, -1L),
          (new java.sql.Timestamp(1709251200000L), "purchase", -2L, -2L)))
        .toDF("ts", "event_type", "user_id", "event_id")
        .coalesce(1).write.mode("append").parquet(src)
      def stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val views = stream.filter(col("event_type") === "view")
        .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
          col("event_id").as("a_id"))
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      val joined = EventStream.fullOuterIntervalJoin(
        views, "a_ts", purchases, "b_ts",
        col("a_user") === col("b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("interval 30 minutes"),
        watermark = "1 second")
      EventStream.runToCompletion(spark, joined, mode = "append")
        .filter(coalesce(col("a_user"), lit(0L)) >= 0 &&
          coalesce(col("b_user"), lit(0L)) >= 0)
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("a_ts").isNotNull && col("b_ts").isNotNull, 1L)
            .otherwise(0L)).as("n_matched"),
          sum(when(col("b_ts").isNull, 1L).otherwise(0L))
            .as("n_unmatched_views"),
          sum(when(col("a_ts").isNull, 1L).otherwise(0L))
            .as("n_orphan_purchases"))
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

    // --- item-item collaborative similarity (the co-purchase
    //     recommender): parts sharing an order score cosine =
    //     co/√(dᵢ·dⱼ) — one exact integer co-occurrence count, two
    //     broadcast degree lookups, one IEEE sqrt (correctly rounded
    //     in both engines) — top-3 neighbors per item via an
    //     item-partitioned rank window. Unrounded hash match. ---
    "q193_item_similarity" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(8)) === 0)
      val baskets = li.select(col("l_orderkey").as("g"),
        col("l_partkey").as("i")).distinct()
      val deg = baskets.groupBy(col("i")).agg(count(lit(1)).as("d"))
      val pairs = baskets.join(
          baskets.select(col("g"), col("i").as("j")), Seq("g"))
        .filter(col("i") < col("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("co"))
      val sym = pairs.unionByName(pairs.select(col("j").as("i"),
        col("i").as("j"), col("co")))
      val scored = sym
        .join(broadcast(deg.select(col("i"), col("d").as("__di"))),
          Seq("i"))
        .join(broadcast(deg.select(col("i").as("j"),
          col("d").as("__dj"))), Seq("j"))
        .withColumn("sim", col("co").cast("double") /
          sqrt((col("__di") * col("__dj")).cast("double")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("i")).orderBy(col("sim").desc, col("j").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("i").as("item"), col("rank"),
          col("j").as("neighbor"), col("co"), col("sim"))
        .orderBy(col("item"), col("rank"))
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

    // --- corrupt-record quarantine (robust ingestion): a mixed
    //     JSON-lines feed where every 7th line is truncated;
    //     PERMISSIVE from_json nulls the malformed rows and the
    //     census groups them under the null key — the
    //     quarantine-don't-crash contract every lake ingest needs,
    //     mirrored by json_valid in the oracle. Row-local except the
    //     tiny census aggregate. ---
    "q196_json_quarantine" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val lines = ev.select(
        when(pmod(col("event_id"), lit(7)) === 0,
          concat(lit("{\"k\": "), col("event_id")))
          .otherwise(concat(lit("{\"k\": "), col("event_id"),
            lit(", \"t\": \""), col("event_type"), lit("\"}")))
          .as("line"))
      lines
        .withColumn("__j", from_json(col("line"),
          new StructType().add("k", LongType).add("t", StringType)))
        .select(col("__j.t").as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("n"))
        .orderBy(col("t"))
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

    // --- funnel step-gap quantiles (where do users stall): per-user
    //     reach times from Funnel.reachTimes pivoted to legs, then
    //     p50/p90 per leg via ExactQuantile's distributed rank
    //     selection — integer microseconds, leg-partitioned
    //     everything; composes the funnel and quantile operators the
    //     way a product dashboard actually does. ---
    "q204_funnel_gaps" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val rt = graft.operators.Funnel.reachTimes(ev, col("user_id"),
        col("ts"), col("event_type"), Seq("view", "click", "purchase"))
      val us = unix_micros(col("t").cast("timestamp"))
      val byUser = rt.groupBy(col("user"))
        .agg(max(when(col("step_ix") === 1, us)).as("__t1"),
          max(when(col("step_ix") === 2, us)).as("__t2"),
          max(when(col("step_ix") === 3, us)).as("__t3"))
      val gaps = byUser.select(explode(array(
          struct(lit("view->click").as("leg"),
            (col("__t2") - col("__t1")).as("gap")),
          struct(lit("click->purchase").as("leg"),
            (col("__t3") - col("__t2")).as("gap")))).as("g"))
        .select(col("g.leg").as("leg"), col("g.gap").as("gap"))
        .filter(col("gap").isNotNull)
      val p50 = graft.operators.ExactQuantile.quantileDisc(gaps,
          col("leg"), col("gap"), 0.5)
        .select(col("grp").as("leg"), col("n").as("n_users"),
          col("q").cast("long").as("p50_us"))
      val p90 = graft.operators.ExactQuantile.quantileDisc(gaps,
          col("leg"), col("gap"), 0.9)
        .select(col("grp").as("leg"), col("q").cast("long").as("p90_us"))
      p50.join(p90, Seq("leg")).orderBy(col("leg"))
    },

    // --- multi-source BFS reach ("blast radius") over the part
    //     co-purchase graph: seeds at hop 0, min-hop per node, capped
    //     depth. The engine runs frontier iteration (one edge equi-
    //     join + one visited anti-join per round, operators/
    //     Graph.bfsHops) so per-round work is |frontier|·deg — the
    //     path-multiplicity blowup lives only in the oracle's
    //     recursive CTE, which dedups (node, hop) pairs per step. ---
    "q205_bfs_hops" -> { (spark, dir) =>
      // q141's 1-in-4 part sampling: same frontier loop, bench-scale
      // edge list (the full sf0.1 graph is 2.4M edges and 8+ s)
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0)
      val edges = graft.operators.Graph.coOccurrenceEdges(li,
        col("l_orderkey"), col("l_partkey"))
      val seeds = edges.select(col("src").as("node"))
        .filter(col("node") % 100 === 0).distinct()
      graft.operators.Graph.bfsHops(edges, seeds, maxHops = 3)
        .orderBy(col("node"))
    },

    // --- common-neighbor link prediction ("frequently bought with
    //     the same things") over the REPEAT co-purchase graph (pairs
    //     sharing >= 2 distinct orders — the w-filter keeps the graph
    //     sparse at every scale: sum deg^2 is ~120k at sf0.001 and
    //     FALLS with sf as repeat pairs thin out). Non-adjacent pairs
    //     ranked by shared-neighbor count; neighborhood Jaccard as an
    //     exact integer ratio. maxWedgeDegree=40 exercises the hub
    //     cap (binds only at sf0.001), mirrored exactly in the
    //     oracle; surviving pairs keep UNCAPPED exact degrees. ---
    "q206_link_predict" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val edges = graft.operators.Graph.coOccurrenceEdgesWeighted(li,
          col("l_orderkey"), col("l_partkey"))
        .filter(col("w") >= 2).select(col("src"), col("dst"))
      graft.operators.Graph.linkPrediction(edges, topK = 100,
          maxWedgeDegree = Some(40L))
        .orderBy(col("jac_num").desc, col("x"), col("y"))
    },

    // --- word-packed bitmap index for audience overlap: which buyer
    //     populations do order priorities share? Membership packs 64
    //     customers per word (operators/Bitmap), so the pairwise
    //     intersection joins |sets|²·(members/64) word rows instead
    //     of member-grain pairs, and every count is exact-integer
    //     popcount — the segment-overlap matrix at 1/64th the
    //     bandwidth of a distinct-pair self-join. ---
    "q207_bitmap_overlap" -> { (spark, dir) =>
      val o = tbl(spark, dir, "orders")
      val words = graft.operators.Bitmap.bitmapWords(o,
        col("o_orderpriority"), col("o_custkey"))
      graft.operators.Bitmap.overlap(words)
        .orderBy(col("sa"), col("sb"))
    },

    // --- RFM segmentation: per-customer recency (days since last
    //     order vs the corpus max date), frequency (order count),
    //     monetary (exact cents) -> quintile scores via ntile(5)
    //     WITHIN the customer's market segment (entity-partitioned
    //     windows with a custkey tiebreak — deterministic and never
    //     global), rolled up to cell counts. ntile is SQL-standard
    //     identical across engines given the same total order. ---
    "q208_rfm" -> { (spark, dir) =>
      val o = tbl(spark, dir, "orders")
      val c = tbl(spark, dir, "customer")
      val ref = o.agg(max(to_date(col("o_orderdate"))).as("__ref"))
      val per = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("__last"),
          count(lit(1)).as("__f"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("__m"))
        .join(c.select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment")), Seq("o_custkey"))
        .crossJoin(broadcast(ref))
        .withColumn("__r", datediff(col("__ref"), col("__last")))
      val w = (m: Column) => org.apache.spark.sql.expressions.Window
        .partitionBy(col("segment")).orderBy(m, col("o_custkey"))
      per
        .withColumn("r_q", ntile(5).over(w(col("__r"))))
        .withColumn("f_q", ntile(5).over(w(col("__f"))))
        .withColumn("m_q", ntile(5).over(w(col("__m"))))
        .groupBy(col("segment"), col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("__m")).as("sum_m_cents"))
        .orderBy(col("segment"), col("r_q"), col("f_q"), col("m_q"))
    },

    // --- Benford first-digit audit (fraud/data-entry screening):
    //     leading-digit distribution of the two money columns, as
    //     exact integer counts plus the per-source total (the
    //     log10-expected curve is analysis-side — keeping the output
    //     integer keeps the hash-compare exact). The share window
    //     runs over the 18-row digit census, not the corpus. ---
    "q209_benford" -> { (spark, dir) =>
      def digits(df: DataFrame, c: String, src: String) =
        df.select(substring(floor(col(c)).cast("long").cast("string"),
            1, 1).cast("int").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .withColumn("source", lit(src))
      val g = digits(tbl(spark, dir, "orders"), "o_totalprice",
          "orders.o_totalprice")
        .unionByName(digits(tbl(spark, dir, "lineitem"),
          "l_extendedprice", "lineitem.l_extendedprice"))
      g.withColumn("n_total", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))))
        .select(col("source"), col("digit"), col("n"), col("n_total"))
        .orderBy(col("source"), col("digit"))
    },

    // --- CUSUM change detection on daily revenue per region: the
    //     max(0, s+d) recursion via its closed form (prefix sum minus
    //     running min — two windows sharing ONE region-partitioned
    //     sort, operators/ChangeDetect). Deviations stay integer
    //     (n·cents − total), so the n×-scaled statistic hash-compares
    //     exactly; every threshold crossing/reset is preserved. ---
    "q210_cusum" -> { (spark, dir) =>
      val o = tbl(spark, dir, "orders")
      val c = tbl(spark, dir, "customer")
      val n = tbl(spark, dir, "nation")
      val r = tbl(spark, dir, "region")
      val daily = o
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      graft.operators.ChangeDetect.cusum(daily, col("region"),
          col("day"), col("cents"))
        .select(col("k").as("region"), col("o").as("day"), col("cusum"))
        .orderBy(col("region"), col("day"))
    },

    // --- streaming CUSUM against a FIXED target (the online form —
    //     a stream can't center on a mean it hasn't seen): keyed
    //     state is three longs (n, p, min p); the final update per
    //     user equals the batch windowed closed form over the full
    //     log, which is exactly what the oracle computes. ---
    "q211_stream_cusum" -> { (spark, dir) =>
      val events = EventStream.normalizeEventTime(
          tbl(spark, dir, "events"))
        .select(col("user_id"), col("ts"), col("event_id"),
          (round(col("value") * 100).cast("long") - 5000).as("d"))
      val us = unix_micros(col("ts"))
      val b = events.agg(min(us).as("lo"), max(us).as("hi"))
        .collect()(0)
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val cut1 = lo + (hi - lo) / 3
      val cut2 = lo + 2 * ((hi - lo) / 3)
      val src = Scratch.dir("graft_q211")
        .toString + "/ev"
      EventStream.writeOrderedBatches(Seq(
        events.filter(us <= cut1),
        events.filter(us > cut1 && us <= cut2),
        events.filter(us > cut2)), src)
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val updates = EventStream.streamingCusum(stream, "user_id", "ts",
        "event_id", "d")
      EventStream.runToCompletion(spark, updates, mode = "update")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("cusum"))).as("__f"))
        .select(col("user_id"), col("__f.n_events").as("n_events"),
          col("__f.cusum").as("cusum"))
        .orderBy(col("user_id"))
    },

    // --- deterministic global shuffle + fixed-size training shards:
    //     every doc's exact global rank under the (md5(seed:id), id)
    //     order and its contiguous shard — WITHOUT a global window
    //     (256 hash-prefix range-buckets + a triangular census
    //     prefix-sum + bucket-partitioned row_number, llm/Sharding).
    //     The oracle replays the rank with a plain global row_number
    //     — equality proves the bucket decomposition is exact. ---
    "q212_shuffle_shards" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      graft.llm.Sharding.globalShuffleShards(docs, col("doc_id"),
          seed = "s42", shardSize = 64L)
        .select(col("id").as("doc_id"), col("h"), col("rn"),
          col("shard"))
        .orderBy(col("rn"))
    },

    // --- hash-based negative sampling for contrastive pairs: 3
    //     pseudo-random English negatives per non-English query doc,
    //     via bucket-representative hashing (pool bucketed by md5,
    //     min-hash member represents; query picks buckets by
    //     md5(seed:q:i)) — no RNG, no pool-wide ranking; rerun- and
    //     repartition-stable by construction (llm/Sharding). ---
    "q213_negative_sampling" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      graft.llm.Sharding.negativeSamples(
          docs.filter(col("lang") =!= "en"), col("doc_id"),
          docs.filter(col("lang") === "en"), col("doc_id"),
          k = 3, buckets = 64, seed = "s7")
        .orderBy(col("qid"), col("i"))
    },

    // --- Holt double-exponential smoothing (level + trend) per user,
    //     α = β = 1/2: the EWMA fold's trend-aware sibling. Both
    //     state updates are sums halved (×0.5 is exponent
    //     arithmetic), evaluated in a pinned order, so the final
    //     (level, trend, one-step forecast) hash-compares UNROUNDED
    //     against the oracle's list_reduce over the same
    //     (ts, event_id)-sorted sequence. ---
    "q214_holt" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("value")))).as("__seq"))
        .withColumn("__vals", expr("transform(__seq, x -> x.value)"))
        .withColumn("__st", expr("""
          aggregate(slice(__vals, 2, size(__vals)),
            array(element_at(__vals, 1), cast(0.0 as double)),
            (s, x) -> array(
              ((x + element_at(s, 1)) + element_at(s, 2)) / 2.0,
              ((((x + element_at(s, 1)) + element_at(s, 2)) / 2.0
                 - element_at(s, 1)) + element_at(s, 2)) / 2.0))"""))
        .select(col("user_id"), col("n_events"),
          element_at(col("__st"), 1).as("level"),
          element_at(col("__st"), 2).as("trend"),
          (element_at(col("__st"), 1) + element_at(col("__st"), 2))
            .as("forecast"))
        .orderBy(col("user_id"))
    },

    // --- smoothed target encoding of p_brand by line revenue (the
    //     micci-barreca tabular-ML feature): category mean shrunk
    //     toward the global mean with pseudo-count m=100. Integer
    //     cent sums + three pinned-order IEEE ops -> unrounded hash
    //     gate (llm/Featurize.targetEncode). ---
    "q215_target_encoding" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val p = tbl(spark, dir, "part")
      val joined = li.join(p, col("l_partkey") === col("p_partkey"))
      graft.llm.Featurize.targetEncode(joined, col("p_brand"),
          round(col("l_extendedprice") * 100).cast("long"), m = 100)
        .orderBy(col("cat"))
    },

    // --- hierarchy rollup over materialized-path keys (BOM / org /
    //     category-tree subtree totals): ancestors of a div-10 path
    //     key enumerate ROW-LOCALLY (explode of <= depth values), so
    //     the whole rollup is scan -> explode -> one ancestor-keyed
    //     agg — no per-level edge joins, no recursion
    //     (operators/Hierarchy). The oracle walks the same chain
    //     arithmetically; totals land on existing parts only. ---
    "q216_bom_rollup" -> { (spark, dir) =>
      val p = tbl(spark, dir, "part")
      graft.operators.Hierarchy.subtreeRollup(p, col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long"),
          base = 10, depth = 5)
        .orderBy(col("node"))
    },

    // --- join-key skew audit (the detection side of q60/q61's
    //     salting): the 20 heaviest l_partkey keys with the table
    //     totals alongside — the census a planner/operator consults
    //     before choosing salting or AQE skew-split. Distributed
    //     top-k (TakeOrdered), never a global sort. ---
    "q217_skew_audit" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val counts = li.groupBy(col("l_partkey").as("key"))
        .agg(count(lit(1)).as("n"))
      val tot = li.agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_keys"))
      counts.orderBy(col("n").desc, col("key")).limit(20)
        .crossJoin(broadcast(tot))
        .orderBy(col("n").desc, col("key"))
    },

    // --- deterministic Poisson bootstrap (Chamandy-style, the
    //     resampling that works distributed): 20 replicates of the
    //     mean order value per priority, weights = Poisson(1) via
    //     md5 uniforms against FIXED integer CDF thresholds — no
    //     RNG, engine-replayable; exact integer Σw / Σw·x per
    //     replicate, one final division (operators/Resample). The
    //     replicate spread IS the sampling uncertainty. ---
    "q218_bootstrap_ci" -> { (spark, dir) =>
      val o = tbl(spark, dir, "orders")
      graft.operators.Resample.bootstrapMeans(o,
          col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long"),
          replicates = 20, seed = "ci")
        .orderBy(col("g"), col("r"))
    },

    // --- PERSONALIZED PageRank (random walk with restart — the
    //     related-items / trust-propagation form): teleport mass
    //     concentrates on the q205 seed set, so rank measures
    //     proximity to the seeds, not global centrality. Same staged
    //     loop as q141 (one edge equi-join + node agg per round),
    //     deterministic value-sorted folds; oracle replays 3 rounds
    //     as chained CTEs with the seed-indicator teleport vector. ---
    "q219_ppr" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0)
      val edges = graft.operators.Graph.coOccurrenceEdges(li,
        col("l_orderkey"), col("l_partkey"))
      val seeds = edges.select(col("src").as("node"))
        .filter(col("node") % 100 === 0).distinct()
      graft.operators.Graph.pageRank(edges, iterations = 3,
          damping = 0.85, deterministic = true, restart = Some(seeds))
        .select(col("node"), round(col("pr"), 9).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(50)
    },

    // --- cohort LTV curves (the money complement of q135's
    //     retention): users cohorted by first-event week, purchase
    //     cents accumulated by cohort age in weeks (cohort-
    //     partitioned cumulative window over the pre-aggregated
    //     (cohort, age) frame), LTV-per-user as one exact-integer
    //     division. ---
    "q220_cohort_ltv" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val first = ev.groupBy(col("user_id"))
        .agg(to_date(date_trunc("week", min(col("ts").cast("timestamp"))))
          .as("cohort"))
      val sizes = first.groupBy(col("cohort"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          to_date(col("ts").cast("timestamp")).as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .join(first, Seq("user_id"))
        .groupBy(col("cohort"),
          expr("cast(datediff(day, cohort) as bigint) div 7")
            .as("age_week"))
        .agg(sum(col("cents")).as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort")).orderBy(col("age_week"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      purch.withColumn("cum_cents", sum(col("cents")).over(w))
        .join(sizes, Seq("cohort"))
        .select(col("cohort"), col("age_week"), col("n_users"),
          col("cum_cents"),
          (col("cum_cents").cast("double")
            / col("n_users").cast("double")).as("ltv_cents"))
        .orderBy(col("cohort"), col("age_week"))
    },

    // --- deterministic label-propagation communities over the q206
    //     repeat-co-purchase graph: 3 synchronous rounds, plurality
    //     neighbor label with smallest-label tie-break (the async/
    //     random variants are irreproducible by design — pinned
    //     rounds + pinned ties are what an oracle can replay, 3
    //     chained CTE rounds here). Per round: one adjacency join +
    //     one (node,label) count + one node arg-min. ---
    "q221_communities" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val edges = graft.operators.Graph.coOccurrenceEdgesWeighted(li,
          col("l_orderkey"), col("l_partkey"))
        .filter(col("w") >= 2).select(col("src"), col("dst"))
      graft.operators.Graph.labelPropagation(edges, rounds = 3)
        .orderBy(col("node"))
    },

    // --- postings-list compression audit (index storage planning):
    //     per-term delta + varint cost of the sorted doc-id postings
    //     vs raw 8-byte ids. Gap bit-lengths via length(bin(gap)) —
    //     the q179 no-libm trick — so every byte count is exact
    //     integer; windows are term-partitioned (bounded by df). The
    //     72% savings number a 100 TB index build decides layout
    //     with. ---
    "q222_postings_bytes" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val posts = docs.select(col("doc_id"), explode(array_distinct(
          graft.llm.TextAnalysis.tokens(col("text")))).as("term"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("term")).orderBy(col("doc_id"))
      posts
        .withColumn("__gap", coalesce(
          col("doc_id") - lag(col("doc_id"), 1).over(w),
          col("doc_id")))
        .withColumn("__vb",
          expr("1L + cast(length(bin(__gap)) - 1 as bigint) div 7"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          (count(lit(1)) * 8).as("raw_bytes"),
          sum(col("__vb")).as("varint_bytes"))
        .orderBy(col("df").desc, col("term"))
        .limit(100)
    },

    // --- daily latency/value bands (the p50/p95 ops dashboard):
    //     event values as exact cents, both quantiles per day via
    //     ExactQuantile's distributed histogram-refine selection —
    //     real data points, bit-exact, no global sort. ---
    "q223_daily_bands" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val daily = ev.select(
        to_date(col("ts").cast("timestamp")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      val p50 = graft.operators.ExactQuantile.quantileDisc(daily,
          col("day"), col("cents"), 0.5)
        .select(col("grp").as("day"), col("n").as("n_events"),
          col("q").cast("long").as("p50_cents"))
      val p95 = graft.operators.ExactQuantile.quantileDisc(daily,
          col("day"), col("cents"), 0.95)
        .select(col("grp").as("day"),
          col("q").cast("long").as("p95_cents"))
      p50.join(p95, Seq("day")).orderBy(col("day"))
    },

    // --- TPC-H Q3 shape (shipping-priority top orders): 3-way join
    //     + grouped revenue + top-10. Revenue in EXACT integer
    //     10⁻⁴-dollar units (cents × (100 − discount%)) so the
    //     ranking and the hash gate are immune to FP summation order
    //     — the q170 fixed-point discipline applied to the classic
    //     join-agg benchmark shape. Dims broadcast, fact never
    //     re-shuffles. ---
    "q224_tpch_q3" -> { (spark, dir) =>
      val c = tbl(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = tbl(spark, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-01-01").cast("date"))
      val li = tbl(spark, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-06-30").cast("date"))
      li.join(broadcast(o.join(broadcast(c),
            col("o_custkey") === col("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate"))
          .as("o_orderdate"), col("o_orderpriority"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("l_orderkey"))
        .limit(10)
    },

    // --- TPC-H Q5 shape (local-supplier volume): the 6-table
    //     snowflake join with the customer-nation = supplier-nation
    //     equality, revenue per nation in the same exact fixed
    //     point. All dims broadcast; the one big shuffle is the
    //     final nation rollup. ---
    "q225_tpch_q5" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val o = tbl(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-01-01").cast("date"))
      val c = tbl(spark, dir, "customer")
      val s = tbl(spark, dir, "supplier")
      val n = tbl(spark, dir, "nation")
      val r = tbl(spark, dir, "region").filter(col("r_name") === "ASIA")
      li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("n_name"))
    },

    // --- FK / inclusion-dependency DISCOVERY via KMV containment
    //     probes (data-catalog profiling): each candidate child
    //     column's 256-hash sketch is probed exactly against the
    //     parent column — true FKs report containment 1.0 (the
    //     parent side is never sketched); the deliberate reverse
    //     pair (orderkey probed against partkey) reports only the
    //     accidental value overlap of the two dense id ranges —
    //     the asymmetry that tells parent from child. The whole matrix costs
    //     |pairs| tiny probes, never a table join
    //     (operators/Kmv.containmentProbe). ---
    "q226_fk_discovery" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val o = tbl(spark, dir, "orders")
      val p = tbl(spark, dir, "part")
      val s = tbl(spark, dir, "supplier")
      val c = tbl(spark, dir, "customer")
      def pair(cn: String, chi: DataFrame, ck: Column,
               pn: String, par: DataFrame, pk: Column) =
        graft.operators.Kmv.containmentProbe(chi, ck, par, pk, 256)
          .select(lit(cn).as("child_col"), lit(pn).as("parent_col"),
            col("k_child"), col("probe_hits"),
            col("child_distinct_est"), col("containment"))
      pair("lineitem.l_orderkey", li, col("l_orderkey"),
          "orders.o_orderkey", o, col("o_orderkey"))
        .unionByName(pair("lineitem.l_partkey", li, col("l_partkey"),
          "part.p_partkey", p, col("p_partkey")))
        .unionByName(pair("lineitem.l_suppkey", li, col("l_suppkey"),
          "supplier.s_suppkey", s, col("s_suppkey")))
        .unionByName(pair("orders.o_custkey", o, col("o_custkey"),
          "customer.c_custkey", c, col("c_custkey")))
        .unionByName(pair("orders.o_orderkey", o, col("o_orderkey"),
          "part.p_partkey", p, col("p_partkey")))
        .orderBy(col("child_col"), col("parent_col"))
    },

    // --- quantile normalization (the rank-based feature transform):
    //     value -> percent_rank within its event type, competition
    //     rank over the raw value (ties share a rank, so the
    //     transform is a pure function of the VALUE — deterministic
    //     without an id tiebreak), summarized per decile with the
    //     decile cut as an exact INTEGER comparison
    //     ((rank-1)·10 div (n-1)) so no boundary can waver. ---
    "q227_quantile_norm" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("cents"))
      ev.select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("__rk", rank().over(w))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"))))
        .withColumn("decile", least(
          expr("((__rk - 1) * 10) div (__n - 1)"), lit(9L)))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
        .orderBy(col("event_type"), col("decile"))
    },

    // --- data-freshness audit (ingestion ops): per event type, the
    //     latest event time, its lag behind the corpus watermark in
    //     exact minutes, and a staleness flag — the "is this feed
    //     still flowing" census every pipeline dashboard runs. One
    //     scan + a broadcast 1-row max frame. ---
    "q228_freshness" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val per = ev.groupBy(col("event_type"))
        .agg(max(unix_micros(col("ts").cast("timestamp")))
          .as("__last_us"), count(lit(1)).as("n_events"))
      val glob = per.agg(max(col("__last_us")).as("__wm_us"))
      per.crossJoin(broadcast(glob))
        .select(col("event_type"), col("n_events"),
          date_format(expr("timestamp_micros(__last_us)"),
            "yyyy-MM-dd HH:mm:ss").as("last_event"),
          expr("(__wm_us - __last_us) div 60000000")
            .as("lag_minutes"),
          (col("__wm_us") - col("__last_us") >
            lit(7L * 24 * 3600 * 1000000L)).as("stale_7d"))
        .orderBy(col("event_type"))
    },

    // --- EXACT two-sample Kolmogorov-Smirnov drift per event type:
    //     early vs late half of the time range (integer-µs midpoint
    //     split), D = max |F_a − F_b| computed as an INTEGER ratio
    //     (max |cum_a·n_b − cum_b·n_a| over n_a·n_b) — the
    //     distribution-drift monitor with no libm and no tolerance.
    //     Cumulative counts run over the per-type DISTINCT value
    //     frame (type-partitioned windows, bounded by cardinality),
    //     never the event grain. ---
    "q229_ks_drift" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val b = ev.agg(min(us).as("lo"), max(us).as("hi")).collect()(0)
      val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
      val tagged = ev.select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        when(us <= mid, lit(1L)).otherwise(lit(0L)).as("__a"))
      val byVal = tagged.groupBy(col("event_type"), col("cents"))
        .agg(sum(col("__a")).as("__ca"),
          sum(lit(1L) - col("__a")).as("__cb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      byVal
        .withColumn("__cuma", sum(col("__ca")).over(w))
        .withColumn("__cumb", sum(col("__cb")).over(w))
        .withColumn("__na", sum(col("__ca")).over(wt))
        .withColumn("__nb", sum(col("__cb")).over(wt))
        .groupBy(col("event_type"))
        .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
          max(abs(col("__cuma") * col("__nb")
            - col("__cumb") * col("__na"))).as("d_num"))
        .withColumn("d_den", col("n_a") * col("n_b"))
        .withColumn("d", col("d_num").cast("double")
          / col("d_den").cast("double"))
        .orderBy(col("event_type"))
    },

    // --- Markov next-event prediction hit rate (in-sample
    //     resubstitution readout of q158's transition model): the
    //     predicted successor of each event kind is its argmax
    //     transition (ties -> lexicographically smallest), and every
    //     observed transition scores a hit iff it matches — exact
    //     integer hit ratios per antecedent kind. ---
    "q230_markov_hitrate" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = ev
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .select(col("event_type").as("prev_type"), col("next_type"))
      val counts = pairs.groupBy(col("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("__c"))
      val pred = counts.groupBy(col("prev_type"))
        .agg(min(struct((-col("__c")).as("__nc"),
          col("next_type").as("__nt"))).as("__m"))
        .select(col("prev_type"), col("__m.__nt").as("predicted"))
      pairs.join(broadcast(pred), Seq("prev_type"))
        .groupBy(col("prev_type"), col("predicted"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(when(col("next_type") === col("predicted"), 1L)
            .otherwise(0L)).as("n_hits"))
        .withColumn("hit_rate", col("n_hits").cast("double")
          / col("n_transitions").cast("double"))
        .orderBy(col("prev_type"))
    },

    // --- EXACT WEIGHTED quantiles (quantity-weighted price points):
    //     for q = num/den, the smallest price whose cumulative quantity
    //     weight reaches q of the total — every comparison an integer
    //     product (cw·den ≥ num·tw), so the selection is hash-exact.
    //     The event grain collapses to the per-group distinct-value
    //     grid before any window runs (ExactQuantile scale note). ---
    "q231_weighted_quantiles" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      graft.operators.ExactQuantile.weightedQuantileDisc(
          li, col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long"),
          col("l_quantity").cast("long"),
          Seq(("p25_cents", 1, 4), ("p50_cents", 1, 2),
            ("p75_cents", 3, 4), ("p90_cents", 9, 10)))
        .withColumnRenamed("grp", "l_returnflag")
        .orderBy(col("l_returnflag"))
    },

    // --- Seasonal decomposition by moving averages (the classical
    //     trend/seasonal split, all-integer until one final division):
    //     trend at day d = centered 7-day sum of daily cents (RANGE
    //     window over the epoch-day axis, so calendar gaps disqualify
    //     a window instead of silently shifting it — only days with a
    //     FULL ±3 neighborhood contribute); detrended·7 = 7·cents −
    //     trend_num stays integer; the weekday seasonal is
    //     Σ detrended·7 / (7·n_days) — one division of exact integer
    //     sums, order-independent, unrounded hash match. ---
    "q232_seasonal_decomp" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val daily = ev
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        .withColumn("__eday", datediff(col("day"), lit("1970-01-01")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("__eday"))
        .rangeBetween(-3, 3)
      daily
        .withColumn("__wn", count(lit(1)).over(w))
        .withColumn("__ws", sum(col("cents")).over(w))
        .filter(col("__wn") === 7)
        .withColumn("dow", dayofweek(col("day")) - 1)
        .withColumn("__d7", col("cents") * 7 - col("__ws"))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("__d7")).as("seasonal_num"))
        .withColumn("seasonal_cents", col("seasonal_num").cast("double")
          / (col("n_days") * 7).cast("double"))
        .orderBy(col("event_type"), col("dow"))
    },

    // --- STREAMING LATE-DATA CENSUS, oracled as a differential: the
    //     event log replays as four mtime-pinned micro-batches keyed
    //     event_id%4 (each spans the full month, so later batches carry
    //     rows far behind the watermark the earlier batches advanced),
    //     drains through the watermarked dedup with a deliberately
    //     SHORT 1-day delay, and the per-batch survivor counts are
    //     hash-compared against the SQL replay of Spark's EXACT drop
    //     rule as the AvailableNow drain executes it: the watermark in
    //     effect during batch k reflects event times through batch k−2
    //     (one propagation batch — measured, not assumed: batch 1 runs
    //     at the epoch watermark, batch 2 at max(b0)−delay), so a row
    //     survives iff its event time ≥ cummax_us(batches ≤ k−2) −
    //     delay, all in integer µs. Doubles as a streaming-semantics
    //     regression detector — a Spark change to watermark
    //     propagation turns this row red. The "how much am I losing
    //     to this watermark" readout every continuous deployment needs
    //     before tightening a delay. ---
    "q233_late_drop_census" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
          pmod(col("event_id"), lit(4)).cast("int").as("batch"))
      val tmp = Scratch.dir("graft_q233").toString
      EventStream.writeOrderedBatches(
        (0 until 4).map(b => ev.filter(col("batch") === b)),
        tmp + "/src")
      val schema = spark.read.parquet(tmp + "/src").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp + "/src")
      val survivors = EventStream.dedupByKey(stream, "ts", "1 day",
        "event_id")
      val drained = EventStream.runToCompletion(spark, survivors,
        mode = "append")
      val totals = ev.groupBy(col("batch"))
        .agg(count(lit(1)).as("n_in"))
      drained.groupBy(col("batch"))
        .agg(count(lit(1)).as("n_kept"))
        .join(totals, Seq("batch"))
        .select(col("batch"), col("n_in"), col("n_kept"),
          (col("n_in") - col("n_kept")).as("n_late"))
        .orderBy(col("batch"))
    },

    // --- INCREMENTAL retrieval-index statistics (q125's merge-into-
    //     model discipline on the search side): the history corpus's
    //     (term, df, cf) table is PERSISTED to parquet; the new batch
    //     contributes only its own stats, merged by additive sums —
    //     history text is never re-tokenized. The oracle REBUILDS the
    //     stats from the full corpus: a hash match on the top-100 df
    //     terms proves incremental ≡ batch on real data. Exact
    //     integer counts end to end. ---
    "q234_incr_term_stats" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val hist = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val tmp = Scratch.dir("graft_q234").toString
      graft.llm.Relevance.termStats(hist, col("doc_id"), col("text"))
        .write.parquet(tmp + "/stats")
      val base = spark.read.parquet(tmp + "/stats")
      graft.llm.Relevance.mergeTermStats(base,
          graft.llm.Relevance.termStats(batch, col("doc_id"),
            col("text")))
        .orderBy(col("df").desc, col("term").asc)
        .limit(100)
    },

    // --- exact k-NN CLASSIFICATION over the embedding corpus: every
    //     20th vector is held out as a query, its label predicted by
    //     majority vote of its 10 nearest neighbors (cosine, double
    //     precision; ties -> more votes, then smaller label). The
    //     brute-force scorer is the labeled exact baseline — the
    //     serving path at 100 TB swaps in the IVF probe (q109) with
    //     identical vote logic. Vote counts and the argmax are exact
    //     integers; only the neighbor RANKING touches FP, and the
    //     sequential-order dot product is engine-identical (q44/q45
    //     evidence). ---
    "q235_knn_classify" -> { (spark, dir) =>
      val emb = tbl(spark, dir, "embeddings")
      val queries = emb.filter(pmod(col("vec_id"), lit(20)) === 0)
      val corpus = emb.filter(pmod(col("vec_id"), lit(20)) =!= 0)
      val topk = Similarity.bruteForceTopK(
        corpus, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 10)
      val votes = topk
        .join(corpus.select(col("vec_id"),
          col("label").cast("int").as("nbr_label")), Seq("vec_id"))
        .groupBy(col("query_id"), col("nbr_label"))
        .agg(count(lit(1)).as("votes"))
      val pred = votes.groupBy(col("query_id"))
        .agg(min(struct((-col("votes")).as("__nv"),
          col("nbr_label").as("__lb"))).as("__m"))
        .select(col("query_id"), col("__m.__lb").as("predicted"),
          (-col("__m.__nv")).as("n_votes"))
      pred
        .join(queries.select(col("vec_id").as("query_id"),
          col("label").cast("int").as("true_label")), Seq("query_id"))
        .select(col("query_id"), col("true_label"), col("predicted"),
          col("n_votes"),
          (col("true_label") === col("predicted")).as("correct"))
        .orderBy(col("query_id"))
    },

    // --- TIME-DECAY multi-touch attribution (q201's linear credit
    //     replaced by a dyadic half-life): a view m whole minutes
    //     before the purchase weighs 2^−m — exact IEEE, the weight is
    //     a power of two — and each conversion's credits normalize by
    //     the value-sorted fold of its weights, so every FP operation
    //     happens in an identical pinned order in both engines and
    //     the daily credit column hash-matches UNROUNDED. ---
    "q236_decay_attribution" -> { (spark, dir) =>
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
        .withColumn("__m", expr("(p_us - v_us) div 60000000"))
        .withColumn("__w", lit(1.0)
          / expr("CAST(shiftleft(CAST(1 AS BIGINT), __m) AS DOUBLE)"))
      val tot = cand.groupBy(col("p_id"))
        .agg(expr("aggregate(array_sort(collect_list(__w)), " +
          "CAST(0.0 AS DOUBLE), (s, x) -> s + x)").as("__tw"))
      cand.join(tot, Seq("p_id"))
        .withColumn("__credit", col("__w") / col("__tw"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_touches"),
          array_sort(collect_list(col("__credit"))).as("__cs"))
        .select(col("day"), col("n_touches"),
          expr("aggregate(__cs, CAST(0.0 AS DOUBLE), (s, x) -> s + x)")
            .as("credit"))
        .orderBy(col("day"))
    },

    // --- wide→long reshaping with the NATIVE unpivot operator (the
    //     inverse of q48's pivot): per-flag count metrics melt to
    //     (flag, metric, value) rows — row-local, no shuffle beyond
    //     the feeding aggregate. ---
    "q237_unpivot" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("n_rows"), col("n_parts"), col("n_supps")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    },

    // --- INCREMENTAL distinct-actives maintenance on persisted KMV
    //     sketches (q234's merge-into-index discipline on the sketch
    //     side): the nightly job persists one 128-hash sketch per day;
    //     the monthly estimate merges the SKETCH TABLE (k smallest of
    //     the union — identical to sketching the whole stream), never
    //     re-reading event history. KMV is a deterministic data
    //     function (md5 order), so the estimate itself sits under the
    //     hash gate, with the exact count alongside. ---
    "q238_incr_kmv_actives" -> { (spark, dir) =>
      val k = 128
      val ev = tbl(spark, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val tmp = Scratch.dir("graft_q238").toString
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day")).orderBy(col("h"))
      ev.select(col("day"),
          graft.operators.Kmv.h48(col("user_id")).as("h"))
        .distinct()
        .withColumn("__rn", row_number().over(wd))
        .filter(col("__rn") <= k)
        .select(col("day"), col("h"))
        .write.parquet(tmp + "/sketches")
      val persisted = spark.read.parquet(tmp + "/sketches")
      val merged = graft.operators.Kmv.merge(
        Seq(persisted.select(col("h"))), k)
      val exact = ev.agg(countDistinct(col("user_id")).cast("double")
        .as("n_exact"))
      graft.operators.Kmv.estimate(merged, k).crossJoin(exact)
        .select(round(col("distinct_est"), 6).as("distinct_est"),
          col("n_exact"),
          (abs(col("distinct_est") - col("n_exact")) <=
            col("n_exact") * 0.2).as("within_20pct"))
    },

    // --- WINSORIZED means per event type: clip cents at the exact
    //     discrete p05/p95 (the q231 integer-threshold rule with unit
    //     weights), then one integer sum / one division — the robust
    //     mean that, unlike the trimmed mean (q194), keeps n constant.
    //     ---
    "q239_winsorize" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      val cuts = graft.operators.ExactQuantile.weightedQuantileDisc(
          ev, col("event_type"), col("cents"), lit(1L),
          Seq(("p05", 1, 20), ("p95", 19, 20)))
        .select(col("grp").as("event_type"), col("p05"), col("p95"))
      ev.join(broadcast(cuts), Seq("event_type"))
        .withColumn("__wv",
          least(greatest(col("cents"), col("p05")), col("p95")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("p05")).as("p05_cents"),
          max(col("p95")).as("p95_cents"),
          sum(col("__wv")).as("wsum_cents"))
        .withColumn("winsorized_mean_cents",
          col("wsum_cents").cast("double") / col("n").cast("double"))
        .orderBy(col("event_type"))
    },

    // --- deterministic STRATIFIED holdout split: within each source
    //     stratum, the ceil(n/5) docs smallest in (md5(doc_id),
    //     doc_id) order form the test fold — reproducible from the
    //     data alone, exact 20% per stratum, no RNG state. Window per
    //     stratum (bounded); the unbounded-stratum form is q212's
    //     hash-prefix global rank. ---
    "q240_stratified_split" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))))
        .withColumn("__is_test", col("__rn") <= expr("(__n + 4) div 5"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__is_test"), 1L).otherwise(0L)).as("n_test"),
          sum(when(col("__is_test"), col("n_chars")).otherwise(0L))
            .as("test_chars"),
          sum(when(!col("__is_test"), col("n_chars")).otherwise(0L))
            .as("train_chars"))
        .orderBy(col("source"))
    },

    // --- REGRESSION evaluation (q115's readout for continuous
    //     targets): the model predicts each type's ROUNDED-cent train
    //     mean (round-half-up integer division, so the prediction is
    //     an integer and every residual stays integer); MAE / MSE /
    //     R² on the held-out half are ratios of exact integer sums —
    //     unrounded hash match, no overflow (|res| ≤ 5·10⁴ cents,
    //     squared ≤ 2.5·10⁹, summed ≪ 2⁶³). ---
    "q241_regression_metrics" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      val train = ev.filter(pmod(col("event_id"), lit(2)) === 0)
      val test = ev.filter(pmod(col("event_id"), lit(2)) === 1)
      val model = train.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_train"), sum(col("cents")).as("__s"))
        .withColumn("pred_cents",
          expr("(2 * __s + n_train) div (2 * n_train)"))
        .select(col("event_type"), col("n_train"), col("pred_cents"))
      val tm = test.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_test"), sum(col("cents")).as("__ts"))
        .withColumn("__tmean",
          expr("(2 * __ts + n_test) div (2 * n_test)"))
        .select(col("event_type"), col("n_test"), col("__tmean"))
      test.join(broadcast(model), Seq("event_type"))
        .join(broadcast(tm), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(max(col("n_train")).as("n_train"),
          max(col("n_test")).as("n_test"),
          max(col("pred_cents")).as("pred_cents"),
          sum(abs(col("cents") - col("pred_cents"))).as("mae_num"),
          sum((col("cents") - col("pred_cents"))
            * (col("cents") - col("pred_cents"))).as("sse"),
          sum((col("cents") - col("__tmean"))
            * (col("cents") - col("__tmean"))).as("sst"))
        .withColumn("mae_cents", col("mae_num").cast("double")
          / col("n_test").cast("double"))
        .withColumn("r2", lit(1.0) - col("sse").cast("double")
          / col("sst").cast("double"))
        .orderBy(col("event_type"))
    },

    // --- pipeline OBSERVABILITY via the Observation API: per-stage
    //     row/char counters piggyback on the write job itself (observe()
    //     metrics are accumulator-backed — NO second scan of the
    //     data), which is how a 100 TB curation run affords its
    //     circuit-breaker ("did this filter eat 90% of the corpus?")
    //     on every stage. The filter stage writes to a real sink; the
    //     observed metrics become the result frame; the oracle
    //     replays the counts relationally. ---
    "q242_observed_pipeline" -> { (spark, dir) =>
      import org.apache.spark.sql.Observation
      val docs = tbl(spark, dir, "documents")
      val obsIn = Observation()
      val obsKept = Observation()
      val tmp = Scratch.dir("graft_q242").toString
      docs
        .observe(obsIn, count(lit(1)).as("rows"),
          sum(col("n_chars")).as("chars"))
        .filter(col("n_chars") >= 200)
        .observe(obsKept, count(lit(1)).as("rows"),
          sum(col("n_chars")).as("chars"))
        .write.parquet(tmp + "/kept")
      val in = obsIn.get
      val kept = obsKept.get
      import spark.implicits._
      Seq((in("rows").asInstanceOf[Long],
          in("chars").asInstanceOf[Long],
          kept("rows").asInstanceOf[Long],
          kept("chars").asInstanceOf[Long]))
        .toDF("n_in", "chars_in", "n_kept", "chars_kept")
        .withColumn("kept_frac", col("n_kept").cast("double")
          / col("n_in").cast("double"))
    },

    // --- LONGEST CONSECUTIVE-DAY STREAK per user (gaps-and-islands):
    //     distinct purchase days per user, island id = epoch_day −
    //     row_number (constant within a run of consecutive days),
    //     longest island per user with the EARLIEST start as the tie
    //     break — exact integers and dates end to end. The engagement
    //     readout behind "N-day streak" product features. ---
    "q243_longest_streak" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val days = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      val islands = days
        .withColumn("__isl",
          datediff(col("day"), lit("1970-01-01"))
            - row_number().over(w))
        .groupBy(col("user_id"), col("__isl"))
        .agg(count(lit(1)).as("streak_days"),
          min(col("day")).as("streak_start"))
      islands.groupBy(col("user_id"))
        .agg(max(struct(col("streak_days").as("__l"),
          (-datediff(col("streak_start"), lit("1970-01-01")))
            .as("__negstart"),
          col("streak_start").as("__s"))).as("__m"))
        .select(col("user_id"), col("__m.__l").as("streak_days"),
          col("__m.__s").as("streak_start"))
        .filter(col("streak_days") >= 3)
        .orderBy(col("user_id"))
    },

    // --- EVENT-TIME DISORDER CENSUS — the measurement that SIZES a
    //     watermark (q233 shows what a delay drops; this shows what
    //     the data needs): in arrival order (event_id), each event's
    //     lateness = running-max(event time) − event time; per type,
    //     the share of out-of-order events and exact integer-minute
    //     lateness quantiles via the q231 threshold rule. ---
    "q244_disorder_census" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val late = ev
        .withColumn("__late_us", greatest(
          coalesce(max(col("us")).over(w) - col("us"), lit(0L)),
          lit(0L)))
        .withColumn("late_min", expr("__late_us div 60000000"))
      val qs = graft.operators.ExactQuantile.weightedQuantileDisc(
          late, col("event_type"), col("late_min"), lit(1L),
          Seq(("p50_late_min", 1, 2), ("p90_late_min", 9, 10),
            ("p99_late_min", 99, 100)))
        .select(col("grp").as("event_type"), col("p50_late_min"),
          col("p90_late_min"), col("p99_late_min"))
      late.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("late_min") > 0, 1L).otherwise(0L))
            .as("n_disordered"),
          max(col("late_min")).as("max_late_min"))
        .join(qs, Seq("event_type"))
        .orderBy(col("event_type"))
    },

    // --- the q127 curation composition with PER-STAGE OBSERVABILITY:
    //     a PipelineObserver checkpoint at every stage boundary
    //     (exact dedup -> quality classifier -> decontamination ->
    //     token budget), all riding the single terminal write as
    //     accumulators — no re-scan per stage. Boundaries the
    //     downstream consumes twice (decontaminate's n-gram mine +
    //     anti-join; the budget's census + join) are persisted above
    //     the checkpoint so each counter fires exactly once. The
    //     oracle replays every stage count relationally from the
    //     q127 CTE chain. ---
    "q245_pipeline_metrics" -> { (spark, dir) =>
      val po = new graft.llm.PipelineObserver
      val docs0 = tbl(spark, dir, "documents")
      val raw = po.checkpoint("raw",
          docs0.select(col("doc_id"), col("source"), col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fp = raw.withColumn("fp", md5(col("text")))
      val keepIds = fp.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val s1 = po.checkpoint("exact_dedup",
        fp.join(keepIds, Seq("doc_id"), "left_semi"))
      val s2 = po.checkpoint("quality",
          graft.llm.QualityModel.classify(s1, col("text"))
            .filter(col("keep"))
            .select(col("doc_id"), col("source"), col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val evalSet = docs0.filter(pmod(col("doc_id"), lit(97)) === 0)
      val s3 = po.checkpoint("decontaminate",
          graft.llm.Contamination.decontaminate(s2, col("doc_id"),
            col("text"), evalSet, col("text"), n = 8))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s3t = s3.withColumn("n_tok",
        graft.llm.TextAnalysis.tokenCount(col("text")))
      val kept = po.checkpoint("token_budget",
        Pipelines.sampleToTokenBudget(s3t, col("doc_id"),
          col("source"), col("n_tok"), budgetTokens = 10000L))
      kept.write.mode("overwrite")
        .parquet(Scratch.dir("graft_q245").toString + "/out")
      po.metricsDF(spark).orderBy(col("stage_ix"))
    },

    // --- SWEEP-LINE MAX CONCURRENCY: each event opens a session of
    //     (cents % 3600 + 60) seconds; per type, the peak number of
    //     simultaneously-open sessions and the earliest time it is
    //     reached. ±1 endpoint explode (one scan), running sum over
    //     a type-partitioned window — the resource-sizing census
    //     behind pool/limit/autoscale decisions. ---
    "q246_max_concurrency" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("dur_s",
          expr("CAST(round(value * 100) AS BIGINT) % 3600 + 60"))
      graft.operators.Sweep.maxConcurrent(ev, col("event_type"),
          col("us"), col("us") + col("dur_s") * lit(1000000L))
        .select(col("grp").as("event_type"), col("max_concurrent"),
          col("at_us"))
        .orderBy(col("event_type"))
    },

    // --- LOG TEMPLATE MINING (Drain-style): events rendered as log
    //     lines; clusters keyed by (token count, first token), a
    //     position becomes <*> when >1 distinct token appears there.
    //     Two narrow exchanges ((cluster, pos) census + cluster
    //     reassembly), the line text never self-joins. ---
    "q247_log_templates" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      val lines = ev.select(concat(
          format_string("%s user=%d took %d ms", col("event_type"),
            col("user_id"),
            expr("CAST(round(value * 100) AS BIGINT) % 1000")),
          when(pmod(col("user_id"), lit(10)) === 0, lit(" flagged"))
            .otherwise(lit(""))).as("line"))
      graft.etl.LogTemplate.mine(lines, col("line"), minSupport = 2L)
        .orderBy(col("n_lines").desc, col("template"))
    },

    // --- COLUMN-LEVEL RECONCILIATION: documents vs a deterministic
    //     "v2" snapshot (doc_id%13 deleted, %7 source rewritten, %11
    //     n_chars bumped, %17 re-inserted under a shifted id); one
    //     full-outer join on the key, melted per-column change
    //     census with IS DISTINCT FROM null semantics. ---
    "q248_reconcile_columns" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"))
      val v2 = docs.filter(pmod(col("doc_id"), lit(13)) =!= 0)
        .withColumn("source",
          when(pmod(col("doc_id"), lit(7)) === 0, lit("migrated"))
            .otherwise(col("source")))
        .withColumn("n_chars",
          when(pmod(col("doc_id"), lit(11)) === 0, col("n_chars") + 1)
            .otherwise(col("n_chars")))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(17)) === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            col("source"), col("lang"), col("n_chars")))
      graft.operators.Reconcile.columnDiffCensus(docs, v2, "doc_id",
        Seq("source", "lang", "n_chars"))
    },

    // --- LAG-k AUTOCORRELATION of the per-type daily count series
    //     (calendar-aligned: day d joins day d+k on the day grid, so
    //     gaps pair only where both ends exist): Pearson r from
    //     exact integer power sums (the q181 OLS discipline); num /
    //     den ints are the hash gate, r divides once at the end. ---
    "q249_autocorr" -> { (spark, dir) =>
      val daily = tbl(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).cast("long")
            .as("eday"),
          col("x"))
      val withLag = daily.withColumn("lag",
        explode(array(lit(1), lit(2), lit(3), lit(7))))
      val pairs = withLag.alias("a").join(daily.alias("b"),
          col("a.event_type") === col("b.event_type") &&
          col("b.eday") === col("a.eday") + col("a.lag"))
        .select(col("a.event_type").as("event_type"), col("a.lag").as("lag"),
          col("a.x").as("x"), col("b.x").as("y"))
      pairs.groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
          sum(col("x") * col("x")).as("__sxx"),
          sum(col("y") * col("y")).as("__syy"),
          sum(col("x") * col("y")).as("__sxy"))
        .select(col("event_type"), col("lag"), col("n"),
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
        .orderBy(col("event_type"), col("lag"))
    },

    // --- TOKEN-BUCKET RATE-LIMITER REPLAY: per user, which events a
    //     3-token bucket (1 token/minute refill, 1/event) would have
    //     accepted — all-integer lazy-refill fold, replayed in the
    //     oracle as a DuckDB list_reduce over a BIGINT[4] state
    //     (list-shaped: v1.0.0 list_reduce mutates STRUCT
    //     accumulator fields in place, field-by-field). ---
    "q250_rate_limit" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      graft.operators.RateLimit.tokenBucket(ev, col("user_id"),
          unix_micros(col("ts").cast("timestamp")), col("event_id"),
          capacity = 3L)
        .select(col("entity").as("user_id"), col("n_events"),
          col("n_accepted"), col("n_rejected"), col("tokens_left"))
        .orderBy(col("user_id"))
    },

    // --- SOURCE SIMILARITY MATRIX: cosine between sources' unigram
    //     count vectors — the corpus-mixture design readout ("which
    //     sources are near-duplicates of each other"). Integer dot
    //     products and norms via a vocabulary-keyed join of the
    //     (source, term, c) census (≤ k rows per term — a metadata
    //     join, the corpus itself is scanned once and never
    //     self-joined); cosine divides once at the end. ---
    "q251_source_similarity" -> { (spark, dir) =>
      val counts = tbl(spark, dir, "documents")
        .select(col("source"),
          explode(graft.llm.TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val norms = counts.groupBy(col("source"))
        .agg(sum(col("c") * col("c")).as("norm2"))
      counts.alias("a").join(counts.alias("b"),
          col("a.tok") === col("b.tok") &&
          col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(sum(col("a.c") * col("b.c")).as("dot"))
        .join(broadcast(norms.select(col("source").as("source_a"),
          col("norm2").as("norm2_a"))), Seq("source_a"))
        .join(broadcast(norms.select(col("source").as("source_b"),
          col("norm2").as("norm2_b"))), Seq("source_b"))
        .withColumn("cosine", col("dot").cast("double") /
          (sqrt(col("norm2_a").cast("double")) *
            sqrt(col("norm2_b").cast("double"))))
        .select(col("source_a"), col("source_b"), col("dot"),
          col("norm2_a"), col("norm2_b"), col("cosine"))
        .orderBy(col("source_a"), col("source_b"))
    },

    // --- ABC / PARETO CLASSIFICATION of parts by revenue: cumulative
    //     revenue share in (cents desc, partkey) order; A ≤ 80%,
    //     B ≤ 95%, C rest — integer threshold compares (cum·5 ≤
    //     tot·4), no division. The global cumsum runs WITHOUT a
    //     global window: bit-length revenue bands (cents desc ⇔
    //     (band desc, cents desc) — band boundaries are exact), a
    //     ≤64-row band census prefix-sum, and an intra-band window
    //     partitioned by band (the q212 histogram-offset shape). ---
    "q252_abc_pareto" -> { (spark, dir) =>
      val rev = tbl(spark, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("cents"))
      val banded = rev.withColumn("band", length(bin(col("cents"))))
      val bandTot = banded.groupBy(col("band"))
        .agg(sum(col("cents")).as("__bc"))
      // prefix over the ≤64-row band census WITHOUT a global window:
      // strictly-higher bands (larger revenue, earlier in the cum
      // order) sum via a tiny non-equi self-join
      val bandBefore = bandTot.alias("x")
        .join(broadcast(bandTot.select(col("band").as("__b2"),
          col("__bc").as("__bc2"))), col("__b2") > col("band"), "left")
        .groupBy(col("band"))
        .agg(coalesce(sum(col("__bc2")), lit(0L)).as("__before"))
      val iw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"))
        .orderBy(col("cents").desc, col("l_partkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val tot = rev.agg(sum(col("cents")).as("__tot"))
      banded.join(broadcast(bandBefore), Seq("band"))
        .withColumn("__cum", col("__before") + sum(col("cents")).over(iw))
        .crossJoin(broadcast(tot))
        .withColumn("class",
          when(col("__cum") * 5 <= col("__tot") * 4, lit("A"))
            .when(col("__cum") * 20 <= col("__tot") * 19, lit("B"))
            .otherwise(lit("C")))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("cents")).as("class_cents"))
        .orderBy(col("class"))
    },

    // --- STREAMING token-bucket admission (q250's online twin): the
    //     same lazy-refill arithmetic in mapGroupsWithState keyed
    //     state, the backlog drained as 3 chronological micro-batches
    //     (the q211 drain shape); the final update per key must equal
    //     the batch replay, so the oracle is q250's SQL verbatim. ---
    "q253_stream_rate_limit" -> { (spark, dir) =>
      val events = EventStream.normalizeEventTime(
          tbl(spark, dir, "events"))
        .select(col("user_id"), col("ts"), col("event_id"))
      val us = unix_micros(col("ts"))
      val b = events.agg(min(us).as("lo"), max(us).as("hi"))
        .collect()(0)
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val cut1 = lo + (hi - lo) / 3
      val cut2 = lo + 2 * ((hi - lo) / 3)
      val src = Scratch.dir("graft_q253").toString + "/ev"
      EventStream.writeOrderedBatches(Seq(
        events.filter(us <= cut1),
        events.filter(us > cut1 && us <= cut2),
        events.filter(us > cut2)), src)
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val updates = EventStream.streamingTokenBucket(stream, "user_id",
        "ts", "event_id", capacity = 3L)
      EventStream.runToCompletion(spark, updates, mode = "update")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("n_accepted"),
          col("n_rejected"), col("tokens_left"))).as("__f"))
        .select(col("user_id"), col("__f.n_events").as("n_events"),
          col("__f.n_accepted").as("n_accepted"),
          col("__f.n_rejected").as("n_rejected"),
          col("__f.tokens_left").as("tokens_left"))
        .orderBy(col("user_id"))
    },

    // --- INTER-ARRIVAL BURSTINESS census (bot/abuse shape signal):
    //     per user, integer-minute gaps between consecutive events
    //     (entity-partitioned lag), exact power sums, and the
    //     coefficient-of-variation² as an exact integer num/den pair
    //     (cv2 = (n·Σd²−(Σd)²) / (Σd)²) with the double dividing
    //     once at the end. High cv² = bursty, ~0 = metronomic. ---
    "q254_burstiness" -> { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val gaps = tbl(spark, dir, "events")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_id"))
        .withColumn("__prev", lag(col("us"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(col("user_id"), expr("(us - __prev) div 60000000")
          .as("d"))
      gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("d")).as("sum_min"),
          sum(col("d") * col("d")).as("__sdd"),
          max(col("d")).as("max_gap_min"))
        .withColumn("var_num",
          col("n_gaps") * col("__sdd") - col("sum_min") * col("sum_min"))
        .withColumn("cv2",
          when(col("sum_min") > 0, col("var_num").cast("double") /
            (col("sum_min") * col("sum_min")).cast("double")))
        .select(col("user_id"), col("n_gaps"), col("sum_min"),
          col("max_gap_min"), col("var_num"), col("cv2"))
        .orderBy(col("user_id"))
    },

    // --- ORDER-INDEPENDENT CONTENT FINGERPRINT per source (the
    //     partition-manifest primitive: compare fingerprints, row-diff
    //     only what moved): modular md5 content sum — commutative, so
    //     partitioning/row order never changes it. ---
    "q255_table_fingerprint" -> { (spark, dir) =>
      graft.operators.Fingerprint.contentFingerprint(
          tbl(spark, dir, "documents"), col("source"),
          Seq(col("doc_id"), col("lang"), col("n_chars")))
        .select(col("grp").as("source"), col("n_rows"), col("fp"))
        .orderBy(col("source"))
    },

    // --- k-CORE PEELING (4 fixed rounds, k=8) on the q147 part
    //     co-occurrence graph: rounds drop nodes with degree < k and
    //     recompute — the dense-subgraph / hub-spam separator. The
    //     bounded-round contract makes the oracle a 4×-chained CTE
    //     replay (the q219/q221 discipline). ---
    "q256_kcore" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(4)) === 0)
      val edges = graft.operators.Graph.coOccurrenceEdges(li,
        col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.kCorePeel(edges, k = 8, rounds = 4)
        .orderBy(col("node"))
    },

    // --- INCREMENTAL MANIFEST MERGE law on real data: fingerprint the
    //     even/odd doc_id halves separately, merge additively, and
    //     compare against fingerprinting the whole table — the oracle
    //     replays both paths, so a hash match PROVES the additive
    //     composition (what lets a 100 TB manifest update per
    //     partition without re-scanning history). ---
    "q257_fingerprint_merge" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val cols = Seq(col("doc_id"), col("lang"), col("n_chars"))
      def fp(d: org.apache.spark.sql.DataFrame) =
        graft.operators.Fingerprint.contentFingerprint(d,
          col("source"), cols)
      val whole = fp(docs)
      val merged = graft.operators.Fingerprint.merge(
        fp(docs.filter(pmod(col("doc_id"), lit(2)) === 0)),
        fp(docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)))
      whole.join(merged.select(col("grp"),
          col("n_rows").as("n_rows_merged"),
          col("fp").as("fp_merged")), Seq("grp"))
        .select(col("grp").as("source"), col("n_rows"), col("fp"),
          col("n_rows_merged"), col("fp_merged"),
          (col("fp") === col("fp_merged") &&
            col("n_rows") === col("n_rows_merged")).as("merge_ok"))
        .orderBy(col("source"))
    },

    // --- SESSION RUN-LENGTH ENCODING census: per user, consecutive
    //     same-event-type runs (the sequence-compression readout for
    //     training-data prep: how redundant are raw event streams).
    //     Lag-change flags + running sum = run ids (the SCD2 island
    //     machinery), exact integer ratio emitted as num/den. ---
    "q258_session_rle" -> { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val runs = tbl(spark, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("__chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"),
            1L).otherwise(0L))
        .withColumn("__run", sum(col("__chg")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(col("us"), col("event_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, org.apache.spark.sql.expressions
              .Window.currentRow)))
      val perRun = runs.groupBy(col("user_id"), col("__run"))
        .agg(count(lit(1)).as("__len"))
      perRun.groupBy(col("user_id"))
        .agg(sum(col("__len")).as("n_events"),
          count(lit(1)).as("n_runs"),
          max(col("__len")).as("longest_run"))
        .withColumn("compression",
          col("n_events").cast("double") / col("n_runs").cast("double"))
        .orderBy(col("user_id"))
    },

    // --- ASSOCIATION RULES over order baskets: directed part pairs
    //     with support (shared-basket count), confidence = supp(a,b)
    //     / supp(a) and lift = supp(a,b)·N / (supp(a)·supp(b)) — all
    //     exact integer numerators/denominators, the doubles divide
    //     once. Pair volume is Σ|basket|² (baskets are small), never
    //     catalog². Top 100 by support with a full deterministic
    //     tiebreak. ---
    "q259_assoc_rules" -> { (spark, dir) =>
      val li = tbl(spark, dir, "lineitem")
      val pairs = graft.operators.Graph.coOccurrenceEdgesWeighted(li,
        col("l_orderkey"), col("l_partkey"))
      val item = li.select(col("l_orderkey").as("g"),
          col("l_partkey").as("i")).distinct()
        .groupBy(col("i")).agg(count(lit(1)).as("n_i"))
      val baskets = li.agg(
        count_distinct(col("l_orderkey")).as("__nb"))
      pairs.filter(col("w") >= 3)
        .join(item.select(col("i").as("src"), col("n_i").as("n_src")),
          Seq("src"))
        .join(item.select(col("i").as("dst"), col("n_i").as("n_dst")),
          Seq("dst"))
        .crossJoin(broadcast(baskets))
        .select(col("src"), col("dst"), col("w").as("support"),
          col("n_src"), col("n_dst"),
          (col("w") * col("__nb")).as("lift_num"),
          (col("n_src") * col("n_dst")).as("lift_den"),
          (col("w").cast("double") / col("n_src").cast("double"))
            .as("confidence"),
          ((col("w") * col("__nb")).cast("double") /
            (col("n_src") * col("n_dst")).cast("double")).as("lift"))
        .orderBy(col("support").desc, col("src"), col("dst"))
        .limit(100)
    },

    // --- SEQUENCE NOVELTY (distribution shift on event ORDER, not
    //     values): per user, the fraction of second-half event-type
    //     bigram occurrences whose bigram never appeared in that
    //     user's first half — halves split at the backlog's time
    //     midpoint, bigrams formed within each half. Exact integer
    //     counts; the anti-join is per-user keyed. ---
    "q260_seq_novelty" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val b = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        .collect()(0)
      val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      def bigrams(half: org.apache.spark.sql.DataFrame) = half
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(col("user_id"), col("__prev").as("a"),
          col("event_type").as("b"))
      val train = bigrams(ev.filter(col("us") <= mid)).distinct()
      val test = bigrams(ev.filter(col("us") > mid))
      val novel = test.join(train, Seq("user_id", "a", "b"),
        "left_anti")
      test.groupBy(col("user_id")).agg(count(lit(1)).as("n_test"))
        .join(novel.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_novel")), Seq("user_id"), "left")
        .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_test").cast("double"))
        .orderBy(col("user_id"))
    },

    // --- MAGIC-BYTE FORMAT SNIFFING census over synthesized media
    //     blobs (doc_id%4 picks the container signature, text bytes
    //     are the opaque body): the engine routes by ACTUAL bytes
    //     (Multimodal.sniffFormat — codegen'd substring/hex, no
    //     codec); the oracle derives expected formats and byte sizes
    //     from the construction rule — independent ground truth. ---
    "q261_media_sniff" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val magic = when(pmod(col("doc_id"), lit(4)) === 0,
          lit("89504E470D0A1A0A"))
        .when(pmod(col("doc_id"), lit(4)) === 1, lit("FFD8FFE0"))
        .when(pmod(col("doc_id"), lit(4)) === 2, lit("52494646"))
        .otherwise(lit("47494638"))
      val payload = concat(unhex(magic), encode(col("text"), "UTF-8"))
      docs.select(col("lang"),
          graft.llm.Multimodal.sniffFormat(payload).as("format"),
          length(payload).cast("long").as("n_bytes"))
        .groupBy(col("format"), col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"))
        .orderBy(col("format"), col("lang"))
    },

    // --- CONTINUOUS (interpolated) percentiles — the SQL-standard
    //     percentile_cont complement to the discrete q231 rule: exact
    //     per-group percentile() at DYADIC fractions over integer
    //     cents, so index = (n−1)·p and the linear interpolation are
    //     exact IEEE in both engines (dyadic products of ints < 2^53)
    //     and the doubles hash-match unrounded. The per-group exact
    //     aggregate is the small-group form; unbounded value grids
    //     use ExactQuantile's histogram-refine instead. ---
    "q262_percentile_cont" -> { (spark, dir) =>
      tbl(spark, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(v, array(0.25D, 0.5D, 0.75D))").as("__p"))
        .select(col("l_returnflag"), col("n"),
          col("__p").getItem(0).as("p25_cents"),
          col("__p").getItem(1).as("p50_cents"),
          col("__p").getItem(2).as("p75_cents"))
        .orderBy(col("l_returnflag"))
    },

    // --- EQUI-WIDTH HISTOGRAM profiling: per event type, 10 integer
    //     bins over the cents range [min, max] — bin edges and
    //     assignment in pure integer arithmetic (bin = (v−lo)·10 div
    //     (hi−lo+1)), the numeric-distribution census a profiler
    //     (q161) reports next to its null/distinct counts. Two
    //     passes: a per-type min/max census (broadcast back), then
    //     the binned count — the corpus shuffles once on the type. ---
    "q263_histogram_bins" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      val bounds = ev.groupBy(col("event_type"))
        .agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .withColumn("bin",
          expr("(v - __lo) * 10 div (__hi - __lo + 1)").cast("int"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("v")).as("bin_min"), max(col("v")).as("bin_max"))
        .orderBy(col("event_type"), col("bin"))
    },

    // --- VOCABULARY OVERLAP matrix (set complement of q251's
    //     frequency cosine — overlap predicts near-dup density when
    //     planning dedup): per source pair, |A∩B| via the distinct
    //     (source, token) census self-join, Jaccard and BOTH
    //     containments as exact integer ratios. ---
    "q264_vocab_overlap" -> { (spark, dir) =>
      val vocab = tbl(spark, dir, "documents")
        .select(col("source"),
          explode(graft.llm.TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct()
      val sizes = vocab.groupBy(col("source"))
        .agg(count(lit(1)).as("sz"))
      vocab.alias("a").join(vocab.alias("b"),
          col("a.tok") === col("b.tok") &&
          col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_common"))
        .join(broadcast(sizes.select(col("source").as("source_a"),
          col("sz").as("sz_a"))), Seq("source_a"))
        .join(broadcast(sizes.select(col("source").as("source_b"),
          col("sz").as("sz_b"))), Seq("source_b"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")).cast("double"))
        .withColumn("cont_a", col("n_common").cast("double") /
          col("sz_a").cast("double"))
        .select(col("source_a"), col("source_b"), col("n_common"),
          col("sz_a"), col("sz_b"), col("jaccard"), col("cont_a"))
        .orderBy(col("source_a"), col("source_b"))
    },

    // --- GROUPING SETS (the general form behind q47's rollup and
    //     q92's cube): explicit set list (type, dow) / (type) /
    //     (dow) / () with grouping_id disambiguating which NULLs are
    //     subtotal markers vs data — one pass, Spark expands sets
    //     map-side. ---
    "q265_grouping_sets" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"),
          (dayofweek(col("ts")) - 1).cast("long").as("dow"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      ev.createOrReplaceTempView("graft_q265_ev")
      spark.sql("""
        SELECT event_type, dow, grouping_id() AS gid,
               CAST(count(*) AS BIGINT) AS n,
               sum(cents) AS sum_cents
        FROM graft_q265_ev
        GROUP BY GROUPING SETS ((event_type, dow), (event_type),
          (dow), ())
        ORDER BY gid, event_type, dow""")
    },

    // --- DETERMINISTIC PPS (probability-proportional-to-size)
    //     SAMPLING: a fixed step-S grid over the cumulative revenue
    //     line — part p is drawn n_hits = cum div S − (cum−cents)
    //     div S times (big spenders can be drawn multiply, the PPS
    //     contract). Zero RNG, exact integers, and the cumulative
    //     line is built WITHOUT a global window via q252's bit-length
    //     band decomposition. The audit-sampling primitive. ---
    "q266_pps_sample" -> { (spark, dir) =>
      val rev = tbl(spark, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("cents"))
      val banded = rev.withColumn("band", length(bin(col("cents"))))
      val bandTot = banded.groupBy(col("band"))
        .agg(sum(col("cents")).as("__bc"))
      val bandBefore = bandTot.alias("x")
        .join(broadcast(bandTot.select(col("band").as("__b2"),
          col("__bc").as("__bc2"))), col("__b2") > col("band"), "left")
        .groupBy(col("band"))
        .agg(coalesce(sum(col("__bc2")), lit(0L)).as("__before"))
      val iw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"))
        .orderBy(col("cents").desc, col("l_partkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val tot = rev.agg(sum(col("cents")).as("__tot"))
      banded.join(broadcast(bandBefore), Seq("band"))
        .withColumn("__cum", col("__before") + sum(col("cents")).over(iw))
        .crossJoin(broadcast(tot))
        .withColumn("__s", expr("__tot div 200 + 1"))
        .withColumn("n_hits",
          expr("__cum div __s - (__cum - cents) div __s"))
        .filter(col("n_hits") >= 1)
        .select(col("l_partkey"), col("cents"), col("__cum").as("cum"),
          col("n_hits"))
        .orderBy(col("l_partkey"))
    },

    // --- CALENDAR GAP FILL (series densification): each type's daily
    //     count series completed onto its full [min, max] day grid
    //     with explicit zeros — the precondition for q232/q249-style
    //     window math to mean what it says. The grid generates from
    //     a per-type census row (sequence + explode), never from a
    //     driver loop. ---
    "q267_gap_fill" -> { (spark, dir) =>
      val daily = tbl(spark, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val grid = daily.groupBy(col("event_type"))
        .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
        .select(col("event_type"),
          explode(expr("sequence(__lo, __hi, interval 1 day)"))
            .as("day"))
      grid.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          col("n").isNull.as("filled"))
        .orderBy(col("event_type"), col("day"))
    },

    // --- SFT PROMPT ASSEMBLY: each user's event history rendered as
    //     a chat-format training string (ordered fold of
    //     type=cents pieces between role markers), with the token
    //     budget check that decides truncation BEFORE tokenization
    //     cost is paid. Row-local after one collect per user; the
    //     oracle is an ORDER BY string_agg — byte-identical strings
    //     or nothing. ---
    "q268_chat_render" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      ev.groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("us"), col("event_id"),
          col("event_type"), col("cents")))).as("__xs"))
        .select(col("user_id"),
          size(col("__xs")).cast("long").as("n_events"),
          concat(lit("<|user|> "),
            array_join(transform(col("__xs"), e =>
              concat(e.getField("event_type"), lit("="),
                e.getField("cents").cast("string"))), " "),
            lit(" <|end|>")).as("prompt"))
        .select(col("user_id"), col("n_events"),
          length(col("prompt")).cast("long").as("prompt_chars"),
          graft.llm.TextAnalysis.tokenCount(col("prompt"))
            .cast("long").as("n_tok"),
          (graft.llm.TextAnalysis.tokenCount(col("prompt")) > 64)
            .as("over_budget"),
          substring(col("prompt"), 1, 80).as("prompt_head"))
        .orderBy(col("user_id"))
    },

    // --- DPO PAIR ASSEMBLY: per source, the (chosen, rejected)
    //     document pair by quality score — chosen = argmax(score,
    //     tie→lowest id), rejected = argmin(score, tie→lowest id) —
    //     via single-pass min/max struct aggregation (no per-source
    //     sort), margins on the bit-exact q97 score. The preference-
    //     pair construction step of RLHF data prep. ---
    "q269_dpo_pairs" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val scored = graft.llm.QualityModel.classify(docs, col("text"))
        .select(col("doc_id"), col("source"), col("score"))
      scored.groupBy(col("source"))
        .agg(
          max(struct(col("score"), (-col("doc_id")).as("__nid"),
            col("doc_id").as("__id"))).as("__c"),
          min(struct(col("score"), col("doc_id").as("__id")))
            .as("__r"))
        .select(col("source"),
          col("__c.__id").as("chosen_id"),
          round(col("__c.score"), 6).as("chosen_score"),
          col("__r.__id").as("rejected_id"),
          round(col("__r.score"), 6).as("rejected_score"),
          round(col("__c.score") - col("__r.score"), 6).as("margin"))
        .orderBy(col("source"))
    },

    // --- TOKENIZER FERTILITY per language (tokens per 100 chars —
    //     the budget planner's conversion rate between corpus bytes
    //     and training tokens): exact integer sums, one division. ---
    "q270_token_fertility" -> { (spark, dir) =>
      tbl(spark, dir, "documents")
        .select(col("lang"), col("n_chars"),
          graft.llm.TextAnalysis.tokenCount(col("text")).cast("long")
            .as("__tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("__tok")).as("sum_tokens"))
        .withColumn("fertility_per_100c",
          (col("sum_tokens") * 100).cast("double") /
            col("sum_chars").cast("double"))
        .orderBy(col("lang"))
    },

    // --- WATERMARK ADVISOR: q244's disorder census turned into the
    //     operational decision — per type, the p99-lateness watermark
    //     and the EXACT fraction of events that watermark would drop
    //     (integer-threshold quantile + an integer census, so the
    //     recommendation is replayable, not estimated). ---
    "q271_watermark_advisor" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val late2 = ev
        .withColumn("__mx", max(col("us")).over(w))
        .withColumn("late_min", greatest(
          coalesce(col("__mx") - col("us"), lit(0L)), lit(0L)))
        .withColumn("late_min", expr("late_min div 60000000"))
      val qs = graft.operators.ExactQuantile.weightedQuantileDisc(
          late2, col("event_type"), col("late_min"), lit(1L),
          Seq(("wm_min", 99, 100)))
        .select(col("grp").as("event_type"), col("wm_min"))
      late2.join(broadcast(qs), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("wm_min")).as("wm_min"),
          sum(when(col("late_min") > col("wm_min"), 1L).otherwise(0L))
            .as("n_dropped"))
        .withColumn("drop_frac", col("n_dropped").cast("double") /
          col("n").cast("double"))
        .orderBy(col("event_type"))
    },

    // --- VOCABULARY GROWTH CURVE (Heaps' law readout — how fast new
    //     types appear as the corpus grows in doc_id order): NOT k
    //     prefix-distinct scans; ONE census of each token's FIRST
    //     document (min doc_id per token), then vocab(N) = #tokens
    //     with first_doc ≤ N — the growth curve for every checkpoint
    //     from a single corpus pass + a tiny broadcast join. ---
    "q272_vocab_growth" -> { (spark, dir) =>
      val first = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          explode(graft.llm.TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(min(col("doc_id")).as("__first"))
      val checkpoints = Seq(100L, 200L, 400L, 800L, 1600L, 3200L,
        6400L, 12800L)
      val cps = spark.createDataFrame(
        checkpoints.map(Tuple1(_))).toDF("n_docs")
      first.crossJoin(broadcast(cps))
        .filter(col("__first") <= col("n_docs"))
        .groupBy(col("n_docs"))
        .agg(count(lit(1)).as("vocab_size"))
        .orderBy(col("n_docs"))
    },

    // --- LSH PARAMETER PLANNER: the (bands b, rows r) collision
    //     curve P(candidate | s) = 1 − (1 − s^r)^b on a similarity
    //     grid s = i/20 — the table an engineer reads to pick the
    //     q26/q53 banding. s^r is EXACT integer arithmetic (i^r/20^r);
    //     the outer power folds by REPEATED MULTIPLICATION over
    //     sequence(1, b) in both engines — same order, same IEEE
    //     doubles, no libm pow anywhere. ---
    "q273_lsh_planner" -> { (spark, dir) =>
      val grid = spark.range(1, 20)
        .select(col("id").cast("long").as("i"))
      // r capped at 12: s^r runs in exact integers and 20^12 = 4·10^15
      // stays inside a long (20^16 would overflow)
      val configs = Seq((16, 4), (8, 8), (32, 2), (4, 12))
      val cfg = spark.createDataFrame(configs).toDF("b", "r")
      grid.crossJoin(broadcast(cfg))
        .withColumn("__num", expr(
          "aggregate(sequence(1, r), CAST(1 AS BIGINT), (a, x) -> a * i)"))
        .withColumn("__den", expr(
          "aggregate(sequence(1, r), CAST(1 AS BIGINT), " +
            "(a, x) -> a * CAST(20 AS BIGINT))"))
        .withColumn("__miss",
          lit(1.0) - col("__num").cast("double") /
            col("__den").cast("double"))
        .withColumn("p_candidate", lit(1.0) - expr(
          "aggregate(sequence(1, b), CAST(1.0 AS DOUBLE), " +
            "(a, x) -> a * __miss)"))
        .select((col("i").cast("double") / 20.0).as("s"),
          col("b"), col("r"), col("p_candidate"))
        .orderBy(col("s"), col("b"))
    },

    // --- COMPACTION PLANNER (next-fit bin packing): per source, how
    //     many ~4000-char output files a size-DESC next-fit pass
    //     would produce from its documents — the planning census a
    //     small-file compactor (Sinks.compact) runs before touching
    //     data. Ordered integer fold per source (the q250 state
    //     machinery; next-fit is the O(1)-state streaming packing,
    //     honest 2× bound vs optimal). ---
    "q274_compaction_planner" -> { (spark, dir) =>
      val cap = 4000L
      val lists = tbl(spark, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("total_chars"),
          count(lit(1)).as("n_files"),
          array_sort(collect_list(struct((-col("n_chars")).as("__neg"),
            col("doc_id").as("__id"), col("n_chars").as("__sz"))))
            .as("__xs"))
      val init = array(lit(0L), lit(cap))
      val st = org.apache.spark.sql.functions.aggregate(col("__xs"),
        init, (s, e) => {
          val sz = e.getField("__sz")
          when(element_at(s, 2) + sz <= cap,
            array(element_at(s, 1), element_at(s, 2) + sz))
            .otherwise(array(element_at(s, 1) + 1, sz))
        })
      lists.select(col("source"), col("n_files"), col("total_chars"),
          st.as("__st"))
        .select(col("source"), col("n_files"), col("total_chars"),
          element_at(col("__st"), 1).as("n_bins"))
        .withColumn("fill_frac", col("total_chars").cast("double") /
          (col("n_bins") * cap).cast("double"))
        .orderBy(col("source"))
    },

    // --- SURROGATE KEY ASSIGNMENT without a global window: dense
    //     deterministic ids for the distinct (source, lang) dimension
    //     tuples via the q212 bucket-offset rank over the md5 order —
    //     the conformed-dimension build step, reproducible across
    //     reruns and resharding. ---
    "q275_surrogate_keys" -> { (spark, dir) =>
      val dims = tbl(spark, dir, "documents")
        .select(concat_ws("|", col("source"), col("lang")).as("dim"))
        .distinct()
      graft.llm.Sharding.globalShuffleShards(dims, col("dim"),
          seed = "dim1", shardSize = 1000000L)
        .select(col("id").as("dim"), col("rn").as("sk"))
        .orderBy(col("sk"))
    },

    // --- VALUE-DOMAIN DRIFT: exact median cents per type, first half
    //     of the backlog vs second (time midpoint) — the value-shift
    //     complement to q260's order drift and q229's KS distance,
    //     via the integer-threshold quantile rule twice. ---
    "q276_quantile_shift" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val b = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        .collect()(0)
      val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
      def med(half: org.apache.spark.sql.DataFrame, name: String) =
        graft.operators.ExactQuantile.weightedQuantileDisc(half,
            col("event_type"), col("cents"), lit(1L),
            Seq((name, 1, 2)))
          .select(col("grp").as("event_type"),
            col("total_w").as(name + "_n"), col(name))
      med(ev.filter(col("us") <= mid), "p50_first")
        .join(med(ev.filter(col("us") > mid), "p50_second"),
          Seq("event_type"))
        .withColumn("shift_cents",
          col("p50_second") - col("p50_first"))
        .orderBy(col("event_type"))
    },

    // --- REFERENTIAL-INTEGRITY CENSUS across the star schema (the
    //     FK complement to q203's unique/null/range rules): per
    //     relation, child rows, distinct child keys, orphans (keys
    //     with no parent) — left-anti joins on the keys only. ---
    "q277_fk_orphans" -> { (spark, dir) =>
      def fk(name: String, child: org.apache.spark.sql.DataFrame,
             ck: String, parent: org.apache.spark.sql.DataFrame,
             pk: String) = {
        val orphan = child.select(col(ck)).join(
          parent.select(col(pk).as(ck)), Seq(ck), "left_anti")
        child.agg(count(lit(1)).as("n_child"),
            count_distinct(col(ck)).as("n_keys"))
          .crossJoin(broadcast(
            orphan.agg(count(lit(1)).as("n_orphan_rows"))))
          .withColumn("relation", lit(name))
          .select(col("relation"), col("n_child"), col("n_keys"),
            col("n_orphan_rows"),
            (col("n_orphan_rows") === 0).as("intact"))
      }
      val li = tbl(spark, dir, "lineitem")
      val orders = tbl(spark, dir, "orders")
      val cust = tbl(spark, dir, "customer")
      val nation = tbl(spark, dir, "nation")
      fk("lineitem.l_orderkey->orders", li, "l_orderkey",
          orders.select(col("o_orderkey").as("l_orderkey")),
          "l_orderkey")
        .unionByName(fk("orders.o_custkey->customer", orders,
          "o_custkey", cust.select(col("c_custkey").as("o_custkey")),
          "o_custkey"))
        .unionByName(fk("customer.c_nationkey->nation", cust,
          "c_nationkey",
          nation.select(col("n_nationkey").as("c_nationkey")),
          "c_nationkey"))
        .orderBy(col("relation"))
    },

    // --- K-ANONYMITY / L-DIVERSITY AUDIT over quasi-identifiers
    //     (source, n_chars div 100) with `lang` as the sensitive
    //     attribute: equivalence-class census, min class size (the
    //     k), share of rows in classes below k=5, and min distinct
    //     sensitive values per class (the l) — the privacy readout a
    //     training corpus release runs before publication. Exact
    //     integers end to end. ---
    "q278_k_anonymity" -> { (spark, dir) =>
      val classes = tbl(spark, dir, "documents")
        .select(col("source"), expr("n_chars div 100").as("len_bucket"),
          col("lang"))
        .groupBy(col("source"), col("len_bucket"))
        .agg(count(lit(1)).as("__sz"),
          count_distinct(col("lang")).as("__l"))
      classes.agg(
          count(lit(1)).as("n_classes"),
          sum(col("__sz")).as("n_rows"),
          min(col("__sz")).as("k_anonymity"),
          min(col("__l")).as("l_diversity"),
          sum(when(col("__sz") < 5, col("__sz")).otherwise(0L))
            .as("rows_below_k5"))
        .withColumn("frac_below_k5",
          col("rows_below_k5").cast("double") /
            col("n_rows").cast("double"))
    },

    // --- RESHARD MOVEMENT CENSUS (the resharding-cost planner):
    //     going from k=8 to 9 shards, what fraction of keys moves
    //     under (a) mod placement (≈ 8/9 move — the naive scheme's
    //     cliff) vs (b) RANGE placement on the md5 space (only ≈ 1/9
    //     move — why consistent/range sharding wins). Pure integer
    //     hash math, one scan. ---
    "q279_reshard_census" -> { (spark, dir) =>
      val k = 8
      val h = conv(substring(md5(col("doc_id").cast("string")
        .cast(org.apache.spark.sql.types.BinaryType)), 1, 8), 16, 10)
        .cast("long")
      tbl(spark, dir, "documents")
        .select(col("doc_id"), h.as("__h"))
        .select(col("doc_id"),
          pmod(col("__h"), lit(k.toLong)).as("__m8"),
          pmod(col("__h"), lit((k + 1).toLong)).as("__m9"),
          expr(s"__h * $k div 4294967296").as("__r8"),
          expr(s"__h * ${k + 1} div 4294967296").as("__r9"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("__m8") =!= col("__m9"), 1L).otherwise(0L))
            .as("moved_mod"),
          sum(when(col("__r8") =!= col("__r9"), 1L).otherwise(0L))
            .as("moved_range"))
        .withColumn("frac_moved_mod", col("moved_mod").cast("double")
          / col("n_keys").cast("double"))
        .withColumn("frac_moved_range",
          col("moved_range").cast("double") /
            col("n_keys").cast("double"))
    },

    // --- SAMPLE REPRESENTATIVENESS audit: does the deterministic 10%
    //     md5 sample (Pipelines.hashBucket < 10) preserve the
    //     language mix? Per lang: population/sample counts, expected
    //     sample count, chi² term — exact integer counts, the
    //     expected/term doubles computed by the identical pinned
    //     expression both engines. ---
    "q280_sample_representativeness" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (Pipelines.hashBucket(col("doc_id"), 100) < 10)
            .as("__in_sample"))
      val per = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pop"),
          sum(when(col("__in_sample"), 1L).otherwise(0L))
            .as("n_samp"))
      val tot = per.agg(sum(col("n_pop")).as("__tp"),
        sum(col("n_samp")).as("__ts"))
      per.crossJoin(broadcast(tot))
        .withColumn("expected",
          col("n_pop").cast("double") * col("__ts").cast("double") /
            col("__tp").cast("double"))
        .withColumn("chi2_term",
          (col("n_samp").cast("double") - col("expected")) *
            (col("n_samp").cast("double") - col("expected")) /
            col("expected"))
        .select(col("lang"), col("n_pop"), col("n_samp"),
          col("expected"), col("chi2_term"))
        .orderBy(col("lang"))
    },

    // --- NEAR-DUP CLUSTER SIZE DISTRIBUTION (sizing the dedup
    //     budget: how much of the corpus sits in big clusters):
    //     q75's synthetic edge set -> connected components ->
    //     singleton completion -> size histogram; the oracle extends
    //     q75's recursive-CTE replay with the same two censuses. ---
    "q281_cluster_sizes" -> { (spark, dir) =>
      val ids = tbl(spark, dir, "documents").select(col("doc_id"))
      val chain = ids.alias("a").join(ids.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            pmod(col("a.doc_id"), lit(7)) =!= 6)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val cross = ids.alias("a").join(ids.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 14 &&
            pmod(col("a.doc_id"), lit(21)) === 3)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val comp = Dedup.connectedComponents(
        chain.unionByName(cross), col("id_a"), col("id_b"))
      ids.join(comp, ids("doc_id") === comp("id"), "left")
        .select(coalesce(col("comp"), col("doc_id")).as("comp"))
        .groupBy(col("comp")).agg(count(lit(1)).as("__sz"))
        .groupBy(col("__sz"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("__sz").as("cluster_size"), col("n_clusters"))
        .orderBy(col("cluster_size"))
    },

    // --- STREAMING CURATION PIPELINE end-to-end (the composed
    //     flagship of the streaming surface): documents arrive as 3
    //     chronological micro-batches; each batch flows through the
    //     bit-exact quality classifier, survivors dedup by portable
    //     content fingerprint in KEYED STATE (min-id keeper, copy
    //     count — update mode), and the final state censuses per
    //     language. Stream/batch parity: the oracle replays
    //     classify -> fingerprint-group -> census relationally over
    //     the whole corpus — a hash match proves the micro-batched
    //     pipeline converges to the batch answer. ---
    "q282_stream_curate" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val mx = docs.agg(max(col("doc_id")).as("m")).collect()(0)
        .getLong(0)
      val src = Scratch.dir("graft_q282").toString + "/docs"
      EventStream.writeOrderedBatches(Seq(
        docs.filter(col("doc_id") * 3 <= mx),
        docs.filter(col("doc_id") * 3 > mx &&
          col("doc_id") * 3 <= 2 * mx),
        docs.filter(col("doc_id") * 3 > 2 * mx)), src)
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      // per-batch observability rides the drain (StreamObserve): a
      // quality stage eating a micro-batch below the floor stops the
      // stream and aborts loudly instead of censusing a gutted corpus
      val obs = new graft.streaming.StreamPipelineObserver(
        keptFloor = Some(0.05))
      val kept = obs.checkpoint("quality",
        graft.llm.QualityModel.classify(
            obs.checkpoint("raw", stream), col("text"))
          .filter(col("keep")))
      val agg = kept.groupBy(
          graft.llm.TextAnalysis.fingerprintPortable(col("text"))
            .as("fp"), col("lang"))
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_copies"))
      // update mode emits one row per (fp, lang) per changing batch;
      // the LAST state has the max copy count (monotone) and its
      // keeper (min doc_id seen, which only moves when count does)
      EventStream.runToCompletionObserved(spark, agg, obs,
          mode = "update")
        .groupBy(col("fp"), col("lang"))
        .agg(max(struct(col("n_copies"),
          (-col("keeper_id")).as("__nk"))).as("__f"))
        .select(col("lang"), col("__f.n_copies").as("n_copies"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_copies")).as("n_docs"))
        .orderBy(col("lang"))
    },

    // --- INCREMENTAL CURATION (q282's other twin): day-1 half is
    //     curated and its (fp, lang, keeper, count) state PERSISTED;
    //     day-2 curates ONLY its own documents and merges additively
    //     into the store (min keeper, summed counts) — history is
    //     never re-classified or re-fingerprinted. Same full-rebuild
    //     oracle as q282: incremental ≡ batch, proven by hash. ---
    "q283_incremental_curate" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val mx = docs.agg(max(col("doc_id")).as("m")).collect()(0)
        .getLong(0)
      def curate(d: org.apache.spark.sql.DataFrame) =
        graft.llm.QualityModel.classify(d, col("text"))
          .filter(col("keep"))
          .groupBy(graft.llm.TextAnalysis
            .fingerprintPortable(col("text")).as("fp"), col("lang"))
          .agg(min(col("doc_id")).as("keeper_id"),
            count(lit(1)).as("n_copies"))
      val store = Scratch.dir("graft_q283").toString + "/store"
      curate(docs.filter(col("doc_id") * 2 <= mx))
        .write.parquet(store)
      spark.read.parquet(store)
        .unionByName(curate(docs.filter(col("doc_id") * 2 > mx)))
        .groupBy(col("fp"), col("lang"))
        .agg(min(col("keeper_id")).as("keeper_id"),
          sum(col("n_copies")).as("n_copies"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_copies")).as("n_docs"))
        .orderBy(col("lang"))
    },

    // --- RETENTION FORECAST (storage-reclaim planning): events
    //     bucketed by age in 7-day steps behind the backlog's max
    //     event time; per bucket, rows and value-cents, plus the
    //     cumulative share a "drop buckets older than this" TTL
    //     would reclaim — exact integers, the cumulative via a tiny
    //     bucket-keyed non-equi self-join (≤ a few dozen rows), not
    //     a global window. ---
    "q284_retention_forecast" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
        .select(unix_micros(col("ts").cast("timestamp")).as("us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val mx = ev.agg(max(col("us")).as("__mx"))
      val buckets = ev.crossJoin(broadcast(mx))
        .withColumn("age_bucket",
          expr("(__mx - us) div (7L * 86400000000)"))
        .groupBy(col("age_bucket"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("cents"))
      val older = buckets.select(col("age_bucket").as("__b2"),
        col("n_rows").as("__n2"))
      buckets.join(broadcast(older), col("__b2") >= col("age_bucket"),
          "left")
        .groupBy(col("age_bucket"))
        .agg(max(col("n_rows")).as("n_rows"), max(col("cents")).as("cents"),
          sum(col("__n2")).as("rows_reclaimed_if_ttl_here"))
        .orderBy(col("age_bucket"))
    },

    // --- DICTIONARY-ENCODING PLANNER (columnar layout sizing): per
    //     string column of documents, cardinality vs row count and
    //     the exact byte arithmetic of plain vs dictionary encoding
    //     (distinct-value bytes + a 4-byte code per row) — the
    //     decision table behind parquet encoding choices. One scan
    //     per column over a melted projection. ---
    "q285_dict_encoding_planner" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
      val melted = docs.select(explode(array(
          struct(lit("lang").as("column"), col("lang").as("v")),
          struct(lit("source").as("column"), col("source").as("v"))))
          .as("m"))
        .select(col("m.column").as("column"), col("m.v").as("v"))
      melted.groupBy(col("column"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("v")).as("n_distinct"),
          sum(expr("octet_length(v)")).as("bytes_plain"))
        .join(melted.distinct().groupBy(col("column"))
          .agg(sum(expr("octet_length(v)")).as("__dict_bytes")),
          Seq("column"))
        .withColumn("bytes_dict",
          col("__dict_bytes") + col("n_rows") * 4)
        .withColumn("dict_wins", col("bytes_dict") < col("bytes_plain"))
        .select(col("column"), col("n_rows"), col("n_distinct"),
          col("bytes_plain"), col("bytes_dict"), col("dict_wins"))
        .orderBy(col("column"))
    },

    // --- SHIP-DELAY SLA census: order-date -> ship-date lag per
    //     priority class, with exact integer-day p50/p90 (the q231
    //     threshold rule) and the share beyond a 90-day SLA — exact
    //     integers, one broadcast-ready fact-dim equi-join. ---
    "q286_ship_delay_sla" -> { (spark, dir) =>
      val delays = tbl(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(tbl(spark, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"),
            col("o_orderdate"), col("o_orderpriority")),
          Seq("l_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("delay_days"))
      val qs = graft.operators.ExactQuantile.weightedQuantileDisc(
          delays, col("o_orderpriority"), col("delay_days"), lit(1L),
          Seq(("p50_days", 1, 2), ("p90_days", 9, 10)))
        .select(col("grp").as("o_orderpriority"), col("p50_days"),
          col("p90_days"))
      delays.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          max(col("delay_days")).as("max_days"),
          sum(when(col("delay_days") > 90, 1L).otherwise(0L))
            .as("n_breach"))
        .join(broadcast(qs), Seq("o_orderpriority"))
        .withColumn("breach_frac", col("n_breach").cast("double") /
          col("n").cast("double"))
        .orderBy(col("o_orderpriority"))
    },

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

    // --- DEDUP SAVINGS ESTIMATOR: q281's clusters priced in BYTES —
    //     per near-dup cluster keep the min-id member, count the
    //     docs and chars removed; the "is the dedup pass worth the
    //     compute" answer. One census join over the component map;
    //     exact integers. ---
    "q290_dedup_savings" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val ids = docs.select(col("doc_id"))
      val chain = ids.alias("a").join(ids.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 1 &&
            pmod(col("a.doc_id"), lit(7)) =!= 6)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val cross = ids.alias("a").join(ids.alias("b"),
          col("b.doc_id") === col("a.doc_id") + 14 &&
            pmod(col("a.doc_id"), lit(21)) === 3)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val comp = Dedup.connectedComponents(
        chain.unionByName(cross), col("id_a"), col("id_b"))
      val mapped = docs.join(comp, docs("doc_id") === comp("id"),
          "left")
        .select(col("doc_id"), col("n_chars"),
          coalesce(col("comp"), col("doc_id")).as("comp"))
      val perCluster = mapped.groupBy(col("comp"))
        .agg(count(lit(1)).as("__n"), sum(col("n_chars")).as("__chars"),
          min(struct(col("doc_id"), col("n_chars"))).as("__keep"))
      perCluster.agg(
          count(lit(1)).as("n_clusters"),
          sum(col("__n")).as("n_docs"),
          sum(col("__n") - 1).as("n_removed"),
          sum(col("__chars") - col("__keep.n_chars"))
            .as("chars_removed"),
          sum(col("__chars")).as("chars_total"))
        .withColumn("savings_frac",
          col("chars_removed").cast("double") /
            col("chars_total").cast("double"))
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

    // --- CHUNKED token-bucket replay (q250's bounded-memory twin):
    //     the same lazy-refill fold, but events segment into
    //     16-element position chunks folded with carry-over state —
    //     no row ever holds a full entity history, the hot-entity
    //     (bot-traffic) offline-replay shape. The oracle is q250's
    //     whole-list SQL verbatim: a hash match PROVES the chunked
    //     chain replays the unsegmented fold on real data. ---
    "q293_rate_limit_chunked" -> { (spark, dir) =>
      val ev = tbl(spark, dir, "events")
      graft.operators.RateLimit.tokenBucketChunked(ev, col("user_id"),
          unix_micros(col("ts").cast("timestamp")), col("event_id"),
          capacity = 3L, chunkSize = 16)
        .select(col("entity").as("user_id"), col("n_events"),
          col("n_accepted"), col("n_rejected"), col("tokens_left"))
        .orderBy(col("user_id"))
    }
  )

  /** DuckDB-equivalent ANSI SQL per query (same column names & rounding). */
  def oracleSql: Map[String, String] = Map(
    "q01_groupby_aggs" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 4) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_extendedprice), 6) AS avg_price,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_select_sort" -> """
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1 - l_discount), 4) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'
        AND l_discount > 0.05
      ORDER BY l_extendedprice * (1 - l_discount) DESC,
               l_orderkey, l_linenumber
      LIMIT 100""",

    "q03_edges_set_dense" -> """
      WITH d(status, ord) AS (VALUES ('O',0),('F',1),('P',2),('X',3)),
      s AS (SELECT o_orderstatus AS status, count(*) AS n,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders GROUP BY 1)
      SELECT d.status, coalesce(s.n, 0) AS n, s.sum_price
      FROM d LEFT JOIN s USING (status)
      ORDER BY d.ord""",

    "q04_edges_time" -> """
      WITH d AS (SELECT unnest(generate_series(TIMESTAMP '1996-01-01',
                   TIMESTAMP '1996-03-25', INTERVAL 7 DAY)) AS week),
      s AS (SELECT TIMESTAMP '1996-01-01'
                   + CAST(floor(date_diff('day', TIMESTAMP '1996-01-01',
                       o_orderdate) / 7) AS INT) * INTERVAL 7 DAY AS week,
                   count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY 1)
      SELECT CAST(d.week AS DATE) AS week, coalesce(s.n, 0) AS n, s.sum_price
      FROM d LEFT JOIN s ON d.week = s.week
      ORDER BY d.week""",

    "q05_edges_range" -> """
      WITH d AS (SELECT CAST(unnest(generate_series(0, 50, 10)) AS DOUBLE)
                   AS qty_bucket),
      s AS (SELECT floor(l_quantity / 10) * 10 AS qty_bucket,
                   count(*) AS n, round(avg(l_extendedprice), 6) AS avg_price
            FROM lineitem GROUP BY 1)
      SELECT d.qty_bucket, coalesce(s.n, 0) AS n, s.avg_price
      FROM d LEFT JOIN s USING (qty_bucket)
      ORDER BY d.qty_bucket""",

    "q06_edges_topk" -> """
      SELECT p_brand AS brand, count(*) AS n,
             round(sum(p_retailprice), 2) AS sum_retail
      FROM part GROUP BY 1
      ORDER BY count(*) DESC, p_brand
      LIMIT 5""",

    "q07_edges_predicate" -> """
      WITH d(tier, ord) AS (VALUES ('negative',0),('low',1),('high',2)),
      s AS (SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                        WHEN c_acctbal >= 0 AND c_acctbal < 5000 THEN 'low'
                        WHEN c_acctbal >= 5000 THEN 'high' END AS tier,
                   count(*) AS n, round(avg(c_acctbal), 6) AS avg_bal
            FROM customer GROUP BY 1)
      SELECT d.tier, coalesce(s.n, 0) AS n, s.avg_bal
      FROM d LEFT JOIN s USING (tier)
      ORDER BY d.ord""",

    "q08_window" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber,
             round(sum(l_quantity) OVER w, 4) AS running_qty,
             lag(l_quantity) OVER w2 AS prev_qty,
             CAST(row_number() OVER w2 - 1 AS INT) AS rn
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-02-01'
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber)
      ORDER BY l_suppkey, rn""",

    "q09_global_aggs" -> """
      SELECT count(*) AS n, round(sum(l_quantity), 4) AS sum_qty,
             min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
             round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
             round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
             count(DISTINCT l_partkey) AS n_parts,
             round(stddev_samp(l_quantity), 6) AS std_qty
      FROM lineitem""",

    "q10_string_exprs" -> """
      SELECT p_partkey,
             substr(p_name, 1, 5) AS name_l5,
             substr(p_name, greatest(length(p_name) - 3, 1), 4) AS name_r4,
             substr(p_name, 7, greatest(length(p_name) - 6, 0)) AS name_tail,
             NULLIF(strpos(p_name, 'ol'), 0) - 1 AS pos_ol,
             concat_ws(' / ', p_brand, p_type) AS brand_type,
             (p_type LIKE 'ECONOMY%') AS is_economy,
             regexp_full_match(p_name, '.*red.*') AS has_red,
             length(p_name) AS n_words
      FROM part ORDER BY p_partkey""",

    "q11_null_semantics" -> """
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN '' ELSE c_name END AS maybe_name,
             (CASE WHEN c_acctbal < 0 THEN '' ELSE c_name END IS NULL OR
              CASE WHEN c_acctbal < 0 THEN '' ELSE c_name END = '')
               AS is_missing,
             COALESCE(NULLIF(CASE WHEN c_acctbal < 0 THEN ''
                                  ELSE c_name END, ''), 'NONE') AS fallback,
             c_acctbal AS add_ignores_missing,
             CAST(0 AS DOUBLE) AS all_missing_default,
             TRUE AS eq_null_safe
      FROM customer ORDER BY c_custkey""",

    "q12_time_exprs" -> """
      SELECT CAST(to_timestamp(floor(epoch(ts) / 86400) * 86400) AS DATE)
               AS day,
             count(*) AS n
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-20'
      GROUP BY 1 ORDER BY 1""",

    "q13_collect_aggs" -> """
      SELECT l_returnflag,
             array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
               AS statuses,
             count(DISTINCT l_linestatus) AS n_status,
             min(l_returnflag) AS one_flag
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q14_join_enrich" -> """
      SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1 ORDER BY 1""",

    "q15_semi_join" -> """
      SELECT o_orderstatus, count(*) AS n
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
      GROUP BY 1 ORDER BY 1""",

    "q16_anti_join" -> """
      SELECT n_name, count(*) AS n_inactive
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01')
      GROUP BY 1 ORDER BY 1""",

    "q17_union_concat" -> """
      WITH u AS (
        SELECT c_custkey AS key, c_acctbal AS acctbal,
               c_mktsegment AS segment, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_suppkey, s_acctbal, NULL, 'supplier' FROM supplier)
      SELECT kind, count(*) AS n, round(sum(acctbal), 2) AS sum_bal,
             count(segment) AS n_with_segment
      FROM u GROUP BY 1 ORDER BY 1""",

    "q18_nested_reassembly" -> """
      WITH lines AS (
        SELECT l_orderkey AS o_orderkey,
               CAST(count(*) AS INT) AS n_lines,
               array_to_string(list(CAST(l_quantity AS INT)
                 ORDER BY l_linenumber, l_quantity), ',') AS quantities
        FROM lineitem GROUP BY 1)
      SELECT o.o_orderkey, coalesce(l.n_lines, 0) AS n_lines, l.quantities
      FROM orders o LEFT JOIN lines l USING (o_orderkey)
      ORDER BY o.o_orderkey""",

    "q19_events_cube" -> """
      WITH d AS (SELECT unnest(generate_series(DATE '2024-01-01',
                   DATE '2024-01-07', INTERVAL 1 DAY)) AS day),
      e AS (SELECT unnest(['click','view','purchase','signup','error'])
              AS etype, unnest([0,1,2,3,4]) AS eord),
      s AS (SELECT CAST(ts AS DATE) AS day, event_type AS etype,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
            GROUP BY 1, 2)
      SELECT CAST(d.day AS DATE) AS day, e.etype,
             coalesce(s.n, 0) AS n, s.sum_value
      FROM d CROSS JOIN e
      LEFT JOIN s ON s.day = d.day AND s.etype = e.etype
      ORDER BY d.day, e.eord""",

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

    "q21_dedup_ids" -> """
      SELECT event_type, count(DISTINCT user_id) AS n_user_types
      FROM events GROUP BY 1 ORDER BY 1""",

    "q22_text_quality" -> """
      WITH t AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents)
      SELECT doc_id, length(text) AS n_chars,
             CAST(len(toks) AS INT) AS n_tokens,
             CASE WHEN length(text) > 0 THEN
               round(CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                     AS DOUBLE) / length(text), 6) END AS punct_ratio,
             CASE WHEN len(toks) > 0 THEN
               round(CAST(len(list_filter(toks, x -> list_contains(
                 ['the','a','an','and','or','of','to','in','is','it','that',
                  'for','on','with','as','was','at','by','be','this'], x)))
                 AS DOUBLE) / len(toks), 6) END AS stopword_ratio,
             CASE WHEN len(toks) > 0 THEN
               round(CAST(list_sum(list_transform(toks, x -> length(x)))
                 AS DOUBLE) / len(toks), 6) END AS mean_word_len
      FROM t ORDER BY doc_id""",

    "q23_token_counts" -> """
      SELECT lang,
             CAST(sum(len(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0))) AS BIGINT) AS ws_tokens,
             CAST(sum(CAST(list_sum(list_transform(
               regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'),
               p -> ceil(length(p) / 6.0))) AS BIGINT)) AS BIGINT)
               AS bpeish_tokens
      FROM documents GROUP BY 1 ORDER BY 1""",

    "q25_dedup_exact" -> """
      WITH u AS (
        SELECT * FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang, source, n_chars
        FROM documents),
      d AS (SELECT source,
                   row_number() OVER (PARTITION BY text ORDER BY doc_id)
                     AS rn
            FROM u)
      SELECT source, count(*) AS n_docs
      FROM d WHERE rn = 1 GROUP BY 1 ORDER BY 1""",

    "q28_ann_cosine" -> """
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 8),
      s AS (SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv) AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id)
      SELECT query_id, vec_id,
             CAST(row_number() OVER w AS INT) AS rank,
             round(cosine, 6) AS cosine
      FROM s
      WINDOW w AS (PARTITION BY query_id ORDER BY cosine DESC, vec_id)
      QUALIFY row_number() OVER w <= 5
      ORDER BY query_id, rank""",

    "q31_stream_tumbling" -> """
      SELECT CAST(ts AS DATE) AS day, event_type,
             count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q32_etl_parse" -> """
      SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1""",

    "q33_etl_lineage" -> """
      SELECT doc_id, doc_id + 1000000 AS etl_id, 'join' AS etl_type,
             doc_id AS parent_id, 'raw-docs' AS root_bucket,
             source AS root_key, TIMESTAMP '2026-01-01' AS etl_ts,
             'rev1' AS etl_rev
      FROM documents ORDER BY doc_id""",

    // The three timestamp-typed cells are DERIVED from the parquet
    // files via typeof() (DuckDB reads UTC-adjusted parquet timestamps
    // as TIMESTAMP WITH TIME ZONE, NTZ as TIMESTAMP) — a testdata
    // regeneration that flips the writer's UTC flag (as 2026-08-13 did
    // for events.ts) can no longer stale a hard-coded literal.
    "q34_meta_columns" -> """
      SELECT *, false AS virtual FROM (
      SELECT * FROM (VALUES
        ('customer','c_acctbal','double','number','.'),
        ('customer','c_custkey','bigint','number','.'),
        ('customer','c_mktsegment','string','string','.'),
        ('customer','c_name','string','string','.'),
        ('customer','c_nationkey','int','number','.'),
        ('documents','doc_id','bigint','number','.'),
        ('documents','lang','string','string','.'),
        ('documents','n_chars','bigint','number','.'),
        ('documents','source','string','string','.'),
        ('documents','text','string','string','.'),
        ('embeddings','embedding','array<float>','number','.'),
        ('embeddings','label','int','number','.'),
        ('embeddings','vec_id','bigint','number','.'),
        ('events','event_id','bigint','number','.'),
        ('events','event_type','string','string','.'),
        ('events','props','string','string','.'),
        ('events','user_id','bigint','number','.'),
        ('events','value','double','number','.'),
        ('lineitem','l_discount','double','number','.'),
        ('lineitem','l_extendedprice','double','number','.'),
        ('lineitem','l_linenumber','int','number','.'),
        ('lineitem','l_linestatus','string','string','.'),
        ('lineitem','l_orderkey','bigint','number','.'),
        ('lineitem','l_partkey','bigint','number','.'),
        ('lineitem','l_quantity','double','number','.'),
        ('lineitem','l_returnflag','string','string','.'),
        ('lineitem','l_suppkey','bigint','number','.'),
        ('lineitem','l_tax','double','number','.'),
        ('nation','n_name','string','string','.'),
        ('nation','n_nationkey','int','number','.'),
        ('nation','n_regionkey','int','number','.'),
        ('orders','o_custkey','bigint','number','.'),
        ('orders','o_orderkey','bigint','number','.'),
        ('orders','o_orderpriority','string','string','.'),
        ('orders','o_orderstatus','string','string','.'),
        ('orders','o_totalprice','double','number','.'),
        ('part','p_brand','string','string','.'),
        ('part','p_name','string','string','.'),
        ('part','p_partkey','bigint','number','.'),
        ('part','p_retailprice','double','number','.'),
        ('part','p_size','int','number','.'),
        ('part','p_type','string','string','.'),
        ('region','r_name','string','string','.'),
        ('region','r_regionkey','int','number','.'),
        ('supplier','s_acctbal','double','number','.'),
        ('supplier','s_name','string','string','.'),
        ('supplier','s_nationkey','int','number','.'),
        ('supplier','s_suppkey','bigint','number','.'))
        AS t(table_name, column_name, spark_type, jx_type, nested_path)
      UNION ALL
      SELECT 'events', 'ts',
             CASE WHEN ty = 'TIMESTAMP WITH TIME ZONE' THEN 'timestamp'
                  ELSE 'timestamp_ntz' END, 'time', '.'
      FROM (SELECT typeof(ts) AS ty FROM events LIMIT 1)
      UNION ALL
      SELECT 'lineitem', 'l_shipdate',
             CASE WHEN ty = 'TIMESTAMP WITH TIME ZONE' THEN 'timestamp'
                  ELSE 'timestamp_ntz' END, 'time', '.'
      FROM (SELECT typeof(l_shipdate) AS ty FROM lineitem LIMIT 1)
      UNION ALL
      SELECT 'orders', 'o_orderdate',
             CASE WHEN ty = 'TIMESTAMP WITH TIME ZONE' THEN 'timestamp'
                  ELSE 'timestamp_ntz' END, 'time', '.'
      FROM (SELECT typeof(o_orderdate) AS ty FROM orders LIMIT 1)
      )
      ORDER BY table_name, column_name""",

    "q35_json_decode" -> """
      SELECT event_type, count(*) AS n_k,
             CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k
      FROM events GROUP BY 1 ORDER BY 1""",

    "q36_exprs_misc" -> """
      SELECT o_orderkey,
             o_orderstatus IN ('O', 'P') AS is_active,
             CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent'
                  WHEN o_orderpriority LIKE '2%' THEN 'high'
                  ELSE 'normal' END AS prio_class,
             o_orderkey % 7 AS key_mod7,
             round(pow(o_totalprice / 1000, 2), 6) AS power_kprice,
             floor(o_totalprice * 100) / 100 AS price_floor2,
             abs(o_totalprice - 150000) AS abs_centered,
             string_split(o_orderpriority, '-')[2] AS prio_word,
             o_totalprice BETWEEN 50000 AND 150000 AS between_num
      FROM orders ORDER BY o_orderkey""",

    "q37_events_sliding" -> """
      WITH w AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                   TIMESTAMP '2024-01-03 18:00:00', INTERVAL 6 HOUR))
                   AS win_start)
      SELECT w.win_start, count(*) AS n, round(sum(value), 4) AS sum_value
      FROM w JOIN events e
        ON e.ts >= w.win_start AND e.ts < w.win_start + INTERVAL 12 HOUR
      WHERE e.ts >= TIMESTAMP '2024-01-01'
        AND e.ts < TIMESTAMP '2024-01-04'
      GROUP BY 1 ORDER BY 1""",

    "q38_edges_month" -> """
      WITH d AS (SELECT CAST(unnest(generate_series(DATE '1996-01-01',
                   DATE '1996-12-01', INTERVAL 1 MONTH)) AS DATE) AS month),
      s AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1)
      SELECT d.month, coalesce(s.n, 0) AS n, s.sum_price
      FROM d LEFT JOIN s USING (month)
      ORDER BY d.month""",

    "q39_subquery_from" -> """
      WITH per_order AS (
        SELECT l_orderkey,
               sum(l_extendedprice * (1 - l_discount)) AS order_rev,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY 1)
      SELECT n_lines, count(*) AS n_orders,
             round(avg(order_rev), 4) AS avg_rev
      FROM per_order GROUP BY 1 ORDER BY 1""",

    "q40_first_last_exists" -> """
      WITH w AS (
        SELECT l_suppkey,
               first_value(l_quantity) OVER win AS first_qty,
               last_value(l_quantity) OVER
                 (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING) AS last_qty,
               CASE WHEN l_discount > 0.08 THEN 1 END AS hd
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-02-01'
        WINDOW win AS (PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber))
      SELECT l_suppkey, min(first_qty) AS first_qty,
             min(last_qty) AS last_qty,
             bool_or(hd IS NOT NULL) AS any_high_disc
      FROM w GROUP BY 1 ORDER BY 1""",

    "q41_asof_join" -> """
      WITH p AS (SELECT user_id, event_id, ts FROM events
                 WHERE event_type = 'purchase'),
      s AS (SELECT user_id, event_id AS signup_id, ts AS sts FROM events
            WHERE event_type = 'signup')
      SELECT p.user_id, p.event_id, s.signup_id AS asof_event_id
      FROM p ASOF LEFT JOIN s
        ON p.user_id = s.user_id AND p.ts >= s.sts
      ORDER BY p.event_id""",

    "q42_range_join" -> """
      WITH bands(band, lo, hi) AS (VALUES
        ('tiny', 0.0, 50.0), ('small', 50.0, 100.0),
        ('mid', 100.0, 200.0), ('large', 200.0, 500.0),
        ('huge', 500.0, 2000.0))
      SELECT band, count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events JOIN bands ON value >= lo AND value < hi
      GROUP BY 1 ORDER BY 1""",

    // word-3-gram Jaccard via the same inverted-index shape: count shared
    // distinct shingles per pair, sizes from the per-doc distinct sets
    "q43_dedup_ngram" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents),
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
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(CAST(n_shared AS DOUBLE)
                   / (sa.sz + sb.sz - n_shared), 6) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE round(CAST(n_shared AS DOUBLE)
                  / (sa.sz + sb.sz - n_shared), 6) >= 0.5
      ORDER BY id_a, id_b""",

    "q44_dedup_embedding" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS id, v FROM e
            UNION ALL
            SELECT vec_id + 1000000,
                   list_transform(generate_series(1, len(v)), i ->
                     v[i] + CASE WHEN i = CAST(vec_id % len(v) AS INT) + 1
                                 THEN 0.5 ELSE 0.0 END)
            FROM e)
      SELECT a.id AS id_a, b.id AS id_b,
             round(list_cosine_similarity(a.v, b.v), 6) AS cosine
      FROM c a JOIN c b ON a.id < b.id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.8
      ORDER BY id_a, id_b""",

    // IVF probing all cells is exact, so the brute-force ranking is the
    // oracle (same as q28's, modulo the query alias)
    "q45_ann_ivf" -> """
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 8),
      s AS (SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv) AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id)
      SELECT query_id, vec_id,
             CAST(row_number() OVER w AS INT) AS rank,
             round(cosine, 6) AS cosine
      FROM s
      WINDOW w AS (PARTITION BY query_id ORDER BY cosine DESC, vec_id)
      QUALIFY row_number() OVER w <= 5
      ORDER BY query_id, rank""",

    // gap-based session reconstruction; Spark's session_window starts a
    // new session when the gap REACHES the 30-minute bound (window is
    // [start, last+gap)), hence >= here (q20's running-ordinal form
    // uses > — both are valid semantics, pinned per operator)
    "q46_session_window" -> """
      WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            >= 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM g)
      SELECT user_id, min(epoch_us(ts)) AS session_start_us,
             count(*) AS n_ev
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, session_start_us""",

    "q47_rollup" -> """
      SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
                  ELSE l_returnflag END AS rflag,
             CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
                  ELSE l_linestatus END AS lstatus,
             count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY 1, 2""",

    "q48_pivot" -> """
      SELECT CAST(ts AS DATE) AS day,
             count(*) FILTER (WHERE event_type = 'click')    AS click,
             count(*) FILTER (WHERE event_type = 'error')    AS error,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup')   AS signup,
             count(*) FILTER (WHERE event_type = 'view')     AS view
      FROM events GROUP BY 1 ORDER BY 1""",

    // mirrors TextAnalysis.langIdFast: CJK-codepoint share first, then
    // argmax of DISTINCT stopword hits with max-lang tie-break (the
    // struct array_max tie-breaks on the lang string descending)
    "q24_lang_id" -> """
      WITH tk AS (
        SELECT lang, text,
               list_distinct(list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 x -> length(x) > 0)) AS toks
        FROM documents),
      s AS (SELECT lang,
              len(list_intersect(toks, ['der','die','und','das','ist',
                'von','den','mit','nicht','ein'])) AS h_de,
              len(list_intersect(toks, ['the','and','of','to','in','is',
                'that','it','was','for'])) AS h_en,
              len(list_intersect(toks, ['el','la','de','que','y','en',
                'un','los','del','las'])) AS h_es,
              len(list_intersect(toks, ['le','la','les','de','et','est',
                'un','une','dans','que'])) AS h_fr,
              length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g'))
                AS cjk,
              length(text) AS n
            FROM tk),
      p AS (SELECT lang,
              CASE WHEN cjk > 0 AND cjk * 2 >= n THEN 'zh'
                   WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                   WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                   WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                   WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                   ELSE 'de' END AS lang_pred
            FROM s)
      SELECT lang, lang_pred, count(*) AS n
      FROM p GROUP BY 1, 2 ORDER BY 1, 2""",

    // exact-pair count via the SAME df-capped inverted index as q43;
    // the recall floor is asserted as a literal (the Spark side computes
    // |found ∩ exact| / |exact| >= 0.9 — deterministic, measured ~0.98)
    "q26_dedup_minhash" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents),
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
                GROUP BY 1, 2)
      SELECT count(*) AS pairs_exact, TRUE AS recall_floor_met
      FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE round(CAST(n_shared AS DOUBLE)
                  / (sa.sz + sb.sz - n_shared), 6) >= 0.5""",

    // portable md5 simhash recomputed bit-by-bit: token hash = first 16
    // md5 hex chars as a 64-bit value; bit b lives in hex digit
    // 16 - b//4 (1-based from the left) at in-digit position b%4; the
    // simhash bit is the token-majority vote, hamming = differing bits
    "q27_dedup_simhash" -> """
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents),
      h AS (SELECT doc_id, len(toks) AS n,
              list_transform(toks, t -> md5(t)) AS hs,
              list_transform(toks[1:greatest(len(toks) - 5, 1)],
                             t -> md5(t)) AS vhs
            FROM tk),
      b AS (SELECT doc_id, n, hs, vhs,
                   unnest(generate_series(0, 63)) AS bit
            FROM h),
      v AS (SELECT doc_id, n, bit,
              len(list_filter(hs, m ->
                ((strpos('0123456789abcdef',
                         substr(m, 16 - CAST(bit // 4 AS INT), 1)) - 1)
                  >> (bit % 4)) & 1 = 1)) AS v_t,
              len(hs) AS n_t,
              len(list_filter(vhs, m ->
                ((strpos('0123456789abcdef',
                         substr(m, 16 - CAST(bit // 4 AS INT), 1)) - 1)
                  >> (bit % 4)) & 1 = 1)) AS v_v,
              len(vhs) AS n_v
            FROM b)
      SELECT doc_id,
             CASE WHEN max(n) = 0 THEN NULL
                  ELSE CAST(sum(CASE WHEN (v_t * 2 > n_t) <> (v_v * 2 > n_v)
                                     THEN 1 ELSE 0 END) AS BIGINT)
             END AS hamming_to_truncated
      FROM v GROUP BY doc_id ORDER BY doc_id""",

    // exact top-k count from the brute-force ranking (q28's oracle
    // shape); the LSH recall floor is asserted as a literal (Spark
    // computes it deterministically from the fixed hyperplane seeds)
    "q29_ann_lsh" -> """
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 8),
      s AS (SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv) AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
            QUALIFY row_number() OVER (PARTITION BY q.query_id
              ORDER BY cosine DESC, e.vec_id) <= 5)
      SELECT count(*) AS n_exact, TRUE AS recall_floor_met FROM s""",

    // deterministic portable columns only: md5 fingerprint over word
    // 3-gram shingles (min of lowercase hex = engine-neutral string
    // min), md5 payload checksum, UTF-8 byte length, decode-ok flag
    "q30_fingerprint_media" -> """
      WITH tk AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents),
      sh AS (SELECT doc_id, text,
               CASE WHEN len(toks) >= 3 THEN
                      list_transform(
                        generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END AS s
             FROM tk)
      SELECT doc_id,
             list_min(list_transform(s, g -> md5(g))) AS fingerprint,
             md5(text) AS checksum_md5,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             octet_length(encode(text)) > 0 AS decode_ok
      FROM sh ORDER BY doc_id""",

    // re-derives the per-test docs straight from events: subtest status
    // mapping (error->FAIL, purchase->TIMEOUT, else PASS), expected
    // PASS, test_end always OK/OK; worst-status rollup order
    // TIMEOUT > FAIL > PASS > OK
    "q49_mozlog_tests" -> """
      WITH s AS (
        SELECT user_id, event_id,
               CASE WHEN event_type = 'error' THEN 'FAIL'
                    WHEN event_type = 'purchase' THEN 'TIMEOUT'
                    ELSE 'PASS' END AS st
        FROM events)
      SELECT 'test_' || user_id AS test,
             count(*) AS n_subtests,
             CAST(sum(CASE WHEN st <> 'PASS' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_failed,
             'OK' AS end_status,
             CASE WHEN sum(CASE WHEN st = 'TIMEOUT' THEN 1 ELSE 0 END) > 0
                    THEN 'TIMEOUT'
                  WHEN sum(CASE WHEN st = 'FAIL' THEN 1 ELSE 0 END) > 0
                    THEN 'FAIL'
                  ELSE 'PASS' END AS status,
             sum(CASE WHEN st <> 'PASS' THEN 1 ELSE 0 END) = 0 AS ok,
             string_agg('sub_' || event_id, ',' ORDER BY event_id)
               AS subtests_csv
      FROM s GROUP BY user_id ORDER BY test""",

    "q50_edges_duration" -> """
      WITH d AS (SELECT CAST(unnest(generate_series(0, 1500, 300)) AS DOUBLE)
                   AS dur),
      s AS (SELECT floor(value / 300) * 300 AS dur, count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events WHERE value >= 0 AND value < 1800 GROUP BY 1)
      SELECT d.dur, coalesce(s.n, 0) AS n, s.sum_value
      FROM d LEFT JOIN s USING (dur)
      ORDER BY d.dur""",

    // replaying the stream twice and deduplicating by event id must
    // reproduce the single-copy batch aggregate exactly
    "q51_stream_dedup" -> """
      SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1""",

    // the scrub semantics re-derived: %17 lines are fully broken (all
    // fields null), %10 lines lose only the NaN value; nothing errors
    "q52_json_scrub" -> """
      WITH m AS (
        SELECT CASE WHEN event_id % 17 = 0 THEN NULL
                    ELSE event_type END AS t,
               CASE WHEN event_id % 17 = 0 THEN NULL
                    ELSE event_id END AS id,
               CASE WHEN event_id % 17 = 0 OR event_id % 10 = 0 THEN NULL
                    ELSE value END AS v
        FROM events)
      SELECT t, count(*) AS n_rows, count(id) AS n_id, count(v) AS n_v,
             round(sum(v), 4) AS sum_v
      FROM m GROUP BY t ORDER BY t""",

    // exact-pair count on the restricted corpus (vec_id < 1000 +
    // bumped variants); recall floor asserted as a literal
    "q53_dedup_embedding_lsh" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE vec_id < 1000),
      c AS (SELECT vec_id AS id, v FROM e
            UNION ALL
            SELECT vec_id + 1000000,
                   list_transform(generate_series(1, len(v)), i ->
                     v[i] + CASE WHEN i = CAST(vec_id % len(v) AS INT) + 1
                                 THEN 0.5 ELSE 0.0 END)
            FROM e)
      SELECT count(*) AS pairs_exact, TRUE AS recall_floor_met
      FROM c a JOIN c b ON a.id < b.id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.8""",

    "q54_sink_blocks" -> """
      SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value,
             count(DISTINCT CAST(ts AS DATE)) AS n_days
      FROM events GROUP BY 1 ORDER BY 1""",

    // cutoff = 2024-01-31T00:00Z - 10 days
    "q55_sink_rollover" -> """
      SELECT CAST(ts AS DATE) AS __date, count(*) AS n,
             round(sum(value), 4) AS sum_value
      FROM events WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
      GROUP BY 1 ORDER BY 1""",

    "q56_select_leaves" -> """
      SELECT event_id, event_type AS kv_event_type, value AS kv_value
      FROM events ORDER BY event_id LIMIT 100""",

    // ts encodes as truncated unix seconds (monotonic, so max commutes)
    "q57_typed_json_sink" -> """
      SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_v,
             CAST(max(epoch_us(ts) // 1000000) AS DOUBLE) AS max_ts_unix
      FROM events GROUP BY 1 ORDER BY 1""",

    "q58_stats_bundle" -> """
      SELECT l_returnflag, count(l_quantity) AS n,
             round(sum(l_quantity), 4) AS sum_qty,
             round(min(l_quantity), 4) AS min_qty,
             round(max(l_quantity), 4) AS max_qty,
             round(avg(l_quantity), 6) AS avg_qty,
             round(stddev_samp(l_quantity), 6) AS std_qty,
             round(var_samp(l_quantity), 6) AS var_qty
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q59_intersect_except" -> """
      SELECT (SELECT count(*) FROM
                (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
                 INTERSECT
                 SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'))
               AS n_both,
             (SELECT count(*) FROM
                (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
                 EXCEPT
                 SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'))
               AS n_only_open""",

    "q60_salted_agg" -> """
      SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
             count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q61_salted_join" -> """
      SELECT n_name, count(*) AS n_suppliers
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1""",

    "q62_split_sink" -> """
      SELECT event_type, count(*) AS n_all,
             count(*) FILTER (WHERE event_type <> 'error') AS n_filtered
      FROM events GROUP BY 1 ORDER BY 1""",

    "q63_nest_unnest" -> """
      SELECT o_orderstatus, count(*) AS n_lines,
             round(sum(l_quantity), 4) AS sum_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1 ORDER BY 1""",

    "q64_union_list_aggs" -> """
      SELECT o_orderstatus,
             array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
               AS prios_csv,
             array_to_string(list_sort(list(o_orderkey)), ',') AS keys_csv
      FROM orders WHERE o_custkey < 50
      GROUP BY 1 ORDER BY 1""",

    "q65_items" -> """
      SELECT event_id,
             'event_type=' || event_type || ';user_id=' || user_id
               AS items_csv
      FROM events ORDER BY event_id LIMIT 50""",

    // every real window ends before (sentinel - 1h watermark), so the
    // append-mode sink holds the complete batch-parity aggregate
    "q66_stream_file_sink" -> """
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
             round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q67_approx_aggs" -> """
      SELECT count(DISTINCT l_orderkey) AS n_exact,
             TRUE AS card_within_10pct,
             TRUE AS median_within_5pct
      FROM lineitem""",

    "q68_perfherder" -> """
      SELECT event_type AS suite, count(*) AS n,
             round(avg(value), 6) AS avg_value
      FROM events WHERE event_id % 3 = 0
      GROUP BY 1 ORDER BY 1""",

    "q69_coverage" -> """
      SELECT o_orderstatus AS source_file,
             count(*) AS lines_total,
             CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
               AS BIGINT) AS lines_covered,
             round(CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0
                            END) AS DOUBLE) / count(*), 6) AS coverage
      FROM orders GROUP BY 1 ORDER BY 1""",

    // the composite quality score replicated term by term (UNROUNDED
    // ratios feed the score; only the final score rounds to 6), then
    // exact-dedup survivors = distinct portable fingerprints (+1 if a
    // null-fingerprint group survives — exactByKey keeps one row of it)
    "q70_corpus_prep" -> """
      WITH t AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents),
      r AS (SELECT doc_id, text, toks,
              CASE WHEN length(text) > 0 THEN
                CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                  AS DOUBLE) / length(text) ELSE 0.0 END AS pr,
              CASE WHEN len(toks) > 0 THEN
                CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','an','and','or','of','to','in','is','it',
                   'that','for','on','with','as','was','at','by','be',
                   'this'], x))) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS sw,
              CASE WHEN len(toks) > 0 THEN
                CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS DOUBLE) / len(toks) ELSE 0.0 END AS mwl
            FROM t),
      q AS (SELECT doc_id, text, toks,
              round((least(length(text) / 500.0, 1.0)
                + CASE WHEN pr < 0.1 THEN 1.0
                       ELSE greatest(1.0 - (pr - 0.1) * 5, 0.0) END
                + least(sw * 4, 1.0)
                + CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0
                       ELSE 0.5 END) / 4, 6) AS quality
            FROM r),
      pass AS (SELECT doc_id, text, toks FROM q WHERE quality >= 0.3),
      sh AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                      list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END AS s
             FROM pass),
      fp AS (SELECT doc_id,
               list_min(list_transform(s, g -> md5(g))) AS f
             FROM sh)
      SELECT (SELECT count(*) FROM pass) AS n_quality,
             count(DISTINCT f)
               + max(CASE WHEN f IS NULL THEN 1 ELSE 0 END) AS n_exact,
             TRUE AS final_within_bounds
      FROM fp""",

    // widen policy mirrored: value long-vs-double -> double (Spark's
    // double->long cast truncates toward zero, hence trunc());
    // columns absent from a frame -> null
    "q71_schema_merge" -> """
      WITH u AS (
        SELECT event_id, event_type, value, NULL AS user_id
        FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_id, NULL, CAST(trunc(value) AS DOUBLE), user_id
        FROM events WHERE event_id % 2 = 1)
      SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_v,
             count(user_id) AS n_user
      FROM u GROUP BY 1 ORDER BY 1""",

    "q72_stream_state" -> """
      SELECT user_id, count(*) AS n_events
      FROM events GROUP BY 1 ORDER BY 1""",

    "q73_bucketed_join" -> """
      SELECT o_orderstatus, count(*) AS n,
             round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1""",

    "q74_meta_tables" -> """
      SELECT *, false AS virtual FROM (
        SELECT 'customer' AS table_name,
               CAST((SELECT count(*) FROM (DESCRIBE customer)) AS INT)
                 AS n_columns
        UNION ALL SELECT 'documents',
          CAST((SELECT count(*) FROM (DESCRIBE documents)) AS INT)
        UNION ALL SELECT 'embeddings',
          CAST((SELECT count(*) FROM (DESCRIBE embeddings)) AS INT)
        UNION ALL SELECT 'events',
          CAST((SELECT count(*) FROM (DESCRIBE events)) AS INT)
        UNION ALL SELECT 'lineitem',
          CAST((SELECT count(*) FROM (DESCRIBE lineitem)) AS INT)
        UNION ALL SELECT 'nation',
          CAST((SELECT count(*) FROM (DESCRIBE nation)) AS INT)
        UNION ALL SELECT 'orders',
          CAST((SELECT count(*) FROM (DESCRIBE orders)) AS INT)
        UNION ALL SELECT 'part',
          CAST((SELECT count(*) FROM (DESCRIBE part)) AS INT)
        UNION ALL SELECT 'region',
          CAST((SELECT count(*) FROM (DESCRIBE region)) AS INT)
        UNION ALL SELECT 'supplier',
          CAST((SELECT count(*) FROM (DESCRIBE supplier)) AS INT))
      ORDER BY table_name""",

    // transitive closure recomputed from scratch: recursive reachability
    // (UNION-dedup'd), component label = min reachable id
    "q75_dedup_clusters" -> """
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
      c AS (SELECT id, min(rr) AS comp FROM r GROUP BY id)
      SELECT comp, count(*) AS n_members FROM c GROUP BY 1 ORDER BY 1""",

    // ratios on the exact integer counts (IEEE division matches Spark
    // bit-for-bit); keep computed on the UNROUNDED ratios; the top token
    // is the mode with lexicographically-smallest tiebreak
    "q76_repetition" -> """
      WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      m AS (SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd,
          CASE WHEN len(toks) >= 2 THEN len(list_distinct(
            list_transform(range(1, len(toks)),
              i -> toks[i] || ' ' || toks[i+1]))) END AS nd2,
          list_sum(list_transform(toks, x -> length(x))) AS stl
        FROM t),
      cnts AS (SELECT doc_id, tok, count(*) AS c
               FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
               GROUP BY 1, 2),
      top AS (SELECT doc_id, tok, c FROM (
                SELECT doc_id, tok, c, row_number() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, tok ASC) AS rn
                FROM cnts) WHERE rn = 1),
      v AS (SELECT m.doc_id,
              CASE WHEN n > 0 THEN 1.0 - CAST(nd AS DOUBLE) / n END
                AS dup_tok_frac,
              CASE WHEN n >= 2 THEN 1.0 - CAST(nd2 AS DOUBLE) / (n - 1) END
                AS dup_2gram_frac,
              CASE WHEN n > 0 THEN
                CAST(top.c * length(top.tok) AS DOUBLE) / stl END
                AS top_tok_frac
            FROM m LEFT JOIN top USING (doc_id))
      SELECT doc_id, round(dup_tok_frac, 6) AS dup_tok_frac,
             round(dup_2gram_frac, 6) AS dup_2gram_frac,
             round(top_tok_frac, 6) AS top_tok_frac,
             (dup_2gram_frac <= 0.03 AND top_tok_frac <= 0.1) AS keep
      FROM v ORDER BY doc_id""",

    "q77_hash_split" -> """
      WITH b AS (SELECT CAST(('0x' ||
          substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100
          AS bucket FROM documents),
      s AS (SELECT CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val'
                        ELSE 'test' END AS split, bucket FROM b)
      SELECT split, count(*) AS n, min(bucket) AS min_bucket,
             max(bucket) AS max_bucket
      FROM s GROUP BY 1 ORDER BY 1""",

    // eval grams = 8-grams of the 12-token prefixes of every 97th doc;
    // a short text (< 8 tokens) shingles as its full token string, same
    // as the Spark operator
    "q78_decontaminate" -> """
      WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      eg AS (SELECT DISTINCT g FROM (
               SELECT unnest(CASE WHEN len(toks[1:12]) >= 8 THEN
                   list_transform(generate_series(1, len(toks[1:12]) - 7),
                     i -> array_to_string(toks[i:i+7], ' '))
                 WHEN len(toks[1:12]) > 0 THEN
                   [array_to_string(toks[1:12], ' ')]
                 ELSE [] END) AS g
               FROM t WHERE doc_id % 97 = 0)),
      tg AS (SELECT DISTINCT doc_id, g FROM (
               SELECT doc_id, unnest(CASE WHEN len(toks) >= 8 THEN
                   list_transform(generate_series(1, len(toks) - 7),
                     i -> array_to_string(toks[i:i+7], ' '))
                 WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                 ELSE [] END) AS g
               FROM t))
      SELECT doc_id AS id, count(*) AS n_shared_grams
      FROM tg JOIN eg USING (g)
      GROUP BY 1 ORDER BY 1""",

    // running token sum per shard (rows-unbounded-preceding-to-1),
    // pack ids by floor division at the 2048 budget
    "q79_seq_packing" -> """
      WITH t AS (SELECT doc_id,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
            AS INTEGER) % 100 % 4 AS shard,
          CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               x -> length(x) > 0)) AS BIGINT) AS n_tok
        FROM documents),
      w AS (SELECT doc_id AS id, shard, n_tok,
              CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard
                ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS BIGINT) AS befor
            FROM t)
      SELECT id, shard, n_tok,
             CAST(floor(befor / 2048) AS BIGINT) AS first_pack,
             CAST(floor((CASE WHEN n_tok > 0 THEN befor + n_tok - 1
                              ELSE befor END) / 2048) AS BIGINT)
               AS last_pack
      FROM w ORDER BY id""",

    // same dirt construction, same patterns; DuckDB regexp_replace
    // needs the 'g' flag (Spark replaces globally by default). n_pii
    // counted per pattern on the ORIGINAL dirty text
    "q80_redact_pii" -> """
      WITH d AS (SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN
            text || ' contact user' || doc_id || '@example.com'
                 || ' or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                 || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                 || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.77'
          ELSE text END AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                + len(regexp_extract_all(t,
                    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))
                + len(regexp_extract_all(t,
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT)
               AS n_pii,
             regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
               '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
               AS redacted
      FROM d ORDER BY doc_id""",

    // identical formula order: tf * (ln((N+1)/(df+1)) + 1); ln is the
    // one transcendental in the oracle suite — round(...,6) absorbs
    // libm ulp differences
    "q81_tfidf" -> """
      WITH t AS (SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          x -> length(x) > 0)) AS tok
        FROM documents),
      f AS (SELECT doc_id, tok, count(*) AS tf FROM t
            WHERE tok IN ('spark', 'query', 'vector') GROUP BY 1, 2),
      d AS (SELECT tok, count(*) AS df FROM f GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents)
      SELECT doc_id,
             round(sum(tf * (ln((n.n + 1.0) / (d.df + 1.0)) + 1.0)), 6)
               AS score
      FROM f JOIN d USING (tok) CROSS JOIN n
      GROUP BY doc_id ORDER BY doc_id""",

    // portable md5 fingerprints as in q70; known-store filter via
    // NOT EXISTS (null fingerprints never match, like the anti-join);
    // batch-internal dedup = row_number over the fingerprint
    "q82_incremental_dedup" -> """
      WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      sh AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                      list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END AS s
             FROM t),
      fp AS (SELECT doc_id, list_min(list_transform(s, g -> md5(g))) AS f
             FROM sh),
      known AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0),
      inc AS (SELECT doc_id, f FROM fp WHERE doc_id % 2 = 1
              UNION ALL
              SELECT doc_id + 100000, f FROM fp WHERE doc_id % 50 = 0),
      fresh AS (SELECT i.doc_id, i.f FROM inc i
                WHERE NOT EXISTS (SELECT 1 FROM known k WHERE k.f = i.f)),
      surv AS (SELECT doc_id FROM (
                 SELECT doc_id, row_number() OVER (
                   PARTITION BY f ORDER BY doc_id) AS rn
                 FROM fresh) WHERE rn = 1)
      SELECT (SELECT count(*) FROM inc) AS n_incoming,
             count(*) AS n_survivors,
             CAST(coalesce(sum(CASE WHEN doc_id >= 100000 THEN 1 ELSE 0
                                END), 0) AS BIGINT) AS n_replayed_kept
      FROM surv""",

    // same arithmetic grouping as the Spark columns: idf =
    // ln(1 + (N - df + 0.5)/(df + 0.5)); norm denominator
    // tf + (len/avglen * b + (1-b)) * k1; avglen = sum/count exact
    "q83_bm25" -> """
      WITH t AS (SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          x -> length(x) > 0) AS toks
        FROM documents),
      f AS (SELECT doc_id, tok, count(*) AS tf FROM (
              SELECT doc_id, unnest(toks) AS tok FROM t)
            WHERE tok IN ('spark', 'query', 'vector') GROUP BY 1, 2),
      d AS (SELECT tok, count(*) AS df FROM f GROUP BY 1),
      s AS (SELECT count(*) AS n,
              CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avglen
            FROM t),
      l AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS len FROM t)
      SELECT f.doc_id,
             round(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (f.tf * 2.2 / (f.tf + (l.len / s.avglen * 0.75 + 0.25)
                                       * 1.2))), 6) AS score
      FROM f JOIN d USING (tok) CROSS JOIN s JOIN l ON f.doc_id = l.doc_id
      GROUP BY f.doc_id ORDER BY f.doc_id""",

    // trim-then-distinct over single-\n lines (multiA) and blank-line
    // paragraphs (multiB), mirroring the Spark constructions
    "q84_dup_lines" -> """
      WITH m AS (SELECT doc_id,
          text || chr(10) || substring(text, 1, 60) || chr(10)
               || substring(text, 1, 60) || chr(10) || chr(10)
               || (CASE WHEN doc_id % 3 = 0 THEN text
                        ELSE substring(text, 1, 60) || ' tail' END) AS ma,
          substring(text, 1, 60) || chr(10) || chr(10)
               || substring(text, 1, 60) || chr(10) || chr(10)
               || (CASE WHEN doc_id % 3 = 0 THEN substring(text, 1, 60)
                        ELSE text END) AS mb
        FROM documents),
      seg AS (SELECT doc_id,
          list_filter(list_transform(string_split_regex(ma, '\n'),
            x -> trim(x)), x -> length(x) > 0) AS lines,
          list_filter(list_transform(string_split_regex(mb, '\n{2,}'),
            x -> trim(x)), x -> length(x) > 0) AS paras
        FROM m)
      SELECT doc_id,
             round(CASE WHEN len(lines) > 0 THEN
               1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
               END, 6) AS dup_line_frac,
             round(CASE WHEN len(paras) > 0 THEN
               1.0 - CAST(len(list_distinct(paras)) AS DOUBLE) / len(paras)
               END, 6) AS dup_para_frac
      FROM seg ORDER BY doc_id""",

    // lang_pred replicated as in q24 (argmax tiebreak fr>es>en>de =
    // struct-max on (hits, lang)); quality replicated as in q70; then
    // a plain window top-3 — rank order is engine-stable because
    // quality is pre-rounded and ties break on doc_id
    "q85_curation_topk" -> """
      WITH t AS (SELECT doc_id, text,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      s AS (SELECT doc_id,
              len(list_intersect(list_distinct(toks),
                ['der','die','und','das','ist','von','den','mit',
                 'nicht','ein'])) AS h_de,
              len(list_intersect(list_distinct(toks),
                ['the','and','of','to','in','is','that','it','was',
                 'for'])) AS h_en,
              len(list_intersect(list_distinct(toks),
                ['el','la','de','que','y','en','un','los','del',
                 'las'])) AS h_es,
              len(list_intersect(list_distinct(toks),
                ['le','la','les','de','et','est','un','une','dans',
                 'que'])) AS h_fr,
              length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '',
                'g')) AS cjk,
              length(text) AS n
            FROM t),
      lp AS (SELECT doc_id,
               CASE WHEN cjk > 0 AND cjk * 2 >= n THEN 'zh'
                    WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                    WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                    ELSE 'de' END AS lang_pred
             FROM s),
      r AS (SELECT doc_id, text, toks,
              CASE WHEN length(text) > 0 THEN
                CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                  AS DOUBLE) / length(text) ELSE 0.0 END AS pr,
              CASE WHEN len(toks) > 0 THEN
                CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','an','and','or','of','to','in','is','it',
                   'that','for','on','with','as','was','at','by','be',
                   'this'], x))) AS DOUBLE) / len(toks)
                ELSE 0.0 END AS sw,
              CASE WHEN len(toks) > 0 THEN
                CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS DOUBLE) / len(toks) ELSE 0.0 END AS mwl
            FROM t),
      q AS (SELECT doc_id,
              round((least(length(text) / 500.0, 1.0)
                + CASE WHEN pr < 0.1 THEN 1.0
                       ELSE greatest(1.0 - (pr - 0.1) * 5, 0.0) END
                + least(sw * 4, 1.0)
                + CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0
                       ELSE 0.5 END) / 4, 6) AS quality
            FROM r),
      j AS (SELECT lp.doc_id, lang_pred, quality
            FROM lp JOIN q ON lp.doc_id = q.doc_id),
      w AS (SELECT lang_pred, doc_id, quality,
              CAST(row_number() OVER (PARTITION BY lang_pred
                ORDER BY quality DESC, doc_id ASC) AS INT) AS rk
            FROM j)
      SELECT lang_pred, rk, doc_id, quality FROM w
      WHERE rk <= 3 ORDER BY lang_pred, rk""",

    // exact top-5 per query recomputed; the PQ recall floor is a
    // deterministic literal (fixed codebook) asserted Spark-side
    "q86_ann_pq" -> """
      WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                 FROM embeddings WHERE vec_id < 8),
      s AS (SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv) AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
            QUALIFY row_number() OVER (PARTITION BY q.query_id
              ORDER BY cosine DESC, e.vec_id) <= 5)
      SELECT count(*) AS n_exact, TRUE AS recall_floor_met FROM s""",

    // portable md5 fingerprints (q70's CTE); survivors = odd-id docs
    // whose fingerprint does not appear among even-id docs (NOT EXISTS
    // = anti-join null semantics)
    "q87_stream_dedup_store" -> """
      WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      sh AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                      list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END AS s
             FROM t),
      fp AS (SELECT doc_id, list_min(list_transform(s, g -> md5(g))) AS f
             FROM sh),
      surv AS (SELECT o.doc_id, o.f FROM fp o
               WHERE o.doc_id % 2 = 1
                 AND NOT EXISTS (SELECT 1 FROM fp k
                                 WHERE k.doc_id % 2 = 0 AND k.f = o.f))
      SELECT count(*) AS n_survivors,
             count(DISTINCT f) AS n_distinct_fp
      FROM surv""",

    // full-outer grouped join == cogroup over the union of keys;
    // missing sides land as zero counts / 0.0 sums like the empty
    // iterator does
    "q88_cogroup" -> """
      WITH o AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0),
      l AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
                   sum(l_quantity) AS s
            FROM lineitem WHERE l_orderkey % 10 = 0 GROUP BY 1)
      SELECT coalesce(o.o_orderkey, l.l_orderkey) AS o_orderkey,
             CAST(CASE WHEN o.o_orderkey IS NULL THEN 0 ELSE 1 END
               AS BIGINT) AS n_orders,
             coalesce(l.n, 0) AS n_items,
             round(coalesce(l.s, 0.0), 4) AS sum_qty
      FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey
      ORDER BY 1""",

    "q89_stream_interval_join" -> """
      SELECT count(*) AS n_pairs,
             count(DISTINCT a.user_id) AS n_users,
             min(a.event_id) AS min_view_id
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'view' AND b.event_type = 'purchase'
       AND a.user_id % 3 = 0 AND b.user_id % 3 = 0
       AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE""",

    "q90_vocab" -> """
      WITH t AS (SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          x -> length(x) > 0) AS toks
        FROM documents),
      tr AS (SELECT unnest(toks) AS tok FROM t WHERE doc_id % 10 <> 9),
      cnts AS (SELECT tok, count(*) AS cnt FROM tr GROUP BY 1),
      vocab AS (SELECT tok, cnt, CAST(row_number() OVER (
                  ORDER BY cnt DESC, tok ASC) AS INT) AS tok_id
                FROM cnts QUALIFY tok_id <= 20),
      ho AS (SELECT unnest(toks) AS tok FROM t WHERE doc_id % 10 = 9),
      o AS (SELECT CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                     AS DOUBLE) / count(*) AS oov_rate
            FROM ho LEFT JOIN vocab v USING (tok))
      SELECT tok_id, vocab.tok, cnt, round(o.oov_rate, 6) AS oov_rate
      FROM vocab CROSS JOIN o ORDER BY tok_id""",

    "q91_stratified_sample" -> """
      WITH b AS (SELECT source,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
            AS INTEGER) % 100 AS bucket
        FROM documents)
      SELECT source, count(*) AS n_kept FROM b
      WHERE bucket < CASE source WHEN 'src0' THEN 30
                                 WHEN 'src1' THEN 50 ELSE 80 END
      GROUP BY 1 ORDER BY 1""",

    // dense 2-edge cube re-exploded to rows: every (status, prio) cell
    // of the domain product, count coalesced to 0 in empty cells, the
    // out-of-domain priorities lumped into the null overflow partition
    "q92_cube_format" -> """
      WITH da(status) AS (VALUES ('O'), ('F'), ('P'), ('X')),
      db(prio) AS (VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'), (NULL)),
      s AS (SELECT o_orderstatus AS status,
                   CASE WHEN o_orderpriority IN
                          ('1-URGENT', '2-HIGH', '3-MEDIUM')
                        THEN o_orderpriority END AS prio,
                   count(*) AS n,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders GROUP BY 1, 2)
      SELECT da.status, db.prio, coalesce(s.n, 0) AS n, s.sum_price
      FROM da CROSS JOIN db
      LEFT JOIN s ON s.status = da.status
                 AND s.prio IS NOT DISTINCT FROM db.prio""",

    // redelivered rows are suppressed -> plain single-copy aggregate
    "q93_stream_redelivery" -> """
      SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1""",

    // last running-count update per key (TTL wider than the backlog)
    // equals the plain batch count
    "q94_stream_state_tws" -> """
      SELECT user_id, count(*) AS n_events
      FROM events GROUP BY 1 ORDER BY 1""",

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

    // SemDeDup replay: same corpus+variants as q44, deterministic
    // coarse quantizer (8 lowest-id vectors, ties to lower cent_id),
    // within-cell pairs only, round-then-threshold as the engine
    "q96_semdedup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS id, v FROM e
            UNION ALL
            SELECT vec_id + 1000000,
                   list_transform(generate_series(1, len(v)), i ->
                     v[i] + CASE WHEN i = CAST(vec_id % len(v) AS INT) + 1
                                 THEN 0.5 ELSE 0.0 END)
            FROM e),
      cents AS (SELECT id AS cent_id, v AS cv FROM c ORDER BY id LIMIT 8),
      scored AS (SELECT c.id, c.v, cents.cent_id,
                        list_cosine_similarity(c.v, cents.cv) AS cos
                 FROM c CROSS JOIN cents),
      assigned AS (SELECT id, v, CAST(cell AS INT) AS cell FROM (
          SELECT id, v, cent_id AS cell,
                 row_number() OVER (PARTITION BY id
                   ORDER BY cos DESC, cent_id ASC) AS rn
          FROM scored) WHERE rn = 1),
      pairs AS (SELECT a.cell, b.id AS dup_id, a.id AS kept0,
                       round(list_cosine_similarity(a.v, b.v), 6) AS cos6
                FROM assigned a JOIN assigned b
                  ON a.cell = b.cell AND a.id < b.id
                WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.8)
      SELECT cell, dup_id, min(kept0) AS kept_id, max(cos6) AS max_cosine
      FROM pairs GROUP BY 1, 2 ORDER BY dup_id""",

    // linear quality model: every feature and the algebraic sigmoid
    // mirrored term-by-term in the engine's evaluation order; keep is
    // decided on the UNROUNDED score, as in the engine
    "q97_quality_classifier" -> q97ClassifySql,

    // stream/batch parity: the streamed classifier must reproduce the
    // batch answer exactly, so q112 shares q97's oracle verbatim
    "q112_stream_classify" -> q97ClassifySql,

    // 64-token chunks, stride 48: ceil(max(n-64,0)/48)+1 chunks per
    // doc (none for token-less docs), inclusive 1-based list_slice =
    // Spark slice(start, length)
    "q98_chunk_docs" -> """
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents),
      n AS (SELECT doc_id, toks,
                   CASE WHEN len(toks) > 0 THEN
                     CAST(ceil(CAST(greatest(len(toks) - 64, 0) AS DOUBLE)
                               / 48) AS INT) + 1
                   ELSE 0 END AS nc
            FROM t),
      x AS (SELECT doc_id, toks,
                   unnest(generate_series(0, nc - 1)) AS ci
            FROM n WHERE nc > 0)
      SELECT doc_id, CAST(ci AS INT) AS chunk_ix,
             CAST(len(list_slice(toks, ci * 48 + 1, ci * 48 + 64)) AS INT)
               AS n_tokens,
             array_to_string(list_slice(toks, ci * 48 + 1, ci * 48 + 64), ' ')
               AS chunk_text
      FROM x ORDER BY doc_id, chunk_ix""",

    // BPE round-0: adjacent character-pair counts over the word-
    // frequency table, weighted by word frequency; top-20 under the
    // total order (freq desc, a asc, b asc)
    "q99_bpe_pairs" -> """
      WITH toks AS (SELECT unnest(list_filter(
                      string_split_regex(lower(trim(text)), '\s+'),
                      x -> length(x) > 0)) AS word FROM documents),
      wf AS (SELECT word, count(*) AS freq FROM toks GROUP BY 1),
      pairs AS (SELECT substring(word, i, 1) AS a,
                       substring(word, i + 1, 1) AS b, freq
                FROM (SELECT word, freq,
                             unnest(generate_series(1, length(word) - 1)) AS i
                      FROM wf WHERE length(word) >= 2))
      SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_freq
      FROM pairs GROUP BY 1, 2
      ORDER BY pair_freq DESC, a, b LIMIT 20""",

    // temperature mixture (tau=0.5): p pinned to 9 digits before the
    // integer budget, exactly as the engine
    "q100_mixture_weights" -> """
      WITH c AS (SELECT source, count(*) AS n_docs,
                        pow(CAST(count(*) AS DOUBLE), 0.5) AS w
                 FROM documents GROUP BY 1),
      t AS (SELECT sum(w) AS wsum FROM c),
      p9 AS (SELECT source, n_docs, round(w / wsum, 9) AS p
             FROM c CROSS JOIN t)
      SELECT source, n_docs, round(p, 6) AS p,
             CAST(round(p * 100000) AS BIGINT) AS target_docs,
             round(CAST(round(p * 100000) AS BIGINT)
                   / CAST(n_docs AS DOUBLE), 6) AS rate
      FROM p9 ORDER BY source""",

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

    // hashed bag-of-words (md5 slot, integer counts) -> SemDeDup over
    // the 32-dim vectors; dot products are exact integers in doubles,
    // so every cosine is bit-identical across engines
    "q102_hashed_bow_semdedup" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents),
      tk AS (SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS t FROM base),
      contrib AS (SELECT doc_id,
          CAST(('0x' || substring(md5(t), 1, 4)) AS INTEGER) % 32 AS b
        FROM tk),
      grouped AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS val
                  FROM contrib GROUP BY 1, 2),
      dims AS (SELECT unnest(generate_series(0, 31)) AS b),
      docs2 AS (SELECT DISTINCT doc_id FROM grouped),
      cells0 AS (SELECT doc_id, d.b FROM docs2 CROSS JOIN dims d),
      dense AS (SELECT c.doc_id, list(coalesce(g.val, 0.0)
                  ORDER BY c.b) AS v
                FROM cells0 c LEFT JOIN grouped g USING (doc_id, b)
                GROUP BY c.doc_id),
      cents AS (SELECT doc_id AS cent_id, v AS cv FROM dense
                ORDER BY doc_id LIMIT 16),
      scored AS (SELECT dense.doc_id, dense.v, cents.cent_id,
                        list_cosine_similarity(dense.v, cents.cv) AS cos
                 FROM dense CROSS JOIN cents),
      assigned AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT doc_id, v, cent_id AS cell,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY cos DESC, cent_id ASC) AS rn
          FROM scored) WHERE rn = 1),
      pairs AS (SELECT a.cell, b.doc_id AS dup_id, a.doc_id AS kept0,
                       round(list_cosine_similarity(a.v, b.v), 6) AS cos6
                FROM assigned a JOIN assigned b
                  ON a.cell = b.cell AND a.doc_id < b.doc_id
                WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95),
      dups AS (SELECT cell, dup_id, min(kept0) AS kept_id,
                      max(cos6) AS max_cosine
               FROM pairs GROUP BY 1, 2)
      SELECT cell, count(*) AS n_dups,
             CAST(sum(CASE WHEN dup_id = kept_id + 1000000
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS n_variant_pairs,
             min(max_cosine) AS min_cosine,
             max(max_cosine) AS top_cosine
      FROM dups GROUP BY 1 ORDER BY 1""",

    // interpolated add-1 uni+bigram LM: train on md5 buckets < 80,
    // score buckets >= 90; first token unigram-only; ln (natural log),
    // per-doc average rounded to 6
    "q103_lm_score" -> """
      WITH b AS (SELECT doc_id, text,
          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               AS INTEGER) % 100 AS bucket
        FROM documents),
      train AS (SELECT * FROM b WHERE bucket < 80),
      test AS (SELECT * FROM b WHERE bucket >= 90),
      ttok AS (SELECT unnest(list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 x -> length(x) > 0)) AS w FROM train),
      uni AS (SELECT w, count(*) AS c FROM ttok GROUP BY 1),
      stats AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
                       CAST(count(*) AS DOUBLE) AS v FROM uni),
      tbig AS (SELECT list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 x -> length(x) > 0) AS toks FROM train),
      bi0 AS (SELECT unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i])) AS a,
                     unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i + 1])) AS b
              FROM tbig WHERE len(toks) >= 2),
      bi AS (SELECT a, b, count(*) AS c FROM bi0 GROUP BY 1, 2),
      dtok AS (SELECT doc_id, list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 x -> length(x) > 0) AS toks FROM test),
      tr AS (SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks)),
                 i -> CASE WHEN i > 1 THEN toks[i - 1] END)) AS prev,
               unnest(list_transform(generate_series(1, len(toks)),
                 i -> toks[i])) AS cur
             FROM dtok WHERE len(toks) > 0),
      sc AS (SELECT doc_id,
               CASE WHEN prev IS NULL THEN
                 (coalesce(u1.c, 0) + 1.0) / (s.n + 1.0 * s.v)
               ELSE
                 0.5 * ((coalesce(bi.c, 0) + 1.0)
                        / (coalesce(u2.c, 0) + 1.0 * s.v))
                 + 0.5 * ((coalesce(u1.c, 0) + 1.0)
                          / (s.n + 1.0 * s.v))
               END AS p
             FROM tr
             LEFT JOIN uni u1 ON tr.cur = u1.w
             LEFT JOIN uni u2 ON tr.prev = u2.w
             LEFT JOIN bi ON tr.prev = bi.a AND tr.cur = bi.b
             CROSS JOIN stats s)
      SELECT doc_id, count(*) AS n_scored,
             round(list_reduce(list(ln(p) ORDER BY ln(p)),
                               (acc, x) -> acc + x) / count(*), 6)
               AS avg_logprob
      FROM sc GROUP BY 1 ORDER BY 1""",

    // rolling 20-token spans; a span is duplicated when its text
    // occurs in >= 2 distinct docs; short docs contribute their whole
    // text as one span
    "q104_dup_spans" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents WHERE doc_id % 5 = 0),
      tk AS (SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks FROM base),
      sp AS (SELECT doc_id, unnest(
               CASE WHEN len(toks) >= 20 THEN
                      list_transform(generate_series(1, len(toks) - 19),
                        i -> array_to_string(
                          list_slice(toks, i, i + 19), ' '))
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END) AS g
             FROM tk),
      hot AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM sp)
              GROUP BY g HAVING count(*) >= 2),
      tot AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY 1),
      dup AS (SELECT doc_id, count(*) AS nd FROM sp JOIN hot USING (g)
              GROUP BY 1)
      SELECT t.doc_id, t.n_spans,
             coalesce(d.nd, 0) AS n_dup_spans,
             round(CAST(coalesce(d.nd, 0) AS DOUBLE) / t.n_spans, 6)
               AS dup_span_frac
      FROM tot t LEFT JOIN dup d USING (doc_id)
      ORDER BY t.doc_id""",

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

    // q97's scoring replayed, bucketed into a dense lang x decile cube
    // (4 x 10 cells, zero-filled); floor(score*10) on the bit-exact
    // score matches the JX RangeDomain bucket
    "q106_jx_over_llm" -> """
      WITH t AS (
        SELECT doc_id, lang, text,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents),
      f AS (SELECT doc_id, lang,
              least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS lenf,
              CASE WHEN length(text) > 0 THEN
                CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                     AS DOUBLE) / CAST(length(text) AS DOUBLE)
                ELSE 0.0 END AS punct,
              CASE WHEN length(text) > 0 THEN
                CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                     AS DOUBLE) / CAST(length(text) AS DOUBLE)
                ELSE 0.0 END AS upper_r,
              CASE WHEN len(toks) > 0 THEN
                CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','an','and','or','of','to','in','is','it','that',
                   'for','on','with','as','was','at','by','be','this'], x)))
                  AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                ELSE 0.0 END AS swr,
              CASE WHEN len(toks) > 0 THEN
                CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                ELSE 0.0 END AS mwl
            FROM t),
      l AS (SELECT doc_id, lang,
              ((((-1.0 + 1.2 * lenf) + -3.0 * punct) + -1.5 * upper_r)
                + 2.5 * swr) + -0.05 * mwl AS logit
            FROM f),
      s AS (SELECT doc_id, lang,
              0.5 + 0.5 * (logit / (1.0 + abs(logit))) AS score
            FROM l),
      agg AS (SELECT lang, floor(score * 10) AS score_decile,
                     count(*) AS n
              FROM s WHERE lang IN ('de', 'en', 'es', 'fr')
                AND floor(score * 10) >= 0 AND floor(score * 10) <= 9
              GROUP BY 1, 2),
      dl(lang) AS (VALUES ('de'), ('en'), ('es'), ('fr')),
      db AS (SELECT CAST(unnest(generate_series(0, 9)) AS DOUBLE)
               AS score_decile)
      SELECT dl.lang, db.score_decile, coalesce(agg.n, 0) AS n
      FROM dl CROSS JOIN db
      LEFT JOIN agg ON agg.lang = dl.lang
                   AND agg.score_decile = db.score_decile
      ORDER BY dl.lang, db.score_decile""",

    "q107_semdedup_fitted" -> q107OracleSql,

    "q109_ivf_fitted_probe" -> q109OracleSql,

    "q111_semdedup_incremental" -> q111OracleSql,

    "q113_stream_semdedup" -> q113OracleSql,

    // 2-round fit over the (no-variant) BoW vectors, then 20 docs per
    // fitted cell by (md5-hash16 asc, doc_id asc) — the deterministic
    // balanced sample
    "q114_cluster_sample" -> s"""
      WITH $bowDenseDocsSql,
      cents0 AS (SELECT doc_id AS cent_id, v AS cv FROM dense
                 ORDER BY doc_id LIMIT 16),
      means0 AS (SELECT CAST(cent_id AS INT) AS cell,
                        CAST(unnest(generate_series(1, len(cv))) AS INT)
                          AS dim,
                        unnest(cv) AS c
                 FROM cents0),
      ${lloydRoundSql(1)},
      ${lloydRoundSql(2)},
      rcF AS (SELECT cell, list(c ORDER BY dim) AS cv
              FROM means2 GROUP BY cell),
      asgF AS (SELECT doc_id, CAST(cell AS INT) AS cell FROM (
          SELECT d.doc_id, r.cell,
                 row_number() OVER (PARTITION BY d.doc_id
                   ORDER BY list_cosine_similarity(d.v, r.cv) DESC,
                            r.cell ASC) AS rn
          FROM dense d CROSS JOIN rcF r) WHERE rn = 1)
      SELECT cell, CAST(rk AS INT) AS rk, doc_id FROM (
        SELECT cell, doc_id,
               row_number() OVER (PARTITION BY cell
                 ORDER BY CAST(('0x' || substring(
                     md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                     % 65536 ASC,
                   doc_id ASC) AS rk
        FROM asgF)
      WHERE rk <= 20
      ORDER BY cell, rk""",

    // per-source tie-corrected rank AUC + confusion at 0.5 over the
    // shared bit-exact score CTE; counts CAST AS BIGINT (duck sum ->
    // HUGEINT), every ratio a single division of exact sums
    "q115_classifier_eval" -> s"""
      WITH $q97ScorePrefixSql,
      lab AS (SELECT d.source, coalesce(d.lang = 'en', false) AS y,
                     s.score AS sc
              FROM documents d JOIN s ON d.doc_id = s.doc_id),
      per AS (SELECT source, sc, CAST(count(*) AS BIGINT) AS cnt,
                     CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                       AS pos
              FROM lab GROUP BY 1, 2),
      rk AS (SELECT source, sc, cnt, pos,
                    sum(cnt) OVER (PARTITION BY source ORDER BY sc)
                      AS cum
             FROM per),
      rk2 AS (SELECT source, sc, cnt, pos,
                     CAST(cum - cnt AS DOUBLE) + (cnt + 1) / 2.0
                       AS avg_rank
              FROM rk),
      a AS (SELECT source,
                   CAST(sum(cnt) AS BIGINT) AS n,
                   CAST(sum(pos) AS BIGINT) AS npos,
                   CAST(sum(cnt) - sum(pos) AS BIGINT) AS nneg,
                   sum(pos * avg_rank) AS rank_pos,
                   CAST(sum(CASE WHEN sc >= 0.5 THEN pos ELSE 0 END)
                     AS BIGINT) AS tp,
                   CAST(sum(CASE WHEN sc >= 0.5 THEN cnt - pos ELSE 0
                     END) AS BIGINT) AS fp,
                   CAST(sum(CASE WHEN sc < 0.5 THEN cnt - pos ELSE 0
                     END) AS BIGINT) AS tn,
                   CAST(sum(CASE WHEN sc < 0.5 THEN pos ELSE 0 END)
                     AS BIGINT) AS fn
            FROM rk2 GROUP BY source)
      SELECT source, n, npos, nneg, tp, fp, tn, fn,
             CASE WHEN npos > 0 AND nneg > 0 THEN
               (rank_pos - CAST(npos AS DOUBLE) * (npos + 1) / 2.0)
                 / CAST(npos * nneg AS DOUBLE) END AS auc,
             CASE WHEN tp + fp > 0 THEN
               CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
             END AS "precision",
             CASE WHEN npos > 0 THEN
               CAST(tp AS DOUBLE) / CAST(npos AS DOUBLE)
             END AS recall,
             CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy
      FROM a ORDER BY source""",

    // the Bloom prefilter is invisible to semantics (no false
    // negatives): the oracle is the PLAIN exact semi join
    "q116_bloom_overlap" -> """
      WITH big AS (SELECT doc_id, md5(text) AS fp FROM documents),
      other AS (SELECT md5(text) AS fp FROM documents
                WHERE doc_id % 3 = 0
                UNION ALL
                SELECT md5(text || ' x2') AS fp FROM documents
                WHERE doc_id % 3 = 1)
      SELECT doc_id FROM big b
      WHERE EXISTS (SELECT 1 FROM other o WHERE o.fp = b.fp)
      ORDER BY doc_id""",

    "q117_bloom_decontaminate" -> """
      WITH big AS (SELECT doc_id, md5(text) AS fp FROM documents),
      other AS (SELECT md5(text) AS fp FROM documents
                WHERE doc_id % 3 = 0
                UNION ALL
                SELECT md5(text || ' x2') AS fp FROM documents
                WHERE doc_id % 3 = 1)
      SELECT doc_id FROM big b
      WHERE NOT EXISTS (SELECT 1 FROM other o WHERE o.fp = b.fp)
      ORDER BY doc_id""",

    // the same ±1 matrix re-derived from md5 parity; ±integer sums
    // are exact, so the projected vectors hash-compare unrounded
    "q118_random_projection" -> s"""
      WITH $bowDenseDocsSql
      SELECT doc_id, j,
        CAST(list_sum(list_transform(generate_series(1, 32), i ->
            v[i] * CASE WHEN CAST(('0x' || substring(md5(
                  CAST(i - 1 AS VARCHAR) || '_' || CAST(j AS VARCHAR)),
                  1, 4)) AS INTEGER) % 2 = 0
              THEN 1 ELSE -1 END)) AS DOUBLE) AS component
      FROM dense, (SELECT unnest(generate_series(0, 7)) AS j) js
      ORDER BY doc_id, j""",

    // cumulative confusion counts over score-descending distinct
    // thresholds; same shared score CTE as q115
    "q119_pr_curve" -> s"""
      WITH $q97ScorePrefixSql,
      lab AS (SELECT d.source, coalesce(d.lang = 'en', false) AS y,
                     s.score AS sc
              FROM documents d JOIN s ON d.doc_id = s.doc_id),
      per AS (SELECT source, sc, CAST(count(*) AS BIGINT) AS cnt,
                     CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                       AS pos
              FROM lab GROUP BY 1, 2),
      c AS (SELECT source, sc,
              CAST(sum(pos) OVER (PARTITION BY source ORDER BY sc DESC)
                AS BIGINT) AS tp,
              CAST(sum(cnt - pos) OVER (PARTITION BY source
                ORDER BY sc DESC) AS BIGINT) AS fp,
              CAST(sum(pos) OVER (PARTITION BY source) AS BIGINT)
                AS npos
            FROM per)
      SELECT source, round(sc, 6) AS thr, tp, fp,
             CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
               AS "precision",
             CASE WHEN npos > 0 THEN
               CAST(tp AS DOUBLE) / CAST(npos AS DOUBLE) END AS recall
      FROM c ORDER BY source, thr""",

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

    // per-source thresholds from exact token totals with the engine's
    // division order (budget/k/tok, left-assoc), md5-bucket membership
    "q121_token_budget" -> """
      WITH d AS (SELECT doc_id, source,
          CAST(len(list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            x -> length(x) > 0)) AS INT) AS n_tok
        FROM documents),
      tot AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok
              FROM d GROUP BY source),
      kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM tot),
      thr AS (SELECT source,
                CAST(floor(least(1.0,
                  CAST(10000 AS DOUBLE) / k / tok) * 65536) AS BIGINT)
                  AS t
              FROM tot CROSS JOIN kk),
      kept AS (SELECT d.doc_id, d.source, d.n_tok
               FROM d JOIN thr USING (source)
               WHERE CAST(('0x' || substring(
                   md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                 % 65536 < t)
      SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
             CAST(sum(n_tok) AS BIGINT) AS kept_tokens
      FROM kept GROUP BY source ORDER BY source""",

    // compaction only changes file layout: content == the source
    "q128_compaction" -> """
      SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id""",

    // sequential BPE retrain (10 chained rounds over the word-freq
    // table; see bpeRoundSql) then re-encode: the batched trainer the
    // engine runs must land on the identical merge table, so the
    // token-frequency tables hash-match exactly
    "q129_bpe_encode" -> s"""
      WITH toks AS (SELECT unnest(list_filter(
                      string_split_regex(lower(trim(text)), '\\s+'),
                      x -> length(x) > 0)) AS word FROM documents),
      wf AS (SELECT word, count(*) AS freq FROM toks GROUP BY 1),
      m0 AS MATERIALIZED (SELECT word, freq,
               regexp_replace(word, '(.)', ' \\1 ', 'g') AS s FROM wf),
      ${(1 to 10).map(bpeRoundSql).mkString(",\n      ")},
      enc AS (SELECT freq, unnest(list_filter(string_split(s, ' '),
                x -> x <> '')) AS token FROM m10)
      SELECT token, CAST(sum(freq) AS BIGINT) AS tok_freq
      FROM enc GROUP BY 1
      ORDER BY tok_freq DESC, token ASC LIMIT 30""",

    // greedy MMR replay: exact top-64 candidates by cosine to the
    // vec_id=0 query, then 8 chained argmax rounds (mmrRoundSql);
    // round 1 scores 0.5*rel (empty-selection similarity term = 0)
    "q130_mmr_select" -> s"""
      WITH c0 AS MATERIALIZED (SELECT id, v, rel FROM (
          SELECT id, v, rel,
                 row_number() OVER (ORDER BY rel DESC, id ASC) AS rn
          FROM (SELECT e.vec_id AS id, CAST(e.embedding AS DOUBLE[]) AS v,
                       list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv) AS rel
                FROM embeddings e,
                     (SELECT CAST(embedding AS DOUBLE[]) AS qv
                      FROM embeddings WHERE vec_id = 0) q
                WHERE e.vec_id <> 0))
          WHERE rn <= 64),
      a1 AS MATERIALIZED (SELECT 1 AS rank, id, rel, 0.5 * rel AS mmr, v
          FROM c0 ORDER BY rel DESC, id ASC LIMIT 1),
      ${(2 to 8).map(mmrRoundSql).mkString(",\n      ")}
      SELECT rank, id AS vec_id, round(rel, 6) AS rel,
             round(mmr, 6) AS mmr
      FROM a8 ORDER BY rank""",

    // mixture materialization: q100's weight derivation (round-9 pin
    // before the integer budget), then t//n whole epochs + one extra
    // copy for the t%n docs first in (md5(id), id) order — the oracle
    // ranks with a plain window; the engine's histogram-refine
    // selection must land on the identical set
    "q131_mixture_materialize" -> """
      WITH c AS (SELECT source, count(*) AS n_docs,
                        pow(CAST(count(*) AS DOUBLE), 0.5) AS w
                 FROM documents GROUP BY 1),
      t AS (SELECT sum(w) AS wsum FROM c),
      tw AS (SELECT source, n_docs,
                    CAST(round(round(w / wsum, 9) * 5000) AS BIGINT)
                      AS target
             FROM c CROSS JOIN t),
      rk AS (SELECT source, doc_id,
                    row_number() OVER (PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                      AS rnk
             FROM documents),
      rep AS (SELECT r.source, r.doc_id,
                     tw.target // tw.n_docs
                       + CASE WHEN r.rnk <= tw.target % tw.n_docs
                              THEN 1 ELSE 0 END AS copies
              FROM rk r JOIN tw USING (source)),
      m AS (SELECT source, doc_id,
                   unnest(generate_series(1, copies)) AS copy
            FROM rep WHERE copies >= 1)
      SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_kept,
             CAST(max(copy) AS INT) AS max_copy,
             CAST(sum(doc_id) AS BIGINT) AS id_sum
      FROM m GROUP BY source ORDER BY source""",

    // containment over the df<=64 string-gram space (the engine mines
    // hashed shingles — hash equality ≡ gram equality); both direction
    // ratios are exact integer divisions
    "q132_containment" -> """
      WITH base AS (SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 2000000,
                    substring(text, 1, greatest(length(text) - 40, 1))
             FROM documents WHERE doc_id % 5 = 0),
      t AS (SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM base),
      sh AS (SELECT DISTINCT doc_id, g FROM (
               SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                     i -> array_to_string(toks[i:i+2], ' '))
                 WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                 ELSE [] END) AS g
               FROM t)),
      dfc AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
      kept AS (SELECT doc_id, s.g FROM sh s JOIN dfc USING (g)
               WHERE df <= 64),
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
             FROM kept GROUP BY 1),
      pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    CAST(count(*) AS BIGINT) AS n_shared
             FROM kept a JOIN kept b USING (g)
             WHERE a.doc_id < b.doc_id
             GROUP BY 1, 2),
      j AS (SELECT id_a, id_b, n_shared, sa.n AS sz_a, sb.n AS sz_b
            FROM pr
            JOIN sz sa ON sa.doc_id = pr.id_a
            JOIN sz sb ON sb.doc_id = pr.id_b)
      SELECT id_a, id_b, n_shared, sz_a, sz_b,
             CAST(n_shared AS DOUBLE) / CAST(sz_a AS DOUBLE)
               AS cont_a_in_b,
             CAST(n_shared AS DOUBLE) / CAST(sz_b AS DOUBLE)
               AS cont_b_in_a
      FROM j
      WHERE greatest(CAST(n_shared AS DOUBLE) / CAST(sz_a AS DOUBLE),
                     CAST(n_shared AS DOUBLE) / CAST(sz_b AS DOUBLE))
              >= 0.9
      ORDER BY id_a, id_b""",

    // chained per-step funnel: each step's reach time is the earliest
    // event of that type strictly after the previous step's time
    "q133_funnel" -> funnelSummarySql,

    // the streaming drain must land on the batch funnel exactly —
    // same oracle
    "q138_stream_funnel" -> funnelSummarySql,

    // bigram lift from the LM count tables; exact products, no log
    "q134_collocations" -> """
      WITH t AS (SELECT list_filter(
                   string_split_regex(lower(trim(text)), '\s+'),
                   x -> length(x) > 0) AS toks FROM documents),
      uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM
                (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM uni),
      bi AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM (
               SELECT unnest(list_transform(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i])) AS a,
                      unnest(list_transform(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i + 1])) AS b
               FROM t WHERE len(toks) >= 2)
             GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT bi.a, bi.b, c_ab, ua.c AS c_a, ub.c AS c_b,
             (CAST(c_ab AS DOUBLE) * CAST(n.total AS DOUBLE))
               / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS lift
      FROM bi
      JOIN uni ua ON ua.w = bi.a
      JOIN uni ub ON ub.w = bi.b
      CROSS JOIN n
      ORDER BY lift DESC, bi.a ASC, bi.b ASC LIMIT 25""",

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

    // 2x2 presence-vs-label contingency per BoW slot; all-integer
    // numerator/denominator, one final double division
    "q122_chi2_features" -> """
      WITH tk AS (SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(trim(text)), '\s+'),
             x -> length(x) > 0)) AS t FROM documents),
      contrib AS (SELECT doc_id,
          CAST(('0x' || substring(md5(t), 1, 4)) AS INTEGER) % 32 AS b
        FROM tk),
      pres AS (SELECT DISTINCT doc_id, b FROM contrib),
      docs3 AS (SELECT c.doc_id, coalesce(d.lang = 'en', false) AS y
                FROM (SELECT DISTINCT doc_id FROM contrib) c
                JOIN documents d USING (doc_id)),
      tot AS (SELECT
                CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                  AS npos,
                CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
                  AS nneg
              FROM docs3),
      slot AS (SELECT p.b,
                 CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                   AS n11,
                 CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
                   AS n10
               FROM pres p JOIN docs3 USING (doc_id) GROUP BY p.b),
      cells AS (SELECT b, n11, n10,
                  npos - n11 AS n01, nneg - n10 AS n00, npos, nneg
                FROM slot CROSS JOIN tot),
      stat AS (SELECT b, n11, n10, n01, n00,
                 n11 * n00 - n10 * n01 AS diff,
                 (n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00)
                   AS den,
                 npos + nneg AS n
               FROM cells)
      SELECT b, n11, n10, n01, n00,
             CASE WHEN den > 0 THEN
               CAST(n * diff * diff AS DOUBLE) / CAST(den AS DOUBLE)
             END AS chi2
      FROM stat ORDER BY b""",

    // decile bins over the shared bit-exact score CTE; mean via the
    // value-sorted list_reduce fold (+ 0.0 seed normalization)
    "q123_calibration" -> s"""
      WITH $q97ScorePrefixSql,
      lab AS (SELECT coalesce(d.lang = 'en', false) AS y, s.score AS sc
              FROM documents d JOIN s ON d.doc_id = s.doc_id),
      b AS (SELECT CAST(least(floor(sc * 10), 9) AS INT) AS bin, y, sc
            FROM lab),
      g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                     AS pos,
                   list_reduce(list(sc ORDER BY sc),
                     (a, x) -> a + x) + 0.0 AS ssum
            FROM b GROUP BY bin)
      SELECT bin, n, pos,
             CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
             ssum / CAST(n AS DOUBLE) AS mean_score
      FROM g ORDER BY bin""",

    // per-doc distinct 3-grams -> corpus df census -> unique fraction
    "q124_novelty" -> """
      WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(lower(trim(text)), '\s+'),
                      x -> length(x) > 0) AS toks
        FROM documents),
      sh AS (SELECT DISTINCT doc_id, g FROM (
               SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                     i -> array_to_string(toks[i:i+2], ' '))
                 WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                 ELSE [] END) AS g
               FROM t)),
      dfc AS (SELECT g, CAST(count(*) AS BIGINT) AS df
              FROM sh GROUP BY g),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                     CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_unique
              FROM sh JOIN dfc USING (g) GROUP BY doc_id)
      SELECT doc_id, n_grams, n_unique,
             CAST(n_unique AS DOUBLE) / CAST(n_grams AS DOUBLE)
               AS novelty
      FROM agg ORDER BY doc_id""",

    // the associativity law in oracle form: the engine merges batch
    // counts into persisted history tables; the oracle trains FROM
    // SCRATCH on the full corpus — identical integer counts, so the
    // q103 scoring tail hash-matches
    "q125_lm_incremental" -> """
      WITH ttok AS (SELECT unnest(list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 x -> length(x) > 0)) AS w FROM documents),
      uni AS (SELECT w, count(*) AS c FROM ttok GROUP BY 1),
      stats AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
                       CAST(count(*) AS DOUBLE) AS v FROM uni),
      tbig AS (SELECT list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 x -> length(x) > 0) AS toks FROM documents),
      bi0 AS (SELECT unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i])) AS a,
                     unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i + 1])) AS b
              FROM tbig WHERE len(toks) >= 2),
      bi AS (SELECT a, b, count(*) AS c FROM bi0 GROUP BY 1, 2),
      dtok AS (SELECT doc_id, list_filter(
                 string_split_regex(lower(trim(text)), '\s+'),
                 x -> length(x) > 0) AS toks
               FROM documents WHERE doc_id % 7 = 0),
      tr AS (SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks)),
                 i -> CASE WHEN i > 1 THEN toks[i - 1] END)) AS prev,
               unnest(list_transform(generate_series(1, len(toks)),
                 i -> toks[i])) AS cur
             FROM dtok WHERE len(toks) > 0),
      sc AS (SELECT doc_id,
               CASE WHEN prev IS NULL THEN
                 (coalesce(u1.c, 0) + 1.0) / (s.n + 1.0 * s.v)
               ELSE
                 0.5 * ((coalesce(bi.c, 0) + 1.0)
                        / (coalesce(u2.c, 0) + 1.0 * s.v))
                 + 0.5 * ((coalesce(u1.c, 0) + 1.0)
                          / (s.n + 1.0 * s.v))
               END AS p
             FROM tr
             LEFT JOIN uni u1 ON tr.cur = u1.w
             LEFT JOIN uni u2 ON tr.prev = u2.w
             LEFT JOIN bi ON tr.prev = bi.a AND tr.cur = bi.b
             CROSS JOIN stats s)
      SELECT doc_id, count(*) AS n_scored,
             round(list_reduce(list(ln(p) ORDER BY ln(p)),
                               (acc, x) -> acc + x) / count(*), 6)
               AS avg_logprob
      FROM sc GROUP BY 1 ORDER BY 1""",

    // tumbling windows = epoch-aligned 1000-second buckets of the
    // doc_id-derived event time; ties in the top-5 break token-asc
    "q126_stream_trending" -> """
      WITH tk AS (SELECT CAST(doc_id // 100 * 100 AS BIGINT)
                    AS win_start,
                  unnest(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS w
                  FROM documents),
      c AS (SELECT win_start, w, count(*) AS c FROM tk GROUP BY 1, 2),
      r AS (SELECT win_start, w, c,
              row_number() OVER (PARTITION BY win_start
                ORDER BY c DESC, w ASC) AS rk
            FROM c)
      SELECT win_start, CAST(rk AS INT) AS rk, w, c
      FROM r WHERE rk <= 5 ORDER BY win_start, rk""",

    // four pipeline stages replayed relationally: md5 dedup ->
    // score >= 0.5 -> 8-gram eval-overlap drop -> budget sample
    "q127_pipeline" -> s"""
      WITH $q97ScorePrefixSql,
      keep1 AS (SELECT min(doc_id) AS doc_id FROM documents
                GROUP BY md5(text)),
      s1 AS (SELECT d.doc_id, d.source, d.text FROM documents d
             JOIN keep1 k ON d.doc_id = k.doc_id),
      s2 AS (SELECT s1.doc_id, s1.source, s1.text FROM s1
             JOIN s ON s1.doc_id = s.doc_id WHERE s.score >= 0.5),
      t2 AS (SELECT doc_id, source,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> length(x) > 0) AS toks
             FROM s2),
      te AS (SELECT list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks
             FROM documents WHERE doc_id % 97 = 0),
      eg AS (SELECT DISTINCT g FROM (
               SELECT unnest(CASE WHEN len(toks) >= 8 THEN
                   list_transform(generate_series(1, len(toks) - 7),
                     i -> array_to_string(toks[i:i+7], ' '))
                 WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                 ELSE [] END) AS g FROM te)),
      tg AS (SELECT DISTINCT doc_id, g FROM (
               SELECT doc_id, unnest(CASE WHEN len(toks) >= 8 THEN
                   list_transform(generate_series(1, len(toks) - 7),
                     i -> array_to_string(toks[i:i+7], ' '))
                 WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                 ELSE [] END) AS g FROM t2)),
      contaminated AS (SELECT DISTINCT doc_id FROM tg JOIN eg USING (g)),
      d3 AS (SELECT t2.doc_id, t2.source, CAST(len(toks) AS INT)
               AS n_tok
             FROM t2 WHERE NOT EXISTS (SELECT 1 FROM contaminated c
               WHERE c.doc_id = t2.doc_id)),
      tot AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok
              FROM d3 GROUP BY source),
      kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM tot),
      thr AS (SELECT source,
                CAST(floor(least(1.0,
                  CAST(10000 AS DOUBLE) / k / tok) * 65536) AS BIGINT)
                  AS th
              FROM tot CROSS JOIN kk),
      kept AS (SELECT d3.doc_id, d3.source, d3.n_tok
               FROM d3 JOIN thr USING (source)
               WHERE CAST(('0x' || substring(
                   md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                 % 65536 < th)
      SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
             CAST(sum(n_tok) AS BIGINT) AS kept_tokens
      FROM kept GROUP BY source ORDER BY source""",

    // one MSE gradient step under the algebraic sigmoid at the q97
    // default weights; label = (lang == 'en'); per-feature sums are
    // ordered-list folds (the q103 list_reduce pattern); the trailing
    // `+ 0.0` normalizes a possible all-negative-zero fold (DuckDB's
    // list_reduce seeds with the first element, Spark's fold with
    // +0.0)
    "q110_quality_grad" -> """
      WITH t AS (
        SELECT doc_id, lang, text,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents),
      f AS (SELECT doc_id, lang,
              least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS lenf,
              CASE WHEN length(text) > 0 THEN
                CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                     AS DOUBLE) / CAST(length(text) AS DOUBLE)
                ELSE 0.0 END AS punct,
              CASE WHEN length(text) > 0 THEN
                CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                     AS DOUBLE) / CAST(length(text) AS DOUBLE)
                ELSE 0.0 END AS upper_r,
              CASE WHEN len(toks) > 0 THEN
                CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','an','and','or','of','to','in','is','it','that',
                   'for','on','with','as','was','at','by','be','this'], x)))
                  AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                ELSE 0.0 END AS swr,
              CASE WHEN len(toks) > 0 THEN
                CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                ELSE 0.0 END AS mwl
            FROM t),
      l AS (SELECT *,
              ((((-1.0 + 1.2 * lenf) + -3.0 * punct) + -1.5 * upper_r)
                + 2.5 * swr) + -0.05 * mwl AS logit
            FROM f),
      r AS (SELECT lenf, punct, upper_r, swr, mwl,
              ((0.5 + 0.5 * (logit / (1.0 + abs(logit))))
                - CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
              * (0.5 / ((1.0 + abs(logit)) * (1.0 + abs(logit))))
                AS resid
            FROM l),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM r)
      SELECT feature, g FROM (
        SELECT 'bias' AS feature,
               round(list_reduce(list(resid ORDER BY resid),
                 (a, b) -> a + b) / (SELECT cnt FROM n) + 0.0, 6) AS g
        FROM r
        UNION ALL
        SELECT 'len_feat',
               round(list_reduce(list(resid * lenf ORDER BY resid * lenf),
                 (a, b) -> a + b) / (SELECT cnt FROM n) + 0.0, 6)
        FROM r
        UNION ALL
        SELECT 'punct_ratio',
               round(list_reduce(list(resid * punct ORDER BY resid * punct),
                 (a, b) -> a + b) / (SELECT cnt FROM n) + 0.0, 6)
        FROM r
        UNION ALL
        SELECT 'upper_ratio',
               round(list_reduce(list(resid * upper_r
                   ORDER BY resid * upper_r),
                 (a, b) -> a + b) / (SELECT cnt FROM n) + 0.0, 6)
        FROM r
        UNION ALL
        SELECT 'stopword_ratio',
               round(list_reduce(list(resid * swr ORDER BY resid * swr),
                 (a, b) -> a + b) / (SELECT cnt FROM n) + 0.0, 6)
        FROM r
        UNION ALL
        SELECT 'mean_word_len',
               round(list_reduce(list(resid * mwl ORDER BY resid * mwl),
                 (a, b) -> a + b) / (SELECT cnt FROM n) + 0.0, 6)
        FROM r)
      ORDER BY feature""",

    // lowest-id quantizer (deliberately degenerate on BoW), then
    // oversized cells re-keyed by a portable md5 subcell hash with a
    // 200-row cap: cell -> cell*1024 + (hash16(doc_id) % ceil(n/200))
    "q108_semdedup_split" -> s"""
      WITH $bowDenseSql,
      cents AS (SELECT doc_id AS cent_id, v AS cv FROM dense
                ORDER BY doc_id LIMIT 16),
      scored AS (SELECT dense.doc_id, dense.v, cents.cent_id,
                        list_cosine_similarity(dense.v, cents.cv) AS cos
                 FROM dense CROSS JOIN cents),
      assigned AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT doc_id, v, cent_id AS cell,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY cos DESC, cent_id ASC) AS rn
          FROM scored) WHERE rn = 1),
      counts AS (SELECT cell, count(*) AS n FROM assigned GROUP BY 1),
      fac AS (SELECT cell, CAST(ceil(n / 200.0) AS INT) AS s FROM counts),
      split AS (SELECT a.doc_id, a.v,
          CAST(a.cell * 1024 + CASE WHEN f.s > 1 THEN
            CAST(('0x' || substring(md5(CAST(a.doc_id AS VARCHAR)), 1, 4))
                 AS INTEGER) % f.s
            ELSE 0 END AS INT) AS cell
        FROM assigned a JOIN fac f USING (cell)),
      pairs AS (SELECT a.cell, b.doc_id AS dup_id, a.doc_id AS kept0,
                       round(list_cosine_similarity(a.v, b.v), 6) AS cos6
                FROM split a JOIN split b
                  ON a.cell = b.cell AND a.doc_id < b.doc_id
                WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95),
      dups AS (SELECT cell, dup_id, min(kept0) AS kept_id,
                      max(cos6) AS max_cosine
               FROM pairs GROUP BY 1, 2)
      SELECT cell, count(*) AS n_dups,
             CAST(sum(CASE WHEN dup_id = kept_id + 1000000
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS n_variant_pairs,
             min(max_cosine) AS min_cosine,
             max(max_cosine) AS top_cosine
      FROM dups GROUP BY 1 ORDER BY 1""",

    // lag flags run starts, a running sum numbers runs, lead closes
    // each interval — the same three windows the operator uses
    "q139_scd2" -> scd2RebuildSql,

    // same synthetic multi-line docs; boilerplate = lines in >= 2 docs
    // AND >= 50% of the source's docs; strip via an order-preserving
    // list_filter against the per-source boilerplate list
    "q140_boilerplate" -> """
      WITH m AS (SELECT doc_id, source AS grp,
              '== ' || source || ' navigation ==' || chr(10) ||
              text || chr(10) ||
              (CASE WHEN doc_id % 4 = 0
                    THEN 'subscribe to ' || source || chr(10)
                    ELSE '' END) ||
              'copyright ' || source AS txt
            FROM documents),
      w AS (SELECT doc_id, grp,
              list_filter(list_transform(string_split(txt, chr(10)),
                x -> trim(x)), x -> length(x) > 0) AS lines
            FROM m),
      e AS (SELECT grp, unnest(list_distinct(lines)) AS line FROM w),
      df AS (SELECT grp, line, count(*) AS df FROM e GROUP BY 1, 2),
      sz AS (SELECT grp, count(*) AS n_docs FROM m GROUP BY 1),
      b AS (SELECT df.grp, list_sort(list(line)) AS blist
            FROM df JOIN sz USING (grp)
            WHERE df >= 2 AND CAST(df AS DOUBLE) >= n_docs * 0.5
            GROUP BY 1),
      c AS (SELECT doc_id, w.grp,
              list_filter(lines,
                x -> NOT coalesce(list_contains(blist, x), false)) AS clean,
              lines
            FROM w LEFT JOIN b ON w.grp = b.grp)
      SELECT doc_id, grp, array_to_string(clean, chr(10)) AS clean_text,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(clean) AS BIGINT) AS n_kept
      FROM c ORDER BY doc_id""",

    // 3 unrolled PageRank iterations; per-node sums fold the
    // value-sorted contribution list (list_reduce starts from the
    // first element, Spark's aggregate from 0.0 — IEEE-identical
    // since 0.0 + x = x); damping constants built from
    // CAST(0.85 AS DOUBLE) so both engines use the same doubles
    "q141_pagerank" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e AS (SELECT DISTINCT a.i AS src, b.i AS dst
            FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i),
      n AS (SELECT DISTINCT src AS node FROM e),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM n),
      deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
              FROM e GROUP BY 1),
      p0 AS (SELECT node, 1.0 / nn.nd AS pr FROM n CROSS JOIN nn),
      s1 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p0 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p1 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s1.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s1 ON n.node = s1.node),
      s2 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p1 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p2 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s2.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s2 ON n.node = s2.node),
      s3 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p2 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p3 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s3.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s3 ON n.node = s3.node)
      SELECT node, round(pr, 9) AS pr FROM p3
      ORDER BY round(pr, 9) DESC, node LIMIT 50""",

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

    // same full rebuild again: three chained streaming merges must
    // land on the batch dimension bit-for-bit
    "q144_stream_scd2" -> scd2RebuildSql,

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

    // q141's loop with proportional contributions: w = shared-order
    // count, outdeg = Σw; ×1-exactness keeps the two forms comparable
    "q146_pagerank_weighted" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e AS (SELECT a.i AS src, b.i AS dst,
                   CAST(count(*) AS DOUBLE) AS w
            FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i
            GROUP BY 1, 2),
      n AS (SELECT DISTINCT src AS node FROM e),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM n),
      deg AS (SELECT src, CAST(sum(w) AS DOUBLE) AS outdeg
              FROM e GROUP BY 1),
      p0 AS (SELECT node, 1.0 / nn.nd AS pr FROM n CROSS JOIN nn),
      s1 AS (SELECT e.dst AS node,
               list_reduce(list((p.pr * e.w) / d.outdeg
                                ORDER BY (p.pr * e.w) / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p0 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p1 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s1.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s1 ON n.node = s1.node),
      s2 AS (SELECT e.dst AS node,
               list_reduce(list((p.pr * e.w) / d.outdeg
                                ORDER BY (p.pr * e.w) / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p1 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p2 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s2.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s2 ON n.node = s2.node)
      SELECT node, round(pr, 9) AS pr FROM p2
      ORDER BY round(pr, 9) DESC, node LIMIT 50""",

    // canonical edges -> wedges on the lower endpoint -> closing join;
    // one count per triangle corner — all integers
    "q147_triangles" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e0 AS (SELECT DISTINCT a.i AS src, b.i AS dst
             FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                FROM e0 WHERE src <> dst),
      w AS (SELECT c1.a, c1.b AS x, c2.b AS y
            FROM canon c1 JOIN canon c2
              ON c1.a = c2.a AND c1.b < c2.b),
      t AS (SELECT w.a, w.x, w.y
            FROM w JOIN canon c ON c.a = w.x AND c.b = w.y),
      pc AS (SELECT a AS node FROM t
             UNION ALL SELECT x FROM t
             UNION ALL SELECT y FROM t)
      SELECT node, CAST(count(*) AS BIGINT) AS triangles
      FROM pc GROUP BY 1 ORDER BY 1""",

    // block by key prefix, row_number within block, rank-range self
    // join = the sliding window; trigram Jaccard replayed with the
    // q43 shingle construction on both pair sides
    "q148_sorted_neighborhood" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents),
      k AS (SELECT doc_id, text,
              lower(substring(trim(text), 1, 24)) AS key
            FROM base),
      r AS (SELECT doc_id, text, key,
              substring(key, 1, 8) AS block,
              row_number() OVER (PARTITION BY substring(key, 1, 8)
                ORDER BY key, doc_id) AS rn
            FROM k),
      p AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
                   a.text AS ta, b2.text AS tb
            FROM r a JOIN r b2
              ON a.block = b2.block
             AND b2.rn > a.rn AND b2.rn <= a.rn + 3),
      tk AS (SELECT id_a, id_b,
               list_filter(string_split_regex(lower(trim(ta)), '\s+'),
                           x -> length(x) > 0) AS toka,
               list_filter(string_split_regex(lower(trim(tb)), '\s+'),
                           x -> length(x) > 0) AS tokb
             FROM p),
      sh AS (SELECT id_a, id_b,
               CASE WHEN len(toka) >= 3 THEN
                      list_distinct(list_transform(
                        generate_series(1, len(toka) - 2),
                        i -> toka[i] || ' ' || toka[i+1] || ' '
                             || toka[i+2]))
                    WHEN len(toka) > 0 THEN [array_to_string(toka, ' ')]
                    ELSE [] END AS sa,
               CASE WHEN len(tokb) >= 3 THEN
                      list_distinct(list_transform(
                        generate_series(1, len(tokb) - 2),
                        i -> tokb[i] || ' ' || tokb[i+1] || ' '
                             || tokb[i+2]))
                    WHEN len(tokb) > 0 THEN [array_to_string(tokb, ' ')]
                    ELSE [] END AS sb
             FROM tk),
      j AS (SELECT id_a, id_b,
              round(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                    / len(list_distinct(sa || sb)), 6) AS jaccard
            FROM sh WHERE len(list_distinct(sa || sb)) > 0)
      SELECT id_a, id_b, jaccard FROM j
      WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",

    // textbook PageRank with dangling-mass redistribution: per round
    // the mass on sink nodes (value-sorted fold, bit-exact) splits
    // uniformly; same IEEE op order as the engine's danglingMass path
    "q149_pagerank_dangling" -> """
      WITH e AS (SELECT o_custkey AS src,
                        o_orderkey + 10000000 AS dst FROM orders),
      n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM n),
      deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
              FROM e GROUP BY 1),
      p0 AS (SELECT node, 1.0 / nn.nd AS pr FROM n CROSS JOIN nn),
      d1 AS (SELECT coalesce(list_reduce(list(pr ORDER BY pr),
                      (a, b) -> a + b), CAST(0 AS DOUBLE)) AS m
             FROM p0 WHERE node NOT IN (SELECT src FROM deg)),
      s1 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p0 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p1 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * (coalesce(s1.s, CAST(0 AS DOUBLE))
                      + d1.m / nn.nd) AS pr
             FROM n CROSS JOIN nn CROSS JOIN d1
                    LEFT JOIN s1 ON n.node = s1.node),
      d2 AS (SELECT coalesce(list_reduce(list(pr ORDER BY pr),
                      (a, b) -> a + b), CAST(0 AS DOUBLE)) AS m
             FROM p1 WHERE node NOT IN (SELECT src FROM deg)),
      s2 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p1 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p2 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * (coalesce(s2.s, CAST(0 AS DOUBLE))
                      + d2.m / nn.nd) AS pr
             FROM n CROSS JOIN nn CROSS JOIN d2
                    LEFT JOIN s2 ON n.node = s2.node),
      d3 AS (SELECT coalesce(list_reduce(list(pr ORDER BY pr),
                      (a, b) -> a + b), CAST(0 AS DOUBLE)) AS m
             FROM p2 WHERE node NOT IN (SELECT src FROM deg)),
      s3 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p2 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p3 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * (coalesce(s3.s, CAST(0 AS DOUBLE))
                      + d3.m / nn.nd) AS pr
             FROM n CROSS JOIN nn CROSS JOIN d3
                    LEFT JOIN s3 ON n.node = s3.node)
      SELECT node, round(pr, 12) AS pr FROM p3
      ORDER BY round(pr, 12) DESC, node LIMIT 100""",

    // the UNCAPPED exact Jaccard truth (q43's oracle minus the df
    // cap): the prefix-filtered engine path must match it exactly
    "q150_prefix_filter_jaccard" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents),
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
      ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      sz AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS n_shared
                FROM ex a JOIN ex b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(CAST(n_shared AS DOUBLE)
                   / (sa.sz + sb.sz - n_shared), 6) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE round(CAST(n_shared AS DOUBLE)
                  / (sa.sz + sb.sz - n_shared), 6) >= 0.5
      ORDER BY id_a, id_b""",

    // tf-idf and BM25 replicated from q81/q83 (rounded 6), then
    // row_number ranks (score desc, id) and the RRF sum in fixed
    // order — every post-rounding op is exact IEEE in both engines
    "q151_rank_fusion" -> """
      WITH tt AS (SELECT doc_id, list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          x -> length(x) > 0) AS toks
        FROM documents),
      f AS (SELECT doc_id, tok, count(*) AS tf FROM (
              SELECT doc_id, unnest(toks) AS tok FROM tt)
            WHERE tok IN ('spark', 'query', 'vector') GROUP BY 1, 2),
      d AS (SELECT tok, count(*) AS df FROM f GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      tfidf AS (SELECT doc_id,
                  round(sum(tf * (ln((n.n + 1.0) / (d.df + 1.0))
                    + 1.0)), 6) AS score
                FROM f JOIN d USING (tok) CROSS JOIN n
                GROUP BY doc_id),
      s AS (SELECT count(*) AS n,
              CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avglen
            FROM tt),
      l AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS len FROM tt),
      bm25 AS (SELECT f.doc_id,
                 round(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * (f.tf * 2.2 / (f.tf + (l.len / s.avglen * 0.75
                                            + 0.25) * 1.2))), 6) AS score
               FROM f JOIN d USING (tok) CROSS JOIN s
                      JOIN l ON f.doc_id = l.doc_id
               GROUP BY f.doc_id),
      topt AS (SELECT doc_id, score FROM tfidf
               ORDER BY score DESC, doc_id LIMIT 200),
      topb AS (SELECT doc_id, score FROM bm25
               ORDER BY score DESC, doc_id LIMIT 200),
      rt AS (SELECT doc_id, row_number() OVER
               (ORDER BY score DESC, doc_id) AS ra FROM topt),
      rb AS (SELECT doc_id, row_number() OVER
               (ORDER BY score DESC, doc_id) AS rb FROM topb),
      fused AS (SELECT coalesce(rt.doc_id, rb.doc_id) AS doc_id,
                       rt.ra, rb.rb
                FROM rt FULL OUTER JOIN rb ON rt.doc_id = rb.doc_id)
      SELECT doc_id, ra AS rank_tfidf, rb AS rank_bm25,
             coalesce(1.0 / (60 + ra), 0) + coalesce(1.0 / (60 + rb), 0)
               AS rrf
      FROM fused ORDER BY rrf DESC, doc_id LIMIT 50""",

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

    // consecutive-token scan over the same marker-extended corpus:
    // count start positions where the 3 tokens align
    "q155_phrase_search" -> """
      WITH base AS (SELECT doc_id,
              text
              || CASE WHEN doc_id % 7 = 0
                      THEN ' needle in the haystack marker'
                      ELSE '' END
              || CASE WHEN doc_id % 21 = 0
                      THEN ' needle in the haystack marker'
                      ELSE '' END AS text
            FROM documents),
      tk AS (SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks
             FROM base),
      occ AS (SELECT doc_id,
                CAST(len(list_filter(
                  generate_series(1, greatest(len(toks) - 2, 0)),
                  i -> toks[i] = 'needle' AND toks[i+1] = 'in'
                       AND toks[i+2] = 'the')) AS BIGINT) AS n_occ
              FROM tk)
      SELECT doc_id, n_occ FROM occ WHERE n_occ > 0
      ORDER BY doc_id""",

    "q156_stream_outer_join" -> """
      WITH e AS (SELECT * FROM events WHERE user_id % 3 = 0),
      v AS (SELECT user_id AS a_user, ts AS a_ts, event_id AS a_id
            FROM e WHERE event_type = 'view'),
      p AS (SELECT user_id AS b_user, ts AS b_ts
            FROM e WHERE event_type = 'purchase'),
      j AS (SELECT v.a_user, v.a_id, p.b_ts
            FROM v LEFT JOIN p ON v.a_user = p.b_user
              AND p.b_ts >= v.a_ts
              AND p.b_ts <= v.a_ts + INTERVAL 30 MINUTE)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(b_ts) AS BIGINT) AS n_matched,
             CAST(sum(CASE WHEN b_ts IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_unmatched,
             CAST(count(DISTINCT a_user) AS BIGINT) AS n_users,
             min(CASE WHEN b_ts IS NULL THEN a_id END)
               AS min_unmatched_id
      FROM j""",

    "q157_ewma" -> ewmaSql,

    // exact stream/batch parity: the drained stream's final state per
    // key equals the batch fold over the full log
    "q178_stream_ewma" -> ewmaSql,

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

    "q160_boolean_search" -> """
      WITH tk AS (SELECT doc_id, unnest(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS t FROM documents),
      d AS (SELECT doc_id,
                   bool_or(t = 'spark') AS h1,
                   bool_or(t = 'query') AS h2,
                   bool_or(t = 'vector') AS h3
            FROM tk GROUP BY doc_id)
      SELECT doc_id FROM d WHERE h1 AND h2 AND NOT h3
      ORDER BY doc_id""",

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

    // redelivered rows all dedup away -> the batch-distinct aggregate
    "q172_stream_dedup_modern" -> """
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1 ORDER BY 1""",

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

    "q184_clustering_coeff" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e0 AS (SELECT DISTINCT a.i AS src, b.i AS dst
             FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                FROM e0 WHERE src <> dst),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
              FROM (SELECT a AS node FROM canon
                    UNION ALL SELECT b FROM canon)
              GROUP BY 1),
      w AS (SELECT c1.a, c1.b AS x, c2.b AS y
            FROM canon c1 JOIN canon c2
              ON c1.a = c2.a AND c1.b < c2.b),
      t AS (SELECT w.a, w.x, w.y
            FROM w JOIN canon c ON c.a = w.x AND c.b = w.y),
      pc AS (SELECT a AS node FROM t
             UNION ALL SELECT x FROM t
             UNION ALL SELECT y FROM t),
      tc AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
             FROM pc GROUP BY 1)
      SELECT deg.node, deg.d,
             CAST(coalesce(tc.triangles, 0) AS BIGINT) AS triangles,
             CASE WHEN deg.d >= 2 THEN
               (2.0 * CAST(coalesce(tc.triangles, 0) AS DOUBLE)) /
                 CAST(deg.d * (deg.d - 1) AS DOUBLE)
             ELSE 0.0 END AS coeff
      FROM deg LEFT JOIN tc USING (node) ORDER BY deg.node""",

    // SCD2 rebuilt over NON-purchase history, purchases interval-
    // joined as-of their time (same run-numbering CTE as q139)
    "q185_stream_asof_enrich" -> """
      WITH o AS (SELECT user_id AS entity, ts AS t, event_type AS attr,
                        CASE WHEN lag(event_type) OVER
                               (PARTITION BY user_id ORDER BY ts)
                               IS DISTINCT FROM event_type
                             THEN 1 ELSE 0 END AS chg
                 FROM events WHERE event_type <> 'purchase'),
      r AS (SELECT entity, t, attr,
                   sum(chg) OVER (PARTITION BY entity ORDER BY t
                     ROWS UNBOUNDED PRECEDING) AS run
            FROM o),
      c AS (SELECT entity, run, min(attr) AS attr,
                   min(t) AS valid_from FROM r GROUP BY entity, run),
      d AS (SELECT entity, attr, valid_from,
                   lead(valid_from) OVER
                     (PARTITION BY entity ORDER BY run) AS valid_to
            FROM c),
      p AS (SELECT user_id, ts FROM events
            WHERE event_type = 'purchase')
      SELECT d.attr AS state, CAST(count(*) AS BIGINT) AS n
      FROM p LEFT JOIN d ON d.entity = p.user_id
        AND p.ts >= d.valid_from
        AND (d.valid_to IS NULL OR p.ts < d.valid_to)
      GROUP BY 1 ORDER BY 1""",

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

    "q187_keywords" -> """
      WITH tk AS (SELECT doc_id, unnest(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             FROM tk GROUP BY 1, 2),
      df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      s AS (SELECT tf.doc_id, tf.tok,
                   CAST(tf.tf * nn.n AS DOUBLE) / CAST(df.df AS DOUBLE)
                     AS score
            FROM tf JOIN df USING (tok) CROSS JOIN nn),
      r AS (SELECT doc_id, tok, score,
                   CAST(row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, tok ASC) AS INT) AS rank
            FROM s)
      SELECT doc_id, rank, tok, score
      FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

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

    "q189_stream_full_outer" -> """
      WITH e AS (SELECT * FROM events WHERE user_id % 3 = 0),
      v AS (SELECT user_id AS a_user, ts AS a_ts, event_id AS a_id
            FROM e WHERE event_type = 'view'),
      p AS (SELECT user_id AS b_user, ts AS b_ts
            FROM e WHERE event_type = 'purchase'),
      j AS (SELECT v.a_ts, p.b_ts
            FROM v FULL OUTER JOIN p ON v.a_user = p.b_user
              AND p.b_ts >= v.a_ts
              AND p.b_ts <= v.a_ts + INTERVAL 30 MINUTE)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN a_ts IS NOT NULL AND b_ts IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
             CAST(sum(CASE WHEN b_ts IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_unmatched_views,
             CAST(sum(CASE WHEN a_ts IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphan_purchases
      FROM j""",

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

    "q193_item_similarity" -> """
      WITH b AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem WHERE l_partkey % 8 = 0),
      deg AS (SELECT i, CAST(count(*) AS BIGINT) AS d
              FROM b GROUP BY 1),
      p AS (SELECT a.i, c.i AS j, CAST(count(*) AS BIGINT) AS co
            FROM b a JOIN b c ON a.g = c.g AND a.i < c.i
            GROUP BY 1, 2),
      sym AS (SELECT i, j, co FROM p
              UNION ALL SELECT j, i, co FROM p),
      sc AS (SELECT s.i, s.j, s.co,
                    CAST(s.co AS DOUBLE) /
                      sqrt(CAST(di.d * dj.d AS DOUBLE)) AS sim
             FROM sym s
             JOIN deg di ON di.i = s.i
             JOIN deg dj ON dj.i = s.j),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY i
              ORDER BY sim DESC, j ASC) AS INT) AS rank
            FROM sc)
      SELECT i AS item, rank, j AS neighbor, co, sim
      FROM r WHERE rank <= 3 ORDER BY item, rank""",

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

    "q196_json_quarantine" -> """
      WITH l AS (SELECT event_id,
                   CASE WHEN event_id % 7 = 0
                        THEN '{"k": ' || event_id
                        ELSE '{"k": ' || event_id || ', "t": "'
                             || event_type || '"}' END AS line
                 FROM events)
      SELECT CASE WHEN json_valid(line)
                  THEN json_extract_string(line, '$.t') END AS t,
             CAST(count(*) AS BIGINT) AS n
      FROM l GROUP BY 1 ORDER BY 1""",

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

    "q204_funnel_gaps" -> """
      WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts) AS t
             FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts) AS t
             FROM events e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t
             GROUP BY 1),
      g AS (SELECT 'view->click' AS leg,
                   epoch_us(s2.t) - epoch_us(s1.t) AS gap
            FROM s2 JOIN s1 USING (user_id)
            UNION ALL
            SELECT 'click->purchase',
                   epoch_us(s3.t) - epoch_us(s2.t)
            FROM s3 JOIN s2 USING (user_id)),
      r AS (SELECT leg, gap,
                   row_number() OVER (PARTITION BY leg ORDER BY gap)
                     AS rnk,
                   count(*) OVER (PARTITION BY leg) AS n
            FROM g)
      SELECT leg, CAST(max(n) AS BIGINT) AS n_users,
             CAST(max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
                           THEN gap END) AS BIGINT) AS p50_us,
             CAST(max(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT)
                           THEN gap END) AS BIGINT) AS p90_us
      FROM r GROUP BY leg ORDER BY leg""",

    "q205_bfs_hops" -> """
      WITH RECURSIVE m AS (
        SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
        WHERE l_partkey % 4 = 0),
      e AS (SELECT DISTINCT a.i AS src, b.i AS dst
            FROM m a JOIN m b ON a.g = b.g AND a.i <> b.i),
      r AS (
        SELECT DISTINCT src AS node, 0 AS hop FROM e WHERE src % 100 = 0
        UNION
        SELECT e.dst, r.hop + 1 FROM r JOIN e ON e.src = r.node
        WHERE r.hop < 3)
      SELECT node, CAST(min(hop) AS INT) AS hop
      FROM r GROUP BY node ORDER BY node""",

    "q206_link_predict" -> """
      WITH m AS (
        SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      w AS (SELECT a.i AS src, b.i AS dst, count(*) AS w
            FROM m a JOIN m b ON a.g = b.g AND a.i <> b.i
            GROUP BY 1, 2),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                       greatest(src, dst) AS b
                FROM w WHERE w >= 2),
      adj AS (SELECT a AS n, b AS nbr FROM canon
              UNION ALL SELECT b, a FROM canon),
      deg AS (SELECT n, count(*) AS d FROM adj GROUP BY 1),
      ctr AS (SELECT adj.n, adj.nbr FROM adj JOIN deg USING (n)
              WHERE deg.d <= 40),
      cn AS (SELECT l.nbr AS x, r.nbr AS y, count(*) AS cn
             FROM ctr l JOIN ctr r ON l.n = r.n AND l.nbr < r.nbr
             GROUP BY 1, 2),
      cand AS (SELECT cn.x, cn.y, cn.cn FROM cn
               LEFT JOIN canon ON canon.a = cn.x AND canon.b = cn.y
               WHERE canon.a IS NULL)
      SELECT cand.x, cand.y, cand.cn AS jac_num,
             dx.d + dy.d - cand.cn AS jac_den
      FROM cand JOIN deg dx ON dx.n = cand.x
                JOIN deg dy ON dy.n = cand.y
      ORDER BY jac_num DESC, x, y LIMIT 100""",

    "q207_bitmap_overlap" -> """
      WITH w AS (SELECT o_orderpriority AS s, o_custkey // 64 AS word,
                        -- DuckDB range-checks 1::BIGINT << 63; the
                        -- sign-bit word is its literal two's-complement
                        -- value (Spark's shiftleft wraps silently)
                        bit_or(CASE WHEN o_custkey % 64 = 63
                          THEN -9223372036854775807 - 1
                          ELSE 1::BIGINT << CAST(o_custkey % 64 AS INT)
                          END) AS bits
                 FROM orders GROUP BY 1, 2),
      tot AS (SELECT s, CAST(sum(bit_count(bits)) AS BIGINT) AS n
              FROM w GROUP BY 1),
      p AS (SELECT a.s AS sa, b.s AS sb,
                   CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT)
                     AS n_common
            FROM w a JOIN w b ON a.word = b.word AND a.s < b.s
            GROUP BY 1, 2)
      SELECT sa, sb, ta.n AS n_a, tb.n AS n_b, p.n_common
      FROM p JOIN tot ta ON ta.s = p.sa JOIN tot tb ON tb.s = p.sb
      ORDER BY sa, sb""",

    "q208_rfm" -> """
      WITH per AS (
        SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
               count(*) AS f,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS m
        FROM orders GROUP BY 1),
      j AS (SELECT per.*, c_mktsegment AS segment,
                   date_diff('day', last_d,
                     (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
                     AS r
            FROM per JOIN customer ON c_custkey = o_custkey),
      s AS (SELECT segment,
                   ntile(5) OVER (PARTITION BY segment
                                  ORDER BY r, o_custkey) AS r_q,
                   ntile(5) OVER (PARTITION BY segment
                                  ORDER BY f, o_custkey) AS f_q,
                   ntile(5) OVER (PARTITION BY segment
                                  ORDER BY m, o_custkey) AS m_q,
                   m
            FROM j)
      SELECT segment, r_q, f_q, m_q,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(m) AS BIGINT) AS sum_m_cents
      FROM s GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",

    "q209_benford" -> """
      WITH d AS (
        SELECT 'orders.o_totalprice' AS source,
               CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                 AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
        UNION ALL
        SELECT 'lineitem.l_extendedprice',
               CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                 AS VARCHAR), 1, 1) AS INT)
        FROM lineitem),
      g AS (SELECT source, digit, count(*) AS n FROM d GROUP BY 1, 2)
      SELECT source, digit, n,
             CAST(sum(n) OVER (PARTITION BY source) AS BIGINT)
               AS n_total
      FROM g ORDER BY source, digit""",

    "q210_cusum" -> """
      WITH daily AS (
        SELECT r_name AS region, CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2),
      st AS (SELECT region, count(*) AS n,
                    CAST(sum(cents) AS BIGINT) AS tot
             FROM daily GROUP BY 1),
      p AS (SELECT daily.region, day,
                   CAST(sum(st.n * cents - st.tot) OVER (
                     PARTITION BY daily.region ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS p
            FROM daily JOIN st USING (region))
      SELECT region, day,
             CAST(p - least(min(p) OVER (
               PARTITION BY region ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               AS BIGINT) AS cusum
      FROM p ORDER BY region, day""",

    "q211_stream_cusum" -> """
      WITH d AS (SELECT user_id, ts, event_id,
                        CAST(round(value * 100) AS BIGINT) - 5000 AS d
                 FROM events),
      p AS (SELECT user_id, d,
                   CAST(sum(d) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS p
            FROM d)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(d) AS BIGINT)
               - least(CAST(min(p) AS BIGINT), 0) AS cusum
      FROM p GROUP BY user_id ORDER BY user_id""",

    "q212_shuffle_shards" -> """
      WITH h AS (SELECT doc_id,
                        md5('s42:' || CAST(doc_id AS VARCHAR)) AS h
                 FROM documents),
      r AS (SELECT doc_id, h,
                   CAST(row_number() OVER (ORDER BY h, doc_id)
                        AS BIGINT) AS rn
            FROM h)
      SELECT doc_id, h, rn, (rn - 1) // 64 AS shard
      FROM r ORDER BY rn""",

    "q213_negative_sampling" -> """
      WITH p AS (SELECT doc_id AS neg_id,
                        md5('s7:p:' || CAST(doc_id AS VARCHAR)) AS ph
                 FROM documents WHERE lang = 'en'),
      pb AS (SELECT CAST(('0x' || substring(ph, 1, 4)) AS INTEGER)
                      % 64 AS bucket, ph, neg_id
             FROM p),
      reps AS (SELECT bucket, min_by(neg_id, ph) AS neg_id
               FROM pb GROUP BY bucket),
      q AS (SELECT doc_id AS qid FROM documents WHERE lang <> 'en'),
      w AS (SELECT qid, CAST(i AS INT) AS i,
                   CAST(('0x' || substring(md5('s7:q:'
                     || CAST(qid AS VARCHAR) || ':'
                     || CAST(i AS VARCHAR)), 1, 4)) AS INTEGER)
                     % 64 AS bucket
            FROM q CROSS JOIN
                 (SELECT unnest(generate_series(1, 3)) AS i))
      SELECT w.qid, w.i, r.neg_id
      FROM w JOIN reps r USING (bucket)
      WHERE r.neg_id <> w.qid
      ORDER BY qid, i""",

    "q214_holt" -> """
      WITH f AS (SELECT user_id, count(*) AS n_events,
                        list_reduce(list([value] ORDER BY ts, event_id),
                          (s, x) -> CASE WHEN len(s) = 1
                            THEN [((x[1] + s[1]) + 0) / 2.0,
                                  ((((x[1] + s[1]) + 0) / 2.0 - s[1])
                                    + 0) / 2.0]
                            ELSE [((x[1] + s[1]) + s[2]) / 2.0,
                                  ((((x[1] + s[1]) + s[2]) / 2.0
                                    - s[1]) + s[2]) / 2.0]
                            END) AS st
                 FROM events GROUP BY user_id)
      SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
             st[1] AS level, COALESCE(st[2], 0.0) AS trend,
             st[1] + COALESCE(st[2], 0.0) AS forecast
      FROM f ORDER BY user_id""",

    "q215_target_encoding" -> """
      WITH b AS (SELECT p_brand AS cat,
                        CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS t
                 FROM lineitem JOIN part ON l_partkey = p_partkey),
      per AS (SELECT cat, count(*) AS n, CAST(sum(t) AS BIGINT) AS s
              FROM b GROUP BY 1),
      g AS (SELECT CAST(count(*) AS BIGINT) AS gn,
                   CAST(sum(t) AS BIGINT) AS gs FROM b)
      SELECT cat, CAST(n AS BIGINT) AS n,
             (CAST(s AS DOUBLE)
               + 100 * (CAST(g.gs AS DOUBLE) / CAST(g.gn AS DOUBLE)))
               / CAST(n + 100 AS DOUBLE) AS enc
      FROM per, g ORDER BY cat""",

    "q216_bom_rollup" -> """
      WITH pr AS (SELECT p_partkey AS node,
                         CAST(round(p_retailprice * 100) AS BIGINT)
                           AS cents
                  FROM part),
      anc AS (SELECT node // d AS anc, cents
              FROM pr CROSS JOIN
                   (SELECT unnest([1, 10, 100, 1000, 10000, 100000])
                      AS d) dd
              WHERE node // d >= 1)
      SELECT a.anc AS node, CAST(count(*) AS BIGINT) AS n_subtree,
             CAST(sum(cents) AS BIGINT) AS sum_subtree
      FROM anc a
      WHERE a.anc IN (SELECT node FROM pr)
      GROUP BY 1 ORDER BY 1""",

    "q217_skew_audit" -> """
      WITH c AS (SELECT l_partkey AS key, count(*) AS n
                 FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_keys
            FROM lineitem)
      SELECT key, CAST(n AS BIGINT) AS n, t.n_rows, t.n_keys
      FROM c, t ORDER BY n DESC, key LIMIT 20""",

    "q218_bootstrap_ci" -> """
      WITH b AS (SELECT o_orderpriority AS g, o_orderkey AS id,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS x
                 FROM orders),
      e AS (SELECT g, id, x, CAST(r AS INT) AS r
            FROM b CROSS JOIN
                 (SELECT unnest(generate_series(1, 20)) AS r) rr),
      u AS (SELECT g, r, x,
                   CAST(('0x' || substring(md5('ci:'
                     || CAST(id AS VARCHAR) || ':'
                     || CAST(r AS VARCHAR)), 1, 8)) AS BIGINT) AS u
            FROM e),
      w AS (SELECT g, r, x,
              (CASE WHEN u >= 1580030168 THEN 1 ELSE 0 END)
              + (CASE WHEN u >= 3160060337 THEN 1 ELSE 0 END)
              + (CASE WHEN u >= 3950075421 THEN 1 ELSE 0 END)
              + (CASE WHEN u >= 4213413783 THEN 1 ELSE 0 END)
              + (CASE WHEN u >= 4279248373 THEN 1 ELSE 0 END)
              + (CASE WHEN u >= 4292415291 THEN 1 ELSE 0 END)
              + (CASE WHEN u >= 4294609777 THEN 1 ELSE 0 END) AS w
            FROM u)
      SELECT g, r, CAST(sum(w) AS BIGINT) AS sum_w,
             CAST(sum(w * x) AS BIGINT) AS sum_wx,
             CAST(sum(w * x) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
               AS mean
      FROM w GROUP BY 1, 2 ORDER BY 1, 2""",

    "q219_ppr" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e AS (SELECT DISTINCT a.i AS src, b.i AS dst
            FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i),
      n AS (SELECT DISTINCT src AS node FROM e),
      seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 100 = 0),
      sn AS (SELECT CAST(count(*) AS DOUBLE) AS sd FROM seeds),
      rv AS (SELECT n.node,
                    CASE WHEN s.node IS NOT NULL THEN 1.0 / sn.sd
                         ELSE CAST(0 AS DOUBLE) END AS r
             FROM n CROSS JOIN sn LEFT JOIN seeds s ON n.node = s.node),
      deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
              FROM e GROUP BY 1),
      p0 AS (SELECT node, r AS pr FROM rv),
      s1 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p0 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p1 AS (SELECT rv.node,
               (1.0 - CAST(0.85 AS DOUBLE)) * rv.r
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s1.s, CAST(0 AS DOUBLE)) AS pr
             FROM rv LEFT JOIN s1 ON rv.node = s1.node),
      s2 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p1 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p2 AS (SELECT rv.node,
               (1.0 - CAST(0.85 AS DOUBLE)) * rv.r
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s2.s, CAST(0 AS DOUBLE)) AS pr
             FROM rv LEFT JOIN s2 ON rv.node = s2.node),
      s3 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p2 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p3 AS (SELECT rv.node,
               (1.0 - CAST(0.85 AS DOUBLE)) * rv.r
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s3.s, CAST(0 AS DOUBLE)) AS pr
             FROM rv LEFT JOIN s3 ON rv.node = s3.node)
      SELECT node, round(pr, 9) AS pr FROM p3
      ORDER BY pr DESC, node LIMIT 50""",

    "q220_cohort_ltv" -> """
      WITH fst AS (SELECT user_id,
                          CAST(date_trunc('week', min(ts)) AS DATE)
                            AS cohort
                   FROM events GROUP BY 1),
      sizes AS (SELECT cohort,
                       CAST(count(DISTINCT user_id) AS BIGINT)
                         AS n_users
                FROM fst GROUP BY 1),
      p AS (SELECT f.cohort,
                   date_diff('day', f.cohort, CAST(e.ts AS DATE)) // 7
                     AS age_week,
                   CAST(sum(CAST(round(e.value * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events e JOIN fst f USING (user_id)
            WHERE e.event_type = 'purchase'
            GROUP BY 1, 2),
      c AS (SELECT cohort, CAST(age_week AS BIGINT) AS age_week,
                   CAST(sum(cents) OVER (PARTITION BY cohort
                     ORDER BY age_week
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_cents
            FROM p)
      SELECT c.cohort, c.age_week, s.n_users, c.cum_cents,
             CAST(c.cum_cents AS DOUBLE) / CAST(s.n_users AS DOUBLE)
               AS ltv_cents
      FROM c JOIN sizes s USING (cohort)
      ORDER BY cohort, age_week""",

    "q221_communities" -> """
      WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem),
      wp AS (SELECT a.i AS src, b.i AS dst, count(*) AS w
             FROM m a JOIN m b ON a.g = b.g AND a.i <> b.i
             GROUP BY 1, 2),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                       greatest(src, dst) AS b
                FROM wp WHERE w >= 2),
      adj AS (SELECT a AS node, b AS nbr FROM canon
              UNION ALL SELECT b, a FROM canon),
      l0 AS (SELECT DISTINCT node, node AS label FROM adj),
      c1 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l0 l ON adj.nbr = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c1) WHERE rn = 1),
      c2 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l1 l ON adj.nbr = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c2) WHERE rn = 1),
      c3 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l2 l ON adj.nbr = l.node GROUP BY 1, 2),
      l3 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c3) WHERE rn = 1)
      SELECT node, label FROM l3 ORDER BY node""",

    "q222_postings_bytes" -> """
      WITH p AS (SELECT DISTINCT doc_id, unnest(list_filter(
                   string_split_regex(lower(trim(text)), '\s+'),
                   x -> length(x) > 0)) AS term
                 FROM documents),
      g AS (SELECT term, doc_id,
                   coalesce(doc_id - lag(doc_id, 1) OVER (
                     PARTITION BY term ORDER BY doc_id), doc_id)
                     AS gap
            FROM p)
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
             CAST(sum(1 + (length(bin(gap)) - 1) // 7) AS BIGINT)
               AS varint_bytes
      FROM g GROUP BY term
      ORDER BY df DESC, term LIMIT 100""",

    "q223_daily_bands" -> """
      WITH d AS (SELECT CAST(ts AS DATE) AS day,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      r AS (SELECT day, cents,
                   row_number() OVER (PARTITION BY day ORDER BY cents)
                     AS rnk,
                   count(*) OVER (PARTITION BY day) AS n
            FROM d)
      SELECT day, CAST(max(n) AS BIGINT) AS n_events,
             CAST(max(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT)
                           THEN cents END) AS BIGINT) AS p50_cents,
             CAST(max(CASE WHEN rnk = CAST(ceil(0.95 * n) AS BIGINT)
                           THEN cents END) AS BIGINT) AS p95_cents
      FROM r GROUP BY day ORDER BY day""",

    "q224_tpch_q3" -> """
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
             o_orderpriority,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS BIGINT) AS revenue_c4
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < DATE '1997-01-01'
        AND l_shipdate > DATE '1996-06-30'
      GROUP BY 1, 2, 3
      ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10""",

    "q225_tpch_q5" -> """
      SELECT n_name,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS BIGINT) AS revenue_c4
      FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
                        AND c_nationkey = s_nationkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1997-01-01'
      GROUP BY 1 ORDER BY revenue_c4 DESC, n_name""",

    "q226_fk_discovery" -> """
      WITH
      sk1 AS (SELECT h FROM (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(l_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM lineitem) ORDER BY h LIMIT 256),
      ph1 AS (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM orders),
      r1 AS (SELECT 'lineitem.l_orderkey' AS child_col,
                    'orders.o_orderkey' AS parent_col,
                    CAST((SELECT count(*) FROM sk1) AS BIGINT)
                      AS k_child,
                    CAST((SELECT count(*) FROM sk1
                          WHERE h IN (SELECT h FROM ph1)) AS BIGINT)
                      AS probe_hits,
                    (SELECT CASE WHEN count(*) < 256
                       THEN CAST(count(*) AS DOUBLE)
                       ELSE CAST(255 AS DOUBLE)
                            * CAST(281474976710656 AS DOUBLE)
                            / CAST(max(h) AS DOUBLE) END FROM sk1)
                      AS child_distinct_est),
      sk2 AS (SELECT h FROM (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(l_partkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM lineitem) ORDER BY h LIMIT 256),
      ph2 AS (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(p_partkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM part),
      r2 AS (SELECT 'lineitem.l_partkey', 'part.p_partkey',
                    CAST((SELECT count(*) FROM sk2) AS BIGINT),
                    CAST((SELECT count(*) FROM sk2
                          WHERE h IN (SELECT h FROM ph2)) AS BIGINT),
                    (SELECT CASE WHEN count(*) < 256
                       THEN CAST(count(*) AS DOUBLE)
                       ELSE CAST(255 AS DOUBLE)
                            * CAST(281474976710656 AS DOUBLE)
                            / CAST(max(h) AS DOUBLE) END FROM sk2)),
      sk3 AS (SELECT h FROM (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(l_suppkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM lineitem) ORDER BY h LIMIT 256),
      ph3 AS (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(s_suppkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM supplier),
      r3 AS (SELECT 'lineitem.l_suppkey', 'supplier.s_suppkey',
                    CAST((SELECT count(*) FROM sk3) AS BIGINT),
                    CAST((SELECT count(*) FROM sk3
                          WHERE h IN (SELECT h FROM ph3)) AS BIGINT),
                    (SELECT CASE WHEN count(*) < 256
                       THEN CAST(count(*) AS DOUBLE)
                       ELSE CAST(255 AS DOUBLE)
                            * CAST(281474976710656 AS DOUBLE)
                            / CAST(max(h) AS DOUBLE) END FROM sk3)),
      sk4 AS (SELECT h FROM (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(o_custkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM orders) ORDER BY h LIMIT 256),
      ph4 AS (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM customer),
      r4 AS (SELECT 'orders.o_custkey', 'customer.c_custkey',
                    CAST((SELECT count(*) FROM sk4) AS BIGINT),
                    CAST((SELECT count(*) FROM sk4
                          WHERE h IN (SELECT h FROM ph4)) AS BIGINT),
                    (SELECT CASE WHEN count(*) < 256
                       THEN CAST(count(*) AS DOUBLE)
                       ELSE CAST(255 AS DOUBLE)
                            * CAST(281474976710656 AS DOUBLE)
                            / CAST(max(h) AS DOUBLE) END FROM sk4)),
      sk5 AS (SELECT h FROM (SELECT DISTINCT CAST(('0x' || substring(
                md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)
                AS h FROM orders) ORDER BY h LIMIT 256),
      r5 AS (SELECT 'orders.o_orderkey', 'part.p_partkey',
                    CAST((SELECT count(*) FROM sk5) AS BIGINT),
                    CAST((SELECT count(*) FROM sk5
                          WHERE h IN (SELECT h FROM ph2)) AS BIGINT),
                    (SELECT CASE WHEN count(*) < 256
                       THEN CAST(count(*) AS DOUBLE)
                       ELSE CAST(255 AS DOUBLE)
                            * CAST(281474976710656 AS DOUBLE)
                            / CAST(max(h) AS DOUBLE) END FROM sk5)),
      u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
            UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
            UNION ALL SELECT * FROM r5)
      SELECT child_col, parent_col, k_child, probe_hits,
             child_distinct_est,
             CAST(probe_hits AS DOUBLE) / CAST(k_child AS DOUBLE)
               AS containment
      FROM u ORDER BY child_col, parent_col""",

    "q227_quantile_norm" -> """
      WITH r AS (SELECT event_type,
                        CAST(round(value * 100) AS BIGINT) AS cents,
                        rank() OVER (PARTITION BY event_type
                                     ORDER BY round(value * 100)) AS rk,
                        count(*) OVER (PARTITION BY event_type) AS n
                 FROM events),
      d AS (SELECT event_type, cents,
                   least((rk - 1) * 10 // (n - 1), 9) AS decile
            FROM r)
      SELECT event_type, CAST(decile AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n,
             min(cents) AS min_cents, max(cents) AS max_cents
      FROM d GROUP BY 1, 2 ORDER BY event_type, decile""",

    "q228_freshness" -> """
      WITH agg AS (SELECT event_type, max(epoch_us(ts)) AS last_us,
                          CAST(count(*) AS BIGINT) AS n_events
                   FROM events GROUP BY 1),
      g AS (SELECT max(last_us) AS wm_us FROM agg)
      SELECT event_type, n_events,
             strftime(make_timestamp(last_us), '%Y-%m-%d %H:%M:%S')
               AS last_event,
             CAST((g.wm_us - last_us) // 60000000 AS BIGINT)
               AS lag_minutes,
             (g.wm_us - last_us) > 604800000000 AS stale_7d
      FROM agg, g ORDER BY event_type""",

    "q229_ks_drift" -> """
      WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
                 FROM events),
      t AS (SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CASE WHEN epoch_us(ts) <= b.lo + (b.hi - b.lo) // 2
                        THEN 1 ELSE 0 END AS a
            FROM events, b),
      v AS (SELECT event_type, cents, CAST(sum(a) AS BIGINT) AS ca,
                   CAST(sum(1 - a) AS BIGINT) AS cb
            FROM t GROUP BY 1, 2),
      c AS (SELECT event_type,
                   CAST(sum(ca) OVER (PARTITION BY event_type
                     ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS BIGINT) AS cuma,
                   CAST(sum(cb) OVER (PARTITION BY event_type
                     ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS BIGINT) AS cumb,
                   CAST(sum(ca) OVER (PARTITION BY event_type)
                     AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY event_type)
                     AS BIGINT) AS nb
            FROM v)
      SELECT event_type, max(na) AS n_a, max(nb) AS n_b,
             CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num,
             max(na) * max(nb) AS d_den,
             CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
               / CAST(max(na) * max(nb) AS DOUBLE) AS d
      FROM c GROUP BY 1 ORDER BY 1""",

    "q230_markov_hitrate" -> """
      WITH s AS (SELECT user_id, event_type,
                        lead(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS next_type
                 FROM events),
      p AS (SELECT event_type AS prev_type, next_type FROM s
            WHERE next_type IS NOT NULL),
      c AS (SELECT prev_type, next_type, count(*) AS c
            FROM p GROUP BY 1, 2),
      pr AS (SELECT prev_type, next_type AS predicted FROM (
               SELECT prev_type, next_type, row_number() OVER (
                 PARTITION BY prev_type ORDER BY c DESC, next_type)
                 AS rn
               FROM c) WHERE rn = 1)
      SELECT p.prev_type, pr.predicted,
             CAST(count(*) AS BIGINT) AS n_transitions,
             CAST(sum(CASE WHEN p.next_type = pr.predicted
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
             CAST(sum(CASE WHEN p.next_type = pr.predicted
                           THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS hit_rate
      FROM p JOIN pr USING (prev_type)
      GROUP BY 1, 2 ORDER BY prev_type""",

    "q231_weighted_quantiles" -> """
      WITH pv AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100)
                           AS BIGINT) AS v,
                         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                           AS w
                  FROM lineitem GROUP BY 1, 2),
      c AS (SELECT l_returnflag, v,
                   CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cw,
                   CAST(sum(w) OVER (PARTITION BY l_returnflag)
                     AS BIGINT) AS tw
            FROM pv)
      SELECT l_returnflag, max(tw) AS total_w,
             min(CASE WHEN cw * 4 >= tw * 1 THEN v END) AS p25_cents,
             min(CASE WHEN cw * 2 >= tw * 1 THEN v END) AS p50_cents,
             min(CASE WHEN cw * 4 >= tw * 3 THEN v END) AS p75_cents,
             min(CASE WHEN cw * 10 >= tw * 9 THEN v END) AS p90_cents
      FROM c GROUP BY 1 ORDER BY 1""",

    "q232_seasonal_decomp" -> """
      WITH daily AS (SELECT event_type,
                            CAST(date_trunc('day', ts) AS DATE) AS day,
                            CAST(sum(CAST(round(value * 100) AS BIGINT))
                              AS BIGINT) AS cents
                     FROM events GROUP BY 1, 2),
      d2 AS (SELECT event_type, day, cents,
                    date_diff('day', DATE '1970-01-01', day) AS eday
             FROM daily),
      t AS (SELECT event_type, day, cents,
                   count(*) OVER (PARTITION BY event_type ORDER BY eday
                     RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn,
                   CAST(sum(cents) OVER (PARTITION BY event_type
                     ORDER BY eday RANGE BETWEEN 3 PRECEDING AND
                     3 FOLLOWING) AS BIGINT) AS ws
            FROM d2)
      SELECT event_type, CAST(dayofweek(day) AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(cents * 7 - ws) AS BIGINT) AS seasonal_num,
             CAST(sum(cents * 7 - ws) AS DOUBLE)
               / CAST(count(*) * 7 AS DOUBLE) AS seasonal_cents
      FROM t WHERE wn = 7 GROUP BY 1, 2 ORDER BY 1, 2""",

    "q233_late_drop_census" -> """
      WITH e AS (SELECT event_id, epoch_us(ts) AS us,
                        CAST(event_id % 4 AS INT) AS batch
                 FROM events),
      mx AS (SELECT batch, max(us) AS bmax FROM e GROUP BY 1),
      wm AS (SELECT batch,
                    max(bmax) OVER (ORDER BY batch
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
                      - 86400000000 AS wm_us
             FROM mx)
      SELECT e.batch, CAST(count(*) AS BIGINT) AS n_in,
             CAST(sum(CASE WHEN wm.wm_us IS NULL OR e.us >= wm.wm_us
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN wm.wm_us IS NULL OR e.us >= wm.wm_us
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_late
      FROM e JOIN wm USING (batch)
      GROUP BY 1 ORDER BY 1""",

    "q234_incr_term_stats" -> """
      WITH tk AS (SELECT doc_id, unnest(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS term
                  FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM tk GROUP BY 1, 2)
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS cf
      FROM tf GROUP BY term
      ORDER BY df DESC, term ASC LIMIT 100""",

    "q235_knn_classify" -> """
      WITH q AS (SELECT vec_id AS query_id,
                        CAST(embedding AS DOUBLE[]) AS qv,
                        CAST(label AS INT) AS true_label
                 FROM embeddings WHERE vec_id % 20 = 0),
      c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
                   CAST(label AS INT) AS nbr_label
            FROM embeddings WHERE vec_id % 20 <> 0),
      s AS (SELECT q.query_id, q.true_label, c.nbr_label, c.vec_id,
                   list_cosine_similarity(c.cv, q.qv) AS cos
            FROM c CROSS JOIN q),
      t AS (SELECT * FROM s QUALIFY row_number() OVER (
              PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)
              <= 10),
      v AS (SELECT query_id, true_label, nbr_label,
                   CAST(count(*) AS BIGINT) AS votes
            FROM t GROUP BY 1, 2, 3),
      p AS (SELECT query_id, true_label, nbr_label AS predicted,
                   votes AS n_votes
            FROM v QUALIFY row_number() OVER (PARTITION BY query_id
              ORDER BY votes DESC, nbr_label ASC) = 1)
      SELECT query_id, true_label, predicted, n_votes,
             true_label = predicted AS correct
      FROM p ORDER BY query_id""",

    "q236_decay_attribution" -> """
      WITH p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
                 FROM events WHERE event_type = 'purchase'),
      v AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   epoch_us(ts) AS v_us
            FROM events WHERE event_type = 'view'),
      c AS (SELECT p.p_id, v.day,
                   1.0 / CAST(1::BIGINT <<
                     ((p.p_us - v.v_us) // 60000000) AS DOUBLE) AS w
            FROM p JOIN v ON p.user_id = v.user_id
              AND v.v_us <= p.p_us
              AND v.v_us >= p.p_us - 3600000000),
      tw AS (SELECT p_id,
                    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list(w ORDER BY w)), (s, x) -> s + x) AS twv
             FROM c GROUP BY p_id),
      cr AS (SELECT c.day, c.w / tw.twv AS credit
             FROM c JOIN tw USING (p_id))
      SELECT day, CAST(count(*) AS BIGINT) AS n_touches,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(credit ORDER BY credit)), (s, x) -> s + x)
               AS credit
      FROM cr GROUP BY day ORDER BY day""",

    "q237_unpivot" -> """
      WITH w AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
                        CAST(count(DISTINCT l_partkey) AS BIGINT)
                          AS n_parts,
                        CAST(count(DISTINCT l_suppkey) AS BIGINT)
                          AS n_supps
                 FROM lineitem GROUP BY 1)
      SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM w
        UNION ALL
        SELECT l_returnflag, 'n_parts', n_parts FROM w
        UNION ALL
        SELECT l_returnflag, 'n_supps', n_supps FROM w)
      ORDER BY l_returnflag, metric""",

    "q238_incr_kmv_actives" -> """
      WITH d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
                   AS day,
                        CAST(('0x' || substring(md5(
                          CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)
                          AS h
                 FROM events),
      s AS (SELECT day, h FROM d QUALIFY row_number() OVER (
              PARTITION BY day ORDER BY h) <= 128),
      u AS (SELECT DISTINCT h FROM s),
      k AS (SELECT h FROM u ORDER BY h LIMIT 128),
      agg AS (SELECT count(*) AS c, max(h) AS hk FROM k),
      est AS (SELECT CASE WHEN c < 128 THEN CAST(c AS DOUBLE)
                          ELSE CAST(127 AS DOUBLE)
                               * CAST(281474976710656 AS DOUBLE)
                               / CAST(hk AS DOUBLE) END AS e
              FROM agg),
      ex AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE)
               AS n_exact FROM events)
      SELECT round(e, 6) AS distinct_est, n_exact,
             abs(e - n_exact) <= n_exact * 0.2 AS within_20pct
      FROM est, ex""",

    "q239_winsorize" -> """
      WITH e AS (SELECT event_type,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      pv AS (SELECT event_type, cents AS v,
                    CAST(count(*) AS BIGINT) AS w
             FROM e GROUP BY 1, 2),
      c AS (SELECT event_type, v,
                   CAST(sum(w) OVER (PARTITION BY event_type ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cw,
                   CAST(sum(w) OVER (PARTITION BY event_type)
                     AS BIGINT) AS tw
            FROM pv),
      cuts AS (SELECT event_type,
                      min(CASE WHEN cw * 20 >= tw * 1 THEN v END)
                        AS p05,
                      min(CASE WHEN cw * 20 >= tw * 19 THEN v END)
                        AS p95
               FROM c GROUP BY 1)
      SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
             max(cuts.p05) AS p05_cents, max(cuts.p95) AS p95_cents,
             CAST(sum(least(greatest(e.cents, cuts.p05), cuts.p95))
               AS BIGINT) AS wsum_cents,
             CAST(sum(least(greatest(e.cents, cuts.p05), cuts.p95))
               AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS winsorized_mean_cents
      FROM e JOIN cuts USING (event_type)
      GROUP BY 1 ORDER BY 1""",

    "q240_stratified_split" -> """
      WITH r AS (SELECT source, doc_id, n_chars,
                        row_number() OVER (PARTITION BY source
                          ORDER BY md5(CAST(doc_id AS VARCHAR)),
                          doc_id) AS rn,
                        count(*) OVER (PARTITION BY source) AS n
                 FROM documents),
      f AS (SELECT source, n_chars,
                   rn <= (n + 4) // 5 AS is_test
            FROM r)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test,
             CAST(sum(CASE WHEN is_test THEN n_chars ELSE 0 END)
               AS BIGINT) AS test_chars,
             CAST(sum(CASE WHEN is_test THEN 0 ELSE n_chars END)
               AS BIGINT) AS train_chars
      FROM f GROUP BY 1 ORDER BY 1""",

    "q241_regression_metrics" -> """
      WITH e AS (SELECT event_type, event_id,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      tr AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_train,
                    CAST(sum(cents) AS BIGINT) AS s
             FROM e WHERE event_id % 2 = 0 GROUP BY 1),
      m AS (SELECT event_type, n_train,
                   (2 * s + n_train) // (2 * n_train) AS pred_cents
            FROM tr),
      te AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_test,
                    CAST(sum(cents) AS BIGINT) AS ts
             FROM e WHERE event_id % 2 = 1 GROUP BY 1),
      tm AS (SELECT event_type, n_test,
                    (2 * ts + n_test) // (2 * n_test) AS tmean
             FROM te)
      SELECT e.event_type, max(m.n_train) AS n_train,
             max(tm.n_test) AS n_test,
             max(m.pred_cents) AS pred_cents,
             CAST(sum(abs(e.cents - m.pred_cents)) AS BIGINT)
               AS mae_num,
             CAST(sum((e.cents - m.pred_cents)
               * (e.cents - m.pred_cents)) AS BIGINT) AS sse,
             CAST(sum((e.cents - tm.tmean)
               * (e.cents - tm.tmean)) AS BIGINT) AS sst,
             CAST(sum(abs(e.cents - m.pred_cents)) AS DOUBLE)
               / CAST(max(tm.n_test) AS DOUBLE) AS mae_cents,
             1.0 - CAST(sum((e.cents - m.pred_cents)
                     * (e.cents - m.pred_cents)) AS DOUBLE)
                   / CAST(sum((e.cents - tm.tmean)
                     * (e.cents - tm.tmean)) AS DOUBLE) AS r2
      FROM e JOIN m USING (event_type) JOIN tm USING (event_type)
      WHERE e.event_id % 2 = 1
      GROUP BY 1 ORDER BY 1""",

    // Relational replay of the two observe() checkpoints: the engine's
    // accumulator metrics must equal a plain filtered aggregate.
    "q242_observed_pipeline" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_in,
             CAST(sum(n_chars) AS BIGINT) AS chars_in,
             CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN n_chars >= 200 THEN n_chars ELSE 0 END)
               AS BIGINT) AS chars_kept,
             CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE) AS kept_frac
      FROM documents""",

    "q243_longest_streak" -> """
      WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                    FROM events WHERE event_type = 'purchase'),
      i AS (SELECT user_id, day,
                   date_diff('day', DATE '1970-01-01', day)
                     - row_number() OVER (PARTITION BY user_id
                         ORDER BY day) AS isl
            FROM days),
      g AS (SELECT user_id, isl,
                   CAST(count(*) AS BIGINT) AS streak_days,
                   min(day) AS streak_start
            FROM i GROUP BY 1, 2),
      b AS (SELECT user_id, streak_days, streak_start,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY streak_days DESC, streak_start ASC) AS rn
            FROM g)
      SELECT user_id, streak_days, streak_start
      FROM b WHERE rn = 1 AND streak_days >= 3
      ORDER BY user_id""",

    // Running-max lateness replay + the q231 integer-threshold
    // quantile rule over per-minute lateness (weight = row count).
    "q244_disorder_census" -> """
      WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us
                 FROM events),
      l AS (SELECT event_type,
                   greatest(coalesce(max(us) OVER (PARTITION BY
                     event_type ORDER BY event_id ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING) - us,
                     0), 0) // 60000000 AS late_min
            FROM e),
      pv AS (SELECT event_type, late_min AS v,
                    CAST(count(*) AS BIGINT) AS w
             FROM l GROUP BY 1, 2),
      c AS (SELECT event_type, v,
                   CAST(sum(w) OVER (PARTITION BY event_type ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cw,
                   CAST(sum(w) OVER (PARTITION BY event_type)
                     AS BIGINT) AS tw
            FROM pv),
      qs AS (SELECT event_type,
                    min(CASE WHEN cw * 2 >= tw * 1 THEN v END)
                      AS p50_late_min,
                    min(CASE WHEN cw * 10 >= tw * 9 THEN v END)
                      AS p90_late_min,
                    min(CASE WHEN cw * 100 >= tw * 99 THEN v END)
                      AS p99_late_min
             FROM c GROUP BY 1),
      agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN late_min > 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_disordered,
                     CAST(max(late_min) AS BIGINT) AS max_late_min
              FROM l GROUP BY 1)
      SELECT agg.event_type, agg.n, agg.n_disordered, agg.max_late_min,
             qs.p50_late_min, qs.p90_late_min, qs.p99_late_min
      FROM agg JOIN qs USING (event_type)
      ORDER BY agg.event_type""",

    // per-stage counts replayed from the q127 CTE chain: the engine's
    // accumulator-observed metrics must equal the relational censuses
    "q245_pipeline_metrics" -> s"""
      WITH $q97ScorePrefixSql,
      keep1 AS (SELECT min(doc_id) AS doc_id FROM documents
                GROUP BY md5(text)),
      s1 AS (SELECT d.doc_id, d.source, d.text FROM documents d
             JOIN keep1 k ON d.doc_id = k.doc_id),
      s2 AS (SELECT s1.doc_id, s1.source, s1.text FROM s1
             JOIN s ON s1.doc_id = s.doc_id WHERE s.score >= 0.5),
      t2 AS (SELECT doc_id, source,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> length(x) > 0) AS toks
             FROM s2),
      te AS (SELECT list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks
             FROM documents WHERE doc_id % 97 = 0),
      eg AS (SELECT DISTINCT g FROM (
               SELECT unnest(CASE WHEN len(toks) >= 8 THEN
                   list_transform(generate_series(1, len(toks) - 7),
                     i -> array_to_string(toks[i:i+7], ' '))
                 WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                 ELSE [] END) AS g FROM te)),
      tg AS (SELECT DISTINCT doc_id, g FROM (
               SELECT doc_id, unnest(CASE WHEN len(toks) >= 8 THEN
                   list_transform(generate_series(1, len(toks) - 7),
                     i -> array_to_string(toks[i:i+7], ' '))
                 WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                 ELSE [] END) AS g FROM t2)),
      contaminated AS (SELECT DISTINCT doc_id FROM tg JOIN eg USING (g)),
      d3 AS (SELECT t2.doc_id, t2.source, CAST(len(toks) AS INT)
               AS n_tok
             FROM t2 WHERE NOT EXISTS (SELECT 1 FROM contaminated c
               WHERE c.doc_id = t2.doc_id)),
      tot AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok
              FROM d3 GROUP BY source),
      kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM tot),
      thr AS (SELECT source,
                CAST(floor(least(1.0,
                  CAST(10000 AS DOUBLE) / k / tok) * 65536) AS BIGINT)
                  AS th
              FROM tot CROSS JOIN kk),
      kept AS (SELECT d3.doc_id, d3.source, d3.n_tok
               FROM d3 JOIN thr USING (source)
               WHERE CAST(('0x' || substring(
                   md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                 % 65536 < th),
      cn AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents)
                      AS n0,
                    (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
                    (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
                    (SELECT CAST(count(*) AS BIGINT) FROM d3) AS n3,
                    (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n4)
      SELECT stage_ix, stage, n_in, n_kept,
             CAST(n_kept AS DOUBLE) / CAST(n_in AS DOUBLE) AS kept_frac
      FROM (SELECT 0 AS stage_ix, 'exact_dedup' AS stage,
                   n0 AS n_in, n1 AS n_kept FROM cn
            UNION ALL SELECT 1, 'quality', n1, n2 FROM cn
            UNION ALL SELECT 2, 'decontaminate', n2, n3 FROM cn
            UNION ALL SELECT 3, 'token_budget', n3, n4 FROM cn)
      ORDER BY stage_ix""",

    // sweep-line replay: ±1 endpoints, running sum; at equal t the -1
    // sorts first (d ascending) exactly as the engine pins it
    "q246_max_concurrency" -> """
      WITH e AS (SELECT event_type, epoch_us(ts) AS us,
                        CAST(round(value * 100) AS BIGINT) % 3600 + 60
                          AS dur_s
                 FROM events),
      p AS (SELECT event_type, us AS t, 1 AS d FROM e
            UNION ALL
            SELECT event_type, us + dur_s * 1000000, -1 FROM e),
      r AS (SELECT event_type, t,
                   CAST(sum(d) OVER (PARTITION BY event_type
                     ORDER BY t, d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS BIGINT) AS run
            FROM p),
      m AS (SELECT event_type, max(run) AS max_concurrent
            FROM r GROUP BY 1)
      SELECT r.event_type, m.max_concurrent,
             CAST(min(r.t) AS BIGINT) AS at_us
      FROM r JOIN m ON r.event_type = m.event_type
                   AND r.run = m.max_concurrent
      GROUP BY 1, 2 ORDER BY 1""",

    "q247_log_templates" -> """
      WITH lines AS (SELECT event_type || ' user=' ||
                            CAST(user_id AS VARCHAR) || ' took ' ||
                            CAST(CAST(round(value * 100) AS BIGINT)
                              % 1000 AS VARCHAR) || ' ms' ||
                            CASE WHEN user_id % 10 = 0 THEN ' flagged'
                                 ELSE '' END AS line
                     FROM events),
      toks AS (SELECT list_filter(string_split_regex(trim(line),
                 '[ \t\n\f\r]+'), x -> length(x) > 0) AS tk
               FROM lines),
      t2 AS (SELECT tk, len(tk) AS nt, tk[1] AS t0
             FROM toks WHERE len(tk) > 0),
      pos AS (SELECT nt, t0, generate_subscripts(tk, 1) AS pos,
                     unnest(tk) AS tok
              FROM t2),
      census AS (SELECT nt, t0, pos, CAST(count(*) AS BIGINT)
                          AS n_lines,
                        count(DISTINCT tok) = 1 AS fixed,
                        min(tok) AS tok
                 FROM pos GROUP BY 1, 2, 3),
      tmpl AS (SELECT nt, t0, max(n_lines) AS n_lines,
                      CAST(sum(CASE WHEN fixed THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_wild,
                      string_agg(CASE WHEN fixed THEN tok
                                      ELSE '<*>' END, ' '
                        ORDER BY pos) AS template
               FROM census GROUP BY 1, 2)
      SELECT template, n_lines, n_wild FROM tmpl WHERE n_lines >= 2
      ORDER BY n_lines DESC, template""",

    "q248_reconcile_columns" -> """
      WITH prev AS (SELECT doc_id, source, lang, n_chars
                    FROM documents),
      v2 AS (SELECT doc_id,
                    CASE WHEN doc_id % 7 = 0 THEN 'migrated'
                         ELSE source END AS source,
                    lang,
                    CASE WHEN doc_id % 11 = 0 THEN n_chars + 1
                         ELSE n_chars END AS n_chars
             FROM documents WHERE doc_id % 13 <> 0
             UNION ALL
             SELECT doc_id + 1000000, source, lang, n_chars
             FROM documents WHERE doc_id % 17 = 0),
      j AS (SELECT p.doc_id AS pk, c.doc_id AS ck,
                   p.source AS ps, c.source AS cs,
                   p.lang AS pl, c.lang AS cl,
                   p.n_chars AS pn, c.n_chars AS cn
            FROM prev p FULL OUTER JOIN v2 c ON p.doc_id = c.doc_id)
      SELECT metric, n FROM (
        SELECT 'added' AS metric, CAST(sum(CASE WHEN pk IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n FROM j
        UNION ALL SELECT 'removed', CAST(sum(CASE WHEN ck IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) FROM j
        UNION ALL SELECT 'matched', CAST(sum(CASE WHEN pk IS NOT NULL
                 AND ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 FROM j
        UNION ALL SELECT 'changed_any', CAST(sum(CASE WHEN
                 pk IS NOT NULL AND ck IS NOT NULL AND
                 (ps IS DISTINCT FROM cs OR pl IS DISTINCT FROM cl
                  OR pn IS DISTINCT FROM cn) THEN 1 ELSE 0 END)
                 AS BIGINT) FROM j
        UNION ALL SELECT 'changed:source', CAST(sum(CASE WHEN
                 pk IS NOT NULL AND ck IS NOT NULL AND
                 ps IS DISTINCT FROM cs THEN 1 ELSE 0 END) AS BIGINT)
                 FROM j
        UNION ALL SELECT 'changed:lang', CAST(sum(CASE WHEN
                 pk IS NOT NULL AND ck IS NOT NULL AND
                 pl IS DISTINCT FROM cl THEN 1 ELSE 0 END) AS BIGINT)
                 FROM j
        UNION ALL SELECT 'changed:n_chars', CAST(sum(CASE WHEN
                 pk IS NOT NULL AND ck IS NOT NULL AND
                 pn IS DISTINCT FROM cn THEN 1 ELSE 0 END) AS BIGINT)
                 FROM j)
      ORDER BY metric""",

    "q249_autocorr" -> """
      WITH daily AS (SELECT event_type,
                            date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS eday,
                            CAST(count(*) AS BIGINT) AS x
                     FROM events GROUP BY 1, 2),
      lags(lag) AS (VALUES (1), (2), (3), (7)),
      pr AS (SELECT a.event_type, l.lag, a.x AS x, b.x AS y
             FROM daily a CROSS JOIN lags l
             JOIN daily b ON b.event_type = a.event_type
                         AND b.eday = a.eday + l.lag),
      s AS (SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM pr GROUP BY 1, 2)
      SELECT event_type, lag, n,
             n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS den_x,
             n * syy - sy * sy AS den_y,
             CASE WHEN n * sxx - sx * sx > 0 AND
                       n * syy - sy * sy > 0 THEN
               CAST(n * sxy - sx * sy AS DOUBLE) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                  sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             END AS r
      FROM s ORDER BY event_type, lag""",

    "q250_rate_limit" -> rateLimitSql,

    // the streaming twin folds the SAME arithmetic in keyed state
    // across chronological micro-batches — stream/batch parity means
    // sharing the batch replay oracle verbatim (the q143/q144 pattern)
    "q253_stream_rate_limit" -> rateLimitSql,

    "q251_source_similarity" -> """
      WITH tk AS (SELECT source, unnest(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS tok
                  FROM documents),
      c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
            FROM tk GROUP BY 1, 2),
      norms AS (SELECT source, CAST(sum(c * c) AS BIGINT) AS norm2
                FROM c GROUP BY 1),
      dots AS (SELECT a.source AS source_a, b.source AS source_b,
                      CAST(sum(a.c * b.c) AS BIGINT) AS dot
               FROM c a JOIN c b ON a.tok = b.tok
                                AND a.source < b.source
               GROUP BY 1, 2)
      SELECT d.source_a, d.source_b, d.dot,
             na.norm2 AS norm2_a, nb.norm2 AS norm2_b,
             CAST(d.dot AS DOUBLE) /
               (sqrt(CAST(na.norm2 AS DOUBLE)) *
                sqrt(CAST(nb.norm2 AS DOUBLE))) AS cosine
      FROM dots d
      JOIN norms na ON na.source = d.source_a
      JOIN norms nb ON nb.source = d.source_b
      ORDER BY d.source_a, d.source_b""",

    "q252_abc_pareto" -> """
      WITH rev AS (SELECT l_partkey,
                          CAST(sum(CAST(round(l_extendedprice * 100)
                            AS BIGINT)) AS BIGINT) AS cents
                   FROM lineitem GROUP BY 1),
      c AS (SELECT l_partkey, cents,
                   CAST(sum(cents) OVER (ORDER BY cents DESC,
                     l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND
                     CURRENT ROW) AS BIGINT) AS cum,
                   CAST(sum(cents) OVER () AS BIGINT) AS tot
            FROM rev)
      SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END AS class,
             CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(cents) AS BIGINT) AS class_cents
      FROM c GROUP BY 1 ORDER BY 1""",

    "q254_burstiness" -> """
      WITH g AS (SELECT user_id,
                        (epoch_us(ts) - lag(epoch_us(ts)) OVER
                          (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id))
                          // 60000000 AS d
                 FROM events),
      s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(d) AS BIGINT) AS sum_min,
                   CAST(sum(d * d) AS BIGINT) AS sdd,
                   CAST(max(d) AS BIGINT) AS max_gap_min
            FROM g WHERE d IS NOT NULL GROUP BY 1)
      SELECT user_id, n_gaps, sum_min, max_gap_min,
             n_gaps * sdd - sum_min * sum_min AS var_num,
             CASE WHEN sum_min > 0 THEN
               CAST(n_gaps * sdd - sum_min * sum_min AS DOUBLE) /
                 CAST(sum_min * sum_min AS DOUBLE)
             END AS cv2
      FROM s ORDER BY user_id""",

    "q255_table_fingerprint" -> """
      WITH r AS (SELECT source,
        (CASE WHEN doc_id IS NULL THEN 'N'
              ELSE CAST(strlen(CAST(doc_id AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(doc_id AS VARCHAR) END) ||
        (CASE WHEN lang IS NULL THEN 'N'
              ELSE CAST(strlen(lang) AS VARCHAR) || ':' || lang END) ||
        (CASE WHEN n_chars IS NULL THEN 'N'
              ELSE CAST(strlen(CAST(n_chars AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(n_chars AS VARCHAR) END) AS rend
        FROM documents)
      SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(('0x' || substring(md5(rend), 1, 8))
                 AS BIGINT) % 2147483647) % 2147483647 AS BIGINT) AS fp
      FROM r GROUP BY source ORDER BY source""",

    "q256_kcore" -> """
      WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem WHERE l_partkey % 4 = 0),
      e0 AS (SELECT DISTINCT a.i AS src, b.i AS dst
             FROM m a JOIN m b USING (g) WHERE a.i <> b.i),
      b1 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e0
               GROUP BY 1) WHERE deg < 8),
      e1 AS (SELECT * FROM e0
             WHERE src NOT IN (SELECT src FROM b1)
               AND dst NOT IN (SELECT src FROM b1)),
      b2 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e1
               GROUP BY 1) WHERE deg < 8),
      e2 AS (SELECT * FROM e1
             WHERE src NOT IN (SELECT src FROM b2)
               AND dst NOT IN (SELECT src FROM b2)),
      b3 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e2
               GROUP BY 1) WHERE deg < 8),
      e3 AS (SELECT * FROM e2
             WHERE src NOT IN (SELECT src FROM b3)
               AND dst NOT IN (SELECT src FROM b3)),
      b4 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e3
               GROUP BY 1) WHERE deg < 8),
      e4 AS (SELECT * FROM e3
             WHERE src NOT IN (SELECT src FROM b4)
               AND dst NOT IN (SELECT src FROM b4))
      SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      FROM e4 GROUP BY 1 ORDER BY 1""",

    "q257_fingerprint_merge" -> """
      WITH r AS (SELECT source, doc_id,
        (CASE WHEN doc_id IS NULL THEN 'N'
              ELSE CAST(strlen(CAST(doc_id AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(doc_id AS VARCHAR) END) ||
        (CASE WHEN lang IS NULL THEN 'N'
              ELSE CAST(strlen(lang) AS VARCHAR) || ':' || lang END) ||
        (CASE WHEN n_chars IS NULL THEN 'N'
              ELSE CAST(strlen(CAST(n_chars AS VARCHAR)) AS VARCHAR)
                   || ':' || CAST(n_chars AS VARCHAR) END) AS rend
        FROM documents),
      h AS (SELECT source, doc_id,
                   CAST(('0x' || substring(md5(rend), 1, 8))
                     AS BIGINT) % 2147483647 AS hh
            FROM r),
      whole AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(sum(hh) % 2147483647 AS BIGINT) AS fp
                FROM h GROUP BY 1),
      ev AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(hh) % 2147483647 AS BIGINT) AS f
             FROM h WHERE doc_id % 2 = 0 GROUP BY 1),
      od AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(hh) % 2147483647 AS BIGINT) AS f
             FROM h WHERE doc_id % 2 <> 0 GROUP BY 1),
      m AS (SELECT coalesce(ev.source, od.source) AS source,
                   CAST(coalesce(ev.n, 0) + coalesce(od.n, 0)
                     AS BIGINT) AS n_rows_merged,
                   CAST((coalesce(ev.f, 0) + coalesce(od.f, 0))
                     % 2147483647 AS BIGINT) AS fp_merged
            FROM ev FULL OUTER JOIN od ON ev.source = od.source)
      SELECT w.source, w.n_rows, w.fp, m.n_rows_merged, m.fp_merged,
             (w.fp = m.fp_merged AND w.n_rows = m.n_rows_merged)
               AS merge_ok
      FROM whole w JOIN m USING (source) ORDER BY source""",

    "q258_session_rle" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        epoch_us(ts) AS us
                 FROM events),
      r AS (SELECT user_id, us, event_id,
                   CASE WHEN lag(event_type) OVER (PARTITION BY
                       user_id ORDER BY us, event_id)
                     IS DISTINCT FROM event_type THEN 1 ELSE 0 END
                     AS chg
            FROM e),
      rr AS (SELECT user_id, CAST(sum(chg) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS run
             FROM r),
      pr AS (SELECT user_id, run, CAST(count(*) AS BIGINT) AS len
             FROM rr GROUP BY 1, 2)
      SELECT user_id, CAST(sum(len) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_runs,
             CAST(max(len) AS BIGINT) AS longest_run,
             CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS compression
      FROM pr GROUP BY 1 ORDER BY 1""",

    "q259_assoc_rules" -> """
      WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem),
      p AS (SELECT a.i AS src, b.i AS dst,
                   CAST(count(*) AS BIGINT) AS support
            FROM m a JOIN m b USING (g) WHERE a.i <> b.i
            GROUP BY 1, 2),
      it AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i
             FROM m GROUP BY 1),
      nb AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS n FROM m)
      SELECT p.src, p.dst, p.support, a.n_i AS n_src, d.n_i AS n_dst,
             p.support * nb.n AS lift_num,
             a.n_i * d.n_i AS lift_den,
             CAST(p.support AS DOUBLE) / CAST(a.n_i AS DOUBLE)
               AS confidence,
             CAST(p.support * nb.n AS DOUBLE) /
               CAST(a.n_i * d.n_i AS DOUBLE) AS lift
      FROM p JOIN it a ON a.i = p.src JOIN it d ON d.i = p.dst
      CROSS JOIN nb
      WHERE p.support >= 3
      ORDER BY p.support DESC, p.src, p.dst LIMIT 100""",

    "q260_seq_novelty" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        epoch_us(ts) AS us
                 FROM events),
      bounds AS (SELECT min(us) + (max(us) - min(us)) // 2 AS mid
                 FROM e),
      tr AS (SELECT DISTINCT user_id, a, b FROM (
               SELECT user_id, lag(event_type) OVER (PARTITION BY
                   user_id ORDER BY us, event_id) AS a,
                 event_type AS b
               FROM e, bounds WHERE us <= mid)
             WHERE a IS NOT NULL),
      te AS (SELECT user_id, a, b FROM (
               SELECT user_id, lag(event_type) OVER (PARTITION BY
                   user_id ORDER BY us, event_id) AS a,
                 event_type AS b
               FROM e, bounds WHERE us > mid)
             WHERE a IS NOT NULL),
      nt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_test
             FROM te GROUP BY 1),
      nv AS (SELECT te.user_id, CAST(count(*) AS BIGINT) AS n_novel
             FROM te WHERE NOT EXISTS (SELECT 1 FROM tr
               WHERE tr.user_id = te.user_id AND tr.a = te.a
                 AND tr.b = te.b)
             GROUP BY te.user_id)
      SELECT nt.user_id, nt.n_test,
             CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
             CAST(coalesce(nv.n_novel, 0) AS DOUBLE) /
               CAST(nt.n_test AS DOUBLE) AS novelty
      FROM nt LEFT JOIN nv USING (user_id) ORDER BY user_id""",

    // ground truth from the construction rule, not a sniff replay:
    // doc_id%4 chose the signature, so the oracle KNOWS the format
    "q261_media_sniff" -> """
      SELECT CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  WHEN 2 THEN 'riff' ELSE 'gif' END AS format,
             lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN doc_id % 4 = 0 THEN 8 ELSE 4 END
               + octet_length(encode(text))) AS BIGINT) AS total_bytes
      FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",

    "q262_percentile_cont" -> """
      WITH v AS (SELECT l_returnflag,
                        CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS v
                 FROM lineitem)
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             quantile_cont(v, 0.25) AS p25_cents,
             quantile_cont(v, 0.5) AS p50_cents,
             quantile_cont(v, 0.75) AS p75_cents
      FROM v GROUP BY 1 ORDER BY 1""",

    "q263_histogram_bins" -> """
      WITH e AS (SELECT event_type,
                        CAST(round(value * 100) AS BIGINT) AS v
                 FROM events),
      b AS (SELECT event_type, min(v) AS lo, max(v) AS hi
            FROM e GROUP BY 1)
      SELECT e.event_type,
             CAST((e.v - b.lo) * 10 // (b.hi - b.lo + 1) AS INT)
               AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(e.v) AS BIGINT) AS bin_min,
             CAST(max(e.v) AS BIGINT) AS bin_max
      FROM e JOIN b USING (event_type)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q264_vocab_overlap" -> """
      WITH vocab AS (SELECT DISTINCT source, unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\s+'),
                       x -> length(x) > 0)) AS tok
                     FROM documents),
      sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
             FROM vocab GROUP BY 1),
      ov AS (SELECT a.source AS source_a, b.source AS source_b,
                    CAST(count(*) AS BIGINT) AS n_common
             FROM vocab a JOIN vocab b ON a.tok = b.tok
                                      AND a.source < b.source
             GROUP BY 1, 2)
      SELECT o.source_a, o.source_b, o.n_common,
             sa.sz AS sz_a, sb.sz AS sz_b,
             CAST(o.n_common AS DOUBLE) /
               CAST(sa.sz + sb.sz - o.n_common AS DOUBLE) AS jaccard,
             CAST(o.n_common AS DOUBLE) / CAST(sa.sz AS DOUBLE)
               AS cont_a
      FROM ov o JOIN sz sa ON sa.source = o.source_a
                JOIN sz sb ON sb.source = o.source_b
      ORDER BY o.source_a, o.source_b""",

    // gid derived from subtotal NULLs (the grouped columns are never
    // null in the data, so NULL == subtotal marker): matches Spark's
    // grouping_id() bit order (first GROUP BY column = MSB)
    "q265_grouping_sets" -> """
      WITH e AS (SELECT event_type, dayofweek(ts) AS dow,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events)
      SELECT event_type, dow,
             CAST(CASE WHEN event_type IS NULL THEN 2 ELSE 0 END +
                  CASE WHEN dow IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS gid,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM e
      GROUP BY GROUPING SETS ((event_type, dow), (event_type),
        (dow), ())
      ORDER BY gid, event_type, dow""",

    "q266_pps_sample" -> """
      WITH rev AS (SELECT l_partkey,
                          CAST(sum(CAST(round(l_extendedprice * 100)
                            AS BIGINT)) AS BIGINT) AS cents
                   FROM lineitem GROUP BY 1),
      c AS (SELECT l_partkey, cents,
                   CAST(sum(cents) OVER (ORDER BY cents DESC,
                     l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND
                     CURRENT ROW) AS BIGINT) AS cum,
                   CAST(sum(cents) OVER () AS BIGINT) AS tot
            FROM rev),
      s AS (SELECT l_partkey, cents, cum, tot // 200 + 1 AS step
            FROM c)
      SELECT l_partkey, cents, cum,
             CAST(cum // step - (cum - cents) // step AS BIGINT)
               AS n_hits
      FROM s
      WHERE cum // step - (cum - cents) // step >= 1
      ORDER BY l_partkey""",

    "q267_gap_fill" -> """
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY 1, 2),
      bounds AS (SELECT event_type, min(day) AS lo, max(day) AS hi
                 FROM daily GROUP BY 1),
      grid AS (SELECT event_type,
                      CAST(unnest(generate_series(CAST(lo AS
                        TIMESTAMP), CAST(hi AS TIMESTAMP),
                        INTERVAL 1 DAY)) AS DATE) AS day
               FROM bounds)
      SELECT g.event_type, g.day,
             CAST(coalesce(d.n, 0) AS BIGINT) AS n,
             d.n IS NULL AS filled
      FROM grid g LEFT JOIN daily d
        ON d.event_type = g.event_type AND d.day = g.day
      ORDER BY g.event_type, g.day""",

    "q268_chat_render" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
                        event_type,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   '<|user|> ' || string_agg(event_type || '=' ||
                     CAST(cents AS VARCHAR), ' '
                     ORDER BY us, event_id) || ' <|end|>' AS prompt
            FROM e GROUP BY user_id),
      tk AS (SELECT user_id, n_events, prompt,
                    CAST(len(list_filter(string_split_regex(
                      lower(trim(prompt)), '\s+'),
                      x -> length(x) > 0)) AS BIGINT) AS n_tok
             FROM p)
      SELECT user_id, n_events,
             CAST(length(prompt) AS BIGINT) AS prompt_chars,
             n_tok, n_tok > 64 AS over_budget,
             substring(prompt, 1, 80) AS prompt_head
      FROM tk ORDER BY user_id""",

    "q269_dpo_pairs" -> s"""
      WITH $q97ScorePrefixSql,
      sc AS (SELECT s.doc_id, d.source, s.score
             FROM s JOIN documents d USING (doc_id)),
      ch AS (SELECT source, doc_id, score, row_number() OVER
               (PARTITION BY source ORDER BY score DESC, doc_id ASC)
               AS rn
             FROM sc),
      rj AS (SELECT source, doc_id, score, row_number() OVER
               (PARTITION BY source ORDER BY score ASC, doc_id ASC)
               AS rn
             FROM sc)
      SELECT c.source, c.doc_id AS chosen_id,
             round(c.score, 6) AS chosen_score,
             r.doc_id AS rejected_id,
             round(r.score, 6) AS rejected_score,
             round(c.score - r.score, 6) AS margin
      FROM ch c JOIN rj r ON c.source = r.source
      WHERE c.rn = 1 AND r.rn = 1
      ORDER BY c.source""",

    "q270_token_fertility" -> """
      WITH d AS (SELECT lang, n_chars,
                        CAST(len(list_filter(string_split_regex(
                          lower(trim(text)), '\s+'),
                          x -> length(x) > 0)) AS BIGINT) AS tok
                 FROM documents)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(tok) AS BIGINT) AS sum_tokens,
             CAST(sum(tok) * 100 AS DOUBLE) /
               CAST(sum(n_chars) AS DOUBLE) AS fertility_per_100c
      FROM d GROUP BY 1 ORDER BY 1""",

    "q271_watermark_advisor" -> """
      WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us
                 FROM events),
      l AS (SELECT event_type,
                   greatest(coalesce(max(us) OVER (PARTITION BY
                     event_type ORDER BY event_id ROWS BETWEEN
                     UNBOUNDED PRECEDING AND 1 PRECEDING) - us,
                     0), 0) // 60000000 AS late_min
            FROM e),
      pv AS (SELECT event_type, late_min AS v,
                    CAST(count(*) AS BIGINT) AS w
             FROM l GROUP BY 1, 2),
      c AS (SELECT event_type, v,
                   CAST(sum(w) OVER (PARTITION BY event_type ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cw,
                   CAST(sum(w) OVER (PARTITION BY event_type)
                     AS BIGINT) AS tw
            FROM pv),
      qs AS (SELECT event_type,
                    min(CASE WHEN cw * 100 >= tw * 99 THEN v END)
                      AS wm_min
             FROM c GROUP BY 1)
      SELECT l.event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(max(qs.wm_min) AS BIGINT) AS wm_min,
             CAST(sum(CASE WHEN l.late_min > qs.wm_min THEN 1 ELSE 0
               END) AS BIGINT) AS n_dropped,
             CAST(sum(CASE WHEN l.late_min > qs.wm_min THEN 1 ELSE 0
               END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS drop_frac
      FROM l JOIN qs USING (event_type)
      GROUP BY 1 ORDER BY 1""",

    "q272_vocab_growth" -> """
      WITH tk AS (SELECT doc_id, unnest(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS tok
                  FROM documents),
      fst AS (SELECT tok, min(doc_id) AS f FROM tk GROUP BY tok),
      cps(n_docs) AS (VALUES (100), (200), (400), (800), (1600),
        (3200), (6400), (12800))
      SELECT CAST(n_docs AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS vocab_size
      FROM fst JOIN cps ON fst.f <= cps.n_docs
      GROUP BY 1 ORDER BY 1""",

    // s^r exact-integer, outer power by the SAME repeated-multiply
    // fold order as the engine (list_reduce with a prepended seed) —
    // identical IEEE doubles, no libm pow
    "q273_lsh_planner" -> """
      WITH grid AS (SELECT unnest(generate_series(1, 19)) AS i),
      cfg(b, r) AS (VALUES (16, 4), (8, 8), (32, 2), (4, 12)),
      t AS (SELECT i, b, r,
                   list_reduce(list_prepend(CAST(1 AS BIGINT),
                     list_transform(generate_series(1, r),
                       x -> CAST(i AS BIGINT))), (a, x) -> a * x)
                     AS num,
                   list_reduce(list_prepend(CAST(1 AS BIGINT),
                     list_transform(generate_series(1, r),
                       x -> CAST(20 AS BIGINT))), (a, x) -> a * x)
                     AS den
            FROM grid CROSS JOIN cfg),
      m AS (SELECT i, b, r,
                   CAST(1 AS DOUBLE) - CAST(num AS DOUBLE) /
                     CAST(den AS DOUBLE) AS miss
            FROM t)
      SELECT CAST(i AS DOUBLE) / 20.0 AS s, b, r,
             CAST(1 AS DOUBLE) - list_reduce(list_prepend(
               CAST(1 AS DOUBLE), list_transform(
                 generate_series(1, b), x -> miss)),
               (a, x) -> a * x) AS p_candidate
      FROM m ORDER BY s, b""",

    // next-fit fold over size-desc docs, [bins, last_fill] list state
    // (the q250 list-not-struct discipline), cap 4000 chars
    "q274_compaction_planner" -> """
      WITH l AS (SELECT source, CAST(count(*) AS BIGINT) AS n_files,
                        CAST(sum(n_chars) AS BIGINT) AS total_chars,
                        list_prepend([CAST(0 AS BIGINT), 4000],
                          list([CAST(0 AS BIGINT), n_chars]
                            ORDER BY n_chars DESC, doc_id)) AS xs
                 FROM documents GROUP BY source),
      f AS (SELECT source, n_files, total_chars,
                   list_reduce(xs, (s, x) -> CASE
                     WHEN s[2] + x[2] <= 4000
                       THEN [s[1], s[2] + x[2]]
                     ELSE [s[1] + 1, x[2]] END) AS st
            FROM l)
      SELECT source, n_files, total_chars, st[1] AS n_bins,
             CAST(total_chars AS DOUBLE) /
               CAST(st[1] * 4000 AS DOUBLE) AS fill_frac
      FROM f ORDER BY source""",

    "q275_surrogate_keys" -> """
      WITH d AS (SELECT DISTINCT source || '|' || lang AS dim
                 FROM documents),
      h AS (SELECT dim, md5('dim1:' || dim) AS h FROM d)
      SELECT dim, CAST(row_number() OVER (ORDER BY h, dim)
               AS BIGINT) AS sk
      FROM h ORDER BY sk""",

    "q276_quantile_shift" -> """
      WITH e AS (SELECT event_type, epoch_us(ts) AS us,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      bounds AS (SELECT min(us) + (max(us) - min(us)) // 2 AS mid
                 FROM e),
      pv1 AS (SELECT event_type, cents AS v,
                     CAST(count(*) AS BIGINT) AS w
              FROM e, bounds WHERE us <= mid GROUP BY 1, 2),
      c1 AS (SELECT event_type, v,
                    CAST(sum(w) OVER (PARTITION BY event_type
                      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS cw,
                    CAST(sum(w) OVER (PARTITION BY event_type)
                      AS BIGINT) AS tw
             FROM pv1),
      q1 AS (SELECT event_type, max(tw) AS p50_first_n,
                    min(CASE WHEN cw * 2 >= tw THEN v END)
                      AS p50_first
             FROM c1 GROUP BY 1),
      pv2 AS (SELECT event_type, cents AS v,
                     CAST(count(*) AS BIGINT) AS w
              FROM e, bounds WHERE us > mid GROUP BY 1, 2),
      c2 AS (SELECT event_type, v,
                    CAST(sum(w) OVER (PARTITION BY event_type
                      ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS cw,
                    CAST(sum(w) OVER (PARTITION BY event_type)
                      AS BIGINT) AS tw
             FROM pv2),
      q2 AS (SELECT event_type, max(tw) AS p50_second_n,
                    min(CASE WHEN cw * 2 >= tw THEN v END)
                      AS p50_second
             FROM c2 GROUP BY 1)
      SELECT q1.event_type, q1.p50_first_n, q1.p50_first,
             q2.p50_second_n, q2.p50_second,
             q2.p50_second - q1.p50_first AS shift_cents
      FROM q1 JOIN q2 USING (event_type)
      ORDER BY q1.event_type""",

    "q277_fk_orphans" -> """
      WITH r1 AS (SELECT 'lineitem.l_orderkey->orders' AS relation,
                         CAST(count(*) AS BIGINT) AS n_child,
                         CAST(count(DISTINCT l_orderkey) AS BIGINT)
                           AS n_keys,
                         CAST(sum(CASE WHEN o.o_orderkey IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_orphan_rows
                  FROM lineitem l LEFT JOIN orders o
                    ON l.l_orderkey = o.o_orderkey),
      r2 AS (SELECT 'orders.o_custkey->customer',
                    CAST(count(*) AS BIGINT),
                    CAST(count(DISTINCT o_custkey) AS BIGINT),
                    CAST(sum(CASE WHEN c.c_custkey IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT)
             FROM orders o LEFT JOIN customer c
               ON o.o_custkey = c.c_custkey),
      r3 AS (SELECT 'customer.c_nationkey->nation',
                    CAST(count(*) AS BIGINT),
                    CAST(count(DISTINCT c_nationkey) AS BIGINT),
                    CAST(sum(CASE WHEN n.n_nationkey IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT)
             FROM customer c LEFT JOIN nation n
               ON c.c_nationkey = n.n_nationkey),
      u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
            UNION ALL SELECT * FROM r3)
      SELECT relation, n_child, n_keys, n_orphan_rows,
             n_orphan_rows = 0 AS intact
      FROM u ORDER BY relation""",

    "q278_k_anonymity" -> """
      WITH cls AS (SELECT source, n_chars // 100 AS len_bucket,
                          CAST(count(*) AS BIGINT) AS sz,
                          CAST(count(DISTINCT lang) AS BIGINT) AS l
                   FROM documents GROUP BY 1, 2)
      SELECT CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(sz) AS BIGINT) AS n_rows,
             CAST(min(sz) AS BIGINT) AS k_anonymity,
             CAST(min(l) AS BIGINT) AS l_diversity,
             CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
               AS rows_below_k5,
             CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
               / CAST(sum(sz) AS DOUBLE) AS frac_below_k5
      FROM cls""",

    "q279_reshard_census" -> """
      WITH h AS (SELECT doc_id,
                        CAST(('0x' || substring(md5(
                          CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                          AS hh
                 FROM documents),
      s AS (SELECT doc_id, hh % 8 AS m8, hh % 9 AS m9,
                   hh * 8 // 4294967296 AS r8,
                   hh * 9 // 4294967296 AS r9
            FROM h)
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CASE WHEN m8 <> m9 THEN 1 ELSE 0 END)
               AS BIGINT) AS moved_mod,
             CAST(sum(CASE WHEN r8 <> r9 THEN 1 ELSE 0 END)
               AS BIGINT) AS moved_range,
             CAST(sum(CASE WHEN m8 <> m9 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS frac_moved_mod,
             CAST(sum(CASE WHEN r8 <> r9 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS frac_moved_range
      FROM s""",

    "q280_sample_representativeness" -> """
      WITH d AS (SELECT lang,
                        CAST(('0x' || substring(md5(
                          CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
                          % 100 < 10 AS in_sample
                 FROM documents),
      per AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_pop,
                     CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_samp
              FROM d GROUP BY 1),
      tot AS (SELECT CAST(sum(n_pop) AS BIGINT) AS tp,
                     CAST(sum(n_samp) AS BIGINT) AS ts
              FROM per)
      SELECT lang, n_pop, n_samp,
             CAST(n_pop AS DOUBLE) * CAST(ts AS DOUBLE) /
               CAST(tp AS DOUBLE) AS expected,
             (CAST(n_samp AS DOUBLE) - CAST(n_pop AS DOUBLE) *
                CAST(ts AS DOUBLE) / CAST(tp AS DOUBLE)) *
             (CAST(n_samp AS DOUBLE) - CAST(n_pop AS DOUBLE) *
                CAST(ts AS DOUBLE) / CAST(tp AS DOUBLE)) /
             (CAST(n_pop AS DOUBLE) * CAST(ts AS DOUBLE) /
                CAST(tp AS DOUBLE)) AS chi2_term
      FROM per CROSS JOIN tot ORDER BY lang""",

    "q281_cluster_sizes" -> """
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
      fl AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
             FROM documents d LEFT JOIN c ON c.id = d.doc_id),
      sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size
             FROM fl GROUP BY 1)
      SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
      FROM sz GROUP BY 1 ORDER BY 1""",

    // batch replay of the whole curation pipeline: classifier scores
    // (q97 prefix), keep >= 0.5, portable min-md5-shingle fingerprint
    // (q30 recipe), min-id/count per (fp, lang), per-lang census —
    // shared by the STREAMED (q282) and INCREMENTAL (q283) twins:
    // both must converge to this full-rebuild answer
    "q282_stream_curate" -> curateCensusSql,
    "q283_incremental_curate" -> curateCensusSql,
    "q284_retention_forecast" -> retentionForecastSql,
    "q285_dict_encoding_planner" -> dictPlannerSql,

    "q286_ship_delay_sla" -> """
      WITH d AS (SELECT o.o_orderpriority,
                        CAST(date_diff('day',
                          CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE)) AS BIGINT)
                          AS delay_days
                 FROM lineitem l JOIN orders o
                   ON o.o_orderkey = l.l_orderkey),
      pv AS (SELECT o_orderpriority, delay_days AS v,
                    CAST(count(*) AS BIGINT) AS w
             FROM d GROUP BY 1, 2),
      c AS (SELECT o_orderpriority, v,
                   CAST(sum(w) OVER (PARTITION BY o_orderpriority
                     ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
                     CURRENT ROW) AS BIGINT) AS cw,
                   CAST(sum(w) OVER (PARTITION BY o_orderpriority)
                     AS BIGINT) AS tw
            FROM pv),
      qs AS (SELECT o_orderpriority,
                    min(CASE WHEN cw * 2 >= tw THEN v END) AS p50_days,
                    min(CASE WHEN cw * 10 >= tw * 9 THEN v END)
                      AS p90_days
             FROM c GROUP BY 1),
      agg AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                     CAST(max(delay_days) AS BIGINT) AS max_days,
                     CAST(sum(CASE WHEN delay_days > 90 THEN 1 ELSE 0
                       END) AS BIGINT) AS n_breach
              FROM d GROUP BY 1)
      SELECT a.o_orderpriority, a.n, a.max_days, a.n_breach,
             q.p50_days, q.p90_days,
             CAST(a.n_breach AS DOUBLE) / CAST(a.n AS DOUBLE)
               AS breach_frac
      FROM agg a JOIN qs q USING (o_orderpriority)
      ORDER BY a.o_orderpriority""",

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

    "q290_dedup_savings" -> """
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
      fl AS (SELECT d.doc_id, d.n_chars,
                    coalesce(c.comp, d.doc_id) AS comp
             FROM documents d LEFT JOIN c ON c.id = d.doc_id),
      pc AS (SELECT comp, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(n_chars) AS BIGINT) AS chars,
                    CAST(min_by(n_chars, doc_id) AS BIGINT)
                      AS keep_chars
             FROM fl GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(sum(n - 1) AS BIGINT) AS n_removed,
             CAST(sum(chars - keep_chars) AS BIGINT) AS chars_removed,
             CAST(sum(chars) AS BIGINT) AS chars_total,
             CAST(sum(chars - keep_chars) AS DOUBLE) /
               CAST(sum(chars) AS DOUBLE) AS savings_frac
      FROM pc""",

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

    // chunked fold ≡ whole fold: the oracle replays the UNSEGMENTED
    // list_reduce — a hash match proves the carry-over chain
    "q293_rate_limit_chunked" -> rateLimitSql
  )

  /** Shared q282/q283 oracle (see comment above). lazy: it
    * interpolates q97ScorePrefixSql, which is declared LATER in this
    * object — an eager val would capture null at object init. */
  private lazy val curateCensusSql: String = s"""
      WITH $q97ScorePrefixSql,
      kept AS (SELECT d.doc_id, d.lang, d.text
               FROM documents d JOIN s ON d.doc_id = s.doc_id
               WHERE s.score >= 0.5),
      tk2 AS (SELECT doc_id, lang,
                     list_filter(string_split_regex(lower(trim(text)),
                       '\\s+'), x -> length(x) > 0) AS toks
              FROM kept),
      sh2 AS (SELECT doc_id, lang,
                     CASE WHEN len(toks) >= 3 THEN
                            list_transform(
                              generate_series(1, len(toks) - 2),
                              i -> toks[i] || ' ' || toks[i+1] ||
                                   ' ' || toks[i+2])
                          WHEN len(toks) > 0 THEN
                            [array_to_string(toks, ' ')]
                          ELSE [] END AS sg
              FROM tk2),
      fp AS (SELECT doc_id, lang,
                    list_min(list_transform(sg, g -> md5(g))) AS fp
             FROM sh2),
      g AS (SELECT fp, lang, min(doc_id) AS keeper,
                   CAST(count(*) AS BIGINT) AS n
            FROM fp GROUP BY 1, 2)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_unique,
             CAST(sum(n) AS BIGINT) AS n_docs
      FROM g GROUP BY 1 ORDER BY 1"""

  private val retentionForecastSql: String = """
      WITH e AS (SELECT epoch_us(ts) AS us,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      mx AS (SELECT max(us) AS m FROM e),
      b AS (SELECT (mx.m - e.us) // (7 * 86400000000) AS age_bucket,
                   cents
            FROM e CROSS JOIN mx),
      g AS (SELECT age_bucket, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM b GROUP BY 1)
      SELECT g.age_bucket, g.n_rows, g.cents,
             CAST((SELECT sum(g2.n_rows) FROM g g2
                   WHERE g2.age_bucket >= g.age_bucket) AS BIGINT)
               AS rows_reclaimed_if_ttl_here
      FROM g ORDER BY g.age_bucket"""

  private val dictPlannerSql: String = """
      WITH m AS (SELECT 'lang' AS col_name, lang AS v FROM documents
                 UNION ALL
                 SELECT 'source', source FROM documents),
      agg AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
                     CAST(sum(octet_length(encode(v))) AS BIGINT)
                       AS bytes_plain
              FROM m GROUP BY 1),
      d AS (SELECT col_name,
                   CAST(sum(octet_length(encode(v))) AS BIGINT)
                     AS dict_bytes
            FROM (SELECT DISTINCT col_name, v FROM m) GROUP BY 1)
      SELECT agg.col_name AS "column", agg.n_rows, agg.n_distinct,
             agg.bytes_plain,
             d.dict_bytes + agg.n_rows * 4 AS bytes_dict,
             d.dict_bytes + agg.n_rows * 4 < agg.bytes_plain
               AS dict_wins
      FROM agg JOIN d USING (col_name) ORDER BY 1"""

  /** Shared q250/q253 oracle — lazy-refill token bucket replayed as a
    * list_reduce over a BIGINT[4] state [tokens, last_minute,
    * accepted, rejected]. A LIST, not a struct: DuckDB v1.0.0
    * list_reduce mutates STRUCT accumulator fields in place,
    * field-by-field (a later field reading s.x sees the new value);
    * list construction evaluates every element against the old state.
    * The engine's explicit-init aggregate() (batch) / keyed-state fold
    * (stream) is mirrored by prepending a state-shaped sentinel. */
  private val rateLimitSql: String = """
      WITH e AS (SELECT user_id, epoch_us(ts) AS u, event_id,
                        epoch_us(ts) // 60000000 AS m
                 FROM events),
      l AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   list_prepend([CAST(3 AS BIGINT), -1, 0, 0],
                     list([CAST(0 AS BIGINT), m, 0, 0]
                       ORDER BY u, event_id)) AS xs
            FROM e GROUP BY user_id),
      f AS (SELECT user_id, n_events,
                   list_reduce(xs, (s, x) -> [
                     least(3, s[1] + CASE WHEN s[2] < 0 THEN 0
                         ELSE x[2] - s[2] END)
                       - CASE WHEN least(3, s[1] + CASE WHEN s[2] < 0
                           THEN 0 ELSE x[2] - s[2] END) >= 1
                         THEN 1 ELSE 0 END,
                     x[2],
                     s[3] + CASE WHEN least(3, s[1] + CASE WHEN
                         s[2] < 0 THEN 0 ELSE x[2] - s[2] END) >= 1
                       THEN 1 ELSE 0 END,
                     s[4] + CASE WHEN least(3, s[1] + CASE WHEN
                         s[2] < 0 THEN 0 ELSE x[2] - s[2] END) >= 1
                       THEN 0 ELSE 1 END]) AS st
            FROM l)
      SELECT user_id, n_events, st[3] AS n_accepted,
             st[4] AS n_rejected, st[1] AS tokens_left
      FROM f ORDER BY user_id"""

  /** Shared q157/q178 oracle: the order-fixed EWMA left fold, seeded
    * with each user's first value (list_reduce seeds with the first
    * element — exactly the engine's aggregate/keyed-state seeding). */
  private val ewmaSql: String = """
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             list_reduce(list(value ORDER BY ts, event_id),
                         (s, x) -> 0.5 * x + 0.5 * s) AS ewma
      FROM events GROUP BY user_id ORDER BY user_id"""

  /** Full SCD2 rebuild from the complete event log — the shared
    * oracle of q139 (batch build), q143 (incremental merge) and q144
    * (streaming merge): lag flags run starts, a running sum numbers
    * runs, lead closes each interval. */
  private val scd2RebuildSql: String = """
      WITH o AS (SELECT user_id AS entity, ts AS t,
                        event_type AS attr,
                        CASE WHEN lag(event_type) OVER
                               (PARTITION BY user_id ORDER BY ts)
                               IS DISTINCT FROM event_type
                             THEN 1 ELSE 0 END AS chg
                 FROM events),
      r AS (SELECT entity, t, attr,
                   sum(chg) OVER (PARTITION BY entity ORDER BY t
                     ROWS UNBOUNDED PRECEDING) AS run
            FROM o),
      c AS (SELECT entity, run, min(attr) AS attr,
                   min(t) AS valid_from, count(*) AS n_events
            FROM r GROUP BY entity, run)
      SELECT entity, attr, valid_from,
             lead(valid_from) OVER
               (PARTITION BY entity ORDER BY run) AS valid_to,
             n_events,
             (lead(valid_from) OVER
               (PARTITION BY entity ORDER BY run) IS NULL) AS is_current
      FROM c ORDER BY entity, valid_from"""

  /** Shared q97/q112 oracle: the linear quality model, every feature
    * and the algebraic sigmoid mirrored term-by-term in the engine's
    * evaluation order; keep is decided on the UNROUNDED score, as in
    * the engine. q112 drains the SAME classifier through a file
    * stream, so stream/batch parity means sharing this verbatim. */
  /** Shared q97/q115 oracle prefix: documents -> bit-exact classifier
    * scores (rational features + the algebraic sigmoid — no libm).
    * Emits CTEs `t..s`; `s` is (doc_id, score). */
  private val q97ScorePrefixSql: String = """t AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> length(x) > 0) AS toks
        FROM documents),
      f AS (SELECT doc_id,
              least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS lenf,
              CASE WHEN length(text) > 0 THEN
                CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                     AS DOUBLE) / CAST(length(text) AS DOUBLE)
                ELSE 0.0 END AS punct,
              CASE WHEN length(text) > 0 THEN
                CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                     AS DOUBLE) / CAST(length(text) AS DOUBLE)
                ELSE 0.0 END AS upper_r,
              CASE WHEN len(toks) > 0 THEN
                CAST(len(list_filter(toks, x -> list_contains(
                  ['the','a','an','and','or','of','to','in','is','it','that',
                   'for','on','with','as','was','at','by','be','this'], x)))
                  AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                ELSE 0.0 END AS swr,
              CASE WHEN len(toks) > 0 THEN
                CAST(list_sum(list_transform(toks, x -> length(x)))
                  AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                ELSE 0.0 END AS mwl
            FROM t),
      l AS (SELECT doc_id,
              ((((-1.0 + 1.2 * lenf) + -3.0 * punct) + -1.5 * upper_r)
                + 2.5 * swr) + -0.05 * mwl AS logit
            FROM f),
      s AS (SELECT doc_id,
              0.5 + 0.5 * (logit / (1.0 + abs(logit))) AS score
            FROM l)"""

  private val q97ClassifySql: String = s"""
      WITH $q97ScorePrefixSql
      SELECT doc_id, round(score, 6) AS score, score >= 0.5 AS keep
      FROM s ORDER BY doc_id"""

  /** Shared no-variant BoW prefix (q101/q114): documents -> dense
    * 32-dim hashed-BoW vectors, same construction as [[bowDenseSql]]
    * minus the variant rows. Emits CTEs `tk..dense`. */
  private val bowDenseDocsSql: String = """tk AS (
        SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS t FROM documents),
      contrib AS (SELECT doc_id,
          CAST(('0x' || substring(md5(t), 1, 4)) AS INTEGER) % 32 AS b
        FROM tk),
      grouped AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS val
                  FROM contrib GROUP BY 1, 2),
      dims AS (SELECT unnest(generate_series(0, 31)) AS b),
      docs2 AS (SELECT DISTINCT doc_id FROM grouped),
      cells0 AS (SELECT doc_id, d.b FROM docs2 CROSS JOIN dims d),
      dense AS (SELECT c.doc_id, list(coalesce(g.val, 0.0)
                  ORDER BY c.b) AS v
                FROM cells0 c LEFT JOIN grouped g USING (doc_id, b)
                GROUP BY c.doc_id)"""

  /** Shared q102/q107/q108 oracle prefix: documents + tail-truncated
    * variants -> dense 32-dim hashed-BoW vectors (md5 token slots,
    * integer counts). Emits CTEs `base..dense`; `dense` is
    * (doc_id, v). */
  private val bowDenseSql: String = """base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               substring(text, 1, greatest(length(text) - 30, 1))
        FROM documents),
      tk AS (SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0)) AS t FROM base),
      contrib AS (SELECT doc_id,
          CAST(('0x' || substring(md5(t), 1, 4)) AS INTEGER) % 32 AS b
        FROM tk),
      grouped AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS val
                  FROM contrib GROUP BY 1, 2),
      dims AS (SELECT unnest(generate_series(0, 31)) AS b),
      docs2 AS (SELECT DISTINCT doc_id FROM grouped),
      cells0 AS (SELECT doc_id, d.b FROM docs2 CROSS JOIN dims d),
      dense AS (SELECT c.doc_id, list(coalesce(g.val, 0.0)
                  ORDER BY c.b) AS v
                FROM cells0 c LEFT JOIN grouped g USING (doc_id, b)
                GROUP BY c.doc_id)"""

  /** One Lloyd round of the q107 oracle, mirroring [[graft.llm.KMeans
    * .fit]] exactly: centroid lists from means(r-1) (c ORDER BY dim —
    * the centroidRow array_sort), reassign (ties to lower cell id),
    * per-(cell, dim) mean of the ORIGINAL vectors, densify (empty
    * cells inherit the previous centroid). On integer-count BoW
    * vectors every mean is an exact integer-sum ratio, so the loop is
    * bit-identical across engines in any summation order. */
  private def lloydRoundSql(r: Int, src: String = "dense"): String = {
    val p = r - 1
    s"""rc$r AS (SELECT cell, list(c ORDER BY dim) AS cv
               FROM means$p GROUP BY cell),
      sc$r AS (SELECT d.doc_id, d.v, r.cell AS cent_id,
                      list_cosine_similarity(d.v, r.cv) AS cos
               FROM $src d CROSS JOIN rc$r r),
      asg$r AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT doc_id, v, cent_id AS cell,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY cos DESC, cent_id ASC) AS rn
          FROM sc$r) WHERE rn = 1),
      xx$r AS (SELECT cell,
                      CAST(unnest(generate_series(1, len(v))) AS INT) AS dim,
                      unnest(v) AS val
               FROM asg$r),
      st$r AS (SELECT cell, dim, avg(val) AS c FROM xx$r GROUP BY 1, 2),
      means$r AS (SELECT p.cell, p.dim, coalesce(s.c, p.c) AS c
                  FROM means$p p LEFT JOIN st$r s USING (cell, dim))"""
  }

  /** One sequential BPE training round of the q129 oracle. Word
    * segmentations ride as SPACE-WRAPPED symbol strings (" a  b  c ":
    * every symbol wrapped in single spaces, so adjacent symbols meet
    * at a double space): the round's accepted merge (a,b) is applied
    * with one `replace(s, ' a  b ', ' ab ')`, whose non-overlapping
    * left-to-right scan consumes " a  a  a  a " into " aa  aa " —
    * exactly [[graft.llm.Bpe.mergePair]]'s greedy fold (a just-fused
    * symbol never re-fuses in the same pass). Candidate selection
    * mirrors the trainer: weighted adjacent-pair count, freq >= 2,
    * (freq desc, a asc, b asc) top-1; an empty round leaves every
    * segmentation unchanged (the trainer's early stop). The per-round
    * CTEs are MATERIALIZED: each is referenced several times by the
    * next round, and DuckDB's default CTE inlining would re-expand
    * the whole chain exponentially (~6^rounds document scans). */
  private def bpeRoundSql(r: Int): String = {
    val prev = if (r == 1) "m0" else s"m${r - 1}"
    s"""p$r AS (SELECT l[i] AS a, l[i + 1] AS b, freq FROM (
           SELECT freq, l, unnest(generate_series(1, len(l) - 1)) AS i
           FROM (SELECT freq, list_filter(string_split(s, ' '),
                          x -> x <> '') AS l FROM $prev)
           WHERE len(l) >= 2)),
      c$r AS MATERIALIZED (SELECT a, b FROM (
           SELECT a, b, sum(freq) AS pf FROM p$r GROUP BY 1, 2
           HAVING sum(freq) >= 2
           ORDER BY pf DESC, a ASC, b ASC LIMIT 1)),
      m$r AS MATERIALIZED (SELECT word, freq,
           CASE WHEN (SELECT count(*) FROM c$r) = 0 THEN s
                ELSE replace(s,
                  ' ' || (SELECT a FROM c$r) || '  ' ||
                    (SELECT b FROM c$r) || ' ',
                  ' ' || (SELECT a FROM c$r) ||
                    (SELECT b FROM c$r) || ' ')
           END AS s FROM $prev)"""
  }

  /** Shared q133/q138 oracle — chained per-step funnel over the event
    * log (view -> click -> purchase, strictly-after semantics): one
    * SQL truth for both the batch operator and the streaming drain. */
  private val funnelSummarySql: String = """
      WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts) AS t
             FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts) AS t
             FROM events e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
      u AS (SELECT 1 AS step_ix, 'view' AS step, count(*) AS n FROM s1
            UNION ALL
            SELECT 2, 'click', count(*) FROM s2
            UNION ALL
            SELECT 3, 'purchase', count(*) FROM s3),
      f AS (SELECT n AS n1 FROM u WHERE step_ix = 1)
      SELECT step_ix, step, CAST(n AS BIGINT) AS n_users,
             CAST(n AS DOUBLE) / CAST(f.n1 AS DOUBLE) AS conv
      FROM u CROSS JOIN f ORDER BY step_ix"""

  /** One greedy MMR round of the q130 oracle: score every unselected
    * candidate `0.5·rel − 0.5·max cos(v, selected)`, keep the top-1
    * (mmr desc, id asc) and append it to the running selection a$r.
    * MATERIALIZED for the same reason as [[bpeRoundSql]] — each
    * round's frames are referenced repeatedly downstream. */
  private def mmrRoundSql(r: Int): String = {
    val p = r - 1
    s"""sr$r AS (SELECT c.id, c.rel, c.v,
             max(list_cosine_similarity(c.v, a$p.v)) AS maxsim
           FROM c0 c, a$p
           WHERE c.id NOT IN (SELECT id FROM a$p)
           GROUP BY c.id, c.rel, c.v),
      a$r AS MATERIALIZED (SELECT * FROM a$p UNION ALL
           SELECT * FROM (SELECT $r AS rank, id, rel,
                  0.5 * rel - 0.5 * maxsim AS mmr, v
           FROM sr$r ORDER BY mmr DESC, id ASC LIMIT 1))"""
  }

  /** q107: hashed BoW -> 2-round Lloyd fit from the lowest-id init ->
    * SemDeDup within the FITTED cells (KMeans.fit -> duplicatesFitted
    * replayed end-to-end). */
  private def q107OracleSql: String = s"""
      WITH $bowDenseSql,
      cents0 AS (SELECT doc_id AS cent_id, v AS cv FROM dense
                 ORDER BY doc_id LIMIT 16),
      means0 AS (SELECT CAST(cent_id AS INT) AS cell,
                        CAST(unnest(generate_series(1, len(cv))) AS INT)
                          AS dim,
                        unnest(cv) AS c
                 FROM cents0),
      ${lloydRoundSql(1)},
      ${lloydRoundSql(2)},
      rcF AS (SELECT cell, list(c ORDER BY dim) AS cv
              FROM means2 GROUP BY cell),
      scF AS (SELECT d.doc_id, d.v, r.cell AS cent_id,
                     list_cosine_similarity(d.v, r.cv) AS cos
              FROM dense d CROSS JOIN rcF r),
      asgF AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT doc_id, v, cent_id AS cell,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY cos DESC, cent_id ASC) AS rn
          FROM scF) WHERE rn = 1),
      pairs AS (SELECT a.cell, b.doc_id AS dup_id, a.doc_id AS kept0,
                       round(list_cosine_similarity(a.v, b.v), 6) AS cos6
                FROM asgF a JOIN asgF b
                  ON a.cell = b.cell AND a.doc_id < b.doc_id
                WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95),
      dups AS (SELECT cell, dup_id, min(kept0) AS kept_id,
                      max(cos6) AS max_cosine
               FROM pairs GROUP BY 1, 2)
      SELECT cell, count(*) AS n_dups,
             CAST(sum(CASE WHEN dup_id = kept_id + 1000000
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS n_variant_pairs,
             min(max_cosine) AS min_cosine,
             max(max_cosine) AS top_cosine
      FROM dups GROUP BY 1 ORDER BY 1"""

  /** q109: the same 2-round fit as q107, then the fitted IVF probe —
    * per query (doc_id < 4), rank the rows of its nprobe=4 nearest
    * fitted cells by exact cosine, top-5. Replays fit -> corpus
    * assignment (the on-disk index layout) -> probe-cell selection ->
    * within-cell ranking. */
  private def q109OracleSql: String = s"""
      WITH $bowDenseSql,
      cents0 AS (SELECT doc_id AS cent_id, v AS cv FROM dense
                 ORDER BY doc_id LIMIT 16),
      means0 AS (SELECT CAST(cent_id AS INT) AS cell,
                        CAST(unnest(generate_series(1, len(cv))) AS INT)
                          AS dim,
                        unnest(cv) AS c
                 FROM cents0),
      ${lloydRoundSql(1)},
      ${lloydRoundSql(2)},
      rcF AS (SELECT cell, list(c ORDER BY dim) AS cv
              FROM means2 GROUP BY cell),
      scF AS (SELECT d.doc_id, d.v, r.cell AS cent_id,
                     list_cosine_similarity(d.v, r.cv) AS cos
              FROM dense d CROSS JOIN rcF r),
      asgF AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT doc_id, v, cent_id AS cell,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY cos DESC, cent_id ASC) AS rn
          FROM scF) WHERE rn = 1),
      queries AS (SELECT doc_id AS query_id, v AS qv FROM dense
                  WHERE doc_id < 4),
      qcells AS (SELECT query_id, qv, cell FROM (
          SELECT q.query_id, q.qv, r.cell,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(q.qv, r.cv) DESC,
                            r.cell ASC) AS rn
          FROM queries q CROSS JOIN rcF r) WHERE rn <= 4),
      cand AS (SELECT qc.query_id, a.doc_id AS vec_id,
                      list_cosine_similarity(a.v, qc.qv) AS cos
               FROM qcells qc JOIN asgF a ON a.cell = qc.cell
               WHERE a.doc_id <> qc.query_id)
      SELECT query_id, vec_id, CAST(rank AS INT) AS rank,
             round(cos, 6) AS cosine
      FROM (SELECT query_id, vec_id, cos,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, vec_id ASC) AS rank
            FROM cand)
      WHERE rank <= 5
      ORDER BY query_id, rank"""

  /** q111: fit the quantizer on the HISTORICAL 70% only, assign both
    * sets under it, then: any same-cell historical match dedups a new
    * vector; within the new batch the lower id survives. Mirrors
    * [[graft.llm.SemDedup.incrementalDuplicates]] over the persisted
    * index exactly (the pruned IN-list read is a physical detail —
    * the joined rows are identical). */
  private def q111OracleSql: String = s"""
      WITH $bowDenseSql,
      dense_h AS (SELECT * FROM dense
                  WHERE doc_id < 1000000 AND doc_id % 10 < 7),
      dense_n AS (SELECT * FROM dense
                  WHERE NOT (doc_id < 1000000 AND doc_id % 10 < 7)),
      cents0 AS (SELECT doc_id AS cent_id, v AS cv FROM dense_h
                 ORDER BY doc_id LIMIT 16),
      means0 AS (SELECT CAST(cent_id AS INT) AS cell,
                        CAST(unnest(generate_series(1, len(cv))) AS INT)
                          AS dim,
                        unnest(cv) AS c
                 FROM cents0),
      ${lloydRoundSql(1, "dense_h")},
      ${lloydRoundSql(2, "dense_h")},
      rcF AS (SELECT cell, list(c ORDER BY dim) AS cv
              FROM means2 GROUP BY cell),
      asgH AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT d.doc_id, d.v, r.cell,
                 row_number() OVER (PARTITION BY d.doc_id
                   ORDER BY list_cosine_similarity(d.v, r.cv) DESC,
                            r.cell ASC) AS rn
          FROM dense_h d CROSS JOIN rcF r) WHERE rn = 1),
      asgN AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT d.doc_id, d.v, r.cell,
                 row_number() OVER (PARTITION BY d.doc_id
                   ORDER BY list_cosine_similarity(d.v, r.cv) DESC,
                            r.cell ASC) AS rn
          FROM dense_n d CROSS JOIN rcF r) WHERE rn = 1),
      vs_hist AS (SELECT h.cell, n.doc_id AS dup_id,
                         h.doc_id AS kept0,
                         round(list_cosine_similarity(h.v, n.v), 6) AS cos6
                  FROM asgH h JOIN asgN n ON h.cell = n.cell
                  WHERE round(list_cosine_similarity(h.v, n.v), 6) >= 0.95),
      in_batch AS (SELECT a.cell, b.doc_id AS dup_id,
                          a.doc_id AS kept0,
                          round(list_cosine_similarity(a.v, b.v), 6) AS cos6
                   FROM asgN a JOIN asgN b
                     ON a.cell = b.cell AND a.doc_id < b.doc_id
                   WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95)
      SELECT cell, dup_id, min(kept0) AS kept_id,
             max(cos6) AS max_cosine
      FROM (SELECT * FROM vs_hist UNION ALL SELECT * FROM in_batch)
      GROUP BY 1, 2 ORDER BY dup_id"""

  /** q113: q111's fit/assignment, then TWO sequential dedup stages —
    * batch 1 (even new ids) against history, batch 2 (odd) against
    * history PLUS batch 1's survivors — replaying the streaming loop's
    * grow-the-index semantics exactly. */
  private def q113OracleSql: String = s"""
      WITH $bowDenseSql,
      dense_h AS (SELECT * FROM dense
                  WHERE doc_id < 1000000 AND doc_id % 10 < 7),
      dense_n AS (SELECT * FROM dense
                  WHERE NOT (doc_id < 1000000 AND doc_id % 10 < 7)),
      cents0 AS (SELECT doc_id AS cent_id, v AS cv FROM dense_h
                 ORDER BY doc_id LIMIT 16),
      means0 AS (SELECT CAST(cent_id AS INT) AS cell,
                        CAST(unnest(generate_series(1, len(cv))) AS INT)
                          AS dim,
                        unnest(cv) AS c
                 FROM cents0),
      ${lloydRoundSql(1, "dense_h")},
      ${lloydRoundSql(2, "dense_h")},
      rcF AS (SELECT cell, list(c ORDER BY dim) AS cv
              FROM means2 GROUP BY cell),
      asgH AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT d.doc_id, d.v, r.cell,
                 row_number() OVER (PARTITION BY d.doc_id
                   ORDER BY list_cosine_similarity(d.v, r.cv) DESC,
                            r.cell ASC) AS rn
          FROM dense_h d CROSS JOIN rcF r) WHERE rn = 1),
      asgN AS (SELECT doc_id, v, CAST(cell AS INT) AS cell FROM (
          SELECT d.doc_id, d.v, r.cell,
                 row_number() OVER (PARTITION BY d.doc_id
                   ORDER BY list_cosine_similarity(d.v, r.cv) DESC,
                            r.cell ASC) AS rn
          FROM dense_n d CROSS JOIN rcF r) WHERE rn = 1),
      n1 AS (SELECT * FROM asgN WHERE doc_id % 2 = 0),
      n2 AS (SELECT * FROM asgN WHERE doc_id % 2 = 1),
      d1 AS (SELECT cell, dup_id, min(kept0) AS kept_id,
                    max(cos6) AS max_cosine
             FROM (
               SELECT h.cell, b.doc_id AS dup_id, h.doc_id AS kept0,
                      round(list_cosine_similarity(h.v, b.v), 6) AS cos6
               FROM asgH h JOIN n1 b ON h.cell = b.cell
               WHERE round(list_cosine_similarity(h.v, b.v), 6) >= 0.95
               UNION ALL
               SELECT a.cell, b.doc_id, a.doc_id,
                      round(list_cosine_similarity(a.v, b.v), 6)
               FROM n1 a JOIN n1 b
                 ON a.cell = b.cell AND a.doc_id < b.doc_id
               WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95)
             GROUP BY 1, 2),
      hist2 AS (SELECT * FROM asgH
                UNION ALL
                SELECT * FROM n1
                WHERE doc_id NOT IN (SELECT dup_id FROM d1)),
      d2 AS (SELECT cell, dup_id, min(kept0) AS kept_id,
                    max(cos6) AS max_cosine
             FROM (
               SELECT h.cell, b.doc_id AS dup_id, h.doc_id AS kept0,
                      round(list_cosine_similarity(h.v, b.v), 6) AS cos6
               FROM hist2 h JOIN n2 b ON h.cell = b.cell
               WHERE round(list_cosine_similarity(h.v, b.v), 6) >= 0.95
               UNION ALL
               SELECT a.cell, b.doc_id, a.doc_id,
                      round(list_cosine_similarity(a.v, b.v), 6)
               FROM n2 a JOIN n2 b
                 ON a.cell = b.cell AND a.doc_id < b.doc_id
               WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95)
             GROUP BY 1, 2)
      SELECT cell, dup_id, kept_id, max_cosine
      FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
      ORDER BY dup_id"""
}
