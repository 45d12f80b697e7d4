package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

/** Query + oracle definitions — LLM training-data pipeline, third
  * file (round 12 continuation): importance resampling, attention-
  * mask metadata for packed batches, curriculum scheduling, loss
  * masking, token-exposure accounting. Concatenated into
  * SparkEntry.queries / SparkEntry.oracleSql (the driver contract);
  * see SparkEntry's scaladoc for the output and floating-point
  * conventions every entry follows. */
private[graft] object QueriesLlmC {
  import QueryShared._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- IMPORTANCE RESAMPLING (DSIR-shaped, exact integers): score
    //     every doc by how target-like its token mix is — weight(w) =
    //     c_t(w)·S_r − c_r(w)·S_t, the cross-multiplied sign of
    //     p_target(w) − p_raw(w) (target = the 'en' slice, raw = the
    //     whole corpus), doc score = Σ weight over its tokens with
    //     multiplicity, selected = score > 0. The published recipe
    //     ranks by a log-ratio; the cross-multiplied linearization
    //     keeps the entire pipeline in BIGINTs (no libm anywhere), so
    //     the selected SET is bit-pinned across engines. Scale: both
    //     censuses are vocab-bounded mergeable count tables (additive
    //     under the q362 fold); the weight join shuffles on tok —
    //     stopword keys are hot, so a 100 TB run salts them (q61) or
    //     broadcasts the df-top slice of the weight table. The
    //     per-token sums in weight(w) bound at S_t·S_r ≈ (corpus
    //     tokens)²: past ~3·10⁹ tokens, rescale the censuses to
    //     per-billion rates first (same sign, same selection). ---
    "q363_importance_resample" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          col("text"))
      val tk = docs.select(col("doc_id"), col("source"), col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val rawC = tk.groupBy(col("tok"))
        .agg(count(lit(1)).as("c_r"))
      val tgtC = tk.filter(col("lang") === "en").groupBy(col("tok"))
        .agg(count(lit(1)).as("c_t"))
      val tots = tk.agg(count(lit(1)).as("__sr"),
        count(when(col("lang") === "en", 1)).as("__st"))
      val w = rawC.join(tgtC, Seq("tok"), "left")
        .crossJoin(broadcast(tots))
        .select(col("tok"),
          (coalesce(col("c_t"), lit(0L)) * col("__sr") -
            col("c_r") * col("__st")).as("__w"))
      val scored = tk.join(w, Seq("tok"))
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("__w")).as("__num"),
          count(lit(1)).as("n_tok"))
      scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(when(col("__num") > 0, 1L)), lit(0L))
            .as("n_selected"),
          coalesce(sum(when(col("__num") > 0, col("n_tok"))),
            lit(0L)).as("tok_selected"),
          coalesce(sum(when(col("__num") > 0, col("doc_id"))),
            lit(0L)).as("sel_checksum"),
          // one division of two exact BIGINTs — bit-identical in
          // both engines; round(6) is belt-and-braces
          round(coalesce(sum(when(col("__num") > 0, col("__num"))),
              lit(0L)).cast("double") /
            greatest(coalesce(sum(when(col("__num") > 0,
              col("n_tok"))), lit(0L)), lit(1L)).cast("double"), 6)
            .as("sel_score_per_tok"))
        .orderBy(col("source"))
    },


    // --- ATTENTION-MASK METADATA for packed context windows: the
    //     q353 packer cuts the concatenated corpus every 512 tokens;
    //     a trainer that packs multiple docs per window needs, PER
    //     CHUNK, the segment table a block-diagonal attention mask
    //     (and an EOD-aware loss mask) is built from — (seg_idx,
    //     doc_id, in-chunk start offset, length, whether the doc
    //     starts/ends here; continuation segments of a doc cut at
    //     the boundary are flagged on both sides). Rows ∝ tokens/L +
    //     docs (each doc touches len/L+1 chunks); the only window is
    //     per-chunk (≤ docs-per-chunk rows per key). Spans come from
    //     the rank-bucketed Packing prefix sums — no global window
    //     anywhere. ---
    "q364_pack_mask_meta" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val L = 512L
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val spans = graft.operators.Packing.spans(
        docs, col("doc_id"), col("n_tok"))
      val segs = spans
        .withColumn("chunk", explode(sequence(
          expr(s"s div $L"), expr(s"e div $L"))))
        .withColumn("seg_start",
          greatest(col("s"), col("chunk") * L) - col("chunk") * L)
        .withColumn("seg_len",
          least(col("e"), col("chunk") * L + (L - 1)) -
            greatest(col("s"), col("chunk") * L) + 1)
        .withColumn("starts_here", col("s") >= col("chunk") * L)
        .withColumn("ends_here",
          col("e") <= col("chunk") * L + (L - 1))
      // segments tile each chunk disjointly, so seg_start is unique
      // within a chunk — the rank is deterministic
      val cw = Window.partitionBy(col("chunk"))
        .orderBy(col("seg_start"))
      segs.withColumn("seg_idx", row_number().over(cw).cast("long"))
        .select(col("chunk"), col("seg_idx"), col("doc_id"),
          col("seg_start"), col("seg_len"), col("starts_here"),
          col("ends_here"))
        .orderBy(col("chunk"), col("seg_idx"))
    },


    // --- CURRICULUM SCHEDULE (competence-gated length curriculum):
    //     difficulty = token count; stage t ∈ 1..4 may only draw from
    //     the easiest ceil(N·t/4) docs (the competence pool), and
    //     draws a fixed budget of N div 8 docs by deterministic
    //     md5("cur:t:id") rank — stage 1 trains short docs, stage 4
    //     samples the full corpus; early-pool docs stay eligible
    //     throughout (with-replacement across stages, the standard
    //     competence-curriculum construction). Both ranks are
    //     bucket-decomposed (difficulty rank over the n_tok value
    //     census, selection rank over md5-prefix buckets per stage)
    //     — no global window at any size. Output pins each stage's
    //     pool, realized docs/tokens, and the order-independent id
    //     checksum. Exact integers end to end. ---
    "q365_curriculum_schedule" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val tot = docs.agg(count(lit(1)).as("__n"))
      val ranked = bucketedRank(docs, Seq.empty, "n_tok",
        Seq("n_tok", "doc_id"), "__rk")
      val pool = ranked
        .withColumn("stage", explode(sequence(lit(1L), lit(4L))))
        .crossJoin(broadcast(tot))
        // __rk <= ceil(N·t/4)  ⇔  4·__rk <= N·t + 3 (exact integers)
        .filter(col("__rk") * 4 <= col("__n") * col("stage") + 3)
        .withColumn("h", md5(concat(lit("cur:"),
          col("stage").cast("string"), lit(":"),
          col("doc_id").cast("string")).cast("binary")))
        .withColumn("__bk", substring(col("h"), 1, 2))
      val sel = bucketedRank(pool, Seq("stage"), "__bk",
        Seq("h", "doc_id"), "__srk")
        .withColumn("__take", col("__srk") <= expr("__n div 8"))
      sel.groupBy(col("stage"))
        .agg(count(lit(1)).as("pool_docs"),
          coalesce(sum(when(col("__take"), 1L)), lit(0L))
            .as("n_selected"),
          coalesce(sum(when(col("__take"), col("n_tok"))), lit(0L))
            .as("tok_selected"),
          coalesce(sum(when(col("__take"), col("doc_id"))), lit(0L))
            .as("sel_checksum"))
        .orderBy(col("stage"))
    },


    // --- LOSS-MASK CENSUS (instruction-tuning prep): each user's
    //     event stream renders as an alternating chat (odd turns =
    //     user, even = assistant, in (ts, event_id) order); SFT
    //     trains only on assistant tokens, so the batch planner needs
    //     per-conversation totals of trainable vs masked tokens and
    //     the trainable share (integer basis points — exact). Turn
    //     text carries the real payload (type=cents + props), token
    //     counts use the engine's pinned tokenizer. The only window
    //     is per-user (keyed). ---
    "q366_loss_mask_census" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = tbl(spark, dir, "events")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_id"), col("event_type"), col("props"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val uw = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val turns = ev
        .withColumn("i", row_number().over(uw).cast("long"))
        .withColumn("role", when(pmod(col("i"), lit(2L)) === 1L,
          lit("user")).otherwise(lit("assistant")))
        .withColumn("turn", concat(lit("<|"), col("role"),
          lit("|> "), col("event_type"), lit("="),
          col("cents").cast("string"), lit(" "), col("props"),
          lit(" <|end|>")))
        .withColumn("n_tok",
          TextAnalysis.tokenCount(col("turn")).cast("long"))
      turns.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_turns"),
          coalesce(sum(when(col("role") === "assistant", 1L)),
            lit(0L)).as("n_assistant"),
          sum(col("n_tok")).as("tok_total"),
          coalesce(sum(when(col("role") === "assistant",
            col("n_tok"))), lit(0L)).as("tok_trainable"))
        .withColumn("trainable_bp",
          expr("tok_trainable * 10000 div tok_total"))
        .orderBy(col("user_id"))
    },


    // --- IMPORTANCE-WEIGHTS-OVER-FOLD (q363's nightly twin — the
    //     fold theorem's fifth artifact family): the importance
    //     weights derive ONLY from two vocab-bounded token censuses
    //     (raw count, target count), and counts are additive over
    //     disjoint doc sets — so the history census persists as a
    //     STAGED manifest, a fresh batch contributes its own census,
    //     ONE groupBy-sum folds them, and the updated weights score
    //     the new batch without ever re-tokenizing history. The
    //     oracle IS the full rebuild over history ∪ batch scoring
    //     the batch slice: the hash match proves fold ≡ rebuild for
    //     the weight layer (the q320/q351/q355/q362 pattern). ---
    "q368_importance_fold" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          col("text"))
      // staged history manifest: per-token (raw, target) counts
      val histCensus = graft.operators.Staged.getOrBuild(spark,
          s"imp_census::$dir::en") {
        docs.select(col("lang"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("c_r"),
            count(when(col("lang") === "en", 1)).as("c_t"))
      }
      // stride 7 is coprime with the corpus's 20-source round-robin
      // id assignment, so the batch spans every source
      val batch = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          col("source"), col("lang"),
          col("text").substr(lit(1),
            greatest(length(col("text")) - 25, lit(1))).as("text"))
      val btk = batch.select(col("doc_id"), col("source"),
        col("lang"), explode(TextAnalysis.tokens(col("text")))
          .as("tok"))
      val bCensus = btk.groupBy(col("tok"))
        .agg(count(lit(1)).as("c_r"),
          count(when(col("lang") === "en", 1)).as("c_t"))
      // the fold: one groupBy-sum over manifest ∪ batch census
      val merged = histCensus.unionByName(bCensus)
        .groupBy(col("tok"))
        .agg(sum(col("c_r")).as("c_r"), sum(col("c_t")).as("c_t"))
      val tots = merged.agg(sum(col("c_r")).as("__sr"),
        sum(col("c_t")).as("__st"))
      val w = merged.crossJoin(broadcast(tots))
        .select(col("tok"), (col("c_t") * col("__sr") -
          col("c_r") * col("__st")).as("__w"))
      val scored = btk.join(w, Seq("tok"))
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("__w")).as("__num"),
          count(lit(1)).as("n_tok"))
      scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(when(col("__num") > 0, 1L)), lit(0L))
            .as("n_selected"),
          coalesce(sum(when(col("__num") > 0, col("n_tok"))),
            lit(0L)).as("tok_selected"),
          coalesce(sum(when(col("__num") > 0, col("doc_id"))),
            lit(0L)).as("sel_checksum"),
          round(coalesce(sum(when(col("__num") > 0, col("__num"))),
              lit(0L)).cast("double") /
            greatest(coalesce(sum(when(col("__num") > 0,
              col("n_tok"))), lit(0L)), lit(1L)).cast("double"), 6)
            .as("sel_score_per_tok"))
        .orderBy(col("source"))
    },


    // --- PACKING-GRANULARITY SWEEP (the knob table for choosing a
    //     context length): ONE spans build — the token axis is
    //     L-independent — fanned against a broadcast literal knob
    //     table (L = 128/256/512/1024, the q340/q341 sweep shape);
    //     per L: chunk count, docs that CROSS a boundary (the
    //     attention-mask/truncation cost axis), boundary crossings
    //     per doc, and tail waste. Explode-free: crossings per doc =
    //     e div L − s div L (arithmetic on the span endpoints), so
    //     sweep cost is 4 projections of the same spans frame, not
    //     4 re-packs. Exact integers. ---
    "q373_packing_sweep" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val spans = graft.operators.Packing.spans(
          docs, col("doc_id"), col("n_tok"))
        .localCheckpoint() // one build feeds all four knobs + total
      val knobs = spark.createDataFrame(
          Seq(Tuple1(128L), Tuple1(256L), Tuple1(512L),
            Tuple1(1024L))).toDF("chunk_l")
      val tot = spans.agg((max(col("e")) + 1).as("__t"))
      spans.crossJoin(broadcast(knobs))
        .withColumn("__cross",
          expr("e div chunk_l") - expr("s div chunk_l"))
        .groupBy(col("chunk_l"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(when(col("__cross") > 0, 1L)), lit(0L))
            .as("docs_split"),
          sum(col("__cross")).as("n_crossings"))
        .crossJoin(broadcast(tot))
        .withColumn("n_chunks",
          expr("(__t + chunk_l - 1) div chunk_l"))
        .withColumn("tail_waste",
          col("n_chunks") * col("chunk_l") - col("__t"))
        .withColumn("split_bp",
          expr("docs_split * 10000 div n_docs"))
        .select(col("chunk_l"), col("n_chunks"), col("n_docs"),
          col("docs_split"), col("split_bp"), col("n_crossings"),
          col("tail_waste"))
        .orderBy(col("chunk_l"))
    },


    // --- DEDUP-INDUCED MIXTURE SHIFT: near-dup dedup does not
    //     remove tokens uniformly — duplicate-heavy sources shrink
    //     more, so the UniMax water-fill lands on a DIFFERENT
    //     allocation after dedup than the raw census promised. This
    //     query measures exactly that: per-source token census
    //     before and after cluster-keeper dedup (lowest-id keeper
    //     over the q342/q354 STAGED pair set — the mining is free
    //     within a run), the water-fill run on both censuses
    //     (shared unimaxAlloc), and the per-source token drop in
    //     basis points. The "your mixture spec is stale after
    //     dedup" readout a pipeline re-plans from. All integers. ---
    "q372_dedup_mixture" -> { (spark, dir) =>
      val docs0 = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val variants = docs0.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("source"),
          col("text").substr(lit(1),
            greatest(length(col("text")) - 20, lit(1))).as("text"))
      val corpus = docs0.unionByName(variants)
      val pairs = graft.operators.Staged.getOrBuild(spark,
          s"ngram_pairs::$dir::mod3_trunc20::sh3_t0.5_df16") {
        graft.llm.Dedup.ngramJaccardPairs(
          corpus.select(col("doc_id"), col("text")),
          col("doc_id"), col("text"),
          shingleN = 3, threshold = 0.5, maxDf = 16)
      }.select(col("id_a"), col("id_b"))
      val comps = graft.operators.Staged.getOrBuild(spark,
          s"ngram_cc::$dir::mod3_trunc20::sh3_t0.5_df16") {
        graft.llm.Dedup.connectedComponents(pairs, col("id_a"),
          col("id_b"))
      }
      val toks = corpus.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tok"))
      val assigned = toks
        .join(comps.select(col("id").as("doc_id"), col("comp")),
          Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
      val keepers = assigned.groupBy(col("cluster"))
        .agg(min(col("doc_id")).as("__keep"))
      // one materialization cuts the closure out of every downstream
      // lineage: the two censuses, the guard count, and unimaxAlloc's
      // internal re-references would otherwise each re-run the
      // connected-components rounds (29.5 -> ~2 s warm)
      val marked = assigned.join(keepers, Seq("cluster"))
        .withColumn("keep", col("doc_id") === col("__keep"))
        .select(col("source"), col("n_tok"), col("keep"))
        .localCheckpoint()
      val pre = marked.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("sz_pre"))
      val post = marked.filter(col("keep")).groupBy(col("source"))
        .agg(sum(col("n_tok")).as("sz_post"))
      // q352's census bound, shared remedy
      val nSources = pre.count()
      require(nSources <= 10000,
        s"q372: source census has $nSources sources, above the " +
          "10000 the allocation windows are bounded for")
      val aPre = unimaxAlloc(pre, "sz_pre", "alloc_pre", 6, 10)
      val aPost = unimaxAlloc(post, "sz_post", "alloc_post", 6, 10)
      aPre.join(aPost, Seq("source"), "left")
        .select(col("source"), col("sz_pre"), col("alloc_pre"),
          coalesce(col("sz_post"), lit(0L)).as("sz_post"),
          coalesce(col("alloc_post"), lit(0L)).as("alloc_post"),
          expr("(sz_pre - coalesce(sz_post, 0)) * 10000 div sz_pre")
            .as("drop_bp"))
        .orderBy(col("source"))
    },


    // --- DATA-PARALLEL RANK SHARDING of the deterministic epoch
    //     order (q360's byte-exact shuffle carried to the dataloader
    //     boundary): each epoch's md5-shuffled sequence deals
    //     round-robin onto R=8 ranks — rank = (rk−1) mod 8, step =
    //     (rk−1) div 8 — so every rank's batch stream is a pinned
    //     function of (corpus, epoch, R). Output per (epoch, rank):
    //     docs, token sum (the straggler axis a training job stalls
    //     on), and an ORDER-SENSITIVE Σ step·doc_id checksum — equal
    //     checksums mean bitwise-identical per-rank streams, the
    //     reproducibility contract a resumable 100 TB run certifies
    //     against. Ranks are bucket-decomposed (shared bucketedRank);
    //     exact integers end to end. ---
    "q371_rank_sharding" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("score"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val tot = docs.agg(count(lit(1)).as("__n"))
      val repeated = bucketedRank(docs, Seq.empty, "score",
          Seq("doc_id"), "__rn")
        .crossJoin(broadcast(tot))
        .withColumn("__quart", expr("((__rn - 1) * 4) div __n") + 1)
        .withColumn("epoch",
          explode(sequence(lit(1L), col("__quart"))))
        .select(col("doc_id"), col("n_tok"), col("epoch"))
      val keyed = repeated
        .withColumn("h", md5(concat(lit("ep"),
          col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string")).cast("binary")))
        .withColumn("__bk", substring(col("h"), 1, 2))
      bucketedRank(keyed, Seq("epoch"), "__bk", Seq("h", "doc_id"),
          "rk")
        .withColumn("rnk", pmod(col("rk") - 1, lit(8L)))
        .withColumn("step", expr("(rk - 1) div 8"))
        .groupBy(col("epoch"), col("rnk"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok_sum"),
          sum((col("step") + 1) * col("doc_id"))
            .as("order_checksum"))
        .orderBy(col("epoch"), col("rnk"))
    },


    // --- NEAR-DUP × UPSAMPLING EXPOSURE INTERPLAY: upsampling
    //     multiplies exposures per doc, near-dup families multiply
    //     docs per content — together a family's content can be seen
    //     size × quartile times. Over the staged pair corpus
    //     (docs ∪ truncated variants, the q342 key): cluster sizes
    //     from the STAGED closure, exposure = q359 quartile, and the
    //     census buckets token INSTANCES (mass × exposure) by family
    //     size (singleton / small 2-3 / family 4+) with shares in
    //     basis points — "dedup before you upsample, or the risk
    //     compounds", quantified. Exact integers. ---
    "q376_dup_exposure" -> { (spark, dir) =>
      val docs0 = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs0.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("text").substr(lit(1),
            greatest(length(col("text")) - 20, lit(1))).as("text"))
      val corpus = docs0.unionByName(variants)
      val pairs = graft.operators.Staged.getOrBuild(spark,
          s"ngram_pairs::$dir::mod3_trunc20::sh3_t0.5_df16") {
        graft.llm.Dedup.ngramJaccardPairs(corpus, col("doc_id"),
          col("text"), shingleN = 3, threshold = 0.5, maxDf = 16)
      }.select(col("id_a"), col("id_b"))
      val comps = graft.operators.Staged.getOrBuild(spark,
          s"ngram_cc::$dir::mod3_trunc20::sh3_t0.5_df16") {
        graft.llm.Dedup.connectedComponents(pairs, col("id_a"),
          col("id_b"))
      }
      val scored = corpus.select(col("doc_id"),
        size(array_distinct(TextAnalysis.tokens(col("text"))))
          .cast("long").as("score"),
        size(TextAnalysis.tokens(col("text"))).cast("long")
          .as("n_tok"))
      val tot = scored.agg(count(lit(1)).as("__n"))
      val exposed = bucketedRank(scored, Seq.empty, "score",
          Seq("doc_id"), "__rn")
        .crossJoin(broadcast(tot))
        .withColumn("exposure",
          expr("((__rn - 1) * 4) div __n") + 1)
      val assigned = exposed
        .join(comps.select(col("id").as("doc_id"), col("comp")),
          Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
      val sizes = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("__csz"))
      val bucketed = assigned.join(sizes, Seq("cluster"))
        .withColumn("family",
          when(col("__csz") === 1, "1_singleton")
            .when(col("__csz") <= 3, "2_small")
            .otherwise("3_family"))
      val ti = bucketed.agg(sum(col("n_tok") * col("exposure"))
        .as("__ti"))
      bucketed.groupBy(col("family"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster")).as("n_clusters"),
          sum(col("n_tok") * col("exposure")).as("tok_instances"))
        .crossJoin(broadcast(ti))
        .withColumn("share_bp",
          expr("tok_instances * 10000 div __ti"))
        .select(col("family"), col("n_docs"), col("n_clusters"),
          col("tok_instances"), col("share_bp"))
        .orderBy(col("family"))
    },


    // --- TRUNCATION-POLICY TOKEN BUDGET: the three ways to fit docs
    //     into a context window — PACK (concatenate-and-cut: keeps
    //     every token), TRUNCATE at L (keeps min(n_tok, L)), DROP
    //     over L (keeps whole docs only) — compared on retained
    //     token mass per L knob, computed arithmetically per doc
    //     from one census (no repacking, no explode). The decision
    //     table for a data-budget review: how many tokens each
    //     policy throws away at each context length. Exact
    //     integers. ---
    "q377_truncation_budget" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val knobs = spark.createDataFrame(
          Seq(Tuple1(128L), Tuple1(256L), Tuple1(512L),
            Tuple1(1024L))).toDF("chunk_l")
      docs.crossJoin(broadcast(knobs))
        .groupBy(col("chunk_l"))
        .agg(sum(col("n_tok")).as("total_tok"),
          sum(least(col("n_tok"), col("chunk_l")))
            .as("trunc_kept"),
          coalesce(sum(when(col("n_tok") <= col("chunk_l"),
            col("n_tok"))), lit(0L)).as("drop_kept"),
          coalesce(sum(when(col("n_tok") > col("chunk_l"), 1L)),
            lit(0L)).as("docs_dropped"))
        .withColumn("trunc_bp",
          expr("trunc_kept * 10000 div total_tok"))
        .withColumn("drop_bp",
          expr("drop_kept * 10000 div total_tok"))
        .select(col("chunk_l"), col("total_tok"), col("trunc_kept"),
          col("trunc_bp"), col("drop_kept"), col("drop_bp"),
          col("docs_dropped"))
        .orderBy(col("chunk_l"))
    },


    // --- CANARY EXPOSURE LEDGER (memorization-audit bookkeeping):
    //     12 deterministic canary docs of graded length are injected
    //     above the id space; the ledger reports, per canary, how
    //     the TRAINING STREAM will expose it — its quality quartile
    //     under the q359 upsampling policy (= times seen across
    //     epochs) and its packed-chunk placement (first/last chunk,
    //     chunks touched at L=512). A post-training extraction test
    //     reads this table to know each canary's expected exposure
    //     count before measuring memorization against it. Exact
    //     integers; the oracle rebuilds the same canaries with SQL
    //     string algebra. ---
    "q374_canary_exposure" -> { (spark, dir) =>
      import spark.implicits._
      val canaries = spark.createDataFrame(
        (1 to 12).map { k =>
          val toks = s"canary$k" +:
            (1 to 4 * k).map(j => s"t${k}x$j")
          (5000000L + k, toks.mkString(" "))
        }).toDF("doc_id", "text")
      val corpus = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .unionByName(canaries)
        .select(col("doc_id"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("score"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val tot = corpus.agg(count(lit(1)).as("__n"))
      val quarts = bucketedRank(corpus, Seq.empty, "score",
          Seq("doc_id"), "__rn")
        .crossJoin(broadcast(tot))
        .withColumn("quartile",
          expr("((__rn - 1) * 4) div __n") + 1)
      val spans = graft.operators.Packing.spans(
        corpus, col("doc_id"), col("n_tok"))
      quarts.filter(col("doc_id") >= 5000000L)
        .join(spans.select(col("doc_id"), col("s"), col("e")),
          Seq("doc_id"))
        .select(col("doc_id"), col("n_tok"), col("quartile"),
          expr("s div 512").as("chunk_first"),
          expr("e div 512").as("chunk_last"),
          (expr("e div 512") - expr("s div 512") + 1)
            .as("chunks_touched"))
        .orderBy(col("doc_id"))
    },


    // --- EPOCH MIXTURE DRIFT under quality upsampling: q359 repeats
    //     high-quality quartiles in later epochs, which SHIFTS the
    //     effective source mixture epoch by epoch (quality is not
    //     uniform across sources) — later epochs overweight the
    //     sources whose docs score high, and a mixture spec pinned
    //     at epoch 1 silently drifts by epoch 4. Output per (epoch,
    //     source): docs, token mass, and the source's share of that
    //     epoch's tokens in basis points (exact integer div); the
    //     drift is the share column read down an epoch. ---
    "q375_epoch_mixture_drift" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("score"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val tot = docs.agg(count(lit(1)).as("__n"))
      val exposed = bucketedRank(docs, Seq.empty, "score",
          Seq("doc_id"), "__rn")
        .crossJoin(broadcast(tot))
        .withColumn("epoch",
          explode(sequence(lit(1L),
            expr("((__rn - 1) * 4) div __n") + 1)))
      val perSrc = exposed.groupBy(col("epoch"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok_sum"))
      val perEp = perSrc.groupBy(col("epoch"))
        .agg(sum(col("tok_sum")).as("__et"))
      perSrc.join(broadcast(perEp), Seq("epoch"))
        .withColumn("share_bp",
          expr("tok_sum * 10000 div __et"))
        .select(col("epoch"), col("source"), col("n_docs"),
          col("tok_sum"), col("share_bp"))
        .orderBy(col("epoch"), col("source"))
    },


    // --- INTER-LABELER AGREEMENT (Cohen's kappa, exact): two
    //     deterministic weak labelers over every doc — A = lexical
    //     diversity (distinct tokens ≥ half the tokens), B = length
    //     (≥ 40 tokens) — cross-tabulated per source; kappa =
    //     (N·agree − Σ marginal products) / (N² − Σ marginal
    //     products), a single division of two exact BIGINTs
    //     (bit-identical across engines, round(6) belt-and-braces).
    //     The weak-supervision QA primitive: which sources' quality
    //     signals actually agree beyond chance, before a labeler's
    //     votes are trusted in a filtering ensemble. One corpus scan,
    //     one groupBy — trivially linear at any scale. ---
    "q370_labeler_kappa" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("n_dis"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
        .withColumn("la", (col("n_dis") * 2 >= col("n_tok"))
          .cast("long"))
        .withColumn("lb", (col("n_tok") >= 40).cast("long"))
      docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(when(col("la") === 1 && col("lb") === 1, 1L)),
            lit(0L)).as("__a"),
          coalesce(sum(when(col("la") === 1 && col("lb") === 0, 1L)),
            lit(0L)).as("__b"),
          coalesce(sum(when(col("la") === 0 && col("lb") === 1, 1L)),
            lit(0L)).as("__c"),
          coalesce(sum(when(col("la") === 0 && col("lb") === 0, 1L)),
            lit(0L)).as("__d"))
        .withColumn("n_agree", col("__a") + col("__d"))
        .withColumn("__pe", (col("__a") + col("__b")) *
          (col("__a") + col("__c")) + (col("__c") + col("__d")) *
          (col("__b") + col("__d")))
        .withColumn("kappa", round(
          (col("n_docs") * col("n_agree") - col("__pe"))
            .cast("double") /
          greatest(col("n_docs") * col("n_docs") - col("__pe"),
            lit(1L)).cast("double"), 6))
        .select(col("source"), col("n_docs"), col("n_agree"),
          col("kappa"))
        .orderBy(col("source"))
    },


    // --- TOKEN-EXPOSURE HISTOGRAM: under the q359 quality-quartile
    //     upsampling (quartile q repeats in epochs 1..q), how much
    //     token mass is seen once, twice, three, four times — the
    //     memorization-risk readout an upsampling policy is reviewed
    //     against (mass seen ≥3× is the red zone). Exposure = the
    //     doc's quartile; instances = mass × exposure; shares in
    //     integer basis points of total instances. Quartile rank is
    //     bucket-decomposed over the score census (shared
    //     bucketedRank) — no global window. ---
    "q367_exposure_histogram" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("score"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val tot = docs.agg(count(lit(1)).as("__n"))
      val exposed = bucketedRank(docs, Seq.empty, "score",
          Seq("doc_id"), "__rn")
        .crossJoin(broadcast(tot))
        .withColumn("exposure", expr("((__rn - 1) * 4) div __n") + 1L)
      val ti = exposed.agg(sum(col("n_tok") * col("exposure"))
        .as("__ti"))
      exposed.groupBy(col("exposure"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok_mass"))
        .withColumn("n_instances", col("tok_mass") * col("exposure"))
        .crossJoin(broadcast(ti))
        .withColumn("share_bp",
          expr("n_instances * 10000 div __ti"))
        .select(col("exposure"), col("n_docs"), col("tok_mass"),
          col("n_instances"), col("share_bp"))
        .orderBy(col("exposure"))
    },


    // --- MID-EPOCH CHECKPOINT RESUME (the data-loader restore
    //     contract): the q360/q371 schedule is content-keyed md5
    //     order, so resuming from global step S needs NO RNG state —
    //     recompute ranks, keep step >= S. Per epoch the cut is half
    //     the epoch's complete world-8 steps; the output pins, per
    //     (epoch, rank): consumed/resumed counts, the resumed token
    //     mass, an order-sensitive resumed checksum (byte-exact tail
    //     order, not just the multiset), and each rank's NEXT sample
    //     at restore. n_consumed + n_resumed = epoch size by
    //     construction, hash-gated. Scale: ranks ride bucketedRank
    //     (256-way hash-prefix buckets + triangular offsets — no
    //     single-task epoch window); the cut is a per-epoch scalar
    //     join, not a driver collect. ---
    "q378_resume_schedule" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("score"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val tot = docs.agg(count(lit(1)).as("__n"))
      val repeated = bucketedRank(docs, Seq.empty, "score",
          Seq("doc_id"), "__rn")
        .crossJoin(broadcast(tot))
        .withColumn("__quart", expr("((__rn - 1) * 4) div __n") + 1)
        .withColumn("epoch",
          explode(sequence(lit(1L), col("__quart"))))
        .select(col("doc_id"), col("n_tok"), col("epoch"))
      val keyed = repeated
        .withColumn("h", md5(concat(lit("ep"),
          col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string")).cast("binary")))
        .withColumn("__bk", substring(col("h"), 1, 2))
      val ranked = bucketedRank(keyed, Seq("epoch"), "__bk",
          Seq("h", "doc_id"), "rk")
        .withColumn("rnk", pmod(col("rk") - 1, lit(8L)))
        .withColumn("step", expr("(rk - 1) div 8"))
      // cut from the pre-rank frame: epoch sizes don't need the
      // rank build, so it isn't computed twice
      val cuts = repeated.groupBy(col("epoch"))
        .agg(count(lit(1)).as("__ne"))
        .select(col("epoch"),
          expr("(__ne div 8) div 2").as("__cut"))
      ranked.join(broadcast(cuts), Seq("epoch"))
        .groupBy(col("epoch"), col("rnk"))
        .agg(
          coalesce(sum(when(col("step") < col("__cut"), 1L)),
            lit(0L)).as("n_consumed"),
          coalesce(sum(when(col("step") >= col("__cut"), 1L)),
            lit(0L)).as("n_resumed"),
          coalesce(sum(when(col("step") >= col("__cut"),
            col("n_tok"))), lit(0L)).as("tok_resumed"),
          coalesce(sum(when(col("step") >= col("__cut"),
            (col("step") + 1) * col("doc_id"))), lit(0L))
            .as("resume_checksum"),
          coalesce(max(when(col("step") === col("__cut"),
            col("doc_id"))), lit(-1L)).as("next_doc"))
        .orderBy(col("epoch"), col("rnk"))
    },


    // --- ELASTIC WORLD-SIZE RE-SHARD (resize mid-training without
    //     dup or gap): the canonical per-epoch sample order rk is
    //     world-size-independent, so growing the fleet 8 -> 12 at a
    //     step boundary is pure arithmetic — phase 1 consumes the
    //     first third of the epoch's complete world-8 steps, phase 2
    //     re-shards the remaining stream over 12 ranks from rk' =
    //     rk - consumed. Per (epoch, phase, rank): doc count, token
    //     mass, order-sensitive checksum. Every sample lands in
    //     exactly one phase by construction; the hash gate pins both
    //     partitions byte-exactly. Same bucketed machinery as q378 —
    //     no new shuffles beyond the rank build. ---
    "q379_elastic_reshard" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .cast("long").as("score"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val tot = docs.agg(count(lit(1)).as("__n"))
      val repeated = bucketedRank(docs, Seq.empty, "score",
          Seq("doc_id"), "__rn")
        .crossJoin(broadcast(tot))
        .withColumn("__quart", expr("((__rn - 1) * 4) div __n") + 1)
        .withColumn("epoch",
          explode(sequence(lit(1L), col("__quart"))))
        .select(col("doc_id"), col("n_tok"), col("epoch"))
      val keyed = repeated
        .withColumn("h", md5(concat(lit("ep"),
          col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string")).cast("binary")))
        .withColumn("__bk", substring(col("h"), 1, 2))
      val ranked = bucketedRank(keyed, Seq("epoch"), "__bk",
          Seq("h", "doc_id"), "rk")
      val cuts = repeated.groupBy(col("epoch"))
        .agg(count(lit(1)).as("__ne"))
        .select(col("epoch"),
          expr("((__ne div 8) div 3) * 8").as("__c"))
      ranked.join(broadcast(cuts), Seq("epoch"))
        .withColumn("phase",
          when(col("rk") <= col("__c"), 1L).otherwise(2L))
        .withColumn("rnk", when(col("phase") === 1,
            pmod(col("rk") - 1, lit(8L)))
          .otherwise(pmod(col("rk") - col("__c") - 1, lit(12L))))
        .withColumn("step", when(col("phase") === 1,
            expr("(rk - 1) div 8"))
          .otherwise(expr("(rk - __c - 1) div 12")))
        .groupBy(col("epoch"), col("phase"), col("rnk"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok_sum"),
          sum((col("step") + 1) * col("doc_id"))
            .as("order_checksum"))
        .orderBy(col("epoch"), col("phase"), col("rnk"))
    },


    // --- CORPUS SHARD-DIGEST MANIFEST FOLD (reproducibility audit,
    //     the fold theorem's sixth artifact family): each of 256
    //     hash shards carries a composite content digest — doc count,
    //     modular sum of a 28-bit md5 content hash (mod 1e9+7), and
    //     the min/max hash — all four combinable by one groupBy:
    //     counts and mod-sums add, min/max merge. The staged base
    //     manifest is NEVER re-read from text: appending a batch
    //     (stride-11 re-keyed truncated variants — content genuinely
    //     differs) folds its shard digests into the manifest with one
    //     union + groupBy, and the oracle proves fold ≡ full rebuild
    //     over docs ∪ batch by hash. At 100 TB this is the nightly
    //     corpus-integrity check: O(batch + 256 rows), history's text
    //     untouched. ---
    "q380_digest_fold" -> { (spark, dir) =>
      val dg = graft.operators.Digest
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val manifest = graft.operators.Staged.getOrBuild(spark,
        s"digest_manifest::$dir::p256")(
        dg.shardDigests(docs, col("doc_id"), col("text")))
      val batch = docs.filter(pmod(col("doc_id"), lit(11)) === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          col("text").substr(lit(1),
            greatest(length(col("text")) - 30, lit(1))).as("text"))
      dg.fold(Seq(manifest,
          dg.shardDigests(batch, col("doc_id"), col("text"))))
        .orderBy(col("shard"))
    },


    // --- SNAPSHOT DRIFT LOCALIZATION (the operational use of the
    //     Digest manifest): two corpus versions — v2 edits every
    //     97th doc — compare by their 256-row shard manifests alone,
    //     and the output NAMES exactly the drifted shards (digest_v1
    //     vs digest_v2). At 100 TB this is how "did anything change,
    //     and where?" costs a manifest join instead of a full-corpus
    //     diff: each named shard bounds the re-scan to 1/256 of the
    //     data. Deterministic end to end (md5 content hashes). ---
    "q382_digest_drift" -> { (spark, dir) =>
      val dg = graft.operators.Digest
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val v2 = docs.withColumn("text",
        when(pmod(col("doc_id"), lit(97)) === 0,
          concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      val d1 = dg.shardDigests(docs, col("doc_id"), col("text"))
        .select(col("shard"), col("n_docs"),
          col("digest").as("digest_v1"))
      val d2 = dg.shardDigests(v2, col("doc_id"), col("text"))
        .select(col("shard"), col("digest").as("digest_v2"))
      d1.join(d2, Seq("shard"))
        .filter(col("digest_v1") =!= col("digest_v2"))
        .select(col("shard"), col("n_docs"), col("digest_v1"),
          col("digest_v2"))
        .orderBy(col("shard"))
    },


    // --- STRATIFIED EVAL SAMPLE (the held-out set the loss curves
    //     are reported on): strata = source × length bucket
    //     (n_tok div 16, capped at 4), eval budget = 2% of docs,
    //     allocated proportionally by exact largest-remainder
    //     arithmetic — floor(E·n_i / N) everywhere plus one extra
    //     for the E − Σfloor largest remainders (ties by stratum
    //     key). Selection is the md5-ranked prefix per stratum via
    //     bucketedRank — deterministic, no RNG, no per-stratum
    //     single-task window. The strata census is k-bounded with
    //     the q352 loud guard. Exact integers end to end. ---
    "q383_stratified_eval" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
        .withColumn("len_b",
          least(expr("n_tok div 16"), lit(4L)))
      val census = docs.groupBy(col("source"), col("len_b"))
        .agg(count(lit(1)).as("n_docs"))
      val k = census.count()
      require(k <= 10000,
        s"q383: strata census has $k strata, above the 10000 the " +
          "allocation windows are bounded for — coarsen the strata")
      val tot = census.agg(sum(col("n_docs")).as("__nn"))
      val f = census.crossJoin(broadcast(tot))
        .withColumn("__e", expr("__nn div 50"))
        .limit(10000) // k-guarded above; keeps the window bounded
        .withColumn("__fl", expr("(__e * n_docs) div __nn"))
        .withColumn("__rem", expr("(__e * n_docs) % __nn"))
        .withColumn("__rr", row_number().over(Window.orderBy(
          col("__rem").desc, col("source"), col("len_b"))))
      val sfl = f.agg(sum(col("__fl")).as("__sfl"))
      val alloc = f.crossJoin(broadcast(sfl))
        .withColumn("alloc", col("__fl") +
          when(col("__rr") <= col("__e") - col("__sfl"), 1L)
            .otherwise(0L))
        .select(col("source"), col("len_b"), col("n_docs"),
          col("alloc"))
        .localCheckpoint() // tiny; feeds selection AND the output
      val based = docs
        .withColumn("h", md5(concat(lit("strat:"),
          col("doc_id").cast("string")).cast("binary")))
        .withColumn("__bk", substring(col("h"), 1, 2))
      val selected = bucketedRank(based, Seq("source", "len_b"),
          "__bk", Seq("h", "doc_id"), "__rk")
        .join(broadcast(alloc.select(col("source"), col("len_b"),
          col("alloc"))), Seq("source", "len_b"))
        .filter(col("__rk") <= col("alloc"))
        .groupBy(col("source"), col("len_b"))
        .agg(count(lit(1)).as("__nsel"),
          sum(col("doc_id")).as("__csum"))
      alloc.join(selected, Seq("source", "len_b"), "left")
        .select(col("source"), col("len_b"), col("n_docs"),
          col("alloc"),
          coalesce(col("__nsel"), lit(0L)).as("n_selected"),
          coalesce(col("__csum"), lit(0L)).as("sel_checksum"))
        .orderBy(col("source"), col("len_b"))
    },


    // --- SNAKE-BALANCE SHARD ASSIGNMENT (placement planning): given
    //     per-shard token masses (the manifest axis q380 digests),
    //     assign 256 shards to 8 workers two ways — naive modulo vs
    //     SNAKE (boustrophedon over the mass-sorted order: block b
    //     of 8 alternates direction, so every block hands each
    //     worker one shard and heavy/light shards interleave). Per
    //     (policy, worker): shard count, mass, share in basis points
    //     — the placement-review table. The rank rides a
    //     limit-guarded window over the 256-row shard census (shard
    //     key is pmod-bounded); everything else is one groupBy.
    //     Exact integers. ---
    "q385_snake_balance" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val shards = docs
        .withColumn("shard", pmod(col("doc_id"), lit(256L)))
        .groupBy(col("shard"))
        .agg(sum(col("n_tok")).as("mass"))
      val tot = shards.agg(sum(col("mass")).as("__tot"))
      val ranked = shards
        .limit(10000) // shard key is pmod-256-bounded by construction
        .withColumn("__r", row_number().over(
          Window.orderBy(col("mass").desc, col("shard"))))
        .withColumn("snake_w",
          when(pmod(expr("(__r - 1) div 8"), lit(2)) === 0,
            expr("(__r - 1) % 8").cast("long"))
          .otherwise(lit(7L) - expr("(__r - 1) % 8")))
        .withColumn("mod_w", pmod(col("shard"), lit(8L)))
      def census(name: String, w: Column) = ranked
        .groupBy(w.as("worker"))
        .agg(count(lit(1)).as("n_shards"),
          sum(col("mass")).as("mass"))
        .withColumn("policy", lit(name))
      census("snake", col("snake_w"))
        .unionByName(census("modulo", col("mod_w")))
        .crossJoin(broadcast(tot))
        .select(col("policy"), col("worker").cast("long")
            .as("worker"), col("n_shards"), col("mass"),
          expr("mass * 10000 div __tot").as("share_bp"))
        .orderBy(col("policy"), col("worker"))
    },


    // --- WITHIN-BATCH SOURCE-DIVERSITY CENSUS (shuffle-quality
    //     audit): 32-doc batches built two ways — GROUPED order
    //     (source, doc_id): the worst case production actually sees,
    //     per-source ingest files concatenated — vs the md5 SHUFFLE.
    //     Histogram of batches by distinct-source count per policy:
    //     grouped batches carry 1-2 sources (correlated gradients),
    //     shuffled carry ~B·(1−(1−1/k)^B)/… ≈ 16-20 of 20. Both
    //     ranks bucket-decomposed (source buckets / md5-prefix
    //     buckets) — no global window. Exact integers. ---
    "q386_batch_diversity" -> { (spark, dir) =>
      val B = 32
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"))
      def hist(name: String, ranked: DataFrame): DataFrame = ranked
        .withColumn("__batch", expr(s"(rk - 1) div $B"))
        .groupBy(col("__batch"))
        .agg(countDistinct(col("source")).as("n_src"))
        .groupBy(col("n_src"))
        .agg(count(lit(1)).as("n_batches"))
        .select(lit(name).as("policy"), col("n_src"),
          col("n_batches"))
      val grouped = bucketedRank(docs, Seq.empty, "source",
        Seq("doc_id"), "rk")
      val keyed = docs
        .withColumn("h", md5(concat(lit("shuf:"),
          col("doc_id").cast("string")).cast("binary")))
        .withColumn("__bk", substring(col("h"), 1, 2))
      val shuffled = bucketedRank(keyed, Seq.empty, "__bk",
        Seq("h", "doc_id"), "rk")
      hist("grouped", grouped).unionByName(hist("shuffled", shuffled))
        .orderBy(col("policy"), col("n_src"))
    },


    // --- CROSS-SEED CO-BATCHING OVERLAP (does re-seeding actually
    //     decorrelate batches?): three md5 seeds each induce a batch
    //     partition; for every seed pair, count doc PAIRS that land
    //     in the same 32-doc batch under BOTH seeds. Within-batch
    //     pairs are ∝ N·(B−1)/2 — linear in corpus size, never
    //     all-pairs — and the overlap join shuffles on the pair key.
    //     Independent seeds should share ≈ n_pairs²/C(N,2) pairs
    //     (basis points reported); a broken seed derivation shows up
    //     as shared_bp ≈ 10000. Exact integers. ---
    "q387_seed_overlap" -> { (spark, dir) =>
      val B = 32
      val docs = tbl(spark, dir, "documents").select(col("doc_id"))
      def pairsOf(seed: Int): DataFrame = {
        val keyed = docs
          .withColumn("h", md5(concat(lit(s"sh$seed:"),
            col("doc_id").cast("string")).cast("binary")))
          .withColumn("__bk", substring(col("h"), 1, 2))
        val b = bucketedRank(keyed, Seq.empty, "__bk",
            Seq("h", "doc_id"), "rk")
          .withColumn("batch", expr(s"(rk - 1) div $B"))
          .select(col("doc_id"), col("batch"))
        b.join(b.select(col("doc_id").as("id_b"), col("batch")),
            Seq("batch"))
          .filter(col("doc_id") < col("id_b"))
          .select(col("doc_id").as("id_a"), col("id_b"))
          .localCheckpoint() // ∝ N·(B−1)/2 rows, reused across combos
      }
      val p = Map(1 -> pairsOf(1), 2 -> pairsOf(2), 3 -> pairsOf(3))
      val np = p(1).agg(count(lit(1)).as("n_pairs"))
      Seq((1, 2), (1, 3), (2, 3)).map { case (x, y) =>
        p(x).join(p(y), Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("n_shared"))
          .crossJoin(broadcast(np))
          .select(lit(x.toLong).as("seed_a"),
            lit(y.toLong).as("seed_b"), col("n_pairs"),
            col("n_shared"),
            expr("n_shared * 10000 div n_pairs").as("shared_bp"))
      }.reduce(_ unionByName _)
        .orderBy(col("seed_a"), col("seed_b"))
    },


    // --- PER-SOURCE DOCUMENT CAP (the "no single domain dominates"
    //     crawl guard): keep the K smallest md5-ranked docs per
    //     source — a deterministic uniform-without-replacement
    //     sample capped at K, reproducible across runs AND engines
    //     (the hash IS the sampling order). Census per source: raw
    //     vs kept docs/tokens, the kept-set id checksum, and the
    //     corpus token share in basis points before/after — the
    //     concentration shift the cap exists to produce. Scale: the
    //     in-source rank is bucketedRank (per-(source, hash-prefix)
    //     windows + triangular offsets — no per-source single-task
    //     window), and the kept set is STAGED (q392 recomputes the
    //     mixture over the same kept set, so the rank runs once per
    //     (corpus, K), not per consumer). ---
    "q388_source_cap" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val kept = graft.operators.Staged.getOrBuild(spark,
          s"cap_kept::$dir::md5cap_k15") {
        graft.operators.CapSample.mine(
            docs.withColumn("h", md5(concat(lit("cap:"),
              col("doc_id").cast("string")).cast("binary"))),
            "source", Seq("h", "doc_id"), k = 15)
          .select(col("doc_id"), col("source"), col("n_tok"))
      }
      val raw = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok_total"))
      val kp = kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tok")).as("tok_kept"),
          sum(col("doc_id")).as("kept_checksum"))
      val per = raw.join(kp, Seq("source"))
      val tot = per.agg(sum(col("tok_total")).as("__tt"),
        sum(col("tok_kept")).as("__tk"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_kept"),
          col("tok_total"), col("tok_kept"), col("kept_checksum"),
          expr("tok_total * 10000 div __tt").as("raw_share_bp"),
          expr("tok_kept * 10000 div __tk").as("cap_share_bp"))
        .orderBy(col("source"))
    },


    // --- PER-SOURCE CAP AS A FOLD (the sixth fold-theorem family —
    //     deterministic capped sampling is mergeable state): the
    //     per-source K-min-hash manifest is a selection monoid —
    //     kminK(A ∪ B) = kminK(kminK(A) ∪ kminK(B)) — so a nightly
    //     ingest folds each new batch's K-row-per-source manifest
    //     into the standing one and NEVER re-ranks history. The
    //     operator is operators/CapSample (mine = bucketedRank over
    //     the unbounded batch; merge = plain window over inputs that
    //     are ≤2K rows per source BY CONSTRUCTION — the fold's whole
    //     point), its monoid law is CapSampleSpec. Here the corpus
    //     splits into three batches (doc_id mod 3) and the folded
    //     census must hash-match the oracle's full-corpus rebuild. ---
    "q389_cap_fold" -> { (spark, dir) =>
      val cs = graft.operators.CapSample
      val K = 15
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
        .withColumn("h", md5(concat(lit("cap:"),
          col("doc_id").cast("string")).cast("binary")))
      val ms = (0 to 2).map(i => cs.mine(
        docs.filter(pmod(col("doc_id"), lit(3)) === i),
        "source", Seq("h", "doc_id"), K))
      cs.merge(cs.merge(ms(0), ms(1), "source", Seq("h", "doc_id"),
          K), ms(2), "source", Seq("h", "doc_id"), K)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tok")).as("tok_kept"),
          sum(col("doc_id")).as("kept_checksum"))
        .orderBy(col("source"))
    },


    // --- CONTRASTIVE TRIPLET MINING with hard-negative margins
    //     (anchor, positive = best same-label, negative = HARDEST
    //     different-label — the highest-cosine impostor): candidate
    //     pairing rides a B-bucket md5 co-partition with B ∝ corpus
    //     size (B = max(16, n/32), derived identically in both
    //     engines), so each anchor scores a BOUNDED ~32-candidate
    //     sample and total pairs stay LINEAR in corpus size — never
    //     all-pairs (the recall-preserving path at 100 TB is the
    //     fitted IVF of q109; this is the margin CENSUS that says
    //     whether mining is even needed). Doubles end to end:
    //     the cosine kernel is the same left-to-right fold DuckDB
    //     computes (q337 precedent), argmax ties break on id, and
    //     the margin is one exact IEEE subtraction — so the triplet
    //     SET is bit-pinned and the census hash-matches. ---
    "q390_triplet_margin" -> rounded("min_margin" -> 6,
        "max_margin" -> 6)({ (spark, dir) =>
      val sim = graft.llm.Similarity
      val emb = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      // bounded scalar pull: one count pins the bucket fan-out
      val nBuckets = math.max(16L, emb.count() / 32L)
      def side(df: DataFrame, tag: String): DataFrame = df
        .withColumn("__bucket",
          pmod(conv(substring(md5(concat(lit("tri:"),
            col(s"${tag}id").cast("string")).cast("binary")),
            1, 4), 16, 10).cast("long"), lit(nBuckets)))
      val anchors = side(emb.filter(pmod(col("vec_id"), lit(4)) === 0)
        .select(col("vec_id").as("aid"), col("label").as("alab"),
          col("v").as("av")), "a")
      val cands = side(emb.filter(pmod(col("vec_id"), lit(4)) =!= 0)
        .select(col("vec_id").as("cid"), col("label").as("clab"),
          col("v").as("cv")), "c")
      val scored = anchors.join(cands, Seq("__bucket"))
        .withColumn("cos", sim.cosine(col("av"), col("cv")))
      val trip = scored.groupBy(col("aid"), col("alab"))
        .agg(
          max(when(col("clab") === col("alab"),
            struct(col("cos"), (-col("cid")).as("__t"),
              col("cid").as("__id")))).as("__p"),
          max(when(col("clab") =!= col("alab"),
            struct(col("cos"), (-col("cid")).as("__t"),
              col("cid").as("__id")))).as("__n"))
        .filter(col("__p").isNotNull && col("__n").isNotNull)
        .select(col("aid"), col("alab"),
          col("__p.__id").as("pos_id"), col("__n.__id").as("neg_id"),
          (col("__p.cos") - col("__n.cos")).as("margin"))
      trip.groupBy(col("alab").cast("long").as("label"))
        .agg(count(lit(1)).as("n_triplets"),
          coalesce(sum(when(col("margin") < 0, 1L)), lit(0L))
            .as("n_inverted"),
          coalesce(sum(when(col("margin") < 0.2, 1L)), lit(0L))
            .as("n_hard"),
          sum(col("aid")).as("aid_checksum"),
          sum(col("pos_id")).as("pos_checksum"),
          sum(col("neg_id")).as("neg_checksum"),
          min(col("margin")).as("min_margin"),
          max(col("margin")).as("max_margin"))
        .orderBy(col("label"))
    }),


    // --- T5-STYLE SPAN CORRUPTION census (the denoising objective's
    //     data transform, measured before any tensor is built):
    //     token positions partition into 3-token blocks, a block is
    //     masked iff md5(doc:block) ≡ 0 (mod 20) — 5% of spans ⇒
    //     ~15% of tokens, non-overlapping BY CONSTRUCTION (no greedy
    //     sequential pass to distribute). Per source: spans, masked
    //     tokens, masked basis points, and the encoder/decoder
    //     sequence lengths (each masked span collapses to one
    //     sentinel on the input side and expands to sentinel+span on
    //     the target side) — the numbers a batch-size planner needs.
    //     Explode is ∝ tokens/3; one aggregation, exact integers. ---
    "q391_span_corruption" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
        .filter(col("n_tok") > 0)
      val blocks = docs
        .withColumn("j", explode(expr(
          "sequence(0L, (n_tok - 1) div 3)")))
        .withColumn("blk_tok",
          least(lit(3L), col("n_tok") - col("j") * 3))
        .withColumn("masked",
          pmod(conv(substring(md5(concat(lit("sc:"),
            col("doc_id").cast("string"), lit(":"),
            col("j").cast("string")).cast("binary")), 1, 4), 16, 10)
            .cast("long"), lit(20)) === 0)
      blocks.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          sum(col("blk_tok")).as("n_tokens"),
          coalesce(sum(when(col("masked"), col("blk_tok"))), lit(0L))
            .as("n_masked"),
          coalesce(sum(when(col("masked"), 1L)), lit(0L))
            .as("n_spans"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_masked"), col("n_spans"),
          expr("n_masked * 10000 div n_tokens").as("masked_bp"),
          (col("n_tokens") - col("n_masked") + col("n_spans"))
            .as("enc_len"),
          (col("n_masked") + col("n_spans")).as("dec_len"))
        .orderBy(col("source"))
    },


    // --- TRIPLET MINING AS A FOLD (the eighth fold family —
    //     per-anchor argmax is a SELECTION monoid): the hardest
    //     negative / best positive per anchor over candidates A ∪ B
    //     is the struct-max of the per-batch argmaxes, so a corpus
    //     that arrives in batches keeps one (pos, neg) struct pair
    //     per anchor and NEVER re-scores old candidates against old
    //     anchors. Candidates stream in three batches (vec_id mod
    //     3); each batch pays its own bucketed pair join; the fold
    //     is one groupBy struct-max over anchor-bounded state. The
    //     oracle is q390's single-pass census — hash match proves
    //     fold ≡ rebuild. ---
    "q394_triplet_fold" -> rounded("min_margin" -> 6,
        "max_margin" -> 6)({ (spark, dir) =>
      val sim = graft.llm.Similarity
      val emb = tbl(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val nBuckets = math.max(16L, emb.count() / 32L)
      def bucketed(df: DataFrame, tag: String): DataFrame = df
        .withColumn("__bucket",
          pmod(conv(substring(md5(concat(lit("tri:"),
            col(s"${tag}id").cast("string")).cast("binary")),
            1, 4), 16, 10).cast("long"), lit(nBuckets)))
      val anchors = bucketed(
        emb.filter(pmod(col("vec_id"), lit(4)) === 0)
          .select(col("vec_id").as("aid"), col("label").as("alab"),
            col("v").as("av")), "a")
      val cands = bucketed(
        emb.filter(pmod(col("vec_id"), lit(4)) =!= 0)
          .select(col("vec_id").as("cid"), col("label").as("clab"),
            col("v").as("cv")), "c")
      // per-batch argmax census: ≤ one row per anchor, the fold state
      def batchBest(batch: DataFrame): DataFrame =
        anchors.join(batch, Seq("__bucket"))
          .withColumn("cos", sim.cosine(col("av"), col("cv")))
          .groupBy(col("aid"), col("alab"))
          .agg(
            max(when(col("clab") === col("alab"),
              struct(col("cos"), (-col("cid")).as("__t"),
                col("cid").as("__id")))).as("__p"),
            max(when(col("clab") =!= col("alab"),
              struct(col("cos"), (-col("cid")).as("__t"),
                col("cid").as("__id")))).as("__n"))
      val folded = (0 to 2).map(i =>
          batchBest(cands.filter(pmod(col("cid"), lit(3)) === i)))
        .reduce(_ unionByName _)
        .groupBy(col("aid"), col("alab"))
        .agg(max(col("__p")).as("__p"), max(col("__n")).as("__n"))
      folded
        .filter(col("__p").isNotNull && col("__n").isNotNull)
        .select(col("aid"), col("alab"),
          col("__p.__id").as("pos_id"), col("__n.__id").as("neg_id"),
          (col("__p.cos") - col("__n.cos")).as("margin"))
        .groupBy(col("alab").cast("long").as("label"))
        .agg(count(lit(1)).as("n_triplets"),
          coalesce(sum(when(col("margin") < 0, 1L)), lit(0L))
            .as("n_inverted"),
          coalesce(sum(when(col("margin") < 0.2, 1L)), lit(0L))
            .as("n_hard"),
          sum(col("aid")).as("aid_checksum"),
          sum(col("pos_id")).as("pos_checksum"),
          sum(col("neg_id")).as("neg_checksum"),
          min(col("margin")).as("min_margin"),
          max(col("margin")).as("max_margin"))
        .orderBy(col("label"))
    }),


    // --- PACKED-CORPUS TAKEDOWN IMPACT (right-to-be-forgotten /
    //     canary-removal ops): given a delete set (every 97th doc),
    //     which packed chunks are touched, how many tokens leave,
    //     and what the two re-pack policies cost — HOLE-PUNCH
    //     (rewrite only affected chunks, leaves padding holes) vs
    //     TAIL-REPACK (re-pack from the first affected chunk to keep
    //     contiguity). Reads the spans manifold only (Packing.spans
    //     — rank-bucketed prefix sums), never the text: at 100 TB
    //     the takedown estimate is a manifest scan, and every
    //     crossJoin below carries a single-row aggregate. ---
    "q395_takedown" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long")
            .as("n_tok"))
      val sp = graft.operators.Packing.spans(docs, col("doc_id"),
        col("n_tok"))
      val del = sp.filter(pmod(col("doc_id"), lit(97)) === 0)
      val touched = del.withColumn("chunk",
          explode(expr("sequence(s div 512, e div 512)")))
        .select(col("chunk")).distinct()
      val totals = sp.agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        expr("(max(e) div 512) + 1").as("n_chunks"))
      val delAgg = del.agg(count(lit(1)).as("n_deleted"),
        coalesce(sum(col("n_tok")), lit(0L)).as("tok_deleted"))
      val tAgg = touched.agg(
        count(lit(1)).as("n_affected_chunks"),
        min(col("chunk")).as("first_affected"))
      totals.crossJoin(delAgg).crossJoin(tAgg)
        .select(col("n_docs"), col("n_deleted"), col("n_tokens"),
          col("tok_deleted"), col("n_chunks"),
          col("n_affected_chunks"),
          expr("n_affected_chunks * 10000 div n_chunks")
            .as("affected_bp"),
          col("first_affected"),
          (col("n_chunks") - col("first_affected"))
            .as("repack_tail_chunks"))
    },


    // --- PER-SOURCE QUALITY TERTILES (the CCNet shape: bucket docs
    //     by quality WITHIN each source, so a verbose source and a
    //     terse one each contribute their own best third — an
    //     absolute threshold would gate whole sources out): docs
    //     rank per source on the bit-exact q97 score (algebraic
    //     sigmoid — no libm anywhere, so ranks can never flip across
    //     engines), tertile = (rk−1)·3 div n. The rank rides
    //     bucketedRank with a score-BAND bucket (floor(−score·1024)
    //     — ·2¹⁰ is exponent arithmetic, exact, and monotone in the
    //     sort axis; up to 1024 bands, so a concentrated score
    //     distribution still splits each source's window into many
    //     bounded partitions — the r12-advice fix over the 8-band
    //     version whose worst case was nearly per-source), never a
    //     per-source single-task window. ---
    "q396_quality_tertiles" -> rounded("min_score" -> 6,
        "max_score" -> 6)({ (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long")
            .as("n_tok"),
          col("text"))
      val scored = graft.llm.QualityModel.classify(docs, col("text"))
        .select(col("doc_id"), col("source"), col("n_tok"),
          col("score"))
      val keyed = scored.withColumn("__ns", -col("score"))
        .withColumn("__sb", floor(col("__ns") * 1024).cast("long"))
      val ranked = QueryShared.bucketedRank(keyed, Seq("source"),
        "__sb", Seq("__ns", "doc_id"), "rk")
      val ns = scored.groupBy(col("source"))
        .agg(count(lit(1)).as("__n"))
      ranked.join(broadcast(ns), Seq("source"))
        .withColumn("bucket", expr("(rk - 1) * 3 div __n"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok"),
          sum(col("doc_id")).as("id_checksum"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy(col("source"), col("bucket"))
    }),


    // --- HIERARCHICAL UNIMAX MIXTURE (domain → source, the
    //     production two-level shape: water-fill the token budget
    //     ACROSS domains, then water-fill each domain's award ACROSS
    //     its sources — the per-language-then-per-corpus allocation
    //     unit mixtures actually use): level 1 rides the shared
    //     global water-fill on the domain census; level 2 is the
    //     same algebra PARTITIONED BY domain with the level-1 award
    //     as each domain's budget (an external budget, not a fixed
    //     fraction — the fragment can't express it, so the
    //     partitioned closed form is written out: rn/cum/n per
    //     domain, first-overflow index, remainder spread). Every
    //     window runs over the k-row source census (q352 guard),
    //     never the corpus. Exact integers end to end. ---
    "q397_hier_mixture" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val srcC = docs.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("sz_tok"))
        .withColumn("domain", concat(lit("d"),
          pmod(conv(substring(md5(concat(lit("dom:"),
            col("source")).cast("binary")), 1, 4), 16, 10)
            .cast("long"), lit(4)).cast("string")))
      val nSources = srcC.count()
      require(nSources <= 10000,
        s"q397: source census has $nSources sources, above the " +
          "10000 the allocation windows are bounded for — shard it")
      // L1: global water-fill across domains (shared algebra; the
      // helper keys on a column named `source`, so alias through)
      val domC = srcC.groupBy(col("domain"))
        .agg(sum(col("sz_tok")).as("dz"))
      val domA = unimaxAlloc(
          domC.withColumnRenamed("domain", "source"), "dz",
          "dom_alloc", 6, 10)
        .select(col("source").as("domain"), col("dom_alloc"))
      // L2: the same closed form PARTITIONED BY domain, budget = the
      // level-1 award (b_d), over the k-row census
      val dw = Window.partitionBy(col("domain"))
        .orderBy(col("sz_tok"), col("source"))
      val o = srcC.join(broadcast(domA), Seq("domain"))
        .withColumn("rn", row_number().over(dw).cast("long"))
        .withColumn("cum", sum(col("sz_tok")).over(
          dw.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n_d", count(lit(1)).over(
          Window.partitionBy(col("domain"))))
        .withColumn("raw",
          col("sz_tok") * (col("n_d") - col("rn") + 1) <=
            col("dom_alloc") - (col("cum") - col("sz_tok")))
      val ff = o.groupBy(col("domain"))
        .agg(coalesce(min(when(!col("raw"), col("rn"))),
          max(col("n_d")) + 1).as("ff"))
      val ck = o.join(broadcast(ff), Seq("domain"))
        .groupBy(col("domain"), col("ff"))
        .agg(coalesce(max(when(col("rn") === col("ff") - 1,
          col("cum"))), lit(0L)).as("cumk"))
      o.join(broadcast(ck), Seq("domain"))
        .withColumn("rem", col("dom_alloc") - col("cumk"))
        .withColumn("lft", col("n_d") - (col("ff") - 1))
        .withColumn("alloc_tok",
          when(col("rn") < col("ff"), col("sz_tok"))
            .otherwise(expr("rem div lft") +
              when(col("rn") - (col("ff") - 1) <=
                pmod(col("rem"), col("lft")), 1L).otherwise(0L)))
        .select(col("source"), col("domain"), col("sz_tok"),
          col("dom_alloc"), col("alloc_tok"))
        .orderBy(col("source"))
    },


    // --- FILL-IN-THE-MIDDLE TRANSFORM census (the code-model data
    //     prep: a hash-selected half of eligible docs is rearranged
    //     prefix/middle/suffix with two deterministic cut points;
    //     mode splits PSM vs SPM on another hash bit — the
    //     50%-FIM-rate recipe, replayed as pure arithmetic on token
    //     counts so the layout planner sees segment masses before
    //     any text moves). Cut points are hash mod (n_tok+1), sorted
    //     — empty segments allowed, exactly like the published
    //     transform. Per (source, mode): docs, segment token masses,
    //     id checksum. Exact integers; one aggregation. ---
    "q398_fim_census" -> { (spark, dir) =>
      def h(tag: String): Column =
        conv(substring(md5(concat(lit(tag),
          col("doc_id").cast("string")).cast("binary")), 1, 8),
          16, 10).cast("long")
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val cut = docs
        .withColumn("fim", col("n_tok") >= 8 &&
          pmod(h("fim:"), lit(2)) === 0)
        .withColumn("u1", pmod(h("fim1:"), col("n_tok") + 1))
        .withColumn("u2", pmod(h("fim2:"), col("n_tok") + 1))
        .withColumn("p1", least(col("u1"), col("u2")))
        .withColumn("p2", greatest(col("u1"), col("u2")))
        .withColumn("mode",
          when(!col("fim"), lit("ar"))
            .when(pmod(h("fim3:"), lit(2)) === 0, lit("psm"))
            .otherwise(lit("spm")))
      cut.groupBy(col("source"), col("mode"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(when(col("fim"), col("p1"))
            .otherwise(col("n_tok"))), lit(0L)).as("tok_prefix"),
          coalesce(sum(when(col("fim"), col("p2") - col("p1"))
            .otherwise(0L)), lit(0L)).as("tok_middle"),
          coalesce(sum(when(col("fim"), col("n_tok") - col("p2"))
            .otherwise(0L)), lit(0L)).as("tok_suffix"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("source"), col("mode"))
    },


    // --- CURATION DROP ATTRIBUTION (the "why did we lose 40% of
    //     source X" debug table): every gate of a four-filter
    //     curation pass contributes one bit — 1 = quality fail
    //     (bit-exact q97 score < 0.5), 2 = too short (< 20 tokens),
    //     4 = exact-dup non-keeper (same md5(text), not the min id),
    //     8 = off-target language — and the census counts every
    //     (source, bitmask) combination, so overlapping filters are
    //     ATTRIBUTED, not just netted (mask 0 = kept; a doc failing
    //     quality AND dup shows as 5, not double-counted). Dup
    //     detection is a groupBy-min on the text hash joined back
    //     (never a per-text window); everything else is map-side. ---
    "q399_drop_attribution" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          col("text"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val scored = graft.llm.QualityModel.classify(docs, col("text"))
        .withColumn("th", md5(col("text").cast("binary")))
      val fams = scored.groupBy(col("th"))
        .agg(min(col("doc_id")).as("__keeper"),
          count(lit(1)).as("__fam"))
      scored.join(fams, Seq("th"))
        .withColumn("mask",
          when(col("score") < 0.5, 1L).otherwise(0L) +
          when(col("n_tok") < 20, 2L).otherwise(0L) +
          when(col("__fam") > 1 && col("doc_id") =!= col("__keeper"),
            4L).otherwise(0L) +
          when(col("lang") =!= "en", 8L).otherwise(0L))
        .groupBy(col("source"), col("mask"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("tok"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("source"), col("mask"))
    },


    // --- DEDUP RETRACTION (takedowns hit the near-dup manifest
    //     too): deleting docs from a deduplicated corpus must UPDATE
    //     the pair manifest and may SPLIT clusters that were only
    //     connected through a deleted bridge doc. Retraction is
    //     filter + re-close over the ALREADY-TINY staged pair set
    //     (the q342/q347 artifact — no corpus re-mine, the whole
    //     point), and the census pins pairs/clusters/removable
    //     before vs after plus the split count (old components whose
    //     surviving PAIRED members span ≥ 2 new components — members
    //     isolated by the deletion leave the manifold entirely). ---
    "q400_dedup_retract" -> { (spark, dir) =>
      import graft.llm.Dedup
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val variants = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("text").substr(lit(1),
            greatest(length(col("text")) - 20, lit(1))).as("text"))
      val corpus = docs.unionByName(variants)
      val pairs = graft.operators.Staged.getOrBuild(spark,
          s"ngram_pairs::$dir::mod3_trunc20::sh3_t0.5_df16") {
        Dedup.ngramJaccardPairs(corpus, col("doc_id"),
          col("text"), shingleN = 3, threshold = 0.5, maxDf = 16)
      }.select(col("id_a"), col("id_b"))
      val comps = graft.operators.Staged.getOrBuild(spark,
          s"ngram_cc::$dir::mod3_trunc20::sh3_t0.5_df16") {
        Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      }
      // retraction: every 10th doc (variant offset is a multiple of
      // 10, so a variant leaves iff its original leaves)
      val pairs2 = pairs.filter(
        pmod(col("id_a"), lit(10)) =!= 0 &&
        pmod(col("id_b"), lit(10)) =!= 0)
      val comps2 = Dedup.connectedComponents(pairs2, col("id_a"),
        col("id_b"))
      def pairStats(p: DataFrame, tag: String): DataFrame =
        p.agg(count(lit(1)).as(s"n_pairs_$tag"))
      def compStats(c: DataFrame, tag: String): DataFrame =
        c.agg(countDistinct(col("comp")).as(s"n_clusters_$tag"),
          (count(lit(1)) - countDistinct(col("comp")))
            .as(s"n_removable_$tag"))
      val splits = comps.filter(pmod(col("id"), lit(10)) =!= 0)
        .join(comps2.select(col("id"),
          col("comp").as("comp2")), Seq("id"))
        .groupBy(col("comp"))
        .agg(countDistinct(col("comp2")).as("__nc"))
        .filter(col("__nc") >= 2)
        .agg(coalesce(count(lit(1)), lit(0L))
          .as("n_split_components"))
      pairStats(pairs, "before").crossJoin(pairStats(pairs2, "after"))
        .crossJoin(compStats(comps, "before"))
        .crossJoin(compStats(comps2, "after"))
        .crossJoin(splits)
        .select(col("n_pairs_before"), col("n_pairs_after"),
          col("n_clusters_before"), col("n_clusters_after"),
          col("n_removable_before"), col("n_removable_after"),
          col("n_split_components"))
    },


    // --- TRAINING-ORDER × COVARIATE INDEPENDENCE audit (is the
    //     epoch shuffle actually decorrelated from data quality? an
    //     order that front-loads good docs silently anneals the
    //     curriculum): cross-tabulate training-order quartile (the
    //     md5 epoch order of q360) against quality quartile (the
    //     bit-exact q97 score) — a sound shuffle puts N/16 docs in
    //     every cell, so per-cell shares in basis points read as
    //     uniform-or-not at a glance. Both global ranks ride
    //     bucketedRank (hash-prefix / score-band buckets), never a
    //     single-task window. Exact integers. ---
    "q401_order_covariate" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val scored = graft.llm.QualityModel.classify(docs, col("text"))
        .select(col("doc_id"), col("score"))
      val keyed = scored
        .withColumn("h", md5(concat(lit("ord:"),
          col("doc_id").cast("string")).cast("binary")))
        .withColumn("__bk", substring(col("h"), 1, 2))
      val ordered = QueryShared.bucketedRank(keyed, Seq.empty,
        "__bk", Seq("h", "doc_id"), "ork")
      val banded = ordered.withColumn("__ns", -col("score"))
        .withColumn("__sb", floor(col("__ns") * 1024).cast("long"))
      val ranked = QueryShared.bucketedRank(banded, Seq.empty,
        "__sb", Seq("__ns", "doc_id"), "qrk")
      val n = ranked.agg(count(lit(1)).as("__n"))
      ranked.crossJoin(broadcast(n))
        .withColumn("order_q", expr("(ork - 1) * 4 div __n"))
        .withColumn("quality_q", expr("(qrk - 1) * 4 div __n"))
        .groupBy(col("order_q"), col("quality_q"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_checksum"))
        .crossJoin(broadcast(n))
        .withColumn("share_bp", expr("n_docs * 10000 div __n"))
        .select(col("order_q"), col("quality_q"), col("n_docs"),
          col("share_bp"), col("id_checksum"))
        .orderBy(col("order_q"), col("quality_q"))
    },


    // --- PACKED-CHUNK PROVENANCE (how mixed are attention windows?
    //     concat-packing puts UNRELATED docs in one context window;
    //     cross-doc attention then sees source A's text next to
    //     source B's — this census histograms every 512-token chunk
    //     by its distinct-source count, the number a block-diagonal
    //     attention mask (q364) exists to fix). Spans come from the
    //     rank-bucketed Packing.spans; the explode is ∝ tokens/L;
    //     the q386 batch-diversity audit at DOC grain, re-run at the
    //     TOKEN-WINDOW grain where the model actually looks. ---
    "q402_chunk_provenance" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long")
            .as("n_tok"))
      val sp = graft.operators.Packing.spans(docs, col("doc_id"),
        col("n_tok"))
      val ch = sp.join(docs.select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .withColumn("chunk",
          explode(expr("sequence(s div 512, e div 512)")))
      val per = ch.groupBy(col("chunk"))
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"))
      val tot = per.agg(count(lit(1)).as("__t"))
      per.groupBy(col("n_sources"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_docs")).as("doc_slots"))
        .crossJoin(broadcast(tot))
        .withColumn("share_bp", expr("n_chunks * 10000 div __t"))
        .select(col("n_sources"), col("n_chunks"), col("doc_slots"),
          col("share_bp"))
        .orderBy(col("n_sources"))
    },


    // --- CAP → MIXTURE INTERPLAY (what the domain cap does to the
    //     training mixture): the UniMax water-fill re-run on the
    //     capped corpus vs the raw one, per source — the cap shrinks
    //     dominant sources' availability, so the water level and
    //     every allocation move. Rides q388's STAGED kept set (the
    //     rank never re-runs) and the shared water-fill algebra
    //     (q352/q357); both censuses are source-bounded k-row
    //     frames. Exact integers end to end. ---
    "q392_cap_mixture" -> { (spark, dir) =>
      val docs = tbl(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      val kept = graft.operators.Staged.getOrBuild(spark,
          s"cap_kept::$dir::md5cap_k15") {
        graft.operators.CapSample.mine(
            docs.withColumn("h", md5(concat(lit("cap:"),
              col("doc_id").cast("string")).cast("binary"))),
            "source", Seq("h", "doc_id"), k = 15)
          .select(col("doc_id"), col("source"), col("n_tok"))
      }
      val rawC = docs.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("sz_tok"))
      val capC = kept.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("sz_tok"))
      // the q352/q357 census bound, same remedy
      val nSources = rawC.count()
      require(nSources <= 10000,
        s"q392: source census has $nSources sources, above the " +
          "10000 the allocation windows are bounded for — shard it")
      val rawA = unimaxAlloc(rawC, "sz_tok", "alloc", 6, 10)
        .select(col("source"), col("sz_tok").as("raw_tok"),
          col("alloc").as("raw_alloc"))
      val capA = unimaxAlloc(capC, "sz_tok", "alloc", 6, 10)
        .select(col("source"), col("sz_tok").as("cap_tok"),
          col("alloc").as("cap_alloc"))
      rawA.join(capA, Seq("source"))
        .withColumn("alloc_delta",
          col("cap_alloc") - col("raw_alloc"))
        .orderBy(col("source"))
    }
  )

  def oracleSql: Map[String, String] = Map(

    "q363_importance_resample" -> """
      WITH tk AS (SELECT doc_id, source, lang,
                         unnest(list_filter(string_split_regex(
                           lower(trim(text)), '\s+'),
                           x -> length(x) > 0)) AS tok
                  FROM documents),
      raw AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_r
              FROM tk GROUP BY 1),
      tgt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_t
              FROM tk WHERE lang = 'en' GROUP BY 1),
      st AS (SELECT CAST(count(*) AS BIGINT) AS sr,
                    CAST(count(*) FILTER (WHERE lang = 'en')
                      AS BIGINT) AS stt
             FROM tk),
      w AS (SELECT raw.tok,
                   CAST(coalesce(tgt.c_t, 0) * st.sr -
                        raw.c_r * st.stt AS BIGINT) AS w
            FROM raw LEFT JOIN tgt USING (tok) CROSS JOIN st),
      sc AS (SELECT tk.doc_id, tk.source,
                    CAST(sum(w.w) AS BIGINT) AS num,
                    CAST(count(*) AS BIGINT) AS n_tok
             FROM tk JOIN w USING (tok) GROUP BY 1, 2)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(CASE WHEN num > 0 THEN 1 END), 0)
               AS BIGINT) AS n_selected,
             CAST(coalesce(sum(CASE WHEN num > 0 THEN n_tok END), 0)
               AS BIGINT) AS tok_selected,
             CAST(coalesce(sum(CASE WHEN num > 0 THEN doc_id END), 0)
               AS BIGINT) AS sel_checksum,
             round(CAST(coalesce(sum(CASE WHEN num > 0 THEN num END),
                 0) AS DOUBLE) /
               CAST(greatest(coalesce(sum(CASE WHEN num > 0
                 THEN n_tok END), 0), 1) AS DOUBLE), 6)
               AS sel_score_per_tok
      FROM sc GROUP BY source ORDER BY source""",


    "q364_pack_mask_meta" -> """
      WITH tk AS (SELECT doc_id, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      d AS (SELECT doc_id, n_tok FROM tk WHERE n_tok > 0),
      c AS (SELECT doc_id, n_tok,
                   sum(n_tok) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
            FROM d),
      sp AS (SELECT doc_id, CAST(cum - n_tok AS BIGINT) AS s,
                    CAST(cum - 1 AS BIGINT) AS e FROM c),
      seg AS (SELECT doc_id, s, e,
                     unnest(generate_series(s // 512, e // 512))
                       AS chunk
              FROM sp),
      g AS (SELECT chunk, doc_id,
                   greatest(s, chunk * 512) - chunk * 512
                     AS seg_start,
                   least(e, chunk * 512 + 511) -
                     greatest(s, chunk * 512) + 1 AS seg_len,
                   s >= chunk * 512 AS starts_here,
                   e <= chunk * 512 + 511 AS ends_here
            FROM seg)
      SELECT CAST(chunk AS BIGINT) AS chunk,
             CAST(row_number() OVER (PARTITION BY chunk
               ORDER BY seg_start) AS BIGINT) AS seg_idx,
             doc_id, CAST(seg_start AS BIGINT) AS seg_start,
             CAST(seg_len AS BIGINT) AS seg_len,
             starts_here, ends_here
      FROM g ORDER BY chunk, seg_idx""",


    "q365_curriculum_schedule" -> """
      WITH tk AS (SELECT doc_id, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk),
      r AS (SELECT doc_id, n_tok,
                   row_number() OVER (ORDER BY n_tok, doc_id) AS rk
            FROM tk),
      st AS (SELECT doc_id, n_tok, rk,
                    unnest(generate_series(1, 4)) AS stage
             FROM r),
      pool AS (SELECT st.*, n.n FROM st CROSS JOIN n
               WHERE 4 * rk <= n.n * stage + 3),
      sel AS (SELECT stage, doc_id, n_tok, n,
                     row_number() OVER (PARTITION BY stage
                       ORDER BY md5('cur:' ||
                         CAST(stage AS VARCHAR) || ':' ||
                         CAST(doc_id AS VARCHAR)), doc_id) AS srk
              FROM pool)
      SELECT CAST(stage AS BIGINT) AS stage,
             CAST(count(*) AS BIGINT) AS pool_docs,
             CAST(coalesce(sum(CASE WHEN srk <= n // 8
               THEN 1 END), 0) AS BIGINT) AS n_selected,
             CAST(coalesce(sum(CASE WHEN srk <= n // 8
               THEN n_tok END), 0) AS BIGINT) AS tok_selected,
             CAST(coalesce(sum(CASE WHEN srk <= n // 8
               THEN doc_id END), 0) AS BIGINT) AS sel_checksum
      FROM sel GROUP BY stage ORDER BY stage""",


    "q366_loss_mask_census" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
                        event_type, props,
                        CAST(round(value * 100) AS BIGINT) AS cents
                 FROM events),
      r AS (SELECT user_id, event_type, cents, props,
                   CAST(row_number() OVER (PARTITION BY user_id
                     ORDER BY us, event_id) AS BIGINT) AS i
            FROM e),
      t AS (SELECT user_id,
                   CASE WHEN i % 2 = 1 THEN 'user'
                        ELSE 'assistant' END AS role,
                   '<|' || (CASE WHEN i % 2 = 1 THEN 'user'
                            ELSE 'assistant' END) || '|> ' ||
                     event_type || '=' || CAST(cents AS VARCHAR) ||
                     ' ' || props || ' <|end|>' AS turn
            FROM r),
      tok AS (SELECT user_id, role, CAST(len(list_filter(
                string_split_regex(lower(trim(turn)), '\s+'),
                x -> length(x) > 0)) AS BIGINT) AS n_tok
              FROM t)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_turns,
             CAST(coalesce(sum(CASE WHEN role = 'assistant'
               THEN 1 END), 0) AS BIGINT) AS n_assistant,
             CAST(sum(n_tok) AS BIGINT) AS tok_total,
             CAST(coalesce(sum(CASE WHEN role = 'assistant'
               THEN n_tok END), 0) AS BIGINT) AS tok_trainable,
             CAST(coalesce(sum(CASE WHEN role = 'assistant'
               THEN n_tok END), 0) * 10000 // sum(n_tok)
               AS BIGINT) AS trainable_bp
      FROM tok GROUP BY user_id ORDER BY user_id""",


    "q368_importance_fold" -> """
      WITH base AS (SELECT doc_id, source, lang, text FROM documents
                    UNION ALL
                    SELECT doc_id + 3000000, source, lang,
                           substring(text, 1,
                             greatest(length(text) - 25, 1))
                    FROM documents WHERE doc_id % 7 = 0),
      tk AS (SELECT doc_id, source, lang,
                    unnest(list_filter(string_split_regex(
                      lower(trim(text)), '\s+'),
                      x -> length(x) > 0)) AS tok
             FROM base),
      cen AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_r,
                     CAST(count(*) FILTER (WHERE lang = 'en')
                       AS BIGINT) AS c_t
              FROM tk GROUP BY 1),
      st AS (SELECT CAST(sum(c_r) AS BIGINT) AS sr,
                    CAST(sum(c_t) AS BIGINT) AS stt
             FROM cen),
      w AS (SELECT cen.tok,
                   CAST(cen.c_t * st.sr - cen.c_r * st.stt
                     AS BIGINT) AS w
            FROM cen CROSS JOIN st),
      sc AS (SELECT tk.doc_id, tk.source,
                    CAST(sum(w.w) AS BIGINT) AS num,
                    CAST(count(*) AS BIGINT) AS n_tok
             FROM tk JOIN w USING (tok)
             WHERE tk.doc_id >= 3000000 GROUP BY 1, 2)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(CASE WHEN num > 0 THEN 1 END), 0)
               AS BIGINT) AS n_selected,
             CAST(coalesce(sum(CASE WHEN num > 0 THEN n_tok END), 0)
               AS BIGINT) AS tok_selected,
             CAST(coalesce(sum(CASE WHEN num > 0 THEN doc_id END), 0)
               AS BIGINT) AS sel_checksum,
             round(CAST(coalesce(sum(CASE WHEN num > 0 THEN num END),
                 0) AS DOUBLE) /
               CAST(greatest(coalesce(sum(CASE WHEN num > 0
                 THEN n_tok END), 0), 1) AS DOUBLE), 6)
               AS sel_score_per_tok
      FROM sc GROUP BY source ORDER BY source""",


    "q373_packing_sweep" -> """
      WITH tk AS (SELECT doc_id, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      d AS (SELECT doc_id, n_tok FROM tk WHERE n_tok > 0),
      c AS (SELECT doc_id, n_tok,
                   sum(n_tok) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
            FROM d),
      sp AS (SELECT doc_id, CAST(cum - n_tok AS BIGINT) AS s,
                    CAST(cum - 1 AS BIGINT) AS e FROM c),
      t AS (SELECT CAST(max(cum) AS BIGINT) AS tt FROM c),
      k AS (SELECT CAST(unnest([128, 256, 512, 1024]) AS BIGINT)
              AS chunk_l),
      x AS (SELECT k.chunk_l, sp.doc_id,
                   sp.e // k.chunk_l - sp.s // k.chunk_l AS xing
            FROM sp CROSS JOIN k)
      SELECT chunk_l,
             CAST((t.tt + chunk_l - 1) // chunk_l AS BIGINT)
               AS n_chunks,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(CASE WHEN xing > 0 THEN 1 END), 0)
               AS BIGINT) AS docs_split,
             CAST(coalesce(sum(CASE WHEN xing > 0 THEN 1 END), 0)
               * 10000 // count(*) AS BIGINT) AS split_bp,
             CAST(sum(xing) AS BIGINT) AS n_crossings,
             CAST(((t.tt + chunk_l - 1) // chunk_l) * chunk_l - t.tt
               AS BIGINT) AS tail_waste
      FROM x CROSS JOIN t GROUP BY chunk_l, t.tt
      ORDER BY chunk_l""",


    "q372_dedup_mixture" -> s"""
      WITH RECURSIVE
      base AS (SELECT doc_id, source, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, source,
                      substring(text, 1,
                        greatest(length(text) - 20, 1))
               FROM documents WHERE doc_id % 3 = 0),
      tk AS (SELECT doc_id, source, list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0) AS toks FROM base),
      sh AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                      list_distinct(list_transform(
                        generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' '
                          || toks[i+2]))
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END AS s
             FROM tk),
      ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
      kg AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) <= 16),
      ex AS (SELECT doc_id, ex0.g FROM ex0 JOIN kg USING (g)),
      dsz AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS ns
                FROM ex a JOIN ex b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      p AS (SELECT i.id_a, i.id_b
            FROM inter i
            JOIN dsz sa ON sa.doc_id = i.id_a
            JOIN dsz sb ON sb.doc_id = i.id_b
            WHERE round(CAST(i.ns AS DOUBLE)
              / (sa.sz + sb.sz - i.ns), 6) >= 0.5),
      e AS (SELECT id_a AS x, id_b AS y FROM p
            UNION ALL SELECT id_b, id_a FROM p),
      r AS (SELECT x AS id, x AS rr FROM e
            UNION
            SELECT e.x, r.rr FROM e JOIN r ON e.y = r.id),
      cc AS (SELECT id, min(rr) AS comp FROM r GROUP BY id),
      asg AS (SELECT tk.doc_id, tk.source,
                     CAST(len(tk.toks) AS BIGINT) AS n_tok,
                     coalesce(cc.comp, tk.doc_id) AS cluster
              FROM tk LEFT JOIN cc ON cc.id = tk.doc_id),
      kp AS (SELECT cluster, min(doc_id) AS keep_id
             FROM asg GROUP BY 1),
      mk AS (SELECT asg.*, (asg.doc_id = kp.keep_id) AS keep
             FROM asg JOIN kp USING (cluster)),
      pre AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS sz_pre
              FROM mk GROUP BY 1),
      post AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS sz_post
               FROM mk WHERE keep GROUP BY 1),
      ${unimaxAllocSql("pre", "sz_pre", "alloc_pre", "u1")},
      ${unimaxAllocSql("post", "sz_post", "alloc_post", "u2")}
      SELECT a1.source, a1.sz_pre, a1.alloc_pre,
             CAST(coalesce(a2.sz_post, 0) AS BIGINT) AS sz_post,
             CAST(coalesce(a2.alloc_post, 0) AS BIGINT)
               AS alloc_post,
             CAST((a1.sz_pre - coalesce(a2.sz_post, 0)) * 10000
               // a1.sz_pre AS BIGINT) AS drop_bp
      FROM u1a a1 LEFT JOIN u2a a2 USING (source)
      ORDER BY a1.source""",


    "q371_rank_sharding" -> """
      WITH tk AS (SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0) AS toks
                  FROM documents),
      sc AS (SELECT doc_id,
                    CAST(len(list_distinct(toks)) AS BIGINT)
                      AS score,
                    CAST(len(toks) AS BIGINT) AS n_tok
             FROM tk),
      r AS (SELECT doc_id, n_tok,
                   row_number() OVER (ORDER BY score, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM sc),
      q AS (SELECT doc_id, n_tok,
                   ((rn - 1) * 4) // n + 1 AS quart
            FROM r),
      ep AS (SELECT doc_id, n_tok,
                    unnest(generate_series(1, quart)) AS epoch
             FROM q),
      o AS (SELECT doc_id, n_tok, epoch,
                   row_number() OVER (PARTITION BY epoch
                     ORDER BY md5('ep' || CAST(epoch AS VARCHAR) ||
                       ':' || CAST(doc_id AS VARCHAR)), doc_id)
                     AS rk
            FROM ep)
      SELECT CAST(epoch AS BIGINT) AS epoch,
             CAST((rk - 1) % 8 AS BIGINT) AS rnk,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS tok_sum,
             CAST(sum(((rk - 1) // 8 + 1) * doc_id) AS BIGINT)
               AS order_checksum
      FROM o GROUP BY 1, 2 ORDER BY 1, 2""",


    "q376_dup_exposure" -> """
      WITH RECURSIVE
      base AS (SELECT doc_id, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000,
                      substring(text, 1,
                        greatest(length(text) - 20, 1))
               FROM documents WHERE doc_id % 3 = 0),
      tk AS (SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks FROM base),
      sh AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                      list_distinct(list_transform(
                        generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' '
                          || toks[i+2]))
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END AS s
             FROM tk),
      ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
      kg AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) <= 16),
      ex AS (SELECT doc_id, ex0.g FROM ex0 JOIN kg USING (g)),
      dsz AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS ns
                FROM ex a JOIN ex b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      p AS (SELECT i.id_a, i.id_b
            FROM inter i
            JOIN dsz sa ON sa.doc_id = i.id_a
            JOIN dsz sb ON sb.doc_id = i.id_b
            WHERE round(CAST(i.ns AS DOUBLE)
              / (sa.sz + sb.sz - i.ns), 6) >= 0.5),
      e AS (SELECT id_a AS x, id_b AS y FROM p
            UNION ALL SELECT id_b, id_a FROM p),
      r AS (SELECT x AS id, x AS rr FROM e
            UNION
            SELECT e.x, r.rr FROM e JOIN r ON e.y = r.id),
      cc AS (SELECT id, min(rr) AS comp FROM r GROUP BY id),
      sc AS (SELECT doc_id,
                    CAST(len(list_distinct(toks)) AS BIGINT)
                      AS score,
                    CAST(len(toks) AS BIGINT) AS n_tok
             FROM tk),
      rk AS (SELECT doc_id, n_tok,
                    row_number() OVER (ORDER BY score, doc_id) AS rn,
                    count(*) OVER () AS n
             FROM sc),
      q AS (SELECT doc_id, n_tok,
                   ((rn - 1) * 4) // n + 1 AS exposure
            FROM rk),
      asg AS (SELECT q.doc_id, q.n_tok, q.exposure,
                     coalesce(cc.comp, q.doc_id) AS cluster
              FROM q LEFT JOIN cc ON cc.id = q.doc_id),
      cs AS (SELECT cluster, count(*) AS csz FROM asg GROUP BY 1),
      bk AS (SELECT asg.*, CASE WHEN cs.csz = 1 THEN '1_singleton'
                                WHEN cs.csz <= 3 THEN '2_small'
                                ELSE '3_family' END AS family
             FROM asg JOIN cs USING (cluster)),
      ti AS (SELECT CAST(sum(n_tok * exposure) AS BIGINT) AS ti
             FROM bk)
      SELECT family, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
             CAST(sum(n_tok * exposure) AS BIGINT) AS tok_instances,
             CAST(sum(n_tok * exposure) * 10000 // ti.ti AS BIGINT)
               AS share_bp
      FROM bk CROSS JOIN ti GROUP BY family, ti.ti
      ORDER BY family""",


    "q377_truncation_budget" -> """
      WITH tk AS (SELECT doc_id, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      k AS (SELECT CAST(unnest([128, 256, 512, 1024]) AS BIGINT)
              AS chunk_l),
      x AS (SELECT k.chunk_l, tk.n_tok FROM tk CROSS JOIN k),
      m AS (SELECT chunk_l,
                   CAST(sum(n_tok) AS BIGINT) AS total_tok,
                   CAST(sum(least(n_tok, chunk_l)) AS BIGINT)
                     AS trunc_kept,
                   CAST(coalesce(sum(CASE WHEN n_tok <= chunk_l
                     THEN n_tok END), 0) AS BIGINT) AS drop_kept,
                   CAST(coalesce(sum(CASE WHEN n_tok > chunk_l
                     THEN 1 END), 0) AS BIGINT) AS docs_dropped
            FROM x GROUP BY 1)
      SELECT chunk_l, total_tok, trunc_kept,
             CAST(trunc_kept * 10000 // total_tok AS BIGINT)
               AS trunc_bp,
             drop_kept,
             CAST(drop_kept * 10000 // total_tok AS BIGINT)
               AS drop_bp,
             docs_dropped
      FROM m ORDER BY chunk_l""",


    "q374_canary_exposure" -> """
      WITH can AS (SELECT CAST(5000000 + k AS BIGINT) AS doc_id,
                          'canary' || k || ' ' || array_to_string(
                            list_transform(generate_series(1, 4 * k),
                              j -> 't' || k || 'x' || j), ' ')
                            AS text
                   FROM (SELECT unnest(generate_series(1, 12)) AS k)),
      base AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id, text FROM can),
      tk AS (SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks FROM base),
      sc AS (SELECT doc_id,
                    CAST(len(list_distinct(toks)) AS BIGINT)
                      AS score,
                    CAST(len(toks) AS BIGINT) AS n_tok
             FROM tk),
      r AS (SELECT doc_id, n_tok,
                   row_number() OVER (ORDER BY score, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM sc),
      q AS (SELECT doc_id, n_tok,
                   ((rn - 1) * 4) // n + 1 AS quartile
            FROM r),
      d AS (SELECT doc_id, n_tok FROM sc WHERE n_tok > 0),
      c AS (SELECT doc_id, n_tok,
                   sum(n_tok) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
            FROM d),
      sp AS (SELECT doc_id, CAST(cum - n_tok AS BIGINT) AS s,
                    CAST(cum - 1 AS BIGINT) AS e FROM c)
      SELECT q.doc_id, q.n_tok,
             CAST(q.quartile AS BIGINT) AS quartile,
             CAST(sp.s // 512 AS BIGINT) AS chunk_first,
             CAST(sp.e // 512 AS BIGINT) AS chunk_last,
             CAST(sp.e // 512 - sp.s // 512 + 1 AS BIGINT)
               AS chunks_touched
      FROM q JOIN sp ON sp.doc_id = q.doc_id
      WHERE q.doc_id >= 5000000
      ORDER BY q.doc_id""",


    "q375_epoch_mixture_drift" -> """
      WITH tk AS (SELECT doc_id, source, list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0) AS toks
                  FROM documents),
      sc AS (SELECT doc_id, source,
                    CAST(len(list_distinct(toks)) AS BIGINT)
                      AS score,
                    CAST(len(toks) AS BIGINT) AS n_tok
             FROM tk),
      r AS (SELECT doc_id, source, n_tok,
                   row_number() OVER (ORDER BY score, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM sc),
      ep AS (SELECT doc_id, source, n_tok,
                    unnest(generate_series(1,
                      ((rn - 1) * 4) // n + 1)) AS epoch
             FROM r),
      ps AS (SELECT epoch, source,
                    CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(n_tok) AS BIGINT) AS tok_sum
             FROM ep GROUP BY 1, 2),
      pe AS (SELECT epoch, CAST(sum(tok_sum) AS BIGINT) AS et
             FROM ps GROUP BY 1)
      SELECT CAST(ps.epoch AS BIGINT) AS epoch, ps.source,
             ps.n_docs, ps.tok_sum,
             CAST(ps.tok_sum * 10000 // pe.et AS BIGINT) AS share_bp
      FROM ps JOIN pe ON pe.epoch = ps.epoch
      ORDER BY ps.epoch, ps.source""",


    "q370_labeler_kappa" -> """
      WITH tk AS (SELECT doc_id, source, list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0) AS toks
                  FROM documents),
      l AS (SELECT source,
                   CASE WHEN CAST(len(list_distinct(toks)) AS BIGINT)
                     * 2 >= len(toks) THEN 1 ELSE 0 END AS la,
                   CASE WHEN len(toks) >= 40 THEN 1 ELSE 0 END AS lb
            FROM tk),
      m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(coalesce(sum(CASE WHEN la = 1 AND lb = 1
                     THEN 1 END), 0) AS BIGINT) AS a,
                   CAST(coalesce(sum(CASE WHEN la = 1 AND lb = 0
                     THEN 1 END), 0) AS BIGINT) AS b,
                   CAST(coalesce(sum(CASE WHEN la = 0 AND lb = 1
                     THEN 1 END), 0) AS BIGINT) AS c,
                   CAST(coalesce(sum(CASE WHEN la = 0 AND lb = 0
                     THEN 1 END), 0) AS BIGINT) AS d
            FROM l GROUP BY source)
      SELECT source, n_docs, a + d AS n_agree,
             round(CAST(n_docs * (a + d) -
                 ((a + b) * (a + c) + (c + d) * (b + d))
                 AS DOUBLE) /
               CAST(greatest(n_docs * n_docs -
                 ((a + b) * (a + c) + (c + d) * (b + d)), 1)
                 AS DOUBLE), 6) AS kappa
      FROM m ORDER BY source""",


    "q367_exposure_histogram" -> """
      WITH tk AS (SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0) AS toks
                  FROM documents),
      sc AS (SELECT doc_id,
                    CAST(len(list_distinct(toks)) AS BIGINT)
                      AS score,
                    CAST(len(toks) AS BIGINT) AS n_tok
             FROM tk),
      r AS (SELECT doc_id, n_tok,
                   row_number() OVER (ORDER BY score, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM sc),
      q AS (SELECT doc_id, n_tok,
                   ((rn - 1) * 4) // n + 1 AS exposure
            FROM r),
      tot AS (SELECT CAST(sum(n_tok * exposure) AS BIGINT) AS ti
              FROM q)
      SELECT CAST(exposure AS BIGINT) AS exposure,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS tok_mass,
             CAST(sum(n_tok) * exposure AS BIGINT) AS n_instances,
             CAST(sum(n_tok) * exposure * 10000 // tot.ti AS BIGINT)
               AS share_bp
      FROM q CROSS JOIN tot GROUP BY exposure, tot.ti
      ORDER BY exposure""",


    "q378_resume_schedule" -> """
      WITH tk AS (SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0) AS toks
                  FROM documents),
      sc AS (SELECT doc_id,
                    CAST(len(list_distinct(toks)) AS BIGINT)
                      AS score,
                    CAST(len(toks) AS BIGINT) AS n_tok
             FROM tk),
      r AS (SELECT doc_id, n_tok,
                   row_number() OVER (ORDER BY score, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM sc),
      q AS (SELECT doc_id, n_tok,
                   ((rn - 1) * 4) // n + 1 AS quart
            FROM r),
      ep AS (SELECT doc_id, n_tok,
                    unnest(generate_series(1, quart)) AS epoch
             FROM q),
      o AS (SELECT doc_id, n_tok, epoch,
                   row_number() OVER (PARTITION BY epoch
                     ORDER BY md5('ep' || CAST(epoch AS VARCHAR) ||
                       ':' || CAST(doc_id AS VARCHAR)), doc_id)
                     AS rk,
                   count(*) OVER (PARTITION BY epoch) AS ne
            FROM ep),
      s AS (SELECT doc_id, n_tok, epoch,
                   (rk - 1) % 8 AS rnk,
                   (rk - 1) // 8 AS step,
                   (ne // 8) // 2 AS cut
            FROM o)
      SELECT CAST(epoch AS BIGINT) AS epoch,
             CAST(rnk AS BIGINT) AS rnk,
             CAST(coalesce(sum(CASE WHEN step < cut THEN 1 END), 0)
               AS BIGINT) AS n_consumed,
             CAST(coalesce(sum(CASE WHEN step >= cut THEN 1 END), 0)
               AS BIGINT) AS n_resumed,
             CAST(coalesce(sum(CASE WHEN step >= cut THEN n_tok END),
               0) AS BIGINT) AS tok_resumed,
             CAST(coalesce(sum(CASE WHEN step >= cut
                 THEN (step + 1) * doc_id END), 0) AS BIGINT)
               AS resume_checksum,
             CAST(coalesce(max(CASE WHEN step = cut THEN doc_id END),
               -1) AS BIGINT) AS next_doc
      FROM s GROUP BY epoch, rnk ORDER BY epoch, rnk""",


    "q379_elastic_reshard" -> """
      WITH tk AS (SELECT doc_id, list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0) AS toks
                  FROM documents),
      sc AS (SELECT doc_id,
                    CAST(len(list_distinct(toks)) AS BIGINT)
                      AS score,
                    CAST(len(toks) AS BIGINT) AS n_tok
             FROM tk),
      r AS (SELECT doc_id, n_tok,
                   row_number() OVER (ORDER BY score, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM sc),
      q AS (SELECT doc_id, n_tok,
                   ((rn - 1) * 4) // n + 1 AS quart
            FROM r),
      ep AS (SELECT doc_id, n_tok,
                    unnest(generate_series(1, quart)) AS epoch
             FROM q),
      o AS (SELECT doc_id, n_tok, epoch,
                   row_number() OVER (PARTITION BY epoch
                     ORDER BY md5('ep' || CAST(epoch AS VARCHAR) ||
                       ':' || CAST(doc_id AS VARCHAR)), doc_id)
                     AS rk,
                   count(*) OVER (PARTITION BY epoch) AS ne
            FROM ep),
      s AS (SELECT doc_id, n_tok, epoch, rk,
                   ((ne // 8) // 3) * 8 AS c
            FROM o),
      p AS (SELECT epoch, doc_id, n_tok,
                   CASE WHEN rk <= c THEN 1 ELSE 2 END AS phase,
                   CASE WHEN rk <= c THEN (rk - 1) % 8
                        ELSE (rk - c - 1) % 12 END AS rnk,
                   CASE WHEN rk <= c THEN (rk - 1) // 8
                        ELSE (rk - c - 1) // 12 END AS step
            FROM s)
      SELECT CAST(epoch AS BIGINT) AS epoch,
             CAST(phase AS BIGINT) AS phase,
             CAST(rnk AS BIGINT) AS rnk,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS tok_sum,
             CAST(sum((step + 1) * doc_id) AS BIGINT)
               AS order_checksum
      FROM p GROUP BY epoch, phase, rnk
      ORDER BY epoch, phase, rnk""",


    "q380_digest_fold" -> """
      WITH base AS (SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT doc_id + 4000000,
                           substring(text, 1,
                             greatest(length(text) - 30, 1))
                    FROM documents WHERE doc_id % 11 = 0),
      h AS (SELECT doc_id % 256 AS shard,
                   CAST(('0x' || substring(md5(text), 1, 7))
                     AS BIGINT) AS h
            FROM base)
      SELECT CAST(shard AS BIGINT) AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(h) % 1000000007 AS BIGINT) AS digest,
             CAST(min(h) AS BIGINT) AS min_h,
             CAST(max(h) AS BIGINT) AS max_h
      FROM h GROUP BY shard ORDER BY shard""",


    "q382_digest_drift" -> """
      WITH v2 AS (SELECT doc_id,
                         CASE WHEN doc_id % 97 = 0
                              THEN text || ' [rev2]' ELSE text END
                           AS text
                  FROM documents),
      h1 AS (SELECT doc_id % 256 AS shard,
                    CAST(('0x' || substring(md5(text), 1, 7))
                      AS BIGINT) AS h
             FROM documents),
      h2 AS (SELECT doc_id % 256 AS shard,
                    CAST(('0x' || substring(md5(text), 1, 7))
                      AS BIGINT) AS h
             FROM v2),
      d1 AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(h) % 1000000007 AS BIGINT) AS digest_v1
             FROM h1 GROUP BY shard),
      d2 AS (SELECT shard,
                    CAST(sum(h) % 1000000007 AS BIGINT) AS digest_v2
             FROM h2 GROUP BY shard)
      SELECT CAST(d1.shard AS BIGINT) AS shard, n_docs,
             digest_v1, digest_v2
      FROM d1 JOIN d2 ON d1.shard = d2.shard
      WHERE digest_v1 <> digest_v2
      ORDER BY 1""",


    "q383_stratified_eval" -> """
      WITH tk AS (SELECT doc_id, source,
                         CAST(len(list_filter(string_split_regex(
                           lower(trim(text)), '\s+'),
                           x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      st AS (SELECT doc_id, source,
                    least(n_tok // 16, 4) AS len_b
             FROM tk),
      c AS (SELECT source, len_b, CAST(count(*) AS BIGINT) AS n_docs
            FROM st GROUP BY 1, 2),
      t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
                   CAST(sum(n_docs) // 50 AS BIGINT) AS e
            FROM c),
      f AS (SELECT source, len_b, n_docs, nn, e,
                   (e * n_docs) // nn AS fl,
                   (e * n_docs) % nn AS rem
            FROM c CROSS JOIN t),
      r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source,
                   len_b) AS rr
            FROM f),
      s AS (SELECT CAST(sum(fl) AS BIGINT) AS sfl FROM f),
      a AS (SELECT source, len_b, n_docs,
                   CAST(fl + (CASE WHEN rr <= e - sfl THEN 1 ELSE 0
                     END) AS BIGINT) AS alloc
            FROM r CROSS JOIN s),
      hh AS (SELECT doc_id, source, len_b,
                    md5('strat:' || CAST(doc_id AS VARCHAR)) AS h
             FROM st),
      o AS (SELECT doc_id, source, len_b,
                   row_number() OVER (PARTITION BY source, len_b
                     ORDER BY h, doc_id) AS rk
            FROM hh),
      sel AS (SELECT o.source, o.len_b,
                     CAST(count(*) AS BIGINT) AS n_selected,
                     CAST(sum(doc_id) AS BIGINT) AS sel_checksum
              FROM o JOIN a ON o.source = a.source
                AND o.len_b = a.len_b
              WHERE rk <= alloc GROUP BY 1, 2)
      SELECT a.source, CAST(a.len_b AS BIGINT) AS len_b, a.n_docs,
             a.alloc,
             coalesce(sel.n_selected, 0) AS n_selected,
             coalesce(sel.sel_checksum, 0) AS sel_checksum
      FROM a LEFT JOIN sel ON a.source = sel.source
        AND a.len_b = sel.len_b
      ORDER BY a.source, a.len_b""",


    "q385_snake_balance" -> """
      WITH tk AS (SELECT doc_id,
                         CAST(len(list_filter(string_split_regex(
                           lower(trim(text)), '\s+'),
                           x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      sh AS (SELECT doc_id % 256 AS shard,
                    CAST(sum(n_tok) AS BIGINT) AS mass
             FROM tk GROUP BY 1),
      t AS (SELECT CAST(sum(mass) AS BIGINT) AS tot FROM sh),
      r AS (SELECT shard, mass,
                   row_number() OVER (ORDER BY mass DESC, shard)
                     AS rr
            FROM sh),
      a AS (SELECT shard, mass,
                   CASE WHEN ((rr - 1) // 8) % 2 = 0
                        THEN (rr - 1) % 8
                        ELSE 7 - ((rr - 1) % 8) END AS sw,
                   shard % 8 AS mw
            FROM r),
      u AS (SELECT 'snake' AS policy, sw AS worker,
                   CAST(count(*) AS BIGINT) AS n_shards,
                   CAST(sum(mass) AS BIGINT) AS mass
            FROM a GROUP BY 1, 2
            UNION ALL
            SELECT 'modulo', mw,
                   CAST(count(*) AS BIGINT),
                   CAST(sum(mass) AS BIGINT)
            FROM a GROUP BY 1, 2)
      SELECT policy, CAST(worker AS BIGINT) AS worker, n_shards,
             mass,
             CAST(mass * 10000 // tot AS BIGINT) AS share_bp
      FROM u CROSS JOIN t ORDER BY policy, worker""",


    "q386_batch_diversity" -> """
      WITH d AS (SELECT doc_id, source FROM documents),
      g AS (SELECT source,
                   row_number() OVER (ORDER BY source, doc_id) AS rk
            FROM d),
      s AS (SELECT source,
                   row_number() OVER (ORDER BY
                     md5('shuf:' || CAST(doc_id AS VARCHAR)),
                     doc_id) AS rk
            FROM d),
      cg AS (SELECT (rk - 1) // 32 AS batch,
                    count(DISTINCT source) AS n_src
             FROM g GROUP BY 1),
      cs AS (SELECT (rk - 1) // 32 AS batch,
                    count(DISTINCT source) AS n_src
             FROM s GROUP BY 1),
      u AS (SELECT 'grouped' AS policy, n_src,
                   CAST(count(*) AS BIGINT) AS n_batches
            FROM cg GROUP BY 1, 2
            UNION ALL
            SELECT 'shuffled', n_src, CAST(count(*) AS BIGINT)
            FROM cs GROUP BY 1, 2)
      SELECT policy, CAST(n_src AS BIGINT) AS n_src, n_batches
      FROM u ORDER BY policy, n_src""",


    "q387_seed_overlap" -> """
      WITH d AS (SELECT doc_id FROM documents),
      b1 AS (SELECT doc_id, (row_number() OVER (ORDER BY
               md5('sh1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1)
               // 32 AS batch FROM d),
      b2 AS (SELECT doc_id, (row_number() OVER (ORDER BY
               md5('sh2:' || CAST(doc_id AS VARCHAR)), doc_id) - 1)
               // 32 AS batch FROM d),
      b3 AS (SELECT doc_id, (row_number() OVER (ORDER BY
               md5('sh3:' || CAST(doc_id AS VARCHAR)), doc_id) - 1)
               // 32 AS batch FROM d),
      p1 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM b1 a JOIN b1 b
               ON a.batch = b.batch AND a.doc_id < b.doc_id),
      p2 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM b2 a JOIN b2 b
               ON a.batch = b.batch AND a.doc_id < b.doc_id),
      p3 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM b3 a JOIN b3 b
               ON a.batch = b.batch AND a.doc_id < b.doc_id),
      np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM p1),
      u AS (SELECT 1 AS sa, 2 AS sb,
                   CAST(count(*) AS BIGINT) AS ns
            FROM p1 JOIN p2 USING (id_a, id_b)
            UNION ALL
            SELECT 1, 3, CAST(count(*) AS BIGINT)
            FROM p1 JOIN p3 USING (id_a, id_b)
            UNION ALL
            SELECT 2, 3, CAST(count(*) AS BIGINT)
            FROM p2 JOIN p3 USING (id_a, id_b))
      SELECT CAST(sa AS BIGINT) AS seed_a,
             CAST(sb AS BIGINT) AS seed_b,
             np.n_pairs,
             ns AS n_shared,
             CAST(ns * 10000 // np.n_pairs AS BIGINT) AS shared_bp
      FROM u CROSS JOIN np ORDER BY seed_a, seed_b""",


    "q388_source_cap" -> """
      WITH tk AS (SELECT doc_id, source, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      r AS (SELECT doc_id, source, n_tok,
                   row_number() OVER (PARTITION BY source ORDER BY
                     md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id)
                     AS rk
            FROM tk),
      p AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS tok_total,
                   CAST(coalesce(sum(CASE WHEN rk <= 15 THEN 1 END),
                     0) AS BIGINT) AS n_kept,
                   CAST(coalesce(sum(CASE WHEN rk <= 15 THEN n_tok
                     END), 0) AS BIGINT) AS tok_kept,
                   CAST(coalesce(sum(CASE WHEN rk <= 15 THEN doc_id
                     END), 0) AS BIGINT) AS kept_checksum
            FROM r GROUP BY 1),
      t AS (SELECT sum(tok_total) AS tt, sum(tok_kept) AS tk FROM p)
      SELECT source, n_docs, n_kept, tok_total, tok_kept,
             kept_checksum,
             CAST(tok_total * 10000 // t.tt AS BIGINT)
               AS raw_share_bp,
             CAST(tok_kept * 10000 // t.tk AS BIGINT)
               AS cap_share_bp
      FROM p CROSS JOIN t ORDER BY source""",


    "q389_cap_fold" -> """
      WITH tk AS (SELECT doc_id, source, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      r AS (SELECT doc_id, source, n_tok,
                   row_number() OVER (PARTITION BY source ORDER BY
                     md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id)
                     AS rk
            FROM tk)
      SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(n_tok) AS BIGINT) AS tok_kept,
             CAST(sum(doc_id) AS BIGINT) AS kept_checksum
      FROM r WHERE rk <= 15 GROUP BY 1 ORDER BY source""",


    "q390_triplet_margin" -> tripletCensusSql,

    // identical single-pass rebuild: the hash match is the fold proof
    "q394_triplet_fold" -> tripletCensusSql,
  ) ++ oracleSqlB

  /** The brute-over-buckets triplet census — q390's oracle, and (by
    * the argmax selection monoid) also q394's: the fold must land on
    * exactly this single-pass answer. */
  private lazy val tripletCensusSql: String = """
      WITH e AS (SELECT vec_id, label,
                        CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      nb AS (SELECT greatest(16, count(*) // 32) AS b
             FROM embeddings),
      a AS (SELECT vec_id AS aid, label AS alab, v AS av,
                   CAST(('0x' || substring(md5('tri:' ||
                     CAST(vec_id AS VARCHAR)), 1, 4)) AS BIGINT)
                     % nb.b AS bucket
            FROM e CROSS JOIN nb WHERE vec_id % 4 = 0),
      c AS (SELECT vec_id AS cid, label AS clab, v AS cv,
                   CAST(('0x' || substring(md5('tri:' ||
                     CAST(vec_id AS VARCHAR)), 1, 4)) AS BIGINT)
                     % nb.b AS bucket
            FROM e CROSS JOIN nb WHERE vec_id % 4 <> 0),
      s AS (SELECT aid, alab, cid, clab,
                   list_cosine_similarity(av, cv) AS cos
            FROM a JOIN c USING (bucket)),
      p AS (SELECT aid, alab, cid, cos,
                   row_number() OVER (PARTITION BY aid
                     ORDER BY cos DESC, cid) AS rn
            FROM s WHERE clab = alab),
      n AS (SELECT aid, cid, cos,
                   row_number() OVER (PARTITION BY aid
                     ORDER BY cos DESC, cid) AS rn
            FROM s WHERE clab <> alab),
      t AS (SELECT p.aid, p.alab, p.cid AS pos_id, n.cid AS neg_id,
                   p.cos - n.cos AS margin
            FROM p JOIN n ON p.aid = n.aid
            WHERE p.rn = 1 AND n.rn = 1)
      SELECT CAST(alab AS BIGINT) AS label,
             CAST(count(*) AS BIGINT) AS n_triplets,
             CAST(coalesce(sum(CASE WHEN margin < 0 THEN 1 END), 0)
               AS BIGINT) AS n_inverted,
             CAST(coalesce(sum(CASE WHEN margin < 0.2 THEN 1 END),
               0) AS BIGINT) AS n_hard,
             CAST(sum(aid) AS BIGINT) AS aid_checksum,
             CAST(sum(pos_id) AS BIGINT) AS pos_checksum,
             CAST(sum(neg_id) AS BIGINT) AS neg_checksum,
             round(min(margin), 6) AS min_margin,
             round(max(margin), 6) AS max_margin
      FROM t GROUP BY 1 ORDER BY label"""

  /** Continuation of [[oracleSql]] (split around the shared
    * [[tripletCensusSql]] val). */
  private def oracleSqlB: Map[String, String] = Map(

    "q402_chunk_provenance" -> """
      WITH tk AS (SELECT doc_id, source, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      d AS (SELECT doc_id, source, n_tok FROM tk WHERE n_tok > 0),
      c AS (SELECT doc_id, source, n_tok,
                   sum(n_tok) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
            FROM d),
      sp AS (SELECT doc_id, source,
                    CAST(cum - n_tok AS BIGINT) AS s,
                    CAST(cum - 1 AS BIGINT) AS e FROM c),
      ch AS (SELECT doc_id, source,
                    unnest(generate_series(s // 512, e // 512))
                      AS chunk
             FROM sp),
      per AS (SELECT chunk,
                     CAST(count(DISTINCT source) AS BIGINT)
                       AS n_sources,
                     CAST(count(*) AS BIGINT) AS n_docs
              FROM ch GROUP BY 1),
      t AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM per)
      SELECT n_sources, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(n_docs) AS BIGINT) AS doc_slots,
             CAST(count(*) * 10000 // max(t.tt) AS BIGINT)
               AS share_bp
      FROM per CROSS JOIN t GROUP BY 1 ORDER BY n_sources""",

    "q401_order_covariate" -> s"""
      WITH $q97ScorePrefixSql,
      o AS (SELECT doc_id, score,
                   row_number() OVER (ORDER BY
                     md5('ord:' || CAST(doc_id AS VARCHAR)), doc_id)
                     AS ork,
                   row_number() OVER (ORDER BY score DESC, doc_id)
                     AS qrk,
                   count(*) OVER () AS n
            FROM s),
      q AS (SELECT doc_id,
                   (ork - 1) * 4 // n AS order_q,
                   (qrk - 1) * 4 // n AS quality_q,
                   n
            FROM o)
      SELECT CAST(order_q AS BIGINT) AS order_q,
             CAST(quality_q AS BIGINT) AS quality_q,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) * 10000 // max(n) AS BIGINT) AS share_bp,
             CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM q GROUP BY 1, 2 ORDER BY order_q, quality_q""",

    "q400_dedup_retract" -> """
      WITH RECURSIVE
      base AS (SELECT doc_id, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000,
                      substring(text, 1,
                        greatest(length(text) - 20, 1))
               FROM documents WHERE doc_id % 3 = 0),
      tk AS (SELECT doc_id, list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> length(x) > 0) AS toks FROM base),
      sh AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                      list_distinct(list_transform(
                        generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' '
                          || toks[i+2]))
                    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                    ELSE [] END AS s
             FROM tk),
      ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
      keep AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) <= 16),
      ex AS (SELECT doc_id, ex0.g FROM ex0 JOIN keep USING (g)),
      sz AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS ns
                FROM ex a JOIN ex b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      p0 AS (SELECT i.id_a, i.id_b
             FROM inter i
             JOIN sz sa ON sa.doc_id = i.id_a
             JOIN sz sb ON sb.doc_id = i.id_b
             WHERE round(CAST(i.ns AS DOUBLE)
               / (sa.sz + sb.sz - i.ns), 6) >= 0.5),
      e0 AS (SELECT id_a AS x, id_b AS y FROM p0
             UNION ALL SELECT id_b, id_a FROM p0),
      r0 AS (SELECT x AS id, x AS rr FROM e0
             UNION
             SELECT e0.x, r0.rr FROM e0 JOIN r0 ON e0.y = r0.id),
      c0 AS (SELECT id, min(rr) AS comp FROM r0 GROUP BY id),
      pd AS (SELECT id_a, id_b FROM p0
             WHERE id_a % 10 <> 0 AND id_b % 10 <> 0),
      ed AS (SELECT id_a AS x, id_b AS y FROM pd
             UNION ALL SELECT id_b, id_a FROM pd),
      rd AS (SELECT x AS id, x AS rr FROM ed
             UNION
             SELECT ed.x, rd.rr FROM ed JOIN rd ON ed.y = rd.id),
      cd AS (SELECT id, min(rr) AS comp FROM rd GROUP BY id),
      kb AS (SELECT CAST((SELECT count(*) FROM p0) AS BIGINT)
                      AS n_pairs_before,
                    CAST(count(DISTINCT comp) AS BIGINT)
                      AS n_clusters_before,
                    CAST(count(*) - count(DISTINCT comp) AS BIGINT)
                      AS n_removable_before
             FROM c0),
      ka AS (SELECT CAST((SELECT count(*) FROM pd) AS BIGINT)
                      AS n_pairs_after,
                    CAST(count(DISTINCT comp) AS BIGINT)
                      AS n_clusters_after,
                    CAST(count(*) - count(DISTINCT comp) AS BIGINT)
                      AS n_removable_after
             FROM cd),
      m AS (SELECT c0.comp, cd.comp AS comp2
            FROM c0 JOIN cd USING (id)
            WHERE c0.id % 10 <> 0),
      sp AS (SELECT CAST(count(*) AS BIGINT) AS n_split_components
             FROM (SELECT comp FROM m GROUP BY comp
                   HAVING count(DISTINCT comp2) >= 2))
      SELECT n_pairs_before, n_pairs_after, n_clusters_before,
             n_clusters_after, n_removable_before,
             n_removable_after, n_split_components
      FROM kb CROSS JOIN ka CROSS JOIN sp""",

    "q399_drop_attribution" -> s"""
      WITH $q97ScorePrefixSql,
      tk AS (SELECT doc_id, source, lang, text, CAST(len(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0)) AS BIGINT) AS n_tok,
                   md5(text) AS th
             FROM documents),
      fam AS (SELECT th, min(doc_id) AS keeper,
                     CAST(count(*) AS BIGINT) AS fam
              FROM tk GROUP BY 1),
      j AS (SELECT tk.doc_id, tk.source, tk.lang, tk.n_tok,
                   s.score, fam.keeper, fam.fam
            FROM tk JOIN s USING (doc_id) JOIN fam USING (th)),
      mm AS (SELECT source,
                    (CASE WHEN score < 0.5 THEN 1 ELSE 0 END) +
                    (CASE WHEN n_tok < 20 THEN 2 ELSE 0 END) +
                    (CASE WHEN fam > 1 AND doc_id <> keeper
                      THEN 4 ELSE 0 END) +
                    (CASE WHEN lang <> 'en' THEN 8 ELSE 0 END)
                      AS mask,
                    n_tok, doc_id
             FROM j)
      SELECT source, CAST(mask AS BIGINT) AS mask,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS tok,
             CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM mm GROUP BY 1, 2 ORDER BY source, mask""",

    "q398_fim_census" -> """
      WITH tk AS (SELECT doc_id, source, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      c AS (SELECT doc_id, source, n_tok,
                   (n_tok >= 8 AND
                    CAST(('0x' || substring(md5('fim:' ||
                      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                      % 2 = 0) AS fim,
                   CAST(('0x' || substring(md5('fim1:' ||
                     CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % (n_tok + 1) AS u1,
                   CAST(('0x' || substring(md5('fim2:' ||
                     CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % (n_tok + 1) AS u2,
                   CAST(('0x' || substring(md5('fim3:' ||
                     CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 2 AS mbit
            FROM tk),
      m AS (SELECT doc_id, source, n_tok, fim,
                   least(u1, u2) AS p1, greatest(u1, u2) AS p2,
                   CASE WHEN NOT fim THEN 'ar'
                        WHEN mbit = 0 THEN 'psm'
                        ELSE 'spm' END AS mode
            FROM c)
      SELECT source, mode, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(coalesce(sum(CASE WHEN fim THEN p1
               ELSE n_tok END), 0) AS BIGINT) AS tok_prefix,
             CAST(coalesce(sum(CASE WHEN fim THEN p2 - p1
               ELSE 0 END), 0) AS BIGINT) AS tok_middle,
             CAST(coalesce(sum(CASE WHEN fim THEN n_tok - p2
               ELSE 0 END), 0) AS BIGINT) AS tok_suffix,
             CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM m GROUP BY 1, 2 ORDER BY source, mode""",

    "q397_hier_mixture" -> s"""
      WITH tk AS (SELECT doc_id, source, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      sc AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS sz_tok,
                    'd' || CAST(CAST(('0x' || substring(md5('dom:' ||
                      source), 1, 4)) AS BIGINT) % 4 AS VARCHAR)
                      AS domain
             FROM tk GROUP BY source),
      dsrc AS (SELECT domain AS source,
                      CAST(sum(sz_tok) AS BIGINT) AS dz
               FROM sc GROUP BY 1),
      ${unimaxAllocSql("dsrc", "dz", "dom_alloc", "u")},
      da AS (SELECT source AS domain, dom_alloc FROM ua),
      o AS (SELECT sc.source, sc.domain, sc.sz_tok, da.dom_alloc,
                   row_number() OVER (PARTITION BY sc.domain
                     ORDER BY sc.sz_tok, sc.source) AS rn,
                   sum(sc.sz_tok) OVER (PARTITION BY sc.domain
                     ORDER BY sc.sz_tok, sc.source
                     ROWS UNBOUNDED PRECEDING) AS cum,
                   count(*) OVER (PARTITION BY sc.domain) AS n_d
            FROM sc JOIN da USING (domain)),
      f AS (SELECT *, (sz_tok * (n_d - rn + 1) <=
                       dom_alloc - (cum - sz_tok)) AS raw
            FROM o),
      fx AS (SELECT domain, coalesce(min(CASE WHEN NOT raw THEN rn
                      END), max(n_d) + 1) AS ff
             FROM f GROUP BY 1),
      cx AS (SELECT f.domain, fx.ff,
                    coalesce(max(CASE WHEN f.rn = fx.ff - 1
                      THEN f.cum END), 0) AS cumk
             FROM f JOIN fx USING (domain) GROUP BY 1, 2),
      p AS (SELECT f.source, f.domain, f.sz_tok, f.dom_alloc, f.rn,
                   cx.ff, f.dom_alloc - cx.cumk AS rem,
                   f.n_d - (cx.ff - 1) AS lft
            FROM f JOIN cx USING (domain))
      SELECT source, domain, sz_tok, dom_alloc,
             CAST(CASE WHEN rn < ff THEN sz_tok
                  ELSE (rem // lft) + (CASE WHEN rn - (ff - 1) <=
                    (rem % lft) THEN 1 ELSE 0 END)
             END AS BIGINT) AS alloc_tok
      FROM p ORDER BY source""",

    "q396_quality_tertiles" -> s"""
      WITH $q97ScorePrefixSql,
      tk AS (SELECT doc_id, source, CAST(len(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               x -> length(x) > 0)) AS BIGINT) AS n_tok
             FROM documents),
      j AS (SELECT tk.doc_id, tk.source, tk.n_tok, s.score
            FROM tk JOIN s USING (doc_id)),
      r AS (SELECT *,
                   row_number() OVER (PARTITION BY source
                     ORDER BY score DESC, doc_id) AS rk,
                   count(*) OVER (PARTITION BY source) AS n
            FROM j),
      g AS (SELECT source, (rk - 1) * 3 // n AS bucket, n_tok,
                   doc_id, score
            FROM r)
      SELECT source, CAST(bucket AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS tok,
             CAST(sum(doc_id) AS BIGINT) AS id_checksum,
             round(min(score), 6) AS min_score,
             round(max(score), 6) AS max_score
      FROM g GROUP BY 1, 2 ORDER BY source, bucket""",

    "q395_takedown" -> """
      WITH tk AS (SELECT doc_id, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      d AS (SELECT doc_id, n_tok FROM tk WHERE n_tok > 0),
      c AS (SELECT doc_id, n_tok,
                   sum(n_tok) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
            FROM d),
      sp AS (SELECT doc_id, n_tok, CAST(cum - n_tok AS BIGINT) AS s,
                    CAST(cum - 1 AS BIGINT) AS e FROM c),
      del AS (SELECT * FROM sp WHERE doc_id % 97 = 0),
      tch AS (SELECT DISTINCT unnest(generate_series(
                s // 512, e // 512)) AS chunk FROM del),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                   CAST(max(e) // 512 + 1 AS BIGINT) AS n_chunks
            FROM sp),
      da AS (SELECT CAST(count(*) AS BIGINT) AS n_deleted,
                    CAST(coalesce(sum(n_tok), 0) AS BIGINT)
                      AS tok_deleted FROM del),
      ta AS (SELECT CAST(count(*) AS BIGINT) AS n_affected_chunks,
                    CAST(min(chunk) AS BIGINT) AS first_affected
             FROM tch)
      SELECT n_docs, n_deleted, n_tokens, tok_deleted, n_chunks,
             n_affected_chunks,
             CAST(n_affected_chunks * 10000 // n_chunks AS BIGINT)
               AS affected_bp,
             first_affected,
             CAST(n_chunks - first_affected AS BIGINT)
               AS repack_tail_chunks
      FROM t CROSS JOIN da CROSS JOIN ta""",

    "q391_span_corruption" -> """
      WITH tk AS (SELECT doc_id, source, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      d AS (SELECT * FROM tk WHERE n_tok > 0),
      b AS (SELECT doc_id, source, n_tok,
                   unnest(generate_series(0, (n_tok - 1) // 3)) AS j
            FROM d),
      m AS (SELECT source, doc_id,
                   least(3, n_tok - j * 3) AS blk_tok,
                   (CAST(('0x' || substring(md5('sc:' ||
                      CAST(doc_id AS VARCHAR) || ':' ||
                      CAST(j AS VARCHAR)), 1, 4)) AS INTEGER)
                      % 20 = 0) AS masked
            FROM b),
      g AS (SELECT source,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(sum(blk_tok) AS BIGINT) AS n_tokens,
                   CAST(coalesce(sum(CASE WHEN masked THEN blk_tok
                     END), 0) AS BIGINT) AS n_masked,
                   CAST(coalesce(sum(CASE WHEN masked THEN 1 END),
                     0) AS BIGINT) AS n_spans
            FROM m GROUP BY 1)
      SELECT source, n_docs, n_tokens, n_masked, n_spans,
             CAST(n_masked * 10000 // n_tokens AS BIGINT)
               AS masked_bp,
             CAST(n_tokens - n_masked + n_spans AS BIGINT)
               AS enc_len,
             CAST(n_masked + n_spans AS BIGINT) AS dec_len
      FROM g ORDER BY source""",


    "q392_cap_mixture" -> s"""
      WITH tk AS (SELECT doc_id, source, CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\\s+'),
                    x -> length(x) > 0)) AS BIGINT) AS n_tok
                  FROM documents),
      rk AS (SELECT doc_id, source, n_tok,
                    row_number() OVER (PARTITION BY source ORDER BY
                      md5('cap:' || CAST(doc_id AS VARCHAR)),
                      doc_id) AS rk
             FROM tk),
      rsrc AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS sz_tok
               FROM tk GROUP BY 1),
      csrc AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS sz_tok
               FROM rk WHERE rk <= 15 GROUP BY 1),
      ${unimaxAllocSql("rsrc", "sz_tok", "raw_alloc", "u")},
      ${unimaxAllocSql("csrc", "sz_tok", "cap_alloc", "v")}
      SELECT ua.source, ua.sz_tok AS raw_tok, ua.raw_alloc,
             va.sz_tok AS cap_tok, va.cap_alloc,
             CAST(va.cap_alloc - ua.raw_alloc AS BIGINT)
               AS alloc_delta
      FROM ua JOIN va USING (source) ORDER BY source"""
  )
}
