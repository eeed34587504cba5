package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the steps between "cleaned documents"
  * and "training shards" in an LLM data pipeline: sequence packing,
  * eval-set decontamination, repetition-based quality filtering, and
  * domain-mixture reweighting. (The reference engine has no pipeline
  * layer; these are the driver-mandated training-data extensions,
  * same family as [[TextDedup]] / [[TextAnalysis]].)
  *
  * All deterministic: results are pure functions of the data, never of
  * partitioning, sampling, or run order — the property that makes a
  * 100 TB corpus build reproducible.
  */
object CorpusOps {

  /** Sliding-window document chunking — the step between "cleaned
    * document" and "model-sized training sample": split each document
    * into windows of `maxTokens` tokens advancing by
    * maxTokens − overlap, so consecutive chunks share `overlap` tokens
    * of context (the standard long-document preprocessing for a
    * fixed-context model; chunk counts are pure integer arithmetic,
    * portable to the oracle). A document of ≤ maxTokens tokens yields
    * exactly one chunk. Map-side generator explode — one scan, no
    * shuffle, output rows carry (doc_id, chunk_id, n_chunk_tokens,
    * chunk_text). Pair with [[packSequences]] downstream to pack the
    * chunks into training shards. */
  def chunkDocuments(docs: DataFrame, maxTokens: Int = 512,
                     overlap: Int = 64): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val w = TextAnalysis.tokens(col("text"))
    graft.Engine.fanOut(docs)
      .select(col("doc_id"), w.as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      // smallest c with c*stride + overlap >= n, floored at 1
      .withColumn("n_chunks",
        greatest(lit(1L), expr(s"(n - $overlap + $stride - 1) div $stride")))
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(maxTokens.toLong), col("n") - col("chunk_id") * stride)
          .as("n_chunk_tokens"),
        array_join(slice(col("w"), (col("chunk_id") * stride + 1).cast("int"),
          lit(maxTokens)), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Greedy contiguous sequence packing: documents in doc_id order are
    * concatenated into fixed-size token shards; a document's shard is
    * `floor(exclusive_prefix_sum(n_tokens) / budget)` — i.e. the shard
    * whose window its first token falls in (long docs spill into the
    * next shard, the standard "document boundary straddles a sequence"
    * case the attention mask handles downstream).
    *
    * Scale shape: the textbook two-pass distributed prefix sum, with
    * ranges keyed by VALUE, not by physical partition — buckets are
    * `(doc_id - min) div width` computed from one tiny (min, max)
    * metadata job, so both passes agree on the bucket of every row by
    * construction. No `spark_partition_id()`, no `localCheckpoint`
    * pinning: the plan is pure lineage (an executor loss recomputes
    * instead of failing the job) and survives any AQE re-plan. Pass 1
    * aggregates per-bucket token subtotals (≤ `parts` rows); exclusive
    * offsets come from a window over that driver-scale frame; pass 2
    * broadcast-joins the offsets back and cumsums within each bucket.
    * Nothing wider than (doc_id, n_tokens) ever shuffles and no data
    * path touches the driver. Skewed doc_id ranges skew bucket sizes
    * the same way repartitionByRange boundaries would — harmless for
    * the window, which streams its frame. */
  def packSequences(docs: DataFrame, budget: Long, parts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val ids = docs.agg(min(col("doc_id")).cast("long"),
      max(col("doc_id")).cast("long")).first()
    if (ids.isNullAt(0))
      return docs.sparkSession.emptyDataFrame
        .withColumn("doc_id", lit(0L)).withColumn("n_tokens", lit(0L))
        .withColumn("seq_id", lit(0L))
    val lo = ids.getLong(0)
    val width = math.max(1L, (ids.getLong(1) - lo) / p + 1)
    val toks = docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bk", expr(s"(doc_id - ${lo}L) div ${width}L"))
    val offs = toks.groupBy("bk").agg(sum("n_tokens").as("psum"))
      .withColumn("off", coalesce(
        sum("psum").over(
          Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bk", "off")
    val w = Window.partitionBy("bk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(offs), "bk")
      .withColumn("start_tok", col("off") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start_tok div $budget").as("seq_id"))
      .orderBy("doc_id")
  }

  /** Hash modulus for [[shuffleRank]] — prime, so the multiplicative
    * hash scatters residues evenly. */
  private val ShuffleMod = 9999991L

  /** Deterministic global corpus shuffle: a dense permutation rank
    * (0..N−1) over a Knuth multiplicative hash of doc_id — the
    * "shuffle example order before sharding" step every training
    * pipeline needs so each shard is an i.i.d. sample of the corpus
    * rather than a contiguous slice of it. `ORDER BY rand()` is
    * neither reproducible nor retry-stable; this is both: the rank is
    * a pure function of (doc_id, seed), so re-running — or recomputing
    * a lost partition — lands every document in the same place.
    *
    * Scale shape: the same value-keyed two-pass rank as
    * [[packSequences]] — bucket by hash range, count per bucket (≤
    * `parts` rows through the driver-scale offsets frame), then
    * row_number within each bucket plus the bucket's exclusive offset.
    * No single-partition global sort, no `spark_partition_id()`, pure
    * lineage. The hash masks doc_id to 2^20 before the multiply (the
    * [[resampleToMix]] overflow convention, portable to any engine's
    * int64); ids congruent mod 2^20 tie on the hash and fall back to
    * doc_id order — harmless until a single hash residue holds >10⁶
    * documents, and the tiebreak keeps the permutation total either
    * way. */
  def shuffleRank(docs: DataFrame, seed: Long = 0L, parts: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val width = ShuffleMod / p + 1
    val keyed = graft.Engine.fanOut(docs).select(col("doc_id"),
      expr(s"pmod(pmod(doc_id + ${seed}L, 1048576) * 2654435761, ${ShuffleMod}L)").as("h"))
      .withColumn("bk", expr(s"h div ${width}L"))
    val offs = keyed.groupBy("bk").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(
        sum("cnt").over(
          Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bk", "off")
    val w = Window.partitionBy("bk").orderBy("h", "doc_id")
    keyed.join(broadcast(offs), "bk")
      .withColumn("shuffle_rank",
        col("off") + row_number().over(w).cast("long") - 1L)
      .select("doc_id", "shuffle_rank")
  }

  /** [[shuffleRank]] ∘ [[packSequences]]: pack documents into
    * fixed-budget training sequences in SHUFFLED order — the actual
    * shard-assembly composition (shuffle first, then pack, then
    * [[writeShards]]-style partitioning by seq_id group). The dense
    * rank feeds packSequences as its ordering id, which also makes its
    * range buckets perfectly even regardless of doc_id skew.
    *
    * EAGER: constructing this frame runs one Spark job — the rank
    * frame materializes at call time (checkpoint, or localCheckpoint
    * when no checkpoint dir is configured) so the rank is computed
    * exactly once however many downstream actions read it. With only
    * a localCheckpoint, the materialized blocks do NOT survive
    * executor loss — configure `sparkContext.setCheckpointDir` for a
    * retry-durable pipeline (same caveat as TextDedup.materialize). */
  def packShuffled(docs: DataFrame, budget: Long, seed: Long = 0L): DataFrame = {
    // The rank frame is referenced twice (pack ordering + the
    // doc_id↔rank map); materialize it ONCE — 16 bytes/row — so the
    // corpus keys are scanned and window-ranked a single time. With a
    // session checkpoint dir configured the blocks are durable
    // (multi-hour 100 TB builds); without one, executor-local.
    val rank = TextDedup.materialize(shuffleRank(docs, seed), eager = true)
    val packed = packSequences(
      docs.join(rank, "doc_id")
        .select(col("shuffle_rank").as("doc_id"), col("text")), budget)
      .withColumnRenamed("doc_id", "shuffle_rank")
    packed.join(rank, "shuffle_rank")
      .select("doc_id", "shuffle_rank", "n_tokens", "seq_id")
      .orderBy("shuffle_rank")
  }

  /** Eval-set decontamination: drop every training document that
    * shares at least one word k-gram with any document in `evalSet`
    * (the GPT-3/PaLM n-gram-overlap rule). Returns the CLEAN training
    * doc_ids.
    *
    * Plan: both sides reduce to 64-bit k-gram hashes map-side
    * ([[TextDedup.shingleHashes]]); the eval side collapses to its
    * distinct grams and is broadcast EXPLICITLY (eval sets are tiny
    * next to the corpus, but after explode+distinct Catalyst's size
    * estimate is unreliable — without the hint a mis-estimate
    * sort-merge-joins, shuffling the entire corpus's exploded k-gram
    * stream); contaminated ids come from one semi-join-shaped
    * equi-join, clean ids from one anti-join. The corpus is scanned
    * once, nothing about it shuffles except doc_ids, and a hot gram
    * costs only linear output (at most one row per matching train doc,
    * absorbed by the map-side-combined distinct) — there is no f²
    * candidate blowup to cap here, unlike the similarity joins.
    *
    * Matching is on 64-bit gram hashes rather than exact strings: a
    * train/eval hash collision falsely drops a clean training doc
    * (safe direction — over-removal never contaminates; expect ~1
    * false drop per 10^9 distinct eval grams × 10^10 train grams /
    * 2^64). */
  def decontaminate(train: DataFrame, evalSet: DataFrame, k: Int = 10): DataFrame = {
    val trainG = graft.Engine.fanOut(train)
      .select(col("doc_id"),
        explode(TextDedup.shingleHashes(col("text"), k)).as("g"))
    val evalG = evalSet
      .select(explode(TextDedup.shingleHashes(col("text"), k)).as("g"))
      .distinct()
    val contaminated = trainG.join(broadcast(evalG), "g").select("doc_id").distinct()
    train.select("doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** Materialize TRAINING SHARDS — the last step of the corpus build:
    * documents land in `dir` partitioned by shard, where a shard is
    * `seqsPerShard` consecutive packed sequences (so each shard holds
    * ≈ seqsPerShard × seqLen tokens, the unit a data loader streams).
    * The assignment is [[packSequences]]' value-keyed prefix sum — a
    * pure function of the corpus, so a re-run writes byte-identical
    * shard membership (auditable, resumable); the write is an ordinary
    * partitioned parquet write, so shard pruning (read shard K only)
    * is Spark's own PartitionFilters at load time.
    *
    * `shuffleSeed` packs in [[shuffleRank]] order instead of doc_id
    * order, so each shard is an i.i.d. sample of the corpus rather
    * than a contiguous doc_id slice — still a pure function of
    * (corpus, seed), so every determinism property above holds. */
  def writeShards(docs: DataFrame, dir: String, seqLen: Long = 4096,
                  seqsPerShard: Long = 64,
                  shuffleSeed: Option[Long] = None): Unit = {
    val packed = shuffleSeed match {
      case Some(s) => packShuffled(docs, seqLen, s)
        .select("doc_id", "n_tokens", "seq_id")
      case None => packSequences(docs, seqLen)
    }
    val assigned = packed
      .withColumn("shard_id", expr(s"seq_id div ${seqsPerShard}L"))
      .select("doc_id", "n_tokens", "seq_id", "shard_id")
    docs.join(assigned, "doc_id")
      .write.mode("overwrite").partitionBy("shard_id").parquet(dir)
  }

  /** Deterministic train/val/test split assignment: `weights` are
    * (label, integer percent) summing to 100; each doc lands in the
    * label whose cumulative range contains its hash bucket. The bucket
    * is the house PORTABLE multiplicative hash of doc_id (the
    * q_sample/q_stratified/shuffleRank convention — overflow-proof
    * integer arithmetic any engine reproduces), so membership is a
    * pure function of doc_id: stable under retries, partitioning, AQE,
    * and re-runs on a grown corpus (old docs never migrate splits —
    * the property eval reproducibility depends on). Zero exchanges:
    * the assignment is one codegen'd projection. */
  def assignSplits(docs: DataFrame,
                   weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0) &&
      weights.map(_._2).sum == 100,
      s"weights must be positive integer percents summing to 100: $weights")
    val bucket = (pmod(col("doc_id"), lit(1048576L)) * 2654435761L) % 100
    val cum = weights.map(_._2).scanLeft(0)(_ + _).tail
    val assigned = weights.zip(cum).init
      .foldRight(lit(weights.last._1): org.apache.spark.sql.Column) {
        case (((label, _), hi), elseCol) =>
          when(bucket < hi, lit(label)).otherwise(elseCol)
      }
    docs.withColumn("split", assigned)
  }

  /** Corpus version diff — the dataset-audit a pipeline owner runs
    * between two corpus snapshots before retraining: per group
    * (source, language, ...), how many documents were added, removed,
    * and kept, BY CONTENT. Identity is the house 128-bit content
    * fingerprint (two independent xxhash64 seeds — the exact-dedup
    * convention, collision odds ~n²/2¹²⁹), so the exchanges carry 16
    * bytes + group per row, never the text, and renamed/moved doc_ids
    * with identical text count as kept. One full-outer join on the
    * fingerprint and one aggregate: at 100 TB both sides reduce
    * map-side to fingerprints before the only data-sized exchange.
    * (The reference has no snapshot tooling; this extends its
    * materialization lifecycle the way `compactResult` does.) */
  def corpusDiff(oldCorpus: DataFrame, newCorpus: DataFrame,
                 groupCol: String): DataFrame = {
    // one row per distinct content; group = MIN over the content's
    // rows, so attribution is deterministic when duplicate text spans
    // groups (dropDuplicates would keep an arbitrary row's group)
    def fp(df: DataFrame): DataFrame = graft.Engine.fanOut(df)
      .select(col(groupCol).as("g"),
        xxhash64(col("text")).as("fp_a"),
        xxhash64(lit("graft.dedup.salt"), col("text")).as("fp_b"))
      .groupBy("fp_a", "fp_b").agg(min(col("g")).as("g"))
    val o = fp(oldCorpus).withColumn("in_old", lit(1L))
    val n = fp(newCorpus).withColumn("in_new", lit(1L))
      .withColumnRenamed("g", "g_new")
    o.join(n, Seq("fp_a", "fp_b"), "full_outer")
      .select(coalesce(col("g_new"), col("g")).as(groupCol),
        coalesce(col("in_old"), lit(0L)).as("in_old"),
        coalesce(col("in_new"), lit(0L)).as("in_new"))
      .groupBy(groupCol)
      .agg(sum(when(col("in_new") === 1L && col("in_old") === 0L, 1L)
          .otherwise(0L)).as("n_added"),
        sum(when(col("in_old") === 1L && col("in_new") === 0L, 1L)
          .otherwise(0L)).as("n_removed"),
        sum(when(col("in_old") === 1L && col("in_new") === 1L, 1L)
          .otherwise(0L)).as("n_kept"))
      .orderBy(groupCol)
  }

  /** Per-group contamination audit — the REPORT companion to
    * [[decontaminate]] (same eval-gram broadcast join) answering the
    * question a data owner asks before dropping anything: how much of
    * each source/language overlaps the eval set? Counts are exact;
    * frac is an exact integer ratio, so the report is engine-portable.
    * Same plan shape as decontaminate: eval grams broadcast, train
    * grams never shuffle, one aggregate per group. */
  def contaminationReport(train: DataFrame, evalSet: DataFrame,
                          groupCol: String, k: Int = 10): DataFrame = {
    val trainG = graft.Engine.fanOut(train)
      .select(col("doc_id"),
        explode(TextDedup.shingleHashes(col("text"), k)).as("g"))
    val evalG = evalSet
      .select(explode(TextDedup.shingleHashes(col("text"), k)).as("g"))
      .distinct()
    val bad = trainG.join(broadcast(evalG), "g").select("doc_id").distinct()
      .withColumn("contaminated", lit(1L))
    train.select(col("doc_id"), col(groupCol))
      .join(bad, Seq("doc_id"), "left")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("contaminated"), lit(0L))).as("n_contaminated"))
      .withColumn("frac_contaminated",
        col("n_contaminated").cast("double") / col("n_docs"))
      .orderBy(groupCol)
  }

  /** Temperature-weighted mixture reweighting — the multilingual-LM
    * generalization of [[domainMixWeights]]' uniform target: target
    * share ∝ frac^(1/τ) (τ=1 natural mix, τ→∞ uniform; the τ≈2-5
    * band is the standard multilingual compromise). weight_g =
    * target_g / frac_g, so `weight` multiplies per-doc sampling rates
    * exactly like the uniform version's output.
    *
    * Determinism: the default τ=2 path scores with sqrt — IEEE
    * requires sqrt correctly rounded, so both engines produce the same
    * doubles — and the normalizer sums scores through DECIMAL(18,12),
    * which is order-free. Other τ use pow(), whose last-ulp behavior
    * is libm-dependent; oracle-gated paths should stick to τ=2. */
  def temperatureMixWeights(docs: DataFrame, groupCol: String,
                            tau: Double = 2.0): DataFrame = {
    require(tau > 0, "temperature must be positive")
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val score =
      if (tau == 2.0) sqrt(col("frac")) else pow(col("frac"), lit(1.0 / tau))
    docs.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("total", sum("n_docs").over(all))
      .withColumn("frac", col("n_docs").cast("double") / col("total"))
      .withColumn("s", score.cast("decimal(18,12)"))
      .withColumn("z", sum("s").over(all))
      .select(col(groupCol), col("n_docs"), col("frac"),
        (col("s").cast("double") / col("z").cast("double") / col("frac"))
          .as("weight"))
      .orderBy(groupCol)
  }

  /** Column profiler — the "look before you train" table audit: one
    * output row per profiled column with row/null/distinct counts and
    * min/max rendered to strings. One aggregate job.
    *
    * Distinct counts default to `approx_count_distinct` (HLL++,
    * 2% relative error): mergeable fixed-size partials, one pass, no
    * Expand. `exact = true` switches to `countDistinct`, which
    * Catalyst plans through an Expand that multiplies every scanned
    * row ×(#cols+1) and shuffles full column VALUES as aggregation
    * state — at 100 TB a 10-column exact profile is an 11× row blowup
    * with unbounded state, so exact is the opt-in (fixture-scale
    * audits, the oracle gate), approx the default. A PlanSpec pin
    * keeps the default path Expand-free.
    *
    * Numeric min/max should be pre-cast to DECIMAL by the caller when
    * engine-portable rendering matters (double→string formatting is
    * engine-specific; decimal→string is not). String min/max assume
    * binary (codepoint) collation on both sides — true for Spark and
    * DuckDB defaults; a locale-collated column would order
    * differently. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    // Parallelize the scan when the input is a small/unsplittable file
    // set (a 1-row-group parquet plans ONE task, serializing the whole
    // Expand+aggregate on one core — guide §2.5 input skew); no-op on
    // inputs big enough to split (fanOut's byte gate).
    val in = graft.Engine.fanOut(df)
    // min/max render through strings, and a string aggregation buffer
    // disqualifies HashAggregate — mixed into the SAME aggregate as
    // the exact-distinct Expand, Catalyst planned the whole thing as
    // SortAggregate with a full sort of the ×(#cols+1)-expanded input
    // (measured: the entire q_profile wall). Splitting the string-
    // buffered min/max (global agg — SortAggregate needs NO sort with
    // no grouping keys) from the distinct counts (long buffers →
    // HashAggregate over the Expand) keeps both passes sort-free; the
    // two single-row results recombine with a free cross join.
    val ndAggs = cols.map { c =>
      val nd = if (exact) countDistinct(col(c))
               else approx_count_distinct(col(c), rsd = 0.02)
      nd.as(s"__nd_$c")
    }
    val mmAggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val total = count(lit(1)).as("__total")
    val row = in.agg(total, mmAggs: _*).crossJoin(in.agg(ndAggs.head, ndAggs.tail: _*))
    val perCol = cols.map { c =>
      struct(lit(c).as("column"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    row.select(explode(array(perCol: _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  /** Gopher-style repetition signals, one scan, no shuffle:
    *  - rep_word_frac: fraction of word occurrences that are repeats
    *    (1 − distinct/total);
    *  - top_word_frac: occurrences of the most frequent word / total;
    *  - top_bigram_frac: occurrences of the most frequent word bigram
    *    / total bigrams;
    *  - keep: the filter verdict at Gopher-like thresholds.
    * All four counters come from one compiled hash-map pass per
    * document ([[graft.functions.NativeExpressions.RepStats]]) —
    * O(tokens) per row inside the scan's codegen span, so cost per
    * byte is flat at any corpus scale AND in document length (the
    * nested-HOF form this replaced was O(distinct × tokens) per row:
    * 841.9 s of the sf0.1 bench, and a pathological long document
    * could stall a whole task). */
  def repetitionStats(docs: DataFrame,
                      maxTopWordFrac: Double = 0.2,
                      maxTopBigramFrac: Double = 0.18): DataFrame = {
    val nTok = col("g.n_tok").cast("double")
    docs.select(col("doc_id"),
        graft.functions.NativeExpressions.rep_stats(col("text")).as("g"))
      .select(
        col("doc_id"),
        (lit(1.0) - col("g.n_dist") / nTok).as("rep_word_frac"),
        (col("g.top_uni").cast("double") / nTok).as("top_word_frac"),
        when(col("g.n_tok") >= 2,
          col("g.top_bi").cast("double") / (nTok - 1))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
      .withColumn("keep",
        col("top_word_frac") <= maxTopWordFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac)
      .orderBy("doc_id")
  }

  /** The Gopher repetition-filter family beyond [[repetitionStats]]'
    * unigram/bigram signals (Rae et al. 2021, Table A1, token-position
    * analog of the char fractions):
    *  - top_3gram_frac / top_4gram_frac: occurrences of the most
    *    frequent word 3-/4-gram over the gram count;
    *  - dup_5gram_frac / dup_10gram_frac: fraction of token positions
    *    covered by any 5-/10-gram occurring more than once within the
    *    document (overlaps counted once);
    *  - keep: the verdict at Gopher-like thresholds.
    * One compiled pass per document
    * ([[graft.functions.NativeExpressions.GopherRep]]) — O(Σk·tokens)
    * per row inside the scan's codegen span, no shuffle, so the cost
    * per byte is flat in corpus size and document length. */
  def gopherStats(docs: DataFrame,
                  maxTop3: Double = 0.18, maxTop4: Double = 0.16,
                  maxDup5: Double = 0.30, maxDup10: Double = 0.20): DataFrame = {
    val nTok = col("g.n_tok").cast("double")
    docs.select(col("doc_id"),
        graft.functions.NativeExpressions.gopher_rep(col("text")).as("g"))
      .select(
        col("doc_id"),
        when(col("g.n_tok") >= 3, col("g.top3").cast("double") / (nTok - 2))
          .otherwise(lit(0.0)).as("top_3gram_frac"),
        when(col("g.n_tok") >= 4, col("g.top4").cast("double") / (nTok - 3))
          .otherwise(lit(0.0)).as("top_4gram_frac"),
        when(col("g.n_tok") >= 1, col("g.cov5").cast("double") / nTok)
          .otherwise(lit(0.0)).as("dup_5gram_frac"),
        when(col("g.n_tok") >= 1, col("g.cov10").cast("double") / nTok)
          .otherwise(lit(0.0)).as("dup_10gram_frac"))
      .withColumn("keep",
        col("top_3gram_frac") <= maxTop3 && col("top_4gram_frac") <= maxTop4 &&
          col("dup_5gram_frac") <= maxDup5 && col("dup_10gram_frac") <= maxDup10)
      .orderBy("doc_id")
  }

  /** C4-style span-duplication stats: for each document, how many of
    * its distinct word k-gram spans also occur in at least `minDocs`
    * documents corpus-wide (C4 removes any three-sentence span that
    * occurs more than once; this is the word-span analog, the signal a
    * span-removal pass filters on).
    *
    * Plan: spans reduce to sorted distinct 64-bit hashes map-side
    * ([[TextDedup.shingleHashes]] — compiled, inside the scan's codegen
    * span), so the explode and both shuffles carry (doc_id, 8-byte
    * hash) only, never text. Document frequency is one map-side
    * combined aggregate; the frequency join is 1:1 per span row (the
    * df frame has exactly one row per key, so a corpus-hot span — every
    * doc sharing one boilerplate gram — fans out linearly, no f²
    * blowup); per-doc counts are a second combined aggregate. At
    * 100 TB this is the same exchange discipline as the dedup family:
    * three narrow shuffles, all on 8-byte keys. */
  def spanDupStats(docs: DataFrame, k: Int = 3, minDocs: Int = 2): DataFrame = {
    val g = graft.Engine.fanOut(docs)
      .select(col("doc_id"), explode(TextDedup.shingleHashes(col("text"), k)).as("s"))
    val f = g.groupBy("s").agg(count(lit(1)).as("nd"))
    g.join(f, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= minDocs, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_frac", col("n_dup_spans").cast("double") / col("n_spans"))
      .orderBy("doc_id")
  }

  /** C4-style span REMOVAL: rewrite each document with every word
    * k-gram span that occurs in >= `minDocs` documents cut out ([[
    * spanDupStats]] is the monitoring form; this is the rewrite C4
    * applies — it removed any three-sentence span occurring more than
    * once). Returns (doc_id, clean_text, n_kept); documents whose
    * every token sits inside a duplicated span are dropped. Token
    * positions covered by any duplicated span are cut; surviving
    * tokens are rejoined with single spaces (whitespace normalizes).
    *
    * Scale shape: span frequency is counted on 8-byte xxhash64 gram
    * keys (a hash collision can only over-remove, never corrupt —
    * ~1e-20 at a trillion grams), coverage collapses to one
    * (doc_id, int positions) row per affected document, and the
    * corpus body moves through exactly ONE exchange — the doc_id
    * reconstruction join — after which the cut is a map-side indexed
    * array filter. That one body move is the floor for any rewrite
    * that needs cross-document span frequencies. */
  def removeDupSpans(docs: DataFrame, k: Int = 10, minDocs: Int = 2): DataFrame = {
    require(k >= 1 && minDocs >= 1)
    val base = graft.Engine.fanOut(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
    val grams = base.filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("w")) - k),
        i => xxhash64(concat_ws(" ", slice(col("w"), i + 1, lit(k))))))
        .as(Seq("gpos", "h")))
    val dup = grams.select(col("doc_id"), col("h")).dropDuplicates("doc_id", "h")
      .groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select("h")
    val cov = grams.join(dup, "h")
      .select(col("doc_id"),
        explode(sequence(col("gpos"), col("gpos") + (k - 1))).as("pos"))
      .groupBy("doc_id").agg(collect_set("pos").as("cut"))
    base.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), filter(col("w"),
        (_, i) => !array_contains(
          coalesce(col("cut"), array().cast("array<int>")), i)).as("kept"))
      .select(col("doc_id"), array_join(col("kept"), " ").as("clean_text"),
        size(col("kept")).cast("long").as("n_kept"))
      .filter(col("n_kept") > 0)
      .orderBy("doc_id")
  }

  /** Corpus-wide most frequent word k-grams — the vocabulary /
    * boilerplate monitoring query every corpus build runs. Occurrence
    * counts (not per-doc distinct), deterministic tie-break on the
    * gram text. Plan: one scan, generator explode, partial hash
    * aggregate before the exchange (hot grams combine map-side, so a
    * billion-way skew on one boilerplate gram ships one row per task),
    * TakeOrderedAndProject for the top-k — never a global sort. */
  /** Exact corpus-wide heavy-hitter tokens (count >= minCount) with a
    * COUNT-MIN-SKETCH prefilter — the frequency analogue of the Bloom
    * pattern in TextDedup.incrementalDedup. Build: one treeAggregate
    * pass folds every token hash into a mergeable CMS (only the final
    * `eps`-wide sketch lands on the driver, shipped once per
    * executor). Probe: the second scan keeps only tokens the sketch
    * estimates at >= minCount — CMS never underestimates, so no true
    * heavy hitter is lost — and only those survivors shuffle into the
    * exact groupBy that removes the sketch's overestimates. Emitted
    * counts are EXACT; the sketch only bounds the exchange: at 100 TB
    * the long tail (the overwhelming majority of distinct tokens)
    * dies map-side inside the scan's codegen span instead of
    * shuffling, and sketch memory is fixed by (eps, confidence), not
    * by corpus cardinality. Hash collisions can only ADD a spurious
    * candidate (removed by the exact count), never drop one. */
  def heavyHitterTokens(docs: DataFrame, minCount: Long,
                        eps: Double = 1e-4, confidence: Double = 0.99): DataFrame = {
    val toks = graft.Engine.fanOut(docs)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val cms = toks.stat.countMinSketch(col("h"), eps, confidence, seed = 42)
    toks.filter(graft.functions.NativeExpressions.cms_at_least(col("h"), cms, minCount))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(desc("n"), asc("tok"))
  }

  def topNgrams(docs: DataFrame, k: Int = 3, topK: Int = 20): DataFrame = {
    require(k >= 1, "k must be positive")
    docs.select(TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= k)
      .select(explode(transform(sequence(lit(1), size(col("w")) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j)): _*)))
        .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("gram")).limit(topK)
  }

  /** Top bigram collocations by pointwise mutual information:
    * PMI(a,b) = ln(p(ab) / (p(a)·p(b))) over corpus-wide occurrence
    * counts, `minCount` floor on the bigram (rare pairs otherwise
    * dominate — the classic PMI pathology), deterministic (PMI, gram)
    * tie-break. The collocation detector corpus tooling runs to find
    * multi-word units ("new york") worth merging before tokenization.
    *
    * Plan: one scan explodes unigrams and bigrams (both map-side
    * combined aggregates — hot grams ship one row per task); totals
    * ride broadcasts; the top-k is TakeOrderedAndProject. PMI values
    * round-trip through DECIMAL(18,12) so a last-ULP ln() difference
    * across engines cannot reorder the top-k. */
  def pmiCollocations(docs: DataFrame, minCount: Int = 5, topK: Int = 20): DataFrame = {
    val toks = graft.Engine.fanOut(docs)
      .select(TextAnalysis.tokens(col("text")).as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val uniTotal = uni.agg(sum("n").as("n_uni"))
    val bi = toks.filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => struct(element_at(col("w"), i).as("a"), element_at(col("w"), i + 1).as("b"))))
        .as("g"))
      .select(col("g.a"), col("g.b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val biTotal = bi.agg(sum("n_ab").as("n_bi"))
    bi.join(uni.select(col("t").as("a"), col("n").as("n_a")), "a")
      .join(uni.select(col("t").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(uniTotal)).crossJoin(broadcast(biTotal))
      .select(concat_ws(" ", col("a"), col("b")).as("gram"), col("n_ab"),
        log((col("n_ab") / col("n_bi").cast("double")) /
          ((col("n_a") / col("n_uni").cast("double")) *
            (col("n_b") / col("n_uni").cast("double"))))
          .cast("decimal(18,12)").cast("double").as("pmi"))
      .orderBy(desc("pmi"), asc("gram")).limit(topK)
  }

  /** Per-group quality-threshold calibration: for each `groupCol`
    * value (language, domain, …) the score cutoff that keeps the top
    * `keepFrac` of documents, plus the resulting keep counts — the
    * step that turns "filter by quality" into "keep the best 70% of
    * EVERY language" instead of letting one language's score scale
    * starve the others (the Gopher/CCNet-style per-bucket threshold).
    *
    * Plan: one scan computes scores inline ([[TextAnalysis.quality]],
    * codegen'd), one shuffle groups (group, score) pairs for the exact
    * interpolated percentile, and the cutoffs frame (one row per
    * group) broadcasts back over the score rows — the corpus body is
    * never shuffled, only 8-byte scores with their group key. At
    * 100 TB swap `percentile` for `approx_percentile` (t-digest,
    * mergeable map-side, bounded error) — the plan shape is unchanged;
    * the exact form is kept here because the oracle is exact. */
  def qualityCalibrate(docs: DataFrame, keepFrac: Double = 0.7,
                       groupCol: String = "lang"): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, "keepFrac must be in (0, 1]")
    val q = docs.select(col(groupCol),
      TextAnalysis.quality(col("text")).as("quality"))
    // The interpolated percentile goes through a DECIMAL(18,12)
    // round-trip BEFORE the comparison: interpolation arithmetic
    // differs across engines in the last float bit, and when the
    // percentile position lands on tied samples that bit decides a
    // boundary document's >= — pinning the cutoff to 12 decimal places
    // makes every engine compare against the identical value (scores
    // themselves are engine-exact, well above 1e-12 apart).
    val cuts = q.groupBy(groupCol)
      .agg(percentile(col("quality"), lit(1.0 - keepFrac))
        .cast("decimal(18,12)").cast("double").as("cutoff"))
    q.join(broadcast(cuts), groupCol)
      .groupBy(groupCol)
      .agg(max("cutoff").as("cutoff"),
        count(lit(1)).as("n_docs"),
        sum(when(col("quality") >= col("cutoff"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(groupCol)
  }

  /** Domain-mixture reweighting: per-`groupCol` corpus share and the
    * sampling weight that moves the mixture to the UNIFORM target
    * (weight = target_frac / actual_frac = total / (n_groups · n)).
    * A downstream sampler keeps/repeats each doc proportionally to its
    * group's weight. One partial-agg shuffle of (group, count); the
    * window runs over one row per group. */
  def domainMixWeights(docs: DataFrame, groupCol: String = "source"): DataFrame = {
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    docs.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("total", sum("n_docs").over(all))
      .withColumn("n_groups", count(lit(1)).over(all))
      .select(col(groupCol), col("n_docs"),
        (col("n_docs").cast("double") / col("total")).as("frac"),
        (col("total").cast("double") / (col("n_groups") * col("n_docs"))).as("weight"))
      .orderBy(groupCol)
  }

  /** The downstream sampler [[domainMixWeights]] prescribes: emit each
    * document `weight` times in expectation — ⌊weight⌋ guaranteed
    * copies plus one more iff a deterministic multiplicative hash of
    * doc_id clears the fractional part (the Knuth-hash gate q_sample
    * uses, exact in int64 and portable). Underrepresented groups
    * up-sample (weight > 1), overrepresented ones down-sample
    * (weight < 1 keeps a deterministic subset); the output mixture is
    * uniform across groups in expectation. Reproducible by
    * construction — the same corpus always yields the same resample,
    * the property a 100 TB training-data build needs to be auditable.
    * One tiny broadcast join + a map-side explode; the corpus never
    * shuffles. */
  def resampleToMix(docs: DataFrame, groupCol: String = "source"): DataFrame =
    emitCopies(docs, groupCol,
      domainMixWeights(docs, groupCol).select(col(groupCol), col("weight")))

  /** Explicit-RECIPE resampling — the general form of
    * [[resampleToMix]]: move the mixture to an arbitrary target
    * ("50 % en, 30 % fr, 20 % de" — the data recipe a training run
    * specifies) instead of the uniform one. `target` is
    * (label, integer percent) pairs summing to 100 (the same grammar
    * [[assignSplits]] uses); weight_g = (pct_g/100) · total / n_g, so
    * the output carries ≈ the input's row count at the recipe's
    * mixture in expectation. Corpus groups ABSENT from the recipe
    * drop (the recipe IS the mixture — an unlisted group has target
    * mass 0); a recipe label with NO corpus rows fails loud (its
    * target mass cannot be produced from nothing, and silently
    * renormalizing would ship a different recipe than asked for).
    * Same deterministic Knuth-hash copy rule, same scale shape as
    * [[resampleToMix]]: one (group, count) partial-agg shuffle, tiny
    * broadcast weights, map-side explode — the corpus never
    * shuffles. */
  def resampleToTarget(docs: DataFrame, groupCol: String,
                       target: Seq[(String, Int)]): DataFrame = {
    require(target.nonEmpty, "resampleToTarget: empty recipe")
    require(target.map(_._1).distinct.size == target.size,
      s"resampleToTarget: duplicate recipe label(s) " +
        target.groupBy(_._1).collect { case (l, g) if g.size > 1 => l }.mkString(", "))
    require(target.forall(_._2 > 0),
      "resampleToTarget: recipe percents must be positive (omit a group to drop it)")
    require(target.map(_._2).sum == 100,
      s"resampleToTarget: recipe percents must sum to 100, got ${target.map(_._2).sum}")
    val spark = docs.sparkSession
    import spark.implicits._
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val counts = docs.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("total", sum("n_docs").over(all))
    val t = target.toDF(groupCol, "pct")
    // loud on an unsatisfiable recipe — bounded driver check (≤ recipe
    // labels), BEFORE any copies are emitted
    val missing = t.join(counts, Seq(groupCol), "left_anti")
      .select(groupCol).collect().map(_.getString(0))
    require(missing.isEmpty,
      s"resampleToTarget: recipe label(s) ${missing.mkString(", ")} have no " +
        s"corpus rows under $groupCol — the target mass cannot be produced")
    // same double-op order as the DuckDB oracle: ((pct/100)·total)/n
    val wts = counts.join(t, groupCol)
      .select(col(groupCol),
        (col("pct").cast("double") / 100.0 * col("total") / col("n_docs"))
          .as("weight"))
    emitCopies(docs, groupCol, wts)
  }

  /** The deterministic copy emitter [[resampleToMix]] and
    * [[resampleToTarget]] share: emit each document `weight` times in
    * expectation — ⌊weight⌋ guaranteed copies plus one more iff the
    * multiplicative-hash gate clears the fractional part. `wts` is one
    * (group, weight) row per group (broadcast). */
  private def emitCopies(docs: DataFrame, groupCol: String,
                         wts: DataFrame): DataFrame =
    docs.join(broadcast(wts), groupCol)
      // doc_id masked to 20 bits BEFORE the multiply: the unmasked
      // product overflows int64 past doc_id ≈ 3.47e9 — Spark wraps
      // silently, DuckDB raises — breaking portability exactly at the
      // corpus scale this gate targets. Masked, the product tops out
      // near 2^51.3 and both engines agree bit-for-bit.
      .withColumn("n_copies",
        (floor(col("weight")) +
          when(pmod(pmod(col("doc_id"), lit(1048576L)) * 2654435761L,
              lit(1048576L)).cast("double") <
            (col("weight") - floor(col("weight"))) * 1048576.0, 1L)
            .otherwise(0L)).cast("long"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col(groupCol),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_id"))
      .orderBy("doc_id", "copy_id")

  /** Token-budget corpus slice per group: keep, per `groupCol` value,
    * the documents whose INCLUSIVE running token total in
    * deterministic shuffled order stays within `budget` — the op that
    * turns mixture weights ([[temperatureMixWeights]] /
    * [[domainMixWeights]]) into an actual bounded corpus cut ("a
    * 1 B-token French slice for the mix"). Order is the
    * [[shuffleRank]] hash (a pure function of doc_id and seed, ties
    * broken by doc_id), so the slice is an i.i.d.-looking prefix of
    * the group, reproducible and retry-stable where `ORDER BY rand()`
    * is neither.
    *
    * Scale shape: the value-keyed two-pass prefix sum of
    * [[packSequences]], made per-group — range-bucket the hash
    * domain, aggregate per (group, bucket) token sums (≤ groups ×
    * `parts` rows through the broadcast offsets frame), then a window
    * per (group, bucket) adds the exclusive bucket offset to the
    * within-bucket running sum. No single-task-per-group global
    * window: a group holding 90 % of a 100 TB corpus still cumsums
    * across `parts` tasks, and everything past the budget is filtered
    * BEFORE any downstream shuffle sees it. */
  def tokenBudgetSample(docs: DataFrame, groupCol: String, budget: Long,
      seed: Long = 0L, parts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val width = ShuffleMod / p + 1
    val toks = graft.Engine.fanOut(docs).select(col("doc_id"), col(groupCol),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("h",
        expr(s"pmod(pmod(doc_id + ${seed}L, 1048576) * 2654435761, ${ShuffleMod}L)"))
      .withColumn("bk", expr(s"h div ${width}L"))
    val offs = toks.groupBy(groupCol, "bk").agg(sum("n_tokens").as("psum"))
      .withColumn("off", coalesce(
        sum("psum").over(Window.partitionBy(groupCol).orderBy("bk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol).as("off_g"), col("bk").as("off_bk"), col("off"))
    val w = Window.partitionBy(groupCol, "bk").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe group equality (<=>): a NULL group value forms its own
    // group in groupBy and the window partition, so the offsets join
    // must match it too — a plain === would silently drop every
    // null-group document from the sampled mix (null never equals
    // null), diverging from shuffleRank which keeps every row
    toks.join(broadcast(offs),
        toks(groupCol) <=> col("off_g") && toks("bk") === col("off_bk"))
      .withColumn("cum_tokens", col("off") + sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col(groupCol), col("n_tokens"), col("cum_tokens"))
      .orderBy("doc_id")
  }
}
