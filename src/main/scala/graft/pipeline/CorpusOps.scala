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

  /** Greedy contiguous sequence packing: documents in doc_id order are
    * concatenated into fixed-size token shards; a document's shard is
    * `floor(exclusive_prefix_sum(n_tokens) / budget)` — i.e. the shard
    * whose window its first token falls in (long docs spill into the
    * next shard, the standard "document boundary straddles a sequence"
    * case the attention mask handles downstream).
    *
    * Scale shape: the textbook two-pass distributed prefix sum —
    * range-partition by doc_id, per-partition token subtotals (one
    * tiny P-row frame), exclusive offsets via a window over those P
    * rows, broadcast the offsets back, local cumsum per partition.
    * Nothing wider than (doc_id, n_tokens) ever shuffles and no data
    * path touches the driver, so it holds at any corpus size. */
  def packSequences(docs: DataFrame, budget: Long, parts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    // localCheckpoint pins one physical partitioning, so the subtotal
    // job and the cumsum job see identical (pid -> rows) assignment.
    val toks = docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .repartitionByRange(p, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(false)
    // Exclusive per-partition offsets. The unpartitioned window scans
    // P rows (one per partition) — driver-scale metadata, not data.
    val offs = toks.groupBy("pid").agg(sum("n_tokens").as("psum"))
      .withColumn("off", coalesce(
        sum("psum").over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("pid", "off")
    val w = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(offs), "pid")
      .withColumn("start_tok", col("off") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start_tok div $budget").as("seq_id"))
      .orderBy("doc_id")
  }

  /** Eval-set decontamination: drop every training document that
    * shares at least one word k-gram with any document in `evalSet`
    * (the GPT-3/PaLM n-gram-overlap rule). Returns the CLEAN training
    * doc_ids.
    *
    * Plan: both sides reduce to 64-bit k-gram hashes map-side
    * ([[TextDedup.shingleHashes]]); the eval side collapses to its
    * distinct grams (eval sets are tiny next to the corpus, so the
    * contamination join broadcasts); contaminated ids come from one
    * semi-join-shaped equi-join, clean ids from one anti-join. The
    * corpus is scanned once and only 8-byte hashes shuffle. */
  def decontaminate(train: DataFrame, evalSet: DataFrame, k: Int = 10): DataFrame = {
    val trainG = graft.Engine.fanOut(train)
      .select(col("doc_id"),
        explode(TextDedup.shingleHashes(col("text"), k)).as("g"))
    val evalG = evalSet
      .select(explode(TextDedup.shingleHashes(col("text"), k)).as("g"))
      .distinct()
    val contaminated = trainG.join(evalG, "g").select("doc_id").distinct()
    train.select("doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
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
}
