package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, n-gram language scoring, and document
  * fingerprinting. All pure column expressions (whole-stage codegen,
  * no UDFs), so they fuse into the scan and cost one pass over the
  * corpus regardless of scale.
  *
  * Every formula is written as explicit sequential arithmetic so the
  * DuckDB oracle can restate it verbatim (bit-identical doubles).
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace token count + a BPE-ish regex token count
    * (letter runs | digit runs | single other non-space chars). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("n_re_tokens"),
      (length(col("text")).cast("double") / size(tokens(col("text"))))
        .as("chars_per_token"))
      .orderBy("doc_id")

  private val enStop = Seq("the", "and", "of", "to", "in", "is", "a", "that")

  /** The quality expression alone — for operators that score inline
    * (e.g. [[CorpusOps.qualityCalibrate]]) without the per-doc ratio
    * columns. Identical expression tree to [[qualityScore]]'s
    * `quality` column. */
  def quality(text: Column): Column = {
    // one compiled pass for the three counters (the declarative form
    // paid two splits + an interpreted ArrayFilter + a regex rewrite
    // per row — guide §4: no interpreted closures in the hot path);
    // the double formula on top is unchanged, so values are identical
    val g = graft.functions.NativeExpressions.quality_counts(text, enStop)
    val nTok = g.getField("n_tok").cast("double")
    val punct = g.getField("punct").cast("double")
    val stop = g.getField("stop").cast("double")
    least(nTok / lit(256.0), lit(1.0)) * (lit(1.0) - punct / length(text)) *
      (lit(0.5) + lit(0.5) * least(lit(4.0) * stop / nTok, lit(1.0)))
  }

  /** Heuristic quality score in [0,1]: length saturation × (1 − punct
    * density) × stopword-presence factor. The exact formula matters
    * less than it being deterministic, cheap, and monotone in the
    * obvious signals — the standard shape for corpus filtering. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val g = graft.functions.NativeExpressions.quality_counts(col("text"), enStop)
    val nTok = g.getField("n_tok").cast("double")
    val punct = g.getField("punct").cast("double")
    val stop = g.getField("stop").cast("double")
    docs.select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      (punct / length(col("text"))).as("punct_ratio"),
      (stop / nTok).as("stop_ratio"),
      quality(col("text")).as("quality"))
      .orderBy("doc_id")
  }

  /** TF-IDF top terms per document — the corpus-signature /
    * keyword-extraction query of every IR stack. tf = term count /
    * doc length; idf = ln(n_docs / df); top `topK` terms per doc by
    * score.
    *
    * Plan shape at 100 TB: one scan explodes tokens into ONE hash
    * aggregate on (doc_id, term) — the only exchange the raw token
    * stream ever crosses. Doc lengths come from a window over that
    * aggregate's output, so the doc_id re-shuffle moves only the
    * already-aggregated (doc, term, n) rows (distinct terms per doc,
    * not token occurrences); document frequencies are a second
    * aggregate keyed by term (map-side combined, so a corpus-hot term
    * ships one row per task); n_docs rides a broadcast. The per-doc
    * top-k is a rank window over (doc_id) — never a global sort.
    *
    * Scores round-trip through DECIMAL(18,12) BEFORE ranking: ln()
    * may differ in the last ULP across engines, and the rank compare
    * would amplify that into a different row set. */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 5): DataFrame = {
    val toks = graft.Engine.fanOut(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
      .withColumn("len",
        sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfs, "term").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        ((col("n") / col("len").cast("double")) *
          log(col("n_docs").cast("double") / col("df")))
          .cast("decimal(18,12)").cast("double").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("score"), col("rank").cast("long").as("rank"))
      .orderBy("doc_id", "rank")
  }

  /** BM25 keyword retrieval over the corpus (Robertson–Spärck Jones;
    * the Okapi weighting used by Lucene and every production search
    * stack): score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avgdl))
    * with idf(t) = ln(1 + (N−df+0.5)/(df+0.5)). One row per document
    * matching ≥1 query term: (doc_id, score, n_terms), ordered by
    * doc_id — corpus search with principled length normalization,
    * where [[tfidfTopTerms]] only describes documents.
    *
    * ONE corpus pass: per-doc lengths and per-query-term tfs come out
    * of the same map-side-combined aggregate (a `sum(when(term=t))`
    * column per query term — the query vocabulary is human-query-sized
    * by contract, so the aggregate row stays narrow), then the narrow
    * result melts back to (doc_id, term, tf) rows. Document
    * frequencies and (N, avgdl) derive from that aggregate — nothing
    * re-reads the corpus. Each term contribution rounds through
    * DECIMAL(28,12), the sum is EXACT decimal arithmetic, and the sum
    * is never re-rounded — Spark rounds decimal halves up and DuckDB
    * rounds them down, so one rounding of identical doubles is safe
    * but a second rounding of the exact sum is a coin-flip at every
    * ...50 boundary (measured: 1-in-100 rows flip at a 1e-10 re-round). */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    termContribs(docs, queryTerms, k1, b)
      .groupBy("doc_id")
      .agg(sum(col("contrib").cast("decimal(28,12)")).as("raw"),
        count(lit(1)).as("n_terms"))
      .select(col("doc_id"), col("raw").cast("double").as("score"),
        col("n_terms"))
      .orderBy("doc_id")
  }

  /** The per-(doc, term) BM25 contribution stage shared by [[bm25]]
    * and [[bm25Many]]: one corpus pass → (doc_id, term, contrib)
    * for the given query vocabulary, with (N, avgdl, df) derived from
    * the same aggregate. */
  private def termContribs(docs: DataFrame, queryTerms: Seq[String],
                           k1: Double, b: Double): DataFrame = {
    // model scope = NON-BLANK docs: a blank doc has no real tokens
    // (split would emit one empty string), can never match a query,
    // and counting it in (N, avgdl) would desynchronize the
    // corpus-scan scores from [[graft.pipeline.TextIndex]]'s, whose
    // postings cannot see it
    val toks = graft.Engine.fanOut(docs.filter(length(trim(col("text"))) > 0))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$i")
    }
    // Materialize the tokenize+aggregate ONCE (lazy — no job until the
    // query's own action): agg0 feeds THREE branches (per-doc tf, the
    // term dfs, and the global (N, avgdl) stats) whose column-pruned
    // exchanges differ, so AQE exchange reuse does NOT dedupe them and
    // each branch re-ran the whole tokenize pass (r19 QueryProfile:
    // three ~4.4-7.9 s-taskTime 32-task jobs per bm25 corpus call).
    // The materialized frame is one row per doc (len + per-term tfs)
    // — the bounded intermediate that makes the scaladoc's "ONE
    // corpus pass" literally true. CBO-stats loss is harmless here:
    // every downstream join is explicitly broadcast-hinted.
    val agg0 = TextDedup.materialize(toks.groupBy("doc_id")
      .agg(count(lit(1)).as("len"), tfCols: _*), eager = false)
    val tf = agg0.select(col("doc_id"), col("len"),
        explode(array(queryTerms.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("term"), col(s"tf_$i").as("tf"))
        }: _*)).as("e"))
      .select(col("doc_id"), col("len"), col("e.term").as("term"), col("e.tf").as("tf"))
      .filter(col("tf") > 0)
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = agg0.agg(count(lit(1)).as("n_docs"), avg(col("len")).as("avgdl"))
    tf.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(k1) + 1) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / col("avgdl"))))
      .select(col("doc_id"), col("term"), col("contrib"))
  }

  /** Batch BM25 over a PLAIN corpus — the corpus-scan counterpart of
    * [[TextIndex.searchMany]] (same output contract: (query_id,
    * doc_id, score, n_terms), per-query top-k by (score desc,
    * doc_id), ordered (query_id, doc_id)). ONE corpus pass covers the
    * union of all query vocabularies; per-(doc, term) contributions
    * are computed once and fanned out to the queries containing the
    * term through a broadcast of the (query_id, term) pairs, so batch
    * cost is the single-query scan plus a broadcast join — not
    * N scans. The batch is driver-bounded by the serving contract
    * (same as searchMany's). Scores are decimal-identical to
    * per-query [[bm25]] calls: the contribution algebra is shared
    * code ([[termContribs]]) and the exact-decimal sum is never
    * re-rounded. */
  def bm25Many(docs: DataFrame, queries: Seq[(Long, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"bm25Many: k $k must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs: Seq[(Long, String)] = queries
      .flatMap { case (qid, ts) => ts.map(t => qid -> t.trim.toLowerCase) }
      .filter(_._2.nonEmpty).distinct
    if (pairs.isEmpty)
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("query_id", "doc_id", "score", "n_terms")
    val q = pairs.toDF("query_id", "term")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    termContribs(docs, pairs.map(_._2).distinct, k1, b)
      .join(broadcast(q), "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib").cast("decimal(28,12)")).as("raw"),
        count(lit(1)).as("n_terms"))
      .select(col("query_id"), col("doc_id"),
        col("raw").cast("double").as("score"), col("n_terms"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .orderBy("query_id", "doc_id")
  }

  /** Corpus-scan phrase occurrence counts — the direct-scan
    * counterpart of [[TextIndex.searchPhrase]] (same semantics, no
    * index): docs containing the consecutive token sequence, ranked
    * by occurrence count with doc_id tie-break. One pass; the
    * position scan compiles to array lambda expressions (no UDF).
    * Use the index variant when one exists — this is the fallback the
    * `corpus_search` TVF routes to for a plain corpus path. */
  def phraseCounts(docs: DataFrame, phrase: String, k: Int): DataFrame = {
    val terms = phrase.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty && k >= 1)
    val n = terms.length
    val w = tokens(col("text"))
    // starts 1..size-n+1 (element_at is 1-based; Spark's sequence
    // counts DOWN when start > stop, so short docs get an explicit
    // empty array). A start matches iff every term matches its offset.
    val starts = when(size(w) >= lit(n),
      sequence(lit(1), size(w) - lit(n) + lit(1)))
      .otherwise(array().cast("array<int>"))
    val hits = filter(starts,
      i => terms.zipWithIndex.map { case (t, j) =>
        element_at(w, i + lit(j)) === lit(t)
      }.reduce(_ && _))
    docs
      .select(col("doc_id"), size(hits).cast("long").as("n_hits"))
      .filter(col("n_hits") > 0)
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(k)
  }

  /** Batch [[phraseCounts]] in ONE corpus pass: tokens are computed
    * once per doc and every phrase's occurrence count is an
    * expression column over the same token array (all codegen), then
    * the (query_id, n_hits) pairs unpivot and each query takes its
    * own top-k — per-query results identical to N separate
    * [[phraseCounts]] calls (same count logic, same (n_hits desc,
    * doc_id) cut), at 1/N the scan cost on a plain corpus. Blank
    * phrases contribute no rows. Query ids must be UNIQUE: the
    * per-query window keys on query_id, so two different phrases
    * under one id would silently merge into one top-k while the
    * index route emits both — the loud require here keeps the two
    * routes' contracts identical. */
  def phraseCountsMany(docs: DataFrame, phrases: Seq[(Long, String)],
                       k: Int): DataFrame = {
    require(k >= 1)
    val dupIds = phrases.map(_._1).groupBy(identity)
      .collect { case (id, g) if g.size > 1 => id }
    require(dupIds.isEmpty,
      s"phraseCountsMany: duplicate query_id(s) ${dupIds.mkString(", ")} — " +
        "each id names one phrase's result rows")
    val spark = docs.sparkSession
    import spark.implicits._
    val parsed = phrases
      .map { case (qid, p) =>
        (qid, p.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq) }
      .filter(_._2.nonEmpty)
    if (parsed.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("query_id", "doc_id", "n_hits")
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("w"))
    def hitsFor(terms: Seq[String]) = {
      val n = terms.length
      val starts = when(size(col("w")) >= lit(n),
        sequence(lit(1), size(col("w")) - lit(n) + lit(1)))
        .otherwise(array().cast("array<int>"))
      size(filter(starts,
        i => terms.zipWithIndex.map { case (t, j) =>
          element_at(col("w"), i + lit(j)) === lit(t)
        }.reduce(_ && _))).cast("long")
    }
    val perQuery = parsed.map { case (qid, terms) =>
      struct(lit(qid).as("query_id"), hitsFor(terms).as("n_hits")) }
    val exploded = toks
      .select(col("doc_id"), explode(array(perQuery: _*)).as("q"))
      .select(col("q.query_id"), col("doc_id"), col("q.n_hits"))
      .filter(col("n_hits") > 0)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("n_hits").desc, col("doc_id"))
    exploded.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .select("query_id", "doc_id", "n_hits")
  }

  /** Adjacent-symbol pair frequencies at BPE iteration zero: every
    * word split into characters + the `</w>` end marker, pairs
    * weighted by word frequency. The first merge any BPE trainer
    * learns is this table's argmax; it is also the only iteration
    * that is data-sized, which makes it the oracle surface for
    * [[bpeTrain]]. One corpus pass (map-side combined word counts),
    * then pair explosion over the VOCABULARY, not the corpus. */
  def bpePairCounts(docs: DataFrame): DataFrame = {
    val words = graft.Engine.fanOut(docs)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    words
      .select(col("w"), col("cnt"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("chars"))
      .select(col("cnt"),
        explode(expr("transform(sequence(1, size(chars)), i -> " +
          "struct(chars[i - 1] AS left, " +
          "CASE WHEN i = size(chars) THEN '</w>' ELSE chars[i] END AS right))")).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("cnt")).as("pair_count"))
  }

  /** Byte-pair-encoding tokenizer TRAINING — the vocabulary-learning
    * step of an LLM data pipeline (SentencePiece/HF `trainers.BpeTrainer`
    * semantics): learn `nMerges` merge rules, most-frequent adjacent
    * symbol pair first, ties broken lexicographically on (left, right)
    * so the result is a pure function of the corpus.
    *
    * Scale shape, the part that matters at 100 TB: the corpus
    * collapses to a (word, count) VOCABULARY in one map-side-combined
    * pass — Heaps' law bounds distinct words far below corpus size,
    * and `maxVocab` caps the tail (rare words contribute negligible
    * pair mass; every production tokenizer trainer does the same).
    * The merge loop then runs DRIVER-SIDE over that bounded table,
    * like the k-means/PQ codebook training in [[graft.pipeline
    * .Embeddings]] — model-parameter work over a bounded sample, not
    * a per-row corpus loop. Returns (rank, left, right, merged,
    * pair_count) with rank = merge order. */
  def bpeTrain(docs: DataFrame, nMerges: Int, maxVocab: Int = 65536): DataFrame = {
    require(nMerges >= 1 && maxVocab >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    // distributed: corpus -> capped (word, count) vocabulary.
    // deterministic cap: count desc, word asc
    val vocab: Array[(String, Long)] = graft.Engine.fanOut(docs)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // driver-side merge loop over symbol sequences
    var seqs: Array[(Array[String], Long)] = vocab.map { case (w, c) =>
      (w.map(_.toString).toArray :+ "</w>", c)
    }
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1L
    while (rank <= nMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), c, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) rank = nMerges + 1
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (k, v) =>
          if (best == null || v > best._2 ||
              (v == best._2 && (k._1 < best._1._1 ||
                (k._1 == best._1._1 && k._2 < best._1._2))))
            best = (k, v)
        }
        val ((l, r), cnt) = best
        val merged = l + r
        merges += ((rank, l, r, merged, cnt))
        seqs = seqs.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, c)
        }
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy("rank")
  }

  /** Serializable BPE merge applier with a per-executor word cache.
    * Application order is SEQUENTIAL by merge rank with replace-all
    * per rule — the reference semantics of Sennrich et al. 2016's
    * subword-nmt `apply_bpe`, and exactly the evolution [[bpeTrain]]'s
    * own training loop performs, so encoding a vocabulary word
    * reproduces its training-time segmentation by construction
    * (spec-pinned). The cache amortizes the merge loop to once per
    * DISTINCT word per executor JVM (Zipf makes that ≪ corpus
    * tokens) — genuinely per-executor: a task-level `@transient lazy`
    * field would reinitialize on every closure deserialization, so
    * the cache lives in a JVM-global registry keyed by the rule-set
    * fingerprint (bounded: one entry per distinct merge table this
    * JVM has encoded with). Zero exchanges either way: encoding stays
    * a map-side pass. */
  private object BpeApplier {
    // Both dimensions BOUNDED (same discipline as Stores.modelCache):
    // executor heaps must survive a 100 TB corpus whose distinct-word
    // cardinality — tens of millions legitimately, unbounded
    // adversarially — would otherwise grow a word cache forever, and
    // a long-lived session encoding with many throwaway merge tables
    // (tests, retrains) would leak one registry per table. Eviction is
    // arbitrary-entry (cheap, lock-free); under Zipf the hot words
    // repopulate in one batch, so a full cache degrades to amortized
    // re-encodes, never to wrong results.
    private val MaxTables = 8
    private[TextAnalysis] val MaxWordsPerTable = 2_000_000
    private[TextAnalysis] val jvmCaches = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentHashMap[String, Array[String]]]()
    private[TextAnalysis] def registryFor(key: String) = {
      while (jvmCaches.size > MaxTables) {
        val it = jvmCaches.keys()
        if (it.hasMoreElements) jvmCaches.remove(it.nextElement()) else ()
      }
      jvmCaches.computeIfAbsent(key,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Array[String]]())
    }
  }

  private class BpeApplier(merges: Array[(String, String)]) extends Serializable {
    private val cacheKey: String = {
      val h = java.security.MessageDigest.getInstance("SHA-256")
      merges.foreach { case (l, r) =>
        h.update(l.getBytes("UTF-8")); h.update(0.toByte)
        h.update(r.getBytes("UTF-8")); h.update(1.toByte)
      }
      h.digest().map("%02x".format(_)).mkString
    }
    @transient private lazy val cache = BpeApplier.registryFor(cacheKey)
    def encodeWord(word: String): Array[String] = {
      while (cache.size > BpeApplier.MaxWordsPerTable) {
        val it = cache.keys()
        if (it.hasMoreElements) cache.remove(it.nextElement()) else ()
      }
      cache.computeIfAbsent(word, w => {
        var syms: Array[String] = w.map(_.toString).toArray :+ "</w>"
        merges.foreach { case (l, r) =>
          if (syms.length > 1) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.toArray
          }
        }
        syms
      })
    }
    def encodeText(text: String): Array[String] =
      text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty).flatMap(encodeWord)
  }

  /** Byte-pair ENCODING with rules learned by [[bpeTrain]]: per doc,
    * the subword token stream and its length — the "how many tokens
    * is this corpus" pass that prices training data. The merge table
    * is bounded model parameters (like k-means centroids / PQ
    * codebooks): collected once on the driver and shipped in the
    * closure; the corpus crosses ZERO exchanges. A dictionary-driven,
    * branchy, word-memoized loop is a poor fit for codegen, so this
    * is deliberately a UDF around [[BpeApplier]] (the Multimodal
    * decode-slot precedent). */
  def bpeEncode(docs: DataFrame, merges: DataFrame,
                textCol: String = "text"): DataFrame = {
    val rules: Array[(String, String)] = merges.select("rank", "left", "right")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2)))
    val applier = new BpeApplier(rules)
    val encode = udf((text: String) =>
      if (text == null) Array.empty[String] else applier.encodeText(text))
    docs.select(col("doc_id"), encode(col(textCol)).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "los", "que", "y", "una"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Stopword-hit language scores + argmax prediction (first language
    * in declared order wins ties). With synthetic single-vocabulary
    * testdata this mostly predicts 'en'; the operator is the point.
    * Served by the compiled [[graft.functions.NativeExpressions.LangScores]]
    * kernel — the declarative form evaluated one interpreted
    * ArrayFilter (and re-split the text) per language per row, and was
    * the measured 2.5 s single-threaded stage under every per-language
    * LM query (guide §4). Same counts, same strict-`>` first-wins
    * argmax. */
  def languageId(docs: DataFrame): DataFrame = {
    val g = graft.functions.NativeExpressions.lang_scores(col("text"), stopwords)
    docs.select(
      col("doc_id") +: col("lang").as("actual_lang") +:
        stopwords.zipWithIndex.map { case ((l, _), i) =>
          element_at(g.getField("scores"), i + 1).as(s"score_$l") } :+
        g.getField("pred").as("predicted_lang"): _*)
      .orderBy("doc_id")
  }

  /** PII redaction: email, NANP-style phone, and dotted-quad IP
    * patterns replaced by typed placeholder tokens — the scrub pass a
    * training corpus runs before anything else sees the text. Pure
    * codegen'd regexp_replace chain (one scan, no shuffle, no UDF);
    * patterns are deliberately plain ERE so they mean the same thing
    * to Java regex, RE2, and PCRE (portable across engines). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** The (pattern, replacement) chain applied in order. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", PhoneRe -> "<PHONE>", Ipv4Re -> "<IP>")

  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (re, token)) =>
      regexp_replace(c, lit(re), lit(token))
    }

  /** Whole-corpus PII scrub: (doc_id, clean) with the [[redactPii]]
    * chain applied — the per-document face of the scalar, so the
    * corpus_quality TVF's `redact` mode and the Scala surface serve
    * the same operator. One codegen'd projection, zero exchanges. */
  def redactDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), redactPii(col("text")).as("clean"))
      .orderBy("doc_id")

  /** Corpus-self-trained interpolated bigram language-model scoring —
    * the CCNet-style "perplexity filter" of web-corpus pipelines:
    * documents whose token transitions are improbable under a model
    * of the corpus itself (boilerplate, gibberish, wrong-language
    * residue) surface with high negative-log-likelihood.
    *
    * Model: add-alpha smoothed bigram interpolated with the unigram
    * distribution. For each transition (w1, w2) of a document:
    *
    *   p = lambda * (c(w1,w2) + alpha) / (c(w1) + alpha * V)
    *     + (1 - lambda) * (c(w2) + alpha) / (N + alpha * V)
    *
    * where c() are corpus counts, N total tokens, V vocabulary size.
    * Output per doc: `n_bigrams`, `sum_nll` = sum of -ln(p) over
    * transitions (each term rounded through DECIMAL(18,12) so the
    * transcendental ln — the one non-IEEE-portable step — compares
    * equal across engines; the decimal SUM is exact), and
    * `avg_nll` = sum_nll / n_bigrams (pure IEEE division).
    *
    * Plan shape at 100 TB: TWO passes over the corpus — transitions
    * explode straight into a hash aggregate keyed (doc_id, w1, w2),
    * tokens into one keyed by word; those are the only exchanges the
    * raw token stream crosses, and every later stage derives from
    * them (bigram counts re-aggregate the per-doc table; vocabulary
    * totals re-aggregate the unigram table), moving only
    * distinct-bigram or vocabulary-sized rows. The shared subtrees
    * canonicalize identically, so AQE reuses each shuffle stage
    * instead of re-scanning per consumer. (N, V) ride a broadcast.
    * No iteration, no UDF — the whole model is two count tables and
    * codegen'd arithmetic.
    *
    * Reference analog: none — its scalar surface is arithmetic over
    * scanned columns only (`compute_value.rs:117-209`); corpus-level
    * model scoring is beyond-reference surface. */
  /** `groupCol`: condition the model on a partition of the corpus —
    * the CCNet shape is one LM PER LANGUAGE, because a corpus-global
    * model misgrades minority languages (their transitions look
    * improbable under majority-language statistics). Every count
    * table gains the group key, so c(w1,w2), c(w), and (N, V) are all
    * within-group; a document is scored only against its own group's
    * model. Grouped output carries the group column. Plan shape is
    * unchanged — the group key rides the existing aggregate and join
    * keys, and per-group (N, V) (≤ #groups rows) still broadcasts. */
  def lmScore(docs: DataFrame, alpha: Double = 0.5,
              lambda: Double = 0.9, groupCol: Option[String] = None): DataFrame = {
    val g = groupCol.toSeq
    val gc = g.map(col)
    val toks = graft.Engine.fanOut(docs)
      .select(col("doc_id") +: gc :+ tokens(col("text")).as("w"): _*)
    // (w[i], w[i+1]) pairs: transform-with-index over the first n-1
    // tokens — stays inside codegen, no posexplode/self-join.
    val bi = toks
      .select(col("doc_id") +: gc :+ explode(transform(
        slice(col("w"), lit(1), size(col("w")) - 1),
        (t, i) => struct(t.as("w1"), col("w")(i + 1).as("w2")))).as("b"): _*)
      .select(col("doc_id") +: gc :+ col("b.w1").as("w1") :+ col("b.w2").as("w2"): _*)
    val perDoc = bi.groupBy((Seq("doc_id") ++ g ++ Seq("w1", "w2")).map(col): _*)
      .agg(count(lit(1)).as("n"))
    // derived from perDoc, not from a second pass over the transitions
    val bigramCounts = perDoc.groupBy((g ++ Seq("w1", "w2")).map(col): _*)
      .agg(sum("n").as("cb"))
    val uni = toks.select(gc :+ explode(col("w")).as("wd"): _*)
      .groupBy((g :+ "wd").map(col): _*).agg(count(lit(1)).as("c"))
    val totals =
      if (g.isEmpty) uni.agg(sum("c").as("nTot"), count(lit(1)).as("v"))
      else uni.groupBy(gc: _*).agg(sum("c").as("nTot"), count(lit(1)).as("v"))
    val p =
      (lit(lambda) * (col("cb").cast("double") + lit(alpha)) /
        (col("c1").cast("double") + lit(alpha) * col("v").cast("double"))) +
      (lit(1.0 - lambda) * (col("c2").cast("double") + lit(alpha)) /
        (col("nTot").cast("double") + lit(alpha) * col("v").cast("double")))
    val withCounts = perDoc
      .join(bigramCounts, g ++ Seq("w1", "w2"))
      .join(uni.withColumnRenamed("wd", "w1").withColumnRenamed("c", "c1"), g :+ "w1")
      .join(uni.withColumnRenamed("wd", "w2").withColumnRenamed("c", "c2"), g :+ "w2")
    val withTotals =
      if (g.isEmpty) withCounts.crossJoin(broadcast(totals))
      else withCounts.join(broadcast(totals), g)
    val scored = withTotals
      .select(col("doc_id") +: gc :+ col("n") :+
        (-log(p)).cast("decimal(18,12)").as("t12"): _*)
    scored.groupBy((Seq("doc_id") ++ g).map(col): _*)
      .agg(sum("n").cast("long").as("n_bigrams"),
        sum(col("n").cast("decimal(10,0)") * col("t12")).cast("double").as("sum_nll"))
      .withColumn("avg_nll", col("sum_nll") / col("n_bigrams"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity bucketing over [[lmScore]]: label each
    * document `head` / `middle` / `tail` by the corpus TERCILES of
    * avg_nll (head = most-probable third — the bucket CCNet keeps or
    * upsamples). The two cut values come from one exact-percentile
    * aggregate and ride a broadcast; documents then bucket in a
    * map-side comparison — the 100 TB-safe alternative to ntile(),
    * whose single global sort window would serialize the corpus
    * through one partition. Cuts round through DECIMAL(18,12): the
    * percentile interpolation is the only arithmetic here whose
    * last-ULP behavior engines may disagree on. */
  /** `groupCol`: CCNet buckets per language — both the model AND the
    * terciles condition on the group (a shared tercile over mixed
    * languages would put whole minority languages in `tail`). Cuts
    * stay a broadcast: ≤ #groups rows. */
  def lmBuckets(docs: DataFrame, alpha: Double = 0.5,
                lambda: Double = 0.9, groupCol: Option[String] = None): DataFrame = {
    val nll = lmScore(docs, alpha, lambda, groupCol)
    val c1 = percentile(col("avg_nll"), lit(1.0 / 3))
      .cast("decimal(18,12)").cast("double").as("c1")
    val c2 = percentile(col("avg_nll"), lit(2.0 / 3))
      .cast("decimal(18,12)").cast("double").as("c2")
    val withCuts = groupCol match {
      case None => nll.crossJoin(broadcast(nll.agg(c1, c2)))
      case Some(g) => nll.join(broadcast(nll.groupBy(g).agg(c1, c2)), g)
    }
    withCuts
      .select(col("doc_id") +: groupCol.map(col).toSeq :+
        col("n_bigrams") :+ col("avg_nll") :+
        when(col("avg_nll") <= col("c1"), "head")
          .when(col("avg_nll") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"): _*)
      .orderBy("doc_id")
  }

  /** Rolling polynomial fingerprint over the document's characters:
    * fold(acc, ch) = (acc * 31 + codepoint(ch)) mod 1_000_000_007.
    * One 64-bit value per doc — the cheap exact-dup / shard-routing
    * key (8 bytes shuffled instead of the body). */
  def fingerprint(docs: DataFrame): DataFrame =
    graft.Engine.fanOut(docs).select(
      col("doc_id"),
      graft.functions.NativeExpressions.poly_fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
}
