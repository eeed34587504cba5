package graft.pipeline

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for keyword retrieval — the serving path
  * of [[TextAnalysis.bm25]]: scoring a query against a 100 TB corpus
  * must read the QUERY TERMS' postings, not the corpus. Completes the
  * engine's index triptych (IVF for vectors, band index for near-dup,
  * this for keywords), with the same store conventions throughout:
  * frozen scheme in `meta/`, bucket-partitioned stores, O(batch)
  * appends, tombstoned takedowns, `_SUCCESS`-committed generation
  * swaps with one-cycle grace, single maintenance writer.
  *
  * Layout:
  *   dir/meta/                  one row (buckets), frozen at build
  *   dir/postings[_v<N>]/       (term, doc_id, tf, len) partitioned by
  *                              bucket = pmod(xxhash64(term), buckets);
  *                              `len` is the doc's token count
  *                              DENORMALIZED into every posting — the
  *                              standard IR trade that makes scoring
  *                              one pruned scan
  *   dir/postings…/_stats/      (n_docs, total_len) DELTA rows, one
  *                              per write/append — readers SUM them.
  *                              Underscore dir: invisible to the
  *                              postings parquet reader, and it RIDES
  *                              THE GENERATION, so a compaction swap
  *                              replaces postings and stats atomically
  *   dir/tombstones/            doc_id takedowns
  *
  * [[search]] cost at 100 TB: `bucket IN (query-term buckets)` prunes
  * every other partition directory; `term IN (...)` pushes into the
  * probed buckets' scan. Document frequencies come from the same
  * pruned scan; (N, avgdl) from the summed stats deltas. Nothing
  * corpus-sized moves.
  *
  * Delete semantics: a tombstoned doc leaves RESULTS immediately
  * (anti-join above the pruned scan), and the global (N, avgdl, df)
  * statistics track it immediately too — df comes from the
  * tombstone-excluded scan, and [[statsOf]] folds the tombstoned
  * docs' (count, token length) out of the summed deltas (one cached
  * column-pruned pass per takedown batch) — so pre-compact scores
  * equal a rebuild over the survivors; [[compact]] then purges the
  * postings and snaps the stats back to a single exact row.
  */
object TextIndex {

  /** Generation commit marker. NOT Spark's `_SUCCESS`: the compaction
    * writes the rewritten postings (Spark commits `_SUCCESS` there)
    * and THEN the generation's `_stats` — a `_SUCCESS`-keyed resolve
    * would publish the generation in the window where its stats do
    * not exist yet (readers would crash on the missing `_stats`, and
    * permanently so if the compactor died in that window). The marker
    * is written explicitly, last. */
  private val CommitMarker = "_GRAFT_COMMIT"

  private def liveStore(spark: SparkSession, dir: String): String =
    Stores.liveGeneration(spark, dir, "postings", CommitMarker)

  /** Positional postings: `positions` holds the term's 0-based token
    * offsets within the doc (sorted) — tf is its size, and phrase
    * queries resolve by intersecting shifted position sets without
    * ever touching the original text. */
  private def postings(docs: DataFrame, buckets: Int): DataFrame = {
    val toks = graft.Engine.fanOut(docs)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "term")))
      .filter(length(col("term")) > 0)
    toks.groupBy("doc_id", "term")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("tf", size(col("positions")).cast("long"))
      .withColumn("len", sum("tf").over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      .select("term", "doc_id", "tf", "len", "positions", "bucket")
  }

  /** The index's document scope is NON-BLANK docs — the same
    * population [[TextAnalysis.bm25]] models and [[compact]]'s exact
    * recompute (distinct over surviving postings) can see; counting
    * blank/null docs here would desynchronize (N, avgdl) from both. */
  private def writeStatsDelta(docs: DataFrame, store: String): Unit =
    docs.filter(length(trim(col("text"))) > 0)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("len"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("len"), lit(0L)).as("total_len"))
      .coalesce(1).write.mode("append").parquet(s"$store/_stats")

  /** Build the base index over `docs` (doc_id, text). */
  def write(docs: DataFrame, dir: String, buckets: Int = 64): Unit = {
    require(buckets >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    Seq(buckets).toDF("buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.listStatus(p).map(_.getPath)
      .filter(q => q.getName.startsWith("postings") ||
        q.getName == "tombstones" || q.getName == "purged")
      .foreach(q => fs.delete(q, true))
    postings(docs, buckets)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    writeStatsDelta(docs, s"$dir/postings")
  }

  /** O(batch) maintenance: append a batch's postings + one stats delta
    * into the LIVE generation under the frozen bucket scheme. Build +
    * appends serves row-identically to a fresh build over the union
    * (bucket assignment is a pure function of the term). */
  def append(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val buckets = spark.read.parquet(s"$dir/meta").head().getAs[Int]("buckets")
    val store = liveStore(spark, dir)
    postings(docs, buckets)
      .write.mode("append").partitionBy("bucket").parquet(store)
    writeStatsDelta(docs, store)
  }

  /** Takedowns: O(batch) tombstone append; the ids stop appearing in
    * [[search]] results immediately. */
  def delete(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("doc_id").distinct()
      .coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
  }

  private def tombstoneFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(s"$dir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      fs.listStatus(p).map(_.getPath.toString).filter(_.endsWith(".parquet")).toSeq
    else Seq.empty
  }

  private def statsFiles(spark: SparkSession, store: String): Seq[String] = {
    val p = new Path(s"$store/_stats")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath.toString).filter(_.endsWith(".parquet")).toSeq
  }

  /** (n_docs, total token count) as the readers see them: the live
    * generation's summed stats deltas MINUS the tombstoned docs still
    * sitting in its postings. */
  def stats(spark: SparkSession, dir: String): (Long, Long) =
    statsOf(spark, dir, liveStore(spark, dir), tombstoneFiles(spark, dir))

  /** Operational snapshot of the postings store — what sizes the
    * compaction cadence (the counterpart of
    * [[graft.pipeline.Embeddings.ivfIndexStats]] /
    * [[graft.pipeline.TextDedup.bandIndexStats]]): one row per bucket
    * with posting-row count, parquet file count, on-disk bytes, and
    * the live generation. File geometry from filesystem metadata
    * (bounded by the frozen bucket count); row counts one pruneable
    * aggregate (parquet footer counts — no postings decode). */
  def indexStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val live = liveStore(spark, dir)
    Stores.storeStats(spark, live, "bucket=", "bucket")
      .withColumn("generation", lit(Stores.generationOf(live, "postings")))
      .select("bucket", "n_rows", "n_files", "bytes", "generation")
      .orderBy("bucket")
  }

  /** Layout detection for the SQL surface: a text index is a dir with
    * the frozen-scheme `meta/` AND a postings store (base or any
    * compaction generation) — distinguishes it from a band index
    * (meta + bands) and from a plain corpus parquet. */
  def isTextIndex(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(s"$dir/meta")) && fs.exists(p) &&
      fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        st.isDirectory && (n == "postings" || n.startsWith("postings_v"))
      }
  }

  /** `tombs` is the tombstone-file list the CALLER already resolved —
    * search()/searchMany() pass the exact list their postings
    * anti-join used, so one listing drives both the df exclusion and
    * the (N, avgdl) fold. Listing twice here would race a delete()
    * committing between the two listings: a single query whose df
    * excludes the new takedown while N/avgdl still count it (or vice
    * versa), breaking the resolve-once discipline the generation
    * handling establishes. */
  private def statsOf(spark: SparkSession, dir: String,
                      store: String, tombs: Seq[String]): (Long, Long) = {
    // appends add delta files, compaction swaps the store path — both
    // change the signature, so the cache can never serve stale totals
    val base = Stores.cachedModel(spark, "tidx-stats", s"$store/_stats") {
      val r = spark.read.parquet(statsFiles(spark, store): _*)
        .agg(sum("n_docs"), sum("total_len")).head()
      (r.getLong(0), r.getLong(1))
    }
    // Tombstone fold: subtract the (count, token length) of tombstoned
    // docs STILL PRESENT in this generation's postings, so (N, avgdl)
    // track takedowns immediately instead of waiting for compact — df
    // already does (the pruned scan is tombstone-anti-joined), so
    // post-delete pre-compact scores now equal a rebuild over the
    // survivors exactly (PipelineSpec pins it). One column-pruned
    // (doc_id, len) pass over the store per (generation, tombstone
    // set), cached; after compact purges the docs the same join
    // matches nothing, so the grace-deferred tombstone files can
    // never double-subtract. Tombstone files are immutable
    // (append-only, named uniquely), so their sorted names key the
    // cache entry.
    if (tombs.isEmpty) base
    else {
      val gone = Stores.cachedModel(spark,
        s"tidx-tomb-stats:${tombs.sorted.mkString(",")}", s"$store/_stats") {
        val t = spark.read.parquet(tombs: _*).select("doc_id").distinct()
        val r = spark.read.parquet(store)
          .join(broadcast(t), Seq("doc_id"))
          .select("doc_id", "len").distinct()
          .agg(count(lit(1)), coalesce(sum("len"), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      (base._1 - gone._1, base._2 - gone._2)
    }
  }

  /** Shared query preamble: resolve the live generation ONCE (a
    * compaction committing between two resolutions would mix
    * generations in one query), derive the terms' bucket literals by
    * hashing the tiny term list in Spark (byte-identical to the
    * writer), and return the pruned, tombstone-excluded postings for
    * exactly the query terms — plus the tombstone-file list the
    * exclusion used, so the caller's stats fold sees the SAME
    * takedown set (one listing per query, not two racing ones). */
  private def prunedPostings(spark: SparkSession, dir: String,
                             qTerms: Seq[String]): (String, DataFrame, Seq[String]) = {
    // frozen scheme — signature-cached so the serving path skips the
    // per-query meta job (see Stores.cachedModel)
    val buckets: Integer = Stores.cachedModel(spark, "tidx-meta", s"$dir/meta") {
      Integer.valueOf(
        spark.read.parquet(s"$dir/meta").head().getAs[Int]("buckets"))
    }
    import spark.implicits._
    val termBuckets: Array[Int] = qTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0))
    val store = liveStore(spark, dir)
    val post = spark.read.parquet(store)
      .filter(col("bucket").isin(termBuckets.toIndexedSeq: _*))
      .filter(col("term").isin(qTerms: _*))
    val tombs = tombstoneFiles(spark, dir)
    val live = if (tombs.isEmpty) post
      else post.join(
        broadcast(spark.read.parquet(tombs: _*).select("doc_id").distinct()),
        Seq("doc_id"), "left_anti")
    (store, live, tombs)
  }

  /** BM25 top-k for `terms`: one partition-pruned scan of the query
    * terms' buckets. Deterministic cut (score desc, doc_id asc);
    * scores are the decimal-exact [[TextAnalysis.bm25]] values, so an
    * index built over a corpus scores queries identically to the
    * corpus-scan path (the `q_bm25_indexed` oracle pins this). */
  def search(spark: SparkSession, dir: String, terms: Seq[String], k: Int,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k >= 1)
    val qTerms = terms.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
    val (store, live, tombs) = prunedPostings(spark, dir, qTerms)
    val (nDocs, totalLen) = statsOf(spark, dir, store, tombs)
    val avgdl = totalLen.toDouble / nDocs
    val dfs = live.groupBy("term").agg(count(lit(1)).as("df"))
    live.join(broadcast(dfs), "term")
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(k1) + 1) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / lit(avgdl))))
      .groupBy("doc_id")
      .agg(sum(col("contrib").cast("decimal(28,12)")).as("raw"),
        count(lit(1)).as("n_terms"))
      .select(col("doc_id"), col("raw").cast("double").as("score"), col("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Batch serving: BM25 top-k for MANY queries in one pass — the
    * keyword counterpart of [[Embeddings.ivfTopKIndexedFor]]'s
    * external-query batch shape. `queries` = (query_id, terms
    * array<string>); the batch is driver-bounded by the serving
    * contract (its distinct terms become the bucket-pruning
    * literals, exactly like probed-cell lists). One partition-pruned
    * postings scan covers the UNION of all query terms; per-term
    * (df, idf, contrib) is computed once and fanned out to the
    * queries containing the term through a broadcast of the
    * query-term pairs; the top-k window partitions by query_id, so
    * ranking parallelizes across the batch. Scores are identical to
    * per-query [[search]] calls (spec-pinned) with the same decimal
    * determinism; a query whose terms miss the index simply yields no
    * rows. */
  def searchMany(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1)
    import spark.implicits._
    // bounded collect: the batch is driver-sized by the ENFORCED
    // serving contract (ServingLimits — an oversized batch fails loud
    // naming the cap, never OOMs the driver), and its terms must
    // normalize EXACTLY like [[search]]'s (Scala trim/toLowerCase) —
    // normalizing in Spark SQL instead would diverge on non-space
    // whitespace and locale edge cases, silently missing postings a
    // per-query search would hit
    val pairs: Seq[(Long, String)] = ServingLimits
      .requireMicroBatch("TextIndex.searchMany", "query", queries)
      .select(col("query_id").cast("long"), explode(col("terms")).as("term"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase)
      .filter(_._2.nonEmpty).distinct.toSeq
    // an all-blank (or empty) batch yields no rows, same as a single
    // term-missing query — error/empty behavior must not depend on
    // batch composition
    if (pairs.isEmpty)
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("query_id", "doc_id", "score", "n_terms")
    val q = pairs.toDF("query_id", "term")
    val allTerms: Seq[String] = pairs.map(_._2).distinct
    val (store, live, tombs) = prunedPostings(spark, dir, allTerms)
    val (nDocs, totalLen) = statsOf(spark, dir, store, tombs)
    val avgdl = totalLen.toDouble / nDocs
    val dfs = live.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    live.join(broadcast(dfs), "term")
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(k1) + 1) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / lit(avgdl))))
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

  /** Exact PHRASE search over the positional postings: documents
    * containing the consecutive token sequence `phrase`, ranked by
    * occurrence count (ties by doc_id). The classic positional-index
    * algorithm: a doc matches iff ∩_i (positions(term_i) − i) is
    * non-empty, and the intersection size IS the occurrence count —
    * resolved entirely from the index, the original text is never
    * read. Same pruning as [[search]]: only the phrase terms' bucket
    * partitions are scanned; a phrase with a repeated term prunes to
    * the distinct terms and still intersects per-occurrence correctly
    * (the shifted-set algebra does not care that two shifts came from
    * the same posting). */
  def searchPhrase(spark: SparkSession, dir: String, phrase: String,
                   k: Int): DataFrame = {
    val terms = phrase.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty && k >= 1)
    val n = terms.length
    val distinctTerms = terms.distinct
    val (_, live, _) = prunedPostings(spark, dir, distinctTerms)
    // one row per doc with its term→positions map; docs missing any
    // distinct term cannot match and drop before the intersection
    val perDoc = live
      .select("doc_id", "term", "positions")
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("term"), col("positions"))))
        .as("m"), count(lit(1)).as("nt"))
      .filter(col("nt") === distinctTerms.length)
    val first = col("m")(terms.head)
    val hits = (1 until n).foldLeft(first) { (acc, i) =>
      array_intersect(acc, transform(col("m")(terms(i)), p => p - i))
    }
    perDoc
      .withColumn("n_hits", size(hits).cast("long"))
      .filter(col("n_hits") > 0)
      .select("doc_id", "n_hits")
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(k)
  }

  /** Batch PHRASE serving: exact consecutive-phrase occurrence counts
    * for MANY phrases in ONE pruned postings pass — the positional
    * counterpart of [[searchMany]]. `queries` = driver-side
    * (query_id, phrase) pairs (micro-batch-sized by the serving
    * contract, ids unique — the SQL TVF enforces both).
    *
    * The per-phrase verify is DATA, not plan: each phrase explodes
    * into (query_id, term, offset) instance rows that broadcast-join
    * the pruned postings, and per (query_id, doc_id) the shifted
    * position sets fold-intersect with `aggregate` — so the plan has
    * ONE postings scan and a FIXED operator count regardless of batch
    * size. (The previous route reduced one [[searchPhrase]] leg per
    * phrase into a union: a 10k-phrase batch built a 10k-way plan —
    * analyzer/codegen blowup long before any data cost.) Pruning
    * covers the union of all phrases' distinct terms, so query cost
    * still follows the queries, not the corpus.
    *
    * Rows are identical to per-phrase [[searchPhrase]] calls
    * (spec-pinned): a doc matches iff every term-instance row joined
    * (`nt == n_terms` — repeated terms keep one instance per
    * occurrence, and the shifted-set algebra intersects them
    * per-occurrence exactly like the single-phrase fold); n_hits is
    * the intersection size; per query top-(k) by (n_hits desc,
    * doc_id), output ordered (query_id, doc_id). Blank phrases
    * contribute no rows. */
  def searchPhraseMany(spark: SparkSession, dir: String,
                       queries: Seq[(Long, String)], k: Int): DataFrame = {
    require(k >= 1)
    // same id discipline as phraseCountsMany: the per-query grouping
    // keys on query_id, so duplicate ids would merge two phrases'
    // instance rows into one garbage intersection — loud, not silent
    val dupIds = queries.map(_._1).groupBy(identity)
      .collect { case (id, g) if g.size > 1 => id }
    require(dupIds.isEmpty,
      s"searchPhraseMany: duplicate query_id(s) ${dupIds.mkString(", ")} — " +
        "each id names one phrase's result rows")
    import spark.implicits._
    val inst: Seq[(Long, String, Int, Int)] = for {
      (qid, phrase) <- queries
      terms = phrase.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      (t, i) <- terms.zipWithIndex
    } yield (qid, t, i, terms.length)
    if (inst.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("query_id", "doc_id", "n_hits")
    val q = inst.toDF("query_id", "term", "i", "n_terms")
    val allTerms = inst.map(_._2).distinct
    val (_, live, _) = prunedPostings(spark, dir, allTerms)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("n_hits").desc, col("doc_id"))
    live.select("term", "doc_id", "positions")
      .join(broadcast(q), "term")
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        transform(col("positions"), p => p - col("i")).as("shifted"))
      .groupBy("query_id", "doc_id")
      // n_terms is a function of query_id, so max() just carries it;
      // collect_list order is irrelevant — set intersection commutes
      .agg(max("n_terms").as("n_terms"), count(lit(1)).as("nt"),
        collect_list(col("shifted")).as("arrs"))
      .filter(col("nt") === col("n_terms"))
      .withColumn("hits", aggregate(
        slice(col("arrs"), lit(2), size(col("arrs")) - 1),
        element_at(col("arrs"), 1),
        (acc, a) => array_intersect(acc, a)))
      .withColumn("n_hits", size(col("hits")).cast("long"))
      .filter(col("n_hits") > 0)
      .select(col("query_id"), col("doc_id"), col("n_hits"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .orderBy("query_id", "doc_id")
  }

  /** Ids present in the index (distinct doc_ids of the live postings),
    * optionally including tombstoned AND purged ones — the id-level
    * view [[reconcile]] diffs against. Without the purged-ids ledger a
    * reconcile after compaction would see a purged takedown as
    * "missing" and re-index it from the corpus of record — the
    * resurrection bug class the band/IVF stores already guard. */
  def ids(spark: SparkSession, dir: String,
          includeTombstoned: Boolean = false): DataFrame = {
    val store = liveStore(spark, dir)
    val stored = spark.read.parquet(store).select("doc_id").distinct()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = tombstoneFiles(spark, dir)
    if (includeTombstoned) {
      val ledger = {
        val p = new Path(s"$dir/purged")
        if (fs.exists(p)) fs.listStatus(p).map(_.getPath.toString)
          .filter(_.endsWith(".parquet")).toSeq
        else Seq.empty
      }
      val extra = pending ++ ledger
      if (extra.isEmpty) stored
      else stored.unionByName(
        spark.read.parquet(extra: _*).select("doc_id")).distinct()
    } else if (pending.isEmpty) stored
    else stored.join(
      broadcast(spark.read.parquet(pending: _*).select("doc_id").distinct()),
      Seq("doc_id"), "left_anti")
  }

  /** Targeted O(drift) repair against the corpus of record (the crash
    * window between a corpus append and the index append, in either
    * order): append postings for docs the index is missing, tombstone
    * index ids whose docs are gone. "Missing" diffs against ALL index
    * ids including tombstoned/purged, so a takedown whose doc still
    * sits in the corpus of record stays taken down. Returns (appended,
    * tombstoned). */
  def reconcile(record: DataFrame, dir: String): (Long, Long) = {
    val spark = record.sparkSession
    val rec = record.select(col("doc_id"), col("text"))
    // a tokenless doc produces no postings rows, so it would read as
    // "missing" on every pass and re-append its stats delta forever —
    // it is unindexable by definition (can never match a query), so
    // it is out of scope for the diff
    val indexable = rec.filter(length(trim(col("text"))) > 0)
    // materialize the diff once: count + the two writes inside
    // append() would otherwise re-run the anti-join (which scans the
    // live postings plus both ledgers) three times
    val missing = TextDedup.materialize(
      indexable.join(ids(spark, dir, includeTombstoned = true),
        Seq("doc_id"), "left_anti"),
      eager = true)
    val nMissing = missing.count()
    if (nMissing > 0) append(missing, dir)
    val orphans = ids(spark, dir)
      .join(rec.select("doc_id"), Seq("doc_id"), "left_anti")
    val orphanIds = orphans.collect().map(_.getLong(0)).toSeq
    if (orphanIds.nonEmpty) delete(spark, dir, orphanIds)
    (nMissing, orphanIds.length.toLong)
  }

  /** Physical purge + small-file maintenance, the shared generation
    * protocol ([[TextDedup.compactBandIndex]]): buckets holding
    * tombstoned postings or exceeding `maxFilesPerBucket` rewrite into
    * `postings_v<N+1>`; within-bound buckets carry by raw file copy;
    * the generation becomes visible only when `_SUCCESS` commits, the
    * replaced one stays as the grace copy, older ones prune. The new
    * generation gets ONE exact stats row recomputed from the
    * survivors' distinct (doc_id, len) — so (N, avgdl) snap back to
    * exact after every compaction. Consumed tombstone files are
    * dropped only after the swap commits; a delete racing this pass
    * survives to the next one. Returns buckets rewritten. */
  def compact(spark: SparkSession, dir: String, maxFilesPerBucket: Int = 4): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    // two-phase tombstone consumption with the purged-ids ledger
    // (band/IVF convention): files already ledgered on a prior pass
    // drop now (grace expired); pending ones purge this pass and then
    // enter the ledger — [[ids]](includeTombstoned) unions the ledger,
    // so [[reconcile]] can never resurrect a purged takedown
    val purgedDir = new Path(s"$dir/purged")
    val ledgered: Set[String] =
      if (fs.exists(purgedDir)) fs.listStatus(purgedDir).map(_.getPath.getName).toSet
      else Set.empty
    val (graceExpired, tombs) = tombstoneFiles(spark, dir)
      .partition(f => ledgered.contains(new Path(f).getName))
    graceExpired.foreach(f => fs.delete(new Path(f), false))
    val tombDf = if (tombs.isEmpty) None
      else Some(spark.read.parquet(tombs: _*).select("doc_id").distinct())
    val live = liveStore(spark, dir)
    val bucketDirs = fs.listStatus(new Path(live))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
    def parquets(p: Path) = fs.listStatus(p).filter { s =>
      val n = s.getPath.getName
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    val tombBuckets: Set[Int] = tombDf match {
      case None => Set.empty
      case Some(t) => spark.read.parquet(live).join(broadcast(t), Seq("doc_id"))
        .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    }
    val (rewrite, carry) = bucketDirs.partition { d =>
      parquets(d.getPath).length > maxFilesPerBucket ||
        tombBuckets.contains(d.getPath.getName.stripPrefix("bucket=").toInt)
    }
    if (rewrite.isEmpty && tombs.isEmpty) return 0
    val liveVersion =
      if (live.endsWith("/postings")) 0
      else live.substring(live.lastIndexOf("_v") + 2).toInt
    val next = s"$dir/postings_v${liveVersion + 1}"
    // a torn previous compaction may have left this path uncommitted
    // (no marker) — it is garbage, not a resumable state
    if (fs.exists(new Path(next))) fs.delete(new Path(next), true)
    carry.foreach { d =>
      val dst = new Path(s"$next/${d.getPath.getName}")
      fs.mkdirs(dst)
      parquets(d.getPath).foreach(f =>
        FileUtil.copy(fs, f.getPath, fs,
          new Path(dst, f.getPath.getName), false, conf))
    }
    if (rewrite.nonEmpty) {
      val bs = rewrite.map(_.getPath.getName.stripPrefix("bucket=").toInt).toIndexedSeq
      val toRewrite = spark.read.parquet(live).filter(col("bucket").isin(bs: _*))
      tombDf.map(t => toRewrite.join(broadcast(t), Seq("doc_id"), "left_anti"))
        .getOrElse(toRewrite)
        .repartition(bs.length, col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(next)
    }
    // exact stats from the survivors, INSIDE the new generation; the
    // COMMIT MARKER goes last, so the generation becomes visible only
    // with postings AND stats complete (Spark's own _SUCCESS from the
    // rewrite write above is not the resolve key — see CommitMarker)
    spark.read.parquet(next)
      .select("doc_id", "len").distinct()
      .agg(count(lit(1)).as("n_docs"), sum("len").as("total_len"))
      .coalesce(1).write.mode("overwrite").parquet(s"$next/_stats")
    fs.create(new Path(s"$next/$CommitMarker")).close()
    (0 until liveVersion).foreach { v =>
      val old = new Path(if (v == 0) s"$dir/postings" else s"$dir/postings_v$v")
      if (fs.exists(old)) fs.delete(old, true)
    }
    // consume the snapshotted tombstones into the ledger; the files
    // themselves drop on the NEXT pass (grace for in-flight readers)
    if (tombs.nonEmpty) {
      fs.mkdirs(purgedDir)
      tombs.foreach { f =>
        val p = new Path(f)
        FileUtil.copy(fs, p, fs, new Path(purgedDir, p.getName), false, conf)
      }
    }
    rewrite.length
  }
}
