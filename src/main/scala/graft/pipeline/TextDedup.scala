package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines, at shuffle scale.
  *
  * All operators take a `documents`-shaped DataFrame
  * (doc_id bigint, text string, ...) and are pure DataFrame→DataFrame
  * transforms, so Catalyst plans and AQE re-plans them like any other
  * relational operator.
  *
  * Scale design (100 TB stance):
  *  - exact dedup is a single hash-shuffle on a 64-bit fingerprint of
  *    the text (not the text itself) — the shuffle carries 8 bytes +
  *    doc_id per row, not the document body;
  *  - the n-gram similarity join is the classic inverted-index
  *    (shingle → doc) co-occurrence join: work is proportional to the
  *    number of co-occurring shingle pairs, never n²;
  *  - MinHash+LSH replaces the similarity join's candidate generation
  *    with banded signature buckets: cost O(n · perms) + one shuffle
  *    on (band, signature), the standard sub-quadratic path;
  *  - SimHash buckets 64-bit signatures by 16-bit chunks (4 chunks →
  *    recall 1.0 for hamming ≤ 3 by pigeonhole);
  *  - every candidate pair is verified with the exact Jaccard before
  *    being emitted, so approximate candidate generation never changes
  *    the result set, only the cost of finding it.
  */
object TextDedup {

  /** Whitespace tokens of lower-cased trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Distinct word k-shingles ("w1 w2 w3"). Empty for docs with < k tokens. */
  def shingles(text: Column, k: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= k,
      array_distinct(transform(sequence(lit(0), size(w) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(w, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: one surviving doc_id (the smallest) per distinct text.
    * Shuffles (fingerprint, text) → min(doc_id); the fingerprint keeps
    * hash partitioning cheap while text equality guards collisions.
    * (Reference has no dedup; this is the driver-mandated extension.) */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("fp"), col("text"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")

  private def withShingles(docs: DataFrame, k: Int): DataFrame =
    graft.Engine.fanOut(docs)
      .select(col("doc_id"), shingles(col("text"), k).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Verify candidate pairs (doc_a, doc_b) against exact Jaccard of the
    * docs' distinct shingle sets; emit pairs with jaccard >= threshold.
    * Candidates are expected to be a small filtered set, so the shingle
    * arrays are joined back broadcast-style by doc_id. */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .withColumn("co", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("co") / (size(col("sh_a")) + size(col("sh_b")) - col("co")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard similarity join: emit (doc_a, doc_b, jaccard)
    * for all pairs with word-k-shingle Jaccard >= threshold.
    * Inverted-index plan: explode shingles, self-join on shingle to
    * count co-occurrences (only pairs sharing >= 1 shingle are ever
    * materialized), then one arithmetic step for the union size. */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = withShingles(docs, k)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val co = inv.as("x").join(inv.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).cast("double").as("co"))
    co.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", col("co") / (col("na") + col("nb") - col("co")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  // --- MinHash + LSH ------------------------------------------------

  /** MinHash signature column (array<bigint> of `perms` mins) over the
    * doc's shingle set — native expression (graft.functions); the
    * equivalent nested transform/array_min HOFs evaluate one boxed
    * lambda per (perm × shingle) and dominated the sf0.1 bench. */
  def minhashSignature(sh: Column, perms: Int): Column =
    graft.functions.NativeExpressions.minhash_sig(sh, perms)

  /** MinHash-LSH near-dup pairs. Signatures are banded (`bands` ×
    * `rowsPerBand`); docs sharing any band bucket become candidates;
    * candidates are verified with exact Jaccard. With 16×4 over
    * threshold 0.8 the candidate-miss probability per true pair is
    * (1 - 0.8^4)^16 ≈ 2e-4, so the verified output matches the exact
    * join w.h.p. while scanning each doc only once. */
  def minhashLshPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.8,
                      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sh = withShingles(docs, k)
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), bands * rowsPerBand))
    val banded = sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          bnd => struct(bnd.as("band"),
            slice(col("sig"), bnd * rowsPerBand + 1, lit(rowsPerBand)).cast("array<string>").as("key"))))
          .as("bk"))
      .select(col("doc_id"), col("bk.band"), concat_ws(",", col("bk.key")).as("key"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cands, sh, threshold)
  }

  // --- SimHash ------------------------------------------------------

  /** 64-bit SimHash over the token multiset: bit k is set iff the sum
    * of ±1 contributions (sign of bit k of xxhash64(token)) is > 0.
    * Exposed as `chunks` equal bit-chunks (array<bigint>) for banded
    * lookup: by pigeonhole, two docs within hamming distance
    * `chunks - 1` share at least one chunk. Narrower chunks buy
    * recall at the cost of larger random-collision buckets
    * (bucket count = 2^(64/chunks)) — 8×8 suits near-dup thresholds
    * around Jaccard 0.8; at larger corpus scale pair generation cost
    * grows as n²/2^(64/chunks) per chunk, so widen chunks (or add a
    * second banding key) as n grows. */
  def simhashChunks(text: Column, chunks: Int = 8): Column = {
    graft.functions.NativeExpressions.simhash_chunks(tokens(text), chunks)
  }

  /** SimHash near-dup pairs: chunk-bucket candidates, then exact
    * Jaccard verification (same emitted semantics as the other dedup
    * variants — candidate generation is the only thing that differs). */
  def simhashPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = withShingles(docs, k)
    val chunked = graft.Engine.fanOut(docs)
      .select(col("doc_id"), simhashChunks(col("text")).as("chunks"))
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_idx", "chunk_val")))
    val cands = chunked.as("x").join(chunked.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") && col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cands, sh, threshold)
  }
}
