package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main for the hybrid-retrieval serving family —
  * the last serving surface without scale evidence beyond sf0.1. The
  * serving TVFs are bounded BY CONTRACT (each leg emits ≤ k_per_leg
  * rows per query, fusion moves ≤ legs·k_per_leg·batch rows, the
  * batch cap is enforced at 10k); this probe turns the contract into
  * a measured number: task-level SHUFFLE rows per tier at 1×/20×/100×
  * the sf0.1 corpus, so the claim "fusion exchanges do not grow with
  * the corpus" is evidence, not prose.
  *
  * Corpus scaling marries the two sibling probes' semantics — the
  * text side is salted like FuzzyScaleProbe (cross-replica docs share
  * no shingles, so lexical hit density per query matches the base
  * corpus), the vector side is jittered like AnnScaleProbe (replicas
  * are near-distribution fresh vectors, not clones) — and both sides
  * share ONE id offset (the documents max+1), so replicated vec_ids
  * remain a subset of replicated doc_ids and fusion overlap semantics
  * match the base corpus.
  *
  * Tiers per scale, same frozen 100-query batch throughout:
  *
  *   - lex: [[graft.pipeline.TextIndex.searchMany]] alone — the
  *     bucket-pruned postings leg. Its shuffle rows may grow with
  *     matched postings (sub-linear via bucket pruning).
  *   - dense: [[graft.pipeline.Embeddings.ivfTopKIndexedFor]]
  *     (adaptive, the corpus_hybrid setting) alone — the
  *     partition-pruned IVF leg.
  *   - hybrid_batch: the FULL `corpus_hybrid` TVF through SQL
  *     (queries=> parquet) — legs + RRF fusion end-to-end. The
  *     fusion-attributable exchange is hybrid − lex − dense, checked
  *     against the legs·k_per_leg·batch algebra bound.
  *   - hybrid_one: the TVF single-query shape (serving latency
  *     floor).
  *
  * Measurement harness only — fusion CORRECTNESS is the oracle
  * gate's job (q_hybrid_*, q_sql_hybrid_weighted rows).
  *
  * Output: HYBRID_SCALE.md — per (tier, scale) wall seconds and
  * shuffle rows, index build seconds, and the fusion-bound check.
  */
object HybridScaleProbe {

  /** Sums task shuffle-read rows between reset() and read — one tier
    * runs at a time, so attribution is by interval (the
    * TextScaleProbe stance). */
  private final class ShuffleMeter extends SparkListener {
    private val rows = new java.util.concurrent.atomic.AtomicLong()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null) {
        rows.addAndGet(e.taskMetrics.shuffleReadMetrics.recordsRead)
        ()
      }
    def reset(): Unit = rows.set(0L)
    def value: Long = rows.get()
  }

  /** Replicate documents (salted text) and embeddings (jittered
    * vectors) k× under ONE shared id offset; returns the scale dir. */
  private def scaled(spark: SparkSession, baseDir: String, k: Int,
                     outDir: String): String = {
    val dir = s"$outDir/x$k"
    val done = new org.apache.hadoop.fs.Path(s"$dir/_PROBE_DATA")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(done)) return dir
    val docs = graft.Engine.table(spark, baseDir, "documents")
      .select("doc_id", "text")
    val emb = graft.Engine.table(spark, baseDir, "embeddings")
      .select("vec_id", "embedding")
    val offset = docs.agg(max("doc_id")).head().getLong(0) + 1L
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(k - 1))).as("rep"))
      .select((col("doc_id") + col("rep") * offset).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("((\\S+ ){4})"),
            concat(lit("$1zqr"), col("rep"), lit("salt ")))).as("text"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    emb
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(k - 1))).as("rep"))
      .select((col("vec_id") + col("rep") * offset).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, j) =>
            (x + ((pmod(xxhash64(col("vec_id"), col("rep"), j), lit(2001))
              - lit(1000)).cast("double") / 20000.0)).cast("float")))
          .as("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    fs.create(done, true).close()
    dir
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_HYBRID_OUT", "/tmp/graft_hybrid_scale")
    val report = sys.env.getOrElse("SPARK_GRAFT_HYBRID_REPORT", "HYBRID_SCALE.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.sources.GraftExtensions)
      .getOrCreate()
    graft.Engine.tune(spark)
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    import graft.pipeline.{Embeddings, TextIndex}
    import spark.implicits._

    val batchN = 100
    val kPerLeg = 20
    val scales = Seq(1, 20, 100)
    val dirs = scales.map(k => k -> scaled(spark, baseDir, k, outDir)).toMap

    // ONE frozen query batch across all scales: the base corpus's
    // first 100 vectors (disjoint re-keyed id space) paired with the
    // first 4 words of the same-id document's text — real terms that
    // hit postings at every scale (replica salting never removes the
    // base replica's grams).
    val batchPath = s"$outDir/queries.parquet"
    locally {
      val fs = new org.apache.hadoop.fs.Path(batchPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$batchPath/_SUCCESS"))) {
        val docs = graft.Engine.table(spark, baseDir, "documents")
          .select(col("doc_id"), concat_ws(" ",
            slice(split(col("text"), "\\s+"), 1, 4)).as("query"))
        graft.Engine.table(spark, baseDir, "embeddings")
          .filter(col("vec_id") < batchN)
          .join(docs, col("vec_id") === col("doc_id"))
          .select((col("vec_id") + 5000000L).as("query_id"),
            col("query"), col("embedding"))
          .coalesce(1).write.mode("overwrite").parquet(batchPath)
      }
    }
    val batch = spark.read.parquet(batchPath).cache()
    val nBatch = batch.count()

    def time[A](f: => A): (A, Double, Long) = {
      spark.catalog.clearCache()
      batch.cache().count()
      System.gc()
      // the listener bus is async; drain queued task-end events from
      // the previous tier before resetting the meter
      Thread.sleep(500)
      meter.reset()
      val t0 = System.nanoTime()
      val a = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      (a, secs, meter.value)
    }

    case class Cell(build: Double, nlist: Int,
                    lex: Double, lexSh: Long,
                    den: Double, denSh: Long,
                    hyb: Double, hybSh: Long,
                    one: Double, oneSh: Long,
                    fuse: Double, fuseSh: Long, rows: Long)
    val cells = scales.map { k =>
      val dir = dirs(k)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val nlist = math.max(16, math.round(math.sqrt(n.toDouble)).toInt)
      val tIdx = s"$dir/text_idx"
      val vIdx = s"$dir/ivf_n$nlist"
      val built = new org.apache.hadoop.fs.Path(s"$dir/_PROBE_BUILT")
      val fs = built.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val (_, tBuild, _) =
        if (fs.exists(built)) ((), Double.NaN, 0L)
        else time {
          fs.delete(new org.apache.hadoop.fs.Path(tIdx), true)
          fs.delete(new org.apache.hadoop.fs.Path(vIdx), true)
          TextIndex.write(docs, tIdx)
          Embeddings.writeIvfIndex(emb, vIdx, nlist = nlist)
          fs.create(built, true).close()
        }
      val terms = batch.select(col("query_id"),
        split(lower(col("query")), "\\s+").as("terms"))
      val qVecs = batch.select(col("query_id"), col("embedding"))
      // ONE action per tier — a second action re-executes the whole
      // DAG and double-bills the meter (the bug the first cut of this
      // probe shipped: hybrid read ≈ 2×(lex+dense) shuffle rows)
      val (lexRows, tLex, shLex) = time {
        TextIndex.searchMany(spark, tIdx, terms, kPerLeg).count()
      }
      val (denRows, tDen, shDen) = time {
        Embeddings.ivfTopKIndexedFor(qVecs, vIdx, kPerLeg,
          nprobe = 8, adaptive = true).count()
      }
      val hybSql = s"SELECT * FROM corpus_hybrid('$tIdx', '$vIdx', " +
        s"queries=>'$batchPath', k=>10, k_per_leg=>$kPerLeg, nprobe=>8)"
      val (rows, tHyb, shHyb) = time {
        spark.sql(hybSql).count()
      }
      val one = batch.filter(col("query_id") === 5000007L)
        .select(col("query"), col("embedding")).head()
      val oneVec = one.getSeq[Float](1).map(_.toString).mkString(",")
      val (_, tOne, shOne) = time {
        spark.sql(s"SELECT * FROM corpus_hybrid('$tIdx', '$vIdx', " +
            s"'${one.getString(0).replace("'", "")}', " +
            s"embedding=>'$oneVec', k=>10, k_per_leg=>$kPerLeg, nprobe=>8)")
          .count()
      }
      assert(lexRows > 0 && denRows > 0, s"legs must serve at x$k")
      // DIRECT fusion measurement: legs materialized (untimed), then
      // rrfFuseMany metered alone — subtraction (hybrid − legs) is
      // polluted by per-leg execution variance (the adaptive escape's
      // data-dependent second pass), so the bound check uses this
      val lexW = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
      TextIndex.searchMany(spark, tIdx, terms, kPerLeg)
        .withColumn("rank", row_number().over(lexW).cast("int"))
        .select("query_id", "doc_id", "rank")
        .write.mode("overwrite").parquet(s"$dir/leg_lex")
      Embeddings.ivfTopKIndexedFor(qVecs, vIdx, kPerLeg,
          nprobe = 8, adaptive = true)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").cast("int").as("rank"))
        .write.mode("overwrite").parquet(s"$dir/leg_den")
      val (fusedRows, tFuse, shFuse) = time {
        graft.pipeline.Retrieval.rrfFuseMany(
          Seq(spark.read.parquet(s"$dir/leg_lex"),
            spark.read.parquet(s"$dir/leg_den")), "doc_id", 60, 10).count()
      }
      assert(fusedRows > 0)
      println(f"[hybrid-scale] x$k%-3d lex=${tLex}%6.2fs/$shLex%d " +
        f"dense=${tDen}%6.2fs/$shDen%d hybrid=${tHyb}%6.2fs/$shHyb%d " +
        f"one=${tOne}%6.2fs/$shOne%d fuse=${tFuse}%6.2fs/$shFuse%d rows=$rows%d")
      k -> Cell(tBuild, nlist, tLex, shLex, tDen, shDen,
        tHyb, shHyb, tOne, shOne, tFuse, shFuse, rows)
    }.toMap

    // fusion algebra bound: rrfFuseMany's exchanges see the union of
    // per-leg top-k frames (≤ legs·k_per_leg·batch rows) twice — the
    // fuse groupBy and the per-query rank window
    val fusionBound = 2L * 2L * kPerLeg * nBatch
    val sb = new StringBuilder
    sb ++= "# HYBRID_SCALE — hybrid retrieval serving at 1×/20×/100× the sf0.1 corpus\n\n"
    sb ++= s"Base: `$baseDir` — documents salted per replica (FuzzyScaleProbe\n"
    sb ++= "semantics), embeddings jittered per replica (AnnScaleProbe\n"
    sb ++= "semantics), ONE shared id offset so vec_ids stay a subset of\n"
    sb ++= s"doc_ids. Frozen batch of $nBatch (query, embedding) pairs; text\n"
    sb ++= s"index + IVF (nlist ~ √N, nprobe 8, adaptive) per scale; k_per_leg $kPerLeg,\n"
    sb ++= "fused k 10. `sh` = task-level shuffle rows read in the tier's\n"
    sb ++= "interval (the fusion contract made measurable).\n\n"
    sb ++= "| scale | vectors | nlist | build s | lex s / sh | dense s / sh | hybrid batch s / sh | hybrid one s / sh |\n"
    sb ++= "|---|---|---|---|---|---|---|---|\n"
    scales.foreach { k =>
      val c = cells(k)
      val nVec = 2000L * k
      sb ++= f"| x$k | ${nVec} | ${c.nlist} | ${c.build}%.1f | ${c.lex}%.2f / ${c.lexSh} " +
        f"| ${c.den}%.2f / ${c.denSh} | ${c.hyb}%.2f / ${c.hybSh} | ${c.one}%.2f / ${c.oneSh} |\n"
    }
    sb ++= "\n## Fusion exchange bound\n\n"
    sb ++= s"Algebra: fusion sees ≤ legs·k_per_leg·batch = ${2 * kPerLeg * nBatch} rows per\n"
    sb ++= s"exchange, 2 exchanges (fuse group-by + rank window) → ≤ $fusionBound rows\n"
    sb ++= "at ANY corpus scale. Measured DIRECTLY (legs materialized to\n"
    sb ++= "parquet, rrfFuseMany metered alone — subtraction hybrid−legs is\n"
    sb ++= "polluted by the adaptive escape's data-dependent second pass):\n\n"
    sb ++= "| scale | fuse s | fuse shuffle rows | ≤ bound? |\n"
    sb ++= "|---|---|---|---|\n"
    scales.foreach { k =>
      val c = cells(k)
      sb ++= f"| x$k | ${c.fuse}%.2f | ${c.fuseSh} | ${if (c.fuseSh <= fusionBound) "yes" else "NO"} |\n"
    }
    val c1 = cells(scales.head); val cN = cells(scales.last)
    sb ++= "\nReading: fusion cost is a function of (legs, k_per_leg, batch)\n"
    sb ++= f"only — x${scales.head}: ${c1.fuseSh} rows, x${scales.last}: ${cN.fuseSh} rows against\n"
    sb ++= f"${scales.last / scales.head}× the corpus. The end-to-end hybrid−legs residual\n"
    sb ++= f"(x${scales.head}: ${c1.hybSh - c1.lexSh - c1.denSh}, x${scales.last}: ${cN.hybSh - cN.lexSh - cN.denSh}) tracks the dense\n"
    sb ++= "escape-pass variance, not fusion.\n"
    sb ++= "\n## Leg shapes (the honest part)\n\n"
    sb ++= "The DENSE leg is pruned: IVF cell probes bound its shuffle to the\n"
    sb ++= f"probed cells' rows (~nprobe·N/nlist ≈ nprobe·√N — x1 ${c1.denSh}\n"
    sb ++= f"→ x100 ${cN.denSh} rows on 100× data). The LEXICAL leg's shuffle\n"
    sb ++= f"grows with MATCHED POSTINGS (x1 ${c1.lexSh} → x100 ${cN.lexSh}):\n"
    sb ++= "bucket pruning bounds which postings FILES are read to the query\n"
    sb ++= "terms' buckets, but exhaustive-exact BM25 must then score every\n"
    sb ++= "(query, matching doc) pair — for common-term queries (this batch\n"
    sb ++= "deliberately uses each document's first words) matched postings ≈\n"
    sb ++= "Σ df(term) which is linear in the corpus. That cost is inherent to\n"
    sb ++= "the EXACT top-k semantics the oracle gate pins (DuckDB computes the\n"
    sb ++= "same exhaustive score); rare-term workloads prune naturally (df is\n"
    sb ++= "the bound, not N). The 100-TB mitigation path, if exact common-term\n"
    sb ++= "serving at interactive latency becomes a requirement, is\n"
    sb ++= "impact-ordered postings with MaxScore/WAND-style skipping (still\n"
    sb ++= "exact) — an additive index layout change, orthogonal to fusion,\n"
    sb ++= "which this probe shows is already scale-clean.\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(report), sb.toString)
    println(s"[hybrid-scale] wrote $report")
    spark.stop()
  }
}
