package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement main for the fuzzy/near-dup family beyond the
  * fixtures' largest SF: replicates the sf0.1 `documents` table 5× and
  * 10× ("sf0.5"/"sf1.0" equivalents) and times the similarity-join
  * family at each scale, recording the freq-join broadcast decision
  * ([[graft.operators.SimilarityJoin]] leaves the (df, gram) exchange
  * to AQE's runtime broadcast conversion — the question at scale is
  * exactly when the freq side crosses the conversion bound and the
  * plan degrades gracefully to a shuffle join, not a cliff).
  *
  * Replication semantics, so the measurement probes SCALE and not a
  * DIFFERENT problem: replica i offsets doc_id by i·(max+1) and salts
  * the text with a replica-specific token after every 4 words —
  * word-3-shingles across replicas then share (almost) no grams, so
  * cross-replica docs are NOT near-duplicates and the duplicate-rate
  * per doc matches the base corpus instead of multiplying by the
  * replica count (10 exact clones of every doc would measure a
  * corpus with 10× the duplication density, which no real 10× crawl
  * has). This is a measurement harness over driver-replicated
  * fixture data, not a new test input — correctness is out of scope
  * here (the oracle gate runs at real SFs).
  *
  * Output: FUZZY_SCALE.md — per (query, scale) wall seconds, the
  * observed broadcast decision, and the sf0.1→sf1.0 ratio vs the 10×
  * data ratio.
  */
object FuzzyScaleProbe {

  private[tools] def scaled(spark: SparkSession, baseDir: String, k: Int,
                            outDir: String): String = {
    val path = s"$outDir/x$k/documents.parquet"
    val done = new org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(done)) return s"$outDir/x$k"
    val base = graft.Engine.table(spark, baseDir, "documents")
    val offset = base.agg(max("doc_id")).head().getLong(0) + 1L
    val replicas = (0 until k).map { i =>
      if (i == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(i * offset))
        .withColumn("text", regexp_replace(col("text"),
          "((\\S+ ){4})", s"$$1zqr${i}salt "))
    }
    replicas.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(path)
    s"$outDir/x$k"
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_FUZZY_OUT", "/tmp/graft_fuzzy_scale")
    val report = sys.env.getOrElse("SPARK_GRAFT_FUZZY_REPORT", "FUZZY_SCALE.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.sources.GraftExtensions)
      .getOrCreate()
    graft.Engine.tune(spark)

    val queries = Seq("q_sim_join", "q_sim_link", "q_fuzzy_link", "dedup_minhash")
    val scales = Seq(1, 5, 10)
    val dirs = scales.map(k => k -> scaled(spark, baseDir, k, outDir)).toMap

    case class Cell(sec: Double, broadcasts: Int, shuffleJoins: Int, rows: Long)
    val grid = for (q <- queries; k <- scales) yield {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dirs(k))
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val b = "BroadcastHashJoin".r.findAllIn(plan).size
      val s = "SortMergeJoin".r.findAllIn(plan).size +
        "ShuffledHashJoin".r.findAllIn(plan).size
      val rows = df.count()
      println(f"[fuzzy-scale] $q%-14s x$k%-2d ${sec}%8.2fs  bhj=$b smj/shj=$s rows=$rows")
      (q, k) -> Cell(sec, b, s, rows)
    }
    val m = grid.toMap
    val sb = new StringBuilder
    sb ++= "# FUZZY_SCALE — similarity-join family at 1×/5×/10× the sf0.1 corpus\n\n"
    sb ++= s"Base: `$baseDir` documents replicated with per-replica salt tokens\n"
    sb ++= "(cross-replica docs are NOT near-dups — duplicate density matches the\n"
    sb ++= "base corpus; see FuzzyScaleProbe scaladoc). `bhj` = broadcast hash\n"
    sb ++= "joins in the AQE final plan, `sj` = sort-merge/shuffled-hash joins —\n"
    sb ++= "the freq-join broadcast decision at each scale is the bhj/sj shift.\n\n"
    sb ++= "| query | 1× s | 5× s | 10× s | 10×/1× ratio | bhj/sj @1× | @5× | @10× | rows @10× |\n"
    sb ++= "|---|---|---|---|---|---|---|---|---|\n"
    queries.foreach { q =>
      val c1 = m((q, 1)); val c5 = m((q, 5)); val c10 = m((q, 10))
      sb ++= f"| $q | ${c1.sec}%.2f | ${c5.sec}%.2f | ${c10.sec}%.2f | ${c10.sec / c1.sec}%.1f× " +
        f"| ${c1.broadcasts}/${c1.shuffleJoins} | ${c5.broadcasts}/${c5.shuffleJoins} " +
        f"| ${c10.broadcasts}/${c10.shuffleJoins} | ${c10.rows} |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(report), sb.toString)
    println(s"[fuzzy-scale] wrote $report")
    spark.stop()
  }
}
