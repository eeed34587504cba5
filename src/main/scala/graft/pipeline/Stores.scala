package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The engine's shared generation-store convention, as ONE mechanism
  * instead of a copied idiom: a store lives at `dir/base` until a
  * maintenance pass writes `dir/base_v<N>` and commits it with a
  * marker file; readers resolve the highest COMMITTED generation and
  * need zero coordination with writers, the replaced generation
  * survives one cycle as the grace copy for plans that resolved it
  * pre-swap. Used by the band index and IVF corpus stores
  * ([[TextDedup]], [[Embeddings]]), the corpus-of-record MERGE store
  * ([[CorpusStore]]), and the inverted text index ([[TextIndex]] —
  * which commits with its own marker because Spark's `_SUCCESS` lands
  * mid-build there). */
private[graft] object Stores {

  /** Highest committed `dir/base_v<N>`, else `dir/base`. */
  def liveGeneration(spark: SparkSession, dir: String, base: String,
                     marker: String = "_SUCCESS"): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed: Seq[Int] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).map(_.getPath.getName).toSeq
        .collect { case n if n.startsWith(s"${base}_v") => n.stripPrefix(s"${base}_v") }
        .flatMap(v => scala.util.Try(v.toInt).toOption)
        .filter(v => fs.exists(new Path(s"$dir/${base}_v$v/$marker")))
    if (committed.isEmpty) s"$dir/$base" else s"$dir/${base}_v${committed.max}"
  }

  /** Every generation still on disk, ascending version: the base
    * (version 0) if present, plus each committed `dir/base_v<N>`.
    * Under the one-cycle grace retention this is at most (grace,
    * live) — the bounded time-travel window. */
  def generations(spark: SparkSession, dir: String, base: String,
                  marker: String = "_SUCCESS"): Seq[(Int, String)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val versioned = fs.listStatus(p).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith(s"${base}_v") => n.stripPrefix(s"${base}_v") }
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .filter(v => fs.exists(new Path(s"$dir/${base}_v$v/$marker")))
      .map(v => v -> s"$dir/${base}_v$v")
    val baseGen =
      if (fs.exists(new Path(s"$dir/$base"))) Seq(0 -> s"$dir/$base") else Seq.empty
    (baseGen ++ versioned).sortBy(_._1)
  }
}
