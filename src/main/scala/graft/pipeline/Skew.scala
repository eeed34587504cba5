package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planned-ahead skew handling. AQE's skew-join splits oversized
  * shuffle partitions at runtime (enabled in Engine.tune), but two
  * cases want explicit salting: (a) a shuffle AGGREGATION on a hot key
  * (AQE cannot split a single group), and (b) joins where the skew is
  * known up front and re-planning mid-stage is wasted work. On a
  * training corpus the canonical instance is (a): counting/joining by
  * a low-cardinality key (language, source domain, dedup cluster id)
  * where one value owns most of the corpus. */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Salt derived from the FULL row content (every column hashed), not
    * from `monotonically_increasing_id()`: the id is partition-
    * dependent, so a map task recomputed after executor loss could
    * re-salt rows differently — Spark then has to mark the stage
    * indeterminate and rerun it wholesale, exactly the failure
    * amplification a 100 TB job can't afford. A content hash is a pure
    * function of the row: retries reproduce it bit-for-bit and the
    * plan stays deterministic. Identical duplicate rows co-salt, which
    * is harmless for aggregation (map-side combine collapses them per
    * task anyway) and only weakens join salting if the hot key's rows
    * are full-row duplicates — callers with that shape should carry a
    * unique id column, which the hash then picks up. */
  private def contentSalt(df: DataFrame, salts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts.toLong))

  /** Skew-safe equi-join: the skewed (big) side gets a deterministic
    * row salt; the small side is replicated `salts` times; the join
    * key becomes (key, salt), so one hot key spreads over `salts`
    * reducers instead of one. Result is identical to
    * `big.join(small, keys)` — salting only changes the partitioning.
    * Cost: small side ×`salts` (keep it the dimension side). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn(SaltCol, contentSalt(big, salts))
    val saltedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, keys :+ SaltCol).drop(SaltCol)
  }

  /** Skew-safe aggregation: two-phase combine. Phase 1 groups by
    * (key, salt) — the hot key's rows split over `salts` partial
    * groups, each map-side combined as usual; phase 2 merges the
    * `salts` partials per key. `partials` maps each aggregation to
    * its (phase-1 expr, phase-2 merge) pair, e.g.
    * `("cnt", count(lit(1)), sum(col("cnt")))`. */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                partials: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)],
                salts: Int = 16): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn(SaltCol, contentSalt(df, salts))
    val phase1 = salted.groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map(p => p._2.as(p._1)): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(partials.head._3.as(partials.head._1),
        partials.tail.map(p => p._3.as(p._1)): _*)
  }
}
