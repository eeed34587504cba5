package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-similarity joins over strings — the record-linkage /
  * fuzzy-match operators (find near-identical names, titles, URLs):
  * emit every pair whose gram-set Jaccard similarity reaches
  * `thetaNum/thetaDen`, within one table ([[selfJoin]]) or across two
  * ([[join]]). The threshold is a RATIONAL and the verify compares
  * with integer cross-multiplication, so engine and oracle agree
  * bit-for-bit with no float in the decision path.
  *
  * Plan (AllPairs/PPJoin prefix filtering — Bayardo et al. WWW'07,
  * Xiao et al. WWW'08 — re-expressed as three declarative joins):
  *
  *   1. trigram document-frequency table: one groupBy over exploded
  *      trigrams. For ASCII-ish corpora the CHARACTER trigram alphabet
  *      is bounded (≤ |Σ|³ ≈ tens of thousands observed), so the table
  *      broadcasts regardless of corpus size — frequency ordering then
  *      costs no shuffle on the data path. For large-alphabet corpora
  *      (CJK/unicode: millions+ of distinct character trigrams) a
  *      forced broadcast is a driver OOM — there the frequency join
  *      plans as a keyed shuffle instead. By default the choice is
  *      AUTOMATIC and ZERO-COST: the freq join is planned unhinted and
  *      AQE's runtime shuffled→broadcast conversion broadcasts iff the
  *      BUILT freq exchange is small (below
  *      `spark.sql.adaptive.autoBroadcastJoinThreshold`) — the decision
  *      reads the size of an aggregate the plan computes anyway, so no
  *      extra pass over the gram stream ever runs (the round-10 HLL
  *      pre-probe re-scanned and re-exploded the whole corpus per join
  *      call; it is gone). `broadcastFreq = Some(b)` forces the plan
  *      statically for callers who already know their alphabet
  *      (results are identical either way, see OperatorsSpec's CJK
  *      fixture).
  *   2. prefix candidates: each string sorts its trigrams rarest-first
  *      by (df, gram) — a GLOBAL total order — and emits only its
  *      first |T| − ceil(θ·|T|) + 1 grams. Two strings with
  *      J ≥ θ MUST share a prefix gram under any common total order
  *      (if the prefixes were disjoint, the overlap is at most
  *      ceil(θ|T|) − 1 < θ|T| ≤ θ|A∪B| — contradiction), so the
  *      equi-join on prefix grams has RECALL 1.0: this is exact
  *      blocking, not an approximation. Rarest-first minimizes
  *      candidate fan-out: pair work per gram is df², and the prefix
  *      keeps only each string's rarest grams.
  *   3. verify: candidates (distinct id pairs) join back their full
  *      trigram sets; exact Jaccard by integer arithmetic
  *      (|∩|·θden ≥ θnum·|∪|).
  *
  * At 100 TB: the only data-sized exchanges are the trigram-DF
  * aggregate (combined map-side, bounded output) and the candidate
  * pair distinct — strings themselves cross one keyed exchange as
  * trigram arrays. Skew is bounded by the prefix: a string
  * contributes only its rarest grams, so no web-scale "the" bucket
  * exists the way it does for naive token blocking. For corpora where
  * even rare-prefix fan-out is hot, compose with the DF-cap
  * convention of [[graft.pipeline.TextDedup]] (drop grams above a df
  * ceiling from PREFIXES only — recall then depends on the cap,
  * which the caller opts into explicitly).
  *
  * (The reference has no fuzzy matching; its equality joins are the
  * closest surface — /root/reference/README.md:44-75 scopes joins to
  * hash equality. This operator is part of the training-data pipeline
  * family: near-identical URL/title/author linkage before dedup.)
  */
object SimilarityJoin {

  /** Distinct character trigrams of `s` (strings shorter than 3 chars
    * have none — guarded, because Spark's `sequence(1, n)` DESCENDS
    * for n < 1 instead of returning empty). */
  def charTrigrams(s: Column): Column =
    when(length(s) >= 3,
      array_distinct(transform(sequence(lit(1), length(s) - 2),
        i => substring(s, i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct k-word shingles of `s` (same tokenization as the dedup
    * family, [[graft.pipeline.TextDedup.shingles]]). */
  def wordShingles(k: Int)(s: Column): Column =
    graft.pipeline.TextDedup.shingles(s, k)

  /** All pairs (id_a < id_b) from `df` whose `strCol` values have
    * gram-set Jaccard ≥ thetaNum/thetaDen. Output: (id_a, id_b,
    * n_shared, n_union) — integer-exact, so the result hashes
    * identically against an all-pairs oracle.
    *
    * `grams` picks the set representation, and the choice is a
    * PERFORMANCE contract, not just a semantic one: prefix-join
    * fan-out is Σ df(gram)² over prefix grams, so the gram scheme must
    * give the corpus a large-enough alphabet that document frequencies
    * stay small. [[charTrigrams]] (default) fits names/URLs/short
    * free-form strings; for word-sequence strings over a small
    * vocabulary (templated titles — tiny character-trigram alphabet,
    * huge dfs, measured 60M candidate rows on a 5k-doc fixture where
    * word shingles give 121k) use [[wordShingles]]. */
  /** `prefixDfCap`: drop grams with df above the cap from PREFIXES
    * only (the [[graft.pipeline.TextDedup]] df-ceiling convention) —
    * an EXPLICIT recall trade the caller opts into for corpora where
    * even rare-prefix fan-out runs hot: candidate work per gram is
    * df², so capping bounds the worst gram's contribution. Precision
    * stays 1.0 (the verify is still exact); recall drops only for
    * pairs whose every shared prefix gram is hotter than the cap
    * (OperatorsSpec pins both directions). None = exact, recall 1.0. */
  /** `broadcastFreq`: None (default) leaves the freq-join strategy to
    * AQE, which broadcasts at runtime iff the built freq exchange is
    * actually small — no probe, no extra scan; Some(true) forces a
    * static broadcast, Some(false) pins the shuffled hash join (and
    * blocks the runtime conversion), for callers who already know
    * their alphabet. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               thetaNum: Int, thetaDen: Int,
               broadcastFreq: Option[Boolean] = None,
               grams: Column => Column = charTrigrams,
               prefixDfCap: Option[Long] = None): DataFrame = {
    val g = gramSets(df, idCol, strCol, grams)
    candidateVerify(g, g, self = true, thetaNum, thetaDen, broadcastFreq,
      prefixDfCap)
  }

  /** [[selfJoin]] without the final global sort — for ORDER-AGNOSTIC
    * consumers (the fuzzy-link clustering aggregates the pairs
    * order-free, and the sort costs a range-partitioner sample job
    * plus a sort exchange per call, both executed for real because
    * the clustering checkpoints the pair frame). Every declared pair
    * QUERY keeps the sorted face. */
  private[graft] def selfJoinUnsorted(
      df: DataFrame, idCol: String, strCol: String,
      thetaNum: Int, thetaDen: Int,
      broadcastFreq: Option[Boolean] = None,
      grams: Column => Column = charTrigrams,
      prefixDfCap: Option[Long] = None): DataFrame = {
    val g = gramSets(df, idCol, strCol, grams)
    candidateVerify(g, g, self = true, thetaNum, thetaDen, broadcastFreq,
      prefixDfCap, sorted = false)
  }

  /** Two-table (R×S) set-similarity join — record linkage proper:
    * every (left, right) pair whose gram-set Jaccard ≥
    * thetaNum/thetaDen. `id_a` comes from `left`, `id_b` from `right`
    * (the id spaces are independent — a left id never pairs against
    * another left id). Same prefix-filter plan as [[selfJoin]], with
    * one R×S refinement: the (df, gram) total order is computed over
    * the UNION of both sides' gram sets — the prefix theorem needs ONE
    * common order across every compared pair, and a per-side order
    * would break the recall-1.0 guarantee. */
  def join(left: DataFrame, leftId: String, leftStr: String,
           right: DataFrame, rightId: String, rightStr: String,
           thetaNum: Int, thetaDen: Int,
           broadcastFreq: Option[Boolean] = None,
           grams: Column => Column = charTrigrams,
           prefixDfCap: Option[Long] = None): DataFrame =
    candidateVerify(
      gramSets(left, leftId, leftStr, grams),
      gramSets(right, rightId, rightStr, grams),
      self = false, thetaNum, thetaDen, broadcastFreq, prefixDfCap)

  private def gramSets(df: DataFrame, idCol: String, strCol: String,
                       grams: Column => Column): DataFrame =
    graft.Engine.fanOut(df)
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("gs", grams(col("s")))
      .filter(size(col("gs")) > 0)
      .select("id", "gs")

  /** The shared prefix-filter → equi-join → integer-exact-verify core.
    * `self = true` compares one frame against itself (`ga` and `gb`
    * must be the same frame) and keeps only id_a < id_b; `self =
    * false` compares left against right with no id constraint.
    *
    * Freq-join strategy: the freq aggregate is distinct-gram-sized and
    * its exchange is materialized by the plan regardless of join
    * strategy, so the broadcast decision is free at RUNTIME — AQE
    * measures the built exchange and converts shuffled→broadcast below
    * `spark.sql.adaptive.autoBroadcastJoinThreshold` (~10 MB default:
    * comfortably holds any bounded trigram alphabet, and correctly
    * refuses a CJK/word-shingle alphabet that would OOM the driver at
    * 100 TB). Construction of the plan runs ZERO Spark jobs
    * (OperatorsSpec pins this — the round-10 design ran a separate HLL
    * probe job that re-scanned and re-exploded the gram stream once
    * per join call). */
  private def candidateVerify(ga: DataFrame, gb: DataFrame, self: Boolean,
                              thetaNum: Int, thetaDen: Int,
                              broadcastFreqOpt: Option[Boolean],
                              prefixDfCap: Option[Long],
                              sorted: Boolean = true): DataFrame = {
    require(thetaNum > 0 && thetaDen > 0 && thetaNum <= thetaDen,
      s"theta $thetaNum/$thetaDen must be in (0, 1]")
    require(prefixDfCap.forall(_ >= 1), s"prefixDfCap $prefixDfCap must be >= 1")
    // (1) document frequencies — one groupBy over the exploded gram
    // stream. R×S: one order over BOTH sides (see join's Scaladoc).
    // Strategy: forced by the caller, or (None) left to AQE's runtime
    // size-based conversion — never decided by an extra scan.
    val gramStream = (if (self) ga else ga.unionByName(gb))
      .select(explode(col("gs")).as("gram"))
    val freq0 = gramStream.groupBy("gram").agg(count(lit(1)).as("df"))
    val freq = broadcastFreqOpt match {
      case Some(true)  => broadcast(freq0)
      case Some(false) => freq0.hint("shuffle_hash") // pins the plan: no AQE broadcast
      case None        => freq0 // AQE: broadcast iff the built exchange is small
    }
    // (2) rarest-first prefixes under the (df, gram) total order
    def prefixes(g: DataFrame): DataFrame =
      g.select(col("id"), explode(col("gs")).as("gram"))
        .join(freq, "gram")
        .groupBy("id")
        // one row per distinct gram, so count(*) IS |gs| — the full
        // gram array never crosses this exchange (it re-joins only in
        // the verify step, where it is actually needed)
        .agg(array_sort(collect_list(struct(col("df"), col("gram")))).as("sg"),
          count(lit(1)).cast("int").as("n"))
        // prefix length = n - ceil(theta * n) + 1, in exact integers
        .withColumn("plen",
          col("n") - expr(s"($thetaNum * n + $thetaDen - 1) div $thetaDen").cast("int") + 1)
        // posexplode: position in the rarest-first order feeds the
        // positional filter below
        .select(col("id"), col("n"),
          posexplode(expr("slice(sg, 1, plen)")).as(Seq("pos0", "pg")))
        // df-cap applies to PREFIX EMISSION only — the rarest-first
        // order (and therefore plen) is computed over all grams
        .filter(prefixDfCap.map(c => col("pg.df") <= c).getOrElse(lit(true)))
        .select(col("id"), col("n"), (col("pos0") + 1).as("pos"),
          col("pg.gram").as("gram"))
    val pa = prefixes(ga)
    val pb = if (self) pa else prefixes(gb)
    // AllPairs length filter, LOSSLESS: J ≥ θ ⇒ θ·|∪| ≤ |∩| ≤ min, so
    // min(na,nb)·θden ≥ max(na,nb)·θnum — prunes size-incompatible
    // candidates inside the equi-join before the aggregation
    val lengthCompatible =
      col("a.n") * thetaDen >= col("b.n") * thetaNum &&
        col("b.n") * thetaDen >= col("a.n") * thetaNum
    val joinCond =
      if (self) col("a.gram") === col("b.gram") && col("a.id") < col("b.id") &&
        lengthCompatible
      else col("a.gram") === col("b.gram") && lengthCompatible
    // PPJoin positional filter, LOSSLESS: J ≥ θ ⟺ |∩| ≥
    // θ/(1+θ)·(|A|+|B|) =: α. A prefix match at 1-based rarest-first
    // positions (i, j) bounds the total overlap by
    // 1 + min(|A|−i, |B|−j) (this shared gram plus whatever follows it
    // on BOTH sides of the common order). A true pair's FIRST shared
    // prefix gram attains the bound, so keeping pairs where ANY match
    // reaches α (max over matches, computed by the same aggregation
    // that replaces the old distinct) drops no true pair — only
    // candidates that share merely tail-end prefix grams.
    // The α test is exact integer arithmetic: max_ub ≥ ⌈θnum·nsum /
    // (θnum+θden)⌉ ⟺ max_ub·(θnum+θden) ≥ θnum·nsum for integer
    // max_ub. The bound is only guaranteed tight at a pair's FIRST
    // shared gram, which for a true pair always lies inside both
    // prefixes — under prefixDfCap that gram may be dropped, so the
    // positional filter COMPOUNDS the cap's documented recall trade
    // (never the exact path's).
    val ubound = lit(1) +
      least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))
    val cand = pa.as("a").join(pb.as("b"), joinCond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        ubound.as("ub"),
        (col("a.n") + col("b.n")).as("nsum"))
      .groupBy("id_a", "id_b")
      .agg(max(col("ub")).as("max_ub"), first(col("nsum")).as("nsum"))
      .filter(col("max_ub") * (thetaNum + thetaDen) >= col("nsum") * thetaNum)
      .select("id_a", "id_b")
    // (3) exact verify on the full gram sets, integer decision
    val va = ga.select(col("id").as("id_a"), col("gs").as("gs_a"))
    val vb = gb.select(col("id").as("id_b"), col("gs").as("gs_b"))
    val verified = cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("n_shared", size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
      .withColumn("n_union",
        (size(col("gs_a")) + size(col("gs_b"))).cast("long") - col("n_shared"))
      .filter(col("n_shared") * thetaDen >= col("n_union") * thetaNum)
      .select("id_a", "id_b", "n_shared", "n_union")
    if (sorted) verified.orderBy("id_a", "id_b") else verified
  }
}
