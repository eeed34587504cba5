package graft

import graft.operators.ReferenceProjection
import org.scalatest.funsuite.AnyFunSuite

/** Pins ReferenceProjection to the reference's SELECT-list naming
  * contract (record_projection.rs:27-69 + the alias tests in
  * test_compute_value.rs). */
class OperatorsSpec extends AnyFunSuite with SparkFixture {

  private lazy val nation = Engine.table(spark, sfDir, "nation")

  test("range join equals the naive interval join, including edge cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // boundary points, bucket-spanning intervals, overlapping
    // intervals (multi-match), and an unmatched point
    val points = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0),
      (5L, 99.99), (6L, 1000.0)).toDF("pid", "p")
    val ivals = Seq((10L, 0.0, 9.99), (20L, 5.0, 30.0), (30L, 10.0, 10.0),
      (40L, 90.0, 120.0)).toDF("iid", "lo", "hi")
    val got = graft.operators.RangeJoin
      .pointInInterval(points, ivals, "p", "lo", "hi", bucketWidth = 7.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(ivals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
    // keyed variant: same semantics per key partition
    val kp = points.withColumn("k", col("pid") % 2)
    val ki = ivals.withColumn("k", col("iid") % 2)
    val gotK = graft.operators.RangeJoin
      .pointInIntervalByKey(kp, ki, Seq("k"), "p", "lo", "hi", 7.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantK = kp.join(ki.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotK == wantK)
  }

  test("single-part identifiers keep their names") {
    val out = ReferenceProjection.select(nation, "n_nationkey", "n_name")
    assert(out.columns.toSeq == Seq("n_nationkey", "n_name"))
  }

  test("unaliased expressions and compound identifiers become unnamed_{i}") {
    // the reference names ONLY Expr::Identifier; `t.x` falls through
    // to unnamed_{i} like any computed expression
    val out = ReferenceProjection.select(nation.alias("t"),
      "n_nationkey + 1", "t.n_name", "n_regionkey")
    assert(out.columns.toSeq == Seq("unnamed_0", "unnamed_1", "n_regionkey"))
  }

  test("aliases win; * expands all columns; t.* is the documented superset") {
    val aliased = ReferenceProjection.select(nation, "n_nationkey * 2 AS twice")
    assert(aliased.columns.toSeq == Seq("twice"))
    val star = ReferenceProjection.select(nation, "*")
    assert(star.columns.toSeq == nation.columns.toSeq)
    // qualified wildcard: NotImplemented in the reference, native here
    val qual = ReferenceProjection.select(nation.alias("t"), "t.*", "n_name")
    assert(qual.columns.toSeq == nation.columns.toSeq :+ "n_name")
  }

  test("unnamed index counts only unaliased non-identifier items") {
    val out = ReferenceProjection.select(nation,
      "n_nationkey", "n_regionkey + 1", "upper(n_name) AS u", "n_regionkey * 2")
    assert(out.columns.toSeq == Seq("n_nationkey", "unnamed_0", "u", "unnamed_1"))
  }

  test("similarity join equals naive all-pairs Jaccard on a CJK fixture, " +
      "broadcast and shuffled paths identical") {
    import spark.implicits._
    // Large-alphabet (CJK) titles alongside ASCII ones: the exact case
    // where a forced broadcast of the trigram-frequency table is the
    // wrong plan at scale — broadcastFreq=false must give the same rows.
    val data = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"),
      (3L, "completely different text about database engines"),
      (4L, "多言語コーパスの重複排除と類似検索の試験データです"),
      (5L, "多言語コーパスの重複排除と類似検索の試験データだよ"),
      (6L, "ab"), // below trigram length: no grams, never pairs
      (7L, "streaming ingestion with exactly once semantics"),
      (8L, "streaming ingestion with exactly-once semantics"))
    def grams(s: String): Set[String] =
      if (s.length >= 3) s.sliding(3).toSet else Set.empty
    val want = (for {
      (ia, sa) <- data; (ib, sb) <- data if ia < ib
      ga = grams(sa); gb = grams(sb) if ga.nonEmpty && gb.nonEmpty
      inter = (ga & gb).size; uni = ga.size + gb.size - inter
      if inter * 3 >= uni * 2
    } yield (ia, ib, inter.toLong, uni.toLong)).toSet
    assert(want.nonEmpty) // fixture must actually exercise the join
    val df = data.toDF("id", "s")
    def run(bcast: Option[Boolean]): Set[(Long, Long, Long, Long)] =
      graft.operators.SimilarityJoin.selfJoin(df, "id", "s", 2, 3, bcast)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(run(bcast = Some(true)) == want)
    assert(run(bcast = Some(false)) == want)
    assert(run(bcast = None) == want) // auto probe: same rows either way
  }

  test("broadcastFreq auto mode runs zero jobs at plan time; Some(false) pins a shuffled freq join") {
    import spark.implicits._
    // The round-10 auto mode ran a separate HLL probe JOB during plan
    // construction, re-scanning and re-exploding the whole gram stream
    // once per join call — a full extra corpus pass at 100 TB. The
    // replacement decides from the size of the freq exchange the plan
    // builds anyway (AQE runtime shuffled→broadcast conversion), so
    // constructing the join must launch NO Spark job at all.
    val data = (0 until 300).map { i =>
      (i.toLong, s"document number $i about similarity join planning")
    }
    val df = data.toDF("id", "s")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val planned = graft.operators.SimilarityJoin.selfJoin(df, "id", "s", 2, 3)
      planned.queryExecution.executedPlan // force full planning, no action
      Thread.sleep(1000) // listener events post asynchronously
      assert(jobs == 0,
        s"auto broadcastFreq must not launch a probe job at plan time (saw $jobs)")
      // Some(false) is a hard pin for alphabet-profiled callers: the
      // freq join must stay a shuffled hash join even though this tiny
      // fixture's freq table is far below every broadcast threshold.
      val forced = graft.operators.SimilarityJoin
        .selfJoin(df, "id", "s", 2, 3, broadcastFreq = Some(false))
      forced.collect()
      assert(forced.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
        "Some(false) must pin the freq join as shuffled")
      // Some(true) is the static broadcast pin
      val bc = graft.operators.SimilarityJoin
        .selfJoin(df, "id", "s", 2, 3, broadcastFreq = Some(true))
      assert(bc.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "Some(true) must plan a broadcast freq join")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("two-table similarity join equals naive cross Jaccard; id spaces stay independent") {
    import spark.implicits._
    // overlapping id values across the two tables: a left id must only
    // ever pair a RIGHT id (1 appears on both sides and must self-pair)
    val leftData = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "streaming ingestion with exactly once semantics"),
      (3L, "nothing like anything on the other side at all"))
    val rightData = Seq(
      (1L, "the quick brown fox jumped over the lazy dog"),
      (2L, "totally unrelated content right here in this row"),
      (8L, "streaming ingestion with exactly-once semantics"))
    def grams(s: String): Set[String] =
      if (s.length >= 3) s.sliding(3).toSet else Set.empty
    val want = (for {
      (ia, sa) <- leftData; (ib, sb) <- rightData
      ga = grams(sa); gb = grams(sb) if ga.nonEmpty && gb.nonEmpty
      inter = (ga & gb).size; uni = ga.size + gb.size - inter
      if inter * 3 >= uni * 2
    } yield (ia, ib, inter.toLong, uni.toLong)).toSet
    assert(want.nonEmpty && want.exists { case (a, b, _, _) => a == 1L && b == 1L })
    val got = graft.operators.SimilarityJoin.join(
        leftData.toDF("id", "s"), "id", "s",
        rightData.toDF("id", "s"), "id", "s", 2, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want, s"got $got\nwant $want")
  }

  test("prefixDfCap: no-op above max df, graceful recall-only loss below") {
    import spark.implicits._
    // every pair here shares ONLY hot grams in its prefixes, so a cap
    // below their df must lose exactly those pairs — never gain any
    val df = Seq(
      (1L, "aaabbbccc"), (2L, "aaabbbccd"), (3L, "aaabbbcce"),
      (4L, "zzzyyyxxx"), (5L, "unrelated")).toDF("id", "s")
    def run(cap: Option[Long]): Set[(Long, Long)] =
      graft.operators.SimilarityJoin
        .selfJoin(df, "id", "s", 1, 2, prefixDfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run(None)
    assert(exact.nonEmpty)
    // cap >= every df: identical result (recall 1.0 preserved)
    assert(run(Some(1000L)) == exact)
    // cap of 1 drops every shared prefix gram (shared => df >= 2):
    // candidates vanish, and the loss is one-directional (subset)
    val capped = run(Some(1L))
    assert(capped.subsetOf(exact) && capped.isEmpty, s"capped $capped")
  }

  test("fuzzyLinkClusters: cap trade at composition level — splits only, reps stay canonical") {
    import spark.implicits._
    // 1,2,3 near-identical (one cluster; 3 wins on quality), 4 and 5
    // unrelated singletons — same hot-gram fixture as the pair-level
    // cap test, so cap=1 is known to drop every pair
    val df = Seq(
      (1L, "aaabbbccc", 9L), (2L, "aaabbbccd", 9L), (3L, "aaabbbcce", 10L),
      (4L, "zzzyyyxxx", 9L), (5L, "unrelated", 9L)).toDF("id", "s", "q")
    def run(cap: Option[Long]): Seq[(Long, Long, Long)] =
      graft.pipeline.TextDedup
        .fuzzyLinkClusters(df, "id", "s", 1, 2, prefixDfCap = cap,
          qualityCol = Some("q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exact = run(None)
    assert(exact == Seq((1L, 3L, 3L), (4L, 4L, 1L), (5L, 5L, 1L)),
      s"uncapped clusters: $exact")
    // cap above every df: the whole composition is unchanged
    assert(run(Some(1000L)) == exact)
    // cap 1 loses every pair: clusters SPLIT into singletons — more
    // clusters, never a cross-cluster merge, and each representative
    // is its own cluster's best member
    val capped = run(Some(1L))
    assert(capped == (1L to 5L).map(i => (i, i, 1L)), s"capped clusters: $capped")
    // default quality (length of the key) picks the lowest id on the
    // all-equal-length fixture
    val byLen = graft.pipeline.TextDedup
      .fuzzyLinkClusters(df, "id", "s", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(byLen == Seq((1L, 1L, 3L), (4L, 4L, 1L), (5L, 5L, 1L)))
  }

  test("clustersFromPairs: union-groupBy hop equals naive connected components") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Path graph 1-2-3-4-5-6-7 (diameter forces several propagation
    // turns through the 2-hop loop), an 8-9-10 triangle, a 11-12 pair
    // listed in reversed id order, and 13..15 edgeless singletons —
    // exercises the hop's min-through-neighbors algebra, the
    // convergence-by-sum stop, and the singleton rejoin.
    val docs = (1L to 15L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (8L, 9L), (9L, 10L), (8L, 10L), (12L, 11L))
      .toDF("doc_a", "doc_b")
    // BOTH routes must produce the identical fixpoint: the size-gated
    // driver union-find fast path (default route at this edge count)
    // and the distributed label-propagation loop (forced by gating the
    // fast path off) — the r19 fast path is only admissible because
    // this pin holds it to the loop it replaces.
    val got = graft.pipeline.TextDedup.clustersFromPairs(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (1L to 7L).map((_, 1L)) ++ (8L to 10L).map((_, 8L)) ++
      Seq((11L, 11L), (12L, 11L)) ++ (13L to 15L).map(i => (i, i))
    assert(got == want, s"clusters (driver fast path): $got")
    spark.conf.set("spark.graft.clusters.maxLocalEdges", "0")
    try {
      val gotDist = graft.pipeline.TextDedup.clustersFromPairs(docs, pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(gotDist == want, s"clusters (distributed loop): $gotDist")
    } finally spark.conf.unset("spark.graft.clusters.maxLocalEdges")
  }

  // ---- compiled text kernels ≡ their declarative HOF forms ----
  // (r18 optimization: ShingleStrings / LangScores / QualityCounts
  // replaced interpreted higher-order lambdas in the hot paths; these
  // pins hold the kernels to the exact declarative algebra they
  // replaced, over the fixture corpus AND hand-built edge cases.)

  private lazy val edgeTexts = Seq(
    "", " ", "a", "a b", "a b c", "a b c a b c a b c", // repeats → dedup
    "  The  AND of  ", "the the the the", "LE la et les des el los que y",
    "x.y,z;q:w!e?r", "Ünïcode TÖkens MIXED case", "der die und das ein",
    "one two three four five six seven eight nine ten").zipWithIndex
    .map { case (t, i) => (i.toLong, t) }

  private def edgeDf = {
    import spark.implicits._
    edgeTexts.toDF("doc_id", "text")
  }

  private lazy val textCorpus = Engine.table(spark, sfDir, "documents")
    .select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))

  test("ShingleStrings kernel equals the declarative HOF word-shingle form") {
    import org.apache.spark.sql.functions._
    def hof(text: org.apache.spark.sql.Column, k: Int) = {
      val w = split(trim(lower(text)), "\\s+")
      when(size(w) >= k,
        array_distinct(transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(w, i + j + 1)): _*))))
        .otherwise(array().cast("array<string>"))
    }
    for (k <- Seq(1, 2, 3, 10); df <- Seq(edgeDf, textCorpus)) {
      val bad = df.select(
          graft.functions.NativeExpressions.shingle_strings(col("text"), k).as("a"),
          hof(col("text"), k).as("b"))
        .filter(not(col("a") <=> col("b"))).count()
      assert(bad == 0, s"k=$k: $bad rows differ from the HOF form")
    }
  }

  test("shingle kernels are null-in/null-out; engine paths drop NULL text like empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // r18 kernel semantics pinned (ADVICE r18): the pre-kernel HOF
    // form returned array() for NULL text, the compiled kernels follow
    // the standard unary null contract (NULL-out). Every ENGINE path
    // filters size(...) > 0, which drops null and empty alike, so the
    // difference is observable only to direct callers — this pin
    // documents it instead of leaving it fixture-untested.
    val df = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "a b c d"))
      .toDF("doc_id", "text")
    val rows = df.select(
        graft.pipeline.TextDedup.shingles(col("text"), 3).as("sg"),
        graft.pipeline.TextDedup.shingleHashes(col("text"), 3).as("sh"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1),
      s"NULL text must be null-out: ${rows(0)}")
    assert(rows(1).getSeq[String](0).isEmpty && rows(1).getSeq[Long](1).isEmpty,
      s"sub-k text must be empty, not null: ${rows(1)}")
    assert(rows(2).getSeq[String](0).nonEmpty && rows(2).getSeq[Long](1).nonEmpty)
    // engine behavior unchanged by null-out: the withHashes gate drops
    // the NULL row exactly as it drops the shingle-less empty row
    val kept = graft.pipeline.TextDedup.withHashes(df, 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L), s"withHashes must keep only the shingled doc: $kept")
  }

  test("LangScores kernel equals the declarative per-language filter scores and argmax") {
    import org.apache.spark.sql.functions._
    val langs = Seq(
      "en" -> Seq("the", "and", "of", "is", "a"),
      "fr" -> Seq("le", "la", "et", "les", "des"),
      "de" -> Seq("der", "die", "und", "das", "ein"),
      "es" -> Seq("el", "los", "que", "y", "una"),
      "zh" -> Seq("的", "是", "在", "了", "和"))
    val t = split(trim(lower(col("text"))), "\\s+")
    val scores = langs.map { case (lang, words) =>
      lang -> size(filter(t, x => x.isin(words: _*))).cast("long")
    }
    val pred = scores.tail.foldLeft[(org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)](lit(scores.head._1) -> scores.head._2) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
    for (df <- Seq(edgeDf, textCorpus)) {
      val g = graft.functions.NativeExpressions.lang_scores(col("text"), langs)
      val bad = df.select(
          g.getField("scores").as("ka"),
          array(scores.map(_._2): _*).as("da"),
          g.getField("pred").as("kp"), pred.as("dp"))
        .filter(not(col("ka") <=> col("da")) || not(col("kp") <=> col("dp")))
        .count()
      assert(bad == 0, s"$bad rows differ from the declarative languageId algebra")
    }
  }

  test("QualityCounts kernel equals the declarative token/punct/stopword counters") {
    import org.apache.spark.sql.functions._
    val enStop = Seq("the", "and", "of", "to", "in", "is", "a", "that")
    val nTok = size(split(trim(lower(col("text"))), "\\s+")).cast("long")
    val punct = length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("long")
    val stop = size(filter(split(trim(lower(col("text"))), "\\s+"),
      x => x.isin(enStop: _*))).cast("long")
    for (df <- Seq(edgeDf, textCorpus)) {
      val g = graft.functions.NativeExpressions.quality_counts(col("text"), enStop)
      val bad = df.select(
          g.getField("n_tok").as("kn"), nTok.as("dn"),
          g.getField("punct").as("kp"), punct.as("dp"),
          g.getField("stop").as("ks"), stop.as("ds"))
        .filter(not(col("kn") <=> col("dn")) || not(col("kp") <=> col("dp")) ||
          not(col("ks") <=> col("ds"))).count()
      assert(bad == 0, s"$bad rows differ from the declarative quality counters")
    }
  }
}
