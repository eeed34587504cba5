package graft

import graft.sources.ScriptRunner
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the compiled kernels: each native expression is
  * checked against an independent reference implementation on random
  * inputs, so correctness never rests on the parquet fixtures alone. */
class PropertySpec extends AnyFunSuite with SparkFixture {

  /** Deterministic ScalaCheck sampling (fixed seed — no flaky runs). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).map(i => g.pureApply(params, org.scalacheck.rng.Seed(42L + i)))
  }

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = samples(g, 25).foreach(f)
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga, 25).zip(samples(gb.map(identity), 25).reverse).foreach { case (a, b) => f(a, b) }

  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8)),
    Gen.oneOf("the", "and", "héllo", "naïve", "大数据", "query"))
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", " \t ", "\n")
  } yield ws.mkString(sep)

  private def fnv(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    for (b <- bytes) { h ^= (b & 0xffL); h *= 0x100000001b3L }
    h
  }

  /** Reference shingle-set: mirrors split(trim(lower())) + k-window. */
  private def refShingles(text: String, k: Int): Set[Long] = {
    val t = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      .toLowerCase.trim.toString
    val w = java.util.regex.Pattern.compile("\\s+").split(t, -1)
    if (w.length < k) Set.empty
    else (0 to w.length - k).map(i => fnv(w.slice(i, i + k).mkString(" "))).toSet
  }

  test("ShingleHashes equals the reference shingle-set on random text") {
    forAll(Gen.listOfN(30, textGen)) { texts =>
      import spark.implicits._
      val df = texts.toDF("text")
        .select(graft.pipeline.TextDedup.shingleHashes(col("text"), 3).as("sh"))
      val got = df.collect().map(_.getSeq[Long](0).toSet)
      texts.zip(got).foreach { case (t, g) =>
        assert(g == refShingles(t, 3), s"text=$t")
      }
    }
  }

  test("SortedIntersectSize equals set intersection") {
    forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      import spark.implicits._
      val df = Seq((sa, sb)).toDF("a", "b")
        .select(graft.functions.NativeExpressions
          .sorted_intersect_size(col("a"), col("b")).as("n"))
      assert(df.collect()(0).getLong(0) == (sa.toSet & sb.toSet).size.toLong)
    }
  }

  test("PolyFingerprint equals the BigInt fold") {
    forAll(textGen) { t =>
      import spark.implicits._
      val got = Seq(t).toDF("text")
        .select(graft.functions.NativeExpressions.poly_fingerprint(col("text")).as("fp"))
        .collect()(0).getLong(0)
      var acc = BigInt(0)
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        acc = (acc * 31 + cp) % BigInt(1000000007L)
        i += Character.charCount(cp)
      }
      assert(got == acc.toLong)
    }
  }

  test("script splitting: joining statements with ';' round-trips") {
    val stmtGen = Gen.nonEmptyListOf(Gen.oneOf(
      "select 1", "select 'a;b' as s", "select 'it''s' as t", "select 2 -- c"))
    forAll(stmtGen) { stmts =>
      // ';' on its own line: a trailing line comment otherwise
      // swallows a same-line separator (correct SQL semantics).
      val script = stmts.mkString("\n;\n")
      val out = ScriptRunner.split(script)
      assert(out.size == stmts.size)
    }
  }

  test("redactPii removes every injected email/phone/IP from random text") {
    val piiGen: Gen[String] = for {
      user <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(10))
      host <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
      n <- Gen.choose(0, 9999)
      a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
      kind <- Gen.choose(0, 2)
    } yield kind match {
      case 0 => s"$user@$host.example.com"
      case 1 => f"+1-555-$n%04d"
      case _ => s"10.$a.$b.1"
    }
    forAll(textGen, piiGen) { (text, pii) =>
      import spark.implicits._
      val injected = s"$text $pii $text"
      val out = Seq(injected).toDF("t")
        .select(pipeline.TextAnalysis.redactPii(col("t")).as("clean"))
        .collect()(0).getString(0)
      assert(!out.contains(pii), s"'$pii' survived redaction: $out")
      assert(out.contains("<EMAIL>") || out.contains("<PHONE>") || out.contains("<IP>"))
    }
  }

  test("RepStats equals the naive token/bigram counter on random text") {
    forAll(Gen.listOfN(30, textGen)) { texts =>
      import spark.implicits._
      val got = texts.toDF("text")
        .select(graft.functions.NativeExpressions.rep_stats(col("text")).as("g"))
        .select("g.n_tok", "g.n_dist", "g.top_uni", "g.top_bi")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      texts.zip(got).foreach { case (t, g) =>
        val w = java.util.regex.Pattern.compile("\\s+").split(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)
            .toLowerCase.trim.toString, -1)
        val uni = w.groupBy(identity).view.mapValues(_.length)
        val bi = w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
          .groupBy(identity).view.mapValues(_.length)
        val want = (w.length.toLong, uni.size.toLong,
          uni.values.maxOption.getOrElse(0).toLong,
          bi.values.maxOption.getOrElse(0).toLong)
        assert(g == want, s"text=$t")
      }
    }
  }

  test("GopherRep equals the naive gram counter/coverage on random text") {
    // Half the samples self-concatenate, guaranteeing duplicated
    // 5/10-grams so the coverage branch is exercised, not just zero.
    val gen = Gen.zip(textGen, Gen.oneOf(true, false)).map {
      case (t, true) => s"$t $t $t"
      case (t, false) => t
    }
    forAll(Gen.listOfN(30, gen)) { texts =>
      import spark.implicits._
      val got = texts.toDF("text")
        .select(graft.functions.NativeExpressions.gopher_rep(col("text")).as("g"))
        .select("g.n_tok", "g.top3", "g.top4", "g.cov5", "g.cov10")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      texts.zip(got).foreach { case (t, g) =>
        val w = java.util.regex.Pattern.compile("\\s+").split(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)
            .toLowerCase.trim.toString, -1)
        def grams(k: Int): Seq[String] =
          if (w.length < k) Nil
          else (0 to w.length - k).map(i => w.slice(i, i + k).mkString(" "))
        def top(k: Int): Long = grams(k).groupBy(identity)
          .view.mapValues(_.length.toLong).values.maxOption.getOrElse(0L)
        def cov(k: Int): Long = {
          val g = grams(k)
          val counts = g.groupBy(identity).view.mapValues(_.length).toMap
          val covered = Array.fill(w.length)(false)
          g.zipWithIndex.foreach { case (x, i) =>
            if (counts(x) >= 2) (i until i + k).foreach(covered(_) = true)
          }
          covered.count(identity).toLong
        }
        val want = (w.length.toLong, top(3), top(4), cov(5), cov(10))
        assert(g == want, s"text=$t")
      }
    }
  }

  test("chunkDocuments covers every token with the declared overlap") {
    forAll(Gen.listOfN(20, textGen)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (maxT, ov) = (7, 3)
      val stride = maxT - ov
      val got = pipeline.CorpusOps.chunkDocuments(docs, maxT, ov)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)
      texts.zipWithIndex.foreach { case (t, i) =>
        val w = java.util.regex.Pattern.compile("\\s+").split(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)
            .toLowerCase.trim.toString, -1)
        val chunks = got(i.toLong).sortBy(_._2)
        // chunk count: smallest c with c*stride + overlap >= n, min 1
        val wantC = math.max(1L, (w.length - ov + stride - 1) / stride)
        assert(chunks.length == wantC, s"text=$t")
        chunks.foreach { case (_, cid, nTok, body) =>
          val start = (cid * stride).toInt
          val want = w.slice(start, start + maxT)
          assert(body == want.mkString(" "), s"text=$t chunk=$cid")
          assert(nTok == want.length)
        }
        // every token position is covered by some chunk
        val covered = chunks.flatMap { case (_, cid, nTok, _) =>
          (cid * stride) until (cid * stride + nTok) }.toSet
        assert(covered == w.indices.map(_.toLong).toSet, s"text=$t")
      }
    }
  }

  test("topNgrams equals the brute-force gram counter on a random corpus") {
    forAll(Gen.listOfN(20, textGen)) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = pipeline.CorpusOps.topNgrams(docs, 2, 10).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val grams = texts.flatMap { t =>
        val w = java.util.regex.Pattern.compile("\\s+").split(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)
            .toLowerCase.trim.toString, -1)
        if (w.length < 2) Nil else w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
      }
      val want = grams.groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (g, n) => (-n, g) }.take(10)
      assert(got == want, s"texts=$texts")
    }
  }

  test("shuffleRank is a dense permutation on adversarial id distributions") {
    import spark.implicits._
    // sparse, clustered, singleton, and 2^20-congruent (hash-tie) ids
    val idSets: Seq[Seq[Long]] = Seq(
      Seq(0L),
      Seq(5L, 1048581L, 2097157L), // all ≡ 5 (mod 2^20): pure tiebreak path
      (0L until 200L).map(_ * 1000003L), // sparse
      (0L until 200L) ++ (900000L until 900200L), // two dense clusters
      samples(Gen.choose(0L, 1L << 40), 300).distinct)
    idSets.foreach { ids =>
      val df = ids.toDF("doc_id")
      val got = pipeline.CorpusOps.shuffleRank(df, seed = 3, parts = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == ids.length)
      assert(got.map(_._2).sorted.sameElements(ids.indices.map(_.toLong)),
        s"not dense for ids=${ids.take(5)}...")
      val want = ids.map(id => (id, ((id + 3) % 1048576L) * 2654435761L % 9999991L))
        .sortBy { case (id, h) => (h, id) }.map(_._1).zipWithIndex
        .map { case (id, i) => (id, i.toLong) }.sortBy(_._1)
      assert(got.sortBy(_._1).sameElements(want), s"rank mismatch for ids=${ids.take(5)}...")
    }
  }

  test("tokenBudgetSample equals the sequential per-group prefix cut on random corpora") {
    import spark.implicits._
    // random (doc_id, group, text) corpora with adversarial shapes:
    // skewed groups (one group holds most docs), singleton groups,
    // hash-tie ids, NULL groups (null forms its own group — the
    // offsets join is null-safe, so null-group docs must survive the
    // cut like any other group's, never silently vanish) — the
    // distributed range-bucketed prefix sum must equal the sequential
    // per-group definition on all of them
    val corpusGen: Gen[Seq[(Long, String, String)]] = for {
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 1L << 30)
        g <- Gen.frequency(5 -> Gen.const("big"), 1 -> Gen.oneOf("a", "b", "c"),
          1 -> Gen.const(null: String))
        nw <- Gen.choose(1, 30)
        ws <- Gen.listOfN(nw, Gen.oneOf("tok", "word", "datum", "x"))
      } yield (id, g, ws.mkString(" ")))
    } yield rows.distinctBy(_._1)
    forAll(corpusGen) { rows =>
      val budget = 40L
      val df = rows.toDF("doc_id", "lang", "text")
      val got = pipeline.CorpusOps.tokenBudgetSample(df, "lang", budget,
          seed = 11, parts = 7)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val want = rows.groupBy(_._2).toSeq.flatMap { case (_, grp) =>
        var cum = 0L
        grp.map { case (id, g, text) =>
            (id, g, text.trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong)
          }
          .sortBy { case (id, _, _) =>
            (((id + 11) % 1048576L) * 2654435761L % 9999991L, id) }
          .flatMap { case (id, g, n) =>
            cum += n
            if (cum <= budget) Some((id, g, n, cum)) else None
          }
      }.sortBy(_._1)
      assert(got.sortBy(_._1).toSeq == want,
        s"mismatch on ${rows.take(3)}... (${rows.length} rows)")
    }
  }

  test("similarity selfJoin equals naive all-pairs on random corpora (prefix+length+positional filters lossless)") {
    // the three candidate filters (prefix, length, positional) each
    // claim losslessness by theorem — this drives random corpora at
    // several thresholds so the claims never rest on the fixtures
    val strGen: Gen[String] = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "xy", "大数"))
    } yield ws.mkString("")
    val corpusGen: Gen[List[String]] = Gen.listOfN(12, strGen)
    def grams(s: String): Set[String] =
      if (s.length >= 3) s.sliding(3).toSet else Set.empty
    forAll(corpusGen, Gen.oneOf((1, 3), (1, 2), (2, 3), (4, 5), (1, 1))) {
      (texts, theta) =>
        import spark.implicits._
        val (num, den) = theta
        val data = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        val want = (for {
          (ia, sa) <- data; (ib, sb) <- data if ia < ib
          ga = grams(sa); gb = grams(sb) if ga.nonEmpty && gb.nonEmpty
          inter = (ga & gb).size; uni = ga.size + gb.size - inter
          if inter * den >= uni * num
        } yield (ia, ib, inter.toLong, uni.toLong)).toSet
        val got = graft.operators.SimilarityJoin
          .selfJoin(data.toDF("id", "s"), "id", "s", num, den)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got == want,
          s"theta=$num/$den corpus=${texts.mkString("[", ",", "]")}\n got $got\nwant $want")
    }
  }

  test("band index incremental near-dup equals brute force on random corpora") {
    // the persisted-index path (build + append + probe) must agree
    // with the definitional cross-set jaccard on arbitrary corpora,
    // not just the fixtures. Docs are 25-35 words so a tail mutation
    // sits near the 0.8 threshold from either side; bands=32 drives
    // the per-true-pair candidate-miss probability below 1e-7 at the
    // threshold, so equality (not recall-within-epsilon) is assertable.
    val docGen: Gen[List[String]] = for {
      n <- Gen.choose(25, 35)
      ws <- Gen.listOfN(n, Gen.choose(0, 49).map(i => s"w$i"))
    } yield ws
    val corpusGen: Gen[List[List[String]]] = Gen.listOfN(6, docGen)
    def shingles(ws: List[String]): Set[String] =
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet else Set.empty
    samples(Gen.zip(corpusGen, Gen.choose(0, 49)), 8).foreach { case (corpus, mut) =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_bandprop").toString
      val corpusRows = corpus.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      // batch: an exact copy, a tail mutation, and a fresh doc
      val batchRows = Seq(
        (1000L, corpus.head),
        (1001L, corpus(1).init :+ s"w$mut"),
        (1002L, List.fill(30)(s"z$mut"))) // disjoint vocabulary
      val want = (for {
        (bid, bws) <- batchRows; (cid, cws) <- corpusRows
        bs = shingles(bws); cs = shingles(cws) if bs.nonEmpty && cs.nonEmpty
        inter = (bs & cs).size; uni = bs.size + cs.size - inter
        j = inter.toDouble / uni if j >= 0.8
      } yield (bid, cid, j)).toSet
      // split build/append so the incremental path is the one proved
      graft.pipeline.TextDedup.writeBandIndex(
        corpusRows.take(3).map { case (i, ws) => (i, ws.mkString(" ")) }
          .toDF("doc_id", "text"), dir, bands = 32)
      graft.pipeline.TextDedup.appendToBandIndex(
        corpusRows.drop(3).map { case (i, ws) => (i, ws.mkString(" ")) }
          .toDF("doc_id", "text"), dir)
      val got = graft.pipeline.TextDedup.nearDupsAgainstBandIndex(
          batchRows.map { case (i, ws) => (i, ws.mkString(" ")) }
            .toDF("doc_id", "text"), dir, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"corpus=${corpusRows.map(_._2.mkString(" "))}\n" +
        s" got $got\nwant $want")
    }
  }

  test("index-free cross-set near-dup equals brute force on random corpora") {
    // crossSetNearDupPairs (corpus_dedup's batch fallback for a corpus
    // nobody indexed) must agree with the definitional cross-set
    // jaccard on arbitrary corpora — same corpus/batch/threshold
    // geometry as the indexed-route property above, same bands=32
    // margin that drives the per-true-pair candidate-miss below 1e-7
    val docGen: Gen[List[String]] = for {
      n <- Gen.choose(25, 35)
      ws <- Gen.listOfN(n, Gen.choose(0, 49).map(i => s"w$i"))
    } yield ws
    val corpusGen: Gen[List[List[String]]] = Gen.listOfN(6, docGen)
    def shingles(ws: List[String]): Set[String] =
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet else Set.empty
    samples(Gen.zip(corpusGen, Gen.choose(0, 49)), 8).foreach { case (corpus, mut) =>
      import spark.implicits._
      val corpusRows = corpus.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      val batchRows = Seq(
        (1000L, corpus.head),
        (1001L, corpus(1).init :+ s"w$mut"),
        (1002L, List.fill(30)(s"z$mut")))
      val want = (for {
        (bid, bws) <- batchRows; (cid, cws) <- corpusRows
        bs = shingles(bws); cs = shingles(cws) if bs.nonEmpty && cs.nonEmpty
        inter = (bs & cs).size; uni = bs.size + cs.size - inter
        j = inter.toDouble / uni if j >= 0.8
      } yield (bid, cid, j)).toSet
      val got = graft.pipeline.TextDedup.crossSetNearDupPairs(
          batchRows.map { case (i, ws) => (i, ws.mkString(" ")) }
            .toDF("doc_id", "text"),
          corpusRows.map { case (i, ws) => (i, ws.mkString(" ")) }
            .toDF("doc_id", "text"),
          threshold = 0.8, bands = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"corpus=${corpusRows.map(_._2.mkString(" "))}\n" +
        s" got $got\nwant $want")
    }
  }

  test("lmScore equals the in-memory bigram model on random corpora") {
    // the DECIMAL(18,12) rounding contract must hold for arbitrary
    // token distributions, not just the fixture vocabulary
    val corpusGen: Gen[List[String]] = Gen.listOfN(8, textGen)
    forAll(corpusGen) { texts =>
      import spark.implicits._
      val data = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = graft.pipeline.TextAnalysis.lmScore(data.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("sum_nll")))).toMap
      val toks = data.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
      val uni = toks.flatMap(_._2).groupBy(identity).map { case (k, xs) => k -> xs.size }
      val n = uni.values.sum.toDouble
      val v = uni.size.toDouble
      val bc = toks.flatMap { case (_, w) => w.zip(w.tail) }
        .groupBy(identity).map { case (k, xs) => k -> xs.size }
      def term(b: (String, String)): BigDecimal = {
        val p = 0.9 * (bc(b) + 0.5) / (uni(b._1) + 0.5 * v) +
          (1.0 - 0.9) * (uni(b._2) + 0.5) / (n + 0.5 * v)
        BigDecimal(-math.log(p)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      toks.foreach { case (id, w) =>
        val bs = w.zip(w.tail)
        if (bs.isEmpty) assert(!got.contains(id))
        else {
          assert(got(id)._1 == bs.size, s"doc $id of $texts")
          assert(got(id)._2 == bs.map(term).sum.toDouble, s"doc $id of $texts")
        }
      }
    }
  }

  test("grouped lmScore equals the global model on each group slice, on random corpora") {
    // conditioning must introduce no cross-group count leakage for ANY
    // token distribution or group assignment — the PipelineSpec check
    // on the fixture languages, generalized
    val corpusGen: Gen[List[String]] = Gen.listOfN(10, textGen)
    val groupsGen: Gen[List[Int]] = Gen.listOfN(10, Gen.choose(0, 2))
    forAll(corpusGen, groupsGen) { (texts, groups) =>
      import spark.implicits._
      val data = texts.zip(groups).zipWithIndex
        .map { case ((s, g), i) => (i.toLong, s, s"g$g") }
      val df = data.toDF("doc_id", "text", "grp")
      val grouped = graft.pipeline.TextAnalysis.lmScore(df, groupCol = Some("grp"))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("grp")) ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("sum_nll")))).toMap
      val sliced = data.map(_._3).distinct.flatMap { g =>
        graft.pipeline.TextAnalysis.lmScore(df.filter(col("grp") === g))
          .collect()
          .map(r => (r.getAs[Long]("doc_id"), g) ->
            ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("sum_nll"))))
      }.toMap
      assert(grouped == sliced, s"corpus=$texts groups=$groups")
    }
  }

  test("exact dedup fingerprints: equal texts collide, sampled unequal texts don't") {
    forAll(Gen.listOfN(20, textGen)) { texts =>
      import spark.implicits._
      val fp = texts.toDF("text")
        .select(col("text"), xxhash64(col("text")).as("a"),
          xxhash64(lit("graft.dedup.salt"), col("text")).as("b"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      for (t <- texts; u <- texts)
        if (t == u) assert(fp(t) == fp(u))
        else assert(fp(t) != fp(u) || t == u)
    }
  }

  test("rrfFuse equals the in-memory fold on random ranked legs") {
    import spark.implicits._
    val legGen: Gen[List[Long]] = for {
      n <- Gen.choose(1, 12)
      ids <- Gen.listOfN(n, Gen.choose(0L, 30L))
    } yield ids.distinct // rank = position + 1
    forAll(Gen.listOfN(3, legGen), Gen.choose(1, 90)) { (legs, k0) =>
      val nonEmpty = legs.filter(_.nonEmpty)
      if (nonEmpty.nonEmpty) {
        val dfs = nonEmpty.map(ids =>
          ids.zipWithIndex.map { case (id, i) => (id, i + 1) }.toDF("doc_id", "rank"))
        val got = graft.pipeline.Retrieval.rrfFuse(dfs, k0 = k0, topK = 100)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val scores = scala.collection.mutable.Map.empty[Long, (Long, Long)]
        nonEmpty.foreach(_.zipWithIndex.foreach { case (id, i) =>
          val (s, n) = scores.getOrElse(id, (0L, 0L))
          scores(id) = (s + graft.pipeline.Retrieval.RrfScale / (k0 + i + 1), n + 1)
        })
        val want = scores.toSeq.map { case (id, (s, n)) => (id, s, n) }
          .sortBy { case (id, s, _) => (-s, id) }
        assert(got.toSeq == want, s"legs=$nonEmpty k0=$k0")
      }
    }
  }

  test("weighted rrfFuse equals the in-memory weighted fold on random legs and weights") {
    import spark.implicits._
    val legGen: Gen[List[Long]] = for {
      n <- Gen.choose(1, 12)
      ids <- Gen.listOfN(n, Gen.choose(0L, 30L))
    } yield ids.distinct
    val caseGen = for {
      legs <- Gen.listOfN(3, legGen.suchThat(_.nonEmpty))
      ws <- Gen.listOfN(3, Gen.choose(1L, 9L))
      k0 <- Gen.choose(1, 90)
    } yield (legs, ws, k0)
    forAll(caseGen) { case (legs, ws, k0) =>
      val dfs = legs.map(ids =>
        ids.zipWithIndex.map { case (id, i) => (id, i + 1) }.toDF("doc_id", "rank"))
      val got = graft.pipeline.Retrieval
        .rrfFuse(dfs, k0 = k0, topK = 100, weights = ws)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val scores = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      legs.zip(ws).foreach { case (ids, w) =>
        ids.zipWithIndex.foreach { case (id, i) =>
          val (s, n) = scores.getOrElse(id, (0L, 0L))
          // the exact committed algebra: multiply BEFORE the int divide
          scores(id) = (s + (w * graft.pipeline.Retrieval.RrfScale) / (k0 + i + 1), n + 1)
        }
      }
      val want = scores.toSeq.map { case (id, (s, n)) => (id, s, n) }
        .sortBy { case (id, s, _) => (-s, id) }
      assert(got.toSeq == want, s"legs=$legs ws=$ws k0=$k0")
    }
  }

  test("resampleToTarget mixture and copy counts match the sequential definition on random recipes") {
    import spark.implicits._
    // random corpora over 3 groups with a random 2-3-label recipe —
    // the distributed broadcast-join emitter must equal the
    // per-document sequential weight/gate arithmetic exactly
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(3, 80)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 1L << 30)
        g <- Gen.oneOf("en", "fr", "de")
      } yield (id, g))
    } yield rows.distinctBy(_._1)
    val recipeGen: Gen[Seq[(String, Int)]] = for {
      a <- Gen.choose(1, 98)
      b <- Gen.choose(1, 99 - a)
    } yield Seq(("en", a), ("fr", b), ("de", 100 - a - b))
    forAll(corpusGen, recipeGen) { (rows, recipe) =>
      val present = rows.map(_._2).toSet
      if (recipe.forall(r => present(r._1))) {
        val docs = rows.map { case (id, g) => (id, g, "t") }
          .toDF("doc_id", "lang", "text")
        val got = graft.pipeline.CorpusOps
          .resampleToTarget(docs, "lang", recipe)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        val total = rows.size.toLong
        val nPer = rows.groupBy(_._2).map { case (g, rs) => g -> rs.size.toLong }
        val pct = recipe.toMap
        val want = rows.sortBy(_._1).flatMap { case (id, g) =>
          val w = pct(g).toDouble / 100.0 * total / nPer(g)
          val gate = ((id % 1048576L) * 2654435761L) % 1048576L
          val copies = (math.floor(w) +
            (if (gate.toDouble < (w - math.floor(w)) * 1048576.0) 1 else 0)).toLong
          (1L to copies).map(c => (id, g, c))
        }
        assert(got.toSeq == want, s"recipe=$recipe n=${rows.size}")
      }
    }
  }

  test("zone-map pruned reads equal the full filter for random intervals") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("zmap_prop").toString
    val vals = samples(Gen.choose(-1000L, 1000L), 400).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    vals.toDF("id", "v").repartitionByRange(7, col("v"))
      .write.parquet(s"$root/t")
    graft.sources.ZoneMaps.write(spark, s"$root/t", s"$root/m", Seq("v"))
    val boundGen = Gen.choose(-1200L, 1200L)
    forAll(boundGen, boundGen) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val got = graft.sources.ZoneMaps.readPruned(spark, s"$root/t", s"$root/m", "v", lo, hi)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = vals.filter { case (_, v) => v >= lo && v <= hi }.toSet
      assert(got == want, s"interval [$lo,$hi]")
    }
    // degenerate: empty interval prunes everything and stays correct
    val none = graft.sources.ZoneMaps.readPruned(spark, s"$root/t", s"$root/m", "v", 5000L, 6000L)
    assert(none.count() == 0)
  }

  test("bpeEncode equals sequential merge application on random corpora") {
    import spark.implicits._
    forAll(Gen.listOfN(15, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val merges = graft.pipeline.TextAnalysis.bpeTrain(df, 12)
      val rules = merges.collect().sortBy(_.getLong(0))
        .map(r => (r.getString(1), r.getString(2)))
      def applySeq(w: String): List[String] = {
        var syms: List[String] = w.map(_.toString).toList :+ "</w>"
        rules.foreach { case (l, r) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case x :: y :: t if x == l && y == r => out += (l + r); rest = t
            case x :: t => out += x; rest = t
            case Nil =>
          }
          syms = out.toList
        }
        syms
      }
      val got = graft.pipeline.TextAnalysis.bpeEncode(df, merges)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val want = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          .filter(_.nonEmpty).toList.flatMap(applySeq)
        assert(got(i.toLong) == want, s"doc $i of corpus $texts")
      }
    }
  }

  test("clustersFromPairs equals union-find connected components on random graphs") {
    import spark.implicits._
    // random sparse edge sets over a small vertex universe — the
    // distributed label propagation's fixpoint (min reachable id per
    // component, singletons own id) must equal an independent
    // driver-side union-find on every one of them, including shapes
    // the fixtures never produce (long chains that need many hops,
    // cycles, isolated vertices, duplicate/self-free edges)
    val graphGen: Gen[(Int, List[(Long, Long)])] = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(0, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (n, edges)
    // plus the worst case for propagation depth: one path graph
    val chain = (40, (0L until 39L).map(i => (i, i + 1)).toList)
    (samples(graphGen, 12) :+ chain).zipWithIndex.foreach { case ((n, edges), gi) =>
      val docs = (0L until n.toLong).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) docs.limit(0)
          .select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b"))
        else edges.toDF("doc_a", "doc_b")
      // alternate the two routes (r19): even samples take the driver
      // union-find fast path, odd samples (and the worst-depth chain,
      // index 12) force the distributed label-propagation loop — both
      // must match the independent union-find truth below
      if (gi % 2 == 1 || gi == 12)
        spark.conf.set("spark.graft.clusters.maxLocalEdges", "0")
      val got = try {
        graft.pipeline.TextDedup.clustersFromPairs(docs, pairs, maxIters = 100)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally spark.conf.unset("spark.graft.clusters.maxLocalEdges")
      // independent truth: union-find with min-id roots
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0L until n.toLong).map(id => id -> find(id)).toMap
      assert(got == want, s"n=$n edges=$edges")
    }
  }
}
