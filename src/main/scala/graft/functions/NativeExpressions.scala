package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the pipeline hot paths.
  *
  * The declarative versions of these (nested `transform`/`aggregate`
  * higher-order functions) evaluate one boxed lambda call per array
  * element — measured ~100× slower than a JVM loop on the sf0.1 bench
  * (the shingle HOF alone was 14s per evaluation over 5k docs, and the
  * dedup plans evaluate it in several branches). Each expression here
  * runs its inner loop in compiled Scala AND participates in
  * whole-stage codegen: doGenCode emits a call to the compiled kernel
  * through a reference object, so the surrounding filter/project/join
  * stage stays one fused codegen span (no CodegenFallback
  * interpretation barrier).
  *
  * Semantics are pinned to the DuckDB oracles: sequential left-fold
  * double arithmetic (DotProduct), the documented fold
  * `(acc*31 + codepoint) mod 1e9+7` (PolyFingerprint), and
  * lower/trim/split-"\\s+" word shingles hashed with FNV-1a
  * (ShingleHashes — hash identity never reaches results, every
  * candidate pair is re-verified on exact set intersections).
  */
object NativeExpressions {

  /** Sequential-fold dot product of two array<double>: exactly
    * ((0 + a1*b1) + a2*b2) + ... — bit-identical to the SQL
    * `aggregate(zip_with(...))` form it replaces. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    // Callers guarantee array<double> inputs (AbstractDataType — and
    // with it ExpectsInputTypes — is private[sql] in Spark 4).
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** 64-bit FNV-1a over UTF-8 bytes — the internal shingle/token hash
    * for MinHash and SimHash. Any good 64-bit hash works here:
    * candidate generation is always followed by exact verification,
    * so the hash choice affects cost, never results. */
  @inline private def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Sorted distinct FNV-1a hashes of the word k-shingles of a text:
    * exactly the hash of each element of
    * `array_distinct(transform(..., concat_ws(' ', tok_i..tok_{i+k-1})))`
    * over `split(trim(lower(text)), "\\s+")` — the lower/trim/split
    * semantics are reproduced byte-for-byte via UTF8String (matching
    * both Spark's native functions and the DuckDB oracle's
    * regexp_split_to_array(trim(lower(text)))). Sorted-set form makes
    * downstream intersections a linear merge (SortedIntersectSize).
    * (The reference has no dedup; this family is the driver-mandated
    * training-data extension.) */
  case class ShingleHashes(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    def compute(input: Any): ArrayData = {
      val s = input.asInstanceOf[UTF8String]
      // UTF8String.toLowerCase/trim == Spark lower()/trim() exactly
      // (trim strips ' ' only); Pattern.split(limit=-1) == Spark split().
      val t = s.toLowerCase.trim.toString
      val w = SplitPattern.split(t, -1)
      val n = w.length
      if (n < k) return EmptyLongArray
      val wb = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) { wb(i) = w(i).getBytes(java.nio.charset.StandardCharsets.UTF_8); i += 1 }
      val out = new Array[Long](n - k + 1)
      i = 0
      while (i <= n - k) {
        // fnv1a64 over "tok_i tok_{i+1} ... tok_{i+k-1}" utf-8 bytes
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < k) {
          if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
          val b = wb(i + j)
          var x = 0
          while (x < b.length) { h ^= (b(x) & 0xffL); h *= 0x100000001b3L; x += 1 }
          j += 1
        }
        out(i) = h
        i += 1
      }
      java.util.Arrays.sort(out)
      // dedupe in place
      var m = 0
      i = 0
      while (i < out.length) {
        if (m == 0 || out(i) != out(m - 1)) { out(m) = out(i); m += 1 }
        i += 1
      }
      new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private val SplitPattern = java.util.regex.Pattern.compile("\\s+")
  private val EmptyLongArray = new GenericArrayData(Array.emptyLongArray)

  /** Distinct word k-shingles of a text as STRINGS, first-occurrence
    * order — exactly `array_distinct(transform(sequence(0, n-k),
    * i => concat_ws(' ', w[i+1..i+k])))` over
    * `split(trim(lower(text)), "\\s+")`, i.e. [[graft.pipeline.TextDedup.shingles]]'
    * declarative form. That HOF evaluates one boxed lambda per shingle
    * and RE-SPLITS the text inside every `element_at` (no
    * subexpression elimination in interpreted higher-order lambdas) —
    * measured ~10× slower than this compiled pass on the sf0.1 bench's
    * similarity-join family, whose gram stage evaluates it in several
    * plan branches. Same lower/trim/split semantics as
    * [[ShingleHashes]] (byte-for-byte: UTF8String.toLowerCase/trim,
    * Pattern.split(limit=-1)). */
  case class ShingleStrings(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, s"shingle size $k must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    def compute(input: Any): ArrayData = {
      val s = input.asInstanceOf[UTF8String]
      val t = s.toLowerCase.trim.toString
      val w = SplitPattern.split(t, -1)
      val n = w.length
      if (n < k) return EmptyStringArray
      val seen = new java.util.LinkedHashSet[String](math.max(8, (n - k + 1) * 2))
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i <= n - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(w(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var m = 0
      while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
      new GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("shingleStrings", this, classOf[ShingleStrings].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private val EmptyStringArray = new GenericArrayData(Array.empty[AnyRef])

  /** Per-language stopword-hit counts + argmax label in ONE compiled
    * tokenize pass: struct(scores array<long>, pred string). Exactly
    * `size(filter(split(trim(lower(text)), "\\s+"), x -> x IN words_l))`
    * per language (duplicates counted), and pred = the first language
    * in declared order whose score is strictly greater than every
    * earlier one — the same strict-`>` fold [[graft.pipeline.TextAnalysis.languageId]]
    * declared. The declarative form evaluated one interpreted
    * ArrayFilter (and one re-split) per language per row — measured
    * 2.5 s single-threaded per evaluation over 5k docs, in several
    * plan branches of the per-language LM queries. */
  case class LangScores(child: Expression, langs: Seq[(String, Seq[String])])
      extends UnaryExpression {
    require(langs.nonEmpty)
    override def dataType: DataType = StructType(Seq(
      StructField("scores", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("pred", StringType, nullable = false)))
    @transient private lazy val wordSets: Array[java.util.HashSet[String]] =
      langs.map { case (_, ws) =>
        val s = new java.util.HashSet[String](ws.size * 2)
        ws.foreach(s.add)
        s
      }.toArray
    @transient private lazy val langNames: Array[UTF8String] =
      langs.map { case (l, _) => UTF8String.fromString(l) }.toArray
    def compute(input: Any): org.apache.spark.sql.catalyst.InternalRow = {
      val t = input.asInstanceOf[UTF8String].toLowerCase.trim.toString
      val w = SplitPattern.split(t, -1)
      val nl = wordSets.length
      val scores = new Array[Long](nl)
      var i = 0
      while (i < w.length) {
        var l = 0
        while (l < nl) {
          if (wordSets(l).contains(w(i))) scores(l) += 1L
          l += 1
        }
        i += 1
      }
      var best = 0
      var l = 1
      while (l < nl) {
        if (scores(l) > scores(best)) best = l
        l += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](new GenericArrayData(scores), langNames(best)))
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("langScores", this, classOf[LangScores].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The quality-score counters in ONE compiled pass:
    * struct(n_tok, punct, stop) = whitespace token count (same
    * lower/trim/split as every text kernel here), count of characters
    * in ".,;:!?" (= `length(regexp_replace(text, "[^.,;:!?]", ""))` —
    * ASCII bytes never appear inside multi-byte UTF-8 sequences, so a
    * byte scan counts exactly the same characters), and the count of
    * tokens in the fixed English stopword list (duplicates counted,
    * = `size(filter(tokens, isin(...)))`). The declarative form paid
    * two splits + an interpreted ArrayFilter + a regex rewrite of the
    * whole text per row, in every plan branch that scores quality. */
  case class QualityCounts(child: Expression, stopWords: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tok", LongType, nullable = false),
      StructField("punct", LongType, nullable = false),
      StructField("stop", LongType, nullable = false)))
    @transient private lazy val stopSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](stopWords.size * 2)
      stopWords.foreach(s.add)
      s
    }
    def compute(input: Any): org.apache.spark.sql.catalyst.InternalRow = {
      val u = input.asInstanceOf[UTF8String]
      var punct = 0L
      val bytes = u.getBytes
      var bi = 0
      while (bi < bytes.length) {
        val b = bytes(bi)
        if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?')
          punct += 1L
        bi += 1
      }
      val t = u.toLowerCase.trim.toString
      val w = SplitPattern.split(t, -1)
      var stop = 0L
      var i = 0
      while (i < w.length) {
        if (stopSet.contains(w(i))) stop += 1L
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](w.length.toLong, punct, stop))
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("qualityCounts", this, classOf[QualityCounts].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Size of the intersection of two sorted distinct array<long> —
    * a linear merge instead of array_intersect's per-element string
    * hashing. Exact on the hashed-set representation. */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    def compute(a: Any, b: Any): Long = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      var i = 0; var j = 0; var c = 0L
      while (i < nx && j < ny) {
        val vx = x.getLong(i); val vy = y.getLong(j)
        if (vx == vy) { c += 1; i += 1; j += 1 }
        else if (vx < vy) i += 1
        else j += 1
      }
      c
    }
    override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("sortedIntersect", this, classOf[SortedIntersectSize].getName)
      nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.compute($x, $y);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private val MersennePrime = 2147483647L // 2^31 - 1

  /** MinHash signature: array<long> of `perms` minima of
    * (a_p * id + b_p) mod 2^31-1 over the element-hash set (ids =
    * element hash mod 2147483629). One pass per permutation, compiled,
    * codegen-fused. */
  case class MinHashSig(child: Expression, perms: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val (pa, pb) = {
      val a = new Array[Long](perms); val b = new Array[Long](perms)
      var s = 42L
      def lcg(x: Long): Long = (x * 1103515245L + 12345L) & 0x7fffffffL
      for (i <- 0 until perms) {
        s = lcg(s); a(i) = 1L + (s % (MersennePrime - 1))
        s = lcg(s); b(i) = s % MersennePrime
      }
      (a, b)
    }
    def compute(input: Any): ArrayData = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) {
        ids(i) = java.lang.Math.floorMod(arr.getLong(i), 2147483629L)
        i += 1
      }
      val sig = new Array[Long](perms)
      var p = 0
      while (p < perms) {
        var m = Long.MaxValue
        val a = pa(p); val b = pb(p)
        var j = 0
        while (j < n) {
          val h = (a * ids(j) + b) % MersennePrime
          if (h < m) m = h
          j += 1
        }
        sig(p) = m
        p += 1
      }
      new GenericArrayData(sig)
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash over an array of element hashes: bit k of the
    * result is set iff the sum of ±1 contributions (sign of bit k of
    * each element hash) is > 0. Banding/chunking is plain SQL on the
    * returned long (shiftrightunsigned + mask), so the whole simhash
    * path stays inside one codegen span. */
  case class SimHashBits(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    def compute(input: Any): Long = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
        i += 1
      }
      var v = 0L
      var k = 0
      while (k < 64) {
        if (counts(k) > 0) v |= (1L << k)
        k += 1
      }
      v
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simHashBits", this, classOf[SimHashBits].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** SimHash over a token array (legacy string-array form, kept for
    * the token-level probe surface; the dedup path uses
    * ShingleHashes → SimHashBits). */
  case class SimHashChunks(child: Expression, chunks: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    def compute(input: Any): ArrayData = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Long](64)
      var i = 0
      while (i < n) {
        val b = arr.getUTF8String(i).getBytes
        val h = fnv1a64(b, 0, b.length)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
        i += 1
      }
      val width = 64 / chunks
      val out = new Array[Long](chunks)
      var c = 0
      while (c < chunks) {
        var v = 0L
        var j = 0
        while (j < width) {
          if (counts(c * width + j) > 0) v |= (1L << j)
          j += 1
        }
        out(c) = v
        c += 1
      }
      new GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simHashChunks", this, classOf[SimHashChunks].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5)
    * for (plane p, dim j) — splitmix64 finalizer over the cell index.
    * Full-avalanche mixing keeps the hash tables independent (a weaker
    * LCG here measurably correlated them). */
  def planeComponent(p: Int, j: Int): Double = {
    var z = (p * 1024L + j) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  /** All `tables` random-hyperplane LSH bucket ids for one vector
    * (array<double> of length `dim`) in a single compiled pass:
    * bucket t bit p = sign of v · plane(t,p). One expression instead
    * of tables×planes separate dot-product columns — the unrolled
    * form generated ~4k-line projections that dominated cold runs
    * with janino compile time. */
  case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int, dim: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val planesMatrix: Array[Array[Double]] =
      Array.tabulate(tables * planes, dim)((tp, j) =>
        planeComponent((tp / planes) * 64 + (tp % planes), j))
    def compute(input: Any): ArrayData = {
      val v = input.asInstanceOf[ArrayData]
      val n = math.min(v.numElements(), dim)
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var p = 0
        while (p < planes) {
          val plane = planesMatrix(t * planes + p)
          var d = 0.0
          var j = 0
          while (j < n) { d += v.getDouble(j) * plane(j); j += 1 }
          if (d > 0) bucket |= (1L << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
      new GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hyperplaneBuckets", this, classOf[HyperplaneBuckets].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** One-pass Gopher-repetition counters over a text's whitespace
    * tokens (same lower/trim/split-"\\s+" semantics as ShingleHashes,
    * byte-identical to the DuckDB oracle's
    * regexp_split_to_array(trim(lower(text)), '\\s+')):
    * struct(n_tok, n_dist, top_uni, top_bi) = token count, distinct
    * token count, max frequency of any token, max frequency of any
    * adjacent-token bigram. Hash-map counting keeps the cost O(tokens)
    * per row — the `transform(array_distinct(w), x -> size(filter(w,
    * y -> y = x)))` HOF form this replaces rescans the token array per
    * distinct token (O(distinct × tokens) in interpreted lambdas:
    * measured 841.9 s for one sf0.1 pass vs <2 s compiled, and a
    * single 100k-token document would do ~10^10 comparisons in one
    * row). Bigram keys join tokens with ' ', which cannot collide
    * across different bigrams because tokens never contain
    * whitespace. */
  case class RepStats(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tok", LongType, nullable = false),
      StructField("n_dist", LongType, nullable = false),
      StructField("top_uni", LongType, nullable = false),
      StructField("top_bi", LongType, nullable = false)))
    def compute(input: Any): org.apache.spark.sql.catalyst.InternalRow = {
      val t = input.asInstanceOf[UTF8String].toLowerCase.trim.toString
      val w = SplitPattern.split(t, -1)
      val n = w.length
      val uni = new java.util.HashMap[String, Integer](n * 2)
      var topU = 0
      var i = 0
      while (i < n) {
        val c: Int = uni.merge(w(i), 1, SumInts)
        if (c > topU) topU = c
        i += 1
      }
      val bi = new java.util.HashMap[String, Integer](n * 2)
      var topB = 0
      i = 0
      while (i < n - 1) {
        val c: Int = bi.merge(w(i) + " " + w(i + 1), 1, SumInts)
        if (c > topB) topB = c
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n.toLong, uni.size.toLong, topU.toLong, topB.toLong))
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("repStats", this, classOf[RepStats].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  private val SumInts =
    new java.util.function.BiFunction[Integer, Integer, Integer] {
      override def apply(a: Integer, b: Integer): Integer = a + b
    }

  /** Rolling polynomial fingerprint over the string's codepoints:
    * (acc * 31 + codepoint) mod 1_000_000_007 — same fold as the
    * `aggregate(split(text,''))` form and the DuckDB oracle. */
  case class PolyFingerprint(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    def compute(input: Any): Long = {
      val s = input.asInstanceOf[UTF8String].toString
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("polyFingerprint", this, classOf[PolyFingerprint].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The Gopher repetition-filter family beyond unigrams/bigrams
    * (Rae et al. 2021, Table A1), one compiled hash-map pass per
    * document: struct(n_tok, top3, top4, cov5, cov10) =
    * token count, max frequency of any word 3-gram / 4-gram, and the
    * number of token positions covered by any 5-gram / 10-gram that
    * occurs more than once WITHIN the document (overlapping duplicate
    * spans counted once — coverage, not occurrence-sum). Same
    * tokenization as [[RepStats]] (lower/trim/split-"\\s+", pinned to
    * the DuckDB oracle). Cost is O(Σk · tokens) per row with no
    * shuffle — the explode-and-groupBy form would move every gram of
    * the corpus through 4 exchanges. */
  case class GopherRep(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tok", LongType, nullable = false),
      StructField("top3", LongType, nullable = false),
      StructField("top4", LongType, nullable = false),
      StructField("cov5", LongType, nullable = false),
      StructField("cov10", LongType, nullable = false)))
    private def grams(w: Array[String], k: Int): Array[String] = {
      val n = w.length - k + 1
      if (n <= 0) return Array.empty
      val out = new Array[String](n)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(w(i + j)); j += 1
        }
        out(i) = sb.toString; i += 1
      }
      out
    }
    private def topFreq(g: Array[String]): Long = {
      val m = new java.util.HashMap[String, Integer](g.length * 2)
      var top = 0
      var i = 0
      while (i < g.length) {
        val c: Int = m.merge(g(i), 1, SumInts)
        if (c > top) top = c
        i += 1
      }
      top.toLong
    }
    private def dupCoverage(w: Array[String], k: Int): Long = {
      val g = grams(w, k)
      if (g.isEmpty) return 0L
      val m = new java.util.HashMap[String, Integer](g.length * 2)
      var i = 0
      while (i < g.length) { m.merge(g(i), 1, SumInts); i += 1 }
      val covered = new Array[Boolean](w.length)
      i = 0
      while (i < g.length) {
        if (m.get(g(i)) >= 2) {
          var j = i
          val end = i + k
          while (j < end) { covered(j) = true; j += 1 }
        }
        i += 1
      }
      var n = 0L
      i = 0
      while (i < covered.length) { if (covered(i)) n += 1; i += 1 }
      n
    }
    def compute(input: Any): org.apache.spark.sql.catalyst.InternalRow = {
      val t = input.asInstanceOf[UTF8String].toLowerCase.trim.toString
      val w = SplitPattern.split(t, -1)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](w.length.toLong, topFreq(grams(w, 3)), topFreq(grams(w, 4)),
          dupCoverage(w, 5), dupCoverage(w, 10)))
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("gopherRep", this, classOf[GopherRep].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Bloom-filter membership probe over a 64-bit key — the compiled
    * prefilter for incremental dedup ([[graft.pipeline.TextDedup
    * .incrementalDedup]]). The driver-built sketch rides the expression
    * as a reference object (same task-binary shipping Spark's own
    * `df.stat.bloomFilter` pattern relies on), so the probe is a plain
    * virtual call inside the scan's codegen span — no join, no
    * shuffle, no per-row boxing. True = "maybe in the set" (needs
    * exact verification); false = definitely absent (no false
    * negatives, so rows it clears are exactly clean). */
  case class BloomMightContain(child: Expression,
      bloom: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      bloom.mightContainLong(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Product-quantization encode: array<double> → array<int> of
    * subspace code ids (nearest L2 codeword per contiguous slice).
    * Codebooks ride along as a reference object; the O(m·k·sub) scan
    * is a compiled loop inside the enclosing codegen span. */
  case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    def compute(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      val m = books.length
      val out = new Array[Int](m)
      var s = 0
      var off = 0
      while (s < m) {
        val book = books(s)
        val sub = book(0).length
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val cw = book(c)
          var d = 0.0
          var j = 0
          while (j < sub) {
            val t = (if (off + j < x.numElements()) x.getDouble(off + j) else 0.0) - cw(j)
            d += t * t; j += 1
          }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        out(s) = best
        off += sub
        s += 1
      }
      new GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (${classOf[ArrayData].getName}) $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** PQ decode: codes → concatenated codewords (the reconstruction
    * v̂ whose dot with a query equals the ADC table score). */
  case class PqDecode(child: Expression, books: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    def compute(input: Any): Any = {
      val codes = input.asInstanceOf[ArrayData]
      val m = books.length
      val dim = books.iterator.map(_(0).length).sum
      val out = new Array[Double](dim)
      var s = 0
      var off = 0
      while (s < m) {
        val cw = books(s)(if (s < codes.numElements()) codes.getInt(s) else 0)
        System.arraycopy(cw, 0, out, off, cw.length)
        off += cw.length
        s += 1
      }
      new GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqDecode", this, classOf[PqDecode].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (${classOf[ArrayData].getName}) $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Count-min-sketch floor probe over a long key: true iff the
    * sketch's estimate is >= `minCount`. CMS never UNDERestimates, so
    * false can never hide a truly heavy key — the probe is a sound
    * prefilter whose survivors are exactly-verified downstream (the
    * BloomMightContain pattern, for frequency instead of membership).
    * The sketch ships once per executor as a reference object and the
    * probe is a plain call inside the scan's codegen span. */
  case class CmsAtLeast(child: Expression,
      cms: org.apache.spark.util.sketch.CountMinSketch, minCount: Long)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    def compute(input: Any): Boolean =
      cms.estimateCount(input.asInstanceOf[Long]) >= minCount
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmsAtLeast", this, classOf[CmsAtLeast].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** IEEE 754 binary16 → float, from the 2-byte little-endian payload
    * a parquet FLOAT16 column carries. Java 17 has no
    * Float.float16ToFloat (arrives in 20), and Spark 4.1's parquet
    * reader rejects the FLOAT16 logical type outright
    * ([PARQUET_TYPE_ILLEGAL]) — so graft ingests the column as
    * BinaryType (reference readers accept FLBA(2) into a binary
    * vector) and widens with this expression: sign/exponent/mantissa
    * are re-based to binary32 (exp + 112), subnormals normalized by
    * shifting, Inf/NaN mapped to their binary32 patterns. Exact: every
    * binary16 value is representable in binary32, so widening loses
    * nothing — the coercion the reference applies natively
    * (compute_value.rs:350-431). Codegen'd: the scan stays one fused
    * span. */
  object HalfToFloat {
    /** bits = the 16-bit half-float pattern (0..0xFFFF). */
    def toFloat(bits: Int): Float = {
      val sign = (bits & 0x8000) << 16
      var exp = (bits >>> 10) & 0x1f
      var mant = bits & 0x3ff
      if (exp == 31) // Inf / NaN
        return java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (mant << 13))
      if (exp == 0) {
        if (mant == 0) return java.lang.Float.intBitsToFloat(sign) // ±0
        // subnormal: normalize into binary32's larger exponent range
        while ((mant & 0x400) == 0) { mant <<= 1; exp -= 1 }
        exp += 1
        mant &= 0x3ff
      }
      java.lang.Float.intBitsToFloat(sign | ((exp + 112) << 23) | (mant << 13))
    }
    def fromBytes(b: Array[Byte]): Float =
      if (b == null || b.length < 2) Float.NaN
      else toFloat((b(0) & 0xff) | ((b(1) & 0xff) << 8))
  }

  case class HalfToFloatExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = FloatType
    def compute(input: Any): Float =
      HalfToFloat.fromBytes(input.asInstanceOf[Array[Byte]])
    override def nullSafeEval(input: Any): Any = compute(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("halfToFloat", this, classOf[HalfToFloatExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column-level wrappers
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def shingle_hashes(text: Column, k: Int): Column =
    column(ShingleHashes(expression(text), k))
  def shingle_strings(text: Column, k: Int): Column =
    column(ShingleStrings(expression(text), k))
  def lang_scores(text: Column, langs: Seq[(String, Seq[String])]): Column =
    column(LangScores(expression(text), langs))
  def quality_counts(text: Column, stopWords: Seq[String]): Column =
    column(QualityCounts(expression(text), stopWords))
  def sorted_intersect_size(a: Column, b: Column): Column =
    column(SortedIntersectSize(expression(a), expression(b)))
  def minhash_sig(c: Column, perms: Int): Column =
    column(MinHashSig(expression(c), perms))
  def simhash_bits(c: Column): Column =
    column(SimHashBits(expression(c)))
  def hyperplane_buckets(c: Column, planes: Int, tables: Int, dim: Int): Column =
    column(HyperplaneBuckets(expression(c), planes, tables, dim))
  def simhash_chunks(c: Column, chunks: Int): Column =
    column(SimHashChunks(expression(c), chunks))
  def poly_fingerprint(c: Column): Column =
    column(PolyFingerprint(expression(c)))
  def rep_stats(text: Column): Column =
    column(RepStats(expression(text)))
  def bloom_might_contain(key: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    column(BloomMightContain(expression(key), bloom))
  def gopher_rep(text: Column): Column =
    column(GopherRep(expression(text)))
  def half_to_float(c: Column): Column =
    column(HalfToFloatExpr(expression(c)))
  def cms_at_least(key: Column,
      cms: org.apache.spark.util.sketch.CountMinSketch, minCount: Long): Column =
    column(CmsAtLeast(expression(key), cms, minCount))
  def pq_encode(v: Column, books: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(v), books))
  def pq_decode(codes: Column, books: Array[Array[Array[Double]]]): Column =
    column(PqDecode(expression(codes), books))
}
