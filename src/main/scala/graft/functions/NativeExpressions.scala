package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
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
  * (dot product over 2M candidate pairs, 64 hashes × shingles per
  * doc). Each expression here evaluates its inner loop in compiled
  * Scala; `DotProduct` additionally participates in whole-stage
  * codegen via doGenCode, keeping the 100-TB pair-scoring path fused
  * with the surrounding join stage.
  *
  * Semantics are pinned to the DuckDB oracles: sequential left-fold
  * double arithmetic (DotProduct), and the documented fold
  * `(acc*31 + codepoint) mod 1e9+7` (PolyFingerprint).
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

  /** 64-bit FNV-1a over a UTF8 string — the internal shingle/token
    * hash for MinHash and SimHash. Any good 64-bit hash works here:
    * candidate generation is always followed by exact verification,
    * so the hash choice affects cost, never results. */
  @inline private def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private val MersennePrime = 2147483647L // 2^31 - 1

  /** MinHash signature: array<long> of `perms` minima of
    * (a_p * id + b_p) mod 2^31-1 over the element set, ids from
    * fnv1a64 mod 2147483629. One pass per permutation, compiled. */
  case class MinHashSig(child: Expression, perms: Int)
      extends UnaryExpression with CodegenFallback {
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
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) {
        ids(i) = java.lang.Math.floorMod(fnv1a64(arr.getUTF8String(i)), 2147483629L)
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** SimHash over a token array, emitted as 64/chunks-bit chunks
    * (see TextDedup.simhashChunks for the recall/cost tradeoff). */
  case class SimHashChunks(child: Expression, chunks: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Long](64)
      var i = 0
      while (i < n) {
        val h = fnv1a64(arr.getUTF8String(i))
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Rolling polynomial fingerprint over the string's codepoints:
    * (acc * 31 + codepoint) mod 1_000_000_007 — same fold as the
    * `aggregate(split(text,''))` form and the DuckDB oracle. */
  case class PolyFingerprint(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
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
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column-level wrappers
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def minhash_sig(c: Column, perms: Int): Column =
    column(MinHashSig(expression(c), perms))
  def simhash_chunks(c: Column, chunks: Int): Column =
    column(SimHashChunks(expression(c), chunks))
  def poly_fingerprint(c: Column): Column =
    column(PolyFingerprint(expression(c)))
}
