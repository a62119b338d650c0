package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row md5 text kernels (the fingerprint/simhash hot paths):
  * one tokenize, one MessageDigest per thread, no interpreted lambda
  * per shingle and no per-token shuffle. Hex rendering is lowercase —
  * identical to Spark's `md5()` and DuckDB's `md5()`, so the oracle
  * contract is unchanged; min-shingle comparison is lexicographic over
  * the hex alphabet, identical in all three.
  */
object TextHashWorker {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Min md5 over the doc's 3-token shingles; null when < 3 tokens
    * (array_min over no shingles — the HOF twin's semantics).
    */
  def minShingleMd5(text: String): UTF8String = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) return null
    val sb = new java.lang.StringBuilder
    var min: String = null
    var i = 0
    while (i <= toks.length - 3) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      val h = md5Hex(sb.toString)
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  /** Winnowing print set (Schleimer et al. 2003) over the 60-bit md5
    * prefix of each 3-token shingle — the value `conv(substr(md5, 1,
    * 15), 16, 10)` computes, so the compiled selection is bit-identical
    * to the HOF/oracle form. Sliding-window minima via a monotone
    * deque (O(shingles)), distinct preserved in first-seen order (the
    * caller sorts or sets anyway). Short docs (< w hashes) keep their
    * single global min; empty-shingle docs return an empty array.
    */
  def winnowPrints(text: String, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(" ", -1)
    val nh = toks.length - 2
    if (nh <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nh)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nh) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      hs(i) = java.lang.Long.parseLong(md5Hex(sb.toString).substring(0, 15), 16)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nh < w) {
      var m = hs(0); var k = 1
      while (k < nh) { if (hs(k) < m) m = hs(k); k += 1 }
      out.add(m)
    } else {
      // Monotone deque of indices, increasing hash values.
      val dq = new java.util.ArrayDeque[Int]()
      var k = 0
      while (k < nh) {
        while (!dq.isEmpty && hs(dq.peekLast) >= hs(k)) dq.pollLast()
        dq.addLast(k)
        if (dq.peekFirst <= k - w) dq.pollFirst()
        if (k >= w - 1) out.add(hs(dq.peekFirst))
        k += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Per-band MinHash signatures in ONE pass over the doc's 3-token
    * shingles: x = 60-bit md5 prefix mod P per shingle (digested once),
    * sig_b = min over shingles of (x*A(b) + b) mod P — the exact values
    * the explode + groupBy formulation computes, per row, with no
    * shingle row ever existing. Null when the doc has < 3 tokens (the
    * explode form emits no row for such docs; callers filter nulls to
    * preserve that absence).
    */
  def minhashSigs(text: String, as: Array[Long], p: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(" ", -1)
    val nh = toks.length - 2
    if (nh <= 0) return null
    val nBands = as.length
    val sigs = new Array[Long](nBands)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nh) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      val x = java.lang.Long.parseLong(md5Hex(sb.toString).substring(0, 15), 16) % p
      var b = 0
      while (b < nBands) {
        val v = (x * as(b) + b) % p
        if (v < sigs(b)) sigs(b) = v
        b += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  /** 16-bit SimHash over per-token md5 nibbles: for hex position p
    * (1..16), +1 when the nibble's high bit is set, else −1; bit = 1
    * when the sum is ≥ 0. One digest per token, no token ever shuffles.
    */
  def simhashBits(text: String): UTF8String = {
    val toks = text.split(" ", -1)
    val sums = new Array[Int](16)
    val d = digest.get()
    var t = 0
    while (t < toks.length) {
      d.reset()
      val bytes = d.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var p = 0
      while (p < 16) {
        val nib = if (p % 2 == 0) (bytes(p / 2) >> 4) & 0xf else bytes(p / 2) & 0xf
        sums(p) += (if (nib >= 8) 1 else -1)
        p += 1
      }
      t += 1
    }
    val out = new Array[Char](16)
    var p = 0
    while (p < 16) {
      out(p) = if (sums(p) >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Serializable bridges so the codegen reference object stays tiny. */
final class TextHashBridge extends Serializable {
  def minShingle(t: UTF8String): UTF8String = TextHashWorker.minShingleMd5(t.toString)
  def simhash(t: UTF8String): UTF8String = TextHashWorker.simhashBits(t.toString)
  def winnow(t: UTF8String, w: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    TextHashWorker.winnowPrints(t.toString, w)
  def minhash(t: UTF8String, as: Array[Long], p: Long): org.apache.spark.sql.catalyst.util.ArrayData =
    TextHashWorker.minhashSigs(t.toString, as, p)
}

abstract class TextHashExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  @transient protected lazy val bridge = new TextHashBridge
}

/** Compiled min-shingle fingerprint (null for < 3 tokens). */
case class MinShingleMd5(child: Expression) extends TextHashExpr {
  override def prettyName: String = "min_shingle_md5"
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    bridge.minShingle(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textHash", bridge, classOf[TextHashBridge].getName)
    val code = nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.minShingle($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
    code
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compiled winnowing print set (array of 60-bit longs). */
case class WinnowPrintsExpr(child: Expression, w: Int) extends TextHashExpr {
  override def prettyName: String = "winnow_prints"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    bridge.winnow(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textHash", bridge, classOf[TextHashBridge].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.winnow($c, $w);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compiled 16-bit SimHash bit string. */
case class SimhashBits(child: Expression) extends TextHashExpr {
  override def prettyName: String = "simhash_bits"
  override def nullSafeEval(input: Any): Any =
    bridge.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textHash", bridge, classOf[TextHashBridge].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.simhash($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compiled per-band MinHash signature vector (null for < 3 tokens) —
  * the per-row replacement for the shingle explode + multi-min groupBy
  * that fed every LSH consumer: at ×100 corpus scale the explode form
  * pushes ~60 M shingle rows through codegen'd md5 plus an exchange,
  * this is one projection of one array per doc.
  */
case class MinhashSigsExpr(child: Expression, bandMixes: Array[Long], p: Long)
  extends TextHashExpr {
  override def prettyName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    bridge.minhash(input.asInstanceOf[UTF8String], bandMixes, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textHash", bridge, classOf[TextHashBridge].getName)
    val mixes = ctx.addReferenceObj("bandMixes", bandMixes, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.minhash($c, $mixes, ${p}L);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
