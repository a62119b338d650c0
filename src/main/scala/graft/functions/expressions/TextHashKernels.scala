package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
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

  /** 60-bit md5 hash per n-token span, one entry per start position in
    * document order — the compiled twin of `transform(ngrams(text, n),
    * hash64)`, so values are bit-identical to the oracles'
    * `('0x' || substr(md5(span), 1, 15))::BIGINT`. `distinct = true`
    * collapses repeats in first-seen order (the per-doc set the dup
    * audit counts), which lets callers explode an already-distinct
    * array instead of paying a corpus-wide `.distinct()` exchange.
    * Empty array when the doc has < n tokens (the HOF twin emits an
    * empty array there too, so explode drops the doc either way).
    */
  def spanHashes(text: String, n: Int, distinct: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val sb = new java.lang.StringBuilder
    def hashAt(i: Int): Long = {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      java.lang.Long.parseLong(md5Hex(sb.toString).substring(0, 15), 16)
    }
    if (distinct) {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < m) { seen.add(hashAt(i)); i += 1 }
      val arr = new Array[Long](seen.size)
      val it = seen.iterator
      var j = 0
      while (it.hasNext) { arr(j) = it.next(); j += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    } else {
      val arr = new Array[Long](m)
      var i = 0
      while (i < m) { arr(i) = hashAt(i); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
  }

  /** Substring-scrub worker (the removal leg of the duplicated-span
    * audit): given a doc's text and the 1-based start positions of its
    * cross-document-duplicated n-token spans, one linear sweep computes
    * [n_toks, n_removed] and the surviving tokens re-joined in position
    * order — the per-doc replacement for exploding every token into a
    * (doc_id, pos) row and joining against an exploded covered-position
    * set. Starts arrive in collect_list (shuffle) order; sorted here,
    * then coverage is a two-pointer sweep: a position is covered when
    * some start ≤ pos has start + n - 1 ≥ pos.
    */
  def spanScrub(text: String, startsIn: Array[Long], n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.split(" ", -1)
    val starts = startsIn.clone()
    java.util.Arrays.sort(starts)
    val sb = new java.lang.StringBuilder
    var removed = 0L
    var j = 0
    var end = 0L
    var first = true
    var pos = 1
    while (pos <= toks.length) {
      while (j < starts.length && starts(j) <= pos) {
        val e = starts(j) + (n - 1)
        if (e > end) end = e
        j += 1
      }
      if (pos <= end) removed += 1
      else {
        if (!first) sb.append(' ')
        sb.append(toks(pos - 1))
        first = false
      }
      pos += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, removed, UTF8String.fromString(sb.toString)))
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

  /** Per-document hashed-token bucket counts: every whitespace token's
    * 60-bit md5 prefix mod `buckets`, counted per bucket in ONE pass —
    * the DSIR feature extraction without a token row ever existing.
    * Hash values match `('0x' || substr(md5(t), 1, 15))::BIGINT %
    * buckets` exactly (the hash64 contract); repeated tokens hash once
    * per document through a per-doc memo. Output is the sparse
    * (bucket, count) list in bucket order. `split(" ", -1)` semantics:
    * an empty text is one empty token, so every document counts ≥ 1
    * occurrence, matching the explode form.
    */
  def bucketCounts(text: String, buckets: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(" ", -1)
    val cnt = new Array[Long](buckets)
    val memo = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var b = memo.get(t)
      if (b == null) {
        b = Integer.valueOf(
          (java.lang.Long.parseLong(md5Hex(t).substring(0, 15), 16) % buckets).toInt)
        memo.put(t, b)
      }
      cnt(b.intValue()) += 1
      i += 1
    }
    var nz = 0
    var j = 0
    while (j < buckets) { if (cnt(j) != 0) nz += 1; j += 1 }
    val out = new Array[Any](nz)
    var k = 0
    j = 0
    while (j < buckets) {
      if (cnt(j) != 0) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(j.toLong, cnt(j))
        k += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** (Σ cnt_b, Σ cnt_b · lut(b)) over a [[bucketCounts]] array — the
    * per-document importance-weight fold against a driver-built
    * per-bucket table.
    */
  def dotBuckets(bc: org.apache.spark.sql.catalyst.util.ArrayData,
      lut: Array[Double]): org.apache.spark.sql.catalyst.InternalRow = {
    var n = 0L
    var s = 0.0
    var i = 0
    while (i < bc.numElements()) {
      val r = bc.getStruct(i, 2)
      n += r.getLong(1)
      s += r.getLong(1) * lut(r.getLong(0).toInt)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n, s)
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
  def spanHashes(t: UTF8String, n: Int, distinct: Boolean): org.apache.spark.sql.catalyst.util.ArrayData =
    TextHashWorker.spanHashes(t.toString, n, distinct)
  def spanScrub(t: UTF8String, starts: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow =
    TextHashWorker.spanScrub(t.toString, starts.toLongArray(), n)
  def bucketCounts(t: UTF8String, buckets: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    TextHashWorker.bucketCounts(t.toString, buckets)
  def dotBuckets(bc: org.apache.spark.sql.catalyst.util.ArrayData, lut: Array[Double]): org.apache.spark.sql.catalyst.InternalRow =
    TextHashWorker.dotBuckets(bc, lut)
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

/** Compiled n-token span hash array (optionally per-doc distinct) — one
  * md5 pass per document replacing the `transform(ngrams(·), hash64)`
  * HOF chain that materialized every span string as a Catalyst array
  * element before hashing it.
  */
case class SpanHashesExpr(child: Expression, n: Int, distinct: Boolean)
  extends TextHashExpr {
  override def prettyName: String = "span_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    bridge.spanHashes(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textHash", bridge, classOf[TextHashBridge].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.spanHashes($c, $n, $distinct);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compiled substring scrub: (text, dup-span starts) →
  * struct(n_toks, n_removed, clean_text) in one linear sweep per
  * document — the per-doc replacement for the token-level
  * posexplode + (doc_id, pos) join + array_sort(collect_list(struct))
  * rebuild, whose exchanges carried one row per TOKEN of the corpus.
  */
case class SpanScrubExpr(left: Expression, right: Expression, n: Int)
  extends BinaryExpression {
  override def prettyName: String = "span_scrub"
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<bigint>), got (${l.catalogString}, ${r.catalogString})")
  }
  @transient private lazy val bridge = new TextHashBridge
  override def nullSafeEval(t: Any, s: Any): Any =
    bridge.spanScrub(t.asInstanceOf[UTF8String],
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textHash", bridge, classOf[TextHashBridge].getName)
    nullSafeCodeGen(ctx, ev, (t, s) => s"${ev.value} = $ref.spanScrub($t, $s, $n);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Compiled per-document hashed-token bucket counts (sparse, bucket
  * ascending) — DSIR's feature pass as one call per row.
  */
case class BucketCountsExpr(child: Expression, buckets: Int) extends TextHashExpr {
  override def prettyName: String = "bucket_counts"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    bridge.bucketCounts(input.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textHash", bridge, classOf[TextHashBridge].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bucketCounts($c, $buckets);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document (token count, Σ count·lut) fold over a
  * [[BucketCountsExpr]] array against a bounded driver-built table
  * (the table rides the task binary once per stage — buckets doubles).
  */
case class BucketDotExpr(child: Expression, lut: Array[Double])
  extends UnaryExpression {
  override def prettyName: String = "bucket_dot"
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("raw", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
      if fs.length == 2 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<long,long>>, got ${t.catalogString}")
  }
  @transient private lazy val bridge = new TextHashBridge
  override def nullSafeEval(input: Any): Any =
    bridge.dotBuckets(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refB = ctx.addReferenceObj("textHash", bridge, classOf[TextHashBridge].getName)
    val refL = ctx.addReferenceObj("bucketLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refB.dotBuckets($c, $refL);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
