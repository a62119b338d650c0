package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row worker behind [[GopherRepStats]]: tokenizes once and counts
  * all six n-gram families in one compiled pass — a hash map of gram →
  * count per n, then the (count, gram)-max and the ≥2-occurrence char
  * sum. Replaces the higher-order `aggregate` fold formulation, which
  * paid interpreted per-element struct rebuilds ~6·L times per
  * document (the measured ×100-decade cost was 120 s; the whole point
  * of a per-doc statistic is that it should be map-side CPU, and this
  * makes that CPU compiled).
  *
  * Tokenization is `text.split(" ", -1)` — identical to Spark's
  * `split(text, " ")` including trailing empties. Gram tie-break uses
  * Java String order, which equals the oracle's byte order on this
  * ASCII corpus (non-BMP code points would order differently; the
  * fixture corpus has none).
  */
final class GopherRepWorker(topNs: Array[Int], dupNs: Array[Int])
    extends Serializable {

  /** [n_tokens, topchars(n) for topNs…, dupchars(n) for dupNs…]. */
  def stats(text: String): ArrayData = {
    val toks = text.split(" ", -1)
    val out = new Array[Long](1 + topNs.length + dupNs.length)
    out(0) = toks.length.toLong
    val sb = new java.lang.StringBuilder
    var slot = 1
    var f = 0
    val allNs = topNs ++ dupNs
    while (f < allNs.length) {
      val n = allNs(f)
      val m = toks.length - n + 1
      val counts = new java.util.HashMap[String, Integer]()
      var j = 0
      while (j < m) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(j + k))
          k += 1
        }
        counts.merge(sb.toString, 1, (a, b) => Integer.valueOf(a + b))
        j += 1
      }
      var topc = 0
      var topg: String = null
      var dup = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val (g, c) = (e.getKey, e.getValue.intValue())
        if (c > topc || (c == topc && (topg == null || g.compareTo(topg) > 0))) {
          topc = c; topg = g
        }
        if (c >= 2) dup += c.toLong * g.length
      }
      out(slot) =
        if (f < topNs.length) topc.toLong * (if (topg == null) 0 else topg.length)
        else dup
      slot += 1
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** Compiled Gopher repetition signals: one expression call per document
  * returns [n_tokens, top2chars, top3chars, top4chars, dup5chars,
  * dup6chars, dup7chars]. Stays a pure projection — the operator's
  * zero-shuffle scale shape — with the per-row cost of a tight compiled
  * loop instead of interpreted lambda folds.
  */
case class GopherRepStats(child: Expression, topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_rep_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  @transient private lazy val worker =
    new GopherRepWorker(topNs.toArray, dupNs.toArray)

  override def nullSafeEval(input: Any): Any =
    worker.stats(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherWorker", worker,
      classOf[GopherRepWorker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
