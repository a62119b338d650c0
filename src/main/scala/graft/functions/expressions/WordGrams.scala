package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row worker behind [[WordGramsExpr]]: word n-grams over the
  * single-space split in ONE scan. The declarative formulation
  * (`transform(sequence(...), i => concat_ws(" ", slice(toks, i, n)))`)
  * materializes the token array, an index array, and one slice +
  * concat per gram — all through interpreted higher-order-function
  * lambdas. But a single-space split means the text IS its tokens
  * joined by single spaces, so every gram is a verbatim SUBSTRING of
  * the input: record the token boundaries in one pass and emit
  * `text[start(i)..end(i+n-1)]` per gram. Values are bit-identical to
  * the HOF chain (empty tokens from doubled spaces included — the
  * substring carries the doubled space exactly as concat_ws over the
  * empty token does); texts under n tokens yield an empty array, the
  * `when(size >= n)` guard's semantics.
  */
final class WordGramsWorker(n: Int) extends Serializable {
  def grams(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = u.toString
    val len = s.length
    // Token boundaries of the single-space split (trailing empties kept,
    // like Spark's split(str, " ") = str.split(" ", -1)).
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    var tokStart = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        starts += tokStart
        ends += i
        tokStart = i + 1
      }
      i += 1
    }
    val m = starts.length
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var k = 0
    while (k <= m - n) {
      out(k) = UTF8String.fromString(s.substring(starts(k), ends(k + n - 1)))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd word n-grams for the decontamination/overlap family: the
  * gram EXPLOSION is those queries' corpus-sized stage, and the HOF
  * chain's per-gram allocations were its cost (~10 s each isolated at
  * the ×100 decade across q_decontaminate, q_decontaminate_bloom,
  * q_source_overlap). `KernelProps` pins worker == brute-force split
  * over adversarial inputs (multi-space runs, leading/trailing spaces,
  * unicode); the three consuming queries' oracles are unchanged and
  * stay green.
  */
case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  @transient private lazy val worker = new WordGramsWorker(n)

  override def nullSafeEval(input: Any): Any =
    worker.grams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGramsWorker", worker, classOf[WordGramsWorker].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.grams($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
