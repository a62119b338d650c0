package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Codegen'd Bloom-filter membership probe over a pre-hashed key.
  *
  * The children are the key's two `xxhash64` values (h1 = xxhash64(key),
  * h2 = xxhash64(key, salt)) — computed by Spark's own codegen'd hash
  * expression on BOTH the build and probe sides, so this expression
  * never re-implements the hash. Probe position i uses standard
  * double hashing (Kirsch–Mitzenmacher, "Less Hashing, Same
  * Performance"): pos_i = (h1 + i·h2) mod m, with each term reduced
  * mod m first so the arithmetic can never overflow (ANSI mode safe);
  * the SQL build side writes bits with the IDENTICAL
  * `pmod(pmod(h1,m) + i*pmod(h2,m), m)` formula, which is what makes
  * "no false negatives" a construction property rather than a hope.
  *
  * `words` is the bitmap as packed longs (m = 64·words.length bits),
  * shipped once per task binary as a codegen reference object — its
  * size is fixed by the filter's sizing, NOT by the corpus, which is
  * the whole point: at 100 TB the exact distinct-gram set of a held-out
  * corpus cannot broadcast, but its Bloom bitmap can.
  */
case class BloomTestBits(
    left: Expression,
    right: Expression,
    words: Array[Long],
    numHashes: Int)
    extends BinaryExpression {

  require(words.nonEmpty && numHashes >= 1,
    "bloom_test_bits needs a non-empty bitmap and at least one hash")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_test_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint hash arguments, got " +
          s"${a.catalogString} and ${b.catalogString}")
    }

  private val mBits: Long = words.length.toLong * 64L

  override def nullSafeEval(a: Any, b: Any): Any = {
    val p1 = java.lang.Math.floorMod(a.asInstanceOf[Long], mBits)
    val p2 = java.lang.Math.floorMod(b.asInstanceOf[Long], mBits)
    var i = 0
    var hit = true
    while (hit && i < numHashes) {
      val pos = (p1 + i * p2) % mBits
      hit = (words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) != 0L
      i += 1
    }
    hit
  }

  // Every local freshName'd — same fused-stage rule as the vector
  // kernels (two probes in one codegen region must not collide).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val p1 = ctx.freshName("p1")
      val p2 = ctx.freshName("p2")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      s"""
         |long $m = ${mBits}L;
         |long $p1 = java.lang.Math.floorMod($a, $m);
         |long $p2 = java.lang.Math.floorMod($b, $m);
         |boolean $hit = true;
         |for (int $i = 0; $hit && $i < $numHashes; $i++) {
         |  long $pos = ($p1 + $i * $p2) % $m;
         |  $hit = ($ref[(int) ($pos >>> 6)] & (1L << (int) ($pos & 63L))) != 0L;
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
