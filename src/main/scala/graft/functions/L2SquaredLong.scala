package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd squared L2 distance between two BIGINT grid vectors.
  *
  * The k-means scoring loop evaluates this n·k times per iteration — the
  * hottest expression of the clustering path. The HOF form
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, +)` is a codegen
  * barrier (interpreted lambdas, boxed Longs); this expression is one
  * primitive loop inside whole-stage codegen, bit-identical to the HOF
  * (integer arithmetic has no rounding to reorder) INCLUDING on ragged
  * or null-holed input: a length mismatch yields NULL, and a null
  * ELEMENT in either array yields NULL — exactly like zip_with's null
  * padding/holes propagating through the sum — so a malformed vector
  * surfaces as a missing distance, never a plausible-looking number. Overflow
  * headroom: |x−y| ≤ 5e6 on the 1e-6 grid of unit-range embeddings ⇒
  * each term ≤ 2.5e13, 64 dims ⇒ ≤ 1.6e15 ≪ 2^63.
  */
case class L2SquaredLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val ya = b.asInstanceOf[ArrayData]
    val n = xa.numElements()
    if (n != ya.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) {
        // a null ELEMENT propagates NULL, matching the HOF exactly —
        // getLong on a null slot would read garbage and produce a
        // plausible-looking distance
        if (xa.isNullAt(i) || ya.isNullAt(i)) return null
        val d = xa.getLong(i) - ya.getLong(i)
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SquaredLong =
    copy(left = newLeft, right = newRight)
}
