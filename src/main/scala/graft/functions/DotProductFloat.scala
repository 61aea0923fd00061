package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float arrays, accumulated in double.
  *
  * The HOF formulation `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)`
  * is semantically identical but runs interpreted (lambda functions are
  * codegen barriers) — measured 5-10 s per ANN query at sf0.1. This
  * expression stays inside whole-stage codegen: one primitive loop per
  * row, no per-element boxing. Accumulation order is the array order in
  * both the interpreted and generated paths, so results are bitwise
  * identical to the HOF version (and to the DuckDB oracle's
  * list_sum(list_transform(...)) once rounded).
  */
case class DotProductFloat(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val ya = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), ya.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      // a null ELEMENT propagates NULL, matching the Spark HOF (zip_with
      // yields a null product, + propagates it) — getFloat on a null
      // slot would read garbage and produce a plausible-looking dot
      // product (same rule as graft_l2sq). NOTE: DuckDB's list_sum
      // IGNORES null elements (SQL SUM semantics), so the oracle mirrors
      // diverge on null-holed vectors; the fixture carries none —
      // PropertySpec pins that invariant so a data-gen change fails
      // loudly instead of via a confusing hash mismatch.
      if (xa.isNullAt(i) || ya.isNullAt(i)) return null
      s += xa.getFloat(i).toDouble * ya.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register the graft expressions in the session's function registry
    * (idempotent). Registered per-session rather than via
    * SparkSessionExtensions so the driver-owned session builders need no
    * config change. */
  def register(spark: SparkSession): Unit = {
    // Idempotence guard (round 13): re-registration was harmless but
    // every createOrReplaceTempFunction call after the first WARNs
    // "replaced a previously registered function" — with per-query
    // callers, hundreds of those lines flooded bench/verify stderr and
    // buried the bench JSON line the driver parses (every BENCH_r*.json
    // read "parsed": null). Registered names never change within a
    // session, so first-registration wins and the rest are no-ops.
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (exprs: Seq[Expression]) => DotProductFloat(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq",
      (exprs: Seq[Expression]) => L2SquaredLong(exprs.head, exprs(1)),
      "built-in")
    // Spark's own Bloom expressions (the pair its injected runtime
    // filters are built from) are internal — not in the public SQL
    // registry — so expose them under their canonical names:
    // bloom_filter_agg(xxhash64(x), items, bits) builds the binary
    // sketch executor-side, might_contain(bf, xxhash64(x)) is a
    // codegen'd probe (vs a black-box Scala-UDF closure).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg",
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
          .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs.head, exprs(1)),
      "built-in")
  }
}
