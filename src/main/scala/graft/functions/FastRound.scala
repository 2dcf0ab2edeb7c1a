package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** HALF_UP round-to-3-decimals, bit-identical to Spark's
  * `round(x, 3)` on DoubleType, without its per-call BigDecimal.
  *
  * Why (round 14): thread dumps of the 100× ss5 kernel showed 26 of 32
  * scoring threads inside `java.math.BigDecimal.valueOf(raw).setScale(3,
  * HALF_UP)` — Spark's DoubleType Round arithmetic, which stringifies
  * the double (shortest decimal representation) and re-parses it, at
  * ~150 ns per call. Every similarity kernel rounds once PER CANDIDATE
  * (5.0G candidates at the 100× tier), so the rounding — not the dot
  * products — was the dominant cost of the scoring legs (measured
  * 405-539 s cold / 110-172 s warm; the dots alone are ~20 s of CPU).
  * The same cost sits in every `round(cos, 3)` over a pair-candidate
  * stream (ss1-ss4, ss6, the smoke's exact-truth passes).
  *
  * Bit parity with the BigDecimal reference, by construction:
  *  - NaN / Infinity pass through unchanged (Round's non-finite rule);
  *  - |x·1000| ≥ 2^31 → the reference arithmetic itself (overflow,
  *    integral-scale and large-magnitude cases where fast float math
  *    would need its own proof — vanishingly rare for similarity
  *    scores, which live in [-1, 1]);
  *  - within 1e-5 of a .0005 tie boundary → the reference arithmetic:
  *    BigDecimal.valueOf rounds the SHORTEST DECIMAL representation of
  *    x, which can sit on the other side of the boundary from x·1000's
  *    floating value; both that representation error (≤ ulp(x)/2,
  *    i.e. ≤ ~ulp(x·1000) after scaling) and the x*1000.0
  *    multiplication error are orders of magnitude inside the window
  *    for |x·1000| < 2^31 (ulp ≤ ~5e-7), so OUTSIDE the window the
  *    fast path and the reference provably pick the same neighbor;
  *  - result is ±k/1000.0 — IEEE division of an exact integer by 1000
  *    is correctly rounded, the same double BigDecimal#doubleValue
  *    returns for the decimal k/1000; a zero result returns +0.0
  *    (BigDecimal has no signed zero).
  * FastRoundProperties pins bit equality against BOTH the BigDecimal
  * reference and Spark's own `round(col, 3)` on randomized and
  * boundary-crafted inputs.
  */
object FastRound {
  def round3(x: Double): Double = {
    val y = x * 1000.0
    val ay = math.abs(y)
    if (!(ay < 2.147483648e9)) return slow(x) // also catches NaN/Inf
    val f = math.floor(ay)
    val frac = ay - f
    if (math.abs(frac - 0.5) < 1e-5) return slow(x)
    val r = if (frac > 0.5) f + 1.0 else f
    if (r == 0.0) 0.0
    else (if (y < 0) -r else r) / 1000.0
  }

  private def slow(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
}

/** `round(child, 3)` as a unary codegen expression over [[FastRound]] —
  * the drop-in for the similarity kernels' per-candidate rounding.
  * NULL-propagating like Round; DoubleType only (the kernels' score
  * columns — the general-scale, general-type cases stay on Spark's
  * round). */
case class Round3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "round3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"round3 expects a double, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    FastRound.round3(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastRound.round3($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
