package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"): a custom
  * `Aggregator[IN, BUF, OUT]` — the engine-extension path users take when
  * built-in aggregates don't fit.
  *
  * WeightedMean QUANTIZES each input value and weight to 6 decimal
  * places (HALF_UP) and then keeps exact BigDecimal partial sums
  * (merge-order independent, like the engine's DECIMAL summing
  * convention), dividing once at finish. The quantization is what makes
  * the result bit-reproducible across partitionings AND match a
  * DECIMAL-arithmetic oracle — callers needing sub-micro weights must
  * rescale first (a 1e-7 weight rounds to 0). Partial aggregation
  * (map-side combine) comes for free from the Aggregator contract:
  * `reduce` runs per-partition, `merge` combines the tiny buffers.
  */
object Aggregators {

  /** Weighted mean of `value` with weight `weight`: inputs quantized to
    * 6 dp, sums exact, final division rounded to scale-2 HALF_UP
    * (mirroring SQL round(x, 2)).
    *
    * Degenerate inputs follow built-in-aggregate conventions instead of
    * killing the task (BigDecimal(NaN) throws NumberFormatException —
    * one corrupt row in a 100 TB scan must not fail the stage): a NULL
    * value or weight skips the row (avg()'s rule); any non-finite value
    * or weight POISONS the aggregate to NaN (NaN is what double summing
    * would propagate; signed-infinity arithmetic is not representable
    * under the quantized-DECIMAL convention, so both collapse to NaN —
    * the buffer carries the poison flag through merges). */
  class WeightedMean extends Aggregator[(java.lang.Double, java.lang.Double),
      (BigDecimal, BigDecimal, Boolean), Double] {
    private def d2(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    override def zero: (BigDecimal, BigDecimal, Boolean) =
      (BigDecimal(0), BigDecimal(0), false)
    override def reduce(b: (BigDecimal, BigDecimal, Boolean),
                        in: (java.lang.Double, java.lang.Double)): (BigDecimal, BigDecimal, Boolean) = {
      val (v, w) = (in._1, in._2)
      if (v == null || w == null) b
      else if (v.isNaN || v.isInfinite || w.isNaN || w.isInfinite) (b._1, b._2, true)
      else (b._1 + d2(v) * d2(w), b._2 + d2(w), b._3)
    }
    override def merge(a: (BigDecimal, BigDecimal, Boolean),
                       b: (BigDecimal, BigDecimal, Boolean)): (BigDecimal, BigDecimal, Boolean) =
      (a._1 + b._1, a._2 + b._2, a._3 || b._3)
    override def finish(b: (BigDecimal, BigDecimal, Boolean)): Double =
      if (b._3 || b._2.signum == 0) Double.NaN
      else (b._1 / b._2).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal, Boolean)] =
      Encoders.tuple(ExpressionEncoder[BigDecimal](), ExpressionEncoder[BigDecimal](),
        Encoders.scalaBoolean)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API handle: `weightedMean(value, weight)`. */
  val weightedMean: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new WeightedMean, Encoders.tuple(
      Encoders.DOUBLE, Encoders.DOUBLE))
}
