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
    * (mirroring SQL round(x, 2)). */
  class WeightedMean extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    private def d2(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)): (BigDecimal, BigDecimal) =
      (b._1 + d2(in._1) * d2(in._2), b._2 + d2(in._2))
    override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (BigDecimal, BigDecimal)): Double =
      if (b._2.signum == 0) Double.NaN
      else (b._1 / b._2).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.tuple(ExpressionEncoder[BigDecimal](), ExpressionEncoder[BigDecimal]())
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API handle: `weightedMean(value, weight)`. */
  val weightedMean: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new WeightedMean, Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble))
}
