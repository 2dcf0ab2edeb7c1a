package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** [[FastRound.round3]] must be BIT-identical to Spark Round's
  * DoubleType arithmetic — `BigDecimal.valueOf(x).setScale(3,
  * HALF_UP).doubleValue()` with non-finite passthrough — on every
  * double. The generators aim where the fast path could diverge: the
  * .0005 tie boundaries (both the exactly-representable and the
  * shortest-decimal-shifted neighborhoods), the ±0.0 / subnormal zone,
  * the large-magnitude guard, and plain similarity-score ranges. The
  * FastRoundSpec companion separately pins the Catalyst `round(col, 3)`
  * parity through a real plan (codegen path). */
object FastRoundProperties extends Properties("FastRound") {

  private def reference(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()

  private def bitsEqual(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)

  private val similarity: Gen[Double] = Gen.chooseNum(-1.2, 1.2)
  private val anyScale: Gen[Double] = for {
    m <- Gen.chooseNum(-1.0, 1.0)
    e <- Gen.chooseNum(-12, 12)
  } yield m * math.pow(10.0, e)
  // k/1000 ± n ulps straddles the representation boundary exactly where
  // BigDecimal.valueOf's shortest-decimal view can disagree with x*1000
  private val boundary: Gen[Double] = for {
    k <- Gen.chooseNum(-2000000L, 2000000L)
    half <- Gen.oneOf(0.0, 0.0005)
    ulps <- Gen.chooseNum(-3, 3)
    sign <- Gen.oneOf(-1.0, 1.0)
  } yield {
    val base = sign * (k.toDouble / 1000.0 + half)
    (0 until math.abs(ulps)).foldLeft(base)((v, _) =>
      if (ulps > 0) math.nextUp(v) else math.nextDown(v))
  }
  private val special: Gen[Double] = Gen.oneOf(
    0.0, -0.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
    Double.MinPositiveValue, -Double.MinPositiveValue,
    4.9e-4, 5.0e-4, 5.1e-4, -4.9e-4, -5.0e-4, -5.1e-4,
    2.1474836479999e9 / 1000.0, 2.1474836481e9 / 1000.0, // the guard seam
    4.5035996273704961e12, 9.007199254740993e15, 1.7e305, -1.7e305)

  private def pin(name: String, g: Gen[Double]): Unit =
    property(name) = Prop.forAll(g) { x =>
      val got = FastRound.round3(x)
      val want = reference(x)
      val ok = bitsEqual(got, want) || (got.isNaN && want.isNaN)
      Prop(ok) :| {
        s"x=$x (${java.lang.Double.doubleToRawLongBits(x)}): " +
          s"fast=$got reference=$want"
      }
    }

  pin("similarity-range bits match the BigDecimal reference", similarity)
  pin("mixed-scale bits match", anyScale)
  pin("tie-boundary neighborhoods match", boundary)
  pin("special values match", special)
}
