package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for [[SimHashAgg]] — dd5's sketch kernel. The
  * 100 TB property is partial aggregation: the shuffle carries one
  * 256-byte vote buffer per (group × partition), which is only sound if
  * any split of the token stream into merged sub-buffers equals the
  * single-buffer fold. The reference semantics are the textbook ones:
  * output bit b is 1 iff strictly more tokens have bit b set than
  * clear (tie → 0, the `> 0` vote threshold). */
object SimHashAggProperties extends Properties("SimHashAgg") {

  private val agg = SimHashAgg(BoundReference(0, LongType, nullable = true))

  private def fold(tokens: Seq[Long]): Array[Int] = {
    val buf = agg.createAggregationBuffer()
    tokens.foreach(t => agg.update(buf, InternalRow(t)))
    buf
  }

  private def reference(tokens: Seq[Long]): Long = {
    var out = 0L
    for (b <- 0 until 64) {
      val ones = tokens.count(t => ((t >>> b) & 1L) == 1L)
      if (ones * 2 > tokens.length) out |= (1L << b)
    }
    out
  }

  // full-range longs plus a biased generator that repeats a small token
  // vocabulary, so vote counters actually accumulate and tie cases occur
  private val tokenGen: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue, Long.MaxValue),
    Gen.chooseNum(0L, 7L).map(i => 0x9E3779B97F4A7C15L * i))
  private val tokensGen = Gen.listOf(tokenGen)

  property("eval matches the majority-vote reference") =
    Prop.forAll(tokensGen) { tokens =>
      agg.eval(fold(tokens)) == reference(tokens)
    }

  property("any split into merged sub-buffers equals the single fold") =
    Prop.forAll(tokensGen, Gen.chooseNum(0, 100)) { (tokens, cut) =>
      val at = if (tokens.isEmpty) 0 else cut % (tokens.length + 1)
      val (l, r) = tokens.splitAt(at)
      val merged = agg.merge(fold(l), fold(r))
      val mergedRev = agg.merge(fold(r.reverse), fold(l.reverse))
      merged.toSeq == fold(tokens).toSeq &&
        agg.eval(mergedRev) == agg.eval(fold(tokens))
    }

  property("serialize/deserialize round-trips the vote buffer exactly") =
    Prop.forAll(tokensGen) { tokens =>
      val buf = fold(tokens)
      agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq
    }

  property("NULL tokens are ignored, not voted") =
    Prop.forAll(tokensGen) { tokens =>
      val buf = fold(tokens)
      agg.update(buf, InternalRow(null))
      buf.toSeq == fold(tokens).toSeq
    }
}
