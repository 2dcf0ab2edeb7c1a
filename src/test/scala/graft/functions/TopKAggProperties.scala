package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the [[TopKByScore]] AGGREGATE layer —
  * [[TopKBufferProperties]] pins the buffer's insert/merge math; these
  * pin what the aggregate adds on top: the serialize/deserialize leg
  * the shuffle carries between partial and final aggregation, the
  * NaN/NULL update guard (a NaN score would poison the ordering), and
  * the emitted best-first array. */
object TopKAggProperties extends Properties("TopKByScore") {

  private def agg(k: Int) = TopKByScore(
    BoundReference(0, DoubleType, nullable = true),
    BoundReference(1, LongType, nullable = true),
    Literal(k))

  private val entryGen: Gen[(Double, Long)] = for {
    s <- Gen.chooseNum(0, 5).map(_.toDouble) // ties on purpose
    i <- Gen.chooseNum(-50L, 50L)
  } yield (s, i)
  private val entriesGen = Gen.listOf(entryGen)
  private val kGen = Gen.chooseNum(1, 9)

  private def reference(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.distinct.sortBy { case (s, i) => (-s, i) }.take(k)

  private def evalPairs(a: TopKByScore, buf: TopKBuffer): List[(Double, Long)] =
    a.eval(buf).asInstanceOf[GenericArrayData].array.toList
      .map { r => val row = r.asInstanceOf[InternalRow]
        (row.getDouble(0), row.getLong(1)) }

  property("serialize/deserialize between partial and final is lossless") =
    Prop.forAll(entriesGen, kGen, Gen.chooseNum(0, 100)) { (xs0, k, cut) =>
      val xs = xs0.distinct
      val a = agg(k)
      val at = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (l, r) = xs.splitAt(at)
      // the in-plan shape: two map-side partials, each shipped through
      // serialize, deserialized and merged on the reduce side
      def partial(part: List[(Double, Long)]): TopKBuffer = {
        val b = a.createAggregationBuffer()
        part.foreach { case (s, i) => a.update(b, InternalRow(s, i)) }
        a.deserialize(a.serialize(b))
      }
      val merged = a.merge(partial(l), partial(r))
      evalPairs(a, merged) == reference(xs, k)
    }

  // MULTISET semantics under duplicates (ADVICE r12): the buffer keeps
  // every copy of a repeated (score, id) pair — duplicates occupy top-k
  // slots and can crowd out distinct ids. That is the aggregate's actual
  // contract (callers that need set semantics dedup upstream — the IVF
  // kNN kernel's one-primary-cell-per-neighbor shape does it by
  // construction), and this property pins it so a future buffer change
  // can't silently flip the behavior: the result equals the sorted
  // MULTISET's first k, whatever the split into partials.
  private def referenceMultiset(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sortBy { case (s, i) => (-s, i) }.take(k)

  property("duplicates are kept as copies: result = sorted multiset take k") =
    Prop.forAll(entriesGen, kGen, Gen.chooseNum(0, 100)) { (xs0, k, cut) =>
      // duplicate aggressively: every entry twice, plus the raw list —
      // guarantees repeated (score,id) pairs both within one buffer and
      // across the merged partials
      val xs = xs0 ++ xs0 ++ xs0.take(xs0.length / 2)
      val a = agg(k)
      val at = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (l, r) = xs.splitAt(at)
      def partial(part: List[(Double, Long)]): TopKBuffer = {
        val b = a.createAggregationBuffer()
        part.foreach { case (s, i) => a.update(b, InternalRow(s, i)) }
        a.deserialize(a.serialize(b))
      }
      val merged = a.merge(partial(l), partial(r))
      evalPairs(a, merged) == referenceMultiset(xs, k)
    }

  property("NULL and NaN inputs are skipped, never ranked or poisoning") =
    Prop.forAll(entriesGen, kGen) { (xs0, k) =>
      val xs = xs0.distinct
      val a = agg(k)
      val clean = a.createAggregationBuffer()
      xs.foreach { case (s, i) => a.update(clean, InternalRow(s, i)) }
      val dirty = a.createAggregationBuffer()
      xs.foreach { case (s, i) =>
        a.update(dirty, InternalRow(s, i))
        a.update(dirty, InternalRow(null, i))
        a.update(dirty, InternalRow(s, null))
        a.update(dirty, InternalRow(Double.NaN, i))
      }
      evalPairs(a, dirty) == evalPairs(a, clean)
    }
}
