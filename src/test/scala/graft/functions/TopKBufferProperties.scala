package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for [[TopKBuffer]] — the k-bounded state behind
  * `topk_by_score`. The reference semantics are a full sort: best-first
  * by (score desc, id asc), take k. Insert order and any split into
  * merged sub-buffers must not matter (that is exactly what map-side
  * partial aggregation relies on). */
object TopKBufferProperties extends Properties("TopKBuffer") {

  private val entryGen: Gen[(Double, Long)] = for {
    // a tiny score domain forces constant ties so the id ordering is
    // genuinely exercised
    s <- Gen.chooseNum(0, 5).map(_.toDouble)
    i <- Gen.chooseNum(-50L, 50L)
  } yield (s, i)

  private val entriesGen = Gen.listOf(entryGen)
  private val kGen = Gen.chooseNum(1, 9)

  private def reference(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.distinct.sortBy { case (s, i) => (-s, i) }.take(k)
  // note: duplicates collapse in `distinct` — the buffer equivalent is
  // inserting the same (s, id) twice, which must not produce two slots

  private def viaBuffer(xs: List[(Double, Long)], k: Int): List[(Double, Long)] = {
    val buf = new TopKBuffer(k)
    xs.foreach { case (s, i) => buf.insert(s, i) }
    (0 until buf.size).map(j => (buf.scores(j), buf.ids(j))).toList
  }

  property("matches sort-take-k in any insert order") =
    Prop.forAll(entriesGen, kGen) { (xs, k) =>
      viaBuffer(xs.distinct, k) == reference(xs, k) &&
        viaBuffer(xs.distinct.reverse, k) == reference(xs, k)
    }

  property("any split into merged sub-buffers gives the same result") =
    Prop.forAll(entriesGen, kGen, Gen.chooseNum(0, 100)) { (xs0, k, cut) =>
      val xs = xs0.distinct
      val at = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (l, r) = xs.splitAt(at)
      val a = new TopKBuffer(k)
      l.foreach { case (s, i) => a.insert(s, i) }
      val b = new TopKBuffer(k)
      r.foreach { case (s, i) => b.insert(s, i) }
      // merge b into a, the TopKByScore.merge contract
      (0 until b.size).foreach(j => a.insert(b.scores(j), b.ids(j)))
      (0 until a.size).map(j => (a.scores(j), a.ids(j))).toList == reference(xs, k)
    }

  property("size never exceeds k and order is always best-first") =
    Prop.forAll(entriesGen, kGen) { (xs, k) =>
      // duplicates deliberately NOT removed here: inserting the same
      // (score, id) twice occupies two slots, exactly as a row_number
      // window ranks duplicate rows separately — so adjacent slots may
      // be equal, never out of order
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.insert(s, i) }
      val out = (0 until buf.size).map(j => (buf.scores(j), buf.ids(j)))
      buf.size <= k && out.sliding(2).forall {
        case Seq((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 <= i2)
        case _ => true
      }
    }
}
