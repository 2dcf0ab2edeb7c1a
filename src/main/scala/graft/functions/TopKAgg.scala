package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state top-k aggregate: the per-group top `k` (score, id)
  * pairs, best-first, ties to the LOWER id — the rank-search primitive
  * behind [[graft.operators.Similarity.knnJoinIvf]].
  *
  * Why not a `row_number` window: a window has NO partial aggregation —
  * every candidate row crosses the exchange and gets sorted (at the IVF
  * kNN route's 20× smoke that is ~400M rows; at corpus scale, the
  * shuffle IS the operator's cost). This aggregate's buffer is k entries
  * at every stage, so ObjectHashAggregate's map-side partial pass trims
  * each partition's candidates to k per group BEFORE the shuffle — the
  * exchange carries ≤ partitions×groups×k tiny rows, invariant in the
  * candidate count. Same state-bounding property as [[SimHashAgg]]'s
  * vote buffer; merge is a bounded sorted-merge (commutative,
  * associative — safe under any partitioning), so the result is
  * bit-identical at any parallelism.
  *
  * NaN and NULL scores are skipped on update (a NaN would poison the
  * ordering: every comparison against it is false, so it could neither
  * be evicted nor ranked). `k` must be a foldable positive int. */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects a double score, got ${score.dataType}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects a bigint id, got ${id.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("topk_by_score: k must be a literal int")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("topk_by_score: k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      if (!sv.isNaN) buf.insert(sv, i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < b.size) { a.insert(b.scores(j), b.ids(j)); j += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var j = 0
    while (j < buf.size) { out(j) = InternalRow(buf.scores(j), buf.ids(j)); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    // entries were serialized best-first; inserting in order is O(n)
    var j = 0
    while (j < n) { buf.insert(bb.getDouble(), bb.getLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

/** Bounded sorted buffer for [[TopKByScore]]: parallel arrays of at most
  * `k` entries kept best-first (score desc, id asc). Insertion is a
  * shift from the tail — k is small (a rank-search k), so linear beats
  * any heap's constant factors. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, i: Long): Unit = {
    if (size == k) {
      if (!better(s, i, scores(k - 1), ids(k - 1))) return
      size -= 1 // evict the current worst; the shift below re-fills it
    }
    var pos = size
    while (pos > 0 && better(s, i, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = i
    size += 1
  }
}
