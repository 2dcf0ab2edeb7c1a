package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** In-row top-k cosine scorer for the IVF kNN kernel
  * ([[graft.operators.Similarity.knnJoinIvfKernel]]): given one query
  * row joined to ONE chunk of an IVF cell's member list (parallel
  * (id, embedding, norm) structs), returns that chunk's top `k`
  * neighbors as (score, id) structs, best-first, ties to the lower id —
  * the same order and the same bounded buffer as [[TopKByScore]].
  *
  * Why an expression and not the aggregate (round 14 — VERDICT r13 #1):
  * the aggregate formulation feeds every one of the ~nProbe·N²/cells
  * candidate rows (5.0G at the 100× probe) through the scoring join and
  * into ObjectHashAggregate, whose partial pass SORTS all of them once
  * per-task group counts exceed the 128-key fallback threshold — a
  * measured ≈302 s sort leg against ≈17 s in hash mode, and raising the
  * threshold engine-wide is an OOM tail for the unbounded-buffer
  * aggregates (NOTES round-13). Grouping the index side per (cell,
  * chunk) and scoring INSIDE the row removes the candidate rows
  * entirely: per joined row this expression runs one fused
  * dot+round+insert loop over the chunk's ArrayData (no per-candidate
  * UnsafeRow, no struct allocation, no sort), emits at most k structs,
  * and the only aggregation left is the per-query merge of k-bounded
  * lists — ≤ N·nProbe·chunks·k tiny rows instead of 5G.
  *
  * Correctness: per-chunk top-k then multiset-merge take-k equals the
  * global top-k because (score desc, id asc) totally orders candidates
  * with distinct ids, and any candidate in the global top-k has fewer
  * than k candidates above it — in particular within its own chunk
  * (CellTopKSpec pins bit-identity against the retired aggregate
  * formulation, adversarial values included).
  *
  * Scoring semantics replicate the retired pipeline expression
  * `round(try_divide(vec_dot(q, m.emb), qNrm * m.nrm), 3)` feeding
  * [[TopKByScore]], bit for bit:
  *  - a member with id == selfId is skipped (the kernel's self-filter);
  *  - dimension mismatch or a NULL element in either array → NULL dot
  *    ([[FloatVectorDot]] parity) → skipped, as TopKByScore skips NULL;
  *  - zero divisor → NULL (try_divide parity) → skipped;
  *  - NaN/Infinity pass through round unrounded (Spark's Round returns
  *    non-finite doubles unchanged); NaN is then skipped and Infinity
  *    inserted, exactly as TopKByScore does;
  *  - finite scores round to 3 decimals HALF_UP via
  *    `java.math.BigDecimal.valueOf` — the identical arithmetic Spark's
  *    Round generates for DoubleType.
  */
case class CellTopK(queryEmb: Expression, queryNrm: Expression,
    members: Expression, selfId: Expression, kExpr: Expression)
  extends Expression {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] =
    Seq(queryEmb, queryNrm, members, selfId, kExpr)
  override def nullable: Boolean =
    queryEmb.nullable || queryNrm.nullable || members.nullable || selfId.nullable
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cell_topk"
  // the member loop is a pure function of the inputs
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    def floatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val memberOk = members.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == LongType && floatArray(fs(1).dataType) &&
          fs(2).dataType == DoubleType
      case _ => false
    }
    if (!floatArray(queryEmb.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"cell_topk expects an array<float> query embedding, got ${queryEmb.dataType}")
    else if (queryNrm.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"cell_topk expects a double query norm, got ${queryNrm.dataType}")
    else if (!memberOk)
      TypeCheckResult.TypeCheckFailure(
        "cell_topk expects members array<struct<bigint, array<float>, double>>, " +
          s"got ${members.dataType}")
    else if (selfId.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cell_topk expects a bigint self id, got ${selfId.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("cell_topk: k must be a literal int")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("cell_topk: k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val q = queryEmb.eval(input)
    val n = queryNrm.eval(input)
    val m = members.eval(input)
    val s = selfId.eval(input)
    if (q == null || n == null || m == null || s == null) null
    else CellTopKOps.compute(q.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], m.asInstanceOf[ArrayData],
      s.asInstanceOf[Long], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cQ = queryEmb.genCode(ctx)
    val cN = queryNrm.genCode(ctx)
    val cM = members.genCode(ctx)
    val cS = selfId.genCode(ctx)
    val resultType = CodeGenerator.javaType(dataType)
    // the hot loop lives in CellTopKOps.compute (plain JVM code over
    // ArrayData — no boxing, no struct allocation); generated code just
    // null-propagates and calls the static forwarder, so the surrounding
    // whole-stage-codegen span stays intact
    ev.copy(code =
      code"""
        ${cQ.code}
        ${cN.code}
        ${cM.code}
        ${cS.code}
        boolean ${ev.isNull} = ${cQ.isNull} || ${cN.isNull} || ${cM.isNull} || ${cS.isNull};
        $resultType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.CellTopKOps.compute(
            ${cQ.value}, ${cN.value}, ${cM.value}, ${cS.value}, $k);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(queryEmb = newChildren(0), queryNrm = newChildren(1),
      members = newChildren(2), selfId = newChildren(3), kExpr = newChildren(4))
}

/** The [[CellTopK]] hot loop, standalone so scalac emits a static
  * forwarder the generated Java can call directly. */
object CellTopKOps {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(qEmb: ArrayData, qNrm: Double, members: ArrayData,
              selfId: Long, k: Int): ArrayData = {
    val dim = qEmb.numElements()
    // a NULL element anywhere in the query embedding nulls every dot
    // (FloatVectorDot parity) — all scores skip, the chunk yields nothing
    var i = 0
    while (i < dim) {
      if (qEmb.isNullAt(i)) return Empty
      i += 1
    }
    // one primitive copy of the query vector: the member loop then runs
    // getFloat against a local float[] instead of re-reading the same
    // ArrayData buffer per member
    val q = new Array[Float](dim)
    i = 0
    while (i < dim) { q(i) = qEmb.getFloat(i); i += 1 }
    val buf = new TopKBuffer(k)
    val n = members.numElements()
    var m = 0
    while (m < n) {
      if (!members.isNullAt(m)) {
        val row = members.getStruct(m, 3)
        val id = if (row.isNullAt(0)) selfId else row.getLong(0)
        if (id != selfId && !row.isNullAt(1) && !row.isNullAt(2)) {
          val emb = row.getArray(1)
          if (emb.numElements() == dim) {
            var s = 0.0
            var ok = true
            var j = 0
            while (j < dim) {
              if (emb.isNullAt(j)) { ok = false; j = dim }
              else { s += q(j).toDouble * emb.getFloat(j).toDouble; j += 1 }
            }
            if (ok) {
              val div = qNrm * row.getDouble(2)
              if (div != 0.0) { // zero divisor -> NULL score (try_divide parity)
                // FastRound.round3 = Spark Round bits (non-finite passes
                // through) without the per-candidate BigDecimal that
                // measured as ~all of this kernel's CPU (round 14)
                val score = FastRound.round3(s / div)
                if (!java.lang.Double.isNaN(score)) buf.insert(score, id)
              }
            }
          }
        }
      }
      m += 1
    }
    if (buf.size == 0) Empty
    else {
      val out = new Array[Any](buf.size)
      var j = 0
      while (j < buf.size) {
        out(j) = InternalRow(buf.scores(j), buf.ids(j))
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
