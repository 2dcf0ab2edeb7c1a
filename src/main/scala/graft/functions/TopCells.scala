package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** In-row top-`nProbe` IVF cell assignment: scores one vector against
  * every coarse centroid and returns the best `nProbe` cell ids,
  * best-first, ties to the LOWER cell id — bit-identical to the
  * exploded/broadcast assignment paths in [[graft.operators.KMeans]]
  * (TopCellsSpec pins the parity, the [[graft.operators.KMeans
  * .assignTopCellsExploded]] seam discipline).
  *
  * Why an expression (round 14): the 17..[[graft.operators.KMeans
  * .MaxLiteralCells]] assignment tier was `assignTopCellsExploded` — a
  * cells×N row fan-out (51.2M rows at the 100× probe's 256c tier), a
  * collect_list aggregate that falls to ObjectHashAggregate's SORT
  * fallback past 128 groups/task, an INTERPRETED `sort_array` of a
  * cells-element struct array per vector (higher-order functions are
  * CodegenFallback), and an embedding re-join. Standalone that is ~11 s
  * per materialization — but [[graft.operators.Similarity
  * .knnJoinIvfKernel]]'s united plan consumes the assignment from FOUR
  * subtrees (probe, index, per-cell pops, the cap's over-population
  * aggregate), and an unpersisted cold caller re-executes the whole
  * fan-out+sort+join chain per consumer: the measured cold
  * `knnJoinFitted` wall at 100× was 1350.1 s against a 115.8 s warm
  * rerun and a ~230 s phase-sum (NOTES round 14; thread dumps show the
  * time in `SortArray`/`InterpretedOrdering` under `ArrayTransform
  * .eval` and in sort-fallback TypedImperativeAggregate merges). In-row
  * scoring removes all of it: no fan-out, no shuffle, no aggregate, no
  * join-back — recomputing a consumer costs one codegen'd pass of
  * cells×dim fused multiply-adds per row (~3.3 GFLOP total at the 100×
  * tier), so the operator no longer needs its input persisted to be
  * cheap, on a cold cluster or a hot one.
  *
  * The centroid matrix rides along as a plan REFERENCE OBJECT (flat
  * row-major float[] + norms double[]), not a literal: k×dim is model
  * state bounded by [[graft.operators.KMeans.MaxMeansDriverRows]]
  * (≤ ~1 MB at the 4096c tier), serialized once per plan rather than
  * pasted into generated source — so one expression serves every tier,
  * including the former >MaxLiteralCells broadcast-table path.
  *
  * Scoring semantics replicate the retired pipeline bit for bit:
  * score_i = `try_divide(vec_dot(emb, c_i), nrm * cnorm_i)` —
  *  - dot accumulates float products in double, ascending index
  *    ([[FloatVectorDot]] parity); dimension mismatch or a NULL element
  *    → NULL → the cell is skipped (the exploded path's filter);
  *  - zero divisor → NULL (try_divide), NaN score → skipped (isnan
  *    filter); every score NULL/NaN → EMPTY array, and the caller's
  *    `size(cells) > 0` drops the row exactly as the exploded path
  *    drops a vector with no surviving score rows;
  *  - ordering: score desc, ties to the lower cell id — the
  *    `sort_array(struct(score, negcell), desc)` rule; [[TopKBuffer]]'s
  *    primitive comparisons match Spark's SQLOrderingUtil double
  *    ordering on every non-NaN input (NaN never inserts), including
  *    -0.0 == 0.0 ties falling to the cell id.
  *
  * `nanPoisons` selects between the two NaN contracts the retired
  * plan paths implemented: the multi-probe paths FILTER a NaN score
  * per-cell and keep the valid rest (`nanPoisons = false`), while the
  * single-cell argmax paths mark the whole ROW unassignable when any
  * score is NaN — NaN wins `max(struct)`/`greatest` and then fails the
  * equality, collapsing to cell -1 (`nanPoisons = true` returns the
  * EMPTY array so the argmax wrapper's fallback yields -1; reachable
  * only with non-finite embedding/centroid values, pinned anyway).
  */
case class TopCells(queryEmb: Expression, queryNrm: Expression,
    flatCentroids: Array[Float], dim: Int, cnorms: Array[Double], k: Int,
    nanPoisons: Boolean = false)
  extends Expression {

  require(dim > 0 && flatCentroids.length == cnorms.length * dim,
    s"TopCells: flat centroid matrix (${flatCentroids.length}) must be " +
      s"cells (${cnorms.length}) x dim ($dim)")
  require(k >= 1, "TopCells: nProbe must be >= 1")

  override def children: Seq[Expression] = Seq(queryEmb, queryNrm)
  override def nullable: Boolean = queryEmb.nullable || queryNrm.nullable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!queryEmb.dataType.isInstanceOf[ArrayType] ||
        queryEmb.dataType.asInstanceOf[ArrayType].elementType != FloatType)
      TypeCheckResult.TypeCheckFailure(
        s"top_cells expects an array<float> embedding, got ${queryEmb.dataType}")
    else if (queryNrm.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_cells expects a double norm, got ${queryNrm.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val q = queryEmb.eval(input)
    val n = queryNrm.eval(input)
    if (q == null || n == null) null
    else TopCellsOps.compute(q.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], flatCentroids, dim, cnorms, k, nanPoisons)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cQ = queryEmb.genCode(ctx)
    val cN = queryNrm.genCode(ctx)
    val resultType = CodeGenerator.javaType(dataType)
    // centroid matrix + norms as reference objects: serialized with the
    // plan once, shared by every task on an executor — never pasted into
    // generated source (a 4096c x 64d literal would be ~1 MB of source).
    // The hot loop lives in TopCellsOps.compute (plain JVM code, no
    // boxing); generated code null-propagates and calls the static
    // forwarder, so the surrounding whole-stage-codegen span stays whole.
    val cRef = ctx.addReferenceObj("topCellsCentroids", flatCentroids, "float[]")
    val nRef = ctx.addReferenceObj("topCellsNorms", cnorms, "double[]")
    ev.copy(code =
      code"""
        ${cQ.code}
        ${cN.code}
        boolean ${ev.isNull} = ${cQ.isNull} || ${cN.isNull};
        $resultType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.TopCellsOps.compute(
            ${cQ.value}, ${cN.value}, $cRef, $dim, $nRef, $k, $nanPoisons);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(queryEmb = newChildren(0), queryNrm = newChildren(1))

  // Case-class equality would compare the Array model fields by
  // REFERENCE, so two expressions built from separate topCells() calls
  // over the same fitted model would never semanticEquals — defeating
  // subexpression elimination and exchange reuse (same-instance reuse,
  // the knnJoinIvfKernel case, worked regardless). Compare content: the
  // lazy matrix hash makes the overwhelmingly-common mismatch case O(1),
  // and the full Arrays.equals runs only on a hash collision.
  @transient private lazy val modelHash: Int =
    31 * java.util.Arrays.hashCode(flatCentroids) +
      java.util.Arrays.hashCode(cnorms)

  override def hashCode(): Int = {
    var h = modelHash
    h = 31 * h + queryEmb.hashCode(); h = 31 * h + queryNrm.hashCode()
    h = 31 * h + dim; h = 31 * h + k
    31 * h + (if (nanPoisons) 1 else 0)
  }

  override def equals(other: Any): Boolean = other match {
    case t: TopCells =>
      (this eq t) || (dim == t.dim && k == t.k &&
        nanPoisons == t.nanPoisons && modelHash == t.modelHash &&
        queryEmb == t.queryEmb && queryNrm == t.queryNrm &&
        java.util.Arrays.equals(flatCentroids, t.flatCentroids) &&
        java.util.Arrays.equals(cnorms, t.cnorms))
    case _ => false
  }
}

/** The [[TopCells]] hot loop, standalone so scalac emits a static
  * forwarder the generated Java can call directly. */
object TopCellsOps {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(qEmb: ArrayData, qNrm: Double, flat: Array[Float], dim: Int,
              cnorms: Array[Double], k: Int, nanPoisons: Boolean): ArrayData = {
    // dimension mismatch or a NULL element nulls every dot
    // (FloatVectorDot parity) -> every score skips -> empty probe set
    if (qEmb.numElements() != dim) return Empty
    var i = 0
    while (i < dim) {
      if (qEmb.isNullAt(i)) return Empty
      i += 1
    }
    val q = new Array[Float](dim)
    i = 0
    while (i < dim) { q(i) = qEmb.getFloat(i); i += 1 }
    val cells = cnorms.length
    val buf = new TopKBuffer(math.min(k, cells))
    var c = 0
    var base = 0
    while (c < cells) {
      var s = 0.0
      var j = 0
      while (j < dim) {
        s += q(j).toDouble * flat(base + j).toDouble
        j += 1
      }
      val div = qNrm * cnorms(c)
      if (div != 0.0) { // zero divisor -> NULL score (try_divide parity)
        val score = s / div
        if (java.lang.Double.isNaN(score)) {
          if (nanPoisons) return Empty // argmax contract: the row degrades
        } else buf.insert(score, c.toLong)
      }
      c += 1
      base += dim
    }
    if (buf.size == 0) Empty
    else {
      val out = new Array[Any](buf.size)
      var r = 0
      while (r < buf.size) { out(r) = buf.ids(r).toInt; r += 1 }
      new GenericArrayData(out)
    }
  }
}
