package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the embedding-similarity hot loop
  * (SURVEY.md §4.2 "needs custom code"): dot product over two
  * ArrayType(FloatType) columns, accumulated in double.
  *
  * Why not zip_with + aggregate (the composable form kept in
  * [[graft.operators.Similarity]]'s oracle mirror): those build an
  * intermediate array per row-pair and walk it with per-element lambda
  * dispatch. This expression reads both ArrayData buffers directly in one
  * fused loop inside whole-stage codegen — no allocation, no virtual
  * calls — which is what an O(N·k) similarity scan needs at 100 TB.
  * Accumulation order is the same left-to-right as the composed form, so
  * results are bit-identical for equal-length inputs; length-mismatched
  * inputs yield NULL (as the zip_with form does: the padded null element
  * nulls the whole aggregate) — a dimension bug surfaces instead of
  * silently producing a truncated dot product. A NULL ELEMENT inside
  * either array also yields NULL (zip_with parity again — getFloat on a
  * null slot would silently read 0.0 and fabricate a similarity).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even for non-null inputs: length mismatch produces NULL
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // dimension mismatch -> NULL, like zip_with
    var s = 0.0
    var i = 0
    while (i < n) {
      // null element -> NULL result (getFloat on a null slot reads 0.0
      // and would silently fabricate a similarity)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double ${ev.value}_acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    ${ev.value}_acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = ${ev.value}_acc; }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension injecting the custom functions; enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or at runtime via [[VectorFunctions.ensureRegistered]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorFunctions.vecDotDescriptor)
    ext.injectFunction(VectorFunctions.simhashDescriptor)
    ext.injectFunction(VectorFunctions.topkDescriptor)
    ext.injectFunction(VectorFunctions.cellTopkDescriptor)
    ext.injectFunction(VectorFunctions.round3Descriptor)
  }
}

object VectorFunctions {
  import org.apache.spark.sql.functions.{call_function, try_divide, sqrt => fsqrt}

  /** SQL-builder arity gate: `topk_by_score(score, id)` from SQL must
    * fail as a proper wrong-number-of-arguments AnalysisException (the
    * standard WRONG_NUM_ARGS error class every built-in raises), not an
    * IndexOutOfBoundsException from a blind children(2). */
  private def requireArity(name: String, expected: Int,
                           children: Seq[Expression]): Unit =
    if (children.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private[functions] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      requireArity("vec_dot", 2, children)
      FloatVectorDot(children(0), children(1))
    })

  private[functions] val simhashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_agg"),
    new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
    (children: Seq[Expression]) => {
      requireArity("simhash_agg", 1, children)
      SimHashAgg(children.head).toAggregateExpression()
    })

  private[functions] val topkDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_by_score"),
    new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
    (children: Seq[Expression]) => {
      requireArity("topk_by_score", 3, children)
      TopKByScore(children(0), children(1), children(2)).toAggregateExpression()
    })

  private[functions] val round3Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("round3"),
    new ExpressionInfo(classOf[Round3].getName, "round3"),
    (children: Seq[Expression]) => {
      requireArity("round3", 1, children)
      Round3(children.head)
    })

  private[functions] val cellTopkDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cell_topk"),
    new ExpressionInfo(classOf[CellTopK].getName, "cell_topk"),
    (children: Seq[Expression]) => {
      requireArity("cell_topk", 5, children)
      CellTopK(children(0), children(1), children(2), children(3), children(4))
    })

  /** Idempotently register the custom functions in an existing session
    * (covers sessions built without the extensions config). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    Seq(vecDotDescriptor, simhashDescriptor, topkDescriptor,
        cellTopkDescriptor, round3Descriptor).foreach {
      case (id, info, builder) =>
        if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }

  /** SimHash sketch aggregate over a bigint token-hash column. */
  def simhashAgg(tokenHash: Column): Column = call_function("simhash_agg", tokenHash)

  /** Bounded-state top-k aggregate: per-group best `k` (score, id)
    * structs, best-first, ties to the lower id ([[TopKByScore]]). */
  def topkByScore(score: Column, id: Column, k: Int): Column =
    call_function("topk_by_score", score, id,
      org.apache.spark.sql.functions.lit(k))

  /** Codegen dot product of two float-array columns. */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** `round(x, 3)` bits without the per-call BigDecimal ([[Round3]] /
    * [[FastRound]]) — for the per-CANDIDATE score rounding in the
    * similarity kernels, where Spark Round's stringify-and-reparse was
    * the measured dominant CPU (round 14). */
  def round3(x: Column): Column = call_function("round3", x)

  /** In-row chunk top-k cosine scorer ([[CellTopK]]): top `k`
    * (score, id) structs of one query row against one cell-chunk member
    * array, best-first, ties to the lower id. */
  def cellTopK(queryEmb: Column, queryNrm: Column, members: Column,
               selfId: Column, k: Int): Column =
    call_function("cell_topk", queryEmb, queryNrm, members, selfId,
      org.apache.spark.sql.functions.lit(k))

  /** In-row top-`nProbe` IVF cell assignment ([[TopCells]]): best cells
    * by `dot/(nrm*cnorm)`, best-first, ties to the lower cell id. The
    * centroid matrix travels as a plan reference object, so this is not
    * registry-routed (no literal encoding of model state). */
  def topCells(queryEmb: Column, queryNrm: Column,
               centroids: Seq[Array[Float]], cnorms: Seq[Double],
               nProbe: Int, nanPoisons: Boolean = false): Column = {
    require(centroids.nonEmpty, "topCells: need at least one centroid")
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim),
      "topCells: centroids disagree on dimensionality")
    val flat = new Array[Float](centroids.size * dim)
    centroids.zipWithIndex.foreach { case (c, i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    org.apache.spark.sql.GraftExpressionBridge.column(
      TopCells(
        org.apache.spark.sql.GraftExpressionBridge.expression(queryEmb),
        org.apache.spark.sql.GraftExpressionBridge.expression(queryNrm),
        flat, dim, cnorms.toArray, nProbe, nanPoisons))
  }

  /** Cosine similarity via the codegen kernel; norm factors composed from
    * the same kernel so bits match the zip_with formulation. try_divide,
    * not `/`: under ANSI mode (Spark 4 default) a zero-norm vector —
    * every real corpus has failed-embedding padding rows — would turn
    * x/0.0 into a task-killing DIVIDE_BY_ZERO instead of an
    * unmatchable NULL. */
  def vecCosine(a: Column, b: Column): Column =
    try_divide(vecDot(a, b), fsqrt(vecDot(a, a)) * fsqrt(vecDot(b, b)))
}
