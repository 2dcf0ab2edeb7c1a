package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the memory-scaling path for ANN that
  * IVF (ss4) alone does not give: split each `dim`-vector into `m`
  * subvectors, learn a k-codeword L2 codebook per subspace, and store
  * each vector as `m` small codes (+ its norm) — 64 floats (256 B)
  * become 8 codes + 1 float (~12 B), a ~20-30× scan-size reduction. At
  * 100 TB of embeddings the encoded table is what a query actually
  * scans; candidates found by approximate (ADC) score are re-ranked
  * exactly against only their own full vectors.
  *
  * Scale/determinism discipline is [[KMeans]]'s: fit iterations are ONE
  * slim exploded scoring pass (vec_id, s, code rows — map-side-combined
  * argmin, no fat rows through the shuffle) plus ONE tiny-key quantized
  * mean aggregation (m·k·subDim cells of driver state); seeding is a
  * deterministic farthest-point (Gonzalez) walk per subspace over one
  * shared hash-ordered sample; every step ties to the smaller id, so
  * fit, encode, and query are bit-reproducible at any parallelism. */
object ProductQuantizer {

  /** Fitted model: `codebooks(s)(code)` = subDim floats. */
  final case class Model(codebooks: Seq[Seq[Array[Float]]], subDim: Int) {
    def m: Int = codebooks.size
    def k: Int = codebooks.head.size
  }

  private val Disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** The m per-row subvector slices as one generator: (s, sub). */
  private def slices(m: Int, subDim: Int): Column =
    posexplode(array((0 until m).map(s =>
      slice(col("embedding"), s * subDim + 1, subDim)): _*))

  /** Literal codebook table: per subspace an array of (code, codeword,
    * |codeword|²) structs — broadcast into the expression like KMeans'
    * ctab, no join, no driver-side broadcast variable. */
  private def codebookLit(codebooks: Seq[Seq[Array[Float]]]): Column =
    typedLit(codebooks.map(_.zipWithIndex.map { case (c, i) =>
      (i, c.toSeq, c.map(x => x.toDouble * x).sum)
    }))

  /** Slim per-subspace code assignment: (vec_id, s, code). L2 argmin =
    * argmax(2·dot − |c|²) (row term constant), ties to the LOWER code
    * (negated code in the max-struct — the KMeans rule). A wrong-dim row
    * scores NULL everywhere (vec_dot NULL) → code -1; zero subvectors
    * are fine (L2 needs no norm division). Both size mismatches take the
    * -1 path: under-length rows slice short (vec_dot NULL), over-length
    * rows are nulled up front — their slices would all be full, so
    * without the guard they'd encode a valid-looking code for the PREFIX
    * while `nrm` covers the whole vector (a silently deflated ADC
    * cosine, not an error). */
  private[operators] def assignCodes(e: DataFrame, model: Model): DataFrame = {
    VectorFunctions.ensureRegistered(e.sparkSession)
    e.select(col("vec_id"),
        when(size(col("embedding")) === model.m * model.subDim, col("embedding"))
          .as("embedding"))
      .select(col("vec_id"), slices(model.m, model.subDim).as(Seq("s", "sub")))
      .select(col("vec_id"), col("s"), col("sub"),
        explode(element_at(codebookLit(model.codebooks), col("s") + 1)).as("cw"))
      .select(col("vec_id"), col("s"),
        (VectorFunctions.vecDot(col("sub"), col("cw._2")) * 2 - col("cw._3")).as("score"),
        (-col("cw._1")).as("negcode"))
      .groupBy(col("vec_id"), col("s"))
      .agg(max(struct(col("score"), col("negcode"))).as("b"))
      .select(col("vec_id"), col("s"),
        when(col("b.score").isNull || isnan(col("b.score")), lit(-1))
          .otherwise(-col("b.negcode")).cast("int").as("code"))
  }

  /** Per-subspace L2 Lloyd's until codes stop changing (or maxIters).
    * Empty codes keep their previous codeword. Like [[KMeans.fit]] this
    * RUNS jobs — the inherent iterative-ML exception. */
  def fit(e0: DataFrame, m: Int = 8, k: Int = 32, maxIters: Int = 5): Model = {
    require(m > 0 && k > 1 && maxIters > 0)
    val e = e0.select(col("vec_id"), col("embedding")).persist(Disk)
    try {
      // one shared deterministic sample seeds every subspace
      val sampleN = math.max(8 * k, 1024)
      // NULL embeddings (missing values) are out of fit scope — without
      // the filter a NULL row in the sample NPEs on the driver below;
      // non-null mixed dims still fail the dimensionality require (a
      // structural bug worth surfacing, not a missing value)
      val sample: Array[(Long, Array[Float])] = e
        .where(col("embedding").isNotNull)
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleN)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      require(sample.length >= k, s"need at least $k vectors to seed $k codes")
      val dims = sample.map(_._2.length).distinct
      require(dims.length == 1, "sample disagrees on dimensionality — mixed-dim input")
      val dim = dims.head
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val subDim = dim / m

      def l2(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var i = 0
        while (i < a.length) { val t = a(i).toDouble - b(i); d += t * t; i += 1 }
        d
      }
      // Gonzalez farthest-point per subspace, start at the smallest
      // vec_id's subvector, ties to the smaller vec_id
      var codebooks: Seq[Seq[Array[Float]]] = (0 until m).map { s =>
        val subs = sample.map { case (id, v) => (id, v.slice(s * subDim, (s + 1) * subDim)) }
        val seedIdx = scala.collection.mutable.ArrayBuffer(
          subs.indices.minBy(i => subs(i)._1))
        val isSeed = Array.fill(subs.length)(false)
        isSeed(seedIdx.head) = true
        val minDist = Array.fill(subs.length)(Double.MaxValue)
        while (seedIdx.length < k) {
          val last = subs(seedIdx.last)._2
          var best = -1
          var i = 0
          while (i < subs.length) {
            val d = math.min(minDist(i), l2(subs(i)._2, last))
            minDist(i) = d
            if (!isSeed(i) &&
              (best < 0 || d > minDist(best) ||
                (d == minDist(best) && subs(i)._1 < subs(best)._1))) best = i
            i += 1
          }
          isSeed(best) = true
          seedIdx += best
        }
        seedIdx.map(i => subs(i)._2).toSeq
      }

      var prev: Option[DataFrame] = None
      var iter = 0
      var converged = false
      while (iter < maxIters && !converged) {
        val assigned = assignCodes(e, Model(codebooks, subDim)).persist(Disk)
        val changed = prev match {
          case None => Long.MaxValue
          case Some(p) =>
            assigned.join(p.withColumnRenamed("code", "prev_code"), Seq("vec_id", "s"))
              .where(col("code") =!= col("prev_code")).count()
        }
        if (changed == 0) converged = true
        else {
          // quantized exact component means per (s, code) — ss7/KMeans
          // convention; code -1 (wrong-dim) excluded
          val means = e
            .select(col("vec_id"), slices(m, subDim).as(Seq("s", "sub")))
            .join(assigned.where(col("code") >= 0), Seq("vec_id", "s"))
            .select(col("s"), col("code"), posexplode(col("sub")).as(Seq("dim", "v")))
            .withColumn("q", floor(col("v").cast("double") * 1000000L))
            .groupBy(col("s"), col("code"), col("dim"))
            .agg(sum(col("q")).as("qs"), count(lit(1)).as("n"))
            .select(col("s"), col("code"), col("dim"),
              (col("qs") / (col("n") * 1000000.0)).as("mn"))
            .collect()
          val next = codebooks.map(_.map(_.clone()).toArray).toArray
          means.foreach { r =>
            next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
          }
          codebooks = next.map(_.toSeq).toSeq
        }
        prev.foreach(_.unpersist(false))
        prev = Some(assigned)
        iter += 1
      }
      prev.foreach(_.unpersist(false))
      Model(codebooks, subDim)
    } finally { e.unpersist(false); () }
  }

  /** (vec_id, codes[m]) for every fully-encodable vector: per-subspace
    * code assignment collected into subspace order; rows any subspace of
    * which is unencodable (code -1: wrong dimension) drop out. The ONE
    * place the sentinel/ordering contract lives — [[encode]] and
    * [[IvfPq.encode]] both attach their own side columns to this. */
  private[operators] def codesFor(e: DataFrame, model: Model): DataFrame =
    assignCodes(e, model)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("code")))).as("sc"))
      .select(col("vec_id"), transform(col("sc"), x => x.getField("code")).as("codes"))
      .where(!array_contains(col("codes"), -1))

  /** Encode the corpus: (vec_id, codes[m], nrm). This is the table a
    * production deployment PERSISTS — ~20-30× smaller than the raw
    * embeddings, which is the entire point at 100 TB. */
  def encode(e: DataFrame, model: Model): DataFrame =
    e.select(col("vec_id"),
        sqrt(VectorFunctions.vecDot(col("embedding"), col("embedding"))).as("nrm"))
      .join(codesFor(e, model), "vec_id")
      .select(col("vec_id"), col("codes"), col("nrm"))

  /** The m×k ADC lookup table for one query: `lut(s)(code)` = the dot
    * product of the query's s-th subvector with that code's codeword.
    * The ONE place the LUT dot order lives, for real this time:
    * [[adcDot]] broadcasts it as a literal, and both batch paths —
    * [[pqTopKBatch]] and [[IvfPq.topKBatch]] — compute each query's LUT
    * on the driver through this method (flattened row-major), so
    * cross-path score parity is shared code, with the AnnIndexSpec
    * parity tests as the regression net. */
  private[operators] def adcLut(model: Model, query: Array[Float]): Seq[Seq[Double]] = {
    require(query.length == model.m * model.subDim,
      s"query dim ${query.length} != ${model.m}×${model.subDim}")
    (0 until model.m).map { s =>
      val qs = query.slice(s * model.subDim, (s + 1) * model.subDim)
      model.codebooks(s).map(c =>
        qs.zip(c).map { case (a, b) => a.toDouble * b }.sum).toSeq
    }
  }

  /** ADC approximate dot-product EXPRESSION over a `codes` column: the
    * per-(subspace, code) dot products form a driver-computed m×k
    * lookup table broadcast as a literal, so scoring a row is m array
    * lookups + adds — no float vector is touched. Shared by [[adcScores]]
    * and [[IvfPq.topK]] (which adds the per-cell centroid term). */
  private[operators] def adcDot(model: Model, query: Array[Float]): Column = {
    val lutLit = typedLit(adcLut(model, query))
    aggregate(
      sequence(lit(0), lit(model.m - 1)), lit(0.0),
      (acc, s) => acc + element_at(element_at(lutLit, s + 1),
        element_at(col("codes"), s + 1) + 1))
  }

  /** ADC scores for one query against the encoded table. Returns
    * (vec_id, approx_cos). */
  def adcScores(encoded: DataFrame, model: Model, query: Array[Float]): DataFrame = {
    val qnorm = math.sqrt(query.map(x => x.toDouble * x).sum)
    encoded.select(col("vec_id"),
      try_divide(adcDot(model, query), col("nrm") * qnorm).as("approx_cos"))
  }

  /** Multi-query two-stage PQ top-k — the production BATCH serving
    * shape: `queries` (qid, qemb) are answered in ONE pass over the
    * encoded table instead of one pass per query, which at a
    * disk-resident 100 TB index divides the dominant cost — the coded
    * scan — by the batch size. Each query's m×k ADC lookup table is
    * driver-computed through [[adcLut]] — the SAME method the
    * single-query [[adcDot]] broadcasts, so cross-path score parity is
    * shared code (an earlier cut rebuilt the table in-plan, a second
    * copy of the dot order); the broadcast cross join then attaches
    * (qid, lut) to every encoded row and scoring stays m lookups + adds
    * per pair. Per-query `rerank` shortlists come from
    * [[graft.functions.TopKByScore]] — k-bounded buffers, map-side
    * partials, so the exchange carries ≤ partitions×Q×rerank slim rows,
    * never the Q×N scored candidates (a row_number window would shuffle
    * them all) — and ONLY shortlist rows join their full vectors for
    * exact re-rank. Output (qid, vec_id, cos), best-first within each
    * qid, row-for-row equal to [[pqTopK]] per query (AnnIndexSpec
    * proves parity and ScaleSmoke measures the batch-vs-loop win on the
    * persisted index).
    *
    * Contract: `queries` is a BOUNDED batch (it is broadcast whole and
    * each row carries an m×k-double LUT — thousands of queries are
    * fine, a second corpus is not; the driver additionally collects the
    * batch to run adcLut, the same state the broadcast already holds).
    * A zero-norm query scores NULL everywhere and drops out, the
    * [[pqTopK]] convention. A query whose dimension does not match the
    * model's m×subDim fails fast on the driver with
    * `IllegalArgumentException` for the whole batch — deliberately
    * stricter than [[pqTopK]]'s silent NULL drop-out: in a batch, one
    * malformed query is a caller bug worth surfacing, not a row to
    * silently lose. `excludeSelf` drops the pair `vec_id == qid` before
    * the shortlist — the batched form of the per-query corpus-member
    * filters (the [[AnnIndex.driftCheckPq]] shape), mirroring
    * [[IvfPq.topKBatch]]'s flag. */
  def pqTopKBatch(e: DataFrame, encoded: DataFrame, model: Model,
                  queries: DataFrame, topK: Int, rerank: Int,
                  excludeSelf: Boolean = false): DataFrame = {
    require(topK >= 1, s"pqTopKBatch: topK must be >= 1 (got $topK)")
    require(rerank >= topK, s"pqTopKBatch: rerank ($rerank) must be >= topK ($topK)")
    val spark = e.sparkSession
    VectorFunctions.ensureRegistered(spark)
    val (m, k) = (model.m, model.k)
    val qrows: Array[(Long, Array[Float])] = queries
      .select(col("qid"), col("qemb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    qrows.find(_._2.length != m * model.subDim).foreach { case (qid, q) =>
      throw new IllegalArgumentException(
        s"pqTopKBatch: query $qid has dim ${q.length}, model expects ${m * model.subDim}")
    }
    // qnorm is the same driver expression pqTopK/adcScores uses;
    // adcLut is the same LUT adcDot broadcasts — bit-parity by shared
    // code, flattened row-major for the flat element_at below
    val withLut = spark.createDataFrame(qrows.toSeq.map { case (qid, q) =>
      (qid, q.toSeq, math.sqrt(q.map(x => x.toDouble * x).sum),
        adcLut(model, q).flatten)
    }).toDF("qid", "qemb", "qnorm", "lut")
    val paired = encoded.crossJoin(broadcast(withLut))
    val shortlist = (if (excludeSelf) paired.where(col("vec_id") =!= col("qid"))
                     else paired)
      .select(col("qid"),
        col("vec_id"),
        try_divide(
          aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
            (acc, s) => acc + element_at(col("lut"),
              s * k + element_at(col("codes"), s + 1) + 1)),
          col("nrm") * col("qnorm")).as("approx_cos"))
      .groupBy(col("qid"))
      .agg(VectorFunctions.topkByScore(col("approx_cos"), col("vec_id"), rerank).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("vec_id"))
    shortlist
      .join(e, "vec_id")
      .join(broadcast(withLut.select(col("qid"), col("qemb"))), "qid")
      .select(col("qid"), col("vec_id"),
        VectorFunctions.round3(VectorFunctions.vecCosine(col("embedding"), col("qemb"))).as("cos"))
      .groupBy(col("qid"))
      .agg(VectorFunctions.topkByScore(col("cos"), col("vec_id"), topK).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("vec_id"), col("t.score").as("cos"))
  }

  /** Two-stage PQ top-k: ADC over the encoded table keeps `rerank`
    * candidates (TakeOrderedAndProject — per-partition heap), then ONLY
    * those join back to their full vectors for exact cosine re-ranking.
    * The full-vector table is touched for `rerank` rows, not N. */
  def pqTopK(e: DataFrame, encoded: DataFrame, model: Model,
             query: Array[Float], topK: Int, rerank: Int): DataFrame = {
    // rerank < topK would silently return fewer than topK rows and
    // rerank <= 0 an empty result — fail fast like sampleFrames does
    require(topK >= 1, s"pqTopK: topK must be >= 1 (got $topK)")
    require(rerank >= topK, s"pqTopK: rerank ($rerank) must be >= topK ($topK)")
    val qLit = typedLit(query.toSeq)
    val cand = adcScores(encoded, model, query)
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(rerank)
    e.join(cand, "vec_id")
      .select(col("vec_id"),
        VectorFunctions.round3(VectorFunctions.vecCosine(col("embedding"), qLit)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topK)
  }
}
