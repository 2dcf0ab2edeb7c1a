package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF-PQ (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — the "IVFADC" composition of §V) — the
  * production big-corpus ANN layout: a coarse [[KMeans]] quantizer
  * routes each vector to a cell, and a [[ProductQuantizer]] encodes the
  * RESIDUAL (vector minus its cell centroid) — residuals concentrate
  * near the origin, so the same m×k codebook budget quantizes them with
  * far less error than raw vectors. A query probes only its `nProbe`
  * nearest cells and ADC-scores just those cells' coded rows: at 100 TB
  * the scan is (nProbe/cells) of a ~20-30× compressed table — the IVF
  * scan cut and the PQ memory cut, composed.
  *
  * Codebooks are SHARED across cells (the standard default): one PQ fit
  * on pooled residuals, so driver model state stays cells·dim +
  * m·k·subDim floats. Scoring decomposes q·x ≈ q·c_cell + q·r̂: the
  * first term is a cells-long driver-computed literal consulted per row
  * by `cell`, the second the classic ADC lookup-table sum
  * ([[ProductQuantizer.adcDot]]). Both fits are bit-deterministic at
  * any parallelism (their own contracts), so fit → encode → query is
  * reproducible end-to-end. */
object IvfPq {

  /** Coarse centroids + shared residual codebooks. */
  final case class Model(centroids: Seq[Array[Float]], pq: ProductQuantizer.Model)

  private def centroidLit(centroids: Seq[Array[Float]]): Column =
    typedLit(centroids.map(_.toSeq))

  /** (vec_id, cell, nrm, res): primary-cell assignment (bit-identical
    * to [[KMeans.assignCells]] — `assignTopCells(_, _, 1)` shares its
    * argmax) plus the float residual against that cell's centroid.
    * `nrm` is the ORIGINAL vector's norm — the cosine denominator; the
    * residual is what gets coded. Unassignable rows (zero-norm,
    * wrong-dim: empty probe set) drop out. Past
    * [[KMeans.MaxLiteralCells]] the centroid lookup switches from a
    * cells-long literal to a broadcast equi-join on `cell` (a
    * BroadcastHashJoin — the natural key exists here, unlike in
    * assignment) so the plan stays k-independent at √N cell counts;
    * same float subtraction, bit-identical residuals (IvfPqSpec). */
  private[operators] def withResidual(e: DataFrame, centroids: Seq[Array[Float]],
                                      broadcastPath: Option[Boolean] = None): DataFrame = {
    val assigned = KMeans.assignTopCells(e, centroids, 1)
      .where(size(col("cells")) > 0)
      .select(col("vec_id"), element_at(col("cells"), 1).as("cell"),
        col("nrm"), col("embedding"))
    if (!broadcastPath.getOrElse(centroids.size > KMeans.MaxLiteralCells))
      assigned.select(col("vec_id"), col("cell"), col("nrm"),
        zip_with(col("embedding"),
          element_at(centroidLit(centroids), col("cell") + 1),
          (x, c) => x - c).as("res"))
    else {
      val cdf = e.sparkSession.createDataFrame(
        centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
        .toDF("cell", "cw")
      assigned.join(broadcast(cdf), "cell")
        .select(col("vec_id"), col("cell"), col("nrm"),
          zip_with(col("embedding"), col("cw"), (x, c) => x - c).as("res"))
    }
  }

  /** Fit the coarse cells on the corpus, then ONE shared PQ on the
    * pooled residuals. RUNS Spark jobs (both fits are iterative ML —
    * the documented exception to the no-eager-jobs rule). */
  def fit(e: DataFrame, cells: Int, m: Int = 8, k: Int = 32): Model = {
    val km = KMeans.fit(e.select(col("vec_id"), col("embedding")),
      k = cells, maxIters = 5)
    val res = withResidual(e, km.centroids)
      .select(col("vec_id"), col("res").as("embedding"))
    Model(km.centroids, ProductQuantizer.fit(res, m, k))
  }

  /** Encoded corpus: (vec_id, cell, codes[m], nrm) — the table a
    * production deployment PERSISTS, partitioned/clustered by `cell` so
    * a probe's cell filter prunes to its cells' files before any byte
    * is read. Rows any subspace of which is unencodable drop out
    * (the [[ProductQuantizer.encode]] contract). */
  def encode(e: DataFrame, model: Model): DataFrame = {
    val wr = withResidual(e, model.centroids)
    val codes = ProductQuantizer.codesFor(
      wr.select(col("vec_id"), col("res").as("embedding")), model.pq)
    wr.select(col("vec_id"), col("cell"), col("nrm")).join(codes, "vec_id")
      .select(col("vec_id"), col("cell"), col("codes"), col("nrm"))
  }

  /** Multi-query IVF-ADC top-k — the production BATCH serving shape for
    * the index that matters at 100 TB (a cell-partitioned persisted
    * coded table): Q queries are answered in ONE pass over the probed
    * slice instead of one pass per query. The probe structure is
    * driver-computed from the collected batch (bounded by the same
    * contract as [[ProductQuantizer.pqTopKBatch]]'s broadcast —
    * thousands of queries are fine, a second corpus is not):
    *
    *   - the UNION of all queries' probed cells becomes one STATIC
    *     `cell IN (...)` predicate, so on a persisted index the scan
    *     still prunes to probed-cell FILES (partition pruning survives
    *     batching — AnnIndexSpec asserts the PartitionFilters; when the
    *     union covers every cell there is nothing to prune and the
    *     IN-list is dropped rather than bloating the plan);
    *   - the probe sets explode to slim (qid, cell, cellDot) rows that
    *     BROADCAST-HASH-JOIN the scan on `cell` — each coded row meets
    *     exactly the queries that probe its cell (the minimal pair set;
    *     a cross join would test every row against all Q probe sets) —
    *     and a second broadcast join on `qid` attaches the query's
    *     m×k ADC LUT and norm, stored ONCE per query, not per probe;
    *   - all driver arithmetic is the single-query path's own code
    *     ([[KMeans.assignCells]]' cosine + lower-id tie rule for the
    *     probe pick; [[ProductQuantizer.adcLut]] verbatim, flattened),
    *     so scores are bit-identical to [[topK]] by shared code, not by
    *     parallel construction.
    *
    * Scoring a pair is two hash probes + m lookups + adds; per-query
    * `rerank` shortlists come from [[graft.functions.TopKByScore]]
    * (k-bounded map-side partials — the exchange carries ≤
    * partitions×Q×rerank slim rows), and ONLY shortlist rows join their
    * full vectors for exact cosine re-rank. Output (qid, vec_id, cos),
    * best-first within each qid, row-for-row equal to per-query [[topK]]
    * (AnnIndexSpec proves parity on the persisted index; ScaleSmoke
    * measures batch-vs-loop).
    *
    * `queries` must be (qid, qemb) with distinct qids and nonzero
    * norms — same fail-fast as [[topK]]'s zero-norm rule, applied
    * per query. `excludeSelf` drops the pair `vec_id == qid` before
    * shortlist selection — for corpus-member queries (kNN evaluation,
    * [[AnnIndex.driftCheck]]) this equals per-query
    * `encoded.where(vec_id =!= qid)` without Q per-query scans. */
  /** [[topKBatch]] with the probe depth read from the model's own cell
    * count via [[Similarity.ivfNProbeFor]] — the same tier rule the
    * single-query ss9 path applies. A batch caller that hard-codes a
    * literal nProbe keeps it while the index grows across tiers and
    * silently under-probes (48 cells' worth of neighborhood spread over
    * 4096 cells, probed 4 deep); this overload cannot — the depth
    * follows the geometry it probes. `excludeSelf` is explicit because
    * Scala allows default arguments on only one overload. */
  def topKBatch(e: DataFrame, encoded: DataFrame, model: Model,
                queries: DataFrame, topK: Int, rerank: Int,
                excludeSelf: Boolean): DataFrame =
    topKBatch(e, encoded, model, queries,
      nProbe = Similarity.ivfNProbeFor(model.centroids.size),
      topK = topK, rerank = rerank, excludeSelf = excludeSelf)

  def topKBatch(e: DataFrame, encoded: DataFrame, model: Model,
                queries: DataFrame, nProbe: Int, topK: Int, rerank: Int,
                excludeSelf: Boolean = false): DataFrame = {
    require(nProbe >= 1, "IvfPq.topKBatch: nProbe must be >= 1")
    require(topK >= 1, s"IvfPq.topKBatch: topK must be >= 1 (got $topK)")
    require(rerank >= topK, s"IvfPq.topKBatch: rerank ($rerank) must be >= topK ($topK)")
    val spark = e.sparkSession
    VectorFunctions.ensureRegistered(spark)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); i += 1 }
      d
    }
    // bounded-batch contract: the rows are broadcast whole below anyway,
    // so collecting them for the driver-side probe math adds no state a
    // batch caller hasn't already signed up for
    val qrows: Array[(Long, Array[Float])] = queries
      .select(col("qid"), col("qemb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qrows.nonEmpty, "IvfPq.topKBatch: queries has no rows")
    require(qrows.map(_._1).distinct.length == qrows.length,
      "IvfPq.topKBatch: duplicate qid in the query batch")
    val qside: Seq[(Long, Seq[Float], Double, Seq[Int], Seq[Double], Seq[Double])] =
      qrows.toSeq.map { case (qid, q) =>
        val qnorm = math.sqrt(dot(q, q))
        require(qnorm > 0, s"IvfPq.topKBatch: query qid=$qid has zero norm")
        val probed = model.centroids.zipWithIndex
          .map { case (c, i) => (dot(q, c) / (qnorm * math.sqrt(dot(c, c))), i) }
          .sortBy { case (score, i) => (-score, i) }
          .take(math.min(nProbe, model.centroids.size)).map(_._2)
        val cellDot = probed.map(c => dot(q, model.centroids(c)))
        (qid, q.toSeq, qnorm, probed, cellDot,
          ProductQuantizer.adcLut(model.pq, q).flatten)
      }
    val unionCells = qside.flatMap(_._4).distinct.sorted
    val k = model.pq.k
    val qdf = spark.createDataFrame(qside.map { case (qid, q, qn, _, _, lut) =>
      (qid, q, qn, lut)
    }).toDF("qid", "qemb", "qnorm", "lut")
    val probeDf = spark.createDataFrame(qside.flatMap {
      case (qid, _, _, probed, cellDot, _) =>
        probed.zip(cellDot).map { case (c, cd) => (qid, c, cd) }
    }).toDF("qid", "cell", "cellDot")
    // static → partition pruning; when the union already covers every
    // cell (small indexes, dense batches) the IN-list prunes nothing
    // and at 4096 cells would only bloat the plan — skip it
    val pruned =
      if (unionCells.size == model.centroids.size) encoded
      else encoded.where(col("cell").isin(unionCells: _*))
    val paired = pruned
      .join(broadcast(probeDf), "cell") // BHJ: exactly the probed pairs
    val shortlist = (if (excludeSelf) paired.where(col("vec_id") =!= col("qid"))
                     else paired)
      .join(broadcast(qdf.select(col("qid"), col("qnorm"), col("lut"))), "qid")
      .select(col("qid"), col("vec_id"),
        try_divide(
          col("cellDot") +
            aggregate(sequence(lit(0), lit(model.pq.m - 1)), lit(0.0),
              (acc, s) => acc + element_at(col("lut"),
                s * k + element_at(col("codes"), s + 1) + 1)),
          col("nrm") * col("qnorm")).as("approx_cos"))
      .groupBy(col("qid"))
      .agg(VectorFunctions.topkByScore(col("approx_cos"), col("vec_id"), rerank).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("vec_id"))
    shortlist
      .join(e, "vec_id")
      .join(broadcast(qdf.select(col("qid"), col("qemb"))), "qid")
      .select(col("qid"), col("vec_id"),
        VectorFunctions.round3(VectorFunctions.vecCosine(col("embedding"), col("qemb"))).as("cos"))
      .groupBy(col("qid"))
      .agg(VectorFunctions.topkByScore(col("cos"), col("vec_id"), topK).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("vec_id"), col("t.score").as("cos"))
  }

  /** Two-stage IVF-ADC top-k: pick the query's `nProbe` nearest cells
    * by pure driver arithmetic over the k centroids (same cosine +
    * lower-id tie rule as [[KMeans.assignCells]]), ADC-score ONLY those
    * cells' coded rows (the `cell` filter is an ordinary pushable
    * predicate on the encoded table), keep `rerank` candidates
    * (TakeOrderedAndProject — per-partition heap), and re-rank exactly
    * against only their full vectors. The full-vector table is touched
    * for `rerank` rows, not N; the coded table for ~nProbe/cells of N. */
  def topK(e: DataFrame, encoded: DataFrame, model: Model, query: Array[Float],
           nProbe: Int, topK: Int, rerank: Int): DataFrame = {
    require(nProbe >= 1, "IvfPq.topK: nProbe must be >= 1")
    // rerank < topK would silently return fewer than topK rows and
    // rerank <= 0 an empty result — fail fast like sampleFrames does
    require(topK >= 1, s"IvfPq.topK: topK must be >= 1 (got $topK)")
    require(rerank >= topK, s"IvfPq.topK: rerank ($rerank) must be >= topK ($topK)")
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); i += 1 }
      d
    }
    val qnorm = math.sqrt(dot(query, query))
    // a zero-norm query scores NaN against every centroid and the
    // driver-side sort would pick arbitrary cells — fail fast (row-side
    // scoring below is NULL-safe via try_divide regardless)
    require(qnorm > 0, "IvfPq.topK: query vector has zero norm")
    val probed: Seq[Int] = model.centroids.zipWithIndex
      .map { case (c, i) => (dot(query, c) / (qnorm * math.sqrt(dot(c, c))), i) }
      .sortBy { case (score, i) => (-score, i) }
      .take(math.min(nProbe, model.centroids.size)).map(_._2)
    val cellDot: Seq[Double] = model.centroids.map(c => dot(query, c))
    val approxDot = element_at(typedLit(cellDot), col("cell") + 1) +
      ProductQuantizer.adcDot(model.pq, query)
    val cand = encoded.where(col("cell").isin(probed: _*))
      .select(col("vec_id"),
        try_divide(approxDot, col("nrm") * qnorm).as("approx_cos"))
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(rerank)
    val qLit = typedLit(query.toSeq)
    e.join(cand, "vec_id")
      .select(col("vec_id"),
        VectorFunctions.round3(VectorFunctions.vecCosine(col("embedding"), qLit)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topK)
  }
}
