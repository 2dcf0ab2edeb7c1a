package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeClient

/** Persisted ANN index lifecycle — the gap between "the operators exist"
  * and "the index exists". [[ProductQuantizer.encode]] /
  * [[IvfPq.encode]] produce the 20-30× compressed coded table a
  * production deployment PERSISTS and serves queries from; this object
  * is that persistence: write the coded table through the lake client
  * (IVF-PQ: partitioned by `cell`, so the scan-prune the probe relies
  * on becomes PARTITION pruning on files — unprobed cells are never
  * read), store the fitted model as small parquet sidecar tables beside
  * it, read both back, and append newly-arrived corpus rows encoded
  * under the stored model (corpus append is the normal state of a
  * training-data lake; encoding is pure per-row given a model, so the
  * append path touches only the new rows).
  *
  * Index layout under `path` in a lake filesystem:
  * {{{
  *   codes/             (vec_id, codes[m], nrm [, cell])  — the coded
  *                      corpus; IVF-PQ partitioned by `cell`
  *   model/codebooks/   (s, code, cw[subDim])             — shared PQ
  *   model/centroids/   (cell, cw[dim])                   — IVF-PQ only
  * }}}
  *
  * Everything round-trips bit-exactly: parquet stores float32/float64
  * verbatim, model reconstruction orders by (cell) / (s, code), and the
  * fits themselves are bit-deterministic ([[KMeans]]/[[ProductQuantizer]]
  * contracts) — so write → read → query equals the in-memory path
  * bit-for-bit (AnnIndexSpec). Write-then-read, not write-and-keep: the
  * served DataFrame scans the PERSISTED files, which is exactly what a
  * production query pays (and what the bench should measure).
  *
  * Staleness contract: the model sidecar is written BEFORE the codes
  * (a reader that sees codes sees their model); `writeParquet` is
  * mode=overwrite so a rebuild replaces both. Appends extend `codes/`
  * under the EXISTING model — drift between the stored centroids and a
  * grown corpus is the operator's signal to re-fit (ScaleSmoke measures
  * the recall gap stale-vs-refit at 2× growth). `vec_id` uniqueness
  * across appends is the caller's contract, as for any table append. */
object AnnIndex {

  private def codebooksDf(s: SparkSession, pq: ProductQuantizer.Model): DataFrame =
    s.createDataFrame(for {
      (cb, sub) <- pq.codebooks.zipWithIndex
      (cw, code) <- cb.zipWithIndex
    } yield (sub, code, cw.toSeq)).toDF("s", "code", "cw")

  private def centroidsDf(s: SparkSession, centroids: Seq[Array[Float]]): DataFrame =
    s.createDataFrame(centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "cw")

  private def readCodebooks(spark: SparkSession, lake: LakeClient,
                            filesystem: String, path: String): ProductQuantizer.Model = {
    val rows = lake.readParquet(spark, filesystem, s"$path/model/codebooks")
      .select(col("s"), col("code"), col("cw")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toArray))
    require(rows.nonEmpty, s"AnnIndex: no codebooks at $path/model/codebooks")
    val bySub = rows.groupBy(_._1._1)
    val m = bySub.keySet.max + 1
    require(bySub.keySet == (0 until m).toSet,
      s"AnnIndex: codebook subspaces not contiguous at $path")
    val codebooks = (0 until m).map { s =>
      val cb = bySub(s).sortBy(_._1._2)
      require(cb.map(_._1._2).sameElements(cb.indices),
        s"AnnIndex: codebook codes not contiguous in subspace $s at $path")
      cb.map(_._2).toSeq
    }
    ProductQuantizer.Model(codebooks, codebooks.head.head.length)
  }

  private def readCentroids(spark: SparkSession, lake: LakeClient,
                            filesystem: String, path: String): Seq[Array[Float]] = {
    val rows = lake.readParquet(spark, filesystem, s"$path/model/centroids")
      .select(col("cell"), col("cw")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty, s"AnnIndex: no centroids at $path/model/centroids")
    require(rows.map(_._1).sameElements(rows.indices),
      s"AnnIndex: centroid cells not contiguous at $path")
    rows.map(_._2).toSeq
  }

  /** Build and persist a flat-PQ index: fit sidecar + coded corpus.
    * Runs the encode job (one linear pass over `corpus`). */
  def writePq(lake: LakeClient, filesystem: String, path: String,
              corpus: DataFrame, model: ProductQuantizer.Model): Unit = {
    val s = corpus.sparkSession
    lake.writeParquet(codebooksDf(s, model), filesystem, s"$path/model/codebooks")
    lake.writeParquet(ProductQuantizer.encode(corpus, model),
      filesystem, s"$path/codes")
  }

  /** Load a persisted flat-PQ index: (coded table as scanned from the
    * lake, reconstructed model). The DataFrame is lazy — serving a
    * query scans the persisted files, nothing is collected beyond the
    * m×k×subDim model floats. */
  def readPq(spark: SparkSession, lake: LakeClient, filesystem: String,
             path: String): (DataFrame, ProductQuantizer.Model) =
    (lake.readParquet(spark, filesystem, s"$path/codes"),
      readCodebooks(spark, lake, filesystem, path))

  /** Build and persist an IVF-PQ index: both model sidecars + the coded
    * corpus PARTITIONED BY CELL — the layout that turns the probe's
    * cell filter into partition pruning, so a query's scan share is
    * (nProbe/cells) in FILES, not just in rows.
    *
    * The coded rows are hash-repartitioned on `cell` before the write:
    * without it every shuffle partition writes a sliver into every cell
    * directory — cells × shufflePartitions files (measured 2048 at the
    * 20× smoke's 64-cell tier) — where one pass of clustering yields
    * O(cells) right-sized files. A pathologically hot cell lands in one
    * task/file; codes are ~12 B/row, so even a 10⁸-row cell is ~1 GB —
    * cap with `spark.sql.files.maxRecordsPerFile` or recompact if a
    * corpus ever gets there. */
  def writeIvfPq(lake: LakeClient, filesystem: String, path: String,
                 corpus: DataFrame, model: IvfPq.Model): Unit = {
    val s = corpus.sparkSession
    lake.writeParquet(centroidsDf(s, model.centroids),
      filesystem, s"$path/model/centroids")
    lake.writeParquet(codebooksDf(s, model.pq),
      filesystem, s"$path/model/codebooks")
    lake.writeParquet(IvfPq.encode(corpus, model).repartition(col("cell")),
      filesystem, s"$path/codes", partitionBy = Seq("cell"))
  }

  /** Load a persisted IVF-PQ index. `cell` comes back as the partition
    * column of the coded table, so [[IvfPq.topK]]'s probed-cell filter
    * prunes files (AnnIndexSpec asserts the PartitionFilters). */
  def readIvfPq(spark: SparkSession, lake: LakeClient, filesystem: String,
                path: String): (DataFrame, IvfPq.Model) =
    (lake.readParquet(spark, filesystem, s"$path/codes"),
      IvfPq.Model(readCentroids(spark, lake, filesystem, path),
        readCodebooks(spark, lake, filesystem, path)))

  /** Incremental append: encode ONLY `newRows` under the index's stored
    * model and append them to the coded table (new `cell` partitions
    * are created as needed; existing ones gain files — the small-file
    * buildup [[graft.lake.LakeClient.compactPartitionedParquet]]
    * maintains). Cost is linear in the APPENDED rows; the existing
    * corpus is never touched, because encoding is pure per-row given
    * the model. The model goes STALE as appends accumulate — the
    * centroids were fit before these rows existed — which costs recall,
    * not correctness (every row still lands in its nearest stale cell);
    * re-fit and rebuild when the measured drift warrants it. */
  def appendIvfPq(lake: LakeClient, filesystem: String, path: String,
                  newRows: DataFrame): Unit = {
    val spark = newRows.sparkSession
    val model = IvfPq.Model(readCentroids(spark, lake, filesystem, path),
      readCodebooks(spark, lake, filesystem, path))
    // same cell-clustering as writeIvfPq: an append adds O(touched
    // cells) files, not O(cells × shufflePartitions)
    lake.appendParquet(IvfPq.encode(newRows, model).repartition(col("cell")),
      filesystem, s"$path/codes", partitionBy = Seq("cell"))
  }

  /** Incremental append for a flat-PQ index — same contract as
    * [[appendIvfPq]] minus the cell partitioning. */
  def appendPq(lake: LakeClient, filesystem: String, path: String,
               newRows: DataFrame): Unit = {
    val spark = newRows.sparkSession
    val model = readCodebooks(spark, lake, filesystem, path)
    lake.appendParquet(ProductQuantizer.encode(newRows, model),
      filesystem, s"$path/codes")
  }

  /** [[driftCheck]]'s answer: mean recall@topK of the STALE persisted
    * index vs a fresh RE-FIT on the grown corpus, over the probed
    * queries. `refitRecall - staleRecall` is the recall a re-fit would
    * buy right now — the operator's re-fit criterion. */
  final case class DriftReport(staleRecall: Double, refitRecall: Double,
                               queries: Int) {
    /** The operator-facing decision: does re-fitting buy at least
      * `minGain` absolute recall on the probed queries? */
    def refitPays(minGain: Double): Boolean = refitRecall - staleRecall >= minGain
  }

  /** Measure how stale a persisted IVF-PQ index has drifted: appends
    * land encoded under the ORIGINAL centroids ([[appendIvfPq]]), which
    * costs recall — not correctness — as the corpus distribution moves.
    * This is the callable form of that re-fit signal: probe a BOUNDED
    * sample of `queries` (production: recent appends — exactly where
    * drift bites) against (a) the stale persisted index and (b) a fresh
    * fit+encode of `corpus` (in memory — nothing is persisted or
    * modified), each scored against exact brute-force ground truth.
    *
    * A MAINTENANCE operation, not a serving path: it runs the fresh fit
    * plus 3 BATCHED jobs for the whole sample (exact / stale / refit
    * top-k — the stale and refit answers come from [[IvfPq.topKBatch]]
    * with `excludeSelf`, the exact truth from one brute-force pass with
    * the same rounding + tie rules), so its job count is independent of
    * the sample size and it is priced for a daily cadence. Driver
    * state is `maxQueries` vectors + the two models — bounded by
    * construction ([[ScaleSmoke]] measures it at 2× drifted growth:
    * on the isotropic fixture the gap is small — stale .37 vs refit
    * .41 at 256c, Q=32 — because any well-spread cell geometry is
    * near-equivalent there; a clustered production corpus is where
    * staleness bites, and this probe is the instrument for it).
    * Deterministic end-to-end: hash-ordered query sample,
    * bit-deterministic fits, the round/tie conventions of
    * [[IvfPq.topK]]. `corpus` must be the full grown table the index
    * covers (codes store no raw vectors, and the re-fit needs them). */
  def driftCheck(lake: LakeClient, filesystem: String, path: String,
                 corpus: DataFrame, queries: DataFrame,
                 topK: Int = 10, rerank: Int = 100,
                 maxQueries: Int = 8): DriftReport = {
    val spark = corpus.sparkSession
    val (staleEnc, staleModel) = readIvfPq(spark, lake, filesystem, path)
    driftReport(corpus, queries, topK, rerank, maxQueries, "driftCheck") {
      (full, qdf) =>
        // stale + refit answers: one topKBatch pass each (excludeSelf is
        // the batched form of the per-query `vec_id =!= qid` filters);
        // the auto-tier overload reads nProbe from each model's own cell
        // count — identical for stale and refit since the re-fit keeps
        // the cell geometry
        val freshModel = IvfPq.fit(full, cells = staleModel.centroids.size)
        val freshEnc = IvfPq.encode(full, freshModel).persist(Disk)
        try {
          def got(enc: DataFrame, m: IvfPq.Model): Map[Long, Set[Long]] =
            byQid(IvfPq.topKBatch(full, enc, m, qdf,
              topK = topK, rerank = rerank, excludeSelf = true))
          (got(staleEnc, staleModel), got(freshEnc, freshModel))
        } finally { freshEnc.unpersist(false); () }
    }
  }

  /** [[driftCheck]] for a FLAT-PQ index — the codebook-staleness face of
    * the same re-fit signal. A flat-PQ index has no cell geometry to go
    * stale; what drifts is the shared per-subspace CODEBOOK: appends
    * land encoded under codewords fit before those rows existed
    * ([[appendPq]]), so when the corpus distribution moves, appended
    * rows quantize with growing residuals in directions the stale
    * codebooks never allocated codewords to — ADC shortlists degrade for
    * queries from the drifted slice (recall, not correctness: the exact
    * re-rank still scores true cosines, but the true neighbors stop
    * making the shortlist). Same contract and batched 3-job shape as the
    * IVF-PQ form: exact truth in one brute-force pass, stale and refit
    * answers via [[ProductQuantizer.pqTopKBatch]] with `excludeSelf`,
    * the re-fit keeping the stale model's (m, k) geometry so the report
    * isolates codebook staleness from a capacity change. Deterministic
    * end-to-end; job count independent of the sample size.
    *
    * MEASURED PHYSICS (ScaleSmoke validates both directions): what goes
    * stale for a flat-PQ codebook is NOT what goes stale for IVF cell
    * geometry. Cluster-move drift — the shape that opens a +.26 gap for
    * [[driftCheck]] — never pays a flat-PQ refit (swept gains
    * -0.17..+0.06 across k ∈ {32,64,256} and rerank ∈ {10,32,100}):
    * asymmetric ADC never quantizes the query and the exact re-rank
    * rescues loosely-ranked shortlists. What DOES kill a stale codebook
    * is DYNAMIC-RANGE drift — appends far outside the codewords' span
    * (a new embedding model, an unnormalized feature source) collapse
    * ADC code diversity and true neighbors stop making the shortlist:
    * measured stale .000 vs refit .500 recall@10 at the fit defaults,
    * where `refitPays` fires; the orthogonal-drift control stays
    * silent (+.05). */
  def driftCheckPq(lake: LakeClient, filesystem: String, path: String,
                   corpus: DataFrame, queries: DataFrame,
                   topK: Int = 10, rerank: Int = 100,
                   maxQueries: Int = 8): DriftReport = {
    val spark = corpus.sparkSession
    val (staleEnc, staleModel) = readPq(spark, lake, filesystem, path)
    driftReport(corpus, queries, topK, rerank, maxQueries, "driftCheckPq") {
      (full, qdf) =>
        val freshModel = ProductQuantizer.fit(full,
          m = staleModel.m, k = staleModel.k)
        val freshEnc = ProductQuantizer.encode(full, freshModel).persist(Disk)
        try {
          def got(enc: DataFrame, m: ProductQuantizer.Model): Map[Long, Set[Long]] =
            byQid(ProductQuantizer.pqTopKBatch(full, enc, m, qdf,
              topK = topK, rerank = rerank, excludeSelf = true))
          (got(staleEnc, staleModel), got(freshEnc, freshModel))
        } finally { freshEnc.unpersist(false); () }
    }
  }

  private val Disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private def byQid(df: DataFrame): Map[Long, Set[Long]] = df
    .select(col("qid"), col("vec_id")).collect()
    .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  /** The shared drift-probe skeleton both index kinds report through:
    * bounded hash-ordered query sample, ONE brute-force exact pass for
    * the whole sample (same 3-decimal rounding and (cos desc, lower id)
    * tie rule as the per-query orderBy/limit form, so the top-k SETS
    * are identical), then `answers(full, qdf)` → (staleByQ, refitByQ)
    * supplies the two index-specific batched passes, and the recalls
    * are scored against the shared truth. */
  private def driftReport(corpus: DataFrame, queries: DataFrame,
                          topK: Int, rerank: Int, maxQueries: Int,
                          what: String)
      (answers: (DataFrame, DataFrame) =>
        (Map[Long, Set[Long]], Map[Long, Set[Long]])): DriftReport = {
    require(topK >= 1, s"$what: topK must be >= 1 (got $topK)")
    require(rerank >= topK, s"$what: rerank ($rerank) must be >= topK ($topK)")
    require(maxQueries >= 1 && maxQueries <= 64,
      s"$what: maxQueries must be in [1, 64] (got $maxQueries) — " +
        "the bounded-sample contract; probe more queries in batches")
    val spark = corpus.sparkSession
    val qs: Array[(Long, Array[Float])] = queries
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(maxQueries)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qs.nonEmpty, s"$what: queries has no rows")
    val full = corpus.select(col("vec_id"), col("embedding")).persist(Disk)
    try {
      val qdf = spark.createDataFrame(qs.toSeq.map { case (id, v) => (id, v.toSeq) })
        .toDF("qid", "qemb")
      val exactByQ = byQid(full.crossJoin(broadcast(qdf))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          graft.functions.VectorFunctions.round3(graft.functions.VectorFunctions
            .vecCosine(col("embedding"), col("qemb"))).as("cos"))
        .groupBy(col("qid"))
        .agg(graft.functions.VectorFunctions
          .topkByScore(col("cos"), col("vec_id"), topK).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.id").as("vec_id")))
      val (staleByQ, refitByQ) = answers(full, qdf)
      var staleHits = 0L; var refitHits = 0L; var truth = 0L
      qs.foreach { case (qid, _) =>
        val exact = exactByQ.getOrElse(qid, Set.empty)
        staleHits += (staleByQ.getOrElse(qid, Set.empty) & exact).size
        refitHits += (refitByQ.getOrElse(qid, Set.empty) & exact).size
        truth += exact.size
      }
      val t = math.max(truth, 1L).toDouble
      DriftReport(staleHits / t, refitHits / t, qs.length)
    } finally { full.unpersist(false); () }
  }
}
