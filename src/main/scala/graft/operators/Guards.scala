package graft.operators

import org.apache.spark.sql.DataFrame

/** Fail-fast input guards for operators whose OUTPUT is inherently
  * super-linear (e.g. an unbounded-inequality theta join is Θ(N²) rows no
  * matter the plan). Decisions come from the optimizer's byte statistics
  * (file sizes for a parquet scan) so a guard never launches a job.
  * Used by `Relational.q13ThetaJoin` and `Similarity.ss6KnnExact`. */
object Guards {

  /** Require `df`'s estimated size to be at most `maxBytes`; otherwise
    * throw with `what` and the scalable alternative named. At 100 TB the
    * guard is what turns "cluster-melting cross product" into an
    * immediate, explainable error. */
  def requireEstimatedBytesAtMost(df: DataFrame, maxBytes: Long, what: String): Unit = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    require(est <= maxBytes,
      s"$what: estimated input size $est bytes exceeds the $maxBytes-byte cap " +
        "for a quadratic-output operator — band/bucket the join (see " +
        "q28_range_join) or pre-aggregate before pairing")
  }

  /** Ceiling for an EXPLICIT broadcast hint on a dimension that scales
    * with the data (part, supplier): far under Spark's 8 GB broadcast
    * hard limit and executor-memory-sane, far above the 10 MB auto
    * threshold the hint exists to override. */
  val MaxHintedBroadcastBytes: Long = 256L << 20

  /** Broadcast hint guarded by optimizer byte statistics: attaches the
    * hint only while the build side's estimate fits `maxBytes`; above
    * it the frame passes through un-hinted and the planner (with AQE's
    * runtime sizes) picks the strategy. A bare `broadcast()` on an
    * SF-scaled dimension is a plan that stops existing at scale —
    * Spark hard-fails broadcasts over 8 GB and the driver pays the
    * build either way — so the zero-shuffle plan is kept exactly as
    * long as it is legal. Statistics only; never launches a job. */
  def broadcastIfEstimatedUnder(df: DataFrame,
      maxBytes: Long = MaxHintedBroadcastBytes): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes)
      org.apache.spark.sql.functions.broadcast(df)
    else df
}
