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
}
