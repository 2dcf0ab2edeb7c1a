package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins (the 100 TB toolbox next to AQE's
  * automatic skew-join splitting, for engines/paths where AQE can't help
  * — e.g. skewed aggregations feeding a join, or deterministic plans).
  *
  * `saltedJoin(left, right, key, salt)`: every left row gets a
  * round-robin salt; the small side is exploded `salt`× so every
  * (key, salt) bucket finds its partner. One shuffle on (key, salt) with
  * `salt`× better balance; results are identical to the unsalted join.
  */
object SkewJoin {

  /** Equi-join `left ⋈ right` on `key`, salting the left (skewed) side.
    * The salt is a round-robin over each partition's row sequence
    * (monotonically_increasing_id mod salt) — NOT a hash of the row
    * content: content hashing sent every identical row of a hot key
    * (sentinel values, narrow projections) to ONE bucket, quietly
    * reducing the promised `salt`× balance to 1× while still paying the
    * right-side replication, and it rejected MapType columns outright
    * (xxhash64 can't hash maps). Round-robin spreads duplicates
    * uniformly, touches no data column, and is deterministic for a
    * given partition layout (the salt only routes rows — the join
    * RESULT is layout-independent either way). `right` rows are
    * replicated `salt` times — keep `right` the smaller side.
    *
    * Only LEFT-preserving join types are accepted: the right side is
    * replicated `salt`×, so a right-preserving type (right/full outer)
    * would emit each unmatched right row `salt` times — not the unsalted
    * result. For those, salt the other side or use AQE skew handling. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val normalized = joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
      .contains(normalized),
      s"saltedJoin replicates the right side $salt×, so only left-preserving " +
        s"join types keep results identical to the unsalted join; got '$joinType'")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedJoin: an input already has a _salt column — rename it first " +
        "(withColumn would silently overwrite it and drop() would delete it)")
    val l = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
