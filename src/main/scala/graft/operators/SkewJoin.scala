package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins (the 100 TB toolbox next to AQE's
  * automatic skew-join splitting, for engines/paths where AQE can't help
  * — e.g. skewed aggregations feeding a join, or deterministic plans).
  *
  * `saltedJoin(left, right, key, salt)`: the skewed (large) side gets a
  * content-derived salt; the small side is exploded `salt`× so every
  * (key, salt) bucket finds its partner. One shuffle on (key, salt) with
  * up to `salt`× better balance; results are identical to the unsalted
  * join.
  */
object SkewJoin {

  /** Equi-join `left ⋈ right` on `key`, salting the left (skewed) side.
    * The salt is RETRY-DETERMINISTIC: xxhash64 of the left row's
    * hashable columns mod `salt` (map-typed columns, which xxhash64
    * rejects, are excluded). A positional salt (round-robin over
    * monotonically_increasing_id, briefly shipped here) can change when
    * a lost-executor retry recomputes a map task in a different row
    * order — the SPARK-23207 class of bug: reducers that already
    * fetched the old output see a row under one salt and the re-fetched
    * output under another, silently duplicating or dropping joined
    * rows. Content hashing is immune (same row → same salt on any
    * recompute). The cost, stated honestly: BIT-IDENTICAL duplicate
    * rows of a hot key share a salt and are not spread — no
    * deterministic function of row content can separate identical rows.
    * Pre-aggregate duplicates first, or lean on AQE skew-join
    * splitting, for that shape. `right` rows are replicated `salt`
    * times — keep `right` the smaller side.
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
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    // the equi-join key is always hashable (maps can't be join keys), so
    // the hash input is never empty
    val hashable = left.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
    val l = left.withColumn("_salt",
      pmod(xxhash64(hashable.toIndexedSeq: _*), lit(salt)).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
