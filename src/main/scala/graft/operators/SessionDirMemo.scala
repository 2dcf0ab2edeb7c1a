package graft.operators

import org.apache.spark.sql.SparkSession

/** One (session, scale dir) memo — the sweep/get/build/putIfAbsent
  * discipline shared by Similarity's five model/index caches and Dedup's
  * pair-graph/shingle caches (each was a hand-rolled copy through round
  * 15/16; collapsed per the r15 review and the r16 review's CHM-contract
  * finding). The contract, once:
  *
  *   - entries of stopped sessions are swept on every access (the map
  *     must never pin a dead SparkContext or its block metadata);
  *   - the build runs OUTSIDE the ConcurrentHashMap bin lock. Holding a
  *     bin lock for seconds of Spark jobs would serialize unrelated
  *     sessions — and, worse, a build that re-enters another memo (the
  *     dd6 pair graph builds THROUGH the shingle memo, whose access
  *     sweep mutates this map) would modify a CHM from inside its own
  *     computeIfAbsent mapping function, which the CHM spec forbids;
  *   - a rare concurrent duplicate build is resolved by putIfAbsent
  *     (first write wins, the loser's value goes to `discardDup` — e.g.
  *     unpersist — and the loser adopts the winner's). Safe because
  *     every cached build here is bit-deterministic;
  *   - builds that WRITE files (the persisted indexes) additionally
  *     serialize on their own per-target build lock INSIDE the build and
  *     re-check [[cached]] under it, so one directory is never written
  *     twice;
  *   - staleness: `dir` is assumed immutable for the session's life;
  *     callers that rewrite data expose an invalidate that [[remove]]s
  *     the entry.
  */
private[operators] final class SessionDirMemo[T] {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), T]()

  def cached(s: SparkSession, dir: String): Option[T] = {
    entries.keySet().removeIf { case (sess, _) => sess.sparkContext.isStopped }
    Option(entries.get((s, dir)))
  }

  def getOrBuild(s: SparkSession, dir: String)(build: => T): T =
    getOrBuildWith(s, dir)(build)(_ => ())

  /** [[getOrBuild]] with a loser hook: when two threads race the same
    * key, the putIfAbsent loser's freshly-built value is handed to
    * `discardDup` before the winner's value is adopted. CAUTION for
    * persisted DataFrames: Spark's CacheManager keys on the
    * CANONICALIZED PLAN, so a loser's `unpersist` would evict the
    * winner's shared cache entry — same-plan builds must pass a no-op
    * (use [[getOrBuild]]); the hook is for values owning genuinely
    * distinct resources (files, handles). */
  def getOrBuildWith(s: SparkSession, dir: String)(build: => T)(
      discardDup: T => Unit): T =
    cached(s, dir).getOrElse {
      val v = build
      Option(entries.putIfAbsent((s, dir), v)) match {
        case Some(winner) => discardDup(v); winner
        case None => v
      }
    }

  /** Remove one entry, returning it — the caller owns any cleanup
    * (e.g. unpersist) so the memo stays storage-agnostic. */
  def remove(s: SparkSession, dir: String): Option[T] =
    Option(entries.remove((s, dir)))

  /** Drop every entry of `s` (the session-shutdown listener path; the
    * access-time sweep never runs again after teardown). */
  def evictSession(s: SparkSession): Unit = {
    entries.keySet().removeIf { case (sess, _) => sess eq s }
    ()
  }

  /** Visit live entries (cleanup in clear-all paths). */
  def foreachEntry(f: (SparkSession, String, T) => Unit): Unit =
    entries.forEach { (k, v) => f(k._1, k._2, v) }

  def clear(): Unit = entries.clear()
}
