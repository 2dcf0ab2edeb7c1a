package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** The user-facing corpus-cleaning pipeline — the composition a
  * training-data job actually runs, built from the engine's operators in
  * the canonical order (cheap exact passes first so the expensive
  * near-dup join sees the smallest possible corpus):
  *
  *   1. exact dedupe on content hash (dd2 rule: first doc_id wins);
  *   2. near-dup clustering over the surviving docs (dd4 pair graph →
  *      dd6 connected components), keeping each cluster's representative;
  *   3. quality floor (ta2's composite score);
  *   4. optional language allow-list (ta3's detector).
  *
  * Each stage is one of the verified operators, so the pipeline inherits
  * their scale shapes (hash-key shuffles, df-capped inverted index,
  * bucket joins); nothing here adds a new shuffle. Returns the cleaned
  * corpus plus a per-stage row-count audit — the numbers a data lead
  * asks for first. */
object CorpusPipeline {

  final case class Stats(input: Long, afterExact: Long, afterNearDup: Long,
                         afterQuality: Long, afterLang: Long)

  private val Disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Returns the cleaned corpus (persisted and already materialized — the
    * caller unpersists when done) plus per-stage counts. Input needs only
    * (`doc_id`, `text`); the language gate uses the DETECTED language, so
    * no claimed-`lang` column is required. */
  def clean(docs: DataFrame,
            minQuality: Double = 0.5,
            langs: Option[Set[String]] = None): (DataFrame, Stats) = {
    val input = docs.count()

    // 1. exact: first doc_id per sha256 survives (dd2's keep rule)
    val exact = Dedup.dd2From(docs)
      .where(col("keep")).drop("content_hash", "keep")
      .persist(Disk)
    val nExact = exact.count()

    // 2. near-dup: cluster the survivors, keep representatives
    val clusters = Dedup.dd6ClusterFrom(
      exact.select(col("doc_id")),
      Dedup.dd4From(exact).select(col("doc_a"), col("doc_b")))
    val reps = exact.join(
      clusters.where(col("keep")).select(col("doc_id")), Seq("doc_id"), "left_semi")
      .persist(Disk)
    val nNearDup = reps.count()

    // 3. quality floor — ta2's composite score, same rounding, so a
    // threshold means the same thing in analysis and filtering
    val qualified = reps.where(TextAnalysis.qualityScore(col("text")) >= minQuality)
    val nQuality = qualified.count()

    // 4. optional language allow-list via the ta3 detector (no claimed
    // lang needed)
    val cleaned = (langs match {
      case None => qualified
      case Some(allowed) =>
        val detected = TextAnalysis.detectLang(qualified)
          .where(col("detected_lang").isin(allowed.toSeq: _*))
          .select(col("doc_id"))
        qualified.join(detected, Seq("doc_id"), "left_semi")
    }).persist(Disk)
    val nLang = cleaned.count() // materializes `cleaned` before the
    exact.unpersist(false)      // upstream cached stages are dropped
    reps.unpersist(false)

    (cleaned, Stats(input, nExact, nNearDup, nQuality, nLang))
  }

  /** Deterministic split assignment by a content-independent hash of the
    * stable id: the first 4 hex chars of md5(id) partition the 16-bit
    * hex space by STRING ranges — "e666" ≈ 90%, "f333" ≈ +5%, rest test.
    * Pure per-row codegen: no shuffle, no RNG state, no sampling seed to
    * version. The SAME document lands in the SAME split on any engine,
    * at any parallelism, forever — the reproducibility property held-out
    * splits need and `df.sample()`/`randomSplit()` (partition-layout-
    * dependent) cannot give. Lexicographic hex comparison is
    * engine-independent, so DuckDB mirrors it exactly. */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
                trainUpper: String = "e666", valUpper: String = "f333"): DataFrame = {
    require(trainUpper < valUpper, "train boundary must precede val boundary")
    val hx = substring(md5(col(idCol).cast("string")), 1, 4)
    df.withColumn("split",
      when(hx < trainUpper, "train").when(hx < valUpper, "val").otherwise("test"))
  }

  /** cp1_hash_split — the split assignment as a checkable query:
    * (doc_id, split) for every document, 90/5/5. */
  def cp1HashSplit(s: SparkSession, dir: String): DataFrame =
    hashSplit(Tables.documents(s, dir))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cp1_hash_split" -> (cp1HashSplit _),
  )

  val oracle: Map[String, String] = Map(
    "cp1_hash_split" ->
      """SELECT doc_id,
            CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
                 ELSE 'test' END AS split
       FROM documents ORDER BY doc_id""",
  )
}
