package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** ss5 (kNN join, fitted IVF route) phase attribution at smoke scale
  * (round 13 — VERDICT r12 #3): the routed ss5 stage is the largest
  * single operator wall left at 100× (938.6 s recorded), and unlike dd3
  * and dd4 it never had a phase table. Splits the operator the way
  * [[graft.operators.DdPerfProbe]] does — fit / assign+cap / chunk
  * build / probe join / in-row scoring / merge aggregate (the round-14
  * CellTopK kernel shape; the retired per-candidate-row phases and
  * their measured 100× numbers are kept in NOTES round-13) — plus the
  * smoke recall stage's own verification legs (brute-force truth for a
  * 1/80 query sample and the hit semi-join), so the wall divides into
  * operator cost vs verification cost.
  *
  * Phases are measured as INDEPENDENT jobs (the DdPerfProbe convention):
  * within the real united plan the assignment subtree is computed once
  * per join side, so phase sums can exceed the whole-operator wall —
  * the table attributes, it does not decompose exactly.
  *
  * Usage: runMain graft.Ss5PerfProbe [sfDir] [replicas] [fallbackThreshold] [kernelOnly]
  * (default 100×; wants SPARK_DRIVER_MEM=96g like the 100× smoke).
  * `fallbackThreshold` overrides `spark.sql.objectHashAggregate.
  * sortBased.fallbackThreshold` (default 128) for an A/B of the top-k
  * partial aggregation's sort fallback — NOT a production setting (the
  * DdPerfProbe seam): raising it engine-wide is unsafe for
  * unbounded-buffer aggregates, whose hash mode holds every group's
  * buffer in memory simultaneously and never spills. `kernelOnly`
  * (any value) skips the whole-operator and verification legs so an
  * A/B costs only the phase passes.
  */
object Ss5PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(100)
    val fallback = args.lift(2).map(_.toInt)
    val kernelOnly = args.length > 3
    val spark = ProbeHarness.session("ss5-perf-probe")
    fallback.foreach(t => spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t.toString))
    println(s"objectAgg fallbackThreshold=${fallback.getOrElse(128)} kernelOnly=$kernelOnly")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    import graft.operators.{KMeans, Similarity}

    val embs = ProbeHarness.replicaEmbeddings(spark, sfDir, replicas)
    val n = embs.count()
    println(s"ss5 probe: $n vectors (x$replicas)  " + Calibration.stamp())

    // the whole operator first — the reference wall the phases attribute
    if (!kernelOnly) ProbeHarness.timed("ss5 knnJoinFitted (whole)") {
      Similarity.knnJoinFitted(embs).count()
    }

    // phases, mirroring knnJoinFitted's fitted route exactly
    val cells = Similarity.ivfCellsFor(embs)
    val nProbe = Similarity.knnNProbeFor(cells)
    println(s"route: $cells cells, nProbe=$nProbe")
    var model: KMeans.Model = null
    ProbeHarness.timed(s"phase fit (KMeans $cells c)") {
      model = KMeans.fit(embs.select(col("vec_id"), col("embedding")),
        k = cells, maxIters = 5)
      model.centroids.size.toLong
    }
    val cs = model.centroids
    val cn = cs.map(c => math.sqrt(c.map(x => x.toDouble * x).sum))
    val maxPop = Similarity.ivfMaxCellPop(embs, cs.size, nProbe)
    val assigned = Similarity.capCells(
      KMeans.assignTopCellsWith(embs, cs, nProbe, cn), maxPop)
      .persist(StorageLevel.MEMORY_AND_DISK)
    ProbeHarness.timed("phase assign+cap (persisted)") {
      assigned.count()
    }
    val probe = assigned.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(col("cells")).as("cell"))
    // round 14: phases mirror the in-row CellTopK kernel — chunk build /
    // probe join / in-row scoring / merge agg (the retired per-candidate
    // shape's join+cosine 117.2 s + agg ≈302 s (128) / ≈17 s (2M) at
    // 100× near-quiet are the recorded baselines, NOTES round-13)
    val idx = assigned.select(col("vec_id").as("nbr_id"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"),
      try_element_at(col("cells"), lit(1)).as("cell"))
    val pops = idx.groupBy(col("cell")).agg(count(lit(1)).as("pop"))
    val cellChunks = idx.join(broadcast(pops), Seq("cell"))
      .withColumn("chunk",
        pmod(xxhash64(col("nbr_id")),
          ceil(col("pop").cast("double") / lit(Similarity.IvfChunkRows.toDouble))
            .cast("bigint")).cast("int"))
      .groupBy(col("cell"), col("chunk"))
      .agg(collect_list(struct(col("nbr_id").as("id"),
        col("emb_b").as("emb"), col("nrm_b").as("nrm"))).as("members"))
    ProbeHarness.timed("phase chunk-build (index arrays)") {
      cellChunks.count()
    }
    // mirror the shipped kernel's size-gated index broadcast
    val index = if (Similarity.ivfIndexBroadcastable(embs)) broadcast(cellChunks) else cellChunks
    val joined = probe.join(index, Seq("cell"))
    ProbeHarness.timed("phase probe-join (no score)") {
      joined.count()
    }
    val scored = joined.select(col("vec_id"),
      explode(graft.functions.VectorFunctions.cellTopK(col("embedding"),
        col("nrm"), col("members"), col("vec_id"), 5)).as("t"))
    ProbeHarness.timed("phase in-row cell topk") {
      scored.count()
    }
    ProbeHarness.timed("phase +merge agg (kernel total)") {
      scored.groupBy(col("vec_id"))
        .agg(graft.functions.VectorFunctions
          .topkByScore(col("t.score"), col("t.id"), 5).as("top"))
        .select(col("vec_id"), posexplode(col("top")).as(Seq("rk0", "t")))
        .count()
    }
    assigned.unpersist()
    if (kernelOnly) {
      println("done (kernelOnly)  " + Calibration.stamp())
      spark.stop(); return
    }

    // the smoke recall stage's verification legs (its wall = operator +
    // these): exact brute-force top-5 truth for the 1/80 query sample,
    // then the hit semi-join against the routed output
    val routed = Similarity.knnJoinFitted(embs).persist(StorageLevel.MEMORY_AND_DISK)
    ProbeHarness.timed("verify: routed run (persisted)") {
      routed.count()
    }
    val qs = embs.where(col("vec_id") % 80 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val exact = embs.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), round(
        graft.functions.VectorFunctions.vecCosine(col("embedding"), col("qemb")),
        3).as("cos"))
      .groupBy(col("qid"))
      .agg(graft.functions.VectorFunctions
        .topkByScore(col("cos"), col("vec_id"), 5).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("nbr_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ProbeHarness.timed("verify: exact truth (1/80 q)") {
      exact.count()
    }
    ProbeHarness.timed("verify: hit semi-join") {
      routed.select(col("vec_id").as("qid"), col("nbr_id"))
        .join(exact, Seq("qid", "nbr_id"), "left_semi").count()
    }
    routed.unpersist(); exact.unpersist()
    println("done  " + Calibration.stamp())
    spark.stop()
  }
}
