package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The session factory wires everything a user needs: UTC, extensions
  * (vec_dot/simhash_agg reachable from SQL), ns-timestamp reads, and the
  * SQL catalog over the fixture tables. */
class GraftSessionSpec extends AnyFunSuite {

  test("create + registerTables gives a full SQL surface") {
    val spark = GraftSession.builder("graft-test", "local[2]", 2).getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      GraftSession.registerTables(spark, "/root/testdata/sf0.001")
      assert(spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0) == 6000L)
      // events view reads the fixture's native NTZ-µs timestamp type
      // (post-regen parquet is timestamp[us]/isAdjustedToUTC=false; the
      // ns→µs normalization branch is covered by TablesSpec directly)
      assert(spark.table("events").schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      // extension functions reachable from SQL
      val d = spark.sql(
        "SELECT vec_dot(embedding, embedding) AS n2 FROM embeddings WHERE vec_id = 0")
        .collect()(0).getDouble(0)
      assert(d > 0)
      val sh = spark.sql(
        "SELECT simhash_agg(xxhash64(tok)) FROM (SELECT explode(split(text, ' ')) AS tok " +
          "FROM documents WHERE doc_id = 0)").collect()(0).getLong(0)
      assert(sh != 0L)
      assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
      // the SQL catalog path must see the SAME rebalanced frames as the
      // typed accessors: a 1-file fixture scan through the views
      // previously ran the LLM-ops kernels in a single task
      val slots = spark.sparkContext.defaultParallelism
      assert(spark.table("documents").rdd.getNumPartitions >= slots,
        "documents view must carry the balanced() rebalance")
      assert(spark.table("embeddings").rdd.getNumPartitions >= slots,
        "embeddings view must carry the balanced() rebalance")
    } finally spark.stop()
  }
}
