package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Fixture-schema canary (FIXTURES.md): if the driver regenerates data
  * with different shapes, every downstream query breaks — fail here
  * first, with a readable diff. */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark0: SparkSession = _
  private lazy val spark: SparkSession = spark0
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark0 = SparkSession.builder()
      .master("local[2]")
      .appName("tables-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark0.stop()

  private def fields(name: String): Map[String, DataType] =
    Tables.table(spark, dir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("star-schema tables have the documented shapes") {
    assert(fields("region") == Map("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields("nation")("n_nationkey") == IntegerType)
    assert(fields("customer")("c_custkey") == LongType)
    assert(fields("customer")("c_acctbal") == DoubleType)
    // parquet timestamp[ms] without UTC adjustment reads as NTZ in
    // Spark 4 (inferTimestampNTZ) — matches DuckDB's naive TIMESTAMP
    assert(fields("orders")("o_orderdate") == TimestampNTZType)
    assert(fields("lineitem")("l_shipdate") == TimestampNTZType)
    assert(fields("lineitem")("l_quantity") == DoubleType)
  }

  test("events.ts normalizes to TimestampType despite ns-precision parquet") {
    val f = fields("events")
    assert(f("ts") == TimestampType) // would be LongType without the fix
    assert(f("props") == StringType)
  }

  test("embeddings and documents carry the LLM-op columns") {
    assert(fields("embeddings")("embedding") == ArrayType(FloatType, containsNull = true))
    assert(fields("documents")("text") == StringType)
    assert(Tables.table(spark, dir, "embeddings").head().getAs[scala.collection.Seq[Float]]("embedding").size == 64)
  }
}
