package fsstspark.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FsstFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("fsstspark-functions-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = {
    FsstFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(encode(col("text"), "UTF-8").as("v")).cache()
  }

  test("fsst_train → fsst_encode → fsst_decode round-trips in pure SQL") {
    val tbl = docs.agg(FsstFunctions.fsst_train(col("v"))).head().getAs[Array[Byte]](0)
    assert(tbl.length > 16 && tbl.length < 8 * 1024) // reference: 2-8 KB band
    val rt = docs.select(col("v"),
      FsstFunctions.fsst_decode(FsstFunctions.fsst_encode(col("v"), lit(tbl)), lit(tbl)).as("rt"))
    assert(rt.filter(col("v") =!= col("rt")).count() == 0)
    // the expression pipeline stays inside whole-stage codegen ("*(n)"
    // stage markers in the executed plan; a codegen fallback would drop them)
    assert(rt.queryExecution.executedPlan.toString.contains("*(1)"))
    val sizes = docs.select(
      sum(octet_length(FsstFunctions.fsst_encode(col("v"), lit(tbl)))).as("enc"),
      sum(octet_length(col("v"))).as("raw")).head()
    assert(sizes.getLong(0) < (sizes.getLong(1) * 0.8).toLong,
      s"global-table encode didn't compress: ${sizes.getLong(0)} vs ${sizes.getLong(1)}")
  }

  test("fsst_train is deterministic and partitioning-independent") {
    val t1 = docs.agg(FsstFunctions.fsst_train(col("v"))).head().getAs[Array[Byte]](0)
    val t2 = docs.repartition(13).agg(FsstFunctions.fsst_train(col("v"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(t1, t2),
      "bottom-k sample must make training order/partitioning independent")
  }

  test("fsst_decode_string decodes straight to string, codegen-clean") {
    val tbl = docs.agg(FsstFunctions.fsst_train(col("v"))).head().getAs[Array[Byte]](0)
    val rt = docs.select(decode(col("v"), "UTF-8").as("s"),
      FsstFunctions.fsst_decode_string(
        FsstFunctions.fsst_encode(col("v"), lit(tbl)), lit(tbl)).as("rt"))
    assert(rt.filter(col("s") =!= col("rt")).count() == 0)
    assert(rt.schema("rt").dataType == org.apache.spark.sql.types.StringType)
    assert(rt.queryExecution.executedPlan.toString.contains("*(1)"))
  }

  test("fsst functions usable from SQL text") {
    docs.createOrReplaceTempView("fsst_docs")
    val row = spark.sql(
      """WITH t AS (SELECT fsst_train(v) AS tbl FROM fsst_docs)
        |SELECT count(*) AS n,
        |       sum(CASE WHEN fsst_decode(fsst_encode(v, tbl), tbl) = v THEN 0 ELSE 1 END) AS bad
        |FROM fsst_docs CROSS JOIN t""".stripMargin).head()
    assert(row.getLong(0) > 0 && row.getLong(1) == 0)
  }
}
