package fsstspark.tools

import fsstspark.textops.AnnSearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Tuning probe for the ANN recall oracles: prints per-query hit counts
  * (vs brute-force top-10) for LSH/IVF parameter combos across sf dirs,
  * so the recall_ok thresholds in Queries can be set with real margin.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 5)
      val bf = AnnSearch.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
        .select(col("query_id").cast("long").as("query_id"), col("id").cast("long").as("id"))
      def hits(res: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        res.select(col("query_id").cast("long").as("query_id"), col("id").cast("long").as("id"))
          .join(bf, Seq("query_id", "id"))
          .groupBy("query_id").agg(count(lit(1)).as("h"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      for ((nBits, nTables) <- Seq((6, 16), (6, 24), (6, 32))) {
        val r = hits(AnnSearch.lshTopK(emb, q, "vec_id", "embedding", k = 10,
          nBits = nBits, nTables = nTables))
        println(s"$sf lsh bits=$nBits tables=$nTables hits=$r")
      }
      for ((nc, np) <- Seq((32, 16), (32, 20), (32, 24), (16, 10))) {
        val r = hits(AnnSearch.ivfTopK(emb, q, "vec_id", "embedding", k = 10,
          nCentroids = nc, nProbe = np))
        println(s"$sf ivf cent=$nc probe=$np hits=$r")
      }
    }
    spark.stop()
  }
}
