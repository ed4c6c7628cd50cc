package fsstspark.io

import fsstspark.pipeline.ChunkResult
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** "Iceberg-shaped" chunk-table catalog (SURVEY.md §7.0).
  *
  * No Iceberg runtime ships in this sandbox, so the catalog is modeled
  * honestly as: data = parquet partitioned by column name; manifest = an
  * explicit small parquet table with one row per (file, column, chunk)
  * carrying Iceberg's file/column-chunk granularity metadata (row count,
  * byte counts, key range). The pipeline programs against this trait; a
  * real Iceberg catalog drops in by implementing it.
  */
trait TableIO {
  def writeChunks(results: Dataset[ChunkResult], table: String): Unit
  def readChunks(spark: SparkSession, table: String): Dataset[ChunkResult]

  /** One row per (data file, column, chunk): lineage + pruning stats. */
  def manifest(spark: SparkSession, table: String): DataFrame

  /** Chunks whose key range may contain `key` — manifest-level pruning
    * (the read path of an Iceberg metadata filter).
    */
  def chunksForKey(spark: SparkSession, table: String, key: String): Dataset[ChunkResult]
}

final class ParquetTableIO(root: String) extends TableIO {
  private def dataDir(table: String) = s"$root/$table/data"
  private def manifestDir(table: String) = s"$root/$table/manifest"

  override def writeChunks(results: Dataset[ChunkResult], table: String): Unit = {
    results.write.partitionBy("column").mode(SaveMode.Append).parquet(dataDir(table))
    // rebuild the manifest from data-file metadata columns (column-pruned
    // scan; blobs are never read)
    val spark = results.sparkSession
    spark.read.parquet(dataDir(table))
      .select(input_file_name().as("file"), col("column"), col("chunk_id"),
        col("codec"), col("n_rows"), col("bytes_in"), col("bytes_out"),
        col("min_key"), col("max_key"))
      .write.mode(SaveMode.Overwrite).parquet(manifestDir(table))
  }

  override def readChunks(spark: SparkSession, table: String): Dataset[ChunkResult] = {
    import spark.implicits._
    spark.read.parquet(dataDir(table)).as[ChunkResult]
  }

  override def manifest(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(manifestDir(table))

  override def chunksForKey(spark: SparkSession, table: String, key: String): Dataset[ChunkResult] = {
    import spark.implicits._
    val hit = manifest(spark, table)
      .filter(col("min_key") <= key && col("max_key") >= key)
      .select("chunk_id").distinct()
    readChunks(spark, table)
      .join(broadcast(hit), Seq("chunk_id"), "left_semi")
      .as[ChunkResult]
  }
}
