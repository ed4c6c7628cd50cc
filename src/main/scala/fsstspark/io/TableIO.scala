package fsstspark.io

import fsstspark.pipeline.ChunkResult
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** "Iceberg-shaped" chunk-table catalog (SURVEY.md §7.0).
  *
  * No Iceberg runtime ships in this sandbox, so the catalog is modeled
  * honestly as: data = parquet partitioned by (ingest batch, column name);
  * manifest = an explicit small parquet table with one row per
  * (file, column, chunk) carrying Iceberg's file/column-chunk granularity
  * metadata (row count, byte counts, key range). The pipeline programs
  * against this trait; a real Iceberg catalog drops in by implementing it.
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

  /** Append a batch of chunks. Each batch lands under its own `batch=`
    * partition directory, so the new manifest rows are derived by scanning
    * ONLY this batch's files (metadata columns, blobs never read) and
    * APPENDED — manifest maintenance is O(batch), never O(table). The r2
    * shape re-scanned the whole data directory per append, which at ~6M
    * chunks would be a full metadata rescan on every streaming micro-batch.
    */
  override def writeChunks(results: Dataset[ChunkResult], table: String): Unit = {
    val spark = results.sparkSession
    val batch = f"b${System.currentTimeMillis()}%013d-${java.util.UUID.randomUUID().toString.take(8)}"
    results.withColumn("batch", lit(batch))
      .write.partitionBy("batch", "column").mode(SaveMode.Append).parquet(dataDir(table))
    spark.read.parquet(s"${dataDir(table)}/batch=$batch")
      .select(input_file_name().as("file"), col("column"), col("chunk_id"),
        col("codec"), col("n_rows"), col("bytes_in"), col("bytes_out"),
        col("min_key"), col("max_key"))
      .write.mode(SaveMode.Append).parquet(manifestDir(table))
  }

  /** Full manifest rebuild from the data files — an explicit repair tool
    * (Iceberg's `repair`/`rewrite_manifests` analogue), NOT part of the
    * append path.
    */
  def repairManifest(spark: SparkSession, table: String): Unit =
    spark.read.parquet(dataDir(table))
      .select(input_file_name().as("file"), col("column"), col("chunk_id"),
        col("codec"), col("n_rows"), col("bytes_in"), col("bytes_out"),
        col("min_key"), col("max_key"))
      .write.mode(SaveMode.Overwrite).parquet(manifestDir(table))

  override def readChunks(spark: SparkSession, table: String): Dataset[ChunkResult] = {
    import spark.implicits._
    spark.read.parquet(dataDir(table)).drop("batch").as[ChunkResult]
  }

  override def manifest(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(manifestDir(table))

  /** Point-read path: the manifest (tiny, driver-collectable hit list)
    * selects both the FILES to open and the CHUNK IDS to keep, so the scan
    * touches only the data files that can contain the key — Iceberg
    * metadata-read semantics. The chunk-id predicate is a pushable `IN`
    * filter, so parquet row-group min/max statistics prune within each hit
    * file as well. At 100 TB this reads a handful of files; the r2 shape
    * listed and footer-read the ENTIRE data directory per lookup.
    */
  override def chunksForKey(spark: SparkSession, table: String, key: String): Dataset[ChunkResult] = {
    import spark.implicits._
    val hits = manifest(spark, table)
      .filter(col("min_key") <= key && col("max_key") >= key)
      .select("file", "chunk_id")
      .collect()
    if (hits.isEmpty) return spark.emptyDataset[ChunkResult]
    val files = hits.map(_.getString(0)).distinct
    val ids = hits.map(_.getLong(1)).distinct
    spark.read.option("basePath", dataDir(table)).parquet(files: _*)
      .filter(col("chunk_id").isin(ids: _*))
      .drop("batch")
      .as[ChunkResult]
  }
}
