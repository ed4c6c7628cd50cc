package fsstspark.streaming

import fsstspark.pipeline.{Checkpoint, EncodePipeline, KV}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental ingestion compression: a Structured Streaming file source
  * watches a directory of incoming page files; every micro-batch is
  * encoded with the zero-shuffle local pipeline and appended to the
  * checkpoint table via `foreachBatch`.
  *
  * The north rule is a batch job (SURVEY.md §2.3.j), so this is the
  * *optional* continuous-ingest front end: the batch pipeline is the
  * engine, streaming just feeds it micro-batches. Exactly-once at the
  * chunk level falls out of the same content-derived chunk ids — a batch
  * replayed after a crash re-encodes to identical ids, and
  * `resumeBytesLocal`'s id-set filter drops duplicates.
  */
object StreamingEncode {

  /** Start encoding `srcDir` (parquet files with at least `keyCol` and
    * string/binary `valueCol`) into `checkpointTable`.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      keyCol: String,
      valueCol: String,
      column: String,
      checkpointTable: String,
      streamStateDir: String,
      targetChunkBytes: Long = 16L << 20
  ): StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream.schema(schema).parquet(srcDir)
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("binary").as("value"))
      .as[KV]
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", streamStateDir)
      .foreachBatch { (batch: Dataset[KV], batchId: Long) =>
        // done-id filter makes a replayed batch a no-op (chunk ids are
        // content-derived, so the replay regenerates the same ids)
        Checkpoint.resumeBytesLocal(batch, column, checkpointTable, targetChunkBytes)
        ()
      }
      .start()
  }

  /** Stream straight into the chunk CATALOG ([[fsstspark.io.TableIO]]):
    * each micro-batch encodes through the zero-shuffle local pipeline and
    * appends as one catalog batch (manifest rows included), exactly-once
    * at chunk granularity — a replayed batch regenerates the same
    * content-derived ids, which are skipped against the catalog's existing
    * chunk set before any encode work. Every `compactEvery` batches the
    * column's under-sized chunks compact in place ([[fsstspark.pipeline.Compaction]]),
    * so a low-rate stream converges to target-size, key-clustered chunks
    * instead of accreting fragments forever.
    */
  def startCatalog(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      keyCol: String,
      valueCol: String,
      column: String,
      io: fsstspark.io.TableIO,
      table: String,
      streamStateDir: String,
      targetChunkBytes: Long = 16L << 20,
      compactEvery: Long = 0,
      minChunkBytes: Long = 0
  ): StreamingQuery = {
    import spark.implicits._
    val minBytes = if (minChunkBytes > 0) minChunkBytes else targetChunkBytes / 2
    val stream = spark.readStream.schema(schema).parquet(srcDir)
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("binary").as("value"))
      .as[KV]
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", streamStateDir)
      .foreachBatch { (batch: Dataset[KV], batchId: Long) =>
        // "already ingested" = live chunks PLUS tombstoned ones: a chunk
        // compacted away was ingested once, and a from-scratch replay must
        // not revive its pre-compaction id as new data. The set comes from
        // the MANIFEST (small metadata table, committed batches only) —
        // never from the data files, whose per-batch scan cost would grow
        // with table size on every micro-batch.
        val done: Array[Long] =
          if (!io.tableExists(spark, table)) Array.emptyLongArray
          else io.manifest(spark, table).select("chunk_id", "column")
            .unionByName(io.deletedChunks(spark, table))
            .filter(col("column") === column)
            .select("chunk_id").distinct().as[Long].collect()
        val enc = EncodePipeline.encodeBytesLocal(batch, column, targetChunkBytes, done).persist()
        if (enc.count() > 0) io.writeChunks(enc, table)
        enc.unpersist()
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          fsstspark.pipeline.Compaction.compactColumn(
            spark, io, table, column, minBytes, targetChunkBytes)
        ()
      }
      .start()
  }
}
