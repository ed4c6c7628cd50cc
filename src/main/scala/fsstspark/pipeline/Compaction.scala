package fsstspark.pipeline

import fsstspark.io.TableIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Chunk compaction — the Iceberg `rewrite_data_files` analogue for the
  * chunk catalog. Streaming ingest ([[fsstspark.streaming.StreamingEncode]])
  * lands one batch of chunks per micro-batch, so low-rate sources accrete
  * under-sized chunks whose fixed costs (symbol table per chunk, manifest
  * row per chunk, task per chunk) erode both compression ratio and scan
  * efficiency. Compaction decodes the under-sized chunks of one column,
  * re-clusters them by key (`repartitionByRange` + in-partition key sort —
  * so the rewritten chunks also carry TIGHT min/max key ranges, which is
  * what makes manifest point-read pruning effective), re-encodes at the
  * target size through the auto-selector, appends the new chunks, and
  * tombstones the old ones.
  *
  * The victim set (chunk ids being compacted) is SNAPSHOTTED to the driver
  * before anything is written: catalog reads resolve their file listing
  * lazily, so a plan kept across the append would otherwise see — and
  * tombstone — the chunks this very compaction just wrote. The snapshot is
  * ids+column only (tens of bytes per chunk), bounded by the compaction
  * batch, never the table.
  *
  * Atomicity: the rewrite goes through [[TableIO.replaceChunks]] — the new
  * chunks land uncommitted, the deletes land gated on the new batch, and
  * one commit marker flips both into visibility together. A crash at any
  * point leaves either the pre-compaction or the post-compaction state,
  * never duplicates and never a gap (the snapshot-commit semantics a real
  * Iceberg catalog provides, emulated per SURVEY.md §7.0).
  */
object Compaction {

  final case class Result(chunksCompacted: Long, chunksWritten: Long, bytesRewritten: Long)

  /** Rewrite every chunk of `column` whose input bytes are below
    * `minChunkBytes` into ~`targetChunkBytes` chunks. No-op (returns zero)
    * when fewer than two chunks qualify. Content-derived chunk ids make
    * the rewrite idempotent: a rewritten chunk that is content-identical
    * to an existing one is neither re-written nor tombstoned.
    *
    * The value KIND (bytes / long / double) is re-derived from the
    * catalog's codec names alone — double chunks carry
    * [[EncodePipeline.DoubleCodecSuffix]] — so no call site has to
    * remember what type a column was written as. Getting this wrong is
    * not cosmetic: a double column rewritten down the long path would get
    * zone maps recomputed in signed-long order over raw IEEE bits instead
    * of the [[fsstspark.util.SortableBits]] order the write path stored,
    * and `chunksForValueRange` would silently prune chunks that contain
    * in-range rows.
    *
    * LEGACY caveat: double columns written BEFORE the `_f64` codec-name
    * suffix existed carry plain long codec names and are indistinguishable
    * from genuine long columns here — the name-based dispatch would take
    * the long route and store zone maps over raw IEEE bits (negative
    * doubles order reversed). For such known-legacy columns pass
    * `assumeDouble = true` to force the double route; the rewrite then
    * also MIGRATES the column onto `_f64` names, so the flag is needed
    * only once per column.
    */
  def compactColumn(
      spark: SparkSession,
      io: TableIO,
      table: String,
      column: String,
      minChunkBytes: Long,
      targetChunkBytes: Long = 16L << 20,
      assumeDouble: Boolean = false
  ): Result = {
    import spark.implicits._
    val small = io.readChunks(spark, table)
      .filter(col("column") === column && col("bytes_in") < minChunkBytes)
    // driver snapshot of the victim set, taken before any write mutates
    // the directory the lazy listing would re-resolve against
    val victims = small.select(col("chunk_id"), col("bytes_in"), col("codec"))
      .as[(Long, Long, String)].collect()
    if (victims.length < 2) return Result(0, 0, 0)
    val oldIds = victims.map(_._1).toSet
    val bytes = victims.map(_._2).sum
    // the catalog's codec name decides the rewrite path: plain LongCodec
    // names → long route, the _f64-suffixed forms → double route (so the
    // rewritten zone maps stay in SortableBits space), anything else →
    // byte route. Doubles are raw IEEE bits under either long codec, so
    // the data rewrite is bit-exact regardless — only the stats differ.
    val longCodecNames = fsstspark.codec.LongCodec.names.values.toSet
    val headCodec = victims.head._3
    require(!assumeDouble ||
      headCodec.endsWith(EncodePipeline.DoubleCodecSuffix) || longCodecNames.contains(headCodec),
      s"assumeDouble: column '$column' stores byte chunks (codec '$headCodec'), not doubles")
    val isDouble = assumeDouble || headCodec.endsWith(EncodePipeline.DoubleCodecSuffix)
    val isLongColumn = isDouble || longCodecNames.contains(headCodec)
    // re-cluster by key so rewritten chunks are key ranges (tight manifest
    // min/max); partition count sized so each partition emits a handful of
    // target-size chunks
    val parts = math.max(1, (bytes / (4 * targetChunkBytes)).toInt)
    val rewritten = (if (isLongColumn) {
      val dec = if (isDouble) EncodePipeline.decodeDoubles(small).toDF("key", "value")
                else EncodePipeline.decodeLongsNullable(small).toDF("key", "value")
      val kv = dec
        .repartitionByRange(parts, col("key"))
        .sortWithinPartitions("key")
      EncodePipeline.encodeColumnsLocal(kv, col("key"),
        Seq(EncodePipeline.ColSpec(column, col("value"), isLong = !isDouble, isDouble = isDouble)),
        targetChunkBytes)
    } else {
      val kv = EncodePipeline.decodeBytes(small)
        .repartitionByRange(parts, col("key"))
        .sortWithinPartitions("key")
        .as[KV]
      EncodePipeline.encodeBytesLocal(kv, column, targetChunkBytes)
    }).persist()
    try {
      val newIds = rewritten.select("chunk_id").as[Long].collect().toSet
      val overlap = newIds.intersect(oldIds) // content-identical → keep original row
      val toWrite =
        if (overlap.isEmpty) rewritten
        else rewritten.filter(!col("chunk_id").isin(overlap.toSeq: _*)).as[ChunkResult]
      val nWritten = (newIds -- overlap).size.toLong
      val removeRows = (oldIds -- overlap).toSeq.map(id => (id, column))
      if (nWritten > 0)
        io.replaceChunks(spark, table, toWrite, removeRows.toDF("chunk_id", "column"))
      else if (removeRows.nonEmpty) // pure deletion (every new chunk already existed)
        io.removeChunks(spark, table, removeRows.toDF("chunk_id", "column"))
      Result(removeRows.size.toLong, nWritten, bytes)
    } finally rewritten.unpersist()
  }
}
