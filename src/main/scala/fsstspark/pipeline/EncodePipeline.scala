package fsstspark.pipeline

import fsstspark.codec.{BytesCodec, LongCodec}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** One keyed value of a column chunk: `key` identifies the row (url /
  * doc_id), `value` the column bytes. Null values round-trip.
  */
final case class KV(key: String, value: Array[Byte])

/** Long-typed variant for integer/timestamp columns. */
final case class LongKV(key: String, value: Long)

/** Output of one per-chunk encode task (SURVEY.md N8): the compressed
  * column chunk plus lineage + metrics. `value_blob` is a self-describing
  * [[BytesCodec]]/[[LongCodec]] blob (FSST blobs embed their trained symbol
  * table); `key_blob` stores the chunk's row keys in chunk order so decode
  * can re-emit keyed rows for the verification join (SURVEY.md N10).
  */
final case class ChunkResult(
    chunk_id: Long,
    column: String,
    codec: String,
    n_rows: Long,
    bytes_in: Long,
    bytes_out: Long,
    min_key: String,
    max_key: String,
    key_blob: Array[Byte],
    value_blob: Array[Byte]
)

/** The per-column-chunk encode pipeline (SURVEY.md §7.2 step 2, N7/N8).
  *
  * Dataflow: assign a deterministic chunk id per row (a pure function of
  * the row KEY, never of partition index — reruns and resumes must
  * produce identical chunks, SURVEY.md §7.3) → shuffle rows to chunks
  * (`repartition` on chunk_id, the "salted repartition" that breaks value
  * skew: a hot key pattern spreads over `nChunks` reducers) → sort within
  * partitions so chunk content order is deterministic → one streaming
  * `mapPartitions` pass that trains + encodes each chunk entirely inside
  * its task (training never crosses an executor boundary, SURVEY.md §3.5).
  *
  * Scale notes: a chunk is the unit of compression and is buffered in one
  * task; callers size `nChunks` so bytes/chunk stays ~8–64 MB at target
  * scale. The sort is a standard external (spillable) sort; the shuffle is
  * the only one in the encode path.
  */
object EncodePipeline {

  /** Deterministic chunk id from the row key (cluster-order independent). */
  def chunkIdByHash(key: Column, nChunks: Int): Column =
    pmod(xxhash64(key), lit(nChunks.toLong))

  /** Encode a string/binary column given as keyed values. `chunkId` must be
    * a deterministic pure function of `key` (e.g. [[chunkIdByHash]], or
    * `pmod(col("key").cast("long"), n)` when keys are numeric and the
    * oracle needs a SQL-expressible chunking).
    */
  def encodeBytes(
      ds: Dataset[KV],
      column: String,
      chunkId: Column
  ): Dataset[ChunkResult] = {
    val spark = ds.sparkSession
    import spark.implicits._
    // Explicit partition count: without it AQE coalesces the exchange to
    // ~64MB partitions, capping the reduce stage (sort + train + encode —
    // the CPU-heavy part) at a handful of tasks regardless of cores.
    val parts = ds.sparkSession.sessionState.conf.numShufflePartitions
    // Sort on chunk_id alone (single-long radix sort) — deterministic
    // per-chunk order is restored by a cheap in-task sort of each chunk's
    // keys, instead of making Spark's external sorter compare string keys
    // for every row.
    ds.select(chunkId.cast("long").as("chunk_id"), col("key"), col("value"))
      .as[(Long, String, Array[Byte])]
      .repartition(parts, col("chunk_id"))
      .sortWithinPartitions("chunk_id")
      .mapPartitions { it =>
        groupByChunk(it).map { case (cid, keys, values) =>
          sortByKey(keys, values)
          mkResult(cid, column, keys, values)
        }
      }
  }

  /** In-place co-sort of a chunk's keys and values by key (deterministic
    * chunk content order independent of shuffle arrival order).
    */
  private def sortByKey[V](keys: Array[String], values: Array[V]): Unit = {
    val sorted = Array.range(0, keys.length).sortBy(keys(_))
    val k2 = keys.clone()
    val v2 = values.clone()
    var i = 0
    while (i < sorted.length) {
      keys(i) = k2(sorted(i))
      values(i) = v2(sorted(i))
      i += 1
    }
  }

  private def sortLongsByKey(keys: Array[String], values: Array[Long]): Unit = {
    val sorted = Array.range(0, keys.length).sortBy(keys(_))
    val k2 = keys.clone()
    val v2 = values.clone()
    var i = 0
    while (i < sorted.length) {
      keys(i) = k2(sorted(i))
      values(i) = v2(sorted(i))
      i += 1
    }
  }

  /** Zero-shuffle encode: chunks are consecutive runs of rows within each
    * input partition, cut at `targetChunkBytes` — the shape of an Iceberg
    * data-file rewrite (each task recompresses its own file/partition
    * range; nothing crosses the wire). This is the 100 TB path: the only
    * data movement is the scan itself. Chunk ids are content hashes
    * (first/last key + count), so a rerun over the same input produces
    * identical ids and [[Checkpoint]] resume can skip completed chunks.
    *
    * Use [[encodeBytes]] (hash-partitioned) when chunk membership must be
    * a pure function of the key regardless of input layout; use this when
    * input layout IS the lineage (file/partition ranges), which is how a
    * real table-rewrite job runs.
    */
  def encodeBytesLocal(
      ds: Dataset[KV],
      column: String,
      targetChunkBytes: Long = 16L << 20,
      completed: Set[Long] = Set.empty
  ): Dataset[ChunkResult] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      localChunks(it, targetChunkBytes).flatMap { case (keys, values) =>
        val cid = localChunkId(keys)
        if (completed.contains(cid)) None
        else Some(mkResult(cid, column, keys, values))
      }
    }
  }

  /** Deterministic content-derived chunk id: depends only on the chunk's
    * first/last keys and row count, not on partition numbering.
    */
  def localChunkId(keys: Array[String]): Long = {
    var h = 1469598103934665603L
    def mixStr(s: String): Unit = {
      var i = 0
      while (i < s.length) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
      h = (h ^ 0xff) * 1099511628211L
    }
    mixStr(keys.head)
    mixStr(keys.last)
    h ^ keys.length
  }

  private def mkResult(cid: Long, column: String, keys: Array[String],
      values: Array[Array[Byte]]): ChunkResult = {
    val enc = BytesCodec.encodeAuto(values)
    val keyBlob = BytesCodec.encodeAuto(keys.map(_.getBytes("UTF-8")))
    var mn = keys(0)
    var mx = keys(0)
    var i = 1
    while (i < keys.length) {
      if (keys(i) < mn) mn = keys(i)
      if (keys(i) > mx) mx = keys(i)
      i += 1
    }
    ChunkResult(cid, column, BytesCodec.names(enc.codec), values.length,
      enc.bytesIn, enc.blob.length, mn, mx, keyBlob.blob, enc.blob)
  }

  /** Cuts a partition's row stream into consecutive chunks of
    * ~targetChunkBytes (never empty; a single giant value forms its own
    * chunk — skew becomes task-internal, not task-killing).
    */
  private def localChunks(
      it: Iterator[KV], targetChunkBytes: Long
  ): Iterator[(Array[String], Array[Array[Byte]])] =
    new Iterator[(Array[String], Array[Array[Byte]])] {
      private val in = it
      def hasNext: Boolean = in.hasNext
      def next(): (Array[String], Array[Array[Byte]]) = {
        val keys = new ArrayBuffer[String]
        val values = new ArrayBuffer[Array[Byte]]
        var bytes = 0L
        while (in.hasNext && bytes < targetChunkBytes) {
          val kv = in.next()
          keys += kv.key
          values += kv.value
          bytes += (if (kv.value == null) 0 else kv.value.length)
        }
        (keys.toArray, values.toArray)
      }
    }

  /** Encode an integer-like column (ids, epoch micros). */
  def encodeLongs(
      ds: Dataset[LongKV],
      column: String,
      chunkId: Column
  ): Dataset[ChunkResult] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val parts = ds.sparkSession.sessionState.conf.numShufflePartitions
    ds.select(chunkId.cast("long").as("chunk_id"), col("key"), col("value"))
      .as[(Long, String, Long)]
      .repartition(parts, col("chunk_id"))
      .sortWithinPartitions("chunk_id")
      .mapPartitions { it =>
        groupLongsByChunk(it).map { case (cid, keys, values) =>
          sortLongsByKey(keys, values)
          val colv = LongCodec.LongColumn(values, new Array[Boolean](values.length))
          val enc = LongCodec.encodeAuto(colv)
          val keyBlob = BytesCodec.encodeAuto(keys.map(_.getBytes("UTF-8")))
          ChunkResult(cid, column, LongCodec.names(enc.codec), values.length,
            enc.bytesIn, enc.blob.length, keys.head, keys.last, keyBlob.blob, enc.blob)
        }
      }
  }

  /** Inverse of [[encodeBytes]]: keyed rows back out of the chunk blobs. */
  def decodeBytes(results: Dataset[ChunkResult]): Dataset[KV] = {
    val spark = results.sparkSession
    import spark.implicits._
    results.flatMap { r =>
      val keys = BytesCodec.decode(r.key_blob)
      val values = BytesCodec.decode(r.value_blob)
      require(keys.length == values.length, s"chunk ${r.chunk_id}: key/value count mismatch")
      Iterator.tabulate(keys.length)(i => KV(new String(keys(i), "UTF-8"), values(i)))
    }
  }

  /** Inverse of [[encodeLongs]]. */
  def decodeLongs(results: Dataset[ChunkResult]): Dataset[LongKV] = {
    val spark = results.sparkSession
    import spark.implicits._
    results.flatMap { r =>
      val keys = BytesCodec.decode(r.key_blob)
      val col = LongCodec.decode(r.value_blob)
      Iterator.tabulate(keys.length)(i => LongKV(new String(keys(i), "UTF-8"), col.values(i)))
    }
  }

  /** N10 join-and-compare: decoded vs original, per-key bit-identity.
    * Returns one row per key with a `matched` flag; callers assert
    * `filter(!matched)` is empty or aggregate a mismatch count.
    */
  def verify(original: Dataset[KV], decoded: Dataset[KV]): DataFrame = {
    val o = original.toDF("key", "original")
    val d = decoded.toDF("key", "decoded")
    o.join(d, Seq("key"), "full_outer")
      .select(col("key"),
        (col("original").isNotNull && col("decoded").isNotNull &&
          col("original") === col("decoded")).as("matched"))
  }

  /** Streams `(chunkId, key, value)` rows sorted by chunkId into one
    * buffered chunk at a time (bounded by chunk size, not partition size).
    */
  private def groupByChunk(
      it: Iterator[(Long, String, Array[Byte])]
  ): Iterator[(Long, Array[String], Array[Array[Byte]])] =
    new Iterator[(Long, Array[String], Array[Array[Byte]])] {
      private val in = it.buffered
      def hasNext: Boolean = in.hasNext
      def next(): (Long, Array[String], Array[Array[Byte]]) = {
        val cid = in.head._1
        val keys = new ArrayBuffer[String]
        val values = new ArrayBuffer[Array[Byte]]
        while (in.hasNext && in.head._1 == cid) {
          val (_, k, v) = in.next()
          keys += k
          values += v
        }
        (cid, keys.toArray, values.toArray)
      }
    }

  private def groupLongsByChunk(
      it: Iterator[(Long, String, Long)]
  ): Iterator[(Long, Array[String], Array[Long])] =
    new Iterator[(Long, Array[String], Array[Long])] {
      private val in = it.buffered
      def hasNext: Boolean = in.hasNext
      def next(): (Long, Array[String], Array[Long]) = {
        val cid = in.head._1
        val keys = new ArrayBuffer[String]
        val values = new ArrayBuffer[Long]
        while (in.hasNext && in.head._1 == cid) {
          val (_, k, v) = in.next()
          keys += k
          values += v
        }
        (cid, keys.toArray, values.toArray)
      }
    }
}
