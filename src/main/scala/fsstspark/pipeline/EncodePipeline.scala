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
    ds.select(chunkId.cast("long").as("chunk_id"), col("key"), col("value"))
      .as[(Long, String, Array[Byte])]
      .repartition(col("chunk_id"))
      .sortWithinPartitions("chunk_id", "key")
      .mapPartitions { it =>
        groupByChunk(it).map { case (cid, keys, values) =>
          val enc = BytesCodec.encodeAuto(values)
          val keyBlob = BytesCodec.encodeAuto(keys.map(_.getBytes("UTF-8")))
          ChunkResult(cid, column, BytesCodec.names(enc.codec), values.length,
            enc.bytesIn, enc.blob.length, keyBlob.blob, enc.blob)
        }
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
    ds.select(chunkId.cast("long").as("chunk_id"), col("key"), col("value"))
      .as[(Long, String, Long)]
      .repartition(col("chunk_id"))
      .sortWithinPartitions("chunk_id", "key")
      .mapPartitions { it =>
        groupLongsByChunk(it).map { case (cid, keys, values) =>
          val colv = LongCodec.LongColumn(values, new Array[Boolean](values.length))
          val enc = LongCodec.encodeAuto(colv)
          val keyBlob = BytesCodec.encodeAuto(keys.map(_.getBytes("UTF-8")))
          ChunkResult(cid, column, LongCodec.names(enc.codec), values.length,
            enc.bytesIn, enc.blob.length, keyBlob.blob, enc.blob)
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
