package fsstspark.stats

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Shannon byte-entropy (bits/byte) of a binary column, as a typed
  * [[Aggregator]]: buffer = 256-bin byte histogram, merge = bin-wise add —
  * exactly the shape Spark needs for partial (map-side) + final
  * aggregation, so the pass stays a single shuffle of 2 KB buffers per
  * group regardless of data size (SURVEY.md N5).
  */
object ByteEntropyAgg extends Aggregator[Array[Byte], Array[Long], Double] {
  def zero: Array[Long] = new Array[Long](256)
  def reduce(h: Array[Long], v: Array[Byte]): Array[Long] = {
    if (v != null) {
      var i = 0
      while (i < v.length) { h(v(i) & 0xff) += 1; i += 1 }
    }
    h
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 256) { a(i) += b(i); i += 1 }
    a
  }
  def finish(h: Array[Long]): Double = {
    var total = 0L
    var i = 0
    while (i < 256) { total += h(i); i += 1 }
    if (total == 0) return 0.0
    var e = 0.0
    i = 0
    while (i < 256) {
      if (h(i) > 0) {
        val p = h(i).toDouble / total
        e -= p * (math.log(p) / math.log(2))
      }
      i += 1
    }
    e
  }
  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The N5 stats pass: everything the codec selector wants about a column,
  * gathered in ONE `groupBy(chunk).agg(...)` — one partial+final hash
  * aggregate, one shuffle of small buffers (HLL sketch + histogram), no
  * second scan of the data.
  */
object ChunkStats {

  val byteEntropy: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(ByteEntropyAgg)

  /** SQL-checkable core stats (exact; oracle-comparable in DuckDB). */
  def basic(df: DataFrame, chunkId: Column, value: Column): DataFrame =
    df.groupBy(chunkId.cast("long").as("chunk_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(octet_length(value)).as("total_bytes"),
        max(octet_length(value)).as("max_len"),
        countDistinct(value).as("n_distinct")
      )

  /** Selector-facing profile: approximate distinct (HLL++) + byte entropy,
    * still a single aggregate pass. Not SQL-expressible in the oracle
    * (sketches + histogram UDAF) → covered by ScalaTest instead.
    */
  def profile(df: DataFrame, chunkId: Column, value: Column): DataFrame =
    df.groupBy(chunkId.cast("long").as("chunk_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(octet_length(value)).as("total_bytes"),
        avg(octet_length(value)).as("avg_len"),
        approx_count_distinct(value).as("approx_distinct"),
        byteEntropy(value.cast("binary")).as("entropy_bits_per_byte")
      )
}
