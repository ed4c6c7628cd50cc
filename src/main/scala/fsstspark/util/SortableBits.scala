package fsstspark.util

/** Monotone Long encoding for non-integer zone-map statistics.
  *
  * Chunk zone maps ([[fsstspark.pipeline.ChunkResult]] `value_min` /
  * `value_max`) store one pair of Longs per chunk regardless of the
  * column's logical type, so double columns need an order-preserving
  * map from IEEE-754 doubles to SIGNED longs. Raw bits already order
  * non-negative doubles correctly (and keep them in the non-negative
  * signed range); negative doubles ascend in raw bits as the double
  * DESCENDS, so flipping their 63 magnitude bits (sign bit kept)
  * reverses them into place below zero. The same trick underlies the
  * binary-comparable forms in Parquet/ORC column statistics.
  *
  * Total order: -NaN < -Inf < finite < +Inf < +NaN, with -0.0
  * immediately below +0.0 — zone pruning with bounds mapped through
  * the SAME function can never lose a row, which is the only property
  * pruning needs. The map is an involution (`fromDoubleBits` is its
  * own inverse).
  */
object SortableBits {

  /** Order-preserving involution between raw IEEE-754 bits and signed
    * longs.
    */
  @inline def fromDoubleBits(bits: Long): Long =
    bits ^ ((bits >> 63) & Long.MaxValue)

  /** Order-preserving map from a double to a signed long:
    * `a < b` implies `fromDouble(a) < fromDouble(b)`.
    */
  @inline def fromDouble(d: Double): Long =
    fromDoubleBits(java.lang.Double.doubleToRawLongBits(d))

  /** Inverse of [[fromDouble]] (tests + readers that surface a stored
    * bound back as a double). `fromDoubleBits` is self-inverse.
    */
  @inline def toDouble(s: Long): Double =
    java.lang.Double.longBitsToDouble(fromDoubleBits(s))
}
