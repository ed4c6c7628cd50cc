package fsstspark.util

/** Word-aligned little-endian bit packing (à la Parquet RLE_DICTIONARY /
  * Lemire fastpfor): `count` values of `width` bits each.
  *
  * Supported widths: 0..56 and 64. Width 0 encodes a constant-zero stream
  * with no payload; width 64 is raw 8-byte little-endian values. Widths
  * 57..63 are rounded up to 64 by [[widthFor]] — the 64-bit accumulator
  * stays carry-free for widths ≤ 56 and the <1% size loss on near-64-bit
  * data is not worth a spill path in the hot loop.
  */
object BitPacker {

  def packedSize(count: Int, width: Int): Long = (count.toLong * width + 7) / 8

  def pack(values: Array[Long], count: Int, width: Int, out: ByteArrayBuilder): Unit = {
    if (width == 0) return
    require(width <= 56 || width == 64, s"unsupported width $width")
    out.ensure(packedSize(count, width).toInt + 8)
    if (width == 64) {
      var i = 0
      while (i < count) {
        val p = out.reserve(8)
        Bytes.putLongLE(out.raw, p, values(i))
        i += 1
      }
      return
    }
    val mask = (1L << width) - 1
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < count) {
      acc |= (values(i) & mask) << accBits
      accBits += width
      while (accBits >= 8) {
        out.addByte((acc & 0xff).toInt)
        acc >>>= 8
        accBits -= 8
      }
      i += 1
    }
    if (accBits > 0) out.addByte((acc & 0xff).toInt)
  }

  /** Unpack `count` values from `in` starting at `offset`; returns the
    * position after the packed payload.
    */
  def unpack(in: Array[Byte], offset: Int, count: Int, width: Int, out: Array[Long]): Int = {
    if (width == 0) { java.util.Arrays.fill(out, 0, count, 0L); return offset }
    require(width <= 56 || width == 64, s"unsupported width $width")
    var p = offset
    if (width == 64) {
      // the 8-byte loads are unchecked Platform reads — bound them against
      // the payload before the loop so a corrupt count fails cleanly
      require(p >= 0 && p + 8L * count <= in.length,
        s"corrupt bitpack payload: $count×64-bit values at $p exceed ${in.length} bytes")
      var i = 0
      while (i < count) { out(i) = Bytes.getLongLE(in, p); p += 8; i += 1 }
      return p
    }
    val mask = (1L << width) - 1
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < count) {
      while (accBits < width) {
        acc |= (in(p) & 0xffL) << accBits
        p += 1
        accBits += 8
      }
      out(i) = acc & mask
      acc >>>= width
      accBits -= width
      i += 1
    }
    p
  }

  /** Minimum supported width to represent any value in [0, maxValue]. */
  def widthFor(maxValue: Long): Int = {
    if (maxValue == 0) return 0
    val w = 64 - java.lang.Long.numberOfLeadingZeros(maxValue)
    if (w > 56) 64 else w
  }
}
