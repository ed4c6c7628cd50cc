package fsstspark.util

import java.nio.ByteOrder
import org.apache.spark.unsafe.Platform

/** Little-endian byte-array primitives shared by all codecs.
  *
  * Unaligned 8-byte loads/stores are the backbone of the FSST kernels
  * (cf. /root/reference/symbol.go:44 `fsstUnalignedLoad`). We use Spark's
  * `Platform` static accessors (spark-unsafe), which JIT to single MOVs —
  * the signature-polymorphic `VarHandle` path boxes through scalac and was
  * measured ~30× slower. Platform reads in native byte order, so we guard
  * for little-endian hardware (true for every supported Spark target).
  */
object Bytes {
  require(ByteOrder.nativeOrder() == ByteOrder.LITTLE_ENDIAN,
    "fsstspark requires a little-endian platform")

  @inline def getLongLE(b: Array[Byte], i: Int): Long =
    Platform.getLong(b, Platform.BYTE_ARRAY_OFFSET + i)

  @inline def putLongLE(b: Array[Byte], i: Int, v: Long): Unit =
    Platform.putLong(b, Platform.BYTE_ARRAY_OFFSET + i, v)

  /** Unchecked single-byte store for kernel hot loops whose output bound
    * is guaranteed by construction (dst sized to `maxEncodedSize`).
    */
  @inline def putByte(b: Array[Byte], i: Int, v: Byte): Unit =
    Platform.putByte(b, Platform.BYTE_ARRAY_OFFSET + i, v)

  /** Unchecked single-byte load (callers guarantee bounds). */
  @inline def getByte(b: Array[Byte], i: Int): Byte =
    Platform.getByte(b, Platform.BYTE_ARRAY_OFFSET + i)

  /** Load up to `len` (1..8) bytes little-endian without reading past the end. */
  def getPartialLE(b: Array[Byte], i: Int, len: Int): Long = {
    var v = 0L
    var k = 0
    while (k < len) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }
}

/** Key-string comparison in Unicode CODE-POINT order — identical to UTF-8
  * byte order and to Spark's `UTF8String.binaryCompare`, which evaluates
  * the manifest's `min_key <= k <= max_key` pruning filter. Java
  * `String.compareTo` orders by raw UTF-16 unit, ranking BMP U+E000..FFFF
  * ABOVE supplementary-plane characters; min/max keys computed that way
  * would disagree with the filter and silently unprune (or worse, miss)
  * chunks. Adjustment at the first differing unit follows the standard
  * UTF-16→UTF-8-order trick: within [0xD800,0xFFFF], surrogates shift up,
  * non-surrogates shift down.
  */
object Keys {
  def compareUtf8(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i)
      val cb = b.charAt(i)
      if (ca != cb) {
        if (ca >= 0xd800 && cb >= 0xd800) {
          val xa = if (ca >= 0xe000) ca - 0x800 else ca + 0x2000
          val xb = if (cb >= 0xe000) cb - 0x800 else cb + 0x2000
          return xa - xb
        }
        return ca - cb
      }
      i += 1
    }
    a.length - b.length
  }
  @inline def lessUtf8(a: String, b: String): Boolean = compareUtf8(a, b) < 0
}

/** Growable byte buffer with varint support (avoids java.io streams in hot paths). */
final class ByteArrayBuilder(initialCapacity: Int = 64) {
  private var buf = new Array[Byte](math.max(initialCapacity, 16))
  private var len = 0

  def length: Int = len
  def raw: Array[Byte] = buf

  def ensure(extra: Int): Unit = {
    if (len + extra > buf.length) {
      var cap = buf.length * 2
      while (cap < len + extra) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def addByte(v: Int): Unit = { ensure(1); buf(len) = v.toByte; len += 1 }

  def addBytes(src: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(src, off, buf, len, n); len += n
  }
  def addBytes(src: Array[Byte]): Unit = addBytes(src, 0, src.length)

  /** Unsigned LEB128. */
  def addVarLong(v0: Long): Unit = {
    var v = v0
    ensure(10)
    while ((v & ~0x7fL) != 0) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
    buf(len) = v.toByte; len += 1
  }
  def addVarInt(v: Int): Unit = addVarLong(v.toLong & 0xffffffffL)

  /** Zig-zag signed varint. */
  def addZigZagLong(v: Long): Unit = addVarLong((v << 1) ^ (v >> 63))

  /** Reserve n bytes and return the start offset (caller fills via raw). */
  def reserve(n: Int): Int = { ensure(n); val p = len; len += n; p }
  def setLength(n: Int): Unit = { len = n }

  def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
}

/** Cursor for reading the formats written by [[ByteArrayBuilder]]. */
final class ByteReader(val buf: Array[Byte], var pos: Int = 0) {
  def readByte(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
  def readVarLong(): Long = {
    var v = 0L; var shift = 0
    var b = buf(pos) & 0xff; pos += 1
    while ((b & 0x80) != 0) { v |= (b & 0x7fL) << shift; shift += 7; b = buf(pos) & 0xff; pos += 1 }
    v | ((b & 0x7fL) << shift)
  }
  def readVarInt(): Int = readVarLong().toInt
  def readZigZagLong(): Long = { val v = readVarLong(); (v >>> 1) ^ -(v & 1) }
  def readBytes(n: Int): Array[Byte] = {
    // copyOfRange would silently ZERO-PAD past the end of `buf` — a
    // truncated blob must fail here, not fabricate zero bytes (and a
    // corrupt length must fail before allocating `n`)
    require(n >= 0 && pos + n <= buf.length && pos + n >= pos,
      s"corrupt blob: $n bytes requested at $pos of ${buf.length}")
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
  }
  def remaining: Int = buf.length - pos
}
