package fsstspark.codec

import fsstspark.util.{BitPacker, ByteArrayBuilder, ByteReader, Bytes}

/** Per-column-chunk encodings for integer-like columns (int64, int32
  * widened, timestamps as epoch micros, doubles via raw bits).
  *
  * Blob layout: [codecId u8][nValues varint][hasNulls u8][null bitmap if
  * hasNulls: ceil(n/8) bytes, bit i set = value present][payload over the
  * non-null values].
  *
  * Codec ids: 16=RAW (8B LE each), 17=FOR (frame-of-reference: zigzag min +
  * bit-packed deltas), 18=BITPACK (non-negative values packed directly),
  * 19=RLE (runs of [runLen varint][zigzag value]), 20=DELTA (zigzag first +
  * FoR over consecutive differences — sorted ids/timestamps).
  */
object LongCodec {
  final val RAW = 16
  final val FOR = 17
  final val BITPACK = 18
  final val RLE = 19
  final val DELTA = 20
  final val XOR = 21
  final val DICT = 22

  val names: Map[Int, String] =
    Map(RAW -> "raw8", FOR -> "for", BITPACK -> "bitpack", RLE -> "rle_long",
      DELTA -> "delta", XOR -> "xor", DICT -> "dict_long")

  /** Distinct values the selector tracks before declaring a chunk
    * dict-ineligible (mirrors BytesCodec.DistinctCap).
    */
  final val DictCap = 4096

  /** values + nulls mask (nulls(i) = true means NULL; values(i) then ignored). */
  final case class LongColumn(values: Array[Long], nulls: Array[Boolean]) {
    def n: Int = values.length
    def nonNullCount: Int = {
      var c = 0; var i = 0
      while (i < nulls.length) { if (!nulls(i)) c += 1; i += 1 }
      c
    }
  }

  private def header(out: ByteArrayBuilder, id: Int, col: LongColumn): Array[Long] = {
    out.addByte(id)
    out.addVarInt(col.n)
    var hasNulls = false
    var i = 0
    while (i < col.n && !hasNulls) { hasNulls = col.nulls(i); i += 1 }
    out.addByte(if (hasNulls) 1 else 0)
    if (hasNulls) {
      val bitmapLen = (col.n + 7) / 8
      val p = out.reserve(bitmapLen)
      java.util.Arrays.fill(out.raw, p, p + bitmapLen, 0.toByte)
      i = 0
      while (i < col.n) {
        if (!col.nulls(i)) out.raw(p + (i >> 3)) = (out.raw(p + (i >> 3)) | (1 << (i & 7))).toByte
        i += 1
      }
    }
    // compact non-null values
    val nn = col.nonNullCount
    if (nn == col.n) col.values
    else {
      val v = new Array[Long](nn)
      var k = 0
      i = 0
      while (i < col.n) { if (!col.nulls(i)) { v(k) = col.values(i); k += 1 }; i += 1 }
      v
    }
  }

  // Per-thread reusable scratch builder (see BytesCodec: chunk-sized
  // builders were per-call garbage; executor threads are long-lived).
  private val scratch = ThreadLocal.withInitial[ByteArrayBuilder](() => new ByteArrayBuilder(1 << 14))
  @inline private def fresh(sizeHint: Int): ByteArrayBuilder = {
    val b = scratch.get(); b.setLength(0); b.ensure(sizeHint); b
  }

  def encodeRaw(col: LongColumn): Array[Byte] = {
    val out = fresh(col.n * 8 + 16)
    val v = header(out, RAW, col)
    BitPacker.pack(v, v.length, 64, out)
    out.result()
  }

  def encodeFor(col: LongColumn): Array[Byte] = {
    val out = fresh(64)
    val v = header(out, FOR, col)
    var mn = if (v.nonEmpty) v(0) else 0L
    var mx = mn
    var i = 1
    while (i < v.length) { if (v(i) < mn) mn = v(i); if (v(i) > mx) mx = v(i); i += 1 }
    out.addZigZagLong(mn)
    val width = widthForRange(mn, mx)
    out.addByte(width)
    val deltas = new Array[Long](v.length)
    i = 0
    while (i < v.length) { deltas(i) = v(i) - mn; i += 1 }
    BitPacker.pack(deltas, deltas.length, width, out)
    out.result()
  }

  def encodeBitpack(col: LongColumn): Array[Byte] = {
    val out = fresh(64)
    val v = header(out, BITPACK, col)
    var mx = 0L
    var i = 0
    while (i < v.length) { require(v(i) >= 0, "BITPACK requires non-negative values"); if (v(i) > mx) mx = v(i); i += 1 }
    val width = BitPacker.widthFor(mx)
    out.addByte(width)
    BitPacker.pack(v, v.length, width, out)
    out.result()
  }

  def encodeRle(col: LongColumn): Array[Byte] = {
    val out = fresh(64)
    out.addByte(RLE)
    out.addVarInt(col.n)
    out.addByte(0) // RLE encodes nulls as run tokens, not a bitmap
    var i = 0
    while (i < col.n) {
      var j = i + 1
      while (j < col.n && col.nulls(j) == col.nulls(i) && (col.nulls(i) || col.values(j) == col.values(i))) j += 1
      out.addVarInt(j - i)
      if (col.nulls(i)) out.addByte(0)
      else { out.addByte(1); out.addZigZagLong(col.values(i)) }
      i = j
    }
    out.result()
  }

  /** First value zigzag + FoR over consecutive deltas (monotone sequences
    * like sorted keys or event timestamps pack to a few bits per value).
    */
  def encodeDelta(col: LongColumn): Array[Byte] = {
    val out = fresh(64)
    val v = header(out, DELTA, col)
    out.addZigZagLong(if (v.nonEmpty) v(0) else 0L)
    val d = new Array[Long](math.max(v.length - 1, 0))
    var mn = 0L
    var mx = 0L
    var i = 1
    while (i < v.length) {
      d(i - 1) = v(i) - v(i - 1)
      if (i == 1) { mn = d(0); mx = d(0) }
      else { if (d(i - 1) < mn) mn = d(i - 1); if (d(i - 1) > mx) mx = d(i - 1) }
      i += 1
    }
    out.addZigZagLong(mn)
    val width = widthForRange(mn, mx)
    out.addByte(width)
    i = 0
    while (i < d.length) { d(i) -= mn; i += 1 }
    BitPacker.pack(d, d.length, width, out)
    out.result()
  }

  /** XOR chain (the Gorilla idea, bit-packed instead of bitstream-coded):
    * first raw value, then `(v_i ^ v_{i-1}) >>> shift` packed at the
    * meaningful-bit width of the OR of all xors. Similar consecutive
    * values — double columns sharing sign/exponent with an unused
    * mantissa tail, slowly-moving gauges — leave both the xor's HIGH bits
    * (leading zeros) and LOW bits (trailing zeros) clear; shift+width
    * strip both. This is the double-column workhorse (doubles travel as
    * raw bits).
    */
  def encodeXor(col: LongColumn): Array[Byte] = {
    val out = fresh(64)
    val v = header(out, XOR, col)
    val p = out.reserve(8)
    Bytes.putLongLE(out.raw, p, if (v.nonEmpty) v(0) else 0L)
    val x = new Array[Long](math.max(v.length - 1, 0))
    var orAll = 0L
    var i = 1
    while (i < v.length) {
      x(i - 1) = v(i) ^ v(i - 1)
      orAll |= x(i - 1)
      i += 1
    }
    val (shift, width) = xorShiftWidth(orAll)
    out.addByte(shift)
    out.addByte(width)
    i = 0
    while (i < x.length) { x(i) = x(i) >>> shift; i += 1 }
    BitPacker.pack(x, x.length, width, out)
    out.result()
  }

  /** (trailing-zero shift, packed width) for an OR-of-all-xors pattern.
    * Widths 57..63 fall back to unshifted 64 — [[BitPacker]]'s 64-bit
    * accumulator supports ≤56 or exactly 64.
    */
  @inline private def xorShiftWidth(orAll: Long): (Int, Int) =
    if (orAll == 0) (0, 0)
    else {
      val shift = java.lang.Long.numberOfTrailingZeros(orAll)
      val width = 64 - java.lang.Long.numberOfLeadingZeros(orAll) - shift
      if (width > 56) (0, 64) else (shift, math.max(width, 1))
    }

  /** Chunk-local dictionary (Parquet's RLE_DICTIONARY case): distinct
    * values in first-seen order + bit-packed indices. Wins over
    * FoR/bitpack when values are low-cardinality but SCATTERED — index
    * width is log2(cardinality) regardless of the value range.
    */
  def encodeDictLong(col: LongColumn): Array[Byte] = {
    val out = fresh(64)
    val v = header(out, DICT, col)
    val index = new java.util.LinkedHashMap[java.lang.Long, Integer]()
    val ids = new Array[Long](v.length)
    var i = 0
    while (i < v.length) {
      val k = java.lang.Long.valueOf(v(i))
      var id = index.get(k)
      if (id == null) { id = index.size(); index.put(k, id) }
      ids(i) = id.toLong
      i += 1
    }
    out.addVarInt(index.size())
    val it = index.keySet().iterator()
    while (it.hasNext) { val p = out.reserve(8); Bytes.putLongLE(out.raw, p, it.next()) }
    val width = BitPacker.widthFor(math.max(index.size() - 1, 0).toLong)
    out.addByte(width)
    BitPacker.pack(ids, v.length, width, out)
    out.result()
  }

  /** Bounded open-addressed distinct tracker (no boxing in the probe). */
  private final class LongDistinct(cap: Int) {
    private val size = Integer.highestOneBit(math.max(cap * 4, 16) - 1) << 1
    private val mask = size - 1
    private val table = new Array[Long](size)
    private val used = new Array[Boolean](size)
    var n = 0
    var capped = false
    def add(v: Long): Unit = {
      if (capped) return
      var idx = (fsstspark.codec.fsst.Fsst.hash(v) & mask).toInt
      while (used(idx) && table(idx) != v) idx = (idx + 1) & mask
      if (!used(idx)) {
        used(idx) = true
        table(idx) = v
        n += 1
        if (n >= cap) capped = true
      }
    }
  }

  def decode(blob: Array[Byte]): LongColumn = {
    val r = new ByteReader(blob)
    val codec = r.readByte()
    val n = r.readVarInt()
    // corrupt-count guards (see BytesCodec.decode): the hard write-time
    // ceiling (every encode path enforces n ≤ EncodePipeline.MaxChunkRows),
    // then codec-aware payload arithmetic BEFORE the O(n) allocations —
    // RLE pre-scans its run list and requires the lengths to sum exactly
    // to n; the bitmap-bearing codecs require the null bitmap to fit; RAW
    // requires its fixed 8 B/value payload to fit. The irreducible
    // residue: constant/all-null columns legitimately pack millions of
    // rows into a few bytes (width-0 FoR/XOR), so a corrupt blob mimicking
    // that exact header still allocates what the legitimate chunk would.
    require(n >= 0 && n <= BytesCodec.MaxDecodedRows,
      s"corrupt long blob: value count $n implausible for ${blob.length}-byte blob")
    if (codec == RLE) {
      // pre-scan: run lengths must sum exactly to n within the blob
      val scan = new ByteReader(blob, r.pos)
      scan.readByte() // hasNulls placeholder
      var total = 0L
      while (total < n) {
        val runLen = scan.readVarInt()
        require(runLen > 0 && runLen <= n - total,
          s"corrupt rle blob: run length $runLen at row $total/$n")
        if (scan.readByte() == 1) scan.readZigZagLong()
        total += runLen
      }
    }
    if (codec == RLE) {
      val values = new Array[Long](n)
      val nulls = new Array[Boolean](n)
      r.readByte() // hasNulls placeholder
      var i = 0
      while (i < n) {
        val runLen = r.readVarInt()
        require(runLen > 0 && runLen <= n - i, s"corrupt rle blob: run length $runLen at row $i/$n")
        val flag = r.readByte()
        val v = if (flag == 1) r.readZigZagLong() else 0L
        var k = 0
        while (k < runLen) {
          nulls(i + k) = flag == 0
          values(i + k) = v
          k += 1
        }
        i += runLen
      }
      return LongColumn(values, nulls)
    }
    val hasNulls = r.readByte() == 1
    var nn = n
    var bm = -1
    if (hasNulls) {
      val bitmapLen = (n + 7) / 8
      require(r.pos + bitmapLen.toLong <= blob.length,
        s"corrupt long blob: $bitmapLen-byte null bitmap past blob end")
      bm = r.pos
      nn = 0
      var i = 0
      while (i < n) {
        if ((blob(bm + (i >> 3)) & (1 << (i & 7))) != 0) nn += 1
        i += 1
      }
      r.pos += bitmapLen
    }
    if (codec == RAW) require(8L * nn <= r.remaining,
      s"corrupt raw8 blob: $nn×8-byte values exceed ${r.remaining} remaining bytes")
    val values = new Array[Long](n)
    val nulls = new Array[Boolean](n)
    if (hasNulls) {
      var i = 0
      while (i < n) {
        nulls(i) = (blob(bm + (i >> 3)) & (1 << (i & 7))) == 0
        i += 1
      }
    }
    val packed = new Array[Long](nn)
    codec match {
      case RAW =>
        BitPacker.unpack(blob, r.pos, nn, 64, packed)
      case FOR =>
        val mn = r.readZigZagLong()
        val width = r.readByte()
        BitPacker.unpack(blob, r.pos, nn, width, packed)
        var i = 0
        while (i < nn) { packed(i) += mn; i += 1 }
      case BITPACK =>
        val width = r.readByte()
        BitPacker.unpack(blob, r.pos, nn, width, packed)
      case DELTA =>
        val first = r.readZigZagLong()
        val mn = r.readZigZagLong()
        val width = r.readByte()
        if (nn > 0) {
          val d = new Array[Long](nn - 1)
          BitPacker.unpack(blob, r.pos, nn - 1, width, d)
          packed(0) = first
          var i = 1
          while (i < nn) { packed(i) = packed(i - 1) + d(i - 1) + mn; i += 1 }
        }
      case XOR =>
        require(r.pos + 8 <= blob.length, "corrupt xor payload: missing first value")
        val first = Bytes.getLongLE(blob, r.pos)
        r.pos += 8
        val shift = r.readByte()
        val width = r.readByte()
        if (nn > 0) {
          val x = new Array[Long](nn - 1)
          BitPacker.unpack(blob, r.pos, nn - 1, width, x)
          packed(0) = first
          var i = 1
          while (i < nn) { packed(i) = packed(i - 1) ^ (x(i - 1) << shift); i += 1 }
        }
      case DICT =>
        val nDict = r.readVarInt()
        require(nDict >= 0 && r.pos + 8L * nDict <= blob.length,
          s"corrupt dict payload: $nDict entries exceed blob")
        val dict = new Array[Long](nDict)
        var i = 0
        while (i < nDict) { dict(i) = Bytes.getLongLE(blob, r.pos); r.pos += 8; i += 1 }
        val width = r.readByte()
        BitPacker.unpack(blob, r.pos, nn, width, packed)
        i = 0
        while (i < nn) {
          val id = packed(i).toInt
          require(id >= 0 && id < nDict, s"corrupt dict_long blob: index $id of $nDict at row $i")
          packed(i) = dict(id)
          i += 1
        }
      case other => throw new IllegalArgumentException(s"unknown long codec id $other")
    }
    // scatter back over nulls
    if (hasNulls) {
      var i = 0
      var k = 0
      while (i < n) { if (!nulls(i)) { values(i) = packed(k); k += 1 }; i += 1 }
    } else System.arraycopy(packed, 0, values, 0, n)
    LongColumn(values, nulls)
  }

  final case class Encoded(codec: Int, blob: Array[Byte], bytesIn: Long)

  /** Deterministic cost-model selection across RAW/FOR/BITPACK/RLE/DELTA. */
  def encodeAuto(col: LongColumn): Encoded = {
    val bytesIn = col.n.toLong * 8
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var runs = 0
    var nn = 0
    var deltaMn = Long.MaxValue
    var deltaMx = Long.MinValue
    var xorOr = 0L
    var prev = 0L
    var havePrev = false
    val distinct = new LongDistinct(DictCap)
    var i = 0
    while (i < col.n) {
      if (!col.nulls(i)) {
        val v = col.values(i)
        if (v < mn) mn = v
        if (v > mx) mx = v
        if (havePrev) {
          val d = v - prev
          if (d < deltaMn) deltaMn = d
          if (d > deltaMx) deltaMx = d
          xorOr |= v ^ prev
        }
        distinct.add(v)
        prev = v; havePrev = true
        nn += 1
      }
      if (i == 0 || col.nulls(i) != col.nulls(i - 1) ||
          (!col.nulls(i) && col.values(i) != col.values(i - 1))) runs += 1
      i += 1
    }
    if (nn == 0) { mn = 0; mx = 0 }
    if (nn <= 1) { deltaMn = 0; deltaMx = 0 }
    val bitmapCost = if (nn < col.n) (col.n + 7) / 8 else 0
    val est = scala.collection.mutable.Map.empty[Int, Long]
    est(RAW) = 8L * nn + bitmapCost + 8
    est(FOR) = BitPacker.packedSize(nn, widthForRange(mn, mx)) + bitmapCost + 16
    if (nn == 0 || mn >= 0)
      est(BITPACK) = BitPacker.packedSize(nn, BitPacker.widthFor(math.max(mx, 0))) + bitmapCost + 12
    // per-run cost = runLen varint + flag + zigzag value bytes (sized from
    // the actual value range — a flat 6 underestimated wide values like
    // double bit patterns by 2x and made RLE win chunks it then lost)
    val zzMax = math.max(zigzagLen(mn), zigzagLen(mx))
    est(RLE) = runs.toLong * (2 + zzMax) + 8
    est(DELTA) = BitPacker.packedSize(math.max(nn - 1, 0), widthForRange(deltaMn, deltaMx)) + bitmapCost + 24
    est(XOR) = BitPacker.packedSize(math.max(nn - 1, 0), xorShiftWidth(xorOr)._2) + bitmapCost + 18
    if (!distinct.capped)
      est(DICT) = 8L * distinct.n +
        BitPacker.packedSize(nn, BitPacker.widthFor(math.max(distinct.n - 1, 0).toLong)) +
        bitmapCost + 12
    val chosen = est.toSeq.minBy { case (id, sz) => (sz, id) }._1
    val blob = chosen match {
      case RAW => encodeRaw(col)
      case FOR => encodeFor(col)
      case BITPACK => encodeBitpack(col)
      case RLE => encodeRle(col)
      case DELTA => encodeDelta(col)
      case XOR => encodeXor(col)
      case DICT => encodeDictLong(col)
    }
    // raw-store guarantee (mirrors BytesCodec): never ship a blob larger
    // than the straight 8-byte encoding
    if (chosen != RAW && blob.length > est(RAW)) Encoded(RAW, encodeRaw(col), bytesIn)
    else Encoded(chosen, blob, bytesIn)
  }

  /** Unsigned-LEB128 length of a zigzag-encoded long. */
  @inline private def zigzagLen(v: Long): Int = {
    val z = (v << 1) ^ (v >> 63)
    if (z == 0) 1 else (70 - java.lang.Long.numberOfLeadingZeros(z)) / 7
  }

  /** Bit width for values in [mn, mx] after subtracting mn, overflow-safe. */
  private def widthForRange(mn: Long, mx: Long): Int = {
    val range = mx - mn
    if (range < 0) 64 // overflow: range spans > 2^63
    else BitPacker.widthFor(range)
  }
}
