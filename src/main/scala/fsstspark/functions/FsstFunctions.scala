package fsstspark.functions

import fsstspark.codec.fsst.{Fsst, FsstTrainer, SymbolTable}
import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** SQL-callable FSST codec surface (SURVEY.md §7.2 step 8): native
  * Catalyst expressions with real `doGenCode` (the kernel call is emitted
  * inside whole-stage codegen — no UDF boxing, no codegen fallback), plus
  * a training aggregate, so the whole codec is usable from pure SQL:
  *
  * {{{
  *   SELECT fsst_decode(fsst_encode(v, tbl), tbl) FROM ...   -- == v
  *   SELECT fsst_train(v) FROM corpus                        -- table bytes
  * }}}
  *
  * Blob format of `fsst_encode`: varint(origLen) ++ codes — the length
  * prefix lets decode allocate exactly.
  */
object FsstFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("fsst_encode",
      exprs => FsstEncodeExpr(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("fsst_decode",
      exprs => FsstDecodeExpr(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("fsst_decode_string",
      exprs => FsstDecodeStringExpr(exprs.head, exprs(1)), "scala_udf")
    spark.udf.register("fsst_train", udaf(FsstTrainAgg))
  }

  def fsst_encode(value: Column, table: Column): Column =
    call_function("fsst_encode", value, table)
  def fsst_decode(blob: Column, table: Column): Column =
    call_function("fsst_decode", blob, table)
  /** Decode straight to `string` (the reference's `DecodeString`
    * convenience, /root/reference/table.go:914-918) — saves callers the
    * `decode(encode ..., 'UTF-8')` round-trip through binary.
    */
  def fsst_decode_string(blob: Column, table: Column): Column =
    call_function("fsst_decode_string", blob, table)
  def fsst_train(value: Column): Column = call_function("fsst_train", value)

  // ------------------------------------------------------------ kernels

  /** Per-(thread, table-bytes) kernel cache. Generated code shares
    * expression instances across tasks, and our encoder/decoder hold
    * per-instance scratch, so kernels must be thread-confined.
    */
  private val encoders = ThreadLocal.withInitial(() => new KernelCache[fsstspark.codec.fsst.FsstEncoder](
    bytes => SymbolTable.deserialize(bytes).newEncoder()))
  private val decoders = ThreadLocal.withInitial(() => new KernelCache[fsstspark.codec.fsst.FsstDecoder](
    bytes => SymbolTable.deserialize(bytes).newDecoder()))

  private final class KernelCache[K](build: Array[Byte] => K) {
    // Keyed on the exact table bytes (ByteBuffer equality = full content
    // compare): any format change keeps distinct tables distinct, unlike a
    // numeric key that could collapse leading bytes.
    private val map = new java.util.LinkedHashMap[java.nio.ByteBuffer, K](17, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[java.nio.ByteBuffer, K]): Boolean =
        size() > 16
    }
    def get(tableBytes: Array[Byte]): K = {
      val key = java.nio.ByteBuffer.wrap(tableBytes)
      var k = map.get(key)
      if (k == null) { k = build(tableBytes); map.put(key, k) }
      k
    }
  }

  private val encodeScratch = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](1 << 12))

  def encodeKernel(value: Array[Byte], tableBytes: Array[Byte]): Array[Byte] = {
    val enc = encoders.get().get(tableBytes)
    // encode into per-thread scratch, return one exact-size copy (the r1
    // shape allocated a worst-case buffer per value AND the copy)
    var out = encodeScratch.get()
    val need = 5 + Fsst.maxEncodedSize(value.length)
    if (out.length < need) {
      out = new Array[Byte](Integer.highestOneBit(need - 1) << 1)
      encodeScratch.set(out)
    }
    var p = 0
    var v = value.length
    while ((v & ~0x7f) != 0) { out(p) = ((v & 0x7f) | 0x80).toByte; p += 1; v >>>= 7 }
    out(p) = v.toByte; p += 1
    val end = enc.encode(value, 0, value.length, out, p)
    java.util.Arrays.copyOf(out, end)
  }

  def decodeKernel(blob: Array[Byte], tableBytes: Array[Byte]): Array[Byte] = {
    val dec = decoders.get().get(tableBytes)
    var p = 0
    var len = 0
    var shift = 0
    var b = blob(p) & 0xff
    while ((b & 0x80) != 0) { len |= (b & 0x7f) << shift; shift += 7; p += 1; b = blob(p) & 0xff }
    len |= b << shift; p += 1
    // corrupt-blob guard: declared size must be structurally possible
    // (≤ 8 output bytes per code byte) before allocating; the decode
    // kernel additionally bounds every store against the buffer.
    require(len >= 0 && len <= 8L * (blob.length - p),
      s"fsst_decode: corrupt blob — declared $len bytes from ${blob.length - p} code bytes")
    val out = new Array[Byte](len + 8) // +8: decoder writes one wide store past the end
    val n = dec.decode(blob, p, blob.length - p, out, 0)
    require(n == len, s"fsst_decode: expected $len bytes, got $n")
    java.util.Arrays.copyOf(out, len)
  }
}

abstract class FsstBinaryKernelExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  protected def kernelName: String // method on FsstFunctions$

  override protected def nullSafeEval(value: Any, table: Any): Any =
    kernel(value.asInstanceOf[Array[Byte]], table.asInstanceOf[Array[Byte]])
  protected def kernel(value: Array[Byte], table: Array[Byte]): Array[Byte]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = "fsstspark.functions.FsstFunctions"
    defineCodeGen(ctx, ev, (v, t) => s"$mod$$.MODULE$$.$kernelName($v, $t)")
  }
}

case class FsstEncodeExpr(left: Expression, right: Expression) extends FsstBinaryKernelExpr {
  override def prettyName: String = "fsst_encode"
  override protected def kernelName: String = "encodeKernel"
  override protected def kernel(v: Array[Byte], t: Array[Byte]): Array[Byte] =
    FsstFunctions.encodeKernel(v, t)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class FsstDecodeExpr(left: Expression, right: Expression) extends FsstBinaryKernelExpr {
  override def prettyName: String = "fsst_decode"
  override protected def kernelName: String = "decodeKernel"
  override protected def kernel(v: Array[Byte], t: Array[Byte]): Array[Byte] =
    FsstFunctions.decodeKernel(v, t)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `fsst_decode` straight to StringType: wraps the decoded bytes as a
  * UTF8String without a separate cast/copy through the `decode(…,'UTF-8')`
  * expression.
  */
case class FsstDecodeStringExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "fsst_decode_string"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, BINARY) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(blob: Any, table: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromBytes(
      FsstFunctions.decodeKernel(blob.asInstanceOf[Array[Byte]], table.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, t) =>
      "org.apache.spark.unsafe.types.UTF8String.fromBytes(" +
        s"fsstspark.functions.FsstFunctions$$.MODULE$$.decodeKernel($b, $t))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Bounded deterministic training sample as a mergeable aggregate buffer:
  * keep the `SampleK` values with the smallest xxhash-style key (a
  * bottom-k sketch — order-independent, so partial aggregation and AQE
  * reordering cannot change the result), then train one symbol table on
  * the winners. This is the distributed analogue of the reference's
  * deterministic sampler (/root/reference/train.go:273-316): bounded
  * bytes into training no matter how large the input.
  */
object FsstTrainAgg extends Aggregator[Array[Byte], FsstTrainBuf, Array[Byte]] {
  final val SampleK = 512
  final val MaxValueBytes = 4096 // cap one value's contribution, like the 512B slices

  @inline private def keyOf(v: Array[Byte]): Long = {
    var h = 1469598103934665603L
    var i = 0
    val n = math.min(v.length, 64)
    while (i < n) { h = (h ^ (v(i) & 0xff)) * 1099511628211L; i += 1 }
    h ^ v.length
  }

  def zero: FsstTrainBuf = FsstTrainBuf(Array.empty, Array.empty)
  def reduce(b: FsstTrainBuf, v: Array[Byte]): FsstTrainBuf = {
    if (v == null) return b
    val t = if (v.length > MaxValueBytes) java.util.Arrays.copyOf(v, MaxValueBytes) else v
    insert(b, keyOf(t), t)
  }
  def merge(a: FsstTrainBuf, b: FsstTrainBuf): FsstTrainBuf = {
    var out = a
    var i = 0
    while (i < b.keys.length) { out = insert(out, b.keys(i), b.values(i)); i += 1 }
    out
  }
  private def insert(b: FsstTrainBuf, k: Long, v: Array[Byte]): FsstTrainBuf = {
    // keep sorted by (key, value-bytes) — dedup exact (key,value) repeats
    val idx = java.util.Arrays.binarySearch(b.keys, k)
    if (idx >= 0 && java.util.Arrays.equals(b.values(idx), v)) return b
    if (b.keys.length >= SampleK && k >= b.keys.last) return b
    val pos = if (idx >= 0) idx else -(idx + 1)
    val n = math.min(b.keys.length + 1, SampleK)
    val keys = new Array[Long](n)
    val values = new Array[Array[Byte]](n)
    System.arraycopy(b.keys, 0, keys, 0, pos)
    System.arraycopy(b.values, 0, values, 0, pos)
    keys(pos) = k
    values(pos) = v
    val tail = n - pos - 1
    System.arraycopy(b.keys, pos, keys, pos + 1, tail)
    System.arraycopy(b.values, pos, values, pos + 1, tail)
    FsstTrainBuf(keys, values)
  }
  def finish(b: FsstTrainBuf): Array[Byte] = FsstTrainer.train(b.values).serialize()
  def bufferEncoder: Encoder[FsstTrainBuf] = Encoders.product[FsstTrainBuf]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

final case class FsstTrainBuf(keys: Array[Long], values: Array[Array[Byte]])
