package fsstspark.tools

import fsstspark.codec.fsst.{Fsst, FsstTrainer}
import java.nio.file.{Files, Paths}

/** Raw kernel micro-benchmark: times encode/decode loops alone, with
  * pre-allocated buffers, no per-call allocation or comparison.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/root/reference/testdata/en_mobydick.txt"
    val input = Files.readAllBytes(Paths.get(path))
    val table = FsstTrainer.train(Array(input))
    var tBest = Double.MaxValue
    for (_ <- 0 until 40) {
      val t0 = System.nanoTime()
      FsstTrainer.train(Array(input))
      val dt = (System.nanoTime() - t0) / 1e6
      if (dt < tBest) tBest = dt
    }
    println(f"train: $tBest%.2f ms (best of 40, ≤32KB sample)")
    val enc = table.newEncoder()
    val dec = table.newDecoder()

    val encDst = new Array[Byte](Fsst.maxEncodedSize(input.length))
    val decDst = new Array[Byte](input.length + 8)

    var encLen = 0
    var best = Double.MaxValue
    for (r <- 0 until 40) {
      val t0 = System.nanoTime()
      encLen = enc.encode(input, 0, input.length, encDst, 0)
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
    }
    println(f"encode: ${input.length / 1e6 / best}%.1f MB/s (best of 40), ratio=${encLen.toDouble / input.length}%.4f")

    var decLen = 0
    best = Double.MaxValue
    for (r <- 0 until 40) {
      val t0 = System.nanoTime()
      decLen = dec.decode(encDst, 0, encLen, decDst, 0)
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
    }
    println(f"decode: ${input.length / 1e6 / best}%.1f MB/s (best of 40), decoded=$decLen orig=${input.length}")
    assert(decLen == input.length)
    var i = 0
    while (i < decLen) { assert(decDst(i) == input(i)); i += 1 }
    println("roundtrip ok")
  }
}
