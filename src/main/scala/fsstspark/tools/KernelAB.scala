package fsstspark.tools

import fsstspark.codec.fsst.{Fsst, FsstTrainer}
import java.nio.file.{Files, Paths}

/** Same-JVM interleaved A/B of the base encode kernel vs the split-loop
  * variant (window-boundary checks hoisted out of the hot loop) — the only
  * methodology that resolves single-digit deltas on this shared host
  * (BASELINE.md). Asserts byte-identical output first (the transform is
  * output-identical by construction), then alternates variants across
  * rounds so host drift hits both equally.
  *
  * Usage: runMain fsstspark.tools.KernelAB [rounds] [repsPerRound] [file...]
  */
object KernelAB {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.length > 0) args(0).toInt else 8
    val reps = if (args.length > 1) args(1).toInt else 15
    val files =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("/root/reference/testdata/en_mobydick.txt",
        "/root/reference/testdata/logs_hdfs_2k.log",
        "/root/reference/testdata/art_of_war.txt")

    for (path <- files if Files.exists(Paths.get(path))) {
      val input = Files.readAllBytes(Paths.get(path))
      val table = FsstTrainer.train(Array(input))
      val enc = table.newEncoder()
      val dst = new Array[Byte](Fsst.maxEncodedSize(input.length))

      // identity check: both variants must emit the same bytes
      enc.useSplitKernel = false
      val a = enc.encodeAll(input)
      enc.useSplitKernel = true
      val b = enc.encodeAll(input)
      require(java.util.Arrays.equals(a, b),
        s"$path: split kernel output differs (${a.length} vs ${b.length} bytes)")

      def bestOf(split: Boolean): Double = {
        enc.useSplitKernel = split
        var best = Double.MaxValue
        var r = 0
        while (r < reps) {
          val t0 = System.nanoTime()
          enc.encode(input, 0, input.length, dst, 0)
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt < best) best = dt
          r += 1
        }
        input.length / 1e6 / best
      }

      // untimed warmup of both paths (JIT both kernels)
      bestOf(false); bestOf(true); bestOf(false); bestOf(true)

      val baseBests = new Array[Double](rounds)
      val splitBests = new Array[Double](rounds)
      for (r <- 0 until rounds) {
        // alternate which variant goes first within the round
        if (r % 2 == 0) { baseBests(r) = bestOf(false); splitBests(r) = bestOf(true) }
        else { splitBests(r) = bestOf(true); baseBests(r) = bestOf(false) }
      }
      val bBase = baseBests.max
      val bSplit = splitBests.max
      val name = Paths.get(path).getFileName
      println(f"$name base : best=${bBase}%.1f MB/s  rounds=${baseBests.map(v => f"$v%.0f").mkString(",")}")
      println(f"$name split: best=${bSplit}%.1f MB/s  rounds=${splitBests.map(v => f"$v%.0f").mkString(",")}")
      println(f"$name delta: ${(bSplit / bBase - 1) * 100}%+.1f%% (split vs base, best-of-all-rounds)")
      enc.useSplitKernel = false
    }
  }
}
