package fsstspark.tools

import fsstspark.codec.BytesCodec
import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Pure-JVM thread-scaling probe (no Spark): runs the per-chunk auto
  * codec over C synthetic chunks on N threads. Separates machine/kernel
  * scaling from Spark scheduling/shuffle overhead when diagnosing the
  * two-parallelism benchmark.
  *
  * Usage: runMain fsstspark.tools.ThreadScalingProbe [nChunks] [valuesPerChunk] [threadsCsv]
  */
object ThreadScalingProbe {
  def main(args: Array[String]): Unit = {
    val nChunks = if (args.length > 0) args(0).toInt else 256
    val perChunk = if (args.length > 1) args(1).toInt else 1500
    val threadLevels = (if (args.length > 2) args(2) else "1,8,32").split(",").map(_.trim.toInt)

    // deterministic synthetic text values, ~1.4 KB each
    val words = "the quick brown fox jumps over lazy dogs and runs through fields of green grass".split(' ')
    def chunkValues(c: Int): Array[Array[Byte]] = {
      var seed = c * 0x9e3779b97f4a7c15L
      Array.tabulate(perChunk) { i =>
        val sb = new StringBuilder(256)
        var k = 0
        while (k < 220) {
          seed = seed * 6364136223846793005L + 1442695040888963407L
          sb.append(words(((seed >>> 33) % words.length).toInt)).append(' ')
          k += 1
        }
        sb.toString.getBytes("UTF-8")
      }
    }
    val chunks = Array.tabulate(nChunks)(chunkValues)
    val totalBytes = chunks.map(_.map(_.length.toLong).sum).sum
    println(f"corpus: $nChunks chunks × $perChunk values = ${totalBytes / 1e6}%.1f MB")

    for (t <- threadLevels) {
      val pool = Executors.newFixedThreadPool(t)
      def run(): Long = {
        val tasks = chunks.map { c =>
          new Callable[Long] { def call(): Long = BytesCodec.encodeAuto(c).blob.length.toLong }
        }
        val futures = pool.invokeAll(java.util.Arrays.asList(tasks: _*))
        var s = 0L
        futures.forEach(f => s += f.get())
        s
      }
      run() // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"threads=$t%2d: best=${best}%.2fs → ${totalBytes / 1e9 / best}%.3f GB/s (runs: ${times.map(x => f"$x%.2f").mkString(", ")})")
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
    }
  }
}
