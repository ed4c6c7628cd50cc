package fsstspark.tools

import fsstspark.textops.AnnSearch

/** Same-JVM interleaved A/B of SRP bucket assignment: the shipped
  * precomputed-plane [[AnnSearch.srpBucket]] vs the derive-per-row
  * formulation it replaced (kept here verbatim as the baseline). Outputs
  * must be bit-identical; the measurement is buckets/sec over a synthetic
  * corpus at the `ann_lsh`/`dedup_embedding` settings.
  *
  * Usage: runMain fsstspark.tools.SrpAB [nVecs] [dim] [nBits] [nTables] [reps]
  */
object SrpAB {

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The pre-r4 formulation: hyperplane signs re-derived per row. */
  private def srpBucketDerive(vec: Array[Float], nBits: Int, table: Int): Long = {
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) {
        val sign = if ((mix64((table.toLong << 40) ^ (b.toLong << 20) ^ d.toLong) & 1L) == 0L) 1.0 else -1.0
        dot += vec(d) * sign
        d += 1
      }
      if (dot > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toInt else 20000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nBits = if (args.length > 2) args(2).toInt else 12
    val nTables = if (args.length > 3) args(3).toInt else 8
    val reps = if (args.length > 4) args(4).toInt else 5
    val rnd = new java.util.Random(42)
    val vecs = Array.fill(nVecs)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))

    def run(f: (Array[Float], Int, Int) => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      var acc = 0L
      var i = 0
      while (i < nVecs) {
        var t = 0
        while (t < nTables) { acc ^= f(vecs(i), nBits, t); t += 1 }
        i += 1
      }
      ((System.nanoTime() - t0) / 1e9, acc)
    }

    // warmup both
    run(srpBucketDerive); run(AnnSearch.srpBucket)
    var bestA = Double.MaxValue
    var bestB = Double.MaxValue
    var accA = 0L
    var accB = 0L
    for (_ <- 1 to reps) { // interleaved: both variants see the same JVM state
      val (ta, aa) = run(srpBucketDerive)
      val (tb, ab) = run(AnnSearch.srpBucket)
      require(aa == ab, "variant outputs diverge — precomputed planes are wrong")
      bestA = math.min(bestA, ta); accA = aa
      bestB = math.min(bestB, tb); accB = ab
    }
    val rate = (t: Double) => nVecs.toLong * nTables / t / 1e6
    println(f"[srp-ab] derive-per-row best=${bestA}%.3fs (${rate(bestA)}%.2f Mbuckets/s) " +
      f"precomputed best=${bestB}%.3fs (${rate(bestB)}%.2f Mbuckets/s) speedup=${bestA / bestB}%.1f× " +
      f"identical_output=${accA == accB}")
  }
}
