package fsstspark.codec.fsst

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

/** Golden compressed-size ceilings per reference corpus (BASELINE.md).
  *
  * The Go reference can't run in this sandbox, so per SURVEY.md §5 the
  * committed ceilings are our encoder's measured output (same algorithm,
  * constants, and match order as the reference: 255 symbols, 5 rounds,
  * gain=count×len with 8× single boost, suffixLim-gated greedy) plus 2%
  * slack. All ratios sit inside the reference's documented 1.5–3×
  * band (doc.go:16 ⇒ 0.33–0.67 compressed/original). Any codec change
  * that regresses compression fails here.
  */
class GoldenRatioSpec extends AnyFunSuite {
  // corpus → golden ratio (measured 2026-08-17, line-split, excl. table)
  private val golden = Map(
    "art_of_war.txt" -> 0.4938,
    "en_mobydick.txt" -> 0.5366,
    "zh_tao_te_ching_en.txt" -> 0.5475,
    "logs_apache_2k.log" -> 0.3187,
    "logs_hdfs_2k.log" -> 0.4155
  )

  for ((name, ceiling) <- golden.toSeq.sortBy(_._1)) {
    test(s"corpus $name compresses to ≤ ${ceiling} (+2% slack)") {
      val p = Paths.get(s"/root/reference/testdata/$name")
      assume(Files.exists(p), s"$name missing (reference skips too)")
      val values = new String(Files.readAllBytes(p), UTF_8)
        .split("\n", -1).map(_.getBytes(UTF_8))
      val table = FsstTrainer.train(values)
      val enc = table.newEncoder()
      var in = 0L
      var out = 0L
      values.foreach { v => in += v.length; out += enc.encodeAll(v).length }
      val ratio = out.toDouble / math.max(in, 1)
      assert(ratio <= ceiling * 1.02, f"ratio $ratio%.4f exceeds golden $ceiling%.4f")
      assert(ratio >= 0.1, "suspiciously good — check the measurement")
    }
  }

  test("golden serialized-table size per corpus (format regression guard)") {
    // measured 2026-08-17 (version word + code counts + lens + symbol
    // bytes); a table-FORMAT change shifts these immediately, so the band
    // is tight: ±15% around the committed measurement.
    val goldenSize = Map(
      "art_of_war.txt" -> 497,
      "en_mobydick.txt" -> 617,
      "logs_hdfs_2k.log" -> 726
    )
    for ((name, size) <- goldenSize.toSeq.sortBy(_._1)) {
      val p = Paths.get(s"/root/reference/testdata/$name")
      assume(Files.exists(p), s"$name missing (reference skips too)")
      val values = new String(Files.readAllBytes(p), UTF_8)
        .split("\n", -1).map(_.getBytes(UTF_8))
      val b = FsstTrainer.train(values).serialize()
      assert(b.length >= (size * 0.85).toInt && b.length <= (size * 1.15).toInt,
        s"$name: serialized table ${b.length} B outside golden $size B ±15%")
      assert(b.length <= 8192, "reference ceiling: ≤ 8 KB serialized")
    }
  }
}
