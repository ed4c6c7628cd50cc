package fsstspark.gen

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page row — the north-rule input shape
  * (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Deterministic Common-Crawl-style page synthesizer (FIXTURES.md §3).
  *
  * Row content is a pure function of `(seed, rowId)` via a counter-based
  * splitmix64 RNG — no partition-order dependence, so any partitioning of
  * `spark.range` produces identical rows and reruns are byte-stable. The
  * generator runs distributed (`spark.range(n).map`), so corpus size is
  * bounded by cluster storage, not driver memory.
  *
  * Skew knob: fraction `skew` of rows get text inflated ~64×, modeling the
  * giant-page tail that motivates salted repartitioning (SURVEY.md N7).
  */
object PagesGen {

  /** Fixed vocabulary with natural-ish English statistics — repetitive,
    * structured text is FSST's sweet spot (/root/reference/doc.go:11-16).
    */
  private val words: Array[String] = (
    "the of and to in is was he for it with as his on be at by had not are but from or have an they which one you were her all " +
      "she there would their we him been has when who will more no if out so said what up its about into than them can only other " +
      "new some could time these two may then do first any my now such like our over man me even most made after also did many " +
      "before must through years where much your way well down should because each just those people too state never how little " +
      "good world make very year still see own work men day get here between both life being under three general war army enemy " +
      "force attack ground victory supreme importance tactics strategy signs camp march troops spies provisions weapons"
  ).split(' ')

  private val langs = Array("en", "en", "en", "en", "de", "fr", "es", "zh", "ru", "pt")
  private val tlds = Array("com", "org", "net", "io", "edu")
  private val epoch2025 = 1735689600L // 2025-01-01T00:00:00Z, seconds

  @inline private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def page(seed: Long, rowId: Long, skew: Double): Page = page(seed, rowId, skew, 1.0)

  /** @param wordsScale multiplies the text length (1.0 ≈ 40–400 words ≈
    *   0.25–2.5 KB; real Common-Crawl text averages several KB — use ~6
    *   for realistic page sizes)
    */
  def page(seed: Long, rowId: Long, skew: Double, wordsScale: Double): Page = {
    val r0 = mix(seed ^ (rowId * 0x2545f4914f6cdd1dL))
    // Zipf-ish host popularity: square a uniform to skew toward low ids.
    val u = ((r0 >>> 11).toDouble / (1L << 53).toDouble)
    val host = (u * u * 1000).toInt
    val r1 = mix(r0)
    val pathWords = 1 + (r1 & 3).toInt
    val sb = new StringBuilder("https://www.site")
    sb.append(host).append('.').append(tlds((host % tlds.length + tlds.length) % tlds.length))
    var r = r1
    var i = 0
    while (i < pathWords) {
      r = mix(r)
      sb.append('/').append(words(java.lang.Long.remainderUnsigned(r, words.length.toLong).toInt))
      i += 1
    }
    sb.append('/').append(rowId)
    val url = sb.toString

    r = mix(r)
    val isGiant = java.lang.Long.remainderUnsigned(r, 1000000L) < (skew * 1000000L).toLong
    r = mix(r)
    val baseWords = ((40 + java.lang.Long.remainderUnsigned(r, 360L).toInt) * wordsScale).toInt
    val nWords = if (isGiant) baseWords * 64 else baseWords
    val text = {
      val t = new StringBuilder(nWords * 6)
      var k = 0
      while (k < nWords) {
        r = mix(r)
        if (k > 0) t.append(if (k % 13 == 0) ". " else " ")
        t.append(words(java.lang.Long.remainderUnsigned(r, words.length.toLong).toInt))
        k += 1
      }
      t.append('.').toString
    }
    val lang = langs(java.lang.Long.remainderUnsigned(mix(r), langs.length.toLong).toInt)
    val html =
      (s"<html><head><meta charset=utf-8><title>${words(host % words.length)}</title></head>" +
        s"<body><article><p>$text</p></article></body></html>").getBytes("UTF-8")
    val ts = new java.sql.Timestamp((epoch2025 + rowId) * 1000L)
    Page(url, ts, html, text, lang)
  }

  def pages(spark: SparkSession, nRows: Long, seed: Long = 42L, skew: Double = 0.002,
      numPartitions: Int = 0, wordsScale: Double = 1.0): Dataset[Page] = {
    import spark.implicits._
    val base = if (numPartitions > 0) spark.range(0, nRows, 1, numPartitions) else spark.range(nRows)
    base.map(id => page(seed, id, skew, wordsScale))
  }
}
