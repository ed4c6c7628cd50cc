package fsstspark.textops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-quality operators for training-data pipelines: stopword-profile
  * language ID, winnowing fingerprints, token statistics. All are narrow
  * per-row transforms (no shuffle) followed by ordinary aggregates.
  */
object TextAnalysis {

  /** Tiny built-in stopword profiles (top function words per language). */
  val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "of", "and", "to", "in", "is", "was", "that", "for", "it",
      "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"),
    "de" -> Set("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "sich",
      "des", "auf", "für", "nicht", "eine", "als", "auch", "es", "an", "werden"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "en", "un", "une",
      "du", "que", "qui", "dans", "pour", "pas", "sur", "au", "avec", "ne"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
      "es", "por", "con", "no", "para", "se", "su", "al", "lo", "como"),
    "pt" -> Set("o", "a", "os", "as", "de", "que", "e", "em", "um", "uma",
      "é", "por", "com", "não", "para", "se", "na", "no", "dos", "mais")
  )

  /** Heuristic language ID: argmax of stopword-hit ratio per profile;
    * "und" (undetermined) when no profile scores above `minScore`.
    */
  def detectLang(text: String, minScore: Double = 0.05): String = {
    if (text == null || text.isEmpty) return "und"
    val tokens = text.toLowerCase.split("[^\\p{L}']+").filter(_.nonEmpty)
    if (tokens.isEmpty) return "und"
    var best = "und"
    var bestScore = minScore
    stopwords.foreach { case (lang, sw) =>
      var hits = 0
      var i = 0
      while (i < tokens.length) { if (sw.contains(tokens(i))) hits += 1; i += 1 }
      val score = hits.toDouble / tokens.length
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    * 2003): k-char rolling hashes, keep the minimum of each window of w —
    * position-robust fingerprints for copy detection.
    */
  def winnow(text: String, k: Int = 16, w: Int = 8): Array[Long] = {
    if (text == null || text.length < k) return Array.empty
    val n = text.length - k + 1
    val hashes = new Array[Long](n)
    // polynomial rolling hash base 257
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) { h = h * 257 + text.charAt(i); if (i < k - 1) pow *= 257; i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - text.charAt(i - 1) * pow) * 257 + text.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val out = new java.util.TreeSet[Long]()
    var wStart = 0
    while (wStart + w <= n) {
      var mn = Long.MaxValue
      var j = wStart
      while (j < wStart + w) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
      out.add(mn)
      wStart += w
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var m = 0
    while (it.hasNext) { arr(m) = it.next(); m += 1 }
    arr
  }

  /** Per-doc analysis row: predicted language, token stats, fingerprints. */
  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("string").as("id"), col(textCol).as("text"))
      .as[(String, String)]
      .map { case (id, text) =>
        val t = if (text == null) "" else text
        val tokens = t.split("\\s+").count(_.nonEmpty)
        val fps = winnow(t)
        (id, detectLang(t), tokens.toLong, t.length.toLong, fps.length.toLong)
      }
      .toDF("id", "predicted_lang", "n_tokens", "n_chars", "n_fingerprints")
  }
}
