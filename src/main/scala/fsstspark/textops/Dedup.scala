package fsstspark.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large text corpora: MinHash+LSH and
  * SimHash, with exact n-gram Jaccard verification of candidate pairs.
  *
  * Scale shape (the part that matters at 10^12 docs): signatures are
  * computed in one narrow pass (`map`, no shuffle); candidate generation
  * is a single `groupBy(band, hash)` shuffle of (band_hash, doc_id) pairs
  * — tiny rows — never a cross join; exact verification joins texts back
  * only for the candidate pairs (a vanishing fraction of n²).
  */
/** Pairs plus the recall-accounting side channel: `droppedBuckets` has one
  * row per hot bucket excluded from candidate generation
  * (`method, bucket_a, bucket_b, n_members`) — at 100 TB that recall loss
  * must be a queryable data output, not a log line. Both frames are lazy;
  * materializing one does not compute the other.
  */
final case class DedupResult(
    pairs: org.apache.spark.sql.DataFrame,
    droppedBuckets: org.apache.spark.sql.DataFrame)

object Dedup {

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Word-level k-shingle hashes of a document (lowercased, whitespace
    * tokenized). Returns distinct shingle hashes.
    */
  def shingles(text: String, k: Int = 3): Array[Long] = {
    val tokens = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < k) {
      if (tokens.isEmpty) Array.empty
      else Array(mix64(tokens.mkString(" ").hashCode.toLong))
    } else {
      val out = new java.util.HashSet[Long]()
      var i = 0
      while (i + k <= tokens.length) {
        var h = 1125899906842597L
        var j = i
        while (j < i + k) {
          var t = 0
          val w = tokens(j)
          while (t < w.length) { h = 31 * h + w.charAt(t); t += 1 }
          h = mix64(h)
          j += 1
        }
        out.add(h)
        i += 1
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator()
      var n = 0
      while (it.hasNext) { arr(n) = it.next(); n += 1 }
      arr
    }
  }

  /** MinHash signature: m independent permutations via seeded mixing. */
  def minhash(shingleHashes: Array[Long], m: Int = 64): Array[Long] = {
    val sig = Array.fill(m)(Long.MaxValue)
    var i = 0
    while (i < shingleHashes.length) {
      val s = shingleHashes(i)
      var p = 0
      while (p < m) {
        val h = mix64(s ^ (p.toLong * 0xc2b2ae3d27d4eb4fL))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  def exactJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** 64-bit SimHash over word tokens (unit weights). */
  def simhash(text: String): Long = {
    val acc = new Array[Int](64)
    val tokens = text.toLowerCase.split("\\s+")
    var i = 0
    while (i < tokens.length) {
      if (tokens(i).nonEmpty) {
        val h = mix64(tokens(i).hashCode.toLong)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param docs      (id, text) rows
    * @param threshold exact word-k-shingle Jaccard cutoff for a pair
    * @param m         signature length; bands of `r` rows → b = m/r bands
    */
  /** @param hotBucketSample when > 0, hot buckets are SAMPLED down to this
    *   many members (deterministic smallest-hash winners) instead of
    *   dropped entirely — partial recall inside degenerate buckets at a
    *   bounded sample² candidate cost. 0 (default) drops hot buckets:
    *   their members are exact-dup-scale groups, which exact dedup
    *   handles without pairwise enumeration.
    */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 3, m: Int = 64, r: Int = 4,
      maxBucketSize: Int = 1000, hotBucketSample: Int = 0
  ): DataFrame =
    minhashDedup(docs, idCol, textCol, threshold, k, m, r, maxBucketSize, hotBucketSample).pairs

  def minhashDedup(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 3, m: Int = 64, r: Int = 4,
      maxBucketSize: Int = 1000, hotBucketSample: Int = 0
  ): DedupResult = {
    val spark = docs.sparkSession
    import spark.implicits._
    val b = m / r
    // one narrow pass: id → (shingles kept for verify) + banded signature
    val sigs = docs.select(col(idCol).cast("string").as("id"), col(textCol).as("text"))
      .as[(String, String)]
      .map { case (id, text) =>
        val sh = shingles(if (text == null) "" else text, k)
        val sig = minhash(sh, m)
        val bands = Array.tabulate(b) { bi =>
          var h = bi.toLong * 0x9e3779b97f4a7c15L
          var j = bi * r
          while (j < (bi + 1) * r) { h = mix64(h ^ sig(j)); j += 1 }
          h
        }
        (id, bands)
      }.toDF("id", "bands")
    // candidate pairs: docs sharing any band bucket (shuffle of small rows).
    // Degenerate buckets (boilerplate/empty docs hashing identically) are
    // dropped before the self-join — at corpus scale one hot bucket of B
    // docs would otherwise contribute B² candidate rows. Members of a
    // dropped bucket still pair through their other b-1 bands unless they
    // collide everywhere (i.e. are exact-dup-scale groups, which exact
    // dedup handles more cheaply than pairwise enumeration).
    val rawBuckets = sigs.select(col("id"), posexplode(col("bands")).as(Seq("band", "bhash")))
    val hotCounts = hotBuckets(rawBuckets.groupBy("band", "bhash").count(), maxBucketSize)
    val hot = hotCounts.drop("count")
    val cold = rawBuckets.join(broadcast(hot), Seq("band", "bhash"), "left_anti")
    val buckets =
      if (hotBucketSample <= 0) cold
      else {
        // deterministic sample per hot bucket: the `hotBucketSample`
        // members with the smallest id-hash survive (shuffle only of the
        // hot-bucket rows; candidate cost bounded at sample²/2 per bucket)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bhash").orderBy(xxhash64(col("id"), col("bhash")), col("id"))
        val sampled = rawBuckets.join(broadcast(hot), Seq("band", "bhash"), "left_semi")
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= hotBucketSample).drop("__rk")
        cold.unionByName(sampled)
      }
    val l = buckets.as("l")
    val rgt = buckets.as("r")
    val cand = l.join(rgt,
        col("l.band") === col("r.band") && col("l.bhash") === col("r.bhash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    // exact verification joins text back for candidates only
    val texts = docs.select(col(idCol).cast("string").as("id"), col(textCol).as("text"))
    val verified = cand
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
      .select("id_a", "id_b", "text_a", "text_b")
      .as[(String, String, String, String)]
      .map { case (ia, ib, ta, tb) =>
        (ia, ib, exactJaccard(shingles(ta, k), shingles(tb, k)))
      }.toDF("id_a", "id_b", "jaccard")
    // No terminal sort: pair order is the CALLER's concern (a driver
    // compare orders explicitly; a production pair pipeline must not pay
    // a global sort it doesn't need).
    DedupResult(
      verified.filter(col("jaccard") >= threshold),
      droppedMetrics(hotCounts, "minhash", "band", "bhash"))
  }

  /** SimHash near-duplicate pairs: fingerprints within `maxHamming` bits.
    * Block-permutation LSH: split the 64-bit fingerprint into
    * `maxHamming+1` blocks — any pair within the distance shares at least
    * one exact block (pigeonhole), so candidates come from equi-joins on
    * (block_idx, block_value), never a cross join.
    */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
      maxBucketSize: Int = 1000
  ): DataFrame =
    simhashDedup(docs, idCol, textCol, maxHamming, maxBucketSize).pairs

  def simhashDedup(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
      maxBucketSize: Int = 1000
  ): DedupResult = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks
    val fps = docs.select(col(idCol).cast("string").as("id"), col(textCol).as("text"))
      .as[(String, String)]
      .map { case (id, t) => (id, simhash(if (t == null) "" else t)) }
      .toDF("id", "fp")
    val rawBlocks = fps.select(col("id"), col("fp"),
      explode(array((0 until nBlocks).map { bi =>
        struct(lit(bi).as("block"),
          shiftrightunsigned(col("fp"), bi * width)
            .bitwiseAND(lit((1L << width) - 1)).as("bval"))
      }: _*)).as("blk"))
      .select(col("id"), col("fp"), col("blk.block"), col("blk.bval"))
    // Same hot-bucket guard as minhash: boilerplate/empty docs share one
    // block value, and a bucket of B docs is B² candidate rows in the
    // self-join. Members of a dropped bucket still pair through their
    // other blocks; a group colliding in EVERY block is an
    // exact-duplicate-scale cluster, which exact dedup (md5 group-by)
    // catches without pairwise enumeration.
    val hotCounts = hotBuckets(rawBlocks.groupBy("block", "bval").count(), maxBucketSize)
    val blocks = rawBlocks.join(broadcast(hotCounts.drop("count")), Seq("block", "bval"), "left_anti")
    val l = blocks.as("l")
    val r = blocks.as("r")
    val cand = l.join(r,
        col("l.block") === col("r.block") && col("l.bval") === col("r.bval") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.fp").as("fp_a"), col("r.fp").as("fp_b")).distinct()
    DedupResult(
      cand.withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
        .filter(col("hamming") <= maxHamming)
        .select("id_a", "id_b", "hamming"), // ordering is the caller's choice
      droppedMetrics(hotCounts, "simhash", "block", "bval"))
  }

  /** Embedding-cosine near-duplicate pairs: documents whose embedding
    * vectors have cosine ≥ `threshold`. Scale shape mirrors the other LSH
    * dedups — signed-random-projection buckets ([[AnnSearch.srpBucket]])
    * generate candidates via an equi-join on (table, bucket) with the
    * hot-bucket guard, ids-only candidates are deduped, vectors join back
    * for the exact cosine (codegen expression) on candidates only. Never
    * an all-pairs cross join.
    */
  def embeddingPairs(
      vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, nBits: Int = 12, nTables: Int = 8,
      maxBucketSize: Int = 1000
  ): DataFrame =
    embeddingDedup(vecs, idCol, vecCol, threshold, nBits, nTables, maxBucketSize).pairs

  def embeddingDedup(
      vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.9, nBits: Int = 12, nTables: Int = 8,
      maxBucketSize: Int = 1000
  ): DedupResult = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val buckets0 = vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        Iterator.tabulate(nTables)(t => (id, t, AnnSearch.srpBucket(v, nBits, t)))
      }
      .toDF("id", "table", "bucket")
    val hotCounts = hotBuckets(buckets0.groupBy("table", "bucket").count(), maxBucketSize)
    val buckets = buckets0.join(broadcast(hotCounts.drop("count")), Seq("table", "bucket"), "left_anti")
    val l = buckets.as("l")
    val r = buckets.as("r")
    val cand = l.join(r,
        col("l.table") === col("r.table") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    val vv = vecs.select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"))
    val pairs = cand
      .join(vv.withColumnRenamed("vid", "id_a").withColumnRenamed("v", "vec_a"), "id_a")
      .join(vv.withColumnRenamed("vid", "id_b").withColumnRenamed("v", "vec_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        AnnSearch.cosine(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= threshold) // ordering is the caller's choice
    DedupResult(pairs, droppedMetrics(hotCounts, "embedding", "table", "bucket"))
  }

  /** Buckets over the cap — lazy (one aggregated row per hot bucket; cheap
    * enough to recompute for its consumers, so no persist to leak and no
    * eager job at DataFrame-construction time). Pairs confined to a hot
    * bucket are not enumerated; the loss is accounted in
    * [[DedupResult.droppedBuckets]] — exact-duplicate-scale groups are
    * exact dedup's job, not pairwise enumeration's.
    */
  private def hotBuckets(bucketCounts: DataFrame, maxBucketSize: Int): DataFrame =
    bucketCounts.filter(col("count") > maxBucketSize)

  /** Normalized dropped-bucket accounting rows. */
  private def droppedMetrics(hotCounts: DataFrame, method: String,
      keyA: String, keyB: String): DataFrame =
    hotCounts.select(lit(method).as("method"),
      col(keyA).cast("long").as("bucket_a"), col(keyB).cast("long").as("bucket_b"),
      col("count").as("n_members"))
}
