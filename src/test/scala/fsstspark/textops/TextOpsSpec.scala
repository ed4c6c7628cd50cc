package fsstspark.textops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("fsstspark-textops-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def syntheticDocs(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
    val base = (0 until 20).map { i =>
      (i.toLong, Seq.fill(80)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    // planted near-dups: copy with a short appended tail
    val dups = base.filter(_._1 % 4 == 0).map { case (id, t) =>
      (id + 1000, t + " tail marker")
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("minhash LSH finds planted near-duplicates, no false positives above threshold") {
    val docs = syntheticDocs()
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong, r.getDouble(2)))
    val planted = Set(0L, 4L, 8L, 12L, 16L).map(i => (i, i + 1000))
    val found = pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    assert(planted.subsetOf(found), s"missing planted pairs: ${planted -- found}")
    // random 80-word docs from a 16-word vocab share most 1-grams but few 3-shingles
    assert(pairs.forall(_._3 >= 0.7))
    assert(found.forall { case (a, b) => b - a == 1000 }, s"false positive pairs: $found")
  }

  test("simhash finds planted near-duplicates within hamming 3") {
    val docs = syntheticDocs()
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong))
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val planted = Set(0L, 4L, 8L, 12L, 16L).map(i => (i, i + 1000))
    assert(planted.subsetOf(pairs), s"missing planted pairs: ${planted -- pairs}")
  }

  test("simhash hot-bucket cap: 1k identical docs do not explode into pairwise candidates") {
    import spark.implicits._
    // 1000 empty/boilerplate docs share one fingerprint → every block
    // bucket is degenerate; without the cap the self-join would emit
    // ~500k candidate pairs. With the cap the job stays tiny and emits
    // none of those pairs (they are exact-dup-scale, routed to exact
    // dedup), while genuinely near pairs outside hot buckets survive.
    val boiler = (0 until 1000).map(i => (i.toLong, "the same boilerplate text"))
    val realA = (5000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    // token-identical (formatting-only) variant → hamming 0 by construction
    val realB = (5001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa  ")
    val docs = (boiler :+ realA :+ realB).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3,
      maxBucketSize = 100).collect()
    assert(pairs.length < 50, s"degenerate bucket leaked ${pairs.length} pairs")
    val ids = pairs.map(r => (r.getString(0).toLong, r.getString(1).toLong)).toSet
    assert(ids.contains((5000L, 5001L)), "genuine near-pair outside hot buckets was lost")
  }

  test("dropped-bucket accounting is a queryable data output, not a log line") {
    import spark.implicits._
    val boiler = (0 until 1000).map(i => (i.toLong, "the same boilerplate text"))
    val realA = (5000L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val realB = (5001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa  ")
    val docs = (boiler :+ realA :+ realB).toDF("doc_id", "text")
    val res = Dedup.simhashDedup(docs, "doc_id", "text", maxHamming = 3, maxBucketSize = 100)
    val dropped = res.droppedBuckets.collect()
    assert(dropped.nonEmpty, "hot buckets were dropped but not accounted")
    assert(dropped.forall(_.getAs[String]("method") == "simhash"))
    // every degenerate block bucket holds the 1000 boilerplate docs
    assert(dropped.forall(_.getAs[Long]("n_members") >= 1000L))
    // the pairs frame from the SAME result still works and keeps the genuine pair
    val ids = res.pairs.collect().map(r => (r.getString(0).toLong, r.getString(1).toLong)).toSet
    assert(ids.contains((5000L, 5001L)))
    // a benign corpus drops nothing
    val benign = Dedup.minhashDedup(syntheticDocs(), "doc_id", "text", threshold = 0.7)
    assert(benign.droppedBuckets.count() == 0)
  }

  test("minhash hot-bucket sampling fallback recovers pairs inside degenerate buckets, bounded") {
    import spark.implicits._
    // 500 identical docs: all buckets degenerate. Drop mode finds nothing;
    // sampling mode recovers sample²/2-bounded pairs from inside them.
    val docs = (0 until 500).map(i => (i.toLong, "all the same boilerplate text here")).toDF("doc_id", "text")
    val dropped = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.9,
      maxBucketSize = 100).count()
    assert(dropped == 0)
    val sampled = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.9,
      maxBucketSize = 100, hotBucketSample = 10)
    val n = sampled.count()
    assert(n > 0, "sampling fallback recovered nothing")
    // bound: each of the 16 bands samples its own 10 ids (the sample hash
    // mixes the bucket value) → ≤ bands × sample²/2 candidate pairs
    assert(n <= 16L * 10 * 9 / 2, s"sample cap exceeded: $n pairs")
  }

  test("embedding-cosine dedup finds noise-perturbed near-dups, no orthogonal false positives") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 32
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val base = (0 until 40).map(i => (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian().toFloat))))
    // planted near-dups: small additive noise (cosine ≈ 0.995)
    val dups = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      (id + 1000, unit(v.map(x => x + 0.03f * rnd.nextGaussian().toFloat)))
    }
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
    // 8-bit buckets × 16 tables: at cosine ≈0.985 the per-table bucket
    // match rate is ~0.6, so missing all 16 tables is ~1e-6 per pair
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", threshold = 0.9,
      nBits = 8, nTables = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = base.map(_._1).filter(_ % 4 == 0).map(i => (i, i + 1000)).toSet
    assert(planted.subsetOf(pairs), s"missing planted near-dups: ${planted -- pairs}")
    // independent gaussian unit vectors at dim 32: cosine ≥0.9 is astronomically unlikely
    assert(pairs == planted, s"false positives: ${pairs -- planted}")
  }

  test("exact jaccard + shingles behave on edges") {
    assert(Dedup.exactJaccard(Array.empty, Array.empty) == 1.0)
    val a = Dedup.shingles("one two three four five")
    assert(Dedup.exactJaccard(a, a) == 1.0)
    val b = Dedup.shingles("six seven eight nine ten")
    assert(Dedup.exactJaccard(a, b) == 0.0)
    assert(Dedup.shingles("").isEmpty)
    assert(Dedup.shingles("one two").nonEmpty) // shorter than k → whole-doc shingle
  }

  test("language ID identifies stopword-rich sentences") {
    assert(TextAnalysis.detectLang("the cat sat on the mat and it was happy with the sun") == "en")
    assert(TextAnalysis.detectLang("der Hund und die Katze sind mit dem Kind auf der Wiese") == "de")
    assert(TextAnalysis.detectLang("le chat est dans la maison avec les enfants et le chien") == "fr")
    assert(TextAnalysis.detectLang("el perro y el gato están en la casa con los niños") == "es")
    assert(TextAnalysis.detectLang("") == "und")
    assert(TextAnalysis.detectLang("xyzzy qwerty plugh") == "und")
  }

  test("winnowing fingerprints are shift-robust") {
    val text = "the quick brown fox jumps over the lazy dog " * 20
    val fp1 = TextAnalysis.winnow(text)
    assert(fp1.nonEmpty)
    assert(TextAnalysis.winnow(text).sameElements(fp1)) // deterministic
    val shifted = "PREFIX ADDED HERE " + text
    val fp2 = TextAnalysis.winnow(shifted)
    val shared = fp1.toSet.intersect(fp2.toSet).size.toDouble / fp1.length
    assert(shared > 0.6, s"only $shared of fingerprints survive a prefix shift")
    val other = TextAnalysis.winnow("completely different content with nothing in common at all " * 20)
    val cross = fp1.toSet.intersect(other.toSet).size
    assert(cross == 0, s"$cross fingerprints shared between unrelated texts")
  }

  test("brute-force ANN returns the true nearest neighbors") {
    import spark.implicits._
    // 1 query at the origin-ish direction; neighbors at decreasing cosine
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),
      (2L, Array(0.7f, 0.7f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = AnnSearch.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 2L, 3L))
  }

  test("IVF ANN recall on planted clusters beats LSH, near-exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(6)
    val dim = 64
    val vecs = (0 until 40).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until 6).map { m =>
        val v = center.zip(Array.fill(dim)(rnd.nextGaussian().toFloat * 0.15f)).map { case (a, b) => a + b }
        ((c * 6 + m).toLong, v)
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") % 6 === 0).limit(10)
    val exact = AnnSearch.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnSearch.ivfTopK(df, queries, "vec_id", "embedding", 5,
        nCentroids = 32, nProbe = 4, sampleK = 240)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall below 0.9 on clustered data")
  }

  test("LSH ANN finds genuinely-near neighbors (planted clusters)") {
    import spark.implicits._
    // 40 cluster centers × 6 noisy members (cosine ≈ 0.95+): LSH must
    // recover same-cluster members. (The sf testdata embeddings are
    // near-uniform — top-10 cosine ≈ 0.3 — where sub-linear ANN is
    // information-theoretically weak; planted clusters test the operator.)
    val rnd = new scala.util.Random(5)
    val dim = 64
    val vecs = (0 until 40).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until 6).map { m =>
        val v = center.zip(Array.fill(dim)(rnd.nextGaussian().toFloat * 0.15f)).map { case (a, b) => a + b }
        ((c * 6 + m).toLong, v)
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") % 6 === 0).limit(10)
    val exact = AnnSearch.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnSearch.lshTopK(df, queries, "vec_id", "embedding", 5, nBits = 8, nTables = 8)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8 on clustered data")
  }
}
