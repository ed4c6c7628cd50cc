package fsstspark.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), Spark-first:
  *
  * - cosine similarity is a pure Catalyst expression
  *   (`aggregate(zip_with(...))` — whole-stage-codegen'd, no UDF);
  * - the brute-force baseline broadcasts the (small) query set against the
  *   corpus — scan stays narrow, no shuffle of the corpus;
  * - the scale path buckets vectors with signed-random-projection LSH
  *   (bucket computed in one narrow typed map, planes derived from a
  *   counter hash so nothing ships) so candidate generation is an
  *   equi-join on bucket id instead of a full cross product, then
  *   re-ranks candidates exactly.
  */
object AnnSearch {

  /** Cosine similarity of two `array<float>`/`array<double>` columns as a
    * custom codegen Catalyst expression ([[fsstspark.functions.CosineSimExpr]]).
    * The `aggregate(zip_with(...))` built-in formulation is semantically
    * identical but evaluates its lambdas interpreted (boxed per element);
    * the custom expression is a primitive loop inside whole-stage codegen
    * — ~30× faster on 64-dim embeddings.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.FsstSqlBridge
    FsstSqlBridge.column(fsstspark.functions.CosineSimExpr(
      FsstSqlBridge.expression(a), FsstSqlBridge.expression(b)))
  }

  /** Exact brute-force top-k: every query against every corpus vector,
    * ranked per query. Queries must be small enough to broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), cosine(col("vec"), col("query_vec")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k) // result order is the caller's choice

  }

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Executor-local cache of ±1 hyperplane sign tables, keyed by
    * (table, nBits, dim) and flattened [bit][dim]. The planes are a pure
    * function of a counter hash, so each executor derives them once
    * (~nBits×dim bytes) instead of re-hashing per ROW — at typical LSH
    * settings that was ~12k `mix64` calls per vector, all recomputing the
    * same constants. Nothing ships in closures; contents are identical on
    * every executor by construction.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Byte]]()

  private def planes(table: Int, nBits: Int, dim: Int): Array[Byte] =
    planeCache.computeIfAbsent((table, nBits, dim), { key =>
      val (t, nb, d) = key
      val out = new Array[Byte](nb * d)
      var b = 0
      while (b < nb) {
        var i = 0
        while (i < d) {
          out(b * d + i) =
            if ((mix64((t.toLong << 40) ^ (b.toLong << 20) ^ i.toLong) & 1L) == 0L) 1 else -1
          i += 1
        }
        b += 1
      }
      out
    })

  /** Signed-random-projection bucket for one table: bit b = sign of the
    * dot product with a ±1 hyperplane derived from mix64(table, b, dim)
    * (precomputed per executor — see [[planes]]; bucket values are
    * bit-identical to the derive-per-row formulation).
    */
  def srpBucket(vec: Array[Float], nBits: Int, table: Int): Long = {
    val p = planes(table, nBits, vec.length)
    val dim = vec.length
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var d = 0
      val off = b * dim
      while (d < dim) {
        dot += vec(d) * p(off + d)
        d += 1
      }
      if (dot > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** IVF (inverted-file) ANN: a coarse quantizer trained by Lloyd's
    * k-means on a deterministic bottom-k-by-hash sample partitions the
    * corpus into centroid buckets (one narrow map with broadcast
    * centroids); a query probes its `nProbe` nearest centroids and
    * exact-reranks only those buckets' vectors. Candidate generation is
    * an equi-join on centroid id — the classic IVF-Flat layout, which at
    * cluster scale becomes a bucket-partitioned table and a pruned scan.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 64, nProbe: Int = 8, sampleK: Int = 2048,
      iters: Int = 8
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    // deterministic training sample: smallest xxhash64(id) wins — order-
    // and partitioning-independent
    val sample = base.orderBy(xxhash64(col("id"))).limit(sampleK)
      .as[(Long, Array[Float])].collect().map(v => normalize(v._2))
    val centroids = kmeans(sample, math.min(nCentroids, math.max(sample.length, 1)), iters)
    val bc = spark.sparkContext.broadcast(centroids)

    // ids-only candidate generation: the bucket join and the distinct
    // dedup shuffle rows of two longs — embeddings never travel until the
    // (much smaller) candidate set joins them back for exact scoring
    // (mirrors [[Dedup.embeddingPairs]]).
    val assigned = base.as[(Long, Array[Float])]
      .map { case (id, v) => (nearestCentroids(bc.value, normalize(v), 1)(0), id) }
      .toDF("centroid", "id")
    val probes = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        nearestCentroids(bc.value, normalize(qv), nProbe).map(c => (c, qid))
      }
      .toDF("centroid", "query_id")
    val cand = assigned.join(broadcast(probes), Seq("centroid"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id").distinct()
    val qv = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
    val scored = cand.join(base, Seq("id")).join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("id"),
        cosine(col("vec"), col("query_vec")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k) // result order is the caller's choice

  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val s = if (n == 0) 1.0 else 1.0 / math.sqrt(n)
    val out = new Array[Float](v.length)
    i = 0
    while (i < v.length) { out(i) = (v(i) * s).toFloat; i += 1 }
    out
  }

  /** Lloyd's k-means over unit vectors (L2 on unit sphere ≍ cosine).
    * Deterministic: init = first k sample vectors, fixed iteration count,
    * empty clusters re-seeded from the sample round-robin.
    */
  private[textops] def kmeans(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    if (sample.isEmpty) return Array(Array(1.0f))
    val dim = sample(0).length
    var centroids = Array.tabulate(math.min(k, sample.length))(i => sample(i).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      var s = 0
      while (s < sample.length) {
        val c = nearestCentroids(centroids, sample(s), 1)(0)
        var d = 0
        while (d < dim) { sums(c)(d) += sample(s)(d); d += 1 }
        counts(c) += 1
        s += 1
      }
      centroids = Array.tabulate(centroids.length) { c =>
        if (counts(c) == 0) sample(c % sample.length).clone()
        else normalize(Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat))
      }
      it += 1
    }
    centroids
  }

  /** Indices of the `n` nearest centroids by dot product (unit vectors). */
  private[textops] def nearestCentroids(centroids: Array[Array[Float]], v: Array[Float], n: Int): Array[Int] = {
    val scores = centroids.map { c =>
      var dot = 0.0
      var i = 0
      val m = math.min(c.length, v.length)
      while (i < m) { dot += c(i) * v(i); i += 1 }
      dot
    }
    scores.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(n).map(_._2)
  }

  /** LSH-bucketed ANN: candidates share an SRP bucket in at least one of
    * `nTables` tables (equi-join on (table, bucket)), then exact cosine
    * re-rank of the candidate set. Recall < 1.0 by construction; raising
    * `nTables` (or lowering `nBits`) trades cost for recall.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nBits: Int = 10, nTables: Int = 8
  ): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // ids-only bucket rows: the equi-join and the candidate distinct move
    // (table, bucket, id) longs, never vectors — the candidate exchange
    // row width is 2 longs (mirrors [[Dedup.embeddingPairs]]); vectors
    // join back only for the exact re-rank of the candidate set.
    def withBuckets(df: DataFrame, idName: String): DataFrame =
      df.select(col(idCol).cast("long").as(idName), col(vecCol).as("__vec"))
        .as[(Long, Array[Float])]
        .flatMap { case (id, vec) =>
          Iterator.tabulate(nTables)(t => (id, t, srpBucket(vec, nBits, t)))
        }
        .toDF(idName, "table", "bucket")
    val c = withBuckets(corpus, "id")
    val q = withBuckets(queries, "query_id")
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id").distinct()
    val cv = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val qv = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("query_vec"))
    val scored = cand.join(cv, Seq("id")).join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("id"),
        cosine(col("vec"), col("query_vec")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k) // result order is the caller's choice

  }
}
