package fsstspark.queries

import fsstspark.pipeline.{Checkpoint, ChunkResult, EncodePipeline, KV, LongKV}
import fsstspark.stats.ChunkStats
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The named queries exported through `graft.SparkEntry` (driver contract).
  * Each SQL-expressible query has a DuckDB oracle in [[Oracles]]; codec
  * internals (blob sizes, codec choice) are verified by ScalaTest instead.
  *
  * Chunk ids in oracle-facing queries are `doc_id % 32` — deterministic
  * AND SQL-expressible on both engines. Production pipelines use
  * [[EncodePipeline.chunkIdByHash]] (xxhash64 of the key) instead; the
  * pipeline is agnostic to the chunking expression.
  */
object Queries {
  final val NChunks = 32

  // ------------------------------------------------------------ sources

  def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** documents.text as keyed binary values (key = doc_id). */
  def docsKV(s: SparkSession, dir: String): Dataset[KV] = {
    import s.implicits._
    documents(s, dir)
      .select(col("doc_id").cast("string").as("key"),
        encode(col("text"), "UTF-8").as("value"))
      .as[KV]
  }

  def docChunk: Column = pmod(col("key").cast("long"), lit(NChunks.toLong))

  // ------------------------------------------- core pipeline (R1-R15, N8, N10)

  /** Encode→decode documents.text and aggregate the DECODED bytes per
    * lang; hash-matches the oracle computed over the ORIGINAL column, so a
    * single corrupted byte anywhere fails the compare.
    */
  def pipeRoundtripText(s: SparkSession, dir: String): DataFrame = {
    val enc = EncodePipeline.encodeBytes(docsKV(s, dir), "text", docChunk)
    val dec = EncodePipeline.decodeBytes(enc)
    dec.join(documents(s, dir).select(col("doc_id").cast("string").as("key"), col("lang")), "key")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col("value"))).as("total_bytes"),
        countDistinct(md5(col("value"))).as("n_distinct"))
      .orderBy("lang")
  }

  /** Zero-shuffle (partition-local chunking) variant of the round-trip —
    * the Iceberg-rewrite-shaped scale path; same oracle as the hash-chunked
    * one because decoded bytes must be identical either way.
    */
  def pipeLocalRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val enc = EncodePipeline.encodeBytesLocal(docsKV(s, dir), "text", 64L << 10)
    val dec = EncodePipeline.decodeBytes(enc)
    dec.join(documents(s, dir).select(col("doc_id").cast("string").as("key"), col("lang")), "key")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col("value"))).as("total_bytes"),
        countDistinct(md5(col("value"))).as("n_distinct"))
      .orderBy("lang")
  }

  /** N10 join-and-compare surfaced as a per-lang mismatch count (must be 0). */
  def pipeVerifyJoin(s: SparkSession, dir: String): DataFrame = {
    val original = docsKV(s, dir)
    val dec = EncodePipeline.decodeBytes(EncodePipeline.encodeBytes(original, "text", docChunk))
    EncodePipeline.verify(original, dec)
      .join(documents(s, dir).select(col("doc_id").cast("string").as("key"), col("lang")), "key")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("matched"), 0L).otherwise(1L)).as("n_mismatch"))
      .orderBy("lang")
  }

  /** N9 resume semantics: chunks simulated-complete (chunk%4==0) are
    * actually encoded; the pending set is the left_anti join against their
    * emitted lineage — the exact query a restart runs.
    */
  def pipeResumePending(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kv = docsKV(s, dir)
    val all = kv.select(docChunk.cast("long").as("chunk_id")).distinct()
    val done = EncodePipeline
      .encodeBytes(kv.filter(pmod(docChunk, lit(4)) === 0).as[KV], "text", docChunk)
      .select(col("chunk_id")).distinct()
    all.join(done, Seq("chunk_id"), "left_anti").orderBy("chunk_id")
  }

  /** N6 selector outcome per codec over the documents chunks (rows-only
    * check; exact choices asserted in ScalaTest).
    */
  def pipeCodecMix(s: SparkSession, dir: String): DataFrame =
    EncodePipeline.encodeBytes(docsKV(s, dir), "text", docChunk)
      .groupBy("codec")
      .agg(count(lit(1)).as("n_chunks"), sum("n_rows").as("n_rows"),
        sum("bytes_in").as("bytes_in"), sum("bytes_out").as("bytes_out"))
      .orderBy("codec")

  // ----------------------------------------------------- stats pass (N5)

  def chunkStats(s: SparkSession, dir: String): DataFrame =
    ChunkStats.basic(documents(s, dir), pmod(col("doc_id"), lit(NChunks.toLong)), col("text"))
      .select(col("chunk_id"), col("n_rows"), col("total_bytes"),
        col("max_len").cast("long").as("max_len"), col("n_distinct"))
      .orderBy("chunk_id")

  def chunkProfile(s: SparkSession, dir: String): DataFrame =
    ChunkStats.profile(documents(s, dir), pmod(col("doc_id"), lit(NChunks.toLong)), col("text"))
      .orderBy("chunk_id")

  // ------------------------------------------- long codecs (N3, N4, FoR/delta)

  def eventsTsRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = s.read.parquet(s"$dir/events.parquet")
    val kvl = ev.select(col("event_id").cast("string").as("key"),
      unix_micros(col("ts").cast("timestamp")).as("value")).as[LongKV]
    val enc = EncodePipeline.encodeLongs(kvl, "ts", docChunk)
    val dec = EncodePipeline.decodeLongs(enc)
    dec.join(ev.select(col("event_id").cast("string").as("key"), col("event_type")), "key")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("value").as("min_us"), max("value").as("max_us"),
        countDistinct(col("value")).as("n_distinct"))
      .orderBy("event_type")
  }

  /** Auto-selection across heterogeneous lineitem columns (rows-only;
    * choices asserted in ScalaTest).
    */
  def lineitemCodecSelection(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("key", monotonicallyStableKey())
    def bytesCol(c: String): Dataset[ChunkResult] =
      EncodePipeline.encodeBytes(
        li.select(col("key"), encode(col(c), "UTF-8").as("value")).as[KV], c, rowChunk)
    def longCol(c: String, expr: Column): Dataset[ChunkResult] =
      EncodePipeline.encodeLongs(li.select(col("key"), expr.as("value")).as[LongKV], c, rowChunk)
    val all = bytesCol("l_returnflag")
      .union(bytesCol("l_linestatus"))
      .union(longCol("l_orderkey", col("l_orderkey")))
      .union(longCol("l_partkey", col("l_partkey")))
      .union(longCol("l_shipdate", unix_micros(col("l_shipdate").cast("timestamp"))))
    all.groupBy("column", "codec")
      .agg(count(lit(1)).as("n_chunks"), sum("n_rows").as("n_rows"),
        sum("bytes_in").as("bytes_in"), sum("bytes_out").as("bytes_out"))
      .orderBy("column", "codec")
  }

  /** Stable row key for tables without one: the orderkey/linenumber pair. */
  private def monotonicallyStableKey(): Column =
    concat_ws("_", col("l_orderkey"), col("l_linenumber"))
  private def rowChunk: Column = pmod(xxhash64(col("key")), lit(NChunks.toLong))

  // --------------------------------------- relational coverage (§2.3 b,d,e,f,c,g)

  def q1Agg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity") * 100).cast("long").as("sum_qty_cents"),
        round(sum("l_extendedprice") * 100).cast("long").as("sum_price_cents"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  def qJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(s"$dir/orders.parquet")
    val c = s.read.parquet(s"$dir/customer.parquet")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice") * 100).cast("long").as("sum_price_cents"))
      .orderBy("c_mktsegment")
  }

  def qTopkDocs(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select("doc_id", "n_chars", "lang")
      .orderBy(desc("n_chars"), asc("doc_id")).limit(20)

  /** Run-length stats via a window (§2.3 e + run-length input to N6). */
  def qWindowRuns(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(pmod(col("doc_id"), lit(NChunks.toLong))).orderBy("doc_id")
    documents(s, dir)
      .select(pmod(col("doc_id"), lit(NChunks.toLong)).as("chunk_id"), col("doc_id"), col("lang"))
      .withColumn("prev", lag("lang", 1).over(Window.partitionBy("chunk_id").orderBy("doc_id")))
      .groupBy("chunk_id")
      .agg(sum(when(col("prev").isNull || col("prev") =!= col("lang"), 1L).otherwise(0L)).as("n_runs"))
      .orderBy("chunk_id")
  }

  // ------------------------------------------ training-data ops (dedup/text)

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), countDistinct(md5(col("text"))).as("n_unique"))
      .orderBy("lang")

  def textTokens(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), "\\s+"))).as("n_tokens"),
        sum(length(col("text"))).as("total_chars"))
      .orderBy("lang")

  /** documents plus deterministic planted near-duplicates (1-in-10 docs
    * copied with a short appended tail) — the fixture both dedup queries
    * run on, so near-dup counts are non-trivial and reproducible.
    */
  def docsWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val dups = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", concat(col("text"), lit(" trailing marker words")))
    docs.unionByName(dups)
  }

  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    fsstspark.textops.Dedup.minhashPairs(
      docsWithNearDups(s, dir), "doc_id", "text", threshold = 0.7)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 3).as("jaccard"))

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    fsstspark.textops.Dedup.simhashPairs(
      docsWithNearDups(s, dir), "doc_id", "text", maxHamming = 3)

  def textAnalysis(s: SparkSession, dir: String): DataFrame =
    fsstspark.textops.TextAnalysis.analyze(documents(s, dir), "doc_id", "text")
      .groupBy("predicted_lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_fingerprints").as("n_fingerprints"))
      .orderBy("predicted_lang")

  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    fsstspark.textops.AnnSearch.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .select(col("query_id").cast("long").as("query_id"),
        col("id").cast("long").as("id"), col("rank").cast("long").as("rank"))
  }

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    fsstspark.textops.AnnSearch.lshTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10,
        nBits = 6, nTables = 16)
      .select(col("query_id"), col("id"), col("rank").cast("long").as("rank"))
  }

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    fsstspark.textops.AnnSearch.ivfTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10,
        nCentroids = 32, nProbe = 8)
      .select(col("query_id"), col("id"), col("rank").cast("long").as("rank"))
  }

  /** The north-rule input shape end-to-end: a deterministic pages table
    * (url, warc_ts, html, text, lang), every column encoded through the
    * auto-selector, round-trip verified, metrics per (column, codec).
    */
  def pagesPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pages = fsstspark.gen.PagesGen.pages(s, 2000, seed = 42L, skew = 0.01).cache()
    val chunk = EncodePipeline.chunkIdByHash(col("key"), 16)
    def kvOf(name: String, value: Column) =
      pages.select(concat(lit(name + "|"), col("url")).as("key"), value.as("value")).as[KV]
    val cols = Seq(
      "url" -> kvOf("url", encode(col("url"), "UTF-8")),
      "text" -> kvOf("text", encode(col("text"), "UTF-8")),
      "html" -> kvOf("html", col("html")))
    val encs = cols.map { case (n, kv) => EncodePipeline.encodeBytes(kv, n, chunk) }
    val encAll = encs.reduce(_ union _).persist()
    val kvAll = cols.map(_._2).reduce(_ union _)
    val badBytes = EncodePipeline.verify(kvAll, EncodePipeline.decodeBytes(encAll))
      .filter(!col("matched")).count()
    val tsKv = pages.select(concat(lit("ts|"), col("url")).as("key"),
      unix_micros(col("warc_ts")).as("value")).as[LongKV]
    val tsEnc = EncodePipeline.encodeLongs(tsKv, "warc_ts", chunk)
    val tsOrig = tsKv.collect().map(r => r.key -> r.value).toMap
    val badTs = EncodePipeline.decodeLongs(tsEnc).collect()
      .count(r => tsOrig.get(r.key) != Some(r.value))
    val out = encAll.union(tsEnc)
      .groupBy("column", "codec")
      .agg(count(lit(1)).as("n_chunks"), sum("n_rows").as("n_rows"),
        sum("bytes_in").as("bytes_in"), sum("bytes_out").as("bytes_out"))
      .withColumn("n_mismatch", lit(badBytes + badTs))
      .orderBy("column", "codec")
    pages.unpersist()
    out
  }

  /** Multimodal plumbing over the pages' binary html column: batched
    * feature extraction (deterministic fake decoder — see
    * [[fsstspark.textops.Multimodal]]) summarized per media type.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    val pages = fsstspark.gen.PagesGen.pages(s, 500, seed = 42L)
    fsstspark.textops.Multimodal.extractFeatures(pages.toDF(), "url", "html", "image")
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_items"), sum("n_bytes").as("total_bytes"),
        countDistinct(col("width")).as("n_distinct_widths"))
      .orderBy("media_type")
  }

  /** Streaming ingest front end: pages land as files, each micro-batch is
    * encoded via the local pipeline into the checkpoint table
    * (exactly-once at chunk granularity). Summarized per (column, codec).
    */
  def streamingIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("stream-q").toString
    fsstspark.gen.PagesGen.pages(s, 400, seed = 42L).coalesce(2)
      .write.mode("overwrite").parquet(s"$root/src")
    val schema = s.read.parquet(s"$root/src").schema
    val q = fsstspark.streaming.StreamingEncode.start(s, s"$root/src", schema,
      "url", "text", "text", s"$root/chunks", s"$root/state", targetChunkBytes = 64L << 10)
    q.awaitTermination()
    val chunks = Checkpoint.read(s, s"$root/chunks")
    val dec = EncodePipeline.decodeBytes(chunks)
    val orig = fsstspark.gen.PagesGen.pages(s, 400, seed = 42L)
      .select(col("url").as("key"), encode(col("text"), "UTF-8").as("value")).as[KV]
    val bad = EncodePipeline.verify(orig, dec).filter(!col("matched")).count()
    chunks.groupBy("column", "codec")
      .agg(count(lit(1)).as("n_chunks"), sum("n_rows").as("n_rows"),
        sum("bytes_in").as("bytes_in"), sum("bytes_out").as("bytes_out"))
      .withColumn("n_mismatch", lit(bad))
      .orderBy("column", "codec")
  }

  def textQuality(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        sum(length(col("text")) - length(regexp_replace(col("text"), "[.!?]", ""))).as("n_sentence_punct"),
        sum(length(col("text")) - length(regexp_replace(col("text"), "\\s", ""))).as("n_whitespace"))
      .orderBy("lang")
}
