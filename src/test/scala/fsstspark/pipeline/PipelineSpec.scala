package fsstspark.pipeline

import fsstspark.gen.PagesGen
import fsstspark.queries.Queries
import fsstspark.stats.ChunkStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("fsstspark-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("encode→decode roundtrip is bit-identical per key (documents.text)") {
    import spark.implicits._
    val kv = Queries.docsKV(spark, sf)
    val enc = EncodePipeline.encodeBytes(kv, "text", Queries.docChunk)
    val dec = EncodePipeline.decodeBytes(enc)
    val bad = EncodePipeline.verify(kv, dec).filter(!col("matched")).count()
    assert(bad == 0)
    assert(dec.count() == kv.count())
  }

  test("encodeColumns: one pass encodes byte + long columns, round-trips, handles nulls") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"),
        // a long column with planted nulls
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("n_chars")).as("len_or_null"))
    val enc = EncodePipeline.encodeColumns(df, col("doc_id"), pmod(col("doc_id"), lit(8L)),
      Seq(EncodePipeline.ColSpec("text", encode(col("text"), "UTF-8")),
        EncodePipeline.ColSpec("lang", encode(col("lang"), "UTF-8")),
        EncodePipeline.ColSpec("len_or_null", col("len_or_null"), isLong = true))).cache()
    // one ChunkResult per (chunk, column); all three columns share chunks
    val perCol = enc.groupBy("column").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perCol.keySet == Set("text", "lang", "len_or_null"))
    assert(perCol.values.toSet.size == 1, s"column chunk counts diverge: $perCol")
    // byte columns round-trip bit-identical
    for (c <- Seq("text", "lang")) {
      val orig = df.select(col("doc_id").cast("string").as("key"),
        encode(col(c), "UTF-8").as("value")).as[KV]
      val dec = EncodePipeline.decodeBytes(enc.filter(col("column") === c))
      assert(EncodePipeline.verify(orig, dec).filter(!col("matched")).count() == 0, s"$c mismatch")
    }
    // long column round-trips including nulls (null rows absent from decode output values? —
    // decodeLongs emits every key; null-ness must round-trip through the codec bitmap)
    val decL = EncodePipeline.decodeLongsNullable(enc.filter(col("column") === "len_or_null"))
    val origL = df.select(col("doc_id").cast("string").as("key"), col("len_or_null").as("value"))
    val joined = origL.join(decL.toDF("key", "decoded"), Seq("key"), "full_outer")
    val bad = joined.filter(!(col("value") <=> col("decoded"))).count()
    assert(bad == 0, "long column (with nulls) mismatch")
    enc.unpersist()
  }

  test("resumeColumns completes a partial multi-column checkpoint to the uninterrupted result") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ckpt-cols").toString + "/t"
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val chunk = pmod(col("doc_id"), lit(8L))
    val specs = Seq(
      EncodePipeline.ColSpec("text", encode(col("text"), "UTF-8")),
      EncodePipeline.ColSpec("n_chars", col("n_chars"), isLong = true))
    // simulate a killed run: full results for even chunks, plus a PARTIAL
    // chunk (only one of the two columns of chunk 1 committed)
    val full = EncodePipeline.encodeColumns(df, col("doc_id"), chunk, specs).cache()
    Checkpoint.write(full.filter(col("chunk_id") % 2 === 0), dir)
    Checkpoint.write(full.filter(col("chunk_id") === 1 && col("column") === "text"), dir)
    val n = Checkpoint.resumeColumns(df, col("doc_id"), chunk, specs, dir)
    // resumed: 3 odd chunks × 2 columns + the missing column of chunk 1
    assert(n == 7, s"expected 7 resumed results, got $n")
    val all = Checkpoint.read(spark, dir)
    assert(all.count() == 16) // 8 chunks × 2 columns, no duplicates
    assert(all.select("chunk_id", "column").distinct().count() == 16)
    // decoded text identical to a clean one-shot run
    val dec = EncodePipeline.decodeBytes(all.filter(col("column") === "text"))
    val orig = df.select(col("doc_id").cast("string").as("key"),
      encode(col("text"), "UTF-8").as("value")).as[KV]
    assert(EncodePipeline.verify(orig, dec).filter(!col("matched")).count() == 0)
    // second resume is a no-op
    assert(Checkpoint.resumeColumns(df, col("doc_id"), chunk, specs, dir) == 0)
    full.unpersist()
  }

  test("encodeColumnsLocal: zero-shuffle multi-column rewrite round-trips, deterministic ids, resumes") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/documents.parquet").repartition(4).cache()
    df.count()
    val specs = Seq(
      EncodePipeline.ColSpec("text", encode(col("text"), "UTF-8")),
      EncodePipeline.ColSpec("lang", encode(col("lang"), "UTF-8")),
      EncodePipeline.ColSpec("n_chars", col("n_chars"), isLong = true))
    val enc = EncodePipeline.encodeColumnsLocal(df, col("doc_id"), specs, 32L << 10).cache()
    // one ChunkResult per (chunk, column); every chunk carries all columns
    val perCol = enc.groupBy("column").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perCol.keySet == Set("text", "lang", "n_chars"))
    assert(perCol.values.toSet.size == 1, s"column chunk counts diverge: $perCol")
    assert(perCol("text") > 1, "expected multiple local chunks")
    // byte + long columns round-trip bit-identical
    for (c <- Seq("text", "lang")) {
      val orig = df.select(col("doc_id").cast("string").as("key"),
        encode(col(c), "UTF-8").as("value")).as[KV]
      val dec = EncodePipeline.decodeBytes(enc.filter(col("column") === c))
      assert(EncodePipeline.verify(orig, dec).filter(!col("matched")).count() == 0, s"$c mismatch")
    }
    val origL = df.select(col("doc_id").cast("string").as("key"), col("n_chars").as("value")).as[LongKV]
    val decL = EncodePipeline.decodeLongs(enc.filter(col("column") === "n_chars"))
    assert(EncodePipeline.verifyLongs(origL, decL).filter(!col("matched")).count() == 0)
    // chunk ids are content-derived → identical across reruns of same input
    val ids1 = enc.select("chunk_id").distinct().as[Long].collect().sorted.toSeq
    val ids2 = EncodePipeline.encodeColumnsLocal(df, col("doc_id"), specs, 32L << 10)
      .select("chunk_id").distinct().as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // resume: half the chunks fully committed + one chunk partially (one
    // column) → resumeColumnsLocal completes to the uninterrupted result
    val dir = java.nio.file.Files.createTempDirectory("ckpt-cols-local").toString + "/t"
    val half = ids1.filter(_ % 2 == 0).toSet
    Checkpoint.write(enc.filter(col("chunk_id").isin(half.toSeq: _*)), dir)
    val partialChunk = ids1.find(id => !half.contains(id)).get
    Checkpoint.write(enc.filter(col("chunk_id") === partialChunk && col("column") === "text"), dir)
    val n = Checkpoint.resumeColumnsLocal(df, col("doc_id"), specs, dir, 32L << 10)
    val expected = (ids1.size - half.size) * specs.size - 1 // partial chunk re-encodes minus its present row
    assert(n == expected, s"expected $expected resumed results, got $n")
    val all = Checkpoint.read(spark, dir)
    assert(all.count() == ids1.size.toLong * specs.size)
    assert(all.select("chunk_id", "column").distinct().count() == all.count())
    assert(Checkpoint.resumeColumnsLocal(df, col("doc_id"), specs, dir, 32L << 10) == 0)
    // decoded checkpoint equals the original column bit-for-bit
    val decAll = EncodePipeline.decodeBytes(all.filter(col("column") === "text"))
    val origAll = df.select(col("doc_id").cast("string").as("key"),
      encode(col("text"), "UTF-8").as("value")).as[KV]
    assert(EncodePipeline.verify(origAll, decAll).filter(!col("matched")).count() == 0)
    enc.unpersist(); df.unpersist()
  }

  test("resumeColumns ignores checkpoint rows from columns outside the pass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ckpt-xcol").toString + "/t"
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val chunk = pmod(col("doc_id"), lit(8L))
    val specs = Seq(
      EncodePipeline.ColSpec("text", encode(col("text"), "UTF-8")),
      EncodePipeline.ColSpec("n_chars", col("n_chars"), isLong = true))
    // checkpoint holds full "text" rows plus rows for an UNRELATED column
    // ("lang", e.g. from an earlier run with a different spec list): every
    // chunk reaches count == specs.size without n_chars being present —
    // the unfiltered r2 logic would skip all chunks and never encode it
    val textOnly = EncodePipeline.encodeColumns(df, col("doc_id"), chunk,
      Seq(EncodePipeline.ColSpec("text", encode(col("text"), "UTF-8"))))
    val langOnly = EncodePipeline.encodeColumns(df, col("doc_id"), chunk,
      Seq(EncodePipeline.ColSpec("lang", encode(col("lang"), "UTF-8"))))
    Checkpoint.write(textOnly, dir)
    Checkpoint.write(langOnly, dir)
    val n = Checkpoint.resumeColumns(df, col("doc_id"), chunk, specs, dir)
    assert(n == 8, s"expected the 8 missing n_chars chunks encoded, got $n")
    val decL = EncodePipeline.decodeLongsNullable(
      Checkpoint.read(spark, dir).filter(col("column") === "n_chars"))
    assert(decL.count() == df.count())
  }

  test("verify() detects a corrupted value") {
    import spark.implicits._
    val kv = Queries.docsKV(spark, sf)
    val dec = EncodePipeline.decodeBytes(EncodePipeline.encodeBytes(kv, "text", Queries.docChunk))
      .map { r => if (r.key == "7") KV(r.key, r.value :+ 0x21.toByte) else r }
    assert(EncodePipeline.verify(kv, dec).filter(!col("matched")).count() == 1)
  }

  test("resume is idempotent: partial checkpoint completes to identical output") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString + "/chunks"
    val kv = Queries.docsKV(spark, sf)
    // first run: only chunks 0 mod 4 (simulated partial failure)
    val partial = EncodePipeline.encodeBytes(
      kv.filter(pmod(Queries.docChunk, lit(4)) === 0), "text", Queries.docChunk)
    Checkpoint.write(partial, dir)
    val before = Checkpoint.read(spark, dir).count()
    // resume: encodes exactly the missing chunks
    val n1 = Checkpoint.resumeBytes(kv, "text", Queries.docChunk, dir)
    assert(n1 > 0)
    // second resume: nothing to do
    val n2 = Checkpoint.resumeBytes(kv, "text", Queries.docChunk, dir)
    assert(n2 == 0)
    val all = Checkpoint.read(spark, dir)
    assert(all.count() == before + n1)
    assert(all.select("chunk_id").distinct().count() == all.count(), "duplicate chunk rows")
    // decoded checkpoint equals the original column bit-for-bit
    val dec = EncodePipeline.decodeBytes(all)
    assert(EncodePipeline.verify(kv, dec).filter(!col("matched")).count() == 0)
  }

  test("local (zero-shuffle) chunking roundtrips and resumes idempotently") {
    import spark.implicits._
    val kv = Queries.docsKV(spark, sf).repartition(4).cache()
    kv.count()
    val enc = EncodePipeline.encodeBytesLocal(kv, "text", 8L << 10)
    assert(enc.count() > 1, "expected multiple local chunks")
    val dec = EncodePipeline.decodeBytes(enc)
    assert(EncodePipeline.verify(kv, dec).filter(!col("matched")).count() == 0)
    // chunk ids are content-derived → identical across reruns of same input
    val ids1 = enc.select("chunk_id").as[Long].collect().sorted.toSeq
    val ids2 = EncodePipeline.encodeBytesLocal(kv, "text", 8L << 10)
      .select("chunk_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // resume: checkpoint half the chunks, resumeBytesLocal completes the rest
    val dir = java.nio.file.Files.createTempDirectory("ckpt-local").toString + "/chunks"
    val half = enc.filter(pmod(col("chunk_id"), lit(2)) === 0)
    Checkpoint.write(half, dir)
    val n1 = Checkpoint.resumeBytesLocal(kv, "text", dir, 8L << 10)
    assert(n1 == ids1.length - half.count())
    assert(Checkpoint.resumeBytesLocal(kv, "text", dir, 8L << 10) == 0)
    val all = Checkpoint.read(spark, dir)
    assert(all.select("chunk_id").distinct().count() == all.count())
    assert(EncodePipeline.verify(kv, EncodePipeline.decodeBytes(all))
      .filter(!col("matched")).count() == 0)
    kv.unpersist()
  }

  test("codec selector picks structure-appropriate codecs per column") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("key", concat_ws("_", col("l_orderkey"), col("l_linenumber")))
    val flag = EncodePipeline.encodeBytes(
      li.select(col("key"), encode(col("l_returnflag"), "UTF-8").as("value")).as[KV],
      "l_returnflag", EncodePipeline.chunkIdByHash(col("key"), 8))
    val flagCodecs = flag.select("codec").distinct().as[String].collect().toSet
    assert(flagCodecs.subsetOf(Set("dict", "rle")), s"cardinality-3 column chose $flagCodecs")

    val text = EncodePipeline.encodeBytes(Queries.docsKV(spark, sf), "text", Queries.docChunk)
    val textCodecs = text.select("codec").distinct().as[String].collect().toSet
    assert(textCodecs == Set("fsst"), s"natural text chose $textCodecs")
    // and it actually compresses
    val ratio = text.agg(sum("bytes_out") / sum("bytes_in")).as[Double].head()
    assert(ratio < 0.75, s"text compression ratio $ratio")

    val ids = EncodePipeline.encodeLongs(
      li.select(col("key"), col("l_orderkey").as("value")).as[LongKV],
      "l_orderkey", EncodePipeline.chunkIdByHash(col("key"), 8))
    val idCodecs = ids.select("codec").distinct().as[String].collect().toSet
    assert(idCodecs.subsetOf(Set("for", "bitpack", "delta", "rle_long")), s"ids chose $idCodecs")
  }

  test("TableIO: manifest prunes the SCAN to hit files; appends are O(batch)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tableio").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    // zero-padded keys + local (range) chunking give chunks tight key
    // ranges — the layout where manifest min/max pruning has teeth
    // (hash chunks each span the whole key space by construction)
    val kv = spark.read.parquet(s"$sf/documents.parquet")
      .select(lpad(col("doc_id").cast("string"), 8, "0").as("key"),
        encode(col("text"), "UTF-8").as("value")).as[KV]
    // two batches (split by key) — the incremental manifest must cover
    // both without a full-table rescan per append
    val enc1 = EncodePipeline.encodeBytesLocal(kv.filter(col("key") < "00000250"), "text", 8L << 10)
    val enc2 = EncodePipeline.encodeBytesLocal(kv.filter(col("key") >= "00000250"), "text", 8L << 10)
    io.writeChunks(enc1, "docs")
    io.writeChunks(enc2, "docs")
    val man = io.manifest(spark, "docs").cache()
    val nChunks = enc1.count() + enc2.count()
    assert(man.count() == nChunks)
    assert(man.select("column").distinct().as[String].collect().toSeq == Seq("text"))
    // pruning: the chunk containing doc 7 must decode doc 7...
    val key = "00000007"
    val hits = io.chunksForKey(spark, "docs", key)
    val manifestHits = man.filter(col("min_key") <= key && col("max_key") >= key)
    assert(hits.count() == manifestHits.count(), "decoded chunks != manifest hit rows")
    assert(hits.count() < man.count())
    val dec = EncodePipeline.decodeBytes(hits).filter(col("key") === key)
    assert(dec.count() == 1)
    // ...and the SCAN must touch only the manifest-selected files, not the
    // whole data directory (the 100 TB point-read requirement)
    val hitFiles = manifestHits.select("file").distinct().as[String].collect().toSet
    val scanned = hits.inputFiles.toSet
    val allFiles = io.readChunks(spark, "docs").inputFiles.toSet
    assert(scanned == hitFiles, s"scan read ${scanned.size} files, manifest selected ${hitFiles.size}")
    assert(scanned.size < allFiles.size, "point lookup scanned the whole table")
    // round-trip through the catalog across both batches
    val all = io.readChunks(spark, "docs")
    assert(EncodePipeline.verify(kv, EncodePipeline.decodeBytes(all))
      .filter(!col("matched")).count() == 0)
    // repair rebuilds the same manifest content from data files alone
    io.repairManifest(spark, "docs")
    assert(io.manifest(spark, "docs").count() == nChunks)
    man.unpersist()
  }

  test("all-null/tiny-value chunks close at the per-row floor, round-trip, and stay decodable") {
    import spark.implicits._
    // values contribute 0 bytes — without the 32 B/row floor one partition
    // would become a single unbounded-row chunk (and huge-count blobs)
    val kv = (0 until 2000).map(i => KV(f"k$i%05d", null)).toDS().repartition(2)
    val enc = EncodePipeline.encodeBytesLocal(kv, "c", 4L << 10) // 4 KB → ≤128 rows/chunk
    val rows = enc.select("n_rows").as[Long].collect()
    assert(rows.forall(_ <= (4L << 10) / EncodePipeline.RowFloorBytes + 1),
      s"row floor not enforced: max ${rows.max} rows/chunk")
    assert(rows.length >= 14, s"expected many floor-bounded chunks, got ${rows.length}")
    val dec = EncodePipeline.decodeBytes(enc)
    assert(dec.count() == 2000)
    assert(dec.filter(col("value").isNotNull).count() == 0, "nulls must round-trip as nulls")
    assert(dec.select("key").distinct().count() == 2000, "keys must survive")
  }

  test("torn (uncommitted) catalog batches are invisible to every read path") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("torn").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val kv = Queries.docsKV(spark, sf)
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "text", 32L << 10), "docs")
    val committed = io.readChunks(spark, "docs").count()
    assert(committed > 0)
    // simulate a crash between the data/manifest append and the commit
    // marker: write a second batch, then delete its marker
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "other", 32L << 10), "docs")
    val commitsDir = new java.io.File(s"$root/docs/commits")
    val markers = commitsDir.listFiles()
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      .sortBy(_.getName)
    assert(markers.length == 2)
    assert(markers.last.delete())
    // the torn batch is invisible to data reads, the manifest, and exists
    assert(io.readChunks(spark, "docs").count() == committed)
    assert(io.readChunks(spark, "docs").filter(col("column") === "other").count() == 0)
    assert(io.manifest(spark, "docs").filter(col("column") === "other").count() == 0)
    // re-landing the same content commits cleanly (fresh batch id)
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "other", 32L << 10), "docs")
    assert(io.readChunks(spark, "docs").filter(col("column") === "other").count() > 0)
    assert(EncodePipeline.verify(kv,
      EncodePipeline.decodeBytes(io.readChunks(spark, "docs").filter(col("column") === "text")))
      .filter(!col("matched")).count() == 0)
  }

  test("compaction is an atomic swap: un-committing the rewrite batch restores the old state") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("atomic").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val kv = Queries.docsKV(spark, sf)
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "text", 8L << 10), "docs")
    val idsBefore = io.readChunks(spark, "docs").select("chunk_id").as[Long].collect().sorted.toSeq
    def markers() = new java.io.File(s"$root/docs/commits").listFiles()
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      .map(_.getName).toSet
    val before = markers()
    fsstspark.pipeline.Compaction.compactColumn(
      spark, io, "docs", "text", minChunkBytes = 1L << 20, targetChunkBytes = 64L << 10)
    // simulate a crash at the last instant: remove the compaction batch's
    // commit marker — its adds AND its gated deletes must both vanish
    val newMarker = (markers() -- before).head
    assert(new java.io.File(s"$root/docs/commits/$newMarker").delete())
    val idsAfterCrash = io.readChunks(spark, "docs").select("chunk_id").as[Long].collect().sorted.toSeq
    assert(idsAfterCrash == idsBefore, "un-committed swap must restore the pre-compaction chunk set")
    assert(EncodePipeline.verify(kv, EncodePipeline.decodeBytes(io.readChunks(spark, "docs")))
      .filter(!col("matched")).count() == 0)
    // re-running the compaction converges (the orphaned batch stays inert)
    val res = fsstspark.pipeline.Compaction.compactColumn(
      spark, io, "docs", "text", minChunkBytes = 1L << 20, targetChunkBytes = 64L << 10)
    assert(res.chunksCompacted == idsBefore.size)
    assert(io.readChunks(spark, "docs").count() < idsBefore.size)
    assert(EncodePipeline.verify(kv, EncodePipeline.decodeBytes(io.readChunks(spark, "docs")))
      .filter(!col("matched")).count() == 0)
  }

  test("compaction of a LONG column is bit-exact (nullable values through the isLong spec)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("compact-long").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(lpad(col("doc_id").cast("string"), 8, "0").as("k"),
        when(col("doc_id") % 9 === 0, lit(null)).otherwise(col("n_chars")).as("len"))
    val frag = EncodePipeline.encodeColumnsLocal(df, col("k"),
      Seq(EncodePipeline.ColSpec("len", col("len"), isLong = true)), 1L << 10)
    io.writeChunks(frag, "t")
    val before = io.readChunks(spark, "t").count()
    assert(before > 3, s"fixture should fragment, got $before chunks")
    val res = fsstspark.pipeline.Compaction.compactColumn(
      spark, io, "t", "len", minChunkBytes = 1L << 20, targetChunkBytes = 64L << 10)
    assert(res.chunksCompacted == before)
    val after = io.readChunks(spark, "t")
    assert(after.count() < before)
    // nullable longs round-trip exactly through the rewrite
    val dec = EncodePipeline.decodeLongsNullable(after).toDF("k", "decoded")
    val joined = df.select(col("k"), col("len")).join(dec, Seq("k"), "full_outer")
    assert(joined.filter(!(col("len") <=> col("decoded"))).count() == 0)
  }

  test("compaction of a DOUBLE column is bit-exact AND keeps zone maps in SortableBits space") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("compact-double").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    // sign-crossing doubles: signed-long order over raw IEEE bits ranks
    // negatives by MAGNITUDE and far from the positives, so stats written
    // in raw-bit space make range pruning silently drop chunks —
    // SortableBits order is the only order pruning is correct in
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(lpad(col("doc_id").cast("string"), 8, "0").as("k"),
        when(col("doc_id") % 9 === 0, lit(null))
          .otherwise((col("n_chars").cast("double") - 500.0) / 3.0).as("score"))
    val frag = EncodePipeline.encodeColumnsLocal(df, col("k"),
      Seq(EncodePipeline.ColSpec("score", col("score"), isDouble = true)), 1L << 10)
    io.writeChunks(frag, "t")
    val before = io.readChunks(spark, "t").count()
    assert(before > 3, s"fixture should fragment, got $before chunks")
    // no type hint passed: the double route must be re-derived from the
    // catalog's _f64 codec names alone
    val res = fsstspark.pipeline.Compaction.compactColumn(
      spark, io, "t", "score", minChunkBytes = 1L << 20, targetChunkBytes = 64L << 10)
    assert(res.chunksCompacted == before)
    val after = io.readChunks(spark, "t").cache()
    assert(after.count() < before)
    // doubles round-trip bit-exactly through the rewrite
    val dec = EncodePipeline.decodeDoubles(after).toDF("k", "decoded")
    val joined = df.join(dec, Seq("k"), "full_outer")
    assert(joined.filter(!(col("score") <=> col("decoded"))).count() == 0)
    // zone maps on the REWRITTEN chunks are in SortableBits space: global
    // stat extremes equal the sortable map of the true double min/max
    // (raw-bit stats would put negative scores at huge negative longs)
    val r = df.agg(min("score"), max("score")).head()
    val statMin = after.collect().flatMap(_.value_min).min
    val statMax = after.collect().flatMap(_.value_max).max
    assert(statMin == fsstspark.util.SortableBits.fromDouble(r.getDouble(0)),
      "compacted double chunk stats must stay in SortableBits space")
    assert(statMax == fsstspark.util.SortableBits.fromDouble(r.getDouble(1)))
    // and a sign-crossing range read over the compacted table misses nothing
    val (loD, hiD) = (-50.0, 60.0)
    val pruned = io.chunksForValueRange(spark, "t", "score",
      fsstspark.util.SortableBits.fromDouble(loD), fsstspark.util.SortableBits.fromDouble(hiD))
    val found = EncodePipeline.decodeDoubles(pruned)
      .filter(col("_2").isNotNull && col("_2") >= loD && col("_2") <= hiD).count()
    assert(found == df.filter(col("score").between(loD, hiD)).count(),
      "range read over compacted double chunks lost rows — zone maps corrupted")
    after.unpersist()
  }

  test("legacy pre-marker catalogs fail loudly; commitAllBatches migrates them") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("legacy").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val kv = Queries.docsKV(spark, sf)
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "text", 32L << 10), "docs")
    val n = io.readChunks(spark, "docs").count()
    // simulate a catalog written by the pre-marker build: remove commits/
    val commits = new org.apache.hadoop.fs.Path(s"$root/docs/commits")
    commits.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(commits, true)
    val e = intercept[IllegalStateException] { io.readChunks(spark, "docs").count() }
    assert(e.getMessage.contains("commit"))
    intercept[IllegalStateException] { io.manifest(spark, "docs") }
    // explicit migration restores visibility without rewriting any data
    assert(io.commitAllBatches(spark, "docs") == 1)
    assert(io.readChunks(spark, "docs").count() == n)
  }

  test("vacuum of a fully-tombstoned table empties it cleanly, ledger retained") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("fullvac").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val kv = Queries.docsKV(spark, sf)
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "text", 32L << 10), "docs")
    val all = io.readChunks(spark, "docs").select("chunk_id", "column")
    io.removeChunks(spark, "docs", all)
    val nDeleted = io.vacuum(spark, "docs")
    assert(nDeleted > 0)
    // the emptied table stays readable (explicit schema) and consistent
    assert(io.readChunks(spark, "docs").count() == 0)
    assert(io.manifest(spark, "docs").count() == 0)
    assert(io.deletedChunks(spark, "docs").count() > 0, "ingest ledger must survive")
    // and it accepts new writes afterwards
    io.writeChunks(EncodePipeline.encodeBytesLocal(
      kv.filter(col("key") < "25"), "text", 32L << 10), "docs")
    assert(io.readChunks(spark, "docs").count() > 0)
  }

  test("compaction merges under-sized chunks, tombstones originals, tightens key ranges") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val kv = spark.read.parquet(s"$sf/documents.parquet")
      .select(lpad(col("doc_id").cast("string"), 8, "0").as("key"),
        encode(col("text"), "UTF-8").as("value")).as[KV]
    // simulate streaming accretion: two batches of tiny (4 KB) chunks
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv.filter(col("key") < "00000250"), "text", 4L << 10), "docs")
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv.filter(col("key") >= "00000250"), "text", 4L << 10), "docs")
    val before = io.readChunks(spark, "docs").count()
    assert(before > 4, s"fixture should start fragmented, got $before chunks")
    val res = fsstspark.pipeline.Compaction.compactColumn(
      spark, io, "docs", "text", minChunkBytes = 1L << 20, targetChunkBytes = 64L << 10)
    assert(res.chunksCompacted == before, "every under-sized chunk should be rewritten")
    val after = io.readChunks(spark, "docs").persist()
    assert(after.count() == res.chunksWritten)
    assert(after.count() < before, s"compaction did not reduce chunk count: $before -> ${after.count()}")
    // data is bit-identical through the rewrite
    assert(EncodePipeline.verify(kv, EncodePipeline.decodeBytes(after))
      .filter(!col("matched")).count() == 0)
    // manifest agrees with the post-compaction chunk set and point reads
    // still prune to (now fewer, range-clustered) files
    assert(io.manifest(spark, "docs").count() == after.count())
    val hit = EncodePipeline.decodeBytes(io.chunksForKey(spark, "docs", "00000007"))
      .filter(col("key") === "00000007")
    assert(hit.count() == 1)
    // re-running with a floor below the rewrite target is a no-op: only
    // the single per-partition tail chunk can sit under 16 KB
    val res2 = fsstspark.pipeline.Compaction.compactColumn(
      spark, io, "docs", "text", minChunkBytes = 16L << 10, targetChunkBytes = 64L << 10)
    assert(res2.chunksCompacted == 0, s"re-compaction should be a no-op, rewrote ${res2.chunksCompacted}")
    // vacuum physically reclaims fully-tombstoned files; reads unchanged
    // and the tombstone ledger (ingest dedup) survives
    def dataFiles(): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$root/docs/data")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val filesBefore = dataFiles()
    val nDeleted = io.vacuum(spark, "docs")
    assert(nDeleted > 0, "vacuum reclaimed nothing despite fully-tombstoned files")
    assert(dataFiles() == filesBefore - nDeleted)
    assert(io.readChunks(spark, "docs").count() == after.count())
    assert(EncodePipeline.verify(kv, EncodePipeline.decodeBytes(io.readChunks(spark, "docs")))
      .filter(!col("matched")).count() == 0)
    assert(io.deletedChunks(spark, "docs").count() > 0, "tombstone ledger must survive vacuum")
    assert(io.manifest(spark, "docs").count() == after.count())
    after.unpersist()
  }

  test("checkpoint format versioning: resuming a pre-versioning checkpoint is a hard error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ckpt-ver").toString + "/chunks"
    val kv = Queries.docsKV(spark, sf)
    // simulate a round-1 (v1 chunk-id) checkpoint: parquet rows, NO marker
    EncodePipeline.encodeBytesLocal(kv, "text", 8L << 10)
      .write.mode("append").parquet(dir)
    val e = intercept[IllegalStateException] {
      Checkpoint.resumeBytesLocal(kv, "text", dir, 8L << 10)
    }
    assert(e.getMessage.contains("format"))
    // a direct write against the same pre-versioning checkpoint must ALSO
    // refuse (stamping the current marker onto legacy data would let later
    // resumes mix id generations and silently duplicate rows)
    val e2 = intercept[IllegalStateException] {
      Checkpoint.write(EncodePipeline.encodeBytesLocal(kv, "text", 8L << 10), dir)
    }
    assert(e2.getMessage.contains("version marker"))
    // a marker-bearing checkpoint (written through Checkpoint.write) resumes fine
    val dir2 = java.nio.file.Files.createTempDirectory("ckpt-ver2").toString + "/chunks"
    Checkpoint.write(EncodePipeline.encodeBytesLocal(kv, "text", 8L << 10), dir2)
    assert(Checkpoint.resumeBytesLocal(kv, "text", dir2, 8L << 10) == 0)
  }

  test("catalog model check: random write/remove/compact/vacuum sequences stay consistent") {
    import spark.implicits._
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files.createTempDirectory(s"model$seed").toString
      val io = new fsstspark.io.ParquetTableIO(root)
      // in-memory model of the live rows; keys are globally unique
      val model = scala.collection.mutable.Map.empty[String, String]
      var nextKey = 0
      def writeBatch(): Unit = {
        val rows = (0 until 30 + rnd.nextInt(40)).map { _ =>
          val k = f"k$nextKey%06d"; nextKey += 1
          k -> s"value for $k ${"x" * rnd.nextInt(200)}"
        }
        rows.foreach { case (k, v) => model(k) = v }
        val kv = rows.map { case (k, v) => KV(k, v.getBytes("UTF-8")) }
          .toDS().repartition(1 + rnd.nextInt(3))
        io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "c", 1L << 10), "t")
      }
      def removeOneChunk(): Unit = {
        val chunks = io.readChunks(spark, "t").select("chunk_id").as[Long].collect()
        if (chunks.nonEmpty) {
          val victim = chunks(rnd.nextInt(chunks.length))
          // the model loses exactly that chunk's keys
          EncodePipeline.decodeBytes(
              io.readChunks(spark, "t").filter(col("chunk_id") === victim))
            .select("key").as[String].collect().foreach(model.remove)
          io.removeChunks(spark, "t", Seq((victim, "c")).toDF("chunk_id", "column"))
        }
      }
      def checkConsistent(): Unit = {
        val live = EncodePipeline.decodeBytes(io.readChunks(spark, "t"))
          .collect().map(r => r.key -> new String(r.value, "UTF-8")).toMap
        assert(live == model.toMap, s"seed=$seed: catalog != model " +
          s"(${(live.keySet diff model.keySet).take(3)} extra, ${(model.keySet diff live.keySet).take(3)} missing)")
        assert(io.manifest(spark, "t").count() == io.readChunks(spark, "t").count())
        if (model.nonEmpty) {
          val k = model.keySet.toSeq(rnd.nextInt(model.size))
          val hit = EncodePipeline.decodeBytes(io.chunksForKey(spark, "t", k))
            .filter(col("key") === k).as[KV].collect()
          assert(hit.length == 1 && new String(hit(0).value, "UTF-8") == model(k),
            s"seed=$seed: point lookup of $k wrong")
        }
      }
      writeBatch()
      for (_ <- 0 until 6) {
        rnd.nextInt(4) match {
          case 0 => writeBatch()
          case 1 => removeOneChunk()
          case 2 => fsstspark.pipeline.Compaction.compactColumn(
            spark, io, "t", "c", minChunkBytes = 4L << 10, targetChunkBytes = 8L << 10)
          case 3 => io.vacuum(spark, "t")
        }
        checkConsistent()
      }
    }
  }

  test("pages generator is deterministic and partitioning-independent") {
    val a = PagesGen.pages(spark, 200, seed = 7, numPartitions = 2).collect().sortBy(_.url)
    val b = PagesGen.pages(spark, 200, seed = 7, numPartitions = 13).collect().sortBy(_.url)
    assert(a.length == 200 && a.map(_.url).toSeq == b.map(_.url).toSeq)
    assert(a.zip(b).forall { case (x, y) =>
      x.text == y.text && java.util.Arrays.equals(x.html, y.html) &&
        x.warc_ts == y.warc_ts && x.lang == y.lang
    })
    // a different seed changes content
    val c = PagesGen.pages(spark, 200, seed = 8).collect().sortBy(_.url)
    assert(c.map(_.url).toSeq != a.map(_.url).toSeq)
  }

  test("skew: a giant value becomes its own chunk, task input stays bounded") {
    import spark.implicits._
    val giant = "G" * (10 << 20) // one 10 MB value among 1 KB rows
    val rows = (0 until 500).map(i => KV(f"k$i%04d", ("x" * 1000).getBytes)) :+
      KV("kGIANT", giant.getBytes)
    val kv = rows.toDS().repartition(4)
    val target = 256L << 10
    val enc = EncodePipeline.encodeBytesLocal(kv, "c", target).cache()
    val rowsOut = enc.select("chunk_id", "n_rows", "bytes_in", "min_key", "max_key").collect()
    // every chunk except those containing the giant is ≤ target + one value
    val giantChunks = rowsOut.filter(r => r.getAs[String]("min_key") <= "kGIANT" && r.getAs[String]("max_key") >= "kGIANT")
    rowsOut.foreach { r =>
      val bytes = r.getAs[Long]("bytes_in")
      if (!giantChunks.contains(r))
        assert(bytes <= target + 1024, s"chunk ${r.getAs[Long]("chunk_id")} holds $bytes bytes")
    }
    // the giant row's chunk is dominated by the single value, not by accumulation
    assert(giantChunks.exists(_.getAs[Long]("bytes_in") >= (10L << 20)))
    assert(giantChunks.forall(_.getAs[Long]("bytes_in") <= (10L << 20) + target + 1024))
    // and the whole thing still round-trips
    val dec = EncodePipeline.decodeBytes(enc)
    assert(EncodePipeline.verify(kv, dec).filter(!col("matched")).count() == 0)
    enc.unpersist()
  }

  test("pages pipeline roundtrips text and html incl. skew tail") {
    import spark.implicits._
    val pages = PagesGen.pages(spark, 500, seed = 3, skew = 0.02).cache()
    val textKv = pages.select(col("url").as("key"), encode(col("text"), "UTF-8").as("value")).as[KV]
    val htmlKv = pages.select(col("url").as("key"), col("html").as("value")).as[KV]
    for (kv <- Seq(textKv, htmlKv)) {
      val enc = EncodePipeline.encodeBytes(kv, "c", EncodePipeline.chunkIdByHash(col("key"), 16))
      val dec = EncodePipeline.decodeBytes(enc)
      assert(EncodePipeline.verify(kv, dec).filter(!col("matched")).count() == 0)
    }
    pages.unpersist()
  }

  test("byte-entropy aggregator: constant ≈ 0 bits, uniform ≈ 8 bits") {
    import spark.implicits._
    val const = Seq.fill(50)(Array.fill[Byte](100)(65)).toDF("v")
    val e0 = const.agg(ChunkStats.byteEntropy(col("v"))).as[Double].head()
    assert(math.abs(e0) < 1e-9)
    val rnd = new scala.util.Random(1)
    val uni = Seq.fill(64)(Array.fill[Byte](4096)(rnd.nextInt(256).toByte)).toDF("v")
    val e8 = uni.agg(ChunkStats.byteEntropy(col("v"))).as[Double].head()
    assert(e8 > 7.9 && e8 <= 8.0)
  }

  test("long roundtrip preserves timestamps exactly (events.ts)") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val kvl = ev.select(col("event_id").cast("string").as("key"),
      unix_micros(col("ts").cast("timestamp")).as("value")).as[LongKV]
    val dec = EncodePipeline.decodeLongs(
      EncodePipeline.encodeLongs(kvl, "ts", EncodePipeline.chunkIdByHash(col("key"), 8)))
    val orig = kvl.collect().map(r => r.key -> r.value).toMap
    val got = dec.collect().map(r => r.key -> r.value).toMap
    assert(got == orig)
  }

  test("decodeColumns: chunk-aligned zero-join multi-column read-back (bytes + long + double, nulls)") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("n_chars")).as("len_or_null"),
        when(col("doc_id") % 11 === 0, lit(null))
          .otherwise(col("n_chars").cast("double") / 3.0).as("score"))
    val specs = Seq(
      EncodePipeline.ColSpec("text", encode(col("text"), "UTF-8")),
      EncodePipeline.ColSpec("len_or_null", col("len_or_null"), isLong = true),
      EncodePipeline.ColSpec("score", col("score"), isDouble = true))
    val enc = EncodePipeline.encodeColumnsLocal(df, col("doc_id"), specs, 32L << 10)
    val back = EncodePipeline.decodeColumns(enc, Seq(
      EncodePipeline.ReadSpec("text"),
      EncodePipeline.ReadSpec("len_or_null", isLong = true),
      EncodePipeline.ReadSpec("score", isDouble = true))).cache()
    // every reconstructed row identical to its source row (nulls preserved)
    val orig = df.select(col("doc_id").cast("string").as("key"),
      encode(col("text"), "UTF-8").as("o_text"),
      col("len_or_null").as("o_len"), col("score").as("o_score"))
    val j = orig.join(back, Seq("key"), "full_outer")
    val bad = j.filter(!(col("o_text") <=> col("text") &&
      col("o_len") <=> col("len_or_null") && col("o_score") <=> col("score"))).count()
    assert(bad == 0, "reconstructed rows diverge from source")
    assert(back.count() == df.count())
    // the reassembly plan must contain NO join: one groupByKey exchange of
    // compressed blobs is the entire data movement
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"decodeColumns plan contains a join:\n$plan")
    // mixing chunkings fails loudly instead of mis-zipping: re-encode one
    // column under a DIFFERENT chunk size and swap it in
    val other = EncodePipeline.encodeColumnsLocal(df, col("doc_id"),
      Seq(EncodePipeline.ColSpec("text", encode(col("text"), "UTF-8"))), 8L << 10)
    val mixed = enc.filter(col("column") =!= "text").unionByName(other)
    val err = intercept[org.apache.spark.SparkException] {
      EncodePipeline.decodeColumns(mixed, Seq(
        EncodePipeline.ReadSpec("text"),
        EncodePipeline.ReadSpec("len_or_null", isLong = true),
        EncodePipeline.ReadSpec("score", isDouble = true))).count()
    }
    assert(err.getMessage != null)
    back.unpersist()
  }

  test("partial vacuum maintains the manifest incrementally, not by data-dir rescan") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tableio-vac-inc").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val kv = Queries.docsKV(spark, sf)
    // two committed batches; the FIRST is then fully tombstoned
    val encA = EncodePipeline.encodeBytesLocal(kv.filter(col("key") < "00000400"), "text", 8L << 10).cache()
    io.writeChunks(encA, "docs")
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv.filter(col("key") >= "00000400"), "text", 8L << 10), "docs")
    io.removeChunks(spark, "docs", encA.select("chunk_id", "column"))
    // plant a sentinel manifest row naming a file that does NOT exist in
    // the data dir: an incremental rewrite keeps it (its file is not in
    // the dead list); a repairManifest-style full rebuild would drop it
    val batches = io.committedBatchIds(spark, "docs")
    Seq(("file:///nonexistent/sentinel.parquet", "text", 999999999L, "raw", 1L, 1L, 1L, "zzz", "zzz"))
      .toDF("file", "column", "chunk_id", "codec", "n_rows", "bytes_in", "bytes_out", "min_key", "max_key")
      .withColumn("batch", lit(batches.head))
      .write.partitionBy("batch").mode("append").parquet(s"$root/docs/manifest")
    val nDeleted = io.vacuum(spark, "docs")
    assert(nDeleted > 0, "vacuum should reclaim the fully-tombstoned first batch")
    val rawManifest = spark.read.parquet(s"$root/docs/manifest")
    assert(rawManifest.filter(col("chunk_id") === 999999999L).count() == 1,
      "sentinel manifest row lost: vacuum rebuilt the manifest from the data dir instead of rewriting incrementally")
    // reads and point lookups still work on the surviving batch
    assert(io.readChunks(spark, "docs").count() > 0)
    assert(io.manifest(spark, "docs").filter(col("chunk_id") =!= 999999999L).count() ==
      io.readChunks(spark, "docs").count())
  }

  test("SortableBits: monotone involution over doubles incl. ±0, infinities, denormals") {
    import fsstspark.util.SortableBits
    val rnd = new scala.util.Random(4637947)
    val specials = Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity, Double.NegativeInfinity,
      1e-310, -1e-310) // denormals
    val ds = (specials ++ Seq.fill(5000)(
      rnd.nextGaussian() * math.pow(10, rnd.nextInt(40) - 20))).toArray
    val sorted = ds.sorted
    var i = 1
    while (i < sorted.length) {
      assert(SortableBits.fromDouble(sorted(i - 1)) <= SortableBits.fromDouble(sorted(i)),
        s"order broken at ${sorted(i - 1)} < ${sorted(i)}")
      if (sorted(i - 1) < sorted(i))
        assert(SortableBits.fromDouble(sorted(i - 1)) < SortableBits.fromDouble(sorted(i)))
      i += 1
    }
    // involution: mapping twice is the identity on raw bits
    ds.foreach { d =>
      val bits = java.lang.Double.doubleToRawLongBits(d)
      assert(SortableBits.fromDoubleBits(SortableBits.fromDoubleBits(bits)) == bits)
      assert(java.lang.Double.doubleToRawLongBits(SortableBits.toDouble(SortableBits.fromDouble(d))) == bits)
    }
  }

  test("zone maps: per-chunk value stats for long/double columns; bytes and all-null chunks unprunable") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"),
        // chunk 3 all-null, scattered nulls elsewhere
        when(pmod(col("doc_id"), lit(8)) === 3 || col("doc_id") % 7 === 0, lit(null))
          .otherwise(col("n_chars")).as("len"),
        // negative + positive doubles exercise the sortable-bits ordering
        when(col("doc_id") % 11 === 0, lit(null))
          .otherwise((col("n_chars").cast("double") - 500.0) / 3.0).as("score"))
    val chunk = pmod(col("doc_id"), lit(8L))
    val enc = EncodePipeline.encodeColumns(df, col("doc_id"), chunk,
      Seq(EncodePipeline.ColSpec("text", encode(col("text"), "UTF-8")),
        EncodePipeline.ColSpec("len", col("len"), isLong = true),
        EncodePipeline.ColSpec("score", col("score"), isDouble = true))).cache()
    // bytes: never prunable
    assert(enc.filter(col("column") === "text")
      .filter(col("value_min").isNotNull || col("value_max").isNotNull).count() == 0)
    // long: stats match a direct group-by; the all-null chunk has none
    val expected = df.groupBy(chunk.as("chunk_id"))
      .agg(min("len").as("emin"), max("len").as("emax"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    enc.filter(col("column") === "len").collect().foreach { c =>
      val (emin, emax) = expected(c.chunk_id)
      assert(c.value_min == emin.map(_.asInstanceOf[Long]) &&
        c.value_max == emax.map(_.asInstanceOf[Long]),
        s"chunk ${c.chunk_id}: stats ${c.value_min}/${c.value_max} vs $emin/$emax")
    }
    assert(enc.filter(col("column") === "len" && col("chunk_id") === 3)
      .head().value_min.isEmpty, "all-null chunk must carry no stats")
    // double: stats are the SortableBits map of the true double min/max
    val expD = df.groupBy(chunk.as("chunk_id"))
      .agg(min("score").as("dmin"), max("score").as("dmax"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    enc.filter(col("column") === "score").collect().foreach { c =>
      val (dmin, dmax) = expD(c.chunk_id)
      assert(c.value_min.contains(fsstspark.util.SortableBits.fromDouble(dmin)) &&
        c.value_max.contains(fsstspark.util.SortableBits.fromDouble(dmax)),
        s"chunk ${c.chunk_id}: double stats mismatch")
    }
    // catalog pruning: range read returns exactly the overlapping chunks
    // PLUS every stat-less chunk of the column (conservative), and decode
    // over the pruned set finds every in-range row
    val root = java.nio.file.Files.createTempDirectory("tableio-zone").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    io.writeChunks(enc, "docs")
    val lens = df.select(col("len")).filter(col("len").isNotNull).as[Long].collect().sorted
    val (lo, hi) = (lens(lens.length / 3), lens(lens.length / 2))
    val pruned = io.chunksForValueRange(spark, "docs", "len", lo, hi).cache()
    val expectedIds = expected.collect {
      case (cid, (Some(mn), Some(mx)))
        if mn.asInstanceOf[Long] <= hi && mx.asInstanceOf[Long] >= lo => cid
    }.toSet + 3L // chunk 3 = all-null stats → conservatively read
    assert(pruned.select("chunk_id").as[Long].collect().toSet == expectedIds)
    val inRange = EncodePipeline.decodeLongsNullable(pruned)
      .filter(col("_2").isNotNull && col("_2") >= lo && col("_2") <= hi).count()
    assert(inRange == df.filter(col("len") >= lo && col("len") <= hi).count())
    // a bytes column is never prunable: every chunk comes back
    assert(io.chunksForValueRange(spark, "docs", "text", 0L, 0L).count() ==
      enc.filter(col("column") === "text").count())
    enc.unpersist(); pruned.unpersist()
  }

  test("zone maps survive mixed generations: pre-stats checkpoint and manifest rows read as unprunable") {
    import spark.implicits._
    val kv = Queries.docsKV(spark, sf)
    val enc = EncodePipeline.encodeBytesLocal(kv, "text", 32L << 10)
    // a checkpoint whose appends predate zone-map stats: same v3 marker
    // (the format version did not change — stats are nullable additions),
    // data files without the stats columns
    val path = java.nio.file.Files.createTempDirectory("ckpt-oldgen").toString + "/cp"
    val markerP = new org.apache.hadoop.fs.Path(path, "_fsst_format_version")
    val mfs = markerP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = mfs.create(markerP, true)
    out.write("3\n".getBytes("UTF-8")); out.close()
    enc.drop("value_min", "value_max")
      .write.mode("append").parquet(path)
    val back = Checkpoint.read(spark, path)
    assert(back.count() == enc.count())
    assert(back.filter(col("value_min").isNotNull).count() == 0)
    // decode still works through the explicit schema
    assert(EncodePipeline.decodeBytes(back).count() == kv.count())
    // a catalog whose manifest predates the stats columns: rewrite the
    // manifest without them; value-range reads treat every chunk as a hit
    val root = java.nio.file.Files.createTempDirectory("tableio-oldgen").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val lkv = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("string").as("key"), col("n_chars").cast("long").as("value")).as[LongKV]
    io.writeChunks(EncodePipeline.encodeLongs(lkv, "len", pmod(col("key").cast("long"), lit(8L))), "docs")
    val mDir = s"$root/docs/manifest"
    val stripped = spark.read.parquet(mDir).drop("value_min", "value_max").cache()
    stripped.count()
    val fsys = new org.apache.hadoop.fs.Path(mDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(mDir), true)
    stripped.write.partitionBy("batch").parquet(mDir)
    stripped.unpersist()
    val all = io.chunksForValueRange(spark, "docs", "len", Long.MaxValue - 1, Long.MaxValue)
    assert(all.count() == 8, "pre-stats manifest rows must be unprunable, not invisible")
    assert(io.manifest(spark, "docs").count() == 8)
  }

  test("time travel: as-of reads, snapshot-gated deletes, snapshot listing") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tableio-tt").toString
    val io = new fsstspark.io.ParquetTableIO(root)
    val kv = Queries.docsKV(spark, sf)
    val a = kv.filter(col("key") < "00000400")
    val b = kv.filter(col("key") >= "00000400")
    io.writeChunks(EncodePipeline.encodeBytesLocal(a, "text", 16L << 10), "docs")
    val snap1 = io.committedBatchIds(spark, "docs").max
    io.writeChunks(EncodePipeline.encodeBytesLocal(b, "text", 16L << 10), "docs")
    val snap2 = io.committedBatchIds(spark, "docs").max
    val victims = io.readChunks(spark, "docs")
      .filter(col("max_key") < "00000400").select("chunk_id", "column").cache()
    val nVictimRows = EncodePipeline.decodeBytes(
      io.readChunks(spark, "docs").join(victims, Seq("chunk_id", "column"), "left_semi")
        .as[ChunkResult]).count()
    assert(victims.count() > 0 && nVictimRows > 0)
    io.removeChunks(spark, "docs", victims)
    // snapshot 1: first batch only, delete not yet visible
    assert(EncodePipeline.decodeBytes(io.readChunksAsOf(spark, "docs", snap1)).count() == a.count())
    // snapshot 2: both batches, still pre-delete
    assert(EncodePipeline.decodeBytes(io.readChunksAsOf(spark, "docs", snap2)).count() == kv.count())
    // current: delete applied
    assert(EncodePipeline.decodeBytes(io.readChunks(spark, "docs")).count() ==
      kv.count() - nVictimRows)
    // snapshots: 2 appends + 1 delete-only, time-ordered, counts correct
    val snaps = io.snapshots(spark, "docs").collect()
    assert(snaps.length == 3)
    assert(snaps.map(_.getString(0)).toSeq == snaps.map(_.getString(0)).toSeq.sorted)
    assert(snaps(0).getString(0) == snap1 && snaps(1).getString(0) == snap2)
    assert(snaps(2).getLong(2) == 0L, "delete snapshot adds no chunks")
    assert(snaps(2).getLong(3) == victims.count(), "delete snapshot gates the victim pairs")
    assert(snaps.forall(_.getLong(1) > 0L), "commit_millis parses from the batch id")
    // a legacy immediate tombstone (gated_by null) applies to EVERY snapshot
    val legacyVictim = io.readChunksAsOf(spark, "docs", snap1)
      .select("chunk_id", "column").orderBy("chunk_id").limit(1)
      .withColumn("gated_by", lit(null).cast("string"))
    legacyVictim.write.mode("append").parquet(s"$root/docs/tombstones")
    val legacyId = legacyVictim.select("chunk_id").head().getLong(0)
    assert(io.readChunksAsOf(spark, "docs", snap1)
      .filter(col("chunk_id") === legacyId).count() == 0,
      "null-gated tombstones must hide the chunk in every snapshot")
    victims.unpersist()
  }
}
