package fsstspark.io

import fsstspark.pipeline.EncodePipeline
import fsstspark.queries.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-format invariants that live below the pipeline surface:
  * batch-id ordering, legacy-layout detection, and manifest layout
  * stability across full vacuums.
  */
class TableIOSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("fsstspark-tableio-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("BatchClock: millis strictly increase even when minted faster than the wall clock ticks") {
    val vals = Array.fill(10000)(BatchClock.nextMillis())
    vals.sliding(2).foreach(p => assert(p(0) < p(1),
      "same-millisecond batch ids would order by their random suffix and break time travel"))
    // stays anchored to the wall clock (never runs ahead by more than the mint count)
    assert(vals.last <= System.currentTimeMillis() + vals.length)
  }

  test("legacy flat (pre-batch-partitioned) manifest fails loudly; repairManifest migrates") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("legacy-manifest").toString
    val io = new ParquetTableIO(root)
    val kv = Queries.docsKV(spark, sf)
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "text", 32L << 10), "docs")
    val nChunks = io.readChunks(spark, "docs").count()
    assert(io.manifest(spark, "docs").count() == nChunks)
    // simulate the round-≤3 layout: one manifest part file flat at the
    // manifest root instead of under its batch= partition
    val mRoot = new java.io.File(s"$root/docs/manifest")
    val part = mRoot.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(mRoot, "part-legacy.parquet").toPath)
    val e = intercept[IllegalStateException](io.manifest(spark, "docs").count())
    assert(e.getMessage.contains("repairManifest"),
      s"legacy manifest must point at the migration path, got: ${e.getMessage}")
    // the documented migration rebuilds the partitioned layout from data
    io.repairManifest(spark, "docs")
    assert(io.manifest(spark, "docs").count() == nChunks)
    val aKey = kv.select(min("key")).as[String].head()
    assert(EncodePipeline.decodeBytes(io.chunksForKey(spark, "docs", aKey))
      .filter(col("key") === aKey).count() == 1)
  }

  test("full vacuum leaves a manifest layout the next append extends cleanly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vacuum-all").toString
    val io = new ParquetTableIO(root)
    val kv = Queries.docsKV(spark, sf)
    io.writeChunks(EncodePipeline.encodeBytesLocal(kv, "text", 32L << 10), "docs")
    val all = io.readChunks(spark, "docs")
      .select(col("chunk_id"), col("column")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    io.removeChunks(spark, "docs", all.toDF("chunk_id", "column"))
    assert(io.vacuum(spark, "docs") > 0, "fully-dead table must reclaim files")
    assert(io.readChunks(spark, "docs").count() == 0)
    assert(io.manifest(spark, "docs").count() == 0)
    // the empty manifest must be in the partitioned layout: a flat
    // zero-row part file here would read as legacy AND collide with the
    // batch= directories this append creates. The appended content must
    // DIFFER from the vacuumed content — identical chunks would re-mint
    // the same content-derived ids, which stay tombstoned by design
    // (replay-safe ingest dedup)
    val half = kv.filter(xxhash64(col("key")) % 2 === 0)
    io.writeChunks(EncodePipeline.encodeBytesLocal(half, "text", 32L << 10), "docs")
    val n = io.readChunks(spark, "docs").count()
    assert(n > 0 && io.manifest(spark, "docs").count() == n)
    assert(EncodePipeline.verify(half, EncodePipeline.decodeBytes(io.readChunks(spark, "docs")))
      .filter(!col("matched")).count() == 0)
  }
}
