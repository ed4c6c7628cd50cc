package fsstspark.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint / resume for the encode pipeline (SURVEY.md N9).
  *
  * Chunk results append to a Parquet checkpoint table ("Iceberg-shaped":
  * partitioned files + explicit metadata columns, SURVEY.md §7.0 — no
  * Iceberg runtime ships in this sandbox). Because chunk membership is a
  * pure function of row keys, a rerun encodes exactly the chunks whose ids
  * are absent from the checkpoint (`left_anti` join) and appending them
  * yields the same table a single uninterrupted run would have produced —
  * the resume-idempotence invariant.
  */
object Checkpoint {

  /** Chunk-id format generation. v3 = local chunk boundaries charge a
    * 32 B/row floor ([[EncodePipeline.RowFloorBytes]]) and key order is
    * UTF-8 binary; v2 = full-key FNV chunk ids ([[EncodePipeline.localChunkId]]
    * folds EVERY key); v1 (round-1) ids hashed only first/last key + count.
    * Any of these changes moves chunk boundaries or content order, so
    * resuming an older checkpoint would find no matching ids, re-encode
    * everything, and APPEND — leaving the table with every row under two
    * id generations (decode then emits duplicates). The version marker
    * makes that a hard error instead of silent duplication.
    */
  final val FormatVersion = 3
  private val MarkerName = "_fsst_format_version"

  def write(results: Dataset[ChunkResult], path: String): Unit = {
    writeVersionMarker(results.sparkSession, path)
    results.write.mode(SaveMode.Append).parquet(path)
  }

  private def writeVersionMarker(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, MarkerName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      // A marker-less checkpoint that already holds data files was written
      // by a pre-versioning build: stamping the CURRENT version onto it
      // would let future resumes pass checkVersion over mixed-generation
      // chunk ids — exactly the silent duplication the marker prevents.
      // Only a fresh/empty directory may be stamped.
      val dir = new org.apache.hadoop.fs.Path(path)
      if (fs.exists(dir) && fs.listStatus(dir).exists { st =>
            val n = st.getPath.getName
            !n.startsWith(".") && !n.startsWith("_")
          })
        throw new IllegalStateException(
          s"checkpoint at $path holds data but no version marker (pre-versioning format); " +
            s"appending v$FormatVersion chunk ids would mix id generations and decode would " +
            "duplicate rows — delete (or migrate) the checkpoint first")
      val out = fs.create(p, true)
      out.write(s"$FormatVersion\n".getBytes("UTF-8"))
      out.close()
    }
  }

  /** Refuse to resume against a checkpoint written under a different
    * chunk-id generation (or one predating the marker).
    */
  private def checkVersion(spark: SparkSession, path: String): Unit = {
    if (!exists(spark, path)) return
    val p = new org.apache.hadoop.fs.Path(path, MarkerName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val found =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        in.close()
        s.toIntOption
      }
    if (!found.contains(FormatVersion)) throw new IllegalStateException(
      s"checkpoint at $path is format ${found.map(_.toString).getOrElse("pre-versioning (v1)")} " +
        s"but this build writes v$FormatVersion chunk ids; resuming would duplicate every " +
        "chunk under a second id generation — delete (or migrate) the checkpoint first")
  }

  def read(spark: SparkSession, path: String): Dataset[ChunkResult] = {
    import spark.implicits._
    // explicit schema: a checkpoint whose early appends predate zone-map
    // stats holds mixed-generation files — pre-stats rows must read
    // value_min/value_max as null instead of leaving the resolved schema
    // to footer inference (which could drop the columns entirely)
    spark.read.schema(org.apache.spark.sql.Encoders.product[ChunkResult].schema)
      .parquet(path).as[ChunkResult]
  }

  /** Distinct (chunk_id, column) pairs already present in the checkpoint. */
  def completed(spark: SparkSession, path: String): DataFrame =
    if (!exists(spark, path)) {
      import spark.implicits._
      Seq.empty[(Long, String)].toDF("chunk_id", "column")
    } else spark.read.parquet(path).select("chunk_id", "column").distinct()

  /** Encode only the chunks not yet checkpointed, and append them.
    * Returns the number of chunks written this invocation.
    */
  def resumeBytes(
      ds: Dataset[KV],
      column: String,
      chunkId: org.apache.spark.sql.Column,
      path: String
  ): Long = {
    val spark = ds.sparkSession
    checkVersion(spark, path)
    val done = completed(spark, path).filter(col("column") === column)
      .select(col("chunk_id").as("done_chunk_id"))
    val pendingRows = ds
      .withColumn("chunk_id", chunkId.cast("long"))
      .join(broadcast(done), col("chunk_id") === col("done_chunk_id"), "left_anti")
      .drop("chunk_id", "done_chunk_id")
    import spark.implicits._
    val pending = pendingRows.as[KV]
    val results = EncodePipeline.encodeBytes(pending, column, chunkId)
    // Persist so the count and the write observe the same encode pass.
    results.persist()
    val n = results.count()
    if (n > 0) write(results, path)
    results.unpersist()
    n
  }

  /** Local-chunking resume: recompute the (deterministic) partition-local
    * chunking and encode only chunks whose content-derived id is absent
    * from the checkpoint — the "failed partition range resumes
    * idempotently" semantics for the zero-shuffle pipeline. The completed
    * id set collects to the driver as a primitive long array (8 bytes per
    * chunk; ~48 MB for the ~6M ids of 100 TB at 16 MB chunks) and ships
    * to executors as a broadcast sorted array searched by binary search —
    * never a boxed set inside each task closure.
    */
  def resumeBytesLocal(
      ds: Dataset[KV],
      column: String,
      path: String,
      targetChunkBytes: Long = 16L << 20
  ): Long = {
    val spark = ds.sparkSession
    checkVersion(spark, path)
    val done: Array[Long] =
      if (!exists(spark, path)) Array.emptyLongArray
      else spark.read.parquet(path).filter(col("column") === column)
        .select("chunk_id").distinct()
        .collect().map(_.getLong(0))
    val results = EncodePipeline.encodeBytesLocal(ds, column, targetChunkBytes, done)
    results.persist()
    val n = results.count()
    if (n > 0) write(results, path)
    results.unpersist()
    n
  }

  /** Multi-column resume for [[EncodePipeline.encodeColumns]] jobs: a
    * chunk counts as done only when EVERY column of the pass is present
    * (task output is all-or-nothing per chunk, but a killed run may have
    * committed a partial append), pending rows are filtered BEFORE the
    * encode (broadcast anti-join on chunk id — no wasted encode work),
    * and the freshly encoded results are additionally anti-joined against
    * the existing (chunk, column) pairs so a partially-written chunk
    * re-encodes without duplicating rows.
    */
  def resumeColumns(
      df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column,
      chunkId: org.apache.spark.sql.Column,
      specs: Seq[EncodePipeline.ColSpec],
      path: String
  ): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    checkVersion(spark, path)
    // Restrict to THIS pass's columns: checkpoint rows for columns outside
    // `specs` (an earlier run with a different spec list, or a resumeBytes
    // run sharing the path) must not count toward the per-chunk
    // "fully done" test below — a chunk could otherwise reach
    // count == specs.size with one of the current columns missing and be
    // silently skipped.
    val done = completed(spark, path)
      .filter(col("column").isin(specs.map(_.name): _*)) // (chunk_id, column) distinct
    val fullDone = done.groupBy("chunk_id").count()
      .filter(col("count") === specs.size.toLong)
      .select(col("chunk_id").as("done_chunk_id"))
    val pendingRows = df
      .withColumn("__chunk", chunkId.cast("long"))
      .join(broadcast(fullDone), col("__chunk") === col("done_chunk_id"), "left_anti")
      .drop("__chunk", "done_chunk_id")
    val enc = EncodePipeline.encodeColumns(pendingRows, key, chunkId, specs)
      .join(broadcast(done.withColumnRenamed("chunk_id", "c").withColumnRenamed("column", "n")),
        col("chunk_id") === col("c") && col("column") === col("n"), "left_anti")
      .as[ChunkResult]
    enc.persist()
    val n = enc.count()
    if (n > 0) write(enc, path)
    enc.unpersist()
    n
  }

  /** Zero-shuffle multi-column resume ([[EncodePipeline.encodeColumnsLocal]]):
    * a chunk is complete only when EVERY column of the pass is present; its
    * content-derived id then joins the broadcast skip array so no encode
    * work is spent on it. Chunks with a partial column set (a killed run's
    * torn append) re-encode fully, and the (chunk, column) anti-join drops
    * the rows that already landed — same idempotence contract as
    * [[resumeColumns]], with zero shuffles anywhere.
    */
  def resumeColumnsLocal(
      df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column,
      specs: Seq[EncodePipeline.ColSpec],
      path: String,
      targetChunkBytes: Long = 16L << 20
  ): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    checkVersion(spark, path)
    val names = specs.map(_.name)
    // ONE checkpoint scan feeds both consumers: the filtered (chunk,
    // column) pairs persist as a distributed frame; only the fully-done
    // ID ARRAY (primitive longs, the thing encodeColumnsLocal broadcasts
    // anyway) collects to the driver — the pair frame itself stays
    // cluster-side for the anti-join, never a driver LocalRelation (at
    // ~6M chunks × N columns that would be GBs of driver heap and plan).
    val donePairs =
      if (!exists(spark, path)) Seq.empty[(Long, String)].toDF("c", "n")
      else completed(spark, path).filter(col("column").isin(names: _*))
        .withColumnRenamed("chunk_id", "c").withColumnRenamed("column", "n")
    donePairs.persist()
    try {
      val doneIds: Array[Long] = donePairs.groupBy("c").count()
        .filter(col("count") === specs.size.toLong)
        .select("c").as[Long].collect()
      val enc = EncodePipeline.encodeColumnsLocal(df, key, specs, targetChunkBytes, doneIds)
        .join(broadcast(donePairs), col("chunk_id") === col("c") && col("column") === col("n"), "left_anti")
        .as[ChunkResult]
      enc.persist()
      val n = enc.count()
      if (n > 0) write(enc, path)
      enc.unpersist()
      n
    } finally donePairs.unpersist()
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
