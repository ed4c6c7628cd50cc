package fsstspark.tools

import fsstspark.pipeline.{Checkpoint, EncodePipeline, KV}
import fsstspark.queries.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profile of the `streaming_ingest` query shape (BENCH r3
  * regression diagnosis): separates source-materialization, the bare
  * batch-pipeline work (resumeBytesLocal on a static read), the Structured
  * Streaming machinery around the same work, and the verification read.
  *
  * Usage: runMain fsstspark.tools.StreamProbe [sfDir] [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // session warmup
    Queries.pagesFromDocs(spark, sf).count()

    for (rep <- 1 to reps) {
      val root = java.nio.file.Files.createTempDirectory(s"stream-probe-$rep").toString
      val (tSrc, _) = time {
        Queries.pagesFromDocs(spark, sf).coalesce(2)
          .write.mode("overwrite").parquet(s"$root/src")
      }
      val schema = spark.read.parquet(s"$root/src").schema

      // bare pipeline: identical work, no streaming machinery
      val (tBare, nBare) = time {
        val batch = spark.read.parquet(s"$root/src")
          .select(col("url").cast("string").as("key"),
            col("text").cast("binary").as("value")).as[KV]
        Checkpoint.resumeBytesLocal(batch, "text", s"$root/bare", 64L << 10)
      }

      // the streamed version of the same work
      val (tStream, _) = time {
        val q = fsstspark.streaming.StreamingEncode.start(spark, s"$root/src", schema,
          "url", "text", "text", s"$root/chunks", s"$root/state", targetChunkBytes = 64L << 10)
        q.awaitTermination()
      }

      // verification read (the rest of the query body)
      val (tVerify, bad) = time {
        val dec = EncodePipeline.decodeBytes(Checkpoint.read(spark, s"$root/chunks"))
        val orig = Queries.pagesFromDocs(spark, sf)
          .select(col("url").as("key"), encode(col("text"), "UTF-8").as("value")).as[KV]
        EncodePipeline.verify(orig, dec).filter(!col("matched")).count()
      }
      println(f"[probe] rep=$rep src=$tSrc%.2fs bare_pipeline=$tBare%.2fs ($nBare chunks) " +
        f"stream=$tStream%.2fs overhead=${tStream - tBare}%.2fs verify=$tVerify%.2fs mismatches=$bad")
    }
    spark.stop()
  }
}
