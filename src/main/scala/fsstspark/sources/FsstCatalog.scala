package fsstspark.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import fsstspark.io.ParquetTableIO

/** Read-only Spark `TableCatalog` over one chunk-catalog root: registers
  * the encoded tables as first-class SQL names, including SQL TIME
  * TRAVEL over the catalog's snapshot-addressable commit log.
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.fsst_cat", "fsstspark.sources.FsstCatalog")
  *   spark.conf.set("spark.sql.catalog.fsst_cat.root", "/data/catalogs/web")
  *   spark.conf.set("spark.sql.catalog.fsst_cat.stringColumns.pages", "url,text,lang")
  *
  *   spark.sql("SELECT count(*) FROM fsst_cat.pages WHERE key LIKE 'https://a%'")
  *   spark.sql("SELECT * FROM fsst_cat.pages VERSION AS OF 'b0000018c...'")
  *   spark.sql("SELECT * FROM fsst_cat.pages TIMESTAMP AS OF '2026-08-17 10:00:00'")
  * }}}
  *
  * `VERSION AS OF` takes a batch id (from [[ParquetTableIO.snapshots]]);
  * `TIMESTAMP AS OF` resolves to the newest batch committed at or before
  * the timestamp — batch ids lead with their creation millis, so the
  * mapping is a pure prefix parse. All pushdowns (column pruning, key/
  * zone/equality predicates, COUNT/MIN/MAX aggregates) work identically
  * on pinned snapshots: the scan simply plans from that snapshot's
  * manifest view. Writes go through the library's encode pipeline
  * (`encodeColumns[Local]` + `TableIO`), not SQL DDL — create/alter/
  * drop are rejected loudly.
  */
final class FsstCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _
  private var options: CaseInsensitiveStringMap = _

  override def initialize(name: String, opts: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    options = opts
    root = Option(opts.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root = <chunk catalog root>"))
  }

  override def name(): String = catalogName

  /** Single-level namespace: every committed table directly under root. */
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    val spark = SparkSession.active
    val io = new ParquetTableIO(root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Array.empty
    fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath.getName)
      .filter(t => io.tableExists(spark, t))
      .map(t => Identifier.of(Array.empty, t))
  }

  private def tableOptions(table: String, asOf: Option[String]): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String]()
    m.put("root", root)
    m.put("table", table)
    // per-table option passthrough: spark.sql.catalog.<cat>.<opt>.<table>
    Seq("stringColumns", "chunksPerPartition", "columnar").foreach { opt =>
      Option(options.get(s"$opt.$table")).foreach(v => m.put(opt, v))
    }
    asOf.foreach(m.put("asOf", _))
    new CaseInsensitiveStringMap(m)
  }

  private def load(ident: Identifier, asOf: Option[String]): Table = {
    if (ident.namespace.nonEmpty) throw new NoSuchTableException(ident)
    try FsstDataSource.resolve(tableOptions(ident.name, asOf))
    catch {
      // only genuine "table/snapshot missing" becomes NoSuchTable — a bad
      // option value (columnar=on, non-numeric chunksPerPartition, a
      // non-committed VERSION AS OF) must surface as the config error it is
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("no committed chunks") =>
        throw new NoSuchTableException(ident)
    }
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL `VERSION AS OF '<batch id>'`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version))

  /** SQL `TIMESTAMP AS OF ...` — Spark hands micros since epoch; the
    * snapshot is the newest batch whose COMMIT landed at or before it.
    * Commit time = the marker file's modification time, NOT the mint
    * millis embedded in the id: an external write mints its id at job
    * start but only becomes visible at job end, and a reproducibility
    * read must see the state the table actually had at that moment.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (ident.namespace.nonEmpty) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    val io = new ParquetTableIO(root)
    val cutoffMillis = Math.floorDiv(timestampMicros, 1000L)
    val hit = io.committedBatchCommitTimes(spark, ident.name)
      .filter(_._2 <= cutoffMillis)
      .sortBy(_._1).lastOption
    hit match {
      case Some((b, _)) => load(ident, Some(b))
      case None => throw new NoSuchTableException(ident)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty &&
      new ParquetTableIO(root).tableExists(SparkSession.active, ident.name)

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"fsst catalog '$catalogName' is read-only: $op is not supported — write through " +
        "EncodePipeline.encodeColumns[Local] + ParquetTableIO (or StreamingEncode)")

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}
