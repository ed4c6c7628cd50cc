package fsstspark.sources

import java.util.OptionalLong

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import fsstspark.codec.{BytesCodec, LongCodec}
import fsstspark.io.ParquetTableIO
import fsstspark.pipeline.EncodePipeline
import fsstspark.util.{Keys, SortableBits}

/** DataSource V2 read connector over the chunk catalog: exposes a table
  * written by [[fsstspark.pipeline.EncodePipeline.encodeColumns]] /
  * `encodeColumnsLocal` + [[fsstspark.io.ParquetTableIO]] to plain
  * `spark.read` / `spark.sql`, completing the "a user could switch"
  * story — no fsstspark API calls needed to query an encoded table.
  *
  * {{{
  *   spark.read.format("fsst")
  *     .option("root", catalogRoot).option("table", "pages")
  *     .option("stringColumns", "url,text")   // surface UTF-8 byte cols as string
  *     .load()                                 // or .load(s"$catalogRoot/pages")
  * }}}
  *
  * Output schema: `key string` + one column per stored column, typed from
  * the catalog itself — chunk codec names are self-describing
  * (`xor_f64` → double, a [[LongCodec.names]] name → long, a
  * [[BytesCodec.names]] name → binary; the two name sets are disjoint).
  *
  * Scale shape (the reason this is not a parquet view):
  *  - '''Column pruning is physical''': data files are partitioned by
  *    `(batch, column)`, so a projection never opens the other columns'
  *    files at all — checked by `DataSourceSpec`.
  *  - '''Filter pushdown prunes chunks at METADATA level''': key
  *    predicates test the manifest's `min_key`/`max_key` (UTF-8
  *    code-point order, [[Keys.compareUtf8]] — the order the encode
  *    pipeline records), value predicates test the zone maps
  *    (`value_min`/`value_max`; doubles through the order-preserving
  *    [[SortableBits.fromDouble]]). Surviving chunk ids become a parquet
  *    record filter (`chunk_id IN …`) so row-group statistics prune
  *    inside hit files too. Pruning is conservative (may keep a chunk
  *    with no matching rows), so every filter is also returned as a
  *    post-scan residual for Spark to re-evaluate — exactly the parquet
  *    source's contract.
  *  - '''Statistics''' ([[SupportsReportStatistics]]) come from manifest
  *    sums over the surviving chunks, so Catalyst can pick broadcast
  *    joins over small encoded tables.
  *  - An empty projection (`count(*)`) is answered from manifest row
  *    counts without opening any data file.
  *
  * Planning collects the pruned manifest hit list to the driver — the
  * same metadata-sized collect as [[ParquetTableIO.chunksForKey]] (one
  * row per surviving chunk × read column, no blobs). Committed-batch and
  * tombstone filtering ride on [[ParquetTableIO.manifest]], so a torn or
  * swapped-out batch is invisible here exactly as on the typed read path.
  */
final class FsstDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fsst"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FsstDataSource.resolve(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // Spark hands back inferSchema's result — build the table from it
    // instead of re-running resolve's manifest jobs (and racing a batch
    // commit between the two calls into a schema mismatch)
    val opts = new CaseInsensitiveStringMap(properties)
    if (schema != null && schema.nonEmpty) {
      val o = FsstDataSource.parseOptions(opts)
      new FsstTable(o.root, o.table, schema, o.chunksPerPartition, o.columnar, o.asOf,
        FsstCatalog.readColumnSince(SparkSession.active, o.root, o.table))
    } else FsstDataSource.resolve(opts)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object FsstDataSource {
  /** Open a catalog table: schema inference + option handling. Public —
    * this is also the programmatic way to reach the scan planner (tests
    * and the driver queries assert pruning through it). Byte columns are
    * surfaced as StringType when listed in `stringColumns` (the encode
    * side stored them via `encode(col, "UTF-8")`).
    */
  /** Parsed connector options. `asOf` pins the scan to a committed
    * snapshot (a batch id — what SQL `VERSION AS OF` resolves to).
    */
  private[sources] final case class FsstOptions(root: String, table: String,
      stringCols: Set[String], chunksPerPartition: Int, columnar: String,
      asOf: Option[String])

  private[sources] def parseOptions(options: CaseInsensitiveStringMap): FsstOptions = {
    val path = Option(options.get("path"))
    val (root, table) = (Option(options.get("root")), Option(options.get("table"))) match {
      case (Some(r), Some(t)) => (r, t)
      case _ =>
        val p = path.getOrElse(throw new IllegalArgumentException(
          "fsst source needs options root+table, or a load(path) of form <root>/<table>"))
        val cut = p.stripSuffix("/").lastIndexOf('/')
        require(cut > 0, s"fsst load path '$p' has no <root>/<table> split")
        (p.stripSuffix("/").substring(0, cut), p.stripSuffix("/").substring(cut + 1))
    }
    val stringCols = Option(options.get("stringColumns"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    val chunksPerPartition = Option(options.get("chunksPerPartition")).map(_.toInt).getOrElse(8)
    require(chunksPerPartition > 0, "chunksPerPartition must be positive")
    // columnar=off (default, MEASURED): vectors lose 2-3x on byte-heavy
    // scans (putByteArray copies multi-KB values the row path passes
    // zero-copy), lose ~1.5x on small mixed chunks (per-batch overhead),
    // and only TIE on the best case (1M-row longs-only chunks — decode,
    // not row materialization, bounds the scan). BASELINE.md r4b. The
    // reader stays in-tree: auto = fixed-width projections only, all =
    // every data scan.
    val columnar = Option(options.get("columnar")).getOrElse("off")
    require(Set("auto", "off", "all")(columnar), s"columnar must be auto|off|all, got '$columnar'")
    FsstOptions(root, table, stringCols, chunksPerPartition, columnar,
      Option(options.get("asOf")))
  }

  def resolve(options: CaseInsensitiveStringMap): FsstTable = {
    val o = parseOptions(options)
    val (root, table) = (o.root, o.table)
    val spark = SparkSession.active
    val io = new ParquetTableIO(root)
    // a DDL-declared schema is AUTHORITATIVE: a created-but-still-empty
    // table resolves (so INSERT INTO can bootstrap it), and declared
    // string columns stay strings after data lands (manifest inference
    // would surface them as binary).
    // Read order mirrors alterTable's WRITE order inverted: the ALTER
    // writes watermark-then-schema, so reading schema-then-watermark
    // makes a concurrent resolve land on the harmless side (old schema +
    // new stray watermark = inert) instead of the bricking side (new
    // column declared with no watermark ⇒ every pre-ALTER scan fails).
    val declaredSchema = FsstCatalog.readDeclaredSchema(spark, root, table)
    val columnSince = FsstCatalog.readColumnSince(spark, root, table)
    declaredSchema match {
      case Some(declared) =>
        o.asOf.foreach { b =>
          require(io.committedBatchIds(spark, table).contains(b),
            s"fsst table '$table': snapshot '$b' is not a committed batch id " +
              "(list them via ParquetTableIO.snapshots)")
        }
        // a snapshot predating an added column's watermark reads it as
        // all-null (the chunks in scope all null-pad) — Iceberg's
        // read-with-current-schema time-travel semantics
        return new FsstTable(root, table, declared, o.chunksPerPartition, o.columnar, o.asOf,
          columnSince)
      case None =>
    }
    require(io.tableExists(spark, table),
      s"fsst table '$table' at '$root' has no committed chunks")
    // a snapshot pin must NAME a committed batch: the `<= asOf` manifest
    // filter would otherwise silently resolve a typo to a neighboring
    // snapshot (or the full table) instead of erroring
    o.asOf.foreach { b =>
      require(io.committedBatchIds(spark, table).contains(b),
        s"fsst table '$table': snapshot '$b' is not a committed batch id " +
          "(list them via ParquetTableIO.snapshots)")
    }
    // one codec name per column suffices for typing: value KIND is constant
    // per column (mixed byte/long codecs in one column is table corruption,
    // which the reader's codec-id validation rejects loudly).
    // A snapshot pin infers its schema from that snapshot's manifest.
    def colsOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("column").agg(org.apache.spark.sql.functions.first("codec").as("codec"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1)
    var cols = colsOf(io.manifestOpt(spark, table, o.asOf))
    // a fully-TRUNCATED table still resolves: deletes don't change column
    // types, so typing falls back to the manifest without tombstone
    // filtering (the ingest-ledger view) — restricted to the snapshot's
    // batches when pinned, or a `VERSION AS OF` an all-deleted snapshot
    // would type itself from columns added AFTER the snapshot
    if (cols.isEmpty) {
      val batches = io.committedBatchIds(spark, table)
      val inScope = o.asOf match {
        case Some(b) => batches.filter(_ <= b)
        case None => batches
      }
      cols = colsOf(io.manifestForBatches(spark, table, inScope.toIndexedSeq))
    }
    // reachable even though tableExists passed: a catalog holding only
    // data-less delete batches has commit markers but no manifest rows
    require(cols.nonEmpty, s"fsst table '$table' at '$root' has no readable columns")
    require(!cols.exists(_._1 == "key"), "stored column named 'key' collides with the key field")
    val longNames = LongCodec.names.values.toSet
    val fields = StructField("key", StringType, nullable = false) +: cols.map { case (name, codec) =>
      val dt =
        if (codec.endsWith(EncodePipeline.DoubleCodecSuffix)) DoubleType
        else if (longNames.contains(codec)) LongType
        else if (o.stringCols.contains(name)) StringType
        else BinaryType
      StructField(name, dt, nullable = true)
    }
    // columnSince rides the inferred path too: today a watermark always
    // coexists with a declared schema (alterTable writes the watermark
    // first, then the schema), but a manifest carrying every column
    // PLUS a stray watermark must still null-pad correctly rather than
    // hard-fail on pre-evolution batches
    new FsstTable(root, table, StructType(fields), o.chunksPerPartition, o.columnar, o.asOf,
      columnSince)
  }
}

final class FsstTable(root: String, tableName: String, tableSchema: StructType,
    chunksPerPartition: Int, columnarMode: String = "off",
    asOf: Option[String] = None, columnSince: Map[String, String] = Map.empty)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** `_chunk_id` — the storage group a row lives in, surfaced as a
    * METADATA column (Iceberg's `_file` analogue at this catalog's group
    * granularity). Hidden from `SELECT *`, selectable explicitly, and the
    * group identity row-level operations runtime-filter on:
    * [[FsstScan]] implements `SupportsRuntimeFiltering` over it and
    * [[FsstRowLevelOperation]] declares it required, which is what lets
    * Spark's `RowLevelOperationRuntimeGroupFiltering` narrow a MERGE's
    * rewrite to the groups its source rows actually touch. A table
    * declaring its own `_chunk_id` DATA column shadows it (Spark hides
    * the metadata column; the scan keeps treating the name as stored).
    */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = FsstScan.ChunkIdCol
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      // nullable (the default): a MERGE's NOT MATCHED inserts carry NULL
      // for the metadata attrs of rows that have no source chunk yet
      override def comment(): String = "id of the encoded chunk holding this row"
    })

  override def name(): String =
    s"fsst.`$root`.`$tableName`" + asOf.map(b => s" AS OF $b").getOrElse("")
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FsstScanBuilder(root, tableName, tableSchema, chunksPerPartition, columnarMode, asOf,
      columnSince)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder = {
    require(asOf.isEmpty, "cannot write to a snapshot-pinned fsst table")
    new FsstWriteBuilder(root, tableName, tableSchema, info)
  }

  /** SQL `UPDATE` / `MERGE INTO` / subquery-conditioned `DELETE` — the
    * group-based copy-on-write rewrite ([[FsstRowLevelOperation]]).
    * Translatable DELETE predicates never execute here:
    * `OptimizeMetadataOnlyDeleteFromTable` converts them back to
    * [[deleteWhere]] because [[canDeleteWhere]] accepts them.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo):
      org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(asOf.isEmpty, "cannot modify a snapshot-pinned fsst table")
    () => new FsstRowLevelOperation(root, tableName, tableSchema, chunksPerPartition,
      info.command(), columnSince)
  }

  /** `DELETE FROM`, two tiers (both snapshot-atomic and time-travelable):
    *  - METADATA delete when the key predicate covers whole chunks
    *    exactly (every chunk fully inside or fully outside): victims
    *    tombstone through the catalog's snapshot-gated delete batch —
    *    no data file is read. `TRUNCATE TABLE` is the always-true case.
    *  - COPY-ON-WRITE delete for any other Catalyst-evaluable predicate
    *    ([[FsstRowDelete]]): the chunks that may contain matches are
    *    pruned via the manifest, decoded, re-encoded without the
    *    matching rows, and swapped in atomically (replaceChunks) — the
    *    Iceberg copy-on-write DELETE mode.
    */
  // canDeleteWhere → deleteWhere run on the same Table instance within
  // one DELETE: cache the victims so the manifest is scanned ONCE, and
  // so a concurrent commit between the two calls cannot flip an
  // accepted delete into a mid-execution failure (the plan-time answer
  // is the one executed — standard snapshot-at-plan semantics)
  @volatile private var cachedDelete: Option[(Seq[Filter], Option[org.apache.spark.sql.DataFrame])] = None

  private def victimsFor(filters: Array[Filter]): Option[org.apache.spark.sql.DataFrame] =
    cachedDelete match {
      case Some((k, v)) if k == filters.toSeq => v
      case _ =>
        val v = FsstScan.chunkAlignedVictims(root, tableName, filters)
        cachedDelete = Some((filters.toSeq, v))
        v
    }

  // chunk-aligned predicates delete as pure metadata; anything Catalyst
  // can evaluate on decoded rows deletes as a copy-on-write rewrite —
  // but only when the table STATE is rewrite-capable: [[FsstRowDelete]]
  // refuses schema-evolved victim chunks and duplicate live instances at
  // execution (hard DELETE failure), while the group-based
  // [[FsstRowLevelOperation]] path Spark falls back to on `false`
  // null-pads evolved columns and rewrites identical-content duplicate
  // instances correctly. Routing those states there turns a refusal
  // into a working DELETE.
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOf.isEmpty && (victimsFor(filters).isDefined ||
      (FsstRowDelete.supports(filters, tableSchema) && columnSince.isEmpty &&
        noDuplicateLiveInstances()))

  /** Any (chunk_id, column) with more than one live instance anywhere in
    * the table? One distributed manifest aggregate, limit-1 collect —
    * conservative (table-level, not victim-level), which only ever
    * routes MORE deletes to the group-based path that handles them.
    * Memoized per Table instance under the same snapshot-at-plan
    * contract as [[cachedDelete]]: Spark probes `canDeleteWhere` twice
    * per accepted DELETE (the metadata-only optimizer rule, then the
    * strategy), and the manifest aggregate must not run twice —
    * [[deleteWhere]] clears it with the victim cache.
    */
  @volatile private var cachedNoDup: Option[Boolean] = None

  private def noDuplicateLiveInstances(): Boolean = cachedNoDup.getOrElse {
    import org.apache.spark.sql.functions.col
    val spark = SparkSession.active
    val r = FsstScan.liveInstanceCounts(
        new ParquetTableIO(root).manifestOpt(spark, tableName, None), None)
      .filter(col("live") > 1).isEmpty
    cachedNoDup = Some(r)
    r
  }

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(asOf.isEmpty, "cannot delete from a snapshot-pinned fsst table")
    val spark = SparkSession.active
    victimsFor(filters) match {
      case Some(victims) =>
        // a delete matching nothing commits nothing (no empty delete batch)
        if (!victims.isEmpty)
          new ParquetTableIO(root).removeChunks(spark, tableName, victims)
      case None =>
        // boundary-crossing predicate: Iceberg copy-on-write semantics —
        // rewrite the affected chunks without the matching rows under one
        // atomic snapshot (replaceChunks), so every read path (typed,
        // connector, time travel) stays consistent
        FsstRowDelete.deleteRows(spark, root, tableName, tableSchema, filters)
    }
    // the plan-time answers are now stale: a reused Table instance must
    // recompute for any further DELETE with the same filters
    cachedDelete = None
    cachedNoDup = None
  }
}

/** One pushed aggregate, reduced to what the manifest can answer:
  * `COUNT(*)` = sum of chunk row counts; `MIN`/`MAX` over the key or a
  * zone-mapped long/double column = fold of the chunk stats. Exact, not
  * an estimate: zone maps store true min/max over non-null values (SQL
  * MIN/MAX ignore nulls) and key ranges are true bounds in the same
  * UTF-8 code-point order Spark compares strings in.
  */
private[sources] sealed trait AggSpec extends Serializable
private[sources] case object CountStarSpec extends AggSpec
private[sources] final case class MinMaxSpec(column: String, isMin: Boolean,
    dataType: DataType) extends AggSpec

final class FsstScanBuilder(root: String, table: String, tableSchema: StructType,
    chunksPerPartition: Int, columnarMode: String = "off",
    asOf: Option[String] = None, columnSince: Map[String, String] = Map.empty,
    rowLevel: Option[FsstRowLevelOperation] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  /** Anchor-eligible columns (live in EVERY live chunk instance) —
    * memoized across the builder's two aggSpecs probes
    * (supportCompletePushDown, then pushAggregation).
    */
  private lazy val everyInstanceColsV: Seq[String] = {
    val declared = tableSchema.fieldNames.drop(1).toSeq
    FsstScan.everyInstanceCols(
      new ParquetTableIO(root).manifestOpt(SparkSession.active, table, asOf),
      declared, declared)
  }

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var sawFilters = false
  private var agg: Option[(StructType, Array[AggSpec])] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // after an aggregate pushdown the read schema IS the agg schema;
    // otherwise preserve our field order/types (Spark's set may reorder).
    // The `_chunk_id` METADATA column is kept (appended last) unless the
    // table shadows it with a stored column of the same name.
    if (agg.isEmpty) {
      val names = requiredSchema.fieldNames.toSet
      val stored = tableSchema.fields.filter(f => names.contains(f.name))
      val meta =
        if (names.contains(FsstScan.ChunkIdCol) &&
            !tableSchema.fieldNames.contains(FsstScan.ChunkIdCol))
          Array(StructField(FsstScan.ChunkIdCol, LongType))
        else Array.empty[StructField]
      required = StructType(stored ++ meta)
    }

  /** Keep the filters usable for metadata pruning; hand EVERY filter back
    * as a residual — chunk-granular pruning is conservative, so Spark
    * must re-evaluate exactly (same split as the parquet source).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val longOrDouble = tableSchema.fields
      .filter(f => f.dataType == LongType || f.dataType == DoubleType).map(_.name).toSet
    sawFilters = filters.nonEmpty
    pushed = filters.filter(FsstScan.prunable(_, longOrDouble))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) / MIN / MAX answered entirely from the manifest — a
    * full-table aggregate at 100 TB becomes a metadata read. Complete
    * (exact) pushdown only: refused whenever any filter is present
    * (Spark would not offer it then either — every filter of ours is a
    * post-scan residual), the aggregation has group-bys, any function is
    * something else, or a referenced column has a chunk without stats
    * (all-null chunk or pre-stats writer — MIN/MAX would need the data).
    */
  private def aggSpecs(aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation):
      Option[Array[AggSpec]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    // a row-level operation scan must surface full rows of matched groups.
    // An EMPTY aggregate list is real: an outer count() over our audit
    // aggregates lets the optimizer strip the inner agg's functions and
    // push an Aggregation with zero expressions — refusing it hands the
    // (trivial) aggregate back to Spark; accepting it would leave aggRow
    // folding nothing.
    if (rowLevel.isDefined || sawFilters || aggregation.groupByExpressions.nonEmpty ||
        aggregation.aggregateExpressions.isEmpty) return None
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          tableSchema.fields.find(_.name == nr.fieldNames()(0))
        case _ => None
      }
    val specs: Array[Option[AggSpec]] = aggregation.aggregateExpressions.map {
      case _: CountStar => Some(CountStarSpec)
      case m: Min => colOf(m.column).collect {
        case f if f.name == "key" || f.dataType == LongType || f.dataType == DoubleType =>
          MinMaxSpec(f.name, isMin = true, f.dataType)
      }
      case m: Max => colOf(m.column).collect {
        case f if f.name == "key" || f.dataType == LongType || f.dataType == DoubleType =>
          MinMaxSpec(f.name, isMin = false, f.dataType)
      }
      case _ => None
    }
    if (specs.exists(_.isEmpty)) None
    else {
      val flat = specs.map(_.get)
      // COUNT(*) and key MIN/MAX fold over an ANCHOR column's manifest
      // rows, which must exist in every batch — refuse when no such
      // column exists (key-only declared tables, or every original
      // column dropped with only post-ALTER columns left AND batches
      // predating their watermarks)
      val needsAnchor = flat.exists {
        case CountStarSpec => true
        case MinMaxSpec(c, _, _) => c == "key"
      }
      if (needsAnchor && everyInstanceColsV.isEmpty) return None
      val statCols = flat.collect { case MinMaxSpec(c, _, _) if c != "key" => c }.distinct
      if (statCols.isEmpty || statsComplete(statCols.toIndexedSeq)) Some(flat) else None
    }
  }

  /** Every chunk of every referenced column must carry zone stats, or the
    * fold would silently drop an all-null/pre-stats chunk's contribution.
    * One metadata-sized manifest read, memoized across the support/push
    * call pair.
    */
  private lazy val statsCompleteCache = mutable.Map.empty[Seq[String], Boolean]
  private def statsComplete(cols: Seq[String]): Boolean =
    statsCompleteCache.getOrElseUpdate(cols.sorted, {
      val io = new ParquetTableIO(root)
      val spark = SparkSession.active
      io.manifestOpt(spark, table, asOf)
        .filter(org.apache.spark.sql.functions.col("column").isin(cols: _*))
        .filter(org.apache.spark.sql.functions.col("value_min").isNull)
        .isEmpty
    })

  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    aggSpecs(aggregation).isDefined

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    aggSpecs(aggregation) match {
      case Some(specs) =>
        val fields = specs.map {
          case CountStarSpec => StructField("count(*)", LongType, nullable = false)
          case MinMaxSpec(c, isMin, dt) =>
            StructField(s"${if (isMin) "min" else "max"}($c)", dt, nullable = true)
        }
        agg = Some((StructType(fields.toSeq), specs))
        true
      case None => false
    }

  override def build(): Scan =
    new FsstScan(root, table, tableSchema, required, pushed, chunksPerPartition, agg,
      columnarMode, asOf, columnSince, rowLevel)
}

/** One fetched column of a partition: every chunk in the group has its
  * (key_blob, value_blob) row for `column` inside `file`. `file == ""`
  * marks a column ABSENT from this partition's chunks (the chunks
  * predate the column's schema-evolution watermark) — the reader emits
  * NULL for it.
  */
final case class ColFile(column: String, file: String)

/** A group of chunks sharing one data file per fetched column. `nRows`
  * aligns with `chunkIds` (manifest row counts — the metadata-only
  * `count(*)` path). `readValues` = false for key-only scans: the reader
  * then projects value_blob out of the parquet read entirely (the anchor
  * column's compressed values are never pulled off disk).
  */
final case class ChunkGroupPartition(chunkIds: Array[Long], nRows: Array[Long],
    colFiles: Array[ColFile], readValues: Boolean = true) extends InputPartition

/** The single row of a fully-pushed aggregate, computed on the driver
  * from the manifest. Values are plain JVM types (String for key
  * bounds — converted to UTF8String in the reader).
  */
final case class AggRowPartition(values: Array[Any]) extends InputPartition

final class FsstScan(root: String, table: String, tableSchema: StructType,
    required: StructType, filters: Array[Filter], chunksPerPartition: Int,
    agg: Option[(StructType, Array[AggSpec])] = None, columnarMode: String = "off",
    asOf: Option[String] = None, columnSince: Map[String, String] = Map.empty,
    rowLevel: Option[FsstRowLevelOperation] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Every manifest read in this scan honors the snapshot pin. */
  private def manifestDf(spark: SparkSession, io: ParquetTableIO) =
    io.manifestOpt(spark, table, asOf)

  /** Anchor-eligible columns over ONE manifest snapshot. Admission and
    * the read that rides it must see the SAME view: `manifestOpt` pins
    * its committed-batch set at call time, so a per-column compaction
    * committing between an admission call and a fold over a SECOND
    * manifestOpt call could silently shift the anchor's row set under
    * the fold. aggRow and computePlanInner therefore derive both from
    * one DataFrame (no cross-call memoization by design).
    */
  private def anchorColsOn(m: org.apache.spark.sql.DataFrame): Seq[String] = {
    val declared = tableSchema.fieldNames.drop(1).toSeq
    FsstScan.everyInstanceCols(m, declared, declared)
  }

  // ------------------------------------------ runtime group filtering
  // Spark's RowLevelOperationRuntimeGroupFiltering (and DPP on an
  // explicit `_chunk_id` join) narrows this scan AT EXECUTION to the
  // chunk ids a probe query actually matched: BatchScanExec calls
  // `filter(...)` then re-plans input partitions. The id set pushes
  // into the manifest parquet read, so a selective MERGE plans (and its
  // row-level write later tombstones) only the touched groups — without
  // this, a MERGE's ON join gives the planner nothing static to prune
  // with and every chunk would be rewritten.
  @volatile private var runtimeChunkIds: Option[Set[Long]] = None
  @volatile private var cachedPlan: (Array[ChunkGroupPartition], Long, Long) = _

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // advertised ONLY when this scan outputs the metadata column: Spark's
    // join-DPP rule (PartitionPruning) resolves these refs against the
    // scan relation's OUTPUT and throws on a miss, so a plain pruned scan
    // must advertise nothing. Row-level operation scans always qualify —
    // the operation's requiredMetadataAttributes forces `_chunk_id` into
    // the projection, which is what RowLevelOperationRuntimeGroupFiltering
    // resolves against. (A table shadowing the name with a DATA column
    // keeps it out of `required`'s metadata set via pruneColumns, and the
    // stored column is not group identity — advertise nothing then too.)
    if (agg.isEmpty && required.fieldNames.contains(FsstScan.ChunkIdCol) &&
        !tableSchema.fieldNames.contains(FsstScan.ChunkIdCol))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column(FsstScan.ChunkIdCol))
    else Array.empty

  override def filter(runtime: Array[Filter]): Unit = {
    val idSets = runtime.collect {
      case In(FsstScan.ChunkIdCol, vs) =>
        vs.iterator.collect { case l: java.lang.Long => l.longValue() }.toSet
      case EqualTo(FsstScan.ChunkIdCol, l: java.lang.Long) => Set(l.longValue())
    }
    if (idSets.nonEmpty) {
      val merged = idSets.reduce(_ intersect _)
      runtimeChunkIds = Some(runtimeChunkIds.fold(merged)(_ intersect merged))
      cachedPlan = null // re-plan under the narrowed id set
    }
  }

  override def readSchema(): StructType = agg.map(_._1).getOrElse(required)
  override def toBatch: Batch = this
  override def description(): String = {
    val fs = if (filters.isEmpty) "" else filters.mkString(" PrunedBy: [", ", ", "]")
    val ag = agg.map(a => s" PushedAggregates: [${a._1.fieldNames.mkString(",")}]").getOrElse("")
    s"FsstScan $root/$table cols=[${readSchema().fieldNames.mkString(",")}]$fs$ag"
  }

  /** Aggregate mode: fold the manifest stats into the one result row —
    * no data file is ever opened, and the fold itself is a DISTRIBUTED
    * aggregation over the manifest (the driver collects exactly one
    * row — at 100 TB the previous shape collected O(chunks) stat rows).
    * Exactness argument: COUNT(*) sums n_rows (nulls included, as SQL
    * counts them) over one column's chunks (every chunk carries each row
    * exactly once per column); MIN/MAX over the key fold the true
    * per-chunk key bounds — Spark's string MIN/MAX compare in UTF8String
    * binary order, which is the UTF-8 code-point order the encode side
    * recorded ([[Keys.compareUtf8]]); MIN/MAX over a long/double column
    * fold true non-null bounds (SQL MIN/MAX ignore nulls — `min`/`max`
    * skip the null stats of all-null chunks natively), doubles through
    * the order-preserving SortableBits map — and the builder refused the
    * pushdown if ANY chunk lacked stats.
    */
  private def aggRow(specs: Array[AggSpec]): Array[Any] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, max, min, sum, when}
    val spark = SparkSession.active
    val io = new ParquetTableIO(root)
    // ONE pinned snapshot for BOTH the anchor admission and the fold —
    // a compaction committing between two manifestOpt calls could
    // otherwise invalidate the anchor under the fold silently
    val mdf = manifestDf(spark, io)
    // COUNT/key-bound folds ride a column present in EVERY live chunk
    // instance (aggSpecs refused the pushdown when none existed at
    // probe time; a concurrent rewrite since then surfaces here loudly)
    val anchor = anchorColsOn(mdf)
      .headOption.getOrElse(throw new IllegalStateException(
        s"table '$table': aggregate fold with no every-instance anchor column — " +
          "refused at probe time, or the layout changed under the fold " +
          "(concurrent per-column rewrite); retry the query"))
    val aggExprs = specs.zipWithIndex.map {
      case (CountStarSpec, i) =>
        coalesce(sum(when(col("column") === anchor, col("n_rows"))), lit(0L)).as(s"a$i")
      case (MinMaxSpec("key", isMin, _), i) =>
        (if (isMin) min(when(col("column") === anchor, col("min_key")))
         else max(when(col("column") === anchor, col("max_key")))).as(s"a$i")
      case (MinMaxSpec(c, isMin, _), i) =>
        (if (isMin) min(when(col("column") === c, col("value_min")))
         else max(when(col("column") === c, col("value_max")))).as(s"a$i")
    }
    val row = mdf.agg(aggExprs.head, aggExprs.tail.toIndexedSeq: _*).head()
    specs.zipWithIndex.map {
      case (CountStarSpec, i) => java.lang.Long.valueOf(row.getLong(i))
      case (MinMaxSpec("key", _, _), i) =>
        if (row.isNullAt(i)) null else row.getString(i)
      case (MinMaxSpec(_, _, dt), i) =>
        if (row.isNullAt(i)) null
        else if (dt == DoubleType) java.lang.Double.valueOf(SortableBits.toDouble(row.getLong(i)))
        else java.lang.Long.valueOf(row.getLong(i))
    }
  }

  /** Driver-side plan: prune the manifest with the pushed filters, then
    * group surviving chunks by their per-column file tuple. Chunks group
    * by (chunk_id, batch) — the batch parsed from the data file path — so
    * a chunk id REUSED across append batches (hash-mode ids are bucket
    * indexes in every batch) reads as the separate physical chunks it is;
    * the typed decodeColumns path rejects that state, the connector
    * serves it. Cached — `estimateStatistics` and `planInputPartitions`
    * both use it.
    *
    * SCALE SHAPE: the column projection, key-range predicates, and zone
    * predicates are applied as CATALYST filters on the manifest
    * DataFrame BEFORE the collect ([[FsstScan.pruneManifest]]) — the
    * manifest is parquet, so they prune at row-group level exactly like
    * [[ParquetTableIO.chunksForKey]], and the driver collects
    * O(surviving chunks × fetched columns) rows, never
    * O(chunks × columns). [[FsstScan.planFromManifest]] re-applies the
    * same predicates driver-side as a residual (idempotent) and keeps
    * only the grouping role.
    */
  private def plan: (Array[ChunkGroupPartition], Long, Long) = {
    val p = cachedPlan
    if (p != null) p
    else { val fresh = computePlan(); cachedPlan = fresh; fresh }
  }

  private def computePlan(): (Array[ChunkGroupPartition], Long, Long) = {
    // ONE manifestOpt snapshot spans the whole planning pass — anchor
    // admission, the plan collect, AND the duplicate-sibling victims
    // guard below (a second snapshot could judge the guard against a
    // committed set the plan never saw)
    val spark = SparkSession.active
    val io = new ParquetTableIO(root)
    val mdf = manifestDf(spark, io)
    val res = computePlanInner(spark, io, mdf)
    // record the planned victims for the row-level write's commit: every
    // (chunk_id, column) manifest row of every planned instance. Distinct
    // collapses duplicate-id instances across batches — ONE batch-gated
    // tombstone kills them all, and all were read. Assigned on EVERY
    // planning pass (including the empty one): runtime group filtering
    // RE-plans this scan, and victims MUST mirror the plan that actually
    // executed — a probe that matched nothing means nothing was read, so
    // nothing may be tombstoned (stale victims from the pre-filter pass
    // would silently delete unread chunks).
    rowLevel.foreach { op =>
      val victims = res._1.iterator.flatMap(p =>
        p.colFiles.iterator.filter(_.file.nonEmpty).flatMap(cf =>
          p.chunkIds.iterator.map(id => (id, cf.column)))).toArray.distinct
      // tombstones are id-granular across all gated batches, so EVERY
      // live instance of a victim id must have been planned (and thus
      // read + rewritten). Identical-content duplicates always prune
      // identically and pass; bucket-mode ids can repeat with DIFFERENT
      // content across batches, where key/zone pruning may keep one
      // sibling and drop the other — committing would delete the
      // never-read sibling. Skipped when nothing pruned (no pushed
      // filters, no runtime ids ⇒ every live instance is planned by
      // construction — the unfiltered MERGE pre-pass pays nothing);
      // otherwise a distributed live-vs-planned join that collects at
      // most the one violating row.
      if (victims.nonEmpty && (filters.nonEmpty || runtimeChunkIds.isDefined)) {
        val plannedPerId: Map[Long, Int] = res._1.iterator.flatMap(_.chunkIds.iterator)
          .toArray.groupBy(identity).view.mapValues(_.length).toMap
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val plannedDf = plannedPerId.toSeq.toDF("chunk_id", "planned")
        val bad = FsstScan.liveInstanceCounts(mdf,
            Some(plannedPerId.keys.toSeq))
          .join(plannedDf, "chunk_id")
          .filter(col("live") > col("planned"))
          .limit(1).collect()
        bad.headOption.foreach { r =>
          throw new IllegalStateException(
            s"row-level $table rewrite: chunk ${r.getLong(0)} has ${r.getLong(1)} live " +
              s"instances but pruning planned only ${r.getInt(2)} — the id-granular " +
              "tombstone would delete the unplanned sibling(s) without rewriting them " +
              "(duplicate chunk ids with diverging content across batches); compact the " +
              "table first")
        }
      }
      op.plannedVictims = Some(victims)
    }
    res
  }

  private def computePlanInner(spark: SparkSession, io: ParquetTableIO,
      mdf: org.apache.spark.sql.DataFrame): (Array[ChunkGroupPartition], Long, Long) = {
    // an EMPTY runtime id set means the probe matched no groups at all —
    // nothing to read, nothing to rewrite
    if (runtimeChunkIds.exists(_.isEmpty)) return (Array.empty, 0L, 0L)
    val stored = FsstScan.storedFields(required, tableSchema)
    val valueFields = stored.fieldNames.filter(_ != "key").toSeq
    // a row-level rewrite replaces whole chunks, so the scan MUST carry
    // every stored column — Spark plans ReplaceData over full rows; a
    // pruned projection here would mean silently dropping the unfetched
    // columns of every rewritten chunk
    rowLevel.foreach { _ =>
      val allVals = tableSchema.fieldNames.filter(_ != "key").toSet
      require(valueFields.toSet == allVals,
        s"row-level operation scan fetches [${valueFields.mkString(",")}] but the table " +
          s"stores [${allVals.toSeq.sorted.mkString(",")}]")
    }
    // stats columns: every filtered long/double column, even if not projected
    val statCols = filters.flatMap(FsstScan.references).filter(c =>
      tableSchema.fields.exists(f => f.name == c &&
        (f.dataType == LongType || f.dataType == DoubleType))).toSet
    val doubleCols = tableSchema.fields.filter(_.dataType == DoubleType).map(_.name).toSet
    // the runtime id set is EXACT on chunk_id: push it into the manifest
    // parquet scan when small (the common selective-DML case); a huge set
    // (barely-selective probe) stays driver-side — the collected rows are
    // filtered by set membership below, so victims are exact either way
    // and a giant In expression never reaches the parquet reader
    // `mdf` is the plan-wide manifestOpt snapshot (see computePlan):
    // anchor admission and the plan collect see the same committed set
    val m = runtimeChunkIds.filter(_.size <= FsstScan.RuntimeIdPushdownLimit)
      .fold(mdf)(ids =>
        mdf.filter(org.apache.spark.sql.functions.col("chunk_id").isInCollection(ids)))
    // a counting/anchor column must be live in EVERY live chunk
    // instance — instance-exact, not watermark arithmetic (per-column
    // rewrites break the proxy; see [[FsstScan.everyInstanceCols]]).
    // lazy: a plain value projection never runs the coverage aggregate
    lazy val anchorCols = anchorColsOn(mdf)
    if (valueFields.isEmpty && statCols.isEmpty && !stored.fieldNames.contains("key") &&
        anchorCols.nonEmpty) {
      // empty projection, no value filters: count rows straight off the
      // manifest (any single column counts each chunk's rows exactly once);
      // the key predicate is pushed into the manifest parquet scan, the
      // driver-side keySurvives is the idempotent residual
      val anchor = anchorCols.head
      val rows = m
        .filter(org.apache.spark.sql.functions.col("column") === anchor)
        .filter(FsstScan.keyPruneCond(filters))
        .select("chunk_id", "n_rows", "min_key", "max_key")
        .collect()
        .filter(r => FsstScan.keySurvives(r.getString(2), r.getString(3), filters))
        .filter(r => runtimeChunkIds.forall(_.contains(r.getLong(0))))
      val parts = rows.grouped(chunksPerPartition).map { g =>
        ChunkGroupPartition(g.map(_.getLong(0)), g.map(_.getLong(1)), Array.empty)
      }.toArray
      (parts, rows.map(_.getLong(1)).sum, 0L)
    } else {
      // key-only scans anchor on the globally smallest every-batch
      // column (by manifest bytes) — resolved with a distributed
      // aggregate, not by collecting the manifest to look. A projection
      // of ONLY evolved columns rides a base column so pre-evolution
      // chunks still surface (null-padded).
      val evolved = columnSince.keySet
      lazy val baseAnchor: Option[String] = FsstScan.smallestColumn(
        m.filter(org.apache.spark.sql.functions.col("column").isin(anchorCols: _*)))
      val (fetch, readValues) =
        if (valueFields.nonEmpty)
          (if (valueFields.forall(evolved.contains)) valueFields ++ baseAnchor.toSeq
           else valueFields, true)
        else (baseAnchor.toSeq, false)
      // an anchorless plan over live DECLARED rows would silently LOSE
      // rows — key-only/count scans would read zero, an all-evolved
      // projection would drop every pre-watermark instance. Fail loudly
      // instead (reachable only through states the ALTER guards refuse
      // to create, e.g. interrupted DDL). Residue rows of undeclared
      // columns don't count: with no declared rows the empty result IS
      // correct.
      def liveDeclaredRows: Boolean = {
        val declared = tableSchema.fieldNames.drop(1).toSeq
        declared.nonEmpty && !m.filter(
          org.apache.spark.sql.functions.col("column").isin(declared: _*)).limit(1).isEmpty
      }
      if ((fetch.isEmpty || (valueFields.nonEmpty && valueFields.forall(evolved.contains) &&
          baseAnchor.isEmpty)) && liveDeclaredRows)
        throw new IllegalStateException(
          s"table '$table': no declared value column is live in every chunk " +
            "instance — cannot anchor a key-only/count scan or null-pad an " +
            "all-evolved projection; rewrite the table onto one schema generation " +
            "(full-table UPDATE or INSERT OVERWRITE)")
      val needed = (fetch ++ statCols).distinct
      val mAll = FsstScan.pruneManifest(m, needed, filters, statCols, doubleCols)
        .select("file", "column", "chunk_id", "n_rows", "bytes_out",
          "min_key", "max_key", "value_min", "value_max")
        .collect()
        .filter(r => runtimeChunkIds.forall(_.contains(r.getLong(2))))
      FsstScan.planFromManifest(mAll, stored, tableSchema, filters,
        chunksPerPartition, table, Some((fetch, readValues)), columnSince)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = agg match {
    case Some((_, specs)) => Array(AggRowPartition(aggRow(specs)))
    case None => plan._1.asInstanceOf[Array[InputPartition]]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    // row-level mode: the reader must emit EVERY row of the planned
    // chunks — selectEquals drops non-matching rows, which a group
    // rewrite would then delete. Filters prune groups only.
    val eq = if (rowLevel.isDefined) Array.empty[ColEquals]
      else FsstScan.byteEqFilters(filters, tableSchema)
    new FsstReaderFactory(readSchema(), conf, eq, columnarMode)
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(if (agg.isDefined) 64L else math.max(plan._3, 1L))
    override def numRows(): OptionalLong =
      OptionalLong.of(if (agg.isDefined) 1L else plan._2)
  }

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(asOf.isEmpty,
      "a snapshot-pinned fsst table cannot be streamed — the pin freezes the commit log")
    new FsstMicroBatchStream(root, table, tableSchema, required, filters, chunksPerPartition,
      columnarMode, columnSince)
  }
}

/** Stream offset = the greatest committed batch id included so far.
  * Batch ids lead with fixed-width creation millis
  * ([[ParquetTableIO]]), so lexicographic id order IS commit order and a
  * plain string watermark totally orders the log. `""` = before
  * everything.
  */
final case class FsstOffset(batch: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = batch
}

/** Streaming read of the catalog: `spark.readStream.format("fsst")`.
  *
  * The catalog's commit log IS the source-of-truth offset sequence —
  * each micro-batch emits exactly the rows of batches committed in
  * `(start, end]`, planned from [[fsstspark.io.TableIO.manifestForBatches]]
  * (directory-pruned to the new batches; the manifest is partitioned by
  * batch, so per-micro-batch planning cost is O(new batches), never
  * O(table)). Combined with [[fsstspark.streaming.StreamingEncode.startCatalog]]
  * on the write side this gives an end-to-end streaming pipeline through
  * the encoded catalog.
  *
  * Semantics: an APPEND LOG of the catalog, deliberately WITHOUT
  * tombstone filtering — a batch's rows are emitted exactly once, when
  * its marker lands, and are not retracted if a later compaction
  * tombstones the chunk (the compaction's own rewrite batch would
  * otherwise double-deliver the same rows). Consumers wanting the
  * current table state use the batch read; consumers of the stream get
  * exactly-once delivery of every ingested row. Filters prune new
  * batches' chunks the same way the batch scan prunes
  * ([[FsstScan.planFromManifest]]).
  */
final class FsstMicroBatchStream(root: String, table: String, tableSchema: StructType,
    required: StructType, filters: Array[Filter], chunksPerPartition: Int,
    columnarMode: String = "off", columnSince: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark = SparkSession.active
  private val io = new ParquetTableIO(root)
  // Trigger.AvailableNow pins the end offset at stream start so the run
  // drains to a FIXED point and terminates even while writers keep
  // committing
  @volatile private var availableNowCap: Option[String] = None

  private def currentMax: String = {
    val ids = io.committedBatchIds(spark, table)
    if (ids.isEmpty) "" else ids.max
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentMax)

  override def initialOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    FsstOffset("")
  override def latestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    FsstOffset(availableNowCap.getOrElse(currentMax))
  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): no rate
  // limiting — a micro-batch takes every batch committed so far (or up to
  // the AvailableNow pin); Spark calls this overload when present
  override def latestOffset(start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset =
    latestOffset()
  override def deserializeOffset(json: String): org.apache.spark.sql.connector.read.streaming.Offset =
    FsstOffset(json)
  override def commit(end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      end: org.apache.spark.sql.connector.read.streaming.Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[FsstOffset].batch
    val e0 = end.asInstanceOf[FsstOffset].batch
    val batches = io.committedBatchIds(spark, table).filter(b => b > s0 && b <= e0).sorted
    if (batches.isEmpty) return Array.empty
    val mAll = io.manifestForBatches(spark, table, batches.toIndexedSeq)
      .select("file", "column", "chunk_id", "n_rows", "bytes_out",
        "min_key", "max_key", "value_min", "value_max")
      .collect()
    FsstScan.planFromManifest(mAll, required, tableSchema, filters, chunksPerPartition, table,
      None, columnSince)
      ._1.asInstanceOf[Array[InputPartition]]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    // same eq-pushdown + columnar policy as the batch scan
    new FsstReaderFactory(required, conf, FsstScan.byteEqFilters(filters, tableSchema),
      columnarMode)
  }
}

private[sources] object FsstScan {
  /** Name of the `_chunk_id` metadata column ([[FsstTable.metadataColumns]]). */
  val ChunkIdCol = "_chunk_id"

  /** Largest runtime chunk-id set pushed into the manifest parquet scan
    * as an In predicate; bigger sets (a barely-selective probe) filter
    * driver-side on the statically-pruned collect instead — same exact
    * result, no giant expression in the parquet reader.
    */
  val RuntimeIdPushdownLimit = 10000

  /** Per-chunk-id MAX live-instance count over any column, scoped to
    * `ids` — the shared core of every duplicate-instance guard (the
    * row-level sibling check, FsstRowDelete's refusal, and
    * `canDeleteWhere`'s table-level probe). Output columns:
    * (`chunk_id`, `live`). The scoping never builds an unbounded In
    * expression: small id sets push as a predicate, large ones join
    * against a parallelized id frame; `None` means the whole manifest.
    * Callers filter and `limit(1)` BEFORE collecting, so the driver
    * only ever sees violators.
    *
    * Design note: these guards exist because tombstones address a chunk
    * by id (plus a batch GATE), not by instance — a rewrite of one live
    * instance of a duplicated id would also kill its unrewritten
    * sibling. The root-cause alternative is instance-addressed
    * tombstones carrying the victim's own batch, which would let
    * row-level DML operate on duplicate-id tables and delete all three
    * guards; it touches the tombstone schema, every read path's filter,
    * vacuum, and compaction, and duplicate ids with DIVERGING content
    * only arise on hash-bucket-mode append tables (SQL-written ids are
    * salted unique, local-mode ids are content-derived), so the loud
    * refusal + "compact first" answer is the deliberate trade.
    */
  def liveInstanceCounts(m: org.apache.spark.sql.DataFrame,
      ids: Option[Seq[Long]]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, max}
    val scoped = ids match {
      case Some(s) if s.size <= RuntimeIdPushdownLimit =>
        m.filter(col("chunk_id").isInCollection(s))
      case Some(s) =>
        val spark = m.sparkSession
        import spark.implicits._
        m.join(s.toDF("chunk_id"), "chunk_id")
      case None => m
    }
    scoped.groupBy(col("chunk_id"), col("column")).agg(count("*").as("n"))
      .groupBy(col("chunk_id")).agg(max(col("n")).as("live"))
  }

  /** `candidates` that hold a live manifest row in EVERY live
    * (chunk_id, batch) instance holding rows of any `universe` column —
    * the EXACT admission test for anchor columns (key-only scans,
    * metadata COUNT, COUNT/key-MIN-MAX pushdown, stream planning) and
    * for the DROP COLUMN coverage guard (candidates = the remaining
    * columns, universe = the pre-drop declared set). Within one
    * instance every column shares one row set (they come from one
    * encode call), so a column present in every instance surfaces every
    * logical row, and in admitted states each logical row lives in
    * exactly one instance — COUNT via the anchor is exact.
    *
    * Instance-exactness is the point: watermark arithmetic ("evolved
    * column whose ADD predates every live batch") is NOT a safe proxy,
    * because per-column rewrites — [[fsstspark.pipeline.Compaction]]
    * compacts ONE column into a fresh batch carrying nothing else —
    * create post-watermark batches the evolved column is physically
    * absent from; an anchor admitted by arithmetic but missing from an
    * instance silently loses that instance's rows from key-only/count
    * scans. One small distributed aggregate over the (metadata-sized,
    * batch-partitioned) manifest; callers memoize per plan.
    */
  def everyInstanceCols(m: org.apache.spark.sql.DataFrame,
      candidates: Seq[String], universe: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions.{col, countDistinct, struct, when}
    if (candidates.isEmpty || universe.isEmpty) return Seq.empty
    // a lone candidate that IS the universe trivially covers every
    // instance the universe defines — no job (the common single-column
    // table never pays the aggregate)
    if (candidates.sizeIs == 1 && universe == candidates) return candidates
    val inst = struct(col("chunk_id"), batchFromFileCol)
    val aggs = countDistinct(inst).as("total") +:
      candidates.zipWithIndex.map { case (c, i) =>
        countDistinct(when(col("column") === c, inst)).as(s"c$i") }
    val row = m.filter(col("column").isin(universe: _*))
      .agg(aggs.head, aggs.tail: _*).head()
    val total = row.getLong(0)
    candidates.zipWithIndex.collect {
      case (c, i) if row.getLong(i + 1) == total => c
    }
  }

  /** `required` minus the metadata columns — the STORED fields a plan
    * fetches from disk (metadata values are emitted by the reader from
    * the partition's own chunk list, never read).
    */
  def storedFields(required: StructType, tableSchema: StructType): StructType =
    StructType(required.fields.filter(f =>
      f.name != ChunkIdCol || tableSchema.fieldNames.contains(ChunkIdCol)))

  /** The ingest batch a data file belongs to, parsed from its
    * `batch=` partition directory ([[ParquetTableIO]] writes data under
    * `data/batch=<id>/column=<name>/`). Distinguishes physical chunks
    * whose chunk_id repeats across batches.
    */
  def batchFromPath(file: String): String = {
    val i = file.indexOf("batch=")
    if (i < 0) "" // repaired/foreign layout: fall back to one instance per id
    else {
      val end = file.indexOf('/', i)
      if (end < 0) file.substring(i + 6) else file.substring(i + 6, end)
    }
  }

  /** [[batchFromPath]] as a Catalyst column over the manifest's `file` —
    * the ONE Catalyst-side spelling of the parse, so driver-side and
    * in-plan instance identity can never drift (no-match yields "",
    * matching batchFromPath's repaired/foreign-layout fallback).
    */
  def batchFromFileCol: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_extract(
      org.apache.spark.sql.functions.col("file"), "batch=([^/]*)", 1)

  /** Shared planning tail of the batch scan and the micro-batch stream:
    * prune + group manifest rows (positional schema `file, column,
    * chunk_id, n_rows, bytes_out, min_key, max_key, value_min,
    * value_max`) into chunk-group partitions. Key-only scans anchor on
    * ONE stored column for key blobs + row counts — chosen as the
    * SMALLEST column by manifest bytes, so e.g. a key scan of the pages
    * table rides the lang column, not html — and skip value bytes
    * entirely (`readValues = false`). The batch scan passes its
    * (already pruned) fetch set via `fetchOverride`; the stream lets
    * this derive it from the micro-batch's rows.
    *
    * Schema evolution (`columnSince` — per-column "added after"
    * watermark): a fetch column MISSING from an instance whose batch
    * predates its watermark is legal and reads as all-NULL
    * (`ColFile.file` = "" marks it absent for the reader); missing
    * under any other circumstance stays a loud error. Without a
    * watermark map the connector requires every batch to carry every
    * fetched column — catalogs built by per-column appends (e.g.
    * repeated single-column `encodeBytesLocal` + `writeChunks`) are
    * served by the typed per-column read path, not the connector.
    */
  def planFromManifest(mAll: Array[org.apache.spark.sql.Row], required: StructType,
      tableSchema: StructType, filters: Array[Filter], chunksPerPartition: Int,
      table: String, fetchOverride: Option[(Seq[String], Boolean)] = None,
      columnSince: Map[String, String] = Map.empty): (Array[ChunkGroupPartition], Long, Long) = {
    // metadata columns are reader-emitted, never fetched from disk
    val valueFields =
      storedFields(required, tableSchema).fieldNames.filter(_ != "key").toSeq
    val doubleCols = tableSchema.fields.filter(_.dataType == DoubleType).map(_.name).toSet
    val statCols = filters.flatMap(references).filter(c =>
      tableSchema.fields.exists(f => f.name == c &&
        (f.dataType == LongType || f.dataType == DoubleType))).toSet
    if (mAll.isEmpty) return (Array.empty, 0L, 0L)
    val evolved = columnSince.keySet
    val declaredSet = tableSchema.fieldNames.drop(1).toSet
    val (fetch, readValues) = fetchOverride.getOrElse {
      def anchor: Option[String] = {
        // the anchor must be live in EVERY instance in view that holds
        // declared rows — instance-exact over the collected rows (this
        // path's mAll is the full micro-batch view), so residue rows of
        // undeclared dropped columns neither anchor nor veto, and a
        // column physically absent from a per-column-rewrite batch is
        // never admitted by watermark arithmetic
        val byInst = mAll.filter(r => declaredSet.contains(r.getString(1)))
          .groupBy(r => (r.getLong(2), batchFromPath(r.getString(0))))
        val ok =
          if (byInst.isEmpty) Set.empty[String]
          else byInst.valuesIterator
            .map(_.iterator.map(_.getString(1)).toSet).reduce(_ intersect _)
        val rows = mAll.filter(r => ok.contains(r.getString(1)))
        if (rows.isEmpty) None
        else Some(rows.groupBy(_.getString(1)).view
          .mapValues(_.map(_.getLong(4)).sum).minBy(t => (t._2, t._1))._1)
      }
      if (valueFields.nonEmpty)
        (if (valueFields.forall(evolved.contains)) valueFields ++ anchor.toSeq
         else valueFields, true)
      else (anchor.toSeq, false)
    }
    // a fetch that misses a DECLARED instance ENTIRELY (no row for any
    // fetched column among instances that hold declared rows) would
    // silently lose that instance's rows — fail loudly. Exact check for
    // the non-override (stream) path, whose mAll is the full batch; the
    // batch scan's mAll is already pruned to `needed`, so its
    // plan-level guard lives in computePlanInner. Residue-only
    // instances of undeclared columns are legitimately invisible.
    val fetchSet = fetch.toSet
    def lostInstance: Boolean = fetchOverride.isEmpty &&
      mAll.filter(r => declaredSet.contains(r.getString(1)))
        .groupBy(r => (r.getLong(2), batchFromPath(r.getString(0))))
        .exists { case (_, rows) => !rows.exists(r => fetchSet.contains(r.getString(1))) }
    if ((fetch.isEmpty && mAll.exists(r => declaredSet.contains(r.getString(1)))) ||
        lostInstance)
      throw new IllegalStateException(
        s"table '$table': no fetchable column is live in every chunk instance " +
          "in view — cannot anchor this scan; rewrite the table onto one schema " +
          "generation (full-table UPDATE or INSERT OVERWRITE)")
    if (fetch.isEmpty) return (Array.empty, 0L, 0L)
    val needed = (fetch ++ statCols).distinct.toSet
    val m = mAll.filter(r => needed.contains(r.getString(1)))
    // (chunk_id, batch) -> per-column manifest rows: one PHYSICAL chunk.
    // Grouping by id alone would merge chunks whose id repeats across
    // append batches (hash-mode ids are bucket indexes in every batch)
    // and silently drop all but one file's rows.
    val byInstance = m.groupBy(r => (r.getLong(2), batchFromPath(r.getString(0))))
    val survivors = byInstance.filter { case (_, rows) =>
      val r0 = rows(0)
      keySurvives(r0.getString(5), r0.getString(6), filters) &&
        rows.forall { r =>
          val colName = r.getString(1)
          val lo = if (r.isNullAt(7)) None else Some(r.getLong(7))
          val hi = if (r.isNullAt(8)) None else Some(r.getLong(8))
          valueSurvives(colName, lo, hi, doubleCols.contains(colName), filters)
        }
    }
    val groups = mutable.LinkedHashMap.empty[Seq[String], mutable.ArrayBuffer[(Long, Long)]]
    var totalRows = 0L
    var totalBytes = 0L
    survivors.toArray.sortBy(_._1).foreach { case ((cid, batch), rows) =>
      val perCol = rows.groupBy(_.getString(1))
      fetch.foreach { c =>
        val n = perCol.get(c).map(_.length).getOrElse(0)
        // a column added by schema evolution is legitimately absent from
        // batches predating its watermark — the reader null-pads it
        val absentOk = n == 0 && columnSince.get(c).exists(since => batch < since)
        require(n == 1 || absentOk, s"chunk $cid (batch $batch) of table '$table': " +
          s"expected exactly one manifest row for column '$c', found $n — the " +
          "connector zips columns within one (chunk_id, batch) instance, so tables " +
          "built by per-column appends or per-column rewrites (batches without a " +
          "full column tuple) cannot serve this multi-column scan; read single " +
          "columns via the typed API, or rewrite the table onto one schema " +
          "generation (full-table UPDATE or INSERT OVERWRITE)")
      }
      val fileOf = perCol.view.mapValues(_.head.getString(0)).toMap
      val tuple = fetch.map(c => fileOf.getOrElse(c, ""))
      groups.getOrElseUpdate(tuple, mutable.ArrayBuffer.empty) += ((cid, rows(0).getLong(3)))
      totalRows += rows(0).getLong(3)
      totalBytes += rows.filter(r => fetch.contains(r.getString(1))).map(_.getLong(4)).sum
    }
    val parts = groups.iterator.flatMap { case (files, chunks) =>
      chunks.grouped(chunksPerPartition).map { g =>
        ChunkGroupPartition(g.map(_._1).toArray, g.map(_._2).toArray,
          fetch.zip(files).map { case (c, f) => ColFile(c, f) }.toArray, readValues)
      }
    }.toArray
    (parts, totalRows, totalBytes)
  }

  // ------------------------------------------------- Catalyst pruning
  // The same key-range / zone-map tests keySurvives/valueSurvives apply
  // driver-side, re-expressed as Catalyst Columns over the manifest
  // DataFrame, so the pruning runs INSIDE the manifest parquet scan
  // (row-group stats on min_key/max_key/value_min/value_max) and the
  // driver only ever collects surviving rows. Exactness transfer: Spark
  // compares StringType in UTF8String binary order, which IS the UTF-8
  // code-point order of [[Keys.compareUtf8]] (property-tested in
  // KeysSpec), and zone bounds compare as the same signed longs.

  /** Catalyst form of [[keySurvives]] over manifest columns
    * `min_key`/`max_key`. Conservative identically: non-key filters and
    * non-string operands translate to TRUE.
    */
  def keyPruneCond(filters: Array[Filter]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    filters.map[org.apache.spark.sql.Column] {
      case EqualTo("key", v: String) => col("min_key") <= lit(v) && col("max_key") >= lit(v)
      case GreaterThan("key", v: String) => col("max_key") > lit(v)
      case GreaterThanOrEqual("key", v: String) => col("max_key") >= lit(v)
      case LessThan("key", v: String) => col("min_key") < lit(v)
      case LessThanOrEqual("key", v: String) => col("min_key") <= lit(v)
      case In("key", vs) =>
        // exists-semantics: any non-string member makes the whole filter
        // unprunable (TRUE), exactly like keySurvives
        vs.map[org.apache.spark.sql.Column] {
          case v: String => col("min_key") <= lit(v) && col("max_key") >= lit(v)
          case _ => lit(true)
        }.reduceOption(_ || _).getOrElse(lit(true))
      case StringStartsWith("key", p) =>
        nextAfterPrefix(p) match {
          case Some(q) => col("max_key") >= lit(p) && col("min_key") < lit(q)
          case None => col("max_key") >= lit(p)
        }
      case _ => lit(true)
    }.foldLeft(lit(true))(_ && _)
  }

  /** Catalyst form of [[valueSurvives]] for ONE column's manifest rows
    * (`value_min`/`value_max` non-null assumed — the caller guards).
    */
  private def zoneSurviveCond(c: String, isDouble: Boolean,
      filters: Array[Filter]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    def hit(v: Any): org.apache.spark.sql.Column = longSpace(v, isDouble)
      .map(x => col("value_min") <= lit(x) && col("value_max") >= lit(x))
      .getOrElse(lit(true))
    filters.map[org.apache.spark.sql.Column] {
      case EqualTo(`c`, v) => hit(v)
      case GreaterThan(`c`, v) =>
        longSpace(v, isDouble).map(x => col("value_max") > lit(x)).getOrElse(lit(true))
      case GreaterThanOrEqual(`c`, v) =>
        longSpace(v, isDouble).map(x => col("value_max") >= lit(x)).getOrElse(lit(true))
      case LessThan(`c`, v) =>
        longSpace(v, isDouble).map(x => col("value_min") < lit(x)).getOrElse(lit(true))
      case LessThanOrEqual(`c`, v) =>
        longSpace(v, isDouble).map(x => col("value_min") <= lit(x)).getOrElse(lit(true))
      case In(`c`, vs) =>
        vs.map(hit).reduceOption(_ || _).getOrElse(lit(true))
      case _ => lit(true)
    }.foldLeft(lit(true))(_ && _)
  }

  /** A manifest row FAILS its zone test (the chunk instance provably
    * holds no matching row). None when no filtered long/double column —
    * the common case skips the anti-join entirely.
    */
  private def zoneFailCond(filters: Array[Filter], statCols: Set[String],
      doubleCols: Set[String]): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    if (statCols.isEmpty) None
    else Some(statCols.toSeq.sorted.map { c =>
      col("column") === c && col("value_min").isNotNull && col("value_max").isNotNull &&
        !zoneSurviveCond(c, doubleCols.contains(c), filters)
    }.reduce(_ || _))
  }

  /** The globally smallest stored column by manifest bytes — the anchor
    * a key-only scan rides. One distributed aggregate; the driver
    * collects a single row. None on an empty manifest.
    */
  def smallestColumn(m: org.apache.spark.sql.DataFrame): Option[String] = {
    import org.apache.spark.sql.functions.{col, sum}
    m.groupBy("column").agg(sum("bytes_out").as("b"))
      .orderBy(col("b"), col("column")).limit(1)
      .collect().headOption.map(_.getString(0))
  }

  /** Push the column projection, key predicates, and zone predicates
    * into the manifest DataFrame. A chunk instance whose ANY fetched/
    * filtered column fails its zone test is removed WHOLE via an
    * anti-join on (chunk_id, batch-from-file-path) — filtering rows
    * individually would orphan the instance's other columns' rows and
    * trip planFromManifest's completeness check.
    */
  def pruneManifest(m: org.apache.spark.sql.DataFrame, needed: Seq[String],
      filters: Array[Filter], statCols: Set[String],
      doubleCols: Set[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    val base = m.filter(col("column").isin(needed: _*)).filter(keyPruneCond(filters))
    zoneFailCond(filters, statCols, doubleCols) match {
      case None => base
      case Some(fail) =>
        val inst = regexp_extract(col("file"), "batch=([^/]*)", 1)
        val dead = base.filter(fail)
          .select(col("chunk_id").as("__dead_id"), inst.as("__dead_b")).distinct()
        base.join(dead,
          base("chunk_id") === col("__dead_id") && inst === col("__dead_b"),
          "left_anti")
    }
  }

  /** Whole-value equality / IN-list filters on byte/string columns,
    * handed to the READER: [[BytesCodec.selectEquals]] answers them from
    * chunk structure (dict membership / RLE run headers / FSST
    * encoded-probe), skipping non-matching chunks without decoding and
    * emitting only matching rows — and since every matched row's value
    * IS one specific target, the filtered column itself is never decoded
    * at all (IN-lists map each matched index to its target).
    */
  def byteEqFilters(filters: Array[Filter], tableSchema: StructType): Array[ColEquals] = {
    def isByteCol(c: String) = tableSchema.fields.exists(f => f.name == c && f.name != "key" &&
      (f.dataType == BinaryType || f.dataType == StringType))
    def bytesOf(v: Any): Option[Array[Byte]] = v match {
      case s: String => Some(s.getBytes("UTF-8"))
      case b: Array[Byte] => Some(b)
      case _ => None
    }
    filters.collect {
      case EqualTo(c, v) if isByteCol(c) => bytesOf(v).map(t => ColEquals(c, Array(t)))
      case In(c, vs) if isByteCol(c) && vs.nonEmpty =>
        val ts = vs.flatMap(bytesOf)
        // every IN member must convert, else the reader would silently
        // drop rows matching the unconverted member
        if (ts.length == vs.length) Some(ColEquals(c, ts)) else None
    }.flatten
  }

  /** Catalyst form of "the predicate is TRUE for EVERY key in
    * [min_key, max_key]" — the chunk-aligned-delete coverage test. None
    * when some filter TYPE is not decidable from key metadata (the
    * decidability is static — per filter type/column, not per row).
    */
  private[sources] def fullyTrueCond(filters: Array[Filter]): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    def one(f: Filter): Option[org.apache.spark.sql.Column] = f match {
      case _: AlwaysTrue => Some(lit(true))
      case EqualTo("key", v: String) =>
        Some(col("min_key") === lit(v) && col("max_key") === lit(v))
      case GreaterThan("key", v: String) => Some(col("min_key") > lit(v))
      case GreaterThanOrEqual("key", v: String) => Some(col("min_key") >= lit(v))
      case LessThan("key", v: String) => Some(col("max_key") < lit(v))
      case LessThanOrEqual("key", v: String) => Some(col("max_key") <= lit(v))
      case StringStartsWith("key", p) =>
        // [p, nextAfterPrefix(p)) is exactly the prefix-p interval
        Some(nextAfterPrefix(p) match {
          case Some(q) => col("min_key") >= lit(p) && col("max_key") < lit(q)
          case None => col("min_key") >= lit(p) && col("min_key").startsWith(p)
        })
      case And(l, r) => for (a <- one(l); b <- one(r)) yield a && b
      case _ => None // not decidable from metadata → not chunk-aligned
    }
    filters.foldLeft(Option(lit(true))) { (acc, f) =>
      for (a <- acc; b <- one(f)) yield a && b
    }
  }

  /** The (chunk_id, column) victims of a CHUNK-ALIGNED delete, or None
    * when the predicate does not align. Exactness: every chunk (and
    * every duplicate-id instance — tombstones are id-granular, so all
    * instances of an id must agree) is either FULLY inside the predicate
    * (its whole [min_key, max_key] range satisfies every filter) or
    * fully outside (no key can match). Only key predicates are decidable
    * from metadata — keys are non-null and ranges are exact bounds; a
    * value predicate cannot prove a chunk fully-covered (null counts are
    * not recorded), so any non-key filter refuses.
    *
    * Fully distributed: the alignment check and the duplicate-id
    * agreement check are each a filter + limit-1 probe on the manifest
    * (the pruning predicates push into the manifest parquet scan), and
    * the victim set comes back as a DATAFRAME the tombstone write
    * consumes without ever collecting O(victims) rows to the driver — a
    * TRUNCATE of a 100 TB table stays metadata-distributed end to end.
    */
  def chunkAlignedVictims(root: String, table: String,
      filters: Array[Filter]): Option[org.apache.spark.sql.DataFrame] = {
    val effective = if (filters.isEmpty) Array[Filter](new AlwaysTrue()) else filters
    val full = fullyTrueCond(effective).getOrElse(return None)
    val spark = SparkSession.active
    val io = new ParquetTableIO(root)
    val m = io.manifest(spark, table).select("chunk_id", "column", "min_key", "max_key")
    val mayMatch = keyPruneCond(effective)
    // alignment: a chunk that MAY contain a matching key but is not
    // FULLY covered breaks chunk alignment
    if (!m.filter(mayMatch && !full).isEmpty) return None
    // duplicate-id agreement: an id with both a victim instance and a
    // non-victim instance cannot be tombstoned (tombstones kill the id)
    val victims = m.filter(mayMatch)
    val nonVictims = m.filter(!mayMatch)
    if (!nonVictims.join(victims.select("chunk_id").distinct(), Seq("chunk_id"), "left_semi")
        .isEmpty) return None
    Some(victims.select("chunk_id", "column").distinct())
  }

  /** Filters this source can use for chunk pruning. */
  def prunable(f: Filter, longOrDouble: Set[String]): Boolean = f match {
    case EqualTo(a, v) => a == "key" || longOrDouble.contains(a) ||
      v.isInstanceOf[String] || v.isInstanceOf[Array[Byte]]
    case GreaterThan(a, _) => a == "key" || longOrDouble.contains(a)
    case GreaterThanOrEqual(a, _) => a == "key" || longOrDouble.contains(a)
    case LessThan(a, _) => a == "key" || longOrDouble.contains(a)
    case LessThanOrEqual(a, _) => a == "key" || longOrDouble.contains(a)
    case In(a, vs) => vs.nonEmpty && (a == "key" || longOrDouble.contains(a) ||
      vs.forall(v => v.isInstanceOf[String] || v.isInstanceOf[Array[Byte]]))
    case StringStartsWith("key", _) => true
    case _ => false
  }

  /** Smallest string (code-point order) strictly greater than EVERY
    * string with prefix `p`: increment p's last code point (skipping the
    * surrogate gap). None when no such bound exists (all-max prefix).
    */
  private[sources] def nextAfterPrefix(p: String): Option[String] = {
    val cps = p.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) >= 0x10FFFF) i -= 1
    if (i < 0) None
    else {
      var next = cps(i) + 1
      if (next >= 0xD800 && next <= 0xDFFF) next = 0xE000
      val out = cps.take(i + 1); out(i) = next
      Some(new String(out, 0, i + 1))
    }
  }

  def references(f: Filter): Seq[String] = f match {
    case EqualTo(a, _) => Seq(a)
    case GreaterThan(a, _) => Seq(a)
    case GreaterThanOrEqual(a, _) => Seq(a)
    case LessThan(a, _) => Seq(a)
    case LessThanOrEqual(a, _) => Seq(a)
    case In(a, _) => Seq(a)
    case _ => Seq.empty
  }

  /** Key-range pruning in the catalog's key order ([[Keys.compareUtf8]] =
    * UTF8String binary order — matches what the encode side recorded).
    */
  def keySurvives(minKey: String, maxKey: String, filters: Array[Filter]): Boolean =
    filters.forall {
      case EqualTo("key", v: String) =>
        Keys.compareUtf8(minKey, v) <= 0 && Keys.compareUtf8(maxKey, v) >= 0
      case GreaterThan("key", v: String) => Keys.compareUtf8(maxKey, v) > 0
      case GreaterThanOrEqual("key", v: String) => Keys.compareUtf8(maxKey, v) >= 0
      case LessThan("key", v: String) => Keys.compareUtf8(minKey, v) < 0
      case LessThanOrEqual("key", v: String) => Keys.compareUtf8(minKey, v) <= 0
      case In("key", vs) => vs.exists {
        case v: String => Keys.compareUtf8(minKey, v) <= 0 && Keys.compareUtf8(maxKey, v) >= 0
        case _ => true
      }
      // keys with prefix p lie in [p, nextAfterPrefix(p)): the chunk
      // survives iff its [min,max] range intersects that interval
      case StringStartsWith("key", p) =>
        Keys.compareUtf8(maxKey, p) >= 0 && nextAfterPrefix(p).forall(q =>
          Keys.compareUtf8(minKey, q) < 0)
      case _ => true
    }

  /** Long-space filter value: integral widens; doubles go through the same
    * order-preserving [[SortableBits.fromDouble]] the zone maps used at
    * encode time, so range tests transfer exactly. Non-numeric → None
    * (not prunable on this column).
    */
  private def longSpace(v: Any, isDouble: Boolean): Option[Long] = v match {
    case null => None
    case l: Long => Some(if (isDouble) SortableBits.fromDouble(l.toDouble) else l)
    case i: Int => Some(if (isDouble) SortableBits.fromDouble(i.toDouble) else i.toLong)
    case s: Short => Some(if (isDouble) SortableBits.fromDouble(s.toDouble) else s.toLong)
    case b: Byte => Some(if (isDouble) SortableBits.fromDouble(b.toDouble) else b.toLong)
    case d: Double => if (isDouble) Some(SortableBits.fromDouble(d)) else None
    case f: Float => if (isDouble) Some(SortableBits.fromDouble(f.toDouble)) else None
    case _ => None
  }

  /** Zone-map pruning for one column's stats. `None` stats (byte column,
    * all-null chunk, pre-stats writer) are conservatively kept.
    */
  def valueSurvives(column: String, lo: Option[Long], hi: Option[Long],
      isDouble: Boolean, filters: Array[Filter]): Boolean =
    (lo, hi) match {
      case (Some(mn), Some(mx)) => filters.forall {
        case EqualTo(`column`, v) => longSpace(v, isDouble).forall(x => mn <= x && mx >= x)
        case GreaterThan(`column`, v) => longSpace(v, isDouble).forall(x => mx > x)
        case GreaterThanOrEqual(`column`, v) => longSpace(v, isDouble).forall(x => mx >= x)
        case LessThan(`column`, v) => longSpace(v, isDouble).forall(x => mn < x)
        case LessThanOrEqual(`column`, v) => longSpace(v, isDouble).forall(x => mn <= x)
        case In(`column`, vs) =>
          vs.exists(v => longSpace(v, isDouble).forall(x => mn <= x && mx >= x))
        case _ => true
      }
      case _ => true
    }
}

/** One byte-equality / IN-list filter the reader answers structurally:
  * a row matches iff its value equals SOME target.
  */
final case class ColEquals(column: String, targets: Array[Array[Byte]])

final class FsstReaderFactory(schema: StructType, conf: SerializableConfiguration,
    eqFilters: Array[ColEquals] = Array.empty, columnarMode: String = "off")
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case AggRowPartition(values) => new PartitionReader[InternalRow] {
        private var done = false
        override def next(): Boolean = { val r = !done; done = true; r }
        override def get(): InternalRow = new GenericInternalRow(values.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        })
        override def close(): Unit = ()
      }
      case p: ChunkGroupPartition => new ChunkGroupReader(schema, p, conf.value, eqFilters)
    }

  /** Columnar reads are OPT-IN (`columnar=auto|all`): measured on three
    * shapes, the row path wins byte-heavy scans 2–3× (putByteArray
    * copies what rows pass zero-copy), wins small mixed chunks ~1.5×
    * (per-batch overhead), and ties the longs-only best case — decode,
    * not row materialization, bounds the scan (BASELINE.md r4b).
    * `auto` = fixed-width-only projections; `all` = every data scan.
    * Uniform across a scan's partitions by construction: aggregate scans
    * (single AggRowPartition) and empty projections stay row-based.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    partition match {
      case p: ChunkGroupPartition if p.colFiles.nonEmpty && schema.nonEmpty =>
        columnarMode match {
          case "off" => false
          case "all" => true
          case _ => schema.fields.forall(f =>
            f.dataType == LongType || f.dataType == DoubleType)
        }
      case _ => false
    }

  override def createColumnarReader(partition: InputPartition):
      PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new ChunkGroupColumnarReader(schema, partition.asInstanceOf[ChunkGroupPartition],
      conf.value, eqFilters)
}

/** One decoded (and eq-filtered) chunk, shared by the row and columnar
  * emitters: `emit` = row indices to surface, arrays indexed by the
  * partition's colFiles order (an entry is null when that column is
  * eq-answered or of the other kind).
  */
private[sources] final case class DecodedChunk(
    cid: Long,
    nRows: Int,
    /** row indices to surface; null = every row (no eq filter applied) */
    emit: Array[Int],
    keys: Array[Array[Byte]],
    bytesCols: Array[Array[Array[Byte]]],
    longCols: Array[LongCodec.LongColumn],
    /** per eq-answered column: matched row index → the target it equals */
    eqTargets: java.util.HashMap[String, java.util.HashMap[Integer, Array[Byte]]]) {
  def emitCount: Int = if (emit == null) nRows else emit.length
  @inline def rowAt(j: Int): Int = if (emit == null) j else emit(j)
}

/** Decodes one chunk group: per fetched column, the chunks' blob rows
  * come out of ONE parquet file (projection = 2–3 fields, `chunk_id IN`
  * record filter so row-group stats skip other chunks); each chunk then
  * decodes once per column under the same key-blob identity guard as
  * [[EncodePipeline.decodeColumns]]. Memory is bounded by
  * chunksPerPartition × nCols × chunk size, not file size.
  */
private[sources] final class ChunkGroupDecoder(schema: StructType, part: ChunkGroupPartition,
    conf: Configuration, eqFilters: Array[ColEquals]) {

  val fields: Array[StructField] = schema.fields
  /** PRESENT columns only — an absent (schema-evolution null-padded)
    * column never resolves here, so emitters fall to their null path.
    */
  val colOf: Map[String, Int] = part.colFiles.zipWithIndex
    .collect { case (cf, i) if cf.file.nonEmpty => cf.column -> i }.toMap

  private def loadColumn(cf: ColFile): java.util.HashMap[java.lang.Long, (Array[Byte], Array[Byte])] = {
    val c = new Configuration(conf)
    // repetition mirrors the Spark writer: primitive Long → required,
    // Array[Byte] → optional (parquet projection checks repetition exactly).
    // Key-only scans project value_blob out entirely — the anchor column's
    // compressed values never leave the parquet pages.
    c.set(ReadSupport.PARQUET_READ_SCHEMA,
      if (part.readValues)
        "message proj { required int64 chunk_id; optional binary key_blob; optional binary value_blob; }"
      else
        "message proj { required int64 chunk_id; optional binary key_blob; }")
    val ids = part.chunkIds.map(java.lang.Long.valueOf).toSet.asJava
    val pred = FilterApi.in(FilterApi.longColumn("chunk_id"), new java.util.HashSet(ids))
    val reader = ParquetReader.builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(cf.file))
      .withConf(c).withFilter(FilterCompat.get(pred)).build()
    val out = new java.util.HashMap[java.lang.Long, (Array[Byte], Array[Byte])]()
    try {
      var g = reader.read()
      while (g != null) {
        val cid = g.getLong("chunk_id", 0)
        val value = if (part.readValues) g.getBinary("value_blob", 0).getBytes else null
        require(out.put(cid, (g.getBinary("key_blob", 0).getBytes, value)) == null,
          s"file ${cf.file}: duplicate chunk $cid for column ${cf.column}")
        g = reader.read()
      }
    } finally reader.close()
    out
  }

  def decodedChunks(): Iterator[DecodedChunk] = {
    val present = part.colFiles.filter(_.file.nonEmpty)
    require(present.nonEmpty || part.colFiles.isEmpty,
      "chunk group with every column absent — planner must anchor on a present column")
    val byCol = present.map(cf => cf.column -> loadColumn(cf)).toMap
    val wantKey = fields.exists(_.name == "key")
    val eqApplicable = eqFilters.filter(e => colOf.contains(e.column))
    part.chunkIds.iterator.zipWithIndex.flatMap { case (cid, chunkIdx) =>
      // indexed by colFiles position; null for absent (null-padded) columns
      val blobs = part.colFiles.map { cf =>
        if (cf.file.isEmpty) null
        else {
          val b = byCol(cf.column).get(cid)
          require(b != null, s"chunk $cid: no row for column ${cf.column} in ${cf.file}")
          b
        }
      }
      val first = blobs(colOf(present(0).column))
      blobs.foreach { b =>
        require(b == null || java.util.Arrays.equals(b._1, first._1),
          s"chunk $cid: key blobs differ across columns — mixed chunkings")
      }
      // structural equality pushdown: selectEquals answers byte-column
      // EqualTo from chunk STRUCTURE (dict membership / RLE run headers /
      // FSST encoded-probe — exact, never a superset), so a chunk with no
      // match is skipped without decoding anything, a matching chunk
      // emits only its matching rows, and the filtered column itself is
      // never decoded (a matched row's value IS the target)
      var selected: Array[Int] = null // null = every row
      var skipChunk = false
      val eqTarget = new java.util.HashMap[String, java.util.HashMap[Integer, Array[Byte]]]()
      eqApplicable.foreach { e =>
        if (!skipChunk) {
          // one structural pass resolves the whole IN-list: a row matches
          // iff it equals SOME target, and each matched index maps to its
          // target, so the column never decodes
          val (idx, ords, _) = BytesCodec.selectEqualsIn(blobs(colOf(e.column))._2, e.targets)
          val perIdx = new java.util.HashMap[Integer, Array[Byte]]()
          var j = 0
          while (j < idx.length) { perIdx.put(idx(j), e.targets(ords(j))); j += 1 }
          eqTarget.put(e.column, perIdx)
          selected =
            if (selected == null) idx
            else selected.filter(i => perIdx.containsKey(i))
          if (selected.isEmpty) skipChunk = true
        }
      }
      if (skipChunk) Iterator.empty
      else {
        // decode each fetched column once (eq-filtered columns excluded;
        // absent evolution-padded columns skipped — they emit NULL)
        val decodedBytes = new Array[Array[Array[Byte]]](blobs.length)
        val decodedLongs = new Array[LongCodec.LongColumn](blobs.length)
        var n = -1
        fields.foreach { f =>
          if (f.name != "key" && !eqTarget.containsKey(f.name)) {
            colOf.get(f.name).foreach { i =>
              if (f.dataType == LongType || f.dataType == DoubleType) {
                val c = LongCodec.decode(blobs(i)._2)
                decodedLongs(i) = c
                require(n < 0 || n == c.n, s"chunk $cid: column ${f.name} row count mismatch")
                n = c.n
              } else {
                val v = BytesCodec.decode(blobs(i)._2)
                decodedBytes(i) = v
                require(n < 0 || n == v.length, s"chunk $cid: column ${f.name} row count mismatch")
                n = v.length
              }
            }
          }
        }
        val keys: Array[Array[Byte]] = if (wantKey) {
          val k = BytesCodec.decode(first._1)
          require(n < 0 || n == k.length, s"chunk $cid: key/value row count mismatch")
          n = k.length
          k
        } else null
        if (n < 0) n = part.nRows(chunkIdx).toInt // only eq columns fetched
        // emit == null = every row (the common no-eq-filter path pays no
        // index array and no indirection)
        if (selected != null) require(selected.isEmpty || selected.last < n,
          s"chunk $cid: selectEquals index ${selected.last} out of $n rows")
        Iterator.single(DecodedChunk(cid, n, selected, keys, decodedBytes, decodedLongs, eqTarget))
      }
    }
  }
}

/** Row-based emitter over [[ChunkGroupDecoder]]. */
final class ChunkGroupReader(schema: StructType, part: ChunkGroupPartition,
    conf: Configuration, eqFilters: Array[ColEquals] = Array.empty)
    extends PartitionReader[InternalRow] {

  private val fields = schema.fields
  private val rows: Iterator[InternalRow] =
    if (fields.isEmpty) {
      // Long-counted: a partition can legally hold > Int.MaxValue rows
      // (chunksPerPartition × MaxChunkRows) and .toInt would truncate
      val total = part.nRows.sum
      new Iterator[InternalRow] {
        private var i = 0L
        override def hasNext: Boolean = i < total
        override def next(): InternalRow = { i += 1; new GenericInternalRow(0) }
      }
    } else if (part.colFiles.isEmpty) {
      // a metadata-only projection (just `_chunk_id`) rides the count-path
      // partitions: ids and row counts come straight off the manifest,
      // no data file is opened
      if (fields.forall(_.name == FsstScan.ChunkIdCol))
        part.chunkIds.iterator.zip(part.nRows.iterator).flatMap { case (cid, n) =>
          val row: InternalRow = new GenericInternalRow(Array.fill[Any](fields.length)(cid))
          Iterator.fill(n.toInt)(row)
        }
      else Iterator.empty // projection needs stored columns but none planned
    } else {
      val dec = new ChunkGroupDecoder(schema, part, conf, eqFilters)
      dec.decodedChunks().flatMap { d =>
        Iterator.tabulate(d.emitCount) { j =>
          val ri = d.rowAt(j)
          val arr = new Array[Any](fields.length)
          var fi = 0
          while (fi < fields.length) {
            val f = fields(fi)
            arr(fi) =
              if (f.name == FsstScan.ChunkIdCol) d.cid
              else if (f.name == "key") UTF8String.fromBytes(d.keys(ri))
              else if (d.eqTargets.containsKey(f.name)) {
                val t = d.eqTargets.get(f.name).get(ri)
                if (f.dataType == StringType) UTF8String.fromBytes(t) else t
              } else dec.colOf.get(f.name) match {
                case None => null // column absent here (added after this batch)
                case Some(i) =>
                  f.dataType match {
                    case LongType =>
                      val c = d.longCols(i)
                      if (c.nulls(ri)) null else c.values(ri)
                    case DoubleType =>
                      val c = d.longCols(i)
                      if (c.nulls(ri)) null else java.lang.Double.longBitsToDouble(c.values(ri))
                    case StringType =>
                      val b = d.bytesCols(i)(ri)
                      if (b == null) null else UTF8String.fromBytes(b)
                    case _ =>
                      d.bytesCols(i)(ri)
                  }
              }
            fi += 1
          }
          new GenericInternalRow(arr)
        }
      }
    }

  private var current: InternalRow = _
  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Columnar emitter: each decoded chunk becomes ONE ColumnarBatch filled
  * straight from the decoder's per-column arrays (they are already
  * columnar), so the scan avoids a GenericInternalRow per row and Spark's
  * codegen'd ColumnarToRow takes over — the connector's hot path stays
  * inside whole-stage codegen.
  */
final class ChunkGroupColumnarReader(schema: StructType, part: ChunkGroupPartition,
    conf: Configuration, eqFilters: Array[ColEquals])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val fields = schema.fields
  private val dec = new ChunkGroupDecoder(schema, part, conf, eqFilters)
  private val chunks: Iterator[DecodedChunk] =
    if (part.colFiles.isEmpty) Iterator.empty else dec.decodedChunks()
  private var current: ColumnarBatch = _

  override def next(): Boolean = {
    if (current != null) { current.close(); current = null }
    if (!chunks.hasNext) return false
    val d = chunks.next()
    val m = d.emitCount
    val vectors = fields.map { f =>
      val v = new OnHeapColumnVector(m, f.dataType)
      var j = 0
      if (f.name == FsstScan.ChunkIdCol) {
        v.putLongs(0, m, d.cid)
      } else if (f.name == "key") {
        while (j < m) { val b = d.keys(d.rowAt(j)); v.putByteArray(j, b, 0, b.length); j += 1 }
      } else if (d.eqTargets.containsKey(f.name)) {
        val perIdx = d.eqTargets.get(f.name)
        while (j < m) {
          val t = perIdx.get(d.rowAt(j))
          v.putByteArray(j, t, 0, t.length); j += 1
        }
      } else dec.colOf.get(f.name) match {
        case None => // column absent here (added after this batch): all-null
          while (j < m) { v.putNull(j); j += 1 }
        case Some(i) =>
          f.dataType match {
            case LongType =>
              val c = d.longCols(i)
              while (j < m) {
                val ri = d.rowAt(j)
                if (c.nulls(ri)) v.putNull(j) else v.putLong(j, c.values(ri)); j += 1
              }
            case DoubleType =>
              val c = d.longCols(i)
              while (j < m) {
                val ri = d.rowAt(j)
                if (c.nulls(ri)) v.putNull(j)
                else v.putDouble(j, java.lang.Double.longBitsToDouble(c.values(ri))); j += 1
              }
            case _ => // StringType and BinaryType both store byte arrays
              val col = d.bytesCols(i)
              while (j < m) {
                val b = col(d.rowAt(j))
                if (b == null) v.putNull(j) else v.putByteArray(j, b, 0, b.length); j += 1
              }
          }
      }
      v
    }
    current = new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector], m)
    true
  }
  override def get(): ColumnarBatch = current
  override def close(): Unit = if (current != null) { current.close(); current = null }
}
