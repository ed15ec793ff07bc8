package graft.streaming

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute,
  AttributeReference, BoundReference, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, InSet, IsNotNull, LessThan, LessThanOrEqual, Literal,
  Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType,
  LongType, ShortType, StructType, TimestampType}
import graft.etl.SnapshotStore

/** [[FileIndex]] over one committed snapshot version — the piece that
  * turns manifest file statistics into QUERY-TIME data skipping (the
  * log-structured-table architecture: the transaction log owns the file
  * list, a custom file index hands Spark only the files a query's
  * predicates can touch, and the ordinary vectorized parquet scan does
  * the rest).
  *
  * `listFiles(_, dataFilters)` is where Catalyst calls back during
  * physical planning with the query's own scan predicates: conjuncts
  * over the manifest's stats column are folded into one [lo, hi] bound
  * and files whose recorded min/max cannot intersect are dropped BEFORE
  * the scan plans a single split. Unlike [[SnapshotStore.readRange]]
  * (call-time pruning through an explicit API) this prunes ANY
  * DataFrame/SQL filter automatically — `spark.read.format(...).load()
  * .filter($"id" === k)` skips to the one file holding k with no
  * cooperation from the query author. Everything unparseable is
  * ignored, files without stats always survive, and Spark re-applies
  * the exact predicate on the scanned rows — pruning is conservative by
  * construction, correctness never depends on it.
  *
  * Driver-side cost: O(files) FileStatus lookups once at index
  * creation (same as Spark's own directory listing) and O(files)
  * interval checks per query — no data IO.
  */
final class SnapshotFileIndex(
    spark: SparkSession,
    private[graft] val store: SnapshotStore,
    private[graft] val asOfVersion: Option[Long] = None) extends FileIndex {

  private val (tableSchema, statsColumn, entries, partCols) =
    store.manifestAt(asOfVersion)

  // A version with LIVE deletion vectors cannot plan through a plain
  // file scan — it would silently include merge-on-read-tombstoned
  // rows. Loud refusal with the two recovery paths; a compaction
  // materializes the deletes and restores format/SQL readability.
  require(!entries.exists(_.hasDv),
    s"graft-snapshot: this version has live merge-on-read deletion " +
      "vectors, which a plain file scan cannot apply — run " +
      "compactLatest(...) to materialize the deletes, or read through " +
      "SnapshotStore.read/readRange (they apply DVs at scan time)")

  // A version with an ACTIVE COLUMN MAPPING (renamed/re-added columns)
  // stores physical names in its files — a plain file scan would
  // surface the wrong column names. The provider routes such versions
  // through the TableScan fallback; reaching here is a wiring bug.
  require(!store.hasColumnMapping(asOfVersion.orElse(store.latestVersion)),
    "graft-snapshot: this version has an active column mapping — it must " +
      "plan through the store's mapping-aware scan (SnapshotDvRelation)")

  /** One listing round-trip per file at creation; statuses are reused
    * across every query planned against this index. The per-file map
    * carries EVERY stats column's interval (primary + the comma-list
    * secondaries), so planning-time skipping works on all clustered
    * dimensions at once.
    */
  private val statuses: Seq[(FileStatus, Map[String, (Long, Long)])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val primary = statsColumn.map(_.split(",").head.trim)
    // Synthesized statuses carry the manifest's COMMIT timestamp, not 0:
    // `_metadata.file_modification_time` is a queryable column, and the
    // version's commit time is the meaningful answer a log-structured
    // table can give without a per-file listing round trip (the actual
    // fs mtime is an implementation detail the manifest owns anyway).
    val commitTs: Long = asOfVersion.orElse(store.latestVersion)
      .flatMap(v => store.readHeader(v).ts).getOrElse(0L)
    entries.map { e =>
      val hp = new Path(e.absPath)
      val stats = primary.flatMap(c =>
        e.min.zip(e.max).map(r => c -> r)).toMap ++
        e.extra.map { case (c, a, b) => c -> (a, b) }.toMap
      // entries with a manifest-recorded size skip the per-file listing
      // round trip entirely — the FileStatus is synthesized from
      // manifest metadata (the only fields the scan planner reads are
      // path and length); pre-size manifests keep the listing fallback
      val status = e.bytes match {
        case Some(len) => new FileStatus(len, false, 1, 128L << 20, commitTs, hp)
        case None => hp.getFileSystem(conf).getFileStatus(hp)
      }
      (status, stats)
    }
  }

  private val statsCols: Seq[String] =
    statsColumn.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  /** Per-file bloom filters (decoded lazily once) + the property —
    * planning-time POINT skipping on the unclustered bloom column,
    * composing with the range-stats fold below.
    */
  private val bloomColumn: Option[String] = store.bloomColumnAt(asOfVersion)
  private lazy val blooms: Seq[Option[Array[Long]]] =
    entries.map(_.bloom.map(graft.etl.Bloom.decode)
      .filterNot(graft.etl.Bloom.saturated)) // legacy saturated: no probes

  override val partitionSchema: StructType =
    StructType(partCols.map(c => tableSchema.fields.find(_.name == c).getOrElse(
      throw new IllegalStateException(
        s"SnapshotFileIndex: partition column '$c' missing from table schema"))))

  /** Columns physically stored in the data files — the table schema
    * minus the hive-layout partition columns (their values live in the
    * file paths; [[listFiles]] hands them to Spark per directory).
    */
  def dataSchema: StructType =
    if (partCols.isEmpty) tableSchema
    else StructType(tableSchema.fields.filterNot(f => partCols.contains(f.name)))

  /** Full logical schema INCLUDING partition columns — what SQL DML
    * shapes its source queries against.
    */
  private[graft] def fullSchema: StructType = tableSchema

  private[graft] def partitionCols: Seq[String] = partCols

  /** The table's stats column (a table PROPERTY — SQL writers must
    * republish it or data skipping silently dies after one INSERT
    * OVERWRITE).
    */
  private[graft] def statsCol: Option[String] = statsColumn

  /** Decoded partition values of each file as an [[InternalRow]] under
    * [[partitionSchema]] — computed once at index build.
    */
  private val partitionValues: Seq[InternalRow] =
    if (partCols.isEmpty) Nil
    else statuses.map { case (st, _) =>
      val tuple = store.partitionTupleOfAbsolute(st.getPath.toUri.getPath, partCols)
      InternalRow.fromSeq(partitionSchema.fields.zip(tuple).map {
        case (f, raw) => internalValue(raw, f.dataType)
      })
    }

  private def internalValue(raw: String, dt: DataType): Any =
    if (raw == graft.etl.SnapshotStore.HiveNullPartition) null
    else dt match {
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case ShortType => raw.toShort
      case ByteType => raw.toByte
      case org.apache.spark.sql.types.BooleanType => raw.toBoolean
      case DateType => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case _ => org.apache.spark.unsafe.types.UTF8String.fromString(raw)
    }

  override def rootPaths: Seq[Path] = statuses.map(_._1.getPath)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // manifest-stats pruning from the query's data predicates — one
    // interval fold per stats column; a file survives only if EVERY
    // recorded interval intersects its column's fold
    val rangeKept: Seq[Int] =
      if (statsCols.isEmpty) statuses.indices
      else {
        val boundsByCol = statsCols.map(c => c -> bounds(c, dataFilters)).toMap
        statuses.indices.filter { i =>
          val st = statuses(i)._2
          statsCols.forall { c =>
            st.get(c) match {
              case Some((mn, mx)) =>
                val (lo, hi) = boundsByCol(c); mx >= lo && mn <= hi
              case None => true // no stats -> conservatively scanned
            }
          }
        }
      }
    // point-set skipping on the bloom column: `WHERE user_id = x` on a
    // column the table is NOT clustered by skips every file whose
    // filter excludes x (filterless files conservatively survive)
    val statsKept: Seq[Int] = bloomColumn
      .flatMap(bc => graft.etl.Bloom.pointHashes(bc, dataFilters)) match {
      case Some(hs) => rangeKept.filter(i => blooms(i) match {
        case Some(bits) => hs.exists(graft.etl.Bloom.mightContain(bits, _))
        case None => true
      })
      case None => rangeKept
    }
    if (partCols.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty,
        statsKept.map(statuses(_)._1).toArray))
    else {
      // PARTITION PRUNING: Catalyst hands the partition-column
      // conjuncts separately; evaluate them against each file's decoded
      // partition row (the same bind-and-eval the built-in
      // PartitioningAwareFileIndex does), then group surviving files by
      // partition value — one PartitionDirectory per live partition.
      val pruned: Seq[Int] =
        if (partitionFilters.isEmpty) statsKept
        else {
          val predicate = partitionFilters.reduce(And)
          val bound = Predicate.createInterpreted(predicate.transform {
            case a: AttributeReference =>
              val i = partitionSchema.fieldNames.indexOf(a.name)
              BoundReference(i, partitionSchema.fields(i).dataType, nullable = true)
          })
          statsKept.filter(i => bound.eval(partitionValues(i)))
        }
      pruned.groupBy(partitionValues(_)).toSeq.map { case (row, idxs) =>
        PartitionDirectory(row, idxs.map(statuses(_)._1).toArray)
      }
    }
  }

  /** Fold the scan conjuncts that constrain `column` into one closed
    * interval; anything unrecognized widens back toward (-inf, +inf).
    * Date/timestamp literals arrive as their physical ints/longs (days,
    * micros) — the same encoding the commit recorded from the footers.
    */
  private def bounds(column: String, filters: Seq[Expression]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def lit(e: Expression): Option[Long] = e match {
      case Literal(v, LongType) => Some(v.asInstanceOf[Long])
      case Literal(v, IntegerType) => Some(v.asInstanceOf[Int].toLong)
      case Literal(v, ShortType) => Some(v.asInstanceOf[Short].toLong)
      case Literal(v, ByteType) => Some(v.asInstanceOf[Byte].toLong)
      case Literal(v, DateType) => Some(v.asInstanceOf[Int].toLong)
      case Literal(v, TimestampType) => Some(v.asInstanceOf[Long])
      case _ => None
    }
    def isCol(e: Expression): Boolean = e match {
      case a: Attribute => a.name == column
      case _ => false
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, v) if isCol(a) => lit(v).foreach { x => lo = lo max x; hi = hi min x }
      case EqualTo(v, a) if isCol(a) => lit(v).foreach { x => lo = lo max x; hi = hi min x }
      case GreaterThan(a, v) if isCol(a) => lit(v).foreach(x => lo = lo max (x + 1))
      case GreaterThanOrEqual(a, v) if isCol(a) => lit(v).foreach(x => lo = lo max x)
      case LessThan(a, v) if isCol(a) => lit(v).foreach(x => hi = hi min (x - 1))
      case LessThanOrEqual(a, v) if isCol(a) => lit(v).foreach(x => hi = hi min x)
      case GreaterThan(v, a) if isCol(a) => lit(v).foreach(x => hi = hi min (x - 1))
      case GreaterThanOrEqual(v, a) if isCol(a) => lit(v).foreach(x => hi = hi min x)
      case LessThan(v, a) if isCol(a) => lit(v).foreach(x => lo = lo max (x + 1))
      case LessThanOrEqual(v, a) if isCol(a) => lit(v).foreach(x => lo = lo max x)
      case In(a, vs) if isCol(a) && vs.nonEmpty =>
        val xs = vs.flatMap(lit)
        if (xs.length == vs.length) { lo = lo max xs.min; hi = hi min xs.max }
      // IN-lists longer than spark.sql.optimizer.inSetConversionThreshold
      // (default 10) arrive optimized to InSet with raw internal values —
      // without this branch a common predicate shape silently loses all
      // manifest skipping
      case InSet(a, hset) if isCol(a) && hset.nonEmpty =>
        val xs = hset.toSeq.collect {
          case x: Long => x
          case x: Int => x.toLong
          case x: Short => x.toLong
          case x: Byte => x.toLong
        }
        if (xs.length == hset.size) { lo = lo max xs.min; hi = hi min xs.max }
      case _: IsNotNull => () // implied by any bound; no information
      case _ => () // unrecognized conjunct: no pruning from it
    }
    filters.foreach(walk)
    (lo, hi)
  }

  override def inputFiles: Array[String] =
    statuses.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.map(_._1.getLen).sum

  override def toString: String =
    s"SnapshotFileIndex[${statuses.length} files" +
      statsColumn.map(c => s", stats on $c").getOrElse("") + "]"
}

/** Fallback relation for versions with LIVE merge-on-read deletion
  * vectors: a plain file scan cannot apply them (it would silently
  * include tombstoned rows — the refusal [[SnapshotFileIndex]] throws),
  * so the format plans this [[org.apache.spark.sql.sources.TableScan]]
  * instead, whose scan IS [[SnapshotStore.read]] — the DV-applying
  * position anti-join. SQL readers therefore stay correct between a MoR
  * write and the next OPTIMIZE, trading the index's planning-time file
  * skipping for correctness inside that window; compaction materializes
  * the tombstones and the next resolution plans the pruned
  * HadoopFsRelation path again. Pinned to the version resolved at
  * construction — same snapshot isolation as the file index.
  */
final class SnapshotDvRelation(
    spark: SparkSession,
    private[graft] val store: SnapshotStore,
    asOf: Option[Long]) extends org.apache.spark.sql.sources.BaseRelation
    with org.apache.spark.sql.sources.TableScan {

  /** The USER's travel spec (None = the live table) — what the DML
    * rails gate on; the scan itself pins the resolved version below.
    */
  private[graft] val asOfVersion: Option[Long] = asOf
  private val pinned: Option[Long] = asOf.orElse(store.latestVersion)
  private val (tableSchema, statsColumn, _, partCols) =
    store.manifestAt(pinned)

  private[graft] def fullSchema: StructType = tableSchema
  private[graft] def partitionCols: Seq[String] = partCols
  private[graft] def statsCol: Option[String] = statsColumn

  override def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
  override def schema: StructType = tableSchema
  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    store.read(spark, pinned)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]].rdd

  override def toString: String =
    s"SnapshotDvRelation[v${pinned.getOrElse(-1L)}, live DVs applied at scan]"
}

/** The one definition of "this relation is a snapshot table" the SQL
  * rails share — both physical shapes (the pruned file-index path and
  * the live-DV fallback) resolve to the same target surface, so DML,
  * INSERT, and the ops statements keep working inside a MoR window.
  */
private[graft] final case class SnapshotTargetInfo(
    store: SnapshotStore,
    fullSchema: StructType,
    partitionCols: Seq[String],
    statsCol: Option[String],
    asOfVersion: Option[Long])

private[graft] object SnapshotTargetInfo {
  def of(relation: org.apache.spark.sql.sources.BaseRelation)
      : Option[SnapshotTargetInfo] = relation match {
    case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation
        if h.location.isInstanceOf[SnapshotFileIndex] =>
      val i = h.location.asInstanceOf[SnapshotFileIndex]
      Some(SnapshotTargetInfo(i.store, i.fullSchema, i.partitionCols,
        i.statsCol, i.asOfVersion))
    case d: SnapshotDvRelation =>
      Some(SnapshotTargetInfo(d.store, d.fullSchema, d.partitionCols,
        d.statsCol, d.asOfVersion))
    case _ => None
  }
}
