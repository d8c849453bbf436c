package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for a cursor-paginated REST API — the
  * reference's extract stage (`pipeline/collectors/nft.py:25-45`,
  * SURVEY R4/R13) made Spark-native:
  *
  *  - the driver plans one InputPartition per contiguous PAGE RANGE
  *    (`pagesPerPartition` pages each) — pagination parallelism becomes
  *    executor-task parallelism instead of the reference's asyncio
  *    worker pool (`nft.py:83-86`);
  *  - each PartitionReader walks its page range through a [[Fetcher]]
  *    with bounded retry + exponential backoff (ref stamina `@retry`,
  *    `api.py:154-172`);
  *  - per-partition connection state is created lazily inside the
  *    reader and closed on `close()` (ref client pool, `api.py:29-58`).
  *
  * The sandbox has no egress, so the default [[Fetcher]] is
  * [[SyntheticFetcher]] — a deterministic fake API that serves
  * NFT-shaped rows (and injects transient failures to exercise the
  * retry path). The Spark-side machinery — planning, schema, options,
  * task parallelism, retry — is real and tested in PagedSourceSpec.
  *
  * Usage: `spark.read.format("graft.sources.PagedSource")
  *   .option("rows", 10000).option("pageSize", 200).load()`
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(new CaseInsensitiveStringMap(properties))
}

object PagedSource {
  /** Row shape of the fake API (ref OpenSea payload, `main.py:54-65`). */
  val schema: StructType = StructType(Seq(
    StructField("identifier", LongType, nullable = false),
    StructField("collection", StringType, nullable = false),
    StructField("token_standard", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("metadata_url", StringType, nullable = false)))

  /** One page of raw rows; `None` cursor ⇒ end of stream (ref sentinel
    * `nft.py:91-93`). */
  trait Fetcher extends Serializable {
    def fetchPage(pageIdx: Int, pageSize: Int): Seq[(Long, String, String, String, String)]
  }

  /** Deterministic stand-in for the HTTP API. Fails transiently on a
    * fixed subset of (page, attempt) combinations so the retry loop is
    * actually exercised. */
  class SyntheticFetcher(totalRows: Long, failEvery: Int = 0) extends Fetcher {
    private val attempts = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    override def fetchPage(pageIdx: Int, pageSize: Int): Seq[(Long, String, String, String, String)] = {
      if (failEvery > 0 && pageIdx % failEvery == 0) {
        val n = attempts.merge(pageIdx, 1, (a, b) => a + b)
        if (n <= 1) throw new java.io.IOException(s"synthetic transient failure page=$pageIdx")
      }
      val start = pageIdx.toLong * pageSize
      (start until math.min(start + pageSize, totalRows)).map { i =>
        (i, s"collection${i % 7}", "erc721", s"Token #$i", s"https://api.example.com/meta/$i")
      }
    }
  }
}

class PagedTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "paged_api"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new PagedScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

/** Filter pushdown = PAGE PRUNING (ref: server-side query params,
  * `nft.py:30-38`): identifier-range predicates map exactly onto the
  * API's page space (`identifier = page·pageSize + offset`), so pages
  * wholly outside the range are never fetched — the DSv2 analogue of
  * passing the filter to the server. Every filter is also returned as
  * residual so Spark re-applies it post-scan (page granularity is a
  * superset at the boundaries — same contract as parquet row-group
  * stats pruning). */
class PagedScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var lo = 0L
  private var hi = Long.MaxValue
  private var pruning: Array[Filter] = Array.empty
  private var countPushed = false
  private var required: StructType = PagedSource.schema

  /** Column pruning (completing the DSv2 trio with filters and
    * COUNT(*)): the pruned schema reaches the reader factory, which
    * materializes ONLY the requested fields per row — the analogue of
    * the API's field-limited page payloads (ref `nft.py:25-45`): a
    * user selecting 2 of the 5 fields no longer pays row-width cost
    * for the other 3. */
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  /** COUNT(*) pushdown: the page space is arithmetic (`identifier =
    * page·pageSize + offset`), so a global count needs ZERO fetches —
    * each partition reports its page-range row count analytically
    * (partial pushdown; Spark sums the partition rows). The API
    * analogue of reading a `total` field off the index endpoint
    * instead of paging the collection. Spark only offers the
    * aggregate when no residual filters remain, so the all-residual
    * filter policy above keeps filtered counts on the exact path. */
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) countPushed = true
    ok
  }

  private def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pruning = filters.filter {
      case EqualTo("identifier", v) =>
        asLong(v).exists { x => lo = math.max(lo, x); hi = math.min(hi, x); true }
      case GreaterThan("identifier", v) =>
        asLong(v).exists { x => lo = math.max(lo, x + 1); true }
      case GreaterThanOrEqual("identifier", v) =>
        asLong(v).exists { x => lo = math.max(lo, x); true }
      case LessThan("identifier", v) =>
        asLong(v).exists { x => hi = math.min(hi, x - 1); true }
      case LessThanOrEqual("identifier", v) =>
        asLong(v).exists { x => hi = math.min(hi, x); true }
      case _ => false
    }
    filters // all residual: Spark re-applies exact predicates post-scan
  }

  override def pushedFilters(): Array[Filter] = pruning

  override def build(): Scan = new PagedScan(
    options.getLong("rows", 1000L),
    options.getInt("pageSize", 200),
    options.getInt("pagesPerPartition", 8),
    options.getInt("failEvery", 0),
    options.getInt("maxRetries", 3),
    lo, hi, countPushed, required)
}

class PagedScan(rows: Long, pageSize: Int, pagesPerPartition: Int,
    failEvery: Int, maxRetries: Int, idLo: Long = 0L, idHi: Long = Long.MaxValue,
    countOnly: Boolean = false, required: StructType = PagedSource.schema)
    extends Scan with Batch {
  override def readSchema(): StructType =
    if (countOnly) StructType(Seq(StructField("count", LongType, nullable = false)))
    else required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val nPages = ((rows + pageSize - 1) / pageSize).toInt
    // clamp the page space to the pushed identifier range
    val firstPage = math.max(0L, idLo / pageSize).toInt
    val lastPage = if (idHi == Long.MaxValue) nPages
      else math.min(nPages.toLong, idHi / pageSize + 1).toInt
    if (firstPage >= lastPage) return Array.empty
    (firstPage until lastPage by pagesPerPartition).map { first =>
      PagedPartition(first, math.min(first + pagesPerPartition, lastPage)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (countOnly) new CountReaderFactory(rows, pageSize)
    else new PagedReaderFactory(rows, pageSize, failEvery, maxRetries, required)
}

/** Partial-count reader: one row per partition with the page-range
  * size, computed arithmetically — the Fetcher is never constructed. */
class CountReaderFactory(rows: Long, pageSize: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = {
        val first = p.firstPage.toLong * pageSize
        val end = math.min(p.endPage.toLong * pageSize, rows)
        InternalRow(math.max(0L, end - first))
      }
      override def close(): Unit = ()
    }
  }
}

case class PagedPartition(firstPage: Int, endPage: Int) extends InputPartition

class PagedReaderFactory(rows: Long, pageSize: Int, failEvery: Int, maxRetries: Int,
    val required: StructType = PagedSource.schema)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedPartition]
    new PagedReader(p, rows, pageSize, failEvery, maxRetries, required)
  }
}

/** Walks one page range; fetches lazily page-by-page (bounded memory —
  * the reference's queue backpressure analogue is that only one page
  * per task is in flight). */
class PagedReader(p: PagedPartition, rows: Long, pageSize: Int, failEvery: Int,
    maxRetries: Int, required: StructType = PagedSource.schema)
    extends PartitionReader[InternalRow] {
  private val fetcher = new PagedSource.SyntheticFetcher(rows, failEvery)
  private var page = p.firstPage
  private var buf: Iterator[(Long, String, String, String, String)] = Iterator.empty
  var retriesUsed: Int = 0
  // pruned projection: full-schema ordinals of the required columns,
  // resolved once per reader — get() materializes only these
  private val fieldIdx: Array[Int] =
    required.fieldNames.map(PagedSource.schema.fieldIndex)

  private def fetchWithRetry(idx: Int): Seq[(Long, String, String, String, String)] = {
    var attempt = 0
    while (true) {
      try return fetcher.fetchPage(idx, pageSize)
      catch {
        case e: java.io.IOException =>
          attempt += 1; retriesUsed += 1
          if (attempt > maxRetries) throw e
          // exponential backoff, ref api.py:154 (1s→300s scaled down)
          Thread.sleep(math.min(1L << attempt, 50L))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def next(): Boolean = {
    while (!buf.hasNext && page < p.endPage) {
      buf = fetchWithRetry(page).iterator
      page += 1
    }
    buf.hasNext
  }

  override def get(): InternalRow = {
    val t = buf.next()
    val vals = new Array[Any](fieldIdx.length)
    var i = 0
    while (i < fieldIdx.length) {
      vals(i) = fieldIdx(i) match {
        case 0 => t._1
        case 1 => UTF8String.fromString(t._2)
        case 2 => UTF8String.fromString(t._3)
        case 3 => UTF8String.fromString(t._4)
        case 4 => UTF8String.fromString(t._5)
      }
      i += 1
    }
    InternalRow(vals: _*)
  }

  override def close(): Unit = { buf = Iterator.empty }
}
