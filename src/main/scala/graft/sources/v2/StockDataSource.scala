package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Batch DataSource V2 for the raw Alpha Vantage payload cache — the
  * engine-native source surface for the reference's "data lake" folder
  * (etl.py:39-45: one pretty-printed `{SYMBOL}_{date}.json` per fetch).
  *
  *   spark.read.format("graft.sources.v2.StockDataSource")
  *     .option("path", dir).load()
  *
  * What it demonstrates (SURVEY.md §2.1 S1/S2 as a first-class connector
  * rather than `spark.read.json` + transforms):
  *  - explicit immutable schema (schema-on-read contract of §1.2);
  *  - one InputPartition PER PAYLOAD FILE → parallel scan, no driver-side
  *    parsing (only the file LISTING happens on the driver);
  *  - `SupportsPushDownFilters`: symbol equality/IN prune whole FILES at
  *    planning time (the filename carries the symbol — the same trick as
  *    partition pruning on a `symbol=` directory layout);
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only the
  *    projected columns;
  *  - `SupportsPushDownLimit`: a LIMIT n over the source caps every FILE
  *    reader at n rows (PARTIAL pushdown — `pushLimit` returns false, so
  *    Spark still applies the global limit; partition pruning by the
  *    limit would not be conservative because a malformed payload yields
  *    zero rows, so every file must stay planned).
  *
  * At 100 TB the per-file partitioning and file-level pruning are exactly
  * what keeps a scan of millions of payloads off the driver; a production
  * build would add file-size coalescing (many files per partition).
  */
class StockDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StockDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StockTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object StockDataSource {
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false),
    StructField("daily_change_percentage", DoubleType, nullable = false)))

  /** Test hook: files actually opened by readers in this JVM. */
  val filesOpened = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Quarantine metric: payloads whose 'Meta Data' symbol disagrees with
    * their `{symbol}_` filename prefix. Such files are dropped whole (like
    * any malformed payload) so that filename-based file pruning stays
    * exactly conservative — see [[StockFileReader]]. */
  val symbolMismatches = new java.util.concurrent.atomic.AtomicInteger(0)
}

class StockTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"alphavantage:$path"
  override def schema(): StructType = StockDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StockScanBuilder(path)
}

class StockScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var symbols: Option[Set[String]] = None // None = no pruning
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = StockDataSource.schema
  private var limit: Option[Int] = None

  // PARTIAL limit pushdown: each file reader stops parsing after
  // `limit` day-rows (the global LIMIT can never need more rows from
  // one partition than it keeps in total); returning false keeps
  // Spark's own Limit on top, which is required for exactness across
  // files. Payload parsing is the scan's whole cost, so the cap is the
  // saving — a LIMIT 5 over a 5000-day payload parses 5 entries.
  override def pushLimit(l: Int): Boolean = { limit = Some(l); false }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, _) = filters.partition {
      case EqualTo("symbol", _: String) => true
      case In("symbol", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    accepted.foreach {
      case EqualTo("symbol", v: String) => symbols = Some(Set(v))
      case In("symbol", vs) => symbols = Some(vs.map(_.toString).toSet)
      case _ => ()
    }
    pushed = accepted
    // Filename-prefix pruning is CONSERVATIVE, not exact (a payload's
    // Meta-Data symbol is authoritative, the filename is just a cache
    // key) — so return every filter for Spark to re-apply post-scan,
    // exactly like parquet does with row-group statistics.
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new StockScan(path, symbols, required, limit)
}

class StockScan(path: String, symbols: Option[Set[String]],
    required: StructType, limit: Option[Int]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StockScan(path=$path, prunedSymbols=${symbols.getOrElse("*")}, " +
      s"columns=${required.fieldNames.mkString(",")}" +
      limit.fold("")(l => s", limit=$l") + ")"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json"))
      .filter(f => symbols.forall(ss =>
        ss.exists(s => f.getName.startsWith(s + "_"))))
      .sortBy(_.getName)
    files.map(f => StockFilePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new StockReaderFactory(required, limit)
}

case class StockFilePartition(file: String) extends InputPartition

class StockReaderFactory(required: StructType, limit: Option[Int])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new StockFileReader(p.asInstanceOf[StockFilePartition].file, required,
      limit)
}

/** Executor-side payload parse (Jackson, ships with Spark). A malformed
  * payload yields zero rows — the reader-side twin of the quarantine
  * split (etl.py:73-77 skips the whole symbol on ValidationError). */
class StockFileReader(file: String, required: StructType,
    limit: Option[Int] = None) extends PartitionReader[InternalRow] {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

  private val rows: Iterator[InternalRow] = {
    StockDataSource.filesOpened.incrementAndGet()
    try {
      val root = new ObjectMapper().readTree(new java.io.File(file))
      val sym = root.path("Meta Data").path("2. Symbol").asText(null)
      val ts = root.path("Time Series (Daily)")
      // Writer contract (etl.py:39: filename = f"{symbol}_{today}.json"):
      // the cache-key filename prefix IS the payload's authoritative
      // symbol. File pruning in StockScan relies on it, so a payload that
      // violates it is quarantined whole (counted in symbolMismatches)
      // rather than returned under a symbol the planner may have pruned —
      // that would make pruning silently non-conservative.
      val fileName = new java.io.File(file).getName
      if (sym != null && !fileName.startsWith(sym + "_")) {
        StockDataSource.symbolMismatches.incrementAndGet()
        Iterator.empty
      } else if (sym == null || !ts.isObject) Iterator.empty
      else {
        val days = ts.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
        val parsed = days.map { case (date, ohlcv: JsonNode) =>
          val open = ohlcv.path("1. open").asText().toDouble
          val high = ohlcv.path("2. high").asText().toDouble
          val low = ohlcv.path("3. low").asText().toDouble
          val close = ohlcv.path("4. close").asText().toDouble
          val volume = ohlcv.path("5. volume").asText().toLong
          val epochDay = java.time.LocalDate.parse(date).toEpochDay.toInt
          (sym, epochDay, open, high, low, close, volume,
            (close - open) / open * 100.0)
        }.sortBy(_._2)
        val capped = limit.fold(parsed)(parsed.take)
        capped.iterator.map { case (s, d, o, h, l, c, v, chg) =>
          InternalRow.fromSeq(required.fieldNames.toSeq.map {
            case "symbol" => UTF8String.fromString(s)
            case "date" => d
            case "open" => o
            case "high" => h
            case "low" => l
            case "close" => c
            case "volume" => v
            case "daily_change_percentage" => chg
          })
        }
      }
    } catch { case _: Exception => Iterator.empty } // whole-payload reject
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
