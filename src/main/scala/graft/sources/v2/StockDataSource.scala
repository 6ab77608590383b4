package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
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
  *    zero rows, so every file must stay planned);
  *  - `SupportsPushDownAggregates`: count/min/max/sum (global or grouped
  *    by symbol) collapse each payload file to ONE partial row at the
  *    reader — Spark's final aggregate merges O(files) rows instead of
  *    O(day-rows) (see [[StockScanBuilder.pushAggregation]]).
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

/** One pushed partial-aggregate column: `func` ∈ count_star | min | max
  * | sum over schema column `col` (empty for count_star). Serializable —
  * ships to executors inside the reader factory. */
case class StockAggSpec(func: String, col: String)

/** A pushed PARTIAL aggregation (`supportCompletePushDown` = false):
  * group by nothing or by `symbol` (one file = one symbol, so the
  * per-file partial IS the per-group partial), aggregate columns in
  * Spark's pushed-agg schema order (group cols first, then aggs). */
case class StockPushedAgg(groupBySymbol: Boolean, aggs: Seq[StockAggSpec])

class StockScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var symbols: Option[Set[String]] = None // None = no pruning
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = StockDataSource.schema
  private var limit: Option[Int] = None
  private var agg: Option[StockPushedAgg] = None
  private var aggSchema: StructType = new StructType()

  // PARTIAL aggregate pushdown: each payload-file reader collapses its
  // rows to ONE partial row (count / min / max / sum over the file;
  // grouped-by-symbol is the same row because a file holds exactly one
  // symbol). Spark's final aggregate merges the partials, so a
  // `count(*)` or `max(close)` over a million payload files moves one
  // row per file instead of every day-row — the scan cost drops from
  // O(days) to O(files) of OUTPUT (parsing is unchanged; at 100 TB the
  // shuffle and row hand-off are what this kills). Strings are excluded
  // from min/max (UTF8String vs java.lang.String collation is not ours
  // to re-implement); sum is numeric-only. Residual-filter queries keep
  // a Filter node above the scan, so Spark only offers the push when
  // the aggregate sits directly on the scan — exactly when it is safe.
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (limit.isDefined) return false
    def field(e: V2Expression): Option[StructField] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        StockDataSource.schema.find(_.name == f.fieldNames.head)
      case _ => None
    }
    val groupOk: Option[Boolean] = aggregation.groupByExpressions.toSeq match {
      case Seq() => Some(false)
      case Seq(f: NamedReference)
          if f.fieldNames.sameElements(Array("symbol")) => Some(true)
      case _ => None
    }
    def numeric(f: StructField): Boolean =
      f.dataType == DoubleType || f.dataType == LongType
    val specs: Seq[Option[(StockAggSpec, StructField)]] =
      aggregation.aggregateExpressions.toSeq.map {
        case _: CountStar => Some((StockAggSpec("count_star", ""),
          StructField("count(*)", LongType)))
        case m: Min => field(m.column).filter(_.dataType != StringType)
          .map(f => (StockAggSpec("min", f.name),
            StructField(s"min(${f.name})", f.dataType)))
        case m: Max => field(m.column).filter(_.dataType != StringType)
          .map(f => (StockAggSpec("max", f.name),
            StructField(s"max(${f.name})", f.dataType)))
        case s: Sum if !s.isDistinct => field(s.column).filter(numeric)
          .map(f => (StockAggSpec("sum", f.name),
            StructField(s"sum(${f.name})", f.dataType)))
        case _ => None
      }
    if (groupOk.isEmpty || specs.isEmpty || specs.exists(_.isEmpty)) false
    else {
      val grouped = groupOk.get
      agg = Some(StockPushedAgg(grouped, specs.flatten.map(_._1)))
      val groupFields =
        if (grouped) Seq(StructField("symbol", StringType, nullable = false))
        else Nil
      aggSchema = StructType(groupFields ++ specs.flatten.map(_._2))
      true
    }
  }

  // PARTIAL limit pushdown: each file reader stops parsing after
  // `limit` day-rows (the global LIMIT can never need more rows from
  // one partition than it keeps in total); returning false keeps
  // Spark's own Limit on top, which is required for exactness across
  // files. Payload parsing is the scan's whole cost, so the cap is the
  // saving — a LIMIT 5 over a 5000-day payload parses 5 entries.
  override def pushLimit(l: Int): Boolean = {
    // never cap the parse under a pushed aggregation — the partial agg
    // must see every day-row (the rule order can offer limit after agg)
    if (agg.isEmpty) limit = Some(l)
    false
  }

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

  override def build(): Scan = new StockScan(path, symbols,
    if (agg.isDefined) aggSchema else required, limit, agg)
}

class StockScan(path: String, symbols: Option[Set[String]],
    required: StructType, limit: Option[Int],
    agg: Option[StockPushedAgg] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"StockScan(path=$path, prunedSymbols=${symbols.getOrElse("*")}, " +
      s"columns=${required.fieldNames.mkString(",")}" +
      limit.fold("")(l => s", limit=$l") +
      agg.fold("")(a => s", pushedAggregates=[${a.aggs.map(s =>
        if (s.col.isEmpty) "count(*)" else s"${s.func}(${s.col})")
        .mkString(",")}]" +
        (if (a.groupBySymbol) ", pushedGroupBy=[symbol]" else "")) + ")"

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
    new StockReaderFactory(required, limit, agg)
}

case class StockFilePartition(file: String) extends InputPartition

class StockReaderFactory(required: StructType, limit: Option[Int],
    agg: Option[StockPushedAgg] = None) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new StockFileReader(p.asInstanceOf[StockFilePartition].file, required,
      limit, agg)
}

/** Executor-side payload parse (Jackson, ships with Spark). A malformed
  * payload yields zero rows — the reader-side twin of the quarantine
  * split (etl.py:73-77 skips the whole symbol on ValidationError). */
class StockFileReader(file: String, required: StructType,
    limit: Option[Int] = None, agg: Option[StockPushedAgg] = None)
    extends PartitionReader[InternalRow] {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

  private type DayRow =
    (String, Int, Double, Double, Double, Double, Long, Double)

  private def colVal(r: DayRow, col: String): Any = col match {
    case "date" => r._2
    case "open" => r._3
    case "high" => r._4
    case "low" => r._5
    case "close" => r._6
    case "volume" => r._7
    case "daily_change_percentage" => r._8
  }

  /** Per-file partial aggregate values in pushed-schema order. Empty
    * input → count 0 / null min-max-sum, which Spark's final merge
    * treats exactly like an empty partition. */
  private def partial(a: StockPushedAgg, rs: Seq[DayRow]): Seq[Any] =
    a.aggs.map { s =>
      s.func match {
        case "count_star" => rs.size.toLong
        case _ if rs.isEmpty => null
        case "min" | "max" =>
          val vs = rs.map(r => colVal(r, s.col))
          vs.head match {
            case _: Int =>
              val xs = vs.map(_.asInstanceOf[Int])
              if (s.func == "min") xs.min else xs.max
            case _: Long =>
              val xs = vs.map(_.asInstanceOf[Long])
              if (s.func == "min") xs.min else xs.max
            case _ =>
              val xs = vs.map(_.asInstanceOf[Double])
              if (s.func == "min") xs.min else xs.max
          }
        case "sum" =>
          colVal(rs.head, s.col) match {
            case _: Long => rs.foldLeft(0L)((acc, r) =>
              acc + colVal(r, s.col).asInstanceOf[Long])
            // day-row order is the file's date sort, so the double fold
            // replays the same order as Spark's own partial agg would
            case _ => rs.foldLeft(0.0)((acc, r) =>
              acc + colVal(r, s.col).asInstanceOf[Double])
          }
      }
    }

  private val rows: Iterator[InternalRow] = {
    StockDataSource.filesOpened.incrementAndGet()
    val parsed: Seq[DayRow] = try {
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
        Seq.empty
      } else if (sym == null || !ts.isObject) Seq.empty
      else {
        val days = ts.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
        // Parse ONLY the date key first, sort, and cut to the pushed
        // limit BEFORE the per-day OHLCV field parsing — that ordering
        // is what makes the limit pushdown a real saving (a LIMIT 5
        // over a 5000-day payload field-parses 5 entries; the date keys
        // must all be read because the cap is on the EARLIEST days).
        val keyed = days.map { case (date, ohlcv) =>
          (java.time.LocalDate.parse(date).toEpochDay.toInt, ohlcv)
        }.sortBy(_._1)
        limit.fold(keyed)(keyed.take).map { case (epochDay, ohlcv: JsonNode) =>
          val open = ohlcv.path("1. open").asText().toDouble
          val high = ohlcv.path("2. high").asText().toDouble
          val low = ohlcv.path("3. low").asText().toDouble
          val close = ohlcv.path("4. close").asText().toDouble
          val volume = ohlcv.path("5. volume").asText().toLong
          (sym, epochDay, open, high, low, close, volume,
            (close - open) / open * 100.0)
        }
      }
    } catch { case _: Exception => Seq.empty } // whole-payload reject
    agg match {
      case Some(a) if a.groupBySymbol =>
        // one file = one symbol, so the file partial IS the group partial;
        // a rejected/empty payload contributes no group row at all
        parsed.groupBy(_._1).toSeq.sortBy(_._1).iterator.map {
          case (sym, rs) => InternalRow.fromSeq(
            UTF8String.fromString(sym) +: partial(a, rs))
        }
      case Some(a) =>
        Iterator.single(InternalRow.fromSeq(partial(a, parsed)))
      case None =>
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
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
