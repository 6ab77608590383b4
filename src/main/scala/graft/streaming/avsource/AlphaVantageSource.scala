package graft.streaming.avsource

import java.time.LocalDate
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1: the reference's HTTP API source (etl.py:46-50) as a genuine custom
  * DataSource-V2 `MicroBatchStream` — the "properly done" variant SURVEY.md
  * §4.2 reserves for when turns remain (the pragmatic file-drop source is
  * [[graft.streaming.StreamingIngest.stockStream]]).
  *
  * One micro-batch = one trading day across all configured symbols, so the
  * offset is simply the day index — checkpointable, replayable, resumable
  * (exactly the properties the reference gets from its date-stamped file
  * cache, etl.py:39-45). Fetches are throttled by a token bucket, the
  * streaming-native form of the reference's 15 s inter-request sleep
  * (etl.py:62-63, T4).
  *
  * The HTTP GET itself is a clearly-marked DETERMINISTIC STUB (this
  * environment has no egress): [[FakeAlphaVantageServer.fetch]] returns a
  * payload shaped exactly like raw_data/AAPL_2025-10-05.json. Swapping in a
  * real `java.net.http.HttpClient` call changes only that one function —
  * offsets, partitions, readers and throttling are production-shaped.
  *
  * Options: `symbols` (csv), `start`/`end` (inclusive ISO dates),
  * `daysPerBatch` (default 1), `requestsPerMinute` (default 300).
  */
class AlphaVantageSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "alpha-vantage-sim"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvTable(new CaseInsensitiveStringMap(properties))
}

object AvSource {
  /** Raw fetch surface: one row per (symbol, day) payload; parsing into the
    * typed OHLCV shape stays in [[graft.sources.AlphaVantage]] so the batch
    * and both streaming paths share one transform chain. */
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

class AvTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "alpha_vantage_sim"
  override def schema(): StructType = AvSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = AvSource.schema
        override def toBatch: Batch = throw new UnsupportedOperationException(
          "alpha-vantage-sim is a streaming-only source")
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new AvMicroBatchStream(options)
      }
    }
}

/** Offset = number of whole days already available (0-based exclusive). */
case class DayOffset(days: Long) extends Offset {
  override def json(): String = days.toString
}

class AvMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {
  private val symbols: Seq[String] =
    options.get("symbols").split(",").map(_.trim).filter(_.nonEmpty).toSeq
  private val start = LocalDate.parse(options.get("start"))
  private val endInclusive = LocalDate.parse(options.get("end"))
  private val totalDays: Long =
    java.time.temporal.ChronoUnit.DAYS.between(start, endInclusive) + 1
  private val daysPerBatch: Long =
    Option(options.get("daysPerBatch")).map(_.toLong).getOrElse(1L)
  private val requestsPerMinute: Int =
    Option(options.get("requestsPerMinute")).map(_.toInt).getOrElse(300)

  private var available: Long = 0L

  override def initialOffset(): Offset = DayOffset(0L)

  /** Each trigger exposes at most daysPerBatch more days, never past the
    * end — so `processAllAvailable`/AvailableNow terminate (a live
    * deployment would cap at "today" instead of `totalDays`). Availability
    * self-advances per poll rather than waiting on commit(): commits are
    * reported asynchronously, and gating on them races the engine's
    * no-new-data check. */
  override def latestOffset(): Offset = synchronized {
    available = math.min(totalDays, available + daysPerBatch)
    DayOffset(available)
  }

  override def deserializeOffset(json: String): Offset =
    DayOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] = {
    val s = startOff.asInstanceOf[DayOffset].days
    val e = endOff.asInstanceOf[DayOffset].days
    // one partition per symbol: fetches parallelize across symbols while
    // each symbol's requests stay ordered (and rate-limited) within a task
    symbols.map(sym => AvPartition(sym, start.toString, s, e,
      requestsPerMinute): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new AvPartitionReader(p.asInstanceOf[AvPartition])
    }

  override def stop(): Unit = ()
}

case class AvPartition(symbol: String, startDate: String, fromDay: Long,
    untilDay: Long, requestsPerMinute: Int) extends InputPartition

class AvPartitionReader(p: AvPartition) extends PartitionReader[InternalRow] {
  private val bucket = new TokenBucket(p.requestsPerMinute)
  private var day = p.fromDay
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (day >= p.untilDay) false
    else {
      val date = LocalDate.parse(p.startDate).plusDays(day).toString
      bucket.acquire() // T4: throttle like the reference's 15 s sleep
      val payload = FakeAlphaVantageServer.fetch(p.symbol, date)
      row = InternalRow(
        UTF8String.fromString(p.symbol),
        UTF8String.fromString(date),
        UTF8String.fromString(payload))
      day += 1
      true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Token bucket: at most `perMinute` acquisitions per rolling minute. */
class TokenBucket(perMinute: Int) {
  private var windowStart = System.nanoTime()
  private var used = 0

  def acquire(): Unit = synchronized {
    val now = System.nanoTime()
    if (now - windowStart > 60e9.toLong) { windowStart = now; used = 0 }
    if (used >= perMinute) {
      val waitMs = math.max(1L, (60e9.toLong - (now - windowStart)) / 1000000L)
      Thread.sleep(waitMs)
      windowStart = System.nanoTime(); used = 0
    }
    used += 1
  }
}

/** DETERMINISTIC STUB standing in for `requests.get(ALPHA_VANTAGE_URL)`
  * (etl.py:48-50): same payload shape as raw_data/AAPL_2025-10-05.json,
  * prices derived from a hash of (symbol, date) so replays are exact. */
object FakeAlphaVantageServer {
  def fetch(symbol: String, date: String): String = {
    // mask, not math.abs: abs(Int.MinValue) is still negative, which would
    // produce negative prices/volumes for that (symbol, date)
    val h = scala.util.hashing.MurmurHash3.stringHash(s"$symbol|$date") & 0x7fffffff
    val base = 100.0 + (h % 40000) / 100.0
    val open = base
    val high = base * 1.02
    val low = base * 0.985
    val close = base * (0.99 + (h % 97) / 4850.0)
    val volume = 1000000L + h % 50000000L
    f"""{
       |    "Meta Data": {
       |        "1. Information": "Daily Prices (open, high, low, close) and Volumes",
       |        "2. Symbol": "$symbol",
       |        "3. Last Refreshed": "$date",
       |        "4. Output Size": "Compact",
       |        "5. Time Zone": "US/Eastern"
       |    },
       |    "Time Series (Daily)": {
       |        "$date": {
       |            "1. open": "$open%.4f",
       |            "2. high": "$high%.4f",
       |            "3. low": "$low%.4f",
       |            "4. close": "$close%.4f",
       |            "5. volume": "$volume"
       |        }
       |    }
       |}""".stripMargin
  }
}
