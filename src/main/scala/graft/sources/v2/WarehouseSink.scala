package graft.sources.v2

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Write-side DataSource V2: a JSON-lines directory sink with a real
  * two-phase commit — the engine-native generalization of the reference's
  * warehouse load (etl.py:110-158 writes row-at-a-time INSERTs; its
  * idempotence comes from INSERT IGNORE + UNIQUE(symbol,date),
  * etl.py:127, 142).
  *
  *   df.write.format("graft.sources.v2.WarehouseSink")
  *     .option("path", dir).mode("append").save()
  *
  * Commit protocol (the part a 1000-executor cluster needs):
  *  - every task attempt writes to its OWN staging file
  *    (`_staging/part-{partition}-{taskId}`) — concurrent speculative
  *    attempts never collide;
  *  - Spark's commit coordinator guarantees exactly ONE attempt per
  *    partition delivers a commit message; only those files are renamed
  *    into the table directory at driver commit — retried/speculated
  *    losers are swept with the staging dir, so task retries cannot
  *    duplicate rows;
  *  - the driver commit is itself idempotent: a `_committed-{queryId}`
  *    marker short-circuits a re-delivered commit of the same logical
  *    write (the connector-level analogue of the reference's INSERT
  *    IGNORE semantics — re-running a finished load is a no-op);
  *  - `SaveMode.Overwrite` maps to the TRUNCATE capability: committed
  *    data files are removed before the new ones land.
  *
  * Key-level dedup across DIFFERENT loads (the UNIQUE(symbol,date) half of
  * the reference's contract) stays a plan-level concern —
  * [[graft.operators.Upsert]]'s anti-join — composed in front of this sink;
  * sink-level file commits and plan-level key dedup are orthogonal layers.
  *
  * Row format: one JSON object per line, field order = schema order;
  * atomic types only (string/boolean/integral/floating/date/timestamp) —
  * enough for every warehouse-shaped table in SURVEY.md §1.4. */
class WarehouseSink extends TableProvider {
  // Write-only source: the schema comes from the DataFrame being written.
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // never used for writes; reads are unsupported
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "WarehouseSink requires option 'path'")
    new WarehouseSinkTable(path, schema)
  }
}

object WarehouseSink {
  /** Staging is namespaced PER QUERY: two concurrent writes to the same
    * sink path must not see (or sweep) each other's attempt files — a
    * shared staging dir would let the first committer's cleanup silently
    * delete the second's staged data. */
  private[v2] def stagingDir(path: String, queryId: String) =
    new File(new File(path, "_staging"), queryId)
  private[v2] def marker(path: String, queryId: String) =
    new File(path, s"_committed-$queryId")

  /** JSON-escape the characters that can appear in warehouse strings. */
  private[v2] def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.result()
  }

  private[v2] def rowToJson(row: InternalRow, schema: StructType): String = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => "\"" + esc(row.getUTF8String(i).toString) + "\""
          case BooleanType => row.getBoolean(i).toString
          case ByteType => row.getByte(i).toString
          case ShortType => row.getShort(i).toString
          case IntegerType => row.getInt(i).toString
          case LongType => row.getLong(i).toString
          // JSON has no NaN/Infinity literals; emit null so the line stays
          // parseable instead of corrupting the whole record
          case FloatType =>
            val f = row.getFloat(i)
            if (java.lang.Float.isFinite(f)) f.toString else "null"
          case DoubleType =>
            val dv = row.getDouble(i)
            if (java.lang.Double.isFinite(dv)) dv.toString else "null"
          case DateType =>
            "\"" + java.time.LocalDate.ofEpochDay(row.getInt(i).toLong) + "\""
          case TimestampType =>
            val us = row.getLong(i)
            "\"" + java.time.Instant.ofEpochSecond(
              Math.floorDiv(us, 1000000L),
              Math.floorMod(us, 1000000L) * 1000L) + "\""
          case other => throw new UnsupportedOperationException(
            s"WarehouseSink: unsupported type ${other.simpleString} " +
              s"for field ${f.name}")
        }
      "\"" + esc(f.name) + "\":" + v
    }
    fields.mkString("{", ",", "}")
  }
}

class WarehouseSinkTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"warehouse:$path"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WarehouseWriteBuilder(path, info.schema(), info.queryId(),
      truncate = false)
}

class WarehouseWriteBuilder(path: String, schema: StructType,
    queryId: String, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new WarehouseWriteBuilder(path, schema, queryId, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new WarehouseBatchWrite(path, schema, queryId, truncate)
  }
}

case class WarehouseCommitMessage(partitionId: Int, stagedFile: String)
  extends WriterCommitMessage

class WarehouseBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val staging = WarehouseSink.stagingDir(path, queryId)
    staging.mkdirs()
    new WarehouseWriterFactory(staging.getAbsolutePath, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    val marker = WarehouseSink.marker(path, queryId)
    // Idempotent re-commit: the same logical write (queryId) lands once.
    if (!marker.exists()) {
      if (truncate) {
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.startsWith("part-"))
          .foreach(f => Files.deleteIfExists(f.toPath))
      }
      messages.foreach { case WarehouseCommitMessage(pid, staged) =>
        val src = Paths.get(staged)
        if (Files.exists(src)) // empty partitions stage nothing
          Files.move(src, Paths.get(path, s"part-$pid-$queryId.json"),
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
      Files.write(marker.toPath,
        java.time.Instant.now().toString.getBytes(StandardCharsets.UTF_8))
    }
    // Winning or not, THIS query's staging dir (holding any losing
    // attempts) goes; other queries' staging subdirs are untouched.
    sweepStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    sweepStaging()

  private def sweepStaging(): Unit = {
    val staging = WarehouseSink.stagingDir(path, queryId)
    Option(staging.listFiles()).getOrElse(Array.empty)
      .foreach(f => Files.deleteIfExists(f.toPath))
    Files.deleteIfExists(staging.toPath)
    // drop the shared _staging parent only once it is empty
    try Files.deleteIfExists(staging.getParentFile.toPath)
    catch { case _: java.nio.file.DirectoryNotEmptyException => () }
  }
}

class WarehouseWriterFactory(stagingPath: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new WarehouseDataWriter(stagingPath, schema, partitionId, taskId)
}

/** Executor-side writer: buffers nothing, streams JSON lines to this
  * attempt's private staging file. Rows are written eagerly so memory use
  * is O(1) regardless of partition size. */
class WarehouseDataWriter(stagingPath: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val file = new File(stagingPath, s"part-$partitionId-$taskId")
  private var out: java.io.Writer = _
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null)
      out = Files.newBufferedWriter(file.toPath, StandardCharsets.UTF_8)
    out.write(WarehouseSink.rowToJson(row, schema))
    out.write('\n')
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    WarehouseCommitMessage(partitionId, file.getAbsolutePath)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(file.toPath)
  }

  override def close(): Unit = ()
}
