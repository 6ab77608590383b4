package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.StreamingQueryListener

/** S7 append-only run log (SURVEY.md §2.1): the reference appends one line
  * per scheduled run to `etl_log.txt` (etl.py:222-223). The engine-native
  * form is a [[StreamingQueryListener]] — one line per completed
  * micro-batch across every query on the session, written on the DRIVER
  * (progress events are driver-side; no executor coordination, no
  * data-plane cost at any scale).
  *
  *   spark.streams.addListener(new RunLogListener(path))
  */
class RunLogListener(path: String) extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    append(s"${e.timestamp} started query=${e.id} run=${e.runId}")

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    append(s"${p.timestamp} progress query=${p.id} batch=${p.batchId} " +
      s"rows=${p.numInputRows}")
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    append(s"terminated query=${e.id} run=${e.runId} " +
      s"exception=${e.exception.getOrElse("none")}")

  /** Serialized appends: listener callbacks can interleave across queries;
    * a torn line would corrupt the log's one-event-per-line contract. */
  private def append(line: String): Unit = synchronized {
    Files.write(Paths.get(path), (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
