package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** S2/S3 cache-or-fetch for raw payloads (etl.py:39-70): payloads are keyed
  * `{symbol}_{date}.json`; if today's file exists it is read back VERBATIM
  * (bytes untouched, like the reference's json.load of its own dump),
  * otherwise the fetcher runs and the payload is persisted before use —
  * which is what makes re-runs deterministic and fetch-free (the
  * reference's de-facto fixture mechanism, SURVEY.md §5.1).
  *
  * This is an ingest-side driver utility by design (one small JSON per
  * symbol-day); the data-plane read of the cache dir is the distributed
  * `AlphaVantage.readRaw` / `StreamingIngest.stockStream`. */
class RawCache(dir: String) {
  Files.createDirectories(Paths.get(dir))

  def pathFor(symbol: String, date: String): Path =
    Paths.get(dir, s"${symbol}_$date.json")

  def contains(symbol: String, date: String): Boolean =
    Files.exists(pathFor(symbol, date))

  /** Returns the cached payload, fetching and persisting on miss. The
    * fetcher returning None (rate limit, network down) yields None without
    * caching — the symbol is skipped, never fatal (etl.py:56, 77). */
  def getOrFetch(symbol: String, date: String)(
      fetch: String => Option[String]): Option[String] = {
    val p = pathFor(symbol, date)
    if (Files.exists(p)) {
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    } else {
      fetch(symbol).map { payload =>
        Files.write(p, payload.getBytes(StandardCharsets.UTF_8))
        payload
      }
    }
  }
}

/** S7 append-only run log (etl.py:222-223): one line per pipeline run. */
class RunLog(path: String) {
  def append(message: String): Unit = {
    val line = s"$message\n"
    Files.write(Paths.get(path), line.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  def lines(): Seq[String] =
    if (Files.exists(Paths.get(path)))
      scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(Paths.get(path))).asScala.toSeq
    else Seq.empty
}
