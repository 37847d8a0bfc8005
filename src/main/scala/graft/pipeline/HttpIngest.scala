package graft.pipeline

import java.nio.file.{Files, Path, StandardCopyOption}

/** O1 made executable (bpi_crawler.py:43-52): the reference polls a public
  * JSON API with `requests.get(...).json()` inside the DAG task. The
  * Spark-native shape is fetch-to-landing-file: each poll is one driver-side
  * HTTP GET whose body becomes one immutable file in the landing directory,
  * and the checkpointed file-source stream ([[BpiPipeline.runStream]])
  * consumes it exactly once. That splits ingestion (tiny, driver-side,
  * retryable) from processing (distributed, replayable from the landing
  * files) — no executor ever holds a network dependency, and a poll that
  * dies after the write is harmless because re-listing is idempotent.
  *
  * The transport is injectable: production uses [[httpTransport]]
  * (java.net.http, JDK-builtin), tests pass a fake — same seam the
  * reference gets from mocking `requests`.
  */
object HttpIngest {

  /** URL -> response body. */
  type Transport = String => String

  /** JDK-builtin HTTP GET (java.net.http). Non-2xx raises, so the retry
    * wrapper sees server errors the same as connection failures. */
  def httpTransport(
      timeout: java.time.Duration = java.time.Duration.ofSeconds(30)): Transport = {
    // One client per Transport, not per request: the client owns the
    // selector thread and connection pool, so a long-running poller keeps
    // connections alive instead of paying a handshake (and leaking an
    // executor) on every poll.
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout)
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    url => {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(timeout).GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url")
      resp.body()
    }
  }

  /** O19 parity: the reference task runs with `retries=1` on its cron
    * schedule. Retries are a driver-side loop with linear backoff; after
    * the budget the exception propagates to the scheduler (which is what
    * the reference's Airflow failure path does too). */
  def fetchWithRetry(url: String, transport: Transport, retries: Int = 1,
      backoffMs: Long = 0L): String = {
    var attempt = 0
    while (true) {
      try return transport(url)
      catch {
        case e: Exception if attempt < retries =>
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One poll: fetch the URL and land the body as an immutable JSON file.
    * Write-to-hidden-then-atomic-rename: Spark's file source ignores
    * dot-prefixed files, so the stream can never list a half-written
    * payload. `pollId` names the file (timestamps in production, counters
    * in tests) — re-landing the same pollId overwrites the same file,
    * keeping a crashed-and-rerun poll idempotent. */
  def fetchToLanding(url: String, landingDir: Path, pollId: String,
      transport: Transport, retries: Int = 1): Path = {
    val body = fetchWithRetry(url, transport, retries)
    Files.createDirectories(landingDir)
    val tmp = landingDir.resolve(s".payload_$pollId.json.tmp")
    val dst = landingDir.resolve(s"payload_$pollId.json")
    Files.writeString(tmp, body)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    dst
  }
}
