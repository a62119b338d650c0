package graft.functions

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, HttpTimeoutException}
import java.time.Duration

/** HTTP-backed `ExternalCompleter` — the real client path behind the
  * external-call seam (reference: alma/consolidation/engine.py:576-657
  * `_call_llm`, alma/retrieval/verification.py:563-688; the reference's
  * client retries with backoff the same way). JDK-only
  * (`java.net.http.HttpClient`, Java 11+): POSTs the prompt to the
  * endpoint and returns the response body.
  *
  * Retry policy: 429 and 5xx responses, connect failures, and timeouts
  * retry with exponential backoff (base × 2^attempt) up to
  * `maxRetries`; other 4xx are permanent and fail immediately. The
  * sleeper is injectable so specs prove the backoff schedule without
  * real waits.
  *
  * Distribution: instances are Serializable task closures; the
  * underlying HttpClient is `@transient lazy`, so each executor JVM
  * builds its own connection pool on first use — pair with
  * `ExternalCall.callStage`, whose per-JVM token bucket then paces
  * exactly the calls this client sends.
  */
final class HttpCompleter(
    endpoint: String,
    maxRetries: Int = 3,
    baseBackoffMillis: Long = 100L,
    timeoutMillis: Long = 10000L,
    sleeper: Long => Unit = Thread.sleep) extends ExternalCompleter {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMillis))
      .build()

  def complete(prompt: String): String = {
    var attempt = 0
    var lastError = ""
    while (attempt <= maxRetries) {
      if (attempt > 0) sleeper(baseBackoffMillis << (attempt - 1))
      val req = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(Duration.ofMillis(timeoutMillis))
        .header("Content-Type", "text/plain; charset=utf-8")
        .POST(HttpRequest.BodyPublishers.ofString(prompt))
        .build()
      // Timeouts, refusals, and resets are all transient (retry); a
      // completed exchange decides below: 2xx returns, 429/5xx retries,
      // any other status is permanent.
      val resp =
        try Some(client.send(req, HttpResponse.BodyHandlers.ofString()))
        catch {
          case e: HttpTimeoutException => lastError = s"timeout: ${e.getMessage}"; None
          case e: IOException => lastError = s"io: ${e.getMessage}"; None
        }
      resp match {
        case Some(r) if r.statusCode() / 100 == 2 => return r.body()
        case Some(r) if r.statusCode() == 429 || r.statusCode() / 100 == 5 =>
          lastError = s"HTTP ${r.statusCode()}"
        case Some(r) =>
          throw new IOException(s"permanent HTTP ${r.statusCode()} from $endpoint")
        case None => ()
      }
      attempt += 1
    }
    throw new IOException(
      s"completion failed after ${maxRetries + 1} attempts: $lastError")
  }
}
