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
  * retry with exponential backoff (base × 2^attempt, shift clamped so
  * large `maxRetries` cannot overflow the multiplier) up to
  * `maxRetries`; other 4xx are permanent and fail immediately. The
  * sleeper is injectable so specs prove the backoff schedule without
  * real waits.
  *
  * Delivery contract: AT-LEAST-ONCE. A timed-out or reset request may
  * already have been processed (and billed) server-side before the
  * retry fires, so a completion can execute more than once. Each
  * attempt sends an `Idempotency-Key` header derived from the request
  * CONTENT (endpoint + prompt) — identical across in-call retries AND
  * across Spark task retries / speculative duplicates re-invoking
  * `complete()` for the same row, which is the dominant duplication
  * path in a distributed job — so endpoints that honor idempotency
  * keys (most LLM billing APIs) deduplicate all of them; against
  * endpoints that ignore the header, callers needing exactly-once
  * must deduplicate downstream.
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
    sleeper: Long => Unit = Thread.sleep,
    // Overrides the content-derived Idempotency-Key. The default makes
    // identical (endpoint, prompt) pairs share a key — retry-safe, and
    // semantically a cache hit for deterministic completion — but a
    // caller sampling at temperature > 0 who WANTS independent
    // completions for repeated prompts must supply a salted key here
    // (e.g. row id + prompt hash).
    idempotencyKeyFor: Option[String => String] = None) extends ExternalCompleter {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMillis))
      .build()

  def complete(prompt: String): String = {
    // Content-derived, not a per-invocation UUID: in a Spark job the
    // dominant duplicate is a task retry or speculative twin
    // RE-INVOKING complete() for the same row — a fresh UUID per call
    // would present those to the server as new requests. Same
    // (endpoint, prompt) ⇒ same key across in-call retries, task
    // attempts, and job reruns; callers needing per-call uniqueness
    // for identical prompts salt the prompt.
    val idempotencyKey = idempotencyKeyFor.map(_(prompt)).getOrElse {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      d.update(endpoint.getBytes("UTF-8"))
      d.update(0.toByte)
      d.update(prompt.getBytes("UTF-8"))
      d.digest().take(16).map("%02x".format(_)).mkString
    }
    var attempt = 0
    var lastError = ""
    while (attempt <= maxRetries) {
      // Shift clamped at 2^20: a 64-bit left shift of 63+ is undefined
      // in spirit (Java masks the shift count), so a large maxRetries
      // would wrap the backoff negative and Thread.sleep would throw.
      if (attempt > 0) sleeper(baseBackoffMillis << math.min(attempt - 1, 20))
      val req = HttpRequest.newBuilder(URI.create(endpoint))
        .timeout(Duration.ofMillis(timeoutMillis))
        .header("Content-Type", "text/plain; charset=utf-8")
        .header("Idempotency-Key", idempotencyKey)
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
