package graft.functions

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The HTTP client path behind the external-call seam, integration-
  * tested against an in-JVM loopback server (no external network):
  * success, retry-with-backoff on 5xx, permanent 4xx, timeout, and the
  * per-executor token bucket pacing REAL calls through
  * `ExternalCall.callStage`.
  */
class HttpCompleterSpec extends SparkSpec {

  private def withServer(handler: HttpExchange => Unit)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handler(ex))
    // Concurrent handling: a retry after a timeout must reach the server
    // while the timed-out exchange's handler is still sleeping.
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, bodyText: String): Unit = {
    val bytes = bodyText.getBytes(UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  test("success: POSTs the prompt, returns the body") {
    withServer(ex => respond(ex, 200, s"echo:${readBody(ex)}")) { url =>
      val c = new HttpCompleter(url)
      assert(c.complete("hello") == "echo:hello")
    }
  }

  test("retries 5xx with exponential backoff, then succeeds") {
    val calls = new AtomicInteger(0)
    val sleeps = ArrayBuffer.empty[Long]
    withServer { ex =>
      if (calls.incrementAndGet() <= 2) respond(ex, 500, "boom")
      else respond(ex, 200, "ok")
    } { url =>
      val c = new HttpCompleter(url, maxRetries = 3,
        baseBackoffMillis = 100L, sleeper = sleeps += _)
      assert(c.complete("p") == "ok")
      assert(calls.get() == 3)
      assert(sleeps.toSeq == Seq(100L, 200L), s"backoff schedule: $sleeps")
    }
  }

  test("Idempotency-Key: content-derived, stable across retries, overridable") {
    // Default key: the retried POST after a 500 carries the SAME key as
    // the first attempt — the header exists so a server that processed
    // the timed-out original can dedup the retry.
    val keys = ArrayBuffer.empty[String]
    withServer { ex =>
      val k = ex.getRequestHeaders.getFirst("Idempotency-Key")
      keys.synchronized { keys += k }
      if (keys.synchronized(keys.size) < 2) respond(ex, 500, "boom")
      else respond(ex, 200, "ok")
    } { url =>
      val c = new HttpCompleter(url, maxRetries = 2, sleeper = _ => ())
      assert(c.complete("p") == "ok")
      assert(keys.size == 2 && keys.head != null && keys.head.nonEmpty)
      assert(keys.toSet.size == 1, s"retry changed the key: $keys")
    }
    // Override seam: a caller sampling at temperature > 0 salts the key
    // so identical prompts become independent requests server-side.
    val salted = ArrayBuffer.empty[String]
    withServer { ex =>
      salted.synchronized { salted += ex.getRequestHeaders.getFirst("Idempotency-Key") }
      respond(ex, 200, "ok")
    } { url =>
      var n = 0
      val c = new HttpCompleter(url,
        idempotencyKeyFor = Some(p => { n += 1; s"$p#$n" }))
      c.complete("p"); c.complete("p")
      assert(salted.toSeq == Seq("p#1", "p#2"))
    }
  }

  test("gives up after maxRetries on persistent 503") {
    val calls = new AtomicInteger(0)
    withServer { ex => calls.incrementAndGet(); respond(ex, 503, "nope") } { url =>
      val c = new HttpCompleter(url, maxRetries = 2, sleeper = _ => ())
      val e = intercept[java.io.IOException](c.complete("p"))
      assert(e.getMessage.contains("after 3 attempts"))
      assert(e.getMessage.contains("HTTP 503"))
      assert(calls.get() == 3)
    }
  }

  test("a permanent 4xx fails immediately without retrying") {
    val calls = new AtomicInteger(0)
    withServer { ex => calls.incrementAndGet(); respond(ex, 404, "missing") } { url =>
      val c = new HttpCompleter(url, maxRetries = 3, sleeper = _ => ())
      val e = intercept[java.io.IOException](c.complete("p"))
      assert(e.getMessage.contains("permanent HTTP 404"))
      assert(calls.get() == 1)
    }
  }

  test("timeouts are transient: retried, then reported") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet()
      Thread.sleep(1000)
      respond(ex, 200, "too late")
    } { url =>
      val c = new HttpCompleter(url, maxRetries = 1,
        timeoutMillis = 150L, sleeper = _ => ())
      val e = intercept[java.io.IOException](c.complete("p"))
      assert(e.getMessage.contains("after 2 attempts"))
      assert(e.getMessage.contains("timeout"))
      assert(calls.get() == 2)
    }
  }

  test("callStage drives real HTTP calls and the token bucket paces them") {
    import spark.implicits._
    val served = new AtomicInteger(0)
    withServer { ex =>
      served.incrementAndGet()
      respond(ex, 200, s"v:${readBody(ex)}")
    } { url =>
      val prompts = (1 to 6).map(i => (i.toLong, s"prompt$i")).toDF("id", "prompt")
        .repartition(1)
      val t0 = System.nanoTime()
      val out = ExternalCall.callStage(
        prompts, "id", "prompt", new HttpCompleter(url),
        limiterKey = s"http-pace-${System.nanoTime()}", // fresh bucket per run
        callsPerPeriod = 2, periodMillis = 250L)
        .collect()
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(out.length == 6)
      assert(served.get() == 6, s"server saw ${served.get()} calls")
      assert(out.forall(_.getString(1).startsWith("v:prompt")))
      // 6 calls at 2/250ms must span at least two full windows.
      assert(elapsedMs >= 400L, s"bucket did not pace: ${elapsedMs}ms")
    }
  }
}
