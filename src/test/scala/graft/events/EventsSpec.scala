package graft.events

import java.nio.file.Files
import java.sql.Timestamp

import graft.{Alma, SparkSpec}

/** Event emitter + webhook surface (reference alma/events/): type
  * filtering, safe-call isolation, HMAC payload signing, transport
  * seam, and the facade write-path wiring.
  */
class EventsSpec extends SparkSpec {

  private def ev(t: String) =
    MemoryEvent(t, "a1", "p1", "outcomes", "m1", 1000L, Map("k" -> "v"))

  test("per-type and global subscribers both receive matching events") {
    val em = new EventEmitter
    var typed = List.empty[String]
    var all = List.empty[String]
    em.subscribe(MemoryEventType.Created)(e => typed ::= e.eventType)
    em.subscribeAll(e => all ::= e.eventType)
    em.emit(ev(MemoryEventType.Created))
    em.emit(ev(MemoryEventType.Deleted))
    assert(typed == List(MemoryEventType.Created))
    assert(all == List(MemoryEventType.Deleted, MemoryEventType.Created))
  }

  test("a throwing subscriber never blocks the others, and disable gates emission") {
    val em = new EventEmitter
    var delivered = 0
    em.subscribe(MemoryEventType.Created)(_ => throw new RuntimeException("boom"))
    em.subscribe(MemoryEventType.Created)(_ => delivered += 1)
    em.emit(ev(MemoryEventType.Created))
    assert(delivered == 1)
    em.disable()
    em.emit(ev(MemoryEventType.Created))
    assert(delivered == 1)
    em.enable()
    em.emit(ev(MemoryEventType.Created))
    assert(delivered == 2)
  }

  test("unsubscribe removes exactly the given callback") {
    val em = new EventEmitter
    var n = 0
    val cb: MemoryEvent => Unit = _ => n += 1
    em.subscribe(MemoryEventType.Created)(cb)
    assert(em.hasSubscribers(MemoryEventType.Created))
    assert(em.unsubscribe(MemoryEventType.Created, cb))
    assert(!em.unsubscribe(MemoryEventType.Created, cb))
    em.emit(ev(MemoryEventType.Created))
    assert(n == 0)
  }

  test("event JSON is stable and escaped") {
    val e = MemoryEvent("memory.created", "a\"gent", "p1", "outcomes", "id1", 42L,
      Map("b" -> "2", "a" -> "line\nbreak"))
    val json = e.toJson
    assert(json.contains(""""agent":"a\"gent""""))
    assert(json.contains(""""payload":{"a":"line\nbreak","b":"2"}"""))
    assert(json == e.toJson)
  }

  test("webhook manager signs, filters by event type, and uses the transport seam") {
    var sent = List.empty[(String, Map[String, String], String)]
    val transport = new WebhookTransport {
      def send(url: String, headers: Map[String, String], payload: String): Boolean = {
        sent ::= ((url, headers, payload)); true
      }
    }
    val mgr = new WebhookManager(Seq(
      WebhookConfig("http://x/created", Some("s3cret"), Set(MemoryEventType.Created)),
      WebhookConfig("http://x/all", None)), transport)
    val results = mgr.deliver(ev(MemoryEventType.Created))
    assert(results.map(_.url) == Seq("http://x/created", "http://x/all"))
    assert(results.forall(_.delivered))
    // The signature is deterministic HMAC-SHA256 of the payload.
    val signed = results.head
    assert(signed.signature.contains(mgr.signPayload(signed.payload, "s3cret")))
    val headers = sent.reverse.head._2
    assert(headers("X-Event-Type") == MemoryEventType.Created)
    assert(headers.contains("X-Signature"))
    // A non-matching event only reaches the unfiltered endpoint.
    sent = Nil
    assert(mgr.deliver(ev(MemoryEventType.Deleted)).map(_.url) == Seq("http://x/all"))
  }

  test("webhook manager attaches to an emitter and configs can be managed") {
    val transport = new WebhookTransport {
      var n = 0
      def send(url: String, headers: Map[String, String], payload: String): Boolean = {
        n += 1; true
      }
    }
    val mgr = new WebhookManager(Seq(WebhookConfig("http://x/a")), transport)
    val em = new EventEmitter
    mgr.start(em)
    em.emit(ev(MemoryEventType.Created))
    assert(transport.n == 1)
    assert(mgr.removeConfig("http://x/a") && !mgr.removeConfig("http://x/a"))
    em.emit(ev(MemoryEventType.Created))
    assert(transport.n == 1)
  }

  test("Alma write paths emit control-plane events") {
    def ts(s: String) = Timestamp.valueOf(s)
    val alma = Alma(spark, Files.createTempDirectory("alma-ev").toString, projectId = "proj1")
    var seen = List.empty[MemoryEvent]
    alma.events.subscribeAll(e => seen ::= e)
    alma.learn("helena", "deploy", "deploy it", success = true,
      strategyUsed = "canary", asOf = ts("2024-01-01 10:00:00"))
    alma.addUserPreference("u1", "style", "terse", "chat", 0.9, ts("2024-01-01 11:00:00"))
    alma.addDomainKnowledge("helena", "spark", "AQE replans at runtime", "docs", 0.9,
      ts("2024-01-01 12:00:00"))
    val types = seen.reverse.map(_.eventType)
    assert(types == List(MemoryEventType.Created, MemoryEventType.PreferenceAdded,
      MemoryEventType.KnowledgeAdded))
    val created = seen.reverse.head
    assert(created.memoryType == "outcomes" && created.projectId == "proj1"
      && created.payload("task_type") == "deploy")
  }
}
