package graft.events

/** Memory-event pub/sub + webhook delivery (reference:
  * alma/events/types.py MemoryEvent/MemoryEventType;
  * alma/events/emitter.py:25-260 EventEmitter;
  * alma/events/webhook.py:47-330 signed webhook delivery).
  *
  * Spark framing: events here are the CONTROL-plane signal — bounded
  * per-operation notifications delivered to driver-side subscribers
  * (exactly the reference's callback surface). The DATA plane at 100 TB
  * is the tables themselves; a consumer that wants every row change
  * reads the streaming sink, not this emitter. Emission sites cap what
  * they emit accordingly.
  */
final case class MemoryEvent(
    eventType: String,
    agent: String,
    projectId: String,
    memoryType: String,
    memoryId: String,
    timestampUs: Long,
    payload: Map[String, String] = Map.empty) {

  /** Stable JSON rendering (sorted payload keys) — the webhook body. */
  def toJson: String = {
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val pl = payload.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    s"""{"event_type":"${esc(eventType)}","agent":"${esc(agent)}","project_id":"${esc(projectId)}",""" +
      s""""memory_type":"${esc(memoryType)}","memory_id":"${esc(memoryId)}","timestamp_us":$timestampUs,"payload":$pl}"""
  }
}

/** Event-type constants (types.py:13-35). */
object MemoryEventType {
  val Created = "memory.created"
  val Updated = "memory.updated"
  val Deleted = "memory.deleted"
  val Consolidated = "memory.consolidated"
  val HeuristicFormed = "heuristic.formed"
  val AntipatternDetected = "antipattern.detected"
  val PreferenceAdded = "preference.added"
  val KnowledgeAdded = "knowledge.added"
  val ConfidenceUpdated = "confidence.updated"
  val ConfidenceDecayed = "confidence.decayed"
  val RagFeedback = "rag.feedback"
}

/** Driver-side pub/sub registry (emitter.py:25-260): per-type and
  * global subscribers, safe-call isolation (one failing callback never
  * blocks the others or the write path), enable/disable gate.
  */
final class EventEmitter {

  private var byType = Map.empty[String, Vector[MemoryEvent => Unit]]
  private var global = Vector.empty[MemoryEvent => Unit]
  private var enabled = true

  def subscribe(eventType: String)(cb: MemoryEvent => Unit): Unit = synchronized {
    byType = byType.updated(eventType, byType.getOrElse(eventType, Vector.empty) :+ cb)
  }

  def subscribeAll(cb: MemoryEvent => Unit): Unit = synchronized {
    global = global :+ cb
  }

  def unsubscribe(eventType: String, cb: MemoryEvent => Unit): Boolean = synchronized {
    val cur = byType.getOrElse(eventType, Vector.empty)
    val next = cur.filterNot(_ eq cb)
    byType = byType.updated(eventType, next)
    next.size != cur.size
  }

  def hasSubscribers(eventType: String): Boolean = synchronized {
    global.nonEmpty || byType.getOrElse(eventType, Vector.empty).nonEmpty
  }

  def enable(): Unit = synchronized { enabled = true }
  def disable(): Unit = synchronized { enabled = false }
  def clear(): Unit = synchronized { byType = Map.empty; global = Vector.empty }

  /** Deliver to every matching subscriber; callback failures are
    * contained (emitter.py:214-238 _safe_call).
    */
  def emit(event: MemoryEvent): Unit = {
    val targets = synchronized {
      if (!enabled) Vector.empty
      else byType.getOrElse(event.eventType, Vector.empty) ++ global
    }
    targets.foreach { cb =>
      try cb(event)
      catch {
        case e: Throwable =>
          System.err.println(s"[events] subscriber failed for ${event.eventType}: ${e.getMessage}")
      }
    }
  }
}

/** One webhook endpoint: url, optional HMAC secret, optional event-type
  * filter (empty = all events) — webhook.py:47-73.
  */
final case class WebhookConfig(
    url: String,
    secret: Option[String] = None,
    eventTypes: Set[String] = Set.empty) {
  def matchesEvent(eventType: String): Boolean =
    eventTypes.isEmpty || eventTypes.contains(eventType)
}

final case class WebhookDeliveryResult(
    url: String,
    delivered: Boolean,
    payload: String,
    signature: Option[String])

/** The HTTP send seam. No egress exists in this environment, so the
  * transport is pluggable exactly like `ExternalCompleter` — a real
  * impl posts; tests record.
  */
trait WebhookTransport extends Serializable {
  def send(url: String, headers: Map[String, String], payload: String): Boolean
}

/** Signed webhook fan-out (webhook.py:88-330): renders the event JSON,
  * HMAC-SHA256-signs it per endpoint secret, filters by each endpoint's
  * event-type set, and delivers through the transport. `start` attaches
  * it to an emitter as a global subscriber.
  */
final class WebhookManager(
    @volatile private var configs: Seq[WebhookConfig],
    transport: WebhookTransport) {

  def addConfig(c: WebhookConfig): Unit = synchronized { configs = configs :+ c }
  def removeConfig(url: String): Boolean = synchronized {
    val before = configs.size
    configs = configs.filterNot(_.url == url)
    configs.size != before
  }

  /** HMAC-SHA256 hex signature (webhook.py:165-180). */
  def signPayload(payload: String, secret: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def deliver(event: MemoryEvent): Seq[WebhookDeliveryResult] = {
    val payload = event.toJson
    configs.filter(_.matchesEvent(event.eventType)).map { c =>
      val sig = c.secret.map(signPayload(payload, _))
      val headers = Map(
        "Content-Type" -> "application/json",
        "X-Event-Type" -> event.eventType) ++
        sig.map("X-Signature" -> _)
      val ok =
        try transport.send(c.url, headers, payload)
        catch { case _: Throwable => false }
      WebhookDeliveryResult(c.url, ok, payload, sig)
    }
  }

  /** Subscribe this manager to every event on the emitter. */
  def start(emitter: EventEmitter): Unit =
    emitter.subscribeAll(e => { deliver(e); () })
}
