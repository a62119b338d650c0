package graft.retrieval

import graft.functions.{ExternalCall, ExternalCompleter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J9 cross-verification: candidates checked for mutual consistency
  * (reference: alma/retrieval/verification.py:623-688 — each candidate
  * vs the other candidates; LLM-backed there, deterministic token-
  * overlap consensus here). Driver-side over the collected top-k
  * (≤ ~100 rows — bounded regardless of corpus size, SURVEY §7.4).
  */
object Verification {

  final case class Verdict(id: Long, supportVotes: Int, category: String)

  /** Pairwise consistency vote: candidates supporting each other (token
    * overlap ≥ threshold) count as votes; categories follow the
    * reference ladder (verified / uncertain / contradicted).
    */
  def crossVerify(
      candidates: Seq[(Long, String)],
      overlapThreshold: Double = 0.3,
      verifyQuorum: Double = 0.5): Seq[Verdict] = {
    val tokenSets = candidates.map { case (id, text) =>
      id -> text.toLowerCase.split("\\s+").toSet
    }
    tokenSets.map { case (id, toks) =>
      val others = tokenSets.filter(_._1 != id)
      val votes = others.count { case (_, o) =>
        val overlap =
          if (toks.isEmpty || o.isEmpty) 0.0
          else (toks & o).size.toDouble / math.min(toks.size, o.size)
        overlap >= overlapThreshold
      }
      val category =
        if (others.isEmpty) "unverifiable"
        else if (votes.toDouble / others.size >= verifyQuorum) "verified"
        else if (votes > 0) "uncertain"
        else "contradicted"
      Verdict(id, votes, category)
    }
  }

  /** Ground-truth verification through a pluggable external model
    * (reference: alma/retrieval/verification.py:563-688 — LLM checks
    * each memory against authoritative sources; here the call is a
    * rate-limited `mapPartitions` stage, so verifying a 100 TB batch is
    * one distributed pass, not a driver loop). The deterministic
    * `crossVerify` above remains the model-free default; this stage is
    * optional, exactly like the reference's `llm=None` fallback.
    *
    * Returns (idCol, status, confidence, reason) rows.
    */
  def externalVerify(
      candidates: DataFrame,
      idCol: String,
      contentCol: String,
      sources: Seq[String],
      completer: ExternalCompleter,
      limiterKey: String = "verify",
      callsPerPeriod: Int = 100,
      periodMillis: Long = 60000L): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val prompts = candidates
      .select(col(idCol).cast("long"), col(contentCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, content) => (id, ExternalCall.verifyPrompt(content, sources)) }
      .toDF("id", "prompt")
    ExternalCall.callStage(prompts, "id", "prompt", completer,
        limiterKey, callsPerPeriod, periodMillis)
      .as[(Long, String)]
      .map { case (id, resp) =>
        val v = ExternalCall.parseVerdict(resp)
        (id, v.status, v.confidence, v.reason)
      }
      .toDF(idCol, "status", "confidence", "reason")
  }
}

/** O5: TTL + LRU retrieval-result cache (reference:
  * alma/retrieval/cache.py:363-737 — SHA-256 keys, 300 s TTL, 1000
  * entries, LRU eviction, hit/miss stats; write-triggered invalidation
  * alma/core.py:358-359). Driver-side — Spark has no cross-job result
  * cache, and the candidate sets cached here are tiny.
  */
final class RetrievalCache[V](ttlMillis: Long = 300000L, maxEntries: Int = 1000) {

  private case class Entry(value: V, storedAt: Long)
  private val map = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
      size() > maxEntries
  }
  private var hits = 0L
  private var misses = 0L

  /** Namespaced key `<len>:<namespace>:<sha256(parts)>` — the form to
    * use when write-triggered invalidation targets an (agent, project)
    * namespace. The length prefix makes the namespace boundary
    * unambiguous (namespace "a" can never prefix-match "a:b"); the
    * matching invalidation predicate is
    * `_.startsWith(nsPrefix(namespace))`.
    */
  def nsKey(namespace: String, parts: String*): String =
    nsPrefix(namespace) + key(parts: _*)

  /** The invalidation prefix for a namespace. */
  def nsPrefix(namespace: String): String =
    s"${namespace.length}:$namespace:"

  /** Collision-resistant cache key (length-prefixed SHA-256,
    * cache.py:101-150).
    */
  def key(parts: String*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach { p =>
      md.update(s"${p.length}:".getBytes("UTF-8"))
      md.update(p.getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  def get(k: String, nowMillis: Long): Option[V] = synchronized {
    Option(map.get(k)) match {
      case Some(e) if nowMillis - e.storedAt <= ttlMillis =>
        hits += 1; Some(e.value)
      case Some(_) =>
        map.remove(k); misses += 1; None
      case None =>
        misses += 1; None
    }
  }

  def put(k: String, v: V, nowMillis: Long): Unit = synchronized {
    map.put(k, Entry(v, nowMillis)): Unit
  }

  /** Write-triggered invalidation by key predicate. Digest keys carry
    * no recoverable prefix, so namespaced invalidation must use
    * `nsKey(namespace, ...)` keys and
    * `invalidateWhere(_.startsWith(nsPrefix(namespace)))`.
    */
  def invalidateWhere(pred: String => Boolean): Int = synchronized {
    val it = map.keySet().iterator()
    var n = 0
    while (it.hasNext) { if (pred(it.next())) { it.remove(); n += 1 } }
    n
  }

  def stats: (Long, Long, Int) = synchronized { (hits, misses, map.size()) }
}
