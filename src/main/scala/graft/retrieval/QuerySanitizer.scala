package graft.retrieval

/** Query sanitization — strips prompt contamination from retrieval
  * queries before embedding (reference: alma/retrieval/query_sanitizer.py:42-200,
  * 4-step cascade). Driver-side scalar preprocessing (query planning,
  * not a cluster op).
  */
object QuerySanitizer {

  val PassthroughMax = 200
  val TailMax = 250

  private val sentenceSplit = "(?<=[.!?])\\s+".r

  def sanitize(query: String): String = {
    val q = query.trim
    // 1. Short queries pass through untouched.
    if (q.length <= PassthroughMax) return q
    val sentences = sentenceSplit.split(q).toSeq.filter(_.nonEmpty)
    // 2. Prefer the last question sentence (the actual ask, not the
    //    pasted context above it).
    sentences.reverse.find(s => s.endsWith("?") && s.length <= TailMax) match {
      case Some(question) => question.trim
      case None =>
        // 3. Fall back to the final sentence if it is short enough.
        val tail = sentences.lastOption.getOrElse(q)
        // 4. Last resort: hard tail truncation.
        if (tail.length <= TailMax) tail.trim
        else q.substring(q.length - TailMax).trim
    }
  }
}
