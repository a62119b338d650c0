package graft.sources

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Chat-export format detection + normalization to transcript form
  * (reference: alma/ingestion/normalizer.py:30-69 detect_format,
  * :197-218 normalize_text, :244-470 per-format parsers, :621-638
  * transcript rendering).
  *
  * Detection is a pure column expression — `get_json_object` probes on
  * (at most) the first 20 lines and the whole document, codegen'd, no
  * UDF — so a 100 TB triage pass ("what formats are in this dump?") is
  * one scan + one aggregate. Normalization parses real JSON per row
  * (json4s, which ships with Spark) inside a Dataset map: per-row work,
  * no shuffle, no driver round-trip.
  *
  * Simplifications vs the reference, documented: content-based detection
  * only (no file-extension hint, no size cap — sizing is the reader's
  * job here), text blocks only in block lists (the reference also
  * renders tool_use/tool_result summaries), and Claude-privacy-export
  * multi-conversation files normalize conversation-by-conversation
  * without the reference's cross-file join of attachments.
  */
object Normalizer {

  val Formats = Seq("transcript", "claude_code_jsonl", "codex_jsonl",
    "claude_ai_json", "chatgpt_json", "slack_json", "plain_text")

  // ---- detection (column expression) --------------------------------

  /** Format of a raw export string, as a column (detect_format order:
    * transcript markers first, then JSONL probes, then whole-JSON
    * probes, else plain text).
    */
  def detectFormat(content: Column): Column = {
    val allLines = split(content, "\n")
    val lines = slice(allLines, 1, 20)
    val transcript =
      size(filter(allLines, l => ltrim(l).startsWith(">"))) >= 3
    val jsonish = ltrim(content).startsWith("{") || ltrim(content).startsWith("[")
    val claudeCode = exists(lines,
      l => get_json_object(l, "$.type").isin("human", "user", "assistant"))
    val codex = exists(lines, l => get_json_object(l, "$.type") === "session_meta")
    val claudeAi =
      get_json_object(content, "$.messages").isNotNull ||
        get_json_object(content, "$.chat_messages").isNotNull ||
        get_json_object(content, "$[0].chat_messages").isNotNull ||
        get_json_object(content, "$[0].messages").isNotNull ||
        get_json_object(content, "$[0].role").isNotNull ||
        get_json_object(content, "$[0].sender").isNotNull
    val chatgpt = get_json_object(content, "$.mapping").isNotNull
    val slack = get_json_object(content, "$[0].type") === "message"
    when(transcript, lit("transcript"))
      .when(jsonish && claudeCode, lit("claude_code_jsonl"))
      .when(jsonish && codex, lit("codex_jsonl"))
      .when(jsonish && claudeAi, lit("claude_ai_json"))
      .when(jsonish && chatgpt, lit("chatgpt_json"))
      .when(jsonish && slack, lit("slack_json"))
      .otherwise(lit("plain_text"))
  }

  // ---- normalization (per-row Scala, executor-side) -----------------

  /** Normalize one export to transcript format with `>` user markers;
    * unrecognized content passes through (normalize_text semantics).
    */
  def normalizeText(content: String): String = {
    if (content == null || content.trim.isEmpty) Option(content).getOrElse("")
    else if (content.split("\n").count(_.trim.startsWith(">")) >= 3) content
    else if (!"{[".contains(content.trim.take(1))) content
    else tryNormalizeJson(content).getOrElse(content)
  }

  /** Distributed normalize: adds `fmt` and `transcript` columns. The
    * single udf call is per-row scalar work; detection stays codegen'd.
    */
  def normalizeDocuments(df: DataFrame, contentCol: String): DataFrame = {
    val norm = udf((s: String) => normalizeText(s))
    df.withColumn("fmt", detectFormat(col(contentCol)))
      .withColumn("transcript", norm(col(contentCol)))
  }

  private def tryNormalizeJson(content: String): Option[String] =
    tryClaudeCodeJsonl(content)
      .orElse(tryCodexJsonl(content))
      .orElse(JsonMethods.parseOpt(content).flatMap { data =>
        tryClaudeAiJson(data).orElse(tryChatgptJson(data)).orElse(trySlackJson(data))
      })

  private def str(v: JValue): Option[String] = v match {
    case JString(s) if s.trim.nonEmpty => Some(s.trim)
    case _ => None
  }

  /** Text of a content value: a string, or the text blocks of a block
    * list joined with newlines (normalizer._extract_content, text blocks
    * only).
    */
  private def extractContent(v: JValue): Option[String] = v match {
    case JString(s) if s.trim.nonEmpty => Some(s.trim)
    case JArray(blocks) =>
      val texts = blocks.collect {
        case b: JObject if str(b \ "type").contains("text") => str(b \ "text")
      }.flatten
      if (texts.nonEmpty) Some(texts.mkString("\n")) else None
    case _ => None
  }

  private def tryClaudeCodeJsonl(content: String): Option[String] = {
    val msgs = content.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap(l => JsonMethods.parseOpt(l)).collect { case o: JObject => o }
      .flatMap { entry =>
        val role = str(entry \ "type")
        val text = extractContent(entry \ "message" \ "content")
        (role, text) match {
          case (Some("human") | Some("user"), Some(t)) => Some(("user", t))
          case (Some("assistant"), Some(t)) => Some(("assistant", t))
          case _ => None
        }
      }.toSeq
    if (msgs.count { case (r, _) => r == "user" || r == "assistant" } >= 2)
      Some(toTranscript(mergeAssistantRuns(msgs)))
    else None
  }

  private def tryCodexJsonl(content: String): Option[String] = {
    val entries = content.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .flatMap(l => JsonMethods.parseOpt(l)).collect { case o: JObject => o }.toSeq
    val hasMeta = entries.exists(e => str(e \ "type").contains("session_meta"))
    val msgs = entries.filter(e => str(e \ "type").contains("event_msg")).flatMap { e =>
      val p = e \ "payload"
      (str(p \ "type"), str(p \ "message")) match {
        case (Some("user_message"), Some(t)) => Some(("user", t))
        case (Some("agent_message"), Some(t)) => Some(("assistant", t))
        case _ => None
      }
    }
    if (hasMeta && msgs.length >= 2) Some(toTranscript(msgs)) else None
  }

  private def collectRoleMessages(items: Seq[JValue]): Seq[(String, String)] =
    items.collect { case o: JObject =>
      val role = str(o \ "role").orElse(str(o \ "sender"))
      val text = extractContent(o \ "content").orElse(str(o \ "text"))
      (role, text) match {
        case (Some("user") | Some("human"), Some(t)) => Some(("user", t))
        case (Some("assistant") | Some("ai"), Some(t)) => Some(("assistant", t))
        case _ => None
      }
    }.flatten

  private def tryClaudeAiJson(data: JValue): Option[String] = {
    val body = data match {
      case o: JObject =>
        (o \ "messages", o \ "chat_messages") match {
          case (a: JArray, _) => a
          case (_, a: JArray) => a
          case _ => JNothing
        }
      case a: JArray => a
      case _ => JNothing
    }
    body match {
      case JArray(items @ (first: JObject) +: _)
          if (first \ "chat_messages") != JNothing || (first \ "messages") != JNothing =>
        // Privacy export: one transcript per conversation object.
        val transcripts = items.collect { case convo: JObject =>
          val chat = (convo \ "chat_messages", convo \ "messages") match {
            case (a: JArray, _) => a.arr
            case (_, a: JArray) => a.arr
            case _ => Nil
          }
          collectRoleMessages(chat)
        }.filter(_.length >= 2).map(toTranscript)
        if (transcripts.nonEmpty) Some(transcripts.mkString("\n\n")) else None
      case JArray(items) =>
        val msgs = collectRoleMessages(items)
        if (msgs.length >= 2) Some(toTranscript(msgs)) else None
      case _ => None
    }
  }

  private def tryChatgptJson(data: JValue): Option[String] = data match {
    case o: JObject if (o \ "mapping").isInstanceOf[JObject] =>
      // Keep the export's field order (like Python's insertion-ordered
      // dict): with several parentless nodes, the FIRST one in the file
      // is the root, deterministically.
      val entries = (o \ "mapping").asInstanceOf[JObject].obj
      val mapping = entries.collect { case (id, n: JObject) => id -> n }.toMap
      // Missing and explicit-null both mean "no parent" (Python .get).
      val noVal = (v: JValue) => v == JNull || v == JNothing
      val root = entries.collectFirst {
        case (id, n: JObject) if noVal(n \ "parent") && noVal(n \ "message") => id
      }.orElse(entries.collectFirst {
        case (id, n: JObject) if noVal(n \ "parent") => id
      })
      val msgs = Iterator.iterate(root) { cur =>
        cur.flatMap(id => mapping.get(id)).flatMap(n => (n \ "children") match {
          case JArray(JString(c) +: _) => Some(c)
          case _ => None
        })
      }.takeWhile(_.isDefined).flatten
        .flatMap(id => mapping.get(id)).flatMap { n =>
          val msg = n \ "message"
          val role = str(msg \ "author" \ "role")
          val text = (msg \ "content" \ "parts") match {
            case JArray(parts) =>
              val t = parts.collect { case JString(p) if p.nonEmpty => p }.mkString(" ").trim
              if (t.nonEmpty) Some(t) else None
            case _ => None
          }
          (role, text) match {
            case (Some("user"), Some(t)) => Some(("user", t))
            case (Some("assistant"), Some(t)) => Some(("assistant", t))
            case _ => None
          }
        }.toSeq
      if (msgs.length >= 2) Some(toTranscript(msgs)) else None
    case _ => None
  }

  /** Slack export: first distinct speaker = user, alternation preserved
    * (normalizer.py:440-470).
    */
  private def trySlackJson(data: JValue): Option[String] = data match {
    case JArray(items) =>
      var seen = Map.empty[String, String]
      var lastRole: Option[String] = None
      val msgs = items.collect { case o: JObject if str(o \ "type").contains("message") =>
        val user = str(o \ "user").orElse(str(o \ "username"))
        val text = str(o \ "text")
        (user, text) match {
          case (Some(u), Some(t)) =>
            val role = seen.getOrElse(u, {
              val r = if (seen.isEmpty) "user"
              else if (lastRole.contains("user")) "assistant" else "user"
              seen += u -> r; r
            })
            lastRole = Some(role)
            Some((role, t))
          case _ => None
        }
      }.flatten
      if (msgs.length >= 2) Some(toTranscript(msgs)) else None
    case _ => None
  }

  private def mergeAssistantRuns(msgs: Seq[(String, String)]): Seq[(String, String)] =
    msgs.foldLeft(Vector.empty[(String, String)]) {
      case (acc :+ (("assistant", prev)), ("assistant", t)) =>
        acc :+ (("assistant", prev + "\n" + t))
      case (acc, m) => acc :+ m
    }

  /** `> user` marker transcript (normalizer._messages_to_transcript):
    * each user turn gets a `>` line, an immediately-following assistant
    * turn rides in the same block, blocks separated by blank lines.
    */
  private def toTranscript(msgs: Seq[(String, String)]): String = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < msgs.length) {
      val (role, text) = msgs(i)
      if (role == "user") {
        out += s"> $text"
        if (i + 1 < msgs.length && msgs(i + 1)._1 == "assistant") {
          out += msgs(i + 1)._2
          i += 2
        } else i += 1
      } else {
        out += text
        i += 1
      }
      out += ""
    }
    out.result().mkString("\n")
  }

  // ---- oracle query -------------------------------------------------

  // Render each document as a different export format (keyed on lang +
  // doc parity) and detect it back — detection logic implemented twice,
  // Spark columns vs DuckDB SQL.
  private def detectFormatQ(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val nl = lit("\n")
    val export =
      when(col("lang") === "en" && col("doc_id") % 2 === 0, concat(
        lit("""{"type": "session_meta"}"""), nl,
        lit("""{"type": "event_msg", "payload": {"type": "user_message", "message": """"), t, lit("\"}}")))
        .when(col("lang") === "en", concat(
          lit("> "), t, nl, lit("reply"), nl, lit("> more"), nl, lit("reply"), nl, lit("> third")))
        .when(col("lang") === "fr", concat(
          lit("""{"mapping": {"n1": {"parent": null, "message": null, "children": []}}, "title": """"), t, lit("\"}")))
        .when(col("lang") === "de", concat(
          lit("""[{"type": "message", "user": "u1", "text": """"), t, lit("\"}]")))
        .when(col("lang") === "es", concat(
          lit("""{"messages": [{"role": "user", "content": """"), t, lit("\"}]}")))
        .otherwise(concat(
          lit("""{"type": "user", "message": {"content": """"), t, lit("\"}}"), nl,
          lit("""{"type": "assistant", "message": {"content": "ok"}}""")))
    Tables.documents(s, dir)
      .select(col("doc_id"), export.as("export"))
      .select(col("doc_id"), detectFormat(col("export")).as("fmt"))
      .orderBy("doc_id")
  }

  private val detectFormatSql =
    """WITH r AS (
      |  SELECT doc_id,
      |    CASE
      |      WHEN lang = 'en' AND doc_id % 2 = 0 THEN
      |        '{"type": "session_meta"}' || chr(10) ||
      |        '{"type": "event_msg", "payload": {"type": "user_message", "message": "' || text || '"}}'
      |      WHEN lang = 'en' THEN
      |        '> ' || text || chr(10) || 'reply' || chr(10) || '> more' || chr(10) || 'reply' || chr(10) || '> third'
      |      WHEN lang = 'fr' THEN
      |        '{"mapping": {"n1": {"parent": null, "message": null, "children": []}}, "title": "' || text || '"}'
      |      WHEN lang = 'de' THEN
      |        '[{"type": "message", "user": "u1", "text": "' || text || '"}]'
      |      WHEN lang = 'es' THEN
      |        '{"messages": [{"role": "user", "content": "' || text || '"}]}'
      |      ELSE
      |        '{"type": "user", "message": {"content": "' || text || '"}}' || chr(10) ||
      |        '{"type": "assistant", "message": {"content": "ok"}}'
      |    END AS export
      |  FROM documents)
      |SELECT doc_id,
      |  CASE
      |    WHEN len(list_filter(string_split(export, chr(10)), l -> ltrim(l) LIKE '>%')) >= 3
      |      THEN 'transcript'
      |    WHEN (ltrim(export) LIKE '{%' OR ltrim(export) LIKE '[%')
      |      AND len(list_filter(string_split(export, chr(10))[1:20],
      |        l -> json_valid(l) AND json_extract_string(l, '$.type') IN ('human', 'user', 'assistant'))) > 0
      |      THEN 'claude_code_jsonl'
      |    WHEN (ltrim(export) LIKE '{%' OR ltrim(export) LIKE '[%')
      |      AND len(list_filter(string_split(export, chr(10))[1:20],
      |        l -> json_valid(l) AND json_extract_string(l, '$.type') = 'session_meta')) > 0
      |      THEN 'codex_jsonl'
      |    WHEN (ltrim(export) LIKE '{%' OR ltrim(export) LIKE '[%') AND json_valid(export)
      |      AND (json_extract(export, '$.messages') IS NOT NULL
      |        OR json_extract(export, '$.chat_messages') IS NOT NULL
      |        OR json_extract(export, '$[0].chat_messages') IS NOT NULL
      |        OR json_extract(export, '$[0].messages') IS NOT NULL
      |        OR json_extract(export, '$[0].role') IS NOT NULL
      |        OR json_extract(export, '$[0].sender') IS NOT NULL)
      |      THEN 'claude_ai_json'
      |    WHEN (ltrim(export) LIKE '{%' OR ltrim(export) LIKE '[%') AND json_valid(export)
      |      AND json_extract(export, '$.mapping') IS NOT NULL
      |      THEN 'chatgpt_json'
      |    WHEN (ltrim(export) LIKE '{%' OR ltrim(export) LIKE '[%') AND json_valid(export)
      |      AND json_extract_string(export, '$[0].type') = 'message'
      |      THEN 'slack_json'
      |    ELSE 'plain_text'
      |  END AS fmt
      |FROM r ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(Q("q_detect_format", detectFormatQ, Some(detectFormatSql)))
}
