package graft.config

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** `.alma/config.yaml` loader (reference alma/config/loader.py:30-120):
  * optional top-level `alma:` section unwrap, `${ENV_VAR}` expansion,
  * defaults when the file is missing or empty. SnakeYAML ships on the
  * Spark classpath, so this costs no extra dependency. Secrets-manager
  * refs (`${KEYVAULT:...}`) are out of scope here — an unresolvable
  * ref throws rather than silently passing through.
  */
object ConfigLoader {

  private val RefPattern = """\$\{([^}]+)\}""".r

  def defaults: Map[String, Any] = Map(
    "storage" -> "file",
    "storage_dir" -> ".alma",
    "project_id" -> "default",
    "embedding_provider" -> "local")

  def load(configPath: String): Map[String, Any] = {
    val p = Paths.get(configPath)
    if (!Files.exists(p)) return defaults
    val raw = new Yaml().load[Any](Files.readString(p))
    raw match {
      case null => defaults
      case m: java.util.Map[_, _] =>
        val top = m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        // loader.py:53 — the `alma:` section when present, else the file.
        val section = top.get("alma") match {
          case Some(inner: java.util.Map[_, _]) =>
            inner.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
          case _ => top
        }
        expand(section).asInstanceOf[Map[String, Any]]
      case other =>
        throw new IllegalArgumentException(
          s"config root must be a mapping, got ${other.getClass.getSimpleName}")
    }
  }

  /** Recursive `${ENV_VAR}` expansion (loader.py:60-99). */
  private def expand(v: Any): Any = v match {
    case m: Map[_, _] => m.map { case (k, x) => k -> expand(x) }
    case m: java.util.Map[_, _] =>
      m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        .map { case (k, x) => k -> expand(x) }
    case l: java.util.List[_] => l.asScala.toList.map(expand)
    case l: List[_] => l.map(expand)
    case s: String if s.contains("${") =>
      RefPattern.replaceAllIn(s, m => {
        val ref = m.group(1)
        sys.env.getOrElse(ref, throw new IllegalArgumentException(
          s"config references unset environment variable: $ref"))
      })
    case other => other
  }

  // Typed accessors over the loosely-typed YAML tree.
  def str(cfg: Map[String, Any], key: String, default: String): String =
    cfg.get(key).map(_.toString).getOrElse(default)

  def strings(m: Map[String, Any], key: String): Seq[String] = m.get(key) match {
    case Some(l: List[_]) => l.map(_.toString)
    case Some(l: java.util.List[_]) => l.asScala.toList.map(_.toString)
    case _ => Nil
  }

  def int(m: Map[String, Any], key: String, default: Int): Int = m.get(key) match {
    case Some(n: Number) => n.intValue
    case Some(s: String) => s.toInt
    case _ => default
  }

  def section(cfg: Map[String, Any], key: String): Map[String, Map[String, Any]] =
    cfg.get(key) match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].collect {
          case (k, v: Map[_, _]) => k -> v.asInstanceOf[Map[String, Any]]
          case (k, v: java.util.Map[_, _]) =>
            k -> v.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        }
      case _ => Map.empty
    }
}
