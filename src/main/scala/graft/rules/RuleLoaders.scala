package graft.rules

import graft.model.Rule

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Rule-file loading: YAML/JSON → flat `Seq[Rule]`.
  *
  * Re-expresses the reference's loader plugins + flatten pass
  * (rules/plugins/yaml_loader.py:45-73, json_loader.py,
  * _flatten.py:120-265): a file supplies `product_id`, either a
  * `dq_env` block (per-environment table_name + defaults, selected by an
  * `env` option, case-insensitive) or a top-level `table_name`, optional
  * `defaults`, and a `rules` list; each rule entry is merged over the
  * defaults, validated (required `rule`, `expectation`, valid
  * `rule_type`), and type-cast to the fixed 17-column shape.
  *
  * Loader selection is extension-based; custom formats plug in via the
  * [[RuleLoader]] trait (the Scala stand-in for the reference's pluggy
  * hook, rules/__init__.py:30-47).
  */
trait RuleLoader {
  def extensions: Set[String]
  def parse(content: String): Map[String, Any]
}

final class RuleFileException(msg: String) extends RuntimeException(msg)

object RuleLoaders {

  private def mapperToScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> mapperToScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(mapperToScala).toList
    case other => other
  }

  object YamlLoader extends RuleLoader {
    val extensions = Set("yaml", "yml")
    private val mapper = new ObjectMapper(new YAMLFactory())
    def parse(content: String): Map[String, Any] =
      mapperToScala(mapper.readValue(content, classOf[java.util.Map[String, Any]]))
        .asInstanceOf[Map[String, Any]]
  }

  object JsonLoader extends RuleLoader {
    val extensions = Set("json")
    private val mapper = new ObjectMapper()
    def parse(content: String): Map[String, Any] =
      mapperToScala(mapper.readValue(content, classOf[java.util.Map[String, Any]]))
        .asInstanceOf[Map[String, Any]]
  }

  private var loaders: Seq[RuleLoader] = Seq(YamlLoader, JsonLoader)

  /** Register a custom format loader (trait-based plugin registry). */
  def register(loader: RuleLoader): Unit = synchronized { loaders = loader +: loaders }

  val validRuleTypes: Set[String] = Set("row_dq", "agg_dq", "query_dq")

  private val columnDefaults: Map[String, Any] = Map(
    "column_name" -> "", "expectation" -> "", "action_if_failed" -> "ignore",
    "tag" -> "", "description" -> "",
    "enable_for_source_dq_validation" -> true,
    "enable_for_target_dq_validation" -> true,
    "is_active" -> true, "enable_error_drop_alert" -> false,
    "error_drop_threshold" -> 0, "query_dq_delimiter" -> "@",
    "enable_querydq_custom_output" -> false, "priority" -> "medium")

  private def asBool(v: Any, default: Boolean): Boolean = v match {
    case null => default
    case b: Boolean => b
    case b: java.lang.Boolean => b.booleanValue()
    case s: String => Set("true", "1", "yes").contains(s.toLowerCase)
    case n: Number => n.intValue() != 0
    case _ => default
  }

  private def asInt(v: Any, default: Int): Int = v match {
    case null => default
    case n: Number => n.intValue()
    case s: String => s.trim.toIntOption.getOrElse(
      throw new RuleFileException(s"expected an integer, got: $s"))
    case _ => default
  }

  private def asStr(v: Any, default: String): String = v match {
    case null => default
    case s: String => s
    case other => other.toString
  }

  /** Flatten one parsed file into rules (reference: _flatten.py:120-232). */
  def flatten(data: Map[String, Any], env: Option[String] = None): Seq[Rule] = {
    val productId = asStr(data.getOrElse("product_id", null), "")
    if (productId.isEmpty)
      throw new RuleFileException("'product_id' is required at the top level of the rules file.")

    val (tableName, userDefaults): (String, Map[String, Any]) =
      data.get("dq_env") match {
        case Some(dqEnv: Map[String, Any] @unchecked) if dqEnv.nonEmpty =>
          val e = env.getOrElse(throw new RuleFileException(
            "'dq_env' is present in the rules file but no environment was specified."))
          val envCfg = dqEnv.collectFirst {
            case (k, v: Map[String, Any] @unchecked) if k.equalsIgnoreCase(e) => v
          }.getOrElse(throw new RuleFileException(
            s"Environment '$e' not found in 'dq_env'. Available: ${dqEnv.keys.toSeq.sorted.mkString(", ")}."))
          val fileDefaults = data.get("defaults").collect {
            case m: Map[String, Any] @unchecked => m }.getOrElse(Map.empty)
          (asStr(envCfg.getOrElse("table_name", ""), ""),
            fileDefaults ++ (envCfg - "table_name"))
        case Some(_) =>
          throw new RuleFileException("'dq_env' must be a non-empty mapping.")
        case None =>
          (asStr(data.getOrElse("table_name", ""), ""),
            data.get("defaults").collect {
              case m: Map[String, Any] @unchecked => m }.getOrElse(Map.empty))
      }

    val merged = columnDefaults ++ userDefaults

    val rulesList = data.get("rules") match {
      case Some(l: Seq[Any] @unchecked) if l.nonEmpty => l
      case _ => throw new RuleFileException("'rules' must be a non-empty list of rule definitions.")
    }

    rulesList.map {
      case ruleDef: Map[String, Any] @unchecked =>
        val missing = Set("rule", "expectation") -- ruleDef.keySet
        if (missing.nonEmpty)
          throw new RuleFileException(
            s"Rule '${ruleDef.getOrElse("rule", "<unknown>")}' is missing required fields: ${missing.toSeq.sorted.mkString(", ")}.")
        val row = merged ++ ruleDef
        val ruleType = asStr(row.getOrElse("rule_type", ""), "")
        if (ruleType.isEmpty || !validRuleTypes.contains(ruleType))
          throw new RuleFileException(
            s"Invalid rule_type '$ruleType' for rule '${row.getOrElse("rule", "")}'.")
        def s(k: String) = asStr(row.getOrElse(k, null), asStr(columnDefaults.getOrElse(k, ""), ""))
        def b(k: String) = asBool(row.getOrElse(k, null), columnDefaults(k).asInstanceOf[Boolean])
        Rule(
          productId = productId,
          tableName = if (ruleDef.contains("table_name")) s("table_name") else tableName,
          ruleType = ruleType,
          rule = s("rule"),
          columnName = s("column_name"),
          expectation = s("expectation"),
          actionIfFailed = s("action_if_failed"),
          tag = s("tag"),
          description = s("description"),
          enableForSourceDqValidation = b("enable_for_source_dq_validation"),
          enableForTargetDqValidation = b("enable_for_target_dq_validation"),
          isActive = b("is_active"),
          enableErrorDropAlert = b("enable_error_drop_alert"),
          errorDropThreshold = asInt(row.getOrElse("error_drop_threshold", null), 0),
          queryDqDelimiter = s("query_dq_delimiter"),
          enableQuerydqCustomOutput = b("enable_querydq_custom_output"),
          priority = s("priority"))
      case other =>
        throw new RuleFileException(s"Each entry in 'rules' must be a mapping, got: $other")
    }
  }

  /** Load a rules file, selecting a loader by extension. */
  def load(path: String, env: Option[String] = None): Seq[Rule] = {
    val ext = path.split('.').last.toLowerCase
    val loader = loaders.find(_.extensions.contains(ext)).getOrElse(
      throw new RuleFileException(s"no rule loader registered for extension '$ext'"))
    val content = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    flatten(loader.parse(content), env)
  }

  /** Load a rules file straight into the fixed 17-column DataFrame. */
  def loadAsDataFrame(spark: org.apache.spark.sql.SparkSession, path: String,
                      env: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val rows = load(path, env).map { r =>
      org.apache.spark.sql.Row(
        r.productId, r.tableName, r.ruleType, r.rule, r.columnName,
        r.expectation, r.actionIfFailed, r.tag, r.description,
        r.enableForSourceDqValidation, r.enableForTargetDqValidation,
        r.isActive, r.enableErrorDropAlert, r.errorDropThreshold,
        r.queryDqDelimiter, r.enableQuerydqCustomOutput, r.priority)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Rule.schema)
  }
}
