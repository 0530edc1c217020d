package graft.etl

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Typed configuration tree mirroring the reference's OmegaConf YAML
  * (`/root/reference/config/config.yaml:8-103`). Loaded + merged by
  * [[ConfigLoader]]: base config < env overlay < CLI dotlist, the same
  * precedence as the reference (`/root/reference/main.py:42-77`).
  */
final case class EtlConfig(
    environment: String,
    paths: PathsConfig,
    filters: FiltersConfig,
    spark: SparkConfig,
    businessRules: BusinessRules,
    dataQuality: DataQualityConfig,
    columnMapping: Seq[(String, String)],
    countryNames: Map[String, String])

/** `outputFormat` is an engine extension (csv = reference parity;
  * parquet = the at-scale sink); absent from the reference config.
  */
final case class PathsConfig(
    inputFile: String,
    outputBase: String,
    outputFormat: String = "csv")

final case class FiltersConfig(startDate: String, endDate: String, country: Option[String]) {
  /** Driver-side date validation (reference `main.py:125-148`): plain
    * 8-char + lexicographic check — YYYYMMDD strings sort chronologically.
    */
  def validate(): Either[String, Unit] =
    if (startDate.length != 8 || !startDate.forall(_.isDigit))
      Left(s"start_date must be YYYYMMDD: $startDate")
    else if (endDate.length != 8 || !endDate.forall(_.isDigit))
      Left(s"end_date must be YYYYMMDD: $endDate")
    else if (startDate > endDate)
      Left(s"start_date $startDate > end_date $endDate")
    else Right(())
}

final case class SparkConfig(
    appName: String,
    master: String,
    logLevel: String,
    configs: Map[String, String])

final case class BusinessRules(
    unitsConversion: Map[String, Double],
    routineTypes: Seq[String],
    bonusTypes: Seq[String]) {
  def validTypes: Seq[String] = routineTypes ++ bonusTypes
}

final case class DataQualityConfig(
    removeNullMaterial: Boolean,
    removeZeroPrice: Boolean,
    removeDuplicates: Boolean,
    validateCountryCodes: Boolean,
    validCountries: Seq[String])

/** YAML loader with OmegaConf-style recursive merge and dotlist overrides,
  * over the snakeyaml that ships in /opt/spark/jars. ~All business rules
  * live in config, so this is the root of the pipeline's parametrization.
  */
object ConfigLoader {

  type Node = Any // String | Int | Boolean | java.util.Map | java.util.List | null

  def loadYaml(path: String): Map[String, Node] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    toScala(yaml.load[java.util.Map[String, Any]](text)) match {
      case m: Map[String @unchecked, Node @unchecked] => m
      case _ => Map.empty
    }
  }

  private def toScala(v: Any): Node = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other => other
  }

  /** Recursive map merge: values in `over` win; nested maps merge key-wise
    * (OmegaConf `merge` semantics, reference `main.py:63-67`).
    */
  def merge(base: Map[String, Node], over: Map[String, Node]): Map[String, Node] =
    (base.keySet ++ over.keySet).map { k =>
      val merged = (base.get(k), over.get(k)) match {
        case (Some(b: Map[String @unchecked, Node @unchecked]),
              Some(o: Map[String @unchecked, Node @unchecked])) => merge(b, o)
        case (_, Some(o)) => o
        case (Some(b), None) => b
        case _ => null
      }
      k -> merged
    }.toMap

  /** Apply one `a.b.c=value` dotlist override (reference `main.py:72-75`).
    * Values parse as bool/int/double/null when they look like one.
    */
  def applyDotted(cfg: Map[String, Node], dotted: String): Map[String, Node] = {
    val Array(path, raw) = dotted.split("=", 2)
    def set(m: Map[String, Node], keys: List[String]): Map[String, Node] = keys match {
      case key :: Nil => m.updated(key, parseScalar(raw))
      case key :: rest =>
        val child = m.get(key) match {
          case Some(c: Map[String @unchecked, Node @unchecked]) => c
          case _ => Map.empty[String, Node]
        }
        m.updated(key, set(child, rest))
      case Nil => m
    }
    set(cfg, path.split('.').toList)
  }

  def parseScalar(raw: String): Node = raw match {
    case "null" | "~" | "" => null
    case "true" => java.lang.Boolean.TRUE
    case "false" => java.lang.Boolean.FALSE
    case s if s.matches("-?\\d+") => Integer.valueOf(s)
    case s if s.matches("-?\\d*\\.\\d+") => java.lang.Double.valueOf(s)
    case s => s
  }

  /** Load base + optional env overlay + dotlist overrides, bind to the
    * typed tree. `configDir` holds `config.yaml` and `config_<env>.yaml`.
    */
  def load(configDir: String, env: Option[String] = None, overrides: Seq[String] = Nil): EtlConfig = {
    val base = loadYaml(s"$configDir/config.yaml")
    val envName = overrides.collectFirst {
      case o if o.startsWith("environment=") => o.drop("environment=".length)
    }.orElse(env).orElse(Option(str(base, "environment"))).getOrElse("develop")
    val envPath = Paths.get(s"$configDir/config_$envName.yaml")
    val withEnv =
      if (Files.exists(envPath)) merge(base, loadYaml(envPath.toString)) else base
    bind(overrides.foldLeft(withEnv)(applyDotted))
  }

  // -------- binding helpers (hand-rolled; no reflection) --------

  private def at(cfg: Map[String, Node], path: String*): Node =
    path.foldLeft(cfg: Node) {
      case (m: Map[String @unchecked, Node @unchecked], k) => m.getOrElse(k, null)
      case _ => null
    }

  private def str(cfg: Map[String, Node], path: String*): String =
    Option(at(cfg, path: _*)).map(_.toString).orNull

  private def bool(cfg: Map[String, Node], default: Boolean, path: String*): Boolean =
    at(cfg, path: _*) match {
      case b: java.lang.Boolean => b
      case s: String => s.toBoolean
      case _ => default
    }

  private def strSeq(cfg: Map[String, Node], path: String*): Seq[String] =
    at(cfg, path: _*) match {
      case l: List[_] => l.map(_.toString)
      case _ => Nil
    }

  private def strMap(cfg: Map[String, Node], path: String*): Map[String, String] =
    at(cfg, path: _*) match {
      case m: Map[String @unchecked, _] => m.map { case (k, v) => k -> String.valueOf(v) }
      case _ => Map.empty
    }

  def bind(cfg: Map[String, Node]): EtlConfig = EtlConfig(
    environment = Option(str(cfg, "environment")).getOrElse("develop"),
    paths = PathsConfig(
      inputFile = str(cfg, "paths", "input_file"),
      outputBase = str(cfg, "paths", "output_base"),
      outputFormat = Option(str(cfg, "paths", "output_format")).getOrElse("csv")),
    filters = FiltersConfig(
      startDate = str(cfg, "filters", "start_date"),
      endDate = str(cfg, "filters", "end_date"),
      country = Option(str(cfg, "filters", "country"))),
    spark = SparkConfig(
      appName = Option(str(cfg, "spark", "app_name")).getOrElse("graft_etl"),
      master = Option(str(cfg, "spark", "master")).getOrElse("local[*]"),
      logLevel = Option(str(cfg, "spark", "log_level")).getOrElse("WARN"),
      configs = strMap(cfg, "spark", "configs")),
    businessRules = BusinessRules(
      unitsConversion = strMap(cfg, "business_rules", "units_conversion")
        .map { case (k, v) => k -> v.toDouble },
      routineTypes = strSeq(cfg, "business_rules", "delivery_types", "routine"),
      bonusTypes = strSeq(cfg, "business_rules", "delivery_types", "bonus")),
    dataQuality = DataQualityConfig(
      removeNullMaterial = bool(cfg, default = true, "data_quality", "remove_null_material"),
      removeZeroPrice = bool(cfg, default = false, "data_quality", "remove_zero_price"),
      removeDuplicates = bool(cfg, default = true, "data_quality", "remove_duplicates"),
      validateCountryCodes = bool(cfg, default = true, "data_quality", "validate_country_codes"),
      validCountries = strSeq(cfg, "data_quality", "valid_countries")),
    columnMapping = at(cfg, "output_schema", "column_mapping") match {
      case m: Map[String @unchecked, _] => m.toSeq.map { case (k, v) => k -> String.valueOf(v) }
      case _ => Nil
    },
    countryNames = strMap(cfg, "country_names"))
}
