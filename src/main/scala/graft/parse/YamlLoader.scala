package graft.parse

import graft.core._
import org.apache.spark.sql.types.DataType
import org.yaml.snakeyaml.Yaml
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** YAML project reader
  * (reference: cli/dataforge/importProject.py:42-79 — meta.yaml format gate,
  * the sources and outputs directories, relations.yaml;
  * svc_import_load_object.sql:12-43 classification by path).
  *
  * The YAML vocabulary matches the reference's `core1.0` format exactly:
  * `source_name/source_table/target_table/raw_attributes/rules` for sources,
  * `name/expression/cast_datatype/parameters/unique_flag/keep_current_flag`
  * for rules, `output_name/columns/channels` for outputs, and
  * `name/expression/cardinality` for relations.
  */
object YamlLoader {

  val SupportedFormat = "core1.0"

  def load(projectDir: String): Project = {
    val dir = Paths.get(projectDir)
    if (!Files.isDirectory(dir))
      throw CompileError(s"Project directory '$projectDir' does not exist")

    val meta = parseFile(dir.resolve("meta.yaml"))
    val format = str(asMap(meta, "meta.yaml"), "format")
      .getOrElse(throw CompileError("meta.yaml: missing 'format'"))
    if (format != SupportedFormat)
      throw CompileError(
        s"Unsupported project format '$format' (expected $SupportedFormat)")

    val sources = listYaml(dir.resolve("sources")).map(parseSource)
    val relFile = dir.resolve("relations.yaml")
    val relations =
      if (Files.exists(relFile)) parseRelations(relFile) else Nil
    val outputs = listYaml(dir.resolve("outputs")).map(parseOutput)
    Project(sources, relations, outputs)
  }

  // ---------------------------------------------------------------- pieces

  private def listYaml(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Nil
    else Files.list(dir).iterator.asScala.toSeq
      .filter(p => p.toString.endsWith(".yaml") || p.toString.endsWith(".yml"))
      .sortBy(_.getFileName.toString)

  private def parseFile(p: Path): Any = {
    if (!Files.exists(p)) throw CompileError(s"Missing file: $p")
    new Yaml().load[Any](Files.readString(p))
  }

  def parseSource(p: Path): SourceDef = {
    val m = asMap(parseFile(p), p.toString)
    val name = str(m, "source_name")
      .getOrElse(throw CompileError(s"$p: missing source_name"))
    val table = str(m, "source_table")
      .getOrElse(throw CompileError(s"$p: missing source_table"))
    val raw = seq(m, "raw_attributes").map(parseRawAttr(_, p))
    val rules = seq(m, "rules").map(parseRule(_, p))
    SourceDef(name, table, raw, rules, str(m, "target_table"),
      hubPartitionBy = seq(m, "hub_partition_by").map(_.toString),
      hubBucketBy = seq(m, "hub_bucket_by").map(_.toString),
      hubBuckets = str(m, "hub_buckets").map(_.toInt).getOrElse(0))
  }

  /** `"name type"` strings, or `{name:, schema:}` objects where schema is
    * Spark `DataType` JSON (reference: impc_parse_raw_attribute.sql:13-28;
    * datatype_schema is Spark's DataType.json — SURVEY §1.2).
    */
  private def parseRawAttr(v: Any, p: Path): RawAttr = v match {
    case s: String => RawAttr.parse(s)
    case m: java.util.Map[_, _] =>
      val mm = m.asInstanceOf[java.util.Map[String, Any]].asScala
      val name = mm.getOrElse("name",
        throw CompileError(s"$p: raw attribute object missing 'name'")).toString
      mm.get("schema") match {
        case Some(schema) =>
          val dt = DataType.fromJson(toJson(schema))
          RawAttr(name, CoreTypes.normalize(dt))
        case None =>
          mm.get("type") match {
            case Some(t) => RawAttr(name, CoreTypes.parseTypeName(t.toString))
            case None => throw CompileError(s"$p: raw attribute '$name' missing schema/type")
          }
      }
    case other => throw CompileError(s"$p: invalid raw attribute: $other")
  }

  private def parseRule(v: Any, p: Path): RuleDef = {
    val m = asMap(v, s"$p rule")
    val name = str(m, "name").getOrElse(throw CompileError(s"$p: rule missing name"))
    val expression = str(m, "expression")
      .getOrElse(throw CompileError(s"$p: rule '$name' missing expression"))
    val params = seq(m, "parameters").map { pv =>
      val pm = asMap(pv, s"$p rule '$name' parameter")
      ParamSpec(
        str(pm, "source_name")
          .getOrElse(throw CompileError(s"$p: rule '$name' parameter missing source_name")),
        seq(pm, "relations").map(_.toString))
    }
    RuleDef(name, expression,
      castDatatype = str(m, "cast_datatype"),
      parameters = params,
      uniqueFlag = bool(m, "unique_flag"),
      keepCurrentFlag = bool(m, "keep_current_flag"))
  }

  def parseRelations(p: Path): Seq[RelationDef] =
    parseFile(p) match {
      case l: java.util.List[_] =>
        l.asScala.toSeq.map { v =>
          val m = asMap(v, s"$p relation")
          RelationDef(
            str(m, "name").getOrElse(throw CompileError(s"$p: relation missing name")),
            str(m, "expression").getOrElse(throw CompileError(s"$p: relation missing expression")),
            Cardinality.parse(str(m, "cardinality")
              .getOrElse(throw CompileError(s"$p: relation missing cardinality"))),
            primaryFlag = bool(m, "primary"))
        }
      case _ => throw CompileError(s"$p: expected a list of relations")
    }

  def parseOutput(p: Path): OutputDef = {
    val m = asMap(parseFile(p), p.toString)
    val name = str(m, "output_name")
      .getOrElse(throw CompileError(s"$p: missing output_name"))
    val columns = seq(m, "columns").map(v => OutputCol.parse(v.toString))
    val channels = seq(m, "channels").map { cv =>
      val cm = asMap(cv, s"$p channel")
      Channel(
        sourceName = str(cm, "source_name")
          .getOrElse(throw CompileError(s"$p: channel missing source_name")),
        mappings = seq(cm, "mappings").map(v => Mapping.parse(v.toString)),
        filter = str(cm, "filter"),
        operationType = OperationType.parse(str(cm, "operation_type")))
    }
    OutputDef(name, columns, channels,
      outputType = OutputType.parse(str(m, "output_type"), str(m, "output_sub_type")),
      targetTable = str(m, "target_table"))
  }

  // ---------------------------------------------------------------- helpers

  private def asMap(v: Any, where: String): collection.Map[String, Any] = v match {
    case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]].asScala
    case other => throw CompileError(s"$where: expected a YAML mapping, got: $other")
  }

  private def str(m: collection.Map[String, Any], k: String): Option[String] =
    m.get(k).flatMap(v => Option(v)).map(_.toString)

  private def bool(m: collection.Map[String, Any], k: String): Boolean =
    m.get(k).exists {
      case b: java.lang.Boolean => b
      case s: String => s.equalsIgnoreCase("true")
      case _ => false
    }

  private def seq(m: collection.Map[String, Any], k: String): Seq[Any] =
    m.get(k) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.asInstanceOf[Seq[Any]]
      case Some(null) | None => Nil
      case Some(other) => throw CompileError(s"Expected a YAML list for '$k', got: $other")
    }

  /** Re-serialize a snakeyaml structure as JSON for DataType.fromJson. */
  private def toJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: java.lang.Boolean => b.toString
    case n: java.lang.Number => n.toString
    case l: java.util.List[_] => l.asScala.map(toJson).mkString("[", ",", "]")
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => toJson(k.toString) + ":" + toJson(vv) }
        .mkString("{", ",", "}")
    case other => toJson(other.toString)
  }
}
