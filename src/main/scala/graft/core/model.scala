package graft.core

import org.apache.spark.sql.types.DataType

/** Logical model of a project — the engine's equivalent of the reference's
  * metadata tables (reference: database/schema/3 sourceTable.sql,
  * 12 enrichmentTable.sql, 14 rawAttribute.sql, 19 sourceRelation.sql,
  * 8 outputTable.sql, 12 outputSourceTable.sql, 14 outputSourceColumnTable.sql).
  *
  * Declared in YAML (graft.parse.ProjectLoader) or programmatically.
  */

/** Declared typed column of a source
  * (reference: impc_parse_raw_attribute.sql:13-28). `schema` carries an
  * explicit Spark DataType for struct/array declarations (the reference
  * stores Spark's DataType.json verbatim — SURVEY §1.2).
  */
final case class RawAttr(name: String, dataType: DataType)

object RawAttr {
  /** Parse the `"name type"` YAML form. */
  def parse(s: String): RawAttr = {
    val t = s.trim
    val i = t.lastIndexOf(' ')
    if (i < 0) throw CompileError(s"Invalid raw attribute '$s': expected 'name type'")
    RawAttr(t.substring(0, i).trim, CoreTypes.parseTypeName(t.substring(i + 1)))
  }
}

/** Explicit relation path for a rule parameter
  * (reference: sample tpch_lineitem.yaml:36-43 `parameters:` blocks).
  */
final case class ParamSpec(sourceName: String, relations: Seq[String])

/** Rule ("enrichment"): pure single-column SQL expression over
  * `[This]`/`[OtherSource]` attributes
  * (reference: database/schema/12 enrichmentTable.sql:2-38).
  */
final case class RuleDef(
    name: String,
    expression: String,
    castDatatype: Option[String] = None,
    parameters: Seq[ParamSpec] = Nil,
    uniqueFlag: Boolean = false,
    keepCurrentFlag: Boolean = false)

/** Relation cardinality (reference: imp_decode_relation.sql:10-43).
  * `sourceOne`/`relatedOne`: whether that end of the edge is cardinality 1.
  */
sealed abstract class Cardinality(val code: String, val sourceOne: Boolean, val relatedOne: Boolean)
object Cardinality {
  case object OneOne extends Cardinality("1-1", true, true)
  case object ManyOne extends Cardinality("M-1", false, true)
  case object OneMany extends Cardinality("1-M", true, false)
  case object ManyMany extends Cardinality("M-M", false, false)
  val all: Seq[Cardinality] = Seq(OneOne, ManyOne, OneMany, ManyMany)
  def parse(s: String): Cardinality =
    all.find(_.code.equalsIgnoreCase(s.trim.replace("m", "M")))
      .getOrElse(throw CompileError(s"Invalid cardinality '$s' (expected 1-1, M-1, 1-M, M-M)"))
}

/** Named directed join-graph edge between two sources. The endpoints are
  * encoded in the name: `[source]- label -[related]`
  * (reference: imp_decode_relation.sql:10-43). Expression is a boolean
  * SQL expression over `[This]` (source side) and `[Related]`.
  */
final case class RelationDef(
    name: String,
    expression: String,
    cardinality: Cardinality,
    primaryFlag: Boolean = false) {
  val (sourceName: String, relatedName: String) = RelationDef.decodeName(name)
}

object RelationDef {
  private val NameRe = """^\s*\[([^\]]+)\]\s*-(.*)-\s*\[([^\]]+)\]\s*$""".r
  def decodeName(name: String): (String, String) = name match {
    case NameRe(a, _, b) => (a.trim, b.trim)
    case _ =>
      throw CompileError(
        s"Invalid relation name '$name': expected '[source]- label -[related_source]'")
  }
}

/** Declared output column (`"name type"` DDL-ish form). */
final case class OutputCol(name: String, dataType: DataType)

object OutputCol {
  def parse(s: String): OutputCol = {
    val a = RawAttr.parse(s)
    OutputCol(a.name, a.dataType)
  }
}

/** One column mapping of an output channel: either a plain attribute/rule
  * reference (with optional struct keys) or an allow-listed aggregate around
  * one (reference mapping regex: impc_parse_mapping.sql:19-43).
  */
final case class Mapping(
    expression: String,       // inner expression: attribute / rule name (+ .keys)
    targetColumn: String,
    aggregate: Option[String] = None, // allow-listed aggregate function name
    distinct: Boolean = false)

object Mapping {
  // "sum(net_price_int) tgt" | "sum(DISTINCT x) tgt" | "c_name tgt" | "attr.key1 tgt"
  private val AggRe = """^\s*(\w+)\s*\(\s*(?i:(DISTINCT)\s+)?(.*?)\s*\)\s+(\S+)\s*$""".r
  private val PlainRe = """^\s*(\S+)\s+(\S+)\s*$""".r
  def parse(s: String): Mapping = s match {
    case AggRe(fn, distinct, inner, tgt) =>
      Mapping(inner, tgt, Some(fn.toLowerCase), distinct != null)
    case PlainRe(e, tgt) => Mapping(e, tgt)
    case _ => throw CompileError(s"Invalid mapping '$s': expected '<expression> <target_column>'")
  }
}

/** Channel operation type (reference: 12 outputSourceTable.sql). */
sealed trait OperationType
object OperationType {
  case object None extends OperationType
  case object Aggregate extends OperationType
  def parse(s: Option[String]): OperationType = s.map(_.trim.toLowerCase) match {
    case scala.None | Some("") | Some("none") => None
    case Some("aggregate")                    => Aggregate
    case Some(other) => throw CompileError(s"Invalid operation_type '$other' (expected Aggregate or None)")
  }
}

/** Source -> output mapping with optional filter; multiple channels of one
  * output are UNION ALL'd (reference: u_output_generate_query.sql:88,148).
  */
final case class Channel(
    sourceName: String,
    mappings: Seq[Mapping],
    filter: Option[String] = None,
    operationType: OperationType = OperationType.None)

/** Output target kind (reference: u_validate_output.sql:20-60).
  * `table` → catalog table via saveAsTable (the reference's DROP/CREATE
  * contract), `file` → path-based parquet/avro/text, `virtual` → temp view.
  */
sealed trait OutputType
object OutputType {
  case object Table extends OutputType
  final case class File(format: String) extends OutputType // parquet | avro | text
  case object Virtual extends OutputType // temp view

  val fileFormats: Set[String] = Set("parquet", "avro", "text")

  def parse(s: Option[String], subType: Option[String] = None): OutputType =
    s.map(_.trim.toLowerCase) match {
      case scala.None | Some("") | Some("table") => Table
      case Some("file") =>
        val fmt = subType.map(_.trim.toLowerCase).filter(_.nonEmpty).getOrElse("parquet")
        if (!fileFormats.contains(fmt))
          throw CompileError(s"Invalid output_sub_type '$fmt' (expected parquet, avro or text)")
        File(fmt)
      case Some("virtual") => Virtual
      case Some(other)     => throw CompileError(s"Invalid output_type '$other'")
    }
}

final case class OutputDef(
    name: String,
    columns: Seq[OutputCol],
    channels: Seq[Channel],
    outputType: OutputType = OutputType.Table,
    targetTable: Option[String] = None) {
  def target: String = targetTable.getOrElse(name)
}

/** A logical table definition: physical input + declared attributes + rules
  * (reference: database/schema/3 sourceTable.sql:1-44). `sourceTable` is
  * resolved by the runner: a catalog table name or a parquet path.
  */
final case class SourceDef(
    name: String,
    sourceTable: String,
    rawAttributes: Seq[RawAttr],
    rules: Seq[RuleDef] = Nil,
    targetTable: Option[String] = None,
    /** Partition columns for the materialized hub (graft extension; the
      * reference has no partitioning concept). At scale, partitioned hubs
      * give downstream reads partition pruning and bounded task inputs.
      */
    hubPartitionBy: Seq[String] = Nil,
    /** Bucket spec for table-materialized hubs (graft extension). Bucketing
      * both sides of a repeated fact-fact join on its key removes the
      * shuffle entirely — the scan arrives hash-partitioned. Requires
      * catalog materialization (`Runner(materializeTables = true)`);
      * path-mode parquet cannot carry bucket metadata.
      */
    hubBucketBy: Seq[String] = Nil,
    hubBuckets: Int = 0) {
  def hubName: String = targetTable.getOrElse(s"enriched_$name")
}

/** A whole project: the unit of compilation. */
final case class Project(
    sources: Seq[SourceDef],
    relations: Seq[RelationDef] = Nil,
    outputs: Seq[OutputDef] = Nil) {

  val sourceByName: Map[String, SourceDef] = {
    val dup = sources.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    if (dup.nonEmpty) throw CompileError(s"Duplicate source name(s): ${dup.mkString(", ")}")
    sources.map(s => s.name -> s).toMap
  }
  val relationByName: Map[String, RelationDef] = {
    val dup = relations.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    if (dup.nonEmpty) throw CompileError(s"Duplicate relation name(s): ${dup.mkString(", ")}")
    relations.map(r => r.name -> r).toMap
  }

  def source(name: String): SourceDef =
    sourceByName.getOrElse(name, throw CompileError(s"Unknown source '$name'"))

  /** Relations must reference existing sources. */
  def validate(): Unit = {
    relations.foreach { r =>
      source(r.sourceName); source(r.relatedName)
    }
    outputs.foreach { o =>
      if (o.columns.isEmpty) throw CompileError(s"Output '${o.name}' has no columns")
      if (o.channels.isEmpty) throw CompileError(s"Output '${o.name}' has no channels")
      // output-type validations (reference: u_validate_output.sql:38-53)
      if (o.outputType == OutputType.File("text") && o.columns.size > 1)
        throw CompileError(
          "Text outputs can only have a single output column! Please remove " +
            "excess columns or choose another output file type.")
      val nameRe = "^[a-zA-Z_]+[a-zA-Z0-9_]*$".r
      val needsCleanNames = o.outputType match {
        case OutputType.Table => true
        case OutputType.File("parquet") | OutputType.File("avro") => true
        case _ => false
      }
      if (needsCleanNames) {
        val bad = o.columns.map(_.name).filter(n => nameRe.findFirstIn(n).isEmpty)
        if (bad.nonEmpty) {
          if (o.outputType == OutputType.Table)
            throw CompileError(
              "Output table type, column name must start with a letter and may " +
                "contain letters, numbers, _ or spaces. column names: " + bad.mkString(","))
          else
            throw CompileError(
              "Output types parquet, avro and delta lake cannot have spaces or " +
                "special symbols in the column names: " + bad.mkString(","))
        }
      }
      o.channels.foreach { c =>
        source(c.sourceName)
        val colNames = o.columns.map(_.name).toSet
        c.mappings.foreach { m =>
          if (!colNames.contains(m.targetColumn))
            throw CompileError(
              s"Output '${o.name}': mapping targets unknown column '${m.targetColumn}'")
        }
        val dup = c.mappings.groupBy(_.targetColumn).collect { case (n, ms) if ms.size > 1 => n }
        if (dup.nonEmpty)
          throw CompileError(s"Output '${o.name}': duplicate mapping(s) for ${dup.mkString(", ")}")
      }
    }
  }
}
