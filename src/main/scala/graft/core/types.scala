package graft.core

import org.apache.spark.sql.types._

/** Canonical type system of the engine.
  *
  * Mirrors the reference's `meta.attribute_type` catalog
  * (reference: database/schema/1 createAttributeTypeTable.sql:9-20): eleven
  * canonical types; every decimal is normalized to decimal(38,12)
  * (reference: database/code/meta/u-utility/u_get_schema_from_type.sql:13-27);
  * byte/short/integer all normalize to `int`
  * (reference: database/code/meta/u-utility/u_get_typename_from_schema.sql:17-21).
  * The schema language is Spark's own `DataType` JSON, so nothing is lost in
  * translation — we use Spark types directly and keep the canonical-name
  * mapping for declarations and errors.
  */
object CoreTypes {

  /** Normalized decimal used everywhere (reference decimal discipline). */
  val Decimal3812: DecimalType = DecimalType(38, 12)

  /** Canonical name -> Spark type for declared raw attributes / output
    * columns. `struct` and `array` require an explicit `schema` (Spark
    * DataType JSON) in the declaration; bare names here are scalars only.
    */
  def parseTypeName(name: String): DataType = {
    val n = name.trim.toLowerCase
    n match {
      case "string"                      => StringType
      case "decimal"                     => Decimal3812
      case d if d.startsWith("decimal(") => Decimal3812 // normalize any (p,s)
      case "timestamp"                   => TimestampType
      case "boolean"                     => BooleanType
      case "int" | "integer"             => IntegerType
      case "long" | "bigint"             => LongType
      case "float"                       => FloatType
      case "double"                      => DoubleType
      case "date"                        => DateType
      case other =>
        throw CompileError(s"Invalid data type '$other'")
    }
  }

  /** Spark type -> canonical name (`meta.attribute_type.hive_type`). */
  def typeName(dt: DataType): String = dt match {
    case StringType                          => "string"
    case _: DecimalType                      => "decimal"
    case TimestampType                       => "timestamp"
    case BooleanType                         => "boolean"
    case ByteType | ShortType | IntegerType  => "int"
    case LongType                            => "long"
    case FloatType                           => "float"
    case DoubleType                          => "double"
    case _: StructType                       => "struct"
    case _: ArrayType                        => "array"
    case DateType                            => "date"
    case other =>
      throw CompileError(s"Unsupported Spark type '${other.simpleString}'")
  }

  /** Is `dt` one of the canonical types (i.e. declarable)? */
  def isSupported(dt: DataType): Boolean =
    try { typeName(dt); true } catch { case _: CompileError => false }

  /** Normalization applied to every inferred/declared type: any decimal ->
    * decimal(38,12); byte/short -> int. Complex types normalized recursively.
    */
  def normalize(dt: DataType): DataType = dt match {
    case _: DecimalType      => Decimal3812
    case ByteType | ShortType => IntegerType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = normalize(f.dataType))))
    case a: ArrayType => a.copy(elementType = normalize(a.elementType))
    case other        => other
  }

  /** DDL string for casts (`CAST(x AS <ddl>)`). */
  def ddl(dt: DataType): String = dt.sql
}

/** Compile-time error — the engine's analog of the reference's
  * `meta.u_assert` / import failures.
  */
final case class CompileError(message: String) extends RuntimeException(message)
