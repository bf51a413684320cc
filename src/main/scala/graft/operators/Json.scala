package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** JSON column handling — semi-structured payloads (event properties, API
  * blobs) are a standard ingredient of training-data pipelines.
  *
  * Both forms are codegen'd builtins (no UDFs). Prefer [[parsed]] when many
  * fields are read (one parse per row); [[extracted]] is fine for 1–2
  * fields. Schema-on-read keeps the scan schema narrow either way.
  */
object Json {

  /** Extract scalar fields with JSONPath (`get_json_object`) and cast.
    * fields: output column -> (path, DDL type).
    */
  def extracted(df: DataFrame, jsonCol: String, fields: Map[String, (String, String)]): DataFrame =
    df.select(col("*") +: fields.toSeq.map { case (out, (path, ddl)) =>
      get_json_object(col(jsonCol), path).cast(ddl).as(out)
    }: _*)

  /** Parse the whole column once with an explicit schema (`from_json`). */
  def parsed(df: DataFrame, jsonCol: String, schema: DataType, out: String = "parsed"): DataFrame =
    df.withColumn(out, from_json(col(jsonCol), schema))

  /** Auto-flatten a JSON column into typed top-level columns. The schema is
    * inferred by Spark's JSON reader over a driver-side SAMPLE of the
    * payloads (a few rows — tiny and intentional), then applied with
    * `from_json` across the full data. This is the OSS-Spark answer to
    * Databricks' `schema_of_json_agg` (which graft rejects at compile time):
    * infer once from a bounded sample, parse everywhere with codegen.
    * Fields missing from a row read as NULL; fields absent from the sample
    * are dropped — widen `sampleRows` for sparser payloads.
    *
    * The sample is DETERMINISTIC: the `sampleRows` payloads with the
    * smallest `xxhash64(payload)` (content-derived order, so the inferred
    * schema is identical across runs, partitionings, and shuffled inputs —
    * a bare `limit` takes an arbitrary subset and can compile a
    * heterogeneous corpus to different schemas run-to-run). Hash order also
    * spreads the sample across payload shapes instead of favoring any
    * storage order. Plan cost: one TakeOrderedAndProject over the scan —
    * no full sort, no shuffle.
    */
  def flatten(
      df: DataFrame, jsonCol: String, sampleRows: Int = 100,
      prefix: String = ""): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(jsonCol)).filter(col(jsonCol).isNotNull)
      .orderBy(xxhash64(col(jsonCol)), col(jsonCol))
      .limit(sampleRows).as[String]
    val inferred = spark.read.json(sample).schema
    val parsedCol = from_json(col(jsonCol), inferred)
    val fields = inferred.fields.map(f =>
      parsedCol.getField(f.name).as(prefix + f.name))
    df.select(col("*") +: fields.toIndexedSeq: _*)
  }
}

/** Skew mitigation utilities. AQE's skew-join handling covers most join
  * skew at runtime; these cover the cases it doesn't: heavily-skewed
  * aggregations and deliberate pre-salting of known-hot keys.
  */
object Skew {

  /** Two-phase (salted) aggregation for skewed group keys: phase 1 groups
    * on (key, salt) spreading hot keys over `saltFactor` reducers, phase 2
    * merges the partials. Only algebraic aggregates decompose this way —
    * the caller supplies both phases (e.g. count→sum, sum→sum, min→min).
    */
  def twoPhaseAgg(
      df: DataFrame, keys: Seq[String], saltFactor: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    // content-derived salt: the phase-1 shuffle key must be DETERMINISTIC
    // under task retry/speculation — a partition-id/row-position salt can
    // assign the same row to different salts across shuffle attempts and
    // double-count it (same failure class as a nondeterministic join tag)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(c => col(c)): _*), lit(saltFactor)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted left join against a skewed build side: the right side is
    * replicated `saltFactor` times (explode), the left side picks a
    * deterministic salt from a high-entropy hash of its row — hot join
    * keys spread across `saltFactor` tasks. Use when a handful of known
    * keys dwarf the rest and AQE's split threshold is too coarse.
    */
  def saltedLeftJoin(
      left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      saltFactor: Int): DataFrame = {
    // deterministic high-entropy salt from full row content (see
    // twoPhaseAgg — position-based salts break under recomputation)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(c => col(c)): _*), lit(saltFactor)))
    val saltedRight = right.withColumn("__salt",
      explode(expr(s"sequence(0L, ${saltFactor - 1}L)")))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"),
        "left")
      .drop("__salt")
  }
}
