package graft.exec

import graft.core.{OutputType, Project}
import org.apache.spark.sql.SparkSession

/** C13 — versioned import reconciliation over a materialized workspace.
  *
  * The reference's import (`impc_execute.sql:10-219`) upserts every
  * project object BY NAME into its Postgres metadata store, validates the
  * imported expressions mid-import, and finally CASCADE-DELETES every
  * object the new import no longer contains
  * (`impc_execute.sql:163-186` → `u_delete_cascade.sql`: source → its
  * enrichments/relations/output-sources/raw attributes; output → its
  * columns and channels).
  *
  * graft's mapping of that surface:
  *  - the UPSERT half is subsumed by recompilation — there is no mutable
  *    metadata store; every import recompiles the full project from YAML
  *    (definitions cannot drift, and object identity is by name exactly
  *    like the reference's `source_name`/`output_name` matching);
  *  - the reference's in-import validations are `Compiler.compileChecked`
  *    (expression/type errors abort the import BEFORE anything is
  *    deleted, mirroring `impc_execute`'s early RETURNs);
  *  - what endures between imports — and therefore what reconciliation
  *    must cascade-delete — is the PHYSICAL workspace: materialized hub
  *    parquet dirs, hub catalog tables, and output targets written by
  *    `Runner.run`. A source or output removed (or renamed) in the new
  *    project leaves orphaned artifacts that a re-run would never
  *    overwrite; this pass removes exactly those.
  *  - the reference's `meta.import` rows (one per import, with a log) are
  *    the versioned import log: an append-only TSV in the workspace, one
  *    version block per import, recording every object name and its
  *    physical target at that version.
  */
object ImportReconciler {

  final case class ImportRecord(
      version: Int, timestamp: String,
      sources: Map[String, String],          // source name -> hub name
      outputs: Map[String, (String, String)] // output name -> (target, type tag)
  )

  final case class ImportReport(
      version: Int,
      deletedSources: Seq[String], deletedOutputs: Seq[String])

  private def logPath(outDir: String) =
    java.nio.file.Paths.get(outDir, "import_log.tsv")

  private def typeTag(t: OutputType): String = t match {
    case OutputType.Table        => "table"
    case OutputType.File(format) => s"file:$format"
    case OutputType.Virtual      => "virtual"
  }

  /** Parse the append-only TSV import log (empty if none exists). */
  def loadLog(outDir: String): Seq[ImportRecord] = {
    val p = logPath(outDir)
    if (!java.nio.file.Files.exists(p)) return Nil
    val lines = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(p)).asScala
    val records = scala.collection.mutable.ListBuffer.empty[ImportRecord]
    lines.foreach { line =>
      line.split("\t", -1).toList match {
        case "version" :: v :: ts :: Nil =>
          records += ImportRecord(v.toInt, ts, Map.empty, Map.empty)
        case "source" :: name :: hub :: Nil =>
          val last = records.last
          records(records.length - 1) =
            last.copy(sources = last.sources + (name -> hub))
        case "output" :: name :: target :: tag :: Nil =>
          val last = records.last
          records(records.length - 1) =
            last.copy(outputs = last.outputs + (name -> (target, tag)))
        case Nil | List("") => ()
        case other => sys.error(s"corrupt import log line: $line")
      }
    }
    records.toList
  }

  private def append(outDir: String, rec: ImportRecord): Unit = {
    val sb = new StringBuilder
    sb.append(s"version\t${rec.version}\t${rec.timestamp}\n")
    rec.sources.toSeq.sortBy(_._1).foreach { case (n, h) =>
      sb.append(s"source\t$n\t$h\n")
    }
    rec.outputs.toSeq.sortBy(_._1).foreach { case (n, (t, tag)) =>
      sb.append(s"output\t$n\t$t\t$tag\n")
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(logPath(outDir), sb.toString(),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  private def deleteDir(path: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.walk(path)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))

  /** Reconcile the workspace at `outDir` against `project`: cascade-delete
    * the physical artifacts of every source/output present in the LAST
    * import but absent (by name) from this one, then append this import's
    * manifest as the next log version. Run AFTER validation and BEFORE
    * `Runner.run` (the reference deletes inside the same import
    * transaction, after its upserts validate).
    */
  def reconcile(
      spark: SparkSession, project: Project, outDir: String,
      timestamp: String = java.time.Instant.now().toString): ImportReport = {
    val log = loadLog(outDir)
    val prev = log.lastOption
    val curSources = project.sources.map(s => s.name -> s.hubName).toMap
    val curOutputs = project.outputs
      .map(o => o.name -> (o.target, typeTag(o.outputType))).toMap

    val staleSources = prev.map(_.sources).getOrElse(Map.empty)
      .filterNot { case (name, _) => curSources.contains(name) }
    val staleOutputs = prev.map(_.outputs).getOrElse(Map.empty)
      .filterNot { case (name, _) => curOutputs.contains(name) }

    staleSources.foreach { case (_, hubName) =>
      // hub parquet dir (materializeDir mode) and/or hub catalog table
      // (materializeTables mode) — u_delete_cascade's 'source' branch
      deleteDir(java.nio.file.Paths.get(outDir, hubName))
      spark.sql(s"DROP TABLE IF EXISTS ${quoted(spark, hubName)}")
    }
    staleOutputs.foreach { case (_, (target, tag)) =>
      // u_delete_cascade's 'output' branch, per sink type
      tag match {
        case "table"   => spark.sql(s"DROP TABLE IF EXISTS ${quoted(spark, target)}")
        case "virtual" => spark.catalog.dropTempView(target)
        case _         => deleteDir(java.nio.file.Paths.get(outDir, target))
      }
    }

    val version = prev.map(_.version + 1).getOrElse(1)
    append(outDir, ImportRecord(version, timestamp, curSources, curOutputs))
    ImportReport(version,
      staleSources.keys.toSeq.sorted, staleOutputs.keys.toSeq.sorted)
  }

  private def quoted(spark: SparkSession, name: String): String =
    spark.sessionState.sqlParser.parseTableIdentifier(name).quotedString
}
