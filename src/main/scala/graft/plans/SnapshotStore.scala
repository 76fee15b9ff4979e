package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned corpus snapshots with ATOMIC publish — the operational
  * contract a multi-team 100 TB corpus needs: a cleaning run publishes
  * version N while training jobs keep reading version N−1, and a reader
  * can NEVER observe a half-written version.
  *
  * The mechanism is the classic manifest commit (the core idea of the
  * lakehouse table formats, reduced to what a corpus store needs): data
  * files land under `<root>/v=<n>/` first, and the version only EXISTS
  * once its manifest — a single small JSON written via temp-file +
  * atomic rename — appears under `<root>/_manifests/`. Readers list
  * manifests, never directories: a crashed writer leaves orphan data
  * files but no manifest, so its partial version is invisible (and a
  * re-publish of the same version overwrites cleanly). The manifest
  * records row count and schema so readers can sanity-check a version
  * without scanning it.
  *
  * Scale notes: the manifest is O(1) metadata — the data write is a
  * normal partitioned parquet write with all of Spark's parallelism;
  * `read` goes straight to the version directory (no listing of other
  * versions); `diff` of two versions is the id-keyed full-outer-join
  * accounting of `LlmData.corpusDiff`, cost O(|vA| + |vB|) on the
  * uniform id key.
  */
object SnapshotStore {

  final case class Manifest(version: Long, rows: Long, schemaJson: String)

  private def dataPath(root: String, v: Long) = s"$root/v=$v"
  private def manifestDir(root: String) =
    java.nio.file.Paths.get(root, "_manifests")
  private def manifestPath(root: String, v: Long) =
    manifestDir(root).resolve(s"v$v.json")

  /** Publish `df` as version `v`: data first, manifest last (temp +
    * ATOMIC_MOVE), so the version becomes visible all-at-once. Returns
    * the manifest. Re-publishing an existing version replaces it. */
  def publish(df: DataFrame, root: String, v: Long): Manifest = {
    require(v >= 0, s"version must be >= 0, got $v")
    df.write.mode(SaveMode.Overwrite).parquet(dataPath(root, v))
    // row count from the WRITTEN files, not the input plan — the manifest
    // must describe what a reader will actually see
    val written = df.sparkSession.read.parquet(dataPath(root, v))
    val m = Manifest(v, written.count(), written.schema.json)
    val dir = manifestDir(root)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, s".v$v", ".tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"version":$v,"rows":${m.rows},"schema":${ujsonEscape(m.schemaJson)}}""")
    java.nio.file.Files.move(tmp, manifestPath(root, v),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    m
  }

  /** Committed versions, ascending — only versions whose manifest exists.
    * Orphan `v=<n>/` directories from crashed writers are NOT listed. */
  def versions(root: String): Seq[Long] = {
    val dir = manifestDir(root).toFile
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .map(_.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json") }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .sorted
  }

  def latestVersion(root: String): Option[Long] = versions(root).lastOption

  /** Read a committed version (throws if it was never committed, even if
    * its data directory exists — a manifest IS the commit). */
  def read(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(java.nio.file.Files.exists(manifestPath(root, v)),
      s"version $v was never committed at $root (no manifest)")
    spark.read.parquet(dataPath(root, v))
  }

  /** Read the latest committed version. */
  def readLatest(spark: SparkSession, root: String): DataFrame =
    read(spark, root,
      latestVersion(root).getOrElse(
        throw new IllegalStateException(s"no committed versions at $root")))

  /** The manifest's recorded row count — a version sanity check that
    * costs one small file read, not a scan. */
  def manifestRows(root: String, v: Long): Long = {
    val s = java.nio.file.Files.readString(manifestPath(root, v))
    """"rows":(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"bad manifest for v$v"))
  }

  private def ujsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}
