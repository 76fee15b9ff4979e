package graft.plans

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets.UTF_8

/** Versioned corpus snapshots with ATOMIC publish — the operational
  * contract a multi-team 100 TB corpus needs: a cleaning run publishes
  * version N while training jobs keep reading version N−1, and a reader
  * can NEVER observe a half-written version — including a reader of an
  * already-committed version that is being re-published concurrently.
  *
  * The mechanism is the classic manifest commit (the core idea of the
  * lakehouse table formats, reduced to what a corpus store needs):
  * every publish writes its data files to a FRESH nonce-suffixed
  * directory, and the version only EXISTS (or changes meaning) when its
  * manifest — a single small JSON naming that directory — lands under
  * `<root>/_manifests/` via temp-file + atomic rename. Readers resolve
  * the data directory through the manifest, never by listing: a crashed
  * writer leaves orphan data files but no manifest (invisible), and a
  * RE-publish of a committed version writes a second data directory and
  * flips the manifest atomically — a concurrent reader keeps reading
  * the old directory, which is never deleted out from under it (orphans
  * are reclaimed explicitly via [[vacuum]], to be run when no readers
  * of pre-republish manifests remain).
  *
  * All metadata IO goes through the Hadoop FileSystem / FileContext
  * APIs resolved from the root path's scheme. The commit contract holds
  * ONLY on filesystems with an atomic single-file rename — local,
  * HDFS, viewfs. (`FileContext.rename(OVERWRITE)` is the atomic
  * commit primitive there; plain `FileSystem.rename` cannot atomically
  * replace an existing manifest.) Object stores (s3a, gs, abfs, …)
  * emulate rename as copy+delete — a reader could observe a missing or
  * half-copied manifest — so [[publish]] FAILS FAST on those schemes
  * rather than silently degrading to a non-atomic commit; an
  * object-store deployment needs a different commit primitive
  * (e.g. S3 conditional PUT) that this store deliberately does not
  * pretend to provide.
  *
  * Scale notes: the manifest is O(1) metadata — the data write is a
  * normal partitioned parquet write with all of Spark's parallelism;
  * `read` goes straight to the manifest's directory (no listing of
  * other versions); `diff` of two versions is the id-keyed
  * full-outer-join accounting of `LlmData.corpusDiff`, cost
  * O(|vA| + |vB|) on the uniform id key.
  */
object SnapshotStore {

  final case class Manifest(version: Long, rows: Long, schemaJson: String,
                            dir: String)

  /** Schemes whose `rename` is copy+delete (or otherwise non-atomic):
    * the manifest-commit contract cannot hold there — see class doc. */
  private val NonAtomicRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss",
      "cosn", "swift")

  private def manifestDir(root: String) = new Path(root, "_manifests")
  private def manifestPath(root: String, v: Long) =
    new Path(manifestDir(root), s"v$v.json")

  private def conf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsOf(root: String, c: Configuration): FileSystem =
    new Path(root).getFileSystem(c)

  private def fsOf(root: String): FileSystem = fsOf(root, conf())

  /** Publish `df` as version `v`: data into a fresh nonce directory
    * first, manifest last (temp + atomic rename-with-overwrite), so the
    * version becomes visible — or changes content, on a re-publish —
    * all-at-once. Returns the manifest.
    *
    * With `overwrite = false` the manifest rename carries no OVERWRITE
    * option, so the commit FAILS with a
    * `FileAlreadyExistsException` when version `v` is already
    * committed — the compare-and-swap a caller needs when two writers
    * may race on the same version id (see
    * [[graft.streaming.StreamSink.idempotent]]): exactly one writer's
    * manifest lands, the loser's data directory stays an orphan for
    * [[vacuum]]. */
  def publish(df: DataFrame, root: String, v: Long,
              overwrite: Boolean = true): Manifest = {
    require(v >= 0, s"version must be >= 0, got $v")
    val scheme = Option(new Path(root).toUri.getScheme).getOrElse("file")
    require(!NonAtomicRenameSchemes.contains(scheme.toLowerCase),
      s"SnapshotStore.publish requires atomic rename; scheme '$scheme' " +
        "emulates rename as copy+delete, so the manifest commit would " +
        "not be atomic — publish to HDFS/local and mirror afterwards, " +
        "or use a store-native conditional-write commit instead")
    val spark = df.sparkSession
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val dirName = s"v=$v-$nonce"
    val dataDir = new Path(root, dirName)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    // row count from the WRITTEN files, not the input plan — the manifest
    // must describe what a reader will actually see
    val written = spark.read.parquet(dataDir.toString)
    val m = Manifest(v, written.count(), written.schema.json, dirName)
    // conf from the DataFrame's OWN session, not the thread-local active
    // session: the manifest must resolve the same FileSystem (same
    // fs.s3a.* credentials etc.) as the data write — a driver-side
    // thread pool has no active session and a bare Configuration would
    // silently target a different/unconfigured FS
    val hc = spark.sparkContext.hadoopConfiguration
    val fs = fsOf(root, hc)
    fs.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root), s".v$v-$nonce.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      (s"""{"version":$v,"rows":${m.rows},"dir":${jsonStr(dirName)},""" +
        s""""schema":${jsonStr(m.schemaJson)}}""").getBytes(UTF_8))
    finally out.close()
    // FileContext.rename(OVERWRITE): atomic manifest replacement on HDFS
    // and local FS alike — THE commit point. Without OVERWRITE the same
    // rename is an atomic create-if-absent (loud FileAlreadyExists on a
    // lost race).
    val fc = FileContext.getFileContext(new Path(root).toUri, hc)
    fc.rename(tmp, manifestPath(root, v),
      (if (overwrite) Options.Rename.OVERWRITE else Options.Rename.NONE))
    m
  }

  /** Committed versions, ascending — only versions whose manifest exists.
    * Orphan data directories from crashed or superseded writers are NOT
    * listed. */
  def versions(root: String): Seq[Long] = {
    val fs = fsOf(root)
    val dir = manifestDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json") }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .sorted
  }

  def latestVersion(root: String): Option[Long] = versions(root).lastOption

  /** Read a committed version (throws if it was never committed, even if
    * a data directory for it exists — a manifest IS the commit). */
  def read(spark: SparkSession, root: String, v: Long): DataFrame = {
    val fs = fsOf(root)
    require(fs.exists(manifestPath(root, v)),
      s"version $v was never committed at $root (no manifest)")
    spark.read.parquet(new Path(root, dataDirOf(root, v)).toString)
  }

  /** Read the latest committed version. */
  def readLatest(spark: SparkSession, root: String): DataFrame =
    read(spark, root,
      latestVersion(root).getOrElse(
        throw new IllegalStateException(s"no committed versions at $root")))

  /** The manifest's recorded row count — a version sanity check that
    * costs one small file read, not a scan. */
  def manifestRows(root: String, v: Long): Long =
    """"rows":(\d+)""".r.findFirstMatchIn(readManifest(root, v))
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"bad manifest for v$v"))

  /** The data directory (relative to root) the manifest for `v` commits
    * to. Manifests written before the nonce scheme carry no `dir` field
    * and resolve to the legacy `v=<n>` layout. The match is ANCHORED to
    * this writer's fixed key order (version, rows, dir, schema) so a
    * literal `"dir":"…"` inside a legacy manifest's embedded schema JSON
    * (e.g. a column-metadata key named `dir`) can never be mistaken for
    * the top-level field. */
  def dataDirOf(root: String, v: Long): String =
    """^\{"version":\d+,"rows":\d+,"dir":"([^"]+)"""".r
      .findFirstMatchIn(readManifest(root, v))
      .map(_.group(1)).getOrElse(s"v=$v")

  /** Un-commit a version by deleting its manifest — the data directory
    * becomes an orphan for [[vacuum]]. NOT atomic with anything else;
    * callers own the ordering (e.g. [[graft.streaming.StreamSink.retire]]
    * drops batch manifests only after their rows are committed inside a
    * compacted segment). A no-op when the manifest is already gone. */
  def dropManifest(root: String, v: Long): Unit =
    fsOf(root).delete(manifestPath(root, v), false)

  /** Reclaim unreferenced storage: `v=*` data directories not named by
    * any committed manifest (crashed writers, superseded re-publishes)
    * and stale `.v*.tmp` manifest temp files. Only items whose
    * modification time is older than `graceMs` are touched — an
    * IN-FLIGHT publish's data directory has no manifest yet and must
    * never be swept out from under it, so the grace window must exceed
    * the longest plausible publish (default 1h). Run when no reader is
    * still holding a pre-republish manifest; returns the deleted names. */
  def vacuum(root: String, graceMs: Long = 3600000L): Seq[String] = {
    val fs = fsOf(root)
    val live = versions(root).map(dataDirOf(root, _)).toSet
    // inclusive cutoff: with graceMs=0 (tests, explicit force) an item
    // written in the SAME millisecond tick must still be sweepable
    val cutoff = System.currentTimeMillis() - graceMs
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else {
      val orphanDirs = fs.listStatus(rootPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v=") &&
          st.getModificationTime <= cutoff)
        .map(_.getPath)
        .filterNot(p => live.contains(p.getName))
      val mDir = manifestDir(root)
      val staleTmps =
        if (!fs.exists(mDir)) Seq.empty
        else fs.listStatus(mDir).toSeq
          .filter(st => st.getPath.getName.startsWith(".v") &&
            st.getPath.getName.endsWith(".tmp") &&
            st.getModificationTime <= cutoff)
          .map(_.getPath)
      (orphanDirs ++ staleTmps).map { p => fs.delete(p, true); p.getName }
    }
  }

  private def readManifest(root: String, v: Long): String = {
    val fs = fsOf(root)
    val in = fs.open(manifestPath(root, v))
    val bos = new java.io.ByteArrayOutputStream()
    try org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
    finally in.close()
    new String(bos.toByteArray, UTF_8)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}
