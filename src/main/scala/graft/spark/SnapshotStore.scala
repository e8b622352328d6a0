package graft.spark

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Parquet-backed snapshot layer emulating Iceberg's MERGE INTO + snapshot
  * isolation (the sandbox ships no Iceberg jar — SURVEY.md section 4.2).
  *
  * Layout:
  *   root/data/snap-<id>/part-*.parquet   immutable data files per commit
  *   root/_snapshots/v<id>.json           manifest: file list + parent id
  *   root/_snapshots/CURRENT              current snapshot id (atomic rename)
  *
  * Semantics:
  *  - `merge(df, "url")` appends only rows whose key is absent from the
  *    current snapshot (left-anti against committed keys), then commits a new
  *    manifest atomically. Re-running a partially-committed job is therefore
  *    idempotent: already-committed urls are skipped, the final table has no
  *    duplicates (the north rule's resumability requirement).
  *  - Readers see only committed snapshots; a crash mid-write leaves data
  *    files without a manifest, which are invisible and harmless.
  *
  * On a real cluster the same trait surface is served by Iceberg
  * (`MERGE INTO ... ON t.url = s.url WHEN NOT MATCHED THEN INSERT`).
  */
trait TableStore {
  /** Current committed table; None when no snapshot exists. */
  def read(spark: SparkSession): Option[DataFrame]
  /** Committed keys only (column-pruned). */
  def committedKeys(spark: SparkSession, keyCol: String): Option[DataFrame]
  /** MERGE-INTO-when-not-matched; returns the newly visible data files. */
  def merge(df: DataFrame, keyCol: String): Vector[String]
}

final class SnapshotStore(val root: String) extends TableStore {

  private def snapshotsDir: Path = Paths.get(root, "_snapshots")
  private def currentFile: Path = snapshotsDir.resolve("CURRENT")

  def currentSnapshotId: Option[Long] =
    if (Files.exists(currentFile))
      Some(new String(Files.readAllBytes(currentFile), StandardCharsets.UTF_8).trim.toLong)
    else None

  private def manifestFiles(id: Long): Vector[String] = {
    val manifest = snapshotsDir.resolve(s"v$id.json")
    val content = new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8)
    // minimal parse of {"id":N,"parent":N|null,"files":["..",".."]}
    val filesPart = content.substring(content.indexOf("[") + 1, content.lastIndexOf("]"))
    if (filesPart.trim.isEmpty) Vector.empty
    else filesPart.split(",").iterator.map(_.trim.stripPrefix("\"").stripSuffix("\"")).toVector
  }

  /** All data files of the current snapshot (empty table if none). */
  def currentFiles: Vector[String] =
    currentSnapshotId.map(manifestFiles).getOrElse(Vector.empty)

  def isEmpty: Boolean = currentFiles.isEmpty

  /** Current committed table; None when no snapshot exists. */
  def read(spark: SparkSession): Option[DataFrame] = {
    val files = currentFiles
    if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
  }

  /** Committed keys only (column-pruned scan of the key column). */
  def committedKeys(spark: SparkSession, keyCol: String): Option[DataFrame] =
    read(spark).map(_.select(keyCol).distinct())

  /** MERGE-INTO-when-not-matched: write `df` minus already-committed keys as
    * a new snapshot. Returns the newly visible data files (so callers can
    * derive per-commit aggregates without recomputing or caching upstream).
    */
  def merge(df: DataFrame, keyCol: String): Vector[String] = {
    val spark = df.sparkSession
    val newId = currentSnapshotId.getOrElse(-1L) + 1L
    val dataDir = Paths.get(root, "data", s"snap-$newId")
    val toWrite = committedKeys(spark, keyCol) match {
      case Some(done) => df.join(done, Seq(keyCol), "left_anti")
      case None       => df
    }
    toWrite.write.mode("overwrite").parquet(dataDir.toString)
    val newFiles = Files.list(dataDir).iterator().asScala
      .map(_.toString)
      .filter(f => f.endsWith(".parquet"))
      .toVector
    commit(newId, currentFiles ++ newFiles)
    newFiles
  }

  private def commit(id: Long, files: Vector[String]): Unit = {
    Files.createDirectories(snapshotsDir)
    val parent = currentSnapshotId.map(_.toString).getOrElse("null")
    val json =
      s"""{"id":$id,"parent":$parent,"files":[${files.map(f => "\"" + f + "\"").mkString(",")}]}"""
    val tmp = snapshotsDir.resolve(s".v$id.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, snapshotsDir.resolve(s"v$id.json"), StandardCopyOption.ATOMIC_MOVE)
    val tmpCur = snapshotsDir.resolve(".CURRENT.tmp")
    Files.write(tmpCur, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmpCur, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
