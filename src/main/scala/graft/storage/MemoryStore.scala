package graft.storage

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed storage layer — the single unified backend that
  * replaces the reference's per-database plurality (reference contract:
  * alma/storage/base.py:36-1182; SQLite impl sqlite_local.py; the
  * Postgres/Chroma/Qdrant/Pinecone/Cosmos backends all collapse into
  * one columnar layout, SURVEY S5).
  *
  * Layout: `<root>/<memory_type>/` Parquet, partitioned by `projectId`
  * so project/agent predicates become partition pruning + pushed
  * filters at 100 TB. Writes are append-only batches (S3/S4); upsert
  * (A3) and archive (S10) are snapshot-rewrite jobs — the open-format
  * stand-in for Delta MERGE, kept idempotent.
  */
final class MemoryStore(val spark: SparkSession, val root: String) {
  import spark.implicits._

  private def path(memoryType: String) = s"$root/$memoryType"

  // ---- batch writes (S3) ------------------------------------------------
  def saveHeuristics(rows: Seq[Heuristic]): Unit = append(rows.toDS(), MemoryType.Heuristics)
  def saveOutcomes(rows: Seq[Outcome]): Unit = append(rows.toDS(), MemoryType.Outcomes)
  def savePreferences(rows: Seq[UserPreference]): Unit = append(rows.toDS(), MemoryType.Preferences)
  def saveKnowledge(rows: Seq[DomainKnowledge]): Unit = append(rows.toDS(), MemoryType.Knowledge)
  def saveAntiPatterns(rows: Seq[AntiPattern]): Unit = append(rows.toDS(), MemoryType.AntiPatterns)

  private def append[T](ds: Dataset[T], memoryType: String): Unit =
    ds.write.mode(SaveMode.Append).partitionBy("projectId").parquet(path(memoryType))

  def exists(memoryType: String): Boolean =
    new java.io.File(s"${path(memoryType)}/_SUCCESS").exists() ||
      new java.io.File(path(memoryType)).exists()

  // ---- filtered scans (S2, F1/F2/F5/F8) --------------------------------
  /** Typed scan with the standard predicate set; filters push to the
    * Parquet scan (project partition prune + agent/confidence row
    * filters).
    */
  def scan(
      memoryType: String,
      projectId: Option[String] = None,
      agents: Seq[String] = Nil,
      minConfidence: Option[Double] = None): DataFrame = {
    if (!exists(memoryType))
      return emptyOf(memoryType)
    var df = spark.read.parquet(path(memoryType))
    projectId.foreach(p => df = df.filter(col("projectId") === p))
    if (agents.nonEmpty) df = df.filter(col("agent").isin(agents: _*))
    minConfidence.foreach(c => df = df.filter(col("confidence") >= c))
    df
  }

  def heuristics(projectId: Option[String] = None, agents: Seq[String] = Nil,
      minConfidence: Option[Double] = None): Dataset[Heuristic] =
    scan(MemoryType.Heuristics, projectId, agents, minConfidence).as[Heuristic]

  def outcomes(projectId: Option[String] = None, agents: Seq[String] = Nil): Dataset[Outcome] =
    scan(MemoryType.Outcomes, projectId, agents).as[Outcome]

  def preferences(): Dataset[UserPreference] =
    (if (exists(MemoryType.Preferences)) spark.read.parquet(path(MemoryType.Preferences))
     else emptyOf(MemoryType.Preferences)).as[UserPreference]

  def knowledge(projectId: Option[String] = None, agents: Seq[String] = Nil,
      minConfidence: Option[Double] = None): Dataset[DomainKnowledge] =
    scan(MemoryType.Knowledge, projectId, agents, minConfidence).as[DomainKnowledge]

  def antiPatterns(projectId: Option[String] = None, agents: Seq[String] = Nil): Dataset[AntiPattern] =
    scan(MemoryType.AntiPatterns, projectId, agents).as[AntiPattern]

  private def emptyOf(memoryType: String): DataFrame = memoryType match {
    case MemoryType.Heuristics => spark.emptyDataset[Heuristic].toDF()
    case MemoryType.Outcomes => spark.emptyDataset[Outcome].toDF()
    case MemoryType.Preferences => spark.emptyDataset[UserPreference].toDF()
    case MemoryType.Knowledge => spark.emptyDataset[DomainKnowledge].toDF()
    case MemoryType.AntiPatterns => spark.emptyDataset[AntiPattern].toDF()
  }

  // ---- upsert (S4/A3) ---------------------------------------------------
  /** Upsert heuristics by id: occurrence/success counts add, confidence
    * and lastValidated take the incoming value (reference increment
    * semantics, base.py:238-253). Snapshot-rewrite implementation:
    * read → merge → write to a new snapshot → swap.
    */
  def upsertHeuristics(incoming: Seq[Heuristic]): Unit = {
    val current = heuristics().collect().toSeq
    val byId = current.map(h => h.id -> h).toMap
    val merged = incoming.map { h =>
      byId.get(h.id) match {
        case Some(old) => h.copy(
          occurrenceCount = old.occurrenceCount + h.occurrenceCount,
          successCount = old.successCount + h.successCount,
          createdAt = old.createdAt)
        case None => h
      }
    }
    val untouched = current.filterNot(h => incoming.exists(_.id == h.id))
    overwrite((untouched ++ merged).toDS(), MemoryType.Heuristics)
  }

  /** Replace heuristics by id (promotion re-emission: counts are
    * recomputed from outcomes, so rows are replaced wholesale rather
    * than incremented; createdAt survives from the original row).
    */
  def replaceHeuristics(incoming: Seq[Heuristic]): Unit = {
    val current = heuristics().collect().toSeq
    val byId = current.map(h => h.id -> h).toMap
    val replaced = incoming.map(h =>
      byId.get(h.id).map(old => h.copy(createdAt = old.createdAt)).getOrElse(h))
    val untouched = current.filterNot(h => incoming.exists(_.id == h.id))
    overwrite((untouched ++ replaced).toDS(), MemoryType.Heuristics)
  }

  private def overwrite[T](ds: Dataset[T], memoryType: String): Unit = {
    val live = new java.io.File(path(memoryType))
    // An empty dataset written with partitionBy produces no schema
    // files (only _SUCCESS), which poisons later reads — an empty table
    // is represented by no directory at all (exists() → typed empty).
    if (ds.isEmpty) {
      if (live.exists()) delete(live)
      return
    }
    // Write-new-then-swap keeps the operation idempotent and never
    // leaves a half-written live directory. Every rename is checked:
    // a failed swap restores the backup instead of silently dropping
    // the only copy of the table.
    val tmp = s"$root/.tmp_$memoryType"
    ds.write.mode(SaveMode.Overwrite).partitionBy("projectId").parquet(tmp)
    val bak = new java.io.File(s"$root/.bak_$memoryType")
    if (bak.exists()) delete(bak)
    if (live.exists() && !live.renameTo(bak))
      throw new java.io.IOException(s"could not stage backup for $memoryType")
    if (!new java.io.File(tmp).renameTo(live)) {
      if (bak.exists()) bak.renameTo(live)
      throw new java.io.IOException(s"could not swap snapshot for $memoryType")
    }
    delete(bak)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete(): Unit
  }

  // ---- archive / restore (S10) -----------------------------------------
  /** Archive = append full snapshots with reason + archived-at, then
    * rewrite the live set without them (reference base.py:989-1125).
    */
  def archiveOutcomes(ids: Set[String], reason: String, asOfUs: Long): Unit = {
    val all = outcomes().collect().toSeq
    val (toArchive, keep) = all.partition(o => ids.contains(o.id))
    if (toArchive.nonEmpty) {
      toArchive.toDS()
        .withColumn("reason", lit(reason))
        .withColumn("archived_at_us", lit(asOfUs))
        .write.mode(SaveMode.Append).parquet(s"$root/archive/outcomes")
      overwrite(keep.toDS(), MemoryType.Outcomes)
    }
  }

  def archivedOutcomes(): DataFrame =
    if (new java.io.File(s"$root/archive/outcomes").exists())
      spark.read.parquet(s"$root/archive/outcomes")
    else spark.emptyDataset[Outcome].toDF()
      .withColumn("reason", lit("")).withColumn("archived_at_us", lit(0L))

  /** Restore = archived rows not currently live, re-appended (anti-join
    * + append, SURVEY S10).
    */
  def restoreOutcomes(ids: Set[String]): Unit = {
    val archived = archivedOutcomes()
      .filter(col("id").isin(ids.toSeq: _*))
      .drop("reason", "archived_at_us").as[Outcome]
    val live = outcomes()
    val toRestore = archived.join(live.select("id").withColumnRenamed("id", "live_id"),
      col("id") === col("live_id"), "left_anti").as[Outcome]
    append(toRestore, MemoryType.Outcomes)
  }

  // ---- stats (A4) -------------------------------------------------------
  def stats(projectId: Option[String] = None): Map[String, Long] =
    MemoryType.All.map { t =>
      t -> (if (exists(t)) scan(t, projectId).count() else 0L)
    }.toMap
}
