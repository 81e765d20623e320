package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SHARED standing-index lifecycle core (r19, VERDICT r18 #8).
  *
  * Three standing-index families — ANN (q119/q134/q135/q140/q141),
  * perceptual media (q136–q139b), lexical BM25 (q132/q142/q143) — share
  * one lifecycle contract: build / probe / ingest-merge / forget /
  * versioned compaction / keep-N GC / statistic re-pricing. The
  * version-resolution + marker-commit machinery is single-sourced in
  * [[Similarity]] (`resolveIndexRoot` / `nextVersionName` /
  * `pruneVersions` / `keepVersions`); this object hosts what each
  * family used to copy — the writer gate, the append-only id-log
  * readers, and the commit+GC tail — so a fourth family (and the three
  * today) cannot drift on the contract.
  */
object IndexLifecycle {

  /** Same-process writer serialization, per index path. `synchronized`
    * is reentrant, matching [[ScratchPaths.withWriteIntent]]'s r19
    * depth tracking — nested writers (a merge-triggered compaction, a
    * rebuild's internal GC) are safe. Families' paths are disjoint
    * (distinct scratch tags), so one map serves all. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def withLock[T](path: String)(body: => T): T =
    locks.computeIfAbsent(path, _ => new Object).synchronized(body)

  /** JVM lock + cross-driver write-intent marker (VERDICT r17 #5) —
    * every artifact writer of every family enters through here. */
  def withWriter[T](s: SparkSession, path: String)(body: => T): T =
    withLock(path)(ScratchPaths.withWriteIntent(s, path)(body))

  /** An append-only id log (tombstones, pending-forgets) at `dir`:
    * read-or-empty behind the _SUCCESS-keyed existence guard (a crash
    * during the first append can leave a directory with no committed
    * parquet — that must read as "no log", not die inferring schema). */
  def idLogOf(s: SparkSession, dir: String, idCol: String): DataFrame = {
    import s.implicits._
    if (ScratchPaths.artifactExists(s, s"$dir/_SUCCESS"))
      s.read.parquet(dir)
    else Seq.empty[Long].toDF(idCol)
  }

  /** Anti-join `df` against the id log — the lazy-deletion read guard.
    * Skipped entirely (plan untouched) when no log exists, so the
    * untouched-index read path pays nothing. */
  def minusIdLog(df: DataFrame, s: SparkSession, dir: String,
                 idCol: String): DataFrame =
    if (ScratchPaths.artifactExists(s, s"$dir/_SUCCESS"))
      df.join(broadcast(idLogOf(s, dir, idCol).select(idCol)),
        Seq(idCol), "left_anti")
    else df

  /** Threshold confs for the per-family MAINTENANCE POLICIES (r19): the
    * fragmentation / tombstone-mass triggers read their limits here. */
  def confInt(s: SparkSession, key: String, dflt: Int): Int =
    s.conf.getOption(key).map(_.toInt).getOrElse(dflt)
  def confDouble(s: SparkSession, key: String, dflt: Double): Double =
    s.conf.getOption(key).map(_.toDouble).getOrElse(dflt)

  /** The shared TOMBSTONE LEG of the r19b maintenance policies: have the
    * live victims lazy deletion is hiding reached `confKey`'s fraction
    * (default 0.25) of the stored rows? `storedIds` is the narrow id
    * column of the LIVE version's registry artifact — the check costs
    * one columnar id scan, and only runs when the log exists. Families
    * call this from their forget tails and compact when it fires, so an
    * unattended takedown stream can never accumulate read-side anti-join
    * mass and dead rows — single-sourced so the five families (ANN,
    * media, lexical, dedup, PQ) cannot drift on the policy. */
  def tombstoneHeavy(s: SparkSession, storedIds: DataFrame, logDir: String,
                     idCol: String, confKey: String): Boolean =
    ScratchPaths.artifactExists(s, s"$logDir/_SUCCESS") && {
      val stored = storedIds.count()
      stored > 0 && {
        val victims = storedIds
          .join(broadcast(idLogOf(s, logDir, idCol).select(idCol)),
            Seq(idCol), "left_semi").count()
        victims.toDouble / stored >= confDouble(s, confKey, 0.25)
      }
    }

  /** Commit a fully-written version directory: the atomic marker-create
    * flips resolution to `newRoot` (in-flight readers of the old
    * version keep their files end-to-end), then keep-N GC retires the
    * tail — r19's rule that every versioning write path runs its own
    * GC, so an unattended refit/compaction stream can never accumulate
    * versions × corpus on disk. Caller holds the writer gate. */
  def commitVersion(s: SparkSession, path: String, newRoot: String,
                    flatArtifacts: Seq[String]): Unit = {
    Similarity.hadoopFs(s, path).create(
      new org.apache.hadoop.fs.Path(s"$newRoot/_COMMITTED"), false).close()
    Similarity.pruneVersions(s, path, Similarity.keepVersions(s),
      flatArtifacts): Unit
  }
}
