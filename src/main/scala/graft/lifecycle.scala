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

  /** Broadcast ceilings for id-log joins (r20, VERDICT r19 #1). The
    * maintenance policies bound the logs as a CORPUS FRACTION (0.25 of
    * stored rows) — their absolute size grows with the index, so an
    * unconditional broadcast hint is a 100×-scale read-path failure:
    * the driver would collect and broadcast a quarter-registry frame
    * into every family's probe plan the moment a takedown wave
    * approaches the compaction threshold. TWO bounds, both required:
    * on-disk bytes (8 MB) AND decoded row count (1M longs ≈ 8 MB raw)
    * — delta/RLE-packed parquet can hold orders of magnitude more
    * longs per byte than the byte bound alone assumes (a regular
    * takedown pattern like `id % k == 0` packs to a fraction of a bit
    * per value), so a byte-only gate would re-admit the exact OOM it
    * exists to prevent. */
  private[graft] def idLogBroadcastBytes(s: SparkSession): Long =
    s.conf.getOption("spark.graft.idLogBroadcastBytes").map(_.toLong)
      .getOrElse(8L << 20)
  private[graft] def idLogBroadcastRows(s: SparkSession): Long =
    s.conf.getOption("spark.graft.idLogBroadcastRows").map(_.toLong)
      .getOrElse(1L << 20)

  /** Decoded row count of a log directory from the parquet FOOTERS —
    * driver-side file tails, no Spark job. Cost is proportional to the
    * log's file count, so the decision below memoizes it per stamp. */
  private def idLogFooterRows(s: SparkSession, dir: String): Long =
    parquetFooterRows(s, dir)

  /** Exact row count of a COMMITTED parquet directory from its file
    * footers — recursive, so partitioned layouts count too. A parquet
    * footer records the writer's row count at file commit, so this
    * equals `read.parquet(dir).count()` exactly while costing zero
    * Spark jobs (no plan, no scheduling round-trip) — the r21 read-back
    * discipline for the index builds' "count what I just wrote" tails.
    * Only call on directories this driver just wrote or that are
    * guarded by the writer gate (a concurrent append would be
    * list-racy, exactly like the Spark count it replaces). */
  private[graft] def parquetFooterRows(s: SparkSession, dir: String): Long = {
    val fs = Similarity.hadoopFs(s, dir)
    val conf = s.sparkContext.hadoopConfiguration
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    var sum = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try sum += r.getRecordCount finally r.close()
      }
    }
    sum
  }

  /** Per-first-level-partition footer row counts of a directory written
    * with `partitionBy(col)` — (partition value string, rows) per
    * `col=value` subdirectory. Zero Spark jobs (the
    * [[parquetFooterRows]] contract per subdirectory). */
  private[graft] def parquetFooterRowsByPartition(
      s: SparkSession, dir: String, col: String): Seq[(String, Long)] = {
    val fs = Similarity.hadoopFs(s, dir)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$col="))
      .map(st => (st.getPath.getName.stripPrefix(s"$col="),
        parquetFooterRows(s, st.getPath.toString)))
  }

  /** Decoded row count of the log at `dir` — parquet footers, driver-
    * side, no Spark job; memoized against the directory stamp (footer
    * reads only when the log mutates). Shared by the broadcast gate
    * and [[tombstoneHeavy]]'s per-batch bound. */
  private[graft] def idLogRows(s: SparkSession, dir: String): Long =
    idLogRowsAt(s, dir, dirStamp(s, dir))
  private def idLogRowsAt(s: SparkSession, dir: String,
                          stamp: (Long, Long)): Long =
    if (stamp._2 == 0L) 0L
    else stampedMemo(s"$dir#rows", stamp)(idLogFooterRows(s, dir))

  /** Is the log at `dir` small enough to broadcast-hint? Bytes from the
    * directory stamp, decoded rows from the stamp-memoized footer
    * count; the ceilings are read live, so a conf change takes effect
    * at the next plan. Steady-state cost per plan construction: ONE
    * flat content summary (the stamp is taken once and threaded to the
    * row lookup). */
  private def idLogBroadcastable(s: SparkSession, dir: String): Boolean = {
    val stamp = dirStamp(s, dir)
    stamp._2 == 0L || (stamp._2 <= idLogBroadcastBytes(s) &&
      idLogRowsAt(s, dir, stamp) <= idLogBroadcastRows(s))
  }

  /** The id log's narrow column, broadcast-hinted ONLY below the size
    * ceilings. Above them the join goes unhinted and AQE picks the
    * strategy from runtime sizes. The request-sized common case (every
    * gate fixture) keeps its broadcast, so the ~115 pinned plans are
    * unchanged. */
  private[graft] def hintedIdLog(s: SparkSession, dir: String,
                                 idCol: String): DataFrame = {
    val log = idLogOf(s, dir, idCol).select(idCol)
    if (idLogBroadcastable(s, dir)) broadcast(log) else log
  }

  /** Anti-join `df` against the id log — the lazy-deletion read guard.
    * Skipped entirely (plan untouched) when no log exists, so the
    * untouched-index read path pays nothing; broadcast size-gated
    * (r20) so a corpus-fraction log cannot OOM the driver. */
  def minusIdLog(df: DataFrame, s: SparkSession, dir: String,
                 idCol: String): DataFrame =
    if (ScratchPaths.artifactExists(s, s"$dir/_SUCCESS"))
      df.join(hintedIdLog(s, dir, idCol), Seq(idCol), "left_anti")
    else df

  /** Consume `delivered` ids out of the append-only log at `dir`:
    * rewrite the remainder — or, when the consume EMPTIES the log,
    * delete the directory outright (r20, VERDICT r19 #4): an empty
    * parquet with `_SUCCESS` would tax every future merge with a dead
    * existence check plus an empty broadcast join forever, the shape
    * the r19c empty-tombstone rule already forbids. Replays of a
    * consumed takedown stay refused — the permanent tombstone written
    * at consume time carries that memory, not this log. `delivered` is
    * batch-bounded (batch ∩ log), so its hint is safe; the remainder
    * is localCheckpoint'd BEFORE the overwrite (its lineage reads the
    * files the write replaces). Caller holds the writer gate. */
  def consumeIdLog(s: SparkSession, dir: String, idCol: String,
                   delivered: DataFrame): Unit = {
    val rest = idLogOf(s, dir, idCol)
      .join(broadcast(delivered.select(idCol)), Seq(idCol), "left_anti")
      .localCheckpoint()
    if (rest.isEmpty)
      Similarity.hadoopFs(s, dir)
        .delete(new org.apache.hadoop.fs.Path(dir), true): Unit
    else rest.write.mode("overwrite").parquet(dir)
  }

  /** Same-process long-valued memo behind the r20 amortizations (the
    * lifecycle checks must not re-derive corpus-sized facts per micro-
    * batch). Keys embed the RESOLVED VERSION ROOT, so every compaction
    * / refit — the only writes that shrink an index — lands in a fresh
    * root and auto-invalidates. Entries whose staleness could change a
    * RESULT (the lex segment count, the broadcast verdict) are
    * additionally validated against the artifact directory's
    * (fileCount, byteLength) stamp, which ANY driver's append or
    * consume necessarily changes — so cross-driver writers need no
    * invalidation protocol; the purely advisory entries (the
    * tombstone-fraction bound) may go stale and can only DEFER a
    * maintenance check, never corrupt a result. [[commitVersion]]
    * sweeps an index's retired-root entries so a long-lived driver's
    * map does not grow with its compaction history. */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private[graft] def memoGet(key: String): Option[Long] = Option(memo.get(key))
  private[graft] def memoPut(key: String, v: Long): Unit = memo.put(key, v): Unit

  /** One ATOMIC stamp-validated memo entry per fact: (stamp, value)
    * lives in a single map slot, so the freshness check and the cached
    * value can never be read torn — publishing stamps and value across
    * separate keys would let a reader pair a fresh stamp written by a
    * concurrent deriver with the stale value it had not yet replaced
    * (the under-count that, on the lex segment count, would skip the
    * crash-dupe distinct). `derive` may run more than once under
    * contention; it must be pure. */
  private val stamped = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long, Long)]()
  private[graft] def stampedMemo(key: String, stamp: (Long, Long))
                                (derive: => Long): Long =
    Option(stamped.get(key)) match {
      case Some((a, b, v)) if a == stamp._1 && b == stamp._2 => v
      case _ =>
        val v = derive
        stamped.put(key, (stamp._1, stamp._2, v))
        v
    }

  /** Drop every memo entry under `path` except those under `keepRoot`
    * (the just-committed version). Flat-root and retired-version keys
    * are stale the moment resolution flips — a live reader re-derives
    * at its next miss. The `/`-or-`#` boundary guard keeps one index's
    * sweep from clipping a sibling path that shares a string prefix. */
  private[graft] def memoSweep(path: String, keepRoot: String): Unit = {
    def sweep(keys: java.util.Set[String]): Unit = {
      val it = keys.iterator()
      while (it.hasNext) {
        val k = it.next()
        val under = k.startsWith(s"$path/") || k.startsWith(s"$path#")
        val kept = k.startsWith(s"$keepRoot/") || k.startsWith(s"$keepRoot#")
        if (under && !kept) it.remove()
      }
    }
    sweep(memo.keySet()); sweep(stamped.keySet())
  }

  /** Stamp of an artifact directory for memo validation: (fileCount,
    * byteLength) from one flat content summary — (0, 0) when absent. */
  private[graft] def dirStamp(s: SparkSession, dir: String): (Long, Long) =
    try {
      val cs = Similarity.hadoopFs(s, dir)
        .getContentSummary(new org.apache.hadoop.fs.Path(dir))
      (cs.getFileCount, cs.getLength)
    } catch { case _: java.io.FileNotFoundException => (0L, 0L) }

  /** Threshold confs for the per-family MAINTENANCE POLICIES (r19): the
    * fragmentation / tombstone-mass triggers read their limits here. */
  def confInt(s: SparkSession, key: String, dflt: Int): Int =
    s.conf.getOption(key).map(_.toInt).getOrElse(dflt)
  def confDouble(s: SparkSession, key: String, dflt: Double): Double =
    s.conf.getOption(key).map(_.toDouble).getOrElse(dflt)

  /** The shared TOMBSTONE LEG of the r19b maintenance policies: have the
    * live victims lazy deletion is hiding reached `confKey`'s fraction
    * (default 0.25) of the stored rows? `storedIds` is the narrow id
    * column of the LIVE version's registry artifact. Families call this
    * from their forget tails and compact when it fires, so an unattended
    * takedown stream can never accumulate read-side anti-join mass and
    * dead rows — single-sourced so the five families (ANN, media,
    * lexical, dedup, PQ) cannot drift on the policy.
    *
    * AMORTIZED (r20, VERDICT r19 #2): the registry id scan no longer
    * runs per takedown batch. Per-batch cost is ZERO Spark jobs — the
    * log row count comes from the stamp-memoized parquet footers;
    * the corpus-sized scans run only when the cheap bound — last
    * measured victims plus every log row appended since, over the last
    * measured stored count — reaches the threshold. The bound is
    * conservative: within a version root, true live victims grow at
    * most one per appended log row (tombstoned ids never re-admit) and
    * stored rows only GROW via merges (shrinking means a compaction,
    * which lands in a fresh root and a fresh `memoKey`) — so staleness
    * can only trigger the real check EARLY, never skip one that is
    * due. `memoKey` must be the RESOLVED VERSION ROOT of `storedIds`'s
    * artifact. The first check on a root (no memo) pays the real scan
    * once and seeds the bound. */
  def tombstoneHeavy(s: SparkSession, storedIds: => DataFrame, logDir: String,
                     idCol: String, confKey: String, memoKey: String): Boolean =
    ScratchPaths.artifactExists(s, s"$logDir/_SUCCESS") && {
      val frac = confDouble(s, confKey, 0.25)
      val logRows = idLogRows(s, logDir)
      val bound = for {
        st <- memoGet(s"$memoKey#ts.stored") if st > 0L
        l0 <- memoGet(s"$memoKey#ts.log")
        v0 <- memoGet(s"$memoKey#ts.victims")
      } yield (v0 + math.max(0L, logRows - l0)).toDouble / st
      if (bound.exists(_ < frac)) false
      else {
        val ids = storedIds
        val stored = ids.count()
        val victims =
          if (stored == 0L) 0L
          else ids.join(hintedIdLog(s, logDir, idCol), Seq(idCol), "left_semi")
            .count()
        memoPut(s"$memoKey#ts.stored", stored)
        memoPut(s"$memoKey#ts.log", logRows)
        memoPut(s"$memoKey#ts.victims", victims)
        stored > 0 && victims.toDouble / stored >= frac
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
    // retired-root memo entries die with the commit (r20): resolution
    // just flipped, so every cached fact keyed under the old roots is
    // stale by definition — and the map must not grow with history
    memoSweep(path, newRoot)
  }
}
