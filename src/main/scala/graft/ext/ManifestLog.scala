package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** One commit's manifest: the relation dirs it publishes, plus (for
  * compactions) the counts dirs it supersedes, plus an optional caller
  * idempotence `token` (the exactly-once append contract). Line-oriented
  * `key=id[,id...]` text — no JSON dependency, human-greppable. Shared by
  * every persisted index layout ([[NearDupIndex]], [[SubstrIndex]]); an
  * index that doesn't use a relation leaves its list empty.
  */
private[ext] final case class Manifest(digests: Seq[String],
    bands: Seq[String], counts: Seq[String], supersedesCounts: Seq[String],
    token: Option[String] = None, supersedesDigests: Seq[String] = Nil,
    generation: Option[Int] = None) {
  def render: String = (Seq(
    "digests" -> digests, "bands" -> bands, "counts" -> counts,
    "supersedes_counts" -> supersedesCounts,
    "supersedes_digests" -> supersedesDigests)
    .collect { case (k, v) if v.nonEmpty => s"$k=${v.mkString(",")}" } ++
    generation.map(g => s"generation=$g") ++
    token.map(t => s"token=$t"))
    .mkString("\n")
}

private[ext] object Manifest {
  def parse(s: String): Manifest = {
    // values stay RAW here: only the id-list keys split on ',' — the
    // token is caller-chosen text (commas legal per the appendOnce
    // contracts) and must round-trip byte-exact or a replayed micro-batch
    // misses the committed-token check and double-indexes its survivors
    val kv = s.linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); (k, v) }
      .toMap
    def ids(k: String): Seq[String] =
      kv.get(k).map(_.split(",").toSeq).getOrElse(Nil)
    Manifest(ids("digests"), ids("bands"), ids("counts"),
      ids("supersedes_counts"), kv.get("token"), ids("supersedes_digests"),
      kv.get("generation").map(_.toInt))
  }
}

/** The marker-commit log under an index path: sequential manifests in
  * `_commits/`, each staged to a dot-file then renamed (no-overwrite —
  * atomic on POSIX and HDFS) into place, so a multi-relation append
  * becomes visible all-or-nothing and a second concurrent writer FAILS
  * its commit instead of publishing over the first (readers always see
  * the last committed set). Extracted from [[NearDupIndex]] so every
  * persisted index shares one implementation.
  *
  * == Concurrency contract ==
  *
  * WRITERS serialize on [[withWriteLock]] — every mutating entry point of
  * every store (append/appendOnce, build/create, retrain, vacuum) runs
  * its read-modify-commit cycle under the layout's `.lock` file, so:
  *  - two concurrent appends both land, in some order, neither lost (the
  *    second waits, then reads a log that includes the first);
  *  - appendOnce's token check-then-commit is atomic — two racers with
  *    the SAME token fold the batch exactly once;
  *  - compaction (called from an append, inside its lock) can never race
  *    another append or another compaction, so a relation dir is
  *    superseded by at most one fold and counts are never doubled;
  *  - vacuum (locked) can never unlink a dir an in-flight WRITER is
  *    folding. READERS take no lock at all: they resolve paths from a
  *    committed manifest snapshot, and the vacuum retention guard
  *    ([[vacuumEligible]]) keeps superseded dirs on disk for the
  *    retention window, so a scan planned just before a compaction can
  *    finish. A reader older than the retention window may see
  *    `FileNotFoundException` — lengthen
  *    `spark.graft.index.vacuumRetentionMs` to cover the longest query.
  * The commit publish stays no-overwrite (rename on HDFS; a hard link on
  * the local scheme, where POSIX rename(2) would silently replace), so
  * even a writer that BYPASSES the lock cannot publish over a committed
  * manifest — it fails its commit instead (defense in depth, not the
  * contract). Lock liveness: holders heartbeat the lock file
  * ([[withWriteLock]]), so only a holder that has STOPPED beating for a
  * whole `lockStaleMs` window is presumed dead and broken — a corpus-sized
  * [[IvfStore.refit]] holds its lock for hours without any conf tuning.
  */
private[ext] final class ManifestLog(spark: SparkSession, path: String) {

  private[ext] def fileSystem: FileSystem =
    new HPath(path).getFileSystem(spark.sessionState.newHadoopConf())
  private def fs: FileSystem = fileSystem

  private def commitsDir = new HPath(s"$path/_commits")

  def read(): Seq[Manifest] = readWithMtimes().map(_._1)

  /** Manifests with their commit files' modification times — the vacuum
    * retention guard's input: a superseded dir may only be unlinked once
    * its SUPERSEDING commit is older than the retention window (an
    * in-flight reader that resolved paths before that commit has had the
    * window to finish). */
  def readWithMtimes(): Seq[(Manifest, Long)] = {
    val f = fs
    if (!f.exists(commitsDir)) Nil
    else f.listStatus(commitsDir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
      .map { s =>
        val in = f.open(s.getPath)
        val bytes = new Array[Byte](s.getLen.toInt)
        try in.readFully(bytes) finally in.close()
        (Manifest.parse(new String(bytes, "UTF-8")), s.getModificationTime)
      }
  }

  /** Run `body` holding this layout's writer lock — an atomic
    * create-no-overwrite `.lock` file under `_commits/` (atomic on HDFS
    * and object stores with conditional create; on the local scheme the
    * create goes through nio `CREATE_NEW` = O_EXCL, because Hadoop's
    * RawLocalFileSystem `create(overwrite=false)` is exists-then-create
    * and two same-process racers could both "win"). A held lock is waited
    * on up to `spark.graft.index.lockWaitMs` (default 2 min), then the
    * call fails fast NAMING the lock file.
    *
    * LIVENESS vs crashed holders: the holder HEARTBEATS — a driver-side
    * daemon touches the lock file's mtime every
    * `spark.graft.index.lockHeartbeatMs` (default 30 s), so staleness is
    * judged on HEARTBEAT age, not acquisition age: a lock whose last
    * heartbeat is older than `spark.graft.index.lockStaleMs` (default
    * 10 min) is presumed abandoned by a crashed writer and broken via a
    * unique-name rename (exactly one waiter wins the takeover), while a
    * legitimately LONG holder — [[IvfStore.refit]] is corpus-sized by
    * design — keeps its live lock for as long as it keeps beating. Keep
    * the heartbeat period well under the stale window. The lock file
    * carries an `owner=` nonce; release (and each beat) checks it, so a
    * holder that was wrongly broken anyway (e.g. suspended longer than
    * the stale window) cannot delete its successor's lock. NOT reentrant:
    * public store entry points acquire it once and call lock-free
    * internals. */
  def withWriteLock[T](body: => T): T = {
    val waitMs = IndexConf.strictLong(spark,
      "spark.graft.index.lockWaitMs", default = 120000L, min = 0L)
    val staleMs = IndexConf.strictLong(spark,
      "spark.graft.index.lockStaleMs", default = 600000L, min = 1L)
    // clamp the beat to a third of the stale window: a conf pair with
    // hbMs >= staleMs would let a waiter break a LIVE holder between
    // beats — the exact failure the heartbeat exists to prevent
    val hbMs = math.min(
      IndexConf.strictLong(spark,
        "spark.graft.index.lockHeartbeatMs", default = 30000L, min = 1L),
      math.max(1L, staleMs / 3))
    val f = fs
    f.mkdirs(commitsDir)
    val lock = new HPath(commitsDir, ".lock")
    val owner = java.util.UUID.randomUUID().toString
    val content =
      s"pid=${ProcessHandle.current().pid()}\nowner=$owner\n"
        .getBytes("UTF-8")
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      acquired = tryCreateLock(f, lock, content)
      if (!acquired) {
        val st =
          try Some(f.getFileStatus(lock))
          catch { case _: java.io.FileNotFoundException => None }
        st match {
          case Some(s) if System.currentTimeMillis() - s.getModificationTime
              >= staleMs =>
            // no heartbeat for a whole stale window: presumed-dead holder.
            // Rename-then-delete so a racing waiter can't double-break
            // (its rename fails once the source moved)
            val broken = new HPath(commitsDir,
              s".lock.broken.${System.nanoTime()}")
            if (f.rename(lock, broken)) f.delete(broken, false)
          case Some(_) =>
            if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"writer lock $lock is held (another writer on $path); " +
                  "waited spark.graft.index.lockWaitMs — raise it, or " +
                  "remove the file if its holder is known dead")
            Thread.sleep(100L)
          case None => () // released between our create and stat: retry now
        }
      }
    }
    val hb = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, s"graft-lock-heartbeat-$owner")
        t.setDaemon(true); t
      })
    hb.scheduleAtFixedRate(() => {
      // refresh ONLY a lock we still own — never a successor's after a
      // (wrong) break; any failure here is tolerable (a missed beat), the
      // stale window is many periods wide
      try if (lockOwner(f, lock).contains(owner)) {
        try f.setTimes(lock, System.currentTimeMillis(), -1)
        catch {
          case _: UnsupportedOperationException | _: java.io.IOException =>
            // filesystems without setTimes (some object stores): refresh
            // by rewriting the lock content — still owner-checked above,
            // and the stale window is many periods wide, so the
            // overwrite-vs-break race is both tiny and self-healing (the
            // loser's commit is no-overwrite)
            val out = f.create(lock, true)
            try out.write(content) finally out.close()
        }
      } catch { case _: Throwable => () }
    }, hbMs, hbMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body finally {
      hb.shutdownNow()
      if (lockOwner(f, lock).contains(owner)) f.delete(lock, false)
    }
  }

  /** Atomic create-no-overwrite of the lock file: nio `CREATE_NEW`
    * (O_CREAT|O_EXCL — kernel-atomic) on the local scheme, Hadoop
    * `create(overwrite=false)` elsewhere (atomic on HDFS; conditional
    * create on object stores). */
  private def tryCreateLock(f: FileSystem, lock: HPath,
      content: Array[Byte]): Boolean =
    try {
      if (f.getScheme == "file") {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(lock.toUri.getPath), content,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        ()
      } else {
        val out = f.create(lock, false)
        try out.write(content) finally out.close()
      }
      true
    } catch { case _: java.io.IOException => false }

  /** The `owner=` nonce of the current lock file, None if absent/unreadable
    * (a missing file, a mid-break rename, a pre-nonce lock). */
  private def lockOwner(f: FileSystem, lock: HPath): Option[String] =
    try {
      val st = f.getFileStatus(lock)
      val in = f.open(lock)
      val bytes = new Array[Byte](st.getLen.toInt)
      try in.readFully(bytes) finally in.close()
      new String(bytes, "UTF-8").linesIterator
        .collectFirst { case l if l.startsWith("owner=") => l.substring(6) }
    } catch { case _: java.io.IOException => None }

  /** The commit point: marker content staged to a dot-file, then published
    * no-overwrite into place — a second writer racing the same sequence
    * number fails here instead of publishing over us. On HDFS the publish
    * is the usual no-overwrite rename; on the LOCAL scheme Hadoop's rename
    * delegates to POSIX rename(2), which silently REPLACES an existing
    * destination, so the publish is a hard LINK instead — link(2) fails
    * with EEXIST, kernel-atomically, restoring the no-overwrite promise
    * (the defense-in-depth behind the writer lock). */
  def commit(m: Manifest, seq: Int): Unit = {
    ManifestLog.failCommitUnder.foreach { prefix =>
      if (path.startsWith(prefix))
        throw new IllegalStateException(
          s"injected crash before commit under $path (test failpoint)")
    }
    val f = fs
    f.mkdirs(commitsDir)
    val name = f"m$seq%06d"
    val tmp = new HPath(commitsDir, s".$name.tmp")
    val dest = new HPath(commitsDir, name)
    val bytes = m.render.getBytes("UTF-8")
    def collision() = new IllegalStateException(
      s"commit collision on $name under $path — concurrent writer? " +
        "(writers must hold the layout lock — see withWriteLock)")
    if (f.getScheme == "file") {
      val tp = java.nio.file.Paths.get(tmp.toUri.getPath)
      val dp = java.nio.file.Paths.get(dest.toUri.getPath)
      // a crashed predecessor's stage is invisible garbage — replace it
      java.nio.file.Files.deleteIfExists(tp)
      java.nio.file.Files.write(tp, bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      try java.nio.file.Files.createLink(dp, tp)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(collision().getMessage, e)
      } finally java.nio.file.Files.deleteIfExists(tp)
    } else {
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      if (!f.rename(tmp, dest)) throw collision()
    }
  }

  /** Delete an UNCOMMITTED relation dir a crashed predecessor left behind
    * (it is invisible by construction — no manifest names it), so a
    * replayed append with the recomputed sequence number can't wedge on
    * `errorifexists`. Call only for a dir id about to be (re)written. */
  def clearOrphan(dir: String): Unit = {
    fs.delete(new HPath(dir), true)
    ()
  }

  /** The dir ids [[vacuum]]-ELIGIBLE under the retention guard: ids some
    * manifest supersedes, restricted to those whose SUPERSEDING commit is
    * at least `spark.graft.index.vacuumRetentionMs` old (default 1h). A
    * reader that planned its scan before the superseding compaction holds
    * the old paths; the age guard gives it the retention window to finish
    * before a (locked) vacuum may unlink them. Set the conf to 0 to
    * vacuum eagerly (tests; a quiesced pipeline). */
  def vacuumEligible(supersededOf: Manifest => Seq[String]): Seq[String] = {
    val retention = IndexConf.strictLong(spark,
      "spark.graft.index.vacuumRetentionMs", default = 3600000L, min = 0L)
    val now = System.currentTimeMillis()
    readWithMtimes()
      .filter { case (_, mtime) => now - mtime >= retention }
      .flatMap { case (m, _) => supersededOf(m) }
      .distinct
  }
}

private[ext] object ManifestLog {
  /** TEST-ONLY failpoint: when set, any [[ManifestLog.commit]] under a
    * path with this prefix throws BEFORE publishing — the
    * post-write-pre-commit crash injection of the store crash-replay
    * property sweep. Scoped by path prefix so nothing outside the
    * injecting spec's temp dir is touched. */
  @volatile private[ext] var failCommitUnder: Option[String] = None
}

/** Strict parsing for the persisted-index session confs — a junk value
  * fails NAMING the conf and its constraint at the call site, instead of
  * an anonymous NumberFormatException from inside a committed append
  * (the `hotDigestCap` rule, shared by every index layout). */
private[ext] object IndexConf {

  def strictInt(spark: SparkSession, key: String, default: Int,
      min: Int): Int = {
    val v = spark.conf.getOption(key).map { s =>
      try s.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be an integer, got '$s'")
      }
    }.getOrElse(default)
    require(v >= min, s"$key must be >= $min, got $v")
    v
  }

  def strictLong(spark: SparkSession, key: String, default: Long,
      min: Long): Long = {
    val v = spark.conf.getOption(key).map { s =>
      try s.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be an integer, got '$s'")
      }
    }.getOrElse(default)
    require(v >= min, s"$key must be >= $min, got $v")
    v
  }
}
