package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic publish for parquet outputs without a table format: every
  * write lands in a FRESH version directory, and a one-line manifest
  * file flips readers to it with an atomic rename. Readers therefore
  * never observe a half-written directory; a writer that crashes
  * mid-write leaves the previous version live; and old versions stay
  * on disk until explicitly vacuumed. This is the overwrite
  * discipline `mode("overwrite")` does NOT give on a plain directory
  * (it deletes before it writes), and the closest honest stand-in for
  * transactional table formats in this parquet-only environment.
  *
  * Each successful publish ALSO claims the next ordinal in a
  * `_commits/` log (`00000001`, `00000002`, ... — one file per
  * commit, each holding its version-directory name, claimed with an
  * atomic no-replace move so two racing writers serialize instead of
  * clobbering — the optimistic-concurrency discipline of
  * log-structured table formats). The ordered log is what TIME TRAVEL
  * reads: [[readVersion]] resolves commit N whether or not later
  * commits (or the manifest) have moved on, and [[history]] lists the
  * commit sequence. `AS OF` semantics without a table format, priced
  * honestly: history costs disk until [[vacuum]].
  */
object Publish {

  private val Manifest = "_MANIFEST"
  private val CommitsDir = "_commits"

  /** The exclusive-creation primitive behind commit-ordinal claims:
    * atomically publish `content` at `path` IFF nothing exists there.
    * `true` = this caller won the claim; `false` = the path was
    * already claimed (by anyone, at any time). Implementations must
    * be all-or-nothing: a reader that can see the path sees the FULL
    * content — never a partial write.
    *
    * This is the one storage capability the publish protocol needs
    * beyond plain writes, isolated here so the backend is swappable:
    *  - POSIX (shipped): [[PosixLinkClaim]] — hard link from a
    *    fully-written temp file; link(2) fails EEXIST atomically.
    *  - S3 (mapping documented; no SDK in this environment):
    *    `PutObject` with `If-None-Match: *` — HTTP 412 = claim lost.
    *  - GCS: `objects.insert` with `ifGenerationMatch=0` — 412 =
    *    claim lost.
    * All three give identical win/lose semantics, so [[write]] and
    * the ordinal loop in `commit` are backend-independent. */
  trait CommitClaim {
    def claim(path: String, content: Array[Byte]): Boolean
  }

  /** POSIX claim: write a temp file COMPLETELY, then hard-link it to
    * the claim path. link(2) atomically fails with EEXIST when the
    * target exists (unlike rename(2), which silently REPLACES), and
    * the linked file carries its full content the instant the path
    * appears. */
  object PosixLinkClaim extends CommitClaim {
    def claim(path: String, content: Array[Byte]): Boolean = {
      val p = Paths.get(path)
      val tmp = Files.write(
        p.resolveSibling(s".claim.${java.util.UUID.randomUUID().toString.take(12)}"),
        content)
      try {
        Files.createLink(p, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally {
        Files.deleteIfExists(tmp); ()
      }
    }
  }

  /** Write `df` as a new version of `tableDir`, claim the next commit
    * ordinal, and atomically flip the manifest to it. Returns the
    * version directory written. */
  def write(df: DataFrame, tableDir: String,
            claimer: CommitClaim = PosixLinkClaim): String = {
    Files.createDirectories(Paths.get(tableDir))
    val version = "v_" + java.util.UUID.randomUUID().toString.take(12)
    val vdir = s"$tableDir/$version"
    df.write.parquet(vdir)
    commit(tableDir, version, claimer)
    flipManifest(tableDir, version)
    vdir
  }

  private def flipManifest(tableDir: String, version: String): Unit = {
    val tmp = Paths.get(tableDir, s".$Manifest.tmp.$version")
    Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(tableDir, Manifest),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Claim the next free ordinal for `version` through the
    * backend-independent [[CommitClaim]] primitive: a concurrent
    * writer that took ordinal N forces this one to N+1 — commits
    * serialize, never overwrite. Returns the ordinal claimed.
    * `private[graft]` so the crash-recovery spec can commit WITHOUT
    * flipping the manifest (the kill-between-steps scenario). */
  private[graft] def commit(tableDir: String, version: String,
                            claimer: CommitClaim = PosixLinkClaim): Long = {
    val dir = Paths.get(tableDir, CommitsDir)
    Files.createDirectories(dir)
    val content = version.getBytes(StandardCharsets.UTF_8)
    var n = history(tableDir).lastOption.map(_._1).getOrElse(0L) + 1L
    while (!claimer.claim(dir.resolve(f"$n%08d").toString, content))
      n += 1L
    n
  }

  /** Reconcile the manifest CACHE with the durable commit log — the
    * crash-recovery step for a writer killed between its commit claim
    * and its manifest flip. Every claimed ordinal points at a fully
    * written version directory (the claim happens strictly after the
    * parquet write completes), so the torn state is merely a STALE
    * manifest: readers still resolve the previous version, and this
    * call completes the interrupted publish by flipping to the
    * latest committed version. Idempotent; returns the version
    * flipped to, or None when the manifest was already current (or
    * the log is empty). */
  def recover(tableDir: String): Option[String] = {
    history(tableDir).lastOption.map(_._2) match {
      case Some(latest) if !currentVersion(tableDir).contains(latest) =>
        flipManifest(tableDir, latest)
        Some(latest)
      case _ => None
    }
  }

  /** The committed (ordinal, version-directory) sequence, oldest
    * first. Commits are the durable record — the manifest only caches
    * the latest. */
  def history(tableDir: String): Seq[(Long, String)] = {
    val d = new java.io.File(s"$tableDir/$CommitsDir")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.matches("\\d{8}"))
      .map(f => f.getName.toLong -> new String(
        Files.readAllBytes(f.toPath), StandardCharsets.UTF_8).trim)
      .sortBy(_._1).toSeq
  }

  /** Time travel: read the table AS OF commit `ordinal` (1-based, as
    * listed by [[history]]), regardless of how many commits or
    * manifest flips happened since. */
  def readVersion(spark: SparkSession, tableDir: String,
                  ordinal: Long): DataFrame = {
    val v = history(tableDir).collectFirst { case (`ordinal`, ver) => ver }
      .getOrElse(throw new IllegalStateException(
        s"no commit $ordinal under $tableDir (history: " +
          s"${history(tableDir).map(_._1).mkString(",")})"))
    if (!Files.exists(Paths.get(tableDir, v)))
      throw new IllegalStateException(
        s"commit $ordinal points at vacuumed version $v")
    spark.read.parquet(s"$tableDir/$v")
  }

  /** The currently-published version directory, if any. */
  def currentVersion(tableDir: String): Option[String] = {
    val m = Paths.get(tableDir, Manifest)
    if (Files.exists(m))
      Some(new String(Files.readAllBytes(m), StandardCharsets.UTF_8).trim)
    else None
  }

  /** Read the currently-published version. */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val v = currentVersion(tableDir).getOrElse(
      throw new IllegalStateException(s"no published version under $tableDir"))
    spark.read.parquet(s"$tableDir/$v")
  }

  /** All version directories on disk, published or not. */
  def versions(tableDir: String): Seq[String] = {
    val d = new java.io.File(tableDir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v_"))
      .map(_.getName).toSeq.sorted
  }

  /** Delete superseded versions and crashed writers' orphans,
    * RETAINING the manifest's version plus the last `keepLast`
    * committed versions — the retention policy that makes time travel
    * a bounded cost instead of unbounded history (Delta's
    * RETAIN-hours analog, counted in commits because this log has no
    * clock). `keepLast = 1` (default) keeps only the latest commit —
    * the pre-time-travel behavior. Uncommitted version dirs (crashed
    * writers) are always removed. Returns the removed names. */
  def vacuum(tableDir: String, keepLast: Int = 1): Seq[String] = {
    require(keepLast >= 1, s"keepLast=$keepLast")
    val retained = history(tableDir).takeRight(keepLast).map(_._2).toSet ++
      currentVersion(tableDir)
    versions(tableDir).filterNot(retained).map { v =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(s"$tableDir/$v"))
      v
    }
  }
}
