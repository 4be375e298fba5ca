package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic publish for parquet outputs without a table format: every
  * write lands in a FRESH version directory, and a one-line manifest
  * file flips readers to it with an atomic rename. Readers therefore
  * never observe a half-written directory; a writer that crashes
  * mid-write leaves the previous version live; and old versions stay
  * on disk until explicitly vacuumed (time-travel-lite). This is the
  * overwrite discipline `mode("overwrite")` does NOT give on a plain
  * directory (it deletes before it writes), and the closest honest
  * stand-in for transactional table formats in this parquet-only
  * environment.
  */
object Publish {

  private val Manifest = "_MANIFEST"

  /** Write `df` as a new version of `tableDir` and atomically flip the
    * manifest to it. Returns the version directory written. */
  def write(df: DataFrame, tableDir: String): String = {
    Files.createDirectories(Paths.get(tableDir))
    val version = "v_" + java.util.UUID.randomUUID().toString.take(12)
    val vdir = s"$tableDir/$version"
    df.write.parquet(vdir)
    val tmp = Paths.get(tableDir, s".$Manifest.tmp.$version")
    Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(tableDir, Manifest),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    vdir
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

  /** Delete every version except the published one (crashed writers'
    * orphans and superseded history). Returns the removed names. */
  def vacuum(tableDir: String): Seq[String] = {
    val keep = currentVersion(tableDir)
    versions(tableDir).filterNot(keep.contains).map { v =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(s"$tableDir/$v"))
      v
    }
  }
}
