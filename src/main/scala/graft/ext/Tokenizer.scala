package graft.ext

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Tokenizer ARTIFACT handling — the piece that turns a trained BPE
  * merge list into something a training job can ship: a single
  * versioned text file, written atomically, loaded back bit-exact.
  * Merge lists are driver data by construction (bounded at vocab
  * size, the same class as centroids and frozen-LM models), so the
  * artifact write is plain file IO — no Spark job, no part files.
  *
  * Format (`graft-bpe v1`):
  * {{{
  * graft-bpe\tv1\t<n_merges>
  * <left>\t<right>\t<pair_count>
  * ...
  * }}}
  * Symbols come from whitespace-split tokens, so neither side can
  * contain a tab or newline — the separator is unambiguous by
  * construction. Line order IS merge order (BPE apply is
  * order-sensitive); the count column is provenance only.
  *
  * The write lands under a temp name and moves into place atomically
  * — a crashed writer leaves either the old artifact or none, never a
  * truncated merge list silently mis-tokenizing a corpus.
  */
object Tokenizer {

  private val Magic = "graft-bpe"
  private val Version = "v1"

  /** Atomically write `merges` (training order) to `path`. */
  def saveMerges(merges: Seq[(String, String, Long)], path: String): Unit = {
    merges.foreach { case (l, r, _) =>
      require(l.nonEmpty && r.nonEmpty && !l.exists(_.isWhitespace) &&
        !r.exists(_.isWhitespace), s"unencodable merge pair ($l, $r)")
    }
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val lines = s"$Magic\t$Version\t${merges.size}" +:
      merges.map { case (l, r, n) => s"$l\t$r\t$n" }
    val tmp = p.resolveSibling(s".${p.getFileName}.tmp")
    Files.write(tmp, lines.asJava, StandardCharsets.UTF_8)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Load a merge list saved by [[saveMerges]]. Fails loudly on a
    * foreign file, version mismatch, or a merge count that does not
    * match the header (a torn or concatenated artifact). */
  def loadMerges(path: String): Seq[(String, String, Long)] = {
    val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8)
      .asScala.toSeq
    val header = lines.headOption.getOrElse(
      throw new IllegalStateException(s"empty tokenizer artifact $path"))
    header.split("\t", -1) match {
      case Array(Magic, Version, n) =>
        val merges = lines.tail.map { ln =>
          ln.split("\t", -1) match {
            case Array(l, r, c) => (l, r, c.toLong)
            case _ => throw new IllegalStateException(
              s"malformed merge line in $path: '$ln'")
          }
        }
        if (merges.size != n.toInt) throw new IllegalStateException(
          s"torn artifact $path: header says $n merges, found ${merges.size}")
        merges
      case Array(Magic, v, _) => throw new IllegalStateException(
        s"unsupported tokenizer artifact version $v in $path")
      case _ => throw new IllegalStateException(
        s"not a graft-bpe artifact: $path ('$header')")
    }
  }
}
