package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator (the UDAF surface SURVEY §2.9 adds beyond
  * the reference): merges MinHash signatures across rows of a group.
  *
  * IN  = one shingle string;
  * BUF = current per-family minima (md5 hex segments, same
  *       construction as graft.ext.Dedup.minhashSignatures — one md5
  *       per shingle, four 32-bit hex segments per digest block);
  * OUT = the group's signature.
  *
  * Associative + commutative min-merge → Spark executes it with
  * map-side partial aggregation, so a group's signature at 100 TB
  * shuffles one buffer per partition, never the shingles.
  */
class MinHashAgg(numHashes: Int = 4)
    extends Aggregator[String, Array[String], Seq[String]] {

  private val nBlocks = (numHashes + 3) / 4

  private def digest(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Hex segments for one shingle — identical values to the column
    * form: block 0 = md5(x), block b = md5(b + "|" + x). */
  private def segments(shingle: String): IndexedSeq[String] = {
    val blocks = (0 until nBlocks).map { b =>
      if (b == 0) digest(shingle) else digest(s"$b|$shingle")
    }
    (0 until numHashes).map(i => blocks(i / 4).substring((i % 4) * 8, (i % 4) * 8 + 8))
  }

  override def zero: Array[String] = Array.fill(numHashes)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    if (shingle != null) {
      val seg = segments(shingle)
      var i = 0
      while (i < numHashes) {
        if (buf(i) == null || seg(i) < buf(i)) buf(i) = seg(i)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] = Encoders.kryo[Array[String]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
