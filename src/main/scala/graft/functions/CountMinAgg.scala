package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * typed Spark `Aggregator` — the point-frequency member of the
  * stored-sketch family next to HLL (distincts, Spark built-in),
  * Misra–Gries ([[FreqSketchAgg]], heavy hitters) and GK quantile
  * points: a `depth × width` counter grid where every update
  * increments one counter per row and a point estimate is the MIN
  * over rows. Guarantees: the estimate NEVER underestimates, and
  * overestimates by at most `ε·N` (ε ≈ e/width) with probability
  * `1 − δ` (δ ≈ exp(−depth)) — and unlike Misra–Gries it answers for
  * ANY key, not just the retained heavy hitters.
  *
  * The sketch is one flat `Array[Long]` of `depth·width` counters
  * (row-major), which is exactly what makes it STORABLE: write the
  * array column per shard, then [[CountMinMergeAgg]] re-merges stored
  * sketches by element-wise sum — appending a shard never re-scans
  * history. Row hashes are `MurmurHash3.stringHash(key, row)` (Scala
  * stdlib, stable across JVMs — the artifact is portable), index =
  * `floorMod(hash, width)`.
  *
  * Size the grid to the budget: `depth·width·8` bytes per group
  * (4×1024 = 32 KiB). The aggregation buffer is fixed-width
  * regardless of corpus size — map-side partials stay bounded. */
class CountMinAgg(depth: Int, width: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 1, s"depth=$depth width=$width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    if (key != null) {
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.slot(key, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    CountMin.add(a, b)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Merge STORED Count-Min sketches (the `Array[Long]` columns
  * [[CountMinAgg]] wrote) by element-wise sum — the linearity property
  * that makes the sketch a mergeable shard summary. All inputs must
  * share the same (depth, width); a length mismatch throws loudly. */
class CountMinMergeAgg(depth: Int, width: Int)
  extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 1, s"depth=$depth width=$width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], in: Seq[Long]): Array[Long] = {
    if (in != null) {
      require(in.length == buf.length,
        s"CountMinMergeAgg: stored sketch has ${in.length} counters, " +
          s"expected depth*width = ${buf.length}")
      var i = 0
      val it = in.iterator
      while (it.hasNext) { buf(i) += it.next(); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    CountMin.add(a, b)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {
  /** Row-`r` counter slot for `key`: stable MurmurHash3 string hash
    * seeded by the row index. */
  def slot(key: String, r: Int, width: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(key, r), width)

  private[functions] def add(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length,
      s"CountMin: cannot merge grids of ${a.length} and ${b.length} counters")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Point-frequency estimate: min over rows — never below the true
    * count, at most `ε·N` above it. */
  def estimate(sketch: Seq[Long], key: String, depth: Int, width: Int): Long = {
    require(sketch.length == depth * width,
      s"CountMin.estimate: ${sketch.length} counters, expected ${depth * width}")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch(r * width + slot(key, r, width))
      if (v < best) best = v
      r += 1
    }
    best
  }
}
