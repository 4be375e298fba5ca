package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed aggregator — the
  * FREQUENCY member of the bounded-sketch menu next to HLL++ distinct
  * (`approx_count_distinct`) and GK quantiles (`approx_percentile`):
  * "which tokens/domains dominate this corpus" with a summary whose
  * size is `capacity`, independent of corpus size or vocabulary — the
  * shape whose exact counterpart (a full groupBy over 100 TB of
  * tokens) cannot be bounded.
  *
  * IN  = one item (token, domain, ...);
  * BUF = at most `capacity` (item → counter) entries;
  * OUT = the summary map.
  *
  * Classic Misra–Gries per partition (present → +1; room → insert at
  * 1; full → decrement ALL, dropping zeros), merged by pointwise sum
  * followed by subtracting the (capacity+1)-th largest counter and
  * truncating — the mergeable-summaries merge (Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi, PODS'12), which preserves the MG bound
  * REGARDLESS of merge order: every estimate undercounts its true
  * frequency by at most N/(capacity+1) (N = total items aggregated),
  * estimates never exceed the truth, and any item with true frequency
  * above N/(capacity+1) is present in the summary. Those three
  * inequalities are deterministic even though the exact counter
  * values depend on partitioning — so correctness gates assert the
  * BOUNDS (see `q_heavy_hitters_approx`), never raw sketch values,
  * and the sketch itself stays out of oracled output.
  *
  * Associative + commutative merge → map-side partial aggregation:
  * at 100 TB each partition ships one `capacity`-entry buffer, never
  * its items.
  */
class FreqSketchAgg(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

  require(capacity > 0, s"capacity=$capacity")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
                      item: String): mutable.HashMap[String, Long] = {
    if (item != null) {
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None if buf.size < capacity => buf.update(item, 1L)
        case None => // full: the MG decrement step (amortized O(1))
          buf.mapValuesInPlace((_, v) => v - 1L)
          buf.filterInPlace((_, v) => v > 0L)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter; strictly larger
      // entries survive, so at most `capacity` remain
      val d = a.values.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      a.mapValuesInPlace((_, v) => v - d)
      a.filterInPlace((_, v) => v > 0L)
    }
    a
  }

  override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

/** Merge STORED Misra–Gries summaries (the map columns
  * [[FreqSketchAgg]] materializes to parquet) back into one summary —
  * the aggregator that makes MG a stored-sketch-catalog member next to
  * `hll_union_agg`: per-shard summaries are built once at ingest,
  * stored beside the data, and corpus-wide heavy hitters come from
  * merging the stored maps — no re-scan of shard items, ever.
  *
  * IN  = one stored summary (map<item, counter>);
  * BUF/OUT/merge = exactly [[FreqSketchAgg]]'s (pointwise sum, then
  * subtract the (capacity+1)-th largest and truncate). The
  * mergeable-summaries theorem makes the result carry the SAME bounds
  * as if one sketch had seen every item: undercount-only, error at
  * most N/(capacity+1), all items above that threshold present —
  * where N is the total item count across all merged shards.
  * `capacity` must be >= the stored summaries' capacity or the error
  * bound degrades to the smaller capacity's. */
class FreqSketchMergeAgg(capacity: Int)
    extends Aggregator[Map[String, Long], mutable.HashMap[String, Long], Map[String, Long]] {

  require(capacity > 0, s"capacity=$capacity")
  private val inner = new FreqSketchAgg(capacity)

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
                      summary: Map[String, Long]): mutable.HashMap[String, Long] =
    if (summary == null) buf
    else inner.merge(buf, mutable.HashMap.from(summary))

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    inner.merge(a, b)

  override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
