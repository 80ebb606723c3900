package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap top-k aggregation — the scale-first replacement for the
 * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` idiom.
 *
 * The window form SORTS AND SHUFFLES every row of every group; this
 * `Aggregator` keeps at most k (value, id) pairs per partial state, so
 * map-side combine reduces each partition to k rows per group BEFORE the
 * exchange — at 10^12 rows the shuffle carries O(groups x k x
 * partitions-touched) rows instead of O(rows). Order is total
 * (value DESC, id ASC tiebreak), so the result is deterministic and an
 * independent SQL window replays it exactly.
 *
 * State is a descending-sorted list bounded at k: `reduce` is an
 * insertion into a <=k list, `merge` a bounded merge of two sorted
 * lists — O(k) each, allocation-light at the k this is meant for
 * (leaderboards / per-group exemplars, k <= a few hundred).
 */
object TopK {

  /** Boxed fields so null value/id columns reach `reduce` (which skips
   * them — SQL aggregates ignore nulls) instead of failing the typed
   * input encoder with a non-nullable-field error. */
  final case class In(v: java.lang.Long, id: java.lang.Long)
  final case class Entry(v: Long, id: Long)
  final case class Buf(items: List[Entry])
  final case class Out(items: Seq[Entry])

  /** Descending by v, ascending id as the deterministic tiebreak. */
  private def beats(a: Entry, b: Entry): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  final class TopKAgg(k: Int) extends Aggregator[In, Buf, Out] {
    require(k > 0)
    def zero: Buf = Buf(Nil)

    def reduce(buf: Buf, raw: In): Buf = {
      if (raw == null || raw.v == null || raw.id == null) return buf
      val in = Entry(raw.v, raw.id)
      val b = buf.items
      if (b.lengthCompare(k) >= 0 && !beats(in, b.last)) buf
      else {
        val (hi, lo) = b.span(beats(_, in))
        Buf((hi ::: in :: lo).take(k))
      }
    }

    def merge(a: Buf, b: Buf): Buf = {
      val out = List.newBuilder[Entry]
      var (x, y, n) = (a.items, b.items, 0)
      while (n < k && (x.nonEmpty || y.nonEmpty)) {
        if (y.isEmpty || (x.nonEmpty && beats(x.head, y.head))) {
          out += x.head; x = x.tail
        } else { out += y.head; y = y.tail }
        n += 1
      }
      Buf(out.result())
    }

    def finish(r: Buf): Out = Out(r.items)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}
