package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap grouped top-k as a typed Aggregator (SURVEY §2.3
  * preference (b): expression/aggregate level, no custom plan node).
  *
  * The window row_number formulation of grouped top-k shuffles EVERY
  * row to its group's reducer before ranking. This aggregate keeps at
  * most k rows per (group, partition) in the partial buffer, so the
  * shuffle carries ≤ k·partitions rows per group — at 100 TB that's
  * the difference between shuffling the fact table and shuffling
  * kilobytes. Deterministic total order: (sortKey desc, id1 asc,
  * id2 asc) — identical tie semantics to the window+row_number form,
  * so both produce byte-identical results (asserted in TopKAggSpec and
  * by sharing q_topk_group's oracle rows).
  */
object TopKAgg {

  /** One ranked row: sort key (desc) + two tiebreak ids (asc). */
  case class Entry(sortKey: Double, id1: Long, id2: Int)

  private val ord: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.sortKey, e.id1, e.id2))

  class TopK(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    override def zero: Seq[Entry] = Vector.empty

    private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] = {
      // buf is sorted ascending by ord; bounded at k
      if (buf.size >= k && ord.gteq(e, buf.last)) buf
      else {
        val i = buf.indexWhere(b => ord.lt(e, b)) match {
          case -1 => buf.size
          case x => x
        }
        val grown = (buf.take(i) :+ e) ++ buf.drop(i)
        if (grown.size > k) grown.take(k) else grown
      }
    }

    override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] = insert(buf, e)
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Untyped column form for use in `df.groupBy(...).agg(...)`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopK(k))
}
