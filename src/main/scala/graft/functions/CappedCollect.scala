package graft.functions

import org.apache.spark.sql.{Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Occurrence-list aggregation with a HARD state bound — the mergeable
  * form of `collect_list(...)` + `HAVING count(*) <= cap` for the
  * substring-dedup anchor pass ([[graft.text.SubstringDedup]]).
  *
  * `collect_list` materializes the full group before any cap filter can
  * drop it, so one boilerplate anchor occurring millions of times
  * builds a multi-MB buffer on whichever task owns that key. This
  * aggregator stops growing at `cap + 1` elements: a buffer that
  * reaches `cap + 1` is already classified (over-cap ⇒ the caller's
  * `size(xs) <= cap` filter drops it), so extra occurrences only need
  * to preserve that fact, not the data. Partials merge with the same
  * truncation — worst-case state per group is `(cap + 1) * 8` bytes at
  * ANY occurrence count, the property that holds at 100 TB.
  *
  * Each occurrence is packed into one long: `doc_id << 21 | pos`
  * (42-bit doc id, 21-bit token position — 2 M-token documents; both
  * asserted). Output order is partition-dependent, callers must not
  * depend on it (the substring pair generation is order-free).
  */
object CappedCollect {

  val PosBits = 21
  val PosMask: Long = (1L << PosBits) - 1L

  class CappedPacked(cap1: Int) extends Aggregator[(Long, Int), Array[Long], Array[Long]] {

    private def append(buf: Array[Long], v: Long): Array[Long] = {
      if (buf.length >= cap1) buf
      else {
        val out = java.util.Arrays.copyOf(buf, buf.length + 1)
        out(buf.length) = v
        out
      }
    }

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], in: (Long, Int)): Array[Long] = {
      val (doc, pos) = in
      require(doc >= 0 && doc < (1L << (63 - PosBits)), s"doc_id $doc overflows 42-bit pack")
      require(pos >= 0 && pos <= PosMask, s"pos $pos overflows 21-bit pack")
      append(buf, (doc << PosBits) | pos.toLong)
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.length >= cap1) a
      else if (b.length >= cap1) b
      else {
        val n = math.min(cap1, a.length + b.length)
        val out = java.util.Arrays.copyOf(a, n)
        var i = a.length
        while (i < n) { out(i) = b(i - a.length); i += 1 }
        out
      }
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Column form: `cappedCollect(cap)(col("doc_id"), col("pos"))` →
    * array<bigint> of packed occurrences, truncated at `cap + 1`
    * elements (length `cap + 1` ⇔ the true count exceeded `cap`). */
  def cappedCollect(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udaf(new CappedPacked(cap + 1))
}
