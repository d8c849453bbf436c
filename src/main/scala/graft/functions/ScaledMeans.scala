package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact element-wise means of a double-array column as ONE aggregate
  * (buffer = per-element scaled-long sums + count), replacing the
  * posexplode → (group, pos) groupBy → collect_list reassembly chain:
  * that form materializes N·dim generator rows per mean recompute
  * (12.8 M rows per Lloyd round at sf10 — the same Generate cost class
  * the CMS build had) to produce k·dim cells.
  *
  * Arithmetic is bit-identical to [[graft.ops.Exact.scaledMean]]
  * (`sum(round(x * 1e9) :: long) :: double / 1e9 / count`): scaling
  * uses the same double multiply, rounding replicates Spark's
  * `round()` on doubles (BigDecimal.valueOf → setScale(0, HALF_UP) →
  * toDouble) then the ANSI double→long truncation, sums are exact
  * longs, and the final division order matches. Any drift would break
  * the q_kmeans / q_sim_ivf / q_sim_pq* oracle hashes — pinned in
  * VectorMathSpec against the posexplode form on the full corpus.
  *
  * `start`/`len` select the [start, start+len) element window (the PQ
  * subspace case); len < 0 means the whole array. */
object ScaledMeans {

  private[functions] def roundScaled(x: Double): Long =
    JBigDecimal.valueOf(x * 1e9).setScale(0, RoundingMode.HALF_UP).doubleValue().toLong

  /** Buffer layout: [count, sum_0, ..., sum_{len-1}]; empty array until
    * the first row fixes the width. */
  class Means(start: Int, len: Int) extends Aggregator[Seq[Double], Array[Long], Seq[Double]] {

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf0: Array[Long], v: Seq[Double]): Array[Long] = {
      if (v == null) return buf0
      val w = if (len < 0) v.length else len
      if (v.length < start + w)
        throw new IllegalArgumentException(
          s"scaledMeans(start=$start, len=$len): vector has ${v.length} elements, " +
            s"needs at least ${start + w}")
      val buf = if (buf0.isEmpty) new Array[Long](w + 1) else buf0
      if (buf.length != w + 1)
        throw new IllegalArgumentException(
          s"scaledMeans: ragged vector column — buffer width ${buf.length - 1} " +
            s"fixed by an earlier row, this row has $w summable elements")
      buf(0) += 1L
      var i = 0
      while (i < w) {
        buf(i + 1) += roundScaled(v(start + i))
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      if (a.length != b.length)
        throw new IllegalArgumentException(
          s"scaledMeans: ragged vector column — partial buffers of width " +
            s"${a.length - 1} and ${b.length - 1} cannot merge")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Double] = {
      if (buf.isEmpty) return Seq.empty
      val n = buf(0)
      (1 until buf.length).map(i => buf(i).toDouble / 1e9 / n)
    }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: `df.groupBy(k).agg(scaledMeans(0, -1)(col("v")))`. */
  def scaledMeans(start: Int, len: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udaf(new Means(start, len))
}
