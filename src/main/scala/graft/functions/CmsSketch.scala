package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as an AGGREGATION BUFFER (SURVEY §2.3 preference
  * (b): expression/aggregate level) — the d×w counter matrix IS the
  * aggregate state, updated in one pass over the keyed stream.
  *
  * The explode formulation (d rows per key into a (row, bucket)
  * group-by) materializes d·N generator rows before the partial
  * aggregate — at sf10 that is 104 M rows and 55 s of pure Generate
  * cost for a 16384-cell result. This aggregate emits NOTHING per row:
  * each input key hashes into d buffer increments, partials are one
  * 128 KB array per partition, and the merge is element-wise addition
  * — the canonical mergeable-sketch shape that holds at any scale
  * (10k partials at 100 TB tree-merge exactly the same way).
  *
  * Hashing is bit-identical to [[graft.text.TextOps.cmsBuckets]]
  * (row r's bucket = hex chars [3r, 3r+3) of md5("cms:"||key), i.e.
  * `conv(substring(md5(...), 1+3r, 3), 16, 10)`), so the DuckDB oracle
  * and the probe side reproduce the same cells without change.
  */
object CmsSketch {

  /** d·w long counters, laid out row-major: cell (r, b) = buf(r*w+b).
    * w is fixed at 4096 (one 12-bit / 3-hex-char digest slice per
    * row); d ≤ 10 rows fit one 128-bit digest. */
  class Cms(d: Int, w: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    require(w == 4096, "bucket width is pinned to one 3-hex-char digest slice")
    require(d >= 1 && 3 * d <= 32, "d rows must fit the 32-hex-char md5 digest")

    @transient private lazy val md = MessageDigest.getInstance("MD5")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(buf: Array[Long], key: String): Array[Long] = {
      if (key != null) {
        val digest = md.digest(("cms:" + key).getBytes("UTF-8"))
        def nib(i: Int): Int = {
          val b = digest(i >> 1)
          if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
        }
        var r = 0
        while (r < d) {
          val h = 3 * r
          buf(r * w + ((nib(h) << 8) | (nib(h + 1) << 4) | nib(h + 2))) += 1L
          r += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Column form: `df.agg(cmsSketch(d, 4096)(col("key")))` → one
    * array<bigint> row of d·4096 cells. */
  def cmsSketch(d: Int, w: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udaf(new Cms(d, w))
}
