package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: the 8 minhashes of a document's word
  * k-shingles, derived from one seeded sha256 digest per shingle, in a
  * single tight loop over the TOKEN array.
  *
  * Semantically identical to the pure-expression form the DuckDB oracle
  * uses (and MinhashSlicesSpec pins):
  *   sh = transform(sequence(1, size(toks)-k+1),
  *          i -> concat_ws(' ', toks[i..i+k-1]))
  *   array_min(transform(sh, s -> substring(sha2(concat(seed,':',s),256), i*8+1, 8)))
  * for i = 0..7 — but evaluated as one JVM pass per row: the shingle
  * bytes stream straight into the digest (token bytes + ' ' separators,
  * no shingle strings materialized), minima are tracked as unsigned
  * 32-bit ints (fixed-width hex string order == unsigned numeric
  * order), and hex is rendered only for the 8 winners. The HOF version
  * walks an interpreted expression tree per array element and allocates
  * |shingles| strings + 16·|shingles| slices per doc; this allocates 8
  * strings per doc.
  *
  * Rows with fewer than k tokens (no shingles) yield null, matching
  * array_min over an empty transform. Null tokens are treated as
  * absent (the tokenizer never produces them).
  */
case class MinhashSlices(child: Expression, seed: Int, shingleK: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_slices"
  override def nullable: Boolean = true // < k tokens ⇒ null, even for non-null input

  /** Not CodegenFallback: generated code calls straight into the JVM
    * loop below, so the surrounding operators stay inside one
    * WholeStageCodegen span (a fallback would wall off the stage and
    * interpret every OTHER expression in the projection too). */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSlices", this, classOf[MinhashSlices].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = $ref.nullSafeEval($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
    """)
  }

  private val prefix: Array[Byte] = s"$seed:".getBytes("UTF-8")
  private val space: Array[Byte] = Array(' '.toByte)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < shingleK) return null
    val mins = Array.fill(8)(0xFFFFFFFFL + 1) // > any u32
    val md = MessageDigest.getInstance("SHA-256")
    val toks = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      toks(t) = if (arr.isNullAt(t)) Array.emptyByteArray else arr.getUTF8String(t).getBytes
      t += 1
    }
    var i = 0
    val last = n - shingleK
    while (i <= last) {
      md.reset()
      md.update(prefix)
      var j = 0
      while (j < shingleK) {
        if (j > 0) md.update(space)
        md.update(toks(i + j))
        j += 1
      }
      val d = md.digest()
      var s = 0
      while (s < 8) {
        val v = ((d(4 * s) & 0xffL) << 24) | ((d(4 * s + 1) & 0xffL) << 16) |
          ((d(4 * s + 2) & 0xffL) << 8) | (d(4 * s + 3) & 0xffL)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => UTF8String.fromString(f"$v%08x").asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSlices {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column wrapper over a TOKEN array: 8-element array<string> of
    * 8-hex minhashes of the k-shingles. */
  def minhashSlices(tokens: Column, seed: Int, shingleK: Int = 3): Column =
    GraftSqlBridge.column(MinhashSlices(GraftSqlBridge.expression(tokens), seed, shingleK))
}
