package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Bpe

/** BPE subword counting over whole-document text in one JVM pass: split
  * on single spaces, greedy-merge-encode each word against the carried
  * merge-rank table, and emit counts. The merge table is a constructor
  * argument (a tiny model artifact) — it ships inside the serialized
  * expression exactly like a broadcast, so the scan stays a narrow
  * no-shuffle pass with NO join against a vocab table at run time.
  *
  * Per-partition word→count memoization makes the steady-state cost one
  * hash lookup per word (natural-language vocabularies repeat heavily);
  * the miss path is the standard greedy lowest-rank merge loop.
  */
trait BpeBase { self: UnaryExpression =>
  def merges: Seq[(String, String)]

  @transient protected lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  @transient protected lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  protected def countWord(w: String): Long = {
    val hit = cache.get(w)
    if (hit != null) hit.longValue()
    else {
      val n = Bpe.encode(w, ranks).length.toLong
      cache.put(w, java.lang.Long.valueOf(n))
      n
    }
  }
}

/** Total subword count of a text column (BIGINT). */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with BpeBase {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenCount", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var total = 0L
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        total += countWord(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-word subword counts of a text column (ARRAY<BIGINT>, one element
  * per whitespace word, order preserved) — the building block for
  * subword-budget chunking, where downstream needs the cumulative count
  * at each word position. */
case class BpeWordCounts(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with BpeBase {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_word_counts"

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeWordCounts", this, classOf[BpeWordCounts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        out += countWord(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** TRAINING-side tokenization state: split a word to characters, then
  * apply the carried merges sequentially in rank order (merge 0
  * everywhere, then merge 1, ...) — exactly how the vocabulary evolves
  * during BPE training, and exactly what round k's pair counting must
  * see. Distinct from encode's lowest-rank-first greedy loop
  * ([[BpeBase.countWord]]): training replays history, encode uses the
  * finished rank table. Carried merges are a broadcast-sized model
  * artifact riding in the expression; the pass is narrow (no shuffle,
  * no join). */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_apply_merges"

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplyMerges", this, classOf[BpeApplyMerges].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    var syms = word.map(_.toString).toVector
    var i = 0
    while (i < merges.length && syms.length > 1) {
      syms = Bpe.mergePair(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    new GenericArrayData(syms.map(s => UTF8String.fromString(s)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeTokenCount(GraftSqlBridge.expression(text), merges))
  def bpeWordCounts(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeWordCounts(GraftSqlBridge.expression(text), merges))
  def bpeApplyMerges(word: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeApplyMerges(GraftSqlBridge.expression(word), merges))
}
