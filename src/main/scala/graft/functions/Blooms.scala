package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a STRING column as a codegen'd
  * expression (no UDF wall): the filter rides the serialized expression
  * tree to executors — the explicit form of the runtime-filter pruning
  * Spark's optimizer injects for large shuffle joins, usable where we
  * build the filter from a DIFFERENT relation than the join's probe
  * side (delta fingerprints pruning the history exchange in
  * incremental dedup). May return false positives (the join stays
  * exact), never false negatives. Probes UTF-8 bytes — the same
  * encoding `BloomFilter.putString` hashes. */
case class BloomMightContain(child: Expression, bf: BloomFilter) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((Boolean) $ref.nullSafeEval($c)).booleanValue();")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Long-keyed sibling of [[BloomMightContain]]: probes the filter with
  * the raw 64-bit key (`BloomFilter.putLong` hashing), the natural form
  * for integer join keys — no string round-trip in the hot path. Same
  * contract: false positives allowed (a downstream exact join removes
  * them), false negatives never. */
case class BloomMightContainLong(child: Expression, bf: BloomFilter) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContainLong", this,
      classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.bf().mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Blooms {
  import org.apache.spark.sql.GraftSqlBridge

  def mightContain(c: Column, bf: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(c), bf))

  def mightContainLong(c: Column, bf: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContainLong(GraftSqlBridge.expression(c), bf))
}
