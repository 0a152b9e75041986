package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] sketch, shipped to
  * executors inside the expression (serialized once, deserialized lazily
  * per JVM — the task-closure analogue of a broadcast).
  *
  * This is the probe half of bloom semi-join pruning: build the filter
  * from the small/filtered side (`df.stat.bloomFilter`, a driver-side
  * sketch of bounded size), then drop probe-side rows that cannot match
  * BEFORE they reach the join's shuffle. False positives only (bounded by
  * fpp) — never false negatives — so `prune` keeps join results exact
  * while shuffle volume drops by the probe side's non-matching fraction,
  * which is the whole game when the probe side is the 100 TB fact table.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def mightContain(key: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ExpressionUtils.column(BloomMightContain(ExpressionUtils.expression(key), bos.toByteArray))
  }
}
