package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array, computed per row in one pass.
  *
  * Replaces the explode + 64-conditional-sum aggregation formulation: no
  * shuffle at all (the whole simhash computation is a narrow projection),
  * no 64-column codegen blow-up, and tokens never leave the row. Hash =
  * FNV-1a over UTF-8 bytes + murmur fmix64 avalanche; bit i of the result
  * is the sign of the +-1 vote sum across tokens (ties -> 0).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val bytes = arr.getUTF8String(t).getBytes
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) {
          h ^= (bytes(i) & 0xffL)
          h *= 0x100000001b3L
          i += 1
        }
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
        h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
        h ^= h >>> 33
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))
}
