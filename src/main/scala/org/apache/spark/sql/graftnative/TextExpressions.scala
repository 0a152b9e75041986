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

/** THE definition of the imperative portable hash: first 15 hex chars
  * (60 bits) of an md5 digest as a positive long — the byte-level twin of
  * `graft.ext.Dedup.portableHash64`'s SQL form. Every imperative site
  * (winnowing, the multimodal featurizer) must go through this one
  * helper so the cross-engine bit contract lives in exactly one place.
  */
object PortableMd5 {
  def prefix60(digest: Array[Byte]): Long = {
    var acc = 0L
    var j = 0
    while (j < 15) {
      val v = digest(j / 2) & 0xff
      acc = (acc << 4) | (if (j % 2 == 0) v >>> 4 else v & 0xf)
      j += 1
    }
    acc
  }
}

/** Winnowing fingerprints (MOSS-style) in ONE imperative pass per row:
  * md5-derived 60-bit hashes of every character k-gram, window-of-w
  * minima via a monotonic deque, distinct in first-occurrence order.
  *
  * Exact drop-in for the HOF formulation
  * (`TextStats.kgramHashes(portable=true)` + `TextStats.winnow`) — the
  * hash is the same "first 15 hex chars of md5" value
  * ([[graft.ext.Dedup.portableHash64]]), computed over the UTF-8 bytes of
  * each code-point k-gram, so DuckDB still reproduces every fingerprint
  * bit-for-bit. The HOF version walks an interpreted expression tree per
  * gram and copies an O(w) slice per window (O(n·w) array traffic per
  * doc); this runs the whole doc in O(n) primitive JVM work, which is
  * what makes fingerprinting a scan-speed operation at corpus scale.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    // code-point start offsets (UTF-8 continuation bytes are 10xxxxxx):
    // gram i covers bytes [off(i), off(i+k)) — identical to substr() on
    // code points in both engines
    var nCp = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) nCp += 1
      b += 1
    }
    val off = new Array[Int](nCp + 1)
    var cp = 0
    b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { off(cp) = b; cp += 1 }
      b += 1
    }
    off(nCp) = bytes.length

    val nGrams = nCp - k + 1
    if (nGrams < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])

    val md = mdLocal.get()
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, off(i), off(i + k) - off(i))
      grams(i) = PortableMd5.prefix60(md.digest())
      i += 1
    }

    // monotonic deque of indices: head is the min of the current window;
    // ties keep the EARLIEST index (strict > eviction), matching
    // array_min/list_min over a slice
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nGrams) {
      while (tail > head && grams(deque(tail - 1)) > grams(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(grams(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(text), k, w))
}
