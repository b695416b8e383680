package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an `array<string>` token column.
  *
  * Token hash = first 64 bits of md5(token) (hex-parsed, big-endian),
  * matching the portable DuckDB oracle expression in Dedup.d04Sql; bit b
  * of the signature is set iff the +1/-1 vote sum over token-hash bits
  * is positive.
  *
  * The 64-bit signature is the scale-grade variant of [[SimHash32]]:
  * with 4 pigeonhole chunks the chunk width doubles to 16 bits, giving
  * 65,536 buckets per chunk index instead of 256 — the candidate-pair
  * blowup that made the 32-bit version corpus-bound disappears, while
  * hamming ≤ 3 candidate generation stays EXACT (pigeonhole: ≤3 bit
  * flips cannot touch all 4 chunks).
  *
  * Same eval shape as SimHash32: one imperative pass per row,
  * CodegenFallback (a single virtual call around a tight loop; the
  * surrounding plan stays codegen'd).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val tok = arr.get(t, StringType).asInstanceOf[UTF8String].getBytes
      md.reset()
      val d = md.digest(tok)
      // first 16 hex chars == first 8 digest bytes, big-endian; the
      // signed Long wrap is harmless — only the bit pattern is used
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      t += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
