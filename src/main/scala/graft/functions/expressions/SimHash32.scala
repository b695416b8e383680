package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash over an `array<string>` token column.
  *
  * Token hash = first 32 bits of md5(token) (hex-parsed), matching the
  * portable DuckDB oracle expression in Dedup.d04Sql exactly; bit b of
  * the signature is set iff the +1/-1 vote sum over token-hash bits is
  * positive.
  *
  * A single imperative eval per row replaces the 32-lambda interpreted
  * HOF pipeline (arrays of per-bit aggregates) — same values, ~20×
  * faster. CodegenFallback: one virtual call per row around a tight
  * loop; the surrounding plan stays codegen'd.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val tok = arr.get(t, StringType).asInstanceOf[UTF8String].getBytes
      md.reset()
      val d = md.digest(tok)
      // first 8 hex chars == first 4 digest bytes, big-endian unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 32) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      t += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
