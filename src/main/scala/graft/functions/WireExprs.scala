package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native wire-encoding expressions for the binary codecs.
  *
  * Why (same story as [[VectorExprs]]): a zigzag-varint rendered as a
  * 9-arm CASE of per-byte substr/concat terms is a ~200-node
  * expression tree; seven such fields in one projection put the
  * whole-stage-codegen consume method past the Janino/JIT limit and
  * the heaviest codec ran interpreted (observed: `codec_avro_binary`
  * compile failure, 3.6 s at sf0.1 → 0.9 s with these). Each
  * expression here generates ONE static call around a tiny Java loop —
  * constant-size code at any operand width, byte-identical to the CASE
  * rendering and to the DuckDB oracle SQL.
  */
object WireHex {
  private val HEX = "0123456789ABCDEF".toCharArray

  /** Uppercase hex of the protobuf zigzag varint of a NON-NEGATIVE
    * long (zigzag = 2n; LEB128 7-bit groups, LSB first, continuation
    * high bit on all but the last byte). */
  def zvarintHex(n: Long): UTF8String = {
    var z = n * 2
    val sb = new java.lang.StringBuilder(18)
    var done = false
    while (!done) {
      val low = (z & 0x7fL).toInt
      z = z >>> 7
      val out = if (z == 0L) { done = true; low } else low | 0x80
      sb.append(HEX(out >>> 4)).append(HEX(out & 0xf))
    }
    UTF8String.fromString(sb.toString)
  }

  /** Avro `bytes` body of an unscaled decimal: zigzag-varint length
    * prefix + minimal two's-complement big-endian image (1..8 bytes —
    * truncation to the minimal k IS two's complement). */
  def avroBytesHex(unscaled: Long): UTF8String = {
    var k = 1
    while (k < 8 && !(unscaled >= -(1L << (8 * k - 1)) &&
                      unscaled < (1L << (8 * k - 1)))) k += 1
    val sb = new java.lang.StringBuilder(2 + 2 * k)
    val len = k * 2 // zigzag varint of k<=8 is the single byte 2k
    sb.append(HEX(len >>> 4)).append(HEX(len & 0xf))
    var i = k - 1
    while (i >= 0) {
      val b = ((unscaled >> (8 * i)) & 0xffL).toInt
      sb.append(HEX(b >>> 4)).append(HEX(b & 0xf))
      i -= 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class ZigzagVarintHex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_zvarint_hex"
  override def nullSafeEval(a: Any): Any =
    WireHex.zvarintHex(a.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WireHex.zvarintHex($a)")
  override protected def withNewChildInternal(newChild: Expression): ZigzagVarintHex =
    copy(child = newChild)
}

case class AvroBytesHex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_avro_bytes_hex"
  override def nullSafeEval(a: Any): Any =
    WireHex.avroBytesHex(a.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WireHex.avroBytesHex($a)")
  override protected def withNewChildInternal(newChild: Expression): AvroBytesHex =
    copy(child = newChild)
}

object WireExprs {
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_zvarint_hex"),
      new ExpressionInfo(classOf[ZigzagVarintHex].getName, "graft_zvarint_hex"),
      (children: Seq[Expression]) => ZigzagVarintHex(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_avro_bytes_hex"),
      new ExpressionInfo(classOf[AvroBytesHex].getName, "graft_avro_bytes_hex"),
      (children: Seq[Expression]) => AvroBytesHex(children.head)))
  }

  def zvarintHex(n: Column): Column = call_function("graft_zvarint_hex", n)
  def avroBytesHex(unscaled: Column): Column =
    call_function("graft_avro_bytes_hex", unscaled)
}
