package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
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

  // ------------------------------------------------------------------
  // consumer side (A53): a real sequential Avro-binary parser over the
  // hex wire form — the decode twin of the encoders above, mirroring
  // the reference decoder surface (pkg/sink/codec/decoder/decoder.go:
  // 24-38 AddKeyValue/HasNext/NextRowChangedEvent)

  /** Cursor-based hex wire parser. Throws on any malformed frame
    * (odd offsets, EOF mid-field, bad hex) — the caller maps that to
    * the corrupt row, exactly as the reference decoder errors. */
  private final class HexParser(s: String) {
    private var pos = 0
    def done: Boolean = pos == s.length
    def byte(): Int = {
      if (pos + 2 > s.length) throw new IllegalArgumentException("EOF")
      val hi = Character.digit(s.charAt(pos), 16)
      val lo = Character.digit(s.charAt(pos + 1), 16)
      if (hi < 0 || lo < 0) throw new IllegalArgumentException("bad hex")
      pos += 2
      (hi << 4) | lo
    }
    def int32(): Int = (byte() << 24) | (byte() << 16) | (byte() << 8) | byte()
    /** zigzag varint → long (LEB128, LSB first). */
    def zvarint(): Long = {
      var shift = 0; var acc = 0L; var b = 0x80
      while ((b & 0x80) != 0) {
        if (shift > 63) throw new IllegalArgumentException("varint overflow")
        b = byte()
        acc |= (b & 0x7fL) << shift
        shift += 7
      }
      (acc >>> 1) ^ -(acc & 1L)
    }
    /** Avro string: varint byte length + UTF-8 bytes. */
    def str(): String = {
      val n = zvarint()
      if (n < 0 || n > (s.length - pos) / 2) throw new IllegalArgumentException("bad len")
      val bytes = new Array[Byte](n.toInt)
      var i = 0
      while (i < n) { bytes(i) = byte().toByte; i += 1 }
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }
    /** Avro union [null, bytes.decimal]: branch varint, then minimal
      * big-endian two's-complement unscaled cents. Null → -1 sentinel
      * (money is non-negative upstream). */
    def money(): Long = zvarint() match {
      case 0L => -1L
      case 1L =>
        val k = zvarint()
        if (k < 1 || k > 8) throw new IllegalArgumentException("bad decimal len")
        var acc = if ((hexPeekSign()) != 0) -1L else 0L
        var i = 0
        while (i < k) { acc = (acc << 8) | byte().toLong; i += 1 }
        acc
      case _ => throw new IllegalArgumentException("bad union branch")
    }
    /** sign bit of the next byte without consuming it (two's-complement
      * sign extension for the minimal big-endian image). */
    private def hexPeekSign(): Int = {
      val hi = Character.digit(s.charAt(pos), 16)
      if (hi < 0) throw new IllegalArgumentException("bad hex")
      hi >>> 3 // top bit of the first nibble = sign bit of the byte
    }
  }

  val KeyStruct: StructType = StructType(Seq(
    StructField("schema_id", LongType, nullable = false),
    StructField("pk", LongType, nullable = false),
    StructField("valid", LongType, nullable = false)))

  val ValueStruct: StructType = StructType(Seq(
    StructField("schema_id", LongType, nullable = false),
    StructField("schema_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("pk", LongType, nullable = false),
    StructField("commit_ts", LongType, nullable = false),
    StructField("before_cents", LongType, nullable = false),
    StructField("after_cents", LongType, nullable = false),
    StructField("valid", LongType, nullable = false)))

  private def corruptKey: InternalRow =
    new GenericInternalRow(Array[Any](-1L, -1L, 0L))
  private def corruptValue: InternalRow =
    new GenericInternalRow(Array[Any](-1L, UTF8String.EMPTY_UTF8,
      UTF8String.EMPTY_UTF8, UTF8String.EMPTY_UTF8, -1L, -1L, -1L, -1L, 0L))

  /** Decode a Confluent-framed Avro key message: magic 0x00 + int32
    * schema id + {pk: long}. valid=1 iff the frame parses and is fully
    * consumed (the same whole-message bounds invariant as the craft
    * decoder). */
  def avroDecodeKey(hexU: UTF8String): InternalRow =
    try {
      val p = new HexParser(hexU.toString)
      val magic = p.byte()
      val sid = p.int32().toLong
      val pk = p.zvarint()
      if (magic != 0 || !p.done) corruptKey
      else new GenericInternalRow(Array[Any](sid, pk, 1L))
    } catch { case _: Exception => corruptKey }

  /** Decode a Confluent-framed Avro value message back to the event
    * record (field order of [[graft.cdc.AvroBinary.messages]]):
    * schema_name, table_name, op, pk, commit_ts, before, after. */
  def avroDecodeValue(hexU: UTF8String): InternalRow =
    try {
      val p = new HexParser(hexU.toString)
      val magic = p.byte()
      val sid = p.int32().toLong
      val schema = UTF8String.fromString(p.str())
      val table = UTF8String.fromString(p.str())
      val op = UTF8String.fromString(p.str())
      val pk = p.zvarint()
      val ts = p.zvarint()
      val before = p.money()
      val after = p.money()
      if (magic != 0 || !p.done) corruptValue
      else new GenericInternalRow(Array[Any](sid, schema, table, op, pk, ts,
        before, after, 1L))
    } catch { case _: Exception => corruptValue }

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

case class AvroDecodeKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WireHex.KeyStruct
  override def prettyName: String = "graft_avro_decode_key"
  override def nullSafeEval(a: Any): Any =
    WireHex.avroDecodeKey(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WireHex.avroDecodeKey($a)")
  override protected def withNewChildInternal(newChild: Expression): AvroDecodeKey =
    copy(child = newChild)
}

case class AvroDecodeValue(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WireHex.ValueStruct
  override def prettyName: String = "graft_avro_decode_value"
  override def nullSafeEval(a: Any): Any =
    WireHex.avroDecodeValue(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WireHex.avroDecodeValue($a)")
  override protected def withNewChildInternal(newChild: Expression): AvroDecodeValue =
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
    ext.injectFunction((
      FunctionIdentifier("graft_avro_decode_key"),
      new ExpressionInfo(classOf[AvroDecodeKey].getName, "graft_avro_decode_key"),
      (children: Seq[Expression]) => AvroDecodeKey(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_avro_decode_value"),
      new ExpressionInfo(classOf[AvroDecodeValue].getName, "graft_avro_decode_value"),
      (children: Seq[Expression]) => AvroDecodeValue(children.head)))
  }

  def zvarintHex(n: Column): Column = call_function("graft_zvarint_hex", n)
  def avroBytesHex(unscaled: Column): Column =
    call_function("graft_avro_bytes_hex", unscaled)
  def avroDecodeKey(msg: Column): Column =
    call_function("graft_avro_decode_key", msg)
  def avroDecodeValue(msg: Column): Column =
    call_function("graft_avro_decode_value", msg)
}
