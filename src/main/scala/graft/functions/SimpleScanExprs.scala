package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass field scanner for the simple-protocol JSON wire
  * (consumer side of A34/A45; reference: pkg/sink/codec/simple/
  * message.go — the message field set the decoder.go:309-356 consumer
  * reads).
  *
  * Why not `from_json`: the A45 decode profile at the sf10 tier showed
  * the decode wall dominated by Jackson tokenization of 10M messages
  * (the CanalScan lesson, A42 — that scanner took the canal decode
  * 15.3 → 5.5 s at sf10). This walks the message once, extracting the
  * consumer-read fields by key and skipping everything else (props
  * payloads, pkNames, the tableSchema column LIST except its count).
  * Numbers parse with Double.parseDouble — the same correctly-rounded
  * IEEE result Jackson produces for the identical token, so the frame
  * is bit-equal to the `from_json` one it replaces. Malformed input
  * decodes to NULL (the from_json contract) and a message is only
  * accepted if the scan consumes every byte (after trailing
  * whitespace). The scanner skips inter-token whitespace at every
  * structural position, so the registered SQL function accepts any
  * pretty-printed rendering of the wire, not just the producer's
  * compact form — one failed char-compare per skip site on the
  * compact hot path.
  *
  * DOCUMENTED LENIENCY vs from_json: bare `NaN`/`Infinity` scalar
  * tokens (which `%.4f` can emit for non-finite doubles) parse via
  * Double.parseDouble where strict JSON would reject them — the
  * producer-side A34 encoder can emit them, so the consumer accepts
  * its own wire.
  */
object SimpleScan {
  val Struct: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("typ", StringType),
    StructField("commit_ts", LongType),
    StructField("schema_version", LongType),
    StructField("sql", StringType),
    StructField("has_data", LongType),      // 1 when a data image exists
    StructField("data_pk", LongType),
    StructField("data_value", DoubleType),
    StructField("has_old", LongType),
    StructField("old_pk", LongType),
    StructField("old_value", DoubleType),
    StructField("ts_schema", StringType),
    StructField("ts_table", StringType),
    StructField("ts_version", LongType),
    StructField("ts_cols", LongType)))

  private final val DB = 0
  private final val TBL = 1
  private final val TYP = 2
  private final val CTS = 3
  private final val SVER = 4
  private final val SQL = 5
  private final val HASD = 6
  private final val DPK = 7
  private final val DVAL = 8
  private final val HASO = 9
  private final val OPK = 10
  private final val OVAL = 11
  private final val TSS = 12
  private final val TST = 13
  private final val TSV = 14
  private final val TSC = 15
  private[functions] final val NumSlots = 16

  private final class Scanner(s: String, out: Array[Any]) {
    private var pos = 0
    private val n = s.length

    private def err(): Nothing =
      throw new IllegalArgumentException("bad simple json")
    private def ch: Char = { if (pos >= n) err(); s.charAt(pos) }
    private def eat(c: Char): Unit = { if (ch != c) err(); pos += 1 }
    private def ws(): Unit =
      while (pos < n && { val c = s.charAt(pos)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' }) pos += 1

    private def readString(): String = {
      ws()
      eat('"')
      val start = pos
      var hasEsc = false
      while (ch != '"') {
        if (s.charAt(pos) == '\\') { hasEsc = true; pos += 2 }
        else pos += 1
      }
      val raw = s.substring(start, pos)
      pos += 1
      if (hasEsc) unescape(raw) else raw
    }

    private def unescape(raw: String): String = {
      val b = new java.lang.StringBuilder(raw.length)
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c == '\\') {
          i += 1
          raw.charAt(i) match {
            case '"'  => b.append('"')
            case '\\' => b.append('\\')
            case '/'  => b.append('/')
            case 'b'  => b.append('\b')
            case 'f'  => b.append('\f')
            case 'n'  => b.append('\n')
            case 'r'  => b.append('\r')
            case 't'  => b.append('\t')
            case 'u' =>
              b.append(Integer.parseInt(raw.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case _ => err()
          }
          i += 1
        } else { b.append(c); i += 1 }
      }
      b.toString
    }

    private def scalarToken(): String = {
      ws()
      val start = pos
      while (pos < n && { val c = s.charAt(pos)
        c != ',' && c != '}' && c != ']' &&
          c != ' ' && c != '\t' && c != '\n' && c != '\r' }) pos += 1
      if (pos == start) err()
      s.substring(start, pos)
    }

    private def longToken(): Long = java.lang.Long.parseLong(scalarToken())

    private def skipValue(): Unit = ch match {
      case '"' =>
        pos += 1
        while (ch != '"') {
          if (s.charAt(pos) == '\\') pos += 2 else pos += 1
        }
        pos += 1
      case '{' | '[' =>
        var depth = 0
        var first = true
        while (first || depth > 0) {
          first = false
          ch match {
            case '"' =>
              pos += 1
              while (ch != '"') {
                if (s.charAt(pos) == '\\') pos += 2 else pos += 1
              }
              pos += 1
            case c =>
              if (c == '{' || c == '[') depth += 1
              else if (c == '}' || c == ']') depth -= 1
              pos += 1
          }
        }
      case _ => scalarToken(); ()
    }

    private def obj(handle: String => Unit): Unit = {
      ws()
      eat('{')
      ws()
      if (ch == '}') { pos += 1; return }
      var more = true
      while (more) {
        val key = readString()
        ws()
        eat(':')
        ws()
        handle(key)
        ws()
        if (ch == ',') pos += 1
        else { eat('}'); more = false }
      }
    }

    private def utf(x: String): UTF8String = UTF8String.fromString(x)

    private def image(pkSlot: Int, valSlot: Int): Unit = obj {
      case "pk" => out(pkSlot) = longToken()
      case "value" =>
        val t = scalarToken()
        if (t != "null") out(valSlot) = java.lang.Double.parseDouble(t)
      case _ => skipValue() // props
    }

    private def tableSchema(): Unit = obj {
      case "schema"  => out(TSS) = utf(readString())
      case "table"   => out(TST) = utf(readString())
      case "version" => out(TSV) = longToken()
      case "columns" =>
        eat('[')
        ws()
        var cols = 0L
        if (ch == ']') pos += 1
        else {
          var more = true
          while (more) {
            skipValue(); cols += 1
            ws()
            if (ch == ',') { pos += 1; ws() }
            else { eat(']'); more = false }
          }
        }
        out(TSC) = cols
      case _ => skipValue()
    }

    private def topKey(key: String): Unit = key match {
      case "database"      => out(DB) = utf(readString())
      case "table"         => out(TBL) = utf(readString())
      case "type"          => out(TYP) = utf(readString())
      case "commitTs"      => out(CTS) = longToken()
      case "schemaVersion" => out(SVER) = longToken()
      case "sql"           => out(SQL) = utf(readString())
      case "data" =>
        if (ch != '{') { if (scalarToken() != "null") err() }
        else { out(HASD) = 1L; image(DPK, DVAL) }
      case "old" =>
        if (ch != '{') { if (scalarToken() != "null") err() }
        else { out(HASO) = 1L; image(OPK, OVAL) }
      case "tableSchema" =>
        if (ch != '{') { if (scalarToken() != "null") err() }
        else tableSchema()
      case _ => skipValue() // version, tableID, buildTs, watermarkTs, …
    }

    def run(): Unit = {
      obj(topKey)
      ws()
      if (pos != n) err()
    }
  }

  /** NULL on malformed input — the from_json contract. */
  def decode(u: UTF8String): InternalRow =
    try {
      val out = new Array[Any](NumSlots)
      new Scanner(u.toString, out).run()
      new GenericInternalRow(out)
    } catch { case _: Exception => null }
}

case class SimpleDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = SimpleScan.Struct
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simple_decode"
  override def nullSafeEval(a: Any): Any =
    SimpleScan.decode(a.asInstanceOf[UTF8String])
  // malformed wire decodes to NULL, so the generated code null-checks
  // the helper's result (the OpenWireDecode convention)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.SimpleScan.decode($v);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): SimpleDecode =
    copy(child = newChild)
}

object SimpleScanExprs {
  def simpleDecode(msg: Column): Column =
    call_function("graft_simple_decode", msg)
}
