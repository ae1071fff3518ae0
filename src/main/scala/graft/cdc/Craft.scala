package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Craft codec — the reference's size-table-indexed columnar binary
  * format (reference: pkg/sink/codec/craft/model.go:463,
  * message_encoder.go:243-301). A craft message is:
  *
  * {{{
  *   uvarint version (=1)
  *   headers, columnar: delta-uvarint ts | uvarint type |
  *     delta-varint partition | delta-varint dict(schema) |
  *     delta-varint dict(table)                  (model.go:188)
  *   per event, per column group:
  *     ty byte (1=new image, 2=old image)        (model.go:31-32,297)
  *     uvarint #columns
  *     delta-varint dict-encoded column names
  *     uvarint TiDB type tags | uvarint column flags
  *     nullable-bytes value chunk (varint lengths, then payloads)
  *   term dictionary: uvarint #terms + string chunk (model.go:151)
  *   size tables (meta[header,dict] + body + per-event group sizes),
  *     each uvarint count + delta-varint chunk, closed by a
  *     REVERSED uvarint of the section length (message_encoder.go:179)
  * }}}
  *
  * Spark-first re-expression: the varints, dictionary ids and size
  * tables are all deterministic functions of the event, so the engine
  * emits the **message layout frame** — dictionary assignment, group
  * composition, per-value payload lengths, and the exact byte size of
  * every section — as a row-local projection with a full DuckDB oracle.
  * Value payloads follow EncodeTiDBType (message_encoder.go:190):
  * integer pk → zigzag varint, decimal money → its string form,
  * varchar → raw bytes; nulls take a -1 length and no bytes.
  *
  * One message per event (batch size 1). The batch-of-N layout only
  * adds delta-chained header/size entries — same arithmetic, and
  * batching frames are A25/A32's concern, not the codec's.
  */
object Craft {

  // dictionary first-use order for a single-event message:
  // headers intern schema=0, table=1 (model.go:192-193); the first
  // group interns the column names (model.go:300)
  private val NameIds = Seq(2, 3, 4, 5, 6, 7) // pk, value, props, event_type, c_geo, c_null

  // TiDB type tags (message_encoder.go:190 switch): bigint pk →
  // TypeLonglong(8); money → TypeNewDecimal(246), craft-encoded as its
  // decimal STRING; props/event_type → TypeVarchar(15); the r12
  // dispatch-closing arms TypeGeometry(255) and TypeNull(6) — both
  // encode nil at ANY value (message_encoder.go:219-225 fallthrough
  // to `return nil`; decoder message_decoder.go:350-356 mirrors)
  private val TypeTags = Seq(8, 246, 15, 15, 255, 6)
  // column flags (pkg/common/table_info.go:56): pk carries
  // HandleKey(2)|PrimaryKey(8)=10; payload columns Nullable(64)
  private val Flags = Seq(10, 64, 64, 64, 64, 64)

  /** The GEOMETRY + NULL columns' contribution to every image's value
    * chunk: nil values take a -1 length marker (one zigzag byte each)
    * and no payload bytes — constant per group, both directions. */
  private[graft] val NilColumnMarkerBytes: Int = 2

  /** protobuf-style uvarint byte length (message_encoder.go:51). */
  private[cdc] def uvarintLen(c: Column): Column = {
    val first = when(c < lit(128L), 1)
    (2 to 8).foldLeft(first)((acc, n) => acc.when(c < lit(1L << (7 * n)), n))
      .otherwise(9)
  }

  private[cdc] def uvarintLenSql(e: String): String = {
    val mids = (2 to 8)
      .map(n => s"WHEN ($e) < ${1L << (7 * n)} THEN $n").mkString(" ")
    s"(CASE WHEN ($e) < 128 THEN 1 $mids ELSE 9 END)"
  }

  /** zigzag varint byte length for a possibly-negative value
    * (message_encoder.go:43 encodeVarint). */
  private def zzLen(c: Column): Column =
    uvarintLen(when(c >= 0, c * 2).otherwise(-c * 2 - 1))

  private def zzLenSql(e: String): String =
    uvarintLenSql(s"CASE WHEN ($e) >= 0 THEN ($e) * 2 ELSE -($e) * 2 - 1 END")

  // per-group constant prefix: ty(1) + uvarint ncols(1) + delta-varint
  // name ids [2..7] = 6×1 + type tags [8,246,15,15,255,6] = 1+2+1+1+2+1
  // + flags [10,64×5] = 6×1  (model.go:297-304)
  private[graft] val GroupFixedBytes: Int = {
    def uv(n: Long): Int = if (n < 128) 1 else if (n < 16384) 2 else 3
    val nameBytes = uv(NameIds.head * 2L) +
      NameIds.sliding(2).map(p => uv((p(1) - p(0)) * 2L)).sum
    2 + nameBytes + TypeTags.map(t => uv(t.toLong)).sum +
      Flags.map(f => uv(f.toLong)).sum
  }

  // term dictionary fixed part: uvarint(8 terms) + 8 uvarint lengths +
  // "pk","value","props","event_type","c_geo","c_null" payloads
  // (schema/table vary)
  private[graft] val DictFixedBytes: Int = 1 + 8 + "pk".length + "value".length +
    "props".length + "event_type".length + "c_geo".length + "c_null".length

  /** Byte size of one column-group's value chunk + the group frame.
    * `vLen` is the money column's payload length (null image → -1
    * length marker, 1 zigzag byte, no payload). */
  private def groupSize(pkLen: Column, vLen: Column, propsLen: Column,
                        etLen: Column): Column = {
    val prefixes = zzLen(pkLen) + zzLen(coalesce(vLen, lit(-1))) +
      zzLen(propsLen) + zzLen(etLen)
    lit(GroupFixedBytes + NilColumnMarkerBytes) + prefixes +
      pkLen + coalesce(vLen, lit(0)) + propsLen + etLen
  }

  private def groupSizeSql(pkLen: String, vLen: String, propsLen: String,
                           etLen: String): String = {
    val prefixes = Seq(zzLenSql(pkLen), zzLenSql(s"COALESCE($vLen, -1)"),
      zzLenSql(propsLen), zzLenSql(etLen)).mkString(" + ")
    s"(${GroupFixedBytes + NilColumnMarkerBytes} + $prefixes + $pkLen + COALESCE($vLen, 0) + $propsLen + $etLen)"
  }

  /** A39 — the craft message layout frame, one row per event: group
    * composition, payload lengths, and exact per-section byte sizes.
    * Pure row-local projection — no shuffle beyond the scan.
    *
    * Computed by ONE fused native pass
    * ([[graft.functions.CraftSizes]]): the composed Column pipeline
    * below ([[frameComposed]], kept as the in-engine parity oracle)
    * nests 9-arm zigzag-length CASE ladders inside each other, and
    * Spark's subexpression elimination skips expressions under
    * conditional branches — so each nesting level re-evaluated its
    * whole argument tree per branch (the %.2f formatter ran tens of
    * times per row; size_tables_size alone measured 9.1 s of the 13 s
    * codec_craft bench at the sf10 tier). Field accesses share the one
    * struct child, which CSE handles (the OpenWireDecode shape). */
  def frame(cl: DataFrame): DataFrame = {
    val sizes = call_function("graft_craft_sizes",
      col("op"), col("pk"), col("after_value"), col("before_value"),
      col("props"), col("event_type"), col("commit_ts"),
      col("schema_name"), col("table_name"))
    cl.withColumn("sz", sizes).select(
      col("schema_name"), col("table_name"), col("commit_ts"), col("op"),
      lit(1L).as("version"),
      lit(1L).as("msg_type"),
      lit(-1L).as("partition_id"),
      when(col("op") === "I", "1").when(col("op") === "D", "2")
        .otherwise("1,2").as("group_types"),
      col("sz.pk_len").as("pk_len"),
      col("sz.new_value_len").as("new_value_len"),
      col("sz.old_value_len").as("old_value_len"),
      col("sz.props_len").as("props_len"),
      col("sz.event_type_len").as("event_type_len"),
      // nil columns: the -1 no-payload marker, constant by the
      // encoder's TypeGeometry/TypeNull nil arm
      lit(-1L).as("c_geo_len"),
      lit(-1L).as("c_null_len"),
      col("sz.new_group_size").as("new_group_size"),
      col("sz.old_group_size").as("old_group_size"),
      col("sz.header_size").as("header_size"),
      col("sz.body_size").as("body_size"),
      col("sz.dict_size").as("dict_size"),
      col("sz.size_tables_size").as("size_tables_size"),
      col("sz.msg_size").as("msg_size"))
  }

  /** The pre-fusion layered pipeline — kept as the parity oracle
    * (CraftSpec asserts [[frame]] equals this column-for-column over
    * the full changelog; it also remains the exact Catalyst rendering
    * of the frameSql oracle arithmetic). */
  private[graft] def frameComposed(cl: DataFrame): DataFrame =
    cl.select(
        col("schema_name"), col("table_name"), col("commit_ts"), col("op"),
        uvarintLen(col("pk") * 2).as("pk_len"), // zigzag of a non-negative pk
        when(col("op") =!= "D",
          octet_length(format_string("%.2f", col("after_value"))))
          .otherwise(lit(null)).as("new_value_len"),
        when(col("op") =!= "I",
          octet_length(format_string("%.2f", col("before_value"))))
          .otherwise(lit(null)).as("old_value_len"),
        octet_length(col("props")).as("props_len"),
        octet_length(col("event_type")).as("event_type_len"))
      .withColumn("new_group_size", when(col("op") =!= "D",
        groupSize(col("pk_len"), col("new_value_len"),
          col("props_len"), col("event_type_len"))))
      .withColumn("old_group_size", when(col("op") =!= "I",
        groupSize(col("pk_len"), col("old_value_len"),
          col("props_len"), col("event_type_len"))))
      // headers: delta-uvarint [ts] + uvarint [type=1] + delta-varint
      // [partition=-1] + delta-varint [dict 0] + delta-varint [dict 1]
      .withColumn("header_size", uvarintLen(col("commit_ts")) + lit(4))
      .withColumn("body_size",
        coalesce(col("new_group_size"), lit(0)) +
        coalesce(col("old_group_size"), lit(0)))
      .withColumn("dict_size", lit(DictFixedBytes) +
        octet_length(col("schema_name")) + octet_length(col("table_name")))
      // size tables: meta[header,dict] + body[bodySize] + groups[g1(,g2)]
      .withColumn("tables_pre",
        (lit(1) + zzLen(col("header_size")) +
          zzLen(col("dict_size") - col("header_size"))) +
        (lit(1) + zzLen(col("body_size"))) +
        (lit(1) + zzLen(coalesce(col("new_group_size"), col("old_group_size"))) +
          when(col("op") === "U",
            zzLen(col("old_group_size") - col("new_group_size"))).otherwise(lit(0))))
      .withColumn("size_tables_size", col("tables_pre") + uvarintLen(col("tables_pre")))
      .select(
        col("schema_name"), col("table_name"), col("commit_ts"), col("op"),
        lit(1L).as("version"),
        lit(1L).as("msg_type"), // model.MessageTypeRow
        lit(-1L).as("partition_id"), // non-partitioned table (model.go:471)
        when(col("op") === "I", "1").when(col("op") === "D", "2")
          .otherwise("1,2").as("group_types"), // new-then-old (model.go:422)
        col("pk_len").cast("long").as("pk_len"),
        // absent sections (no new image on D, no old image on I) emit
        // the -1 sentinel: a nullable BIGINT crosses the oracle's
        // pandas bridge as float64
        coalesce(col("new_value_len").cast("long"), lit(-1L)).as("new_value_len"),
        coalesce(col("old_value_len").cast("long"), lit(-1L)).as("old_value_len"),
        col("props_len").cast("long").as("props_len"),
        col("event_type_len").cast("long").as("event_type_len"),
        lit(-1L).as("c_geo_len"),
        lit(-1L).as("c_null_len"),
        coalesce(col("new_group_size").cast("long"), lit(-1L)).as("new_group_size"),
        coalesce(col("old_group_size").cast("long"), lit(-1L)).as("old_group_size"),
        col("header_size").cast("long").as("header_size"),
        col("body_size").cast("long").as("body_size"),
        col("dict_size").cast("long").as("dict_size"),
        col("size_tables_size").cast("long").as("size_tables_size"),
        (lit(1) + col("header_size") + col("body_size") + col("dict_size") +
          col("size_tables_size")).cast("long").as("msg_size"))

  /** A64 — craft resolved-ts checkpoint frame (reference:
    * craft_encoder.go:37-42 EncodeCheckpointEvent +
    * message_encoder.go:303-313 NewResolvedEventEncoder): the one
    * non-DML message type the craft protocol actually supports (its
    * DDL encoder is commented out upstream). The resolved message is a
    * headers-only frame — ts + type=3 (tiflow model.MessageTypeResolved)
    * + null partition/schema/table — with an EMPTY body, an empty term
    * dictionary (encodeTermDictionary emits zero bytes for an empty
    * dict), and size tables carrying only the meta + body chunks (no
    * group tables). Header size is the same uvarintLen(ts)+4 shape as
    * A39's ROW header: the three null header columns each encode as
    * one varint byte, exactly like ROW's partition/dict refs. One
    * 1-row aggregation; the A15 resolved-ts semantics on the craft
    * wire. */
  def resolvedFrame(cl: DataFrame): DataFrame =
    ClDims.maxTs(cl).select(col("m").as("resolved_ts"))
      .withColumn("header_size", uvarintLen(col("resolved_ts")) + lit(4))
      // metaSizeTable [header, dict=0] as a delta-varint chunk + the
      // bodySize chunk [0]; no group tables for a headers-only message
      .withColumn("tables_pre",
        (lit(1) + zzLen(col("header_size")) +
          zzLen(lit(0) - col("header_size"))) +
        (lit(1) + zzLen(lit(0))))
      .select(
        col("resolved_ts"),
        lit(1L).as("version"),
        lit(3L).as("msg_type"), // model.MessageTypeResolved
        lit(-1L).as("partition_id"),
        col("header_size").cast("long").as("header_size"),
        lit(0L).as("body_size"),
        lit(0L).as("dict_size"),
        (col("tables_pre") + uvarintLen(col("tables_pre"))).cast("long")
          .as("size_tables_size"),
        (lit(1) + col("header_size") + col("tables_pre") +
          uvarintLen(col("tables_pre"))).cast("long").as("msg_size"))

  def resolvedFrameSql: String = {
    val header = s"(${uvarintLenSql("rts")} + 4)"
    val tablesPre = s"(1 + ${zzLenSql(header)} + ${zzLenSql(s"(0 - $header)")}" +
      s" + 1 + ${zzLenSql("0")})"
    s"""WITH r AS (SELECT MAX(commit_ts) AS rts FROM changelog)
       |SELECT rts AS resolved_ts,
       |  CAST(1 AS BIGINT) AS version,
       |  CAST(3 AS BIGINT) AS msg_type,
       |  CAST(-1 AS BIGINT) AS partition_id,
       |  CAST($header AS BIGINT) AS header_size,
       |  CAST(0 AS BIGINT) AS body_size,
       |  CAST(0 AS BIGINT) AS dict_size,
       |  CAST($tablesPre + ${uvarintLenSql(tablesPre)} AS BIGINT) AS size_tables_size,
       |  CAST(1 + $header + $tablesPre + ${uvarintLenSql(tablesPre)} AS BIGINT) AS msg_size
       |FROM r""".stripMargin
  }

  /** A47 — craft DECODE over the layout frame (reference:
    * craft_decoder.go:34-160 `batchDecoder` + message_decoder.go).
    * The reference consumer parses tail-first: the reversed-uvarint
    * size tables at the end of the buffer give every section's byte
    * size, the decoder slices header/body/dict by those sizes with
    * bounds checks (`ErrCraftCodecInvalidData` on any underflow), then
    * reads the envelope from the headers and the image layout from the
    * group frames. This operator is that consumer over the layout
    * frame: it recovers the section OFFSETS a byte slicer would use,
    * re-derives the event envelope (op from the group-type list, image
    * presence from the group budgets), and re-runs every structural
    * invariant the reference's bounds checks enforce — recomputing the
    * group sizes and size-table bytes from the payload lengths and
    * comparing. `verified` = 'corrupt' ≙ the reference's decode error.
    * Row-local, zero shuffle; tamper spec flips one size and is caught. */
  def decode(frame: DataFrame): DataFrame = {
    def present(c: Column): Column = c =!= lit(-1L)
    def nn(c: Column): Column = call_function("nullif", c, lit(-1L))
    // The recounted sizes run as NATIVE single-pass expressions
    // (CraftGroupSize / CraftSizeTables — same zigzag arithmetic, one
    // evaluation per row): as composed Column ladders they sat under
    // the `verified` CaseWhen's branches, where subexpression
    // elimination does not reach, and re-expanded per branch (the
    // encode-side CraftSizes lesson applied to the decode recount).
    frame
      .withColumn("op_dec", when(col("group_types") === "1", "I")
        .when(col("group_types") === "2", "D").otherwise(lit("U")))
      .withColumn("new_re", when(present(col("new_group_size")),
        call_function("graft_craft_group_size", col("pk_len"),
          nn(col("new_value_len")), col("props_len"),
          col("event_type_len")))
        .otherwise(lit(-1L)))
      .withColumn("old_re", when(present(col("old_group_size")),
        call_function("graft_craft_group_size", col("pk_len"),
          nn(col("old_value_len")), col("props_len"),
          col("event_type_len")))
        .otherwise(lit(-1L)))
      .withColumn("sizes_re",
        call_function("graft_craft_size_tables", col("header_size"),
          col("dict_size"), col("body_size"), col("new_group_size"),
          col("old_group_size"), col("op_dec")))
      .select(
        col("schema_name"), col("table_name"), col("commit_ts"),
        col("op_dec").as("op"),
        lit(1L).as("header_offset"),
        (lit(1L) + col("header_size")).as("body_offset"),
        (lit(1L) + col("header_size") + col("body_size")).as("dict_offset"),
        (col("msg_size") - col("size_tables_size")).as("sizes_offset"),
        col("new_group_size").as("new_group_bytes"),
        col("old_group_size").as("old_group_bytes"),
        when(col("msg_size") =!= lit(1L) + col("header_size") + col("body_size") +
               col("dict_size") + col("size_tables_size"), "corrupt")
          .when(col("header_size") =!= uvarintLen(col("commit_ts")) + lit(4), "corrupt")
          .when(col("body_size") =!= greatest(col("new_group_size"), lit(0L)) +
            greatest(col("old_group_size"), lit(0L)), "corrupt")
          .when(col("new_group_size") =!= col("new_re"), "corrupt")
          .when(col("old_group_size") =!= col("old_re"), "corrupt")
          .when(col("size_tables_size") =!= col("sizes_re"), "corrupt")
          .otherwise(lit("ok")).as("verified"))
  }

  /** verify(decode(frame(changelog))) — the oracle-checked round trip. */
  def decodeSql: String = {
    def nn(e: String) = s"NULLIF($e, -1)"
    val opE = "CASE group_types WHEN '1' THEN 'I' WHEN '2' THEN 'D' ELSE 'U' END"
    val newRe =
      s"""CASE WHEN new_group_size <> -1 THEN ${groupSizeSql("pk_len",
        nn("new_value_len"), "props_len", "event_type_len")} ELSE -1 END"""
    val oldRe =
      s"""CASE WHEN old_group_size <> -1 THEN ${groupSizeSql("pk_len",
        nn("old_value_len"), "props_len", "event_type_len")} ELSE -1 END"""
    val bodyRe = "GREATEST(new_group_size, 0) + GREATEST(old_group_size, 0)"
    val tablesPre =
      s"""(1 + ${zzLenSql("header_size")} + ${zzLenSql("dict_size - header_size")})
         | + (1 + ${zzLenSql("body_size")})
         | + (1 + ${zzLenSql(s"COALESCE(${nn("new_group_size")}, old_group_size)")}
         |    + CASE WHEN $opE = 'U'
         |        THEN ${zzLenSql("old_group_size - new_group_size")} ELSE 0 END)""".stripMargin
    s"""WITH frame AS ($frameSql)
       |SELECT schema_name, table_name, commit_ts, $opE AS op,
       |  CAST(1 AS BIGINT) AS header_offset,
       |  1 + header_size AS body_offset,
       |  1 + header_size + body_size AS dict_offset,
       |  msg_size - size_tables_size AS sizes_offset,
       |  new_group_size AS new_group_bytes,
       |  old_group_size AS old_group_bytes,
       |  CASE
       |    WHEN msg_size <> 1 + header_size + body_size + dict_size + size_tables_size THEN 'corrupt'
       |    WHEN header_size <> ${uvarintLenSql("commit_ts")} + 4 THEN 'corrupt'
       |    WHEN body_size <> $bodyRe THEN 'corrupt'
       |    WHEN new_group_size <> $newRe THEN 'corrupt'
       |    WHEN old_group_size <> $oldRe THEN 'corrupt'
       |    WHEN size_tables_size <> ($tablesPre) + ${uvarintLenSql(s"($tablesPre)")} THEN 'corrupt'
       |    ELSE 'ok' END AS verified
       |FROM frame""".stripMargin
  }

  /** DuckDB oracle for [[frame]] over the `changelog` CTE. */
  val frameSql: String = {
    val pkLen = uvarintLenSql("pk * 2")
    val newVLen = "CASE WHEN op <> 'D' THEN octet_length(encode(printf('%.2f', after_value))) END"
    val oldVLen = "CASE WHEN op <> 'I' THEN octet_length(encode(printf('%.2f', before_value))) END"
    val newSize =
      s"CASE WHEN op <> 'D' THEN ${groupSizeSql(pkLen, newVLen, "octet_length(encode(props))", "octet_length(encode(event_type))")} END"
    val oldSize =
      s"CASE WHEN op <> 'I' THEN ${groupSizeSql(pkLen, oldVLen, "octet_length(encode(props))", "octet_length(encode(event_type))")} END"
    val headerSize = s"(${uvarintLenSql("commit_ts")} + 4)"
    val dictSize =
      s"($DictFixedBytes + octet_length(encode(schema_name)) + octet_length(encode(table_name)))"
    s"""WITH sized AS (
       |  SELECT *,
       |    $newSize AS new_size,
       |    $oldSize AS old_size,
       |    $headerSize AS header_size,
       |    $dictSize AS dict_size
       |  FROM changelog
       |), tbl AS (
       |  SELECT *,
       |    COALESCE(new_size, 0) + COALESCE(old_size, 0) AS body_size,
       |    (1 + ${zzLenSql("header_size")} + ${zzLenSql("dict_size - header_size")})
       |      + (1 + ${zzLenSql("COALESCE(new_size, 0) + COALESCE(old_size, 0)")})
       |      + (1 + ${zzLenSql("COALESCE(new_size, old_size)")}
       |         + CASE WHEN op = 'U' THEN ${zzLenSql("old_size - new_size")} ELSE 0 END)
       |      AS tables_pre
       |  FROM sized
       |)
       |SELECT schema_name, table_name, commit_ts, op,
       |  CAST(1 AS BIGINT) AS version,
       |  CAST(1 AS BIGINT) AS msg_type,
       |  CAST(-1 AS BIGINT) AS partition_id,
       |  CASE WHEN op = 'I' THEN '1' WHEN op = 'D' THEN '2' ELSE '1,2' END AS group_types,
       |  CAST($pkLen AS BIGINT) AS pk_len,
       |  CAST(COALESCE($newVLen, -1) AS BIGINT) AS new_value_len,
       |  CAST(COALESCE($oldVLen, -1) AS BIGINT) AS old_value_len,
       |  CAST(octet_length(encode(props)) AS BIGINT) AS props_len,
       |  CAST(octet_length(encode(event_type)) AS BIGINT) AS event_type_len,
       |  CAST(-1 AS BIGINT) AS c_geo_len,
       |  CAST(-1 AS BIGINT) AS c_null_len,
       |  CAST(COALESCE(new_size, -1) AS BIGINT) AS new_group_size,
       |  CAST(COALESCE(old_size, -1) AS BIGINT) AS old_group_size,
       |  CAST(header_size AS BIGINT) AS header_size,
       |  CAST(body_size AS BIGINT) AS body_size,
       |  CAST(dict_size AS BIGINT) AS dict_size,
       |  CAST(tables_pre + ${uvarintLenSql("tables_pre")} AS BIGINT) AS size_tables_size,
       |  CAST(1 + header_size + body_size + dict_size
       |       + tables_pre + ${uvarintLenSql("tables_pre")} AS BIGINT) AS msg_size
       |FROM tbl""".stripMargin
  }
}
