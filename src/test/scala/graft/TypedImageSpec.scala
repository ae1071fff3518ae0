package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r11 typed arms checked against their JVM ground truths: the
  * portable SQL renderings (hex/lpad/base64 chains shared with the
  * DuckDB oracle) must equal what the reference's own libraries
  * produce — java.math.BigInteger.toByteArray for the Kafka Connect
  * Decimal / avro logical-decimal bytes, java.util.Base64, two's-
  * complement reinterpretation for the debezium unsigned-bigint wire,
  * and the MySQL SET name join. */
class TypedImageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.util.GraftSession.local(4)
  val dir = "/root/testdata/sf0.001"

  private lazy val rows = {
    import cdc.TypedImage._
    cdc.ChangeEvents.changelog(spark, dir).select(
      col("pk"), col("commit_ts"), col("event_type"),
      bitVal.as("bit_val"), bitB64.as("bit_b64"),
      setMask.as("set_mask"), setName.as("set_name"),
      binStr.as("bin_str"), binB64.as("bin_b64"),
      timeSec.as("time_sec"), timeStr.as("time_str"),
      yearVal.as("year_val"),
      ubigOff.as("ubig_off"), ubigStr.as("ubig_str"),
      ubigWrapped.as("ubig_wrapped"),
      decE4.as("dec_e4"), decPreciseB64.as("dec_b64"),
      decPreciseHex.as("dec_hex")).collect()
  }

  private val b64 = java.util.Base64.getEncoder

  test("BIT(8): base64 wire equals Base64(single LE byte) and the value is in range") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("bit_val")
      assert(v >= 0 && v < 256)
      assert(r.getAs[String]("bit_b64") ==
        b64.encodeToString(Array(v.toByte)), s"bit $v")
    }
  }

  test("SET: name CSV equals the mask-driven element join (ParseSetValue)") {
    import cdc.TypedImage.setElems
    rows.foreach { r =>
      val m = r.getAs[Long]("set_mask")
      assert(m >= 1 && m <= 15)
      val want = setElems.zipWithIndex
        .collect { case (e, i) if (m & (1L << i)) != 0 => e }.mkString(",")
      assert(r.getAs[String]("set_name") == want, s"mask $m")
    }
  }

  test("BINARY: base64 wire equals Base64(UTF-8 bytes of the digit payload)") {
    rows.foreach { r =>
      val s = r.getAs[String]("bin_str")
      assert(s.length == 4 && s.forall(_.isDigit))
      assert(r.getAs[String]("bin_b64") ==
        b64.encodeToString(s.getBytes("UTF-8")))
    }
  }

  test("TIME: the duration string is HH:MM:SS of seconds-of-day") {
    rows.foreach { r =>
      val sec = r.getAs[Long]("time_sec")
      assert(sec >= 0 && sec < 86400)
      val want = f"${sec / 3600}%02d:${sec % 3600 / 60}%02d:${sec % 60}%02d"
      assert(r.getAs[String]("time_str") == want, s"sec $sec")
    }
  }

  test("UBIG: string is the exact unsigned decimal; wrapped is int64(v)") {
    val two63 = new java.math.BigInteger("9223372036854775808")
    rows.foreach { r =>
      val x = r.getAs[Long]("ubig_off")
      assert(x >= 0 && x < 1048576)
      val u = two63.add(java.math.BigInteger.valueOf(x))
      assert(r.getAs[String]("ubig_str") == u.toString, s"x=$x")
      // WriteInt64Field(int64(v)): the two's-complement reinterpretation
      assert(r.getAs[Long]("ubig_wrapped") == u.longValue(), s"x=$x")
      assert(r.getAs[Long]("ubig_wrapped") < 0, "must exercise the wrap")
    }
  }

  test("DECIMAL precise: bytes equal BigInteger.toByteArray (Connect Decimal / avro)") {
    rows.foreach { r =>
      val e4 = r.getAs[Long]("dec_e4")
      val want = java.math.BigInteger.valueOf(e4).toByteArray
      assert(r.getAs[String]("dec_b64") == b64.encodeToString(want), s"e4=$e4")
      assert(r.getAs[String]("dec_hex") ==
        want.map("%02X".format(_)).mkString, s"e4=$e4")
    }
  }

  test("DECIMAL precise: the 0x00 sign-prefix boundary renders like toByteArray") {
    // synthetic values hitting the sign-prefix rule (top byte 0x80..
    // 0xFF -> toByteArray prepends 0x00) and every byte-length
    // boundary up to decE4's 2^48 bound — driven through the SHARED
    // hex builder both engines render
    import spark.implicits._
    val edges = Seq(0L, 1L, 127L, 128L, 255L, 256L, 32767L, 32768L,
      65535L, 65536L, (1L << 23) - 1, 1L << 23, (1L << 31) - 1, 1L << 31,
      (1L << 47) - 1)
    val got = edges.toDF("v")
      .select(col("v"), base64(unhex(cdc.TypedImage.beBytesHex(col("v")))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    edges.foreach { v =>
      assert(got(v) == b64.encodeToString(
        java.math.BigInteger.valueOf(v).toByteArray), s"v=$v")
    }
  }

  // ---- the r12 dispatch-closing arms: GEOMETRY + NULL ----

  test("GEOMETRY/NULL: canal sqlType carries -2/0 and the data values are JSON null") {
    // java.go:136-138 (TypeGeometry -> JavaSQLTypeBINARY, "not
    // supported, this should not hit" — the MAPPING is still total)
    // and java.go:85-86 (TypeNull -> JavaSQLTypeNULL). Parse an actual
    // encoded message: the type maps and the nil values must be on the
    // wire itself, not just in the builder constants.
    val msg = cdc.Codecs.canalJson(cdc.ChangeEvents.changelog(spark, dir))
      .select(col("value")).head().getString(0)
    val geoType = """"sqlType":\{[^}]*"c_geo":(-?\d+)""".r
    val nullType = """"c_null":(-?\d+)\}""".r
    assert(geoType.findFirstMatchIn(msg).map(_.group(1)).contains("-2"), msg)
    assert(nullType.findFirstMatchIn(msg).map(_.group(1)).contains("0"), msg)
    assert(msg.contains("\"c_geo\":\"geometry\""), "mysqlType name")
    assert(msg.contains("\"c_null\":\"null\""), "mysqlType name")
    assert(msg.contains("\"c_geo\":null,\"c_null\":null"),
      "both wire VALUES are JSON null — the encoders carry nothing " +
        "for either type")
  }

  test("GEOMETRY/NULL: canal decode surfaces both arms as null columns") {
    val dec = cdc.Codecs.canalJsonDecode(
      cdc.ChangeEvents.changelog(spark, dir))
    assert(dec.filter(col("c_geo").isNotNull || col("c_null").isNotNull)
      .count() == 0, "nothing rides either wire (message_decoder.go:350-356)")
  }

  test("GEOMETRY/NULL: every craft value chunk carries the two -1 nil markers") {
    // message_encoder.go:219-225: TypeNull/TypeGeometry encode nil —
    // a -1 length marker (1 zigzag byte each), no payload. The frame's
    // group sizes must each include exactly those 2 bytes, and the
    // decode recount (which re-derives sizes independently) must agree.
    val cl = cdc.ChangeEvents.changelog(spark, dir)
    val f = cdc.Craft.frame(cl)
    assert(f.filter(col("c_geo_len") =!= -1L || col("c_null_len") =!= -1L)
      .count() == 0)
    assert(cdc.Craft.decode(f).filter(col("verified") =!= "ok").count() == 0,
      "decode recount must include the nil markers")
  }

  test("GEOMETRY/NULL: the checksum digest excludes both columns (skip rule)") {
    // verify_checksum.go:217-219: TypeNull/TypeGeometry take no part
    // in the digest. Adding the columns to the image changes nothing.
    val cl = cdc.ChangeEvents.changelog(spark, dir)
    val plain = cl.select(col("commit_ts"), col("pk"),
      cdc.Checksum.current.as("cur"), cdc.Checksum.previous.as("prev"))
    val widened = cl
      .withColumn("c_geo", lit(null).cast("binary"))
      .withColumn("c_null", lit(null).cast("string"))
      .select(col("commit_ts"), col("pk"),
        cdc.Checksum.current.as("cur"), cdc.Checksum.previous.as("prev"))
    assert(plain.exceptAll(widened).isEmpty && widened.exceptAll(plain).isEmpty)
  }
}
