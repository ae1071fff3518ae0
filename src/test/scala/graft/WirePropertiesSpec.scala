package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WireHex

/** Property-based hardening of the wire layer: the targeted boundary
  * specs (OperatorSemanticsSpec's tamper arms) prove specific edges;
  * these properties sweep the space — every varint round-trips through
  * the public decode surface, and every decoder is TOTAL on arbitrary
  * garbage (returns the corrupt sentinel, never throws — the contract
  * that keeps one bad Kafka message from killing an executor task).
  * Fixed scalacheck seed: the sweep is deterministic per build. */
class WirePropertiesSpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(500)
    .withInitialSeed(Seed(42L))

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name failed: $r")
  }

  private val nonNeg: Gen[Long] = Gen.frequency(
    3 -> Gen.chooseNum(0L, (1L << 62) - 1),
    1 -> Gen.oneOf(0L, 1L, 63L, 64L, 127L, 128L, 16383L, 16384L,
      (1L << 31) - 1, 1L << 31, (1L << 62) - 1))

  test("every non-negative long round-trips through the zigzag varint wire") {
    // frame = Confluent magic 0x00 + int32 schema id 1 + varint pk —
    // the public avro key decode path exercises the varint decoder
    check("zvarint roundtrip")(Prop.forAll(nonNeg) { n =>
      val frame = "00" + "00000001" + WireHex.zvarintHex(n).toString
      val row = WireHex.avroDecodeKey(
        org.apache.spark.unsafe.types.UTF8String.fromString(frame))
      row.getLong(0) == 1L && row.getLong(1) == n && row.getLong(2) == 1L
    })
  }

  test("varint encodings are minimal: one byte per 7 payload bits") {
    check("zvarint width")(Prop.forAll(nonNeg) { n =>
      val bits = java.lang.Long.numberOfTrailingZeros(
        java.lang.Long.highestOneBit(math.max(2 * n, 1L))) + 1
      val bytes = (bits + 6) / 7
      WireHex.zvarintHex(n).toString.length == bytes * 2
    })
  }

  private val garbage: Gen[String] = Gen.frequency(
    3 -> Gen.listOf(Gen.oneOf("0123456789ABCDEF".toSeq))
      .map(_.mkString), // well-formed hex, arbitrary content/length
    1 -> Gen.listOf(Gen.oneOf("0123456789ABCDEFGZxy .".toSeq))
      .map(_.mkString), // not even hex
    1 -> nonNeg.map(n => "00" + "00000001" +
      WireHex.zvarintHex(n).toString + "FF")) // valid frame + trailing junk

  test("every decoder is total on arbitrary input and flags partial consumes") {
    val u = (s: String) => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    check("avro key total")(Prop.forAll(garbage) { s =>
      val r = WireHex.avroDecodeKey(u(s)); r.getLong(2) == 0L || r.getLong(2) == 1L
    })
    check("avro value total")(Prop.forAll(garbage) { s =>
      val r = WireHex.avroDecodeValue(u(s))
      val valid = r.getLong(WireHex.ValueStruct.fieldIndex("valid"))
      valid == 0L || valid == 1L
    })
    check("simple-avro total")(Prop.forAll(garbage) { s =>
      WireHex.simpleAvroDecode(u(s)); true
    })
    // a structurally valid frame with ANY trailing bytes must reject —
    // the whole-message bounds invariant, swept across all pk values
    check("trailing junk rejects")(Prop.forAll(nonNeg) { n =>
      val r = WireHex.avroDecodeKey(u("00" + "00000001" +
        WireHex.zvarintHex(n).toString + "FF"))
      r.getLong(2) == 0L
    })
  }
}
