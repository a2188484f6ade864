package graft.core

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** Binary-safety contracts (C2/C13), mirroring the reference's binary
  * stream-reader test (`pytests/test_stream_reader.py:31-54`): data
  * that is not valid UTF-8 must round-trip byte-exactly through stream
  * records, the state table (including snapshot/restore), and — with
  * the raw-arguments flag — function arguments. */
class BinarySafetySpec extends AnyFunSuite {

  // invalid UTF-8 on purpose: lone continuation byte, truncated 3-byte
  // sequence, plus a NUL and the full high range
  private val junk: Array[Byte] =
    Array(0x00, 0x80, 0xE2, 0x28, 0xA1, 0xFF, 0xFE, 0x41).map(_.toByte)

  test("stream record: raw fields are byte-exact; decoded view keeps only valid UTF-8 pairs") {
    val r = StreamRecord.binary("s:1", 1, 0,
      Seq("good".getBytes("UTF-8") -> "value".getBytes("UTF-8"),
        "bin".getBytes("UTF-8") -> junk))
    assert(r.fields == Map("good" -> "value")) // junk pair not decodable
    assert(r.fieldsRaw.size == 2)
    assert(java.util.Arrays.equals(r.fieldsRaw(1)._2, junk))
  }

  test("stream record with raw fields survives engine delivery and a Dataset round-trip") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = new Engine(spark)
    val got = ArrayBuffer.empty[Array[Byte]]
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, r) =>
        r.fieldsRaw.foreach { case (_, v) => got += v })
    }))
    val rec = StreamRecord.binary("s:1", 1, 0, Seq("k".getBytes("UTF-8") -> junk))
    // through a Dataset encoder (executor serialization path)...
    val back = Seq(rec).toDS().collect().head
    assert(java.util.Arrays.equals(back.fieldsRaw.head._2, junk))
    // ...and through trigger delivery
    e.streams.processBatch(Seq(back))
    assert(got.size == 1 && java.util.Arrays.equals(got.head, junk))
    e.close()
  }

  test("state table raw values round-trip, including through snapshot/restore") {
    val spark = TestSpark.spark
    val t = new StateTable
    t.setRaw("bin", junk)
    t.hsetRaw("h", "f" -> junk)
    assert(t.getRaw("bin").exists(java.util.Arrays.equals(_, junk)))
    assert(t.hgetRaw("h", "f").exists(java.util.Arrays.equals(_, junk)))
    // durable round-trip: snapshot -> parquet -> restore
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString + "/snap"
    t.snapshot(spark).write.parquet(dir)
    val t2 = new StateTable
    t2.restore(spark.read.parquet(dir))
    assert(t2.getRaw("bin").exists(java.util.Arrays.equals(_, junk)))
    assert(t2.hgetRaw("h", "f").exists(java.util.Arrays.equals(_, junk)))
  }

  test("raw-arguments flag: binary args pass byte-exact; without it UTF-8 decode or error (C13)") {
    val e = new Engine(TestSpark.spark)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerFunction("raw", (_, args) => args.head,
        flags = Set(FunctionFlags.RawArguments, FunctionFlags.NoWrites))
      b.registerFunction("txt", (_, args) => args.head,
        flags = Set(FunctionFlags.NoWrites))
    }))
    // with the flag: bytes through untouched
    assert(e.call("lib", "raw", Seq(RespBinary(junk))) == RespBinary(junk))
    // without: decodable binary becomes a string...
    assert(e.call("lib", "txt", Seq(RespBinary("hé".getBytes("UTF-8")))) == RespString("hé"))
    // ...non-decodable is refused
    intercept[IllegalArgumentException] {
      e.call("lib", "txt", Seq(RespBinary(junk)))
    }
    e.close()
  }
}
