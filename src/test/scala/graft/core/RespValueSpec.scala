package graft.core

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.RespValue._

class RespValueSpec extends AnyFunSuite {

  private val genScalar: Gen[RespValue] = Gen.oneOf(
    Gen.const(RespNull),
    Arbitrary.arbitrary[Boolean].map(RespBool),
    Arbitrary.arbitrary[Long].map(RespLong),
    Arbitrary.arbitrary[Double].map(RespDouble),
    Gen.alphaNumStr.map(RespString),
    Gen.listOf(Arbitrary.arbitrary[Byte]).map(bs => RespBinary(bs.toArray)),
    Arbitrary.arbitrary[BigInt].map(RespBigNumber),
    Gen.zip(Gen.oneOf("txt", "mkd"), Gen.alphaNumStr).map { case (f, t) => RespVerbatim(f, t) })

  private def genValue(depth: Int): Gen[RespValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      5 -> genScalar,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(RespArray(_)),
      1 -> Gen.mapOfN(3, Gen.zip(Gen.alphaNumStr, genValue(depth - 1))).map(RespMap(_)),
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(xs => RespSet(xs.toSet)))

  test("toJson is deterministic and total over the value algebra") {
    val seed = org.scalacheck.rng.Seed(42L)
    val values = Gen.listOfN(200, genValue(3)).pureApply(Gen.Parameters.default, seed)
    values.foreach { v =>
      val j1 = toJson(v)
      val j2 = toJson(v)
      assert(j1 == j2)
      assert(j1.nonEmpty)
    }
  }

  test("depth computation and nesting cap (v8_function_ctx.rs:64-66)") {
    var v: RespValue = RespLong(1)
    (1 to MaxDepth).foreach(_ => v = RespArray(Seq(v)))
    assert(depth(v) == MaxDepth + 1)
    assert(validate(v).isLeft)
    assert(validate(RespArray(Seq(RespLong(1)))).isRight)
  }

  test("binary equality is content-based") {
    assert(RespBinary(Array[Byte](1, 2)) == RespBinary(Array[Byte](1, 2)))
    assert(RespBinary(Array[Byte](1, 2)) != RespBinary(Array[Byte](1, 3)))
  }

  test("map JSON is key-sorted (stable interchange)") {
    val m = RespMap(Map("b" -> RespLong(2), "a" -> RespLong(1)))
    assert(toJson(m) == """{"a":1,"b":2}""")
  }

  test("special doubles and binary round through tagged forms") {
    assert(toJson(RespDouble(Double.NaN)).contains("__t"))
    assert(toJson(RespBinary("hi".getBytes)) == """{"__t":"bin","v":"aGk="}""")
    assert(toJson(RespVerbatim("txt", "x")) == """{"__t":"vrb","f":"txt","v":"x"}""")
  }
}
