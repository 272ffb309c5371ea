package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Args

/** Port of the reference's ArgTest semantics
  * (scalding-args/src/test/.../ArgTest.scala).
  */
class ArgsSpec extends AnyFunSuite {

  test("positional and keyed args") {
    val a = Args("input.txt --key v1 v2 --flag")
    assert(a.positional == List("input.txt"))
    assert(a.list("key") == List("v1", "v2"))
    assert(a.boolean("flag"))
    assert(!a.boolean("nope"))
  }

  test("required/optional") {
    val a = Args("--input x --n 1 2 3")
    assert(a("input") == "x")
    assert(a.optional("output").isEmpty)
    assert(a.list("n") == List("1", "2", "3"))
    intercept[RuntimeException] { a("n") }
    intercept[RuntimeException] { a("missing") }
  }

  test("negative numbers are values, not keys") {
    val a = Args("--offset -5")
    assert(a("offset") == "-5")
  }

  test("numeric accessors and defaults") {
    val a = Args("--n 42 --x 1.5")
    assert(a.int("n") == 42)
    assert(a.double("x") == 1.5)
    assert(a.getOrElse("missing", "d") == "d")
  }

  test("round trip through toString") {
    val a = Args("--b 1 --a x y")
    assert(Args(a.toString) == a)
  }

  test("ranged args: 1 value = point, 2 = interval, else rejected; " +
      "bounds asserted (reference RangedArgs)") {
    import graft.core.RangedArgs._
    import graft.core.ArgRange
    val point = Args("--date 20240101").range("date")(_.toInt)
    assert(point == ArgRange(20240101, 20240101))
    assert(point.mkString("-") == "20240101")
    val span = Args("--date 20240101 20240301").range("date")(_.toInt)
    assert(span == ArgRange(20240101, 20240301))
    assert(span.mkString("-") == "20240101-20240301")
    span.assertBounds(20240101, 20241231)
    intercept[IllegalArgumentException] {
      span.assertUpperBound(20240201)
    }
    intercept[IllegalArgumentException] {
      span.assertLowerBound(20240201)
    }
    intercept[IllegalArgumentException] {
      ArgRange(3, 1)
    }
    val bad = intercept[IllegalArgumentException] {
      Args("--date 1 2 3").range("date")(_.toInt)
    }
    assert(bad.getMessage.contains("either 1 or 2 values"))
    intercept[IllegalArgumentException] {
      Args("").range("date")(_.toInt)
    }
  }
}
