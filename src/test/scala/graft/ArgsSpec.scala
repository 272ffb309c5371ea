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
}
