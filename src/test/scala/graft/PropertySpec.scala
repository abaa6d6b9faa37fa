package graft

import graft.json._
import graft.streaming.EventId
import graft.transform.DateFormats
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the pure kernels the engine leans on.
  * (No scalatest-scalacheck bridge in the offline cache, so a tiny
  * deterministic driver samples each Gen.)
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 200).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000)))
    }

  // --- generators -----------------------------------------------------

  private val jsonScalar: Gen[JValue] = Gen.oneOf(
    Gen.alphaNumStr.map(JStr(_)),
    Gen.choose(-1000000L, 1000000L).map(JInt(_)),
    Gen.oneOf(true, false).map(JBool(_)),
    Gen.const(JNull))

  private def jsonValue(depth: Int): Gen[JValue] =
    if (depth <= 0) jsonScalar
    else Gen.frequency(
      3 -> jsonScalar,
      1 -> Gen.listOfN(3, jsonValue(depth - 1)).map(v => JArr(v.toVector)),
      1 -> Gen.listOfN(3, Gen.zip(Gen.identifier, jsonValue(depth - 1)))
        .map(kvs => JObj(scala.collection.immutable.VectorMap.from(kvs))))

  // --- properties -----------------------------------------------------

  test("JSON parse inverts render for arbitrary trees") {
    forAll(jsonValue(3)) { v =>
      assert(JValue.parse(v.render) == v)
    }
  }

  test("JPath set-then-get returns the written value at arbitrary depth") {
    val pathGen = Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty))
      .map(_.take(4))
    forAll(pathGen, jsonScalar) { (parts, v) =>
      val path = parts.mkString(".")
      val segs = JPath.parse(path)
      JPath.set(JObj(scala.collection.immutable.VectorMap.empty), segs, v) match {
        case Right(doc) => assert(JPath.get(doc, segs).contains(v))
        case Left(e) => fail(e)
      }
    }
  }

  test("EventId roundtrips any (log, offset) pair") {
    forAll(Gen.long, Gen.long) { (log, off) =>
      assert(EventId.decode(EventId.encode(log, off)) == (log, off))
    }
  }

  test("phpToJava always yields a compilable pattern (letters quoted)") {
    val fmtGen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    forAll(fmtGen) { fmt =>
      val pattern = DateFormats.phpToJava(fmt)
      // compiling proves every letter is either a mapped token or quoted
      _root_.java.time.format.DateTimeFormatter.ofPattern(pattern)
      assert(pattern != null)
    }
  }

  test("backoff curve is monotone non-decreasing and capped") {
    forAll(Gen.choose(1, 100), Gen.choose(1, 100)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      assert(streaming.Backoff.delaySeconds(lo) <= streaming.Backoff.delaySeconds(hi))
      assert(streaming.Backoff.delaySeconds(hi) <= 3600L)
    }
  }
}
