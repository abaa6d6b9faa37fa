package graft.cel

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic token-soup fuzz over the untrusted-input parsers:
  * subscription filters arrive from API clients, so EVERY malformed
  * expression must reject with the create-time IllegalArgumentException —
  * never a NumberFormatException, MatchError, NPE, or StackOverflowError
  * escaping to the analysis thread.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val celAtoms = Seq(
    "$a.(int64)", "$b.(string)", "$c.(double)", "1", "2.5", "42u", "''",
    "'x'", "(", ")", "[", "]", ",", "&&", "||", "!", "+", "-", "*", "/",
    "%", "==", "!=", "<", "<=", ">", ">=", "in", "exists", "all", "map",
    "filter", "has", "size", "matches", "split", ".", "x", "y", "?", ":",
    "true", "false", "9999999999999999999999999999", "0.0.0", "$",
    "$broken", "$p.(nope)", "\"unterminated", "'unterminated")

  private val cesqlAtoms = Seq(
    "type", "id", "source", "xuserid", "1", "2.5", "''", "'x'", "(", ")",
    ",", "AND", "OR", "NOT", "XOR", "LIKE", "EXISTS", "IN", "TRUE",
    "FALSE", "=", "!=", "<", "<=", ">", ">=", "+", "-", "*", "/", "%",
    "UPPER", "LOWER", "LENGTH", "CONCAT", "ABS", "INT", "LEFT", "RIGHT",
    "9999999999999999999999999999", "0.0.0", "\"q", "'q")

  private def fuzz(name: String, atoms: Seq[String])(compile: String => Any): Unit =
    test(s"$name: 1000 token soups reject cleanly or compile") {
      val rnd = new scala.util.Random(20260813L)
      var rejected = 0
      var compiled = 0
      for (_ <- 1 to 1000) {
        val n = rnd.nextInt(24) + 1
        val expr = Seq.fill(n)(atoms(rnd.nextInt(atoms.size)))
          .mkString(" ")
        try { compile(expr); compiled += 1 }
        catch {
          case _: IllegalArgumentException => rejected += 1
          case e: Throwable =>
            fail(s"<$expr> escaped with ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
      // the soup must actually exercise both paths
      assert(rejected > 100, s"only $rejected rejections — atoms too tame")
      assert(compiled > 0, s"nothing compiled — atoms too hostile")
    }

  fuzz("CEL", celAtoms)(CEL.compile)
  fuzz("CESQL", cesqlAtoms)(graft.cesql.CESQL.compile)
}
