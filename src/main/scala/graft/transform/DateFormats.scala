package graft.transform

/** The reference's date-format token set
  * (/root/reference/pkg/transform/function/util/time.go:22-51): PHP-style
  * single-char tokens, `\` escapes the next char, anything else is literal.
  * Converted here to a java.time pattern (letters must be quoted to be
  * literal in DateTimeFormatter, unlike Go layouts).
  */
object DateFormats {

  private val tokens: Map[Char, String] = Map(
    'd' -> "dd", // day of month, zero-padded
    'm' -> "MM", // month, zero-padded
    'Y' -> "yyyy", // 4-digit year
    'y' -> "yy", // 2-digit year
    'h' -> "hh", // 12-hour, zero-padded
    'H' -> "HH", // 24-hour, zero-padded
    'i' -> "mm", // minutes
    's' -> "ss") // seconds

  def phpToJava(format: String): String = {
    val sb = new StringBuilder
    // DateTimeFormatter reserves letters plus # { } [ ]; rather than track
    // its reserved set, pass through only known-safe separators bare and
    // single-quote everything else
    val bareSafe = " -:/.,+()".toSet
    def literal(c: Char): Unit =
      if (c == '\'') sb.append("''")
      else if (c.isDigit || bareSafe(c)) sb.append(c)
      else sb.append('\'').append(c).append('\'')
    var i = 0
    while (i < format.length) {
      val c = format(i)
      tokens.get(c) match {
        case Some(j) =>
          sb.append(j)
          // merge a run of the same token: "HH" means the 24h hour once
          // (strftime muscle memory), and Java rejects abutted repeats
          while (i + 1 < format.length && format(i + 1) == c) i += 1
        case None if c == '\\' && i + 1 < format.length =>
          literal(format(i + 1)); i += 1
        case None => literal(c)
      }
      i += 1
    }
    sb.toString
  }
}
