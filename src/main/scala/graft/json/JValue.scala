package graft.json

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import scala.collection.immutable.VectorMap
import scala.collection.mutable

/** Minimal JSON value model for the event-processing layer.
  *
  * Mirrors the dynamic shape the reference works with (ojg-parsed Go values:
  * `map[string]any` / `[]any` / `int64` / `float64` / `string` / `bool` /
  * `nil` — /root/reference/pkg/json.go:26-41): integral numbers parse to
  * JInt, others to JDouble, and object key order is preserved (VectorMap)
  * so template output is deterministic.
  */
sealed trait JValue {
  /** Render compactly, Go-encoding-style: integral doubles print without a
    * trailing ".0" (Go's json.Marshal shortest form).
    */
  def render: String = {
    val sb = new StringBuilder
    JValue.write(this, sb)
    sb.toString
  }
}
case object JNull extends JValue
final case class JBool(b: Boolean) extends JValue
final case class JInt(v: Long) extends JValue
final case class JDouble(v: Double) extends JValue
final case class JStr(s: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
final case class JObj(fields: VectorMap[String, JValue]) extends JValue {
  def get(k: String): Option[JValue] = fields.get(k)
}

object JObj {
  val empty: JObj = JObj(VectorMap.empty)
  def of(kvs: (String, JValue)*): JObj = JObj(VectorMap.from(kvs))
}

object JValue {
  private val factory = new JsonFactory()

  /** Strict parse; throws on malformed input (the reference routes such
    * events to the DLQ with a transform error — callers decide).
    */
  def parse(s: String): JValue = {
    val p = factory.createParser(s)
    try {
      p.nextToken()
      val v = read(p)
      v
    } finally p.close()
  }

  def parseOpt(s: String): Option[JValue] =
    try Some(parse(s)) catch { case _: Exception => None }

  /** Depth bound for the recursive reader: event bodies are UNTRUSTED
    * per-row input, and a hostile 10k-deep nesting would otherwise
    * StackOverflowError the executor task (an Error the per-event
    * transform-error catch can't absorb) instead of routing to the DLQ
    * as a malformed event.
    */
  private val MaxDepth = 1000

  private def read(p: JsonParser, depth: Int = 0): JValue = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException(s"JSON nests deeper than $MaxDepth")
    p.currentToken() match {
      case JsonToken.START_OBJECT =>
        val buf = mutable.ArrayBuffer.empty[(String, JValue)]
        while (p.nextToken() != JsonToken.END_OBJECT) {
          val name = p.currentName()
          p.nextToken()
          buf += name -> read(p, depth + 1)
        }
        JObj(VectorMap.from(buf))
      case JsonToken.START_ARRAY =>
        val buf = mutable.ArrayBuffer.empty[JValue]
        while (p.nextToken() != JsonToken.END_ARRAY) buf += read(p, depth + 1)
        JArr(buf.toVector)
      case JsonToken.VALUE_STRING => JStr(p.getText)
      case JsonToken.VALUE_NUMBER_INT => JInt(p.getLongValue)
      case JsonToken.VALUE_NUMBER_FLOAT => JDouble(p.getDoubleValue)
      case JsonToken.VALUE_TRUE => JBool(true)
      case JsonToken.VALUE_FALSE => JBool(false)
      case JsonToken.VALUE_NULL => JNull
      case t => throw new IllegalArgumentException(s"unexpected JSON token $t")
    }
  }

  def numToString(d: Double): String =
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
    else {
      // shortest round-trip, Go-style: no exponent for moderate magnitudes
      val s = d.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    }

  private[json] def write(v: JValue, sb: StringBuilder): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(b)
    case JInt(i) => sb.append(i)
    case JDouble(d) => sb.append(numToString(d))
    case JStr(s) => writeString(s, sb)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(','); first = false
        write(it, sb)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(','); first = false
        writeString(k, sb); sb.append(':'); write(fv, sb)
      }
      sb.append('}')
  }

  def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
