package graft.model

import graft.json._

/** Subscription filter tree (SURVEY §2.2).
  *
  * Shape and semantics follow the reference's SubscriptionFilter
  * (/root/reference/pkg/subscription.go:31-84): each node carries exactly one
  * dialect (validated at create time,
  * server/controller/trigger/validation/subscription.go:240-275); a
  * subscription's filter *list* is implicitly AND-ed
  * (server/trigger/filter/trigger_filter.go:68-77); extraction precedence is
  * exact > prefix > suffix > not > cesql > cel > all > any
  * (trigger_filter.go:25-51).
  */
sealed trait FilterSpec
object FilterSpec {
  final case class Exact(pairs: Seq[(String, String)]) extends FilterSpec
  final case class Prefix(pairs: Seq[(String, String)]) extends FilterSpec
  final case class Suffix(pairs: Seq[(String, String)]) extends FilterSpec
  final case class Not(child: FilterSpec) extends FilterSpec
  final case class All(children: Seq[FilterSpec]) extends FilterSpec
  final case class Any(children: Seq[FilterSpec]) extends FilterSpec
  final case class CeSql(expression: String) extends FilterSpec
  final case class Cel(expression: String) extends FilterSpec
  /** nil filter passes everything (trigger_filter.go:79-84). */
  case object NoFilter extends FilterSpec

  /** Parse one filter node from its JSON object form, honoring the dialect
    * precedence above. Invalid shapes (empty key/value — filter/common.go:42-48)
    * throw IllegalArgumentException, mirroring create-time validation.
    */
  def fromJson(v: JValue): FilterSpec = v match {
    case o: JObj =>
      def pairs(key: String): Option[Seq[(String, String)]] = o.get(key).map {
        case JObj(fields) =>
          val ps = fields.toSeq.map {
            case (k, JStr(s)) => k -> s
            case (k, other) => k -> other.render
          }
          ps.foreach { case (k, vv) =>
            require(k.nonEmpty && vv.nonEmpty, s"$key filter: empty key or value")
          }
          ps
        case other => throw new IllegalArgumentException(s"$key must be an object, got ${JPath.typeName(other)}")
      }
      def children(key: String): Option[Seq[FilterSpec]] = o.get(key).map {
        case JArr(items) => items.map(fromJson)
        case other => throw new IllegalArgumentException(s"$key must be an array, got ${JPath.typeName(other)}")
      }
      pairs("exact").map(Exact.apply)
        .orElse(pairs("prefix").map(Prefix.apply))
        .orElse(pairs("suffix").map(Suffix.apply))
        .orElse(o.get("not").map(n => Not(fromJson(n))))
        .orElse(o.get("sql").collect { case JStr(s) => CeSql(s) })
        .orElse(o.get("cel").collect { case JStr(s) => Cel(s) })
        .orElse(children("all").map(All.apply))
        .orElse(children("any").map(Any.apply))
        .getOrElse(NoFilter)
    case JNull => NoFilter
    case other => throw new IllegalArgumentException(s"filter must be an object, got ${JPath.typeName(other)}")
  }

  /** Parse a subscription's filter list (implicitly AND-ed). */
  def listFromJson(s: String): Seq[FilterSpec] = JValue.parse(s) match {
    case JArr(items) => items.map(fromJson)
    case o: JObj => Seq(fromJson(o))
    case JNull => Seq(NoFilter)
    case other => throw new IllegalArgumentException(s"filters must be an array, got ${JPath.typeName(other)}")
  }

  /** Render one filter node back to its JSON object form — the exact
    * inverse of [[fromJson]] (round-trip identity; the shared-group roster
    * file persists specs through this). Exact/Prefix/Suffix pair values
    * that [[fromJson]] lifted from non-string JSON stay strings here: the
    * compiled predicate compares rendered text either way.
    */
  def toJson(f: FilterSpec): JValue = {
    def pairs(ps: Seq[(String, String)]): JValue =
      JObj(scala.collection.immutable.VectorMap.from(
        ps.map { case (k, v) => k -> (JStr(v): JValue) }))
    f match {
      case Exact(ps) => JObj.of("exact" -> pairs(ps))
      case Prefix(ps) => JObj.of("prefix" -> pairs(ps))
      case Suffix(ps) => JObj.of("suffix" -> pairs(ps))
      case Not(child) => JObj.of("not" -> toJson(child))
      case CeSql(e) => JObj.of("sql" -> JStr(e))
      case Cel(e) => JObj.of("cel" -> JStr(e))
      case All(cs) => JObj.of("all" -> JArr(cs.map(toJson).toVector))
      case Any(cs) => JObj.of("any" -> JArr(cs.map(toJson).toVector))
      case NoFilter => JObj.empty
    }
  }

  /** Render a filter list as a JSON array ([[listFromJson]]'s inverse). */
  def listToJson(fs: Seq[FilterSpec]): JValue = JArr(fs.map(toJson).toVector)
}
