package graft.transform

import graft.json._

/** Transform argument resolution, mirroring
  * /root/reference/pkg/transform/arg/arg.go:76-100:
  *
  *   `$.data`      → the whole body
  *   `$.data.x.y`  → JSONPath into the body
  *   `@.x`         → JSONPath into the *current data root* (relative form,
  *                    used inside ARRAY_FOREACH)
  *   `$.attr`      → context attribute (lowercased)
  *   `<name>`      → define variable
  *   anything else → constant
  */
sealed trait Arg {
  def original: String
  def evaluate(ctx: Ctx): Either[String, JValue]
  def set(ctx: Ctx, v: JValue): Either[String, Ctx]
  def delete(ctx: Ctx): Either[String, Ctx]
}

object Arg {
  def parse(raw: JValue): Arg = raw match {
    case JStr(s0) =>
      val s = s0.trim
      if (s == "$.data") DataAll(s)
      else if (s.startsWith("$.data.")) DataPath(s.substring(7), s)
      else if (s.startsWith("@.")) DataPath(s.substring(2), s)
      else if (s.startsWith("$.")) AttrArg(s.substring(2).toLowerCase, s)
      else if (s.length >= 3 && s.head == '<' && s.last == '>' && s(1) != '@')
        DefineArg(s.substring(1, s.length - 1), s)
      else Const(raw, s0)
    case other => Const(other, other.render)
  }

  /** CE attribute-name rule (pkg/event.go:21-32): ≤20 chars, lower-case
    * a-z / 0-9 only. Invalid names fail the SPEC at create time (NewArg
    * errors → transformer invalid), not per event.
    */
  def validate(a: Arg): Either[String, Arg] = a match {
    case AttrArg(attr, original)
      if attr.length > 20 ||
        !attr.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) =>
      Left(s"invalid CloudEvents attribute name in $original " +
        "(must be a-z0-9, at most 20 chars)")
    case ok => Right(ok)
  }

  private def updData(ctx: Ctx, d: JValue): Ctx =
    ctx.event match {
      case Some(e) => ctx.copy(event = Some(e.copy(data = d)), data = d)
      case None => ctx.copy(data = d)
    }

  final case class DataAll(original: String) extends Arg {
    def evaluate(ctx: Ctx): Either[String, JValue] = Right(ctx.data)
    def set(ctx: Ctx, v: JValue): Either[String, Ctx] = Right(updData(ctx, v))
    def delete(ctx: Ctx): Either[String, Ctx] = Right(updData(ctx, JNull))
  }

  final case class DataPath(path: String, original: String) extends Arg {
    private val segs = JPath.parse(path)
    private val isProjection = JPath.isProjection(segs)
    def evaluate(ctx: Ctx): Either[String, JValue] =
      // `[:]` projections resolve to the collected array (ojg GetNodes —
      // the reference's arg form for e.g. join over alerts[:].URL,
      // transform/arg/data.go); empty projection = nil like a miss
      if (isProjection) {
        val hits = JPath.getAll(ctx.data, segs)
        if (hits.isEmpty) Left(s"arg $original value is nil")
        else Right(JArr(hits))
      } else JPath.get(ctx.data, segs).toRight(s"arg $original value is nil")
    def set(ctx: Ctx, v: JValue): Either[String, Ctx] =
      JPath.set(ctx.data, segs, v).map(updData(ctx, _))
    def delete(ctx: Ctx): Either[String, Ctx] =
      JPath.delete(ctx.data, segs).map(updData(ctx, _))
  }

  final case class AttrArg(attr: String, original: String) extends Arg {
    def evaluate(ctx: Ctx): Either[String, JValue] = ctx.event match {
      case Some(e) => e.lookupAttr(attr).map(JStr(_): JValue).toRight(s"arg $original value is nil")
      case None => Left(s"arg $original: no event in context")
    }
    def set(ctx: Ctx, v: JValue): Either[String, Ctx] = ctx.event match {
      case Some(e) => e.setAttr(attr, v).map(ne => ctx.copy(event = Some(ne), data = ne.data))
      case None => Left(s"arg $original: no event in context")
    }
    def delete(ctx: Ctx): Either[String, Ctx] = ctx.event match {
      case Some(e) => e.deleteAttr(attr).map(ne => ctx.copy(event = Some(ne)))
      case None => Left(s"arg $original: no event in context")
    }
  }

  final case class DefineArg(name: String, original: String) extends Arg {
    def evaluate(ctx: Ctx): Either[String, JValue] =
      ctx.defines.get(name).toRight(s"define <$name> value is nil")
    def set(ctx: Ctx, v: JValue): Either[String, Ctx] = Left(s"cannot set define <$name>")
    def delete(ctx: Ctx): Either[String, Ctx] = Left(s"cannot delete define <$name>")
  }

  final case class Const(value: JValue, original: String) extends Arg {
    def evaluate(ctx: Ctx): Either[String, JValue] = Right(value)
    def set(ctx: Ctx, v: JValue): Either[String, Ctx] = Left("cannot set a constant")
    def delete(ctx: Ctx): Either[String, Ctx] = Left("cannot delete a constant")
  }
}
