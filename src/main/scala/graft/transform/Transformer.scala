package graft.transform

import graft.json._
import scala.collection.immutable.VectorMap

/** Subscription transformer: define → pipeline → template
  * (/root/reference/server/trigger/transform/transformer.go:67-109).
  *
  * Per-action errors are collected as warnings and the pipeline continues
  * (pipeline.go:50-60); define-evaluation errors and an unparseable body are
  * whole-transform errors that route the event to retry/DLQ with
  * ErrTransformCode (trigger.go:323-335) — surfaced here as Left.
  */
object Transformer {

  final case class Spec(
      defines: Vector[(String, Arg)],
      pipeline: Vector[Actions.Command],
      templateKind: Option[Template.Kind],
      templateText: Option[String]) {
    lazy val jsonTemplate: Option[Template.JTNode] =
      templateText.flatMap { t =>
        val kind = templateKind.getOrElse(Template.sniffKind(t))
        if (kind == Template.JsonKind) Template.parseJson(t).toOption else None
      }
  }

  final case class Output(event: EventValue, body: String, contentType: String,
      warnings: Vector[String])

  /** Parse a transformer spec from its JSON form (pkg/subscription.go:157-184;
    * FIXTURES.md §3 shape: define / pipeline / template_type / template).
    */
  def parseSpec(json: String): Either[String, Spec] = JValue.parse(json) match {
    case o: JObj =>
      val definesE: Either[String, Vector[(String, Arg)]] = o.get("define") match {
        case Some(JObj(fields)) =>
          fields.toVector.foldLeft[Either[String, Vector[(String, Arg)]]](Right(Vector.empty)) {
            case (Left(e), _) => Left(e)
            case (Right(acc), (k, v)) =>
              Arg.validate(Arg.parse(v)).map(a => acc :+ (k -> a))
          }
        case _ => Right(Vector.empty)
      }
      val pipelineE: Either[String, Vector[Actions.Command]] = o.get("pipeline") match {
        case Some(JArr(items)) =>
          items.foldLeft[Either[String, Vector[Actions.Command]]](Right(Vector.empty)) {
            case (Left(e), _) => Left(e)
            case (Right(acc), it) => Actions.Command.parse(it).map(acc :+ _)
          }
        case _ => Right(Vector.empty)
      }
      val kind = o.get("template_type").collect {
        case JStr("text") => Template.TextKind
        case JStr("json") => Template.JsonKind
      }
      val (tKind, tText) = o.get("template") match {
        case Some(JStr(t)) => (kind, Some(t))
        case Some(to: JObj) =>
          val k = to.get("type").collect {
            case JStr("text") => Template.TextKind
            case JStr("json") => Template.JsonKind
          }
          (k.orElse(kind), to.get("template").collect { case JStr(s) => s })
        case _ => (kind, None)
      }
      // text templates parse-validate at CREATE time, like the reference
      // (pkg/template/text/parse.go errors reject the subscription): a
      // broken escape must fail here, not turn every event into a
      // transform error at delivery. A JSON-typed template that fails the
      // JSON parse degrades to the text renderer (below), so its text
      // parse must hold too.
      val templateE: Either[String, Unit] = tText match {
        case Some(t) =>
          val kind = tKind.getOrElse(Template.sniffKind(t))
          val textRendered = kind == Template.TextKind ||
            (kind == Template.JsonKind && Template.parseJson(t).isLeft)
          if (textRendered)
            Template.validateText(t).left.map(e => s"template: $e")
          else Right(())
        case None => Right(())
      }
      for {
        defines <- definesE
        p <- pipelineE
        _ <- templateE
      } yield Spec(defines, p, tKind, tText)
    case other => Left(s"transformer spec must be an object, got ${JPath.typeName(other)}")
  }

  def execute(spec: Spec, event: EventValue): Either[String, Output] = try {
    executeUnsafe(spec, event)
  } catch {
    // the reference recovers panics anywhere in Execute and returns them
    // as the transform's error (transformer.go:67-74) — a malformed spec
    // hitting an unguarded runtime failure (e.g. a negative splice
    // position, which panics Go's slicing too) must fail THAT EVENT'S
    // transform, never the executor task
    case scala.util.control.NonFatal(e) =>
      Left(s"transform panic: ${e.getClass.getSimpleName}: " +
        s"${Option(e.getMessage).getOrElse("")}")
  }

  private def executeUnsafe(spec: Spec, event: EventValue): Either[String, Output] = {
    // 1. defines — errors are whole-transform errors (transformer.go:84-90)
    val ctx0 = Ctx.of(event)
    val definesE = spec.defines.foldLeft[Either[String, VectorMap[String, JValue]]](
      Right(VectorMap.empty)) {
      case (Left(e), _) => Left(e)
      case (Right(acc), (name, arg)) =>
        arg.evaluate(ctx0.copy(defines = acc)).map(v => acc.updated(name, v))
    }
    definesE.map { defines =>
      // 2. pipeline — log-and-continue (pipeline.go:50-60)
      var ctx = ctx0.copy(defines = defines)
      val warnings = Vector.newBuilder[String]
      spec.pipeline.foreach { cmd =>
        cmd.execute(ctx) match {
          case Right(nc) => ctx = nc
          case Left(err) => warnings += s"action ${cmd.name}: $err"
        }
      }
      // 3. template (or re-serialize the mutated data — transformer.go:99-108)
      val resolve = Template.resolver(ctx)
      val finalEvent = ctx.event.getOrElse(event)
      spec.templateText match {
        case None =>
          Output(finalEvent, ctx.data.render, "application/json", warnings.result())
        case Some(t) =>
          val kind = spec.templateKind.getOrElse(Template.sniffKind(t))
          kind match {
            case Template.TextKind =>
              Output(finalEvent, Template.renderText(t, resolve), "text/plain", warnings.result())
            case Template.JsonKind =>
              val body = spec.jsonTemplate match {
                case Some(node) => Template.renderJson(node, resolve).render
                case None => Template.renderText(t, resolve) // unparseable template: degrade to text
              }
              Output(finalEvent, body, "application/json", warnings.result())
          }
      }
    }
  }

  /** Parse + execute against a raw JSON body (convenience for tests/queries). */
  def transform(specJson: String, event: EventValue): Either[String, Output] =
    parseSpec(specJson).flatMap(execute(_, event))
}
