package graft.transform

import graft.json._
import java.time.{Instant, LocalDateTime, OffsetDateTime, ZoneId}
import java.time.format.DateTimeFormatter
import scala.collection.immutable.VectorMap

/** The 31 pipeline actions (SURVEY §2.5), interpreted over an immutable
  * [[Ctx]]. Each returns Left on action error — the pipeline logs and
  * continues (pipeline.go:50-60), leaving the event unchanged for that step.
  *
  * Command shapes are `["NAME", arg...]`, dispatched case-insensitively
  * (runtime/action.go:40-102). Reference files are cited per action.
  */
object Actions {

  type Result = Either[String, Ctx]

  /** A parsed command: dispatch happens once at pipeline build. */
  final case class Command(name: String, rawArgs: Vector[JValue]) {
    val args: Vector[Arg] = rawArgs.map(Arg.parse)
    def execute(ctx: Ctx): Result = Actions.execute(this, ctx)
  }

  object Command {
    /** Parse `{"command": ["name", ...]}` or a bare `["name", ...]`. */
    def parse(v: JValue): Either[String, Command] = {
      val arr = v match {
        case JObj(fields) => fields.get("command")
        case a: JArr => Some(a)
        case _ => None
      }
      arr match {
        case Some(JArr(JStr(name) +: rest)) =>
          val cmd = Command(name.toLowerCase, rest.toVector)
          for {
            _ <- checkArity(cmd)
            _ <- cmd.args.foldLeft[Either[String, Unit]](Right(())) {
              (acc, a) => acc.flatMap(_ => Arg.validate(a).map(_ => ()))
            }
          } yield cmd
        case _ => Left(s"invalid command: ${v.render}")
      }
    }

    private val arity: Map[String, (Int, Boolean)] = Map(
      // name -> (fixed arg count after the name, variadic?)
      "create" -> (2, false), "delete" -> (1, false), "replace" -> (2, false),
      "move" -> (2, false), "rename" -> (2, false), "duplicate" -> (2, false),
      "math_add" -> (3, true), "math_sub" -> (3, false),
      "math_mul" -> (3, true), "math_div" -> (3, false),
      "date_format" -> (2, true), "unix_time_format" -> (2, true),
      "convert_timezone" -> (3, true),
      "join" -> (3, true), "upper_case" -> (1, false), "lower_case" -> (1, false),
      "add_prefix" -> (2, false), "add_suffix" -> (2, false),
      "replace_string" -> (3, false), "replace_with_regex" -> (3, false),
      "replace_between_positions" -> (4, false),
      "replace_between_delimiters" -> (4, false),
      "capitalize_sentence" -> (1, false), "capitalize_word" -> (1, false),
      "split_with_delimiter" -> (3, false), "split_from_start" -> (3, false),
      "split_between_positions" -> (4, false), "split_with_intervals" -> (4, false),
      "extract_between_delimiters" -> (4, false), "extract_between_positions" -> (4, false),
      "check_custom_values" -> (5, false), "extract_missing" -> (4, false),
      "condition_if" -> (6, false), "array_foreach" -> (2, false),
      "render_array" -> (3, false), "unfold_array" -> (2, false),
      "length" -> (2, false), "debezium_convert_to_mongodb_sink" -> (1, true))

    private def checkArity(c: Command): Either[String, Unit] = arity.get(c.name) match {
      case None => Left(s"unknown action ${c.name}")
      case Some((fixed, variadic)) =>
        val n = c.rawArgs.size
        if (n < fixed) Left(s"action ${c.name}: expected >=$fixed args, got $n")
        else if (n > fixed && !variadic) Left(s"action ${c.name}: expected $fixed args, got $n")
        else Right(())
    }
  }

  // ---- helpers ----------------------------------------------------------

  private def evalText(a: Arg, ctx: Ctx): Either[String, String] =
    a.evaluate(ctx).flatMap(VCast.toText)
  private def evalFloat(a: Arg, ctx: Ctx): Either[String, Double] =
    a.evaluate(ctx).flatMap(VCast.toFloat)
  private def evalInt(a: Arg, ctx: Ctx): Either[String, Int] =
    a.evaluate(ctx).flatMap(VCast.toInt).map(_.toInt)
  private def evalStrArr(a: Arg, ctx: Ctx): Either[String, Vector[String]] =
    a.evaluate(ctx).flatMap(VCast.toStringArray)

  private def exists(a: Arg, ctx: Ctx): Boolean = a.evaluate(ctx).isRight

  private def requireAbsent(a: Arg, ctx: Ctx): Either[String, Unit] =
    if (exists(a, ctx)) Left(s"key ${a.original} exists") else Right(())

  /** Source-target-same string function: read arg0 as string, write back. */
  // Go indexes strings by BYTE; the positional splice actions
  // (strings_functions.go:87-106, split_*_positions.go) cut at UTF-8 byte
  // offsets, so a multibyte rune counts as 2-4 positions. Mirror that
  // here: splice the UTF-8 encoding and decode the pieces. Divergence
  // (documented in README): a cut INSIDE a multibyte rune yields U+FFFD
  // replacement chars on the JVM where Go keeps the raw invalid bytes —
  // JVM strings cannot hold invalid UTF-8.
  private def u8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private def u8str(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.UTF_8)

  private def stString(c: Command, ctx: Ctx)(f: String => Either[String, String]): Result =
    for {
      s <- evalText(c.args(0), ctx)
      r <- f(s)
      nc <- c.args(0).set(ctx, JStr(r))
    } yield nc

  private def zone(tz: String): Either[String, ZoneId] =
    // SHORT_IDS so Go-accepted abbreviations (EST, PST, IST...) resolve
    try Right(ZoneId.of(tz, ZoneId.SHORT_IDS))
    catch { case _: Exception => Left(s"bad timezone $tz") }

  private def pattern(p: String): Either[String, DateTimeFormatter] =
    // reference formats are PHP-style tokens (Y-m-d H:i:s), converted per
    // pkg/transform/function/util/time.go:22-51
    try Right(DateTimeFormatter.ofPattern(DateFormats.phpToJava(p)))
    catch { case e: Exception => Left(s"bad pattern $p: ${e.getMessage}") }

  // ---- dispatch ----------------------------------------------------------

  def execute(c: Command, ctx: Ctx): Result = c.name match {

    // == structs (action/structs/*.go) ==
    case "create" => // error if path exists (create.go:31-57)
      for {
        v <- c.args(1).evaluate(ctx)
        _ <- requireAbsent(c.args(0), ctx)
        nc <- c.args(0).set(ctx, v)
      } yield nc

    case "delete" => c.args(0).delete(ctx) // delete.go:28-44

    case "replace" => // error if path missing (replace.go:31-57)
      for {
        v <- c.args(1).evaluate(ctx)
        _ <- c.args(0).evaluate(ctx).left.map(_ => s"key ${c.args(0).original} not exists")
        nc <- c.args(0).set(ctx, v)
      } yield nc

    case "move" | "rename" => // copy then delete source; error if target exists
      for {
        v <- c.args(0).evaluate(ctx)
        _ <- requireAbsent(c.args(1), ctx)
        c1 <- c.args(1).set(ctx, v)
        c2 <- c.args(0).delete(c1)
      } yield c2

    case "duplicate" => // copy, keep source; error if target exists
      for {
        v <- c.args(0).evaluate(ctx)
        _ <- requireAbsent(c.args(1), ctx)
        nc <- c.args(1).set(ctx, v)
      } yield nc

    // == math (function/math_functions.go:23-68) ==
    case "math_add" =>
      val ops = c.args.drop(1).map(evalFloat(_, ctx))
      ops.collectFirst { case Left(e) => Left(e) }.getOrElse {
        c.args(0).set(ctx, JDouble(ops.map(_.toOption.get).sum))
      }
    case "math_sub" =>
      for {
        a <- evalFloat(c.args(1), ctx); b <- evalFloat(c.args(2), ctx)
        nc <- c.args(0).set(ctx, JDouble(a - b))
      } yield nc
    case "math_mul" =>
      val ops = c.args.drop(1).map(evalFloat(_, ctx))
      ops.collectFirst { case Left(e) => Left(e) }.getOrElse {
        c.args(0).set(ctx, JDouble(ops.map(_.toOption.get).product))
      }
    case "math_div" =>
      for {
        a <- evalFloat(c.args(1), ctx); b <- evalFloat(c.args(2), ctx)
        _ <- if (b == 0) Left("division by zero") else Right(())
        nc <- c.args(0).set(ctx, JDouble(a / b))
      } yield nc

    // == datetime (function/datatime_functions.go) — source==target ==
    case "date_format" => // RFC3339 text -> pattern, optional tz (default UTC)
      stString(c, ctx) { s =>
        for {
          fmt <- evalText(c.args(1), ctx).flatMap(pattern)
          tz <- if (c.args.size > 2) evalText(c.args(2), ctx).flatMap(zone) else Right(ZoneId.of("UTC"))
          r <- try Right(OffsetDateTime.parse(s).atZoneSameInstant(tz).format(fmt))
               catch { case e: Exception => Left(s"date_format: ${e.getMessage}") }
        } yield r
      }
    case "unix_time_format" => // unix seconds -> pattern, optional tz
      for {
        sec <- c.args(0).evaluate(ctx).flatMap(VCast.toInt)
        fmt <- evalText(c.args(1), ctx).flatMap(pattern)
        tz <- if (c.args.size > 2) evalText(c.args(2), ctx).flatMap(zone) else Right(ZoneId.of("UTC"))
        r <- try Right(Instant.ofEpochSecond(sec).atZone(tz).format(fmt))
             catch { case e: Exception => Left(s"unix_time_format: ${e.getMessage}") }
        nc <- c.args(0).set(ctx, JStr(r))
      } yield nc
    case "convert_timezone" => // parse in source tz, render in target tz
      stString(c, ctx) { s =>
        for {
          from <- evalText(c.args(1), ctx).flatMap(zone)
          to <- evalText(c.args(2), ctx).flatMap(zone)
          fmt <- (if (c.args.size > 3) evalText(c.args(3), ctx) else Right("Y-m-d H:i:s")).flatMap(pattern)
          r <- try Right(LocalDateTime.parse(s, fmt).atZone(from).withZoneSameInstant(to).format(fmt))
               catch { case e: Exception => Left(s"convert_timezone: ${e.getMessage}") }
        } yield r
      }

    // == strings (function/strings_functions.go) ==
    case "join" => // ["join", target, sep, arr...]: arrays joined, sep between arrays too
      for {
        sep <- evalText(c.args(1), ctx)
        arrs <- c.args.drop(2).foldLeft[Either[String, Vector[Vector[String]]]](Right(Vector.empty)) {
          case (Left(e), _) => Left(e)
          case (Right(acc), a) => evalStrArr(a, ctx).map(acc :+ _)
        }
        nc <- c.args(0).set(ctx, JStr(arrs.map(_.mkString(sep)).mkString(sep)))
      } yield nc

    case "upper_case" => stString(c, ctx)(s => Right(s.toUpperCase))
    case "lower_case" => stString(c, ctx)(s => Right(s.toLowerCase))
    case "add_prefix" =>
      stString(c, ctx)(s => evalText(c.args(1), ctx).map(p => p + s))
    case "add_suffix" =>
      stString(c, ctx)(s => evalText(c.args(1), ctx).map(p => s + p))
    case "replace_string" =>
      stString(c, ctx) { s =>
        for { sub <- evalText(c.args(1), ctx); rep <- evalText(c.args(2), ctx) }
          yield s.replace(sub, rep)
      }
    case "replace_with_regex" => // Go RE2 vs Java regex divergence noted in SURVEY §7.8
      stString(c, ctx) { s =>
        for {
          expr <- evalText(c.args(1), ctx)
          rep <- evalText(c.args(2), ctx)
          r <- try Right(expr.r.replaceAllIn(s, java.util.regex.Matcher.quoteReplacement(rep)))
               catch { case e: Exception => Left(s"bad regex: ${e.getMessage}") }
        } yield r
      }
    case "replace_between_positions" => // byte-splice [start,end) (strings_functions.go:87-106)
      stString(c, ctx) { s =>
        val b = u8(s)
        for {
          start <- evalInt(c.args(1), ctx); end <- evalInt(c.args(2), ctx)
          rep <- evalText(c.args(3), ctx)
          _ <- if (start >= b.length) Left("start position must be less than the length of the string")
               else if (end >= b.length) Left("end position must be less than the length of the string")
               else if (start >= end) Left("start position must be less than end position")
               else Right(())
        } yield u8str(b, 0, start) + rep + u8str(b, end, b.length)
      }
    case "replace_between_delimiters" => // first start..end region inclusive of delimiters
      stString(c, ctx) { s =>
        for {
          sd <- evalText(c.args(1), ctx); ed <- evalText(c.args(2), ctx)
          rep <- evalText(c.args(3), ctx)
          _ <- if (sd.isEmpty || ed.isEmpty) Left("start or end delimiter is empty") else Right(())
          si = s.indexOf(sd)
          _ <- if (si < 0) Left("start delimiter does not exist") else Right(())
          from = si + sd.length
          ei = s.indexOf(ed, from)
          _ <- if (ei < 0) Left("end delimiter does not exist") else Right(())
        } yield s.substring(0, si) + rep + s.substring(ei + ed.length)
      }
    case "capitalize_sentence" => // uppercase first char only
      stString(c, ctx)(s => Right(if (s.isEmpty) s else s.head.toUpper +: s.tail))
    case "capitalize_word" => // title-case each whitespace-separated word
      stString(c, ctx) { s =>
        val cs = s.toCharArray
        var inWord = false
        var i = 0
        while (i < cs.length) {
          if (!cs(i).isWhitespace) {
            if (!inWord) cs(i) = cs(i).toTitleCase
            inWord = true
          } else inWord = false
          i += 1
        }
        Right(new String(cs))
      }

    // splits: target is the LAST arg; value read from arg0
    case "split_with_delimiter" => // -> string array
      for {
        s <- evalText(c.args(0), ctx); sep <- evalText(c.args(1), ctx)
        parts = splitLikeGo(s, sep)
        nc <- c.args(2).set(ctx, JArr(parts.map(JStr(_))))
      } yield nc
    case "split_from_start" => // [s[:pos], s[pos:]]; pos<=0 error; pos>=len -> [s, ""]
      for {
        s <- evalText(c.args(0), ctx); p <- evalInt(c.args(1), ctx)
        _ <- if (p <= 0) Left("split position must be more than zero") else Right(())
        b = u8(s)
        parts = if (p >= b.length) Vector(s, "")
          else Vector(u8str(b, 0, p), u8str(b, p, b.length))
        nc <- c.args(2).set(ctx, JArr(parts.map(JStr(_))))
      } yield nc
    case "split_between_positions" =>
      // 3 byte-spliced parts (split_between_positions.go:63-89): target
      // must be absent; start ≥ end errors; out-of-range positions pad
      // with empty parts instead of erroring
      for {
        s <- evalText(c.args(0), ctx)
        start <- evalInt(c.args(1), ctx); end <- evalInt(c.args(2), ctx)
        _ <- requireAbsent(c.args(3), ctx)
        _ <- if (start >= end) Left("start position must be less than the endPosition")
             else Right(())
        b = u8(s)
        parts =
          if (start >= b.length) Vector(s, "", "")
          else if (end > b.length)
            Vector(u8str(b, 0, start), u8str(b, start, b.length), "")
          else Vector(u8str(b, 0, start), u8str(b, start, end), u8str(b, end, b.length))
        nc <- c.args(3).set(ctx, JArr(parts.map(JStr(_))))
      } yield nc
    case "split_with_intervals" => // [s[:start], byte chunks of interval]; error if target exists
      for {
        s <- evalText(c.args(0), ctx)
        start <- evalInt(c.args(1), ctx); interval <- evalInt(c.args(2), ctx)
        _ <- if (interval <= 0) Left("interval must be positive") else Right(())
        _ <- requireAbsent(c.args(3), ctx)
        b = u8(s)
        parts = if (start > b.length || start < 0) Vector(s)
          else Vector(u8str(b, 0, start)) ++
            (start until b.length by interval).map(i =>
              u8str(b, i, math.min(i + interval, b.length))).toVector
        nc <- c.args(3).set(ctx, JArr(parts.map(JStr(_))))
      } yield nc

    // extracts: target is arg1 (extract_between_*.go)
    case "extract_between_delimiters" => // strictly between first start and next end delim
      for {
        s <- evalText(c.args(0), ctx)
        sd <- evalText(c.args(2), ctx); ed <- evalText(c.args(3), ctx)
        si = s.indexOf(sd)
        _ <- if (sd.isEmpty || si < 0) Left("start delimiter does not exist") else Right(())
        from = si + sd.length
        ei = s.indexOf(ed, from)
        _ <- if (ed.isEmpty || ei < 0) Left("end delimiter does not exist") else Right(())
        nc <- c.args(1).set(ctx, JStr(s.substring(from, ei)))
      } yield nc
    case "extract_between_positions" =>
      // 1-based inclusive byte positions (extract_between_positions.go:
      // 59-71), bounds-checked in the reference's order
      for {
        s <- evalText(c.args(0), ctx)
        start <- evalInt(c.args(2), ctx); end <- evalInt(c.args(3), ctx)
        b = u8(s)
        _ <- if (start > b.length) Left("start position must be equal or less than the length of the string")
             else if (start < 1) Left("start position must be more than zero")
             else if (end > b.length) Left("end position must be equal or less than the length of the string")
             else if (start > end) Left("start position must be equal or less than end position")
             else Right(())
        nc <- c.args(1).set(ctx, JStr(u8str(b, start - 1, end)))
      } yield nc

    case "check_custom_values" => // contains ternary (check_custom_values.go:32-68)
      for {
        s <- evalText(c.args(0), ctx); needle <- evalText(c.args(1), ctx)
        tv <- c.args(3).evaluate(ctx); fv <- c.args(4).evaluate(ctx)
        nc <- c.args(2).set(ctx, if (s.contains(needle)) tv else fv)
      } yield nc

    case "extract_missing" => // tVal if src is EMPTY STRING, fVal otherwise
      for {
        s <- evalText(c.args(0), ctx)
        tv <- c.args(2).evaluate(ctx); fv <- c.args(3).evaluate(ctx)
        nc <- c.args(1).set(ctx, if (s.isEmpty) tv else fv)
      } yield nc

    // == condition (condition/condition_if_action.go:32-87) ==
    case "condition_if" => // == compares strings; ordered ops compare floats
      val (target, left, opA, right, tA, fA) =
        (c.args(0), c.args(1), c.args(2), c.args(3), c.args(4), c.args(5))
      for {
        op <- evalText(opA, ctx)
        result <- op match {
          case "==" =>
            for { l <- evalText(left, ctx); r <- evalText(right, ctx) } yield l == r
          case ">=" | ">" | "<=" | "<" =>
            for { l <- evalFloat(left, ctx); r <- evalFloat(right, ctx) } yield op match {
              case ">=" => l >= r
              case ">" => l > r
              case "<=" => l <= r
              case "<" => l < r
            }
          case other => Left(s"not support op [$other]")
        }
        v <- (if (result) tA else fA).evaluate(ctx)
        nc <- target.set(ctx, v)
      } yield nc

    // == arrays ==
    case "array_foreach" => // run nested action(s) per element as its own data root
      for {
        arr <- c.args(0).evaluate(ctx).flatMap(VCast.toArray)
        subCmds <- parseSubCommands(c.rawArgs(1))
        out <- arr.zipWithIndex.foldLeft[Either[String, Vector[JValue]]](Right(Vector.empty)) {
          case (Left(e), _) => Left(e)
          case (Right(acc), (el, i)) =>
            subCmds.foldLeft[Either[String, Ctx]](Right(Ctx.dataOnly(el))) {
              case (Left(e), _) => Left(e)
              case (Right(sub), cmd) => cmd.execute(sub)
            } match {
              case Left(e) => Left(s"action ${i + 1}st execute error: $e")
              case Right(sub) => Right(acc :+ sub.data)
            }
        }
        nc <- c.args(0).set(ctx, JArr(out))
      } yield nc

    case "render_array" => // per-index zip of projections into a text template
      for {
        rendered <- RenderArray.run(c, ctx)
        nc <- c.args(0).set(ctx, rendered)
      } yield nc

    case "unfold_array" => // sibling keys prefix-0, prefix-1, ... (unfold_array.go:35-74)
      for {
        arr <- c.args(0).evaluate(ctx).flatMap(VCast.toArray)
        prefixPath <- c.args(1) match {
          case Arg.DataPath(p, _) => Right(p)
          case other => Left(s"unfold_array: target must be a data path, got ${other.original}")
        }
        nc <- arr.zipWithIndex.foldLeft[Either[String, Ctx]](Right(ctx)) {
          case (Left(e), _) => Left(e)
          case (Right(cur), (el, i)) =>
            Arg.DataPath(s"$prefixPath-$i", s"$$.data.$prefixPath-$i").set(cur, el)
        }
      } yield nc

    // == common ==
    case "length" => // len of string/array/map (common_function.go:23-39)
      for {
        v <- c.args(1).evaluate(ctx)
        n <- v match {
          case JStr(s) => Right(s.length)
          case JArr(items) => Right(items.size)
          case JObj(fields) => Right(fields.size)
          case other => Left(s"length: undefined for ${JPath.typeName(other)}")
        }
        nc <- c.args(0).set(ctx, JInt(n))
      } yield nc

    // == source (source/convert_to_mongodb_sink.go:33-112) ==
    case "debezium_convert_to_mongodb_sink" =>
      Debezium.convert(c, ctx)

    case other => Left(s"unknown action $other")
  }

  /** Go strings.Split semantics: empty input yields [""], separator found
    * means n+1 parts (Java's split drops trailing empties; Go keeps them).
    */
  def splitLikeGo(s: String, sep: String): Vector[String] =
    if (sep.isEmpty) s.map(_.toString).toVector
    else {
      val out = Vector.newBuilder[String]
      var from = 0
      var i = s.indexOf(sep)
      while (i >= 0) {
        out += s.substring(from, i)
        from = i + sep.length
        i = s.indexOf(sep, from)
      }
      out += s.substring(from)
      out.result()
    }

  private def parseSubCommands(raw: JValue): Either[String, Vector[Command]] = raw match {
    // a single command ["upper_case", "@.x"] or a list of commands
    case JArr(items) if items.headOption.exists(_.isInstanceOf[JStr]) =>
      Command.parse(JArr(items)).map(Vector(_))
    case JArr(items) =>
      items.foldLeft[Either[String, Vector[Command]]](Right(Vector.empty)) {
        case (Left(e), _) => Left(e)
        case (Right(acc), it) => Command.parse(it).map(acc :+ _)
      }
    case o: JObj => Command.parse(o).map(Vector(_))
    case other => Left(s"array_foreach: invalid sub-command ${other.render}")
  }

  private object RenderArray {
    /** action/array/render.go:36-113 — template holes are `<@.path>`;
      * projections are `root[:]&lt;holePath&gt;`; all holes must project the
      * same length; the result is that many rendered strings.
      */
    def run(c: Command, ctx: Ctx): Either[String, JValue] = {
      val rootOriginal = c.args(1).original
      if (!rootOriginal.startsWith("$.data")) return Left("render_array: root must be a data path")
      val rootPath = if (rootOriginal == "$.data") "" else rootOriginal.substring(7)
      val template = c.rawArgs(2) match {
        case JStr(s) => s
        case other => return Left(s"render_array: template must be a string, got ${other.render}")
      }
      // parse template into literals and hole paths
      val lits = Vector.newBuilder[String]
      val holes = Vector.newBuilder[String]
      var pos = 0
      val sb = new StringBuilder
      while (pos < template.length) {
        val x = template.indexOf("<@", pos)
        if (x < 0) { sb.append(template.substring(pos)); pos = template.length }
        else {
          val y = template.indexOf(">", x + 2)
          if (y < 0) { sb.append(template.substring(pos)); pos = template.length }
          else {
            sb.append(template.substring(pos, x))
            lits += sb.toString; sb.clear()
            val hole = template.substring(x + 2, y) // e.g. ".name" or ""
            holes += hole.stripPrefix(".")
            pos = y + 1
          }
        }
      }
      lits += sb.toString
      val litV = lits.result()
      val holeV = holes.result()
      if (holeV.isEmpty) return Right(JArr(Vector(JStr(litV.mkString))))

      val projections = holeV.map { h =>
        val p = (if (rootPath.isEmpty) "" else rootPath) + "[:]" + (if (h.isEmpty) "" else "." + h)
        JPath.getAll(ctx.data, JPath.parse(p))
      }
      val lens = projections.map(_.size).distinct
      if (lens.size != 1)
        return Left(s"render_array: hole arrays differ in length: ${projections.map(_.size).mkString(",")}")
      val n = lens.head
      val rows = (0 until n).map { i =>
        val parts = new StringBuilder
        var k = 0
        while (k < holeV.size) {
          parts.append(litV(k))
          parts.append(VCast.toText(projections(k)(i)).getOrElse(""))
          k += 1
        }
        parts.append(litV.last)
        JStr(parts.toString): JValue
      }.toVector
      Right(JArr(rows))
    }
  }

  private object Debezium {
    /** Debezium CDC op (`iodebeziumop` ∈ r/c/u/d) → MongoDB bulk-write doc
      * replacing the whole body; command args are the unique key names.
      */
    def convert(c: Command, ctx: Ctx): Result = {
      val keys = c.rawArgs.collect { case JStr(s) => s }
      for {
        ev <- ctx.event.toRight("debezium: no event in context")
        op <- ev.lookupAttr("iodebeziumop").toRight("attribute iodebeziumop not found")
        body <- ctx.data match {
          case o: JObj => Right(o)
          case other => Left(s"debezium: body must be an object, got ${JPath.typeName(other)}")
        }
        doc <- op match {
          case "r" | "c" =>
            Right(JObj.of("inserts" -> JArr(Vector(body))))
          case "u" =>
            for (f <- filterOf(body, keys)) yield {
              val rest = JObj(body.fields.filterNot { case (k, _) => keys.contains(k) })
              JObj.of("updates" -> JArr(Vector(JObj.of(
                "filter" -> f, "update" -> JObj.of("$set" -> rest)))))
            }
          case "d" =>
            for (f <- filterOf(body, keys)) yield
              JObj.of("deletes" -> JArr(Vector(JObj.of("filter" -> f))))
          case other => Left(s"debezium: unsupported op $other")
        }
        nc <- Arg.DataAll("$.data").set(ctx, doc)
      } yield nc
    }

    private def filterOf(body: JObj, keys: Seq[String]): Either[String, JObj] = {
      val missing = keys.filterNot(body.fields.contains)
      if (keys.isEmpty) Left("debezium: no unique key specified")
      else if (missing.nonEmpty) Left(s"debezium: unique keys missing: ${missing.mkString(",")}")
      else Right(JObj(VectorMap.from(keys.map(k => k -> body.fields(k)))))
    }
  }
}
