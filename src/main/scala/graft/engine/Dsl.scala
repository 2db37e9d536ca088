package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** The pipeline DSL: a faithful model of the reference's stream resource
  * JSON (pipeline/definition.go:12-34, stage.go:68-148, and the JSON files
  * under examples/), parsed with Jackson (already on the Spark classpath).
  *
  * An app declares `resources` (named pipelines); each pipeline has typed
  * input/output metadata and an ordered list of stages; each stage wraps an
  * activity ref (#aggregate, #filter, #log) with settings, an input mapper
  * and an output mapper. Actions bind pipelines to optional `groupBy` and
  * `outputChannel` settings (action.go:32,107-115).
  */
object Dsl {

  case class FieldDef(name: String, typ: String)

  case class StageDef(ref: String,
                      settings: Map[String, String],
                      input: Map[String, String],
                      output: Map[String, String])

  case class PipelineDef(id: String,
                         inputs: Seq[FieldDef],
                         outputs: Seq[FieldDef],
                         stages: Seq[StageDef],
                         groupBy: Option[String] = None,
                         outputChannel: Option[String] = None)

  /** One trigger handler from an app definition (the unit the
    * reference builds one streamtester emitter per —
    * trigger/streamtester/tester.go:52-60): named after the handler's
    * explicit `name`, else its action id, else `<trigger>-<idx>`. */
  case class HandlerDef(name: String, settings: Map[String, String],
                        actionId: String)

  case class TriggerDef(id: String, ref: String,
                        settings: Map[String, String],
                        handlers: Seq[HandlerDef])

  case class AppDef(channels: Seq[String], pipelines: Map[String, PipelineDef],
                    triggers: Seq[TriggerDef] = Nil)

  private val mapper = new ObjectMapper()

  /** Parse a full app JSON (flogo:app shape). Trigger wiring is runtime
    * concern (see graft.streaming); here we extract channels, resources
    * and the action-level settings that affect pipeline compilation. */
  def parseApp(json: String): AppDef = {
    val root = mapper.readTree(json)
    val channels = arr(root, "channels").map(_.asText.split(":")(0))
    // action id -> (resource id, groupBy, outputChannel)
    val actions = arr(root, "actions").map { a =>
      val settings = Option(a.get("settings"))
      val uri = settings.flatMap(s => Option(s.get("streamURI")))
        .map(_.asText).getOrElse("")
      val resId = uri.stripPrefix("res://")
      (text(a, "id"),
        resId,
        settings.flatMap(s => Option(s.get("groupBy"))).map(_.asText),
        settings.flatMap(s => Option(s.get("outputChannel"))).map(_.asText))
    }
    val resources = arr(root, "resources").map { r =>
      text(r, "id") -> parsePipelineData(text(r, "id"), r.get("data"))
    }.toMap
    // pipelines keyed by ACTION id, with action settings applied;
    // resources not referenced by an action are exposed under their own id
    val byAction = actions.flatMap { case (aid, resId, gb, oc) =>
      resources.get(resId).map(p =>
        aid -> p.copy(groupBy = gb, outputChannel = oc))
    }.toMap
    val triggers = arr(root, "triggers").map { t =>
      val tid = text(t, "id")
      val handlers = arr(t, "handlers").zipWithIndex.map { case (h, i) =>
        val aid = Option(h.get("action"))
          .map(a => text(a, "id")).getOrElse("")
        val name = Some(text(h, "name")).filter(_.nonEmpty)
          .orElse(Some(aid).filter(_.nonEmpty))
          .getOrElse(s"$tid-$i")
        HandlerDef(name, objMap(h, "settings"), aid)
      }
      TriggerDef(tid, text(t, "ref").stripPrefix("#"),
        objMap(t, "settings"), handlers)
    }
    AppDef(channels, resources ++ byAction, triggers)
  }

  /** Parse a bare stream resource (the `data` object of a resource). */
  def parsePipeline(id: String, json: String): PipelineDef =
    parsePipelineData(id, mapper.readTree(json))

  private def parsePipelineData(id: String, data: JsonNode): PipelineDef = {
    val md = Option(data.get("metadata"))
    def fields(key: String): Seq[FieldDef] =
      md.map(m => arr(m, key).map(f => FieldDef(text(f, "name"), text(f, "type"))))
        .getOrElse(Nil)
    val stages = arr(data, "stages").map { s =>
      StageDef(text(s, "ref").stripPrefix("#"),
        objMap(s, "settings"), objMap(s, "input"), objMap(s, "output"))
    }
    PipelineDef(id, fields("input"), fields("output"), stages)
  }

  // --------------------------------------------------------------------
  // Definition loading (action.go:80-103, manager.go:55-168,
  // resource.go:26-46): file:// URIs with gzip sniffing, and the
  // base64+gzip encoding the reference uses for `flogo-compressed`
  // HTTP payloads.
  // --------------------------------------------------------------------

  /** Load an app definition from a URI. Supports `file://` (and bare
    * paths), `http(s)://` with an in-process cache and the reference's
    * `flogo-compressed` response header (manager.go:55-168), transparently
    * un-gzipping when the payload starts with the gzip magic bytes
    * (manager.go's sniffing), and `base64://` payloads (base64-encoded
    * gzip, the reference's flogo-compressed wire format). */
  def loadApp(uri: String): AppDef = parseApp(loadJson(uri))

  // remote definitions are fetched once per URI per process, like the
  // reference's definition manager cache (manager.go:55-69)
  private val remoteCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Drop all cached remote definitions (re-fetch on next load). */
  def clearRemoteCache(): Unit = remoteCache.clear()

  def loadJson(uri: String): String = {
    if (uri.startsWith("http://") || uri.startsWith("https://"))
      return remoteCache.getOrElseUpdate(uri, fetchRemote(uri))
    val bytes: Array[Byte] =
      if (uri.startsWith("base64://"))
        java.util.Base64.getDecoder.decode(uri.stripPrefix("base64://"))
      else {
        val path = uri.stripPrefix("file://")
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      }
    new String(gunzipIfNeeded(bytes), java.nio.charset.StandardCharsets.UTF_8)
  }

  private def fetchRemote(uri: String): String = {
    val conn = new java.net.URL(uri).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(15000)
    try {
      require(conn.getResponseCode == 200,
        s"definition fetch failed: HTTP ${conn.getResponseCode} for $uri")
      val raw = conn.getInputStream.readAllBytes()
      // flogo-compressed: body is base64(gzip(json)) — manager.go:129-149
      val compressed = Option(conn.getHeaderField("flogo-compressed"))
        .exists(_.equalsIgnoreCase("true"))
      val bytes =
        if (compressed)
          java.util.Base64.getDecoder.decode(
            new String(raw, java.nio.charset.StandardCharsets.US_ASCII).trim)
        else raw
      new String(gunzipIfNeeded(bytes), java.nio.charset.StandardCharsets.UTF_8)
    } finally conn.disconnect()
  }

  private def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes

  private def arr(n: JsonNode, key: String): Seq[JsonNode] =
    Option(n.get(key)).map(_.elements().asScala.toSeq).getOrElse(Nil)
  private def text(n: JsonNode, key: String): String =
    Option(n.get(key)).map(_.asText).getOrElse("")
  private def objMap(n: JsonNode, key: String): Map[String, String] =
    Option(n.get(key)).map(o =>
      o.fieldNames.asScala.map(k => k -> o.get(k).asText).toMap)
      .getOrElse(Map.empty)

  // --------------------------------------------------------------------
  // Expression language (pipeline/support/mapper.go:21-62; scopes
  // pipeline/scope.go:10-14, resolve.go:11-16)
  // --------------------------------------------------------------------

  /** Reserved column-name prefixes for the non-default scopes. */
  val PipelinePrefix = "__pipeline_"
  val PassthruPrefix = "__passthru_"

  /** flogo functions that are a pure rename of a Spark SQL builtin with
    * identical argument conventions. */
  private val Renames: Map[String, String] = Map(
    "string.concat"     -> "concat",
    "string.length"     -> "length",
    "string.upper"      -> "upper",
    "string.lower"      -> "lower",
    "string.contains"   -> "contains",
    "string.startsWith" -> "startswith",
    "string.endsWith"   -> "endswith",
    "string.trim"       -> "trim",
    "string.trimLeft"   -> "ltrim",
    "string.trimRight"  -> "rtrim",
    // Spark's replace() replaces every occurrence, matching flogo's
    // strings.Replace(-1) behavior
    "string.replace"    -> "replace",
    "string.repeat"     -> "repeat",
    "number.round"      -> "round",
    "math.abs"          -> "abs",
    "math.ceil"         -> "ceil",
    "math.floor"        -> "floor",
    "array.contains"    -> "array_contains",
    "array.length"      -> "size",
    "array.count"       -> "size",
    // flogo array.append(items, item) returns a new array with the
    // element added at the end — exactly Spark's array_append
    "array.append"      -> "array_append",
    // flogo array.merge(arr1, arr2) concatenates; Spark concat is
    // variadic over arrays with the same semantics
    "array.merge"       -> "concat",
    "coerce.toString"   -> "string",
    "coerce.toInt64"    -> "bigint",
    "coerce.toFloat64"  -> "double")

  /** flogo functions whose argument (or result) conventions differ from
    * the Spark builtin, rewritten argument-wise. Every template fails
    * loudly on wrong arity — silently dropping arguments would corrupt
    * the pipeline, not flag the bug. */
  private def template(name: String, args: Seq[String],
                       now: Option[Long]): Option[String] = {
    def arity(n: Int, sig: String): Unit = require(args.length == n,
      s"$name takes $sig, got ${args.length} argument(s)")
    name match {
      case "string.substring" =>
        // flogo substring(str, start, length) is 0-based (Go slicing);
        // Spark's substring is 1-based
        arity(3, "(str, start, length)")
        Some(s"substring(${args(0)}, (${args(1)}) + 1, ${args(2)})")
      case "string.split" =>
        // flogo splits on a LITERAL separator; Spark's split takes a
        // Java regex — \Q...\E quotes the separator verbatim (a
        // separator containing \E is the one unrepresentable case)
        arity(2, "(str, separator)")
        Some(s"split(${args(0)}, concat('\\\\Q', ${args(1)}, '\\\\E'))")
      case "string.indexOf" =>
        // flogo is 0-based with -1 for absent; instr is 1-based with 0
        // for absent — one shift covers both
        arity(2, "(str, substr)")
        Some(s"(instr(${args(0)}, ${args(1)}) - 1)")
      case "string.lastIndexOf" =>
        // flogo mirrors Go strings.LastIndex: 0-based, -1 for absent.
        // Spark has no last-occurrence builtin; locate it through the
        // reversed strings — instr(reverse(s), reverse(sub)) is the
        // 1-based offset of the LAST occurrence measured from the right
        // end, so start = length(s) - rpos - length(sub) + 1. The empty
        // substring falls out right too (instr(s, '') = 1 → length(s),
        // matching Go).
        arity(2, "(str, substr)")
        val (s, sub) = (args(0), args(1))
        Some(s"(if(instr(reverse($s), reverse($sub)) = 0, -1, " +
          s"length($s) - instr(reverse($s), reverse($sub)) - " +
          s"length($sub) + 1))")
      case "json.path" =>
        // flogo json.path(expression, object) evaluates a JSONPath
        // against a value; Spark's get_json_object(json, path) takes
        // the same '$.a.b[0]' path syntax with the arguments swapped.
        // Operates on the JSON *string* column (the engine keeps JSON
        // payloads as strings until a schema is imposed).
        arity(2, "(path, json)")
        Some(s"get_json_object(${args(1)}, ${args(0)})")
      case "string.equals" =>
        arity(2, "(a, b)")
        Some(s"(${args(0)} = ${args(1)})")
      case "string.equalsIgnoreCase" =>
        arity(2, "(a, b)")
        Some(s"(lower(${args(0)}) = lower(${args(1)}))")
      case "datetime.now" =>
        // deterministic injection: a caller-supplied epoch-millis pin
        // makes pipelines replayable; without one, current_timestamp()
        // is flogo-faithful AND constant across the rows of one batch
        // (Spark evaluates it at query start)
        arity(0, "()")
        Some(now.map(ms => s"timestamp_millis(${ms}L)")
          .getOrElse("current_timestamp()"))
      case _ => None
    }
  }

  private val TemplateNames = Seq("string.substring", "string.split",
    "string.indexOf", "string.lastIndexOf", "string.equals",
    "string.equalsIgnoreCase", "datetime.now", "json.path")

  // one pass matching EITHER a single-quoted literal (kept verbatim — a
  // blind String.replace would rewrite function names inside string
  // literals) OR a flogo function call at an identifier boundary (the
  // lookbehind stops `mynumber.round(` from matching `number.round(`)
  private val FuncRe =
    ("('(?:[^'\\\\]|\\\\.)*')|(?<![A-Za-z0-9_.$])(" +
      (Renames.keys ++ TemplateNames)
        .map(java.util.regex.Pattern.quote).mkString("|") +
      ")\\(").r

  /** Index of the ')' matching the '(' just before `from`, honoring
    * nesting and quoted literals. Loud failure on imbalance — a
    * truncated expression must not silently translate. */
  private def matchClose(e: String, from: Int): Int = {
    var i = from; var depth = 1
    while (i < e.length) {
      e.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < e.length && e.charAt(i) != '\'') {
            if (e.charAt(i) == '\\') i += 1
            i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"unbalanced parentheses in expression: $e")
  }

  /** Split an argument list at top-level commas (outside parens and
    * quotes). */
  private def splitTop(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && s.charAt(i) != '\'') {
            if (s.charAt(i) == '\\') i += 1
            i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start).trim
    out.result()
  }

  private def mapFuncs(e: String, now: Option[Long]): String = {
    val sb = new StringBuilder
    var rest = e
    while (rest.nonEmpty) {
      FuncRe.findFirstMatchIn(rest) match {
        case None =>
          sb.append(rest); rest = ""
        case Some(m) if m.group(1) != null => // quoted literal: verbatim
          sb.append(rest.substring(0, m.end)); rest = rest.substring(m.end)
        case Some(m) =>
          val name = m.group(2)
          val close = matchClose(rest, m.end)
          // rewrite nested flogo calls inside the argument list first
          val args = splitTop(mapFuncs(rest.substring(m.end, close), now))
          val rendered = template(name, args, now).getOrElse(
            s"${Renames(name)}(${args.mkString(", ")})")
          sb.append(rest.substring(0, m.start)).append(rendered)
          rest = rest.substring(close + 1)
      }
    }
    sb.toString
  }

  /** Translate a mapper value to a Spark SQL expression string.
    * `=`-prefixed values are expressions (scope refs + flogo function
    * names mapped to Spark SQL); anything else is a literal
    * (support/mapper.go:30-41). `now` pins datetime.now() to an epoch
    * millisecond for deterministic replay; unset, it maps to
    * current_timestamp() (constant within one batch). Unmapped
    * flogo-style function names pass through untranslated and fail
    * loudly at Spark's SQL parser/analyzer with the unmapped name in
    * the error. */
  def translate(value: String,
                env: Map[String, String] = Map.empty,
                props: Map[String, String] = Map.empty,
                now: Option[Long] = None): String = {
    if (value == null) return "NULL"
    if (!value.startsWith("=")) return literal(value)
    val e = mapFuncs(value.substring(1), now)
    // scope refs rewrite OUTSIDE quoted literals only — a JSONPath like
    // '$.a.b' inside a string literal must survive verbatim
    mapOutsideLiterals(e) { seg =>
      var s = seg
      s = "\\$env\\.([A-Za-z_][A-Za-z0-9_]*)".r.replaceAllIn(s,
        m => java.util.regex.Matcher.quoteReplacement(
          literal(env.getOrElse(m.group(1), ""))))
      s = "\\$property\\.([A-Za-z_][A-Za-z0-9_.]*)".r.replaceAllIn(s,
        m => java.util.regex.Matcher.quoteReplacement(
          literal(props.getOrElse(m.group(1), ""))))
      s = "\\$pipeline\\.([A-Za-z_][A-Za-z0-9_]*)".r.replaceAllIn(s,
        m => s"`$PipelinePrefix${m.group(1)}`")
      s = "\\$passthru\\.([A-Za-z_][A-Za-z0-9_]*)".r.replaceAllIn(s,
        m => s"`$PassthruPrefix${m.group(1)}`")
      s = "\\$\\.([A-Za-z_][A-Za-z0-9_]*)".r.replaceAllIn(s,
        m => s"`${m.group(1)}`")
      s
    }
  }

  /** Apply `f` to the segments of `e` that sit OUTSIDE single-quoted
    * string literals; literal segments (quotes included) pass through
    * verbatim. */
  private def mapOutsideLiterals(e: String)(f: String => String): String = {
    val sb = new StringBuilder
    var i = 0; var segStart = 0
    while (i < e.length) {
      if (e.charAt(i) == '\'') {
        sb.append(f(e.substring(segStart, i)))
        val litStart = i
        i += 1
        while (i < e.length && e.charAt(i) != '\'') {
          if (e.charAt(i) == '\\') i += 1
          i += 1
        }
        i = math.min(i + 1, e.length)
        sb.append(e.substring(litStart, i))
        segStart = i
      } else i += 1
    }
    sb.append(f(e.substring(segStart)))
    sb.toString
  }

  private def literal(v: String): String =
    if (v.matches("-?[0-9]+") || v.matches("-?[0-9]*\\.[0-9]+") ||
        v == "true" || v == "false") v
    else "'" + v.replace("'", "''") + "'"

  /** Reference type name -> Spark SQL type (coerce.ToType at
    * pipeline/instance.go:282). */
  def sparkType(t: String): String = t match {
    case "int" | "integer" => "int"
    case "long" | "int64"  => "bigint"
    case "float64" | "double" | "number" => "double"
    case "string"          => "string"
    case "bool" | "boolean" => "boolean"
    case "array"           => "array<double>"
    case other             => other
  }
}
