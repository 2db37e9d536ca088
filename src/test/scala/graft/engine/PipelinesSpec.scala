package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end DSL tests replaying the reference's own example apps
  * (examples/agg-flogo.json, examples/channel-flogo.json). */
class PipelinesSpec extends SparkSpec {

  private def readFile(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))

  test("expression translation: scopes, literals, functions") {
    assert(Dsl.translate("=$.input") == "`input`")
    assert(Dsl.translate("=$pipeline.rinput") == "`__pipeline_rinput`")
    assert(Dsl.translate("=$passthru.x + 1") == "`__passthru_x` + 1")
    assert(Dsl.translate("hello") == "'hello'")
    assert(Dsl.translate("42") == "42")
    assert(Dsl.translate("=string.concat('a: ', $.b)") == "concat('a: ', `b`)")
    // function mapping must not rewrite inside string literals, and
    // must not suffix-match longer identifiers (`mynumber.round` is a
    // different function, not `number.round`)
    assert(Dsl.translate("=string.concat('use math.abs(x) here', $.b)") ==
      "concat('use math.abs(x) here', `b`)")
    assert(Dsl.translate("=mynumber.round($.b)") == "mynumber.round(`b`)")
    assert(Dsl.translate("=$env.HOME", env = Map("HOME" -> "/root")) == "'/root'")
    assert(Dsl.translate("=$property.p", props = Map("p" -> "7")) == "7")
  }

  test("expression translation: extended flogo function breadth") {
    // renames
    assert(Dsl.translate("=string.endsWith($.a, 'x')") == "endswith(`a`, 'x')")
    assert(Dsl.translate("=string.replace($.a, 'x', 'y')") ==
      "replace(`a`, 'x', 'y')")
    assert(Dsl.translate("=math.ceil($.v)") == "ceil(`v`)")
    assert(Dsl.translate("=math.floor($.v)") == "floor(`v`)")
    assert(Dsl.translate("=array.length($.xs)") == "size(`xs`)")
    assert(Dsl.translate("=array.contains($.xs, 3)") ==
      "array_contains(`xs`, 3)")
    // argument-convention templates
    assert(Dsl.translate("=string.substring($.a, 1, 2)") ==
      "substring(`a`, (1) + 1, 2)")
    assert(Dsl.translate("=string.indexOf($.a, 'b')") ==
      "(instr(`a`, 'b') - 1)")
    assert(Dsl.translate("=string.equalsIgnoreCase($.a, 'B')") ==
      "(lower(`a`) = lower('B'))")
    // nested flogo calls rewrite inside argument lists
    assert(Dsl.translate("=string.substring(string.upper($.a), 0, 2)") ==
      "substring(upper(`a`), (0) + 1, 2)")
    // long-tail renames and templates
    assert(Dsl.translate("=array.append($.xs, 4)") ==
      "array_append(`xs`, 4)")
    assert(Dsl.translate("=array.merge($.xs, $.ys)") ==
      "concat(`xs`, `ys`)")
    assert(Dsl.translate("=json.path('$.a.b', $.doc)") ==
      "get_json_object(`doc`, '$.a.b')")
    intercept[IllegalArgumentException] {
      Dsl.translate("=string.lastIndexOf($.a)")
    }
    // deterministic datetime injection
    assert(Dsl.translate("=datetime.now()", now = Some(86400000L)) ==
      "timestamp_millis(86400000L)")
    assert(Dsl.translate("=datetime.now()") == "current_timestamp()")
    // loud failures: wrong arity, unbalanced parens
    intercept[IllegalArgumentException] {
      Dsl.translate("=string.substring($.a, 1)")
    }
    intercept[IllegalArgumentException] {
      Dsl.translate("=string.upper($.a")
    }
  }

  test("extended functions evaluate with flogo conventions in Spark") {
    val s = spark
    import s.implicits._
    val df = Seq(("hello world", Seq(1, 2, 3))).toDF("a", "xs")
    def eval(e: String): Any =
      df.selectExpr(Dsl.translate(e)).collect()(0).get(0)
    // flogo substring is 0-based
    assert(eval("=string.substring($.a, 0, 5)") == "hello")
    assert(eval("=string.substring($.a, 6, 5)") == "world")
    // flogo split is a LITERAL separator — '.' must not be a regex
    assert(eval("=string.split('a.b.c', '.')") == Seq("a", "b", "c"))
    // flogo indexOf is 0-based, -1 when absent
    assert(eval("=string.indexOf($.a, 'world')") == 6)
    assert(eval("=string.indexOf($.a, 'zzz')") == -1)
    assert(eval("=string.endsWith($.a, 'rld')") == true)
    assert(eval("=string.equalsIgnoreCase($.a, 'HELLO WORLD')") == true)
    assert(eval("=array.length($.xs)") == 3)
    assert(eval("=array.contains($.xs, 2)") == true)
    assert(eval("=array.append($.xs, 9)") == Seq(1, 2, 3, 9))
    assert(eval("=array.merge($.xs, $.xs)") == Seq(1, 2, 3, 1, 2, 3))
    // flogo lastIndexOf mirrors Go strings.LastIndex: 0-based, -1 absent,
    // empty substring -> length of the string
    assert(eval("=string.lastIndexOf('abcab', 'ab')") == 3)
    assert(eval("=string.lastIndexOf($.a, 'o')") == 7)
    assert(eval("=string.lastIndexOf($.a, 'zzz')") == -1)
    assert(eval("=string.lastIndexOf($.a, '')") == 11)
    // json.path evaluates a JSONPath against a JSON string column
    assert(eval("=json.path('$.k[1]', '{\"k\": [10, 20]}')") == "20")
    assert(eval("=math.ceil(1.2)").toString == "2")
    // pinned now() replays deterministically
    val pinned = df.selectExpr(Dsl.translate("=datetime.now()",
      now = Some(86400000L))).collect()(0).get(0)
    assert(pinned.toString.startsWith("1970-01-02"))
  }

  test("trigger parsing: ref strip, settings, handler-name fallbacks") {
    // the reference example's rest trigger parses with its handler
    // named by the action id (no explicit name)
    val app = Dsl.parseApp(readFile("/root/reference/examples/agg-flogo.json"))
    assert(app.triggers.map(_.ref) == Seq("rest"))
    assert(app.triggers.head.settings.get("port").contains("7777"))
    assert(app.triggers.head.handlers.map(_.name) == Seq("simple_agg"))
    // explicit handler name wins; a handler with neither name nor
    // action id falls back to <trigger>-<idx>
    val synth = Dsl.parseApp(
      """{"triggers": [{"id": "t1", "ref": "#x", "handlers": [
        |  {"name": "explicit", "action": {"id": "a0"}},
        |  {"settings": {}},
        |  {"action": {"id": "a2"}}
        |]}]}""".stripMargin)
    assert(synth.triggers.head.handlers.map(_.name) ==
      Seq("explicit", "t1-1", "a2"))
  }

  test("agg-flogo.json: timeTumbling sum pipeline end-to-end (batch)") {
    val s = spark
    import s.implicits._
    val app = Dsl.parseApp(readFile("/root/reference/examples/agg-flogo.json"))
    val p = app.pipelines("simple_agg")
    assert(p.stages.map(_.ref) == Seq("aggregate", "log"))
    // pane 0 (ts 0..4999): 1+2+3+4+5 = 15; pane 1: 10+15 = 25
    val input = Seq((1, 0L), (2, 1000L), (3, 2000L), (4, 3000L), (5, 4000L),
        (10, 5000L), (15, 6000L))
      .zipWithIndex
      .map { case ((v, ms), i) => (v, ms, i.toLong) }
      .toDF("input", "ms", "__seq")
      .withColumn("__ts", timestamp_millis(col("ms")))
    val out = Pipelines.compileBatch(p, input)
    assert(out.columns.toSeq == Seq("result"))
    assert(out.orderBy("result").collect().map(_.getInt(0)).toSeq == Seq(15, 25))
  }

  test("channel-flogo.json: filter pipeline + scope writes (batch)") {
    val s = spark
    import s.implicits._
    val app = Dsl.parseApp(readFile("/root/reference/examples/channel-flogo.json"))
    val filterP = app.pipelines("simple_filter")
    assert(filterP.outputChannel.contains("test"))
    val input = Seq(0, 5, 0, 7).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("input", "__seq")
    val out = Pipelines.compileBatch(filterP, input)
    // non-zero filter drops zeros; output mapper writes pipeline.out
    assert(out.columns.toSeq == Seq("out"))
    assert(out.orderBy("out").collect().map(_.getInt(0)).toSeq == Seq(5, 7))

    val reportP = app.pipelines("simple_report")
    val rin = Seq(5, 7).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("rinput", "__seq")
    val msgs = Pipelines.compileBatch(reportP, rin)
      .select("message").orderBy("message").collect().map(_.getString(0))
    assert(msgs.toSeq == Seq("fromChannel: 5", "fromChannel: 7"))
  }

  test("every window type compiles and returns zero rows on empty input") {
    val s = spark
    import s.implicits._
    for (wt <- Seq("tumbling", "sliding", "timeTumbling", "timeSliding")) {
      val p = Dsl.parsePipeline("p",
        s"""{
           |"metadata": {"input": [{"name":"v","type":"double"}],
           |             "output": [{"name":"result","type":"double"}]},
           |"stages": [{"ref":"#aggregate",
           |            "settings":{"function":"sum","windowType":"$wt",
           |                        "windowSize":"${if (wt.startsWith("time")) 1000 else 3}",
           |                        "resolution":"${if (wt == "timeSliding") 500 else 1}"},
           |            "input":{"value":"=$$.v"}}]
           |}""".stripMargin)
      val empty = Seq.empty[(Double, Long, java.sql.Timestamp)]
        .toDF("v", "__seq", "__ts")
      assert(Pipelines.compileBatch(p, empty).count() == 0L,
        s"windowType=$wt must yield no rows on empty input")
    }
    // empty input through the keyed path too
    val keyed = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"n","type":"string"},
        |                       {"name":"v","type":"double"}]},
        |"stages": [{"ref":"#aggregate",
        |            "settings":{"function":"sum","windowType":"tumbling",
        |                        "windowSize":"3",
        |                        "nameKey":"=$.n","valueKey":"=$.v"}}]
        |}""".stripMargin)
    val emptyKeyed = Seq.empty[(String, Double, Long)].toDF("n", "v", "__seq")
    assert(Pipelines.compileBatch(keyed, emptyKeyed).count() == 0L)
  }

  test("avgCompat=maxSamples divides by the pane-size high-water mark") {
    val s = spark
    import s.implicits._
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"v","type":"double"}],
        |             "output": [{"name":"result","type":"double"}]},
        |"stages": [{"ref":"#aggregate",
        |            "settings":{"function":"avg","windowType":"timeTumbling",
        |                        "windowSize":"1000",
        |                        "avgCompat":"maxSamples"},
        |            "input":{"value":"=$.v"}}]
        |}""".stripMargin)
    // pane 0: 3 samples (sum 6); pane 1: 2 samples (sum 10). The compat
    // quirk divides pane 1 by max(3, 2) = 3, not its own count 2.
    val input = Seq((1.0, 0L), (2.0, 100L), (3.0, 200L),
        (4.0, 1100L), (6.0, 1200L))
      .zipWithIndex.map { case ((v, ms), i) => (v, ms, i.toLong) }
      .toDF("v", "ms", "__seq")
      .withColumn("__ts", timestamp_millis(col("ms")))
    val out = Pipelines.compileBatch(p, input)
      .orderBy("result").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(2.0, 10.0 / 3.0))
  }

  test("totalCountModifier resets maxSamples: divisor is the pane's own count") {
    val s = spark
    import s.implicits._
    // same vector as the maxSamples test, but totalCountModifier > 0
    // resets the high-water mark after every emission
    // (windows.go:198-202), so pane 1 divides by its own count 2
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"v","type":"double"}],
        |             "output": [{"name":"result","type":"double"}]},
        |"stages": [{"ref":"#aggregate",
        |            "settings":{"function":"avg","windowType":"timeTumbling",
        |                        "windowSize":"1000",
        |                        "avgCompat":"maxSamples",
        |                        "totalCountModifier":"1"},
        |            "input":{"value":"=$.v"}}]
        |}""".stripMargin)
    val input = Seq((1.0, 0L), (2.0, 100L), (3.0, 200L),
        (4.0, 1100L), (6.0, 1200L))
      .zipWithIndex.map { case ((v, ms), i) => (v, ms, i.toLong) }
      .toDF("v", "ms", "__seq")
      .withColumn("__ts", timestamp_millis(col("ms")))
    val out = Pipelines.compileBatch(p, input)
      .orderBy("result").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(2.0, 5.0))
  }

  test("avgCompat=int truncates toward zero like Go int division") {
    val s = spark
    import s.implicits._
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"v","type":"long"}],
        |             "output": [{"name":"result","type":"long"}]},
        |"stages": [{"ref":"#aggregate",
        |            "settings":{"function":"avg","windowType":"tumbling",
        |                        "windowSize":"2","avgCompat":"int"},
        |            "input":{"value":"=$.v"}}]
        |}""".stripMargin)
    // window (1,2): avg = 3/2 = 1 in Go int division (not 1.5, not 2);
    // window (-7,0): avg = -7/2 = -3 toward zero (floor would give -4)
    val input = Seq(1L, 2L, -7L, 0L).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "__seq")
    val out = Pipelines.compileBatch(p, input)
      .orderBy("result").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(-3L, 1L))
  }

  test("unknown avgCompat value is rejected loudly") {
    val s = spark
    import s.implicits._
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"v","type":"long"}],
        |             "output": [{"name":"result","type":"long"}]},
        |"stages": [{"ref":"#aggregate",
        |            "settings":{"function":"avg","windowType":"tumbling",
        |                        "windowSize":"2","avgCompat":"bogus"},
        |            "input":{"value":"=$.v"}}]
        |}""".stripMargin)
    val input = Seq((1L, 0L)).toDF("v", "__seq")
    val e = intercept[IllegalArgumentException] {
      Pipelines.compileBatch(p, input)
    }
    assert(e.getMessage.contains("avgCompat"))
  }

  test("non-zero filter passes NULL values through (filters.go:33-34)") {
    val s = spark
    import s.implicits._
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"v","type":"double"}],
        |             "output": [{"name":"v","type":"double"}]},
        |"stages": [{"ref":"#filter", "settings":{"type":"non-zero"},
        |            "input":{"value":"=$.v"}}]
        |}""".stripMargin)
    val input = Seq[(java.lang.Double, Long)]((0.0, 0L), (5.0, 1L),
      (null, 2L), (7.0, 3L)).toDF("v", "__seq")
    // the reference only filters values it can classify as zero; NULL
    // (unknown) passes through rather than being silently dropped
    val out = Pipelines.compileBatch(p, input)
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out.toSet == Set(5.0, 7.0, null))
  }

  test("non-zero filter passes NON-NUMERIC values through (unknown type)") {
    // the reference filters only values it classifies as numeric zero
    // (filters.go:33-34 — unknown types come back filtered=false); a
    // blanket ==0.0 comparison would CAST_INVALID_INPUT-crash under
    // Spark 4's default ANSI mode on string inputs
    val s = spark
    import s.implicits._
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"st","type":"string"}],
        |             "output": [{"name":"out","type":"string"}]},
        |"stages": [{"ref":"#filter", "settings":{"type":"non-zero"},
        |            "input":{"value":"=$.st"},
        |            "output":{"pipeline.out":"=$.value"}}]
        |}""".stripMargin)
    val input = Seq(("up", 0L), ("down", 1L), ("0", 2L))
      .toDF("st", "__seq")
    val out = Pipelines.compileBatch(p, input)
      .select("out").collect().map(_.getString(0)).sorted
    // ALL strings pass — including "0", which is not numeric typed
    assert(out.toSeq == Seq("0", "down", "up"))
  }

  test("output mapper rejects unknown scope prefixes loudly") {
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"v","type":"double"}],
        |             "output": [{"name":"out","type":"double"}]},
        |"stages": [{"ref":"#filter", "settings":{"type":"non-zero"},
        |            "input":{"value":"=$.v"},
        |            "output":{"doc.field":"=$.value"}}]
        |}""".stripMargin)
    val s = spark
    import s.implicits._
    val input = Seq((1.0, 0L)).toDF("v", "__seq")
    val ex = intercept[IllegalArgumentException] {
      Pipelines.compileBatch(p, input).collect()
    }
    assert(ex.getMessage.contains("doc.field"))
  }

  test("passthru scope: values stashed by one stage are readable later") {
    val s = spark
    import s.implicits._
    // stage 1 stashes the raw value into passthru; stage 2's mapper sums
    // the filtered value with the stashed original (scope.go:98-99,
    // instance.go:290-295)
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"v","type":"double"}],
        |             "output": [{"name":"out","type":"double"}]},
        |"stages": [
        |  {"ref":"#filter", "settings":{"type":"non-zero"},
        |   "input":{"value":"=$.v"},
        |   "output":{"passthru.orig":"=$pipeline.v"}},
        |  {"ref":"#log",
        |   "input":{"message":"=$.value"},
        |   "output":{"pipeline.out":"=$.value + $passthru.orig"}}]
        |}""".stripMargin)
    val input = Seq(0.0, 5.0, 7.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "__seq")
    val out = Pipelines.compileBatch(p, input)
      .collect().map(_.getDouble(0)).sorted
    assert(out.toSeq == Seq(10.0, 14.0)) // value + passthru.orig, zeros dropped
  }

  test("count tumbling DSL pipeline with groupBy discriminator (batch)") {
    val s = spark
    import s.implicits._
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"k","type":"string"},
        |                       {"name":"v","type":"double"}],
        |             "output": [{"name":"result","type":"double"}]},
        |"stages": [{"ref":"#aggregate",
        |            "settings":{"function":"avg","windowType":"tumbling",
        |                        "windowSize":"3"},
        |            "input":{"value":"=$.v"}}]
        |}""".stripMargin).copy(groupBy = Some("k"))
    val input = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("a", 3.0),
        ("b", 20.0), ("b", 30.0), ("a", 4.0))
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      .toDF("k", "v", "__seq")
    val out = Pipelines.compileBatch(p, input)
      .collect().map(_.getDouble(0)).sorted
    // a: avg(1,2,3)=2 (4 stalls); b: avg(10,20,30)=20
    assert(out.toSeq == Seq(2.0, 20.0))
  }

  test("proceedOnlyOnEmit=false leaks running rows with report flag") {
    val s = spark
    import s.implicits._
    val p = Dsl.parsePipeline("p",
      """{
        |"metadata": {"input": [{"name":"v","type":"double"}]},
        |"stages": [{"ref":"#aggregate",
        |            "settings":{"function":"sum","windowType":"tumbling",
        |                        "windowSize":"2","proceedOnlyOnEmit":"false"},
        |            "input":{"value":"=$.v"}}]
        |}""".stripMargin)
    val input = Seq(1.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("v", "__seq")
    val rows = Pipelines.compileBatch(p, input)
      .orderBy("__seq").select("result", "report")
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    // every event passes through; report only on the 2nd sample
    assert(rows.length == 3)
    assert(rows.count(_._2) == 1)
  }
}
