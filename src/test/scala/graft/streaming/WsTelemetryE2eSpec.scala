package graft.streaming

import graft.SparkSpec
import graft.engine.{Dsl, Pipelines}

/** Full reference-shaped telemetry chain: an instrumented pipeline run
  * -> QueryExecutionListener -> WsTelemetrySink -> a connected websocket
  * client receives the per-stage JSON broadcast
  * (service/telemetry/service.go end-to-end). */
class WsTelemetryE2eSpec extends SparkSpec {

  test("instrumented batch pipeline broadcasts stage progress over ws") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val sink = new WsTelemetrySink(0)
    val listener = Telemetry.attachBatch(s, sink)
    try {
      val cli = WsTestClient.connect(sink.boundPort)
      val deadline = System.currentTimeMillis() + 5000
      while (sink.clientCount < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(sink.clientCount == 1)

      val p = Dsl.parsePipeline("p",
        """{
          |"metadata": {"input": [{"name":"v","type":"double"}],
          |             "output": [{"name":"v","type":"double"}]},
          |"stages": [{"ref":"#filter", "settings":{"type":"non-zero"},
          |            "input":{"value":"=$.v"}}]
          |}""".stripMargin)
      val input = Seq(0.0, 5.0, 7.0).zipWithIndex
        .map { case (v, i) => (v, i.toLong) }.toDF("v", "__seq")
      Pipelines.compileBatch(p, input, instrument = true).count()

      // listener posts asynchronously; the frame arrives when it fires
      val msg = cli.readFrame()
      assert(msg.contains("\"stage-finished\"") &&
        msg.contains("graft_stage_0_filter") && msg.contains("\"rows\":2"),
        s"unexpected ws payload: $msg")
      cli.close()
    } finally {
      spark.listenerManager.unregister(listener)
      sink.close()
    }
  }
}
