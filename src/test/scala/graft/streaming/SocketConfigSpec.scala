package graft.streaming

import java.io.PrintWriter
import java.net.ServerSocket

import graft.SparkSpec

class SocketConfigSpec extends SparkSpec {
  import spark.implicits._

  test("socket source options match the Spark socket provider contract") {
    val src = SocketConfig.Source("feed.host", 9999, includeTimestamp = true)
    assert(src.options === Map(
      "host" -> "feed.host", "port" -> "9999", "includeTimestamp" -> "true"))
    val plain = SocketConfig.Source("localhost", 9998)
    assert(plain.options("includeTimestamp") === "false")
  }

  test("socket source end-to-end: lines from a real socket reach the sink") {
    val server = new ServerSocket(0) // ephemeral port
    server.setSoTimeout(30000) // a query that dies pre-connect must fail, not wedge
    try {
      val lines = SocketConfig.Source("localhost", server.getLocalPort).lines(spark)
      assert(lines.isStreaming && lines.columns.toSeq === Seq("value"))
      // the reference quickstart pipeline: split lines, count words
      val counts0 = lines.as[String].flatMap(_.split(" "))
        .groupBy("value").count()
      val q = Sinks.memory(counts0.toDF(), "socket_sink", "complete").start()
      try {
        val conn = server.accept()
        val out = new PrintWriter(conn.getOutputStream, true)
        out.println("spark streams spark")
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        def counts = spark.table("socket_sink").as[(String, Long)].collect().toMap
        while (counts.get("spark") != Some(2L)) {
          assert(System.nanoTime() < deadline, s"timeout; sink=$counts")
          assert(q.exception.isEmpty, s"query died: ${q.exception}")
          Thread.sleep(100)
        }
        assert(counts === Map("spark" -> 2L, "streams" -> 1L))
        out.close(); conn.close()
      } finally q.stop()
    } finally server.close()
  }
}
