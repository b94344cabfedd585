package graft

import graft.sources.{HttpCoinMarketsFetcher, HttpStatusException}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** Exercises the live-HTTP extract contract — 10 s timeout,
  * raise-for-status, Airflow-style retry — against an IN-PROCESS localhost
  * server (JDK HttpServer bound to 127.0.0.1, port 0): real sockets, zero
  * egress.
  */
class HttpSourceSpec extends SparkTestBase {

  private def payload: String = {
    val p = fixture("crypto-lake/bronze/coins/dt=2026-01-13/coin_raw.json")
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def withServer(routes: (String, HttpExchange => Unit)*)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => server.createContext(path, ex => h(ex)) }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("2xx payload flows through the DataSource V2 url path") {
    val json = payload
    withServer("/coins" -> (respond(_, 200, json))) { base =>
      val df = spark.read.format("coin-markets")
        .option("url", s"$base/coins").load()
      df.count() shouldBe 100L
      df.select("id").where("id = 'bitcoin'").count() shouldBe 1L
    }
  }

  test("non-2xx raises for status; 4xx does not retry") {
    val calls = new AtomicInteger(0)
    withServer("/gone" -> (ex => { calls.incrementAndGet(); respond(ex, 404, "") })) { base =>
      val f = new HttpCoinMarketsFetcher(s"$base/gone", retries = 3, retryDelayMs = 0)
      val e = the[HttpStatusException] thrownBy f.fetchJson()
      e.status shouldBe 404
      calls.get() shouldBe 1 // a malformed request won't improve on resend
    }
  }

  test("5xx retries up to the configured count, then succeeds or fails") {
    val calls = new AtomicInteger(0)
    withServer("/flaky" -> (ex =>
      if (calls.incrementAndGet() < 3) respond(ex, 503, "")
      else respond(ex, 200, payload))) { base =>
      // 2 retries → third attempt lands on the 200
      val ok = new HttpCoinMarketsFetcher(s"$base/flaky", retries = 2, retryDelayMs = 0)
      ok.fetchJson() should include("bitcoin")
      calls.get() shouldBe 3

      // retries exhausted → the status error surfaces
      calls.set(0)
      withServer("/down" -> (ex => { calls.incrementAndGet(); respond(ex, 500, "") })) { base2 =>
        val bad = new HttpCoinMarketsFetcher(s"$base2/down", retries = 1, retryDelayMs = 0)
        val e = the[HttpStatusException] thrownBy bad.fetchJson()
        e.status shouldBe 500
        calls.get() shouldBe 2 // initial attempt + 1 retry
      }
    }
  }

  test("a hung server trips the request timeout") {
    withServer("/slow" -> (ex => { Thread.sleep(5000); respond(ex, 200, "[]") })) { base =>
      val f = new HttpCoinMarketsFetcher(s"$base/slow", timeoutSeconds = 1,
        retries = 0, retryDelayMs = 0)
      val t0 = System.nanoTime()
      an[java.net.http.HttpTimeoutException] should be thrownBy f.fetchJson()
      (System.nanoTime() - t0) / 1e9 should be < 4.0
    }
  }
}
