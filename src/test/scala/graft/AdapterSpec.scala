package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Retry, TieredCache}

/** Operational adapter seams: bounded exponential backoff and the
  * 3-tier read-through cache (reference S14/S15 behaviors). */
class AdapterSpec extends AnyFunSuite {

  test("retry backs off exponentially and returns the first success") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = Retry.withBackoff(maxTries = 13, capMs = 64000L,
      sleep = sleeps += _, jitterMs = () => 0L) { n =>
      calls += 1
      if (n < 4) sys.error(s"transient $n") else s"ok@$n"
    }
    assert(out === "ok@4")
    assert(calls === 4)
    assert(sleeps.toSeq === Seq(1000L, 2000L, 4000L)) // 2^(n-1) seconds, no jitter
  }

  test("retry caps the backoff and surfaces the last failure after max tries") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val e = intercept[RuntimeException] {
      Retry.withBackoff(maxTries = 9, capMs = 10000L,
        sleep = sleeps += _, jitterMs = () => 0L) { n => sys.error(s"always $n"): String }
    }
    assert(e.getMessage.contains("max retry exceeded"))
    assert(e.getCause.getMessage === "always 9")
    assert(sleeps.length === 8)             // no sleep after the final try
    assert(sleeps.max === 10000L)           // capped
    assert(sleeps.take(4) === Seq(1000L, 2000L, 4000L, 8000L))
  }

  test("tiered cache fetches origin once, then serves memory and disk tiers") {
    val dir = Files.createTempDirectory("graft_cache")
    var fetches = 0
    def fetch(k: String) = { fetches += 1; s"abi-of-$k" }
    val c1 = new TieredCache(dir, fetch)
    assert(c1.get("usdc") === "abi-of-usdc")
    assert(fetches === 1)
    // memory tier: same instance re-reads without touching disk
    Files.delete(dir.resolve("usdc.json"))
    assert(c1.get("usdc") === "abi-of-usdc")
    assert(fetches === 1)
    // durable tier: a new process (instance) reads the written-back file
    val c2 = new TieredCache(dir, fetch)
    assert(c2.get("wbtc") === "abi-of-wbtc") // origin (2nd fetch), writes back
    assert(fetches === 2)
    val c3 = new TieredCache(dir, fetch)
    assert(c3.get("wbtc") === "abi-of-wbtc") // disk hit, NO origin fetch
    assert(fetches === 2)
  }

  /** A real in-process HTTP server (JDK built-in) driving the real
    * `HttpJsonSource` client — S14 as live plumbing, not a seam. */
  private def withServer(handler: com.sun.net.httpserver.HttpExchange => Unit)(
      body: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/api", ex => handler(ex))
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}/api")
    finally srv.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      code: Int, bodyStr: String): Unit = {
    val b = bodyStr.getBytes("UTF-8")
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }

  test("http json source rides out transient failures on the fixed 5s schedule") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex =>
      if (hits.incrementAndGet() < 3) respond(ex, 503, "busy")
      else respond(ex, 200, """{"status":"1","message":"OK","result":"17280123"}""")
    } { base =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val src = new graft.sources.HttpJsonSource(base, sleep = sleeps += _)
      assert(src.blockByTimestamp(1700000000L) === 17280123L)
      assert(hits.get() === 3)
      assert(sleeps.toSeq === Seq(5000L, 5000L)) // reference: 5 tries, 5 s pause
    }
  }

  test("http json source surfaces the last failure after 5 tries") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex => hits.incrementAndGet(); respond(ex, 500, "nope") } { base =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val src = new graft.sources.HttpJsonSource(base, sleep = sleeps += _)
      val e = intercept[RuntimeException](src.result("?module=block"))
      assert(e.getMessage.contains("max retry exceeded"))
      assert(hits.get() === 5)
      assert(sleeps.length === 4) // no sleep after the final try
    }
  }

  test("http json source rejects an API-level error status and parses abi results") {
    withServer { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (q.contains("action=getabi"))
        respond(ex, 200, """{"status":"1","result":"[{\"type\":\"function\"}]"}""")
      else respond(ex, 200, """{"status":"0","message":"NOTOK","result":"rate limited"}""")
    } { base =>
      val src = new graft.sources.HttpJsonSource(base,
        maxTries = 1, sleep = _ => ())
      assert(src.abiByAddress("0xdead") === """[{"type":"function"}]""")
      val e = intercept[RuntimeException](src.result("?module=block&action=getblocknobytime"))
      assert(e.getMessage.contains("max retry exceeded"))
    }
  }

  test("tiered cache composes over the http origin: one fetch per key lifetime") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex =>
      hits.incrementAndGet()
      respond(ex, 200, """{"status":"1","result":"abi-payload"}""")
    } { base =>
      val src = new graft.sources.HttpJsonSource(base, sleep = _ => ())
      val dir = Files.createTempDirectory("graft_http_cache")
      val cache = new TieredCache(dir, k => src.abiByAddress(k))
      assert(cache.get("0xabc") === "abi-payload")
      assert(cache.get("0xabc") === "abi-payload")
      assert(new TieredCache(dir, k => src.abiByAddress(k)).get("0xabc") === "abi-payload")
      assert(hits.get() === 1) // memory + disk tiers absorbed the rest
    }
  }
}
