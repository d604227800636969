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
}
