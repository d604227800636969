package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

/** Operational adapter plumbing around the source seams — the
  * reference's retry and cache behavior re-expressed with injectable
  * effects so the engine stays deterministic and testable:
  *
  *  - `Retry.withBackoff` — bounded exponential backoff (reference
  *    `aave_extract.py:84-116` `call_contract`: 13 tries, sleep
  *    min(2^(n−1) + jitter, cap), raise after max retries);
  *  - `TieredCache` — three-tier read-through cache (reference S15,
  *    `aave_extract.py:240-300` `get_atoken_abi`: process memory →
  *    object-store blob → origin fetch, writing back to the upper
  *    tiers on miss).
  *
  * Neither touches Spark: they wrap the per-partition client calls a
  * production `ChainSource` would make inside `mapPartitions`. Sleep
  * and jitter are injected so tests run instantly and assert the
  * exact backoff schedule.
  */
object Retry {

  private val callSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `op` up to `maxTries` times, sleeping
    * min(2^(n−1)·1000 + jitterMs, capMs) after failed try n. Throws
    * the last failure wrapped once `maxTries` is exhausted. `op`
    * receives the (1-based) attempt number.
    *
    * The DEFAULT jitter is a per-call RNG seeded from a process-wide
    * call counter: schedules are reproducible for a deterministic call
    * order (no shared-singleton contention, no wall-clock entropy),
    * yet concurrent callers get DIFFERENT sequences — identical seeds
    * would make N retriers sleep in lockstep, the thundering herd
    * jitter exists to break. Callers needing true entropy inject
    * their own `jitterMs`. */
  def withBackoff[A](
      maxTries: Int = 13,
      capMs: Long = 64000L,
      sleep: Long => Unit = Thread.sleep,
      jitterMs: () => Long = {
        val r = new scala.util.Random(0x5eedL ^ callSeq.incrementAndGet())
        () => r.nextLong(1000L)
      })(
      op: Int => A): A = {
    var n = 1
    var last: Throwable = null
    while (n <= maxTries) {
      // NonFatal only: an interrupted Spark task or an OOM must
      // propagate immediately, not spin through 13 capped sleeps
      try return op(n)
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          if (n < maxTries) sleep(math.min((1L << (n - 1)) * 1000L + jitterMs(), capMs))
      }
      n += 1
    }
    throw new RuntimeException(s"max retry exceeded after $maxTries tries", last)
  }
}

/** Read-through cache: in-process memory map, then a durable KV tier
  * (a local directory here; an object bucket in production), then the
  * origin `fetch`. Misses write back to every tier above, so a value
  * is fetched from origin at most once per durable-tier lifetime and
  * read from disk at most once per process — the reference's exact
  * ABI-cache contract. */
final class TieredCache(dir: Path, fetch: String => String) {
  private val mem = scala.collection.concurrent.TrieMap.empty[String, String]
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-key lock around the miss path (TrieMap.getOrElseUpdate does
    * not guarantee a single evaluation under contention — losing
    * computations would each hit origin), and write-to-temp +
    * ATOMIC_MOVE so a concurrent reader in another process never sees
    * a half-written file. */
  def get(key: String): String = mem.get(key).getOrElse {
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      mem.getOrElseUpdate(key, {
        val f = dir.resolve(s"$key.json")
        if (Files.exists(f)) new String(Files.readAllBytes(f), UTF_8)
        else {
          val v = fetch(key)
          Files.createDirectories(dir)
          val tmp = Files.createTempFile(dir, s".$key", ".tmp")
          Files.write(tmp, v.getBytes(UTF_8))
          try Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
          v
        }
      })
    }
  }
}
