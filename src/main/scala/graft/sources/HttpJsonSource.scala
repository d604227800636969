package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP JSON source (SURVEY.md §2.1 S14) — the etherscan-style
  * lookups the reference drives its calendar and ABI plumbing with
  * (block-by-timestamp: `aave_extract.py:145-168`; ABI-by-address:
  * `:187-208,226-247,290-316`), as a REAL client on the JDK's
  * built-in `java.net.http.HttpClient` (zero added dependencies).
  *
  * Reference retry contract: a fixed-sleep loop — up to 5 tries with
  * a 5 s pause between them (distinct from `Retry.withBackoff`'s
  * exponential schedule, which mirrors the reference's RPC path).
  * Sleep is injectable so tests run instantly and assert the exact
  * schedule; non-200 statuses and malformed payloads both count as
  * failed tries, and the last failure propagates after the budget.
  *
  * JSON here is the etherscan envelope `{"status":…,"result":…}` —
  * parsed with json4s (already on the Spark classpath). The client is
  * deliberately Spark-free: production use wraps calls per partition
  * (`mapPartitions`) exactly like `ChainSource`, and `TieredCache`
  * composes on top for the ABI tier (S15). */
final class HttpJsonSource(
    base: String,
    maxTries: Int = 5,
    sleepMs: Long = 5000L,
    sleep: Long => Unit = Thread.sleep,
    timeout: Duration = Duration.ofSeconds(10)) {

  private val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  /** GET `base + pathAndQuery`, expecting a 200 with an etherscan
    * envelope whose `status` is "1"; returns the raw `result` node
    * rendered as a string. Retries on any failure (connect error,
    * non-200, status != "1", missing result) up to the budget. */
  def result(pathAndQuery: String): String = {
    var n = 1
    var last: Throwable = null
    while (n <= maxTries) {
      try return fetchOnce(pathAndQuery)
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          if (n < maxTries) sleep(sleepMs)
      }
      n += 1
    }
    throw new RuntimeException(s"max retry exceeded after $maxTries tries", last)
  }

  private def fetchOnce(pathAndQuery: String): String = {
    val req = HttpRequest.newBuilder(URI.create(base + pathAndQuery))
      .timeout(timeout).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} for $pathAndQuery")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(resp.body())
    (j \ "status") match {
      case JString("1") => ()
      case JNothing     => () // some endpoints (proxy ABI) omit status
      case other        => throw new RuntimeException(s"API status $other for $pathAndQuery")
    }
    (j \ "result") match {
      case JString(s) => s
      case JNothing   => throw new RuntimeException(s"no result node for $pathAndQuery")
      case other      => JsonMethods.compact(JsonMethods.render(other))
    }
  }

  /** Block-by-timestamp (etherscan `getblocknobytime` shape). */
  def blockByTimestamp(ts: Long): Long =
    result(s"?module=block&action=getblocknobytime&timestamp=$ts&closest=before").toLong

  /** Contract ABI by address (etherscan `getabi` shape) — the origin
    * fetch a `TieredCache` wraps for the S15 tier chain. */
  def abiByAddress(address: String): String =
    result(s"?module=contract&action=getabi&address=$address")
}
