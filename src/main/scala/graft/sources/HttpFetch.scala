package graft.sources

import java.io.ByteArrayOutputStream
import java.net.{URI, URLConnection}

/** S4: bounded binary fetch (reference downloadZipFromUrl,
  * /root/reference/src/datasus/datasus.service.ts:251-275 — 500 MB cap,
  * 5-min timeout). URL-scheme agnostic (http/https/file), so tests run
  * zero-egress over file:// and production hits the real endpoints.
  * Used from the driver for catalog-sized fetches or inside
  * foreachPartition for fan-out downloads.
  */
object HttpFetch {

  final case class FetchLimits(maxBytes: Long = 500L * 1024 * 1024,
                               connectTimeoutMs: Int = 30000,
                               readTimeoutMs: Int = 300000)

  /** The reference's Bull queue retry policy (datasus.module.ts:16-21):
    * 3 attempts, fixed 5 s backoff. Driver-side fetches retry here;
    * executor-side work additionally rides `spark.task.maxFailures`
    * (task re-attempts) — set it >= attempts on a real cluster. */
  final case class RetryPolicy(attempts: Int = 3, backoffMs: Long = 5000,
                               sleep: Long => Unit = Thread.sleep)

  /** Run `op` under the retry policy: up to `attempts` tries with fixed
    * backoff between them; the last failure propagates (the reference
    * marks the Bull job failed after attempt 3). */
  def withRetry[T](policy: RetryPolicy = RetryPolicy())(op: Int => T): T = {
    var attempt = 1
    while (true) {
      try return op(attempt)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= policy.attempts) throw e
          policy.sleep(policy.backoffMs)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** fetchBytes under the reference's retry policy. */
  def fetchBytesWithRetry(url: String, limits: FetchLimits = FetchLimits(),
                          policy: RetryPolicy = RetryPolicy()): Array[Byte] =
    withRetry(policy)(_ => fetchBytes(url, limits))

  /** GET `url` fully into memory; fails fast past `maxBytes` (the
    * reference's content-length + stream guard). */
  def fetchBytes(url: String, limits: FetchLimits = FetchLimits()): Array[Byte] = {
    require(url.startsWith("http") || url.startsWith("file:"),
      s"unsupported url scheme: $url") // P3 guard
    val conn: URLConnection = URI.create(url).toURL.openConnection()
    conn.setConnectTimeout(limits.connectTimeoutMs)
    conn.setReadTimeout(limits.readTimeoutMs)
    val declared = conn.getContentLengthLong
    require(declared <= limits.maxBytes,
      s"content-length $declared exceeds cap ${limits.maxBytes}")
    val in = conn.getInputStream
    try {
      val out = new ByteArrayOutputStream(math.max(16 * 1024, declared.toInt.max(0)))
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n > 0) {
        total += n
        require(total <= limits.maxBytes, s"stream exceeds cap ${limits.maxBytes}")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }
}
