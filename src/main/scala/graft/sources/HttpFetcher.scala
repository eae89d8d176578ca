package graft.sources

import org.apache.spark.sql.DataFrame

/** S1–S3 live HTTP layer (SURVEY.md §2.1): the rate-limited
  * `mapPartitions` fetcher that the fixture-backed [[ApiSource]] stands
  * in for in the zero-egress environment. The reference fetches the MET
  * API sequentially with a fixed `time.sleep` between calls
  * (/root/reference/src/ingestion.py:25-57,90); here each PARTITION runs
  * an independent token bucket, so the aggregate rate is
  * `ratePerSec × numPartitions` — repartition the url frame to set the
  * cluster-wide budget (e.g. 50 partitions × 4 req/s = 200 req/s against
  * the API, regardless of executor count).
  *
  * Output is the exact `(url, bytes, status)` shape
  * [[graft.pipeline.MuseumPipeline.ingest]] consumes: a non-2xx response
  * carries null bytes and its status code, a transport failure carries
  * status -1 — both are dropped downstream by the F3/F6 filters rather
  * than failing the job (one dead url must not kill a 100 TB ingest). */
object HttpFetcher {

  /** Blocking token bucket: short bursts up to `burst`, sustained
    * `ratePerSec`. A caller that finds the bucket empty reserves the
    * next token and is told how long to wait — so concurrent callers
    * queue fairly instead of stampeding when tokens refill. `now` is
    * injectable for deterministic tests. */
  final class TokenBucket(ratePerSec: Double, burst: Int,
                          now: () => Long = () => System.nanoTime()) extends Serializable {
    require(ratePerSec > 0 && burst >= 1, "rate and burst must be positive")
    private var tokens: Double = burst.toDouble
    private var last: Long = now()

    /** Nanoseconds the caller must wait before proceeding (0 = go now). */
    def acquireDelayNs(): Long = synchronized {
      val t = now()
      tokens = math.min(burst.toDouble, tokens + (t - last) * ratePerSec / 1e9)
      last = t
      tokens -= 1.0
      if (tokens >= 0.0) 0L
      else (-tokens * 1e9 / ratePerSec).toLong
    }
  }

  /** Fetch every url in `urls` (a one-column `url` frame or any frame
    * with a `url` column), emitting `(url, bytes, status)`. */
  def fetchBinary(urls: DataFrame, ratePerSec: Double = 4.0, burst: Int = 4,
                  connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls.select("url").as[String]
      .mapPartitions { it =>
        val bucket = new TokenBucket(ratePerSec, burst)
        it.map { u =>
          val delay = bucket.acquireDelayNs()
          if (delay > 0L) Thread.sleep(delay / 1000000L, (delay % 1000000L).toInt)
          fetchOne(u, connectTimeoutMs, readTimeoutMs)
        }
      }
      .toDF("url", "bytes", "status")
  }

  /** One GET; never throws (transport failure → status -1, null bytes). */
  private def fetchOne(url: String, connectTimeoutMs: Int, readTimeoutMs: Int)
      : (String, Array[Byte], Int) =
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("GET")
      try {
        val status = conn.getResponseCode
        val bytes =
          if (status >= 200 && status < 300) {
            val in = conn.getInputStream
            try in.readAllBytes() finally in.close()
          } else {
            // drain the error stream so the connection is reusable
            Option(conn.getErrorStream).foreach { es => try es.readAllBytes() finally es.close() }
            null
          }
        (url, bytes, status)
      } finally conn.disconnect()
    } catch {
      case scala.util.control.NonFatal(_) => (url, null, -1)
    }
}
