package graft.gdc

import java.io.{ByteArrayInputStream, IOException, InputStream}
import java.nio.charset.StandardCharsets

/** One HTTP response. `body` is fully materialized — fine for the
  * catalog/search surface (JSON pages); bulk data downloads go through
  * [[HttpTransport.open]] instead so file-sized payloads never live on
  * the heap.
  */
final case class GdcResponse(
    status: Int,
    body: Array[Byte],
    headers: Map[String, String] = Map.empty) {
  def text: String = new String(body, StandardCharsets.UTF_8)
  def ok: Boolean = status >= 200 && status < 300
}

/** The engine's HTTP seam. `GdcCatalog` takes a plain
  * `(endpoint, params) => String` function; this trait is the richer
  * production shape behind it — status codes survive (the retry policy
  * and the 451-redacted download path both dispatch on them) and bulk
  * bodies can stream.
  *
  * Implementations resolve `endpoint` against their API base unless it
  * is already an absolute `http(s)://` URL (download URLs arrive
  * absolute from the files catalog).
  */
trait HttpTransport {

  def get(endpoint: String, params: Map[String, String]): GdcResponse

  /** Streaming GET for bulk data: returns the status and an open body
    * stream (caller closes). The default adapter buffers via [[get]] —
    * fixture transports get streaming for free; production transports
    * override with a true streaming client.
    */
  def open(endpoint: String, params: Map[String, String]): (Int, InputStream) = {
    val r = get(endpoint, params)
    (r.status, new ByteArrayInputStream(r.body))
  }
}

/** Raised when the calling thread is interrupted mid-request —
  * deliberately NOT an IOException, so the retry policy can never
  * treat cancellation as a transient network failure (retrying an
  * interrupted request would also make the next backoff's sleep throw
  * from inside the retry loop, losing prompt-cancellation semantics).
  * The interrupt flag is re-set before this is thrown.
  */
final class GdcInterrupted(cause: InterruptedException)
  extends RuntimeException("HTTP request interrupted", cause)

/** Raised when the retry budget is exhausted — the analogue of
  * urllib3's `MaxRetryError` surfacing as `requests.RetryError`.
  */
final class GdcRetryExhausted(
    message: String,
    val lastStatus: Option[Int],
    cause: Throwable) extends IOException(message, cause)

/** The reference's production retry policy (`utils.py:187-204`,
  * mounted on every download and search session at `gdc.py:371` /
  * `xena_dataset.py:628`): up to `retries` = 10 retries with
  * `backoff_factor` = 0.5 on statuses {500, 502, 504} and on
  * connect/read errors.
  *
  * Backoff follows urllib3 `Retry.get_backoff_time`: the first retry
  * fires immediately, the n-th (n >= 2) sleeps
  * `backoff_factor * 2^(n-1)` seconds, capped at `backoffMaxSeconds`
  * (urllib3 `BACKOFF_MAX` = 120). With the defaults the sleep
  * sequence is 0, 1, 2, 4, 8, ... seconds.
  *
  * `sleeper` is injected so specs assert the exact backoff schedule
  * without wall-clock sleeping.
  */
final class RetryingTransport(
    underlying: HttpTransport,
    retries: Int = 10,
    backoffFactor: Double = 0.5,
    statusForcelist: Set[Int] = Set(500, 502, 504),
    backoffMaxSeconds: Double = 120.0,
    sleeper: Long => Unit = Thread.sleep) extends HttpTransport {

  require(retries >= 0, s"retries must be >= 0, got $retries")

  /** Sleep before the n-th retry (1-based), in milliseconds. */
  private[graft] def backoffMillis(n: Int): Long =
    if (n <= 1) 0L
    else math.round(math.min(backoffMaxSeconds, backoffFactor * math.pow(2, n - 1)) * 1000)

  private def attempt[T](endpoint: String, run: () => T, failed: T => Option[Int],
      close: T => Unit): T = {
    var errors = 0
    while (true) {
      val outcome: Either[IOException, T] =
        try Right(run())
        catch { case e: IOException => Left(e) }
      outcome match {
        case Right(r) if failed(r).isEmpty => return r
        case _ =>
          errors += 1
          if (errors > retries) outcome match {
            case Left(e) => throw new GdcRetryExhausted(
              s"max retries ($retries) exceeded for $endpoint", None, e)
            case Right(r) =>
              val status = failed(r)
              close(r)
              throw new GdcRetryExhausted(
                s"max retries ($retries) exceeded for $endpoint: " +
                  s"too many ${status.getOrElse(-1)} responses", status, null)
          }
          outcome.foreach(close)
          val ms = backoffMillis(errors)
          if (ms > 0) sleeper(ms)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def get(endpoint: String, params: Map[String, String]): GdcResponse =
    attempt[GdcResponse](endpoint,
      () => underlying.get(endpoint, params),
      r => Some(r.status).filter(statusForcelist),
      _ => ())

  override def open(endpoint: String, params: Map[String, String]): (Int, InputStream) =
    attempt[(Int, InputStream)](endpoint,
      () => underlying.open(endpoint, params),
      { case (status, _) => Some(status).filter(statusForcelist) },
      { case (_, in) => try in.close() catch { case _: IOException => () } })
}

/** Production transport on the JDK 11+ `java.net.http` client — no
  * extra dependency. GET with URL-encoded query params by default;
  * `usePost = true` sends the same params form-encoded in the body,
  * mirroring the reference's `method='POST'` mode used when the
  * filter payload (e.g. 20k uuids) exceeds URL limits
  * (`gdc.py:289-290`, used by `gdc_check_new` at `gdc.py:626-635`).
  */
final class JdkHttpTransport(
    base: String = JdkHttpTransport.GdcApiBase,
    usePost: Boolean = false,
    timeoutSeconds: Long = 300) extends HttpTransport {

  import java.net.URI
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def request(endpoint: String, params: Map[String, String]): HttpRequest = {
    val url = if (endpoint.startsWith("http://") || endpoint.startsWith("https://"))
      endpoint else s"$base/$endpoint"
    // Deterministic param order — stable request lines for logs/caches.
    val query = params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val b = HttpRequest.newBuilder()
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
    if (usePost && params.nonEmpty)
      b.uri(URI.create(url))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(query))
        .build()
    else
      b.uri(URI.create(if (query.isEmpty) url else s"$url?$query")).GET().build()
  }

  private def headerMap(r: HttpResponse[_]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    r.headers().map().asScala.collect {
      case (k, vs) if !vs.isEmpty => k.toLowerCase -> vs.get(0)
    }.toMap
  }

  override def get(endpoint: String, params: Map[String, String]): GdcResponse =
    try {
      val r = client.send(request(endpoint, params),
        HttpResponse.BodyHandlers.ofByteArray())
      GdcResponse(r.statusCode(), r.body(), headerMap(r))
    } catch {
      case e: InterruptedException => Thread.currentThread().interrupt(); throw new GdcInterrupted(e)
    }

  override def open(endpoint: String, params: Map[String, String]): (Int, InputStream) =
    try {
      val r = client.send(request(endpoint, params),
        HttpResponse.BodyHandlers.ofInputStream())
      (r.statusCode(), r.body())
    } catch {
      case e: InterruptedException => Thread.currentThread().interrupt(); throw new GdcInterrupted(e)
    }
}

object JdkHttpTransport {
  /** The public GDC API base (`gdc.py:26` `GDC_API_BASE`). */
  val GdcApiBase = "https://api.gdc.cancer.gov"
}

object HttpTransport {

  /** The production default: JDK HTTP client wrapped in the reference
    * retry policy — what the Cli mounts for every network verb.
    */
  def default(base: String = JdkHttpTransport.GdcApiBase,
      usePost: Boolean = false): HttpTransport =
    new RetryingTransport(new JdkHttpTransport(base, usePost))

  /** Adapt a transport to `GdcCatalog`'s `(endpoint, params) => body`
    * seam. Non-2xx after retries is an error — the catalog layer never
    * parses an error page as JSON.
    */
  def fetchFn(t: HttpTransport): (String, Map[String, String]) => String = {
    (endpoint, params) =>
      val r = t.get(endpoint, params)
      if (!r.ok) throw new IOException(s"GDC request '$endpoint' failed: HTTP ${r.status}")
      r.text
  }
}
