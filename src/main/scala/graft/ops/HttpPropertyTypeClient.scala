package graft.ops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Default production transport for [[Enrichment]] (reference R8: a live
  * HTTP POST per concept, /root/reference/main.py:372-374). One instance is
  * created per partition by `Enrichment.enrich`'s `clientFactory`, so the
  * underlying java.net.http connection pool is reused across every row in
  * the partition — the reference's serial one-request-per-row loop becomes
  * |partitions| concurrent pooled clients.
  *
  * Contract: POSTs `{"concept_id": <id>}` to `endpoint`, expects a JSON
  * object with an `event_and_property_types` string array. 2xx → parsed
  * entries; 404 → empty (unknown concept); 5xx / connect errors → retried
  * with exponential backoff, then surfaced (a poisoned service should fail
  * the task, not silently drop enrichments).
  *
  * The class is Serializable (shipped inside the factory closure) but the
  * HttpClient itself is built lazily executor-side (`@transient lazy`).
  */
final class HttpPropertyTypeClient(
    endpoint: String,
    maxRetries: Int = 3,
    requestTimeoutMs: Long = 10000L)
  extends Enrichment.PropertyTypeClient {

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(requestTimeoutMs))
    .build()

  override def fetch(conceptId: Long): Seq[String] = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(s"""{"concept_id":$conceptId}"""))
      .build()
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(math.min(100L << (attempt - 1), 2000L))
      try {
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case ok if ok / 100 == 2 =>
            return HttpPropertyTypeClient.parseEntries(resp.body())
          case 404 => return Seq.empty
          // rate limiting / request timeout are transient by definition:
          // |partitions| pooled clients hitting one service WILL see 429,
          // and failing the task just re-hits the limit harder
          case 429 | 408 =>
            lastErr = new java.io.IOException(s"enrichment service throttled id=$conceptId")
          case s if s / 100 == 4 =>
            throw new IllegalStateException(s"enrichment service rejected id=$conceptId: HTTP $s")
          case s => // 5xx and everything else: retryable
            lastErr = new java.io.IOException(s"enrichment service HTTP $s for id=$conceptId")
        }
      } catch {
        case e: java.io.IOException => lastErr = e // connect/read failure: retry
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"enrichment fetch failed after ${maxRetries + 1} attempts for id=$conceptId", lastErr)
  }
}

object HttpPropertyTypeClient {

  /** Extracts the `event_and_property_types` string array from a JSON
    * response body. Hand-rolled scanner (no JSON library in the dependency
    * budget): finds the key, then collects each double-quoted string up to
    * the closing `]`, honoring backslash escapes. Absent key or empty array
    * → no entries, matching the reference's absent-field skip. */
  private[ops] def parseEntries(body: String): Seq[String] = {
    val keyIdx = body.indexOf("\"event_and_property_types\"")
    if (keyIdx < 0) return Seq.empty
    val open = body.indexOf('[', keyIdx)
    if (open < 0) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = open + 1
    var inStr = false
    val cur = new StringBuilder
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < body.length) {
          body.charAt(i + 1) match {
            case 'n' => cur.append('\n'); i += 1
            case 't' => cur.append('\t'); i += 1
            case 'r' => cur.append('\r'); i += 1
            case 'u' if i + 5 < body.length =>
              cur.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
              i += 5
            case other => cur.append(other); i += 1 // \" \\ \/ and friends
          }
        } else if (c == '"') { out += cur.result(); cur.clear(); inStr = false }
        else cur.append(c)
      } else {
        if (c == '"') inStr = true
        else if (c == ']') return out.result()
      }
      i += 1
    }
    out.result()
  }
}
