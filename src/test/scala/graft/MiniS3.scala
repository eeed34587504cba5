package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** In-process S3-compatible endpoint for SourcesSpec — the test-side
  * stand-in for the reference's Minio container
  * (/root/reference/docker-compose.yml,
  * worker_configs/s3_worker_config.json). Implements the path-style
  * object API [[graft.sources.S3LiteFileSystem]] speaks: GET (whole
  * and ranged), PUT (store and x-amz-copy-source), DELETE, and
  * ListObjectsV2 with prefix/delimiter roll-up — and VERIFIES the
  * AWS SigV4 signature of every request against the configured
  * credentials (recomputed from the raw wire path/query/headers via
  * the shared [[graft.sources.SigV4]]), so a signing bug on either
  * side 403s a test instead of silently passing. */
final class MiniS3(accessKey: String, secretKey: String,
                   region: String = "us-east-1") {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]() // "bucket/key" -> bytes
  private var server: HttpServer = _
  @volatile var authFailures: Int = 0

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) =>
      try handle(ex)
      catch { case e: Exception => respond(ex, 500, e.toString.getBytes(UTF_8)) })
    server.start()
    port
  }
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
  def keys: Set[String] = {
    val it = objects.keySet().iterator()
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
  def bytesOf(key: String): Array[Byte] = objects.get(key)

  private def respond(ex: HttpExchange, code: Int,
                      body: Array[Byte] = Array.emptyByteArray,
                      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) {
      val os = ex.getResponseBody
      os.write(body); os.close()
    }
    ex.close()
  }

  /** Recompute the SigV4 signature from the wire request and compare
    * whole Authorization headers. */
  private def authOk(ex: HttpExchange): Boolean = {
    val auth = ex.getRequestHeaders.getFirst("Authorization")
    val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
    if (auth == null || amzDate == null) return false
    val sh = "SignedHeaders=([^,]+)".r.findFirstMatchIn(auth).map(_.group(1))
    if (sh.isEmpty || !auth.contains(s"Credential=$accessKey/")) return false
    val signed = sh.get.split(";").toSeq
      .map(h => h -> Option(ex.getRequestHeaders.getFirst(h)).getOrElse(""))
    val canonicalQuery = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split("&").filter(_.nonEmpty).sorted.mkString("&")
    val expect = graft.sources.SigV4.authorization(
      ex.getRequestMethod, ex.getRequestURI.getRawPath, canonicalQuery,
      signed, accessKey, secretKey, region, amzDate)
    expect == auth
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> "" else kv.take(i) -> kv.drop(i + 1)
      }.toMap

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def listXml(bucket: String, prefix: String,
                      delimiter: Option[String]): String = {
    val under = keys.filter(_.startsWith(s"$bucket/"))
      .map(_.stripPrefix(s"$bucket/"))
      .filter(_.startsWith(prefix)).toSeq.sorted
    val (rolled, direct) = delimiter match {
      case Some(d) => under.partition(k => k.drop(prefix.length).contains(d))
      case None => (Seq.empty, under)
    }
    val prefixes = delimiter.map { d =>
      rolled.map { k =>
        val rem = k.drop(prefix.length)
        prefix + rem.take(rem.indexOf(d) + d.length)
      }.distinct
    }.getOrElse(Seq.empty)
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8"?><ListBucketResult>"""
    sb ++= s"<Name>${xmlEscape(bucket)}</Name><IsTruncated>false</IsTruncated>"
    direct.foreach { k =>
      sb ++= s"<Contents><Key>${xmlEscape(k)}</Key>" +
        s"<Size>${objects.get(s"$bucket/$k").length}</Size></Contents>"
    }
    prefixes.foreach(p =>
      sb ++= s"<CommonPrefixes><Prefix>${xmlEscape(p)}</Prefix></CommonPrefixes>")
    sb ++= "</ListBucketResult>"
    sb.toString
  }

  private val RangeHdr = """bytes=(\d+)-(\d*)""".r

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  private def handle(ex: HttpExchange): Unit = {
    if (!authOk(ex)) {
      authFailures += 1
      respond(ex, 403, "<Error><Code>SignatureDoesNotMatch</Code></Error>".getBytes(UTF_8))
      return
    }
    val path = ex.getRequestURI.getPath.stripPrefix("/") // decoded "bucket/key..."
    val q = queryParams(ex)
    ex.getRequestMethod match {
      case "PUT" =>
        val body = ex.getRequestBody.readAllBytes()
        Option(ex.getRequestHeaders.getFirst("x-amz-copy-source")) match {
          case Some(srcRaw) =>
            val src = java.net.URLDecoder.decode(srcRaw.stripPrefix("/"), "UTF-8")
            objects.get(src) match {
              case null => respond(ex, 404)
              case b =>
                objects.put(path, b)
                respond(ex, 200, "<CopyObjectResult/>".getBytes(UTF_8))
            }
          case None =>
            objects.put(path, body)
            respond(ex, 200)
        }
      case "GET" if q.get("list-type").contains("2") =>
        val bucket = path.stripSuffix("/")
        respond(ex, 200,
          listXml(bucket, q.getOrElse("prefix", ""), q.get("delimiter")).getBytes(UTF_8),
          Map("Content-Type" -> "application/xml"))
      case "GET" =>
        objects.get(path) match {
          case null => respond(ex, 404)
          case b =>
            // real S3 attaches the object's ETag (MD5 for single-part
            // uploads) to every GET, ranged or not
            val etag = Map("ETag" -> ("\"" + md5Hex(b) + "\""))
            Option(ex.getRequestHeaders.getFirst("Range")) match {
              case Some(RangeHdr(s, e)) =>
                val start = s.toLong
                if (start >= b.length)
                  respond(ex, 416, headers = Map("Content-Range" -> s"bytes */${b.length}"))
                else {
                  val end = math.min(
                    if (e.isEmpty) b.length - 1L else e.toLong, b.length - 1L)
                  respond(ex, 206, java.util.Arrays.copyOfRange(b, start.toInt, end.toInt + 1),
                    etag ++ Map("Content-Range" -> s"bytes $start-$end/${b.length}"))
                }
              case _ => respond(ex, 200, b, etag)
            }
        }
      case "DELETE" =>
        objects.remove(path)
        respond(ex, 204)
      case "HEAD" =>
        // S3LiteFileSystem probes via ranged GETs, but be a good citizen
        objects.get(path) match {
          case null => respond(ex, 404)
          case b => respond(ex, 200,
            headers = Map("ETag" -> ("\"" + md5Hex(b) + "\"")))
        }
      case _ => respond(ex, 405)
    }
  }
}
