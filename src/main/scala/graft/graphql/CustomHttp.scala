package graft.graphql

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executable `@custom(http: {...})` resolvers (reference
  * graphql/schema/custom_http.go + wrappers.go SubstituteVarsInURL):
  * the engine CALLS the external service, it doesn't just parse the
  * directive. Spark-first shape: requests issue from the EXECUTORS
  * inside mapPartitions — the fan-out scales with the data instead of
  * bottlenecking the driver, and BATCH mode amortizes one request per
  * partition batch (the reference batches per resolver invocation).
  *
  *  - SINGLE: one request per parent; `$field` substitutes into the url
  *    (URL-encoded) and the body template (JSON-encoded), matching the
  *    reference's substitution split (wrappers.go:2892 url vs :3031
  *    body).
  *  - BATCH: one request per partition with body
  *    `{"parents": [<parent objects>]}` (custom_http.go:158-170); the
  *    response is a JSON array aligned with the batch.
  *
  * A registered in-process resolver (GraphQLEngine `resolvers`) takes
  * precedence — the deployment override for services better reached
  * through native clients.
  */
object CustomHttp {

  /** `lambdaResolver`: set when this spec is the synthesized dispatch of
    * a `@lambda` field to the lambda server (reference wrappers.go:893
    * buildCustomDirectiveForLambda rewrites @lambda into exactly such a
    * @custom(http:) — POST, BATCH for object fields); the BATCH body
    * then carries the lambda envelope `{"resolver": "Type.field",
    * "parents": [...]}` (custom_http.go:159 GetBodyForLambda) instead of
    * the bare parents object, and the JS executes in the user's
    * dgraph-lambda sidecar exactly as it does against the reference.
    */
  final case class HttpSpec(url: String, method: String,
      body: Option[String], mode: String,
      lambdaResolver: Option[String] = None,
      timeoutMs: Long = DefaultTimeoutMs)

  /** Per-request read deadline (override: GRAFT_CUSTOM_HTTP_TIMEOUT_MS)
    * and connect deadline. The requests run from EXECUTORS inside
    * mapPartitions — unbounded, a hung sidecar would stall the whole
    * stage; bounded, it fails the FIELD (null, like a reference custom
    * resolver error) while the stage completes.
    */
  val DefaultTimeoutMs: Long =
    sys.env.getOrElse("GRAFT_CUSTOM_HTTP_TIMEOUT_MS", "10000").toLong
  val ConnectTimeoutMs: Long =
    sys.env.getOrElse("GRAFT_CUSTOM_HTTP_CONNECT_MS", "2000").toLong

  /** Consecutive-failure budget per partition batch: after this many
    * failed requests in a row the circuit trips and the partition's
    * remaining fields resolve null WITHOUT dialing the dead service —
    * N parents must not serialize N timeouts.
    */
  val FailureBudget: Int =
    sys.env.getOrElse("GRAFT_CUSTOM_HTTP_FAILURE_BUDGET", "3").toInt

  /** Transport seam: the JDK client in production, a recorder in specs. */
  trait HttpTransport extends Serializable {
    def send(url: String, method: String, body: Option[String],
        timeoutMs: Long = DefaultTimeoutMs): String
  }

  /** java.net.http client, one per executor JVM (lazy transient). */
  object JdkHttpTransport extends HttpTransport {
    @transient private lazy val client =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(ConnectTimeoutMs))
        .build()
    def send(url: String, method: String, body: Option[String],
        timeoutMs: Long): String = {
      val pub = body
        .map(java.net.http.HttpRequest.BodyPublishers.ofString)
        .getOrElse(java.net.http.HttpRequest.BodyPublishers.noBody())
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .method(method, pub)
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .build()
      client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    }
  }

  /** Parse the raw directive args (`url: "...", method: POST,
    * body: "{...}", mode: BATCH`) into a spec. The SDL parser has
    * already returned nested braces to their literal form.
    */
  def parse(raw: String): HttpSpec = {
    def quoted(k: String): Option[String] =
      (k + "\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(raw).map(_.group(1))
    def bare(k: String): Option[String] =
      (k + "\\s*:\\s*([A-Z]+)").r.findFirstMatchIn(raw).map(_.group(1))
    HttpSpec(
      url = quoted("url").getOrElse(throw new IllegalArgumentException(
        s"@custom(http:) needs url: $raw")),
      method = bare("method").orElse(quoted("method")).getOrElse("GET"),
      body = quoted("body"),
      mode = bare("mode").getOrElse("SINGLE"))
  }

  /** Run the resolver over the parent frame, appending `outName` typed
    * per `fieldType` (Int/Float/Boolean/String). Response bodies parse
    * as JSON scalars (bare text falls through as-is); BATCH responses
    * must be a JSON array aligned with the partition's parents.
    */
  def resolve(parents: DataFrame, outName: String, fieldType: String,
      spec: HttpSpec,
      transport: HttpTransport = JdkHttpTransport): DataFrame = {
    val spark = parents.sparkSession
    val cols = parents.columns.toSeq
    val raw = outName + "__http"
    val outSchema = parents.schema.add(raw, StringType)
    val rdd = parents.rdd.mapPartitions { it =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def jsonOf(v: Any): String = mapper.writeValueAsString(v)
      def scalarOf(body: String): String =
        try {
          val n = mapper.readTree(body)
          if (n == null || n.isNull) null else n.asText()
        } catch { case _: Exception => body }
      def parentJson(r: Row): String = {
        val m = new java.util.LinkedHashMap[String, Any]()
        cols.indices.foreach(i => m.put(cols(i), r.get(i)))
        mapper.writeValueAsString(m)
      }
      // longest-name-first so $name never clobbers $nameSuffix
      val ordered = cols.sortBy(-_.length)
      def substitute(tmpl: String, r: Row, urlMode: Boolean): String =
        ordered.foldLeft(tmpl) { (acc, c) =>
          val v = r.get(cols.indexOf(c))
          val rep =
            if (urlMode) java.net.URLEncoder.encode(String.valueOf(v), "UTF-8")
            else jsonOf(v)
          acc.replace("$" + c, rep)
        }
      spec.mode match {
        case "BATCH" =>
          val rows = it.toVector
          if (rows.isEmpty) Iterator.empty
          else {
            val parentsArr = rows.map(parentJson).mkString("[", ",", "]")
            val body = spec.lambdaResolver match {
              case Some(res) =>
                s"""{"resolver":${jsonOf(res)},"parents":$parentsArr}"""
              case None => s"""{"parents":$parentsArr}"""
            }
            // a hung/unreachable sidecar fails the FIELD (all-null
            // column for the batch), never the stage; a response of the
            // wrong shape stays a loud error (that's a contract bug,
            // not an availability incident)
            val resp =
              try Some(transport.send(spec.url, spec.method, Some(body),
                spec.timeoutMs))
              catch {
                case _: java.io.IOException |
                    _: java.net.http.HttpTimeoutException => None
              }
            resp match {
              case Some(ok) =>
                val arr = mapper.readTree(ok)
                require(arr != null && arr.isArray && arr.size == rows.size,
                  s"BATCH @custom response must be an array of ${rows.size}")
                rows.iterator.zipWithIndex.map { case (r, i) =>
                  val n = arr.get(i)
                  Row.fromSeq(r.toSeq :+ (if (n.isNull) null else n.asText()))
                }
              case None =>
                rows.iterator.map(r => Row.fromSeq(r.toSeq :+ null))
            }
          }
        case _ =>
          // consecutive-failure circuit per partition: after
          // FailureBudget timeouts in a row, stop dialing — the rest of
          // the partition resolves null immediately
          var consecutiveFailures = 0
          it.map { r =>
            val v =
              if (consecutiveFailures >= FailureBudget) null
              else {
                val url = substitute(spec.url, r, urlMode = true)
                val body = spec.body.map(substitute(_, r, urlMode = false))
                try {
                  val out = scalarOf(
                    transport.send(url, spec.method, body, spec.timeoutMs))
                  consecutiveFailures = 0
                  out
                } catch {
                  case _: java.io.IOException |
                      _: java.net.http.HttpTimeoutException =>
                    consecutiveFailures += 1
                    null
                }
              }
            Row.fromSeq(r.toSeq :+ v)
          }
      }
    }
    val typed = fieldType match {
      case "Int" => col(raw).cast("int")
      case "Int64" => col(raw).cast("long")
      case "Float" => col(raw).cast("double")
      case "Boolean" => col(raw).cast("boolean")
      case _ => col(raw)
    }
    spark.createDataFrame(rdd, outSchema)
      .withColumn(outName, typed).drop(raw)
  }
}
