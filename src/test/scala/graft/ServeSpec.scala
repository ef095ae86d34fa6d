package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

/** X2 HTTP surface: health-check semantics and pipeline-trigger status
  * mapping, exercised over real HTTP on an ephemeral port. */
class ServeSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET.build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("health check greets by query param, JSON body, or generically") {
    val serve = new Serve(() => """{"unused": true}""")
    val port = serve.start()
    try {
      val byQuery = get(port, "/api/HttpExample?name=Ada")
      assert(byQuery.statusCode() == 200)
      assert(byQuery.body() == "Hello, Ada. This HTTP triggered function executed successfully.")

      val byBody = post(port, "/api/HttpExample", """{"name": "Grace"}""")
      assert(byBody.statusCode() == 200)
      assert(byBody.body() == "Hello, Grace. This HTTP triggered function executed successfully.")

      val generic = get(port, "/api/HttpExample")
      assert(generic.statusCode() == 200)
      assert(generic.body().startsWith("This HTTP triggered function executed successfully."))

      val badJson = post(port, "/api/HttpExample", "not json at all")
      assert(badJson.statusCode() == 200)
      assert(badJson.body().startsWith("This HTTP triggered function executed successfully."))
    } finally serve.stop()
  }

  test("pipeline trigger maps success to 200 ok-JSON and failure to 500 error-JSON") {
    val ok = new Serve(() => """{"silver": {"rows": 3}}""")
    val okPort = ok.start()
    try {
      val r = get(okPort, "/api/process-bronze-to-silver")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("") == "application/json")
      assert(r.body() == """{"status": "ok", "outputs": {"silver": {"rows": 3}}}""")
    } finally ok.stop()

    val boom = new Serve(() => throw new RuntimeException("lake \"unreachable\""))
    val boomPort = boom.start()
    try {
      val r = get(boomPort, "/api/process-bronze-to-silver")
      assert(r.statusCode() == 500)
      assert(r.body() == """{"status": "error", "message": "lake \"unreachable\""}""")
    } finally boom.stop()
  }
}
