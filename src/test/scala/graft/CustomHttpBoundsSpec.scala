package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.graphql.CustomHttp

/** A hung @custom/@lambda sidecar must fail the FIELD, never stall the
  * stage: per-request timeouts bound each call, and the per-partition
  * consecutive-failure budget stops re-dialing a dead service for every
  * remaining parent (VERDICT r12 #7).
  */
final class CustomHttpBoundsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  /** Loopback emulator that ACCEPTS connections and never responds —
    * the worst failure mode: connect succeeds, read hangs.
    */
  private def stallingServer(): (Int, AtomicInteger, () => Unit) = {
    val srv = new java.net.ServerSocket(0)
    val accepted = new AtomicInteger
    val sockets = new java.util.concurrent.ConcurrentLinkedQueue[java.net.Socket]
    val t = new Thread(() => {
      try while (true) {
        val s = srv.accept()
        accepted.incrementAndGet()
        sockets.add(s) // hold open, never answer
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    (srv.getLocalPort, accepted,
      () => { srv.close(); sockets.forEach(s => s.close()) })
  }

  test("SINGLE mode: timeout nulls the field; the circuit stops re-dialing") {
    import spark.implicits._
    val (port, accepted, close) = stallingServer()
    try {
      val parents = (1 to 10).map(i => (i.toLong, s"n$i"))
        .toDF("id", "name").repartition(1)
      val spec = CustomHttp.HttpSpec(
        s"http://127.0.0.1:$port/rank?id=$$id", "GET", None, "SINGLE",
        timeoutMs = 300)
      val t0 = System.nanoTime()
      val out = CustomHttp.resolve(parents, "rank", "Int", spec).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(out.length == 10)
      assert(out.forall(_.isNullAt(2)), "every field nulls, none throws")
      // bounded: at most FailureBudget dials, not one per parent
      assert(accepted.get <= CustomHttp.FailureBudget,
        s"circuit must trip after ${CustomHttp.FailureBudget}, dialed ${accepted.get}")
      assert(secs < CustomHttp.FailureBudget * 0.3 + 5.0,
        s"stage must not serialize 10 timeouts: ${secs}s")
    } finally close()
  }

  test("BATCH mode: a hung sidecar nulls the batch, the stage completes") {
    import spark.implicits._
    val (port, _, close) = stallingServer()
    try {
      val parents = (1 to 4).map(i => (i.toLong, s"n$i"))
        .toDF("id", "name").repartition(1)
      val spec = CustomHttp.HttpSpec(
        s"http://127.0.0.1:$port/worker", "POST", None, "BATCH",
        lambdaResolver = Some("Customer.bio"), timeoutMs = 300)
      val out = CustomHttp.resolve(parents, "bio", "String", spec).collect()
      assert(out.length == 4 && out.forall(_.isNullAt(2)))
    } finally close()
  }
}
