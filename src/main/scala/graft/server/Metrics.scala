package graft.server

import java.util.concurrent.atomic.LongAdder

import scala.collection.concurrent.TrieMap

/** Scrapeable server metrics (reference x/metrics.go:467 registers the
  * Prometheus registry; the alpha serves it at
  * `/debug/prometheus_metrics`). Counters only plus render-time gauges —
  * the shapes `rate()` and alerting actually consume:
  *
  *   graft_http_requests_total{path,code}     request count per route
  *   graft_request_seconds_total{path}        cumulative handler seconds
  *   graft_grpc_requests_total{method,status} gRPC calls per method
  *   graft_txns_total{outcome}                committed/aborted txns
  *   graft_open_txns                          gauge, live open txns
  *
  * Exposition is the Prometheus text format (one HELP/TYPE block per
  * family, families and series sorted for deterministic scrapes).
  */
final class Metrics {

  private val counters =
    TrieMap.empty[(String, Seq[(String, String)]), LongAdder]
  private val gauges = TrieMap.empty[String, () => Long]
  private val help = TrieMap.empty[String, String]

  def describe(name: String, text: String): Unit = { help.put(name, text); () }

  def inc(name: String, labels: (String, String)*): Unit =
    add(name, 1L, labels: _*)

  def add(name: String, v: Long, labels: (String, String)*): Unit = {
    counters.getOrElseUpdate((name, labels.sortBy(_._1)), new LongAdder)
      .add(v)
    ()
  }

  /** Nanoseconds recorded as a float-seconds counter at render time. */
  def addNanos(name: String, nanos: Long, labels: (String, String)*): Unit =
    add(name, nanos, labels: _*)

  def gauge(name: String, supplier: () => Long): Unit = {
    gauges.put(name, supplier); ()
  }

  private def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def series(name: String, labels: Seq[(String, String)]): String =
    if (labels.isEmpty) name
    else labels.map { case (k, v) => s"""$k="${esc(v)}"""" }
      .mkString(s"$name{", ",", "}")

  /** Prometheus text exposition format 0.0.4. */
  def render: String = {
    val sb = new StringBuilder
    counters.keys.map(_._1).toSeq.distinct.sorted.foreach { name =>
      help.get(name).foreach(h => sb.append(s"# HELP $name $h\n"))
      sb.append(s"# TYPE $name counter\n")
      counters.toSeq.filter(_._1._1 == name)
        .sortBy { case ((_, ls), _) => ls.map(l => l._1 + l._2).mkString }
        .foreach { case ((_, ls), v) =>
          // *_seconds_total counters are stored in nanos — render float
          val value =
            if (name.endsWith("_seconds_total")) (v.sum / 1e9).toString
            else v.sum.toString
          sb.append(s"${series(name, ls)} $value\n")
        }
    }
    gauges.toSeq.sortBy(_._1).foreach { case (name, sup) =>
      help.get(name).foreach(h => sb.append(s"# HELP $name $h\n"))
      sb.append(s"# TYPE $name gauge\n")
      sb.append(s"$name ${sup()}\n")
    }
    sb.toString
  }
}
