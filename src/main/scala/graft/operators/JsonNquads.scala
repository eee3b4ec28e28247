package graft.operators

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested JSON mutation parser: documents → N-Quad triples with blank
  * nodes and edge facets (reference chunker/json_parser.go:792 ParseJSON,
  * :116 facet keys).
  *
  * Semantics mirrored from the reference:
  *  - a `uid` field names the node; otherwise it gets a deterministic
  *    blank label derived from the document id and the path to the node
  *    (`_:<id>`, `_:<id>.<pred>.<i>` for array elements) — the
  *    reference's `_:blank-N` counter made reproducible under
  *    any partitioning by pathing instead of global numbering
  *  - `pred|facet` keys inside a child object attach facets to the
  *    INCOMING `pred` edge, serialized `k=v` sorted-joined like
  *    RdfSource facets
  *  - scalar fields → value triples (JSON scalars as their text form);
  *    scalar arrays → one triple per element (list predicates);
  *    object / object-array fields → edge triples + recursion
  *
  * Parsing is per-row imperative (Jackson streaming over each document),
  * the one place mapPartitions-style logic is the right Spark tool — each
  * document is independent, so this scales embarrassingly; all shuffle
  * behavior is whatever the caller does with the output triples.
  */
object JsonNquads {

  /** docs(idCol, jsonCol) → triples (subject, predicate, object, facets). */
  def parse(docs: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("string"), col(jsonCol))
      .as[(String, String)]
      .flatMap { case (id, js) => flatten(id, js) }
      .toDF("subject", "predicate", "object", "facets")
  }

  private[graft] def flatten(
      id: String, js: String): Seq[(String, String, String, String)] = {
    val root = new ObjectMapper().readTree(js)
    val out = Seq.newBuilder[(String, String, String, String)]

    def subjectOf(o: JsonNode, default: String): String =
      if (o.hasNonNull("uid")) o.get("uid").asText else default

    def facetsOf(o: JsonNode, pred: String): String =
      o.fields().asScala.toSeq
        .filter(_.getKey.startsWith(pred + "|"))
        .map(e => s"${e.getKey.stripPrefix(pred + "|")}=${e.getValue.asText}")
        .sorted.mkString(",")

    def walk(subj: String, o: JsonNode): Unit =
      o.fields().asScala.foreach { e =>
        val k = e.getKey
        val v = e.getValue
        if (k == "uid" || k.contains("|")) () // node id / edge facet keys
        else if (v.isObject) {
          val child = subjectOf(v, s"$subj.$k")
          out += ((subj, k, child, facetsOf(v, k)))
          walk(child, v)
        } else if (v.isArray) {
          v.elements().asScala.zipWithIndex.foreach { case (el, i) =>
            if (el.isObject) {
              val child = subjectOf(el, s"$subj.$k.$i")
              out += ((subj, k, child, facetsOf(el, k)))
              walk(child, el)
            } else if (!el.isNull) out += ((subj, k, el.asText, ""))
          }
        } else if (!v.isNull) out += ((subj, k, v.asText, ""))
      }

    walk(subjectOf(root, s"_:$id"), root)
    out.result()
  }
}
