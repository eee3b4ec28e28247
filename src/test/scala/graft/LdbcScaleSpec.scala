package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{SchemaRegistry, TripleFrameStore}
import graft.dql.Parser
import graft.exec.DqlExecutor
import graft.sources.RdfSource

/** LDBC goldens at SCALE: the SNB fixture tiled N× into disjoint uid
  * bands, every query asserted SHAPE-STABLE against the same reference
  * goldens LdbcSpec pins at fixture scale.
  *
  * Tiling rule: tile k shifts every uid by k·0x100000 (the fixture tops
  * out at 0x2432) and suffixes the values of the three root-lookup
  * predicates — fqid, firstName, name — with "~t<k>", so every eq()
  * root stays anchored to tile 0 while type(person) roots, term scans
  * and the traversal joins run over the full N× graph. Tiles are
  * referentially closed by construction (edges remap inside their
  * tile), so the goldens determine the results EXACTLY: any frontier
  * leak across tiles, any order/cutoff instability under a 40× node
  * set, any type-index scan picking up a remapped distractor fails its
  * golden. Default 40 tiles ≈ 12k persons — the LDBC SF1 person count —
  * override with GRAFT_LDBC_TILES.
  *
  * Per-query wall-times are reported via info() (the README's LDBC
  * scale table is produced from this spec's output).
  */
class LdbcScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private val tiles =
    sys.env.get("GRAFT_LDBC_TILES").map(_.toInt).getOrElse(40)

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/ldbc/$name")
    require(in != null, s"missing test resource ldbc/$name — run tools/gen_ldbc.py")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  // the same schema LdbcSpec loads (kept in one place there would drag
  // the whole spec lazy graph in; the alter text is the contract)
  private lazy val schema: SchemaRegistry = {
    val (preds, types) = SchemaRegistry.parseAlter(
      """fqid: string @index(exact) .
        |id: int @index(int) .
        |firstName: string @index(exact) .
        |lastName: string .
        |birthday: string .
        |locationIP: string .
        |browserUsed: string .
        |gender: string .
        |creationDate: string @index(exact) .
        |content: string .
        |imageFile: string .
        |title: string @index(exact) .
        |name: string @index(exact) .
        |email: [string] .
        |language: [string] .
        |isLocatedIn: [uid] .
        |knows: [uid] @reverse .
        |hasCreator: [uid] @reverse .
        |replyOf: uid @reverse .
        |containerOf: [uid] @reverse .
        |hasModerator: [uid] .
        |studyAt: [uid] .
        |likes: [uid] @reverse .
        |hasTag: [uid] @reverse .
        |hasInterest: [uid] .
        |hasMember: [uid] @reverse .
        |isSubclassOf: [uid] @reverse .
        |hasType: [uid] @reverse .
        |workAt: [uid] .
        |isPartOf: [uid] .
        |""".stripMargin)
    new SchemaRegistry(preds.map(p => p.name -> p).toMap,
      types.map(t => t.name -> t).toMap)
  }

  import LdbcScaleSpec.retile

  private lazy val baseLines: Seq[String] =
    resource("fixture.nq").linesIterator.toSeq

  private lazy val store: TripleFrameStore = {
    import spark.implicits._
    val retileUdf = udf((line: String, k: Long) => retile(line, k))
    val tiled = baseLines.toDF("line")
      .crossJoin(spark.range(tiles).toDF("tile"))
      .select(retileUdf(col("line"), col("tile")).as("line"))
    new TripleFrameStore(spark, schema, RdfSource.parse(tiled),
      facetKeys = Map(
        "knows" -> Seq("creationDate" -> "string"),
        "hasMember" -> Seq("joinDate" -> "string"),
        "likes" -> Seq("creationDate" -> "string"),
        "workAt" -> Seq("workFrom" -> "string")))
  }

  private val mapper = new ObjectMapper()

  private def canon(s: String): com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node._
    def go(n: com.fasterxml.jackson.databind.JsonNode)
        : com.fasterxml.jackson.databind.JsonNode = n match {
      case o: ObjectNode =>
        val out = mapper.createObjectNode()
        val keys = new scala.collection.mutable.ArrayBuffer[String]()
        o.fieldNames().forEachRemaining(k => keys += k)
        keys.sorted.foreach(k => out.set[ObjectNode](k, go(o.get(k))))
        out
      case a: ArrayNode =>
        val out = mapper.createArrayNode()
        val kids = new scala.collection.mutable.ArrayBuffer[
          com.fasterxml.jackson.databind.JsonNode]()
        a.forEach(x => kids += go(x))
        kids.sortBy(_.toString).foreach(out.add)
        out
      case v if v.isNumber => DoubleNode.valueOf(v.asDouble())
      case other => other
    }
    go(mapper.readTree(s))
  }

  private def runCase(query: String, golden: String): Double = {
    val t0 = System.nanoTime()
    val ast = Parser.parse(query)
    val rows = new DqlExecutor(store)
      .jsonAllAst(ast, includeUid = false)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val byBlock = rows.groupBy(_.getString(0))
    val blocks = ast.blocks.filter(_.name != "var").flatMap { b =>
      val bn = if (b.shortest.isDefined) "_path_" else b.name
      val got = byBlock.getOrElse(bn, Array.empty).map(_.getString(2))
      if ((b.shortest.isDefined || b.groupby.nonEmpty) && got.isEmpty) None
      else Some(s""""$bn": ${got.mkString("[", ",", "]")}""")
    }
    val ours = s"""{${blocks.mkString(",")}}"""
    assert(canon(ours) == canon(golden), s"\nours:   $ours\ngolden: $golden")
    secs
  }

  private lazy val cases: Seq[(String, String, String)] = {
    val root = mapper.readTree(resource("cases.json"))
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    root.forEach { c =>
      buf += ((c.get("tag").asText(), c.get("query").asText(),
        c.get("resp").asText()))
    }
    buf.toSeq
  }

  test(s"tiled fixture is exactly $tiles referentially-closed copies") {
    import spark.implicits._
    val base = RdfSource.parse(baseLines.toDF("line")).count()
    val retileUdf = udf((line: String, k: Long) => retile(line, k))
    val parsed = RdfSource.parse(
      baseLines.toDF("line").crossJoin(spark.range(tiles).toDF("tile"))
        .select(retileUdf(col("line"), col("tile")).as("line"))).count()
    // row-count stability: the tiling dropped and duplicated nothing
    assert(parsed == tiles.toLong * base, s"parsed $parsed of ${tiles}x$base")
  }

  // every LDBC golden must hold VERBATIM on the tiled graph: eq() roots
  // anchor to tile 0, everything else (type scans, reverse edges, facet
  // filters, orderings, first:N cutoffs) runs at N× and must not shift
  Seq("IS01", "IS02", "IS03", "IS04", "IS05", "IS06", "IS07",
      "IC01", "IC02", "IC04", "IC05", "IC06", "IC07", "IC08", "IC09",
      "IC10", "IC11", "IC12", "IC13").foreach { tag =>
    cases.find(_._1 == tag).foreach { case (_, q, resp) =>
      test(s"ldbc golden at ${tiles}x: $tag") {
        val secs = runCase(q, resp)
        info(f"$tag at ${tiles}x: $secs%.2f s")
      }
    }
  }
}

/** Tiling transform lives on the companion so the UDF closure captures
  * only this serializable module, not the suite instance.
  */
object LdbcScaleSpec extends Serializable {
  private val uidRe = "<0x([0-9a-fA-F]+)>".r
  private val rootValRe =
    """^(<0x[0-9a-fA-F]+> <(?:fqid|firstName|name)> ")(.*)(" \.)$""".r
  private val idValRe =
    """^(<0x[0-9a-fA-F]+> <id> ")(\d+)(" \.)$""".r

  def retile(line: String, k: Long): String =
    if (k == 0L) line
    else {
      val shifted = uidRe.replaceAllIn(line, m =>
        f"<0x${java.lang.Long.parseLong(m.group(1), 16) + k * 0x100000L}%x>")
      shifted match {
        case rootValRe(pre, v, post) => s"$pre$v~t$k$post"
        // the int id is an eq() anchor too (IC02/04/05/07-10): shift it
        // into a disjoint per-tile band above the fixture's 2^42 ids
        case idValRe(pre, v, post) =>
          s"$pre${v.toLong + k * (1L << 50)}$post"
        case other => other
      }
    }
}
