package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.dql.Parser
import graft.exec.DqlExecutor

/** Reference-corpus sweep, committed and reproducible: every DQL query
  * document the reference's own query-package tests run (765 queries —
  * `src/test/resources/ref_query_corpus.json`, regenerable with
  * `tools/extract_ref_queries.py` from the query package's test files,
  * reference dir query/) is parsed and
  * executed against the golden Michonne fixture, and the observed
  * outcome is checked against the committed per-query ledger
  * (`ref_corpus_ledger.json`). Every non-executing query carries an
  * adjudication class in the ledger:
  *
  *  - `reference-error`: the reference's own tests expect this query to
  *    error (negative tests) — our error is parity, and for parse
  *    errors the message is pinned.
  *  - `artifact`: an extraction artifact — the literal is a fragment,
  *    depends on cluster fixtures outside the committed golden subset,
  *    or exercises a test-only knob; not a reachable engine surface.
  *  - `gap`: a real engine gap. The ledger must contain ZERO of these —
  *    any new gap fails the suite and becomes a tracked item.
  *
  * Record mode: `GRAFT_SWEEP_RECORD=1 sbt "testOnly graft.CorpusSweepSpec"`
  * writes `target/ref_corpus_ledger_observed.json` (outcomes without
  * adjudications) for re-adjudication after engine changes.
  */
final class CorpusSweepSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing test resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private lazy val corpus: Seq[String] = {
    val arr = mapper.readTree(resource("ref_query_corpus.json"))
    (0 until arr.size()).map(arr.get(_).asText())
  }

  private def sha12(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8"))
    d.take(6).map(b => f"$b%02x").mkString
  }

  // the reference runs these documents through processQueryNoErr with
  // the test's own GraphQL variables; the sweep supplies the same
  // bindings (same map the r14 sweep used)
  private val sweepVars = Map(
    "$a" -> "1", "$b" -> "2", "$name" -> "x", "$age" -> "3",
    "$minWeight" -> "0", "$uids" -> "1", "$list" -> "1", "$first" -> "2",
    "$offset" -> "0", "$numpath" -> "2", "$from" -> "1", "$to" -> "2",
    "$expand" -> "_all_", "$filter" -> "x", "$pred" -> "name",
    "$type" -> "Person", "$id" -> "1", "$as" -> "1", "$bs" -> "2",
    "$alice" -> "1", "$minVal" -> "1", "$maxVal" -> "2", "$depth" -> "2",
    "$str" -> "x", "$STR" -> "x", "$no" -> "1", "$yes" -> "1")

  private case class Observed(outcome: String, err: String, rh: String = "")

  /** Canonical form for result hashing: object keys sorted, arrays
    * sorted by rendered form, numbers normalized to double — the same
    * equivalences the golden JSON comparisons allow, so the hash pins
    * VALUES without pinning an array order the reference itself treats
    * as free.
    */
  private def canon(n: com.fasterxml.jackson.databind.JsonNode)
      : com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node._
    n match {
      case o: ObjectNode =>
        val out = mapper.createObjectNode()
        val keys = new scala.collection.mutable.ArrayBuffer[String]()
        o.fieldNames().forEachRemaining(k => keys += k)
        keys.sorted.foreach(k => out.set[ObjectNode](k, canon(o.get(k))))
        out
      case a: ArrayNode =>
        val out = mapper.createArrayNode()
        val kids = new scala.collection.mutable.ArrayBuffer[
          com.fasterxml.jackson.databind.JsonNode]()
        a.forEach(x => kids += canon(x))
        kids.sortBy(_.toString).foreach(out.add)
        out
      case v if v.isNumber => DoubleNode.valueOf(v.asDouble())
      case other => other
    }
  }

  private def runOne(q: String, store: graft.core.TripleFrameStore)
      : Observed = {
    val ast =
      try Parser.parseWithVars(q, sweepVars, checkUnusedVars = false)
      catch {
        case t: Throwable =>
          return Observed("parse_err",
            String.valueOf(t.getMessage).take(80))
      }
    try {
      val rows = new DqlExecutor(store).jsonAllAst(ast, includeUid = false)
        .collect()
      // result hash: every exec query's output values are pinned in the
      // ledger, so a silent wrong-answer drift on a reference shape
      // fails the sweep even where no golden JSON exists.
      // Blocks carrying an explicit top-level order directive are also
      // ORDER-pinned: their rows keep a zero-padded position index, so a
      // silently wrong orderasc/orderdesc fails its rh even though
      // canon() sorts arrays. (The executor's sort ends in a uid
      // tiebreak — a total order — so the index is deterministic.
      // Limitation: order directives on NESTED child blocks stay
      // value-pinned only; child arrays render inside one node's json
      // where canon's array sort still applies.)
      val orderedBlocks: Set[String] = ast.blocks.collect {
        case b if b.name != "var" && b.order.nonEmpty =>
          if (b.shortest.isDefined) "_path_" else b.name
      }.toSet
      val pos = scala.collection.mutable.Map.empty[String, Int]
      val rendered = rows.map { r =>
        val blk = r.getString(0)
        val body = canon(mapper.readTree(r.getString(2)))
        if (orderedBlocks(blk)) {
          val i = pos.getOrElse(blk, 0); pos(blk) = i + 1
          f"$blk|$i%06d|$body"
        } else s"$blk|$body"
      }.sorted
      Observed("exec", "", sha12(rendered.mkString("\n")))
    } catch {
      case t: Throwable =>
        Observed("exec_err", String.valueOf(t.getMessage).take(80))
    }
  }

  test("all 765 reference-corpus queries match their committed ledger") {
    val store = GoldenFixture.store
    val observed: Seq[(String, Observed)] =
      corpus.map(q => sha12(q) -> runOne(q, store))

    if (sys.env.contains("GRAFT_SWEEP_RECORD")) {
      val out = mapper.createArrayNode()
      observed.zip(corpus).foreach { case ((h, o), q) =>
        val n = out.addObject()
        n.put("h", h); n.put("outcome", o.outcome); n.put("err", o.err)
        if (o.outcome == "exec") n.put("rh", o.rh)
        n.put("q", q.replaceAll("\\s+", " ").take(120))
        ()
      }
      val f = new java.io.File("target/ref_corpus_ledger_observed.json")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(out))
      finally w.close()
      info(s"recorded ${observed.size} outcomes to $f")
    }

    val ledger = mapper.readTree(resource("ref_corpus_ledger.json"))
    val byHash = (0 until ledger.size()).map { i =>
      val n = ledger.get(i)
      n.get("h").asText() -> n
    }.toMap
    assert(byHash.size == corpus.size,
      s"ledger has ${byHash.size} entries for ${corpus.size} queries")

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    observed.zip(corpus).foreach { case ((h, o), q) =>
      byHash.get(h) match {
        case None => failures += s"$h: not in ledger: ${q.take(60)}"
        case Some(n) =>
          val want = n.get("outcome").asText()
          if (want != o.outcome)
            failures += s"$h: ledger=$want observed=${o.outcome} " +
              s"err='${o.err}' q=${q.replaceAll("\\s+", " ").take(80)}"
          else if (o.outcome == "exec") {
            // exec results are value-pinned: the canonical-form hash
            // must match the ledger's
            Option(n.get("rh")).map(_.asText()).foreach { rh =>
              if (rh != o.rh)
                failures += s"$h: result hash drifted: ledger=$rh " +
                  s"observed=${o.rh} q=${q.replaceAll("\\s+", " ").take(80)}"
            }
          } else {
            val adj = Option(n.get("adjudication")).map(_.asText("")).getOrElse("")
            if (!adj.startsWith("reference-error") && !adj.startsWith("artifact"))
              failures += s"$h: non-exec outcome with adjudication '$adj'"
            // parse errors are message-pinned: a drifting error means the
            // parser changed behavior on a reference query
            if (o.outcome == "parse_err" &&
                Option(n.get("err")).exists(e => e.asText() != o.err))
              failures += s"$h: parse error drifted: " +
                s"ledger='${n.get("err").asText()}' observed='${o.err}'"
          }
      }
    }
    assert(failures.isEmpty, failures.take(20).mkString("\n"))

    // the headline counts are pinned — any engine change that shifts
    // them must re-record and re-adjudicate the ledger
    val parsed = observed.count(_._2.outcome != "parse_err")
    val executed = observed.count(_._2.outcome == "exec")
    assert(parsed == 743, s"parsed=$parsed (want 743)")
    assert(executed == 670, s"executed=$executed (want 670)")
    // every exec entry must be value-pinned — a ledger regeneration that
    // silently dropped the result hashes would weaken the sweep back to
    // outcome-only
    val hashed = byHash.values.count(n =>
      n.get("outcome").asText() == "exec" && n.hasNonNull("rh"))
    assert(hashed == executed, s"ledger carries rh on $hashed of $executed")
  }
}
