package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GraphStore
import graft.dql.{DqlQuery, Parser}
import graft.exec.DqlExecutor

/** The DQL upsert block (reference dql/parser_mutation.go ParseMutation,
  * dql/upsert_test.go):
  *
  * {{{
  * upsert {
  *   query { q(func: ...) { m as uid  ... } }
  *   mutation @if(eq(len(m), 1) AND gt(len(f), 0)) {
  *     set    { uid(m) <pred> "value" .   uid(m) <pred> uid(f) . }
  *     delete { uid(m) <pred> * . }
  *   }
  *   mutation @if(...) { ... }   # conditional branches, in order
  * }
  * }}}
  *
  * Execution mirrors the reference's flow (edgraph/server.go:575
  * doMutate): run the query once, bind uid variables, evaluate each
  * mutation's @if over len(var) counts (a driver-side scalar, exactly
  * like the reference evaluating @if server-side before proposing),
  * expand the N-Quad templates against the bound uid sets, and apply
  * set/delete merges. Templates referencing a var expand to one N-Quad
  * per bound uid (subject and object vars expand independently — the
  * cross product, reference query/mutation.go).
  *
  * Operates on the canonical triples frame (the TripleFrameStore input
  * shape): subject, predicate, objectUid, value, lang, facets.
  */
object Upsert {

  final case class UpsertException(msg: String) extends RuntimeException(msg)

  // ---- parsed form ----

  /** One template N-Quad: each part is a raw token — subject
    * `uid(v)`/`<0xN>`, predicate `<p>`/`*`, object
    * `uid(v)`/`<0xN>`/`"value"`/`*`.
    */
  final case class NqTemplate(subj: String, pred: String, obj: String)

  sealed trait Cond
  final case class CondCmp(op: String, varName: String, n: Long) extends Cond
  final case class CondAnd(l: Cond, r: Cond) extends Cond
  final case class CondOr(l: Cond, r: Cond) extends Cond
  final case class CondNot(c: Cond) extends Cond

  final case class Mutation(cond: Option[Cond], sets: Seq[NqTemplate],
      deletes: Seq[NqTemplate])

  final case class UpsertBlock(query: DqlQuery, mutations: Seq[Mutation])

  // ---- text-level parser (brace matching + per-line templates) ----

  /** Extract the `{...}` span starting at the first '{' at/after `from`;
    * returns (inner text, index after closing brace).
    */
  private def braceSpan(text: String, from: Int): (String, Int) = {
    val open = text.indexOf('{', from)
    if (open < 0) throw UpsertException("expected '{'")
    var depth = 0; var i = open
    while (i < text.length) {
      text(i) match {
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return (text.substring(open + 1, i), i + 1)
        case _ =>
      }
      i += 1
    }
    throw UpsertException("unbalanced braces in upsert block")
  }

  private val nqRe =
    """^\s*(uid\(\w+\)|<0x[0-9a-fA-F]+>|_:[\w.-]+)\s+(<[^>]+>|\*)\s+(uid\(\w+\)|val\(\w+\)|<0x[0-9a-fA-F]+>|"(?:[^"\\]|\\.)*"|\*)\s*\.?\s*$""".r

  private def parseTemplates(body: String): Seq[NqTemplate] =
    body.linesIterator.map(_.trim).filter(_.nonEmpty).map {
      case nqRe(s, p, o) => NqTemplate(s, p, o)
      case bad => throw UpsertException(s"bad N-Quad template: $bad")
    }.toSeq

  /** `eq(len(m), 1) AND gt(len(f), 0)` with AND/OR/NOT and parens. */
  private def parseCond(text: String): Cond = {
    val toks = graft.dql.Lexer.tokenize(text)
    var i = 0
    import graft.dql.{Ident, NumLit, Punct}
    def peek = if (i < toks.length) toks(i) else Punct("")
    def next() = { val t = peek; i += 1; t }
    def expect(p: String): Unit =
      if (next() != Punct(p)) throw UpsertException(s"expected '$p' in @if")
    def cmp(): Cond = peek match {
      case Ident("NOT" | "not") => next(); CondNot(cmp())
      case Punct("(") => next(); val c = or(); expect(")"); c
      case Ident(op) =>
        next(); expect("("); // op(len(v), n)
        next() match {
          case Ident("len") =>
          case t => throw UpsertException(s"expected len(var) in @if, got $t")
        }
        expect("(")
        val v = next() match {
          case Ident(name) => name
          case t => throw UpsertException(s"expected var name, got $t")
        }
        expect(")"); expect(",")
        val n = next() match {
          case NumLit(s) => s.toLong
          case t => throw UpsertException(s"expected number, got $t")
        }
        expect(")")
        CondCmp(op, v, n)
      case t => throw UpsertException(s"unexpected token in @if: $t")
    }
    def and(): Cond = {
      var l = cmp()
      while (peek == Ident("AND") || peek == Ident("and")) { next(); l = CondAnd(l, cmp()) }
      l
    }
    def or(): Cond = {
      var l = and()
      while (peek == Ident("OR") || peek == Ident("or")) { next(); l = CondOr(l, and()) }
      l
    }
    val c = or()
    if (i != toks.length) throw UpsertException("trailing tokens in @if")
    c
  }

  def parse(text: String): UpsertBlock = {
    val upsertAt = text.indexOf("upsert")
    if (upsertAt < 0) throw UpsertException("not an upsert block")
    val (body, _) = braceSpan(text, upsertAt)

    val queryAt = body.indexOf("query")
    if (queryAt < 0) throw UpsertException("upsert block has no query")
    val (queryBody, afterQuery) = braceSpan(body, queryAt)
    if (body.indexOf("query", afterQuery) >= 0)
      throw UpsertException("multiple query blocks in upsert")
    val query = Parser.parseQueryOfUpsert(s"{ $queryBody }")

    val mutations = Seq.newBuilder[Mutation]
    var pos = 0
    while ({ pos = body.indexOf("mutation", pos); pos >= 0 }) {
      var i = pos + "mutation".length
      while (i < body.length && body(i).isWhitespace) i += 1
      val cond =
        if (i < body.length && body(i) == '@') {
          // the only mutation directive is @if — a typo'd name must
          // error, not silently parse its parens as the condition
          // (reference TestConditionalUpsertErrWrongIf)
          var k = i + 1
          while (k < body.length && body(k).isLetter) k += 1
          val dname = body.substring(i + 1, k)
          if (dname != "if")
            throw UpsertException(s"Expected @if, found [@$dname]")
          val close = {
            val open = body.indexOf('(', i)
            var depth = 0; var j = open
            while ({ body(j) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }; depth != 0 }) j += 1
            j
          }
          val c = parseCond(body.substring(body.indexOf('(', i) + 1, close))
          i = close + 1
          Some(c)
        } else None
      val (mutBody, afterMut) = braceSpan(body, i)
      val sets =
        if (mutBody.contains("set")) {
          val (b, _) = braceSpan(mutBody, mutBody.indexOf("set"))
          parseTemplates(b)
        } else Nil
      val deletes =
        if (mutBody.contains("delete")) {
          val (b, _) = braceSpan(mutBody, mutBody.indexOf("delete"))
          parseTemplates(b)
        } else Nil
      if (sets.isEmpty && deletes.isEmpty)
        throw UpsertException("empty mutation block")
      mutations += Mutation(cond, sets, deletes)
      pos = afterMut
    }
    val ms = mutations.result()
    if (ms.isEmpty) throw UpsertException("upsert block has no mutation")
    UpsertBlock(query, ms)
  }

  // ---- execution ----

  private def evalCond(c: Cond, len: String => Long): Boolean = c match {
    case CondCmp("eq", v, n) => len(v) == n
    case CondCmp("lt", v, n) => len(v) < n
    case CondCmp("le", v, n) => len(v) <= n
    case CondCmp("gt", v, n) => len(v) > n
    case CondCmp("ge", v, n) => len(v) >= n
    case CondCmp(op, _, _) => throw UpsertException(s"unsupported @if fn $op")
    case CondAnd(l, r) => evalCond(l, len) && evalCond(r, len)
    case CondOr(l, r) => evalCond(l, len) || evalCond(r, len)
    case CondNot(x) => !evalCond(x, len)
  }

  private val uidVarRe = """uid\((\w+)\)""".r
  private val valVarRe = """val\((\w+)\)""".r
  private val uidLitRe = """<0x([0-9a-fA-F]+)>""".r

  /** Expand a template part into a 1-column frame of uids (vars) or a
    * literal column.
    */
  private def subjFrame(part: String, vars: String => DataFrame,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    part match {
      case uidVarRe(v) => vars(v).select(col("uid").as("subject"))
      case uidLitRe(h) =>
        Seq(java.lang.Long.parseLong(h, 16)).toDF("subject")
      case other => throw UpsertException(s"unsupported subject: $other")
    }
  }

  /** Apply a parsed upsert to a triples frame (subject, predicate,
    * objectUid, value, lang, facets). Returns the post-mutation frame.
    */
  def execute(ts: GraphStore, text: String, base: DataFrame): DataFrame = {
    val block = parse(text)
    val exec = new DqlExecutor(ts)
    exec.flatAst(block.query) // runs the query; binds `x as ...` vars
    val lens = scala.collection.mutable.Map.empty[String, Long]
    def len(v: String): Long = lens.getOrElseUpdate(v,
      exec.variable(v).map(_.count()).getOrElse(
        throw UpsertException(s"@if references unbound var $v")))
    def varUids(v: String): DataFrame = exec.variable(v).getOrElse(
      throw UpsertException(s"template references unbound var $v"))

    var cur = base
    block.mutations.foreach { m =>
      if (m.cond.forall(evalCond(_, len))) {
        m.sets.foreach { t =>
          val s = subjFrame(t.subj, varUids, ts.spark)
          val pred = t.pred.stripPrefix("<").stripSuffix(">")
          val row = t.obj match {
            case uidVarRe(v) =>
              s.crossJoin(varUids(v).select(col("uid").as("__o")))
                .select(col("subject"), lit(pred).as("predicate"),
                  col("__o").as("objectUid"), lit(null).cast("string").as("value"),
                  lit(null).cast("string").as("lang"),
                  lit(null).cast("string").as("facets"))
            case valVarRe(v) =>
              // per-subject value substitution (reference
              // edgraph/server.go:1081 updateValInMutations): the quad
              // lands only on subjects with an entry in the value var's
              // uid→value map — the inner join IS that semantics
              s.join(varUids(v).select(col("uid").as("subject"),
                  col("value").cast("string").as("__v")), Seq("subject"))
                .select(col("subject"), lit(pred).as("predicate"),
                  lit(null).cast("long").as("objectUid"),
                  col("__v").as("value"),
                  lit(null).cast("string").as("lang"),
                  lit(null).cast("string").as("facets"))
            case uidLitRe(h) =>
              s.select(col("subject"), lit(pred).as("predicate"),
                lit(java.lang.Long.parseLong(h, 16)).as("objectUid"),
                lit(null).cast("string").as("value"),
                lit(null).cast("string").as("lang"),
                lit(null).cast("string").as("facets"))
            case q if q.startsWith("\"") =>
              s.select(col("subject"), lit(pred).as("predicate"),
                lit(null).cast("long").as("objectUid"),
                lit(q.substring(1, q.length - 1)).as("value"),
                lit(null).cast("string").as("lang"),
                lit(null).cast("string").as("facets"))
            case other => throw UpsertException(s"unsupported object: $other")
          }
          cur = Mutations.applySet(cur, row)
        }
        m.deletes.foreach { t =>
          val s = subjFrame(t.subj, varUids, ts.spark)
          val pred = t.pred.stripPrefix("<").stripSuffix(">")
          val del =
            if (t.pred == "*") s.select(col("subject"), lit("*").as("predicate"))
            else s.select(col("subject"), lit(pred).as("predicate"))
          cur = Mutations.applyDelete(cur, del)
        }
      }
    }
    cur
  }
}
