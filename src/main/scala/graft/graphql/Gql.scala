package graft.graphql

/** GraphQL query-document model + parser (executable subset).
  *
  * The reference layers an auto-generated GraphQL API over DQL: an SDL
  * schema yields `query<T>` / `get<T>` / `aggregate<T>` root fields
  * (/root/reference/graphql/schema/gqlschema.go:1054,1371,1900) and every
  * operation is *rewritten* to the DQL IR — no separate execution engine
  * (/root/reference/graphql/resolve/query_rewriter.go:105 Rewrite). We
  * mirror that: this file parses the GraphQL document; Rewriter.scala maps
  * it onto graft.dql's AST, which the existing DqlExecutor runs as
  * DataFrame plans.
  */
sealed trait GVal
final case class GStr(s: String) extends GVal
final case class GNum(s: String) extends GVal       // lexeme kept verbatim
final case class GBool(b: Boolean) extends GVal
case object GNull extends GVal
final case class GEnum(name: String) extends GVal   // BUILDING, ACTIVE, ...
final case class GList(items: Seq[GVal]) extends GVal
final case class GObj(fields: Seq[(String, GVal)]) extends GVal {
  def get(k: String): Option[GVal] = fields.collectFirst { case (`k`, v) => v }
}

final case class GqlSelection(
    alias: Option[String],
    name: String,
    args: Seq[(String, GVal)],
    directives: Seq[String],      // @cascade etc.
    children: Seq[GqlSelection],
    dirArgs: Map[String, Seq[(String, GVal)]] = Map.empty) { // @cascade(fields: [...])
  def arg(k: String): Option[GVal] = args.collectFirst { case (`k`, v) => v }
  def outName: String = alias.getOrElse(name)
}

final case class GqlOperation(roots: Seq[GqlSelection],
    kind: String = "query") // query | mutation | subscription

object GqlParser {
  final case class ParseException(msg: String) extends RuntimeException(msg)

  // ---- tokenizer ----
  private sealed trait Tok
  private final case class TName(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TNum(s: String) extends Tok
  private final case class TPunct(c: String) extends Tok

  private def tokenize(in: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length
    def peek(k: Int): Char = if (i + k < n) in(i + k) else ' '
    while (i < n) {
      val c = in(i)
      if (c.isWhitespace || c == ',') i += 1 // commas are insignificant in GraphQL
      else if (c == '#') { while (i < n && in(i) != '\n') i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder; i += 1
        while (i < n && in(i) != '"') {
          if (in(i) == '\\' && i + 1 < n) {
            i += 1
            sb.append(in(i) match { case 'n' => '\n'; case 't' => '\t'; case o => o })
          } else sb.append(in(i))
          i += 1
        }
        if (i >= n) throw ParseException("unterminated string")
        i += 1; out += TStr(sb.result())
      } else if (c.isDigit || (c == '-' && peek(1).isDigit)) {
        val start = i; i += 1
        while (i < n && (in(i).isDigit || in(i) == '.' || in(i) == 'e' ||
          in(i) == 'E' || in(i) == '-' || in(i) == '+' || in(i) == 'x' ||
          in(i).isLetter)) i += 1 // covers floats, exponents, 0x uids
        out += TNum(in.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (in(i).isLetterOrDigit || in(i) == '_')) i += 1
        out += TName(in.substring(start, i))
      } else if ("(){}[]:@!=$.".indexOf(c) >= 0) { out += TPunct(c.toString); i += 1 }
      else throw ParseException(s"unexpected char '$c' at $i")
    }
    out.result()
  }

  // ---- recursive descent ----
  private final class P(ts: Vector[Tok], vars: Map[String, GVal]) {
    private var i = 0
    // operation variables: caller-provided values win; `= default` in the
    // definition list fills the gaps (reference graphql/resolve applies
    // operation variables before rewrite)
    private var varVals: Map[String, GVal] = vars
    def peek: Option[Tok] = if (i < ts.length) Some(ts(i)) else None
    def next(): Tok =
      if (i < ts.length) { val t = ts(i); i += 1; t }
      else throw ParseException("unexpected end of document")
    def expect(p: String): Unit = next() match {
      case TPunct(`p`) => ()
      case other => throw ParseException(s"expected '$p', got $other")
    }
    def name(): String = next() match {
      case TName(s) => s
      case other => throw ParseException(s"expected name, got $other")
    }

    // `fragment Name on Type { ... }` definitions, collected while
    // scanning the document; `...Name` spreads are left as `...`-prefixed
    // marker selections and spliced after every definition is parsed
    // (fragments may be declared after their first use).
    private var fragments = Map.empty[String, Seq[GqlSelection]]

    /** Pre-scan the token stream for the operation's variable-definition
      * defaults BEFORE parsing anything: a fragment declared ahead of the
      * operation may use `@include(if: $flag)` whose value comes from a
      * default recorded in the operation header (spec-legal ordering).
      */
    private def preScanDefaults(): Unit = {
      var i = 0
      def tk(j: Int): Option[Tok] =
        if (j < ts.length) Some(ts(j)) else None
      while (i < ts.length) {
        ts(i) match {
          case TName("query") | TName("mutation")
              if i == 0 || ts(i - 1) == TPunct("}") =>
            var j = i + 1
            tk(j) match { case Some(TName(_)) => j += 1; case _ => () }
            if (tk(j).contains(TPunct("("))) {
              j += 1
              var depth = 1
              var curVar: Option[String] = None
              while (j < ts.length && depth > 0) {
                ts(j) match {
                  case TPunct("(") | TPunct("[") => depth += 1
                  case TPunct(")") | TPunct("]") => depth -= 1
                  case TPunct("$") =>
                    curVar = tk(j + 1).collect { case TName(n) => n }
                  case TPunct("=") if depth == 1 =>
                    (curVar, tk(j + 1)) match {
                      case (Some(vn), Some(TStr(v))) =>
                        if (!varVals.contains(vn)) varVals += (vn -> GStr(v))
                      case (Some(vn), Some(TNum(v))) =>
                        if (!varVals.contains(vn)) varVals += (vn -> GNum(v))
                      case (Some(vn), Some(TName("true"))) =>
                        if (!varVals.contains(vn)) varVals += (vn -> GBool(true))
                      case (Some(vn), Some(TName("false"))) =>
                        if (!varVals.contains(vn)) varVals += (vn -> GBool(false))
                      case _ => () // list/object defaults resolve in operation()
                    }
                  case _ => ()
                }
                j += 1
              }
            }
            i = j // keep scanning: a field merely NAMED query/mutation
                  // after a '}' has no var-defs and must not end the scan
          case _ => i += 1
        }
      }
    }

    def document(): GqlOperation = {
      preScanDefaults()
      var roots: Seq[GqlSelection] = Nil
      var sawOp = false
      var kind = "query"
      while (peek.isDefined) peek match {
        case Some(TName("fragment")) =>
          next()
          val fn = name()
          next() match {
            case TName("on") => ()
            case other => throw ParseException(s"expected 'on', got $other")
          }
          name() // type condition — the executable subset keys on fields
          expect("{")
          fragments += (fn -> selections())
        case _ =>
          if (sawOp) throw ParseException("multiple operations in document")
          sawOp = true
          val op = operation()
          roots = op.roots
          kind = op.kind
      }
      if (!sawOp) throw ParseException("document has no operation")
      GqlOperation(splice(roots, Set.empty), kind)
    }

    /** Replace `...Frag` markers with the fragment's (recursively
      * spliced) selections; `seen` guards against spread cycles.
      */
    private def splice(sels: Seq[GqlSelection],
        seen: Set[String]): Seq[GqlSelection] =
      sels.flatMap { s =>
        if (s.name.startsWith("...")) {
          val fn = s.name.drop(3)
          if (seen(fn)) throw ParseException(s"fragment cycle at $fn")
          val body = fragments.getOrElse(fn,
            throw ParseException(s"undefined fragment $fn"))
          splice(body, seen + fn)
        } else Seq(s.copy(children = splice(s.children, seen)))
      }

    def operation(): GqlOperation = {
      // optional `query [Name]` / `mutation [Name]` / `subscription
      // [Name]` header, then optional `($x: Int! = 3, $s: String)`
      // variable definitions
      var opKind = "query"
      peek match {
        case Some(TName(k @ ("query" | "mutation" | "subscription"))) =>
          opKind = k
          next()
          peek match { case Some(TName(_)) => next(); case _ => () }
          if (peek.contains(TPunct("("))) {
            next()
            while (!peek.contains(TPunct(")"))) {
              expect("$"); val vn = name(); expect(":"); skipType()
              if (peek.contains(TPunct("="))) {
                next()
                val dv = value()
                if (!varVals.contains(vn)) varVals += (vn -> dv)
              }
            }
            next() // ')'
          }
        case _ => ()
      }
      expect("{")
      val roots = selections()
      GqlOperation(roots, opKind)
    }

    /** Parse until the matching '}' (already inside it). */
    def selections(): Seq[GqlSelection] = {
      val out = Seq.newBuilder[GqlSelection]
      var done = false
      while (!done) peek match {
        case Some(TPunct("}")) => next(); done = true
        case Some(TName(_)) =>
          val sel = selection()
          // a field dropped by @include/@skip vanishes from the set
          if (sel.name != "\u0000dropped") out += sel
        case Some(TPunct(".")) =>
          // `...Frag` spread → marker selection, spliced in document();
          // `... on T { sels }` inline fragment → type-condition marker
          // the schema-aware rewriter resolves. Both accept directives
          // (spec: FragmentSpread/InlineFragment carry Directives) --
          // @include/@skip drop the whole branch, others ride the marker.
          expect("."); expect("."); expect(".")
          val n = name()
          if (n == "on") {
            val tc = name()
            val (dirs, dirArgs, dropped) = parseDirectives()
            expect("{")
            val sels = selections() // always consume the block
            if (!dropped)
              out += GqlSelection(None, "\u0000on:" + tc, Nil, dirs, sels, dirArgs)
          } else {
            val (dirs, dirArgs, dropped) = parseDirectives()
            if (!dropped)
              out += GqlSelection(None, "..." + n, Nil, dirs, Nil, dirArgs)
          }
        case other => throw ParseException(s"expected selection, got $other")
      }
      out.result()
    }

    private def selection(): GqlSelection = {
      val first = name()
      val (alias, fieldName) = peek match {
        case Some(TPunct(":")) => next(); (Some(first), name())
        case _ => (None, first)
      }
      val args = peek match {
        case Some(TPunct("(")) =>
          next()
          val as = Seq.newBuilder[(String, GVal)]
          while (!peek.contains(TPunct(")"))) {
            val k = name(); expect(":"); as += (k -> value())
          }
          next() // ')'
          as.result()
        case _ => Nil
      }
      val (dirs, dirArgs, dropped) = parseDirectives()
      val children = peek match {
        case Some(TPunct("{")) => next(); selections()
        case _ => Nil
      }
      val sel = GqlSelection(alias, fieldName, args, dirs, children, dirArgs)
      if (dropped) sel.copy(name = "\u0000dropped") else sel
    }

    /** Zero or more directives at the current position — fields,
      * fragment spreads and inline fragments all take them (spec
      * Directives). @include(if: Boolean!) / @skip(if: Boolean!) — the
      * executable directives of the GraphQL spec (the reference
      * validates and applies them through gqlparser) — evaluate here,
      * after variable substitution, and report the construct dropped.
      * Other directives keep their names + args.
      */
    private def parseDirectives(): (Seq[String], Map[String, Seq[(String, GVal)]], Boolean) = {
      val dirs = Seq.newBuilder[String]
      val dirArgsB = Map.newBuilder[String, Seq[(String, GVal)]]
      var dropped = false
      while (peek.contains(TPunct("@"))) {
        next()
        val dn = name()
        val dargs = peek match {
          case Some(TPunct("(")) =>
            next()
            val as = Seq.newBuilder[(String, GVal)]
            while (!peek.contains(TPunct(")"))) {
              val k = name(); expect(":"); as += (k -> value())
            }
            next()
            as.result()
          case _ => Nil
        }
        def ifArg: Boolean = dargs.collectFirst { case ("if", v) => v } match {
          case Some(GBool(b)) => b
          case Some(other) => throw ParseException(
            s"@$dn(if:) must be a Boolean, got $other")
          case None => throw ParseException(s"@$dn requires an `if` argument")
        }
        dn match {
          case "include" => if (!ifArg) dropped = true
          case "skip" => if (ifArg) dropped = true
          case _ =>
            dirs += dn
            if (dargs.nonEmpty) dirArgsB += (dn -> dargs)
        }
      }
      (dirs.result(), dirArgsB.result(), dropped)
    }

    /** Type reference in a variable definition: `Int`, `[String!]!` — the
      * executable subset ignores types (values are already typed GVals),
      * so just consume the tokens.
      */
    private def skipType(): Unit = {
      next() match {
        case TName(_) => ()
        case TPunct("[") => skipType(); expect("]")
        case other => throw ParseException(s"expected type, got $other")
      }
      if (peek.contains(TPunct("!"))) next()
    }

    def value(): GVal = next() match {
      case TPunct("$") =>
        val vn = name()
        varVals.getOrElse(vn,
          throw ParseException(s"variable $$$vn has no value"))
      case TStr(s) => GStr(s)
      case TNum(s) => GNum(s)
      case TName("true") => GBool(true)
      case TName("false") => GBool(false)
      case TName("null") => GNull
      case TName(e) => GEnum(e)
      case TPunct("[") =>
        val items = Seq.newBuilder[GVal]
        while (!peek.contains(TPunct("]"))) items += value()
        next(); GList(items.result())
      case TPunct("{") =>
        val fs = Seq.newBuilder[(String, GVal)]
        while (!peek.contains(TPunct("}"))) {
          val k = name(); expect(":"); fs += (k -> value())
        }
        next(); GObj(fs.result())
      case other => throw ParseException(s"expected value, got $other")
    }
  }

  def parse(query: String,
      variables: Map[String, GVal] = Map.empty): GqlOperation =
    new P(tokenize(query), variables).document()
}
