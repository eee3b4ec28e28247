package graft.dql

/** Recursive-descent parser for the DQL subset, following the grammar of
  * the reference parser (/root/reference/dql/parser.go: blocks :759
  * ToSubGraph shapes, filter precedence :183-187, args :2783) without
  * porting its code.
  *
  * Supported:
  *   { name(func: f(...) [, orderasc/orderdesc: p] [, first/offset/after: n])
  *       [@filter(tree)] [@cascade] [@normalize] [@recurse(depth: n [, loop: b])]
  *     { selections } }
  *   selection := [alias ':'] [~]pred [(args)] [@filter(tree)] [{ selections }]
  *              | [alias ':'] count(pred) | uid | expand(_all_)
  *   filter tree: AND / OR / NOT with parentheses.
  */
object Parser {

  final case class ParseException(msg: String) extends RuntimeException(msg)

  def parse(input: String): DqlQuery = parseWithVars(input, Map.empty)

  /** Parse WITHOUT the defined-but-unused variable check — the upsert
    * form binds query vars consumed by the MUTATION part, which lives
    * outside the parsed query document (reference dql/upsert.go keeps
    * one var scope across both).
    */
  def parseQueryOfUpsert(input: String): DqlQuery =
    parseWithVars(input, Map.empty, checkUnusedVars = false)

  /** DQL query variables (reference dql/vars.go, api queryWithVars): an
    * optional `query name($a: int = 3, $b: string)` header declares
    * them; caller values override declared defaults; `$a` references
    * substitute as literals typed by the declaration before parsing.
    */
  def parseWithVars(input: String, vars: Map[String, String],
      checkUnusedVars: Boolean = true): DqlQuery = {
    val ts = Lexer.tokenize(input)
    var i = 0
    var defaults = Map.empty[String, String]
    var types = Map.empty[String, String]
    if (ts.headOption.contains(Ident("query"))) {
      i = 1
      ts.lift(i) match { // optional operation name
        case Some(Ident(n)) if !n.startsWith("$") => i += 1
        case _ => ()
      }
      if (ts.lift(i).contains(Punct("("))) {
        i += 1
        while (i < ts.length && ts(i) != Punct(")")) ts(i) match {
          case Ident(n) if n.startsWith("$") =>
            i += 1
            if (ts.lift(i).contains(Punct(":"))) i += 1
            ts.lift(i) match {
              case Some(Ident(t)) => types += n -> t; i += 1
              case _ => types += n -> "string"
            }
            if (ts.lift(i).contains(Punct("="))) {
              i += 1
              ts.lift(i) match {
                case Some(NumLit(v)) => defaults += n -> v; i += 1
                case Some(StrLit(v)) => defaults += n -> v; i += 1
                case Some(Ident(v)) => defaults += n -> v; i += 1
                case _ => ()
              }
            }
          case Punct(",") => i += 1
          case other =>
            throw ParseException(s"bad variable declaration: $other")
        }
        if (i < ts.length) i += 1 // ')'
      }
    }
    val body = ts.drop(i).map {
      case Ident(n) if n.startsWith("$") =>
        val v = vars.get(n).orElse(defaults.get(n)).getOrElse(
          throw ParseException(s"variable $n has no value"))
        types.getOrElse(n, "string") match {
          case "int" | "float" => NumLit(v)
          case "bool" => Ident(v)
          case _ => StrLit(v)
        }
      case t => t
    }
    new Parser(body, checkUnusedVars).parseQuery()
  }

  private final class Parser(ts: Vector[Token],
      checkUnusedVars: Boolean = true) {
    private var pos = 0

    private def peek: Token =
      if (pos < ts.length) ts(pos) else Punct("<eof>")
    private def next(): Token = { val t = peek; pos += 1; t }
    private def expect(p: String): Unit = next() match {
      case Punct(`p`) => ()
      case other => fail(s"expected '$p', got $other")
    }
    private def fail(msg: String): Nothing =
      throw ParseException(s"$msg (at token $pos)")

    // directive position: a spaced '@'; an ATTACHED '@@' counts only
    // when a directive keyword follows (`friends@filter(...)` tolerated;
    // `friends@ta` stays a lang tag)
    private val directiveNames = Set("filter", "facets", "groupby",
      "cascade", "normalize", "recurse", "ignorereflex")
    private def atDirective: Boolean = peek match {
      case Punct("@") => true
      case Punct("@@") => ts.lift(pos + 1) match {
        case Some(Ident(i)) => directiveNames.contains(i.toLowerCase)
        case _ => false
      }
      case _ => false
    }

    // the `as` var binder is case-insensitive in the reference lexer
    // (TestQueryVarValOrderDescMissing uses `f As friend`)
    private def isAs(t: Token): Boolean = t match {
      case Ident(a) => a.equalsIgnoreCase("as")
      case _ => false
    }

    private def ident(): String = next() match {
      // 2^16 caps predicate-name length (reference x/keys.go key layout
      // reserves a uint16 for the attr; TestMaxPredicateSize)
      case Ident(s) if s.length > 65535 =>
        fail("Predicate name length cannot be bigger than 2^16")
      case Ident(s) => s
      case other => fail(s"expected identifier, got $other")
    }

    def parseQuery(): DqlQuery = {
      // bare `schema(pred: ...) {...}` / `schema(type: ...) {}` operation
      // (reference dql/parser.go:562 parseSchema — schema queries are
      // their own top-level form, no surrounding braces)
      if (peek == Ident("schema")) {
        val sb = parseSchemaBlock()
        if (pos < ts.length)
          fail(s"unexpected trailing input after schema block: ${ts(pos)}")
        return DqlQuery(Seq(sb))
      }
      expect("{")
      val blocks = Vector.newBuilder[QueryBlock]
      while (peek != Punct("}")) blocks += parseBlock()
      expect("}")
      // `fragment name { selections }` definitions follow the query
      // document (reference dql fragments, TestParseFragmentMultiQuery);
      // spreads expand before validation, so the executor never sees one
      // stray commas at top level are skipped ANYWHERE between items —
      // the reference's Parse loop ignores item types outside its
      // switch, so `},\nfragment f {...}` and trailing `}\n},` documents
      // (query0_test.go:3067 "Test lt filter on non-indexed int") both
      // succeed
      def skipTopCommas(): Unit =
        while (pos < ts.length && peek == Punct(",")) next()
      val frags = scala.collection.mutable.Map.empty[String, Seq[Selection]]
      skipTopCommas()
      while (peek == Ident("fragment")) {
        next()
        val fname = ident()
        frags(fname) = parseSelectionSet()
        skipTopCommas()
      }
      // a second `{...}` after the document is a parse error, not
      // silently-dropped input (reference TestFilterVarErr)
      if (pos < ts.length) fail(s"unexpected trailing input: ${ts(pos)}")
      def expandSel(s: Selection, stack: Set[String]): Seq[Selection] =
        if (s.pred.startsWith("\u0000frag:")) {
          val n = s.pred.drop(6)
          if (stack.contains(n)) fail("Cycle detected inside a fragment")
          frags.getOrElse(n, fail(s"Missing fragment: <$n>"))
            .flatMap(expandSel(_, stack + n))
        } else Seq(s.copy(children = s.children.flatMap(expandSel(_, stack))))
      val q = DqlQuery(blocks.result().map(b =>
        b.copy(selections = b.selections.flatMap(expandSel(_, Set.empty)))))
      Validate(q)
      q
    }

    /** `schema(pred: p | [p1, p2])` / `schema(type: T | [T1, T2])` with a
      * field selection set ({} = all fields). Encoded as a QueryBlock
      * whose func is FuncCall("schema", "pred"|"type", names) and whose
      * selections are the requested schema fields; the executor renders
      * it from registry metadata (reference worker/schema.go).
      */
    private def parseSchemaBlock(): QueryBlock = {
      expect2(Ident("schema"))
      // bare `schema { pred type }` = ALL predicates (reference
      // TestParseSchemaAll — the arg list is optional)
      var kind = "pred"
      var names = Vector.empty[String]
      if (peek == Punct("(")) {
        next()
        kind = ident()
        if (kind != "pred" && kind != "type") fail(s"bad schema arg $kind")
        expect(":")
        if (peek == Punct("[")) {
          next()
          var first = true
          while (peek != Punct("]")) {
            if (!first) expect(",")
            first = false
            names :+= ident()
          }
          expect("]")
        } else names :+= ident()
        expect(")")
      }
      val fields =
        if (peek == Punct("{")) parseSelectionSet() else Nil
      QueryBlock(if (kind == "pred") "schema" else "types",
        FuncCall("schema", kind, names), selections = fields)
    }

    private def expect2(t: Token): Unit = next() match {
      case `t` => ()
      case other => fail(s"expected $t, got $other")
    }

    /** Document-level variable checks the reference runs inside Parse
      * (dql/parser.go validation pass): every non-literal uid()/val()
      * reference must name a variable defined SOMEWHERE in the document
      * (reference TestParseQueryWithXIDError / WithVarError2), and every
      * defined variable must be used (WithVarError1) — the upsert form
      * skips the unused check, its vars feed the mutation part.
      */
    private object Validate {
      private val UidLit = "^(0[xX][0-9a-fA-F]+|[0-9]+)$".r
      def apply(q: DqlQuery): Unit = {
        val defs = scala.collection.mutable.Set.empty[String]
        val uses = scala.collection.mutable.Set.empty[String]
        def func(fc: FuncCall): Unit = {
          if (fc.name == "uid")
            fc.args.foreach(a => if (UidLit.findFirstIn(a).isEmpty) uses += a)
          fc.pred match {
            case p if p.startsWith("val:") => uses += p.drop(4)
            case p if p.startsWith("len:") => uses += p.drop(4)
            case _ => ()
          }
          fc.args.foreach { a =>
            if (a.startsWith("\u0000val:") || a.startsWith("\u0000uid:"))
              uses += a.drop(5)
          }
        }
        def filt(f: FilterNode): Unit = f match {
          case FilterLeaf(fc) => func(fc)
          case FilterAnd(ts) => ts.foreach(filt)
          case FilterOr(ts) => ts.foreach(filt)
          case FilterNot(t) => filt(t)
        }
        def math(m: MathNode): Unit = m match {
          case MathRef(n) => uses += n
          case MathBin(_, l, r) => math(l); math(r)
          case MathFunc(_, as) => as.foreach(math)
          case _ => ()
        }
        def ords(os: Seq[Ordering]): Unit =
          os.foreach(o => if (o.pred.startsWith("val:")) uses += o.pred.drop(4))
        def sel(s: Selection): Unit = {
          s.varName.foreach(defs += _)
          s.valRef.foreach(uses += _)
          s.facetVars.foreach { case (v, _) => defs += v }
          s.filter.foreach(filt)
          s.facetFilter.foreach(filt)
          s.mathExpr.foreach(math)
          ords(s.order)
          if (s.pred.startsWith("expand(val:"))
            uses += s.pred.stripPrefix("expand(val:").stripSuffix(")")
          s.children.foreach(sel)
        }
        q.blocks.foreach { b =>
          b.blockVar.foreach(defs += _)
          func(b.func)
          b.filter.foreach(filt)
          ords(b.order)
          b.shortest.foreach { sa =>
            sa.fromVar.foreach(uses += _); sa.toVar.foreach(uses += _)
          }
          b.selections.foreach(sel)
        }
        // duplicate NAMED block aliases are errors; var and shortest
        // blocks repeat freely (reference TestDuplicateQueryAliasesError
        // — its two-shortest form is the require.NoError case)
        val named = q.blocks.filter(b => b.name != "var" &&
          b.shortest.isEmpty).map(_.name)
        if (named.distinct.size != named.size)
          throw ParseException("Duplicate aliases not allowed")
        val undef = uses -- defs
        if (undef.nonEmpty)
          throw ParseException("Some variables are used but not defined, " +
            s"Vars: [${undef.toSeq.sorted.mkString(", ")}]")
        if (checkUnusedVars) {
          val unused = defs -- uses
          if (unused.nonEmpty)
            throw ParseException("Some variables are defined but not used, " +
              s"Vars: [${unused.toSeq.sorted.mkString(", ")}]")
        }
      }
    }

    private def parseBlock(): QueryBlock = {
      var name = ident()
      // `sp as shortest(...)` — block-level uid-var binding
      var blockVar: Option[String] = None
      if (isAs(peek)) { next(); blockVar = Some(name); name = ident() }
      expect("(")
      if (name == "shortest") {
        // shortest(from: U, to: V [, numpaths: k] [, depth: d]
        //          [, minweight: w] [, maxweight: w]) [@ignorereflex]
        var from = -1L; var to = -1L; var numpaths = 1; var depth = 50
        var minW = Double.NegativeInfinity; var maxW = Double.PositiveInfinity
        var fromVar: Option[String] = None; var toVar: Option[String] = None
        // `from: uid(a)` — endpoint from a uid variable (must resolve to
        // exactly one uid at execution; reference query3 uid-var tests)
        def uidOrVar(): Either[Long, String] =
          if (peek == Ident("uid")) {
            next(); expect("("); val n = ident(); expect(")"); Right(n)
          } else Left(uidLit())
        var first = true
        while (peek != Punct(")")) {
          if (!first) expect(",")
          first = false
          val key = ident(); expect(":")
          key match {
            case "from" => uidOrVar() match {
              case Left(u) => from = u
              case Right(n) => fromVar = Some(n)
            }
            case "to" => uidOrVar() match {
              case Left(u) => to = u
              case Right(n) => toVar = Some(n)
            }
            case "numpaths" => numpaths = intLit()
            case "depth" => depth = intLit()
            case "minweight" => minW = numLit()
            case "maxweight" => maxW = numLit()
            // accepted + ignored: the frontier-size cap is a memory knob
            // of the reference's single-node BFS (TestParseShortestPath);
            // the distributed walk has no equivalent bound
            case "maxfrontiersize" => intLit()
            case o => fail(s"unknown shortest arg: $o")
          }
        }
        expect(")")
        if ((from < 0 && fromVar.isEmpty) || (to < 0 && toVar.isEmpty))
          fail("shortest requires from: and to:")
        var ignoreReflex = false
        while (atDirective) {
          next()
          ident() match {
            case "ignorereflex" => ignoreReflex = true
            case o => fail(s"unsupported shortest directive @$o")
          }
        }
        val sels = parseSelectionSet()
        return QueryBlock(name, FuncCall("shortest", "", Nil),
          selections = sels,
          shortest = Some(ShortestArgs(from, to, numpaths, depth,
            minW, maxW, ignoreReflex, fromVar, toVar)),
          blockVar = blockVar)
      }
      var func: Option[FuncCall] = None
      var order = Vector.empty[Ordering]
      var page = Pagination()
      var firstArg = true
      // repeated scalar args are errors (reference TestParseRepeatArgsError1:
      // `func: ..., func: ...`); order keys may repeat with DIFFERENT
      // targets (multi-sort) — same-target repeats are caught below
      val seenArgs = scala.collection.mutable.Set.empty[String]
      while (peek != Punct(")")) {
        if (!firstArg) expect(",")
        firstArg = false
        val key = ident()
        expect(":")
        if (Set("func", "first", "offset", "after").contains(key) &&
            !seenArgs.add(key))
          fail(s"repeated argument $key in block ${name}")
        key match {
          case "func" =>
            val f = parseFunc()
            // root functions are a closed set (reference validFuncName,
            // dql/parser.go:1697 — TestVarInAggError: min(val(a)) at
            // root is a PARSE error, not an executor crash). The
            // eq(count(p), n) form arrives as "<name>_count".
            val base = f.name.stripSuffix("_count")
            val valid = Set("eq", "le", "lt", "ge", "gt", "between",
              "near", "within", "contains", "intersects",
              "regexp", "anyofterms", "allofterms", "alloftext",
              "anyoftext", "ngram", "has", "uid", "uid_in", "anyof",
              "allof", "type", "match", "similar_to")
            if (!valid.contains(base))
              fail(s"Function name: ${f.name} is not valid.")
            func = Some(f)
          case "orderasc" => order :+= Ordering(orderTarget(), desc = false)
          case "orderdesc" => order :+= Ordering(orderTarget(), desc = true)
          case "first" => page = page.copy(first = Some(intLit()))
          case "offset" => page = page.copy(offset = Some(intLit()))
          case "after" => page = page.copy(after = Some(uidLit()))
          case other => fail(s"unknown block arg: $other")
        }
      }
      expect(")")
      // sorting by the same attribute twice is an error (reference
      // TestMultipleOrderError2: orderasc + orderdesc on one key)
      if (order.map(_.pred).distinct.size != order.size)
        fail(s"Sorting by an attribute can only be done once (${name})")
      // val() keys are single-sort only (reference TestOrderByVarAndPred)
      if (order.size > 1 && order.exists(_.pred.startsWith("val:")))
        fail("Multiple sorting only allowed by predicates.")
      var filter: Option[FilterNode] = None
      var sawFilter = false
      var cascade = false; var normalize = false
      var cascadeFields = Vector.empty[String]
      var recurse: Option[RecurseArgs] = None
      var groupby = Vector.empty[GroupKey]
      var ignoreReflex = false
      // directive names are case-insensitive in the reference lexer
      // (query1 TestReflexive2 uses @IGNOREREFLEX)
      while (atDirective) {
        next()
        ident().toLowerCase match {
          case "filter" =>
            if (sawFilter) fail("repeated @filter directive")
            sawFilter = true
            filter = parseFilterDirective()
          case "groupby" =>
            if (groupby.nonEmpty) fail("repeated @groupby directive")
            groupby = parseGroupbyKeys()
          case "cascade" =>
            cascade = true
            // @cascade(f1, f2): parameterized — only the listed fields
            // are mandatory (reference graphql/dql parameterized cascade);
            // empty parens are an error (TestBadCascadeParameterized)
            if (peek == Punct("(")) {
              next()
              if (peek == Punct(")")) fail("@cascade requires field names")
              var first = true
              while (peek != Punct(")")) {
                if (!first) expect(",")
                first = false
                cascadeFields :+= ident()
              }
              next()
            }
          case "normalize" => normalize = true
          case "recurse" =>
            // bare @recurse = unlimited depth (the seen-set terminates
            // it); depth counts template applications INCLUDING the root
            // (reference TestRecurseQueryLimitDepth1: depth 2 = root +
            // one hop). loop: true without a depth never terminates —
            // the reference rejects it too (TestRecurseError).
            var depth = Int.MaxValue; var loop = false
            if (peek == Punct("(")) {
              next()
              var first = true
              while (peek != Punct(")")) {
                if (!first) expect(",")
                first = false
                val k = ident(); expect(":")
                k match {
                  case "depth" => depth = intLit()
                  case "loop" =>
                    // GraphQL vars substitute as StrLit; a non-boolean
                    // value is an error, not silently-false (reference
                    // TestRecurseWithArgsWithError "should be type of
                    // boolean")
                    val v = next() match {
                      case Ident(b) => b
                      case StrLit(b) => b
                      case other => fail(s"bad loop value $other")
                    }
                    if (v != "true" && v != "false")
                      fail(s"loop value should be type of boolean, got $v")
                    loop = v == "true"
                  case o => fail(s"unknown recurse arg $o")
                }
              }
              next() // ')'
            }
            if (loop && depth == Int.MaxValue)
              fail("@recurse with loop: true requires an explicit depth")
            recurse = Some(RecurseArgs(depth, loop))
          case "ignorereflex" =>
            // per-path ancestor exclusion on a plain block (reference
            // query1 TestReflexive1-3)
            ignoreReflex = true
          case other => fail(s"unknown directive @$other")
        }
      }
      // a bodiless block is legal: `a as var(func: uid(0x01))` binds the
      // uid set and selects nothing (reference query3 uid-var tests);
      // a bodiless NAMED block renders [] (TestReturnEmptyBlock's me2)
      val sels =
        if (peek != Punct("{")) Nil
        else parseSelectionSet()
      // `me()` with no func: an EMPTY block — only root-level aggregation
      // of value variables / math is legal inside (reference
      // TestAggregateRoot*; errors TestAggRootError/2: a plain predicate
      // or edge child must not parse)
      if (func.isEmpty && recurse.isEmpty &&
          sels.exists(s => s.aggOp.isEmpty && s.mathExpr.isEmpty))
        fail("Only aggregation/math functions allowed inside empty blocks")
      QueryBlock(name, func.getOrElse(FuncCall("empty", "", Nil)), filter,
        order, page, cascade, normalize, recurse, sels, blockVar = blockVar,
        cascadeFields = cascadeFields, groupby = groupby,
        ignoreReflex = ignoreReflex)
    }

    /** `@groupby(p1, Alias: p2, ...)` key list (shared by block-level and
      * selection-level forms; key aliases per reference TestGroupByRootAlias2).
      */
    private def parseGroupbyKeys(): Vector[GroupKey] = {
      expect("(")
      def one(): GroupKey = {
        def keyIdent(): String = {
          var k = ident()
          // lang-tagged key: @groupby(name@en) (reference TestParseGroupby)
          if (peek == Punct("@@")) { next(); k = s"$k@${ident()}" }
          k
        }
        val a = keyIdent()
        if (peek == Punct(":")) { next(); GroupKey(Some(a), keyIdent()) }
        else GroupKey(None, a)
      }
      var keys = Vector(one())
      while (peek == Punct(",")) { next(); keys :+= one() }
      expect(")")
      keys
    }

    private def parseSelectionSet(): Seq[Selection] = {
      expect("{")
      val out = Vector.newBuilder[Selection]
      while (peek != Punct("}")) {
        out += parseSelection()
        // selections may be comma-separated (reference TestParse:
        // `gender,age`) — the comma is optional whitespace there
        if (peek == Punct(",")) next()
      }
      expect("}")
      out.result()
    }

    private def parseSelection(): Selection = {
      // `...name` fragment spread — marked, expanded after the document
      // parses (fragment definitions trail the query)
      if (peek == Punct(".") && ts.lift(pos + 1).contains(Punct(".")) &&
          ts.lift(pos + 2).contains(Punct("."))) {
        next(); next(); next()
        return Selection(None, "\u0000frag:" + ident())
      }
      var reverse = false
      var alias: Option[String] = None
      if (peek == Punct("~")) { next(); reverse = true }
      var name = ident()
      // alias: pred  (but 'count(...)' and 'expand(...)' keep their form)
      if (!reverse && peek == Punct(":")) {
        next()
        alias = Some(name)
        if (peek == Punct("~")) { next(); reverse = true }
        name = ident()
      }
      // `x as pred` / `x as ~pred` value/uid variable binding
      // (reference v as p)
      var varName: Option[String] = None
      if (isAs(peek)) {
        next(); varName = Some(name)
        if (peek == Punct("~")) { next(); reverse = true }
        name = ident()
        // `f as bestFriend: friends` — var AND alias together
        // (reference TestParse_alias_var)
        if (peek == Punct(":")) {
          next()
          alias = Some(name)
          if (peek == Punct("~")) { next(); reverse = true }
          name = ident()
        }
      }
      // x as math(expr): arithmetic over value variables (dql/math.go);
      // the reference lexer is case-insensitive here (vector tests
      // write `Math(v1 dot $vec)`)
      if (name.equalsIgnoreCase("math") && peek == Punct("(")) {
        next()
        val m = parseMathCmp()
        expect(")")
        // reference TestMathWithoutVarAlias: a math() selection must be
        // var-bound or aliased — otherwise it has no output name
        if (alias.isEmpty && varName.isEmpty)
          fail("Function math should be used with a variable or have an alias")
        return Selection(alias, "math", varName = varName, mathExpr = Some(m))
      }
      // min/max/sum/avg(val(x)) over a variable, or min/max/sum/avg(pred)
      // over a predicate (the @groupby agg form, query/groupby.go:195)
      if (Set("min", "max", "sum", "avg").contains(name) && peek == Punct("(")) {
        next()
        if (peek == Ident("val")) {
          next(); expect("("); val v = ident(); expect(")"); expect(")")
          return Selection(alias, name, valRef = Some(v), aggOp = Some(name),
            varName = varName)
        } else {
          var p = ident()
          // agg over a lang-tagged predicate, chain allowed:
          // max(first-name@en:ta) (reference TestParseGroupbyWithMaxVar)
          if (peek == Punct("@@")) {
            next(); p = s"$p@${ident()}"
            while (peek == Punct(":")) { next(); p = s"$p:${ident()}" }
          }
          expect(")")
          return Selection(alias, p, aggOp = Some(name), varName = varName)
        }
      }
      // val(x) leaf reference
      if (name == "val" && peek == Punct("(")) {
        next(); val v = ident(); expect(")")
        return Selection(alias, "val", varName = varName, valRef = Some(v))
      }
      // checkpwd(pred, "candidate"): per-row bcrypt verification leaf
      // (reference dql/parser.go parseCheckPwd — the legacy one-arg form
      // checkpwd("pw") was removed and must not parse)
      if (name == "checkpwd" && peek == Punct("(")) {
        next()
        val p = ident()
        if (peek != Punct(","))
          fail("checkpwd requires an attribute and a value argument")
        expect(",")
        val pw = next() match {
          case StrLit(s) => s
          case other => fail(s"expected password literal, got $other")
        }
        expect(")")
        return Selection(alias, p, checkPwd = Some(pw))
      }
      if (name == "count" && peek == Punct("(")) {
        next()
        var rev = false
        if (peek == Punct("~")) { next(); rev = true }
        val p = ident()
        // count(p @filter(...)): count only matching targets (reference
        // TestQueryEmptyRoomsWithTermIndex). Pagination/order args may
        // appear before or after the filter — `count(friend(offset:1,
        // first:1) @filter(...))` counts the PAGE
        // (TestToFastJSONFilterOrFirstOffsetCount)
        var cfilter: Option[FilterNode] = None
        var cOrder = Vector.empty[Ordering]
        var cPage = Pagination()
        var more = true
        while (more) peek match {
          case Punct("@") =>
            next()
            ident() match {
              case "filter" =>
                cfilter = parseFilterDirective()
              case o => fail(s"unsupported directive @$o inside count()")
            }
          case Punct("(") =>
            next()
            var stop = false
            while (!stop) {
              ident() match {
                case "orderasc" =>
                  expect(":"); cOrder :+= Ordering(orderTarget(), desc = false)
                case "orderdesc" =>
                  expect(":"); cOrder :+= Ordering(orderTarget(), desc = true)
                case "first" => expect(":"); cPage = cPage.copy(first = Some(intLit()))
                case "offset" => expect(":"); cPage = cPage.copy(offset = Some(intLit()))
                case "after" => expect(":"); cPage = cPage.copy(after = Some(uidLit()))
                case o => fail(s"bad count() arg $o")
              }
              if (peek == Punct(",")) next() else stop = true
            }
            expect(")")
          case _ => more = false
        }
        expect(")")
        // the filter may equally FOLLOW the parens:
        // `pc as count(~hasTag) @filter(uid(pbw))` (LDBC IC04)
        var cFacetFilter: Option[FilterNode] = None
        while (atDirective) {
          next()
          ident() match {
            case "filter" =>
              cfilter = parseFilterDirective()
            case "facets" =>
              // count(p) @facets(eq(k, v)): facet-filtered count
              // (reference TestCountFacetsFilteringUidListPredicate)
              expect("("); cFacetFilter = Some(parseFilterOr()); expect(")")
            case o => fail(s"unsupported directive @$o on count()")
          }
        }
        // `a as count(uid)` inside @groupby binds the per-group count
        // (reference fillGroupedVars)
        return Selection(alias, p, reverse = rev, isCount = true,
          filter = cfilter, facetFilter = cFacetFilter, varName = varName,
          order = cOrder, page = cPage)
      }
      if (name == "expand" && peek == Punct("(")) {
        next()
        // _all_, comma-separated type names (reference
        // TestTypeExpandMultipleExplicitTypes: expand(CarModel, Object)),
        // or expand(val(x)) — predicate names from a value variable
        // (TestExpandVal)
        var arg = ident()
        if (arg == "val" && peek == Punct("(")) {
          next(); arg = "val:" + ident(); expect(")")
        } else
          while (peek == Punct(",")) { next(); arg += ", " + ident() }
        // the legacy `_forward_`/`_reverse_` expansions were removed
        // (reference TestParseQueryExpandForward/Reverse expect errors)
        if (arg.startsWith("_") && arg != "_all_")
          fail(s"invalid argument $arg in expand()")
        expect(")")
        // `expand(_all_) @filter(...)`: the filter applies to every
        // expanded edge's targets — but ONLY type() filters compose with
        // expand (reference errExpandType, dql/parser.go:35;
        // TestTypeFilterAtExpand ok, TestFilterError3 rejected)
        var xfilter: Option[FilterNode] = None
        while (atDirective) {
          next()
          ident() match {
            case "filter" =>
              xfilter = parseFilterDirective()
              def onlyType(f: FilterNode): Boolean = f match {
                case FilterLeaf(fc) => fc.name == "type"
                case FilterAnd(ts) => ts.forall(onlyType)
                case FilterOr(ts) => ts.forall(onlyType)
                case FilterNot(t) => onlyType(t)
              }
              if (!xfilter.forall(onlyType))
                fail("expand is only compatible with type filters")
            case o => fail(s"unsupported directive @$o on expand()")
          }
        }
        // `expand(_all_) { uid }`: the child template applies to every
        // expanded uid predicate (reference TestTypeExpandFacets)
        val kids =
          if (peek == Punct("{")) parseSelectionSet() else Nil
        return Selection(alias, s"expand($arg)", children = kids,
          filter = xfilter)
      }
      // pred@en:fr:. language chain (reference @lang access). The '@' is
      // consumed only when followed by a lang token ('.', '*', or an
      // ident that is not a directive keyword).
      var langChain = Vector.empty[String]
      def isDirective(t: Token): Boolean = t match {
        case Ident(i) => Set("filter", "facets", "groupby", "cascade",
          "normalize", "recurse").contains(i)
        case _ => false
      }
      if (peek == Punct("@@") && pos + 1 < ts.length && !isDirective(ts(pos + 1))
          && (ts(pos + 1).isInstanceOf[Ident] || ts(pos + 1) == Punct(".")
              || ts(pos + 1) == Punct("*"))) {
        next()
        def langTok(): String = next() match {
          case Ident(l) => l
          case Punct("*") => "*"
          case Punct(".") => "."
          case other => fail(s"expected language tag, got $other")
        }
        langChain :+= langTok()
        while (peek == Punct(":")) { next(); langChain :+= langTok() }
        // `@*` means ALL language variants and must stand alone —
        // `@*:en` / `@.:*` are errors (reference TestLangsInvalid8/10)
        if (langChain.contains("*") && langChain.size > 1)
          fail("If * is used, no other languages are allowed in the language list")
      }
      var order = Vector.empty[Ordering]
      var page = Pagination()
      val seenSelArgs = scala.collection.mutable.Set.empty[String]
      def parseSelArgs(): Unit = if (peek == Punct("(")) {
        next()
        // `pred()` with NO args is not a selection form — it is how an
        // unknown function slips through as a predicate (reference
        // TestParseQueryWithVarValAggErr: `c as sumvar()`)
        if (peek == Punct(")")) fail(s"empty argument list on $name")
        var first = true
        while (peek != Punct(")")) {
          if (!first) expect(",")
          first = false
          val k = ident(); expect(":")
          // reference TestParseRepeatArgsError2: `(first: 1, first: 4)`
          if (Set("first", "offset", "after").contains(k) && !seenSelArgs.add(k))
            fail(s"repeated argument $k on $name")
          k match {
            case "orderasc" => order :+= Ordering(orderTarget(), desc = false)
            case "orderdesc" => order :+= Ordering(orderTarget(), desc = true)
            case "first" => page = page.copy(first = Some(intLit()))
            case "offset" => page = page.copy(offset = Some(intLit()))
            case "after" => page = page.copy(after = Some(uidLit()))
            case o => fail(s"unknown selection arg $o")
          }
        }
        expect(")")
        if (order.map(_.pred).distinct.size != order.size)
          fail(s"Sorting by an attribute can only be done once ($name)")
        if (order.size > 1 && order.exists(_.pred.startsWith("val:")))
          fail("Multiple sorting only allowed by predicates.")
      }
      parseSelArgs()
      var filter: Option[FilterNode] = None
      var facetFetch = false
      var facetKeys = Vector.empty[String]
      var facetVars = Vector.empty[(String, String)]
      var facetFilter: Option[FilterNode] = None
      var facetAliases = Map.empty[String, String]
      var facetOrder = Vector.empty[Ordering]
      var groupby = Vector.empty[GroupKey]
      var normalizeSel = false
      var selCascade = false
      var selCascadeFields = Vector.empty[String]
      var sawFacetFetchForm = false
      var sawFacetFilterForm = false
      var sawSelFilter = false
      while (atDirective) {
        next()
        ident() match {
          case "filter" =>
            if (sawSelFilter) fail("repeated @filter directive")
            sawSelFilter = true
            filter = parseFilterDirective()
          case "groupby" =>
            if (groupby.nonEmpty) fail("repeated @groupby directive")
            groupby = parseGroupbyKeys()
          case "normalize" => normalizeSel = true
          case "cascade" =>
            // child-level @cascade: the subtree below this edge prunes
            // like a cascade block (reference TestFacetsNestedCascade);
            // optionally parameterized like the block form — only the
            // listed subtree fields are mandatory (reference systest
            // TestCascadeParams "Parameterized at lower level")
            selCascade = true
            if (peek == Punct("(")) {
              next()
              if (peek == Punct(")")) fail("@cascade requires field names")
              var first = true
              while (peek != Punct(")")) {
                if (!first) expect(",")
                first = false
                selCascadeFields :+= ident()
              }
              next()
            }
          case "facets" =>
            // @facets | @facets() | @facets(k1, k2) | @facets(orderasc/
            // desc: k, ...) | @facets(L as k) | @facets(<filter tree>) —
            // one comma-separated item list mixing order keys, named
            // fetches and var binds (reference TestFacetsMultipleOrderby-
            // AllFacets: `@facets(fastfriend, from, orderdesc:score,
            // orderasc:since)`); a function or NOT/paren head switches
            // the whole clause to a boolean facet-filter tree with the
            // standard OR < AND < NOT precedence (TestFacetsFilterAndOrle)
            val facetFilterBefore = facetFilter
            if (peek == Punct("(")) {
              next()
              // @facets() fetches NOTHING (reference TestFetchingNoFacets)
              if (peek != Punct(")")) {
                var stop = false
                while (!stop) {
                  val save = pos
                  peek match {
                    case Ident(h @ ("orderasc" | "orderdesc")) =>
                      next(); expect(":")
                      val k0 = ident()
                      if (isAs(peek)) {
                        // @facets(orderdesc: a as b): bind var a to facet
                        // b AND order by it (reference TestParseFacetsOrderVar)
                        next(); val k = ident()
                        facetVars :+= (k0 -> k)
                        facetKeys :+= k
                        facetOrder :+= Ordering(k, desc = h == "orderdesc")
                      } else
                        facetOrder :+= Ordering(k0, desc = h == "orderdesc")
                    case Ident(n) if n.equalsIgnoreCase("not") =>
                      facetFilter = Some(parseFilterOr())
                    case Punct("(") =>
                      facetFilter = Some(parseFilterOr())
                    case Ident(_) =>
                      next()
                      if (isAs(peek)) {
                        // @facets(L as weight): bind facet value var L
                        // keyed by the edge TARGET uid
                        // (reference TestFilterFacetval); the key also
                        // renders like a named fetch
                        next(); val k = ident()
                        facetVars :+= ((ts(save) match {
                          case Ident(v) => v
                          case o => fail(s"bad facet var $o")
                        }) -> k)
                        facetKeys :+= k
                      } else if (peek == Punct(":")) {
                        // @facets(o: origin): aliased fetch — renders
                        // under the bare alias, no `pred|` prefix
                        // (reference TestFacetsAlias)
                        next(); val k = ident()
                        facetKeys :+= k
                        facetAliases += (k -> (ts(save) match {
                          case Ident(al) => al
                          case o => fail(s"bad facet alias $o")
                        }))
                      } else if (peek == Punct("(")) {
                        // function leaf → boolean facet-filter tree
                        pos = save
                        facetFilter = Some(parseFilterOr())
                      } else {
                        // named facet fetch; in a shortest block the first
                        // key is the edge-weight facet (query/shortest.go:105)
                        ts(save) match {
                          case Ident(k) => facetKeys :+= k
                          case o => fail(s"bad facet key $o")
                        }
                      }
                    case other => fail(s"bad @facets item $other")
                  }
                  if (peek == Punct(",")) next() else stop = true
                }
              }
              expect(")")
            } else facetFetch = true
            // at most ONE fetch-form and ONE filter-form @facets per
            // edge (reference TestFacetsFilterFail: `@facets
            // @facets(close, since)`; FacetsFilterFail2: two filters)
            // reference equality: did THIS occurrence parse a filter
            // tree (a second one must not silently overwrite the first,
            // reference TestFacetsFilterFail2)
            val isFilterForm = !(facetFilter eq facetFilterBefore)
            if (isFilterForm) {
              if (sawFacetFilterForm) fail("Only one facets filter allowed")
              sawFacetFilterForm = true
              // uid()/val()/var() never belong in a facet filter
              // (reference TestFacetsFilterFail3)
              def noVars(f: FilterNode): Unit = f match {
                case FilterLeaf(fc) =>
                  if (Set("uid", "val", "var").contains(fc.name))
                    fail("variables are not allowed in facets filter")
                case FilterAnd(ts) => ts.foreach(noVars)
                case FilterOr(ts) => ts.foreach(noVars)
                case FilterNot(t) => noVars(t)
              }
              facetFilter.foreach(noVars)
            } else {
              if (sawFacetFetchForm) fail("Only one facets allowed")
              sawFacetFetchForm = true
              // two vars bound to one facet key (reference
              // TestParseFacetsDuplicateVarError)
              if (facetVars.map(_._2).distinct.size != facetVars.size)
                fail("Duplicate variable mappings for facet")
            }
          case o => fail(s"unsupported selection directive @$o")
        }
      }
      // args may also FOLLOW the directives (reference grammar order is
      // free: LDBC IC07 `likes @facets(...) @filter(...) (first:1)`)
      parseSelArgs()
      val children =
        if (peek == Punct("{")) parseSelectionSet() else Nil
      // inside a @groupby block only aggregations are legal (reference
      // TestParseGroupbyError: a plain `name` child must not parse)
      if (groupby.nonEmpty && children.exists(c =>
          !c.isCount && c.aggOp.isEmpty && c.mathExpr.isEmpty))
        fail("Only aggregation functions allowed inside @groupby block")
      Selection(alias, name, reverse, isCount = false, filter, order, page,
        children, varName = varName, facetFetch = facetFetch,
        facetKeys = facetKeys, facetFilter = facetFilter,
        facetOrder = facetOrder, groupby = groupby, langChain = langChain,
        normalize = normalizeSel, facetVars = facetVars,
        facetAliases = facetAliases, selCascade = selCascade,
        selCascadeFields = selCascadeFields)
    }

    // filter precedence: OR < AND < NOT (dql/parser.go:183-187);
    // combinators are case-insensitive like the reference lexer
    // (TestParseFilter_op2 uses `Or` / `and`)
    private def isKw(t: Token, kw: String): Boolean = t match {
      case Ident(i) => i.equalsIgnoreCase(kw)
      case _ => false
    }

    private def parseFilterOr(): FilterNode = {
      var terms = Vector(parseFilterAnd())
      while (isKw(peek, "or")) { next(); terms :+= parseFilterAnd() }
      if (terms.size == 1) terms.head else FilterOr(terms)
    }

    private def parseFilterAnd(): FilterNode = {
      var terms = Vector(parseFilterUnary())
      while (isKw(peek, "and")) { next(); terms :+= parseFilterUnary() }
      if (terms.size == 1) terms.head else FilterAnd(terms)
    }

    private def parseFilterUnary(): FilterNode = peek match {
      case t if isKw(t, "not") => next(); FilterNot(parseFilterUnary())
      case Punct("(") => next(); val f = parseFilterOr(); expect(")"); f
      case _ => FilterLeaf(parseFunc())
    }

    /** `@filter(<tree>)` body — an EMPTY `@filter()` is a legal no-op
      * (reference TestParseFilter_simplest).
      */
    private def parseFilterDirective(): Option[FilterNode] = {
      expect("(")
      val f = if (peek == Punct(")")) None else Some(parseFilterOr())
      expect(")")
      f
    }

    /** f(pred, args...) — also uid(...), type(T), count-arg forms.
      * Function names are case-insensitive like the reference lexer
      * (query1 TestUidInFunction1 uses `func: UID(...)`).
      */
    private def parseFunc(): FuncCall = {
      val fname = ident().toLowerCase
      // var() never names a function (uid() is the uid-set form,
      // reference TestFilterVarErr); val() is an argument form only —
      // `func: val(L)` has no function to seed with
      // (TestParseQueryWithVarValAggError2)
      if (fname == "var") fail("var() is not a valid function — use uid()")
      if (fname == "val") fail("val() is not a valid function here")
      // "<fn>_count" is the INTERNAL marker for the eq(count(p), n) form —
      // a user-typed ge_count(...) must not alias it past the root
      // function validation (the reference rejects unknown names)
      if (fname.endsWith("_count"))
        fail(s"Function name: $fname is not valid.")
      expect("(")
      if (fname == "uid") {
        var uids = Vector.empty[String]
        var first = true
        while (peek != Punct(")")) {
          if (!first) expect(",")
          first = false
          uids :+= litString()
        }
        expect(")")
        // a $var-substituted uid list arrives as one "[1, 31]" literal
        // (reference TestGraphQLId)
        return FuncCall("uid", "", uids.flatMap(
          _.split("[\\[\\],\\s]+").filter(_.nonEmpty)))
      }
      // eq(count(p), n) and eq(val(x), v) forms
      var pred = ""
      var countArg = false
      peek match {
        case Ident("count") if fname != "count" =>
          next(); expect("(")
          // ge(count(~friend), 2): reverse-edge count at root/filter
          if (peek == Punct("~")) { next(); pred = "~" }
          pred += ident(); expect(")"); countArg = true
        case Ident("val") if fname != "val" =>
          next(); expect("("); pred = "val:" + ident(); expect(")")
        case Ident("len") if fname != "len" =>
          // eq(len(f), 3): cardinality of a variable's uid set
          // (reference TestFilterUsingLenFunction)
          next(); expect("("); pred = "len:" + ident(); expect(")")
        case _ =>
          // uid_in(~containerOf, ...): reverse-edge membership (LDBC IC05)
          if (peek == Punct("~")) { next(); pred = "~" }
          // type("Person") is legal — type's argument is a VALUE in the
          // reference parser (TestCascadeWithPaginationDeep), while a
          // quoted ATTRIBUTE is rejected with the reference's message
          // (TestParseQuotedFunctionAttributeError)
          pred += (peek match {
            case StrLit(s) if fname == "type" => next(); s
            case StrLit(_) =>
              fail("Attribute in function must not be quoted")
            case _ => ident()
          })
          // lang-qualified predicate: eq(name@hi, ...) targets the @hi
          // tablet rows; has(p@.) matches any variant (reference langs
          // on function args, dql/parser.go)
          if (peek == Punct("@@")) {
            next()
            val tag = next() match {
              case Ident(l) => l
              case Punct(".") => "."
              case Punct("*") => "*"
              case other => fail(s"expected language tag, got $other")
            }
            // reference TestLangsInvalid9: @* is a rendering form, not a
            // function-argument form
            if (tag == "*")
              fail("The * symbol cannot be used as a valid language inside functions")
            pred = s"$pred@$tag"
          }
      }
      var args = Vector.empty[String]
      while (peek == Punct(",")) {
        next()
        // value-variable argument: eq(name, val(a)) compares against the
        // variable's value set (reference TestVarInIneq3). Marked with a
        // NUL ("\\u0000") prefix so it can't collide with a string literal.
        peek match {
          case Ident("val") =>
            next(); expect("("); args :+= "\u0000val:" + ident(); expect(")")
          case Ident("uid") =>
            // uid_in(p, uid(v)): membership against a uid variable's set
            // (LDBC IC11 uid_in(workAt, uid(organisation)))
            next(); expect("("); args :+= "\u0000uid:" + ident(); expect(")")
          case Punct("[") =>
            // bracketed value list. FLAT lists explode into one arg per
            // element: eq(name, ["a", "b"]) / uid_in(school, [5000, 5001])
            // (reference TestMultipleEquality, TestUidInFunction3).
            // NESTED lists are geo coordinate literals —
            // within(loc, [[[0,0], ...]]) — kept as ONE raw JSON-array
            // arg for the geo shape decoder (dql geo ValType).
            next()
            val flat = Vector.newBuilder[String]
            val raw = new StringBuilder("[")
            var depth = 1
            var nested = false
            var firstL = true
            while (depth > 0) {
              peek match {
                case Punct("[") =>
                  next(); raw.append('['); depth += 1; nested = true
                case Punct("]") =>
                  next(); depth -= 1; if (depth > 0) raw.append(']')
                case Punct(",") =>
                  next(); raw.append(',')
                case _ =>
                  if (!nested && !firstL && raw.last != ',')
                    fail("expected , in list literal")
                  firstL = false
                  val v = litString()
                  flat += v
                  raw.append(v)
              }
            }
            raw.append(']')
            if (nested) args :+= raw.result()
            else args ++= flat.result()
          case Ident(k) if pos + 1 < ts.length && ts(pos + 1) == Punct(":") =>
            // named option: similar_to(p, k, "[..]", ef: 2,
            // distance_threshold: 1.5) (reference worker/task.go:2772
            // similar_to opts). NUL-prefixed like val()/uid() markers.
            // ONLY similar_to takes named opts — elsewhere `ident:` in
            // an arg list is a syntax error, as in the reference parser
            if (fname != "similar_to")
              fail(s"unexpected named argument $k in $fname()")
            next(); next()
            args :+= s"\u0000opt:$k=${litString()}"
          case _ => args :+= litString()
        }
      }
      expect(")")
      // uid_in(p) with no membership argument (reference
      // TestUidInWithParseErrors: "expects an argument, got none")
      if (fname == "uid_in" && args.isEmpty)
        fail("uid_in function expects an argument, got none")
      if (fname == "similar_to") {
        // option validation at PARSE time like the reference
        // (TestParseSimilarTo* error cases): known keys, no duplicates,
        // no legacy "ef=64,..." positional string
        val opts = args.collect {
          case a if a.startsWith("\u0000opt:") => a.drop(5).takeWhile(_ != '=')
        }
        opts.groupBy(identity).find(_._2.size > 1).foreach(d =>
          fail(s"duplicate similar_to option ${d._1}"))
        opts.find(k => k != "ef" && k != "distance_threshold").foreach(k =>
          fail(s"unknown similar_to option $k"))
        if (args.count(!_.startsWith("\u0000opt:")) > 2)
          fail("similar_to takes (pred, k, vector) plus named options only")
      }
      FuncCall(if (countArg) s"${fname}_count" else fname, pred, args)
    }

    // math precedence (dql/math.go mathOpPrecedence):
    // comparisons < (+,-) < (*,/,%) < unary
    private def parseMathCmp(): MathNode = {
      var l = parseMathAdd()
      val cmps = Set("<", ">", "<=", ">=", "==", "!=")
      while (peek match { case Punct(p) => cmps(p); case _ => false }) {
        val op = next().asInstanceOf[Punct].c
        l = MathBin(op, l, parseMathAdd())
      }
      l
    }

    private def parseMathAdd(): MathNode = {
      var l = parseMathMul()
      var going = true
      while (going) peek match {
        case Punct("+") | Punct("-") =>
          val op = next().asInstanceOf[Punct].c
          l = MathBin(op, l, parseMathMul())
        case NumLit(s) if s.startsWith("-") =>
          // the lexer folds "- 3" after an ident into NumLit(-3); in math
          // position that is a subtraction
          next(); l = MathBin("-", l, MathNum.fromLexeme(s.drop(1), intLexeme(s)))
        case _ => going = false
      }
      l
    }

    /** A numeric lexeme without '.'/'e' is an INT literal — the typed
      * math evaluator then applies integer semantics when both operands
      * are integral (reference query/math.go).
      */
    private def intLexeme(s: String): Boolean =
      !s.contains('.') && !s.toLowerCase.contains('e')

    private def parseMathMul(): MathNode = {
      var l = parseMathAtom()
      var going = true
      while (going) peek match {
        case Punct("*") | Punct("/") | Punct("%") =>
          val op = next().asInstanceOf[Punct].c
          l = MathBin(op, l, parseMathAtom())
        case Ident("dot") =>
          // v1 dot v2: float32vector dot product (reference
          // query/vector/vector_test.go, math.go vector ops)
          next(); l = MathBin("dot", l, parseMathAtom())
        case _ => going = false
      }
      l
    }

    private def parseMathAtom(): MathNode = next() match {
      case Punct("(") => val m = parseMathCmp(); expect(")"); m
      case Punct("-") => // unary minus (int-typed zero: -x keeps x's type)
        MathBin("-", MathNum(0.0, isInt = true), parseMathAtom())
      case NumLit(v) => MathNum.fromLexeme(v, intLexeme(v))
      case Ident("val") if peek == Punct("(") =>
        next(); val v = ident(); expect(")"); MathRef(v)
      case Ident(fn) if peek == Punct("(") =>
        next()
        var args = Vector(parseMathCmp())
        while (peek == Punct(",")) { next(); args :+= parseMathCmp() }
        expect(")")
        MathFunc(fn, args)
      case Ident(v) => MathRef(v)
      case StrLit(s) if s.trim.startsWith("[") =>
        // "[1.0, 2.0]" — a $var-substituted float32vector literal
        MathVec(s.trim.stripPrefix("[").stripSuffix("]")
          .split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq)
      case other => fail(s"unexpected math token $other")
    }

    /** order target: plain predicate or val(x) -> "val:x". */
    private def orderTarget(): String = {
      val p = ident()
      if (p == "val" && peek == Punct("(")) {
        next(); val v = ident(); expect(")"); "val:" + v
      } else if (peek == Punct("@@")) {
        // orderasc: name_lang@de — order by one lang variant
        // (reference TestLanguageOrderIndexed*)
        next(); p + "@" + ident()
      } else p
    }

    private def litString(): String = next() match {
      case StrLit(s) => s
      case NumLit(s) => s
      case Ident(s) => s
      case other => fail(s"expected literal, got $other")
    }

    private def intLit(): Int = peek match {
      case Punct("+") => next(); intLit() // offset: +1 (TestParseRootArgs1)
      case _ => next() match {
        case NumLit(s) => s.toInt
        case StrLit(s) if s.matches("-?[0-9]+") =>
          // an untyped GraphQL var substitutes as a string literal
          // (reference TestRecurseWithArgs: depth: $hello)
          s.toInt
        case StrLit(s) =>
          fail(s"value should be type of integer, got $s")
        case other => fail(s"expected int, got $other")
      }
    }

    /** Numeric literal as double, negative allowed (minweight: -1000). */
    private def numLit(): Double = peek match {
      case Punct("-") => next(); -numLit()
      case _ => next() match {
        case NumLit(s) => s.toDouble
        case other => fail(s"expected number, got $other")
      }
    }

    private def uidLit(): Long = next() match {
      case NumLit(s) =>
        // uids are unsigned (reference strconv.ParseUint —
        // TestMatchFuncWithAfterWithInvalidUid: after: -1 errors)
        if (s.startsWith("-"))
          fail(s"""strconv.ParseUint: parsing "$s": invalid syntax""")
        else if (s.startsWith("0x")) java.lang.Long.parseLong(s.drop(2), 16)
        else s.toLong
      case other => fail(s"expected uid, got $other")
    }
  }
}
