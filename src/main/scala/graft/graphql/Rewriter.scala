package graft.graphql

import graft.dql._

/** GraphQL operation → DQL IR, mirroring the reference's query rewriter
  * (/root/reference/graphql/resolve/query_rewriter.go:105 Rewrite →
  * rewriteAsQuery :988 / rewriteAsGet :517 / aggregateQuery :240).
  *
  * Shapes produced (cf. graphql/resolve/query_test.yaml):
  *  - `queryT(filter, order, first, offset)` → `q(func: type(T)) @filter(...)`;
  *    a single top-level eq/in field filter is promoted to the root function
  *    with `type(T)` demoted to a filter (the reference's root-swap at
  *    query_rewriter.go:1013) — at scale this seeds from the selective
  *    index scan instead of the full type table.
  *  - `getT(id: "0x1")` → `q(func: uid(0x1)) @filter(type(T))`.
  *  - `aggregateT(filter) { count fMin fMax fSum fAvg }` → a var block
  *    binding one value var per referenced field + an aggregation block
  *    (the reference emits exactly this two-block form).
  *  - field args `filter/order/first/offset` on edge fields → child
  *    Selection filter/order/page; `@cascade` → block cascade.
  */
object Rewriter {
  final case class RewriteException(msg: String) extends RuntimeException(msg)

  def rewrite(op: GqlOperation, schema: GqlSchema,
      jwt: Map[String, String] = Map.empty): DqlQuery =
    new Rewriter(schema, jwt).rewrite(op)

  /** A uid outside every allocation range: `uid(NoUid) @filter(type(T))`
    * is the deterministic EMPTY block an auth-denied root rewrites to
    * (the reference emits a bare `queryT()` — same rendered result, an
    * empty array).
    */
  private[graphql] val NoUid = "0x7ffffffffffffffe"
}

final class Rewriter(schema: GqlSchema, jwt: Map[String, String] = Map.empty) {
  import Rewriter.RewriteException

  /** The type's @auth query rule evaluated against this request's
    * claims: Left(verdict) for pure RBAC, Right(residue) to AND in.
    * No rule = open (Left(true)).
    */
  private def authOf(t: SdlType): Auth.Result =
    t.auth.get("query") match {
      case None => Left(true)
      case Some(node) => Auth.eval(node, jwt)
    }

  // Var blocks emitted for cascaded-path auth rules ([[Auth.RPath]]);
  // prepended to the rewritten query so their bindings resolve first.
  private val authBlocks = scala.collection.mutable.Buffer.empty[QueryBlock]
  private var authSeq = -1
  private def freshAuthVar(): String = { authSeq += 1; s"g_auth$authSeq" }

  /** Auth residue → injectable DQL filter. A cascaded-path rule
    * (constraint in the rule's NESTED selections — the reference's
    * canonical `queryProject { roles(filter:...) { assignedTo(filter:
    * {username:{eq:$USER}}) } }` pattern) becomes
    *
    *   g_authN as var(func: type(T)) @cascade { <rule tree + filters> }
    *
    * plus a `uid(g_authN)` conjunct — exactly the reference's @cascade'd
    * var-chain rewrite (graphql/resolve/query_rewriter.go addAuthQueries):
    * only nodes where the WHOLE path exists are admitted.
    */
  private def residueFilter(r: Auth.Residue, t: SdlType): FilterNode = r match {
    case Auth.RFilter(o) => filterNode(o, t)
    case Auth.RAnd(rs) => FilterAnd(rs.map(residueFilter(_, t)))
    case Auth.ROr(rs) => FilterOr(rs.map(residueFilter(_, t)))
    case Auth.RNot(x) => FilterNot(residueFilter(x, t))
    case Auth.RPath(ruleRoot) =>
      val v = freshAuthVar()
      authBlocks += QueryBlock(
        name = "var",
        func = typeFunc(t),
        filter = ruleRoot.arg("filter").collect { case o: GObj => filterNode(o, t) },
        cascade = true,
        blockVar = Some(v),
        selections = authPathSelections(ruleRoot.children, t))
      FilterLeaf(FuncCall("uid", "", Seq(v)))
  }

  /** The rule's selection tree as DQL selections: edge fields keep their
    * filters (resolved against the EDGE's type) and recurse; scalar
    * fields become presence requirements under the block's @cascade.
    * __typename riders constrain nothing and drop.
    */
  private def authPathSelections(sels: Seq[GqlSelection],
      t: SdlType): Seq[Selection] =
    sels.filterNot(_.name == "__typename").map { c =>
      val f = t.field(c.name).getOrElse(throw new RewriteException(
        s"@auth rule: ${t.name} has no field '${c.name}'"))
      schema.types.get(f.typeName) match {
        case Some(ct) =>
          Selection(alias = None, pred = c.name,
            filter = c.arg("filter").collect { case o: GObj => filterNode(o, ct) },
            children = authPathSelections(c.children, ct))
        case None => Selection(alias = None, pred = c.name)
      }
    }

  /** Auth residue → (filter, var blocks) for callers assembling their
    * own DqlQuery (the mutation rewriter's uid resolution).
    */
  def authResidue(r: Auth.Residue, t: SdlType): (FilterNode, Seq[QueryBlock]) = {
    val mark = authBlocks.length
    val f = residueFilter(r, t)
    (f, authBlocks.drop(mark).toSeq)
  }

  /** Compose the auth residue into a block's (func, filter). A FALSE
    * verdict swaps the root seed for the never-allocated uid — the
    * block renders as the empty array, like the reference's emptied
    * `queryT()` (auth_query_test.yaml "Deep RBAC rule - Level 0
    * false").
    */
  private def applyAuth(t: SdlType, func: FuncCall,
      filt: Option[FilterNode]): (FuncCall, Option[FilterNode]) =
    if (t.isInterface) applyInterfaceAuth(t, func, filt)
    else authOf(t) match {
      case Left(true) => (func, filt)
      case Left(false) =>
        (FuncCall("uid", "", Seq(Rewriter.NoUid)), typeFilter(t))
      case Right(r) =>
        val af = residueFilter(r, t)
        (func, Some(filt.map(x => FilterAnd(Seq(x, af))).getOrElse(af)))
    }

  /** Auth constraint for reading nodes of type `ct` through an edge or
    * similarity root: Left(true) = open, Left(false) = deny everything,
    * Right(f) = AND this filter in. Interfaces verify per-IMPLEMENTER
    * (their own auth is cleared at schema load): denied implementers
    * drop to a type-branch disjunction like the root case.
    */
  private def authConstraint(ct: SdlType): Either[Boolean, FilterNode] =
    if (!ct.isInterface) authOf(ct) match {
      case Left(b) => Left(b)
      case Right(r) => Right(residueFilter(r, ct))
    } else {
      val evals = schema.implementers(ct.name).map(n =>
        n -> authOf(schema.typ(n)))
      if (evals.forall(_._2 == Left(true))) Left(true)
      else {
        val open = evals.collect { case (n, Left(true)) => n }
        val ruled = evals.collect { case (n, Right(r)) =>
          (n, residueFilter(r, schema.typ(n))) }
        if (open.isEmpty && ruled.isEmpty) Left(false)
        else {
          val branches: Seq[FilterNode] =
            open.map(n => FilterLeaf(FuncCall("type", n, Nil)): FilterNode) ++
              ruled.map { case (n, f) =>
                FilterAnd(Seq(FilterLeaf(FuncCall("type", n, Nil)), f)): FilterNode }
          Right(if (branches.size == 1) branches.head else FilterOr(branches))
        }
      }
    }

  /** An interface operation verifies auth against the CONCRETE types
    * (the reference splits it into per-type operations,
    * graphql/schema/auth.go — the interface's own auth is cleared at
    * schema load): denied implementers drop out of the type seed, and
    * graph-ruled implementers contribute a `(type(T) AND rule)` branch
    * to a disjunctive filter.
    */
  private def applyInterfaceAuth(t: SdlType, func: FuncCall,
      filt: Option[FilterNode]): (FuncCall, Option[FilterNode]) = {
    val evals = schema.implementers(t.name).map(n =>
      n -> authOf(schema.typ(n)))
    if (evals.forall(_._2 == Left(true))) return (func, filt)
    val open = evals.collect { case (n, Left(true)) => n }
    val ruled = evals.collect { case (n, Right(r)) =>
      (n, residueFilter(r, schema.typ(n))) }
    if (open.isEmpty && ruled.isEmpty)
      return (FuncCall("uid", "", Seq(Rewriter.NoUid)), typeFilter(t))
    // seed only the permitted implementers. The root-promoted form
    // (func=eq) keeps its func; the type restriction rides the filter.
    val names = open ++ ruled.map(_._1)
    val func2 =
      if (func.name == "type") FuncCall("type", names.head, names.tail)
      else func
    val branches: Seq[FilterNode] =
      open.map(n => FilterLeaf(FuncCall("type", n, Nil)): FilterNode) ++
        ruled.map { case (n, f) =>
          FilterAnd(Seq(FilterLeaf(FuncCall("type", n, Nil)), f)): FilterNode }
    val authFilt: FilterNode =
      if (branches.size == 1) branches.head else FilterOr(branches)
    // drop the plain type(interface) conjunct — the auth branches are
    // strictly narrower; keep any user filter
    val keep = filt match {
      case Some(FilterLeaf(FuncCall("type", tn, _))) if tn == t.name => None
      case other => other
    }
    (func2, Some(keep.map(x => FilterAnd(Seq(x, authFilt))).getOrElse(authFilt)))
  }

  def rewrite(op: GqlOperation): DqlQuery = {
    val blocks = op.roots.flatMap(rewriteRoot)
    // cascaded-path auth var blocks FIRST: blocks execute in written
    // order and the main blocks filter on uid(g_authN)
    DqlQuery(authBlocks.toSeq ++ blocks)
  }

  /** Filter object → DQL filter tree, for the mutation rewriter's
    * update/delete uid resolution (reference mutation_rewriter.go reuses
    * the query rewriter's filter path the same way).
    */
  def filterFor(o: GObj, t: SdlType): FilterNode = filterNode(o, t)

  private val QueryRe = "query([A-Z]\\w*)".r
  private val PasswordRe = "check([A-Z]\\w*)Password".r
  private val GetRe = "get([A-Z]\\w*)".r
  private val AggRe = "aggregate([A-Z]\\w*)".r
  private val SimilarRe = "querySimilar([A-Z]\\w*)ByEmbedding".r
  private val SimilarIdRe = "querySimilar([A-Z]\\w*)ById".r

  private def rewriteRoot(root: GqlSelection): Seq[QueryBlock] =
    root.name match {
      case SimilarRe(t) => similarBlocks(root, schema.typ(t))
      case SimilarIdRe(t) => similarByIdBlocks(root, schema.typ(t))
      case PasswordRe(t) => passwordBlocks(root, schema.typ(t))
      case QueryRe(t) => Seq(queryBlock(root, schema.typ(t)))
      case GetRe(t) => Seq(getBlock(root, schema.typ(t)))
      case AggRe(t) => aggBlocks(root, schema.typ(t))
      case other => throw RewriteException(
        s"unknown root field '$other' (expected query<T>/get<T>/aggregate<T>)")
    }

  // ---- querySimilar<T>ByEmbedding(by, topK, vector) ----

  /** The reference's two-block rewrite (graphql/resolve/
    * query_rewriter.go:800 rewriteAsSimilarByEmbeddingQuery):
    *   var(func: similar_to(pred, topK, "[..]")) {
    *     v2 as pred
    *     distance as math(<metric formula over v2 and the query vector>) }
    *   result(func: uid(distance), orderasc: val(distance)) { fields }
    * `vector_distance` in the selection set reads val(distance).
    */
  private def similarBlocks(root: GqlSelection, t: SdlType): Seq[QueryBlock] = {
    val by = root.arg("by").map(enumName).getOrElse(
      throw RewriteException("querySimilarByEmbedding requires `by`"))
    val f = t.field(by).getOrElse(
      throw RewriteException(s"${t.name} has no field '$by'"))
    val topK = root.arg("topK").map(scalar).getOrElse(
      throw RewriteException("querySimilarByEmbedding requires `topK`"))
    val qv = root.arg("vector") match {
      case Some(GList(vs)) => vs.map(v => scalar(v).toDouble)
      case Some(GStr(s)) => s.stripPrefix("[").stripSuffix("]")
        .split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq
      case _ => throw RewriteException(
        "querySimilarByEmbedding requires `vector`")
    }
    val q = MathVec(qv)
    val v2 = MathRef("g_simvec")
    def dot(l: MathNode, r: MathNode) = MathBin("dot", l, r)
    val distance = f.embeddingMetric match {
      case "dotproduct" => MathBin("-", MathNum(1.0), dot(q, v2))
      case "cosine" => MathBin("-", MathNum(1.0),
        MathBin("/", dot(q, v2),
          MathFunc("sqrt", Seq(MathBin("*", dot(q, q), dot(v2, v2))))))
      case _ => MathFunc("sqrt",
        Seq(dot(MathBin("-", v2, q), MathBin("-", v2, q))))
    }
    val varBlock = QueryBlock(
      name = "var",
      func = FuncCall("similar_to", by,
        Seq(topK, qv.mkString("[", ",", "]"))),
      selections = Seq(
        Selection(alias = None, pred = by, varName = Some("g_simvec")),
        Selection(alias = None, pred = "math", varName = Some("g_simdist"),
          mathExpr = Some(distance))))
    val (rFunc, rFilt) = applyAuth(t,
      FuncCall("uid", "", Seq("g_simdist")), None)
    val result = QueryBlock(
      name = root.outName,
      func = rFunc,
      filter = rFilt,
      order = Seq(Ordering("val:g_simdist", desc = false)),
      selections = {
        val (vd, rest) = root.children.partition(_.name == "vector_distance")
        vd.map(c => Selection(alias = Some(c.outName), pred = "val",
          valRef = Some("g_simdist"))) ++ expandSelections(rest, t)
      })
    Seq(varBlock, result)
  }

  /** querySimilar<T>ById(by, topK, <id-or-xid>): the reference's
    * four-block rewrite (graphql/resolve/query_rewriter.go:621
    * rewriteAsSimilarByIdQuery) — anchor lookup binds its embedding,
    * an empty block reduces it to a scalar vector var, similar_to
    * seeds from val() of it, and the result excludes the anchor and
    * orders by distance.
    */
  private def similarByIdBlocks(root: GqlSelection, t: SdlType): Seq[QueryBlock] = {
    val by = root.arg("by").map(enumName).getOrElse(
      throw RewriteException("querySimilarById requires `by`"))
    val f = t.field(by).getOrElse(
      throw RewriteException(s"${t.name} has no field '$by'"))
    val topK = root.arg("topK").map(scalar).getOrElse(
      throw RewriteException("querySimilarById requires `topK`"))
    // the anchor arg is any remaining field arg: `id:` seeds uid(),
    // an @id (xid) field seeds eq(field, value) — both exclude the
    // anchor from the result (reference filters Product.id != $id)
    val anchor = root.args.collectFirst {
      case (n, v) if n != "by" && n != "topK" && (n == "id" ||
          t.field(n).exists(_.isId)) => (n, scalar(v))
    }.getOrElse(throw RewriteException(
      "querySimilarById requires an id argument"))
    val (anchorFunc, anchorNot) = anchor match {
      case ("id", v) =>
        (FuncCall("uid", "", Seq(v)),
          FilterNot(FilterLeaf(FuncCall("uid", "", Seq(v)))))
      case (n, v) =>
        (FuncCall("eq", n, Seq(v)),
          FilterNot(FilterLeaf(FuncCall("eq", n, Seq(v)))))
    }
    // the anchor lookup itself must satisfy the type's auth — an
    // unreadable anchor behaves like a missing one (empty result)
    val (aFunc, aFilt) = applyAuth(t, anchorFunc, typeFilter(t))
    val anchorBlock = QueryBlock(
      name = "var", func = aFunc, filter = aFilt,
      selections = Seq(
        Selection(alias = None, pred = by, varName = Some("g_anchorvec"))))
    val reduceBlock = QueryBlock(
      name = "var", func = FuncCall("empty", "", Nil),
      selections = Seq(Selection(alias = None, pred = "val",
        valRef = Some("g_anchorvec"), aggOp = Some("max"),
        varName = Some("g_anchor1"))))
    val q = MathRef("g_anchor1")
    val v2 = MathRef("g_simvec")
    def dot(l: MathNode, r: MathNode) = MathBin("dot", l, r)
    val distance = f.embeddingMetric match {
      case "dotproduct" => MathBin("-", MathNum(1.0), dot(q, v2))
      case "cosine" => MathBin("-", MathNum(1.0),
        MathBin("/", dot(q, v2),
          MathFunc("sqrt", Seq(MathBin("*", dot(q, q), dot(v2, v2))))))
      case _ => MathFunc("sqrt",
        Seq(dot(MathBin("-", v2, q), MathBin("-", v2, q))))
    }
    val simBlock = QueryBlock(
      name = "var",
      func = FuncCall("similar_to", by, Seq(topK, "\u0000val:g_anchor1")),
      selections = Seq(
        Selection(alias = None, pred = by, varName = Some("g_simvec")),
        Selection(alias = None, pred = "math", varName = Some("g_simdist"),
          mathExpr = Some(distance))))
    val (rFunc2, rFilt2) = applyAuth(t,
      FuncCall("uid", "", Seq("g_simdist")), Some(anchorNot))
    val result = QueryBlock(
      name = root.outName,
      func = rFunc2,
      filter = rFilt2,
      order = Seq(Ordering("val:g_simdist", desc = false)),
      selections = {
        val (vd, rest) = root.children.partition(_.name == "vector_distance")
        vd.map(c => Selection(alias = Some(c.outName), pred = "val",
          valRef = Some("g_simdist"))) ++ expandSelections(rest, t)
      })
    Seq(anchorBlock, reduceBlock, simBlock, result)
  }

  // ---- check<T>Password (reference graphql/schema/gqlschema.go:2303
  // addPasswordQuery + resolve/query_rewriter.go:335 passwordQuery) ----

  /** Two-block rewrite, per the reference's golden shape
    * (query_test.yaml "Password query"):
    *   checkPwd(func: <id lookup>) @filter(type(T)) {
    *     pwd as checkpwd(<secret pred>, <candidate>) }
    *   check<T>Password(func: <id lookup>)
    *     @filter(eq(val(pwd), 1) AND type(T)) { fields }
    * The type's @auth query rule applies to the result block like any
    * other read of the type.
    */
  private def passwordBlocks(root: GqlSelection, t: SdlType): Seq[QueryBlock] = {
    val pwdField = t.secret.getOrElse(throw RewriteException(
      s"${t.name} has no @secret password field — check${t.name}Password " +
        "is not generated"))
    val pw = root.args.collectFirst {
      case (n, v) if n == pwdField => scalar(v)
    }.getOrElse(throw RewriteException(
      s"check${t.name}Password requires the $pwdField argument"))
    // the id lookup: `id:` seeds uid(); an @id (xid) or any other field
    // arg seeds eq(field, value) — mirrors rewriteAsGet
    val idFunc = root.args.collectFirst {
      case ("id", v) => FuncCall("uid", "", Seq(scalar(v)))
      case (n, v) if n != pwdField && t.field(n).isDefined =>
        FuncCall("eq", n, Seq(scalar(v)))
    }.getOrElse(throw RewriteException(
      s"check${t.name}Password requires an id argument"))
    val varBlock = QueryBlock(
      name = "var", func = idFunc, filter = typeFilter(t),
      selections = Seq(Selection(alias = None, pred = pwdField,
        checkPwd = Some(pw), varName = Some("g_pwdok"))))
    val okFilter: FilterNode =
      FilterLeaf(FuncCall("eq", "val:g_pwdok", Seq("1")))
    val (rFunc, rFilt) = applyAuth(t, idFunc,
      Some(FilterAnd(Seq(okFilter, typeFilter(t).get))))
    Seq(varBlock, QueryBlock(
      name = root.outName,
      func = rFunc,
      filter = rFilt,
      selections = expandSelections(root.children, t)))
  }

  // ---- query<T> ----

  private def queryBlock(root: GqlSelection, t: SdlType): QueryBlock = {
    val (func0, filt0) = rootAndFilter(root, t)
    val (func, filt) = applyAuth(t, func0, filt0)
    QueryBlock(
      name = root.outName,
      func = func,
      filter = filt,
      order = root.arg("order").map(orderList).getOrElse(Nil),
      page = pagination(root),
      cascade = root.directives.contains("cascade"),
      cascadeFields = cascadeFieldsOf(root),
      selections = expandSelections(root.children, t))
  }

  /** Root-function selection with the reference's eq/in promotion. */
  private def rootAndFilter(root: GqlSelection, t: SdlType): (FuncCall, Option[FilterNode]) =
    root.arg("filter") match {
      case Some(o: GObj) =>
        o.fields match {
          case Seq((f, fo: GObj)) if t.field(f).isDefined =>
            fo.fields match {
              case Seq(("eq", v)) if v != GNull =>
                (FuncCall("eq", f, Seq(scalar(v))), typeFilter(t))
              case Seq(("in", GList(vs))) =>
                (FuncCall("eq", f, vs.map(scalar)), typeFilter(t))
              case _ =>
                (typeFunc(t), Some(filterNode(o, t)))
            }
          case _ => (typeFunc(t), Some(filterNode(o, t)))
        }
      case _ => (typeFunc(t), None)
    }

  /** type(T) seed/filter; for an interface the extra args carry the
    * implementing type names (an interface query matches every
    * implementer — reference graphql/schema/gqlschema.go interface
    * query fields).
    */
  private def typeFunc(t: SdlType): FuncCall =
    FuncCall("type", t.name,
      if (t.isInterface) schema.implementers(t.name) else Nil)

  private def typeFilter(t: SdlType): Option[FilterNode] =
    Some(FilterLeaf(typeFunc(t)))

  // ---- get<T> ----

  private def getBlock(root: GqlSelection, t: SdlType): QueryBlock = {
    val id = root.arg("id").map(scalar).getOrElse(
      throw new RewriteException(s"get${t.name} requires an id argument"))
    val (func, filt) = applyAuth(t, FuncCall("uid", "", Seq(id)), typeFilter(t))
    QueryBlock(
      name = root.outName,
      func = func,
      filter = filt,
      selections = expandSelections(root.children, t))
  }

  // ---- aggregate<T> ----

  private val AggField = "(\\w+?)(Min|Max|Sum|Avg)".r

  private def aggBlocks(root: GqlSelection, t: SdlType): Seq[QueryBlock] = {
    val (func1, filt1) = rootAndFilter(root, t)
    val (func, filt) = applyAuth(t, func1, filt1)
    val refs = root.children.collect {
      case c if c.name != "count" => c.name match {
        case AggField(f, _) => f
        case other => throw RewriteException(s"bad aggregate field: $other")
      }
    }.distinct
    val varBlock = QueryBlock(
      name = "var", func = func, filter = filt,
      selections = refs.map(f => Selection(alias = None, pred = f,
        varName = Some(s"ag_$f"))))
    val aggSel = root.children.map { c =>
      c.name match {
        case "count" =>
          Selection(alias = Some(c.outName), pred = "uid", isCount = true)
        case AggField(f, op) =>
          Selection(alias = Some(c.outName), pred = "val",
            valRef = Some(s"ag_$f"), aggOp = Some(op.toLowerCase))
      }
    }
    val aggBlock = QueryBlock(
      name = root.outName, func = func, filter = filt, selections = aggSel)
    if (refs.nonEmpty) Seq(varBlock, aggBlock) else Seq(aggBlock)
  }

  // ---- selections ----

  /** Resolve a selection set, expanding inline fragments: `... on T`
    * children resolve against T's own fields (implementer-exclusive
    * fields are only reachable this way). Field names map to global
    * predicates in this engine, so fragment fields MERGE into the parent
    * set — a node lacking the predicate renders the field absent, which
    * is exactly the per-type behavior (the reference fetches all
    * fragment branches too and filters at completion,
    * query_test.yaml "query with fragments inside interface").
    */
  private def expandSelections(sels: Seq[GqlSelection],
      t: SdlType): Seq[Selection] = expandSelections(sels, t, t)

  /** `outer` is the selection SET's declared type: fragments narrow the
    * field-resolution type `t` but __typename must still discriminate
    * per NODE of the outer set — a constant from one fragment branch
    * would clobber every merged row (Apollo's addTypename emits
    * __typename inside each branch).
    */
  private def expandSelections(sels: Seq[GqlSelection],
      t: SdlType, outer: SdlType): Seq[Selection] = {
    val out = sels.flatMap { c =>
      if (c.name.startsWith("\u0000on:")) {
        val tc = c.name.stripPrefix("\u0000on:")
        val ft = schema.types.getOrElse(tc, throw new RewriteException(
          s"inline fragment on unknown type $tc"))
        val ok = tc == t.name || ft.implements.contains(t.name) ||
          t.implements.contains(tc)
        if (!ok) throw new RewriteException(
          s"inline fragment on $tc cannot apply to ${t.name}")
        expandSelections(c.children, ft, outer)
      } else if (c.name == "__typename") selection(c, outer)
      else selection(c, t)
    }
    // field merging (GraphQL spec): two fragments selecting the same
    // field produce ONE fetch — identical selections dedup, genuinely
    // conflicting ones surface through the executor's repeated-subgraph
    // check as before
    out.distinct
  }

  private def selection(sel: GqlSelection, t: SdlType): Option[Selection] = {
    if (sel.name == "id") return None // uid is implicit in flat output
    if (sel.name == "__typename") {
      // the reference's completion layer injects __typename. A CONCRETE
      // type's value is static — a literal column; an INTERFACE resolves
      // the node's concrete type from the type tablet, restricted to the
      // implementer names (the discriminator pattern).
      return Some(
        if (t.isInterface)
          Selection(alias = Some(sel.outName), pred = "__typename",
            typeNameOf = schema.implementers(t.name))
        else
          Selection(alias = Some(sel.outName), pred = "__typename",
            constVal = Some(t.name)))
    }
    val f = t.field(sel.name).getOrElse(
      throw new RewriteException(s"${t.name} has no field '${sel.name}'"))
    val child = schema.types.get(f.typeName)
    child match {
      case Some(ct) =>
        // nested field of an auth-guarded type: a FALSE verdict OMITS
        // the field (auth_query_test.yaml "Deep RBAC rule - Level 1
        // false" renders the parent without adminTasks); a graph rule
        // ANDs into the edge filter
        val userFilter =
          sel.arg("filter").collect { case o: GObj => filterNode(o, ct) }
        val filter = authConstraint(ct) match {
          case Left(true) => userFilter
          case Left(false) => return None
          case Right(af) =>
            Some(userFilter.map(x => FilterAnd(Seq(x, af))).getOrElse(af))
        }
        Some(Selection(
          alias = Some(sel.outName),
          pred = sel.name,
          filter = filter,
          order = sel.arg("order").map(orderList).getOrElse(Nil),
          page = pagination(sel),
          selCascade = sel.directives.contains("cascade"),
          // @cascade(fields: [...]) on a nested field — only the listed
          // subtree fields are mandatory (reference query_rewriter.go:1729
          // addCascadeDirective applies the parameterized form per child)
          selCascadeFields = cascadeFieldsOf(sel),
          children = expandSelections(sel.children, ct)))
      case None =>
        Some(Selection(alias = Some(sel.outName), pred = sel.name))
    }
  }

  // ---- filter objects → FilterTree ----

  /** GraphQL filter object semantics (reference buildFilter,
    * query_rewriter.go): sibling entries AND together, `or` branches OR
    * against that conjunction, `not` negates its object, `has` accepts a
    * field or list of fields.
    */
  private def filterNode(o: GObj, t: SdlType): FilterNode = {
    val ands = Seq.newBuilder[FilterNode]
    val ors = Seq.newBuilder[FilterNode]
    o.fields.foreach {
      case ("and", GList(items)) =>
        items.foreach { case io: GObj => ands += filterNode(io, t); case _ => () }
      case ("and", io: GObj) => ands += filterNode(io, t)
      case ("or", GList(items)) =>
        items.foreach { case io: GObj => ors += filterNode(io, t); case _ => () }
      case ("or", io: GObj) => ors += filterNode(io, t)
      case ("not", io: GObj) => ands += FilterNot(filterNode(io, t))
      // filter: { id: ["0x1", ...] } — uid membership (the reference
      // rewrites id filters to uid(...), query_rewriter.go ids case)
      case ("id", GList(vs)) =>
        ands += FilterLeaf(FuncCall("uid", "", vs.map(scalar)))
      case ("id", GStr(v)) =>
        ands += FilterLeaf(FuncCall("uid", "", Seq(v)))
      case ("has", GEnum(f)) => ands += FilterLeaf(FuncCall("has", f, Nil))
      case ("has", GStr(f)) => ands += FilterLeaf(FuncCall("has", f, Nil))
      case ("has", GList(fs)) => fs.foreach {
        case GEnum(f) => ands += FilterLeaf(FuncCall("has", f, Nil))
        case GStr(f) => ands += FilterLeaf(FuncCall("has", f, Nil))
        case _ => ()
      }
      case (field, fo: GObj) if t.field(field).isDefined =>
        fieldFilter(field, fo).foreach(ands += _)
      case (field, bad) => throw RewriteException(
        s"unsupported filter entry $field: $bad on type ${t.name}")
    }
    val andPart = ands.result() match {
      case Seq() => None
      case Seq(one) => Some(one)
      case many => Some(FilterAnd(many))
    }
    (andPart, ors.result()) match {
      case (Some(a), Seq()) => a
      case (Some(a), os) => FilterOr(a +: os)
      case (None, Seq(one)) => one
      case (None, os) if os.nonEmpty => FilterOr(os)
      case _ => throw RewriteException(s"empty filter object on ${t.name}")
    }
  }

  private def fieldFilter(field: String, fo: GObj): Option[FilterNode] = {
    val leaves = fo.fields.flatMap {
      case (_, GNull) => None // {eq: null} handled as NOT has by reference; skip
      case ("eq", v) => Some(FuncCall("eq", field, Seq(scalar(v))))
      case ("in", GList(vs)) => Some(FuncCall("eq", field, vs.map(scalar)))
      case ("le", v) => Some(FuncCall("le", field, Seq(scalar(v))))
      case ("lt", v) => Some(FuncCall("lt", field, Seq(scalar(v))))
      case ("ge", v) => Some(FuncCall("ge", field, Seq(scalar(v))))
      case ("gt", v) => Some(FuncCall("gt", field, Seq(scalar(v))))
      case ("between", bo: GObj) =>
        (bo.get("min"), bo.get("max")) match {
          case (Some(mn), Some(mx)) =>
            Some(FuncCall("between", field, Seq(scalar(mn), scalar(mx))))
          case _ => throw RewriteException(
            s"between filter on $field requires both min and max")
        }
      case ("anyofterms", v) => Some(FuncCall("anyofterms", field, Seq(scalar(v))))
      case ("allofterms", v) => Some(FuncCall("allofterms", field, Seq(scalar(v))))
      case ("anyoftext", v) => Some(FuncCall("anyoftext", field, Seq(scalar(v))))
      case ("alloftext", v) => Some(FuncCall("alloftext", field, Seq(scalar(v))))
      case ("regexp", v) =>
        Some(FuncCall("regexp", field, Seq(stripSlashes(scalar(v)))))
      // geo filters (reference gqlschema.go NearFilter/PolygonRef —
      // dgquery shape query_test.yaml "Point query near filter"):
      // near(pred, [lon,lat], dist) / within(pred, [[[lon,lat],...]])
      case ("near", no: GObj) =>
        val d = no.get("distance").map(scalar).getOrElse(
          throw RewriteException("near filter requires distance"))
        val (lon, lat) = pointOf(no.get("coordinate").getOrElse(
          throw RewriteException("near filter requires coordinate")))
        Some(FuncCall("near", field, Seq(lon, lat, d)))
      case ("within", wo: GObj) =>
        val poly = wo.get("polygon").getOrElse(
          throw RewriteException("within filter requires polygon"))
        Some(FuncCall("within", field, Seq(polygonLit(poly))))
      case ("contains", co: GObj) =>
        co.get("point").map(pointOf) match {
          case Some((lon, lat)) =>
            Some(FuncCall("contains", field, Seq(lon, lat)))
          case None =>
            val poly = co.get("polygon").getOrElse(
              throw RewriteException("contains filter requires point or polygon"))
            Some(FuncCall("contains", field, Seq(polygonLit(poly))))
        }
      case ("intersects", io: GObj) =>
        val poly = io.get("polygon")
          .orElse(io.get("multiPolygon")).getOrElse(
            throw RewriteException("intersects filter requires polygon"))
        Some(FuncCall("intersects", field, Seq(polygonLit(poly))))
      case (op, v) => throw RewriteException(s"unsupported filter op $op: $v")
    }
    leaves.map(FilterLeaf(_): FilterNode) match {
      case Seq() => None
      case Seq(one) => Some(one)
      case many => Some(FilterAnd(many))
    }
  }

  /** `@cascade(fields: ["f1","f2"])` — the parameterized form
    * (reference query_test.yaml "@cascade(fields:[...])" cases).
    */
  private def cascadeFieldsOf(sel: GqlSelection): Seq[String] =
    sel.dirArgs.get("cascade").toSeq.flatten.collectFirst {
      case ("fields", GList(fs)) => fs.map(scalar)
    }.getOrElse(Nil)

  /** GraphQL PointRef { latitude, longitude } → (lon, lat) lexemes. */
  private def pointOf(v: GVal): (String, String) = v match {
    case o: GObj =>
      (o.get("longitude").map(scalar).getOrElse(
        throw RewriteException("point requires longitude")),
        o.get("latitude").map(scalar).getOrElse(
          throw RewriteException("point requires latitude")))
    case other => throw RewriteException(s"expected a point, got $other")
  }

  /** PolygonRef { coordinates: [{ points: [PointRef...] }...] } → the
    * DQL polygon literal [[[lon,lat],...],...] (first ring outer, rest
    * holes — reference query_rewriter geo filter shape).
    */
  private def polygonLit(v: GVal): String = v match {
    case o: GObj =>
      val rings = o.get("coordinates") match {
        case Some(GList(rs)) => rs
        case _ => throw RewriteException("polygon requires coordinates")
      }
      rings.map {
        case ro: GObj =>
          val pts = ro.get("points") match {
            case Some(GList(ps)) => ps
            case _ => throw RewriteException("polygon ring requires points")
          }
          pts.map { p =>
            val (lon, lat) = pointOf(p)
            s"[$lon,$lat]"
          }.mkString("[", ",", "]")
        case other => throw RewriteException(s"bad polygon ring: $other")
      }.mkString("[", ",", "]")
    case other => throw RewriteException(s"expected a polygon, got $other")
  }

  // ---- args ----

  private def orderList(v: GVal): Seq[Ordering] = v match {
    case o: GObj =>
      val here = o.fields.collectFirst {
        case ("asc", f) => Ordering(enumName(f), desc = false)
        case ("desc", f) => Ordering(enumName(f), desc = true)
      }.toSeq
      here ++ o.get("then").map(orderList).getOrElse(Nil)
    case other => throw RewriteException(s"bad order argument: $other")
  }

  private def pagination(sel: GqlSelection): Pagination = Pagination(
    first = sel.arg("first").map(v => scalar(v).toInt),
    offset = sel.arg("offset").map(v => scalar(v).toInt))

  private def scalar(v: GVal): String = v match {
    case GStr(s) => s
    case GNum(s) => s
    case GEnum(e) => e
    case GBool(b) => b.toString
    case other => throw RewriteException(s"expected scalar, got $other")
  }

  private def enumName(v: GVal): String = v match {
    case GEnum(e) => e
    case GStr(s) => s
    case other => throw RewriteException(s"expected field name, got $other")
  }

  private def stripSlashes(s: String): String =
    if (s.length >= 2 && s.startsWith("/") && s.endsWith("/"))
      s.substring(1, s.length - 1)
    else s
}
