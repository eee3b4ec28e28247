package graft.dql

/** DQL AST — the Spark engine's analogue of the reference's
  * dql.GraphQuery IR (/root/reference/dql/parser.go:40). One case class
  * per syntactic form we execute; the planner walks this tree and emits
  * DataFrame operations (SURVEY.md §3.1 step 4).
  */
sealed trait FilterNode
final case class FilterAnd(children: Seq[FilterNode]) extends FilterNode
final case class FilterOr(children: Seq[FilterNode]) extends FilterNode
final case class FilterNot(child: FilterNode) extends FilterNode
final case class FilterLeaf(fn: FuncCall) extends FilterNode

/** A root/filter function: eq, le, lt, ge, gt, between, has, uid,
  * uid_in, type, anyofterms, allofterms, regexp, match
  * (reference worker/task.go:210 FuncType dispatch).
  */
final case class FuncCall(name: String, pred: String, args: Seq[String])

final case class Ordering(pred: String, desc: Boolean)

/** One `@groupby` key: `@groupby(age)` or aliased `@groupby(Age: age)`
  * (reference query/groupby.go formResult key attrs; alias from
  * Params.Alias).
  */
final case class GroupKey(alias: Option[String], pred: String) {
  def outName: String = alias.getOrElse(pred)
}

final case class Pagination(first: Option[Int] = None, offset: Option[Int] = None,
    after: Option[Long] = None)

/** One selection inside a block: scalar leaf, uid traversal (with nested
  * selections), count(pred), or reverse traversal (~pred).
  */
final case class Selection(
    alias: Option[String],
    pred: String,
    reverse: Boolean = false,
    isCount: Boolean = false,
    filter: Option[FilterNode] = None,
    order: Seq[Ordering] = Nil,
    page: Pagination = Pagination(),
    children: Seq[Selection] = Nil,
    varName: Option[String] = None,   // `x as pred` binding
    valRef: Option[String] = None,    // `val(x)` reference
    aggOp: Option[String] = None,     // min/max/sum/avg over val(x)
    facetFetch: Boolean = false,          // @facets
    facetKeys: Seq[String] = Nil,         // @facets(k1, k2): named fetch / weight
    facetFilter: Option[FilterNode] = None, // @facets(eq(k, v) AND/OR/NOT ...)
    facetOrder: Seq[Ordering] = Nil,      // @facets(orderasc: k1, orderdesc: k2)
    groupby: Seq[GroupKey] = Nil,         // @groupby(p1, A: p2)
    normalize: Boolean = false,           // subquery-level @normalize
    mathExpr: Option[MathNode] = None,    // x as math(...)
    facetVars: Seq[(String, String)] = Nil, // @facets(L as weight)
    facetAliases: Map[String, String] = Map.empty, // @facets(o: origin)
    selCascade: Boolean = false,          // child-level @cascade subtree
    selCascadeFields: Seq[String] = Nil,  // child-level @cascade(f1, f2)
    langChain: Seq[String] = Nil,         // pred@en:fr:. preference chain
    checkPwd: Option[String] = None,      // checkpwd(pred, "candidate")
    constVal: Option[String] = None,      // literal-valued field (__typename)
    typeNameOf: Seq[String] = Nil) {      // per-node concrete-type lookup
                                          // restricted to these candidates
                                          // (interface __typename)
  def outName: String = alias.getOrElse(
    if (checkPwd.isDefined) s"checkpwd_$pred"
    else if (isCount) s"count_$pred"
    // a var-bound math selection renders under `val(<var>)` (reference
    // outputnode key for in-block math, TestQueryVarValAggOrderDesc)
    else if (pred == "math" && varName.isDefined) s"val_${varName.get}"
    else aggOp.map(op => valRef.map(v => s"${op}_$v").getOrElse(s"${op}_$pred"))
      .getOrElse(valRef.map(v => s"val_$v").getOrElse {
        // `knows` and `~knows` in one block must not collide (LDBC IC02)
        val base = if (reverse) s"~$pred" else pred
        if (langChain.nonEmpty) s"$base@${langChain.mkString(":")}" else base
      }))
}

/** math(...) expression tree (reference dql/math.go: binary `+ - * / %
  * pow logbase`, comparisons `< > <= >= == !=`, unary/function `ln exp
  * sqrt floor ceil since u-`, n-ary `min max`, ternary `cond`).
  */
sealed trait MathNode
// isInt: the literal was written without '.'/'e' — integer-typed math
// follows the reference's typed evaluation (query/math.go: int ops on
// int operands, incl. truncating division)
/** Numeric math literal. Int lexemes keep their EXACT 64-bit value in
  * `exact` — a double round-trip silently corrupts literals past the
  * 53-bit mantissa (reference TestProcessBinary: 48038396025285290 + 2
  * must equal ...292, int math is exact at full 64-bit width).
  */
final case class MathNum(v: Double, isInt: Boolean = false,
    exact: Long = 0L) extends MathNode

object MathNum {
  /** Int lexemes past Int64 range fall back to a float literal rather
    * than failing the query — the reference's int→float parse fallback
    * (dql/math.go parses with strconv.ParseInt, retries ParseFloat). */
  def fromLexeme(s: String, isInt: Boolean): MathNum =
    if (isInt)
      try MathNum(s.toDouble, isInt = true, exact = s.toLong)
      catch { case _: NumberFormatException => MathNum(s.toDouble) }
    else MathNum(s.toDouble)
}
final case class MathRef(name: String) extends MathNode
final case class MathBin(op: String, l: MathNode, r: MathNode) extends MathNode
final case class MathFunc(name: String, args: Seq[MathNode]) extends MathNode
// "[1.0, 2.0]" float32vector literal — the operand of `dot`
// (reference query/vector/vector_test.go Math(v1 dot $vec))
final case class MathVec(values: Seq[Double]) extends MathNode

final case class RecurseArgs(depth: Int, loop: Boolean)

/** `shortest(from: U, to: V, numpaths: k [, depth: d] [, minweight: w]
  * [, maxweight: w])` block args (reference query/shortest.go:457
  * shortestPath, :286 runKShortestPaths; weight bounds :457 args).
  * `@ignorereflex` on the block drops self-loop edges from the walk.
  */
final case class ShortestArgs(from: Long, to: Long, numpaths: Int, depth: Int,
    minweight: Double = Double.NegativeInfinity,
    maxweight: Double = Double.PositiveInfinity,
    ignoreReflex: Boolean = false,
    fromVar: Option[String] = None,   // from: uid(a) — var must hold 1 uid
    toVar: Option[String] = None)

final case class QueryBlock(
    name: String,
    func: FuncCall,
    filter: Option[FilterNode] = None,
    order: Seq[Ordering] = Nil,
    page: Pagination = Pagination(),
    cascade: Boolean = false,
    normalize: Boolean = false,
    recurse: Option[RecurseArgs] = None,
    selections: Seq[Selection] = Nil,
    shortest: Option[ShortestArgs] = None,
    blockVar: Option[String] = None,   // `sp as shortest(...)` binding
    cascadeFields: Seq[String] = Nil,  // @cascade(f1, f2): only these required
    groupby: Seq[GroupKey] = Nil,      // root-level @groupby(p1, A: p2)
    ignoreReflex: Boolean = false)     // @ignorereflex on a plain block

final case class DqlQuery(blocks: Seq[QueryBlock])
