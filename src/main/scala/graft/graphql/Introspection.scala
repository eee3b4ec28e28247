package graft.graphql

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** GraphQL introspection — `{ __schema { ... } }` / `{ __type(name:) }`
  * roots answered per the spec's §4 introspection schema. The reference
  * resolves these entirely from the parsed schema, never touching
  * storage (graphql/schema/introspection.go introspect(),
  * graphql/resolve/query.go resolveIntrospection); same here: the
  * response is computed driver-side from [[GqlSchema]] metadata —
  * introspection is metadata-scale at any data size.
  *
  * The walk is SELECTION-DRIVEN (only requested fields are emitted,
  * like the reference's collectFields loop) — which also makes the
  * cyclic type graph safe: a `type { ofType { ... } }` chain only goes
  * as deep as the query asks.
  *
  * Documented fidelity bounds:
  *  - the SDL parser tolerates-and-drops `!`, so NON_NULL wrappers are
  *    not reported (fields introspect as their nullable base type);
  *  - unions are modeled as fieldless interfaces at parse time and
  *    introspect as INTERFACE with possibleTypes (the discrimination
  *    machinery is shared — Sdl.scala union note);
  *  - generated filter/input/payload helper types are not enumerated:
  *    root fields report their RESULT types and empty arg lists. The
  *    type inventory covers the schema's own types, which is what
  *    clients introspect for.
  */
object Introspection {

  private val M = new ObjectMapper()

  /** Built-in scalars (reference graphql/schema/gqlschema.go
    * supportedScalars: ID Boolean Int Int64 Float String DateTime).
    */
  private val Scalars =
    Seq("ID", "Boolean", "Int", "Int64", "Float", "String", "DateTime",
      "Point", "Polygon", "MultiPolygon")

  /** Directives the SDL layer understands (reference directiveDefns). */
  private val Directives = Seq(
    ("include", Seq("FIELD", "FRAGMENT_SPREAD", "INLINE_FRAGMENT")),
    ("skip", Seq("FIELD", "FRAGMENT_SPREAD", "INLINE_FRAGMENT")),
    ("deprecated", Seq("FIELD_DEFINITION", "ENUM_VALUE")),
    ("search", Seq("FIELD_DEFINITION")),
    ("id", Seq("FIELD_DEFINITION")),
    ("embedding", Seq("FIELD_DEFINITION")),
    ("lambda", Seq("FIELD_DEFINITION")),
    ("custom", Seq("FIELD_DEFINITION")),
    ("hasInverse", Seq("FIELD_DEFINITION")),
    ("auth", Seq("OBJECT", "INTERFACE")),
    ("secret", Seq("OBJECT", "INTERFACE")),
    ("withSubscription", Seq("OBJECT", "INTERFACE")),
    ("cascade", Seq("FIELD")))

  /** Does the operation resolve purely by introspection? Mixed
    * documents (data roots + __schema) are rare enough that the
    * reference also splits them; callers route all-introspection ops
    * here and everything else to the engine.
    */
  def applies(op: GqlOperation): Boolean =
    op.kind == "query" && op.roots.nonEmpty &&
      op.roots.forall(r => r.name == "__schema" || r.name == "__type")

  /** One (outName, json) per root — the engine's (block, json) shape. */
  def resolveRoots(schema: GqlSchema,
      op: GqlOperation): Seq[(String, String)] =
    op.roots.map { r =>
      val node: JsonNode = r.name match {
        case "__schema" => schemaNode(schema, r.children)
        case "__type" =>
          val n = r.arg("name") match {
            case Some(GStr(s)) => s
            case _ => throw new Rewriter.RewriteException(
              "__type requires a name: argument")
          }
          if (allTypeNames(schema).contains(n))
            typeNode(schema, Named(n), r.children)
          else M.nullNode()
        case other => throw new Rewriter.RewriteException(
          s"not an introspection root: $other")
      }
      r.outName -> M.writeValueAsString(node)
    }

  /** The whole `data` JSON for an all-introspection operation. */
  def resolve(schema: GqlSchema, op: GqlOperation): String = {
    val data = M.createObjectNode()
    resolveRoots(schema, op).foreach { case (k, v) =>
      data.set[JsonNode](k, M.readTree(v))
    }
    M.writeValueAsString(data)
  }

  // ---- type references ----

  private sealed trait Ref
  private final case class Named(n: String) extends Ref
  private final case class ListOf(of: Ref) extends Ref

  private def refOf(f: SdlField): Ref =
    if (f.isList) ListOf(Named(f.typeName)) else Named(f.typeName)

  private def allTypeNames(s: GqlSchema): Set[String] =
    (Scalars ++ s.types.keys ++ syntheticRoots(s).keys).toSet

  // ---- synthetic Query / Mutation / Subscription root types ----

  /** The generated API surface as introspectable root types (reference
    * gqlschema.go:1054 addQueries/addMutations generate query/get/
    * aggregate and add/update/delete fields per type; @custom(dql:)
    * queries keep their declared signatures).
    */
  private def syntheticRoots(s: GqlSchema): Map[String, SdlType] = {
    val concrete = s.types.values.filter(t => !t.isInterface).toSeq
      .sortBy(_.name)
    val ifaces = s.types.values.filter(_.isInterface).toSeq.sortBy(_.name)
    val qf = Seq.newBuilder[SdlField]
    (concrete ++ ifaces).foreach { t =>
      qf += SdlField(s"query${t.name}", t.name, isList = true,
        isId = false, searchable = Nil)
      qf += SdlField(s"get${t.name}", t.name, isList = false,
        isId = false, searchable = Nil)
      qf += SdlField(s"aggregate${t.name}", t.name, isList = false,
        isId = false, searchable = Nil)
      if (t.secret.isDefined)
        qf += SdlField(s"check${t.name}Password", t.name, isList = false,
          isId = false, searchable = Nil)
      if (t.fields.exists(_.isEmbedding)) {
        qf += SdlField(s"querySimilar${t.name}ByEmbedding", t.name,
          isList = true, isId = false, searchable = Nil)
        qf += SdlField(s"querySimilar${t.name}ById", t.name,
          isList = true, isId = false, searchable = Nil)
      }
    }
    s.customDql.toSeq.sortBy(_._1).foreach { case (n, cd) =>
      qf += SdlField(n, cd.typeName, isList = cd.isList,
        isId = false, searchable = Nil)
    }
    val mf = concrete.flatMap(t => Seq(
      SdlField(s"add${t.name}", t.name, isList = true, isId = false,
        searchable = Nil),
      SdlField(s"update${t.name}", t.name, isList = true, isId = false,
        searchable = Nil),
      SdlField(s"delete${t.name}", t.name, isList = true, isId = false,
        searchable = Nil)))
    val subTs = (concrete ++ ifaces).filter(_.withSubscription)
    val sf = subTs.map(t => SdlField(s"query${t.name}", t.name,
      isList = true, isId = false, searchable = Nil))
    Map("Query" -> SdlType("Query", qf.result())) ++
      (if (mf.nonEmpty) Map("Mutation" -> SdlType("Mutation", mf)) else Map.empty) ++
      (if (sf.nonEmpty) Map("Subscription" -> SdlType("Subscription", sf)) else Map.empty)
  }

  // ---- selection-driven node builders ----

  private def schemaNode(s: GqlSchema,
      sel: Seq[GqlSelection]): ObjectNode = {
    val roots = syntheticRoots(s)
    val o = M.createObjectNode()
    sel.foreach { c =>
      c.name match {
        case "__typename" => o.put(c.outName, "__Schema")
        case "description" => o.putNull(c.outName)
        case "queryType" =>
          o.set[JsonNode](c.outName, typeNode(s, Named("Query"), c.children))
        case "mutationType" =>
          if (roots.contains("Mutation"))
            o.set[JsonNode](c.outName,
              typeNode(s, Named("Mutation"), c.children))
          else o.putNull(c.outName)
        case "subscriptionType" =>
          if (roots.contains("Subscription"))
            o.set[JsonNode](c.outName,
              typeNode(s, Named("Subscription"), c.children))
          else o.putNull(c.outName)
        case "types" =>
          val arr = o.putArray(c.outName)
          (Scalars.map(Named(_)) ++
            s.types.keys.toSeq.sorted.map(Named(_)) ++
            roots.keys.toSeq.sorted.map(Named(_)))
            .foreach(r => arr.add(typeNode(s, r, c.children)))
        case "directives" =>
          val arr = o.putArray(c.outName)
          Directives.foreach { case (dn, locs) =>
            arr.add(directiveNode(dn, locs, c.children))
          }
        case _ => o.putNull(c.outName)
      }
    }
    o
  }

  private def kindOf(s: GqlSchema, n: String): String =
    if (Scalars.contains(n)) "SCALAR"
    else s.types.get(n) match {
      case Some(t) if t.isInterface => "INTERFACE"
      case _ => "OBJECT" // schema types + synthetic roots
    }

  private def typeNode(s: GqlSchema, ref: Ref,
      sel: Seq[GqlSelection]): ObjectNode = {
    val o = M.createObjectNode()
    val roots = syntheticRoots(s)
    def resolved(n: String): Option[SdlType] =
      s.types.get(n).orElse(roots.get(n))
    sel.foreach { c =>
      (c.name, ref) match {
        case ("__typename", _) => o.put(c.outName, "__Type")
        case ("kind", Named(n)) => o.put(c.outName, kindOf(s, n))
        case ("kind", _: ListOf) => o.put(c.outName, "LIST")
        case ("name", Named(n)) => o.put(c.outName, n)
        case ("name", _: ListOf) => o.putNull(c.outName)
        case ("ofType", ListOf(of)) =>
          o.set[JsonNode](c.outName, typeNode(s, of, c.children))
        case ("ofType", _) => o.putNull(c.outName)
        case ("fields", Named(n)) =>
          resolved(n).filter(_ => kindOf(s, n) != "SCALAR") match {
            case Some(t) if t.fields.nonEmpty =>
              val arr = o.putArray(c.outName)
              t.fields.foreach(f => arr.add(fieldNode(s, f, c.children)))
            case Some(_) => o.putArray(c.outName) // fieldless union-iface
            case None => o.putNull(c.outName)
          }
        case ("fields", _) => o.putNull(c.outName)
        case ("interfaces", Named(n)) =>
          resolved(n) match {
            case Some(t) if kindOf(s, n) == "OBJECT" =>
              val arr = o.putArray(c.outName)
              t.implements.foreach(i =>
                arr.add(typeNode(s, Named(i), c.children)))
            case _ => o.putNull(c.outName)
          }
        case ("possibleTypes", Named(n)) =>
          if (kindOf(s, n) == "INTERFACE") {
            val arr = o.putArray(c.outName)
            s.implementers(n).foreach(i =>
              arr.add(typeNode(s, Named(i), c.children)))
          } else o.putNull(c.outName)
        case ("enumValues" | "inputFields", _) => o.putNull(c.outName)
        case ("description" | "specifiedByURL", _) => o.putNull(c.outName)
        case _ => o.putNull(c.outName)
      }
    }
    o
  }

  private def fieldNode(s: GqlSchema, f: SdlField,
      sel: Seq[GqlSelection]): ObjectNode = {
    val o = M.createObjectNode()
    sel.foreach { c =>
      c.name match {
        case "__typename" => o.put(c.outName, "__Field")
        case "name" => o.put(c.outName, f.name)
        case "description" => o.putNull(c.outName)
        case "args" => o.putArray(c.outName)
        case "type" =>
          o.set[JsonNode](c.outName, typeNode(s, refOf(f), c.children))
        case "isDeprecated" => o.put(c.outName, false)
        case "deprecationReason" => o.putNull(c.outName)
        case _ => o.putNull(c.outName)
      }
    }
    o
  }

  private def directiveNode(name: String, locations: Seq[String],
      sel: Seq[GqlSelection]): ObjectNode = {
    val o = M.createObjectNode()
    sel.foreach { c =>
      c.name match {
        case "__typename" => o.put(c.outName, "__Directive")
        case "name" => o.put(c.outName, name)
        case "description" => o.putNull(c.outName)
        case "isRepeatable" => o.put(c.outName, false)
        case "locations" =>
          val arr: ArrayNode = o.putArray(c.outName)
          locations.foreach(arr.add)
        case "args" => o.putArray(c.outName)
        case _ => o.putNull(c.outName)
      }
    }
    o
  }
}
