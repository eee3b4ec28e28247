package graft.core

/** Predicate schema registry.
  *
  * Mirrors the reference's explicit per-predicate schema
  * (/root/reference/schema/parse.go:84 parseScalarPair and the directive
  * set at :42-82: @index, @reverse, @count, @lang, list-ness) and node
  * types (getPredicatesFromTypes, /root/reference/query/query.go:2780-2814)
  * which drive expand(_all_) and type().
  *
  * In the Spark engine the registry is plain metadata: "indexes" carry no
  * physical meaning (Parquet stats + Catalyst pushdown replace tokenized
  * B-tree walks, see SURVEY.md section 4) but are kept so DQL schema
  * introspection and index-requirement validation behave like the
  * reference.
  */
final case class PredicateSchema(
    name: String,
    dgraphType: String,          // string|int|float|bool|datetime|uid|...
    isList: Boolean = false,
    indexes: Seq[String] = Nil,  // term|exact|hash|int|float|...|hnsw
    reverse: Boolean = false,
    count: Boolean = false,
    lang: Boolean = false,
    noConflict: Boolean = false) {

  /** Distance metric of a vector index — `@index(hnsw(metric: "cosine"))`;
    * the reference defaults to euclidean when unspecified
    * (tok/index_factory.go hnsw options).
    */
  def vectorMetric: String =
    indexes.find(_.startsWith("hnsw"))
      .flatMap("""metric:\s*"?(\w+)"?""".r.findFirstMatchIn(_))
      .map(_.group(1)).getOrElse("euclidean")
}

final case class NodeType(name: String, predicates: Seq[String])

final class SchemaRegistry(
    val predicates: Map[String, PredicateSchema],
    val types: Map[String, NodeType]) {

  def pred(name: String): PredicateSchema =
    predicates.getOrElse(name,
      throw new IllegalArgumentException(s"unknown predicate: $name"))

  def isUidPredicate(name: String): Boolean =
    predicates.get(name).exists(_.dgraphType == "uid")

  /** expand(_all_) support: predicates of a node type. */
  def predicatesOfType(t: String): Seq[String] =
    types.get(t).map(_.predicates).getOrElse(Nil)

  /** `/alter` (reference edgraph/server.go:375): apply a schema payload,
    * returning a NEW registry — predicates are added or replaced, types
    * merged. The registry is immutable metadata; physical index rebuilds
    * are orchestrated separately ([[graft.operators.Alter]]) like the
    * reference queueing posting/index.go:875 rebuilds after the schema
    * mutation commits.
    */
  def alter(payload: String): SchemaRegistry = {
    SchemaRegistry.assertNotReserved(payload)
    val (preds, ts) = SchemaRegistry.parseAlter(payload)
    new SchemaRegistry(predicates ++ preds.map(p => p.name -> p),
      types ++ ts.map(t => t.name -> t))
  }
}

object SchemaRegistry {

  /** The `dgraph.` namespace is reserved for internal types/predicates
    * (reference query/mutation_test.go:29, edgraph alter validation):
    * user alters may not declare types or predicates under it. Message
    * text mirrors the reference's.
    */
  def assertNotReserved(payload: String): Unit = {
    val src = payload.linesIterator.map(l => l.indexOf('#') match {
      case -1 => l; case i => l.substring(0, i)
    }).mkString("\n")
    """type\s+([\w.-]+)""".r.findAllMatchIn(src).foreach { m =>
      val t = m.group(1)
      if (t.startsWith("dgraph."))
        throw new IllegalArgumentException(s"Can't alter type `$t` as it " +
          "is prefixed with `dgraph.` which is reserved as the namespace " +
          "for dgraph's internal types/predicates.")
    }
    """(?m)^\s*([\w.-]+)\s*:""".r.findAllMatchIn(src).foreach { m =>
      val p = m.group(1)
      if (p.startsWith("dgraph."))
        throw new IllegalArgumentException(s"Can't alter predicate `$p` " +
          "as it is prefixed with `dgraph.` which is reserved as the " +
          "namespace for dgraph's internal types/predicates.")
    }
  }

  /** Parse a dgraph-style alter payload (reference schema/parse.go:84):
    * `pred: type @index(t1, t2) @reverse @count @lang .` lines plus
    * `type T { p1 p2 }` blocks. Tolerant of list markers `[type]`.
    */
  def parseAlter(payload: String): (Seq[PredicateSchema], Seq[NodeType]) = {
    val src = payload.linesIterator.map(l => l.indexOf('#') match {
      case -1 => l; case i => l.substring(0, i)
    }).mkString("\n")
    val typeRe = """(?s)type\s+(\w+)\s*\{([^}]*)\}""".r
    val types = typeRe.findAllMatchIn(src).map { m =>
      // members may be angle-quoted, incl. reverse edges: <~previous_model>
      NodeType(m.group(1), m.group(2).split("\\s+").filter(_.nonEmpty)
        .map(_.stripPrefix("<").stripSuffix(">")).toSeq)
    }.toSeq
    val noTypes = typeRe.replaceAllIn(src, "")
    // predicate names may be dotted (office.room) — \w alone would match
    // only the last segment and silently shadow the `room` predicate
    // hyphens are legal in predicate names (reference tweet-a,
    // index-pred1 — lex/state.go name runes)
    // directive args may nest one paren level: @index(hnsw(metric: "euclidean"))
    // (reference vector index declarations, query/vector/vector_test.go:27)
    val predRe = """(?m)^\s*([\w.-]+)\s*:\s*(\[)?\s*(\w+)\s*\]?\s*((?:@\w+(?:\((?:[^()]|\([^)]*\))*\))?\s*)*)\.""".r
    val idxRe = """@index\s*\(((?:[^()]|\([^)]*\))*)\)""".r
    // split the index list on TOP-LEVEL commas only — hnsw(exponent: "4",
    // metric: "euclidean") is ONE tokenizer spec
    def splitIdx(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0; val cur = new StringBuilder
      s.foreach {
        case '(' => depth += 1; cur.append('(')
        case ')' => depth -= 1; cur.append(')')
        case ',' if depth == 0 =>
          if (cur.nonEmpty) out += cur.result().trim; cur.clear()
        case c => cur.append(c)
      }
      if (cur.nonEmpty) out += cur.result().trim
      out.result().filter(_.nonEmpty)
    }
    val preds = predRe.findAllMatchIn(noTypes).map { m =>
      val dirs = Option(m.group(4)).getOrElse("")
      PredicateSchema(
        name = m.group(1),
        dgraphType = m.group(3),
        isList = m.group(2) != null,
        indexes = idxRe.findFirstMatchIn(dirs)
          .map(mm => splitIdx(mm.group(1)))
          .getOrElse(Nil),
        reverse = dirs.contains("@reverse"),
        count = dirs.contains("@count"),
        lang = dirs.contains("@lang"),
        noConflict = dirs.contains("@noconflict"))
    }.toSeq
    (preds, types)
  }

  /** Schema for the derived TPC-H triple store (see TripleStore). */
  val tpch: SchemaRegistry = {
    val preds = Seq(
      PredicateSchema("name", "string", indexes = Seq("term", "exact", "trigram"), lang = false),
      PredicateSchema("mktsegment", "string", indexes = Seq("exact")),
      PredicateSchema("orderstatus", "string", indexes = Seq("exact")),
      PredicateSchema("orderpriority", "string", indexes = Seq("exact", "term")),
      PredicateSchema("brand", "string", indexes = Seq("exact")),
      PredicateSchema("ptype", "string", indexes = Seq("term", "fulltext")),
      PredicateSchema("returnflag", "string", indexes = Seq("exact")),
      PredicateSchema("linestatus", "string", indexes = Seq("exact")),
      PredicateSchema("text", "string", indexes = Seq("fulltext", "term"), lang = true),
      PredicateSchema("source", "string", indexes = Seq("exact")),
      PredicateSchema("size", "int", indexes = Seq("int")),
      PredicateSchema("n_chars", "int", indexes = Seq("int")),
      PredicateSchema("acctbal", "float", indexes = Seq("float")),
      PredicateSchema("totalprice", "float", indexes = Seq("float")),
      PredicateSchema("retailprice", "float", indexes = Seq("float")),
      PredicateSchema("quantity", "float"),
      PredicateSchema("extendedprice", "float"),
      PredicateSchema("discount", "float"),
      PredicateSchema("orderdate", "datetime", indexes = Seq("year", "month", "day")),
      PredicateSchema("shipdate", "datetime", indexes = Seq("year")),
      PredicateSchema("embedding", "float32vector", indexes = Seq("hnsw")),
      PredicateSchema("dgraph.type", "string", indexes = Seq("exact"), isList = true),
      // uid predicates (edges)
      PredicateSchema("located_in", "uid", reverse = true, count = true),
      PredicateSchema("in_region", "uid", reverse = true),
      PredicateSchema("placed", "uid", isList = true, reverse = true, count = true),
      PredicateSchema("has_line", "uid", isList = true, reverse = true, count = true),
      PredicateSchema("of_part", "uid", reverse = true),
      PredicateSchema("by_supplier", "uid", reverse = true)
    ).map(p => p.name -> p).toMap

    val types = Seq(
      NodeType("Region", Seq("name")),
      NodeType("Nation", Seq("name", "in_region")),
      NodeType("Customer", Seq("name", "mktsegment", "acctbal", "located_in", "placed")),
      NodeType("Supplier", Seq("name", "acctbal", "located_in")),
      NodeType("Part", Seq("name", "brand", "ptype", "size", "retailprice")),
      NodeType("Order", Seq("orderstatus", "orderpriority", "totalprice", "orderdate", "has_line")),
      NodeType("Lineitem", Seq("quantity", "extendedprice", "discount", "returnflag",
        "linestatus", "shipdate", "of_part", "by_supplier")),
      NodeType("Document", Seq("text", "source", "n_chars")),
      NodeType("Embedding", Seq("embedding"))
    ).map(t => t.name -> t).toMap

    new SchemaRegistry(preds, types)
  }
}
