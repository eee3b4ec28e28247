package graft.graphql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{GraphStore, TripleFrameStore}
import graft.dql._
import graft.exec.DqlExecutor
import graft.operators.Mutations

/** GraphQL mutations: `add<T>` / `update<T>` / `delete<T>` rewritten onto
  * the batch mutation operators (reference
  * graphql/resolve/mutation_rewriter.go: AddRewriter builds set N-Quads
  * with blank nodes, UpdateRewriter/DeleteRewriter resolve the filter to
  * uids via the query rewriter then emit set/delete N-Quads).
  *
  * The store being append-only parquet, a mutation document transforms a
  * caller-supplied `base` triple frame (subject, predicate, value, lang)
  * and returns the post-mutation frame — the same contract as
  * [[graft.operators.Mutations]]. Mutation inputs are query-document
  * literals (metadata-sized), so building their triple rows driver-side
  * mirrors the reference parsing the mutation on the server; everything
  * that touches data (uid allocation, filter resolution, merges) stays
  * distributed.
  */
final class MutationRewriter(ts: GraphStore, schema: GqlSchema,
    jwt: Map[String, String] = Map.empty,
    onMutate: Option[MutationRewriter.MutateEvent => Unit] = None) {
  import Rewriter.RewriteException
  private val session = ts.spark
  import session.implicits._

  /** The type's @auth rule for mutation phase `op` (update/delete/add),
    * evaluated against this request's claims. update/delete rules gate
    * WHICH nodes the mutation may touch — their residual filter ANDs
    * into the uid resolution below, exactly like the query phase. For
    * `add` the reference post-checks the inserted nodes against the
    * rule (mutation_rewriter.go); here RBAC add rules enforce fully and
    * graph add rules REJECT rather than silently bypass (the
    * post-insert check needs the transaction machinery this engine
    * drops — documented in Auth's scaladoc).
    */
  private def authFor(t: SdlType,
      op: String): Either[Boolean, (FilterNode, Seq[QueryBlock])] =
    t.auth.get(op) match {
      case None => Left(true)
      case Some(node) => Auth.eval(node, jwt) match {
        case Left(b) => Left(b)
        case Right(r) =>
          // residue → filter (+ var blocks for cascaded-path rules,
          // prepended to the uid-resolution query below)
          Right(new Rewriter(schema, jwt).authResidue(r, t))
      }
    }

  private val AddRe = "add([A-Z]\\w*)".r
  private val UpdateRe = "update([A-Z]\\w*)".r
  private val DeleteRe = "delete([A-Z]\\w*)".r

  /** Apply every mutation root in document order to `base`. */
  def apply(doc: String, base: DataFrame): DataFrame =
    GqlParser.parse(doc).roots.foldLeft(base)(applyRoot)

  private def applyRoot(base: DataFrame, root: GqlSelection): DataFrame = {
    val (tname, op) = root.name match {
      case AddRe(t) => (t, "add")
      case UpdateRe(t) => (t, "update")
      case DeleteRe(t) => (t, "delete")
      case other => throw RewriteException(
        s"unknown mutation root '$other' (expected add<T>/update<T>/delete<T>)")
    }
    val t = schema.typ(tname)
    val post = op match {
      case "add" => addMutation(base, root, t)
      case "update" => updateMutation(base, root, t)
      case "delete" => deleteMutation(base, root, t)
    }
    // @lambdaOnMutate webhooks (reference resolve/webhook.go
    // sendWebhookEvent): fire the configured hook with the op + touched
    // root uids AFTER the frame transform. Root uids come from a frame
    // diff (typed adds/deletes, changed-row subjects for updates) —
    // implementation-independent and interactive-scale.
    onMutate.filter(_ => t.lambdaOnMutate.contains(op)).foreach { cb =>
      cb(MutationRewriter.MutateEvent(tname, op,
        rootUidsOf(base, post, tname, op), root))
    }
    post
  }

  /** Root uids a mutation touched, as 0x-hex strings (reference webhook
    * payload rootUIDs): add → typed uids present only after; delete →
    * typed uids present only before; update → typed uids whose rows
    * changed in either direction.
    */
  private def rootUidsOf(base: DataFrame, post: DataFrame, tname: String,
      op: String): Seq[String] = {
    val cols = base.columns.toSet.intersect(post.columns.toSet).toSeq.sorted
    def canon(df: DataFrame) = df.select(cols.map(col): _*)
    def typed(df: DataFrame) = df
      .filter(col("predicate") === "dgraph.type" && col("value") === tname)
      .select(col("subject"))
    val uids = op match {
      case "add" => typed(post).except(typed(base))
      case "delete" => typed(base).except(typed(post))
      case _ =>
        canon(post).except(canon(base))
          .unionByName(canon(base).except(canon(post)))
          .select(col("subject")).distinct()
          .join(typed(base), "subject").select(col("subject"))
    }
    uids.distinct().collect()
      .map(r => "0x" + java.lang.Long.toHexString(r.getLong(0)))
      .sorted.toSeq
  }

  /** Filter → uid set via the query path (func: type(T) @filter(...)).
    * Materialized: the uid set feeds set triples, anti-join subtracts,
    * and deletes — each would otherwise re-embed the whole filter plan.
    */
  private def uidsFor(t: SdlType, filter: Option[GVal],
      op: String): DataFrame = {
    val user = filter.collect { case o: GObj =>
      new Rewriter(schema, jwt).filterFor(o, t)
    }
    val (tree, authVarBlocks) = authFor(t, op) match {
      case Left(true) => (user, Nil)
      case Left(false) =>
        // denied outright: the mutation touches nothing
        return new DqlExecutor(ts).flatAst(DqlQuery(Seq(QueryBlock(
          "q", FuncCall("uid", "", Seq(Rewriter.NoUid)))))).limit(0)
      case Right((af, blocks)) =>
        (Some(user.map(u => FilterAnd(Seq(u, af)): FilterNode).getOrElse(af)),
          blocks)
    }
    new DqlExecutor(ts).flatAst(DqlQuery(authVarBlocks :+ QueryBlock(
      "q", FuncCall("type", t.name, Nil), filter = tree)))
      .localCheckpoint()
  }

  private def scalar(v: GVal): String = v match {
    case GStr(s) => s
    case GNum(s) => s
    case GBool(b) => b.toString
    case GEnum(e) => e
    case other => throw RewriteException(s"expected scalar, got $other")
  }

  /** add<T>(input: [{...}]): blank labels are zero-padded document-order
    * indexes, so allocateUids' label order IS the input order (reference
    * AddRewriter numbers blanks in document order). Edge fields take
    * either `{ id: "0x5" }` — a reference to an EXISTING node — or a
    * nested input object, which becomes its own blank node recursively
    * (reference mutation_rewriter.go handles both through the same
    * rewrite). Edge triples require the base frame to carry an
    * `objectUid` column (the canonical triples shape); a scalar-only
    * base accepts scalar-only adds, as before.
    */
  /** Enforce a type's `add` auth rule. RBAC rules resolve immediately
    * (denied → AuthException). A GRAPH rule can't be checked before the
    * mutation — the nodes aren't linked into the graph yet — so it
    * returns the residual filter for the POST-INSERT check: the
    * reference runs `T(func: uid(newUids)) @filter(authRule)` inside
    * the open transaction and aborts unless every inserted node of the
    * type matches (graphql/resolve/mutation.go:598 authorizeNewNodes).
    * Here the mutation is a pure frame transformation, so throwing
    * before returning the post-mutation frame IS the abort. Checked for
    * the ROOT type and for every NESTED type `walk` creates blank nodes
    * of: the reference post-checks every inserted node's type, so
    * addAuthor(input:{posts: [{...}]}) must not slip Post nodes past
    * Post's add rule.
    */
  private def addAuthRule(
      t: SdlType): Option[(FilterNode, Seq[QueryBlock])] =
    authFor(t, "add") match {
      case Left(true) => None
      case Left(false) => throw new Auth.AuthException(
        s"add${t.name}: not authorized")
      case Right(rule) => Some(rule)
    }

  /** Post-insert graph-rule check over the post-mutation frame (the
    * reference's authorizeNewNodes shape: one
    * `uid(...new uids of this type...) @filter(authRule)` count per
    * created type, var blocks first for cascaded-path rules). Runs each
    * type as its OWN query so generated auth var names never collide.
    */
  private def checkNewNodes(next: DataFrame,
      newByType: Map[String, Seq[Long]],
      rules: Map[String, (FilterNode, Seq[QueryBlock])]): Unit = {
    if (rules.isEmpty) return
    // the tablet views read lang/facets; a canonical base may omit them
    val padded = Seq("lang", "facets").foldLeft(next)((df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast("string")))
    val post = new TripleFrameStore(session, ts.schema, padded, ts.facetKeys)
    rules.toSeq.sortBy(_._1).foreach { case (tn, (filter, varBlocks)) =>
      val uids = newByType.getOrElse(tn, Nil).sorted
      if (uids.nonEmpty) {
        val q = DqlQuery(varBlocks :+ QueryBlock("q",
          FuncCall("uid", "", uids.map(u => s"0x${u.toHexString}")),
          filter = Some(filter)))
        val passed = new DqlExecutor(post).flatAst(q).count()
        if (passed != uids.size)
          throw new Auth.AuthException("authorization failed")
      }
    }
  }

  private def addMutation(base: DataFrame, root: GqlSelection, t: SdlType): DataFrame = {
    val postRules = scala.collection.mutable.Map.empty[
      String, (FilterNode, Seq[QueryBlock])]
    def requireAddAuth(ct: SdlType): Unit =
      if (!postRules.contains(ct.name))
        addAuthRule(ct).foreach(r => postRules(ct.name) = r)
    requireAddAuth(t)
    val inputs = root.arg("input") match {
      case Some(GList(items)) => items
      case Some(o: GObj) => Seq(o)
      case _ => throw RewriteException(s"add${t.name} requires input:")
    }
    // flatten the input forest: scalar rows (label, pred, value), edge
    // rows to existing uids (label, pred, uid literal) and to nested
    // blanks (label, pred, childLabel). Labels number in document order.
    var seq = -1
    def freshLabel(): String = { seq += 1; f"b$seq%05d" }
    val scalars = Seq.newBuilder[(String, String, String)]
    val uidEdges = Seq.newBuilder[(String, String, Long)]
    val blankEdges = Seq.newBuilder[(String, String, String)]
    val typeRows = Seq.newBuilder[(String, String)]
    // @id (xid) existence semantics (reference mutation_rewriter.go:1430
    // rewriteObject + :455 upsert arg): one pre-pass collects every
    // (xid field, value) in the input forest, ONE lookup against the
    // base resolves which already exist — then a top-level existing xid
    // errors (`id X already exists for field F inside type T`) unless
    // `upsert: true` turned the add into an update of that node, and a
    // NESTED existing xid is a reference link (other fields ignored).
    val upsert = root.arg("upsert") match {
      case Some(GBool(b)) => b
      case _ => false
    }
    def xidOf(ot: SdlType): Option[SdlField] =
      ot.fields.find(f => f.isId && f.typeName != "ID")
    val canonicalBase = base.columns.contains("objectUid")
    val wanted = Seq.newBuilder[(String, String)]
    def scan(o: GObj, ot: SdlType): Unit = {
      xidOf(ot).foreach(xf =>
        o.get(xf.name).foreach(v => wanted += ((xf.name, scalar(v)))))
      o.fields.foreach { case (f, v) =>
        ot.field(f).foreach { fd =>
          schema.types.get(fd.typeName).foreach { ct =>
            (v match { case GList(items) => items; case one => Seq(one) })
              .foreach {
                case ro: GObj if ro.get("id").isEmpty => scan(ro, ct)
                case _ =>
              }
          }
        }
      }
    }
    if (canonicalBase)
      inputs.foreach { case o: GObj => scan(o, t); case _ => }
    val wantedPairs = wanted.result().distinct
    val found: Map[(String, String), Long] =
      if (wantedPairs.isEmpty) Map.empty
      else base
        .filter(col("predicate").isin(wantedPairs.map(_._1).distinct: _*) &&
          col("value").isin(wantedPairs.map(_._2).distinct: _*))
        .select(col("predicate"), col("value"), col("subject")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val foundTypes: Map[Long, Set[String]] =
      if (found.isEmpty) Map.empty
      else base
        .filter(col("predicate") === "dgraph.type" &&
          col("subject").isin(found.values.toSeq.distinct: _*))
        .select(col("subject"), col("value")).collect()
        .groupBy(_.getLong(0))
        .map { case (u, rs) => u -> rs.map(_.getString(1)).toSet }
    def existingOf(o: GObj, ot: SdlType): Option[Long] =
      xidOf(ot).flatMap { xf =>
        o.get(xf.name).map(scalar).flatMap { v =>
          found.get((xf.name, v)).map { u =>
            if (!foundTypes.getOrElse(u, Set.empty).contains(ot.name))
              throw RewriteException(s"id $v already exists for field " +
                s"${xf.name} in some other type")
            u
          }
        }
      }
    val fixed = scala.collection.mutable.Map.empty[String, Long]
    def walkInto(o: GObj, ot: SdlType, label: String): Unit =
      o.fields.foreach { case (f, v) =>
        val fd = ot.field(f).getOrElse(
          throw RewriteException(s"${ot.name} has no field '$f'"))
        schema.types.get(fd.typeName) match {
          case Some(ct) =>
            val targets = v match {
              case GList(items) => items
              case one => Seq(one)
            }
            targets.foreach {
              // an input object carrying `id` is a REFERENCE to the
              // existing node — other fields are ignored, matching the
              // reference's rewriteObject (add never deep-updates an
              // existing node)
              case ro: GObj if ro.get("id").isDefined =>
                uidEdges += ((label, f,
                  java.lang.Long.decode(scalar(ro.get("id").get))))
              // a nested input whose @id value already exists is a
              // reference link too (mutation_rewriter.go:1433)
              case ro: GObj if existingOf(ro, ct).isDefined =>
                uidEdges += ((label, f, existingOf(ro, ct).get))
              case ro: GObj =>
                // a nested input creates a blank node of ct — ct's own
                // add rule applies (reference post-checks EVERY inserted
                // node's type, graphql/resolve/add_rewriter.go)
                requireAddAuth(ct)
                blankEdges += ((label, f, walk(ro, ct)))
              case other => throw RewriteException(
                s"bad edge input for $f: $other")
            }
          case None => scalars += ((label, f, scalar(v)))
        }
      }
    def walk(o: GObj, ot: SdlType): String = {
      val label = freshLabel()
      typeRows += ((label, ot.name))
      walkInto(o, ot, label)
      label
    }
    inputs.foreach {
      case o: GObj =>
        existingOf(o, t) match {
          case Some(u) if !upsert =>
            val xf = xidOf(t).get
            throw RewriteException(s"id ${scalar(o.get(xf.name).get)} " +
              s"already exists for field ${xf.name} inside type ${t.name}")
          case Some(u) =>
            // upsert: true — the input UPDATES the existing node: same
            // scalar/edge rows, pinned uid, no new dgraph.type row
            val label = freshLabel()
            fixed(label) = u
            walkInto(o, t, label)
          case None => walk(o, t)
        }
      case other => throw RewriteException(s"bad add input: $other")
    }
    val edgy = uidEdges.result().nonEmpty || blankEdges.result().nonEmpty
    if (edgy && !base.columns.contains("objectUid"))
      throw RewriteException(
        s"add${t.name} with edge fields needs a triples base frame " +
          "with an objectUid column")
    val labels = typeRows.result().map(_._1).toDF("label")
    // allocation must clear BOTH the store's uids and the base frame's —
    // the base carries nodes added by earlier roots of this document or
    // by a prior mutate() over the returned frame; reading only the
    // store tablet re-allocated their uids and silently overwrote them
    val occupied = ts.nodeTypes.select(col("subject"))
      .unionByName(base.select(col("subject")))
    val allocNew = Mutations.allocateUids(labels, "label", occupied)
    // upsert-pinned labels resolve to their EXISTING uids; only genuinely
    // new nodes (the typeRows labels) get allocations
    val allocOf =
      if (fixed.isEmpty) allocNew
      else allocNew.unionByName(fixed.toSeq.toDF("label", "uid"))
    // align any produced frame to the base's columns, null-casting what
    // it lacks — one contract for every base shape
    def full(df: DataFrame) = df.select(base.columns.map(c =>
      if (df.columns.contains(c)) col(c)
      else lit(null).cast(base.schema(c).dataType).as(c)): _*)
    val scalarRows = full(
      scalars.result().toDF("label", "predicate", "value")
        .join(allocOf, Seq("label"))
        .select(col("uid").as("subject"), col("predicate"), col("value")))
    // a canonical triples base gets dgraph.type rows for EVERY new node
    // (scalar-only adds included — a typeless node would be invisible to
    // every type()-seeded query/mutation); the legacy scalar-attr base
    // shape has no type rows to merge into
    val canonical = base.columns.contains("objectUid")
    val typeSet =
      if (!canonical) Nil
      else Seq(full(
        typeRows.result().toDF("label", "value")
          .join(allocOf, Seq("label"))
          .select(col("uid").as("subject"),
            lit("dgraph.type").as("predicate"), col("value"))))
    val edgeRows =
      if (!edgy) Nil
      else Seq(
        full(uidEdges.result().toDF("label", "predicate", "objectUid")
          .join(allocOf, Seq("label"))
          .select(col("uid").as("subject"), col("predicate"),
            col("objectUid"))),
        full(blankEdges.result().toDF("label", "predicate", "child")
          .join(allocOf, Seq("label"))
          .join(allocOf.select(col("label").as("child"),
            col("uid").as("__cu")), Seq("child"))
          .select(col("uid").as("subject"), col("predicate"),
            col("__cu").as("objectUid"))))
    val next = Mutations.applySet(base,
      (Seq(scalarRows) ++ typeSet ++ edgeRows).reduce(_ unionByName _))
    if (postRules.nonEmpty) {
      if (!canonical) throw new Auth.AuthException(
        s"add${t.name}: graph-rule add auth post-check needs a " +
          "canonical triples base frame (objectUid column)")
      // label→uid is document-sized (one row per input literal), so the
      // collect is metadata-scale like the parse itself
      val uidOf = allocOf.select(col("label"), col("uid")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val newByType = typeRows.result()
        .groupBy(_._2).map { case (tn, rows) =>
          tn -> rows.map(r => uidOf(r._1))
        }
      checkNewNodes(next, newByType, postRules.toMap)
    }
    next
  }

  /** update<T>(input: {filter, set, remove}). */
  private def updateMutation(base: DataFrame, root: GqlSelection, t: SdlType): DataFrame = {
    val input = root.arg("input") match {
      case Some(o: GObj) => o
      case _ => throw RewriteException(s"update${t.name} requires input:")
    }
    val uids = uidsFor(t, input.get("filter"), "update")
    var cur = base
    input.get("set").foreach {
      case so: GObj =>
        val sets0 = so.fields.map { case (f, v) =>
          if (t.field(f).isEmpty)
            throw RewriteException(s"${t.name} has no field '$f'")
          uids.select(col("uid").as("subject"), lit(f).as("predicate"),
            lit(scalar(v)).as("value"), lit(null).cast("string").as("lang"))
        }.reduce(_ unionByName _)
        // align to the base's columns (null-cast what the patch lacks):
        // a canonical 6-column base (objectUid, facets) must accept the
        // 4-column scalar patch — same contract as addMutation's full()
        val sets = sets0.select(cur.columns.map(c =>
          if (sets0.columns.contains(c)) col(c)
          else lit(null).cast(cur.schema(c).dataType).as(c)): _*)
        cur = Mutations.applySet(cur, sets)
      case other => throw RewriteException(s"bad update set: $other")
    }
    input.get("remove").foreach {
      case ro: GObj =>
        val dels = ro.fields.map { case (f, _) =>
          uids.select(col("uid").as("subject"), lit(f).as("predicate"))
        }.reduce(_ unionByName _)
        cur = Mutations.applyDelete(cur, dels)
      case other => throw RewriteException(s"bad update remove: $other")
    }
    cur
  }

  /** delete<T>(filter): `S * *` wildcard delete of the matched uids. */
  private def deleteMutation(base: DataFrame, root: GqlSelection, t: SdlType): DataFrame = {
    val uids = uidsFor(t, root.arg("filter"), "delete")
    Mutations.applyDelete(base,
      uids.select(col("uid").as("subject"), lit("*").as("predicate")))
  }
}

object MutationRewriter {
  /** What a @lambdaOnMutate hook sees (reference webhookPayload.event):
    * mutated type, operation, touched root uids, and the raw mutation
    * root (its args carry the input/patch the webhook body includes).
    */
  final case class MutateEvent(typename: String, op: String,
      rootUids: Seq[String], root: GqlSelection)
}
