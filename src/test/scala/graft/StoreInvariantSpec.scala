package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TripleStore

/** Cross-file invariants the wide-read frontier pruning rests on.
  *
  * attrWide's union pruning is sound only if (a) every (table, pred)
  * the wideRegistry declares is also declared by the schema's node
  * types — the executor's ownerTypes() hint comes from the schema, so a
  * registry owner missing there would be pruned away and read back as
  * false typed nulls for valid subjects — and (b) edgeTargetTypes
  * matches the uid bands the edges construction actually emits, or a
  * traversal hop would carry the wrong frontier identity into the next
  * wide read. Both were previously unchecked conventions between
  * TripleStore, Schema, and DqlExecutor; this spec pins them to the
  * data itself at sf0.001.
  */
final class StoreInvariantSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val ts = TripleStore(spark, sf)

  test("wideRegistry owners == schema owner types, per predicate") {
    val regOwners = ts.wideRegistry
      .flatMap { case (ty, _, _, cols) => cols.map { case (p, _) => p -> ty } }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(regOwners.nonEmpty)
    def schemaOwners(p: String): Set[String] =
      ts.schema.types.values.collect {
        case t if t.predicates.contains(p) => t.name
      }.toSet
    for ((p, owners) <- regOwners)
      assert(owners == schemaOwners(p),
        s"pred '$p': wideRegistry owners $owners != schema ${schemaOwners(p)} " +
          "— a table storing a pred the schema's types don't declare is " +
          "silently pruned out of the wide union (false typed nulls)")
  }

  test("edgeTargetTypes matches the actual object uid bands of edges") {
    val edgePreds = ts.edges.select(col("predicate")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    assert(edgePreds.nonEmpty)
    val nt = ts.nodeTypes
    for (p <- edgePreds) {
      val actual = ts.edges.filter(col("predicate") === p)
        .select(col("object").as("subject")).distinct()
        .join(nt, "subject").select(col("typeName")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(actual == ts.edgeTargetTypes(p),
        s"edge '$p': data targets $actual != declared ${ts.edgeTargetTypes(p)}")
      // every object uid resolved to a type — an object outside all
      // bands would silently vanish from the join above
      val orphan = ts.edges.filter(col("predicate") === p)
        .select(col("object").as("subject")).distinct()
        .join(nt, Seq("subject"), "left_anti").count()
      assert(orphan == 0, s"edge '$p': $orphan object uids in no type band")
    }
  }

  test("edgeObjectsUnique predicates really have globally unique objects") {
    val edgePreds = ts.edges.select(col("predicate")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val declared = edgePreds.filter(ts.edgeObjectsUnique)
    assert(declared.nonEmpty, "no edge declares unique objects — the " +
      "groupby dedup-skip fast path would be dead code")
    for (p <- declared) {
      val e = ts.edges.filter(col("predicate") === p).select(col("object"))
      val total = e.count()
      val distinct = e.distinct().count()
      assert(total == distinct,
        s"edge '$p' declares edgeObjectsUnique but has $total rows over " +
          s"$distinct distinct objects — the skipped dedup was load-bearing")
    }
  }

  test("attrSubjectUnique tablets are unique per (subject, lang)") {
    val declared = ts.schema.predicates.keys.toSeq.sorted
      .filter(ts.attrSubjectUnique)
      .filter(p => Set("string", "default", "int", "float", "datetime")
        .contains(ts.schema.pred(p).dgraphType))
    assert(declared.nonEmpty, "no predicate declares attrSubjectUnique — " +
      "the seed dedup-skip fast path would be dead code")
    for (p <- declared) {
      val a = ts.attr(p)
      val keyed =
        if (a.columns.contains("lang"))
          a.select(col("subject"), col("lang"))
        else a.select(col("subject"))
      val total = keyed.count()
      val uniq = keyed.distinct().count()
      assert(total == uniq,
        s"attr '$p' declares attrSubjectUnique but has $total rows over " +
          s"$uniq distinct keys — the skipped seed dedup was load-bearing")
    }
  }
}
