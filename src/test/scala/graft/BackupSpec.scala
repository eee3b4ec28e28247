package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.TripleStore
import graft.operators.Backup

/** Backup frame parity: the store-optimized melted frame
  * (TripleStore.backupTriples — one scan per source table) must be
  * row-for-row identical to the store-agnostic generic union
  * (Backup.genericTripleFrame — one branch per tablet). Any divergence in
  * value/facet string formatting silently corrupts restores, so this is
  * asserted as a multiset equality, full and selective.
  */
class BackupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  lazy val sf = "/root/testdata/sf0.001"
  lazy val store = TripleStore(spark, sf)

  private def assertParity(only: Set[String]): Unit = {
    val g = Backup.genericTripleFrame(store, only)
    val m = store.backupTriples(only).getOrElse(fail("melted frame missing"))
    assert(m.schema.fieldNames.toSeq == g.schema.fieldNames.toSeq)
    val gOnly = g.exceptAll(m).count()
    val mOnly = m.exceptAll(g).count()
    assert(gOnly == 0 && mOnly == 0,
      s"backup frame mismatch (only=$only): generic-only=$gOnly melted-only=$mOnly")
    assert(m.count() > 0)
  }

  test("melted backup frame == generic tablet union (full)") {
    assertParity(Set.empty)
  }

  test("melted backup frame == generic tablet union (selective)") {
    assertParity(Set("mktsegment", "name", "placed", "dgraph.type"))
  }

  test("selective melt covers edges-with-facets and typed attrs") {
    assertParity(Set("has_line", "quantity", "orderdate", "size", "text"))
  }
}
