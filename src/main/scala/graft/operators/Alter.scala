package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.GraphStore
import graft.functions.Tokenizer

/** Index rebuild orchestration after `/alter` (reference
  * posting/index.go:875 rebuildTokIndex: a full tablet scan re-tokenizing
  * every value into index keys).
  *
  * The Spark analogue of a token index is a (token, subject) posting
  * frame derived from the predicate's attribute tablet — one distributed
  * scan + explode, shuffled only by the final distinct on (token,
  * subject). At cluster scale the result is written bucketed by token
  * (core/Bucketing) so an index probe is a single-bucket read, the same
  * access path the reference's Badger prefix scan gives a token posting
  * list.
  */
object Alter {

  /** Rebuild the token index for `pred` using `tok`. */
  def rebuildIndex(ts: GraphStore, pred: String, tok: Tokenizer): DataFrame =
    ts.attr(pred)
      .select(explode(tok.tokens(col("value"))).as("token"), col("subject"))
      .distinct()
}
