package graft.graphql

import org.apache.spark.sql.DataFrame

import graft.core.GraphStore
import graft.exec.DqlExecutor

/** The GraphQL entry point: parse → rewrite to DQL IR → execute on the
  * DataFrame engine. Matches the reference's architecture, where GraphQL
  * is a pure front-end over the DQL execution path
  * (/root/reference/edgraph/server.go:1330 QueryGraphQL feeds the same
  * pipeline as Query; SURVEY.md §3.2).
  */
final class GraphQLEngine(ts: GraphStore, schema: GqlSchema = SdlParser.tpch) {

  /** Run a GraphQL operation, returning the flat (normalized) DataFrame
    * of the last root field.
    */
  def flat(query: String,
      variables: Map[String, GVal] = Map.empty,
      jwt: Map[String, String] = Map.empty): DataFrame =
    new DqlExecutor(ts).flatAst(rewrite(query, variables, jwt))

  /** The DQL IR a query rewrites to (exposed for tests/EXPLAIN).
    * `variables` carries the operation's `$var` values (reference
    * graphql/resolve substitutes them before rewriting).
    */
  def rewrite(query: String,
      variables: Map[String, GVal] = Map.empty,
      jwt: Map[String, String] = Map.empty): graft.dql.DqlQuery =
    Rewriter.rewrite(GqlParser.parse(query, variables), schema, jwt)

  /** Apply a mutation document (add/update/delete roots, in order) to a
    * base triple frame; returns the post-mutation frame.
    */
  def mutate(doc: String, base: DataFrame,
      jwt: Map[String, String] = Map.empty): DataFrame =
    new MutationRewriter(ts, schema, jwt).apply(doc, base)

  private[graphql] def session: org.apache.spark.sql.SparkSession = ts.spark

  /** Open a poll-based subscription (reference graphql/subscription/):
    * validates the `subscription { ... }` document against the schema's
    * @withSubscription types; the returned handle re-executes on
    * [[Subscription.poll]] and emits only when the result changed.
    */
  def subscribe(doc: String,
      variables: Map[String, GVal] = Map.empty,
      jwt: Map[String, String] = Map.empty): Subscription =
    Subscription.open(schema, doc, variables, jwt)

  /** GraphQL-shaped nested JSON: one row per root object (block, uid,
    * json) with only the requested fields — no implicit uid key, single
    * objects for non-list edges, arrays for list edges (reference
    * graphql/resolve completion of the DQL result).
    */
  def json(query: String,
      variables: Map[String, GVal] = Map.empty,
      jwt: Map[String, String] = Map.empty): DataFrame =
    new DqlExecutor(ts).jsonAllAst(rewrite(query, variables, jwt),
      includeUid = false)

  /** GraphQL error propagation (reference graphql/resolve/resolver.go
    * ErrorResponse): parse/rewrite/validation failures come back as the
    * standard `{"errors":[{"message": …}]}` envelope in the same
    * (block, uid, json) frame shape instead of a thrown exception.
    */
  def response(query: String): DataFrame =
    try json(query)
    catch {
      case e @ (_: GqlParser.ParseException | _: Rewriter.RewriteException |
          _: IllegalArgumentException) =>
        val session = ts.spark; import session.implicits._
        val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
          .flatMap {
            case '"' => "\\\""
            case '\\' => "\\\\"
            case '\n' => "\\n"
            case c if c < ' ' => f"\\u${c.toInt}%04x"
            case c => c.toString
          }
        Seq(("errors", 0L, s"""{"errors":[{"message":"$msg"}]}"""))
          .toDF("block", "uid", "json")
    }
}
