package graft.graphql

/** GraphQL `@auth` query rules (reference graphql/schema/auth.go +
  * graphql/resolve/auth_query_test.yaml): a type's `@auth(query: ...)`
  * directive carries a rule tree of
  *
  *  - RBAC rules — `{ rule: "{$CLAIM: { eq: \"value\" }}" }` — evaluated
  *    on the driver purely from the request's JWT claims, statically
  *    true or false;
  *  - graph rules — `{ rule: "query($USER: String!) { queryT(filter:
  *    {owner: {eq: $USER}}) { __typename } }" }` — whose root filter is
  *    AND-injected into the rewritten DQL (the reference injects the
  *    same filter as an extra uid-var block; on Spark the conjunct
  *    reaches the parquet scan as a pushed predicate);
  *  - `and: [...]` / `or: [...]` / `not: {...}` composition.
  *
  * Evaluation semantics follow the reference's auth resolver: a type
  * whose rule evaluates false renders EMPTY at the root and is OMITTED
  * as a nested field (auth_query_test.yaml "Deep RBAC rule - Level 1
  * false"); a missing claim makes an RBAC rule false; a type with no
  * `@auth` is open.
  *
  * Mutation-phase rules (MutationRewriter): update/delete rules AND
  * into the mutation's uid resolution — only authorized nodes mutate;
  * RBAC add rules gate add<T> outright, and graph-rule add auth
  * REJECTS (the reference post-checks inserted nodes inside its
  * transaction, machinery this engine drops).
  *
  * Out of scope, documented: JWT signature verification (the engine
  * accepts pre-verified claims; [[Auth.claimsFromJwt]] decodes an
  * unverified payload for tests) and the closed-by-default flag.
  */
object Auth {

  sealed trait Node
  /** Raw rule string — RBAC object or graph query, classified at eval. */
  final case class Rule(rule: String) extends Node
  final case class And(nodes: Seq[Node]) extends Node
  final case class Or(nodes: Seq[Node]) extends Node
  final case class Not(node: Node) extends Node

  final case class AuthException(msg: String) extends RuntimeException(msg)

  /** Residual (non-static) constraint left after claim substitution:
    *  - [[RFilter]]: a plain root filter object to AND in;
    *  - [[RPath]]: a CASCADED-PATH rule — the constraint lives in the
    *    rule's nested selections (reference auth_query_test.yaml
    *    "Auth with deep filter": `queryProject { roles(filter:
    *    {permission:{eq:VIEW}}) { assignedTo(filter:{username:{eq:
    *    $USER}}) } }` admits only nodes where the WHOLE path exists —
    *    the reference rewrites it to a @cascade'd var chain, and so
    *    does [[Rewriter]]);
    *  - [[RAnd]]/[[ROr]]/[[RNot]]: boolean composition of residues.
    */
  sealed trait Residue
  final case class RFilter(f: GObj) extends Residue
  final case class RPath(root: GqlSelection) extends Residue
  final case class RAnd(rs: Seq[Residue]) extends Residue
  final case class ROr(rs: Seq[Residue]) extends Residue
  final case class RNot(r: Residue) extends Residue

  /** Evaluation result: either a static boolean (pure RBAC) or a
    * residual constraint to inject.
    */
  type Result = Either[Boolean, Residue]

  // ---- directive parsing ----

  /** Parse the argument text of `@auth(...)` (without the outer parens)
    * and return the rule tree per operation name (query/add/update/
    * delete).
    */
  def parseDirective(args: String): Map[String, Node] = {
    val p = new P(args)
    val out = Map.newBuilder[String, Node]
    p.ws()
    while (!p.eof) {
      val op = p.name()
      p.expect(':')
      out += op -> p.node()
      p.ws()
      if (!p.eof && p.peek == ',') { p.next(); p.ws() }
    }
    out.result()
  }

  /** Tiny recursive-descent parser for the auth argument object syntax:
    * `{ rule: "<string or triple-quoted block>" }`, `{ and: [...] }`,
    * `{ or: [...] }`, `{ not: {...} }`.
    */
  private final class P(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def next(): Char = { val c = s.charAt(i); i += 1; c }
    def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      ws()
      if (eof || next() != c) throw AuthException(
        s"@auth parse: expected '$c' at offset $i in: $s")
    }
    def name(): String = {
      ws()
      val b = new StringBuilder
      while (!eof && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
          s.charAt(i) == '$')) b.append(next())
      if (b.isEmpty) throw AuthException(
        s"@auth parse: expected a name at offset $i")
      b.result()
    }
    def str(): String = {
      ws()
      if (s.startsWith("\"\"\"", i)) {
        i += 3
        val end = s.indexOf("\"\"\"", i)
        if (end < 0) throw AuthException("@auth parse: unterminated \"\"\"")
        val out = s.substring(i, end); i = end + 3; out
      } else {
        expect('"')
        val b = new StringBuilder
        while (!eof && peek != '"') {
          val c = next()
          if (c == '\\' && !eof) b.append(next()) else b.append(c)
        }
        expect('"')
        b.result()
      }
    }
    def node(): Node = {
      ws(); expect('{'); ws()
      val key = name()
      expect(':')
      val out = key match {
        case "rule" => Rule(str())
        case "and" => And(list())
        case "or" => Or(list())
        case "not" => Not(node())
        case other => throw AuthException(s"@auth parse: unknown key $other")
      }
      ws()
      if (!eof && peek == ',') { next(); ws() }
      expect('}')
      out
    }
    /** One scalar or a [list] of scalars — strings, numbers, or bare
      * tokens (true/false/enum values).
      */
    def scalars(): Seq[String] = {
      ws()
      if (peek == '[') {
        next()
        val out = Seq.newBuilder[String]
        ws()
        while (!eof && peek != ']') {
          out += scalar()
          ws()
          if (!eof && peek == ',') { next(); ws() }
        }
        expect(']')
        out.result()
      } else Seq(scalar())
    }
    private def scalar(): String = {
      ws()
      if (peek == '"' || s.startsWith("\"\"\"", i)) str()
      else {
        val b = new StringBuilder
        while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '.' ||
            peek == '-' || peek == '+')) b.append(next())
        if (b.isEmpty) throw AuthException(
          s"@auth parse: expected a scalar at offset $i")
        b.result()
      }
    }
    def list(): Seq[Node] = {
      ws(); expect('[')
      val out = Seq.newBuilder[Node]
      ws()
      while (!eof && peek != ']') {
        out += node()
        ws()
        if (!eof && peek == ',') { next(); ws() }
      }
      expect(']')
      out.result()
    }
  }

  // ---- evaluation ----

  /** Evaluate a rule tree against the request's JWT claims. `Left(b)` is
    * a static verdict; `Right(filterObj)` a residual graph filter for
    * the rewriter to AND in.
    */
  def eval(node: Node, jwt: Map[String, String]): Result = node match {
    case Rule(raw) => evalRule(raw.trim, jwt)
    case And(ns) =>
      val rs = ns.map(eval(_, jwt))
      if (rs.exists(_ == Left(false))) Left(false)
      else rs.collect { case Right(f) => f } match {
        case Seq() => Left(true)
        case Seq(one) => Right(one)
        case many => Right(RAnd(many))
      }
    case Or(ns) =>
      val rs = ns.map(eval(_, jwt))
      if (rs.exists(_ == Left(true))) Left(true)
      else rs.collect { case Right(f) => f } match {
        case Seq() => Left(false)
        case Seq(one) => Right(one)
        case many => Right(ROr(many))
      }
    case Not(n) => eval(n, jwt) match {
      case Left(b) => Left(!b)
      case Right(f) => Right(RNot(f))
    }
  }

  /** A rule is RBAC iff it is an object whose first key is a $claim;
    * anything else ("query ..." or an anonymous "{ queryT(...) ... }"
    * document) is a graph rule.
    */
  private def isRbac(raw: String): Boolean =
    raw.startsWith("{") &&
      raw.drop(1).dropWhile(_.isWhitespace).startsWith("$")

  private def evalRule(raw: String, jwt: Map[String, String]): Result =
    if (!isRbac(raw)) {
      // graph rule: a GraphQL query whose root filter is the constraint.
      // JWT claims substitute the operation's $variables (reference
      // substitutes the authorization payload the same way). Multi-valued
      // claims (see [[MultiSep]]) substitute as lists, so `in: $GROUPS`
      // style filters see every element.
      val vars: Map[String, GVal] = jwt.map { case (k, v) =>
        k -> (if (v.indexOf(MultiSep) >= 0)
          GList(v.split(MultiSep).toSeq.map(GStr)) else GStr(v))
      }
      // a rule whose required $claim is ABSENT from the JWT cannot be
      // satisfied — the reference returns no results for that type
      // (auth e2e: missing JWT variable ⇒ empty), so the rule is FALSE
      val op = try GqlParser.parse(raw, vars) catch {
        case _: GqlParser.ParseException => return Left(false)
      }
      val root = op.roots.headOption.getOrElse(
        throw AuthException("@auth graph rule has no root field"))
      // constraint in the SELECTION TREE (any real nested field — not
      // just __typename riders) ⇒ cascaded-path semantics: the rule
      // admits only nodes where the whole path exists. Returning a
      // root-filter-only residue here would silently grant unrestricted
      // access for the reference's canonical nested-rule pattern.
      val constraining = root.children.filterNot(_.name == "__typename")
      if (constraining.nonEmpty) Right(RPath(root))
      else root.arg("filter") match {
        case Some(o: GObj) => Right(RFilter(o))
        case _ =>
          // a filterless, selection-less graph rule constrains nothing
          // beyond the type
          Left(true)
      }
    } else {
      // RBAC rule: {$CLAIM: { eq: "v" }} / { in: [...] } — pure claim
      // comparison (reference schema/auth.go EvaluateRBACRule; a missing
      // claim is FALSE). $-prefixed keys are not GraphQL names, so this
      // parses with the directive mini-parser, not GqlParser.
      Left(evalRbac(raw, jwt))
    }

  private def evalRbac(raw: String, jwt: Map[String, String]): Boolean = {
    val p = new P(raw)
    p.expect('{')
    var verdict = true
    p.ws()
    while (!p.eof && p.peek != '}') {
      val claim = p.name()
      if (!claim.startsWith("$")) throw AuthException(
        s"@auth RBAC rule: expected a $$claim key, got $claim")
      p.expect(':'); p.expect('{')
      val op = p.name()
      p.expect(':')
      val vals = p.scalars()
      // a multi-valued claim (array in the JWT — groups/roles lists,
      // exactly what RBAC `in` is designed for) matches if ANY element
      // does (reference EvaluateRBACRule iterates array claims)
      val actualVals = jwt.get(claim.stripPrefix("$")).toSeq
        .flatMap(_.split(MultiSep))
      val ok = op match {
        case "eq" => vals.length == 1 && actualVals.contains(vals.head)
        case "in" => actualVals.exists(vals.contains)
        case other => throw AuthException(
          s"@auth RBAC rule: unsupported op $other")
      }
      verdict &&= ok
      p.ws(); if (!p.eof && p.peek == ',') { p.next(); p.ws() }
      p.expect('}')
      p.ws(); if (!p.eof && p.peek == ',') { p.next(); p.ws() }
    }
    verdict
  }

  /** Separator encoding a multi-valued (JSON array) claim inside the
    * flat claims map — NUL can't occur in JSON string content that
    * matters for auth values, and both RBAC eval and graph-rule var
    * substitution split on it.
    */
  val MultiSep = '\u0000'

  // ---- JWT signature verification (reference graphql/authorization/
  // auth.go: HMAC shared secret or RSA public key configured via the
  // `# Dgraph.Authorization` magic comment; JWK-URL fetch is network
  // plumbing and stays out of scope) ----

  sealed trait JwtKey
  /** HS256 shared secret. */
  final case class HmacSecret(secret: String) extends JwtKey
  /** RS256 public key, PEM (`-----BEGIN PUBLIC KEY-----`) or bare
    * base64 DER (X.509 SubjectPublicKeyInfo).
    */
  final case class RsaPublicPem(pem: String) extends JwtKey

  /** Verify `token`'s signature (and `exp`, when present) against `key`,
    * then decode its claims. alg comes from the token header and must
    * match the key type — `none` and mismatches reject (reference
    * validates through jwt-go's Keyfunc the same way).
    */
  def verifiedClaims(token: String, key: JwtKey,
      nowEpochSeconds: Long = System.currentTimeMillis() / 1000): Map[String, String] = {
    val parts = token.split('.')
    if (parts.length != 3) throw AuthException(
      "malformed JWT: expected header.payload.signature")
    val dec = java.util.Base64.getUrlDecoder
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val header = om.readTree(new String(dec.decode(parts(0)), "UTF-8"))
    val alg = Option(header.get("alg")).map(_.asText()).getOrElse("")
    val signingInput = (parts(0) + "." + parts(1)).getBytes("UTF-8")
    val sig = dec.decode(parts(2))
    val ok = (alg, key) match {
      case ("HS256", HmacSecret(secret)) =>
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          secret.getBytes("UTF-8"), "HmacSHA256"))
        // constant-time compare — a plain == leaks a timing oracle
        java.security.MessageDigest.isEqual(mac.doFinal(signingInput), sig)
      case ("RS256", RsaPublicPem(pem)) =>
        val der = java.util.Base64.getMimeDecoder.decode(
          pem.replace("-----BEGIN PUBLIC KEY-----", "")
            .replace("-----END PUBLIC KEY-----", "")
            .replaceAll("\\s", ""))
        val pub = java.security.KeyFactory.getInstance("RSA")
          .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
        val v = java.security.Signature.getInstance("SHA256withRSA")
        v.initVerify(pub)
        v.update(signingInput)
        v.verify(sig)
      case (a, k) => throw AuthException(
        s"JWT alg '$a' does not match the configured ${k.getClass.getSimpleName}")
    }
    if (!ok) throw AuthException("JWT signature verification failed")
    val payload = om.readTree(new String(dec.decode(parts(1)), "UTF-8"))
    Option(payload.get("exp")).filter(_.isNumber).foreach { e =>
      if (e.asLong() < nowEpochSeconds) throw AuthException("JWT expired")
    }
    claimsFromJwt(token)
  }

  /** Decode the claims of a JWT payload — NO signature verification
    * (key configuration is deployment plumbing; production callers pass
    * verified claims). Custom-claim objects flatten one level, matching
    * the reference's namespaced custom claims; ARRAY claims (groups /
    * roles lists) keep every element, joined with [[MultiSep]] (a bare
    * asText() would flatten them to "" and silently fail every rule).
    */
  def claimsFromJwt(token: String): Map[String, String] = {
    val parts = token.split('.')
    if (parts.length < 2) throw AuthException("malformed JWT")
    val json = new String(
      java.util.Base64.getUrlDecoder.decode(parts(1)), "UTF-8")
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def render(v: com.fasterxml.jackson.databind.JsonNode): String =
      if (v.isArray) {
        val b = Seq.newBuilder[String]
        v.forEach(x => b += x.asText())
        b.result().mkString(MultiSep.toString)
      } else v.asText()
    val out = Map.newBuilder[String, String]
    m.properties().forEach { e =>
      val v = e.getValue
      if (v.isObject)
        v.properties().forEach(e2 =>
          out += e2.getKey -> render(e2.getValue))
      else out += e.getKey -> render(v)
    }
    out.result()
  }
}
