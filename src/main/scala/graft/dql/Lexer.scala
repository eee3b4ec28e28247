package graft.dql

/** Hand-rolled tokenizer for the DQL grammar subset, mirroring the shape
  * (not the code) of the reference's lexer (/root/reference/lex/, consumed
  * by dql/parser.go). Produces a flat token stream for the recursive
  * descent parser.
  */
sealed trait Token
final case class Ident(s: String) extends Token     // names, keywords
final case class StrLit(s: String) extends Token    // "..."
final case class NumLit(s: String) extends Token    // 123, -1.5, 0x1f
final case class Punct(c: String) extends Token     // ( ) { } : , @ ~ /
object Lexer {

  final case class LexException(msg: String) extends RuntimeException(msg)

  def tokenize(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    def peek(k: Int = 0): Char = if (i + k < n) input(i + k) else '\u0000'
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '#') { while (i < n && input(i) != '\n') i += 1 } // comment
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && input(i) != '"') {
          if (input(i) == '\\' && i + 1 < n) {
            i += 1
            sb.append(input(i) match {
              case 'n' => '\n'; case 't' => '\t'; case other => other
            })
          } else sb.append(input(i))
          i += 1
        }
        if (i >= n) throw LexException("unterminated string literal")
        i += 1
        out += StrLit(sb.result())
      } else if (c == '/' && peek(1) != ' ' && lastWasRegexContext(out.result())) {
        // regex literal /.../flags in regexp(pred, /re/i): kept in the
        // raw `/re/flags` form (the executor unwraps and validates the
        // modifier — reference dql/parser.go regex arg + query3
        // TestFilterRegex11/14 flag semantics)
        val sb = new StringBuilder
        i += 1
        // backslash escapes the next char — `\/` does NOT close the
        // literal (reference TestParseRegexp6: `/pattern\/` must be an
        // unterminated-regex error, not an early close)
        while (i < n && input(i) != '/') {
          if (input(i) == '\\' && i + 1 < n) { sb.append(input(i)); i += 1 }
          sb.append(input(i)); i += 1
        }
        if (i >= n) throw LexException("unterminated regex literal")
        i += 1
        val fb = new StringBuilder
        while (i < n && input(i).isLetter) { fb.append(input(i)); i += 1 }
        out += StrLit("/" + sb.result() + "/" + fb.result())
      } else if (c.isDigit || (c == '-' && peek(1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (input(i).isLetterOrDigit || input(i) == '.' ||
          input(i) == '-' || input(i) == ':')) i += 1 // covers 0x.., dates, floats
        out += NumLit(input.substring(start, i))
      } else if (c.isLetter || c == '_') {
        // '-' continues a name only when glued to a following name char —
        // hyphenated predicates (tweet-a, index-pred1) are legal in the
        // reference's lexer; binary minus in math() therefore needs
        // spaces, same as the reference
        val start = i
        // right after an attached '@' we are lexing a LANGUAGE tag:
        // '-' before a digit continues it (BCP47 es-419, reference
        // state_test.go TestNumberInLang) — everywhere else that is a
        // math subtraction
        val inLangTag = {
          val sofar = out.result()
          sofar.lastOption.contains(Punct("@@"))
        }
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_' ||
          input(i) == '.' ||
          // '-' continues only before a LETTER: tweet-a is a name,
          // f-2 in math() is a subtraction (dgraph's lexer resolves the
          // same ambiguity contextually; names ending in -<digit> would
          // need spaces here, as the reference's index-pred1 shows the
          // digit glued to the letter)
          (input(i) == '-' && i + 1 < n &&
            (input(i + 1).isLetter || input(i + 1) == '_' ||
              (inLangTag && input(i + 1).isDigit))))) i += 1
        out += Ident(input.substring(start, i))
      } else if (c == '$' && (peek(1).isLetter || peek(1) == '_')) {
        // $var — a DQL query variable reference (dql/vars.go)
        val start = i
        i += 1
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        out += Ident(input.substring(start, i))
      } else if (c == '<' && iriContext(out.result()) &&
          input.indexOf('>', i) > i) {
        // <http://...> IRI predicate name (reference TestParseIRIRef):
        // only in name positions — after '{', '(', ',', '~', '[' —
        // never where a math '<' can appear (those follow idents,
        // numbers or ')')
        val end = input.indexOf('>', i)
        out += Ident(input.substring(i + 1, end))
        i = end + 1
      } else if ("<>=!".indexOf(c) >= 0) {
        // math comparison operators; two-char forms first
        val two = s"$c${peek(1)}"
        if (two == "<=" || two == ">=" || two == "==" || two == "!=") {
          out += Punct(two); i += 2
        } else if (c == '<' || c == '>') { out += Punct(c.toString); i += 1 }
        else if (c == '=') { out += Punct("="); i += 1 } // var defaults
        else throw LexException(s"unexpected character '$c' at offset $i")
      } else if (c == '@' && i > 0 && (input(i - 1).isLetterOrDigit ||
          input(i - 1) == '_')) {
        // ATTACHED '@' (no whitespace before it) is the language-tag
        // position (`name@en`); a spaced '@' is a directive. The
        // reference's lexer makes the same distinction, which is how
        // `friends @filtererr` is an unknown-directive ERROR while
        // `friends@ta` is a lang (TestParseFilter_unknowndirectiveError1)
        out += Punct("@@"); i += 1
      } else if ("(){}:,@~*+-/.%[]".indexOf(c) >= 0) {
        // '.' only reaches here standalone (numbers/idents consume
        // embedded dots greedily) — used by the @. lang tag
        out += Punct(c.toString); i += 1
      } else throw LexException(s"unexpected character '$c' at offset $i")
    }
    out.result()
  }

  /** A '/' starts a regex literal only right after '(' or ',' (i.e. as a
    * function argument, the only regex position in the grammar).
    */
  private def lastWasRegexContext(ts: Vector[Token]): Boolean =
    ts.lastOption match {
      case Some(Punct("(")) | Some(Punct(",")) => true
      case _ => false
    }

  /** A '<' starts an IRI name only in predicate-name positions. */
  private def iriContext(ts: Vector[Token]): Boolean =
    ts.lastOption match {
      case Some(Punct("{")) | Some(Punct("(")) | Some(Punct(",")) |
           Some(Punct("~")) | Some(Punct("[")) => true
      case _ => false
    }
}
