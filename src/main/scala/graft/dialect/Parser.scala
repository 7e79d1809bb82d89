package graft.dialect

/** Hand-rolled tokenizer + recursive-descent parser for the dialect in
  * [[Ast]]. The grammar is ~15 productions (reference parser.cup is
  * CUP-generated; we don't need a parser generator for this).
  *
  * Faithful to the reference lexer (scaner.lex): case-sensitive keywords,
  * identifiers `[A-Za-z_][A-Za-z0-9_]*` (underscore is a legal first
  * character), constants always double-quoted strings whose CHAR class
  * admits backslash escapes — the reference strips only the outer quotes
  * and keeps the escape bytes verbatim (scaner.lex STRINGLIT action), so
  * we do the same — coerced to column type later, comma = AND in WHERE.
  * Aggregate attributes nest grammatically (`MAX(MIN(T.a))`); the
  * reference's cup action overwrites the agg type on the same Attribute
  * object, so the OUTERMOST aggregate wins (parser.cup attribute
  * productions) — reproduced here.
  */
object Parser {

  private val Keywords = Set("SELECT", "DISTINCT", "FROM", "WHERE",
    "GROUPBY", "ORDERBY", "DESC")
  private val Aggs = Set("MAX", "MIN", "SUM", "COUNT", "AVG")
  private val Ops = Seq("<=", ">=", "!=", "=", "<", ">") // longest first

  sealed private trait Tok
  private case class Kw(s: String) extends Tok
  private case class Id(s: String) extends Tok
  private case class Agg(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Op(s: String) extends Tok
  private case class Sym(c: Char) extends Tok // . , ( ) *

  private def tokenize(input: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        val word = input.substring(start, i)
        toks += (if (Keywords(word)) Kw(word)
                 else if (Aggs(word)) Agg(word)
                 else Id(word))
      } else if (c == '"') {
        // scan to the closing quote, honoring backslash escapes; like the
        // reference lexer, keep the escape characters verbatim
        var j = i + 1
        while (j < n && input(j) != '"') {
          if (input(j) == '\\' && j + 1 < n) j += 2 else j += 1
        }
        require(j < n, s"unterminated string literal at offset $i")
        toks += Str(input.substring(i + 1, j))
        i = j + 1
      } else {
        Ops.find(op => input.startsWith(op, i)) match {
          case Some(op) => toks += Op(op); i += op.length
          case None =>
            require(".,()*".indexOf(c) >= 0, s"unexpected character '$c' at offset $i")
            toks += Sym(c); i += 1
        }
      }
    }
    toks.result()
  }

  final private class Cursor(toks: Vector[Tok]) {
    private var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def accept(t: Tok): Boolean = if (peek.contains(t)) { pos += 1; true } else false
    def expect(t: Tok): Unit =
      require(accept(t), s"expected $t but found $peek at token $pos")
    def id(): String = next() match {
      case Id(s) => s
      case other => sys.error(s"expected identifier, found $other")
    }
  }

  private def attr(c: Cursor): Attr = c.next() match {
    case Agg(a) =>
      c.expect(Sym('('))
      val inner = attr(c) // grammar recursion: MAX(MIN(T.a)) is legal
      c.expect(Sym(')'))
      inner.copy(agg = Some(a)) // reference setAggType overwrite: outer wins
    case Id(t) =>
      c.expect(Sym('.'))
      Attr(t, c.id())
    case other => sys.error(s"expected attribute, found $other")
  }

  private def attrList(c: Cursor): Seq[Attr] = {
    val out = Seq.newBuilder[Attr]
    out += attr(c)
    while (c.accept(Sym(','))) out += attr(c)
    out.result()
  }

  private def cond(c: Cursor): Cond = {
    val lhs = attr(c)
    val op = c.next() match {
      case Op(o)  => o
      case other  => sys.error(s"expected comparison op, found $other")
    }
    val rhs = c.peek match {
      case Some(Str(v)) => c.next(); ConstRhs(v)
      case _            => AttrRhs(attr(c))
    }
    Cond(lhs, op, rhs)
  }

  def parse(input: String): Query = {
    val c = new Cursor(tokenize(input))
    c.expect(Kw("SELECT"))
    val distinct = c.accept(Kw("DISTINCT"))
    val (star, attrs) =
      if (c.accept(Sym('*'))) (true, Nil)
      else (false, attrList(c))
    c.expect(Kw("FROM"))
    val tables = Seq.newBuilder[String]
    tables += c.id()
    while (c.accept(Sym(','))) tables += c.id()
    val conds =
      if (c.accept(Kw("WHERE"))) {
        val cs = Seq.newBuilder[Cond]
        cs += cond(c)
        while (c.accept(Sym(','))) cs += cond(c)
        cs.result()
      } else Nil
    val groupBy = if (c.accept(Kw("GROUPBY"))) attrList(c) else Nil
    val orderBy = if (c.accept(Kw("ORDERBY"))) attrList(c) else Nil
    val desc = c.accept(Kw("DESC"))
    require(c.peek.isEmpty, s"trailing tokens after query: ${c.peek}")
    Query(distinct, star, attrs, tables.result(), conds, groupBy, orderBy, desc)
  }
}
