package graft.dialect

/** AST for the reference engine's query dialect (SURVEY §2.8; grammar at
  * reference src/qp/parser/parser.cup:53-268, lexer scaner.lex:37-163).
  *
  * ```
  * query     := SELECT [DISTINCT] (attlist | *) FROM tablelist [WHERE condlist]
  *              [GROUPBY attlist] [ORDERBY attlist [DESC]]
  * attr      := ID "." ID | AGG "(" attr ")"   -- nested: outermost AGG wins
  * AGG       := MAX|MIN|SUM|COUNT|AVG
  * condlist  := cond ("," cond)*            -- comma = AND
  * cond      := attr op "stringlit" | attr op attr
  * op        := < | > | <= | >= | = | !=
  * ```
  *
  * Mirrors reference `src/qp/utils/SQLQuery.java:9-34` (the clause-list IR)
  * but is immutable and minimal — Catalyst is the real IR downstream.
  */
final case class Attr(table: String, column: String, agg: Option[String] = None) {
  /** Output column name, matching the reference's printed header shape
    * (reference src/QueryMain.java:276-290). */
  def outName: String = agg match {
    case Some(a) => s"$a($table.$column)"
    case None    => s"$table.$column"
  }
}

sealed trait Rhs
final case class ConstRhs(value: String) extends Rhs
final case class AttrRhs(attr: Attr) extends Rhs

/** op ∈ {<, >, <=, >=, =, !=} (reference src/qp/utils/Condition.java:9-14). */
final case class Cond(lhs: Attr, op: String, rhs: Rhs)

final case class Query(
    distinct: Boolean,
    star: Boolean,
    attrs: Seq[Attr],
    tables: Seq[String],
    conds: Seq[Cond],
    groupBy: Seq[Attr],
    orderBy: Seq[Attr],
    desc: Boolean)
