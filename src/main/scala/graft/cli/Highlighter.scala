package graft.cli

/** ANSI syntax highlighting for the interactive buffer (reference
  * internal/interactive/highlighter.go:1-35, which runs a chroma SQL
  * lexer over the prompt document and ANSI-formats the tokens). Same
  * shape here: a small SQL lexer over the line, each token class
  * wrapped in its ANSI color, everything else passed through verbatim
  * — so `stripAnsi(highlight(s)) == s` always holds and the colored
  * buffer can replace the plain one in any line editor. Like
  * [[Repl.complete]], this is the data source for a terminal editor;
  * plain-stdin sessions never call it.
  *
  * Token classes and colors (chroma's `monokai`-ish terminal set):
  * keywords bright blue, strings green, numbers cyan, comments dim
  * gray, dot-commands magenta.
  */
object Highlighter {

  private val Reset = "[0m"
  private val Keyword = "[94m"
  private val Str = "[32m"
  private val Num = "[36m"
  private val Comment = "[90m"
  private val Meta = "[35m"

  /** SQL keywords recognized (upper-cased match, any input case). */
  private val Keywords = Set(
    "select", "from", "where", "group", "by", "order", "limit", "offset",
    "join", "inner", "left", "right", "full", "outer", "cross", "semi",
    "anti", "on", "using", "union", "all", "intersect", "except", "with",
    "as", "distinct", "having", "case", "when", "then", "else", "end",
    "and", "or", "not", "in", "exists", "between", "like", "ilike", "is",
    "null", "true", "false", "cast", "over", "partition", "rows", "range",
    "preceding", "following", "current", "row", "unbounded", "asc",
    "desc", "nulls", "first", "last", "values", "insert", "into",
    "create", "table", "view", "drop", "describe", "show", "explain",
    "qualify", "filter", "interval", "pivot", "unpivot")

  /** Highlight one buffer line. */
  def highlight(line: String): String = {
    val t = line.trim
    if (t.startsWith(".")) {
      // dot-command: color the command word, leave arguments plain
      val i = line.indexOf('.')
      val end0 = line.indexWhere(_.isWhitespace, i)
      val end = if (end0 < 0) line.length else end0
      line.substring(0, i) + Meta + line.substring(i, end) + Reset +
        line.substring(end)
    } else highlightSql(line)
  }

  private def highlightSql(line: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = line.length
    while (i < n) {
      val c = line(i)
      if (c == '-' && i + 1 < n && line(i + 1) == '-') {
        out ++= Comment ++= line.substring(i) ++= Reset
        i = n
      } else if (c == '\'' || c == '"') {
        // quoted run; '' escapes inside single quotes (SQL)
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (line(i) == c) {
            if (c == '\'' && i + 1 < n && line(i + 1) == '\'') i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
        out ++= Str ++= line.substring(start, i) ++= Reset
      } else if (c.isDigit) {
        val start = i
        while (i < n && (line(i).isDigit || line(i) == '.')) i += 1
        out ++= Num ++= line.substring(start, i) ++= Reset
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (line(i).isLetterOrDigit || line(i) == '_')) i += 1
        val word = line.substring(start, i)
        if (Keywords.contains(word.toLowerCase)) // never a column ref:
          // a word followed by '(' is a function call, not a keyword
          if (i < n && line(i) == '(') out ++= word
          else out ++= Keyword ++= word ++= Reset
        else out ++= word
      } else {
        out += c
        i += 1
      }
    }
    out.result()
  }

  /** Remove the ANSI sequences this highlighter emits. */
  def stripAnsi(s: String): String =
    s.replaceAll("\\[[0-9;]*m", "")
}
