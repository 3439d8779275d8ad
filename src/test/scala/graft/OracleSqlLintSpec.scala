package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over every `SparkEntry.oracleSql` string: find `SUM(...)` aggregates
  * (windowed or plain) whose result can silently become DuckDB HUGEINT.
  *
  * Why SUM and only SUM: DuckDB promotes `SUM(INTEGER/BIGINT)` to HUGEINT,
  * which pandas materializes as float64 while Spark writes int64 — the
  * driver's dtype-sensitive hash then fails even when every value matches.
  * This bit a20 in round 2 and c2+p8 in round 3 (three incidents of the
  * same class). `COUNT` returns BIGINT and `AVG` returns DOUBLE in DuckDB,
  * so neither can produce the divergence — linting them would only create
  * allowlist noise.
  *
  * A SUM is safe (not flagged) when:
  *   1. it is enclosed in a `CAST(... AS ...)` span — the fix pattern; or
  *   2. its argument is decimal by the repo's naming convention (`_dec`
  *      suffix, or the decimal fact columns line_total/discount_amount):
  *      DuckDB `SUM(DECIMAL)` stays DECIMAL(38,s), matching Spark; or
  *   3. its alias is in the allowlist below, each entry carrying the
  *      reason the raw HUGEINT provably never reaches the final output
  *      dtype-compare (cast downstream / comparison- or join-key-only).
  *      The allowlist is by alias, not (key, alias): the flagged SUMs
  *      live in CTE bodies shared across many query keys.
  *
  * Any new uncast integer window or aggregate SUM fails here with its key
  * name before it can reach the driver's correctness gate.
  */
class OracleSqlLintSpec extends AnyFunSuite {

  /** Aliases verified safe by hand (every key carrying them passes the
    * driver's dtype-sensitive hash compare — the ground truth for these
    * judgments). The reason names the downstream consumption that
    * neutralizes the HUGEINT before it reaches an output column. */
  private val allow: Map[String, String] = Map(
    // History.storeHistoryBodySql: only read as CAST(hist_txn AS DOUBLE)/hist_days
    "hist_txn" -> "cast to DOUBLE downstream; never output raw",
    // History.trendDirectionBodySql: SUM(h_sales)=SUM(gross_dec) is DECIMAL
    // (alias-renamed arg the decimal heuristic can't see), cast AS DOUBLE in sel
    "recent_dec" -> "SUM(DECIMAL) via renamed gross_dec; cast AS DOUBLE downstream",
    "rn2_dec" -> "SUM(DECIMAL) via renamed gross_dec; cast AS DOUBLE downstream",
    "gt2_dec" -> "SUM(DECIMAL) via renamed gross_dec; cast AS DOUBLE downstream",
    // trendDirectionBodySql counters: only compared (> 0) and used as the
    // divisor of an already-DOUBLE division; never output
    "recent_n" -> "comparison + divisor of DOUBLE division only",
    "gt2_n" -> "comparison + divisor of DOUBLE division only",
    // Recommendations: WHERE comparison + CAST(... AS VARCHAR) into text
    "n_inc" -> "WHERE comparison + VARCHAR cast into description only",
    "n_dec" -> "WHERE comparison + VARCHAR cast into description only",
    // Dedup.minhashLshSql: band bucket join key (HUGEINT=HUGEINT equality)
    "bandkey" -> "join equality key only; never output",
    // Dedup.minhashLshSql: final select casts it AS BIGINT / AS DOUBLE
    "n_eq_minhash" -> "cast AS BIGINT and AS DOUBLE in the final select",
    // Dedup.simhashSql: only read as CASE WHEN weight > 0 comparisons
    "weight" -> "sign comparison only; never output",
    // EventsBatch.sessionizeSql: GROUP BY key of an intermediate CTE
    "session_id" -> "group key of intermediate CTE; never output",
    // Trends.pivotWideSql: dynamic PIVOT columns re-selected through
    // CAST(COALESCE(COLUMNS(...), 0) AS BIGINT) — the documented a20 fix
    "transactions" -> "PIVOT output re-cast AS BIGINT via COLUMNS re-select",
    // EventsBatch.cupedReadoutSql: the exact integer-micro moment sums are
    // HUGEINT ON PURPOSE (Spark twin uses DECIMAL(38,0) partials — sums of
    // squared micros overflow BIGINT at production scale); every readout
    // consumes them via CAST(... AS DOUBLE), none is output raw
    "sxx" -> "intentional HUGEINT exact moment; CAST AS DOUBLE downstream",
    "sxy" -> "intentional HUGEINT exact moment; CAST AS DOUBLE downstream",
    "syy" -> "intentional HUGEINT exact moment; CAST AS DOUBLE downstream",
    "psxx" -> "pooled HUGEINT moment; CAST AS DOUBLE downstream",
    "psxy" -> "pooled HUGEINT moment; CAST AS DOUBLE downstream"
  )

  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** The current select-list item after the SUM's close paren: text up to
    * the next top-level comma, a depth-0 close paren (end of enclosing
    * subquery), or a clause keyword — so an unaliased SUM can never
    * borrow an `AS <word>` from an unrelated later column. */
  private val ClauseKw =
    "(?i)^(FROM|WHERE|GROUP|ORDER|HAVING|QUALIFY|WINDOW|LIMIT|UNION)\\b".r
  private def itemTail(rest: String): String = {
    var depth = 0
    var inStr = false
    var i = 0
    while (i < rest.length) {
      val c = rest.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => if (depth == 0) return rest.substring(0, i) else depth -= 1
        case ',' if depth == 0 => return rest.substring(0, i)
        case _ =>
          if (depth == 0 && (i == 0 || !rest.charAt(i - 1).isLetterOrDigit) &&
              ClauseKw.findFirstIn(rest.substring(i)).isDefined)
            return rest.substring(0, i)
      }
      i += 1
    }
    rest
  }

  /** SQL type keywords are never column aliases: `CAST(x AS BIGINT)`
    * inside the same item must not satisfy the alias lookup. */
  private val TypeWords = Set(
    "BIGINT", "INTEGER", "INT", "HUGEINT", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "REAL", "DECIMAL", "NUMERIC",
    "VARCHAR", "TEXT", "DATE", "TIMESTAMP", "BOOLEAN")

  private val SumPat = "(?i)\\bSUM\\s*\\(".r
  private val CastPat = "(?i)\\bCAST\\s*\\(".r
  private val AliasPat = "(?i)\\bAS\\s+([A-Za-z_][A-Za-z0-9_]*)".r
  private val DecimalArg = "(?i)(_dec\\b|\\bline_total\\b|\\bdiscount_amount\\b)".r.unanchored

  private case class Hit(alias: String, window: Boolean, snippet: String)

  private def lint(sql: String): Seq[Hit] = {
    val castSpans = CastPat.findAllMatchIn(sql).map { m =>
      val open = sql.indexOf('(', m.start)
      (open, matchParen(sql, open))
    }.toSeq
    SumPat.findAllMatchIn(sql).flatMap { m =>
      val open = sql.indexOf('(', m.start)
      val close = matchParen(sql, open)
      val arg = sql.substring(open + 1, close)
      val rest = sql.substring(close + 1)
      val isWindow = rest.dropWhile(_.isWhitespace).toUpperCase.startsWith("OVER")
      val enclosed = castSpans.exists { case (co, cc) => co < m.start && cc > close }
      val decimalArg = DecimalArg.findFirstIn(arg).isDefined
      if (enclosed || decimalArg) None
      else {
        val alias = AliasPat.findAllMatchIn(itemTail(rest)).map(_.group(1))
          .find(a => !TypeWords.contains(a.toUpperCase))
          .getOrElse("<no-alias>")
        val from = math.max(0, m.start - 10)
        val snippet = sql.substring(from, math.min(sql.length, close + 30))
          .replaceAll("\\s+", " ")
        Some(Hit(alias, isWindow, snippet))
      }
    }.toSeq
  }

  test("no oracle SQL carries an uncast integer SUM (HUGEINT divergence)") {
    val violations = for {
      (key, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      hit <- lint(sql)
      if !allow.contains(hit.alias)
    } yield s"$key: ${if (hit.window) "window " else ""}SUM -> ${hit.alias} [...${hit.snippet}...]"
    assert(violations.isEmpty,
      "\nUncast integer SUM(s) in oracleSql — wrap in CAST(... AS BIGINT) " +
        "(DuckDB SUM(BIGINT)=HUGEINT -> float64 vs Spark int64; " +
        "see a20/c2/p8 incident history):\n" + violations.mkString("\n"))
  }
}
