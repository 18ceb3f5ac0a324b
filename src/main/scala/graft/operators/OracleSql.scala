package graft.operators

/** Shared post-processing for the deep-CTE DuckDB oracle strings.
  *
  * DuckDB's default CTE handling INLINES every reference: a CTE referenced
  * more than once total along a chain re-expands its whole upstream
  * subtree per reference — measured as multi-minute hangs (>90 s at
  * sf0.001 for the IVF-PQ chain) where the materialized form runs in
  * well under a second. Every deep-chained oracle therefore rewrites each
  * CTE definition to `AS MATERIALIZED` through this ONE helper, so the
  * required `(?<!WINDOW )` lookbehind — `WINDOW w AS (...)` is a window
  * clause, not a CTE, and `WINDOW w AS MATERIALIZED (...)` is a syntax
  * error — cannot be dropped at an individual call site.
  */
object OracleSql {

  private val CteDef = raw"""(?<!WINDOW )(\b[A-Za-z0-9_]+) AS \(""".r

  /** Rewrite every CTE definition `name AS (` in `sql` to
    * `name AS MATERIALIZED (`, leaving `WINDOW name AS (` clauses alone. */
  def materializeCtes(sql: String): String =
    CteDef.replaceAllIn(sql, m => s"${m.group(1)} AS MATERIALIZED (")
}
