package graft

/** DuckDB-runnable ANSI SQL oracles, one per entry in
  * `SparkEntry.queries` (driver contract — see Verify.scala).
  *
  * Formulation rules shared with the Scala side so the driver's
  * hash-compare passes bit-for-bit:
  *  - monetary aggregates: SUM over DECIMAL(18,2) (exact,
  *    order-independent), then CAST to DOUBLE;
  *  - window cumsums run in the same (date) order in both engines;
  *  - libm-dependent results (EXP/LN/POW, regressions, stddev) are
  *    ROUNDed to 6 dp;
  *  - identical output column names + explicit final ORDER BY.
  */
object OracleSql {

  /** Shared CTE: exact daily order-revenue series. */
  val dailyOrders: String =
    """daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders GROUP BY 1
      |)""".stripMargin

  /** Shared CTE: daily pct-change over the order-revenue series. */
  val dailyPct: String =
    s"""$dailyOrders,
       |p AS (
       |  SELECT date, tvl,
       |         (tvl - LAG(tvl) OVER (ORDER BY date)) / LAG(tvl) OVER (ORDER BY date) AS pct
       |  FROM daily
       |)""".stripMargin

  val tsTvl: String =
    s"""WITH $dailyOrders,
       |t AS (
       |  SELECT date, tvl,
       |         tvl - COALESCE(LAG(tvl) OVER (ORDER BY date), tvl) AS change_tvl
       |  FROM daily
       |)
       |SELECT date, tvl, change_tvl,
       |       ROUND(change_tvl / NULLIF(tvl, 0.0), 6) AS percent_change
       |FROM t ORDER BY date""".stripMargin

  val tsGotk: String =
    s"""WITH $dailyPct,
       |e AS (
       |  SELECT date, pct,
       |         EXP(SUM(LN(1.0 + COALESCE(pct, 0.0))) OVER
       |               (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0
       |           AS end_raw
       |  FROM p
       |)
       |SELECT date,
       |       ROUND(COALESCE(LAG(end_raw) OVER (ORDER BY date), 10000.0), 6) AS start_day_investment,
       |       ROUND(end_raw, 6) AS end_day_investment,
       |       ROUND(pct, 6) AS percent_change
       |FROM e ORDER BY date""".stripMargin

  val tsTotalReturn: String =
    s"""WITH $dailyPct
       |SELECT date, strftime(date, '%Y-%m') AS month,
       |       ROUND(EXP(SUM(LN(1.0 + COALESCE(pct, 0.0))) OVER
       |               (PARTITION BY strftime(date, '%Y-%m') ORDER BY date
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - 1.0, 6)
       |         AS percent_change
       |FROM p ORDER BY date""".stripMargin

  val tsTrailingReturn: String =
    s"""WITH $dailyPct,
       |b AS (SELECT MAX(date) AS ds FROM daily),
       |per AS (
       |  SELECT '1d' AS period, CAST(ds - INTERVAL 1 DAY AS DATE) AS start_date, ds FROM b
       |  UNION ALL SELECT '1m', CAST(ds - INTERVAL 1 MONTH AS DATE), ds FROM b
       |  UNION ALL SELECT '3m', CAST(ds - INTERVAL 3 MONTH AS DATE), ds FROM b
       |  UNION ALL SELECT '6m', CAST(ds - INTERVAL 6 MONTH AS DATE), ds FROM b
       |  UNION ALL SELECT '1y', CAST(ds - INTERVAL 12 MONTH AS DATE), ds FROM b
       |  UNION ALL SELECT 'ytd', CAST(date_trunc('year', ds) AS DATE), ds FROM b
       |)
       |SELECT per.period, per.start_date,
       |       ROUND(CASE WHEN MIN(p.date) = per.start_date THEN
       |         EXP(SUM(CASE WHEN p.date > per.start_date
       |                      THEN LN(1.0 + COALESCE(p.pct, 0.0)) ELSE 0.0 END)) - 1.0
       |       END, 6) AS percent_change
       |FROM per JOIN p ON p.date BETWEEN per.start_date AND per.ds
       |GROUP BY per.period, per.start_date
       |ORDER BY period""".stripMargin

  val tsInterpolate: String =
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS date,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |  FROM lineitem GROUP BY 1
      |),
      |g AS (
      |  SELECT date, CASE WHEN day(date) % 5 = 0 THEN NULL ELSE qty END AS v FROM daily
      |),
      |r AS (SELECT date, v, ROW_NUMBER() OVER (ORDER BY date) AS rn FROM g),
      |f AS (
      |  SELECT date, v, rn,
      |    LAST_VALUE(v IGNORE NULLS) OVER
      |      (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
      |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER
      |      (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_rn,
      |    FIRST_VALUE(v IGNORE NULLS) OVER
      |      (ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
      |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER
      |      (ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_rn
      |  FROM r
      |)
      |SELECT date, ROUND(v, 6) AS v,
      |  ROUND(CASE WHEN v IS NOT NULL THEN v
      |        WHEN prev_v IS NULL THEN NULL
      |        WHEN next_v IS NULL THEN prev_v
      |        ELSE prev_v + (next_v - prev_v) * CAST(rn - prev_rn AS DOUBLE)
      |                                        / CAST(next_rn - prev_rn AS DOUBLE) END, 6)
      |    AS v_interp
      |FROM f ORDER BY date""".stripMargin
}
