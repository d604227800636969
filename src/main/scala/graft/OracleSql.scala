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

  /** Rolling percentile bands: 31-row frames make p·(n−1) integral,
    * so the window quantile is an exact element — no interpolation,
    * no rounding needed. */
  val tsBands: String =
    s"""WITH $dailyOrders,
       |b AS (
       |  SELECT date,
       |         ROW_NUMBER() OVER (ORDER BY date) AS rn,
       |         quantile_cont(tvl, 0.1) OVER w AS p10,
       |         quantile_cont(tvl, 0.5) OVER w AS p50,
       |         quantile_cont(tvl, 0.9) OVER w AS p90
       |  FROM daily
       |  WINDOW w AS (ORDER BY date ROWS BETWEEN 30 PRECEDING AND CURRENT ROW)
       |)
       |SELECT date, p10, p50, p90 FROM b WHERE rn >= 31 ORDER BY date""".stripMargin

  /** Historical VaR/CVaR: k = ceil(0.05·n) exact order statistic with
    * date tiebreak, tail mean — mirroring `TimeSeries.valueAtRisk`. */
  val tsVar: String =
    s"""WITH $dailyPct,
       |r AS (SELECT date, pct AS r FROM p WHERE pct IS NOT NULL),
       |k AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |         GREATEST(1, CAST(CEIL(COUNT(*) * 0.05) AS BIGINT)) AS kk
       |  FROM r
       |),
       |rk AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r, date) AS rn FROM r)
       |SELECT k.n AS n_days, ROUND(MAX(rk.r), 6) AS var95, ROUND(AVG(rk.r), 6) AS cvar95
       |FROM rk CROSS JOIN k WHERE rk.rn <= k.kk GROUP BY k.n""".stripMargin

  /** Naive-seasonal (lag-7) forecast backtest scores. */
  val tsForecast: String =
    s"""WITH $dailyOrders,
       |f AS (SELECT date, tvl, LAG(tvl, 7) OVER (ORDER BY date) AS pred FROM daily)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
       |       ROUND(AVG(ABS(tvl - pred)), 6) AS mae,
       |       ROUND(SQRT(AVG((tvl - pred) * (tvl - pred))), 6) AS rmse,
       |       ROUND(AVG(ABS(tvl - pred) / ABS(tvl)), 6) AS mape
       |FROM f WHERE pred IS NOT NULL""".stripMargin

  /** STL-shaped decomposition in integer cents: exact window sums,
    * float only in final divisions — mirroring `TimeSeries.stl`. */
  val tsStl: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS c
      |  FROM orders GROUP BY 1
      |),
      |w AS (
      |  SELECT date, c,
      |         CAST(COUNT(*) OVER f AS BIGINT) AS nw,
      |         CAST(SUM(c) OVER f AS BIGINT) AS s7
      |  FROM daily
      |  WINDOW f AS (ORDER BY date ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |),
      |b AS (SELECT *, 7 * c - s7 AS detr7 FROM w WHERE nw = 7),
      |d AS (
      |  SELECT *,
      |         CAST(SUM(detr7) OVER dw AS BIGINT) AS sdow,
      |         CAST(COUNT(*) OVER dw AS BIGINT) AS cnt
      |  FROM b
      |  WINDOW dw AS (PARTITION BY date_part('dow', date))
      |)
      |SELECT date,
      |       ROUND(CAST(c AS DOUBLE) / 100, 6) AS tvl,
      |       ROUND(CAST(s7 AS DOUBLE) / 700, 6) AS trend,
      |       ROUND(CAST(sdow AS DOUBLE) / (700 * cnt), 6) AS seasonal,
      |       ROUND(CAST(detr7 AS DOUBLE) / 700 - CAST(sdow AS DOUBLE) / (700 * cnt), 6) AS resid
      |FROM d ORDER BY date""".stripMargin

  /** Change-point: one cumulative pass, min segment 8, argmax on the
    * 6-dp shift with earliest-date tiebreak (`TimeSeries.changePoint`). */
  val tsChangepoint: String =
    s"""WITH $dailyOrders,
       |c AS (
       |  SELECT date, tvl,
       |         ROW_NUMBER() OVER (ORDER BY date) AS rn,
       |         SUM(tvl) OVER (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |         COUNT(*) OVER () AS n,
       |         SUM(tvl) OVER () AS total
       |  FROM daily
       |),
       |s AS (
       |  SELECT date, n, cum / rn AS mean_before,
       |         (total - cum) / (n - rn) AS mean_after,
       |         ROUND(abs(cum / rn - (total - cum) / (n - rn)), 6) AS shift
       |  FROM c WHERE rn >= 8 AND n - rn >= 8
       |)
       |SELECT date AS split_date, CAST(n AS BIGINT) AS n_days,
       |       ROUND(mean_before, 6) AS mean_before,
       |       ROUND(mean_after, 6) AS mean_after, shift
       |FROM s ORDER BY shift DESC, date LIMIT 1""".stripMargin

  /** Theil–Sen robust trend over the trailing 31 revenue days: 465
    * pairwise slopes and 31 residuals — both odd counts, so each
    * quantile_cont picks an exact element (bit-identical across
    * engines), mirroring `TimeSeries.theilSen`. */
  val tsTheilsen: String =
    s"""WITH $dailyOrders,
       |sl AS (SELECT date, tvl, ROW_NUMBER() OVER (ORDER BY date DESC) AS rn FROM daily),
       |s AS (
       |  SELECT tvl, CAST(date_diff('day', MIN(date) OVER (), date) AS DOUBLE) AS x
       |  FROM sl WHERE rn <= 31
       |),
       |p AS (
       |  SELECT (b.tvl - a.tvl) / (b.x - a.x) AS slope
       |  FROM s a JOIN s b ON b.x > a.x
       |),
       |m AS (SELECT quantile_cont(slope, 0.5) AS mslope, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p)
       |SELECT ROUND(m.mslope, 6) AS slope,
       |       ROUND(quantile_cont(s.tvl - m.mslope * s.x, 0.5), 6) AS intercept,
       |       CAST(COUNT(*) AS BIGINT) AS n_days, m.n_pairs
       |FROM s CROSS JOIN m
       |GROUP BY m.mslope, m.n_pairs""".stripMargin

  /** Weekly OHLC resample: argmin/argmax elections are tie-free
    * (dates unique within a week). */
  val tsResample: String =
    s"""WITH $dailyOrders
       |SELECT date_trunc('week', date) AS week,
       |       arg_min(tvl, date) AS open,
       |       MAX(tvl) AS high,
       |       MIN(tvl) AS low,
       |       arg_max(tvl, date) AS close,
       |       COUNT(*) AS n_days
       |FROM daily GROUP BY 1 ORDER BY 1""".stripMargin

  /** Rolling 30-day return correlation between the order-revenue and
    * lineitem-benchmark series: corr over day-over-day fractional
    * changes (O(1e-2) magnitudes, so cross-engine co-moment noise
    * sits far below 6 dp), full-window gated. */
  val tsRollingCorr: String =
    s"""WITH $dailyOrders,
       |bench AS (
       |  SELECT CAST(l_shipdate AS DATE) AS date,
       |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bench
       |  FROM lineitem GROUP BY 1
       |),
       |j AS (SELECT daily.date, tvl, bench FROM daily JOIN bench USING (date)),
       |r AS (
       |  SELECT date,
       |         (tvl - LAG(tvl) OVER (ORDER BY date)) / LAG(tvl) OVER (ORDER BY date) AS rx,
       |         (bench - LAG(bench) OVER (ORDER BY date)) / LAG(bench) OVER (ORDER BY date) AS ry,
       |         ROW_NUMBER() OVER (ORDER BY date) AS rn
       |  FROM j
       |),
       |c AS (
       |  SELECT date, rn,
       |         ROUND(corr(rx, ry) OVER (ORDER BY date ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), 6) AS corr30
       |  FROM r
       |)
       |SELECT date, corr30 FROM c WHERE rn >= 31 ORDER BY date""".stripMargin

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
       |       ROUND(COALESCE(LAG(end_raw) OVER (ORDER BY date), 10000.0), 2) AS start_day_investment,
       |       ROUND(end_raw, 2) AS end_day_investment,
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

  /** Shared CTEs: per-segment daily series + per-series pct change. */
  private val dailyBySegmentPct: String =
    """daily AS (
      |  SELECT c_mktsegment AS name, CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |),
      |p AS (
      |  SELECT name, date,
      |         (tvl - LAG(tvl) OVER (PARTITION BY name ORDER BY date))
      |           / LAG(tvl) OVER (PARTITION BY name ORDER BY date) AS pct
      |  FROM daily
      |)""".stripMargin

  val tsTrailingReturnBySegment: String =
    s"""WITH $dailyBySegmentPct,
       |b AS (SELECT name, MAX(date) AS ds FROM daily GROUP BY name),
       |per AS (
       |  SELECT name, '1d' AS period, CAST(ds - INTERVAL 1 DAY AS DATE) AS start_date, ds FROM b
       |  UNION ALL SELECT name, '1m', CAST(ds - INTERVAL 1 MONTH AS DATE), ds FROM b
       |  UNION ALL SELECT name, '3m', CAST(ds - INTERVAL 3 MONTH AS DATE), ds FROM b
       |  UNION ALL SELECT name, '6m', CAST(ds - INTERVAL 6 MONTH AS DATE), ds FROM b
       |  UNION ALL SELECT name, '1y', CAST(ds - INTERVAL 12 MONTH AS DATE), ds FROM b
       |  UNION ALL SELECT name, 'ytd', CAST(date_trunc('year', ds) AS DATE), ds FROM b
       |)
       |SELECT per.name, per.period, per.start_date,
       |       ROUND(CASE WHEN MIN(p.date) = per.start_date THEN
       |         EXP(SUM(CASE WHEN p.date > per.start_date
       |                      THEN LN(1.0 + COALESCE(p.pct, 0.0)) ELSE 0.0 END)) - 1.0
       |       END, 6) AS percent_change
       |FROM per JOIN p ON p.name = per.name AND p.date BETWEEN per.start_date AND per.ds
       |GROUP BY per.name, per.period, per.start_date
       |ORDER BY per.name, per.period""".stripMargin

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

  // ---------------------------------------------------------------- risk

  val risk: String =
    """WITH sd0 AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders GROUP BY 1
      |),
      |sp AS (SELECT date, (tvl - LAG(tvl) OVER (ORDER BY date)) / LAG(tvl) OVER (ORDER BY date) AS s_pct FROM sd0),
      |bd AS (
      |  SELECT CAST(l_shipdate AS DATE) AS date,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bench
      |  FROM lineitem GROUP BY 1
      |),
      |bp AS (SELECT date, (bench - LAG(bench) OVER (ORDER BY date)) / LAG(bench) OVER (ORDER BY date) AS b_pct FROM bd),
      |a AS (SELECT MAX(date) AS ds, CAST(MAX(date) - INTERVAL 12 MONTH AS DATE) AS start FROM sd0),
      |y AS (
      |  SELECT ROUND(EXP(SUM(LN(1.0 + COALESCE(sp.s_pct, 0.0)))) - 1.0, 6) AS ytd
      |  FROM sp, a
      |  WHERE sp.date > CAST(date_trunc('year', a.ds) AS DATE) AND sp.date <= a.ds
      |),
      |j AS (
      |  SELECT sp.date, sp.s_pct, bp.b_pct, a.ds
      |  FROM sp JOIN bp ON sp.date = bp.date CROSS JOIN a
      |  WHERE sp.date > a.start AND sp.date <= a.ds
      |    AND sp.s_pct IS NOT NULL AND bp.b_pct IS NOT NULL
      |),
      |stats AS (
      |  SELECT ds,
      |    ROUND(stddev_samp(s_pct) * sqrt(365.0), 6) AS sd,
      |    ROUND(pow(1.0 + avg(s_pct), 365.0) - 1.0, 6) AS return_1y,
      |    ROUND((pow(1.0 + avg(s_pct), 365.0) - 1.0) / (stddev_samp(s_pct) * sqrt(365.0)), 6) AS sharpe,
      |    ROUND(regr_intercept(s_pct, b_pct), 6) AS alpha,
      |    ROUND(regr_slope(s_pct, b_pct), 6) AS beta,
      |    ROUND(regr_r2(s_pct, b_pct), 6) AS r_square
      |  FROM j GROUP BY ds
      |),
      |w1 AS (
      |  SELECT date, SUM(s_pct) OVER (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM j
      |),
      |w2 AS (
      |  SELECT date, cum,
      |         MAX(cum) OVER (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cummax
      |  FROM w1
      |),
      |dd AS (SELECT date, cum, cummax, cum - cummax AS ddv FROM w2),
      |m AS (SELECT MIN(ddv) AS min_dd FROM dd),
      |v AS (SELECT MIN(date) AS valley_date, MIN(cummax) AS peak_cum FROM dd, m WHERE ddv = m.min_dd),
      |pk AS (SELECT MIN(date) AS peak_date FROM dd, v WHERE date <= v.valley_date AND cum = v.peak_cum)
      |SELECT stats.ds AS date, sd,
      |       CASE WHEN return_1y = 0.0 THEN y.ytd ELSE return_1y END AS return_1y,
      |       sharpe, alpha, beta, r_square,
      |       ROUND(m.min_dd, 6) AS max_drawdown, pk.peak_date, v.valley_date,
      |       CAST(v.valley_date - pk.peak_date AS BIGINT) AS duration
      |FROM stats, m, v, pk, y""".stripMargin

  /** Per-series risk: the single-series `risk` formulation with every
    * window PARTITION BY name and every scalar CTE GROUP BY name. */
  val riskBySegment: String =
    """WITH sd0 AS (
      |  SELECT c_mktsegment AS name, CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |),
      |sp AS (
      |  SELECT name, date,
      |         (tvl - LAG(tvl) OVER (PARTITION BY name ORDER BY date))
      |           / LAG(tvl) OVER (PARTITION BY name ORDER BY date) AS s_pct
      |  FROM sd0
      |),
      |bd AS (
      |  SELECT CAST(l_shipdate AS DATE) AS date,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bench
      |  FROM lineitem GROUP BY 1
      |),
      |bp AS (SELECT date, (bench - LAG(bench) OVER (ORDER BY date)) / LAG(bench) OVER (ORDER BY date) AS b_pct FROM bd),
      |a AS (SELECT name, MAX(date) AS ds, CAST(MAX(date) - INTERVAL 12 MONTH AS DATE) AS start FROM sd0 GROUP BY name),
      |y AS (
      |  SELECT sp.name, ROUND(EXP(SUM(LN(1.0 + COALESCE(sp.s_pct, 0.0)))) - 1.0, 6) AS ytd
      |  FROM sp JOIN a ON a.name = sp.name
      |  WHERE sp.date > CAST(date_trunc('year', a.ds) AS DATE) AND sp.date <= a.ds
      |  GROUP BY sp.name
      |),
      |j AS (
      |  SELECT sp.name, sp.date, sp.s_pct, bp.b_pct, a.ds
      |  FROM sp JOIN bp ON sp.date = bp.date JOIN a ON a.name = sp.name
      |  WHERE sp.date > a.start AND sp.date <= a.ds
      |    AND sp.s_pct IS NOT NULL AND bp.b_pct IS NOT NULL
      |),
      |stats AS (
      |  SELECT name, ds,
      |    ROUND(stddev_samp(s_pct) * sqrt(365.0), 6) AS sd,
      |    ROUND(EXP(SUM(LN(1.0 + s_pct))) - 1.0, 6) AS return_1y,
      |    ROUND(avg(s_pct) / stddev_samp(s_pct) * sqrt(365.0), 6) AS sharpe,
      |    ROUND(regr_intercept(s_pct, b_pct), 6) AS alpha,
      |    ROUND(regr_slope(s_pct, b_pct), 6) AS beta,
      |    ROUND(regr_r2(s_pct, b_pct), 6) AS r_square
      |  FROM j GROUP BY name, ds
      |),
      |w1 AS (
      |  SELECT name, date,
      |         SUM(s_pct) OVER (PARTITION BY name ORDER BY date
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM j
      |),
      |w2 AS (
      |  SELECT name, date, cum,
      |         MAX(cum) OVER (PARTITION BY name ORDER BY date
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cummax
      |  FROM w1
      |),
      |dd AS (SELECT name, date, cum, cummax, cum - cummax AS ddv FROM w2),
      |m AS (SELECT name, MIN(ddv) AS min_dd FROM dd GROUP BY name),
      |v AS (
      |  SELECT dd.name, MIN(date) AS valley_date, MIN(cummax) AS peak_cum
      |  FROM dd JOIN m ON m.name = dd.name WHERE dd.ddv = m.min_dd GROUP BY dd.name
      |),
      |pk AS (
      |  SELECT dd.name, MIN(date) AS peak_date
      |  FROM dd JOIN v ON v.name = dd.name
      |  WHERE dd.date <= v.valley_date AND dd.cum = v.peak_cum GROUP BY dd.name
      |)
      |SELECT stats.name, stats.ds AS date, sd,
      |       CASE WHEN return_1y = 0.0 THEN y.ytd ELSE return_1y END AS return_1y,
      |       sharpe, alpha, beta, r_square,
      |       ROUND(m.min_dd, 6) AS max_drawdown, pk.peak_date, v.valley_date,
      |       CAST(v.valley_date - pk.peak_date AS BIGINT) AS duration
      |FROM stats
      |JOIN m ON m.name = stats.name
      |JOIN v ON v.name = stats.name
      |JOIN pk ON pk.name = stats.name
      |JOIN y ON y.name = stats.name
      |ORDER BY stats.name""".stripMargin

  /** Windowed-form oracle for the DISTRIBUTED parallel-prefix drawdown
    * (`ops/Drawdown`): same series, sequential cumsum/cummax — the
    * algebra must agree with the reference formulation exactly. */
  val tsDrawdown: String =
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders GROUP BY 1
      |),
      |p AS (SELECT date, (tvl - LAG(tvl) OVER (ORDER BY date)) / LAG(tvl) OVER (ORDER BY date) AS pct FROM d),
      |s AS (SELECT date, pct FROM p WHERE pct IS NOT NULL),
      |w1 AS (SELECT date, SUM(pct) OVER (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM s),
      |w2 AS (
      |  SELECT date, cum,
      |         MAX(cum) OVER (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cummax
      |  FROM w1
      |),
      |dd AS (SELECT date, cum, cummax, cum - cummax AS ddv FROM w2),
      |m AS (SELECT MIN(ddv) AS min_dd FROM dd),
      |v AS (SELECT MIN(date) AS valley_date, MIN(cummax) AS peak_cum FROM dd, m WHERE ddv = m.min_dd),
      |pk AS (SELECT MIN(date) AS peak_date FROM dd, v WHERE date <= v.valley_date AND cum = v.peak_cum)
      |SELECT ROUND(m.min_dd, 6) AS max_drawdown, pk.peak_date, v.valley_date,
      |       CAST(v.valley_date - pk.peak_date AS BIGINT) AS duration
      |FROM m, v, pk""".stripMargin

  /** Per-segment windowed-form oracle for the distributed per-key
    * drawdown (`Drawdown.maxDrawdownByKey`): the single-series
    * `tsDrawdown` formulation with every window/aggregate partitioned
    * or grouped by segment. */
  val tsDrawdownBySegment: String =
    s"""WITH $dailyBySegmentPct,
      |s AS (SELECT name, date, pct FROM p WHERE pct IS NOT NULL),
      |w1 AS (
      |  SELECT name, date,
      |         SUM(pct) OVER (PARTITION BY name ORDER BY date
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM s
      |),
      |w2 AS (
      |  SELECT name, date, cum,
      |         MAX(cum) OVER (PARTITION BY name ORDER BY date
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cummax
      |  FROM w1
      |),
      |dd AS (SELECT name, date, cum, cummax, cum - cummax AS ddv FROM w2),
      |m AS (SELECT name, MIN(ddv) AS min_dd FROM dd GROUP BY name),
      |v AS (
      |  SELECT dd.name, MIN(dd.date) AS valley_date, MIN(dd.cummax) AS peak_cum
      |  FROM dd JOIN m ON m.name = dd.name AND dd.ddv = m.min_dd
      |  GROUP BY dd.name
      |),
      |pk AS (
      |  SELECT dd.name, MIN(dd.date) AS peak_date
      |  FROM dd JOIN v ON v.name = dd.name AND dd.date <= v.valley_date AND dd.cum = v.peak_cum
      |  GROUP BY dd.name
      |)
      |SELECT m.name, ROUND(m.min_dd, 6) AS max_drawdown,
      |       pk.peak_date, v.valley_date,
      |       CAST(v.valley_date - pk.peak_date AS BIGINT) AS duration
      |FROM m JOIN v ON v.name = m.name JOIN pk ON pk.name = m.name
      |ORDER BY m.name""".stripMargin

  // ---------------------------------------------------------- relational

  val relScanFilter: String =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS date, o_totalprice AS price
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
      |ORDER BY o_orderkey""".stripMargin

  val relScalarAgg: String =
    """SELECT MIN(CAST(o_orderdate AS DATE)) AS start_date,
      |       MAX(CAST(o_orderdate AS DATE)) AS end_date,
      |       COUNT(*) AS n
      |FROM orders""".stripMargin

  val relPricingSummary: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** FK integrity: one left-join scalar aggregate per schema edge. */
  val relFkIntegrity: String = {
    def edge(name: String, child: String, ck: String, parent: String, pk: String) =
      s"""SELECT '$name' AS fk, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
         |FROM $child c LEFT JOIN $parent p ON c.$ck = p.$pk""".stripMargin
    Seq(
      edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      edge("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      edge("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
  }

  /** Part-type revenue mix: exact decimal money arithmetic (the
    * pricing-summary idiom), 1-row total for the share. */
  val relPromoShare: String =
    """WITH bt AS (
      |  SELECT p_type, COUNT(*) AS n_items,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1
      |),
      |t AS (SELECT SUM(revenue) AS total FROM bt)
      |SELECT p_type, n_items, revenue, ROUND(revenue / t.total, 6) AS rev_share
      |FROM bt CROSS JOIN t ORDER BY p_type""".stripMargin

  val relTopCustomers: String =
    """SELECT c_custkey, c_name,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 10""".stripMargin

  val relRegionRevenue: String =
    """SELECT r_name, CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, o_year
      |ORDER BY r_name, o_year""".stripMargin

  val relSemiJoin: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  val relAntiJoin: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Full-outer ledger reconciliation mirroring
    * `Relational.fullJoinReconcile`: decimal detail sums, both orphan
    * directions, exact delta. */
  val relFullJoinReconcile: String =
    """WITH l AS (
      |  SELECT l_orderkey AS okey,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS computed
      |  FROM lineitem GROUP BY 1
      |),
      |o AS (SELECT o_orderkey AS okey, o_totalprice FROM orders)
      |SELECT COALESCE(o.okey, l.okey) AS okey, o.o_totalprice, l.computed,
      |       CASE WHEN o.o_totalprice IS NULL THEN 'missing_order'
      |            WHEN l.computed IS NULL THEN 'missing_lines'
      |            ELSE 'both' END AS status,
      |       COALESCE(l.computed, 0.0) - COALESCE(o.o_totalprice, 0.0) AS delta
      |FROM o FULL OUTER JOIN l ON o.okey = l.okey
      |ORDER BY okey""".stripMargin

  val relLeftJoinFill: String =
    """SELECT c_custkey,
      |       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS revenue,
      |       COUNT(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  val relWindowRank: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  val relMinMaxBy: String =
    """SELECT s_nationkey,
      |       max_by(s_name, s_acctbal) AS richest,
      |       min_by(s_name, s_acctbal) AS poorest,
      |       ROUND(MAX(s_acctbal), 6) AS max_bal
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  val relTopLatest: String =
    """SELECT CAST(o_orderdate AS DATE) AS date, o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY date DESC, o_orderkey DESC
      |LIMIT 1""".stripMargin

  val relRollup: String =
    """SELECT o_orderstatus,
      |       CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n,
      |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_year) AS BIGINT) AS g
      |FROM orders
      |GROUP BY ROLLUP(o_orderstatus, o_year)
      |ORDER BY g, o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin

  val relSetOps: String =
    """WITH y97 AS (SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997),
      |y98 AS (SELECT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1998),
      |retained AS (SELECT 'retained' AS cohort, o_custkey FROM (SELECT * FROM y97 INTERSECT SELECT * FROM y98) t),
      |churned AS (SELECT 'churned' AS cohort, o_custkey FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y98) t)
      |SELECT cohort, o_custkey FROM retained
      |UNION ALL SELECT cohort, o_custkey FROM churned
      |ORDER BY cohort, o_custkey""".stripMargin

  val relNtile: String =
    """WITH r AS (
      |  SELECT c_custkey,
      |         CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS revenue
      |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey
      |)
      |SELECT c_custkey, revenue,
      |       CAST(NTILE(4) OVER (ORDER BY revenue DESC, c_custkey) AS BIGINT) AS quartile
      |FROM r ORDER BY c_custkey""".stripMargin

  val relCube: String =
    """SELECT o_orderstatus,
      |       CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n,
      |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_year) AS BIGINT) AS g
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_year)
      |ORDER BY g, o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin

  val relGroupingSets: String =
    """SELECT o_orderstatus,
      |       CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       COUNT(*) AS n,
      |       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_year) AS BIGINT) AS g
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_year))
      |ORDER BY g, o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin

  val relQuantiles: String =
    """SELECT o_orderstatus,
      |       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
      |       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
      |       COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Benford audit: leading digit extracted in the integer domain
    * (first char of floor(x)::BIGINT; every total > 1), so the only
    * float terms are the 6-dp-rounded expected frequency and
    * deviation. */
  val relBenford: String =
    """WITH d AS (
      |  SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
      |         COUNT(*) AS n
      |  FROM orders GROUP BY 1
      |),
      |t AS (SELECT SUM(n) AS total FROM d)
      |SELECT digit, n,
      |       ROUND(n / t.total, 6) AS freq,
      |       ROUND(LOG10(1.0 + 1.0 / digit::DOUBLE), 6) AS benford,
      |       ROUND(ABS(n / t.total - LOG10(1.0 + 1.0 / digit::DOUBLE)), 6) AS dev
      |FROM d CROSS JOIN t
      |ORDER BY digit""".stripMargin

  /** Winsorized segment means: clip fences are the 6-dp-rounded exact
    * quantiles (deterministic compares); means are decimal sums with
    * one final division. */
  val relWinsorize: String =
    """WITH o AS (
      |  SELECT c.c_mktsegment, o.o_totalprice
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |),
      |q AS (
      |  SELECT c_mktsegment,
      |         ROUND(quantile_cont(o_totalprice, 0.05), 6) AS p05,
      |         ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
      |  FROM o GROUP BY 1
      |)
      |SELECT o.c_mktsegment, q.p05, q.p95, COUNT(*) AS n,
      |       CAST(SUM(CASE WHEN LEAST(GREATEST(o.o_totalprice, q.p05), q.p95) <> o.o_totalprice
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
      |       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS mean_raw,
      |       ROUND(CAST(SUM(CAST(LEAST(GREATEST(o.o_totalprice, q.p05), q.p95) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_wins
      |FROM o JOIN q USING (c_mktsegment)
      |GROUP BY 1, 2, 3
      |ORDER BY 1""".stripMargin

  /** Pairwise Pearson correlations, tidy output; 6 dp absorbs the
    * engines' co-moment accumulation-order ulps. */
  val relCorrMatrix: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    val selects = pairs.map { case (a, b) =>
      s"SELECT '$a' AS col_a, '$b' AS col_b, ROUND(corr($a, $b), 6) AS corr FROM lineitem" }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
  }

  /** Join-key skew audit: integer count profile, one float entropy
    * term (6 dp absorbs summation-order ulps on O(1e-3) terms). */
  val relSkewAudit: String =
    """WITH c AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c)
      |SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |       COUNT(*) AS n_keys,
      |       MAX(cnt) AS max_cnt,
      |       ROUND(MAX(cnt) / SUM(cnt), 6) AS max_share,
      |       quantile_cont(cnt, 0.99) AS p99_cnt,
      |       ROUND(-SUM((cnt / t.total) * LN(cnt / t.total)), 6) AS entropy
      |FROM c CROSS JOIN t""".stripMargin

  /** MAD per status: the inner median is 6-dp rounded before the
    * deviation pass so both engines deviate from identical operands. */
  val relMad: String =
    """WITH m AS (
      |  SELECT o_orderstatus, ROUND(quantile_cont(o_totalprice, 0.5), 6) AS median_price
      |  FROM orders GROUP BY 1
      |)
      |SELECT o.o_orderstatus, m.median_price,
      |       ROUND(quantile_cont(ABS(o.o_totalprice - m.median_price), 0.5), 6) AS mad,
      |       COUNT(*) AS n
      |FROM orders o JOIN m USING (o_orderstatus)
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  val relPivot: String = {
    def cell(s: String) =
      s"CAST(COALESCE(SUM(CASE WHEN o_orderstatus = '$s' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS \"$s\""
    s"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
       |  ${cell("F")},
       |  ${cell("O")},
       |  ${cell("P")}
       |FROM orders
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin
  }

  /** Unpivot of the zero-filled pivot: every (year, status) cell as a
    * row — dense year×status frame left-joined onto the aggregate. */
  val relUnpivot: String =
    """WITH y AS (
      |  SELECT DISTINCT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year FROM orders
      |),
      |st AS (SELECT UNNEST(['F', 'O', 'P']) AS status),
      |a AS (
      |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
      |         o_orderstatus AS status,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT y.o_year, st.status, COALESCE(a.revenue, 0.0) AS revenue
      |FROM y CROSS JOIN st
      |LEFT JOIN a ON a.o_year = y.o_year AND a.status = st.status
      |ORDER BY y.o_year, st.status""".stripMargin

  // -------------------------------------------------------------- events

  val evHourly: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       COUNT(DISTINCT user_id) AS users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** DuckDB types SUM(BIGINT) as HUGEINT (int128) — the outer CAST
    * brings it back to BIGINT to match Spark's LongType sum. */
  val evJson: String =
    """SELECT event_type,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       COUNT(*) AS n,
      |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val evSessionize: String =
    """WITH x AS (
      |  SELECT user_id, ts, epoch_us(ts) AS us,
      |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      |  FROM events
      |),
      |s AS (
      |  SELECT user_id, ts, us,
      |    SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM x
      |)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       COUNT(*) AS n_events,
      |       MAX(us) - MIN(us) AS duration_us
      |FROM s
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Native-session_window semantics: each event spans [ts, ts+30min)
    * and sessions MERGE when the next event starts at or before the
    * current window end — verified empirically: two events exactly
    * 30 min apart land in ONE session. So a new session starts only
    * when the gap STRICTLY exceeds 30 min (`>` below), the same
    * boundary as `evSessionize`. Bounds are rebuilt from epoch micros
    * (`make_timestamp`) so DuckDB's nanosecond parquet timestamps
    * compare equal to Spark's microsecond-truncated ones. */
  val evSessionWindow: String =
    """WITH x AS (
      |  SELECT user_id, ts, epoch_us(ts) AS us,
      |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      |  FROM events
      |),
      |s AS (
      |  SELECT user_id, us,
      |    SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY us
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM x
      |)
      |SELECT user_id,
      |       make_timestamp(MIN(us)) AS session_start,
      |       make_timestamp(MAX(us) + 1800000000) AS session_end,
      |       COUNT(*) AS n_events
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val evAsof: String =
    """WITH l AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders GROUP BY 1
      |),
      |r AS (
      |  SELECT date, qty FROM (
      |    SELECT CAST(l_shipdate AS DATE) AS date,
      |           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |    FROM lineitem GROUP BY 1) t
      |  WHERE day(date) % 3 = 0
      |)
      |SELECT l.date, l.tvl, r.qty AS qty_asof
      |FROM l ASOF LEFT JOIN r ON l.date >= r.date
      |ORDER BY l.date""".stripMargin

  /** Mirrors `Events.asofJoinForward`: DuckDB ASOF with the
    * inequality flipped picks the earliest right row at-or-after. */
  val evAsofForward: String =
    """WITH l AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders GROUP BY 1
      |),
      |r AS (
      |  SELECT date, qty FROM (
      |    SELECT CAST(l_shipdate AS DATE) AS date,
      |           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |    FROM lineitem GROUP BY 1) t
      |  WHERE day(date) % 3 = 0
      |)
      |SELECT l.date, l.tvl, r.qty AS qty_fwd
      |FROM l ASOF LEFT JOIN r ON l.date <= r.date
      |ORDER BY l.date""".stripMargin

  /** Mirrors `Events.asofJoinTolerance`: native ASOF exposing the
    * matched date, then a CASE nulls matches staler than 5 days. */
  val evAsofTolerance: String =
    """WITH l AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders GROUP BY 1
      |),
      |r AS (
      |  SELECT date, qty FROM (
      |    SELECT CAST(l_shipdate AS DATE) AS date,
      |           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |    FROM lineitem GROUP BY 1) t
      |  WHERE day(date) % 3 = 0
      |)
      |SELECT l.date, l.tvl,
      |       CASE WHEN l.date - r.date <= 5 THEN r.qty END AS qty_asof5
      |FROM l ASOF LEFT JOIN r ON l.date >= r.date
      |ORDER BY l.date""".stripMargin

  /** Multi-key ASOF: DuckDB's native ASOF LEFT JOIN with an extra
    * equality key — one aggregate CTE feeds both series, matching the
    * Spark composition's reused exchange. */
  val evAsofByKey: String =
    """WITH g AS (
      |  SELECT c_mktsegment AS name, CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl,
      |         COUNT(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |),
      |l AS (SELECT name, date, tvl FROM g),
      |r AS (SELECT name, date, n FROM g WHERE day(date) % 3 = 0)
      |SELECT l.name, l.date, l.tvl, r.n AS n_asof
      |FROM l ASOF LEFT JOIN r ON l.name = r.name AND l.date >= r.date
      |ORDER BY l.name, l.date""".stripMargin

  /** Ordered funnel: each stage's entry time is the min event ts
    * STRICTLY AFTER the user's entry into the previous stage — the
    * same chained-CTE shape as the Spark side's chained stage
    * aggregates. */
  val evFunnel: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
      |),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
      |),
      |c AS (
      |  SELECT (SELECT COUNT(*) FROM s1) AS n1,
      |         (SELECT COUNT(*) FROM s2) AS n2,
      |         (SELECT COUNT(*) FROM s3) AS n3
      |)
      |SELECT stage, users, ROUND(users / n1, 6) AS pct_of_first FROM (
      |  SELECT '1_signup' AS stage, n1 AS users, n1 FROM c
      |  UNION ALL SELECT '2_click', n2, n1 FROM c
      |  UNION ALL SELECT '3_purchase', n3, n1 FROM c
      |) t ORDER BY stage""".stripMargin

  /** `evFunnel` with the 7-day conversion window: each stage must land
    * within 7 days of the previous stage entry. */
  val evFunnelWindow: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |    AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1
      |),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |    AND e.ts <= s2.t2 + INTERVAL 7 DAY GROUP BY 1
      |),
      |c AS (
      |  SELECT (SELECT COUNT(*) FROM s1) AS n1,
      |         (SELECT COUNT(*) FROM s2) AS n2,
      |         (SELECT COUNT(*) FROM s3) AS n3
      |)
      |SELECT stage, users, ROUND(users / n1, 6) AS pct_of_first FROM (
      |  SELECT '1_signup' AS stage, n1 AS users, n1 FROM c
      |  UNION ALL SELECT '2_click', n2, n1 FROM c
      |  UNION ALL SELECT '3_purchase', n3, n1 FROM c
      |) t ORDER BY stage""".stripMargin

  /** Weekly cohort retention: ISO-week truncation on both the first
    * event (cohort) and each active week; offsets are exact multiples
    * of 7 days, so the /7 division is lossless in both engines. */
  val evRetention: String =
    """WITH cohort AS (
      |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY 1
      |),
      |active AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events
      |)
      |SELECT cohort_week,
      |       CAST((week - cohort_week) / 7 AS BIGINT) AS week_offset,
      |       COUNT(DISTINCT user_id) AS users
      |FROM active JOIN cohort USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** IQR outlier audit: Tukey fences from 6-dp-rounded exact
    * quantiles, so the fence comparison is engine-deterministic. */
  val evOutliers: String =
    """WITH q AS (
      |  SELECT event_type,
      |         ROUND(quantile_cont(value, 0.25), 6) AS q1,
      |         ROUND(quantile_cont(value, 0.75), 6) AS q3,
      |         COUNT(*) AS n
      |  FROM events GROUP BY 1
      |)
      |SELECT e.event_type, q.q1, q.q3, ROUND(q.q3 - q.q1, 6) AS iqr, q.n,
      |       CAST(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
      |                       OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN q USING (event_type)
      |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin

  /** Inter-event gaps: integer epoch-microsecond differences over the
    * per-user ordered stream; all aggregates exact until the final
    * mean division. */
  val evGaps: String =
    """WITH g AS (
      |  SELECT event_type,
      |         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
      |  FROM events
      |)
      |SELECT event_type, COUNT(*) AS n,
      |       ROUND(AVG(gap), 6) AS mean_gap_us,
      |       quantile_cont(gap, 0.5) AS p50_gap_us,
      |       MAX(gap) AS max_gap_us
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Cumulative user acquisition: integer counts, same-order cumsum
    * over the daily rollup. */
  val evCumulativeUsers: String =
    """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS date FROM events GROUP BY 1),
      |d AS (SELECT date, COUNT(*) AS n_new FROM f GROUP BY 1)
      |SELECT date, n_new,
      |       CAST(SUM(n_new) OVER (ORDER BY date
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM d ORDER BY date""".stripMargin

  /** Heavy hitters: exact decimal sums, value-then-id ordered cut. */
  val evTopUsers: String =
    """SELECT user_id,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       COUNT(*) AS n_purchases
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY 1
      |ORDER BY total_value DESC, user_id
      |LIMIT 10""".stripMargin

  /** RFM segmentation: per-user rollup, recency against the global
    * max date, NTILE(5) quintiles on pinned (metric, user_id) total
    * orders, coarse lifecycle label — mirroring `Events.rfm`. */
  val evRfm: String =
    """WITH u AS (
      |  SELECT user_id, MAX(CAST(ts AS DATE)) AS last_date, COUNT(*) AS frequency,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      |  FROM events GROUP BY 1
      |),
      |r AS (
      |  SELECT user_id,
      |         CAST(date_diff('day', last_date, MAX(last_date) OVER ()) AS BIGINT) AS r_days,
      |         frequency, monetary
      |  FROM u
      |),
      |s AS (
      |  SELECT user_id, r_days, frequency, monetary,
      |         CAST(NTILE(5) OVER (ORDER BY r_days DESC, user_id) AS BIGINT) AS r_score,
      |         CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_score,
      |         CAST(NTILE(5) OVER (ORDER BY monetary, user_id) AS BIGINT) AS m_score
      |  FROM r
      |)
      |SELECT user_id, r_days, frequency, monetary, r_score, f_score, m_score,
      |       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
      |            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
      |            WHEN r_score <= 2 AND f_score <= 2 THEN 'dormant'
      |            ELSE 'regular' END AS segment
      |FROM s ORDER BY user_id""".stripMargin

  /** A/B readout: above-mean-purchase-count conversion (integer-exact
    * `np·nu > tot`), conditional one-row rollup, pooled two-proportion
    * z NULL-guarded at pp∈{0,1} — mirroring `Events.abTest`. */
  val evAbtest: String =
    """WITH u AS (
      |  SELECT user_id,
      |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
      |  FROM events GROUP BY 1
      |),
      |t0 AS (SELECT CAST(SUM(np) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nu FROM u),
      |c AS (
      |  SELECT u.user_id,
      |         CASE WHEN u.np * t0.nu > t0.tot THEN 1 ELSE 0 END AS conv
      |  FROM u CROSS JOIN t0
      |),
      |a AS (
      |  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
      |         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM c
      |),
      |t AS (SELECT *, CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pp FROM a)
      |SELECT n_a, conv_a, ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
      |       n_b, conv_b, ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
      |       CASE WHEN pp = 0 OR pp = 1 THEN NULL
      |            ELSE ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
      |                       / SQRT(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)), 6) END AS z
      |FROM t""".stripMargin

  /** Power-of-2 length buckets with padding waste — mirroring
    * `Text.lengthBuckets`' 21-row range-join dim. */
  val textLengthBuckets: String =
    """WITH toks AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents
      |),
      |dim AS (
      |  SELECT CAST(POWER(2, k) AS BIGINT) AS bucket_lo,
      |         CAST(POWER(2, k) AS BIGINT) * 2 - 1 AS bucket_hi
      |  FROM (SELECT unnest(generate_series(0, 20)) AS k)
      |),
      |j AS (
      |  SELECT bucket_lo, bucket_hi, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(tok) AS BIGINT) AS n_tokens
      |  FROM toks JOIN dim ON tok >= bucket_lo AND tok <= bucket_hi
      |  GROUP BY 1, 2
      |)
      |SELECT bucket_lo, bucket_hi, n_docs, n_tokens,
      |       ROUND(CAST(n_docs * (bucket_hi + 1) - n_tokens AS DOUBLE)
      |             / (n_docs * (bucket_hi + 1)), 6) AS pad_waste
      |FROM j ORDER BY bucket_lo""".stripMargin

  /** Integerized temperature rebalancing: epochs = min(4, ⌈Tmax/Ts⌉)
    * fanout per doc — mirroring `Text.epochMix`. */
  val textEpochMix: String =
    """WITH d AS (
      |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents
      |),
      |s AS (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS t FROM d GROUP BY 1),
      |mx AS (SELECT MAX(t) AS tm FROM s),
      |e AS (SELECT source, LEAST(4, (tm + t - 1) // t) AS epochs FROM s CROSS JOIN mx)
      |SELECT d.doc_id, d.source, CAST(u.epoch AS BIGINT) AS epoch
      |FROM d JOIN e USING (source), UNNEST(generate_series(1, e.epochs)) AS u(epoch)
      |ORDER BY doc_id, epoch""".stripMargin

  /** ABC/Pareto classification in integer ten-thousandths with
    * integer threshold compares — mirroring `Relational.abcPareto`. */
  val relAbcPareto: String =
    """WITH pp AS (
      |  SELECT l_partkey,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) * 10000 AS BIGINT) AS r4
      |  FROM lineitem GROUP BY 1
      |),
      |t AS (SELECT CAST(SUM(r4) AS BIGINT) AS t FROM pp),
      |c AS (
      |  SELECT l_partkey, r4, t.t,
      |         CAST(SUM(r4) OVER (ORDER BY r4 DESC, l_partkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM pp CROSS JOIN t
      |),
      |k AS (
      |  SELECT *, CASE WHEN cum * 5 <= t * 4 THEN 'A'
      |                 WHEN cum * 20 <= t * 19 THEN 'B'
      |                 ELSE 'C' END AS abc_class
      |  FROM c
      |)
      |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |       ROUND(CAST(SUM(r4) AS DOUBLE) / 10000, 6) AS revenue,
      |       ROUND(CAST(SUM(r4) AS DOUBLE) / t, 6) AS share
      |FROM k GROUP BY abc_class, t ORDER BY abc_class""".stripMargin

  /** Wilson-lower-bound supplier return-rate ranking (z = 1.96 as a
    * runtime product in BOTH engines) — mirroring
    * `Relational.supplierScore`. */
  val relSupplierScore: String =
    """WITH s AS (
      |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_items,
      |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns
      |  FROM lineitem GROUP BY 1
      |),
      |w AS (
      |  SELECT l_suppkey, n_items, n_returns,
      |         CAST(n_returns AS DOUBLE) / n_items AS p,
      |         CAST(n_items AS DOUBLE) AS nd
      |  FROM s
      |)
      |SELECT w.l_suppkey AS s_suppkey, sup.s_name, n_items, n_returns,
      |       ROUND(p, 6) AS return_rate,
      |       ROUND((p + (1.96 * 1.96) / (2.0 * nd)
      |              - 1.96 * SQRT(p * (1 - p) / nd + (1.96 * 1.96) / (4.0 * nd * nd)))
      |             / (1.0 + (1.96 * 1.96) / nd), 6) AS wilson_low
      |FROM w JOIN supplier sup ON w.l_suppkey = sup.s_suppkey
      |ORDER BY wilson_low DESC, s_suppkey LIMIT 10""".stripMargin

  /** First-signup → first-subsequent-purchase gap: exact
    * integral-position order statistics + integer-sum mean —
    * mirroring `Events.timeToConvert`. */
  val evTtc: String =
    """WITH su AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |),
      |g AS (
      |  SELECT e.user_id, CAST(MIN(epoch_us(e.ts) - su.t0) AS BIGINT) AS gap
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.t0
      |  GROUP BY 1
      |),
      |r AS (
      |  SELECT gap,
      |         CAST(COUNT(*) OVER () AS BIGINT) AS n,
      |         ROW_NUMBER() OVER (ORDER BY gap, user_id) AS rn
      |  FROM g
      |)
      |SELECT MAX(n) AS n_users,
      |       ROUND(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) / 1e6, 6) AS median_s,
      |       ROUND(MAX(CASE WHEN rn = GREATEST(1, (9 * n) // 10) THEN gap END) / 1e6, 6) AS p90_s,
      |       ROUND(CAST(SUM(gap) AS DOUBLE) / MAX(n) / 1e6, 6) AS mean_s
      |FROM r""".stripMargin

  /** Q4-shaped EXISTS-over-fact late-order tally — mirroring
    * `Relational.lateOrders`. */
  val relLateOrders: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 90
      |)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Days-since-last-activity buckets off a 1-row max-date carrier —
    * mirroring `Events.dormancy`. */
  val evDormancy: String =
    """WITH la AS (SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d FROM events GROUP BY 1),
      |mx AS (SELECT MAX(last_d) AS max_d FROM la),
      |g AS (SELECT user_id, date_diff('day', last_d, max_d) AS gap FROM la CROSS JOIN mx),
      |b AS (
      |  SELECT CASE WHEN gap = 0 THEN '0_today' WHEN gap <= 7 THEN '1_week'
      |              WHEN gap <= 30 THEN '2_month' ELSE '3_dormant' END AS bucket,
      |         CASE WHEN gap = 0 THEN 0 WHEN gap <= 7 THEN 1
      |              WHEN gap <= 30 THEN 8 ELSE 31 END AS lo_days
      |  FROM g
      |)
      |SELECT bucket, CAST(lo_days AS BIGINT) AS lo_days, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM b GROUP BY 1, 2 ORDER BY bucket""".stripMargin

  /** p-chart daily error-rate control limits with pooled center —
    * mirroring `Events.errorSpc`. */
  val evErrorSpc: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS date, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err
      |  FROM events GROUP BY 1
      |),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(n_err) AS BIGINT) AS te FROM daily),
      |x AS (
      |  SELECT d.*, CAST(te AS DOUBLE) / tn AS pbar,
      |         SQRT((CAST(te AS DOUBLE) / tn) * (1 - CAST(te AS DOUBLE) / tn) / d.n) AS se,
      |         CAST(n_err AS DOUBLE) / d.n AS rate
      |  FROM daily d CROSS JOIN tot
      |)
      |SELECT date, n, n_err, ROUND(rate, 6) AS rate,
      |       ROUND(pbar + 3.0 * se, 6) AS ucl,
      |       ROUND(GREATEST(0.0, pbar - 3.0 * se), 6) AS lcl,
      |       (rate > pbar + 3.0 * se OR rate < GREATEST(0.0, pbar - 3.0 * se)) AS oob
      |FROM x ORDER BY date""".stripMargin

  /** Top-20 brand pairs by lift with min support 3, order-key
    * self-join pair enumeration — mirroring `Relational.basket`. */
  val relBasket: String =
    """WITH ob AS (
      |  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |),
      |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM ob),
      |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cb FROM ob GROUP BY 1),
      |p2 AS (
      |  SELECT a.b AS brand_a, b2.b AS brand_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM ob a JOIN ob b2 ON a.o = b2.o AND a.b < b2.b
      |  GROUP BY 1, 2
      |)
      |SELECT brand_a, brand_b, n_ab,
      |       ROUND(CAST(n_ab AS DOUBLE) * n.n / (ca.cb * cb2.cb), 6) AS lift
      |FROM p2
      |JOIN c ca ON p2.brand_a = ca.b
      |JOIN c cb2 ON p2.brand_b = cb2.b
      |CROSS JOIN n
      |WHERE n_ab >= 3
      |ORDER BY lift DESC, brand_a, brand_b LIMIT 20""".stripMargin

  /** Gini + top-decile share on the GROUPED activity distribution
    * (rank-sum per tie-group: m·below + m(m+1)/2), HUGEINT exact —
    * mirroring `Events.gini`'s DECIMAL accumulation. */
  val evGini: String =
    """WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
      |bc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM pu GROUP BY 1),
      |cum AS (
      |  SELECT c, m,
      |         CAST(COALESCE(SUM(m) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
      |         CAST(SUM(m) OVER () AS BIGINT) AS n,
      |         CAST(SUM(c * m) OVER () AS BIGINT) AS t
      |  FROM bc
      |),
      |ext AS (SELECT *, (n + 9) // 10 AS k, n - below - m AS above FROM cum),
      |agg AS (
      |  SELECT MAX(n) AS n_users, MAX(t) AS total_events, MAX(k) AS top10_users,
      |         SUM(CAST(c AS HUGEINT) * (CAST(m AS HUGEINT) * below + (CAST(m AS HUGEINT) * (m + 1)) // 2)) AS s,
      |         SUM(CAST(GREATEST(0, LEAST(m, k - above)) AS HUGEINT) * c) AS top_ev
      |  FROM ext
      |)
      |SELECT n_users, total_events,
      |       ROUND(CAST(2 * s - (CAST(n_users AS HUGEINT) + 1) * total_events AS DOUBLE)
      |             / CAST(CAST(n_users AS HUGEINT) * total_events AS DOUBLE), 6) AS gini,
      |       top10_users,
      |       ROUND(CAST(top_ev AS DOUBLE) / total_events, 6) AS top10_share
      |FROM agg""".stripMargin

  /** Peak trailing-1h event rate per user, top-5 — integer-micros
    * RANGE frame mirroring `Events.burst`. */
  val evBurst: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |w AS (
      |  SELECT user_id,
      |         CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us
      |           RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS BIGINT) AS in_hour
      |  FROM e
      |),
      |a AS (SELECT user_id, MAX(in_hour) AS burst_1h, CAST(COUNT(*) AS BIGINT) AS n_events
      |      FROM w GROUP BY 1)
      |SELECT user_id, burst_1h, n_events FROM a
      |ORDER BY burst_1h DESC, user_id LIMIT 5""".stripMargin

  /** DAU/WAU/MAU: (user, day) rollup exploded to the ≤30 trailing
    * target days (integer offsets), filtered count-distincts per
    * target day, open end bounded by max date. */
  val evActiveUsers: String =
    """WITH uw AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |mx AS (SELECT MAX(d) AS maxd FROM uw),
      |ex AS (
      |  SELECT user_id, off, d + CAST(off AS INT) AS t
      |  FROM uw, UNNEST(range(0, 30)) AS u(off)
      |),
      |a AS (
      |  SELECT t AS date,
      |         CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) AS BIGINT) AS dau,
      |         CAST(COUNT(DISTINCT CASE WHEN off <= 6 THEN user_id END) AS BIGINT) AS wau,
      |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
      |  FROM ex WHERE t <= (SELECT maxd FROM mx)
      |  GROUP BY 1
      |)
      |SELECT date, dau, wau, mau,
      |       ROUND(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
      |FROM a ORDER BY date""".stripMargin

  /** Top 3-step event-type paths: lead ×2 over the per-user ordered
    * stream, count-desc/path top-10. */
  val evPaths: String =
    """WITH p AS (
      |  SELECT event_type || '>' ||
      |         LEAD(event_type, 1) OVER w || '>' ||
      |         LEAD(event_type, 2) OVER w AS path,
      |         LEAD(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT path, COUNT(*) AS n FROM p WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** Cohort LTV: first-event cohorts, exact DECIMAL day values,
    * cumulative over age within cohort, per-user LTV. */
  val evCohortLtv: String =
    """WITH f AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1
      |),
      |sized AS (SELECT cohort_date, COUNT(*) AS cohort_users FROM f GROUP BY 1),
      |dv AS (
      |  SELECT f.cohort_date,
      |         CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS BIGINT) AS age,
      |         SUM(CAST(e.value AS DECIMAL(18,2))) AS day_value
      |  FROM events e JOIN f ON f.user_id = e.user_id
      |  GROUP BY 1, 2
      |),
      |c AS (
      |  SELECT cohort_date, age,
      |         CAST(SUM(day_value) OVER (PARTITION BY cohort_date ORDER BY age
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
      |  FROM dv
      |)
      |SELECT c.cohort_date, c.age, s.cohort_users, c.cum_value,
      |       ROUND(c.cum_value / s.cohort_users, 6) AS ltv
      |FROM c JOIN sized s USING (cohort_date)
      |ORDER BY c.cohort_date, c.age""".stripMargin

  /** Daily lifecycle accounting: per-user lag/lead over distinct
    * active days; churn charged to the first inactive day, bounded by
    * the stream's max date — mirroring `Events.lifecycle`. */
  val evLifecycle: String =
    """WITH uw AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |st AS (
      |  SELECT user_id, d,
      |         MAX(d) OVER () AS maxd,
      |         LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev,
      |         LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt
      |  FROM uw
      |),
      |states AS (
      |  SELECT d AS date,
      |         CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |         CAST(SUM(CASE WHEN prev = d - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |         CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < d - 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_resurrected
      |  FROM st GROUP BY 1
      |),
      |churn AS (
      |  SELECT d + 1 AS date, CAST(COUNT(*) AS BIGINT) AS n_churned
      |  FROM st
      |  WHERE (nxt IS NULL OR nxt > d + 1) AND d + 1 <= maxd
      |  GROUP BY 1
      |)
      |SELECT COALESCE(s.date, c.date) AS date,
      |       COALESCE(s.n_new, 0) AS n_new,
      |       COALESCE(s.n_retained, 0) AS n_retained,
      |       COALESCE(s.n_resurrected, 0) AS n_resurrected,
      |       COALESCE(c.n_churned, 0) AS n_churned
      |FROM states s FULL OUTER JOIN churn c ON s.date = c.date
      |ORDER BY 1""".stripMargin

  /** Markov transitions: lead over the per-user ordered stream
    * (event_id ties), normalized within from_type. */
  val evMarkov: String =
    """WITH nxt AS (
      |  SELECT event_type AS from_type,
      |         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events
      |),
      |c AS (
      |  SELECT from_type, to_type, COUNT(*) AS n
      |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, n,
      |       ROUND(n / SUM(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin

  /** Last-touch attribution: carried-forward previous non-purchase
    * event per user (event_id breaks ts ties), purchase rollup by
    * attributed channel. */
  val evAttribution: String =
    """WITH t AS (
      |  SELECT event_type, value,
      |         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_touch
      |  FROM events
      |)
      |SELECT COALESCE(prev_touch, 'none') AS channel,
      |       COUNT(*) AS purchases,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Derived non-aligned intervals, broadcast-dim range join. */
  val evRangeJoin: String =
    """WITH b AS (SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events),
      |iv AS (
      |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
      |                                     INTERVAL 11 DAY)) AS DATE) AS start
      |  FROM b
      |),
      |iv2 AS (SELECT start, start + 3 AS iv_end FROM iv)
      |SELECT iv2.start, COUNT(*) AS n,
      |       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events e
      |JOIN iv2 ON e.ts >= CAST(iv2.start AS TIMESTAMP)
      |        AND e.ts <  CAST(iv2.iv_end AS TIMESTAMP)
      |GROUP BY iv2.start
      |ORDER BY iv2.start""".stripMargin

  // ---------------------------------------------------------------- text

  private val enList = "['the','a','and','of','to']"

  private def markerLen(list: String): String =
    s"len(list_filter(string_split(lower(text), ' '), w -> list_contains($list, w)))"

  val textLangId: String = {
    val m = Map(
      "s_en" -> enList,
      "s_de" -> "['der','die','das','und','ist']",
      "s_es" -> "['el','los','las','y','es']",
      "s_fr" -> "['le','la','les','et','est']",
      "s_zh" -> "['de0','shi4','zai4','le0','wo3']")
    val cols = m.map { case (n, l) => s"${markerLen(l)} AS $n" }.mkString(",\n    ")
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    $cols
       |  FROM documents
       |)
       |SELECT doc_id, lang,
       |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
       |       WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
       |       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
       |       WHEN s_fr >= s_zh THEN 'fr'
       |       ELSE 'zh' END AS pred_lang,
       |  CAST(greatest(s_en, s_de, s_es, s_fr, s_zh) AS BIGINT) AS score
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Lang-ID confusion matrix: the langId CTE re-aggregated against
    * the labeled column; row share normalizes within the true lang. */
  val textLangIdEval: String =
    s"""WITH pred AS (${textLangId.replace("ORDER BY doc_id", "")})
       |SELECT lang, pred_lang, COUNT(*) AS n,
       |       ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS frac
       |FROM pred
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Corpus mixture: integer counts/char mass, two rounded ratios. */
  val textSourceMix: String =
    """WITH m AS (
      |  SELECT source, lang, COUNT(*) AS n_docs,
      |         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |         ROUND(SUM(n_chars) / COUNT(*), 6) AS mean_chars
      |  FROM documents GROUP BY 1, 2
      |),
      |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM m)
      |SELECT source, lang, n_docs, total_chars, mean_chars,
      |       ROUND(n_docs / t.total_docs, 6) AS doc_share
      |FROM m CROSS JOIN t
      |ORDER BY source, lang""".stripMargin

  /** Token-budget mixture resample: temperature weights
    * w = floor(sqrt(n_docs)) per (source, lang), budget = corpus
    * tokens // 4, per-group share via the exact floor-division
    * identity (b // Σw)·w + ((b % Σw)·w) // Σw — integer arithmetic
    * end to end, mirroring `Text.resampleMix` bit-for-bit (no float
    * compare at the selection boundary). */
  val textResampleMix: String =
    """WITH d AS (
      |  SELECT doc_id, source, lang, md5(text) AS h,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents
      |),
      |g AS (
      |  SELECT source, lang, CAST(floor(sqrt(COUNT(*))) AS BIGINT) AS w
      |  FROM d GROUP BY 1, 2
      |),
      |t AS (SELECT CAST(SUM(n_toks) AS BIGINT) // 4 AS b FROM d),
      |s AS (SELECT CAST(SUM(w) AS BIGINT) AS sum_w FROM g),
      |bud AS (
      |  SELECT source, lang,
      |         (b // sum_w) * w + ((b % sum_w) * w) // sum_w AS budget
      |  FROM g CROSS JOIN t CROSS JOIN s
      |),
      |c AS (
      |  SELECT d.doc_id, d.source, d.lang, d.n_toks, bud.budget,
      |         CAST(SUM(n_toks) OVER (PARTITION BY d.source, d.lang
      |           ORDER BY h, doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM d JOIN bud USING (source, lang)
      |)
      |SELECT doc_id, source, lang, n_toks
      |FROM c WHERE cum - n_toks < budget ORDER BY doc_id""".stripMargin

  /** The ONE composite quality-score expression over a raw `text`
    * column — the single source `textQuality` and `textCurate` both
    * interpolate, mirroring `Text.quality`'s formula. */
  private lazy val qualityScoreExpr: String =
    s"""ROUND(least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) * 0.5
       |        + CAST(${markerLen(enList)} AS DOUBLE) / len(string_split(text, ' ')) * 0.3
       |        + CASE WHEN CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |                      / len(string_split(text, ' ')) BETWEEN 3.0 AND 8.0
       |               THEN 0.2 ELSE 0.0 END, 6)""".stripMargin

  val textQuality: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(${markerLen(enList)} AS BIGINT) AS n_stop,
       |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS avg_token_len,
       |    $qualityScoreExpr AS quality
       |  FROM documents
       |)
       |SELECT doc_id, n_tokens,
       |  ROUND(avg_token_len, 6) AS avg_token_len,
       |  ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
       |  quality
       |FROM q ORDER BY doc_id""".stripMargin

  /** Quality-threshold retention sweep: the 10-row threshold dim
    * LEFT-joined against per-doc quality (the `simNearDupSweep`
    * shape), so zero-survivor thresholds survive with 0 counts. */
  val textQualitySweep: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         $qualityScoreExpr AS quality
       |  FROM documents
       |),
       |t AS (SELECT UNNEST([0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold)
       |SELECT t.threshold,
       |       CAST(COUNT(q.doc_id) AS BIGINT) AS n_docs,
       |       CAST(COALESCE(SUM(q.n_tokens), 0) AS BIGINT) AS n_tokens
       |FROM t LEFT JOIN q ON q.quality >= t.threshold
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared CTE: (doc_id, h) — distinct 56-bit md5 shingle hashes per
    * doc, the ONE compact shingle-set representation every consumer
    * (`dedupJaccard`, `textDecontaminate`, `textCurate`) intersects
    * on, mirroring the Spark side's hashed sets. */
  private lazy val shingleHashCte: String =
    """shh AS (
      |  SELECT doc_id, UNNEST(list_distinct(list_transform(
      |    list_transform(range(1, length(text) - 11 + 1), i -> substr(text, CAST(i AS INT), 12)),
      |    s -> CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)))) AS h
      |  FROM documents WHERE length(text) >= 12
      |)""".stripMargin

  /** Shared CTEs: shingle hashes + the held-out (doc_id % 50 = 0)
    * eval set — the decontamination core `textDecontaminate` and
    * `textCurate` both probe. */
  private lazy val heldOutCtes: String =
    s"""$shingleHashCte,
       |held AS (SELECT DISTINCT h FROM shh WHERE doc_id % 50 = 0)""".stripMargin

  /** Shared fragment: undirected edges over the capped candidate
    * pairs + recursive min-reachability — the ONE traversal all three
    * cluster oracles (`dedupClusters`, `dedupApply`, `textCurate`)
    * build on, mirroring `Dedup.clustersFromPairs`' fixpoint. UNION
    * (not UNION ALL) dedups the frontier, so the recursion terminates
    * at the component diameter. Requires WITH RECURSIVE and the
    * `cand` CTE in scope. */
  private lazy val clusterCtes: String =
    """edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM cand
      |  UNION ALL SELECT doc_b, doc_a FROM cand
      |),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT w.id, e.dst FROM reach w JOIN edges e ON e.src = w.r
      |)""".stripMargin

  /** Composed curation decision: dedup-cluster losers (recursive CTE
    * over the capped candidate pairs), contamination, quality < 0.5,
    * held-out membership — one flag row per document. */
  /** Shared CTE: the PII-detector input — corpus text with the
    * deterministic synthetic contact footer on 1-in-7 docs (email +
    * phone; 1-in-14 also an IP), mirroring `Text.piiText`. */
  private lazy val piiTextCte: String =
    """pt AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 0 THEN concat(text,
      |           ' contact u', CAST(doc_id AS VARCHAR), '@example.com phone 555-012-',
      |           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
      |           CASE WHEN doc_id % 14 = 0 THEN concat(' ip 10.0.',
      |             CAST(doc_id % 256 AS VARCHAR), '.', CAST(doc_id % 100 AS VARCHAR))
      |           ELSE '' END)
      |         ELSE text END AS t
      |  FROM documents
      |)""".stripMargin

  /** PII detection + redaction audit, Java∩RE2-portable patterns
    * mirroring `Text.pii` (DuckDB regexp_replace needs the 'g' flag
    * for replace-all; Spark's replaces all by default). */
  val textPii: String = {
    val (em, ph, ip) =
      (ops.Text.EmailRe, ops.Text.PhoneRe, ops.Text.IpRe)
    s"""WITH $piiTextCte,
       |c AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(t, '$em')) AS BIGINT) AS n_emails,
       |    CAST(len(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phones,
       |    CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
       |    CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
       |      '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'), '$ip', '[IP]', 'g'))
       |      AS BIGINT) AS redacted_len
       |  FROM pt
       |)
       |SELECT doc_id, n_emails, n_phones, n_ips,
       |       n_emails + n_phones + n_ips AS n_pii, redacted_len,
       |       n_emails + n_phones + n_ips > 0 AS has_pii
       |FROM c ORDER BY doc_id""".stripMargin
  }

  val textCurate: String =
    s"""WITH RECURSIVE $minhashCtes,
       |$clusterCtes,
       |cl AS (
       |  SELECT id AS doc_id, id = MIN(r) AS keep FROM reach GROUP BY id
       |),
       |$heldOutCtes,
       |cont AS (
       |  SELECT s.doc_id FROM shh s JOIN held ON s.h = held.h
       |  WHERE s.doc_id % 50 <> 0
       |  GROUP BY s.doc_id HAVING COUNT(DISTINCT s.h) >= 64
       |),
       |q AS (
       |  SELECT doc_id, $qualityScoreExpr AS quality
       |  FROM documents
       |),
       |$piiTextCte,
       |ph AS (
       |  SELECT doc_id FROM pt
       |  WHERE len(regexp_extract_all(t, '${ops.Text.EmailRe}')) > 0
       |    AND len(regexp_extract_all(t, '${ops.Text.PhoneRe}')) > 0
       |    AND len(regexp_extract_all(t, '${ops.Text.IpRe}')) > 0
       |),
       |f AS (
       |  SELECT d.doc_id,
       |         d.doc_id % 50 = 0 AS heldout,
       |         COALESCE(NOT cl.keep, FALSE) AS dup_loser,
       |         cont.doc_id IS NOT NULL AS contaminated,
       |         COALESCE(q.quality < 0.35, FALSE) AS low_quality,
       |         ph.doc_id IS NOT NULL AS pii_heavy
       |  FROM documents d
       |  LEFT JOIN cl ON cl.doc_id = d.doc_id
       |  LEFT JOIN cont ON cont.doc_id = d.doc_id
       |  LEFT JOIN q ON q.doc_id = d.doc_id
       |  LEFT JOIN ph ON ph.doc_id = d.doc_id
       |)
       |SELECT doc_id, heldout, dup_loser, contaminated, low_quality, pii_heavy,
       |       NOT heldout AND NOT dup_loser AND NOT contaminated
       |       AND NOT low_quality AND NOT pii_heavy AS kept
       |FROM f ORDER BY doc_id""".stripMargin

  /** Curation waterfall: per-doc FIRST failing gate (held-out, exact
    * dup, contamination, quality, PII — `Text.curationFunnel`'s
    * order), then survivor doc/token counts per stage via the bounded
    * stage-dim non-equi join. */
  val textFunnel: String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |),
       |xd AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS k FROM documents
       |  ) t WHERE doc_id <> k
       |),
       |$heldOutCtes,
       |cont AS (
       |  SELECT s.doc_id FROM shh s JOIN held ON s.h = held.h
       |  WHERE s.doc_id % 50 <> 0
       |  GROUP BY s.doc_id HAVING COUNT(DISTINCT s.h) >= 64
       |),
       |q AS (
       |  SELECT doc_id, $qualityScoreExpr AS quality
       |  FROM documents
       |),
       |$piiTextCte,
       |ph AS (
       |  SELECT doc_id FROM pt
       |  WHERE len(regexp_extract_all(t, '${ops.Text.EmailRe}')) > 0
       |    AND len(regexp_extract_all(t, '${ops.Text.PhoneRe}')) > 0
       |    AND len(regexp_extract_all(t, '${ops.Text.IpRe}')) > 0
       |),
       |cut AS (
       |  SELECT d.doc_id, d.n_tokens,
       |         CASE WHEN d.doc_id % 50 = 0 THEN 1
       |              WHEN xd.doc_id IS NOT NULL THEN 2
       |              WHEN cont.doc_id IS NOT NULL THEN 3
       |              WHEN q.quality < 0.35 THEN 4
       |              WHEN ph.doc_id IS NOT NULL THEN 5
       |              ELSE 99 END AS cut
       |  FROM d
       |  LEFT JOIN xd ON xd.doc_id = d.doc_id
       |  LEFT JOIN cont ON cont.doc_id = d.doc_id
       |  LEFT JOIN q ON q.doc_id = d.doc_id
       |  LEFT JOIN ph ON ph.doc_id = d.doc_id
       |),
       |stages AS (
       |  SELECT * FROM (VALUES (0, 'total'), (1, 'heldout'), (2, 'exact_dup'),
       |    (3, 'contaminated'), (4, 'low_quality'), (5, 'pii_heavy')) AS t(stage, gate)
       |)
       |SELECT CAST(s.stage AS BIGINT) AS stage, s.gate,
       |       CAST(COUNT(c.doc_id) AS BIGINT) AS n_docs,
       |       CAST(COALESCE(SUM(c.n_tokens), 0) AS BIGINT) AS n_tokens
       |FROM stages s LEFT JOIN cut c ON c.cut > s.stage
       |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  val textVocab: String =
    """WITH t AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
      |)
      |SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      |FROM t GROUP BY tok
      |ORDER BY tf DESC, tok LIMIT 50""".stripMargin

  /** Zipf fit over the top-50 vocabulary: ln/regr aggregates on exact
    * integer counts and 50 deterministic ranks. */
  val textZipf: String =
    s"""WITH v AS ($textVocab),
       |r AS (
       |  SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, tok) AS rank FROM v
       |)
       |SELECT ROUND(regr_slope(ln(tf), ln(rank)), 6) AS zipf_slope,
       |       ROUND(regr_intercept(ln(tf), ln(rank)), 6) AS zipf_intercept,
       |       ROUND(regr_r2(ln(tf), ln(rank)), 6) AS r2,
       |       COUNT(*) AS n_top
       |FROM r""".stripMargin

  val textSampleStratified: String =
    """SELECT source, doc_id FROM documents
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(text), doc_id) <= 10
      |ORDER BY source, doc_id""".stripMargin

  /** Chunking: list_slice is 1-based with INCLUSIVE end and clamps at
    * the list end — identical to Spark's slice(start, length). The
    * two UNNESTs in one select list zip positionally. */
  val textChunks: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    UNNEST(range(0, (len(toks) - 1) // 48 + 1)) AS chunk_idx,
      |    UNNEST(list_transform(range(0, (len(toks) - 1) // 48 + 1),
      |      i -> array_to_string(list_slice(toks, CAST(i * 48 + 1 AS INT), CAST(i * 48 + 64 AS INT)), ' '))) AS chunk
      |  FROM t
      |)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_toks,
      |       md5(chunk) AS chunk_hash
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  val textTokens: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  val textRepetition: String =
    """WITH t AS (
      |  SELECT doc_id, u.tok AS tok
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
      |),
      |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
      |r AS (
      |  SELECT doc_id, tok, c,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn,
      |         SUM(c) OVER (PARTITION BY doc_id) AS n_tokens
      |  FROM c
      |)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, tok AS top_tok, c AS top_n,
      |       ROUND(CAST(c AS DOUBLE) / n_tokens, 6) AS rep_ratio
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  val textSplit: String =
    """SELECT doc_id,
      |       CAST('0x' || substr(md5(text), 1, 7) AS BIGINT) % 100 AS bucket,
      |       CASE WHEN CAST('0x' || substr(md5(text), 1, 7) AS BIGINT) % 100 < 90 THEN 'train'
      |            WHEN CAST('0x' || substr(md5(text), 1, 7) AS BIGINT) % 100 < 95 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TF-IDF top-3 terms per doc; rank on the ROUNDED score + tok
    * tiebreak so both engines order identically. LN is natural log on
    * both sides. */
  val textTfidf: String =
    """WITH c AS (
      |  SELECT doc_id, u.tok AS tok, COUNT(*) AS c
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
      |  GROUP BY doc_id, u.tok
      |),
      |nt AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens FROM c GROUP BY doc_id),
      |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM c GROUP BY tok),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |s AS (
      |  SELECT c.doc_id, c.tok,
      |         ROUND((c.c::DOUBLE / nt.n_tokens::DOUBLE)
      |               * LN(n.n_docs::DOUBLE / df.df::DOUBLE), 6) AS tfidf
      |  FROM c JOIN nt ON nt.doc_id = c.doc_id JOIN df ON df.tok = c.tok, n
      |),
      |r AS (
      |  SELECT doc_id, tok, tfidf,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rnk
      |  FROM s
      |)
      |SELECT doc_id, tok, tfidf, CAST(rnk AS BIGINT) AS rank
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** Okapi BM25 CTE chain through per-query ranks (k1 = 1.2,
    * b = 0.75, Lucene +1 idf) — mirroring `Text.bm25Ranks`: posting
    * equi-join candidates, per-term 6-dp rounds summed in DECIMAL so
    * the rank is addend-order-free. Every float literal is ::DOUBLE —
    * bare decimals parse as DECIMAL in DuckDB and would run the
    * arithmetic in decimal, not IEEE double. */
  private def bm25Ctes(k: Int): String =
    s"""c AS MATERIALIZED (
       |  SELECT doc_id, u.tok AS tok, COUNT(*) AS c
       |  FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
       |  GROUP BY doc_id, u.tok
       |),
       |nt AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens FROM c GROUP BY doc_id),
       |bdf AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM c GROUP BY tok),
       |st AS (SELECT COUNT(*) AS n_docs,
       |              CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avgdl FROM nt),
       |bq AS (SELECT DISTINCT doc_id AS qid, tok FROM c WHERE doc_id < 10),
       |bt AS (
       |  SELECT bq.qid, c.doc_id,
       |         ROUND(LN((st.n_docs - bdf.df + 0.5::DOUBLE) / (bdf.df + 0.5::DOUBLE)
       |                  + 1.0::DOUBLE)
       |               * (c.c::DOUBLE * 2.2::DOUBLE)
       |               / (c.c::DOUBLE + 1.2::DOUBLE *
       |                  (0.25::DOUBLE + 0.75::DOUBLE * nt.n_tokens::DOUBLE / st.avgdl)),
       |               6) AS term
       |  FROM bq JOIN c ON c.tok = bq.tok AND c.doc_id <> bq.qid
       |  JOIN bdf ON bdf.tok = bq.tok
       |  JOIN nt ON nt.doc_id = c.doc_id, st
       |),
       |bs AS (SELECT qid, doc_id, SUM(CAST(term AS DECIMAL(18,6))) AS sdec
       |       FROM bt GROUP BY qid, doc_id),
       |br AS (
       |  SELECT qid, doc_id, sdec,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sdec DESC, doc_id) AS rnk
       |  FROM bs
       |),
       |lex AS (SELECT qid, doc_id, sdec, CAST(rnk AS BIGINT) AS lex_rank
       |        FROM br WHERE rnk <= $k)""".stripMargin

  val textBm25: String =
    s"""WITH ${bm25Ctes(5)}
       |SELECT qid, doc_id, CAST(sdec AS DOUBLE) AS score, lex_rank AS rank
       |FROM lex ORDER BY qid, rank""".stripMargin

  /** Reciprocal-rank fusion of BM25 top-10 and exact cosine top-10 —
    * mirroring `Similarity.rrfFusion`: full-outer rank join, fixed
    * two-term fusion expression, 6-dp round, doc-id tiebreak. */
  val simRrfFusion: String = {
    val dotSelf =
      "list_sum(list_transform(range(1, len(embedding) + 1), " +
        "i -> embedding[CAST(i AS INT)]::DOUBLE * embedding[CAST(i AS INT)]::DOUBLE))"
    val cosSel = s"ROUND(${navDotAb("qv.qe", "e.embedding")} / (qv.qn * e.nrm), 6)"
    s"""WITH ${bm25Ctes(10)},
       |vn AS (SELECT vec_id, embedding, SQRT($dotSelf) AS nrm FROM embeddings),
       |qv AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM vn WHERE vec_id < 10),
       |vr AS (
       |  SELECT qid, node AS doc_id, CAST(rnk AS BIGINT) AS vec_rank FROM (
       |    SELECT qv.qid, e.vec_id AS node,
       |           ROW_NUMBER() OVER (PARTITION BY qv.qid
       |             ORDER BY $cosSel DESC, e.vec_id) AS rnk
       |    FROM qv JOIN vn e ON e.vec_id <> qv.qid)
       |  WHERE rnk <= 10
       |),
       |f AS (
       |  SELECT COALESCE(lex.qid, vr.qid) AS qid,
       |         COALESCE(lex.doc_id, vr.doc_id) AS doc_id,
       |         lex.lex_rank, vr.vec_rank
       |  FROM lex FULL OUTER JOIN vr
       |    ON vr.qid = lex.qid AND vr.doc_id = lex.doc_id
       |),
       |g2 AS (
       |  SELECT qid, doc_id, lex_rank, vec_rank,
       |         ROUND(COALESCE(1.0::DOUBLE / (60 + lex_rank), 0.0::DOUBLE)
       |               + COALESCE(1.0::DOUBLE / (60 + vec_rank), 0.0::DOUBLE), 6) AS rrf
       |  FROM f
       |),
       |rr AS (
       |  SELECT qid, doc_id, rrf, lex_rank, vec_rank,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rnk
       |  FROM g2
       |)
       |SELECT qid AS vec_id, doc_id, rrf, lex_rank, vec_rank,
       |       CAST(rnk AS BIGINT) AS rank
       |FROM rr WHERE rnk <= 5 ORDER BY vec_id, rank""".stripMargin
  }

  /** Ranker-disagreement mining — mirrors `Similarity.mineNegatives`:
    * anti-joins (NOT EXISTS) between the BM25 top-10 and the exact
    * cosine top-10, labeled by which ranker is alone. */
  val simMineNegatives: String = {
    val dotSelf =
      "list_sum(list_transform(range(1, len(embedding) + 1), " +
        "i -> embedding[CAST(i AS INT)]::DOUBLE * embedding[CAST(i AS INT)]::DOUBLE))"
    val cosSel = s"ROUND(${navDotAb("qv.qe", "e.embedding")} / (qv.qn * e.nrm), 6)"
    s"""WITH ${bm25Ctes(10)},
       |vn AS (SELECT vec_id, embedding, SQRT($dotSelf) AS nrm FROM embeddings),
       |qv AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM vn WHERE vec_id < 10),
       |vr AS (
       |  SELECT qid, node AS doc_id, CAST(rnk AS BIGINT) AS vec_rank FROM (
       |    SELECT qv.qid, e.vec_id AS node,
       |           ROW_NUMBER() OVER (PARTITION BY qv.qid
       |             ORDER BY $cosSel DESC, e.vec_id) AS rnk
       |    FROM qv JOIN vn e ON e.vec_id <> qv.qid)
       |  WHERE rnk <= 10
       |),
       |vo AS (
       |  SELECT vr.qid, vr.doc_id, 'vec_only' AS side, vr.vec_rank AS rank
       |  FROM vr WHERE NOT EXISTS (
       |    SELECT 1 FROM lex WHERE lex.qid = vr.qid AND lex.doc_id = vr.doc_id)
       |),
       |lo AS (
       |  SELECT lex.qid, lex.doc_id, 'lex_only' AS side, lex.lex_rank AS rank
       |  FROM lex WHERE NOT EXISTS (
       |    SELECT 1 FROM vr WHERE vr.qid = lex.qid AND vr.doc_id = lex.doc_id)
       |)
       |SELECT qid AS vec_id, doc_id, side, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT * FROM vo UNION ALL SELECT * FROM lo)
       |ORDER BY vec_id, side, rank""".stripMargin
  }

  /** Greedy sequence packing: content-hash shard, per-shard cumulative
    * token window, bin = start-offset div 1024. SUM window cast to
    * BIGINT (DuckDB widens to HUGEINT). */
  val textPack: String =
    """WITH d AS (
      |  SELECT doc_id, md5(text) AS h,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents
      |),
      |s AS (
      |  SELECT doc_id, CAST('0x' || substr(h, 1, 7) AS BIGINT) % 8 AS shard, h, n_toks FROM d
      |),
      |w AS (
      |  SELECT doc_id, shard, n_toks,
      |         CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY h, doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM s
      |)
      |SELECT doc_id, shard, (cum - n_toks) // 1024 AS bin, n_toks
      |FROM w ORDER BY doc_id""".stripMargin

  /** Prefix-hash-keyed split: near-exact duplicates co-assign. */
  val textSplitLeakFree: String =
    """SELECT doc_id,
      |       CAST('0x' || substr(md5(substr(text, 1, 40)), 1, 7) AS BIGINT) % 100 AS bucket,
      |       CASE WHEN CAST('0x' || substr(md5(substr(text, 1, 40)), 1, 7) AS BIGINT) % 100 < 90 THEN 'train'
      |            WHEN CAST('0x' || substr(md5(substr(text, 1, 40)), 1, 7) AS BIGINT) % 100 < 95 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Character-distribution entropy: identical substring(range)
    * construction as the Spark side; −p·ln(p) over exact count
    * ratios. */
  val textEntropy: String =
    """WITH ch AS (
      |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch
      |  FROM documents, UNNEST(range(1, length(text) + 1)) AS u(i)
      |  WHERE length(text) >= 1
      |),
      |c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
      |t AS (SELECT doc_id, SUM(c) AS tot FROM c GROUP BY 1)
      |SELECT c.doc_id,
      |       ROUND(SUM(-(c.c / t.tot) * LN(c.c / t.tot)), 6) AS entropy,
      |       COUNT(*) AS n_distinct_chars
      |FROM c JOIN t USING (doc_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bigram novelty: distinct per-doc bigrams vs their corpus-wide
    * first owner (min doc_id). */
  val textNovelty: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT DISTINCT doc_id, t[CAST(i AS INT)] AS a, t[CAST(i AS INT) + 1] AS b
      |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
      |),
      |f AS (SELECT a, b, MIN(doc_id) AS first_doc FROM bg GROUP BY 1, 2)
      |SELECT bg.doc_id, COUNT(*) AS n_bigrams,
      |       CAST(SUM(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |       ROUND(SUM(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END) / COUNT(*), 6) AS novelty
      |FROM bg JOIN f USING (a, b)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Span-level duplication audit: 8-token rolling windows (md5 of
    * the space-joined span), position shared iff the span occurs in
    * more than one document. */
  val textSpans: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (
      |  SELECT doc_id,
      |         md5(array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + 7), ' ')) AS h
      |  FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
      |),
      |o AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY 1)
      |SELECT w.doc_id, COUNT(*) AS n_windows,
      |       CAST(SUM(CASE WHEN o.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |       ROUND(SUM(CASE WHEN o.nd > 1 THEN 1 ELSE 0 END) / COUNT(*), 6) AS shared_frac
      |FROM w JOIN o USING (h)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** PMI collocations: ln over ratios of exact integer counts, 6-dp
    * rounded BEFORE the top-20 selection so both engines rank (and
    * tie-break on (a, b)) identically at the cut boundary. */
  val textCollocations: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |uni AS (
      |  SELECT u.tok AS t, COUNT(*) AS c
      |  FROM toks, UNNEST(t) AS u(tok) GROUP BY 1
      |),
      |nu AS (SELECT SUM(c) AS n_uni FROM uni),
      |bg AS (
      |  SELECT t[CAST(i AS INT)] AS a, t[CAST(i AS INT) + 1] AS b, COUNT(*) AS n_ab
      |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
      |  GROUP BY 1, 2
      |),
      |nb AS (SELECT SUM(n_ab) AS n_bg FROM bg)
      |SELECT bg.a, bg.b, bg.n_ab,
      |       ROUND(LN((bg.n_ab / nb.n_bg) /
      |                ((ca.c / nu.n_uni) * (cb.c / nu.n_uni))), 6) AS pmi
      |FROM bg
      |JOIN uni ca ON ca.t = bg.a
      |JOIN uni cb ON cb.t = bg.b
      |CROSS JOIN nb CROSS JOIN nu
      |WHERE bg.n_ab >= 5
      |ORDER BY pmi DESC, bg.a, bg.b
      |LIMIT 20""".stripMargin

  /** BPE merge candidates: exact integer char-pair counts; the top-20
    * cut orders on (n DESC, a, b) — fully deterministic. */
  val textBpePairs: String =
    """WITH toks AS (
      |  SELECT u.tok FROM (SELECT string_split(text, ' ') AS t FROM documents) s,
      |       UNNEST(s.t) AS u(tok)
      |),
      |p AS (
      |  SELECT substr(tok, CAST(i AS INT), 1) AS a,
      |         substr(tok, CAST(i AS INT) + 1, 1) AS b
      |  FROM toks, UNNEST(range(1, len(tok))) AS r(i)
      |  WHERE len(tok) >= 2
      |)
      |SELECT a, b, COUNT(*) AS n FROM p GROUP BY 1, 2
      |ORDER BY n DESC, a, b LIMIT 20""".stripMargin

  /** Iterative BPE training: five unrolled merge rounds over the
    * weighted vocabulary, mirroring `Text.bpeTrain` — same
    * wrapper-delimited symbol string, same leftmost-first replace
    * merge, same (n DESC, a, b) pair election. */
  val textBpeTrain: String = {
    val k = 5
    val rounds = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT) + 1] AS b,
         |         CAST(SUM(c) AS BIGINT) AS n
         |  FROM (SELECT c, string_split(substr(st, 2, length(st) - 2), '||') AS syms
         |        FROM v${i - 1}) s,
         |       UNNEST(range(1, len(syms))) AS u(i)
         |  GROUP BY 1, 2
         |),
         |b$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
         |v$i AS (
         |  SELECT c, replace(st, '|' || b$i.a || '||' || b$i.b || '|',
         |                        '|' || b$i.a || b$i.b || '|') AS st
         |  FROM v${i - 1} CROSS JOIN b$i
         |)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS round, a, b, n FROM b$i").mkString("\n  UNION ALL ")
    s"""WITH v0 AS (
       |  SELECT COUNT(*) AS c,
       |         '|' || array_to_string(list_transform(range(1, length(tok) + 1),
       |           i -> substr(tok, CAST(i AS INT), 1)), '||') || '|' AS st
       |  FROM (SELECT u.tok FROM (SELECT string_split(text, ' ') AS t FROM documents) s,
       |        UNNEST(s.t) AS u(tok) WHERE length(u.tok) >= 1) toks
       |  GROUP BY tok
       |),
       |$rounds
       |SELECT round, a, b, n FROM (
       |  $out
       |) ORDER BY round""".stripMargin
  }

  /** Mirrors `Text.bpeApply`: the train CTE chain re-derives the same
    * 5 merges, then each doc's token symbol-strings run them in order
    * and the doc rolls up pre/post symbol counts. */
  val textBpeApply: String = {
    val k = 5
    val rounds = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT syms[CAST(i AS INT)] AS a, syms[CAST(i AS INT) + 1] AS b,
         |         CAST(SUM(c) AS BIGINT) AS n
         |  FROM (SELECT c, string_split(substr(st, 2, length(st) - 2), '||') AS syms
         |        FROM v${i - 1}) s,
         |       UNNEST(range(1, len(syms))) AS u(i)
         |  GROUP BY 1, 2
         |),
         |b$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
         |v$i AS (
         |  SELECT c, replace(st, '|' || b$i.a || '||' || b$i.b || '|',
         |                        '|' || b$i.a || b$i.b || '|') AS st
         |  FROM v${i - 1} CROSS JOIN b$i
         |)""".stripMargin
    }.mkString(",\n")
    val docRounds = (1 to k).map { i =>
      s"""d$i AS (
         |  SELECT doc_id, n0, replace(st, '|' || b$i.a || '||' || b$i.b || '|',
         |                                 '|' || b$i.a || b$i.b || '|') AS st
         |  FROM d${i - 1} CROSS JOIN b$i
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH v0 AS (
       |  SELECT COUNT(*) AS c,
       |         '|' || array_to_string(list_transform(range(1, length(tok) + 1),
       |           i -> substr(tok, CAST(i AS INT), 1)), '||') || '|' AS st
       |  FROM (SELECT u.tok FROM (SELECT string_split(text, ' ') AS t FROM documents) s,
       |        UNNEST(s.t) AS u(tok) WHERE length(u.tok) >= 1) toks
       |  GROUP BY tok
       |),
       |$rounds,
       |d0 AS (
       |  SELECT doc_id, length(u.tok) AS n0,
       |         '|' || array_to_string(list_transform(range(1, length(u.tok) + 1),
       |           i -> substr(u.tok, CAST(i AS INT), 1)), '||') || '|' AS st
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s,
       |       UNNEST(s.t) AS u(tok)
       |  WHERE length(u.tok) >= 1
       |),
       |$docRounds
       |SELECT doc_id,
       |       CAST(SUM(n0) AS BIGINT) AS n_chars,
       |       CAST(SUM(len(string_split(substr(st, 2, length(st) - 2), '||'))) AS BIGINT) AS n_tokens,
       |       ROUND(SUM(len(string_split(substr(st, 2, length(st) - 2), '||')))
       |             / CAST(SUM(n0) AS DOUBLE), 6) AS ratio
       |FROM d$k GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Per-language tokenizer fertility mirroring `Text.bpeFertility`:
    * the full BPE-apply chain as a materialized CTE (assembled by
    * concatenation — stripMargin over embedded SQL eats `||` pipes),
    * rolled up by language. */
  val textBpeFertility: String =
    "WITH enc AS MATERIALIZED (" +
      textBpeApply.replace("ORDER BY doc_id", "") + "),\n" +
    """d AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words
      |  FROM documents
      |)
      |SELECT lang, COUNT(*) AS n_docs,
      |       CAST(SUM(words) AS BIGINT) AS n_words,
      |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / SUM(words), 6) AS fertility,
      |       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 6) AS chars_per_tok
      |FROM enc JOIN d USING (doc_id)
      |GROUP BY 1 ORDER BY lang""".stripMargin

  /** Deep-vocab fertility (`Text.bpeDeepFertility`): the TRAINER is
    * the one non-SQL-expressible step (k ≤ 500 data-dependent merge
    * rounds), so the merge list is read from the landed release
    * artifact (`Text.bpeDeepExportRoot` — fixed path, filtered to the
    * corpus fingerprint this query recomputes from `documents`); the
    * ENCODE is then re-run here independently as a sequential
    * recursive-CTE fold over the distinct-token vocabulary — round r
    * applies merge r's leftmost-nonoverlapping replace, exactly the
    * 5-merge oracles' per-round `replace` semantics extended to
    * arbitrary k — and the per-doc/per-lang rollup is recomputed from
    * scratch. Only the merge list itself is shared with the engine
    * (the qclf landed-model posture); its first 5 rows are separately
    * oracle-pinned through `text_bpe_train`, and the trained table's
    * own invariants are gated by `textBpeMergeAudit` below. A `def`
    * rendered at dump time: the export glob derives from the SAME
    * configuration the engine writes under
    * (`Text.oracleDeepMergesGlob` — round-15 ADVICE closed the
    * hardcoded-path divergence). */
  def textBpeDeep: String =
    s"""WITH RECURSIVE f AS (
      |  SELECT CAST(SUM(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 13)
      |                       AS BIGINT) % 1000000007) AS BIGINT) AS fp
      |  FROM documents
      |),
      |m AS (
      |  SELECT CAST(round AS BIGINT) AS round, a, b
      |  FROM read_parquet('${graft.ops.Text.oracleDeepMergesGlob}')
      |  WHERE fp = (SELECT fp FROM f)
      |),
      |mk AS (SELECT COALESCE(MAX(round), 0) AS k FROM m),
      |v0 AS (
      |  SELECT tok,
      |         '|' || array_to_string(list_transform(range(1, length(tok) + 1),
      |           i -> substr(tok, CAST(i AS INT), 1)), '||') || '|' AS st
      |  FROM (SELECT DISTINCT u.tok
      |        FROM (SELECT string_split(text, ' ') AS t FROM documents) s,
      |             UNNEST(s.t) AS u(tok) WHERE length(u.tok) >= 1) toks
      |),
      |enc AS (
      |  SELECT tok, st, CAST(0 AS BIGINT) AS rnd FROM v0
      |  UNION ALL
      |  SELECT e.tok,
      |         replace(e.st, '|' || m.a || '||' || m.b || '|',
      |                       '|' || m.a || m.b || '|') AS st,
      |         e.rnd + 1 AS rnd
      |  FROM enc e JOIN m ON m.round = e.rnd + 1
      |),
      |encf AS (
      |  SELECT tok, length(tok) AS n0,
      |         len(string_split(substr(st, 2, length(st) - 2), '||')) AS n_sym
      |  FROM enc WHERE rnd = (SELECT k FROM mk)
      |),
      |dtok AS (
      |  SELECT doc_id, u.tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s,
      |       UNNEST(s.t) AS u(tok)
      |  WHERE length(u.tok) >= 1
      |),
      |doc AS (
      |  SELECT doc_id, CAST(SUM(e.n0) AS BIGINT) AS n_chars,
      |         CAST(SUM(e.n_sym) AS BIGINT) AS n_tokens
      |  FROM dtok JOIN encf e USING (tok) GROUP BY doc_id
      |),
      |d AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words
      |  FROM documents
      |)
      |SELECT lang, COUNT(*) AS n_docs,
      |       CAST(SUM(words) AS BIGINT) AS n_words,
      |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / SUM(words), 6) AS fertility,
      |       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 6) AS chars_per_tok
      |FROM doc JOIN d USING (doc_id)
      |GROUP BY 1 ORDER BY lang""".stripMargin

  /** Invariant audit of the landed deep-merge table
    * (`Text.bpeMergeAudit`): monotone non-increasing elected-pair
    * counts and formability of every multi-char merge side from
    * earlier merges — properties ANY correct BPE trainer satisfies,
    * checked here directly in DuckDB so a wrong pair election in
    * rounds 6..k turns the gate RED (`error()`) instead of
    * hash-matching a shared wrong artifact to green. Same
    * fingerprint filter and templated glob as `textBpeDeep`. */
  def textBpeMergeAudit: String =
    s"""WITH f AS (
       |  SELECT CAST(SUM(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 13)
       |                       AS BIGINT) % 1000000007) AS BIGINT) AS fp
       |  FROM documents
       |),
       |m AS (
       |  SELECT CAST(round AS BIGINT) AS round, a, b, CAST(n AS BIGINT) AS n
       |  FROM read_parquet('${graft.ops.Text.oracleDeepMergesGlob}')
       |  WHERE fp = (SELECT fp FROM f)
       |),
       |mono AS (
       |  SELECT COUNT(*) AS mv FROM (
       |    SELECT n, LAG(n) OVER (ORDER BY round) AS pn FROM m) t
       |  WHERE pn IS NOT NULL AND n > pn
       |),
       |voc AS (
       |  SELECT (SELECT COUNT(*) FROM m WHERE length(a) > 1 AND NOT EXISTS (
       |            SELECT 1 FROM m p WHERE p.round < m.round AND p.a || p.b = m.a))
       |       + (SELECT COUNT(*) FROM m WHERE length(b) > 1 AND NOT EXISTS (
       |            SELECT 1 FROM m p WHERE p.round < m.round AND p.a || p.b = m.b)) AS vv
       |),
       |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_merges,
       |             CAST(MAX(n) AS BIGINT) AS max_n,
       |             CAST(MIN(n) AS BIGINT) AS min_n FROM m)
       |SELECT s.n_merges, s.max_n, s.min_n,
       |       CASE WHEN mono.mv = 0 THEN CAST(0 AS BIGINT)
       |            ELSE CAST(error('deep-BPE count monotonicity violated: ' || mono.mv) AS BIGINT) END
       |         AS monotone_violations,
       |       CASE WHEN voc.vv = 0 THEN CAST(0 AS BIGINT)
       |            ELSE CAST(error('deep-BPE symbol formability violated: ' || voc.vv) AS BIGINT) END
       |         AS vocab_violations
       |FROM s, mono, voc""".stripMargin

  /** Add-one-smoothed bigram LM score: every log term is a ratio of
    * exact integer counts (bit-identical across engines); only the
    * per-doc mean's summation order differs, absorbed by 6 dp. */
  val textLmScore: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id, t[CAST(i AS INT)] AS a, t[CAST(i AS INT) + 1] AS b
      |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
      |),
      |cab AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY 1, 2),
      |ca AS (SELECT a, COUNT(*) AS c_a FROM bg GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT tok) AS vocab
      |      FROM (SELECT UNNEST(t) AS tok FROM toks) u)
      |SELECT doc_id,
      |       ROUND(AVG(LN((c_ab + 1) / (c_a + vocab))), 6) AS lm_score,
      |       COUNT(*) AS n_bigrams
      |FROM bg JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Mirrors `Text.knScore`: interpolated Kneser-Ney with d=0.75 over
    * the corpus bigrams; continuation counts from the bigram-TYPE
    * table; identical left-assoc double expression tree. */
  val textKnScore: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id, t[CAST(i AS INT)] AS a, t[CAST(i AS INT) + 1] AS b
      |  FROM toks, UNNEST(range(1, len(t))) AS u(i)
      |),
      |cab AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY 1, 2),
      |ca AS (SELECT a, COUNT(*) AS c_a FROM bg GROUP BY 1),
      |n1a AS (SELECT a, COUNT(*) AS n1a FROM cab GROUP BY 1),
      |n1b AS (SELECT b, COUNT(*) AS n1b FROM cab GROUP BY 1),
      |n1t AS (SELECT COUNT(*) AS n1tot FROM cab)
      |SELECT doc_id,
      |  ROUND(AVG(LN(GREATEST(c_ab - 0.75, 0.0) / c_a
      |    + (0.75 * n1a / c_a) * (n1b / n1tot))), 6) AS kn_score,
      |  COUNT(*) AS n_bigrams
      |FROM bg JOIN cab USING (a, b) JOIN ca USING (a)
      |JOIN n1a USING (a) JOIN n1b USING (b) CROSS JOIN n1t
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** CCNet tertile bucketing: the LM-score query nested, per-lang
    * quantile_cont cutoffs (identical positional interpolation to
    * Spark's `percentile`), head/middle/tail by comparison. */
  val textCcnet: String =
    s"""WITH s AS ($textLmScore),
       |sc AS (
       |  SELECT s.doc_id, d.lang, s.lm_score
       |  FROM s JOIN documents d ON d.doc_id = s.doc_id
       |),
       |cut AS (
       |  SELECT lang, quantile_cont(lm_score, 1.0/3) AS q33,
       |         quantile_cont(lm_score, 2.0/3) AS q66
       |  FROM sc GROUP BY 1
       |)
       |SELECT sc.doc_id, sc.lang, sc.lm_score,
       |       CASE WHEN sc.lm_score >= cut.q66 THEN 'head'
       |            WHEN sc.lm_score >= cut.q33 THEN 'middle'
       |            ELSE 'tail' END AS bucket
       |FROM sc JOIN cut USING (lang) ORDER BY sc.doc_id""".stripMargin

  /** Tokenizer OOV audit vs the corpus top-50 vocabulary. */
  val textOov: String =
    s"""WITH v AS ($textVocab),
       |t AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents),
       |a AS (
       |  SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens
       |  FROM t LEFT JOIN v ON v.tok = t.tok
       |  GROUP BY 1
       |)
       |SELECT source, n_tokens, oov_tokens,
       |       ROUND(CAST(oov_tokens AS DOUBLE) / n_tokens, 6) AS oov_rate
       |FROM a ORDER BY source""".stripMargin

  val textFingerprint: String =
    """SELECT doc_id,
      |  list_min(list_transform(range(1, length(text) - 7 + 1),
      |    i -> md5(substr(text, CAST(i AS INT), 8)))) AS fp,
      |  CAST(len(list_distinct(list_transform(range(1, length(text) - 7 + 1),
      |    i -> substr(text, CAST(i AS INT), 8)))) AS BIGINT) AS n_shingles
      |FROM documents WHERE length(text) >= 8 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- dedup

  val dedupExact: String =
    """SELECT doc_id, md5(text) AS h,
      |       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  val dedupPrefix: String =
    """SELECT md5(substr(text, 1, 40)) AS h, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
      |FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY h""".stripMargin

  /** Shared CTEs for the Bloom pre-filter audit: state/delta release
    * split, k=4 salted-md5 bit positions mod m. m is pinned at 2^17 —
    * valid at every oracle scale (state ≤ 4096 distinct fingerprints;
    * `Dedup.bloomBits` grows only beyond that and the ladder is
    * pinned to agree here). The bitmap's word packing needs no oracle
    * mirror: a fingerprint is `maybe` iff all four positions are in
    * the state's position SET, which is the same predicate the packed
    * words answer. */
  private val bloomChain: String =
    """state AS (
      |  SELECT DISTINCT md5(substr(text, 1, 40)) AS fp
      |  FROM documents WHERE doc_id % 4 <> 0
      |),
      |js AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(j)),
      |spos AS (
      |  SELECT DISTINCT
      |    CAST('0x' || substr(md5(fp || '|' || CAST(j AS VARCHAR)), 1, 14) AS BIGINT) % 131072 AS pos
      |  FROM state CROSS JOIN js
      |),
      |delta AS (
      |  SELECT doc_id, md5(substr(text, 1, 40)) AS fp
      |  FROM documents WHERE doc_id % 4 = 0
      |),
      |dpos AS (
      |  SELECT d.doc_id, d.fp,
      |    CAST('0x' || substr(md5(d.fp || '|' || CAST(j AS VARCHAR)), 1, 14) AS BIGINT) % 131072 AS pos
      |  FROM delta d CROSS JOIN js
      |),
      |verdicts AS (
      |  SELECT p.doc_id, p.fp,
      |         SUM(CASE WHEN s.pos IS NOT NULL THEN 1 ELSE 0 END) = 4 AS maybe
      |  FROM dpos p LEFT JOIN spos s USING (pos)
      |  GROUP BY p.doc_id, p.fp
      |)""".stripMargin

  /** Bloom pre-filter audit mirroring `Dedup.bloomFilter`. */
  val dedupBloom: String =
    s"""WITH $bloomChain
       |SELECT v.doc_id, v.maybe, st.fp IS NOT NULL AS truly_dup
       |FROM verdicts v LEFT JOIN state st ON v.fp = st.fp
       |ORDER BY v.doc_id""".stripMargin

  /** Filter-geometry rollup mirroring `Dedup.bloomStats`; n_words is
    * the occupied 64-bit word count = COUNT(DISTINCT pos // 64). */
  val dedupBloomStats: String =
    s"""WITH $bloomChain,
       |v AS (
       |  SELECT v.doc_id, v.maybe, st.fp IS NOT NULL AS truly_dup
       |  FROM verdicts v LEFT JOIN state st ON v.fp = st.fp
       |)
       |SELECT CAST(131072 AS BIGINT) AS m_bits,
       |       (SELECT COUNT(DISTINCT pos // 64) FROM spos) AS n_words,
       |       COUNT(*) AS n_delta,
       |       CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
       |       CAST(SUM(CASE WHEN truly_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |       CAST(SUM(CASE WHEN maybe AND NOT truly_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       |       ROUND(CAST(SUM(CASE WHEN maybe AND NOT truly_dup THEN 1 ELSE 0 END) AS DOUBLE) /
       |             GREATEST(COUNT(*) - SUM(CASE WHEN truly_dup THEN 1 ELSE 0 END), 1), 6) AS fp_rate
       |FROM v""".stripMargin

  /** Per-source duplication inflation: global keep-first on the
    * prefix fingerprint, then a source rollup (`Dedup.dupInflation`). */
  val dedupInflation: String =
    """WITH k AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
      |         doc_id = MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS keeper
      |  FROM documents
      |),
      |s AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(CASE WHEN keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |         CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |         CAST(SUM(CASE WHEN keeper THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens
      |  FROM k GROUP BY 1
      |)
      |SELECT source, n_docs, n_kept, n_tokens, kept_tokens,
      |       ROUND(CAST(n_docs AS DOUBLE) / NULLIF(n_kept, 0), 6) AS doc_inflation,
      |       ROUND(CAST(n_tokens AS DOUBLE) / NULLIF(kept_tokens, 0), 6) AS token_inflation
      |FROM s ORDER BY source""".stripMargin

  /** Cross-source duplication matrix over the prefix fingerprint. */
  val dedupCrossSource: String =
    """WITH hs AS (
      |  SELECT DISTINCT md5(substr(text, 1, 40)) AS h, source FROM documents
      |)
      |SELECT a.source AS source_a, b.source AS source_b,
      |       CAST(COUNT(DISTINCT a.h) AS BIGINT) AS n_shared
      |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared CTEs: distinct 12-char shingles → 8 salted-md5 minhashes →
    * 4 LSH bands → bucket-width cap → candidate pairs. The `bands`
    * QUALIFY mirrors `Dedup.pairsFromBands`' MaxBucket cap exactly
    * (lowest doc_ids kept per (band, key) bucket), so Spark and oracle
    * agree even on a corpus with a viral >MaxBucket boilerplate bucket. */
  private lazy val minhashCtes: String = minhashCtesOver("documents")

  /** The same chain over an arbitrary (doc_id, text) CTE/table — the
    * exact-first oracle runs it over the exact-keeper slice. */
  private def minhashCtesOver(table: String): String = {
    val mins = (0 until 8).map(j =>
      s"MIN(CAST('0x' || substr(md5('${j / 4}|' || sh), ${(j % 4) * 8 + 1}, 8) AS BIGINT)) AS mh$j").mkString(",\n    ")
    val bandRows = (0 until 4).map(b =>
      if (b == 0) "SELECT doc_id, 0 AS b, md5(CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)) AS key FROM sigs"
      else s"UNION ALL SELECT doc_id, $b, md5(CAST(mh${2 * b} AS VARCHAR) || '_' || CAST(mh${2 * b + 1} AS VARCHAR)) FROM sigs").mkString("\n  ")
    s"""sh AS (
       |  SELECT doc_id, UNNEST(list_distinct(list_transform(range(1, length(text) - 11 + 1),
       |    i -> substr(text, CAST(i AS INT), 12)))) AS sh
       |  FROM $table WHERE length(text) >= 12
       |),
       |sigs AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM sh GROUP BY doc_id
       |),
       |bands0 AS (
       |  $bandRows
       |),
       |bands AS (
       |  SELECT doc_id, b, key FROM bands0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY b, key ORDER BY doc_id) <= ${ops.Dedup.MaxBucket}
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM bands a JOIN bands b2 ON a.b = b2.b AND a.key = b2.key AND a.doc_id < b2.doc_id
       |)""".stripMargin
  }

  val dedupMinhash: String =
    s"""WITH $minhashCtes
       |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin

  /** Sets are 56-bit md5 shingle hashes — the same function the Spark
    * side intersects, so cardinalities agree by construction. */
  val dedupJaccard: String =
    s"""WITH $minhashCtes,
       |$shingleHashCte,
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM shh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_int
       |  FROM cand c
       |  JOIN shh sa ON sa.doc_id = c.doc_a
       |  JOIN shh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |j AS (
       |  SELECT i.doc_a, i.doc_b,
       |         ROUND(CAST(n_int AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - n_int AS DOUBLE), 6) AS jac
       |  FROM inter i
       |  JOIN cnt ca ON ca.doc_id = i.doc_a
       |  JOIN cnt cb ON cb.doc_id = i.doc_b
       |)
       |SELECT doc_a, doc_b, jac FROM j WHERE jac >= 0.3 ORDER BY doc_a, doc_b""".stripMargin

  /** Asymmetric containment over the same LSH candidates: |A∩B|/|A|
    * and |A∩B|/|B|, flagged when either direction >= 0.6 — mirrors
    * `Dedup.containment`. */
  val dedupContainment: String =
    s"""WITH $minhashCtes,
       |$shingleHashCte,
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM shh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_int
       |  FROM cand c
       |  JOIN shh sa ON sa.doc_id = c.doc_a
       |  JOIN shh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
       |  GROUP BY c.doc_a, c.doc_b
       |),
       |co AS (
       |  SELECT i.doc_a, i.doc_b,
       |         ROUND(CAST(n_int AS DOUBLE) / CAST(ca.n_sh AS DOUBLE), 6) AS cont_a,
       |         ROUND(CAST(n_int AS DOUBLE) / CAST(cb.n_sh AS DOUBLE), 6) AS cont_b
       |  FROM inter i
       |  JOIN cnt ca ON ca.doc_id = i.doc_a
       |  JOIN cnt cb ON cb.doc_id = i.doc_b
       |)
       |SELECT doc_a, doc_b, cont_a, cont_b FROM co
       |WHERE GREATEST(cont_a, cont_b) >= 0.6 ORDER BY doc_a, doc_b""".stripMargin

  /** Estimated Jaccard from signature agreement alone (no re-read of
    * shingles) — (# equal minhash components) / 8 over LSH candidates. */
  val dedupMinhashEst: String = {
    val eq = (0 until 8).map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $minhashCtes
       |SELECT c.doc_a, c.doc_b, ROUND(($eq) / 8.0, 6) AS est_jac
       |FROM cand c
       |JOIN sigs a ON a.doc_id = c.doc_a
       |JOIN sigs b ON b.doc_id = c.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Connected components over the SAME capped candidate pairs as
    * `dedupMinhash`, via recursive reachability: cluster_id(v) =
    * MIN over all nodes reachable from v (the fixpoint
    * `Dedup.clustersFromPairs` computes by min-label propagation). */
  val dedupClusters: String =
    s"""WITH RECURSIVE $minhashCtes,
       |$clusterCtes
       |SELECT id AS doc_id, MIN(r) AS cluster_id, id = MIN(r) AS keep
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** Exact-then-fuzzy composed decision mirroring
    * `Dedup.exactFirstClusters`: exact keepers (min doc_id per
    * md5(text)), the SAME capped minhash/band/component chain as
    * `dedupClusters` over the keeper slice only, then one row per
    * exact loser carrying its keeper's cluster with keep = false. */
  val dedupExactFirst: String =
    s"""WITH RECURSIVE
       |xk AS (
       |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id
       |  FROM documents
       |),
       |kdocs AS (
       |  SELECT d.* FROM documents d JOIN xk ON d.doc_id = xk.doc_id
       |  WHERE xk.doc_id = xk.keeper_id
       |),
       |${minhashCtesOver("kdocs")},
       |$clusterCtes,
       |cl AS (
       |  SELECT id AS doc_id, MIN(r) AS cluster_id, id = MIN(r) AS keep
       |  FROM reach GROUP BY id
       |)
       |SELECT doc_id, cluster_id, keep FROM cl
       |UNION ALL
       |SELECT x.doc_id, COALESCE(cl.cluster_id, x.keeper_id) AS cluster_id, FALSE AS keep
       |FROM xk x LEFT JOIN cl ON cl.doc_id = x.keeper_id
       |WHERE x.doc_id <> x.keeper_id
       |ORDER BY doc_id""".stripMargin

  /** The exact-first decision applied to documents — mirrors
    * `Dedup.exactFirstApply` (the `dedupApply` shape over the
    * composed decision). */
  val dedupExactFirstApply: String =
    s"""WITH RECURSIVE
       |xk AS (
       |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id
       |  FROM documents
       |),
       |kdocs AS (
       |  SELECT d.* FROM documents d JOIN xk ON d.doc_id = xk.doc_id
       |  WHERE xk.doc_id = xk.keeper_id
       |),
       |${minhashCtesOver("kdocs")},
       |$clusterCtes,
       |cl AS (
       |  SELECT id AS doc_id, MIN(r) AS cluster_id, id = MIN(r) AS keep
       |  FROM reach GROUP BY id
       |),
       |dec AS (
       |  SELECT doc_id, cluster_id, keep FROM cl
       |  UNION ALL
       |  SELECT x.doc_id, COALESCE(cl.cluster_id, x.keeper_id) AS cluster_id, FALSE AS keep
       |  FROM xk x LEFT JOIN cl ON cl.doc_id = x.keeper_id
       |  WHERE x.doc_id <> x.keeper_id
       |)
       |SELECT d.doc_id, COALESCE(dec.cluster_id, d.doc_id) AS cluster_id, md5(d.text) AS h
       |FROM documents d LEFT JOIN dec ON dec.doc_id = d.doc_id
       |WHERE COALESCE(dec.keep, TRUE)
       |ORDER BY d.doc_id""".stripMargin

  /** The deduplicated corpus: left-join the cluster decision onto
    * documents; unpaired docs survive as their own cluster, paired
    * docs survive only as the keeper. */
  val dedupApply: String =
    s"""WITH RECURSIVE $minhashCtes,
       |$clusterCtes,
       |cl AS (
       |  SELECT id AS doc_id, MIN(r) AS cluster_id, id = MIN(r) AS keep
       |  FROM reach GROUP BY id
       |)
       |SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id, md5(d.text) AS h
       |FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
       |WHERE COALESCE(cl.keep, TRUE)
       |ORDER BY d.doc_id""".stripMargin

  /** Decontamination: distinct 56-bit shingle hashes shared with the
    * held-out set (doc_id % 50 = 0), flagged at >= 10. */
  val textDecontaminate: String =
    s"""WITH $heldOutCtes
      |SELECT s.doc_id,
      |       CAST(COUNT(DISTINCT s.h) AS BIGINT) AS n_overlap,
      |       COUNT(DISTINCT s.h) >= 10 AS contaminated
      |FROM shh s JOIN held ON s.h = held.h
      |WHERE s.doc_id % 50 <> 0
      |GROUP BY s.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Graded contamination: per candidate doc, the FRACTION of its
    * distinct shingle hashes shared with the held-out set (LEFT join —
    * zero-overlap docs score 0), flagged at >= 0.05 on the rounded
    * fraction — mirrors `Dedup.contaminationScore`. */
  val textContamination: String =
    s"""WITH $heldOutCtes
      |SELECT s.doc_id,
      |       CAST(COUNT(DISTINCT s.h) AS BIGINT) AS n_sh,
      |       CAST(COUNT(DISTINCT CASE WHEN held.h IS NOT NULL THEN s.h END) AS BIGINT) AS n_overlap,
      |       ROUND(COUNT(DISTINCT CASE WHEN held.h IS NOT NULL THEN s.h END)
      |             / CAST(COUNT(DISTINCT s.h) AS DOUBLE), 6) AS frac,
      |       ROUND(COUNT(DISTINCT CASE WHEN held.h IS NOT NULL THEN s.h END)
      |             / CAST(COUNT(DISTINCT s.h) AS DOUBLE), 6) >= 0.05 AS flagged
      |FROM shh s LEFT JOIN held ON s.h = held.h
      |WHERE s.doc_id % 50 <> 0
      |GROUP BY s.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Cross-doc segment dedup: 10-word segments, a segment in >= 2
    * DISTINCT docs is duplicated; per-doc counts + surviving token
    * mass — mirrors `Text.segDedup` (slice bounds are 1-based
    * inclusive in both engines). */
  val textSegDedup: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |segs AS (
      |  SELECT doc_id, i AS seg_idx,
      |         md5(array_to_string(ws[CAST(i*10+1 AS INT):CAST(i*10+10 AS INT)], ' ')) AS h,
      |         LEAST(10, len(ws) - i*10) AS n_toks
      |  FROM w, UNNEST(range(CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS u(i)
      |),
      |cnt AS (SELECT h, COUNT(DISTINCT doc_id) AS docs FROM segs GROUP BY h)
      |SELECT s.doc_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_segs,
      |       CAST(SUM(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |       CAST(SUM(CASE WHEN c.docs >= 2 THEN 0 ELSE s.n_toks END) AS BIGINT) AS kept_toks,
      |       ROUND(SUM(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END)
      |             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
      |FROM segs s JOIN cnt c ON c.h = s.h
      |GROUP BY s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** Mirrors `Text.winnow`: 8-char shingle hashes, min per sliding
    * window of 16 with rightmost tie-break encoded in the compared
    * string (hash || lpad(10^6 - pos)), distinct selections. */
  val textWinnow: String =
    """WITH hs AS (
      |  SELECT doc_id,
      |    list_transform(range(1, length(text) - 7 + 1),
      |      i -> md5(substr(text, CAST(i AS INT), 8)) ||
      |           lpad(CAST(1000000 - i AS VARCHAR), 7, '0')) AS hs
      |  FROM documents WHERE length(text) >= 23
      |),
      |sel AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(hs) - 15 + 1),
      |      s -> list_min(list_slice(hs, CAST(s AS INT), CAST(s + 15 AS INT)))))) AS v
      |  FROM hs
      |)
      |SELECT doc_id,
      |  CAST(1000000 - CAST(substr(v, 33) AS INT) AS BIGINT) AS pos,
      |  substr(v, 1, 32) AS fp
      |FROM sel ORDER BY doc_id, pos""".stripMargin

  /** Mirrors `Text.winnowOverlap`: posting-list join of the winnow
    * fingerprints (fp frequency capped at 8 docs), pairs sharing ≥ 2,
    * containment = shared / min fp-set size. */
  val textWinnowOverlap: String =
    """WITH hs AS (
      |  SELECT doc_id,
      |    list_transform(range(1, length(text) - 7 + 1),
      |      i -> md5(substr(text, CAST(i AS INT), 8)) ||
      |           lpad(CAST(1000000 - i AS VARCHAR), 7, '0')) AS hs
      |  FROM documents WHERE length(text) >= 23
      |),
      |sel AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(hs) - 15 + 1),
      |      s -> list_min(list_slice(hs, CAST(s AS INT), CAST(s + 15 AS INT)))))) AS v
      |  FROM hs
      |),
      |fps AS (SELECT DISTINCT doc_id, substr(v, 1, 32) AS fp FROM sel),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY 1),
      |keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 8),
      |shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
      |  FROM fps a JOIN fps b USING (fp) JOIN keep k USING (fp)
      |  WHERE a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |)
      |SELECT doc_a, doc_b, shared_fps,
      |  ROUND(shared_fps / LEAST(sa.n_fp, sb.n_fp), 6) AS containment
      |FROM shared
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Mirrors `Text.substrDedup`: rolling 10-token shingles at every
    * offset, cross-doc-duplicated starts merged into maximal spans
    * per doc (interval union via the gap/island window). */
  val textSubstrDedup: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT doc_id, len(ws) AS nw, i AS start,
      |         md5(array_to_string(ws[CAST(i + 1 AS INT):CAST(i + 10 AS INT)], ' ')) AS h
      |  FROM w, UNNEST(range(GREATEST(len(ws) - 10, 0) + 1)) AS u(i)
      |),
      |cnt AS (SELECT h, COUNT(DISTINCT doc_id) AS docs FROM sh GROUP BY h),
      |d AS (
      |  SELECT s.doc_id, s.nw, s.start,
      |         CASE WHEN s.start - LAG(s.start) OVER (PARTITION BY s.doc_id ORDER BY s.start) <= 10
      |              THEN 0 ELSE 1 END AS gap
      |  FROM sh s JOIN cnt c ON c.h = s.h WHERE c.docs >= 2
      |),
      |sp AS (
      |  SELECT doc_id, nw, start,
      |         SUM(gap) OVER (PARTITION BY doc_id ORDER BY start
      |                        ROWS UNBOUNDED PRECEDING) AS span
      |  FROM d
      |),
      |agg AS (
      |  SELECT doc_id, span,
      |         LEAST(MAX(start) + 10, ANY_VALUE(nw)) - MIN(start) AS covered
      |  FROM sp GROUP BY doc_id, span
      |),
      |pd AS (
      |  SELECT doc_id, COUNT(*) AS n_spans, SUM(covered) AS dup_toks
      |  FROM agg GROUP BY doc_id
      |)
      |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_toks,
      |       CAST(COALESCE(pd.n_spans, 0) AS BIGINT) AS n_spans,
      |       CAST(COALESCE(pd.dup_toks, 0) AS BIGINT) AS dup_toks,
      |       ROUND(COALESCE(pd.dup_toks, 0) / CAST(len(w.ws) AS DOUBLE), 6) AS dup_frac
      |FROM w LEFT JOIN pd ON pd.doc_id = w.doc_id
      |ORDER BY w.doc_id""".stripMargin

  /** Mirrors `Text.substrDedupApply`: the detection chain with the
    * keep-first shingle owner excluded, spans as (lo, hi) intervals,
    * token-level anti-join removal, ordered reassembly hashed. */
  val textSubstrApply: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT doc_id, len(ws) AS nw, i AS start,
      |         md5(array_to_string(ws[CAST(i + 1 AS INT):CAST(i + 10 AS INT)], ' ')) AS h
      |  FROM w, UNNEST(range(GREATEST(len(ws) - 10, 0) + 1)) AS u(i)
      |),
      |cnt AS (SELECT h, COUNT(DISTINCT doc_id) AS docs, MIN(doc_id) AS keeper
      |        FROM sh GROUP BY h),
      |d AS (
      |  SELECT s.doc_id, s.nw, s.start,
      |         CASE WHEN s.start - LAG(s.start) OVER (PARTITION BY s.doc_id ORDER BY s.start) <= 10
      |              THEN 0 ELSE 1 END AS gap
      |  FROM sh s JOIN cnt c ON c.h = s.h
      |  WHERE c.docs >= 2 AND s.doc_id <> c.keeper
      |),
      |sp AS (
      |  SELECT doc_id, nw, start,
      |         SUM(gap) OVER (PARTITION BY doc_id ORDER BY start
      |                        ROWS UNBOUNDED PRECEDING) AS span
      |  FROM d
      |),
      |agg AS (
      |  SELECT doc_id, span, MIN(start) AS lo,
      |         LEAST(MAX(start) + 10, ANY_VALUE(nw)) AS hi
      |  FROM sp GROUP BY doc_id, span
      |),
      |toks AS (
      |  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS i, UNNEST(ws) AS tok FROM w
      |),
      |kept AS (
      |  SELECT t.doc_id, t.i, t.tok
      |  FROM toks t
      |  LEFT JOIN agg a ON a.doc_id = t.doc_id AND t.i >= a.lo AND t.i < a.hi
      |  WHERE a.lo IS NULL
      |),
      |cl AS (
      |  SELECT doc_id, COUNT(*) AS kept_toks,
      |         md5(string_agg(tok, ' ' ORDER BY i)) AS clean_hash
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_toks,
      |       CAST(len(w.ws) - COALESCE(cl.kept_toks, 0) AS BIGINT) AS removed_toks,
      |       CAST(COALESCE(cl.kept_toks, 0) AS BIGINT) AS kept_toks,
      |       COALESCE(cl.clean_hash, md5('')) AS clean_hash
      |FROM w LEFT JOIN cl ON cl.doc_id = w.doc_id
      |ORDER BY w.doc_id""".stripMargin

  /** SCD2 dimension build from the event change log: change-detected
    * `event_type` states per user with validity intervals — mirrors
    * `Events.scd2`. */
  val evScd2: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
      |  FROM events
      |),
      |c AS (
      |  SELECT user_id, event_id, event_type AS state, ts AS valid_from
      |  FROM e WHERE prev_state IS NULL OR prev_state <> event_type
      |)
      |SELECT user_id,
      |       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS version,
      |       state, valid_from,
      |       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
      |       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL AS is_current
      |FROM c
      |ORDER BY user_id, version""".stripMargin

  /** Shared CTEs: two salted token md5s → 64 bit-sums → the 64-bit
    * simhash — the ONE signature construction, mirrored by
    * `Dedup.simhash64Table`, published by `dedupSimhash` and bucketed
    * by `dedupSimhashPairs`. */
  private lazy val simhash64Ctes: String = {
    val sums = (0 until 64).map { b =>
      val h = if (b < 32) "h0" else "h1"
      val k = b % 32 + 1
      s"SUM(CASE WHEN substr($h, $k, 1) BETWEEN '8' AND 'f' THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n    ")
    val bits = (0 until 64).map(b => s"CASE WHEN s$b > 0 THEN '1' ELSE '0' END").mkString(", ")
    s"""t AS (
       |  SELECT doc_id, md5('0|' || u.tok) AS h0, md5('1|' || u.tok) AS h1
       |  FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
       |),
       |s AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM t GROUP BY doc_id
       |),
       |sig AS (SELECT doc_id, concat($bits) AS sig64 FROM s)""".stripMargin
  }

  val dedupSimhash: String =
    s"""WITH $simhash64Ctes
       |SELECT doc_id, sig64 AS simhash FROM sig ORDER BY doc_id""".stripMargin

  /** Hamming ≤ 2 pairing over the 64-bit simhash via pigeonhole
    * bands (22/21/21-bit pieces) — exact: any pair within distance 2
    * agrees on at least one piece; wide pieces keep buckets sparse.
    * Buckets carry the same MaxBucket width cap as the Spark side
    * (`Dedup.pairsFromBands`). */
  val dedupSimhashPairs: String = {
    // engine-native popcount, mirroring the Spark side's
    // bit_count(hi^hi)+bit_count(lo^lo) over the packed signature
    val ham = "bit_count(xor(CAST(a.sig64 AS BIT), CAST(b.sig64 AS BIT)))"
    s"""WITH $simhash64Ctes,
       |bands0 AS (
       |  SELECT doc_id, 0 AS b, substr(sig64, 1, 22) AS key FROM sig
       |  UNION ALL SELECT doc_id, 1, substr(sig64, 23, 21) FROM sig
       |  UNION ALL SELECT doc_id, 2, substr(sig64, 44, 21) FROM sig
       |),
       |bands AS (
       |  SELECT doc_id, b, key FROM bands0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY b, key ORDER BY doc_id) <= ${ops.Dedup.MaxBucket}
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
       |),
       |hm AS (
       |  SELECT c.doc_a, c.doc_b, ($ham) AS hamming
       |  FROM cand c
       |  JOIN sig a ON a.doc_id = c.doc_a
       |  JOIN sig b ON b.doc_id = c.doc_b
       |)
       |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       |FROM hm WHERE hamming <= 2 ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Hex pair of rendered-image pixel i (0-based): 62 pixels from the
    * 4 salted prefix digests (`hx`), 2 footer pixels from the
    * length-bucket digest (`lh`) — mirroring `Multimodal.grayPixels`. */
  private def mmPixHex(i: Int): String =
    if (i < 62) s"substr(hx, ${2 * i + 1}, 2)"
    else s"substr(lh, ${2 * (i - 62) + 1}, 2)"

  /** Shared CTEs for the rendered 8×8 gray image: `d` carries the
    * digest hex, `p` the 64 pixel byte values — the same derivation
    * `Multimodal.grayPixels` feeds the real BMP encoder with (62
    * visual-prefix pixels + 2 length-bucket footer pixels). */
  private lazy val mmPixelCtes: String = {
    val pxCols = (0 until 64).map(i =>
      s"CAST('0x' || ${mmPixHex(i)} AS INT) AS px$i").mkString(",\n    ")
    s"""d AS (
       |  SELECT doc_id,
       |    md5('p0|' || substr(text, 1, 40)) || md5('p1|' || substr(text, 1, 40)) ||
       |    md5('p2|' || substr(text, 1, 40)) || md5('p3|' || substr(text, 1, 40)) AS hx,
       |    md5('L|' || CAST(n_chars // 64 AS VARCHAR)) AS lh
       |  FROM documents
       |),
       |p AS (
       |  SELECT doc_id,
       |    $pxCols
       |  FROM d
       |)""".stripMargin
  }

  /** CTEs for the 64-bit perceptual hash over the decoded grid: bit b
    * = pixel_b·64 > Σ pixels (exact-integer aHash threshold). Spark
    * thresholds decoded channel-sum luminance 3p·64 > 3Σ — same bits. */
  private lazy val mmPhashCtes: String = {
    val tot = (0 until 64).map(i => s"px$i").mkString(" + ")
    val bits = (0 until 64).map(i =>
      s"CASE WHEN px$i * 64 > tot THEN '1' ELSE '0' END").mkString(", ")
    s"""$mmPixelCtes,
       |q AS (SELECT *, ($tot) AS tot FROM p),
       |sig AS (SELECT doc_id, concat($bits) AS sig64 FROM q)""".stripMargin
  }

  val mmPhash: String =
    s"""WITH $mmPhashCtes
       |SELECT doc_id, sig64 AS phash FROM sig ORDER BY doc_id""".stripMargin

  /** Hamming ≤ 2 pHash pairing — identical pigeonhole band/cap/verify
    * construction as `dedupSimhashPairs`, over the perceptual
    * signature. */
  val mmPhashPairs: String = {
    val ham = "bit_count(xor(CAST(a.sig64 AS BIT), CAST(b.sig64 AS BIT)))"
    s"""WITH $mmPhashCtes,
       |bands0 AS (
       |  SELECT doc_id, 0 AS b, substr(sig64, 1, 22) AS key FROM sig
       |  UNION ALL SELECT doc_id, 1, substr(sig64, 23, 21) FROM sig
       |  UNION ALL SELECT doc_id, 2, substr(sig64, 44, 21) FROM sig
       |),
       |bands AS (
       |  SELECT doc_id, b, key FROM bands0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY b, key ORDER BY doc_id) <= ${ops.Dedup.MaxBucket}
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
       |),
       |hm AS (
       |  SELECT c.doc_a, c.doc_b, ($ham) AS hamming
       |  FROM cand c
       |  JOIN sig a ON a.doc_id = c.doc_a
       |  JOIN sig b ON b.doc_id = c.doc_b
       |)
       |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       |FROM hm WHERE hamming <= 2 ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Applied pHash dedup decision over media: Hamming≤2 pairs through
    * the same recursive component fixpoint as `dedupApply` —
    * mirroring `Multimodal.dedupApply`. */
  val mmDedupApply: String = {
    val ham = "bit_count(xor(CAST(a.sig64 AS BIT), CAST(b.sig64 AS BIT)))"
    s"""WITH RECURSIVE $mmPhashCtes,
       |bands0 AS (
       |  SELECT doc_id, 0 AS b, substr(sig64, 1, 22) AS key FROM sig
       |  UNION ALL SELECT doc_id, 1, substr(sig64, 23, 21) FROM sig
       |  UNION ALL SELECT doc_id, 2, substr(sig64, 44, 21) FROM sig
       |),
       |bands AS (
       |  SELECT doc_id, b, key FROM bands0
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY b, key ORDER BY doc_id) <= ${ops.Dedup.MaxBucket}
       |),
       |cand0 AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
       |),
       |cand AS (
       |  SELECT c.doc_a, c.doc_b FROM cand0 c
       |  JOIN sig a ON a.doc_id = c.doc_a
       |  JOIN sig b ON b.doc_id = c.doc_b
       |  WHERE ($ham) <= 2
       |),
       |$clusterCtes,
       |cl AS (
       |  SELECT id AS doc_id, MIN(r) AS cluster_id, id = MIN(r) AS keep
       |  FROM reach GROUP BY id
       |)
       |SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
       |       CAST(54 + 3 * 8 * 8 AS BIGINT) AS n_bytes
       |FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
       |WHERE COALESCE(cl.keep, TRUE)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------- similarity

  /** cos(x, y) over two DuckDB list expressions, double accumulation. */
  private def cosSql(x: String, y: String): String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[CAST(i AS INT)]::DOUBLE * $b[CAST(i AS INT)]::DOUBLE))"
    s"${dot(x, y)} / (sqrt(${dot(x, x)}) * sqrt(${dot(y, y)}))"
  }

  /** Per-label norm audit with a decimal-exact mean of 6-dp-rounded
    * norms — mirroring `Similarity.normAudit`. */
  val simNormAudit: String = {
    val dotSelf =
      "list_sum(list_transform(range(1, len(embedding) + 1), " +
        "i -> embedding[CAST(i AS INT)]::DOUBLE * embedding[CAST(i AS INT)]::DOUBLE))"
    s"""WITH n AS (
       |  SELECT CAST(label AS BIGINT) AS label,
       |         ROUND(SQRT($dotSelf), 6) AS n6
       |  FROM embeddings
       |)
       |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       |       MIN(n6) AS min_norm, MAX(n6) AS max_norm,
       |       ROUND(CAST(SUM(CAST(n6 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_norm
       |FROM n GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val simTopK: String =
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
       |pairs AS (
       |  SELECT q.vec_id AS vec_id, v.vec_id AS nbr_id,
       |         ROUND(${cosSql("q.embedding", "v.embedding")}, 6) AS cos
       |  FROM q JOIN embeddings v ON q.vec_id <> v.vec_id
       |),
       |r AS (
       |  SELECT vec_id, nbr_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id) AS rnk
       |  FROM pairs
       |)
       |SELECT vec_id, nbr_id, cos, CAST(rnk AS BIGINT) AS rank
       |FROM r WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin

  /** Mirrors `Similarity.mmrSearch`: exact top-10 candidates, then
    * the 3-step greedy MMR unroll (λ = 0.5, max-sim to the picked
    * set, 6-dp scores, node-id tie order at every argmax). */
  val simMmr: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
       |cand AS MATERIALIZED (
       |  SELECT qid, node, rel FROM (
       |    SELECT q.qid, e.vec_id AS node,
       |           ROUND(${cosSql("q.qe", "e.embedding")}, 6) AS rel,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid
       |             ORDER BY ROUND(${cosSql("q.qe", "e.embedding")}, 6) DESC, e.vec_id) AS rn
       |    FROM q JOIN embeddings e ON e.vec_id <> q.qid)
       |  WHERE rn <= 10
       |),
       |sims AS MATERIALIZED (
       |  SELECT a.qid, a.node AS na, b.node AS nb,
       |         ROUND(${cosSql("va.embedding", "vb.embedding")}, 6) AS sim
       |  FROM cand a
       |  JOIN cand b ON a.qid = b.qid AND a.node <> b.node
       |  JOIN embeddings va ON va.vec_id = a.node
       |  JOIN embeddings vb ON vb.vec_id = b.node
       |),
       |p1 AS MATERIALIZED (
       |  SELECT qid, node, rel, mmr FROM (
       |    SELECT qid, node, rel, ROUND(0.5 * rel, 6) AS mmr,
       |           ROW_NUMBER() OVER (PARTITION BY qid
       |             ORDER BY ROUND(0.5 * rel, 6) DESC, node) AS rk
       |    FROM cand) WHERE rk = 1
       |),
       |p2 AS MATERIALIZED (
       |  SELECT qid, node, rel, mmr FROM (
       |    SELECT s.qid, s.node, s.rel,
       |           ROUND(0.5 * s.rel - 0.5 * s.msim, 6) AS mmr,
       |           ROW_NUMBER() OVER (PARTITION BY s.qid
       |             ORDER BY ROUND(0.5 * s.rel - 0.5 * s.msim, 6) DESC, s.node) AS rk
       |    FROM (
       |      SELECT c.qid, c.node, c.rel, MAX(sims.sim) AS msim
       |      FROM cand c
       |      JOIN p1 ON p1.qid = c.qid AND c.node <> p1.node
       |      JOIN sims ON sims.qid = c.qid AND sims.na = c.node AND sims.nb = p1.node
       |      GROUP BY 1, 2, 3) s) WHERE rk = 1
       |),
       |pp AS (SELECT qid, node FROM p1 UNION ALL SELECT qid, node FROM p2),
       |p3 AS (
       |  SELECT qid, node, rel, mmr FROM (
       |    SELECT s.qid, s.node, s.rel,
       |           ROUND(0.5 * s.rel - 0.5 * s.msim, 6) AS mmr,
       |           ROW_NUMBER() OVER (PARTITION BY s.qid
       |             ORDER BY ROUND(0.5 * s.rel - 0.5 * s.msim, 6) DESC, s.node) AS rk
       |    FROM (
       |      SELECT c.qid, c.node, c.rel, MAX(sims.sim) AS msim
       |      FROM cand c
       |      JOIN pp ON pp.qid = c.qid
       |      JOIN sims ON sims.qid = c.qid AND sims.na = c.node AND sims.nb = pp.node
       |      WHERE NOT EXISTS (SELECT 1 FROM pp x
       |                        WHERE x.qid = c.qid AND x.node = c.node)
       |      GROUP BY 1, 2, 3) s) WHERE rk = 1
       |)
       |SELECT qid AS vec_id, node AS nbr_id, rel, mmr, CAST(rank AS BIGINT) AS rank
       |FROM (SELECT p1.*, 1 AS rank FROM p1
       |      UNION ALL SELECT p2.*, 2 AS rank FROM p2
       |      UNION ALL SELECT p3.*, 3 AS rank FROM p3)
       |ORDER BY vec_id, rank""".stripMargin

  /** Mirrors `Similarity.sq8Search`: L2-normalize (the shared
    * dot/sqrt discipline), one global symmetric scale over the
    * normalized elements, floor(127·x/s + 0.5) clamped to
    * [−127, 127], exact int64 dot products (list_sum over BIGINT
    * products — integer arithmetic, so no rounding discipline is
    * needed anywhere after quantization). */
  /** Shared SQ8 chain: normalize, global scale, int8 codes, the
    * bounded query side, and the per-pair exact int64 dots. */
  private lazy val sq8Ctes: String =
    """nv AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
      |      NULLIF(sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
      |        i -> embedding[CAST(i AS INT)]::DOUBLE * embedding[CAST(i AS INT)]::DOUBLE))), 0.0)) AS e
      |  FROM embeddings),
      |s AS (
      |  SELECT max(abs(u.x)) AS s
      |  FROM (SELECT unnest(e) AS x FROM nv) u(x)),
      |codes AS (
      |  SELECT vec_id, list_transform(e, x ->
      |    greatest(-127, least(127, COALESCE(
      |      CAST(floor(x * 127.0 / NULLIF(s.s, 0.0) + 0.5) AS INT),
      |      0)))) AS c
      |  FROM nv, s),
      |q AS (SELECT vec_id AS qid, c AS qc FROM codes WHERE vec_id < 10),
      |d AS (
      |  SELECT qid, vec_id AS nbr_id,
      |    list_sum(list_transform(range(1, len(qc) + 1),
      |      i -> CAST(qc[CAST(i AS INT)] AS BIGINT) * c[CAST(i AS INT)])) AS idot
      |  FROM q, codes WHERE vec_id <> qid)""".stripMargin

  val simSq8Search: String =
    s"""WITH $sq8Ctes,
       |r AS (
       |  SELECT qid, nbr_id, idot,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY idot DESC, nbr_id) AS rnk
       |  FROM d)
       |SELECT qid AS vec_id, nbr_id, CAST(idot AS BIGINT) AS idot,
       |       CAST(rnk AS BIGINT) AS rank
       |FROM r WHERE rnk <= 3 ORDER BY vec_id, rank""".stripMargin

  /** Two-stage SQ8: integer-dot top-32 overfetch, exact-cosine
    * rerank to top-3 — mirrors `Similarity.sq8Rerank`. */
  val simSq8Rerank: String =
    s"""WITH $sq8Ctes,
       |cand AS (
       |  SELECT qid, nbr_id FROM (
       |    SELECT qid, nbr_id,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY idot DESC, nbr_id) AS crn
       |    FROM d)
       |  WHERE crn <= 32),
       |rr AS (
       |  SELECT c.qid, c.nbr_id,
       |    ROUND(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
       |  FROM cand c
       |  JOIN embeddings a ON a.vec_id = c.qid
       |  JOIN embeddings b ON b.vec_id = c.nbr_id),
       |rk AS (
       |  SELECT qid, nbr_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nbr_id) AS rnk
       |  FROM rr)
       |SELECT qid AS vec_id, nbr_id, cos, CAST(rnk AS BIGINT) AS rank
       |FROM rk WHERE rnk <= 3 ORDER BY vec_id, rank""".stripMargin

  /** `simRecall`'s shape over the SQ8 scan. */
  val simSq8Recall: String =
    s"""WITH bf AS ($simTopK),
       |sq AS ($simSq8Search)
       |SELECT sq.vec_id, sq.nbr_id,
       |       bf.rank IS NOT NULL AS in_top3,
       |       bf.rank AS true_rank
       |FROM sq LEFT JOIN bf USING (vec_id, nbr_id)
       |ORDER BY sq.vec_id, sq.nbr_id""".stripMargin

  val simLsh: String = {
    val sig = (1 to 8).map(i => s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(", ")
    s"""WITH v AS (
       |  SELECT vec_id, embedding, concat($sig) AS bucket FROM embeddings
       |),
       |pairs AS (
       |  SELECT a.vec_id, a.bucket, b.vec_id AS nbr_id,
       |         ROUND(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
       |  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |),
       |r AS (
       |  SELECT vec_id, bucket, nbr_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id) AS rn
       |  FROM pairs
       |)
       |SELECT vec_id, bucket, nbr_id, cos FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** Banded sign-LSH candidate generation (4 bands × 8 hyperplane
    * signs), cosine verified on candidates only — the same equi-join
    * construction as the Spark side, so results are bit-identical at
    * any SF (the operator's semantics ARE the LSH-approximate ones;
    * no all-pairs cartesian on either engine). */
  /** Shared fragment: banded sign-LSH candidates + cosine-verified
    * near-dup pairs — ends in `cand(doc_a, doc_b, cos)`, the verified
    * pair list `simNearDup` publishes and `simClusters` clusters
    * (named `cand` so `clusterCtes` composes on top). */
  private def simNearDupCtes(threshold: Double): String = {
    def sig(b: Int) =
      "concat(" + (1 to 8).map(i =>
        s"CASE WHEN embedding[${8 * b + i}] >= 0 THEN '1' ELSE '0' END").mkString(", ") + ")"
    val bandRows = (0 until 4).map(b =>
      (if (b == 0) "" else "UNION ALL ") +
        s"SELECT vec_id, $b AS b, ${sig(b)} AS key FROM embeddings").mkString("\n  ")
    s"""bands AS (
       |  $bandRows
       |),
       |cand0 AS (
       |  SELECT DISTINCT x.vec_id AS doc_a, y.vec_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.key = y.key AND x.vec_id < y.vec_id
       |),
       |cand AS (
       |  SELECT c.doc_a, c.doc_b,
       |         ROUND(${cosSql("a.embedding", "b2.embedding")}, 6) AS cos
       |  FROM cand0 c
       |  JOIN embeddings a  ON a.vec_id = c.doc_a
       |  JOIN embeddings b2 ON b2.vec_id = c.doc_b
       |  WHERE ROUND(${cosSql("a.embedding", "b2.embedding")}, 6) >= $threshold
       |)""".stripMargin
  }

  val simNearDup: String =
    s"""WITH ${simNearDupCtes(0.9)}
       |SELECT doc_a, doc_b, cos FROM cand ORDER BY doc_a, doc_b""".stripMargin

  /** Loose-threshold variant (`Similarity.LooseThreshold`): the
    * testdata has no pair above cos 0.9, so `simNearDup` proves only
    * the 0-row case — this one makes the cross-engine gate check a
    * NON-EMPTY result (19 pairs at sf0.01). */
  val simNearDupLoose: String =
    s"""WITH ${simNearDupCtes(ops.Similarity.LooseThreshold)}
       |SELECT doc_a, doc_b, cos FROM cand ORDER BY doc_a, doc_b""".stripMargin

  /** Near-dup vector clusters: the SAME min-reachability fixpoint the
    * text clusters use, over the cosine-verified pair list. */
  /** ANN recall audit: the LSH pick LEFT-joined against the exact
    * top-3 (both full oracle queries nested as CTE bodies). */
  val simRecall: String =
    s"""WITH bf AS ($simTopK),
       |l AS ($simLsh)
       |SELECT l.vec_id, l.nbr_id,
       |       bf.rank IS NOT NULL AS in_top3,
       |       bf.rank AS true_rank
       |FROM l LEFT JOIN bf USING (vec_id, nbr_id)
       |WHERE l.vec_id < 10
       |ORDER BY l.vec_id""".stripMargin

  /** Threshold sweep: cumulative pair counts per threshold, LEFT join
    * so zero-count thresholds survive; identical double literals in
    * both engines. */
  val simNearDupSweep: String =
    s"""WITH ${simNearDupCtes(0.3)},
       |t AS (SELECT UNNEST([0.30, 0.35, 0.40, 0.45, 0.50, 0.55, 0.60,
       |                     0.65, 0.70, 0.75, 0.80, 0.85, 0.90]) AS threshold)
       |SELECT t.threshold, CAST(COUNT(c.cos) AS BIGINT) AS n_pairs
       |FROM t LEFT JOIN cand c ON c.cos >= t.threshold
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val simClusters: String =
    s"""WITH RECURSIVE ${simNearDupCtes(0.9)},
       |$clusterCtes
       |SELECT id AS doc_id, MIN(r) AS cluster_id, id = MIN(r) AS keep
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** Cluster formation over the loose near-dup pairs — non-empty at
    * the gate SFs. */
  val simClustersLoose: String =
    s"""WITH RECURSIVE ${simNearDupCtes(ops.Similarity.LooseThreshold)},
       |$clusterCtes
       |SELECT id AS doc_id, MIN(r) AS cluster_id, id = MIN(r) AS keep
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** Mirrors `Similarity.dbscan`: banded-LSH eps-neighbors at the
    * loose threshold, degree ≥ 2 cores, core-core components seeded
    * with ALL cores (isolated cores self-root), min-cluster border
    * attachment, the rest noise. */
  val simDbscan: String =
    s"""WITH RECURSIVE ${simNearDupCtes(ops.Similarity.LooseThreshold)},
       |adj AS (SELECT doc_a AS id, doc_b AS nbr FROM cand
       |        UNION ALL SELECT doc_b, doc_a FROM cand),
       |deg AS (SELECT id, COUNT(*) AS degree FROM adj GROUP BY id),
       |cores AS (SELECT id FROM deg WHERE degree >= 2),
       |cdir AS (
       |  SELECT c.doc_a AS src, c.doc_b AS dst FROM cand c
       |  WHERE c.doc_a IN (SELECT id FROM cores) AND c.doc_b IN (SELECT id FROM cores)
       |  UNION ALL
       |  SELECT c.doc_b, c.doc_a FROM cand c
       |  WHERE c.doc_a IN (SELECT id FROM cores) AND c.doc_b IN (SELECT id FROM cores)
       |),
       |creach(id, r) AS (
       |  SELECT id, id FROM cores
       |  UNION
       |  SELECT w.id, e.dst FROM creach w JOIN cdir e ON e.src = w.r
       |),
       |ccl AS (SELECT id, MIN(r) AS cluster_id FROM creach GROUP BY id),
       |border AS (
       |  SELECT a.id, MIN(c.cluster_id) AS cluster_id
       |  FROM adj a JOIN ccl c ON c.id = a.nbr
       |  WHERE a.id NOT IN (SELECT id FROM cores)
       |  GROUP BY a.id
       |)
       |SELECT e.vec_id AS doc_id,
       |  CASE WHEN cc.cluster_id IS NOT NULL THEN 'core'
       |       WHEN b.cluster_id IS NOT NULL THEN 'border'
       |       ELSE 'noise' END AS role,
       |  COALESCE(cc.cluster_id, b.cluster_id) AS cluster_id
       |FROM embeddings e
       |LEFT JOIN ccl cc ON cc.id = e.vec_id
       |LEFT JOIN border b ON b.id = e.vec_id
       |ORDER BY doc_id""".stripMargin

  /** Int8 scalar-quantization audit: symmetric per-vector scale,
    * saturation count, L2 reconstruction error. */
  val simQuantize: String =
    """WITH e AS (
      |  SELECT vec_id, UNNEST(embedding)::DOUBLE AS x FROM embeddings
      |),
      |m AS (SELECT vec_id, MAX(abs(x)) AS mx FROM e GROUP BY vec_id),
      |q AS (
      |  SELECT e.vec_id, e.x, m.mx,
      |         COALESCE(ROUND(e.x * 127.0 / NULLIF(m.mx, 0.0)), 0.0) AS qv
      |  FROM e JOIN m ON m.vec_id = e.vec_id
      |)
      |SELECT vec_id,
      |       ROUND(MAX(mx) / 127.0, 6) AS scale,
      |       CAST(SUM(CASE WHEN abs(qv) = 127.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
      |       ROUND(sqrt(SUM((x - qv * mx / 127.0) * (x - qv * mx / 127.0))), 6) AS recon_err
      |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Embedding outliers: 6-dp d2 to label centroid, per-label mean
    * dispersion, top-10 by 6-dp dispersion-relative ratio with vec_id
    * tiebreak — mirroring `Similarity.outliers`. */
  val simOutliers: String =
    """WITH e AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
      |         UNNEST(embedding)::DOUBLE AS x
      |  FROM embeddings
      |),
      |c AS (SELECT label, pos, AVG(x) AS cx FROM e GROUP BY 1, 2),
      |d AS (
      |  SELECT e.vec_id, e.label,
      |         ROUND(SUM(e.x * e.x) - 2 * SUM(e.x * c.cx) + SUM(c.cx * c.cx), 6) AS d2
      |  FROM e JOIN c ON e.label = c.label AND e.pos = c.pos
      |  GROUP BY 1, 2
      |),
      |disp AS (SELECT label, ROUND(AVG(d2), 6) AS dispersion FROM d GROUP BY 1)
      |SELECT d.vec_id, d.label, d.d2, disp.dispersion,
      |       ROUND(d.d2 / disp.dispersion, 6) AS ratio
      |FROM d JOIN disp USING (label)
      |ORDER BY ratio DESC, d.vec_id LIMIT 10""".stripMargin

  /** Per-label diversity: 6-dp-rounded squared L2 to the positional
    * centroid (the `simKmeans` distance form), then mean/max. */
  val simDiversity: String =
    """WITH e AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
      |         UNNEST(embedding)::DOUBLE AS x
      |  FROM embeddings
      |),
      |c AS (SELECT label, pos, AVG(x) AS cx FROM e GROUP BY 1, 2),
      |d AS (
      |  SELECT e.vec_id, e.label,
      |         ROUND(SUM(e.x * e.x) - 2 * SUM(e.x * c.cx) + SUM(c.cx * c.cx), 6) AS d2
      |  FROM e JOIN c ON e.label = c.label AND e.pos = c.pos
      |  GROUP BY 1, 2
      |)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
      |       ROUND(AVG(d2), 6) AS dispersion, MAX(d2) AS radius
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  val simCentroids: String =
    """WITH e AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
      |         UNNEST(embedding)::DOUBLE AS x
      |  FROM embeddings
      |),
      |c AS (SELECT label, pos, AVG(x) AS cx FROM e GROUP BY label, pos),
      |d AS (
      |  SELECT e.vec_id, e.label,
      |         SUM(e.x * c.cx) AS dot, SUM(e.x * e.x) AS nv, SUM(c.cx * c.cx) AS nc
      |  FROM e JOIN c ON e.label = c.label AND e.pos = c.pos
      |  GROUP BY e.vec_id, e.label
      |),
      |cv AS (SELECT vec_id, label, ROUND(dot / (sqrt(nv) * sqrt(nc)), 6) AS cos FROM d),
      |r AS (
      |  SELECT vec_id, label, cos,
      |         ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos DESC, vec_id) AS rn
      |  FROM cv
      |),
      |cnt AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label)
      |SELECT r.label, cnt.n, r.vec_id AS medoid_id, r.cos AS medoid_cos
      |FROM r JOIN cnt ON cnt.label = r.label
      |WHERE r.rn = 1 ORDER BY r.label""".stripMargin

  /** Lloyd's k-means, unrolled: k=8 centroids seeded from vec_id < 8,
    * two assign/update iterations as explicit CTE pairs, final
    * assignment output — the exact computation the Spark side runs
    * with a fixed iteration count, so the chain is cross-engine
    * deterministic. Distances use the positional-sum form (same as
    * `simCentroids`); ROUND(dist, 6) before the argmin pins the
    * cluster choice across engines, with the centroid-id tiebreak. */
  /** The k-means CTE chain (ends in `a3(vec_id, cid, dist)`, the
    * final assignment) — shared by `simKmeans` and `simSemdedup` so
    * both queries see the identical clustering. */
  private lazy val kmeansCtes: String = {
    def assign(i: Int, cPrev: String) =
      s"""d$i AS (
         |  SELECT e.vec_id, c.cid,
         |         ROUND(SUM(e.x * e.x) - 2 * SUM(e.x * c.cx) + SUM(c.cx * c.cx), 6) AS dist
         |  FROM e JOIN $cPrev c ON e.pos = c.pos
         |  GROUP BY 1, 2
         |),
         |a$i AS (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT vec_id, cid, dist,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d$i) t
         |  WHERE rn = 1
         |)""".stripMargin
    def update(i: Int) =
      s"""c$i AS (
         |  SELECT a.cid, e.pos, AVG(e.x) AS cx
         |  FROM a$i a JOIN e USING (vec_id)
         |  GROUP BY 1, 2
         |)""".stripMargin
    s"""e AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
       |         UNNEST(embedding)::DOUBLE AS x
       |  FROM embeddings
       |),
       |c0 AS (SELECT vec_id AS cid, pos, x AS cx FROM e WHERE vec_id < 8),
       |${assign(1, "c0")},
       |${update(1)},
       |${assign(2, "c1")},
       |${update(2)},
       |${assign(3, "c2")}""".stripMargin
  }

  val simKmeans: String =
    s"""WITH $kmeansCtes
       |SELECT vec_id, cid AS cluster, dist FROM a3 ORDER BY vec_id""".stripMargin

  /** Shared PQ training chain (`pe`, `pc0..pc2`, `pa1..pa3`) —
    * per-subspace unrolled Lloyd's (4×16-dim subspaces, k=8, 3
    * assigns / 2 updates, 6-dp argmin with cid tiebreak); consumed by
    * `simPq` and `simPqTopK` so both see the identical codebook. */
  private lazy val pqCtes: String = pqChain(16, 8)

  /** The PQ training chain parameterized by subspace width and
    * codebook size: `pqCtes` (4×16-dim, k=8 — the storage config) and
    * `simPqSearch`'s fine search config (32×2-dim, k=16) share it. */
  private def pqChain(subDim: Int, k: Int): String = {
    def assign(i: Int, cPrev: String) =
      s"""pd$i AS (
         |  SELECT e.vec_id, e.sub, c.cid,
         |         ROUND(SUM(e.x * e.x) - 2 * SUM(e.x * c.cx) + SUM(c.cx * c.cx), 6) AS dist
         |  FROM pe e JOIN $cPrev c ON e.sub = c.sub AND e.pos = c.pos
         |  GROUP BY 1, 2, 3
         |),
         |pa$i AS (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
         |    FROM pd$i) t
         |  WHERE rn = 1
         |)""".stripMargin
    def update(i: Int) =
      s"""pc$i AS (
         |  SELECT e.sub, a.cid, e.pos, AVG(e.x) AS cx
         |  FROM pa$i a JOIN pe e ON e.vec_id = a.vec_id AND e.sub = a.sub
         |  GROUP BY 1, 2, 3
         |)""".stripMargin
    s"""pe0 AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS p,
       |         UNNEST(embedding)::DOUBLE AS x
       |  FROM embeddings
       |),
       |pe AS (SELECT vec_id, (p - 1) // $subDim AS sub, (p - 1) % $subDim AS pos, x FROM pe0),
       |pc0 AS (SELECT sub, vec_id AS cid, pos, x AS cx FROM pe WHERE vec_id < $k),
       |${assign(1, "pc0")},
       |${update(1)},
       |${assign(2, "pc1")},
       |${update(2)},
       |${assign(3, "pc2")}""".stripMargin
  }

  /** Mirrors `Similarity.pq`: the shared PQ chain, codes pivoted + L2
    * reconstruction error against the final codebook. */
  val simPq: String =
    s"""WITH $pqCtes,
       |perr AS (
       |  SELECT e.vec_id, ROUND(sqrt(SUM((e.x - c.cx) * (e.x - c.cx))), 6) AS recon_err
       |  FROM pa3 a
       |  JOIN pe e ON e.vec_id = a.vec_id AND e.sub = a.sub
       |  JOIN pc2 c ON c.sub = a.sub AND c.cid = a.cid AND c.pos = e.pos
       |  GROUP BY 1
       |),
       |pcodes AS (
       |  SELECT vec_id,
       |         MAX(CASE WHEN sub = 0 THEN cid END) AS code0,
       |         MAX(CASE WHEN sub = 1 THEN cid END) AS code1,
       |         MAX(CASE WHEN sub = 2 THEN cid END) AS code2,
       |         MAX(CASE WHEN sub = 3 THEN cid END) AS code3
       |  FROM pa3 GROUP BY 1
       |)
       |SELECT c.vec_id, c.code0, c.code1, c.code2, c.code3, e2.recon_err
       |FROM pcodes c JOIN perr e2 USING (vec_id) ORDER BY vec_id""".stripMargin

  /** Mirrors `Similarity.pqTopK`: ADC search over the shared PQ
    * chain — per-query 4×8 distance tables, code-word-lookup sums,
    * top-3 by (6-dp adist, nbr), exact-L2 top-3 recall flag. */
  val simPqTopK: String =
    s"""WITH $pqCtes,
       |q AS (SELECT vec_id AS qid, sub, pos, x AS qx FROM pe WHERE vec_id < 10),
       |dt AS (
       |  SELECT q.qid, c.sub, c.cid, SUM((q.qx - c.cx) * (q.qx - c.cx)) AS d
       |  FROM q JOIN pc2 c ON c.sub = q.sub AND c.pos = q.pos
       |  GROUP BY 1, 2, 3
       |),
       |ad AS (
       |  SELECT dt.qid, a.vec_id AS nbr_id, ROUND(SUM(dt.d), 6) AS adist
       |  FROM pa3 a JOIN dt ON dt.sub = a.sub AND dt.cid = a.cid
       |  WHERE dt.qid <> a.vec_id
       |  GROUP BY 1, 2
       |),
       |ap AS (
       |  SELECT qid, nbr_id, adist,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adist, nbr_id) AS rank
       |  FROM ad
       |),
       |exd AS (
       |  SELECT q.qid, e.vec_id AS nid, ROUND(SUM((q.qx - e.x) * (q.qx - e.x)), 6) AS d2
       |  FROM q JOIN pe e ON e.sub = q.sub AND e.pos = q.pos
       |  WHERE e.vec_id <> q.qid
       |  GROUP BY 1, 2
       |),
       |ext AS (
       |  SELECT qid, nid, true_rank FROM (
       |    SELECT qid, nid,
       |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS true_rank
       |    FROM exd) t
       |  WHERE true_rank <= 3
       |)
       |SELECT ap.qid AS vec_id, ap.nbr_id, ap.adist,
       |       ext.true_rank IS NOT NULL AS in_top3, ext.true_rank
       |FROM ap LEFT JOIN ext ON ext.qid = ap.qid AND ext.nid = ap.nbr_id
       |WHERE ap.rank <= 3
       |ORDER BY vec_id, adist, nbr_id""".stripMargin

  /** SemDeDup: the k-means chain + the loose banded near-dup pairs;
    * a pair counts only when both ends share a cluster, and the drop
    * rule is the greedy keep-first (smallest lower-id witness in
    * `dup_of`) — the identical construction as `Similarity.semDedup`. */
  val simSemdedup: String =
    s"""WITH $kmeansCtes,
       |${simNearDupCtes(ops.Similarity.LooseThreshold)},
       |sp AS (
       |  SELECT c.doc_a, c.doc_b FROM cand c
       |  JOIN a3 x ON x.vec_id = c.doc_a
       |  JOIN a3 y ON y.vec_id = c.doc_b AND x.cid = y.cid
       |),
       |dup AS (SELECT doc_b AS vec_id, MIN(doc_a) AS dup_of FROM sp GROUP BY 1)
       |SELECT a.vec_id, a.cid AS cluster, d.dup_of IS NULL AS keep, d.dup_of
       |FROM a3 a LEFT JOIN dup d USING (vec_id) ORDER BY a.vec_id""".stripMargin

  /** In-cell kNN graph: per-cell self-join (the IVF-cell containment
    * bound), exact top-3 by 6-dp cosine with neighbor-id tiebreak.
    * Carries the identical width-tiered cell split as the Spark side:
    * cells wider than 500 split on 3 sign bits, wider than 4000 on 6,
    * wider than 32000 on 9. */
  /** kNN-graph CTE chain (`cw`, `v`, `pairs`, `r`) — shared by
    * `simKnnGraph` and `simPagerank` so the two queries see the
    * identical edge set. */
  private lazy val knnGraphCtes: String = {
    val sig9 = (1 to 9).map(i =>
      s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString(", ")
    s"""cw AS (SELECT label, COUNT(*) AS cn FROM embeddings GROUP BY 1),
       |v AS (
       |  SELECT vec_id, embedding,
       |         concat(e.label, '_', substr(concat($sig9), 1,
       |           CASE WHEN cw.cn > 32000 THEN 9 WHEN cw.cn > 4000 THEN 6
       |                WHEN cw.cn > 500 THEN 3 ELSE 0 END)) AS cell
       |  FROM embeddings e JOIN cw USING (label)
       |),
       |pairs AS (
       |  SELECT a.vec_id, b.vec_id AS nbr_id,
       |         ROUND(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
       |  FROM v a JOIN v b
       |    ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |),
       |r AS (
       |  SELECT vec_id, nbr_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id) AS rnk
       |  FROM pairs
       |)""".stripMargin
  }

  val simKnnGraph: String =
    s"""WITH $knnGraphCtes
       |SELECT vec_id, nbr_id, cos, CAST(rnk AS BIGINT) AS rank
       |FROM r WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin

  /** Mirrors `Similarity.graphSearch` end to end: the navigable-graph
    * build (`navGraphFrom`: 8-band sign-LSH seed — all pairs in
    * buckets ≤ 64 members, member×anchor pairs in wider ones, the
    * same LCG anchor draw as `Similarity.navSeedPairs` → two
    * NN-descent rounds → symmetrize, degree 16) and
    * the [[NavH]]-hop beam-[[NavW]] walk from the 16 lowest vec_ids — identical
    * 6-dp cosines and (cos DESC, id) tie order throughout, so both
    * engines produce the same graph and the same walk. Norms are
    * precomputed once in `vn` (the oracle-side analogue of Spark's
    * `vecs` norm column). Every stage that a later CTE references
    * twice is MATERIALIZED — DuckDB would otherwise inline the whole
    * chain exponentially (the simKcore lesson). */
  private def navDotAb(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[CAST(i AS INT)]::DOUBLE * $b[CAST(i AS INT)]::DOUBLE))"

  /** The navigable-graph BUILD as a WITH-body fragment (vn … g):
    * shared by the cosine walks ([[simGraphSearch]]/
    * [[simShardedSearch]] via `navSearchSql`) and the ADC walk
    * ([[simPqSearch]]). */
  private def navBuildCtes(sharded: Boolean): String = {
    val dotSelf =
      "list_sum(list_transform(range(1, len(embedding) + 1), " +
        "i -> embedding[CAST(i AS INT)]::DOUBLE * embedding[CAST(i AS INT)]::DOUBLE))"
    def dotAb(a: String, b: String) = navDotAb(a, b)
    def sig(b: Int) =
      "concat(" + (1 to 8).map(i =>
        s"CASE WHEN embedding[${8 * b + i}] >= 0 THEN '1' ELSE '0' END").mkString(", ") + ")"
    // sharded build: the shard (vec_id % 4) joins the bucket key, so
    // candidates never cross shards; disjoint node sets keep every
    // later CTE shard-local with no shard column
    val shardCol = if (sharded) ", vec_id % 4 AS shard" else ""
    val bucketKey = if (sharded) "shard, b, key" else "b, key"
    val bandRows = (0 until 8).map(b =>
      (if (b == 0) "" else "UNION ALL ") +
        s"SELECT vec_id, $b AS b, ${sig(b)} AS key$shardCol FROM embeddings").mkString("\n  ")
    // candidate (node, nbr_id) CTE -> directed top-16 edges by cosine
    def topK(in: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT node, nbr_id FROM (
         |    SELECT c.node, c.nbr_id,
         |           ROW_NUMBER() OVER (PARTITION BY c.node ORDER BY
         |             ROUND(${dotAb("a.embedding", "w.embedding")} / (a.nrm * w.nrm), 6) DESC,
         |             c.nbr_id) AS rn
         |    FROM (SELECT DISTINCT node, nbr_id FROM $in) c
         |    JOIN vn a ON c.node = a.vec_id
         |    JOIN vn w ON c.nbr_id = w.vec_id)
         |  WHERE rn <= 16
         |)""".stripMargin
    def und(e: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT node, nbr_id FROM $e
         |  UNION
         |  SELECT nbr_id AS node, node AS nbr_id FROM $e
         |)""".stripMargin
    // expansion adjacency: per-node 64 lowest-id neighbors (the hub
    // guard `Similarity.navExpandAdj`; never binds at oracle scales)
    def capAdj(u: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT node, nbr_id FROM (
         |    SELECT node, nbr_id,
         |           ROW_NUMBER() OVER (PARTITION BY node ORDER BY nbr_id) AS crn
         |    FROM $u)
         |  WHERE crn <= 64
         |)""".stripMargin
    // candidates = capped neighborhood + its 2-hop + the previous
    // round's directed edges (mirrors Similarity.navGraphRounds)
    def refineCand(u: String, prevE: String, out: String): String =
      s"""$out AS (
         |  SELECT node, nbr_id FROM $u
         |  UNION
         |  SELECT m.src AS node, $u.nbr_id
         |  FROM (SELECT nbr_id AS node, node AS src FROM $u) m
         |  JOIN $u USING (node)
         |  WHERE m.src <> $u.nbr_id
         |  UNION
         |  SELECT node, nbr_id FROM $prevE
         |)""".stripMargin
    s"""vn AS MATERIALIZED (
       |  SELECT vec_id, embedding, SQRT($dotSelf) AS nrm FROM embeddings
       |),
       |bands AS (
       |  $bandRows
       |),
       |bstat AS (SELECT $bucketKey, COUNT(*) AS bn, MIN(vec_id) AS a0
       |          FROM bands GROUP BY $bucketKey),
       |incap AS MATERIALIZED (
       |  SELECT bands.* FROM bands JOIN bstat USING ($bucketKey) WHERE bn <= 64),
       |anch AS (
       |  SELECT bands.* FROM bands JOIN bstat USING ($bucketKey)
       |  WHERE bn > 64 AND (vec_id = a0 OR
       |    CAST(((vec_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS DOUBLE)
       |      < 2147483648.0 * 16 / POWER(2.0, CEIL(LOG2(bn))))),
       |seedc AS (
       |  SELECT x.vec_id AS node, y.vec_id AS nbr_id
       |  FROM incap x JOIN incap y USING ($bucketKey)
       |  WHERE x.vec_id <> y.vec_id
       |  UNION ALL
       |  SELECT m.vec_id AS node, a.vec_id AS nbr_id
       |  FROM (SELECT bands.* FROM bands JOIN bstat USING ($bucketKey) WHERE bn > 64) m
       |  JOIN anch a USING ($bucketKey)
       |  WHERE m.vec_id <> a.vec_id
       |),
       |${topK("seedc", "e0")},
       |${und("e0", "u0")},
       |${capAdj("u0", "uc0")},
       |${refineCand("uc0", "e0", "c1")},
       |${topK("c1", "e1")},
       |${und("e1", "u1")},
       |${capAdj("u1", "uc1")},
       |${refineCand("uc1", "e1", "c2")},
       |${topK("c2", "e2")},
       |${und("e2", "g")}""".stripMargin
  }

  /** The beam grow step over the symmetrized graph `g`. */
  private def navGrow(s: String, out: String): String =
    s"""$out AS (
       |  SELECT qid, node FROM $s
       |  UNION
       |  SELECT $s.qid, g.nbr_id AS node FROM $s JOIN g USING (node)
       |)""".stripMargin

  /** Driver-scale hop count / flat beam width — the ladder values at
    * every gated SF (n ≤ 2048), so the unrolled walk oracles stay
    * bit-aligned with the Spark ladders (round 17: hops 3 → 5 and
    * flat width 16 → 48 close the 24/30 driver-scale recall floor). */
  private val NavH = graft.ops.Similarity.navHopsFor(1)
  private val NavW = graft.ops.Similarity.navBeamFor(1)

  private def navSearchSql(sharded: Boolean): String = {
    // beam ranking: per query globally, or per (query, shard); the
    // sharded beam keeps per-shard width 16 (4 shards ≈ 64 global)
    val beamPart = if (sharded) "c.qid, c.node % 4" else "c.qid"
    val width = if (sharded) 16 else NavW
    def stage(in: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, node, cos, rn FROM (
         |    SELECT c.qid, c.node,
         |           ROUND(${navDotAb("q.qe", "e.embedding")} / (q.qn * e.nrm), 6) AS cos,
         |           ROW_NUMBER() OVER (PARTITION BY $beamPart
         |             ORDER BY ROUND(${navDotAb("q.qe", "e.embedding")} / (q.qn * e.nrm), 6) DESC, c.node) AS rn
         |    FROM (SELECT DISTINCT qid, node FROM $in) c
         |    JOIN vn e ON c.node = e.vec_id
         |    JOIN q ON c.qid = q.qid
         |    WHERE c.node <> c.qid)
         |  WHERE rn <= $width
         |)""".stripMargin
    val ent =
      if (sharded)
        """ent AS (SELECT vec_id AS node FROM (
          |  SELECT vec_id, ROW_NUMBER() OVER (PARTITION BY vec_id % 4 ORDER BY vec_id) AS rs
          |  FROM embeddings) WHERE rs <= 16)""".stripMargin
      else
        "ent AS (SELECT vec_id AS node FROM embeddings ORDER BY vec_id LIMIT 16)"
    // gather: sharded merges the per-shard beams by a global re-rank
    val sN = s"s$NavH"
    val finalSel =
      if (sharded)
        s"""SELECT qid AS vec_id, node AS nbr_id, cos, CAST(rg AS BIGINT) AS rank FROM (
          |  SELECT qid, node, cos,
          |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, node) AS rg
          |  FROM $sN) WHERE rg <= 3 ORDER BY vec_id, rank""".stripMargin
      else
        s"""SELECT qid AS vec_id, node AS nbr_id, cos, CAST(rn AS BIGINT) AS rank
          |FROM $sN WHERE rn <= 3 ORDER BY vec_id, rank""".stripMargin
    val hopCtes = (1 to NavH).map(h =>
      s"""${navGrow(s"s${h - 1}", s"b$h")},
         |${stage(s"b$h", s"s$h")}""".stripMargin).mkString(",\n")
    s"""WITH ${navBuildCtes(sharded)},
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM vn WHERE vec_id < 10
       |),
       |$ent,
       |b0 AS (SELECT qid, node FROM q CROSS JOIN ent),
       |${stage("b0", "s0")},
       |$hopCtes
       |$finalSel""".stripMargin
  }

  val simGraphSearch: String = navSearchSql(sharded = false)

  /** Mirrors `Similarity.shardedSearch`: the same generator with the
    * shard in the bucket key, per-(query, shard) beam ranking, and a
    * global top-3 gather. */
  val simShardedSearch: String = navSearchSql(sharded = true)

  /** Mirrors `Similarity.pqSearch`: the navigable-graph build + the
    * shared PQ training chain; beam stages rank by the precomputed
    * ADC table (`ad` holds every (query, node) code-lookup sum — the
    * oracle is a reference implementation, so the full linear table
    * is fine where Spark scores only beam candidates; values are
    * identical), final stage exact-cosine-reranks the beam. */
  val simPqSearch: String = {
    val w = graft.ops.Similarity.PqBeamWidth
    def stageAdc(in: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, node FROM (
         |    SELECT c.qid, c.node,
         |           ROW_NUMBER() OVER (PARTITION BY c.qid ORDER BY ad.adist, c.node) AS rn
         |    FROM (SELECT DISTINCT qid, node FROM $in) c
         |    JOIN ad ON ad.qid = c.qid AND ad.node = c.node)
         |  WHERE rn <= $w
         |)""".stripMargin
    val cosSel = s"ROUND(${navDotAb("q.qe", "e.embedding")} / (q.qn * e.nrm), 6)"
    s"""WITH ${navBuildCtes(sharded = false)},
       |${pqChain(2, 16)},
       |qpe AS (SELECT vec_id AS qid, sub, pos, x AS qx FROM pe WHERE vec_id < 10),
       |dt AS (
       |  SELECT q2.qid, c.sub, c.cid, ROUND(SUM((q2.qx - c.cx) * (q2.qx - c.cx)), 6) AS d
       |  FROM qpe q2 JOIN pc2 c ON c.sub = q2.sub AND c.pos = q2.pos
       |  GROUP BY 1, 2, 3
       |),
       |ad AS MATERIALIZED (
       |  SELECT dt.qid, a.vec_id AS node,
       |         CAST(SUM(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adist
       |  FROM pa3 a JOIN dt ON dt.sub = a.sub AND dt.cid = a.cid
       |  WHERE dt.qid <> a.vec_id
       |  GROUP BY 1, 2
       |),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM vn WHERE vec_id < 10
       |),
       |ent AS (SELECT vec_id AS node FROM embeddings ORDER BY vec_id LIMIT 16),
       |b0 AS (SELECT qid, node FROM q CROSS JOIN ent),
       |${stageAdc("b0", "s0")},
       |${(1 to NavH).map(h =>
            s"${navGrow(s"s${h - 1}", s"b$h")},\n${stageAdc(s"b$h", s"s$h")}")
          .mkString(",\n")}
       |SELECT qid AS vec_id, node AS nbr_id, cos, CAST(rg AS BIGINT) AS rank FROM (
       |  SELECT s$NavH.qid, s$NavH.node, $cosSel AS cos,
       |         ROW_NUMBER() OVER (PARTITION BY s$NavH.qid ORDER BY $cosSel DESC, s$NavH.node) AS rg
       |  FROM s$NavH JOIN vn e ON s$NavH.node = e.vec_id JOIN q ON s$NavH.qid = q.qid)
       |WHERE rg <= 3 ORDER BY vec_id, rank""".stripMargin
  }

  /** Mirrors `Similarity.filteredPqSearch` — the Filtered-DiskANN
    * composition: the ADC walk with eligible-only beam membership,
    * eligible entries, and bridged (neighbors-of-neighbors)
    * expansion; exact-cosine rerank of the (eligible) final beam. */
  val simFilteredPq: String = {
    val w = graft.ops.Similarity.PqBeamWidth
    def stageAdc(in: String, out: String): String =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, node FROM (
         |    SELECT c.qid, c.node,
         |           ROW_NUMBER() OVER (PARTITION BY c.qid ORDER BY ad.adist, c.node) AS rn
         |    FROM (SELECT DISTINCT qid, node FROM $in) c
         |    JOIN elig ON elig.node = c.node
         |    JOIN ad ON ad.qid = c.qid AND ad.node = c.node)
         |  WHERE rn <= $w
         |)""".stripMargin
    def growB(s: String, out: String): String =
      s"""$out AS (
         |  SELECT qid, node FROM $s
         |  UNION
         |  SELECT $s.qid, g.nbr_id AS node FROM $s JOIN g USING (node)
         |  UNION
         |  SELECT $s.qid, g2.nbr_id AS node FROM $s
         |  JOIN g ON g.node = $s.node JOIN g g2 ON g2.node = g.nbr_id
         |)""".stripMargin
    val cosSel = s"ROUND(${navDotAb("q.qe", "e.embedding")} / (q.qn * e.nrm), 6)"
    s"""WITH ${navBuildCtes(sharded = false)},
       |${pqChain(2, 16)},
       |qpe AS (SELECT vec_id AS qid, sub, pos, x AS qx FROM pe WHERE vec_id < 10),
       |dt AS (
       |  SELECT q2.qid, c.sub, c.cid, ROUND(SUM((q2.qx - c.cx) * (q2.qx - c.cx)), 6) AS d
       |  FROM qpe q2 JOIN pc2 c ON c.sub = q2.sub AND c.pos = q2.pos
       |  GROUP BY 1, 2, 3
       |),
       |ad AS MATERIALIZED (
       |  SELECT dt.qid, a.vec_id AS node,
       |         CAST(SUM(CAST(dt.d AS DECIMAL(18,6))) AS DOUBLE) AS adist
       |  FROM pa3 a JOIN dt ON dt.sub = a.sub AND dt.cid = a.cid
       |  WHERE dt.qid <> a.vec_id
       |  GROUP BY 1, 2
       |),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM vn WHERE vec_id < 10
       |),
       |$filteredEligCte,
       |ent AS (SELECT node FROM elig ORDER BY node LIMIT 16),
       |b0 AS (SELECT qid, node FROM q CROSS JOIN ent),
       |${stageAdc("b0", "s0")},
       |${(1 to NavH).map(h =>
            s"${growB(s"s${h - 1}", s"b$h")},\n${stageAdc(s"b$h", s"s$h")}")
          .mkString(",\n")}
       |SELECT qid AS vec_id, node AS nbr_id, cos, CAST(rg AS BIGINT) AS rank FROM (
       |  SELECT s$NavH.qid, s$NavH.node, $cosSel AS cos,
       |         ROW_NUMBER() OVER (PARTITION BY s$NavH.qid ORDER BY $cosSel DESC, s$NavH.node) AS rg
       |  FROM s$NavH JOIN vn e ON s$NavH.node = e.vec_id JOIN q ON s$NavH.qid = q.qid)
       |WHERE rg <= 3 ORDER BY vec_id, rank""".stripMargin
  }

  /** Graph-search recall audit: the beam walk's top-3 LEFT-joined
    * against the exact top-3 (both full oracle queries nested as CTE
    * bodies — the `simRecall` shape over the navigable graph). */
  val simGraphRecall: String =
    s"""WITH g AS ($simGraphSearch),
       |bf AS ($simTopK)
       |SELECT g.vec_id, g.nbr_id,
       |       bf.rank IS NOT NULL AS in_top3,
       |       bf.rank AS true_rank
       |FROM g LEFT JOIN bf USING (vec_id, nbr_id)
       |ORDER BY g.vec_id, g.nbr_id""".stripMargin

  /** Graded nDCG@3 / MRR audit mirroring `Similarity.searchNdcg`:
    * relevance 4−true_rank, fixed three-term DCG with pinned 6-dp
    * log2 discounts, ideal DCG constant 4.76186. */
  val simSearchNdcg: String =
    s"""WITH g AS ($simGraphSearch),
       |bf AS ($simTopK),
       |j AS (
       |  SELECT g.vec_id, g.rank AS wr,
       |         CASE WHEN bf.rank IS NOT NULL THEN 4 - bf.rank ELSE 0 END AS rel
       |  FROM g LEFT JOIN bf USING (vec_id, nbr_id)
       |),
       |p AS (
       |  SELECT vec_id,
       |         MAX(CASE WHEN wr = 1 THEN rel ELSE 0 END) AS r1,
       |         MAX(CASE WHEN wr = 2 THEN rel ELSE 0 END) AS r2,
       |         MAX(CASE WHEN wr = 3 THEN rel ELSE 0 END) AS r3,
       |         MIN(CASE WHEN rel > 0 THEN wr END) AS fh,
       |         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |  FROM j GROUP BY vec_id
       |)
       |SELECT vec_id,
       |       ROUND(r1 * 1.0 + r2 * 0.630930 + r3 * 0.5, 6) AS dcg,
       |       ROUND((r1 * 1.0 + r2 * 0.630930 + r3 * 0.5) / 4.76186, 6) AS ndcg,
       |       ROUND(CASE WHEN fh IS NULL THEN 0.0 ELSE 1.0 / fh END, 6) AS rr,
       |       n_hits
       |FROM p ORDER BY vec_id""".stripMargin

  /** Eligible-corpus CTE for the filtered-ANN family: embeddings
    * row-aligned to documents (vec_id = doc_id), language filter. */
  private def filteredEligCte: String =
    s"""elig AS MATERIALIZED (
       |  SELECT e.vec_id AS node FROM embeddings e
       |  JOIN documents d ON d.doc_id = e.vec_id
       |  WHERE d.lang = '${graft.ops.Similarity.FilteredLang}'
       |)""".stripMargin

  /** Mirrors `Similarity.filteredSearch`: both filtered-ANN
    * strategies over the same navigable graph — `overfetch` (48-wide
    * unfiltered walk, filter once at the end) and `inwalk` (ACORN-1:
    * eligible-only beam, expansion through neighbors AND
    * neighbors-of-neighbors so ineligible nodes bridge routing). */
  val simFilteredSearch: String = {
    val W = graft.ops.Similarity.FilteredOverfetch
    val cosSel = s"ROUND(${navDotAb("q.qe", "e.embedding")} / (q.qn * e.nrm), 6)"
    // beam stage: rank candidates by cosine; optionally restrict beam
    // MEMBERSHIP to the eligible set (expansion is never restricted)
    def stage(in: String, out: String, width: Int, eligOnly: Boolean): String =
      s"""$out AS MATERIALIZED (
         |  SELECT qid, node, cos, rn FROM (
         |    SELECT c.qid, c.node,
         |           $cosSel AS cos,
         |           ROW_NUMBER() OVER (PARTITION BY c.qid
         |             ORDER BY $cosSel DESC, c.node) AS rn
         |    FROM (SELECT DISTINCT qid, node FROM $in) c
         |    ${if (eligOnly) "JOIN elig ON elig.node = c.node" else ""}
         |    JOIN vn e ON c.node = e.vec_id
         |    JOIN q ON c.qid = q.qid
         |    WHERE c.node <> c.qid)
         |  WHERE rn <= $width
         |)""".stripMargin
    def grow(s: String, out: String, bridge: Boolean): String =
      s"""$out AS (
         |  SELECT qid, node FROM $s
         |  UNION
         |  SELECT $s.qid, g.nbr_id AS node FROM $s JOIN g USING (node)
         |  ${if (bridge)
             s"UNION SELECT $s.qid, g2.nbr_id AS node FROM $s " +
               s"JOIN g ON g.node = $s.node JOIN g g2 ON g2.node = g.nbr_id"
           else ""}
         |)""".stripMargin
    s"""WITH ${navBuildCtes(sharded = false)},
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM vn WHERE vec_id < 10
       |),
       |$filteredEligCte,
       |ento AS (SELECT vec_id AS node FROM embeddings ORDER BY vec_id LIMIT 16),
       |b0o AS (SELECT qid, node FROM q CROSS JOIN ento),
       |${stage("b0o", "s0o", W, eligOnly = false)},
       |${(1 to NavH).map(h =>
            s"${grow(s"s${h - 1}o", s"b${h}o", bridge = false)},\n" +
              stage(s"b${h}o", s"s${h}o", W, eligOnly = false)).mkString(",\n")},
       |ovf AS (
       |  SELECT 'overfetch' AS strategy, qid, node, cos, rg AS rank FROM (
       |    SELECT s.qid, s.node, s.cos,
       |           ROW_NUMBER() OVER (PARTITION BY s.qid
       |             ORDER BY s.cos DESC, s.node) AS rg
       |    FROM s${NavH}o s JOIN elig USING (node))
       |  WHERE rg <= 3
       |),
       |enti AS (SELECT node FROM elig ORDER BY node LIMIT 16),
       |b0i AS (SELECT qid, node FROM q CROSS JOIN enti),
       |${stage("b0i", "s0i", 16, eligOnly = true)},
       |${(1 to NavH).map(h =>
            s"${grow(s"s${h - 1}i", s"b${h}i", bridge = true)},\n" +
              stage(s"b${h}i", s"s${h}i", 16, eligOnly = true)).mkString(",\n")},
       |inw AS (
       |  SELECT 'inwalk' AS strategy, qid, node, cos, rn AS rank
       |  FROM s${NavH}i WHERE rn <= 3
       |),
       |hv AS (
       |  SELECT 'harvest' AS strategy, qid, node, cos, rh AS rank FROM (
       |    SELECT h.qid, h.node, h.cos,
       |           ROW_NUMBER() OVER (PARTITION BY h.qid
       |             ORDER BY h.cos DESC, h.node) AS rh
       |    FROM (SELECT DISTINCT qid, node, cos FROM (
       |            ${(0 to NavH).map(h =>
                       s"SELECT qid, node, cos FROM s${h}o JOIN elig USING (node)")
                     .mkString("\n            UNION ALL ")})) h)
       |  WHERE rh <= 3
       |)
       |SELECT strategy, qid AS vec_id, node AS nbr_id, cos,
       |       CAST(rank AS BIGINT) AS rank
       |FROM (SELECT * FROM ovf UNION ALL SELECT * FROM inw
       |      UNION ALL SELECT * FROM hv)
       |ORDER BY strategy, vec_id, rank""".stripMargin
  }

  /** Mirrors `Similarity.filteredSearchAuto`: the default filtered
    * search — the strategy picked by the measurable rule
    * (overfetchWidth · |elig| ≥ 3 · n → harvest, else inwalk; the
    * width is the driver-scale constant 48 here, like every other
    * walk constant the oracle pins). */
  val simFilteredAuto: String = {
    val W = graft.ops.Similarity.FilteredOverfetch
    // driver-scale exact-tier budget: overfetch width × hop count
    // (Similarity.exactFilterMaxFor at n ≤ 2048)
    val X = graft.ops.Similarity.exactFilterMaxFor(1)
    val dotSelf =
      "list_sum(list_transform(range(1, len(embedding) + 1), " +
        "i -> embedding[CAST(i AS INT)]::DOUBLE * embedding[CAST(i AS INT)]::DOUBLE))"
    s"""WITH f AS ($simFilteredSearch),
       |xvn AS (SELECT vec_id, embedding, SQRT($dotSelf) AS nrm FROM embeddings),
       |xelig AS (
       |  SELECT e.vec_id AS node FROM embeddings e
       |  JOIN documents d ON d.doc_id = e.vec_id
       |  WHERE d.lang = '${graft.ops.Similarity.FilteredLang}'
       |),
       |x AS (
       |  SELECT qid AS vec_id, node AS nbr_id, cos, CAST(rg AS BIGINT) AS rank FROM (
       |    SELECT q.qid, e.vec_id AS node,
       |           ROUND(${navDotAb("q.qe", "e.embedding")} / (q.qn * e.nrm), 6) AS cos,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid
       |             ORDER BY ROUND(${navDotAb("q.qe", "e.embedding")} / (q.qn * e.nrm), 6) DESC,
       |                      e.vec_id) AS rg
       |    FROM (SELECT vec_id AS qid, embedding AS qe, nrm AS qn
       |          FROM xvn WHERE vec_id < 10) q
       |    JOIN xvn e ON e.vec_id <> q.qid
       |    JOIN xelig ON xelig.node = e.vec_id)
       |  WHERE rg <= 3
       |),
       |pick AS (
       |  SELECT CASE
       |    WHEN (SELECT COUNT(*) FROM xelig) <= $X THEN 'exact'
       |    WHEN $W * (SELECT COUNT(*) FROM xelig)
       |           >= 3 * (SELECT COUNT(*) FROM embeddings) THEN 'harvest'
       |    ELSE 'inwalk' END AS s
       |)
       |SELECT vec_id, nbr_id, cos, rank
       |FROM f JOIN pick ON f.strategy = pick.s
       |UNION ALL
       |SELECT x.vec_id, x.nbr_id, x.cos, x.rank
       |FROM x JOIN pick ON pick.s = 'exact'
       |ORDER BY vec_id, rank""".stripMargin
  }

  /** Filtered-recall audit: every strategy LEFT-joined against the
    * exact filtered brute-force top-3 — mirrors
    * `Similarity.filteredRecall`. */
  val simFilteredRecall: String = {
    val dotSelf =
      "list_sum(list_transform(range(1, len(embedding) + 1), " +
        "i -> embedding[CAST(i AS INT)]::DOUBLE * embedding[CAST(i AS INT)]::DOUBLE))"
    val cosSel = s"ROUND(${navDotAb("q.qe", "e.embedding")} / (q.qn * e.nrm), 6)"
    s"""WITH f AS ($simFilteredSearch),
       |bf AS (
       |  WITH vn AS (SELECT vec_id, embedding, SQRT($dotSelf) AS nrm FROM embeddings),
       |  $filteredEligCte,
       |  q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM vn WHERE vec_id < 10)
       |  SELECT qid AS vec_id, node AS nbr_id, rg AS rank FROM (
       |    SELECT q.qid, e.vec_id AS node,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid
       |             ORDER BY $cosSel DESC, e.vec_id) AS rg
       |    FROM q JOIN vn e ON e.vec_id <> q.qid
       |    JOIN elig ON elig.node = e.vec_id)
       |  WHERE rg <= 3
       |)
       |SELECT f.strategy, f.vec_id, f.nbr_id,
       |       bf.rank IS NOT NULL AS in_top3,
       |       bf.rank AS true_rank
       |FROM f LEFT JOIN bf USING (vec_id, nbr_id)
       |ORDER BY f.strategy, f.vec_id, f.nbr_id""".stripMargin
  }

  /** Leave-one-out kNN majority-vote accuracy per label over the
    * shared kNN-graph edge set — mirroring `Similarity.knnClassify`. */
  val simKnnClassify: String =
    s"""WITH $knnGraphCtes,
       |g AS (SELECT vec_id, nbr_id FROM r WHERE rnk <= 3),
       |nb AS (
       |  SELECT g.vec_id, CAST(e.label AS BIGINT) AS nbr_label,
       |         CAST(COUNT(*) AS BIGINT) AS votes
       |  FROM g JOIN embeddings e ON g.nbr_id = e.vec_id
       |  GROUP BY 1, 2
       |),
       |pred AS (
       |  SELECT vec_id, nbr_label AS pred
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                    ORDER BY votes DESC, nbr_label) AS rn FROM nb)
       |  WHERE rn = 1
       |)
       |SELECT CAST(e.label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       |       CAST(SUM(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) AS BIGINT) AS correct,
       |       ROUND(CAST(SUM(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) AS DOUBLE)
       |             / COUNT(*), 6) AS acc
       |FROM pred p JOIN embeddings e USING (vec_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** 2-core of the mutual kNN graph: the same reciprocal-edge
    * derivation and five unrolled peeling rounds as
    * `Similarity.kcore`. */
  val simKcore: String = {
    // every round CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    // an unrolled peeling chain whose each level references the
    // previous one several times would otherwise expand exponentially
    // (observed as thousands of parquet re-opens)
    val rounds = (1 to 5).map { i =>
      s"""dg$i AS MATERIALIZED (
         |  SELECT v, COUNT(*) AS d
         |  FROM (SELECT a AS v FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
         |  GROUP BY 1
         |),
         |kp$i AS MATERIALIZED (SELECT v FROM dg$i WHERE d >= 2),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN kp$i ka ON ka.v = e.a JOIN kp$i kb ON kb.v = e.b
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $knnGraphCtes,
       |g AS MATERIALIZED (SELECT vec_id, nbr_id FROM r WHERE rnk <= 3),
       |e0 AS MATERIALIZED (
       |  SELECT g1.vec_id AS a, g1.nbr_id AS b
       |  FROM g g1 JOIN g g2
       |    ON g2.vec_id = g1.nbr_id AND g2.nbr_id = g1.vec_id
       |  WHERE g1.vec_id < g1.nbr_id
       |),
       |$rounds
       |SELECT v AS vec_id, CAST(COUNT(*) AS BIGINT) AS deg
       |FROM (SELECT a AS v FROM e5 UNION ALL SELECT b FROM e5)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** PageRank over the kNN graph: five unrolled synchronous damped
    * iterations with the dangling-mass term, the identical arithmetic
    * shape as the Spark loop (0.15/N + 0.85*(contrib + dmass/N)). */
  val simPagerank: String = {
    def iter(k: Int): String =
      s"""r$k AS (
         |  SELECT e.vec_id,
         |         0.15 / n.n_nodes + 0.85 * (COALESCE(c.contrib, 0.0) + d.dmass / n.n_nodes) AS r
         |  FROM (SELECT vec_id FROM embeddings) e
         |  CROSS JOIN n
         |  CROSS JOIN (SELECT COALESCE(SUM(p.r), 0.0) AS dmass
         |              FROM r${k - 1} p LEFT JOIN deg USING (vec_id)
         |              WHERE deg.deg IS NULL) d
         |  LEFT JOIN (SELECT edges.nbr_id AS vid, SUM(p.r / deg.deg) AS contrib
         |             FROM edges JOIN r${k - 1} p USING (vec_id) JOIN deg USING (vec_id)
         |             GROUP BY 1) c
         |    ON e.vec_id = c.vid
         |)""".stripMargin
    val iters = (1 to 5).map(iter).mkString(",\n")
    s"""WITH $knnGraphCtes,
       |edges AS (SELECT vec_id, nbr_id FROM r WHERE rnk <= 3),
       |deg AS (SELECT vec_id, COUNT(*) AS deg FROM edges GROUP BY 1),
       |n AS (SELECT COUNT(*)::DOUBLE AS n_nodes FROM embeddings),
       |r0 AS (SELECT vec_id, 1.0 / n.n_nodes AS r FROM embeddings CROSS JOIN n),
       |$iters
       |SELECT vec_id, ROUND(r, 6) AS pagerank FROM r5 ORDER BY vec_id""".stripMargin
  }

  /** Triangle counts: canonical a<b edges, two edge-keyed joins
    * enumerate each triangle once as a<b<c. */
  val simTriangles: String =
    s"""WITH $knnGraphCtes,
       |edges AS (SELECT vec_id, nbr_id FROM r WHERE rnk <= 3),
       |e AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS a,
       |             GREATEST(vec_id, nbr_id) AS b FROM edges),
       |tri AS (
       |  SELECT ab.a, ab.b, bc.c
       |  FROM e ab
       |  JOIN (SELECT a AS b, b AS c FROM e) bc ON ab.b = bc.b
       |  JOIN (SELECT a, b AS c FROM e) ac ON ab.a = ac.a AND bc.c = ac.c
       |),
       |x AS (SELECT UNNEST([a, b, c]) AS vec_id FROM tri)
       |SELECT vec_id, COUNT(*) AS n_triangles
       |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  /** Random-projection audit: identical ±1 hyperplanes derived from
    * md5(j ++ '_' ++ i) in both engines, true top-3 neighbors ranked
    * on the 64-dim cosine, projected-space cosine + error alongside. */
  val simRpAudit: String = {
    val proj =
      """list_transform(range(0, 16), j -> list_sum(list_transform(range(1, 65),
        |      i -> embedding[CAST(i AS INT)]::DOUBLE *
        |           CASE WHEN substr(md5(concat(j, '_', i)), 1, 1) < '8'
        |                THEN 1.0 ELSE -1.0 END)))""".stripMargin
    s"""WITH pv AS (
       |  SELECT vec_id, embedding,
       |    $proj AS p
       |  FROM embeddings
       |),
       |pairs AS (
       |  SELECT q.vec_id, c.vec_id AS nbr_id,
       |         ROUND(${cosSql("q.embedding", "c.embedding")}, 6) AS cos64,
       |         ROUND(${cosSql("q.p", "c.p")}, 6) AS cos16
       |  FROM pv q JOIN pv c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
       |),
       |r AS (
       |  SELECT vec_id, nbr_id, cos64, cos16,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos64 DESC, nbr_id) AS rnk
       |  FROM pairs
       |)
       |SELECT vec_id, nbr_id, CAST(rnk AS BIGINT) AS rank, cos64, cos16,
       |       ROUND(ABS(cos64 - cos16), 6) AS err
       |FROM r WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin
  }

  /** IVF probe: top-2 nearest centroids by 6-dp cosine (label
    * tiebreak), then exact top-3 over the probed cells' union (cells
    * are disjoint, so no dedup); `cell` is the neighbor's cell. */
  val simIvf: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
       |         UNNEST(embedding)::DOUBLE AS x
       |  FROM embeddings
       |),
       |c AS (SELECT label, pos, AVG(x) AS cx FROM e GROUP BY label, pos),
       |qd AS (
       |  SELECT e.vec_id, c.label,
       |         SUM(e.x * c.cx) AS dot, SUM(e.x * e.x) AS nv, SUM(c.cx * c.cx) AS nc
       |  FROM e JOIN c ON e.pos = c.pos
       |  WHERE e.vec_id < 10
       |  GROUP BY e.vec_id, c.label
       |),
       |qa AS (SELECT vec_id, label, ROUND(dot / (sqrt(nv) * sqrt(nc)), 6) AS ccos FROM qd),
       |probe AS (
       |  SELECT vec_id, label AS cell FROM (
       |    SELECT vec_id, label,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, label) AS rn
       |    FROM qa) t
       |  WHERE rn <= 2
       |),
       |pairs AS (
       |  SELECT p.vec_id, p.cell, v.vec_id AS nbr_id,
       |         ROUND(${cosSql("q.embedding", "v.embedding")}, 6) AS cos
       |  FROM probe p
       |  JOIN embeddings q ON q.vec_id = p.vec_id
       |  JOIN embeddings v ON v.label = p.cell AND v.vec_id <> p.vec_id
       |),
       |r AS (
       |  SELECT vec_id, cell, nbr_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr_id) AS rnk
       |  FROM pairs
       |)
       |SELECT vec_id, cell, nbr_id, cos, CAST(rnk AS BIGINT) AS rank
       |FROM r WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin

  val tsGotkBySegment: String =
    """WITH daily AS (
      |  SELECT c_mktsegment AS name, CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |),
      |p AS (
      |  SELECT name, date,
      |         (tvl - LAG(tvl) OVER (PARTITION BY name ORDER BY date))
      |           / LAG(tvl) OVER (PARTITION BY name ORDER BY date) AS pct
      |  FROM daily
      |)
      |SELECT name, date,
      |       ROUND(EXP(SUM(LN(1.0 + COALESCE(pct, 0.0))) OVER
      |         (PARTITION BY name ORDER BY date
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0, 2)
      |         AS end_day_investment,
      |       ROUND(pct, 6) AS percent_change
      |FROM p ORDER BY name, date""".stripMargin

  /** EWMA (half-life 15 d / 30-day lookback), offset-join form:
    * weights renormalized over present days; 2 dp for cross-engine
    * float-sum association. */
  val tsEwma: String =
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders GROUP BY 1
      |),
      |pr AS (
      |  SELECT d.date, r.k, d.date - CAST(r.k AS INTEGER) AS b_date
      |  FROM d, range(0, 30) r(k)
      |),
      |j AS (
      |  SELECT pr.date, POW(0.5, pr.k::DOUBLE / 15.0) AS w, b.tvl
      |  FROM pr JOIN d b ON b.date = pr.b_date
      |)
      |SELECT date, ROUND(SUM(tvl * w) / SUM(w), 2) AS ewma15,
      |       CAST(COUNT(*) AS BIGINT) AS n_obs
      |FROM j GROUP BY date ORDER BY date""".stripMargin

  val tsEwmaBySegment: String =
    s"""WITH $dailyBySegmentPct,
      |pr AS (
      |  SELECT name, date, r.k, date - CAST(r.k AS INTEGER) AS b_date
      |  FROM daily, range(0, 30) r(k)
      |),
      |j AS (
      |  SELECT pr.name, pr.date, POW(0.5, pr.k::DOUBLE / 15.0) AS w, b.tvl
      |  FROM pr JOIN daily b ON b.name = pr.name AND b.date = pr.b_date
      |)
      |SELECT name, date, ROUND(SUM(tvl * w) / SUM(w), 2) AS ewma15,
      |       CAST(COUNT(*) AS BIGINT) AS n_obs
      |FROM j GROUP BY name, date ORDER BY name, date""".stripMargin

  /** Single-pass profiling aggregate; mean = exact decimal sum /
    * count, divided once. */
  /** Fixed-width histogram: bucket boundary is one IEEE division +
    * floor, identical across engines. */
  val relHistogram: String =
    """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val relProfile: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
      |       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
      |       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_prices,
      |       MIN(CAST(o_orderdate AS DATE)) AS min_date,
      |       MAX(CAST(o_orderdate AS DATE)) AS max_date,
      |       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_price
      |FROM orders""".stripMargin

  val tsMovingAvg: String =
    s"""WITH $dailyOrders
       |SELECT date, tvl,
       |       ROUND(AVG(tvl) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7,
       |       MAX(tvl) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS max7
       |FROM daily ORDER BY date""".stripMargin

  /** Multi-series rolling z-score: `tsAnomaly` per market segment. */
  val tsAnomalyBySegment: String =
    """WITH daily AS (
      |  SELECT c_mktsegment AS name, CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |),
      |w AS (
      |  SELECT name, date, tvl,
      |         COUNT(*)         OVER win AS n30,
      |         AVG(tvl)         OVER win AS mu,
      |         STDDEV_SAMP(tvl) OVER win AS sd
      |  FROM daily
      |  WINDOW win AS (PARTITION BY name ORDER BY date
      |                 ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
      |),
      |z AS (
      |  SELECT name, date, tvl,
      |         CASE WHEN n30 = 30 THEN ROUND((tvl - mu) / NULLIF(sd, 0), 6) END AS z
      |  FROM w
      |)
      |SELECT name, date, tvl, z, COALESCE(ABS(z) > 2, false) AS is_anomaly
      |FROM z ORDER BY name, date""".stripMargin

  /** Lag-k Pearson autocorrelation over the overlap rows, k=1/7/30. */
  val tsAutocorr: String = {
    def one(k: Int) =
      s"""SELECT CAST($k AS BIGINT) AS lag, ROUND(CORR(tvl, l), 6) AS acf, COUNT(*) AS n
         |FROM (SELECT tvl, LAG(tvl, $k) OVER (ORDER BY date) AS l FROM daily) t$k
         |WHERE l IS NOT NULL""".stripMargin
    s"""WITH $dailyOrders
       |${one(1)}
       |UNION ALL ${one(7)}
       |UNION ALL ${one(30)}
       |ORDER BY lag""".stripMargin
  }

  /** Day-of-week seasonal profile: ISO dow (0=Monday, `isodow - 1`),
    * exact decimal-sum means, index vs overall mean. */
  val tsSeasonality: String =
    s"""WITH $dailyOrders,
       |o AS (
       |  SELECT CAST(SUM(CAST(tvl AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS overall_mean
       |  FROM daily
       |),
       |g AS (
       |  SELECT CAST(isodow(date) - 1 AS BIGINT) AS dow, COUNT(*) AS n_days,
       |         CAST(SUM(CAST(tvl AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS m
       |  FROM daily GROUP BY 1
       |)
       |SELECT dow, n_days, ROUND(m, 2) AS mean_tvl,
       |       ROUND(m / overall_mean, 6) AS seasonal_index
       |FROM g CROSS JOIN o ORDER BY dow""".stripMargin

  /** Rolling z-score vs the 30 PRECEDING days (current excluded), full
    * 30-obs gate; the anomaly flag derives from the ROUNDED z so the
    * |z| > 2 boundary is engine-deterministic. */
  val tsAnomaly: String =
    s"""WITH $dailyOrders,
       |w AS (
       |  SELECT date, tvl,
       |         COUNT(*)     OVER win AS n30,
       |         AVG(tvl)     OVER win AS mu,
       |         STDDEV_SAMP(tvl) OVER win AS sd
       |  FROM daily
       |  WINDOW win AS (ORDER BY date ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
       |),
       |z AS (
       |  SELECT date, tvl,
       |         CASE WHEN n30 = 30 THEN ROUND((tvl - mu) / NULLIF(sd, 0), 6) END AS z
       |  FROM w
       |)
       |SELECT date, tvl, z, COALESCE(ABS(z) > 2, false) AS is_anomaly
       |FROM z ORDER BY date""".stripMargin

  val tsBenchmark: String =
    """WITH bd AS (
      |  SELECT CAST(l_shipdate AS DATE) AS date,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bench
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT date,
      |       ROUND(10000.0 * bench / FIRST_VALUE(bench) OVER
      |         (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS benchmark
      |FROM bd ORDER BY date""".stripMargin

  val datamartSummary: String =
    """WITH l AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders
      |),
      |a AS (
      |  SELECT o_custkey,
      |    MAX(CASE WHEN rn = 1 THEN CAST(o_orderdate AS DATE) END) AS latest_date,
      |    MAX(CASE WHEN rn = 1 THEN o_totalprice END) AS latest_value,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |    COUNT(*) AS n
      |  FROM l GROUP BY o_custkey
      |)
      |SELECT c_custkey AS strategy_id, c_name AS slug,
      |       latest_date, latest_value, revenue, n
      |FROM customer LEFT JOIN a ON o_custkey = c_custkey
      |ORDER BY strategy_id""".stripMargin

  // ---------------------------------------------------------- multimodal

  /** The byte-exact reconstruction of `Bmp.encodeGray`'s 8×8 24-bpp
    * output: 54-byte header (each field derived in the comments
    * below), then bottom-up rows of BGR triples — gray, so each pixel
    * hex pair appears 3×; stride 24 needs no padding. Spark md5s the
    * uppercase hex of the REAL payload; one flipped byte anywhere in
    * the encoder (or a row-order/stride/channel bug) breaks the md5
    * match. */
  val mmMeta: String = {
    // BITMAPFILEHEADER: 'BM', fileSize=246 (F6), reserved, dataOffset=54 (36)
    // BITMAPINFOHEADER: size=40 (28), w=8, h=8 (positive: bottom-up),
    // planes=1, bpp=24 (18), compression=0, imageSize=192 (C0), rest 0
    val headerHex =
      "424D" + "F6000000" + "00000000" + "36000000" +
        "28000000" + "08000000" + "08000000" + "0100" + "1800" +
        "00000000" + "C0000000" + "00" * 16
    // pixel data: rows bottom-up (y = 7..0), BGR = 3× the gray pair
    val pixHex = (7 to 0 by -1).flatMap(y => (0 until 8).map(x =>
      s"repeat(${mmPixHex(y * 8 + x)}, 3)")).mkString(" || ")
    s"""WITH $mmPixelCtes,
       |f AS (SELECT doc_id, upper('$headerHex' || $pixHex) AS file_hex FROM d)
       |SELECT doc_id,
       |       CAST(octet_length(from_hex(file_hex)) AS BIGINT) AS n_bytes,
       |       'BM' AS fmt,
       |       CAST(24 AS BIGINT) AS bpp,
       |       md5(file_hex) AS payload_md5
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Decode→NN-resize→re-encode roundtrip mirroring
    * `Multimodal.resize`: sampled pixels px(2y·8+2x), then the
    * byte-exact 4×4 24-bpp BMP (fileSize 102 = 0x66, stride 12, no
    * padding, bottom-up BGR) reconstructed hex-for-hex and md5'd. */
  val mmResize: String = {
    val headerHex =
      "424D" + "66000000" + "00000000" + "36000000" +
        "28000000" + "04000000" + "04000000" + "0100" + "1800" +
        "00000000" + "30000000" + "00" * 16
    val pixHex = (3 to 0 by -1).flatMap(y => (0 until 4).map(x =>
      s"repeat(${mmPixHex(16 * y + 2 * x)}, 3)")).mkString(" || ")
    val sampTot = (for (y <- 0 until 4; x <- 0 until 4)
      yield s"px${16 * y + 2 * x}").mkString(" + ")
    s"""WITH $mmPixelCtes,
       |f AS (SELECT doc_id, upper('$headerHex' || $pixHex) AS file_hex FROM d)
       |SELECT p.doc_id,
       |       CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
       |       CAST(3 * ($sampTot) AS BIGINT) AS sum_rgb,
       |       md5(f.file_hex) AS payload_md5
       |FROM p JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** NN-upscale roundtrip mirroring `Multimodal.resizeUp`: each
    * source pixel replicated 2×2, byte-exact 16×16 24-bpp BMP
    * (fileSize 822 = 0x336, stride 48, bottom-up BGR). */
  val mmResizeUp: String = {
    val headerHex =
      "424D" + "36030000" + "00000000" + "36000000" +
        "28000000" + "10000000" + "10000000" + "0100" + "1800" +
        "00000000" + "00030000" + "00" * 16
    // one variadic concat(), not a ||-chain: 256 nested || overflows
    // DuckDB's 128-deep binder recursion
    val pixHex = (15 to 0 by -1).flatMap(y => (0 until 16).map(x =>
      s"repeat(${mmPixHex((y / 2) * 8 + x / 2)}, 3)")).mkString(", ")
    val tot = (0 until 64).map(i => s"px$i").mkString(" + ")
    s"""WITH $mmPixelCtes,
       |f AS (SELECT doc_id, upper(concat('$headerHex', $pixHex)) AS file_hex FROM d)
       |SELECT p.doc_id,
       |       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       |       CAST(12 * ($tot) AS BIGINT) AS sum_rgb,
       |       md5(f.file_hex) AS payload_md5
       |FROM p JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Decoded-image stats: the oracle derives expected pixels straight
    * from the md5 chain; Spark must reproduce them by round-tripping
    * real BMP bytes through `javax.imageio`. Channel sums are 3× the
    * gray bytes; sums are exact integers, the mean divides once. */
  val mmDecode: String = {
    val tot = (0 until 64).map(i => s"px$i").mkString(" + ")
    s"""WITH $mmPixelCtes
       |SELECT doc_id,
       |       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       |       CAST(3 * ($tot) AS BIGINT) AS sum_rgb,
       |       ROUND(CAST(3 * ($tot) AS DOUBLE) / (3.0 * 8 * 8), 6) AS mean_rgb,
       |       CAST(3 * px0 AS BIGINT) AS px00_rgb
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Decoded-audio stats: expected samples derived straight from the
    * md5 chain — little-endian signed-16 reconstruction (byte 2i at
    * hex position 4i+1, byte 2i+1 at 4i+3; values ≥ 32768 wrap
    * negative). Spark must reproduce them by round-tripping real WAV
    * bytes through `javax.sound.sampled`. */
  private lazy val mmAudioChain: String = {
    val hx = (0 until 8).map(j => s"md5('a$j|' || text)").mkString(" || ")
    s"""a AS (SELECT doc_id, $hx AS hx FROM documents),
       |s AS (
       |  SELECT doc_id, list_transform(range(0, 64), i ->
       |    CAST('0x' || substr(hx, CAST(4 * i + 3 AS INT), 2) AS INT) * 256
       |    + CAST('0x' || substr(hx, CAST(4 * i + 1 AS INT), 2) AS INT)) AS raw
       |  FROM a
       |),
       |v AS (
       |  SELECT doc_id,
       |         list_transform(raw, x -> CASE WHEN x >= 32768 THEN x - 65536 ELSE x END) AS sm
       |  FROM s
       |)""".stripMargin
  }

  val mmAudio: String =
    s"""WITH $mmAudioChain
       |SELECT doc_id,
       |       CAST(64 AS INT) AS n_samples,
       |       CAST(${graft.ops.Wav.SampleRate} AS INT) AS sample_rate,
       |       CAST(list_sum(list_transform(sm, x -> abs(x))) AS BIGINT) AS sum_abs,
       |       CAST(list_max(list_transform(sm, x -> abs(x))) AS BIGINT) AS peak
       |FROM v ORDER BY doc_id""".stripMargin

  /** Audio features mirroring `Multimodal.audioFeatures`: exact
    * integer energy and zero-crossing count over the md5-derived
    * samples, one IEEE sqrt for the RMS (1-indexed DuckDB lists:
    * sm[i]·sm[i+1] for i = 1..63 are the adjacent pairs). */
  val mmAudioFeatures: String =
    s"""WITH $mmAudioChain
       |SELECT doc_id,
       |       CAST(list_sum(list_transform(sm, x -> x * x)) AS BIGINT) AS energy,
       |       CAST(list_sum(list_transform(range(1, 64), i ->
       |         CASE WHEN sm[CAST(i AS INT)] * sm[CAST(i + 1 AS INT)] < 0
       |              THEN 1 ELSE 0 END)) AS BIGINT) AS zcr,
       |       ROUND(sqrt(CAST(list_sum(list_transform(sm, x -> x * x)) AS DOUBLE)
       |                  / 64.0), 6) AS rms
       |FROM v ORDER BY doc_id""".stripMargin

  /** Sampled frames 0 and 2 of the 4-BMP container: frame f's 64 gray
    * pixels are the bytes of digests `f<f>|p<j>|text` (j = 0..3);
    * decoded channel sum = 3× the byte sum. */
  val mmFrames: String = {
    def frameSum(f: Int) =
      (0 until 4).map(j =>
        s"list_sum(list_transform(range(0, 16), k -> CAST('0x' || " +
          s"substr(md5('f$f|p$j|' || text), CAST(2 * k + 1 AS INT), 2) AS BIGINT)))")
        .mkString(" + ")
    s"""WITH f AS (
       |  SELECT doc_id, 0 AS frame_idx, 3 * (${frameSum(0)}) AS frame_sum FROM documents
       |  UNION ALL
       |  SELECT doc_id, 2, 3 * (${frameSum(2)}) FROM documents
       |)
       |SELECT doc_id, frame_idx, CAST(frame_sum AS BIGINT) AS frame_sum
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** Synchronous label propagation, 3 unrolled rounds, mirroring
    * `Similarity.labelProp`: undirected kNN edges, majority neighbor
    * label with (votes DESC, label ASC) tie-break each round. */
  val simLabelProp: String = {
    def iter(k: Int): String =
      s"""l$k AS (
         |  SELECT l.vec_id, COALESCE(w.lab, l.lab) AS lab
         |  FROM l${k - 1} l LEFT JOIN (
         |    SELECT v, lab FROM (
         |      SELECT u.v, p.lab,
         |             ROW_NUMBER() OVER (PARTITION BY u.v
         |               ORDER BY COUNT(*) DESC, p.lab) AS rn
         |      FROM u JOIN l${k - 1} p ON u.n = p.vec_id
         |      GROUP BY u.v, p.lab) x WHERE rn = 1) w
         |    ON w.v = l.vec_id
         |)""".stripMargin
    val iters = (1 to 3).map(iter).mkString(",\n")
    s"""WITH $knnGraphCtes,
       |edges0 AS (SELECT vec_id, nbr_id FROM r WHERE rnk <= 3),
       |e AS (SELECT DISTINCT LEAST(vec_id, nbr_id) AS a,
       |             GREATEST(vec_id, nbr_id) AS b FROM edges0),
       |u AS (SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e),
       |l0 AS (SELECT vec_id, vec_id AS lab FROM embeddings),
       |$iters
       |SELECT vec_id, lab AS community FROM l3 ORDER BY vec_id""".stripMargin
  }

  /** KMV distinct sketch vs exact, mirroring `Events.kmvDistinct`:
    * 52-bit md5 hashes, k-th smallest via row_number, integer-exact
    * until the single estimate division. */
  /** Mirrors `Events.approxSketches`: KMV k=128 distinct estimate
    * (exact below k) + fixed-resolution (2-dp bucket) median — both
    * deterministic functions of the data, so hash-exact across
    * engines. */
  val evApprox: String =
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT) AS h
      |  FROM events
      |),
      |r AS (
      |  SELECT event_type, h,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM h
      |),
      |k AS (
      |  SELECT event_type, MAX(CASE WHEN rn = 128 THEN h END) AS hk,
      |         COUNT(*) AS nd
      |  FROM r GROUP BY 1
      |),
      |u AS (
      |  SELECT event_type,
      |         CASE WHEN hk IS NOT NULL
      |              THEN ROUND(127.0 * CAST(4503599627370496 AS DOUBLE) / hk, 2)
      |              ELSE CAST(nd AS DOUBLE) END AS approx_users
      |  FROM k
      |),
      |b AS (
      |  SELECT event_type, ROUND(value, 2) AS v2, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2
      |),
      |cm AS (
      |  SELECT event_type, v2,
      |         SUM(c) OVER (PARTITION BY event_type ORDER BY v2
      |                      ROWS UNBOUNDED PRECEDING) AS cum,
      |         SUM(c) OVER (PARTITION BY event_type) AS n
      |  FROM b
      |),
      |m AS (
      |  SELECT event_type, MIN(v2) AS p50_value
      |  FROM cm WHERE cum >= FLOOR((n + 1) / 2.0) GROUP BY 1
      |)
      |SELECT u.event_type, u.approx_users, m.p50_value
      |FROM u JOIN m ON u.event_type = m.event_type
      |ORDER BY u.event_type""".stripMargin

  /** Mirrors `Events.hllSketches`: the DataSketches HLL estimate is
    * engine-internal, so the exported contract is exact ground truth
    * plus the two deterministic gates (merge law, 5% accuracy) that
    * the Spark side must prove by computing them — DuckDB asserts
    * their expected constant truth. */
  val evHll: String =
    """SELECT event_type,
      |       COUNT(DISTINCT user_id) AS exact_users,
      |       TRUE AS splits_agree_2pct,
      |       TRUE AS within_5pct
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Mirrors `Events.cmsUsers`: d=4 × w=512 count-min counters from
    * salted md5 buckets; estimate = min over row counters for the
    * exact top-10 users. */
  val evCms: String = {
    val buckets = (0 until 4).map(r =>
      s"CAST('0x' || substr(md5('cms$r|' || CAST(user_id AS VARCHAR)), 1, 14) AS BIGINT) % 512")
    val cellRows = (0 until 4).map(r =>
      s"SELECT user_id, $r AS r, ${buckets(r)} AS bkt FROM events").mkString("\n  UNION ALL ")
    s"""WITH cells AS (
       |  $cellRows
       |),
       |counters AS (SELECT r, bkt, COUNT(*) AS c FROM cells GROUP BY 1, 2),
       |top AS (
       |  SELECT user_id, COUNT(*) AS n_exact FROM events
       |  GROUP BY 1 ORDER BY n_exact DESC, user_id LIMIT 10
       |),
       |probe AS (
       |  SELECT t.user_id, t.n_exact, c2.r, c2.bkt
       |  FROM top t JOIN cells c2 ON c2.user_id = t.user_id
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT p.user_id, p.n_exact, MIN(co.c) AS n_est,
       |       MIN(co.c) - p.n_exact AS err
       |FROM probe p JOIN counters co ON co.r = p.r AND co.bkt = p.bkt
       |GROUP BY 1, 2
       |ORDER BY n_exact DESC, user_id""".stripMargin
  }

  val evKmv: String =
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT) AS h
      |  FROM events
      |),
      |r AS (
      |  SELECT event_type, h,
      |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      |  FROM h
      |),
      |k AS (
      |  SELECT event_type, MAX(CASE WHEN rn = 32 THEN h END) AS hk,
      |         COUNT(*) AS n_exact
      |  FROM r GROUP BY 1
      |),
      |e AS (
      |  SELECT event_type, n_exact,
      |         CASE WHEN hk IS NOT NULL
      |              THEN ROUND(31.0 * CAST(4503599627370496 AS DOUBLE) / hk, 2)
      |              ELSE CAST(n_exact AS DOUBLE) END AS n_est
      |  FROM k
      |)
      |SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact, n_est,
      |       ROUND((n_est - n_exact) / n_exact * 100, 4) AS err_pct
      |FROM e ORDER BY event_type""".stripMargin

  /** Efraimidis–Spirakis weighted sample, mirroring
    * `Text.weightedSample`: ln(u)/sqrt(n_chars) keys rounded to 6 dp,
    * top-15 per language. */
  /** Mirrors `Text.dsirResample`: hashed-unigram importance weights
    * (add-1-smoothed log ratio, 1024 buckets, 6-dp) + the
    * Efraimidis–Spirakis top-100 cut. */
  val textDsir: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |         CAST('0x' || substr(md5(u.tok), 1, 14) AS BIGINT) % 1024 AS bkt
      |  FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
      |),
      |tgt AS (SELECT bkt FROM tok WHERE doc_id % 10 = 0),
      |rawd AS (SELECT doc_id, bkt FROM tok WHERE doc_id % 10 <> 0),
      |tot AS (SELECT (SELECT COUNT(*) FROM tgt) AS tt,
      |               (SELECT COUNT(*) FROM rawd) AS tr),
      |ct AS (SELECT bkt, COUNT(*) AS ct FROM tgt GROUP BY 1),
      |cr AS (SELECT bkt, COUNT(*) AS cr FROM rawd GROUP BY 1),
      |lr AS (
      |  SELECT COALESCE(ct.bkt, cr.bkt) AS bkt,
      |         ROUND(LN((COALESCE(ct.ct, 0) + 1) / CAST(tot.tt + 1024 AS DOUBLE))
      |             - LN((COALESCE(cr.cr, 0) + 1) / CAST(tot.tr + 1024 AS DOUBLE)), 6) AS lr
      |  FROM ct FULL JOIN cr ON ct.bkt = cr.bkt CROSS JOIN tot
      |),
      |doc AS (
      |  SELECT r.doc_id, COUNT(*) AS n_tok,
      |         ROUND(CAST(SUM(CAST(lr.lr AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS lw
      |  FROM rawd r JOIN lr ON lr.bkt = r.bkt GROUP BY 1
      |)
      |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, lw,
      |       ROUND(LN((CAST('0x' || substr(md5('dsir|' || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 1)
      |             / 4503599627370496.0) / EXP(lw), 6) AS key
      |FROM doc
      |ORDER BY key DESC, doc_id
      |LIMIT 100""".stripMargin

  /** Shared CTE chain of the trained hashed-logreg classifier,
    * mirroring `Text.qclfTrain`'s distributed batch GD exactly: 64
    * md5-hashed tf features, y = (lang = 'en'), 8 unrolled iterations
    * from w = 0 at lr = 50. Determinism parity discipline: every
    * cross-row sum adds 6dp-ROUNDED terms in DECIMAL (addend-order-
    * free), the sigmoid's exp is rounded at its output, and weights
    * re-round to 6 dp each step — so both engines carry bit-identical
    * weights through every iteration. */
  private lazy val qclfChain: String = {
    def margin(w: String) =
      s"SELECT doc_id, CAST(SUM(CAST(ROUND(x * w, 6) AS DECIMAL(28,6))) AS DOUBLE) AS m " +
        s"FROM feats JOIN $w USING (f) GROUP BY doc_id"
    def step(i: Int, prev: String) =
      s"""m$i AS (${margin(prev)}),
         |r$i AS (
         |  SELECT l.doc_id,
         |         ROUND(1.0 / (1.0 + EXP(-COALESCE(m, 0.0))), 6) - y AS r
         |  FROM labels l LEFT JOIN m$i USING (doc_id)
         |),
         |g$i AS (
         |  SELECT f,
         |         ROUND(CAST(SUM(CAST(ROUND(x * r, 6) AS DECIMAL(28,6))) AS DOUBLE)
         |               / (SELECT nd FROM nn), 6) AS g
         |  FROM feats JOIN r$i USING (doc_id) GROUP BY f
         |),
         |w$i AS (
         |  SELECT f, ROUND(w - 50.0 * COALESCE(g, 0.0), 6) AS w
         |  FROM w${i - 1} LEFT JOIN g$i USING (f)
         |)""".stripMargin
    s"""toks AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n,
       |         unnest(string_split(text, ' ')) AS tok
       |  FROM documents
       |),
       |feats AS MATERIALIZED (
       |  -- MATERIALIZED: referenced by every GD step (17x); inlining
       |  -- would re-run the token explode per reference
       |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) % 64 AS f,
       |         ROUND(COUNT(*)::DOUBLE / MIN(n), 6) AS x
       |  FROM toks GROUP BY 1, 2
       |),
       |labels AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents
       |),
       |nn AS (SELECT COUNT(*)::DOUBLE AS nd FROM documents),
       |w0 AS (SELECT CAST(range AS BIGINT) AS f, 0.0 AS w FROM range(64)),
       |${(1 to 8).map(i => step(i, s"w${i - 1}")).mkString(",\n")},
       |scored AS MATERIALIZED (
       |  -- MATERIALIZED: consumers (psi's two slices, cal_eval's two
       |  -- histograms) reference it more than once; inlining re-runs
       |  -- the whole 8-step chain per reference
       |  SELECT s.doc_id, l.y, ROUND(1.0 / (1.0 + EXP(-s.m)), 6) AS score
       |  FROM (${margin("w8")}) s JOIN labels l USING (doc_id)
       |)""".stripMargin
  }

  val textQclfTrain: String =
    s"WITH $qclfChain\nSELECT f, w FROM w8 ORDER BY f"

  val textQclfScore: String =
    s"""WITH $qclfChain
       |SELECT doc_id, y, score,
       |       CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
       |FROM scored ORDER BY doc_id""".stripMargin

  /** Threshold sweep mirroring `Text.qclfPr`: descending cumulative
    * TP/PP over the score histogram, F1 via the exact 2·TP/(PP+P)
    * identity (no composition of rounded ratios). */
  val textQclfPr: String =
    s"""WITH $qclfChain,
       |hist AS (
       |  SELECT score, CAST(SUM(y) AS BIGINT) AS ps, COUNT(*) AS cs
       |  FROM scored GROUP BY score
       |),
       |c AS (
       |  SELECT score,
       |         CAST(SUM(ps) OVER (ORDER BY score DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
       |         CAST(SUM(cs) OVER (ORDER BY score DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp,
       |         CAST(SUM(ps) OVER () AS BIGINT) AS p
       |  FROM hist
       |)
       |SELECT score AS thresh, tp, pp - tp AS fp, p - tp AS fn,
       |       ROUND(CAST(tp AS DOUBLE) / pp, 6) AS precision,
       |       ROUND(CAST(tp AS DOUBLE) / p, 6) AS recall,
       |       ROUND(2.0 * CAST(tp AS DOUBLE) / CAST(pp + p AS DOUBLE), 6) AS f1
       |FROM c ORDER BY thresh""".stripMargin

  /** Operating-point pick mirroring `Text.qclfOpPoint`: best 6-dp F1,
    * lowest threshold on ties. (Concatenated, not re-stripMargined.) */
  val textQclfOpPoint: String =
    textQclfPr.replace("ORDER BY thresh", "ORDER BY f1 DESC, thresh LIMIT 1")

  /** Reliability bins + ECE mirroring `Text.qclfCalibration`: integer
    * micro sums per 0.05-wide bin, exact-integer gap numerators,
    * single final divisions. */
  val textQclfCalibration: String =
    s"""WITH $qclfChain,
       |b AS (
       |  SELECT y, CAST(ROUND(score * 1000000) AS BIGINT) AS su
       |  FROM scored
       |),
       |hist AS (
       |  SELECT LEAST(su // 50000, 19) AS bin, COUNT(*) AS n,
       |         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(su) AS BIGINT) AS ss
       |  FROM b GROUP BY 1
       |),
       |g AS (SELECT *, ABS(sy * 1000000 - ss) AS e FROM hist)
       |SELECT bin, n,
       |       ROUND(CAST(ss AS DOUBLE) / n / 1000000, 6) AS conf,
       |       ROUND(CAST(sy AS DOUBLE) / n, 6) AS acc,
       |       ROUND(CAST(e AS DOUBLE) / (n * 1000000), 6) AS gap,
       |       ROUND(CAST(SUM(e) OVER () AS DOUBLE) /
       |             (SUM(n) OVER () * 1000000), 6) AS ece
       |FROM g ORDER BY bin""".stripMargin

  /** Isotonic calibration map mirroring `Text.qclfIsotonic`: the
    * closed-form minimax fit min_{j≥i} max_{h≤i} pooledMean(h..j)
    * over prefix-sum differences — O(bins³) bounded rows, each
    * pooled mean one double division of exact integers. */
  val textQclfIsotonic: String =
    s"""WITH $qclfChain,
       |b AS (
       |  SELECT y, CAST(ROUND(score * 1000000) AS BIGINT) AS su
       |  FROM scored
       |),
       |hist AS (
       |  SELECT LEAST(su // 50000, 19) AS bin, COUNT(*) AS n,
       |         CAST(SUM(y) AS BIGINT) AS sy
       |  FROM b GROUP BY 1
       |),
       |p AS MATERIALIZED (
       |  -- MATERIALIZED: p is referenced 4x below; inlining would
       |  -- re-run the whole 8-step GD chain per reference
       |  SELECT bin, n, sy,
       |         ROW_NUMBER() OVER (ORDER BY bin) AS pos,
       |         CAST(SUM(n) OVER (ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
       |         CAST(SUM(sy) OVER (ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
       |  FROM hist
       |),
       |pairs AS (
       |  SELECT l.pos AS h, r.pos AS j,
       |         CAST(r.cy - (l.cy - l.sy) AS DOUBLE)
       |           / CAST(r.cn - (l.cn - l.n) AS DOUBLE) AS avgp
       |  FROM p l, p r WHERE l.pos <= r.pos
       |),
       |tri AS (
       |  SELECT i.pos AS i, pr.j, MAX(pr.avgp) AS mx
       |  FROM pairs pr JOIN p i ON pr.h <= i.pos AND i.pos <= pr.j
       |  GROUP BY 1, 2
       |),
       |iso AS (SELECT i, MIN(mx) AS iso FROM tri GROUP BY 1)
       |SELECT p.bin, p.n,
       |       ROUND(CAST(p.sy AS DOUBLE) / p.n, 6) AS acc,
       |       ROUND(iso.iso, 6) AS iso
       |FROM p JOIN iso ON p.pos = iso.i
       |ORDER BY bin""".stripMargin

  /** Out-of-sample calibration validation mirroring
    * `Text.qclfCalibratedEval`: isotonic fit on the 75% reference
    * window, step-function application to the 25% eval window, raw
    * vs calibrated ECE as ordered cumsums. Multi-referenced CTEs
    * MATERIALIZED (the GD chain would otherwise re-run per
    * reference). */
  val textQclfCalibratedEval: String =
    s"""WITH $qclfChain,
       |b AS MATERIALIZED (
       |  SELECT doc_id, y, CAST(ROUND(score * 1000000) AS BIGINT) AS su,
       |         LEAST(CAST(ROUND(score * 1000000) AS BIGINT) // 50000, 19) AS bin
       |  FROM scored
       |),
       |histr AS (
       |  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sy
       |  FROM b WHERE doc_id % 4 <> 0 GROUP BY 1
       |),
       |p AS MATERIALIZED (
       |  SELECT bin, n, sy,
       |         ROW_NUMBER() OVER (ORDER BY bin) AS pos,
       |         CAST(SUM(n) OVER (ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
       |         CAST(SUM(sy) OVER (ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
       |  FROM histr
       |),
       |pairs AS (
       |  SELECT l.pos AS h, r.pos AS j,
       |         CAST(r.cy - (l.cy - l.sy) AS DOUBLE)
       |           / CAST(r.cn - (l.cn - l.n) AS DOUBLE) AS avgp
       |  FROM p l, p r WHERE l.pos <= r.pos
       |),
       |tri AS (
       |  SELECT i.pos AS i, pr.j, MAX(pr.avgp) AS mx
       |  FROM pairs pr JOIN p i ON pr.h <= i.pos AND i.pos <= pr.j
       |  GROUP BY 1, 2
       |),
       |iso0 AS (SELECT i, MIN(mx) AS iso FROM tri GROUP BY 1),
       |isom AS MATERIALIZED (
       |  SELECT p.bin AS rb, iso0.iso FROM p JOIN iso0 ON p.pos = iso0.i
       |),
       |histe AS MATERIALIZED (
       |  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sy,
       |         CAST(SUM(su) AS BIGINT) AS ss
       |  FROM b WHERE doc_id % 4 = 0 GROUP BY 1
       |),
       |step AS (
       |  SELECT e.bin, MAX_BY(m.iso, m.rb) AS cal
       |  FROM histe e JOIN isom m ON m.rb <= e.bin GROUP BY 1
       |),
       |floorv AS (SELECT iso AS cal0 FROM isom ORDER BY rb LIMIT 1),
       |g AS (
       |  SELECT e.bin, e.n, e.sy, e.ss, COALESCE(s.cal, f.cal0) AS cal,
       |         CAST(e.sy AS DOUBLE) / e.n AS acc,
       |         ABS(e.sy * 1000000 - e.ss) AS e_raw
       |  FROM histe e LEFT JOIN step s ON e.bin = s.bin CROSS JOIN floorv f
       |)
       |SELECT bin, n, ROUND(acc, 6) AS acc,
       |       ROUND(CAST(ss AS DOUBLE) / n / 1000000, 6) AS conf_raw,
       |       ROUND(cal, 6) AS conf_cal,
       |       ROUND(CAST(SUM(e_raw) OVER (ORDER BY bin
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |             / (SUM(n) OVER () * 1000000), 6) AS cum_ece_raw,
       |       ROUND(SUM(n * ABS(acc - cal)) OVER (ORDER BY bin
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |             / CAST(SUM(n) OVER () AS DOUBLE), 6) AS cum_ece_cal
       |FROM g ORDER BY bin""".stripMargin

  /** PSI drift monitor mirroring `Text.qclfPsi`: dense 0..19 bin
    * spine, Laplace-smoothed shares, ordered running cumsum. */
  val textQclfPsi: String =
    s"""WITH $qclfChain,
       |b AS (
       |  SELECT doc_id,
       |         LEAST(CAST(ROUND(score * 1000000) AS BIGINT) // 50000, 19) AS bin
       |  FROM scored
       |),
       |spine AS (SELECT CAST(UNNEST(generate_series(0, 19)) AS BIGINT) AS bin),
       |r AS (SELECT bin, COUNT(*) AS n FROM b WHERE doc_id % 4 <> 0 GROUP BY bin),
       |c AS (SELECT bin, COUNT(*) AS n FROM b WHERE doc_id % 4 = 0 GROUP BY bin),
       |j AS (
       |  SELECT s.bin, COALESCE(r.n, 0) AS n_ref, COALESCE(c.n, 0) AS n_cur
       |  FROM spine s LEFT JOIN r USING (bin) LEFT JOIN c USING (bin)
       |),
       |g AS (
       |  SELECT bin, n_ref, n_cur,
       |         CAST(n_ref + 1 AS DOUBLE) / (SUM(n_ref) OVER () + 20) AS pp,
       |         CAST(n_cur + 1 AS DOUBLE) / (SUM(n_cur) OVER () + 20) AS qq
       |  FROM j
       |)
       |SELECT bin, n_ref, n_cur,
       |       ROUND(pp, 6) AS p_ref, ROUND(qq, 6) AS p_cur,
       |       ROUND(SUM((pp - qq) * LN(pp / qq)) OVER (ORDER BY bin
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_psi
       |FROM g ORDER BY bin""".stripMargin

  /** Exact Mann–Whitney AUC with midrank ties over the bounded
    * per-score histogram (≤ 10⁶+1 distinct 6dp scores); all rank
    * arithmetic in BIGINT (doubled midranks) until the one final
    * division, mirroring `Text.qclfAuc`. */
  val textQclfAuc: String =
    s"""WITH $qclfChain,
       |hist AS (
       |  SELECT score, CAST(SUM(y) AS BIGINT) AS ps, COUNT(*) AS cs
       |  FROM scored GROUP BY score
       |),
       |cum AS (
       |  SELECT ps, cs,
       |         SUM(cs) OVER (ORDER BY score
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM hist
       |),
       |agg AS (
       |  SELECT CAST(SUM(ps) AS BIGINT) AS p,
       |         CAST(SUM(cs - ps) AS BIGINT) AS n,
       |         CAST(SUM(ps * (2 * (cum - cs) + cs + 1)) AS BIGINT) AS s2
       |  FROM cum
       |)
       |SELECT p, n,
       |       ROUND((CAST(s2 AS DOUBLE) / 2.0 -
       |              CAST(p AS DOUBLE) * (CAST(p AS DOUBLE) + 1.0) / 2.0) /
       |             (CAST(p AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS auc
       |FROM agg""".stripMargin

  val textWeightedSample: String =
    """WITH d AS (
      |  SELECT lang, doc_id,
      |    ROUND(LN((CAST('0x' || substr(md5(text), 1, 13) AS BIGINT) + 1.0)
      |              / 4503599627370497.0)
      |          / sqrt(CAST(n_chars AS DOUBLE)), 6) AS w6
      |  FROM documents
      |),
      |r AS (
      |  SELECT lang, doc_id, w6,
      |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY w6 DESC, doc_id) AS rank
      |  FROM d
      |)
      |SELECT lang, doc_id, CAST(rank AS BIGINT) AS rank, w6
      |FROM r WHERE rank <= 15 ORDER BY lang, rank""".stripMargin

  /** Deterministic shard shuffle mirroring `Text.shardShuffle`:
    * seeded md5 key, 16 hash-bucket shards from the key's leading
    * 24 bits, within-shard training order (key, doc_id). */
  val textShardShuffle: String =
    """WITH k AS (
      |  SELECT doc_id, md5('shard-v1:' || CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents
      |),
      |s AS (
      |  SELECT doc_id, k,
      |         CAST('0x' || substr(k, 1, 6) AS BIGINT) % 16 AS shard
      |  FROM k
      |)
      |SELECT shard,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
      |            AS BIGINT) AS pos,
      |       doc_id, k
      |FROM s ORDER BY shard, pos""".stripMargin

  /** Shared water-filling CTE chain (see `Text.budgetMix`): exact
    * BIGINT floor shares, prefix rule for fully-taken sources,
    * remainder tokens to the last capped sources in sort order. */
  private val budgetMixChain: String =
    """m AS (
      |  SELECT source,
      |         CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS mass
      |  FROM documents GROUP BY 1
      |),
      |g AS (
      |  SELECT source, mass,
      |         ROW_NUMBER() OVER (ORDER BY mass, source) AS idx,
      |         COALESCE(SUM(mass) OVER (ORDER BY mass, source
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
      |         COUNT(*) OVER () AS nn,
      |         SUM(mass) OVER () // 4 AS bgt
      |  FROM m
      |),
      |f AS (
      |  SELECT *, mass <= (bgt - prefix) // (nn - idx + 1) AS isfull FROM g
      |),
      |h AS (
      |  SELECT *, SUM(CASE WHEN isfull THEN 1 ELSE 0 END) OVER () AS nfull,
      |            SUM(CASE WHEN isfull THEN mass ELSE 0 END) OVER () AS taken
      |  FROM f
      |),
      |allocs AS (
      |  SELECT source, mass, isfull AS "full",
      |         CAST(CASE WHEN isfull THEN mass
      |              ELSE (bgt - taken) // (nn - nfull)
      |                   + (CASE WHEN idx - nfull > (nn - nfull) - (bgt - taken) % (nn - nfull)
      |                      THEN 1 ELSE 0 END)
      |         END AS BIGINT) AS alloc
      |  FROM h
      |)""".stripMargin

  /** Water-filling budget mix mirroring `Text.budgetMix`. */
  val textBudgetMix: String =
    s"""WITH $budgetMixChain
       |SELECT source, mass, "full", alloc FROM allocs ORDER BY source""".stripMargin

  /** Budget apply mirroring `Text.budgetApply`: per-source greedy
    * keep in seeded-key order, whole documents only. */
  val textBudgetApply: String =
    s"""WITH $budgetMixChain,
       |d AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |         md5('shard-v1:' || CAST(doc_id AS VARCHAR)) AS k
       |  FROM documents
       |),
       |cc AS (
       |  SELECT source, doc_id, n_toks,
       |         CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY k, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM d
       |)
       |SELECT cc.source, doc_id, n_toks, cum, cum <= a.alloc AS kept
       |FROM cc JOIN allocs a USING (source)
       |ORDER BY source, doc_id""".stripMargin

  /** Content-defined chunking mirroring `Text.cdcChunks`: 4-token
    * rolling window md5, cut at hash % 64 == 0 (pos >= 3), chunk =
    * count of cuts strictly before the row, order-free 32-bit-slice
    * signature sum. */
  val textCdcChunks: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |t AS (
      |  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, UNNEST(ws) AS tok FROM w
      |),
      |wn AS (
      |  SELECT doc_id, pos, tok,
      |         COALESCE(LAG(tok, 3) OVER (PARTITION BY doc_id ORDER BY pos), '')
      |           || ' ' ||
      |         COALESCE(LAG(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos), '')
      |           || ' ' ||
      |         COALESCE(LAG(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos), '')
      |           || ' ' || tok AS win4
      |  FROM t
      |),
      |c AS (
      |  SELECT doc_id, pos, tok,
      |         CASE WHEN pos >= 3
      |                   AND CAST('0x' || substr(md5(win4), 1, 6) AS BIGINT) % 64 = 0
      |              THEN 1 ELSE 0 END AS cut
      |  FROM wn
      |),
      |g AS (
      |  SELECT doc_id, pos, tok,
      |         COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
      |  FROM c
      |)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |       COUNT(*) AS n_toks,
      |       CAST(MIN(pos) AS BIGINT) AS start_pos,
      |       CAST(SUM(CAST('0x' || substr(md5(tok), 7, 8) AS BIGINT)) AS BIGINT) AS sig
      |FROM g GROUP BY 1, 2 ORDER BY doc_id, chunk_idx""".stripMargin

  /** Mergeable quantile sketch mirroring `Events.quantileSketch`:
    * binary-digit-count buckets over exact micros, integer ceil-div
    * ranks, power-of-two lower-edge readout. */
  val evQuantileSketch: String =
    """WITH e AS (
      |  SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS v FROM events
      |),
      |b AS (
      |  SELECT event_type,
      |         CASE WHEN v <= 0 THEN CAST(0 AS BIGINT)
      |              ELSE CAST(length(bin(v)) AS BIGINT) END AS bucket
      |  FROM e
      |),
      |h AS (SELECT event_type, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type, bucket, c,
      |         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bucket
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM h
      |),
      |r AS (
      |  SELECT event_type, MAX(n) AS n,
      |         MIN(CASE WHEN cum >= (n + 1) // 2 THEN bucket END) AS b50,
      |         MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN bucket END) AS b90,
      |         MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bucket END) AS b99
      |  FROM g GROUP BY 1
      |)
      |SELECT event_type, n,
      |       CASE WHEN b50 = 0 THEN CAST(0 AS BIGINT)
      |            ELSE CAST(1 AS BIGINT) << CAST(b50 - 1 AS INT) END AS p50_est,
      |       CASE WHEN b90 = 0 THEN CAST(0 AS BIGINT)
      |            ELSE CAST(1 AS BIGINT) << CAST(b90 - 1 AS INT) END AS p90_est,
      |       CASE WHEN b99 = 0 THEN CAST(0 AS BIGINT)
      |            ELSE CAST(1 AS BIGINT) << CAST(b99 - 1 AS INT) END AS p99_est
      |FROM r ORDER BY event_type""".stripMargin

  /** Chunk-level duplication report mirroring `Text.cdcDedup`.
    * (Assembled by concatenation, NOT an interpolated stripMargin —
    * stripMargin over embedded SQL eats the first pipe of every
    * leading `||` concatenation.) */
  val textCdcDedup: String =
    "WITH ch AS MATERIALIZED (" +
      textCdcChunks.replace("ORDER BY doc_id, chunk_idx", "") + "),\n" +
    """shared AS (
      |  SELECT sig, n_toks FROM ch GROUP BY 1, 2
      |  HAVING COUNT(DISTINCT doc_id) > 1
      |)
      |SELECT ch.doc_id,
      |       COUNT(*) AS n_chunks,
      |       CAST(SUM(CASE WHEN s.sig IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
      |       CAST(SUM(CASE WHEN s.sig IS NOT NULL THEN ch.n_toks ELSE 0 END) AS BIGINT) AS dup_toks,
      |       ROUND(CAST(SUM(CASE WHEN s.sig IS NOT NULL THEN ch.n_toks ELSE 0 END) AS DOUBLE)
      |             / SUM(ch.n_toks), 6) AS dup_ratio
      |FROM ch LEFT JOIN shared s ON ch.sig = s.sig AND ch.n_toks = s.n_toks
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** CDC chunk-dedup apply mirroring `Text.cdcApply`: keep-first
    * owner per shared chunk identity, span-range token drops,
    * position-ordered reassembly md5. (Concatenated, not
    * re-stripMargined.) */
  val textCdcApply: String =
    "WITH ch AS MATERIALIZED (" +
      textCdcChunks.replace("ORDER BY doc_id, chunk_idx", "") + "),\n" +
    """own AS (
      |  SELECT sig, n_toks, MIN(doc_id) AS owner, COUNT(DISTINCT doc_id) AS nd
      |  FROM ch GROUP BY 1, 2
      |),
      |drops AS (
      |  SELECT ch.doc_id, ch.start_pos, ch.start_pos + ch.n_toks AS end_pos
      |  FROM ch JOIN own USING (sig, n_toks)
      |  WHERE own.nd > 1 AND ch.doc_id <> own.owner
      |),
      |t AS (
      |  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, UNNEST(ws) AS tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |),
      |tot AS (SELECT doc_id, COUNT(*) AS n_all FROM t GROUP BY 1),
      |k AS (
      |  SELECT t.doc_id, t.pos, t.tok FROM t
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM drops d
      |    WHERE d.doc_id = t.doc_id AND t.pos >= d.start_pos AND t.pos < d.end_pos)
      |)
      |SELECT k.doc_id, COUNT(*) AS kept_toks,
      |       CAST(MAX(tot.n_all) - COUNT(*) AS BIGINT) AS dropped_toks,
      |       md5(string_agg(k.tok, ' ' ORDER BY k.pos)) AS kept_md5
      |FROM k JOIN tot ON k.doc_id = tot.doc_id
      |GROUP BY 1 ORDER BY k.doc_id""".stripMargin

  /** Pearson chi-square independence audit mirroring `Text.chi2`:
    * dense source×lang cell spine (zero cells included), exact
    * integer marginals, one fp division per expected count, ordered
    * running cumsum of the IEEE-identical cell terms. */
  val textChi2: String =
    """WITH cells AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
      |r AS (SELECT source, COUNT(*) AS r FROM documents GROUP BY 1),
      |c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
      |t AS (SELECT COUNT(*) AS nn FROM documents),
      |s AS (
      |  SELECT r.source, c.lang, COALESCE(cells.n, 0) AS n,
      |         CAST(r.r * c.c AS DOUBLE) / t.nn AS e
      |  FROM r CROSS JOIN c CROSS JOIN t
      |  LEFT JOIN cells USING (source, lang)
      |)
      |SELECT source, lang, n, ROUND(e, 6) AS e6,
      |       ROUND(SUM((n - e) * (n - e) / e) OVER (ORDER BY source, lang
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_chi2
      |FROM s ORDER BY source, lang""".stripMargin

  /** Per-shard manifest mirroring `Text.shardManifest`: doc count,
    * token mass, order-free BIGINT checksum over a 32-bit key slice. */
  val textShardManifest: String =
    """WITH s AS (
      |  SELECT doc_id, md5('shard-v1:' || CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents
      |)
      |SELECT CAST('0x' || substr(s.k, 1, 6) AS BIGINT) % 16 AS shard,
      |       COUNT(*) AS n_docs,
      |       CAST(SUM(CAST(len(string_split(d.text, ' ')) AS BIGINT)) AS BIGINT) AS n_toks,
      |       CAST(SUM(CAST('0x' || substr(s.k, 7, 8) AS BIGINT)) AS BIGINT) AS key_sum
      |FROM s JOIN documents d USING (doc_id)
      |GROUP BY 1 ORDER BY shard""".stripMargin

  /** Z-order layout audit, mirroring `Relational.zorderAudit`:
    * 16-bit Morton interleave, 64 equal files per layout by exact
    * integer arithmetic, min/max file-skipping probes. */
  val relZorder: String =
    """WITH b0 AS (
      |  SELECT o_orderkey, o_custkey AS cust,
      |         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day
      |  FROM orders
      |),
      |base AS (
      |  SELECT o_orderkey, cust, day,
      |         list_sum(list_transform(range(0, 16), i ->
      |           (((cust >> i) & 1) << (2 * i)) + (((day >> i) & 1) << (2 * i + 1)))) AS z
      |  FROM b0
      |),
      |n AS (SELECT COUNT(*) AS n FROM base),
      |u AS (
      |  SELECT 'zorder' AS layout, cust, day,
      |         ((ROW_NUMBER() OVER (ORDER BY z, o_orderkey) - 1) * 64) // n.n AS bucket
      |  FROM base CROSS JOIN n
      |  UNION ALL
      |  SELECT 'custkey', cust, day,
      |         ((ROW_NUMBER() OVER (ORDER BY cust, o_orderkey) - 1) * 64) // n.n
      |  FROM base CROSS JOIN n
      |  UNION ALL
      |  SELECT 'orderdate', cust, day,
      |         ((ROW_NUMBER() OVER (ORDER BY day, o_orderkey) - 1) * 64) // n.n
      |  FROM base CROSS JOIN n
      |),
      |f AS (
      |  SELECT layout, bucket, MIN(cust) AS min_c, MAX(cust) AS max_c,
      |         MIN(day) AS min_d, MAX(day) AS max_d
      |  FROM u GROUP BY 1, 2
      |)
      |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
      |       CAST(SUM(CASE WHEN max_c >= 100 AND min_c <= 199 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS scan_cust_probe,
      |       CAST(SUM(CASE WHEN max_d >= 365 AND min_d <= 729 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS scan_date_probe
      |FROM f GROUP BY layout ORDER BY layout""".stripMargin

  val relMarketShare: String =
    """WITH asia_cust AS (
      |  SELECT c_custkey FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |),
      |vol AS (
      |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |         n2.n_name AS supp_nation,
      |         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |              * (1 - CAST(l.l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS r4
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_custkey IN (SELECT c_custkey FROM asia_cust)
      |)
      |SELECT yr,
      |       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN r4 ELSE 0 END) AS DOUBLE)
      |             / SUM(r4), 6) AS mkt_share
      |FROM vol GROUP BY yr ORDER BY yr""".stripMargin

  val relNationProfit: String =
    """WITH li AS (
      |  SELECT n2.n_name AS nation,
      |         CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |              * (1 - CAST(l.l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS r4
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |)
      |SELECT nation, yr, ROUND(CAST(SUM(r4) AS DOUBLE) / 10000, 2) AS revenue
      |FROM li GROUP BY nation, yr ORDER BY nation, yr""".stripMargin

  /** Plain-join mirror of `Relational.skewJoin`: the salted execution
    * must hash-match the unsalted logical join. */
  val relSkewJoin: String =
    """WITH li AS (
      |  SELECT n_name AS nation,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |              * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS r4
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |)
      |SELECT nation, COUNT(*) AS n_items,
      |       ROUND(CAST(SUM(r4) AS DOUBLE) / 10000, 2) AS revenue
      |FROM li GROUP BY nation ORDER BY nation""".stripMargin

  /** Mirrors `Relational.bucketJoin`: the oracle is the plain join —
    * the bucketed layout must be result-invisible. */
  val relBucketJoin: String =
    """SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY segment""".stripMargin

  val riskRatios: String =
    """WITH sd0 AS (
      |  SELECT c_mktsegment AS name, CAST(o_orderdate AS DATE) AS date,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tvl
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |),
      |sp AS (
      |  SELECT name, date,
      |         (tvl - LAG(tvl) OVER (PARTITION BY name ORDER BY date))
      |           / LAG(tvl) OVER (PARTITION BY name ORDER BY date) AS s_pct
      |  FROM sd0
      |),
      |bd AS (
      |  SELECT CAST(l_shipdate AS DATE) AS date,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bench
      |  FROM lineitem GROUP BY 1
      |),
      |bp AS (SELECT date, (bench - LAG(bench) OVER (ORDER BY date)) / LAG(bench) OVER (ORDER BY date) AS b_pct FROM bd),
      |a AS (SELECT name, MAX(date) AS ds, CAST(MAX(date) - INTERVAL 12 MONTH AS DATE) AS start FROM sd0 GROUP BY name),
      |j AS (
      |  SELECT sp.name, sp.date, sp.s_pct, bp.b_pct
      |  FROM sp JOIN bp ON sp.date = bp.date JOIN a ON a.name = sp.name
      |  WHERE sp.date > a.start AND sp.date <= a.ds
      |    AND sp.s_pct IS NOT NULL AND bp.b_pct IS NOT NULL
      |),
      |stats AS (
      |  SELECT name,
      |    ROUND(EXP(SUM(LN(1.0 + s_pct))) - 1.0, 6) AS ann_return,
      |    ROUND(stddev_samp(s_pct) * sqrt(365.0), 6) AS ann_vol,
      |    ROUND(avg(s_pct) / stddev_samp(s_pct) * sqrt(365.0), 6) AS sharpe,
      |    ROUND(avg(s_pct) / sqrt(avg(power(least(s_pct, 0.0), 2))) * sqrt(365.0), 6) AS sortino,
      |    ROUND(stddev_samp(s_pct - b_pct) * sqrt(365.0), 6) AS tracking_err,
      |    ROUND(avg(s_pct - b_pct) / stddev_samp(s_pct - b_pct) * sqrt(365.0), 6) AS info_ratio,
      |    EXP(SUM(LN(1.0 + s_pct))) - 1.0 AS ar_raw
      |  FROM j GROUP BY name
      |),
      |w1 AS (
      |  SELECT name, date,
      |         SUM(s_pct) OVER (PARTITION BY name ORDER BY date
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM j
      |),
      |w2 AS (
      |  SELECT name, cum,
      |         MAX(cum) OVER (PARTITION BY name ORDER BY date
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cummax
      |  FROM w1
      |),
      |dd AS (SELECT name, MIN(cum - cummax) AS min_dd FROM w2 GROUP BY name)
      |SELECT s.name, s.ann_return, s.ann_vol, s.sharpe, s.sortino,
      |       CASE WHEN d.min_dd < 0 THEN ROUND(s.ar_raw / -d.min_dd, 6) END AS calmar,
      |       s.tracking_err, s.info_ratio, ROUND(d.min_dd, 6) AS max_drawdown
      |FROM stats s JOIN dd d ON s.name = d.name
      |ORDER BY s.name""".stripMargin
}
