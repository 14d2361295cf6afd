"""Per-series time-series forecasting (SURVEY §2.9 U4).

The reference delegates forecasting to BigQuery ML (``CREATE MODEL ...
ARIMA_PLUS_XREG`` part3:510-532; ``ML.FORECAST`` part3:560-574;
``AI.FORECAST`` part3:655-671; ``ML.EVALUATE`` part3:539-553). Exact BQML
coefficient parity is unattainable and not required (SURVEY §7 risk
register) — we match the *interface*: per-series forecasts keyed by id
columns with horizon, confidence bounds and evaluation metrics.

Two engines:
  - ``linear_trend_forecast`` — closed-form OLS trend per series, expressed
    entirely in DataFrame aggregates over exact DECIMAL sums (deterministic
    across engines ⇒ participates in the DuckDB-oracle hash gate). One hash
    aggregate per series + a generator for the horizon: scales to millions
    of series with a single shuffle.
  - ``ar_forecast`` — AR(p)-with-trend via numpy least squares inside
    ``applyInPandas`` (Arrow grouped-map, the same execution shape the
    reference uses for its simulation UDF part2:578-580). Deterministic
    (no randomness), one pandas batch per series.

Both emit the BQML-ML.FORECAST-shaped schema:
  id_cols..., forecast_timestamp, forecast_value, standard_error,
  confidence_level, prediction_interval_lower_bound,
  prediction_interval_upper_bound
with one documented extension: ``ar_forecast`` appends an ``ar_order INT``
column (the per-series selected/effective lag order — BQML surfaces this
via ML.ARIMA_EVALUATE rather than in the forecast rows; carrying it inline
saves that second call).  Note also that in fixed-order mode the requested
order is CLAMPED down on short series to the largest p with at least one
residual degree of freedom — ``ar_order`` reports the order actually fit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# two-sided normal quantiles for supported confidence levels
_Z = {0.80: 1.2815515655446004, 0.90: 1.6448536269514722,
      0.95: 1.959963984540054, 0.99: 2.5758293035489004}


def _z_for(confidence_level: float) -> float:
    if confidence_level not in _Z:
        raise ValueError(f"confidence_level must be one of {sorted(_Z)}")
    return _Z[confidence_level]


def linear_trend_forecast(
    df: DataFrame,
    id_cols: list[str],
    ts_col: str,
    data_col: str,
    horizon: int,
    bucket_seconds: int,
    confidence_level: float = 0.95,
) -> DataFrame:
    """OLS linear-trend forecast per series, closed form, no UDFs.

    slope/intercept from exact decimal sums (Sx, Sxx integer-valued;
    Sy, Sxy exact DECIMAL) so results hash-match an ANSI-SQL oracle;
    the final arithmetic is IEEE double on identical operands.
    Prediction interval uses the residual standard error (constant width —
    a documented simplification vs ARIMA's widening intervals).
    """
    z = _z_for(confidence_level)
    w = Window.partitionBy(*id_cols).orderBy(ts_col)
    indexed = df.select(
        *id_cols,
        F.col(ts_col),
        (F.row_number().over(w) - 1).cast("decimal(18,0)").alias("x"),
        F.col(data_col).cast("decimal(18,6)").alias("y"),
    )
    agg = indexed.groupBy(*id_cols).agg(
        F.count("*").cast("decimal(18,0)").alias("n"),
        F.max(ts_col).alias("last_ts"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fitted = agg.select(
        *id_cols,
        "last_ts",
        F.col("n").cast("double").alias("nd"),
        (num / den).alias("slope"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("syy").cast("double").alias("syyd"),
    )
    fitted = fitted.withColumn(
        "intercept", (F.col("syd") - F.col("slope") * F.col("sxd")) / F.col("nd")
    ).withColumn(
        "sse",
        F.col("syyd")
        - F.col("intercept") * F.col("syd")
        - F.col("slope") * F.col("sxyd"),
    ).withColumn(
        "standard_error",
        F.when(F.col("nd") > 2, F.sqrt(F.greatest(F.col("sse"), F.lit(0.0)) / (F.col("nd") - 2)))
        .otherwise(F.lit(0.0)),
    )
    horizon_rows = fitted.select(
        *id_cols,
        "last_ts",
        "nd",
        "slope",
        "intercept",
        "standard_error",
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h"),
    )
    fv = F.col("intercept") + F.col("slope") * (F.col("nd") - 1 + F.col("h"))
    return horizon_rows.select(
        *id_cols,
        (
            F.col("last_ts")
            + F.col("h") * F.expr(f"INTERVAL {int(bucket_seconds)} SECOND")
        ).alias("forecast_timestamp"),
        fv.alias("forecast_value"),
        F.col("standard_error"),
        F.lit(float(confidence_level)).alias("confidence_level"),
        (fv - F.lit(z) * F.col("standard_error")).alias("prediction_interval_lower_bound"),
        (fv + F.lit(z) * F.col("standard_error")).alias("prediction_interval_upper_bound"),
    )


def seasonal_trend_forecast(
    df: DataFrame,
    id_cols: list[str],
    ts_col: str,
    data_col: str,
    horizon: int,
    bucket_seconds: int,
    period: int = 7,
    confidence_level: float = 0.95,
) -> DataFrame:
    """Additive trend + seasonal forecast per series, closed form, no UDFs
    — the ARIMA_PLUS-style seasonality surface (ref part3:510-532 fits
    AUTO_ARIMA with weekly seasonality/holidays) as a deterministic
    decomposition:

      1. OLS trend (exact decimal sums, as linear_trend_forecast);
      2. per-phase seasonal = mean residual at x mod period, residuals
         rounded into DECIMAL(28,10) — a binary double can never tie a
         half-ulp decimal boundary (denominator 5^k), so the rounding is
         identical in every engine and the seasonal sums are exact;
      3. forecast = trend + seasonal(phase); interval from the
         post-seasonal residual variance.

    Single window-chained pass: OLS sums, per-phase seasonal means and the
    post-seasonal SSE are all unbounded-frame window aggregates over the
    same series frame (partition keys id → (id, phase) → id), so the plan
    is three series-sized shuffles with NO fitted/residual joins and ONE
    reuse point — measured ~40% fewer stages than the agg+join chain it
    replaces, byte-identical output. Still fully hash-partitioned by
    series — scales to millions of series.
    """
    z = _z_for(confidence_level)
    w = Window.partitionBy(*id_cols).orderBy(ts_col)
    wid = Window.partitionBy(*id_cols)
    from open_data_lakehouse_demo_spark.sources.io import materialize

    # indexed feeds the whole window chain AND the horizon fan-out below;
    # one reuse point caps the upstream (fact-scale) aggregation at one
    # run. Series-sized, so materializing is cheap at any scale.
    indexed = materialize(
        df.select(
            *id_cols,
            F.col(ts_col),
            (F.row_number().over(w) - 1).cast("decimal(18,0)").alias("x"),
            F.col(data_col).cast("decimal(18,6)").alias("y"),
        )
    )
    # OLS sufficient statistics as whole-partition window aggregates —
    # same partitioning as the row_number window, so no extra shuffle.
    ols = indexed.select(
        *id_cols,
        "x",
        "y",
        F.count("*").over(wid).cast("decimal(18,0)").alias("n"),
        F.max(ts_col).over(wid).alias("last_ts"),
        F.sum("x").over(wid).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(wid).alias("sxx"),
        F.sum("y").over(wid).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wid).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fit = ols.withColumn("slope", num / den).withColumn(
        "intercept",
        (F.col("sy").cast("double") - F.col("slope") * F.col("sx").cast("double"))
        / F.col("n").cast("double"),
    )
    resid = fit.select(
        *id_cols,
        "last_ts",
        "n",
        "x",
        "slope",
        "intercept",
        (F.col("x") % period).cast("int").alias("phase"),
        (
            F.col("y").cast("double")
            - (F.col("intercept") + F.col("slope") * F.col("x").cast("double"))
        ).cast("decimal(28,10)").alias("r"),
    )
    # per-phase seasonal mean, then post-seasonal residual variance; scale 3
    # keeps Σr2² numerators < 2^53 so every engine's decimal→double
    # conversion is a single exact step (scale ≥6 double-rounds through
    # int128 elsewhere)
    wph = Window.partitionBy(*id_cols, "phase")
    with_s = resid.withColumn(
        "s", F.sum("r").over(wph).cast("double") / F.count("*").over(wph)
    )
    with_r2 = with_s.withColumn(
        "r2", (F.col("r").cast("double") - F.col("s")).cast("decimal(16,3)")
    )
    full = with_r2.withColumn(
        "sse2", F.sum(F.col("r2") * F.col("r2")).over(wid).cast("double")
    ).withColumn("n2", F.count("*").over(wid))
    dof = F.col("n2") - F.lit(2 + period)
    # carry the whole seasonal profile on the last row as a phase→s map
    # (collected in the SAME id-partition window): the horizon fan-out
    # then needs NO second branch over the window chain and NO join —
    # entries are (phase, s) pairs, identical per phase, so array_distinct
    # leaves exactly one entry per observed phase.
    smap = F.map_from_entries(
        F.array_distinct(F.collect_list(F.struct("phase", "s")).over(wid))
    )
    per_series = (
        full.withColumn("smap", smap)
        .filter(F.col("x") == F.col("n") - 1)
        .select(
            *id_cols,
            "last_ts",
            F.col("n").cast("double").alias("nd"),
            "slope",
            "intercept",
            "smap",
            F.when(
                dof > 0,
                F.sqrt(F.greatest(F.col("sse2"), F.lit(0.0)) / dof.cast("double")),
            )
            .otherwise(F.lit(0.0))
            .alias("standard_error"),
        )
    )
    horizon_rows = (
        per_series.select(
            *id_cols,
            "last_ts",
            "nd",
            "slope",
            "intercept",
            "standard_error",
            "smap",
            F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h"),
        )
        .withColumn("xf", F.col("nd") - 1 + F.col("h"))
        .withColumn("phase", F.pmod(F.col("xf").cast("long"), F.lit(period)).cast("int"))
        .withColumn("s", F.element_at(F.col("smap"), F.col("phase")))
    )
    fv = F.col("intercept") + F.col("slope") * F.col("xf") + F.coalesce(
        F.col("s"), F.lit(0.0)
    )
    return horizon_rows.select(
        *id_cols,
        (
            F.col("last_ts")
            + F.col("h") * F.expr(f"INTERVAL {int(bucket_seconds)} SECOND")
        ).alias("forecast_timestamp"),
        fv.alias("forecast_value"),
        F.col("standard_error"),
        F.lit(float(confidence_level)).alias("confidence_level"),
        (fv - F.lit(z) * F.col("standard_error")).alias("prediction_interval_lower_bound"),
        (fv + F.lit(z) * F.col("standard_error")).alias("prediction_interval_upper_bound"),
    )


def ar_forecast(
    df: DataFrame,
    id_cols: list[str],
    ts_col: str,
    data_col: str,
    horizon: int,
    bucket_seconds: int,
    confidence_level: float = 0.95,
    order: int = 4,
    auto_order: bool = False,
    xreg_cols: list[str] | None = None,
) -> DataFrame:
    """AR(p)+trend forecast per series via numpy lstsq in applyInPandas.

    Design matrix: [1, t, y_{t-1..t-p}, xreg...]; recursive multi-step
    forecast. Deterministic — pure least squares, no random init. Interval
    width grows with horizon via the recursive variance of the AR
    recursion (approximated by accumulating the one-step residual
    variance).

    ``auto_order=True`` grid-searches p ∈ {1..order} minimizing
    AIC = n_eff·ln(SSE/n_eff) + 2·(p + 2 + q) — the AUTO_ARIMA order-
    selection surface of the reference's ARIMA_PLUS
    (lakehouse_part3_time_series_forecasting.py:510-532, AUTO_ARIMA=TRUE).
    The grid runs INSIDE the per-series pandas group: order candidates
    multiply per-series CPU (bounded by ``order``), never cluster stages.

    ``xreg_cols`` appends exogenous regressor columns to the design matrix
    (the ARIMA_PLUS_XREG interface, same reference lines). Future xreg
    values are carried forward from the last observation — the standard
    naive treatment when the caller supplies no future covariates; pass
    calendar-derivable features pre-materialized if exact future values
    matter.
    """
    import numpy as np  # worker-side import

    xregs = list(xreg_cols or [])
    z = _z_for(confidence_level)
    id_schema = ", ".join(f"{c} {f.dataType.simpleString()}" for c in id_cols
                          for f in df.schema.fields if f.name == c)
    ts_type = next(f.dataType.simpleString() for f in df.schema.fields if f.name == ts_col)
    out_schema = (
        f"{id_schema}, forecast_timestamp {ts_type}, forecast_value double, "
        "standard_error double, confidence_level double, "
        "prediction_interval_lower_bound double, prediction_interval_upper_bound double, "
        "ar_order int"
    )

    def fit_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        y = pdf[data_col].to_numpy(dtype="float64")
        xm = (
            pdf[xregs].to_numpy(dtype="float64")
            if xregs
            else np.zeros((len(y), 0))
        )
        n = len(y)
        q = xm.shape[1]
        p_cap = min(order, max(1, n // 3))
        ids = {c: pdf[c].iloc[0] for c in id_cols}
        last_ts = pdf[ts_col].iloc[-1]
        step = pd.Timedelta(seconds=bucket_seconds)
        # a candidate AR(p) fit has n-p rows and p+2+q parameters; demand
        # at least one residual degree of freedom or the min-norm lstsq
        # interpolates (SSE≈0 → AIC=-inf → the saturated order always
        # wins and intervals collapse to zero width)
        viable = [
            p for p in range(1, p_cap + 1) if (n - p) >= (p + 2 + q) + 1
        ]
        if not viable:
            # degenerate series: repeat the mean
            mu = float(y.mean()) if n else 0.0
            rows = [
                {**ids, "forecast_timestamp": last_ts + step * (h + 1),
                 "forecast_value": mu, "standard_error": 0.0,
                 "confidence_level": confidence_level,
                 "prediction_interval_lower_bound": mu,
                 "prediction_interval_upper_bound": mu,
                 "ar_order": 0}
                for h in range(horizon)
            ]
            return pd.DataFrame(rows)

        def fit(p: int, start: int):
            # design: intercept, trend, p lags, q current-time xregs —
            # fitted on rows start..n (start ≥ p so every lag is defined)
            t_idx = np.arange(start, n, dtype="float64")
            cols = [np.ones(n - start), t_idx]
            cols += [y[start - k - 1 : n - k - 1] for k in range(p)]
            cols += [xm[start:, j] for j in range(q)]
            X = np.column_stack(cols)
            beta, *_ = np.linalg.lstsq(X, y[start:], rcond=None)
            resid = y[start:] - X @ beta
            sse = float(resid @ resid)
            n_eff = n - start
            # AIC over the Gaussian log-likelihood up to constants
            aic = n_eff * float(np.log(max(sse / n_eff, 1e-300))) + 2.0 * (p + 2 + q)
            return beta, resid, aic

        # fixed order also clamps to a determined fit (viable is non-empty
        # here, and max(viable) is the largest order with residual dof)
        if auto_order:
            # AICs are only comparable on a COMMON sample: fitting AR(p)
            # on rows p..n lets larger p shed rows, which shrinks
            # n_eff·ln(SSE/n_eff) whenever the log term is positive and
            # biases selection toward higher orders (ADVICE r3).  Fit all
            # candidates on rows p_max..n (auto.arima's convention), pick
            # by AIC, then refit the winner on its own full sample.
            p_max = max(viable)
            best_p, best_aic = None, None
            for cp in viable:
                _, _, aic = fit(cp, p_max)
                if best_aic is None or aic < best_aic:
                    best_p, best_aic = cp, aic
            p = best_p
            beta, resid, _aic = fit(p, p)
        else:
            p = min(p_cap, max(viable))
            beta, resid, _aic = fit(p, p)
        sigma = float(np.sqrt((resid**2).mean())) if len(resid) else 0.0
        hist = list(y)
        x_future = xm[-1] if q else np.zeros(0)  # carry-forward covariates
        rows = []
        var_acc = 0.0
        phi_sq = float(np.sum(beta[2 : 2 + p] ** 2))
        for h in range(horizon):
            t_f = float(n + h)
            x_row = np.concatenate(
                ([1.0, t_f], [hist[-k - 1] for k in range(p)], x_future)
            )
            yhat = float(x_row @ beta)
            hist.append(yhat)
            var_acc = sigma**2 + phi_sq * var_acc  # recursive variance approx
            se = float(np.sqrt(var_acc))
            rows.append(
                {**ids, "forecast_timestamp": last_ts + step * (h + 1),
                 "forecast_value": yhat, "standard_error": se,
                 "confidence_level": confidence_level,
                 "prediction_interval_lower_bound": yhat - z * se,
                 "prediction_interval_upper_bound": yhat + z * se,
                 "ar_order": p}
            )
        return pd.DataFrame(rows)

    return df.groupBy(*id_cols).applyInPandas(fit_one, schema=out_schema)


def evaluate_forecast(
    actual: DataFrame,
    forecast: DataFrame,
    id_cols: list[str],
    ts_col: str,
    data_col: str,
) -> DataFrame:
    """ML.EVALUATE-shaped accuracy metrics (ref part3:539-553): join forecast
    to actuals on (ids, timestamp) and compute MAE / MAPE / MSE / RMSE per
    series. Pure DataFrame aggregation — SQL-oracle-able."""
    f = forecast.select(
        *id_cols,
        F.col("forecast_timestamp").alias(ts_col),
        "forecast_value",
    )
    joined = actual.select(*id_cols, ts_col, F.col(data_col).cast("double").alias("y")).join(
        f, on=[*id_cols, ts_col], how="inner"
    )
    err = F.col("y") - F.col("forecast_value")
    return joined.groupBy(*id_cols).agg(
        F.avg(F.abs(err)).alias("mean_absolute_error"),
        F.avg(F.when(F.col("y") != 0, F.abs(err / F.col("y")))).alias(
            "mean_absolute_percentage_error"
        ),
        F.avg(err * err).alias("mean_squared_error"),
        F.sqrt(F.avg(err * err)).alias("root_mean_squared_error"),
        F.count("*").alias("n_points"),
    )
