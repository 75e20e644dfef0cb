"""Time+channel averaging — the reference's group-by engine, Spark-first.

Capability parity with /root/reference/africanus/averaging/
time_and_channel_avg.py:764-860 (time_and_channel) and the row/chan
mappers (time_and_channel_mapping.py:67-378):

- rows group by (baseline = antenna1,antenna2, time bin of `time_bin_secs`),
  channels by `chan_bin_size`;
- ANTENNA1/2 carry through, TIME is the bin mean, INTERVAL sums,
  WEIGHT sums, visibilities are weighted means Σ(v·w)/Σw;
- **two-tier flag semantics** (mapping.py:80-87): a bin's value uses only
  unflagged samples; if *every* sample in the bin is flagged, the flagged
  samples are used instead and the bin is marked flagged —
  `when(~flag, x)` sums with `coalesce` fallback + `bool_and(flag)`.

The reference restricts bins to single dask chunks ("averages each chunk
independently", docs/averaging-api.rst:183-185) and spends ~800 LoC on
unknown-cardinality plumbing (averaging/dask.py). A shuffle-based groupBy
has neither problem: bins correctly span partitions and cardinality is
dynamic by construction. Map-side partial aggregation keeps the shuffle
volume at O(#bins), not O(#rows).

Deterministic mode: weighted sums are fixed-point exact (qsum), so the
weighted means are bit-reproducible regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codex_africanus_spark.functions.deterministic import qsum


def _flag_aware_wsum(value: Column, weight: Column, flag: Column, scale: float):
    """(Σ over unflagged, Σ over flagged) exact fixed-point pairs."""
    unflagged = qsum(F.when(~flag, value * weight).otherwise(F.lit(0.0)), scale)
    flagged = qsum(F.when(flag, value * weight).otherwise(F.lit(0.0)), scale)
    return unflagged, flagged


def time_and_channel(
    vis: DataFrame,
    time_bin_secs: float = 604800.0,
    chan_bin_size: int = 2,
    scale: float = 100.0,
) -> DataFrame:
    """Average an MS-shaped frame over (baseline, time-bin, chan-bin).

    Input columns: time, antenna1, antenna2, chan, vis_re, vis_im, weight,
    interval, flag (sample flag), flag_row.
    """
    tbin = F.floor(F.col("time") / F.lit(time_bin_secs)).cast("long")
    cbin = (F.col("chan") / F.lit(chan_bin_size)).cast("int")
    flag = F.col("flag") | F.col("flag_row")

    re_u, re_f = _flag_aware_wsum(F.col("vis_re"), F.col("weight"), flag, scale)
    im_u, im_f = _flag_aware_wsum(F.col("vis_im"), F.col("weight"), flag, scale)
    w_u = qsum(F.when(~flag, F.col("weight")).otherwise(F.lit(0.0)), scale)
    w_f = qsum(F.when(flag, F.col("weight")).otherwise(F.lit(0.0)), scale)

    agg = (
        vis.withColumn("time_bin", tbin)
        .withColumn("chan_bin", cbin)
        .groupBy("antenna1", "antenna2", "time_bin", "chan_bin")
        .agg(
            F.count(F.lit(1)).alias("nsamples"),
            qsum(F.col("time"), 1.0).alias("time_sum_s"),
            qsum(F.col("interval"), scale).alias("interval_sum_q"),
            re_u.alias("re_u"), re_f.alias("re_f"),
            im_u.alias("im_u"), im_f.alias("im_f"),
            w_u.alias("w_u"), w_f.alias("w_f"),
            F.min(flag.cast("int")).alias("all_flagged_int"),
        )
    )
    bin_flagged = F.col("all_flagged_int") == 1  # min(flag)==1 ⇔ every sample flagged
    sel = lambda u, f: F.when(bin_flagged, f).otherwise(u)  # noqa: E731
    return agg.select(
        "antenna1",
        "antenna2",
        "time_bin",
        "chan_bin",
        "nsamples",
        (F.col("time_sum_s") / F.col("nsamples")).alias("time_avg"),
        (F.col("interval_sum_q") / F.lit(scale)).alias("interval_sum"),
        (sel(F.col("re_u"), F.col("re_f")) / sel(F.col("w_u"), F.col("w_f"))).alias("vis_re_avg"),
        (sel(F.col("im_u"), F.col("im_f")) / sel(F.col("w_u"), F.col("w_f"))).alias("vis_im_avg"),
        (sel(F.col("w_u"), F.col("w_f")) / F.lit(scale)).alias("weight_sum"),
        bin_flagged.alias("bin_flag"),
    )


def _two_tier(agg_unflagged: Column, agg_flagged: Column, all_flagged: Column):
    """Two-tier select: unflagged aggregate when any sample is unflagged,
    else the flagged aggregate (mapping.py:80-87 flag semantics)."""
    return F.when(all_flagged, agg_flagged).otherwise(agg_unflagged)


def row_average_full(
    vis: DataFrame,
    time_bin_secs: float = 604800.0,
    scale: float = 100.0,
) -> DataFrame:
    """Full-column MS row averaging over (baseline, time-bin) — parity
    with reference row_average (time_and_channel_avg.py:76-266):

    - TIME / INTERVAL: two-tier mean / sum (row_mapper semantics,
      time_and_channel_mapping.py:96-104 — unflagged tier when any
      sample in the bin is unflagged, flagged tier otherwise);
    - TIME_CENTROID: two-tier mean; EXPOSURE: two-tier sum
      (rows contribute iff their flag matches the bin's output flag —
      matching_flag_factory, time_and_channel_avg.py:188-196);
    - UVW: two-tier per-component mean (avg.py:192-196, 238-242);
    - WEIGHT: two-tier sum (avg.py:203-205);
    - SIGMA: sqrt(Σσ²w² / (Σw)²) over matching rows (avg.py:207-221,
      249-258) — falls back to sqrt(Σσ²w²) when Σw = 0.

    All sums are exact fixed-point (qsum), so results are bit-identical
    under any partitioning and mirror the DuckDB oracle exactly. One
    shuffle on (antenna1, antenna2, time_bin) with map-side combine —
    O(#bins) exchange volume at any input scale.

    Input columns: time, antenna1, antenna2, u, v, w, time_centroid,
    exposure, interval, weight, sigma, flag_row.
    """
    tbin = F.floor(F.col("time") / F.lit(time_bin_secs)).cast("long")
    f = F.col("flag_row")

    def tier_sum(col: Column, s: float):
        return (
            qsum(F.when(~f, col).otherwise(F.lit(0.0)), s),
            qsum(F.when(f, col).otherwise(F.lit(0.0)), s),
        )

    sig2w2 = F.col("sigma") * F.col("sigma") * F.col("weight") * F.col("weight")
    aggs = {
        "t": tier_sum(F.col("time"), 1.0),
        "tc": tier_sum(F.col("time_centroid"), scale),
        "iv": tier_sum(F.col("interval"), scale),
        "ex": tier_sum(F.col("exposure"), scale),
        "u": tier_sum(F.col("u"), scale),
        "v": tier_sum(F.col("v"), scale),
        "w": tier_sum(F.col("w"), scale),
        "wt": tier_sum(F.col("weight"), scale),
        "s2w2": tier_sum(sig2w2, scale),
    }
    agg_cols = [F.count(F.lit(1)).alias("n_rows")]
    agg_cols += [
        F.sum(F.when(~f, 1).otherwise(0)).alias("n_unflagged"),
        F.min(f.cast("int")).alias("all_flagged_int"),
    ]
    for k, (su, sf_) in aggs.items():
        agg_cols += [su.alias(f"{k}_u"), sf_.alias(f"{k}_f")]

    agg = (
        vis.withColumn("time_bin", tbin)
        .groupBy("antenna1", "antenna2", "time_bin")
        .agg(*agg_cols)
    )
    allf = F.col("all_flagged_int") == 1
    n_match = F.when(allf, F.col("n_rows")).otherwise(F.col("n_unflagged"))

    def sel(k):
        return _two_tier(F.col(f"{k}_u"), F.col(f"{k}_f"), allf)

    wsum = sel("wt") / F.lit(scale)
    s2w2 = sel("s2w2") / F.lit(scale)
    sigma_out = F.when(wsum == 0, F.sqrt(s2w2)).otherwise(
        F.sqrt(s2w2 / (wsum * wsum))
    )
    return agg.select(
        "antenna1",
        "antenna2",
        "time_bin",
        F.col("n_rows"),
        (sel("t") / n_match).alias("time_avg"),
        (sel("iv") / F.lit(scale)).alias("interval_sum"),
        (sel("tc") / F.lit(scale) / n_match).alias("time_centroid_avg"),
        (sel("ex") / F.lit(scale)).alias("exposure_sum"),
        (sel("u") / F.lit(scale) / n_match).alias("u_avg"),
        (sel("v") / F.lit(scale) / n_match).alias("v_avg"),
        (sel("w") / F.lit(scale) / n_match).alias("w_avg"),
        wsum.alias("weight_sum"),
        sigma_out.alias("sigma_avg"),
        allf.alias("bin_flag_row"),
    )


def time_and_channel_full(
    vis: DataFrame,
    time_bin_secs: float = 604800.0,
    chan_bin_size: int = 2,
    scale: float = 100.0,
) -> DataFrame:
    """Row-chan averaging with the full reference column set — vis,
    weight and SIGMA_SPECTRUM per (baseline, time-bin, chan-bin)
    (reference row-chan averager, time_and_channel_avg.py:414-640):
    sigma_spectrum_out = sqrt(Σσ²w² / (Σw)²) over flag-matching samples,
    under the same two-tier semantics as the vis average."""
    tbin = F.floor(F.col("time") / F.lit(time_bin_secs)).cast("long")
    cbin = (F.col("chan") / F.lit(chan_bin_size)).cast("int")
    flag = F.col("flag") | F.col("flag_row")

    re_u, re_f = _flag_aware_wsum(F.col("vis_re"), F.col("weight"), flag, scale)
    im_u, im_f = _flag_aware_wsum(F.col("vis_im"), F.col("weight"), flag, scale)
    sig2w2 = F.col("sigma") * F.col("sigma") * F.col("weight") * F.col("weight")
    s2_u = qsum(F.when(~flag, sig2w2).otherwise(F.lit(0.0)), scale)
    s2_f = qsum(F.when(flag, sig2w2).otherwise(F.lit(0.0)), scale)
    w_u = qsum(F.when(~flag, F.col("weight")).otherwise(F.lit(0.0)), scale)
    w_f = qsum(F.when(flag, F.col("weight")).otherwise(F.lit(0.0)), scale)

    agg = (
        vis.withColumn("time_bin", tbin)
        .withColumn("chan_bin", cbin)
        .groupBy("antenna1", "antenna2", "time_bin", "chan_bin")
        .agg(
            F.count(F.lit(1)).alias("nsamples"),
            re_u.alias("re_u"), re_f.alias("re_f"),
            im_u.alias("im_u"), im_f.alias("im_f"),
            s2_u.alias("s2_u"), s2_f.alias("s2_f"),
            w_u.alias("w_u"), w_f.alias("w_f"),
            F.min(flag.cast("int")).alias("all_flagged_int"),
        )
    )
    allf = F.col("all_flagged_int") == 1
    wsum = _two_tier(F.col("w_u"), F.col("w_f"), allf) / F.lit(scale)
    s2w2 = _two_tier(F.col("s2_u"), F.col("s2_f"), allf) / F.lit(scale)
    sigma_spec = F.when(wsum == 0, F.sqrt(s2w2)).otherwise(
        F.sqrt(s2w2 / (wsum * wsum))
    )
    return agg.select(
        "antenna1",
        "antenna2",
        "time_bin",
        "chan_bin",
        "nsamples",
        (
            _two_tier(F.col("re_u"), F.col("re_f"), allf)
            / _two_tier(F.col("w_u"), F.col("w_f"), allf)
        ).alias("vis_re_avg"),
        (
            _two_tier(F.col("im_u"), F.col("im_f"), allf)
            / _two_tier(F.col("w_u"), F.col("w_f"), allf)
        ).alias("vis_im_avg"),
        wsum.alias("weight_sum"),
        sigma_spec.alias("sigma_spectrum_avg"),
        allf.alias("bin_flag"),
    )


def time_bin_sequential(vis, time_bin_secs: float = 1_209_600.0):
    """Exact per-baseline sequential time binning — the reference's
    bin-closure rule (time_and_channel_mapping.py:249-316): scan rows in
    time order, close the bin when the next row's time falls more than
    `time_bin_secs` after the bin's FIRST row (bin-start anchored, unlike
    the gap rule — not expressible with window functions; the floor()
    binning in time_and_channel covers the regular-sampling fast path).

    applyInPandas per baseline; emits per-row bin assignments plus bin
    aggregates, ragged cardinality by construction (SURVEY §2.4 BDA row).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    schema = (
        "antenna1 int, antenna2 int, time_bin long, n_rows long, "
        "time_first double, time_last double, vis_re_avg double, weight_sum double"
    )

    def per_baseline(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["time", "row_id"]).reset_index(drop=True)
        bins, bin_idx, bin_start = [], 0, None
        for t in pdf["time"]:
            if bin_start is None:
                bin_start = t
            elif t - bin_start > time_bin_secs:
                bin_idx += 1
                bin_start = t
            bins.append(bin_idx)
        pdf["time_bin"] = bins
        g = pdf.groupby("time_bin")
        out = pd.DataFrame(
            {
                "antenna1": g["antenna1"].first(),
                "antenna2": g["antenna2"].first(),
                "time_bin": g.size().index,
                "n_rows": g.size(),
                "time_first": g["time"].min(),
                "time_last": g["time"].max(),
                "vis_re_avg": g.apply(
                    lambda x: (x.vis_re * x.weight).sum() / x.weight.sum(),
                    include_groups=False,
                ),
                "weight_sum": g["weight"].sum(),
            }
        ).reset_index(drop=True)
        return out

    return (
        vis.select("row_id", "time", "antenna1", "antenna2", "vis_re", "weight")
        .groupBy("antenna1", "antenna2")
        .applyInPandas(per_baseline, schema)
    )
