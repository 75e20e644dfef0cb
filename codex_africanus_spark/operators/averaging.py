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
