"""Command-line predict entry point — the analogue of the reference's
primary user surface, ``python -m africanus.rime.examples.predict``
(/root/reference/africanus/rime/examples/predict.py:528-586: parse a sky
model, predict per-source coherencies, reduce over sources, optionally
apply gains, assign MODEL_DATA and write back).

Usage::

    python -m codex_africanus_spark predict \
        --sf-dir /root/testdata/sf0.001 \
        --spec "(Kpq, Bpq, Epq)" \
        --output /tmp/model_data \
        [--sky-model catalogue.txt] [--apply-gains] [--cpus 8]

The sky model defaults to the derived catalogue; a WSClean text file
(``Format = Name, Type, Ra, Dec, I, ...``) is accepted via --sky-model,
in which case (l, m, n) come from the compiler's LMTransformer — radec
plus the --phase-centre argument, the CLI twin of the reference's
parse_sky_model + radec→lm path (predict.py:246-348).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="codex_africanus_spark")
    sub = p.add_subparsers(dest="command", required=True)
    pr = sub.add_parser("predict", help="model-visibility prediction")
    pr.add_argument("--sf-dir", required=True, help="testdata scale-factor directory")
    pr.add_argument("--spec", default="(Kpq, Bpq)", help="RIME specification string")
    pr.add_argument("--sky-model", default=None,
                    help="WSClean text catalogue (default: derived source table)")
    pr.add_argument("--phase-centre", nargs=2, type=float, default=(0.0, -0.68),
                    metavar=("RA0", "DEC0"),
                    help="phase centre radians (used with --sky-model)")
    pr.add_argument("--apply-gains", action="store_true",
                    help="corrupt the model with the diagonal gain table")
    pr.add_argument("--output", required=True, help="parquet output path")
    pr.add_argument("--cpus", default=None, help="local[N] parallelism")
    return p


def predict_main(args) -> int:
    from pyspark.sql import functions as F

    from codex_africanus_spark.operators import predict as predict_op
    from codex_africanus_spark.plans import rime as rime_plan
    from codex_africanus_spark.session import get_spark
    from codex_africanus_spark.sources import tpch_ms
    from codex_africanus_spark.sources.sink import write_model_data

    spark = get_spark("codex-africanus-spark-predict", cpus=args.cpus)
    vis = tpch_ms.vis_table(spark, args.sf_dir)

    if args.sky_model:
        from codex_africanus_spark.sources.wsclean import read_wsclean_model

        ra0, dec0 = args.phase_centre
        src = (
            read_wsclean_model(spark, args.sky_model)
            .select(
                F.col("name").alias("source_name"),
                F.col("ra"), F.col("dec"), F.col("flux_i"),
                F.coalesce(
                    F.col("spectral_index").getItem(0), F.lit(0.0)
                ).alias("spi"),
                F.col("ref_freq"),
            )
            .withColumn("ra0", F.lit(ra0))
            .withColumn("dec0", F.lit(dec0))
        )
        # (l, m, n) derived by the compiler's LMTransformer
    else:
        src = tpch_ms.source_table(spark, args.sf_dir)

    model = rime_plan.rime(args.spec, vis, src)
    if args.apply_gains:
        gains = tpch_ms.gains_table(spark)
        model = predict_op.apply_gains(
            model.withColumnRenamed("vis_re", "model_re")
            .withColumnRenamed("vis_im", "model_im"),
            gains,
        )

    write_model_data(
        model, args.output,
        sort_within=["row_id", "antenna1", "antenna2", "chan"],
    )
    n = spark.read.parquet(args.output).count()
    print(f"wrote {n} MODEL_DATA rows to {args.output}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "predict":
        return predict_main(args)
    return 2  # pragma: no cover


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
