"""spark-submit entrypoint (BASELINE.json:6: "packaged for
spark-submit --py-files").

    spark-submit --py-files feat_spark.zip -m feat_spark ...   # or:
    spark-submit --py-files feat_spark.zip path/to/repo/feat_spark/__main__.py \
        featurize --input /data/transcripts --attrs /data/conv_attrs \
        --output /data/features --manifest /data/manifest \
        --gap "30 minutes" --buckets 256

Sub-commands:
  featurize  run the point-in-time feature pipeline with per-bucket
             watermark checkpointing (resumable: re-running after an
             interruption completes only the missing buckets) and
             per-partition lineage printed as JSON lines
  synth      materialize deterministic synthetic transcript tables
  bench      run the benchmark and print its JSON line

Build the zip with:  python -m feat_spark zip  (writes feat_spark.zip)
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _featurize(args) -> None:
    from feat_spark.operators.asof import asof_join
    from feat_spark.operators.sessionize import sessionize
    from feat_spark.operators.windows import (
        cumulative_features, lag_lead_features, with_stable_order,
    )
    from feat_spark.functions.hashing import spark_leaf_hash
    from feat_spark.plans.checkpoint import CheckpointManifest, run_with_resume
    from feat_spark.plans.lineage import partition_lineage
    from feat_spark.session import get_spark
    from feat_spark.sources.io import read_table

    spark = get_spark(master=None if args.cluster else args.master)

    def load(path_or_table):
        if "/" in path_or_table:
            return spark.read.parquet(path_or_table)
        return read_table(spark, *path_or_table.rsplit(".", 1))

    turns = load(args.input)
    attrs = load(args.attrs)

    if args.spec:
        from feat_spark.plans.features import (
            AsofSource, build_feature_matrix, spec_from_dict,
        )

        # --gap belongs to the built-in pipeline; with --spec the gap
        # lives in the spec's session_gap. A silently-dead flag is the
        # typo failure mode spec_from_dict exists to prevent.
        if args.gap is not None:
            raise SystemExit(
                "--gap is ignored when --spec is given: set session_gap "
                "inside the spec JSON instead"
            )
        with open(args.spec) as fh:
            spec_dict = json.load(fh)
        src = AsofSource(
            attrs,
            value_cols=[c for c in attrs.columns if c not in ("conv_id", "ts")],
            strategy=args.asof_strategy,
        )
        spec = spec_from_dict(spec_dict, asof_sources=[src])

        def pipeline(df):
            feats = df.withColumn(
                "payload_hash",
                spark_leaf_hash(F.concat_ws("\x1f", "role", "tool", "text")),
            )
            return build_feature_matrix(feats, spec)
    else:
        def pipeline(df):
            feats = df.withColumn(
                "payload_hash",
                spark_leaf_hash(F.concat_ws("\x1f", "role", "tool", "text")),
            )
            feats = asof_join(
                feats, attrs, on="conv_id", left_ts="ts", right_ts="ts",
                value_cols=[c for c in attrs.columns if c not in ("conv_id", "ts")],
                strategy=args.asof_strategy,
            )
            feats = with_stable_order(feats)
            feats = lag_lead_features(feats, cols=["payload_hash"], offsets=[1],
                                      leads=False, tiebreak=("ts",))
            feats = cumulative_features(feats, {"payload_hash": ["count"]},
                                        tiebreak=("ts",))
            return sessionize(feats, gap=args.gap or "30 minutes",
                              order_col="turn_idx", tiebreak=("ts",))

    manifest = CheckpointManifest(args.manifest)
    metrics = run_with_resume(
        spark, turns, pipeline, manifest, args.output, n_buckets=args.buckets
    )
    print(json.dumps({"run": metrics}))
    lineage = partition_lineage(
        spark.read.parquet(args.output), null_cols=("tool",)
    )
    for row in lineage.toJSON().collect():
        print(row)


def _synth(args) -> None:
    from feat_spark.sources.synth import write_synth_parquet

    write_synth_parquet(args.out, n_convs=args.convs, mean_turns=args.mean_turns)
    print(json.dumps({"written": args.out, "convs": args.convs}))


def _zip(_args) -> None:
    import os
    import shutil

    pkg = os.path.dirname(os.path.abspath(__file__))
    out = shutil.make_archive("feat_spark", "zip", os.path.dirname(pkg), "feat_spark")
    print(json.dumps({"py_files": out}))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="feat_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("featurize")
    f.add_argument("--input", required=True, help="parquet dir or catalog.db.table")
    f.add_argument("--attrs", required=True)
    f.add_argument("--output", required=True)
    f.add_argument("--manifest", required=True)
    f.add_argument("--gap", default=None,
                   help="session gap for the built-in pipeline "
                        "(default '30 minutes'; invalid with --spec)")
    f.add_argument("--buckets", type=int, default=256)
    f.add_argument("--asof-strategy", default="union_window",
                   choices=["union_window", "broadcast", "skew_aware", "cogroup_pandas"])
    f.add_argument("--spec", default=None,
                   help="JSON feature-matrix spec (plans/features.py "
                        "spec_from_dict keys); replaces the built-in "
                        "lag/cumulative/session pipeline")
    f.add_argument("--master", default=None, help="local override; omit under spark-submit")
    f.add_argument("--cluster", action="store_true",
                   help="never set master (spark-submit provides it)")
    f.set_defaults(fn=_featurize)

    s = sub.add_parser("synth")
    s.add_argument("--out", required=True)
    s.add_argument("--convs", type=int, default=1000)
    s.add_argument("--mean-turns", type=int, default=20)
    s.set_defaults(fn=_synth)

    z = sub.add_parser("zip")
    z.set_defaults(fn=_zip)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
