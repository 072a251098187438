"""CLI — dataset creation wizard parity (reference: pandasai/cli/main.py:
22-134, `pandasai dataset create` + `login`).

Non-interactive flags replace the reference's prompt loop so the command
is scriptable; run ``python -m pandas_ai_spark.cli dataset create ...``.
"""

from __future__ import annotations

import argparse
import sys


def _cmd_dataset_create(args) -> int:
    from . import create, read_csv, read_parquet

    if args.file.endswith(".csv"):
        df = read_csv(args.file)
    elif args.file.endswith(".parquet"):
        df = read_parquet(args.file)
    else:
        print(f"Unsupported file type: {args.file}", file=sys.stderr)
        return 2
    cols = None
    if args.columns:
        cols = [{"name": c} for c in args.columns.split(",")]
    out = create(args.path, df=df, description=args.description,
                 columns=cols)
    print(f"Dataset created: {args.path} ({out.rows_count} rows)")
    return 0


def _cmd_login(args) -> int:
    # The reference stores an API key for its SaaS; this engine is
    # self-hosted — keep the command for CLI compatibility.
    print("pandas_ai_spark is self-hosted; no login required.")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pandas_ai_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ds = sub.add_parser("dataset", help="dataset commands")
    ds_sub = ds.add_subparsers(dest="dataset_cmd", required=True)
    c = ds_sub.add_parser("create", help="create a dataset from a file")
    c.add_argument("--path", required=True, help="org/name dataset path")
    c.add_argument("--file", required=True, help="source csv/parquet file")
    c.add_argument("--description", default=None)
    c.add_argument("--columns", default=None,
                   help="comma-separated column subset")
    c.set_defaults(fn=_cmd_dataset_create)

    lg = sub.add_parser("login")
    lg.set_defaults(fn=_cmd_login)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
