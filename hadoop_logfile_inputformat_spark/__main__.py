"""CLI parity with the reference's two driver programs.

- ``sample``: Sample.java:45-62's flags (-i input glob, -o output dir,
  -p first-line pattern, -s fraction) over the ``logfile`` source.
- ``verify``: Test.java:76-155's pipeline — generate a golden-count
  corpus into a work dir, read plain + gzip through the source, print
  the SUCCESS/FAILURE matrix; exit 1 on any mismatch.

Usage::

    python -m hadoop_logfile_inputformat_spark sample \\
        -i '/logs/*.log' -o /tmp/out -p '^\\d{4}-.*' -s 0.01
    python -m hadoop_logfile_inputformat_spark verify -d /tmp/work
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="hadoop_logfile_inputformat_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("sample", help="sample records to a text file")
    sp.add_argument("-i", "--input", required=True, help="input path/glob")
    sp.add_argument("-o", "--output", required=True, help="output directory")
    sp.add_argument("-p", "--pattern", required=True, help="first-line regex")
    sp.add_argument("-s", "--sample-fraction", type=float, default=0.01)
    sp.add_argument("--seed", type=int, default=None)

    vp = sub.add_parser("verify", help="golden-count verification matrix")
    vp.add_argument("-d", "--work-dir", required=True)

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from hadoop_logfile_inputformat_spark.operators import logparity
    from hadoop_logfile_inputformat_spark.session import get_spark

    # getOrCreate may hand us a caller's session (embedding, tests) —
    # only stop what we actually created.  getActiveSession is
    # thread-local, so also probe the process-wide default session (a
    # caller may have built theirs on another thread).
    borrowed = (
        SparkSession.getActiveSession() is not None
        or getattr(SparkSession, "_instantiatedSession", None) is not None
    )
    spark = get_spark(app_name=f"logrecords-{args.cmd}")
    try:
        if args.cmd == "sample":
            logparity.sample_logs(
                spark,
                input_glob=args.input,
                output_dir=args.output,
                pattern=args.pattern,
                fraction=args.sample_fraction,
                seed=args.seed,
            )
            return 0
        rows = logparity.verify_counts(spark, args.work_dir).collect()
        ok = True
        for r in rows:
            status = "SUCCESS" if r.success else "FAILURE"
            ok = ok and r.success
            print(
                f"{status}  {r.metric}: expected={r.expected}"
                f" log={r.actual_log} gz={r.actual_gz}"
            )
        return 0 if ok else 1
    finally:
        if not borrowed:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
