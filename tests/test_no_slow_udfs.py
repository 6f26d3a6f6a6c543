"""Vectorized-only enforcement (BASELINE.json input_hint: "no per-row
Python"; SURVEY.md §7 risk (d)): the data plane must use pandas/Arrow UDFs
(pandas_udf, mapInPandas, applyInPandas) or native Column expressions —
never row-at-a-time F.udf / @udf / RDD.map."""

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "dynamo2es_lambda_spark")

FORBIDDEN = [
    re.compile(r"\bF\.udf\("),
    re.compile(r"@udf\b"),
    re.compile(r"\budf\(\s*lambda"),
    re.compile(r"\.rdd\b"),
    re.compile(r"\.map\(\s*lambda.*\)\s*\.toDF"),
]


def test_no_row_at_a_time_python():
    offenders = []
    for root, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            src = open(path).read()
            for pat in FORBIDDEN:
                for m in pat.finditer(src):
                    line = src[: m.start()].count("\n") + 1
                    offenders.append(f"{path}:{line} matches {pat.pattern}")
    assert not offenders, "\n".join(offenders)
