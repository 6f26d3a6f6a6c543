"""Sequence packing — grouping documents into fixed-token-budget training
sequences (the "pack short documents into one context window" step every
LLM pre-training pipeline runs between filtering and tokenization).

Packing is inherently sequential, so it is made distributed the standard
way: documents hash into independent PACK GROUPS (md5-keyed, so the
grouping is reproducible from SQL and identical on any cluster), and
within a group a deterministic next-fit pass (docs in doc_id order; open
a new sequence when the budget would overflow) assigns sequence ids.
Per-group packing is what production pipelines do — global bin packing
is NP-hard and adds nothing at billions of docs.

Scale shape: ONE shuffle keyed by (group) via applyInPandas; per-group
state is a running counter; sequence ids are ``group * 2^40 + local``
so they never collide across groups. A document larger than the budget
gets a sequence of its own (flagged ``oversize``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import EngineError
from ..functions.analysis import spark_tokens_expr

_GROUP_SHIFT = 40  # seq_id = group << 40 | local sequence index


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_groups: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tok, group, seq_id, oversize): every input doc
    assigned to a training sequence whose member token counts sum to
    ≤ ``budget`` (next-fit within its md5 pack group, doc_id order).

    Deterministic: group = md5-bucket of doc_id, order = doc_id string
    sort — both pure functions of the data, so re-runs and different
    cluster sizes produce the identical packing."""
    if budget < 1:
        raise EngineError("budget must be >= 1 token")
    if n_groups < 1:
        raise EngineError("n_groups must be >= 1")
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.expr(
            f"cast(size({spark_tokens_expr(text_col)}) as bigint)"
        ).alias("n_tok"),
        (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16, 10,
            ).cast("long")
            % F.lit(int(n_groups))
        ).alias("group"),
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, overs = [], []
        seq, acc = 0, 0
        for n in pdf["n_tok"]:
            n = int(n)
            if n > budget:
                # oversize doc: its own sequence, never co-packed
                if acc > 0:
                    seq += 1
                seqs.append(seq)
                overs.append(True)
                seq += 1
                acc = 0
                continue
            if acc + n > budget:
                seq += 1
                acc = 0
            seqs.append(seq)
            overs.append(False)
            acc += n
        pdf["seq_id"] = [(g << _GROUP_SHIFT) | s for s in seqs]
        pdf["oversize"] = overs
        return pdf[["doc_id", "n_tok", "group", "seq_id", "oversize"]]

    return base.groupBy("group").applyInPandas(
        pack,
        schema="doc_id string, n_tok long, group long, seq_id long, "
               "oversize boolean",
    )
