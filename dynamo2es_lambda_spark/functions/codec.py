"""Posting-list compression: delta + varbyte, fixed-size blocks w/ block-max.

The reference stores documents in Elasticsearch, whose Lucene segments keep
delta-encoded, block-compressed postings; the engine builds the same structure
from scratch (BASELINE.json north_star: "delta-encoded, varbyte-compressed
docID+tf blocks with block-max metadata").

All encode/decode paths are numpy-vectorized (no per-element Python loops —
the only loops are over the ≤10 varbyte byte-groups).

Wire format per block (BLOCK_SIZE docs max):
  doc_bytes: varbyte(gaps) where gaps[0] = doc_ids[0] - (prev block's last + 1)
             … blocks are independent: gaps[0] = doc_ids[0] - base, base
             passed explicitly (we store absolute first/last per block, so
             gaps[0] = doc_ids[0] - doc_first → 0; decode uses doc_first).
  tf_bytes:  varbyte(tf - 1)   (tf >= 1 always)
  dl_bytes:  varbyte(dl - 1)   (doclen >= 1 if the doc has this term) — the
             Lucene-norms analog inlined into the block so query scoring
             never joins doc_stats (a per-query shuffle avoided).
Block metadata (stored as plain columns → parquet min/max pruning works):
  n_docs, doc_first, doc_last, max_tf, min_dl
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """LSB-first varbyte (protobuf varint layout), vectorized.

    values: non-negative integers (any int dtype).
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value
    ngroups = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        ngroups += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    starts = np.concatenate(([0], np.cumsum(ngroups)[:-1]))
    out = np.zeros(int(ngroups.sum()), dtype=np.uint8)
    for k in range(int(ngroups.max())):
        mask = ngroups > k
        pos = starts[mask] + k
        grp = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (ngroups[mask] - 1 > k).astype(np.uint8) << 7
        out[pos] = grp | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode` → uint64 array. Vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # value index of each byte = count of terminated values strictly before it
    vidx = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    nvals = int(is_last.sum())
    # position of byte within its value
    value_starts = np.concatenate(([0], np.nonzero(is_last)[0][:-1] + 1))
    k = np.arange(b.size, dtype=np.int64) - value_starts[vidx]
    vals = np.zeros(nvals, dtype=np.uint64)
    payload = (b & 0x7F).astype(np.uint64)
    for g in range(int(k.max()) + 1):
        sel = k == g
        vals[vidx[sel]] |= payload[sel] << np.uint64(7 * g)
    return vals


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray,
                  dls: np.ndarray) -> list[dict]:
    """Split one term-segment posting list (sorted by doc_id asc) into blocks.

    Returns a list of block dicts with keys: block_id, n_docs, doc_first,
    doc_last, max_tf, min_dl, doc_bytes, tf_bytes, dl_bytes.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    n = doc_ids.size
    blocks: list[dict] = []
    for bi, lo in enumerate(range(0, n, BLOCK_SIZE)):
        hi = min(lo + BLOCK_SIZE, n)
        ids = doc_ids[lo:hi]
        gaps = np.empty(hi - lo, dtype=np.uint64)
        gaps[0] = 0  # first doc stored absolutely in doc_first
        if hi - lo > 1:
            gaps[1:] = np.diff(ids).astype(np.uint64)
        blocks.append(
            {
                "block_id": bi,
                "n_docs": int(hi - lo),
                "doc_first": int(ids[0]),
                "doc_last": int(ids[-1]),
                "max_tf": int(tfs[lo:hi].max()),
                "min_dl": int(dls[lo:hi].min()),
                "doc_bytes": varbyte_encode(gaps),
                "tf_bytes": varbyte_encode(tfs[lo:hi] - 1),
                "dl_bytes": varbyte_encode(dls[lo:hi] - 1),
            }
        )
    return blocks


def decode_block(
    doc_first: int, doc_bytes: bytes, tf_bytes: bytes, dl_bytes: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Block → (doc_ids int64 asc, tfs int64, dls int64)."""
    gaps = varbyte_decode(doc_bytes).astype(np.int64)
    doc_ids = np.cumsum(gaps) + np.int64(doc_first)
    tfs = varbyte_decode(tf_bytes).astype(np.int64) + 1
    dls = varbyte_decode(dl_bytes).astype(np.int64) + 1
    return doc_ids, tfs, dls
