"""Mergeable quantile sketch (deterministic KLL-style) for the rollup.

Why not ``approx_percentile``: Spark's quantile aggregate re-runs over
raw events per query — its internal state is not exposed as a column.
The day-grain rollup needs per-(dt, dims) quantile STATE that merges
like its HLL user sketches: this module provides it as a binary
column, with data-independent error (no per-property bin edges — the
limitation of the histogram path, rollup.percentile_estimate, which
stays as the oracle-checkable twin).

Algorithm: KLL (Karnin-Lang-Liberty 2016) with two deliberate
simplifications. Uniform per-level capacity ``k`` instead of the
geometrically-shrinking caps (simpler, slightly larger memory at the
same error), and DETERMINISTIC alternating compaction parity instead
of coin flips (stored per level, flipped on every compaction): builds
and merges become bit-reproducible — same value multiset in, same
bytes out — which the differential test harness needs. Compaction of
a level sorts it, promotes every other element of the even-length
prefix to the next level at doubled weight, and leaves the odd
leftover in place, so TOTAL WEIGHT IS PRESERVED EXACTLY (the sketch's
``n`` is exact, like the rollup's count columns).

Rank-error behavior is the standard KLL O(1/k · √log(n/k)) shape;
``k=200`` keeps observed rank error well under 1% at 10⁶ values
(pinned in tests/test_qsketch.py). Size is O(k · log(n/k)) — a few KB
per (dt, dims) cell regardless of data size, which is what makes the
column viable at 100 TB.

Spark integration is Arrow-batched Python (``applyInPandas``) because
the sketch fold is inherently stateful-per-group; everything runs at
ROLLUP grain (one group per (dt, dims) cell, or per dims cell at
query time), never per raw event row — the corpus-sized aggregation
stays JVM-side in build_rollup's groupBy.
"""

from __future__ import annotations

import struct
from typing import Iterable, Optional, Sequence

import numpy as np

__all__ = [
    "QuantileSketch",
    "sketch_day_frame",
    "merged_sketch_frame",
    "sketch_percentile_estimate",
]

DEFAULT_K = 200
_MAGIC = b"QSK1"


class QuantileSketch:
    """Deterministic KLL-style sketch; see module docstring."""

    __slots__ = ("k", "levels", "parity")

    def __init__(self, k: int = DEFAULT_K):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = k
        self.levels: list[np.ndarray] = []
        self.parity: list[int] = []

    # ------------------------------------------------------------ build

    @classmethod
    def from_values(cls, values, k: int = DEFAULT_K) -> "QuantileSketch":
        sk = cls(k)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        # canonicalize -0.0 to +0.0: sorts treat them as equal but
        # their BYTES differ, so mixed zero signs would make the
        # serialized sketch depend on partition order (found by the
        # hypothesis fuzz). +0.0 is the identity on every other float.
        v = v + 0.0
        if v.size:
            # sorted insertion order ⇒ byte-deterministic for a value
            # multiset regardless of scan/partition order
            sk.levels = [np.sort(v)]
            sk.parity = [0]
            sk._compress()
        return sk

    def _ensure_level(self, i: int) -> None:
        while len(self.levels) <= i:
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if buf.size <= self.k:
                i += 1
                continue
            buf = np.sort(buf)
            even = (buf.size // 2) * 2
            p = self.parity[i]
            self.parity[i] ^= 1
            promoted = buf[p:even:2]
            self._ensure_level(i + 1)
            self.levels[i] = buf[even:]  # 0 or 1 leftover element
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], promoted])
            # re-check the next level (it may now exceed k); the loop
            # naturally advances there

    # ------------------------------------------------------------ merge

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        if other.k != self.k:
            raise ValueError(f"k mismatch: {self.k} != {other.k}")
        out = QuantileSketch(self.k)
        n = max(len(self.levels), len(other.levels))
        out._ensure_level(n - 1 if n else 0)
        for i in range(n):
            parts = []
            if i < len(self.levels):
                parts.append(self.levels[i])
            if i < len(other.levels):
                parts.append(other.levels[i])
            out.levels[i] = np.concatenate(parts) if parts else np.empty(0)
            # carry the left operand's parity so a rebuilt-equal sketch
            # merges identically
            out.parity[i] = self.parity[i] if i < len(self.parity) else (
                other.parity[i] if i < len(other.parity) else 0)
        out._compress()
        return out

    @classmethod
    def merge_all(
        cls, sketches: Iterable["QuantileSketch"], k: int = DEFAULT_K
    ) -> "QuantileSketch":
        acc = cls(k)
        for s in sketches:
            acc = acc.merge(s)
        return acc

    # ------------------------------------------------------------ query

    @property
    def total_weight(self) -> int:
        return int(sum(lvl.size << i for i, lvl in enumerate(self.levels)))

    def quantiles(self, qs: Sequence[float]) -> list[Optional[float]]:
        w = self.total_weight
        if w == 0:
            return [None for _ in qs]
        vals = np.concatenate(self.levels)
        wts = np.concatenate([
            np.full(lvl.size, 1 << i, dtype=np.int64)
            for i, lvl in enumerate(self.levels)
        ])
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        out = []
        for q in qs:
            target = q * w
            idx = int(np.searchsorted(cum, target, side="left"))
            idx = min(idx, vals.size - 1)
            out.append(float(vals[idx]))
        return out

    def quantile(self, q: float) -> Optional[float]:
        return self.quantiles([q])[0]

    # ------------------------------------------------------ serialization

    def to_bytes(self) -> bytes:
        # trim trailing empty levels with no parity state: merge() of
        # two empty sketches materializes an empty level 0, which would
        # serialize differently (n_levels=1) than a fresh/from_values
        # empty sketch (n_levels=0) — breaking the "same value
        # multiset, same bytes" contract for all-empty/all-NaN groups
        # reached via different fold shapes. A nonzero parity is real
        # state (it steers the next compaction) and is never trimmed.
        n = len(self.levels)
        while n > 0 and self.levels[n - 1].size == 0 and self.parity[n - 1] == 0:
            n -= 1
        levels, parity = self.levels[:n], self.parity[:n]
        parts = [_MAGIC, struct.pack("<ii", self.k, len(levels))]
        for lvl, p in zip(levels, parity):
            a = np.ascontiguousarray(np.sort(lvl), dtype="<f8")
            parts.append(struct.pack("<ii", a.size, p))
            parts.append(a.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, b: bytes) -> "QuantileSketch":
        if not b or b[:4] != _MAGIC:
            raise ValueError("not a QSK1 sketch")
        k, n_levels = struct.unpack_from("<ii", b, 4)
        sk = cls(k)
        off = 12
        for _ in range(n_levels):
            size, p = struct.unpack_from("<ii", b, off)
            off += 8
            # + 0.0: canonicalize -0.0 in foreign/legacy bytes so a
            # deserialize→merge→serialize cycle stays deterministic
            sk.levels.append(
                np.frombuffer(b, dtype="<f8", count=size, offset=off) + 0.0)
            sk.parity.append(p)
            off += size * 8
        return sk


# ----------------------------------------------------------- Spark plumbing


def qsk_col(prop: str) -> str:
    return f"{prop}_qsk"


def _out_ddl(df, keys: Sequence[str], props: Sequence[str]) -> str:
    by_name = {f.name: f for f in df.schema.fields}
    fields = [
        f"`{k}` {by_name[k].dataType.simpleString()}" for k in keys
    ] + [f"`{qsk_col(p)}` binary" for p in props]
    return ", ".join(fields)


def sketch_day_frame(
    keyed, keys: Sequence[str], props: Sequence[str], k: int = DEFAULT_K
):
    """(keys..., {prop}_qsk binary ...) — one sketch per key cell per
    property, built with applyInPandas over the SAME keys as
    build_rollup's JVM aggregation (one extra key-hash shuffle; the
    join back is co-partitioned on identical keys)."""
    out_ddl = _out_ddl(keyed, keys, props)

    def build(pdf):
        import pandas as pd

        row = {c: [pdf[c].iloc[0]] for c in keys}
        for p in props:
            row[qsk_col(p)] = [
                QuantileSketch.from_values(
                    pdf[p].to_numpy(dtype="float64"), k).to_bytes()
            ]
        return pd.DataFrame(row)

    return keyed.groupBy(*keys).applyInPandas(build, schema=out_ddl)


def merged_sketch_frame(
    df, keys: Sequence[str], props: Sequence[str], order_cols: Sequence[str] = ()
):
    """Re-merge sketch columns down to ``keys`` grain (dims subset /
    coarser bucket). ``order_cols``: columns establishing a
    deterministic fold order within each group (e.g. the dt column);
    without them the fold orders by the sketch bytes themselves —
    merge results are byte-reproducible either way."""
    cols = list(keys) + [qsk_col(p) for p in props]
    out_ddl = _out_ddl(df, keys, props)
    oc = [c for c in order_cols if c not in keys]

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            oc if oc else [qsk_col(props[0])], kind="stable")
        row = {c: [pdf[c].iloc[0]] for c in keys}
        for p in props:
            sketches = [
                QuantileSketch.from_bytes(b)
                for b in pdf[qsk_col(p)] if b is not None
            ]
            merged = (
                QuantileSketch.merge_all(sketches, sketches[0].k)
                if sketches else QuantileSketch()
            )
            row[qsk_col(p)] = [merged.to_bytes()]
        return pd.DataFrame(row)

    sel = df.select(*cols, *oc) if oc else df.select(*cols)
    return sel.groupBy(*keys).applyInPandas(fold, schema=out_ddl)


def sketch_percentile_estimate(
    rollup,
    spec,
    prop: str,
    qs: Sequence[float],
    dims: Sequence[str] = (),
):
    """Quantile estimates from the rollup's sketch column — the
    data-independent-error twin of rollup.percentile_estimate (no DDL
    bin edges to size). Output (*dims, n, p{q}_est ...), same alias
    protocol as the histogram path; n is EXACT (compaction preserves
    total weight). Work happens on the rollup frame (cells), never raw
    events; the per-group fold is Arrow-batched Python over at most
    #cells rows."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..rollup import ROLLUP_DT_COL

    merged = merged_sketch_frame(
        rollup, list(dims), [prop], order_cols=(ROLLUP_DT_COL,))

    fields = [T.StructField("n", T.LongType())] + [
        T.StructField(f"p{int(round(q * 100))}_est", T.DoubleType())
        for q in qs
    ]
    out_t = T.StructType(fields)

    @F.pandas_udf(out_t)
    def est(col):
        import pandas as pd

        rows = []
        for b in col:
            if b is None:
                rows.append((0, *[None] * len(qs)))
                continue
            sk = QuantileSketch.from_bytes(b)
            rows.append((sk.total_weight, *sk.quantiles(qs)))
        return pd.DataFrame(rows, columns=[f.name for f in fields])

    packed = merged.withColumn("__e", est(F.col(qsk_col(prop))))
    return packed.select(
        *dims, F.col("__e.n").alias("n"),
        *[F.col(f"__e.{f.name}").alias(f.name) for f in fields[1:]],
    )
