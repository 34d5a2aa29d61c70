"""Adaptive micro-batch budget (reference T2 + A3).

The reference accumulates a per-row ``size_hint_bytes`` (table_row.rs:
247-384) and cuts batches at ``max_size``/``max_fill_ms`` (its batching
config). Spark's equivalent knob is ``maxFilesPerTrigger`` — but it is a
STREAM-START option, so the adaptive loop is restart-scoped:

* every micro-batch reports (rows, estimated bytes, files-per-trigger in
  effect) to :class:`BatchBudget`, which keeps an exponentially weighted
  bytes-per-file estimate in a durable JSON file;
* ``recommend()`` returns the file cap whose expected bytes fit the
  target budget; the pipeline applies it on its next start.

Row-size estimation mirrors the reference's size hint: fixed width per
primitive type + measured mean length for strings/binary (ONE extra
JVM-side aggregate over the batch, no Python row loop).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fixed per-cell width by primitive type (table_row.rs:247-384 hint model)
_FIXED = {
    T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4,
    T.LongType: 8, T.FloatType: 4, T.DoubleType: 8, T.DateType: 4,
    T.TimestampType: 8, T.TimestampNTZType: 8,
}


def estimate_batch_bytes(
    df: DataFrame, with_files: bool = False
) -> tuple[int, int] | tuple[int, int, int]:
    """(rows, estimated bytes[, input files]) for a micro-batch — fixed
    widths per primitive column + measured mean lengths for string/binary
    columns, in one aggregate pass. ``with_files`` adds a distinct
    ``input_file_name()`` count to the SAME pass (the actual file count of
    a file-source micro-batch; 0 for non-file sources, whose rows carry an
    empty name)."""
    fixed = 0
    var_cols = []
    for f in df.schema.fields:
        w = _FIXED.get(type(f.dataType))
        if w is not None:
            fixed += w
        elif isinstance(f.dataType, (T.StringType, T.BinaryType)):
            var_cols.append(f.name)
        else:
            fixed += 16  # decimals/structs/arrays: coarse hint
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.avg(F.length(F.col(c).cast("string"))).alias(f"__l_{i}")
        for i, c in enumerate(var_cols)
    ]
    if with_files:
        # project first: input_file_name() is non-deterministic and may
        # not appear directly inside an aggregate function
        df = df.withColumn("__fname", F.input_file_name())
        aggs.append(
            F.count_distinct(
                F.nullif(F.col("__fname"), F.lit(""))
            ).alias("__files")
        )
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    per_row = fixed + sum(
        (row[f"__l_{i}"] or 0.0) for i in range(len(var_cols))
    )
    if with_files:
        return int(n), int(n * per_row), int(row["__files"])
    return int(n), int(n * per_row)


class BatchBudget:
    """Durable bytes-per-file estimator → maxFilesPerTrigger recommender."""

    def __init__(self, path: str, target_bytes: int = 128 << 20,
                 alpha: float = 0.3):
        self.path = path
        self.target_bytes = target_bytes
        self.alpha = alpha
        self._state = {"bytes_per_file": None, "observations": 0}
        try:
            with open(path) as f:
                self._state = json.load(f)
        except FileNotFoundError:
            pass

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(self._state, f)
        os.replace(tmp, self.path)

    def observe(self, batch_bytes: int, files_in_trigger: int) -> None:
        """Record one micro-batch's estimated bytes under the file cap in
        effect (files_in_trigger = the maxFilesPerTrigger the stream ran
        with; the LAST trigger of a drain may carry fewer files — the EW
        average absorbs that skew)."""
        if files_in_trigger <= 0:
            return
        bpf = batch_bytes / files_in_trigger
        cur = self._state["bytes_per_file"]
        self._state["bytes_per_file"] = (
            bpf if cur is None else (1 - self.alpha) * cur + self.alpha * bpf
        )
        self._state["observations"] += 1
        self._save()

    def recommend(self, default: int | None = None) -> int | None:
        """File cap whose expected bytes fit the target (≥1); ``default``
        until the first observation lands."""
        bpf = self._state["bytes_per_file"]
        if not bpf:
            return default
        return max(1, int(self.target_bytes / bpf))
