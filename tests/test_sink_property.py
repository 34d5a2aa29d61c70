"""Model-based randomized check of the bucket-manifest state sink: a
seeded random op sequence (insert/update/delete events, truncate, replay,
compaction, manifest expiry, sink-object restart) drives
ParquetCurrentStateSink AND a driver-side LWW dict model; after every
step the stored table must equal the model exactly.

This is the destination analog of the reference's randomized pipeline
tests (crates/etl/tests/pipeline.rs matrix style): the bucket layout adds
real failure surface — manifest carry-forward, touched-bucket pruning,
version GC, schema anchoring — that deterministic unit tests cover only
pointwise."""

from __future__ import annotations

import os
import random

import pytest

from etl_spark.maintenance import expire_versions
from etl_spark.streaming.sinks import ParquetCurrentStateSink

PAYLOAD = "op string, commit_lsn long, tx_ordinal long, pk long, val string"


def _batch(spark, events):
    from etl_spark.envelope import with_sequence

    return with_sequence(
        spark.createDataFrame(
            [(op, lsn, i, pk, val) for i, (op, lsn, pk, val) in enumerate(events)],
            PAYLOAD,
        )
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_sink_matches_lww_model_under_random_ops(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"wh{seed}")
    sink = ParquetCurrentStateSink(root, keys=["pk"], spark=spark, n_buckets=8)

    # snapshot: 12 seed rows
    snap = [(pk, f"s{pk}") for pk in range(12)]
    sink.write_snapshot("t", spark.createDataFrame(snap, "pk long, val string"))
    model = {pk: v for pk, v in snap}

    lsn = 10
    batch_id = 0
    applied: list[tuple[int, list]] = []  # (batch_id, events) for replay
    for step in range(10):
        action = rng.choices(
            ["batch", "truncate", "replay", "compact", "expire", "restart"],
            weights=[6, 1, 2, 1, 1, 2],
        )[0]
        if action == "batch" or not applied:
            events = []
            for _ in range(rng.randint(1, 6)):
                pk = rng.randint(0, 19)
                kind = rng.choice(["INSERT", "UPDATE", "DELETE"])
                val = f"v{lsn}_{pk}"
                events.append((kind, lsn, pk, None if kind == "DELETE" else val))
                if kind == "DELETE":
                    model.pop(pk, None)
                else:
                    model[pk] = val
            lsn += 1
            batch_id += 1
            sink.write_changes("t", _batch(spark, events), batch_id)
            applied.append((batch_id, events))
        elif action == "truncate":
            sink.truncate("t")
            model.clear()
            applied.clear()
        elif action == "replay":
            # at-least-once redelivery of the LAST batch under its own id:
            # the applied-batches fast path must make it a no-op
            bid, events = applied[-1]
            sink.write_changes("t", _batch(spark, events), bid)
        elif action == "compact":
            sink.compact("t")
            assert sink.live_dirs("t") == {f"v{sink._current_version('t')}"}
        elif action == "expire":
            removed = expire_versions(os.path.join(root, "t"), keep=2)
            for d in removed:  # never a dir the live manifest references
                assert d not in sink.live_dirs("t")
        elif action == "restart":
            sink = ParquetCurrentStateSink(root, keys=["pk"], spark=spark)

        got = {
            r.pk: r.val
            for r in sink.read("t").select("pk", "val").collect()
        }
        assert got == model, f"seed={seed} step={step} action={action}"
