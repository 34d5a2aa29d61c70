"""Partitioned-table routing: publish-via-partition-root semantics.

Mirrors the reference's handling of Postgres partitioned tables
(crates/etl/src/replication/table_sync/copy.rs:100-110 — ``CopyPartition``
separates ``source_table_id`` (the physical leaf scanned) from
``filter_table_id`` (the published table whose row filter applies);
pg_get_publication_tables resolution crates/etl/src/postgres/client/
raw.rs:567-575; behavior matrix crates/etl/tests/
pipeline_with_partitioned_table.rs):

- ``publish_via_partition_root=true``: change events from leaf partitions
  are addressed to the HIGHEST PUBLISHED ANCESTOR (top root, or a middle
  subtree root when that is what the publication names).
- ``publish_via_partition_root=false``: each published leaf keeps its own
  identity.
- Row filters belong to the PUBLISHED table and apply to every leaf routed
  to it (``filter_table_id``, nested_..._respects_row_filter tests).
- TRUNCATE of the parent emits for the routed table; TRUNCATE of a child
  alone does NOT emit (parent_table_truncate_does_emit_truncate_event /
  child_table_truncate_does_not_emit_truncate_event).
- Detached/unpublished partitions stop replicating (partition_detach_...
  tests) — events from tables with no published ancestor are purged.

Scale shape: the partition tree is catalog metadata (thousands of entries,
driver-side), so routing compiles to a broadcast map lookup inside the
scan stage — zero shuffles added; the destination table becomes the
routing key downstream exactly as a non-partitioned table would be.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def published_destination(
    tree: dict[str, str],
    published: set[str],
    table: str,
    via_partition_root: bool = True,
) -> str | None:
    """Destination table id for events sourced from ``table``.

    ``tree`` maps child → parent. Returns the highest published ancestor
    when ``via_partition_root``; the table itself when it is published
    directly; ``None`` when nothing in the ancestry is published (the
    event must be purged — detached or unpublished partition).
    """
    if not via_partition_root:
        return table if table in published else None
    # walk up; remember the HIGHEST published node seen (top-root priority,
    # matching pg_get_publication_tables' subtree-root resolution)
    dest = table if table in published else None
    node = table
    seen = {table}
    while node in tree:
        node = tree[node]
        if node in seen:  # defensive: corrupt tree with a cycle
            break
        seen.add(node)
        if node in published:
            dest = node
    return dest


def routing_map(
    tree: dict[str, str],
    published: set[str],
    via_partition_root: bool = True,
    detached: set[str] | None = None,
) -> dict[str, str]:
    """Materialize source-table → destination-table for every table the
    catalog knows (tree nodes + published tables). ``detached`` leaves are
    excluded entirely — their events stop replicating at detach time."""
    detached = detached or set()
    out: dict[str, str] = {}
    for t in set(chain(tree.keys(), tree.values(), published)):
        if t in detached:
            continue
        dest = published_destination(tree, published, t, via_partition_root)
        if dest is not None:
            out[t] = dest
    return out


def _map_expr(mapping: dict[str, str]) -> Column:
    pairs = [F.lit(x) for kv in mapping.items() for x in kv]
    return F.create_map(*pairs)


def route_events(
    df: DataFrame,
    tree: dict[str, str],
    published: set[str],
    via_partition_root: bool = True,
    detached: set[str] | None = None,
    row_filters: dict[str, str] | None = None,
    delete_row_filters: dict[str, str] | None = None,
    table_col: str = "table",
    op_col: str = "op",
) -> DataFrame:
    """Apply partition routing to an envelope stream.

    1. rewrite ``table_col`` to the published destination (broadcast map
       lookup, scan-stage); purge events with no published ancestor;
    2. scope TRUNCATEs: only a TRUNCATE arriving ON a published table
       survives (child truncates vanish — they are partition maintenance,
       not logical truncation of the routed table);
    3. apply each destination's row filter (``filter_table_id``
       semantics: the PUBLISHED table's filter, applied post-routing so it
       covers every leaf routed into it). Filters are SQL boolean
       expressions; control events (BEGIN/COMMIT/RELATION/TRUNCATE) pass.

    DELETE semantics: a DELETE carries no after image, so evaluating the
    after-image predicate would yield NULL and silently drop the event —
    leaving a stale row at the destination forever. The reference filters
    deletes source-side against the OLD image where it is in scope
    (crates/etl/src/replication/transaction.rs:51-55,654-690). Here, the
    caller may supply ``delete_row_filters`` — the same predicate rewritten
    over before-image columns — which is applied to DELETEs; when no
    before-image predicate is given for a destination, its DELETEs PASS
    THROUGH keyed by identity: deleting a never-replicated row is a
    destination no-op, whereas dropping the event corrupts state.
    """
    mapping = routing_map(tree, published, via_partition_root, detached)
    src = F.col(table_col)
    dest = F.element_at(_map_expr(mapping), src) if mapping else F.lit(None).cast("string")

    out = df.withColumn("__dest", dest)
    # TRUNCATE legality is judged on the SOURCE table before rewriting
    out = out.filter(
        (F.col(op_col) != "TRUNCATE") | src.isin(*published)
        if published
        else (F.col(op_col) != "TRUNCATE")
    )
    out = out.filter(F.col("__dest").isNotNull())
    out = out.withColumn(table_col, F.col("__dest")).drop("__dest")

    for dest_table, predicate in (row_filters or {}).items():
        control = F.col(op_col).isin("BEGIN", "COMMIT", "RELATION", "TRUNCATE")
        is_delete = F.col(op_col) == "DELETE"
        before_pred = (delete_row_filters or {}).get(dest_table)
        delete_keep = F.expr(before_pred) if before_pred is not None else F.lit(True)
        out = out.filter(
            (F.col(table_col) != dest_table)
            | control
            | F.when(is_delete, delete_keep).otherwise(F.expr(predicate))
        )
    return out
