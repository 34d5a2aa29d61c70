"""Publication-catalog introspection (S5, round 12).

The reference derives per-table membership, published COLUMN LISTS and
ROW FILTERS from the server catalog ``pg_publication_tables``
(``crates/etl/src/postgres/client/transaction.rs:277-300`` — attnames
unnest per table; ``:670-690`` — rowfilter; the etl-api validators read
the same view). This engine's sim has no server, so the catalog arrives
as a SNAPSHOT FIXTURE: one JSON document of ``pg_publication_tables``
rows, captured by any SQL client at configuration time —

    [{"pubname": "etl", "schemaname": "public", "tablename": "users",
      "rowfilter": "(region = 'emea')", "attnames": ["pk", "name"]}, ...]

``PublicationCatalog`` parses/round-trips the fixture;
``Pipeline.reconcile_publication`` drives the SAME add/remove/purge and
mask/filter paths the config-driven flow exercises, but from catalog
truth: unlisted tables purge (membership sync, pipeline.rs:354-421),
published column lists trim the replication mask (P1 — an unlisted
column decodes exactly like an unpublished one), row filters adopt into
``TableConfig.row_filter`` (P2), and newly published tables provision
via a caller-supplied factory (the catalog doesn't carry snapshot paths
or key types — those are deployment wiring, like the reference's state
store).

A column list that omits a REPLICA IDENTITY column is rejected loudly:
the server itself refuses such publications for update/delete traffic
(and the reference's primary-key validator enforces it against the same
catalog), so accepting one here would decode deletes with no key.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class PublicationTableRow:
    """One ``pg_publication_tables`` row (the columns the reference
    reads; Postgres 15+ shape with attnames/rowfilter)."""

    pubname: str
    schemaname: str
    tablename: str
    rowfilter: str | None = None
    #: None = all columns published (the catalog's NULL); a list = the
    #: published column list, exactly as unnest(pt.attnames) yields it
    attnames: list[str] | None = None

    @property
    def qualified_name(self) -> str:
        return f"{self.schemaname}.{self.tablename}"


@dataclass
class PublicationCatalog:
    """A snapshot of one publication's ``pg_publication_tables`` rows."""

    pubname: str
    rows: list[PublicationTableRow] = field(default_factory=list)

    # -- fixture round-trip -------------------------------------------------
    @classmethod
    def from_rows(cls, rows: list[dict]) -> PublicationCatalog:
        if not rows:
            raise ValueError("empty catalog snapshot: a publication with "
                             "no tables purges EVERYTHING — require an "
                             "explicit empty catalog via PublicationCatalog"
                             "(pubname, rows=[]) instead of a blank fixture")
        parsed = [PublicationTableRow(**r) for r in rows]
        pubs = {r.pubname for r in parsed}
        if len(pubs) != 1:
            raise ValueError(
                f"catalog snapshot spans publications {sorted(pubs)}; "
                "one fixture = one publication (the reference queries "
                "per-pubname)")
        return cls(pubname=parsed[0].pubname, rows=parsed)

    @classmethod
    def load_json(cls, path: str) -> PublicationCatalog:
        with open(path) as f:
            return cls.from_rows(json.load(f))

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump([vars(r) for r in self.rows], f, indent=1)

    # -- lookups --------------------------------------------------------------
    def tables(self) -> set[str]:
        return {r.qualified_name for r in self.rows}

    def row_for(self, qualified_name: str) -> PublicationTableRow | None:
        for r in self.rows:
            if r.qualified_name == qualified_name:
                return r
        return None


def _split_schema_fields(payload_schema: str) -> list[str]:
    """Split a DDL-ish ``name type, name type`` schema string on commas
    OUTSIDE parentheses, so parameterized types — ``decimal(12,2)``,
    ``struct<a int, b int>``-free simple forms — survive the publication
    column-list trim intact (ADVICE r12: a naive ``split(',')`` would
    durably corrupt ``payload_schema`` mid-type). Each fragment must
    look like ``name type...``; anything else is a loud error rather
    than a silent rewrite of config state."""
    fields: list[str] = []
    depth, start = 0, 0
    for i, ch in enumerate(payload_schema):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(payload_schema[start:i].strip())
            start = i + 1
    fields.append(payload_schema[start:].strip())
    bad = [f for f in fields if len(f.split()) < 2]
    if bad or depth != 0:
        raise ValueError(
            f"cannot trim payload_schema {payload_schema!r}: fragment(s) "
            f"{bad} do not parse as 'name type' (unbalanced parens: "
            f"{depth != 0})")
    return fields


def apply_catalog_to_config(cfg, row: PublicationTableRow):
    """Project one catalog row onto a TableConfig: trim the replication
    mask to the published column list (keys must survive — loud error
    otherwise) and adopt the row filter. Returns the updated config
    (mutates in place; the pipeline re-derives decode masks from
    ``payload_schema`` per batch, so the trim takes effect on the next
    trigger exactly like a publication ALTER)."""
    if row.attnames is not None:
        published = set(row.attnames)
        missing = [k for k in cfg.keys if k not in published]
        if missing:
            raise ValueError(
                f"publication {row.pubname!r} column list for "
                f"{row.qualified_name} omits replica-identity column(s) "
                f"{missing}: the server rejects update/delete traffic on "
                "such publications and so does this engine (a delete "
                "without its key cannot apply)")
        if cfg.payload_schema:
            fields = _split_schema_fields(cfg.payload_schema)
            kept = [f for f in fields if f.split()[0] in published]
            cfg.payload_schema = ", ".join(kept)
    cfg.row_filter = row.rowfilter
    return cfg
