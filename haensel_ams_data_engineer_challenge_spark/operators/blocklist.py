"""Domain-blocklist filtering — the UT1/url-blocklist curation step.

Web curation pipelines (RefinedWeb, FineWeb, CCNet derivatives) drop
documents whose source host appears in a blocklist (adult/malware/ad
domains — the Université Toulouse 1 lists are the public standard,
millions of entries).  Semantics: an entry blocks the exact host AND
every subdomain — ``ads.example.com`` in the list blocks
``ads.example.com`` and ``x.ads.example.com`` but never
``badads.example.com`` (label-boundary matching, not substring).

Spark shape: each host expands ROW-LOCALLY into its suffix chain on
label boundaries (``a.b.c`` -> ``[a.b.c, b.c, c]`` — bounded by label
count, ~4-6 entries), then one explode + broadcast LEFT SEMI join
against the blocklist marks hits; the flag rejoins on the id.  The
blocklist is the broadcast side (entries ≪ corpus; UT1's millions of
rows are tens of MB — inside the broadcast budget; past that, a plain
equi-join on the suffix degrades gracefully).  For SMALL literal
lists there is an expression form (``blocklist_flag_expr`` —
``arrays_overlap`` against an inlined literal array, zero joins),
pytest-pinned equal to the join form and used by the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def host_suffixes(host_col: str | Column) -> Column:
    """array<string> of the host's label-boundary suffix chain,
    lowercased: 'A.b.C' -> ['a.b.c', 'b.c', 'c']."""
    col = F.col(host_col) if isinstance(host_col, str) else host_col
    parts = F.split(F.lower(col), r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def suffixes_sql(host_expr: str) -> str:
    """DuckDB twin of :func:`host_suffixes` (1-based list slices)."""
    return (
        f"list_transform(range(1, len(string_split(lower({host_expr}), '.')) + 1), "
        f"i -> array_to_string(string_split(lower({host_expr}), '.')"
        f"[i:len(string_split(lower({host_expr}), '.'))], '.'))"
    )


def blocklist_flag(
    docs: DataFrame,
    blocked_hosts: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    out_col: str = "blocked",
) -> DataFrame:
    """``docs`` + a boolean ``out_col``: True when the host (or any
    parent domain) appears in ``blocked_hosts`` (single column of
    hosts, any name).  The join form — for real (large) blocklists."""
    hosts = blocked_hosts.select(
        F.lower(F.col(blocked_hosts.columns[0])).alias("__h")
    )
    hits = (
        docs.select(id_col, F.explode(host_suffixes(host_col)).alias("__h"))
        .join(F.broadcast(hosts), "__h", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn(out_col, F.lit(True))
    )
    return docs.join(hits, id_col, "left").fillna(False, [out_col])


def blocklist_flag_expr(
    hosts: list[str], host_col: str = "source"
) -> Column:
    """Expression form for SMALL literal lists: row-local
    ``arrays_overlap`` of the suffix chain with the inlined list —
    zero joins, whole-stage codegen.  Bit-equal to the join form
    (pytest-pinned)."""
    lits = F.array(*[F.lit(h.lower()) for h in sorted(set(hosts))])
    return F.arrays_overlap(host_suffixes(host_col), lits)


def blocklist_flag_sql(hosts: list[str], host_expr: str) -> str:
    """DuckDB twin of :func:`blocklist_flag_expr`."""
    lit = ", ".join(f"'{h.lower()}'" for h in sorted(set(hosts)))
    return f"len(list_intersect({suffixes_sql(host_expr)}, [{lit}])) > 0"
