"""robots.txt crawl governance — parse + distributed longest-match filter.

A Common-Crawl-style pipeline must honor (or at least evaluate) robots
exclusion before a page enters the corpus.  This module implements the
standard subset from scratch:

Parse (:func:`parse_robots`): line-oriented; ``#`` comments stripped;
``User-agent`` lines open a group (consecutive UA lines share one group);
``Allow`` / ``Disallow`` rules accumulate into the ACTIVE group; only the
``*`` group's rules apply here (per-bot overrides are a caller concern);
an empty rule path (``Disallow:``) is a no-op per the original spec;
unknown directives are ignored.  No wildcard/``$`` support — documented
subset, refused nowhere (wildcard-free rules are the overwhelming
majority; a rule containing ``*`` or ``$`` is dropped with the subset
note rather than mis-matched).

Match (:func:`match_rules`): a rule matches iff the url PATH starts with
the rule path; the LONGEST matching rule wins; at equal length ``Allow``
wins (Google's documented tie-break); no match → allowed.

Distributed filter (:func:`robots_filter_stage`): pages and per-host rule
rows co-partition by a host hash (the tag-union discipline — never a
corpus-sized broadcast; hosts are millions at crawl scale); inside a
partition each host's few rules evaluate VECTORIZED over its pages
(``numpy.char.startswith`` per rule — no per-row Python in the hot loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.groups import coarse_grouped, str_pid


def parse_robots(text: str) -> list[tuple[bool, str]]:
    """robots.txt → ``[(allow, path), ...]`` for the ``*`` user-agent."""
    rules: list[tuple[bool, str]] = []
    active = False  # inside a group whose UA set includes '*'
    in_ua_run = False  # the previous significant line was a User-agent line
    group_has_star = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        name, _, value = line.partition(":")
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if not in_ua_run:
                group_has_star = False
            in_ua_run = True
            if value == "*":
                group_has_star = True
            active = group_has_star
            continue
        in_ua_run = False
        if name in ("allow", "disallow") and active:
            if not value:  # "Disallow:" == allow everything; a no-op rule
                continue
            if "*" in value or "$" in value:
                continue  # outside the wildcard-free subset
            rules.append((name == "allow", value))
    return rules


def match_rules(rules: list[tuple[bool, str]], path: str) -> bool:
    """Longest-match allow/disallow decision; no match → allowed."""
    best_len = -1
    best_allow = True
    for allow, rp in rules:
        if path.startswith(rp) and (
            len(rp) > best_len or (len(rp) == best_len and allow)
        ):
            best_len = len(rp)
            best_allow = allow
    return best_allow


def robots_filter_stage(
    pages: ray.data.Dataset,
    robots: ray.data.Dataset,
    *,
    host_col: str = "host",
    path_col: str = "path",
    id_cols: tuple[str, ...] = ("doc_id",),
    robots_text_col: str = "robots_txt",
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Append ``allowed: bool`` to pages by their host's robots rules.

    ``pages``: (ids..., host, path); ``robots``: (host, robots_txt) — one
    row per host.  Hosts with no robots row allow everything.
    """

    # robots rows carry type-matched NON-NULL fillers for the page id
    # columns (graph.py discipline: pandas nulls would force float/object
    # columns through the shuffle) — resolve the types from the pages
    # schema once
    page_schema = pages.schema()
    id_types = {c: page_schema.base_schema.field(c).type for c in id_cols}

    def _filler(t: pa.DataType, n: int) -> pa.Array:
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.array([""] * n, type=t)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return pa.array([b""] * n, type=t)
        return pa.array(np.zeros(n, dtype=np.int64), type=t)

    def tag_page(b: pa.Table) -> pa.Table:
        cols = {
            "key": b.column(host_col),
            "path": b.column(path_col),
            "txt": pa.array([""] * b.num_rows, type=pa.string()),
            "flag": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        }
        for c in id_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    def tag_robots(b: pa.Table) -> pa.Table:
        cols = {
            "key": b.column(host_col),
            "path": pa.array([""] * b.num_rows, type=pa.string()),
            "txt": b.column(robots_text_col),
            "flag": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        }
        for c in id_cols:
            cols[c] = _filler(id_types[c], b.num_rows)
        return pa.table(cols)

    tagged = pages.map_batches(
        tag_page, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        robots.map_batches(tag_robots, batch_format="pyarrow", zero_copy_batch=True)
    )

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        is_rob = df["flag"].to_numpy() == 0
        rules_by_host = {
            h: parse_robots(t)
            for h, t in zip(df["key"].to_numpy()[is_rob], df["txt"].to_numpy()[is_rob])
        }
        pg = df[~is_rob]
        hosts = pg["key"].to_numpy()
        paths = pg["path"].to_numpy().astype(str)
        allowed = np.ones(len(pg), dtype=bool)
        for h in pd.unique(hosts):
            rules = rules_by_host.get(h)
            if not rules:
                continue
            m = hosts == h
            hp = paths[m]
            best_len = np.full(hp.size, -1, dtype=np.int64)
            best_allow = np.ones(hp.size, dtype=bool)
            for allow, rp in rules:
                hit = np.char.startswith(hp, rp)
                lr = len(rp)
                upgrade = hit & (
                    (lr > best_len) | ((lr == best_len) & allow)
                )
                best_len[upgrade] = lr
                best_allow[upgrade] = allow
            allowed[m] = best_allow
        out = {c: pg[c].to_numpy() for c in id_cols}
        out["host"] = hosts
        out["path"] = paths
        out["allowed"] = allowed
        return pd.DataFrame(out)

    return coarse_grouped(
        tagged, lambda b: str_pid(b, "key", n_parts), decide
    )
