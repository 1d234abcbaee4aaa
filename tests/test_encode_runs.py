"""The vectorized run encoder must emit exactly the per-run codec format."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vexor_ray.index import codec
from vexor_ray.index.build import encode_runs


def _random_sorted_batch(n_rows: int, n_terms: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    terms = np.sort(rng.integers(0, n_terms, n_rows))
    term_strs = np.array([f"term{t:05d}" for t in terms], dtype=object)
    salts = np.zeros(n_rows, dtype=np.uint64)
    # give some terms multiple salts (sorted within term)
    hot = terms % 7 == 0
    salts[hot] = rng.integers(0, 3, hot.sum())
    order = np.lexsort((salts, term_strs))
    term_strs, salts = term_strs[order], salts[order]
    # unique docIDs within each (term, salt) run
    doc_ids = np.zeros(n_rows, dtype=np.uint64)
    key = [f"{t}|{s}" for t, s in zip(term_strs, salts)]
    seen: dict[str, set] = {}
    for i, kk in enumerate(key):
        used = seen.setdefault(kk, set())
        d = int(rng.integers(0, n_rows * 4))
        while d in used:
            d = int(rng.integers(0, n_rows * 4))
        used.add(d)
        doc_ids[i] = d
    from vexor_ray.hashing import hash_terms

    return pa.table(
        {
            "th": pa.array(hash_terms(term_strs), type=pa.uint64()),
            "term": pa.array(term_strs.tolist(), type=pa.string()),
            "salt": pa.array(salts, type=pa.uint64()),
            "doc_id": pa.array(doc_ids, type=pa.uint64()),
            "tf": pa.array(rng.integers(1, 30, n_rows).astype(np.uint32)),
            "dl": pa.array(rng.integers(1, 900, n_rows).astype(np.uint32)),
        }
    )


def test_encode_runs_matches_per_run_codec():
    for seed, block_size in [(0, 128), (1, 4), (2, 7)]:
        batch = _random_sorted_batch(3000, 120, seed)
        out = encode_runs(
            batch, avg_doc_len=123.4, block_size=block_size, k1=1.5, b=0.75
        ).to_pylist()
        # reference: group by (term, salt) and encode per run
        terms = batch.column("term").to_pylist()
        salts = batch.column("salt").to_pylist()
        docs = batch.column("doc_id").to_numpy()
        tfs = batch.column("tf").to_numpy()
        dls = batch.column("dl").to_numpy()
        runs: dict[tuple, list[int]] = {}
        for i, k in enumerate(zip(terms, salts)):
            runs.setdefault(k, []).append(i)
        assert len(out) == len(runs)
        by_key = {(r["term"], r["salt"]): r for r in out}
        for (t, s), idx in runs.items():
            idx = np.asarray(idx)
            order = np.argsort(docs[idx], kind="stable")
            ref = codec.encode_chunk(
                docs[idx][order].astype(np.uint64),
                tfs[idx][order].astype(np.uint64),
                dls[idx][order].astype(np.uint64),
                123.4,
                block_size=block_size,
                k1=1.5,
                b=0.75,
            )
            got = by_key[(t, s)]
            assert got["n_postings"] == ref["n_postings"], (t, s)
            assert got["doc_blob"] == ref["doc_blob"], (t, s)
            assert got["tf_blob"] == ref["tf_blob"], (t, s)
            assert got["dl_blob"] == ref["dl_blob"], (t, s)
            assert got["doc_off"] == ref["doc_off"].tolist(), (t, s)
            assert got["tf_off"] == ref["tf_off"].tolist(), (t, s)
            assert got["dl_off"] == ref["dl_off"].tolist(), (t, s)
            assert got["block_last"] == ref["block_last"].tolist(), (t, s)
            assert got["block_ub"] == ref["block_ub"].tolist(), (t, s)


def test_ub_float32_never_below():
    vals = np.array([1.0000001, 3.3333333, 7.123456789, 0.1, 1e-20, 123456.789])
    ub = codec.ub_float32(vals)
    assert np.all(ub.astype(np.float64) >= vals)
