from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_1k(tmp_path_factory):
    """1k-row deterministic pages table on disk (unit-test scale)."""
    from vexor_ray.fixtures.pages import write_pages

    out = tmp_path_factory.mktemp("fixtures") / "pages_1k"
    return write_pages(out, 1000, seed=42, rows_per_file=256)


@pytest.fixture(scope="session")
def built_index(ray_session, pages_1k, tmp_path_factory):
    """Index over pages_1k with aggressive salting + 2 waves (shared)."""
    from vexor_ray.index.build import BuildConfig, build_index

    out = tmp_path_factory.mktemp("index") / "idx_1k"
    cfg = BuildConfig(
        salt_shift=8,  # 256-doc ranges → hot terms split into many chunks
        num_waves=2,
        partitions_per_wave=4,
        shard_group_size=2,
        tokenize_concurrency=2,
    )
    manifest = build_index(pages_1k, out, cfg)
    return out, manifest


@pytest.fixture(scope="session")
def pos_index(ray_session, pages_1k, tmp_path_factory):
    """Positional sidecar over pages_1k (aggressive salting + 2 waves)."""
    from vexor_ray.index.positions import PositionsConfig, build_positions_index

    out = tmp_path_factory.mktemp("positions") / "pos_1k"
    cfg = PositionsConfig(
        salt_shift=8,
        num_waves=2,
        partitions_per_wave=4,
        shard_group_size=2,
        tokenize_concurrency=2,
    )
    build_positions_index(pages_1k, out, cfg)
    return out


@pytest.fixture(scope="session")
def pos_oracle(pages_1k):
    """doc_id → token list of the extracted text (positions ground truth)."""
    import re

    import pyarrow.parquet as pq

    from vexor_ray.refimpl.textnorm import extract_text
    from vexor_ray.spec import TOKEN_PATTERN
    from vexor_ray.stages.docids import doc_id_base

    tok = re.compile(TOKEN_PATTERN)
    corpus = {}
    for fi, f in enumerate(sorted(pages_1k.glob("part-*.parquet"))):
        tbl = pq.read_table(f, columns=["html"])
        for ri, h in enumerate(tbl.column("html").to_pylist()):
            text = extract_text(h)
            if text:
                corpus[doc_id_base(fi, ri)] = tok.findall(text.lower())
    return corpus


@pytest.fixture(scope="session")
def oracle_1k(pages_1k):
    import pyarrow.parquet as pq

    from vexor_ray.refimpl import build_oracle_index
    from vexor_ray.stages.docids import doc_id_base

    pages, ids = [], []
    for fi, f in enumerate(sorted(pages_1k.glob("part-*.parquet"))):
        tbl = pq.read_table(f, columns=["url", "html"])
        for ri, (u, h) in enumerate(
            zip(tbl.column("url").to_pylist(), tbl.column("html").to_pylist())
        ):
            pages.append((u, h))
            ids.append(doc_id_base(fi, ri))
    return build_oracle_index(pages, ids=ids)
