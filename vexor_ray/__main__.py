"""CLI: ``python -m vexor_ray {build,search,chunk,bench-info}``.

The CLI owns the Ray session (library code never calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="vexor_ray")
    parser.add_argument("--num-cpus", type=int, default=None)
    sub = parser.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index from pages parquet")
    b.add_argument("--input", required=True, help="dir or parquet file of pages")
    b.add_argument("--out", required=True, help="index output directory")
    b.add_argument("--waves", type=int, default=None)
    b.add_argument("--partitions", type=int, default=None)
    b.add_argument("--doc-builder", default=None, choices=["url_text", "text", "head"])
    b.add_argument("--pre-extracted", action="store_true")
    b.add_argument(
        "--rich-extractors",
        action="store_true",
        help="route .pdf/.docx/.pptx urls through the built-in extractors",
    )
    b.add_argument(
        "--impact",
        action="store_true",
        help="store the impact-ordered companion layout (TA scorer)",
    )

    s = sub.add_parser("search", help="BM25 top-k over a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument(
        "--method", default="auto", choices=["auto", "exact", "wand", "impact"]
    )
    s.add_argument(
        "--at",
        default=None,
        metavar="SNAPSHOT",
        help="pin a retained snapshot (see `snapshots`) — time-travel read",
    )
    s.add_argument("--porcelain", action="store_true", help="TSV output")

    ex = sub.add_parser(
        "explain", help="per-term BM25 score breakdown for one document"
    )
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--doc", type=int, required=True, help="internal docID")

    sn = sub.add_parser(
        "snapshots", help="list retained index snapshots (time-travel pins)"
    )
    sn.add_argument("--index", required=True)
    sn.add_argument(
        "--expire-keep", type=int, default=None, metavar="N",
        help="prune history to the newest N snapshots and sweep their data",
    )

    sd = sub.add_parser(
        "snapshot-diff", help="docs added/removed between two snapshots"
    )
    sd.add_argument("--index", required=True)
    sd.add_argument("--from", dest="from_name", default=None, metavar="SNAPSHOT")
    sd.add_argument("--to", dest="to_name", default=None, metavar="SNAPSHOT")

    pc_ = sub.add_parser(
        "percolate",
        help="reverse search: stream a parquet corpus against stored queries",
    )
    pc_.add_argument("--input", required=True, help="parquet file or dir")
    pc_.add_argument(
        "--queries", required=True,
        help="text file: one stored query per line (line number = query_id)",
    )
    pc_.add_argument("--id-col", default="doc_id")
    pc_.add_argument("--text-col", default="text")

    vc = sub.add_parser(
        "vacuum", help="delete orphaned attempt dirs a crash left behind"
    )
    vc.add_argument("--index", required=True)
    vc.add_argument("--min-age", type=float, default=3600.0,
                    help="seconds; younger dirs are kept (in-flight builds)")
    vc.add_argument("--dry-run", action="store_true")

    c = sub.add_parser("chunk", help="materialize a sliding-window chunk corpus")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--chunk-size", type=int, default=1000)
    c.add_argument("--overlap", type=int, default=100)
    c.add_argument("--pre-extracted", action="store_true")
    c.add_argument(
        "--mode",
        default="full",
        choices=["full", "code", "outline", "auto"],
        help="full = sliding windows; code/outline = AST / Markdown-heading "
        "chunks (pre-extracted input only); auto dispatches by suffix",
    )

    ig = sub.add_parser(
        "ingest", help="extract a directory of raw files into a pages parquet"
    )
    ig.add_argument("--root", required=True, help="directory of txt/md/pdf/docx/pptx")
    ig.add_argument("--out", required=True, help="pages parquet output directory")
    ig.add_argument(
        "--exclude", action="append", default=[], help="fnmatch pattern (repeatable)"
    )

    we = sub.add_parser(
        "warc-export", help="pages parquet → .warc.gz shards (Common-Crawl wire format)"
    )
    we.add_argument("--input", required=True, help="pages parquet dir or file")
    we.add_argument("--out", required=True, help="output directory for .warc.gz shards")
    we.add_argument("--payload-col", default="html")

    wi = sub.add_parser(
        "warc-ingest", help=".warc.gz shards → pages parquet (url, warc_ts, html)"
    )
    wi.add_argument("--input", required=True, help=".warc.gz file or directory")
    wi.add_argument("--out", required=True, help="pages parquet output directory")

    cp = sub.add_parser(
        "compact", help="merge all incremental generations into one per wave"
    )
    cp.add_argument("--input", required=True, help="the index's pages input")
    cp.add_argument("--index", required=True)

    qs = sub.add_parser(
        "qsearch",
        help='mini query language: +must -not "phrase" prefix* fuzzy~ term',
    )
    qs.add_argument("--index", required=True)
    qs.add_argument("--query", required=True)
    qs.add_argument("-k", type=int, default=10)
    qs.add_argument(
        "--positions", help="positional sidecar dir (needed for phrase clauses)"
    )

    st = sub.add_parser(
        "stats",
        help="index introspection: corpus stats, generations, deletions, stage metrics",
    )
    st.add_argument("--index", required=True)

    cn = sub.add_parser(
        "clone", help="replicate a committed index to another store (resumable)"
    )
    cn.add_argument("--src", required=True, help="source index dir or URI")
    cn.add_argument("--dst", required=True, help="destination dir or URI")

    dl = sub.add_parser(
        "delete", help="delete documents (by url) from an index — no rebuild"
    )
    dl.add_argument("--index", required=True)
    dl.add_argument("--url", action="append", default=[], dest="urls")
    dl.add_argument(
        "--urls-file", help="newline-delimited url list (joins --url entries)"
    )

    pg = sub.add_parser(
        "purge",
        help="physically remove deleted documents (rewrite checkpoint + compact)",
    )
    pg.add_argument("--input", required=True, help="the index's pages input")
    pg.add_argument("--index", required=True)

    f = sub.add_parser("fsearch", help="federated BM25 over several indexes")
    f.add_argument("--index", action="append", required=True, dest="indexes")
    f.add_argument("--query", required=True)
    f.add_argument("-k", type=int, default=10)

    cl = sub.add_parser("clear", help="delete a persisted index directory")
    cl.add_argument("--index", required=True)

    sub.add_parser(
        "mcp", help="serve the MCP agent surface (ndjson JSON-RPC on stdio)"
    )

    po = sub.add_parser(
        "positions", help="build (resume/compact) the positional sidecar"
    )
    po.add_argument("--input", required=True, help="pages parquet dir")
    po.add_argument("--out", required=True, help="sidecar output directory")
    po.add_argument("--pre-extracted", action="store_true")
    po.add_argument("--waves", type=int, default=None)
    po.add_argument(
        "--compact", action="store_true", help="merge delta generations"
    )

    ph = sub.add_parser(
        "phrase", help="exact phrase / NEAR proximity over the sidecar"
    )
    ph.add_argument("--positions", required=True, dest="positions_dir")
    ph.add_argument("--phrase", help="consecutive-token phrase")
    ph.add_argument("--near", nargs=2, metavar=("A", "B"), help="proximity pair")
    ph.add_argument("--window", type=int, default=5)

    sg = sub.add_parser(
        "expand", help="term-dictionary expansion: prefix / fuzzy / suggest"
    )
    sg.add_argument("--index", required=True)
    sg.add_argument("--term", required=True)
    sg.add_argument(
        "--mode", default="suggest", choices=["suggest", "prefix", "fuzzy"]
    )

    args = parser.parse_args(argv)

    if args.cmd == "mcp":
        from vexor_ray.mcp import serve_stdio

        serve_stdio()
        return 0

    if args.cmd == "clear":
        from vexor_ray.api import clear_index

        removed = clear_index(args.index)
        print(json.dumps({"removed": removed, "index": args.index}))
        return 0 if removed else 1

    if args.cmd == "ingest":
        _init_ray(args.num_cpus)
        from vexor_ray.sources import collect_files, ingest_directory

        n = len(collect_files(args.root, exclude=tuple(args.exclude)))
        ingest_directory(args.root, args.out, exclude=tuple(args.exclude))
        print(json.dumps({"files": n, "out": args.out}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "warc-export":
        _init_ray(args.num_cpus)
        import ray
        import ray.data

        from vexor_ray.warc import write_warc_dataset

        ds = ray.data.read_parquet(args.input)
        ts_col = "warc_ts" if "warc_ts" in ds.schema().names else None
        files = write_warc_dataset(
            ds, args.out, ts_col=ts_col, payload_col=args.payload_col
        )
        print(json.dumps({"shards": len(files), "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "warc-ingest":
        _init_ray(args.num_cpus)
        import ray

        from pathlib import Path as _Path

        from vexor_ray.warc import read_warc

        p = _Path(args.input)
        paths = (
            sorted(str(f) for f in p.glob("*.warc.gz")) if p.is_dir() else [str(p)]
        )
        ds = read_warc(paths)
        _Path(args.out).mkdir(parents=True, exist_ok=True)
        ds.write_parquet(args.out)
        print(json.dumps({"shards": len(paths), "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "build":
        _init_ray(args.num_cpus)
        from vexor_ray.index.build import BuildConfig, build_index

        kw = {}
        if args.waves is not None:
            kw["num_waves"] = args.waves
        if args.partitions is not None:
            kw["partitions_per_wave"] = args.partitions
        if args.doc_builder is not None:
            kw["doc_builder"] = args.doc_builder
        if args.pre_extracted:
            kw["pre_extracted"] = True
        if args.rich_extractors:
            from vexor_ray.stages.extract import register_default_extractors

            register_default_extractors()
        if args.impact:
            kw["impact_postings"] = True
        manifest = build_index(args.input, args.out, BuildConfig(**kw))
        print(
            json.dumps(
                {"stats": manifest["stats"], "partitions": len(manifest["partitions"])}
            )
        )
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "search":
        from vexor_ray.query.searcher import Searcher

        searcher = Searcher(args.index, manifest_name=args.at)
        hits = searcher.search_hits(
            [{"query_id": 0, "query": args.query, "k": args.k}], method=args.method
        )
        if args.porcelain:
            for row in hits.to_pylist():
                print(
                    f"{row['rank']}\t{row['doc_id']}\t{row['score']:.6f}\t"
                    f"{row['url']}\t{(row['preview'] or '')[:80]}"
                )
        else:
            print(hits.to_pandas().to_string(index=False))
        return 0

    if args.cmd == "explain":
        import json as _json

        from vexor_ray.query.searcher import Searcher

        print(_json.dumps(Searcher(args.index).explain(args.query, args.doc), indent=1))
        return 0

    if args.cmd == "snapshots":
        from vexor_ray.index.manifest import (
            expire_snapshots,
            list_manifests,
            load_manifest,
        )

        if args.expire_keep is not None:
            import json as _json

            print(_json.dumps(expire_snapshots(args.index, keep=args.expire_keep)))
            return 0

        for e in list_manifests(args.index):
            man = load_manifest(args.index, at=e["name"])
            stats = man.get("stats", {})
            print(
                f"{'*' if e['current'] else ' '} seq={e['seq']:>4} "
                f"{e['name']}  docs={stats.get('doc_count', '?')}"
            )
        return 0

    if args.cmd == "snapshot-diff":
        import json as _json

        from vexor_ray.index.snapdiff import snapshot_diff

        print(
            _json.dumps(
                snapshot_diff(args.index, args.from_name, args.to_name),
                indent=1,
            )
        )
        return 0

    if args.cmd == "percolate":
        import ray.data

        from vexor_ray.functions.percolate import percolate

        # query_id = physical line number; blank lines are skipped but keep
        # their ordinal, and the echo goes through a {qid: text} dict so a
        # blank line can never shift the id→text mapping
        stored = [
            (i, line.strip())
            for i, line in enumerate(open(args.queries))
            if line.strip()
        ]
        qtext = dict(stored)
        docs = ray.data.read_parquet(args.input)
        out = percolate(
            docs, stored, id_col=args.id_col, text_col=args.text_col
        )
        n = 0
        for b in out.iter_batches(batch_format="pyarrow"):
            for d, q in zip(
                b.column("doc_id").to_pylist(),
                b.column("query_id").to_pylist(),
            ):
                print(f"{d}\t{q}\t{qtext[q]}")
                n += 1
        print(f"# {n} matches, {len(stored)} stored queries", flush=True)
        return 0

    if args.cmd == "vacuum":
        import json as _json

        from vexor_ray.index.vacuum import vacuum_index

        print(
            _json.dumps(
                vacuum_index(
                    args.index, min_age_s=args.min_age, dry_run=args.dry_run
                ),
                indent=1,
            )
        )
        return 0

    if args.cmd == "compact":
        _init_ray(args.num_cpus)
        from vexor_ray.index.build import compact_index

        manifest = compact_index(args.input, args.index)
        gens = {w: [g["gen"] for g in gs] for w, gs in manifest["wave_gens"].items()}
        print(json.dumps({"stats": manifest["stats"], "wave_gens": gens}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "qsearch":
        from vexor_ray.query.qlang import search_query
        from vexor_ray.query.searcher import Searcher

        s = Searcher(args.index)
        pos = None
        if args.positions:
            from vexor_ray.index.positions import PositionsIndex

            pos = PositionsIndex(args.positions)
        res = search_query(s, args.query, k=args.k, positions=pos)
        urls = s.lookup_urls([d for d, _ in res])
        print(
            json.dumps(
                [
                    {"doc_id": d, "url": urls[d], "score": round(sc, 6)}
                    for d, sc in res
                ]
            )
        )
        return 0

    if args.cmd == "stats":
        from vexor_ray.index.manifest import load_manifest

        man = load_manifest(args.index)
        waves = {
            w: {
                "generations": len(gens),
                "files": sum(len(g["files"]) for g in gens),
                "compacted": all(g.get("full") for g in gens[-1:]) and len(gens) == 1,
            }
            for w, gens in man.get("wave_gens", {}).items()
        }
        stages: dict[str, dict] = {}
        for p in man.get("partitions", []):
            s = stages.setdefault(
                p["stage"], {"partitions": 0, "wall_s": 0.0, "bytes": 0}
            )
            s["partitions"] += 1
            s["wall_s"] = round(s["wall_s"] + p["metrics"].get("wall_s", 0.0), 3)
            s["bytes"] += p["metrics"].get("bytes", 0)
        print(
            json.dumps(
                {
                    "stats": man["stats"],
                    "format_version": man.get("format_version"),
                    "tokenizer": man["config"].get("tokenizer"),
                    "impact_postings": man["config"].get("impact_postings"),
                    "waves": waves,
                    "deletes": man.get("deletes"),
                    "stages": stages,
                }
            )
        )
        return 0

    if args.cmd == "clone":
        from vexor_ray.index.clone import clone_index

        stats = clone_index(args.src, args.dst)
        print(
            json.dumps(
                {k: stats[k] for k in ("files_total", "files_copied", "bytes_copied")}
            )
        )
        return 0

    if args.cmd == "delete":
        from vexor_ray.index.deletes import delete_docs

        urls = list(args.urls)
        if args.urls_file:
            with open(args.urls_file, encoding="utf-8") as fh:
                urls += [line.strip() for line in fh if line.strip()]
        if not urls:
            parser.error("delete needs --url and/or --urls-file")
        print(json.dumps(delete_docs(args.index, urls)))
        return 0

    if args.cmd == "purge":
        _init_ray(args.num_cpus)
        from vexor_ray.index.deletes import purge_deletes

        manifest = purge_deletes(args.input, args.index)
        print(
            json.dumps(
                {"stats": manifest["stats"], "deletes": manifest.get("deletes")}
            )
        )
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "positions":
        _init_ray(args.num_cpus)
        from vexor_ray.index.positions import (
            PositionsConfig,
            build_positions_index,
            compact_positions_index,
        )

        kw = {}
        if args.pre_extracted:
            kw["pre_extracted"] = True
            kw["text_only"] = True
        if args.waves is not None:
            kw["num_waves"] = args.waves
        fn = compact_positions_index if args.compact else build_positions_index
        cfg = PositionsConfig(**kw) if kw else None
        manifest = fn(args.input, args.out, cfg)
        gens = {
            w: [g["gen"] for g in gs]
            for w, gs in manifest["pos_wave_gens"].items()
        }
        print(json.dumps({"pos_wave_gens": gens, "out": args.out}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "phrase":
        from vexor_ray.index.positions import PositionsIndex

        idx = PositionsIndex(args.positions_dir)
        if args.near:
            tbl = idx.near_occurrences(args.near[0], args.near[1], args.window)
        elif args.phrase:
            tbl = idx.phrase_occurrences(args.phrase)
        else:
            parser.error("phrase requires --phrase or --near A B")
        print(tbl.to_pandas().to_string(index=False))
        return 0

    if args.cmd == "expand":
        from vexor_ray.query.searcher import Searcher

        searcher = Searcher(args.index)
        if args.mode == "suggest":
            out = searcher.suggest(args.term)
        elif args.mode == "prefix":
            out = searcher.expand_prefix(args.term, max_terms=64)
        else:
            out = searcher.expand_fuzzy(args.term, max_terms=64)
        print(json.dumps({"term": args.term, "mode": args.mode, "result": out}))
        return 0

    if args.cmd == "fsearch":
        from vexor_ray.query.federate import FederatedSearcher

        fed = FederatedSearcher(args.indexes)
        hits = fed.search_hits(
            [{"query_id": 0, "query": args.query, "k": args.k}]
        )
        print(hits.to_pandas().to_string(index=False))
        return 0

    if args.cmd == "chunk":
        _init_ray(args.num_cpus)
        if args.mode != "full":
            from vexor_ray.stages.codechunk import chunk_mode_pages

            files = chunk_mode_pages(args.input, args.out, mode=args.mode)
        else:
            from vexor_ray.stages.chunker import chunk_pages

            files = chunk_pages(
                args.input,
                args.out,
                chunk_size=args.chunk_size,
                overlap=args.overlap,
                pre_extracted=args.pre_extracted,
            )
        print(json.dumps({"files": len(files)}))
        import ray

        ray.shutdown()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
