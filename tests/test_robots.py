"""robots.txt parse + longest-match semantics (vexor_ray/stages/robots.py)."""

from __future__ import annotations

import pyarrow as pa

from vexor_ray.stages.robots import match_rules, parse_robots

POLICY = """
# comment line
User-agent: googlebot
Disallow: /

User-agent: *
Disallow: /a/     # trailing comment
Allow: /a/ok/
Disallow:
Disallow: /x*y
Crawl-delay: 10
"""


class TestParse:
    def test_star_group_only(self):
        assert parse_robots(POLICY) == [
            (False, "/a/"),
            (True, "/a/ok/"),
        ]

    def test_shared_ua_run(self):
        txt = "User-agent: botA\nUser-agent: *\nDisallow: /p/\n"
        assert parse_robots(txt) == [(False, "/p/")]

    def test_group_reset_after_rules(self):
        # a new UA line AFTER rules opens a NEW group; '*' rules stop
        txt = (
            "User-agent: *\nDisallow: /a/\n"
            "User-agent: botB\nDisallow: /b/\n"
        )
        assert parse_robots(txt) == [(False, "/a/")]

    def test_case_insensitive_directives(self):
        txt = "USER-AGENT: *\nDISALLOW: /q/\nallow: /q/r/\n"
        assert parse_robots(txt) == [(False, "/q/"), (True, "/q/r/")]


class TestMatch:
    RULES = [(False, "/a/"), (True, "/a/ok/"), (False, "/a/ok/deep/")]

    def test_longest_match_wins(self):
        assert match_rules(self.RULES, "/a/x") is False
        assert match_rules(self.RULES, "/a/ok/1") is True
        assert match_rules(self.RULES, "/a/ok/deep/1") is False

    def test_no_match_allowed(self):
        assert match_rules(self.RULES, "/other") is True

    def test_equal_length_allow_wins(self):
        rules = [(False, "/p/"), (True, "/q/"), (True, "/p/"), (False, "/q/")]
        assert match_rules(rules, "/p/x") is True
        assert match_rules(rules, "/q/x") is True


class TestStage:
    def test_filter_stage(self, ray_session):
        import ray

        from vexor_ray.stages.robots import robots_filter_stage

        pages = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                    "host": pa.array(["h1", "h1", "h2", "h3"]),
                    "path": pa.array(["/a/x", "/a/ok/x", "/a/x", "/a/x"]),
                }
            )
        )
        robots = ray.data.from_arrow(
            pa.table(
                {
                    "host": pa.array(["h1", "h2"]),
                    "robots_txt": pa.array(
                        [
                            "User-agent: *\nDisallow: /a/\nAllow: /a/ok/\n",
                            "User-agent: *\nDisallow:\n",  # allow-all
                        ]
                    ),
                }
            )
        )
        got = (
            robots_filter_stage(pages, robots, n_parts=4)
            .to_pandas()
            .sort_values("doc_id")
        )
        # h1: /a/x blocked, /a/ok/x allowed; h2 allow-all; h3 no robots row
        assert got["allowed"].tolist() == [False, True, True, True]


class TestCrawlExportDedup:
    def test_boilerplate_rows_actually_dedup(self, ray_session):
        """The capstone's exact-text dedup stage must be LIVE: boilerplate
        docs (doc_id % 7 == 3) render with a shared body AND shared page
        identity, so at most one of them survives per robots outcome."""
        from vexor_ray.pipelines.web import crawl_export_table

        sf = "/root/testdata/sf0.001"
        got = crawl_export_table(sf).to_pandas()
        boiler = [d for d in got["doc_id"] if d % 7 == 3]
        assert len(boiler) == 1  # all allowed boilerplate pages collapse
        # and it is the LOWEST allowed boilerplate doc_id (keep-first rule)
        import pyarrow.parquet as pq2

        all_ids = pq2.read_table(
            f"{sf}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_pylist()
        cands = sorted(d for d in all_ids if d % 7 == 3)
        assert boiler[0] in cands
        assert boiler[0] <= min(got_d for got_d in cands if got_d in set(boiler))
