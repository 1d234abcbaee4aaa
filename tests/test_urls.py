"""URL canonicalization spec (vexor_ray/functions/urls.py)."""

from __future__ import annotations

from vexor_ray.functions.urls import normalize_url


class TestNormalizeUrl:
    def test_case_port_fragment(self):
        assert (
            normalize_url("HTTP://Site.Example:80/A/b?x=1#frag")
            == "http://site.example/A/b?x=1"
        )
        assert (
            normalize_url("https://h.io:443/p") == "https://h.io/p"
        )

    def test_non_default_port_kept(self):
        assert normalize_url("http://h.io:8080/p") == "http://h.io:8080/p"
        # ':80' inside a longer port must not be stripped
        assert normalize_url("http://h.io:880/p") == "http://h.io:880/p"

    def test_query_sort_and_trackers(self):
        assert (
            normalize_url("https://h.io/p?z=1&utm_source=x&a=2&a=1")
            == "https://h.io/p?a=1&a=2&z=1"
        )
        # all params dropped → no '?'
        assert (
            normalize_url("https://h.io/p?utm_a=1&utm_b=2")
            == "https://h.io/p"
        )
        assert normalize_url("https://h.io/p?") == "https://h.io/p"

    def test_empty_path(self):
        assert normalize_url("https://h.io?b=1&a=2") == "https://h.io/?a=2&b=1"
        assert normalize_url("https://h.io") == "https://h.io/"

    def test_unparseable_passthrough(self):
        assert normalize_url("mailto:x@y.z#f") == "mailto:x@y.z"
        assert normalize_url("not a url") == "not a url"
