"""Code (AST) and Markdown-outline chunking — the reference's CodeStrategy
and OutlineStrategy modes (``vexor/modes.py:127-227``,
``content_extract_service.py:256-696``, ``services/js_parser.py:185-435``)."""

from __future__ import annotations

import textwrap

from vexor_ray.stages.codechunk import (
    code_payloads,
    extract_js_chunks,
    extract_outline_chunks,
    extract_python_chunks,
    outline_payloads,
)

PY_SRC = textwrap.dedent(
    '''\
    """Module docstring."""
    import os

    CONSTANT = 7

    # helper used by main
    # spans two comment lines
    def helper(x):
        return x + CONSTANT


    class Widget:
        """A widget."""

        kind = "basic"

        def __init__(self, name):
            self.name = name

        async def fetch(self, url):
            return url

    TRAILING = helper(1)
    '''
)


def test_python_chunks_shapes():
    chunks = extract_python_chunks(PY_SRC)
    by_kind = {}
    for c in chunks:
        by_kind.setdefault(c.kind, []).append(c)
    # module prelude (docstring+import+CONSTANT), module_globals (TRAILING)
    assert [c.name for c in by_kind["module"]] == ["module", "module_globals"]
    assert "CONSTANT = 7" in by_kind["module"][0].text
    assert "TRAILING" in by_kind["module"][1].text
    # function carries its leading comment block and signature display
    (fn,) = by_kind["function"]
    assert fn.name == "helper" and fn.display == "def helper(x):"
    assert fn.text.startswith("# helper used by main")
    # class chunk: header + docstring + non-method body + Methods roll-up
    (cls,) = by_kind["class"]
    assert cls.display == "class Widget:"
    assert "A widget." in cls.text and 'kind = "basic"' in cls.text
    assert "Methods: __init__, fetch" in cls.text
    assert "def __init__" not in cls.text  # methods live in their own chunks
    # methods with qualified displays (async form included)
    methods = {m.name: m for m in by_kind["method"]}
    assert methods["Widget.__init__"].display == "Widget.__init__(self, name)"
    assert methods["Widget.fetch"].display == "async Widget.fetch(self, url)"


def test_python_syntax_error_falls_back_empty():
    assert extract_python_chunks("def broken(:\n  pass") == []
    # ...and the payload layer then uses the FullStrategy sliding window
    pays = code_payloads("a.py", "def broken(:\n  pass")
    assert pays and pays[0]["kind"] == "full"
    assert pays[0]["label"].startswith("a.py [#1] :: ")


JS_SRC = textwrap.dedent(
    """\
    import { x } from "./x.js";

    // adds two numbers
    // carefully
    function add(a, b) {
      return a + b; // sum
    }

    const mul = (a, b) => {
      const s = "function notAFunction() {";
      return a * b;
    };

    /* block doc
       for the class */
    export class Calc {
      constructor(base) {
        this.base = base;
      }
      async compute(v) {
        return add(this.base, v);
      }
    }

    export default add;
    """
)


def test_js_chunks_shapes():
    chunks = extract_js_chunks(JS_SRC)
    by_kind = {}
    for c in chunks:
        by_kind.setdefault(c.kind, []).append(c)
    fns = {c.name: c for c in by_kind["function"]}
    assert set(fns) == {"add", "mul"}
    assert fns["add"].display == "function add(a, b) {"
    assert fns["add"].text.startswith("// adds two numbers")
    # the string containing "function notAFunction() {" did NOT fool the
    # masker — no phantom symbol, and mul's braces balanced
    assert "notAFunction" not in fns
    (cls,) = by_kind["class"]
    assert cls.display == "export class Calc"
    assert "Methods: constructor, compute" in cls.text
    assert "/* block doc" in cls.text
    methods = {m.name for m in by_kind["method"]}
    assert methods == {"Calc.constructor", "Calc.compute"}
    # import line + export default end up in module chunks
    module_text = " ".join(c.text for c in by_kind["module"])
    assert "import { x }" in module_text and "export default add" in module_text


def test_js_no_symbols_is_one_module_chunk():
    chunks = extract_js_chunks("const a = 1;\nconsole.log(a);\n")
    assert [c.kind for c in chunks] == ["module"]
    assert chunks[0].name == "module"


MD_SRC = textwrap.dedent(
    """\
    ---
    title: Doc
    ---
    Intro paragraph before any heading.

    # Guide
    Welcome text.

    ## Install
    Run the installer.

    ```bash
    # not a heading
    echo hi
    ```

    ## Usage
    Usage text here.

    ### Advanced
    Deep dive.

    Setext Title
    ============
    Closing section.
    """
)


def test_outline_chunks_breadcrumbs_and_fences():
    chunks = extract_outline_chunks(MD_SRC)
    crumbs = [c.breadcrumb for c in chunks]
    assert crumbs == [
        "preamble",
        "Guide",
        "Guide > Install",
        "Guide > Usage",
        "Guide > Usage > Advanced",
        "Setext Title",
    ]
    # the fenced "# not a heading" was not recorded
    assert all("not a heading" != c.title for c in chunks)
    by = {c.breadcrumb: c for c in chunks}
    assert by["preamble"].text == "Intro paragraph before any heading."
    assert "Run the installer." in by["Guide > Install"].text
    assert by["Setext Title"].level == 1
    assert "Closing section." in by["Setext Title"].text
    # section text is line-collapsed (cleanup_snippet semantics)
    assert "\n" not in by["Guide > Usage"].text


def test_outline_context_char_limit():
    md = "# H\n" + "word " * 500
    (chunk,) = extract_outline_chunks(md, context_char_limit=50)
    assert len(chunk.text) <= 50


def test_outline_payload_labels():
    pays = outline_payloads("docs/guide.md", MD_SRC)
    assert pays[1]["label"].startswith("guide.md :: Guide :: Welcome text.")
    assert pays[4]["symbol"] == "Guide > Usage > Advanced"
    # heading-less markdown falls back to sliding windows
    fallback = outline_payloads("docs/plain.md", "just prose " * 10)
    assert fallback and fallback[0]["kind"] == "full"


def test_code_payload_windows_and_suffixes():
    # a chunk longer than chunk_size splits into [#i]-suffixed windows
    body = "\n".join(f"    x{i} = {i}" for i in range(200))
    src = f"def big():\n{body}\n"
    pays = code_payloads("big.py", src, chunk_size=800, overlap=80)
    fn_pays = [p for p in pays if p["kind"] == "function"]
    assert len(fn_pays) > 1
    assert "[#1]" in fn_pays[0]["label"] and "[#2]" in fn_pays[1]["label"]
    assert fn_pays[0]["symbol"] == "big"


def test_js_chunker_never_crashes_or_loses_lines():
    """Property: on arbitrary (even broken) input the scanner never raises
    and every non-blank source line falls inside some chunk's line span —
    text can be mis-KINDED by the grammar subset, never dropped."""
    import random

    from vexor_ray.stages.codechunk import extract_js_chunks

    rng = random.Random(17)
    fragments = [
        "function f{}(a) {", "}", "const x = (a) => a + 1;", "class {} Y {",
        "// comment with function g() {", '"string with } and { inside"',
        "`template ${ nested } with {`", "if (a) { b(); }", "export default",
        "/* unterminated block", "let s = 'quote \\' escaped';", "((({{{",
        "}}})))", "async function", "=> {", "\t\treturn 1;", "",
    ]
    for trial in range(200):
        n = rng.randint(0, 25)
        src = "\n".join(rng.choice(fragments) for _ in range(n))
        chunks = extract_js_chunks(src)  # must not raise
        lines = src.splitlines()
        covered = set()
        for c in chunks:
            covered.update(range(c.start_line, c.end_line + 1))
        for ln, text in enumerate(lines, start=1):
            if text.strip():
                assert ln in covered, (trial, ln, text, src)


def test_python_chunker_never_loses_lines():
    import random
    import string

    from vexor_ray.stages.codechunk import extract_python_chunks

    rng = random.Random(23)
    frags = [
        "import os", "X = 1", "def f():", "    return X", "class C:",
        "    pass", "# comment", "", "    def m(self):", "@deco",
        "if True:", "    X += 1",
    ]
    for trial in range(200):
        src = "\n".join(rng.choice(frags) for _ in range(rng.randint(0, 20)))
        chunks = extract_python_chunks(src)  # must not raise
        if not chunks:
            continue  # syntax error → payload layer falls back to windows
        covered = set()
        for c in chunks:
            covered.update(range(c.start_line, c.end_line + 1))
        for ln, text in enumerate(src.splitlines(), start=1):
            if text.strip():
                assert ln in covered, (trial, ln, text, src)


def test_mode_chunk_corpus_build_and_search(ray_session, tmp_path):
    """chunk_mode_pages → build → search: a method is findable by name and
    the top hit is its chunk, not the whole file (the CodeStrategy point)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vexor_ray.index.build import BuildConfig, build_index
    from vexor_ray.query.searcher import Searcher
    from vexor_ray.stages.codechunk import chunk_mode_pages

    pages = pa.table(
        {
            "url": ["src/app.py", "src/calc.js", "docs/guide.md"],
            "text": [PY_SRC, JS_SRC, MD_SRC],
        }
    )
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, pdir / "part-0.parquet")
    chunks = chunk_mode_pages(pdir, tmp_path / "chunks", mode="auto")
    assert chunks
    idx = tmp_path / "idx"
    build_index(
        chunks,
        idx,
        BuildConfig(pre_extracted=True, doc_builder="text", num_waves=1),
    )
    s = Searcher(idx)
    hits = s.search_hits([{"query_id": 1, "query": "fetch", "k": 3}]).to_pandas()
    assert hits["url"].iloc[0].startswith("src/app.py#chunk")
    hits = s.search_hits([{"query_id": 1, "query": "installer", "k": 3}]).to_pandas()
    assert hits["url"].iloc[0].startswith("docs/guide.md#chunk")
    hits = s.search_hits([{"query_id": 1, "query": "compute", "k": 3}]).to_pandas()
    assert hits["url"].iloc[0].startswith("src/calc.js#chunk")


def test_mask_js_escaped_newline_keeps_line_count():
    """A backslash line-continuation inside a string/template must not
    swallow the newline: masked line count always equals source line count,
    or every later line's brace-depth/regex alignment shifts."""
    from vexor_ray.stages.codechunk import _mask_js

    cases = [
        "const s = 'one \\\ntwo';\nfunction f() {\n  return 1;\n}\n",
        'let t = `a \\\nb \\\nc`;\nclass X {\n}\n',
        'var u = "trail\\\\\\\n";\n{ }\n',
        "'\\",  # escape at EOF — must not crash or over-run
    ]
    for src in cases:
        masked = _mask_js(src)
        assert len(masked) == src.count("\n") + 1, src

    # and the depth alignment downstream: a function AFTER the continuation
    # still gets its own chunk span covering its body
    from vexor_ray.stages.codechunk import extract_js_chunks

    src = "const s = 'one \\\ntwo';\nfunction f() {\n  return 1;\n}\n"
    chunks = extract_js_chunks(src)
    fn = [c for c in chunks if c.kind == "function"]
    assert fn and fn[0].start_line == 3 and fn[0].end_line == 5


class TestJsDecorators:
    def test_decorated_class_includes_decorator(self):
        from vexor_ray.stages.codechunk import extract_js_chunks

        src = """import { Component } from '@angular/core';

@Component({
  selector: 'app-root',
  template: '<div></div>',
})
export class AppComponent {
  title = 'app';
  run() {
    return this.title;
  }
}
"""
        chunks = extract_js_chunks(src)
        by_name = {c.name: c for c in chunks}
        assert "AppComponent" in by_name
        cls = by_name["AppComponent"]
        # the chunk SPAN starts at the decorator, not the class keyword
        assert cls.start_line == 3
        assert "Methods: run" in cls.text
        assert "AppComponent.run" in by_name
        # decorator lines never leak into a module chunk between them
        mods = [c for c in chunks if c.kind == "module"]
        assert all("@Component" not in m.text for m in mods)

    def test_decorated_methods_attach(self):
        from vexor_ray.stages.codechunk import extract_js_chunks

        src = """class Widget {
  @Input()
  name;
  @HostListener('click', ['$event'])
  onClick(ev) {
    return ev;
  }
}
"""
        chunks = extract_js_chunks(src)
        m = {c.name: c for c in chunks}["Widget.onClick"]
        assert "@HostListener" in _span_text(src, m)

    def test_decorated_function_and_reset(self):
        from vexor_ray.stages.codechunk import extract_js_chunks

        src = """@deprecated
function legacy() {
  return 1;
}

@orphan
const x = 5;
function clean() {
  return 2;
}
"""
        chunks = extract_js_chunks(src)
        names = [c.name for c in chunks if c.kind == "function"]
        assert names == ["legacy", "clean"]
        legacy = [c for c in chunks if c.name == "legacy"][0]
        assert legacy.start_line == 1  # decorator included
        clean = [c for c in chunks if c.name == "clean"][0]
        assert clean.start_line == 8  # @orphan broken by `const x = 5;`


def _span_text(src: str, chunk) -> str:
    lines = src.replace("\r\n", "\n").splitlines(keepends=True)
    return "".join(lines[chunk.start_line - 1 : chunk.end_line])


def test_same_line_property_decorator_not_pending():
    """@Input() title = ''; is self-contained: the next method's chunk must
    start at the method, not swallow the property line."""
    from vexor_ray.stages.codechunk import extract_js_chunks

    src = """class Widget {
  @Input() title = '';
  render() {
    return this.title;
  }
}
"""
    chunks = extract_js_chunks(src)
    m = {c.name: c for c in chunks}["Widget.render"]
    assert m.start_line == 3  # the method line, not the @Input property
    assert "@Input" not in _span_text(src, m)
