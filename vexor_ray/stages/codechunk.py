"""AST-aware code chunking and Markdown outline chunking.

Re-hosts the reference's two remaining index modes:

- ``CodeStrategy`` (``vexor/modes.py:127-180``): Python files are split into
  module-prelude / function / class / method chunks via the stdlib ``ast``
  module (``content_extract_service.py:256-491`` semantics, mirrored here
  function-for-function); JavaScript/TypeScript files get the same chunk
  kinds from a from-scratch lexer+scanner (the reference delegates to
  tree-sitter, ``services/js_parser.py:185-435`` — not available here, so
  ``extract_js_chunks`` below recognizes the same top-level constructs with
  a string/comment-aware brace-depth scan; deeply dynamic code falls back
  to module chunks, and files that yield nothing fall back to the
  FullStrategy sliding window exactly like the reference).
- ``OutlineStrategy`` (``vexor/modes.py:183-227``): Markdown headings
  (ATX + setext, fence- and front-matter-aware) become breadcrumb-labelled
  section chunks (``content_extract_service.py:494-696`` semantics).

Payload shapes match the reference: a code window's lexical document is
``f"{file.name} :: {display}[ [#i]] :: {normalized_window}"`` and an
outline section's is ``f"{file.name} :: {breadcrumb} :: {text}"``
(``modes.py:159-167,207-213``), so the standard build indexes the labels
with ``doc_builder="text"`` — composition, like ``stages/chunker.py``.

Scale notes: chunk extraction is per-file pure Python inside per-row-group
Ray tasks (same fan-out as ``chunk_pages``); no shuffle, no driver loops.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..refimpl.textnorm import chunk_text, cleanup_snippet
from ..spec import DEFAULT_CHUNK_OVERLAP, DEFAULT_CHUNK_SIZE

DOC_COMMENT_MAX_LINES = 10  # content_extract_service.py:18-19
DOC_COMMENT_MAX_CHARS = 500
PREVIEW_CHAR_LIMIT = 160  # modes.py:24


@dataclass(frozen=True)
class CodeChunk:
    kind: str  # module | function | class | method
    name: str
    display: str
    text: str
    start_line: int
    end_line: int


@dataclass(frozen=True)
class OutlineChunk:
    level: int
    title: str
    breadcrumb: str
    text: str
    start_line: int
    end_line: int


def _trim_preview(text: str, limit: int = PREVIEW_CHAR_LIMIT) -> str:
    stripped = text.strip()
    if len(stripped) <= limit:
        return stripped
    return stripped[: limit - 1].rstrip() + "…"


def _normalize_preview_chunk(text: str) -> str | None:
    lines = [line.strip() for line in text.splitlines() if line.strip()]
    if lines:
        return " ".join(lines)
    stripped = text.strip()
    return stripped or None


# --------------------------------------------------------------------------
# Python: stdlib-ast chunker (content_extract_service.py:256-491)
# --------------------------------------------------------------------------


def extract_python_chunks(source: str) -> list[CodeChunk]:
    """Python source → module/function/class/method chunks."""
    if not source:
        return []
    source = source.replace("\r\n", "\n")
    try:
        module = ast.parse(source)
    except SyntaxError:
        return []

    lines = source.splitlines(keepends=True)
    max_line = len(lines)

    def clamp(v: int) -> int:
        return 1 if v < 1 else (max_line if v > max_line else v)

    def extend_start_with_comment(start: int) -> int:
        # pull a leading #-comment block (≤10 lines / ≤500 chars) into the
        # symbol, stopping at blank lines, shebangs and coding cookies
        if start <= 1:
            return start
        idx = start - 2
        taken = 0
        total = 0
        while idx >= 0:
            stripped = lines[idx].rstrip("\n").strip()
            if not stripped or not stripped.startswith("#"):
                break
            low = stripped.lower()
            if stripped.startswith("#!") or low.startswith(("# coding", "# -*- coding")):
                break
            taken += 1
            total += len(lines[idx].rstrip("\n")) + 1
            if taken >= DOC_COMMENT_MAX_LINES or total >= DOC_COMMENT_MAX_CHARS:
                break
            idx -= 1
        return start - taken

    def node_start(node) -> int:
        start = int(getattr(node, "lineno", 1) or 1)
        for deco in getattr(node, "decorator_list", None) or []:
            dl = getattr(deco, "lineno", None)
            if isinstance(dl, int):
                start = min(start, dl)
        return clamp(start)

    def node_end(node) -> int:
        e = getattr(node, "end_lineno", None)
        if isinstance(e, int):
            return clamp(e)
        body = getattr(node, "body", None) or []
        if body:
            le = getattr(body[-1], "end_lineno", None) or getattr(
                body[-1], "lineno", None
            )
            if isinstance(le, int):
                return clamp(le)
        ln = getattr(node, "lineno", None)
        return clamp(ln) if isinstance(ln, int) else max_line

    def slice_lines(start: int, end: int) -> str:
        if not max_line:
            return ""
        start, end = clamp(start), clamp(end)
        if end < start:
            end = start
        return "".join(lines[start - 1 : end]).strip()

    def signature_line(node) -> str:
        ln = getattr(node, "lineno", None)
        if not isinstance(ln, int) or not (1 <= ln <= max_line):
            return ""
        return lines[ln - 1].strip()

    chunks: list[CodeChunk] = []
    symbols = sorted(
        (
            (extend_start_with_comment(node_start(n)), node_end(n), n)
            for n in module.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
        ),
        key=lambda s: s[0],
    )

    def add_module_chunk(start: int, end: int, *, prelude: bool) -> None:
        text = slice_lines(start, end)
        if text:
            chunks.append(
                CodeChunk(
                    "module",
                    "module" if prelude else "module_globals",
                    "module" if prelude else "module globals",
                    text,
                    start,
                    end,
                )
            )

    if not symbols:
        add_module_chunk(1, max_line, prelude=True)
        return chunks

    cursor = 1
    seen = False
    for start, end, node in symbols:
        if cursor <= start - 1:
            add_module_chunk(cursor, start - 1, prelude=not seen)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            text = slice_lines(start, end)
            if text:
                chunks.append(
                    CodeChunk(
                        "function",
                        node.name,
                        signature_line(node) or f"def {node.name}",
                        text,
                        start,
                        end,
                    )
                )
        elif isinstance(node, ast.ClassDef):
            docstring = ast.get_docstring(node) or ""
            methods = [
                c.name
                for c in node.body
                if isinstance(c, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]

            def is_docstring_expr(stmt) -> bool:
                return (
                    isinstance(stmt, ast.Expr)
                    and isinstance(stmt.value, ast.Constant)
                    and isinstance(stmt.value.value, str)
                )

            # class chunk = header line(s) + docstring + non-method body
            # statements + a Methods: roll-up (methods get their own chunks)
            parts = [slice_lines(start, node.lineno)]
            if docstring.strip():
                parts.append(docstring.strip())
            for idx, child in enumerate(node.body):
                if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    continue
                if idx == 0 and docstring and is_docstring_expr(child):
                    continue
                t = slice_lines(node_start(child), node_end(child))
                if t:
                    parts.append(t)
            if methods:
                parts.append("Methods: " + ", ".join(methods))
            class_text = "\n".join(p for p in parts if p).strip()
            if class_text:
                chunks.append(
                    CodeChunk(
                        "class",
                        node.name,
                        signature_line(node) or f"class {node.name}",
                        class_text,
                        start,
                        end,
                    )
                )
            for child in node.body:
                if not isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    continue
                cstart = extend_start_with_comment(node_start(child))
                cend = node_end(child)
                text = slice_lines(cstart, cend)
                if not text:
                    continue
                raw_sig = signature_line(child).strip()
                display = f"{node.name}.{child.name}"
                if raw_sig.startswith("async def "):
                    display = f"async {node.name}.{raw_sig[10:].rstrip(':').strip()}"
                elif raw_sig.startswith("def "):
                    display = f"{node.name}.{raw_sig[4:].rstrip(':').strip()}"
                elif raw_sig:
                    display = f"{node.name}.{raw_sig.rstrip(':').strip()}"
                chunks.append(
                    CodeChunk(
                        "method",
                        f"{node.name}.{child.name}",
                        display,
                        text,
                        cstart,
                        cend,
                    )
                )
        cursor = end + 1
        seen = True
    if cursor <= max_line:
        add_module_chunk(cursor, max_line, prelude=False)
    return chunks


# --------------------------------------------------------------------------
# JavaScript / TypeScript: from-scratch lexer + top-level scanner
# (chunk-assembly semantics of services/js_parser.py:185-435; the grammar
# subset is regex-over-masked-source instead of tree-sitter)
# --------------------------------------------------------------------------

JSTS_SUFFIXES = (".js", ".jsx", ".mjs", ".cjs", ".ts", ".tsx", ".mts", ".cts")

_JS_FUNC_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*"
    r"([A-Za-z_$][\w$]*)?\s*\("
)
_JS_CLASS_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?class\s+([A-Za-z_$][\w$]*)"
)
_JS_ARROW_RE = re.compile(
    r"^\s*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][\w$]*)[^=;]*=\s*"
    r"(?:async\s*)?(?:\([^()]*\)|[A-Za-z_$][\w$]*)\s*(?::[^=;]+)?=>"
)
_JS_METHOD_RE = re.compile(
    r"^\s*(?:public\s+|private\s+|protected\s+|readonly\s+)*"
    r"(?:static\s+)?(?:async\s+)?(?:get\s+|set\s+)?\*?\s*"
    r"(#?[A-Za-z_$][\w$]*)\s*(?:<[^<>]*>)?\s*\("
)
_JS_METHOD_SKIP = frozenset(
    {"if", "for", "while", "switch", "catch", "return", "function", "new",
     "typeof", "await", "yield", "super", "this"}
)
# decorator line: @Name, @Name(...), @ns.Name({...}) — TS/Angular style
_JS_DECOR_RE = re.compile(r"^\s*@[A-Za-z_$][\w$.]*")


def _decor_only_line(mline: str) -> bool:
    """True when the (masked) line is a STANDALONE decorator — bare
    ``@Name``, ``@Name(args…)`` closing on this line with nothing after,
    or a multi-line call whose parens stay open.  ``@Input() title = '';``
    (decorated property, same line) returns False: it must not become a
    pending decorator that swallows the next method's span."""
    m = _JS_DECOR_RE.match(mline)
    if not m:
        return False
    rest = mline[m.end():]
    depth = 0
    for i, ch in enumerate(rest):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return rest[i + 1 :].strip() == ""
        elif depth == 0 and not ch.isspace():
            return False  # content after a bare decorator → property etc.
    return True  # bare decorator, or call still open (multi-line args)


def _mask_js(source: str) -> list[str]:
    """Per-line copy of the source with string/template/comment CONTENT
    blanked (structure — braces, parens, keywords outside literals — kept),
    so depth tracking and construct regexes never fire inside literals."""
    out: list[list[str]] = [[]]
    mode = ""  # '' code, '/' line comment, '*' block, "'"/'"'/'`' strings
    i, n = 0, len(source)
    while i < n:
        c = source[i]
        if c == "\n":
            out.append([])
            if mode in ("/", "'", '"'):  # line comments + quotes end at EOL
                mode = ""
            i += 1
            continue
        if mode == "":
            if c == "/" and i + 1 < n and source[i + 1] == "/":
                mode = "/"
                out[-1].append(" ")
                i += 1
            elif c == "/" and i + 1 < n and source[i + 1] == "*":
                mode = "*"
                out[-1].append(" ")
                i += 1
            elif c in "'\"`":
                mode = c
                out[-1].append(" ")
            else:
                out[-1].append(c)
        elif mode == "/":
            out[-1].append(" ")
        elif mode == "*":
            if c == "*" and i + 1 < n and source[i + 1] == "/":
                mode = ""
                out[-1].append(" ")
                i += 1
            out[-1].append(" ")
        else:  # inside a string/template
            if c == "\\":
                out[-1].append(" ")
                # an escaped newline (line continuation) must still start a
                # new masked line or masked/source line counts diverge and
                # every later line's brace depth shifts
                if i + 1 < n and source[i + 1] != "\n":
                    i += 1
            elif c == mode:
                mode = ""
                out[-1].append(" ")
            else:
                out[-1].append(" ")
        i += 1
    return ["".join(l) for l in out]


def extract_js_chunks(source: str) -> list[CodeChunk]:
    """JS/TS source → the reference's chunk kinds via a scanner subset.

    Recognized at top level: function declarations, class declarations
    (methods chunked individually, ``Methods:`` roll-up in the class chunk),
    arrow functions bound by const/let/var, and their ``export`` forms; the
    gaps become module / module-globals chunks.  Constructs the subset
    cannot see stay inside module chunks — text is never lost.
    """
    if not source:
        return []
    source = source.replace("\r\n", "\n")
    lines = source.splitlines(keepends=True)
    masked = _mask_js(source)
    if len(masked) < len(lines):
        masked += [""] * (len(lines) - len(masked))
    max_line = len(lines)
    if not max_line:
        return []

    # brace depth BEFORE each line (code-only chars)
    depth_before = [0] * (max_line + 2)
    d = 0
    for li in range(max_line):
        depth_before[li + 1] = d
        d += masked[li].count("{") - masked[li].count("}")
    depth_before[max_line + 1] = d

    def body_end(start_ln: int) -> int:
        """Line where depth returns to the start level after rising."""
        base = depth_before[start_ln]
        d = base
        rose = False
        for li in range(start_ln, max_line + 1):
            opens = masked[li - 1].count("{")
            closes = masked[li - 1].count("}")
            d += opens - closes
            if opens:
                rose = True
            if rose and d <= base:
                return li
        return max_line

    def stmt_end(start_ln: int) -> int:
        """Brace-less arrow body: first line with a ';' at base depth."""
        base = depth_before[start_ln]
        for li in range(start_ln, max_line + 1):
            if depth_before[li + 1] <= base and ";" in masked[li - 1]:
                return li
        return start_ln

    def slice_lines(start: int, end: int) -> str:
        start = max(1, min(start, max_line))
        end = max(start, min(end, max_line))
        return "".join(lines[start - 1 : end]).strip()

    def first_line(text: str) -> str:
        for line in text.splitlines():
            if line.strip():
                return line.strip()
        return text[:80] if text else ""

    def doc_comment(start_ln: int) -> tuple[int, str] | None:
        # js_parser.py:112-171: a contiguous // block or a /* */ block
        # immediately above, ≤10 lines / ≤500 chars
        if start_ln <= 1:
            return None
        idx = start_ln - 2
        if idx < 0 or not lines[idx].strip():
            return None
        if lines[idx].strip().startswith("//"):
            while idx >= 0 and lines[idx].strip().startswith("//"):
                idx -= 1
            s = idx + 1
        elif "*/" in lines[idx]:
            s = idx
            while s >= 0 and "/*" not in lines[s]:
                s -= 1
            if s < 0 or not lines[s].lstrip().startswith("/*"):
                return None
        else:
            return None
        block = lines[s : start_ln - 1][:DOC_COMMENT_MAX_LINES]
        text = "\n".join(l.rstrip("\n") for l in block).strip()
        if len(text) > DOC_COMMENT_MAX_CHARS:
            text = text[:DOC_COMMENT_MAX_CHARS].rstrip()
        return (s + 1, text) if text else None

    def with_doc(start_ln: int, raw: str) -> tuple[int, str, str | None]:
        dc = doc_comment(start_ln)
        if not dc:
            return start_ln, raw, None
        return dc[0], f"{dc[1]}\n{raw}", dc[1]

    symbols: list[tuple[int, int, str, str, str, str]] = []

    def scan_class(ln: int, name: str, exported: bool, decor: int | None) -> int:
        end = body_end(ln)
        chunk_start = decor if decor is not None else ln
        raw = slice_lines(chunk_start, end)
        # methods: depth exactly class-body level inside [ln+?, end]
        body_depth = depth_before[ln] + 1
        method_syms: list[tuple[int, int, str]] = []
        names: list[str] = []
        pending_mdecor: int | None = None
        li = ln
        while li <= end:
            li += 1
            if li > end:
                break
            if depth_before[li] != body_depth:
                continue
            mline = masked[li - 1]
            # STANDALONE method decorators (@HostListener(...)) attach to
            # the following method chunk; a same-line decorated property
            # (@Input() title = '';) is self-contained and must not
            if _JS_DECOR_RE.match(mline):
                if _decor_only_line(mline):
                    if pending_mdecor is None:
                        pending_mdecor = li
                else:
                    pending_mdecor = None
                continue
            m = _JS_METHOD_RE.match(mline)
            if not m or m.group(1).lstrip("#") in _JS_METHOD_SKIP:
                if mline.strip():
                    pending_mdecor = None
                continue
            mend = body_end(li)
            names.append(m.group(1))
            method_syms.append(
                (pending_mdecor if pending_mdecor is not None else li, mend,
                 m.group(1))
            )
            pending_mdecor = None
            li = mend
        display = f"export class {name}" if exported else f"class {name}"
        cstart, _, dtext = with_doc(chunk_start, raw)
        parts = ([dtext] if dtext else []) + [first_line(raw)]
        if names:
            parts.append("Methods: " + ", ".join(names))
        symbols.append((cstart, end, "class", name, display, "\n".join(parts)))
        for ms, me, mname in method_syms:
            mraw = slice_lines(ms, me)
            mstart, mtext, _ = with_doc(ms, mraw)
            symbols.append(
                (mstart, me, "method", f"{name}.{mname}", f"{name}.{mname}", mtext)
            )
        return end

    ln = 1
    pending_decor: int | None = None  # first line of a decorator block
    while ln <= max_line:
        if depth_before[ln] != 0:
            ln += 1
            continue
        mline = masked[ln - 1]
        # STANDALONE decorator block at module level: attaches to the NEXT
        # class/function symbol (tree-sitter parity for @Component({...}));
        # multi-line decorator args ride through the depth>0 skip above,
        # while a same-line decorated statement resets the block
        if _JS_DECOR_RE.match(mline):
            if _decor_only_line(mline):
                if pending_decor is None:
                    pending_decor = ln
            else:
                pending_decor = None
            ln += 1
            continue
        cm = _JS_CLASS_RE.match(mline)
        if cm:
            ln = scan_class(
                ln, cm.group(1), mline.lstrip().startswith("export"),
                pending_decor,
            ) + 1
            pending_decor = None
            continue
        fm = _JS_FUNC_RE.match(mline)
        if fm:
            end = body_end(ln)
            start0 = pending_decor if pending_decor is not None else ln
            pending_decor = None
            raw = slice_lines(start0, end)
            start, text, _ = with_doc(start0, raw)
            symbols.append(
                (start, end, "function", fm.group(1) or "anonymous",
                 first_line(raw), text)
            )
            ln = end + 1
            continue
        am = _JS_ARROW_RE.match(mline)
        if am:
            end = body_end(ln) if "{" in mline[am.end() - 2 :] else stmt_end(ln)
            start0 = pending_decor if pending_decor is not None else ln
            pending_decor = None
            raw = slice_lines(start0, end)
            start, text, _ = with_doc(start0, raw)
            symbols.append(
                (start, end, "function", am.group(1), first_line(raw), text)
            )
            ln = end + 1
            continue
        if mline.strip():
            pending_decor = None  # intervening statement breaks the block
        ln += 1

    symbols.sort(key=lambda s: s[0])
    chunks: list[CodeChunk] = []

    def add_module_chunk(start: int, end: int, *, prelude: bool) -> None:
        text = slice_lines(start, end)
        if text.strip():
            chunks.append(
                CodeChunk(
                    "module",
                    "module" if prelude else "module_globals",
                    "module" if prelude else "module globals",
                    text,
                    start,
                    end,
                )
            )

    if not symbols:
        add_module_chunk(1, max_line, prelude=True)
        return chunks

    cursor = 1
    seen = False
    last_end = 0
    for start, end, kind, name, display, text in symbols:
        if cursor < start and start - 1 > last_end:
            add_module_chunk(cursor, start - 1, prelude=not seen)
        chunks.append(CodeChunk(kind, name, display, text, start, end))
        # methods nest inside their class span — don't regress the cursor
        cursor = max(cursor, end + 1)
        last_end = max(last_end, end)
        seen = True
    if cursor <= max_line:
        add_module_chunk(cursor, max_line, prelude=False)
    return chunks


def extract_code_chunks(url: str, source: str) -> list[CodeChunk]:
    """Suffix dispatch (content_extract_service.py:234-253)."""
    suffix = url[url.rfind(".") :].lower() if "." in url else ""
    if suffix == ".py":
        return extract_python_chunks(source)
    if suffix in JSTS_SUFFIXES:
        return extract_js_chunks(source)
    return []


# --------------------------------------------------------------------------
# Markdown outline (content_extract_service.py:494-696)
# --------------------------------------------------------------------------

_FENCE_RE = re.compile(r"^\s*([`~]{3,})")
_ATX_RE = re.compile(r"^\s{0,3}(#{1,6})\s+(.*)$")
_SETEXT_RE = re.compile(r"^\s{0,3}([=-]{3,})\s*$")

OUTLINE_SUFFIXES = (".md", ".markdown", ".mdx")


def extract_outline_chunks(
    source: str, *, context_char_limit: int = 800
) -> list[OutlineChunk]:
    """Markdown source → breadcrumb-labelled heading-section chunks."""
    if not source:
        return []
    source = source.replace("\r\n", "\n")
    lines = source.splitlines()
    if not lines:
        return []

    front_matter_end: int | None = None
    if lines[0].strip() == "---":
        for idx in range(1, len(lines)):
            if lines[idx].strip() in ("---", "..."):
                front_matter_end = idx
                break

    headings: list[tuple[int, int, int, str, int]] = []  # line,end,level,title,content_start
    starts: set[int] = set()
    in_fence = False
    fence_char = ""
    fence_len = 0
    prev: tuple[int, str] | None = None  # (index, text) of candidate setext title

    for idx, line in enumerate(lines, start=1):
        if front_matter_end is not None and idx <= front_matter_end + 1:
            prev = None
            continue
        fm = _FENCE_RE.match(line)
        if fm:
            marker = fm.group(1)
            if not in_fence:
                in_fence, fence_char, fence_len = True, marker[0], len(marker)
            elif marker[0] == fence_char and len(marker) >= fence_len:
                in_fence, fence_char, fence_len = False, "", 0
            prev = None
            continue
        if in_fence:
            continue
        atx = _ATX_RE.match(line)
        if atx:
            title = re.sub(r"\s#+\s*$", "", atx.group(2).strip()).strip()
            if title and idx not in starts:
                starts.add(idx)
                headings.append((idx, idx, len(atx.group(1)), title, idx + 1))
            prev = None
            continue
        st = _SETEXT_RE.match(line)
        if st and prev is not None:
            if prev[1].lstrip().startswith("#"):
                prev = (idx, line)
                continue
            title = prev[1].strip()
            if title and prev[0] not in starts:
                starts.add(prev[0])
                level = 1 if st.group(1).startswith("=") else 2
                headings.append((prev[0], idx, level, title, idx + 1))
            prev = None
            continue
        prev = (idx, line) if line.strip() else None

    if not headings:
        return []
    headings.sort(key=lambda h: h[0])

    preamble_start = 1 if front_matter_end is None else front_matter_end + 2
    if preamble_start <= headings[0][0] - 1:
        pre_text = cleanup_snippet(
            "\n".join(lines[preamble_start - 1 : headings[0][0] - 1])
        )
        if pre_text:
            headings.insert(
                0, (preamble_start, headings[0][0] - 1, 0, "preamble", preamble_start)
            )

    stack: list[tuple[int, str]] = []
    chunks: list[OutlineChunk] = []
    for i, (hline, hend, level, title, content_start) in enumerate(headings):
        if level == 0:
            breadcrumb = "preamble"
        else:
            while stack and stack[-1][0] >= level:
                stack.pop()
            stack.append((level, title))
            breadcrumb = " > ".join(t for _, t in stack)
        section_end = len(lines)
        for nline, _, nlevel, _, _ in headings[i + 1 :]:
            if nline <= hline:
                continue
            if level == 0 or nlevel <= level:
                section_end = nline - 1
                break
        start = max(content_start, 1)
        end = max(section_end, start)
        cleaned = cleanup_snippet("\n".join(lines[start - 1 : end])) or ""
        if context_char_limit > 0 and len(cleaned) > context_char_limit:
            cleaned = cleaned[:context_char_limit].rstrip()
        chunks.append(OutlineChunk(level, title, breadcrumb, cleaned, hline, section_end))
    return chunks


# --------------------------------------------------------------------------
# Mode payloads (modes.py:127-227): chunk → (label, preview, lines)
# --------------------------------------------------------------------------


def code_payloads(
    url: str,
    text: str,
    *,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[dict]:
    """CodeStrategy payloads; FullStrategy sliding-window fallback."""
    name = url.rsplit("/", 1)[-1]
    chunks = extract_code_chunks(url, text)
    payloads: list[dict] = []
    if chunks:
        chunk_index = 0
        for ch in chunks:
            windows = chunk_text(ch.text, chunk_size, overlap)
            total = len(windows)
            for li, window in enumerate(windows, start=1):
                normalized = _normalize_preview_chunk(window)
                if not normalized:
                    continue
                suffix = f" [#{li}]" if total > 1 else ""
                payloads.append(
                    {
                        "label": f"{name} :: {ch.display}{suffix} :: {normalized}",
                        "preview": f"{ch.display}{suffix} :: {_trim_preview(normalized)}",
                        "kind": ch.kind,
                        "symbol": ch.name,
                        "chunk_index": chunk_index,
                        "start_line": ch.start_line,
                        "end_line": ch.end_line,
                    }
                )
                chunk_index += 1
    if not payloads:  # FullStrategy fallback (modes.py:96-121)
        for index, window in enumerate(chunk_text(text, chunk_size, overlap)):
            normalized = _normalize_preview_chunk(window)
            if not normalized:
                continue
            payloads.append(
                {
                    "label": f"{name} [#{index + 1}] :: {normalized}",
                    "preview": _trim_preview(normalized),
                    "kind": "full",
                    "symbol": "",
                    "chunk_index": index,
                    "start_line": 0,
                    "end_line": 0,
                }
            )
    return payloads


def outline_payloads(
    url: str, text: str, *, context_char_limit: int = 800
) -> list[dict]:
    """OutlineStrategy payloads; FullStrategy fallback for heading-less md."""
    name = url.rsplit("/", 1)[-1]
    chunks = extract_outline_chunks(text, context_char_limit=context_char_limit)
    payloads: list[dict] = []
    for index, ch in enumerate(chunks):
        if ch.text:
            label = f"{name} :: {ch.breadcrumb} :: {ch.text}"
            preview = f"{ch.breadcrumb} :: {_trim_preview(ch.text)}"
        else:
            label = f"{name} :: {ch.breadcrumb}"
            preview = ch.breadcrumb
        payloads.append(
            {
                "label": label,
                "preview": preview,
                "kind": "outline",
                "symbol": ch.breadcrumb,
                "chunk_index": index,
                "start_line": ch.start_line,
                "end_line": ch.end_line,
            }
        )
    if not payloads:
        for index, window in enumerate(chunk_text(text)):
            normalized = _normalize_preview_chunk(window)
            if not normalized:
                continue
            payloads.append(
                {
                    "label": f"{name} [#{index + 1}] :: {normalized}",
                    "preview": _trim_preview(normalized),
                    "kind": "full",
                    "symbol": "",
                    "chunk_index": index,
                    "start_line": 0,
                    "end_line": 0,
                }
            )
    return payloads


def _payloads_auto(url: str, text: str) -> list[dict]:
    low = url.lower()
    if low.endswith(OUTLINE_SUFFIXES):
        return outline_payloads(url, text)
    return code_payloads(url, text)


# --------------------------------------------------------------------------
# Distributed chunk-corpus writer (same fan-out as chunker.chunk_pages)
# --------------------------------------------------------------------------


@ray.remote
def _mode_chunk_fragment(
    path: str, row_group: int | None, out_path: str, mode: str
) -> int:
    fns = {"code": code_payloads, "outline": outline_payloads, "auto": _payloads_auto}
    fn = fns[mode]
    pf = pq.ParquetFile(path)
    tbl = (
        pf.read(columns=["url", "text"])
        if row_group is None
        else pf.read_row_group(row_group, columns=["url", "text"])
    )
    rows: dict[str, list] = {
        "url": [], "text": [], "preview": [], "kind": [], "symbol": [],
        "start_line": [], "end_line": [],
    }
    for url, text in zip(tbl.column("url").to_pylist(), tbl.column("text").to_pylist()):
        if not text:
            continue
        for p in fn(url, text):
            rows["url"].append(f"{url}#chunk{p['chunk_index']:05d}")
            rows["text"].append(p["label"])
            rows["preview"].append(p["preview"])
            rows["kind"].append(p["kind"])
            rows["symbol"].append(p["symbol"])
            rows["start_line"].append(p["start_line"])
            rows["end_line"].append(p["end_line"])
    out = pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "text": pa.array(rows["text"], pa.large_string()),
            "preview": pa.array(rows["preview"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "symbol": pa.array(rows["symbol"], pa.string()),
            "start_line": pa.array(rows["start_line"], pa.int32()),
            "end_line": pa.array(rows["end_line"], pa.int32()),
        }
    )
    import os

    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, out_path)
    return out.num_rows


def chunk_mode_pages(
    source: str | Path | list, out_dir: str | Path, *, mode: str = "auto"
) -> list[str]:
    """Pre-extracted pages shards → code/outline chunk-corpus shards.

    The output is a pre-extracted corpus whose ``text`` column holds the
    reference's mode LABELS; ``build_index(..., pre_extracted=True,
    doc_builder="text")`` over it is the CodeStrategy / OutlineStrategy
    index.  One Ray task per input row group, like ``chunk_pages``.
    """
    if mode not in ("code", "outline", "auto"):
        raise ValueError(f"unknown mode {mode!r}")
    if isinstance(source, (str, Path)):
        p = Path(source)
        files = sorted(str(f) for f in p.glob("*.parquet")) if p.is_dir() else [str(p)]
    else:
        files = sorted(str(f) for f in source)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    futs = []
    for fi, f in enumerate(files):
        n_rg = pq.ParquetFile(f).metadata.num_row_groups
        frags = [None] if n_rg <= 1 else list(range(n_rg))
        for rg in frags:
            out_path = str(out / f"chunks-{fi:05d}-{(rg or 0):04d}.parquet")
            futs.append(_mode_chunk_fragment.remote(f, rg, out_path, mode))
    ray.get(futs)
    return sorted(str(f) for f in out.glob("chunks-*.parquet"))
