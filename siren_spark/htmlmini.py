"""Minimal HTML DOM + CSS-selector subset (stdlib-only).

The reference parses HTML with BeautifulSoup(html, "html.parser")
(mirror.py:66, online/telegraph.py:69, ht.py:199, epaper/telegraph.py:45).
bs4 is not available in this runtime, so this module provides the small
slice of its behavior the extraction kernels rely on:

- ``find`` / ``find_all`` by tag, class_, type, id
- ``select`` / ``select_one`` supporting: tag, .class, #id, compound
  (tag.class), descendant (space), child (>), and :nth-child(n)
- ``Node.text``: concatenation of all descendant strings in document
  order with no separator (bs4 ``Tag.text`` semantics)
- ``Node.extract()``: detach a subtree (mirror.py:68-69)

Entity decoding is handled by html.parser (convert_charrefs=True), same
as bs4's html.parser backend. Inputs are the engine's own synthetic-web
fixtures, i.e. well-formed; the parser still tolerates unclosed void
elements.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[object] = []  # Node | str
        self.parent: Node | None = None

    # -- tree --------------------------------------------------------
    def append(self, child: object) -> None:
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)

    def extract(self) -> "Node":
        """Detach this node from its parent (bs4 Tag.extract)."""
        if self.parent is not None:
            self.parent.children = [c for c in self.parent.children if c is not self]
            self.parent = None
        return self

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    # -- text --------------------------------------------------------
    @property
    def text(self) -> str:
        out: list[str] = []
        stack: list[object] = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                stack.extend(reversed(c.children))
            else:
                out.append(c)  # type: ignore[arg-type]
        return "".join(out)

    # -- queries -----------------------------------------------------
    def _iter(self):
        stack: list[Node] = list(reversed(self.element_children()))
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed(n.element_children()))

    def _matches(self, tag=None, class_=None, type=None, id=None) -> bool:
        if tag is not None and self.tag != tag:
            return False
        if class_ is not None:
            # bs4 class_ string matches the full class attribute token-set
            want = class_.split()
            have = self.attrs.get("class", "").split()
            if sorted(want) != sorted(have) and not all(w in have for w in want):
                return False
        if type is not None and self.attrs.get("type") != type:
            return False
        if id is not None and self.attrs.get("id") != id:
            return False
        return True

    def find_all(self, tag=None, class_=None, type=None, id=None) -> list["Node"]:
        return [n for n in self._iter() if n._matches(tag, class_, type, id)]

    def find(self, tag=None, class_=None, type=None, id=None) -> "Node | None":
        for n in self._iter():
            if n._matches(tag, class_, type, id):
                return n
        return None

    def get(self, attr: str, default=None):
        return self.attrs.get(attr, default)

    def __getitem__(self, attr: str) -> str:
        return self.attrs[attr]

    # -- CSS subset ---------------------------------------------------
    def select(self, selector: str) -> list["Node"]:
        parts = _parse_selector(selector)
        matched: list[Node] = []
        seen: set[int] = set()
        for n in self._iter():
            if _match_chain(n, parts) and id(n) not in seen:
                seen.add(id(n))
                matched.append(n)
        return matched

    def select_one(self, selector: str) -> "Node | None":
        res = self.select(selector)
        return res[0] if res else None

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} {self.attrs}>"


_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<nth>:nth-child\(\d+\))?$"
)


def _parse_selector(selector: str):
    """'a > b c' → [(simple, combinator_to_previous)], right-to-left."""
    toks = selector.replace(">", " > ").split()
    parts: list[tuple[dict, str]] = []  # (simple, combinator: '' | '>' )
    comb = ""
    pending: str | None = None
    for tok in toks:
        if tok == ">":
            pending = ">"
            continue
        m = _SIMPLE_RE.match(tok)
        if not m:
            raise ValueError(f"unsupported selector: {tok!r} in {selector!r}")
        simple = {
            "tag": m.group("tag") if m.group("tag") not in (None, "*") else None,
            "id": m.group("id")[1:] if m.group("id") else None,
            "classes": [c for c in (m.group("classes") or "").split(".") if c],
            "nth": int(m.group("nth")[11:-1]) if m.group("nth") else None,
        }
        parts.append((simple, comb))
        comb = pending or " "
        pending = None
    return parts


def _match_simple(n: Node, s: dict) -> bool:
    if s["tag"] and n.tag != s["tag"]:
        return False
    if s["id"] and n.attrs.get("id") != s["id"]:
        return False
    if s["classes"]:
        have = n.attrs.get("class", "").split()
        if not all(c in have for c in s["classes"]):
            return False
    if s["nth"] is not None:
        if n.parent is None:
            return False
        sibs = n.parent.element_children()
        if sibs.index(n) + 1 != s["nth"]:
            return False
    return True


def _match_chain(n: Node, parts) -> bool:
    """Match the selector chain ending at node n (right-to-left walk)."""
    idx = len(parts) - 1
    simple, _ = parts[idx]
    if not _match_simple(n, simple):
        return False
    cur = n
    while idx > 0:
        comb = parts[idx][1]
        idx -= 1
        simple = parts[idx][0]
        if comb == ">":
            cur = cur.parent
            if cur is None or not _match_simple(cur, simple):
                return False
        else:  # descendant
            anc = cur.parent
            while anc is not None and not _match_simple(anc, simple):
                anc = anc.parent
            if anc is None:
                return False
            cur = anc
    return True


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].append(Node(tag, {k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].append(data)


# ---------------------------------------------------------------------------
# Fast tokenizer path. The stdlib HTMLParser costs ~45% of kernel parse
# time in per-character goahead()/updatepos() bookkeeping this engine
# never uses (error positions, convert-charref rescan windows). This
# tokenizer walks the document with ONE compiled regex and reuses the
# stdlib's own attrfind_tolerant loop verbatim for attribute parity;
# handle_* semantics (lowercased names, unescaped data/attr values,
# script/style CDATA content model, void elements) match _TreeBuilder.
# Equivalence is pinned by tests/test_kernels.py::test_fast_parser_
# differential — any html that the fast path cannot tokenize cleanly
# (truncated tag at EOF) falls back to the stdlib builder for that page.
# ---------------------------------------------------------------------------

from html import unescape as _unescape
from html.parser import attrfind_tolerant as _attrfind

_FAST_TOKEN_RE = re.compile(
    r"<(?:"
    r"!--.*?--\s*"                                    # comment
    r"|![^>]*"                                        # decl / doctype
    r"|\?[^>]*"                                       # processing instr
    # end tag: the name class mirrors stdlib tagfind_tolerant (stops at
    # '/' and controls) so a bogus '</di/v>' closes 'di' exactly like
    # HTMLParser's discarded-tag path does
    r"|/(?P<end>[a-zA-Z][^\t\n\r\f />\x00]*)\s*[^>]*"
    r"|(?P<start>[a-zA-Z][^\t\n\r\f />]*)"            # start tag name
    r"(?P<body>(?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"      # attrs (quote-aware)
    r")>",
    re.S,
)
_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s" % t, re.I) for t in ("script", "style")
}
# a CDATA close *candidate* only actually closes the element if it is a
# full well-formed end tag for exactly that element (stdlib endtagfind +
# the elem == cdata_elem check in parse_endtag); anything else — e.g.
# '</scripty>' or '</script foo>' — keeps HTMLParser in CDATA mode, and
# the fast path bails to the reference builder for those pages
_CDATA_CLOSE_FULL = {
    t: re.compile(r"</\s*%s\s*>" % t, re.I) for t in ("script", "style")
}
# stdlib _markupbase._commentclose — '<!--' with no such close anywhere
# after it is an *unterminated* comment, which HTMLParser re-emits as
# data at EOF rather than swallowing as a declaration
_COMMENT_CLOSE = re.compile(r"--\s*>")
# stdlib tagfind_tolerant's trailing (?:\s|/(?!>))* — the position attr
# scanning starts from after the tag name
_TAGTAIL = re.compile(r"(?:\s|/(?!>))*")


def _fast_parse(html: str) -> Node:
    root = Node("[document]")
    stack = [root]
    pos, n = 0, len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            data = html[pos:]
            if data:
                stack[-1].append(_unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            stack[-1].append(_unescape(data) if "&" in data else data)
        if html.startswith("<!--", lt) and \
                _COMMENT_CLOSE.search(html, lt + 4) is None:
            # unterminated comment: stdlib re-emits '<!-- ... >' as data
            # at EOF; the decl branch below would swallow it — bail
            raise ValueError("unterminated comment")
        m = _FAST_TOKEN_RE.match(html, lt)
        if m is None:
            # stray '<' (or truncated tag at EOF): stdlib emits it as
            # data and continues after it — but a '</' the end-tag
            # branch couldn't match ('</ div>', '</>') takes stdlib's
            # whitespace-tolerant endtagfind / bogus-tag paths, which
            # this tokenizer does not model: bail to the reference
            # builder for byte-identical behavior
            if html.startswith("</", lt) or html.find(">", lt) < 0:
                raise ValueError("unterminated markup")
            stack[-1].append("<")
            pos = lt + 1
            continue
        pos = m.end()
        tag = m.group("start")
        if tag is not None:
            tag = tag.lower()
            # replicate stdlib parse_starttag exactly: operate on the
            # attr text with its terminating '>' present so the
            # (?:\s|/(?!>))* trailing-consumption and the '/>' check see
            # the same context as HTMLParser's rawdata scan
            s = (m.group("body") or "") + ">"
            bend = len(s) - 1
            attrs: dict[str, str] = {}
            k = _TAGTAIL.match(s, 0).end()
            while k < bend:
                am = _attrfind.match(s, k)
                if not am:
                    break
                name, rest, value = am.group(1, 2, 3)
                if not rest:
                    value = ""
                elif (value[:1] == "'" == value[-1:]
                      or value[:1] == '"' == value[-1:]):
                    value = value[1:-1]
                if value and "&" in value:
                    value = _unescape(value)
                attrs[name.lower()] = value or ""
                k = am.end()
            node = Node(tag, attrs)
            stack[-1].append(node)
            if s[k:] == "/>":
                continue                               # self-closing <x/>
            if tag in _VOID:
                continue
            if tag in _CDATA_CLOSE:
                cm = _CDATA_CLOSE[tag].search(html, pos)
                if cm is not None:
                    # the candidate only closes the element if it is a
                    # full '</tag>' end tag; stdlib keeps '</scripty>'
                    # or '</script foo>' as CDATA *data* and scans on —
                    # a loop this tokenizer doesn't model, so bail
                    fm = _CDATA_CLOSE_FULL[tag].match(html, cm.start())
                    if fm is None:
                        raise ValueError("bogus end tag in CDATA")
                stop = cm.start() if cm else n
                if stop > pos:
                    node.append(html[pos:stop])        # raw: no unescape
                if cm is None:
                    break
                pos = fm.end()
                continue
            stack.append(node)
        else:
            end = m.group("end")
            if end is not None:
                end = end.lower()
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == end:
                        del stack[i:]
                        break
        # comments/decls/PIs: no handler in _TreeBuilder either
    return root


def parse_html(html: str) -> Node:
    """Parse HTML into a Node tree (root tag '[document]')."""
    try:
        return _fast_parse(html or "")
    except ValueError:
        pass
    b = _TreeBuilder()
    b.feed(html or "")
    b.close()
    return b.root


def parse_html_reference(html: str) -> Node:
    """The stdlib-HTMLParser builder (differential-test reference)."""
    b = _TreeBuilder()
    b.feed(html or "")
    b.close()
    return b.root


__all__ = ["Node", "parse_html", "parse_html_reference"]
