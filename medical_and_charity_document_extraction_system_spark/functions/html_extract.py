"""HTML main-content extraction (boilerplate stripping).

This is the web-page analog of the reference's 4-stage image
preprocessing + OCR (north_star): instead of enhance/denoise/deskew/
binarize over pixels we score DOM blocks by **text density** and
**link density** (readability/jusText-style) and keep high-text,
low-link blocks.

Structure deliberately mirrors the reference's dispatcher pattern
(/root/reference/backend/app/core/image_processors/binarizer.py:14-41):
a method registry with an ``auto`` mode that branches on input
statistics (binarizer.py:43-62 branches on pixel std; we branch on
overall link share).

Pure Python on purpose: this module is called from inside a
``mapInPandas`` stage (one Arrow batch at a time); it must not import
pyspark. Uses only stdlib ``html.parser`` (no bs4/lxml dependency).
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

# tags that open a new text block (flush the current segment)
BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6", "td", "tr", "table",
    "blockquote", "pre", "br", "hr", "body", "html",
}
# subtrees dropped entirely (never contribute text)
DROP_TAGS = {
    "script", "style", "head", "title", "nav", "footer", "header",
    "aside", "form", "noscript", "svg", "button", "select", "option",
    "iframe", "template",
}
VOID_TAGS = {"br", "hr", "img", "meta", "link", "input"}


@dataclass
class Block:
    text: str
    chars: int
    link_chars: int

    @property
    def link_density(self) -> float:
        return self.link_chars / self.chars if self.chars else 0.0


class _BlockCollector(HTMLParser):
    """Event-driven segmenter: text accumulates into the current block;
    block-level start/end tags flush; DROP_TAGS subtrees are skipped."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._chunks: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._link_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._chunks).split())
        if text:
            self.blocks.append(Block(text, len(text), min(self._link_chars, len(text))))
        self._chunks = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            if tag not in VOID_TAGS:
                self._drop_depth += 1
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        self._chunks.append(data)
        if self._link_depth:
            self._link_chars += len("".join(data.split()))  # approx; refined below

    def close(self) -> None:  # noqa: D102
        super().close()
        self._flush()


def extract_blocks(html_str: str) -> list[Block]:
    parser = _BlockCollector()
    parser.feed(html_str)
    parser.close()
    return parser.blocks


# ---------------------------------------------------- fast regex scanner
# stdlib HTMLParser spends ~84% of the extraction stage's CPU in
# per-tag attribute parsing and position tracking we never use. This
# scanner tokenizes with one compiled regex and feeds the same
# block/drop/link state machine; on well-formed HTML the output is
# identical (tests assert equality over the whole synthetic corpus).
# Divergence is confined to pathological tag soup (stray '<' recovery),
# where neither answer is canonical.

_TOKEN_RE = __import__("re").compile(
    r"<!--.*?(?:-->|$)"                       # comments (unterminated: to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"             # CDATA
    r"|<![^>]*>?"                             # doctype / declarations
    r"|<\?[^>]*>?"                            # processing instructions
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)"        # tag open: slash + name
    r"(?:\"[^\"]*\"|'[^']*'|[^>\"'])*>?"      #   attrs (quoted '>' safe)
    r"|[^<]+",                                # text run
    __import__("re").S,
)
_RAWTEXT_END = {
    "script": __import__("re").compile(r"</script[\s>]", __import__("re").I),
    "style": __import__("re").compile(r"</style[\s>]", __import__("re").I),
}


def extract_blocks_fast(html_str: str) -> list[Block]:
    import html as _h

    blocks: list[Block] = []
    chunks: list[str] = []
    append = chunks.append
    link_chars = 0
    drop_depth = 0
    link_depth = 0

    def flush() -> None:
        nonlocal link_chars
        if chunks:  # adjacent block tags flush empty — skip the joins
            text = " ".join("".join(chunks).split())
            if text:
                blocks.append(Block(text, len(text), min(link_chars, len(text))))
            chunks.clear()
        link_chars = 0

    # finditer drives the token walk in C (the re.match-with-pos loop
    # this replaces spent most of its time in Python loop overhead —
    # measured ~1.5x on the fused extraction stage). A stray '<' that
    # forms no token is skipped by finditer exactly as the old loop's
    # pos+=1 recovery did; rawtext (script/style) bodies are skipped by
    # position, so their inner tokens are discarded unexamined.
    # Per-call tag-dispatch cache: one dict hit replaces
    # lower() + three set-membership tests on every tag token.
    tag_kind: dict[str, int] = {}  # 0 plain, 1 rawtext, 2 drop, 3 dropvoid, 4 a, 5 block
    skip_until = 0
    for m in _TOKEN_RE.finditer(html_str):
        if skip_until:
            if m.start() < skip_until:
                continue
            skip_until = 0
        if m.lastindex is None:  # text run / comment / doctype / PI
            tok = m.group(0)
            if tok[0] == "<":
                continue
            if drop_depth == 0:
                data = _h.unescape(tok) if ("&" in tok) else tok
                append(data)
                if link_depth:
                    link_chars += len("".join(data.split()))
            continue
        name = m.group(2)
        kind = tag_kind.get(name)
        if kind is None:
            tag = name.lower()
            if tag in _RAWTEXT_END:
                kind = 1
            elif tag in DROP_TAGS:
                kind = 3 if tag in VOID_TAGS else 2
            elif tag == "a":
                kind = 4
            elif tag in BLOCK_TAGS:
                kind = 5
            else:
                kind = 0
            tag_kind[name] = kind
        if kind == 0:
            continue
        closing = m.group(1) == "/"
        if kind == 5:
            flush()
        elif kind == 2:
            drop_depth = max(0, drop_depth + (-1 if closing else 1))
        elif kind == 4:
            link_depth = max(0, link_depth + (-1 if closing else 1))
        elif kind == 1:
            if closing:
                # stray close outside a rawtext body: script/style are
                # DROP_TAGS, so it pops drop depth like the stdlib twin
                drop_depth = max(0, drop_depth - 1)
            else:
                # rawtext element: skip content up to its end tag
                end = _RAWTEXT_END[name.lower()].search(html_str, m.end())
                if end is None:
                    break
                gt = html_str.find(">", end.start())
                skip_until = gt + 1 if gt != -1 else len(html_str)
                # script/style are DROP_TAGS: nothing emitted
    flush()
    return blocks


# ------------------------------------------------------- method registry
def _density_filter(blocks: list[Block], min_chars: int, max_link_density: float) -> list[str]:
    return [
        b.text
        for b in blocks
        if b.chars >= min_chars and b.link_density <= max_link_density
    ]


def _plain(blocks: list[Block], min_chars: int, max_link_density: float) -> list[str]:
    return [b.text for b in blocks if b.text]


_METHODS = {
    "density": _density_filter,
    "plain": _plain,
}


def main_text(
    html_str: str,
    method: str = "auto",
    min_block_chars: int = 12,
    max_link_density: float = 0.35,
    parser: str = "fast",
) -> str:
    """Extract main content; kept blocks joined by ``\\n``.

    ``auto`` (reference ``_auto_binarize`` pattern, binarizer.py:43-62):
    pages with zero link text have no boilerplate signal -> ``plain``;
    otherwise ``density``. ``parser``: "fast" (regex scanner, default)
    or "stdlib" (html.parser) — identical output on well-formed HTML.
    """
    blocks = (
        extract_blocks_fast(html_str) if parser == "fast" else extract_blocks(html_str)
    )
    if method == "auto":
        total_link = sum(b.link_chars for b in blocks)
        method = "plain" if total_link == 0 else "density"
    try:
        fn = _METHODS[method]
    except KeyError:
        raise ValueError(f"unknown html extraction method: {method!r}") from None
    return "\n".join(fn(blocks, min_block_chars, max_link_density))
