"""HTML → plain text extraction with the reference's semantics.

The reference (``/root/reference/common.py:33-38``) does::

    parser = BeautifulSoup(html, features="html.parser")
    return ''.join(parser.find_all(string=True))

i.e. the concatenation, in document order with an empty-string joiner,
of **every** string node the ``html.parser`` tree builder produces:
ordinary text (entities decoded), the raw contents of ``<script>`` /
``<style>`` elements, comment bodies, declaration bodies and processing
instructions.  Whitespace between tags is preserved exactly — the
reference's golden test (``common_test.py:13-20``) pins leading and
trailing newlines.

bs4 is not available in this environment, so this module re-creates
those semantics directly on the stdlib ``html.parser.HTMLParser`` (the
same tokenizer bs4's ``html.parser`` builder wraps), with
``convert_charrefs=True`` exactly as bs4 configures it.  The golden
corpus in ``tests/test_extract.py`` (taken verbatim from the
reference's test suite) pins byte-identical behaviour.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["html_to_text", "html_to_text_batch"]


class _TextNodeWalker(HTMLParser):
    """Collects every string node ``html.parser`` emits, in document order.

    Mirrors ``BeautifulSoup(..., features="html.parser")`` +
    ``find_all(string=True)``: NavigableString subclasses include
    Comment / Declaration / Doctype / ProcessingInstruction, so their
    bodies are collected too (reference ``common.py:33-38`` joins all
    of them with ``''``).
    """

    def __init__(self) -> None:
        # bs4's HTMLParserTreeBuilder passes convert_charrefs=True, so
        # character/entity references arrive decoded inside handle_data.
        super().__init__(convert_charrefs=True)
        self._parts: list[str] = []

    # ordinary text nodes (and raw <script>/<style> contents — the
    # tokenizer switches to CDATA content mode for those and still
    # reports the bytes via handle_data, matching bs4)
    def handle_data(self, data: str) -> None:
        self._parts.append(data)

    # <!-- comment --> → Comment("comment"), a NavigableString subclass
    def handle_comment(self, data: str) -> None:
        self._parts.append(data)

    # <!DOCTYPE html> → Doctype string node; bs4's builder strips the
    # "DOCTYPE " prefix before creating it, so '<!DOCTYPE html>'
    # contributes 'html', never 'DOCTYPE html'
    def handle_decl(self, decl: str) -> None:
        if decl.startswith("DOCTYPE "):
            decl = decl[len("DOCTYPE ") :]
        elif decl == "DOCTYPE":
            decl = ""
        self._parts.append(decl)

    # <![CDATA[...]]> and other unknown declarations; bs4 strips the
    # "CDATA[" prefix when building CData nodes
    def unknown_decl(self, data: str) -> None:
        if data.startswith("CDATA["):
            data = data[len("CDATA[") :]
        self._parts.append(data)

    # <?php ... ?> → ProcessingInstruction string node
    def handle_pi(self, data: str) -> None:
        self._parts.append(data)

    def text(self) -> str:
        return "".join(self._parts)


def html_to_text(html: str | bytes) -> str:
    """Plain-text (UTF-8) representation of ``html``.

    Semantics of the reference extractor ``common.py:33-38`` — see the
    module docstring.  ``bytes`` input is decoded as UTF-8 (the input
    table's ``html`` column is raw page bytes per the input contract);
    undecodable bytes are replaced rather than failing the build.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    walker = _TextNodeWalker()
    walker.feed(html)
    walker.close()
    return walker.text()


def html_to_text_batch(htmls) -> list[str]:
    """Vector form over any iterable of str/bytes (one walker per doc)."""
    return [html_to_text(h) for h in htmls]
