"""Markdown → HTML → plain text with the reference's semantics.

The reference (``/root/reference/hugo.py:244-261``) strips Hugo
shortcode tags with ``SHORTCODE_RE = r"\\{\\{[<%]/?.*?[%>]\\}\\}"`` (content
wrapped by shortcodes is kept), renders Markdown to HTML with the
Python-Markdown package and extensions ``fenced_code`` / ``tables`` /
``attr_list``, and extracts text from that HTML with the common
extractor (``common.py:33-38``).

The Python-Markdown package is not available in this environment, so
this module implements a compact CommonMark-ish renderer that covers
exactly the constructs the reference's tests exercise
(``hugo_test.py:40-89``) and that the deterministic fixture generator
emits:

  * paragraphs separated by blank lines
  * ATX headings ``#``..``######`` with ``attr_list`` anchors
    (``## Title {#id}`` → ``<h2 id="id">Title</h2>``; the ``{#id}``
    never leaks into text — ``hugo_test.py:63-69``)
  * fenced code blocks with an optional language word, which becomes a
    CSS class instead of leaking into the text (``hugo_test.py:42-46``)
  * pipe tables — the ``|`` and ``---`` separators never leak
    (``hugo_test.py:48-61``)
  * unordered/ordered lists, blockquotes, horizontal rules
  * inline: ``**strong**``, ``*em*``/``_em_``, `` `code` ``, links,
    images

The renderer's HTML formatting (block elements joined by ``\\n``) is
its own; the reference invariant that matters downstream is the
*extracted text*, which is pinned by golden tests generated together
with the fixture corpus.  This is a deliberately small, deterministic
subset — not a Python-Markdown clone.
"""

from __future__ import annotations

import html as _html
import re

__all__ = ["SHORTCODE_RE", "strip_shortcodes", "markdown_to_html", "markdown_to_text"]

# Same pattern semantics as the reference (hugo.py:54-57): matches Hugo
# shortcode tags in both {{< ... >}} and {{% ... %}} delimiter styles,
# opening, closing (leading /) and parameterized forms.  Only the tag
# itself is matched, so wrapped content is preserved.
SHORTCODE_RE = re.compile(r"\{\{[<%]/?.*?[%>]\}\}")

_ATX_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_ANCHOR_RE = re.compile(r"\s*\{#([^}]*)\}\s*$")  # attr_list heading anchor
_FENCE_RE = re.compile(r"^(```+|~~~+)\s*([\w+-]*)\s*$")
_HR_RE = re.compile(r"^(?:-{3,}|\*{3,}|_{3,})\s*$")
_ULIST_RE = re.compile(r"^[-*+]\s+(.*)$")
_OLIST_RE = re.compile(r"^\d+[.)]\s+(.*)$")
# Python-Markdown's tables extension requires a '|' in the separator
# row, so a bare '---' under a pipe-bearing line is a setext h2, not a
# table — the two call sites additionally check for the pipe
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-{2,}:?\s*(\|\s*:?-{2,}:?\s*)*\|?\s*$")
_SETEXT_RE = re.compile(r"^\s*(=+|-+)\s*$")
_QUOTE_PREFIX_RE = re.compile(r"^(?:\s*>)+\s*")

_CODE_SPAN_RE = re.compile(r"`([^`]+)`")
_IMG_RE = re.compile(r"!\[([^\]]*)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")
_LINK_RE = re.compile(r"\[([^\]]+)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")
_STRONG_RE = re.compile(r"\*\*(.+?)\*\*|__(.+?)__")
_EM_RE = re.compile(r"\*([^*\n]+)\*|\b_([^_\n]+)_\b")


def strip_shortcodes(md: str) -> str:
    """Remove Hugo shortcode tags, keeping wrapped content (hugo.py:249)."""
    return SHORTCODE_RE.sub("", md)


_CODE_PLACEHOLDER_RE = re.compile("\x02(\\d+)\x03")


def _inline(text: str) -> str:
    """Render inline Markdown spans to HTML (escapes first, spans after).

    Code spans are stashed behind STX/ETX placeholders (the
    Python-Markdown convention) before the other inline passes run —
    markdown metacharacters inside backticks (``*``, ``_``, ``[..](..)``)
    are literal content and must not be processed as markup."""
    text = _html.escape(text, quote=False)
    codes: list[str] = []

    def stash(m: re.Match) -> str:
        codes.append(m.group(1))
        return f"\x02{len(codes) - 1}\x03"

    text = _CODE_SPAN_RE.sub(stash, text)
    text = _IMG_RE.sub(lambda m: f'<img alt="{m.group(1)}" src="{m.group(2)}" />', text)
    text = _LINK_RE.sub(lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', text)
    text = _STRONG_RE.sub(lambda m: f"<strong>{m.group(1) or m.group(2)}</strong>", text)
    text = _EM_RE.sub(lambda m: f"<em>{m.group(1) or m.group(2)}</em>", text)
    if codes:
        text = _CODE_PLACEHOLDER_RE.sub(
            lambda m: f"<code>{codes[int(m.group(1))]}</code>", text
        )
    return text


def _split_row(line: str) -> list[str]:
    row = line.strip()
    if row.startswith("|"):
        row = row[1:]
    if row.endswith("|"):
        row = row[:-1]
    return [c.strip() for c in row.split("|")]


def markdown_to_html(md: str) -> str:
    """Render the Markdown subset described in the module docstring."""
    lines = md.split("\n")
    out: list[str] = []
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue

        fence = _FENCE_RE.match(line)
        if fence:
            marker, lang = fence.group(1)[0] * 3, fence.group(2)
            body: list[str] = []
            i += 1
            while i < n and not lines[i].startswith(marker):
                body.append(lines[i])
                i += 1
            i += 1  # closing fence
            cls = f' class="language-{lang}"' if lang else ""
            code = _html.escape("\n".join(body), quote=False)
            out.append(f"<pre><code{cls}>{code}\n</code></pre>")
            continue

        atx = _ATX_RE.match(line)
        if atx:
            level, text = len(atx.group(1)), atx.group(2)
            anchor = _ANCHOR_RE.search(text)
            attr = ""
            if anchor:
                text = text[: anchor.start()].rstrip()
                attr = f' id="{anchor.group(1)}"'
            out.append(f"<h{level}{attr}>{_inline(text)}</h{level}>")
            i += 1
            continue

        if _HR_RE.match(line.strip()) and not _ULIST_RE.match(line):
            out.append("<hr />")
            i += 1
            continue

        if line.lstrip().startswith(">"):
            # strip ALL '>' nesting levels per line in one pass: a
            # recursive one-level-per-call strip blew the stack on
            # long '>>>…' runs, and nesting depth only affects HTML
            # shape, never the extracted text downstream
            quoted: list[str] = []
            while i < n and lines[i].lstrip().startswith(">"):
                quoted.append(_QUOTE_PREFIX_RE.sub("", lines[i]))
                i += 1
            out.append(f"<blockquote>\n{markdown_to_html(chr(10).join(quoted))}\n</blockquote>")
            continue

        # pipe table: header row + separator row (separator must itself
        # contain a pipe, per the tables extension)
        if (
            "|" in line
            and i + 1 < n
            and "|" in lines[i + 1]
            and _TABLE_SEP_RE.match(lines[i + 1])
        ):
            header = _split_row(line)
            i += 2
            rows: list[list[str]] = []
            while i < n and "|" in lines[i] and lines[i].strip():
                rows.append(_split_row(lines[i]))
                i += 1
            parts = ["<table>", "<thead>", "<tr>"]
            parts += [f"<th>{_inline(h)}</th>" for h in header]
            parts += ["</tr>", "</thead>", "<tbody>"]
            for row in rows:
                parts.append("<tr>")
                parts += [f"<td>{_inline(c)}</td>" for c in row]
                parts.append("</tr>")
            parts += ["</tbody>", "</table>"]
            out.append("\n".join(parts))
            continue

        ul = _ULIST_RE.match(line.strip())
        ol = _OLIST_RE.match(line.strip())
        if ul or ol:
            tag = "ul" if ul else "ol"
            pat = _ULIST_RE if ul else _OLIST_RE
            items: list[str] = []
            while i < n:
                m = pat.match(lines[i].strip())
                if not m:
                    break
                items.append(f"<li>{_inline(m.group(1))}</li>")
                i += 1
            out.append(f"<{tag}>\n" + "\n".join(items) + f"\n</{tag}>")
            continue

        # paragraph: gather until a blank line or a block construct; a
        # setext underline ('===' / '---') directly below promotes the
        # gathered text to a heading (Python-Markdown's precedence —
        # the underline itself never leaks into the extracted text)
        para: list[str] = [line]
        i += 1
        setext_level = 0
        while i < n and lines[i].strip():
            nxt = lines[i]
            if _SETEXT_RE.match(nxt):
                setext_level = 1 if nxt.strip()[0] == "=" else 2
                i += 1
                break
            if _HR_RE.match(nxt.strip()) and nxt.strip()[0] in "*_":
                break  # '***'/'___' ends the paragraph; hr renders next
            if (
                _FENCE_RE.match(nxt)
                or _ATX_RE.match(nxt)
                or nxt.lstrip().startswith(">")
                or _ULIST_RE.match(nxt.strip())
                or _OLIST_RE.match(nxt.strip())
                or (
                    "|" in nxt
                    and i + 1 < n
                    and "|" in lines[i + 1]
                    and _TABLE_SEP_RE.match(lines[i + 1])
                )
            ):
                break
            para.append(nxt)
            i += 1
        body = _inline(chr(10).join(para))
        if setext_level:
            out.append(f"<h{setext_level}>{body}</h{setext_level}>")
        else:
            out.append(f"<p>{body}</p>")

    return "\n".join(out)


def markdown_to_text(md: str) -> str:
    """Shortcode strip → Markdown render → text extraction (hugo.py:244-261)."""
    from .htmltext import html_to_text

    return html_to_text(markdown_to_html(strip_shortcodes(md)))
