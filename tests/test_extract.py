"""Golden extraction tests — corpus taken verbatim from the reference's
test suite (/root/reference/common_test.py, hugo_test.py) to pin the
byte-identical per-url invariant."""

from docs_indexer_ray.functions.htmltext import html_to_text
from docs_indexer_ray.functions.minimarkdown import markdown_to_text, strip_shortcodes

# --- common_test.py:4-20 golden pair, byte-for-byte -------------------
HTML = """
<html>
<head/>
<body>
<div>This is my body</div>
</body>
</html>
"""

TEXT = """



This is my body


"""


def test_html2text_golden_byte_identical():
    assert html_to_text(HTML) == TEXT


def test_html2text_bytes_input():
    assert html_to_text(HTML.encode("utf-8")) == TEXT


def test_html2text_entities_decoded():
    assert html_to_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_html2text_all_string_nodes_joined():
    # comments, script/style contents and PI bodies are NavigableStrings
    # in bs4 and are all included by find_all(string=True) (common.py:38)
    assert html_to_text("<p>x</p><!--note--><style>.a{}</style>") == "xnote.a{}"


def test_html2text_empty_and_whitespace():
    assert html_to_text("") == ""
    assert html_to_text("  \n ") == "  \n "


# --- hugo_test.py:40-89 markdown_to_text assertions -------------------


def test_fenced_code_language_indicator_stripped():
    md = "Intro text.\n\n```nohighlight\nkubectl get pods\n```\n\nAfter text."
    text = markdown_to_text(md)
    assert "nohighlight" not in text
    assert "kubectl get pods" in text
    assert "Intro text." in text and "After text." in text


def test_table_separators_stripped():
    md = (
        "Intro.\n\n"
        "| Name | Role |\n"
        "| ---- | ---- |\n"
        "| Alice | Admin |\n"
        "| Bob | User |\n\n"
        "Outro."
    )
    text = markdown_to_text(md)
    assert "|" not in text
    assert "---" not in text
    for cell in ("Name", "Role", "Alice", "Admin", "Bob", "User"):
        assert cell in text


def test_heading_anchor_stripped():
    md = "## Resource types {#types}\n\nSome content.\n\n### Flags {#flags}\n\nMore."
    text = markdown_to_text(md)
    assert "{#types}" not in text
    assert "{#flags}" not in text
    assert "Resource types" in text
    assert "Flags" in text


def test_shortcodes_stripped():
    md = (
        "Install manually.\n\n"
        "{{< tabs >}}\n"
        '{{< tab name="Krew" >}}\n'
        "Pull the image.\n"
        "{{< /tab >}}\n"
        "{{< /tabs >}}\n\n"
        "{{% steps %}}\n"
        "Do the thing.\n"
        "{{% /steps %}}\n"
    )
    text = markdown_to_text(md)
    assert "{{" not in text and "}}" not in text
    assert "tabs" not in text and "steps" not in text
    assert "Pull the image." in text
    assert "Do the thing." in text


def test_strip_shortcodes_keeps_content():
    assert strip_shortcodes("a {{< x >}}b{{< /x >}} c") == "a b c"
    assert strip_shortcodes("{{% y param=1 %}}inner{{% /y %}}") == "inner"


def test_markdown_inline_and_lists():
    md = "A **bold** and *em* and `code` word.\n\n- one\n- two\n\n1. first\n2. second"
    text = markdown_to_text(md)
    for frag in ("bold", "em", "code", "one", "two", "first", "second"):
        assert frag in text
    assert "**" not in text and "`" not in text


def test_markdown_links_keep_text_not_url():
    text = markdown_to_text("See [the docs](https://example.test/x) now.")
    assert "the docs" in text
    assert "https://example.test/x" not in text


def test_markdown_blockquote_and_hr():
    text = markdown_to_text("> quoted line\n\n---\n\nafter")
    assert "quoted line" in text
    assert "---" not in text
    assert "after" in text


# --- dynamic front-matter extras + date normalization (T6) ------------


def _assemble_one(body_md: str, warc_us: int = 1735689600_000_000):
    import html as _h

    import numpy as np
    import pyarrow as pa

    from docs_indexer_ray.stages.extract import ExtractAssemble

    batch = pa.table(
        {
            "url": pa.array(["https://docs.test/x/page/"]),
            "warc_ts": pa.array(np.array([warc_us], np.int64), pa.timestamp("us")),
            "html": pa.array(
                [b"<html><body>" + _h.escape(body_md, quote=False).encode() + b"</body></html>"]
            ),
            "text": pa.array([body_md]),
            "lang": pa.array(["en"]),
        }
    )
    return ExtractAssemble()(batch)


def test_extras_carry_unmapped_front_matter_keys():
    import json

    out = _assemble_one(
        "---\ntitle: T\ndescription: About node pools\nweight: 30\n"
        "categories: [basics, infra]\n---\nBody here.\n"
    )
    extras = json.loads(out["extras"][0].as_py())
    # reference behavior: every YAML key survives into the indexed doc
    # (hugo.py:279, 324-331); title/date are lifted to their own columns
    assert extras == {
        "description": "About node pools",
        "weight": 30,
        "categories": ["basics", "infra"],
    }
    assert out["title"][0].as_py() == "T"


def test_extras_null_without_front_matter():
    out = _assemble_one("No front matter at all.\n")
    assert out["extras"][0].as_py() is None


def test_date_two_reference_formats_and_fallbacks():
    # blog.py:110-118: try %Y-%m-%dT%H:%M:%S.%fZ then %Y-%m-%dT%H:%M:%SZ
    out = _assemble_one("---\ndate: 2024-03-01T10:20:30.500Z\n---\nB.\n")
    assert out["date"][0].as_py() == "2024-03-01T10:20:30.500000+00:00"
    out = _assemble_one("---\ndate: 2024-03-01T10:20:30Z\n---\nB.\n")
    assert out["date"][0].as_py() == "2024-03-01T10:20:30+00:00"
    # YAML unquoted date → datetime.date object → UTC midnight
    out = _assemble_one("---\ndate: 2024-03-01\n---\nB.\n")
    assert out["date"][0].as_py() == "2024-03-01T00:00:00+00:00"
    # unparseable → verbatim (degrade, never fail)
    out = _assemble_one("---\ndate: not-a-date\n---\nB.\n")
    assert out["date"][0].as_py() == "not-a-date"
    # absent → warc_ts fallback
    out = _assemble_one("B only.\n")
    assert out["date"][0].as_py() == "2025-01-01T00:00:00+00:00"


def test_synthesize_text_byte_identical():
    """The derived catch-all == the assembly-time column, byte for
    byte, across the rich corpus (front matter present/absent/broken,
    empty bodies, shortcodes, mixed-case urls)."""
    from docs_indexer_ray.stages.extract import ExtractAssemble, synthesize_text
    from docs_indexer_ray.synth import rich_pages_table

    pages = rich_pages_table(60, dup_every=9)
    with_text = ExtractAssemble()(pages)
    without = ExtractAssemble(emit_text=False)(pages)
    assert "text" not in without.column_names
    derived = synthesize_text(without)
    assert derived["text"].to_pylist() == with_text["text"].to_pylist()


def test_emit_text_false_requires_hugo_recipe():
    import pytest as _pytest

    from docs_indexer_ray.stages.extract import ExtractAssemble

    with _pytest.raises(ValueError, match="hugo"):
        ExtractAssemble(recipe="blog", emit_text=False)


def test_html_doctype_and_cdata_match_bs4_semantics():
    """bs4's builder strips 'DOCTYPE ' / 'CDATA[' prefixes before
    creating the string nodes — the raw declaration text previously
    injected spurious tokens into every real page's indexed body."""
    from docs_indexer_ray.functions.htmltext import html_to_text

    assert html_to_text("<!DOCTYPE html><p>x</p>") == "htmlx"
    assert html_to_text("<svg><![CDATA[hi]]></svg>") == "hi"


def test_markdown_code_spans_are_literal():
    """Inline syntax inside backticks is content, not markup."""
    from docs_indexer_ray.functions.minimarkdown import markdown_to_text

    assert (
        markdown_to_text("Use `a * b * c` and `_private_` here.")
        == "Use a * b * c and _private_ here."
    )
    assert markdown_to_text("see `[label](http://x)` now") == "see [label](http://x) now"


def test_markdown_setext_and_table_separator():
    """A bare '---' (no pipe) under a line is a setext h2 per the
    tables extension — never a table separator, and the underline
    never leaks into the text."""
    from docs_indexer_ray.functions.minimarkdown import markdown_to_text

    assert markdown_to_text("col a | col b\n---\nnext") == "col a | col b\nnext"
    assert markdown_to_text("Heading text\n---\nafter") == "Heading text\nafter"
    assert markdown_to_text("Big\n===\nafter") == "Big\nafter"
    t = markdown_to_text("a | b\n--- | ---\n1 | 2\n")
    assert "|" not in t and "---" not in t and "a\nb" in t


def test_markdown_deep_blockquote_and_porter_y_run_no_recursion():
    """Crawled junk: a 5000-deep '>' run and a 5000-long 'y' run must
    not blow the stack (previously RecursionError in the build)."""
    from docs_indexer_ray.functions.minimarkdown import markdown_to_text
    from docs_indexer_ray.functions.porter import porter_stem

    t = markdown_to_text(">" * 5000 + " deep")
    assert "deep" in t and ">" not in t
    assert porter_stem("a" + "y" * 5000)  # no RecursionError
    # y-consonant alternation preserved (ayya: y1 cons, y2 vowel)
    assert porter_stem("sky") == "sky" and porter_stem("happy") == "happi"
